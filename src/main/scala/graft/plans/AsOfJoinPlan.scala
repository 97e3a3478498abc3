package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlShim, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** As-of join as a first-class Catalyst operator — the "whole-operator"
  * extension path: custom [[LogicalPlan]] + [[SparkStrategy]] + [[SparkPlan]],
  * registered either per-session ([[AsOfJoinDF.ensureStrategy]]) or via
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  *
  * Semantics: for every left row, attach the right row with the greatest
  * `rightTs <= leftTs` within the same key group (DuckDB `ASOF LEFT JOIN`,
  * the oracle for p13/p15). Right-side ties at equal (key, ts) should be
  * pre-deduped by the caller, as with any as-of engine.
  *
  * Scale shape: each side shuffles ONCE on its key and sorts by (key, ts);
  * the merge itself is a single forward pass per partition holding O(1)
  * state — no window buffering of the union (the composed variant in
  * [[graft.operators.AsOf]] materializes per-key frames), no range-join
  * explosion. At 100 TB this is the minimum-movement plan for the operator.
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression) extends BinaryNode {
  require(leftKeys.size == rightKeys.size, "as-of key lists must align")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsOfJoin =
    copy(left = l, right = r)
}

/** Plans [[AsOfJoin]] into [[AsOfJoinExec]]; everything else falls through. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join. Children are hash-clustered on the join keys and
  * sorted by (keys, ts) — EnsureRequirements inserts the exchanges/sorts —
  * then each co-partition pair merges in one pass: the right cursor advances
  * while (rightKey, rightTs) <= (leftKey, leftTs), remembering only the last
  * right row seen, which by sort order is exactly the as-of match.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  // requireAllClusterKeys: a child pre-partitioned on a SUBSET of the keys
  // must still re-shuffle, so both sides land on identical partitionings.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys, requireAllClusterKeys = true) ::
    ClusteredDistribution(rightKeys, requireAllClusterKeys = true) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsOfJoinExec =
    copy(left = l, right = r)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val lOut = left.output
    val rOut = right.output
    val lk = leftKeys; val rk = rightKeys; val lt = leftTs; val rt = rightTs
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTsProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTsProj = UnsafeProjection.create(Seq(rt), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      val resultProj = UnsafeProjection.create(output, output)
      val joined = new JoinedRow
      val rightNulls = new GenericInternalRow(rOut.size)

      new Iterator[InternalRow] {
        // current right cursor (copied: sorter iterators reuse row buffers)
        private var rRow: InternalRow = _
        private var rKeyRow: InternalRow = _
        private var rTsRow: InternalRow = _
        // last right row that satisfied the as-of bound, and its key
        private var matchRow: InternalRow = _
        private var matchKey: InternalRow = _
        advanceRight()

        // null join keys never match (SQL equality semantics, same as DuckDB
        // ASOF LEFT JOIN) — RowOrdering would compare NULL = NULL as equal,
        // so null-keyed right rows are skipped outright here. Null-keyed LEFT
        // rows need no special case: they sort first and compare unequal to
        // every retained (non-null) match key, so they emit right-side nulls.
        private def advanceRight(): Unit = {
          rRow = null
          while (rRow == null && rIter.hasNext) {
            rRow = rIter.next().copy()
            rKeyRow = rKeyProj(rRow).copy()
            if (rKeyRow.anyNull) rRow = null
            else rTsRow = rTsProj(rRow).copy()
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lKeyRow = lKeyProj(l)
          val lTsRow = lTsProj(l)
          var cmp = if (rRow == null) 1 else keyOrd.compare(rKeyRow, lKeyRow)
          while (rRow != null &&
                 (cmp < 0 || (cmp == 0 && tsOrd.compare(rTsRow, lTsRow) <= 0))) {
            matchRow = rRow; matchKey = rKeyRow
            advanceRight()
            cmp = if (rRow == null) 1 else keyOrd.compare(rKeyRow, lKeyRow)
          }
          val hit = matchRow != null && keyOrd.compare(matchKey, lKeyRow) == 0
          numOutputRows += 1
          resultProj(joined(l, if (hit) matchRow else rightNulls))
        }
      }
    }
  }
}

/** DataFrame-level entry point for the native as-of join. */
object AsOfJoinDF {

  /** Append [[AsOfJoinStrategy]] to the session's planner (idempotent);
    * `spark.sql.extensions` deployments get it injected instead.
    */
  def ensureStrategy(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
  }

  /** `left ASOF LEFT JOIN right ON keys AND rightTs <= leftTs`.
    *
    * The two inputs must have disjoint output attributes (alias right-side
    * columns to fresh names, as with any low-level binary operator).
    */
  def asofLeft(left: DataFrame, right: DataFrame,
               leftKeys: Seq[Column], rightKeys: Seq[Column],
               leftTs: Column, rightTs: Column): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    val dupNames = lPlan.output.map(_.name).toSet intersect rPlan.output.map(_.name).toSet
    require(dupNames.isEmpty, s"as-of join sides share column names: $dupNames — alias one side")
    GraftSqlShim.ofRows(spark, AsOfJoin(
      lPlan, rPlan,
      leftKeys.map(GraftSqlShim.expr), rightKeys.map(GraftSqlShim.expr),
      GraftSqlShim.expr(leftTs), GraftSqlShim.expr(rightTs)))
  }
}
