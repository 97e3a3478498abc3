package graft

import org.apache.spark.sql.functions._

/** Co-located joins via bucketing — the zero-shuffle join path that matters
  * at 100 TB: both fact tables bucketed on the join key join with no
  * Exchange at all.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without any shuffle exchange") {
    val s = spark // warehouse dir is a per-run temp dir (set in SparkSpec)
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_lineitem")
    Tables.orders(s, sfDir).write.bucketBy(4, "o_orderkey")
      .sortBy("o_orderkey").mode("overwrite").saveAsTable("b_orders")
    Tables.lineitem(s, sfDir).write.bucketBy(4, "l_orderkey")
      .sortBy("l_orderkey").mode("overwrite").saveAsTable("b_lineitem")

    val joined = s.table("b_lineitem")
      .join(s.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
           !plan.contains("Exchange hashpartitioning(o_orderkey"),
           s"bucketed join still shuffles:\n${plan.take(1200)}")

    // and it computes the same result as the shuffled join on raw parquet
    val expected = Tables.lineitem(s, sfDir)
      .join(Tables.orders(s, sfDir), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    s.sql("DROP TABLE IF EXISTS b_orders")
    s.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("d20 production posture: a bucketed signature index joins with no index-side shuffle") {
    import spark.implicits._
    val s = spark
    val banded = operators.Dedup.bandSignatures(
      operators.Dedup.signaturesOf(Tables.documents(s, sfDir)))
    s.sql("DROP TABLE IF EXISTS sig_index")
    banded.filter($"doc_id" % 3 =!= 0)
      .write.bucketBy(8, "band_id", "band_key").sortBy("band_id", "band_key")
      .mode("overwrite").saveAsTable("sig_index")
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path so the exchange structure is visible
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val batch = banded.filter($"doc_id" % 3 === 0)
      val joined = batch.join(
        s.table("sig_index")
          .select($"band_id", $"band_key", $"doc_id".as("state_id")),
        Seq("band_id", "band_key"))
      joined.collect()
      // exactly one hash exchange: the BATCH side aligning to the index's
      // bucketing; the persisted index itself must never move (walk into
      // AQE query stages — their children lists are empty)
      def exchanges(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec] =
        p.collect {
          case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => Seq(e)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => exchanges(q.plan)
        }.flatten
      val found = exchanges(physical(joined))
      assert(found.length == 1,
        s"expected only the batch-side exchange, got ${found.length}:\n${physical(joined)}")
      assert(physical(joined).toString.contains("SortMergeJoin"))
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      s.sql("DROP TABLE IF EXISTS sig_index")
    }
  }

  test("p13 as-of join: every matched purchase precedes (or equals) its error") {
    val df = SparkEntry.queries("p13_asof_join")(spark, sfDir)
    assert(df.filter(col("p_ts") > col("e_ts")).isEmpty)
    // every error event appears exactly once
    val errors = Tables.events(spark, sfDir).filter(col("event_type") === "error").count()
    assert(df.count() == errors)
  }

  test("p24 forward as-of: every matched purchase follows (or equals) its error") {
    val df = SparkEntry.queries("p24_asof_forward")(spark, sfDir)
    assert(df.filter(col("p_ts") < col("e_ts")).isEmpty)
    val errors = Tables.events(spark, sfDir).filter(col("event_type") === "error").count()
    assert(df.count() == errors)
    // and it matches the NEAREST following purchase, not just any: no other
    // purchase by the same user may sit strictly between e_ts and p_ts
    val p = Tables.events(spark, sfDir).filter(col("event_type") === "purchase")
      .select(col("user_id").as("u"), col("ts").as("pts"))
    val between = df.filter(col("p_ts").isNotNull)
      .join(p, col("user_id") === col("u") &&
                 col("pts") >= col("e_ts") && col("pts") < col("p_ts"))
    assert(between.isEmpty, "a closer following purchase exists")
  }
}
