package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("q01 aggregates are decimal-exact and grouped correctly") {
    val rows = SparkEntry.queries("q01_agg_pricing")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 6) // |returnflag| x |linestatus|
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("2001-09-02").cast("timestamp")).count()
    assert(total == expected)
  }

  test("q02 pushes filter and projection into the parquet scan") {
    val p = plan("q02_filter_pushdown")
    assert(p.contains("PushedFilters") && p.contains("LessThan(l_quantity,10.0)"), p.take(500))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int"), "projection not pruned")
  }

  test("q03 uses broadcast joins for all dimension sides") {
    val p = plan("q03_join_broadcast")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"), "star join must not shuffle at this size")
  }

  test("q05 compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan("q05_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(400))
    assert(SparkEntry.queries("q05_topk")(spark, sfDir).count() == 20)
  }

  test("q07 returns exactly one row per user") {
    val df = SparkEntry.queries("q07_window_latest")(spark, sfDir)
    assert(df.count() == df.select("user_id").distinct().count())
  }

  test("q09 anti join: no order-having customer leaks through") {
    val bad = SparkEntry.queries("q09_anti_join")(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("c_custkey") === col("o_custkey"))
    assert(bad.isEmpty)
  }

  test("q11 rollup includes grand-total sentinel row") {
    val rows = SparkEntry.queries("q11_rollup")(spark, sfDir)
      .filter(col("segment") === "ALL" && col("nationkey") === -1).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("cust_count") == Tables.customer(spark, sfDir).count())
  }

  test("q13 scalar subquery filters strictly above the mean") {
    val df = SparkEntry.queries("q13_scalar_subquery")(spark, sfDir)
    val n = Tables.orders(spark, sfDir).count()
    val k = df.count()
    assert(k > 0 && k < n)
  }
}
