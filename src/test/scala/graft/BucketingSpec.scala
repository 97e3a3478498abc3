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

  test("d20 production posture: the persisted signature index joins with no index-side shuffle") {
    import spark.implicits._
    val s = spark
    val prevThreshold = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path so the exchange structure is visible
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // the REAL artifacts d20 consumes, not fixture copies
      val postings = operators.Dedup.signatureIndexBands(s, sfDir)
      val banded = operators.Dedup.bandSignatures(
        operators.Dedup.signaturesOf(Tables.documents(s, sfDir)))
      val joined = banded.filter($"doc_id" % 3 === 0)
        .join(postings, Seq("band_id", "band_key"))
      joined.collect()
      val found = deepExchanges(physical(joined))
      assert(found.length == 1,
        s"expected only the batch-side exchange, got ${found.length}:\n${physical(joined)}")
      assert(physical(joined).toString.contains("SortMergeJoin"))
      // the payload table joins the (skinny) collision side with zero
      // exchange under ITS bucket key too
      val sigs = operators.Dedup.signatureIndexSigs(s, sfDir)
      val verified = joined.select($"doc_id", $"state_id").distinct()
        .join(sigs, Seq("state_id"))
      verified.collect()
      val sigSideShuffled = deepExchanges(physical(verified)).exists(e =>
        scansTable(e.child, "_sigs") && !scansTable(e.child, "documents.parquet"))
      assert(!sigSideShuffled,
        s"the payload table re-shuffled on its own bucket key:\n${physical(verified)}")
      // and on the full KEYED d20 plan: the index scan appears, and no
      // shuffle exchange moves INDEX rows alone — exchanges above the join
      // carry joined (batch-derived) rows and are fine; an exchange whose
      // whole subtree is the index side would mean the state re-shuffled
      val keyed = SparkEntry.queries("d20_incremental_dedup")(s, sfDir)
      keyed.collect()
      val phys = physical(keyed)
      assert(scansTable(phys, "graft_sig_index"),
        s"keyed d20 must scan the persisted index:\n$phys")
      val offenders = deepExchanges(phys).filter(e =>
        scansTable(e.child, "graft_sig_index") &&
          !scansTable(e.child, "documents.parquet"))
      assert(offenders.isEmpty,
        s"an exchange moved index rows alone — the state must never re-shuffle:\n$offenders")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
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
