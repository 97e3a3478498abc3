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

  test("q18 running total of a customer's last row equals the customer's sum") {
    val df = SparkEntry.queries("q18_window_suite")(spark, sfDir)
    val lastRunning = df.groupBy(col("o_custkey"))
      .agg(max(col("running_total")).as("rt"))
    val direct = Tables.orders(spark, sfDir).groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("st"))
    val bad = lastRunning.join(direct, "o_custkey")
      .filter(abs(col("rt") - col("st")) > 1e-6)
    assert(bad.isEmpty)
  }

  test("q19 percentiles are ordered p25 <= p50 <= p75 <= p90 and bounded") {
    val rows = SparkEntry.queries("q19_percentiles")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(p25, p50, p75, p90) =
        Seq("p25", "p50", "p75", "p90").map(r.getAs[Double])
      assert(p25 <= p50 && p50 <= p75 && p75 <= p90)
    }
  }

  test("q20 cube grand total row matches table count") {
    val rows = SparkEntry.queries("q20_cube")(spark, sfDir)
      .filter(col("status") === "ALL" && col("priority") === "ALL").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("order_count") == Tables.orders(spark, sfDir).count())
  }

  test("q21 bin-range join matches the naive inequality join") {
    import spark.implicits._
    val binned = SparkEntry.queries("q21_range_join")(spark, sfDir)
    val ev = Tables.events(spark, sfDir)
    val e = ev.filter($"event_type" === "error")
      .select($"event_id".as("anchor_id"), $"user_id".as("u"), $"ts".as("a_ts"))
    val naive = e.join(ev,
        $"user_id" === $"u" && $"ts" >= $"a_ts" &&
        $"ts" < $"a_ts" + expr("INTERVAL 1 HOUR") && $"event_id" =!= $"anchor_id", "left")
      .groupBy($"anchor_id").agg(count($"event_id").as("naive_n"))
    val diff = binned.join(naive, "anchor_id").filter($"n_follow" =!= $"naive_n")
    assert(diff.isEmpty)
    assert(binned.count() == e.count(), "every anchor must appear, zero counts included")
  }

  test("q22 every returned row hits its customer's max price") {
    import spark.implicits._
    val df = SparkEntry.queries("q22_correlated_max")(spark, sfDir)
    val mx = Tables.orders(spark, sfDir).groupBy($"o_custkey".as("ck"))
      .agg(max($"o_totalprice").as("true_max"))
    val bad = df.join(mx, $"o_custkey" === $"ck")
      .filter($"o_totalprice" =!= $"true_max")
    assert(bad.isEmpty)
    assert(df.select($"o_custkey").distinct().count() ==
           Tables.orders(spark, sfDir).select($"o_custkey").distinct().count())
  }

  test("q13 scalar subquery filters strictly above the mean") {
    val df = SparkEntry.queries("q13_scalar_subquery")(spark, sfDir)
    val n = Tables.orders(spark, sfDir).count()
    val k = df.count()
    assert(k > 0 && k < n)
  }

  test("q23 grouping sets produce exactly the requested combinations") {
    import spark.implicits._
    val df = SparkEntry.queries("q23_grouping_sets")(spark, sfDir).cache()
    val cust = Tables.customer(spark, sfDir)
    val pairRows = df.filter($"segment" =!= "ALL" && $"nationkey" =!= -1).count()
    val segRows  = df.filter($"segment" =!= "ALL" && $"nationkey" === -1).count()
    val nkRows   = df.filter($"segment" === "ALL" && $"nationkey" =!= -1).count()
    assert(pairRows == cust.select($"c_mktsegment", $"c_nationkey").distinct().count())
    assert(segRows == cust.select($"c_mktsegment").distinct().count())
    assert(nkRows == cust.select($"c_nationkey").distinct().count())
    // no grand-total row: () was not a requested set
    assert(df.filter($"segment" === "ALL" && $"nationkey" === -1).isEmpty)
    df.unpersist()
  }

  test("q24 HLL sketch stays within its design error at this cardinality") {
    import spark.implicits._
    val bad = SparkEntry.queries("q24_approx_distinct")(spark, sfDir)
      .filter(!$"approx_within_bound")
    assert(bad.isEmpty, "approx_count_distinct drifted >5% from exact")
  }

  test("q26 range frame: trailing-hour aggregates agree with a direct self-count") {
    import spark.implicits._
    val df = SparkEntry.queries("q26_range_frame")(spark, sfDir)
    // spot-check: recompute n_trailing_1h for a handful of rows via a join
    val ev = Tables.events(spark, sfDir)
      .select($"user_id".as("u"), unix_micros($"ts").as("t"))
    val sample = df.limit(50)
      .select($"event_id", $"user_id", unix_micros($"ts").as(("ts_us")), $"n_trailing_1h")
    val recount = sample.join(ev, $"user_id" === $"u" &&
        $"t" >= $"ts_us" - 3600L * 1000000L && $"t" <= $"ts_us")
      .groupBy($"event_id", $"n_trailing_1h").count()
    assert(recount.filter($"count" =!= $"n_trailing_1h").isEmpty)
    // every row's frame includes itself
    assert(df.filter($"n_trailing_1h" < 1).isEmpty)
  }

  test("q27 exists composition: every hit has a late line, no hit has a heavy line") {
    import spark.implicits._
    val hits = SparkEntry.queries("q27_exists_composition")(spark, sfDir).cache()
    val li = Tables.lineitem(spark, sfDir)
    val heavyLeak = hits.join(li.filter($"l_quantity" >= 45),
      $"o_orderkey" === $"l_orderkey", "left_semi")
    assert(heavyLeak.isEmpty, "NOT EXISTS violated")
    val lateMissing = hits.join(
      li.select($"l_orderkey", $"l_shipdate"),
      $"o_orderkey" === $"l_orderkey" &&
        $"l_shipdate" > $"o_orderdate" + expr("INTERVAL 60 DAYS"), "left_anti")
    assert(lateMissing.isEmpty, "EXISTS violated")
    assert(hits.count() > 0)
    hits.unpersist()
  }

  test("plan shapes: grouping sets expand once, q27 fuses semi+anti, q26 single window") {
    val p23 = plan("q23_grouping_sets")
    assert(p23.contains("Expand"), "grouping sets must compile to a single Expand")
    val p27 = plan("q27_exists_composition")
    assert(p27.contains("LeftSemi") && p27.contains("LeftAnti"))
    val p26 = plan("q26_range_frame")
    assert("\\bWindow\\b".r.findAllIn(p26).length >= 1 &&
           p26.split("Window \\(").length == 2, "both frame aggs share one Window operator")
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    val s = spark
    import s.implicits._
    // force the shuffle-join regime (no broadcast) and drop the size floors
    // so the optimizer's runtime-filter injection fires at spec scale — on a
    // 100 TB fact table these are the default-on production conditions
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> s.conf.getOption("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" ->
        s.conf.getOption("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"))
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val dim = Tables.orders(s, sfDir).filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey")
      val joined = Tables.lineitem(s, sfDir)
        .join(dim, $"l_orderkey" === $"o_orderkey")
        .groupBy($"l_returnflag").count()
      val p = joined.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        s"expected an injected bloom-filter runtime filter in:\n${p.take(800)}")
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  test("AQE splits a skewed shuffle-join partition at runtime (skew=true)") {
    val s = spark
    import s.implicits._
    // q17 handles PLANNED skew (known hot keys); this is the runtime safety
    // net SURVEY §5 relies on for skew nobody predicted. Thresholds drop to
    // spec scale — at 100 TB the defaults fire on genuinely fat partitions.
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> s.conf.getOption(k))
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "10KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      // half the fact lands on one hot key; the dim is join-complete
      val fact = s.range(200000).select(
        when($"id" % 2 === 0, 7L).otherwise($"id" % 1000).as("k"), $"id".as("v"))
      val dim = s.range(1000).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = fact.join(dim, "k")
      // collect() drives THIS dataset's own QueryExecution (count() or a
      // write would build a fresh one), so the adaptive plan below is the
      // final, skew-rewritten one
      assert(joined.collect().length == 200000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected AQE to mark the skewed join:\n${finalPlan.take(1200)}")
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  test("q35: native INTERSECT ALL / EXCEPT ALL operators match the fused key") {
    // the key runs the single-scan fused form; the native operators (which
    // re-scan per side branch) must agree on every cardinality
    // plan first, on a fresh un-executed frame (post-collect the adaptive
    // plan hides scans inside QueryStageExec): events is read exactly once
    val scans = physical(SparkEntry.queries("q35_multiset_ops")(spark, sfDir)).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.length == 1, s"fused form must scan events once, got ${scans.length}")
    val native = operators.Relational.multisetOpsNative(spark, sfDir)
    val fused = SparkEntry.queries("q35_multiset_ops")(spark, sfDir)
    assert(native.collect().map(_.toSeq).toSeq === fused.collect().map(_.toSeq).toSeq)
  }

  test("d19 weighted mix: one WindowGroupLimit pass, config and counts ride broadcasts") {
    val planned = physical(SparkEntry.queries("d19_weighted_mix")(spark, sfDir))
    val p = planned.toString
    assert(p.contains("WindowGroupLimit"),
      s"constant cap must bound map output below the window:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"config/counts joins must broadcast, never shuffle the sample:\n$p")
    // exact budgets: every configured source hits its quota (n_source >= quota
    // here), unconfigured sources get the default, weights invert inclusion
    val rows = SparkEntry.queries("d19_weighted_mix")(spark, sfDir)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("picked"), max(col("weight")).as("w"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val cfg = operators.Dedup.MixQuotaConfig.toMap
    val perSource = Tables.documents(spark, sfDir).groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (src, (picked, w)) =>
      val quota = math.min(cfg.getOrElse(src, operators.Dedup.MixDefaultQuota).toLong, perSource(src))
      assert(picked == quota, s"$src picked $picked, quota $quota")
      assert(math.abs(w - perSource(src).toDouble / quota) < 1e-12, s"$src weight $w")
    }
  }

  test("d18 quota sample: rank filter compiles to a partial WindowGroupLimit") {
    val p = physical(SparkEntry.queries("d18_quota_sample")(spark, sfDir)).toString
    assert(p.contains("WindowGroupLimit"),
      s"per-source reservoir must cap map output below the window:\n$p")
  }

  test("d33 priority sample: weighted reservoir caps map output and skews long") {
    val p = physical(SparkEntry.queries("d33_priority_sample")(spark, sfDir)).toString
    assert(p.contains("WindowGroupLimit"),
      s"weighted reservoir must cap map output below the window:\n$p")
    val rows = SparkEntry.queries("d33_priority_sample")(spark, sfDir).collect()
    val perSource = rows.groupBy(_.getAs[String]("source")).view.mapValues(_.length)
    val corpus = Tables.documents(spark, sfDir)
    val counts = corpus.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.foreach { case (src, n) =>
      assert(n == math.min(operators.Dedup.PrioritySampleK.toLong, counts(src)),
        s"$src drew $n")
    }
    // inclusion probability rises with n_chars: the weighted sample's mean
    // length must exceed the corpus mean (deterministic under the fixed
    // Knuth hash and the seed-42 testdata)
    val sampledMean = rows.map(_.getAs[Long]("n_chars")).sum.toDouble / rows.length
    val corpusMean = corpus.agg(avg(col("n_chars"))).head.getDouble(0)
    assert(sampledMean > corpusMean,
      s"length-weighted sample mean $sampledMean <= corpus mean $corpusMean")
  }

  test("q43 RFM quartiles satisfy the exact cumulative rank law on every dimension") {
    val rows = SparkEntry.queries("q43_rfm_segments")(spark, sfDir).collect()
    val n = rows.length
    assert(n > 0)
    for (dim <- Seq("r_quartile", "f_quartile", "m_quartile")) {
      val scores = rows.map(_.getAs[Long](dim))
      assert(scores.forall(q => q >= 1 && q <= 4), s"$dim out of range")
      // defining property of the value-based cutoff: at least ceil(N*t/4)
      // users score <= t (ties can only push the count ABOVE the rank)
      for (t <- 1 to 3) {
        val atMost = scores.count(_ <= t)
        assert(atMost >= (n.toLong * t + 3) / 4,
          s"$dim: only $atMost of $n users score <= $t")
      }
    }
    val seg = rows.map(r => (r.getAs[Long]("r_quartile"), r.getAs[Long]("f_quartile"),
      r.getAs[Long]("m_quartile"), r.getAs[Long]("segment")))
    assert(seg.forall { case (r, f, m, s) => s == r * 100 + f * 10 + m })
  }

  test("q25 deterministic sample is stable and ~10%") {
    val a = SparkEntry.queries("q25_det_sample")(spark, sfDir).collect().toSeq
    val b = SparkEntry.queries("q25_det_sample")(spark, sfDir).collect().toSeq
    assert(a == b, "sample must be identical across runs")
    val total = Tables.documents(spark, sfDir).count().toDouble
    assert(a.length > 0 && math.abs(a.length / total - 0.10) < 0.05)
  }

  test("q33 typed nested result: array<struct> ranks are 1..5 and JSON gate round-trips") {
    import org.apache.spark.sql.Row
    val typed = operators.Relational.nestedTopK(spark, sfDir)
    val f = typed.schema("top_bigrams").dataType
    assert(f.typeName == "array", s"gate capability claim needs a real nested type, got $f")
    val rows = typed.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val arr = r.getSeq[Row](1)
      assert(arr.map(_.getLong(0)) == (1L to arr.length), s"ranks not 1..k in $r")
    }
    // the JSON gate column is exactly to_json of the typed column
    val viaGate = SparkEntry.queries("q33_nested_topk")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val direct = typed.select(col("source"), to_json(col("top_bigrams")))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(viaGate == direct)
    viaGate.values.foreach(j => assert(j.startsWith("[{\"rank\":1,"), j))
  }

  test("q36 typed map result: counts per source sum to table counts") {
    val typed = operators.Relational.mapResult(spark, sfDir)
    assert(typed.schema("lang_counts").dataType.typeName == "map")
    val sums = typed.collect()
      .map(r => r.getString(0) -> r.getMap[String, Long](1).values.sum).toMap
    val expected = Tables.documents(spark, sfDir).groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sums == expected)
    // gate emits key-sorted canonical JSON of the same map
    SparkEntry.queries("q36_map_result")(spark, sfDir).collect().foreach { r =>
      val j = r.getString(1)
      assert(j.startsWith("{") && j.endsWith("}"), j)
      val keys = "\"([a-z]+)\":".r.findAllMatchIn(j).map(_.group(1)).toSeq
      assert(keys == keys.sorted, s"map entries must be key-sorted: $j")
    }
  }

  test("q40 retention: week zero is total by construction, offsets bounded") {
    import spark.implicits._
    val df = SparkEntry.queries("q40_retention")(spark, sfDir).cache()
    assert(df.count() > 0)
    // the signup event itself makes every cohort member active at offset 0
    val w0 = df.filter($"week_offset" === 0)
    val cohorts = df.select($"cohort").distinct().count()
    assert(w0.count() == cohorts, "every cohort must have its offset-0 row")
    assert(w0.filter($"n_active" =!= $"cohort_size" || $"retention_permille" =!= 1000).isEmpty,
      "offset-0 retention must be exactly 1000 permille")
    assert(df.filter($"week_offset" < 0 || $"week_offset" > 3).isEmpty)
    assert(df.filter($"n_active" > $"cohort_size").isEmpty)
    df.unpersist()
    // co-partitioned on user_id — no cartesian/nested-loop fallback
    val p = physical(SparkEntry.queries("q40_retention")(spark, sfDir)).toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"retention must join anchors by key:\n$p")
  }

  test("q41 transitions conserve consecutive pairs and normalize each Markov row") {
    import spark.implicits._
    val df = SparkEntry.queries("q41_transitions")(spark, sfDir).cache()
    // conservation: matrix mass == (events - distinct users): every user
    // timeline of length k contributes exactly k-1 transitions
    val ev = Tables.events(spark, sfDir)
    val expected = ev.count() - ev.select($"user_id").distinct().count()
    assert(df.agg(sum($"n")).head().getLong(0) == expected,
      "every consecutive pair must appear exactly once")
    // per-row law: permille = n * 1000 div row total; row sums land within
    // integer-division undershoot of 1000
    val wRow = org.apache.spark.sql.expressions.Window.partitionBy($"from_type")
    assert(df.withColumn("tot", sum($"n").over(wRow))
      .filter($"p_permille" =!= expr("n * 1000 div tot")).isEmpty)
    val rows = df.groupBy($"from_type")
      .agg(sum($"p_permille").as("s"), count(lit(1)).as("k"))
    assert(rows.filter($"s" > 1000 || $"s" <= lit(1000) - $"k").isEmpty,
      "a Markov row must sum to 1000 minus at most one permille per cell")
    df.unpersist()
  }

  test("q42 sketch re-agg: mergeability law and verdict columns") {
    import spark.implicits._
    val df = SparkEntry.queries("q42_sketch_reagg")(spark, sfDir).cache()
    val ev = Tables.events(spark, sfDir)
    // verdict columns recompute exactly
    val truth = ev.groupBy($"event_type")
      .agg(countDistinct(to_date($"ts")).as("td"), countDistinct($"user_id").as("tu"))
    assert(df.join(truth, Seq("event_type"))
      .filter($"n_days" =!= $"td" || $"exact_users" =!= $"tu").isEmpty)
    assert(df.filter(!$"reagg_within_bound").isEmpty,
      "re-aggregated estimate must sit inside the q24 error gate")
    // mergeability: unioning per-day sketches and unioning per-(event_id mod 3)
    // sketches are different partitionings of the same rows — the merged
    // registers are identical, so the estimates must agree EXACTLY
    def unionEst(part: org.apache.spark.sql.Column) = ev
      .groupBy($"event_type", part.as("cell"))
      .agg(hll_sketch_agg($"user_id", lit(12)).as("sk"))
      .groupBy($"event_type")
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("est"))
    val a = unionEst(to_date($"ts"))
    val b = unionEst(pmod($"event_id", lit(3L)))
    assert(a.join(b.withColumnRenamed("est", "est2"), Seq("event_type"))
      .filter($"est" =!= $"est2").isEmpty,
      "sketch union must be partitioning-invariant")
    df.unpersist()
  }

  test("q39 funnel: conversions bounded by signups, latency only from converters") {
    import spark.implicits._
    val df = SparkEntry.queries("q39_funnel")(spark, sfDir).cache()
    assert(df.count() > 0)
    assert(df.filter($"n_converted" > $"n_signups").isEmpty)
    assert(df.filter($"conv_permille" < 0 || $"conv_permille" > 1000).isEmpty)
    // a cohort with zero conversions must report zero latency
    assert(df.filter($"n_converted" === 0 && $"total_latency_s" =!= 0).isEmpty)
    // converters are exactly the signed-up users with a purchase at or
    // after their first signup
    val ev = Tables.events(spark, sfDir)
    val su = ev.filter($"event_type" === "signup").groupBy($"user_id")
      .agg(min($"ts").as("signup_ts"))
    val expectConverted = ev.filter($"event_type" === "purchase")
      .join(su, "user_id").filter($"ts" >= $"signup_ts")
      .select($"user_id").distinct().count()
    assert(df.agg(sum($"n_converted")).head().getLong(0) == expectConverted)
    // cohort signups partition all signed-up users
    assert(df.agg(sum($"n_signups")).head().getLong(0) == su.count())
    df.unpersist()
  }

  test("q38 two-level interval sweep equals the naive single-window sweep") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = SparkEntry.queries("q38_interval_sweep")(spark, sfDir).cache()
    // concurrency after any endpoint is >= 0 (a bucket holding only the
    // last closing −1 of its type legitimately peaks at 0, never below)
    assert(df.filter($"peak_concurrency" < 0).isEmpty)
    // the naive formulation: ONE window per event_type over all endpoints —
    // correct but unshardable; the engine's bucketed two-level plan must
    // reproduce it exactly
    val iv = Tables.events(spark, sfDir).select($"event_id", $"event_type", $"ts".as("t0"),
      expr("timestampadd(SECOND, CAST(60 + event_id % 240 AS INT), ts)").as("t1"))
    val pts = iv.select($"event_type", $"t0".as("t"), lit(1L).as("delta"), $"event_id")
      .union(iv.select($"event_type", $"t1".as("t"), lit(-1L).as("delta"), $"event_id"))
    val w = Window.partitionBy($"event_type").orderBy($"t", $"delta", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = pts.withColumn("conc", sum($"delta").over(w))
      .groupBy($"event_type", date_trunc("hour", $"t").as("bucket"))
      .agg(count(lit(1)).as("n_points"), max($"conc").as("peak_concurrency"))
    assert(df.select("event_type", "bucket", "n_points", "peak_concurrency")
      .except(naive).isEmpty &&
      naive.except(df.select("event_type", "bucket", "n_points", "peak_concurrency")).isEmpty,
      "two-level sweep diverges from the naive sweep")
    // plan: local window + rollup share one corpus exchange; the baseline
    // window only moves bucket-summary rows
    val planned = physical(SparkEntry.queries("q38_interval_sweep")(spark, sfDir))
    val shuffles = planned.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.count(!_.toString.contains("rangepartitioning")) <= 2,
      s"sweep must cost at most two hash exchanges (one corpus, one summary):\n$planned")
    df.unpersist()
  }

  test("q45 MV maintenance: fold equals the one-shot q01 aggregate exactly") {
    import spark.implicits._
    val mv = SparkEntry.queries("q45_mv_maintenance")(spark, sfDir)
    val direct = SparkEntry.queries("q01_agg_pricing")(spark, sfDir)
    // bit-exact equality, column by column (decimal state makes the fold
    // merge-order-free, so even the double casts agree to the last ULP)
    val joined = mv.as("m").join(direct.as("d"),
      Seq("l_returnflag", "l_linestatus"), "full")
    assert(joined.filter(
        $"m.sum_qty".isNull || $"d.sum_qty".isNull ||
        $"m.sum_qty" =!= $"d.sum_qty" ||
        $"m.sum_base_price" =!= $"d.sum_base_price" ||
        $"m.sum_disc_price" =!= $"d.sum_disc_price" ||
        $"m.avg_qty" =!= $"d.avg_qty" ||
        $"m.count_order" =!= $"d.count_order").isEmpty,
      "incremental fold diverged from the rebuild")
    // state stays |groups|-sized: the fold's read-out has exactly the
    // rebuild's group count
    assert(mv.count() == direct.count())
  }

  test("q46 gap fill: planted silent hours fill forward with gap accounting") {
    val s = spark
    import s.implicits._
    def t(h: Int) = new java.sql.Timestamp(3600000L * (500000 + h))
    // type "x": events in hours 0, 1 and 4 — hours 2 and 3 are silent
    val events = Seq(
      (1L, t(0), 1L, "x", 2.0), (2L, t(1), 1L, "x", 3.0),
      (3L, t(1), 2L, "x", 5.0), (4L, t(4), 2L, "x", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val rows = operators.Relational.gapFillOf(events)
      .collect().map(r => r.getAs[java.sql.Timestamp]("bucket_ts").getTime -> r).toMap
    assert(rows.size == 5, "dense axis must cover min..max hours inclusive")
    val h = (i: Int) => rows(3600000L * (500000 + i))
    assert(!h(0).getAs[Boolean]("is_gap") && h(2).getAs[Boolean]("is_gap")
      && h(3).getAs[Boolean]("is_gap") && !h(4).getAs[Boolean]("is_gap"))
    // the fill carries hour 1's observation through the silent hours
    Seq(2, 3).foreach { i =>
      assert(h(i).getAs[Long]("n_events") == 0L)
      assert(h(i).getAs[Long]("filled_events") == 2L)
      assert(h(i).getAs[Double]("filled_value") == 8.0)
      assert(h(i).getAs[Long]("hours_since_obs") == i - 1L)
    }
    assert(h(4).getAs[Long]("hours_since_obs") == 0L
      && h(4).getAs[Double]("filled_value") == 7.0)
    // real feed: axis is dense per type, fill never null, gaps consistent
    val df = SparkEntry.queries("q46_gap_fill")(spark, sfDir).cache()
    try {
      assert(df.filter($"filled_events".isNull || $"filled_value".isNull).isEmpty)
      assert(df.filter($"is_gap" =!= ($"n_events" === 0L)).isEmpty)
      assert(df.filter($"is_gap" && $"hours_since_obs" <= 0).isEmpty)
      val spanCheck = df.groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          ((max(unix_micros($"bucket_ts")) - min(unix_micros($"bucket_ts")))
            / 3600000000L + 1).as("span"))
      assert(spanCheck.filter($"n" =!= $"span").isEmpty, "axis must be dense")
    } finally df.unpersist()
  }

  test("q47 array suite: folds agree with flat SQL aggregation; one exchange") {
    import spark.implicits._
    val df = SparkEntry.queries("q47_array_suite")(spark, sfDir).cache()
    try {
      // independent flat-aggregation replay of the array folds
      val flat = Tables.lineitem(spark, sfDir)
        .select($"l_orderkey",
          (col("l_quantity").cast("decimal(18,2)") * 100).cast("long").as("qc"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("pc"))
        .groupBy($"l_orderkey")
        .agg(count(lit(1)).as("e_n"), sum($"qc").as("e_qty"),
             sum($"qc" * $"pc").as("e_w"),
             sum(when($"qc" >= 3000, 1L).otherwise(0L)).as("e_heavy"))
      val bad = df.join(flat, "l_orderkey")
        .filter($"n_lines" =!= $"e_n" || $"qty_cents" =!= $"e_qty" ||
                $"weighted_cents" =!= $"e_w" || $"n_heavy" =!= $"e_heavy")
      assert(bad.isEmpty, "array folds must equal flat aggregation")
      // top3 is a descending prefix of at most 3 comma-separated cents
      val t3 = df.select(split($"top3_qty", ",").as("t"), $"n_lines").cache()
      try {
        assert(t3.filter(size($"t") =!= least($"n_lines", lit(3L))).isEmpty)
        assert(t3.filter(size($"t") >= 2 &&
          element_at($"t", 1).cast("long") < element_at($"t", 2).cast("long")).isEmpty)
      } finally t3.unpersist()
      // flags are sorted distinct single chars from {A,N,R}
      assert(df.filter(!$"flags".rlike("^A?N?R?$") || length($"flags") === 0).isEmpty)
      // plan: the per-order collect is the ONLY exchange before the sort
      val ex = deepExchanges(physical(
        SparkEntry.queries("q47_array_suite")(spark, sfDir)))
      assert(ex.count(e => !e.outputPartitioning.toString.contains("range")) <= 1,
        s"expected one hash exchange, got ${ex.map(_.outputPartitioning)}")
    } finally df.unpersist()
  }

  test("q49 anomaly MAD: planted burst flags, quiet hours don't, medians exact") {
    import spark.implicits._
    // type A: four 2-event hours + one 50-event burst (med=2, mad=0 ->
    // greatest-guard path); type B: counts 1..5 (med=3, mad=1)
    val rows =
      (0 until 4).flatMap(h => (0 until 2).map(i =>
        (h.toLong * 2 + i, java.sql.Timestamp.valueOf(s"2024-01-01 0$h:10:00"), "A"))) ++
      (0 until 50).map(i =>
        (100L + i, java.sql.Timestamp.valueOf("2024-01-01 04:10:00"), "A")) ++
      (1 to 5).flatMap(h => (0 until h).map(i =>
        (200L + h * 10 + i, java.sql.Timestamp.valueOf(s"2024-01-01 0$h:20:00"), "B")))
    val events = rows.toDF("event_id", "ts", "event_type")
    val out = operators.Relational.anomalyMadOf(events)
      .collect().map(r => (r.getString(0), r.getAs[java.sql.Timestamp]("bucket_ts").getTime,
        r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(6))).toSeq
    val a = out.filter(_._1 == "A")
    assert(a.forall(x => x._4 == 2 && x._5 == 0), s"A med/mad wrong: $a")
    assert(a.count(_._6) == 1 && a.find(_._6).get._3 == 50L,
      "exactly the burst hour must flag for A")
    val b = out.filter(_._1 == "B")
    assert(b.forall(x => x._4 == 3 && x._5 == 1), s"B med/mad wrong: $b")
    assert(b.forall(!_._6), "counts 1..5 with mad=1 are within 4.5 MADs")
    // real feed: verdicts exist on both sides and the rate is alert-like
    val df = SparkEntry.queries("q49_anomaly_mad")(spark, sfDir)
    val n = df.count(); val flagged = df.filter($"is_anomaly").count()
    assert(flagged < n / 10, s"anomaly rate implausibly high: $flagged/$n")
    // the hourly aggregate feeds the med/mad branches and the readout as
    // ONE reused exchange at runtime (t20/d36 idiom) — the corpus is not
    // re-aggregated per consumer
    val executed = SparkEntry.queries("q49_anomaly_mad")(spark, sfDir)
    executed.collect()
    assert(executed.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "med/mad/readout must share the hourly aggregate exchange")
  }

  test("q50 variant: typed path access round-trips, missing paths are null, scan-local") {
    import spark.implicits._
    // hand-built variant: every typed path extraction returns the planted
    // value, and a missing path is NULL (not an error, not a coercion)
    val row = Seq("x").toDF("x").select(
      expr("""parse_json('{"meta":{"type":"t1","user":42},"vals":[7,9]}')""").as("v"))
      .select(
        expr("variant_get(v, '$.meta.type', 'string')").as("t"),
        expr("variant_get(v, '$.meta.user', 'long')").as("u"),
        expr("variant_get(v, '$.vals[0]', 'long')").as("v0"),
        expr("variant_get(v, '$.vals[1]', 'long')").as("v1"),
        expr("try_variant_get(v, '$.absent', 'long')").as("a"))
      .head()
    assert(row.getString(0) == "t1" && row.getLong(1) == 42L &&
      row.getLong(2) == 7L && row.getLong(3) == 9L && row.isNullAt(4))
    // keyed rollup: totals reconcile with the raw events table
    val df = SparkEntry.queries("q50_variant_json")(spark, sfDir)
    val total = df.agg(sum($"n")).head().getLong(0)
    assert(total == Tables.events(spark, sfDir).count(),
      "variant rollup must cover every event")
    assert(df.filter($"n_absent" =!= $"n").isEmpty,
      "the missing path must be null for every row")
    // parse + extract stay in the scan stage: one rollup exchange
    val ex = deepExchanges(physical(SparkEntry.queries("q50_variant_json")(spark, sfDir)))
    assert(ex.count(e => !e.outputPartitioning.toString.contains("range")) <= 1,
      s"expected one rollup exchange, got ${ex.map(_.outputPartitioning)}")
  }

  test("q48 skyline: window law equals brute-force dominance; frontier is Pareto") {
    import spark.implicits._
    val sky = SparkEntry.queries("q48_skyline")(spark, sfDir).cache()
    try {
      val o = Tables.orders(spark, sfDir).select(
        $"o_orderpriority".as("pri"), $"o_orderkey".as("k"),
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long").as("p"),
        expr("unix_micros(cast(o_orderdate as timestamp))").as("d"))
      // brute force: dominated rows (affordable at sf0.001 within priority)
      val l = o; val r = o.select($"pri", $"k".as("k2"), $"p".as("p2"), $"d".as("d2"))
      val dominated = l.join(r, Seq("pri"))
        .filter($"p2" >= $"p" && $"d2" <= $"d" && ($"p2" > $"p" || $"d2" < $"d"))
        .select($"pri", $"k").distinct()
      val brute = o.join(dominated, Seq("pri", "k"), "left_anti")
        .select($"pri", $"k").collect().map(x => (x.getString(0), x.getLong(1))).toSet
      val win = sky.select($"pri", $"o_orderkey")
        .collect().map(x => (x.getString(0), x.getLong(1))).toSet
      assert(win == brute, s"window skyline != brute force (${win.size} vs ${brute.size})")
      // Pareto sanity: within a priority, ordered by price desc the dates
      // strictly improve (no row is dominated by a pricier frontier row)
      val viol = sky
        .select($"pri",
          ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long").as("p"),
          expr("unix_micros(cast(o_orderdate as timestamp))").as("d"))
        .withColumn("prevd", min($"d").over(
          org.apache.spark.sql.expressions.Window.partitionBy($"pri")
            .orderBy($"p".desc).rangeBetween(Long.MinValue, -1)))
        .filter($"prevd".isNotNull && $"prevd" <= $"d")
      assert(viol.isEmpty, "frontier rows must strictly improve on date as price drops")
      // the salted local pass is a genuine pre-filter: far fewer rows than
      // the corpus reach the per-priority global window
      val proj = Tables.orders(spark, sfDir).select(
        $"o_orderpriority".as("pri"), $"o_orderkey",
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long").as("price_c"),
        expr("unix_micros(cast(o_orderdate as timestamp))").as("date_us"))
        .withColumn("salt", pmod($"o_orderkey", lit(4L)))
      val localN = operators.Relational.skylinePass(proj, Seq("pri", "salt")).count()
      val total = proj.count()
      assert(localN < total / 4,
        s"local skyline pass must shrink the global input: $localN of $total")
      // and composing the global pass over it loses nothing vs brute force
      val composed = operators.Relational.skylinePass(
        operators.Relational.skylinePass(proj, Seq("pri", "salt")).drop("salt"),
        Seq("pri"))
        .select($"pri", $"o_orderkey")
        .collect().map(x => (x.getString(0), x.getLong(1))).toSet
      assert(composed == brute, "two-stage skyline must equal brute force")
    } finally sky.unpersist()
  }
}
