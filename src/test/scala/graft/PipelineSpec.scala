package graft


import org.apache.spark.sql.functions._
import graft.operators.PipelineOps

class PipelineSpec extends SparkSpec {

  test("driver contract: entry() produces rows and every query key has a callable") {
    assert(SparkEntry.entry(spark).count() > 0, "flagship pipeline must emit rows")
    // every oracle key must have a matching query implementation
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("run counters ride the main pass via observe() — no second scan") {
    import spark.implicits._
    // the reference tallies processed/skipped/failed counters alongside the
    // run (master_script.py run summary); Spark-first those are a side
    // OBSERVATION on the pipeline's own pass — zero extra jobs or scans,
    // exact at any corpus size (unlike accumulators, observe metrics are
    // action-consistent)
    val obs = org.apache.spark.sql.Observation("run_counters")
    val docs = Tables.documents(spark, sfDir)
      .observe(obs,
        count(lit(1)).as("processed"),
        count(when($"n_chars" < 100, 1)).as("skipped_short"),
        count(when($"lang".isNull, 1)).as("failed_no_lang"))
      .filter($"n_chars" >= 100)
    val kept = docs.count()
    val m = obs.get
    assert(m("processed") == Tables.documents(spark, sfDir).count())
    assert(m("skipped_short").asInstanceOf[Long] ==
           m("processed").asInstanceOf[Long] - kept)
    assert(m("failed_no_lang") == 0L)
  }

  test("p19 training mix: accounting is unbiased and gates precede the shuffle") {
    import spark.implicits._
    // the quality/repetition/mix gates are per-row column math: they must sit
    // below the dedup window's exchange so the corpus shrinks before moving
    // (plan checked before any caching — a cached plan hides its exchanges)
    val planned = physical(SparkEntry.queries("p19_training_mix")(spark, sfDir))
    val exchanges = planned.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    exchanges.find(_.toString.contains("content_md5")) match {
      case Some(dedupEx) =>
        // a FilterExec evaluating the quality expression must sit strictly
        // below the exchange (not just any stray literal in the plan text);
        // Catalyst pushes the predicate through the projection, so the
        // condition carries the inlined formula — match its length/500.0
        // normalization term, which appears nowhere else in the plan
        val gateBelow = dedupEx.child.collect {
          case f: org.apache.spark.sql.execution.FilterExec
              if f.condition.toString.contains("500.0") => f
        }
        assert(gateBelow.nonEmpty,
          s"quality gate must run before the dedup shuffle:\n${dedupEx.child}")
      case None => fail("expected the dedup window's hash exchange in the plan")
    }
    val mix = SparkEntry.queries("p19_training_mix")(spark, sfDir).cache()
    // weights are exactly 5.0 / 20.0, so weighted tokens are whole multiples
    val bad = mix.filter(
      ($"source".isin("src0", "src1") && $"weighted_tokens" =!= $"tokens_kept" * 5.0) ||
      (!$"source".isin("src0", "src1") && $"weighted_tokens" =!= $"tokens_kept" * 20.0))
    assert(bad.isEmpty, "weighted tokens must equal tokens x inverse rate")
    assert(mix.count() > 0, "the gates must not filter the corpus to nothing")
    mix.unpersist()
  }

  test("p04 hierarchy closure matches the arithmetic subtree definition") {
    // In the balanced tree parent(i) = (i-1) div 2, the subtree of node 5 is
    // exactly the ids whose path to root passes through 5.
    def inSubtree(id: Long): Boolean = {
      var n = id
      while (n > 5) n = (n - 1) / 2
      n == 5
    }
    val maxId = Tables.documents(spark, sfDir).agg(max("doc_id")).head().getLong(0)
    val expected = (0L to maxId).filter(inSubtree).toSet
    val got = PipelineOps.hierarchyDescendants(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
  }

  test("p05 incremental diff statuses partition the corpus") {
    val df = SparkEntry.queries("p05_incremental_diff")(spark, sfDir)
    val byStatus = df.groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = Tables.documents(spark, sfDir).count()
    assert(byStatus.values.sum == n)
    // new = doc_id%5==4; updated = in state && doc_id%3==0
    assert(byStatus("new") == Tables.documents(spark, sfDir).filter(col("doc_id") % 5 === 4).count())
    assert(byStatus("updated") ==
      Tables.documents(spark, sfDir).filter(col("doc_id") % 5 =!= 4 && col("doc_id") % 3 === 0).count())
  }

  test("p06 upsert keeps exactly one row per key at the max version") {
    val df = SparkEntry.queries("p06_state_upsert")(spark, sfDir)
    assert(df.count() == df.select("doc_id").distinct().count())
    assert(df.filter(col("doc_id") % 3 === 0 && col("version") =!= 3).isEmpty)
  }

  test("p07 missing-from-state is the complement of the state snapshot") {
    val missing = SparkEntry.queries("p07_missing_from_state")(spark, sfDir)
    assert(missing.filter(col("doc_id") % 5 =!= 4).isEmpty)
  }

  test("p26 sequence packing: every interior sequence is exactly full and carry-over balances") {
    import spark.implicits._
    val df = SparkEntry.queries("p26_sequence_packing")(spark, sfDir).cache()
    // token conservation: per (source, shard) the packed token mass equals
    // the token mass of the docs that entered the pack
    val packed = df.groupBy($"source", $"shard").agg(
      sum($"n_tokens").as("packed_toks"), max($"seq_id").as("last_seq"),
      count(lit(1)).as("n_seqs"))
    val entered = Tables.documents(spark, sfDir)
      .select($"source", ($"doc_id" % 2).as("shard"),
        size(expr("filter(split(lower(trim(text)), '\\\\s+'), t -> t <> '')"))
          .cast("long").as("n_toks"))
      .filter($"n_toks" > 0)
      .groupBy($"source", $"shard").agg(sum($"n_toks").as("entered_toks"))
    assert(packed.join(entered, Seq("source", "shard"))
      .filter($"packed_toks" =!= $"entered_toks").isEmpty, "token mass not conserved")
    // sequences are contiguous 0..last with no gaps
    assert(packed.filter($"n_seqs" =!= $"last_seq" + 1).isEmpty, "gap in sequence ids")
    // the concatenated stream fills every sequence to the exact budget
    // except the final partial one
    assert(df.join(packed, Seq("source", "shard"))
      .filter($"seq_id" < $"last_seq" && $"n_tokens" =!= 128L).isEmpty,
      "an interior sequence is not exactly budget-full")
    assert(df.filter($"n_tokens" > 128L).isEmpty, "a sequence exceeds the budget")
    // carry-over balance: docs in a sequence = docs starting there + docs
    // straddling in from the previous sequence
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source", $"shard").orderBy($"seq_id")
    assert(df.withColumn("carry_in", coalesce(lag($"n_straddling", 1).over(w), lit(0L)))
      .filter($"n_docs" =!= $"n_starting" + $"carry_in").isEmpty,
      "doc carry-over does not balance across a boundary")
    // plan: one hash exchange for the placement window, one (partial-
    // aggregated) for the rollup, and only the presentation sort ranges
    val planned = physical(SparkEntry.queries("p26_sequence_packing")(spark, sfDir))
    val shuffles = planned.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.count(!_.toString.contains("rangepartitioning")) <= 2,
      s"packing must cost at most two hash exchanges:\n$planned")
    df.unpersist()
  }

  test("p27 curated packing: p26 invariants hold and curation strictly shrinks the pack") {
    import spark.implicits._
    val df = SparkEntry.queries("p27_curated_packing")(spark, sfDir).cache()
    val per = df.groupBy($"source", $"shard").agg(
      sum($"n_tokens").as("toks"), max($"seq_id").as("last_seq"), count(lit(1)).as("n_seqs"))
    // p26's structural invariants survive the composition
    assert(per.filter($"n_seqs" =!= $"last_seq" + 1).isEmpty, "gap in sequence ids")
    assert(df.join(per, Seq("source", "shard"))
      .filter($"seq_id" < $"last_seq" && $"n_tokens" =!= 128L).isEmpty,
      "an interior sequence is not exactly budget-full")
    // curation only removes docs: every shard packs no more than the
    // uncurated p26 pack, and strictly fewer docs overall
    val full = SparkEntry.queries("p26_sequence_packing")(spark, sfDir)
      .groupBy($"source", $"shard").agg(sum($"n_tokens").as("full_toks"),
        sum($"n_starting").as("full_docs"))
    assert(per.join(full, Seq("source", "shard"))
      .filter($"toks" > $"full_toks").isEmpty,
      "curated pack exceeds the uncurated pack somewhere")
    val curatedDocs = df.agg(sum($"n_starting")).head().getLong(0)
    val fullDocs = SparkEntry.queries("p26_sequence_packing")(spark, sfDir)
      .agg(sum($"n_starting")).head().getLong(0)
    assert(curatedDocs < fullDocs,
      s"curation must drop docs: packed $curatedDocs of $fullDocs")
    // the histogram quartile gate drops at least ceil(n/4) docs per source
    // (the whole cutoff tie-class goes), so survivors cap at 3/4 strictly
    assert(curatedDocs <= math.ceil(fullDocs * 0.75).toLong)
    df.unpersist()
    // the round-4 scale flag is gone: no window ranks the corpus per
    // source (the d24 cutoff build windows only histogram rows; the dedup
    // and packing windows partition by content_md5 / (source, shard))
    // (the packing window partitions by (source, shard) and the histogram
    // cutoff build windows bounded (source, quality) rows — both fine; the
    // dead shape is ntile's spec: partition by source alone, ordered by
    // (quality, doc_id), i.e. a per-source rank of CORPUS rows)
    val planText = physical(SparkEntry.queries("p27_curated_packing")(spark, sfDir)).toString
    val perSourceRank = planText.split("\n").filter(
      _.matches(""".*\], \[source#\d+\], \[quality#\d+[^,]*, doc_id.*"""))
    assert(perSourceRank.isEmpty,
      s"p27 must not rank the corpus within source:\n${perSourceRank.mkString("\n")}")
  }

  test("p33 attrition funnel: conservation, ordered attribution, keeper never shadowed") {
    import spark.implicits._
    val df = SparkEntry.queries("p33_attrition_funnel")(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir)
    // conservation: every doc gets exactly one verdict
    assert(df.count() == docs.count(), "every doc must get exactly one verdict")
    assert(df.select($"doc_id").distinct().count() == df.count())
    // rebuild the stage artifacts independently of the operator
    val fp = md5(regexp_replace(lower($"text"), "\\s+", " "))
    val withFp = docs.withColumn("content_md5", fp)
    val evalSet = withFp.filter($"doc_id" % 7 === 3)
      .select($"content_md5").distinct().as[String].collect().toSet
    val scored = docs.select($"doc_id", $"source", $"text",
      operators.TextOps.qualityCol.as("quality"))
    val cuts = operators.Dedup.histogramQualityCutoffs(scored)
    val j = df
      .join(withFp.select($"doc_id", $"content_md5"), "doc_id")
      .join(cuts, "source").cache()
    // stage laws, each against the independently rebuilt artifacts:
    // kept ⇒ above cutoff, clean, and the group's smallest surviving id
    val kept = j.filter($"stage" === "kept").cache()
    assert(kept.filter($"quality" <= $"cutoff").isEmpty, "a kept doc is below the gate")
    assert(kept.filter($"content_md5".isin(evalSet.toSeq: _*)).isEmpty,
      "a kept doc is contaminated")
    assert(kept.groupBy($"content_md5").count().filter($"count" > 1).isEmpty,
      "two kept docs share a fingerprint")
    // ordered attribution: 'contaminated' means stage 1 PASSED first
    assert(j.filter($"stage" === "contaminated" && $"quality" <= $"cutoff").isEmpty,
      "a below-gate doc must report 'quality', not 'contaminated'")
    assert(j.filter($"stage" === "quality" && $"quality" > $"cutoff").isEmpty)
    // keeper never shadowed: every exact_dup has a KEPT doc with the same
    // fingerprint and a smaller id (a dropped earlier copy doesn't count)
    val dups = j.filter($"stage" === "exact_dup")
      .select($"doc_id".as("dup_id"), $"content_md5")
    assert(dups.join(kept.select($"doc_id".as("keep_id"), $"content_md5"), "content_md5")
      .filter($"keep_id" < $"dup_id").select($"dup_id").distinct().count() == dups.count(),
      "an exact_dup row lacks a smaller kept keeper")
    // the funnel actually funnels on this data: the three gate verdicts
    // always occur; 'exact_dup' exactly when some fingerprint group holds
    // ≥2 stage-1/2 survivors (the driver testdata has no exact copies
    // below sf0.1, so an unconditional four-stage assert is data-infeasible)
    val stages = df.select($"stage").distinct().as[String].collect().toSet
    assert(stages.subsetOf(Set("quality", "contaminated", "exact_dup", "kept")))
    assert(Set("quality", "contaminated", "kept").subsetOf(stages), s"got $stages")
    val expectDup = j.filter($"stage" === "kept" || $"stage" === "exact_dup")
      .groupBy($"content_md5").count().filter($"count" > 1).limit(1).count() > 0
    assert(stages.contains("exact_dup") == expectDup)
    // scale shape: no per-source corpus rank (p27's dead shape) — the only
    // corpus window partitions by content_md5
    val planText = physical(SparkEntry.queries("p33_attrition_funnel")(spark, sfDir)).toString
    val perSourceRank = planText.split("\n").filter(
      _.matches(""".*\], \[source#\d+\], \[quality#\d+[^,]*, doc_id.*"""))
    assert(perSourceRank.isEmpty, s"p33 must not rank the corpus within source")
    kept.unpersist(); j.unpersist(); df.unpersist()
  }

  test("p34 dataset card: composition sums, quartile order, cross-checked mass") {
    import spark.implicits._
    val card = SparkEntry.queries("p34_dataset_card")(spark, sfDir)
      .as[(String, Long)].collect().toMap
    val docs = Tables.documents(spark, sfDir)
    assert(card("n_docs") == docs.count())
    assert(card("n_chars") == docs.agg(sum($"n_chars")).head().getLong(0))
    assert(card("mean_doc_tokens") == card("n_tokens") / card("n_docs"))
    assert(card("dup_ppm") >= 0L && card("dup_ppm") < 1000000L)
    // truncated ppm composition sums land within |domain| of one million
    for (prefix <- Seq("lang_ppm:", "source_ppm:")) {
      val parts = card.filter(_._1.startsWith(prefix)).values
      assert(parts.nonEmpty)
      assert(parts.sum <= 1000000L && parts.sum > 1000000L - parts.size,
        s"$prefix sums to ${parts.sum} over ${parts.size} entries")
    }
    // quartiles ordered and inside the quality formula's range
    val Seq(q1, q2, q3) =
      Seq("quality_q1_e4", "quality_q2_e4", "quality_q3_e4").map(card)
    assert(q1 <= q2 && q2 <= q3, s"quartiles out of order: $q1 $q2 $q3")
    assert(q1 >= 0L && q3 <= 10000L)
    // d24 consistency: q1 equals the histogram cutoff convention globally
    val scored = docs.select(operators.TextOps.qualityCol.as("q"))
    val n = card("n_docs")
    val exact = scored.as[Double].collect().sorted.apply((math.ceil(0.25 * n) - 1).toInt)
    assert(q1 == math.floor(exact * 10000 + 0.5).toLong,
      s"q1 drifted from the exact sorted quartile: $q1 vs $exact")
  }

  test("p35 retention: time travel at the horizon reads only kept rows") {
    import spark.implicits._
    val df = SparkEntry.queries("p35_retention_policy")(spark, sfDir).cache()
    // rebuild history + horizon independently
    val hist = SparkEntry.queries("p22_state_history")(spark, sfDir)
      .select($"user_id", $"event_id", $"valid_from", $"valid_to")
    val horizon = Tables.events(spark, sfDir)
      .agg((max($"ts") - expr("INTERVAL 7 DAYS")).as("h")).head().getTimestamp(0)
    val j = df.join(hist, Seq("user_id", "event_id", "valid_from")).cache()
    // SAFETY: every version live at the horizon (and so at any T >= horizon)
    // survives the purge — the p31 reconstruction contract
    val liveAtHorizon = j.filter($"valid_from" <= lit(horizon) &&
      ($"valid_to".isNull || $"valid_to" > lit(horizon)))
    assert(liveAtHorizon.filter(!$"kept").isEmpty,
      "purged a version live at the horizon — time travel broken")
    // the valid_to rule is LOAD-BEARING on this data: some kept row is
    // saved ONLY by interval coverage (old valid_from, deep rank)
    assert(j.filter($"reason" === "covered" && $"valid_from" < lit(horizon) &&
      $"version_rank" > operators.PipelineOps.RetentionKeepVersions.toLong)
      .limit(1).count() == 1L,
      "fixture does not exercise the covered-vs-born-after distinction")
    // ordered reasons match their predicates
    assert(j.filter($"reason" === "current" && $"valid_to".isNotNull).isEmpty)
    assert(j.filter($"reason" === "version" &&
      $"version_rank" > operators.PipelineOps.RetentionKeepVersions.toLong).isEmpty)
    assert(j.filter($"reason" === "purged" && $"kept").isEmpty)
    // the policy actually purges on this data
    assert(j.filter($"reason" === "purged").limit(1).count() == 1L)
    j.unpersist(); df.unpersist()
  }

  test("p36 erasure impact: base rate, monotone amplification, chunk cross-check") {
    import spark.implicits._
    val rows = SparkEntry.queries("p36_erasure_impact")(spark, sfDir)
      .collect().map(r => r.getAs[String]("artifact") ->
        (r.getAs[Long]("impacted_units"), r.getAs[Long]("total_units"),
         r.getAs[Long]("impact_ppm"))).toMap
    val docs = Tables.documents(spark, sfDir)
    val nDel = docs.filter(pmod($"doc_id", lit(operators.EndToEnd.ErasureMod)) ===
      operators.EndToEnd.ErasureResidue).count()
    assert(nDel > 0, "fixture deletes nothing")
    assert(rows("documents")._1 == nDel && rows("documents")._2 == docs.count())
    // a sequence holds >= 1 doc, so impacted sequences <= deleted docs x
    // max-seqs-per-doc, and >= ceil(deleted tokens / budget) > 0
    assert(rows("sequences")._1 > 0L && rows("sequences")._1 <= rows("sequences")._2)
    // every deleted doc contributes >= 1 chunk, chunks can be shared:
    // impacted chunk digests <= total chunks of deleted docs
    val delChunks = operators.TextOps.chunkRows(docs)
      .filter(pmod($"doc_id", lit(operators.EndToEnd.ErasureMod)) ===
        operators.EndToEnd.ErasureResidue)
    assert(rows("chunks")._1 > 0L && rows("chunks")._1 <= delChunks.count())
    // an impacted digest is exactly one some deleted doc carries
    assert(rows("chunks")._1 ==
      delChunks.select($"chunk_hash").distinct().count(),
      "impacted digests must equal the deleted docs' distinct digest set")
    // ppm law on every row
    rows.values.foreach { case (imp, tot, ppm) =>
      assert(ppm == imp * 1000000L / math.max(tot, 1L), s"ppm drifted: $imp/$tot=$ppm")
    }
  }

  test("p28 freshness report: one row per feed, freshest feed at zero staleness") {
    import spark.implicits._
    val df = SparkEntry.queries("p28_freshness_report")(spark, sfDir).cache()
    val nTypes = Tables.events(spark, sfDir).select($"event_type").distinct().count()
    assert(df.count() == nTypes)
    // exactly the freshest feed(s) sit at zero staleness, none negative
    assert(df.filter($"staleness_hours" < 0).isEmpty)
    assert(df.filter($"staleness_hours" === 0).count() >= 1)
    // the 7d window can never exceed the feed's total volume
    assert(df.filter($"n_last_7d" > $"n_events").isEmpty)
    assert(df.filter($"n_events" <= 0).isEmpty)
    df.unpersist()
  }

  test("p30 global index: gap-free, order-lawful, no single-reducer window") {
    import spark.implicits._
    val df = SparkEntry.queries("p30_global_index")(spark, sfDir).cache()
    val n = Tables.documents(spark, sfDir).count()
    // contiguity: exactly [0, n) with no gaps or repeats
    assert(df.count() == n && df.select($"global_idx").distinct().count() == n)
    val mm = df.agg(min($"global_idx"), max($"global_idx")).head()
    assert(mm.getLong(0) == 0L && mm.getLong(1) == n - 1)
    // order law: index order IS (source, doc_id) order — lag under the
    // canonical sort must always step by exactly 1
    val w = org.apache.spark.sql.expressions.Window.orderBy($"source", $"doc_id")
    assert(df.withColumn("prev", lag($"global_idx", 1, -1L).over(w))
      .filter($"global_idx" =!= $"prev" + 1L).isEmpty,
      "global_idx must advance by 1 along the canonical order")
    // the enumeration window itself is per-partition (pid), never a global
    // single-reducer sort — only the presentation orderBy may range-exchange
    val planStr = plan("p30_global_index")
    assert(planStr.contains("[pid"),
      "the rank window must partition by pid (partition-parallel)")
    df.unpersist()
  }

  test("p30 fan-out follows the session conf, never a literal") {
    import spark.implicits._
    // the enumeration's range exchange must take its width from
    // spark.sql.shuffle.partitions (4 in this suite, thousands on a real
    // cluster) — the pid domain IS the configured width, not a constant 32
    val conf = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val rows = Tables.documents(spark, sfDir).select($"doc_id", $"source")
    val (assigned, n) = graft.operators.PipelineOps.twoPhaseIndex(rows, 0L)
    assert(n == rows.count())
    val pids = rows.repartitionByRange(conf, $"source", $"doc_id")
      .select(org.apache.spark.sql.functions.spark_partition_id()).distinct().count()
    assert(pids <= conf && pids > 1,
      s"range fan-out must be bounded by the session conf ($conf), saw $pids")
    // and under a different conf the same core widens with it
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val (assigned7, n7) = graft.operators.PipelineOps.twoPhaseIndex(rows, 0L)
      assert(n7 == n)
      assert(assigned7.select(max($"global_idx")).head().getLong(0) == n - 1)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("p10 partitioned sink writes one directory per space") {
    val out = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.documents(spark, sfDir).write.mode("overwrite")
      .partitionBy("source").parquet(out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("source="))
    val expected = Tables.documents(spark, sfDir).select("source").distinct().count()
    assert(dirs.length == expected)
    // partition pruning: reading one space must only scan its directory
    val pruned = spark.read.parquet(out).filter(col("source") === "src3")
    val scanned = pruned.queryExecution.executedPlan.collectLeaves().head
      .metrics.get("numFiles")
    pruned.collect()
    assert(pruned.count() == Tables.documents(spark, sfDir).filter(col("source") === "src3").count())
  }

  test("p32 pagerank: mass bounds hold, ranks discriminate, runs are identical") {
    val df = SparkEntry.queries("p32_pagerank")(spark, sfDir)
    val rows = df.collect()
    val n = rows.length
    assert(n > 0)
    val ranks = rows.map(_.getAs[Long]("rank_ppm"))
    // every node keeps the teleport base; total mass never exceeds the
    // initial N * 1e6 (damping only shrinks it, dangling ids only leak it)
    assert(ranks.forall(_ >= 150000L), "teleport base violated")
    assert(ranks.sum <= n.toLong * 1000000L, "mass grew — damping arithmetic broken")
    assert(ranks.distinct.length > 1, "graph produced a uniform ranking — degenerate")
    val again = SparkEntry.queries("p32_pagerank")(spark, sfDir)
      .collect().map(_.getAs[Long]("rank_ppm"))
    assert(ranks.toSeq == again.toSeq, "integer PageRank must be run-to-run identical")
  }

  test("p31 point-in-time returns exactly the latest version per key as of T") {
    val rows = SparkEntry.queries("p31_point_in_time")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // at most one live interval per key at any instant
    assert(rows.map(_.getAs[Long]("user_id")).distinct.length == rows.length)
    val asOf = rows.head.getAs[java.sql.Timestamp]("as_of")
    // brute-force replay: the version at T is the max-(ts, event_id)
    // qualifying event with ts <= T
    val expected = operators.PipelineOps.stateHistory(spark, sfDir)
      .filter(col("valid_from") <= lit(asOf))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
      .map { case (u, vs) =>
        u -> vs.maxBy(r => (r.getAs[java.sql.Timestamp]("valid_from").getTime,
                            r.getAs[Long]("event_id"))).getAs[Long]("event_id")
      }
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      assert(expected(u) == r.getAs[Long]("version_event_id"),
        s"user $u: expected version ${expected(u)}, got $r")
      assert(!r.getAs[java.sql.Timestamp]("valid_from").after(asOf))
    }
    assert(expected.size == rows.length, "a key with history before T went missing")
  }

  test("p37 publish diff: fixed shards cascade, CDC chunks stay put") {
    val s = spark
    import s.implicits._
    val df = SparkEntry.queries("p37_publish_diff")(spark, sfDir).cache()
    try {
      val srcs = Tables.documents(spark, sfDir).select("source").distinct().count()
      assert(df.count() == srcs, "one row per source")
      assert(df.filter($"fixed_changed" > $"fixed_total" ||
        $"cdc_new" > $"cdc_total" || $"fixed_total" <= 0 || $"cdc_total" <= 0).isEmpty)
      // the layout argument, measured: content-defined re-publish is
      // strictly cheaper than fixed-boundary for EVERY source (new docs
      // are interleaved through each source, so fixed shards cascade)
      assert(df.filter($"fixed_changed_ppm" <= $"cdc_new_ppm").isEmpty,
        "fixed layout must churn more than CDC on interleaved inserts")
      // CDC new-digest share is bounded by the new-doc share's chunk mass:
      // new docs are 1/3 of the corpus — allow headroom for unique-chunk
      // skew but it must stay well below the fixed cascade
      assert(df.agg(max($"cdc_new_ppm")).head().getLong(0) < 700000L)
      assert(df.agg(min($"fixed_changed_ppm")).head().getLong(0) > 700000L)
    } finally df.unpersist()
  }

  test("p38 BM25: saturation, length normalization, non-match exclusion, top-k plan") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_bm25").toString
    val filler = (n: Int) => Seq.fill(n)("filler").mkString(" ")
    Seq(
      (1L, "spark spark spark spark " + filler(1)),   // tf 4, dl 5
      (2L, "spark " + filler(4)),                     // tf 1, dl 5
      (3L, "spark " + filler(45)),                    // tf 1, dl 46
      (4L, filler(5)))                                // no query term
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("srcX"))
      .withColumn("n_chars", length($"text"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("p38_bm25_rank")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("score_milli")).toMap
    assert(!out.contains(4L), "docs matching no query term must not rank")
    assert(out(1L) > out(2L), "more occurrences must score higher")
    assert(out(1L) < 4 * out(2L), "tf must saturate below linear")
    assert(out(2L) > out(3L), "same tf in a longer doc must score lower")
    // real corpus: bounded result, strictly ordered, TakeOrdered plan
    val df = SparkEntry.queries("p38_bm25_rank")(spark, sfDir)
    val rows = df.collect()
    assert(rows.length <= operators.PipelineOps.Bm25K && rows.nonEmpty)
    val scores = rows.map(_.getAs[Long]("score_milli")).toSeq
    assert(scores == scores.sorted.reverse, "ranking must descend")
    assert(plan("p38_bm25_rank").contains("TakeOrderedAndProject"),
      "top-k must not global-sort")
  }

  test("p39 BM25 fold: additively folded stats re-rank identically to one-shot") {
    val fold = SparkEntry.queries("p39_bm25_fold")(spark, sfDir)
    val oneShot = SparkEntry.queries("p38_bm25_rank")(spark, sfDir)
    assert(fold.except(oneShot).isEmpty && oneShot.except(fold).isEmpty,
      "ranking from folded N/T/df must equal the one-shot ranking")
  }

  test("p38 parameterized terms: ONE corpus scan regardless of |terms|, counts exact") {
    import spark.implicits._
    // ten terms arriving as DATA (a query table), not code constants —
    // the reference's CQL terms are user input
    val terms = Seq("spark", "vector", "stream", "data", "query", "index",
                    "join", "filter", "table", "cache")
    val termsDf = terms.toDF("term")
    val docs = Tables.documents(spark, sfDir)
    val ranked = operators.PipelineOps.bm25RankQuery(docs, termsDf)
    val sample = ranked.limit(20).collect()
    // plan law: corpus scans must not multiply with the query length — the
    // count is a CONSTANT (ranking side + the broadcast stats subtree),
    // identical to the 3-term keyed plan (the interpreted per-term filter()
    // alternative is |terms| array passes; this is the single-scan kernel)
    def deepScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] =
      p.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => deepScans(q.plan)
      }.flatten
    // executedPlan's root is the AdaptiveSparkPlanExec LEAF — counting on it
    // finds nothing and 0 == 0 passes vacuously; peel the AQE wrapper first
    // and demand at least one real scan so an empty plan can never pass
    val n10 = deepScans(physical(ranked)).length
    val r3 = SparkEntry.queries("p38_bm25_rank")(spark, sfDir)
    r3.limit(1).collect()
    val n3 = deepScans(physical(r3)).length
    assert(n10 >= 1 && n10 == n3 && n10 <= 2,
      s"scan count must be |terms|-independent: 10 terms -> $n10, 3 terms -> $n3")
    // value law: the kernel's tf per term equals the independently computed
    // per-term count on a sample of ranked docs; output columns are
    // POSITIONAL tf_<i> in sorted-distinct term order (terms are data,
    // never identifiers)
    val ordered = terms.distinct.sorted
    val expected = docs
      .select($"doc_id" +: ordered.zipWithIndex.map { case (t, i) =>
        size(filter(split(lower($"text"), "\\s+"), x => x === lit(t)))
          .cast("long").as(s"tf_$i") }: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    sample.foreach { r =>
      val ref = expected(r.getLong(0))
      ordered.indices.foreach { i =>
        assert(r.getAs[Long](s"tf_$i") == ref.getAs[Long](s"tf_$i"),
          s"tf_$i (${ordered(i)}) mismatch for doc ${r.getLong(0)}")
      }
    }
  }

  test("p38 terms are data, not code: hostile/duplicate/odd terms never reach SQL text") {
    import spark.implicits._
    // apostrophes, dots, spaces-after-trim, parens, SQL payloads, dupes —
    // every historical injection/ambiguity class for string-built expr()
    val hostile = Seq("o'brien", "a.b", " spark ", "x)", "select", "spark",
      "'); drop--", "java_method('java.lang.System','exit',0)", "`tick`")
    val docs = Seq(
      (1L, "s", "o'brien a.b spark spark select"),
      (2L, "s", "plain text without matches"),
      (3L, "s", "x) `tick` spark")).toDF("doc_id", "source", "text")
    val ranked = operators.PipelineOps.bm25RankQuery(docs, hostile.toDF("term"))
    val rows = ranked.collect() // must not throw parse/analysis errors
    assert(rows.map(_.getLong(0)).toSet == Set(1L, 3L), "match set exact")
    // term->index is the sorted-distinct normalized order; counts exact
    val ordered = hostile.map(_.trim.toLowerCase(java.util.Locale.ROOT))
      .filter(_.nonEmpty).distinct.sorted
    val doc1 = rows.find(_.getLong(0) == 1L).get
    assert(doc1.getAs[Long](s"tf_${ordered.indexOf("o'brien")}") == 1L)
    assert(doc1.getAs[Long](s"tf_${ordered.indexOf("a.b")}") == 1L)
    assert(doc1.getAs[Long](s"tf_${ordered.indexOf("spark")}") == 2L)
    assert(doc1.getAs[Long](s"tf_${ordered.indexOf("java_method('java.lang.system','exit',0)")}") == 0L)
    val doc3 = rows.find(_.getLong(0) == 3L).get
    assert(doc3.getAs[Long](s"tf_${ordered.indexOf("`tick`")}") == 1L)
    assert(doc3.getAs[Long](s"tf_${ordered.indexOf("x)")}") == 1L)
    // an all-unusable term table fails loudly, not with a phantom ranking
    intercept[IllegalArgumentException] {
      operators.PipelineOps.bm25RankQuery(docs, Seq("", "  ").toDF("term"))
    }
  }

  test("p38 overflow guard: wraparound raises instead of corrupting the ranking") {
    import spark.implicits._
    // stats with total_toks near the T*tf bound: 44000 * 3e14 * tf(>1)
    // overflows Long — the guard must raise, not emit a wrapped score
    val base = Seq((1L, "srcX", 5L, 2L, 1L, 0L))
      .toDF("doc_id", "source", "dl", "tf_0", "tf_1", "tf_2")
    val stats = Seq((10L, 300000000000000L, 1L, 1L, 1L))
      .toDF("n_docs", "total_toks", "df_0", "df_1", "df_2")
    val ex = intercept[Exception] {
      operators.PipelineOps.bm25From(base, stats).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("graft bm25: integer overflow")),
      s"expected loud overflow, got: ${messages(ex).mkString(" | ")}")
  }
}
