package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.{Dedup, Similarity}

class DedupSimilaritySpec extends SparkSpec {

  test("custom expressions run inside whole-stage codegen") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Tables.embeddings(spark, sfDir)
      .select(GraftFunctions.cosineSim($"embedding", $"embedding").as("self"))
    // cosine(v, v) == 1 up to fp error
    assert(df.filter(abs($"self" - 1.0) > 1e-9).isEmpty)
    // "*" prefixes mark operators inside a WholeStageCodegen stage
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("* Project"), s"cosine_sim fell out of codegen:\n$p")
  }

  test("d01 exact dedup groups injected duplicates to one survivor") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // planted corpus: 0/1 share content modulo whitespace; 2 differs
    val docs = Seq((0L, "alpha  beta\tgamma"), (1L, "alpha beta gamma"), (2L, "delta"))
      .toDF("doc_id", "text")
    val fp = md5(regexp_replace(lower($"text"), "\\s+", " "))
    val grouped = docs.withColumn("fp", fp).groupBy("fp").agg(min("doc_id").as("keeper"), count(lit(1)).as("n"))
    val m = grouped.collect().map(r => r.getAs[Long]("keeper") -> r.getAs[Long]("n")).toMap
    assert(m == Map(0L -> 2L, 2L -> 1L))
  }

  test("d02 minhash estimate tracks true jaccard on planted near-dups") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val nearDup = (1 to 57).map(i => s"w$i").mkString(" ") + " x1 x2 x3"
    val far = (100 to 160).map(i => s"v$i").mkString(" ")
    val docs = Seq((0L, base), (1L, nearDup), (2L, far)).toDF("doc_id", "text")
    val sigs = docs.select($"doc_id",
      GraftFunctions.minhashSig(
        GraftFunctions.shingleHashes(split(lower($"text"), "\\s+"), lit(3)), lit(32)).as("sig"))
    val a = sigs.select($"doc_id".as("da"), $"sig".as("sig_a"))
    val b = sigs.select($"doc_id".as("db"), $"sig".as("sig_b"))
    val est = a.join(b, $"da" < $"db")
      .select($"da", $"db",
        (expr("aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)") / 32.0)
          .as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(est((0L, 1L)) > 0.5, s"near-dup pair scored ${est((0L, 1L))}")
    assert(est((0L, 2L)) < 0.2, s"unrelated pair scored ${est((0L, 2L))}")
  }

  test("d38 sketch overlap: bounds hold on every pair, matrix complete, sketches tiny") {
    import spark.implicits._
    val df = SparkEntry.queries("d38_sketch_overlap")(spark, sfDir).cache()
    val nSources = Tables.documents(spark, sfDir).select($"source").distinct().count()
    // complete upper triangle, one row per unordered source pair
    assert(df.count() == nSources * (nSources - 1) / 2)
    // every claim boolean must hold — the oracle hashes them as TRUE
    assert(df.filter(!$"a_est_ok" || !$"b_est_ok" ||
                     !$"union_est_ok" || !$"jaccard_est_ok").isEmpty,
      "an HLL estimate drifted past its error bound")
    // exact anchors agree with d36's matrix
    val d36 = SparkEntry.queries("d36_corpus_overlap")(spark, sfDir)
      .select($"src_a", $"src_b", $"jaccard_permille".as("jp36"))
    assert(df.join(d36, Seq("src_a", "src_b"))
      .filter($"jaccard_permille" =!= $"jp36").isEmpty)
    // the scale claim: a per-source sketch is kilobytes, not corpus-sized
    val maxSketch = Tables.documents(spark, sfDir)
      .select($"source", explode(graft.functions.GraftFunctions.shingleStrings(
        split(lower(trim($"text")), "\\s+"), lit(3))).as("shingle"))
      .groupBy($"source")
      .agg(hll_sketch_agg($"shingle", lit(operators.Dedup.SketchLgK)).as("sk"))
      .select(max(length($"sk"))).head().getInt(0)
    assert(maxSketch < 16 * 1024, s"sketch must stay KB-sized, got $maxSketch bytes")
    df.unpersist()
  }

  test("d02/m09 keyed pair views are successor-bounded subsets of the exhaustive views") {
    import spark.implicits._
    val m = operators.Dedup.NeighborWindow
    // subset: the bounded view never invents a pair
    val bounded = SparkEntry.queries("d02_minhash_lsh")(spark, sfDir).cache()
    val full = operators.Dedup.minhashLsh(spark, sfDir, successorWindow = None).cache()
    assert(bounded.except(full).isEmpty, "bounded d02 must be a subset of exhaustive d02")
    assert(bounded.count() > 0)
    // bound: each doc links to at most M successors per band (8 bands)
    val maxFan = bounded.groupBy($"doc_a").count().agg(max($"count")).head().getLong(0)
    assert(maxFan <= 8L * m, s"per-doc fan-out $maxFan exceeds bands*M = ${8 * m}")
    // connectivity: min-label closure over BOTH views reaches identical
    // components (the cap drops only transitively-redundant pairs)
    def components(pairs: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      var lbl = pairs.select($"doc_a".as("id")).union(pairs.select($"doc_b".as("id")))
        .distinct().select($"id", $"id".as("lbl"))
      val edges = pairs.select($"doc_a", $"doc_b")
        .union(pairs.select($"doc_b".as("doc_a"), $"doc_a".as("doc_b")))
      for (_ <- 1 to 6) {
        val prop = edges.join(lbl, $"doc_a" === $"id")
          .groupBy($"doc_b".as("id2")).agg(min($"lbl").as("nlbl"))
        lbl = lbl.join(prop, $"id" === $"id2", "left")
          .select($"id", least($"lbl", coalesce($"nlbl", $"lbl")).as("lbl"))
          .localCheckpoint(true)
      }
      lbl.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val cb = components(bounded)
    val cf = components(full.select($"doc_a", $"doc_b"))
    assert(cb == cf,
      "successor-capped pairs must close to the same clusters as exhaustive pairs")
    // m09 rides the same cap
    val m09b = SparkEntry.queries("m09_phash_neardup")(spark, sfDir)
    val m09f = operators.Multimodal.phashNeardup(spark, sfDir, successorWindow = None)
    assert(m09b.except(m09f).isEmpty, "bounded m09 must be a subset of exhaustive m09")
    val m09fan = m09b.groupBy($"doc_a").count().agg(max($"count")).head().getLong(0)
    assert(m09fan <= 4L * m, s"m09 per-doc fan-out $m09fan exceeds bands*M = ${4 * m}")
    bounded.unpersist(); full.unpersist()
  }

  test("d03 simhash hamming is small for near-dups, large for unrelated") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val base = (1 to 80).map(i => s"tok$i").mkString(" ")
    val near = (1 to 78).map(i => s"tok$i").mkString(" ") + " zz1 zz2"
    val far = (500 to 580).map(i => s"q$i").mkString(" ")
    val df = Seq((0L, base), (1L, near), (2L, far)).toDF("id", "text")
      .select($"id", GraftFunctions.simhash64(split($"text", " ")).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(m(0L) ^ m(1L)) <= 12)
    assert(java.lang.Long.bitCount(m(0L) ^ m(2L)) >= 20)
  }

  test("d43 wide simhash banding is exact at hamming<=3: equals brute force all-pairs") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // the pigeonhole claim, checked against ground truth: 4 disjoint 30-bit
    // bands over the 120-bit signature must surface EVERY pair within
    // hamming 3 — compare the banded key's output to an exhaustive
    // all-pairs hamming scan (bounded: |sf0.001|² ≈ 125k pairs)
    val toks = split(lower(trim($"text")), "\\s+")
    val sg = Tables.documents(spark, sfDir)
      .select($"doc_id",
        GraftFunctions.simhash60(toks).as("lo"),
        GraftFunctions.simhash60(transform(toks, t => concat(lit("w"), t))).as("hi"))
      .cache()
    val a = sg.select($"doc_id".as("doc_a"), $"lo".as("lo_a"), $"hi".as("hi_a"))
    val b = sg.select($"doc_id".as("doc_b"), $"lo".as("lo_b"), $"hi".as("hi_b"))
    val brute = a.crossJoin(b).filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b",
        (bit_count($"lo_a".bitwiseXOR($"lo_b")) +
          bit_count($"hi_a".bitwiseXOR($"hi_b"))).cast("long").as("hamming"))
      .filter($"hamming" <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val banded = SparkEntry.queries("d43_simhash_wide")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded == brute,
      s"banded=${banded.size} brute=${brute.size}: wide banding must be exact, not approximate")
    assert(brute.nonEmpty, "fixture must contain true near-dup pairs at hamming<=3")
    sg.unpersist()
    // plan shape: the candidate join must be keyed on the band columns —
    // a cartesian/nested-loop here is the all-pairs scan the banding exists
    // to avoid
    val p = plan("d43_simhash_wide")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(400))
  }

  test("d44 wide clusters: edge endpoints co-cluster, labels are minimal, corpus is total") {
    import spark.implicits._
    val labels = SparkEntry.queries("d44_neardup_clusters_wide")(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir)
    // every doc gets exactly one label, and a min-label is never above the id
    assert(labels.count() == docs.count())
    assert(labels.filter($"cluster_id" > $"doc_id").isEmpty)
    // every d43 edge's endpoints share a cluster (the connectivity contract)
    val pairs = SparkEntry.queries("d43_simhash_wide")(spark, sfDir)
      .select($"doc_a", $"doc_b")
    val la = labels.select($"doc_id".as("doc_a"), $"cluster_id".as("cl_a"))
    val lb = labels.select($"doc_id".as("doc_b"), $"cluster_id".as("cl_b"))
    assert(pairs.join(la, "doc_a").join(lb, "doc_b")
      .filter($"cl_a" =!= $"cl_b").isEmpty,
      "near-dup pair endpoints must land in the same cluster")
    // non-trivial: the sf fixture has at least one multi-doc cluster
    assert(labels.groupBy($"cluster_id").count().filter($"count" > 1).count() > 0)
    labels.unpersist()
  }

  test("d13 recall gate is probe-capped: brute force stays a bounded verification key") {
    import spark.implicits._
    // the exact side costs O(|corpus|) per probe — the constant cap is what
    // keeps the gate runnable at any corpus size (sample-only posture,
    // SURVEY §5); a cap regression would silently turn d13 into a full
    // corpus² scan
    assert(Similarity.NumQueries <= 16, "probe cap must stay a small constant")
    val probes = Similarity.cosineTopK(spark, sfDir)
      .select($"query_id").distinct().count()
    assert(probes <= Similarity.NumQueries,
      s"$probes probe queries exceed the NumQueries=${Similarity.NumQueries} cap")
  }

  test("d06 ann-lsh achieves usable recall against brute force") {
    val exact = Similarity.cosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.annLsh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    val floor = Similarity.RecallFloors.toMap.apply("lsh")
    assert(recall >= floor, s"recall $recall below lsh floor $floor")
    info(s"ann-lsh recall@10 = $recall")
  }

  test("d07 near-dup pairs are symmetric-free and above threshold") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val pairs = SparkEntry.queries("d07_embed_neardup")(spark, sfDir).collect()
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)), "pairs must be ordered a < b")
    // re-score each reported pair exactly; all must clear the threshold
    val emb = Tables.embeddings(spark, sfDir).filter($"vec_id" % 5 === 0)
    val a = emb.select($"vec_id".as("a_id"), $"embedding".as("ea"))
    val b = emb.select($"vec_id".as("b_id"), $"embedding".as("eb"))
    val rescored = SparkEntry.queries("d07_embed_neardup")(spark, sfDir)
      .join(a, "a_id").join(b, "b_id")
      .select(GraftFunctions.cosineSim($"ea", $"eb").as("sim"))
    assert(rescored.filter($"sim" < Similarity.NearDupThreshold).isEmpty)
  }

  test("d08 ann-ivf probes a fraction of the corpus yet keeps usable recall") {
    val exact = Similarity.cosineTopK(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.annIvf(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    val floor = Similarity.RecallFloors.toMap.apply("ivf")
    assert(recall >= floor, s"ivf recall $recall below floor $floor")
    info(s"ann-ivf recall@10 = $recall")
  }

  test("d27 degenerate-case guards: eval set non-empty, no zero-norm embeddings") {
    import spark.implicits._
    // the two documented d27 oracle divergences (empty eval -> Spark throws
    // vs DuckDB returns empty; zero-norm -> cosineF 0.0 vs DuckDB NaN) are
    // only safe while these data facts hold — keep them loud
    val emb = Tables.embeddings(spark, sfDir)
    val evalN = emb.filter($"vec_id" % Similarity.SemEvalEvery === Similarity.SemEvalResidue &&
                           $"vec_id" < Similarity.SemEvalCap).count()
    assert(evalN > 0, "d27 eval reference set is empty: nearest_cosine would fail-fast " +
      "while the DuckDB oracle returns zero rows")
    val zeroNorm = emb.filter(
      expr("aggregate(embedding, 0.0D, (acc, x) -> acc + CAST(x AS DOUBLE) * x) = 0.0D")).count()
    assert(zeroNorm == 0, s"$zeroNorm zero-norm embeddings: cosineF(=0.0) and DuckDB " +
      "list_cosine_similarity(=NaN, sorts highest) would diverge")
  }

  test("d28 semdedup flags synthetic near-dups within a cell, min-id witness") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // id 0 passes the SampleHash centroid predicate (h(0)%25==0), so the
    // sampled codebook is exactly {0} and every vector lands in cell 0 —
    // the within-cell test then sees all pairs. 1 and 3 are perturbed
    // copies of 0 (cosine ~0.9996 > 0.764); 2 is orthogonal (cosine 0).
    val base = Array.tabulate(64)(i => (math.sin(i + 1) * 0.5).toFloat)
    def perturb(eps: Float) = base.zipWithIndex.map { case (v, i) => v + (if (i % 2 == 0) eps else -eps) }
    val ortho = Array.tabulate(64)(i => if (i % 2 == 0) base(i + 1) else -base(i - 1))
    val emb = Seq(
      (0L, base), (1L, perturb(0.01f)), (2L, ortho), (3L, perturb(0.02f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedupOn(emb).collect()
      .map(r => (r.getLong(0), Option(r.getAs[java.lang.Long]("dup_of")).map(_.toLong), r.getAs[Long]("kept")))
    assert(out.toSeq == Seq(
      (0L, None, 1L),        // survivor of its own ball
      (1L, Some(0L), 0L),    // near-copy of 0
      (2L, None, 1L),        // orthogonal — kept
      (3L, Some(0L), 0L)))   // two witnesses (0 and 1) — MIN names 0
  }

  test("d28 invariants on real data: verdict total, witness below id, no planned broadcast of the witness side") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val out = SparkEntry.queries("d28_semdedup")(spark, sfDir).cache()
    val n = Tables.embeddings(spark, sfDir).count()
    assert(out.count() == n, "every vector gets a verdict row")
    assert(out.filter(($"kept" === 1) =!= $"dup_of".isNull).isEmpty,
      "kept <=> no witness")
    assert(out.filter($"dup_of" >= $"vec_id").isEmpty, "witness must be lower-id")
    // driver SFs sit far below the threshold gap by design (see
    // SemDedupThreshold): zero dups here, structure only at the 10x scale
    assert(out.filter($"kept" === 0).isEmpty,
      "driver-SF corpus has no pair above the 0.764 gap threshold")
    out.unpersist()
    // the verdict-attach join must not be broadcast-PLANNED (witness side
    // is |duplicates|-sized only by luck of the data; AQE may convert at
    // runtime, the plan must not bake it in)
    val broadcastLeftOuter = physical(SparkEntry.queries("d28_semdedup")(spark, sfDir)).collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftOuter => j
    }
    assert(broadcastLeftOuter.isEmpty, "verdict attach was broadcast-planned")
  }

  test("d10 cluster table round-trips as a persisted artifact") {
    import spark.implicits._
    // the 100-TB contract d22/d26 rely on: labels materialize once, persist,
    // and any consumer joining the read-back table gets bit-identical
    // cluster assignments to the inline derivation
    val path = java.nio.file.Files.createTempDirectory("graft_cl").toString + "/clusters"
    operators.Dedup.clusterLabels(spark, sfDir).write.mode("overwrite").parquet(path)
    val readBack = spark.read.parquet(path)
      .select($"doc_id".as("l_doc"), $"cluster_id")
    val viaArtifact = Tables.documents(spark, sfDir)
      .join(readBack, $"doc_id" === $"l_doc", "left")
      .select($"doc_id", coalesce($"cluster_id", $"doc_id").as("cluster_id"))
    val inline = SparkEntry.queries("d10_neardup_clusters")(spark, sfDir)
    assert(viaArtifact.exceptAll(inline).isEmpty && inline.exceptAll(viaArtifact).isEmpty,
      "artifact-joined cluster ids must equal the inline derivation")
  }

  test("d10 clustering converges: both ends of every candidate edge share a cluster") {
    import spark.implicits._
    val labels = SparkEntry.queries("d10_neardup_clusters")(spark, sfDir).cache()
    assert(labels.count() == Tables.documents(spark, sfDir).count())
    assert(labels.filter($"cluster_id" > $"doc_id").isEmpty, "label can only shrink")
    val pairs = SparkEntry.queries("d03_simhash")(spark, sfDir).select($"doc_a", $"doc_b")
    val la = labels.select($"doc_id".as("doc_a"), $"cluster_id".as("ca"))
    val lb = labels.select($"doc_id".as("doc_b"), $"cluster_id".as("cb"))
    val split = pairs.join(la, "doc_a").join(lb, "doc_b").filter($"ca" =!= $"cb")
    assert(split.isEmpty, "an edge crossing two clusters means propagation has not converged")
    // at least one genuine multi-doc cluster exists (planted near-dups)
    val multi = labels.groupBy($"cluster_id").count().filter($"count" >= 2)
    assert(multi.count() > 0)
    labels.unpersist()
  }

  test("d11 fuzzy decontamination drops near-copies of eval docs, keeps the rest") {
    import spark.implicits._
    val kept = SparkEntry.queries("d11_fuzzy_decontaminate")(spark, sfDir).cache()
    // eval rows never appear
    assert(kept.filter($"doc_id" % 7 === 3).isEmpty)
    // every non-eval doc that is a minhash-LSH near-dup of an eval doc is gone
    val pairs = SparkEntry.queries("d02_minhash_lsh")(spark, sfDir)
      .filter($"est_jaccard" >= 0.5)
    val contaminatedByPair = pairs
      .filter($"doc_a" % 7 === 3 || $"doc_b" % 7 === 3)
      .select(when($"doc_a" % 7 === 3, $"doc_b").otherwise($"doc_a").as("doc_id"))
      .filter($"doc_id" % 7 =!= 3).distinct()
    assert(kept.join(contaminatedByPair, Seq("doc_id"), "left_semi").isEmpty,
      "a near-copy of an eval doc survived")
    assert(kept.count() > 0)
    kept.unpersist()
  }

  test("d20 incremental dedup flags exactly the batch docs colliding with the index") {
    import spark.implicits._
    val verdicts = SparkEntry.queries("d20_incremental_dedup")(spark, sfDir).cache()
    // one verdict per new-batch doc, nothing else
    val batchIds = Tables.documents(spark, sfDir).filter($"doc_id" % 3 === 0).select("doc_id")
    assert(verdicts.count() == batchIds.count())
    assert(verdicts.join(batchIds, Seq("doc_id"), "left_anti").isEmpty)
    // verdict internal consistency
    assert(verdicts.filter($"is_dup" =!= ($"n_matches" > 0)).isEmpty)
    assert(verdicts.filter($"is_dup" && $"matched_id".isNull).isEmpty)
    assert(verdicts.filter(!$"is_dup" && $"matched_id".isNotNull).isEmpty)
    // matched_id always points into the index partition, never the batch
    assert(verdicts.filter($"matched_id" % 3 === 0).isEmpty)
    // agreement with the full-corpus pass: every d02 pair at >= 0.5 that
    // crosses batch/index must surface as a dup verdict here
    val crossPairs = SparkEntry.queries("d02_minhash_lsh")(spark, sfDir)
      .filter($"est_jaccard" >= 0.5)
      .filter(($"doc_a" % 3 === 0) =!= ($"doc_b" % 3 === 0))
      .select(when($"doc_a" % 3 === 0, $"doc_a").otherwise($"doc_b").as("doc_id"))
      .distinct()
    assert(crossPairs.join(verdicts.filter($"is_dup"), Seq("doc_id"), "left_anti").isEmpty,
      "a batch/index near-dup pair known to the full-corpus pass was missed")
    // no all-pairs fallback anywhere in the plan
    val planned = physical(SparkEntry.queries("d20_incremental_dedup")(spark, sfDir))
    val txt = planned.toString
    assert(!txt.contains("CartesianProduct") && !txt.contains("BroadcastNestedLoopJoin"),
      s"incremental dedup must stay bucket-local:\n$txt")
    verdicts.unpersist()
  }

  test("d21 adaptive gate drops exactly each source's bottom quality quartile") {
    import spark.implicits._
    val kept = SparkEntry.queries("d21_adaptive_quality_gate")(spark, sfDir).cache()
    assert(kept.select("tile").distinct().collect().map(_.getLong(0)).toSet == Set(2L, 3L, 4L))
    val perSource = Tables.documents(spark, sfDir).groupBy($"source")
      .agg(count(lit(1)).as("n"))
    // ntile(4) gives the remainder to the first tiles, so tile 1 holds
    // ceil(n/4) docs and survivors number n - ceil(n/4)
    val survived = kept.groupBy($"source").agg(count(lit(1)).as("n_kept"))
    assert(perSource.join(survived, "source")
      .filter($"n_kept" =!= $"n" - ceil($"n" / 4.0).cast("long")).isEmpty,
      "per-source survivor count does not match the quartile rule")
    // calibration is per source: no survivor scores below a dropped doc of
    // the SAME source (ties at the boundary are allowed)
    val scored = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", operators.TextOps.qualityCol.as("q"))
    val dropped = scored.join(kept.select("doc_id"), Seq("doc_id"), "left_anti")
    val maxDropped = dropped.groupBy($"source").agg(max($"q").as("max_dropped"))
    val minKept = kept.groupBy($"source").agg(min($"quality").as("min_kept"))
    assert(maxDropped.join(minKept, "source").filter($"max_dropped" > $"min_kept").isEmpty,
      "a dropped doc outscored a survivor within its source")
    kept.unpersist()
  }

  test("d23/d24 scale gates: claims hold, no per-source corpus sort in either plan") {
    import spark.implicits._
    // d23: every claim row must be true (the oracle asserts the same)
    val claims = SparkEntry.queries("d23_sketch_quality_gate")(spark, sfDir)
    assert(claims.filter(!$"cutoff_within_bound" || !$"gate_consistent").isEmpty,
      "sketch cutoff outside its rank-error bound or gate/count mismatch")
    // d24 agrees with d21's exact quartile boundary: survivors are exactly
    // the docs strictly above the source's Q1 value, so every d24 survivor
    // is a d21 survivor (d21 additionally rank-splits the boundary ties)
    val d24 = SparkEntry.queries("d24_histogram_quality_gate")(spark, sfDir).cache()
    val d21 = SparkEntry.queries("d21_adaptive_quality_gate")(spark, sfDir)
    assert(d24.select("doc_id").join(d21.select("doc_id"), Seq("doc_id"), "left_anti").isEmpty,
      "a d24 survivor was dropped by d21's exact ntile gate")
    // ... and d21 keeps at most the boundary tie-class more per source
    val tieMass = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", operators.TextOps.qualityCol.as("q"))
      .join(d24.groupBy($"source").agg(min($"cutoff").as("cut")), "source")
      .filter($"q" === $"cut").groupBy($"source").agg(count(lit(1)).as("ties"))
    val slack = d21.groupBy($"source").agg(count(lit(1)).as("n21"))
      .join(d24.groupBy($"source").agg(count(lit(1)).as("n24")), "source")
      .join(tieMass, "source")
      .filter($"n21" - $"n24" > $"ties")
    assert(slack.isEmpty, "d21/d24 survivor gap exceeds the boundary tie-class")
    // THE scale assertion: neither plan may serialize a source through a
    // single task's sort — no Window (ntile/row_number) over the corpus;
    // d24's only window runs over the bounded per-source value histogram
    // ("ntile(" with the paren: perceNTILE_approx contains the bare word)
    val p23 = physical(SparkEntry.queries("d23_sketch_quality_gate")(spark, sfDir)).toString
    assert(!p23.contains("ntile(") && !p23.contains("Window"),
      s"d23 must calibrate via sketch agg, not a per-source window sort:\n$p23")
    assert(p23.contains("percentile_approx"), "d23 plan lost its sketch aggregate")
    d24.unpersist()
    val p24 = physical(SparkEntry.queries("d24_histogram_quality_gate")(spark, sfDir)).toString
    assert(!p24.contains("ntile("), "d24 must not rank the corpus")
    // d24's windows (histogram cumsum + per-source total) consume the
    // (source, quality) HISTOGRAM aggregate, never raw corpus rows: a
    // corpus-ranking window would have to order/carry doc_id in its spec
    assert(p24.contains("windowspecdefinition"), "d24 plan lost its histogram cumsum window")
    val corpusWindows = p24.split("\n")
      .filter(_.contains("windowspecdefinition")).filter(_.contains("doc_id"))
    assert(corpusWindows.isEmpty,
      s"d24 window must run over histogram rows, not the corpus:\n${corpusWindows.mkString("\n")}")
    // ... and corpus rows reach the gate through a broadcast join of the
    // tiny cutoff table, not a shuffle
    assert(p24.contains("BroadcastHashJoin"), s"d24 cutoffs must broadcast:\n$p24")
  }

  test("histogram cutoff property: equals the sorted-quartile definition on random data") {
    import spark.implicits._
    // the d24/d25/s16 foundation: for ANY quantized score distribution
    // (ties, skew, singleton sources), the histogram walk must return
    // exactly the sorted definition's Q1 — the smallest value whose
    // cumulative count reaches ceil(n/4)
    val rng = new scala.util.Random(7)
    val rows = (0 until 2000).map { i =>
      val source = "s" + rng.nextInt(7)
      // mix heavy ties (coarse grid) with fine values, all 1e-4 quantized
      val q = if (rng.nextBoolean()) rng.nextInt(5) * 0.25
              else math.floor(rng.nextDouble() * 10000.0 + 0.5) / 10000.0
      (i.toLong, source, q)
    } :+ ((9999L, "lonely", 0.5)) // a singleton source
    val df = rows.toDF("doc_id", "source", "quality")
    val got = operators.Dedup.histogramQualityCutoffs(df)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val expect = rows.groupBy(_._2).map { case (src, rs) =>
      val sorted = rs.map(_._3).sorted
      src -> sorted(math.ceil(0.25 * sorted.size).toInt - 1)
    }
    assert(got == expect, s"cutoffs diverge from the sorted definition:\n$got\nvs\n$expect")
  }

  test("d25 token budget: spend within budget, top-quality prefix, no corpus sort") {
    import spark.implicits._
    val mix = SparkEntry.queries("d25_token_budget_mix")(spark, sfDir).cache()
    // realized spend: the survivors' token mass IS budget_used, within budget
    val spend = mix.groupBy($"source", $"budget_used")
      .agg(sum($"tokens").as("actual"))
    assert(spend.filter($"actual" =!= $"budget_used").isEmpty,
      "budget_used must equal the survivors' token mass")
    assert(spend.filter($"budget_used" > operators.Dedup.BudgetTokens).isEmpty,
      "a source overspent its token budget")
    // band-granular top-quality prefix: every survivor outscores every
    // dropped doc of the same source STRICTLY (whole bands keep or drop)
    val dropped = Tables.documents(spark, sfDir)
      .select($"doc_id", $"source", operators.TextOps.qualityCol.as("q"))
      .join(mix.select("doc_id"), Seq("doc_id"), "left_anti")
    val maxDropped = dropped.groupBy($"source").agg(max($"q").as("max_dropped"))
    val minKept = mix.groupBy($"source").agg(min($"quality").as("min_kept"))
    assert(maxDropped.join(minKept, "source").filter($"max_dropped" >= $"min_kept").isEmpty,
      "selection must be a strict top-quality band prefix per source")
    mix.unpersist()
    // scale shape: the only window runs over histogram rows (d24's pattern)
    val planned = physical(SparkEntry.queries("d25_token_budget_mix")(spark, sfDir))
    val p = planned.toString
    val corpusWindows = p.split("\n")
      .filter(_.contains("windowspecdefinition")).filter(_.contains("doc_id"))
    assert(corpusWindows.isEmpty,
      s"d25 must never sort the corpus per source:\n${corpusWindows.mkString("\n")}")
    assert(p.contains("BroadcastHashJoin"), s"d25 cutoffs must broadcast:\n$p")
  }

  test("d22 survivorship histogram conserves the corpus and matches d10's clusters") {
    import spark.implicits._
    val df = SparkEntry.queries("d22_dedup_survivorship")(spark, sfDir).cache()
    val corpus = Tables.documents(spark, sfDir).count()
    // every doc is accounted for exactly once: kept + removed == corpus
    val mass = df.agg(sum($"cluster_size" * $"n_clusters")).head().getLong(0)
    assert(mass == corpus, s"histogram mass $mass != corpus $corpus")
    assert(df.agg(sum($"docs_kept" + $"docs_removed")).head().getLong(0) == corpus)
    // per-row identity: removed = (size - 1) * clusters, kept = clusters
    assert(df.filter($"docs_removed" =!= ($"cluster_size" - 1) * $"n_clusters").isEmpty)
    assert(df.filter($"docs_kept" =!= $"n_clusters").isEmpty)
    // agreement with d10: the histogram of its cluster ids is this report
    val fromD10 = SparkEntry.queries("d10_neardup_clusters")(spark, sfDir)
      .groupBy($"cluster_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy($"cluster_size").agg(count(lit(1)).as("n_clusters"))
    assert(df.select("cluster_size", "n_clusters").except(fromD10).isEmpty &&
           fromD10.except(df.select("cluster_size", "n_clusters")).isEmpty)
    df.unpersist()
  }

  test("d26 split is leakage-free: no near-dup edge straddles train/val/test") {
    import spark.implicits._
    val assigned = SparkEntry.queries("d26_cluster_split")(spark, sfDir).cache()
    assert(assigned.count() == Tables.documents(spark, sfDir).count())
    // the defining property: split is constant within every cluster, so no
    // candidate edge (near-dup pair) can cross the train/eval boundary
    assert(assigned.groupBy($"cluster_id")
      .agg(countDistinct($"split").as("k")).filter($"k" > 1).isEmpty,
      "a cluster with two splits means eval leakage")
    val pairs = SparkEntry.queries("d03_simhash")(spark, sfDir).select($"doc_a", $"doc_b")
    val sa = assigned.select($"doc_id".as("doc_a"), $"split".as("pa"))
    val sb = assigned.select($"doc_id".as("doc_b"), $"split".as("pb"))
    assert(pairs.join(sa, "doc_a").join(sb, "doc_b")
      .filter($"pa" =!= $"pb").isEmpty, "near-dup pair split across the boundary")
    // the hash targets 90/5/5 at cluster granularity — bound loosely enough
    // to be SF-stable (binomial noise at 500 clusters is a few points)
    val frac = assigned.filter($"split" === "train").count().toDouble / assigned.count()
    assert(frac > 0.8 && frac < 0.97, s"train fraction $frac far from 0.9")
    assigned.unpersist()
  }

  test("d29 elects exactly one max-quality survivor per cluster, agreeing with d10") {
    import spark.implicits._
    val df = SparkEntry.queries("d29_quality_survivor")(spark, sfDir).cache()
    // membership = the cluster artifact (edge endpoints only; no singletons)
    val labels = operators.Dedup.clusterLabels(spark, sfDir)
    assert(df.count() == labels.count(), "one verdict row per clustered doc")
    assert(df.select($"doc_id", $"cluster_id").except(labels).isEmpty &&
           labels.except(df.select($"doc_id", $"cluster_id")).isEmpty,
      "membership must be exactly d10's clusters")
    assert(df.groupBy($"cluster_id").agg(sum(when($"kept", 1L).otherwise(0L)).as("k"))
      .filter($"k" =!= 1L).isEmpty, "exactly one survivor per cluster")
    // the election law: nobody in the cluster beats the survivor under
    // (quality DESC, doc_id ASC)
    val sv = df.filter($"kept")
      .select($"cluster_id", $"doc_id".as("sid"), $"quality".as("sq"))
    assert(df.join(sv, "cluster_id")
      .filter($"quality" > $"sq" || ($"quality" === $"sq" && $"doc_id" < $"sid"))
      .isEmpty, "a cluster member outranks its elected survivor")
    assert(df.filter($"kept" =!= ($"doc_id" === $"survivor_id")).isEmpty,
      "kept must be exactly the survivor identity")
    // quality is the shared t06 formula — spot-agree against the t06 key
    val t06 = SparkEntry.queries("t06_quality_score")(spark, sfDir)
      .select($"doc_id", $"quality".as("q6"))
    assert(df.join(t06, "doc_id").filter($"quality" =!= $"q6").isEmpty,
      "d29 quality drifted from t06's formula")
    df.unpersist()
  }

  test("d32 soft-dedup weights: full coverage, artifact agreement, near-unit cluster mass") {
    import spark.implicits._
    val df = SparkEntry.queries("d32_soft_dedup")(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir)
    assert(df.count() == docs.count() &&
           df.select($"doc_id").distinct().count() == docs.count(),
      "every doc gets exactly one weight row")
    // weight law holds on every row
    assert(df.filter($"weight_ppm" =!= expr("1000000 div dup_degree")).isEmpty)
    // degree agrees with the materialized artifact; unclustered docs = 1
    val labels = operators.Dedup.clusterLabels(spark, sfDir)
    val sz = labels.groupBy($"cluster_id").agg(count(lit(1)).as("sz"))
    val expected = labels.join(sz, "cluster_id").select($"doc_id", $"sz")
    assert(df.join(expected, Seq("doc_id"), "left")
      .filter($"dup_degree" =!= coalesce($"sz", lit(1L))).isEmpty,
      "dup_degree must be the artifact cluster size (1 when unclustered)")
    // soft-dedup contract: each cluster's aggregate weight is ~one doc —
    // k * (1e6 div k) lands in (1e6 - k, 1e6]
    val mass = df.join(labels, "doc_id")
      .groupBy($"cluster_id")
      .agg(sum($"weight_ppm").as("w"), count(lit(1)).as("k"))
    assert(mass.filter($"w" > 1000000L || $"w" <= lit(1000000L) - $"k").isEmpty,
      "a duplicated text must contribute ~one document of aggregate weight")
    df.unpersist()
  }

  test("d30 purity is 1 on separable clusters and internally consistent on real data") {
    import spark.implicits._
    // two orthogonal 16-member clusters: every query's 10 nearest live in
    // its own cluster, so purity must be exactly 1.0 for both sampled
    // queries (ids 1 and 21 under the %20==1 sample)
    val a = Array.tabulate(64)(i => (math.cos(i) * 0.5).toFloat)
    val b = Array.tabulate(64)(i => if (i % 2 == 0) a(i + 1) else -a(i - 1)) // orthogonal
    def jitter(v: Array[Float], j: Int) =
      v.zipWithIndex.map { case (x, i) => x + (if (i == j % 64) 0.001f * (j + 1) else 0f) }
    val emb = (
      (0 until 16).map(i => (i.toLong, jitter(a, i), 0)) ++
      (0 until 16).map(i => (20L + i, jitter(b, i), 1))
    ).toDF("vec_id", "embedding", "label")
    val fix = Similarity.knnLabelPurityOf(emb).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(fix.toSeq == Seq((1L, 0, 10L, 1.0), (21L, 1, 10L, 1.0)), s"got ${fix.toSeq}")
    // real corpus: one row per sampled query, purity = n_agree/k in [0,1]
    val df = SparkEntry.queries("d30_knn_label_purity")(spark, sfDir).cache()
    val expectedQ = Tables.embeddings(spark, sfDir)
      .filter($"vec_id" % Similarity.KnnEvalEvery === Similarity.KnnEvalResidue &&
              $"vec_id" < Similarity.KnnEvalCap).count()
    assert(df.count() == expectedQ, "one purity row per sampled query")
    assert(df.filter($"knn_purity" < 0.0 || $"knn_purity" > 1.0).isEmpty)
    assert(df.filter($"n_agree" =!= ($"knn_purity" * Similarity.K).cast("long")).isEmpty)
    df.unpersist()
  }

  test("d31 containment is 1.0 for a doc copied into a host, and supersets d02") {
    import spark.implicits._
    // doc 1 verbatim inside doc 2 (plus host-only tail): containment of 1
    // in 2 must be exactly 1.0 while 2-in-1 is strictly smaller — the
    // asymmetry Jaccard can't express; docs 3/4 identical -> 1.0 both ways
    val small = (1 to 12).map("w" + _).mkString(" ")
    val docs = Seq(
      (1L, small),
      (2L, small + " extra tail tokens here"),
      (3L, (1 to 10).map("q" + _).mkString(" ")),
      (4L, (1 to 10).map("q" + _).mkString(" ")),
    ).toDF("doc_id", "text")
    val fix = operators.Dedup.containmentPairsOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getBoolean(5)))).toMap
    assert(fix.contains((1L, 2L)), s"subset pair must band-collide; got ${fix.keySet}")
    val (c12, c21, flag12) = fix((1L, 2L))
    assert(c12 == 1.0, "the contained doc scores exactly 1.0 into its host")
    assert(c21 < 1.0 && c21 > 0.0, s"host-into-subset must be partial, got $c21")
    assert(flag12, "subset copy must be flagged contained")
    assert(fix((3L, 4L)) == ((1.0, 1.0, true)), "identical docs contain both ways")
    // real corpus: d31's ungated candidates must superset d02's gated pairs
    val d31 = SparkEntry.queries("d31_containment")(spark, sfDir).cache()
    val d02 = SparkEntry.queries("d02_minhash_lsh")(spark, sfDir)
      .select($"doc_a", $"doc_b")
    assert(d02.except(d31.select($"doc_a", $"doc_b")).isEmpty,
      "every Jaccard-gated d02 pair must appear among d31's ungated candidates")
    assert(d31.filter($"contain_a_in_b" < 0.0 || $"contain_a_in_b" > 1.0 ||
                      $"contain_b_in_a" < 0.0 || $"contain_b_in_a" > 1.0).isEmpty)
    assert(d31.filter($"max_containment" =!=
      greatest($"contain_a_in_b", $"contain_b_in_a")).isEmpty)
    assert(d31.filter($"is_contained" =!= ($"max_containment" >= 0.8)).isEmpty)
    d31.unpersist()
  }

  test("d31 bounded candidates are a subset of exhaustive, with linear volume") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
    val bounded = operators.Dedup.containmentPairsOf(docs).cache()
    val exhaustive = operators.Dedup.containmentPairsOf(docs, successorWindow = None)
    try {
      // the window only DROPS candidates — and for pairs it keeps, the
      // containment values are identical (same gram sets, same formula)
      assert(bounded.except(exhaustive).isEmpty,
        "bounded view produced a row the exhaustive view lacks")
      // the keyed contract: pair volume is O(docs · bands · M) by
      // construction, never the bucket-quadratic exhaustive count
      val n = docs.count()
      assert(bounded.count() <=
        n * operators.Dedup.Bands * operators.Dedup.NeighborWindow)
    } finally bounded.unpersist()
  }

  test("d42 containment referee: planted regime spans thresholds, window loss measured zero") {
    import spark.implicits._
    val df = SparkEntry.queries("d42_containment_recall")(spark, sfDir).cache()
    try {
      val rows = df.collect()
      assert(rows.map(_.getLong(0)).toSeq == operators.Dedup.ContainmentThresholds,
        "one row per containment threshold")
      rows.foreach { r =>
        assert(r.getAs[Long]("n_true") > 0,
          s"planted hosts must create true pairs at threshold ${r.getLong(0)}")
        assert(r.getAs[Long]("n_cand_bounded") <= r.getAs[Long]("n_cand_exhaustive"))
        assert(r.getAs[Long]("tp_bounded") <= r.getAs[Long]("tp_exhaustive"))
        // the number the d31 bound rides on: at every measured fixture the
        // successor window drops NO true positives vs the exhaustive join
        // (buckets are far below M members; see the occupancy watch below)
        assert(r.getAs[Long]("window_loss_ppm") == 0L,
          s"successor window dropped true containment positives: $r")
      }
      // the planted hosts land ACROSS the 0.8 gate: n_true strictly
      // decreases with threshold (degenerate all-or-nothing fixtures can't)
      val nTrue = rows.map(_.getAs[Long]("n_true")).toSeq
      assert(nTrue == nTrue.sorted.reverse && nTrue.distinct.size == nTrue.size,
        s"planted containment must span thresholds, got $nTrue")
    } finally df.unpersist()
  }

  test("band-bucket occupancy stays linear under ScaleGen-style replication (§7f watch)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // replicate the ScaleGen documents transform in-memory (key shift +
    // per-replica text suffix) so the occupancy verdict the ×1000 probe
    // measured (max bucket 3,927 of 5M docs ≈ 0.08%; §7f danger line ~2%,
    // where successor-window linearity stops mattering) is pinned as a
    // TEST: a fixture or kernel change that re-concentrates buckets fails
    // here instead of waiting for a bench regression.
    val base = Tables.documents(spark, sfDir).select($"doc_id", $"text")
    def scaled(factor: Int) =
      (0 until factor).map { i =>
        if (i == 0) base
        else base.select(($"doc_id" + i.toLong * ScaleGen.KeyOffset).as("doc_id"),
          concat($"text", lit(s" r$i")).as("text"))
      }.reduce(_.unionByName(_))
    def maxBucket(docs: org.apache.spark.sql.DataFrame): Long =
      operators.Dedup.bandSignatures(operators.Dedup.signaturesOf(docs))
        .groupBy($"band_id", $"band_key").agg(count(lit(1)).as("c"))
        .agg(max($"c")).head().getLong(0)
    val n1 = base.count()
    val max1 = maxBucket(base)
    val factor = 20
    val big = scaled(factor)
    val nf = n1 * factor
    val maxf = maxBucket(big)
    // (a) stay under the danger ratio (measured 0.8% here, 2.5x headroom)
    assert(maxf <= nf / 50,
      s"bucket re-concentration: max bucket $maxf of $nf docs breaches the 2% danger line")
    // (b) growth no worse than linear in the replication factor (2x slack:
    // replicas of one clone cluster may merge when the suffix leaves some
    // band slices unchanged — that is the linear-at-worst case)
    assert(maxf <= 2L * factor * max1,
      s"superlinear bucket growth: max $max1 -> $maxf under x$factor replication")
    // (c) the bounded pair view's volume contract holds on the scaled data
    val banded = operators.Dedup.bandSignatures(operators.Dedup.signaturesOf(big))
      .select($"doc_id", $"band_id", $"band_key")
    val pairs = operators.Dedup.bucketPairs(banded, Seq("band_id", "band_key"),
      payloadCol = "doc_id", outA = "pa", outB = "pb",
      successorWindow = Some(operators.Dedup.NeighborWindow)).count()
    assert(pairs <= nf * operators.Dedup.Bands * operators.Dedup.NeighborWindow)
  }

  test("realistic ScaleGen mode: cross-replica shingle spaces are disjoint (linear pair volume)") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // ScaleGen's realistic mode models corpus growth as factor-many
    // INDEPENDENT shards (replica-unique token suffix), not factor-many
    // near-copies: the load-bearing property is that LSH band buckets never
    // span replicas, so every pair view's candidate volume is the SUM of
    // per-replica volumes — linear in the factor — for the bounded AND the
    // exhaustive view alike. This is what converts the d02/d11/d20 ×1000
    // oracle walls (fixture-quadratic cross-replica collisions) into
    // gateable points (§7l).
    val base = Tables.documents(spark, sfDir).select($"doc_id", $"text", $"n_chars")
    val factor = 3
    val big = (0 until factor).map { i =>
      ScaleGen.realisticDocTweak(
        base.withColumn("doc_id", $"doc_id" + i.toLong * ScaleGen.KeyOffset), i)
    }.reduce(_.unionByName(_))
    // the n_chars == length(text) invariant survives the rewrite
    assert(big.filter(length($"text").cast("long") =!= $"n_chars").isEmpty)
    val banded = Dedup.bandSignatures(Dedup.signaturesOf(big))
    val spanning = banded
      .groupBy($"band_id", $"band_key")
      .agg(min(floor($"doc_id" / ScaleGen.KeyOffset)).as("lo"),
           max(floor($"doc_id" / ScaleGen.KeyOffset)).as("hi"))
      .filter($"lo" =!= $"hi").count()
    assert(spanning == 0, s"$spanning band buckets span replicas")
    // inside a replica the token rewrite is injective and uniform, so
    // within-shard similarity structure is preserved: replica 1 has exactly
    // the base corpus's exact-duplicate group structure
    def fpGroups(d: org.apache.spark.sql.DataFrame): Long =
      d.select(md5(regexp_replace(lower($"text"), "\\s+", " ")).as("fp"))
        .groupBy($"fp").count().count()
    assert(fpGroups(ScaleGen.realisticDocTweak(base, 1)) == fpGroups(base))
  }

  test("d09 decontamination drops eval docs and their content-identical copies") {
    import spark.implicits._
    val kept = SparkEntry.queries("d09_decontaminate")(spark, sfDir).cache()
    // no surviving doc carries an eval-set fingerprint
    val evalFps = Tables.documents(spark, sfDir)
      .filter($"doc_id" % 7 === 3)
      .select(md5(regexp_replace(lower($"text"), "\\s+", " ")).as("fp")).distinct()
    assert(kept.join(evalFps, $"content_md5" === $"fp", "left_semi").isEmpty)
    // and the corpus side plan broadcasts the eval fingerprints
    val p = SparkEntry.queries("d09_decontaminate")(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(400))
    assert(kept.count() > 0)
    kept.unpersist()
  }

  test("m02 frame sampling fans out ~4 evenly spaced frames inside the blob") {
    import spark.implicits._
    val df = SparkEntry.queries("m02_frame_sample")(spark, sfDir).cache()
    assert(df.filter($"frame_idx" < 0 || $"frame_idx" >= $"n_frames").isEmpty)
    assert(df.filter($"byte_off" < 0 || $"byte_off" >= $"byte_len").isEmpty)
    val perDoc = df.groupBy($"doc_id").count()
    assert(perDoc.filter($"count" < 4 || $"count" > 7).isEmpty,
      "sampling step n/4 yields 4-7 frames per doc")
    assert(perDoc.count() == Tables.documents(spark, sfDir).count())
    df.unpersist()
  }

  test("custom expressions are callable from SQL text via the registry") {
    graft.functions.GraftFunctions.register(spark)
    Tables.embeddings(spark, sfDir).createOrReplaceTempView("emb_sql")
    val rows = spark.sql(
      """SELECT vec_id,
        |       cosine_sim(embedding, embedding) AS self_sim,
        |       simhash64(array('a','b','c')) AS sh,
        |       size(minhash_sig(shingle_hashes(array('a','b','c','d'), 2), 16)) AS sig_len
        |FROM emb_sql ORDER BY vec_id LIMIT 5""".stripMargin).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9, "self-cosine must be 1")
      assert(r.getInt(3) == 16)
    }
    assert(rows.map(_.getLong(2)).distinct.length == 1, "simhash of a literal is constant")
  }

  test("d12 pq compressed-domain scan keeps usable recall against brute force") {
    val exact = SparkEntry.queries("d05_cosine_topk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = SparkEntry.queries("d12_ann_pq")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pq.size == exact.size, "pq must return a full top-k per query")
    val recall = (exact & pq).size.toDouble / exact.size
    val floor = Similarity.RecallFloors.toMap.apply("pq")
    assert(recall >= floor, s"pq recall $recall below floor $floor")
    info(s"ann-pq recall@10 = $recall")
  }

  test("m05 blob chunks tile every byte exactly once and hash the real binary") {
    import spark.implicits._
    val df = SparkEntry.queries("m05_blob_chunks")(spark, sfDir).cache()
    // chunk lengths tile the blob: sum == byte_len, all interior chunks full
    val blobs = operators.Multimodal.withBlob(spark, sfDir)
      .select($"doc_id", length($"blob").cast("long").as("byte_len"))
    val tiled = df.groupBy($"doc_id").agg(
      sum($"chunk_len").as("covered"), count(lit(1)).as("n_chunks"), max($"chunk_idx").as("last"))
    assert(tiled.join(blobs, "doc_id").filter($"covered" =!= $"byte_len").isEmpty,
      "chunks do not cover the blob exactly")
    assert(tiled.filter($"n_chunks" =!= $"last" + 1).isEmpty, "chunk ids have gaps")
    assert(df.join(tiled, "doc_id")
      .filter($"chunk_idx" < $"last" && $"chunk_len" =!= 256L).isEmpty,
      "a non-final chunk is not exactly 256 bytes")
    // offsets are contiguous
    assert(df.filter($"byte_off" =!= $"chunk_idx" * 256).isEmpty)
    // the hash really covers the chunk bytes: reassembling md5s of the
    // binary slices recomputed independently must match
    val recomputed = operators.Multimodal.withBlob(spark, sfDir)
      .select($"doc_id", $"blob", length($"blob").cast("long").as("byte_len"))
      .withColumn("chunk_idx", explode(expr("sequence(0L, (byte_len - 1) div 256)")))
      .select($"doc_id", $"chunk_idx",
        md5(expr("substring(blob, CAST(chunk_idx*256 + 1 AS INT), 256)")).as("re_md5"))
    assert(df.join(recomputed, Seq("doc_id", "chunk_idx"))
      .filter($"chunk_md5" =!= $"re_md5").isEmpty)
    df.unpersist()
  }

  test("m06 shards conserve the store, pack contiguously, and bound overshoot") {
    import spark.implicits._
    val df = SparkEntry.queries("m06_shard_manifest")(spark, sfDir).cache()
    val store = operators.Multimodal.withBlob(spark, sfDir)
      .agg(count(lit(1)).as("n"), sum(length($"blob")).as("bytes")).head()
    // conservation: every blob lands in exactly one shard, no bytes lost
    assert(df.agg(sum($"n_blobs")).head().getLong(0) == store.getLong(0))
    assert(df.agg(sum($"shard_bytes")).head().getLong(0) == store.getLong(1))
    // shard ids are contiguous from 0 within a source (fixed-boundary
    // packing can't skip a boundary: every boundary has a crossing blob)
    assert(df.groupBy($"source")
      .agg(min($"shard_idx").as("lo"), max($"shard_idx").as("hi"),
           count(lit(1)).as("n"))
      .filter($"lo" =!= 0L || $"n" =!= $"hi" + 1).isEmpty,
      "per-source shard indices must be 0..n-1 with no gaps")
    // fixed-boundary bound: a shard's first blob starts within max_blob of
    // its boundary (the crossing blob ends just past the line), so every
    // non-final shard's byte mass lies in (B - max_blob, B + max_blob)
    val maxBlob = operators.Multimodal.withBlob(spark, sfDir)
      .agg(max(length($"blob")).cast("long")).head().getLong(0)
    val lastIdx = df.groupBy($"source").agg(max($"shard_idx").as("last_idx"))
    val nonFinal = df.join(lastIdx, "source").filter($"shard_idx" < $"last_idx")
    assert(nonFinal.filter(
      $"shard_bytes" <= operators.Multimodal.ShardBytes - maxBlob ||
      $"shard_bytes" >= operators.Multimodal.ShardBytes + maxBlob).isEmpty,
      s"non-final shard mass must sit within one blob of the $maxBlob-byte budget line")
    // doc ranges are disjoint and ordered across consecutive shards
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"shard_idx")
    assert(df.withColumn("prev_hi", lag($"doc_hi", 1).over(w))
      .filter($"prev_hi".isNotNull && $"doc_lo" <= $"prev_hi").isEmpty,
      "shards must partition the doc_id order")
    // multi-shard sources and multi-blob shards both exist at every SF
    assert(df.filter($"shard_idx" > 0).count() > 0)
    assert(df.filter($"n_blobs" > 1).count() > 0)
    df.unpersist()
  }

  test("m07/m08 codec stubs: stripe sums and stride digest match hand-computed bytes") {
    import spark.implicits._
    // blob = "IMG0AAAA BBBB" (13 bytes): stripe boundaries j*13/8 give
    // [0,1)[1,3)[3,4)[4,6)[6,8)[8,9)[9,11)[11,13) — sums hand-computed
    val fixture = Seq((7L, "IMG0AAAA BBBB".getBytes("UTF-8")))
      .toDF("doc_id", "blob")
    val feats = operators.Multimodal.featureExtractOf(fixture).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(feats.map(x => (x._1, x._2)).toSeq ==
      Seq((0L, 73L), (1L, 148L), (2L, 48L), (3L, 130L),
          (4L, 130L), (5L, 32L), (6L, 132L), (7L, 132L)), s"got ${feats.toSeq}")
    val counts = Seq(1, 2, 1, 2, 2, 1, 2, 2)
    feats.zip(counts).foreach { case ((_, sum, mean), cnt) =>
      assert(mean == math.floor(sum.toDouble / cnt * 10000.0 + 0.5) / 10000.0,
        s"stripe mean must be sum/count rounded 1e-4 (sum=$sum cnt=$cnt mean=$mean)")
    }
    // stride-4 subsample of the same blob keeps positions 0,4,8,12 = "IA B"
    val rs = operators.Multimodal.resizeBlobsOf(fixture).head()
    assert(rs.getLong(1) == 13L && rs.getLong(2) == 4L)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = md.digest("IA B".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(rs.getString(3) == expected, "digest must equal md5 of the literal subsample")
    // real corpus: 8 stripes per doc, stripe sums conserve nothing negative
    val m07 = SparkEntry.queries("m07_feature_extract")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).count()
    assert(m07.count() == docs * 8)
    assert(m07.filter($"byte_sum" < 0L).isEmpty)
    val m08 = SparkEntry.queries("m08_resize")(spark, sfDir)
    assert(m08.count() == docs)
    assert(m08.filter($"resized_len" =!= floor(($"orig_len" + 3) / 4)).isEmpty)
  }

  test("m10 router classifies from magic BYTES: planted foreign magic routes to unknown") {
    import spark.implicits._
    val planted = Seq(
      (1L, "IMG0hello"), (2L, "AUD0hello"), (3L, "VID0hello"),
      (4L, "GIF9hello") // a magic the router does not know — must not fail
    ).toDF("doc_id", "payload")
      .select($"doc_id", $"payload".cast("binary").as("blob"))
    val routed = operators.Multimodal.routeOf(planted).collect()
    val byId = routed.map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("modality")).toMap
    assert(byId == Map(1L -> "image", 2L -> "audio", 3L -> "video", 4L -> "unknown"),
      s"classification must read the bytes: $byId")
    // digest covers the payload BEHIND the magic, not the whole blob
    val md5hello = java.security.MessageDigest.getInstance("MD5")
      .digest("hello".getBytes("UTF-8")).map("%02x".format(_)).mkString
    routed.foreach { r =>
      assert(r.getAs[String]("payload_md5") == md5hello, s"digest drifted: $r")
      assert(r.getAs[Long]("byte_len") == 9L)
    }
  }

  test("d39 bottom-k containment: planted full containment scores 1000, estimates bounded") {
    import spark.implicits._
    // doc 3 (eval law: 3 % 7 == 3) is copied wholesale into host doc 10 —
    // asymmetric containment(3 in 10) must be exact 1000 permille, and the
    // bottom-k estimate must agree (every query hash is in the host)
    val inner = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val planted = Seq(
      (3L, inner),
      (10L, inner + " host filler words continue the much larger document body"),
      (11L, "completely different vocabulary nothing shared here at all today"))
      .toDF("doc_id", "text")
    val got = operators.Dedup.bottomkContainmentOf(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getAs[Long]("est_permille"), r.getAs[Long]("exact_permille")))).toMap
    assert(got((3L, 10L)) == ((1000L, 1000L)), s"full containment drifted: $got")
    assert(!got.contains((3L, 11L)), "disjoint docs must not be candidates")
    // corpus: bounded estimates, self excluded, top-10 per query respected
    val df = SparkEntry.queries("d39_bottomk_containment")(spark, sfDir).cache()
    try {
      assert(df.count() > 0, "planted near-dups must surface containment candidates")
      assert(df.filter($"eval_id" === $"doc_id").isEmpty)
      assert(df.filter($"est_permille" > 1000 || $"matches" > $"k_eff").isEmpty)
      assert(df.groupBy($"eval_id").count().filter($"count" > 10).isEmpty)
      // sketch quality on real data: mean absolute error within 2 bottom-k
      // slots (2/16 = 125 permille) of the exact containment
      val meanErr = df.agg(avg($"err_permille")).head().getDouble(0)
      assert(meanErr <= 125.0, s"bottom-k estimate degraded: mean err $meanErr")
    } finally df.unpersist()
  }

  test("d40 hard negatives: planted confusable pair flags negative margin") {
    import spark.implicits._
    val emb = Seq(
      (1L, Seq(1f, 0f, 0f, 0f), 0),   // anchor (1 % 20 == 1)
      (2L, Seq(1f, 0.1f, 0f, 0f), 1), // hard negative: nearly parallel, other label
      (3L, Seq(0f, 1f, 0f, 0f), 0),   // best positive sits orthogonal (sim 0)
      (4L, Seq(-1f, 0f, 0f, 0f), 1))  // easy negative: antiparallel
      .toDF("vec_id", "embedding", "label")
    val rows = operators.Similarity.hardNegativesOf(emb).collect()
    assert(rows.map(_.getAs[Long]("query_id")).toSet == Set(1L), "only vec 1 anchors")
    val byRank = rows.map(r => r.getAs[Long]("rank") -> r).toMap
    assert(byRank(1L).getAs[Long]("neighbor_id") == 2L, "hard negative ranks first")
    assert(byRank(2L).getAs[Long]("neighbor_id") == 4L)
    assert(byRank(1L).getAs[Double]("margin") < 0,
      "confusable pair must surface as negative margin")
    assert(byRank(2L).getAs[Double]("margin") == 1.0)
    assert(rows.forall(_.getAs[Double]("best_pos_sim") == 0.0))
    // corpus: ranks dense from 1, at most K per anchor, margin consistent
    val df = SparkEntry.queries("d40_hard_negatives")(spark, sfDir).cache()
    try {
      assert(df.count() > 0)
      assert(df.groupBy($"query_id")
        .agg(count(lit(1)).as("n"), max($"rank").as("mx"), min($"rank").as("mn"))
        .filter($"mx" =!= $"n" || $"mn" =!= 1 || $"n" > operators.Similarity.HardNegK)
        .isEmpty, "negative ranks must be dense 1..n, capped at K")
      assert(df.filter(abs($"margin" - ($"best_pos_sim" - $"neg_sim")) > 2e-4).isEmpty)
    } finally df.unpersist()
  }

  test("m11 header parse: fields decode from byte offsets, faults route as rows") {
    import spark.implicits._
    val df = SparkEntry.queries("m11_header_parse")(spark, sfDir).cache()
    try {
      val docs = Tables.documents(spark, sfDir).count()
      assert(df.count() == docs, "tolerant parse: every blob yields a row")
      // the planted fault laws, recovered from the parsed fields alone
      assert(df.filter($"status" === "bad_magic" && $"doc_id" % 101 =!= 5).isEmpty)
      assert(df.filter($"doc_id" % 101 === 5 && $"status" =!= "bad_magic").isEmpty)
      assert(df.filter($"status" === "length_mismatch" &&
        ($"doc_id" % 7 =!= 0 || $"declared_len" - $"actual_len" =!= 3)).isEmpty)
      // hex version field round-trips: version == doc_id % 256
      assert(df.filter($"version" =!= $"doc_id" % 256).isEmpty)
      // digest only on clean rows — an untrusted header must not be hashed as good
      assert(df.filter($"status" === "ok" && $"payload_md5".isNull).isEmpty)
      assert(df.filter($"status" =!= "ok" && $"payload_md5".isNotNull).isEmpty)
      assert(df.filter($"status" === "ok").count() > 0)
    } finally df.unpersist()
  }

  test("m09 profile hash: hand-computed bits, shift invariance, gated pair view") {
    import spark.implicits._
    // "ABABAB": 5 adjacent pairs — (A,B)×3 → cell (65·131+66)%60 = 1,
    // (B,A)×2 → cell (66·131+65)%60 = 11; both over-occupied vs 5/60 →
    // phash = 2^1 + 2^11 = 2050
    val ph = operators.Multimodal.phashOf(
      Seq((1L, "ABABAB".getBytes("UTF-8")), (2L, "BABABA".getBytes("UTF-8")))
        .toDF("doc_id", "blob")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ph(1L) == 2050L, s"hand-computed hash mismatch: ${ph(1L)}")
    // rotation keeps the bigram profile — the shift-invariance a stripe
    // thumbnail lacks (one inserted byte would shift every later stripe)
    assert(ph(2L) == ph(1L), "bigram profile must be shift-invariant")
    // real corpus: pairs are canonical, gated, and hamming-consistent with
    // the per-doc hashes
    val df = SparkEntry.queries("m09_phash_neardup")(spark, sfDir).cache()
    assert(df.count() > 0, "planted near-dups must collide")
    assert(df.filter($"doc_a" >= $"doc_b" || $"hamming" > 2).isEmpty)
    val hashes = operators.Multimodal.phashOf(
      operators.Multimodal.withBlob(spark, sfDir))
    val recomputed = df
      .join(hashes.select($"doc_id".as("doc_a"), $"phash".as("pa")), "doc_a")
      .join(hashes.select($"doc_id".as("doc_b"), $"phash".as("pb")), "doc_b")
    assert(recomputed
      .filter($"hamming" =!= bit_count($"pa".bitwiseXOR($"pb")).cast("long")).isEmpty,
      "reported hamming must equal the xor popcount of the per-doc hashes")
    df.unpersist()
  }

  test("m01 multimodal metadata matches blob sizes") {
    val df = SparkEntry.queries("m01_multimodal_meta")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).count()
    assert(df.count() == docs)
    assert(df.filter(col("byte_len") =!= col("byte_len").cast("long")).isEmpty)
    assert(df.filter(col("width") < 64 || col("height") < 64).isEmpty)
  }

  test("d16 bloom decontamination scans the corpus once and matches d09 exactly") {
    // one conditional anti-join over a single flagged scan — the earlier
    // suspected/cleared two-branch union read the corpus twice
    val d16 = SparkEntry.queries("d16_bloom_decontaminate")(spark, sfDir)
    val d09 = SparkEntry.queries("d09_decontaminate")(spark, sfDir)
    assert(d16.collect().map(_.toSeq).toSeq === d09.collect().map(_.toSeq).toSeq)
    val planned = physical(d16)
    val scans = planned.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    // documents is read for: the corpus pass, the eval fingerprint relation,
    // and the eval bloom build (the latter two are the simulated eval set —
    // a separate tiny table in production). The corpus branch itself is ONE.
    assert(scans.length <= 3, s"expected <=3 parquet scans, got ${scans.length}:\n$planned")
    val s = planned.toString
    assert(s.contains("BroadcastHashJoin") && s.contains("LeftAnti"),
      s"exact check must be a broadcast anti-join:\n$s")
  }

  test("d17 raw cohesion margins are positive and trained does not degrade") {
    val m = operators.Similarity.cohesionMargins(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m.keySet == Set("sampled", "trained"), m.toString)
    assert(m("sampled") > 0.0, s"sampled margin ${m("sampled")} not positive")
    assert(m("trained") > 0.0, s"trained margin ${m("trained")} not positive")
    assert(m("trained") >= m("sampled") - operators.Similarity.TrainedVsSampledSlack,
      s"training degraded cohesion: $m")
    // and the gate key reduces those margins to all-TRUE claim rows
    val rows = SparkEntry.queries("d17_cluster_quality")(spark, sfDir).collect()
    assert(rows.length == 3 && rows.forall(_.getBoolean(2)), rows.mkString(", "))
  }

  test("m01 decode seam moves no data: only the presentation sort repartitions") {
    // the typed mapPartitions batch seam (where a real codec drops in) must
    // stay a per-partition pass — no hash exchange anywhere; the single
    // range exchange belongs to the final orderBy
    val planned = physical(SparkEntry.queries("m01_multimodal_meta")(spark, sfDir))
    val shuffles = planned.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.forall(_.outputPartitioning.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.physical.RangePartitioning]),
      s"decode must not repartition the corpus:\n$planned")
  }

  test("d27 semantic decontamination catches a planted paraphrase the lexical family misses") {
    import spark.implicits._
    GraftFunctions.register(spark)
    // "paraphrase": same direction as the eval vector plus small orthogonal
    // noise — high cosine, zero shared text. A background vector is near
    // orthogonal. Verdicts come from the same fused kernel the key uses.
    val evalVec = Array.tabulate(64)(i => math.cos(i * 0.7).toFloat)
    val para = evalVec.zipWithIndex.map { case (v, i) => v + 0.08f * math.sin(i * 1.3).toFloat }
    val backg = Array.tabulate(64)(i => math.sin(i * 2.9 + 1.0).toFloat)
    val corpus = Seq((3L, evalVec), (100L, para), (200L, backg))
      .toDF("vec_id", "embedding")
    val evalRow = corpus.filter($"vec_id" === 3L)
      .select($"vec_id".as("centroid_id"), $"embedding".as("ce"))
      .agg(array_sort(collect_list(struct($"centroid_id", $"ce"))).as("evals"))
    val out = corpus.crossJoin(broadcast(evalRow))
      .select($"vec_id", GraftFunctions.nearestCosine($"embedding", $"evals").as("nc"))
      .select($"vec_id", $"nc.id".as("nearest_eval_id"),
        ($"nc.sim" >= Similarity.SemThreshold).cast("long").as("contaminated"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(3L) == (3L, 1L), "eval member must self-flag at cosine 1.0")
    assert(out(100L) == (3L, 1L), s"paraphrase escaped the semantic gate: ${out(100L)}")
    assert(out(200L)._2 == 0L, s"background vector wrongly flagged: ${out(200L)}")
    // but the lexical gate (d09's normalized-content fingerprint) sees
    // nothing: the paraphrase shares no text with anything
    val texts = Seq((3L, "the quick brown fox jumps over the lazy dog"),
                    (100L, "a speedy auburn vulpine leaps above an idle hound"))
      .toDF("doc_id", "text")
      .withColumn("fp", md5(regexp_replace(lower($"text"), "\\s+", " ")))
    assert(texts.select("fp").distinct().count() == 2)
  }

  test("d27 plan is scan-local: one broadcast, corpus crosses no hash exchange") {
    val df = SparkEntry.queries("d27_semantic_decontaminate")(spark, sfDir)
    val planned = physical(df)
    val txt = planned.toString
    assert(txt.contains("nearest_cosine"), s"fused kernel missing from plan:\n$txt")
    assert(txt.contains("BroadcastNestedLoopJoin") || txt.contains("BroadcastExchange"),
      s"eval row must broadcast:\n$txt")
    val shuffles = planned.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // only the presentation orderBy (range) and the constant-capped eval-side
    // gather into its one broadcast row (SinglePartition over |eval| rows) may
    // shuffle; a HashPartitioning exchange would mean the CORPUS moved
    assert(shuffles.forall(e =>
      e.outputPartitioning.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.physical.RangePartitioning] ||
      e.outputPartitioning == org.apache.spark.sql.catalyst.plans.physical.SinglePartition),
      s"d27 verdict must not hash-shuffle the corpus:\n$planned")
  }

  test("partitioned ANN cell index: probe reads only its cells' files") {
    import spark.implicits._
    // the serve-side shape behind d08/d15: persist the corpus PARTITIONED
    // BY cell, and a probe touches only the probed cells' directories —
    // scan IO scales with probed fraction, not corpus size
    graft.functions.GraftFunctions.register(spark)
    val emb = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val assigned = operators.Similarity.assignCells(
      emb, operators.Similarity.collapseCodebook(
        operators.Similarity.sampledCentroids(emb)))
    val out = java.nio.file.Files.createTempDirectory("graft_ivfidx").toString + "/idx"
    assigned.write.partitionBy("centroid_id").mode("overwrite").parquet(out)
    val allCells = assigned.select($"centroid_id").distinct()
      .as[Long].collect().sorted
    assert(allCells.length > 2, "need multiple cells to prove pruning")
    val probes = allCells.take(2)
    val pruned = spark.read.parquet(out).filter($"centroid_id".isin(probes: _*))
    pruned.collect()
    val leaf = pruned.queryExecution.executedPlan.collectLeaves().head
    val nFiles = leaf.metrics("numFiles").value
    val full = spark.read.parquet(out).select($"vec_id")
    full.collect() // metrics populate only on execution
    val total = full.queryExecution.executedPlan
      .collectLeaves().head.metrics("numFiles").value
    assert(nFiles < total,
      s"probe must be partition-pruned: read $nFiles of $total files")
    // the pruned read returns exactly the probed cells' members
    val expected = assigned.filter($"centroid_id".isin(probes: _*))
      .select($"vec_id").as[Long].collect().sorted.toSeq
    val got = pruned.select($"vec_id").as[Long].collect().sorted.toSeq
    assert(got == expected, "partition-pruned probe lost or invented members")
  }

  test("d34 int8 codes are in range, saturate the max element, and stay scan-local") {
    val df = SparkEntry.queries("d34_int8_quantize")(spark, sfDir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the ±maxabs element always quantizes to ±127 exactly, so a nonzero
      // vector saturates at least once; rounding stays within half a code
      assert(r.getAs[Boolean]("within_half_ulp"), s"rounding drifted: $r")
      assert(r.getAs[Long]("n_sat") >= 1L, s"max element must saturate: $r")
      assert(r.getAs[Long]("q_l1") <= 127L * 64, s"L1 exceeds saturation bound: $r")
      assert(r.getAs[Double]("scale_max") > 0.0, s"zero-norm vector unexpected: $r")
    }
    // quantization is per-row: nothing may hash-shuffle the corpus
    val planned = physical(df)
    val shuffles = planned.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.forall(e => e.outputPartitioning.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.physical.RangePartitioning]),
      s"d34 must be scan-local before the output sort:\n$planned")
  }

  test("d35 corpus map: conservation, bounds, and agreement with d28's cells") {
    import spark.implicits._
    val df = SparkEntry.queries("d35_corpus_map")(spark, sfDir).cache()
    val nTotal = Tables.embeddings(spark, sfDir).count()
    // conservation: cells partition the corpus exactly
    assert(df.agg(sum($"n_vecs")).head().getLong(0) == nTotal)
    // truncated ppm shares sum to at most 1e6 and undershoot by < |cells|
    val shareSum = df.agg(sum($"share_ppm")).head().getLong(0)
    val nCells = df.count()
    assert(shareSum <= 1000000L && shareSum > 1000000L - nCells,
      s"ppm shares sum to $shareSum over $nCells cells")
    // per-cell bounds: the dominant source never exceeds the cell, the
    // quality mean stays inside the formula's [0, 1e4] range
    assert(df.filter($"top_source_n" > $"n_vecs").isEmpty)
    assert(df.filter($"avg_q_e4" < 0L || $"avg_q_e4" > 10000L).isEmpty)
    assert(df.filter($"chars_per_doc" < 0L).isEmpty)
    // the map charts the SAME space d28 dedups: identical cell-id set and
    // per-cell membership counts (same codebook, same argmax)
    val d28Cells = SparkEntry.queries("d28_semdedup")(spark, sfDir)
      .groupBy($"centroid_id").count()
    assert(df.select($"cell_id", $"n_vecs")
      .join(d28Cells, $"cell_id" === $"centroid_id", "full")
      .filter($"n_vecs".isNull || $"count".isNull || $"n_vecs" =!= $"count")
      .isEmpty, "d35 cells disagree with d28's assignment")
    df.unpersist()
  }

  test("d37 drift monitor: share sums, bucket completeness, recomputed lang row") {
    import spark.implicits._
    val df = SparkEntry.queries("d37_drift_monitor")(spark, sfDir).cache()
    val docs = Tables.documents(spark, sfDir)
    // truncated ppm shares per (dim, side) sum to just under one million
    for (dim <- Seq("lang", "source", "quality_decile"); col <- Seq("a_ppm", "b_ppm")) {
      val rows = df.filter($"dim" === dim)
      val s = rows.agg(sum(org.apache.spark.sql.functions.col(col))).head().getLong(0)
      val n = rows.count()
      assert(s <= 1000000L && s > 1000000L - n, s"$dim/$col sums to $s over $n buckets")
    }
    // bucket sets are the CURRENT corpus's value domains (b side counts all)
    val langs = docs.select($"lang").distinct().as[String].collect().toSet
    assert(df.filter($"dim" === "lang").select($"bucket").as[String].collect().toSet
      == langs)
    // one row recomputed independently end to end
    val lang0 = langs.min
    val nb = docs.filter($"lang" === lang0).count()
    val na = docs.filter($"lang" === lang0 &&
      pmod($"doc_id", lit(operators.Dedup.DriftBaselineMod)) =!= 0L).count()
    val ta = docs.filter(pmod($"doc_id", lit(operators.Dedup.DriftBaselineMod)) =!= 0L).count()
    val tb = docs.count()
    val r = df.filter($"dim" === "lang" && $"bucket" === lang0).head()
    assert(r.getAs[Long]("a_ppm") == na * 1000000L / ta)
    assert(r.getAs[Long]("b_ppm") == nb * 1000000L / tb)
    assert(r.getAs[Long]("abs_diff_ppm") ==
      math.abs(na * 1000000L / ta - nb * 1000000L / tb))
    df.unpersist()
  }

  test("d36 corpus overlap: synthetic containment law, full matrix, reused exchange") {
    import spark.implicits._
    // hand-built corpus: srcX = two docs sharing nothing with srcY except
    // that srcZ is a verbatim SUBSET of srcX (the containment case)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon", "srcX"),
      (2L, "one two three four five six", "srcX"),
      (3L, "red green blue cyan magenta", "srcY"),
      (4L, "alpha beta gamma delta epsilon", "srcZ") // == doc 1
    ).toDF("doc_id", "text", "source")
    // drive the operator on a temp dir holding exactly this corpus
    val tmp = java.nio.file.Files.createTempDirectory("d36").toString
    docs.withColumn("lang", lit("en")).withColumn("n_chars", length($"text"))
      .coalesce(1).write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val df = SparkEntry.queries("d36_corpus_overlap")(spark, tmp).cache()
    // full upper triangle: 3 sources -> 3 pair rows, including zero overlaps
    assert(df.count() == 3L)
    val byPair = df.collect().map(r =>
      (r.getAs[String]("src_a"), r.getAs[String]("src_b")) -> r).toMap
    // srcZ ⊂ srcX: containment 1000 permille on the Z side, Jaccard < 1000
    val xz = byPair(("srcX", "srcZ"))
    assert(xz.getAs[Long]("b_in_a_permille") == 1000L, s"containment law: $xz")
    assert(xz.getAs[Long]("inter") == 3L && xz.getAs[Long]("n_a") == 7L)
    assert(xz.getAs[Long]("jaccard_permille") == 3000L / 7, s"jaccard: $xz")
    // disjoint pairs exist with zero everything
    val xy = byPair(("srcX", "srcY"))
    assert(xy.getAs[Long]("inter") == 0L && xy.getAs[Long]("jaccard_permille") == 0L)
    df.unpersist()
    // the shingle aggregate feeds totals AND pairs as ONE reused exchange
    // (AQE dedupes canonically-identical exchanges at RUNTIME — t20 idiom)
    val executed = SparkEntry.queries("d36_corpus_overlap")(spark, sfDir)
    executed.collect()
    assert(executed.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "totals and pair consumers must share the shingle aggregate")
  }

  test("d41 LSH referee: S-curve measured — precision falls, recall climbs with threshold") {
    val rows = SparkEntry.queries("d41_lsh_quality")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val ths = operators.Dedup.LshQualityThresholds
    assert(rows.keySet == ths.toSet)
    ths.foreach { t =>
      val (nTrue, nCand, tp, prec, rec) = rows(t)
      assert(tp <= nTrue && tp <= nCand, s"overlap bounds violated at $t")
      assert(prec >= 0 && prec <= 1000000 && rec >= 0 && rec <= 1000000)
    }
    // mathematically guaranteed monotonicities (truth shrinks with threshold;
    // precision over a FIXED candidate set can only fall)
    assert(rows(200L)._1 >= rows(300L)._1 && rows(300L)._1 >= rows(500L)._1)
    assert(rows(200L)._4 >= rows(300L)._4 && rows(300L)._4 >= rows(500L)._4)
    // the S-curve: banding tuned at ~0.6 recalls high-J pairs far better
    // than the planted mid-J spectrum
    assert(rows(500L)._5 > rows(200L)._5,
      s"recall must climb with threshold: ${rows(500L)._5} vs ${rows(200L)._5}")
    // the planted perturbations contribute real mid-J truth
    assert(rows(200L)._1 > 100, "augmented truth set too small to referee")
  }

  test("m13 scene cuts: exactly the planted shot boundary cuts, shots are static") {
    val s = spark
    import s.implicits._
    val df = SparkEntry.queries("m13_scene_cuts")(spark, sfDir).cache()
    try {
      val half = operators.Multimodal.SceneFrames / 2
      // within-shot frames are byte-identical => hamming 0, no cut
      assert(df.filter($"frame_idx" =!= half && $"hamming" =!= 0L).isEmpty,
        "static-shot frames must hash identically")
      // the shot boundary is the ONE cut, and it opens scene 1
      assert(df.filter($"frame_idx" === half && !$"is_cut").isEmpty,
        "the planted hard cut must flag for every doc")
      assert(df.filter($"scene_id" =!= when($"frame_idx" < half, 0L).otherwise(1L)).isEmpty,
        "scene_id must segment frames at the cut")
      // the lag/cumsum window is the only pre-sort exchange
      val ex = deepExchanges(physical(
        SparkEntry.queries("m13_scene_cuts")(spark, sfDir)))
      assert(ex.count(e => !e.outputPartitioning.toString.contains("range")) <= 1,
        s"expected one per-doc window exchange, got ${ex.map(_.outputPartitioning)}")
    } finally df.unpersist()
  }

  test("m12 align gate: hash-trick tower is deterministic, cosine bounded, gate cuts") {
    val s = spark
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    // kernel law on a hand vector: signs/dims from poly31 exactly
    val toks = Seq("alpha", "beta", "alpha").toDF("t")
      .agg(collect_list($"t").as("ts"))
      .select(graft.functions.GraftFunctions.hashEmbed($"ts", lit(8)).as("v"))
      .head().getSeq[Float](0)
    val h = (t: String) => graft.functions.CrossHash.poly31(
      org.apache.spark.unsafe.types.UTF8String.fromString(t), 0L)
    val expect = new Array[Float](8)
    Seq("alpha", "beta", "alpha").foreach { t =>
      val hv = h(t)
      expect((hv % 8).toInt) += (if (((hv / 8) % 2L) == 1L) 1f else -1f)
    }
    assert(toks == expect.toSeq, s"kernel $toks != law ${expect.toSeq}")
    // the keyed gate: every align in [-1, 1], keep == (align >= 0), both
    // verdicts present (random towers straddle zero), join is id-exact
    val df = SparkEntry.queries("m12_align_gate")(spark, sfDir).cache()
    try {
      assert(df.filter($"align" < -1.0 || $"align" > 1.0).isEmpty)
      assert(df.filter($"keep" =!= ($"align" >= 0.0)).isEmpty)
      assert(df.filter($"keep").count() > 0 && df.filter(!$"keep").count() > 0)
      val nEmb = Tables.embeddings(spark, sfDir).count()
      val nDocs = Tables.documents(spark, sfDir).count()
      assert(df.count() == math.min(nEmb, nDocs),
        "gate must cover exactly the embedded docs")
    } finally df.unpersist()
  }
}
