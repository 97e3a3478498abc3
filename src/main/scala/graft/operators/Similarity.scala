package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions._

/** Similarity search over the embedding column — SURVEY.md §2.D.
  *
  * Brute-force cosine top-k is the correctness baseline (query side
  * broadcast, corpus never shuffled before the rank-limit); random-hyperplane
  * LSH is the scale path (bucket-local candidate generation).
  */
object Similarity {

  val K = 10
  val NumQueries = 5
  /** Fixture embedding dimensionality — already assumed by [[planes]]
    * (64-float hyperplanes) and the PQ layout (8 subspaces × 8 dims). */
  private[graft] val EmbedDim = 64

  private def queries(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
  }

  /** All (query, candidate, cosine) scores — shared by both variants. */
  private def scored(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    Tables.embeddings(s, dir)
      .crossJoin(broadcast(queries(s, dir)))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
              cosineSim($"qe", $"embedding").as("sim"))
  }

  /** Brute-force cosine top-k per query. The rank filter compiles to a
    * WindowGroupLimit, so each partition keeps only k rows before the
    * shuffle — the full corpus never moves.
    */
  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    scored(s, dir)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= K)
      .select($"query_id", $"neighbor_id", $"rank")
      .orderBy($"query_id", $"rank")
  }

  // OR-amplification trade-off, tuned for structureless embeddings (the
  // testdata is isotropic random, so near neighbors sit at cosine ~0.3 and
  // collision probabilities are driven by candidate volume; clustered
  // production embeddings get much better recall at the same cost).
  private val NumTables = graft.functions.lshplanes.NumTables
  private val PlanesPerTable = graft.functions.lshplanes.PlanesPerTable // 16 buckets per table

  /** Deterministic pseudo-random hyperplanes (splitmix64 -> [-1, 1)),
    * NumTables * PlanesPerTable of them — sourced from the kernel-side
    * constants so the fused `lsh_buckets` corpus path and the per-plane
    * query-side flip margins can never diverge.
    */
  private[operators] lazy val planes: Seq[Seq[Float]] =
    graft.functions.lshplanes.Planes.toSeq.map(_.toSeq)

  /** Sign-bucket id of `v` in LSH table `t` — element t+1 of the fused
    * `lsh_buckets` kernel call (all 32 plane dots in one pass over the
    * vector with primitive plane rows; the unfused 32-call form re-decoded
    * a boxed array literal per plane — see kernels.lshBuckets for the
    * bit-identity argument).
    */
  private[operators] def lshBucket(v: Column, t: Int): Column =
    element_at(lshBuckets(v), t + 1)

  /** Embedding-cosine near-duplicate pairs over a deterministic corpus
    * subset: all unordered pairs with cosine above [[NearDupThreshold]].
    * Blocked all-pairs with the smaller side broadcast; the `a < b`
    * predicate halves the work and the threshold filter runs inside codegen
    * before anything is materialized. At 100 TB the LSH prefilter of
    * [[annLsh]] replaces the quadratic candidate generation; this exact
    * variant is the correctness baseline the oracle can hash-check.
    * Threshold 0.29995 sits in an empirical gap (>1e-5 wide at every SF) so
    * DuckDB's float-precision cosine and our double-precision one agree on
    * membership.
    *
    * The subset is CONSTANT-capped at [[NearDupBaselineCap]] vectors (cap
    * never binds below |corpus| = 5120, so test-SF results are unchanged):
    * the key's contract is a bounded correctness baseline that stays
    * runnable at any SF, while the LSH path (d06/d11) is the scale
    * mechanism for full-corpus near-dup detection.
    */
  val NearDupThreshold = 0.29995
  val NearDupBaselineCap = 1024
  def embedNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val subset = Tables.embeddings(s, dir)
      .filter($"vec_id" % 5 === 0 && $"vec_id" < 5L * NearDupBaselineCap)
      .select($"vec_id", $"embedding")
    val right = subset.select($"vec_id".as("b_id"), $"embedding".as("be"))
    subset.crossJoin(broadcast(right))
      .filter($"vec_id" < $"b_id")
      .filter(cosineSim($"embedding", $"be") >= NearDupThreshold)
      .select($"vec_id".as("a_id"), $"b_id")
      .orderBy($"a_id", $"b_id")
  }

  /** IVF-style ANN: corpus vectors are assigned to their nearest centroid
    * (a deterministic sample plays the k-means codebook: in production the
    * codebook comes from a training job and is a few KB — always broadcast).
    * A query probes only its nearest cells (see [[IvfProbeFrac]]), so the
    * scored candidate set is a bounded share of |corpus| instead of all of
    * it. Recall vs. exact top-k is gated through d13.
    */
  val IvfCentroidEvery = 25 // vec_id % 25 == 0 -> |corpus|/25 centroids
  /** Multi-probe: a query visits max(IvfMinProbes, ceil(IvfProbeFrac *
    * |cells|)) cells. The FRACTION term is what makes recall SF-stable on
    * isotropic testdata: cells grow with the corpus (until IvfMaxCentroids
    * binds), so a fixed probe count would scan a shrinking corpus share and
    * recall would decay with SF. Probing a constant share holds the
    * measured recall flat across sf0.001→sf1 (the share itself is sized
    * by the isotropic-testdata worst case — see [[RecallFloors]]). The dynamic bound lives in
    * the PROBE window (queries x codebook rows, constant-bounded) — the
    * final top-k window keeps its literal rank<=K and with it the
    * WindowGroupLimit partial limit on the corpus-sized exchange.
    */
  val IvfMinProbes = 8
  val IvfProbeFrac = 0.3
  /** Query-adaptive probe widening: beyond the base fraction, a query also
    * probes every cell whose centroid similarity sits within
    * [[IvfAdaptiveBand]] of its BEST cell, up to [[IvfMaxProbeFrac]] of all
    * cells. A query with a decisive nearest centroid (steep margin) stays
    * at the cheap base fraction; a query that straddles cell boundaries
    * (flat margins — exactly where fixed-nprobe IVF loses its neighbors)
    * widens its probe set to cover the ambiguous cells. All terms live in
    * the probe window (queries × codebook rows, constant-bounded), so the
    * adaptivity costs nothing on the corpus side.
    */
  val IvfAdaptiveBand = 0.3
  val IvfMaxProbeFrac = 0.6
  /** Hard cap on codebook cardinality: the sampled stand-in would otherwise
    * grow as |corpus|/25, making the broadcast row (and the per-row argmax)
    * scale with the corpus. Production codebooks are fixed-k; the cap keeps
    * the broadcast a few MB at ANY corpus size. Never binds below
    * |corpus| = 102400, so test-SF results are unchanged.
    */
  val IvfMaxCentroids = 4096
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
    ivfSearch(emb, sampledCentroids(emb))
  }

  /** Deterministic sampled codebook (the k-means stand-in), constant-capped.
    * Selection is UNBIASED by id: a hash-mod rate filter (|corpus|/25
    * expected) then a hash-ranked limit as the absolute bound — a partial
    * per-partition top-k (TakeOrderedAndProject), one scan at any corpus
    * size. The previous `vec_id < 25*4096` prefix cap sampled only the
    * LOWEST-id shard once the corpus outgrew it — at 10x that meant a
    * replica-0-only codebook while the corpus mass sat elsewhere, and d17's
    * sampled cohesion margin went negative (the exact stale-codebook
    * failure a 100-TB deployment would hit with "first N rows" sampling).
    */
  private[graft] def sampledCentroids(emb: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    val h = graft.SampleHash.column($"vec_id")
    emb.filter(pmod(h, lit(IvfCentroidEvery.toLong)) === 0L)
      .orderBy(h, $"vec_id")
      .limit(IvfMaxCentroids)
      .select($"vec_id".as("centroid_id"), $"embedding".as("ce"))
  }

  /** Collapse a codebook to ONE row holding the centroid structs sorted by
    * id — the broadcastable form every assignment consumes. The only
    * exchange this introduces is the SinglePartition collect of |codebook|
    * rows (constant-capped); corpus rows never shuffle for assignment.
    */
  private[graft] def collapseCodebook(centroids: DataFrame): DataFrame = {
    import centroids.sparkSession.implicits._
    centroids.agg(array_sort(collect_list(struct($"centroid_id", $"ce"))).as("cents"))
  }

  /** Nearest-centroid cell assignment as a pure argmax projection over the
    * broadcast codebook row: no per-(vector, centroid) row expansion, no
    * window, no shuffle of corpus rows (plan-asserted in PlansSpec). The
    * argmax runs as one codegen'd static call per row (`nearest_centroid`).
    */
  private[graft] def assignCells(emb: DataFrame, centRow: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    emb.crossJoin(broadcast(centRow))
      .select($"vec_id", $"embedding",
              nearestCentroid($"embedding", $"cents").as("centroid_id"))
  }

  /** Lloyd-iteration k-means refinement of the sampled codebook — the real
    * training job the deterministic samples stand in for elsewhere. Per
    * iteration: the codebook collapses to ONE broadcast row and assignment
    * is a pure argmax-cosine projection (no shuffle); new centroids are
    * element-wise means via the vec_mean_agg imperative aggregate (one
    * in-place buffer per centroid), which partial-aggregates map-side so
    * the shuffle carries at most k x partitions rows — never the corpus.
    * Sums accumulate in Double so the merge-order nondeterminism of the
    * partial merge cannot perturb the Float means (ULP drift at argmax ties
    * would otherwise make neighbor lists vary run-to-run). The 100 TB
    * shape: per-iteration cost is one corpus scan.
    *
    * Each iteration's codebook is MATERIALIZED (localCheckpoint of k ≤
    * [[IvfMaxCentroids]] rows — driver-bounded by construction): iteration
    * i's plan embeds iteration i-1's whole lineage, and the finished
    * codebook is consumed by SEVERAL subtrees downstream (ivfSearch
    * broadcasts it once collapsed and once raw; d17 joins it again), so an
    * unmaterialized chain re-runs every earlier iteration's corpus scan
    * once per consumer — measured 1.74 s vs 1.1 s for d15 at sf0.1, and at
    * 100 TB the waste is (iters × consumers) extra corpus scans.
    */
  def kmeansCentroids(emb: DataFrame, iters: Int): DataFrame = {
    import emb.sparkSession.implicits._
    graft.functions.GraftFunctions.register(emb.sparkSession)
    var centroids = sampledCentroids(emb)
    for (_ <- 1 to iters) {
      val assigned = assignCells(emb, collapseCodebook(centroids))
        .select($"embedding", $"centroid_id")
      // Element-wise mean through the vec_mean_agg TypedImperativeAggregate:
      // an in-place (count, 64 double sums) buffer per centroid, partial
      // map-side so the exchange carries one 520-byte buffer per (centroid,
      // partition). Measured against both alternatives at sf0.1 (noop sink,
      // hot, 200 synthetic cells): this kernel 0.11 s; the r12 typed
      // map/groupByKey/reduceGroups chain 0.22 s (per-row Array[Double]
      // allocation + tuple ser/deser); 64 built-in sum(element_at(...))
      // aggregates 0.42 s hot plus a ~2.5 s codegen compile of the
      // generated 65-slot function.
      // Double accumulation keeps the Float means stable against
      // partial-merge order, exactly as before.
      centroids = assigned
        .groupBy($"centroid_id")
        .agg(graft.functions.GraftFunctions
          .vecMeanAgg($"embedding", lit(EmbedDim)).as("ce"))
        .localCheckpoint(true) // k rows; truncates the per-iteration lineage
    }
    centroids
  }

  /** IVF probe with a k-means-trained codebook (driver key d15): identical
    * query path to [[annIvf]], better cells — recall-gated through d13.
    */
  def annIvfTrained(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
    ivfSearch(emb, kmeansCentroids(emb, iters = 3))
  }

  /** Cell-probed search against a given codebook. Assignment is the
    * shuffle-free broadcast argmax of [[assignCells]]; only the probe window
    * (queries x codebook rows, both constant-bounded) and the final top-k
    * window move rows through an exchange, and WindowGroupLimit caps the
    * latter at k rows per map partition.
    */
  private def ivfSearch(emb: DataFrame, centroids0: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    val centroids = centroids0.select($"centroid_id", $"ce")
    val assigned = assignCells(emb, collapseCodebook(centroids))
    // queries probe their nearest cells — probe count scales with |cells|
    // (n_cells counted over the same tiny queries x codebook window frame)
    val wProbe = Window.partitionBy($"query_id").orderBy($"csim".desc, $"centroid_id".asc)
    val wCells = Window.partitionBy($"query_id")
    val probes = emb.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
      .crossJoin(broadcast(centroids))
      .select($"query_id", $"qe", $"centroid_id", cosineSim($"qe", $"ce").as("csim"))
      .withColumn("crank", row_number().over(wProbe))
      .withColumn("n_cells", count(lit(1)).over(wCells))
      .withColumn("cmax", max($"csim").over(wCells))
      // base probes for every query; ambiguous queries (cells within the
      // adaptive band of their best) widen up to the max fraction
      .filter($"crank" <= greatest(lit(IvfMinProbes), ceil($"n_cells" * IvfProbeFrac)) ||
              ($"csim" >= $"cmax" - IvfAdaptiveBand &&
               $"crank" <= ceil($"n_cells" * IvfMaxProbeFrac)))
      .select($"query_id", $"qe", $"centroid_id")
    // score only inside probed cells
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    assigned.join(broadcast(probes), Seq("centroid_id"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"), cosineSim($"qe", $"embedding").as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= K)
      .select($"query_id", $"neighbor_id", $"rank")
      .orderBy($"query_id", $"rank")
  }

  private val PqSubspaces = 8
  private val PqSubDim = 8      // 64-dim vectors -> 8 subvectors of 8 dims
  private val PqCodebookSize = 64

  /** PQ-style ANN: each vector is quantized to [[PqSubspaces]] one-byte codes
    * (nearest codebook entry per subspace, by inner product), and a query
    * scores the whole corpus in the COMPRESSED domain — its per-(subspace,
    * code) inner-product lookup table is broadcast and the approximate score
    * is the 8-way sum, so the full-precision vectors never participate in
    * the scan. The deterministic sampled codebook stands in for a k-means
    * training job (production codebooks are a few KB — always broadcast).
    *
    * Everything stays row-parallel: the codebook collapses to ONE broadcast
    * row, encode and scoring are pure array expressions (no explode, no
    * per-(vector,subspace) window, no re-agg shuffle — those cost a
    * |corpus|x8 shuffle in the naive layout).
    *
    * RE-RANK STAGE (the standard ADC + re-rank): the compressed scan keeps
    * a shortlist per query of ceil([[PqReRankFrac]] x |corpus|) rows — a
    * FRACTION, so the claim's recall holds at every SF (a fixed depth decays
    * as the corpus grows past it) — then exact cosine re-ranks only the
    * shortlist: recall@K becomes the compressed scan's recall@depth, which
    * quantization error barely dents. The fraction is resolved to a plan
    * LITERAL through a bounded one-row corpus count (the twoPhaseIndex
    * offsets rule), which keeps the WindowGroupLimit map-side cap on the
    * corpus-sized exchange at EVERY scale — the previous literal 512
    * per-partition pre-cap silently CLIPPED the fraction once
    * 0.25·|corpus| outgrew it (measured: recall 0.66 at 100×, d13's first
    * red row — exactly the fixed-depth decay this fraction exists to
    * prevent). The shortlist broadcasts back into a second corpus scan for
    * full-precision vectors, so the corpus never shuffles for the re-rank
    * and full vectors never leave their scan. Recall vs exact top-k is
    * gated through d13.
    */
  val PqReRankFrac = 0.25

  /** Hard ceiling on the re-rank depth. The shortlist (NumQueries × depth
    * id pairs) is BROADCAST back into the full-precision corpus scan, so
    * the fraction alone would grow the broadcast with the corpus and
    * eventually hit Spark's broadcast limits (512M rows / 8 GB) — the cap
    * bounds it to ~5M ids (~tens of MB) at any corpus size. Below the cap
    * the fraction governs (recall SF-stable, d13-gated at five points, the
    * cap never binding up to 1000×-scale testdata); past it the depth is
    * constant — standard production ADC economics, where re-rank depth is
    * a budget, not a corpus share, and recall rests on the compressed
    * scan's ranking quality.
    */
  val PqMaxDepth = 1000000L

  /** Literal re-rank depth = min(ceil(frac·|corpus|), [[PqMaxDepth]]),
    * memoized per (session, dir): the one-row count is the documented
    * bounded collect, and memoization keeps DataFrame CONSTRUCTION lazy
    * apart from the first call (the sigIndexCache pattern). The session key
    * is WEAK (WeakHashMap) so a stopped, dereferenced SparkSession does not
    * pin its entries for the JVM lifetime. STALENESS CONTRACT: the depth is
    * a snapshot of |corpus| at first call — if the data under `dir` is
    * rewritten within one session, the cached depth keeps the old count
    * (the fraction's recall contract degrades only if the corpus GROWS past
    * depth/frac); start a new session (or new dir) to re-resolve.
    */
  private val pqDepthCache =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, Long]]()
  private def pqDepth(s: SparkSession, dir: String, emb: DataFrame): Long = {
    val perSession = pqDepthCache.synchronized {
      var m = pqDepthCache.get(s)
      if (m == null) {
        m = scala.collection.concurrent.TrieMap.empty[String, Long]
        pqDepthCache.put(s, m)
      }
      m
    }
    perSession.getOrElseUpdate(dir,
      math.min(PqMaxDepth, math.max(K.toLong,
        math.ceil(emb.agg(count(lit(1))).head.getLong(0) * PqReRankFrac).toLong)))
  }
  def annPq(s: SparkSession, dir: String): DataFrame =
    annPqAtDepth(s, dir, depthOverride = None)

  /** [[annPq]] with a forced re-rank depth — the RecallProbe seam for
    * measuring the depth-vs-recall consequence of the [[PqMaxDepth]]
    * constant-budget regime (the cap binds only past 4M vectors, beyond
    * the largest generated dataset, so the binding regime is probed by
    * forcing depths BELOW ceil(frac·|corpus|) at x1000 scale).
    */
  private[graft] def annPqAtDepth(s: SparkSession, dir: String,
                                  depthOverride: Option[Long]): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
    // deterministic codebook: hash-sampled vectors (unbiased by id — see
    // sampledCentroids on why a low-id prefix cap goes stale at scale) ->
    // one row holding cbs[m][c] = subvector m of sample c (code ids
    // ordered by sample id)
    val cbHash = graft.SampleHash.column($"vec_id")
    val cb = emb.filter(pmod(cbHash, lit(29L)) === 0L)
      .orderBy(cbHash, $"vec_id")
      .limit(PqCodebookSize)
      .agg(array_sort(collect_list(struct($"vec_id", $"embedding"))).as("entries"))
      .select(expr(
        s"""transform(sequence(0, ${PqSubspaces - 1}),
           |  m -> transform(entries, e -> slice(e.embedding, m*$PqSubDim+1, $PqSubDim)))"""
          .stripMargin).as("cbs"))
    // per-subspace inner products against all 16 entries — shared shape
    // between corpus encode and query lookup tables
    val ipsAll = expr(
      s"""transform(sequence(0, ${PqSubspaces - 1}),
         |  m -> transform(cbs[m],
         |    cent -> aggregate(zip_with(slice(embedding, m*$PqSubDim+1, $PqSubDim), cent,
         |                               (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)))"""
        .stripMargin)
    // encode: argmax code per subspace — a codegen'd kernel (the HOF lambda
    // form runs interpreted per row; this is the corpus-sized hot loop)
    val codes = emb.crossJoin(broadcast(cb))
      .select($"vec_id", pqEncode($"embedding", $"cbs").as("codes"))
    // query LUTs are the same per-subspace IP tables, broadcast whole
    val qluts = emb.filter($"vec_id" < NumQueries).crossJoin(broadcast(cb))
      .select($"vec_id".as("query_id"), ipsAll.as("lut"))
    // compressed-domain scan: 8 array lookups + sum, pure projection. The
    // corpus-fraction depth resolves to a LITERAL via a bounded one-row
    // count so the rank filter compiles to a WindowGroupLimit partial cap
    // (a Column-bound depth cannot); memoized per (session, dir) so plan
    // CONSTRUCTION (explain, specs) does not re-pay the count job
    val depth = depthOverride.getOrElse(pqDepth(s, dir, emb))
    val wApprox = Window.partitionBy($"query_id").orderBy($"approx".desc, $"neighbor_id".asc)
    val shortlist = codes.crossJoin(broadcast(qluts))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        expr(s"aggregate(sequence(0, ${PqSubspaces - 1}), 0.0D, " +
             "(acc, m) -> acc + lut[m][codes[m]])").as("approx"))
      .withColumn("prank", row_number().over(wApprox))
      .filter($"prank" <= depth)
      .select($"query_id", $"neighbor_id")
    // exact re-rank of the shortlist: queries x depth rows broadcast into a
    // second corpus scan for full-precision vectors — no corpus shuffle
    val q = emb.filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"))
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    emb.join(broadcast(shortlist), $"vec_id" === $"neighbor_id")
      .join(broadcast(q), Seq("query_id"))
      .select($"query_id", $"neighbor_id", cosineSim($"qe", $"embedding").as("sim"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= K)
      .select($"query_id", $"neighbor_id", $"rank")
      .orderBy($"query_id", $"rank")
  }

  /** Recall floors per ANN method, shared by the d13 oracle claim and the
    * per-method specs. The floors are tuned for isotropic random testdata;
    * clustered production embeddings clear them by a wide margin.
    * Measured recall@10 after query-adaptive probing (margin-guided LSH
    * flips + IVF band widening; round-10 probe-policy lift: base fraction
    * 0.15→0.3, band 0.25→0.3, min probes 6→8, ivf2 Lloyd iters 2→3; PQ
    * shortlist-clip fix), at FIVE points sf0.001/0.01/0.1/10×/100×:
    * lsh 0.92-1.0, ivf 0.76-1.0, ivf2 0.76-1.0, pq 0.80-1.0 — each floor
    * sits >= 0.05 under its worst measured point, and recall RISES with
    * scale (the probe/depth fractions hold while neighbor margins sharpen).
    * Isotropic 64-dim testdata is the recall worst case (flat centroid
    * margins scatter true neighbors across cells), so these fractions are
    * the price of a 0.7 floor; clustered real embeddings reach the same
    * recall at far lower probe shares.
    */
  val RecallFloors: Seq[(String, Double)] =
    Seq("ivf" -> 0.7, "ivf2" -> 0.7, "lsh" -> 0.8, "pq" -> 0.7)

  /** Cross-engine recall gate over every ANN path: each method's recall@K
    * against the exact brute-force top-k, emitted as an oracle-assertable
    * claim (the DuckDB side asserts recall_ok = TRUE, so an ANN regression
    * that drops below its floor fails the hash compare — the same pattern
    * as q24's HLL bound). The raw neighbor lists of d06/d08/d12 stay
    * engine-specific by nature; this converts their guarantee into a
    * hash-checked row anyway.
    *
    * SAMPLE-ONLY AT SCALE: the exact reference side is inherently
    * brute-force — O(|corpus|) scored per probe — so the gate is a
    * VERIFICATION key, never a production query. The probe set is
    * constant-capped at [[NumQueries]] (spec-asserted), which bounds the
    * gate at NumQueries corpus scans' worth of work; at 100 TB the exact
    * side additionally runs against a deterministic corpus sample (q25's
    * hash-mod sharding), estimating recall rather than computing it over
    * every row — the ANN paths themselves stay full-corpus.
    */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val exact = cosineTopK(s, dir).select($"query_id", $"neighbor_id")
    val methods = Map[String, DataFrame](
      "ivf" -> annIvf(s, dir), "ivf2" -> annIvfTrained(s, dir),
      "lsh" -> annLsh(s, dir), "pq" -> annPq(s, dir))
    // ONE tagged union + ONE semi-join + ONE grouped count instead of a
    // per-method (semi-join, scalar agg) chain: the previous shape embedded
    // the exact brute-force subtree once per method, so the reference scan
    // (the expensive side of this referee) executed four times; here it is
    // a single build side. The floors frame (4 literal rows) re-attaches
    // per-method floors and keeps a method row present even in the
    // degenerate empty-neighbor-list case the old scalar agg handled.
    val tagged = methods.toSeq.map { case (name, df) =>
      df.select(lit(name).as("method"), $"query_id", $"neighbor_id")
    }.reduce(_.unionByName(_))
    val hits = tagged
      .join(exact, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy($"method").agg(count(lit(1)).as("n_hit"))
    val floors = RecallFloors.toDF("method", "recall_floor")
    floors.join(hits, Seq("method"), "left")
      .select($"method", $"recall_floor",
        (coalesce($"n_hit", lit(0L)) / (K * NumQueries).toDouble >= $"recall_floor")
          .as("recall_ok"))
      .orderBy($"method")
  }

  /** Cohesion floors for the d17 cluster-quality gate: the mean margin
    * between a member's similarity to its OWN cell centroid and to the
    * single global centroid must stay positive — per-cell centroids must fit
    * better than no clustering at all (the k-means-objective sanity bound,
    * the quality analogue of d13's recall floors). `trained_vs_sampled`
    * additionally asserts Lloyd refinement does not degrade cohesion vs the
    * deterministic sampled codebook (slack 0.005 absorbs Float mean drift).
    */
  val CohesionFloors: Seq[(String, Double)] =
    Seq("sampled" -> 0.0, "trained" -> 0.0)
  val TrainedVsSampledSlack = 0.005

  /** Per-codebook cohesion margin, one row per clustering: avg over the
    * corpus of cosine(v, own-centroid) - cosine(v, global-centroid). The
    * global centroid is an element-wise mean computed via posexplode +
    * hash-agg (partial map-side: only dim x partitions rows shuffle), own
    * assignment is the shuffle-free broadcast argmax of [[assignCells]], and
    * the margin itself is a single scalar agg — at any corpus size this is
    * two scans and no corpus-sized exchange.
    */
  private[graft] def cohesionMargins(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
    val global = emb.select(posexplode($"embedding"))
      .groupBy($"pos").agg(avg($"col").as("m"))
      .agg(array_sort(collect_list(struct($"pos", $"m"))).as("pm"))
      .select(expr("CAST(transform(pm, x -> x.m) AS ARRAY<FLOAT>)").as("ge"))
    def margin(cb: DataFrame, name: String): DataFrame = {
      val cents = cb.select($"centroid_id", $"ce")
      assignCells(emb, collapseCodebook(cents))
        .join(broadcast(cents), Seq("centroid_id"))
        .crossJoin(broadcast(global))
        .select((cosineSim($"embedding", $"ce") -
                 cosineSim($"embedding", $"ge")).as("gap"))
        .agg(avg($"gap").as("margin"))
        .select(lit(name).as("clustering"), $"margin")
    }
    margin(sampledCentroids(emb), "sampled")
      .union(margin(kmeansCentroids(emb, iters = 2), "trained"))
  }

  /** Cluster-quality gate (driver key d17): converts the engine-specific
    * cohesion margins into oracle-assertable claim rows, the d13 pattern —
    * DuckDB asserts cohesive = TRUE per clustering, so a clustering
    * regression (bad codebook, broken assignment) fails the hash compare.
    */
  def clusterQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val floorOf = CohesionFloors.toMap
    // both margins folded into ONE row so the claims derive from a single
    // lineage (no driver-side materialization)
    val wide = cohesionMargins(s, dir).agg(
      max(when($"clustering" === "sampled", $"margin")).as("ms"),
      max(when($"clustering" === "trained", $"margin")).as("mt"))
    // all three claim rows explode from the ONE wide row: the r12 shape
    // unioned three selects over `wide`, which re-evaluated the whole
    // cohesion subtree (2 codebooks × assignment scans) once per claim —
    // 18 embedding scans in the analyzed plan where 6 suffice
    wide.select(explode(array(
        struct(lit("sampled").as("clustering"),
               lit(floorOf("sampled")).as("margin_floor"),
               ($"ms" >= floorOf("sampled")).as("cohesive")),
        struct(lit("trained").as("clustering"),
               lit(floorOf("trained")).as("margin_floor"),
               ($"mt" >= floorOf("trained")).as("cohesive")),
        struct(lit("trained_vs_sampled").as("clustering"),
               lit(0.0).as("margin_floor"),
               ($"mt" >= $"ms" - TrainedVsSampledSlack).as("cohesive")))).as("r"))
      .select($"r.clustering".as("clustering"),
              $"r.margin_floor".as("margin_floor"),
              $"r.cohesive".as("cohesive"))
      .orderBy($"clustering")
  }

  // d27: constant cap on the eval reference set — benchmark suites are
  // thousands of items, not corpus-sized, so the collapsed row stays
  // broadcastable at any corpus SF.
  val SemEvalEvery = 7
  val SemEvalResidue = 3
  val SemEvalCap = 1024L
  // Exact/near copies of an eval item score ~1.0; the isotropic background's
  // max over the capped eval set stays below ~0.55 at every measured SF
  // (64-dim), so 0.6 separates the two regimes with a wide margin. The
  // verdict is engine-exact either way: both sides compute bit-identical
  // doubles (d05's rank compare proves the kernel pair), so the threshold
  // placement affects semantics, not cross-engine agreement.
  val SemThreshold = 0.6

  /** d27: embedding-space (semantic) decontamination — the modality the
    * lexical family (d09 exact fingerprints, d11 minhash bands, t21 n-gram
    * scores) cannot see: a paraphrased eval item shares no 8-gram with its
    * source but sits next to it in embedding space. The eval suite is
    * constant-capped and collapses to ONE broadcast row (the d08 codebook
    * pattern), so the verdict is a pure scan-local projection: the fused
    * `nearest_cosine` kernel walks the broadcast eval array ONCE per corpus
    * row and returns struct<id, sim> — the threshold verdict and the argmax
    * eval id project from the same call (lowest-id tie-break), corpus rows
    * cross no exchange before the output sort, and the |corpus| x |eval|
    * score matrix never materializes as rows.
    *
    * Self-match semantics, by design: eval-set members are corpus rows, so
    * every row matching the eval predicate scores 1.0 against itself and is
    * reported contaminated with nearest_eval_id = its own id. That is the
    * correct training-set verdict — the eval items themselves must never be
    * trained on — and it means `contaminated = 1` rows include exactly the
    * eval set plus its semantic neighbors.
    */
  def semanticDecontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.embeddings(s, dir)
    val evalRow = emb
      .filter($"vec_id" % SemEvalEvery === SemEvalResidue && $"vec_id" < SemEvalCap)
      .select($"vec_id".as("centroid_id"), $"embedding".as("ce"))
      .agg(array_sort(collect_list(struct($"centroid_id", $"ce"))).as("evals"))
    emb.crossJoin(broadcast(evalRow))
      .select($"vec_id", nearestCosine($"embedding", $"evals").as("nc"))
      .select(
        $"vec_id",
        $"nc.id".as("nearest_eval_id"),
        ($"nc.sim" >= SemThreshold).cast("long").as("contaminated"))
      .orderBy($"vec_id")
  }

  /** Cosine threshold for d28's within-cell near-duplicate test. Chosen in
    * an empirical gap of the within-cell pair-cosine distribution, like
    * d07's [[NearDupThreshold]]: driver SFs have NO pair above 0.60 (max
    * 0.5984 at sf0.1), and the 10x ScaleGen dataset — whose deterministic
    * replica perturbation creates the near-dup structure this operator
    * exists to find — has a 2.1e-4-wide gap around 0.764 (nearest pairs
    * 0.76396 / 0.76418), so DuckDB's float-precision cosine and the double
    * kernel cannot disagree on membership at any verified scale.
    *
    * The COMPARE is integer-quantized (round 11): both engines test
    * `floor(sim·1e4 + 0.5) >= [[SemDedupThresholdE4]]` — the repo's shared
    * e4 output-rounding convention (d40) applied to the verdict itself.
    * Rationale: at 100x/1000x, ScaleGen's replica-translate geometry parks
    * many pair cosines within float epsilon of 0.764, so a raw
    * `sim >= 0.764` flips threshold-grazing pairs between Spark's double
    * kernel and DuckDB — quantizing moves the decision boundary to 0.76395,
    * half a quantum away from where the data clusters, making the verdict
    * integer-exact cross-engine at every scale point (this is what
    * reclaimed d28/d35 into the 100x/1000x oracle gates). The reference
    * contract is exact-match gating, never epsilon-dependent
    * (state_manager.py:55-82).
    */
  val SemDedupThreshold = 0.764
  val SemDedupThresholdE4: Long = math.round(SemDedupThreshold * 1e4) // 7640

  /** d28: cluster-scoped semantic dedup — SemDeDup (Abbas et al. 2023,
    * arXiv:2303.09540). d07 answers "which pairs are semantic near-dups"
    * by blocked all-pairs (quadratic, constant-capped baseline); d27 flags
    * proximity to a broadcast EVAL set. This key is the third shape — full-
    * corpus semantic SELF-dedup made tractable by clustering: vectors are
    * assigned to their k-means cell (the d08 broadcast-codebook argmax,
    * zero corpus exchange), and the near-dup test runs only WITHIN cells,
    * so pair volume drops from |corpus|^2 to sum(cell^2) ~ |corpus|^2/k —
    * the paper's observation that semantic duplicates co-locate in
    * embedding space, which is exactly what lets 100-TB corpora dedup
    * semantically at all.
    *
    * Verdict is SemDeDup's per-cluster greedy keep-one: a vector is
    * removed iff SOME lower-id vector in its cell sits at cosine >=
    * [[SemDedupThreshold]] (deterministic id order replaces the paper's
    * random order; `dup_of` names the lowest such witness). Corpus moves
    * through exactly TWO exchanges, each on the stage's natural key: once
    * on centroid_id (the cell-local self-join, both sides co-partitioned)
    * and once on vec_id (attaching the verdict); the witness table that
    * comes back is |duplicates|-sized and deliberately NOT broadcast-hinted
    * (SemDeDup removes up to half the corpus at production thresholds — a
    * planned broadcast there is the classic small-table-that-isn't mistake;
    * AQE may still convert at runtime when a run measures small, which is
    * the safe direction). Cell skew is
    * bounded by the codebook's sampling rate and AQE's skew-join split
    * backstops unplanned hot cells.
    */
  def semDedup(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    import s.implicits._
    semDedupOn(Tables.embeddings(s, dir).select($"vec_id", $"embedding"))
  }

  /** Core of [[semDedup]] over an arbitrary (vec_id, embedding) frame —
    * seam for the spec's synthetic near-dup fixtures (driver-SF data has no
    * pair above the threshold by design; see [[SemDedupThreshold]]).
    */
  private[graft] def semDedupOn(emb: DataFrame): DataFrame = {
    import emb.sparkSession.implicits._
    val assigned = assignCells(emb, collapseCodebook(sampledCentroids(emb)))
    val lower = assigned.select($"centroid_id", $"vec_id".as("b_id"), $"embedding".as("be"))
    val dupOf = assigned.join(lower, Seq("centroid_id"))
      .filter($"b_id" < $"vec_id" &&
        floor(cosineSim($"embedding", $"be") * lit(1e4) + lit(0.5d)) >= SemDedupThresholdE4)
      .groupBy($"vec_id").agg(min($"b_id").as("dup_of"))
    assigned.select($"vec_id", $"centroid_id")
      .join(dupOf, Seq("vec_id"), "left")
      .select($"vec_id", $"centroid_id", $"dup_of",
              $"dup_of".isNull.cast("long").as("kept"))
      .orderBy($"vec_id")
  }

  /** ANN via multi-table random-hyperplane LSH: a candidate is anything that
    * collides with the query in at least one of the tables; exact cosine
    * ranks candidates. OR-amplification keeps recall high while each table's
    * join stays bucket-local (the spec measures recall against cosineTopK).
    */
  /** Margin-guided multi-probe (query-adaptive): per (query, table), the
    * query probes its own bucket PLUS up to [[LshMaxFlips]] hamming-1
    * neighbors — but ONLY the flips of planes whose query margin
    * |cos(q, plane)| is below [[LshFlipMargin]]. A hyperplane the query
    * sits right on top of is exactly the bit a true neighbor is likeliest
    * to disagree on; a plane the query clears decisively is not worth the
    * probe. Confident queries therefore stay at one bucket per table while
    * boundary-straddling queries fan out — recall rises precisely where
    * fixed single-probe LSH loses it. Probe fan-out is QUERY-side only
    * (NumQueries × NumTables rows); the corpus keeps one bucket per table.
    */
  val LshMaxFlips = 2
  val LshFlipMargin = 0.10
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    // ONE fused lsh_buckets call per corpus row, posexploded into the
    // (table_id, bucket) rows the band join consumes — the prior shape
    // built the 8-struct array from 8 per-table bucket expressions (32
    // cosine kernel calls per row against boxed array literals)
    val emb = Tables.embeddings(s, dir)
      .select($"vec_id", $"embedding",
        posexplode(graft.functions.GraftFunctions.lshBuckets($"embedding")))
      .select($"vec_id", $"embedding", $"pos".as("table_id"), $"col".as("bucket"))
    // query probes per table: own bucket + margin-guided bit flips
    val probesPerTable = array((0 until NumTables).map { t =>
      val base = lshBucket($"embedding", t)
      val flips = array((0 until PlanesPerTable).map { i =>
        struct(abs(cosineSim($"embedding", typedlit(planes(t * PlanesPerTable + i))))
                 .as("m"), lit(1L << i).as("bit"))
      }: _*)
      // weakest margins first; keep flips under the margin, cap the count
      val chosen = slice(
        filter(array_sort(flips), f => f.getField("m") < LshFlipMargin),
        1, LshMaxFlips)
      struct(lit(t).as("table_id"),
        concat(array(base), transform(chosen, f => base.bitwiseXOR(f("bit"))))
          .as("probe_buckets"))
    }: _*)
    val q = Tables.embeddings(s, dir).filter($"vec_id" < NumQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qe"),
        explode(probesPerTable).as("tp"))
      .select($"query_id", $"qe", $"tp.table_id",
        explode($"tp.probe_buckets").as("bucket"))
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    emb.join(broadcast(q), Seq("table_id", "bucket"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"), cosineSim($"qe", $"embedding").as("sim"))
      .distinct() // collapse multi-table collisions (sim is identical per pair)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= K)
      .select($"query_id", $"neighbor_id", $"rank")
      .orderBy($"query_id", $"rank")
  }

  /** d30 eval-query sample: deterministic and capped, so the oracle's
    * |queries| × |corpus| replay stays bounded at every SF (d27 pattern).
    */
  val KnnEvalEvery = 20
  val KnnEvalResidue = 1
  val KnnEvalCap = 2000L

  /** d30: k-NN label purity — the intrinsic embedding-quality metric over
    * the so-far-unused `label` column: for each sampled query vector, the
    * fraction of its k=10 exact nearest neighbors (cosine, full corpus,
    * self excluded) sharing its label. This is the standard kNN-classifier
    * leave-one-out readout: purity near 1 means the space separates the
    * classes; purity at 1/|classes| means the labels carry no geometry.
    *
    * Scale shape: the capped query sample broadcasts with its labels, so
    * the corpus crosses ZERO exchanges before the rank limit — neighbor
    * labels ride the corpus scan (no join-back), the rank filter compiles
    * to WindowGroupLimit (each partition keeps ≤ k rows per query), and
    * the purity agg runs over |queries| × k rows. At 100 TB the same agg
    * consumes ANN neighbor lists (d06/d08/d12) instead of the exact scan —
    * d13 gates how much purity that approximation costs.
    */
  def knnLabelPurity(s: SparkSession, dir: String): DataFrame =
    knnLabelPurityOf(Tables.embeddings(s, dir))

  private[graft] def knnLabelPurityOf(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val q = emb
      .filter($"vec_id" % KnnEvalEvery === KnnEvalResidue && $"vec_id" < KnnEvalCap)
      .select($"vec_id".as("query_id"), $"label".as("q_label"), $"embedding".as("qe"))
    val w = Window.partitionBy($"query_id").orderBy($"sim".desc, $"neighbor_id".asc)
    emb
      .crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"q_label", $"vec_id".as("neighbor_id"),
              $"label".as("n_label"), cosineSim($"qe", $"embedding").as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .groupBy($"query_id", $"q_label")
      .agg(sum(when($"n_label" === $"q_label", 1L).otherwise(0L)).as("n_agree"))
      .select($"query_id".as("vec_id"), $"q_label".as("label"),
              $"n_agree", ($"n_agree" / lit(K.toDouble)).as("knn_purity"))
      .orderBy($"vec_id")
  }

  /** d34: int8 embedding quantization — the standard serving/storage format
    * for embedding stores (4× smaller than float32, SIMD int8 dot products;
    * d12's PQ is the 8-64× lossy sibling). Per vector: symmetric max-abs
    * scaling, q_i = round(127·x_i/maxabs) via floor(v+0.5) — every step is
    * either exact integer math or ONE correctly-rounded IEEE double op, so
    * Spark and DuckDB produce bit-identical codes and the oracle replays
    * the full quantized vector through order-sensitive digests (sum, L1,
    * position-weighted dot, saturation count) rather than trusting a
    * lossy summary. round_err is the realized max |127·x/maxabs − q| —
    * ≤ 0.5 by construction, asserted as a column so a rounding-convention
    * drift on either engine fails the hash loudly. Scan-local per-row work
    * (zero exchanges before the output sort); the higher-order lambdas run
    * interpreted per element — if this ever sits on a 100-TB hot path the
    * d12 pq_encode codegen-kernel precedent applies directly.
    */
  def int8Quantize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val df = Tables.embeddings(s, dir)
      .withColumn("xd", transform($"embedding", e => e.cast("double")))
      .withColumn("maxabs", array_max(transform($"xd", e => abs(e))))
      .withColumn("q",
        when($"maxabs" === 0d, transform($"xd", _ => lit(0L)))
          .otherwise(transform($"xd",
            e => floor(e * lit(127d) / $"maxabs" + lit(0.5d)).cast("long"))))
    val err = when($"maxabs" === 0d, lit(0.0)).otherwise(
      array_max(zip_with($"xd", $"q",
        (a, b) => abs(a * lit(127d) / $"maxabs" - b))))
    val digest = aggregate(
      zip_with($"q", sequence(lit(1), size($"q")), (a, b) => a * b),
      lit(0L), (acc, e) => acc + e)
    df.select(
        $"vec_id",
        (floor($"maxabs" * lit(1e6) + lit(0.5d)) / lit(1e6)).as("scale_max"),
        aggregate($"q", lit(0L), (acc, e) => acc + e).as("q_sum"),
        aggregate($"q", lit(0L), (acc, e) => acc + abs(e)).as("q_l1"),
        aggregate($"q", lit(0L),
          (acc, e) => acc + when(abs(e) === 127L, lit(1L)).otherwise(lit(0L))).as("n_sat"),
        digest.as("q_digest"),
        (floor(err * lit(1e4) + lit(0.5d)) / lit(1e4)).as("round_err"),
        (err <= lit(0.5d)).as("within_half_ulp"))
      .orderBy($"vec_id")
  }

  /** d35: corpus cartography — the per-region content map of the embedding
    * space ("what is IN my 100-TB corpus, and where"): every vector is
    * assigned to its nearest-codebook cell and each cell reports size,
    * corpus share, length and quality profile, and its dominant source —
    * the readout that steers d14/d19's mixing weights and flags the
    * regions SemDeDup (d28) will collapse. Dataset-cartography posture:
    * you cannot curate what you cannot see, and at 100 TB "look at the
    * data" IS this aggregate. Plan shape: cell assignment is the
    * broadcast-codebook argmax (zero corpus exchange, d08's pattern); the
    * doc-metadata join is ONE natural-key exchange per side (vec_id =
    * doc_id); everything after partial-aggregates to |cells| x |sources|
    * rows, the dominant-source window ranks only those, and the corpus
    * total rides in as a broadcast one-row cross join. All outputs are
    * exact integers (ppm shares, e4-scaled quality, div means) — the
    * oracle replays the full chain bit-for-bit.
    */
  def corpusMap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val emb = Tables.embeddings(s, dir).select($"vec_id", $"embedding")
    val assigned = assignCells(emb, collapseCodebook(sampledCentroids(emb)))
      .select($"vec_id", $"centroid_id")
    val meta = Tables.documents(s, dir).select(
      $"doc_id", $"source", $"n_chars",
      floor(TextOps.qualityCol * lit(10000d) + lit(0.5d)).cast("long").as("q_e4"))
    val perSrc = assigned
      .join(meta, $"vec_id" === $"doc_id")
      .groupBy($"centroid_id", $"source")
      .agg(count(lit(1)).as("n"), sum($"n_chars").as("chars"), sum($"q_e4").as("qsum"))
    val wTop = Window.partitionBy($"centroid_id").orderBy($"n".desc, $"source".asc)
    val wCell = Window.partitionBy($"centroid_id")
    perSrc
      .withColumn("rk", row_number().over(wTop))
      .withColumn("n_vecs", sum($"n").over(wCell))
      .withColumn("sum_chars", sum($"chars").over(wCell))
      .withColumn("sum_q", sum($"qsum").over(wCell))
      .filter($"rk" === 1)
      .crossJoin(broadcast(emb.agg(count(lit(1)).as("n_total"))))
      .select(
        $"centroid_id".as("cell_id"),
        $"n_vecs",
        expr("n_vecs * 1000000L div n_total").as("share_ppm"),
        expr("sum_chars div n_vecs").as("chars_per_doc"),
        expr("sum_q div n_vecs").as("avg_q_e4"),
        $"source".as("top_source"),
        $"n".as("top_source_n"))
      .orderBy($"cell_id")
  }

  /** d40: hard-negative mining — the data-prep step of contrastive
    * embedding training (SimCLR/DPR curricula): per anchor, the
    * highest-similarity candidates with a DIFFERENT label are exactly the
    * negatives worth training on (random negatives are trivially separable
    * and teach nothing), and the margin against the anchor's best POSITIVE
    * turns d30's purity readout actionable — a negative margin names a
    * confusable pair (label noise or genuinely hard example, the rows a
    * curation pass reviews first). Same sampled-anchor law as d30 (anchors
    * broadcast WITH labels so candidate labels ride the corpus scan, no
    * join-back); the corpus crosses ZERO exchanges before the per-anchor
    * window — one partitioning carries both the negatives-only rank (an
    * ordered conditional cumsum: row_number can't count a subset) and the
    * best-positive max (unordered frame, same key, no second exchange).
    * Doubles are the engine-exact cosine kernel (d05 precedent), rounded
    * by the shared floor(x·1e4 + 0.5) convention only at the OUTPUT. At
    * 100 TB the same window consumes ANN candidate lists (d06/d08/d12)
    * instead of the exact scan, d13 gating the recall cost.
    */
  val HardNegK = 5
  def hardNegatives(s: SparkSession, dir: String): DataFrame =
    hardNegativesOf(Tables.embeddings(s, dir))

  private[graft] def hardNegativesOf(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    graft.functions.GraftFunctions.register(s)
    val q = emb
      .filter($"vec_id" % KnnEvalEvery === KnnEvalResidue && $"vec_id" < KnnEvalCap)
      .select($"vec_id".as("query_id"), $"label".as("q_label"), $"embedding".as("qe"))
    val byQuery = Window.partitionBy($"query_id")
    val ordered = byQuery.orderBy($"sim".desc, $"neighbor_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    emb.crossJoin(broadcast(q))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"q_label", $"vec_id".as("neighbor_id"),
              $"label".as("n_label"), cosineSim($"qe", $"embedding").as("sim"))
      .withColumn("is_neg", $"n_label" =!= $"q_label")
      .withColumn("neg_rank", sum(when($"is_neg", 1L).otherwise(0L)).over(ordered))
      .withColumn("pos_sim", max(when(!$"is_neg", $"sim")).over(byQuery))
      .filter($"is_neg" && $"neg_rank" <= HardNegK)
      .select($"query_id", $"q_label", $"neg_rank".as("rank"),
        $"neighbor_id", $"n_label",
        (floor($"sim" * 1e4 + 0.5) / 1e4).as("neg_sim"),
        (floor($"pos_sim" * 1e4 + 0.5) / 1e4).as("best_pos_sim"),
        (floor(($"pos_sim" - $"sim") * 1e4 + 0.5) / 1e4).as("margin"))
      .orderBy($"query_id", $"rank")
  }
}
