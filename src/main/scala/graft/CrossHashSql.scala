package graft

import graft.functions.CrossHash

/** DuckDB SQL mirrors of the cross-engine hash kernels
  * (graft.functions.CrossHash / crosskernels).
  *
  * The minhash/simhash dedup operators are oracle-checked end to end: the
  * oracle recomputes tokenization, shingling, signatures, LSH banding and
  * candidate generation in pure SQL with bit-identical arithmetic (everything
  * stays below 2^62, so plain BIGINT suffices in both engines). These
  * builders keep that SQL in one place and inline the shared affine
  * constants from [[CrossHash]].
  */
object CrossHashSql {
  private val P = CrossHash.P

  /** 32-entry affine-family constants as DuckDB list literals. */
  val AList: String = CrossHash.A.take(32).mkString("[", ", ", "]")
  val BList: String = CrossHash.B.take(32).mkString("[", ", ", "]")

  /** poly31(e, salt): fold (acc*131 + codepoint) % P over the chars of
    * string expression `e`, starting from `salt` (mirrors CrossHash.poly31;
    * the salt rides in as the list head because list_reduce has no init arg).
    * Lambda vars pa/px are chosen to not collide with enclosing lambdas.
    * The empty-element filter matters: DuckDB splits '' into [''] (and
    * ord('') = -1), whereas the Scala kernel folds zero code points for an
    * empty token — filtering '' makes both return `salt` there, and it is a
    * no-op for non-empty tokens (char splits never contain '').
    */
  def poly31(e: String, salt: Long): String =
    s"list_reduce(list_prepend(CAST($salt AS BIGINT), " +
      s"list_transform(list_filter(regexp_split_to_array($e, ''), pf -> pf <> ''), " +
      s"pc -> CAST(ord(pc) AS BIGINT))), " +
      s"(pa, px) -> (pa * 131 + px) % $P)"

  /** Shared minhash CTE chain over `documents`:
    * toks -> k-gram strings -> gram hashes -> 32-component signature ->
    * 8 bands keyed by the rendered 4-slice. Ends without trailing comma.
    */
  def minhashCtes(k: Int = 3): String = {
    val gramExpr = (0 until k).map(j => s"toks[gi+$j]").mkString(" || ' ' || ")
    s"""w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents),
       |g AS (SELECT doc_id, CASE WHEN len(toks) < $k THEN CAST([] AS VARCHAR[])
       |        ELSE list_transform(range(1, len(toks) - ${k - 2}), gi -> $gramExpr) END AS grams
       |      FROM w),
       |hs AS (SELECT doc_id, list_transform(grams, t -> ${poly31("t", 0)}) AS hv FROM g),
       |sig AS (SELECT doc_id, list_transform(range(0, 32), i ->
       |          COALESCE(list_min(list_transform(hv, h -> (($AList)[i+1] * h + ($BList)[i+1]) % $P)),
       |                   ($BList)[i+1])) AS sig
       |        FROM hs),
       |band AS (SELECT doc_id, sig, b AS band_id,
       |                array_to_string(list_slice(sig, b*4+1, b*4+4), ',') AS band_key
       |         FROM sig, UNNEST(range(0, 8)) t(b))""".stripMargin
  }

  /** Signature-agreement estimate between two sig-array expressions. */
  def estJaccard(a: String, b: String): String =
    s"len(list_filter(range(0, 32), i -> $a[i+1] = $b[i+1])) / 32.0"

  /** Left-fold double dot product of two FLOAT[] expressions — list_reduce
    * (contractually ordered), matching kernels.cosineF's accumulation
    * order exactly. Lambda vars ca/cx/ci avoid enclosing-lambda collisions.
    */
  private def dotD(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, least(len($a), len($b)) + 1), " +
      s"ci -> CAST($a[ci] AS DOUBLE) * CAST($b[ci] AS DOUBLE)), (ca, cx) -> ca + cx)"

  /** BIT-EXACT double replay of kernels.cosineF for the oracle side:
    * DuckDB's native list_cosine_similarity on FLOAT[] accumulates in
    * FLOAT32 (measured ~1e-7 absolute error at 100x), so raw-sim argmax /
    * threshold compares against the double kernel flip on near-ties — the
    * round-10 d28/d35 scale-gate divergence. This form accumulates
    * left-to-right in DOUBLE and divides by sqrt(na)*sqrt(nb) (NOT
    * sqrt(na*nb) — a different rounding), the kernel's exact op sequence;
    * measured bit-equal (==) to the kernel on the formerly-diverging
    * pairs. ~10x the native cost per pair — use natively-prefiltered: scan
    * with the FLOAT sim, keep candidates within [[CosineFloatBand]] of the
    * decision, replay only those in double (|native − double| measured
    * ≤ 2.1e-7, analytic float32 bound ~1e-5 — the band is ≥ 20x both).
    * Zero-norm vectors divide by zero here while the kernel defines 0.0 —
    * spec-guarded absent at every SF (the d27 note).
    */
  def cosineDouble(a: String, b: String): String =
    s"(${dotD(a, b)} / (sqrt(${dotD(a, a)}) * sqrt(${dotD(b, b)})))"

  /** Native-vs-double error band for the prefilter (see [[cosineDouble]]). */
  val CosineFloatBand = 1e-4

  /** Shared simhash CTE chain over `documents`: toks -> per-token 60-bit
    * hash -> per-bit votes -> 60-bit fingerprint -> 4 x 15-bit bands ->
    * deduped candidate pairs with exact hamming distance.
    */
  def simhashCtes: String =
    s"""w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS t FROM w),
       |th AS (SELECT doc_id, (${poly31("t", 1)} % 1073741824)
       |                    + (${poly31("t", 2)} % 1073741824) * 1073741824 AS h FROM tok),
       |bits AS (SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
       |         FROM th, UNNEST(range(0, 60)) r(b) GROUP BY doc_id, b),
       |sh AS (SELECT doc_id, CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sh
       |       FROM bits GROUP BY doc_id),
       |band AS (SELECT doc_id, sh, b AS band_id, (sh >> (b*15)) & 32767 AS band_bits
       |         FROM sh, UNNEST(range(0, 4)) t(b)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |                CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
       |         FROM band a JOIN band b
       |           ON a.band_id = b.band_id AND a.band_bits = b.band_bits AND a.doc_id < b.doc_id)""".stripMargin

  /** Wide (120-bit) simhash chain for d43: two independently-salted 60-bit
    * halves through the same kernel arithmetic as [[simhashCtes]] — lo is
    * the d03 fingerprint, hi runs the identical chain over 'w'-prefixed
    * tokens (an independent hash family; both engines build the prefix the
    * same way) — then 4 x 30-bit bands and exact hamming over the
    * concatenated signature. The 2^30-key band space is what keeps the
    * candidate pair view linear at multi-million-doc corpora where d03's
    * 2^15-key bands saturate (expected bucket occupancy |corpus|/2^30).
    */
  def simhashWideCtes: String =
    s"""w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM documents),
       |tok AS (SELECT doc_id, unnest(toks) AS t FROM w),
       |th AS (SELECT doc_id,
       |         (${poly31("t", 1)} % 1073741824) + (${poly31("t", 2)} % 1073741824) * 1073741824 AS hl,
       |         (${poly31("'w' || t", 1)} % 1073741824) + (${poly31("'w' || t", 2)} % 1073741824) * 1073741824 AS hh
       |       FROM tok),
       |bits AS (SELECT doc_id, b,
       |           SUM(CASE WHEN (hl >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vl,
       |           SUM(CASE WHEN (hh >> b) & 1 = 1 THEN 1 ELSE -1 END) AS vh
       |         FROM th, UNNEST(range(0, 60)) r(b) GROUP BY doc_id, b),
       |sg AS (SELECT doc_id,
       |         CAST(SUM(CASE WHEN vl > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sh_lo,
       |         CAST(SUM(CASE WHEN vh > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sh_hi
       |       FROM bits GROUP BY doc_id),
       |band AS (SELECT doc_id, sh_lo, sh_hi, b AS band_id,
       |           CASE WHEN b < 2 THEN (sh_lo >> (b*30)) & 1073741823
       |                ELSE (sh_hi >> ((b-2)*30)) & 1073741823 END AS band_bits
       |         FROM sg, UNNEST(range(0, 4)) t(b)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |                CAST(bit_count(xor(a.sh_lo, b.sh_lo)) + bit_count(xor(a.sh_hi, b.sh_hi)) AS BIGINT) AS hamming
       |         FROM band a JOIN band b
       |           ON a.band_id = b.band_id AND a.band_bits = b.band_bits AND a.doc_id < b.doc_id)""".stripMargin
}
