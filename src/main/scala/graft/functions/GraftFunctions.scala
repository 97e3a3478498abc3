package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.SparkSessionExtensions

/** Column-API entry points for the custom Catalyst expressions.
  *
  * Registration goes through the session FunctionRegistry (also injectable
  * via [[GraftExtensions]] for `--conf spark.sql.extensions=` deployments),
  * and the Column wrappers below use `call_function`, which resolves through
  * that registry — so the same names work from SQL text and from the
  * DataFrame API.
  */
object GraftFunctions {

  private val registry: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_sim"      -> (es => CosineSimilarityExpr(es(0), es(1))),
    "simhash64"       -> (es => SimHash64Expr(es(0))),
    "shingle_hashes"  -> (es => ShingleHashesExpr(es(0), es(1))),
    "minhash_sig"     -> (es => MinHashSignatureExpr(es(0), es(1))),
    "shingle_strings" -> (es => ShingleStringsExpr(es(0), es(1))),
    "overlap_marks"   -> (es => OverlapMarksExpr(es(0))),
    "overlap_marks_mask" -> (es => OverlapMarksMaskExpr(es(0), es(1))),
    "lsh_buckets"     -> (es => LshBucketsExpr(es(0))),
    "vec_mean_agg"    -> (es => VecMeanAggExpr(es(0), es(1))),
    "simhash60"       -> (es => SimHash60Expr(es(0))),
    "simhash_wide120" -> (es => SimHashWide120Expr(es(0))),
    "minhash_sig31"   -> (es => MinHashSig31Expr(es(0), es(1))),
    "gram_hashes31"   -> (es => GramHashes31Expr(es(0), es(1))),
    "term_counts"     -> (es => TermCountsExpr(es(0), es(1))),
    "minhash_shingle_sig" -> (es => MinhashShingleSigExpr(es(0), es(1), es(2))),
    "pq_encode"       -> (es => PqEncodeExpr(es(0), es(1))),
    "nearest_centroid" -> (es => NearestCentroidExpr(es(0), es(1))),
    "max_cosine"      -> (es => MaxCosineExpr(es(0), es(1))),
    "nearest_cosine"  -> (es => NearestCosineExpr(es(0), es(1))),
    "topk_agg"        -> (es => TopKAggExpr(es(0), es(1))),
    "bloom_agg"       -> (es => BloomAggExpr(es(0), es(1), es(2))),
    "bloom_contains"  -> (es => BloomContainsExpr(es(0), es(1))),
    "nfc_norm"        -> (es => NfcNormalizeExpr(es(0))),
    "tree_ancestors"  -> (es => TreeAncestorsExpr(es(0))),
    "cms_agg"         -> (es => CmsAggExpr(es(0), es(1), es(2), es(3))),
    "cms_query"       -> (es => CmsQueryExpr(es(0), es(1))),
    "regex_count"     -> (es => RegexCountExpr(es(0), es(1))),
    "non_alnum_count" -> (es => NonAlnumCountExpr(es(0))),
    "interleave_bits" -> (es => InterleaveBitsExpr(es(0), es(1))),
    "hash_embed"      -> (es => HashEmbedExpr(es(0), es(1))),
  )

  /** Idempotently register all graft functions on a session. */
  def register(spark: SparkSession): Unit = registry.foreach { case (name, builder) =>
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
  }

  import org.apache.spark.sql.functions.call_function

  def cosineSim(a: Column, b: Column): Column = call_function("cosine_sim", a, b)
  def hashEmbed(tokens: Column, dims: Column): Column = call_function("hash_embed", tokens, dims)
  def simhash64(tokens: Column): Column = call_function("simhash64", tokens)
  def shingleHashes(tokens: Column, k: Column): Column = call_function("shingle_hashes", tokens, k)
  def minhashSig(hashes: Column, n: Column): Column = call_function("minhash_sig", hashes, n)
  def shingleStrings(tokens: Column, k: Column): Column = call_function("shingle_strings", tokens, k)
  def overlapMarks(srcs: Column): Column = call_function("overlap_marks", srcs)
  def overlapMarksMask(mask: Column, names: Column): Column =
    call_function("overlap_marks_mask", mask, names)
  def lshBuckets(emb: Column): Column = call_function("lsh_buckets", emb)
  def vecMeanAgg(v: Column, dim: Column): Column = call_function("vec_mean_agg", v, dim)
  def simhash60(tokens: Column): Column = call_function("simhash60", tokens)
  def simhashWide120(tokens: Column): Column = call_function("simhash_wide120", tokens)
  def minhashSig31(grams: Column, n: Column): Column = call_function("minhash_sig31", grams, n)
  def termCounts(toks: Column, terms: Column): Column = call_function("term_counts", toks, terms)
  def minhashShingleSig(tokens: Column, k: Column, n: Column): Column =
    call_function("minhash_shingle_sig", tokens, k, n)
  def pqEncode(emb: Column, cbs: Column): Column = call_function("pq_encode", emb, cbs)
  def nearestCentroid(emb: Column, cents: Column): Column =
    call_function("nearest_centroid", emb, cents)
  def maxCosine(emb: Column, cents: Column): Column =
    call_function("max_cosine", emb, cents)
  def nearestCosine(emb: Column, cents: Column): Column =
    call_function("nearest_cosine", emb, cents)
  def topkAgg(v: Column, k: Column): Column = call_function("topk_agg", v, k)
  def bloomAgg(v: Column, bits: Column, hashes: Column): Column =
    call_function("bloom_agg", v, bits, hashes)
  def bloomContains(bloom: Column, v: Column): Column =
    call_function("bloom_contains", bloom, v)
  def nfcNorm(v: Column): Column = call_function("nfc_norm", v)
  def treeAncestors(id: Column): Column = call_function("tree_ancestors", id)
  def cmsAgg(term: Column, weight: Column, depth: Column, width: Column): Column =
    call_function("cms_agg", term, weight, depth, width)
  def cmsQuery(sketch: Column, term: Column): Column = call_function("cms_query", sketch, term)
  def regexCount(s: Column, pattern: Column): Column = call_function("regex_count", s, pattern)
  def interleaveBits(x: Column, y: Column): Column = call_function("interleave_bits", x, y)

  /** Registry-free regex_count for context-free Column builders (e.g.
    * TextOps.qualityCol, which has no session to register on): the Column
    * wraps the expression directly, so it resolves on ANY session.
    */
  def regexCountDirect(s: Column, pattern: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(RegexCountExpr(GraftSqlShim.expr(s), GraftSqlShim.expr(pattern)))
  }

  /** Registry-free non_alnum_count (see [[kernels.nonAlnumSpaceCount]]). */
  def nonAlnumCountDirect(s: Column): Column = {
    import org.apache.spark.sql.GraftSqlShim
    GraftSqlShim.column(NonAlnumCountExpr(GraftSqlShim.expr(s)))
  }
}

/** `spark.sql.extensions=graft.functions.GraftExtensions` injection point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String) = new ExpressionInfo("graft.functions", name)
    ext.injectFunction((FunctionIdentifier("cosine_sim"), info("cosine_sim"),
      (es: Seq[Expression]) => CosineSimilarityExpr(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("simhash64"), info("simhash64"),
      (es: Seq[Expression]) => SimHash64Expr(es(0))))
    ext.injectFunction((FunctionIdentifier("shingle_hashes"), info("shingle_hashes"),
      (es: Seq[Expression]) => ShingleHashesExpr(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("minhash_sig"), info("minhash_sig"),
      (es: Seq[Expression]) => MinHashSignatureExpr(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("shingle_strings"), info("shingle_strings"),
      (es: Seq[Expression]) => ShingleStringsExpr(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("simhash60"), info("simhash60"),
      (es: Seq[Expression]) => SimHash60Expr(es(0))))
    ext.injectFunction((FunctionIdentifier("simhash_wide120"), info("simhash_wide120"),
      (es: Seq[Expression]) => SimHashWide120Expr(es(0))))
    ext.injectFunction((FunctionIdentifier("minhash_sig31"), info("minhash_sig31"),
      (es: Seq[Expression]) => MinHashSig31Expr(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("minhash_shingle_sig"), info("minhash_shingle_sig"),
      (es: Seq[Expression]) => MinhashShingleSigExpr(es(0), es(1), es(2))))
    ext.injectFunction((FunctionIdentifier("pq_encode"), info("pq_encode"),
      (es: Seq[Expression]) => PqEncodeExpr(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("nearest_centroid"), info("nearest_centroid"),
      (es: Seq[Expression]) => NearestCentroidExpr(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("nearest_cosine"), info("nearest_cosine"),
      (es: Seq[Expression]) => NearestCosineExpr(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("topk_agg"), info("topk_agg"),
      (es: Seq[Expression]) => TopKAggExpr(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("bloom_agg"), info("bloom_agg"),
      (es: Seq[Expression]) => BloomAggExpr(es(0), es(1), es(2))))
    ext.injectFunction((FunctionIdentifier("bloom_contains"), info("bloom_contains"),
      (es: Seq[Expression]) => BloomContainsExpr(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("nfc_norm"), info("nfc_norm"),
      (es: Seq[Expression]) => NfcNormalizeExpr(es(0))))
    ext.injectFunction((FunctionIdentifier("tree_ancestors"), info("tree_ancestors"),
      (es: Seq[Expression]) => TreeAncestorsExpr(es(0))))
    ext.injectFunction((FunctionIdentifier("cms_agg"), info("cms_agg"),
      (es: Seq[Expression]) => CmsAggExpr(es(0), es(1), es(2), es(3))))
    ext.injectFunction((FunctionIdentifier("cms_query"), info("cms_query"),
      (es: Seq[Expression]) => CmsQueryExpr(es(0), es(1))))
    // whole-operator extension: plans graft.plans.AsOfJoin into its
    // sort-merge exec for sessions configured with spark.sql.extensions
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // domain algebraic rewrites (nfc idempotence) as an optimizer rule
    ext.injectOptimizerRule(_ => graft.plans.GraftOptimizations)
  }
}
