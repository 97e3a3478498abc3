package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Minimal input-type validation (Spark 4 hides AbstractDataType, so the
  * ExpectsInputTypes route isn't open to third-party expressions).
  */
object GraftTypeCheck {
  /** Structural comparison ignoring nullability flags. */
  private def sameShape(a: DataType, b: DataType): Boolean = (a, b) match {
    case (ArrayType(ea, _), ArrayType(eb, _)) => sameShape(ea, eb)
    case _ => a == b
  }

  def expect(name: String, children: Seq[Expression], expected: Seq[DataType]): TypeCheckResult = {
    val mismatch = children.zip(expected).zipWithIndex.collectFirst {
      case ((c, e), i) if !sameShape(c.dataType, e) => (i, c.dataType, e)
    }
    mismatch match {
      case Some((i, got, want)) => TypeCheckResult.TypeCheckFailure(
        s"$name argument $i expects ${want.simpleString}, got ${got.simpleString}")
      case None => TypeCheckResult.TypeCheckSuccess
    }
  }
}

/** Static kernels shared by interpreted eval and generated code. Keeping the
  * bodies here means doGenCode emits a single static call — the expression
  * stays inside whole-stage codegen without us generating the loop by hand.
  */
object kernels {

  /** Cosine similarity over float vectors, accumulated in double. */
  def cosineF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** 64-bit simhash over a token array: per-token 64-bit hash votes on each
    * bit position; the sign of the tally sets the output bit.
    */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val h = fnv1a64(tokens.getUTF8String(i))
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) counts(bit) += 1 else counts(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var out = 0L; var bit = 0
    while (bit < 64) { if (counts(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  /** FNV-1a over UTF8 bytes — stable, allocation-free token hash. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Hashes of all k-word shingles in one pass over the token array
    * (order-sensitive combination of per-token hashes).
    */
  def shingleHashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = fnv1a64(tokens.getUTF8String(i)); i += 1 }
    val out = new Array[Long](n - k + 1)
    i = 0
    while (i <= n - k) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) { h ^= th(i + j); h = h * 0x100000001b3L + j; j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature: sig(i) = min over shingle hashes h of a_i*h+b_i
    * (mod 2^64 arithmetic; universal-ish family from a splitmix64 stream).
    */
  def minhashSignature(hashes: ArrayData, numHashes: Int): ArrayData = {
    val n = hashes.numElements()
    val sig = new Array[Long](numHashes)
    var i = 0
    while (i < numHashes) {
      val a = MinHashParams.A(i); val b = MinHashParams.B(i)
      var best = -1L // unsigned max: every 64-bit value compares below it
      var j = 0
      while (j < n) {
        val v = a * hashes.getLong(j) + b
        // unsigned comparison so the full 64-bit range is usable
        if (v + Long.MinValue < best + Long.MinValue) best = v
        j += 1
      }
      sig(i) = if (n == 0) 0L else best
      i += 1
    }
    new GenericArrayData(sig)
  }
}

/** Deterministic affine parameters for the minhash family (splitmix64). */
object MinHashParams {
  private def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  val MaxHashes = 64
  val A: Array[Long] = Array.tabulate(MaxHashes)(i => splitmix(2L * i) | 1L)
  val B: Array[Long] = Array.tabulate(MaxHashes)(i => splitmix(2L * i + 1))
}

/** cosine_sim(array<float>, array<float>) -> double, codegen'd. */
case class CosineSimilarityExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeCheck.expect(prettyName, Seq(left, right), Seq(ArrayType(FloatType), ArrayType(FloatType)))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    kernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = graft.functions.kernels.cosineF($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** simhash64(array<string>) -> long, codegen'd. */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeCheck.expect(prettyName, Seq(child), Seq(ArrayType(StringType)))
  override def dataType: DataType = LongType
  override def nullSafeEval(tokens: Any): Any =
    kernels.simhash64(tokens.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.kernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** shingle_hashes(array<string>, k) -> array<long>: one-pass k-gram hashes. */
case class ShingleHashesExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeCheck.expect(prettyName, Seq(left, right), Seq(ArrayType(StringType), IntegerType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(tokens: Any, k: Any): Any =
    kernels.shingleHashes(tokens.asInstanceOf[ArrayData], k.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) => s"graft.functions.kernels.shingleHashes($t, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "shingle_hashes"
}

/** minhash_sig(array<long>, numHashes) -> array<long>. */
case class MinHashSignatureExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeCheck.expect(prettyName, Seq(left, right), Seq(ArrayType(LongType), IntegerType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(hashes: Any, n: Any): Any =
    kernels.minhashSignature(hashes.asInstanceOf[ArrayData], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (h, n) => s"graft.functions.kernels.minhashSignature($h, $n)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
  override def prettyName: String = "minhash_sig"
}
