package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector math for the similarity/ANN operators.
  *
  * The declarative `aggregate(zip_with(...))` formulation of a dot
  * product runs interpreted lambdas per element in Spark 4 — fine for
  * one projection, ruinous when every candidate pair of a 100 TB
  * embedding join pays it. These expressions do the same arithmetic
  * (sequential index-order accumulation, floats widened to double
  * before multiply — bit-identical to the left fold they replace, and
  * to the DuckDB oracle's `list_sum(list_transform(...))`) in one
  * static Java call that stays inside WholeStageCodegen.
  */
object VectorMath {
  /** Deterministic pseudo-random hyperplanes in [-0.5, 0.5) for sign
    * LSH, seeded so the DuckDB oracle can inline the identical matrix
    * (see SparkEntry.planesSql). Generation order (row-major, one
    * Random(42) stream) is part of the oracle contract — do not
    * reorder.
    */
  def hyperplanes(dim: Int, nBits: Int): Array[Array[Double]] =
    hyperplanes(dim, nBits, 42)

  /** Seeded variant — each OR'd hash table of the amplified LSH path
    * (r11) draws an independent plane matrix from its own seed
    * (table t uses seed 42 + t; table 0 ≡ the unseeded overload, so
    * single-table callers and their oracles are unchanged).
    */
  def hyperplanes(dim: Int, nBits: Int, seed: Int): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(nBits)(Array.fill(dim)(rng.nextDouble() - 0.5))
  }

  /** Dot product of two float vectors, widened to double per element,
    * accumulated in index order (the fold order both engines use).
    */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Sign-LSH bucket id: bit b set iff the projection onto plane b is
    * positive after rounding to 6 decimals. The rounding makes the sign
    * decision robust to last-ulp summation differences between engines
    * (an unrounded `proj > 0` can flip on a near-zero projection);
    * `Math.round(x*1e6) > 0` is exactly DuckDB's `ROUND(proj, 6) > 0`
    * for the sign test (half-away vs half-up differ only on negative
    * exact halves, which are non-positive either way).
    */
  def lshBucket(v: ArrayData, planes: Array[Array[Double]]): Long = {
    var bucket = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      val n = math.min(v.numElements(), p.length)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getFloat(i).toDouble * p(i); i += 1 }
      if (java.lang.Math.round(acc * 1e6) > 0L) bucket |= (1L << b)
      b += 1
    }
    bucket
  }

  /** Symmetric int8 quantization of a float vector: each component
    * maps to round-half-away-from-zero(x / max|x| * 127) ∈ [-127, 127].
    * Rounding is explicit floor/ceil half-away (NOT Java's
    * `Math.round`, which rounds half toward +∞ and would disagree with
    * the oracle's away-from-zero `round()` on negative halves). The
    * scale (max|x|/127) is per-vector; cosine ranking never needs it —
    * scales cancel — so the quantized table carries 1 byte/component:
    * 4× less scan IO and memory bandwidth than float32 at 100 TB.
    */
  def quantizeI8(v: ArrayData): Array[Byte] = {
    val n = v.numElements()
    val out = new Array[Byte](n)
    var amax = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(v.getFloat(i).toDouble)
      if (x > amax) amax = x
      i += 1
    }
    if (amax > 0.0) {
      i = 0
      while (i < n) {
        val s = v.getFloat(i).toDouble / amax * 127.0
        val r = if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)
        out(i) = r.toByte
        i += 1
      }
    }
    out
  }

  /** Integer dot product of two int8 vectors — exact int64 arithmetic,
    * no floating point anywhere, so engines cannot disagree by an ulp.
    */
  def dotI8(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getByte(i).toLong * b.getByte(i).toLong; i += 1 }
    acc
  }

  /** Positions where two long signatures agree — the MinHash Jaccard
    * estimator numerator.
    */
  def sigMatch(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) { if (a.getLong(i) == b.getLong(i)) c += 1; i += 1 }
    c
  }

  /** Min pairwise |x − y| between two SORTED int arrays via a
    * two-pointer merge — O(n_a + n_b), exact ints. Replaces the
    * O(n_a · n_b) flatten(transform×transform) cross-product the
    * proximity operator shipped with (r18 verdict: a stopword-class
    * pair with tf ≈ 10³–10⁴ each materialized a 10⁶–10⁸-element array
    * per doc). At each merge step only the closest predecessor/
    * successor pair can improve the minimum, so the merge visits each
    * element once and finds the same min the full cross-product would.
    * Empty inputs yield Long.MaxValue (the caller's `≤ w` gate drops
    * the row, matching array_min(empty) = NULL under the old form).
    */
  def minPosDist(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return Long.MaxValue
    var i = 0
    var j = 0
    var best = Long.MaxValue
    while (i < na && j < nb) {
      val x = a.getInt(i).toLong
      val y = b.getInt(j).toLong
      val d = math.abs(x - y)
      if (d < best) best = d
      if (x < y) i += 1 else j += 1
    }
    best
  }
}

/** `graft_min_pos_dist(array<int>, array<int>) -> bigint`: min pairwise
  * absolute difference between two position lists (see
  * [[VectorMath.minPosDist]]).
  *
  * PRECONDITION: both arrays must be sorted ASCENDING — the two-pointer
  * merge silently returns a wrong (too large) minimum on unsorted
  * input. Today's only caller (Bm25PosIndex.nearTopK) feeds
  * sort_array'd position lists; any new SQL-facing use must sort
  * first. r20 (r19 ADVICE): element types are enforced via
  * checkInputDataTypes — an array<bigint> argument would otherwise be
  * misread 4 bytes at a time by getInt and produce plausible garbage
  * instead of an analysis error.
  */
case class MinPosDist(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_min_pos_dist"

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires two array<int> arguments (sorted " +
            s"ascending), got ${left.dataType.catalogString} and " +
            s"${right.dataType.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Long.valueOf(VectorMath.minPosDist(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorMath.minPosDist($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_dot(array<float>, array<float>) -> double`. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dotFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorMath.dotFF($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_sig_match(array<bigint>, array<bigint>) -> int`: count of
  * agreeing positions.
  */
case class SigMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sig_match"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.sigMatch(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorMath.sigMatch($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_quantize_i8(array<float>) -> array<tinyint>`: symmetric
  * per-vector int8 quantization (see [[VectorMath.quantizeI8]]).
  */
case class QuantizeI8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "graft_quantize_i8"

  override def nullSafeEval(v: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(VectorMath.quantizeI8(v.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.functions.VectorMath.quantizeI8($c))")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `graft_dot_i8(array<tinyint>, array<tinyint>) -> bigint`: exact
  * integer dot product of quantized vectors.
  */
case class DotProductI8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot_i8"

  override def nullSafeEval(a: Any, b: Any): Any =
    VectorMath.dotI8(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorMath.dotI8($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Sign-LSH bucket of a float vector against the deterministic
  * hyperplane matrix for (dim, nBits) — the whole nBits-projection
  * pass in one codegen'd call. The matrix rides along as a referenced
  * object (a few KB), not per-row literals.
  */
case class LshBucket(child: Expression, dim: Int, nBits: Int, seed: Int = 42)
    extends UnaryExpression {
  @transient private lazy val planes: Array[Array[Double]] =
    VectorMath.hyperplanes(dim, nBits, seed)

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_lsh_bucket"

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(
      VectorMath.lshBucket(v.asInstanceOf[ArrayData], planes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lshPlanes", planes, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.VectorMath.lshBucket($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
