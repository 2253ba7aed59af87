package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `graft_cov_moments(q)` — the full upper-triangle co-moment matrix of
  * a fixed-width `array<long>` column in ONE corpus pass: per group
  * (n, Σqᵢ, Σqᵢqⱼ for every i ≤ j), emitted as
  * `array<struct<i int, j int, n long, sx dec(38,0), sy dec(38,0),
  * sxy dec(38,0)>>`.
  *
  * Why an aggregate and not the comps self-join: the join shape
  * materializes |vectors|·T joined rows (T = dim(dim+1)/2) and pushes
  * every product through a decimal aggregation buffer — measured
  * 1.7–2.8 s at sf0.1 (2000×64) with the product stream dominating.
  * Here the matrix is a map-side accumulator: one scan, |partitions|
  * partial buffers of 2+2·dim+2·T longs, a single tiny merge — no
  * join, no row explosion, embeddings never shuffle.
  *
  * Exactness at any corpus size: every Σ accumulates in a signed
  * 128-bit (hi, lo) pair — bit-exact integer sums regardless of row
  * count (a long would wrap past ~10⁶ unit-norm vectors). Per-row
  * products go through `Math.multiplyExact`, so a pathological input
  * (|q| ≥ 2³¹·√2) fails loudly instead of wrapping — the ANSI
  * discipline. Reconstruction to BigInt → Decimal(38,0) at eval keeps
  * the downstream arithmetic identical to the join version (and to
  * the DuckDB oracle), so hashes are unchanged.
  */
case class CovMomentsAggregate(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "graft_cov_moments"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sx", DecimalType(38, 0), nullable = false),
    StructField("sy", DecimalType(38, 0), nullable = false),
    StructField("sxy", DecimalType(38, 0), nullable = false))))

  // buffer layout: [dim, n, (hi,lo)·dim component sums,
  //                 (hi,lo)·T product sums]; un-sized buffer = [0, 0]
  override def createAggregationBuffer(): Array[Long] = Array(0L, 0L)

  /** buf(off, off+1) += v (sign-extended to 128 bits). */
  @inline private def add128(buf: Array[Long], off: Int, v: Long): Unit = {
    val lo = buf(off + 1)
    val s = lo + v
    val carry = ((lo & v) | ((lo | v) & ~s)) >>> 63
    buf(off) = buf(off) + (v >> 63) + carry
    buf(off + 1) = s
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) return buffer
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    if (dim == 0) return buffer
    var buf = buffer
    if (buf(0) == 0L) {
      buf = new Array[Long](2 + dim * (dim + 3))
      buf(0) = dim
    } else require(buf(0) == dim,
      s"graft_cov_moments: ragged input (dim $dim vs ${buf(0)})")
    buf(1) += 1
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) { q(i) = arr.getLong(i); i += 1 }
    i = 0
    var off = 2
    while (i < dim) { add128(buf, off, q(i)); off += 2; i += 1 }
    i = 0
    var k = 2 + 2 * dim
    while (i < dim) {
      val qi = q(i)
      var j = i
      while (j < dim) {
        add128(buf, k, Math.multiplyExact(qi, q(j)))
        k += 2; j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (b(0) == 0L) return a
    if (a(0) == 0L) return b
    require(a(0) == b(0), "graft_cov_moments: ragged partials")
    a(1) += b(1)
    var k = 2
    while (k < a.length) {
      val blo = b(k + 1)
      val lo = a(k + 1)
      val s = lo + blo
      val carry = ((lo & blo) | ((lo | blo) & ~s)) >>> 63
      a(k) = a(k) + b(k) + carry
      a(k + 1) = s
      k += 2
    }
    a
  }

  private def big(buf: Array[Long], off: Int): BigInt =
    (BigInt(buf(off)) << 64) +
      (BigInt(buf(off + 1)) & ((BigInt(1) << 64) - 1))

  override def eval(buffer: Array[Long]): Any = {
    val dim = buffer(0).toInt
    if (dim == 0) return new GenericArrayData(Array.empty[Any])
    val n = buffer(1)
    def dec(b: BigInt): Decimal = Decimal(BigDecimal(b), 38, 0)
    val rows = new Array[Any](dim * (dim + 1) / 2)
    var idx = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val r = new GenericInternalRow(6)
        r.update(0, i); r.update(1, j); r.update(2, n)
        r.update(3, dec(big(buffer, 2 + 2 * i)))
        r.update(4, dec(big(buffer, 2 + 2 * j)))
        r.update(5, dec(big(buffer, 2 + 2 * dim + 2 * idx)))
        rows(idx) = r
        idx += 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val out = ByteBuffer.allocate(4 + 8 * buf.length)
    out.putInt(buf.length)
    var i = 0
    while (i < buf.length) { out.putLong(buf(i)); i += 1 }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = ByteBuffer.wrap(bytes)
    val n = in.getInt()
    val buf = new Array[Long](n)
    var i = 0
    while (i < n) { buf(i) = in.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CovMomentsAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovMomentsAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}
