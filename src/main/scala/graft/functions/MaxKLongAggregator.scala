package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed max-k aggregator over an exact BIGINT key: keeps the k rows
  * with the LARGEST keys per group (key desc, id asc tiebreak) — the
  * [[MinKAggregator]] sibling for "worst offenders" reports whose
  * group key is low-cardinality (per-label outliers, per-source
  * extremes), where a rank window would drain a whole group through
  * one task at 100 TB. k-row buffers merge map-side; the shuffle
  * carries k rows per group per map partition.
  */
object MaxKLongAggregator {
  /** (BIGINT sort key, row id). */
  final case class LK(k: Long, id: Long)

  private def lt(a: LK, b: LK): Boolean =
    a.k > b.k || (a.k == b.k && a.id < b.id)

  final class MaxK(k: Int) extends Aggregator[LK, ArrayBuffer[LK], Seq[LK]] {
    override def zero: ArrayBuffer[LK] = ArrayBuffer.empty

    private def trim(buf: ArrayBuffer[LK]): ArrayBuffer[LK] = {
      if (buf.length > k) {
        val sorted = buf.sortWith(lt)
        sorted.takeInPlace(k)
      } else buf
    }

    override def reduce(buf: ArrayBuffer[LK], in: LK): ArrayBuffer[LK] = {
      buf += in
      if (buf.length >= 2 * k + 8) trim(buf) else buf
    }

    override def merge(a: ArrayBuffer[LK], b: ArrayBuffer[LK]): ArrayBuffer[LK] =
      trim(a ++= b)

    override def finish(buf: ArrayBuffer[LK]): Seq[LK] =
      buf.sortWith(lt).take(k).toSeq

    override def bufferEncoder: Encoder[ArrayBuffer[LK]] =
      EncoderHelper.arrayBufferLK
    override def outputEncoder: Encoder[Seq[LK]] =
      EncoderHelper.seqLK
  }

  private object EncoderHelper {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val arrayBufferLK: Encoder[ArrayBuffer[LK]] = ExpressionEncoder()
    val seqLK: Encoder[Seq[LK]] = ExpressionEncoder()
  }

  def maxK(k: Int): MaxK = new MaxK(k)
}
