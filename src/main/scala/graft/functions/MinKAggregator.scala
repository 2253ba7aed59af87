package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed min-k aggregator: keeps the k SMALLEST (key, id) pairs per
  * group, ordered (key asc, id asc) — the selection kernel behind the
  * deterministic md5-ranked samplers.
  *
  * Why an Aggregator and not a window: `row_number().over(partitionBy
  * stratum orderBy md5)` sorts EVERY document of every stratum in one
  * task — and sampling strata (language ≈ 5 values, source ≈ tens) are
  * far lower-cardinality than market symbols, so at 100 TB a single
  * task would sort an entire language's corpus. This buffer is k rows,
  * merged map-side before the shuffle: the shuffle carries k rows per
  * stratum per map partition, never the documents (the
  * [[TopKAggregator]] pattern, keyed on a string rank instead of a
  * price).
  */
object MinKAggregator {
  /** (rank key, doc id) — the md5 hex rank and the row it selects. */
  final case class KD(k: String, id: Long)

  private def lt(a: KD, b: KD): Boolean =
    a.k < b.k || (a.k == b.k && a.id < b.id)

  final class MinK(k: Int) extends Aggregator[KD, ArrayBuffer[KD], Seq[KD]] {
    override def zero: ArrayBuffer[KD] = ArrayBuffer.empty

    private def trim(buf: ArrayBuffer[KD]): ArrayBuffer[KD] = {
      if (buf.length > k) {
        val sorted = buf.sortWith(lt)
        sorted.takeInPlace(k)
      } else buf
    }

    override def reduce(buf: ArrayBuffer[KD], in: KD): ArrayBuffer[KD] = {
      buf += in
      // amortize: only sort+cut when the buffer doubles past k
      if (buf.length >= 2 * k + 8) trim(buf) else buf
    }

    override def merge(a: ArrayBuffer[KD], b: ArrayBuffer[KD]): ArrayBuffer[KD] =
      trim(a ++= b)

    override def finish(buf: ArrayBuffer[KD]): Seq[KD] =
      buf.sortWith(lt).take(k).toSeq

    override def bufferEncoder: Encoder[ArrayBuffer[KD]] =
      EncoderHelper.arrayBufferKD
    override def outputEncoder: Encoder[Seq[KD]] =
      EncoderHelper.seqKD
  }

  /** Encoders resolved once (Scala 2.13 implicit scoping for mutable
    * collections of case classes is awkward inside the class body).
    */
  private object EncoderHelper {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val arrayBufferKD: Encoder[ArrayBuffer[KD]] = ExpressionEncoder()
    val seqKD: Encoder[Seq[KD]] = ExpressionEncoder()
  }

  def minK(k: Int): MinK = new MinK(k)
}
