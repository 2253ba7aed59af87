package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator: keeps the k largest (price, event_id) pairs
  * per group (price desc, event_id asc tiebreak).
  *
  * Why an Aggregator and not a window: `row_number().over(partitionBy
  * symbol orderBy price)` sorts EVERY row of every partition; this
  * aggregator's buffer is k rows, merged map-side before the shuffle —
  * at 100 TB the shuffle carries k rows per symbol instead of the
  * whole table. The classic partial top-k pattern.
  */
object TopKAggregator {
  final case class PE(price: Double, event_id: Long)

  private def lt(a: PE, b: PE): Boolean =
    a.price > b.price || (a.price == b.price && a.event_id < b.event_id)

  final class TopK(k: Int) extends Aggregator[PE, ArrayBuffer[PE], Seq[PE]] {
    override def zero: ArrayBuffer[PE] = ArrayBuffer.empty

    private def trim(buf: ArrayBuffer[PE]): ArrayBuffer[PE] = {
      if (buf.length > k) {
        val sorted = buf.sortWith(lt)
        sorted.takeInPlace(k)
      } else buf
    }

    override def reduce(buf: ArrayBuffer[PE], in: PE): ArrayBuffer[PE] = {
      buf += in
      // amortize: only sort+cut when the buffer doubles past k
      if (buf.length >= 2 * k + 8) trim(buf) else buf
    }

    override def merge(a: ArrayBuffer[PE], b: ArrayBuffer[PE]): ArrayBuffer[PE] =
      trim(a ++= b)

    override def finish(buf: ArrayBuffer[PE]): Seq[PE] =
      buf.sortWith(lt).take(k).toSeq

    override def bufferEncoder: Encoder[ArrayBuffer[PE]] =
      implicitly[Encoder[ArrayBuffer[PE]]](ExpressionEncoderHelper.arrayBufferPE)
    override def outputEncoder: Encoder[Seq[PE]] =
      ExpressionEncoderHelper.seqPE
  }

  /** Encoders resolved once (Scala 2.13 implicit scoping for mutable
    * collections of case classes is awkward inside the class body).
    */
  private object ExpressionEncoderHelper {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    val arrayBufferPE: Encoder[ArrayBuffer[PE]] = ExpressionEncoder()
    val seqPE: Encoder[Seq[PE]] = ExpressionEncoder()
  }

  def topK(k: Int): TopK = new TopK(k)
}
