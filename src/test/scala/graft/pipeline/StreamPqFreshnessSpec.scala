package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** r13 (r12 verdict item 5): streaming ANN freshness — the batch-only
  * PQ shelf gains a foreachBatch incremental encode: new vectors are
  * encoded with the STORED codebooks (no refit) and appended to the
  * persisted code table, becoming searchable at append cost O(batch).
  * This is the q_stream_latest merge-on-read posture applied to the
  * ANN index: the offline build stays the expensive once-per-version
  * pass; the stream keeps the index current between rebuilds.
  *
  * The spec drives a REAL micro-batch pipeline (file source →
  * foreachBatch → [[PqIndex.appendEncode]]) and gates:
  *  - retrieval freshness: an appended exact duplicate of the query
  *    vector is retrieved at cosine 1.0;
  *  - encode parity: the streamed codes are bit-identical to a batch
  *    encode of the same vector against the same codebooks (recall
  *    parity follows — identical codes ⇒ identical ADC ranking);
  *  - isolation: pre-existing rankings are untouched by the append.
  */
class StreamPqFreshnessSpec extends AnyFunSuite {
  import TestSpark._

  test("foreachBatch incremental encode keeps the PQ index fresh") {
    // a corpus plan DISTINCT from other suites' (the index cache is
    // keyed by corpus digest; appending to the shared full-corpus
    // index would perturb RecallSpec's floors)
    val corpus = Tables.embeddings(spark, sf).filter(col("vec_id") < 300)
    val idx = PqIndex.forTable(corpus, 8, 16)
    val before = idx.topK(0L, 10, 60).collect()
    assert(!before.exists(_.getLong(0) == 9000L))

    import spark.implicits._
    val qvec = corpus.filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    val newVecs = Seq((9000L, qvec)).toDF("vec_id", "embedding")

    val base = Files.createTempDirectory("graft_pq_fresh_")
    val in = Files.createDirectory(base.resolve("in"))
    val staged = Files.createTempDirectory("graft_pq_fresh_stage_")
    newVecs.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    val listing = Files.list(staged)
    val part =
      try listing.filter(_.toString.endsWith(".parquet")).findFirst().get()
      finally listing.close()
    Files.move(part, in.resolve("batch_a.parquet"))

    val q = spark.readStream.schema(newVecs.schema).parquet(in.toString)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) => idx.appendEncode(b); () }
      .option("checkpointLocation", s"$base/chk")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    val after = idx.topK(0L, 10, 60).collect()
    // freshness: the appended exact duplicate is retrieved at 1.0
    val hit = after.find(_.getLong(0) == 9000L)
    assert(hit.isDefined, "appended vector not retrieved")
    assert(hit.get.getDouble(1) === 1.0)
    // encode parity: streamed codes == batch codes from the same
    // stored codebooks (identical codes ⇒ identical ADC ranking)
    val streamed = idx.codes().filter(col("vec_id") === 9000L)
      .select("codes").head().getSeq[Int](0)
    val batch = PqIndex.encoded(newVecs, idx.m, idx.sub, idx.codebooks)
      .select("codes").head().getSeq[Int](0)
    assert(streamed === batch)
    // the append must not disturb pre-existing rankings
    assert((after.map(_.getLong(0)).toSet - 9000L)
      .subsetOf(before.map(_.getLong(0)).toSet))
  }
}
