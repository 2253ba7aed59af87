package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** r17: streaming freshness for the LEXICAL tier — the
  * StreamIvfPqFreshnessSpec contract applied to [[Bm25Index]]: a
  * foreachBatch sink appends each micro-batch of documents into the
  * bucket partitions (O(batch) postings + vocabulary-sized df merge),
  * the driver scalars advance, touched buckets stamp versions — so a
  * standing query path AND a warm [[Bm25Serve]] cache both see the
  * streamed documents immediately, and the answers still equal the
  * scan formulation over the grown corpus.
  */
class StreamBm25FreshnessSpec extends AnyFunSuite {
  import TestSpark._

  test("foreachBatch append keeps the BM25 index and warm serve fresh") {
    import spark.implicits._
    // distinct corpus plan — forTable is digest-keyed; appending into
    // the shared full-corpus index would perturb the other suites
    val corpus = Tables.documents(spark, sf).filter(col("doc_id") % 11 =!= 3)
    val idx = Bm25Index.forTable(corpus)
    val srv = Bm25Serve.forTable(corpus)
    val terms = Seq("dup")
    assert(srv.topK(terms, 10).forall(_._1 != 777000L)) // warm the cache

    // a doc that MUST become the top 'dup' hit (max tf, minimal dl)
    val newDocs = Seq((777000L, "dup dup dup dup dup", "en", "stream", 23L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val base = Files.createTempDirectory("graft_bm25_fresh_")
    val in = Files.createDirectory(base.resolve("in"))
    val staged = Files.createTempDirectory("graft_bm25_fresh_stage_")
    newDocs.coalesce(1).write.mode("overwrite").parquet(staged.toString)
    val listing = Files.list(staged)
    val part =
      try listing.filter(_.toString.endsWith(".parquet")).findFirst().get()
      finally listing.close()
    Files.move(part, in.resolve("batch_a.parquet"))

    val q = spark.readStream.schema(newDocs.schema).parquet(in.toString)
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) => idx.append(b); () }
      .option("checkpointLocation", s"$base/chk")
      .start()
    try q.processAllAvailable()
    finally q.stop()

    // the standing Spark query path sees the streamed doc at rank 1…
    val indexed = idx.topK(terms, 10).collect()
    assert(indexed.head.getLong(0) === 777000L,
      s"streamed doc not at rank 1: ${indexed.map(_.getLong(0)).toSeq}")
    // …the WARM serve cache evicted the touched bucket and agrees…
    val warm = srv.topK(terms, 10)
    assert(warm.head._1 === 777000L, s"warm serve stale: $warm")
    assert(warm === indexed
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
    // …and the grown index still equals the scan formulation
    val scan = TextOps.bm25(corpus.unionByName(newDocs), terms, 10).collect()
      .map(_.toSeq).toSeq
    assert(indexed.map(_.toSeq).toSeq === scan)
  }

  test("r18: deletes interleave with streamed appends — every tier stays fresh") {
    import spark.implicits._
    // a standing index under BOTH mutation directions: the curation
    // loop a production corpus actually runs (stream in new docs,
    // tombstone the dedup/quality losers) — the model and the warm
    // serve must track the NET corpus exactly
    val corpus = Tables.documents(spark, sf).filter(col("doc_id") % 11 =!= 5)
    val idx = Bm25Index.build(corpus) // private standing index
    val srv = Bm25Serve.forIndex(idx)
    val terms = Seq("dup")
    val before = srv.topK(terms, 10) // warm
    assert(before.nonEmpty)

    // stream TWO micro-batches through foreachBatch, with a DELETE of
    // the first streamed doc (and of the pre-stream top hit) landing
    // between them
    def batchDf(id: Long, tf: Int) = Seq(
      (id, Seq.fill(tf)("dup").mkString(" "), "en", "stream",
        (tf * 4 - 1).toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val base = Files.createTempDirectory("graft_bm25_freshdel_")
    val in = Files.createDirectory(base.resolve("in"))
    def stage(df: DataFrame, name: String): Unit = {
      val staged = Files.createTempDirectory("graft_bm25_freshdel_stage_")
      df.coalesce(1).write.mode("overwrite").parquet(staged.toString)
      val l = Files.list(staged)
      val part =
        try l.filter(_.toString.endsWith(".parquet")).findFirst().get()
        finally l.close()
      Files.move(part, in.resolve(name))
    }
    val schema = batchDf(0L, 1).schema
    def runStream(): Unit = {
      val q = spark.readStream.schema(schema).parquet(in.toString)
        .writeStream
        .foreachBatch { (b: DataFrame, _: Long) => idx.append(b); () }
        .option("checkpointLocation", s"$base/chk")
        .start()
      try q.processAllAvailable()
      finally q.stop()
    }
    stage(batchDf(888001L, 5), "batch_a.parquet")
    runStream()
    assert(srv.topK(terms, 10).head._1 === 888001L)
    // curation verdict lands: drop the streamed doc AND the old top hit
    idx.delete(Seq(888001L, before.head._1).toDF("doc_id"))
    // second streamed batch (checkpoint resumes, only batch_b is new)
    stage(batchDf(888002L, 4), "batch_b.parquet")
    runStream()
    // the net corpus: base − deleted ∪ {batch_b}
    val net = corpus
      .filter(col("doc_id") =!= before.head._1)
      .unionByName(batchDf(888002L, 4))
    val expect = TextOps.bm25(net, terms, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val indexed = idx.topK(terms, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(indexed === expect,
      "append→delete→append diverged from the net-corpus scan")
    assert(indexed.head._1 === 888002L)
    assert(!indexed.exists(_._1 == 888001L))
    // the WARM serve tracked every step (both mutations stamp bucket
    // versions; stale entries reloaded through the tombstone mask)
    assert(srv.topK(terms, 10) === indexed)
  }
}
