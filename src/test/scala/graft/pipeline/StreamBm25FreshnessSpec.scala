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
}
