package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** r16: the inverted-index BM25 tier. The contract is VALUE EQUALITY
  * with the scan formulation (same quantized scoring — so the shared
  * DuckDB oracle verifies both), plus the index lifecycle: one build
  * per corpus digest, and a query plan that reads ONLY the queried
  * terms' bucket partitions (never the corpus).
  */
class Bm25IndexSpec extends AnyFunSuite {
  import TestSpark._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

  test("indexed top-k equals the scan path's, value for value") {
    val docs = Tables.documents(spark, sf)
    val terms = graft.SparkEntry.Bm25Terms
    val scan = rows(TextOps.bm25(docs, terms, 10))
    val indexed = rows(Bm25Index.forTable(docs).topK(terms, 10))
    assert(indexed === scan)
    // a second term set against the SAME index (no rebuild — cache hit)
    val idx = Bm25Index.forTable(docs)
    val scan2 = rows(TextOps.bm25(docs, Seq("dup"), 5))
    assert(rows(idx.topK(Seq("dup"), 5)) === scan2)
  }

  test("driver bucket function matches the build's hash(term) expression") {
    import spark.implicits._
    val terms = Seq("dup", "spark", "join", "the", "a", "vector")
    val viaSpark = terms.toDF("term")
      .select(col("term"), pmod(hash(col("term")), lit(Bm25Index.Buckets)))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    terms.foreach(t =>
      assert(Bm25Index.bucketOf(t) === viaSpark(t), s"term $t"))
  }

  test("append grows the index — answers equal a fresh scan over the union") {
    val docs = Tables.documents(spark, sf)
    val base = docs.filter(col("doc_id") % 10 =!= 0)
    val nw = docs.filter(col("doc_id") % 10 === 0)
    val idx = Bm25Index.forTable(base)
    val terms = graft.SparkEntry.Bm25Terms
    val preAppend = rows(idx.topK(terms, 10))
    idx.append(nw)
    val expect = rows(TextOps.bm25(base.unionByName(nw), terms, 10))
    val got = rows(idx.topK(terms, 10))
    assert(got === expect,
      "post-append indexed answer diverged from the union scan path")
    // the append genuinely changed the model (N, avgdl, df all moved)
    assert(got != preAppend || expect == preAppend)
  }

  test("compact collapses append-fragmented buckets, answers unchanged") {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    // private corpus slice (digest-distinct)
    val base = Tables.documents(spark, sf).filter(col("doc_id") % 9 =!= 0)
    val idx = Bm25Index.forTable(base)
    (0 until 2).foreach { b =>
      idx.append(Seq((888800L + b, "dup spark merge", "en", "synth", 15L))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    }
    def perBucket(dir: String): Map[String, Int] = {
      val s = java.nio.file.Files.list(java.nio.file.Path.of(dir))
      try s.iterator().asScala.toSeq
        .filter(_.getFileName.toString.startsWith("bucket="))
        .map { p =>
          val f = java.nio.file.Files.list(p)
          try p.getFileName.toString ->
            f.iterator().asScala.count(_.toString.endsWith(".parquet"))
          finally f.close()
        }.toMap
      finally s.close()
    }
    val before = idx.topK(Seq("dup", "spark"), 10).collect().map(_.toSeq).toSeq
    assert(perBucket(idx.postingsDir).values.max > 1, "appends did not fragment")
    idx.compact()
    val after = perBucket(idx.postingsDir)
    assert(after.nonEmpty && after.values.forall(_ == 1), s"multi-file: $after")
    assert(idx.topK(Seq("dup", "spark"), 10).collect().map(_.toSeq).toSeq
      === before)
  }

  test("the query plan prunes to the queried terms' buckets — no corpus scan") {
    val docs = Tables.documents(spark, sf)
    val df = Bm25Index.forTable(docs).topK(Seq("dup"), 10)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // exactly one scan: the postings parquet with a bucket partition
    // filter; the documents table must not appear
    assert(plan.contains("PartitionFilters") && plan.contains("bucket"),
      s"no bucket partition pruning in:\n${plan.take(2000)}")
    assert(!plan.contains("documents.parquet"),
      "the indexed query path re-scanned the corpus")
  }
}
