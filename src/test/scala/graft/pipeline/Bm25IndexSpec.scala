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

  test("r17: AND retrieval — indexed equals the scan formulation") {
    val docs = Tables.documents(spark, sf)
    val terms = graft.SparkEntry.Bm25Terms
    val scan = rows(TextOps.bm25(docs, terms, 10, conjunctive = true))
    val indexed = rows(
      Bm25Index.forTable(docs).topK(terms, 10, conjunctive = true))
    assert(indexed === scan)
    // AND is genuinely stricter than OR on this corpus
    val or = rows(Bm25Index.forTable(docs).topK(terms, 100))
    val and = rows(Bm25Index.forTable(docs).topK(terms, 100,
      conjunctive = true))
    assert(and.size < or.size, "AND did not restrict the OR candidates")
    assert(and.map(_._1).toSet.subsetOf(or.map(_._1).toSet))
  }

  test("r17: phrase retrieval — indexed over the bigram corpus equals the scan") {
    val bg = TextOps.bigramize(Tables.documents(spark, sf))
    val phrases = graft.SparkEntry.Bm25Phrases
    val scan = rows(TextOps.bm25(bg, phrases, 10))
    val indexed = rows(Bm25Index.forTable(bg).topK(phrases, 10))
    assert(indexed === scan)
    assert(indexed.nonEmpty, "no phrase hits — the fixture phrases vanished")
    // the n=3 shingle tier holds the same indexed ≡ scan contract
    val tg = TextOps.ngramize(Tables.documents(spark, sf), 3)
    val p3 = graft.SparkEntry.Bm25Phrases3
    val scan3 = rows(TextOps.bm25(tg, p3, 10))
    val indexed3 = rows(Bm25Index.forTable(tg).topK(p3, 10))
    assert(indexed3 === scan3)
    assert(indexed3.nonEmpty, "no 3-gram hits — the fixture phrases vanished")
  }

  test("r17: duplicated query terms score once on both paths") {
    val docs = Tables.documents(spark, sf)
    val once = rows(Bm25Index.forTable(docs).topK(Seq("dup"), 5))
    assert(rows(Bm25Index.forTable(docs).topK(Seq("dup", "dup"), 5)) === once)
    assert(rows(TextOps.bm25(docs, Seq("dup", "dup"), 5)) === once)
  }

  test("r17: batch retrieval equals per-query topK, both modes") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val idx = Bm25Index.forTable(docs)
    val qs = graft.SparkEntry.Bm25BatchQueries
    def batchRows(conj: Boolean): Map[Long, Seq[(Long, Long, Double)]] =
      idx.topKBatch(qs.toDF("query_id", "text"), 5, conjunctive = conj)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    Seq(false, true).foreach { conj =>
      val batch = batchRows(conj)
      qs.foreach { case (qid, text) =>
        val single = rows(
          idx.topK(text.split(" ").toSeq, 5, conjunctive = conj))
        assert(batch.getOrElse(qid, Seq.empty) === single,
          s"query $qid '$text' conjunctive=$conj diverged from topK")
      }
    }
    // the duplicated-term query (4) scores 'dup' once — equal to its
    // dedup'd twin (1)
    val b = batchRows(false)
    assert(b(4L) === b(1L))
  }

  test("r17: hybrid RRF equals a driver-side fusion of its two legs") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val terms = graft.SparkEntry.Bm25Terms
    val bm = Bm25Index.forTable(docs).topK(terms, 20).collect()
      .map(_.getLong(0)).zipWithIndex.map { case (id, i) => id -> (i + 1) }
      .toMap
    val ann = Similarity.bruteForceTopK(emb, 0L, 20).collect()
      .map(_.getLong(0)).zipWithIndex.map { case (id, i) => id -> (i + 1) }
      .toMap
    val expect = (bm.keySet ++ ann.keySet).toSeq.map { id =>
      val rb = bm.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      val ra = ann.get(id).map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      (id, rb + ra)
    }.sortBy { case (id, s) => (-s, id) }.take(10)
    val got = Similarity.hybridRrf(docs, emb, terms, 0L).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expect)
    // fusion genuinely mixes tiers: the top-10 draws from both legs
    assert(got.map(_._1).exists(bm.contains))
    assert(got.map(_._1).exists(ann.contains))
  }

  test("r18: hybrid with the production ANN leg equals fusing its two legs") {
    val docs = Tables.documents(spark, sf)
    val emb = Tables.embeddings(spark, sf)
    val terms = graft.SparkEntry.Bm25Terms
    val bmIds = Bm25Index.forTable(docs).topK(terms, 20).collect()
      .map(_.getLong(0)).toSeq
    val annIds = Similarity.ivfPqTopK(emb, 0L, 20).collect()
      .map(_.getLong(0)).toSeq
    val expect = Similarity.rrfFuse(Seq(bmIds, annIds), 10)
    val got = Similarity.hybridRrfIvf(docs, emb, terms, 0L).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === expect)
    // the production leg genuinely differs from (or at its measured
    // recall matches) the exact leg — both lists fuse to full k
    assert(got.size === 10)
  }

  test("r17: attribute-filtered retrieval = corpus-idf scores, eligible docs only") {
    val docs = Tables.documents(spark, sf)
    val idx = Bm25Index.forTable(docs)
    val terms = graft.SparkEntry.Bm25Terms
    // expectation: scores are UNCHANGED by the filter (corpus-level
    // idf/avgdl), only ineligible docs drop — so the filtered top-10 is
    // the unfiltered ranking restricted to lang = en
    val en = docs.filter(col("lang") === "en")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val expect = rows(idx.topK(terms, 100000))
      .filter(r => en.contains(r._1)).take(10)
    val got = rows(idx.topK(terms, 10, filter = Some(col("lang") === "en")))
    assert(got === expect)
    assert(got.size === 10, "filter-then-rank must still fill k")
    assert(got.forall(r => en.contains(r._1)), "ineligible doc served")
    // one scan: the filtered query must not join back to the corpus
    val df = idx.topK(terms, 10, filter = Some(col("lang") === "en"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("documents.parquet"),
      "filtered retrieval re-scanned the corpus")
  }

  test("r17: dimension-truncation fidelity — full dim is exact, counts bounded") {
    val emb = Tables.embeddings(spark, sf)
    val rows = Similarity.dimTruncation(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.length === 15, s"expected 3 dims × 5 queries: ${rows.length}")
    // the full-dimension ranking overlaps itself completely…
    assert(rows.filter(_._1 == 64L).forall(_._3 == 10L))
    // …and truncated overlaps are genuine counts in [0, 10], with the
    // 16-prefix strictly losing fidelity somewhere (else the probe
    // measures nothing)
    assert(rows.forall(r => r._3 >= 0L && r._3 <= 10L))
    assert(rows.filter(_._1 == 16L).exists(_._3 < 10L))
  }

  test("r17: postings files are term-sorted within every bucket") {
    import scala.jdk.CollectionConverters._
    val idx = Bm25Index.forTable(Tables.documents(spark, sf))
    val dirs = java.nio.file.Files.list(java.nio.file.Path.of(idx.postingsDir))
    val bucketDirs = try dirs.iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith("bucket=")) finally dirs.close()
    assert(bucketDirs.nonEmpty)
    bucketDirs.foreach { bd =>
      val fs = java.nio.file.Files.list(bd)
      val files = try fs.iterator().asScala.toSeq
        .filter(_.toString.endsWith(".parquet")) finally fs.close()
      files.foreach { f =>
        // a single small file reads back as one partition in file order
        val terms = spark.read.parquet(f.toString)
          .select(col("term")).collect().map(_.getString(0)).toSeq
        assert(terms === terms.sorted,
          s"unsorted terms in $f (row-group stats would be useless)")
      }
    }
  }

  test("r17: a rare-term query row-group-skips — scanned rows ≪ bucket total") {
    // synthetic corpus big enough for multi-row-group bucket files:
    // tiny parquet.block.size forces ~100-row row groups, and the
    // term-sorted layout then gives each row group a tight term range
    val docs = spark.range(0, 2000).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        ((0 until 30).map(j =>
          concat(lit("w"), pmod(col("id") * lit(j * 31 + 7) + lit(j),
            lit(211)).cast("string"))) :+
          when(col("id") % 400 === 0, lit("needleterm"))
            .otherwise(lit("filler"))): _*).as("text"))
    val idx = Bm25Index.build(docs,
      Map("parquet.block.size" -> "2048", "parquet.page.size" -> "1024"))
    val df = idx.topK(Seq("needleterm"), 10)
    assert(df.count() === 5)
    df.collect()
    // AQE hides scans inside query stages — unwrap explicitly
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, "no parquet scan in the executed plan")
    val scanned = scans.map(_.metrics("numOutputRows").value).sum
    val bucket = Bm25Index.bucketOf("needleterm")
    val total = spark.read.parquet(idx.postingsDir)
      .filter(col("bucket") === bucket).count()
    assert(total > 500, s"fixture too small to split row groups: $total")
    assert(scanned * 2 < total,
      s"rare-term query scanned $scanned of $total bucket rows — " +
        "row-group term stats are not pruning")
  }

  test("r18: delete equals a from-scratch build over the filtered corpus") {
    val docs = Tables.documents(spark, sf)
    val terms = graft.SparkEntry.Bm25Terms
    val idx = Bm25Index.build(docs) // private — delete mutates
    val del = docs.filter(col("doc_id") % 7 === 3).select(col("doc_id"))
    assert(idx.delete(del) > 0L)
    val filtered = docs.filter(col("doc_id") % 7 =!= 3)
    val expect = rows(TextOps.bm25(filtered, terms, 10))
    assert(rows(idx.topK(terms, 10)) === expect,
      "tombstoned index diverged from the filtered-corpus scan")
    // model constants equal the rebuild's exactly (idf/avgdl parity)
    val fresh = Bm25Index.build(filtered)
    assert(idx.nDocs === fresh.nDocs)
    assert(idx.totalLen === fresh.totalLen)
    // re-deleting the same ids is a no-op
    assert(idx.delete(del) === 0L)
    assert(rows(idx.topK(terms, 10)) === expect)
    // conjunctive and filtered modes read through the tombstones too
    assert(rows(idx.topK(terms, 10, conjunctive = true)) ===
      rows(TextOps.bm25(filtered, terms, 10, conjunctive = true)))
    // batch path sees the deletion as well
    import spark.implicits._
    val batch = idx.topKBatch(Seq((1L, terms.mkString(" ")))
        .toDF("query_id", "text"), 10)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(batch === expect)
  }

  test("r18: compact physically drops tombstoned rows, answers unchanged") {
    val docs = Tables.documents(spark, sf)
    val terms = graft.SparkEntry.Bm25Terms
    val idx = Bm25Index.build(docs)
    idx.delete(docs.filter(col("doc_id") % 11 === 5).select(col("doc_id")))
    assert(idx.hasTombstones)
    val before = rows(idx.topK(terms, 10))
    idx.compact()
    assert(!idx.hasTombstones, "compaction must retire the sidecar")
    // the stored files themselves no longer contain the deleted docs
    val raw = spark.read.parquet(idx.postingsDir)
    assert(raw.filter(col("doc_id") % 11 === 5).count() === 0L,
      "tombstoned rows survived compaction physically")
    assert(rows(idx.topK(terms, 10)) === before)
  }

  test("r18: delete then append — the model tracks both directions") {
    val docs = Tables.documents(spark, sf)
    val terms = graft.SparkEntry.Bm25Terms
    val idx = Bm25Index.build(docs)
    idx.delete(docs.filter(col("doc_id") % 13 === 2).select(col("doc_id")))
    val nw = docs.filter(col("doc_id") % 13 === 2)
      .select((col("doc_id") + 7000000L).as("doc_id"), col("text"),
        col("lang"), col("source"), col("n_chars"))
    idx.append(nw)
    val union = docs.filter(col("doc_id") % 13 =!= 2).unionByName(nw)
    assert(rows(idx.topK(terms, 10)) === rows(TextOps.bm25(union, terms, 10)))
  }

  test("r18: append aligns attribute-less batches to the stored schema") {
    import spark.implicits._
    // attr-BUILT index (documents has lang/source), attr-LESS batch
    val base = Tables.documents(spark, sf).filter(col("doc_id") % 17 =!= 0)
    val idx = Bm25Index.build(base)
    idx.append(Seq((991100L, "dup spark alignment probe"))
      .toDF("doc_id", "text"))
    // the appended doc is visible — and the filtered path doesn't
    // crash on mixed schemas (its lang reads back NULL, so it is
    // correctly ineligible for lang='en')
    val got = idx.topK(Seq("alignment"), 5).collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(991100L))
    val filtered = idx.topK(Seq("alignment"), 5,
      filter = Some(col("lang") === "en")).collect()
    assert(filtered.isEmpty, "typed-NULL attr row leaked through a filter")
    // a batch carrying attributes the index was NOT built with is
    // rejected loudly (appending would mix parquet schemas)
    val bg = TextOps.bigramize(Tables.documents(spark, sf)
      .filter(col("doc_id") % 17 =!= 1))
    val plain = Bm25Index.build(bg) // attr-less build
    val stray = Seq((991101L, "a_b b_c", "en"))
      .toDF("doc_id", "text", "lang")
    assertThrows[IllegalArgumentException](plain.append(stray))
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
