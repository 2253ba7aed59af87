package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = Tables.documents(spark, sf).cache()
  private lazy val emb = Tables.embeddings(spark, sf).cache()

  test("exact dedup: distinct hashes <= docs, dup counts sum to total") {
    val d = Dedup.exact(docs)
    assert(d.count() <= docs.count())
    val total = d.agg(sum("dup_count")).head().getLong(0)
    assert(total === docs.count())
  }

  test("exact dedup flags an injected duplicate") {
    val doubled = docs.select("doc_id", "text")
      .union(docs.select((col("doc_id") + 100000).as("doc_id"), col("text")))
    val d = Dedup.exact(doubled)
    assert(d.count() === docs.count())
    assert(d.filter(col("dup_count") < 2).count() === 0)
  }

  test("minhash signature: identical docs collide, signature width fixed") {
    val sigs = Dedup.minhashSignatures(docs, n = 3, k = 16)
    assert(sigs.filter(size(col("sig")) =!= 16).count() === 0)
  }

  test("hash expressions run under codegen with fallback disabled") {
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      assert(Dedup.simhash(docs).count() === docs.count())
      assert(Dedup.minhashSignatures(docs).count() === docs.count())
      assert(Similarity.bruteForceTopKI8(emb, 0L, 5).count() === 5)
    } finally spark.conf.set("spark.sql.codegen.fallback", "true")
  }

  test("simhash of identical texts is identical") {
    val s = Dedup.simhash(docs).withColumnRenamed("simhash", "s1")
    val s2 = Dedup.simhash(docs).withColumnRenamed("simhash", "s2")
    val joined = s.join(s2, "doc_id").filter(col("s1") =!= col("s2"))
    assert(joined.count() === 0)
  }

  test("nearDupClusters: chains collapse to one cluster, survivors are minima") {
    import spark.implicits._
    val d = (0L to 9L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // chain 0-1-2, pair 5-6, singletons 3,4,7,8,9
    val pairs = Seq((0L, 1L), (1L, 2L), (5L, 6L)).toDF("doc_a", "doc_b")
    val got = Dedup.nearDupClusters(d, pairs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(0) === (0L, 1L) && got(1) === (0L, 0L) && got(2) === (0L, 0L))
    assert(got(5) === (5L, 1L) && got(6) === (5L, 0L))
    Seq(3L, 4L, 7L, 8L, 9L).foreach(i => assert(got(i) === (i, 1L)))
  }

  test("spanDedup: merged word spans of cross-doc duplicated 3-grams") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta unique1 words here"),
      (2L, "prefix2 alpha beta gamma delta epsilon zeta tail2"),
      (3L, "nothing shared at all in this document"),
      // the shared run appears TWICE in doc 4 with a gap — two spans
      (4L, "alpha beta gamma filler4 alpha beta gamma")
    ).toDF("doc_id", "text").withColumn("source",
      when(col("doc_id") === 3L, "books").otherwise("web"))
    val got = Dedup.spanDedup(d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc1: grams 1..4 shared with doc2 → words 1..6 merged into one
    // span; doc2 shifted by its prefix; doc3 contributes nothing
    assert(got.toSeq === Seq(
      (1L, 1L, 6L, 6L), (2L, 2L, 7L, 6L),
      (4L, 1L, 3L, 3L), (4L, 5L, 7L, 3L)))
    // semantic anchor (the hull-MA lesson: positions must map to real
    // words, not merely hash-match an oracle): doc2's span covers
    // exactly the duplicated sentence
    val words2 = d.filter(col("doc_id") === 2L)
      .select(split(col("text"), " ")).head().getSeq[String](0)
    assert(words2.slice(2 - 1, 7) ===
      Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta"))
  }

  test("spanDedupSentences: spans snap to sentence boundaries") {
    import spark.implicits._
    val d = Seq(
      // shared run sits exactly on sentence 2 of docs 1/2; doc 3's
      // shared gram is mid-sentence, so its span must EXPAND to the
      // full sentence extent
      (1L, "Intro sentence one. alpha beta gamma delta epsilon zeta. Tail sentence here."),
      (2L, "Other prefix here. alpha beta gamma delta epsilon zeta. Different tail words."),
      (3L, "Some words alpha beta gamma more in this sentence. Final bit.")
    ).toDF("doc_id", "text").withColumn("source", lit("web"))
    val got = Dedup.spanDedupSentences(d).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq === Seq(
      (1L, 2L, 2L, 4L, 9L, 6L, 1L),
      (2L, 2L, 2L, 4L, 9L, 6L, 1L),
      (3L, 1L, 1L, 1L, 9L, 9L, 1L)))
    // semantic anchor: doc 3's snapped span is its WHOLE first
    // sentence, though only "alpha beta gamma" (words 3..5) matched
    val words3 = d.filter(col("doc_id") === 3L)
      .select(split(col("text"), " ")).head().getSeq[String](0)
    assert(words3(8) === "sentence." && words3.slice(2, 5) ===
      Seq("alpha", "beta", "gamma"))
  }

  test("spanDedupSentences: terminator-free docs are one sentence") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta no terminator anywhere"),
      (2L, "prefix alpha beta gamma delta epsilon zeta suffix words")
    ).toDF("doc_id", "text").withColumn("source", lit("web"))
    val got = Dedup.spanDedupSentences(d).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    // every doc is a single sentence → the snapped span is the whole doc
    assert(got.toSeq === Seq(
      (1L, 1L, 1L, 1L, 9L, 9L, 1L),
      (2L, 1L, 1L, 1L, 9L, 9L, 1L)))
  }

  test("spanDedupImpact: per-source word retention with quantized ratio") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta unique1 words here"),
      (2L, "prefix2 alpha beta gamma delta epsilon zeta tail2"),
      (3L, "nothing shared at all in this document")
    ).toDF("doc_id", "text").withColumn("source",
      when(col("doc_id") === 3L, "books").otherwise("web"))
    val got = Dedup.spanDedupImpact(d).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got("books") === ((1L, 7L, 0L, 1.0)))
    // web: 9 + 8 = 17 words, 6 + 6 duplicated; keep = 5/17 quantized
    assert(got("web") === ((2L, 17L, 12L, 0.294118)))
  }

  test("simhashPairs surfaces injected duplicates at hamming 0") {
    val doubled = docs.select("doc_id", "text").limit(50)
      .union(docs.select((col("doc_id") + 100000).as("doc_id"), col("text")).limit(50))
    val pairs = Dedup.simhashPairs(doubled, maxHamming = 3)
      .filter(col("doc_b") === col("doc_a") + 100000 && col("hamming") === 0)
    assert(pairs.count() === 50)
  }

  test("quality: ratios within [0,1]") {
    val q = TextOps.qualityScore(docs)
    assert(q.filter(col("stop_ratio") < 0 || col("stop_ratio") > 1).count() === 0)
    assert(q.filter(col("quality") < 0 || col("quality") > 1).count() === 0)
  }

  test("token counts: ws_tokens equals whitespace word count") {
    val q = TextOps.tokenCount(docs)
      .join(docs.select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("words")), "doc_id")
    assert(q.filter(col("ws_tokens") =!= col("words")).count() === 0)
  }

  test("fingerprint is deterministic and order-sensitive") {
    val f1 = TextOps.fingerprint(docs).withColumnRenamed("fingerprint", "f1")
    val f2 = TextOps.fingerprint(docs).withColumnRenamed("fingerprint", "f2")
    assert(f1.join(f2, "doc_id").filter(col("f1") =!= col("f2")).count() === 0)
    // reversed word order should (generically) change the hash
    val rev = docs.select(col("doc_id"),
      concat_ws(" ", reverse(split(col("text"), " "))).as("text"))
    val fr = TextOps.fingerprint(rev).withColumnRenamed("fingerprint", "fr")
    assert(f1.join(fr, "doc_id").filter(col("f1") === col("fr")).count() < docs.count())
  }

  test("brute-force ANN: self-similarity excluded, sims in [-1,1], k rows") {
    val r = Similarity.bruteForceTopK(emb, 0L, 10)
    assert(r.count() === 10)
    assert(r.filter(col("vec_id") === 0).count() === 0)
    assert(r.filter(col("cos_sim") < -1.0001 || col("cos_sim") > 1.0001).count() === 0)
  }

  test("LSH ANN results are a subset ranked consistently with brute force") {
    val brute = Similarity.bruteForceTopK(emb, 0L, 500).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = Similarity.lshTopK(emb, 0L, 10, dim = 64).collect()
    // every LSH hit must carry the same cosine the brute force computed
    lsh.foreach { r =>
      val id = r.getLong(0)
      assert(brute.contains(id))
      assert(math.abs(brute(id) - r.getDouble(1)) < 1e-9)
    }
  }

  test("IVF ANN results carry brute-force-consistent cosines") {
    val brute = Similarity.bruteForceTopK(emb, 0L, 500).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val ivf = Similarity.ivfTopK(emb, 0L, 10).collect()
    assert(ivf.length === 10)
    ivf.foreach { r =>
      assert(brute.contains(r.getLong(0)))
      assert(math.abs(brute(r.getLong(0)) - r.getDouble(1)) < 1e-9)
    }
  }

  test("normalize collapses whitespace, strips controls, lowercases") {
    import spark.implicits._
    val rows = Seq(
      "  Hello\t\tWORLD \r\n",          // runs of mixed whitespace + case
      "a\u0000b\u0007c", // NUL/BEL delete in place, no space inserted
      "one\ntwo\u000Bthree", // newline + vertical tab are separators
      "already clean")
      .toDF("t").select(TextOps.normalize(col("t")).as("n"))
      .collect().map(_.getString(0))
    assert(rows(0) === "hello world")
    assert(rows(1) === "abc") // non-ws controls delete in place
    assert(rows(2) === "one two three")
    assert(rows(3) === "already clean")
  }

  test("redact replaces URLs, emails and IPs with typed placeholders") {
    import spark.implicits._
    val out = Seq(
      "see https://a.io/x?y=1 or mail bob@corp.example.org from 192.168.0.1 ok",
      "no pii here", "half@match. 300.1.2 http:/nope")
      .toDF("t").select(TextOps.redact(col("t")).as("r"))
      .collect().map(_.getString(0))
    assert(out(0) === "see <URL> or mail <EMAIL> from <IP> ok")
    assert(out(1) === "no pii here")
    assert(out(2) === "half@match. 300.1.2 http:/nope") // near-misses untouched
  }

  test("contamination: eval copy scores 1.0, disjoint doc scores 0.0") {
    import spark.implicits._
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"), // eval
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // exact copy
      (2L, "one two three four five six seven eight nine"),  // disjoint
      (3L, "x alpha beta gamma delta epsilon y z w v"))      // partial
      .toDF("doc_id", "text")
    val out = TextOps.contamination(corpus, col("doc_id") === 0L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) === ((4L, 4L, 1.0)))
    assert(out(2L) === ((5L, 0L, 0.0)))
    // doc 3 has 6 grams, exactly one ("alpha beta gamma delta epsilon")
    // is an eval gram
    assert(out(3L) === ((6L, 1L, 0.166667)))
    assert(!out.contains(0L)) // eval rows are not scored
  }

  test("langId emits a prediction per doc") {
    assert(TextOps.langId(docs).filter(col("pred_lang").isNull).count() === 0)
  }

  test("minhashCandidates streams a degenerate corpus (5k identical docs)") {
    import spark.implicits._
    // every doc identical → ONE bucket of 5000 members per band. The
    // grouped collect_list formulation would buffer ~12.5M pair structs
    // inside a single row here; the self-join streams them instead.
    val clones = (0L until 5000L)
      .map(i => (i, "the same exact document body repeated verbatim"))
      .toDF("doc_id", "text")
    val nPairs = Dedup.minhashCandidates(clones).count()
    assert(nPairs === 5000L * 4999L / 2L)
  }

  test("repetition ratio within [0,1); clone-heavy doc scores higher") {
    import spark.implicits._
    val r = TextOps.repetitionRatio(docs)
    assert(r.filter(col("rep_ratio") < 0.0 || col("rep_ratio") >= 1.0).count() === 0)
    val synth = Seq((1L, "a b c a b c a b c a b c"), (2L, "one two three four five six"))
      .toDF("doc_id", "text")
    val m = TextOps.repetitionRatio(synth).collect()
      .map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(m(1L) > m(2L) && m(2L) === 0.0)
  }

  test("stratified sample: at most k per stratum, deterministic") {
    val s1 = TextOps.stratifiedSample(docs, 10)
    assert(s1.groupBy("pred_lang").count().filter(col("count") > 10).count() === 0)
    val s2 = TextOps.stratifiedSample(docs, 10)
    assert(s1.exceptAll(s2).count() === 0)
  }

  test("top terms: exactly one row per doc, tf <= total words") {
    val t = TextOps.topTerms(docs)
    assert(t.count() === docs.count())
    assert(t.groupBy("doc_id").count().filter(col("count") > 1).count() === 0)
  }

  test("knn join: rk <= k, no self edges, cosine within bounds") {
    val g = Similarity.knnJoin(emb, dim = 64, k = 3)
    assert(g.filter(col("rk") > 3).count() === 0)
    assert(g.filter(col("vec_id") === col("nbr_id")).count() === 0)
    assert(g.filter(col("cos_sim") < -1.0001 || col("cos_sim") > 1.0001).count() === 0)
  }

  test("lexical diversity: ttr in (0,1], distinct <= tokens, simpson < 1") {
    val ld = TextOps.lexicalDiversity(docs)
    assert(ld.count() === docs.count())
    assert(ld.filter(col("ttr") <= 0 || col("ttr") > 1).count() === 0)
    assert(ld.filter(col("n_distinct") > col("n_tokens")).count() === 0)
    assert(ld.filter(col("simpson") < 0 || col("simpson") >= 1).count() === 0)
  }

  test("source mix: shares sum to 1, counts sum to corpus size") {
    val sm = TextOps.sourceMix(docs).collect()
    assert(sm.map(_.getAs[Long]("n_docs")).sum === docs.count())
    val share = sm.map(_.getAs[Double]("share")).sum
    assert(math.abs(share - 1.0) < 1e-4, s"shares sum to $share")
  }

  test("boilerplate: every reported gram appears in >=2 distinct docs") {
    import spark.implicits._
    val d = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "a quick brown fox runs"),
      (3L, "entirely different words here")).toDF("doc_id", "text")
    val b = TextOps.boilerplate(d, n = 3, k = 10).collect()
    assert(b.map(_.getString(0)).contains("quick brown fox"))
    assert(b.forall(_.getAs[Long]("n_docs") >= 2))
  }

  test("pack bins conserve tokens and number bins contiguously per source") {
    val pb = TextOps.packBins(docs, 512).cache()
    val total = docs.select(size(split(col("text"), " ")).cast("long").as("t"))
      .agg(sum("t")).collect()(0).getLong(0)
    assert(pb.agg(sum("bin_tokens")).collect()(0).getLong(0) === total)
    // bins are 0..max with no holes within each source
    val bad = pb.groupBy("source")
      .agg(min("bin").as("mn"), max("bin").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("n") =!= col("mx") + 1)
      .count()
    assert(bad === 0)
    pb.unpersist()
  }

  test("vocab coverage is monotone in top_n and bounded by 1") {
    val vc = TextOps.vocabCoverage(docs, Seq(5, 10, 20)).collect()
    assert(vc.nonEmpty)
    val cov = vc.map(_.getAs[Double]("coverage"))
    assert(cov.zip(cov.tail).forall { case (a, b) => a <= b })
    assert(cov.forall(c => c > 0 && c <= 1.0))
  }

  test("nearDupClusters converges on a chain longer than the round count") {
    import spark.implicits._
    // 21-node path graph: diameter 20 > iters 5 — only the
    // pointer-jumping step reaches fixpoint here
    val d = (0L to 20L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val pairs = (0L until 20L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.nearDupClusters(d, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 20L).foreach(i => assert(got(i) === 0L, s"node $i"))
  }

  test("chunking: short doc is one whole chunk; overlap counts chars twice") {
    import spark.implicits._
    val d = Seq((1L, "a" * 100, 100L), (2L, "b" * 350, 350L))
      .toDF("doc_id", "text", "n_chars")
    val got = TextOps.chunk(d, 200, 150).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_chunks"),
        r.getAs[Long]("total_chunk_chars"))).toMap
    assert(got(1L) === ((1L, 100L)))
    // starts 0,150,300 -> chunk lengths 200,200,50
    assert(got(2L) === ((3L, 450L)))
  }

  test("chunking covers every doc with enough chunks for its length") {
    val joined = TextOps.chunk(docs, 200, 150)
      .join(docs.select("doc_id", "n_chars"), "doc_id")
    assert(joined.count() === docs.count())
    // n_chunks = ceil(max(n_chars,1) / 150) exactly
    val bad = joined.filter(
      col("n_chunks") =!= expr("cast(ceil(greatest(n_chars, 1) / 150.0) as bigint)"))
      .count()
    assert(bad === 0)
  }

  test("mixture sample: per-source takes respect quotas and are deterministic") {
    val m = TextOps.mixtureSample(docs, 300).cache()
    val bad = m.withColumn("idx",
        expr("CAST(substring(source, 4) AS INT)"))
      .withColumn("quota",
        floor((pmod(col("idx"), lit(4)) + 1).cast("double") / 50.0 * 300).cast("long"))
      .filter(col("n_taken") > col("quota")).count()
    assert(bad === 0)
    val a = m.collect().map(_.toSeq).toSeq
    val b = TextOps.mixtureSample(docs, 300).collect().map(_.toSeq).toSeq
    assert(a === b)
    m.unpersist()
  }

  test("containment: an embedded document is fully contained") {
    import spark.implicits._
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "zero alpha beta gamma delta epsilon omega end tail"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val r = Dedup.containment(pairs, d).collect()(0)
    assert(r.getAs[Double]("containment_a") === 1.0)
    assert(r.getAs[Double]("containment_b") < 1.0)
  }

  test("containment bounds [0,1] and dominates jaccard on the same pairs") {
    val pairs = docs.select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b"))
    val c = Dedup.containment(pairs, docs)
    val j = Dedup.ngramJaccard(pairs, docs)
    val joined = c.join(j, Seq("doc_a", "doc_b"))
    assert(joined.filter(col("containment_a") < 0 || col("containment_a") > 1 ||
      col("containment_b") < 0 || col("containment_b") > 1).count() === 0)
    // |A∩B|/|A| >= |A∩B|/|A∪B| always (rounding-tolerant epsilon)
    assert(joined.filter(col("containment_a") < col("jaccard") - 1e-6).count() === 0)
  }

  test("lang confusion matrix conserves the corpus and stays in the label set") {
    val cm = TextOps.langConfusion(docs).cache()
    assert(cm.agg(sum("n_docs")).collect()(0).getLong(0) === docs.count())
    val labels = TextOps.langMarkers.keySet
    val preds = cm.select("predicted").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(labels))
    cm.unpersist()
  }

  test("train split partitions the corpus into three named splits") {
    val s = TextOps.trainSplit(docs).cache()
    assert(s.agg(sum("n_docs")).collect()(0).getLong(0) === docs.count())
    val splits = s.select("split").distinct().collect().map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "val", "test")))
    assert(splits.contains("train"))
    // 80/10/10 in expectation: train must dominate at sf0.001 (500 docs)
    val byS = s.groupBy("split").agg(sum("n_docs").as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byS("train") > byS.getOrElse("val", 0L))
    assert(byS("train") > byS.getOrElse("test", 0L))
    s.unpersist()
  }

  test("collocations: adjacent pairs counted with deterministic top-k") {
    import spark.implicits._
    val d = Seq((1L, "x y x y"), (2L, "x y z")).toDF("doc_id", "text")
    val got = TextOps.collocations(d, 10).collect()
      .map(r => r.getAs[String]("pair") -> r.getAs[Long]("cnt"))
    assert(got.head === ("x y" -> 3L))
    assert(got.toMap === Map("x y" -> 3L, "y x" -> 1L, "y z" -> 1L))
  }
}
