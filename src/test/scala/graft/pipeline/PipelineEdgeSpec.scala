package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Adversarial document shapes for the text/dedup pipeline — empty
  * text, whitespace-only text, single-character docs, exact
  * duplicates, a single-doc corpus slice: every operator must run
  * without ANSI arithmetic errors (the rollSpread/funnel bug class:
  * divisions whose DuckDB mirror is NULL but whose unguarded Spark
  * form throws) and return sane row counts.
  */
class PipelineEdgeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val edgeDocs: DataFrame = Seq(
    (1L, "", "en", "web"),                         // empty text
    (2L, "   ", "en", "web"),                      // whitespace only
    (3L, "x", "de", "books"),                      // single char
    (4L, "the the the the the the", "en", "web"),  // pure repetition
    (5L, "the the the the the the", "en", "code"), // exact duplicate
    (6L, "Z", "fr", "books"),                      // another 1-char
    (7L, "a\u000Bb c\td", "en", "web")             // vertical tab: the
      // Java-\s-vs-RE2 divergence char (CLAUDE.md regex parity rule)
  ).map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("text ops survive empty/degenerate documents") {
    val ops: Seq[(String, DataFrame)] = Seq(
      "qualityScore" -> TextOps.qualityScore(edgeDocs),
      "tokenCount" -> TextOps.tokenCount(edgeDocs),
      "langId" -> TextOps.langId(edgeDocs),
      "langConfusion" -> TextOps.langConfusion(edgeDocs),
      "repetitionRatio" -> TextOps.repetitionRatio(edgeDocs),
      "stratifiedSample" -> TextOps.stratifiedSample(edgeDocs, 2),
      "topTerms" -> TextOps.topTerms(edgeDocs),
      "fingerprint" -> TextOps.fingerprint(edgeDocs),
      "lexicalDiversity" -> TextOps.lexicalDiversity(edgeDocs),
      "sourceMix" -> TextOps.sourceMix(edgeDocs),
      "packBins" -> TextOps.packBins(edgeDocs),
      "vocabCoverage" -> TextOps.vocabCoverage(edgeDocs, Seq(1, 2)),
      "boilerplate" -> TextOps.boilerplate(edgeDocs),
      "chunk" -> TextOps.chunk(edgeDocs),
      "mixtureSample" -> TextOps.mixtureSample(edgeDocs, 4),
      "trainSplit" -> TextOps.trainSplit(edgeDocs),
      "weightedSample" -> TextOps.weightedSample(edgeDocs, 3),
      "tokenFertility" -> TextOps.tokenFertility(edgeDocs),
      "urlStats" -> TextOps.urlStats(edgeDocs),
      "collocations" -> TextOps.collocations(edgeDocs),
      "contamination" -> TextOps.contamination(edgeDocs, col("source") === "books"),
      "mojibake" -> TextOps.mojibake(edgeDocs),
      "bigramNovelty" -> TextOps.bigramNovelty(edgeDocs),
      "charClassProfile" -> TextOps.charClassProfile(edgeDocs),
      "piiDensity" -> TextOps.piiDensity(edgeDocs),
      "sentenceStats" -> TextOps.sentenceStats(edgeDocs),
      "compressionRatio" -> TextOps.compressionRatio(edgeDocs),
      "codeProse" -> TextOps.codeProse(edgeDocs),
      "lengthHistogram" -> TextOps.lengthHistogram(edgeDocs),
      "dupNgrams" -> TextOps.dupNgrams(edgeDocs),
      "hapax" -> TextOps.hapax(edgeDocs),
      "readability" -> TextOps.readability(edgeDocs),
      "wordLenHist" -> TextOps.wordLenHist(edgeDocs)
    )
    ops.foreach { case (name, df) =>
      try df.collect()
      catch { case e: Throwable =>
        fail(s"$name threw on the adversarial corpus: ${e.getMessage.take(300)}")
      }
    }
  }

  test("dedup ops survive empty/degenerate documents") {
    val ops: Seq[(String, DataFrame)] = Seq(
      "exact" -> Dedup.exact(edgeDocs),
      "minhashCandidates" -> Dedup.minhashCandidates(edgeDocs),
      "simhash" -> Dedup.simhash(edgeDocs),
      "simhashPairs" -> Dedup.simhashPairs(edgeDocs),
      "crossSourceLeakage" -> Dedup.crossSourceLeakage(edgeDocs),
      "minhashCalibration" -> Dedup.minhashCalibration(edgeDocs),
      "dedupImpact" -> Dedup.dedupImpact(edgeDocs),
      "spanDedup" -> Dedup.spanDedup(edgeDocs),
      "spanDedupImpact" -> Dedup.spanDedupImpact(edgeDocs),
      "spanDedupSentences" -> Dedup.spanDedupSentences(edgeDocs),
      "clustersAppend" -> Dedup.clustersAppend(
        edgeDocs.filter(col("doc_id") <= 4), edgeDocs.filter(col("doc_id") > 4))
    )
    ops.foreach { case (name, df) =>
      try df.collect()
      catch { case e: Throwable =>
        fail(s"$name threw on the adversarial corpus: ${e.getMessage.take(300)}")
      }
    }
    // the exact-dup pair (4, 5) must be collapsed by exact dedup
    assert(Dedup.exact(edgeDocs).count() === 6)
  }

  test("tokenCount treats \\x0B as whitespace via the explicit ASCII class") {
    // "ab c\td" must split into 4 ws tokens on BOTH engines: the
    // explicit class [ \t\n\r\f\x0B] is in the Java∩RE2 subset, whereas
    // Java's \s matches \x0B and RE2's does not.
    val r = TextOps.tokenCount(edgeDocs.filter(col("doc_id") === 7L)).head()
    assert(r.getAs[Long]("ws_tokens") === 4L)
    assert(r.getAs[Long]("bpe_tokens") === 4L)
  }

  test("media synth/decode survive a single-doc corpus") {
    val one = edgeDocs.filter(col("doc_id") === 3L)
    assert(Multimodal.mediaMeta(spark, one).count() === 1)
    assert(Multimodal.mediaFeatures(spark, one).count() === 1)
    assert(Multimodal.frameSummary(spark, one).count() >= 1)
  }

  test("bpeMerges survives degenerate documents (the sequence(1,0) trap)") {
    // empty / single-char words MUST contribute nothing: an unguarded
    // sequence(1, length-1) DESCENDS for length 1 in Spark
    assert(TextOps.bpeMerges(edgeDocs).collect().forall(_.getLong(1) > 0))
    val single = edgeDocs.filter(col("doc_id").isin(1L, 2L, 3L, 6L))
    assert(TextOps.bpeMerges(single).count() === 0)
  }

  test("embedding moment ops survive tiny/degenerate corpora") {
    val twoVec = Seq((0L, Seq(1f, 0f)), (1L, Seq(0f, 1f)))
      .toDF("vec_id", "embedding")
    // n = 2: full 2×2 upper triangle, all covariances defined
    val cov2 = Similarity.embedCovariance(twoVec).collect()
    assert(cov2.length === 3 && cov2.forall(!_.isNullAt(3)))
    // n = 1: cells emitted, covariance NULL (mirrors the oracle CASE)
    val cov1 = Similarity.embedCovariance(
      twoVec.filter(col("vec_id") === 0L)).collect()
    assert(cov1.length === 3 && cov1.forall(_.isNullAt(3)))
    // empty corpus: zero rows, no ANSI error
    assert(Similarity.embedCovariance(twoVec.limit(0)).count() === 0)
    // pcaTop on an orthogonal pair: v1 = C·1 = 0 → guarded NULLs,
    // never a DIVIDE_BY_ZERO
    val pca = Similarity.pcaTop(twoVec).collect()
    assert(pca.length === 2 && pca.forall(_.isNullAt(2)))
    // silhouette on two perfectly-separated singletons: s = 1.0 each
    val sil = KMeansOps.silhouetteCensus(twoVec, k = 2, iters = 1)
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(sil.toSeq === Seq((1L, 1.0), (1L, 1.0)))
    // r14: quant-error histogram — the all-zero vector must be
    // EXCLUDED (q·q = 0 guard), not an ANSI divide error; exact unit
    // vectors quantize losslessly (error bucket 0)
    val withZero = twoVec.union(Seq((2L, Seq(0f, 0f)))
      .toDF("vec_id", "embedding"))
    val qe = Similarity.quantErrorHist(withZero).collect()
    assert(qe.map(_.getLong(1)).sum === 2L)
    assert(qe.forall(r => r.getLong(0) === 0L))
    // r14: TwoNN on duplicate-heavy fixtures — c1 = 1 pairs are
    // excluded, sums can be empty → NULL id_hat, never an ANSI error
    val dupEmb = Seq((0L, Seq(1f, 0f), 0), (1L, Seq(1f, 0f), 0),
      (2L, Seq(0f, 1f), 1)).toDF("vec_id", "embedding", "label")
    Similarity.intrinsicDim(dupEmb, dim = 2).collect()
  }

  test("r15 ops survive degenerate corpora") {
    Seq(
      "docBigramNll" -> graft.pipeline.TextOps.docBigramNll(edgeDocs),
      "qualitySurvivors" -> Dedup.qualitySurvivors(edgeDocs),
      // BPE vocab on single-char/empty docs: the dry-loop path (no
      // pairs at all) must return an empty result, not spin or throw
      "bpeVocab" -> graft.pipeline.TextOps.bpeVocab(
        edgeDocs.filter(col("doc_id").isin(1L, 2L, 3L, 6L))),
      "sceneChanges" -> Multimodal.sceneChanges(spark,
        edgeDocs.filter(col("doc_id") === 3L))
    ).foreach { case (name, df) =>
      try df.collect()
      catch { case e: Throwable =>
        fail(s"$name threw on the adversarial corpus: ${e.getMessage.take(300)}")
      }
    }
    assert(graft.pipeline.TextOps.bpeVocab(
      edgeDocs.filter(col("doc_id").isin(1L, 2L, 3L, 6L))).count() === 0)
    // a single-event corpus: one session, one bounce, rate 1.0
    val oneEvent = Seq((1L, new java.sql.Timestamp(1700040000000L), 9L,
      "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val br = graft.operators.EventAnalytics.bounceRate(oneEvent).collect()
    assert(br.length === 1 && br(0).getDouble(3) === 1.0)
    // semDedup with a ZERO vector sharing a cluster: cosine is 0/0 —
    // must be guarded (DuckDB's x/0 is NULL; unguarded Spark ANSI
    // throws), and the zero vector is always kept
    val withZero = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0), (1L, Seq(0f, 1f, 0f, 0f), 0),
      (2L, Seq(0f, 0f, 1f, 0f), 0), (3L, Seq(0f, 0f, 0f, 1f), 0),
      (4L, Seq(0f, 0f, 0f, 0f), 0), (5L, Seq(1f, 0f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
      .filter(col("vec_id") >= 0L) // digest-disambiguating literal
    val sd = Similarity.semDedup(withZero)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sd(4L) === 1L, "zero vector must be kept")
    assert(sd(5L) === 0L && sd(0L) === 1L, "exact dup still collapses")
  }

  test("r16 ops survive degenerate corpora and EMPTY append batches") {
    // bm25 on the adversarial corpus (empty/whitespace docs → dl 1,
    // zero-match docs filtered) and with a term no doc contains
    Seq(
      "bm25" -> TextOps.bm25(edgeDocs, Seq("the", "x")),
      "bm25-nomatch" -> TextOps.bm25(edgeDocs, Seq("zzz-absent")),
      "bpeApply" -> TextOps.bpeApply(edgeDocs),
      "semDedupImpact" -> graft.pipeline.Similarity.semDedupImpact(
        edgeDocs.select(col("doc_id").as("vec_id"),
          transform(sequence(lit(1), lit(4)),
            i => (col("doc_id") + i).cast("float")).as("embedding"),
          lit(0).as("label")))
    ).foreach { case (name, df) =>
      try df.collect()
      catch { case e: Throwable =>
        fail(s"$name threw on the adversarial corpus: ${e.getMessage.take(300)}")
      }
    }
    // empty append batches: a quiet micro-batch must be a no-op, not
    // an NPE (sum over empty = NULL) — both r16 append paths
    val base = edgeDocs.filter(col("doc_id") <= 5L)
    val emptyDocs = edgeDocs.filter(col("doc_id") > 100L)
    val idx = Bm25Index.forTable(base)
    val before = idx.topK(Seq("the"), 5).collect().map(_.toSeq).toSeq
    idx.append(emptyDocs)
    assert(idx.topK(Seq("the"), 5).collect().map(_.toSeq).toSeq === before)
    val embBase = base.select(col("doc_id").as("vec_id"),
      transform(sequence(lit(1), lit(4)),
        i => (col("doc_id") + i).cast("float")).as("embedding"),
      lit(0).as("label"))
    val embEmpty = embBase.filter(col("vec_id") > 100L)
    val sd = Similarity.semDedupAppend(embBase, embEmpty).collect()
    assert(sd.length === 5)
  }

  test("r17 retrieval ops survive empty/degenerate documents") {
    Seq(
      // AND over a term set no single doc fully contains → empty, not
      // an error; AND with a satisfiable set; phrase over a corpus
      // whose docs are mostly <2 words (the sequence(1,0) trap)
      "bm25-and-empty" -> TextOps.bm25(edgeDocs, Seq("the", "x"),
        conjunctive = true),
      "bm25-and-hit" -> TextOps.bm25(edgeDocs, Seq("the"), conjunctive = true),
      "bigramize" -> TextOps.bigramize(edgeDocs),
      "bm25-phrase" -> TextOps.bm25(TextOps.bigramize(edgeDocs),
        Seq("the_the")),
      "bm25-phrase-nomatch" -> TextOps.bm25(TextOps.bigramize(edgeDocs),
        Seq("zz_absent"))
    ).foreach { case (name, df) =>
      try df.collect()
      catch { case e: Throwable =>
        fail(s"$name threw on the adversarial corpus: ${e.getMessage.take(300)}")
      }
    }
    // AND is genuinely conjunctive on the degenerate corpus: 'the' and
    // 'x' never co-occur, 'the' alone matches the repetition docs
    assert(TextOps.bm25(edgeDocs, Seq("the", "x"), conjunctive = true)
      .count() === 0)
    assert(TextOps.bm25(edgeDocs, Seq("the"), conjunctive = true)
      .count() === 2)
    // the indexed AND path agrees on the degenerate corpus too
    val idx = Bm25Index.forTable(edgeDocs)
    assert(idx.topK(Seq("the", "x"), 5, conjunctive = true).count() === 0)
    // batch retrieval over degenerate queries: an empty-text query
    // tokenizes to the "" term (which the empty docs OWN), a no-match
    // query simply yields no rows for its id
    val batchQs = Seq((1L, "the"), (2L, ""), (3L, "zzz-absent"))
      .toDF("query_id", "text")
    val batch = idx.topKBatch(batchQs, 5).collect()
    assert(batch.count(_.getLong(0) == 1L) === 2) // two 'the' docs
    assert(batch.count(_.getLong(0) == 2L) === 2) // "" matches docs 1, 2
    assert(!batch.exists(_.getLong(0) == 3L))
    // attribute-filtered retrieval on the degenerate corpus
    assert(idx.topK(Seq("the"), 5, filter = Some(col("lang") === "de"))
      .count() === 0) // 'the' docs are all en
    assert(idx.topK(Seq("x"), 5, filter = Some(col("lang") === "de"))
      .count() === 1)
    // dimension-truncation with a ZERO vector in the corpus: its
    // prefixes are zero-norm → NULL-guarded out, never a divide error
    val edgeEmb = edgeDocs.select(col("doc_id").as("vec_id"),
      when(col("doc_id") === 1L,
        transform(sequence(lit(1), lit(8)), _ => lit(0.0f)))
        .otherwise(transform(sequence(lit(1), lit(8)),
          i => (col("doc_id") * 3 + i).cast("float"))).as("embedding"),
      lit(0).as("label"))
    val tr = Similarity.dimTruncation(edgeEmb, queryIds = Seq(3L, 4L),
      dims = Seq(4, 8), k = 3).collect()
    assert(tr.nonEmpty)
    assert(tr.filter(_.getLong(0) == 8L).forall(_.getLong(2) == 3L))
  }

  test("r18 deletion/positional ops survive degenerate corpora") {
    // delete EVERYTHING: the model hits N = 0 (driver-side avgdl is
    // NaN, never an ANSI throw) and every query answers empty
    val all = Bm25Index.build(edgeDocs)
    assert(all.delete(edgeDocs.select(col("doc_id"))) === 7L)
    assert(all.topK(Seq("the"), 5).count() === 0)
    assert(all.nDocs === 0L && all.totalLen === 0L)
    all.compact() // compacting an all-tombstoned index must not throw
    assert(all.topK(Seq("the"), 5).count() === 0)
    // delete ids given as an EMPTY frame: a no-op
    val idx2 = Bm25Index.build(edgeDocs.filter(col("doc_id") =!= 3L))
    assert(idx2.delete(edgeDocs.filter(lit(false)).select(col("doc_id")))
      === 0L)
    // positional index over the degenerate corpus: <2-word docs, a
    // phrase that only the repetition docs contain, absent terms
    val pos = Bm25PosIndex.build(edgeDocs)
    assert(pos.phraseTopK(Seq("the_the"), 2, 5).count() === 2)
    assert(pos.phraseTopK(Seq("zz_absent"), 2, 5).count() === 0)
    assert(pos.nearTopK("the", "x", 3, 5).count() === 0) // never co-occur
    // doc 7's space-split tokens carry the VT/tab INSIDE them - the
    // positional tier must treat them as opaque terms
    assert(pos.nearTopK("a\u000Bb", "c\td", 3, 5).count() === 1)
    // positional delete down to a single survivor of the phrase
    pos.delete(Seq(4L).toDF("doc_id"))
    assert(pos.phraseTopK(Seq("the_the"), 2, 5).count() === 1)
    // SemDeDup delete of a whole tiny corpus' ids minus one: the
    // survivor must come back kept (clusters emptied — the resurrect
    // rule at the smallest scale); 40 synthetic near-dup vectors so
    // the √N policy forms real multi-member clusters
    val tinyEmb = spark.range(0, 40).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(8)),
        i => (when(col("id") < 20, lit(1.0f)).otherwise(lit(-1.0f)) *
          (i.cast("float") + (col("id") % 3).cast("float") * 0.01f)))
        .as("embedding"),
      lit(0).as("label"))
    val verdicts = SemDedupIndex.verdicts(tinyEmb)
    val dropped = verdicts.filter(col("is_kept") === 0L)
      .select(col("vec_id")).collect().map(_.getLong(0))
    if (dropped.nonEmpty) {
      val keep = dropped.head
      val delIds = tinyEmb.filter(col("vec_id") =!= keep)
        .select(col("vec_id"))
      val after = SemDedupIndex.delete(tinyEmb, delIds)
      assert(after.count() === 1L)
      assert(after.head().getLong(3) === 1L,
        "sole survivor must be kept once every cluster emptied")
    }
  }

  test("r19: nearTopK two-pointer min distance — stopword-pair fixture") {
    // The r18 cross-product form materialized a tf_a·tf_b array per doc
    // (4M elements for this fixture); the r19 two-pointer merge is
    // O(tf_a + tf_b). Distances are fixed by construction, so this both
    // exercises the stopword-pair regime and pins the exact minima.
    val big = ("a b " * 2000).trim // tf(a) = tf(b) = 2000, min |i−j| = 1
    val docs = Seq(
      (1L, big),
      (2L, "a " + ("z " * 500).trim + " b"), // a at 0, b at 501
      (3L, "b a")                            // reversed adjacency
    ).toDF("doc_id", "text")
    val pos = Bm25PosIndex.build(docs)
    val near = pos.nearTopK("a", "b", 3, 10).collect()
    assert(near.map(_.getLong(0)).toSet === Set(1L, 3L))
    assert(near.forall(_.getAs[Long]("min_dist") === 1L))
    val wide = pos.nearTopK("a", "b", 501, 10).collect()
    assert(wide.map(r => r.getLong(0) -> r.getAs[Long]("min_dist")).toMap
      === Map(1L -> 1L, 2L -> 501L, 3L -> 1L))
    // unit pin: the merge equals the brute-force cross-product minimum
    // on adversarial sorted shapes (ties, disjoint ranges, singletons)
    val cases = Seq(
      (Array(0, 2, 4, 6), Array(1, 3, 5)),
      (Array(10, 20, 30), Array(31, 40)),
      (Array(5), Array(5)),
      (Array(1, 1000000), Array(500000)),
      (Array(1, 2, 3), Array(100, 200)),
      ((0 until 2000 by 2).toArray, (1 until 2000 by 2).toArray))
    cases.foreach { case (a, b) =>
      val brute = (for (x <- a; y <- b) yield math.abs(x - y).toLong).min
      val got = graft.functions.VectorMath.minPosDist(
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(a),
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(b))
      assert(got === brute, s"minPosDist(${a.toSeq}, ${b.toSeq})")
    }
  }

  test("r14 text ops survive empty/degenerate documents") {
    Seq(
      "jsDivergence" -> graft.pipeline.TextOps.jsDivergence(edgeDocs),
      "heapsLaw" -> graft.pipeline.TextOps.heapsLaw(edgeDocs),
      "urlCanonical" -> graft.pipeline.TextOps.urlCanonical(edgeDocs),
      "sourceKl" -> graft.pipeline.TextOps.sourceKl(edgeDocs),
      "contaminationSpans" -> Dedup.contaminationSpans(edgeDocs,
        col("doc_id") % 2 === 0)
    ).foreach { case (name, df) =>
      try df.collect()
      catch { case e: Throwable =>
        fail(s"$name threw on the adversarial corpus: ${e.getMessage.take(300)}")
      }
    }
  }
}
