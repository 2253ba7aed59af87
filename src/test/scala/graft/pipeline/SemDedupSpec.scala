package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** r16 (the r15 verdict's #1 and #7): the artifact-backed SemDeDup
  * lifecycle. The value-level keeper/zero-vector semantics stay gated
  * in NewOpsR15Spec/PipelineEdgeSpec; this suite gates the LIFECYCLE —
  * one fit per corpus digest, artifact reuse across calls, the
  * per-cluster pair cap, and the incremental append's equality with a
  * full union re-verdict against the stored centroids.
  */
class SemDedupSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val emb = Tables.embeddings(spark, sf)

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("repeated calls reuse ONE artifact build per corpus digest") {
    val digest = IvfIndex.corpusDigest(emb)
    val first = rows(Similarity.semDedup(emb))
    val second = rows(Similarity.semDedup(emb))
    assert(first === second)
    assert(SemDedupIndex.buildCounts.get(digest).get() === 1,
      "the fit+verdict pass must run exactly once per corpus digest")
    // the artifact content equals a recompute from the dumped constants
    // (what the DuckDB oracle independently re-derives)
    val (cents, k) = SemDedupIndex.constantsFor(digest).get
    assert(k === SemDedupIndex.defaultK(emb.count()))
    val ref = rows(SemDedupIndex.verdictsAgainst(emb, cents, 0.25)
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
        col("is_kept"))
      .orderBy("vec_id"))
    assert(first === ref)
  }

  test("k follows the √N/occupancy policy, never the fixed r15 k=4") {
    assert(SemDedupIndex.defaultK(500L) === 16)   // occupancy-bounded floor
    assert(SemDedupIndex.defaultK(2000L) === 45)  // ⌈√2000⌉
    assert(SemDedupIndex.defaultK(100000000L) === 10000) // √N at scale
    // the ADVICE Long-clamp: ~1e11 vectors must not wrap negative
    assert(SemDedupIndex.defaultK(100000000000L) === 316228)
  }

  test("a cluster above MaxCluster skips the pair join — all members kept") {
    // 10001 identical vectors: one cluster of MaxCluster+1 exact dups —
    // the degenerate shard the cap exists for (exact dedup's job, not a
    // v×v pair join's). Every member must come back kept.
    val big = spark.range(10001).select(col("id").as("vec_id"),
      typedLit(Seq(1.0f, 0.0f, 0.0f, 0.0f)).as("embedding"),
      lit(0).as("label"))
    val v = Similarity.semDedup(big)
    assert(v.agg(sum(col("is_kept"))).head().getLong(0) === 10001L)
  }

  test("impact census equals a recompute over the verdict artifact") {
    val verdicts = SemDedupIndex.verdicts(emb)
      .collect().map(r => (r.getInt(1), r.getDouble(2), r.getLong(3)))
    val byCluster = verdicts.groupBy(_._1)
    val got = Similarity.semDedupImpact(emb).collect()
    assert(got.length === byCluster.size)
    got.foreach { r =>
      val m = byCluster(r.getLong(0).toInt)
      assert(r.getLong(1) === m.length.toLong)
      assert(r.getLong(2) === m.count(_._3 == 1L).toLong)
      assert(r.getDouble(3) ===
        m.count(_._3 == 1L).toDouble / m.length.toDouble)
      assert(r.getDouble(4) === m.map(_._2).min)
      assert(r.getDouble(5) === m.map(_._2).max)
    }
  }

  test("append equals a full union re-verdict against the stored centroids") {
    val base = emb.filter(col("vec_id") % 25 =!= 0)
    val nw = emb.filter(col("vec_id") % 25 === 0)
    val got = rows(Similarity.semDedupAppend(base, nw))
    // the union fixpoint must NOT have full-built (per-digest gate —
    // parallel suites build their own fixtures)
    val unionDigest = IvfIndex.corpusDigest(base.unionByName(nw))
    assert(SemDedupIndex.buildCounts.get(unionDigest) == null,
      "append ran the full fit for the union corpus")
    // reference: the whole union re-verdicted against the BASE-fit
    // centroids (the append's documented equality contract — model
    // refresh is the digest-advance rebuild, not the append's job)
    val (cents, _) =
      SemDedupIndex.constantsFor(IvfIndex.corpusDigest(base)).get
    val ref = rows(SemDedupIndex.verdictsAgainst(base.unionByName(nw), cents, 0.25)
      .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
        col("is_kept"))
      .orderBy("vec_id"))
    assert(got === ref)
    // and a repeat append is a pure cache read (no second reduced pass)
    assert(rows(Similarity.semDedupAppend(base, nw)) === got)
  }
}
