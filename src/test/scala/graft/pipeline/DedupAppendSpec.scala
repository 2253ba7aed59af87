package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** r14: the incremental clusters refresh (the r13 verdict's "missing
  * #2"). [[Dedup.clustersAppend]] must produce EXACTLY the labels a
  * from-scratch fixpoint over the union corpus produces, while never
  * running the whole-corpus fixpoint itself — the append path
  * tokenizes only the appended docs and reads the persisted band /
  * label tables for the base.
  */
class DedupAppendSpec extends AnyFunSuite {
  import TestSpark._

  test("clustersAppend equals a full union rebuild on real corpus slices") {
    val docs = Tables.documents(spark, sf)
    val base = docs.filter(col("doc_id") < 400)
    val extra = docs.filter(col("doc_id") >= 400 && col("doc_id") < 450)
    val union = base.unionByName(extra)

    def toMap(df: org.apache.spark.sql.DataFrame): Map[Long, (Long, Long)] =
      df.collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("cluster_id"), r.getAs[Long]("is_survivor")))).toMap

    val appended = toMap(Dedup.clustersAppend(base, extra))
    val rebuilt = toMap(
      Dedup.nearDupClusters(union, Dedup.minhashCandidates(union)))
    assert(appended.size === union.count())
    assert(appended === rebuilt)

    // the union corpus digest must never have gone through the
    // full-fixpoint build path (digest-keyed, so parallel suites
    // building artifacts for OTHER corpora can't pollute the check)
    val unionDigest = IvfIndex.corpusDigest(union)
    assert(!Dedup.fullBuildDigests.contains(unionDigest),
      "append path ran the full-corpus fixpoint for the union corpus")

    // the refreshed artifact is registered under the union digest:
    // a later clusters() read of the same union plan is a metadata
    // read, not a rebuild
    val viaArtifact = toMap(Dedup.clusters(base.unionByName(extra)))
    assert(viaArtifact === rebuilt)
    assert(!Dedup.fullBuildDigests.contains(unionDigest))
  }

  test("clustersAppend merges new exact-duplicates into old clusters") {
    import spark.implicits._
    val tx = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val ty = "one two three four five six seven eight nine ten"
    val base = Seq((10L, tx), (11L, tx), (20L, ty))
      .toDF("doc_id", "text")
    // 30 duplicates cluster {10, 11}; 31 duplicates singleton 20;
    // 32 is novel and stays a singleton
    val extra = Seq((30L, tx), (31L, ty), (32L, "totally novel words only"))
      .toDF("doc_id", "text")
    val got = Dedup.clustersAppend(base, extra).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got(10L) === ((10L, 1L)) && got(11L) === ((10L, 0L)))
    assert(got(30L) === ((10L, 0L)))
    assert(got(20L) === ((20L, 1L)) && got(31L) === ((20L, 0L)))
    assert(got(32L) === ((32L, 1L)))
  }
}
