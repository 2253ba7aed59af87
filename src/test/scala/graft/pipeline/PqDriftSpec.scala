package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** r14 (r13 verdict item 7): the PQ codebook-drift gauge. appendEncode
  * used to carry its drift caveat in a comment; now it is mechanical —
  * the mean encoding distortion of an appended batch relative to the
  * build-time distribution, with a documented rebuild threshold.
  */
class PqDriftSpec extends AnyFunSuite {
  import TestSpark._

  // distinct corpus plan so the shared full-corpus index (RecallSpec)
  // is never touched
  private lazy val corpus =
    Tables.embeddings(spark, sf).filter(col("vec_id") < 250)
  private lazy val idx = PqIndex.forTable(corpus, 8, 16)

  test("in-distribution appends sit near drift 1.0") {
    // vectors drawn from the SAME corpus (but outside the build slice)
    // quantize about as well as the build set did
    val sameDist = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= 250 && col("vec_id") < 350)
    val g = idx.driftGauge(sameDist)
    assert(g > 0.5 && g < PqIndex.DriftRebuildThreshold,
      s"in-distribution drift gauge $g outside (0.5, 2.0)")
  }

  test("zero build distortion: drifted batch still flags (no NaN swallow)") {
    import spark.implicits._
    // r15 (ADVICE): a degenerate corpus sitting exactly on its own
    // codebook centroids has buildDistortion == 0.0; the raw ratio was
    // Inf/NaN and a NaN silently FAILED the rebuild check. 16 distinct
    // 6-dp-exact vectors with cb=16 → each vector is its own centroid
    // after the Lloyd round → distortion exactly 0.
    val dim = 8
    val vecs = (0 until 16).map { i =>
      (i.toLong, (0 until dim).map(j => (i * 10 + j).toFloat / 4.0f))
    }.toDF("vec_id", "embedding")
    val zeroIdx = PqIndex.forTable(vecs, 4, 16)
    assert(zeroIdx.buildDistortion == 0.0,
      s"fixture not degenerate: buildDistortion ${zeroIdx.buildDistortion}")
    val undrifted = vecs.filter(col("vec_id") < 4)
    assert(zeroIdx.driftGauge(undrifted) == 1.0)
    val drifted = vecs.select(col("vec_id"),
      transform(col("embedding"), x => x + lit(1000.0f)).as("embedding"))
    assert(zeroIdx.driftGauge(drifted) > PqIndex.DriftRebuildThreshold,
      "drifted batch over a zero-floor index must flag a rebuild")
  }

  test("a shifted source blows past the rebuild threshold") {
    // scale every component 10×: squared distances to the stored
    // centroids grow ~100× — the gauge must flag a rebuild
    val shifted = Tables.embeddings(spark, sf)
      .filter(col("vec_id") >= 250 && col("vec_id") < 300)
      .select(col("vec_id"),
        transform(col("embedding"), x => x * lit(10.0f)).as("embedding"))
    val g = idx.driftGauge(shifted)
    assert(g > PqIndex.DriftRebuildThreshold,
      s"shifted-source drift gauge $g did not exceed the rebuild threshold")
  }
}
