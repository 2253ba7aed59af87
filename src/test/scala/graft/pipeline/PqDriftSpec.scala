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
