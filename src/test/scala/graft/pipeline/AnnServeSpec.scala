package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** r15 (the r14 verdict's item 4): the warm ANN serve path. A serve
  * answer must EQUAL the Spark `ivfPqTopK` query path's collected
  * result (same artifact, same constants, mirrored arithmetic), and a
  * warm repeat must run entirely driver-side — zero Spark jobs.
  */
class AnnServeSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val emb = Tables.embeddings(spark, sf)
  private lazy val srv = AnnServe.forTable(emb)

  test("serve answers equal the Spark IVFPQ query path") {
    Seq(0L, 42L, 250L).foreach { q =>
      val viaSpark = Similarity.ivfPqTopK(emb, q, 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val viaServe = srv.topKById(q, 10)
      assert(viaServe === viaSpark, s"query $q")
    }
  }

  test("appendEncode invalidates warm cells — serve sees appended vectors") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // distinct corpus plan: the index cache is digest-keyed and
    // appending to the shared full-corpus index would perturb the
    // other suites' floors (the StreamIvfPqFreshnessSpec posture)
    val corpus = Tables.embeddings(spark, sf).filter(col("vec_id") < 260)
    val srv2 = AnnServe.forTable(corpus)
    val before = srv2.topKById(5L, 10) // warms the probed cells
    assert(!before.exists(_._1 == 9300L))
    // append an exact duplicate of vec 5's vector: same rounded-argmin
    // cell, cosine 1.0 — it MUST become the warm serve's top hit
    val qvec = corpus.filter(col("vec_id") === 5L)
      .select("embedding").head().getSeq[Float](0)
    val idx = IvfPqIndex.forTable(corpus,
      IvfPqIndex.defaultNlist(260L), 8, 16) // the same cached instance
    idx.appendEncode(Seq((9300L, qvec)).toDF("vec_id", "embedding"))
    val after = srv2.topKById(5L, 10)
    assert(after.exists { case (id, cs) => id == 9300L && cs == 1.0 },
      s"warm serve missed the appended vector: $after")
    // and the serve answer still equals the Spark query path's
    val viaSpark = Similarity.ivfPqTopK(corpus, 5L, 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after === viaSpark)
  }

  test("a warm repeat query schedules zero Spark jobs") {
    srv.topKById(7L, 10) // warm the probed cells + query vector
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val r = srv.topKById(7L, 10)
      assert(r.nonEmpty)
      // let any (wrong) job's start event reach the listener bus
      Thread.sleep(1000)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(jobs.get() === 0,
      s"warm serve query scheduled ${jobs.get()} Spark job(s)")
  }
}
