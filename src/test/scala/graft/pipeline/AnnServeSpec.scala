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
