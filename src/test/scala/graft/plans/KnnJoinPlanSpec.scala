package graft.plans

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.pipeline.Similarity

/** The kNN join's cost at 100 TB is dominated by computing LSH
  * signatures + norms over the corpus: that pipeline must run ONCE, with
  * the self-join's second side consuming a ReusedExchange — not a second
  * scan (the round-3 verdict caught exactly that regression). The
  * assertion runs on the EXECUTED AQE plan (collect, broadcast disabled)
  * because static explain doesn't show runtime exchange reuse.
  */
class KnnJoinPlanSpec extends AnyFunSuite {
  import TestSpark._

  test("knnJoin executed plan has one parquet scan and a ReusedExchange") {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val emb = graft.core.Tables.embeddings(spark, sf)
      val df = Similarity.knnJoin(emb, dim = 64, k = 3)
      assert(df.collect().nonEmpty)
      // AQE's toString appends the pre-execution "== Initial Plan ==";
      // only the Final Plan section reflects what actually ran
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val scans = "Scan parquet".r.findAllMatchIn(plan).size
      assert(scans === 1, s"expected ONE corpus scan, got $scans in:\n$plan")
      assert(plan.contains("ReusedExchange"),
        s"self-join must reuse the bucketed exchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("knnJoinI8 executed plan has one parquet scan and a ReusedExchange") {
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val emb = graft.core.Tables.embeddings(spark, sf)
      val df = Similarity.knnJoinI8(emb, dim = 64, k = 3)
      assert(df.collect().nonEmpty)
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val scans = "Scan parquet".r.findAllMatchIn(plan).size
      assert(scans === 1, s"expected ONE corpus scan, got $scans in:\n$plan")
      assert(plan.contains("ReusedExchange"),
        s"self-join must reuse the bucketed+quantized exchange:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }
}
