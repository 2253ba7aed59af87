package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The point of bucketed tables is the plan, not just the answer: both
  * sides pre-hashed on the join key means the join itself must contain
  * NO shuffle. This spec writes two bucketed tables and asserts the
  * executed join plan has no Exchange below the SortMergeJoin.
  */
class BucketedJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed fact-fact join plans without a shuffle") {
    val base = java.nio.file.Files.createTempDirectory("bucketed_spec_").toString
    graft.core.Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$base/li").mode("overwrite").saveAsTable("spec_li_b")
    graft.core.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$base/ord").mode("overwrite").saveAsTable("spec_ord_b")
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("spec_li_b")
        .join(spark.table("spec_ord_b"), col("l_orderkey") === col("o_orderkey"))
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a join in:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }
}
