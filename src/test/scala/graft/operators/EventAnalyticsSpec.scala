package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class EventAnalyticsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val events = Tables.events(spark, sf).cache()

  test("funnel stages are monotonically non-increasing") {
    val r = EventAnalytics.funnel(events).collect()(0)
    val (v, c, p) = (r.getAs[Long]("n_view"), r.getAs[Long]("n_click"),
      r.getAs[Long]("n_purchase"))
    assert(v >= c && c >= p, s"$v >= $c >= $p")
    assert(p > 0, "sf0.001 should convert at least one user end-to-end")
  }

  test("funnel stage semantics: ordered-first-event, not mere presence") {
    import spark.implicits._
    val e = Seq(
      // u1 converts in order; u2 clicked BEFORE first view (no credit);
      // u3 views only
      (1L, 1L, "view", 10L), (2L, 1L, "click", 20L), (3L, 1L, "purchase", 30L),
      (4L, 2L, "click", 10L), (5L, 2L, "view", 20L),
      (6L, 3L, "view", 10L))
      .toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us"))).withColumn("value", lit(1.0))
    val r = EventAnalytics.funnel(e).collect()(0)
    assert(r.getAs[Long]("n_view") === 3)
    assert(r.getAs[Long]("n_click") === 1)
    assert(r.getAs[Long]("n_purchase") === 1)
  }

  test("retention: offset-0 users per cohort equal the cohort size") {
    val ret = EventAnalytics.retention(events, 7).cache()
    val cohortSizes = events.select(col("user_id"), to_date(col("ts")).as("day"))
      .groupBy("user_id").agg(min("day").as("cohort_day"))
      .groupBy("cohort_day").count()
    val off0 = ret.filter(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_users"))
    val bad = off0.join(cohortSizes, "cohort_day")
      .filter(col("n_users") =!= col("count")).count()
    assert(bad === 0)
    assert(ret.filter(col("day_offset") < 0 || col("day_offset") > 7).count() === 0)
    ret.unpersist()
  }
}
