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

  test("calendar heatmap: cells partition the event log, axes in range") {
    val hm = EventAnalytics.calendarHeatmap(events).cache()
    assert(hm.agg(sum("n_events")).collect()(0).getLong(0) === events.count())
    assert(hm.filter(col("dow") < 0 || col("dow") > 6 ||
      col("hod") < 0 || col("hod") > 23).count() === 0)
    hm.unpersist()
  }

  test("islands: run lengths conserve the event count") {
    val is = EventAnalytics.islands(events)
    val total = is.agg(sum(col("run_len") * col("n_runs"))).collect()(0).getLong(0)
    assert(total === events.count())
  }

  test("islands: alternating and repeated types produce the right runs") {
    import spark.implicits._
    // u1: A A B A  -> runs A:2, B:1, A:1 ; u2: B B B -> runs B:3
    val e = Seq(
      (1L, 1L, "A", 10L), (2L, 1L, "A", 20L), (3L, 1L, "B", 30L),
      (4L, 1L, "A", 40L),
      (5L, 2L, "B", 10L), (6L, 2L, "B", 20L), (7L, 2L, "B", 30L))
      .toDF("event_id", "user_id", "event_type", "us")
      .withColumn("ts", timestamp_micros(col("us"))).withColumn("value", lit(1.0))
    val got = EventAnalytics.islands(e).collect()
      .map(r => (r.getAs[String]("symbol"), r.getAs[Long]("run_len")) ->
        r.getAs[Long]("n_runs")).toMap
    assert(got === Map(("A", 1L) -> 1L, ("A", 2L) -> 1L,
      ("B", 1L) -> 1L, ("B", 3L) -> 1L))
  }

  test("concurrency: known overlapping intervals peak correctly") {
    import spark.implicits._
    // value-cents = duration seconds: value 1.00 -> 100 s.
    // X: [0,100], [50,150], [200,300] -> peak 2 first reached at t=50s
    val e = Seq(
      (1L, 1L, "X", 0L, 1.00), (2L, 2L, "X", 50000000L, 1.00),
      (3L, 3L, "X", 200000000L, 1.00))
      .toDF("event_id", "user_id", "event_type", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = EventAnalytics.concurrency(e).collect()(0)
    assert(r.getAs[Long]("peak_concurrent") === 2L)
    assert(r.getAs[Long]("peak_at_us") === 50000000L)
    assert(r.getAs[Long]("n_intervals") === 3L)
  }

  test("interval overlap: bucketed rewrite matches hand-computed counts") {
    import spark.implicits._
    // value 1.00 -> 100 s intervals. user 1:
    //   error e1 [0,100] overlaps clicks c1 [50,150] and c2 [100,200]
    //   (closed-interval touch), error e2 [400,500] overlaps none;
    // user 2: error e3 [0,100], same-window click belongs to user 1 only
    val e = Seq(
      (1L, 1L, "error", 0L, 1.00), (2L, 1L, "error", 400000000L, 1.00),
      (3L, 2L, "error", 0L, 1.00),
      (10L, 1L, "click", 50000000L, 1.00), (11L, 1L, "click", 100000000L, 1.00),
      (12L, 1L, "click", 300000000L, 0.50))
      .toDF("event_id", "user_id", "event_type", "us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val got = EventAnalytics.intervalOverlap(e).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_overlap")).toMap
    assert(got === Map(1L -> 2L, 2L -> 0L, 3L -> 0L))
  }

  test("concurrency: peak is at least 1 and intervals conserve counts") {
    val c = EventAnalytics.concurrency(events).cache()
    assert(c.filter(col("peak_concurrent") < 1).count() === 0)
    assert(c.agg(sum("n_intervals")).collect()(0).getLong(0) === events.count())
    c.unpersist()
  }
}
