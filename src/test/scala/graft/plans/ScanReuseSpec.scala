package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.operators.{EventAnalytics, MarketOps}

/** r5 verdict items 5/6: the forward as-of join used to re-scan the
  * quote side for its payload join-back, and the interval-overlap join
  * re-scanned the left side for the zero-fill. Both payloads now ride
  * the main pass, so the EXECUTED plans must contain exactly one scan
  * per join side. The inputs are a private temp-parquet copy so a
  * concurrent suite's .cache() of the shared tables can never
  * substitute InMemoryRelation for the scans being counted.
  */
class ScanReuseSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val eventsPath: String = {
    val p = java.nio.file.Files.createTempDirectory("scan_reuse_").toString
    graft.core.Tables.events(spark, sf).write.parquet(s"$p/events")
    s"$p/events"
  }

  private def scanCount(df: DataFrame): Int = {
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    "Scan parquet".r.findAllMatchIn(plan).size
  }

  test("forward as-of executed plan has one scan per side (no payload re-scan)") {
    val t = spark.read.parquet(eventsPath)
      .select(col("event_id"), col("event_type").as("symbol"), col("ts"),
        col("value").as("price"), col("user_id"))
    val df = MarketOps.forwardAsofJoin(
      t.filter(col("symbol") === "purchase"),
      t.filter(col("symbol") === "click"))
    assert(scanCount(df) === 2)
  }

  test("interval join executed plan has one scan per side (no zero-fill re-scan)") {
    val df = EventAnalytics.intervalOverlap(spark.read.parquet(eventsPath))
    assert(scanCount(df) === 2)
  }
}
