package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class TimestampPushdownSpec extends AnyFunSuite {
  import TestSpark._

  private def viewScan = {
    GraftOptimizations.install(spark)
    Tables.events(spark, sf)
      .filter(col("event_type") === "click" &&
        col("ts") >= lit(java.sql.Timestamp.valueOf("2024-01-05 00:00:00")) &&
        col("ts") <= lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00")))
  }

  test("rule pushes tz-cast timestamp bounds to the stored NTZ column") {
    val plan = viewScan.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val pushed = "PushedFilters: \\[([^\\]]*)\\]".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(pushed.contains("GreaterThanOrEqual(ts,"), pushed)
    assert(pushed.contains("LessThanOrEqual(ts,"), pushed)
  }

  test("rewritten scan returns exactly the hand-written raw-filter rows") {
    val lo = java.time.LocalDateTime.of(2024, 1, 5, 0, 0, 0)
    val hi = java.time.LocalDateTime.of(2024, 1, 15, 0, 0, 0)
    val raw = Tables.eventsRaw(spark, sf)
      .filter(col("event_type") === "click" &&
        col("ts") >= lit(lo) && col("ts") <= lit(hi))
    assert(viewScan.count() === raw.count())
  }

  test("tz-cast rewrite: comparison moves to the NTZ column, same µs value") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val a = AttributeReference("ts", TimestampNTZType)()
    val cond = GreaterThanOrEqual(
      Cast(a, TimestampType, Some("UTC")),
      Literal(5000L, TimestampType))
    val plan = org.apache.spark.sql.catalyst.plans.logical.Filter(cond,
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation(a))
    val out = TimestampFilterPushdown(plan)
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter].condition
    assert(out === GreaterThanOrEqual(a, Literal(5000L, TimestampNTZType)))
  }

  test("non-UTC cast zones are left untouched (wall mapping not injective)") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val a = AttributeReference("ts", TimestampNTZType)()
    val cond = GreaterThanOrEqual(
      Cast(a, TimestampType, Some("America/New_York")),
      Literal(5000L, TimestampType))
    val plan = org.apache.spark.sql.catalyst.plans.logical.Filter(cond,
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation(a))
    val out = TimestampFilterPushdown(plan)
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter].condition
    assert(out === cond)
  }

  test("boundary semantics: <= T admits raw ns values up to T·1000+999") {
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val a = AttributeReference("ns", LongType)()
    val cond = LessThanOrEqual(
      MicrosToTimestamp(IntegralDivide(a, Literal(1000L, LongType))),
      Literal(5000L, TimestampType))
    val plan = org.apache.spark.sql.catalyst.plans.logical.Filter(cond,
      org.apache.spark.sql.catalyst.plans.logical.LocalRelation(a))
    val out = TimestampFilterPushdown(plan)
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Filter].condition
    assert(out === LessThanOrEqual(a, Literal(5000999L, LongType)))
  }
}
