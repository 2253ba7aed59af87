package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class MarketOpsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val ticks = Tables.ticks(spark, sf).cache()

  test("ohlc: high >= max(open, close) >= min(open, close) >= low") {
    val bad = MarketOps.ohlcDaily(ticks)
      .filter(col("high") < col("open") || col("high") < col("close") ||
        col("low") > col("open") || col("low") > col("close"))
      .count()
    assert(bad === 0)
  }

  test("vwap lies within [low, high] of the same bucket") {
    val ohlc = MarketOps.ohlcDaily(ticks).select(col("symbol"), col("day"), col("low"), col("high"))
    val bad = MarketOps.vwapDaily(ticks).join(ohlc, Seq("symbol", "day"))
      .filter(col("vwap") < col("low") || col("vwap") > col("high"))
      .count()
    assert(bad === 0)
  }

  test("sma20 stays within global min/max price per symbol") {
    val mm = ticks.groupBy("symbol").agg(min("price").as("mn"), max("price").as("mx"))
    val bad = MarketOps.sma(ticks, 20)
      .join(mm, "symbol")
      .filter(col("sma20") < col("mn") || col("sma20") > col("mx"))
      .count()
    assert(bad === 0)
  }

  test("running volume is non-decreasing per symbol in tick order") {
    // cum_volume aligned back to ticks; lag over same order must never decrease
    val rv = MarketOps.runningVolume(ticks)
      .join(ticks.select("event_id", "ts"), "event_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("symbol").orderBy(col("ts"), col("event_id"))
    val bad = rv.withColumn("prev", lag("cum_volume", 1).over(w))
      .filter(col("prev").isNotNull && col("cum_volume") < col("prev"))
      .count()
    assert(bad === 0)
  }

  test("sessionize produces positive, bounded session ids") {
    val s = MarketOps.sessionize(ticks, 30)
    assert(s.filter(col("session_id") < 1).count() === 0)
    assert(s.count() === ticks.count())
  }

  test("returns only for ticks with a predecessor") {
    val nSymbols = ticks.select("symbol").distinct().count()
    assert(MarketOps.returns(ticks).count() === ticks.count() - nSymbols)
  }

  test("ema tracks price scale") {
    val e = MarketOps.ema(ticks.filter(col("symbol") === "click"), alpha = 0.2)
    val mm = ticks.filter(col("symbol") === "click")
      .agg(min("price"), max("price")).head()
    val bad = e.filter(col("ema") < lit(0.0) || col("ema") > lit(mm.getDouble(1) * 1.01)).count()
    assert(bad === 0)
  }
}
