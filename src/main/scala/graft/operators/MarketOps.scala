package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Market-data analytics over the canonical tick view
  * (symbol, ts, price, volume) — the queries a user of the reference TSDB
  * (/root/reference/README.md) runs on top of `query_range` output,
  * expressed as single declarative Spark plans instead of client-side
  * loops over scan results.
  *
  * Scale posture: every operator here is one shuffle or less.
  * Aggregations rely on partial (map-side) aggregation; window functions
  * partition by `symbol` so per-symbol state never crosses tasks; nothing
  * collects to the driver.
  *
  * Oracle parity: double sums are computed over `DECIMAL(18,2)` casts
  * (tick prices are 2-dp) so the sum is exact and engine-independent,
  * then cast back to double; see SURVEY.md §4.
  */
object MarketOps {
  private val dec = DecimalType(18, 2)

  /** Deterministic per-symbol tick order: ts with event_id tiebreak. */
  private def tickOrder = Window.partitionBy("symbol").orderBy(col("ts"), col("event_id"))

  /** OHLC candlesticks per symbol per day.
    * open/close via min_by/max_by on ts — one shuffle, no self-join.
    */
  def ohlcDaily(ticks: DataFrame): DataFrame =
    ticks.groupBy(col("symbol"), to_date(col("ts")).as("day"))
      .agg(
        min_by(col("price"), col("ts")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("ts")).as("close"),
        sum(col("volume")).as("volume"),
        count(lit(1)).as("n_ticks"))
      .orderBy("symbol", "day")

  /** Volume-weighted average price per symbol per day.
    * Exact decimal sums, double division (identical across engines).
    */
  def vwapDaily(ticks: DataFrame): DataFrame =
    ticks.groupBy(col("symbol"), to_date(col("ts")).as("day"))
      .agg(round(
        sum(col("price").cast(dec) * col("volume")).cast("double") /
          sum(col("volume")).cast("double"), 6).as("vwap"))
      .orderBy("symbol", "day")

  /** n-tick simple moving average per symbol. */
  def sma(ticks: DataFrame, n: Int): DataFrame =
    ticks.select(col("event_id"), col("symbol"),
        round(avg(col("price")).over(tickOrder.rowsBetween(-(n - 1), 0)), 4).as(s"sma$n"))
      .orderBy("event_id")

  /** Exponential moving average per symbol (alpha-weighted recursive
    * form, computed as a closed-form weighted window sum: for the k-th
    * tick, EMA = sum_i a*(1-a)^(k-i)*p_i + (1-a)^k*p_0 — here
    * approximated over a bounded lookback window, which is exact to
    * double precision once (1-a)^w underflows).
    */
  def ema(ticks: DataFrame, alpha: Double, lookback: Int = 100): DataFrame = {
    val w = tickOrder.rowsBetween(-lookback, 0)
    // position within window via row_number; weight = a*(1-a)^(last-i)
    val rn = row_number().over(tickOrder)
    val withRn = ticks.withColumn("_rn", rn)
    val pairs = collect_list(struct(col("_rn"), col("price"))).over(w)
    withRn.select(col("event_id"), col("symbol"),
        aggregate(pairs,
          lit(0.0),
          (acc, x) => acc + x.getField("price") *
            lit(alpha) * pow(lit(1.0 - alpha), col("_rn") - x.getField("_rn")))
          .as("ema"))
      .orderBy("event_id")
  }

  /** Downsample to hourly bars (string bucket for oracle-stable typing). */
  def resampleHourly(ticks: DataFrame): DataFrame =
    ticks.groupBy(col("symbol"), date_format(col("ts"), "yyyy-MM-dd HH:00").as("bucket"))
      .agg(
        count(lit(1)).as("n_ticks"),
        round(avg(col("price")), 4).as("avg_price"),
        min(col("price")).as("lo"),
        max(col("price")).as("hi"),
        sum(col("volume")).as("volume"))
      .orderBy("symbol", "bucket")

  /** Top-n ticks by price per symbol (rank with deterministic tiebreak). */
  def topNBySymbol(ticks: DataFrame, n: Int): DataFrame =
    ticks.withColumn("rn",
        row_number().over(Window.partitionBy("symbol")
          .orderBy(col("price").desc, col("event_id"))).cast("long"))
      .filter(col("rn") <= n)
      .select(col("symbol"), col("rn"), col("event_id"), col("price"))
      .orderBy("symbol", "rn")

  /** Tick-over-tick simple returns per symbol. */
  def returns(ticks: DataFrame): DataFrame =
    ticks.withColumn("prev", lag(col("price"), 1).over(tickOrder))
      .filter(col("prev").isNotNull)
      .select(col("event_id"), col("symbol"),
        round(col("price") / col("prev") - 1, 6).as("ret"))
      .orderBy("event_id")

  /** Running (cumulative) volume per symbol — exact integer math. */
  def runningVolume(ticks: DataFrame): DataFrame =
    ticks.select(col("event_id"), col("symbol"),
        sum(col("volume")).over(tickOrder.rowsBetween(Window.unboundedPreceding, 0))
          .as("cum_volume"))
      .orderBy("event_id")

  /** Per-symbol dispersion stats. */
  def volatility(ticks: DataFrame): DataFrame =
    ticks.groupBy(col("symbol"))
      .agg(
        round(stddev_samp(col("price")), 4).as("price_stddev"),
        round(avg(col("price")), 4).as("avg_price"),
        min(col("price")).as("min_price"),
        max(col("price")).as("max_price"),
        count(lit(1)).as("n_ticks"))
      .orderBy("symbol")

  /** Sessionize: new session when gap to previous tick > gapMinutes.
    * Classic lag + cumulative-flag-sum; one sort-shuffle per symbol.
    */
  def sessionize(ticks: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val prevTs = lag(col("ts"), 1).over(tickOrder)
    val newSession = when(prevTs.isNull ||
      unix_micros(col("ts")) - unix_micros(prevTs) > gapUs, 1L).otherwise(0L)
    ticks.withColumn("is_new", newSession)
      .withColumn("session_id",
        sum(col("is_new")).over(tickOrder.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("event_id"), col("symbol"), col("session_id"))
      .orderBy("event_id")
  }
}
