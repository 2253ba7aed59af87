package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Adversarial data shapes for the chunked scaffolds — the sf tables
  * are dense and well-behaved, so this spec feeds the shapes that
  * break naive day-boundary logic: symbols with a single tick, 1-row
  * days, multi-day gaps between active days, ticks exactly on midnight
  * boundaries, duplicate (symbol, ts) pairs (event_id tiebreak), flat
  * tapes, and negative prices. Every chunked operator must equal its
  * monolithic-window formulation EXACTLY on all of them.
  */
class ChunkedEdgeSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  /** (event_id, symbol, ts, price, volume) */
  private lazy val edge: DataFrame = Seq(
    // A: single tick, lonely symbol
    (1L, "A", ts("2024-01-05 10:00:00"), 10.0, 5L),
    // B: 1-row day, then a 3-day gap, then a dense day with dup ts
    (2L, "B", ts("2024-01-01 23:59:59.999999"), 5.0, 1L),
    (3L, "B", ts("2024-01-05 00:00:00"), 6.0, 2L),      // exact midnight
    (4L, "B", ts("2024-01-05 00:00:00"), 4.0, 3L),      // dup ts, tiebreak
    (5L, "B", ts("2024-01-05 00:30:00"), 6.5, 4L),      // inside 1h of midnight
    (6L, "B", ts("2024-01-05 23:30:00"), 7.0, 5L),      // last hour (carry)
    (7L, "B", ts("2024-01-06 00:15:00"), 3.0, 6L),      // frame reaches prior day
    // C: flat tape across a boundary (zero changes everywhere)
    (8L, "C", ts("2024-02-01 12:00:00"), 2.0, 7L),
    (9L, "C", ts("2024-02-01 12:01:00"), 2.0, 8L),
    (10L, "C", ts("2024-02-02 12:00:00"), 2.0, 9L),
    // D: negative and zero prices over 1-row days
    (11L, "D", ts("2024-03-01 01:00:00"), -1.5, 10L),
    (12L, "D", ts("2024-03-02 01:00:00"), 0.0, 11L),
    (13L, "D", ts("2024-03-03 01:00:00"), -2.5, 12L)
  ).toDF("event_id", "symbol", "ts", "price", "volume")

  private def tickOrder =
    Window.partitionBy("symbol").orderBy(col("ts"), col("event_id"))

  private def same(chunked: DataFrame, naive: DataFrame): Unit = {
    val a = chunked.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = naive.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.length === b.length, s"row counts ${a.length} vs ${b.length}")
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("runningVolume / drawdown / lateArrivals on adversarial shapes") {
    same(MarketOps.runningVolume(edge),
      edge.select(col("event_id"), col("symbol"),
        sum(col("volume")).over(tickOrder.rowsBetween(Window.unboundedPreceding, 0))
          .as("cum_volume")))
    val runMax =
      max(col("price")).over(tickOrder.rowsBetween(Window.unboundedPreceding, 0))
    same(MarketOps.drawdown(edge),
      edge.select(col("event_id"), col("symbol"), col("price"), runMax.as("run_max"))
        .withColumn("drawdown",
          when(col("run_max") > 0.0, col("price") / col("run_max") - 1.0)
            .otherwise(0.0))
        .select(col("event_id"), col("symbol"), col("drawdown")))
    val arrival = Window.partitionBy("symbol").orderBy("event_id")
    val maxPrior = max(unix_micros(col("ts")))
      .over(arrival.rowsBetween(Window.unboundedPreceding, -1))
    same(MarketOps.lateArrivals(edge, chunkRows = 3L),
      edge.withColumn("late_us",
          when(maxPrior.isNotNull && unix_micros(col("ts")) < maxPrior,
            maxPrior - unix_micros(col("ts"))).otherwise(0L))
        .groupBy(col("symbol"))
        .agg(count(lit(1)).as("n_ticks"),
          sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_late"),
          max(col("late_us")).as("max_late_us"),
          sum(col("late_us")).as("sum_late_us")))
  }

  test("chunked lag ops (returns/obv/sessionize/gapStats) on adversarial shapes") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    same(MarketOps.returns(edge),
      edge.withColumn("prev", lag(col("price"), 1).over(tickOrder))
        .filter(col("prev").isNotNull && col("prev") =!= 0.0)
        .select(col("event_id"), col("symbol"),
          (col("price") / col("prev") - 1).as("ret")))
    val chg = col("price").cast(dec) - lag(col("price"), 1).over(tickOrder).cast(dec)
    same(MarketOps.obv(edge),
      edge.withColumn("chg", chg)
        .select(col("event_id"), col("symbol"),
          sum(when(col("chg") > 0, col("volume"))
              .when(col("chg") < 0, -col("volume")).otherwise(lit(0L)))
            .over(tickOrder.rowsBetween(Window.unboundedPreceding, 0)).as("obv")))
    val gapUs = 30 * 60L * 1000000L
    val prevTs = lag(col("ts"), 1).over(tickOrder)
    same(MarketOps.sessionize(edge, 30),
      edge.withColumn("is_new", when(prevTs.isNull ||
          unix_micros(col("ts")) - unix_micros(prevTs) > gapUs, 1L).otherwise(0L))
        .withColumn("session_id",
          sum(col("is_new")).over(tickOrder.rowsBetween(Window.unboundedPreceding, 0)))
        .select(col("event_id"), col("symbol"), col("session_id")))
    val g = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(tickOrder))
    same(MarketOps.gapStats(edge),
      edge.withColumn("gap_us", g).filter(col("gap_us").isNotNull)
        .groupBy(col("symbol"))
        .agg(count(lit(1)).as("n_gaps"), max(col("gap_us")).as("max_gap_us"),
          round(sum(col("gap_us")).cast("double") /
            count(lit(1)).cast("double"), 4).as("avg_gap_us"),
          sum(when(col("gap_us") > 60 * 1000000L, 1L).otherwise(0L)).as("n_stale")))
  }

  test("chunkedFrame ops (sma/rsi/rollSpread/ordinal) on adversarial shapes") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    // chunkRows=3: every symbol except A spans multiple chunks
    val w = tickOrder.rowsBetween(-1, 0)
    same(MarketOps.sma(edge, 2, chunkRows = 3L),
      edge.select(col("event_id"), col("symbol"),
        (sum(col("price").cast(dec)).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as("sma2")))
    // r12b vwma: chunked invertible sums vs the monolithic window +
    // inline quant6 (exact decimal products, zero-volume guard)
    val d18 = org.apache.spark.sql.types.DecimalType(18, 0)
    val d76 = org.apache.spark.sql.types.DecimalType(7, 6)
    val d186 = org.apache.spark.sql.types.DecimalType(18, 6)
    val pvS = sum(col("price").cast(dec) * col("volume").cast(d18)).over(w)
    val vS = sum(col("volume")).over(w)
    val vr = pvS.cast("double") / vS.cast("double") * 1000000.0
    val vq = when(vr >= 0, floor(vr + 0.5)).otherwise(ceil(vr - 0.5))
    same(MarketOps.vwma(edge, 2, chunkRows = 3L),
      edge.select(col("event_id"), col("symbol"),
        when(vS =!= 0,
          (vq.cast("long").cast(d18) *
            lit(new java.math.BigDecimal("0.000001")).cast(d76))
            .cast(d186).cast("double")).as("vwma2")))
    val chg = col("price").cast(dec) - lag(col("price"), 1).over(tickOrder).cast(dec)
    val w14 = tickOrder.rowsBetween(-1, 0)
    same(MarketOps.rsi(edge, 2, chunkRows = 3L),
      edge.withColumn("chg", chg)
        .withColumn("gain", when(col("chg") > 0, col("chg")).otherwise(lit(0).cast(dec)))
        .withColumn("loss", when(col("chg") < 0, -col("chg")).otherwise(lit(0).cast(dec)))
        .select(col("event_id"), col("symbol"),
          when(sum(col("loss")).over(w14) === 0, lit(100.0))
            .otherwise(round(lit(100.0) - lit(100.0) /
              (lit(1.0) + sum(col("gain")).over(w14).cast("double") /
                sum(col("loss")).over(w14).cast("double")), 4)).as("rsi2")))
    val pd = col("price").cast(dec)
    val withD = edge
      .withColumn("d", pd - lag(pd, 1).over(tickOrder))
      .withColumn("dl", lag(col("d"), 1).over(tickOrder))
      .filter(col("d").isNotNull && col("dl").isNotNull)
    val m = withD.groupBy(col("symbol")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("d")).cast("double").as("sx"),
      sum(col("dl")).cast("double").as("sy"),
      sum(col("d") * col("dl")).cast("double").as("sxy"))
    val nd = col("n_pairs").cast("double")
    val cov = when(nd > 1.0,
      (col("sxy") - col("sx") * col("sy") / nd) / (nd - 1.0))
    same(MarketOps.rollSpread(edge, chunkRows = 3L),
      m.select(col("symbol"), col("n_pairs"), round(cov, 6).as("serial_cov"),
        when(cov < 0.0, round(sqrt(-cov) * 2.0, 6)).otherwise(0.0).as("roll_spread")))
    // r9b chunked ops vs monolithic windows
    val wr2 = tickOrder.rowsBetween(-1, 0)
    val hh = max(col("price").cast(dec)).over(wr2)
    val ll = min(col("price").cast(dec)).over(wr2)
    same(MarketOps.williamsR(edge, 2, chunkRows = 3L),
      edge.select(col("event_id"), col("symbol"),
        when(hh > ll, lit(-100.0) * (hh - col("price").cast(dec)).cast("double") /
          (hh - ll).cast("double")).as("wr2")))
    // r11 deque rework: donchian/stochastic must still equal the
    // monolithic decimal-window formulation bit for bit
    same(MarketOps.donchian(edge, 2, chunkRows = 3L),
      edge.select(col("event_id"), col("symbol"),
        hh.cast("double").as("upper_ch"), ll.cast("double").as("lower_ch"),
        ((hh + ll).cast("double") / 2.0).as("mid_ch")))
    val pk = when(hh > ll,
      lit(100.0) * (col("price").cast(dec) - ll).cast("double") /
        (hh - ll).cast("double"))
    same(MarketOps.stochastic(edge, 2, chunkRows = 4L), // carry n+1=3 < chunkRows
      edge.select(col("event_id"), col("symbol"), col("ts"), pk.as("pct_k"))
        .select(col("event_id"), col("symbol"), col("pct_k"),
          ((col("pct_k") + lag(col("pct_k"), 1).over(tickOrder)
            + lag(col("pct_k"), 2).over(tickOrder)) / 3.0).as("pct_d")))
    val p1 = lag(col("price"), 1).over(tickOrder)
    same(MarketOps.roc(edge, 1, chunkRows = 3L),
      edge.select(col("event_id"), col("symbol"),
        when(p1.isNotNull && p1 =!= 0.0,
          (col("price").cast(dec) - p1.cast(dec)).cast("double") /
            p1.cast(dec).cast("double") * 100.0).as("roc1")))
    def sgn(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      when(x > y, 2L).when(x < y, 0L).otherwise(1L)
    same(MarketOps.ordinalPatterns(edge, chunkRows = 3L),
      edge.select(col("symbol"),
          lag(pd, 2).over(tickOrder).as("a"), lag(pd, 1).over(tickOrder).as("b"),
          pd.as("c"))
        .filter(col("a").isNotNull)
        .withColumn("pattern",
          sgn(col("b"), col("a")) * 9 + sgn(col("c"), col("b")) * 3 +
            sgn(col("c"), col("a")))
        .groupBy(col("symbol"), col("pattern"))
        .agg(count(lit(1)).as("n")))
  }

  test("every single-table market operator survives the adversarial shapes") {
    // rollSpread's unguarded (n−1) division ANSI-threw on single-pair
    // symbols — this smoke sweep makes every operator prove it runs on
    // 1-tick symbols, 1-row days, flat tapes, and negative prices
    val ops: Seq[(String, DataFrame => DataFrame)] = Seq(
      "ohlcDaily" -> (MarketOps.ohlcDaily(_)),
      "vwapDaily" -> (MarketOps.vwapDaily(_)),
      "ema" -> (MarketOps.ema(_, 0.2)),
      "macd" -> (MarketOps.macd(_)),
      "heikinAshi" -> (MarketOps.heikinAshi(_)),
      "kama" -> (MarketOps.kama(_, 10)),
      "resampleHourly" -> (MarketOps.resampleHourly(_)),
      "topNBySymbol" -> (MarketOps.topNBySymbol(_, 3)),
      "volatility" -> (MarketOps.volatility(_)),
      "rsi" -> (MarketOps.rsi(_)),
      "bollinger" -> (MarketOps.bollinger(_)),
      "obv" -> (MarketOps.obv(_)),
      "zscoreOutliers" -> (MarketOps.zscoreOutliers(_)),
      "priceHistogram" -> (MarketOps.priceHistogram(_)),
      "twapDaily" -> (MarketOps.twapDaily(_)),
      "volumeBars" -> (MarketOps.volumeBars(_, 10L)),
      "vpin" -> (MarketOps.vpin(_, 10L)),
      "ordinalPatterns" -> (MarketOps.ordinalPatterns(_)),
      "drawdown" -> (MarketOps.drawdown(_)),
      "hoppingBars" -> (MarketOps.hoppingBars(_)),
      "rollingHourlyAvg" -> (MarketOps.rollingHourlyAvg(_)),
      "stochastic" -> (MarketOps.stochastic(_)),
      "donchian" -> (MarketOps.donchian(_)),
      "atr" -> (MarketOps.atr(_)),
      "candlePatterns" -> (MarketOps.candlePatterns(_)),
      "downsample" -> (MarketOps.downsample(_, 10)),
      "gapStats" -> (MarketOps.gapStats(_)),
      "rollSpread" -> (MarketOps.rollSpread(_)),
      "amihud" -> (MarketOps.amihud(_)),
      "priceImpact" -> (MarketOps.priceImpact(_)),
      "saxWords" -> (MarketOps.saxWords(_)),
      "trend" -> (MarketOps.trend(_)),
      "seasonality" -> (MarketOps.seasonality(_)),
      "lateArrivals" -> (MarketOps.lateArrivals(_)),
      "symbolCatalog" -> (MarketOps.symbolCatalog(_)),
      "barCascade" -> (MarketOps.barCascade(_)),
      "ofi" -> (MarketOps.ofi(_)),
      "realizedVol" -> (MarketOps.realizedVol(_)),
      "madOutliers" -> (MarketOps.madOutliers(_)),
      "madOutliersApprox" -> (MarketOps.madOutliersApprox(_)),
      "sessionize" -> (MarketOps.sessionize(_, 30)),
      "returns" -> (MarketOps.returns(_)),
      "runningVolume" -> (MarketOps.runningVolume(_)),
      "sma" -> (MarketOps.sma(_, 20)),
      "overnightGaps" -> (MarketOps.overnightGaps(_)),
      "volumeProfile" -> (MarketOps.volumeProfile(_)),
      "pivotPoints" -> (MarketOps.pivotPoints(_)),
      "cusumEvents" -> (MarketOps.cusumEvents(_, 1.0)),
      "dollarBars" -> (MarketOps.dollarBars(_, 100L)),
      "higherMoments" -> (MarketOps.higherMoments(_)),
      "staleRuns" -> (MarketOps.staleRuns(_)),
      "intradayVolCurve" -> (MarketOps.intradayVolCurve(_)),
      "sizeHistogram" -> (MarketOps.sizeHistogram(_)),
      "mfi" -> (MarketOps.mfi(_)),
      "cmf" -> (MarketOps.cmf(_)),
      "cci" -> (MarketOps.cci(_)),
      "ulcerIndex" -> (MarketOps.ulcerIndex(_)),
      "varianceRatio" -> (MarketOps.varianceRatio(_)),
      "ichimoku" -> (MarketOps.ichimoku(_)),
      "williamsR" -> (MarketOps.williamsR(_)),
      "roc" -> (MarketOps.roc(_)),
      "streaks" -> (MarketOps.streaks(_)),
      "underwater" -> (MarketOps.underwater(_)),
      "dowReturns" -> (MarketOps.dowReturns(_)),
      "drawdownEpisodes" -> (MarketOps.drawdownEpisodes(_)),
      "marketIndex" -> (MarketOps.marketIndex(_)),
      "abnormalVolume" -> (MarketOps.abnormalVolume(_)),
      "volumeCurve" -> (MarketOps.volumeCurve(_)),
      "momentumQuartiles" -> (MarketOps.momentumQuartiles(_)),
      "turnoverRank" -> (MarketOps.turnoverRank(_)),
      "rangeVol" -> (MarketOps.rangeVol(_)),
      "ppo" -> (MarketOps.ppo(_)),
      "dpo" -> (MarketOps.dpo(_)),
      "balanceOfPower" -> (MarketOps.balanceOfPower(_)),
      "ultimateOsc" -> (MarketOps.ultimateOsc(_)),
      "hullMa" -> (MarketOps.hullMa(_)),
      "kst" -> (MarketOps.kst(_)),
      "breadth" -> (MarketOps.breadth(_)),
      "mcclellan" -> (MarketOps.mcclellan(_)),
      "corwinSchultz" -> (MarketOps.corwinSchultz(_)),
      "renko" -> (MarketOps.renko(_)),
      "zigzag" -> (MarketOps.zigzag(_)),
      "vwma" -> (MarketOps.vwma(_)),
      "awesomeOsc" -> (MarketOps.awesomeOsc(_)),
      "spearmanMatrix" -> (MarketOps.spearmanMatrix(_)),
      "tsi" -> (MarketOps.tsi(_)),
      "anchoredVwap" -> (MarketOps.anchoredVwap(_)),
      "omegaRatio" -> (MarketOps.omegaRatio(_)),
      "informationRatio" -> (MarketOps.informationRatio(_)),
      "signAutocorr" -> (MarketOps.signAutocorr(_)),
      "candleAnatomy" -> (MarketOps.candleAnatomy(_)),
      "qstick" -> (MarketOps.qstick(_)),
      "cog" -> (MarketOps.cog(_)),
      "envelope" -> (MarketOps.envelope(_)),
      "imi" -> (MarketOps.imi(_)),
      "psy" -> (MarketOps.psy(_)),
      "disparity" -> (MarketOps.disparity(_)),
      "alma" -> (MarketOps.alma(_)),
      "camarilla" -> (MarketOps.camarilla(_)),
      "mcginley" -> (MarketOps.mcginley(_)),
      "fisher" -> (MarketOps.fisher(_)),
      "varCvar" -> (MarketOps.varCvar(_)),
      "highLowCensus" -> (MarketOps.highLowCensus(_)))
    ops.foreach { case (name, op) =>
      try op(edge).collect()
      catch { case e: Throwable =>
        fail(s"$name threw on the adversarial fixture: ${e.getMessage.take(300)}")
      }
    }
  }

  test("event analytics ops survive the adversarial shapes") {
    val ev = edge.select(col("event_id"), col("ts"),
      col("volume").as("user_id"), col("symbol").as("event_type"),
      col("price").as("value"), lit("").as("props"))
    Seq[(String, DataFrame)](
      "funnel" -> EventAnalytics.funnel(ev),
      "retention" -> EventAnalytics.retention(ev),
      "calendarHeatmap" -> EventAnalytics.calendarHeatmap(ev),
      "islands" -> EventAnalytics.islands(ev),
      "intervalOverlap(empty sides)" -> EventAnalytics.intervalOverlap(ev),
      "intervalOverlap(A,B)" -> EventAnalytics.intervalOverlap(ev, "A", "B"),
      "concurrency" -> EventAnalytics.concurrency(ev),
      "transitions" -> EventAnalytics.transitions(ev),
      "rfm" -> EventAnalytics.rfm(ev),
      "attribution" -> EventAnalytics.attribution(ev),
      "topPaths" -> EventAnalytics.topPaths(ev),
      "activeUsers" -> EventAnalytics.activeUsers(ev),
      "entryExit" -> EventAnalytics.entryExit(ev),
      "markovStationary" -> EventAnalytics.markovStationary(ev),
      "sessionCooccurrence" -> EventAnalytics.sessionCooccurrence(ev),
      "stickiness" -> EventAnalytics.stickiness(ev),
      "attributionUShape" -> EventAnalytics.attributionUShape(ev),
      "lifespanHist" -> EventAnalytics.lifespanHist(ev)
    ).foreach { case (name, df) =>
      try df.collect()
      catch { case e: Throwable =>
        fail(s"$name threw on the adversarial fixture: ${e.getMessage.take(300)}")
      }
    }
  }

  test("ohlc-family open/close ties resolve by the (epoch_us, event_id) key") {
    // two ticks share (symbol, ts): bare min_by/max_by(price, ts) could
    // return either — the tieKey must pick the lowest/highest event_id.
    // For the recursive heikinAshi a wrong day-1 pick would poison every
    // later bar, so this is the regression fixture for the r6 ADVICE.
    val t0 = ts("2024-01-02 10:00:00")
    val tied = Seq(
      (1L, "T", t0, 10.0, 1L),
      (2L, "T", t0, 20.0, 1L),
      (3L, "T", ts("2024-01-02 18:00:00"), 15.0, 1L),
      (4L, "T", ts("2024-01-02 18:00:00"), 25.0, 1L)
    ).toDF("event_id", "symbol", "ts", "price", "volume")
    val bar = MarketOps.ohlcDaily(tied).collect().head
    assert(bar.getAs[Double]("open") === 10.0)   // event_id 1, not 2
    assert(bar.getAs[Double]("close") === 25.0)  // event_id 4, not 3
    val ha = MarketOps.heikinAshi(tied).collect().head
    assert(ha.getAs[Double]("ha_open") === (10.0 + 25.0) / 2.0)
    assert(ha.getAs[Double]("ha_close") === (10.0 + 25.0 + 10.0 + 25.0) / 4.0)
    val vb = MarketOps.volumeBars(tied, 100L).collect().head
    assert(vb.getAs[Double]("open") === 10.0 && vb.getAs[Double]("close") === 25.0)
  }

  test("rollingHourlyAvg midnight-boundary carries on adversarial shapes") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val w = Window.partitionBy("symbol").orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, 0)
    same(MarketOps.rollingHourlyAvg(edge),
      edge.select(col("event_id"), col("symbol"),
          unix_micros(col("ts")).as("ts_us"), col("price"))
        .select(col("event_id"), col("symbol"),
          (sum(col("price").cast(dec)).over(w).cast("double") /
            count(lit(1)).over(w).cast("double")).as("avg_1h")))
  }
}
