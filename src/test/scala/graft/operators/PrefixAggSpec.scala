package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The chunked prefix aggregation (MarketOps "distributed prefix
  * aggregation" section) must (a) return BIT-IDENTICAL results to the
  * naive single-window plan it replaces — integer sums are exact and MAX
  * is order-free, so nothing may drift — and (b) actually partition the
  * detail-side window by (symbol, chunk key), not by symbol alone:
  * partitioning is the point, it bounds any task's input to one
  * symbol-day instead of one symbol's entire 100 TB history.
  */
class PrefixAggSpec extends AnyFunSuite {
  import TestSpark._

  private def ticks = graft.core.Tables.ticks(spark, sf)
  private def tickOrder =
    Window.partitionBy("symbol").orderBy(col("ts"), col("event_id"))

  /** Rows of both frames compared as sorted seqs (exact equality —
    * doubles must be bit-identical, that's the contract).
    */
  private def assertSame(chunked: DataFrame, naive: DataFrame): Unit = {
    val a = chunked.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = naive.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  /** Every unbounded-frame Window in the plan must partition by ≥2
    * columns (symbol + chunk key). Bounded detail windows don't appear
    * in these five operators; the per-day offsets window partitions by
    * symbol alone but runs over the tiny totals table — identified (and
    * excused) by its input being an Aggregate.
    */
  private def detailWindowsArePartitionedByChunk(df: DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, Filter, LogicalPlan, Project, ResolvedHint, SubqueryAlias,
      Window => LWindow}
    // the offsets window sits DIRECTLY over the per-day totals Aggregate
    // (modulo projections) — that one may partition by symbol alone
    def sitsOverAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate     => true
      case pr: Project      => sitsOverAggregate(pr.child)
      case f: Filter        => sitsOverAggregate(f.child)
      case w: LWindow       => sitsOverAggregate(w.child)
      case a: SubqueryAlias => sitsOverAggregate(a.child)
      case h: ResolvedHint  => sitsOverAggregate(h.child)
      case _                => false
    }
    // the ANALYZED plan: partitionSpec is fixed at analysis, and — unlike
    // optimizedPlan — no cache substitution can swallow the Window nodes
    // when a concurrently-running suite has .cache()'d the same plan
    val windows = df.queryExecution.analyzed.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected Window operators in the plan")
    val detail = windows.filterNot(w => sitsOverAggregate(w.child))
    assert(detail.nonEmpty, "expected a detail-side Window over the tick scan")
    detail.foreach { w =>
      assert(w.partitionSpec.size >= 2,
        s"detail window must partition by (symbol, chunk), got ${w.partitionSpec}")
    }
  }

  test("runningVolume matches the single-window plan bit-for-bit") {
    val naive = ticks.select(col("event_id"), col("symbol"),
      sum(col("volume")).over(tickOrder.rowsBetween(Window.unboundedPreceding, 0))
        .as("cum_volume"))
    assertSame(MarketOps.runningVolume(ticks), naive)
    detailWindowsArePartitionedByChunk(MarketOps.runningVolume(ticks))
  }

  test("obv matches the single-window plan bit-for-bit") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val chg = col("price").cast(dec) - lag(col("price"), 1).over(tickOrder).cast(dec)
    val naive = ticks.withColumn("chg", chg)
      .select(col("event_id"), col("symbol"),
        sum(when(col("chg") > 0, col("volume"))
            .when(col("chg") < 0, -col("volume"))
            .otherwise(lit(0L)))
          .over(tickOrder.rowsBetween(Window.unboundedPreceding, 0))
          .as("obv"))
    assertSame(MarketOps.obv(ticks), naive)
    detailWindowsArePartitionedByChunk(MarketOps.obv(ticks))
  }

  test("drawdown matches the single-window plan bit-for-bit") {
    val runMax =
      max(col("price")).over(tickOrder.rowsBetween(Window.unboundedPreceding, 0))
    val naive = ticks
      .select(col("event_id"), col("symbol"), col("price"), runMax.as("run_max"))
      .withColumn("drawdown",
        when(col("run_max") > 0.0, col("price") / col("run_max") - 1.0).otherwise(0.0))
      .select(col("event_id"), col("symbol"), col("drawdown"))
    assertSame(MarketOps.drawdown(ticks), naive)
    detailWindowsArePartitionedByChunk(MarketOps.drawdown(ticks))
  }

  test("volumeBars matches the single-window plan bit-for-bit") {
    val tie = concat(
      lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
      lpad(col("event_id").cast("string"), 20, "0"))
    val preCum = coalesce(
      sum(col("volume")).over(tickOrder.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val naive = ticks.withColumn("pre_cum", preCum)
      .withColumn("bar_id", expr("pre_cum div 10000"))
      .groupBy(col("symbol"), col("bar_id"))
      .agg(count(lit(1)).as("n_ticks"),
        min_by(col("price"), tie).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), tie).as("close"),
        sum(col("volume")).as("bar_volume"))
    assertSame(MarketOps.volumeBars(ticks, 10000L), naive)
    detailWindowsArePartitionedByChunk(MarketOps.volumeBars(ticks, 10000L))
  }

  test("sma (chunked-with-carry ROWS frame) matches the single-window plan bit-for-bit") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val w = tickOrder.rowsBetween(-19, 0)
    val naive = ticks.select(col("event_id"), col("symbol"),
      (sum(col("price").cast(dec)).over(w).cast("double") /
        count(lit(1)).over(w).cast("double")).as("sma20"))
    // chunkRows=64 ≪ per-symbol row count, so carries are exercised
    assertSame(MarketOps.sma(ticks, 20, chunkRows = 64L), naive)
    detailWindowsArePartitionedByChunk(MarketOps.sma(ticks, 20, chunkRows = 64L))
  }

  test("rollingHourlyAvg (chunked-with-carry RANGE frame) matches bit-for-bit") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val w = Window.partitionBy("symbol").orderBy(col("ts_us"))
      .rangeBetween(-3600000000L, 0)
    val naive = ticks.select(col("event_id"), col("symbol"),
        unix_micros(col("ts")).as("ts_us"), col("price"))
      .select(col("event_id"), col("symbol"),
        (sum(col("price").cast(dec)).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as("avg_1h"))
    assertSame(MarketOps.rollingHourlyAvg(ticks), naive)
    detailWindowsArePartitionedByChunk(MarketOps.rollingHourlyAvg(ticks))
  }

  test("rsi (layered lag+frame carries) matches the single-window plan bit-for-bit") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val chg = col("price").cast(dec) - lag(col("price"), 1).over(tickOrder).cast(dec)
    val w = tickOrder.rowsBetween(-13, 0)
    val naive = ticks.withColumn("chg", chg)
      .withColumn("gain", when(col("chg") > 0, col("chg")).otherwise(lit(0).cast(dec)))
      .withColumn("loss", when(col("chg") < 0, -col("chg")).otherwise(lit(0).cast(dec)))
      .select(col("event_id"), col("symbol"),
        when(sum(col("loss")).over(w) === 0, lit(100.0))
          .otherwise(round(lit(100.0) - lit(100.0) /
            (lit(1.0) + sum(col("gain")).over(w).cast("double") /
              sum(col("loss")).over(w).cast("double")), 4)).as("rsi14"))
    assertSame(MarketOps.rsi(ticks, 14, chunkRows = 64L), naive)
  }

  test("bollinger (chunked frame) matches the single-window plan bit-for-bit") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val sqDec = org.apache.spark.sql.types.DecimalType(38, 4)
    val w = tickOrder.rowsBetween(-19, 0)
    val cnt = count(lit(1)).over(w).cast("double")
    val s = sum(col("price").cast(dec)).over(w).cast("double")
    val sq = sum((col("price").cast(dec) * col("price").cast(dec)).cast(sqDec))
      .over(w).cast("double")
    val mean = s / cnt
    val varRaw = (sq - (s * s) / cnt) / (cnt - lit(1.0))
    val sd = sqrt(when(cnt > 1 && varRaw > 0, varRaw).otherwise(lit(0.0)))
    val naive = ticks.select(col("event_id"), col("symbol"),
      round(mean, 4).as("sma"), round(sd, 4).as("sd"),
      round(mean + lit(2.0) * sd, 4).as("upper_band"),
      round(mean - lit(2.0) * sd, 4).as("lower_band"))
    assertSame(MarketOps.bollinger(ticks, 20, 2.0, chunkRows = 64L), naive)
  }

  test("donchian (chunked frame) matches the single-window plan bit-for-bit") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val w = tickOrder.rowsBetween(-19, 0)
    val up = max(col("price").cast(dec)).over(w)
    val lo = min(col("price").cast(dec)).over(w)
    val naive = ticks.select(col("event_id"), col("symbol"),
      up.cast("double").as("upper_ch"), lo.cast("double").as("lower_ch"),
      ((up + lo).cast("double") / 2.0).as("mid_ch"))
    assertSame(MarketOps.donchian(ticks, 20, chunkRows = 64L), naive)
  }

  test("stochastic (layered frame+lag carries) matches bit-for-bit") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val w = tickOrder.rowsBetween(-13, 0)
    val hhv = max(col("price").cast(dec)).over(w)
    val llv = min(col("price").cast(dec)).over(w)
    val k = when(hhv > llv,
      lit(100.0) * (col("price").cast(dec) - llv).cast("double") /
        (hhv - llv).cast("double"))
    val naive = ticks.select(col("event_id"), col("symbol"), col("ts"), k.as("pct_k"))
      .select(col("event_id"), col("symbol"), col("pct_k"),
        ((col("pct_k") + lag(col("pct_k"), 1).over(tickOrder)
          + lag(col("pct_k"), 2).over(tickOrder)) / 3.0).as("pct_d"))
    assertSame(MarketOps.stochastic(ticks, 14, chunkRows = 64L), naive)
  }

  test("sessionize (chunked lag + flag prefix-sum) matches bit-for-bit") {
    val gapUs = 30 * 60L * 1000000L
    val prevTs = lag(col("ts"), 1).over(tickOrder)
    val newSession = when(prevTs.isNull ||
      unix_micros(col("ts")) - unix_micros(prevTs) > gapUs, 1L).otherwise(0L)
    val naive = ticks.withColumn("is_new", newSession)
      .withColumn("session_id",
        sum(col("is_new")).over(tickOrder.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("event_id"), col("symbol"), col("session_id"))
    assertSame(MarketOps.sessionize(ticks, 30), naive)
    detailWindowsArePartitionedByChunk(MarketOps.sessionize(ticks, 30))
  }

  test("concurrency (chunked sweep + argmax aggregate) matches bit-for-bit") {
    import org.apache.spark.sql.types.DecimalType
    val events = graft.core.Tables.events(spark, sf)
    val startUs = unix_micros(col("ts"))
    val durS = (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
    val endUs = startUs + durS * 1000000L
    val deltas = events.select(col("event_type").as("symbol"),
        explode(array(
          struct(startUs.as("t"), lit(1L).as("d")),
          struct(endUs.as("t"), lit(-1L).as("d")))).as("e"))
      .select(col("symbol"), col("e.t").as("t"), col("e.d").as("d"))
    val sweep = Window.partitionBy("symbol").orderBy(col("t"), col("d"))
    val sym = Window.partitionBy("symbol")
    val naive = deltas
      .withColumn("running",
        sum(col("d")).over(sweep.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("peak", max(col("running")).over(sym))
      .groupBy(col("symbol"))
      .agg(first(col("peak")).as("peak_concurrent"),
        min(when(col("running") === col("peak"), col("t"))).as("peak_at_us"),
        (count(lit(1)) / 2).cast("long").as("n_intervals"))
    assertSame(graft.operators.EventAnalytics.concurrency(events), naive)
  }

  test("vocabCoverage (count-band chunking) matches the global-window plan") {
    val docs = graft.core.Tables.documents(spark, sf)
    val counts = docs.select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val ord = Window.orderBy(col("c").desc, col("w"))
    val tot = counts.agg(sum(col("c")).as("total"))
    val naive = counts
      .withColumn("top_n", row_number().over(ord).cast("long"))
      .withColumn("cum_tokens",
        sum(col("c")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("top_n").isin(5L, 10L, 20L))
      .crossJoin(broadcast(tot))
      .select(col("top_n"), col("cum_tokens"), col("total"),
        round(col("cum_tokens").cast("double") / col("total").cast("double"), 6)
          .as("coverage"))
    assertSame(graft.pipeline.TextOps.vocabCoverage(docs), naive)
  }

  test("returns / ofi / gapStats (chunked lag-1) match bit-for-bit") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val naiveRet = ticks.withColumn("prev", lag(col("price"), 1).over(tickOrder))
      .filter(col("prev").isNotNull && col("prev") =!= 0.0)
      .select(col("event_id"), col("symbol"),
        (col("price") / col("prev") - 1).as("ret"))
    assertSame(MarketOps.returns(ticks), naiveRet)

    val prev = lag(col("price"), 1).over(tickOrder)
    val sign = when(prev.isNull, 0L).when(col("price") > prev, 1L)
      .when(col("price") < prev, -1L).otherwise(0L)
    val naiveOfi = ticks.withColumn("sign", sign)
      .groupBy(col("symbol"), date_trunc("hour", col("ts")).as("h"))
      .agg(sum(when(col("sign") === 1L, col("volume")).otherwise(0L)).as("buy_vol"),
        sum(when(col("sign") === -1L, col("volume")).otherwise(0L)).as("sell_vol"),
        count(lit(1)).as("n_ticks"))
      .withColumn("net_vol", col("buy_vol") - col("sell_vol"))
      .withColumn("imbalance_bp",
        when(col("buy_vol") + col("sell_vol") === 0L, 0L)
          .otherwise(expr("(net_vol * 10000) div (buy_vol + sell_vol)")))
      .select(col("symbol"), unix_micros(col("h")).as("hour_us"),
        col("buy_vol"), col("sell_vol"), col("net_vol"),
        col("imbalance_bp"), col("n_ticks"))
    assertSame(MarketOps.ofi(ticks), naiveOfi)

    val gapUs = unix_micros(col("ts")) -
      unix_micros(lag(col("ts"), 1).over(tickOrder))
    val naiveGap = ticks.withColumn("gap_us", gapUs)
      .filter(col("gap_us").isNotNull)
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_gaps"), max(col("gap_us")).as("max_gap_us"),
        round(sum(col("gap_us")).cast("double") /
          count(lit(1)).cast("double"), 4).as("avg_gap_us"),
        sum(when(col("gap_us") > 60 * 1000000L, 1L).otherwise(0L)).as("n_stale"))
    assertSame(MarketOps.gapStats(ticks), naiveGap)
  }

  test("rollSpread / priceImpact (chunked moment lags) match bit-for-bit") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val pd = col("price").cast(dec)
    val withD = ticks
      .withColumn("d", pd - lag(pd, 1).over(tickOrder))
      .withColumn("dl", lag(col("d"), 1).over(tickOrder))
      .filter(col("d").isNotNull && col("dl").isNotNull)
    val m = withD.groupBy(col("symbol")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("d")).cast("double").as("sx"),
      sum(col("dl")).cast("double").as("sy"),
      sum(col("d") * col("dl")).cast("double").as("sxy"))
    val nd = col("n_pairs").cast("double")
    val cov = (col("sxy") - col("sx") * col("sy") / nd) / (nd - 1.0)
    val naiveRoll = m.select(col("symbol"), col("n_pairs"),
      round(cov, 6).as("serial_cov"),
      when(cov < 0.0, round(sqrt(-cov) * 2.0, 6)).otherwise(0.0).as("roll_spread"))
    assertSame(MarketOps.rollSpread(ticks, chunkRows = 64L), naiveRoll)

    val dp = pd - lag(pd, 1).over(tickOrder)
    val withDp = ticks.withColumn("dp", dp).filter(col("dp").isNotNull)
      .withColumn("x",
        (when(col("dp") > 0, 1L).when(col("dp") < 0, -1L).otherwise(0L) *
          col("volume")).cast(org.apache.spark.sql.types.DecimalType(12, 0)))
    val m2 = withDp.groupBy(col("symbol")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("dp")).cast("double").as("sy"),
      sum(col("x") * col("dp")).cast("double").as("sxy"),
      sum(col("x") * col("x")).cast("double").as("sxx"))
    val nd2 = col("n_pairs").cast("double")
    val denX = nd2 * col("sxx") - col("sx") * col("sx")
    val naiveKyle = m2.select(col("symbol"), col("n_pairs"),
      when(denX === 0.0, 0.0)
        .otherwise(round((nd2 * col("sxy") - col("sx") * col("sy")) / denX
          * 10000.0, 6)).as("lambda_e4"))
    assertSame(MarketOps.priceImpact(ticks), naiveKyle)
  }

  test("downsample (prefix-sum index) matches the rank-window plan bit-for-bit") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val b = Window.partitionBy("symbol", "bucket")
    val base = ticks
      .withColumn("i", (row_number().over(tickOrder) - 1).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("symbol")))
      .withColumn("bucket", expr("(i * 100) div n"))
    val mean = sum(col("price").cast(dec)).over(b).cast("double") /
      count(lit(1)).over(b).cast("double")
    val naive = base.withColumn("dev", abs(col("price") - mean))
      .withColumn("rk", row_number().over(
        Window.partitionBy("symbol", "bucket")
          .orderBy(col("dev").desc, col("event_id"))))
      .filter(col("rk") === 1)
      .select(col("symbol"), col("bucket"), col("event_id"), col("price"),
        col("dev"))
    assertSame(MarketOps.downsample(ticks, 100), naive)
  }

  test("vpin (chunked sign + prefix-sum bars) matches the naive plan bit-for-bit") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val prev = lag(col("price"), 1).over(tickOrder)
    val sgn = when(prev.isNull, 0L)
      .when(col("price").cast(dec) > prev.cast(dec), 1L)
      .when(col("price").cast(dec) < prev.cast(dec), -1L)
      .otherwise(0L)
    val preCum = coalesce(
      sum(col("volume")).over(tickOrder.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val bars = ticks.withColumn("sgn", sgn).withColumn("pre_cum", preCum)
      .withColumn("bar_id", expr("pre_cum div 10000"))
      .groupBy(col("symbol"), col("bar_id"))
      .agg(sum(when(col("sgn") === 1L, col("volume")).otherwise(0L)).as("buy_vol"),
        sum(when(col("sgn") === -1L, col("volume")).otherwise(0L)).as("sell_vol"),
        sum(col("volume")).as("total_vol"))
    val wb = Window.partitionBy("symbol").orderBy("bar_id").rowsBetween(-4, 0)
    val naive = bars.select(col("symbol"), col("bar_id"), col("buy_vol"),
      col("sell_vol"), col("total_vol"),
      round(sum(abs(col("buy_vol") - col("sell_vol"))).over(wb).cast("double") /
        sum(col("total_vol")).over(wb).cast("double"), 6).as("vpin"))
    assertSame(MarketOps.vpin(ticks, 10000L, 5), naive)
    val v = MarketOps.vpin(ticks, 10000L, 5)
    assert(v.filter(col("vpin") < 0.0 || col("vpin") > 1.0).count() === 0)
  }

  test("ordinalPatterns (chunked raw-value lags) matches bit-for-bit") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    def s(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      when(x > y, 2L).when(x < y, 0L).otherwise(1L)
    val pd = col("price").cast(dec)
    val naive = ticks.select(col("symbol"),
        lag(pd, 2).over(tickOrder).as("a"), lag(pd, 1).over(tickOrder).as("b"),
        pd.as("c"))
      .filter(col("a").isNotNull)
      .withColumn("pattern",
        s(col("b"), col("a")) * 9 + s(col("c"), col("b")) * 3 +
          s(col("c"), col("a")))
      .groupBy(col("symbol"), col("pattern"))
      .agg(count(lit(1)).as("n"))
    assertSame(MarketOps.ordinalPatterns(ticks, chunkRows = 64L), naive)
  }

  test("lateArrivals matches the single-window plan bit-for-bit") {
    val arrival = Window.partitionBy("symbol").orderBy("event_id")
    val maxPrior = max(unix_micros(col("ts")))
      .over(arrival.rowsBetween(Window.unboundedPreceding, -1))
    val naive = ticks.withColumn("late_us",
        when(maxPrior.isNotNull && unix_micros(col("ts")) < maxPrior,
          maxPrior - unix_micros(col("ts"))).otherwise(0L))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_ticks"),
        sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_late"),
        max(col("late_us")).as("max_late_us"),
        sum(col("late_us")).as("sum_late_us"))
    // small chunkRows so sf0.001 actually spans multiple chunks
    assertSame(MarketOps.lateArrivals(ticks, chunkRows = 512L), naive)
    detailWindowsArePartitionedByChunk(MarketOps.lateArrivals(ticks, chunkRows = 512L))
  }
}
