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

  /** Deterministic min_by/max_by key for tick-level open/close picks:
    * two ticks can share a (symbol, ts) after ns→µs truncation, and a
    * bare min_by(price, ts) then picks an arbitrary one — for the
    * recursive consumers (Heikin-Ashi) one divergent day-1 open would
    * contaminate every later bar. A fixed-width zero-padded
    * (epoch_us, event_id) string is totally ordered, unique, and
    * engine-portable (DuckDB's min_by rejects struct keys; a packed
    * BIGINT overflows), and lexicographic order == numeric order for
    * non-negative fixed-width fields. Every oracle mirrors it verbatim.
    * Both fields pad to 20: Spark/DuckDB lpad TRUNCATES longer inputs,
    * so a 10-wide event_id pad would silently collide for ids ≥ 1e10 —
    * 20 covers the full non-negative int64 range (max 19 digits).
    */
  private[operators] def tieKey: Column = concat(
    lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
    lpad(col("event_id").cast("string"), 20, "0"))

  /** OHLC candlesticks per symbol per day.
    * open/close via min_by/max_by on the deterministic [[tieKey]] —
    * one shuffle, no self-join.
    */
  def ohlcDaily(ticks: DataFrame): DataFrame =
    ticks.groupBy(col("symbol"), to_date(col("ts")).as("day"))
      .agg(
        min_by(col("price"), tieKey).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), tieKey).as("close"),
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

  /** Engine-exact mean of 2-dp prices: decimal sum (exact, order-free)
    * then one double division — bit-identical across engines, immune
    * to the 1-ulp averaging differences that split round() boundaries.
    */
  private def exactAvg(c: Column, n: Column): Column =
    sum(c.cast(dec)).cast("double") / n.cast("double")

  /** n-tick simple moving average per symbol — chunked-with-carry
    * rolling window (the bounded-frame sibling of the distributed
    * prefix aggregation below): a plain
    * `Window.partitionBy(symbol).rowsBetween(-(n-1), 0)` still sorts a
    * symbol's ENTIRE history in one task even though the frame is tiny.
    * Here every tick gets an exact global per-symbol row number (via
    * within-day rank + prior-day count offsets — both chunk-parallel),
    * rows are chunked `chunkRows` at a time, and each chunk's last n−1
    * rows are ALSO emitted as carry rows into the next chunk, so the
    * first rows of a chunk see exactly the frame they would have seen
    * in the monolithic window. Carry rows are dropped after the frame
    * evaluates; identical operand multiset ⇒ bit-identical results
    * (PrefixAggSpec).
    */
  def sma(ticks: DataFrame, n: Int, chunkRows: Long = 8192L): DataFrame = {
    val (t0, spec) = chunkedFrame(ticks, n - 1, chunkRows)
    // prefix-sum sliding sum (see bollinger): exact decimal
    // C_i − C_{i−n}, O(1)/row instead of O(n)
    val run = spec.rowsBetween(Window.unboundedPreceding, 0)
    val t = t0
      .withColumn("cs", sum(col("price").cast(dec)).over(run))
      .withColumn("cn", count(lit(1)).over(run))
    def slide(c: Column): Column = c - coalesce(lag(c, n).over(spec), lit(0))
    t.select(col("event_id"), col("symbol"), col("carry"),
        (slide(col("cs")).cast("double") /
          slide(col("cn")).cast("double")).as(s"sma$n"))
      .filter(!col("carry"))
      .select(col("event_id"), col("symbol"), col(s"sma$n"))
      .orderBy("event_id")
  }

  /** Chunked-with-carry scaffold for bounded per-symbol ROWS windows:
    * rows get their exact global per-symbol row number `rn` (prefix-sum
    * trick, chunk-parallel), are split into `chunkRows`-row chunks, and
    * each chunk's last `carryRows` rows are re-emitted into the next
    * chunk flagged `carry`. Window specs over the returned
    * (symbol, chunk_id) partition ordered by `rn` give every REAL row
    * exactly the frame the monolithic per-symbol window would — as
    * long as the frame (plus any layered lag) reaches at most
    * `carryRows` back. Carries may themselves see truncated frames
    * near the chunk start; callers must size `carryRows` so that only
    * carries whose values never feed a real row are affected, then
    * `filter(!col("carry"))` after evaluating.
    */
  private def chunkedFrame(ticks: DataFrame, carryRows: Int,
      chunkRows: Long): (DataFrame, org.apache.spark.sql.expressions.WindowSpec) = {
    require(chunkRows > carryRows,
      s"chunkRows=$chunkRows must exceed carryRows=$carryRows")
    // duplication via explode, NOT a union of two branches — a union
    // would re-execute the whole row-number subplan (rank window +
    // offsets join) once per branch; exploding a 1/2-element array
    // duplicates the chunk-tail rows in place on a single pass
    val isTail = expr(s"(rn - 1) % ${chunkRows}L >= ${chunkRows - carryRows}L")
    val all = withSymbolRowNumber(ticks)
      .withColumn("carry",
        explode(when(isTail, array(lit(false), lit(true)))
          .otherwise(array(lit(false)))))
      .withColumn("chunk_id",
        expr(s"(rn - 1) div ${chunkRows}L") +
          when(col("carry"), 1L).otherwise(0L))
    (all, Window.partitionBy("symbol", "chunk_id").orderBy("rn"))
  }

  /** Exact global per-symbol row number WITHOUT a whole-symbol window:
    * within-day rank (chunk-parallel) + running prior-day count offsets
    * (tiny table, broadcast back) — the prefix-sum trick applied to
    * row_number itself.
    */
  private def withSymbolRowNumber(ticks: DataFrame,
      withTotal: Boolean = false): DataFrame = {
    val t = ticks.withColumn("chunk_day", to_date(col("ts")))
    val dayCounts = t.groupBy(col("symbol"), col("chunk_day"))
      .agg(count(lit(1)).as("c"))
    // r19: `withTotal` rides the per-symbol total count `n` on the same
    // tiny day table (a second window over the one (symbol) exchange) —
    // downsample previously paid a THIRD events scan + broadcast join
    // just to fetch n per symbol.
    val offCol = coalesce(sum(col("c")).over(priorDays), lit(0L)).as("rn_off")
    val offsets =
      if (withTotal)
        dayCounts.select(col("symbol"), col("chunk_day"), offCol,
          sum(col("c")).over(Window.partitionBy("symbol")).as("n"))
      else dayCounts.select(col("symbol"), col("chunk_day"), offCol)
    t.join(offsets, Seq("symbol", "chunk_day"))
      .withColumn("rn",
        row_number().over(chunkOrder).cast("long") + col("rn_off"))
      .drop("chunk_day", "rn_off")
  }

  /** Tick record for typed sorted-group streaming. */
  final case class Tick(event_id: Long, symbol: String, ts_us: Long, price: Double)
  final case class EmaRow(event_id: Long, symbol: String, ema: Double)

  /** Bounded monotonic deque over (rn, value) for O(1)-amortized
    * sliding-window extrema (r11): each row is pushed once and popped
    * at most once, so an n-row rolling min/max costs O(1)/row instead
    * of WindowExec's O(n)/row frame re-evaluation — the r10 verdict's
    * last local-perf lever for the non-invertible min/max indicator
    * family (donchian/stochastic/williams %R). Values are price CENTS
    * (exact longs from the DECIMAL(18,2) cast), so extrema selection is
    * integer comparison and bit-identical to the decimal window
    * extrema it replaces; `cents.toDouble / 100.0` is the identical
    * correctly-rounded value Spark's compact Decimal.toDouble
    * (unscaled/10^scale in double) produced before.
    */
  private final class MonoDeque(n: Int, takeMin: Boolean) {
    private val cap = n + 1
    private val rns = new Array[Long](cap)
    private val vs = new Array[Long](cap)
    private var head = 0L
    private var tail = 0L // live entries in [head, tail)
    @inline private def at(i: Long): Int = (i % cap).toInt
    def push(rn: Long, v: Long): Unit = {
      while (tail > head &&
          (if (takeMin) v <= vs(at(tail - 1)) else v >= vs(at(tail - 1))))
        tail -= 1
      rns(at(tail)) = rn; vs(at(tail)) = v; tail += 1
      while (rns(at(head)) <= rn - n) head += 1
    }
    def extreme: Long = vs(at(head))
  }

  /** Chunked-scaffold row for the deque passes: the [[chunkedFrame]]
    * output projected to (identity, chunk key, order, carry flag,
    * exact price cents).
    */
  final case class MmIn(event_id: Long, symbol: String, chunk_id: Long,
      rn: Long, carry: Boolean, cents: Long)
  final case class DonchianRow(event_id: Long, symbol: String,
      upper_ch: Double, lower_ch: Double, mid_ch: Double)
  final case class StochRow(event_id: Long, symbol: String,
      pct_k: Option[Double], pct_d: Option[Double])
  final case class WrRow(event_id: Long, symbol: String, wr: Option[Double])

  /** Project the chunked scaffold to [[MmIn]] (cents are exact: 2-dp
    * decimal × 100 → long).
    */
  private def mmInput(ticks: DataFrame, carryRows: Int,
      chunkRows: Long): DataFrame = {
    val (t0, _) = chunkedFrame(ticks, carryRows, chunkRows)
    t0.select(col("event_id"), col("symbol"), col("chunk_id"), col("rn"),
      col("carry"), (col("price").cast(dec) * 100).cast("long").as("cents"))
  }

  /** Exponential moving average per symbol — the genuinely recursive
    * form (ema_k = a·p_k + (1-a)·ema_{k-1}, seeded with the first
    * price).
    *
    * A recursive per-key scan is the one shape windows can't express;
    * `groupByKey(symbol).flatMapSortedGroups(ts)` is the Spark-native
    * answer: one shuffle on symbol, a spillable sort per group, then a
    * streaming O(1)-state pass — per-symbol state never leaves one
    * task, so 100 TB of ticks across many symbols parallelizes freely.
    */
  def ema(ticks: DataFrame, alpha: Double): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks.select(col("event_id"), col("symbol"),
        unix_micros(col("ts")).as("ts_us"), col("price"))
      .as[Tick]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("ts_us"), col("event_id")) { (sym, it) =>
        var e = 0.0
        var first = true
        it.map { t =>
          e = if (first) { first = false; t.price }
              else alpha * t.price + (1 - alpha) * e
          EmaRow(t.event_id, sym, e)
        }
      }
      .toDF()
      .orderBy("event_id")
  }

  final case class HaBar(symbol: String, day: java.sql.Date, open: Double,
      high: Double, low: Double, close: Double)
  final case class HaOut(symbol: String, day: java.sql.Date, ha_open: Double,
      ha_high: Double, ha_low: Double, ha_close: Double)

  /** Heikin-Ashi smoothed candles over daily bars: ha_close is the
    * bar's OHLC mean, ha_open the midpoint of the PREVIOUS Heikin-Ashi
    * bar (genuinely recursive — seeded with the first bar's (open +
    * close)/2), ha_high/ha_low the extremes over {high/low, ha_open,
    * ha_close}. The recursion runs over BAR STATES (tiny per symbol)
    * in one sorted-group pass, the barCascade posture; divisions are
    * by powers of two (exact) and the sums run the identical
    * left-associative IEEE op order as the oracle's recursive CTE, so
    * doubles are bit-identical.
    */
  def heikinAshi(ticks: DataFrame): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("open"), col("high"),
        col("low"), col("close"))
      .as[HaBar]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        var prevOpen = 0.0; var prevClose = 0.0; var first = true
        it.map { b =>
          val haClose = (b.open + b.high + b.low + b.close) / 4.0
          val haOpen =
            if (first) { first = false; (b.open + b.close) / 2.0 }
            else (prevOpen + prevClose) / 2.0
          prevOpen = haOpen; prevClose = haClose
          HaOut(sym, b.day, haOpen,
            math.max(b.high, math.max(haOpen, haClose)),
            math.min(b.low, math.min(haOpen, haClose)), haClose)
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  final case class KamaIn(event_id: Long, symbol: String, ts_us: Long,
      price: Double, sc: Double)
  final case class KamaRow(event_id: Long, symbol: String, kama: Double)

  /** Kaufman adaptive moving average: the smoothing constant adapts
    * per row to the efficiency ratio er = |net move over n| / Σ|tick
    * moves over n|. The ratio inputs are EXACT DECIMAL window sums
    * (never a float window SUM — order-dependent); er, the smoothing
    * constant sc = (er·(fast−slow)+slow)², and the recursion
    * `kama += sc·(price − kama)` then run the identical IEEE op
    * stream as the oracle's recursive CTE, so doubles are
    * bit-identical. Rows inside the warm-up window use er = 1
    * (fully directional), as does a zero-volatility window.
    * One sort-shuffle per symbol; O(1) state in the sorted-group pass.
    */
  def kama(ticks: DataFrame, n: Int = 10): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    val ord = tickOrder
    val pd = col("price").cast(dec)
    val adiff = abs(pd - lag(pd, 1).over(ord))
    val dir = abs(pd - lag(pd, n).over(ord))
    val volSum = sum(adiff).over(ord.rowsBetween(-(n - 1), 0))
    val fastC = lit(2.0) / lit(3.0)   // 2/(2+1)
    val slowC = lit(2.0) / lit(31.0)  // 2/(30+1)
    val rn = row_number().over(ord)
    val er = when(rn <= n || volSum === lit(0).cast(dec), lit(1.0))
      .otherwise(dir.cast("double") / volSum.cast("double"))
    val sc = er * (fastC - slowC) + slowC
    ticks.select(col("event_id"), col("symbol"),
        unix_micros(col("ts")).as("ts_us"), col("price"),
        (sc * sc).as("sc"))
      .as[KamaIn]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("ts_us"), col("event_id")) { (sym, it) =>
        var k = 0.0
        var first = true
        it.map { t =>
          k = if (first) { first = false; t.price }
              else k + t.sc * (t.price - k)
          KamaRow(t.event_id, sym, k)
        }
      }
      .toDF()
      .orderBy("event_id")
  }

  final case class MacdRow(event_id: Long, symbol: String,
      ema_fast: Double, ema_slow: Double, macd: Double)

  /** MACD: difference of a fast and a slow recursive EMA, both carried
    * through ONE sorted-group pass (same shape as [[ema]], two
    * accumulators — not two scans). Both recursions and the final
    * subtraction run the identical IEEE op stream as the oracle's
    * two-column recursive CTE, so the doubles are bit-identical.
    */
  def macd(ticks: DataFrame, fast: Double = 0.2, slow: Double = 0.05): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks.select(col("event_id"), col("symbol"),
        unix_micros(col("ts")).as("ts_us"), col("price"))
      .as[Tick]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("ts_us"), col("event_id")) { (sym, it) =>
        var ef = 0.0
        var es = 0.0
        var first = true
        it.map { t =>
          if (first) { first = false; ef = t.price; es = t.price }
          else {
            ef = fast * t.price + (1 - fast) * ef
            es = slow * t.price + (1 - slow) * es
          }
          MacdRow(t.event_id, sym, ef, es, ef - es)
        }
      }
      .toDF()
      .orderBy("event_id")
  }

  /** Downsample to hourly bars (string bucket for oracle-stable typing). */
  def resampleHourly(ticks: DataFrame): DataFrame =
    ticks.groupBy(col("symbol"), date_format(col("ts"), "yyyy-MM-dd HH:00").as("bucket"))
      .agg(
        count(lit(1)).as("n_ticks"),
        exactAvg(col("price"), count(lit(1))).as("avg_price"),
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

  /** Top-n per symbol as a typed partial aggregation
    * ([[graft.functions.TopKAggregator]]): map-side k-row buffers,
    * shuffle of k rows per symbol — same answer as [[topNBySymbol]]
    * without sorting whole partitions. Same output shape/oracle.
    */
  def topNBySymbolAgg(ticks: DataFrame, n: Int): DataFrame = {
    import graft.functions.TopKAggregator
    import TopKAggregator.PE
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks.select(col("symbol"), col("price"), col("event_id"))
      .as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => PE(t._2, t._3))
      .agg(TopKAggregator.topK(n).toColumn.name("top"))
      .toDF("symbol", "top")
      .select(col("symbol"), posexplode(col("top")).as(Seq("i", "pe")))
      .select(col("symbol"), (col("i") + 1).cast("long").as("rn"),
        col("pe.event_id").as("event_id"), col("pe.price").as("price"))
      .orderBy("symbol", "rn")
  }

  /** Tick-over-tick simple returns per symbol (chunked lag). */
  def returns(ticks: DataFrame): DataFrame =
    chunkedLag1(ticks.withColumn("chunk_day", to_date(col("ts"))), "price", "prev")
      .filter(col("prev").isNotNull && col("prev") =!= 0.0)
      .select(col("event_id"), col("symbol"),
        (col("price") / col("prev") - 1).as("ret"))
      .orderBy("event_id")

  // ---- distributed prefix aggregation (chunked cumulative windows) ----
  //
  // An unbounded `Window.partitionBy(symbol)` cumulative serializes one
  // symbol's ENTIRE history through a single task — parallelism equals
  // symbol count, the classic window scale-killer at 100 TB. The fix is
  // the two-level distributed prefix-sum: (1) the detail window
  // partitions by (symbol, day), so parallelism = symbols × active days;
  // (2) per-(symbol, day) totals — one row per symbol-day, built with
  // map-side partial aggregation — get a running offset over the day
  // axis; (3) the offsets join back onto the detail rows and add to the
  // within-day running value. The offsets join is deliberately
  // UNHINTED: at test scale AQE broadcasts the tiny aggregate at
  // runtime anyway (audited on the executed sf0.1 plans), while at
  // 100 TB the table is symbols × active days rows (50k symbols ×
  // 10 years ≈ 180M) — a forced broadcast() would OOM the driver where
  // the unhinted join degrades gracefully to a shuffle join on the
  // same (symbol, day) keys. Integer sums are exact
  // and double MAX is order-free, so every result is bit-identical to
  // the single-window plan (same CORRECTNESS hashes; PrefixAggSpec
  // asserts both the equivalence and the detail-side partitioning).

  /** Within-day deterministic tick order — the detail-side window of the
    * distributed prefix aggregation. Partitioning by (symbol, chunk_day)
    * is the point: no task ever sees more than one symbol-day of rows.
    */
  private def chunkOrder =
    Window.partitionBy("symbol", "chunk_day").orderBy(col("ts"), col("event_id"))

  /** Running frame over STRICTLY PRIOR days of the per-day totals table
    * (one row per symbol-day — driver-size, but still distributed).
    */
  private def priorDays =
    Window.partitionBy("symbol").orderBy("chunk_day")
      .rowsBetween(Window.unboundedPreceding, -1)

  /** lag-1 of column `c` without a whole-symbol window: within-day lag
    * over the (symbol, chunk_day) chunks, with each day's boundary NULL
    * filled from the previous ACTIVE day's last value (deterministic:
    * max_by on (ts, event_id)), carried on the tiny per-day table.
    * Input must already have `chunk_day`; the result adds `out`.
    */
  private def chunkedLag1(t: DataFrame, c: String, out: String): DataFrame = {
    val dayLast = t.groupBy(col("symbol"), col("chunk_day"))
      .agg(max_by(col(c), struct(col("ts"), col("event_id"))).as("day_last"))
      .select(col("symbol"), col("chunk_day"),
        lag(col("day_last"), 1)
          .over(Window.partitionBy("symbol").orderBy("chunk_day"))
          .as("prev_day_val"))
    t.join(dayLast, Seq("symbol", "chunk_day"))
      .withColumn(out, coalesce(lag(col(c), 1).over(chunkOrder), col("prev_day_val")))
      .drop("prev_day_val")
  }

  /** Running (cumulative) volume per symbol — exact integer math, via
    * the chunked prefix-sum (day partials + broadcast offsets).
    */
  def runningVolume(ticks: DataFrame): DataFrame = {
    val t = ticks.withColumn("chunk_day", to_date(col("ts")))
    val offsets = t.groupBy(col("symbol"), col("chunk_day"))
      .agg(sum(col("volume")).as("day_total"))
      .select(col("symbol"), col("chunk_day"),
        coalesce(sum(col("day_total")).over(priorDays), lit(0L)).as("cum_offset"))
    t.join(offsets, Seq("symbol", "chunk_day"))
      .select(col("event_id"), col("symbol"),
        (sum(col("volume")).over(chunkOrder.rowsBetween(Window.unboundedPreceding, 0))
          + col("cum_offset")).as("cum_volume"))
      .orderBy("event_id")
  }

  /** Per-symbol dispersion stats. */
  def volatility(ticks: DataFrame): DataFrame =
    ticks.groupBy(col("symbol"))
      .agg(
        round(stddev_samp(col("price")), 4).as("price_stddev"),
        exactAvg(col("price"), count(lit(1))).as("avg_price"),
        min(col("price")).as("min_price"),
        max(col("price")).as("max_price"),
        count(lit(1)).as("n_ticks"))
      .orderBy("symbol")

  /** Cross-symbol price correlation: align symbols on an hourly grid
    * (exact decimal means), pair-join on the hour, Pearson corr per
    * symbol pair. The pair join runs on the tiny hourly rollup, never
    * on raw ticks — at 100 TB the rollup is what makes an all-pairs
    * correlation feasible at all.
    */
  def correlationMatrix(ticks: DataFrame): DataFrame = {
    val hourly = ticks
      .groupBy(col("symbol"), date_trunc("hour", col("ts")).as("h"))
      .agg(exactAvg(col("price"), count(lit(1))).as("p"))
    val a = hourly.select(col("symbol").as("sym_a"), col("h"), col("p").as("p_a"))
    val b = hourly.select(col("symbol").as("sym_b"), col("h"), col("p").as("p_b"))
    a.join(b, "h")
      .filter(col("sym_a") < col("sym_b"))
      .groupBy("sym_a", "sym_b")
      .agg(round(corr(col("p_a"), col("p_b")), 4).as("price_corr"),
        count(lit(1)).as("n_hours"))
      .orderBy("sym_a", "sym_b")
  }

  /** Cutler's RSI(n) per symbol: SMA of gains over SMA of losses in an
    * n-tick window. Gains/losses are DECIMAL differences of the 2-dp
    * prices and window sums stay decimal, so they are exact and
    * order-free — a double sliding-window sum would differ between
    * Spark's per-frame re-aggregation and DuckDB's segment tree in the
    * last ulp. Zero-loss windows emit RSI = 100 (both engines).
    */
  def rsi(ticks: DataFrame, n: Int = 14, chunkRows: Long = 8192L): DataFrame = {
    // chunked-with-carry, LAYERED: the (n−1)-row sums consume chg,
    // which itself lags one row — so carry n rows. The first carry's
    // chg is NULL-degraded (its lag is outside the chunk), but its
    // value only enters frames of other carries, never a real row.
    val (t0, spec) = chunkedFrame(ticks, n, chunkRows)
    val chg = col("price").cast(dec) - lag(col("price"), 1).over(spec).cast(dec)
    // prefix-sum sliding sums (see bollinger): running gain/loss sums
    // minus their n-row lag — exact decimal differences, O(1)/row
    val run = spec.rowsBetween(Window.unboundedPreceding, 0)
    val t = t0.withColumn("chg", chg)
      .withColumn("gain", when(col("chg") > 0, col("chg")).otherwise(lit(0).cast(dec)))
      .withColumn("loss", when(col("chg") < 0, -col("chg")).otherwise(lit(0).cast(dec)))
      .withColumn("cg", sum(col("gain")).over(run))
      .withColumn("cl", sum(col("loss")).over(run))
    def slide(c: Column): Column = c - coalesce(lag(c, n).over(spec), lit(0))
    t.select(col("event_id"), col("symbol"), col("carry"),
        when(slide(col("cl")) === 0, lit(100.0))
          .otherwise(round(lit(100.0) - lit(100.0) /
            (lit(1.0) + slide(col("cg")).cast("double") /
              slide(col("cl")).cast("double")), 4))
          .as(s"rsi$n"))
      .filter(!col("carry"))
      .select(col("event_id"), col("symbol"), col(s"rsi$n"))
      .orderBy("event_id")
  }

  /** Bollinger bands (n-tick SMA ± k·σ). The variance is computed from
    * exact decimal window sums of price and price² via the textbook
    * (Σx² − (Σx)²/n)/(n−1) identity with a FIXED double op order, so
    * both engines derive bit-identical bands — streaming stddev
    * (Welford in Spark, segment tree in DuckDB) would not agree.
    * Cancellation can produce a tiny negative variance on constant
    * windows; clamped to 0 (both engines).
    */
  def bollinger(ticks: DataFrame, n: Int = 20, k: Double = 2.0,
      chunkRows: Long = 8192L): DataFrame = {
    val sqDec = DecimalType(38, 4)
    val (t0, spec) = chunkedFrame(ticks, n - 1, chunkRows)
    // prefix-sum sliding windows: Spark re-evaluates a bounded
    // rowsBetween(−(n−1), 0) frame per output row — O(n) decimal adds
    // (and, inlined, O(n) decimal multiplies) per tick, 4.9 s at sf0.1
    // once the noop-sink bench stopped letting count() prune it all.
    // Running (unbounded-preceding) frames update incrementally, and
    // the n-row sliding sum is the exact decimal difference
    // C_i − C_{i−n} — bit-identical values (decimal adds/subtracts are
    // exact), O(1) per row, same single sort (the follow-up lag window
    // shares the partition/order). Min/max frames (stochastic,
    // donchian) are not invertible and keep the direct frame.
    val run = spec.rowsBetween(Window.unboundedPreceding, 0)
    val t = t0
      .withColumn("pd", col("price").cast(dec))
      .withColumn("p2", (col("pd") * col("pd")).cast(sqDec))
      .withColumn("cs", sum(col("pd")).over(run))
      .withColumn("cq", sum(col("p2")).over(run))
      .withColumn("cn", count(lit(1)).over(run))
    def slide(c: Column): Column = c - coalesce(lag(c, n).over(spec), lit(0))
    val cnt = slide(col("cn")).cast("double")
    val s = slide(col("cs")).cast("double")
    val sq = slide(col("cq")).cast("double")
    val mean = s / cnt
    val varRaw = (sq - (s * s) / cnt) / (cnt - lit(1.0))
    val sd = sqrt(when(cnt > 1 && varRaw > 0, varRaw).otherwise(lit(0.0)))
    t.select(col("event_id"), col("symbol"), col("carry"),
        round(mean, 4).as("sma"),
        round(sd, 4).as("sd"),
        round(mean + lit(k) * sd, 4).as("upper_band"),
        round(mean - lit(k) * sd, 4).as("lower_band"))
      .filter(!col("carry"))
      .select(col("event_id"), col("symbol"), col("sma"), col("sd"),
        col("upper_band"), col("lower_band"))
      .orderBy("event_id")
  }

  /** On-balance volume per symbol: running signed-volume sum (volume
    * added on up-ticks, subtracted on down-ticks) — pure BIGINT math,
    * exact everywhere. The sign comes from the DECIMAL price change so
    * equal prices are exactly zero.
    */
  def obv(ticks: DataFrame): DataFrame = {
    // chunked prefix-sum; the lag(price) crosses day boundaries, so
    // chunkedLag1 seeds each day's first change from the previous
    // day's last price
    val t = ticks.withColumn("chunk_day", to_date(col("ts")))
    val signed = chunkedLag1(t, "price", "prev")
      .withColumn("chg", col("price").cast(dec) - col("prev").cast(dec))
      .withColumn("sv",
        when(col("chg") > 0, col("volume"))
          .when(col("chg") < 0, -col("volume"))
          .otherwise(lit(0L)))
    val offsets = signed.groupBy(col("symbol"), col("chunk_day"))
      .agg(sum(col("sv")).as("day_total"))
      .select(col("symbol"), col("chunk_day"),
        coalesce(sum(col("day_total")).over(priorDays), lit(0L)).as("cum_offset"))
    signed.join(offsets, Seq("symbol", "chunk_day"))
      .select(col("event_id"), col("symbol"),
        (sum(col("sv")).over(chunkOrder.rowsBetween(Window.unboundedPreceding, 0))
          + col("cum_offset")).as("obv"))
      .orderBy("event_id")
  }

  /** Price anomaly detection: ticks more than `zMin` sample standard
    * deviations from their symbol's mean. Mean and σ come from exact
    * decimal sums via the same fixed-order identity as [[bollinger]];
    * the per-symbol stats broadcast back onto the tick stream (scalar-
    * aggregate join, no window over the whole partition).
    */
  def zscoreOutliers(ticks: DataFrame, zMin: Double = 2.5): DataFrame = {
    val sqDec = DecimalType(38, 4)
    val stats = ticks.groupBy(col("symbol")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("price").cast(dec)).cast("double").as("s"),
      sum((col("price").cast(dec) * col("price").cast(dec)).cast(sqDec))
        .cast("double").as("sq"))
      .select(col("symbol"), (col("s") / col("n")).as("mean"),
        // n=1 → 0/0 and constant-price → sd=0 must yield NULL (as
        // DuckDB's x/0 does), never NaN/Inf — Spark sorts NaN above all
        // numbers, so an unguarded abs(z) >= zMin silently passes NaN
        when(col("n") > 1.0,
          sqrt((col("sq") - (col("s") * col("s")) / col("n")) / (col("n") - 1.0)))
          .as("sd"))
    ticks.join(broadcast(stats), "symbol")
      .withColumn("z",
        when(col("sd") > 0 && !isnan(col("sd")),
          round((col("price") - col("mean")) / col("sd"), 4)))
      .filter(abs(col("z")) >= zMin)
      .select(col("event_id"), col("symbol"), col("price"), col("z"))
      .orderBy("event_id")
  }

  /** Fixed-width price histogram per symbol (distribution analysis):
    * bucket = floor((price − lo) / width), one partial-agg shuffle of
    * (symbol, bucket) counts. The bucket id is an integer floor of a
    * double quotient — identical IEEE ops in both engines, no
    * width_bucket builtin needed (DuckDB 1.0 lacks it).
    */
  def priceHistogram(ticks: DataFrame, lo: Double = 100.0, width: Double = 10.0): DataFrame =
    ticks
      .withColumn("bucket", floor((col("price") - lit(lo)) / lit(width)).cast("long"))
      .groupBy(col("symbol"), col("bucket"))
      .agg(count(lit(1)).as("n_ticks"),
        min(col("price")).as("lo_price"), max(col("price")).as("hi_price"))
      .orderBy("symbol", "bucket")

  /** As-of join (trade↔quote style): for each left tick, the latest
    * right tick with `right.ts <= left.ts` for the same key.
    *
    * Spark-first design: instead of an N×M inequality join (which Spark
    * would plan as broadcast-nested-loop), tag and union both sides,
    * then take `last(..., ignoreNulls)` over a (key, ts)-sorted window —
    * a single sort-shuffle, linear in |L|+|R|, the same cost shape as a
    * distributed merge-asof. Right rows sort before left rows at equal
    * ts, making the match inclusive like DuckDB's `ASOF JOIN ... ON
    * l.ts >= r.ts`.
    *
    * Unmatched lefts surface as -1 sentinels (keeps the output
    * null-free for engine-independent hashing; see SURVEY.md §4).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String = "user_id"): DataFrame = {
    val lTagged = left.select(col(key), col("ts"), lit(1).as("_side"),
      col("event_id").as("l_event_id"), col("price").as("l_price"),
      lit(null).cast("timestamp").as("r_ts"), lit(null).cast("double").as("r_price"))
    val rTagged = right.select(col(key), col("ts"), lit(0).as("_side"),
      lit(null).cast("long").as("l_event_id"), lit(null).cast("double").as("l_price"),
      col("ts").as("r_ts"), col("price").as("r_price"))
    val w = Window.partitionBy(key).orderBy(col("ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    rTagged.unionByName(lTagged)
      .withColumn("m_ts", last(col("r_ts"), ignoreNulls = true).over(w))
      .withColumn("m_price", last(col("r_price"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("l_event_id").as("event_id"), col(key),
        unix_micros(col("ts")).as("ts_us"), col("l_price").as("price"),
        coalesce(unix_micros(col("m_ts")), lit(-1L)).as("quote_ts_us"),
        coalesce(col("m_price"), lit(-1.0)).as("quote_price"))
      .orderBy("event_id")
  }

  /** Range (interval) join: for each left tick, count right ticks of the
    * same key in the window [left.ts - windowMinutes, left.ts).
    *
    * Spark-first design: coarse time-bucket equi-join + residual
    * predicate. Each side gets `bucket = ts div window`; a left row can
    * only match right rows in its own or the previous bucket, so the
    * left probes exactly two buckets. This keeps the join an equi-join
    * (hash/sort-merge, shuffle on (key, bucket)) instead of a
    * nested-loop range scan — the standard distributed range-join
    * rewrite.
    */
  def rangeJoinCount(left: DataFrame, right: DataFrame,
      windowMinutes: Int, key: String = "user_id"): DataFrame = {
    val winUs = windowMinutes * 60L * 1000000L
    val l = left.select(col("event_id"), col(key), unix_micros(col("ts")).as("l_us"))
      .withColumn("_b", expr(s"l_us div $winUs"))
      .withColumn("bucket", explode(array(col("_b") - 1, col("_b"))))
    val r = right.select(col(key), unix_micros(col("ts")).as("r_us"))
      .withColumn("bucket", expr(s"r_us div $winUs"))
    l.join(r, Seq(key, "bucket"), "left")
      .groupBy(col("event_id"))
      .agg(count(when(col("r_us") >= col("l_us") - winUs &&
        col("r_us") < col("l_us"), 1)).as("n_prior"))
      .orderBy("event_id")
  }

  /** Gap fill: hourly spine per symbol (min..max observed hour), left
    * join the observed hourly average, forward-fill missing hours with
    * the last observation. The spine is generated distributed
    * (sequence+explode per symbol), never on the driver.
    */
  def gapFillHourly(ticks: DataFrame): DataFrame = {
    val hourly = ticks
      .groupBy(col("symbol"), date_trunc("hour", col("ts")).as("h"))
      .agg(exactAvg(col("price"), count(lit(1))).as("avg_price"))
    val spine = hourly.groupBy(col("symbol"))
      .agg(min("h").as("h0"), max("h").as("h1"))
      .select(col("symbol"),
        explode(sequence(col("h0"), col("h1"), expr("interval 1 hour"))).as("h"))
    val w = Window.partitionBy("symbol").orderBy("h")
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(hourly, Seq("symbol", "h"), "left")
      .select(col("symbol"), unix_micros(col("h")).as("h_us"),
        last(col("avg_price"), ignoreNulls = true).over(w).as("price_ffill"),
        col("avg_price").isNull.cast("long").as("is_gap"))
      .orderBy("symbol", "h_us")
  }

  /** Sessionization via Spark's native `session_window` (gap-merged
    * windows, batch mode): one aggregation, no window-function sort
    * pass. Emits per (symbol, session): first-tick time + tick count.
    * Same session boundaries as [[sessionize]], oracle-checkable.
    */
  def sessionWindows(ticks: DataFrame, gapMinutes: Int): DataFrame =
    ticks.groupBy(col("symbol"), session_window(col("ts"), s"$gapMinutes minutes"))
      .agg(count(lit(1)).as("n_ticks"))
      .select(col("symbol"),
        unix_micros(col("session_window.start")).as("sess_start_us"),
        col("n_ticks"))
      .orderBy("symbol", "sess_start_us")

  /** Scale-path approximate stats: HLL distinct + t-digest percentile.
    * The exact counterparts are oracled (q_distinct_users,
    * q_percentiles); these run the 100 TB-friendly one-pass sketches.
    */
  def approxStats(ticks: DataFrame): DataFrame =
    ticks.groupBy(col("symbol"))
      .agg(
        approx_count_distinct(col("volume"), rsd = 0.02).as("approx_users"),
        percentile_approx(col("price"), lit(0.5), lit(1000)).as("approx_p50"),
        percentile_approx(col("price"), lit(0.99), lit(1000)).as("approx_p99"))
      .orderBy("symbol")

  /** Time-weighted average price per symbol per day: each tick's price
    * is weighted by the µs until the next tick of the same day (the
    * last tick of a day carries no weight). Decimal-exact products and
    * sums, one double division — engine-identical.
    */
  def twapDaily(ticks: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("symbol"), to_date(col("ts")))
      .orderBy(col("ts"), col("event_id"))
    ticks.select(col("symbol"), to_date(col("ts")).as("day"), col("event_id"),
        col("ts"), col("price"))
      .withColumn("dur_us",
        lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
      .filter(col("dur_us").isNotNull && col("dur_us") > 0)
      .groupBy(col("symbol"), col("day"))
      .agg(
        round(sum(col("price").cast(dec) * col("dur_us")).cast("double") /
          sum(col("dur_us")).cast("double"), 6).as("twap"),
        count(lit(1)).as("n_intervals"))
      .orderBy("symbol", "day")
  }

  /** Volume bars: per symbol, a new bar every `threshold` units of
    * cumulative volume (bar id = pre-tick cumulative volume div
    * threshold — the classic "volume clock" used instead of wall-clock
    * bars on tick data). Integer bar assignment, min_by/max_by
    * open/close: everything engine-exact.
    */
  def volumeBars(ticks: DataFrame, threshold: Long): DataFrame = {
    // chunked prefix-sum (see runningVolume): the pre-tick cumulative is
    // within-day running volume (EXCLUSIVE frame) + prior-day offsets
    val t = ticks.withColumn("chunk_day", to_date(col("ts")))
    val offsets = t.groupBy(col("symbol"), col("chunk_day"))
      .agg(sum(col("volume")).as("day_total"))
      .select(col("symbol"), col("chunk_day"),
        coalesce(sum(col("day_total")).over(priorDays), lit(0L)).as("cum_offset"))
    val preCum = coalesce(
      sum(col("volume")).over(chunkOrder.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L)) + col("cum_offset")
    // integer div: cumulative volume exceeds double-exact range at scale
    t.join(offsets, Seq("symbol", "chunk_day"))
      .withColumn("pre_cum", preCum)
      .withColumn("bar_id", expr(s"pre_cum div $threshold"))
      .groupBy(col("symbol"), col("bar_id"))
      .agg(
        count(lit(1)).as("n_ticks"),
        min_by(col("price"), tieKey).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), tieKey).as("close"),
        sum(col("volume")).as("bar_volume"))
      .orderBy("symbol", "bar_id")
  }

  /** Dollar bars: the volume-clock generalization on TRADED VALUE — a
    * new bar every `thresholdCents` of cumulative price×volume, the
    * sampling clock that equalizes information per bar across price
    * regimes (a $10 stock and a $400 stock tick the same clock).
    * Identical chunked prefix-sum shape as [[volumeBars]]; the clock
    * runs in exact BIGINT dollar-cents (2-dp price × integer volume —
    * wraps only past ~9e18 cents ≈ $92 quadrillion of cumulative
    * traded value per symbol, far beyond any market's history).
    */
  def dollarBars(ticks: DataFrame, thresholdCents: Long): DataFrame = {
    val t = ticks
      .withColumn("chunk_day", to_date(col("ts")))
      .withColumn("dc",
        ((col("price").cast(dec) * 100).cast("long")) * col("volume"))
    val offsets = t.groupBy(col("symbol"), col("chunk_day"))
      .agg(sum(col("dc")).as("day_total"))
      .select(col("symbol"), col("chunk_day"),
        coalesce(sum(col("day_total")).over(priorDays), lit(0L)).as("cum_offset"))
    val preCum = coalesce(
      sum(col("dc")).over(chunkOrder.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L)) + col("cum_offset")
    t.join(offsets, Seq("symbol", "chunk_day"))
      .withColumn("pre_cum", preCum)
      .withColumn("bar_id", expr(s"pre_cum div ${thresholdCents}L"))
      .groupBy(col("symbol"), col("bar_id"))
      .agg(
        count(lit(1)).as("n_ticks"),
        min_by(col("price"), tieKey).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), tieKey).as("close"),
        sum(col("volume")).as("bar_volume"),
        sum(col("dc")).as("bar_dollar_cents"))
      .orderBy("symbol", "bar_id")
  }

  /** Higher return moments per symbol (skewness, excess kurtosis): the
    * fat-tail dashboard risk teams keep next to [[volatility]].
    * Returns are rounded to 4 dp, WINSORIZED at ±100 (a +10000% tick
    * move is a data error, and the clip is what keeps Σr⁴ an exact
    * DECIMAL sum at ANY row count — |r|≤100 ⇒ r⁴≤1e8, so a (38,16)
    * accumulator holds ~1e14 rows with headroom), and re-summed as
    * DECIMAL (the q_beta pattern): Σr, Σr², Σr³, Σr⁴ are exact
    * order-free sums, and the closing moment identities run one fixed
    * double op sequence both engines replay bit-for-bit (sqrt is
    * IEEE-correctly-rounded, so var^1.5 = var·√var — no pow).
    */
  /** 4-dp winsorized tick return as an EXACT DECIMAL(12,4), quantized
    * by the same explicit float op sequence on both engines
    * (floor(s+0.5) / ceil(s−0.5) of s = ratio×1e4 — the QuantizeI8
    * pattern): `ROUND(double, 4)` itself is engine-divergent when the
    * true quotient sits exactly on a .5 boundary (200.01/200.00 − 1 =
    * 0.00005 — real ticks at sf0.1; DuckDB float-scales, Spark rounds
    * the exact binary value). floor/ceil are exact IEEE ops, so the
    * quantized integer — and every decimal power sum built on it — is
    * bit-identical across engines. Requires `prev` ≠ 0/NULL upstream.
    */
  private def winsorizedRet4: Column = {
    val d4 = DecimalType(12, 4)
    val s = (col("price") / col("prev") - 1) * 10000.0
    val q = when(s >= 0, floor(s + 0.5)).otherwise(ceil(s - 0.5))
    val r = (q.cast("long").cast(DecimalType(12, 0)) *
      lit(new java.math.BigDecimal("0.0001")).cast(DecimalType(5, 4))).cast(d4)
    least(greatest(r, lit(-100).cast(d4)), lit(100).cast(d4))
  }

  def higherMoments(ticks: DataFrame): DataFrame = {
    val d8 = DecimalType(13, 8)
    val rw = winsorizedRet4
    val withR =
      chunkedLag1(ticks.withColumn("chunk_day", to_date(col("ts"))), "price", "prev")
        .filter(col("prev").isNotNull && col("prev") =!= 0.0)
        .withColumn("r", rw)
        .withColumn("r2", (col("r") * col("r")).cast(d8))
    // round each exact decimal sum to 2 dp BEFORE the double cast: a
    // high-magnitude decimal with many fractional digits (Σr⁴ reaches
    // ~1e13·16dp at sf0.1) exceeds double's 53-bit mantissa, and the
    // two engines' decimal→double conversions then differ by 1 ulp —
    // enough to flip a 6-dp rounding boundary (caught by the sf0.1
    // parity sweep). A 2-dp decimal below ~9e13 converts EXACTLY on
    // both engines; the statistic shifts by ≤0.005/n, both engines
    // shifting identically.
    val m = withR.groupBy(col("symbol")).agg(
      count(lit(1)).as("n_rets"),
      round(sum(col("r")), 2).cast("double").as("sx"),
      round(sum(col("r2")), 2).cast("double").as("sxx"),
      round(sum(col("r2") * col("r")), 2).cast("double").as("sxxx"),
      round(sum(col("r2") * col("r2")), 2).cast("double").as("sxxxx"))
    val nd = col("n_rets").cast("double")
    val mean = col("sx") / nd
    val vr = col("sxx") / nd - mean * mean
    val m3 = col("sxxx") / nd - lit(3.0) * mean * (col("sxx") / nd) +
      lit(2.0) * mean * mean * mean
    val m4 = col("sxxxx") / nd - lit(4.0) * mean * (col("sxxx") / nd) +
      lit(6.0) * mean * mean * (col("sxx") / nd) -
      lit(3.0) * mean * mean * mean * mean
    // RAW doubles out, NO final round: every input converts exactly
    // and the identities run a mirrored IEEE op sequence, so the
    // doubles are bit-identical across engines — while ROUND(double,6)
    // itself is engine-divergent at float .5 boundaries (DuckDB scales
    // by 1e6 in float, Spark rounds the exact binary value; the sf0.1
    // parity sweep caught a real flip on var_ret pre-round-2)
    m.select(col("symbol"), col("n_rets"),
        mean.as("mean_ret"),
        vr.as("var_ret"),
        when(vr > 0.0, m3 / (vr * sqrt(vr))).as("skewness"),
        when(vr > 0.0, m4 / (vr * vr) - 3.0).as("excess_kurtosis"))
      .orderBy("symbol")
  }

  /** Intraday volatility curve: per (symbol, hour-of-day) root-mean-
    * square of tick returns — the U-shaped "volatility clock" every
    * execution desk schedules around (distinct from [[seasonality]],
    * which indexes price LEVELS by hour). Returns share
    * [[higherMoments]]' 4-dp ±100-winsorized exact-decimal convention;
    * Σr² is an exact decimal sum, and the single √(Σr²/n) closing op
    * is IEEE-correctly-rounded on both engines. Chunked lag + one
    * partial-agg shuffle of ≤24 rows per symbol.
    */
  def intradayVolCurve(ticks: DataFrame): DataFrame = {
    val d8 = DecimalType(13, 8)
    val rw = winsorizedRet4
    chunkedLag1(ticks.withColumn("chunk_day", to_date(col("ts"))), "price", "prev")
      .filter(col("prev").isNotNull && col("prev") =!= 0.0)
      .withColumn("r2", (rw * rw).cast(d8))
      .groupBy(col("symbol"), hour(col("ts")).cast("long").as("hod"))
      // round-2 before the cast: see higherMoments — keeps the
      // decimal→double conversion exact on both engines
      .agg(count(lit(1)).as("n_rets"),
        round(sum(col("r2")), 2).cast("double").as("s2"))
      // RAW double out, NO final round: s2 converts exactly, the
      // division and sqrt are deterministic IEEE ops, so the doubles
      // are bit-identical across engines — while a ROUND(double, 6)
      // is engine-divergent exactly at float .5 boundaries (DuckDB
      // scales by 1e6 in float, Spark rounds the exact binary value;
      // the sf0.1 parity sweep caught a real flip)
      .select(col("symbol"), col("hod"), col("n_rets"),
        sqrt(col("s2") / col("n_rets").cast("double")).as("rms_ret"))
      .orderBy("symbol", "hod")
  }

  /** Trade-size distribution: power-of-two volume buckets via integer
    * BIT LENGTH (length(bin(v)) − 1 == floor(log2 v) exactly — a float
    * log2 would wobble at the power-of-two boundaries), the standard
    * lot-size profile read. One partial-agg shuffle of ≤64 bucket
    * states per symbol.
    */
  def sizeHistogram(ticks: DataFrame): DataFrame =
    ticks.filter(col("volume") > 0)
      .withColumn("bucket", (length(bin(col("volume"))) - 1).cast("long"))
      .groupBy(col("symbol"), col("bucket"))
      .agg(count(lit(1)).as("n_ticks"), sum(col("volume")).as("sum_volume"),
        min(col("volume")).as("min_volume"), max(col("volume")).as("max_volume"))
      .orderBy("symbol", "bucket")

  /** Stale-price run report: per symbol, runs of consecutive ticks at
    * an unchanged price — the feed-health metric that catches a stuck
    * publisher or an untraded instrument. Change flags ride
    * [[chunkedLag1]]; run ids are the sessionize-style chunked
    * prefix-sum of the flags; per-run lengths then collapse to
    * per-symbol stats (run states only — the longest window any task
    * sees is one symbol-day).
    */
  def staleRuns(ticks: DataFrame): DataFrame = {
    val t = ticks.withColumn("chunk_day", to_date(col("ts")))
    val flagged = chunkedLag1(t, "price", "prev")
      .withColumn("is_new",
        when(col("prev").isNull ||
          col("price").cast(dec) =!= col("prev").cast(dec), 1L).otherwise(0L))
    val offsets = flagged.groupBy(col("symbol"), col("chunk_day"))
      .agg(sum(col("is_new")).as("day_total"))
      .select(col("symbol"), col("chunk_day"),
        coalesce(sum(col("day_total")).over(priorDays), lit(0L)).as("cum_offset"))
    flagged.join(offsets, Seq("symbol", "chunk_day"))
      .withColumn("run_id",
        sum(col("is_new")).over(chunkOrder.rowsBetween(Window.unboundedPreceding, 0))
          + col("cum_offset"))
      .groupBy(col("symbol"), col("run_id"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_runs"),
        max(col("len")).as("max_run"),
        sum(col("len") - 1).as("n_repeats"))
      .orderBy("symbol")
  }

  /** VPIN (volume-synchronized probability of informed trading,
    * Easley/López de Prado/O'Hara): ticks are signed by the tick rule,
    * grouped into volume-clock bars of `threshold` units, and VPIN at
    * each bar is Σ|buy−sell| / Σtotal over the trailing `n` bars — the
    * standard flow-toxicity metric on the volume clock.
    *
    * Composition of the chunked scaffolds: tick-rule sign via
    * [[chunkedLag1]], pre-tick cumulative volume via the chunked
    * prefix-sum (volumeBars shape) — ticks never cross a whole-symbol
    * window. The trailing-bar window runs over BAR STATES (tiny per
    * symbol: total volume / threshold rows), the barCascade posture.
    * All arithmetic is integer/decimal until the single final double
    * division → bit-identical across engines.
    */
  def vpin(ticks: DataFrame, threshold: Long, n: Int = 5): DataFrame = {
    // r15 (the r14 verdict's carried 5-scan finding): ONE per-day
    // aggregate carries BOTH chunk carries — the previous day's last
    // price (the chunkedLag1 boundary fill) and the prior-days volume
    // offset — so the detail side joins the tiny day table ONCE and
    // events is scanned twice total (detail + day aggregate), the
    // standard chunked-scaffold shape, instead of 5× through the
    // separate chunkedLag1/offsets branches. Same values: both windows
    // below share one (symbol, chunk_day) exchange+sort, and the
    // fills/sums are unchanged expressions.
    val t0 = ticks.withColumn("chunk_day", to_date(col("ts")))
    val dayInfo = t0.groupBy(col("symbol"), col("chunk_day"))
      .agg(max_by(col("price"), struct(col("ts"), col("event_id")))
          .as("day_last"),
        sum(col("volume")).as("day_total"))
      .select(col("symbol"), col("chunk_day"),
        lag(col("day_last"), 1)
          .over(Window.partitionBy("symbol").orderBy("chunk_day"))
          .as("prev_day_val"),
        coalesce(sum(col("day_total")).over(priorDays), lit(0L))
          .as("cum_offset"))
    val sign = when(col("prev").isNull, 0L)
      .when(col("price").cast(dec) > col("prev").cast(dec), 1L)
      .when(col("price").cast(dec) < col("prev").cast(dec), -1L)
      .otherwise(0L)
    val preCum = coalesce(
      sum(col("volume")).over(chunkOrder.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L)) + col("cum_offset")
    val bars = t0.join(dayInfo, Seq("symbol", "chunk_day"))
      .withColumn("prev",
        coalesce(lag(col("price"), 1).over(chunkOrder), col("prev_day_val")))
      .withColumn("sgn", sign)
      .withColumn("pre_cum", preCum)
      .withColumn("bar_id", expr(s"pre_cum div $threshold"))
      .groupBy(col("symbol"), col("bar_id"))
      .agg(sum(when(col("sgn") === 1L, col("volume")).otherwise(0L)).as("buy_vol"),
        sum(when(col("sgn") === -1L, col("volume")).otherwise(0L)).as("sell_vol"),
        sum(col("volume")).as("total_vol"))
    val wb = Window.partitionBy("symbol").orderBy("bar_id")
      .rowsBetween(-(n - 1), 0)
    bars.select(col("symbol"), col("bar_id"), col("buy_vol"), col("sell_vol"),
        col("total_vol"),
        round(sum(abs(col("buy_vol") - col("sell_vol"))).over(wb).cast("double") /
          sum(col("total_vol")).over(wb).cast("double"), 6).as("vpin"))
      .orderBy("symbol", "bar_id")
  }

  /** Ordinal-pattern census (the support of permutation entropy,
    * Bandt–Pompe m=3): each tick is classified by the weak ordering of
    * (p_{t−2}, p_{t−1}, p_t) — three decimal sign comparisons encoded
    * base-3 — and patterns are counted per symbol. Counting instead of
    * the entropy itself keeps everything EXACT INTEGERS (ln() is not
    * bit-identical across engines); the ≤27-row census is the
    * complexity fingerprint downstream tooling feeds into whatever log
    * base it likes. Lags of the RAW price ride [[chunkedFrame]] with 2
    * carries — carried prices are real values, so no layering concerns.
    */
  def ordinalPatterns(ticks: DataFrame, chunkRows: Long = 8192L): DataFrame = {
    val (t, spec) = chunkedFrame(ticks, 2, chunkRows)
    def s(x: Column, y: Column): Column =
      when(x > y, 2L).when(x < y, 0L).otherwise(1L)
    val pd = col("price").cast(dec)
    t.select(col("symbol"), col("carry"),
        lag(pd, 2).over(spec).as("a"), lag(pd, 1).over(spec).as("b"),
        pd.as("c"))
      .filter(!col("carry") && col("a").isNotNull)
      .withColumn("pattern",
        s(col("b"), col("a")) * 9 + s(col("c"), col("b")) * 3 +
          s(col("c"), col("a")))
      .groupBy(col("symbol"), col("pattern"))
      .agg(count(lit(1)).as("n"))
      .orderBy("symbol", "pattern")
  }

  /** Running-peak drawdown per symbol: price / running max − 1.
    * Identical operands on both engines → bit-identical quotient
    * (emitted unrounded); an all-zero-price prefix yields 0.
    */
  def drawdown(ticks: DataFrame): DataFrame = {
    // chunked prefix-MAX: running max = greatest(within-day running max,
    // max over all prior days); MAX is order-free so bit-identical to
    // the single-window plan. greatest() skips the NULL prior_max on
    // each symbol's first day.
    val t = ticks.withColumn("chunk_day", to_date(col("ts")))
    val offsets = t.groupBy(col("symbol"), col("chunk_day"))
      .agg(max(col("price")).as("day_max"))
      .select(col("symbol"), col("chunk_day"),
        max(col("day_max")).over(priorDays).as("prior_max"))
    val withinMax =
      max(col("price")).over(chunkOrder.rowsBetween(Window.unboundedPreceding, 0))
    t.join(offsets, Seq("symbol", "chunk_day"))
      .withColumn("run_max", greatest(withinMax, col("prior_max")))
      .withColumn("drawdown",
        when(col("run_max") > 0.0, col("price") / col("run_max") - 1.0).otherwise(0.0))
      .select(col("event_id"), col("symbol"), col("drawdown"))
      .orderBy("event_id")
  }

  /** Hopping (sliding) windows: 10-minute bars every 5 minutes — each
    * tick lands in two overlapping windows. Spark's native sliding
    * `window()`; the oracle mirrors the epoch-aligned window starts
    * with integer µs math.
    */
  def hoppingBars(ticks: DataFrame): DataFrame =
    ticks.groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("symbol"))
      .agg(count(lit(1)).as("n_ticks"),
        min(col("price")).as("low"), max(col("price")).as("high"),
        sum(col("volume")).as("volume"))
      .select(unix_micros(col("window.start")).as("win_start_us"), col("symbol"),
        col("n_ticks"), col("low"), col("high"), col("volume"))
      .orderBy("symbol", "win_start_us")

  /** Trailing time-window rolling average (RANGE frame, not ROWS): the
    * mean price over the last hour of wall-clock per symbol at every
    * tick — frames are defined by the event-time axis, so sparse and
    * dense periods weight correctly. Decimal-exact sum / count →
    * bit-identical quotient.
    */
  def rollingHourlyAvg(ticks: DataFrame): DataFrame = {
    // chunked-with-carry RANGE frame: calendar-day chunks; the 1-hour
    // lookback can only cross ONE day boundary, so each day's final
    // hour of rows is also emitted as carries into the next calendar
    // day — rows of a day D frame-reach at most into [D−1 23:00, D−1
    // 24:00), which is exactly the carry set. Identical in-frame
    // operand multiset ⇒ bit-identical to the whole-symbol window,
    // without one task owning a symbol's entire history.
    val rangeUs = 3600000000L
    val base = ticks.select(col("event_id"), col("symbol"),
        unix_micros(col("ts")).as("ts_us"), col("price"))
      .withColumn("chunk_day", to_date(timestamp_micros(col("ts_us"))))
    val nextDayStartUs =
      unix_micros(to_timestamp(date_add(col("chunk_day"), 1)))
    // in-place duplication via explode (see chunkedFrame): each day's
    // final hour of rows is emitted twice, the copy re-tagged +1 day
    val t = base
      .withColumn("carry",
        explode(when(col("ts_us") >= nextDayStartUs - rangeUs,
          array(lit(false), lit(true))).otherwise(array(lit(false)))))
      .withColumn("chunk_day",
        when(col("carry"), date_add(col("chunk_day"), 1))
          .otherwise(col("chunk_day")))
    val w = Window.partitionBy("symbol", "chunk_day").orderBy(col("ts_us"))
      .rangeBetween(-rangeUs, 0)
    t
      .select(col("event_id"), col("symbol"), col("carry"),
        (sum(col("price").cast(dec)).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as("avg_1h"))
      .filter(!col("carry"))
      .select(col("event_id"), col("symbol"), col("avg_1h"))
      .orderBy("event_id")
  }

  /** Stochastic oscillator %K/%D per symbol: %K = 100·(price − lowest)
    * / (highest − lowest) over an n-tick window; %D = 3-tick average of
    * %K. Highest/lowest are DECIMAL window extrema (exact, order-free);
    * the one double division happens last. %D adds three %K doubles in
    * a fixed left-to-right order via lag() — never a window SUM, whose
    * re-aggregation order differs between engines.
    * Flat windows (high = low) yield NULL in both engines.
    */
  def stochastic(ticks: DataFrame, n: Int = 14, chunkRows: Long = 8192L): DataFrame = {
    // LAYERED chunking: pct_d lags pct_k by up to 2 rows, and pct_k
    // needs an (n−1)-row frame — carry (n−1)+2 rows so the last two
    // carries (the only ones whose pct_k feeds a real row's pct_d)
    // still see their full frames. r11: extrema come from monotonic
    // deques in ONE sorted-group pass over the (symbol, chunk) groups
    // (O(1)/row — see [[MonoDeque]]) instead of O(n)/row window
    // frames; the %D lag ring rides the same pass. Emission mirrors
    // the window formulation operand-for-operand: cents differences
    // ARE the decimal differences, toDouble/100.0 IS the decimal
    // double cast, and ((k + k₁) + k₂)/3.0 keeps the left-assoc sum —
    // bit-identical (ChunkedEdgeSpec's monolithic-window fixture).
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    mmInput(ticks, n + 1, chunkRows)
      .as[MmIn]
      .groupByKey(r => (r.symbol, r.chunk_id))
      .flatMapSortedGroups(col("rn")) { case ((sym, _), it) =>
        val mx = new MonoDeque(n, takeMin = false)
        val mn = new MonoDeque(n, takeMin = true)
        var k1: java.lang.Double = null
        var k2: java.lang.Double = null
        it.flatMap { r =>
          mx.push(r.rn, r.cents); mn.push(r.rn, r.cents)
          val hh = mx.extreme; val ll = mn.extreme
          val k: java.lang.Double =
            if (hh > ll)
              100.0 * ((r.cents - ll).toDouble / 100.0) /
                ((hh - ll).toDouble / 100.0)
            else null
          val d: java.lang.Double =
            if (k != null && k1 != null && k2 != null)
              ((k.doubleValue + k1.doubleValue) + k2.doubleValue) / 3.0
            else null
          val out =
            if (r.carry) Iterator.empty
            else Iterator.single(StochRow(r.event_id, sym,
              Option(k).map(_.doubleValue), Option(d).map(_.doubleValue)))
          k2 = k1; k1 = k
          out
        }
      }
      .toDF()
      .orderBy("event_id")
  }

  /** Donchian channel per symbol: n-tick rolling high/low plus the
    * midline. Pure DECIMAL extrema (exact); the midline sums the two
    * decimals exactly before the single double halving.
    */
  def donchian(ticks: DataFrame, n: Int = 20, chunkRows: Long = 8192L): DataFrame = {
    // r11: monotonic-deque sorted-group pass (O(1)/row) replacing the
    // O(n)/row direct min/max frames; cents arithmetic is the decimal
    // arithmetic (exact), and (upC + loC).toDouble/100.0 equals the
    // exact-decimal-sum double cast — bit-identical emissions.
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    mmInput(ticks, n - 1, chunkRows)
      .as[MmIn]
      .groupByKey(r => (r.symbol, r.chunk_id))
      .flatMapSortedGroups(col("rn")) { case ((sym, _), it) =>
        val mx = new MonoDeque(n, takeMin = false)
        val mn = new MonoDeque(n, takeMin = true)
        it.flatMap { r =>
          mx.push(r.rn, r.cents); mn.push(r.rn, r.cents)
          if (r.carry) Iterator.empty
          else {
            val up = mx.extreme; val lo = mn.extreme
            Iterator.single(DonchianRow(r.event_id, sym,
              up.toDouble / 100.0, lo.toDouble / 100.0,
              (up + lo).toDouble / 100.0 / 2.0))
          }
        }
      }
      .toDF()
      .orderBy("event_id")
  }

  /** Average true range over daily bars: TR = max(high−low,
    * |high−prev_close|, |low−prev_close|), ATR(n) = n-day SMA of TR.
    * All components are DECIMAL differences of 2-dp prices (exact);
    * `greatest` skips the NULLs a missing prev_close produces in BOTH
    * engines (Spark and DuckDB both ignore NULL arguments), so the
    * first bar's TR degrades to high−low with no special-casing.
    * Builds on [[ohlcDaily]] — one agg shuffle plus one per-symbol
    * window sort; days per symbol are few, so the window state is tiny.
    */
  def atr(ticks: DataFrame, n: Int = 14): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val pc = lag(col("close").cast(dec), 1).over(dayOrder)
    val tr = greatest(
      col("high").cast(dec) - col("low").cast(dec),
      abs(col("high").cast(dec) - pc),
      abs(col("low").cast(dec) - pc))
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    ohlcDaily(ticks).withColumn("tr", tr)
      .select(col("symbol"), col("day"),
        col("tr").cast("double").as("true_range"),
        (sum(col("tr")).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as(s"atr$n"))
      .orderBy("symbol", "day")
  }

  /** Per-symbol market beta vs a benchmark symbol over daily
    * closes. Daily returns are rounded to 6 dp and re-summed as
    * DECIMAL, so Σx, Σy, Σxy, Σx² are exact and order-free; beta =
    * (Σxy − ΣxΣy/n)/(Σx² − (Σx)²/n) is then a fixed sequence of double
    * ops both engines execute identically (same trick as [[bollinger]]).
    * The benchmark's daily-return series is tiny (one row per day) and
    * broadcast onto every symbol's series — no shuffle of the fact side
    * beyond the daily rollup, which is what makes an all-symbol beta
    * feasible at 100 TB.
    */
  def betaDaily(ticks: DataFrame, benchmark: String): DataFrame = {
    val dec6 = DecimalType(18, 6)
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val closes = ticks.groupBy(col("symbol"), to_date(col("ts")).as("day"))
      .agg(max_by(col("price"), tieKey).cast(dec).as("c"))
    // 6-dp quantization via the shared float-op sequence (§4, the
    // realizedVol/winsorizedRet4 pattern): ROUND(double, 6) half-rounds
    // divergently between engines on the quantization boundary
    val sB = (col("c") - col("pc")).cast("double") /
      col("pc").cast("double") * 1000000.0
    val qB = when(sB >= 0, floor(sB + 0.5)).otherwise(ceil(sB - 0.5))
    val rets = closes
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull)
      .select(col("symbol"), col("day"),
        (qB.cast("long").cast(DecimalType(18, 0)) *
          lit(new java.math.BigDecimal("0.000001")).cast(DecimalType(7, 6)))
          .cast(dec6).as("r"))
    val bench = rets.filter(col("symbol") === benchmark)
      .select(col("day"), col("r").as("x"))
    val sq = DecimalType(38, 12)
    val joined = rets.join(broadcast(bench), "day")
    joined.groupBy(col("symbol"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("r")).cast("double").as("sy"),
        sum((col("x") * col("r")).cast(sq)).cast("double").as("sxy"),
        sum((col("x") * col("x")).cast(sq)).cast("double").as("sxx"),
        count(lit(1)).as("n_days"))
      .select(col("symbol"), col("n_days"),
        // ROUND(…,4): the scale-12 co-moment sums exceed 15 significant
        // digits on extreme tapes, so their decimal→double conversions
        // carry an engine-dependent 1-ulp — beta is then a quotient of
        // divergent inputs (the stddev class, §4), emitted 4-dp rounded
        // like q_volatility/q_autocorr (500k parity sweep)
        when(col("sxx") - (col("sx") * col("sx")) / col("n") =!= 0.0,
          round((col("sxy") - (col("sx") * col("sy")) / col("n")) /
            (col("sxx") - (col("sx") * col("sx")) / col("n")), 4)).as("beta"))
      .orderBy("symbol")
  }

  /** Candlestick pattern flags over daily bars: doji (body ≤ range/10),
    * hammer (long lower shadow, short upper), bullish/bearish engulfing
    * (body swallows the previous day's opposite-direction body). Every
    * test is a DECIMAL comparison — body·10 ≤ range instead of a
    * division — so the flags are exact in both engines; first-day rows
    * (NULL lag) fall through to 0 via identical CASE semantics.
    */
  def candlePatterns(ticks: DataFrame): DataFrame = {
    val o = col("open").cast(dec);  val h = col("high").cast(dec)
    val l = col("low").cast(dec);   val c = col("close").cast(dec)
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val body = abs(c - o)
    val po = lag(o, 1).over(dayOrder)
    val pc = lag(c, 1).over(dayOrder)
    ohlcDaily(ticks).select(col("symbol"), col("day"),
        when(body * 10 <= h - l, 1).otherwise(0).as("doji"),
        when(least(o, c) - l >= body * 2 && h - greatest(o, c) <= body, 1)
          .otherwise(0).as("hammer"),
        when(pc < po && c > o && o <= pc && c >= po, 1).otherwise(0).as("bull_engulf"),
        when(pc > po && c < o && o >= pc && c <= po, 1).otherwise(0).as("bear_engulf"))
      .orderBy("symbol", "day")
  }

  /** Lead-lag cross-correlation between two symbols: Pearson corr of
    * hourly mean prices with B shifted by −maxLag..+maxLag hours — the
    * "who moves first" discovery query. Rides the same tiny hourly
    * rollup as [[correlationMatrix]]; the lag spine (2·maxLag+1 rows)
    * cross-joins broadcast, so the fact side never re-shuffles per lag.
    */
  def leadLagCorr(ticks: DataFrame, symA: String, symB: String,
      maxLag: Int = 2): DataFrame = {
    val session = ticks.sparkSession
    import session.implicits._
    val hourly = ticks
      .groupBy(col("symbol"), date_trunc("hour", col("ts")).as("h"))
      .agg(exactAvg(col("price"), count(lit(1))).as("p"))
    val a = hourly.filter(col("symbol") === symA)
      .select(unix_micros(col("h")).as("hu"), col("p").as("p_a"))
    val b = hourly.filter(col("symbol") === symB)
      .select(unix_micros(col("h")).as("hu_b"), col("p").as("p_b"))
    val lags = (-maxLag to maxLag).map(_.toLong).toDF("lag_hours")
    a.crossJoin(broadcast(lags))
      .join(b, col("hu_b") === col("hu") + col("lag_hours") * 3600000000L)
      .groupBy("lag_hours")
      .agg(round(corr(col("p_a"), col("p_b")), 4).as("lag_corr"),
        count(lit(1)).as("n_hours"))
      .orderBy("lag_hours")
  }

  /** Pairs-trading dislocation report: OLS-hedge B against A on hourly
    * closes (exact 2-dp decimals — closes, not means, so no rounding
    * enters the moments), then rank the k largest |spread| hours.
    * α/β come from the same exact-decimal-sum identity as [[betaDaily]];
    * the per-hour spread is a fixed sequence of double ops, and the
    * single-row moment table broadcasts onto the (tiny) hourly series.
    */
  def pairsSpread(ticks: DataFrame, symA: String, symB: String,
      k: Int = 20): DataFrame = {
    val sq = DecimalType(38, 12)
    val hourly = ticks.groupBy(col("symbol"), date_trunc("hour", col("ts")).as("h"))
      .agg(max_by(col("price"), tieKey).cast(dec).as("p"))
    val a = hourly.filter(col("symbol") === symA).select(col("h"), col("p").as("pa"))
    val b = hourly.filter(col("symbol") === symB).select(col("h"), col("p").as("pb"))
    val j = a.join(b, "h")
    val m = j.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("pa")).cast("double").as("sa"),
      sum(col("pb")).cast("double").as("sb"),
      sum((col("pa") * col("pb")).cast(sq)).cast("double").as("sab"),
      sum((col("pb") * col("pb")).cast(sq)).cast("double").as("sbb"))
    val beta = (col("sab") - col("sa") * col("sb") / col("n")) /
      (col("sbb") - col("sb") * col("sb") / col("n"))
    j.crossJoin(broadcast(m))
      .withColumn("beta", beta)
      .withColumn("alpha",
        col("sa") / col("n") - col("beta") * (col("sb") / col("n")))
      .withColumn("spread", col("pa").cast("double") -
        (col("alpha") + col("beta") * col("pb").cast("double")))
      .withColumn("rk", row_number().over(
        Window.orderBy(abs(col("spread")).desc, col("h"))).cast("long"))
      .filter(col("rk") <= k)
      // the two engines' a−b·c sequences can differ by one ulp (fused
      // multiply-add); 4-dp rounding absorbs it, far from any .xxxx5 tie
      .select(col("rk"), unix_micros(col("h")).as("hour_us"),
        round(col("spread"), 4).as("spread"))
      .orderBy("rk")
  }

  /** Extreme-preserving downsample to ≤k points per symbol (chart/
    * preview export, the TSDB "downsample for visualization" op): ticks
    * bucket into k equal index ranges; each bucket keeps its most
    * deviant point (max |price − bucket mean|, event_id tiebreak), so
    * spikes survive where stride sampling would drop them. Bucket ids
    * use integer `div` (exact); the mean is the usual exact-decimal
    * sum/count; the rank-1 filter compiles to WindowGroupLimit, so each
    * map task forwards one candidate row per bucket.
    */
  def downsample(ticks: DataFrame, k: Int = 100): DataFrame = {
    val b = Window.partitionBy("symbol", "bucket")
    // global index from the prefix-sum row number; the per-symbol total
    // n rides the scaffold's own day table (r19 — was a third events
    // scan + broadcast join for a count the day table already knows)
    val base = withSymbolRowNumber(ticks, withTotal = true)
      .withColumn("i", col("rn") - 1)
      .withColumn("bucket", expr(s"(i * $k) div n"))
    val mean = sum(col("price").cast(dec)).over(b).cast("double") /
      count(lit(1)).over(b).cast("double")
    base.withColumn("dev", abs(col("price") - mean))
      .withColumn("rn", row_number().over(
        Window.partitionBy("symbol", "bucket")
          .orderBy(col("dev").desc, col("event_id"))))
      .filter(col("rn") === 1)
      .select(col("symbol"), col("bucket"), col("event_id"), col("price"),
        col("dev"))
      .orderBy("symbol", "bucket")
  }

  /** Per-symbol feed-health report: inter-tick gap count/max/mean plus
    * how many gaps exceed a staleness threshold — the monitoring query
    * behind a TSDB's "is this feed alive" dashboard. Gaps are exact
    * BIGINT µs differences; one window sort + one partial-agg shuffle.
    */
  def gapStats(ticks: DataFrame, thresholdSec: Int = 60): DataFrame = {
    val gapUs = unix_micros(col("ts")) - unix_micros(col("prev_ts"))
    chunkedLag1(ticks.withColumn("chunk_day", to_date(col("ts"))), "ts", "prev_ts")
      .withColumn("gap_us", gapUs)
      .filter(col("gap_us").isNotNull)
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_gaps"),
        max(col("gap_us")).as("max_gap_us"),
        round(sum(col("gap_us")).cast("double") /
          count(lit(1)).cast("double"), 4).as("avg_gap_us"),
        sum(when(col("gap_us") > thresholdSec * 1000000L, 1L).otherwise(0L))
          .as("n_stale"))
      .orderBy("symbol")
  }

  /** Roll's implied bid-ask spread: 2·√(−cov(Δp_t, Δp_{t-1})) per
    * symbol. Price changes are exact decimals, so the covariance
    * moments (Σd, Σd′, Σdd′) are order-free; the covariance and the
    * IEEE-correctly-rounded sqrt then run identical double ops on
    * both engines. Positive serial covariance (no spread signal) is
    * guarded to 0. One window shuffle + one partial aggregation.
    */
  def rollSpread(ticks: DataFrame, chunkRows: Long = 8192L): DataFrame = {
    // chunkedFrame with 2 carries: d lags price once, dl lags d again.
    // The first carry's d is NULL-degraded (its lag is outside the
    // chunk) but only feeds the second carry's dl — and carries never
    // reach the aggregation.
    val (t, spec) = chunkedFrame(ticks, 2, chunkRows)
    val pd = col("price").cast(dec)
    val withD = t
      .withColumn("d", pd - lag(pd, 1).over(spec))
      .withColumn("dl", lag(col("d"), 1).over(spec))
      .filter(!col("carry") && col("d").isNotNull && col("dl").isNotNull)
    val m = withD.groupBy(col("symbol")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("d")).cast("double").as("sx"),
      sum(col("dl")).cast("double").as("sy"),
      sum(col("d") * col("dl")).cast("double").as("sxy"))
    val nd = col("n_pairs").cast("double")
    // n_pairs = 1 ⇒ sample covariance undefined: NULL on both engines
    // (DuckDB's double x/0 is NULL; unguarded Spark ANSI throws —
    // caught by ChunkedEdgeSpec's single-pair symbols)
    val cov = when(nd > 1.0,
      (col("sxy") - col("sx") * col("sy") / nd) / (nd - 1.0))
    m.select(col("symbol"), col("n_pairs"),
        round(cov, 6).as("serial_cov"),
        when(cov < 0.0, round(sqrt(-cov) * 2.0, 6)).otherwise(0.0)
          .as("roll_spread"))
      .orderBy("symbol")
  }

  /** Amihud illiquidity (×10⁶): mean over days of |daily return| per
    * dollar volume. Daily closes are rank-1 order statistics, dollar
    * volume an exact decimal sum; each day's ratio is rounded to 6 dp
    * and averaged through an exact decimal sum, so the day order
    * never matters. Zero-volume / zero-close days are excluded on
    * both engines.
    */
  def amihud(ticks: DataFrame): DataFrame = {
    val rn = row_number().over(Window.partitionBy("symbol", "day")
      .orderBy(col("ts").desc, col("event_id").desc))
    val daily = ticks.withColumn("day", to_date(col("ts")))
      .withColumn("dv_part", col("price").cast(dec) * col("volume"))
      .withColumn("rn", rn)
    val closes = daily.filter(col("rn") === 1)
      .select(col("symbol"), col("day"), col("price"))
    val dv = daily.groupBy(col("symbol"), col("day"))
      .agg(sum(col("dv_part")).as("dv"))
    val prev = lag(col("price"), 1)
      .over(Window.partitionBy("symbol").orderBy("day"))
    closes.join(dv, Seq("symbol", "day"))
      .withColumn("prev", prev)
      .filter(col("prev").isNotNull && col("prev") =!= 0.0 &&
        col("dv") =!= lit(0).cast(dec))
      .withColumn("illiq",
        round(abs(col("price") / col("prev") - 1.0) / col("dv").cast("double")
          * 1000000.0, 6).cast(DecimalType(18, 6)))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_days"),
        round(sum(col("illiq")).cast("double") /
          count(lit(1)).cast("double"), 6).as("avg_illiq_e6"),
        max(col("illiq")).cast("double").as("max_illiq_e6"))
      .orderBy("symbol")
  }

  /** Kyle's lambda (price impact): per-symbol OLS slope of the tick
    * price change on tick-rule-signed volume, reported per 10k signed
    * shares. Same exact-decimal closed-form moments as [[trend]] —
    * every sum stays under 2^53 at test scales, so the double casts
    * are exact; at petabyte scale this runs per (symbol, day) where
    * the moment magnitudes reset daily. One window + one aggregation.
    */
  def priceImpact(ticks: DataFrame): DataFrame = {
    val dp = col("price").cast(dec) - col("prev").cast(dec)
    val withD = chunkedLag1(ticks.withColumn("chunk_day", to_date(col("ts"))),
        "price", "prev")
      .withColumn("dp", dp).filter(col("dp").isNotNull)
      .withColumn("x",
        (when(col("dp") > 0, 1L).when(col("dp") < 0, -1L).otherwise(0L) *
          col("volume")).cast(DecimalType(12, 0)))
    val m = withD.groupBy(col("symbol")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("dp")).cast("double").as("sy"),
      sum(col("x") * col("dp")).cast("double").as("sxy"),
      sum(col("x") * col("x")).cast("double").as("sxx"))
    val nd = col("n_pairs").cast("double")
    val denX = nd * col("sxx") - col("sx") * col("sx")
    m.select(col("symbol"), col("n_pairs"),
        when(denX === 0.0, 0.0)
          .otherwise(round((nd * col("sxy") - col("sx") * col("sy")) / denX
            * 10000.0, 6)).as("lambda_e4"))
      .orderBy("symbol")
  }

  /** SAX-style shape words: each (symbol, day) is segmented into six
    * 4-hour windows, each segment reduced to its exact-decimal mean
    * (PAA), and segments are ranked within the day — the word is the
    * rank letters in time order ('a' = cheapest segment). Rank-based
    * discretization instead of z-normalized Gaussian breakpoints keeps
    * every step integer/decimal-exact (no stddev, no sqrt), so the
    * words match across engines bit-for-bit. Two shuffles: segment
    * aggregation, then a day-partitioned rank window over ≤6 rows per
    * partition.
    */
  def saxWords(ticks: DataFrame): DataFrame = {
    val seg = (hour(col("ts")) / lit(4)).cast("int")
    val segs = ticks
      .groupBy(col("symbol"), to_date(col("ts")).as("day"), seg.as("seg"))
      .agg(exactAvg(col("price"), count(lit(1))).as("m"))
    val rk = rank().over(Window.partitionBy("symbol", "day")
      .orderBy(col("m"), col("seg")))
    segs.withColumn("letter", chr(rk + lit(96)))
      .groupBy(col("symbol"), col("day"))
      .agg(concat_ws("",
        transform(array_sort(collect_list(struct(col("seg"), col("letter")))),
          x => x.getField("letter"))).as("sax_word"),
        count(lit(1)).cast("long").as("n_segments"))
      .orderBy("symbol", "day")
  }

  /** Per-symbol OLS time trend: slope of price on tick time (whole
    * hours since 2024-01-01) from the classic closed-form moments.
    * Every moment (Σx, Σy, Σxy, Σx², Σy²) is an exact DECIMAL sum —
    * order-free and engine-identical — and hour-resolution x keeps
    * every moment under 2^53, so even the decimal→double casts are
    * EXACT (no conversion-rounding divergence; see q_realized_vol).
    * Slope/R² then come out through a fixed sequence of double ops.
    * One partial-agg shuffle; degenerate denominators guarded to 0 on
    * both engines.
    */
  def trend(ticks: DataFrame): DataFrame = {
    val baseS = 1704067200L // 2024-01-01T00:00:00Z
    val xd = expr(s"(unix_micros(ts) div 1000000 - ${baseS}L) div 3600")
      .cast(DecimalType(10, 0))
    val yd = col("price").cast(dec)
    val m = ticks.groupBy(col("symbol")).agg(
      count(lit(1)).as("n"),
      sum(xd).cast("double").as("sx"),
      sum(yd).cast("double").as("sy"),
      sum(xd * yd).cast("double").as("sxy"),
      sum(xd * xd).cast("double").as("sxx"),
      sum(yd * yd).cast("double").as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val denX = col("n") * col("sxx") - col("sx") * col("sx")
    val denY = col("n") * col("syy") - col("sy") * col("sy")
    m.select(col("symbol"), col("n"),
        when(denX === 0.0, 0.0)
          .otherwise(round(num / denX * 24.0, 6)).as("slope_per_day"),
        when(denX * denY === 0.0, 0.0)
          .otherwise(round(num * num / (denX * denY), 6)).as("r2"))
      .orderBy("symbol")
  }

  /** Hour-of-day seasonality index per symbol: hourly mean over overall
    * mean, both exact-decimal averages — the intraday profile used to
    * normalize volume/price curves. One shuffle; the per-symbol
    * overall mean broadcasts back onto 24 rows per symbol.
    */
  def seasonality(ticks: DataFrame): DataFrame = {
    val hourly = ticks
      .groupBy(col("symbol"), hour(col("ts")).cast("long").as("hod"))
      .agg(sum(col("price").cast(dec)).as("s"), count(lit(1)).as("c"))
    val overall = hourly.groupBy(col("symbol"))
      .agg(sum(col("s")).as("st"), sum(col("c")).as("ct"))
    hourly.join(broadcast(overall), "symbol")
      .select(col("symbol"), col("hod"), col("c").as("n_ticks"),
        round((col("s").cast("double") / col("c").cast("double")) /
          (col("st").cast("double") / col("ct").cast("double")), 6)
          .as("season_index"))
      .orderBy("symbol", "hod")
  }

  /** Late-arrival report: arrival order is `event_id` (the append
    * sequence); a tick is late when its event time precedes the
    * running max event time of everything that arrived before it.
    * Lateness totals stay in exact BIGINT µs. This is the batch
    * mirror of the streaming watermark decision — it measures how
    * much out-of-orderness a watermark would have to absorb.
    */
  def lateArrivals(ticks: DataFrame, chunkRows: Long = 100000L): DataFrame = {
    // chunked prefix-MAX over the ARRIVAL axis: the chunk key is an
    // event_id range (event_id is the global append sequence, so ranges
    // are contiguous in arrival order per symbol), not a day — the
    // running max must follow arrival order, not event time. maxPrior =
    // greatest(within-chunk prior max [NULL on chunk-first rows],
    // prior-chunk max [NULL on each symbol's first chunk]); both NULL ⇒
    // NULL ⇒ the existing not-late branch.
    val t = ticks
      .withColumn("chunk_id", expr(s"event_id div $chunkRows"))
      .withColumn("us", unix_micros(col("ts")))
    val priorChunks = Window.partitionBy("symbol").orderBy("chunk_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = t.groupBy(col("symbol"), col("chunk_id"))
      .agg(max(col("us")).as("chunk_max"))
      .select(col("symbol"), col("chunk_id"),
        max(col("chunk_max")).over(priorChunks).as("prior_max"))
    val arrival = Window.partitionBy("symbol", "chunk_id").orderBy("event_id")
    val maxPrior = greatest(
      max(col("us")).over(arrival.rowsBetween(Window.unboundedPreceding, -1)),
      col("prior_max"))
    t.join(offsets, Seq("symbol", "chunk_id"))
      .withColumn("late_us",
        when(maxPrior.isNotNull && col("us") < maxPrior,
          maxPrior - col("us")).otherwise(0L))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_ticks"),
        sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_late"),
        max(col("late_us")).as("max_late_us"),
        sum(col("late_us")).as("sum_late_us"))
      .orderBy("symbol")
  }

  /** Per-trade VWAP slippage: each purchase tick against its symbol's
    * daily VWAP, in (rounded) basis points. The VWAP ratio and the
    * slippage quotient run identical double ops on both engines. The
    * (symbol, day) VWAP table is deliberately UNHINTED: AQE broadcasts
    * it at every safe scale, and at 100 TB (50k symbols × years of
    * days) it degrades to a shuffle join instead of a driver OOM —
    * same policy as the chunked-scaffold offsets joins.
    */
  def slippage(ticks: DataFrame): DataFrame = {
    val vwap = ticks.groupBy(col("symbol"), to_date(col("ts")).as("day"))
      .agg((sum(col("price").cast(dec) * col("volume")).cast("double") /
        sum(col("volume")).cast("double")).as("vwap"))
    ticks.filter(col("symbol") === "purchase")
      .select(col("event_id"), col("symbol"), to_date(col("ts")).as("day"),
        col("price"))
      .join(vwap, Seq("symbol", "day"))
      .filter(col("vwap") =!= 0.0)
      .select(col("event_id"), col("day"), col("price"), col("vwap"),
        round((col("price") - col("vwap")) / col("vwap") * 10000.0, 4)
          .as("slippage_bp"))
      .orderBy("event_id")
  }

  /** Symbol catalog: the TSDB directory listing — per-symbol extent
    * metadata (count, time range, price range, active days, volume).
    * The distributed analog of the reference's per-symbol data
    * directory + `get_count` (/root/reference/timeseries_db.hpp).
    */
  def symbolCatalog(ticks: DataFrame): DataFrame =
    ticks.groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_ticks"),
        unix_micros(min(col("ts"))).as("first_ts_us"),
        unix_micros(max(col("ts"))).as("last_ts_us"),
        min(col("price")).as("min_price"),
        max(col("price")).as("max_price"),
        countDistinct(to_date(col("ts"))).as("n_days"),
        sum(col("volume")).as("total_volume"))
      .orderBy("symbol")

  /** Multi-resolution continuous-aggregate cascade: minute bars →
    * hourly bars → daily bars, each level re-aggregated FROM the level
    * below (the TSDB materialized-rollup pattern). After the first
    * minute aggregation, every later shuffle moves bar states only —
    * at 100 TB the hourly and daily levels cost |symbols × buckets|
    * rows, not the tick log. open/close propagate by `min_by`/`max_by`
    * on the sub-bar timestamp (unique within each parent bucket, so no
    * tie ambiguity above level 1).
    */
  def barCascade(ticks: DataFrame): DataFrame = {
    // level-1 open/close tie-break: the shared [[tieKey]]. Levels 2/3
    // key on the previous level's GROUP BY column, which is unique per
    // group — no tie-break needed there.
    val minute = ticks
      .groupBy(col("symbol"), date_trunc("minute", col("ts")).as("m"))
      .agg(min_by(col("price"), tieKey).as("open"),
        max(col("price")).as("high"), min(col("price")).as("low"),
        max_by(col("price"), tieKey).as("close"),
        sum(col("volume")).as("vol"), count(lit(1)).as("n"))
    val hour = minute
      .groupBy(col("symbol"), date_trunc("hour", col("m")).as("h"))
      .agg(min_by(col("open"), col("m")).as("open"),
        max(col("high")).as("high"), min(col("low")).as("low"),
        max_by(col("close"), col("m")).as("close"),
        sum(col("vol")).as("vol"), sum(col("n")).as("n"))
    hour
      .groupBy(col("symbol"), to_date(col("h")).as("day"))
      .agg(min_by(col("open"), col("h")).as("open"),
        max(col("high")).as("high"), min(col("low")).as("low"),
        max_by(col("close"), col("h")).as("close"),
        sum(col("vol")).as("volume"), sum(col("n")).as("n_ticks"))
      .orderBy("symbol", "day")
  }

  /** Order-flow imbalance via the tick rule: each tick is signed by its
    * price change vs the previous tick (flat and first ticks are
    * neutral), then buy/sell volume is aggregated per symbol-hour.
    * The imbalance is emitted in integer basis points (`(net*10000)
    * div total`) — pure BIGINT arithmetic, no float rounding to
    * diverge between engines.
    *
    * One sort-shuffle on symbol for the lag, then partial aggregation;
    * the hourly group states are all that reach the second exchange.
    */
  def ofi(ticks: DataFrame): DataFrame = {
    val prev = col("prev")
    val sign = when(prev.isNull, 0L)
      .when(col("price") > prev, 1L)
      .when(col("price") < prev, -1L)
      .otherwise(0L)
    chunkedLag1(ticks.withColumn("chunk_day", to_date(col("ts"))), "price", "prev")
      .withColumn("sign", sign)
      .groupBy(col("symbol"), date_trunc("hour", col("ts")).as("h"))
      .agg(
        sum(when(col("sign") === 1L, col("volume")).otherwise(0L)).as("buy_vol"),
        sum(when(col("sign") === -1L, col("volume")).otherwise(0L)).as("sell_vol"),
        count(lit(1)).as("n_ticks"))
      .withColumn("net_vol", col("buy_vol") - col("sell_vol"))
      .withColumn("imbalance_bp",
        when(col("buy_vol") + col("sell_vol") === 0L, 0L)
          .otherwise(expr("(net_vol * 10000) div (buy_vol + sell_vol)")))
      .select(col("symbol"), unix_micros(col("h")).as("hour_us"),
        col("buy_vol"), col("sell_vol"), col("net_vol"),
        col("imbalance_bp"), col("n_ticks"))
      .orderBy("symbol", "hour_us")
  }

  /** Realized variance from 5-minute close-to-close returns. The
    * interval close is the deterministic last tick per (symbol,
    * bucket) (rank-1 by ts desc, event_id desc — mirrored verbatim in
    * the oracle); each simple return is rounded to 6 dp and squared /
    * summed as an exact DECIMAL, so the aggregation is order-free.
    * Zero closes are excluded from the denominator (sf0.1 has them).
    */
  def realizedVol(ticks: DataFrame): DataFrame = {
    val bucketUs = 5L * 60L * 1000000L
    val rn = row_number().over(Window.partitionBy("symbol", "bucket")
      .orderBy(col("ts").desc, col("event_id").desc))
    val closes = ticks
      .withColumn("bucket", expr(s"unix_micros(ts) div ${bucketUs}L"))
      .withColumn("rn", rn)
      .filter(col("rn") === 1)
      .select(col("symbol"), col("bucket"), col("price"))
    val prev = lag(col("price"), 1)
      .over(Window.partitionBy("symbol").orderBy("bucket"))
    // 6-dp quantization via the SHARED float-op sequence (winsorizedRet4
    // pattern, §4): ROUND(double, 6) diverges when the scaled quotient
    // half-rounds differently than the exact binary expansion — caught
    // by the 500k-row parity sweep (one ≈100% return flipped a 6-dp
    // boundary; sf0.1 never hit it). floor/ceil on the same double are
    // exact IEEE ops, so the quantized rr is bit-identical both engines.
    val s6 = (col("price") / col("prev") - 1.0) * 1000000.0
    val q6 = when(s6 >= 0, floor(s6 + 0.5)).otherwise(ceil(s6 - 0.5))
    closes.withColumn("prev", prev)
      .filter(col("prev").isNotNull && col("prev") =!= 0.0)
      .withColumn("rr",
        (q6.cast("long").cast(DecimalType(18, 0)) *
          lit(new java.math.BigDecimal("0.000001")).cast(DecimalType(7, 6)))
          .cast(DecimalType(18, 6)))
      .groupBy("symbol")
      // round the exact scale-12 sum to 6 dp BEFORE the double cast:
      // a 6-dp decimal converts with a single correctly-rounded
      // division in both engines (scale-12 int128→double in DuckDB
      // double-rounds and can differ by an ulp)
      .agg(count(lit(1)).as("n_returns"),
        round(sum(col("rr") * col("rr")), 6).cast("double").as("realized_var"),
        max(abs(col("rr"))).cast("double").as("max_abs_r"))
      .orderBy("symbol")
  }

  /** Autocorrelation of the hourly mean-price series at lags 1..maxLag
    * hours, per symbol. Same exact-decimal hourly rollup as
    * `correlationMatrix`; the lagged pairing is an equi-join on the
    * epoch-µs hour shifted by whole hours (tiny aggregated tables, so
    * the join broadcasts; nothing re-shuffles the tick log per lag).
    */
  def autocorr(ticks: DataFrame, maxLag: Int = 3): DataFrame = {
    val hourly = ticks
      .groupBy(col("symbol"), date_trunc("hour", col("ts")).as("h"))
      .agg(exactAvg(col("price"), count(lit(1))).as("p"))
      .select(col("symbol"), unix_micros(col("h")).as("hu"), col("p"))
    val lags = hourly.sparkSession.range(1, maxLag + 1)
      .select(col("id").as("lag_hours"))
    val a = hourly.select(col("symbol"), col("hu"), col("p").as("p_now"))
      .crossJoin(lags)
    val b = hourly.select(col("symbol").as("symbol_b"), col("hu").as("hu_b"),
      col("p").as("p_lag"))
    a.join(b, col("symbol") === col("symbol_b") &&
        col("hu_b") === col("hu") - col("lag_hours") * 3600000000L)
      .groupBy(col("symbol"), col("lag_hours"))
      .agg(round(corr(col("p_now"), col("p_lag")), 4).as("acf"),
        count(lit(1)).as("n_hours"))
      .orderBy("symbol", "lag_hours")
  }

  /** Median-absolute-deviation outlier report per symbol. Median and
    * MAD are ORDER STATISTICS (lower median via rank = (n+1) div 2,
    * event_id tie-break), not interpolated quantiles — the selected
    * values are actual data points, so both engines agree bit-for-bit
    * and the `dev > 3*mad` cut has no rounding hazard at all.
    * Two window sorts (prices, then deviations) + one broadcast-back
    * join per stage; the per-symbol medians are single rows.
    */
  def madOutliers(ticks: DataFrame): DataFrame = {
    def lowerMedian(df: DataFrame, valueCol: String, out: String): DataFrame = {
      val w = Window.partitionBy("symbol").orderBy(col(valueCol), col("event_id"))
      df.withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("cnt", count(lit(1)).over(Window.partitionBy("symbol")))
        .filter(col("rn") === expr("(cnt + 1) div 2"))
        .select(col("symbol"), col(valueCol).as(out))
    }
    val med = lowerMedian(ticks, "price", "med")
    val withDev = ticks.join(broadcast(med), "symbol")
      .withColumn("dev", abs(col("price") - col("med")))
    val mad = lowerMedian(withDev, "dev", "mad")
    withDev.join(broadcast(mad), "symbol")
      .groupBy(col("symbol"))
      .agg(first(col("med")).as("med"), first(col("mad")).as("mad"),
        sum(when(col("dev") > col("mad") * 3.0, 1L).otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n_ticks"))
      .orderBy("symbol")
  }

  /** Approx MAD outlier report — the 100 TB scale path for
    * [[madOutliers]] (SURVEY §3.5): the exact operator needs two full
    * per-symbol WINDOW SORTS over the facts (prices, then deviations)
    * to select order-statistic medians; this variant reads the same
    * three-pass shape but computes both medians with
    * `percentile_approx` sketches — every pass is a hash aggregation
    * with map-side partials, and nothing is ever sorted. Rows-only
    * (sketch internals aren't cross-engine); its correctness contract
    * is the MarketOpsSpec gate against the exact operator's medians
    * and outlier counts.
    */
  def madOutliersApprox(ticks: DataFrame, accuracy: Int = 10000): DataFrame = {
    val med = ticks.groupBy(col("symbol"))
      .agg(percentile_approx(col("price"), lit(0.5), lit(accuracy)).as("med"))
    val withDev = ticks.join(broadcast(med), "symbol")
      .withColumn("dev", abs(col("price") - col("med")))
    val mad = withDev.groupBy(col("symbol"))
      .agg(percentile_approx(col("dev"), lit(0.5), lit(accuracy)).as("mad"))
    withDev.join(broadcast(mad), "symbol")
      .groupBy(col("symbol"))
      .agg(first(col("med")).as("med"), first(col("mad")).as("mad"),
        sum(when(col("dev") > col("mad") * 3.0, 1L).otherwise(0L)).as("n_outliers"),
        count(lit(1)).as("n_ticks"))
      .orderBy("symbol")
  }

  /** Forward as-of join: each left tick matches the FIRST right quote
    * at-or-after its timestamp (the mirror of `asofJoin`). Same
    * union-tag single-sort design, scanning forward: the match is a
    * forward-frame MIN over [current row, unbounded following] with
    * lefts ordered before same-ts rights (inclusive match). The
    * matched quote's PAYLOAD rides the same pass — the MIN runs over
    * `struct(r_us, r_price)` (whole-NULL on left rows, so MIN skips
    * them in both engines; r_us is unique per (key, ts) after dedup,
    * so the struct order is decided by r_us alone) — which removes the
    * r5 payload join-back and its second quote-side scan entirely.
    */
  def forwardAsofJoin(left: DataFrame, right: DataFrame,
      key: String = "user_id"): DataFrame = {
    val rDedup = right
      .withColumn("qrn", row_number().over(
        Window.partitionBy(col(key), col("ts")).orderBy(col("event_id"))))
      .filter(col("qrn") === 1)
      .select(col(key), unix_micros(col("ts")).as("r_us"),
        col("price").as("r_price"))
    val lTagged = left.select(col(key), unix_micros(col("ts")).as("us"),
      lit(0).as("_side"), col("event_id").as("l_event_id"),
      col("price").as("l_price"),
      lit(null).cast("struct<r_us:bigint,r_price:double>").as("q"))
    val rTagged = rDedup.select(col(key), col("r_us").as("us"),
      lit(1).as("_side"), lit(null).cast("long").as("l_event_id"),
      lit(null).cast("double").as("l_price"),
      struct(col("r_us"), col("r_price")).as("q"))
    val w = Window.partitionBy(key).orderBy(col("us"), col("_side"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    lTagged.unionByName(rTagged)
      .withColumn("m", min(col("q")).over(w))
      .filter(col("_side") === 0)
      .select(col("l_event_id").as("event_id"), col(key),
        col("us").as("ts_us"), col("l_price").as("price"),
        coalesce(col("m.r_us"), lit(-1L)).as("quote_ts_us"),
        coalesce(col("m.r_price"), lit(-1.0)).as("quote_price"))
      .orderBy("event_id")
  }

  /** Sessionize: new session when gap to previous tick > gapMinutes.
    * Lag + cumulative-flag-sum, both through the chunked prefix
    * aggregation (the obv shape): the boundary lag comes from the tiny
    * per-day last-ts table, the session id from within-day flag
    * cumsums + prior-day flag totals — no whole-symbol window.
    */
  def sessionize(ticks: DataFrame, gapMinutes: Int): DataFrame =
    sessionizeWithTs(ticks, gapMinutes)
      .select(col("event_id"), col("symbol"), col("session_id"))
      .orderBy("event_id")

  /** [[sessionize]] core that keeps `ts` on the output and skips the
    * final presentation sort (r19): aggregating consumers
    * ([[graft.operators.EventAnalytics.sessionStats]]) previously paid
    * a third events scan + a facts-sized event_id join to re-attach the
    * timestamp sessionize had just dropped, plus a global sort their
    * re-aggregation immediately discards.
    */
  private[graft] def sessionizeWithTs(ticks: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val t = ticks.withColumn("chunk_day", to_date(col("ts")))
    val flagged = chunkedLag1(t, "ts", "prev_ts")
      .withColumn("is_new", when(col("prev_ts").isNull ||
        unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapUs, 1L)
        .otherwise(0L))
    val offsets = flagged.groupBy(col("symbol"), col("chunk_day"))
      .agg(sum(col("is_new")).as("day_total"))
      .select(col("symbol"), col("chunk_day"),
        coalesce(sum(col("day_total")).over(priorDays), lit(0L)).as("cum_offset"))
    flagged.join(offsets, Seq("symbol", "chunk_day"))
      .select(col("event_id"), col("symbol"), col("ts"),
        (sum(col("is_new")).over(chunkOrder.rowsBetween(Window.unboundedPreceding, 0))
          + col("cum_offset")).as("session_id"))
  }

  /** Overnight gap report: each day's open vs the previous trading
    * day's close, in basis points — the gap-risk dashboard a
    * close-to-open strategy runs every morning. Rides the daily OHLC
    * aggregate (tie-keyed open/close picks), so the lag window runs
    * over one row per symbol-day — tiny at any scale; the tick log
    * shuffles once into the bars and never again.
    *
    * gap_bp is a RAW double with NO final round: the (o − pc) decimal
    * difference is exact, both decimals convert to double identically
    * (≤ 15 sig digits, correctly rounded), and the /·× op order is
    * mirrored verbatim in the oracle — a trailing ROUND(…,4) would be
    * the ONLY divergence (the 200.01/200.00 half-boundary class,
    * SURVEY §4).
    */
  def overnightGaps(ticks: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("day")
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        col("open").cast(dec).as("o"), col("close").cast(dec).as("c"))
      .withColumn("prev_close", lag(col("c"), 1).over(w))
      .filter(col("prev_close").isNotNull && col("prev_close") =!= 0)
      .select(col("symbol"), col("day"),
        col("prev_close").cast("double").as("prev_close"),
        col("o").cast("double").as("open"),
        ((col("o") - col("prev_close")).cast("double") /
          col("prev_close").cast("double") * 10000.0).as("gap_bp"))
      .orderBy("symbol", "day")
  }

  /** Volume profile: traded volume per fixed price band per symbol,
    * with each band's corpus share and the point of control (the
    * highest-volume band) flagged. Band assignment is exact integer
    * math on 2-dp cents (a double `price*100` cast would truncate
    * 28.999999996 → 28); one partial-agg shuffle of band states, then
    * the share/POC windows run over the ≤(price range / width) band
    * rows per symbol — an aggregate table, never ticks.
    *
    * share is a RAW double quotient of two exact BIGINTs (int→double
    * conversion is correctly rounded and IEEE division identical on
    * both engines) — no final round, which would be the only
    * divergence (SURVEY §4 half-boundary class).
    */
  def volumeProfile(ticks: DataFrame, bandCents: Long = 1000L): DataFrame = {
    val cents = (col("price").cast(dec) * 100).cast("long")
    val bands = ticks
      .withColumn("cents", cents)
      .withColumn("band", expr(s"cents div ${bandCents}L"))
      .groupBy(col("symbol"), col("band"))
      .agg(sum(col("volume")).as("band_volume"), count(lit(1)).as("n_ticks"))
    val sym = Window.partitionBy("symbol")
    bands
      .withColumn("total", sum(col("band_volume")).over(sym))
      .withColumn("poc",
        when(row_number().over(sym.orderBy(col("band_volume").desc,
          col("band"))) === 1, 1L).otherwise(0L))
      .select(col("symbol"), col("band"), col("band_volume"), col("n_ticks"),
        // total CAN be 0 when every tick in a symbol has zero volume —
        // ANSI Spark throws DIVIDE_BY_ZERO where DuckDB yields NULL
        when(col("total") =!= 0L,
          col("band_volume").cast("double") / col("total").cast("double"))
          .as("share"),
        col("poc"))
      .orderBy("symbol", "band")
  }

  /** Classic floor-trader pivot levels for each day, computed from the
    * PREVIOUS day's high/low/close: P = (h+l+c)/3, R1 = 2P − l,
    * S1 = 2P − h, R2 = P + (h − l), S2 = P − (h − l). The decimal
    * h+l+c sum is exact; the single /3.0 division and the level
    * arithmetic run the identical IEEE op order as the oracle, so the
    * levels are emitted as RAW doubles with NO final round — a
    * trailing ROUND(…,6) would be the only engine-divergent op when a
    * level sits on a 6-dp half boundary (SURVEY §4). Daily-bar sized —
    * one tick shuffle into the OHLC aggregate, lags over symbol-day
    * rows.
    */
  def pivotPoints(ticks: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("day")
    val bars = ohlcDaily(ticks).select(col("symbol"), col("day"),
      col("high").cast(dec).as("h"), col("low").cast(dec).as("l"),
      col("close").cast(dec).as("c"))
    val p = (col("ph") + col("pl") + col("pc")).cast("double") / 3.0
    bars
      .withColumn("ph", lag(col("h"), 1).over(w))
      .withColumn("pl", lag(col("l"), 1).over(w))
      .withColumn("pc", lag(col("c"), 1).over(w))
      .filter(col("ph").isNotNull)
      .withColumn("pivot", p)
      .select(col("symbol"), col("day"), col("pivot"),
        (lit(2.0) * col("pivot") - col("pl").cast("double")).as("r1"),
        (lit(2.0) * col("pivot") - col("ph").cast("double")).as("s1"),
        (col("pivot") + (col("ph") - col("pl")).cast("double")).as("r2"),
        (col("pivot") - (col("ph") - col("pl")).cast("double")).as("s2"))
      .orderBy("symbol", "day")
  }

  final case class CusumBar(symbol: String, day: java.sql.Date, c: java.math.BigDecimal)
  final case class CusumEvent(symbol: String, day: java.sql.Date, side: Long,
      excursion: Double)

  /** CUSUM event filter on daily closes (the López de Prado event-based
    * sampling rule): accumulate positive and negative close-to-close
    * drifts, emit an event and reset when either side's accumulator
    * clears the threshold. Genuinely recursive — a sorted-group pass
    * over the daily-bar states (tiny per symbol), the heikinAshi
    * posture. All arithmetic is EXACT 2-dp decimal (accumulate,
    * compare, reset), so the oracle's recursive CTE reproduces it
    * bit-for-bit with no float drift.
    */
  def cusumEvents(ticks: DataFrame, threshold: Double = 30.0): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    val h = java.math.BigDecimal.valueOf(threshold).setScale(2)
    val zero = java.math.BigDecimal.ZERO.setScale(2)
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .as[CusumBar]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        var prev: java.math.BigDecimal = null
        var sPos = zero; var sNeg = zero
        it.flatMap { b =>
          val out =
            if (prev == null) { prev = b.c; Iterator.empty }
            else {
              val d = b.c.subtract(prev)
              prev = b.c
              sPos = sPos.add(d).max(zero)
              sNeg = sNeg.add(d).min(zero)
              if (sPos.compareTo(h) > 0) {
                val e = CusumEvent(sym, b.day, 1L, sPos.doubleValue)
                sPos = zero; sNeg = zero
                Iterator.single(e)
              } else if (sNeg.compareTo(h.negate) < 0) {
                val e = CusumEvent(sym, b.day, -1L, sNeg.doubleValue)
                sPos = zero; sNeg = zero
                Iterator.single(e)
              } else Iterator.empty
            }
          out
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  // === NEW r9: daily-bar indicator family ============================
  // All six run on the [[ohlcDaily]] bar states (one tick shuffle into
  // the OHLC aggregate; every window below is over symbol-day rows —
  // a few thousand per symbol even at 10 years, so direct bounded
  // frames are fine and the 100 TB cost is the single bar aggregate).

  /** 6-dp quantization of a double via the shared float-op sequence
    * (SURVEY §4, the betaDaily/realizedVol pattern): scale by 1e6,
    * FLOOR(s+0.5)/CEIL(s−0.5), rebuild as DECIMAL(18,6). ROUND(d, 6)
    * half-rounds divergently between engines on the boundary; this
    * sequence is the identical IEEE ops on both.
    */
  private def quant6(s: Column): Column = {
    val q = when(s >= 0, floor(s + 0.5)).otherwise(ceil(s - 0.5))
    (q.cast("long").cast(DecimalType(18, 0)) *
      lit(new java.math.BigDecimal("0.000001")).cast(DecimalType(7, 6)))
      .cast(DecimalType(18, 6))
  }

  /** NEW r11: range-based volatility estimators over daily bars —
    * Parkinson, Garman–Klass, and Rogers–Satchell, the OHLC-range
    * family a market-data user expects next to close-close realized
    * vol (each extracts ~5× more information per bar than
    * close-to-close). Per symbol over the full tape:
    *   σ²_P  = Σ(ln(h/l))² / (4·ln2·n)
    *   σ²_GK = (0.5·Σ(ln(h/l))² − (2ln2−1)·Σ(ln(c/o))²) / n
    *   σ²_RS = Σ(ln(h/c)ln(h/o) + ln(l/c)ln(l/o)) / n
    *
    * Engine-parity posture (the §4-r10 libm rule: ln differs by 1 ulp
    * between JVM and DuckDB on ~2e-4 of inputs, so ln output must
    * never feed a RAW emission or an order-dependent float sum): each
    * per-bar ln term is 6-dp QUANTIZED via the shared float-op
    * sequence ([[quant6]]) into DECIMAL(18,6); squares/products run
    * (19,6)×(18,6) → (38,12) (exact on both engines, CLAUDE.md width
    * rule), sums are order-free exact decimals rounded to 8 dp before
    * the (then-exact) double conversion, and every remaining op —
    * division, the 4ln2 / 2ln2−1 double literals, sqrt (IEEE
    * correctly-rounded, bit-identical) — is a mirrored IEEE sequence,
    * so the emission is RAW with no divergent final round. Bars with
    * non-positive lows are excluded on both engines (ln domain).
    * GK's variance is mathematically ≥ 0.1137·σ²_P ≥ 0 (|ln(c/o)| ≤
    * ln(h/l), preserved by monotone quantization) — the sqrt guard is
    * belt-and-braces, mirrored.
    *
    * One bar aggregate + one tiny per-symbol aggregate — no windows,
    * no shuffle beyond the OHLC rollup; scale cost is the bar rollup.
    */
  def rangeVol(ticks: DataFrame): DataFrame = {
    // squares land in (30,12), NOT (38,12): adding two width-38
    // decimals exceeds precision 38, where Spark TRIMS THE SCALE
    // (allowPrecisionLoss) while DuckDB keeps it — (30,12)+(30,12) →
    // (31,12) stays in-width and exact on both engines. |ln terms| are
    // bounded far below the 18 integer digits (30,12) allows.
    def sq(a: Column, b: Column): Column =
      (a.cast(DecimalType(19, 6)) * b).cast(DecimalType(30, 12))
    val bars = ohlcDaily(ticks).filter(col("low") > 0.0)
    val t = bars.select(col("symbol"),
      quant6(log(col("high") / col("low")) * 1000000.0).as("u"),
      quant6(log(col("close") / col("open")) * 1000000.0).as("v"),
      quant6(log(col("high") / col("close")) * 1000000.0).as("hc"),
      quant6(log(col("high") / col("open")) * 1000000.0).as("ho"),
      quant6(log(col("low") / col("close")) * 1000000.0).as("lc"),
      quant6(log(col("low") / col("open")) * 1000000.0).as("lo"))
    val a = t.groupBy(col("symbol")).agg(
      count(lit(1)).as("n_days"),
      sum(sq(col("u"), col("u"))).as("su"),
      sum(sq(col("v"), col("v"))).as("sv"),
      sum(sq(col("hc"), col("ho")) + sq(col("lc"), col("lo"))).as("srs"))
    val nD = col("n_days").cast("double")
    val suD = round(col("su"), 8).cast("double")
    val svD = round(col("sv"), 8).cast("double")
    val srsD = round(col("srs"), 8).cast("double")
    val gkv = (lit(0.5) * suD - lit(0.3862943611198906) * svD) / nD
    a.select(col("symbol"), col("n_days"),
        sqrt(suD / (nD * 2.772588722239781)).as("park_vol"),
        when(gkv >= 0, sqrt(gkv)).as("gk_vol"),
        sqrt(srsD / nD).as("rs_vol"))
      .orderBy("symbol")
  }

  /** Money Flow Index over daily bars: MFI(n) = 100·pos/(pos+neg)
    * where pos/neg are the n-day sums of raw money flow (typical
    * price × volume) on up/down days. Works on 3×TP = h+l+c (the /3
    * cancels in the ratio) so the flow is an EXACT decimal
    * (h+l+c)·volume — the DECIMAL(20,2) cast forces DuckDB's INT128
    * multiply path (int64-stored decimal products overflow on extreme
    * tapes, the q_beta class). Emitted ROUND(…,4): the window flow
    * sums exceed 15 significant digits on large tapes, so their
    * decimal→double conversions carry the 1-ulp engine skew (the
    * stddev class, SURVEY §4).
    */
  def mfi(ticks: DataFrame, n: Int = 14): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    val big = DecimalType(38, 2)
    val t = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("volume"),
        (col("high").cast(dec) + col("low").cast(dec) +
          col("close").cast(dec)).as("hlc"))
      .withColumn("prev", lag(col("hlc"), 1).over(dayOrder))
      .withColumn("flow",
        (col("hlc").cast(DecimalType(20, 2)) * col("volume")).cast(big))
      .withColumn("pos_f", when(col("prev").isNotNull &&
        col("hlc") > col("prev"), col("flow")).otherwise(lit(0).cast(big)))
      .withColumn("neg_f", when(col("prev").isNotNull &&
        col("hlc") < col("prev"), col("flow")).otherwise(lit(0).cast(big)))
    t.select(col("symbol"), col("day"),
        sum(col("pos_f")).over(w).as("pos"),
        sum(col("neg_f")).over(w).as("neg"))
      .select(col("symbol"), col("day"),
        when(col("pos") + col("neg") =!= 0,
          round(lit(100.0) * col("pos").cast("double") /
            (col("pos") + col("neg")).cast("double"), 4)).as(s"mfi$n"))
      .orderBy("symbol", "day")
  }

  /** Chaikin Money Flow over daily bars: CMF(n) = Σ(MFM·vol)/Σvol with
    * MFM = ((c−l)−(h−c))/(h−l) = (2c−h−l)/(h−l). The multiplier is the
    * one true division — quantized to 6 dp via [[quant6]] so the
    * money-flow volumes re-sum as EXACT decimals (order-free window
    * sums); h = l contributes 0 by convention (and dodges the ANSI
    * DIVIDE_BY_ZERO that DuckDB would map to NULL). Final quotient
    * ROUND(…,4) — wide flow sums are the stddev class.
    */
  def cmf(ticks: DataFrame, n: Int = 20): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    val t = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("volume"),
        (lit(2) * col("close").cast(dec) - col("high").cast(dec) -
          col("low").cast(dec)).as("num"),
        (col("high").cast(dec) - col("low").cast(dec)).as("den"))
      .withColumn("mfm6", when(col("den") =!= 0,
        quant6(col("num").cast("double") / col("den").cast("double")
          * 1000000.0)).otherwise(lit(0).cast(DecimalType(18, 6))))
      .withColumn("mfv",
        (col("mfm6").cast(DecimalType(20, 6)) * col("volume"))
          .cast(DecimalType(38, 6)))
    t.select(col("symbol"), col("day"),
        sum(col("mfv")).over(w).as("sflow"),
        sum(col("volume")).over(w).as("svol"))
      .select(col("symbol"), col("day"),
        when(col("svol") =!= 0,
          round(col("sflow").cast("double") /
            col("svol").cast("double"), 4)).as(s"cmf$n"))
      .orderBy("symbol", "day")
  }

  /** Commodity Channel Index over daily bars, EXACT-decimal mean
    * deviation: with S = Σ_w(h+l+c) and m = |w|, the textbook
    * CCI = (TP−SMA)/(0.015·MD) rescales to
    * (m·hlc_i − S)·m·200 / (3·Σ_j|m·hlc_j − S|) — every term an exact
    * decimal, ONE double division at the end, raw doubles both engines
    * compute identically (all raw decimal magnitudes stay below 2^53,
    * so the decimal→double conversions are exact).
    *
    * The mean-deviation sum references the CURRENT row's S inside the
    * window — not expressible as a plain frame. Instead each bar j is
    * exploded onto the n target rows it participates in and
    * equi-joined back on (symbol, row_number): linear in bars (×n), no
    * quadratic within-symbol pair blowup, all on bar states.
    */
  def cci(ticks: DataFrame, n: Int = 20): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    val bars = ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        (col("high").cast(dec) + col("low").cast(dec) +
          col("close").cast(dec)).as("hlc"))
      .withColumn("rn", row_number().over(dayOrder))
      .withColumn("s", sum(col("hlc")).over(w).cast(DecimalType(38, 2)))
      .withColumn("m", count(lit(1)).over(w))
    val contrib = bars.select(col("symbol").as("c_symbol"),
        col("hlc").as("hlc_j"),
        explode(sequence(col("rn"), col("rn") + lit(n - 1))).as("trn"))
    contrib.join(bars,
        contrib("c_symbol") === bars("symbol") && contrib("trn") === bars("rn"))
      .groupBy(col("symbol"), col("rn"), col("day"), col("hlc"),
        col("s"), col("m"))
      .agg(sum(abs((col("m") * col("hlc_j")).cast(DecimalType(38, 2)) -
        col("s"))).as("d"))
      .select(col("symbol"), col("day"),
        when(col("d") =!= 0,
          (((col("m") * col("hlc")).cast(DecimalType(38, 2)) - col("s"))
            .cast(DecimalType(20, 2)) * col("m")).cast("double") /
            (lit(3) * col("d")).cast("double") * 200.0).as(s"cci$n"))
      .orderBy("symbol", "day")
  }

  /** Ulcer Index over daily bars: UI(n) = 100·√(Σ_w r² / m) where r is
    * the drawdown fraction (c − max_w c)/max_w c, 6-dp quantized via
    * [[quant6]] so the squared terms re-sum as EXACT decimals. Prices
    * are non-negative so r ∈ (−1, 0] and every raw decimal stays far
    * below 2^53 — conversions exact, one IEEE divide + correctly-
    * rounded √, emitted RAW (a trailing round would be the only
    * divergent op, SURVEY §4). All-zero-price windows (max = 0) yield
    * NULL under the ANSI divide guard.
    */
  def ulcerIndex(ticks: DataFrame, n: Int = 14): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("mx", max(col("c")).over(w))
      .withColumn("r6", when(col("mx") =!= 0,
        quant6((col("c") - col("mx")).cast("double") /
          col("mx").cast("double") * 1000000.0)))
      .withColumn("sq",
        // (18,6)×(18,6) = (37,12) stays under Spark's 38 cap — EXACT;
        // the INT128-forcing DECIMAL(20,6) cast lives only in the
        // DuckDB oracle (in Spark it would push precision to 39 and
        // trigger silent scale-reduction rounding)
        (col("r6") * col("r6")).cast(DecimalType(38, 12)))
      .select(col("symbol"), col("day"),
        (lit(100.0) * sqrt(sum(col("sq")).over(w).cast("double") /
          count(col("sq")).over(w).cast("double"))).as(s"ulcer$n"))
      .orderBy("symbol", "day")
  }

  /** Lo–MacKinlay variance ratio on daily closes:
    * VR(q) = Var(r_q)/(q·Var(r_1)) over 6-dp-quantized daily returns
    * ([[quant6]], the betaDaily series). The q-day returns are the
    * EXACT decimal difference of the running prefix sum and its
    * lag(q) — no re-summing of doubles; variances close over exact
    * decimal Σr/Σr² (INT128-forced squares) in mirrored double op
    * order, ROUND(…,4) (the stddev class). VR ≈ 1 under a random
    * walk; <1 mean-reversion, >1 trending.
    */
  def varianceRatio(ticks: DataFrame, q: Int = 5): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val sq = DecimalType(38, 12)
    val rets = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull && col("pc") =!= 0)
      .select(col("symbol"), col("day"),
        quant6((col("c") - col("pc")).cast("double") /
          col("pc").cast("double") * 1000000.0).as("r"))
      .withColumn("rn", row_number().over(dayOrder))
      .withColumn("cum", sum(col("r")).over(
        dayOrder.rowsBetween(Window.unboundedPreceding, 0))
        .cast(DecimalType(38, 6)))
    // rq fits DECIMAL(18,6) with ~20× headroom (|r| ≤ 5e4 even on the
    // adversarial min-price tape, so |rq| ≤ 2.5e5 ≪ 1e12); narrowing
    // keeps the square at (37,12) — exact under Spark's 38 cap (the
    // INT128-forcing 20-digit casts live only in the DuckDB oracle)
    val withQ = rets.withColumn("rq", when(col("rn") >= q,
      (col("cum") - coalesce(lag(col("cum"), q).over(dayOrder),
        lit(0).cast(DecimalType(38, 6)))).cast(DecimalType(18, 6))))
    withQ.groupBy(col("symbol"))
      .agg(count(col("r")).as("n_days"),
        count(col("r")).cast("double").as("n1"),
        sum(col("r")).cast("double").as("s1"),
        sum((col("r") * col("r")).cast(sq)).cast("double").as("s2"),
        count(col("rq")).cast("double").as("nq"),
        sum(col("rq")).cast("double").as("t1"),
        sum((col("rq") * col("rq")).cast(sq)).cast("double").as("t2"))
      .select(col("symbol"), col("n_days"),
        when(col("nq") > 0 &&
          col("s2") / col("n1") - (col("s1") / col("n1")) *
            (col("s1") / col("n1")) =!= 0.0,
          round((col("t2") / col("nq") - (col("t1") / col("nq")) *
            (col("t1") / col("nq"))) /
            (lit(q.toDouble) * (col("s2") / col("n1") -
              (col("s1") / col("n1")) * (col("s1") / col("n1")))), 4))
          .as(s"vr$q"))
      .orderBy("symbol")
  }

  /** Ichimoku Kinkō Hyō over daily bars: tenkan (9), kijun (26),
    * senkou A/B shifted 26 forward (today's cloud comes from bars 26
    * back — a lag), chikou (close shifted 26 back — a lead). Every
    * line is (max+min)/2 over EXACT decimal extrema: the decimal sum
    * converts to double exactly (raw « 2^53), halving is an exponent
    * decrement (always exact), and senkou A's (tenkan+kijun)/2 is one
    * correctly-rounded IEEE add both engines execute identically —
    * raw doubles, no rounding anywhere. Partial windows at series
    * start use the available bars (both engines agree); the 26-bar
    * shifts produce the same leading/trailing NULLs.
    */
  def ichimoku(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    def mid(n: Int): Column = {
      val w = dayOrder.rowsBetween(-(n - 1), 0)
      (max(col("h")).over(w) + min(col("l")).over(w)).cast("double") / 2.0
    }
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        col("high").cast(dec).as("h"), col("low").cast(dec).as("l"),
        col("close").cast(dec).as("c"))
      .withColumn("tenkan", mid(9))
      .withColumn("kijun", mid(26))
      .withColumn("span_b0", mid(52))
      .select(col("symbol"), col("day"), col("tenkan"), col("kijun"),
        lag((col("tenkan") + col("kijun")) / 2.0, 26).over(dayOrder)
          .as("senkou_a"),
        lag(col("span_b0"), 26).over(dayOrder).as("senkou_b"),
        lead(col("c").cast("double"), 26).over(dayOrder).as("chikou"))
      .orderBy("symbol", "day")
  }

  // === NEW r9b: momentum / regime / calendar family ==================

  /** Williams %R per symbol: −100·(HH − c)/(HH − LL) over an n-tick
    * window — the [[stochastic]] class with the complementary
    * numerator. DECIMAL window extrema (exact, order-free), ONE double
    * division, RAW emission (every operand converts exactly; the
    * −100·x multiply and the divide are single IEEE ops both engines
    * execute identically). Flat windows (HH = LL) yield NULL in both
    * engines. Chunked-with-carry frame — no whole-symbol window task.
    */
  def williamsR(ticks: DataFrame, n: Int = 14, chunkRows: Long = 8192L): DataFrame = {
    // r11: deque pass (see [[donchian]]); −100·a/b mirrors the window
    // formulation's (−100.0 · cast(hh−p)) / cast(hh−ll) op order.
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    mmInput(ticks, n - 1, chunkRows)
      .as[MmIn]
      .groupByKey(r => (r.symbol, r.chunk_id))
      .flatMapSortedGroups(col("rn")) { case ((sym, _), it) =>
        val mx = new MonoDeque(n, takeMin = false)
        val mn = new MonoDeque(n, takeMin = true)
        it.flatMap { r =>
          mx.push(r.rn, r.cents); mn.push(r.rn, r.cents)
          if (r.carry) Iterator.empty
          else {
            val hh = mx.extreme; val ll = mn.extreme
            val wr: java.lang.Double =
              if (hh > ll)
                -100.0 * ((hh - r.cents).toDouble / 100.0) /
                  ((hh - ll).toDouble / 100.0)
              else null
            Iterator.single(WrRow(r.event_id, sym,
              Option(wr).map(_.doubleValue)))
          }
        }
      }
      .toDF()
      .withColumnRenamed("wr", s"wr$n")
      .orderBy("event_id")
  }

  /** n-tick rate of change (momentum): 100·(p − p_{−n})/p_{−n} per
    * symbol. The numerator is an EXACT decimal difference; one double
    * division then one ×100.0 multiply, mirrored op order — RAW
    * emission. NULL for the first n ticks and across zero reference
    * prices (ANSI divide guard; DuckDB maps x/0 to NULL — mirrored
    * with an explicit CASE). Chunked lag — carry n rows.
    */
  def roc(ticks: DataFrame, n: Int = 10, chunkRows: Long = 8192L): DataFrame = {
    val (t, spec) = chunkedFrame(ticks, n, chunkRows)
    val pn = lag(col("price"), n).over(spec)
    val r = when(pn.isNotNull && pn =!= 0.0,
      (col("price").cast(dec) - pn.cast(dec)).cast("double") /
        pn.cast(dec).cast("double") * 100.0)
    t.select(col("event_id"), col("symbol"), col("carry"), r.as(s"roc$n"))
      .filter(!col("carry"))
      .select(col("event_id"), col("symbol"), col(s"roc$n"))
      .orderBy("event_id")
  }

  /** Up/down streak census on daily closes: per symbol × direction
    * (+1 up, −1 down, 0 flat) × run length, how many runs occurred —
    * the gaps-and-islands grouping (rn − rn_within_direction is
    * constant inside a run). Directions come from EXACT decimal close
    * comparisons; everything else is integer counting. Windows are
    * over symbol-day bars (few thousand rows per symbol even at 10
    * years), keyed on the high-cardinality symbol.
    */
  def streaks(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val bars = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull)
      .withColumn("dir",
        when(col("c") > col("pc"), 1L)
          .when(col("c") < col("pc"), -1L).otherwise(0L))
      .withColumn("rn", row_number().over(dayOrder).cast("long"))
      .withColumn("rnd", row_number().over(
        Window.partitionBy("symbol", "dir").orderBy("day")).cast("long"))
    bars.groupBy(col("symbol"), col("dir"), (col("rn") - col("rnd")).as("grp"))
      .agg(count(lit(1)).as("run_len"))
      .groupBy(col("symbol"), col("dir").as("direction"), col("run_len"))
      .agg(count(lit(1)).as("n_runs"))
      .orderBy("symbol", "direction", "run_len")
  }

  /** Time underwater: for each symbol-day, days since the running-max
    * close was last set (0 on new-high days) — the drawdown-duration
    * companion of [[drawdown]]. The peak day is the LATEST day whose
    * close equals the running max (MAX over a CASE — order-free,
    * deterministic, NULL-skipping in both engines); the output is a
    * pure integer date difference. Bar-level windows only.
    */
  def underwater(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val run = dayOrder.rowsBetween(Window.unboundedPreceding, 0)
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("mx", max(col("c")).over(run))
      .withColumn("peak_day",
        max(when(col("c") === col("mx"), col("day"))).over(run))
      .select(col("symbol"), col("day"),
        datediff(col("day"), col("peak_day")).cast("long")
          .as("days_underwater"))
      .orderBy("symbol", "day")
  }

  /** Dollar-turnover league table: symbols ranked by total traded
    * notional (exact DECIMAL price×volume sums — the INT128-forcing
    * cast lives in the oracle), with each symbol's share of corpus
    * turnover as a RAW decimal-quotient double. One counter-row
    * aggregate; the rank is a full sort of one row per symbol.
    */
  def turnoverRank(ticks: DataFrame): DataFrame = {
    val t = ticks.groupBy(col("symbol"))
      .agg(sum((col("price").cast(dec) * col("volume"))
        .cast(DecimalType(38, 2))).as("notional"),
        count(lit(1)).as("n_ticks"))
    val total = t.agg(sum(col("notional")).cast(DecimalType(38, 2))
      .as("total_notional"))
    t.crossJoin(broadcast(total))
      .select(col("symbol"), col("n_ticks"), col("notional"),
        col("notional").cast("double").as("turnover"),
        when(col("total_notional") =!= 0,
          col("notional").cast("double") /
            col("total_notional").cast("double")).as("turnover_share"))
      // rank on the EXACT decimal notional, not its double image: once
      // totals pass ~15 significant digits the decimal→double conversion
      // can differ by 1 ulp between engines and flip near-tie ranks;
      // decimal comparison is exact on both (r10 ADVICE fix)
      .withColumn("rk", row_number().over(
        Window.orderBy(col("notional").desc, col("symbol"))).cast("long"))
      .select(col("rk"), col("symbol"), col("n_ticks"), col("turnover"),
        col("turnover_share"))
      .orderBy("rk")
  }

  /** Weekly cross-sectional momentum backtest: rank symbols each week
    * by the PREVIOUS week's return (no look-ahead), cut into
    * quartiles (ntile — both engines use the standard larger-first
    * bucket split, ordered on the exact quant6 signal with a symbol
    * tiebreak), and report the realized winner-minus-loser quartile
    * spread. Weekly closes are the last trading day's bar close
    * (max_by on the unique day — deterministic); returns are quant6
    * decimals, quartile means exact decimal sums over one double
    * division each, the spread one further IEEE subtract — RAW.
    * The per-week rank sorts all symbols in one task (inherent to a
    * cross-sectional cut; 50k symbols/week is a small sort).
    */
  def momentumQuartiles(ticks: DataFrame): DataFrame = {
    val symOrder = Window.partitionBy("symbol").orderBy("week")
    val weekly = ohlcDaily(ticks)
      .groupBy(col("symbol"),
        date_trunc("week", col("day")).cast("date").as("week"))
      .agg(max_by(col("close").cast(dec), col("day")).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(symOrder))
      .filter(col("pc").isNotNull && col("pc") =!= 0)
      .withColumn("r", quant6((col("c") - col("pc")).cast("double") /
        col("pc").cast("double") * 1000000.0))
      .withColumn("sig", lag(col("r"), 1).over(symOrder))
      .filter(col("sig").isNotNull)
    weekly
      .withColumn("q", ntile(4).over(
        Window.partitionBy("week").orderBy(col("sig").desc, col("symbol")))
        .cast("long"))
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n_ranked"),
        sum(when(col("q") === 1L, col("r"))).as("ws"),
        count(when(col("q") === 1L, lit(1))).as("wn"),
        sum(when(col("q") === 4L, col("r"))).as("ls"),
        count(when(col("q") === 4L, lit(1))).as("lqn"))
      // quartile 4 is empty when a week ranks fewer than 4 symbols —
      // guard the divisions (ANSI throws on double x/0; DuckDB NULLs)
      .select(col("week"), col("n_ranked"),
        when(col("wn") > 0,
          col("ws").cast("double") / col("wn").cast("double"))
          .as("winner_ret"),
        when(col("lqn") > 0,
          col("ls").cast("double") / col("lqn").cast("double"))
          .as("loser_ret"))
      .withColumn("wml_spread", col("winner_ret") - col("loser_ret"))
      .orderBy("week")
  }

  /** Intraday volume curve: the share of a symbol's total volume
    * landing in each hour of day (the U-shape liquidity profile an
    * execution scheduler follows — the volume companion of
    * [[intradayVolCurve]]). Exact BIGINT sums; the share is a RAW
    * double quotient of two BIGINTs (volumeProfile emission class).
    * The per-symbol total is a window over ≤24 counter rows.
    */
  def volumeCurve(ticks: DataFrame): DataFrame = {
    val byHour = ticks
      .groupBy(col("symbol"), hour(col("ts")).cast("long").as("hod"))
      .agg(sum(col("volume")).cast("long").as("hour_volume"))
    byHour
      .withColumn("total",
        sum(col("hour_volume")).over(Window.partitionBy("symbol")))
      .select(col("symbol"), col("hod"), col("hour_volume"),
        when(col("total") =!= 0,
          col("hour_volume").cast("double") / col("total").cast("double"))
          .as("vol_share"))
      .orderBy("symbol", "hod")
  }

  /** Abnormal-volume days: per symbol, days whose total volume
    * z-scores ≥ zMin against that symbol's other days — the
    * [[zscoreOutliers]] pattern lifted from ticks to daily-bar
    * volumes (exact BIGINT day sums, DECIMAL(38,0) squares, mirrored
    * double op order, ROUND(z, 4) both engines; the ≥ filter tests
    * the ROUNDED value so the emitted set is sign/boundary-stable).
    * Two counter-row aggregates + a broadcast per-symbol stats join.
    */
  def abnormalVolume(ticks: DataFrame, zMin: Double = 2.0): DataFrame = {
    val vDec = DecimalType(18, 0)
    val sqDec = DecimalType(38, 0)
    val days = ohlcDaily(ticks).select(col("symbol"), col("day"), col("volume"))
    val stats = days.groupBy(col("symbol")).agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("volume").cast(vDec)).cast("double").as("s"),
      sum((col("volume").cast(vDec) * col("volume").cast(vDec)).cast(sqDec))
        .cast("double").as("sq"))
      .select(col("symbol"), (col("s") / col("n")).as("mean"),
        when(col("n") > 1.0,
          sqrt((col("sq") - (col("s") * col("s")) / col("n")) /
            (col("n") - 1.0))).as("sd"))
    days.join(broadcast(stats), "symbol")
      .withColumn("vol_z",
        when(col("sd") > 0 && !isnan(col("sd")),
          round((col("volume").cast("double") - col("mean")) / col("sd"), 4)))
      .filter(abs(col("vol_z")) >= zMin)
      .select(col("symbol"), col("day"), col("volume"), col("vol_z"))
      .orderBy("symbol", "day")
  }

  /** Top-k drawdown episodes per symbol: consecutive days sharing one
    * running-max close form an episode (the running max is
    * non-decreasing, so its value IS the group key — no flag
    * prefix-sums needed); depth = (min close − peak)/peak as a RAW
    * double over exact decimal operands. The trough day is the
    * EARLIEST day attaining the episode minimum (MIN over a CASE
    * against the group-windowed min — NULL-skipping, order-free).
    * Ranking partitions on the high-cardinality symbol, ordered by
    * the bitwise-identical depth with the peak day as tiebreak.
    * Peak-only episodes (depth 0) are excluded.
    */
  def drawdownEpisodes(ticks: DataFrame, k: Int = 3): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val run = dayOrder.rowsBetween(Window.unboundedPreceding, 0)
    val grpW = Window.partitionBy("symbol", "mx")
    val eps = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("mx", max(col("c")).over(run))
      .withColumn("minc", min(col("c")).over(grpW))
      .groupBy(col("symbol"), col("mx"))
      .agg(min(col("day")).as("peak_day"),
        max(col("day")).as("last_day"),
        count(lit(1)).as("n_days"),
        min(col("minc")).as("min_c"),
        min(when(col("c") === col("minc"), col("day"))).as("trough_day"))
      .filter(col("min_c") < col("mx") && col("mx") =!= 0)
      .withColumn("depth",
        (col("min_c") - col("mx")).cast("double") / col("mx").cast("double"))
    eps.withColumn("rk", row_number().over(
        Window.partitionBy("symbol").orderBy(col("depth"), col("peak_day")))
        .cast("long"))
      .filter(col("rk") <= k)
      .select(col("symbol"), col("rk"), col("peak_day"), col("trough_day"),
        col("last_day"), col("n_days"), col("depth"))
      .orderBy("symbol", "rk")
  }

  /** Equal-weight cross-sectional index: per-day mean close across all
    * symbols (exact decimal sum over one double division), rebased to
    * 100 on the first day — the one cross-sectional aggregate beside
    * the per-symbol family. The base is a one-row broadcast scalar
    * (the aboveAvg pattern); the rebase is one IEEE divide + multiply
    * on bitwise-identical raw doubles, emitted RAW.
    */
  def marketIndex(ticks: DataFrame): DataFrame = {
    val daily = ohlcDaily(ticks)
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_symbols"),
        (sum(col("close").cast(dec)).cast("double") /
          count(lit(1)).cast("double")).as("mean_close"))
    val base = daily.orderBy("day").limit(1)
      .select(col("mean_close").as("base_close"))
    daily.crossJoin(broadcast(base))
      .select(col("day"), col("n_symbols"), col("mean_close"),
        when(col("base_close") =!= 0.0,
          col("mean_close") / col("base_close") * 100.0).as("index_100"))
      .orderBy("day")
  }

  /** Day-of-week return seasonality: mean 6-dp-quantized daily return
    * ([[quant6]], the varianceRatio series) per symbol × ISO weekday
    * (1 = Monday). The mean is an exact decimal sum over one double
    * division — RAW emission. Spark's weekday() is 0-based Monday;
    * +1 aligns it with DuckDB's isodow.
    */
  def dowReturns(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull && col("pc") =!= 0)
      .select(col("symbol"), col("day"),
        quant6((col("c") - col("pc")).cast("double") /
          col("pc").cast("double") * 1000000.0).as("r"))
      .groupBy(col("symbol"),
        (weekday(col("day")) + 1).cast("long").as("iso_dow"))
      .agg(count(lit(1)).as("n_days"),
        (sum(col("r")).cast("double") /
          count(lit(1)).cast("double")).as("avg_ret"))
      .orderBy("symbol", "iso_dow")
  }

  // ---- NEW r10 daily-bar indicator batch ----
  // All ride the one ohlcDaily aggregate (one tick shuffle); windows
  // run over BARS (one row per symbol-day — tiny at any scale).

  /** NEW r10: Aroon indicator — 100·(n − days_since_extreme)/n over an
    * n-bar frame. The argmax/argmin POSITION inside a window frame has
    * no portable min_by-over-frame, so both engines take the MAX/MIN
    * of a packed fixed-width (price-cents, bar-index) string over the
    * frame and decode the index back out — total order, deterministic
    * ties (high: most recent wins; low: most recent wins via the
    * complemented index). Pure integer arithmetic into one exact-int
    * division — RAW.
    */
  def aroon(ticks: DataFrame, n: Int = 14): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    // cents are biased by +5e18 before packing: lpad of a NEGATIVE
    // cents value orders lexicographically wrong (lpad('-50') >
    // lpad('-40')), so the raw key would pick the wrong extremum on
    // negative-price tapes. The bias keeps every key a fixed 19-digit
    // positive integer (|cents| ≤ 1e14 for DECIMAL(12,2) prices), where
    // lexicographic == numeric. (r11 ADVICE fix; oracle mirrors.)
    val cents = (c: Column) =>
      (c.cast(dec) * 100).cast("bigint") + 5000000000000000000L
    val t = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("high"), col("low"))
      .withColumn("rn", row_number().over(dayOrder).cast("long"))
      // high key: ties → larger rn (more recent) wins under MAX
      .withColumn("hk", concat(
        lpad(cents(col("high")).cast("string"), 20, "0"),
        lpad(col("rn").cast("string"), 20, "0")))
      // low key: ties → larger rn wins under MIN via the complement
      .withColumn("lk", concat(
        lpad(cents(col("low")).cast("string"), 20, "0"),
        lpad((lit(1000000000000000L) - col("rn")).cast("string"), 20, "0")))
    t.select(col("symbol"), col("day"), col("rn"),
        max(col("hk")).over(w).as("mxh"),
        min(col("lk")).over(w).as("mnl"))
      .select(col("symbol"), col("day"),
        (col("rn") - substring(col("mxh"), 21, 20).cast("long"))
          .as("since_high"),
        (col("rn") - (lit(1000000000000000L) -
          substring(col("mnl"), 21, 20).cast("long"))).as("since_low"))
      .select(col("symbol"), col("day"),
        (lit(100.0) * (lit(n.toDouble) - col("since_high").cast("double")) /
          lit(n.toDouble)).as("aroon_up"),
        (lit(100.0) * (lit(n.toDouble) - col("since_low").cast("double")) /
          lit(n.toDouble)).as("aroon_down"))
      .orderBy("symbol", "day")
  }

  /** NEW r10: Vortex indicator — VI± = Σ|h−pl| resp. Σ|l−ph| over the
    * n-bar Σ true range. Every movement term is an exact decimal
    * |difference| (order-free window sums); greatest() of decimals is
    * portable. Quotients are RAW doubles: the n-bar sums stay within
    * exact double conversion at any corpus size (bounded by n × max
    * price), and the division is one mirrored IEEE op.
    */
  def vortex(ticks: DataFrame, n: Int = 14): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    val t = ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        col("high").cast(dec).as("h"), col("low").cast(dec).as("l"),
        col("close").cast(dec).as("c"))
      .withColumn("ph", lag(col("h"), 1).over(dayOrder))
      .withColumn("pl", lag(col("l"), 1).over(dayOrder))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull)
      .withColumn("vmp", abs(col("h") - col("pl")))
      .withColumn("vmm", abs(col("l") - col("ph")))
      .withColumn("tr", greatest(col("h") - col("l"),
        abs(col("h") - col("pc")), abs(col("l") - col("pc"))))
    t.select(col("symbol"), col("day"),
        sum(col("vmp")).over(w).as("svp"),
        sum(col("vmm")).over(w).as("svm"),
        sum(col("tr")).over(w).as("str"))
      .select(col("symbol"), col("day"),
        when(col("str") =!= 0,
          col("svp").cast("double") / col("str").cast("double")).as("vi_plus"),
        when(col("str") =!= 0,
          col("svm").cast("double") / col("str").cast("double")).as("vi_minus"))
      .orderBy("symbol", "day")
  }

  /** NEW r10: Chande Momentum Oscillator — 100·(Σgain − Σloss)/(Σgain
    * + Σloss) over n bars, the un-smoothed RSI sibling. Gains/losses
    * are exact decimal diffs; one guarded RAW quotient.
    */
  def cmo(ticks: DataFrame, n: Int = 14): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    val zero = lit(0).cast(DecimalType(19, 2))
    val t = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull)
      .withColumn("gain", when(col("c") > col("pc"), col("c") - col("pc"))
        .otherwise(zero))
      .withColumn("loss", when(col("c") < col("pc"), col("pc") - col("c"))
        .otherwise(zero))
    t.select(col("symbol"), col("day"),
        sum(col("gain")).over(w).as("g"),
        sum(col("loss")).over(w).as("l"))
      .select(col("symbol"), col("day"),
        when(col("g") + col("l") =!= 0,
          lit(100.0) * (col("g") - col("l")).cast("double") /
            (col("g") + col("l")).cast("double")).as(s"cmo$n"))
      .orderBy("symbol", "day")
  }

  /** NEW r10: Keltner channel (SMA flavor) — midline = n-bar mean
    * typical price computed as Σ(h+l+c)/(3n) (ONE double division of
    * an exact decimal sum — never a float window sum of per-day /3
    * quotients), band = 2 × n-bar mean true range, same discipline.
    * upper/lower are two further mirrored IEEE ops on those exact
    * quotients — RAW.
    */
  def keltner(ticks: DataFrame, n: Int = 20): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    val t = ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        col("high").cast(dec).as("h"), col("low").cast(dec).as("l"),
        col("close").cast(dec).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull)
      .withColumn("hlc", col("h") + col("l") + col("c"))
      .withColumn("tr", greatest(col("h") - col("l"),
        abs(col("h") - col("pc")), abs(col("l") - col("pc"))))
    t.select(col("symbol"), col("day"),
        sum(col("hlc")).over(w).as("shlc"),
        sum(col("tr")).over(w).as("str"),
        count(lit(1)).over(w).as("nb"))
      .select(col("symbol"), col("day"),
        (col("shlc").cast("double") /
          (col("nb") * 3).cast("double")).as("mid"),
        (col("str").cast("double") / col("nb").cast("double")).as("rng"))
      .select(col("symbol"), col("day"), col("mid"),
        (col("mid") + lit(2.0) * col("rng")).as("upper_band"),
        (col("mid") - lit(2.0) * col("rng")).as("lower_band"))
      .orderBy("symbol", "day")
  }

  /** NEW r10: accumulation/distribution line — running Σ of money-flow
    * volume, MFV = CLV·vol with CLV = (2c−h−l)/(h−l) quantized to 6 dp
    * via [[quant6]] (the cmf discipline) so the cumulative sum is an
    * EXACT order-free decimal at any depth; h = l contributes 0.
    * Emitted as DOUBLE (DuckDB's client layer converts decimal
    * results to float64, so a decimal emission can't hash-compare);
    * the conversion is engine-exact below 15 significant digits —
    * the same documented residual class as the turnover league table.
    */
  def adLine(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val run = dayOrder.rowsBetween(Window.unboundedPreceding, 0)
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("volume"),
        (lit(2) * col("close").cast(dec) - col("high").cast(dec) -
          col("low").cast(dec)).as("num"),
        (col("high").cast(dec) - col("low").cast(dec)).as("den"))
      .withColumn("clv6", when(col("den") =!= 0,
        quant6(col("num").cast("double") / col("den").cast("double")
          * 1000000.0)).otherwise(lit(0).cast(DecimalType(18, 6))))
      .withColumn("mfv",
        (col("clv6").cast(DecimalType(20, 6)) * col("volume"))
          .cast(DecimalType(38, 6)))
      .select(col("symbol"), col("day"),
        sum(col("mfv")).over(run).cast("double").as("ad_line"))
      .orderBy("symbol", "day")
  }

  /** NEW r10: Ease of Movement — per-bar EMV = midpoint move / box
    * ratio, each bar's double quotient quantized to 6 dp ([[quant6]])
    * so the n-bar mean re-sums as an exact decimal over ONE final
    * division. Degenerate bars (h = l or zero volume) contribute 0 by
    * convention on both engines.
    */
  def easeOfMovement(ticks: DataFrame, n: Int = 14): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    val t = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("volume"),
        col("high").cast(dec).as("h"), col("low").cast(dec).as("l"))
      .withColumn("ph", lag(col("h"), 1).over(dayOrder))
      .withColumn("pl", lag(col("l"), 1).over(dayOrder))
      .filter(col("ph").isNotNull)
      // distance = ((h+l) − (ph+pl))/2; box = (vol/10000)/(h−l);
      // emv = distance/box = ((h+l)−(ph+pl))·(h−l)·10000 / (2·vol) —
      // the decimal product stays width-38 (20+18, DuckDB's cap) and
      // the ×10000 rides the float side of the mirrored op chain
      .withColumn("emv6",
        when(col("h") =!= col("l") && col("volume") =!= 0,
          quant6(((col("h") + col("l") - col("ph") - col("pl"))
              .cast(DecimalType(20, 2)) *
              (col("h") - col("l")).cast(DecimalType(18, 2)))
            .cast("double") * lit(10000.0)
            / (col("volume") * 2).cast("double")
            * 1000000.0))
          .otherwise(lit(0).cast(DecimalType(18, 6))))
    t.select(col("symbol"), col("day"),
        sum(col("emv6")).over(w).as("semv"),
        count(lit(1)).over(w).as("nb"))
      .select(col("symbol"), col("day"),
        (col("semv").cast("double") / col("nb").cast("double")).as(s"eom$n"))
      .orderBy("symbol", "day")
  }

  /** NEW r10: Elder force index — FI = Δclose · volume (an EXACT
    * decimal, no quantization needed) plus its n-bar mean (exact
    * decimal sum, one double division). Both emissions convert
    * exactly at bounded magnitudes — RAW.
    */
  def forceIndex(ticks: DataFrame, n: Int = 13): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    val t = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("volume"),
        col("close").cast(dec).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull)
      .withColumn("fi",
        ((col("c") - col("pc")).cast(DecimalType(20, 2)) * col("volume"))
          .cast(DecimalType(38, 2)))
    t.select(col("symbol"), col("day"),
        col("fi").cast("double").as("force_index"),
        (sum(col("fi")).over(w).cast("double") /
          count(lit(1)).over(w).cast("double")).as(s"fi_sma$n"))
      .orderBy("symbol", "day")
  }

  final case class AdxBar(symbol: String, day: java.sql.Date,
      h: java.math.BigDecimal, l: java.math.BigDecimal,
      c: java.math.BigDecimal)
  final case class AdxOut(symbol: String, day: java.sql.Date,
      plus_di: Double, minus_di: Double, adx: Double)

  /** NEW r10b: Average Directional Index (Wilder) over daily bars —
    * the classic trend-strength triple (+DI/−DI/ADX). Three chained
    * Wilder-smoothing recursions (s ← s − s/14 + x, recursion-seeded
    * at the first diff bar) run as ONE sorted-group pass per symbol
    * with O(1) state (the MACD/Heikin-Ashi shape); directional moves
    * and true range are exact decimal differences converted once, so
    * the float recursion streams are bit-identical to the oracle's
    * recursive CTE (identical op order, RAW emission — no ROUND
    * anywhere).
    */
  def adxDaily(ticks: DataFrame): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("high").cast(dec).as("h"),
        col("low").cast(dec).as("l"), col("close").cast(dec).as("c"))
      .as[AdxBar]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        var ph: java.math.BigDecimal = null
        var pl: java.math.BigDecimal = null
        var pc: java.math.BigDecimal = null
        var sTr = 0.0; var sPdm = 0.0; var sMdm = 0.0; var adxV = 0.0
        var started = false
        it.flatMap { b =>
          val out: Iterator[AdxOut] =
            if (ph == null) Iterator.empty
            else {
              val up = b.h.subtract(ph).doubleValue()
              val down = pl.subtract(b.l).doubleValue()
              val pdm = if (up > down && up > 0) up else 0.0
              val mdm = if (down > up && down > 0) down else 0.0
              val tr = Seq(b.h.subtract(b.l), b.h.subtract(pc).abs,
                b.l.subtract(pc).abs).max.doubleValue()
              if (!started) {
                started = true
                sTr = tr; sPdm = pdm; sMdm = mdm
                val diP = if (sTr != 0) 100.0 * sPdm / sTr else 0.0
                val diM = if (sTr != 0) 100.0 * sMdm / sTr else 0.0
                adxV = if (diP + diM != 0)
                  100.0 * math.abs(diP - diM) / (diP + diM) else 0.0
              } else {
                sTr = sTr - sTr / 14.0 + tr
                sPdm = sPdm - sPdm / 14.0 + pdm
                sMdm = sMdm - sMdm / 14.0 + mdm
                val diP = if (sTr != 0) 100.0 * sPdm / sTr else 0.0
                val diM = if (sTr != 0) 100.0 * sMdm / sTr else 0.0
                val dx = if (diP + diM != 0)
                  100.0 * math.abs(diP - diM) / (diP + diM) else 0.0
                adxV = (adxV * 13.0 + dx) / 14.0
              }
              val diP = if (sTr != 0) 100.0 * sPdm / sTr else 0.0
              val diM = if (sTr != 0) 100.0 * sMdm / sTr else 0.0
              Iterator.single(AdxOut(sym, b.day, diP, diM, adxV))
            }
          ph = b.h; pl = b.l; pc = b.c
          out
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  final case class TrixBar(symbol: String, day: java.sql.Date,
      c: java.math.BigDecimal)
  final case class TrixOut(symbol: String, day: java.sql.Date,
      e3: Double, trix: Option[Double])

  /** NEW r10b: TRIX — 1-day rate of change of a TRIPLE-smoothed EMA
    * of the daily close (n = 15 → α = 0.125, exactly representable in
    * binary so the smoothing constants carry zero parse skew). Three
    * chained EMAs run in one sorted-group pass (each stage smooths
    * the CURRENT value of the stage above — mirrored via lateral
    * aliases in the oracle's recursive CTE); the ROC runs on e3 and
    * its lag with identical op order. RAW emission.
    */
  def trixDaily(ticks: DataFrame): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .as[TrixBar]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        var e1 = 0.0; var e2 = 0.0; var e3 = 0.0
        var first = true
        var havePrev = false
        var pe3 = 0.0
        it.map { b =>
          val c = b.c.doubleValue()
          if (first) { first = false; e1 = c; e2 = c; e3 = c }
          else {
            havePrev = true; pe3 = e3
            e1 = 0.125 * c + 0.875 * e1
            e2 = 0.125 * e1 + 0.875 * e2
            e3 = 0.125 * e2 + 0.875 * e3
          }
          val trix =
            if (!havePrev || pe3 == 0.0) None
            else Some(100.0 * (e3 - pe3) / pe3)
          TrixOut(sym, b.day, e3, trix)
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  final case class ErBar(symbol: String, day: java.sql.Date,
      h: java.math.BigDecimal, l: java.math.BigDecimal,
      c: java.math.BigDecimal)
  final case class ErOut(symbol: String, day: java.sql.Date,
      ema13: Double, bull_power: Double, bear_power: Double)

  /** NEW r10b: Elder Ray — bull/bear power (high/low minus a 13-day
    * EMA of the close). α = 2/14 is NOT exactly representable, so BOTH
    * engines compute it at runtime as 2.0/14.0 (identical IEEE
    * division → identical constant; the pre-folded-literal trap from
    * SURVEY §4). One sorted-group EMA pass; RAW emission.
    */
  def elderRay(ticks: DataFrame): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("high").cast(dec).as("h"),
        col("low").cast(dec).as("l"), col("close").cast(dec).as("c"))
      .as[ErBar]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        val a = 2.0 / 14.0
        var e = 0.0
        var first = true
        it.map { b =>
          val c = b.c.doubleValue()
          if (first) { first = false; e = c }
          else e = a * c + (1.0 - a) * e
          ErOut(sym, b.day, e, b.h.doubleValue() - e, b.l.doubleValue() - e)
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  final case class MiBar(symbol: String, day: java.sql.Date,
      h: java.math.BigDecimal, l: java.math.BigDecimal)
  final case class MiRow(symbol: String, day: java.sql.Date, micro: Long)

  /** NEW r10b: Mass Index — Σ over 25 bars of the EMA9(h−l)/EMA9(EMA9)
    * ratio. The per-bar ratio is a float quotient, so it quantizes to
    * 6-dp integer micro-units (the shared FLOOR/CEIL sequence) and the
    * 25-bar window sum runs over exact LONGs — order-free — with one
    * final ÷10⁶ division. α = 0.2/0.8 are exactly representable.
    */
  def massIndex(ticks: DataFrame, n: Int = 25): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    val rows = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("high").cast(dec).as("h"),
        col("low").cast(dec).as("l"))
      .as[MiBar]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        var e1 = 0.0; var e2 = 0.0
        var first = true
        it.map { b =>
          val rng = b.h.subtract(b.l).doubleValue()
          if (first) { first = false; e1 = rng; e2 = rng }
          else { e1 = 0.2 * rng + 0.8 * e1; e2 = 0.2 * e1 + 0.8 * e2 }
          val ratio = if (e2 != 0.0) e1 / e2 else 0.0
          val s = ratio * 1000000.0
          val q = if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)
          MiRow(sym, b.day, q.toLong)
        }
      }
      .toDF()
    val w = Window.partitionBy("symbol").orderBy("day")
      .rowsBetween(-(n - 1), 0)
    rows.select(col("symbol"), col("day"),
        (sum(col("micro")).over(w).cast("double") / 1000000.0)
          .as(s"mass$n"))
      .orderBy("symbol", "day")
  }

  final case class SarBar(symbol: String, day: java.sql.Date,
      h: java.math.BigDecimal, l: java.math.BigDecimal,
      c: java.math.BigDecimal)
  final case class SarOut(symbol: String, day: java.sql.Date,
      trend: Long, sar: Double)

  /** NEW r10b: Parabolic SAR (Wilder stop-and-reverse, the simplified
    * no-two-bar-clamp variant documented here) — a four-variable state
    * machine (trend, SAR, extreme point, acceleration factor with
    * AF += 0.02 capped at 0.2) per symbol, run as one sorted-group
    * pass. Seeded at bar 2: trend from the close comparison, SAR/EP
    * from the two-bar extremes (decimal min/max via CASE — never a
    * decimal LEAST/GREATEST near the oracle). Every branch and float
    * op is mirrored in the recursive CTE; RAW emission.
    */
  def parabolicSar(ticks: DataFrame): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("high").cast(dec).as("h"),
        col("low").cast(dec).as("l"), col("close").cast(dec).as("c"))
      .as[SarBar]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        var pb: SarBar = null
        var started = false
        var trend = 0L; var sar = 0.0; var ep = 0.0; var af = 0.0
        it.flatMap { b =>
          val out: Iterator[SarOut] =
            if (pb == null) Iterator.empty
            else if (!started) {
              started = true
              trend = if (b.c.compareTo(pb.c) >= 0) 1L else -1L
              if (trend == 1L) {
                sar = (if (pb.l.compareTo(b.l) < 0) pb.l else b.l).doubleValue()
                ep = (if (pb.h.compareTo(b.h) > 0) pb.h else b.h).doubleValue()
              } else {
                sar = (if (pb.h.compareTo(b.h) > 0) pb.h else b.h).doubleValue()
                ep = (if (pb.l.compareTo(b.l) < 0) pb.l else b.l).doubleValue()
              }
              af = 0.02
              Iterator.single(SarOut(sym, b.day, trend, sar))
            } else {
              val hh = b.h.doubleValue()
              val ll = b.l.doubleValue()
              val cand = sar + af * (ep - sar)
              if (trend == 1L) {
                if (ll < cand) { trend = -1L; sar = ep; ep = ll; af = 0.02 }
                else {
                  sar = cand
                  if (hh > ep) { af = math.min(af + 0.02, 0.2); ep = hh }
                }
              } else {
                if (hh > cand) { trend = 1L; sar = ep; ep = hh; af = 0.02 }
                else {
                  sar = cand
                  if (ll < ep) { af = math.min(af + 0.02, 0.2); ep = ll }
                }
              }
              Iterator.single(SarOut(sym, b.day, trend, sar))
            }
          pb = b
          out
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  final case class ChBar(symbol: String, day: java.sql.Date,
      hc: Long, lc: Long, cc: Long)
  final case class ChOut(symbol: String, day: java.sql.Date,
      atr: Double, chand_long: Double, chand_short: Double)

  /** NEW r10b: Chandelier Exit — the ATR-trailed stop pair
    * (HH(n) − 3·ATR and LL(n) + 3·ATR). r11: the rolling HH/LL now
    * come from [[MonoDeque]]s over exact price cents INSIDE the same
    * sorted-group pass as the Wilder ATR recursion (s ← s − s/n + tr)
    * — one exchange, one sort, O(1)/row, no window at all. Cents
    * arithmetic ≡ the decimal window extrema it replaces (integer
    * compares; centsToDouble/100.0 is the identical compact-decimal
    * double cast). RAW emission.
    */
  def chandelierExit(ticks: DataFrame, n: Int = 22): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    val nd = n.toDouble
    val cents = (c: Column) => (c.cast(dec) * 100).cast("long")
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), cents(col("high")).as("hc"),
        cents(col("low")).as("lc"), cents(col("close")).as("cc"))
      .as[ChBar]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        val mxH = new MonoDeque(n, takeMin = false)
        val mnL = new MonoDeque(n, takeMin = true)
        var i = 0L
        var pc = Long.MinValue
        var sAtr = 0.0
        var started = false
        it.flatMap { b =>
          i += 1
          mxH.push(i, b.hc); mnL.push(i, b.lc)
          val out: Iterator[ChOut] =
            if (pc == Long.MinValue) Iterator.empty
            else {
              val tr = math.max(b.hc - b.lc,
                math.max(math.abs(b.hc - pc), math.abs(b.lc - pc)))
                .toDouble / 100.0
              if (!started) { started = true; sAtr = tr }
              else sAtr = sAtr - sAtr / nd + tr
              val atr = sAtr / nd
              Iterator.single(ChOut(sym, b.day, atr,
                mxH.extreme.toDouble / 100.0 - 3.0 * atr,
                mnL.extreme.toDouble / 100.0 + 3.0 * atr))
            }
          pc = b.cc
          out
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  /** NEW r10b: risk-adjusted return ratios — per-symbol Sharpe,
    * Sortino (target-0 downside deviation), and Calmar (mean over
    * |max drawdown|) on quant6 daily returns. The FIRST of the RAW
    * sqrt family: §4-r10 measured sqrt bit-identical across engines
    * (IEEE-mandated), so variance → std needs no ROUND — moments are
    * exact decimal sums (INT128-forced squares in the oracle), every
    * division/sqrt/ratio a mirrored IEEE op. Return sums stay far
    * below 15 significant digits at any realistic tape depth (r ≤ ~1
    * in 6-dp units), so the decimal→double conversions are exact.
    * max drawdown is the order-free MIN of per-day exact-operand
    * quotients.
    */
  def riskRatios(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val run = dayOrder.rowsBetween(Window.unboundedPreceding, 0)
    val sq38 = DecimalType(38, 12)
    val bars = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .withColumn("mx", max(col("c")).over(run))
      .withColumn("dd", when(col("mx") =!= 0,
        (col("c") - col("mx")).cast("double") / col("mx").cast("double"))
        .otherwise(0.0))
      .withColumn("r", when(col("pc").isNotNull && col("pc") =!= 0,
        quant6((col("c") - col("pc")).cast("double") /
          col("pc").cast("double") * 1000000.0)))
    // (19,6)×(18,6) → precision exactly 38, scale 12: Spark keeps the
    // full 12-dp square EXACT (a (20,6) operand would push precision
    // to 39 and the allowPrecisionLoss rule silently rounds scale to
    // 11 — caught by the oracle hash in r10)
    val sq = (col("r").cast(DecimalType(19, 6)) * col("r")).cast(sq38)
    bars.groupBy(col("symbol")).agg(
        count(col("r")).as("n_days"),
        sum(col("r")).as("s1"),
        sum(sq).as("s2"),
        sum(when(col("r") < 0, sq).otherwise(lit(0).cast(sq38))).as("d2"),
        min(col("dd")).as("max_drawdown"))
      .filter(col("n_days") > 0)
      .withColumn("mean_ret",
        col("s1").cast("double") / col("n_days").cast("double"))
      .withColumn("var0",
        col("s2").cast("double") / col("n_days").cast("double") -
          col("mean_ret") * col("mean_ret"))
      .withColumn("std_ret", sqrt(greatest(col("var0"), lit(0.0))))
      .withColumn("downside_dev",
        sqrt(col("d2").cast("double") / col("n_days").cast("double")))
      .select(col("symbol"), col("n_days"), col("mean_ret"),
        col("std_ret"), col("downside_dev"),
        when(col("std_ret") =!= 0, col("mean_ret") / col("std_ret"))
          .as("sharpe"),
        when(col("downside_dev") =!= 0,
          col("mean_ret") / col("downside_dev")).as("sortino"),
        col("max_drawdown"),
        when(col("max_drawdown") =!= 0,
          col("mean_ret") / -col("max_drawdown")).as("calmar"))
      .orderBy("symbol")
  }

  final case class StBar(symbol: String, day: java.sql.Date,
      h: java.math.BigDecimal, l: java.math.BigDecimal,
      c: java.math.BigDecimal)
  final case class StOut(symbol: String, day: java.sql.Date,
      dir: Long, supertrend: Double)

  /** NEW r10b: SuperTrend(10, 3) — ATR bands with the band-tightening
    * memory (final upper/lower bands only ratchet) and the
    * close-crossing trend flip; SAR's sibling state machine
    * (ATR-sum, fub, flb, dir), one sorted-group pass, every branch
    * mirrored in the recursive CTE. RAW emission.
    */
  def superTrend(ticks: DataFrame): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("high").cast(dec).as("h"),
        col("low").cast(dec).as("l"), col("close").cast(dec).as("c"))
      .as[StBar]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        var pb: StBar = null
        var started = false
        var s = 0.0; var fub = 0.0; var flb = 0.0; var dir = 0L
        it.flatMap { b =>
          val out: Iterator[StOut] =
            if (pb == null) Iterator.empty
            else {
              val tr = Seq(b.h.subtract(b.l), b.h.subtract(pb.c).abs,
                b.l.subtract(pb.c).abs).max.doubleValue()
              val cd = b.c.doubleValue()
              val mid = b.h.add(b.l).doubleValue() / 2.0
              if (!started) {
                started = true
                s = tr
                val atr = s / 10.0
                fub = mid + 3.0 * atr
                flb = mid - 3.0 * atr
                dir = if (cd > fub) 1L else -1L
              } else {
                s = s - s / 10.0 + tr
                val atr = s / 10.0
                val ub = mid + 3.0 * atr
                val lb = mid - 3.0 * atr
                val pcd = pb.c.doubleValue()
                val fubN = if (ub < fub || pcd > fub) ub else fub
                val flbN = if (lb > flb || pcd < flb) lb else flb
                dir = if (dir == -1L) { if (cd > fubN) 1L else -1L }
                  else { if (cd < flbN) -1L else 1L }
                fub = fubN; flb = flbN
              }
              Iterator.single(StOut(sym, b.day, dir,
                if (dir == 1L) flb else fub))
            }
          pb = b
          out
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  /** NEW r10b: Coppock curve (daily variant) — WMA10 of
    * (ROC14 + ROC11). Each per-bar ROC sum quantizes to 6-dp integer
    * micro-units (shared FLOOR/CEIL sequence), so the triangular
    * weighting is an EXACT integer dot product (Σ(10−i)·microᵗ⁻ⁱ)
    * over one final ÷(55·10⁶) — no float weighted window sum
    * anywhere. Bar-level lags only.
    */
  def coppock(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val bars = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("c14", lag(col("c"), 14).over(dayOrder))
      .withColumn("c11", lag(col("c"), 11).over(dayOrder))
      .filter(col("c14").isNotNull && col("c14") =!= 0 &&
        col("c11").isNotNull && col("c11") =!= 0)
      .withColumn("micro",
        quant6((lit(100.0) * (col("c") - col("c14")).cast("double") /
            col("c14").cast("double") +
          lit(100.0) * (col("c") - col("c11")).cast("double") /
            col("c11").cast("double")) * 1000000.0)
          .cast(DecimalType(18, 6)))
      .withColumn("mi", (col("micro") * 1000000).cast("long"))
    val wsum = (0 until 10).map { i =>
      if (i == 0) col("mi") * lit(10L)
      else lag(col("mi"), i).over(dayOrder) * lit((10 - i).toLong)
    }.reduce(_ + _)
    bars
      .withColumn("wsum", wsum)
      .withColumn("m9", lag(col("mi"), 9).over(dayOrder))
      .filter(col("m9").isNotNull)
      .select(col("symbol"), col("day"),
        (col("wsum").cast("double") / 55000000.0).as("coppock"))
      .orderBy("symbol", "day")
  }

  /** NEW r10b: inter-arrival time distribution — per symbol, the
    * log2-millisecond-bucket histogram of gaps between consecutive
    * ticks (the arrival-process shape a feed monitor watches: a
    * bimodal histogram means bursts + dead air). Gaps ride
    * [[chunkedLag1]] — no whole-symbol window; buckets use the exact
    * bit-length trick; pure integer counting.
    */
  def interArrival(ticks: DataFrame): DataFrame = {
    val t = ticks.withColumn("chunk_day", to_date(col("ts")))
    chunkedLag1(t, "ts", "prev_ts")
      .filter(col("prev_ts").isNotNull)
      .select(col("symbol"),
        (unix_micros(col("ts")) - unix_micros(col("prev_ts"))).as("gap_us"))
      .select(col("symbol"), col("gap_us"),
        (length(bin(expr("gap_us div 1000"))) - 1).cast("long").as("ms_bucket"))
      .groupBy(col("symbol"), col("ms_bucket"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
      .orderBy("symbol", "ms_bucket")
  }

  // ---- NEW r10b microstructure census batch (pure integer parity) ----

  /** NEW r10b: effective tick size — per symbol, the GCD of every
    * positive price increment in cents (the price-grid estimator a
    * feed-quality monitor runs: a 5¢-grid instrument whose feed shows
    * 1¢ moves is mis-scaled). Spark has no GCD aggregate, so this is
    * the custom `graft_gcd` TypedImperativeAggregate (one-long state,
    * associative map-side partials); the lag rides [[chunkedLag1]] —
    * no whole-symbol window. DuckDB mirrors with
    * list_reduce(list(...), gcd) — order-free, so the unordered list
    * is safe.
    */
  def tickSizeEstimate(ticks: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(ticks.sparkSession)
    val t = ticks
      .withColumn("chunk_day", to_date(col("ts")))
      .withColumn("cents", (col("price").cast(dec) * 100).cast("bigint"))
    chunkedLag1(t, "cents", "prev_cents")
      .withColumn("dc", abs(col("cents") - col("prev_cents")))
      .filter(col("dc").isNotNull && col("dc") > 0)
      .groupBy(col("symbol"))
      .agg(expr("graft_gcd(dc)").as("tick_size_cents"),
        count(lit(1)).as("n_price_moves"))
      .orderBy("symbol")
  }

  /** NEW r10b: price-clustering census — the share of trades printing
    * on integer / half / quarter / dime price points per symbol (the
    * classic round-number magnetism diagnostic). Pure modular integer
    * counting; shares are RAW exact-int quotients.
    */
  def priceClustering(ticks: DataFrame): DataFrame = {
    def share(n: Column, d: Column): Column =
      n.cast("double") / d.cast("double")
    ticks
      .select(col("symbol"),
        (col("price").cast(dec) * 100).cast("bigint").as("cents"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_trades"),
        sum(when(pmod(col("cents"), lit(100L)) === 0, 1L).otherwise(0L))
          .as("n_integer"),
        sum(when(pmod(col("cents"), lit(50L)) === 0, 1L).otherwise(0L))
          .as("n_half"),
        sum(when(pmod(col("cents"), lit(25L)) === 0, 1L).otherwise(0L))
          .as("n_quarter"),
        sum(when(pmod(col("cents"), lit(10L)) === 0, 1L).otherwise(0L))
          .as("n_dime"))
      .select(col("symbol"), col("n_trades"),
        share(col("n_integer"), col("n_trades")).as("integer_share"),
        share(col("n_half"), col("n_trades")).as("half_share"),
        share(col("n_quarter"), col("n_trades")).as("quarter_share"),
        share(col("n_dime"), col("n_trades")).as("dime_share"))
      .orderBy("symbol")
  }

  /** NEW r10b: burst census — per symbol, the peak and shape of
    * per-second message rates (the quote-stuffing / feed-burst
    * monitor). Two counter aggregations, all exact integers; the mean
    * is one RAW division.
    */
  def burstCensus(ticks: DataFrame): DataFrame =
    ticks
      .groupBy(col("symbol"), date_trunc("second", col("ts")).as("sec"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_active_seconds"),
        sum(col("n")).cast("long").as("n_ticks"),
        max(col("n")).as("peak_tps"))
      .select(col("symbol"), col("n_active_seconds"), col("n_ticks"),
        col("peak_tps"),
        (col("n_ticks").cast("double") /
          col("n_active_seconds").cast("double")).as("mean_tps"))
      .orderBy("symbol")

  /** NEW r10b: Benford first-digit census of trade sizes — the
    * anomaly screen auditors run on reported volumes. First
    * significant digit via string head (exact on positive longs);
    * counts and one RAW share quotient per (symbol, digit).
    */
  def benfordVolumes(ticks: DataFrame): DataFrame = {
    val perSym = Window.partitionBy("symbol")
    ticks.filter(col("volume") > 0)
      .select(col("symbol"),
        substring(col("volume").cast("string"), 1, 1).cast("long")
          .as("first_digit"))
      .groupBy(col("symbol"), col("first_digit"))
      .agg(count(lit(1)).as("n"))
      .select(col("symbol"), col("first_digit"), col("n"),
        (col("n").cast("double") /
          sum(col("n")).over(perSym).cast("double")).as("digit_share"))
      .orderBy("symbol", "first_digit")
  }

  // === NEW r11 daily-bar indicator batch ============================
  // All ride the one ohlcDaily aggregate; windows/recursions run over
  // BAR rows (one per symbol-day — tiny at any scale).

  final case class PpoBar(symbol: String, day: java.sql.Date,
      c: java.math.BigDecimal)
  final case class PpoOut(symbol: String, day: java.sql.Date,
      ema_fast: Double, ema_slow: Double, ppo: Option[Double])

  /** NEW r11: Percentage Price Oscillator — MACD's scale-free sibling:
    * 100·(EMA12 − EMA26)/EMA26 over daily closes, comparable ACROSS
    * symbols (a $5 and a $500 stock read on the same axis). Both
    * recursions run in ONE sorted-group pass ([[macd]] shape); α =
    * 2/13, 2/27 are NOT exact binary, so both engines compute them at
    * runtime (§4 pre-folded-literal rule). RAW — every op is a
    * mirrored IEEE step off the same recursion state.
    */
  def ppo(ticks: DataFrame): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .as[PpoBar]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        val af = 2.0 / 13.0
        val as = 2.0 / 27.0
        var ef = 0.0
        var es = 0.0
        var first = true
        it.map { b =>
          val c = b.c.doubleValue()
          if (first) { first = false; ef = c; es = c }
          else {
            ef = af * c + (1.0 - af) * ef
            es = as * c + (1.0 - as) * es
          }
          PpoOut(sym, b.day, ef, es,
            if (es != 0.0) Some(100.0 * (ef - es) / es) else None)
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  /** NEW r11: Detrended Price Oscillator — close displaced back
    * (n/2 + 1) bars minus the n-bar SMA, isolating the sub-n cycle
    * from the trend. Emission is the exact integer identity
    * (n·c_shift − Σc)/n: decimal operands, ONE double division — RAW.
    * Full windows only (count gate, mirrored).
    */
  def dpo(ticks: DataFrame, n: Int = 20): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    val shift = n / 2 + 1
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("cs", lag(col("c"), shift).over(dayOrder))
      .withColumn("s", sum(col("c")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("cs").isNotNull && col("cnt") === n)
      .select(col("symbol"), col("day"),
        ((col("cs") * n - col("s")).cast("double") / n.toDouble).as(s"dpo$n"))
      .orderBy("symbol", "day")
  }

  /** NEW r11: Balance of Power — (close − open)/(high − low) per bar,
    * the intrabar buyer/seller pressure gauge. Exact decimal
    * differences, one RAW double division; flat bars (h = l) yield
    * NULL on both engines.
    */
  def balanceOfPower(ticks: DataFrame): DataFrame =
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        when(col("high").cast(dec) > col("low").cast(dec),
          (col("close").cast(dec) - col("open").cast(dec)).cast("double") /
            (col("high").cast(dec) - col("low").cast(dec)).cast("double"))
          .as("bop"))
      .orderBy("symbol", "day")

  /** NEW r11: Ultimate Oscillator (7/14/28) — Williams' three-horizon
    * buying-pressure blend: avg_k = ΣBP/ΣTR over k bars, UO =
    * 100·(4·avg7 + 2·avg14 + avg28)/7. BP = c − min(l, prev_c) and
    * TR = max(h, prev_c) − min(l, prev_c) are exact decimal CASE
    * expressions (never decimal LEAST/GREATEST — DuckDB promotes
    * those to DOUBLE, the §4 r10 vortex/keltner trap); the window
    * sums are order-free decimals, each avg is one exact-operand
    * division, and the final blend is a mirrored IEEE chain — RAW.
    * Full 28-bar windows with nonzero TR sums only (mirrored gate).
    */
  def ultimateOsc(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    def w(n: Int) = dayOrder.rowsBetween(-(n - 1), 0)
    val t = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("high").cast(dec).as("h"),
        col("low").cast(dec).as("l"), col("close").cast(dec).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull)
      .withColumn("mn", when(col("l") < col("pc"), col("l")).otherwise(col("pc")))
      .withColumn("mx", when(col("h") > col("pc"), col("h")).otherwise(col("pc")))
      .withColumn("bp", col("c") - col("mn"))
      .withColumn("tr", col("mx") - col("mn"))
    val t2 = t
      .withColumn("s7b", sum(col("bp")).over(w(7)))
      .withColumn("s7t", sum(col("tr")).over(w(7)))
      .withColumn("s14b", sum(col("bp")).over(w(14)))
      .withColumn("s14t", sum(col("tr")).over(w(14)))
      .withColumn("s28b", sum(col("bp")).over(w(28)))
      .withColumn("s28t", sum(col("tr")).over(w(28)))
      .withColumn("cnt28", count(lit(1)).over(w(28)))
    val uo = lit(100.0) *
      (lit(4.0) * (col("s7b").cast("double") / col("s7t").cast("double")) +
        lit(2.0) * (col("s14b").cast("double") / col("s14t").cast("double")) +
        (col("s28b").cast("double") / col("s28t").cast("double"))) / lit(7.0)
    t2.select(col("symbol"), col("day"),
        when(col("cnt28") === 28 && col("s7t") =!= 0 &&
          col("s14t") =!= 0 && col("s28t") =!= 0, uo).as("ultimate_osc"))
      .orderBy("symbol", "day")
  }

  /** NEW r11: Hull moving average, HMA(16) — the low-lag WMA
    * composition WMA₄(2·WMA₈ − WMA₁₆) on daily closes. Runs entirely
    * in EXACT integer algebra: closes become cents, each WMA numerator
    * is an integer-weighted lag dot product in DECIMAL(38,0), and the
    * three-layer composition folds into one numerator over the common
    * denominator 12240 (2·WMA₈ − WMA₁₆ = (68·ws₈ − 9·ws₁₆)/1224,
    * then the 4-3-2-1 outer weights over ×10, ×100 for cents→price
    * units) — ONE double division at
    * emission, RAW, no float weighted sums anywhere (the [[coppock]]
    * discipline). Emits once all lags exist (rn ≥ 19).
    */
  def hullMa(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val big = DecimalType(38, 0)
    val t = ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        (col("close").cast(dec) * 100).cast("long").as("cents"))
    def wsum(n: Int): Column = (0 until n).map { i =>
      val c = if (i == 0) col("cents") else lag(col("cents"), i).over(dayOrder)
      c.cast(big) * lit((n - i).toLong)
    }.reduce(_ + _).cast(big)
    val t2 = t
      .withColumn("ws8", wsum(8))
      .withColumn("ws16", wsum(16))
      .withColumn("dnum", (col("ws8") * 68 - col("ws16") * 9).cast(big))
    val hsum = (0 until 4).map { i =>
      val d = if (i == 0) col("dnum") else lag(col("dnum"), i).over(dayOrder)
      d.cast(big) * lit((4 - i).toLong)
    }.reduce(_ + _).cast(big)
    t2.withColumn("ok", lag(col("cents"), 18).over(dayOrder).isNotNull)
      .withColumn("hsum", hsum)
      .filter(col("ok"))
      .select(col("symbol"), col("day"),
        (col("hsum").cast("double") / 1224000.0).as("hma16"))
      .orderBy("symbol", "day")
  }

  /** NEW r11: market breadth report — per trading day across ALL
    * symbols: advancers/decliners/unchanged (exact decimal close
    * comparisons vs the prior bar), up-volume/down-volume, the
    * cumulative advance–decline line, and the Arms Index (TRIN) =
    * (adv/dec)/(advVol/decVol). Pure integer counting into exact-long
    * day rows; TRIN is a mirrored chain of three divisions over
    * exactly-converting counts (never the cross-product form, which
    * could overflow int64 at scale). The running A/D line is a window
    * over the DAY SERIES — one row per trading day, metadata scale at
    * any corpus size (the marketIndex posture).
    */
  def breadth(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val t = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"),
        col("volume"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull)
    val byDay = t.groupBy(col("day")).agg(
      sum(when(col("c") > col("pc"), 1L).otherwise(0L)).as("advancers"),
      sum(when(col("c") < col("pc"), 1L).otherwise(0L)).as("decliners"),
      sum(when(col("c") === col("pc"), 1L).otherwise(0L)).as("unchanged"),
      sum(when(col("c") > col("pc"), col("volume")).otherwise(0L)).as("adv_vol"),
      sum(when(col("c") < col("pc"), col("volume")).otherwise(0L)).as("dec_vol"))
    val daySeries = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val trin = (col("advancers").cast("double") / col("decliners").cast("double")) /
      (col("adv_vol").cast("double") / col("dec_vol").cast("double"))
    byDay
      .withColumn("ad_line",
        sum(col("advancers") - col("decliners")).over(daySeries))
      .select(col("day"), col("advancers"), col("decliners"), col("unchanged"),
        col("adv_vol"), col("dec_vol"), col("ad_line"),
        when(col("decliners") =!= 0 && col("adv_vol") =!= 0 &&
          col("dec_vol") =!= 0, trin).as("trin"))
      .orderBy("day")
  }

  final case class McIn(day: java.sql.Date, net: Long)
  final case class McOut(day: java.sql.Date, net: Long,
      ema19: Double, ema39: Double, mcclellan: Double)

  /** NEW r11: McClellan Oscillator — EMA19 − EMA39 of daily net
    * advancers (advancers − decliners across all symbols), the
    * classic breadth-momentum gauge. The net series is ONE row per
    * trading day (metadata scale), so the two-accumulator recursion
    * runs in a single sorted group; α = 2/20, 2/39+1=2/40 are not
    * exact binary → runtime-computed on both engines (§4). RAW.
    */
  def mcclellan(ticks: DataFrame): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull)
      .groupBy(col("day"))
      .agg((sum(when(col("c") > col("pc"), 1L).otherwise(0L)) -
        sum(when(col("c") < col("pc"), 1L).otherwise(0L))).as("net"))
      .as[McIn]
      .groupByKey(_ => 0)
      .flatMapSortedGroups(col("day")) { (_, it) =>
        val a19 = 2.0 / 20.0
        val a39 = 2.0 / 40.0
        var e19 = 0.0
        var e39 = 0.0
        var first = true
        it.map { d =>
          val x = d.net.toDouble
          if (first) { first = false; e19 = x; e39 = x }
          else {
            e19 = a19 * x + (1.0 - a19) * e19
            e39 = a39 * x + (1.0 - a39) * e39
          }
          McOut(d.day, d.net, e19, e39, e19 - e39)
        }
      }
      .toDF()
      .orderBy("day")
  }

  /** NEW r11: Corwin–Schultz high–low spread estimator — the
    * bid-ask-spread-from-daily-bars estimator (JF 2012) every
    * microstructure desk runs when quote data is missing:
    * β = Σ over a 2-day pair of (ln(h/l))², γ = (ln(H₂/L₂))² over the
    * pair's composite range, α = (√(2β)−√β)/(3−2√2) − √(γ/(3−2√2)),
    * S = 2(e^α−1)/(1+e^α). Engine parity is the full §4 libm recipe:
    * ln terms quant6'd and squared exactly in decimals (the
    * [[rangeVol]] discipline), every later op a mirrored IEEE step
    * over exactly-converting operands (√2 and the denominators are
    * RUNTIME-computed, sqrt is bit-identical), and the final
    * spread — which crosses the 1-ulp-divergent exp — is 4-dp
    * quantized via the shared FLOOR/CEIL sequence, never ROUND.
    * Negative estimates are kept (standard practice reports them;
    * clamping is the caller's choice). Bars with non-positive lows
    * are excluded on both engines.
    */
  def corwinSchultz(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    // (30,12) squares: in-width exact addition on both engines (see
    // the rangeVol width note)
    def sq(a: Column): Column =
      (a.cast(DecimalType(19, 6)) * a).cast(DecimalType(30, 12))
    val t = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("high").cast(dec).as("h"),
        col("low").cast(dec).as("l"))
      .filter(col("l") > 0)
      .withColumn("ph", lag(col("h"), 1).over(dayOrder))
      .withColumn("pl", lag(col("l"), 1).over(dayOrder))
      .filter(col("ph").isNotNull)
      .withColumn("h2", when(col("h") > col("ph"), col("h")).otherwise(col("ph")))
      .withColumn("l2", when(col("l") < col("pl"), col("l")).otherwise(col("pl")))
      .withColumn("beta",
        sq(quant6(log(col("h").cast("double") / col("l").cast("double")) * 1000000.0)) +
          sq(quant6(log(col("ph").cast("double") / col("pl").cast("double")) * 1000000.0)))
      .withColumn("gamma",
        sq(quant6(log(col("h2").cast("double") / col("l2").cast("double")) * 1000000.0)))
    val bD = col("beta").cast("double")
    val gD = col("gamma").cast("double")
    val den = lit(3.0) - lit(2.0) * sqrt(lit(2.0))
    val alpha = (sqrt(lit(2.0) * bD) - sqrt(bD)) / den - sqrt(gD / den)
    val sRaw = lit(2.0) * (exp(alpha) - lit(1.0)) / (lit(1.0) + exp(alpha))
    val s4 = sRaw * 10000.0
    val q4 = when(s4 >= 0, floor(s4 + 0.5)).otherwise(ceil(s4 - 0.5)).cast("long")
    t.select(col("symbol"), col("day"),
        (q4.cast("double") / 10000.0).as("cs_spread"))
      .orderBy("symbol", "day")
  }

  final case class ZzOut(symbol: String, day: java.sql.Date,
      pivot_price: Double, pivot_dir: Long)

  /** NEW r11: ZigZag pivots — the swing-high/low extraction behind
    * pattern scanners and Elliott/harmonic tooling: in an uptrend the
    * running extreme ratchets up with each higher close; the first
    * close retracing ≥ 5% from it CONFIRMS the extreme as a swing
    * high (emitted at the confirming bar) and flips the trend, and
    * symmetrically for lows. The 5% threshold is the exact rational
    * 1/20, so both reversal tests are pure integer-cents comparisons
    * (20·c ≤ 19·ext, 20·c ≥ 21·ext) — a hash-exact integer state
    * machine (dir, extreme) per symbol, one sorted-group pass,
    * mirrored by a recursive-CTE oracle. Seeds in an uptrend from the
    * first close (documented convention; the seed pivot itself is not
    * emitted). Emission: `pivot_dir` +1 = swing HIGH confirmed,
    * −1 = swing LOW confirmed.
    */
  def zigzag(ticks: DataFrame): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        (col("close").cast(dec) * 100).cast("long").as("cc"))
      .as[RkBar]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        var dir = 0L // 0 = unseeded
        var ext = 0L
        it.flatMap { b =>
          if (dir == 0L) { dir = 1L; ext = b.cc; Iterator.empty }
          else if (dir == 1L) {
            if (b.cc > ext) { ext = b.cc; Iterator.empty }
            else if (20L * b.cc <= 19L * ext) {
              val piv = ext; dir = -1L; ext = b.cc
              Iterator.single(ZzOut(sym, b.day, piv.toDouble / 100.0, 1L))
            } else Iterator.empty
          } else {
            if (b.cc < ext) { ext = b.cc; Iterator.empty }
            else if (20L * b.cc >= 21L * ext) {
              val piv = ext; dir = 1L; ext = b.cc
              Iterator.single(ZzOut(sym, b.day, piv.toDouble / 100.0, -1L))
            } else Iterator.empty
          }
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  final case class RkBar(symbol: String, day: java.sql.Date, cc: Long)
  final case class RkOut(symbol: String, day: java.sql.Date,
      level: Long, n_bricks: Long, direction: Long)

  /** NEW r11: Renko brick levels from daily closes — price-driven
    * (not time-driven) charting: the level moves only in whole
    * `brickCents` steps, up when the close clears the next brick
    * boundary, down when it clears the one below; sideways noise
    * inside a brick is invisible. Per bar: the post-bar level (in
    * bricks relative to the symbol's first close), how many bricks
    * printed, and the direction. PURE INTEGER state machine over
    * cents — floor/ceil divisions are explicit truncating-division
    * identities mirrored on both engines (DuckDB `//` and Spark `div`
    * both truncate toward zero), so the recursion is hash-exact with
    * no float anywhere. One sorted-group pass per symbol; the oracle
    * is a recursive CTE over the same integer state.
    */
  def renko(ticks: DataFrame, brickCents: Long = 100L): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        (col("close").cast(dec) * 100).cast("long").as("cc"))
      .as[RkBar]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        var anchor = 0L
        var level = 0L
        var first = true
        it.map { b =>
          if (first) {
            first = false; anchor = b.cc; level = 0L
            RkOut(sym, b.day, 0L, 0L, 0L)
          } else {
            val dx = b.cc - anchor
            val fd = Math.floorDiv(dx, brickCents)
            val cd = -Math.floorDiv(-dx, brickCents)
            val nl = if (fd > level) fd else if (cd < level) cd else level
            val out = RkOut(sym, b.day, nl, math.abs(nl - level),
              java.lang.Long.signum(nl - level).toLong)
            level = nl
            out
          }
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  /** NEW r11: Know Sure Thing — Pring's four-horizon smoothed-ROC
    * blend, daily variant with compressed horizons (n, m, w) =
    * (5,5,1)(8,5,2)(10,5,3)(15,8,4): the classic 10/15/20/30 ×
    * 10/10/10/15 spec needs 45 bars of history and the test tapes
    * carry 30 trading days — the structure (four quantized-ROC SMAs,
    * 1-2-3-4 weights) is identical. Each ROC quantizes to integer
    * micro-units via the shared FLOOR/CEIL sequence (float quotients
    * never accumulate), the SMAs become exact LONG window sums, and
    * the denominators fold into the single identity
    * (8·s₁ + 16·s₂ + 24·s₃ + 20·s₄)/(40·10⁶) — ONE double division,
    * RAW. Full windows only (per-window micro counts, mirrored).
    */
  def kst(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val t0 = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
    def micro(n: Int): Column = {
      val cn = lag(col("c"), n).over(dayOrder)
      when(cn.isNotNull && cn =!= 0,
        (quant6(lit(100.0) * (col("c") - cn).cast("double") /
          cn.cast("double") * 1000000.0) * 1000000).cast("long"))
    }
    val t = t0
      .withColumn("m5", micro(5)).withColumn("m8", micro(8))
      .withColumn("m10", micro(10)).withColumn("m15", micro(15))
    def w(n: Int) = dayOrder.rowsBetween(-(n - 1), 0)
    val t2 = t
      .withColumn("s1", sum(col("m5")).over(w(5)))
      .withColumn("c1", count(col("m5")).over(w(5)))
      .withColumn("s2", sum(col("m8")).over(w(5)))
      .withColumn("c2", count(col("m8")).over(w(5)))
      .withColumn("s3", sum(col("m10")).over(w(5)))
      .withColumn("c3", count(col("m10")).over(w(5)))
      .withColumn("s4", sum(col("m15")).over(w(8)))
      .withColumn("c4", count(col("m15")).over(w(8)))
    t2.filter(col("c1") === 5 && col("c2") === 5 && col("c3") === 5 &&
        col("c4") === 8)
      .select(col("symbol"), col("day"),
        ((col("s1") * 8 + col("s2") * 16 + col("s3") * 24 + col("s4") * 20)
          .cast("double") / 40000000.0).as("kst"))
      .orderBy("symbol", "day")
  }

  // ---- NEW r12 daily-bar batch: oscillator, crossover, and
  // distribution diagnostics. All ride the one ohlcDaily aggregate
  // (one tick shuffle); per-symbol day windows are bounded (bars, not
  // ticks) at any scale.

  final case class ChaikinIn(symbol: String, day: java.sql.Date, ad: Double)
  final case class ChaikinOut(symbol: String, day: java.sql.Date,
      ad_line: Double, chaikin_osc: Double)

  /** NEW r12: Chaikin Oscillator — EMA(span 3) − EMA(span 10) of the
    * accumulation/distribution line, the A/D momentum gauge. The A/D
    * input reuses the [[adLine]] emission exactly (CLV quantized to
    * 6 dp, money-flow volumes re-summed as exact decimals, one final
    * double conversion), so the EMA recursion's input doubles are
    * bit-identical across engines; the recursion itself mirrors the
    * runtime α arithmetic (2.0/4.0, 2.0/11.0 — never pre-folded
    * literals) via the [[ppo]] sorted-group pattern.
    */
  def chaikinOsc(ticks: DataFrame): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    adLine(ticks)
      .select(col("symbol"), col("day"), col("ad_line").as("ad"))
      .as[ChaikinIn]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        val af = 2.0 / 4.0   // span-3 fast EMA
        val as = 2.0 / 11.0  // span-10 slow EMA
        var ef = 0.0
        var es = 0.0
        var first = true
        it.map { b =>
          if (first) { first = false; ef = b.ad; es = b.ad }
          else {
            ef = af * b.ad + (1.0 - af) * ef
            es = as * b.ad + (1.0 - as) * es
          }
          ChaikinOut(sym, b.day, b.ad, ef - es)
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  /** NEW r12: moving-average crossover signals — the golden/death
    * cross census every charting user runs. SMA5 vs SMA20 of daily
    * closes compared WITHOUT division: sign(s5/5 − s20/20) =
    * sign(4·s5 − s20) over exact decimal window sums, so the signal
    * days are integer-exact on both engines (no float compare).
    * Emits only the crossing days: 'golden' when the fast average
    * crosses at-or-above from below, 'death' for the mirror.
    */
  def goldenCross(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    def w(n: Int) = dayOrder.rowsBetween(-(n - 1), 0)
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("s5", sum(col("c")).over(w(5)))
      .withColumn("s20", sum(col("c")).over(w(20)))
      .withColumn("cnt", count(lit(1)).over(w(20)))
      .filter(col("cnt") === 20)
      .withColumn("d", col("s5") * 4 - col("s20"))
      .withColumn("pd", lag(col("d"), 1).over(dayOrder))
      .filter(col("pd").isNotNull &&
        ((col("pd") <= 0 && col("d") > 0) || (col("pd") >= 0 && col("d") < 0)))
      .select(col("symbol"), col("day"),
        when(col("d") > 0, lit("golden")).otherwise(lit("death"))
          .as("signal"))
      .orderBy("symbol", "day")
  }

  /** NEW r12: Wald–Wolfowitz runs test on daily return signs — is the
    * up/down sequence random? R = observed runs, μ = 2·n₁·n₂/n + 1,
    * σ² = 2n₁n₂(2n₁n₂−n)/(n²(n−1)); z = (R−μ)/σ. Inputs are pure
    * integers (flat days dropped), the z chain is mirrored IEEE ops
    * (sqrt is correctly-rounded — §4 libm rule), ROUND(…,4) + signed-
    * zero guard. Degenerate series (all one sign, n < 2) emit NULL z.
    */
  def runsTest(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val signs = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull && col("c") =!= col("pc"))
      .withColumn("s", when(col("c") > col("pc"), lit(1)).otherwise(lit(-1)))
      .withColumn("ps", lag(col("s"), 1).over(dayOrder))
    val agg = signs.groupBy("symbol").agg(
      sum(when(col("s") === 1, 1L).otherwise(0L)).as("n_up"),
      sum(when(col("s") === -1, 1L).otherwise(0L)).as("n_down"),
      (sum(when(col("ps").isNotNull && col("s") =!= col("ps"), 1L)
        .otherwise(0L)) + 1L).as("runs"))
    val n = (col("n_up") + col("n_down")).cast("double")
    val p = (col("n_up") * col("n_down") * 2L).cast("double")
    val mu = p / n + lit(1.0)
    val va = p * (p - n) / (n * n * (n - lit(1.0)))
    agg.select(col("symbol"), col("n_up"), col("n_down"), col("runs"),
        when(col("n_up") > 0 && col("n_down") > 0 &&
             col("n_up") + col("n_down") > 1 && va > 0,
          round((col("runs").cast("double") - mu) / sqrt(va), 4) + lit(0.0))
          .as("z"))
      .orderBy("symbol")
  }

  /** NEW r12: overnight gap-fill census — of the days that opened away
    * from the prior close, how often did price revisit it intraday
    * (gap up fills when low ≤ prev close; gap down when high ≥)?
    * Exact decimal compares, integer counts, one ROUND(…,4) true
    * division per rate (NULL when a side has no gaps).
    */
  def gapFillRate(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("open").cast(dec).as("o"),
        col("high").cast(dec).as("h"), col("low").cast(dec).as("l"),
        col("close").cast(dec).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull)
      .groupBy("symbol")
      .agg(
        sum(when(col("o") > col("pc"), 1L).otherwise(0L)).as("gaps_up"),
        sum(when(col("o") > col("pc") && col("l") <= col("pc"), 1L)
          .otherwise(0L)).as("filled_up"),
        sum(when(col("o") < col("pc"), 1L).otherwise(0L)).as("gaps_down"),
        sum(when(col("o") < col("pc") && col("h") >= col("pc"), 1L)
          .otherwise(0L)).as("filled_down"))
      .select(col("symbol"), col("gaps_up"), col("filled_up"),
        col("gaps_down"), col("filled_down"),
        when(col("gaps_up") > 0,
          round(col("filled_up").cast("double") /
            col("gaps_up").cast("double"), 4)).as("fill_rate_up"),
        when(col("gaps_down") > 0,
          round(col("filled_down").cast("double") /
            col("gaps_down").cast("double"), 4)).as("fill_rate_down"))
      .orderBy("symbol")
  }

  /** NEW r12: turn-of-month seasonality — average daily return by
    * day-of-month, the calendar-effect companion of [[dowReturns]]
    * (same 6-dp quantized return series, same exact-decimal-sum /
    * one-division RAW emission).
    */
  def turnOfMonth(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull && col("pc") =!= 0)
      .select(col("symbol"), col("day"),
        quant6((col("c") - col("pc")).cast("double") /
          col("pc").cast("double") * 1000000.0).as("r"))
      .groupBy(col("symbol"), dayofmonth(col("day")).cast("long").as("dom"))
      .agg(count(lit(1)).as("n_days"),
        (sum(col("r")).cast("double") /
          count(lit(1)).cast("double")).as("avg_ret"))
      .orderBy("symbol", "dom")
  }

  /** Shared daily 6-dp-quantized close-to-close return series (the
    * [[betaDaily]] quantization): (symbol, day, r DECIMAL(18,6)).
    */
  private def dailyRet6(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    ticks.groupBy(col("symbol"), to_date(col("ts")).as("day"))
      .agg(max_by(col("price"), tieKey).cast(dec).as("c"),
        sum(col("volume")).as("vol"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .withColumn("pv", lag(col("vol"), 1).over(dayOrder))
      .filter(col("pc").isNotNull && col("pc") =!= 0)
      .select(col("symbol"), col("day"),
        quant6((col("c") - col("pc")).cast("double") /
          col("pc").cast("double") * 1000000.0).as("r"),
        (col("vol") - col("pv")).as("dv"))
  }

  /** NEW r12: daily price–volume correlation per symbol — Pearson corr
    * of (6-dp quantized daily return, daily volume change). The
    * co-moment sums are exact decimals (returns at scale 6, volume
    * deltas as width-18/19 decimal products forcing INT128 in DuckDB);
    * the correlation is the stddev class (§4): mirrored IEEE chain over
    * the converted sums, ROUND(…,4) + signed-zero guard.
    */
  def priceVolumeCorr(ticks: DataFrame): DataFrame = {
    val sq12 = DecimalType(38, 12)
    val agg = dailyRet6(ticks).groupBy("symbol").agg(
      count(lit(1)).as("n_days"),
      count(lit(1)).cast("double").as("n"),
      sum(col("r")).cast("double").as("sx"),
      sum(col("dv")).cast("double").as("sy"),
      sum((col("r") * col("dv").cast(DecimalType(19, 0)))
        .cast(DecimalType(38, 6))).cast("double").as("sxy"),
      sum((col("r") * col("r")).cast(sq12)).cast("double").as("sxx"),
      sum((col("dv").cast(DecimalType(18, 0)) *
        col("dv").cast(DecimalType(19, 0))).cast(DecimalType(38, 0)))
        .cast("double").as("syy"))
    val cn = col("sxy") - col("sx") * col("sy") / col("n")
    val dx = col("sxx") - col("sx") * col("sx") / col("n")
    val dy = col("syy") - col("sy") * col("sy") / col("n")
    agg.select(col("symbol"), col("n_days"),
        when(col("n") > 1.0 && dx > 0.0 && dy > 0.0,
          round(cn / sqrt(dx * dy), 4) + lit(0.0)).as("pv_corr"))
      .orderBy("symbol")
  }

  /** NEW r12: volatility of volatility — the sample stddev ACROSS days
    * of the per-day Parkinson range term u = quant6(ln(high/low)), a
    * second-moment regime gauge. u re-sums as exact decimals (the
    * [[rangeVol]] series); the stddev is the §4 stddev class: mirrored
    * conversion + ROUND(…,4).
    */
  def volOfVol(ticks: DataFrame): DataFrame = {
    val sq12 = DecimalType(38, 12)
    val u = ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        col("high").cast(dec).as("h"), col("low").cast(dec).as("l"))
      .filter(col("h") > 0 && col("l") > 0)
      .select(col("symbol"),
        quant6(log(col("h").cast("double") / col("l").cast("double"))
          * 1000000.0).as("u"))
    val agg = u.groupBy("symbol").agg(
      count(lit(1)).as("n_days"),
      count(lit(1)).cast("double").as("n"),
      sum(col("u")).cast("double").as("s"),
      sum((col("u") * col("u")).cast(sq12)).cast("double").as("sq"))
    val va = (col("sq") - col("s") * col("s") / col("n")) / (col("n") - 1.0)
    agg.select(col("symbol"), col("n_days"),
        when(col("n") > 1.0,
          round(sqrt(when(va > 0.0, va).otherwise(lit(0.0))), 4) + lit(0.0))
          .as("vol_of_vol"))
      .orderBy("symbol")
  }

  /** NEW r12: AR(1) mean-reversion coefficient — the OLS slope of the
    * daily return on its own lag (φ < 0 ⇒ reverting, φ > 0 ⇒
    * trending; the Engle–Granger step-2 statistic applied to single
    * names). Same exact-decimal co-moment machinery as [[betaDaily]],
    * same stddev-class ROUND(…,4) emission.
    */
  def meanReversion(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val sq12 = DecimalType(38, 12)
    val pairs = dailyRet6(ticks)
      .withColumn("x", lag(col("r"), 1).over(dayOrder))
      .filter(col("x").isNotNull)
    val agg = pairs.groupBy("symbol").agg(
      count(lit(1)).as("n_days"),
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("r")).cast("double").as("sy"),
      sum((col("x") * col("r")).cast(sq12)).cast("double").as("sxy"),
      sum((col("x") * col("x")).cast(sq12)).cast("double").as("sxx"))
    val dx = col("sxx") - col("sx") * col("sx") / col("n")
    agg.select(col("symbol"), col("n_days"),
        when(col("n") > 1.0 && dx =!= 0.0,
          round((col("sxy") - col("sx") * col("sy") / col("n")) / dx, 4)
            + lit(0.0)).as("ar1_phi"))
      .orderBy("symbol")
  }

  final case class KlBar(symbol: String, day: java.sql.Date,
      h: java.math.BigDecimal, l: java.math.BigDecimal,
      c: java.math.BigDecimal, vol: Long)
  final case class KlOut(symbol: String, day: java.sql.Date,
      trend: Long, kvo: Double)

  /** NEW r12: Klinger Volume Oscillator — EMA34 − EMA55 of the volume
    * force VF = volume·|2·(dm/cm − 1)|·trend·100, where trend flips on
    * the high+low+close sum and cm accumulates daily ranges within a
    * trend leg (reset to dmₚ + dm on a flip). The (trend, cm) state
    * machine runs on EXACT decimals (trend compares and cm sums never
    * touch floats), VF and both EMAs are mirrored double chains with
    * runtime α (2/35, 2/56). Seed convention (documented, mirrored):
    * the first computable bar (rn = 2) takes cm = dm₁ + dm₂ and seeds
    * both EMAs with its VF. Flat legs (cm = 0) contribute VF = 0.
    */
  def klinger(ticks: DataFrame): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("high").cast(dec).as("h"),
        col("low").cast(dec).as("l"), col("close").cast(dec).as("c"),
        col("volume").as("vol"))
      .as[KlBar]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        val af = 2.0 / 35.0
        val as = 2.0 / 56.0
        var pb: KlBar = null
        var started = false
        var trend = 0L
        var cm = java.math.BigDecimal.ZERO
        var ef = 0.0; var es = 0.0
        it.flatMap { b =>
          val out: Iterator[KlOut] =
            if (pb == null) Iterator.empty
            else {
              val hlc = b.h.add(b.l).add(b.c)
              val phlc = pb.h.add(pb.l).add(pb.c)
              val t = if (hlc.compareTo(phlc) > 0) 1L else -1L
              val dm = b.h.subtract(b.l)
              val dmp = pb.h.subtract(pb.l)
              cm = if (!started || t != trend) dmp.add(dm) else cm.add(dm)
              trend = t
              val vf =
                if (cm.signum() == 0) 0.0
                else b.vol.toDouble *
                  math.abs(2.0 * (dm.doubleValue() / cm.doubleValue() - 1.0)) *
                  t.toDouble * 100.0
              if (!started) { started = true; ef = vf; es = vf }
              else {
                ef = af * vf + (1.0 - af) * ef
                es = as * vf + (1.0 - as) * es
              }
              Iterator.single(KlOut(sym, b.day, trend, ef - es))
            }
          pb = b
          out
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  final case class NpBar(symbol: String, day: java.sql.Date,
      c: java.math.BigDecimal, vol: Long)
  final case class NpOut(symbol: String, day: java.sql.Date,
      nvi: Double, pvi: Double)

  /** NEW r12: Negative / Positive Volume Indices — the multiplicative
    * recursion family (Fosback): NVI compounds the daily return only
    * on volume-DOWN days, PVI only on volume-UP days, both from 1000.
    * The float products are sequential by construction; both engines
    * run the IDENTICAL per-step op chain (ret from exact decimals, one
    * multiply per update) so the doubles stay bit-identical — RAW
    * emission, recursive-CTE oracle. A zero previous close keeps both
    * indices unchanged (mirrored guard).
    */
  def nviPvi(ticks: DataFrame): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"),
        col("volume").as("vol"))
      .as[NpBar]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        var pb: NpBar = null
        var nvi = 1000.0
        var pvi = 1000.0
        it.flatMap { b =>
          val out: Iterator[NpOut] =
            if (pb == null) Iterator.empty
            else {
              if (pb.c.signum() != 0) {
                val ret = b.c.subtract(pb.c).doubleValue() / pb.c.doubleValue()
                if (b.vol < pb.vol) nvi = nvi * (1.0 + ret)
                if (b.vol > pb.vol) pvi = pvi * (1.0 + ret)
              }
              Iterator.single(NpOut(sym, b.day, nvi, pvi))
            }
          pb = b
          out
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  /** NEW r12: volatility cone — the term structure of realized
    * volatility: for each horizon h ∈ {5, 10, 20} bars, the sample
    * stddev of quant6 daily returns over EVERY full h-bar window, then
    * the per-(symbol, horizon) envelope (min / mean / max of the
    * rolling vols) a desk plots against option-implied vol. Each
    * window's variance comes from exact decimal sums (bit-identical
    * doubles), so min/max are order-free RAW; the mean re-quantizes
    * each vol to 6 dp first so its sum is exact (one RAW division).
    */
  def volCone(ticks: DataFrame, horizons: Seq[Int] = Seq(5, 10, 20)): DataFrame = {
    val sq12 = DecimalType(38, 12)
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val rets = dailyRet6(ticks).select(col("symbol"), col("day"), col("r"))
    val perH = horizons.map { h =>
      val w = dayOrder.rowsBetween(-(h - 1), 0)
      val t = rets
        .withColumn("cnt", count(lit(1)).over(w))
        .withColumn("s", sum(col("r")).over(w))
        .withColumn("sq", sum((col("r") * col("r")).cast(sq12)).over(w))
        .filter(col("cnt") === h)
      val va = (col("sq").cast("double") -
        col("s").cast("double") * col("s").cast("double") / h.toDouble) /
        (h.toDouble - 1.0)
      t.select(col("symbol"), lit(h.toLong).as("horizon"),
        sqrt(when(va > 0.0, va).otherwise(lit(0.0))).as("vol"))
    }
    perH.reduce(_.unionByName(_))
      .withColumn("vol6", quant6(col("vol") * 1000000.0))
      .groupBy(col("symbol"), col("horizon"))
      .agg(count(lit(1)).as("n_windows"),
        min(col("vol")).as("vol_min"),
        max(col("vol")).as("vol_max"),
        (sum(col("vol6")).cast("double") /
          count(lit(1)).cast("double")).as("vol_mean"))
      .orderBy("symbol", "horizon")
  }

  /** NEW r12: volume-price trend — the percentage-return sibling of
    * [[obv]]: running Σ volume·ret where ret is the 4-dp WINSORIZED
    * tick return ([[winsorizedRet4]]; 0 on a zero/NULL previous price
    * by convention). Same distributed prefix-aggregation scaffold as
    * obv (chunked within-day windows + per-day totals broadcast
    * back). All arithmetic is INTEGER-exact: the return rides as a
    * scaled BIGINT (1e-4 units), per-tick products and running sums
    * are scale-0 decimals — scale-0 decimal addition has no
    * precision-39 scale-trim cliff (§4 r11) — and ONE mirrored
    * division by 1e4 converts at emission.
    */
  def vpt(ticks: DataFrame): DataFrame = {
    val t = ticks.withColumn("chunk_day", to_date(col("ts")))
    val contrib = chunkedLag1(t, "price", "prev")
      .withColumn("r4u",
        when(col("prev").isNotNull && col("prev") =!= 0,
          (winsorizedRet4 * 10000).cast("long")).otherwise(lit(0L)))
      .withColumn("pv",
        (col("r4u").cast(DecimalType(7, 0)) *
          col("volume").cast(DecimalType(19, 0))).cast(DecimalType(27, 0)))
    val offsets = contrib.groupBy(col("symbol"), col("chunk_day"))
      .agg(sum(col("pv")).as("day_total"))
      .select(col("symbol"), col("chunk_day"),
        coalesce(sum(col("day_total")).over(priorDays),
          lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 0)))
          .as("cum_offset"))
    contrib.join(offsets, Seq("symbol", "chunk_day"))
      .select(col("event_id"), col("symbol"),
        ((sum(col("pv")).over(chunkOrder.rowsBetween(Window.unboundedPreceding, 0))
          + col("cum_offset")).cast("double") / 10000.0).as("vpt"))
      .orderBy("event_id")
  }

  /** 4-dp quantization of a double via the shared float-op sequence —
    * the [[quant6]] discipline at report precision, emitted directly
    * as DOUBLE (scale, FLOOR/CEIL, one division by 1e4 — identical
    * IEEE ops on both engines; ROUND(d, 4) half-rounds divergently on
    * exact .5 boundaries, which purely RATIONAL statistics like a
    * rank correlation can actually hit).
    */
  private def quant4(x: Column): Column = {
    val s = x * 10000.0
    val q = when(s >= 0, floor(s + 0.5)).otherwise(ceil(s - 0.5))
    q.cast("long").cast("double") / 10000.0
  }

  /** NEW r12b: volume-weighted moving average — the 20-tick VWMA a
    * chartist overlays when plain SMA ignores participation. Rides the
    * [[chunkedFrame]] scaffold with invertible running sums (the
    * bollinger r9 rework): running Σ(price·vol) and Σvol minus their
    * lag(n) — exact decimal differences, O(1)/row, no whole-symbol
    * window. The (18,2)×(18,0) product is width 37 (≤38 on both
    * engines, §4 width rule); the emission is one [[quant6]]'d
    * division (zero-volume windows emit NULL — ANSI guard).
    */
  def vwma(ticks: DataFrame, n: Int = 20, chunkRows: Long = 8192L): DataFrame = {
    val (t0, spec) = chunkedFrame(ticks, n - 1, chunkRows)
    val run = spec.rowsBetween(Window.unboundedPreceding, 0)
    val t = t0
      .withColumn("cpv", sum(col("price").cast(dec) *
        col("volume").cast(DecimalType(18, 0))).over(run))
      .withColumn("cv", sum(col("volume")).over(run))
    def slide(c: Column): Column = c - coalesce(lag(c, n).over(spec), lit(0))
    t.select(col("event_id"), col("symbol"), col("carry"),
        when(slide(col("cv")) =!= 0,
          quant6(slide(col("cpv")).cast("double") /
            slide(col("cv")).cast("double") * 1000000.0).cast("double"))
          .as(s"vwma$n"))
      .filter(!col("carry"))
      .select(col("event_id"), col("symbol"), col(s"vwma$n"))
      .orderBy("event_id")
  }

  /** NEW r12b: Awesome Oscillator (Bill Williams) — SMA(fast) −
    * SMA(slow) of the bar midpoint (high+low)/2 on daily bars,
    * compressed 5/20 (the classic 5/34 needs 34 bars, the tapes carry
    * 30 — the KST precedent; identical structure). The window sums
    * stay exact DECIMAL over (h+l) and the halving folds into the
    * final divisors (Σ/2·fast, Σ/2·slow), so the emission is two
    * exact-operand double divisions and one subtraction — mirrored
    * IEEE ops, RAW emission (no round, §4). Defined from the
    * `slow`-th bar on.
    */
  def awesomeOsc(ticks: DataFrame, fast: Int = 5, slow: Int = 20): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        (col("high").cast(dec) + col("low").cast(dec)).as("hl"))
      .withColumn("sf", sum(col("hl")).over(dayOrder.rowsBetween(-(fast - 1), 0)))
      .withColumn("ss", sum(col("hl")).over(dayOrder.rowsBetween(-(slow - 1), 0)))
      .withColumn("ns", count(lit(1)).over(dayOrder.rowsBetween(-(slow - 1), 0)))
      .filter(col("ns") === slow)
      .select(col("symbol"), col("day"),
        (col("sf").cast("double") / (2.0 * fast) -
          col("ss").cast("double") / (2.0 * slow)).as("awesome"))
      .orderBy("symbol", "day")
  }

  /** NEW r12b: Spearman rank correlation matrix — the robust sibling
    * of [[correlationMatrix]]: monotone association of two symbols'
    * daily return series, immune to the outlier days that dominate
    * Pearson. Returns are the shared 6-dp-quantized [[dailyRet6]]
    * series; within each pair the two sides are ranked by
    * ROW_NUMBER over (return, day) — a fixed deterministic tie policy
    * both engines mirror exactly (average-rank ties would need float
    * rank arithmetic) — and ρ = 1 − 6·Σd²/(n(n²−1)) is pure integer
    * arithmetic until one final division, [[quant4]]'d. The pair join
    * runs on the tiny daily rollup (symbols × days), never raw ticks;
    * rank windows partition per pair over calendar-bounded rows.
    */
  def spearmanMatrix(ticks: DataFrame): DataFrame = {
    val r = dailyRet6(ticks).select(col("symbol"), col("day"), col("r"))
    val a = r.select(col("symbol").as("sym_a"), col("day"), col("r").as("ra"))
    val b = r.select(col("symbol").as("sym_b"), col("day"), col("r").as("rb"))
    val pw = Window.partitionBy("sym_a", "sym_b")
    a.join(b, "day").filter(col("sym_a") < col("sym_b"))
      .withColumn("rka",
        row_number().over(pw.orderBy(col("ra"), col("day"))).cast("long"))
      .withColumn("rkb",
        row_number().over(pw.orderBy(col("rb"), col("day"))).cast("long"))
      .withColumn("d", col("rka") - col("rkb"))
      .groupBy("sym_a", "sym_b")
      .agg(count(lit(1)).as("n_days"),
        sum(col("d") * col("d")).cast("long").as("s2"))
      .filter(col("n_days") > 1)
      .select(col("sym_a"), col("sym_b"), col("n_days"),
        quant4(lit(1.0) - (col("s2") * 6L).cast("double") /
          (col("n_days") * (col("n_days") * col("n_days") - 1L))
            .cast("double")).as("rho"))
      .orderBy("sym_a", "sym_b")
  }

  /** NEW r12b: anchored VWAP — the running day-anchored
    * Σ(price·vol)/Σvol every intraday trader tracks (resets at the
    * session open). The anchor day IS the window partition, so this
    * is chunk-parallel by construction — no whole-symbol window, no
    * carry scaffold: (symbol, day) partitions are calendar-bounded.
    * Exact decimal running sums ((18,2)×(18,0) width-37 products),
    * one quant6'd division per tick, zero-volume prefix NULL guard.
    */
  def anchoredVwap(ticks: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol", "anchor_day")
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    ticks.withColumn("anchor_day", to_date(col("ts")))
      .select(col("event_id"), col("symbol"),
        sum(col("price").cast(dec) * col("volume").cast(DecimalType(18, 0)))
          .over(w).as("cpv"),
        sum(col("volume")).over(w).as("cv"))
      .select(col("event_id"), col("symbol"),
        when(col("cv") =!= 0,
          quant6(col("cpv").cast("double") / col("cv").cast("double")
            * 1000000.0).cast("double")).as("avwap"))
      .orderBy("event_id")
  }

  /** NEW r12b: Omega ratio at threshold 0 — Σ positive / Σ |negative|
    * quant6 daily returns, the gain/loss asymmetry gauge that (unlike
    * Sharpe) uses the whole return distribution. Pure exact decimal
    * sums over the shared [[dailyRet6]] series, both legs also emitted
    * (exact decimal → double), ONE raw division; loss-free tapes emit
    * NULL omega (ANSI guard, mirrored).
    */
  def omegaRatio(ticks: DataFrame): DataFrame = {
    val z = lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 6))
    dailyRet6(ticks).groupBy("symbol").agg(
        count(lit(1)).as("n_days"),
        sum(when(col("r") > 0, col("r")).otherwise(z)).as("gain"),
        sum(when(col("r") < 0, -col("r")).otherwise(z)).as("loss"))
      .select(col("symbol"), col("n_days"),
        col("gain").cast("double").as("gain_sum"),
        col("loss").cast("double").as("loss_sum"),
        when(col("loss") =!= 0,
          col("gain").cast("double") / col("loss").cast("double"))
          .as("omega"))
      .orderBy("symbol")
  }

  /** NEW r12b: information ratio vs the equal-weight market index —
    * mean/stddev of the ACTIVE daily return (symbol return minus the
    * cross-sectional mean return that day), the "is this symbol's
    * excess persistent" gauge beside [[betaDaily]]. The benchmark leg
    * is quant6'd (mean of quant6 returns, one double division →
    * shared FLOOR/CEIL), actives re-sum as exact decimals with
    * (18,6)×(18,6) → (37,12) squares, and the emission is the §4
    * stddev class: mirrored IEEE chain, ROUND(…,4) + signed-zero
    * guard. The day rollup is tiny; both aggregation keys are
    * calendar/symbol-bounded.
    */
  def informationRatio(ticks: DataFrame): DataFrame = {
    val sq12 = DecimalType(38, 12)
    val r = dailyRet6(ticks).select(col("symbol"), col("day"), col("r"))
    val idx = r.groupBy("day").agg(
      quant6(sum(col("r")).cast("double") / count(lit(1)).cast("double")
        * 1000000.0).as("idx6"))
    val a = r.join(idx, "day")
      .select(col("symbol"),
        (col("r") - col("idx6")).cast(DecimalType(18, 6)).as("a"))
    val agg = a.groupBy("symbol").agg(
      count(lit(1)).as("n_days"),
      count(lit(1)).cast("double").as("n"),
      sum(col("a")).cast("double").as("sa"),
      sum((col("a") * col("a")).cast(sq12)).cast("double").as("saa"))
    val va = (col("saa") - col("sa") * col("sa") / col("n")) /
      (col("n") - 1.0)
    agg.select(col("symbol"), col("n_days"),
        when(col("n") > 1.0 && va > 0.0,
          round((col("sa") / col("n")) / sqrt(va), 4) + lit(0.0))
          .as("info_ratio"))
      .orderBy("symbol")
  }

  /** NEW r12c: tick-sign autocorrelation — E[s_t·s_{t−ℓ}] of tick-rule
    * signs for lags 1..3, over pairs where both signs are nonzero (the
    * order-splitting / momentum-vs-reversal microstructure gauge
    * beside [[ofi]]). Signs are exact decimal compares, the dot is an
    * integer ±1 sum, and the emission is ONE raw division of two
    * exact longs (correctly rounded identically on both engines — no
    * round). Lags ride the [[chunkedFrame]] scaffold (carry 4 covers
    * lag 3 + the layered price lag); the lag rows unpivot via the
    * two-step struct explode into a counter aggregation on the
    * (symbol, lag) key.
    */
  def signAutocorr(ticks: DataFrame, chunkRows: Long = 8192L): DataFrame = {
    val (t0, spec) = chunkedFrame(ticks, 4, chunkRows)
    val chg = col("price").cast(dec) - lag(col("price"), 1).over(spec).cast(dec)
    val lagged = t0
      .withColumn("s", when(chg > 0, 1L).when(chg < 0, -1L).otherwise(0L))
      .withColumn("s1", lag(col("s"), 1).over(spec))
      .withColumn("s2", lag(col("s"), 2).over(spec))
      .withColumn("s3", lag(col("s"), 3).over(spec))
      .filter(!col("carry"))
    lagged
      .select(col("symbol"), array(
        struct(lit(1L).as("lag_n"), col("s").as("a"), col("s1").as("b")),
        struct(lit(2L).as("lag_n"), col("s").as("a"), col("s2").as("b")),
        struct(lit(3L).as("lag_n"), col("s").as("a"), col("s3").as("b")))
        .as("ps"))
      .select(col("symbol"), explode(col("ps")).as("p"))
      .select(col("symbol"), col("p.lag_n").as("lag_n"),
        col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= 0 && col("b").isNotNull && col("b") =!= 0)
      .groupBy(col("symbol"), col("lag_n"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("a") * col("b")).cast("long").as("dot"))
      .select(col("symbol"), col("lag_n"), col("n_pairs"),
        (col("dot").cast("double") / col("n_pairs").cast("double"))
          .as("sign_ac"))
      .orderBy("symbol", "lag_n")
  }

  /** NEW r12c: candlestick anatomy census — per symbol over daily
    * bars: mean body / upper-wick / lower-wick shares of the bar range
    * and a 5%-body doji count (the "what do this instrument's candles
    * look like" shape report behind [[candlePatterns]]). Flat bars
    * (h = l) are excluded (the shares are undefined); each share is
    * quant6'd (one guarded division on exact decimals) and re-summed
    * exactly, the means are single raw divisions, and the doji flag is
    * an exact integer cross-multiplication (20·|c−o| ≤ (h−l)), never a
    * float threshold. Decimal extremes via CASE, not greatest (DuckDB
    * promotes DECIMAL greatest to DOUBLE — §4 r10).
    */
  def candleAnatomy(ticks: DataFrame): DataFrame = {
    val b = ohlcDaily(ticks)
      .select(col("symbol"),
        col("open").cast(dec).as("o"), col("high").cast(dec).as("h"),
        col("low").cast(dec).as("l"), col("close").cast(dec).as("c"))
      .filter(col("h") > col("l"))
      .withColumn("rng", col("h") - col("l"))
      .withColumn("body",
        when(col("c") >= col("o"), col("c") - col("o"))
          .otherwise(col("o") - col("c")))
      .withColumn("hi", when(col("o") > col("c"), col("o")).otherwise(col("c")))
      .withColumn("lo", when(col("o") < col("c"), col("o")).otherwise(col("c")))
    def share(num: Column): Column =
      quant6(num.cast("double") / col("rng").cast("double") * 1000000.0)
    b.select(col("symbol"),
        share(col("body")).as("bs"),
        share(col("h") - col("hi")).as("us"),
        share(col("lo") - col("l")).as("ls"),
        when(col("body") * 20 <= col("rng"), 1L).otherwise(0L).as("doji"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_bars"),
        sum(col("bs")).cast("double").as("sb"),
        sum(col("us")).cast("double").as("su"),
        sum(col("ls")).cast("double").as("sl"),
        sum(col("doji")).cast("long").as("n_doji"))
      .select(col("symbol"), col("n_bars"), col("n_doji"),
        (col("sb") / col("n_bars").cast("double")).as("avg_body_share"),
        (col("su") / col("n_bars").cast("double")).as("avg_upper_share"),
        (col("sl") / col("n_bars").cast("double")).as("avg_lower_share"))
      .orderBy("symbol")
  }

  final case class TsiIn(symbol: String, day: java.sql.Date, mom: Double)
  final case class TsiOut(symbol: String, day: java.sql.Date, tsi: Double)

  /** NEW r12b: True Strength Index (Blau) — double-smoothed momentum:
    * 100·EMA13(EMA25(Δc)) / EMA13(EMA25(|Δc|)). Momentum is the exact
    * DECIMAL close-to-close difference (one exact double conversion),
    * the four-state EMA chain mirrors the runtime α arithmetic
    * (2.0/26.0, 2.0/14.0) via the [[chaikinOsc]] sorted-group pattern,
    * both recursions seed at the first momentum bar, and the emission
    * is one mirrored 100·num/den division (flat-tape zero denominator
    * emits 0 on both engines). Defined from the 2nd bar on.
    */
  def tsi(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull)
      .select(col("symbol"), col("day"),
        (col("c") - col("pc")).cast("double").as("mom"))
      .as[TsiIn]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        val a25 = 2.0 / 26.0
        val a13 = 2.0 / 14.0
        var e1m = 0.0; var e2m = 0.0; var e1a = 0.0; var e2a = 0.0
        var first = true
        it.map { b =>
          val am = math.abs(b.mom)
          if (first) {
            first = false; e1m = b.mom; e2m = b.mom; e1a = am; e2a = am
          } else {
            e1m = a25 * b.mom + (1.0 - a25) * e1m
            e2m = a13 * e1m + (1.0 - a13) * e2m
            e1a = a25 * am + (1.0 - a25) * e1a
            e2a = a13 * e1a + (1.0 - a13) * e2a
          }
          TsiOut(sym, b.day, if (e2a != 0.0) 100.0 * e2m / e2a else 0.0)
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  final case class DtOut(symbol: String, day: java.sql.Date,
    e1: Double, e2: Double, e3: Double)

  /** NEW r13b: DEMA / TEMA (n=10) — Mulloy's reduced-lag moving
    * averages: DEMA = 2·EMA − EMA(EMA), TEMA = 3·EMA − 3·EMA² + EMA³.
    * One sorted-group pass carries the three stacked EMA states in
    * mirrored runtime-α doubles (α = 2/(n+1)), seeded at the first
    * bar (e₁ = e₂ = e₃ = c); the oracle's recursive CTE re-inlines
    * e₁ₙ inside e₂ₙ and e₂ₙ inside e₃ₙ (the tsi precedent — same IEEE
    * values as the stored locals). The emissions are one mirrored
    * linear combination of the states each, applied OUTSIDE the
    * recursion on both engines.
    */
  def demaTema(ticks: DataFrame, n: Int = 10): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        col("close").cast(dec).cast("double").as("c"))
      .as[ImpulseIn]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        val a = 2.0 / (n + 1).toDouble
        var e1 = 0.0; var e2 = 0.0; var e3 = 0.0; var first = true
        it.map { b =>
          if (first) { first = false; e1 = b.c; e2 = b.c; e3 = b.c }
          else {
            e1 = a * b.c + (1.0 - a) * e1
            e2 = a * e1 + (1.0 - a) * e2
            e3 = a * e2 + (1.0 - a) * e3
          }
          DtOut(sym, b.day, e1, e2, e3)
        }
      }
      .toDF()
      .select(col("symbol"), col("day"),
        (lit(2.0) * col("e1") - col("e2")).as("dema"),
        (lit(3.0) * col("e1") - lit(3.0) * col("e2") + col("e3")).as("tema"))
      .orderBy("symbol", "day")
  }

  final case class ImpulseIn(symbol: String, day: java.sql.Date, c: Double)

  final case class StcOut(symbol: String, day: java.sql.Date, stc: Double)

  /** NEW r15: Schaff Trend Cycle (Schaff's MACD-of-stochastics
    * cascade): MACD(12,26) → 10-bar stochastic %K → 0.5-EMA smooth →
    * 10-bar stochastic of THAT → 0.5-EMA smooth = STC ∈ [0, 100] —
    * the cycle-normalized MACD that turns earlier than the raw
    * histogram. One sorted-group pass per symbol carries the WHOLE
    * five-stage cascade (two EMA states, two trailing-10 ring
    * buffers, two smoother states) — the windows are trailing
    * extrema of values produced in the same sequential scan, so no
    * window operator is needed at all.
    *
    * Parity: the MACD recursion is the mirrored raw-double elder
    * pattern (seed e12 = e26 = first close); trailing MIN/MAX over
    * identical doubles are identical; each stochastic is one mirrored
    * multiply+divide with a flat-window CASE → 50.0 guard on both
    * engines; the 0.5 smoothers are d + 0.5·(k − d) — exact-binary
    * state scaling (the fisher precedent). Raw-double emission (no
    * final round — identical op chains end-to-end). Oracle: three
    * chained recursive CTEs interleaved with trailing-ROWS window
    * CTEs.
    */
  def stc(ticks: DataFrame): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        col("close").cast(dec).cast("double").as("c"))
      .as[ImpulseIn]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        val a12 = 2.0 / 13.0; val a26 = 2.0 / 27.0
        var e12 = 0.0; var e26 = 0.0; var first = true
        val mb = scala.collection.mutable.ArrayDeque.empty[Double]
        val db = scala.collection.mutable.ArrayDeque.empty[Double]
        var d1 = 0.0; var d2 = 0.0
        var haveD1 = false; var haveD2 = false
        it.map { b =>
          if (first) { first = false; e12 = b.c; e26 = b.c }
          else {
            e12 = a12 * b.c + (1.0 - a12) * e12
            e26 = a26 * b.c + (1.0 - a26) * e26
          }
          val macd = e12 - e26
          mb.append(macd); if (mb.size > 10) mb.removeHead()
          val mn = mb.min; val mx = mb.max
          val k1 = if (mx > mn) 100.0 * (macd - mn) / (mx - mn) else 50.0
          d1 = if (!haveD1) { haveD1 = true; k1 } else d1 + 0.5 * (k1 - d1)
          db.append(d1); if (db.size > 10) db.removeHead()
          val dn = db.min; val dx = db.max
          val k2 = if (dx > dn) 100.0 * (d1 - dn) / (dx - dn) else 50.0
          d2 = if (!haveD2) { haveD2 = true; k2 } else d2 + 0.5 * (k2 - d2)
          StcOut(sym, b.day, d2)
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  /** NEW r13b: Elder impulse census — per symbol, bars where BOTH the
    * EMA(13) and the MACD(12,26,9) histogram rose (green), both fell
    * (red), or mixed (blue): Elder's trend+momentum traffic light,
    * reported as a census. One sorted-group pass carries the
    * five-state recursion (e12, e26, signal, histogram, e13) in
    * mirrored runtime-α doubles; the oracle's recursive CTE re-inlines
    * the dependent sub-expressions (macdₙ inside signalₙ/histₙ — same
    * IEEE values as the stored locals, the tsi precedent). Seeds at
    * the first bar (e* = c, signal = hist = 0), emits from the 2nd;
    * compares of bit-identical doubles are engine-deterministic.
    */
  def elderImpulse(ticks: DataFrame): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        col("close").cast(dec).cast("double").as("c"))
      .as[ImpulseIn]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        val a12 = 2.0 / 13.0; val a26 = 2.0 / 27.0
        val a9 = 2.0 / 10.0; val a13 = 2.0 / 14.0
        var e12 = 0.0; var e26 = 0.0; var sig = 0.0; var e13 = 0.0
        var hist = 0.0; var first = true
        it.flatMap { b =>
          if (first) {
            first = false
            e12 = b.c; e26 = b.c; e13 = b.c; sig = 0.0; hist = 0.0
            None
          } else {
            val pe13 = e13; val phist = hist
            val e12n = a12 * b.c + (1.0 - a12) * e12
            val e26n = a26 * b.c + (1.0 - a26) * e26
            val macdn = e12n - e26n
            val sign = a9 * macdn + (1.0 - a9) * sig
            val histn = macdn - sign
            val e13n = a13 * b.c + (1.0 - a13) * e13
            e12 = e12n; e26 = e26n; sig = sign; hist = histn; e13 = e13n
            val imp =
              if (e13n > pe13 && histn > phist) "green"
              else if (e13n < pe13 && histn < phist) "red"
              else "blue"
            Some((sym, imp))
          }
        }
      }
      .toDF("symbol", "impulse")
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_bars"),
        sum(when(col("impulse") === "green", 1L).otherwise(0L)).cast("long")
          .as("n_green"),
        sum(when(col("impulse") === "red", 1L).otherwise(0L)).cast("long")
          .as("n_red"),
        sum(when(col("impulse") === "blue", 1L).otherwise(0L)).cast("long")
          .as("n_blue"))
      .orderBy("symbol")
  }

  /** NEW r13: Williams fractal pivots (wing=2) — a bar is a fractal
    * high when its high STRICTLY exceeds the highs of the `wing` bars
    * on each side (low symmetrically); the classic swing-point marker
    * support/resistance and ZigZag-style studies anchor on. Pure
    * exact-decimal compares over the shared daily-bar scaffold; edge
    * bars (missing a neighbor → NULL compare) never qualify. Emission:
    * the pivot level as DOUBLE (2-dp decimals convert exactly), NULL
    * on the non-fractal side; bars that are neither are dropped.
    */
  def fractals(ticks: DataFrame, wing: Int = 2): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val t = ohlcDaily(ticks).select(col("symbol"), col("day"),
      col("high").cast(dec).as("h"), col("low").cast(dec).as("l"))
    val isH = (1 to wing).map { i =>
      col("h") > lag(col("h"), i).over(dayOrder) &&
        col("h") > lead(col("h"), i).over(dayOrder)
    }.reduce(_ && _)
    val isL = (1 to wing).map { i =>
      col("l") < lag(col("l"), i).over(dayOrder) &&
        col("l") < lead(col("l"), i).over(dayOrder)
    }.reduce(_ && _)
    t.select(col("symbol"), col("day"), col("h"), col("l"),
        coalesce(isH, lit(false)).as("fh"),
        coalesce(isL, lit(false)).as("fl"))
      .filter(col("fh") || col("fl"))
      .select(col("symbol"), col("day"),
        when(col("fh"), col("h").cast("double")).as("fractal_high"),
        when(col("fl"), col("l").cast("double")).as("fractal_low"))
      .orderBy("symbol", "day")
  }

  /** NEW r13: Relative Vigor Index (n=10) — RVI = Σₙ swma(c−o) /
    * Σₙ swma(h−l) with the 1-2-2-1 symmetric-weighted MA of Elders'
    * construction. Every term is an exact DECIMAL (integer weights on
    * 2-dp diffs), the window sums are order-free exact decimals, and
    * the emission is ONE guarded RAW double division (bounded sums →
    * exact double conversion). Defined where the swma lag-3 exists and
    * the n-bar window over those rows is full.
    */
  def rvi(ticks: DataFrame, n: Int = 10): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    def swma(c: Column): Column =
      c + lag(c, 1).over(dayOrder) * 2 + lag(c, 2).over(dayOrder) * 2 +
        lag(c, 3).over(dayOrder)
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        (col("close").cast(dec) - col("open").cast(dec)).as("co"),
        (col("high").cast(dec) - col("low").cast(dec)).as("hl"))
      .select(col("symbol"), col("day"),
        swma(col("co")).as("num"), swma(col("hl")).as("den"))
      .filter(col("num").isNotNull)
      .select(col("symbol"), col("day"),
        sum(col("num")).over(w).as("sn"),
        sum(col("den")).over(w).as("sd"),
        count(lit(1)).over(w).as("cnt"))
      .filter(col("cnt") === n)
      .select(col("symbol"), col("day"),
        when(col("sd") =!= 0,
          col("sn").cast("double") / col("sd").cast("double")).as("rvi"))
      .orderBy("symbol", "day")
  }

  /** NEW r13: Trend Intensity Index (n=20) — the share of the last n
    * closes sitting STRICTLY above today's n-bar close sum average.
    * The compare is float-free: cⱼ·n > Σc in exact integer cents (the
    * goldenCross sign trick), with the frame's closes carried as a
    * window collect_list (n elements — bounded) and counted by one
    * fold. tii = 100·up/n is an exact multiple of 100/n — emitted as
    * one mirrored division, no rounding needed.
    */
  def trendIntensity(ticks: DataFrame, n: Int = 20): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        (col("close").cast(dec) * 100).cast("long").as("cents"))
      .select(col("symbol"), col("day"),
        collect_list(col("cents")).over(w).as("cs"),
        sum(col("cents")).over(w).as("sc"),
        count(lit(1)).over(w).as("cnt"))
      .filter(col("cnt") === n)
      .select(col("symbol"), col("day"),
        aggregate(col("cs"), lit(0L),
          (acc, c) => acc + when(c * n > col("sc"), 1L).otherwise(0L))
          .as("up"))
      .select(col("symbol"), col("day"), col("up"),
        (col("up").cast("double") * 100.0 / lit(n.toDouble)).as("tii"))
      .orderBy("symbol", "day")
  }

  /** NEW r13: Donchian breakout census — per symbol, the count of days
    * whose close breaks STRICTLY above the prior n-day high (below the
    * prior n-day low), the event the channel exists to flag (donchian
    * itself emits the bands; this census reports how often price
    * escapes them). Prior-window extrema are exact decimal MAX/MIN
    * over a (−n … −1) frame, compares exact, counts integer.
    */
  def donchianBreakouts(ticks: DataFrame, n: Int = 20): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-n, -1)
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        col("high").cast(dec).as("h"), col("low").cast(dec).as("l"),
        col("close").cast(dec).as("c"))
      .select(col("symbol"), col("c"),
        max(col("h")).over(w).as("ph"),
        min(col("l")).over(w).as("pl"),
        count(lit(1)).over(w).as("cnt"))
      .filter(col("cnt") === n)
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("c") > col("ph"), 1L).otherwise(0L)).cast("long")
          .as("n_breakouts"),
        sum(when(col("c") < col("pl"), 1L).otherwise(0L)).cast("long")
          .as("n_breakdowns"))
      .orderBy("symbol")
  }

  final case class VzoIn(symbol: String, day: java.sql.Date, sv: Double, v: Double)
  final case class VzoOut(symbol: String, day: java.sql.Date, vzo: Double)

  /** NEW r13: Volume Zone Oscillator (n=14) — 100 · EMA(signed
    * volume) / EMA(volume): volume-flow polarity on the EMA clock.
    * Sign comes from the exact decimal close diff, daily volumes are
    * integers (exact doubles), and the two EMA recursions run as one
    * sorted-group pass in mirrored runtime-α doubles (the [[tsi]]
    * pattern, α = 2/(n+1)), seeded at the first signed bar; the oracle
    * is a recursive CTE over the same bars. Emission: one mirrored
    * 100·es/ev division (zero denominator → 0, mirrored). Defined from
    * the 2nd bar on.
    */
  def vzo(ticks: DataFrame, n: Int = 14): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"),
        col("volume").as("vol"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull)
      .select(col("symbol"), col("day"),
        when(col("c") > col("pc"), col("vol"))
          .when(col("c") < col("pc"), -col("vol"))
          .otherwise(lit(0L)).cast("double").as("sv"),
        col("vol").cast("double").as("v"))
      .as[VzoIn]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        val a = 2.0 / (n + 1).toDouble
        var es = 0.0; var ev = 0.0; var first = true
        it.map { b =>
          if (first) { first = false; es = b.sv; ev = b.v }
          else { es = a * b.sv + (1.0 - a) * es; ev = a * b.v + (1.0 - a) * ev }
          VzoOut(sym, b.day, if (ev != 0.0) 100.0 * es / ev else 0.0)
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  /** NEW r13: Connors RSI — the mean of three mean-reversion gauges:
    * (a) Cutler RSI(3) on closes (exact decimal gain/loss window sums,
    * one guarded division), (b) Cutler RSI(2) on the SIGNED up/down
    * streak (the streak is pure integer gaps-and-islands: run id =
    * drn − row_number within the same sign, streak = sign × position
    * in run — zero on flat days), and (c) the percent rank of today's
    * 1-day return among ALL the symbol's returns (rank() over the
    * bit-identical double return — a deterministic whole-tape variant
    * of Connors' trailing-100 percent rank; documented deviation).
    * crsi = ((rsi3 + srsi2) + pr) / 3 — a mirrored IEEE chain over
    * three bit-identical components, RAW. Defined from the 3rd diff
    * row on; any zero-denominator component NULLs the composite on
    * both engines.
    */
  def connorsRsi(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val zero = lit(0).cast(DecimalType(19, 2))
    val d = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull && col("pc") =!= 0)
      .select(col("symbol"), col("day"),
        (col("c") - col("pc")).as("diff"),
        (col("c").cast("double") / col("pc").cast("double") - 1.0).as("ret"),
        when(col("c") > col("pc"), 1).when(col("c") < col("pc"), -1)
          .otherwise(0).as("s"))
      .withColumn("drn", row_number().over(dayOrder).cast("long"))
    val run = d
      .withColumn("grp", col("drn") -
        row_number().over(Window.partitionBy(col("symbol"), col("s"))
          .orderBy("day")).cast("long"))
      .withColumn("streak", (col("s").cast("long") *
        row_number().over(Window.partitionBy(col("symbol"), col("s"), col("grp"))
          .orderBy("day")).cast("long")))
    val w3 = dayOrder.rowsBetween(-2, 0)
    val w2 = dayOrder.rowsBetween(-1, 0)
    val t = run
      .withColumn("sdiff", col("streak") - lag(col("streak"), 1).over(dayOrder))
      .withColumn("g3", sum(when(col("diff") > 0, col("diff")).otherwise(zero)).over(w3))
      .withColumn("l3", sum(when(col("diff") < 0, -col("diff")).otherwise(zero)).over(w3))
      .withColumn("g2", sum(when(col("sdiff") > 0, col("sdiff")).otherwise(lit(0L))).over(w2))
      .withColumn("l2", sum(when(col("sdiff") < 0, -col("sdiff")).otherwise(lit(0L))).over(w2))
      .withColumn("rk", rank().over(
        Window.partitionBy("symbol").orderBy("ret")).cast("long"))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("symbol")))
      .filter(col("drn") >= 3)
    t.select(col("symbol"), col("day"),
        when(col("g3") + col("l3") =!= 0,
          lit(100.0) * col("g3").cast("double") /
            (col("g3") + col("l3")).cast("double")).as("rsi3"),
        when(col("g2") + col("l2") =!= 0,
          lit(100.0) * col("g2").cast("double") /
            (col("g2") + col("l2")).cast("double")).as("srsi2"),
        when(col("cnt") > 1,
          lit(100.0) * (col("rk") - 1).cast("double") /
            (col("cnt") - 1).cast("double")).as("pct_rank"))
      .withColumn("crsi",
        (col("rsi3") + col("srsi2") + col("pct_rank")) / 3.0)
      .orderBy("symbol", "day")
  }

  /** NEW r13b: cross-sectional relative-strength rating — each day,
    * every symbol's trailing n-day return percentile-ranked AGAINST
    * THE OTHER SYMBOLS (the IBD-style RS rating; the one ranking axis
    * the per-symbol indicator family doesn't cover). The return is one
    * mirrored division of exact decimals (bit-identical doubles →
    * deterministic rank); the rank window partitions by DAY — bounded
    * by |symbols| rows per partition, calendar-many partitions. Days
    * where fewer than 2 symbols have a full lookback emit NULL.
    */
  def rsRating(ticks: DataFrame, n: Int = 20): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val r = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("cn", lag(col("c"), n).over(dayOrder))
      .filter(col("cn").isNotNull && col("cn") =!= 0)
      .select(col("symbol"), col("day"),
        (col("c").cast("double") / col("cn").cast("double") - 1.0).as("ret"))
    r.select(col("symbol"), col("day"), col("ret"),
        rank().over(Window.partitionBy("day").orderBy("ret")).cast("long")
          .as("rk"),
        count(lit(1)).over(Window.partitionBy("day")).as("cnt"))
      .select(col("symbol"), col("day"), col("ret"),
        when(col("cnt") > 1,
          lit(100.0) * (col("rk") - 1).cast("double") /
            (col("cnt") - 1).cast("double")).as("rs_rating"))
      .orderBy("symbol", "day")
  }

  /** NEW r13b: Choppiness Index (n=14) — 100·ln(ΣTR/(maxH−minL))/ln n:
    * range-efficiency gauge separating trending tapes (low CI) from
    * sideways chop (high CI). True ranges take the CAST(GREATEST(…)
    * AS DECIMAL) guard (§4 r10 — DuckDB greatest over decimals
    * promotes to DOUBLE, silently floating the window sum), window
    * extrema are exact decimals, the ΣTR/range quotient is ONE
    * mirrored division, and the ln is quant6'd per the §4 libm rule
    * before the mirrored 100·y/ln(14) literal chain. Degenerate
    * zero-range / zero-TR windows emit NULL via mirrored guards.
    */
  def choppiness(ticks: DataFrame, n: Int = 14): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        col("high").cast(dec).as("h"), col("low").cast(dec).as("l"),
        col("close").cast(dec).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull)
      .withColumn("tr", greatest(col("h") - col("l"),
        abs(col("h") - col("pc")), abs(col("l") - col("pc"))).cast(dec))
      .select(col("symbol"), col("day"),
        sum(col("tr")).over(w).as("str"),
        max(col("h")).over(w).as("mxh"),
        min(col("l")).over(w).as("mnl"),
        count(lit(1)).over(w).as("cnt"))
      .filter(col("cnt") === n)
      .select(col("symbol"), col("day"),
        when(col("mxh") - col("mnl") > 0 && col("str") > 0,
          lit(100.0) * quant6(log(col("str").cast("double") /
            (col("mxh") - col("mnl")).cast("double")) * 1000000.0)
            .cast("double") /
            lit(2.6390573296152584)).as("ci"))
      .orderBy("symbol", "day")
  }

  /** NEW r13b: TTM squeeze census — per symbol, the count of days the
    * Bollinger(20, 2) band sits strictly INSIDE the Keltner(20, 1.5)
    * channel (SMA flavor): the volatility-compression setup traders
    * watch for expansion. All four band values are mirrored IEEE
    * chains over exact decimal window sums (sqrt is correctly
    * rounded → bit-identical doubles), so the squeeze boolean is
    * engine-deterministic and the census is pure integer counts. The
    * Keltner midline divides ONCE by the evaluated 3n literal (60.0)
    * — the keltner() discipline.
    */
  def squeeze(ticks: DataFrame, n: Int = 20): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    val sqDec = DecimalType(38, 4)
    val agg = ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        col("high").cast(dec).as("h"), col("low").cast(dec).as("l"),
        col("close").cast(dec).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull)
      .withColumn("tr", greatest(col("h") - col("l"),
        abs(col("h") - col("pc")), abs(col("l") - col("pc"))).cast(dec))
      .withColumn("tp",
        (col("h") + col("l") + col("c")).cast(DecimalType(20, 2)))
      .withColumn("c2", (col("c") * col("c")).cast(sqDec))
      .select(col("symbol"), col("day"),
        sum(col("c")).over(w).as("scl"),
        sum(col("c2")).over(w).as("sq"),
        sum(col("tp")).over(w).as("stp"),
        sum(col("tr")).over(w).as("str"),
        count(lit(1)).over(w).as("cnt"))
      .filter(col("cnt") === n)
    val nD = lit(n.toDouble)
    val s = col("scl").cast("double")
    val sq = col("sq").cast("double")
    val mean = s / nD
    val varRaw = (sq - (s * s) / nD) / (nD - lit(1.0))
    val sd = sqrt(when(varRaw > 0, varRaw).otherwise(lit(0.0)))
    val mid = col("stp").cast("double") / lit(3.0 * n)
    val rng = col("str").cast("double") / nD
    val on = (mean - lit(2.0) * sd) > (mid - lit(1.5) * rng) &&
      (mean + lit(2.0) * sd) < (mid + lit(1.5) * rng)
    agg.select(col("symbol"), on.as("on"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("on"), 1L).otherwise(0L)).cast("long").as("n_squeeze"))
      .orderBy("symbol")
  }

  /** NEW r13b: Stochastic RSI (n=14 both stages) — the %K oscillator
    * applied to the daily Cutler RSI series: (rsi − minₙ rsi) /
    * (maxₙ rsi − minₙ rsi) · 100. The inner RSI is the exact-decimal
    * gain/loss window quotient (bit-identical doubles), so the outer
    * MIN/MAX are order-free and the emission is a mirrored
    * subtract/divide chain; a flat RSI window (max = min) emits NULL
    * on both engines. Daily frames only — bounded O(n)/row.
    */
  def stochRsi(ticks: DataFrame, n: Int = 14): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    val zero = lit(0).cast(DecimalType(19, 2))
    val r = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull)
      .withColumn("gain",
        when(col("c") > col("pc"), col("c") - col("pc")).otherwise(zero))
      .withColumn("loss",
        when(col("c") < col("pc"), col("pc") - col("c")).otherwise(zero))
      .select(col("symbol"), col("day"),
        sum(col("gain")).over(w).as("g"),
        sum(col("loss")).over(w).as("l"),
        count(lit(1)).over(w).as("cnt"))
      .filter(col("cnt") === n)
      .select(col("symbol"), col("day"),
        when(col("g") + col("l") =!= 0,
          lit(100.0) * col("g").cast("double") /
            (col("g") + col("l")).cast("double")).as("rsi"))
    r.select(col("symbol"), col("day"), col("rsi"),
        min(col("rsi")).over(w).as("mn"),
        max(col("rsi")).over(w).as("mx"),
        count(lit(1)).over(w).as("cnt2"))
      .filter(col("cnt2") === n)
      .select(col("symbol"), col("day"), col("rsi"),
        when(col("rsi").isNotNull && col("mx") > col("mn"),
          lit(100.0) * (col("rsi") - col("mn")) / (col("mx") - col("mn")))
          .as("stoch_rsi"))
      .orderBy("symbol", "day")
  }

  /** NEW r13: Hurst exponent via the aggregated-variance method — the
    * long-memory / mean-reversion gauge: sample variances of
    * non-overlapping m-day SUMS of winsorized quant6 log returns at
    * m ∈ {1, 2, 4}; for a self-affine process Var(m-sum) ∝ m^(2H), so
    * the slope β of ln Var vs ln m gives H = β/2 (random walk:
    * Var(m) = m·σ² → H = 0.5). With ln m evenly spaced (0, ln2,
    * 2·ln2) the 3-point OLS slope REDUCES to the endpoint quotient
    * (y₄ − y₁) / (2·ln2), so H = (y₄ − y₁) / (4·ln2) with the 4·ln2
    * double literal mirrored on both engines.
    *
    * Parity posture: returns are quant6(ln(c/pc)) micro-BIGINTs
    * winsorized to ±1e6 (|ln r| ≤ 1 — bounds every downstream integer
    * width on adversarial tapes); block sums / squares are pure
    * integers; variance numerators n·Σx² − (Σx)² live in width-safe
    * DECIMALs ((8,0)×(28,0) and (15,0)² both ≤ 38 on both engines);
    * each variance is two mirrored divisions of exact values; the ln
    * of a variance is quant6'd (the §4 libm rule — never RAW through
    * ln). Degenerate tapes (constant returns → zero variance, < 2
    * blocks) emit NULL via mirrored guards.
    */
  def hurst(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val lnret = log(col("c").cast("double") / col("pc").cast("double")) * 1000000.0
    val qMicro = when(lnret >= 0, floor(lnret + 0.5))
      .otherwise(ceil(lnret - 0.5)).cast("long")
    val rets = ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .filter(col("c") > 0)
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .filter(col("pc").isNotNull && col("pc") > 0)
      .select(col("symbol"), col("day"),
        least(greatest(qMicro, lit(-1000000L)), lit(1000000L)).as("r"))
      .withColumn("idx", row_number().over(dayOrder).cast("long") - 1)
    val blocks = rets
      .select(col("symbol"), col("r"), col("idx"),
        explode(typedLit(Seq(1L, 2L, 4L))).as("m"))
      .groupBy(col("symbol"), col("m"), expr("idx div m").as("blk"))
      .agg(sum(col("r")).as("x"), count(lit(1)).as("k"))
      .filter(col("k") === col("m"))
    val stats = blocks.groupBy(col("symbol"), col("m"))
      .agg(count(lit(1)).as("nb"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      .filter(col("nb") >= 2)
      .select(col("symbol"), col("m"), col("nb"),
        (col("nb").cast(DecimalType(8, 0)) * col("sxx").cast(DecimalType(28, 0)) -
          col("sx").cast(DecimalType(15, 0)) * col("sx").cast(DecimalType(15, 0)))
          .as("num"))
      .select(col("symbol"), col("m"),
        when(col("num") > 0,
          col("num").cast("double") /
            (col("nb") * (col("nb") - 1)).cast("double") /
            lit(1000000000000.0)).as("v"))
    val piv = stats.groupBy(col("symbol"))
      .agg(max(when(col("m") === 1, col("v"))).as("var_m1"),
        max(when(col("m") === 2, col("v"))).as("var_m2"),
        max(when(col("m") === 4, col("v"))).as("var_m4"))
    piv.select(col("symbol"), col("var_m1"), col("var_m2"), col("var_m4"),
        when(col("var_m1") > 0 && col("var_m4") > 0,
          (quant6(log(col("var_m4")) * 1000000.0).cast("double") -
            quant6(log(col("var_m1")) * 1000000.0).cast("double")) /
            lit(2.772588722239781)).as("hurst"))
      .orderBy("symbol")
  }

  /** NEW r14: Qstick — the n-day average of (close − open), Chande's
    * candle-body momentum gauge (persistently positive bodies = buying
    * pressure regardless of wicks). Exact decimal window sum over full
    * windows, one RAW double division by the literal n.
    */
  def qstick(ticks: DataFrame, n: Int = 8): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        (col("close").cast(dec) - col("open").cast(dec)).as("body"))
      .withColumn("s", sum(col("body")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("cnt") === n)
      .select(col("symbol"), col("day"),
        (col("s").cast("double") / n.toDouble).as(s"qstick$n"))
      .orderBy("symbol", "day")
  }

  /** NEW r14: Ehlers' Center of Gravity oscillator —
    * −Σ_{i=0..n−1}(i+1)·c_{t−i} / Σ c_{t−i} (i = 0 most recent), the
    * zero-lag cycle indicator. Cents-scale lag chain (the hullMa
    * scaffold): both the weighted and the plain sums are exact
    * DECIMAL(38,0) over long cents — the cents cancel in the ratio —
    * and the emission is ONE RAW division (denominator > 0 gate
    * mirrored). Full windows only.
    */
  def cog(ticks: DataFrame, n: Int = 10): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val big = DecimalType(38, 0)
    def at(i: Int): Column =
      (if (i == 0) col("cents") else lag(col("cents"), i).over(dayOrder)).cast(big)
    val num = (0 until n).map(i => at(i) * lit((i + 1).toLong)).reduce(_ + _)
    val den = (0 until n).map(at).reduce(_ + _)
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        (col("close").cast(dec) * 100).cast("long").as("cents"))
      .withColumn("ok", lag(col("cents"), n - 1).over(dayOrder).isNotNull)
      .withColumn("num", num)
      .withColumn("den", den)
      .filter(col("ok") && col("den") > 0)
      .select(col("symbol"), col("day"),
        (-col("num").cast("double") / col("den").cast("double")).as("cog"))
      .orderBy("symbol", "day")
  }

  /** NEW r14: moving-average envelope — the n-day close SMA with
    * ±pct% bands (the channel a mean-reversion screen checks before
    * Bollinger's adaptive widths). The SMA is an exact long cents sum
    * through one division; the bands are single mirrored literal
    * multiplications — RAW doubles throughout.
    */
  def envelope(ticks: DataFrame, n: Int = 20): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        (col("close").cast(dec) * 100).cast("long").as("cents"))
      .withColumn("s", sum(col("cents")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("cnt") === n)
      .withColumn("sma", col("s").cast("double") / lit(n * 100.0))
      .select(col("symbol"), col("day"), col("sma").as(s"sma$n"),
        (col("sma") * 1.025).as("upper"),
        (col("sma") * 0.975).as("lower"))
      .orderBy("symbol", "day")
  }

  /** NEW r14: Intraday Momentum Index — RSI arithmetic applied to the
    * open→close body instead of close-to-close changes: 100·Σgains /
    * (Σgains + Σlosses) over n bars. Exact decimal CASE sums over full
    * windows; one mirrored double chain; all-doji windows (zero total
    * body movement) emit NULL on both engines.
    */
  def imi(ticks: DataFrame, n: Int = 14): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    val zero = lit(0).cast(dec)
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        col("open").cast(dec).as("o"), col("close").cast(dec).as("c"))
      .withColumn("up", when(col("c") > col("o"), col("c") - col("o")).otherwise(zero))
      .withColumn("dn", when(col("o") > col("c"), col("o") - col("c")).otherwise(zero))
      .withColumn("su", sum(col("up")).over(w))
      .withColumn("sd", sum(col("dn")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("cnt") === n)
      .select(col("symbol"), col("day"),
        when(col("su") + col("sd") > 0,
          lit(100.0) * col("su").cast("double") /
            (col("su") + col("sd")).cast("double")).as(s"imi$n"))
      .orderBy("symbol", "day")
  }

  /** NEW r14: psychological line (PSY) — the percentage of up closes
    * in the last n bars, the sentiment-saturation gauge (readings near
    * 100 mean everyone is already long). Exact decimal comparisons
    * into integer counts; one RAW division by the literal n.
    */
  def psy(ticks: DataFrame, n: Int = 12): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("pc", lag(col("c"), 1).over(dayOrder))
      .withColumn("up", when(col("pc").isNotNull && col("c") > col("pc"), 1L)
        .otherwise(0L))
      // require n PRIOR-close comparisons, not just n rows: the first
      // bar of a symbol has no pc and must not count as a down day
      .withColumn("have", sum(when(col("pc").isNotNull, 1L).otherwise(0L)).over(w))
      .withColumn("nup", sum(col("up")).over(w))
      .filter(col("have") === n)
      .select(col("symbol"), col("day"), col("nup").as("up_days"),
        (lit(100.0) * col("nup").cast("double") / n.toDouble).as(s"psy$n"))
      .orderBy("symbol", "day")
  }

  /** NEW r14: disparity index — 100·(close − SMA_n)/SMA_n, the
    * percent deviation from trend (Kairi-class mean-reversion input).
    * Cents-scale identity 100·(n·c − Σc)/Σc keeps every operand an
    * exact integer (the cents cancel); ONE RAW division.
    */
  def disparity(ticks: DataFrame, n: Int = 20): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        (col("close").cast(dec) * 100).cast("long").as("cents"))
      .withColumn("s", sum(col("cents")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("cnt") === n && col("s") > 0)
      .select(col("symbol"), col("day"),
        (lit(100.0) * (col("cents") * n - col("s")).cast("double") /
          col("s").cast("double")).as(s"disparity$n"))
      .orderBy("symbol", "day")
  }

  /** ALMA weights (window 9, offset 0.85, sigma 6): gaussian weights
    * peaked at m = offset·(n−1), computed ONCE driver-side and inlined
    * as literals on BOTH engines — the exp() never runs per-row on
    * either side, so the §4 libm rule is moot. Exposed so the oracle
    * SQL is generated from the SAME constants.
    */
  val almaN = 9
  val almaWeights: IndexedSeq[Double] = {
    val m = 0.85 * (almaN - 1)
    val s = almaN / 6.0
    (0 until almaN).map(j => math.exp(-(j - m) * (j - m) / (2 * s * s)))
  }

  /** NEW r14: Arnaud Legoux moving average — the gaussian-weighted MA
    * that trades lag for smoothness with an offset-shifted kernel.
    * alma_t = Σ_j w_j·p_{t−(n−1−j)} / Σ_j w_j with the [[almaWeights]]
    * literals; the weighted sum is an explicit j = 0..n−1 lag chain
    * (fixed evaluation order, mirrored term-by-term in the oracle) over
    * exactly-converting cents, then two mirrored literal divisions.
    * Full windows only.
    */
  def alma(ticks: DataFrame): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val n = almaN
    def at(i: Int): Column =
      (if (i == 0) col("cents") else lag(col("cents"), i).over(dayOrder))
        .cast("double")
    // j indexes oldest → newest; price at lag n−1−j
    val num = (0 until n).map(j => lit(almaWeights(j)) * at(n - 1 - j))
      .reduce(_ + _)
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        (col("close").cast(dec) * 100).cast("long").as("cents"))
      .withColumn("ok", lag(col("cents"), n - 1).over(dayOrder).isNotNull)
      .withColumn("num", num)
      .filter(col("ok"))
      .select(col("symbol"), col("day"),
        (col("num") / lit(almaWeights.sum) / 100.0).as("alma9"))
      .orderBy("symbol", "day")
  }

  final case class MgBar(symbol: String, day: java.sql.Date, c: java.math.BigDecimal)
  final case class MgOut(symbol: String, day: java.sql.Date, mcginley: Double)

  /** NEW r14: McGinley Dynamic (n=20) — the self-adjusting MA that
    * speeds up in declines and hugs price through whipsaws:
    * MD += (p − MD) / (0.6·n·(p/MD)⁴), seeded at the first close.
    * Genuinely recursive — one sorted-group pass over daily bar states
    * (the nviPvi posture). The quartic is TWO explicit squarings
    * (never pow — §4's libm rule; x·x is a plain IEEE multiply), the
    * 0.6·n constant is computed ONCE driver-side and mirrored into
    * the oracle via CAST('…' AS DOUBLE), and every step is a plain
    * mirrored double chain — bit-identical through the recursion (the
    * demaTema class). Non-positive closes are filtered on both
    * engines (the p/MD quartic needs a positive tape).
    */
  def mcginley(ticks: DataFrame, n: Int = 20): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    val k = 0.6 * n
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .filter(col("c") > 0)
      .as[MgBar]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        var md = 0.0
        var first = true
        it.map { b =>
          val p = b.c.doubleValue()
          if (first) { first = false; md = p }
          else {
            val r = p / md
            val r2 = r * r
            val d = k * (r2 * r2)
            // (p/MD)⁴ UNDERFLOWS to exactly 0 when the tape swings
            // >~150× in one bar (adversarial synthetic series):
            // Scala's x/0.0 is ±Inf while DuckDB's is NULL — the one
            // place the mirrored chain can split. The mirrored rule:
            // a zero denominator RESETS the state to the price (the
            // same re-seed the first bar uses).
            md = if (d > 0) md + (p - md) / d else p
          }
          MgOut(sym, b.day, md)
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  final case class FiBar(symbol: String, day: java.sql.Date, x: Double)
  final case class FiOut(symbol: String, day: java.sql.Date,
      fisher: Double, trigger: Double)

  /** NEW r14: Ehlers' Fisher Transform (n=10) — maps the price's
    * position inside its n-bar range onto a near-Gaussian scale so
    * turning points show as sharp crossings: x = 2·(c−lo)/(hi−lo)−1,
    * v = 0.33·x + 0.67·v₋₁ (clamped ±0.999),
    * fisher = 0.5·ln((1+v)/(1−v)) + 0.5·fisher₋₁, trigger = fisher₋₁.
    *
    * Engine parity through a recursion WITH ln in the loop: the v
    * recursion is plain mirrored IEEE ops (bit-identical inputs to
    * ln); each ln TERM is 6-dp quantized via the shared FLOOR/CEIL
    * float sequence before it enters the f state (§4 libm rule — a
    * raw 1-ulp ln divergence would otherwise feed back), and the f
    * recursion multiplies by 0.5 — an EXACT binary scaling — so f is
    * a sum of exactly-halved quantized terms: bit-identical on both
    * engines. Window extrema are exact decimals; flat windows emit
    * x = 0 (mirrored guard); full windows only.
    */
  def fisher(ticks: DataFrame, n: Int = 10): DataFrame = {
    val spark0 = ticks.sparkSession
    import spark0.implicits._
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    val xCol = when(col("hh") > col("ll"),
      lit(2.0) * (col("c") - col("ll")).cast("double") /
        (col("hh") - col("ll")).cast("double") - lit(1.0))
      .otherwise(lit(0.0))
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("hh", max(col("c")).over(w))
      .withColumn("ll", min(col("c")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("cnt") === n)
      .select(col("symbol"), col("day"), xCol.as("x"))
      .as[FiBar]
      .groupByKey(_.symbol)
      .flatMapSortedGroups(col("day")) { (sym, it) =>
        var v = 0.0
        var f = 0.0
        it.map { b =>
          v = 0.33 * b.x + 0.67 * v
          val vc = if (v > 0.999) 0.999 else if (v < -0.999) -0.999 else v
          val raw = 0.5 * math.log((1.0 + vc) / (1.0 - vc)) * 1000000.0
          val q = if (raw >= 0) math.floor(raw + 0.5) else math.ceil(raw - 0.5)
          val trig = f
          f = q / 1000000.0 + 0.5 * f
          FiOut(sym, b.day, f, trig)
        }
      }
      .toDF()
      .orderBy("symbol", "day")
  }

  /** NEW r14: historical VaR / CVaR — the trailing-n 90% value-at-risk
    * (the k-th worst daily return, k = n/10) and its expected
    * shortfall (mean of the k worst), the banks-and-desks risk pair
    * next to the volatility family. EXACT order statistics: the
    * trailing returns are the shared quant6 decimals, each full
    * window's k worst come from one sort_array over a BOUNDED n-bar
    * frame (bar rows only — the documented bar-window posture), VaR
    * emits the exact decimal as DOUBLE and CVaR divides the exact
    * k-sum by the literal k. No percentile interpolation anywhere —
    * both engines pick the same elements.
    */
  def varCvar(ticks: DataFrame, n: Int = 20): DataFrame = {
    val k = n / 10
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    val sorted = sort_array(col("rets"))
    // explicit k-term chain (k is tiny by construction) — exact
    // decimal adds, mirrored term-for-term in the oracle
    val worstSum = (1 to k).map(i => element_at(sorted, i)).reduce(_ + _)
    dailyRet6(ticks)
      .select(col("symbol"), col("day"), col("r").as("ret"))
      .withColumn("rets", collect_list(col("ret")).over(w))
      .filter(size(col("rets")) === n)
      .select(col("symbol"), col("day"),
        element_at(sorted, k).cast("double").as("var90"),
        (worstSum.cast("double") / k.toDouble).as("cvar90"))
      .orderBy("symbol", "day")
  }

  /** NEW r14: new-highs / new-lows census — per trading day across
    * ALL symbols: how many closed at a fresh n-day high, how many at
    * a fresh n-day low, and the net (the NH-NL breadth line beside
    * [[breadth]]'s advance/decline counts). Exact decimal compares
    * over full bar windows; per-day counter rows only (metadata scale
    * at any corpus size).
    */
  def highLowCensus(ticks: DataFrame, n: Int = 20): DataFrame = {
    val dayOrder = Window.partitionBy("symbol").orderBy("day")
    val w = dayOrder.rowsBetween(-(n - 1), 0)
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"), col("close").cast(dec).as("c"))
      .withColumn("hh", max(col("c")).over(w))
      .withColumn("ll", min(col("c")).over(w))
      .withColumn("cnt", count(lit(1)).over(w))
      .filter(col("cnt") === n)
      .groupBy(col("day"))
      .agg(sum(when(col("c") === col("hh"), 1L).otherwise(0L)).as("new_highs"),
        sum(when(col("c") === col("ll"), 1L).otherwise(0L)).as("new_lows"))
      .select(col("day"), col("new_highs"), col("new_lows"),
        (col("new_highs") - col("new_lows")).as("nh_nl"))
      .orderBy("day")
  }

  /** NEW r14: Camarilla pivot levels — the tighter intraday
    * reversal/breakout ladder beside the floor pivots (9e): levels at
    * prior close ± prior range·1.1/{2,4}. Exact decimal prior-day
    * range through mirrored literal chains — RAW doubles.
    */
  def camarilla(ticks: DataFrame): DataFrame = {
    val w = Window.partitionBy("symbol").orderBy("day")
    ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        col("high").cast(dec).as("h"), col("low").cast(dec).as("l"),
        col("close").cast(dec).as("c"))
      .withColumn("pr", (lag(col("h"), 1).over(w) - lag(col("l"), 1).over(w))
        .cast("double"))
      .withColumn("pc", lag(col("c"), 1).over(w).cast("double"))
      .filter(col("pr").isNotNull)
      .select(col("symbol"), col("day"),
        (col("pc") + col("pr") * 1.1 / 2.0).as("r4"),
        (col("pc") + col("pr") * 1.1 / 4.0).as("r3"),
        (col("pc") - col("pr") * 1.1 / 4.0).as("s3"),
        (col("pc") - col("pr") * 1.1 / 2.0).as("s4"))
      .orderBy("symbol", "day")
  }
}
