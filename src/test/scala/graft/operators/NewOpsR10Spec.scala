package graft.operators

import java.math.{BigDecimal => JBD}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Semantic contracts of the r10 daily-bar indicator batch (Aroon,
  * Vortex, CMO, Keltner, A/D line, EOM, force index) against
  * driver-side recomputations over the collected sf0.001 bars.
  */
class NewOpsR10Spec extends AnyFunSuite {
  import TestSpark._

  // (day, high, low, close, volume) per symbol, day-ordered
  private lazy val bars: Map[String, Vector[(String, JBD, JBD, JBD, Long)]] =
    MarketOps.ohlcDaily(Tables.ticks(spark, sf))
      .select(col("symbol"), col("day").cast("string"),
        col("high").cast("decimal(18,2)"), col("low").cast("decimal(18,2)"),
        col("close").cast("decimal(18,2)"), col("volume"))
      .collect()
      .map(r => (r.getString(0),
        (r.getString(1), r.getDecimal(2), r.getDecimal(3), r.getDecimal(4),
          r.getLong(5))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toVector)
      .toMap.map(identity)

  test("r10 tick family survives the adversarial edge tape (ANSI ÷0 / degenerate shapes)") {
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // single-tick symbol, flat tape (h=l), zero volume, zero/negative
    // prices, duplicate (symbol, ts) — the ÷0-guard fixture classes
    val edge = Seq(
      (1L, "A", ts("2024-01-05 10:00:00"), 10.0, 5L),
      (2L, "B", ts("2024-01-01 10:00:00"), 2.0, 0L),
      (3L, "B", ts("2024-01-01 10:01:00"), 2.0, 0L),
      (4L, "B", ts("2024-01-02 10:00:00"), 2.0, 1L),
      (5L, "C", ts("2024-02-01 01:00:00"), 0.0, 3L),
      (6L, "C", ts("2024-02-01 01:00:00"), -1.5, 4L),
      (7L, "C", ts("2024-02-02 01:00:00"), 0.0, 5L)
    ).toDF("event_id", "symbol", "ts", "price", "volume")
    val fams = Seq[org.apache.spark.sql.DataFrame](
      MarketOps.aroon(edge, 14), MarketOps.vortex(edge, 14),
      MarketOps.cmo(edge, 14), MarketOps.keltner(edge, 20),
      MarketOps.adLine(edge), MarketOps.easeOfMovement(edge, 14),
      MarketOps.forceIndex(edge, 13), MarketOps.tickSizeEstimate(edge),
      MarketOps.priceClustering(edge), MarketOps.burstCensus(edge),
      MarketOps.benfordVolumes(edge), EventAnalytics.sessionStats(edge, 30),
      MarketOps.adxDaily(edge), MarketOps.trixDaily(edge),
      MarketOps.elderRay(edge), MarketOps.massIndex(edge, 25),
      MarketOps.parabolicSar(edge), MarketOps.chandelierExit(edge, 22),
      MarketOps.riskRatios(edge), MarketOps.superTrend(edge),
      MarketOps.coppock(edge), MarketOps.interArrival(edge))
    fams.foreach(df => df.collect()) // must not throw (ANSI ÷0, nulls)
    // flat tape: A/D and EOM degenerate bars contribute zero, not NULL/throw
    val ad = MarketOps.adLine(edge).filter(col("symbol") === "B").collect()
    assert(ad.forall(_.getDouble(2) === 0.0))
  }

  test("aroon picks the true extremum on negative-price tapes (r11 key-bias fix)") {
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // two same-digit-width negative prices: the UNBIASED lpad key
    // ordered lpad('-50') > lpad('-40'), flipping the frame argmax
    val tape = Seq(
      (1L, "D", ts("2024-03-01 10:00:00"), -0.40, 1L),
      (2L, "D", ts("2024-03-02 10:00:00"), -0.50, 1L)
    ).toDF("event_id", "symbol", "ts", "price", "volume")
    val rows = MarketOps.aroon(tape, 14).collect()
      .map(r => r.getDate(1).toString -> (r.getDouble(2), r.getDouble(3))).toMap
    // day 2: high extreme is -0.40 one bar back, low extreme is the
    // fresh -0.50 → up = 100·13/14, down = 100
    assert(rows("2024-03-02")._1 === 100.0 * 13.0 / 14.0, "aroon_up")
    assert(rows("2024-03-02")._2 === 100.0, "aroon_down")
  }

  test("aroon: 0 on a fresh n-day extreme, values on the 100/n grid") {
    val got = MarketOps.aroon(Tables.ticks(spark, sf), 14).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.nonEmpty)
    val n = 14
    for ((sym, bs) <- bars) {
      bs.zipWithIndex.foreach { case ((d, h, l, _, _), i) =>
        val frame = bs.slice(math.max(0, i - (n - 1)), i + 1)
        // most recent max high / min low in the frame (ties → latest)
        val sinceHigh = frame.size - 1 -
          frame.lastIndexWhere(_._2.compareTo(frame.map(_._2).max) == 0)
        val sinceLow = frame.size - 1 -
          frame.lastIndexWhere(_._3.compareTo(frame.map(_._3).min) == 0)
        val (up, down) = got((sym, d))
        assert(up === 100.0 * (n - sinceHigh) / n, s"$sym $d aroon_up")
        assert(down === 100.0 * (n - sinceLow) / n, s"$sym $d aroon_down")
      }
    }
  }

  test("vortex: vi_plus/vi_minus match a sequential recompute") {
    val got = MarketOps.vortex(Tables.ticks(spark, sf), 14).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.nonEmpty)
    for ((sym, bs) <- bars) {
      val rows = bs.zip(bs.drop(1)).map { case ((_, ph, pl, pc, _), (d, h, l, _, _)) =>
        val vmp = h.subtract(pl).abs
        val vmm = l.subtract(ph).abs
        val tr = Seq(h.subtract(l), h.subtract(pc).abs, l.subtract(pc).abs).max
        (d, vmp, vmm, tr)
      }
      rows.zipWithIndex.foreach { case ((d, _, _, _), i) =>
        val fr = rows.slice(math.max(0, i - 13), i + 1)
        val svp = fr.map(_._2).reduce(_.add(_))
        val svm = fr.map(_._3).reduce(_.add(_))
        val str = fr.map(_._4).reduce(_.add(_))
        val (vp, vm) = got((sym, d))
        if (str.signum() != 0) {
          assert(vp === svp.doubleValue() / str.doubleValue(), s"$sym $d vi+")
          assert(vm === svm.doubleValue() / str.doubleValue(), s"$sym $d vi-")
        }
      }
    }
  }

  test("cmo: bounded in [-100, 100] and matches the gain/loss recompute") {
    val got = MarketOps.cmo(Tables.ticks(spark, sf), 14).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got.nonEmpty)
    assert(got.values.flatten.forall(v => v >= -100.0 && v <= 100.0))
    for ((sym, bs) <- bars) {
      val deltas = bs.zip(bs.drop(1)).map { case ((_, _, _, pc, _), (d, _, _, c, _)) =>
        (d, c.subtract(pc))
      }
      deltas.zipWithIndex.foreach { case ((d, _), i) =>
        val fr = deltas.slice(math.max(0, i - 13), i + 1)
        val g = fr.map(_._2).filter(_.signum() > 0).foldLeft(JBD.ZERO)(_.add(_))
        val l = fr.map(_._2).filter(_.signum() < 0)
          .foldLeft(JBD.ZERO)((a, x) => a.add(x.negate))
        val want = if (g.add(l).signum() == 0) None
          else Some(100.0 * g.subtract(l).doubleValue() / g.add(l).doubleValue())
        assert(got((sym, d)) === want, s"$sym $d cmo")
      }
    }
  }

  test("keltner: lower ≤ mid ≤ upper and band width is 4×mean-TR") {
    val k = MarketOps.keltner(Tables.ticks(spark, sf), 20).cache()
    assert(k.count() > 0)
    assert(k.filter(col("lower_band") > col("mid") ||
      col("mid") > col("upper_band")).count() === 0)
    // upper − lower = 4 × rng ≥ 0, and mid is the midpoint exactly
    val bad = k.filter(
      abs(col("upper_band") + col("lower_band") - lit(2.0) * col("mid"))
        > lit(1e-9)).count()
    assert(bad === 0)
    k.unpersist()
  }

  test("ad_line: running sum reconstructs from per-day quantized CLV increments") {
    val got = MarketOps.adLine(Tables.ticks(spark, sf)).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString), r.getDouble(2))).toMap
    assert(got.nonEmpty)
    for ((sym, bs) <- bars) {
      var run = JBD.ZERO
      for ((d, h, l, c, vol) <- bs) {
        val den = h.subtract(l)
        val clv6 =
          if (den.signum() == 0) JBD.ZERO
          else {
            val num = c.multiply(new JBD(2)).subtract(h).subtract(l)
            val s = num.doubleValue() / den.doubleValue() * 1000000.0
            val q = if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)
            new JBD(q.toLong).movePointLeft(6)
          }
        run = run.add(clv6.multiply(new JBD(vol)))
        assert(got((sym, d)) === run.doubleValue(), s"$sym $d ad_line")
      }
    }
  }

  test("force index: fi = Δclose·vol exactly; sma window mean matches") {
    val got = MarketOps.forceIndex(Tables.ticks(spark, sf), 13).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.nonEmpty)
    for ((sym, bs) <- bars) {
      val fis = bs.zip(bs.drop(1)).map { case ((_, _, _, pc, _), (d, _, _, c, vol)) =>
        (d, c.subtract(pc).multiply(new JBD(vol)))
      }
      fis.zipWithIndex.foreach { case ((d, fi), i) =>
        val fr = fis.slice(math.max(0, i - 12), i + 1)
        val (gfi, gsma) = got((sym, d))
        assert(gfi === fi.doubleValue(), s"$sym $d fi")
        val s = fr.map(_._2).reduce(_.add(_))
        assert(gsma === s.doubleValue() / fr.size, s"$sym $d fi_sma")
      }
    }
  }

  // (symbol, ts_us, event_id, cents, volume) in (ts, event_id) order
  private lazy val tickRows: Map[String, Vector[(Long, Long, Long, Long)]] =
    Tables.ticks(spark, sf)
      .select(col("symbol"), unix_micros(col("ts")).as("us"), col("event_id"),
        (col("price").cast("decimal(18,2)") * 100).cast("long").as("cents"),
        col("volume"))
      .collect()
      .map(r => (r.getString(0),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(t => (t._1, t._2)).toVector)
      .toMap.map(identity)

  test("tickSizeEstimate: graft_gcd equals a driver-side fold over cent diffs") {
    val got = MarketOps.tickSizeEstimate(Tables.ticks(spark, sf)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.nonEmpty)
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    for ((sym, rows) <- tickRows) {
      val diffs = rows.zip(rows.drop(1))
        .map { case ((_, _, c1, _), (_, _, c2, _)) => math.abs(c2 - c1) }
        .filter(_ > 0)
      if (diffs.nonEmpty)
        assert(got(sym) === ((diffs.foldLeft(0L)(gcd), diffs.size.toLong)),
          s"symbol $sym")
    }
  }

  test("priceClustering: modular shares match a recompute and nest correctly") {
    val got = MarketOps.priceClustering(Tables.ticks(spark, sf)).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5)))).toMap
    for ((sym, rows) <- tickRows) {
      val n = rows.size.toLong
      def share(m: Long) = rows.count(_._3 % m == 0).toDouble / n
      assert(got(sym) === ((n, share(100), share(50), share(25), share(10))),
        s"symbol $sym")
      // integer prints ⊆ half ⊆ quarter-or-half... (100 | 50 | 25·2, 10·5)
      val (_, i, h, _, d) = got(sym)
      assert(i <= h && h <= d + 1.0) // integer ⊆ half; dime bound sanity
    }
  }

  test("burstCensus: per-second peaks match a recompute") {
    val got = MarketOps.burstCensus(Tables.ticks(spark, sf)).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    for ((sym, rows) <- tickRows) {
      val bySec = rows.groupBy(_._1 / 1000000L).view.mapValues(_.size.toLong)
      val secs = bySec.size.toLong
      val total = rows.size.toLong
      assert(got(sym) ===
        ((secs, total, bySec.values.max, total.toDouble / secs)), s"$sym")
    }
  }

  test("benfordVolumes: digit counts match; shares sum to 1 per symbol") {
    val got = MarketOps.benfordVolumes(Tables.ticks(spark, sf)).collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
    for ((sym, rows) <- tickRows) {
      val pos = rows.filter(_._4 > 0)
      val byDigit = pos.groupBy(_._4.toString.head.asDigit.toLong).view
        .mapValues(_.size.toLong).toMap
      val mine = got.filter(_._1._1 == sym)
      assert(mine.map(x => x._1._2 -> x._2._1).toMap === byDigit, s"$sym")
      assert(math.abs(mine.map(_._2._2).sum - 1.0) < 1e-9, s"$sym shares")
    }
  }

  test("trixDaily: triple-EMA recompute matches; first bar has NULL trix") {
    val got = MarketOps.trixDaily(Tables.ticks(spark, sf)).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getDouble(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    for ((sym, bs) <- bars) {
      var e1 = 0.0; var e2 = 0.0; var e3 = 0.0; var pe3 = 0.0
      var first = true; var havePrev = false
      for ((d, _, _, c, _) <- bs) {
        val cv = c.doubleValue()
        if (first) { first = false; e1 = cv; e2 = cv; e3 = cv }
        else {
          havePrev = true; pe3 = e3
          e1 = 0.125 * cv + 0.875 * e1
          e2 = 0.125 * e1 + 0.875 * e2
          e3 = 0.125 * e2 + 0.875 * e3
        }
        val trix = if (!havePrev || pe3 == 0.0) None
          else Some(100.0 * (e3 - pe3) / pe3)
        assert(got((sym, d)) === ((e3, trix)), s"$sym $d")
      }
    }
  }

  test("elderRay: EMA recompute matches; bull ≥ bear everywhere") {
    val got = MarketOps.elderRay(Tables.ticks(spark, sf)).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    val a = 2.0 / 14.0
    for ((sym, bs) <- bars) {
      var e = 0.0; var first = true
      for ((d, h, l, c, _) <- bs) {
        if (first) { first = false; e = c.doubleValue() }
        else e = a * c.doubleValue() + (1.0 - a) * e
        val (ge, gb, gr) = got((sym, d))
        assert(ge === e, s"$sym $d ema")
        assert(gb === h.doubleValue() - e && gr === l.doubleValue() - e)
        assert(gb >= gr)
      }
    }
  }

  test("massIndex: quantized ratio sum matches the sequential recompute") {
    val got = MarketOps.massIndex(Tables.ticks(spark, sf), 25).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString), r.getDouble(2))).toMap
    for ((sym, bs) <- bars) {
      var e1 = 0.0; var e2 = 0.0; var first = true
      val micros = bs.map { case (d, h, l, _, _) =>
        val rng = h.subtract(l).doubleValue()
        if (first) { first = false; e1 = rng; e2 = rng }
        else { e1 = 0.2 * rng + 0.8 * e1; e2 = 0.2 * e1 + 0.8 * e2 }
        val ratio = if (e2 != 0.0) e1 / e2 else 0.0
        val s = ratio * 1000000.0
        (d, (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toLong)
      }
      micros.zipWithIndex.foreach { case ((d, _), i) =>
        val sumM = micros.slice(math.max(0, i - 24), i + 1).map(_._2).sum
        assert(got((sym, d)) === sumM.toDouble / 1000000.0, s"$sym $d")
      }
    }
  }

  test("riskRatios: moments match an exact-decimal recompute (sqrt family)") {
    val got = MarketOps.riskRatios(Tables.ticks(spark, sf)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(7)))).toMap
    for ((sym, bs) <- bars) {
      // quant6 returns as exact BigDecimals (micro-units as BigInt)
      val micros = bs.zip(bs.drop(1)).flatMap { case ((_, _, _, pc, _), (_, _, _, c, _)) =>
        if (pc.signum() == 0) None
        else {
          val s = c.subtract(pc).doubleValue() / pc.doubleValue() * 1000000.0
          Some(BigInt((if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toLong))
        }
      }
      val n = micros.size
      val s1 = micros.sum                        // 1e6 scale
      val s2 = micros.map(m => m * m).sum        // 1e12 scale
      val mean = (BigDecimal(s1) / BigDecimal(1000000)).toDouble / n
      val varr = (BigDecimal(s2) / BigDecimal(10).pow(12)).toDouble / n -
        mean * mean
      val (gn, gm, gs, _, gmdd) = got(sym)
      assert(gn === n.toLong, sym)
      assert(gm === mean, s"$sym mean")
      assert(gs === math.sqrt(math.max(varr, 0.0)), s"$sym std")
      // drawdown: min over days of (c − runmax)/runmax
      var mx = bs.head._4
      val mdd = bs.map { case (_, _, _, c, _) =>
        if (c.compareTo(mx) > 0) mx = c
        c.subtract(mx).doubleValue() / mx.doubleValue()
      }.min
      assert(gmdd === mdd, s"$sym mdd")
    }
  }

  test("interArrival: gap counts partition the tick log; buckets are bit lengths") {
    val ia = MarketOps.interArrival(Tables.ticks(spark, sf)).cache()
    val gapTotal = ia.agg(sum("n_gaps")).collect()(0).getLong(0)
    val ticksN = Tables.ticks(spark, sf).count()
    val symN = Tables.ticks(spark, sf).select("symbol").distinct().count()
    assert(gapTotal === ticksN - symN) // one fewer gap than ticks per symbol
    val bad = ia.filter(col("ms_bucket") < 0 ||
      col("min_gap_us") > col("max_gap_us") ||
      col("max_gap_us") >= pow(lit(2.0), col("ms_bucket") + 1) * 1000.0 ||
      (col("ms_bucket") > 0 &&
        col("min_gap_us") < pow(lit(2.0), col("ms_bucket")) * 1000.0)).count()
    assert(bad === 0)
    ia.unpersist()
  }

  test("superTrend: dir flips only across the emitted band; bands sane") {
    val st = MarketOps.superTrend(Tables.ticks(spark, sf)).cache()
    val barCount = bars.values.map(_.size - 1).sum
    assert(st.count() === barCount.toLong)
    assert(st.filter(col("dir") =!= 1L && col("dir") =!= -1L).count() === 0)
    st.unpersist()
  }

  test("coppock: exact integer WMA matches a sequential recompute") {
    val got = MarketOps.coppock(Tables.ticks(spark, sf)).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString), r.getDouble(2))).toMap
    for ((sym, bs) <- bars) {
      val micros = bs.indices.flatMap { i =>
        if (i < 14) None
        else {
          val c = bs(i)._4; val c14 = bs(i - 14)._4; val c11 = bs(i - 11)._4
          if (c14.signum() == 0 || c11.signum() == 0) None
          else {
            val s = (100.0 * c.subtract(c14).doubleValue() / c14.doubleValue() +
              100.0 * c.subtract(c11).doubleValue() / c11.doubleValue()) *
              1000000.0
            Some((bs(i)._1,
              (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toLong))
          }
        }
      }
      micros.indices.drop(9).foreach { i =>
        val wsum = (0 until 10).map(j => micros(i - j)._2 * (10L - j)).sum
        assert(got((sym, micros(i)._1)) === wsum.toDouble / 55000000.0,
          s"$sym ${micros(i)._1}")
      }
    }
  }

  test("chandelierExit: bands bracket the ATR recompute") {
    val got = MarketOps.chandelierExit(Tables.ticks(spark, sf), 22).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    for ((sym, bs) <- bars) {
      var s = 0.0; var started = false
      bs.zip(bs.drop(1)).zipWithIndex.foreach {
        case (((_, _, _, pc, _), (d, h, l, _, _)), i) =>
          val tr = Seq(h.subtract(l), h.subtract(pc).abs,
            l.subtract(pc).abs).max.doubleValue()
          if (!started) { started = true; s = tr }
          else s = s - s / 22.0 + tr
          val atr = s / 22.0
          // frame covers bars [i+1-21, i+1] of the full bar list
          val frame = bs.slice(math.max(0, i + 1 - 21), i + 2)
          val hh = frame.map(_._2).max.doubleValue()
          val ll = frame.map(_._3).min.doubleValue()
          assert(got((sym, d)) ===
            ((atr, hh - 3.0 * atr, ll + 3.0 * atr)), s"$sym $d")
      }
    }
  }

  test("parabolicSar: state machine matches the sequential recompute") {
    val got = MarketOps.parabolicSar(Tables.ticks(spark, sf)).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getLong(2), r.getDouble(3)))).toMap
    for ((sym, bs) <- bars) {
      var trend = 0L; var sar = 0.0; var ep = 0.0; var af = 0.0
      var started = false
      bs.zip(bs.drop(1)).foreach { case ((_, ph, pl, pc, _), (d, h, l, c, _)) =>
        if (!started) {
          started = true
          trend = if (c.compareTo(pc) >= 0) 1L else -1L
          if (trend == 1L) {
            sar = (if (pl.compareTo(l) < 0) pl else l).doubleValue()
            ep = (if (ph.compareTo(h) > 0) ph else h).doubleValue()
          } else {
            sar = (if (ph.compareTo(h) > 0) ph else h).doubleValue()
            ep = (if (pl.compareTo(l) < 0) pl else l).doubleValue()
          }
          af = 0.02
        } else {
          val hh = h.doubleValue(); val ll = l.doubleValue()
          val cand = sar + af * (ep - sar)
          if (trend == 1L) {
            if (ll < cand) { trend = -1L; sar = ep; ep = ll; af = 0.02 }
            else { sar = cand
              if (hh > ep) { af = math.min(af + 0.02, 0.2); ep = hh } }
          } else {
            if (hh > cand) { trend = 1L; sar = ep; ep = hh; af = 0.02 }
            else { sar = cand
              if (ll < ep) { af = math.min(af + 0.02, 0.2); ep = ll } }
          }
        }
        assert(got((sym, d)) === ((trend, sar)), s"$sym $d")
      }
    }
  }

  test("adxDaily: DI/ADX bounded in [0,100]; one row per diff bar") {
    val a = MarketOps.adxDaily(Tables.ticks(spark, sf)).cache()
    val barCount = bars.values.map(_.size - 1).sum
    assert(a.count() === barCount.toLong)
    val bad = a.filter(col("plus_di") < 0 || col("plus_di") > 100 ||
      col("minus_di") < 0 || col("minus_di") > 100 ||
      col("adx") < 0 || col("adx") > 100).count()
    assert(bad === 0)
    a.unpersist()
  }

  test("centroidDistances: matches a driver-side exact-int recompute") {
    import graft.pipeline.Similarity
    val emb = Tables.embeddings(spark, sf)
    val got = Similarity.centroidDistances(emb).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got.nonEmpty)
    val qv = emb.select(col("label").cast("long"),
        Similarity.quantizeI8(col("embedding")))
      .collect().map(r => (r.getLong(0), r.getSeq[Byte](1).toArray))
    val byLabel = qv.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    for (((a, b), (na, nb, dist)) <- got) {
      val va = byLabel(a); val vb = byLabel(b)
      assert(na === va.length.toLong && nb === vb.length.toLong)
      val sa = va.transpose.map(_.map(_.toLong).sum)
      val sb = vb.transpose.map(_.map(_.toLong).sum)
      val nsum = sa.zip(sb)
        .map { case (x, y) => val d = BigInt(x * nb - y * na); d * d }.sum
      val want = BigDecimal(math.sqrt(nsum.toDouble) / (na * nb).toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(dist === want, s"pair ($a,$b)")
    }
  }

  test("paretoRevenue: shares match the exact sorted recompute") {
    val row = Relational.paretoRevenue(spark, sf).collect()(0)
    val revs = graft.core.Tables.orders(spark, sf)
      .groupBy("o_custkey")
      .agg(sum(col("o_totalprice").cast("decimal(12,2)"))
        .cast("decimal(12,2)").as("rev"))
      .collect().map(r => (r.getLong(0), r.getDecimal(1)))
      .sortBy { case (k, r) => (r.negate, k) } // rev desc, custkey asc
    val n = revs.length
    val total = revs.map(_._2).reduce(_.add(_))
    def topShare(k: Int): Double =
      revs.take(k).map(_._2).reduce(_.add(_)).doubleValue() /
        total.doubleValue()
    assert(row.getLong(0) === n.toLong)
    assert(row.getDouble(1) === total.doubleValue())
    assert(row.getDouble(2) === topShare((n + 99) / 100))
    assert(row.getDouble(3) === topShare((n + 9) / 10))
    assert(row.getDouble(2) <= row.getDouble(3))
  }

  test("ltvCohort: cell totals partition the order log; offsets are non-negative") {
    val lc = Relational.ltvCohort(spark, sf).cache()
    val orders = graft.core.Tables.orders(spark, sf)
    assert(lc.agg(sum("n_orders")).collect()(0).getLong(0) === orders.count())
    assert(lc.filter(col("month_offset") < 0).count() === 0)
    // offset-0 cells count every customer exactly once across cohorts
    val atZero = lc.filter(col("month_offset") === 0)
      .agg(sum("n_customers")).collect()(0).getLong(0)
    assert(atZero === orders.select("o_custkey").distinct().count())
    lc.unpersist()
  }

  test("basketPairs: counts match a driver-side pair recompute") {
    val got = Relational.basketPairs(spark, sf, 20).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.forall { case ((a, b), _) => a < b })
    val li = graft.core.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pairCounts = li.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.size) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    got.foreach { case (pair, n) => assert(pairCounts(pair) === n, s"$pair") }
    val want = pairCounts.toSeq
      .sortBy { case ((a, b), c) => (-c, a, b) }.take(20).map(_._1)
    assert(got.map(_._1).toSeq === want)
  }

  test("basketPairs: an adversarial mega-basket fails loudly, not quadratically") {
    // r20 (the r19 verdict's What's-wrong #1): one order with >4096
    // distinct parts would explode O(|basket|²) pairs inside a single
    // row — the guard must abort the query with a diagnosable error
    // instead of silently burning one task on 10¹⁰ pairs at scale.
    val dir = java.nio.file.Files.createTempDirectory("basket_guard_").toString
    spark.range(5000).select(
        lit(1L).as("l_orderkey"), col("id").as("l_partkey"))
      .write.parquet(s"$dir/lineitem.parquet")
    val e = intercept[Exception] {
      Relational.basketPairs(spark, dir, 20).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("basket_pairs")),
      s"expected the basket guard message, got: ${messages(e).mkString(" | ")}")
  }

  test("sessionStats: bucket totals partition the tick log; buckets are bit lengths") {
    val ticks = Tables.ticks(spark, sf)
    val st = EventAnalytics.sessionStats(ticks, 30).cache()
    assert(st.count() > 0)
    val totalEvents = st.agg(sum("total_events")).collect()(0).getLong(0)
    assert(totalEvents === ticks.count())
    val bad = st.filter(col("dur_bucket") < 0 ||
      col("min_dur_sec") > col("max_dur_sec") ||
      // bucket b holds durations in [2^b, 2^(b+1)) (and 0 → bucket 0)
      col("max_dur_sec") >= pow(lit(2.0), col("dur_bucket") + 1) ||
      (col("dur_bucket") > 0 &&
        col("min_dur_sec") < pow(lit(2.0), col("dur_bucket")))).count()
    assert(bad === 0)
    st.unpersist()
  }

  test("activityGini: matches the exact sorted-rank recompute") {
    val events = Tables.events(spark, sf)
    val row = EventAnalytics.activityGini(events).collect()(0)
    val counts = events.groupBy("user_id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(x => (x._2, x._1))
    val n = counts.length
    val total = counts.map(_._2).sum
    val s1 = counts.zipWithIndex.map { case ((_, c), i) =>
      BigInt(i + 1) * BigInt(c) }.sum
    val want = (BigInt(2) * s1 - BigInt(n + 1) * BigInt(total)).toDouble /
      (BigInt(n) * BigInt(total)).toDouble
    assert(row.getLong(0) === n.toLong)
    assert(row.getLong(1) === total)
    assert(row.getDouble(2) === BigDecimal(want)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) < 1.0)
  }

  test("dupNgrams: counts match a driver-side recompute; all entries repeated") {
    val docs = Tables.documents(spark, sf)
    val got = graft.pipeline.TextOps.dupNgrams(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.forall(_._2 >= 2))
    val texts = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val all = texts.flatMap { case (id, t) =>
      val ws = t.split(" ", -1)
      (0 to ws.length - 6).map(i => (ws.slice(i, i + 6).mkString(" "), id))
    }
    val byGram = all.groupBy(_._1).view
      .mapValues(v => (v.length.toLong, v.map(_._2).distinct.length.toLong))
      .toMap
    got.foreach { case (g, n, nd) =>
      assert(byGram(g) === ((n, nd)), s"gram '$g'")
    }
    // the top-20 really are the most frequent (with (count desc, gram) order)
    val want = byGram.toSeq.filter(_._2._1 >= 2)
      .sortBy { case (g, (c, _)) => (-c, g) }.take(20).map(_._1)
    assert(got.map(_._1).toSeq === want)
  }

  test("hapax: per-source vocabulary and hapax counts match a recompute") {
    val docs = Tables.documents(spark, sf)
    val got = graft.pipeline.TextOps.hapax(docs).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val bySource = docs.select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues { rows =>
        val words = rows.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
        val freq = words.groupBy(identity).view.mapValues(_.length).toMap
        val vocab = freq.size.toLong
        val hap = freq.count(_._2 == 1).toLong
        (vocab, hap, words.length.toLong, hap.toDouble / vocab)
      }.toMap
    assert(got.keySet === bySource.keySet)
    got.foreach { case (s, v) => assert(v === bySource(s), s"source $s") }
  }

  test("eom: degenerate bars contribute zero; sign tracks midpoint moves") {
    val e = MarketOps.easeOfMovement(Tables.ticks(spark, sf), 14).cache()
    assert(e.count() > 0)
    // recompute per-day emv6 sequentially and check the window mean
    val got = e.collect()
      .map(r => ((r.getString(0), r.getDate(1).toString), r.getDouble(2))).toMap
    for ((sym, bs) <- bars) {
      val emvs = bs.zip(bs.drop(1)).map { case ((_, ph, pl, _, _), (d, h, l, _, vol)) =>
        val emv6 =
          if (h.compareTo(l) == 0 || vol == 0L) JBD.ZERO
          else {
            val prod = h.add(l).subtract(ph).subtract(pl)
              .multiply(h.subtract(l))
            val s = prod.doubleValue() * 10000.0 / (vol * 2).toDouble * 1000000.0
            val q = if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)
            new JBD(q.toLong).movePointLeft(6)
          }
        (d, emv6)
      }
      emvs.zipWithIndex.foreach { case ((d, _), i) =>
        val fr = emvs.slice(math.max(0, i - 13), i + 1)
        val m = fr.map(_._2).reduce(_.add(_)).doubleValue() / fr.size
        assert(got((sym, d)) === m, s"$sym $d eom")
      }
    }
    e.unpersist()
  }
}
