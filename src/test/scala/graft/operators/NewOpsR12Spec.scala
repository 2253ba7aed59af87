package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Semantic contracts of the r12 market additions, each checked
  * against an independent driver-side recompute from the daily bars /
  * raw ticks — exact equality, not tolerance (the oracle hash alone
  * can be green with wrong-unit semantics; see the hull MA lesson).
  */
class NewOpsR12Spec extends AnyFunSuite {
  import TestSpark._

  private def q6micro(x: Double): Long = {
    val s = x * 1000000.0
    (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toLong
  }

  /** Per-symbol day-ordered (day, open, high, low, close, vol) from the
    * operator-shared ohlcDaily scaffold.
    */
  private lazy val bars: Map[String, Array[(String, Double, Double, Double, Double, Long)]] =
    MarketOps.ohlcDaily(Tables.ticks(spark, sf))
      .select(col("symbol"), col("day").cast("string"), col("open"),
        col("high"), col("low"), col("close"), col("volume"))
      .collect()
      .map(r => (r.getString(0), (r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap

  /** Daily close-to-close returns in exact 6-dp micro-units. */
  private def ret6micro(bs: Array[(String, Double, Double, Double, Double, Long)])
      : Array[Long] =
    bs.sliding(2).collect { case Array(p, c) if p._5 != 0.0 =>
      q6micro((c._5 - p._5) / p._5)
    }.toArray

  test("goldenCross emits exactly the 4·s5 vs s20 sign-flip days") {
    val got = MarketOps.goldenCross(Tables.ticks(spark, sf)).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getString(2)))
    val want = bars.toSeq.flatMap { case (sym, bs) =>
      val closesCents = bs.map(b => BigInt(math.round(b._5 * 100)))
      val days = bs.map(_._1)
      // d = 4·s5 − s20 in exact cents, defined from the 20th bar on
      val ds = (19 until bs.length).map { i =>
        val s5 = closesCents.slice(i - 4, i + 1).sum
        val s20 = closesCents.slice(i - 19, i + 1).sum
        (days(i), s5 * 4 - s20)
      }
      ds.sliding(2).collect {
        case Seq((_, pd), (day, d))
            if (pd <= 0 && d > 0) || (pd >= 0 && d < 0) =>
          (sym, day, if (d > 0) "golden" else "death")
      }
    }.toSet
    assert(got.toSet === want)
    assert(got.nonEmpty, "test tape produced no crossover — widen it")
  }

  test("runsTest matches an exact driver-side run count and z formula") {
    val got = MarketOps.runsTest(Tables.ticks(spark, sf)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    assert(got.keySet === bars.keySet)
    for ((sym, bs) <- bars) {
      val signs = bs.map(_._5).sliding(2).collect {
        case Array(p, c) if c != p => if (c > p) 1 else -1
      }.toArray
      val n1 = signs.count(_ == 1).toLong
      val n2 = signs.count(_ == -1).toLong
      val runs = if (signs.isEmpty) 1L
        else 1L + signs.sliding(2).count { case Array(a, b) => a != b; case _ => false }
      val (gn1, gn2, gruns, gz) = got(sym)
      assert((gn1, gn2, gruns) === ((n1, n2, runs)), sym)
      val n = (n1 + n2).toDouble
      val p = (n1 * n2 * 2L).toDouble
      val va = p * (p - n) / (n * n * (n - 1.0))
      if (n1 > 0 && n2 > 0 && n1 + n2 > 1 && va > 0) {
        val z = BigDecimal((runs.toDouble - (p / n + 1.0)) / math.sqrt(va))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
        assert(gz.contains(z), sym)
      } else assert(gz.isEmpty, sym)
    }
  }

  test("gapFillRate counts gap and fill days exactly") {
    val got = MarketOps.gapFillRate(Tables.ticks(spark, sf)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    for ((sym, bs) <- bars) {
      var gu = 0L; var fu = 0L; var gd = 0L; var fd = 0L
      bs.sliding(2).foreach { case Array(p, c) =>
        // exact cents compares (prices are 2-dp)
        val pc = math.round(p._5 * 100); val o = math.round(c._2 * 100)
        val h = math.round(c._3 * 100); val l = math.round(c._4 * 100)
        if (o > pc) { gu += 1; if (l <= pc) fu += 1 }
        if (o < pc) { gd += 1; if (h >= pc) fd += 1 }
      case _ => ()
      }
      assert(got(sym) === ((gu, fu, gd, fd)), sym)
    }
  }

  test("chaikinOsc runs the documented EMA3−EMA10 recursion over the A/D line") {
    val ad = MarketOps.adLine(Tables.ticks(spark, sf)).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    val got = MarketOps.chaikinOsc(Tables.ticks(spark, sf)).collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        (r.getDouble(2), r.getDouble(3))))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(got.keySet === ad.keySet)
    for ((sym, ads) <- ad) {
      val af = 2.0 / 4.0; val as = 2.0 / 11.0
      var ef = ads.head; var es = ads.head
      val want = ads.zipWithIndex.map { case (a, i) =>
        if (i > 0) { ef = af * a + (1.0 - af) * ef; es = as * a + (1.0 - as) * es }
        (a, ef - es)
      }
      assert(got(sym).toSeq === want.toSeq, sym)
    }
  }

  test("priceVolumeCorr / meanReversion / volOfVol match exact recomputes") {
    def corrLike(xs: Array[Long], ys: Array[BigInt], xScale: Double,
        yScale: Double): Option[Double] = {
      val n = xs.length.toDouble
      if (n <= 1.0) return None
      val sx = xs.map(BigInt(_)).sum.toDouble / xScale
      val sy = ys.sum.toDouble / yScale
      val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum.toDouble /
        (xScale * yScale)
      val sxx = xs.map(a => BigInt(a) * BigInt(a)).sum.toDouble / (xScale * xScale)
      val syy = ys.map(b => b * b).sum.toDouble / (yScale * yScale)
      val dx = sxx - sx * sx / n
      val dy = syy - sy * sy / n
      if (dx > 0 && dy > 0)
        Some(BigDecimal((sxy - sx * sy / n) / math.sqrt(dx * dy))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
      else None
    }
    val gotPv = MarketOps.priceVolumeCorr(Tables.ticks(spark, sf)).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    val gotAr = MarketOps.meanReversion(Tables.ticks(spark, sf)).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    val gotVov = MarketOps.volOfVol(Tables.ticks(spark, sf)).collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2))))
      .toMap
    for ((sym, bs) <- bars) {
      val rets = ret6micro(bs)
      val dvs = bs.map(_._6).sliding(2).collect { case Array(p, c) => BigInt(c - p) }
        .toArray
      // pv_corr over (ret micro, volume delta) — scales 1e6 / 1
      assert(gotPv(sym) === corrLike(rets, dvs, 1e6, 1.0), s"$sym pv")
      // ar(1): y = rets drop 1, x = rets dropRight 1 — reuse via slope
      val xs = rets.dropRight(1); val ys = rets.drop(1)
      val n = xs.length.toDouble
      val want =
        if (n <= 1.0) None
        else {
          val sx = xs.map(BigInt(_)).sum.toDouble / 1e6
          val sy = ys.map(BigInt(_)).sum.toDouble / 1e6
          val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * BigInt(b) }.sum
            .toDouble / 1e12
          val sxx = xs.map(a => BigInt(a) * BigInt(a)).sum.toDouble / 1e12
          val dx = sxx - sx * sx / n
          if (dx != 0.0)
            Some(BigDecimal((sxy - sx * sy / n) / dx)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
          else None
        }
      assert(gotAr(sym) === want, s"$sym ar1")
      // vol-of-vol over u = q6(ln(h/l))
      val us = bs.filter(b => b._3 > 0 && b._4 > 0)
        .map(b => q6micro(math.log(b._3 / b._4)))
      val nv = us.length.toDouble
      val wantVov =
        if (nv <= 1.0) None
        else {
          val s = us.map(BigInt(_)).sum.toDouble / 1e6
          val sq = us.map(u => BigInt(u) * BigInt(u)).sum.toDouble / 1e12
          val va = (sq - s * s / nv) / (nv - 1.0)
          Some(BigDecimal(math.sqrt(math.max(va, 0.0)))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
        }
      assert(gotVov(sym) === wantVov, s"$sym vov")
    }
  }

  test("vpt ends at the exact winsorized return·volume dot product (unit check)") {
    // semantic/magnitude assert (CLAUDE.md cents-path rule): the final
    // vpt per symbol equals a driver recompute in 1e-4 return units
    val ticks = Tables.ticks(spark, sf)
      .select(col("symbol"), col("ts"), col("event_id"), col("price"),
        col("volume"))
      .collect()
      .map { r =>
        val t = r.getTimestamp(1)
        // full-µs sort key: getTime alone truncates to ms and can
        // missort same-millisecond ticks
        val us = t.getTime / 1000L * 1000000L + t.getNanos / 1000L
        (r.getString(0), (us, r.getLong(2), r.getDouble(3), r.getLong(4)))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(t => (t._1, t._2)))
      .toMap
    val got = MarketOps.vpt(Tables.ticks(spark, sf))
      .groupBy("symbol").agg(max_by(col("vpt"), col("event_id")).as("last"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((sym, ts) <- ticks) {
      var acc = BigInt(0)
      ts.sliding(2).foreach {
        case Array(p, c) if p._3 != 0.0 =>
          val s = (c._3 / p._3 - 1.0) * 10000.0
          val q = (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toLong
          val r4u = math.max(-1000000L, math.min(1000000L, q))
          acc += BigInt(r4u) * BigInt(c._4)
        case _ => ()
      }
      assert(got(sym) === acc.toDouble / 10000.0, sym)
    }
  }

  test("klinger runs the documented (trend, cm) state machine + EMA pair") {
    val got = MarketOps.klinger(Tables.ticks(spark, sf)).collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        (r.getLong(2), r.getDouble(3))))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    for ((sym, bs) <- bars) {
      val af = 2.0 / 35.0; val as = 2.0 / 56.0
      var trend = 0L
      var cm = BigDecimal(0)
      var ef = 0.0; var es = 0.0; var started = false
      val want = bs.sliding(2).collect { case Array(p, c) =>
        // exact cents via BigDecimal of the 2-dp doubles
        def d2(x: Double) = BigDecimal(math.round(x * 100)) / 100
        val hlc = d2(c._3) + d2(c._4) + d2(c._5)
        val phlc = d2(p._3) + d2(p._4) + d2(p._5)
        val t = if (hlc > phlc) 1L else -1L
        val dm = d2(c._3) - d2(c._4)
        val dmp = d2(p._3) - d2(p._4)
        cm = if (!started || t != trend) dmp + dm else cm + dm
        trend = t
        val vf = if (cm == 0) 0.0
          else c._6.toDouble *
            math.abs(2.0 * (dm.toDouble / cm.toDouble - 1.0)) *
            t.toDouble * 100.0
        if (!started) { started = true; ef = vf; es = vf }
        else { ef = af * vf + (1.0 - af) * ef; es = as * vf + (1.0 - as) * es }
        (trend, ef - es)
      }.toSeq
      assert(got(sym).toSeq === want, sym)
    }
  }

  test("nviPvi compounds returns only on the documented volume legs") {
    val got = MarketOps.nviPvi(Tables.ticks(spark, sf)).collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        (r.getDouble(2), r.getDouble(3))))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    for ((sym, bs) <- bars) {
      var nvi = 1000.0; var pvi = 1000.0
      val want = bs.sliding(2).collect { case Array(p, c) =>
        def d2(x: Double) = BigDecimal(math.round(x * 100)) / 100
        if (d2(p._5) != 0) {
          val ret = (d2(c._5) - d2(p._5)).toDouble / d2(p._5).toDouble
          if (c._6 < p._6) nvi = nvi * (1.0 + ret)
          if (c._6 > p._6) pvi = pvi * (1.0 + ret)
        }
        (nvi, pvi)
      }.toSeq
      assert(got(sym).toSeq === want, sym)
      // index sanity: strictly positive for sane tapes
      assert(got(sym).forall(t => t._1 > 0 && t._2 > 0), sym)
    }
  }

  test("volCone envelopes match per-window stddev recomputes") {
    val got = MarketOps.volCone(Tables.ticks(spark, sf)).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    for ((sym, bs) <- bars; h <- Seq(5, 10, 20)) {
      val rets = ret6micro(bs)
      if (rets.length >= h) {
        val vols = rets.sliding(h).map { w =>
          val s = w.map(BigInt(_)).sum.toDouble / 1e6
          val sq = w.map(x => BigInt(x) * BigInt(x)).sum.toDouble / 1e12
          val va = (sq - s * s / h.toDouble) / (h.toDouble - 1.0)
          math.sqrt(math.max(va, 0.0))
        }.toSeq
        val mean = vols.map(v => BigInt(q6micro(v))).sum.toDouble / 1e6 /
          vols.size.toDouble
        val (n, mn, mx, m) = got((sym, h.toLong))
        assert(n === vols.size.toLong, s"$sym h$h n")
        assert(mn === vols.min && mx === vols.max, s"$sym h$h extremes")
        assert(m === mean, s"$sym h$h mean")
      } else assert(!got.contains((sym, h.toLong)), s"$sym h$h")
    }
  }

  test("turnOfMonth groups the dowReturns series by day-of-month") {
    val got = MarketOps.turnOfMonth(Tables.ticks(spark, sf)).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    for ((sym, bs) <- bars) {
      val byDom = bs.sliding(2).collect {
        case Array(p, c) if p._5 != 0.0 =>
          (c._1.substring(8, 10).toInt.toLong, q6micro((c._5 - p._5) / p._5))
      }.toSeq.groupBy(_._1)
      for ((dom, rs) <- byDom) {
        val (n, avg) = got((sym, dom))
        assert(n === rs.size.toLong, s"$sym dom $dom n")
        assert(avg === rs.map(r => BigInt(r._2)).sum.toDouble / 1e6 / rs.size.toDouble,
          s"$sym dom $dom avg")
      }
    }
  }
}
