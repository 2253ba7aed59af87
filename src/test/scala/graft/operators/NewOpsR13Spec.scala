package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Semantic contracts of the r13 market additions — each checked
  * against an independent driver-side recompute from the daily bars
  * (exact equality, not tolerance; the hull-MA lesson: an oracle hash
  * can be green with wrong-unit semantics).
  */
class NewOpsR13Spec extends AnyFunSuite {
  import TestSpark._

  private def q6micro(x: Double): Long = {
    val s = x * 1000000.0
    (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toLong
  }

  /** Decimal(…,2) → double exactly as Spark's cast (nearest double). */
  private def d2(cents: Long): Double = (BigDecimal(cents) / 100).toDouble

  private lazy val bars: Map[String, Array[(String, Double, Double, Double, Double, Long)]] =
    MarketOps.ohlcDaily(Tables.ticks(spark, sf))
      .select(col("symbol"), col("day").cast("string"), col("open"),
        col("high"), col("low"), col("close"), col("volume"))
      .collect()
      .map(r => (r.getString(0), (r.getString(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getLong(6))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap

  private def cents(x: Double): Long = math.round(x * 100)

  test("fractals emits exactly the strict wing-2 swing points") {
    val got = MarketOps.fractals(Tables.ticks(spark, sf), 2).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val want = bars.toSeq.flatMap { case (sym, bs) =>
      val h = bs.map(b => cents(b._3)); val l = bs.map(b => cents(b._4))
      (2 until bs.length - 2).flatMap { i =>
        val fh = h(i) > h(i - 1) && h(i) > h(i + 1) &&
          h(i) > h(i - 2) && h(i) > h(i + 2)
        val fl = l(i) < l(i - 1) && l(i) < l(i + 1) &&
          l(i) < l(i - 2) && l(i) < l(i + 2)
        if (fh || fl)
          Some((sym, bs(i)._1) ->
            ((if (fh) Some(d2(h(i))) else None,
              if (fl) Some(d2(l(i))) else None)))
        else None
      }
    }.toMap
    assert(got === want)
    assert(got.nonEmpty, "test tape produced no fractals — widen it")
  }

  test("rvi matches the exact 1-2-2-1 swma window quotient") {
    val got = MarketOps.rvi(Tables.ticks(spark, sf), 10).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val want = bars.toSeq.flatMap { case (sym, bs) =>
      val co = bs.map(b => cents(b._5) - cents(b._2))
      val hl = bs.map(b => cents(b._3) - cents(b._4))
      def swma(a: Array[Long], i: Int): Long =
        a(i) + 2 * a(i - 1) + 2 * a(i - 2) + a(i - 3)
      // swma rows exist from bar index 3 on; 10-window over THOSE rows
      val rows = (3 until bs.length).map(i =>
        (bs(i)._1, swma(co, i), swma(hl, i)))
      (9 until rows.length).map { j =>
        val win = rows.slice(j - 9, j + 1)
        val sn = win.map(_._2).sum; val sd = win.map(_._3).sum
        (sym, rows(j)._1) -> (if (sd != 0) Some(d2(sn) / d2(sd)) else None)
      }
    }.toMap
    assert(got === want)
    assert(got.valuesIterator.flatten.nonEmpty)
  }

  test("trendIntensity counts strict above-mean closes in exact cents") {
    val got = MarketOps.trendIntensity(Tables.ticks(spark, sf), 20).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getLong(2), r.getDouble(3)))).toMap
    val want = bars.toSeq.flatMap { case (sym, bs) =>
      val c = bs.map(b => cents(b._5))
      (19 until bs.length).map { i =>
        val win = c.slice(i - 19, i + 1)
        val sc = win.sum
        val up = win.count(x => x * 20 > sc).toLong
        (sym, bs(i)._1) -> ((up, up.toDouble * 100.0 / 20.0))
      }
    }.toMap
    assert(got === want)
  }

  test("donchianBreakouts counts strict channel escapes") {
    val got = MarketOps.donchianBreakouts(Tables.ticks(spark, sf), 20).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val want = bars.map { case (sym, bs) =>
      val h = bs.map(b => cents(b._3)); val l = bs.map(b => cents(b._4))
      val c = bs.map(b => cents(b._5))
      val days = (20 until bs.length).map { i =>
        (c(i) > h.slice(i - 20, i).max, c(i) < l.slice(i - 20, i).min)
      }
      sym -> ((days.length.toLong, days.count(_._1).toLong,
        days.count(_._2).toLong))
    }
    assert(got === want)
    // the 20-day channel may never break on a short tape — a tighter
    // 3-day channel must, so the event path is exercised non-vacuously
    val got3 = MarketOps.donchianBreakouts(Tables.ticks(spark, sf), 3)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(got3.map(p => p._1 + p._2).sum > 0,
      "no 3-day channel escapes on the test tape — widen it")
  }

  test("vzo runs the documented twin EMA(14) recursion") {
    val got = MarketOps.vzo(Tables.ticks(spark, sf), 14).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    for ((sym, bs) <- bars) {
      val a = 2.0 / 15.0
      var es = 0.0; var ev = 0.0; var first = true
      val want = bs.sliding(2).map { case Array(p, b) =>
        val sv = (if (cents(b._5) > cents(p._5)) b._6
          else if (cents(b._5) < cents(p._5)) -b._6 else 0L).toDouble
        val v = b._6.toDouble
        if (first) { first = false; es = sv; ev = v }
        else { es = a * sv + (1.0 - a) * es; ev = a * v + (1.0 - a) * ev }
        if (ev != 0.0) 100.0 * es / ev else 0.0
      case _ => fail("sliding(2) emitted a short window")
      }.toSeq
      assert(got(sym).toSeq === want, sym)
    }
  }

  test("connorsRsi composes the three documented components exactly") {
    val got = MarketOps.connorsRsi(Tables.ticks(spark, sf)).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (Option.when(!r.isNullAt(2))(r.getDouble(2)),
          Option.when(!r.isNullAt(3))(r.getDouble(3)),
          Option.when(!r.isNullAt(4))(r.getDouble(4)),
          Option.when(!r.isNullAt(5))(r.getDouble(5))))).toMap
    val want = bars.toSeq.flatMap { case (sym, bs) =>
      val c = bs.map(b => cents(b._5))
      // diff rows (pc != 0)
      val rows = (1 until bs.length).collect {
        case i if c(i - 1) != 0 =>
          (bs(i)._1, c(i) - c(i - 1),
            d2(c(i)) / d2(c(i - 1)) - 1.0,
            java.lang.Long.signum(c(i) - c(i - 1)))
      }
      // signed streak: run position × sign
      val streaks = new Array[Long](rows.length)
      for (j <- rows.indices) {
        val s = rows(j)._4
        streaks(j) =
          if (j > 0 && java.lang.Long.signum(streaks(j - 1)) == s && s != 0)
            streaks(j - 1) + s
          else s.toLong
      }
      val n = rows.length
      (2 until n).map { j =>
        val diffs3 = (j - 2 to j).map(rows(_)._2)
        val g3 = diffs3.filter(_ > 0).sum
        val l3 = -diffs3.filter(_ < 0).sum
        val rsi3 = if (g3 + l3 != 0)
          Some(100.0 * d2(g3) / d2(g3 + l3)) else None
        val sd = (j - 1 to j).map(k => streaks(k) - streaks(k - 1))
        val g2 = sd.filter(_ > 0).sum
        val l2 = -sd.filter(_ < 0).sum
        val srsi2 = if (g2 + l2 != 0)
          Some(100.0 * g2.toDouble / (g2 + l2).toDouble) else None
        val rk = 1 + rows.count(_._3 < rows(j)._3)
        val pr = if (n > 1)
          Some(100.0 * (rk - 1).toDouble / (n - 1).toDouble) else None
        val crsi = for (a <- rsi3; b <- srsi2; p <- pr)
          yield (a + b + p) / 3.0
        (sym, rows(j)._1) -> ((rsi3, srsi2, pr, crsi))
      }
    }.toMap
    assert(got === want)
    assert(got.valuesIterator.count(_._4.nonEmpty) > 0)
  }

  test("choppiness matches the exact quant6-ln recompute") {
    val got = MarketOps.choppiness(Tables.ticks(spark, sf), 14).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        Option.when(!r.isNullAt(2))(r.getDouble(2)))).toMap
    val want = bars.toSeq.flatMap { case (sym, bs) =>
      val rows = (1 until bs.length).map { i =>
        val h = cents(bs(i)._3); val l = cents(bs(i)._4)
        val pc = cents(bs(i - 1)._5)
        (bs(i)._1, h, l, math.max(h - l, math.max(math.abs(h - pc),
          math.abs(l - pc))))
      }
      (13 until rows.length).map { j =>
        val win = rows.slice(j - 13, j + 1)
        val str = win.map(_._4).sum
        val rng = win.map(_._2).max - win.map(_._3).min
        val ci = if (rng > 0 && str > 0)
          Some(100.0 * (q6micro(math.log(d2(str) / d2(rng))) / 1.0e6) /
            2.6390573296152584)
        else None
        (sym, rows(j)._1) -> ci
      }
    }.toMap
    assert(got === want)
    assert(got.valuesIterator.flatten.nonEmpty)
  }

  test("stochRsi applies %K to the exact Cutler RSI series") {
    val got = MarketOps.stochRsi(Tables.ticks(spark, sf), 14).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (Option.when(!r.isNullAt(2))(r.getDouble(2)),
          Option.when(!r.isNullAt(3))(r.getDouble(3))))).toMap
    val want = bars.toSeq.flatMap { case (sym, bs) =>
      val c = bs.map(b => cents(b._5))
      val diffs = (1 until bs.length).map(i => (bs(i)._1, c(i) - c(i - 1)))
      val rsis = (13 until diffs.length).map { j =>
        val win = diffs.slice(j - 13, j + 1).map(_._2)
        val g = win.filter(_ > 0).sum
        val l = -win.filter(_ < 0).sum
        (diffs(j)._1,
          if (g + l != 0) Some(100.0 * d2(g) / d2(g + l)) else None)
      }
      (13 until rsis.length).map { j =>
        val win = rsis.slice(j - 13, j + 1).flatMap(_._2)
        val stoch = rsis(j)._2.flatMap { r =>
          val mn = if (win.nonEmpty) win.min else Double.NaN
          val mx = if (win.nonEmpty) win.max else Double.NaN
          if (win.nonEmpty && mx > mn) Some(100.0 * (r - mn) / (mx - mn))
          else None
        }
        (sym, rsis(j)._1) -> ((rsis(j)._2, stoch))
      }
    }.toMap
    assert(got === want)
    assert(got.valuesIterator.count(_._2.nonEmpty) > 0)
  }

  test("rsRating percentile-ranks trailing returns cross-sectionally") {
    val got = MarketOps.rsRating(Tables.ticks(spark, sf), 20).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getDouble(2),
          Option.when(!r.isNullAt(3))(r.getDouble(3))))).toMap
    val rets = bars.toSeq.flatMap { case (sym, bs) =>
      val c = bs.map(b => cents(b._5))
      (20 until bs.length).collect {
        case i if c(i - 20) != 0 =>
          (bs(i)._1, sym, d2(c(i)) / d2(c(i - 20)) - 1.0)
      }
    }
    val byDay = rets.groupBy(_._1)
    val want = rets.map { case (day, sym, ret) =>
      val peers = byDay(day)
      val rk = 1 + peers.count(_._3 < ret)
      val n = peers.length
      (sym, day) -> ((ret,
        if (n > 1) Some(100.0 * (rk - 1).toDouble / (n - 1).toDouble)
        else None))
    }.toMap
    assert(got === want)
    assert(got.valuesIterator.count(_._2.nonEmpty) > 0)
  }

  test("elderImpulse runs the documented five-state recursion") {
    val got = MarketOps.elderImpulse(Tables.ticks(spark, sf)).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val want = bars.map { case (sym, bs) =>
      val cs = bs.map(b => (BigDecimal(cents(b._5)) / 100).toDouble)
      val a12 = 2.0 / 13.0; val a26 = 2.0 / 27.0
      val a9 = 2.0 / 10.0; val a13 = 2.0 / 14.0
      var e12 = cs.head; var e26 = cs.head; var e13 = cs.head
      var sig = 0.0; var hist = 0.0
      var g = 0L; var r = 0L; var b = 0L
      for (c <- cs.tail) {
        val pe13 = e13; val phist = hist
        val e12n = a12 * c + (1.0 - a12) * e12
        val e26n = a26 * c + (1.0 - a26) * e26
        val macdn = e12n - e26n
        val sign = a9 * macdn + (1.0 - a9) * sig
        val histn = macdn - sign
        val e13n = a13 * c + (1.0 - a13) * e13
        e12 = e12n; e26 = e26n; sig = sign; hist = histn; e13 = e13n
        if (e13n > pe13 && histn > phist) g += 1
        else if (e13n < pe13 && histn < phist) r += 1
        else b += 1
      }
      sym -> (((cs.length - 1).toLong, g, r, b))
    }
    assert(got === want)
    assert(want.values.map(v => v._2 + v._3).sum > 0, "all-blue tape — widen it")
  }

  test("demaTema runs the documented stacked-EMA recursion") {
    val got = MarketOps.demaTema(Tables.ticks(spark, sf), 10).collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        (r.getDouble(2), r.getDouble(3))))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    for ((sym, bs) <- bars) {
      val cs = bs.map(b => d2(cents(b._5)))
      val a = 2.0 / 11.0
      var e1 = cs.head; var e2 = cs.head; var e3 = cs.head
      val want = cs.zipWithIndex.map { case (c, i) =>
        if (i > 0) {
          e1 = a * c + (1.0 - a) * e1
          e2 = a * e1 + (1.0 - a) * e2
          e3 = a * e2 + (1.0 - a) * e3
        }
        (2.0 * e1 - e2, 3.0 * e1 - 3.0 * e2 + e3)
      }
      assert(got(sym).toSeq === want.toSeq, sym)
    }
  }

  test("growthAccounting satisfies the DAU identity against a driver recompute") {
    val got = EventAnalytics.growthAccounting(Tables.events(spark, sf))
      .collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), java.time.LocalDate.parse(r.getString(1))))
    val byUser = ud.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val flags = byUser.values.flatMap { days =>
      days.zipWithIndex.map { case (d, i) =>
        val prev = if (i > 0) Some(days(i - 1)) else None
        (d, prev.isEmpty,
          prev.exists(p => java.time.temporal.ChronoUnit.DAYS.between(p, d) == 1),
          prev.exists(p => java.time.temporal.ChronoUnit.DAYS.between(p, d) > 1))
      }
    }.toSeq
    val daily = flags.groupBy(_._1).view.mapValues { fs =>
      (fs.size.toLong, fs.count(_._2).toLong, fs.count(_._3).toLong,
        fs.count(_._4).toLong)
    }.toMap
    val days = daily.keys.toSeq.sorted
    val want = days.zipWithIndex.map { case (d, i) =>
      val (active, nw, ret, res) = daily(d)
      val prevActive =
        if (i > 0 && java.time.temporal.ChronoUnit.DAYS
              .between(days(i - 1), d) == 1) daily(days(i - 1))._1
        else 0L
      d.toString -> ((active, nw, ret, res, prevActive - ret))
    }.toMap
    assert(got === want)
    // the identity: active = new + retained + resurrected
    got.values.foreach { case (a, n, r, s, _) => assert(a === n + r + s) }
  }

  test("squeeze census matches the exact band-chain recompute") {
    val got = MarketOps.squeeze(Tables.ticks(spark, sf), 20).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val want = bars.map { case (sym, bs) =>
      val rows = (1 until bs.length).map { i =>
        val h = cents(bs(i)._3); val l = cents(bs(i)._4)
        val c = cents(bs(i)._5); val pc = cents(bs(i - 1)._5)
        val tr = math.max(h - l,
          math.max(math.abs(h - pc), math.abs(l - pc)))
        (c, tr, h + l + c, c * c)
      }
      val days = (19 until rows.length).map { j =>
        val win = rows.slice(j - 19, j + 1)
        val s = d2(win.map(_._1).sum)
        // Σc² carries 4 decimal places (cents² / 10⁴)
        val sq = (BigDecimal(win.map(w => BigInt(w._4)).sum) / 10000).toDouble
        val stp = d2(win.map(_._3).sum)
        val str = d2(win.map(_._2).sum)
        val mean = s / 20.0
        val varRaw = (sq - (s * s) / 20.0) / (20.0 - 1.0)
        val sd = math.sqrt(if (varRaw > 0) varRaw else 0.0)
        val mid = stp / 60.0
        val rng = str / 20.0
        mean - 2.0 * sd > mid - 1.5 * rng &&
          mean + 2.0 * sd < mid + 1.5 * rng
      }
      sym -> ((days.length.toLong, days.count(identity).toLong))
    }
    assert(got === want)
  }

  test("hurst aggregated-variance recompute is exact; random-walk-ish tape lands near 0.5") {
    val got = MarketOps.hurst(Tables.ticks(spark, sf)).collect()
      .map(r => r.getString(0) ->
        ((Option.when(!r.isNullAt(1))(r.getDouble(1)),
          Option.when(!r.isNullAt(2))(r.getDouble(2)),
          Option.when(!r.isNullAt(3))(r.getDouble(3)),
          Option.when(!r.isNullAt(4))(r.getDouble(4))))).toMap
    for ((sym, bs) <- bars) {
      val c = bs.map(b => cents(b._5)).filter(_ > 0)
      val rs = c.sliding(2).collect { case Array(p, x) if p > 0 =>
        math.max(-1000000L, math.min(1000000L,
          q6micro(math.log(d2(x) / d2(p)))))
      }.toArray
      def varAt(m: Int): Option[Double] = {
        val xs = rs.grouped(m).filter(_.length == m).map(_.sum).toArray
        val nb = xs.length
        if (nb < 2) return None
        val sx = xs.map(BigInt(_)).sum
        val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum
        val num = nb * sxx - sx * sx
        if (num > 0)
          Some(num.toDouble / (nb.toLong * (nb - 1)).toDouble / 1.0e12)
        else None
      }
      val (v1, v2, v4) = (varAt(1), varAt(2), varAt(4))
      val h = for (a <- v1; b <- v4; if a > 0 && b > 0) yield
        (q6micro(math.log(b)) / 1.0e6 - q6micro(math.log(a)) / 1.0e6) /
          2.772588722239781
      assert(got(sym) === ((v1, v2, v4, h)), sym)
      // semantic sanity: the estimator is unclamped (anti-persistent
      // series go negative) but must stay in a plausible band
      h.foreach(x => assert(x > -2.0 && x < 2.0, s"$sym hurst=$x"))
    }
  }
}
