package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Semantic contracts of the r12b additions (vwma / awesomeOsc /
  * spearmanMatrix / tsi) — each checked against an independent
  * driver-side recompute from raw ticks / daily bars, exact equality
  * (the hull MA lesson: a green oracle hash alone can hide wrong-unit
  * semantics).
  */
class NewOpsR12cSpec extends AnyFunSuite {
  import TestSpark._

  private def q6of(x: Double): Double = {
    val s = x * 1000000.0
    val q = (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toLong
    new java.math.BigDecimal(q).movePointLeft(6).doubleValue()
  }

  private def q4of(x: Double): Double = {
    val s = x * 10000.0
    val q = (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toLong
    q.toDouble / 10000.0
  }

  /** (symbol → day-ordered (day, openC, highC, lowC, closeC, vol)) in
    * exact cents.
    */
  private lazy val bars: Map[String, Array[(String, Long, Long, Long, Long, Long)]] =
    MarketOps.ohlcDaily(Tables.ticks(spark, sf))
      .select(col("symbol"), col("day").cast("string"), col("open"),
        col("high"), col("low"), col("close"), col("volume"))
      .collect()
      .map(r => (r.getString(0), (r.getString(1),
        math.round(r.getDouble(2) * 100), math.round(r.getDouble(3) * 100),
        math.round(r.getDouble(4) * 100), math.round(r.getDouble(5) * 100),
        r.getLong(6))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap

  /** quant6 daily returns as micro-longs, keyed by (symbol, day) —
    * the dailyRet6 series: exact-decimal diff and prev-close doubles
    * (centsᵈ/100 is the correctly-rounded decimal→double conversion),
    * one division, shared FLOOR/CEIL sequence.
    */
  private lazy val ret6: Map[String, Array[(String, Long)]] =
    bars.map { case (sym, bs) =>
      sym -> bs.sliding(2).collect {
        case Array(p, c) if p._5 != 0L =>
          val dc = (c._5 - p._5).toDouble / 100.0
          val pc = p._5.toDouble / 100.0
          val s = dc / pc * 1000000.0
          (c._1, (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toLong)
      }.toArray
    }

  test("vwma matches a 20-tick exact-cents sliding recompute") {
    val ticks = Tables.ticks(spark, sf)
      .select(col("symbol"), col("ts"), col("event_id"), col("price"),
        col("volume"))
      .collect()
      .map { r =>
        val t = r.getTimestamp(1)
        val us = t.getTime / 1000L * 1000000L + t.getNanos / 1000L
        (r.getString(0), (us, r.getLong(2), math.round(r.getDouble(3) * 100),
          r.getLong(4)))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(t => (t._1, t._2)))
      .toMap
    val got = MarketOps.vwma(Tables.ticks(spark, sf), 20).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    var checked = 0
    for ((_, ts) <- ticks) {
      val n = ts.length
      for (i <- 0 until n) {
        val w = ts.slice(math.max(0, i - 19), i + 1)
        val pv = w.map(t => BigInt(t._3) * BigInt(t._4)).sum
        val v = w.map(_._4).sum
        val want =
          if (v == 0L) None
          else {
            // decimal(38,2) → double is the correctly-rounded value
            val pvD = new java.math.BigDecimal(pv.bigInteger, 2).doubleValue()
            Some(q6of(pvD / v.toDouble))
          }
        assert(got(ts(i)._2) === want, s"event ${ts(i)._2}")
        checked += 1
      }
    }
    assert(checked === got.size)
  }

  test("awesomeOsc equals the SMA5-SMA20 midpoint recompute from the 20th bar") {
    val got = MarketOps.awesomeOsc(Tables.ticks(spark, sf)).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getDouble(2))
      .toMap
    var want = 0
    for ((sym, bs) <- bars) {
      val hl = bs.map(b => b._3 + b._4)
      for (i <- bs.indices) {
        if (i >= 19) {
          val s5 = hl.slice(i - 4, i + 1).sum
          val s20 = hl.slice(i - 19, i + 1).sum
          val aw = new java.math.BigDecimal(s5).movePointLeft(2)
            .doubleValue() / 10.0 -
            new java.math.BigDecimal(s20).movePointLeft(2).doubleValue() / 40.0
          assert(got((sym, bs(i)._1)) === aw, s"$sym ${bs(i)._1}")
          want += 1
        } else assert(!got.contains((sym, bs(i)._1)), s"$sym warmup ${bs(i)._1}")
      }
    }
    assert(got.size === want)
    assert(want > 0, "test tape has no 20-bar symbol — widen it")
  }

  test("spearmanMatrix matches the rank recompute with the (return, day) tie policy") {
    val got = MarketOps.spearmanMatrix(Tables.ticks(spark, sf)).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val syms = ret6.keys.toSeq.sorted
    var pairs = 0
    for (ai <- syms.indices; bi <- (ai + 1) until syms.length) {
      val (sa, sb) = (syms(ai), syms(bi))
      val ma = ret6(sa).toMap
      val mb = ret6(sb).toMap
      val days = ma.keySet.intersect(mb.keySet).toSeq.sorted
      val n = days.length.toLong
      if (n > 1) {
        def ranks(m: Map[String, Long]): Map[String, Long] =
          days.sortBy(d => (m(d), d)).zipWithIndex
            .map { case (d, i) => d -> (i + 1L) }.toMap
        val (rka, rkb) = (ranks(ma), ranks(mb))
        val s2 = days.map { d =>
          val dd = rka(d) - rkb(d); dd * dd
        }.sum
        val rho = q4of(1.0 - (s2 * 6L).toDouble / (n * (n * n - 1L)).toDouble)
        assert(got((sa, sb)) === ((n, rho)), s"$sa/$sb")
        pairs += 1
      } else assert(!got.contains((sa, sb)), s"$sa/$sb degenerate")
    }
    assert(got.size === pairs)
    assert(pairs > 0)
    // sanity: every rho is in [-1, 1]
    got.values.foreach { case (_, rho) => assert(rho >= -1.0 && rho <= 1.0) }
  }

  test("tsi runs the documented four-state double-EMA recursion") {
    val got = MarketOps.tsi(Tables.ticks(spark, sf)).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    for ((sym, bs) <- bars) {
      val a25 = 2.0 / 26.0
      val a13 = 2.0 / 14.0
      var e1m = 0.0; var e2m = 0.0; var e1a = 0.0; var e2a = 0.0
      var first = true
      val want = bs.sliding(2).collect { case Array(p, c) =>
        val mom = (c._5 - p._5).toDouble / 100.0
        val am = math.abs(mom)
        if (first) { first = false; e1m = mom; e2m = mom; e1a = am; e2a = am }
        else {
          e1m = a25 * mom + (1.0 - a25) * e1m
          e2m = a13 * e1m + (1.0 - a13) * e2m
          e1a = a25 * am + (1.0 - a25) * e1a
          e2a = a13 * e1a + (1.0 - a13) * e2a
        }
        if (e2a != 0.0) 100.0 * e2m / e2a else 0.0
      }.toSeq
      assert(got.getOrElse(sym, Array.empty[Double]).toSeq === want, sym)
      // magnitude sanity: TSI is bounded by ±100 (|EMA(x)| <= EMA(|x|))
      want.foreach(v => assert(v >= -100.0 && v <= 100.0, s"$sym range"))
    }
  }

  test("omegaRatio matches exact gain/loss micro sums") {
    val got = MarketOps.omegaRatio(Tables.ticks(spark, sf)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))).toMap
    for ((sym, rs) <- ret6) {
      val gain = rs.map(_._2).filter(_ > 0).map(BigInt(_)).sum
      val loss = -rs.map(_._2).filter(_ < 0).map(BigInt(_)).sum
      val gd = new java.math.BigDecimal(gain.bigInteger, 6).doubleValue()
      val ld = new java.math.BigDecimal(loss.bigInteger, 6).doubleValue()
      val omega = if (loss != BigInt(0)) Some(gd / ld) else None
      if (rs.nonEmpty)
        assert(got(sym) === ((rs.length.toLong, gd, ld, omega)), sym)
      else assert(!got.contains(sym), sym)
    }
  }

  test("informationRatio matches the active-return stddev recompute") {
    // per-day cross-sectional quant6 mean over the ret6 series
    val byDay = ret6.toSeq.flatMap { case (sym, rs) =>
      rs.map { case (d, m) => (d, sym, m) }
    }.groupBy(_._1)
    val idx6: Map[String, Long] = byDay.map { case (d, rows) =>
      val s = new java.math.BigDecimal(
        rows.map(r => BigInt(r._3)).sum.bigInteger, 6).doubleValue()
      val v = s / rows.size.toDouble * 1000000.0
      d -> (if (v >= 0) math.floor(v + 0.5) else math.ceil(v - 0.5)).toLong
    }
    val got = MarketOps.informationRatio(Tables.ticks(spark, sf)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    for ((sym, rs) <- ret6 if rs.nonEmpty) {
      val as = rs.map { case (d, m) => BigInt(m - idx6(d)) }
      val n = as.length.toDouble
      val sa = new java.math.BigDecimal(as.sum.bigInteger, 6).doubleValue()
      val saa = new java.math.BigDecimal(
        as.map(a => a * a).sum.bigInteger, 12).doubleValue()
      val va = (saa - sa * sa / n) / (n - 1.0)
      val want =
        if (n > 1.0 && va > 0.0)
          Some(BigDecimal((sa / n) / math.sqrt(va))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
        else None
      assert(got(sym) === ((as.length.toLong, want)), sym)
    }
  }

  test("signAutocorr matches an exact integer recompute for lags 1..3") {
    val ticks = Tables.ticks(spark, sf)
      .select(col("symbol"), col("ts"), col("event_id"), col("price"))
      .collect()
      .map { r =>
        val t = r.getTimestamp(1)
        val us = t.getTime / 1000L * 1000000L + t.getNanos / 1000L
        (r.getString(0), (us, r.getLong(2), math.round(r.getDouble(3) * 100)))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(t => (t._1, t._2)))
      .toMap
    val got = MarketOps.signAutocorr(Tables.ticks(spark, sf)).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    var cells = 0
    for ((sym, ts) <- ticks) {
      val cents = ts.map(_._3)
      val signs = cents.indices.map { i =>
        if (i == 0) 0L
        else java.lang.Long.signum(cents(i) - cents(i - 1)).toLong
      }
      for (l <- 1 to 3) {
        val pairs = (l until signs.length)
          .map(i => (signs(i), signs(i - l)))
          .filter { case (a, b) => a != 0 && b != 0 }
        if (pairs.nonEmpty) {
          val dot = pairs.map { case (a, b) => a * b }.sum
          assert(got((sym, l.toLong)) ===
            ((pairs.length.toLong, dot.toDouble / pairs.length.toDouble)),
            s"$sym lag $l")
          cells += 1
        } else assert(!got.contains((sym, l.toLong)), s"$sym lag $l empty")
      }
    }
    assert(cells === got.size)
    assert(cells > 0)
  }

  test("candleAnatomy matches the quant6 share recompute; shares sum to ~1") {
    val got = MarketOps.candleAnatomy(Tables.ticks(spark, sf)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    for ((sym, bs) <- bars) {
      val live = bs.filter(b => b._3 > b._4)
      if (live.nonEmpty) {
        def q6m(num: Long, den: Long): Long = {
          val s = num.toDouble / den.toDouble * 1000000.0
          (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toLong
        }
        var sb = 0L; var su = 0L; var sl = 0L; var doji = 0L
        for ((_, o, h, l, c, _) <- live) {
          val rng = h - l
          val body = math.abs(c - o)
          val hi = math.max(o, c)
          val lo = math.min(o, c)
          sb += q6m(body, rng); su += q6m(h - hi, rng); sl += q6m(lo - l, rng)
          if (body * 20 <= rng) doji += 1
        }
        val n = live.length
        def mean(s: Long): Double =
          new java.math.BigDecimal(s).movePointLeft(6).doubleValue() /
            n.toDouble
        val (gn, gd, gb, gu, gl) = got(sym)
        assert((gn, gd) === ((n.toLong, doji)), sym)
        assert((gb, gu, gl) === ((mean(sb), mean(su), mean(sl))), sym)
        // anatomy sanity: the three shares partition the range
        assert(math.abs(gb + gu + gl - 1.0) < 0.001, s"$sym shares")
      } else assert(!got.contains(sym), sym)
    }
  }

  test("sessionCooccurrence matches a driver-side session recompute") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .collect()
      .map { r =>
        val t = r.getTimestamp(2)
        val us = t.getTime / 1000L * 1000000L + t.getNanos / 1000L
        (r.getLong(0), (us, r.getLong(1), r.getString(3)))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(t => (t._1, t._2)))
      .toMap
    val gapUs = 30L * 60L * 1000000L
    // session → distinct type set
    val sessTypes = evs.values.flatMap { es =>
      var out = Vector.empty[Set[String]]
      var cur = Set.empty[String]
      var lastUs = Long.MinValue
      var open = false
      for (e <- es) {
        if (!open || e._1 - lastUs > gapUs) {
          if (open) out :+= cur
          cur = Set(e._3); open = true
        } else cur += e._3
        lastUs = e._1
      }
      if (open) out :+= cur
      out
    }.toSeq
    val total = sessTypes.size.toLong
    val perType = sessTypes.flatten.groupBy(identity)
      .map { case (t, xs) => t -> xs.size.toLong }
    val types = perType.keys.toSeq.sorted
    val want = (for {
      ai <- types.indices; bi <- (ai + 1) until types.length
      nBoth = sessTypes.count(s => s(types(ai)) && s(types(bi))).toLong
      if nBoth > 0
    } yield (types(ai), types(bi)) -> ((nBoth, perType(types(ai)),
      perType(types(bi)),
      nBoth.toDouble * total.toDouble /
        (perType(types(ai)).toDouble * perType(types(bi)).toDouble)))).toMap
    val got = EventAnalytics.sessionCooccurrence(Tables.events(spark, sf))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("dedupImpact counts exact and near survivors per source") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val exactKeep = docs.groupBy(_._2).values.map(_.map(_._1).min).toSet
    // union-find over the LSH candidate pairs
    val pairs = graft.pipeline.Dedup.minhashCandidates(
        Tables.documents(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- pairs) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nearKeep = docs.map(_._1).filter(d => find(d) == d).toSet
    val want = docs.groupBy(_._3).map { case (src, ds) =>
      val n = ds.length.toLong
      val ex = ds.count(d => exactKeep(d._1)).toLong
      val nr = ds.count(d => nearKeep(d._1)).toLong
      src -> ((n, ex, nr, ex.toDouble / n.toDouble, nr.toDouble / n.toDouble))
    }
    val got = graft.pipeline.Dedup.dedupImpact(Tables.documents(spark, sf))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(got === want)
  }

  test("minhashCalibration buckets candidates by agreement with exact jaccard") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val cands = graft.pipeline.Dedup.minhashCandidates(
        Tables.documents(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 16).toLong))
    assert(cands.nonEmpty, "no LSH candidates on the test corpus")
    def sh(t: String): Set[String] =
      t.split(" ", -1).sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSet
    val jm = cands.map { case (a, b, m) =>
      val (sa, sb) = (sh(docs(a)), sh(docs(b)))
      val uni = (sa ++ sb).size
      val micro =
        if (uni > 0) {
          val r = sa.intersect(sb).size.toDouble / uni.toDouble * 1000000.0
          (if (r >= 0) math.floor(r + 0.5) else math.ceil(r - 0.5)).toLong
        } else 0L
      (m, micro)
    }
    val want = jm.groupBy(_._1).map { case (m, xs) =>
      val micros = xs.map(_._2)
      m -> ((xs.length.toLong, m.toDouble / 16,
        micros.sum.toDouble / 1000000.0 / xs.length.toDouble,
        micros.min.toDouble / 1000000.0, micros.max.toDouble / 1000000.0))
    }
    val got = graft.pipeline.Dedup.minhashCalibration(
        Tables.documents(spark, sf)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(got === want)
    // calibration sanity: the estimate is monotone in m by construction
    got.keys.foreach(m => assert(m >= 0 && m <= 16))
  }

  test("normHistogram matches the exact integer norm recompute") {
    val embs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val norm2s = embs.map { case (_, v) =>
      v.map { c =>
        val s = c.toDouble * 1000.0
        val q = (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toLong
        q * q
      }.sum
    }
    val want = norm2s.groupBy(_ / 1000L)
      .map { case (b, ns) => b -> ((ns.length.toLong, ns.min, ns.max)) }
    val got = graft.pipeline.Similarity.normHistogram(
        Tables.embeddings(spark, sf)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === want)
    assert(got.values.map(_._1).sum === embs.length.toLong)
  }

  test("anchoredVwap matches a day-anchored prefix recompute") {
    val ticks = Tables.ticks(spark, sf)
      .select(col("symbol"), to_date(col("ts")).cast("string").as("day"),
        col("ts"), col("event_id"), col("price"), col("volume"))
      .collect()
      .map { r =>
        val t = r.getTimestamp(2)
        val us = t.getTime / 1000L * 1000000L + t.getNanos / 1000L
        ((r.getString(0), r.getString(1)),
          (us, r.getLong(3), math.round(r.getDouble(4) * 100), r.getLong(5)))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(t => (t._1, t._2)))
      .toMap
    val got = MarketOps.anchoredVwap(Tables.ticks(spark, sf)).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    var checked = 0
    for ((_, ts) <- ticks) {
      var pv = BigInt(0)
      var v = 0L
      for (t <- ts) {
        pv += BigInt(t._3) * BigInt(t._4)
        v += t._4
        val want =
          if (v == 0L) None
          else Some(q6of(
            new java.math.BigDecimal(pv.bigInteger, 2).doubleValue() /
              v.toDouble))
        assert(got(t._2) === want, s"event ${t._2}")
        checked += 1
      }
    }
    assert(checked === got.size)
  }

  test("markovStationary runs two exact power-iteration rounds") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .collect()
      .map { r =>
        val t = r.getTimestamp(2)
        val us = t.getTime / 1000L * 1000000L + t.getNanos / 1000L
        (r.getLong(0), (us, r.getLong(1), r.getString(3)))
      }
    val k = evs.map(_._2._3).distinct.length.toDouble
    val pairs = evs.groupBy(_._1).values.flatMap { g =>
      g.map(_._2).sortBy(t => (t._1, t._2)).map(_._3).sliding(2).collect {
        case Array(a, b) => (a, b)
      }
    }.toSeq
    val counts: Map[(String, String), Long] =
      pairs.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rowSums = counts.groupBy(_._1._1).view
      .mapValues(_.values.sum).toMap
    // p6 in exact micro-units (long)
    val p6: Map[(String, String), Long] = counts.map { case ((f, t), n) =>
      val s = n.toDouble / rowSums(f).toDouble * 1000000.0
      (f, t) -> (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toLong
    }
    val toTypes = p6.keys.map(_._2).toSeq.distinct.sorted
    val u1: Map[String, BigInt] = toTypes.map { t =>
      t -> p6.collect { case ((_, tt), m) if tt == t => BigInt(m) }.sum
    }.toMap
    // v2 in exact 1e-12 units: Σ u1(from)·p6(from→to)
    val v2: Map[String, BigInt] = toTypes.map { t =>
      t -> p6.collect { case ((f, tt), m) if tt == t =>
        u1.getOrElse(f, BigInt(0)) * BigInt(m)
      }.sum
    }.toMap
    val got = EventAnalytics.markovStationary(Tables.events(spark, sf))
      .collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got.keySet === toTypes.toSet)
    for (t <- toTypes) {
      val p1 = new java.math.BigDecimal(u1(t).bigInteger, 6).doubleValue() / k
      val p2 = new java.math.BigDecimal(v2(t).bigInteger, 12).doubleValue() / k
      assert(got(t) === ((p1, p2)), t)
    }
    // a row-stochastic chain keeps total mass ~1 (quant error aside;
    // absorbing states may leak) — the magnitude/semantic gate
    assert(got.values.map(_._1).sum <= 1.000001)
    assert(got.values.map(_._2).sum <= 1.000001)
    assert(got.values.map(_._1).sum > 0.5)
  }

  test("readability matches an independent per-doc recompute") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val got = graft.pipeline.TextOps.readability(
        Tables.documents(spark, sf)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5))))).toMap
    assert(got.size === docs.length)
    val sentRe = "[.!?]+".r
    val sylRe = "[aeiouy]+".r
    for ((id, text) <- docs) {
      // Spark split(str, p) == Java split(p, -1): "" yields [""]
      val w = text.trim.split("[ \\t\\n\\r\\f\\x0B]+", -1).length.toLong
      val s = sentRe.findAllIn(text).length.toLong
      val syl = sylRe.findAllIn(text.toLowerCase).length.toLong
      val (fl, fk) =
        if (w > 0 && s > 0) {
          val wps = w.toDouble / s.toDouble
          val spw = syl.toDouble / w.toDouble
          (Some(206.835 - 1.015 * wps - 84.6 * spw),
            Some(0.39 * wps + 11.8 * spw - 15.59))
        } else (None, None)
      assert(got(id) === ((w, s, syl, fl, fk)), s"doc $id")
    }
  }

  test("wordLenHist matches a driver-side split recompute") {
    val docs = Tables.documents(spark, sf)
      .select(col("text")).collect().map(_.getString(0))
    val want = docs.flatMap(_.trim.split("[ \\t\\n\\r\\f\\x0B]+", -1))
      .filter(_.nonEmpty).groupBy(_.length.toLong)
      .view.mapValues(_.length.toLong).toMap
    val got = graft.pipeline.TextOps.wordLenHist(
        Tables.documents(spark, sf)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want)
  }

  test("entryExit matches a sessionized recompute; entries == exits == sessions") {
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .collect()
      .map { r =>
        val t = r.getTimestamp(2)
        val us = t.getTime / 1000L * 1000000L + t.getNanos / 1000L
        (r.getLong(0), (us, r.getLong(1), r.getString(3)))
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(t => (t._1, t._2)))
      .toMap
    val gapUs = 30L * 60L * 1000000L
    var entries = Map.empty[String, Long].withDefaultValue(0L)
    var exits = Map.empty[String, Long].withDefaultValue(0L)
    var bounces = Map.empty[String, Long].withDefaultValue(0L)
    var nSessions = 0L
    for ((_, es) <- evs) {
      var sess = Vector.empty[Vector[(Long, Long, String)]]
      for (e <- es) {
        if (sess.isEmpty || e._1 - sess.last.last._1 > gapUs)
          sess :+= Vector(e)
        else sess = sess.init :+ (sess.last :+ e)
      }
      for (s <- sess) {
        nSessions += 1
        val entry = s.minBy(t => (t._1, t._2))._3
        val exit = s.maxBy(t => (t._1, t._2))._3
        entries += entry -> (entries(entry) + 1)
        exits += exit -> (exits(exit) + 1)
        if (s.length == 1) bounces += entry -> (bounces(entry) + 1)
      }
    }
    val got = EventAnalytics.entryExit(
        Tables.events(spark, sf)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val types = entries.keySet ++ exits.keySet
    assert(got.keySet === types)
    for (t <- types)
      assert(got(t) === ((entries(t), exits(t), bounces(t))), t)
    assert(got.values.map(_._1).sum === nSessions)
    assert(got.values.map(_._2).sum === nSessions)
  }

  test("vwma zero-volume windows emit NULL (ANSI guard)") {
    import spark.implicits._
    val t = Seq(
      (1L, "Z", java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), 5.0, 0L),
      (2L, "Z", java.sql.Timestamp.valueOf("2024-01-01 10:00:01"), 6.0, 0L),
      (3L, "Z", java.sql.Timestamp.valueOf("2024-01-01 10:00:02"), 7.0, 3L)
    ).toDF("event_id", "symbol", "ts", "price", "volume")
    val rows = MarketOps.vwma(t, 2).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(rows(1L) === None)
    assert(rows(2L) === None)
    assert(rows(3L) === Some(7.0))
  }
}
