package graft.operators

import java.math.{BigDecimal => JBD}
import java.time.LocalDate

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables
import graft.pipeline.TextOps

/** Semantic contracts of the r9b operators (Williams %R, ROC, streak
  * census, time underwater, day-of-week returns, RFM, last-touch
  * attribution, char-class profile) against independent driver-side
  * recomputations over the collected sf0.001 rows — small enough that
  * a plain Scala reimplementation is an honest oracle.
  */
class NewOpsR9bSpec extends AnyFunSuite {
  import TestSpark._

  /** Per symbol: ticks sorted by (ts_us, event_id) as exact decimals. */
  private lazy val tape: Map[String, Vector[(Long, Long, JBD)]] =
    Tables.ticks(spark, sf)
      .select(col("symbol"), unix_micros(col("ts")).as("tus"), col("event_id"),
        col("price").cast("decimal(18,2)"))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getDecimal(3))))
      .groupBy(_._1).view
      .mapValues(_.map(_._2).sortBy(t => (t._1, t._2)).toVector)
      .toMap.map(identity)

  /** (symbol → days sorted, close decimals) via the OHLC close rule. */
  private lazy val bars: Map[String, Vector[(String, JBD)]] =
    MarketOps.ohlcDaily(Tables.ticks(spark, sf))
      .select(col("symbol"), col("day").cast("string"),
        col("close").cast("decimal(18,2)"))
      .collect()
      .map(r => (r.getString(0), (r.getString(1), r.getDecimal(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toVector)
      .toMap.map(identity)

  private def quant6(x: Double): JBD = {
    val s = x * 1000000.0
    val q = if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)
    new JBD(q.toLong).movePointLeft(6)
  }

  test("williamsR: matches the windowed recomputation; bounded [-100, 0]") {
    val got = MarketOps.williamsR(Tables.ticks(spark, sf), 14)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got.nonEmpty)
    for ((_, ts) <- tape; i <- ts.indices) {
      val w = ts.slice(math.max(0, i - 13), i + 1).map(_._3)
      val hh = w.max; val ll = w.min
      val want =
        if (hh.compareTo(ll) > 0)
          Some(-100.0 * hh.subtract(ts(i)._3).doubleValue /
            hh.subtract(ll).doubleValue)
        else None
      assert(got(ts(i)._2) === want, s"event ${ts(i)._2}")
      // the single IEEE divide can land 1 ulp past the exact −100
      want.foreach(v => assert(v >= -100.0 - 1e-9 && v <= 0.0))
    }
  }

  test("roc: matches the lagged recomputation") {
    val got = MarketOps.roc(Tables.ticks(spark, sf), 10)
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    for ((_, ts) <- tape; i <- ts.indices) {
      val want =
        if (i >= 10 && ts(i - 10)._3.signum != 0)
          Some(ts(i)._3.subtract(ts(i - 10)._3).doubleValue /
            ts(i - 10)._3.doubleValue * 100.0)
        else None
      assert(got(ts(i)._2) === want, s"event ${ts(i)._2}")
    }
  }

  test("streaks: census equals a sequential run scan; lengths partition the days") {
    val got = MarketOps.streaks(Tables.ticks(spark, sf))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
      .toMap
    val want = scala.collection.mutable.Map[(String, Long, Long), Long]()
    for ((sym, bs) <- bars) {
      val dirs = bs.indices.drop(1).map { i =>
        val c = bs(i)._2.compareTo(bs(i - 1)._2)
        if (c > 0) 1L else if (c < 0) -1L else 0L
      }
      var i = 0
      while (i < dirs.length) {
        var j = i
        while (j + 1 < dirs.length && dirs(j + 1) == dirs(i)) j += 1
        val k = (sym, dirs(i), (j - i + 1).toLong)
        want(k) = want.getOrElse(k, 0L) + 1L
        i = j + 1
      }
    }
    assert(got === want.toMap)
    // run lengths × counts reconstruct every transition day
    for ((sym, bs) <- bars) {
      val total = got.collect { case ((s, _, len), n) if s == sym => len * n }.sum
      assert(total === (bs.length - 1).max(0), sym)
    }
  }

  test("underwater: days since the latest running-max day") {
    val got = MarketOps.underwater(Tables.ticks(spark, sf))
      .collect()
      .map(r => ((r.getString(0), r.getDate(1).toString), r.getLong(2))).toMap
    for ((sym, bs) <- bars) {
      var mx: JBD = null
      var peak: LocalDate = null
      for ((d, c) <- bs) {
        val day = LocalDate.parse(d)
        if (mx == null || c.compareTo(mx) > 0) { mx = c; peak = day }
        else if (c.compareTo(mx) == 0) peak = day // latest peak wins
        val want = java.time.temporal.ChronoUnit.DAYS.between(peak, day)
        assert(got((sym, d)) === want, s"$sym $d")
      }
    }
  }

  test("dowReturns: mean quant6 return per ISO weekday") {
    val got = MarketOps.dowReturns(Tables.ticks(spark, sf))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    val acc = scala.collection.mutable.Map[(String, Long), (Long, JBD)]()
    for ((sym, bs) <- bars; i <- 1 until bs.length
         if bs(i - 1)._2.signum != 0) {
      val r = quant6(bs(i)._2.subtract(bs(i - 1)._2).doubleValue /
        bs(i - 1)._2.doubleValue)
      val dow = LocalDate.parse(bs(i)._1).getDayOfWeek.getValue.toLong
      val (n, s) = acc.getOrElse((sym, dow), (0L, JBD.ZERO))
      acc((sym, dow)) = (n + 1, s.add(r))
    }
    assert(got.keySet === acc.keySet)
    for ((k, (n, s)) <- acc) {
      assert(got(k)._1 === n, k)
      assert(got(k)._2 === s.doubleValue / n.toDouble, k)
    }
  }

  test("rfm: recency/frequency/monetary against a sequential recompute") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"),
        col("value").cast("decimal(12,2)"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDecimal(2)))
    val refDay = LocalDate.parse(events.map(_._2).max)
    val got = EventAnalytics.rfm(Tables.events(spark, sf))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    val byUser = events.groupBy(_._1)
    assert(got.keySet === byUser.keySet)
    for ((u, es) <- byUser) {
      val last = LocalDate.parse(es.map(_._2).max)
      val mon = es.map(_._3).foldLeft(JBD.ZERO)(_.add(_))
      val want = (java.time.temporal.ChronoUnit.DAYS.between(last, refDay),
        es.length.toLong, mon.doubleValue)
      assert(got(u) === want, s"user $u")
    }
  }

  test("attribution: conversion counts equal a per-user sequential walk") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = scala.collection.mutable.Map[String, Long]()
    for ((_, es) <- events.groupBy(_._1)) {
      var lastTouch: String = null
      for ((_, _, _, tpe) <- es.sortBy(e => (e._2, e._3))) {
        if (tpe == "purchase") {
          if (lastTouch != null)
            want(lastTouch) = want.getOrElse(lastTouch, 0L) + 1L
        } else lastTouch = tpe
      }
    }
    val got = EventAnalytics.attribution(Tables.events(spark, sf))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === want.toMap)
  }

  test("charClassProfile: ratios equal exact per-source character counts") {
    val docs = Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"), col("text"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    def cnt(t: String, p: Char => Boolean): Long = t.count(p).toLong
    val got = TextOps.charClassProfile(Tables.documents(spark, sf))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    for ((src, ds) <- docs.groupBy(_._1)) {
      val total = ds.map(_._2).sum
      val nu = ds.map(d => cnt(d._3, c => c >= 'A' && c <= 'Z')).sum
      val nd = ds.map(d => cnt(d._3, c => c >= '0' && c <= '9')).sum
      val np = ds.map(d => cnt(d._3,
        c => (c >= '!' && c <= '/') || (c >= ':' && c <= '@'))).sum
      def ratio(n: Long): Double =
        BigDecimal(n.toDouble / total.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(src) === ((ds.length.toLong, total,
        ratio(nu), ratio(nd), ratio(np))), src)
    }
  }
}
