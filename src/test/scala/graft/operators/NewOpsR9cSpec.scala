package graft.operators

import java.math.{BigDecimal => JBD}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables
import graft.pipeline.TextOps

/** Semantic contracts of the r9c operators (drawdown episodes, market
  * index, PII density, sentence stats, compression ratio, code-prose)
  * against driver-side recomputations over the collected sf0.001 rows.
  */
class NewOpsR9cSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val bars: Map[String, Vector[(String, JBD)]] =
    MarketOps.ohlcDaily(Tables.ticks(spark, sf))
      .select(col("symbol"), col("day").cast("string"),
        col("close").cast("decimal(18,2)"))
      .collect()
      .map(r => (r.getString(0), (r.getString(1), r.getDecimal(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toVector)
      .toMap.map(identity)

  /** The shared 6-dp float-op quantization (SURVEY §4). */
  private def quant6(x: Double): JBD = {
    val s = x * 1000000.0
    val q = if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)
    new JBD(q.toLong).movePointLeft(6)
  }

  private lazy val docs: Array[(Long, String, String, Long)] =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"), col("n_chars"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))

  test("drawdownEpisodes: episodes partition the days; depths verified sequentially") {
    val got = MarketOps.drawdownEpisodes(Tables.ticks(spark, sf), 3)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getDate(2).toString, r.getDate(3).toString, r.getDate(4).toString,
          r.getLong(5), r.getDouble(6))))
      .toMap
    assert(got.nonEmpty)
    for ((sym, bs) <- bars) {
      // sequential episode reconstruction: split on running-max value
      var mx: JBD = null
      val eps = scala.collection.mutable.ArrayBuffer
        .empty[scala.collection.mutable.ArrayBuffer[(String, JBD)]]
      for ((d, c) <- bs) {
        if (mx == null || c.compareTo(mx) > 0) {
          mx = c; eps += scala.collection.mutable.ArrayBuffer((d, c))
        } else eps.last += ((d, c))
      }
      val want = eps.toVector.flatMap { e =>
        val peak = e.head._2
        val minc = e.map(_._2).min
        if (minc.compareTo(peak) < 0 && peak.signum != 0) {
          val depth = minc.subtract(peak).doubleValue / peak.doubleValue
          val trough = e.find(_._2.compareTo(minc) == 0).get._1
          Some((e.head._1, trough, e.last._1, e.length.toLong, depth))
        } else None
      }.sortBy(e => (e._5, e._1)).take(3)
      want.zipWithIndex.foreach { case (w, i) =>
        assert(got((sym, i + 1L)) === w, s"$sym rank ${i + 1}")
      }
      assert(!got.contains((sym, want.length + 1L)), sym)
    }
  }

  test("marketIndex: first day at 100 when nonzero; mean equals recompute") {
    val byDay = bars.values.flatten.groupBy(_._1).view
      .mapValues(_.map(_._2).toVector).toMap
    val got = MarketOps.marketIndex(Tables.ticks(spark, sf))
      .collect()
      .map(r => (r.getDate(0).toString,
        (r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got.keySet === byDay.keySet)
    val firstDay = byDay.keys.min
    val base = {
      val cs = byDay(firstDay)
      cs.foldLeft(JBD.ZERO)(_.add(_)).doubleValue / cs.length.toDouble
    }
    for ((d, cs) <- byDay) {
      val mean = cs.foldLeft(JBD.ZERO)(_.add(_)).doubleValue / cs.length.toDouble
      val idx = if (base != 0.0) Some(mean / base * 100.0) else None
      assert(got(d) === ((cs.length.toLong, mean, idx)), d)
    }
    if (base != 0.0) assert(got(firstDay)._3 === Some(100.0))
  }

  test("piiDensity: counts match Scala regex scans") {
    val got = TextOps.piiDensity(Tables.documents(spark, sf))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val url = "https?://[^ ]+".r
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    val ip = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b".r
    for ((id, _, text, _) <- docs) {
      val want = (url.findAllIn(text).size.toLong,
        email.findAllIn(text).size.toLong,
        ip.findAllIn(text).size.toLong)
      assert(got(id) === want, s"doc $id")
    }
  }

  test("sentenceStats: counts match Scala regex scans; ratio reconstructs") {
    val got = TextOps.sentenceStats(Tables.documents(spark, sf))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    val term = "[.!?]+".r
    for ((id, _, text, _) <- docs) {
      val ns = term.findAllIn(text).size.toLong
      // Spark/DuckDB trim() strip SPACES only (not Java trim)
      val spaceTrimmed = text.dropWhile(_ == ' ')
        .reverse.dropWhile(_ == ' ').reverse
      val nw = spaceTrimmed.split("[ \\t\\n\\r\\f\\x0B]+", -1).length.toLong
      val ratio = if (ns != 0)
        Some(BigDecimal(nw.toDouble / ns.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      else None
      assert(got(id) === ((ns, nw, ratio)), s"doc $id")
    }
  }

  test("compressionRatio: aggregates reconstruct from tokenCount") {
    val tc = TextOps.tokenCount(Tables.documents(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .map(t => t._1 -> (t._2, t._3)).toMap
    val got = TextOps.compressionRatio(Tables.documents(spark, sf))
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    for ((src, ds) <- docs.groupBy(_._2)) {
      val chars = ds.map(_._4).sum
      val ws = ds.map(d => tc(d._1)._1).sum
      val bpe = ds.map(d => tc(d._1)._2).sum
      def r6(n: Long, d: Long): Double =
        BigDecimal(n.toDouble / d.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(src) === ((ds.length.toLong, chars, ws, bpe,
        r6(chars, ws), r6(chars, bpe))), src)
    }
  }

  test("editDistanceBanded: equals the full distance under the cutoff, -1 above") {
    val d = Tables.documents(spark, sf)
    val pairs = d.select(col("doc_id").as("doc_a"),
      (col("doc_id") + 1).as("doc_b"))
    val full = TextOps.editDistance(pairs, d)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val banded = TextOps.editDistanceBanded(pairs, d, 64)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(banded.keySet === full.keySet)
    assert(banded.nonEmpty)
    for ((k, v) <- full)
      assert(banded(k) === (if (v <= 64) v else -1L), k)
    // the cutoff actually bites on this corpus (both branches covered)
    assert(banded.values.exists(_ == -1L) && banded.values.exists(_ >= 0L))
  }

  test("codeProse: flag equals the exact integer threshold") {
    val got = TextOps.codeProse(Tables.documents(spark, sf))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(3)))).toMap
    for ((id, _, text, nChars) <- docs) {
      val n = text.count(c => "{}()[];=<>".contains(c)).toLong
      assert(got(id) === ((n, if (n * 50 >= nChars) 1L else 0L)), s"doc $id")
    }
  }

  test("abnormalVolume: emitted set equals the per-symbol z recompute") {
    val vols = MarketOps.ohlcDaily(Tables.ticks(spark, sf))
      .select(col("symbol"), col("day").cast("string"), col("volume"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val got = MarketOps.abnormalVolume(Tables.ticks(spark, sf), 2.0)
      .collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getLong(2), r.getDouble(3)))).toMap
    val want = scala.collection.mutable.Map[(String, String), (Long, Double)]()
    for ((sym, ds) <- vols.groupBy(_._1)) {
      val n = ds.length.toDouble
      val s = ds.map(d => new JBD(d._3)).foldLeft(JBD.ZERO)(_.add(_)).doubleValue
      val sq = ds.map(d => new JBD(d._3).multiply(new JBD(d._3)))
        .foldLeft(JBD.ZERO)(_.add(_)).doubleValue
      if (n > 1.0) {
        val sd = math.sqrt((sq - (s * s) / n) / (n - 1.0))
        if (sd > 0 && !sd.isNaN) {
          for ((_, day, v) <- ds) {
            val z = BigDecimal((v.toDouble - s / n) / sd)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            if (math.abs(z) >= 2.0) want((sym, day)) = (v, z)
          }
        }
      }
    }
    assert(got === want.toMap)
  }

  test("volumeCurve: shares sum to 1 per symbol and match the recompute") {
    val ticksRaw = Tables.ticks(spark, sf)
      .select(col("symbol"), hour(col("ts")).cast("long"), col("volume"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = MarketOps.volumeCurve(Tables.ticks(spark, sf))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    for ((sym, ts) <- ticksRaw.groupBy(_._1)) {
      val total = ts.map(_._3).sum
      for ((hod, hs) <- ts.groupBy(_._2)) {
        val hv = hs.map(_._3).sum
        val share = if (total != 0) Some(hv.toDouble / total.toDouble) else None
        assert(got((sym, hod)) === ((hv, share)), s"$sym $hod")
      }
      if (total != 0) {
        val s = got.collect { case ((sy, _), (_, Some(sh))) if sy == sym => sh }.sum
        assert(math.abs(s - 1.0) < 1e-9, sym)
      }
    }
  }

  test("momentumQuartiles: equals a sequential rank-and-cut recompute") {
    import java.time.{DayOfWeek, LocalDate}
    import java.time.temporal.TemporalAdjusters
    def weekOf(d: String): LocalDate =
      LocalDate.parse(d).`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
    // weekly close = last trading day's close; weekly quant6 return;
    // signal = previous week's return
    val perSym = bars.map { case (sym, bs) =>
      val weekly = bs.groupBy(b => weekOf(b._1)).toVector.sortBy(_._1)
        .map { case (w, ds) => (w, ds.maxBy(_._1)._2) }
      val rows = for (i <- 1 until weekly.length
                      if weekly(i - 1)._2.signum != 0) yield {
        val r = quant6(weekly(i)._2.subtract(weekly(i - 1)._2).doubleValue /
          weekly(i - 1)._2.doubleValue)
        (weekly(i)._1, r)
      }
      sym -> rows.toVector
    }
    // (week, symbol, r, sig) — sig is the previous RETURN ROW (row
    // lag, matching the operator's lag(r, 1), not calendar adjacency)
    val ranked = perSym.toVector.flatMap { case (sym, rows) =>
      rows.indices.drop(1).map(i => (rows(i)._1, sym, rows(i)._2, rows(i - 1)._2))
    }
    val want = ranked.groupBy(_._1).map { case (w, rows) =>
      val sorted = rows.sortBy { case (_, sym, _, sig) =>
        (scala.math.BigDecimal(sig).unary_-, sym)
      }
      val n = sorted.length
      val base = n / 4; val rem = n % 4
      val qs = sorted.zipWithIndex.map { case (row, i) =>
        // standard ntile: first rem buckets take base+1 rows
        var acc = 0; var q = 0
        var found = 0
        for (b <- 1 to 4 if found == 0) {
          val sz = base + (if (b <= rem) 1 else 0)
          if (i < acc + sz) { q = b; found = 1 } else acc += sz
        }
        (row, q)
      }
      def mean(sel: Int): Option[Double] = {
        val rs = qs.collect { case ((_, _, r, _), q) if q == sel => r }
        if (rs.isEmpty) None
        else Some(rs.foldLeft(JBD.ZERO)(_.add(_)).doubleValue / rs.length.toDouble)
      }
      w.toString -> ((n.toLong, mean(1), mean(4)))
    }
    val got = MarketOps.momentumQuartiles(Tables.ticks(spark, sf))
      .collect()
      .map(r => (r.getDate(0).toString, (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(got.keySet === want.keySet)
    assert(got.nonEmpty)
    for ((w, v) <- want) assert(got(w) === v, w)
  }

  test("turnoverRank: ranks exact notional sums; shares sum to 1") {
    val t = Tables.ticks(spark, sf)
      .select(col("symbol"), col("price").cast("decimal(18,2)"), col("volume"))
      .collect().map(r => (r.getString(0), r.getDecimal(1), r.getLong(2)))
    val notional = t.groupBy(_._1).view.mapValues(ts =>
      (ts.map(x => x._2.multiply(new JBD(x._3))).foldLeft(JBD.ZERO)(_.add(_)),
        ts.length.toLong)).toMap
    val total = notional.values.map(_._1).foldLeft(JBD.ZERO)(_.add(_))
    val wantOrder = notional.toSeq
      .sortBy { case (sym, (n, _)) => (-n.doubleValue, sym) }
    val got = MarketOps.turnoverRank(Tables.ticks(spark, sf))
      .collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getLong(2), r.getDouble(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)))))
      .sortBy(_._1)
    assert(got.length === notional.size)
    got.zip(wantOrder).zipWithIndex.foreach {
      case (((rk, (sym, n, turn, share)), (wSym, (wNot, wN))), i) =>
        assert(rk === i + 1L)
        assert(sym === wSym)
        assert(n === wN)
        assert(turn === wNot.doubleValue)
        if (total.signum != 0)
          assert(share === Some(wNot.doubleValue / total.doubleValue))
    }
    val shareSum = got.flatMap(_._2._4).sum
    assert(math.abs(shareSum - 1.0) < 1e-9)
  }

  test("lengthHistogram: buckets equal the bit-length recompute") {
    val got = TextOps.lengthHistogram(Tables.documents(spark, sf))
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val want = docs.groupBy(d => (d._2,
        (63 - java.lang.Long.numberOfLeadingZeros(math.max(d._4, 1))).toLong))
      .map { case (k, ds) =>
        k -> ((ds.length.toLong, ds.map(_._4).min, ds.map(_._4).max)) }
    assert(got === want)
  }

  test("activeUsers: exact distinct counts at each grain") {
    import java.time.{DayOfWeek, LocalDate}
    import java.time.temporal.TemporalAdjusters
    val du = Tables.events(spark, sf)
      .select(to_date(col("ts")).cast("string"), col("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).distinct
    def weekOf(d: String) = LocalDate.parse(d)
      .`with`(TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
    def monthOf(d: String) = LocalDate.parse(d).withDayOfMonth(1)
    val dau = du.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val wau = du.map { case (d, u) => (weekOf(d), u) }.distinct
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val mau = du.map { case (d, u) => (monthOf(d), u) }.distinct
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val got = EventAnalytics.activeUsers(Tables.events(spark, sf))
      .collect()
      .map(r => (r.getDate(0).toString,
        (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === dau.keySet)
    for ((d, (a, w, m)) <- got) {
      assert(a === dau(d), s"dau $d")
      assert(w === wau(weekOf(d)), s"wau $d")
      assert(m === mau(monthOf(d)), s"mau $d")
      assert(a <= w && w <= m, d)
    }
  }

  test("topPaths: equals a sequential path census top-20") {
    val events = Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val counts = scala.collection.mutable.Map[String, Long]()
    for ((_, es) <- events.groupBy(_._1)) {
      val seq = es.sortBy(e => (e._2, e._3)).map(_._4)
      for (w <- seq.sliding(3) if w.length == 3) {
        val p = w.mkString(">")
        counts(p) = counts.getOrElse(p, 0L) + 1L
      }
    }
    val want = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = EventAnalytics.topPaths(Tables.events(spark, sf), 20)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === want)
  }
}
