package graft.operators

import java.math.{BigDecimal => JBD}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Semantic contracts of the r9 operators: the daily-bar indicator
  * family (MFI/CMF/CCI/Ulcer/variance-ratio/Ichimoku) against
  * independent driver-side recomputations over the collected daily
  * bars (sf0.001 → 150 bars, so a plain Scala reimplementation is an
  * honest oracle), and the pipeline pair (mojibake, bigram novelty)
  * against hand-built fixtures with known answers.
  */
class NewOpsR9Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val ticks = Tables.ticks(spark, sf)

  /** (symbol, day, h, l, c, vol) sorted, as exact BigDecimals. */
  private lazy val bars: Map[String, Vector[(String, JBD, JBD, JBD, Long)]] =
    MarketOps.ohlcDaily(ticks)
      .select(col("symbol"), col("day").cast("string"),
        col("high").cast("decimal(18,2)"), col("low").cast("decimal(18,2)"),
        col("close").cast("decimal(18,2)"), col("volume"))
      .collect()
      .map(r => (r.getString(0), (r.getString(1), r.getDecimal(2),
        r.getDecimal(3), r.getDecimal(4), r.getLong(5))))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1).toVector)
      .toMap.map(identity)

  /** The shared 6-dp float-op quantization (SURVEY §4). */
  private def quant6(x: Double): JBD = {
    val s = x * 1000000.0
    val q = if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)
    new JBD(q.toLong).movePointLeft(6)
  }

  test("mfi: matches a driver-side recomputation; bounded [0, 100]") {
    val got = MarketOps.mfi(ticks, 14)
      .select(col("symbol"), col("day").cast("string"), col("mfi14"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(got.nonEmpty)
    for ((sym, bs) <- bars) {
      val hlc = bs.map(b => b._2.add(b._3).add(b._4))
      val flow = bs.indices.map(i => hlc(i).multiply(new JBD(bs(i)._5)))
      for (i <- bs.indices) {
        val w = math.max(0, i - 13) to i
        var pos = JBD.ZERO; var neg = JBD.ZERO
        for (j <- w; if j > 0) {
          val cmp = hlc(j).compareTo(hlc(j - 1))
          if (cmp > 0) pos = pos.add(flow(j))
          else if (cmp < 0) neg = neg.add(flow(j))
        }
        val tot = pos.add(neg)
        val want =
          if (tot.signum() == 0) None
          else Some(BigDecimal(100.0 * pos.doubleValue / tot.doubleValue)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        val g = got((sym, bs(i)._1))
        assert(g === want, s"$sym ${bs(i)._1}")
        g.foreach(v => assert(v >= 0.0 && v <= 100.0))
      }
    }
  }

  test("cmf: matches a driver-side recomputation; bounded [-1, 1]") {
    val got = MarketOps.cmf(ticks, 20)
      .select(col("symbol"), col("day").cast("string"), col("cmf20"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    for ((sym, bs) <- bars) {
      val mfm6 = bs.map { case (_, h, l, c, _) =>
        val den = h.subtract(l)
        if (den.signum() == 0) JBD.ZERO
        else quant6(c.multiply(new JBD(2)).subtract(h).subtract(l).doubleValue /
          den.doubleValue)
      }
      for (i <- bs.indices) {
        val w = math.max(0, i - 19) to i
        var sf = JBD.ZERO; var sv = 0L
        for (j <- w) { sf = sf.add(mfm6(j).multiply(new JBD(bs(j)._5))); sv += bs(j)._5 }
        val want =
          if (sv == 0) None
          else Some(BigDecimal(sf.doubleValue / sv.toDouble)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        val g = got((sym, bs(i)._1))
        assert(g === want, s"$sym ${bs(i)._1}")
        g.foreach(v => assert(v >= -1.0 && v <= 1.0))
      }
    }
  }

  test("cci: matches a driver-side recomputation of the rescaled identity") {
    val got = MarketOps.cci(ticks, 20)
      .select(col("symbol"), col("day").cast("string"), col("cci20"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    for ((sym, bs) <- bars) {
      val hlc = bs.map(b => b._2.add(b._3).add(b._4))
      for (i <- bs.indices) {
        val w = math.max(0, i - 19) to i
        val m = new JBD(w.size)
        val s = w.map(hlc).foldLeft(JBD.ZERO)(_.add(_))
        val d = w.map(j => hlc(j).multiply(m).subtract(s).abs())
          .foldLeft(JBD.ZERO)(_.add(_))
        val want =
          if (d.signum() == 0) None
          else Some(hlc(i).multiply(m).subtract(s).multiply(m).doubleValue /
            d.multiply(new JBD(3)).doubleValue * 200.0)
        assert(got((sym, bs(i)._1)) === want, s"$sym ${bs(i)._1}")
      }
    }
  }

  test("ulcer: matches a driver-side recomputation; non-negative") {
    val got = MarketOps.ulcerIndex(ticks, 14)
      .select(col("symbol"), col("day").cast("string"), col("ulcer14"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    for ((sym, bs) <- bars) {
      val closes = bs.map(_._4)
      val r6: Vector[Option[JBD]] = closes.indices.toVector.map { i =>
        val w = math.max(0, i - 13) to i
        val mx = w.map(closes).max
        if (mx.signum() == 0) None
        else Some(quant6(closes(i).subtract(mx).doubleValue / mx.doubleValue))
      }
      for (i <- closes.indices) {
        val w = math.max(0, i - 13) to i
        val sqs = w.flatMap(r6(_)).map(q => q.multiply(q))
        val want =
          if (sqs.isEmpty) None
          else Some(100.0 * math.sqrt(
            sqs.foldLeft(JBD.ZERO)(_.add(_)).doubleValue / sqs.size.toDouble))
        val g = got((sym, bs(i)._1))
        assert(g === want, s"$sym ${bs(i)._1}")
        g.foreach(v => assert(v >= 0.0))
      }
    }
  }

  test("varianceRatio: matches a driver-side recomputation; VR > 0") {
    val got = MarketOps.varianceRatio(ticks, 5)
      .select(col("symbol"), col("n_days"), col("vr5"))
      .collect()
      .map(r => (r.getString(0),
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    for ((sym, bs) <- bars) {
      val closes = bs.map(_._4)
      val r = closes.indices.drop(1).collect {
        case i if closes(i - 1).signum() != 0 =>
          quant6(closes(i).subtract(closes(i - 1)).doubleValue /
            closes(i - 1).doubleValue)
      }.toVector
      if (r.nonEmpty) {
        val rq = (4 until r.size).map(i =>
          r.slice(i - 4, i + 1).foldLeft(JBD.ZERO)(_.add(_))).toVector
        val n1 = r.size.toDouble
        val s1 = r.foldLeft(JBD.ZERO)(_.add(_)).doubleValue
        val s2 = r.map(x => x.multiply(x)).foldLeft(JBD.ZERO)(_.add(_)).doubleValue
        val nq = rq.size.toDouble
        val t1 = rq.foldLeft(JBD.ZERO)(_.add(_)).doubleValue
        val t2 = rq.map(x => x.multiply(x)).foldLeft(JBD.ZERO)(_.add(_)).doubleValue
        val v1 = s2 / n1 - (s1 / n1) * (s1 / n1)
        val want =
          if (nq == 0 || v1 == 0.0) None
          else Some(BigDecimal((t2 / nq - (t1 / nq) * (t1 / nq)) / (5.0 * v1))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        val (nDays, vr) = got(sym)
        assert(nDays === r.size.toLong, sym)
        assert(vr === want, sym)
        vr.foreach(v => assert(v >= 0.0, s"$sym vr=$v"))
      }
    }
  }

  test("ichimoku: matches a driver-side recomputation") {
    val got = MarketOps.ichimoku(ticks)
      .select(col("symbol"), col("day").cast("string"), col("tenkan"),
        col("kijun"), col("senkou_a"), col("senkou_b"), col("chikou"))
      .collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (2 to 6).map(i => if (r.isNullAt(i)) None else Some(r.getDouble(i)))))
      .toMap
    for ((sym, bs) <- bars) {
      def mid(i: Int, n: Int): Double = {
        val w = math.max(0, i - (n - 1)) to i
        w.map(j => bs(j)._2).max.add(w.map(j => bs(j)._3).min).doubleValue / 2.0
      }
      for (i <- bs.indices) {
        val want = IndexedSeq(
          Some(mid(i, 9)),
          Some(mid(i, 26)),
          if (i >= 26) Some((mid(i - 26, 9) + mid(i - 26, 26)) / 2.0) else None,
          if (i >= 26) Some(mid(i - 26, 52)) else None,
          if (i + 26 < bs.size) Some(bs(i + 26)._4.doubleValue) else None)
        assert(got((sym, bs(i)._1)) === want, s"$sym ${bs(i)._1}")
      }
    }
  }

  test("transitions: per-from shares sum to 1; counts conserve user pairs") {
    val ev = Tables.events(spark, sf)
    val t = EventAnalytics.transitions(ev).cache()
    val shares = t.groupBy("from_type").agg(sum("share").as("s")).collect()
    shares.foreach(r => assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-9))
    val totalPairs = ev.groupBy("user_id").count()
      .agg(sum(col("count") - 1)).head().getLong(0)
    assert(t.agg(sum("n")).head().getLong(0) === totalPairs)
  }

  test("mojibake: counts on a known fixture") {
    val docs = Seq(
      (1L, "clean ascii text"),
      (2L, "bad � char and � again"),
      (3L, "double Ã© encoded Â  here"),
      (4L, "ctrl\u0001and\u0002and tab\tis fine\nand newline"),
      (5L, "")
    ).toDF("doc_id", "text")
    val got = graft.pipeline.TextOps.mojibake(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(got(1L) === ((0L, 0L, 0L, 0L)))
    assert(got(2L) === ((2L, 0L, 0L, 1L)))
    assert(got(3L) === ((0L, 0L, 2L, 1L)))
    assert(got(4L) === ((0L, 2L, 0L, 1L)))
    assert(got(5L) === ((0L, 0L, 0L, 0L)))
  }

  test("bigramNovelty: rare shares on a known fixture") {
    val docs = Seq(
      (1L, "a b c"),        // bigrams: "a b", "b c"
      (2L, "a b d"),        // "a b", "b d"
      (3L, "a b"),          // "a b"
      (4L, "solo")          // no bigrams — drops out
    ).toDF("doc_id", "text")
    // corpus: "a b"×3, "b c"×1, "b d"×1 → with minCount 2 only "a b"
    // is common
    val got = graft.pipeline.TextOps.bigramNovelty(docs, 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) === ((2L, 1L, 0.5)))
    assert(got(2L) === ((2L, 1L, 0.5)))
    assert(got(3L) === ((1L, 0L, 0.0)))
  }
}
