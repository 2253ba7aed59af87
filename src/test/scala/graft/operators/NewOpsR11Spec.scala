package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Semantic contracts of the r11 additions: the range-based volatility
  * family (Parkinson / Garman–Klass / Rogers–Satchell) and token
  * Shannon entropy, each checked against an independent driver-side
  * recompute that repeats the documented quantization discipline —
  * exact equality, not tolerance.
  */
class NewOpsR11Spec extends AnyFunSuite {
  import TestSpark._

  /** The shared 6-dp quantization (§4): s = x·1e6, floor/ceil
    * half-away, rebuild as an exact decimal in micro-units (long).
    */
  private def q6micro(x: Double): Long = {
    val s = x * 1000000.0
    (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toLong
  }

  test("rangeVol equals a driver-side recompute under the same quantization") {
    val bars = MarketOps.ohlcDaily(Tables.ticks(spark, sf))
      .select(col("symbol"), col("open"), col("high"), col("low"), col("close"))
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
      .filter(_._4 > 0.0)
      .groupBy(_._1)
    val got = MarketOps.rangeVol(Tables.ticks(spark, sf)).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getDouble(4)))
      .toMap
    assert(got.nonEmpty && got.keySet === bars.keySet)
    for ((sym, bs) <- bars) {
      // exact integer micro-unit sums: (u·v in micro² units) — the
      // 12-dp decimal sums are these divided by 1e12
      var su = BigInt(0); var sv = BigInt(0); var srs = BigInt(0)
      bs.foreach { case (_, o, h, l, c) =>
        val u = q6micro(math.log(h / l)); val v = q6micro(math.log(c / o))
        val hc = q6micro(math.log(h / c)); val ho = q6micro(math.log(h / o))
        val lc = q6micro(math.log(l / c)); val lo = q6micro(math.log(l / o))
        su += BigInt(u) * BigInt(u); sv += BigInt(v) * BigInt(v)
        srs += BigInt(hc) * BigInt(ho) + BigInt(lc) * BigInt(lo)
      }
      val n = bs.size.toDouble
      // ROUND(sum, 8) of the non-negative 12-dp decimal == half-up at 8
      def r8(x: BigInt): Double =
        new java.math.BigDecimal(x.bigInteger).movePointLeft(12)
          .setScale(8, java.math.RoundingMode.HALF_UP).doubleValue()
      val (nDays, park, gk, rs) = got(sym)
      assert(nDays === bs.size.toLong)
      assert(park === math.sqrt(r8(su) / (n * 2.772588722239781)), s"$sym park")
      val gkv = (0.5 * r8(su) - 0.3862943611198906 * r8(sv)) / n
      assert(gk === (if (gkv >= 0) Some(math.sqrt(gkv)) else None), s"$sym gk")
      assert(rs === math.sqrt(r8(srs) / n), s"$sym rs")
      // estimator family sanity: all non-negative
      assert(park >= 0.0 && rs >= 0.0 && gk.forall(_ >= 0.0))
    }
  }

  /** The operator's exact recompute: quantized p·ln(p) micro-unit sum,
    * one ÷ln2 at the end, signed-zero normalized.
    */
  private def entropyOf(text: String): (Long, Long, Double) = {
    val ws = text.split(" ", -1)
    val counts = ws.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val micro = counts.values.map { c =>
      val p = c.toDouble / ws.length.toDouble
      q6micro(p * math.log(p))
    }.sum
    (ws.length.toLong, counts.size.toLong,
      -(micro.toDouble / 1e6) / 0.6931471805599453 + 0.0)
  }

  test("ppo equals a driver-side double-EMA recompute exactly") {
    val closes = MarketOps.ohlcDaily(Tables.ticks(spark, sf))
      .select(col("symbol"), col("day").cast("string"),
        col("close").cast("decimal(18,2)"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getDecimal(2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toVector)
      .toMap
    val got = MarketOps.ppo(Tables.ticks(spark, sf)).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        (r.getDouble(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      .toMap
    assert(got.nonEmpty)
    for ((sym, cs) <- closes) {
      val af = 2.0 / 13.0; val as = 2.0 / 27.0
      var ef = 0.0; var es = 0.0; var first = true
      val days = MarketOps.ohlcDaily(Tables.ticks(spark, sf))
        .filter(col("symbol") === sym).select(col("day").cast("string"))
        .collect().map(_.getString(0)).sorted
      cs.zip(days).foreach { case (c, d) =>
        val x = c.doubleValue()
        if (first) { first = false; ef = x; es = x }
        else { ef = af * x + (1.0 - af) * ef; es = as * x + (1.0 - as) * es }
        val (gf, gs, gp) = got((sym, d))
        assert(gf === ef && gs === es, s"$sym $d ema")
        assert(gp === (if (es != 0.0) Some(100.0 * (ef - es) / es) else None),
          s"$sym $d ppo")
      }
    }
  }

  test("hull MA equals the unfolded WMA composition on a known series") {
    import spark.implicits._
    // 25 strictly increasing closes for one symbol, one per day
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-01-${d + 1}%02d 10:00:00")
    val tape = (0 until 25).map(i => (i.toLong, "H", ts(i), 10.0 + i, 1L))
      .toDF("event_id", "symbol", "ts", "price", "volume")
    val got = MarketOps.hullMa(tape).collect()
      .map(r => r.getDate(1).toString -> r.getDouble(2)).toMap
    // rows emit from day index 18 (rn >= 19)
    assert(got.size === 25 - 18)
    val cents = (0 until 25).map(i => (1000 + i * 100).toLong)
    (18 until 25).foreach { i =>
      // exact integer-numerator identity (the operator's contract)
      val dnum = (j: Int) => 68L * (0 until 8).map(k => (8 - k).toLong * cents(j - k)).sum -
        9L * (0 until 16).map(k => (16 - k).toLong * cents(j - k)).sum
      val hsum = (0 until 4).map(k => (4 - k).toLong * dnum(i - k)).sum
      val d = got(f"2024-01-${i + 1}%02d")
      assert(d === hsum.toDouble / 1224000.0, s"day $i")
      // low-lag sanity: HMA of a straight line tracks the line closely
      assert(math.abs(d - (10.0 + i)) < 2.0, s"day $i tracks the line, got $d")
    }
  }

  test("breadth counts and TRIN match a recompute; new event ops survive edge shapes") {
    import spark.implicits._
    val ts = (d: Int, s: String) =>
      java.sql.Timestamp.valueOf(f"2024-02-${d + 1}%02d 10:00:00")
    // two symbols, 3 days: A up/up, B down/flat
    val tape = Seq(
      (1L, "A", ts(0, "A"), 10.0, 5L), (2L, "B", ts(0, "B"), 20.0, 7L),
      (3L, "A", ts(1, "A"), 11.0, 6L), (4L, "B", ts(1, "B"), 19.0, 8L),
      (5L, "A", ts(2, "A"), 12.0, 2L), (6L, "B", ts(2, "B"), 19.0, 3L)
    ).toDF("event_id", "symbol", "ts", "price", "volume")
    val rows = MarketOps.breadth(tape).collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), if (r.isNullAt(7)) None else Some(r.getDouble(7))))
      .toMap
    // day 2: A up (vol 6), B down (vol 8) → trin = (1/1)/(6/8)
    assert(rows("2024-02-02") ===
      ((1L, 1L, 0L, 6L, 8L, 0L, Some((1.0 / 1.0) / (6.0 / 8.0)))))
    // day 3: A up (vol 2), B flat → decliners 0 → trin NULL, ad_line 0+1
    assert(rows("2024-02-03") === ((1L, 0L, 1L, 2L, 0L, 1L, None)))
    // mcclellan seeds from the first net value
    val mc = MarketOps.mcclellan(tape).collect()
    assert(mc.length === 2 && mc(0).getDouble(4) === 0.0)
    // event ops: no purchases → empty; single-day activity
    val ev = Seq(
      (1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "view", 1.0),
      (2L, 10L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "click", 1.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    assert(EventAnalytics.timeToConvert(ev).collect().isEmpty)
    val l28 = EventAnalytics.engagementL28(ev).collect()
    assert(l28.length === 1 && l28(0).getLong(0) === 1L && l28(0).getLong(1) === 1L)
  }

  test("renko prints the expected bricks on a crafted tape; windowFunnel depths") {
    import spark.implicits._
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-03-${d + 1}%02d 10:00:00")
    // anchor 10.00; +2.5 bricks up, sideways, -3.2 → reversal down
    val closes = Seq(10.00, 12.50, 12.90, 9.30, 10.10)
    val tape = closes.zipWithIndex.map { case (p, i) =>
      (i.toLong, "R", ts(i), p, 1L)
    }.toDF("event_id", "symbol", "ts", "price", "volume")
    val got = MarketOps.renko(tape).collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    // levels: 0 → 2 (two up bricks at 11.00/12.00) → 2 (sideways) →
    // 0 (9.30 clears the 10.00 boundary but not 9.00: ceil(−0.7) = 0,
    // two down bricks) → 0 (10.10 clears nothing)
    assert(got.toSeq === Seq((0L, 0L, 0L), (2L, 2L, 1L), (2L, 0L, 0L),
      (0L, 2L, -1L), (0L, 0L, 0L)))

    val ets = (m: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      // user 1: full funnel in 30 min → depth 3
      (1L, 1L, ets(0), "view", 1.0), (2L, 1L, ets(10), "click", 1.0),
      (3L, 1L, ets(30), "purchase", 1.0),
      // user 2: click in window, purchase 2h later → depth 2
      (4L, 2L, ets(0), "click", 1.0), (5L, 2L, ets(1), "view", 1.0),
      (6L, 2L, ets(5), "click", 1.0),
      (7L, 2L, java.sql.Timestamp.valueOf("2024-01-01 13:00:00"), "purchase", 1.0),
      // user 3: view only → depth 1
      (8L, 3L, ets(0), "view", 1.0),
      // user 4: no view → excluded
      (9L, 4L, ets(0), "purchase", 1.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val wf = EventAnalytics.windowFunnel(ev, 60L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wf === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("zigzag confirms swings at the documented 1/20 thresholds") {
    import spark.implicits._
    val ts = (d: Int) => java.sql.Timestamp.valueOf(f"2024-04-${d + 1}%02d 10:00:00")
    // up to 20.00, retrace to exactly 19.00 (20·1900 = 19·2000 →
    // confirms the swing high AT the boundary), down to 15.00,
    // bounce to exactly 15.75 (21/20·15.00 → confirms the low)
    val closes = Seq(18.00, 20.00, 19.00, 15.00, 15.75)
    val tape = closes.zipWithIndex.map { case (p, i) =>
      (i.toLong, "Z", ts(i), p, 1L)
    }.toDF("event_id", "symbol", "ts", "price", "volume")
    val got = MarketOps.zigzag(tape).collect()
      .map(r => (r.getDate(1).toString, r.getDouble(2), r.getLong(3)))
    assert(got.toSeq === Seq(
      ("2024-04-03", 20.00, 1L),   // swing HIGH 20.00 confirmed at 19.00
      ("2024-04-05", 15.00, -1L))) // swing LOW 15.00 confirmed at 15.75
  }

  test("freqSpectrum and surprisal match driver-side recomputes") {
    val corpus = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val allWords = corpus.values.flatMap(_.split(" ", -1)).toSeq
    val wc = allWords.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // freq spectrum
    val spec = wc.values.groupBy(c => if (c <= 10) c else 11L)
      .map { case (k, cs) => k -> (cs.size.toLong, cs.sum) }
    val gotSpec = graft.pipeline.TextOps.freqSpectrum(
      Tables.documents(spark, sf)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(gotSpec === spec)
    // surprisal
    val total = allWords.size.toDouble
    val gotSur = graft.pipeline.TextOps.unigramSurprisal(
      Tables.documents(spark, sf)).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    corpus.foreach { case (id, text) =>
      val ws = text.split(" ", -1)
      val micro = ws.groupBy(identity).map { case (w, occ) =>
        q6micro(occ.size.toDouble * math.log(wc(w).toDouble / total))
      }.sum
      val bits = -(micro.toDouble / 1e6) / ws.length.toDouble /
        0.6931471805599453 + 0.0
      assert(gotSur(id) === ((ws.length.toLong, bits)), s"doc $id")
    }
  }

  test("tokenEntropy: exact recompute, uniform and degenerate shapes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d"),         // uniform over 4 → ~2 bits
      (2L, "x x x x"),         // single token → exactly +0.0
      (3L, "a a b"),
      (4L, "")                 // empty text → one "" token, entropy 0
    ).toDF("doc_id", "text")
    val got = graft.pipeline.TextOps.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    Seq(1L, 2L, 3L, 4L).foreach { id =>
      val text = Map(1L -> "a b c d", 2L -> "x x x x", 3L -> "a a b", 4L -> "")(id)
      assert(got(id) === entropyOf(text), s"doc $id")
    }
    // uniform-4 entropy lands within a quantization step of 2 bits
    assert(math.abs(got(1L)._3 - 2.0) < 1e-5)
    // +0.0, not −0.0 (the signed-zero normalizer)
    assert(java.lang.Double.doubleToRawLongBits(got(2L)._3) === 0L)
    assert(got(4L)._1 === 1L)
    // full-corpus recompute on the sf documents
    val corpus = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val full = graft.pipeline.TextOps.tokenEntropy(Tables.documents(spark, sf))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(full.nonEmpty && full.length === corpus.size)
    full.foreach { case (id, res) =>
      assert(res === entropyOf(corpus(id)), s"doc $id")
    }
  }
}
