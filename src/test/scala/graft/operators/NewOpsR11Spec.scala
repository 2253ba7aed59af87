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
