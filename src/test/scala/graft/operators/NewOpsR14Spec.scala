package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Semantic anchors for the r14 additions — hand-computable fixtures
  * with known closed-form values (the hull-MA lesson: every cents-path
  * operator needs a magnitude assert, not just an oracle hash; a
  * consistent unit error hashes green against a consistently-wrong
  * oracle).
  */
class NewOpsR14Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** 30 one-tick days at a flat 50.00 price. */
  private lazy val flat = (1 to 30).map { d =>
    (d.toLong, f"2026-01-$d%02d 10:00:00", 50.0, 100L)
  }.toDF("event_id", "tss", "price", "volume")
    .select(col("event_id"), lit("TST").as("symbol"),
      col("tss").cast("timestamp").as("ts"), col("price"), col("volume"))
    .cache()

  /** 30 days, two ticks each: open 50.00, close 51.00 (every day an
    * up-body day; close > prior close from day 2 on).
    */
  private lazy val upDays = (1 to 30).flatMap { d =>
    Seq((d.toLong * 2 - 1, f"2026-01-$d%02d 10:00:00", 50.0, 100L),
      (d.toLong * 2, f"2026-01-$d%02d 15:00:00", 51.0, 100L))
  }.toDF("event_id", "tss", "price", "volume")
    .select(col("event_id"), lit("TST").as("symbol"),
      col("tss").cast("timestamp").as("ts"), col("price"), col("volume"))
    .cache()

  test("envelope: flat series recovers the price and literal bands") {
    val rows = MarketOps.envelope(flat, 20).collect()
    assert(rows.length === 11) // days 20..30
    rows.foreach { r =>
      assert(r.getDouble(2) === 50.0)
      assert(r.getDouble(3) === 50.0 * 1.025)
      assert(r.getDouble(4) === 50.0 * 0.975)
    }
  }

  test("disparity: flat series is exactly zero") {
    val rows = MarketOps.disparity(flat, 20).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) === 0.0))
  }

  test("alma: flat series recovers the price through the kernel") {
    val exp = MarketOps.almaWeights.map(_ * 5000.0).reduce(_ + _) /
      MarketOps.almaWeights.sum / 100.0
    assert(math.abs(exp - 50.0) < 1e-9) // unit sanity of the expectation
    val rows = MarketOps.alma(flat).collect()
    assert(rows.length === 22) // days 9..30
    rows.foreach(r => assert(r.getDouble(2) === exp))
  }

  test("cog: flat series gives the closed-form -(n+1)/2 = -5.5") {
    val rows = MarketOps.cog(flat, 10).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) === -5.5))
  }

  test("qstick: flat one-tick days have zero bodies; up-days are +1.00") {
    MarketOps.qstick(flat, 8).collect()
      .foreach(r => assert(r.getDouble(2) === 0.0))
    MarketOps.qstick(upDays, 8).collect()
      .foreach(r => assert(r.getDouble(2) === 1.0))
  }

  test("imi: every-day-up bodies read 100") {
    val rows = MarketOps.imi(upDays, 14).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) === 100.0))
  }

  test("psy: flat closes never count as up days; rising closes read 100") {
    MarketOps.psy(flat, 12).collect().foreach { r =>
      assert(r.getLong(2) === 0L && r.getDouble(3) === 0.0)
    }
    // upDays closes are 51.00 every day — flat close-to-close, so psy
    // is 0 there too; build a genuinely rising tape
    val rising = (1 to 30).map { d =>
      (d.toLong, f"2026-01-$d%02d 10:00:00", 50.0 + d * 0.01, 100L)
    }.toDF("event_id", "tss", "price", "volume")
      .select(col("event_id"), lit("TST").as("symbol"),
        col("tss").cast("timestamp").as("ts"), col("price"), col("volume"))
    val rows = MarketOps.psy(rising, 12).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) === 12L && r.getDouble(3) === 100.0)
    }
  }

  test("camarilla: closed-form levels from the prior bar") {
    val rows = MarketOps.camarilla(upDays).collect()
    assert(rows.length === 29)
    rows.foreach { r =>
      // prior bar: h=51, l=50, c=51 → pr=1.0, pc=51.0
      assert(r.getDouble(2) === 51.0 + 1.0 * 1.1 / 2.0)
      assert(r.getDouble(3) === 51.0 + 1.0 * 1.1 / 4.0)
      assert(r.getDouble(4) === 51.0 - 1.0 * 1.1 / 4.0)
      assert(r.getDouble(5) === 51.0 - 1.0 * 1.1 / 2.0)
    }
  }

  test("varCvar: exact order statistics on a hand-computable tape") {
    // deterministic alternating returns: prices 50.00, 50.50, 50.00,…
    // → returns +0.01, −0.009901 (quant6) alternating; over any full
    // 20-window the two worst are both −0.009901
    val alt = (1 to 30).map { d =>
      (d.toLong, f"2026-01-$d%02d 10:00:00", if (d % 2 == 1) 50.0 else 50.5, 100L)
    }.toDF("event_id", "tss", "price", "volume")
      .select(col("event_id"), lit("TST").as("symbol"),
        col("tss").cast("timestamp").as("ts"), col("price"), col("volume"))
    val rows = MarketOps.varCvar(alt, 20).collect()
    assert(rows.length === 10) // 29 returns → windows 20..29
    rows.foreach { r =>
      assert(r.getDouble(2) === -0.009901) // 2nd worst
      assert(r.getDouble(3) === -0.009901) // mean of the two worst
    }
  }

  test("highLowCensus: a rising tape is a daily new high, never a low") {
    val rising = (1 to 30).map { d =>
      (d.toLong, f"2026-01-$d%02d 10:00:00", 50.0 + d, 100L)
    }.toDF("event_id", "tss", "price", "volume")
      .select(col("event_id"), lit("TST").as("symbol"),
        col("tss").cast("timestamp").as("ts"), col("price"), col("volume"))
    val rows = MarketOps.highLowCensus(rising, 20).collect()
    assert(rows.length === 11) // days 20..30
    rows.foreach { r =>
      assert(r.getLong(1) === 1L && r.getLong(2) === 0L && r.getLong(3) === 1L)
    }
  }

  test("mcginley: flat series stays pinned at the price") {
    val rows = MarketOps.mcginley(flat, 20).collect()
    assert(rows.length === 30)
    rows.foreach(r => assert(r.getDouble(2) === 50.0))
    // a step tape converges monotonically toward the new level from
    // below, never overshooting (the self-adjusting-denominator
    // contract)
    val step = (1 to 30).map { d =>
      (d.toLong, f"2026-01-$d%02d 10:00:00", if (d <= 5) 50.0 else 60.0, 100L)
    }.toDF("event_id", "tss", "price", "volume")
      .select(col("event_id"), lit("TST").as("symbol"),
        col("tss").cast("timestamp").as("ts"), col("price"), col("volume"))
    val mds = MarketOps.mcginley(step, 20).collect().map(_.getDouble(2))
    mds.sliding(2).foreach { case Array(a, b) => assert(b >= a) }
    assert(mds.last > 50.0 && mds.last < 60.0)
  }

  test("fisher: flat series is exactly zero; trigger lags fisher by one") {
    val rows = MarketOps.fisher(flat, 10).collect()
    assert(rows.length === 21) // days 10..30
    rows.foreach { r =>
      assert(r.getDouble(2) === 0.0 && r.getDouble(3) === 0.0)
    }
    val rising = (1 to 30).map { d =>
      (d.toLong, f"2026-01-$d%02d 10:00:00", 50.0 + d * 0.5, 100L)
    }.toDF("event_id", "tss", "price", "volume")
      .select(col("event_id"), lit("TST").as("symbol"),
        col("tss").cast("timestamp").as("ts"), col("price"), col("volume"))
    val fr = MarketOps.fisher(rising, 10).collect()
      .map(r => (r.getDouble(2), r.getDouble(3)))
    // monotone rise: fisher positive, and trigger is the previous fisher
    fr.foreach { case (f, _) => assert(f > 0.0) }
    fr.sliding(2).foreach { case Array((f1, _), (_, t2)) => assert(t2 === f1) }
  }

  test("jsDivergence: identical sources at 0, disjoint sources at ln 2") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha", "a"),
      (2L, "alpha beta gamma alpha", "b"),
      (3L, "delta epsilon zeta eta", "c"))
      .toDF("doc_id", "text", "source")
    val got = graft.pipeline.TextOps.jsDivergence(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(got(("a", "b")) === 0.0)
    assert(got(("a", "c")) === 0.34657359027997264 * 2.0)
    assert(got(("b", "c")) === 0.34657359027997264 * 2.0)
  }

  test("attributionUShape: closed-form 40/20/40 credit split") {
    // user 1: view, click, view, purchase → k=3: 0.4 / 0.2 / 0.4
    // user 2: click, purchase → k=1: 1.0
    // user 3: view, click, purchase → k=2: 0.5 / 0.5
    val ev = Seq(
      (1L, "2026-03-01 10:00:00", 1L, "view"),
      (2L, "2026-03-01 10:01:00", 1L, "click"),
      (3L, "2026-03-01 10:02:00", 1L, "view"),
      (4L, "2026-03-01 10:03:00", 1L, "purchase"),
      (5L, "2026-03-01 11:00:00", 2L, "click"),
      (6L, "2026-03-01 11:01:00", 2L, "purchase"),
      (7L, "2026-03-01 12:00:00", 3L, "view"),
      (8L, "2026-03-01 12:01:00", 3L, "click"),
      (9L, "2026-03-01 12:02:00", 3L, "purchase")
    ).toDF("event_id", "tss", "user_id", "event_type")
      .select(col("event_id"), col("tss").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
    val got = EventAnalytics.attributionUShape(ev).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // view: 0.4 + 0.4 + 0.5 = 1.3 over 3 touches;
    // click: 0.2 + 1.0 + 0.5 = 1.7 over 3 touches
    assert(got("view") === ((3L, 1.3)))
    assert(got("click") === ((3L, 1.7)))
  }

  test("contaminationSpans: train spans covered by held-out grams") {
    val docs = Seq(
      (0L, "alpha beta gamma delta secret words here"), // held out (0 % 2)
      (1L, "prefix1 alpha beta gamma delta tail1 tail2"), // train: leak
      (3L, "nothing shared with the benchmark at all")    // train: clean
    ).toDF("doc_id", "text").withColumn("source", lit("web"))
    val got = graft.pipeline.Dedup.contaminationSpans(
      docs, col("doc_id") % 2 === 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: grams at positions 2..3 (alpha beta gamma / beta gamma
    // delta) cover words 2..5 — one merged span; doc 3 clean
    assert(got.toSeq === Seq((1L, 2L, 5L, 4L)))
  }

  test("sourceKl: a source matching the corpus distribution reads 0") {
    import spark.implicits._
    // two sources with IDENTICAL text → each p equals the corpus q
    // word-for-word → every KL term is exactly ln(1) = 0
    val d = Seq((1L, "alpha beta beta gamma", "a"),
      (2L, "alpha beta beta gamma", "b"))
      .toDF("doc_id", "text", "source")
    val got = graft.pipeline.TextOps.sourceKl(d).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("a") === 0.0 && got("b") === 0.0)
  }

  test("lifespanHist: single-day users bucket at 0, multi-day at the gap") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2026-03-01 10:00:00", 1L), (2L, "2026-03-08 10:00:00", 1L),
      (3L, "2026-03-02 10:00:00", 2L),
      (4L, "2026-03-03 09:00:00", 3L), (5L, "2026-03-03 23:00:00", 3L))
      .toDF("event_id", "tss", "user_id")
      .select(col("event_id"), col("tss").cast("timestamp").as("ts"),
        col("user_id"), lit("view").as("event_type"), lit(1.0).as("value"),
        lit("{}").as("props"))
    val got = EventAnalytics.lifespanHist(ev).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(0L -> 2L, 7L -> 1L))
  }

  test("stickiness: a single always-active user reads 1.0") {
    val ev = (1 to 5).map { d =>
      (d.toLong, f"2026-03-$d%02d 12:00:00", 7L, "view", 1.0, "{}")
    }.toDF("event_id", "tss", "user_id", "event_type", "value", "props")
      .select(col("event_id"), col("tss").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    val rows = EventAnalytics.stickiness(ev).collect()
    assert(rows.length === 5)
    rows.foreach { r =>
      assert(r.getLong(1) === 1L && r.getLong(2) === 1L &&
        r.getDouble(3) === 1.0)
    }
  }

  test("intrinsicDim: defined, positive, one row per label on the corpus") {
    val emb = Tables.embeddings(spark, sf)
    val rows = graft.pipeline.Similarity.intrinsicDim(emb).collect()
    assert(rows.length === emb.select("label").distinct().count())
    rows.foreach { r =>
      assert(r.getLong(1) > 0L)
      if (!r.isNullAt(2)) assert(r.getDouble(2) > 0.0)
    }
  }
}
