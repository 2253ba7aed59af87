package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Semantic contracts of the r7 operators: gap/pivot/profile/CUSUM on
  * the market side, weighted sampling / fertility / URL census /
  * embedding outliers on the pipeline side. Each is checked against an
  * independent formulation (a window-rank recount, a closed-form
  * identity, or a hand-derivable fixture), not just for non-emptiness.
  */
class NewOpsR7Spec extends AnyFunSuite {
  import TestSpark._

  private lazy val ticks = Tables.ticks(spark, sf)
  private lazy val docs = Tables.documents(spark, sf)
  private lazy val emb = Tables.embeddings(spark, sf)

  test("overnightGaps: one row per (symbol, day) after the first; bp identity") {
    val g = MarketOps.overnightGaps(ticks).cache()
    val days = MarketOps.ohlcDaily(ticks).groupBy("symbol").count()
    val gaps = g.groupBy("symbol").count()
    val j = days.join(gaps.withColumnRenamed("count", "g"), "symbol")
    assert(j.filter(col("g") =!= col("count") - 1).count() === 0)
    // gap_bp reconstructs from the emitted prev_close/open with the
    // operator's exact op order: 2-dp doubles recover the DECIMAL(18,2)
    // values exactly, the difference is taken in decimal, cast to
    // double, then IEEE-divided — bit-identical to the raw emission.
    val bad = g.filter(
      abs(col("gap_bp") -
        (col("open").cast("decimal(18,2)") -
          col("prev_close").cast("decimal(18,2)")).cast("double") /
          col("prev_close") * 10000.0)
        > 1e-9)
    assert(bad.count() === 0)
  }

  test("volumeProfile: shares sum to 1, exactly one POC per symbol, volume conserved") {
    val p = MarketOps.volumeProfile(ticks).cache()
    val bySym = p.groupBy("symbol")
      .agg(sum("share").as("s"), sum("poc").as("np"), sum("band_volume").as("v"))
      .collect()
    bySym.foreach { r =>
      assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-4)
      assert(r.getAs[Long]("np") === 1L)
    }
    val total = ticks.agg(sum("volume")).head().getLong(0)
    assert(p.agg(sum("band_volume")).head().getLong(0) === total)
  }

  test("pivotPoints: level ordering R2 >= R1 >= P >= S1 >= S2") {
    // r1 − p = p − l ≥ 0 and r2 − r1 = (h − p) ≥ 0 for p = (h+l+c)/3
    // with l ≤ c ≤ h — the classic level ladder must be monotone
    val pp = MarketOps.pivotPoints(ticks)
    assert(pp.filter(col("r2") < col("r1") || col("r1") < col("pivot") ||
      col("pivot") < col("s1") || col("s1") < col("s2")).count() === 0)
  }

  test("cusumEvents: excursion clears the threshold with matching sign") {
    val h = 5.0
    val ev = MarketOps.cusumEvents(ticks, h).cache()
    assert(ev.count() > 0, "threshold 5.0 should fire on sf0.001 closes")
    assert(ev.filter(col("side") === 1L && col("excursion") <= h).count() === 0)
    assert(ev.filter(col("side") === -1L && col("excursion") >= -h).count() === 0)
    assert(ev.filter(!col("side").isin(1L, -1L)).count() === 0)
  }

  test("weightedSample: exactly k rows, priorities are the global minimum set") {
    val ws = graft.pipeline.TextOps.weightedSample(docs, 50).cache()
    assert(ws.count() === 50)
    // rank order matches priority order with doc_id tiebreak
    val rows = ws.orderBy("rk").collect()
    val sorted = rows.sortBy(r => (r.getAs[Long]("priority"), r.getAs[Long]("doc_id")))
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq ===
      sorted.map(_.getAs[Long]("doc_id")).toSeq)
    // nothing outside the sample has a smaller priority than the cutoff
    val idx = expr("TRY_CAST(substring(source, 4) AS INT)")
    val w = (pmod(idx, lit(4)) + 1).cast("long")
    val h = conv(substring(md5(concat(lit("wt"), col("doc_id").cast("string"))
      .cast("binary")), 1, 12), 16, 10).cast("long")
    val cutoff = rows.last.getAs[Long]("priority")
    val below = docs.select(col("doc_id"), w.as("w"), h.as("h"))
      .filter(col("w").isNotNull)
      .withColumn("priority", expr("h div w"))
      .filter(col("priority") < cutoff)
    assert(below.count() <= 50)
  }

  test("tokenFertility: BIGINT sums reconcile with per-doc token counts") {
    val f = graft.pipeline.TextOps.tokenFertility(docs).cache()
    val perDoc = graft.pipeline.TextOps.tokenCount(docs)
      .agg(sum("ws_tokens").as("ws"), sum("bpe_tokens").as("bpe")).head()
    val agg = f.agg(sum("ws_tokens").as("ws"), sum("bpe_tokens").as("bpe")).head()
    assert(agg.getAs[Long]("ws") === perDoc.getAs[Long]("ws"))
    assert(agg.getAs[Long]("bpe") === perDoc.getAs[Long]("bpe"))
    assert(f.filter(col("fertility") <= 0.0).count() === 0)
  }

  test("urlStats: exactly the injected domains, with consistent scheme counts") {
    val u = graft.pipeline.TextOps.urlStats(docs).cache()
    val domains = u.collect().map(_.getAs[String]("domain")).toSet
    assert(domains === Set("ex.io", "cdn.ex.io", "data.example.org", "files.net"))
    assert(u.filter(col("n_https") > col("n_urls")).count() === 0)
    // cdn.ex.io and files.net are injected as http only
    assert(u.filter(col("domain").isin("cdn.ex.io", "files.net"))
      .filter(col("n_https") =!= 0L).count() === 0)
  }

  private def tickOrder =
    Window.partitionBy("symbol").orderBy(col("ts"), col("event_id"))

  private def assertSame(a0: org.apache.spark.sql.DataFrame,
      b0: org.apache.spark.sql.DataFrame): Unit = {
    val a = a0.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = b0.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.length === b.length, s"row counts ${a.length} vs ${b.length}")
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  test("dollarBars matches the single-window plan bit-for-bit") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val tie = concat(
      lpad(unix_micros(col("ts")).cast("string"), 20, "0"),
      lpad(col("event_id").cast("string"), 20, "0"))
    val dc = (col("price").cast(dec) * 100).cast("long") * col("volume")
    val preCum = coalesce(
      sum(dc).over(tickOrder.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    val naive = ticks.withColumn("dc", dc).withColumn("pre_cum", preCum)
      .withColumn("bar_id", expr("pre_cum div 500000"))
      .groupBy(col("symbol"), col("bar_id"))
      .agg(count(lit(1)).as("n_ticks"),
        min_by(col("price"), tie).as("open"), max(col("price")).as("high"),
        min(col("price")).as("low"), max_by(col("price"), tie).as("close"),
        sum(col("volume")).as("bar_volume"),
        sum(col("dc")).as("bar_dollar_cents"))
    assertSame(MarketOps.dollarBars(ticks, 500000L), naive)
  }

  test("staleRuns matches the single-window plan bit-for-bit") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val prev = lag(col("price"), 1).over(tickOrder)
    val isNew = when(prev.isNull ||
      col("price").cast(dec) =!= prev.cast(dec), 1L).otherwise(0L)
    val naive = ticks.withColumn("is_new", isNew)
      .withColumn("run_id",
        sum(col("is_new")).over(tickOrder.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("symbol"), col("run_id"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_runs"), max(col("len")).as("max_run"),
        sum(col("len") - 1).as("n_repeats"))
    assertSame(MarketOps.staleRuns(ticks), naive)
  }

  test("higherMoments matches the single-window lag formulation bit-for-bit") {
    val d4 = org.apache.spark.sql.types.DecimalType(12, 4)
    val d8 = org.apache.spark.sql.types.DecimalType(13, 8)
    val prev = lag(col("price"), 1).over(tickOrder)
    val sc = (col("price") / col("prev") - 1) * 10000.0
    val qq = when(sc >= 0, floor(sc + 0.5)).otherwise(ceil(sc - 0.5))
    val r0 = (qq.cast("long").cast(org.apache.spark.sql.types.DecimalType(12, 0)) *
      lit(new java.math.BigDecimal("0.0001"))
        .cast(org.apache.spark.sql.types.DecimalType(5, 4))).cast(d4)
    val rw = least(greatest(r0, lit(-100).cast(d4)), lit(100).cast(d4))
    val m = ticks.withColumn("prev", prev)
      .filter(col("prev").isNotNull && col("prev") =!= 0.0)
      .withColumn("r", rw)
      .withColumn("r2", (col("r") * col("r")).cast(d8))
      .groupBy(col("symbol")).agg(
        count(lit(1)).as("n_rets"),
        round(sum(col("r")), 2).cast("double").as("sx"),
        round(sum(col("r2")), 2).cast("double").as("sxx"),
        round(sum(col("r2") * col("r")), 2).cast("double").as("sxxx"),
        round(sum(col("r2") * col("r2")), 2).cast("double").as("sxxxx"))
    val nd = col("n_rets").cast("double")
    val mean = col("sx") / nd
    val vr = col("sxx") / nd - mean * mean
    val m3 = col("sxxx") / nd - lit(3.0) * mean * (col("sxx") / nd) +
      lit(2.0) * mean * mean * mean
    val m4 = col("sxxxx") / nd - lit(4.0) * mean * (col("sxxx") / nd) +
      lit(6.0) * mean * mean * (col("sxx") / nd) -
      lit(3.0) * mean * mean * mean * mean
    val naive = m.select(col("symbol"), col("n_rets"),
      mean.as("mean_ret"), vr.as("var_ret"),
      when(vr > 0.0, m3 / (vr * sqrt(vr))).as("skewness"),
      when(vr > 0.0, m4 / (vr * vr) - 3.0).as("excess_kurtosis"))
    assertSame(MarketOps.higherMoments(ticks), naive)
  }

  test("intradayVolCurve matches the single-window lag formulation bit-for-bit") {
    val d4 = org.apache.spark.sql.types.DecimalType(12, 4)
    val d8 = org.apache.spark.sql.types.DecimalType(13, 8)
    val sc = (col("price") / col("prev") - 1) * 10000.0
    val qq = when(sc >= 0, floor(sc + 0.5)).otherwise(ceil(sc - 0.5))
    val r0 = (qq.cast("long").cast(org.apache.spark.sql.types.DecimalType(12, 0)) *
      lit(new java.math.BigDecimal("0.0001"))
        .cast(org.apache.spark.sql.types.DecimalType(5, 4))).cast(d4)
    val rw = least(greatest(r0, lit(-100).cast(d4)), lit(100).cast(d4))
    val naive = ticks
      .withColumn("prev", lag(col("price"), 1).over(tickOrder))
      .filter(col("prev").isNotNull && col("prev") =!= 0.0)
      .withColumn("r2", (rw * rw).cast(d8))
      .groupBy(col("symbol"), hour(col("ts")).cast("long").as("hod"))
      .agg(count(lit(1)).as("n_rets"),
        round(sum(col("r2")), 2).cast("double").as("s2"))
      .select(col("symbol"), col("hod"), col("n_rets"),
        sqrt(col("s2") / col("n_rets").cast("double")).as("rms_ret"))
    assertSame(MarketOps.intradayVolCurve(ticks), naive)
  }

  test("sizeHistogram buckets are exact floor(log2) and conserve volume") {
    val h = MarketOps.sizeHistogram(ticks).cache()
    // bucket b covers [2^b, 2^(b+1))
    assert(h.filter(col("min_volume") < expr("CAST(pow(2, bucket) AS BIGINT)") ||
      col("max_volume") >= expr("CAST(pow(2, bucket + 1) AS BIGINT)")).count() === 0)
    val total = ticks.filter(col("volume") > 0).agg(sum("volume")).head().getLong(0)
    assert(h.agg(sum("sum_volume")).head().getLong(0) === total)
  }

  test("crossSourceLeakage finds exactly the injected cross-source texts") {
    import graft.TestSpark.spark.implicits._
    val d = Seq(
      (1L, "alpha beta", "en", "a", 10L),
      (2L, "alpha beta", "en", "b", 10L),   // leaked a<->b
      (3L, "gamma", "en", "a", 5L),
      (4L, "gamma", "en", "a", 5L),         // same-source dup: NOT leaked
      (5L, "delta", "en", "c", 5L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = graft.pipeline.Dedup.crossSourceLeakage(d).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out === Map("a" -> ((1L, 1L)), "b" -> ((1L, 1L))))
  }

  test("embedOutliers matches the rank-window formulation; plan has no Window") {
    import graft.pipeline.Similarity
    val out = Similarity.embedOutliers(emb, 3)
    assert(out.queryExecution.analyzed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }.isEmpty, "per-label top-k must be a max-k partial agg, not a rank window")
    // independent recount: same exact-integer score, ranked by a window
    val q = emb.select(col("vec_id"), col("label").cast("long").as("label"),
      Similarity.quantizeI8(col("embedding")).as("qv"))
    val nTab = q.groupBy(col("label")).agg(count(lit(1)).as("n"))
    val sums = q.select(col("label"), posexplode(col("qv")).as(Seq("i", "qc")))
      .groupBy(col("label"), col("i"))
      .agg(sum(col("qc").cast("long")).as("s"))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("i"), col("s")))),
        x => x.getField("s")).as("sv"))
    // deliberately the PLAIN BIGINT path (safe at test scale): the
    // operator's DECIMAL(38,0) accumulator + integral divide must land
    // on the identical floored quotient
    val d2n = expr(
      "aggregate(zip_with(qv, sv, (a, b) -> (CAST(a AS BIGINT) * n - b) " +
        "* (CAST(a AS BIGINT) * n - b)), CAST(0 AS BIGINT), (acc, x) -> acc + x)")
    val naive = q.join(sums.join(nTab, "label"), "label")
      .withColumn("d2n", d2n)
      .withColumn("d2", expr("d2n div (n * n)"))
      .withColumn("rk", row_number().over(Window.partitionBy("label")
        .orderBy(col("d2").desc, col("vec_id"))).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("label"), col("rk"), col("vec_id"), col("d2"))
    val a = out.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = naive.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }
}
