package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Value-level gates for the r15 additions (the oracle hash-compare is
  * the driver's job; these pin semantics on crafted fixtures and
  * invariants the hashes alone wouldn't explain).
  */
class NewOpsR15Spec extends AnyFunSuite {
  import TestSpark._

  test("semDedup: an exact duplicate is dropped, the lower id survives") {
    import spark.implicits._
    // near-orthogonal basis vectors (pairwise cosine 0 < τ) plus one
    // EXACT duplicate of vec 0 — same cluster, equal centroid
    // distance, tie to the lower id: 0 kept, 4 dropped
    def e(i: Int): Seq[Float] = (0 until 8).map(j => if (j == i) 1.0f else 0.0f)
    val emb = Seq(
      (0L, e(0), 0), (1L, e(1), 0), (2L, e(2), 0), (3L, e(3), 0),
      (4L, e(0), 0), (5L, e(5), 0))
      .toDF("vec_id", "embedding", "label")
    val got = graft.pipeline.Similarity.semDedup(emb)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(0L) === 1L && got(4L) === 0L)
    assert(Seq(1L, 2L, 3L, 5L).forall(got(_) === 1L))
  }

  test("qualitySurvivors: the kept doc has its cluster's max quality") {
    val docs = Tables.documents(spark, sf)
    val got = graft.pipeline.Dedup.qualitySurvivors(docs).collect()
    val q = graft.pipeline.TextOps.qualityScore(docs)
      .select("doc_id", "quality").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val labels = graft.pipeline.Dedup.clusters(docs)
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = labels.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(got.length === byCluster.size)
    got.foreach { r =>
      val (cid, n, keep, kq) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
      val members = byCluster(cid)
      assert(n === members.length.toLong)
      assert(members.contains(keep))
      val best = members.map(q).max
      assert(q(keep) === best && kq === best, s"cluster $cid")
      // quality desc, doc_id asc tie-break
      assert(keep === members.filter(m => q(m) == best).min)
    }
  }

  test("docBigramNll: exact recompute on a crafted two-doc corpus") {
    import spark.implicits._
    // corpus bigrams: doc1 "a b a b" → (a,b)×2, (b,a)×1;
    // doc2 "a c" → (a,c)×1. counts: c(a,b)=2 c(b,a)=1 c(a,c)=1;
    // contexts: c(a·)=3, c(b·)=1
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    def q6(x: Double): Double = {
      val s = x * 1e6
      (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)) / 1e6
    }
    val tAB = q6(math.log(2.0 / 3.0))
    val tBA = q6(math.log(1.0 / 1.0))
    val tAC = q6(math.log(1.0 / 3.0))
    val got = graft.pipeline.TextOps.docBigramNll(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L)._1 === 3L)
    assert(got(1L)._2 === -(tAB + tBA + tAB) / 3.0)
    assert(got(2L) === ((1L, -tAC / 1.0)))
  }

  test("stc: equals a driver-side cascade recompute and stays in [0, 100]") {
    val ticks = Tables.ticks(spark, sf)
    val bars = graft.operators.MarketOps.ohlcDaily(ticks)
      .select(col("symbol"), col("day"),
        col("close").cast("decimal(12,2)").cast("double").as("c"))
      .collect().map(r => (r.getString(0), r.getDate(1), r.getDouble(2)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2.toString).map(x => (x._2, x._3))).toMap
    val expected = bars.toSeq.flatMap { case (sym, rows) =>
      val a12 = 2.0 / 13.0; val a26 = 2.0 / 27.0
      var e12 = 0.0; var e26 = 0.0; var first = true
      val mb = scala.collection.mutable.ArrayBuffer.empty[Double]
      val db = scala.collection.mutable.ArrayBuffer.empty[Double]
      var d1 = 0.0; var d2 = 0.0; var h1 = false; var h2 = false
      rows.map { case (day, c) =>
        if (first) { first = false; e12 = c; e26 = c }
        else { e12 = a12 * c + (1.0 - a12) * e12
               e26 = a26 * c + (1.0 - a26) * e26 }
        val macd = e12 - e26
        mb += macd; val mw = mb.takeRight(10)
        val k1 = if (mw.max > mw.min) 100.0 * (macd - mw.min) / (mw.max - mw.min)
                 else 50.0
        d1 = if (!h1) { h1 = true; k1 } else d1 + 0.5 * (k1 - d1)
        db += d1; val dw = db.takeRight(10)
        val k2 = if (dw.max > dw.min) 100.0 * (d1 - dw.min) / (dw.max - dw.min)
                 else 50.0
        d2 = if (!h2) { h2 = true; k2 } else d2 + 0.5 * (k2 - d2)
        (sym, day.toString) -> d2
      }
    }
    val got = graft.operators.MarketOps.stc(ticks).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) -> r.getDouble(2)).toMap
    assert(got.size === expected.size)
    expected.foreach { case (k, v) =>
      assert(got(k) === v, s"bar $k")
      assert(got(k) >= 0.0 && got(k) <= 100.0, s"range $k")
    }
  }

  test("sceneChanges: census equals a recompute over the sampled frames") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 50)
    val frames = graft.pipeline.Multimodal.frameSummary(spark, docs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getLong(4) * 1000L / r.getLong(3))) // byte_sum*1000 div frame_len
      .groupBy(_._1)
    val got = graft.pipeline.Multimodal.sceneChanges(spark, docs)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.size === frames.size)
    frames.foreach { case (doc, rows) =>
      val mbs = rows.sortBy(_._2).map(_._3)
      val ds = mbs.sliding(2).collect { case Array(a, b) => math.abs(b - a) }
        .toSeq
      val expect = (mbs.length.toLong,
        ds.count(_ >= 80000L).toLong,
        if (ds.isEmpty) 0L else ds.max)
      assert(got(doc) === expect, s"doc $doc")
    }
  }

  test("bounceRate: crafted sessions count bounces per start day") {
    import spark.implicits._
    val base = 1700040000L // 2023-11-15T09:20Z — +2h stays inside the day
    def ts(s: Long) = new java.sql.Timestamp(s * 1000L)
    // user 1: one 2-event session (not a bounce); user 2: one event
    // (bounce); user 3: two events 2h apart → two 1-event sessions
    val events = Seq(
      (1L, ts(base), 10L, "view", 1.0, "{}"),
      (2L, ts(base + 60), 10L, "view", 1.0, "{}"),
      (3L, ts(base + 120), 20L, "view", 1.0, "{}"),
      (4L, ts(base + 200), 30L, "view", 1.0, "{}"),
      (5L, ts(base + 200 + 7200), 30L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = graft.operators.EventAnalytics.bounceRate(events).collect()
    assert(got.length === 1)
    assert(got(0).getLong(1) === 4L) // sessions
    assert(got(0).getLong(2) === 3L) // bounces
    assert(got(0).getDouble(3) === 0.75)
  }
}
