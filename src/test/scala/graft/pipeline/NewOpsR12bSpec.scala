package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables
import graft.operators.{EventAnalytics, Relational}

/** Semantic contracts of the r12 text/clustering/events/OLAP batch —
  * each operator checked against an independent driver-side brute-force
  * recompute (exact equality; the oracle hash alone can be green with
  * wrong semantics).
  */
class NewOpsR12bSpec extends AnyFunSuite {
  import TestSpark._

  private def q6micro(x: Double): Long = {
    val s = x * 1000000.0
    (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toLong
  }

  private lazy val docs: Array[(Long, String, String)] =
    Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("zipfSlope matches a brute-force per-source recompute") {
    val got = TextOps.zipfSlope(Tables.documents(spark, sf)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    val bySource = docs.groupBy(_._2)
    assert(got.keySet === bySource.keySet)
    for ((src, ds) <- bySource) {
      val counts = ds.flatMap(_._3.split(" ", -1))
        .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      val top = counts.sortBy { case (w, c) => (-c, w) }.take(100)
      val xs = top.indices.map(i => q6micro(math.log((i + 1).toDouble)))
      val ys = top.map(t => q6micro(math.log(t._2.toDouble)))
      val n = top.size.toDouble
      val sx = xs.map(BigInt(_)).sum.toDouble / 1e6
      val sy = ys.map(BigInt(_)).sum.toDouble / 1e6
      val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * BigInt(b) }.sum
        .toDouble / 1e12
      val sxx = xs.map(a => BigInt(a) * BigInt(a)).sum.toDouble / 1e12
      val dx = sxx - sx * sx / n
      val want =
        if (n > 1.0 && dx != 0.0)
          Some(BigDecimal((sxy - sx * sy / n) / dx)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0)
        else None
      assert(got(src) === ((top.size.toLong, want)), src)
      // power-law sanity: natural-ish text has a negative slope
      want.foreach(s => assert(s < 0.0, s"$src slope should be negative"))
    }
  }

  test("pairLift ranks exp-PMI over exact counts (top-20, tie-broken)") {
    val ws = docs.map(_._3.toLowerCase.split(" ", -1))
    val uni = ws.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val nTotal = ws.map(_.length.toLong).sum
    val bi = ws.filter(_.length >= 2)
      .flatMap(a => a.sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = bi.toSeq.filter(_._2 >= 5L).map { case ((w1, w2), nab) =>
      val lift = (nab.toDouble * nTotal.toDouble) /
        (uni(w1).toDouble * uni(w2).toDouble)
      (w1, w2, nab, uni(w1), uni(w2), lift)
    }.sortBy { case (w1, w2, _, _, _, l) => (-l, w1, w2) }.take(20)
      .map { case (w1, w2, nab, na, nb, l) =>
        (w1, w2, nab, na, nb,
          BigDecimal(l).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    val got = TextOps.pairLift(Tables.documents(spark, sf)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.toSeq === want)
    assert(got.nonEmpty)
  }

  test("dfStopwords returns the highest-df tokens with exact shares") {
    val dfm = docs.flatMap(d => d._3.split(" ", -1).distinct.map((_, d._1)))
      .groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nDocs = docs.length.toLong
    val want = dfm.toSeq.sortBy { case (w, c) => (-c, w) }.take(20)
      .map { case (w, c) => (w, c, nDocs,
        BigDecimal(c.toDouble / nDocs.toDouble)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) }
    val got = TextOps.dfStopwords(Tables.documents(spark, sf)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === want)
    // the corpus's article stopwords must surface
    assert(got.map(_._1).contains("the") || got.map(_._1).contains("a"))
  }

  test("kmeansCensus reproduces a sequential-fold Lloyd recompute") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    val k = 4; val iters = 2
    def sqDist6(v: Array[Double], c: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < v.length) { val d = v(i) - c(i); acc += d * d; i += 1 }
      // mirror Spark's ROUND(double, 6) (BigDecimal half-up), not the
      // DuckDB float-scale — this spec pins the Spark semantics
      BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    var cents: Seq[(Int, Array[Double])] =
      (0 until k).map(i => i -> vecs(i.toLong).clone())
    def assign(): Map[Long, Int] = vecs.map { case (vid, v) =>
      vid -> cents.map { case (ci, c) => (sqDist6(v, c), ci) }.min._2
    }
    for (_ <- 1 to iters) {
      val a = assign()
      cents = a.groupBy(_._2).toSeq.sortBy(_._1).map { case (c, m) =>
        val members = m.keys.toSeq
        val dim = vecs(members.head).length
        c -> Array.tabulate(dim) { p =>
          val micro = members.map(vid => BigInt(q6micro(vecs(vid)(p)))).sum
          val sDouble = new java.math.BigDecimal(micro.bigInteger)
            .movePointLeft(6).doubleValue()
          val m6 = q6micro(sDouble / members.size.toDouble)
          new java.math.BigDecimal(m6).movePointLeft(6).doubleValue()
        }
      }
    }
    val fa = assign()
    val want = fa.groupBy(_._2).toSeq.sortBy(_._1).map { case (c, m) =>
      (c.toLong, m.size.toLong, m.keys.min)
    }
    val got = KMeansOps.kmeansCensus(Tables.embeddings(spark, sf), k, iters)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === want)
    assert(got.map(_._2).sum === vecs.size.toLong)
  }

  test("anomalyDays flags exactly the trailing-7 z >= 2 days") {
    val events = Tables.events(spark, sf)
      .select(col("event_type"), to_date(col("ts")).cast("string").as("day"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val daily = events.groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .map { case ((t, d), n) => (t, d, n) }
    val want = daily.groupBy(_._1).toSeq.flatMap { case (t, ds) =>
      val sorted = ds.sortBy(_._2)
      sorted.indices.flatMap { i =>
        if (i < 7) None
        else {
          val w = sorted.slice(i - 7, i).map(_._3)
          val s = w.sum.toDouble
          val sq = w.map(c => BigInt(c) * BigInt(c)).sum.toDouble
          val mean = s / 7.0
          val va = (sq - s * s / 7.0) / 6.0
          val sd = math.sqrt(math.max(va, 0.0))
          if (sd > 0.0) {
            val z = BigDecimal((sorted(i)._3.toDouble - mean) / sd)
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
            if (math.abs(z) >= 2.0) Some((t, sorted(i)._2, sorted(i)._3, z))
            else None
          } else None
        }
      }
    }.sortBy(t => (t._1, t._2))
    val got = EventAnalytics.anomalyDays(Tables.events(spark, sf)).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got === want)
  }

  test("audienceOverlap computes exact pairwise user-base Jaccard") {
    val du = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val byType = du.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val types = byType.keys.toSeq.sorted
    val want = (for {
      a <- types; b <- types if a < b
      inter = (byType(a) & byType(b)).size.toLong if inter > 0
    } yield (a, b, byType(a).size.toLong, byType(b).size.toLong, inter,
      BigDecimal(inter.toDouble /
        (byType(a).size + byType(b).size - inter).toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(t => (t._1, t._2))
    val got = EventAnalytics.audienceOverlap(Tables.events(spark, sf))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got === want)
  }

  test("newVsReturning partitions each day's actives by first-ever day") {
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).cast("string").as("day"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val firstDay = ev.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val want = ev.map(t => (t._2, t._1)).distinct.groupBy(_._1).toSeq
      .map { case (day, us) =>
        val nu = us.count(u => firstDay(u._2) == day).toLong
        val dau = us.size.toLong
        (day, dau, nu, dau - nu,
          BigDecimal(nu.toDouble / dau.toDouble)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sortBy(_._1)
    val got = EventAnalytics.newVsReturning(Tables.events(spark, sf))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got === want)
    // growth-accounting invariant: day-1 actives are all new
    assert(got.head._2 === got.head._3)
  }

  test("bigramEntropy reproduces the quantized p·ln(p) sums per source") {
    def entropy(counts: Map[String, Long]): (Long, Double) = {
      val n = counts.values.sum
      val micro = counts.values.map { c =>
        val p = c.toDouble / n.toDouble
        q6micro(p * math.log(p))
      }.sum
      (n, -(micro.toDouble / 1e6) / 0.6931471805599453 + 0.0)
    }
    val bySource = docs.groupBy(_._2)
    val got = TextOps.bigramEntropy(Tables.documents(spark, sf)).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    for ((src, ds) <- bySource) {
      val toks = ds.map(_._3.split(" ", -1))
      val uni = toks.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val bi = toks.filter(_.length >= 2)
        .flatMap(a => a.sliding(2).map(p => p(0) + " " + p(1)))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val (n1, h1) = entropy(uni)
      val (n2, h2) = entropy(bi)
      assert(got(src) === ((n1, n2, h1, h2, h2 - h1)), src)
      // conditional entropy can't exceed the bigram entropy
      assert(h2 - h1 <= h2 + 1e-12, src)
    }
  }

  test("skyline equals the brute-force O(n^2) dominance frontier") {
    val orders = Tables.orders(spark, sf)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).cast("string"),
        col("o_totalprice").cast("decimal(12,2)"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getDecimal(2).unscaledValue().longValue()))
    val want = orders.filter { case (_, d, p) =>
      !orders.exists { case (_, d2, p2) =>
        (d2 > d && p2 >= p) || (d2 == d && p2 > p)
      }
    }.map(_._1).sorted.toSeq
    val got = Relational.skyline(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(got === want)
    assert(got.nonEmpty)
  }
}
