package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Semantic contracts of the r13 embedding additions: exact
  * driver-side recomputes (covariance) and a hand-computable fixture +
  * census-consistency gate (silhouette).
  */
class NewOpsR13Spec extends AnyFunSuite {
  import TestSpark._

  private def q6micro(x: Double): Long = {
    val s = x * 1000000.0
    (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toLong
  }

  test("embedCovariance matches an exact integer co-moment recompute") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getSeq[Float](1).toArray).toArray
    val dim = emb.head.length
    val q = emb.map(_.map(f => q6micro(f.toDouble)))
    val n = emb.length
    val got = Similarity.embedCovariance(Tables.embeddings(spark, sf))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getDouble(3)))))
      .toMap
    assert(got.size === dim * (dim + 1) / 2)
    // spot-check every diagonal plus a band of off-diagonals (full
    // dim² recompute is O(dim²·n) driver work — the sampled pairs
    // cover both code paths, i == j and i < j)
    val pairs = (0 until dim).map(i => (i, i)) ++
      (0 until dim - 1).map(i => (i, i + 1)) ++ Seq((0, dim - 1))
    for ((i, j) <- pairs) {
      val sx = q.map(v => BigInt(v(i))).sum
      val sy = q.map(v => BigInt(v(j))).sum
      val sxy = q.map(v => BigInt(v(i)) * BigInt(v(j))).sum
      val cov = (BigInt(n) * sxy - sx * sy).toDouble /
        (n.toLong * (n - 1)).toDouble / 1.0e12
      val (gn, gcov) = got((i.toLong, j.toLong))
      assert(gn === n.toLong, (i, j))
      assert(gcov === Some(cov), (i, j))
    }
    // semantic sanity: diagonal entries are variances — non-negative
    for (i <- 0 until dim)
      assert(got((i.toLong, i.toLong))._2.exists(_ >= 0.0), i)
  }

  test("silhouetteCensus on a hand-computable fixture") {
    import spark.implicits._
    val emb = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(10f, 10f)),
      (2L, Seq(1f, 0f)), (3L, Seq(9f, 10f)))
      .toDF("vec_id", "embedding")
    // k=2, 1 Lloyd round: init c0=(0,0), c1=(10,10); assignment
    // {0,2}→0, {1,3}→1; centroids → (0.5,0) and (9.5,10)
    val a0 = 0.25; val b0 = 9.5 * 9.5 + 100.0   // v0 and v1 (symmetric a)
    val a2 = 0.25; val b2 = 8.5 * 8.5 + 100.0   // v2 and v3
    def sil(a: Double, b: Double): Double = (b - a) / math.max(a, b)
    def meanSil(ss: Seq[Double]): Double = {
      val ssumD = ss.map(q6micro).sum / 1.0e6
      q6micro(ssumD / ss.length.toDouble) / 1.0e6
    }
    val want = Map(
      0L -> ((2L, meanSil(Seq(sil(a0, b0), sil(a2, b2))))),
      1L -> ((2L, meanSil(Seq(sil(a0, b0), sil(a2, b2))))))
    val got = KMeansOps.silhouetteCensus(emb, k = 2, iters = 1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got === want)
  }

  test("pcaTop matches the exact integer power-iteration recompute") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getSeq[Float](1).toArray)
    val dim = vecs.head.length
    val n = vecs.length
    val q = vecs.map(_.map(f => q6micro(f.toDouble)))
    // exact covariance (as embedCovariance emits it), then quantize
    val qcov = Array.tabulate(dim, dim) { (i, j) =>
      val sx = q.map(v => BigInt(v(i))).sum
      val sy = q.map(v => BigInt(v(j))).sum
      val sxy = q.map(v => BigInt(v(i)) * BigInt(v(j))).sum
      val cov = (BigInt(n) * sxy - sx * sy).toDouble /
        (n.toLong * (n - 1)).toDouble / 1.0e12
      q6micro(cov)
    }
    val v1 = Array.tabulate(dim)(i => qcov(i).map(BigInt(_)).sum)
    val v2 = Array.tabulate(dim)(i =>
      (0 until dim).map(j => BigInt(qcov(i)(j)) * v1(j)).sum)
    val num = (0 until dim).map(i => v2(i) * v1(i)).sum
    val den = (0 until dim).map(i => v1(i) * v1(i)).sum
    val lambda = if (den != 0)
      Some(num.toDouble / den.toDouble / 1000000.0) else None
    val mx = v2.map(_.abs).max
    val want = (0 until dim).map(i =>
      i.toLong -> ((if (mx != 0) Some(v2(i).toDouble / mx.toDouble) else None,
        lambda))).toMap
    val got = Similarity.pcaTop(Tables.embeddings(spark, sf)).collect()
      .map(r => r.getLong(0) ->
        ((Option.when(!r.isNullAt(1))(r.getDouble(1)),
          Option.when(!r.isNullAt(2))(r.getDouble(2))))).toMap
    assert(got === want)
    // semantic sanity: loadings are normalized, eigenvalue positive
    assert(got.values.flatMap(_._1).map(_.abs).max === 1.0)
    lambda.foreach(l => assert(l > 0.0))
  }

  test("bpeMerges counts adjacent character pairs exactly") {
    val texts = Tables.documents(spark, sf).select(col("text")).collect()
      .map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    for (t <- texts; w <- t.split(" ", -1) if w.length >= 2;
         p <- w.sliding(2))
      counts(p) = counts.getOrElse(p, 0L) + 1L
    val want = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(20)
    val got = TextOps.bpeMerges(Tables.documents(spark, sf), 20).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === want)
  }

  test("silhouetteCensus agrees with kmeansCensus clustering; scores in [0, 1]") {
    val census = KMeansOps.kmeansCensus(Tables.embeddings(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = KMeansOps.silhouetteCensus(Tables.embeddings(spark, sf))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(g => g._1 -> g._2).toMap === census,
      "silhouette must partition vectors exactly as the census")
    got.foreach { case (c, _, s) =>
      assert(s >= 0.0 && s <= 1.0, s"cluster $c mean_sil=$s")
    }
    assert(got.exists(_._3 > 0.0), "no separation at all — suspicious")
  }
}
