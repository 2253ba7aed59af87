package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Property tests for the native bounded top-k aggregates and the
  * OHLC tie key: randomized inputs (duplicate keys, duplicate
  * (key, id) pairs, skewed groups, many partitions) must agree with
  * the rank-window formulation exactly, and the zero-padded tie key's
  * lexicographic order must equal the numeric (ts, event_id) order.
  */
class TopKAggregatesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def rows(seed: Long, n: Int): Seq[(Int, Long, Long)] = {
    val g = for {
      grp <- Gen.chooseNum(0, 3)
      key <- Gen.chooseNum(0L, 30L) // narrow: forces duplicate keys
      id <- Gen.chooseNum(0L, 1000000L)
    } yield (grp, key, id)
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
  }

  test("graft_min_k equals the rank window on randomized duplicate-heavy data") {
    GraftFunctions.register(spark)
    val df = rows(7L, 400).toDF("grp", "keynum", "id")
      .withColumn("mk", lpad(col("keynum").cast("string"), 4, "0"))
      .repartition(7)
    val viaAgg = df.groupBy("grp")
      .agg(expr("graft_min_k(mk, id, 5)").as("top"))
      .select(col("grp"), posexplode(col("top")).as(Seq("i", "kd")))
      .select(col("grp"), (col("i") + 1).as("rk"), col("kd.k").as("mk"),
        col("kd.id").as("id"))
    val viaWin = df.withColumn("rk",
        row_number().over(Window.partitionBy("grp").orderBy(col("mk"), col("id"))))
      .filter(col("rk") <= 5)
      .select(col("grp"), col("rk"), col("mk"), col("id"))
    val a = viaAgg.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = viaWin.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.toSeq === b.toSeq)
  }

  test("graft_max_k equals the rank window on randomized duplicate-heavy data") {
    GraftFunctions.register(spark)
    val df = rows(23L, 400).toDF("grp", "keynum", "id").repartition(5)
    val viaAgg = df.groupBy("grp")
      .agg(expr("graft_max_k(keynum, id, 4)").as("top"))
      .select(col("grp"), posexplode(col("top")).as(Seq("i", "kd")))
      .select(col("grp"), (col("i") + 1).as("rk"), col("kd.k").as("keynum"),
        col("kd.id").as("id"))
    val viaWin = df.withColumn("rk",
        row_number().over(Window.partitionBy("grp")
          .orderBy(col("keynum").desc, col("id"))))
      .filter(col("rk") <= 4)
      .select(col("grp"), col("rk"), col("keynum"), col("id"))
    val a = viaAgg.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = viaWin.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.toSeq === b.toSeq)
  }

  test("graft_min_k returns fewer than k rows when the group is small") {
    GraftFunctions.register(spark)
    val df = Seq((1, "a", 10L), (1, "b", 20L)).toDF("grp", "mk", "id")
    val out = df.groupBy("grp").agg(expr("graft_min_k(mk, id, 5)").as("top"))
      .select(explode(col("top"))).collect()
    assert(out.length === 2)
  }

  test("the lpad tie key's string order equals numeric (ts_us, event_id) order") {
    // both fields pad to 20 — the full non-negative int64 range (19
    // digits); lpad truncates longer inputs, so a narrower pad would
    // silently collide for ids past its width (the r8 widening)
    val pair = for {
      ts <- Gen.chooseNum(0L, 4102444800000000L) // through year 2100, µs
      id <- Gen.chooseNum(0L, Long.MaxValue)     // full int64 range
    } yield (ts, id)
    val ps = (0 until 500).flatMap(i =>
      pair.apply(Gen.Parameters.default, Seed(i.toLong)))
    def key(t: (Long, Long)): String =
      f"${t._1}%020d${t._2}%020d"
    val numeric = ps.sorted
    val lexical = ps.sortBy(key)
    assert(numeric === lexical)
  }
}
