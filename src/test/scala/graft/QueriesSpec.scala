package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run end-to-end at sf0.001; the DuckDB
  * hash-compare is the driver's job, so here we assert execution plus
  * basic row-count expectations.
  */
class QueriesSpec extends AnyFunSuite {
  import TestSpark._

  // Near-dup candidate generation can legitimately be empty on 500
  // random docs; everything else must produce rows.
  private val mayBeEmpty =
    Set("q_dedup_minhash", "q_embed_dedup", "q_ngram_jaccard", "q_simhash_pairs")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("grouping sets: levels {0,2,3}, grand total matches the fact count") {
    import org.apache.spark.sql.functions._
    val gs = graft.operators.Relational.groupingSetsPricing(spark, sf).cache()
    val levels = gs.select("g_level").distinct().collect().map(_.getLong(0)).toSet
    assert(levels === Set(0L, 2L, 3L))
    val grand = gs.filter(col("g_level") === 3L).collect()
    assert(grand.length === 1)
    val lineitemN = graft.core.Tables.lineitem(spark, sf).count()
    assert(grand(0).getAs[Long]("n") === lineitemN)
    // detail rows partition the fact: level-0 counts sum to the total
    val detailSum = gs.filter(col("g_level") === 0L)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(detailSum === lineitemN)
    gs.unpersist()
  }

  test("window extras: rank quotients in [0,1], third_price from the partition") {
    import org.apache.spark.sql.functions._
    val we = graft.operators.Relational.windowExtras(spark, sf).cache()
    // scale guard (r10): no Window may partition the FACT rows by the
    // ≤5-value priority key alone — priority-only windows are allowed
    // solely over the tiny band-counts aggregate (count-band scaffold)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LW}
    we.queryExecution.analyzed.collect {
      case w: LW if w.partitionSpec.map(_.references.map(_.name).mkString)
          == Seq("o_orderpriority") =>
        assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
          "priority-only window must run over the band-counts aggregate")
    }
    assert(we.filter(col("pr") < 0 || col("pr") > 1 ||
      col("cd") <= 0 || col("cd") > 1).count() === 0)
    // third_price is either the sentinel or an actual price in the partition
    val prices = graft.core.Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 7 === 0)
      .select(col("o_totalprice")).distinct()
    val badThird = we.filter(col("third_price") =!= -1.0)
      .join(prices, we("third_price") === prices("o_totalprice"), "left_anti")
      .count()
    assert(badThird === 0)
    we.unpersist()
  }

  test("unpivot: 4 measures per returnflag, values match the wide aggregate") {
    import org.apache.spark.sql.functions._
    val up = graft.operators.Relational.unpivotMeasures(spark, sf).cache()
    val flags = up.select("l_returnflag").distinct().count()
    assert(up.count() === flags * 4)
    val qtyLong = up.filter(col("measure") === "sum_qty")
      .agg(sum("value")).collect()(0).getDouble(0)
    val qtyWide = graft.core.Tables.lineitem(spark, sf)
      .agg(sum(col("l_quantity").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
        .cast("double")).collect()(0).getDouble(0)
    assert(math.abs(qtyLong - qtyWide) < 1e-6)
    up.unpersist()
  }
}
