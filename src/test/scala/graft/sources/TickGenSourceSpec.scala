package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TickGenSourceSpec extends AnyFunSuite {
  import TestSpark._

  private def gen(rows: Long, parts: Int = 4) =
    spark.read.format("tickgen")
      .option("rows", rows).option("partitions", parts).load()

  test("generates exactly `rows` ticks across partitions") {
    assert(gen(1000, 7).count() === 1000)
    assert(gen(5, 32).count() === 5)
  }

  test("values follow the published id arithmetic") {
    val rows = gen(20, 2).orderBy("id").collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) === TickGenSource.symbols((id % 5).toInt).toString)
      assert(r.getDouble(3) === TickGenSource.priceOf(id))
      assert(r.getLong(4) === TickGenSource.volumeOf(id))
    }
  }

  test("column pruning reaches the reader") {
    val plan = gen(10).select("symbol", "volume").queryExecution
      .executedPlan.toString
    assert(plan.contains("symbol") && !plan.contains("price"))
    // pruned read still correct
    val v = gen(10).select(sum("volume")).head().getLong(0)
    assert(v === (0L until 10L).map(TickGenSource.volumeOf).sum)
  }

  test("deterministic across reads") {
    val a = gen(500).agg(sum("price")).head().getDouble(0)
    val b = gen(500).agg(sum("price")).head().getDouble(0)
    assert(a === b)
  }

  test("many-symbol universe: 10k distinct symbols, balanced, windows stay per-symbol") {
    import org.apache.spark.sql.expressions.Window
    val n = 10000
    val df = spark.read.format("tickgen")
      .option("rows", 50000).option("partitions", 8)
      .option("symbols", n).load()
    // exactly n uniform symbols, round-robin balanced (50000/10000 = 5 each)
    val perSym = df.groupBy("symbol").count()
    assert(perSym.count() === n)
    assert(perSym.filter(col("count") =!= 5).count() === 0)
    // a per-symbol window over the 10k-symbol universe partitions by
    // symbol correctly: each row's lag is its own symbol's previous id
    // (ids of one symbol are exactly n apart by round-robin)
    val w = Window.partitionBy("symbol").orderBy("id")
    val bad = df.withColumn("prev", lag("id", 1).over(w))
      .filter(col("prev").isNotNull && col("prev") =!= col("id") - n)
    assert(bad.count() === 0)
    // the default universe is untouched (oracle contract)
    assert(gen(10).select("symbol").distinct().count() === 5)
  }
}
