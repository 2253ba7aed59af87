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
}
