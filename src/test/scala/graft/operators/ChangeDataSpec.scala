package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

class ChangeDataSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val ticks = Tables.ticks(spark, sf).cache()

  test("mergeLatest keeps exactly one row per key, newest version wins") {
    val updates = ticks.filter(col("event_id") % 10 === 0)
      .withColumn("price", round(col("price") + 1.0, 2))
    val m = ChangeData.mergeLatest(ticks, updates).cache()
    assert(m.count() === ticks.count())
    assert(m.groupBy("event_id").count().filter(col("count") > 1).count() === 0)
    // every updated key surfaces version 2, every other key version 1
    assert(m.filter(col("event_id") % 10 === 0 && col("version") =!= 2).count() === 0)
    assert(m.filter(col("event_id") % 10 =!= 0 && col("version") =!= 1).count() === 0)
    m.unpersist()
  }

  test("mergeAudit price_sum reflects the +1 applied to updated rows") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.00, 1L), (2L, "a", 20.00, 2L), (10L, "b", 5.00, 3L))
      .toDF("event_id", "symbol", "price", "volume")
      .withColumn("ts", timestamp_micros(col("volume")))
    val updates = base.filter(col("event_id") === 2L)
      .withColumn("price", round(col("price") + 1.0, 2))
    val audit = ChangeData.mergeAudit(base, updates).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(audit("a") === ((2L, 31.00, 1L)))
    assert(audit("b") === ((1L, 5.00, 0L)))
  }

  test("merge of the rank-1 filter compiles to WindowGroupLimit") {
    val updates = ticks.filter(col("event_id") % 10 === 0)
    val plan = ChangeData.mergeLatest(ticks, updates)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"expected WindowGroupLimit in:\n$plan")
  }
}
