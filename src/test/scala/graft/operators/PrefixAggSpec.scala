package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The chunked prefix aggregation (MarketOps "distributed prefix
  * aggregation" section) must (a) return BIT-IDENTICAL results to the
  * naive single-window plan it replaces — integer sums are exact and MAX
  * is order-free, so nothing may drift — and (b) actually partition the
  * detail-side window by (symbol, chunk key), not by symbol alone:
  * partitioning is the point, it bounds any task's input to one
  * symbol-day instead of one symbol's entire 100 TB history.
  */
class PrefixAggSpec extends AnyFunSuite {
  import TestSpark._

  private def ticks = graft.core.Tables.ticks(spark, sf)
  private def tickOrder =
    Window.partitionBy("symbol").orderBy(col("ts"), col("event_id"))

  /** Rows of both frames compared as sorted seqs (exact equality —
    * doubles must be bit-identical, that's the contract).
    */
  private def assertSame(chunked: DataFrame, naive: DataFrame): Unit = {
    val a = chunked.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = naive.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.length === b.length)
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  /** Every unbounded-frame Window in the plan must partition by ≥2
    * columns (symbol + chunk key). Bounded detail windows don't appear
    * in these five operators; the per-day offsets window partitions by
    * symbol alone but runs over the tiny totals table — identified (and
    * excused) by its input being an Aggregate.
    */
  private def detailWindowsArePartitionedByChunk(df: DataFrame): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, Filter, LogicalPlan, Project, ResolvedHint, SubqueryAlias,
      Window => LWindow}
    // the offsets window sits DIRECTLY over the per-day totals Aggregate
    // (modulo projections) — that one may partition by symbol alone
    def sitsOverAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate     => true
      case pr: Project      => sitsOverAggregate(pr.child)
      case f: Filter        => sitsOverAggregate(f.child)
      case w: LWindow       => sitsOverAggregate(w.child)
      case a: SubqueryAlias => sitsOverAggregate(a.child)
      case h: ResolvedHint  => sitsOverAggregate(h.child)
      case _                => false
    }
    // the ANALYZED plan: partitionSpec is fixed at analysis, and — unlike
    // optimizedPlan — no cache substitution can swallow the Window nodes
    // when a concurrently-running suite has .cache()'d the same plan
    val windows = df.queryExecution.analyzed.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected Window operators in the plan")
    val detail = windows.filterNot(w => sitsOverAggregate(w.child))
    assert(detail.nonEmpty, "expected a detail-side Window over the tick scan")
    detail.foreach { w =>
      assert(w.partitionSpec.size >= 2,
        s"detail window must partition by (symbol, chunk), got ${w.partitionSpec}")
    }
  }

  test("runningVolume matches the single-window plan bit-for-bit") {
    val naive = ticks.select(col("event_id"), col("symbol"),
      sum(col("volume")).over(tickOrder.rowsBetween(Window.unboundedPreceding, 0))
        .as("cum_volume"))
    assertSame(MarketOps.runningVolume(ticks), naive)
    detailWindowsArePartitionedByChunk(MarketOps.runningVolume(ticks))
  }

  test("obv matches the single-window plan bit-for-bit") {
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    val chg = col("price").cast(dec) - lag(col("price"), 1).over(tickOrder).cast(dec)
    val naive = ticks.withColumn("chg", chg)
      .select(col("event_id"), col("symbol"),
        sum(when(col("chg") > 0, col("volume"))
            .when(col("chg") < 0, -col("volume"))
            .otherwise(lit(0L)))
          .over(tickOrder.rowsBetween(Window.unboundedPreceding, 0))
          .as("obv"))
    assertSame(MarketOps.obv(ticks), naive)
    detailWindowsArePartitionedByChunk(MarketOps.obv(ticks))
  }

  test("drawdown matches the single-window plan bit-for-bit") {
    val runMax =
      max(col("price")).over(tickOrder.rowsBetween(Window.unboundedPreceding, 0))
    val naive = ticks
      .select(col("event_id"), col("symbol"), col("price"), runMax.as("run_max"))
      .withColumn("drawdown",
        when(col("run_max") > 0.0, col("price") / col("run_max") - 1.0).otherwise(0.0))
      .select(col("event_id"), col("symbol"), col("drawdown"))
    assertSame(MarketOps.drawdown(ticks), naive)
    detailWindowsArePartitionedByChunk(MarketOps.drawdown(ticks))
  }

  test("volumeBars matches the single-window plan bit-for-bit") {
    val preCum = coalesce(
      sum(col("volume")).over(tickOrder.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val naive = ticks.withColumn("pre_cum", preCum)
      .withColumn("bar_id", expr("pre_cum div 10000"))
      .groupBy(col("symbol"), col("bar_id"))
      .agg(count(lit(1)).as("n_ticks"),
        min_by(col("price"), col("ts")).as("open"),
        max(col("price")).as("high"),
        min(col("price")).as("low"),
        max_by(col("price"), col("ts")).as("close"),
        sum(col("volume")).as("bar_volume"))
    assertSame(MarketOps.volumeBars(ticks, 10000L), naive)
    detailWindowsArePartitionedByChunk(MarketOps.volumeBars(ticks, 10000L))
  }

  test("lateArrivals matches the single-window plan bit-for-bit") {
    val arrival = Window.partitionBy("symbol").orderBy("event_id")
    val maxPrior = max(unix_micros(col("ts")))
      .over(arrival.rowsBetween(Window.unboundedPreceding, -1))
    val naive = ticks.withColumn("late_us",
        when(maxPrior.isNotNull && unix_micros(col("ts")) < maxPrior,
          maxPrior - unix_micros(col("ts"))).otherwise(0L))
      .groupBy(col("symbol"))
      .agg(count(lit(1)).as("n_ticks"),
        sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_late"),
        max(col("late_us")).as("max_late_us"),
        sum(col("late_us")).as("sum_late_us"))
    // small chunkRows so sf0.001 actually spans multiple chunks
    assertSame(MarketOps.lateArrivals(ticks, chunkRows = 512L), naive)
    detailWindowsArePartitionedByChunk(MarketOps.lateArrivals(ticks, chunkRows = 512L))
  }
}
