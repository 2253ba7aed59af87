package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** Checkpoint-recovery evidence for the streaming surface: a query
  * stopped mid-corpus and RESTARTED from the same checkpoint must (a)
  * not reprocess what it committed — exactly-once through the file
  * sink's _spark_metadata commit log — and (b) recover stateful window
  * state so the final answer equals the batch aggregation. This is the
  * operational property the oracled streaming queries assume; here it
  * is exercised across an actual process-the-first-half / stop /
  * add-second-half / restart cycle.
  */
class StreamRecoverySpec extends AnyFunSuite {
  import TestSpark._

  private def ticks: DataFrame = Tables.ticks(spark, sf)

  /** Write `df`'s rows as one parquet file named `name` in `dir`. */
  private def stage(df: DataFrame, dir: java.nio.file.Path, name: String): Unit = {
    val tmp = Files.createTempDirectory("graft_rec_stage_")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val listing = Files.list(tmp)
    val part =
      try listing.filter(_.toString.endsWith(".parquet")).findFirst().get()
      finally listing.close()
    Files.move(part, dir.resolve(name))
  }

  test("file-sink ingest restarts from checkpoint exactly-once") {
    val base = Files.createTempDirectory("graft_recovery_")
    val in = Files.createDirectory(base.resolve("in"))
    val outPath = s"$base/data"
    val half1 = ticks.filter(col("event_id") < 500)
    val half2 = ticks.filter(col("event_id") >= 500)
    stage(half1, in, "chunk_a.parquet")

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema(ticks.schema)
        .parquet(in.toString)
        .writeStream.format("parquet")
        .option("path", outPath)
        .option("checkpointLocation", s"$base/chk")
        .start()
      q.processAllAvailable()
      q.stop()
    }

    runOnce()
    val afterFirst = spark.read.parquet(outPath)
    assert(afterFirst.count() === half1.count())

    stage(half2, in, "chunk_b.parquet")
    runOnce() // SAME checkpoint: must pick up only chunk_b
    val out = spark.read.parquet(outPath)
    assert(out.count() === ticks.count(), "restart must not drop rows")
    // exactly-once: no event committed twice across the restart
    assert(out.groupBy(col("event_id")).count()
      .filter(col("count") > 1).count() === 0,
      "restart must not duplicate committed rows")
  }

  test("stateful windowed aggregation recovers state across restart") {
    val base = Files.createTempDirectory("graft_recovery_agg_")
    val in = Files.createDirectory(base.resolve("in"))
    val outPath = s"$base/bars"
    // split INSIDE window boundaries so bars straddle the restart: the
    // second run must merge chunk-b ticks into window state rebuilt
    // from the checkpoint, not start fresh
    val half1 = ticks.filter(col("event_id") < 500)
    val half2 = ticks.filter(col("event_id") >= 500)
    // sentinel far past max event time flushes every window at the end
    val maxTs = ticks.agg(max(col("ts"))).head().getTimestamp(0)
    val sentinel = spark.range(1)
      .select(lit(-1L).as("event_id"), lit("~sentinel~").as("symbol"),
        (lit(maxTs) + expr("interval 2 hours")).as("ts"),
        lit(0.0).as("price"), lit(0L).as("volume"))
    stage(half1, in, "chunk_a.parquet")

    def runOnce(): Unit = {
      val bars = spark.readStream
        .schema(ticks.schema)
        .parquet(in.toString)
        .withWatermark("ts", "10 minutes")
        .groupBy(window(col("ts"), "1 hour"), col("symbol"))
        .agg(count(lit(1)).as("n_ticks"), sum(col("volume")).as("volume"))
        .select(col("window.start").as("bar_start"), col("symbol"),
          col("n_ticks"), col("volume"))
      val q = bars.writeStream.outputMode("append")
        .format("parquet")
        .option("path", outPath)
        .option("checkpointLocation", s"$base/chk")
        .start()
      q.processAllAvailable()
      q.stop()
    }

    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      runOnce()
      stage(half2, in, "chunk_b.parquet")
      stage(sentinel, in, "zz_sentinel.parquet")
      runOnce() // restart: window state for straddled bars must resume
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)

    val got = spark.read.parquet(outPath)
      .filter(col("symbol") =!= "~sentinel~")
      .select(unix_micros(col("bar_start")).as("b"), col("symbol"),
        col("n_ticks"), col("volume"))
    val want = ticks
      .groupBy(window(col("ts"), "1 hour"), col("symbol"))
      .agg(count(lit(1)).as("n_ticks"), sum(col("volume")).as("volume"))
      .select(unix_micros(col("window.start")).as("b"), col("symbol"),
        col("n_ticks"), col("volume"))
    assert(got.count() === want.count(),
      "every batch bar must appear exactly once after recovery")
    assert(got.except(want).count() === 0 && want.except(got).count() === 0,
      "recovered streamed bars must equal the batch aggregation")
  }
}
