package graft.streaming

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming ingest and windowed aggregation — the Spark
  * analog of the reference's background writer thread + live queries
  * (/root/reference/timeseries_db.hpp:87-100: write queue drained by
  * `writer_loop` while readers run concurrently).
  *
  * Batch parquet drives the stream here (one file = one micro-batch);
  * in production the same plans run over Kafka/files unchanged. The
  * memory sink + `processAllAvailable` makes the smoke path
  * synchronous and deterministic.
  */
object Streams {
  private val counter = new AtomicInteger(0)

  final case class VwapIn(symbol: String, price: Double, volume: Long)
  final case class VwapState(n: Long, pv: Double, v: Long)
  final case class VwapOut(symbol: String, n_ticks: Long, running_vwap: Double)

  private val rawEventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as raw long
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def tickStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(rawEventsSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .select(col("event_id"), col("event_type").as("symbol"),
        timestamp_micros(expr("ts div 1000")).as("ts"),
        col("value").as("price"), col("user_id").as("volume"))
  }

  /** Streaming ingest → parquet sink with checkpoint (exactly-once),
    * then scan the sink back. Mirrors reference append path running in
    * the background while queries read committed data.
    */
  def streamIngest(spark: SparkSession, dir: String): DataFrame = {
    val base = Files.createTempDirectory("graft_stream_ingest_").toString
    val q = tickStream(spark, dir).writeStream
      .format("parquet")
      .option("path", s"$base/data")
      .option("checkpointLocation", s"$base/chk")
      .start()
    q.processAllAvailable()
    q.stop()
    spark.read.parquet(s"$base/data")
      .groupBy(col("symbol")).agg(count(lit(1)).as("n_ticks"))
      .orderBy("symbol")
  }

  /** Continuous aggregate: stream ticks into an incrementally
    * maintained 1-hour bar rollup persisted as parquet (checkpointed,
    * exactly-once) — the TSDB "downsampled materialized view" pattern.
    * Readers query the small rollup instead of re-scanning raw ticks;
    * at 100 TB the rollup is ~4 orders of magnitude smaller.
    */
  def materializedBars(spark: SparkSession, dir: String): DataFrame = {
    val base = Files.createTempDirectory("graft_matbars_").toString
    val bars = tickStream(spark, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("symbol"))
      .agg(count(lit(1)).as("n_ticks"),
        min(col("price")).as("low"), max(col("price")).as("high"),
        sum(col("volume")).as("volume"))
      .select(col("window.start").as("bar_start"), col("symbol"),
        col("n_ticks"), col("low"), col("high"), col("volume"))
    val q = bars.writeStream.outputMode("append")
      .format("parquet")
      .option("path", s"$base/bars")
      .option("checkpointLocation", s"$base/chk")
      .partitionBy("symbol")
      .start()
    q.processAllAvailable()
    q.stop()
    // query the rollup store, not the raw ticks
    spark.read.parquet(s"$base/bars")
      .select(unix_micros(col("bar_start")).as("bar_start_us"), col("symbol"),
        col("n_ticks"), col("low"), col("high"), col("volume"))
      .orderBy("symbol", "bar_start_us")
  }

  /** Per-symbol running state maintained with flatMapGroupsWithState —
    * the custom-state analog of the reference's per-symbol in-memory
    * store fed by its writer thread. Emits one running (count, vwap)
    * snapshot per symbol per micro-batch; state is O(symbols).
    */
  def streamRunningVwap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._

    val name = s"graft_vwap_${counter.incrementAndGet()}"
    val ticks = tickStream(spark, dir)
      .select(col("symbol"), col("price"), col("volume")).as[VwapIn]
    val updated = ticks.groupByKey(_.symbol)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (sym: String, rows: Iterator[VwapIn], state: GroupState[VwapState]) =>
          var s = state.getOption.getOrElse(VwapState(0L, 0.0, 0L))
          rows.foreach { r => s = VwapState(s.n + 1, s.pv + r.price * r.volume, s.v + r.volume) }
          state.update(s)
          Iterator.single(VwapOut(sym, s.n, if (s.v == 0) 0.0 else s.pv / s.v))
      }
    val q = updated.toDF().writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name).orderBy("symbol", "n_ticks")
  }

  /** Streaming 1-minute OHLC-style bars with a 10-minute watermark:
    * late ticks inside the watermark still land in their bar; bars
    * finalize (append mode) once the watermark passes.
    */
  def streamBars(spark: SparkSession, dir: String): DataFrame = {
    val name = s"graft_bars_${counter.incrementAndGet()}"
    val bars = tickStream(spark, dir)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("symbol"))
      .agg(count(lit(1)).as("n_ticks"),
        min(col("price")).as("low"), max(col("price")).as("high"),
        sum(col("volume")).as("volume"))
    val q = bars.writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
      .select(unix_micros(col("window.start")).as("bar_start_us"), col("symbol"),
        col("n_ticks"), col("low"), col("high"), col("volume"))
      .orderBy("symbol", "bar_start_us")
  }
}
