package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed access to the shared test tables plus the canonical tick view.
  *
  * The reference engine models a tick as `{timestamp, price, volume}`
  * keyed by symbol (/root/reference/timeseries_db.hpp:19-24), one data
  * directory per symbol (/root/reference/README.md:66-76). Here the same
  * logical stream is a declarative view over the `events` table
  * (symbol=event_type, price=value, volume=user_id), so every operator
  * downstream consumes a plain `(event_id, symbol, ts, price, volume)`
  * DataFrame and runs unchanged over any conforming source — batch
  * parquet, a [[graft.tsdb.TickStore]], or a stream.
  *
  * Scale note: these are lazy scans — Catalyst pushes filters and prunes
  * columns into the parquet reader, so a 100 TB `events` table is only
  * read in the row groups / columns a query touches.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Every timestamp column in the regenerated testdata is
    // TIMESTAMP_NTZ; comparisons against session-zoned literals wrap
    // the COLUMN in a cast, which V1 parquet pushdown cannot
    // translate. The rewrite rule recovers row-group pruning for
    // every such filter, so install it on whatever session is in use
    // (idempotent; driver-created sessions have no extensions hook).
    graft.plans.GraftOptimizations.install(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Canonical tick view: (event_id, symbol, ts, price, volume). */
  def ticks(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir).select(
      col("event_id"),
      col("event_type").as("symbol"),
      col("ts"),
      col("value").as("price"),
      col("user_id").as("volume"))

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def part(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "part")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
  /** `events.parquet` stores `ts` as parquet TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false, which Spark reads as TIMESTAMP_NTZ. Every
    * graft session pins `spark.sql.session.timeZone=UTC`, so the cast
    * to the session-zoned TIMESTAMP is the identity on the stored µs
    * value — the same instants DuckDB sees scanning the file as its
    * (naive) TIMESTAMP.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
      .withColumn("ts", col("ts").cast("timestamp"))

  /** Raw events with `ts` as the stored TIMESTAMP_NTZ column —
    * predicates on this column push down to parquet row-group stats
    * directly (the tz-cast view in [[events]] needs the
    * TimestampFilterPushdown rule to get there). Time-critical scans
    * filter here with TIMESTAMP_NTZ literals.
    */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events")
}
