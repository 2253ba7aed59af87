package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tsdb.TickStore

/** Command-line parity with the reference `tsdb_cli`
  * (/root/reference/cli.cpp:10-16):
  *
  * {{{
  * runMain graft.Cli insert <symbol> <epoch_sec> <price> <volume>
  * runMain graft.Cli query <symbol> <start_sec> <end_sec>
  * runMain graft.Cli last <symbol> <count>
  * runMain graft.Cli benchmark <symbol> <tick_count>
  * runMain graft.Cli import <symbol> <csv_file>
  * }}}
  *
  * Data directory: `GRAFT_DATA_DIR` (default `tsdb_data`, matching
  * /root/reference/cli.cpp:50). Timestamps are epoch seconds like the
  * reference CLI.
  */
object Cli {
  def help(): Unit = println(
    """Usage:
      |  graft.Cli insert <symbol> <timestamp> <price> <volume>
      |  graft.Cli query <symbol> <start_timestamp> <end_timestamp>
      |  graft.Cli last <symbol> <count>
      |  graft.Cli benchmark <symbol> <tick_count>
      |  graft.Cli import <symbol> <csv_file>""".stripMargin)

  private def ts(epochSec: Long) = new java.sql.Timestamp(epochSec * 1000L)

  /** Testable entry point; returns an exit code. */
  def run(spark: SparkSession, dataDir: String, args: Array[String]): Int = {
    if (args.isEmpty) { help(); return 1 }
    val store = new TickStore(spark, dataDir)
    args(0) match {
      case "insert" if args.length == 5 =>
        store.append(args(1), ts(args(2).toLong), args(3).toDouble, args(4).toLong)
        println(s"Inserted tick for ${args(1)}")
        0
      case "query" if args.length == 4 =>
        val rows = store.queryRange(args(1), ts(args(2).toLong), ts(args(3).toLong)).collect()
        println(s"Found ${rows.length} results:")
        rows.foreach { r =>
          println(f"Timestamp: ${r.getTimestamp(1).getTime / 1000} " +
            f"Price: ${r.getDouble(2)}%.2f Volume: ${r.getLong(3)}")
        }
        0
      case "last" if args.length == 3 =>
        val rows = store.queryLast(args(1), args(2).toInt).collect()
        println(s"Last ${rows.length} ticks for ${args(1)}:")
        rows.foreach { r =>
          println(f"Timestamp: ${r.getTimestamp(1).getTime / 1000} " +
            f"Price: ${r.getDouble(2)}%.2f Volume: ${r.getLong(3)}")
        }
        0
      case "benchmark" if args.length == 3 =>
        val n = args(2).toInt
        val base = 1700000000L
        import spark.implicits._
        val ticks = spark.range(n).select(
          lit(args(1)).as("symbol"),
          timestamp_seconds(lit(base) + col("id")).as("ts"),
          (lit(100.0) + pmod(col("id") * 7919L, lit(10000L)) / 100.0).as("price"),
          (pmod(col("id") * 104729L, lit(9900L)) + 100L).as("volume"))
        val t0 = System.nanoTime()
        store.ingest(ticks)
        val insertMs = (System.nanoTime() - t0) / 1e6
        println(f"Inserted $n ticks in ${insertMs}%.0fms (${n * 1000.0 / insertMs}%.0f ticks/second)")
        val t1 = System.nanoTime()
        val got = store.queryRange(args(1), ts(base), ts(base + n)).count()
        val queryMs = (System.nanoTime() - t1) / 1e6
        println(f"Retrieved $got ticks in ${queryMs}%.0fms (${got * 1000.0 / queryMs}%.0f ticks/second)")
        0
      case "import" if args.length == 3 =>
        store.importCsv(args(2), args(1))
        println(s"Imported ${store.count(args(1))} ticks from ${args(2)} for symbol ${args(1)}")
        0
      case _ =>
        help()
        1
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val code = try run(spark, sys.env.getOrElse("GRAFT_DATA_DIR", "tsdb_data"), args)
      finally spark.stop()
    if (code != 0) sys.exit(code)
  }
}
