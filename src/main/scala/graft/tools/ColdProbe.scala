package graft.tools

import org.apache.spark.sql.SparkSession

/** Decomposes the serve cold path: footer stats vs window scan vs
  * driver sort, on a freshly-staged store (dev diagnostic for the
  * serve_cold_ms BENCH line).
  */
object ColdProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = graft.core.TempDirs.scoped("graft_cold_probe_")
    require(graft.Cli.run(spark, dir, Array("benchmark", "NVDA", "100000")) == 0)
    val store = new graft.tsdb.TickStore(spark, dir)
    (1 to 3).foreach { i =>
      var t0 = System.nanoTime()
      val fast = store.symbolStatsFast("NVDA")
      val tStats = (System.nanoTime() - t0) / 1e6
      t0 = System.nanoTime()
      val (total, maxTs) = fast.getOrElse(store.symbolStats("NVDA"))
      val tFallback = (System.nanoTime() - t0) / 1e6
      val fromSec = maxTs.get.getTime / 1000L - 365L * 86400L
      t0 = System.nanoTime()
      val rows = store.scanRange("NVDA",
        new java.sql.Timestamp(fromSec * 1000L), maxTs.get)
        .select(org.apache.spark.sql.functions.unix_micros(
          org.apache.spark.sql.functions.col("ts")),
          org.apache.spark.sql.functions.col("price"),
          org.apache.spark.sql.functions.col("volume"))
        .collect()
      val tScan = (System.nanoTime() - t0) / 1e6
      t0 = System.nanoTime()
      rows.sortBy(_.getLong(0))
      val tSort = (System.nanoTime() - t0) / 1e6
      println(f"COLD_PROBE round$i fast_defined=${fast.isDefined} " +
        f"stats=$tStats%.1fms fallback=$tFallback%.1fms " +
        f"scan=$tScan%.1fms (${rows.length} rows) sort=$tSort%.1fms total=$total")
    }
    spark.stop()
  }
}
