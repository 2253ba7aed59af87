package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Measures `Cli serve` round-trip latency (the README's "sub-ms warm
  * reads" claim, as a reproducible artifact): stages a store, drives
  * the serve loop with one cold query plus `n` warm repeats through an
  * in-process pipe, parses the serve loop's own "(N ms)" timings, and
  * prints cold / warm p50 / p95 / max.
  *
  * `runMain graft.tools.ServeLatency [nWarm] [ticks]`
  */
object ServeLatency {
  def main(args: Array[String]): Unit = {
    val nWarm = args.headOption.map(_.toInt).getOrElse(200)
    val ticks = args.lift(1).map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir = graft.core.TempDirs.scoped("graft_serve_lat_")
    require(graft.Cli.run(spark, dir, Array("benchmark", "NVDA", ticks.toString)) == 0)

    // one cold query (first touch scans + caches the symbol), then
    // nWarm warm repeats over varied ranges (driver-side binary search)
    val cmds = new StringBuilder("query NVDA 1700000000 1700000050\n")
    (0 until nWarm).foreach { i =>
      val start = 1700000000L + (i % 997)
      cmds.append(s"query NVDA $start ${start + 50}\n")
    }
    cmds.append("exit\n")
    val bout = new java.io.ByteArrayOutputStream()
    graft.Cli.serve(spark, dir,
      new java.io.BufferedReader(new java.io.StringReader(cmds.toString)),
      new java.io.PrintStream(bout, true))

    val times = "\\(([\\d.]+) ms\\)".r.findAllMatchIn(bout.toString)
      .map(_.group(1).toDouble).toVector
    require(times.length == nWarm + 1, s"expected ${nWarm + 1} timings, got ${times.length}")
    val warm = times.tail.sorted
    def pct(p: Double): Double = warm((p * (warm.length - 1)).round.toInt)
    println(f"SERVE_LATENCY ticks=$ticks cold=${times.head}%.2fms " +
      f"warm_p50=${pct(0.50)}%.3fms warm_p95=${pct(0.95)}%.3fms " +
      f"warm_max=${warm.last}%.3fms n=$nWarm")
    // second serve loop = fresh cache on a JIT-warm JVM: the cold
    // number BENCH sees (its serve run happens after the whole suite)
    val bout2 = new java.io.ByteArrayOutputStream()
    graft.Cli.serve(spark, dir,
      new java.io.BufferedReader(new java.io.StringReader(
        "query NVDA 1700000000 1700000050\nexit\n")),
      new java.io.PrintStream(bout2, true))
    val cold2 = "\\(([\\d.]+) ms\\)".r.findAllMatchIn(bout2.toString)
      .map(_.group(1).toDouble).toVector.head
    println(f"SERVE_LATENCY cold_jit_warm=$cold2%.2fms")
    spark.stop()
  }
}
