package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Drives the CLI parity layer end-to-end against a temp store. */
class CliSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val dir = Files.createTempDirectory("cli_spec_").toString

  test("insert then query round-trips through the CLI") {
    assert(Cli.run(spark, dir, Array("insert", "AAPL", "1625097600", "148.56", "1000000")) === 0)
    assert(Cli.run(spark, dir, Array("insert", "AAPL", "1625097700", "149.10", "500")) === 0)
    assert(Cli.run(spark, dir, Array("query", "AAPL", "1625097600", "1625184000")) === 0)
    val store = new graft.tsdb.TickStore(spark, dir)
    assert(store.count("AAPL") === 2)
  }

  test("last returns newest first") {
    assert(Cli.run(spark, dir, Array("last", "AAPL", "1")) === 0)
    val top = new graft.tsdb.TickStore(spark, dir).queryLast("AAPL", 1).head()
    assert(top.getDouble(2) === 149.10)
  }

  test("benchmark ingests and scans the requested tick count") {
    val bdir = Files.createTempDirectory("cli_bench_").toString
    assert(Cli.run(spark, bdir, Array("benchmark", "MSFT", "1000")) === 0)
    assert(new graft.tsdb.TickStore(spark, bdir).count("MSFT") === 1000)
  }

  test("unknown command prints help and fails") {
    assert(Cli.run(spark, dir, Array("nope")) === 1)
  }

  test("maintenance commands: compact, expire, drop") {
    val mdir = Files.createTempDirectory("cli_maint_").toString
    // two commits for one symbol → fragmented; compact merges them
    assert(Cli.run(spark, mdir, Array("insert", "AAA", "1700006400", "10.00", "1")) === 0)
    assert(Cli.run(spark, mdir, Array("insert", "AAA", "1700006401", "11.00", "2")) === 0)
    // stats sees the fragmentation compact is about to fix
    val pre = new graft.tsdb.TickStore(spark, mdir).stats()
    assert(pre.map(_._1) === Seq("symbol=AAA") && pre.head._2 === 2)
    assert(pre.head._3 > 0L)
    assert(Cli.run(spark, mdir, Array("stats")) === 0)
    assert(Cli.run(spark, mdir, Array("compact")) === 0)
    assert(new graft.tsdb.TickStore(spark, mdir).stats().head._2 === 1)
    val files = new java.io.File(s"$mdir/symbol=AAA").listFiles
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
    assert(files === 1)
    assert(new graft.tsdb.TickStore(spark, mdir).count("AAA") === 2)
    // drop removes the symbol; second drop reports failure
    assert(Cli.run(spark, mdir, Array("drop", "AAA")) === 0)
    assert(Cli.run(spark, mdir, Array("drop", "AAA")) === 1)
    // expire on a daily-layout store
    val edir = Files.createTempDirectory("cli_expire_").toString
    val daily = new graft.tsdb.TickStore(spark, edir, dailyPartitions = true)
    import org.apache.spark.sql.functions._
    daily.ingest(spark.range(2).select(lit("BBB").as("symbol"),
      timestamp_seconds(lit(1700006400L) + col("id") * 86400L).as("ts"),
      lit(5.0).as("price"), lit(1L).as("volume")))
    assert(Cli.run(spark, edir, Array("expire", "2023-11-16")) === 0)
    assert(daily.countAll() === 1)
    graft.core.TempDirs.delete(mdir)
    graft.core.TempDirs.delete(edir)
  }

  test("serve answers repeated queries on a warm cached session") {
    val sdir = Files.createTempDirectory("cli_serve_").toString
    assert(Cli.run(spark, sdir, Array("benchmark", "NVDA", "5000")) === 0)
    val cmds =
      """query NVDA 1700000000 1700000050
        |query NVDA 1700000100 1700000150
        |last NVDA 3
        |count NVDA
        |exit
        |""".stripMargin
    val bout = new java.io.ByteArrayOutputStream()
    val t0 = System.nanoTime()
    Cli.serve(spark, sdir,
      new java.io.BufferedReader(new java.io.StringReader(cmds)),
      new java.io.PrintStream(bout, true))
    val totalSec = (System.nanoTime() - t0) / 1e9
    val outStr = bout.toString
    assert(outStr.contains("Found 51 results:"))
    assert(outStr.contains("Last 3 ticks for NVDA:"))
    assert(outStr.contains("Count: 5000"))
    // warm repeated reads: the 2nd query must be much faster than the
    // 1st (per-symbol cache hit); parse the "(N ms)" timings. Assert the
    // RELATIVE property (warm ≪ cold) with an absolute escape hatch so a
    // loaded machine's GC pause can't flake the suite.
    val times = "\\(([\\d.]+) ms\\)".r.findAllMatchIn(outStr)
      .map(_.group(1).toDouble).toVector
    assert(times.length === 4, s"timings in: $outStr")
    assert(times(1) < times(0) &&
      times(1) < math.max(times(0) / 5.0, 250.0),
      s"warm query took ${times(1)} ms vs cold ${times(0)} ms (total $totalSec s)")
  }
}
