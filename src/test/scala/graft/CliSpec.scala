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
