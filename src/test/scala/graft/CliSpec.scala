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
}
