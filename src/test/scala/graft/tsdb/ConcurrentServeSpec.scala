package graft.tsdb

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicBoolean
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Concurrent ingest + serve — the reference's one genuinely
  * distinctive design point is a background writer with reader-writer
  * locks so queries run WHILE ticks append
  * (/root/reference/timeseries_db.hpp:13-17, column_storage.cpp lock
  * usage). Graft's analog is structural, not lock-based: every batch
  * for one symbol lands as ONE parquet file (the ingest path
  * repartitions by symbol, so a symbol's batch is written by a single
  * task), files become visible only via the commit protocol's rename,
  * and readers list the directory fresh per query — so a read
  * concurrent with a write sees either the whole batch or none of it,
  * never a torn file and never a partial batch.
  *
  * These tests drive a real writer thread against a live reader and
  * assert exactly that contract, plus serve-loop freshness (the
  * read-through cache refreshes after an insert).
  */
class ConcurrentServeSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private def batchDf(sym: String, startSec: Long, n: Int) = {
    import org.apache.spark.sql.functions._
    spark.range(n).select(
      lit(sym).as("symbol"),
      timestamp_seconds(lit(startSec) + col("id")).as("ts"),
      (lit(100.0) + col("id") % 50).as("price"),
      (col("id") % 900 + 100).as("volume"))
  }

  test("reads concurrent with batch appends never observe a partial batch") {
    val dir = Files.createTempDirectory("conc_serve_").toString
    val store = new TickStore(spark, dir)
    val batch = 1000
    val nBatches = 6
    store.ingest(batchDf("CONC", 1700000000L, batch)) // initial commit

    // committed counts the writer has fully landed, in commit order
    val committed = new ConcurrentLinkedQueue[Long]()
    committed.add(batch.toLong)
    val failed = new AtomicBoolean(false)
    val started = new CountDownLatch(1)
    val writer = new Thread(() => {
      started.countDown()
      try {
        var i = 1
        while (i <= nBatches) {
          store.ingest(batchDf("CONC", 1700000000L + i * batch, batch))
          committed.add(((i + 1) * batch).toLong)
          i += 1
        }
      } catch { case _: Throwable => failed.set(true) }
    })
    writer.start()
    started.await()

    // reader: fresh directory listing per query (new DataFrame each
    // call) racing the writer's commits
    var observations = List.empty[Long]
    while (writer.isAlive) {
      observations ::= store.count("CONC")
    }
    writer.join()
    assert(!failed.get, "writer thread failed")
    observations ::= store.count("CONC") // final read after last commit

    val allowed = (1 to nBatches + 1).map(_.toLong * batch).toSet
    val bad = observations.filterNot(allowed.contains)
    assert(bad.isEmpty,
      s"reads saw partial batches: ${bad.distinct.sorted.mkString(", ")} " +
        s"(allowed: whole multiples of $batch)")
    // observations were collected newest-first: commit order is
    // monotone, so the reversed list must be non-decreasing
    val inOrder = observations.reverse
    assert(inOrder.zip(inOrder.tail).forall { case (a, b) => a <= b },
      "observed counts went backwards across commits")
    assert(inOrder.last === (nBatches + 1).toLong * batch)
    graft.core.TempDirs.delete(dir)
  }

  test("serve loop answers warm reads correctly while a writer appends") {
    val dir = Files.createTempDirectory("conc_serve_loop_").toString
    val store = new TickStore(spark, dir)
    store.ingest(batchDf("NVDA", 1700000000L, 2000))

    val stop = new AtomicBoolean(false)
    val writer = new Thread(() => {
      var i = 0
      while (!stop.get && i < 50) {
        store.ingest(batchDf("INGQ", 1700000000L + i * 500L, 500))
        i += 1
      }
    })
    writer.start()

    // 40 warm point-range reads on the served symbol under write load
    val cmds = new StringBuilder()
    (0 until 40).foreach { i =>
      val s = 1700000000L + (i % 100)
      cmds.append(s"query NVDA $s ${s + 10}\n")
    }
    cmds.append("count NVDA\nexit\n")
    val bout = new java.io.ByteArrayOutputStream()
    graft.Cli.serve(spark, dir,
      new java.io.BufferedReader(new java.io.StringReader(cmds.toString)),
      new java.io.PrintStream(bout, true))
    stop.set(true)
    writer.join()

    val out = bout.toString
    // every range read returns the exact 11 ticks of its window (the
    // served symbol's data is stable; the concurrent load is on INGQ)
    val founds = "Found (\\d+) results:".r.findAllMatchIn(out)
      .map(_.group(1).toInt).toVector
    assert(founds.length === 40)
    assert(founds.forall(_ === 11), s"range sizes under load: ${founds.distinct}")
    assert(out.contains("Count: 2000"))
    graft.core.TempDirs.delete(dir)
  }

  test("expire drops only strictly-older daily partitions; readers stay consistent") {
    val dir = Files.createTempDirectory("expire_spec_").toString
    val store = new TickStore(spark, dir, dailyPartitions = true)
    // three calendar days of ticks, two symbols
    val daySec = 86400L
    val base = 1700006400L // 2023-11-15 00:00 UTC + margin
    Seq(0L, 1L, 2L).foreach { d =>
      store.ingest(batchDf("AAA", base + d * daySec, 100))
      store.ingest(batchDf("BBB", base + d * daySec, 50))
    }
    assert(store.countAll() === 450L)
    val day1 = java.time.Instant.ofEpochSecond(base + daySec)
      .atZone(java.time.ZoneOffset.UTC).toLocalDate
    val dropped = store.expire(day1) // drop day 0 only
    assert(dropped === 2, s"expected 2 partitions dropped, got $dropped")
    assert(store.countAll() === 300L)
    assert(store.count("AAA") === 200L && store.count("BBB") === 100L)
    // remaining data all at-or-after the cutoff
    val minTs = store.all().agg(org.apache.spark.sql.functions.min("ts"))
      .collect()(0).getTimestamp(0).getTime / 1000L
    assert(minTs >= base + daySec)
    // idempotent: nothing further to drop
    assert(store.expire(day1) === 0)
    // r11 hardening: an unparseable partition name (null-ts default
    // partition, foreign dirs) is skipped, never fatal mid-delete
    val weird = new java.io.File(
      s"$dir/symbol=AAA/ts_date=__HIVE_DEFAULT_PARTITION__")
    assert(weird.mkdirs())
    assert(store.expire(day1.plusDays(10)) === 4) // days 1+2, both symbols
    assert(weird.exists(), "unparseable partition must survive expire")
    graft.core.TempDirs.delete(dir)
  }

  test("bounded serve cache: time-window + LRU, cold ranges fall through correctly") {
    val dir = Files.createTempDirectory("bounded_serve_").toString
    val store = new TickStore(spark, dir)
    val daySec = 86400L
    val base = 1700006400L
    // three calendar days × 50 ticks for WND, one day for OTH
    Seq(0L, 1L, 2L).foreach(d => store.ingest(batchDf("WND", base + d * daySec, 50)))
    store.ingest(batchDf("OTH", base, 30))
    val cmds = Seq(
      s"count WND",                                  // full count despite window
      s"query WND $base ${base + 10}",               // day-0 range: COLD path
      s"query WND ${base + 2 * daySec} ${base + 2 * daySec + 10}", // warm window
      s"last WND 120",                               // deeper than cache: COLD
      s"last WND 5",                                 // warm
      s"count OTH",                                  // second symbol evicts WND (maxSymbols=1)
      s"count WND",                                  // re-warm after eviction, still correct
      "exit").mkString("\n") + "\n"
    val bout = new java.io.ByteArrayOutputStream()
    // windowDays=1 → cache holds ~day 1 tail + day 2 (51 of 150 ticks)
    graft.Cli.serve(spark, dir,
      new java.io.BufferedReader(new java.io.StringReader(cmds)),
      new java.io.PrintStream(bout, true), windowDays = 1, maxSymbols = 1)
    val out = bout.toString
    val counts = "Count: (\\d+)".r.findAllMatchIn(out).map(_.group(1).toInt).toVector
    assert(counts === Vector(150, 30, 150), s"counts: $counts")
    val founds = "Found (\\d+) results:".r.findAllMatchIn(out)
      .map(_.group(1).toInt).toVector
    assert(founds === Vector(11, 11), s"range sizes: $founds")
    val lasts = "Last (\\d+) ticks".r.findAllMatchIn(out)
      .map(_.group(1).toInt).toVector
    assert(lasts === Vector(120, 5), s"last sizes: $lasts")
    // the deep `last` really returned day-0 ticks (past the cached window)
    assert(out.contains(s"Timestamp: ${base + 49} "), "cold last must reach day 0")
    graft.core.TempDirs.delete(dir)
  }

  test("dropSymbol removes a symbol subtree on either layout") {
    for (daily <- Seq(false, true)) {
      val dir = Files.createTempDirectory(s"drop_sym_${daily}_").toString
      val store = new TickStore(spark, dir, dailyPartitions = daily)
      store.ingest(batchDf("AAA", 1700006400L, 40))
      store.ingest(batchDf("BBB", 1700006400L, 60))
      assert(store.dropSymbol("AAA"))
      assert(!store.dropSymbol("AAA")) // already gone
      assert(!store.dropSymbol("NOPE"))
      assert(store.countAll() === 60L)
      assert(store.count("BBB") === 60L)
      graft.core.TempDirs.delete(dir)
    }
  }

  test("warm cache covers the newest fractional second (sub-second stores)") {
    val dir = Files.createTempDirectory("subsec_serve_").toString
    val store = new TickStore(spark, dir)
    import org.apache.spark.sql.functions._
    // 100 ticks spaced 250 ms apart — the newest ticks sit INSIDE a
    // fractional second (base+24.25/.50/.75). Before the r12 fix the
    // warm scan's end bound truncated max ts to whole seconds, so the
    // cache silently dropped every tick after base+24.000 while the
    // cached total still counted them.
    val base = 1700000000L
    store.ingest(spark.range(100).select(
      lit("SUB").as("symbol"),
      timestamp_millis(lit(base * 1000L) + col("id") * 250L).as("ts"),
      (lit(10.0) + col("id")).as("price"),
      (col("id") + 1L).as("volume")))
    val cmds = s"count SUB\nlast SUB 3\nquery SUB ${base + 24} ${base + 24}\nexit\n"
    val bout = new java.io.ByteArrayOutputStream()
    graft.Cli.serve(spark, dir,
      new java.io.BufferedReader(new java.io.StringReader(cmds)),
      new java.io.PrintStream(bout, true))
    val out = bout.toString
    assert(out.contains("Count: 100"))
    // warm `last 3` must surface the true newest tick (id 99, price 109)
    assert(out.contains("Price: 109.00"), s"newest fractional-second tick missing:\n$out")
    // second base+24 holds ids 96..99 (24.00/.25/.50/.75) → 4 ticks
    val founds = "Found (\\d+) results:".r.findAllMatchIn(out)
      .map(_.group(1).toInt).toVector
    assert(founds === Vector(4), s"range sizes: $founds")
    graft.core.TempDirs.delete(dir)
  }

  test("serve cache refreshes after insert (read-your-writes)") {
    val dir = Files.createTempDirectory("conc_serve_rw_").toString
    val store = new TickStore(spark, dir)
    store.ingest(batchDf("AMD", 1700000000L, 100))
    val cmds = "count AMD\ninsert AMD 1700009999 42.50 777\ncount AMD\n" +
      "query AMD 1700009999 1700009999\nexit\n"
    val bout = new java.io.ByteArrayOutputStream()
    graft.Cli.serve(spark, dir,
      new java.io.BufferedReader(new java.io.StringReader(cmds)),
      new java.io.PrintStream(bout, true))
    val out = bout.toString
    assert(out.contains("Count: 100"))
    assert(out.contains("Count: 101"))
    assert(out.contains("Price: 42.50 Volume: 777"))
    graft.core.TempDirs.delete(dir)
  }
}
