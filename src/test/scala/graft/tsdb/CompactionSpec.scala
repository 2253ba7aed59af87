package graft.tsdb

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** TickStore.compact: fragmented partitions collapse to one ts-sorted
  * file each, data is bit-identical before/after, and partitions under
  * the threshold are left physically untouched (no rewrite, no file
  * churn — the O(fragmented data) contract).
  */
class CompactionSpec extends AnyFunSuite {
  import TestSpark._

  private def batchDf(sym: String, startSec: Long, n: Int) = {
    import org.apache.spark.sql.functions._
    spark.range(n).select(
      lit(sym).as("symbol"),
      timestamp_seconds(lit(startSec) + col("id")).as("ts"),
      (lit(100.0) + col("id") % 50).as("price"),
      (col("id") % 900 + 100).as("volume"))
  }

  private def dataFiles(dir: String): Seq[java.io.File] = {
    val d = new java.io.File(dir)
    if (!d.isDirectory) Seq.empty
    else d.listFiles.toSeq.filter(f =>
      f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith("."))
  }

  private def digest(store: TickStore): Seq[(String, Long, Double, Long)] =
    store.all().collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getDouble(2),
        r.getLong(3))).sortBy(t => (t._1, t._2, t._4)).toSeq

  test("compact collapses fragmented symbol partitions, preserves data exactly") {
    val dir = Files.createTempDirectory("compact_flat_").toString
    val store = new TickStore(spark, dir)
    // FRAG: 5 commits → ≥5 files; CALM: 1 commit → untouched
    (0 until 5).foreach(i => store.ingest(batchDf("FRAG", 1700000000L + i * 100, 100)))
    store.ingest(batchDf("CALM", 1700000000L, 200))
    val before = digest(store)
    val fragBefore = dataFiles(s"$dir/symbol=FRAG")
    val calmBefore = dataFiles(s"$dir/symbol=CALM").map(f => (f.getName, f.lastModified))
    assert(fragBefore.size >= 5)

    assert(store.compact() === 1) // only FRAG exceeds 1 file
    assert(dataFiles(s"$dir/symbol=FRAG").size === 1)
    // CALM physically untouched: same file names, same mtimes
    assert(dataFiles(s"$dir/symbol=CALM").map(f => (f.getName, f.lastModified))
      === calmBefore)
    assert(digest(store) === before)
    // idempotent
    assert(store.compact() === 0)
    graft.core.TempDirs.delete(dir)
  }

  test("compact on the daily layout rewrites only the fragmented (symbol, day) partitions") {
    val dir = Files.createTempDirectory("compact_daily_").toString
    val store = new TickStore(spark, dir, dailyPartitions = true)
    val daySec = 86400L
    val base = 1700006400L
    // AAA day0 fragmented (3 FULLY-OVERLAPPING commits — so a range
    // read must see all three interleaved), AAA day1 single-commit,
    // BBB day0 fragmented (2 commits)
    (0 until 3).foreach(_ => store.ingest(batchDf("AAA", base, 50)))
    store.ingest(batchDf("AAA", base + daySec, 80))
    (0 until 2).foreach(i => store.ingest(batchDf("BBB", base + i * 100, 40)))
    val before = digest(store)
    val day1Dir = new java.io.File(s"$dir/symbol=AAA").listFiles
      .filter(_.getName.startsWith("ts_date=")).map(_.getName).sorted
    val calm = dataFiles(s"$dir/symbol=AAA/${day1Dir.last}")
      .map(f => (f.getName, f.lastModified))

    assert(store.compact() === 2) // AAA/day0 + BBB/day0
    assert(dataFiles(s"$dir/symbol=AAA/${day1Dir.head}").size === 1)
    assert(dataFiles(s"$dir/symbol=BBB/${day1Dir.head}").size === 1)
    assert(dataFiles(s"$dir/symbol=AAA/${day1Dir.last}")
      .map(f => (f.getName, f.lastModified)) === calm)
    assert(digest(store) === before)
    // compacted files stay ts-sorted: range reads still answer exactly
    val rows = store.queryRange("AAA", ts(base + 10), ts(base + 20)).collect()
    assert(rows.length === 33) // 3 interleaved commits × 11 seconds
    assert(store.compact() === 0)
    graft.core.TempDirs.delete(dir)
  }

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
}
