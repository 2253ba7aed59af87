package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** r16 (the r15 verdict's #6): IVFPQ cell-partition compaction — the
  * TickStore.compact posture for the index. appendEncode lands one
  * small file per touched cell per batch; compaction must collapse
  * each cell to ONE file while preserving (cell, codes, attributes)
  * row-exactly and every query answer bit for bit.
  */
class IvfPqCompactSpec extends AnyFunSuite {
  import TestSpark._

  test("N appends → compact → one file per cell, answers bit-identical") {
    import spark.implicits._
    // distinct corpus plan — the index cache is digest-keyed; mutating
    // the shared full-corpus index would perturb the other suites
    val corpus = Tables.embeddings(spark, sf).filter(col("vec_id") < 230)
    val idx = IvfPqIndex.forTable(corpus, 16, 8, 16)
    val seedVecs = (1 to 4).map(i => corpus.filter(col("vec_id") === i.toLong)
      .select("embedding").head().getSeq[Float](0))
    (0 until 3).foreach { b =>
      val batch = seedVecs.zipWithIndex.map { case (v, i) =>
        (9500L + b * 10 + i, v) }
      idx.appendEncode(batch.toDF("vec_id", "embedding"))
    }
    val rowsBefore = idx.codes().count()
    val before = idx.topK(3L, 10, nprobe = 8, shortlist = 60).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    def perCell(dir: String): Map[String, Int] = {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Path.of(dir)
      val s = java.nio.file.Files.list(root)
      try s.iterator().asScala.toSeq
        .filter(p => p.getFileName.toString.startsWith("cell="))
        .map { p =>
          val f = java.nio.file.Files.list(p)
          try p.getFileName.toString ->
            f.iterator().asScala.count(_.toString.endsWith(".parquet"))
          finally f.close()
        }.toMap
      finally s.close()
    }
    val fragmented = perCell(idx.codesDir)
    assert(fragmented.values.max > 1,
      s"appends did not fragment any cell: $fragmented")
    idx.compact()
    val compacted = perCell(idx.codesDir)
    assert(compacted.nonEmpty && compacted.values.forall(_ == 1),
      s"compaction left multi-file cells: $compacted")
    assert(idx.codes().count() === rowsBefore)
    val after = idx.topK(3L, 10, nprobe = 8, shortlist = 60).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(after === before, "compaction changed a query answer")
    // and appends keep working INTO the compacted dir
    idx.appendEncode(Seq((9999L, seedVecs.head)).toDF("vec_id", "embedding"))
    assert(idx.codes().filter(col("vec_id") === 9999L).count() === 1L)
  }
}
