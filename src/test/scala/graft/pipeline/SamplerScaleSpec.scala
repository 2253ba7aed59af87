package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.core.Tables

/** The r7 scale rework of the three low-cardinality whole-partition
  * windows (stratifiedSample, mixtureSample, packBins) must (a) return
  * EXACTLY the rows the monolithic window plans returned — selection is
  * by md5 rank / exact integer cumsums, so nothing may drift — and (b)
  * provably drop the scale-killer: the samplers' plans contain NO
  * Window at all (selection is a map-side min-k partial aggregation),
  * and packBins' detail window partitions by (source, chunk), never by
  * source alone. Mirrors PrefixAggSpec's contract for the market ops.
  */
class SamplerScaleSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = Tables.documents(spark, sf)

  private def assertSame(a0: DataFrame, b0: DataFrame): Unit = {
    val a = a0.collect().map(_.toSeq).sortBy(_.mkString("|"))
    val b = b0.collect().map(_.toSeq).sortBy(_.mkString("|"))
    assert(a.length === b.length, s"row counts ${a.length} vs ${b.length}")
    a.zip(b).foreach { case (x, y) => assert(x === y) }
  }

  private def analyzedWindows(df: DataFrame) =
    df.queryExecution.analyzed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }

  test("stratifiedSample matches the per-language window plan exactly") {
    val w = Window.partitionBy("pred_lang")
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val naive = TextOps.langId(docs)
      .select(col("doc_id"), col("pred_lang"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 20)
    assertSame(TextOps.stratifiedSample(docs, 20), naive)
  }

  test("stratifiedSample plan has no Window — selection is a min-k partial agg") {
    assert(analyzedWindows(TextOps.stratifiedSample(docs, 20)).isEmpty,
      "per-stratum selection must not sort whole strata through a window")
  }

  test("mixtureSample matches the per-source window plan exactly") {
    val idx = expr("TRY_CAST(substring(source, 4) AS INT)")
    val quota = floor((pmod(idx, lit(4)) + 1).cast("double") / 50.0 * 300)
      .cast("long")
    val rk = row_number().over(Window.partitionBy("source")
      .orderBy(md5(concat(lit("mix"), col("doc_id").cast("string"))),
        col("doc_id"))).cast("long")
    val naive = docs.withColumn("quota", quota)
      .withColumn("rk", rk)
      .filter(col("rk") <= col("quota"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_taken"), sum(col("doc_id")).as("sum_doc_id"),
        min(col("doc_id")).as("min_doc_id"))
    assertSame(TextOps.mixtureSample(docs, 300), naive)
  }

  test("mixtureSample plan has no Window — selection is a min-k partial agg") {
    assert(analyzedWindows(TextOps.mixtureSample(docs, 300)).isEmpty,
      "per-source selection must not sort whole sources through a window")
  }

  test("packBins (chunked prefix-sum) matches the per-source window bit-for-bit") {
    val w = Window.partitionBy("source").orderBy("doc_id")
    val naive = docs.select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      .withColumn("cum", sum(col("toks")).over(w))
      .withColumn("bin", expr("(cum - toks) div 512"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("bin_tokens"))
    // chunkDocs=64 ≪ docs per source, so cross-chunk offsets are exercised
    assertSame(TextOps.packBins(docs, 512, chunkDocs = 64L), naive)
  }

  test("packBins detail window partitions by (source, chunk), offsets window by source") {
    // unbounded-frame windows over raw doc rows must carry the chunk
    // key; the per-chunk totals window (input: an Aggregate) may
    // partition by source alone — same discipline as PrefixAggSpec
    import org.apache.spark.sql.catalyst.plans.logical.{
      Aggregate, Filter, LogicalPlan, Project, SubqueryAlias, Window => LW}
    def overAggregate(p: LogicalPlan): Boolean = p match {
      case _: Aggregate     => true
      case pr: Project      => overAggregate(pr.child)
      case f: Filter        => overAggregate(f.child)
      case w: LW            => overAggregate(w.child)
      case a: SubqueryAlias => overAggregate(a.child)
      case _                => false
    }
    val windows = analyzedWindows(TextOps.packBins(docs, 512, chunkDocs = 64L))
    assert(windows.nonEmpty)
    val detail = windows.filterNot(w => overAggregate(w.child))
    assert(detail.nonEmpty, "expected a detail window over the doc scan")
    detail.foreach { w =>
      assert(w.partitionSpec.size >= 2,
        s"detail window must partition by (source, chunk), got ${w.partitionSpec}")
    }
  }
}
