package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.pipeline.Dedup

/** Ad-hoc stage profiler for the heavy pipeline operators. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    docs.count() // warm

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }

    val words = split(col("text"), " ")
    val grams = filter(
      transform(words, (w, i) =>
        when(i <= size(words) - 3,
          concat_ws(" ", (0 until 3).map(j => element_at(words, i + j + 1)): _*))),
      g => g.isNotNull)

    time("exploded gram hashes") {
      docs.select(col("doc_id"), explode(grams).as("g"))
        .select(col("doc_id"), xxhash64(col("g")).as("gh")).count()
    }
    time("signatures") { Dedup.minhashSignatures(docs).count() }
    time("signatures again") { Dedup.minhashSignatures(docs).count() }
    val sigs = Dedup.minhashSignatures(docs)
    time("banded") {
      sigs.select(col("doc_id"), col("sig"),
        posexplode(array((0 until 4).map { b =>
          xxhash64((b * 4 until (b + 1) * 4).map(i => element_at(col("sig"), i + 1)): _*)
        }: _*)).as(Seq("band_id", "band_hash"))).count()
    }
    time("candidates full") { Dedup.minhashCandidates(docs).count() }
    spark.stop()
  }
}
