package graft.tools
import org.apache.spark.sql.SparkSession
import graft.core.Tables
import graft.pipeline.Dedup
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, dir)
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    time("warm full") { Dedup.nearDupClusters(docs, Dedup.minhashCandidates(docs)).count() }
    time("candidates only") { Dedup.minhashCandidates(docs).count() }
    time("full clusters") { Dedup.nearDupClusters(docs, Dedup.minhashCandidates(docs)).count() }
    time("full clusters 2") { Dedup.nearDupClusters(docs, Dedup.minhashCandidates(docs)).count() }
    spark.stop()
  }
}
