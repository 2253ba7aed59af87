package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ClusterTime {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.documents(spark, dir)
    docs.count() // warm
    graft.SparkEntry.queries("q_dedup_minhash")(spark, dir).count() // warm sig path
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val pairs = time("pairs")(graft.pipeline.Dedup.minhashCandidates(docs))
    val pcount = time("pairs count")(pairs.count())
    println(s"  pairs=$pcount")
    val clusters = time("nearDupClusters build+count") {
      graft.pipeline.Dedup.nearDupClusters(docs, pairs).count()
    }
    println(s"  clusters rows=$clusters")
    time("full query again")(graft.SparkEntry.queries("q_dedup_clusters")(spark, dir).count())
    spark.stop()
  }
}
