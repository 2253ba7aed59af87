package graft.tools

import org.apache.spark.sql.SparkSession

/** Time individual SparkEntry queries by name (dev loop for bench
  * regressions): `runMain graft.tools.QTime q_dedup_clusters ...`.
  * Each query runs twice; both timings print (cold + warm).
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_STATE_PROVIDER").foreach(p =>
      builder.config("spark.sql.streaming.stateStore.providerClass", p))
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      (1 to 2).foreach { round =>
        val t0 = System.nanoTime()
        // noop sink, matching Bench: full evaluation of every output
        // column (count() lets Catalyst prune computed columns)
        SparkEntry_queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        println(f"QTIME $name%-24s run$round ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }

  private def SparkEntry_queries = graft.SparkEntry.queries
}
