package graft.tools

import org.apache.spark.sql.SparkSession

/** r20 (the r19 verdict's #3): decompose the serve_{ann,bm25,hybrid}
  * _cold_ms probes — how much of the first-query hit is artifact init
  * (forTable: digest check + centroid/codebook or scalar load), the
  * query-vector point lookup, and the probed-cell / term-postings
  * pruned read. Mirrors Bench's setup: same sfDir tables, warmup
  * builds the in-process index artifacts first (as Bench's warmup
  * list does), so the probe isolates the per-serve-instance cold
  * path, not the one-time offline build.
  *
  * `runMain graft.tools.RetrievalColdProbe`
  */
object RetrievalColdProbe {
  private def ms[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"COLD_PROBE $label%-32s ${(System.nanoTime() - t0) / 1e6}%8.1f ms")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Bench-equivalent warmup: build the in-process index artifacts
    Seq("q_ann_ivf", "q_ann_pq", "q_ann_ivfpq", "q_bm25_indexed").foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfDir).collect()
      catch { case e: Throwable => println(s"warmup $n FAILED: ${e.getMessage}") }
    }

    (1 to 2).foreach { round =>
      println(s"--- round $round (fresh serve instances) ---")
      val emb = ms("emb: Tables.embeddings") {
        graft.core.Tables.embeddings(spark, sfDir)
      }
      val ann = ms("ann: AnnServe.forTable") {
        graft.pipeline.AnnServe.forTable(emb)
      }
      if (round == 2) ms("ann: prewarm") { ann.prewarm() }
      ms("ann: first topKById(0, 10)") { ann.topKById(0L, 10) }
      ms("ann: warm topKById(0, 10)") { ann.topKById(0L, 10) }
      // fresh instance, explicit vector: isolates warmCells (no vecFor)
      val ann2 = graft.pipeline.AnnServe.forTable(emb)
      val qv = ms("ann: vec collect (emb filter)") {
        emb.filter(org.apache.spark.sql.functions.col("vec_id") === 0L)
          .select("embedding").head().getSeq[Float](0).toArray
      }
      ms("ann2: first topK(explicit vec)") { ann2.topK(qv, 10) }

      val docs = ms("docs: Tables.documents") {
        graft.core.Tables.documents(spark, sfDir)
      }
      val bm = ms("bm25: Bm25Serve.forTable") {
        graft.pipeline.Bm25Serve.forTable(docs)
      }
      if (round == 2) ms("bm25: prewarm") { bm.prewarm() }
      ms("bm25: first topK(dup spark join)") {
        bm.topK(Seq("dup", "spark", "join"), 10)
      }
      ms("bm25: warm topK(dup spark join)") {
        bm.topK(Seq("dup", "spark", "join"), 10)
      }
    }
    spark.stop()
  }
}
