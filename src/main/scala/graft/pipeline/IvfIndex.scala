package graft.pipeline

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Offline IVF (inverted-file) ANN index: vectors partitioned into
  * `nlist` Voronoi cells by a ONE-TIME KMeans fit, persisted as parquet
  * partitioned by cell id.
  *
  * Index build and query are separate lifecycles — the classic
  * large-scale layout (FAISS-style IVF re-expressed as a table layout):
  *
  *  - [[IvfIndex.build]] (offline, once): fit coarse centroids on a
  *    sample, assign every vector a cell, write
  *    `indexDir/cells/cell=<i>/...parquet`. At 100 TB this is the
  *    expensive pass, and it runs exactly once per corpus version.
  *  - [[IvfIndex.topK]] (per query): rank the driver-held centroid
  *    array against the query vector (nlist ≈ dozens — microseconds),
  *    then scan ONLY the `nprobe` nearest cell partitions. Because the
  *    parquet is partitioned by `cell`, the `cell IN (...)` filter is
  *    directory-level partition PRUNING: ~nprobe/nlist of the corpus is
  *    read, no KMeans, no full scan, no model in the query path.
  *
  * Process-lifetime cache keyed by (source plan, nlist) so repeated
  * queries against the same corpus reuse one build.
  */
class IvfIndex private (
    emb: DataFrame,
    cellsPath: String,
    centroids: Array[Array[Double]]) {

  /** Top-k cosine neighbors of `queryId` scanning only the `nprobe`
    * cells nearest the query vector.
    */
  def topK(queryId: Long, k: Int, nprobe: Int): DataFrame = {
    // point lookup of the query vector (pushed-down scan on vec_id)
    val qVec = emb.filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    // probe selection against the tiny driver-held centroid table
    val probes = centroids.zipWithIndex.map { case (c, i) =>
        var d = 0.0
        var j = 0
        while (j < c.length && j < qVec.length) {
          val diff = c(j) - qVec(j); d += diff * diff; j += 1
        }
        (i, d)
      }.sortBy(_._2).take(nprobe).map(_._1).toSeq

    val cells = emb.sparkSession.read.parquet(cellsPath)
    cells
      .filter(col("cell").isin(probes: _*) && col("vec_id") =!= queryId)
      .withColumn("qe", typedLit(qVec.map(_.toFloat).toSeq))
      .select(col("vec_id"),
        round(Similarity.cosine(col("embedding"), col("qe")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }
}

object IvfIndex {
  private val cache =
    new ConcurrentHashMap[(Int, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int), IvfIndex]()

  /** Cached build: one index per (session, source plan, nlist) for the
    * process lifetime — the query path never rebuilds. Keyed on the
    * canonicalized plan ITSELF (case-class structural equality), not
    * its 32-bit hashCode — a hash collision between two different
    * corpora must miss, never serve the wrong index.
    */
  def forTable(emb: DataFrame, nlist: Int): IvfIndex = {
    val key = (System.identityHashCode(emb.sparkSession),
      emb.queryExecution.analyzed.canonicalized, nlist)
    cache.computeIfAbsent(key, _ => build(emb, nlist))
  }

  /** Offline index construction: KMeans on a sample (coarse cells only
    * need coarse centroids; random init skips k-means||'s extra
    * passes), then one full assignment pass written partition-by-cell.
    * The corpus count here is index-build bookkeeping (choosing a
    * sample fraction that cannot undershoot k), NOT a query-path
    * action.
    */
  def build(emb: DataFrame, nlist: Int): IvfIndex = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val feats = emb.select(col("vec_id"), col("embedding"),
      array_to_vector(col("embedding")).as("features"))
    val n = feats.count()
    val trainFrac = if (n * 0.25 >= nlist * 4L) 0.25 else 1.0
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(3)
      .setInitMode("random")
      .fit(feats.sample(withReplacement = false, trainFrac, seed = 42L))

    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_").toString
    val cellsPath = s"$dir/cells"
    model.transform(feats)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))
      .write.partitionBy("cell").parquet(cellsPath)

    new IvfIndex(emb, cellsPath, model.clusterCenters.map(_.toArray))
  }
}
