package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Brute-force cosine top-k is the exactness baseline: one broadcast of
  * the query vector, a codegen'd map-side dot product, and a global
  * top-k (TakeOrderedAndProject — each task keeps k rows, no full sort).
  * At 100 TB the scale path is [[lshBuckets]]: random-hyperplane signs
  * bucket vectors so candidate generation is an equi-join on bucket id
  * instead of an all-pairs cross join.
  */
object Similarity {
  /** Double-precision dot product of two float vectors (cast-up first so
    * accumulation order and width match the oracle).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Exact top-k cosine neighbors of the vector with id `queryId`. */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = emb.filter(col("vec_id") === queryId).select(col("embedding").as("qe"))
    emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("qe")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Deterministic pseudo-random hyperplanes in [-0.5, 0.5), generated
    * driver-side once (a tiny `nBits × dim` constant matrix, shipped
    * inside the plan as literals — no per-row hashing, no stored model).
    */
  private[graft] def hyperplanes(dim: Int, nBits: Int): IndexedSeq[Seq[Double]] = {
    val rng = new scala.util.Random(42)
    IndexedSeq.fill(nBits)(Seq.fill(dim)(rng.nextDouble() - 0.5))
  }

  /** Random-hyperplane LSH bucket id: `nBits` sign bits of dot products
    * with the constant hyperplanes — nBits codegen'd multiply-add passes
    * per row.
    */
  def lshBucket(vec: Column, dim: Int, nBits: Int): Column = {
    val planes = hyperplanes(dim, nBits)
    val bits = (0 until nBits).map { b =>
      val proj = aggregate(
        zip_with(vec, typedLit(planes(b)), (x, h) => x.cast("double") * h),
        lit(0.0), (acc, v) => acc + v)
      when(proj > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** Assign every vector an LSH bucket; ANN = equi-join on bucket then
    * exact cosine within bucket (plus optional multi-probe in later
    * rounds).
    */
  def lshBuckets(emb: DataFrame, dim: Int, nBits: Int = 8): DataFrame =
    emb.select(col("vec_id"), col("label"), col("embedding"),
      lshBucket(col("embedding"), dim, nBits).as("bucket"))

  /** ANN top-k via LSH buckets with multi-probe: candidates come from
    * the query's bucket plus every bucket at Hamming distance 1 in
    * sign-bit space (`nBits + 1` probes) — the standard recall fix for
    * sign-LSH without growing the table. Probe list is tiny and
    * broadcast; the scan stays an equi-join on bucket id.
    */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int, dim: Int, nBits: Int = 8,
      multiProbe: Boolean = true): DataFrame = {
    val bucketed = lshBuckets(emb, dim, nBits)
    val qRow = bucketed.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qe"), col("bucket"))
    val probes =
      if (multiProbe)
        qRow.select(col("qe"), explode(array(
          (col("bucket") +: (0 until nBits).map(b =>
            col("bucket").bitwiseXOR(1L << b))): _*)).as("bucket"))
      else qRow
    bucketed.filter(col("vec_id") =!= queryId)
      .join(broadcast(probes), "bucket")
      .select(col("vec_id"),
        round(cosine(col("embedding"), col("qe")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** IVF (inverted-file) ANN: partition vectors into `nlist` Voronoi
    * cells with KMeans, search only the `nprobe` cells nearest the
    * query. The classic large-scale trade: the centroid table is tiny
    * and broadcast; the candidate scan touches ~nprobe/nlist of the
    * corpus — at 100 TB, cluster id becomes the parquet partition key
    * so probing is partition pruning.
    */
  def ivfTopK(emb: DataFrame, queryId: Long, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val feats = emb.select(col("vec_id"), col("embedding"),
      array_to_vector(col("embedding")).as("features"))
    // IVF practice: train centroids on a sample (coarse cells only need
    // coarse centroids); random init skips k-means||'s extra passes.
    // Tiny corpora train on everything so the sample can't undershoot k.
    val n = feats.count()
    val trainFrac = if (n * 0.25 >= nlist * 4L) 0.25 else 1.0
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(3)
      .setInitMode("random")
      .fit(feats.sample(withReplacement = false, trainFrac, seed = 42L))
    val assigned = model.transform(feats)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))

    // one-row lookup of the query vector + its probe cells
    val qVec = assigned.filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val probes = model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        val d = c.toArray.zip(qVec).map { case (a, b) => (a - b) * (a - b) }.sum
        (i, d)
      }
      .sortBy(_._2).take(nprobe).map(_._1)

    val q = assigned.filter(col("vec_id") === queryId).select(col("embedding").as("qe"))
    assigned.filter(col("cell").isin(probes.toSeq: _*) && col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"), round(cosine(col("embedding"), col("qe")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** Embedding near-duplicate pairs: normalized vectors whose cosine
    * exceeds `threshold`, generated within LSH buckets (single shuffle).
    */
  def embeddingNearDups(emb: DataFrame, dim: Int, threshold: Double, nBits: Int = 6): DataFrame = {
    val bucketed = lshBuckets(emb, dim, nBits)
    val a = bucketed.select(col("bucket"), col("vec_id").as("id_a"), col("embedding").as("e_a"))
    val b = bucketed.select(col("bucket"), col("vec_id").as("id_b"), col("embedding").as("e_b"))
    a.join(b, "bucket")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(cosine(col("e_a"), col("e_b")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
      .orderBy("id_a", "id_b")
  }
}
