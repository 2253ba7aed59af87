package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r16: WARM driver-side BM25 serving — the [[AnnServe]] posture for
  * the lexical tier. An interactive retrieval user (decontamination
  * spot-checks, dedup audits, the Cli `search` loop) wants answers
  * without paying Spark job scheduling per query; what stays
  * driver-resident is what a search node keeps hot: the model scalars
  * (N, Σdl — read live off the [[Bm25Index]], so appends are
  * reflected immediately) and an LRU of TERM BUCKETS' posting arrays —
  * bounded on the bucket axis exactly as [[AnnServe]] bounds cells, so
  * a 100 TB corpus serves its hot vocabulary from driver memory while
  * cold buckets pay one pruned load on first touch.
  *
  * Every arithmetic step mirrors [[Bm25Index.topK]] bit for bit: the
  * same quant6'd idf (same driver code), the same double ratio chain,
  * and per-term contributions summed as exact MICRO LONGS — the
  * integer twin of the Spark path's exact decimal sum — before one
  * final micro→double conversion (identical to DECIMAL(·,6)→DOUBLE).
  * A warm serve answer therefore EQUALS the Spark query path's
  * collected result (Bm25ServeSpec gates it, plus zero-jobs-when-warm
  * and append-staleness eviction via [[Bm25Index.bucketVersion]]).
  */
class Bm25Serve private (index: Bm25Index, maxBuckets: Int) {

  /** One bucket's postings: per term, the (doc_id, tf, dl) rows sorted
    * by doc_id; `version` = the index version at load (stale when
    * [[Bm25Index.bucketVersion]] advances past it — the AnnServe
    * CellData handshake).
    */
  private final case class BucketData(
      terms: Map[String, Array[(Long, Long, Long)]], version: Long)

  private val bucketCache =
    new java.util.LinkedHashMap[Int, BucketData](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Int, BucketData]): Boolean =
        size() > maxBuckets
    }

  private def isFresh(b: Int): Boolean = {
    val bd = bucketCache.get(b)
    bd != null && index.bucketVersion(b) <= bd.version
  }

  /** Load every missing/stale probed bucket in ONE pruned Spark read
    * (cold path); warm queries never reach here.
    */
  private def warmBuckets(buckets: Seq[Int]): Unit = {
    val missing = buckets.filter(b => !isFresh(b))
    if (missing.nonEmpty) {
      val loadVersions = missing.map(b => b -> index.bucketVersion(b)).toMap
      val rows = index.session.read.parquet(index.postingsDir)
        .filter(col("bucket").isin(missing: _*))
        .select(col("bucket"), col("term"), col("doc_id"), col("tf"), col("dl"))
        .collect()
      rows.groupBy(_.getInt(0)).foreach { case (b, rs) =>
        val byTerm = rs.groupBy(_.getString(1)).map { case (t, trs) =>
          t -> trs.map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
            .sortBy(_._1)
        }
        bucketCache.put(b, BucketData(byTerm, loadVersions(b)))
      }
      missing.filter(b => !isFresh(b)).foreach(b =>
        bucketCache.put(b, BucketData(Map.empty, loadVersions(b))))
    }
  }

  private def q6micro(x: Double): Long = {
    val s = x * 1000000.0
    (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)).toLong
  }

  /** Warm top-k BM25 — the serve-loop entry point. Returns
    * (doc_id, dl, score) exactly as [[Bm25Index.topK]] would collect.
    */
  def topK(terms: Seq[String], k: Int): Seq[(Long, Long, Double)] = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val buckets = terms.map(Bm25Index.bucketOf).distinct
    warmBuckets(buckets)
    val n = index.nDocs.toDouble
    val avgdl = index.totalLen.toDouble / n
    // per-doc exact micro accumulation (the decimal-sum twin); dl
    // rides along for the output row
    val acc = scala.collection.mutable.LongMap.empty[Long]
    val dls = scala.collection.mutable.LongMap.empty[Long]
    terms.foreach { t =>
      val bd = bucketCache.get(Bm25Index.bucketOf(t))
      val posts = if (bd == null) Array.empty[(Long, Long, Long)]
        else bd.terms.getOrElse(t, Array.empty[(Long, Long, Long)])
      val df = posts.length.toDouble
      val idf6 = PqIndex.q6(math.log((n - df + 0.5) / (df + 0.5) + 1.0))
      posts.foreach { case (doc, tf, dl) =>
        val ratio = tf.toDouble * 2.2 / (tf.toDouble + TextOps.Bm25K1 *
          (1.0 - TextOps.Bm25B + TextOps.Bm25B * (dl.toDouble / avgdl)))
        acc(doc) = acc.getOrElse(doc, 0L) + q6micro(idf6 * ratio)
        dls(doc) = dl
      }
    }
    acc.toSeq.sortBy { case (doc, micro) => (-micro, doc) }.take(k)
      .map { case (doc, micro) =>
        (doc, dls(doc),
          new java.math.BigDecimal(micro).movePointLeft(6).doubleValue())
      }
  }
}

object Bm25Serve {
  /** Serve wrapper over the (digest-cached) index for `docs` — a serve
    * answer and a Spark query answer come from the SAME artifact and
    * scalars.
    */
  def forTable(docs: DataFrame, maxBuckets: Int = 32): Bm25Serve =
    new Bm25Serve(Bm25Index.forTable(docs), maxBuckets)
}
