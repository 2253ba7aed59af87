package graft.pipeline

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** r16: the INVERTED-INDEX BM25 tier — the 100 TB path behind
  * [[TextOps.bm25]]'s scan formulation. The scan path reads the whole
  * corpus per query (right for ad-hoc audits); a standing retrieval
  * service builds postings ONCE and reads only the queried terms'
  * slices ever after — the Lucene lifecycle re-expressed as a
  * partitioned table, exactly as [[IvfIndex]] re-expresses FAISS:
  *
  *  - **bucket-partitioned postings**: `(term, doc_id, tf, dl)` written
  *    `partitionBy(bucket)` over `pmod(hash(term), Buckets)` — querying
  *    k terms is DIRECTORY-LEVEL PARTITION PRUNING of the postings
  *    table (≤ k buckets of ~1/Buckets of the vocabulary each), plus a
  *    pushed `term IN (…)` data filter inside the pruned scan. The
  *    document length rides ON the posting row (the Lucene norms file,
  *    denormalized) so scoring needs NO join back to the corpus.
  *  - **driver-held stats**: N, Σdl and the per-term document
  *    frequencies (collected from the vocabulary-sized df table at
  *    query time, pruned by term) are the model constants — the idf
  *    table is literal-mapped into the scan, the [[IvfPqIndex]] ADC
  *    posture.
  *  - **identical scoring**: the same quant6'd Lucene idf and
  *    re-quantized per-term contributions as [[TextOps.bm25]], summed
  *    as exact decimals (order-free) — so the indexed answer EQUALS the
  *    scan answer value for value (Bm25IndexSpec gates it; the
  *    `q_bm25_indexed` oracle is the scan formulation re-derived by
  *    DuckDB, which the index must therefore match too).
  *
  * Scale shape per query: one pruned postings scan (candidates only —
  * docs containing ≥1 query term), one (doc_id, contribution) partial
  * aggregation, TakeOrderedAndProject top-k. Zero corpus scans, zero
  * text anywhere (postings carry counters only).
  */
class Bm25Index private (
    docs: DataFrame,
    initialPostingsPath: String,
    initialDfPath: String,
    initialNDocs: Long,
    initialTotalLen: Long) {

  /** Current postings directory — swapped by [[compact]] (the
    * [[IvfPqIndex.compact]] posture: appends fragment bucket
    * partitions into many small files; compaction rewrites each bucket
    * into one file under a fresh versioned dir, row-exactly).
    */
  @volatile private var postingsPath: String = initialPostingsPath
  private var compactGen: Int = 0

  private def spark = docs.sparkSession
  private[pipeline] def session = spark

  // mutable model state — advanced by [[append]] (the appendEncode
  // posture: the artifact grows in place, the driver-held scalars and
  // the vocabulary-table path swap under a lock)
  @volatile private var dfPath: String = initialDfPath
  @volatile private var nDocsVar: Long = initialNDocs
  @volatile private var totalLenVar: Long = initialTotalLen
  private var dfGen: Int = 0

  def nDocs: Long = nDocsVar
  def totalLen: Long = totalLenVar

  /** Per-bucket append versions — the [[IvfPqIndex.cellVersion]]
    * staleness handshake for warm [[Bm25Serve]] caches: a bucket whose
    * version advanced past a cache entry's load version received new
    * postings and must reload.
    */
  @volatile private var versionCounter: Long = 0L
  private val bucketVersions =
    new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()

  def bucketVersion(bucket: Int): Long = {
    val v = bucketVersions.get(bucket)
    if (v == null) 0L else v.longValue()
  }

  private[pipeline] def postingsDir: String = postingsPath

  /** r16: incremental corpus growth — the [[IvfPqIndex.appendEncode]]
    * posture for the lexical tier. New docs tokenize ONCE into posting
    * rows appended into the bucket partitions (O(batch)); the
    * vocabulary df table re-derives from the postings (vocabulary-
    * sized, never the corpus) into a fresh versioned path; N and Σdl
    * advance by the batch's scalars. After an append, [[topK]] answers
    * over the union corpus exactly as a from-scratch build would
    * (Bm25IndexSpec gates equality with the scan path on the union).
    * `newDocs` doc_ids must be disjoint from the corpus — the same
    * primary-key contract as [[Dedup.clustersAppend]].
    */
  def append(newDocs: DataFrame): Unit = synchronized {
    val batch = Bm25Index.postingsOf(newDocs)
      .localCheckpoint() // the write and the touched-bucket collect share it
    // r17: the batch sorts by (bucket, term) before the write so the
    // appended fragments keep the term-clustered row-group property of
    // the build layout (see [[Bm25Index.build]]) — the pushed In(term)
    // filter row-group-skips appended postings too
    batch.sortWithinPartitions(col("bucket"), col("term"))
      .write.mode("append").partitionBy("bucket").parquet(postingsPath)
    // stamp every touched bucket (≤ Buckets rows) so warm serve caches
    // evict exactly those
    val touched = batch.select(col("bucket")).distinct().collect()
      .map(_.getInt(0))
    versionCounter += 1
    val v = java.lang.Long.valueOf(versionCounter)
    touched.foreach(b => bucketVersions.put(b, v))
    dfGen += 1
    val newDfPath = s"$initialDfPath-v$dfGen"
    // r17 (ADVICE): df advances by the BATCH's deltas merged into the
    // previous vocabulary table — two vocabulary-sized inputs, never a
    // rescan of the corpus-sized postings (a long-running append stream
    // was paying O(corpus) per micro-batch for a vocabulary-sized fact)
    spark.read.parquet(dfPath)
      .unionByName(batch.groupBy(col("term")).agg(count(lit(1)).as("df")))
      .groupBy(col("term")).agg(sum(col("df")).cast("long").as("df"))
      .write.parquet(newDfPath)
    val stats = newDocs
      .select(size(split(col("text"), " ")).cast("long").as("dl"))
      // coalesce: an EMPTY batch (a quiet micro-batch) sums to NULL —
      // getLong would NPE
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("tot"))
      .head()
    nDocsVar += stats.getLong(0)
    totalLenVar += stats.getLong(1)
    dfPath = newDfPath
  }

  /** r16: compact the bucket partitions fragmented by [[append]] —
    * one file per bucket under a fresh versioned dir (repartition by
    * bucket routes each wholly into one task), preserving posting rows
    * exactly; readers in flight keep the old dir (process-exit
    * cleaned), warm serve caches stay valid (contents identical,
    * bucket versions don't advance).
    */
  def compact(): Unit = synchronized {
    compactGen += 1
    val newPath = s"$initialPostingsPath-compact$compactGen"
    // r17: one file per bucket AND term-sorted within it — compaction
    // restores the tightest row-group term stats (appends fragment in
    // sorted runs; the rewrite merges them into one sorted run)
    spark.read.parquet(postingsPath).repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("term"))
      .write.partitionBy("bucket").parquet(newPath)
    postingsPath = newPath
  }

  /** Top-k BM25 documents for `terms` — the pruned-postings path.
    * `conjunctive = true` keeps only docs containing EVERY query term
    * (AND semantics — postings carry one row per (term, doc), so the
    * per-doc posting count equals the number of distinct query terms
    * present); scoring is identical either way. `filter` (r17, the
    * q_ann_filtered posture for the lexical tier) is a predicate over
    * the posting-row attributes (lang/source — denormalized at build)
    * composed INTO the same pruned scan, filter-then-rank, so k fills
    * with ELIGIBLE docs and no join back to the corpus happens; idf/
    * avgdl stay corpus-level (the standard filtered-retrieval choice,
    * matching the filtered-ANN tier's corpus-level centroids).
    */
  def topK(terms0: Seq[String], k: Int,
      conjunctive: Boolean = false,
      filter: Option[Column] = None): DataFrame = {
    // r17 (ADVICE): duplicated query terms must score ONCE on every
    // path — `isin` dedups here naturally, so the scan path and the
    // serve path dedup too (all three agree on any input)
    val terms = terms0.distinct
    require(terms.nonEmpty, "bm25 needs at least one query term")
    // per-term df, collected from the term-pruned vocabulary table
    // (≤ |terms| rows — the driver-held model slice)
    val dfs: Map[String, Long] = spark.read.parquet(dfPath)
      .filter(col("term").isin(terms: _*))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val buckets = terms.map(Bm25Index.bucketOf).distinct
    val avgdl = totalLenVar.toDouble / nDocsVar.toDouble
    // idf per queried term, quant6'd driver-side with the same double
    // chain the scan path (and the oracle) use
    val idf6: Map[String, Double] = terms.map { t =>
      val df = dfs.getOrElse(t, 0L).toDouble
      t -> PqIndex.q6(math.log((nDocs.toDouble - df + 0.5) / (df + 0.5) + 1.0))
    }.toMap
    val tf = col("tf").cast("double")
    val ratio = tf * lit(2.2) / (tf + lit(TextOps.Bm25K1) *
      (lit(1.0) - lit(TextOps.Bm25B) +
        lit(TextOps.Bm25B) * (col("dl").cast("double") / lit(avgdl))))
    val contrib = PqIndex.quant6(
      element_at(typedLit(idf6), col("term")) * ratio * 1000000.0)
    val pruned = spark.read.parquet(postingsPath)
      .filter(col("bucket").isin(buckets: _*) && col("term").isin(terms: _*))
    val grouped = filter.fold(pruned)(pruned.filter)
      .select(col("doc_id"), col("dl"), contrib.as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("dl")).as("dl"), sum(col("c")).as("s"),
        count(lit(1)).as("nt"))
    val kept = if (conjunctive) grouped.filter(col("nt") === terms.size)
               else grouped
    kept
      .select(col("doc_id"), col("dl"), col("s").cast("double").as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  /** r17: BATCH retrieval — every query scored in ONE plan. This is
    * the decontamination shape at scale: thousands of benchmark
    * prompts are queries, and per-prompt [[topK]] calls would pay a
    * Spark job (and a postings read) each; here the postings are read
    * ONCE for the whole batch. `queries` = (query_id, text) rows,
    * tokenized exactly like documents. Scoring is the same quant6'd
    * chain, computed IN-PLAN per (query, term) — a row of the tiny
    * query-term table, never per posting — so each query's top-k
    * EQUALS its [[topK]] answer row for row (Bm25IndexSpec gates it).
    *
    * Scale shape, two regimes:
    *  - batch vocabulary ≤ [[Bm25Index.BatchPruneCap]] distinct terms:
    *    the term list collects to the driver (vocabulary-bounded) and
    *    the postings scan keeps the single-query directory pruning +
    *    pushed `In(term)` row-group skipping;
    *  - above the cap (a benchmark-suite-sized batch): ONE full
    *    postings scan joined to the broadcast query-term table — at
    *    that size most buckets are touched anyway, and one scan
    *    amortized over the whole batch is the win per query.
    * Per-query top-k is `graft_min_k` on a complement-packed
    * (score desc, doc_id) key — map-side bounded k-buffers, so no task
    * ever sorts one query's full candidate list (a stopword query's
    * candidates are a big fraction of the corpus; a rank window would
    * drain them through one task).
    */
  def topKBatch(queries: DataFrame, k: Int,
      conjunctive: Boolean = false): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.types.DecimalType
    val qterms = queries
      .select(col("query_id"), explode(split(col("text"), " ")).as("term"))
      .distinct()
      .localCheckpoint() // three consumers: term list, nt_q, the join
    val nDocsD = nDocsVar.toDouble
    val avgdl = totalLenVar.toDouble / nDocsD
    // per-(query, term) idf — the df join is vocabulary-sized; absent
    // terms keep df = 0 (same idf the single-query path gives them)
    val dfTable = spark.read.parquet(dfPath)
    val qt = qterms.join(dfTable, Seq("term"), "left")
      .select(col("query_id"), col("term"),
        PqIndex.quant6(log(
          (lit(nDocsD) - coalesce(col("df"), lit(0L)).cast("double") + 0.5) /
            (coalesce(col("df"), lit(0L)).cast("double") + 0.5) + 1.0)
          * 1000000.0).cast("double").as("idf6"))
    val termRows = qterms.select(col("term")).distinct()
      .limit(Bm25Index.BatchPruneCap + 1).collect()
    val post =
      if (termRows.length <= Bm25Index.BatchPruneCap) {
        val terms = termRows.map(_.getString(0)).toSeq
        val buckets = terms.map(Bm25Index.bucketOf).distinct
        spark.read.parquet(postingsPath)
          .filter(col("bucket").isin(buckets: _*) &&
            col("term").isin(terms: _*))
      } else spark.read.parquet(postingsPath)
    val tf = col("tf").cast("double")
    val ratio = tf * lit(2.2) / (tf + lit(TextOps.Bm25K1) *
      (lit(1.0) - lit(TextOps.Bm25B) +
        lit(TextOps.Bm25B) * (col("dl").cast("double") / lit(avgdl))))
    val contrib = PqIndex.quant6(col("idf6") * ratio * 1000000.0)
    val grouped = post.join(qt, Seq("term"))
      .select(col("query_id"), col("doc_id"), col("dl"), contrib.as("c"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(max(col("dl")).as("dl"), sum(col("c")).as("s"),
        count(lit(1)).as("nt"))
    val kept = if (conjunctive) {
      val ntQ = qterms.groupBy(col("query_id"))
        .agg(count(lit(1)).as("nt_q"))
      grouped.join(ntQ, Seq("query_id")).filter(col("nt") === col("nt_q"))
    } else grouped
    // complement-packed key: (1e18 − score_micro) asc ≡ score desc,
    // doc_id appended for the deterministic tie (lpad 19/20 covers the
    // full non-negative ranges — the lpad-truncation rule); dl rides
    // the id slot (the key is already unique per doc, so the id never
    // decides order)
    val micro = (col("s") * lit(1000000)).cast("long")
    val packed = kept.select(col("query_id"),
      concat(
        lpad((lit(1000000000000000000L) - micro).cast("string"), 19, "0"),
        lpad(col("doc_id").cast("string"), 20, "0")).as("mk"),
      col("dl"))
      .groupBy(col("query_id"))
      .agg(expr(s"graft_min_k(mk, dl, $k)").as("top"))
    packed.select(col("query_id"), explode(col("top")).as("x"))
      .select(col("query_id"),
        substring(col("x.k"), 20, 20).cast("long").as("doc_id"),
        col("x.id").as("dl"),
        ((lit(1000000000000000000L) - substring(col("x.k"), 1, 19)
          .cast("long")).cast(DecimalType(18, 0)) *
          lit(new java.math.BigDecimal("0.000001"))
            .cast(DecimalType(7, 6)))
          .cast(DecimalType(18, 6)).cast("double").as("score"))
      .orderBy(col("query_id"), col("score").desc, col("doc_id"))
  }
}

object Bm25Index {
  /** Postings partition count — at 100 TB each bucket holds ~1/64 of
    * the vocabulary's postings; a k-term query prunes to ≤ k dirs.
    */
  val Buckets = 64

  /** [[Bm25Index.topKBatch]]'s driver-collect bound on the batch's
    * distinct-term list: below it the batch keeps single-query
    * partition pruning; above it the plan switches to one full
    * postings scan joined to the (broadcast) query-term table.
    */
  val BatchPruneCap = 8192

  /** Driver-side twin of the build's bucket expression: Spark's
    * `hash()` is Murmur3_x86_32 with seed 42 — internal layout only
    * (the oracle never re-derives buckets), but driver and executors
    * must agree.
    */
  private[pipeline] def bucketOf(term: String): Int = {
    // Spark hash(): Murmur3 over the UTF8String bytes, seed 42
    val m = org.apache.spark.sql.catalyst.expressions.Murmur3HashFunction
      .hash(org.apache.spark.unsafe.types.UTF8String.fromString(term),
        org.apache.spark.sql.types.StringType, 42L).toInt
    val b = m % Buckets
    if (b < 0) b + Buckets else b
  }

  private val cache = new ConcurrentHashMap[(Int, String), Bm25Index]()

  /** Cached build: one index per (session, corpus digest). */
  def forTable(docs: DataFrame): Bm25Index = {
    val key = (System.identityHashCode(docs.sparkSession),
      IvfIndex.corpusDigest(docs))
    cache.computeIfAbsent(key, _ => build(docs))
  }

  /** Offline build: ONE corpus scan writes the bucket-partitioned
    * postings (dl denormalized onto each row), the vocabulary df table
    * derives from the postings (never the corpus), and the scalar
    * stats (N, Σdl) come from one counter-only pass.
    */
  /** `(term, doc_id, tf, dl, bucket)` posting rows for a doc slice —
    * the one tokenizing pass, shared by [[build]] and
    * [[Bm25Index.append]] so the two cannot drift.
    */
  private[pipeline] def postingsOf(docs: DataFrame): DataFrame = {
    // r17: lang/source ride the posting rows when the corpus has them
    // (the IvfPqIndex r16 attributes-beside-the-codes posture, which
    // is Lucene's stored-fields trade) — an attribute-FILTERED query
    // then composes its predicate into the one pruned scan instead of
    // joining back to the corpus. Attribute-less corpora (e.g. the
    // bigramized phrase view) build plain postings.
    val attrs = Seq("lang", "source").filter(docs.columns.contains)
    val aggs = Seq(count(lit(1)).as("tf"), min(col("dl")).as("dl")) ++
      attrs.map(a => min(col(a)).as(a)) // constant per doc — min = the value
    docs.select(col("doc_id") +: split(col("text"), " ").as("ws") +:
        attrs.map(col): _*)
      .select(col("doc_id") +: size(col("ws")).cast("long").as("dl") +:
        explode(col("ws")).as("term") +: attrs.map(col): _*)
      .groupBy(col("term"), col("doc_id"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("bucket", pmod(hash(col("term")), lit(Buckets)))
  }

  def build(docs: DataFrame,
      writerOptions: Map[String, String] = Map.empty): Bm25Index = {
    val dir = graft.core.TempDirs.scoped("graft_bm25_")
    val postingsPath = s"$dir/postings"
    val dfPath = s"$dir/df"
    // r17 (the r16 verdict's #1): the postings files are TERM-SORTED —
    // the Lucene term-dictionary property. Range-partition on
    // (bucket, term) so each task (and so each written file) covers a
    // CONTIGUOUS term range, then sort within the task so every row
    // group's term min/max stats are tight; the pushed `In(term)` data
    // filter then skips row groups, making a rare-term query O(df)
    // instead of O(bucket). Without this the build shuffle was
    // hash-partitioned and every row group carried near-full-range
    // stats — a ~1.5%-of-corpus scan per query at 100 TB. Range
    // partitioning (not repartition(bucket)) keeps the build scalable:
    // no single task ever sorts a whole bucket's 1/64 of the corpus.
    postingsOf(docs)
      .repartitionByRange(col("bucket"), col("term"))
      .sortWithinPartitions(col("bucket"), col("term"))
      .write.options(writerOptions).partitionBy("bucket").parquet(postingsPath)
    val postings = docs.sparkSession.read.parquet(postingsPath)
    postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .write.parquet(dfPath)
    // r17: N and Σdl derive from the WRITTEN postings (per-doc dl rides
    // every posting row; even an empty-text doc owns one posting — its
    // `""` term — so every doc is represented): two counter-only
    // aggregates instead of a SECOND full text decode of the corpus.
    val stats = postings
      .groupBy(col("doc_id")).agg(min(col("dl")).as("dl"))
      .agg(count(lit(1)).as("n"), coalesce(sum(col("dl")), lit(0L)).as("tot"))
      .head()
    new Bm25Index(docs, postingsPath, dfPath, stats.getLong(0), stats.getLong(1))
  }
}
