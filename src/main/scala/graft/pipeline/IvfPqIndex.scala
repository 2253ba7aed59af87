package graft.pipeline

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** r15: the TRUE IVFPQ storage layout (the r14 verdict's #1) — what
  * FAISS actually persists, re-expressed as a partitioned table:
  *
  *  - **cell-partitioned codes**: the PQ code table is written
  *    `partitionBy("cell")` over the coarse IVF cells, so probing
  *    `nprobe` cells is DIRECTORY-LEVEL PARTITION PRUNING of the code
  *    table itself — one pruned scan, no join against a full code
  *    table (the r14 composition's documented trade: its vec_id join
  *    touched every stored code and only halved the candidate set).
  *  - **residual encoding**: each vector's PQ codes quantize
  *    `r = v̂ − c(cell)` (the unit-normalized vector minus its cell
  *    centroid), not the raw vector — the classic IVFPQ refinement:
  *    residuals are centered and tighter than the raw distribution, so
  *    the same m×cb codebook budget spends its resolution where the
  *    cell actually lives. ADC distances against a per-cell query
  *    residual `q̂ − c(cell)` reconstruct ‖v̂ − q̂‖² exactly up to
  *    quantization: ‖(c + r) − q̂‖² = ‖r − (q̂ − c)‖².
  *  - **nlist ~ √N policy**: [[IvfPqIndex.defaultNlist]] documents the
  *    classic balance (√N cells of √N vectors — probe cost and
  *    centroid-scan cost meet); nprobe defaults to a fixed fraction of
  *    nlist ([[IvfPqIndex.defaultNprobe]]) so the scanned fraction
  *    stays constant as the corpus grows, instead of nprobe=8/nlist=16
  *    reading HALF the corpus forever.
  *
  * Query lifecycle mirrors [[IvfIndex]]/[[PqIndex]]: the probe ranks
  * the driver-held centroids (microseconds), ADC tables are m × nprobe
  * × cb quant6'd doubles built driver-side per query, and the one
  * pruned scan does m literal-map lookups + (m−1) adds per candidate,
  * shortlists, and exactly re-ranks only the shortlist.
  *
  * Engine neutrality (what lets DuckDB verify `q_ann_ivfpq` from the
  * dumped constants): the normalization, the rounded-argmin cell
  * assignment, the residual subtraction, the rounded-argmin code
  * assignment and the quant6 ADC entries are all the shared IEEE op
  * sequences already proven by `q_ann_ivf`/`q_ann_pq` — an independent
  * engine holding the same centroid + codebook constants re-derives
  * the exact same codes and rankings.
  */
class IvfPqIndex private (
    emb: DataFrame,
    initialCodesPath: String,
    val nlist: Int,
    val m: Int,
    val sub: Int,
    val centroids: Array[Array[Double]],
    val codebooks: IndexedSeq[Seq[(Int, Array[Double])]]) {

  /** Current code-table directory — swapped by [[compact]] (appends
    * fragment cell partitions into many small files; compaction
    * rewrites each cell into one file under a fresh versioned dir,
    * preserving (cell, codes) exactly).
    */
  @volatile private var codesPath: String = initialCodesPath
  private var compactGen: Int = 0

  private def spark = emb.sparkSession

  private[pipeline] def codesDir: String = codesPath

  import PqIndex.q6

  /** Monotone index version, bumped once per [[appendEncode]] batch —
    * with [[cellVersion]], the staleness handshake that lets a warm
    * [[AnnServe]] cache drop exactly the cells an append touched (r16,
    * the r15 verdict's #2: a warm cached cell otherwise serves the
    * pre-append array forever while the Spark query path sees the new
    * vectors).
    */
  @volatile private var versionCounter: Long = 0L
  private val cellVersions = new ConcurrentHashMap[Int, java.lang.Long]()

  /** Last index version that appended into `cell` (0 = build-time
    * only). A cache entry loaded at version v is stale iff
    * `cellVersion(cell) > v`.
    */
  def cellVersion(cell: Int): Long = {
    val v = cellVersions.get(cell)
    if (v == null) 0L else v.longValue()
  }

  /** Current index version (build = 0, +1 per appended batch). */
  def version: Long = versionCounter

  /** Tombstone sidecar (r18, the r17 verdict's #1): vec_ids logically
    * deleted from the index — the FAISS IDSelector / Lucene
    * deleted-docs discipline: masked out of every read until
    * [[compact]] drops them physically. Swapped whole under a fresh
    * versioned path per [[delete]] batch (atomic read-path switch);
    * `None` (the common case) costs nothing.
    */
  @volatile private var tombstonePath: Option[String] = None
  private var tombGen: Int = 0

  private[pipeline] def hasTombstones: Boolean = tombstonePath.nonEmpty

  /** The LOGICAL stored `(vec_id, embedding, codes)` table, partitioned
    * by `cell` — stored rows minus tombstoned vectors. Every reader
    * (probes, serves, drift gauges, compaction) goes through here; the
    * anti-join is absent until the first delete, and the cell partition
    * filter pushes through its left side, so the pruned probe plan is
    * unchanged.
    */
  private[pipeline] def codes(): DataFrame = {
    val p = emb.sparkSession.read.parquet(codesPath)
    tombstonePath.fold(p)(t =>
      p.join(emb.sparkSession.read.parquet(t), Seq("vec_id"), "left_anti"))
  }

  /** r20 (the r19 verdict's #3): DRIVER-SIDE load of whole cell
    * partitions — the [[graft.tsdb.TickStore.scanRangeLocal]] posture
    * for the ANN serve tier. A probed cell is O(N/nlist) rows under
    * one `cell=<c>` directory; reading it through a Spark job pays
    * ~100–150 ms of scheduling/codegen/collect for bytes parquet-mr
    * returns in single-digit ms, and the serve loop's whole point is
    * to avoid per-query job latency. Semantics are identical to
    * collecting [[codes]] filtered to these cells: same files (a
    * listing is fresher than any cached Spark file index, so appended
    * files are seen), same tombstone mask, rows sorted by vec_id.
    * Throws on any unexpected layout — the caller falls back to the
    * Spark path.
    */
  private[pipeline] def cellRowsLocal(cells: Seq[Int])
      : Map[Int, Array[(Long, Array[Int], Array[Float])]] = {
    import graft.core.LocalParquet
    val t0 = System.nanoTime()
    val conf = spark.sparkContext.hadoopConfiguration
    val cp = codesPath // volatile: snapshot once (compact may swap it)
    val dead: Set[Long] = tombstonePath match {
      case None => Set.empty
      case Some(t) =>
        val b = Set.newBuilder[Long]
        LocalParquet.dataFiles(new org.apache.hadoop.fs.Path(t), conf)
          .foreach(f => LocalParquet.readGroups(f.getPath, conf, None)(g =>
            b += g.getLong("vec_id", 0)))
        b.result()
    }
    val out = LocalParquet.parMap(cells) { c =>
      val rows = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Array[Int], Array[Float])]
      LocalParquet.dataFiles(
          new org.apache.hadoop.fs.Path(cp, s"cell=$c"), conf)
        .foreach(f => LocalParquet.readGroups(f.getPath, conf, None) { g =>
          val id = g.getLong("vec_id", 0)
          if (!dead.contains(id))
            rows += ((id, LocalParquet.intArray(g, "codes"),
              LocalParquet.floatArray(g, "embedding")))
        })
      c -> rows.sortBy(_._1).toArray
    }.toMap
    if (sys.env.contains("GRAFT_SERVE_DEBUG"))
      System.err.println(f"cellRowsLocal: ${cells.size} cells, " +
        f"${out.valuesIterator.map(_.length).sum} rows, " +
        f"${(System.nanoTime() - t0) / 1e6}%.1f ms")
    out
  }

  /** r18 (the r17 verdict's #1): vector DELETION — the curation
    * pipeline's "drop these ids" applied to the ANN tier. Tombstoned
    * ids mask out of every probe ([[codes]]), so top-k fills with
    * ELIGIBLE survivors exactly as [[topK]] with an id-excluding
    * `filter` would (the FAISS IDSelector semantic — the q_ann_deleted
    * oracle re-derives precisely that from the dumped constants); the
    * model constants (centroids, codebooks) deliberately STAY — the
    * [[appendEncode]] staleness trade: a refit is the digest-advance
    * rebuild's job, never the delete's. Touched cell versions advance
    * so warm [[AnnServe]] caches evict exactly those cells; [[compact]]
    * later drops the rows physically and retires the sidecar.
    *
    * Cost: one codes-table scan per delete batch (vec_id is not the
    * partition key — the compact cost class, amortized over a curation
    * batch). Ids already tombstoned (or absent) are ignored; returns
    * the number of vectors newly deleted.
    */
  def delete(ids: DataFrame): Long = synchronized {
    val spark = emb.sparkSession
    val incoming = ids.select(col("vec_id").cast("long").as("vec_id"))
      .distinct()
    val newIds = tombstonePath.fold(incoming)(t =>
      incoming.join(spark.read.parquet(t), Seq("vec_id"), "left_anti"))
      .localCheckpoint() // three consumers: cells join, sidecar write, count
    // touched cells — the one codes scan; ids absent from the stored
    // table touch nothing (and harmlessly ride the sidecar)
    val nDel = newIds.count()
    if (nDel == 0L) return 0L
    // touched cells — the one codes scan; ids absent from the stored
    // table touch nothing (and harmlessly ride the sidecar)
    val touched = spark.read.parquet(codesPath)
      .join(newIds, Seq("vec_id"))
      .select(col("cell")).distinct().collect().map(_.getInt(0))
    tombGen += 1
    val newTomb = s"$initialCodesPath-tombstones-v$tombGen"
    tombstonePath.fold(newIds)(t =>
      spark.read.parquet(t).unionByName(newIds))
      .write.parquet(newTomb)
    tombstonePath = Some(newTomb)
    versionCounter += 1
    val v = java.lang.Long.valueOf(versionCounter)
    touched.foreach(c => cellVersions.put(c, v))
    nDel
  }

  /** Top-k cosine neighbors of `queryId`: one partition-pruned scan of
    * the `nprobe` probed cells' codes, per-cell residual ADC ranking,
    * exact cosine re-rank on the `shortlist` best.
    *
    * r16 (the r15 verdict's #3): `filter` is the FAISS-IDSelector
    * analog — an attribute predicate over the columns stored BESIDE the
    * codes (label, source, …), applied INSIDE the pruned scan (a plain
    * data filter the parquet reader pushes down), so top-k is
    * filter-then-rank: the ADC shortlist fills with k ELIGIBLE
    * candidates instead of rank-then-filter's under-filled k on
    * selective predicates. The plan stays ONE pruned scan, zero joins.
    */
  def topK(queryId: Long, k: Int, nprobe: Int, shortlist: Int,
      filter: Option[Column] = None): DataFrame = {
    val qvecF = emb.filter(col("vec_id") === queryId)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val qn = IvfIndex.normalize(qvecF.map(_.toDouble))
    val probes = IvfIndex.nearestCells(centroids, qn, nprobe)
    // per-(cell, sub-space) ADC tables against the PER-CELL query
    // residual — m maps of nprobe × cb quant6'd entries, keyed
    // cell·stride + code so the scan side needs no join
    val tables: IndexedSeq[Map[Long, Double]] = (0 until m).map { j =>
      probes.flatMap { cell =>
        val cc = centroids(cell)
        val qr = Array.tabulate(sub)(i => qn(j * sub + i) - cc(j * sub + i))
        codebooks(j).map { case (code, cent) =>
          var acc = 0.0
          var i = 0
          while (i < sub) { val d = cent(i) - qr(i); acc += d * d; i += 1 }
          (cell.toLong * IvfPqIndex.CellKeyStride + code) -> q6(acc)
        }
      }.toMap
    }
    val adc = (0 until m).map { j =>
      element_at(typedLit(tables(j)),
        col("cell").cast("long") * IvfPqIndex.CellKeyStride +
          element_at(col("codes"), j + 1).cast("long"))
    }.reduce(_ + _)
    val pruned = codes()
      .filter(col("cell").isin(probes: _*) && col("vec_id") =!= queryId)
    filter.map(pruned.filter).getOrElse(pruned)
      .select(col("vec_id"), col("embedding"), adc.as("adc"))
      .orderBy(col("adc"), col("vec_id"))
      .limit(shortlist)
      .withColumn("qe", typedLit(qvecF.toSeq))
      .select(col("vec_id"),
        round(Similarity.cosine(col("embedding"), col("qe")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("vec_id"))
      .limit(k)
  }

  /** r18 (the r17 verdict's #6): BATCH retrieval — every query of a
    * panel probed and scored in ONE plan (two pruned scans total: the
    * candidate/ADC pass and the shortlist re-rank pass — vs one pruned
    * scan PER QUERY on the single path). Decontamination at scale is
    * batch-shaped on both tiers; BM25 got [[Bm25Index.topKBatch]] in
    * r17, this is the ANN twin. Per query the arithmetic is IDENTICAL
    * to [[topK]] — same probes, same driver-built quant6 ADC entries
    * (combined into one literal map keyed query·stride + cell·stride +
    * code), same shortlist order, same exact re-rank — so each query's
    * rows EQUAL its single-query answer row for row (DeleteSpec-style
    * gate in RecallSpec; the q_ann_batch oracle re-derives every query
    * from the dumped constants).
    *
    * Scale shape: the probe table (query, qidx, cell — Q·nprobe rows)
    * broadcasts into the ONE scan of the UNION of probed cells; ADC is
    * m literal-map lookups per (candidate, probing query) pair;
    * per-query shortlists and top-k run as map-side bounded
    * `graft_min_k` buffers on complement-packed keys (never a rank
    * window — a query probing a hot cell would otherwise drain it
    * through one task). ADC sums are mathematically on the 1e-6 grid
    * (sums of 8 quant6 entries), so the micro packing is injective and
    * the packed order equals the single path's (adc, vec_id) order.
    * `queryIds` is driver-bounded (vectors + ADC maps are
    * Q·nprobe·cb·m literal entries) — [[IvfPqIndex.BatchCap]] guards
    * the regime; a larger panel splits into chunks upstream.
    */
  def topKBatch(queryIds: Seq[Long], k: Int, nprobe: Int,
      shortlist: Int): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    graft.functions.GraftFunctions.register(spark)
    require(queryIds.nonEmpty, "batch ANN needs at least one query id")
    require(queryIds.size <= IvfPqIndex.BatchCap,
      s"${queryIds.size} query ids exceed BatchCap=${IvfPqIndex.BatchCap} " +
        "— split the panel into chunks")
    val ids = queryIds.distinct
    val qvecs: Map[Long, Array[Float]] = emb
      .filter(col("vec_id").isin(ids.map(Long.box): _*))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val missing = ids.filterNot(qvecs.contains)
    require(missing.isEmpty, s"query ids absent from the corpus: $missing")
    // per-query probes + the combined per-subspace ADC maps — the same
    // driver arithmetic as topK, keyed (qidx, cell, code)
    val qInfo = ids.zipWithIndex.map { case (id, qi) =>
      val qn = IvfIndex.normalize(qvecs(id).map(_.toDouble))
      (id, qi, qn, IvfIndex.nearestCells(centroids, qn, nprobe))
    }
    val tables: IndexedSeq[Map[Long, Double]] = (0 until m).map { j =>
      qInfo.flatMap { case (_, qi, qn, probes) =>
        probes.flatMap { cell =>
          val cc = centroids(cell)
          val qr = Array.tabulate(sub)(i => qn(j * sub + i) - cc(j * sub + i))
          codebooks(j).map { case (code, cent) =>
            var acc = 0.0
            var i = 0
            while (i < sub) { val d = cent(i) - qr(i); acc += d * d; i += 1 }
            (qi.toLong * IvfPqIndex.QueryKeyStride +
              cell.toLong * IvfPqIndex.CellKeyStride + code) -> q6(acc)
          }
        }
      }.toMap
    }
    val probeRows = qInfo.flatMap { case (id, qi, _, probes) =>
      probes.map(c => (id, qi, c))
    }
    val probeDf = spark.createDataFrame(probeRows)
      .toDF("query_id", "qidx", "cell")
    val allCells = probeRows.map(_._3).distinct
    val adc = (0 until m).map { j =>
      element_at(typedLit(tables(j)),
        col("qidx").cast("long") * IvfPqIndex.QueryKeyStride +
          col("cell").cast("long") * IvfPqIndex.CellKeyStride +
          element_at(col("codes"), j + 1).cast("long"))
    }.reduce(_ + _)
    val cand = codes()
      .filter(col("cell").isin(allCells: _*))
      .join(broadcast(probeDf), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), adc.as("adc"))
    // per-query shortlist: (adc asc, vec_id asc) ≡ the packed key order
    val micro = floor(col("adc") * 1000000.0 + 0.5).cast("long")
    val sl = cand
      .select(col("query_id"),
        concat(lpad(micro.cast("string"), 19, "0"),
          lpad(col("vec_id").cast("string"), 20, "0")).as("mk"),
        col("vec_id"))
      .groupBy(col("query_id"))
      .agg(expr(s"graft_min_k(mk, vec_id, $shortlist)").as("top"))
      .select(col("query_id"), explode(col("top")).as("x"))
      .select(col("query_id"), col("x.id").as("vec_id"))
    // exact re-rank: the stored embeddings ride the SAME pruned cell
    // partitions (a second pruned scan, zero corpus scans; AQE
    // broadcasts the Q·shortlist-row side — unhinted per the
    // chunk-offsets rule)
    val vecs = codes().filter(col("cell").isin(allCells: _*))
      .select(col("vec_id"), col("embedding"))
    val qeMap: Map[Long, Seq[Float]] =
      qvecs.map { case (id, v) => id -> v.toSeq }
    val cos = round(Similarity.cosine(col("embedding"),
      element_at(typedLit(qeMap), col("query_id"))), 4)
    val microC = floor(cos * 10000.0 + 0.5).cast("long")
    sl.join(vecs, Seq("vec_id"))
      .select(col("query_id"), col("vec_id"),
        concat(lpad((lit(10000L) - microC).cast("string"), 5, "0"),
          lpad(col("vec_id").cast("string"), 20, "0")).as("ck"))
      .groupBy(col("query_id"))
      .agg(expr(s"graft_min_k(ck, vec_id, $k)").as("top"))
      .select(col("query_id"), explode(col("top")).as("x"))
      .select(col("query_id").as("query_vec"), col("x.id").as("vec_id"),
        ((lit(10000L) - substring(col("x.k"), 1, 5).cast("long"))
          .cast(DecimalType(18, 0)) *
          lit(new java.math.BigDecimal("0.0001")).cast(DecimalType(5, 4)))
          .cast(DecimalType(18, 4)).cast("double").as("cos_sim"))
      .orderBy(col("query_vec"), col("cos_sim").desc, col("vec_id"))
  }

  /** Mean residual encoding distortion of the stored corpus — the
    * drift reference ([[PqIndex.buildDistortion]] twin). Lazy, one
    * pruned-free scan of the stored codes table, cached per index.
    */
  lazy val buildDistortion: Double =
    PqIndex.meanDistortionOf(PqIndex.withSubsOf(
      IvfPqIndex.withResiduals(codes(), centroids), col("rv"), m, sub),
      m, sub, codebooks)

  /** Per-cell counts of the stored corpus — the concentration-drift
    * reference. Lazy, one counter aggregate over the codes table.
    */
  private lazy val buildCellCounts: (Map[Int, Long], Long) = {
    val rows = codes().groupBy(col("cell")).count().collect()
    (rows.map(r => r.getInt(0) -> r.getLong(1)).toMap,
      rows.map(_.getLong(1)).sum)
  }

  /** COMPOSITE drift gauge for the spherical residual tier — the
    * [[PqIndex.driftGauge]] twin, with a signal the sphere can't hide.
    *
    * Residual-distortion ratio alone is near-blind here BY
    * CONSTRUCTION: inputs normalize before assign/encode, so residual
    * norms are bounded by (1+‖c‖)² and any unit direction quantizes
    * within a compressed band (measured on the panel corpus: 1.26 for
    * in-distribution appends vs 1.24 for fully NEGATED vectors — no
    * separation). What a direction shift CANNOT hide is WHERE the
    * batch lands: drifted directions concentrate into few cells
    * (measured max-cell-share: build 0.16, in-dist 0.25, negated
    * 0.40, constant-direction 1.0). The gauge is therefore
    * max(distortion ratio, cell-concentration ratio), where
    * concentration = max over cells of batch_share/build_share,
    * evaluated only for batches of ≥ 3·nlist vectors (smaller batches
    * cannot estimate a share — they fall back to the distortion
    * ratio alone).
    */
  def driftGauge(newVecs: DataFrame): Double =
    driftOf(IvfPqIndex.assignCells(newVecs, centroids))

  private def driftOf(assigned: DataFrame): Double = {
    val resid = IvfPqIndex.withResiduals(assigned, centroids)
    val batch = PqIndex.meanDistortionOf(
      PqIndex.withSubsOf(resid, col("rv"), m, sub), m, sub, codebooks)
    val distortion =
      if (buildDistortion == 0.0) { if (batch > 0.0) Double.PositiveInfinity else 1.0 }
      else batch / buildDistortion
    val cellRows = assigned.groupBy(col("cell")).count().collect()
    val bn = cellRows.map(_.getLong(1)).sum.toDouble
    val (buildCells, buildN) = buildCellCounts
    // only cells receiving ≥10% of the batch vote — a handful of
    // vectors landing in a small build cell is sampling noise, not
    // drift (the share estimate needs mass on both sides)
    val voting = cellRows.filter(_.getLong(1) >= 0.1 * bn)
    val concentration =
      if (bn >= 3.0 * nlist && buildN > 0 && voting.nonEmpty) voting.map { r =>
        // a cell unseen at build time gets a half-vector floor so its
        // ratio signals loudly instead of dividing by zero
        val buildShare = buildCells.getOrElse(r.getInt(0), 0L)
          .toDouble.max(0.5) / buildN
        (r.getLong(1) / bn) / buildShare
      }.max
      else 1.0
    math.max(distortion, concentration)
  }

  /** Streaming freshness (r15, the r14 verdict's item 6): assign
    * appended vectors to cells with the STORED centroids (same rounded
    * argmin the build used), encode their residuals with the STORED
    * codebooks, and append into the cell partitions — new vectors
    * become searchable at O(batch) cost with no refit, and a later
    * full rebuild assigns them the exact same (cell, codes). Returns
    * the residual-distortion drift ratio (the [[PqIndex.appendEncode]]
    * gauge): a batch whose residuals no longer match the build-time
    * distribution flags a rebuild.
    */
  def appendEncode(newVecs: DataFrame): Double = {
    // align the batch to the stored attribute schema: any corpus column
    // absent from the batch (a bare (vec_id, embedding) stream) appends
    // as a typed NULL, so the cell partitions keep ONE schema
    val aligned = emb.schema.fields
      .filterNot(f => newVecs.columns.contains(f.name))
      .foldLeft(newVecs)((df, f) =>
        df.withColumn(f.name, lit(null).cast(f.dataType)))
    val assigned = IvfPqIndex.assignCells(aligned, centroids)
      .localCheckpoint() // the gauge and the encode both consume it
    val drift = driftOf(assigned)
    if (drift > PqIndex.DriftRebuildThreshold) System.err.println(
      f"[graft] WARNING: IVFPQ append drift gauge $drift%.2f exceeds " +
        f"${PqIndex.DriftRebuildThreshold}%.1f — appended vectors no " +
        "longer match the build-time cell/codebook distribution; version " +
        "the index dir and rebuild")
    IvfPqIndex.encodeResiduals(
      IvfPqIndex.withResiduals(assigned, centroids), m, sub, codebooks)
      .write.mode("append").partitionBy("cell").parquet(codesPath)
    // bump the index version and stamp every touched cell (the batch's
    // distinct cells — a metadata-sized collect off the checkpointed
    // assignment) so warm serve caches can evict exactly those cells
    val touched = assigned.select(col("cell")).distinct().collect()
      .map(_.getInt(0))
    synchronized {
      versionCounter += 1
      val v = java.lang.Long.valueOf(versionCounter)
      touched.foreach(c => cellVersions.put(c, v))
    }
    drift
  }

  /** r16 (the r15 verdict's #6): compact the cell partitions
    * fragmented by [[appendEncode]] — the [[graft.tsdb.TickStore]]
    * compact posture applied to the index. Each append lands one small
    * file per touched cell; a long-running stream leaves a cell
    * directory of N tiny files whose open/footer overhead dominates the
    * cold probe. Compaction rewrites the code table into a fresh
    * versioned dir with ONE file per cell (`repartition(cell)` routes
    * every cell wholly into one task before the partitioned write),
    * preserving (cell, codes, attributes) row-exactly, then swaps the
    * read path. Readers in flight keep the old dir (left for the
    * process-exit cleaner); serve caches stay valid — contents are
    * identical and [[cellVersion]]s don't advance.
    */
  def compact(): Unit = synchronized {
    compactGen += 1
    val newPath = s"$initialCodesPath-compact$compactGen"
    // r18: codes() is the tombstone-filtered logical view, so deleted
    // vectors drop PHYSICALLY here and the sidecar retires — logical
    // contents unchanged, cell versions don't advance, warm serve
    // caches stay valid.
    val live = codes()
    // fully tombstoned → zero rows: a partitioned empty write leaves an
    // unreadable (file-less) dir — keep the mask instead (the Bm25Index
    // compact guard)
    if (live.isEmpty) return
    live.repartition(col("cell"))
      .write.partitionBy("cell").parquet(newPath)
    codesPath = newPath
    tombstonePath = None
  }
}

object IvfPqIndex {
  /** Code-key stride for the driver-built ADC maps: map key =
    * cell·stride + code. Codebooks are ≤ 256 entries (8-bit codes) —
    * far under the stride — and nlist stays below Int range / stride
    * for any conceivable cell count.
    */
  val CellKeyStride = 4096L

  /** Query stride for [[IvfPqIndex.topKBatch]]'s combined ADC maps:
    * key = qidx·QueryKeyStride + cell·CellKeyStride + code. 2⁴⁰ leaves
    * the cell·stride term (≤ ~2³¹ even at 10¹¹-vector nlist) far
    * below, and qidx ≤ BatchCap keeps the key well inside Long.
    */
  val QueryKeyStride = 1L << 40

  /** Driver-collect bound on a batch's query panel (vectors + ADC
    * literal maps are Q·nprobe·cb·m entries) — a larger panel splits
    * into chunks upstream.
    */
  val BatchCap = 512

  /** nlist policy: ~√N coarse cells (the classic IVF balance — probe
    * selection cost ~nlist and per-cell candidate cost ~N/nlist meet
    * at √N), bounded by CELL OCCUPANCY n/39 (the standard k-means
    * training-point budget: under ~39 vectors per centroid the fit
    * under-trains and coverage collapses — measured directly on the
    * 500-vector panel corpus: √N=23 cells read 0.78 recall where the
    * occupancy-bounded 16 cells read 0.92 at the same scan fraction),
    * floored at 16. At production N both bounds are far above √N's
    * competitors — the policy IS √N at scale.
    */
  def defaultNlist(n: Long): Int =
    // clamp in Long space BEFORE narrowing (r16, ADVICE): at ~1e11
    // vectors n/39 overflows Int and a .toInt here would wrap negative,
    // silently flooring nlist to 16 — the exact scale the √N policy
    // exists for. √1e11 ≈ 316k cells stays far inside Int range.
    math.max(16L, math.min(math.ceil(math.sqrt(n.toDouble)).toLong,
      n / 39L)).toInt

  /** nprobe policy: a fixed 40% of nlist — the scanned fraction of the
    * corpus stays ~constant as N grows. Measured on the weakly
    * clustered sf0.1 bench corpus (n=2000 → nlist=45, nprobe=18,
    * tools/IvfPqProbe sweep): recall@10 = 0.96 at a 40% scan vs the
    * r14 composition's 0.80 at a 50% scan — finer cells + residual
    * codebooks buy 16 recall points while reading fewer bytes. A
    * tightly clustered production corpus runs a far lower fraction;
    * this is the knob, the layout is the point.
    */
  def defaultNprobe(nlist: Int): Int =
    math.max(4, math.ceil(nlist * 0.4).toInt)

  private val cache =
    new ConcurrentHashMap[(Int, String, Int, Int, Int), IvfPqIndex]()
  private val countByDigest = new ConcurrentHashMap[String, java.lang.Long]()
  private val byDigest = new ConcurrentHashMap[String,
    (Array[Array[Double]], IndexedSeq[Seq[(Int, Array[Double])]], Int)]()

  /** (centroids, residual codebooks, nlist) keyed by corpus digest —
    * the oracle-dump handshake (see [[IvfIndex.centroidsFor]]).
    */
  def constantsFor(digest: String)
      : Option[(Array[Array[Double]], IndexedSeq[Seq[(Int, Array[Double])]], Int)] =
    Option(byDigest.get(digest))

  /** Corpus row count, digest-cached so the nlist policy costs one
    * metadata-only count per corpus per process, not per query.
    */
  private[graft] def countFor(emb: DataFrame): Long = {
    val d = IvfIndex.corpusDigest(emb)
    countByDigest.computeIfAbsent(d, _ => emb.count()).longValue()
  }

  /** Cached build: one index per (session, corpus digest, nlist, m,
    * cb) for the process lifetime.
    */
  def forTable(emb: DataFrame, nlist: Int, m: Int, cb: Int): IvfPqIndex = {
    val digest = IvfIndex.corpusDigest(emb)
    val key = (System.identityHashCode(emb.sparkSession), digest, nlist, m, cb)
    val idx = cache.computeIfAbsent(key, _ => build(emb, nlist, m, cb))
    byDigest.put(digest, (idx.centroids, idx.codebooks, idx.nlist))
    idx
  }

  /** Unit-normalized vector column — the [[IvfIndex.build]] op
    * sequence (index-order square fold, IEEE sqrt, one guarded
    * division per component), with the norm projected as an attribute
    * before the division lambda references it (the gramsOf rule).
    */
  private def withVn(df: DataFrame): DataFrame = {
    val ved = transform(col("embedding"), _.cast("double"))
    df.select(col("*"), ved.as("__ved"))
      .select(col("*"),
        sqrt(aggregate(transform(col("__ved"), x => x * x), lit(0.0),
          (a, x) => a + x)).as("__nrm"))
      .select(col("*"),
        transform(col("__ved"),
          x => when(col("__nrm") > 0, x / col("__nrm")).otherwise(lit(0.0)))
          .as("vn"))
      .drop("__ved", "__nrm")
  }

  /** Rounded-argmin cell assignment over the normalized vectors — the
    * exact [[IvfIndex.build]] rule, against FIXED centroids (used by
    * the streaming append path; the offline build reads the IvfIndex
    * cells artifact instead, which applied the same rule).
    */
  private[pipeline] def assignCells(vecs: DataFrame,
      cents: Array[Array[Double]]): DataFrame = {
    val cell = array_min(array(cents.zipWithIndex.map { case (c, i) =>
      struct(round(aggregate(
        zip_with(col("vn"), typedLit(c.toSeq), (v, w) => (v - w) * (v - w)),
        lit(0.0), (acc, x) => acc + x), 6).as("d"), lit(i).as("c"))
    }: _*)).getField("c")
    // keeps every input column (plus vn/cell): attribute columns ride
    // along so filtered probes read them next to the codes (r16)
    withVn(vecs).withColumn("cell", cell)
  }

  /** Residual column `rv = vn − centroid(cell)` for a table carrying
    * (embedding, cell). The centroid matrix ships as one literal; the
    * per-component subtraction is a plain double op both engines
    * mirror.
    */
  private[pipeline] def withResiduals(df: DataFrame,
      cents: Array[Array[Double]]): DataFrame = {
    val base = if (df.columns.contains("vn")) df else withVn(df)
    base.select(col("*"),
      zip_with(col("vn"),
        element_at(typedLit(cents.map(_.toSeq).toSeq), col("cell").cast("int") + 1),
        (a, b) => a - b).as("rv"))
  }

  /** `(vec_id, embedding, cell, codes)` against fixed residual
    * codebooks — shared by the offline encode and [[IvfPqIndex.appendEncode]].
    */
  private[pipeline] def encodeResiduals(resid: DataFrame, m: Int, sub: Int,
      codebooks: IndexedSeq[Seq[(Int, Array[Double])]]): DataFrame = {
    val subs = PqIndex.withSubsOf(resid, col("rv"), m, sub)
    // every non-internal column (vec_id, embedding, label, …) persists
    // beside the codes — filtered probes need the attributes in-scan
    val internal = Set("vn", "rv", "cell") ++ (0 until m).map(j => s"v$j")
    val keep = subs.columns.filterNot(internal.contains).map(col)
    subs.select(keep ++ Seq(col("cell").cast("int").as("cell"),
      array((0 until m).map(j => PqIndex.codeCol(j, codebooks(j))): _*)
        .as("codes")): _*)
  }

  /** Offline build: coarse cells from the (cached) [[IvfIndex]] fit,
    * residual codebooks via the shared one-round fused Lloyd
    * ([[PqIndex.lloydOnce]]) seeded with the first cb vectors'
    * residuals, then ONE encode pass writing the code table
    * `partitionBy("cell")`.
    */
  def build(emb: DataFrame, nlist: Int, m: Int, cb: Int): IvfPqIndex = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val ivf = IvfIndex.forTable(emb, nlist)
    val cents = ivf.centroids
    val dim = cents.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    // residuals over the persisted cell layout (cell assignment already
    // materialized by the IVF build — never recomputed here)
    val cellsTable = emb.sparkSession.read.parquet(ivf.cellsDir)
    val resid = withResiduals(cellsTable, cents)
    // codebook init: residuals of the first cb vectors, derived
    // driver-side with the same normalize/assign/subtract op sequence
    val initRows: Array[Array[Double]] = emb.filter(col("vec_id") < cb)
      .orderBy("vec_id").select(col("embedding")).collect()
      .map { r =>
        val vn = IvfIndex.normalize(
          r.getSeq[Float](0).toArray.map(_.toDouble))
        val cell = IvfIndex.nearestCells(cents, vn, 1).head
        Array.tabulate(dim)(i => vn(i) - cents(cell)(i))
      }
    // r18: the sub-vector table MATERIALIZES before the Lloyd
    // aggregation. v0..v7 are slices of rv, which is itself a zip_with
    // over an element_at into the nlist×dim centroid literal — and the
    // Lloyd pass's explode/posexplode legs re-evaluate that whole
    // interpreted chain PER GENERATED ROW per lambda element (the
    // gramsOf recompute trap one level deeper: a projection boundary
    // is not enough once generators multiply the consumers). Measured:
    // lloydOnce 50.3 s → ~2 s at sf0.1; the checkpoint is corpus rows
    // × (dim + m·sub) doubles, the same data one Lloyd pass reads
    // anyway.
    val codebooks = PqIndex.lloydOnce(
      PqIndex.withSubsOf(resid, col("rv"), m, sub).localCheckpoint(),
      m, sub, initRows)
    val dir = graft.core.TempDirs.scoped("graft_ivfpq_")
    val codesPath = s"$dir/codes"
    // r20 (guide §6 small-files): one shuffle by cell before the
    // partitioned write — without it every write task that held rows
    // for a cell emitted its own fragment (nlist × tasks files total;
    // a probed read opened ~32 tiny files PER CELL). One file per cell
    // is the layout compact() already restores after appends.
    encodeResiduals(resid, m, sub, codebooks)
      .repartition(col("cell"))
      .write.partitionBy("cell").parquet(codesPath)
    new IvfPqIndex(emb, codesPath, nlist, m, sub, cents, codebooks)
  }
}
