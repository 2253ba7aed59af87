package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r15 (the r14 verdict's item 4): WARM driver-side ANN serving — the
  * TickStore `scanRangeLocal`/serve-cache posture applied to
  * retrieval. The Cli serve loop answers point/range tick reads in
  * ~0.1 ms from a driver cache; an interactive retrieval user wants
  * the same for ANN, without paying Spark job scheduling (~100+ ms)
  * per query.
  *
  * What stays driver-resident is exactly what FAISS keeps in RAM:
  * the coarse centroids and PQ codebooks (the [[IvfPqIndex]] already
  * holds both), plus an LRU of PROBED CELLS' code+vector arrays —
  * bounded on the cell axis like the Cli symbol cache is bounded on
  * symbols, so a 100 TB corpus serves its hot cells from driver
  * memory while cold cells pay one pruned load on first touch.
  *
  * Every arithmetic step mirrors the Spark query path bit for bit
  * (same quant6 ADC entries — they are BUILT by the same driver code
  * — same index-order cosine fold, same HALF_UP round, same tie
  * orders), so a warm serve answer EQUALS `ivfPqTopK`'s collected
  * result (AnnServeSpec gates this).
  */
class AnnServe private (
    index: IvfPqIndex,
    emb: DataFrame,
    nprobe: Int,
    shortlist: Int,
    maxCells: Int) {

  import PqIndex.q6

  // r17 (ADVICE): a single query probing more cells than the cache
  // holds would SELF-EVICT mid-pass (cells loaded early in warmCells
  // evicted before scoring reads them — silently dropped candidates,
  // no error). Guard the configuration instead of failing quietly.
  require(nprobe <= maxCells,
    s"nprobe=$nprobe exceeds the cell cache bound maxCells=$maxCells — " +
      "a query would evict its own probes mid-pass")

  /** `version` = the index version the arrays were loaded at — a cell
    * whose [[IvfPqIndex.cellVersion]] has advanced past it was appended
    * into since the load and must reload (r16, the r15 verdict's #2:
    * without this a warm cell silently serves the pre-append array
    * forever while the Spark query path sees the appended vectors).
    */
  private final case class CellData(
      ids: Array[Long], codes: Array[Array[Int]], embs: Array[Array[Float]],
      version: Long)

  private val cellCache =
    new java.util.LinkedHashMap[Int, CellData](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Int, CellData]): Boolean = size() > maxCells
    }

  private def isFresh(cell: Int): Boolean = {
    val cd = cellCache.get(cell)
    cd != null && index.cellVersion(cell) <= cd.version
  }

  // query-vector read-through cache (ids served repeatedly stay warm)
  private val vecCache =
    new java.util.LinkedHashMap[Long, Array[Float]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long, Array[Float]]): Boolean = size() > 4096
    }

  /** Load every missing probed cell — driver-side parquet reads of the
    * cell partitions first (r20, the scanRangeLocal posture: no Spark
    * job on the serve path), falling back to ONE pruned Spark read on
    * any unexpected layout. Warm queries never reach here.
    */
  private def warmCells(probes: Seq[Int]): Map[Int, CellData] = {
    // missing OR stale (appended-into since load) cells reload in ONE
    // pruned read; the version is snapshotted BEFORE the read so an
    // append racing the load marks the entry stale again, never fresh
    val missing = probes.filter(c => !isFresh(c))
    if (missing.nonEmpty) {
      val loadVersions = missing.map(c => c -> index.cellVersion(c)).toMap
      // both paths produce (cell -> rows sorted by vec_id); the local
      // map carries EVERY requested cell (empty cells as empty arrays),
      // the Spark map only the non-empty ones — the placeholder loop
      // below covers the difference either way
      val byCell: Map[Int, Array[(Long, Array[Int], Array[Float])]] =
        try index.cellRowsLocal(missing)
        catch {
          case e: Exception =>
            if (sys.env.contains("GRAFT_SERVE_DEBUG")) e.printStackTrace()
            index.codes()
              .filter(col("cell").isin(missing: _*))
              .select(col("cell"), col("vec_id"), col("codes"), col("embedding"))
              .collect()
              .groupBy(_.getInt(0))
              .map { case (cell, rs) =>
                cell -> rs.sortBy(_.getLong(1)).map(r => (r.getLong(1),
                  r.getSeq[Int](2).toArray, r.getSeq[Float](3).toArray))
              }
        }
      byCell.foreach { case (cell, rs) =>
        cellCache.put(cell, CellData(
          rs.map(_._1), rs.map(_._2), rs.map(_._3), loadVersions(cell)))
      }
      // probed cells with zero vectors still cache (empty), so a
      // repeat probe of an empty cell stays warm. r17 (ADVICE): "empty"
      // is decided by what the LOAD returned (keys absent from `rows`),
      // NEVER by a post-load isFresh re-check — an append racing
      // between the version snapshot and that re-check would flip
      // isFresh false for a cell just loaded WITH rows, and the
      // placeholder would clobber real data for the in-flight query.
      // With the snapshotted (pre-read) version, a raced entry is
      // simply stale again and reloads on the next query.
      missing.filterNot(byCell.contains)
        .foreach(c => cellCache.put(c,
          CellData(Array.empty, Array.empty, Array.empty, loadVersions(c))))
    }
    probes.map(c => c -> cellCache.get(c)).toMap
  }

  // the embeddings table's file roots, when (and only when) `emb` is a
  // plain parquet scan a driver-side read can stand in for (r20)
  private lazy val embRoots: Option[Seq[org.apache.hadoop.fs.Path]] =
    try graft.core.LocalParquet.plainParquetRoots(emb)
    catch { case _: Exception => None }

  /** Query vector by id: warm cells first, then one point lookup —
    * driver-side with a parquet-mr vec_id filter (row-group stats and
    * dictionary pages prune exactly like the pushed-down Spark scan;
    * no job), Spark-scan fallback on non-plain tables or any read
    * surprise. Served ids stay warm in the LRU either way.
    */
  private def vecFor(vecId: Long): Array[Float] = {
    val hit = vecCache.get(vecId)
    if (hit != null) return hit
    val it = cellCache.values().iterator()
    while (it.hasNext) {
      val cd = it.next()
      val i = java.util.Arrays.binarySearch(cd.ids, vecId)
      if (i >= 0) { vecCache.put(vecId, cd.embs(i)); return cd.embs(i) }
    }
    val local: Option[Array[Float]] = embRoots.flatMap { roots =>
      try {
        import graft.core.LocalParquet
        import org.apache.parquet.filter2.predicate.FilterApi
        val conf = emb.sparkSession.sparkContext.hadoopConfiguration
        val files = roots.flatMap(LocalParquet.dataFiles(_, conf))
        // many-file tables: a driver-side point lookup would open every
        // footer — that is the distributed scan's job; fall back
        if (files.isEmpty || files.size > 64) None
        else {
          val pred = FilterApi.eq(FilterApi.longColumn("vec_id"),
            java.lang.Long.valueOf(vecId))
          // footer stats skip non-matching row groups per file; only
          // the file holding the id decodes anything
          LocalParquet.parMap(files) { f =>
            var found: Option[Array[Float]] = None
            LocalParquet.readGroups(f.getPath, conf, Some(pred)) { g =>
              if (found.isEmpty)
                found = Some(LocalParquet.floatArray(g, "embedding"))
            }
            found
          }.flatten.headOption
          // clean read, id absent → Spark path (throws as before)
        }
      } catch { case _: Exception => None }
    }
    val v = local.getOrElse(
      emb.filter(col("vec_id") === vecId)
        .select(col("embedding")).head().getSeq[Float](0).toArray)
    vecCache.put(vecId, v)
    v
  }

  /** r20 (the r19 verdict's #3, guide §4.5 init-once): warm the shared
    * plan fragments at serve START so the first real query pays only
    * its own probed cells' IO, not first-plan analysis + parquet
    * listing/footer work. Two untimed micro-jobs: a zero-partition
    * pruned codes read (cell = −1 prunes everything — warms the
    * FileStatusCache listing, schema inference, analysis and codegen
    * of exactly the warmCells plan shape) and a one-row embeddings
    * read (warms the point-lookup scan path; bounded at any corpus
    * size — no filter, LIMIT 1). No cell data, no query answer is
    * cached here — the LRU stays empty until a real query probes.
    */
  def prewarm(): Unit = {
    index.codes().filter(col("cell").isin(-1))
      .select(col("cell"), col("vec_id"), col("codes"), col("embedding"))
      .collect()
    emb.select(col("embedding")).limit(1).collect()
    // local-reader init (r20): one zero-row filtered parquet-mr read
    // warms the driver-side read stack (Hadoop FS, footer reader,
    // GroupReadSupport, filter2 classes — ~100 ms of one-time class
    // loading otherwise billed to the first cold query). Stats prune
    // every row group for vec_id = −1, so no data is read or cached.
    try embRoots.foreach { roots =>
      import graft.core.LocalParquet
      import org.apache.parquet.filter2.predicate.FilterApi
      val conf = emb.sparkSession.sparkContext.hadoopConfiguration
      val pred = FilterApi.eq(FilterApi.longColumn("vec_id"),
        java.lang.Long.valueOf(-1L))
      roots.flatMap(LocalParquet.dataFiles(_, conf)).headOption.foreach(f =>
        LocalParquet.readGroups(f.getPath, conf, Some(pred))(_ => ()))
    } catch { case _: Exception => () }
  }

  /** Warm top-k by query id — the serve-loop entry point. */
  def topKById(vecId: Long, k: Int): Seq[(Long, Double)] =
    topK(vecFor(vecId), k, excludeId = vecId)

  /** Driver-computed IVFPQ top-k: probe selection, per-cell residual
    * ADC, shortlist, exact cosine re-rank — the [[IvfPqIndex.topK]]
    * arithmetic executed as plain loops over the cached cell arrays.
    */
  def topK(qvecF: Array[Float], k: Int, excludeId: Long = -1L): Seq[(Long, Double)] = {
    val m = index.m
    val sub = index.sub
    val qn = IvfIndex.normalize(qvecF.map(_.toDouble))
    val probes = IvfIndex.nearestCells(index.centroids, qn, nprobe)
    val cells = warmCells(probes)
    // per-(cell, j) ADC tables — identical construction to the query
    // path's literal maps
    val tables: Map[Int, Array[Map[Int, Double]]] = probes.map { cell =>
      val cc = index.centroids(cell)
      cell -> Array.tabulate(m) { j =>
        val qr = Array.tabulate(sub)(i => qn(j * sub + i) - cc(j * sub + i))
        index.codebooks(j).map { case (code, cent) =>
          var acc = 0.0
          var i = 0
          while (i < sub) { val d = cent(i) - qr(i); acc += d * d; i += 1 }
          code -> q6(acc)
        }.toMap
      }
    }.toMap
    // candidates: (adc, vec_id) over the probed cells
    val cand = Array.newBuilder[(Double, Long, Array[Float])]
    probes.foreach { cell =>
      val cd = cells(cell)
      val tj = tables(cell)
      var r = 0
      while (r < cd.ids.length) {
        if (cd.ids(r) != excludeId) {
          var adc = 0.0
          var j = 0
          while (j < m) { adc += tj(j)(cd.codes(r)(j)); j += 1 }
          cand += ((adc, cd.ids(r), cd.embs(r)))
        }
        r += 1
      }
    }
    // shortlist by (adc, vec_id) asc — the orderBy/limit mirror
    val short = cand.result().sortBy(t => (t._1, t._2)).take(shortlist)
    // exact cosine re-rank: index-order double folds, IEEE sqrt, one
    // division, HALF_UP round to 4 (the Spark Round(double) sequence)
    val qd = qvecF.map(_.toDouble)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length && i < b.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val qq = math.sqrt(dot(qd, qd))
    short.map { case (_, id, ef) =>
      val ed = ef.map(_.toDouble)
      val cs = dot(ed, qd) / (math.sqrt(dot(ed, ed)) * qq)
      val rounded = java.math.BigDecimal.valueOf(cs)
        .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
      (id, rounded)
    }.sortBy { case (id, cs) => (-cs, id) }.take(k).toSeq
  }
}

object AnnServe {
  /** Serve wrapper over the (digest-cached) IVFPQ index for `emb`,
    * with the same nlist/nprobe/shortlist policy defaults as
    * [[Similarity.ivfPqTopK]] — a serve answer and a Spark query
    * answer come from the SAME artifact and constants.
    */
  def forTable(emb: DataFrame, maxCells: Int = 256): AnnServe = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    val nl = IvfPqIndex.defaultNlist(IvfPqIndex.countFor(emb))
    val np = IvfPqIndex.defaultNprobe(nl)
    new AnnServe(IvfPqIndex.forTable(emb, nl, 8, 16), emb, np,
      Similarity.IvfPqShortlist, maxCells)
  }

  /** Serve wrapper over a STANDING (caller-held) index — the
    * delete/append lifecycle entry point: mutations on `index` are
    * observed through the cell-version handshake.
    */
  def forIndex(index: IvfPqIndex, emb: DataFrame,
      maxCells: Int = 256): AnnServe = {
    graft.functions.GraftFunctions.register(emb.sparkSession)
    new AnnServe(index, emb, IvfPqIndex.defaultNprobe(index.nlist),
      Similarity.IvfPqShortlist, maxCells)
  }
}
