package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.parquet.example.data.Group
import org.apache.parquet.filter2.compat.FilterCompat
import org.apache.parquet.filter2.predicate.FilterPredicate
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.example.GroupReadSupport

/** Driver-side parquet reads for the warm serve tiers — the
  * [[graft.tsdb.TickStore.scanRangeLocal]] posture generalized: a cold
  * serve query needs a few thousand rows from a partition-pruned
  * artifact, and a Spark job pays ~100–150 ms of scheduling, codegen
  * and collect machinery for bytes a direct parquet-mr read returns in
  * single-digit ms. Row-group statistics and dictionary pages still
  * prune via parquet's own filter2 stack (`FilterCompat`), so a
  * term/id-filtered read skips non-matching row groups exactly like
  * the pushed-down Spark scan would.
  *
  * Callers must treat any exception as "fall back to the Spark path" —
  * these helpers throw rather than guess on unexpected layouts.
  */
object LocalParquet {

  // small shared pool for fanning reader opens across files/partitions:
  // parquet-mr pays ~10-15 ms of footer/filesystem/codec setup PER
  // OPEN, serial opens dominate a multi-cell cold load. Daemon threads
  // (never block JVM exit); bounded so a serve burst cannot fork-bomb.
  private lazy val pool = java.util.concurrent.Executors.newFixedThreadPool(
    8,
    (r: Runnable) => {
      val t = new Thread(r, "graft-local-parquet")
      t.setDaemon(true)
      t
    })

  /** Map `f` over `xs` on the shared pool; the first failure rethrows
    * its cause (callers treat any exception as "fall back to Spark").
    */
  def parMap[A, B](xs: Seq[A])(f: A => B): Seq[B] = {
    if (xs.size <= 1) return xs.map(f)
    val futs = xs.map(x => pool.submit(
      new java.util.concurrent.Callable[B] { def call(): B = f(x) }))
    futs.map { fut =>
      try fut.get()
      catch {
        case e: java.util.concurrent.ExecutionException =>
          throw Option(e.getCause).getOrElse(e)
      }
    }
  }

  /** Data files directly under `dir` (no recursion): parquet part
    * files only, meta/hidden files skipped. A plain-file root returns
    * itself (single-file tables); empty or missing dir → empty list.
    */
  def dataFiles(dir: Path, conf: Configuration): Seq[FileStatus] = {
    val fs = dir.getFileSystem(conf)
    if (!fs.exists(dir)) Seq.empty
    else {
      val st = fs.getFileStatus(dir)
      if (st.isFile) Seq(st)
      else fs.listStatus(dir).toSeq.filter { f =>
        val n = f.getPath.getName
        f.isFile && !n.startsWith("_") && !n.startsWith(".")
      }
    }
  }

  /** Root paths of a DataFrame that is a PLAIN parquet scan (no
    * projection, filter or join above the relation) — the only shape a
    * local read may stand in for. Anything else → None.
    */
  def plainParquetRoots(df: org.apache.spark.sql.DataFrame): Option[Seq[Path]] =
    df.queryExecution.optimizedPlan match {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation
              if fs.fileFormat.isInstanceOf[
                org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat] =>
            Some(fs.location.rootPaths)
          case _ => None
        }
      case _ => None
    }

  /** Stream every (filtered) record of `file` through `f`. */
  def readGroups(file: Path, conf: Configuration,
      filter: Option[FilterPredicate])(f: Group => Unit): Unit = {
    val b = ParquetReader.builder(new GroupReadSupport(), file).withConf(conf)
    val reader = filter.fold(b)(p => b.withFilter(FilterCompat.get(p))).build()
    try {
      var g = reader.read()
      while (g != null) {
        f(g)
        g = reader.read()
      }
    } finally reader.close()
  }

  /** Elements of a Spark-written `array<int>` column (3-level list
    * encoding); a NULL array reads as empty.
    */
  def intArray(g: Group, field: String): Array[Int] = {
    if (g.getFieldRepetitionCount(field) == 0) return Array.empty
    val w = g.getGroup(field, 0)
    val n = w.getFieldRepetitionCount(0)
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = w.getGroup(0, i).getInteger(0, 0); i += 1 }
    out
  }

  /** Elements of a Spark-written `array<float>` column. */
  def floatArray(g: Group, field: String): Array[Float] = {
    if (g.getFieldRepetitionCount(field) == 0) return Array.empty
    val w = g.getGroup(field, 0)
    val n = w.getFieldRepetitionCount(0)
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = w.getGroup(0, i).getFloat(0, 0); i += 1 }
    out
  }
}
