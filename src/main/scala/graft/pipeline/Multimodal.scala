package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run decode /
  * feature-extraction as partition-wise functions (the Scala analog of
  * `mapInPandas` batches).
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly marked DETERMINISTIC STUB ([[stubDecode]]) — the Spark-side
  * contract (schema, batching, partition-wise execution, null
  * handling) is real and tested; swapping the stub for a JNI/codec
  * call changes no plan shape.
  *
  * At 100 TB: blobs never shuffle — metadata extraction and decode are
  * map-side; only extracted features (small, fixed-width) flow into
  * joins/aggregations downstream.
  */
object Multimodal {
  /** Attach a binary payload column. In production this is the raw
    * media payload read from parquet/object storage; here the document
    * text bytes stand in as the blob.
    */
  def attachBlob(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text").cast("binary").as("blob"),
      col("source"), col("lang"))

  /** Typed metadata over the opaque blob — size, checksum, and a
    * deterministic pseudo width/height/duration (in production these
    * come from the container header; derivation from the checksum keeps
    * the pipeline runnable without codecs). The checksum is the first
    * 8 hex digits of md5 as an integer — md5 is the one digest every
    * engine computes identically, keeping this oracle-checkable.
    */
  def extractMeta(withBlob: DataFrame): DataFrame = {
    val sum = conv(substring(md5(col("blob")), 1, 8), 16, 10).cast("long")
    withBlob.select(col("doc_id"), col("blob"),
      struct(
        length(col("blob")).cast("long").as("n_bytes"),
        sum.as("checksum"),
        (pmod(sum, lit(1280L)) + 32L).as("width"),
        (pmod(sum, lit(720L)) + 32L).as("height"),
        col("source").as("container")).as("meta"))
  }

  /** Feature vector record produced by the decode stage. */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, mean_byte: Double,
      features: Array[Float])

  /** Partition-wise decode + feature extraction.
    *
    * STUB: a real implementation decodes the blob (image/audio frame)
    * and emits model features; no codec libraries exist in this
    * container, so features are a deterministic fake — byte-histogram
    * moments over `dim` equal-width slices. Batch shape, schema, and
    * executor-side execution are the real contract.
    */
  def stubDecode(spark: SparkSession, withBlob: DataFrame, dim: Int = 8): Dataset[MediaFeatures] = {
    import spark.implicits._
    withBlob.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, blob) =>
          val bytes = if (blob == null) Array.emptyByteArray else blob
          val n = bytes.length
          val mean = if (n == 0) 0.0 else bytes.map(b => (b & 0xff).toDouble).sum / n
          val feats = Array.tabulate(dim) { i =>
            val lo = i * n / dim
            val hi = math.max(lo + 1, (i + 1) * n / dim)
            val slice = bytes.slice(lo, math.min(hi, n))
            if (slice.isEmpty) 0f
            else (slice.map(b => (b & 0xff).toInt).sum.toFloat / (255f * slice.length))
          }
          MediaFeatures(id, n.toLong, mean, feats)
        }
      }
  }

  final case class Frame(doc_id: Long, frame_idx: Long, frame: Array[Byte])

  /** Partition-wise frame sampling: treat the blob as fixed-size
    * `frameBytes` frames and keep every `every`-th one — the video
    * keyframe-sampling shape (decode stays stubbed; the slicing,
    * fan-out row explosion, and executor-side execution are the real
    * contract). Blobs never shuffle: sampling is map-side and only the
    * sampled frames flow on.
    */
  def sampleFrames(spark: SparkSession, withBlob: DataFrame,
      frameBytes: Int = 256, every: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    withBlob.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, blob) =>
          val bytes = if (blob == null) Array.emptyByteArray else blob
          val n = bytes.length
          val nFrames = (n + frameBytes - 1) / frameBytes
          (0 until nFrames by every).iterator.map { i =>
            Frame(id, i.toLong,
              bytes.slice(i * frameBytes, math.min(n, (i + 1) * frameBytes)))
          }
        }
      }
  }

  /** Sampled-frame summary: every 4th 256-byte frame with its length
    * and md5 — engine-neutral digests, so the whole frame-sampling
    * path is DuckDB-oracled (blob slicing via substring on both
    * engines).
    */
  def frameSummary(spark: SparkSession, docs: DataFrame): DataFrame =
    sampleFrames(spark, attachBlob(docs)).toDF()
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_md5"))
      .orderBy("doc_id", "frame_idx")

  /** End-to-end multimodal query: blob → metadata → decoded features,
    * joined back on doc_id. Every emitted column (md5-derived checksum,
    * byte-sum mean from the stub decode) is engine-neutral, so the
    * whole pipeline is DuckDB-oracled.
    */
  def pipeline(spark: SparkSession, docs: DataFrame): DataFrame = {
    val meta = extractMeta(attachBlob(docs))
    val feats = stubDecode(spark, meta).toDF()
    meta.select(col("doc_id"), col("meta.n_bytes").as("n_bytes"),
        col("meta.checksum").as("checksum"), col("meta.width").as("width"),
        col("meta.height").as("height"))
      .join(feats.select(col("doc_id"), col("mean_byte"),
          size(col("features")).cast("long").as("feat_dim")),
        "doc_id")
      .orderBy("doc_id")
  }
}
