package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The media decode is REAL — these tests check the parser against the
  * format specs independently of the closed-form oracle: a hand-built
  * reference BMP/WAV (fields chosen to expose endianness and padding
  * mistakes) must decode exactly, and the decoded features must equal a
  * brute-force recompute over the very bytes that were written.
  */
class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = graft.core.Tables.documents(spark, sf)

  test("decodeMeta reads real header fields (endianness, spec offsets)") {
    import spark.implicits._
    // 3×2 24bpp BMP: rowSize = 12 (9 pixel bytes + 3 padding)
    val bmp = java.nio.ByteBuffer.allocate(54 + 24)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bmp.put('B'.toByte).put('M'.toByte).putInt(78).putShort(0).putShort(0)
      .putInt(54).putInt(40).putInt(3).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(24).putInt(2835).putInt(2835).putInt(0).putInt(0)
    // 11025 Hz stereo 8-bit WAV, 10 bytes of data
    val wav = java.nio.ByteBuffer.allocate(54)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wav.put("RIFF".getBytes).putInt(46).put("WAVE".getBytes)
      .put("fmt ".getBytes).putInt(16).putShort(1).putShort(2)
      .putInt(11025).putInt(11025 * 2).putShort(2).putShort(8)
      .put("data".getBytes).putInt(10).put(Array.fill(10)(0x7f.toByte))
    val in = Seq((0L, bmp.array()), (1L, wav.array())).toDF("doc_id", "blob")
    val rows = Multimodal.decodeMeta(in).collect()
    val b = rows(0)
    assert(b.getString(1) === "bmp" && b.getLong(3) === 3L &&
      b.getLong(4) === 2L && b.getLong(5) === 24L)
    val w = rows(1)
    assert(w.getString(1) === "wav" && w.getLong(6) === 2L &&
      w.getLong(7) === 11025L && w.getLong(8) === 8L &&
      w.getLong(9) === 10L)
    // duration = 10 bytes * 1e6 / (11025 * 2ch * 1Bps) = 453 µs (floored)
    assert(w.getLong(10) === 10L * 1000000L / (11025L * 2L))
  }

  test("decodeFeatures equals a brute-force recompute of the written bytes") {
    val blobs = Multimodal.synthesizeMedia(spark, docs.limit(40))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val decoded = Multimodal.mediaFeatures(spark, docs.limit(40))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(decoded.size === blobs.size)
    blobs.foreach { case (id, bytes) =>
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val (kind, n, mean) = decoded(id)
      if (id % 2 == 0) {
        assert(kind === "bmp")
        val off = bb.getInt(10); val w = bb.getInt(18); val h = bb.getInt(22)
        val rowSize = ((w * 3 + 3) / 4) * 4
        val px = for (r <- 0 until h; j <- 0 until w * 3)
          yield (bytes(off + r * rowSize + j) & 0xff).toLong
        assert(n === px.length.toLong)
        assert(mean === px.sum.toDouble / px.length)
      } else {
        assert(kind === "wav")
        val dataSize = bb.getInt(40)
        val samples = (0 until dataSize / 2).map(i => bb.getShort(44 + i * 2).toLong)
        assert(n === samples.length.toLong)
        assert(mean === samples.sum.toDouble / samples.length)
      }
    }
  }

  test("resizeFeatures samples the real 2x pixel grid (bytes recompute)") {
    val blobs = Multimodal.synthesizeMedia(spark, docs.limit(40))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val got = Multimodal.resizeFeatures(spark, docs.limit(40))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got.keySet === blobs.keySet.filter(_ % 2 == 0))
    got.foreach { case (id, (w2, h2, n, mean, mn, mx)) =>
      val bytes = blobs(id)
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val off = bb.getInt(10); val w = bb.getInt(18); val h = bb.getInt(22)
      val rowSize = ((w * 3 + 3) / 4) * 4
      assert((w2, h2) === (((w + 1) / 2).toLong, ((h + 1) / 2).toLong), id)
      val vs = for {
        y <- 0 until (h + 1) / 2
        x <- 0 until (w + 1) / 2
        c <- 0 until 3
      } yield (bytes(off + 2 * y * rowSize + 2 * x * 3 + c) & 0xff).toLong
      assert(n === vs.size.toLong, id)
      assert(mean === vs.sum.toDouble / vs.size, id)
      assert((mn, mx) === ((vs.min, vs.max)), id)
    }
  }

  test("resampleFeatures keeps every 2nd real PCM sample (bytes recompute)") {
    val blobs = Multimodal.synthesizeMedia(spark, docs.limit(40))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val got = Multimodal.resampleFeatures(spark, docs.limit(40))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.keySet === blobs.keySet.filter(_ % 2 == 1))
    got.foreach { case (id, (rate2, n2, mean, mn, mx)) =>
      val bytes = blobs(id)
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      assert(rate2 === bb.getInt(24).toLong / 2L, id)
      val n = bb.getInt(40) / 2
      val vs = (0 until n by 2).map(i => bb.getShort(44 + i * 2).toLong)
      assert(n2 === vs.size.toLong, id)
      assert(mean === vs.sum.toDouble / vs.size, id)
      assert((mn, mx) === ((vs.min, vs.max)), id)
    }
  }

  test("AVI keyframe sampling equals a brute recompute from the idx1 bytes") {
    val blobs = Multimodal.synthesizeVideos(spark, docs.limit(30))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    val decoded = Multimodal.frameSummary(spark, docs.limit(30))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r =>
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toVector)
      .toMap
    assert(decoded.keySet === blobs.keySet)
    blobs.foreach { case (id, bytes) =>
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      // independent walk: idx1 sits after the movi LIST; movi fourcc at 20
      assert(new String(bytes, 8, 4) === "AVI ")
      assert(new String(bytes, 20, 4) === "movi")
      val moviSize = bb.getInt(16)
      val idxPos = 20 + moviSize + 8 // past LIST data + idx1 header
      assert(new String(bytes, idxPos - 8, 4) === "idx1")
      val n = bb.getInt(idxPos - 4) / 16
      val expect = (0 until n).flatMap { k =>
        val e = idxPos + k * 16
        if ((bb.getInt(e + 4) & 0x10) == 0) None
        else {
          val off = 20 + bb.getInt(e + 8) + 8
          val sz = bb.getInt(e + 12)
          val sum = (0 until sz).map(j => (bytes(off + j) & 0xff).toLong).sum
          Some((k.toLong, off.toLong, sz.toLong, sum))
        }
      }.toVector
      assert(decoded(id) === expect, s"doc $id keyframe table mismatch")
      // keyframes are a strict subset: every 3rd frame only
      assert(expect.map(_._1) === (0L until n.toLong by 3L).toVector)
    }
  }

  test("decodeFrameIndex survives hostile blobs (r11 guards: null, negative sizes, truncation)") {
    import spark.implicits._
    def le(i: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(i).array()
    val riff = "RIFF".getBytes ++ le(100) ++ "AVI ".getBytes
    val hostile: Seq[(Long, Array[Byte])] = Seq(
      1L -> null, // null blob
      2L -> Array[Byte](1, 2, 3), // too short
      3L -> (riff ++ "LIST".getBytes ++ le(-8) ++ "movi".getBytes), // negative chunk size (was an infinite loop)
      4L -> (riff ++ "LIST".getBytes ++ le(1 << 30) ++ "movi".getBytes), // overlong chunk
      // index entry whose payload points past the end of the blob
      5L -> (riff ++ "LIST".getBytes ++ le(4) ++ "movi".getBytes ++
        "idx1".getBytes ++ le(16) ++
        "00dc".getBytes ++ le(0x10) ++ le(500) ++ le(64)))
    val df = hostile.toDF("doc_id", "blob")
    // no NPE / infinite loop / out-of-bounds read; nothing decodes
    assert(Multimodal.decodeFrameIndex(spark, df).collect().isEmpty)
  }

  test("synthesized containers are well-formed (sizes match headers)") {
    val bad = Multimodal.synthesizeMedia(spark, docs)
      .select(col("doc_id"), length(col("blob")).as("len"), col("blob"))
      .collect().count { r =>
        val bytes = r.getAs[Array[Byte]]("blob")
        val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        if (bytes(0) == 'B'.toByte) bb.getInt(2) != bytes.length // BMP file size field
        else bb.getInt(4) + 8 != bytes.length                    // RIFF chunk size + 8
      }
    assert(bad === 0)
  }
}
