package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline over the
  * `documents` table.
  *
  * Exact dedup is a single hash-shuffle groupBy on a 128-bit content
  * hash: at 100 TB the shuffle carries only (hash, doc_id) pairs, not
  * document text, because Catalyst prunes `text` after the md5 is
  * computed map-side.
  */
object Dedup {
  /** Exact duplicate groups by content hash; survivor = min doc_id.
    * Returns one row per distinct content: (keep_id, dup_count).
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("dup_count"))
      .select(col("keep_id"), col("dup_count"))
      .orderBy("keep_id")

  /** Word n-gram shingles (sorted distinct), the input to MinHash /
    * Jaccard. Pure scalar transform, no shuffle.
    */
  def shingles(docs: DataFrame, n: Int = 3): DataFrame = {
    val words = split(col("text"), " ")
    // k-gram via transform over sliding offsets; filter short tails
    val grams = filter(
      transform(words, (w, i) =>
        when(i <= size(words) - n,
          concat_ws(" ", (0 until n).map(j => element_at(words, i + j + 1)): _*))),
      g => g.isNotNull)
    docs.select(col("doc_id"), array_distinct(grams).as("shingles"))
  }

  /** MinHash signatures over word shingles: k independent permutations
    * approximated by k seeded hashes; signature[i] = min over shingles of
    * hash_i(shingle). Map-side only; the LSH band join below is the
    * single shuffle.
    */
  def minhashSignatures(docs: DataFrame, n: Int = 3, k: Int = 16): DataFrame =
    shingles(docs, n).select(col("doc_id"),
      array((0 until k).map { i =>
        array_min(transform(col("shingles"), s => xxhash64(lit(i), s)))
      }: _*).as("sig"))

  /** LSH near-duplicate candidate pairs: band the signature, equi-join on
    * (band_id, band_hash). Each band is rows/bands wide; docs sharing any
    * band collide. Output is candidate pairs (a < b) with estimated
    * Jaccard = fraction of matching signature positions.
    */
  def minhashCandidates(docs: DataFrame, n: Int = 3, k: Int = 16, bands: Int = 4): DataFrame = {
    val sigs = minhashSignatures(docs, n, k).cache()
    val rowsPerBand = k / bands
    val banded = sigs.select(col("doc_id"), col("sig"),
        posexplode(array((0 until bands).map { b =>
          xxhash64((b * rowsPerBand until (b + 1) * rowsPerBand)
            .map(i => element_at(col("sig"), i + 1)): _*)
        }: _*)).as(Seq("band_id", "band_hash")))
    val a = banded.select(col("band_id"), col("band_hash"),
      col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band_id"), col("band_hash"),
      col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band_id", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
          m => m)).cast("double") / k).as("est_jaccard"))
      .distinct()
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash: 64-bit signature where bit j = sign of the sum over words
    * of (+1/-1 depending on bit j of the word hash). Near-dups have small
    * Hamming distance. Computed with bit arithmetic over xxhash64 — all
    * codegen'd builtins.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val words = split(col("text"), " ")
    // For each bit, sum +1/-1 across words, then collapse to a bit.
    val bits = (0 until 64).map { j =>
      val votes = aggregate(words, lit(0L),
        (acc, w) => acc + when(shiftright(xxhash64(w), j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(votes > 0, shiftleft(lit(1L), j)).otherwise(0L)
    }
    docs.select(col("doc_id"), bits.reduce(_ bitwiseOR _).as("simhash"))
      .orderBy("doc_id")
  }

  /** Exact n-gram Jaccard for candidate pairs (verification stage after
    * LSH): |A∩B| / |A∪B| over shingle sets.
    */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, n: Int = 3): DataFrame = {
    val sh = shingles(docs, n)
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        round(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }
}
