package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Value-level gates for the r16 additions (the oracle hash-compare is
  * the driver's job; these pin semantics on crafted fixtures).
  */
class NewOpsR16Spec extends AnyFunSuite {
  import TestSpark._

  private def q6(x: Double): Double = {
    val s = x * 1e6
    (if (s >= 0) math.floor(s + 0.5) else math.ceil(s - 0.5)) / 1e6
  }

  test("bm25: exact recompute on a crafted three-doc corpus") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "b b c d"), (3L, "c"))
      .toDF("doc_id", "text")
    val got = graft.pipeline.TextOps.bm25(docs, Seq("a", "b"), 10).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // N=3, Σdl=8, avgdl=8/3; df_a=1, df_b=2 — the Lucene idf and the
    // exact double chain the operator mirrors (doc 3 matches no term)
    val n = 3.0; val avgdl = 8.0 / 3.0
    def idf(df: Double): Double = q6(math.log((n - df + 0.5) / (df + 0.5) + 1.0))
    def c(tf: Double, df: Double, dl: Double): Double =
      if (tf == 0) 0.0
      else q6(idf(df) * (tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * (dl / avgdl)))))
    assert(got.keySet === Set(1L, 2L))
    assert(got(1L) === ((3L, c(2, 1, 3) + c(1, 2, 3))))
    assert(got(2L) === ((4L, c(0, 1, 4) + c(2, 2, 4))))
  }

  test("bpeApply: token counts after one induced merge, by hand") {
    import spark.implicits._
    // round-1 merge is (a,b) (weighted count 4); with k=1 the types
    // re-tokenize to: abab→[ab,ab], ab→[ab], abc→[ab,c], xz→[x,z];
    // 1-char words count 1 token
    val docs = Seq((1L, "abab ab"), (2L, "abc b"), (3L, "xz"))
      .toDF("doc_id", "text")
    val got = graft.pipeline.TextOps.bpeApply(docs, 1).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) === ((3L, 2L, 1.5)))
    assert(got(2L) === ((3L, 2L, 1.5)))
    assert(got(3L) === ((2L, 1L, 2.0)))
  }

  test("bpeApply: full merges collapse every multi-char word to one token") {
    import spark.implicits._
    val docs = Seq((1L, "abab ab"), (2L, "abc b"), (3L, "xz"))
      .toDF("doc_id", "text")
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 1L) // digest-disambiguating literal
    val got = graft.pipeline.TextOps.bpeApply(docs, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 4 merges dry the corpus: every word type becomes a single token
    assert(got === Map(1L -> 2L, 2L -> 2L, 3L -> 1L))
  }
}
