package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must run end-to-end at sf0.001; the DuckDB
  * hash-compare is the driver's job, so here we assert execution plus
  * basic row-count expectations.
  */
class QueriesSpec extends AnyFunSuite {
  import TestSpark._

  // Near-dup candidate generation can legitimately be empty on 500
  // random docs; everything else must produce rows.
  private val mayBeEmpty =
    Set("q_dedup_minhash", "q_embed_dedup", "q_ngram_jaccard", "q_simhash_pairs")

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
