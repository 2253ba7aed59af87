package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** r14: streaming near-dup candidate flags — the re-crawl replay must
  * flag EVERY streamed doc (each shares all its bands with its own
  * original), and the flags must be self-consistent with the id shift.
  * Value-level parity with the batch band self-join is the oracle
  * gate's job; this pins the streaming semantics.
  */
class StreamDedupFlagsSpec extends AnyFunSuite {
  import TestSpark._

  test("every streamed re-crawl doc flags at least its own original") {
    val docs = graft.core.Tables.documents(spark, sf)
    val n = docs.count()
    val flags = Streams.streamDedupFlags(spark, sf).collect()
    assert(flags.length === n, "a streamed doc produced no flag row")
    flags.foreach { r =>
      assert(r.getLong(1) >= 1L, s"doc ${r.getLong(0)} flagged nothing")
      assert(r.getLong(0) >= 1000000L, "id shift missing")
    }
  }
}
