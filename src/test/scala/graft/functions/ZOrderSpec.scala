package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {

  private val dim32 = Gen.chooseNum(0L, 0xffffffffL)

  private def samples(n: Int): Seq[(Long, Long)] =
    (0 until n).flatMap { i =>
      for {
        x <- dim32.apply(Gen.Parameters.default, Seed(i.toLong))
        y <- dim32.apply(Gen.Parameters.default, Seed(i.toLong + 1000))
      } yield (x, y)
    }

  private def deinterleave(z: Long): (Long, Long) = {
    def collapse(v0: Long): Long = {
      var v = v0 & 0x5555555555555555L
      v = (v | (v >>> 1)) & 0x3333333333333333L
      v = (v | (v >>> 2)) & 0x0f0f0f0f0f0f0f0fL
      v = (v | (v >>> 4)) & 0x00ff00ff00ff00ffL
      v = (v | (v >>> 8)) & 0x0000ffff0000ffffL
      v = (v | (v >>> 16)) & 0x00000000ffffffffL
      v
    }
    (collapse(z), collapse(z >>> 1))
  }

  test("interleave round-trips 32-bit dimensions") {
    samples(200).foreach { case (x, y) =>
      assert(deinterleave(ZOrderUtil.interleave(x, y)) === ((x, y)))
    }
  }

  test("z-order keeps small quadrants contiguous") {
    // both coords < 2^16 => z < 2^32; either coord crossing doubles the range
    samples(200).foreach { case (x, y) =>
      assert(ZOrderUtil.interleave(x & 0xffffL, y & 0xffffL) < (1L << 32))
    }
    assert(ZOrderUtil.interleave(1L << 16, 0L) >= (1L << 32))
    assert(ZOrderUtil.interleave(0L, 1L << 16) >= (1L << 32))
  }

  test("expression matches the static eval through SQL") {
    val spark = graft.TestSpark.spark
    GraftFunctions.register(spark)
    import spark.implicits._
    val got = Seq((3L, 5L), (0L, 0L), (0xffffffffL, 1L))
      .toDF("x", "y").selectExpr("graft_zorder(x, y) as z")
      .collect().map(_.getLong(0))
    assert(got === Array(
      ZOrderUtil.interleave(3L, 5L),
      ZOrderUtil.interleave(0L, 0L),
      ZOrderUtil.interleave(0xffffffffL, 1L)))
  }
}
