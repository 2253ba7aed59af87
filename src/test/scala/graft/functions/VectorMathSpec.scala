package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.util.ArrayData

/** Property tests for the codegen'd vector math — evaluated directly
  * against independent reference implementations (deterministic
  * scalacheck inputs, no session).
  */
class VectorMathSpec extends AnyFunSuite {

  private val vec = Gen.chooseNum(1, 128).flatMap(n =>
    Gen.listOfN(n, Gen.chooseNum(-1000, 1000).map(_ / 250.0f)))

  private def samples(n: Int): Seq[Array[Float]] =
    (0 until n).flatMap(i =>
      vec.apply(Gen.Parameters.default, Seed(i.toLong))).map(_.toArray)

  private def ad(a: Array[Float]): ArrayData =
    ArrayData.toArrayData(a)

  test("dotFF equals the naive sequential reference") {
    samples(50).foreach { v =>
      val dot = VectorMath.dotFF(ad(v), ad(v))
      var ref = 0.0
      v.foreach(x => ref += x.toDouble * x.toDouble)
      assert(dot === ref)
      assert(dot >= 0.0)
    }
  }

  test("dotFF is symmetric and respects the shorter length") {
    val vs = samples(40)
    vs.sliding(2, 2).foreach {
      case Seq(a, b) =>
        assert(VectorMath.dotFF(ad(a), ad(b)) === VectorMath.dotFF(ad(b), ad(a)))
        val n = math.min(a.length, b.length)
        assert(VectorMath.dotFF(ad(a), ad(b)) ===
          VectorMath.dotFF(ad(a.take(n)), ad(b.take(n))))
      case _ => ()
    }
  }

  test("sigMatch counts agreeing positions; equal arrays match fully") {
    val sig = Array(1L, 2L, 3L, 4L)
    assert(VectorMath.sigMatch(ArrayData.toArrayData(sig),
      ArrayData.toArrayData(sig)) === 4)
    assert(VectorMath.sigMatch(ArrayData.toArrayData(sig),
      ArrayData.toArrayData(Array(1L, 9L, 3L, 9L))) === 2)
    assert(VectorMath.sigMatch(ArrayData.toArrayData(sig),
      ArrayData.toArrayData(Array(9L, 9L, 9L, 9L))) === 0)
  }

  test("hyperplanes are deterministic; lshBucket matches per-plane signs") {
    val p1 = VectorMath.hyperplanes(64, 8)
    val p2 = VectorMath.hyperplanes(64, 8)
    assert(p1.map(_.toSeq).toSeq === p2.map(_.toSeq).toSeq)
    samples(30).map(_.take(64).padTo(64, 0.0f)).foreach { v =>
      val bucket = VectorMath.lshBucket(ad(v), p1)
      p1.zipWithIndex.foreach { case (plane, b) =>
        var acc = 0.0
        var i = 0
        while (i < 64) { acc += v(i).toDouble * plane(i); i += 1 }
        val bit = java.lang.Math.round(acc * 1e6) > 0L
        assert(((bucket >> b) & 1L) === (if (bit) 1L else 0L),
          s"bit $b of bucket mismatch (proj=$acc)")
      }
    }
  }
}
