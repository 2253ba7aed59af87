package graft.functions

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData

/** Property-style tests for the single-pass hash expressions —
  * evaluated directly (expression eval), no session needed. Inputs are
  * scalacheck-generated with fixed seeds (deterministic).
  */
class TextHashSpec extends AnyFunSuite {

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.chooseNum(1, 40)
    .flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))

  private def samples(g: Gen[String], n: Int): Seq[String] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private def minhash(s: String, n: Int = 3, k: Int = 16): Seq[Long] =
    MinHashSig(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s)), n, k)
      .eval(null).asInstanceOf[ArrayData].toLongArray().toSeq

  private def simhash(s: String): Long =
    SimHash64(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
      .eval(null).asInstanceOf[Long]

  test("minhash is deterministic and k-wide") {
    samples(text, 50).foreach { s =>
      val a = minhash(s)
      assert(a === minhash(s))
      assert(a.length === 16)
    }
  }

  test("appending a copy of the doc only lowers signature mins (supset of grams)") {
    samples(text, 50).filter(_.split(' ').length >= 3).foreach { s =>
      val a = minhash(s)
      val b = minhash(s + " " + s)
      assert(a.zip(b).forall { case (x, y) => y <= x })
    }
  }

  test("permuting words changes minhash generically") {
    val s = "alpha beta gamma delta epsilon zeta eta theta"
    val rev = s.split(' ').reverse.mkString(" ")
    assert(minhash(s) !== minhash(rev))
  }

  test("simhash deterministic") {
    samples(text, 50).foreach(s => assert(simhash(s) === simhash(s)))
  }

  test("simhash hamming small for small edits, large for disjoint vocab") {
    val base = (1 to 50).map(i => s"word$i").mkString(" ")
    val edited = base.replace("word25", "word25x")
    val disjoint = (1 to 50).map(i => s"other$i").mkString(" ")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val he = ham(simhash(base), simhash(edited))
    val hd = ham(simhash(base), simhash(disjoint))
    assert(he < hd)
    assert(he <= 15)
    assert(hd >= 15)
  }

  test("signatures stay below the modulus (ANSI-safe, SQL-expressible)") {
    samples(text, 50).foreach { s =>
      assert(minhash(s).forall(v => v >= 0 && v <= TextHash.P))
      val sh = simhash(s)
      assert(sh >= 0 && sh < (1L << TextHash.SimBits))
    }
  }

  test("short docs (< n words) signature to the EmptySig sentinel") {
    assert(minhash("one two").forall(_ == TextHash.EmptySig))
  }
}
