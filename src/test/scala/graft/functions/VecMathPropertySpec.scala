package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the VecMath kernels against a scalar reference:
  * for ANY float vectors, the fused kernels equal the straightforward
  * left-to-right double fold bit-for-bit (the exact contract that keeps
  * the oracle queries stable), dot is symmetric only up to the fold
  * order (NOT asserted — IEEE addition isn't commutative across
  * reorderings), and normSq(a) == dot(a, a). Kernel-level (no Spark
  * session) so thousands of cases run in milliseconds. */
class VecMathPropertySpec extends AnyFunSuite {

  private val floatGen: Gen[Float] =
    Gen.chooseNum(-1e6f, 1e6f).suchThat(f => !f.isNaN)

  private val vecGen: Gen[Array[Float]] =
    Gen.chooseNum(0, 128).flatMap(n =>
      Gen.listOfN(n, floatGen).map(_.toArray))

  private def holds(p: Prop): Boolean = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(200)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    SCTest.check(params, p).passed
  }

  private def arr(a: Array[Float]): ArrayData =
    ArrayData.toArrayData(a)

  test("dot equals the left-to-right double fold bit-for-bit") {
    assert(holds(Prop.forAll(vecGen, vecGen) { (a, b) =>
      val n = math.min(a.length, b.length)
      val aa = a.take(n); val bb = b.take(n)
      val ref = aa.indices.foldLeft(0.0)((acc, i) =>
        acc + aa(i).toDouble * bb(i).toDouble)
      val got = VecMath.dot(arr(aa), arr(bb), aFloat = true, bFloat = true)
      got != null &&
        java.lang.Double.doubleToRawLongBits(got.doubleValue()) ==
          java.lang.Double.doubleToRawLongBits(ref)
    }))
  }

  test("normSq(a) == dot(a, a) and is non-negative") {
    assert(holds(Prop.forAll(vecGen) { a =>
      val d = VecMath.dot(arr(a), arr(a), aFloat = true, bFloat = true)
      val n = VecMath.normSq(arr(a), aFloat = true)
      d != null && n != null &&
        java.lang.Double.doubleToRawLongBits(d.doubleValue()) ==
          java.lang.Double.doubleToRawLongBits(n.doubleValue()) &&
        n.doubleValue() >= 0.0
    }))
  }

  test("ragged lengths return null (zip_with parity)") {
    assert(holds(Prop.forAll(vecGen, vecGen) { (a, b) =>
      (a.length == b.length) ||
        VecMath.dot(arr(a), arr(b), aFloat = true, bFloat = true) == null
    }))
  }
}
