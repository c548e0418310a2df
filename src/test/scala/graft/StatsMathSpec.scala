package graft

import graft.expr.ExprTree
import graft.stats._
import org.scalatest.funsuite.AnyFunSuite

class StatsMathSpec extends AnyFunSuite {
  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("DeltaStats means/cov match naive computation") {
    val rng = new scala.util.Random(7)
    val data = Array.fill(500)(Array.fill(3)(rng.nextGaussian() + 2.0))
    val s = DeltaStats.zero(3)
    data.foreach(s.update)
    val n = data.length
    val m = Array.tabulate(3)(j => data.map(_(j)).sum / n)
    assert((0 until 3).forall(j => approx(s.means(j), m(j))))
    val cov = s.covMatrix
    for (i <- 0 until 3; j <- 0 until 3) {
      val naive = data.map(r => (r(i) - m(i)) * (r(j) - m(j))).sum / (n - 1)
      assert(approx(cov(i)(j), naive, 1e-8), s"cov($i)($j)")
    }
  }

  test("DeltaStats merge associativity: split == whole") {
    val rng = new scala.util.Random(11)
    val data = Array.fill(999)(Array.fill(2)(rng.nextDouble() * 10))
    val whole = DeltaStats.zero(2)
    data.foreach(whole.update)
    // random 3-way split, merged in arbitrary order
    val parts = Array.fill(3)(DeltaStats.zero(2))
    data.foreach(r => parts(rng.nextInt(3)).update(r))
    val merged = parts(2).merge(parts(0)).merge(parts(1))
    assert(merged.count == whole.count)
    (0 until 2).foreach(i => assert(approx(merged.means(i), whole.means(i))))
    val (c1, c2) = (merged.covMatrix, whole.covMatrix)
    for (i <- 0 until 2; j <- 0 until 2) assert(approx(c1(i)(j), c2(i)(j), 1e-8))
  }

  test("delta method variance of plain mean equals var/n") {
    val rng = new scala.util.Random(13)
    val xs = Array.fill(1000)(rng.nextGaussian() * 3 + 1)
    val s = DeltaStats.zero(1)
    xs.foreach(x => s.update(Array(x)))
    val tree = ExprTree("x1", 1)
    val got = DeltaStats.calcDeltaMethod(tree, s.count, s.means, s.covMatrix, isStd = false)
    val mean = xs.sum / xs.length
    val varSamp = xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1)
    assert(approx(got, varSamp / xs.length, 1e-8))
  }

  test("delta method variance of ratio matches closed form") {
    // var(f(x̄,ȳ)) ≈ (1/n) [ fx² σxx + 2 fx fy σxy + fy² σyy ], f = x/y
    val rng = new scala.util.Random(17)
    val data = Array.fill(2000)(Array(rng.nextDouble() + 5, rng.nextDouble() + 2))
    val s = DeltaStats.zero(2)
    data.foreach(s.update)
    val tree = ExprTree("x1/x2", 2)
    val got = DeltaStats.calcDeltaMethod(tree, s.count, s.means, s.covMatrix, isStd = false)
    val m = s.means; val cov = s.covMatrix; val n = s.count
    val fx = 1.0 / m(1)
    val fy = -m(0) / (m(1) * m(1))
    val expect = (fx * fx * cov(0)(0) + 2 * fx * fy * cov(0)(1) + fy * fy * cov(1)(1)) / n
    assert(approx(got, expect, 1e-10))
  }

  test("LinAlg invert round-trips and flags collinearity") {
    val a = Array(Array(4.0, 2.0), Array(2.0, 3.0))
    val inv = LinAlg.invert(a)
    val id = LinAlg.matMul(a, inv)
    assert(approx(id(0)(0), 1.0) && approx(id(1)(1), 1.0) &&
      math.abs(id(0)(1)) < 1e-9 && math.abs(id(1)(0)) < 1e-9)
    // collinear: second row is 2x first
    val b = Array(Array(1.0, 2.0), Array(2.0, 4.0))
    val (_, dropped) = LinAlg.invertWithDropped(b)
    assert(dropped.nonEmpty)
  }

  test("pValue and CI behave at reference conventions") {
    import TtestCommon._
    assert(approx(pValue(1.959963985, TwoSided), 0.05, 1e-6))
    assert(approx(pValue(0.0, Less), 0.5))
    assert(pValue(Double.PositiveInfinity, TwoSided) == 0.0)
    val (lo, hi) = confidenceInterval(1.0, 0.5, 10000, 0.05, TwoSided)
    // ~ t-quantile .975 with df 9999 ≈ 1.9602
    assert(lo < 1.0 && hi > 1.0 && approx(hi - lo, 2 * 1.960201 * 0.5, 1e-4))
    val (lo2, hi2) = confidenceInterval(1.0, 0.5, 100, 0.05, Less)
    assert(lo2.isNegInfinity && hi2 > 1.0)
  }

  test("CUPED reduces variance on correlated covariate") {
    // y = x + noise; covariate x_pre highly correlated with y
    val rng = new scala.util.Random(23)
    val s = DeltaStats.zero(2)
    for (_ <- 1 to 5000) {
      val pre = rng.nextGaussian()
      val y = 2.0 * pre + 0.1 * rng.nextGaussian() + 3.0
      s.update(Array(y, pre))
    }
    val (mean, varAdj) = TtestCommon.cupedMeanAndVar1Samp("x1", "x2", 2, s.count, s.means, s.covMatrix)
    val varRaw = DeltaStats.calcDeltaMethod(ExprTree("x1", 2), s.count, s.means, s.covMatrix, isStd = false)
    assert(varAdj < varRaw * 0.05, s"CUPED should slash variance: $varAdj vs $varRaw")
    assert(approx(mean, s.means(0)))
  }

  test("power analysis: textbook value and mde inverts sampleSizePerArm") {
    import graft.ops.SimpleTests
    // sigma=1, delta=0.5, alpha=.05, power=.8 -> n ~= 2*(2.8016*2)^2 ~= 62.79
    val n = SimpleTests.sampleSizePerArm(1.0, 0.5)
    assert(math.abs(n - 62.79) < 0.02, s"n $n")
    assert(approx(SimpleTests.mde(1.0, n), 0.5))
    // scale invariance: doubling sigma quadruples n
    assert(approx(SimpleTests.sampleSizePerArm(2.0, 0.5), 4 * n))
    intercept[IllegalArgumentException] {
      SimpleTests.sampleSizePerArm(1.0, 0.0)
    }
  }
}
