package graft

import graft.expr.ExprTree
import org.scalatest.funsuite.AnyFunSuite

class ExprTreeSpec extends AnyFunSuite {

  test("parses and evaluates basic arithmetic") {
    val t = ExprTree("x1/x2+x3", 3)
    assert(math.abs(t.value(Array(6.0, 2.0, 1.5)) - 4.5) < 1e-12)
    assert(t.variableIndices.toSeq == Seq(0, 1, 2))
  }

  test("precedence and parens") {
    val t = ExprTree("(x1+x2)*x3-2/x1", 3)
    val x = Array(2.0, 3.0, 4.0)
    assert(math.abs(t.value(x) - ((2 + 3) * 4 - 2.0 / 2)) < 1e-12)
  }

  test("unary minus") {
    val t = ExprTree("-x1+(-2)*x2", 2)
    assert(math.abs(t.value(Array(3.0, 5.0)) - (-3 - 10)) < 1e-12)
  }

  test("constants only") {
    assert(math.abs(ExprTree("1.5*4", 0).value(Array.empty) - 6.0) < 1e-12)
  }

  test("repeated variable indices dedupe") {
    val t = ExprTree("x2*x2+x2", 3)
    assert(t.variableIndices.toSeq == Seq(1))
  }

  test("malformed expressions rejected") {
    assert(ExprTree.parse("x1++", Map("x1" -> 0)).isEmpty)
    assert(ExprTree.parse("x9", Map("x1" -> 0)).isEmpty)
    assert(ExprTree.parse("(x1", Map("x1" -> 0)).isEmpty)
  }

  test("symbolic gradient matches finite differences") {
    val exprs = Seq("x1/x2", "x1*x2+x3", "(x1+x2)/(x3+1)", "x1*x1/x2-x3*0.5", "x1-x2/x3")
    val rng = new scala.util.Random(42)
    for (e <- exprs; _ <- 1 to 50) {
      val t = ExprTree(e, 3)
      val x = Array.fill(3)(0.5 + 4.5 * rng.nextDouble())
      val grad = t.gradient(x, Array(0, 1, 2))
      for (i <- 0 until 3) {
        val h = 1e-6 * math.max(1.0, math.abs(x(i)))
        val xp = x.clone(); xp(i) += h
        val xm = x.clone(); xm(i) -= h
        val fd = (t.value(xp) - t.value(xm)) / (2 * h)
        assert(math.abs(grad(i) - fd) < 1e-4, s"expr=$e i=$i x=${x.toSeq}")
      }
    }
  }

  test("fromMetricExpr extracts symbols") {
    val (s, cols) = ExprTree.fromMetricExpr("avg(numerator)/avg(denominator)")
    assert(s == "x1/x2")
    assert(cols == Seq("numerator", "denominator"))
    val (s2, cols2) = ExprTree.fromMetricExpr("avg(a)/avg(b)+avg(a)")
    assert(s2 == "x1/x2+x1")
    assert(cols2 == Seq("a", "b"))
    val (s3, cols3) = ExprTree.fromMetricExpr("y")
    assert(s3 == "x1" && cols3 == Seq("y"))
  }
}
