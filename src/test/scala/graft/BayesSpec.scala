package graft

import graft.ops.Bayes
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BayesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("betaBinomial: hand-computed exceedance, symmetry, separation") {
    // n0=1 s0=0, n1=1 s1=1 with uniform priors: A ~ Beta(1,2), B ~
    // Beta(2,1), P(B > A) = 5/6 exactly (double integral by hand)
    val tiny = Seq((0, 0), (1, 1)).toDF("t", "s")
    val r = Bayes.betaBinomial(tiny, $"t", $"s").head()
    assert(math.abs(r.getAs[Double]("p_beats_control") - 5.0 / 6.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("rate0") - 1.0 / 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("rate1") - 2.0 / 3.0) < 1e-12)
    // identical arms: exceedance is exactly 1/2 by symmetry
    val sym = (1 to 400).map(i => (i % 2, if (i % 5 == 0) 1 else 0))
      .toDF("t", "s")
    val rs = Bayes.betaBinomial(sym, $"t", $"s").head()
    assert(math.abs(rs.getAs[Double]("p_beats_control") - 0.5) < 1e-9)
    // planted 30% vs 20%: treatment wins with near certainty
    val sep = (1 to 4000).map { i =>
      val t = i % 2
      (t, if (i % 10 < (if (t == 1) 3 else 2)) 1 else 0) }.toDF("t", "s")
    val rp = Bayes.betaBinomial(sep, $"t", $"s").head()
    assert(rp.getAs[Double]("p_beats_control") > 0.999)
    assert(rp.getAs[Double]("expected_lift") > 0.3)
  }

  test("betaBinomial guards: bad success values, empty arm, prior shape") {
    val bad = Seq((0, 2), (1, 1)).toDF("t", "s")
    val e1 = intercept[IllegalArgumentException] {
      Bayes.betaBinomial(bad, $"t", $"s") }
    assert(e1.getMessage.contains("outside"))
    val oneArm = Seq((1, 1), (1, 0)).toDF("t", "s")
    val e2 = intercept[IllegalArgumentException] {
      Bayes.betaBinomial(oneArm, $"t", $"s") }
    assert(e2.getMessage.contains("arms"))
    val ok = Seq((0, 0), (1, 1)).toDF("t", "s")
    val e3 = intercept[IllegalArgumentException] {
      Bayes.betaBinomial(ok, $"t", $"s", priorAlpha = 1.5) }
    assert(e3.getMessage.contains("integer"))
  }
}
