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
    // planted 30% vs 20%: treatment wins with near certainty. The
    // success residue must be independent of the arm parity — (i/2)%10
    // cycles 0..9 uniformly WITHIN each parity class, whereas i%10
    // would be parity-locked and make both arms convert at 20%.
    val sep = (1 to 4000).map { i =>
      val t = i % 2
      (t, if ((i / 2) % 10 < (if (t == 1) 3 else 2)) 1 else 0) }.toDF("t", "s")
    val rp = Bayes.betaBinomial(sep, $"t", $"s").head()
    assert(rp.getAs[Double]("p_beats_control") > 0.999)
    assert(rp.getAs[Double]("expected_lift") > 0.3)
  }

  test("bestArm: K=2 matches the closed-form exceedance; symmetry; planted winner") {
    // K = 2 cross-validates the Simpson quadrature against betaBinomial's
    // exact lgamma sum on a real separation
    val two = (1 to 4000).map { i =>
      val t = i % 2
      (t, if ((i / 2) % 10 < (if (t == 1) 3 else 2)) 1 else 0) }.toDF("t", "s")
    val exact = Bayes.betaBinomial(two, $"t", $"s").head()
      .getAs[Double]("p_beats_control")
    val ba = Bayes.bestArm(two, $"t", $"s").collect()
      .map(r => r.getString(0) -> r.getAs[Double]("p_best")).toMap
    assert(math.abs(ba("1") - exact) < 1e-8, s"${ba("1")} vs $exact")
    assert(math.abs(ba("0") + ba("1") - 1.0) < 1e-8)
    // three identical arms: exchangeability forces p_best = 1/3 each
    val sym = (1 to 900).map(i => (i % 3, if ((i / 3) % 5 == 0) 1 else 0))
      .toDF("a", "s")
    val bs = Bayes.bestArm(sym, $"a", $"s").collect()
    bs.foreach(r => assert(math.abs(r.getAs[Double]("p_best") - 1.0 / 3) < 1e-6))
    // the best arm's expected loss is the smallest, and near zero when
    // one arm dominates
    val dom = (1 to 3000).map { i =>
      val a = i % 3
      (a, if ((i / 3) % 10 < (if (a == 2) 6 else 2)) 1 else 0) }.toDF("a", "s")
    val bd = Bayes.bestArm(dom, $"a", $"s").collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("p_best"), r.getAs[Double]("expected_loss"))).toMap
    assert(bd("2")._1 > 0.9999 && bd("2")._2 < 1e-4, bd.toString)
    assert(bd("0")._2 > 0.3 && bd("1")._2 > 0.3)
    // guards: arm explosion + bad success values
    val e1 = intercept[IllegalArgumentException] {
      Bayes.bestArm((1 to 200).map(i => (i, 1)).toDF("a", "s"), $"a", $"s",
        maxArms = 10) }
    assert(e1.getMessage.contains("maxArms"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Bayes.bestArm(Seq((0, 2), (1, 1)).toDF("a", "s"), $"a", $"s") }
    assert(e2.getMessage.contains("outside"), e2.getMessage)
    // gateway verb
    two.createOrReplaceTempView("ba_t")
    val viaSql = GraftGateway.sql(spark,
      "SELECT bayes_best_arm(t, s) FROM ba_t")
    assert(viaSql.columns.toSeq ==
      Seq("arm", "n", "s", "rate", "p_best", "expected_loss"))
    assert(viaSql.count() == 2)
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
