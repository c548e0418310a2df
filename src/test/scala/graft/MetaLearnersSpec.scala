package graft

import graft.ops.MetaLearners
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MetaLearnersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  // noise-free DGP with both arms at every x: y = 1 + 2x + t·(3 + x), so
  // every learner's linear stage is correctly specified and must recover
  // τ(x) = 3 + x EXACTLY (no sampling slack hides a composition bug)
  private lazy val df = (for (x <- 1 to 50; t <- 0 to 1)
    yield (x.toDouble, t, 1.0 + 2.0 * x + t * (3.0 + x)))
    .toDF("x", "t", "y").repartition(4)

  private def effAt(c: org.apache.spark.sql.Column, x: Double): Double =
    df.filter($"x" === x).limit(1).select(c.as("e")).head().getDouble(0)

  test("s/t/x learners recover an exact linear effect") {
    val s = MetaLearners.sLearner(df, $"y", $"t", Seq($"x"))
    val t = MetaLearners.tLearner(df, $"y", $"t", Seq($"x"))
    val xm = MetaLearners.xLearner(df, $"y", $"t", Seq($"x"))
    for (x0 <- Seq(1.0, 7.0, 50.0)) {
      assert(approx(effAt(s.effectColumn(Seq($"x")), x0), 3.0 + x0, 1e-7))
      assert(approx(effAt(t.effectColumn(Seq($"x")), x0), 3.0 + x0, 1e-7))
      assert(approx(effAt(xm.effectColumn(Seq($"x")), x0), 3.0 + x0, 1e-7))
      // τ0 = τ1 here, so ANY propensity blend gives the same effect
      assert(approx(effAt(xm.effectColumn(Seq($"x"), lit(0.9)), x0), 3.0 + x0, 1e-7))
    }
    // T-learner's arms are the two conditional regressions
    assert(approx(t.m0.coefficients(0), 2.0, 1e-7) &&
      approx(t.m0.coefficients(1), 1.0, 1e-7))
    assert(approx(t.m1.coefficients(0), 3.0, 1e-7) &&
      approx(t.m1.coefficients(1), 4.0, 1e-7))
    // no-interaction S-learner degenerates to the constant average effect
    val sFlat = MetaLearners.sLearner(df, $"y", $"t", Seq($"x"), interactions = false)
    val e1 = effAt(sFlat.effectColumn(Seq($"x")), 1.0)
    val e50 = effAt(sFlat.effectColumn(Seq($"x")), 50.0)
    assert(approx(e1, e50, 1e-9), s"constant effect expected, got $e1 vs $e50")
  }

  test("transformed outcome recovers the effect under the design propensity") {
    val to = MetaLearners.transformedOutcome(df, $"y", $"t", Seq($"x"))
    for (x0 <- Seq(1.0, 7.0, 50.0))
      assert(approx(effAt(to.effectColumn(Seq($"x")), x0), 3.0 + x0, 1e-7))
  }

  test("r-learner is nonParamDml under its meta-learner name") {
    val r = MetaLearners.rLearner(df, $"y", $"t", Seq($"x"))
    val d = graft.ops.Dml.nonParamDml(df, $"y", $"t", Seq($"x"))
    assert(r.dml.ate == d.ate && r.dml.ateStderr == d.ateStderr)
    // the constant final stage is a t̃²-weighted average of τ(x) = 3 + x —
    // not the plain mean — so pin only the in-range sanity band
    assert(r.dml.ate > 4.0 && r.dml.ate < 53.0, s"ate ${r.dml.ate}")
    assert(effAt(r.effectColumn, 7.0) == r.dml.ate)
  }

  test("cvt, propensity, and retrospective estimators recover cell statistics") {
    // exact-fraction cells: per (seg, arm) 10 rows with a planted y=1 count,
    // so the saturated logistic's MLE equals the cell mean and every score
    // below is a hand-computable fraction. 50-50 arms make the CVT score
    // 2·E[1{T=Y}|seg]−1 equal the planted uplift exactly.
    val rows = for {
      seg <- 0 to 1; arm <- 0 to 1; i <- 0 until 10
    } yield {
      val k = (seg, arm) match {
        case (0, 0) => 2; case (0, 1) => 5; case (1, 0) => 4; case _ => 9
      }
      (seg.toDouble, arm, if (i < k) 1.0 else 0.0)
    }
    val d2 = rows.toDF("seg", "t", "y").repartition(3)
    val xs = Seq($"seg")
    def at(c: org.apache.spark.sql.Column, s0: Double): Double =
      d2.filter($"seg" === s0).limit(1).select(c.as("e")).head().getDouble(0)
    val cm = MetaLearners.cvt(d2, $"y", $"t", xs)
    assert(approx(at(cm.effectColumn(xs), 0.0), 0.3, 1e-6)) // 5/10 − 2/10
    assert(approx(at(cm.effectColumn(xs), 1.0), 0.5, 1e-6)) // 9/10 − 4/10
    val ps = MetaLearners.propensity(d2, $"t")
    val v = d2.select($"t", ps.propensityColumn($"t").as("p")).distinct()
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(approx(v(1), 0.5) && approx(v(0), 0.5))
    val pm = MetaLearners.propensity(d2, $"t", xs)
    assert(approx(at(pm.propensityColumn($"t", xs), 0.0), 0.5, 1e-6))
    val rm = MetaLearners.retrospective(d2, $"y", $"t", xs)
    assert(approx(at(rm.scoreColumn(xs), 0.0), 5.0 / 7, 1e-6))
    assert(approx(at(rm.scoreColumn(xs), 1.0), 9.0 / 13, 1e-6))
  }
}
