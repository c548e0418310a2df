package graft

import graft.ops._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DmlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def approx(a: Double, b: Double, tol: Double): Boolean =
    math.abs(a - b) <= tol

  // Confounded DGP: x drives both t and y; true constant effect θ = 2.
  private lazy val dgp: Seq[(Long, Double, Double, Double)] = {
    val rng = new scala.util.Random(7)
    (1L to 8000L).map { i =>
      val x = rng.nextGaussian()
      val t = 0.8 * x + rng.nextGaussian() // continuous treatment
      val y = 2.0 * t + 3.0 * x + rng.nextGaussian() * 0.5
      (i, y, t, x)
    }
  }
  private lazy val df = spark.createDataFrame(dgp).toDF("id", "y", "t", "x").repartition(5)

  test("linearDml recovers the true effect under confounding") {
    val naive = Regression.fitOls(df, $"y", Seq($"t")).summary.coefficients(0)
    assert(math.abs(naive - 2.0) > 0.3, s"naive OLS should be confounded, got $naive")
    val m = Dml.linearDml(df, $"y", $"t", Seq($"x"), cv = 3, foldKey = $"id")
    assert(approx(m.ate, 2.0, 0.05), s"dml ate ${m.ate}")
    assert(m.ateStderr > 0 && m.atePValue < 1e-6)
  }

  test("linearDml heterogeneous effect recovers theta(x) slope") {
    val rng = new scala.util.Random(11)
    val het = (1L to 8000L).map { i =>
      val x = rng.nextGaussian()
      val t = 0.5 * x + rng.nextGaussian()
      val theta = 1.0 + 0.5 * x
      val y = theta * t + 2.0 * x + rng.nextGaussian() * 0.3
      (i, y, t, x)
    }
    val hdf = spark.createDataFrame(het).toDF("id", "y", "t", "x").repartition(5)
    val m = Dml.linearDml(hdf, $"y", $"t", Seq($"x"), cv = 3, foldKey = $"id",
      heterogeneous = Seq($"x"))
    val c = m.finalStage.coefficients
    assert(approx(c(0), 1.0, 0.05), s"base effect ${c(0)}")
    assert(approx(c(1), 0.5, 0.05), s"x-interaction ${c(1)}")
    // effect column evaluates theta(x) at x = 2
    val eff = hdf.limit(1).select(Dml.effect(m, Seq(lit(2.0))).as("e")).head().getDouble(0)
    assert(approx(eff, c(0) + 2 * c(1), 1e-12))
  }

  test("dml effect/ate intervals match hand-rolled normal-equation math") {
    val rng = new scala.util.Random(11)
    val het = (1L to 8000L).map { i =>
      val x = rng.nextGaussian()
      val t = 0.5 * x + rng.nextGaussian()
      val theta = 1.0 + 0.5 * x
      val y = theta * t + 2.0 * x + rng.nextGaussian() * 0.3
      (i, y, t, x)
    }
    val hdf = spark.createDataFrame(het).toDF("id", "y", "t", "x").repartition(5)
    val m = Dml.linearDml(hdf, $"y", $"t", Seq($"x"), cv = 3, foldKey = $"id",
      heterogeneous = Seq($"x"))
    // hand-roll the final stage from the residualized frame: X = [t̃, t̃·x],
    // no intercept; σ² with the library's df = n − k − 1 convention
    val res = Dml.residualize(hdf, $"y", $"t", Seq($"x"), cv = 3, foldKey = $"id")
      .select($"__y_res".as("yr"), $"__t_res".as("tr"), $"x").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    val n = res.length
    var (a, b, dd, c1, c2, yy) = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    res.foreach { case (yr, tr, x) =>
      a += tr * tr; b += tr * tr * x; dd += tr * tr * x * x
      c1 += tr * yr; c2 += tr * x * yr; yy += yr * yr
    }
    val det = a * dd - b * b
    val (i00, i01, i11) = (dd / det, -b / det, a / det)
    val b0 = i00 * c1 + i01 * c2
    val b1 = i01 * c1 + i11 * c2
    assert(approx(b0, m.finalStage.coefficients(0), 1e-8))
    assert(approx(b1, m.finalStage.coefficients(1), 1e-8))
    val dfree = n - 2 - 1.0
    val sigma = math.sqrt(
      (yy - 2 * (b0 * c1 + b1 * c2) +
        b0 * b0 * a + 2 * b0 * b1 * b + b1 * b1 * dd) / dfree)
    val tq = graft.stats.Dist.tQuantile(0.975, dfree)
    // per-row interval at x = 0.7 (basis v = (1, 0.7))
    val x0 = 0.7
    val seX = sigma * math.sqrt(i00 + 2 * x0 * i01 + x0 * x0 * i11)
    val fitX = b0 + b1 * x0
    val got = hdf.limit(1)
      .select(Dml.effectInterval(m, Seq(lit(x0))).as("ci")).head().getStruct(0)
    assert(approx(got.getDouble(0), fitX, 1e-8))
    assert(approx(got.getDouble(1), fitX - tq * seX, 1e-7))
    assert(approx(got.getDouble(2), fitX + tq * seX, 1e-7))
    // the true effect at x0 lies inside the (tight) interval on this DGP
    assert(got.getDouble(1) < 1.0 + 0.5 * x0 && 1.0 + 0.5 * x0 < got.getDouble(2))
    // mean-point interval: basis v̄ = (1, x̄)
    val xbar = het.map(_._4).sum / n
    val seA = sigma * math.sqrt(i00 + 2 * xbar * i01 + xbar * xbar * i11)
    val fitA = b0 + b1 * xbar
    val ai = Dml.ateInterval(hdf, m, Seq($"x"))
    assert(approx(ai.ate, fitA, 1e-8))
    assert(approx(ai.stderr, seA, 1e-8))
    assert(approx(ai.lower, fitA - tq * seA, 1e-7))
    assert(approx(ai.upper, fitA + tq * seA, 1e-7))
    // with no heterogeneous features the interval reduces exactly to
    // ate ± t·stderr(0) — the summary's own first-coefficient inference
    val m0 = Dml.nonParamDml(df, $"y", $"t", Seq($"x"), cv = 3, foldKey = $"id")
    val ai0 = Dml.ateInterval(df, m0, Seq.empty)
    assert(approx(ai0.ate, m0.ate, 1e-12))
    assert(approx(ai0.stderr, m0.ateStderr, 1e-12))
    // empty frame / all-null feature: named error, not a silent x̄=0 interval
    val eNull = intercept[IllegalArgumentException] {
      Dml.ateInterval(hdf.filter(lit(false)), m, Seq($"x"))
    }
    assert(eNull.getMessage.contains("null"), eNull.getMessage)
  }

  test("quantileTestBucket: null effect has CI covering 0, shift detected") {
    val rng = new scala.util.Random(5)
    val rows = (1L to 20000L).map { i =>
      val t = (i % 2).toInt
      val v = rng.nextGaussian() + (if (t == 1) 0.5 else 0.0)
      (i, v, t)
    }
    val d = spark.createDataFrame(rows).toDF("uin", "v", "t").repartition(4)
    val r = QuantileTest.quantileTestBucket(d, $"v", $"t", $"uin", Seq(0.25, 0.5, 0.75),
      numBuckets = 16).collect()
    assert(r.length == 3)
    r.foreach { row =>
      val diff = row.getAs[Double]("diff")
      assert(approx(diff, 0.5, 0.15), s"p${row.getAs[Double]("percentile")} diff $diff")
      assert(row.getAs[Double]("lower") < diff && diff < row.getAs[Double]("upper"))
      assert(row.getAs[Double]("lower") > 0.0, "shift should be significant")
    }
  }

  test("logisticIrls matches spark.ml logistic on the same data") {
    val rng = new scala.util.Random(3)
    val rows = (1 to 6000).map { _ =>
      val x1 = rng.nextGaussian(); val x2 = rng.nextGaussian()
      val p = 1.0 / (1.0 + math.exp(-(0.7 * x1 - 1.2 * x2 + 0.3)))
      (if (rng.nextDouble() < p) 1.0 else 0.0, x1, x2)
    }
    val d = spark.createDataFrame(rows).toDF("y", "x1", "x2").repartition(4)
    val irls = MlWrappers.logisticIrls(d, $"y", Seq($"x1", $"x2"))
    val ml = MlWrappers.stochasticLogisticRegression(d, $"y", Seq($"x1", $"x2"))
    assert(irls.converged)
    irls.coefficients.zip(ml.coefficients).foreach { case (a, b) =>
      assert(approx(a, b, 1e-4), s"irls $a vs ml $b") }
    assert(approx(irls.intercept, ml.intercept, 1e-4))
    // AUC of the true-score model is well above chance and below 1
    val scored = d.withColumn("s", irls.predictProba(Seq($"x1", $"x2")))
    val a = MlWrappers.auc(scored, $"s", $"y")
    assert(a > 0.7 && a < 1.0, s"auc $a")
  }

  test("logisticIrls inference matches the GLM golden fixture") {
    // deterministic fixture; golden values from an independent numpy IRLS
    // (XtWX-solve loop): beta, se = sqrt(diag((XtWX)^-1))
    val rows = (1 to 400).map { i =>
      val x1 = (i % 10).toDouble
      val x2 = ((i * 7) % 5).toDouble
      val z = 0.6 * x1 - 0.9 * x2 - 1.0 + ((i % 7).toDouble - 3.0)
      (if (z > 0) 1.0 else 0.0, x1, x2)
    }
    val d = spark.createDataFrame(rows).toDF("y", "x1", "x2").repartition(4)
    val fit = MlWrappers.logisticIrls(d, $"y", Seq($"x1", $"x2"))
    assert(fit.converged)
    assert(approx(fit.coefficients(0), 0.41698984, 1e-4), fit.coefficients(0).toString)
    assert(approx(fit.coefficients(1), -0.60779718, 1e-4), fit.coefficients(1).toString)
    assert(approx(fit.intercept, -0.99493558, 1e-4), fit.intercept.toString)
    assert(approx(fit.stderr(0), 0.04740764, 1e-4), fit.stderr(0).toString)
    assert(approx(fit.stderr(1), 0.09537865, 1e-4), fit.stderr(1).toString)
    assert(approx(fit.interceptStderr, 0.24557332, 1e-4), fit.interceptStderr.toString)
    // z/p are derived; spot-check significance directions
    assert(fit.pValues(0) < 1e-6 && fit.pValues(1) < 1e-6)
    val rowsOut = fit.summaryRows(Seq("x1", "x2"))
    assert(rowsOut.length == 3 && rowsOut.last._1 == "(intercept)")
  }

  test("lasso shrinks a null coefficient toward zero") {
    val rng = new scala.util.Random(9)
    val rows = (1 to 4000).map { _ =>
      val x1 = rng.nextGaussian(); val x2 = rng.nextGaussian()
      (3.0 * x1 + rng.nextGaussian() * 0.5, x1, x2) // x2 irrelevant
    }
    val d = spark.createDataFrame(rows).toDF("y", "x1", "x2").repartition(4)
    val fit = MlWrappers.stochasticLinearRegression(d, $"y", Seq($"x1", $"x2"), l1 = 0.5)
    assert(math.abs(fit.coefficients(0) - 3.0) < 0.5, s"signal coef ${fit.coefficients(0)}")
    assert(math.abs(fit.coefficients(1)) < 0.02, s"null coef should shrink, got ${fit.coefficients(1)}")
    // the reference's optimizer-flavor names are accepted (all converge to
    // the same optimum via the batch path); unknown names are named errors
    val viaSgd = MlWrappers.stochasticLinearRegression(d, $"y",
      Seq($"x1", $"x2"), l1 = 0.5, method = "SGD")
    assert(viaSgd.coefficients.toSeq == fit.coefficients.toSeq)
    val bad = intercept[IllegalArgumentException] {
      MlWrappers.stochasticLinearRegression(d, $"y", Seq($"x1"), method = "Newton")
    }
    assert(bad.getMessage.contains("Nesterov"))
  }

  test("longterm recursive forecast propagates a known linear transition") {
    val rng = new scala.util.Random(13)
    // s(t+1) = 0.8*s(t) + effect; treatment adds +1 to period0 surrogate
    val rows = (1L to 6000L).map { i =>
      val t = (i % 2).toInt
      val s0 = rng.nextGaussian() + t * 1.0
      val s1 = 0.8 * s0 + rng.nextGaussian() * 0.1
      val s2 = 0.8 * s1 + rng.nextGaussian() * 0.1
      (i, t, s0, s1, s2)
    }
    val d = spark.createDataFrame(rows).toDF("id", "t", "s0", "s1", "s2").repartition(4)
    val r = Longterm.recursiveForecast(d,
      Seq(Seq($"s0"), Seq($"s1"), Seq($"s2")), $"t", horizon = 2, bootstrapB = 50)
    // observed effect decays 1.0 → 0.8 → 0.64; forecast continues → ~0.51, ~0.41
    assert(approx(r.effects(0).estimate, math.pow(0.8, 3), 0.1),
      s"h1 ${r.effects(0).estimate}")
    assert(approx(r.effects(1).estimate, math.pow(0.8, 4), 0.1),
      s"h2 ${r.effects(1).estimate}")
    assert(r.effects.forall(e => e.stderr > 0))
  }

  test("longterm bootstrap CIs carry transition-fit uncertainty") {
    val rng = new scala.util.Random(17)
    // big treatment gap (dm ≫ sampling noise) + noisy transition: the
    // interval must be dominated by the slope estimate's uncertainty,
    // which a diff-in-means-only bootstrap (transition held fixed) misses
    val rows = (1L to 3000L).map { i =>
      val t = (i % 2).toInt
      val s0 = rng.nextGaussian() + t * 5.0
      val s1 = 0.8 * s0 + rng.nextGaussian() * 1.5
      val s2 = 0.8 * s1 + rng.nextGaussian() * 1.5
      (i, t, s0, s1, s2)
    }
    val d = spark.createDataFrame(rows).toDF("id", "t", "s0", "s1", "s2").repartition(4)
    val periods = Seq(Seq($"s0"), Seq($"s1"), Seq($"s2"))
    val refit = Longterm.recursiveForecast(d, periods, $"t", horizon = 2,
      bootstrapB = 60, idCols = Seq($"id")).effects(1)
    // the old-style bootstrap: transition frozen at the point fit, only the
    // final diff-in-means resampled
    val tr = Longterm.fitTransition(d, periods)
    val fc = Longterm.step(tr, Longterm.step(tr, Seq($"s2"))).head
    val frozen = Bootstrap.ateEstimator(d.withColumn("__fc", fc), $"__fc", $"t",
      b = 60, seed = 43L)
    assert(refit.stderr > 1.5 * frozen.stderr,
      s"refit ${refit.stderr} should dominate frozen-transition ${frozen.stderr}")
    assert(refit.lower < refit.estimate && refit.estimate < refit.upper)
  }

  test("longterm multivariate transition rolls the full matrix forward") {
    val rng = new scala.util.Random(23)
    // two surrogates, diagonal transition diag(0.8, 0.5); treatment moves
    // only the outcome surrogate → h-step effect = 0.8^h · dm
    val rows = (1L to 4000L).map { i =>
      val t = (i % 2).toInt
      val a0 = rng.nextGaussian() + t * 1.0
      val b0 = rng.nextGaussian()
      val a1 = 0.8 * a0 + rng.nextGaussian() * 0.1
      val b1 = 0.5 * b0 + rng.nextGaussian() * 0.1
      val a2 = 0.8 * a1 + rng.nextGaussian() * 0.1
      val b2 = 0.5 * b1 + rng.nextGaussian() * 0.1
      (i, t, a0, b0, a1, b1, a2, b2)
    }
    val d = spark.createDataFrame(rows)
      .toDF("id", "t", "a0", "b0", "a1", "b1", "a2", "b2").repartition(4)
    val r = Longterm.recursiveForecast(d,
      Seq(Seq($"a0", $"b0"), Seq($"a1", $"b1"), Seq($"a2", $"b2")), $"t",
      horizon = 2, bootstrapB = 40, idCols = Seq($"id"))
    val want = math.pow(0.8, 2) * math.pow(0.8, 2) // dm(a2)=0.64, ×0.8² roll
    assert(approx(r.effects(1).estimate, want, 0.15), s"${r.effects(1).estimate} vs $want")
    // the driver-side matrix roll must center on the expression-path estimate
    val mid = (r.effects(1).lower + r.effects(1).upper) / 2
    assert(approx(mid, r.effects(1).estimate, 0.15), s"mid $mid vs ${r.effects(1).estimate}")
  }
}
