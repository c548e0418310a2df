package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AFT parametric survival regression: the lognormal/no-censoring
  * closed-form reduction to OLS (coefficients, sigma = sqrt(RSS/n),
  * block-diagonal SEs, se(log sigma) = 1/sqrt(2n)), brute likelihood +
  * numeric-gradient pins at the fitted optimum for all three censored
  * distributions, the AFT time-scaling invariance, named errors, and
  * the codegen erf/erfc expressions against commons-math. */
class AftSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // (time, event, x): ~1/3 censored, covariate shifts the scale
  private val fix: Seq[(Double, Int, Double)] = Seq(
    (2.0, 1, 0.1), (3.5, 1, 0.4), (1.2, 0, 0.9), (5.0, 1, 1.3),
    (0.8, 1, 0.2), (7.5, 0, 1.8), (2.2, 1, 0.6), (4.1, 1, 1.1),
    (1.9, 0, 0.3), (6.3, 1, 1.6), (3.3, 1, 0.8), (2.7, 0, 0.5),
    (9.0, 1, 1.9), (1.1, 1, 0.0))

  private def brute(dist: String)(b0: Double, b1: Double,
                                  tau: Double): Double = {
    val s = math.exp(tau)
    fix.map { case (t, d, x) =>
      val z = (math.log(t) - b0 - b1 * x) / s
      dist match {
        case "weibull" =>
          if (d == 1) -tau + z - math.exp(z) else -math.exp(z)
        case "loglogistic" =>
          if (d == 1) -tau + z - 2.0 * math.log1p(math.exp(z))
          else -math.log1p(math.exp(z))
        case "lognormal" =>
          if (d == 1)
            -tau - z * z / 2.0 - math.log(math.sqrt(2.0 * math.Pi))
          else math.log(1.0 - graft.stats.Dist.normCdf(z))
      }
    }.sum
  }

  private def assertAtOptimum(dist: String): Unit = {
    val df = fix.toDF("t", "d", "x")
    val r = ops.Aft.aftFit(df, col("t"), col("d"), Seq(col("x")),
      Seq("x"), dist = dist)
    val Array(b0, b1, tau) = r.estimates
    val bl = brute(dist) _
    assert(math.abs(r.logLik - bl(b0, b1, tau)) < 1e-9,
      s"$dist ll ${r.logLik} vs brute ${bl(b0, b1, tau)}")
    val h = 1e-6
    assert(math.abs((bl(b0 + h, b1, tau) - bl(b0 - h, b1, tau)) / (2 * h)) < 1e-4,
      s"$dist grad b0")
    assert(math.abs((bl(b0, b1 + h, tau) - bl(b0, b1 - h, tau)) / (2 * h)) < 1e-4,
      s"$dist grad b1")
    assert(math.abs((bl(b0, b1, tau + h) - bl(b0, b1, tau - h)) / (2 * h)) < 1e-4,
      s"$dist grad tau")
    assert(r.n === fix.length.toLong)
    assert(r.nEvents === fix.count(_._2 == 1).toLong)
    assert(r.stderr.forall(s => s > 0 && !s.isNaN))
  }

  test("aft weibull: brute likelihood value and zero numeric gradient " +
    "at the fitted optimum") { assertAtOptimum("weibull") }

  test("aft loglogistic: brute likelihood value and zero numeric " +
    "gradient at the fitted optimum") { assertAtOptimum("loglogistic") }

  test("aft lognormal (censored, codegen erfc hazard path): brute " +
    "likelihood value and zero numeric gradient at the fitted optimum") {
    assertAtOptimum("lognormal")
  }

  test("aft lognormal with NO censoring reduces in closed form to OLS " +
    "of log t on x, sigma^2 = RSS/n, and se(log_scale) = 1/sqrt(2n)") {
    val all = fix.map { case (t, _, x) => (t, 1, x) }
    val df = all.toDF("t", "d", "x")
    val r = ops.Aft.aftFit(df, col("t"), col("d"), Seq(col("x")),
      Seq("x"), dist = "lognormal")
    val n = all.length.toDouble
    val ys = all.map(a => math.log(a._1))
    val xs = all.map(_._3)
    val xbar = xs.sum / n
    val ybar = ys.sum / n
    val sxx = xs.map(x => (x - xbar) * (x - xbar)).sum
    val sxy = xs.zip(ys).map { case (x, y) => (x - xbar) * (y - ybar) }.sum
    val b1 = sxy / sxx
    val b0 = ybar - b1 * xbar
    val rss = xs.zip(ys).map { case (x, y) =>
      val e = y - b0 - b1 * x; e * e }.sum
    val sigma = math.sqrt(rss / n)
    assert(math.abs(r.estimates(0) - b0) < 1e-8)
    assert(math.abs(r.estimates(1) - b1) < 1e-8)
    assert(math.abs(math.exp(r.estimates(2)) - sigma) < 1e-8)
    // information blocks at the optimum: cov(beta) = sigma^2 (X'X)^-1
    // (the beta-tau cross terms vanish by the normal equations) and
    // I_tautau = 2n
    val sumXX = xs.map(x => x * x).sum
    val det = n * sumXX - xs.sum * xs.sum
    assert(math.abs(r.stderr(0) - sigma * math.sqrt(sumXX / det)) < 1e-8)
    assert(math.abs(r.stderr(1) - sigma * math.sqrt(n / det)) < 1e-8)
    assert(math.abs(r.stderr(2) - 1.0 / math.sqrt(2.0 * n)) < 1e-8)
  }

  test("aft is an accelerated-TIME model: scaling t by c shifts only " +
    "the intercept, by log c") {
    val df1 = fix.toDF("t", "d", "x")
    val df2 = fix.map { case (t, d, x) => (t * 100.0, d, x) }
      .toDF("t", "d", "x")
    val r1 = ops.Aft.aftFit(df1, col("t"), col("d"), Seq(col("x")),
      Seq("x"))
    val r2 = ops.Aft.aftFit(df2, col("t"), col("d"), Seq(col("x")),
      Seq("x"))
    assert(math.abs(r2.estimates(0) - r1.estimates(0) - math.log(100.0)) < 1e-6)
    assert(math.abs(r2.estimates(1) - r1.estimates(1)) < 1e-6)
    assert(math.abs(r2.estimates(2) - r1.estimates(2)) < 1e-6)
    assert(math.abs(r2.stderr(1) - r1.stderr(1)) < 1e-6)
  }

  test("aft names its errors: unknown dist, nonpositive times, no " +
    "events, non-binary event") {
    val df = fix.toDF("t", "d", "x")
    val e1 = intercept[IllegalArgumentException] {
      ops.Aft.aftFit(df, col("t"), col("d"), Seq(col("x")), Seq("x"),
        dist = "gamma")
    }
    assert(e1.getMessage.contains("aft") &&
      e1.getMessage.contains("weibull|lognormal|loglogistic"))
    val e2 = intercept[IllegalArgumentException] {
      ops.Aft.aftFit(df.withColumn("t2", col("t") - lit(2.0)), col("t2"),
        col("d"), Seq(col("x")), Seq("x"))
    }
    assert(e2.getMessage.contains("aft") &&
      e2.getMessage.contains("time <= 0"))
    val e3 = intercept[IllegalArgumentException] {
      ops.Aft.aftFit(df, col("t"), lit(0), Seq(col("x")), Seq("x"))
    }
    assert(e3.getMessage.contains("aft") &&
      e3.getMessage.contains("no events"))
    val e4 = intercept[IllegalArgumentException] {
      ops.Aft.aftFit(df, col("t"), col("d") + lit(1), Seq(col("x")),
        Seq("x"))
    }
    assert(e4.getMessage.contains("aft") && e4.getMessage.contains("0/1"))
  }

  test("aftSurvival stored-params: closed form per distinct positive " +
    "time for all three distributions, monotone, fit == stored") {
    val df = fix.toDF("t", "d", "x")
    val params = Array(0.6, 0.8, -1.4)
    val times = fix.map(_._1).distinct.sorted
    def z(t: Double) = (math.log(t) - 0.6 - 0.8 * 1.5) / math.exp(-1.4)
    val want = Map(
      "weibull" -> ((t: Double) => math.exp(-math.exp(z(t)))),
      "lognormal" -> ((t: Double) => 1.0 - graft.stats.Dist.normCdf(z(t))),
      "loglogistic" -> ((t: Double) => 1.0 / (1.0 + math.exp(z(t)))))
    want.foreach { case (dist, f) =>
      val got = ops.Aft.aftSurvival(df, col("t"), col("d"), Seq(col("x")),
        Seq(1.5), Some(params), dist).collect()
      assert(got.length === times.length, dist)
      got.zip(times).foreach { case (r, t) =>
        assert(r.getDouble(0) === t)
        assert(math.abs(r.getAs[Double]("survival") - f(t)) < 1e-12,
          s"$dist t=$t")
        assert(math.abs(r.getAs[Double]("cum_hazard") + math.log(f(t))) < 1e-9,
          s"$dist cumhaz t=$t")
      }
      val survs = got.map(_.getAs[Double]("survival"))
      assert(survs.zip(survs.tail).forall { case (a, b) => b <= a + 1e-15 },
        s"$dist monotone")
    }
    // fit path: equals stored at the fitted estimates
    val fit = ops.Aft.aftFit(df, col("t"), col("d"), Seq(col("x")),
      Seq("x"))
    val viaFit = ops.Aft.aftSurvival(df, col("t"), col("d"),
      Seq(col("x")), Seq(1.5), None).collect()
    val viaStored = ops.Aft.aftSurvival(df, col("t"), col("d"),
      Seq(col("x")), Seq(1.5), Some(fit.estimates)).collect()
    viaFit.zip(viaStored).foreach { case (a, b) =>
      assert(math.abs(a.getAs[Double]("survival") -
        b.getAs[Double]("survival")) < 1e-12)
    }
    val e1 = intercept[IllegalArgumentException] {
      ops.Aft.aftSurvival(df, col("t"), col("d"), Seq(col("x")),
        Seq(1.5), Some(Array(0.6, -1.4)))
    }
    assert(e1.getMessage.contains("aft_survival") &&
      e1.getMessage.contains("params"))
    val e2 = intercept[IllegalArgumentException] {
      ops.Aft.aftSurvival(df, col("t"), col("d"), Seq(col("x")),
        Seq(1.5, 2.0), Some(params))
    }
    assert(e2.getMessage.contains("profile"))
  }

  test("codegen erf/erfc match commons-math over a probe range and " +
    "pass null through") {
    val probes = Seq(-8.0, -2.5, -1.0, -0.1, 0.0, 0.3, 1.0, 4.2, 9.0, 27.5)
    val got = probes.toDF("v")
      .select(graft.expr.MathExprs.erf(col("v")).as("e"),
        graft.expr.MathExprs.erfc(col("v")).as("ec"))
      .collect()
    probes.zip(got).foreach { case (v, r) =>
      assert(r.getDouble(0) ===
        org.apache.commons.math3.special.Erf.erf(v))
      assert(r.getDouble(1) ===
        org.apache.commons.math3.special.Erf.erfc(v))
    }
    val nulls = Seq[Option[Double]](None).toDF("v")
      .select(graft.expr.MathExprs.erfc(col("v"))).collect()
    assert(nulls.head.isNullAt(0))
  }
}
