package graft

import graft.ops.Regression
import org.apache.commons.math3.stat.regression.OLSMultipleLinearRegression
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OlsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val rows: Seq[(Double, Double, Double, Double)] = {
    val rng = new scala.util.Random(7)
    (1 to 3000).map { _ =>
      val x1 = rng.nextGaussian() * 2
      val x2 = rng.nextDouble() * 5
      val w = 0.5 + rng.nextDouble()
      val y = 1.5 + 2.0 * x1 - 3.0 * x2 + rng.nextGaussian() * 0.7
      (y, x1, x2, w)
    }
  }
  private lazy val df = spark.createDataFrame(rows).toDF("y", "x1", "x2", "w").repartition(4)

  private def approx(a: Double, b: Double, tol: Double): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("ols matches commons-math3 OLSMultipleLinearRegression") {
    val got = df.select(functions.ols($"y", Seq($"x1", $"x2")).as("m")).select("m.*").head()
    val cm = new OLSMultipleLinearRegression()
    cm.newSampleData(rows.map(_._1).toArray, rows.map(r => Array(r._2, r._3)).toArray)
    val beta = cm.estimateRegressionParameters()       // intercept FIRST
    val se = cm.estimateRegressionParametersStandardErrors()
    val coef = got.getSeq[Double](got.fieldIndex("coefficients"))
    val stderr = got.getSeq[Double](got.fieldIndex("stderr"))
    // ours: x1, x2, intercept (bias LAST)
    assert(approx(coef(0), beta(1), 1e-8), s"${coef(0)} vs ${beta(1)}")
    assert(approx(coef(1), beta(2), 1e-8))
    assert(approx(coef(2), beta(0), 1e-8))
    assert(approx(stderr(0), se(1), 1e-6))
    assert(approx(stderr(1), se(2), 1e-6))
    assert(approx(stderr(2), se(0), 1e-6))
    assert(approx(got.getAs[Double]("r2"), cm.calculateRSquared(), 1e-8))
    assert(approx(got.getAs[Double]("adj_r2"), cm.calculateAdjustedRSquared(), 1e-8))
    assert(approx(got.getAs[Double]("residual_stderr"),
      math.sqrt(cm.estimateErrorVariance()), 1e-8))
    assert(got.getAs[Long]("n") == rows.length)
    // strong signal: p-values ~ 0 for real effects
    val p = got.getSeq[Double](got.fieldIndex("p_values"))
    assert(p(0) < 1e-10 && p(1) < 1e-10)
  }

  test("ols without bias") {
    val got = df.select(functions.ols($"y", Seq($"x1"), useBias = false).as("m"))
      .select("m.*").head()
    // closed form: beta = Σxy/Σx²
    val sxy = rows.map(r => r._1 * r._2).sum
    val sxx = rows.map(r => r._2 * r._2).sum
    assert(approx(got.getSeq[Double](got.fieldIndex("coefficients"))(0), sxy / sxx, 1e-9))
  }

  test("wls downweights: recovers weighted closed form for single regressor") {
    val got = df.select(functions.wls($"y", Seq($"x1"), $"w", useBias = false).as("m"))
      .select("m.*").head()
    val swxy = rows.map(r => r._4 * r._1 * r._2).sum
    val swxx = rows.map(r => r._4 * r._2 * r._2).sum
    assert(approx(got.getSeq[Double](got.fieldIndex("coefficients"))(0), swxy / swxx, 1e-9))
  }

  test("fitOls + predict reproduces fitted values; intervals bracket fit") {
    val model = Regression.fitOls(df, $"y", Seq($"x1", $"x2"))
    assert(approx(model.coefficients(0), 2.0, 0.05))
    assert(approx(model.coefficients(1), -3.0, 0.05))
    assert(approx(model.intercept, 1.5, 0.1))
    val scored = df.withColumn("pred", Regression.predict(model, Seq($"x1", $"x2")))
      .withColumn("iv", Regression.predictInterval(model, Seq($"x1", $"x2"), "prediction"))
    val r = scored.select($"pred", $"iv.fit", $"iv.lower", $"iv.upper", $"y").head()
    assert(approx(r.getDouble(0), r.getDouble(1), 1e-12))
    assert(r.getDouble(2) < r.getDouble(0) && r.getDouble(0) < r.getDouble(3))
    // residuals should be small on average
    val mae = scored.select(avg(abs($"pred" - $"y"))).head().getDouble(0)
    assert(mae < 1.0)
  }

  test("conformal interval: q is the k-th calibration residual, coverage holds") {
    val rng = new scala.util.Random(17)
    val rows = (1 to 4000).map { i =>
      val x = rng.nextGaussian()
      (i.toLong, x, 2.0 * x + 1.0 + rng.nextGaussian() * 0.5)
    }
    val d = spark.createDataFrame(rows).toDF("id", "x", "y")
    val (m, q, nCal) = Regression.conformalOls(d, $"y", Seq($"x"),
      $"id" % 2 === 0, alpha = 0.1)
    assert(nCal == 2000L)
    // q must equal the k-th smallest |residual| computed locally
    val coefs = (m.coefficients(0), m.intercept)
    val resid = rows.filter(_._1 % 2 == 0)
      .map { case (_, x, y) => math.abs(y - (coefs._1 * x + coefs._2)) }.sorted
    val k = math.ceil(0.9 * (nCal + 1)).toInt
    assert(math.abs(q - resid(k - 1)) < 1e-9, s"$q vs ${resid(k - 1)}")
    // held-out-ish coverage near 90% (iid fixture)
    val band = Regression.conformalBand(m, Seq($"x"), q)
    val cov = d.select(($"y" >= band.getField("lower") &&
        $"y" <= band.getField("upper")).cast("double").as("c"))
      .agg(org.apache.spark.sql.functions.avg($"c")).head().getDouble(0)
    assert(cov > 0.85 && cov < 0.95, s"coverage $cov")
    intercept[IllegalArgumentException] {
      Regression.conformalOls(d, $"y", Seq($"x"), lit(false))
    }
  }

  test("kthSmallest is exact for every rank, tie blocks included") {
    val rng = new scala.util.Random(29)
    // heavy tie blocks at both ends plus a smooth middle — exercises the
    // vLo/vHi tie-block early returns and the in-bracket take-ordered path
    val xs = rng.shuffle(Seq.fill(100)(5.0) ++ (1 to 50).map(_ + 100.0) ++
      Seq.fill(80)(999.0))
    val d = xs.map(Tuple1(_)).toDF("x")
    val sorted = xs.sorted
    val n = xs.length.toLong
    Seq(1L, 50L, 100L, 101L, 120L, 151L, 200L, n).foreach { k =>
      val got = Regression.kthSmallest(d, $"x", k, n)
      assert(got == sorted((k - 1).toInt), s"rank $k: $got vs ${sorted((k - 1).toInt)}")
    }
    // nulls don't participate in the rank
    val withNull = (xs.map(v => Tuple1(java.lang.Double.valueOf(v))) :+
      Tuple1(null.asInstanceOf[java.lang.Double])).toDF("x")
    assert(Regression.kthSmallest(withNull, $"x", n, n) == sorted.last)
    intercept[IllegalArgumentException] {
      Regression.kthSmallest(d, $"x", n + 1, n)
    }
  }

  test("clusterRobustOls: duplicated clusters inflate SEs back to the true n") {
    val rng = new scala.util.Random(41)
    val basePts = (1 to 500).map { i =>
      val x = rng.nextGaussian()
      (i.toLong, x, 2.0 * x + 1.0 + rng.nextGaussian())
    }
    val base = spark.createDataFrame(basePts).toDF("g", "x", "y")
    // each row duplicated 8x within its cluster: zero new information
    val dup = spark.createDataFrame(
      basePts.flatMap(r => Seq.fill(8)(r))).toDF("g", "x", "y")
    val iidBase = Regression.fitOls(base, $"y", Seq($"x"))
      .summary.stderr.head
    val iidDup = Regression.fitOls(dup, $"y", Seq($"x")).summary.stderr.head
    val cr = Regression.clusterRobustOls(dup, $"y", Seq($"x"), $"g")
    assert(cr.nClusters == 500)
    // same point estimate as the fit
    assert(cr.model.summary.coefficients.head == Regression.fitOls(dup,
      $"y", Seq($"x")).summary.coefficients.head)
    // the naive iid SE on duplicated rows is ~sqrt(8) too small; the
    // cluster SE must recover the true-information scale
    assert(iidDup < iidBase / 2, s"fixture broken: $iidDup vs $iidBase")
    assert(cr.se.head > 2.0 * iidDup, s"cluster se ${cr.se.head} vs iid $iidDup")
    assert(math.abs(cr.se.head - iidBase) / iidBase < 0.25,
      s"cluster se ${cr.se.head} should approximate the deduped iid $iidBase")
    // one cluster only -> named error
    intercept[IllegalArgumentException] {
      Regression.clusterRobustOls(base, $"y", Seq($"x"), lit(1))
    }
  }

  test("did recovers interaction effect") {
    val rng = new scala.util.Random(3)
    val didRows = (1 to 4000).map { _ =>
      val t = rng.nextInt(2).toDouble
      val time = rng.nextInt(2).toDouble
      val y = 1.0 + 0.5 * t + 0.8 * time + 2.5 * t * time + rng.nextGaussian() * 0.5
      (y, t, time)
    }
    val d = spark.createDataFrame(didRows).toDF("y", "t", "time")
    val m = Regression.did(d, $"y", $"t", $"time")
    // coefficients: t, time, t*time, intercept
    assert(approx(m.coefficients(2), 2.5, 0.1))
  }

  test("iv regression recovers causal effect under confounding") {
    val rng = new scala.util.Random(5)
    val ivRows = (1 to 8000).map { _ =>
      val z = rng.nextInt(2).toDouble             // instrument
      val u = rng.nextGaussian()                  // confounder
      val t = 0.7 * z + 0.5 * u + rng.nextGaussian() * 0.3
      val y = 2.0 * t + 1.5 * u + rng.nextGaussian() * 0.3
      (y, t, z)
    }
    val d = spark.createDataFrame(ivRows).toDF("y", "t", "z")
    val naive = Regression.fitOls(d, $"y", Seq($"t")).coefficients(0)
    val iv = Regression.ivRegression(d, $"y", $"t", $"z").coefficients(0)
    assert(math.abs(iv - 2.0) < 0.15, s"iv=$iv")
    assert(math.abs(naive - 2.0) > 0.3, s"naive should be biased: $naive")
    // formula form parses to the identical fit
    val viaFormula = Regression.ivRegressionFormula(d, "y ~ (t ~ z)").coefficients(0)
    assert(viaFormula == iv, s"$viaFormula vs $iv")
    val withX = d.withColumn("x1", $"z" * 0.5)
    assert(Regression.ivRegressionFormula(withX, "y ~ (t ~ z) + x1")
      .coefficients.length == 3) // t_hat, x1, intercept
    intercept[IllegalArgumentException] {
      Regression.ivRegressionFormula(d, "nonsense")
    }
    ()
  }
}
