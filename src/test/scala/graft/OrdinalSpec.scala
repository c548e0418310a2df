package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proportional-odds ordinal regression: the J = 2 reduction to binary
  * logistic (beta identical, cut_1 = -intercept), brute likelihood +
  * zero numeric gradient at the fitted optimum for J = 4, the polr
  * sign convention, threshold ordering, and named errors. */
class OrdinalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // latent u = 1.2*x + deterministic pseudo-noise, cut into 4 levels
  private val fix: Seq[(Double, Double)] = (0 until 48).map { i =>
    val x = (i % 12) / 4.0
    val noise = math.sin(i * 2.39996) * 1.2 // deterministic, mixes well
    val u = 1.2 * x + noise
    val yy = if (u < 0.5) 1.0 else if (u < 1.6) 2.0
             else if (u < 2.8) 3.0 else 4.0
    (yy, x)
  }

  private def brute(levels: Array[Double])(params: Array[Double]): Double = {
    val nTh = levels.length - 1
    def sig(v: Double) = 1.0 / (1.0 + math.exp(-v))
    fix.map { case (yy, x) =>
      val c = levels.indexOf(yy) + 1
      val eta = params(nTh) * x
      val fa = if (c == levels.length) 1.0 else sig(params(c - 1) - eta)
      val fb = if (c == 1) 0.0 else sig(params(c - 2) - eta)
      math.log(fa - fb)
    }.sum
  }

  test("ordinalLogit J=4: brute likelihood and zero numeric gradient " +
    "at the optimum; thresholds ascend; positive beta under the polr " +
    "sign convention") {
    val df = fix.toDF("y", "x")
    val r = ops.Ordinal.ordinalLogit(df, col("y"), Seq(col("x")), Seq("x"))
    assert(r.levels.toSeq === Seq(1.0, 2.0, 3.0, 4.0))
    val bl = brute(r.levels) _
    assert(math.abs(r.logLik - bl(r.estimates)) < 1e-9,
      s"ll ${r.logLik} vs brute ${bl(r.estimates)}")
    val h = 1e-6
    r.estimates.indices.foreach { j =>
      val up = r.estimates.clone(); up(j) += h
      val dn = r.estimates.clone(); dn(j) -= h
      assert(math.abs((bl(up) - bl(dn)) / (2 * h)) < 1e-4,
        s"gradient in param $j")
    }
    val cuts = r.estimates.take(3)
    assert(cuts.zip(cuts.tail).forall { case (a, b) => a < b },
      s"thresholds not ascending: ${cuts.mkString(",")}")
    // higher x pushes to higher categories => positive beta
    assert(r.estimates(3) > 0.5, s"beta ${r.estimates(3)}")
    assert(r.terms.toSeq === Seq("cut_1", "cut_2", "cut_3", "x"))
    assert(r.stderr.forall(s => s > 0 && !s.isNaN))
    assert(r.n === 48L)
  }

  test("ordinalLogit with J=2 reduces exactly to binary logistic: " +
    "same beta, cut_1 = -intercept") {
    val bin = fix.map { case (yy, x) => (if (yy >= 3.0) 1.0 else 0.0, x) }
    val df = bin.toDF("y01", "x")
    val ord = ops.Ordinal.ordinalLogit(df, col("y01"), Seq(col("x")),
      Seq("x"))
    val lg = ops.MlWrappers.logisticIrls(df, col("y01"), Seq(col("x")))
    assert(math.abs(ord.estimates(1) - lg.coefficients(0)) < 1e-6,
      s"beta ${ord.estimates(1)} vs ${lg.coefficients(0)}")
    assert(math.abs(ord.estimates(0) + lg.intercept) < 1e-6,
      s"cut ${ord.estimates(0)} vs -intercept ${-lg.intercept}")
    assert(math.abs(ord.stderr(1) - lg.stderr(0)) < 1e-5)
  }

  test("ordinalLogit names its errors: single level, too many levels, " +
    "too few rows") {
    val df = fix.toDF("y", "x")
    val e1 = intercept[IllegalArgumentException] {
      ops.Ordinal.ordinalLogit(df, lit(1.0), Seq(col("x")), Seq("x"))
    }
    assert(e1.getMessage.contains("ordinal_logit") &&
      e1.getMessage.contains(">= 2 outcome levels"))
    val e2 = intercept[IllegalArgumentException] {
      ops.Ordinal.ordinalLogit(df, col("y"), Seq(col("x")), Seq("x"),
        maxLevels = 3)
    }
    assert(e2.getMessage.contains("more than 3"))
  }

  test("ordinalScore: probabilities match the sigmoid closed form, sum " +
    "to 1, argmax class; named errors for bad thresholds and arity") {
    val df = fix.toDF("y", "x")
    val thetas = Array(-0.5, 0.8, 2.1)
    val betas = Array(1.1)
    val got = ops.Ordinal.ordinalScore(df, Seq(col("x")), thetas, betas)
      .collect()
    def sig(v: Double) = 1.0 / (1.0 + math.exp(-v))
    got.foreach { r =>
      val x = r.getAs[Double]("x")
      val eta = 1.1 * x
      val cum = thetas.map(t => sig(t - eta))
      val want = (0 to 3).map { j =>
        val hi = if (j == 3) 1.0 else cum(j)
        val lo = if (j == 0) 0.0 else cum(j - 1)
        hi - lo
      }
      (1 to 4).foreach { j =>
        assert(math.abs(r.getAs[Double](s"prob_$j") - want(j - 1)) < 1e-12)
      }
      assert(math.abs((1 to 4).map(j => r.getAs[Double](s"prob_$j")).sum
        - 1.0) < 1e-12)
      val argmax = want.zipWithIndex.maxBy(_._1)._2 + 1
      assert(r.getAs[Int]("pred_class") === argmax, s"x=$x")
    }
    val e1 = intercept[IllegalArgumentException] {
      ops.Ordinal.ordinalScore(df, Seq(col("x")), Array(1.0, 0.5),
        Array(1.0))
    }
    assert(e1.getMessage.contains("ordinal_score") &&
      e1.getMessage.contains("ascend"))
    val e2 = intercept[IllegalArgumentException] {
      ops.Ordinal.ordinalScore(df, Seq(col("x")), Array(0.5),
        Array(1.0, 2.0))
    }
    assert(e2.getMessage.contains("betas"))
  }

  test("ordinal_logit gateway verb emits one row per threshold and " +
    "covariate") {
    fix.toDF("y", "x").createOrReplaceTempView("ord_t")
    val got = GraftGateway.sql(spark,
      "SELECT ordinal_logit(y, x) FROM ord_t").orderBy(col("term")).collect()
    assert(got.length === 4)
    assert(got.map(_.getString(0)).toSeq ===
      Seq("cut_1", "cut_2", "cut_3", "x"))
    assert(got.forall(_.getAs[Long]("n_levels") == 4L))
  }
}
