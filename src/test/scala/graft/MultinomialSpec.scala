package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multinomial (softmax) regression: the J = 2 reduction to binary
  * logistic, brute likelihood + zero numeric gradient at the fitted
  * optimum for J = 3, the per-class residual identity, and named
  * errors. */
class MultinomialSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 3 classes driven by a latent score with deterministic pseudo-noise
  private val fix: Seq[(Double, Double)] = (0 until 60).map { i =>
    val x = (i % 15) / 5.0
    val u = math.sin(i * 2.39996) * 1.4 + 0.9 * x
    val yy = if (u < 0.6) 1.0 else if (u < 1.9) 2.0 else 3.0
    (yy, x)
  }

  private def brute(params: Array[Double]): Double = {
    // layout: class2 (b0, b1), class3 (b0, b1); eta1 = 0
    fix.map { case (yy, x) =>
      val e2 = params(0) + params(1) * x
      val e3 = params(2) + params(3) * x
      val denom = 1.0 + math.exp(e2) + math.exp(e3)
      val eta = if (yy == 2.0) e2 else if (yy == 3.0) e3 else 0.0
      eta - math.log(denom)
    }.sum
  }

  test("multinomialLogit J=3: brute likelihood and zero numeric " +
    "gradient at the optimum; per-class residuals sum to zero") {
    val df = fix.toDF("y", "x")
    val r = ops.Multinomial.multinomialLogit(df, col("y"), Seq(col("x")),
      Seq("x"))
    assert(r.levels.toSeq === Seq(1.0, 2.0, 3.0))
    val flat = r.estimates.flatten
    assert(math.abs(r.logLik - brute(flat)) < 1e-9,
      s"ll ${r.logLik} vs brute ${brute(flat)}")
    val h = 1e-6
    flat.indices.foreach { j =>
      val up = flat.clone(); up(j) += h
      val dn = flat.clone(); dn(j) -= h
      assert(math.abs((brute(up) - brute(dn)) / (2 * h)) < 1e-4,
        s"gradient in param $j")
    }
    // intercept score equation: predicted class shares equal empirical
    val shares = Array(0.0, 0.0, 0.0)
    fix.foreach { case (_, x) =>
      val e2 = flat(0) + flat(1) * x
      val e3 = flat(2) + flat(3) * x
      val d = 1.0 + math.exp(e2) + math.exp(e3)
      shares(0) += 1.0 / d; shares(1) += math.exp(e2) / d
      shares(2) += math.exp(e3) / d
    }
    (1 to 3).foreach { cl =>
      val emp = fix.count(_._1 == cl.toDouble).toDouble
      assert(math.abs(shares(cl - 1) - emp) < 1e-6,
        s"class $cl share ${shares(cl - 1)} vs $emp")
    }
    assert(r.stderr.flatten.forall(s => s > 0 && !s.isNaN))
  }

  test("multinomialLogit with J=2 reduces exactly to binary logistic") {
    val bin = fix.map { case (yy, x) => (if (yy >= 2.0) 1.0 else 0.0, x) }
    val df = bin.toDF("y01", "x")
    val mn = ops.Multinomial.multinomialLogit(df, col("y01"),
      Seq(col("x")), Seq("x"))
    val lg = ops.MlWrappers.logisticIrls(df, col("y01"), Seq(col("x")))
    assert(math.abs(mn.estimates(0)(0) - lg.intercept) < 1e-6,
      s"intercept ${mn.estimates(0)(0)} vs ${lg.intercept}")
    assert(math.abs(mn.estimates(0)(1) - lg.coefficients(0)) < 1e-6)
    assert(math.abs(mn.stderr(0)(1) - lg.stderr(0)) < 1e-5)
  }

  test("multinomialScore: softmax probabilities match the closed form, " +
    "sum to 1, argmax class, chain with the fit, named arity error") {
    val df = fix.toDF("y", "x")
    val betas = Array(0.4, 0.9, -0.7, 1.3) // class2 (b0,b1), class3 (b0,b1)
    val got = ops.Multinomial.multinomialScore(df, Seq(col("x")), betas, 3)
      .collect()
    got.foreach { r =>
      val x = r.getAs[Double]("x")
      val e2 = 0.4 + 0.9 * x
      val e3 = -0.7 + 1.3 * x
      val d = 1.0 + math.exp(e2) + math.exp(e3)
      val want = Seq(1.0 / d, math.exp(e2) / d, math.exp(e3) / d)
      (1 to 3).foreach(j =>
        assert(math.abs(r.getAs[Double](s"prob_$j") - want(j - 1)) < 1e-12))
      assert(math.abs((1 to 3).map(j => r.getAs[Double](s"prob_$j")).sum
        - 1.0) < 1e-12)
      val argmax = want.zipWithIndex.maxBy(_._1)._2 + 1
      assert(r.getAs[Int]("pred_class") === argmax)
    }
    // chain: scoring with the fit's own estimates reproduces the share
    // identity (sum of prob_j equals the class count)
    val fit = ops.Multinomial.multinomialLogit(df, col("y"), Seq(col("x")),
      Seq("x"))
    val scored = ops.Multinomial.multinomialScore(df, Seq(col("x")),
      fit.estimates.flatten, 3)
    val sums = scored.agg(sum(col("prob_1")), sum(col("prob_2")),
      sum(col("prob_3"))).head()
    (1 to 3).foreach { cl =>
      assert(math.abs(sums.getDouble(cl - 1) -
        fix.count(_._1 == cl.toDouble)) < 1e-6)
    }
    val e1 = intercept[IllegalArgumentException] {
      ops.Multinomial.multinomialScore(df, Seq(col("x")), Array(1.0), 3)
    }
    assert(e1.getMessage.contains("multinomial_score") &&
      e1.getMessage.contains("betas"))
  }

  test("multinomial_logit gateway verb and named errors") {
    fix.toDF("y", "x").createOrReplaceTempView("mn_t")
    val got = GraftGateway.sql(spark,
      "SELECT multinomial_logit(y, x) FROM mn_t")
      .orderBy(col("class_value"), col("term")).collect()
    assert(got.length === 4) // 2 non-reference classes x 2 terms
    assert(got.map(r => (r.getDouble(0), r.getString(1))).toSeq ===
      Seq((2.0, "(intercept)"), (2.0, "x"), (3.0, "(intercept)"),
        (3.0, "x")))
    val e1 = intercept[IllegalArgumentException] {
      ops.Multinomial.multinomialLogit(fix.toDF("y", "x"), lit(1.0),
        Seq(col("x")), Seq("x"))
    }
    assert(e1.getMessage.contains("multinomial_logit") &&
      e1.getMessage.contains(">= 2 outcome levels"))
    val e2 = intercept[IllegalArgumentException] {
      ops.Multinomial.multinomialLogit(fix.toDF("y", "x"), col("y"),
        Seq(col("x")), Seq("x"), maxLevels = 2)
    }
    assert(e2.getMessage.contains("more than 2"))
  }
}
