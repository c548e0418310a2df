package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types._

/** Bayesian A/B readout for conversion metrics — the beta-binomial
  * posterior report product teams consume next to the frequentist t/z
  * tests: P(treatment beats control) and posterior rate summaries,
  * exactly (no Monte Carlo). Beyond the reference, whose inference tier
  * is entirely frequentist.
  *
  * With Beta(α₀, β₀) priors and arm counts (s, n−s), the posteriors are
  * Beta(α₀+s, β₀+n−s) and, for INTEGER α_B (integer prior + integer
  * successes), the exceedance probability has the closed form
  *
  *   P(p_B > p_A) = Σ_{i=0}^{α_B−1} B(α_A+i, β_A+β_B)
  *                  / [(β_B+i) · B(1+i, β_B) · B(α_A, β_A)]
  *
  * (the standard beta-binomial identity; evaluated in log space with
  * lgamma so 10⁶-success arms don't overflow). The α_B-term sum is driver
  * work bounded by `maxTerms` with a named error.
  *
  * 100 TB shape: ONE row-scale aggregate to 4 arm counts; everything else
  * is a handful of lgamma calls on the driver. Rows with success values
  * outside {0, 1} fail fast in the same pass.
  *
  * Returns one row: (n0, s0, n1, s1, rate0, rate1, p_beats_control,
  * expected_lift) — rates are posterior means, expected_lift their ratio
  * minus 1. */
object Bayes {

  def betaBinomial(df: DataFrame, t: Column, success: Column,
                   priorAlpha: Double = 1.0, priorBeta: Double = 1.0,
                   maxTerms: Long = 5000000L): DataFrame = {
    require(priorAlpha > 0 && priorBeta > 0,
      "bayes_ab: priors must be positive")
    require(priorAlpha == math.rint(priorAlpha),
      s"bayes_ab: the closed-form exceedance needs an integer prior " +
        s"alpha, got $priorAlpha")
    require(maxTerms > 0, "bayes_ab: maxTerms must be positive")
    val s = success.cast("long")
    val r = df.filter(t.isNotNull && s.isNotNull)
      .agg(
        sum(when(t === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(t === 0 && s === 1, 1L).otherwise(0L)).as("s0"),
        sum(when(t === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(t === 1 && s === 1, 1L).otherwise(0L)).as("s1"),
        sum(when(s =!= 0 && s =!= 1, 1L).otherwise(0L)).as("bad"))
      .head()
    require(r.getLong(4) == 0,
      s"bayes_ab: ${r.getLong(4)} rows have success outside {0, 1}")
    val n0 = r.getLong(0); val s0 = r.getLong(1)
    val n1 = r.getLong(2); val s1 = r.getLong(3)
    require(n0 > 0 && n1 > 0, "bayes_ab: both arms need rows")
    val aA = priorAlpha + s0; val bA = priorBeta + (n0 - s0)
    val aB = priorAlpha + s1; val bB = priorBeta + (n1 - s1)
    val nTerms = aB.toLong
    require(nTerms <= maxTerms,
      s"bayes_ab: the exceedance sum has $nTerms terms " +
        s"(> maxTerms=$maxTerms) — raise maxTerms if intended")
    import org.apache.commons.math3.special.Gamma.logGamma
    def lbeta(x: Double, y: Double): Double =
      logGamma(x) + logGamma(y) - logGamma(x + y)
    val lbAB = lbeta(aA, bA)
    var p = 0.0
    var i = 0L
    while (i < nTerms) {
      p += math.exp(lbeta(aA + i, bA + bB) - math.log(bB + i) -
        lbeta(1.0 + i, bB) - lbAB)
      i += 1
    }
    val m0 = aA / (aA + bA); val m1 = aB / (aB + bB)
    val out = Row(n0, s0, n1, s1, m0, m1, math.min(1.0, p), m1 / m0 - 1.0)
    val schema = StructType(Seq(
      StructField("n0", LongType), StructField("s0", LongType),
      StructField("n1", LongType), StructField("s1", LongType),
      StructField("rate0", DoubleType), StructField("rate1", DoubleType),
      StructField("p_beats_control", DoubleType),
      StructField("expected_lift", DoubleType)))
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(Seq(out), 1), schema)
  }
}
