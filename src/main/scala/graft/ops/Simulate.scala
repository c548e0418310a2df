package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Synthetic randomized-trial generator — Nie & Wager (2018) Setup B, the
  * reference's `simulate_randomized_trial`
  * (lib/spark_utility.py:36-117, duplicated at 387-466): p standard-normal
  * covariates, baseline b = max(0, x1+x2+x3) + max(0, x4+x5), propensity
  * e = 0.5, CATE τ = x1 + log(1+exp(x2)), treatment w ~ Bernoulli(e),
  * outcome y = b + (w−0.5)τ + σ·ε; optional sigmoid-threshold binary
  * outcome and Gamma(3)-benefit / 0.25-cost columns.
  *
  * Scale + reproducibility: the reference draws with numpy into a pandas
  * frame — single-machine memory, nondeterministic under partitioning.
  * Here every draw is a pure codegen'd function of (row id, tag, seed):
  * `spark.range(n)` is distributed, uniforms come from xxhash64, normals
  * via Box–Muller, Gamma(3) as an Erlang sum of three exponentials —
  * exact distributions, identical output on any cluster layout, no RNG
  * state, no driver materialization.
  */
object Simulate {

  private def uniform(tag: Int, seed: Long): Column =
    (xxhash64(col("id"), lit(tag), lit(seed)).cast("double") /
      lit(2.0 * Long.MaxValue)) + lit(0.5)

  /** Box–Muller over two hash uniforms; clamped away from ln(0). */
  private def normal(tag: Int, seed: Long): Column =
    sqrt(lit(-2.0) * log(greatest(uniform(tag, seed), lit(1e-300)))) *
      cos(lit(2.0 * math.Pi) * uniform(tag + 1000000, seed))

  /** numerically stable log(1 + exp(x)) */
  private def log1pExp(x: Column): Column =
    when(x > 30.0, x).otherwise(log1p(exp(x)))

  private def sigmoid(x: Column): Column = lit(1.0) / (lit(1.0) + exp(-x))

  /** Returns (id, treatment, outcome, propensity, expected_outcome,
    * actual_cate, feature_1..feature_p [, benefit, cost]). */
  def randomizedTrial(spark: SparkSession, n: Long, p: Int = 5,
                      sigma: Double = 1.0, binaryOutcome: Boolean = false,
                      addCostBenefit: Boolean = false,
                      seed: Long = 42L): DataFrame = {
    require(p >= 5, "p must be >= 5 (heterogeneity uses the first 5 features)")
    val base = spark.range(n).toDF("id")
    val feats = (1 to p).map(i => normal(i, seed).as(s"feature_$i"))
    var df = base.select(col("id") +: feats: _*)
    val b = greatest(col("feature_1") + col("feature_2") + col("feature_3"), lit(0.0)) +
      greatest(col("feature_4") + col("feature_5"), lit(0.0))
    val tau = col("feature_1") + log1pExp(col("feature_2"))
    val e = lit(0.5)
    val w = (uniform(5000000, seed) < e).cast("int")
    df = df.withColumn("propensity", e)
      .withColumn("expected_outcome", b)
      .withColumn("treatment", w)
    if (!binaryOutcome) {
      df = df
        .withColumn("actual_cate", tau)
        .withColumn("outcome",
          b + (w.cast("double") - 0.5) * tau + lit(sigma) * normal(6000000, seed))
    } else {
      // two potential outcomes share the baseline but draw independent noise
      val y1 = b + lit(0.5) * tau + lit(sigma) * normal(6000000, seed)
      val y0 = b - lit(0.5) * tau + lit(sigma) * normal(7000000, seed)
      df = df
        .withColumn("actual_cate", sigmoid(y1) - sigmoid(y0))
        .withColumn("outcome",
          when(w === 1, (sigmoid(y1) > 0.5).cast("int"))
            .otherwise((sigmoid(y0) > 0.5).cast("int")).cast("double"))
    }
    if (addCostBenefit) {
      // Gamma(3,1) = Erlang(3): −ln(u₁u₂u₃)
      val gamma3 = -log(greatest(uniform(8000000, seed), lit(1e-300))) -
        log(greatest(uniform(9000000, seed), lit(1e-300))) -
        log(greatest(uniform(9500000, seed), lit(1e-300)))
      df = df
        .withColumn("benefit", when(col("outcome") === 0.0, 0.0).otherwise(gamma3))
        .withColumn("cost",
          when(col("treatment") === 0, 0.0).otherwise(col("benefit") * 0.25))
    }
    val head = Seq("id", "treatment", "outcome", "propensity",
      "expected_outcome", "actual_cate")
    val tail = (1 to p).map(i => s"feature_$i") ++
      (if (addCostBenefit) Seq("benefit", "cost") else Nil)
    df.select((head ++ tail).map(col): _*)
  }
}
