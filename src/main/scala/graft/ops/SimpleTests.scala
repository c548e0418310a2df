package graft.ops

import graft.stats.Dist
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classic two-sample tests re-exported by the reference from engine
  * built-ins (registerAggregateFunctions.cpp:49-51, statistics.py:710-847):
  * closed forms over one count/avg/var aggregate pass. */
object SimpleTests {
  case class TestResult(statistic: Double, p_value: Double)

  private def groupStats(df: DataFrame, value: Column, treatment: Column)
      : (Long, Double, Double, Long, Double, Double) = {
    val r = df.agg(
      sum(when(treatment === 0, 1L).otherwise(0L)).as("n0"),
      avg(when(treatment === 0, value)).as("m0"),
      var_samp(when(treatment === 0, value)).as("v0"),
      sum(when(treatment =!= 0, 1L).otherwise(0L)).as("n1"),
      avg(when(treatment =!= 0, value)).as("m1"),
      var_samp(when(treatment =!= 0, value)).as("v1")).head()
    (r.getAs[Long]("n0"), r.getAs[Double]("m0"), r.getAs[Double]("v0"),
      r.getAs[Long]("n1"), r.getAs[Double]("m1"), r.getAs[Double]("v1"))
  }

  /** Student's t (pooled variance, df = n0+n1−2). */
  def studentTtest(df: DataFrame, value: Column, treatment: Column): TestResult = {
    val (n0, m0, v0, n1, m1, v1) = groupStats(df, value, treatment)
    val dfree = (n0 + n1 - 2).toDouble
    val sp2 = ((n0 - 1) * v0 + (n1 - 1) * v1) / dfree
    val t = (m1 - m0) / math.sqrt(sp2 * (1.0 / n0 + 1.0 / n1))
    TestResult(t, Dist.tTwoSidedP(t, dfree))
  }

  /** Welch's t (unequal variances, Welch–Satterthwaite df). */
  def welchTtest(df: DataFrame, value: Column, treatment: Column): TestResult = {
    val (n0, m0, v0, n1, m1, v1) = groupStats(df, value, treatment)
    val a = v0 / n0; val b = v1 / n1
    val t = (m1 - m0) / math.sqrt(a + b)
    val dfree = (a + b) * (a + b) / (a * a / (n0 - 1) + b * b / (n1 - 1))
    TestResult(t, Dist.tTwoSidedP(t, dfree))
  }

  /** Mean z-test with known variances and confidence level
    * (CH meanZTest: pop variances supplied). */
  def meanZTest(df: DataFrame, value: Column, treatment: Column,
                var0: Double, var1: Double): TestResult = {
    val (n0, m0, _, n1, m1, _) = groupStats(df, value, treatment)
    val z = (m1 - m0) / math.sqrt(var0 / n0 + var1 / n1)
    val p = if (z.isNaN) Double.NaN else 2.0 * (1.0 - Dist.normCdf(math.abs(z)))
    TestResult(z, p)
  }

  // ------------------------------------------------------- power analysis

  /** Standalone two-sample power math (the reference exposes these only
    * inside xexpt_ttest_2samp's output, XexptAgg power/recommend_samples;
    * here as the pre-experiment planning calls): normal-approximation
    * per-arm sample size n = 2·((z_{1−α/2}+z_{pow})·σ/δ)² for a two-sided
    * equal-allocation test. Pure driver math. */
  def sampleSizePerArm(sigma: Double, delta: Double, alpha: Double = 0.05,
                       power: Double = 0.8): Double = {
    require(sigma > 0 && delta != 0 && alpha > 0 && alpha < 1 &&
      power > 0 && power < 1, "bad power-analysis inputs")
    val z = Dist.normQuantile(1 - alpha / 2) + Dist.normQuantile(power)
    2.0 * math.pow(z * sigma / delta, 2)
  }

  /** Minimum detectable effect at the given per-arm n (the inverse of
    * [[sampleSizePerArm]]). */
  def mde(sigma: Double, nPerArm: Double, alpha: Double = 0.05,
          power: Double = 0.8): Double = {
    require(sigma > 0 && nPerArm > 0, "bad power-analysis inputs")
    val z = Dist.normQuantile(1 - alpha / 2) + Dist.normQuantile(power)
    z * sigma * math.sqrt(2.0 / nPerArm)
  }
}
