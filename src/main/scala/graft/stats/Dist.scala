package graft.stats

import org.apache.commons.math3.distribution.{
  ChiSquaredDistribution, FDistribution, NormalDistribution, TDistribution
}

/** Thin wrappers over commons-math3 distributions (shipped with Spark).
  * Matches the boost::math calls in the reference's finalizers
  * (/root/reference/src/udf/starrocks/be/src/exprs/agg/ttest_common.h:199-241,
  * ols.h:435-462). */
object Dist {
  private val stdNormal = new NormalDistribution(null, 0.0, 1.0)

  def normCdf(x: Double): Double = stdNormal.cumulativeProbability(x)
  def normQuantile(p: Double): Double = stdNormal.inverseCumulativeProbability(p)

  def tCdf(x: Double, df: Double): Double =
    new TDistribution(null, df).cumulativeProbability(x)
  def tQuantile(p: Double, df: Double): Double =
    new TDistribution(null, df).inverseCumulativeProbability(p)

  def chiSqCdf(x: Double, df: Double): Double =
    new ChiSquaredDistribution(null, df).cumulativeProbability(x)

  def fCdf(x: Double, d1: Double, d2: Double): Double =
    new FDistribution(null, d1, d2).cumulativeProbability(x)

  /** Student-t two-sided upper tail: 2 * P(T > |t|). */
  def tTwoSidedP(t: Double, df: Double): Double =
    if (t.isNaN) t
    else if (t.isInfinite) 0.0
    else 2.0 * (1.0 - tCdf(math.abs(t), df))
}
