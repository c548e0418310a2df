package graft.stats

import graft.expr.ExprTree

/** CUPED / t-test shared math. Port of TtestCommon
  * (/root/reference/src/udf/starrocks/be/src/exprs/agg/ttest_common.h:35-242).
  *
  * CUPED: the covariate expression is split on top-level `+` into parts
  * X₁..Xₘ; θ = Cov(X,Y)·Cov(X,X)⁻¹ where all (co)variances are delta-method
  * (co)variances of the sub-expressions evaluated on the COMBINED sample;
  * adjusted mean_g = f(means_g) − θ·(X(means_g) − X(means_combined)) and
  * adjusted var_g = varY_g + θ CovXX_g θᵀ − 2 θ CovXY_gᵀ.
  */
object TtestCommon {
  val DefaultAlpha = 0.05
  val DefaultMde = 0.005
  val DefaultPower = 0.8

  sealed trait Alternative { def name: String }
  case object TwoSided extends Alternative { val name = "two-sided" }
  case object Less extends Alternative { val name = "less" }
  case object Greater extends Alternative { val name = "greater" }

  def alternative(s: String): Alternative = s match {
    case "two-sided" | "two_sided" | "twosided" => TwoSided
    case "less" => Less
    case "greater" => Greater
    case other => throw new IllegalArgumentException(
      s"alternative('$other') is not one of two-sided/less/greater")
  }

  /** Split a CUPED expression on `+` (the reference does a flat split —
    * parenthesized '+' is not expected in covariate lists; ttest_common.h:93). */
  def cupedParts(cuped: String): Seq[String] =
    cuped.split('+').toSeq.map(_.trim).filter(_.nonEmpty)

  /** θ and the building blocks for CUPED adjustment, computed on a given
    * sample. Port of calc_cuped_covs (ttest_common.h:133-175). */
  def calcCupedCovs(yExpr: String, cuped: String, numVars: Int, count: Long,
                    means: Array[Double], cov: LinAlg.Mat)
      : (Double, Array[Double], LinAlg.Mat, Array[Double]) = {
    val parts = cupedParts(cuped).map(e => ExprTree(e, numVars))
    val yTree = ExprTree(yExpr, numVars)
    val m = parts.length
    val covXX = LinAlg.zeros(m, m)
    val covXY = new Array[Double](m)
    for (i <- 0 until m) {
      covXX(i)(i) = DeltaStats.calcDeltaMethod(parts(i), count, means, cov, isStd = false)
      covXY(i) = DeltaStats.calcDeltaMethodCov(yTree, parts(i), count, means, cov)
      for (j <- (i + 1) until m) {
        val c = DeltaStats.calcDeltaMethodCov(parts(i), parts(j), count, means, cov)
        covXX(i)(j) = c; covXX(j)(i) = c
      }
    }
    val (inv0, _) = LinAlg.invertWithDropped(covXX)
    val inv = inv0.map(_.map(v => if (v.isNaN) 0.0 else v))
    // theta = covXY · covXX⁻¹  (row vector)
    val theta = Array.tabulate(m)(j => LinAlg.dot(covXY, inv.map(_(j))))
    val varY = DeltaStats.calcDeltaMethod(yTree, count, means, cov, isStd = false)
    (varY, covXY, covXX, theta)
  }

  /** cuped element values at a mean vector (ttest_common.h:90-100). */
  def cupedMeans(cuped: String, numVars: Int, means: Array[Double]): Array[Double] =
    cupedParts(cuped).map(e => ExprTree(e, numVars).value(means)).toArray

  /** Per-group CUPED-adjusted mean and variance with a shared θ and shared
    * combined cuped means (ttest_common.h:102-119). */
  def cupedMeanAndVar(yExpr: String, cuped: String, numVars: Int, count: Long,
                      means: Array[Double], combinedCupedMeans: Array[Double],
                      cov: LinAlg.Mat, theta: Array[Double]): (Double, Double) = {
    val (varY, covXY, covXX, _) = calcCupedCovs(yExpr, cuped, numVars, count, means, cov)
    val cupedVar = varY + LinAlg.quadForm(theta, covXX, theta) - 2.0 * LinAlg.dot(theta, covXY)
    val yTree = ExprTree(yExpr, numVars)
    val groupCuped = cupedMeans(cuped, numVars, means)
    var shift = 0.0
    for (i <- theta.indices) shift += theta(i) * (groupCuped(i) - combinedCupedMeans(i))
    (yTree.value(means) - shift, cupedVar)
  }

  /** One-sample variant: mean is NOT shifted (ttest_common.h:121-131). */
  def cupedMeanAndVar1Samp(yExpr: String, cuped: String, numVars: Int, count: Long,
                           means: Array[Double], cov: LinAlg.Mat): (Double, Double) = {
    val mean = ExprTree(yExpr, numVars).value(means)
    if (cuped.isEmpty) {
      val v = DeltaStats.calcDeltaMethod(ExprTree(yExpr, numVars), count, means, cov, isStd = false)
      (mean, v)
    } else {
      val (varY, covXY, covXX, theta) = calcCupedCovs(yExpr, cuped, numVars, count, means, cov)
      val v = varY + LinAlg.quadForm(theta, covXX, theta) - 2.0 * LinAlg.dot(theta, covXY)
      (mean, v)
    }
  }

  /** Two-sample per-group means and variances, with optional CUPED
    * (θ from the combined sample). Port of calc_means_and_vars
    * (ttest_common.h:42-88). Returns (mean0, mean1, var0, var1). */
  def calcMeansAndVars(yExpr: String, cuped: String, numVars: Int,
                       s0: DeltaStats, s1: DeltaStats, combined: DeltaStats)
      : (Double, Double, Double, Double) = {
    if (cuped.isEmpty) {
      val yTree = ExprTree(yExpr, numVars)
      val mean0 = yTree.value(s0.means)
      val mean1 = yTree.value(s1.means)
      val var0 = DeltaStats.calcDeltaMethod(yTree, s0.count, s0.means, s0.covMatrix, isStd = false)
      val var1 = DeltaStats.calcDeltaMethod(yTree, s1.count, s1.means, s1.covMatrix, isStd = false)
      (mean0, mean1, var0, var1)
    } else {
      val means = combined.means
      val cov = combined.covMatrix
      val (_, _, _, theta) =
        calcCupedCovs(yExpr, cuped, numVars, combined.count, means, cov)
      val combCuped = cupedMeans(cuped, numVars, means)
      val (m0, v0) = cupedMeanAndVar(yExpr, cuped, numVars, s0.count, s0.means, combCuped, s0.covMatrix, theta)
      val (m1, v1) = cupedMeanAndVar(yExpr, cuped, numVars, s1.count, s1.means, combCuped, s1.covMatrix, theta)
      (m0, m1, v0, v1)
    }
  }

  /** p-value against the NORMAL distribution (the reference uses normal, not
    * Student-t, for the t-statistic; ttest_common.h:199-216). */
  def pValue(tStat: Double, alt: Alternative): Double =
    if (tStat.isNaN) Double.NaN
    else if (tStat.isInfinite) 0.0
    else alt match {
      case TwoSided => 2.0 * (1.0 - Dist.normCdf(math.abs(tStat)))
      case Less => Dist.normCdf(tStat)
      case Greater => 1.0 - Dist.normCdf(tStat)
    }

  /** Confidence interval via Student-t(count−1) (ttest_common.h:218-241). */
  def confidenceInterval(estimate: Double, stderr: Double, count: Long,
                         alpha: Double, alt: Alternative): (Double, Double) = {
    if (alpha <= 0) return (0.0, 0.0)
    alt match {
      case TwoSided =>
        val tq = Dist.tQuantile(1 - alpha / 2, (count - 1).toDouble)
        (estimate - tq * stderr, estimate + tq * stderr)
      case Less =>
        val tq = Dist.tQuantile(1 - alpha, (count - 1).toDouble)
        (Double.NegativeInfinity, estimate + tq * stderr)
      case Greater =>
        val tq = Dist.tQuantile(1 - alpha, (count - 1).toDouble)
        (estimate - tq * stderr, Double.PositiveInfinity)
    }
  }
}
