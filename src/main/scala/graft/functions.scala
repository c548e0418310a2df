package graft

import graft.agg._
import graft.expr.ExprTree
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._

/** Public Column builders — the Spark-native surface replacing the
  * reference's engine UDF names (registerAggregateFunctions.cpp:149-158,
  * all_in_sql_functions.h:26-44). Symbolic expressions use variables
  * `x1..xn` bound positionally to `cols`, exactly like the engine
  * aggregates; the camelCase metric variants accept the Python-SDK style
  * `"avg(numerator)/avg(denominator)"` strings instead.
  */
object functions {

  private def doubles(cols: Seq[Column]): Column =
    array(cols.map(_.cast("double")): _*)

  private val DefaultAlpha = graft.stats.TtestCommon.DefaultAlpha

  /** Variance (isStd=false) or standard error (isStd=true) of
    * f(x̄₁..x̄ₖ) by the delta method — single pass, O(k²) state. */
  def delta_method(expr: String, isStd: Boolean, cols: Seq[Column]): Column = {
    val agg = udaf(new DeltaMethodAgg(expr, isStd, cols.length),
      ExpressionEncoder[Array[Double]]())
    agg(doubles(cols))
  }

  /** One-sample t-test of f(means) against mu; optional CUPED expression
    * over the same x1..xk symbols, e.g. "x3/x4" or "x3+x4". Returns a
    * struct (estimate, stderr, t_statistic, p_value, lower, upper). */
  def ttest_1samp(expr: String, alternative: String = "two-sided", mu: Double = 0.0,
                  cuped: String = "", alpha: Double = DefaultAlpha)
                 (cols: Column*): Column = {
    val agg = udaf(new Ttest1SampAgg(expr, alternative, mu, cuped, alpha, cols.length),
      ExpressionEncoder[Array[Double]]())
    agg(doubles(cols))
  }

  /** Two-sample t-test of f(means) between treatment==0 and ==1. Returns a
    * struct (mean0, mean1, estimate, stderr, t_statistic, p_value, lower,
    * upper). */
  def ttest_2samp(expr: String, treatment: Column, alternative: String = "two-sided",
                  cuped: String = "", alpha: Double = DefaultAlpha)
                 (cols: Column*): Column = {
    val agg = udaf(new Ttest2SampAgg(expr, alternative, cuped, alpha, cols.length),
      ExpressionEncoder[(Array[Double], Int)]())
    agg(doubles(cols), treatment.cast("int"))
  }

  /** Post-stratified two-sample t-test; `stratum` is the PSE column. */
  def ttest_2samp_pse(expr: String, treatment: Column, stratum: Column,
                      alternative: String = "two-sided", cuped: String = "",
                      alpha: Double = DefaultAlpha)(cols: Column*): Column = {
    val agg = udaf(new Ttest2SampPseAgg(expr, alternative, cuped, alpha, cols.length),
      ExpressionEncoder[(Array[Double], Int, Long)]())
    agg(doubles(cols), treatment.cast("int"), stratum.cast("long"))
  }

  /** One-pass OLS with full inference; returns the summary struct.
    * `use_bias` appends an intercept as the LAST coefficient (reference
    * ols.h:275). */
  def ols(y: Column, xs: Seq[Column], useBias: Boolean = true): Column =
    graft.ops.Regression.olsAggColumn(y, xs, useBias)

  /** Weighted least squares (reference `Wls(y, x…, weight)`). */
  def wls(y: Column, xs: Seq[Column], weight: Column, useBias: Boolean = true): Column =
    graft.ops.Regression.olsAggColumn(y, xs, useBias, weight)

  // ------------------------------------------------- metric-string forms

  /** Parse Y and optional CUPED metric strings sharing one column list:
    * "avg(numerator)/avg(denominator)" + "avg(n_pre)/avg(d_pre)" →
    * ("x1/x2", "x3/x4", cols = num, den, n_pre, d_pre). */
  private[graft] def parseMetrics(y: String, cuped: String): (String, String, Seq[String]) = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sub(metric: String): String = {
      val pat = java.util.regex.Pattern.compile("(?:avg|mean)\\s*\\(\\s*([A-Za-z0-9_.]+)\\s*\\)")
      val m = pat.matcher(metric)
      val sb = new StringBuilder
      var last = 0
      while (m.find()) {
        sb.append(metric.substring(last, m.start()))
        val idx = seen.getOrElseUpdate(m.group(1), seen.size)
        sb.append(s"x${idx + 1}")
        last = m.end()
      }
      sb.append(metric.substring(last))
      if (seen.isEmpty && sb.toString == metric.trim) {
        // bare column name → avg(col)
        val idx = seen.getOrElseUpdate(metric.trim, seen.size)
        s"x${idx + 1}"
      } else sb.toString
    }
    val ySym = sub(y)
    val cSym = if (cuped.isEmpty) "" else sub(cuped)
    (ySym, cSym, seen.keys.toSeq)
  }

  /** Python-SDK style entry points binding columns from the metric string
    * (reference statistics.py:19-255). */
  def deltaMethod(metric: String, isStd: Boolean = true): Column = {
    val (sym, _, cs) = parseMetrics(metric, "")
    delta_method(sym, isStd, cs.map(col))
  }

  def ttest1Samp(metric: String, alternative: String = "two-sided", mu: Double = 0.0,
                 cuped: String = "", alpha: Double = DefaultAlpha): Column = {
    val (ySym, cSym, cs) = parseMetrics(metric, cuped)
    ttest_1samp(ySym, alternative, mu, cSym, alpha)(cs.map(col): _*)
  }

  def ttest2Samp(metric: String, treatment: Column, alternative: String = "two-sided",
                 cuped: String = "", alpha: Double = DefaultAlpha): Column = {
    val (ySym, cSym, cs) = parseMetrics(metric, cuped)
    ttest_2samp(ySym, treatment, alternative, cSym, alpha)(cs.map(col): _*)
  }
}
