package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Robust metric estimators — winsorized and trimmed means, the standard
  * defense against heavy-tailed experiment metrics (a handful of whale
  * users moving a t-test). Not in the reference (its metric layer stops at
  * raw means); included because every large experimentation platform
  * clips or trims before testing.
  *
  * Two passes, both constant driver state: a quantile pass for the clip
  * bounds, then ONE aggregate scan computing raw/winsorized/trimmed means
  * and clip counts together. `exact = false` (default) uses the
  * percentile_approx sketch — the 100 TB path, constant-memory per
  * partition; `exact = true` uses Spark's sort-buffer `percentile`
  * (per-group value buffer — gate-SF parity with DuckDB's quantile_cont,
  * not for full-scale runs).
  */
object Robust {

  /** Clip a column into [lo, hi] (pure codegen expression). Null passes
    * through as null — least/greatest SKIP nulls (they don't propagate),
    * so an unguarded clip would silently turn null into `hi`. */
  def winsorize(c: Column, lo: Double, hi: Double): Column =
    when(c.isNotNull, greatest(lit(lo), least(lit(hi), c)))

  /** (lower, upper) percentile bounds of `x`. */
  def quantileBounds(df: DataFrame, x: Column, pLo: Double, pHi: Double,
                     exact: Boolean = false): (Double, Double) = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad percentiles [$pLo, $pHi]")
    val q =
      if (exact)
        df.select(percentile(x, array(lit(pLo), lit(pHi))).as("q"))
      else
        df.select(percentile_approx(x, array(lit(pLo), lit(pHi)),
          lit(100000)).as("q"))
    val row = q.head()
    require(!row.isNullAt(0),
      "quantile_bounds: no non-null values (empty input would otherwise read as 0.0)")
    val r = row.getSeq[Double](0)
    (r(0), r(1))
  }

  /** Weighted mean with design-effect diagnostics: one row
    * (n, sum_w, weighted_mean, ess, design_effect) where
    * ess = (Σw)²/Σw² is Kish's effective sample size and
    * design_effect = n/ess — how much the weighting (IPW, survey,
    * importance sampling) inflates variance. ONE scan, constant state.
    * Rows with a null x or w, or w ≤ 0, are dropped. */
  def weightedMeanEss(df: DataFrame, x: Column, w: Column): DataFrame = {
    val xd = x.cast("double"); val wd = w.cast("double")
    df.filter(xd.isNotNull && wd.isNotNull && wd > 0.0)
      .agg(count(lit(1)).as("n"), sum(wd).as("sum_w"),
        (sum(xd * wd) / sum(wd)).as("weighted_mean"),
        (sum(wd) * sum(wd) / sum(wd * wd)).as("ess"))
      .withColumn("design_effect", col("n") / col("ess"))
  }

  /** One row: n, lo, hi, mean, winsorized_mean, trimmed_mean,
    * n_clipped_lo, n_clipped_hi. Null xs are ignored throughout. */
  def robustMeans(df: DataFrame, x: Column, pLo: Double = 0.05,
                  pHi: Double = 0.95, exact: Boolean = false): DataFrame = {
    val (lo, hi) = quantileBounds(df, x, pLo, pHi, exact)
    df.agg(
      count(x).as("n"),
      lit(lo).as("lo"), lit(hi).as("hi"),
      avg(x).as("mean"),
      avg(winsorize(x, lo, hi)).as("winsorized_mean"),
      avg(when(x.between(lo, hi), x)).as("trimmed_mean"),
      sum(when(x < lo, 1L).otherwise(0L)).as("n_clipped_lo"),
      sum(when(x > hi, 1L).otherwise(0L)).as("n_clipped_hi"))
  }
}
