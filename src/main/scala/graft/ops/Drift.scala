package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Binned distribution-drift metrics between a baseline (group = 0) and a
  * current (group = 1) sample: PSI (population stability index, the
  * model-monitoring standard) and Jensen-Shannon divergence. The
  * continuous-space companion is [[RankTests.wasserstein1]].
  *
  * ONE groupBy over the binned value computes both groups' counts
  * (map-side combined, ≤ bins+1 cells cross the wire); every metric is a
  * closed form on that cell table. Empty-bin shares are floored at
  * `minShare` so PSI's log stays finite — the floor is part of the
  * contract (document it when comparing against other tools). */
object Drift {

  /** Per-bin table: (bin, n_base, n_cur, share_base, share_cur, psi_term,
    * js_term), ordered by bin. `bins` are explicit split points
    * ([[Features.cutBins]] ordinal convention: bin 0 = below the first
    * split). */
  def binnedDrift(df: DataFrame, value: Column, group: Column,
                  bins: Seq[Double], minShare: Double = 1e-6): DataFrame = {
    require(bins.length >= 2, "need at least 2 split points (cutBins contract)")
    val cells = df
      .filter(value.isNotNull && group.isNotNull)
      .groupBy(Features.cutBins(value, bins, ifString = false).as("bin"))
      .agg(sum(when(group.cast("int") === 0, 1L).otherwise(0L)).as("n_base"),
        sum(when(group.cast("int") === 1, 1L).otherwise(0L)).as("n_cur"))
    val tot = cells.agg(sum(col("n_base")), sum(col("n_cur"))).head()
    val (t0, t1) = (tot.getLong(0), tot.getLong(1))
    require(t0 > 0 && t1 > 0, "both groups need rows")
    val p = greatest(col("n_base").cast("double") / t0.toDouble, lit(minShare))
    val q = greatest(col("n_cur").cast("double") / t1.toDouble, lit(minShare))
    val m = (p + q) / 2.0
    cells
      .withColumn("share_base", p)
      .withColumn("share_cur", q)
      .withColumn("psi_term", (col("share_cur") - col("share_base")) *
        log(col("share_cur") / col("share_base")))
      .withColumn("js_term",
        (col("share_cur") * log(col("share_cur") / m) +
          col("share_base") * log(col("share_base") / m)) / 2.0)
      .orderBy(col("bin"))
  }

  /** Total PSI. Rule of thumb: < 0.1 stable, 0.1-0.25 moderate shift,
    * > 0.25 action needed. */
  def psi(df: DataFrame, value: Column, group: Column, bins: Seq[Double],
          minShare: Double = 1e-6): Double =
    binnedDrift(df, value, group, bins, minShare)
      .agg(sum(col("psi_term"))).head().getDouble(0)

  /** Jensen-Shannon divergence (natural log; ∈ [0, ln 2]). */
  def jensenShannon(df: DataFrame, value: Column, group: Column,
                    bins: Seq[Double], minShare: Double = 1e-6): Double =
    binnedDrift(df, value, group, bins, minShare)
      .agg(sum(col("js_term"))).head().getDouble(0)

  /** Seasonal metric anomaly detection for monitoring pipelines: per
    * period p, the baseline is the mean/sd of the SAME seasonal phase's
    * PRIOR periods (p − season, p − 2·season, ...), so daily cycles don't
    * read as anomalies the way a flat rolling window makes them. A period
    * is flagged when it has at least `minHistory` same-phase predecessors
    * and |z| > `zThresh`.
    *
    * 100 TB shape: ONE row-scale aggregate to per-period metric cells,
    * then a window over CELLS partitioned by phase (period mod season) —
    * the window never touches row-scale data and needs no driver state,
    * so the monitor runs unbounded history. Returns
    * (period, metric, n_hist, baseline, baseline_sd, z, is_anomaly). */
  def metricAnomaly(df: DataFrame, period: Column, value: Column,
                    season: Int, minHistory: Int = 3,
                    zThresh: Double = 3.0): DataFrame = {
    require(season >= 1, s"metric_anomaly: season must be >= 1, got $season")
    require(minHistory >= 2,
      s"metric_anomaly: minHistory must be >= 2 (sd needs it), got $minHistory")
    require(zThresh > 0, s"metric_anomaly: zThresh must be > 0, got $zThresh")
    val v = value.cast("double")
    val cells = df.filter(period.isNotNull && v.isNotNull)
      .groupBy(period.cast("long").as("period"))
      .agg(avg(v).as("metric"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(pmod(col("period"), lit(season.toLong)))
      .orderBy(col("period"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    cells
      .withColumn("n_hist", count(col("metric")).over(w))
      .withColumn("baseline", avg(col("metric")).over(w))
      .withColumn("baseline_sd", stddev_samp(col("metric")).over(w))
      .withColumn("z",
        when(col("n_hist") >= minHistory && col("baseline_sd") > 0.0,
          (col("metric") - col("baseline")) / col("baseline_sd")))
      .withColumn("is_anomaly",
        coalesce(abs(col("z")) > zThresh, lit(false)))
  }
}
