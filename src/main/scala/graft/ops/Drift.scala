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
}
