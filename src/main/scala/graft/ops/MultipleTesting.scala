package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Multiple-testing correction for the engine's test TABLES (group_set
  * per-group tests, ttests_2samp lists, metric sweeps): the reference
  * computes families of p-values but leaves the false-discovery control to
  * the analyst. Three standard adjustments over the ascending-p ranks:
  *
  *  - `bh`   (Benjamini–Hochberg, FDR under independence/PRDS):
  *           p_adj(i) = min(1, min_{j ≥ i} p_(j)·m/j)          [step-up]
  *  - `by`   (Benjamini–Yekutieli, FDR under ARBITRARY dependence):
  *           BH with the harmonic inflation c(m) = Σ_{j≤m} 1/j  [step-up]
  *  - `holm` (Holm–Bonferroni, FWER, no dependence assumptions):
  *           p_adj(i) = max_{j ≤ i} min(1, (m−j+1)·p_(j))       [step-down]
  *
  * 100 TB shape (a metric sweep can be millions of hypotheses): the rank
  * comes from [[RangeCumSum.withRowNumber]] (no single-partition window),
  * and the suffix-min (step-up) or prefix-max (step-down) is the same
  * two-phase construction — per-partition running extremum in rank order
  * plus P driver-side partition offsets broadcast back. Rows with a null
  * p-value pass through with a null adjustment (they were not tested).
  */
object MultipleTesting {

  /** BH adjusted p-values — `df` + `p_adjusted`. See [[adjust]]. */
  def bhAdjust(df: DataFrame, p: Column): DataFrame = adjust(df, p, "bh")

  /** Exact below 10M (a ~50 ms driver loop), the Euler–Maclaurin
    * expansion above — whose error is already far below double-ulp well
    * before the switchover. */
  private def harmonic(m: Long): Double =
    if (m <= 10000000L) {
      var s = 0.0; var j = 1L
      while (j <= m) { s += 1.0 / j; j += 1 }
      s
    } else {
      val md = m.toDouble
      math.log(md) + 0.57721566490153286 + 1.0 / (2 * md) -
        1.0 / (12 * md * md)
    }

  /** Returns `df` + `p_adjusted` for `method` in {bh, by, holm}.
    * `p` must be in [0, 1] where non-null. */
  def adjust(df: DataFrame, p: Column, method: String = "bh"): DataFrame = {
    val meth = method.toLowerCase
    require(Set("bh", "by", "holm")(meth),
      s"p_adjust: method must be bh|by|holm, got $method")
    val pd = p.cast("double")
    val tested = df.filter(pd.isNotNull).withColumn("__p", pd)
    val skipped = df.filter(pd.isNull)
      .withColumn("p_adjusted", lit(null).cast("double"))
    val adjusted = RangeCumSum.withRowNumber(tested, Seq(col("__p").asc),
      "__rank") { (ranked, m) =>
      val stepDown = meth == "holm"
      val q =
        if (stepDown)
          least(lit(1.0), col("__p") * (lit(m) - col("__rank") + 1))
        else {
          val cm = if (meth == "by") harmonic(m) else 1.0
          least(lit(1.0), col("__p") * lit(cm) * m / col("__rank"))
        }
      val withQ = ranked.withColumn("__q", q)
      withQ.persist()
      try {
        // partition offsets: for step-up, min q over all LATER partitions
        // (suffix); for step-down, max q over all EARLIER ones (prefix) —
        // P scalars on the driver either way. Domain validation rides the
        // SAME cell aggregation (per-partition p min/max checked on the
        // collected cells) instead of spending its own job.
        val cells = withQ.groupBy(col("__pid")).agg(
            min(col("__q")).as("qmn"), max(col("__q")).as("qmx"),
            min(col("__p")).as("pmn"), max(col("__p")).as("pmx"))
          .collect().sortBy(_.getInt(0))
        require(cells.forall(r => r.getDouble(r.fieldIndex("pmn")) >= 0.0 &&
            r.getDouble(r.fieldIndex("pmx")) <= 1.0),
          "p_adjust: p-values must lie in [0, 1]")
        val adjustedCol =
          if (!stepDown) {
            var suffix = Double.PositiveInfinity
            val offs = cells.reverse.map { r =>
              val o = r.getInt(0) -> suffix
              suffix = math.min(suffix, r.getDouble(r.fieldIndex("qmn")))
              o
            }.toMap
            val w = Window.partitionBy(col("__pid"))
              .orderBy(col("__rank").desc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            least(min(col("__q")).over(w),
              coalesce(element_at(typedlit(offs), col("__pid")),
                lit(Double.PositiveInfinity)))
          } else {
            var prefix = Double.NegativeInfinity
            val offs = cells.map { r =>
              val o = r.getInt(0) -> prefix
              prefix = math.max(prefix, r.getDouble(r.fieldIndex("qmx")))
              o
            }.toMap
            val w = Window.partitionBy(col("__pid"))
              .orderBy(col("__rank").asc)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            greatest(max(col("__q")).over(w),
              coalesce(element_at(typedlit(offs), col("__pid")),
                lit(Double.NegativeInfinity)))
          }
        withQ.withColumn("p_adjusted", adjustedCol)
          .drop("__p", "__q", "__rank", "__mid", "__pid")
          // checkpoint is a CORRECTNESS device here: __pid is a physical
          // partition id that would re-randomize on recompute once the
          // enclosing scopes unpersist their frames. Registered for the
          // query-boundary release (graft.Ckpt).
          .transform(d => graft.Ckpt.register(d.localCheckpoint()))
      } finally {
        withQ.unpersist()
        ()
      }
    }
    adjusted.unionByName(skipped)
  }
}
