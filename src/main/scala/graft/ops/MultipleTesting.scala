package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Multiple-testing correction for the engine's test TABLES (group_set
  * per-group tests, ttests_2samp lists, metric sweeps): the reference
  * computes families of p-values but leaves the false-discovery control to
  * the analyst. Benjamini–Hochberg adjusted p-values:
  * p_adj(i) = min(1, min_{j ≥ i} p_(j)·m/j) over the ascending-p ranks.
  *
  * 100 TB shape (a metric sweep can be millions of hypotheses): the rank
  * comes from [[RangeCumSum.withRowNumber]] (no single-partition window),
  * and the suffix-min is the same two-phase construction run BACKWARDS —
  * per-partition running min in descending rank order plus P driver-side
  * suffix minima broadcast back. Rows with a null p-value pass through
  * with a null adjustment (they were not tested).
  */
object MultipleTesting {

  /** Returns `df` + `p_adjusted`. `p` must be in [0, 1] where non-null. */
  def bhAdjust(df: DataFrame, p: Column): DataFrame = {
    val pd = p.cast("double")
    val tested = df.filter(pd.isNotNull).withColumn("__p", pd)
    val skipped = df.filter(pd.isNull)
      .withColumn("p_adjusted", lit(null).cast("double"))
    val adjusted = RangeCumSum.withRowNumber(tested, Seq(col("__p").asc),
      "__rank") { (ranked, m) =>
      val withQ = ranked.withColumn("__q",
        least(lit(1.0), col("__p") * m / col("__rank")))
      withQ.persist()
      try {
        // suffix minima across partitions: offset(pid) = min q over all
        // LATER partitions (P scalars on the driver). Domain validation
        // rides the SAME cell aggregation (per-partition p min/max checked
        // on the collected cells) instead of spending its own job.
        val mins = withQ.groupBy(col("__pid")).agg(min(col("__q")).as("mn"),
            min(col("__p")).as("pmn"), max(col("__p")).as("pmx"))
          .collect().sortBy(_.getInt(0))
        require(mins.forall(r => r.getDouble(r.fieldIndex("pmn")) >= 0.0 &&
            r.getDouble(r.fieldIndex("pmx")) <= 1.0),
          "fdr_bh: p-values must lie in [0, 1]")
        var suffix = Double.PositiveInfinity
        val offs = mins.reverse.map { r =>
          val o = r.getInt(0) -> suffix
          suffix = math.min(suffix, r.getDouble(1))
          o
        }.toMap
        val w = Window.partitionBy(col("__pid")).orderBy(col("__rank").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        withQ.withColumn("p_adjusted",
            least(min(col("__q")).over(w),
              coalesce(element_at(typedlit(offs), col("__pid")),
                lit(Double.PositiveInfinity))))
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
