package graft.ops

import graft.stats.Dist
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile treatment-effect test with user bucketing (reference calcite
  * QuantileTestBucketParser.java:41-176; result shaping
  * UdfFormatUtil.java:133-204).
  *
  * Users are hashed into `numBuckets` buckets; within each (bucket,
  * treatment) cell the requested percentiles are computed exactly; the
  * bucket-level quantile differences then behave like iid replicates, giving
  * a stderr and normal CI for each percentile's treatment effect.
  *
  * Shape at scale: the exact `percentile` aggregate shuffles one
  * (bucket × treatment) cell's values per reducer — with 2·numBuckets cells
  * and 32+ shuffle partitions this spreads evenly; no global sort.
  */
object QuantileTest {

  /** Returns one row per percentile: (percentile, q0, q1, diff, stderr,
    * lower, upper) where q0/q1 are the across-bucket mean quantiles. */
  def quantileTestBucket(df: DataFrame, value: Column, treatment: Column,
                         uin: Column, percentiles: Seq[Double],
                         numBuckets: Int = 32, alpha: Double = 0.05): DataFrame =
    quantileTestWithBuckets(df, value, treatment,
      pmod(xxhash64(uin), lit(numBuckets)), percentiles, alpha)

  /** Same test with a caller-supplied bucket column (for pre-bucketed data
    * or deterministic cross-engine bucketing). */
  def quantileTestWithBuckets(df: DataFrame, value: Column, treatment: Column,
                              bucket: Column, percentiles: Seq[Double],
                              alpha: Double = 0.05): DataFrame = {
    require(percentiles.nonEmpty && percentiles.forall(p => p > 0 && p < 1))
    val pctArr = percentiles.mkString(", ")
    val bucketed = df.select(
      value.cast("double").as("__v"),
      treatment.cast("int").as("__t"),
      bucket.as("__b"))
    // exact per-(bucket, treatment) quantile vector
    val cells = bucketed.groupBy(col("__b"), col("__t"))
      .agg(expr(s"percentile(__v, array($pctArr))").as("qs"))
    // explode percentile index, pivot treatment, aggregate across buckets
    val per = cells.select(col("__b"), col("__t"), posexplode(col("qs")).as(Seq("pi", "q")))
    val wide = per.groupBy(col("__b"), col("pi"))
      .agg(max(when(col("__t") === 0, col("q"))).as("q0"),
        max(when(col("__t") === 1, col("q"))).as("q1"))
      .withColumn("d", col("q1") - col("q0"))
    val z = Dist.normQuantile(1 - alpha / 2)
    wide.groupBy(col("pi"))
      .agg(avg(col("q0")).as("q0"), avg(col("q1")).as("q1"),
        avg(col("d")).as("diff"),
        (stddev_samp(col("d")) / sqrt(count(lit(1)))).as("stderr"))
      .select(
        element_at(lit(percentiles.toArray), col("pi") + 1).as("percentile"),
        col("q0"), col("q1"), col("diff"), col("stderr"),
        (col("diff") - lit(z) * col("stderr")).as("lower"),
        (col("diff") + lit(z) * col("stderr")).as("upper"))
      .orderBy(col("percentile"))
  }
}
