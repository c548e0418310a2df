package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types._

/** Always-valid sequential inference: the mixture sequential probability
  * ratio test (mSPRT — Robbins 1970; Johari, Koomen, Pekelis & Walsh 2017,
  * "Peeking at A/B tests"). The reference's tests are all fixed-horizon,
  * but a platform watches experiments WHILE they run, and repeatedly
  * peeking at classic p-values inflates false positives; the mSPRT's
  * p-value is valid at EVERY intermediate look.
  *
  * Two-sample normal-mixture form over cumulative time buckets: at look m,
  * with cumulative per-arm moments, δ̂ = mean₁ − mean₀,
  * V = σ̂²·(1/n₁ + 1/n₀) (pooled), and
  * Λ_m = sqrt(V/(V+τ²)) · exp(δ̂²τ² / (2V(V+τ²))) — the likelihood ratio
  * against the N(0, τ²) effect mixture. The always-valid p-value is
  * p_m = min(1, 1 / max_{k≤m} Λ_k), nonincreasing in m.
  *
  * 100 TB shape: ONE row-scale aggregate collapses events to
  * (bucket × arm) moment cells; the cumulative scan, likelihood ratio,
  * and running-max inversion run over those cells on the driver — the
  * bounded-metadata idiom (ROC suffix sums, RangeCumSum offsets). The
  * bucket count is guarded: a take-ordered of maxBuckets+1 cells bounds
  * driver memory BEFORE anything is collected, and overflow fails fast
  * naming the knob. Buckets before both arms reach 2 cumulative
  * observations are not emitted (their variance is undefined).
  *
  * Returns (bucket, n1, n0, estimate, lambda, p_always_valid). */
object Sequential {

  def msprt(df: DataFrame, bucket: Column, y: Column, t: Column,
            tau: Double = 1.0, maxBuckets: Int = 100000): DataFrame = {
    require(tau > 0, s"msprt: tau must be positive, got $tau")
    require(maxBuckets > 0, "msprt: maxBuckets must be positive")
    val yd = y.cast("double")
    val cellRows = df
      .filter(yd.isNotNull && t.isNotNull && bucket.isNotNull)
      .groupBy(bucket.cast("long").as("bucket"))
      .agg(
        sum(when(t === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(t === 1, yd).otherwise(0.0)).as("s1"),
        sum(when(t === 1, yd * yd).otherwise(0.0)).as("q1"),
        sum(when(t === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(t === 0, yd).otherwise(0.0)).as("s0"),
        sum(when(t === 0, yd * yd).otherwise(0.0)).as("q0"))
      .orderBy(col("bucket"))
      .limit(maxBuckets + 1) // take-ordered: bounded BEFORE collection
      .collect()
    require(cellRows.length <= maxBuckets,
      s"msprt produced more than $maxBuckets time buckets: coarsen the " +
        "bucket column or raise maxBuckets if the driver can hold the cells")
    var cn1 = 0L; var cs1 = 0.0; var cq1 = 0.0
    var cn0 = 0L; var cs0 = 0.0; var cq0 = 0.0
    var maxLam = Double.NegativeInfinity
    val t2 = tau * tau
    val out = cellRows.flatMap { r =>
      cn1 += r.getLong(1); cs1 += r.getDouble(2); cq1 += r.getDouble(3)
      cn0 += r.getLong(4); cs0 += r.getDouble(5); cq0 += r.getDouble(6)
      if (cn1 < 2 || cn0 < 2) None
      else {
        val varP = ((cq1 - cs1 * cs1 / cn1) + (cq0 - cs0 * cs0 / cn0)) /
          (cn1 + cn0 - 2)
        val v = varP * (1.0 / cn1 + 1.0 / cn0)
        if (v <= 0) None
        else {
          val d = cs1 / cn1 - cs0 / cn0
          val lam = math.sqrt(v / (v + t2)) *
            math.exp(d * d * t2 / (2.0 * v * (v + t2)))
          maxLam = math.max(maxLam, lam)
          Some(Row(r.getLong(0), cn1, cn0, d, lam,
            math.min(1.0, 1.0 / maxLam)))
        }
      }
    }
    val schema = StructType(Seq(
      StructField("bucket", LongType), StructField("n1", LongType),
      StructField("n0", LongType), StructField("estimate", DoubleType),
      StructField("lambda", DoubleType),
      StructField("p_always_valid", DoubleType)))
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(out.toSeq, 1), schema)
  }

  /** Grouped mSPRT — one always-valid p-value trajectory PER EXPERIMENT,
    * the shape a platform actually runs (its monitor watches every live
    * experiment, not one): identical math to [[msprt]], cells keyed by
    * (experiment, bucket) in ONE row-scale aggregate, the cumulative scan
    * restarting at each experiment boundary of the ordered cell array.
    * The take-ordered guard bounds TOTAL (experiment × bucket) cells
    * BEFORE collection and the error names both knobs. Returns
    * (experiment, bucket, n1, n0, estimate, lambda, p_always_valid). */
  def msprtBy(df: DataFrame, experiment: Column, bucket: Column, y: Column,
              t: Column, tau: Double = 1.0,
              maxCells: Int = 200000): DataFrame = {
    require(tau > 0, s"msprt_by: tau must be positive, got $tau")
    require(maxCells > 0, "msprt_by: maxCells must be positive")
    val yd = y.cast("double")
    val cellRows = df
      .filter(yd.isNotNull && t.isNotNull && bucket.isNotNull &&
        experiment.isNotNull)
      .groupBy(experiment.cast("string").as("experiment"),
        bucket.cast("long").as("bucket"))
      .agg(
        sum(when(t === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(t === 1, yd).otherwise(0.0)).as("s1"),
        sum(when(t === 1, yd * yd).otherwise(0.0)).as("q1"),
        sum(when(t === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(t === 0, yd).otherwise(0.0)).as("s0"),
        sum(when(t === 0, yd * yd).otherwise(0.0)).as("q0"))
      .orderBy(col("experiment"), col("bucket"))
      .limit(maxCells + 1) // take-ordered: bounded BEFORE collection
      .collect()
    require(cellRows.length <= maxCells,
      s"msprt_by produced more than $maxCells (experiment x bucket) cells: " +
        "coarsen the bucket column, filter the experiment set, or raise " +
        "maxCells if the driver can hold the cells")
    val t2 = tau * tau
    var curExp: String = null
    var cn1 = 0L; var cs1 = 0.0; var cq1 = 0.0
    var cn0 = 0L; var cs0 = 0.0; var cq0 = 0.0
    var maxLam = Double.NegativeInfinity
    val out = cellRows.flatMap { r =>
      val g = r.getString(0)
      if (g != curExp) { // experiment boundary: restart the trajectory
        curExp = g
        cn1 = 0L; cs1 = 0.0; cq1 = 0.0
        cn0 = 0L; cs0 = 0.0; cq0 = 0.0
        maxLam = Double.NegativeInfinity
      }
      cn1 += r.getLong(2); cs1 += r.getDouble(3); cq1 += r.getDouble(4)
      cn0 += r.getLong(5); cs0 += r.getDouble(6); cq0 += r.getDouble(7)
      if (cn1 < 2 || cn0 < 2) None
      else {
        val varP = ((cq1 - cs1 * cs1 / cn1) + (cq0 - cs0 * cs0 / cn0)) /
          (cn1 + cn0 - 2)
        val v = varP * (1.0 / cn1 + 1.0 / cn0)
        if (v <= 0) None
        else {
          val d = cs1 / cn1 - cs0 / cn0
          val lam = math.sqrt(v / (v + t2)) *
            math.exp(d * d * t2 / (2.0 * v * (v + t2)))
          maxLam = math.max(maxLam, lam)
          Some(Row(g, r.getLong(1), cn1, cn0, d, lam,
            math.min(1.0, 1.0 / maxLam)))
        }
      }
    }
    val schema = StructType(Seq(
      StructField("experiment", StringType), StructField("bucket", LongType),
      StructField("n1", LongType), StructField("n0", LongType),
      StructField("estimate", DoubleType), StructField("lambda", DoubleType),
      StructField("p_always_valid", DoubleType)))
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(out.toSeq, 1), schema)
  }
}
