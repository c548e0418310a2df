package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Uplift evaluation: lift/gain curves and AUUC — pure SQL-rewrite in the
  * reference (calcite LiftParser.java:72-136; python uplift.py:76-196),
  * pure DataFrame composition here.
  *
  * Rows are ranked by predicted individual treatment effect (descending),
  * cut into K near-equal buckets (exact ntile semantics), and the cumulative
  * treated-vs-control outcome difference is reported per cumulative traffic
  * ratio: lift(r) = cumΣY₁/cumN₁ − cumΣY₀/cumN₀, gain(r) = lift(r)·r,
  * ate = overall lift, random_gain(r) = ate·r.
  *
  * Scale: the global rank comes from [[RangeCumSum.withRowNumber]] — a
  * range repartition plus per-partition row numbers with collected offsets —
  * so there is NO single-partition window anywhere; the bucket id is then
  * pure arithmetic on the rank (exact ntile: the first n%k buckets get
  * ⌈n/k⌉ rows). The K-row bucket table is collected and the cumulative
  * curve finished on the driver (bounded by k, not by data size).
  */
object Uplift {

  def liftGain(df: DataFrame, ite: Column, y: Column, treatment: Column,
               k: Int = 100, tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sel = df
      .filter(ite.isNotNull && y.isNotNull && treatment.isNotNull)
      .select(Seq(ite.cast("double").as("mm_ite"),
        y.cast("double").as("mm_y"), treatment.cast("int").as("mm_t")) ++
        tieBreak.zipWithIndex.map { case (c, i) => c.as(s"tb_$i") }: _*)
    val order = col("mm_ite").desc +: tieBreak.indices.map(i => col(s"tb_$i").asc)
    val buckets = RangeCumSum.withRowNumber(sel, order, "__rn") { (ranked, n) =>
      if (n == 0) Array.empty[(Long, Double, Double, Long, Long)]
      else {
        // exact ntile(k): q = n/k rows per bucket, first r = n%k buckets get
        // one extra. Integer DIV keeps the boundary exact at any n.
        val q = n / k
        val r = n % k
        val gid =
          if (q == 0) col("__rn")
          else when(col("__rn") <= r * (q + 1),
              expr(s"CAST((__rn - 1) DIV ${q + 1} AS BIGINT) + 1"))
            .otherwise(expr(s"CAST((__rn - 1 - ${r * (q + 1)}) DIV $q AS BIGINT) + ${r + 1}"))
        ranked.withColumn("gid", gid)
          .groupBy(col("gid"))
          .agg(max(col("__rn")).as("max_rn"),
            sum(when(col("mm_t") === 0, col("mm_y")).otherwise(0.0)).as("sum0"),
            sum(when(col("mm_t") === 1, col("mm_y")).otherwise(0.0)).as("sum1"),
            sum(when(col("mm_t") === 0, 1L).otherwise(0L)).as("cnt0"),
            sum(when(col("mm_t") === 1, 1L).otherwise(0L)).as("cnt1"))
          .orderBy(col("gid"))
          .collect()
          .map(b => (b.getAs[Long]("max_rn"), b.getAs[Double]("sum0"),
            b.getAs[Double]("sum1"), b.getAs[Long]("cnt0"), b.getAs[Long]("cnt1")))
      }
    }
    if (buckets.isEmpty)
      return Seq.empty[(Double, Double, Double, Double, Double)]
        .toDF("ratio", "lift", "gain", "ate", "random_gain")
    val n = buckets.map(_._1).max.toDouble
    val totS0 = buckets.map(_._2).sum; val totS1 = buckets.map(_._3).sum
    val totC0 = buckets.map(_._4).sum; val totC1 = buckets.map(_._5).sum
    val ate = totS1 / totC1 - totS0 / totC0
    var s0 = 0.0; var s1 = 0.0; var c0 = 0L; var c1 = 0L
    val curve = buckets.map { case (maxRn, b0, b1, k0, k1) =>
      s0 += b0; s1 += b1; c0 += k0; c1 += k1
      val ratio = maxRn / n
      val lift = s1 / c1 - s0 / c0
      (ratio, lift, lift * ratio, ate, ate * ratio)
    }
    curve.toSeq.toDF("ratio", "lift", "gain", "ate", "random_gain")
  }

  /** Area under the uplift (gain) curve by trapezoid over the K buckets,
    * normalized against the random-targeting diagonal (uplift.py auuc). */
  def auuc(df: DataFrame, ite: Column, y: Column, treatment: Column,
           k: Int = 100): Double = {
    val curve = liftGain(df, ite, y, treatment, k)
      .select(col("ratio"), col("gain"), col("random_gain"))
      .collect()
      .sortBy(_.getDouble(0))
    var area = 0.0
    var prevR = 0.0; var prevG = 0.0
    curve.foreach { r =>
      val ratio = r.getDouble(0); val gain = r.getDouble(1)
      area += (gain + prevG) / 2.0 * (ratio - prevR)
      prevR = ratio; prevG = gain
    }
    area
  }

  /** BLP heterogeneity test (Chernozhukov, Demirer, Duflo & Fernández-Val
    * 2018, "Generic ML inference"): regress
    * y = α + β₁(t − p̂) + β₂(t − p̂)(τ̂ − mean τ̂) + ε.
    * β₁ estimates the ATE and β₂ is the Best-Linear-Predictor loading on
    * the CATE model's scores: β₂ ≈ 1 means τ̂ is CALIBRATED for
    * heterogeneity, and a significant β₂ certifies the model captured
    * real effect variation — the standard validation for any uplift /
    * CATE model (the GATES companion is [[graft.ops.UpliftEval]]'s
    * per-score-bucket ATE table). Assumes the randomized constant
    * propensity the fixture tables have; p̂ is estimated as mean(t).
    *
    * Two passes, constant state: ONE agg for (p̂, mean τ̂), then the
    * existing one-pass OLS aggregate. Rows with any null input drop
    * listwise (both passes see the same filter). Returns one row:
    * (n, ate_coef, ate_se, het_coef, het_se, het_t, het_p). */
  def blpTest(df: DataFrame, ite: Column, y: Column,
              treatment: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val td = treatment.cast("double"); val id = ite.cast("double")
    val complete = df.filter(id.isNotNull && y.cast("double").isNotNull &&
      td.isNotNull)
    val m0 = complete.agg(avg(td).as("p"), avg(id).as("mt")).head()
    require(!m0.isNullAt(0), "blp_test: no complete rows")
    val p = m0.getDouble(0); val mt = m0.getDouble(1)
    require(p > 0 && p < 1, s"blp_test: degenerate treatment share $p")
    val x1 = td - lit(p)
    val x2 = (td - lit(p)) * (id - lit(mt))
    val m = Regression.fitOls(complete, y, Seq(x1, x2))
    val s = m.summary
    Seq((s.n, s.coefficients(0), s.stderr(0), s.coefficients(1),
        s.stderr(1), s.t_values(1), s.p_values(1)))
      .toDF("n", "ate_coef", "ate_se", "het_coef", "het_se", "het_t",
        "het_p")
  }
}
