package graft.ops

import graft.agg.{KsResult, MannWhitneyResult}
import graft.stats.{Dist, TtestCommon}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed rank-based tests — the scale path for SURVEY §2b #7/#8.
  *
  * Unlike the reference's collect-all-samples aggregate states
  * (mann_whitney.h:60-68), these compute ranks with a shuffle-by-value
  * aggregation: group rows by distinct value (combining both samples), then
  * a two-phase range-partitioned cumulative sum ([[RangeCumSum]]) yields
  * global cumulative counts with full parallelism — O(distinct values)
  * state, no driver collection, no single-partition sort. The final
  * statistic reduces a handful of scalars. Identical math to
  * [[graft.agg.MannWhitneyAgg]] / [[graft.agg.KsAgg]] (verified in tests).
  */
object RankTests {

  /** Mann-Whitney U with average ranks + tie correction + normal approx. */
  def mannWhitneyU(df: DataFrame, value: Column, treatment: Column,
                   alternative: String = "two-sided",
                   continuityCorrection: Boolean = true): MannWhitneyResult = {
    val alt = TtestCommon.alternative(alternative)
    val byValue = df
      .filter(!isnan(value) && value.isNotNull && treatment.isNotNull)
      .select(value.cast("double").as("v"), treatment.cast("int").as("t"))
      .groupBy(col("v"))
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("t") === 0, 1L).otherwise(0L)).as("cnt0"))
    // avg rank of a tie-group = (left + right + 1)/2 with left = rows before,
    // right = rows through this group (1-based)
    val agg = RangeCumSum.withCumSums(byValue, Seq(col("v")), Seq("cnt")) { (cum, _) =>
      cum.withColumn("avgRank", (col("cum_cnt") - col("cnt") + col("cum_cnt") + 1) / 2.0)
        .agg(
          sum(col("cnt0") * col("avgRank")).as("r1"),
          sum(col("cnt")).as("n"),
          sum(col("cnt0")).as("n1"),
          sum(col("cnt") * col("cnt") * col("cnt") - col("cnt")).as("tieNum"),
          max(col("cnt")).as("maxTie")).head()
    }
    val r1 = agg.getAs[Double]("r1")
    val n = agg.getAs[Long]("n").toDouble
    val n1 = agg.getAs[Long]("n1").toDouble
    val n2 = n - n1
    if (n1 == 0 || n2 == 0 || agg.getAs[Long]("maxTie") == agg.getAs[Long]("n"))
      return MannWhitneyResult(Double.NaN, Double.NaN)
    val tieCorrection = 1.0 - agg.getAs[Long]("tieNum").toDouble / (n * n * n - n)
    val u1 = n1 * n2 + n1 * (n1 + 1.0) / 2.0 - r1
    val u2 = n1 * n2 - u1
    val meanrank = n1 * n2 / 2.0 + (if (continuityCorrection) 0.5 else 0.0)
    val sd = math.sqrt(tieCorrection * n1 * n2 * (n1 + n2 + 1) / 12.0)
    if (sd.isNaN || sd.isInfinite || math.abs(sd) < 1e-7) return MannWhitneyResult(u2, Double.NaN)
    val u = alt match {
      case TtestCommon.TwoSided => math.max(u1, u2)
      case TtestCommon.Less => u1
      case TtestCommon.Greater => u2
    }
    var z = (u - meanrank) / sd
    if (alt == TtestCommon.TwoSided) z = math.abs(z)
    val cdf = Dist.normCdf(z)
    val p = if (alt == TtestCommon.TwoSided) 2.0 - 2.0 * cdf else 1.0 - cdf
    MannWhitneyResult(u2, p)
  }

  /** Spearman rank correlation (with average-rank tie handling — the
    * same tie-group construction [[mannWhitneyU]] uses): the monotone-
    * association readout that survives outliers and nonlinearity where
    * Pearson's r (#33) does not. ρ = Pearson correlation of the
    * average ranks; inference via the Fieller-corrected Fisher
    * transform, z = atanh(ρ)·√((n−3)/1.06).
    *
    * 100 TB shape: per column, ONE groupBy to value tie-groups + the
    * RangeCumSum running count turns into average ranks (cell scale =
    * distinct values); the rank tables join back to the row frame on
    * the value key (ordinary shuffle joins — rank assignment is
    * inherently a shuffle), then ONE corr aggregate. Nothing ever sits
    * in a single partition. Returns one row: (n, rho, z, p_value). */
  def spearman(df: DataFrame, x: Column, y: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df
      .filter(x.isNotNull && y.isNotNull && !isnan(x.cast("double")) &&
        !isnan(y.cast("double")))
      .select(x.cast("double").as("__x"), y.cast("double").as("__y"))
    base.persist()
    try {
      // (value -> average rank) table for one column; checkpointed so it
      // survives the RangeCumSum scope (the KM idiom — cell-scale next
      // to the input)
      def ranks(c: String): DataFrame = {
        val byV = base.groupBy(col(c).as("__v"))
          .agg(count(lit(1)).as("cnt"))
        RangeCumSum.withCumSums(byV, Seq(col("__v")), Seq("cnt")) {
          (cum, _) =>
            cum.select(col("__v"),
                ((col("cum_cnt") - col("cnt") + col("cum_cnt") + 1) / 2.0)
                  .as(s"__r$c"))
              .transform(d => graft.Ckpt.register(d.localCheckpoint()))
        }
      }
      val rx = ranks("__x")
      val ry = ranks("__y")
      // moments instead of corr(): ANSI-mode corr raises DIVIDE_BY_ZERO
      // on a constant column before we can name the real problem
      val (cx, cy) = (col("__r__x"), col("__r__y"))
      val r = try base
        .join(rx, base("__x") === rx("__v")).drop("__v")
        .join(ry, base("__y") === ry("__v")).drop("__v")
        .agg(count(lit(1)).as("n"), sum(cx).as("sx"), sum(cy).as("sy"),
          sum(cx * cy).as("sxy"), sum(cx * cx).as("sxx"),
          sum(cy * cy).as("syy")).head()
      finally {
        // the rank tables are cell-scale but cells ≈ rows for a continuous
        // column; the output below is driver-built, so nothing downstream
        // can re-read them — release now instead of at the boundary sweep
        graft.Ckpt.release(rx); graft.Ckpt.release(ry)
      }
      val n = r.getAs[Long]("n")
      require(n >= 4, s"spearman: need at least 4 complete rows, got $n")
      val nd = n.toDouble
      def g(c: String): Double = r.getAs[Double](c)
      val vx = g("sxx") - g("sx") * g("sx") / nd
      val vy = g("syy") - g("sy") * g("sy") / nd
      require(vx > 0 && vy > 0,
        "spearman: a column is constant — rank correlation is undefined")
      val rho = (g("sxy") - g("sx") * g("sy") / nd) / math.sqrt(vx * vy)
      val z =
        if (math.abs(rho) >= 1.0) Double.PositiveInfinity * math.signum(rho)
        else 0.5 * math.log((1 + rho) / (1 - rho)) *
          math.sqrt((n - 3) / 1.06)
      val p =
        if (z.isInfinite) 0.0
        else 2.0 * (1.0 - graft.stats.Dist.normCdf(math.abs(z)))
      Seq((n, rho, z, p)).toDF("n", "rho", "z", "p_value")
    } finally {
      base.unpersist()
      ()
    }
  }

  /** Two-sample KS: D from windowed CDF difference; p-value via the same
    * method choice as the histogram aggregate (exact Schröer-Trenkler at
    * small n, asymptotic beyond), so the two paths agree at every n. */
  def ksTest(df: DataFrame, value: Column, treatment: Column,
             alternative: String = "two-sided",
             method: String = "auto"): KsResult = {
    val alt = TtestCommon.alternative(alternative)
    val byValue = df
      .filter(!isnan(value) && value.isNotNull && treatment.isNotNull)
      .select(value.cast("double").as("v"), treatment.cast("int").as("t"))
      .groupBy(col("v"))
      .agg(sum(when(col("t") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("t") =!= 0, 1L).otherwise(0L)).as("c1"))
    val (n1, n2, maxS, minS) =
      RangeCumSum.withCumSums(byValue, Seq(col("v")), Seq("c0", "c1")) { (cum, totals) =>
        val tn1 = totals("c0").toLong
        val tn2 = totals("c1").toLong
        if (tn1 == 0 || tn2 == 0) (tn1, tn2, Double.NaN, Double.NaN)
        else {
          val mm = cum
            .withColumn("s", col("cum_c0") / lit(tn1.toDouble) -
              col("cum_c1") / lit(tn2.toDouble))
            .agg(max(col("s")).as("maxS"), min(col("s")).as("minS")).head()
          (tn1, tn2, mm.getAs[Double]("maxS"), mm.getAs[Double]("minS"))
        }
      }
    if (n1 == 0 || n2 == 0) return KsResult(Double.NaN, Double.NaN)
    val d = alt match {
      case TtestCommon.TwoSided => math.max(math.abs(maxS), math.abs(minS))
      case TtestCommon.Greater => maxS
      case TtestCommon.Less => -minS
    }
    // shared method-choice with the histogram aggregate: exact recursion at
    // small n, asymptotic beyond — the two paths report identical p-values
    KsResult(d, graft.agg.KsMath.pValue(d, n1, n2, alt, method))
  }

  /** Two-sample 1-Wasserstein (earth-mover's) distance:
    * W₁ = ∫ |F₀(v) − F₁(v)| dv — the magnitude of distribution shift in
    * the metric's own units (KS gives the worst-case gap, W₁ the total
    * transport). The monitoring statistic for data drift between corpus
    * snapshots or experiment arms.
    *
    * Same ECDF machinery as [[ksTest]] (value-keyed groupBy +
    * [[RangeCumSum]]), plus the step widths: each distinct value needs the
    * NEXT distinct value, which a partition-local `lead` supplies
    * everywhere except each range partition's last row — those few rows
    * get their successor from the collected per-partition first values
    * (P scalars on the driver, not data). No global-order window. */
  def wasserstein1(df: DataFrame, value: Column, treatment: Column): Double = {
    val byValue = df
      .filter(!isnan(value) && value.isNotNull && treatment.isNotNull)
      .select(value.cast("double").as("v"), treatment.cast("int").as("t"))
      .groupBy(col("v"))
      .agg(sum(when(col("t") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("t") =!= 0, 1L).otherwise(0L)).as("c1"))
    RangeCumSum.withCumSums(byValue, Seq(col("v")), Seq("c0", "c1")) { (cum, totals) =>
      val tn0 = totals("c0"); val tn1 = totals("c1")
      if (tn0 == 0 || tn1 == 0) Double.NaN
      else {
        val firstV = cum.groupBy(col("__pid")).agg(min(col("v")).as("fv"))
          .collect().map(r => r.getInt(0) -> r.getDouble(1)).toSeq.sortBy(_._1)
        // successor of partition p's last row = first v of the next
        // non-empty partition (the global last row has none -> dv null -> 0)
        val boundary: Map[Int, Double] =
          firstV.zip(firstV.drop(1)).map { case ((p, _), (_, nv)) => p -> nv }.toMap
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("__pid")).orderBy(col("v"))
        val nextV =
          if (boundary.isEmpty) lead(col("v"), 1).over(w)
          else coalesce(lead(col("v"), 1).over(w),
            element_at(typedlit(boundary), col("__pid")))
        val gap = abs(col("cum_c0") / lit(tn0) - col("cum_c1") / lit(tn1))
        val r = cum.withColumn("__nv", nextV)
          .select(sum(gap * (col("__nv") - col("v"))).as("w1")).head()
        if (r.isNullAt(0)) 0.0 else r.getDouble(0)
      }
    }
  }
}
