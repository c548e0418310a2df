package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Kaplan–Meier survival curve (reference `lib/survival.py:10-62`
  * `kaplan_meier`: per-time death counts, at-risk by cumulative subtraction,
  * survival as the cumulative product of 1 − d/r — that legacy module also
  * drops censored subjects from the risk set and ships a broken f-string;
  * here the textbook estimator: censored subjects leave the risk set only
  * AFTER their censoring time).
  *
  * 100 TB shape: one groupBy collapses subjects to one row per distinct
  * time, then both running quantities (at-risk and the log-survival sum)
  * ride [[RangeCumSum]] — range-partitioned two-phase prefix sums, so no
  * single-partition global window at any row count. The cumulative PRODUCT
  * is exp of the running sum of ln(1 − d/r): d = r can only happen at the
  * last event time (nobody remains at risk afterwards), where the explicit
  * −∞ branch makes exp() an exact 0 instead of ln(0) = NULL.
  */
object Survival {

  /** One row per distinct `time`, ascending:
    * (time, n_risk, n_event, n_censored, survival).
    *
    * @param event 1 = event observed, 0 = right-censored at `time`
    *              (survival.py's `censor_col` convention); default: nobody
    *              censored. Rows with a null time or event are dropped.
    */
  def kaplanMeier(df: DataFrame, time: Column,
                  event: Column = lit(1)): DataFrame = {
    val g = df.filter(time.isNotNull && event.isNotNull)
      .groupBy(time.as("time"))
      .agg(sum(when(event.cast("int") === 1, 1L).otherwise(0L)).as("n_event"),
        count(lit(1)).as("n_total"))
    RangeCumSum.withCumSums(g, Seq(col("time")), Seq("n_total")) { (cum, totals) =>
      // at risk at t = subjects whose time is >= t: grand total minus all
      // subjects who exited strictly before t (exclusive running count)
      val atRisk = (lit(totals("n_total")) -
        (col("cum_n_total") - col("n_total"))).cast("long")
      val withLog = cum.withColumn("n_risk", atRisk)
        .withColumn("__lt",
          when(col("n_event") === col("n_risk"), lit(Double.NegativeInfinity))
            .otherwise(log(lit(1.0) - col("n_event") / col("n_risk"))))
      RangeCumSum.withCumSums(withLog, Seq(col("time")), Seq("__lt")) { (cum2, _) =>
        // localCheckpoint: both RangeCumSum frames unpersist when these
        // scopes exit, and the result here is |distinct times| rows — tiny
        // next to the input — so materializing severs the lineage safely
        cum2.select(col("time"), col("n_risk"), col("n_event"),
            (col("n_total") - col("n_event")).as("n_censored"),
            exp(col("cum___lt")).as("survival"))
          .localCheckpoint()
      }
    }
  }

  /** Per-group Kaplan–Meier curves (one call, ALL groups): one row per
    * distinct (group, time), ascending within group.
    *
    * Both running quantities still ride the global [[RangeCumSum]] — sorted
    * by (group, time), so each group's rows are contiguous in the range
    * order — and become per-group prefix sums by subtracting the group's
    * leading offset (the exclusive prefix at its first time, captured with
    * one `min(struct(time, prefix))` aggregate and broadcast back; group
    * cardinality is experiment-arm-sized). No per-group window over row
    * data, no driver loop over groups.
    *
    * The d = r terminal branch (only possible at a group's LAST time —
    * nobody remains at risk afterwards) contributes 0 to the running sum
    * and pins its own survival to an exact 0.0 instead: a −∞ term would
    * make the NEXT group's offset subtraction NaN (−∞ − −∞), and any
    * finite sentinel large enough to underflow exp() bleeds ~1e-10 of
    * absorption error into every later group's curve. */
  def kaplanMeierBy(df: DataFrame, group: Column, time: Column,
                    event: Column = lit(1)): DataFrame = {
    val g = df.filter(time.isNotNull && event.isNotNull && group.isNotNull)
      .groupBy(group.as("group"), time.as("time"))
      .agg(sum(when(event.cast("int") === 1, 1L).otherwise(0L)).as("n_event"),
        count(lit(1)).as("n_total"))
    RangeCumSum.withCumSums(g, Seq(col("group"), col("time")),
        Seq("n_total")) { (cum, _) =>
      val pre = col("cum_n_total") - col("n_total") // exclusive global prefix
      val offs = cum.groupBy(col("group")).agg(
        sum(col("n_total")).cast("double").as("__grp_total"),
        min(struct(col("time"), pre.as("v"))).getField("v").as("__grp_off"))
      val j = cum.join(broadcast(offs), "group")
      val atRisk = (col("__grp_total") + col("__grp_off") -
        (col("cum_n_total") - col("n_total"))).cast("long")
      val withLog = j.withColumn("n_risk", atRisk)
        .withColumn("__lt",
          when(col("n_event") === col("n_risk"), lit(0.0))
            .otherwise(log(lit(1.0) - col("n_event") / col("n_risk"))))
        .select(col("group"), col("time"), col("n_risk"), col("n_event"),
          col("n_total"), col("__lt"))
      RangeCumSum.withCumSums(withLog, Seq(col("group"), col("time")),
          Seq("__lt")) { (cum2, _) =>
        val pre2 = col("cum___lt") - col("__lt")
        val offs2 = cum2.groupBy(col("group")).agg(
          min(struct(col("time"), pre2.as("v"))).getField("v").as("__lt_off"))
        cum2.join(broadcast(offs2), "group")
          .select(col("group"), col("time"), col("n_risk"), col("n_event"),
            (col("n_total") - col("n_event")).as("n_censored"),
            when(col("n_event") === col("n_risk"), lit(0.0))
              .otherwise(exp(col("cum___lt") - col("__lt_off"))).as("survival"))
          .localCheckpoint()
      }
    }
  }

  /** Two-sample log-rank test (Mantel–Cox) for group ∈ {0, 1}: at each
    * pooled event time, O₁ = d₁, E₁ = d·n₁/n, V = d·(n₁/n)·(n₀/n)·(n−d)/(n−1);
    * χ² = (ΣO₁ − ΣE₁)²/ΣV against χ²(1). The companion hypothesis test to
    * [[kaplanMeierBy]] (not in the reference, whose survival module stops
    * at the single curve).
    *
    * One groupBy collapses rows to distinct times, ONE [[RangeCumSum]] pass
    * carries both groups' at-risk counts, and the test statistic is a
    * 3-scalar aggregate — constant driver state at any row count. */
  def logRankTest(df: DataFrame, group: Column, time: Column,
                  event: Column = lit(1)): DataFrame = {
    val spark = df.sparkSession
    val src = df.filter(time.isNotNull && event.isNotNull && group.isNotNull)
      .select(group.cast("int").as("grp"), time.as("time"),
        event.cast("int").as("ev"))
    val per = src.groupBy(col("time")).agg(
      sum(when(col("grp") === 1, col("ev")).otherwise(0)).cast("double").as("d1"),
      sum(when(col("grp") === 0, col("ev")).otherwise(0)).cast("double").as("d0"),
      sum(when(col("grp") === 1, 1).otherwise(0)).as("x1"),
      sum(when(col("grp") === 0, 1).otherwise(0)).as("x0"))
    val (o1, e1s, vs) = RangeCumSum.withCumSums(per, Seq(col("time")),
        Seq("x1", "x0")) { (cum, tot) =>
      val n1 = lit(tot("x1")) - (col("cum_x1") - col("x1"))
      val n0 = lit(tot("x0")) - (col("cum_x0") - col("x0"))
      val n = n1 + n0
      val d = col("d1") + col("d0")
      val e1 = d * n1 / n
      val v = when(n > 1.0, d * (n1 / n) * (n0 / n) * (n - d) / (n - 1.0))
        .otherwise(lit(0.0))
      val r = cum.filter(d > 0)
        .agg(sum(col("d1")).as("o1"), sum(e1).as("e1"), sum(v).as("v")).head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    }
    require(vs > 0.0,
      "log_rank_test: zero variance (a group has no subjects at risk at any event time)")
    val chi2 = (o1 - e1s) * (o1 - e1s) / vs
    val p = 1.0 - graft.stats.Dist.chiSqCdf(chi2, 1.0)
    import spark.implicits._
    Seq((o1, e1s, vs, chi2, p))
      .toDF("observed1", "expected1", "variance", "chi2", "p_value")
  }
}
