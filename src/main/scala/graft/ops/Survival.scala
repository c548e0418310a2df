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
}
