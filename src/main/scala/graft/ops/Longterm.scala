package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Long-term effect via surrogate-index recursive forecasting (reference
  * calcite RecursiveForcasting.java:1-184; python longterm.py:11-290).
  *
  * Data layout: one row per unit, surrogate columns repeated per period
  * (`s1_p0, s2_p0, s1_p1, s2_p1, …`). For each transition t→t+1 in the
  * training window, fit OLS of each period-(t+1) surrogate on the period-t
  * surrogate vector; to forecast, roll the fitted transition forward from
  * the last observed period, then estimate the treatment effect on the
  * forecast index per predicted period.
  *
  * Every fit is a single aggregate pass; every roll-forward step is a
  * codegen'd column expression (coefficients are literals), so forecasting
  * T periods ahead costs T extra column expressions on one scan — no joins,
  * no materialized intermediate tables (the reference materializes temp
  * tables per step).
  */
object Longterm {

  /** One fitted transition: models(j) predicts surrogate j of period t+1
    * from all surrogates of period t. */
  case class Transition(models: Seq[OlsModel])

  case class LongtermResult(
      /** per forecast period: diff-in-means effect of `treatment` on the
        * forecast outcome (surrogate 0 = the outcome surrogate by
        * convention, longterm.py:239-279) */
      effects: Seq[Bootstrap.EffectEstimate],
      transition: Transition)

  /** Fit the pooled transition on the training periods (the reference fits
    * one model pooled over all adjacent training pairs). */
  def fitTransition(df: DataFrame, surrogates: Seq[Seq[Column]]): Transition = {
    require(surrogates.length >= 2, "need at least 2 training periods")
    val k = surrogates.head.length
    // pool adjacent (t, t+1) pairs by stacking: union of per-pair frames
    val pairs = surrogates.sliding(2).toSeq
    val stacked = pairs.map { case Seq(from, to) =>
      df.select((from.zipWithIndex.map { case (c, i) => c.cast("double").as(s"__f$i") } ++
        to.zipWithIndex.map { case (c, i) => c.cast("double").as(s"__t$i") }): _*)
    }.reduce(_ unionByName _)
    val fromCols = (0 until k).map(i => col(s"__f$i"))
    val models = (0 until k).map { j =>
      Regression.fitOls(stacked, col(s"__t$j"), fromCols)
    }
    Transition(models)
  }

  /** Roll the transition forward from `current` surrogate columns, returning
    * the next period's predicted surrogate columns. */
  def step(tr: Transition, current: Seq[Column]): Seq[Column] =
    tr.models.map(m => Regression.predict(m, current))

  /** Recursive forecast + effect per future period.
    * @param surrogates  observed periods, outer = period, inner = surrogate
    *                    columns (same order every period; index 0 = outcome)
    * @param horizon     number of future periods to forecast
    */
  def recursiveForecast(df: DataFrame, surrogates: Seq[Seq[Column]],
                        treatment: Column, horizon: Int,
                        bootstrapB: Int = 200, seed: Long = 42L): LongtermResult = {
    val tr = fitTransition(df, surrogates)
    var cur = surrogates.last
    val effects = (1 to horizon).map { h =>
      cur = step(tr, cur)
      val outcome = cur.head
      Bootstrap.ateEstimator(df.withColumn("__fc", outcome),
        col("__fc"), treatment, b = bootstrapB, seed = seed + h)
    }
    LongtermResult(effects, tr)
  }
}
