package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Staggered-adoption event study: Callaway & Sant'Anna (2021) group-time
  * average treatment effects with a never-treated comparison, in the
  * unconditional (no-covariate) form. Units first treated at period g form
  * cohort g; for any period t,
  *
  *   ATT(g, t) = [ȳ(g, t) − ȳ(g, g−1)] − [ȳ(C, t) − ȳ(C, g−1)]
  *
  * — each term a cohort-level mean, so every output replays as plain SQL
  * over the (cohort × period) cell means (no pinning, no iteration). Rows
  * with t < g are PRE-period placebo estimates: under parallel trends
  * they should sit near 0, which is exactly the diagnostic an event-study
  * plot shows. This avoids the negative-weighting bias of a two-way
  * fixed-effects regression under staggered adoption — the reference's
  * [[Regression.did]] covers only the single-adoption 2×2.
  *
  * 100 TB shape: ONE row-scale aggregate collapses everything to cohort ×
  * period mean cells; the ATT table is four broadcast self-joins of that
  * tiny cell frame — no second pass over the data, nothing row-scale on
  * the driver (only the distinct cohort/period KEY SETS are collected,
  * take-ordered-guarded, to validate the grid before the plan is built).
  *
  * Semantics expect one row per (unit, period) — aggregate an event log
  * to that grain first; with multiple rows the cell means are row-, not
  * unit-, weighted. Every treated cohort needs its base period g−1 and
  * the never-treated cohort observed at g−1 and t (missing cells fail
  * fast by inner-join disappearance being PREVENTED: validated up front).
  */
object EventStudy {

  /** @param firstTreat cohort column: the unit's first treated period;
    *                   null or <= 0 marks never-treated (the comparison).
    * Returns (cohort, period, event_time, is_pre, att, n_rows) for every
    * treated cohort × period except the cohort's own base period, with
    * n_rows = the treated cohort's cell row count at t. */
  def groupTimeAtt(df: DataFrame, firstTreat: Column, period: Column,
                   y: Column, maxCells: Int = 100000): DataFrame = {
    val yd = y.cast("double")
    val base = df.filter(period.isNotNull && yd.isNotNull)
      .select(coalesce(firstTreat.cast("long"), lit(0L)).as("__g0"),
        period.cast("long").as("period"), yd.as("__y"))
      .withColumn("cohort", when(col("__g0") > 0, col("__g0")).otherwise(0L))
    // localCheckpoint: the four self-joins below would otherwise each
    // re-derive the cells — FOUR full scans of the row-scale input; the
    // checkpointed cell frame is (cohorts × periods) rows, so the big
    // scan happens exactly once
    val cells = base.groupBy(col("cohort"), col("period"))
      .agg(avg(col("__y")).as("m"), count(lit(1)).as("n_rows"))
      .localCheckpoint()
    // validate the grid on the KEYS only (tiny, guarded) so a missing
    // base/comparison cell is a named error, not silently-dropped rows
    val keys = cells.select(col("cohort"), col("period"))
      .limit(maxCells + 1).collect()
    require(keys.length <= maxCells,
      s"event_study produced more than $maxCells (cohort x period) cells — " +
        "these are not panel cohorts/periods; raise maxCells if they are")
    val byCohort = keys.groupBy(_.getLong(0))
      .map { case (g, rs) => g -> rs.map(_.getLong(1)).toSet }
    require(byCohort.contains(0L),
      "event_study: no never-treated cohort (firstTreat null or <= 0) to compare against")
    val treated = byCohort.keys.filter(_ > 0L).toSeq.sorted
    require(treated.nonEmpty, "event_study: no treated cohort")
    val ctrl = byCohort(0L)
    treated.foreach { g =>
      require(byCohort(g).contains(g - 1),
        s"event_study: cohort $g is missing its base period ${g - 1}")
      require(ctrl.contains(g - 1),
        s"event_study: never-treated cohort missing period ${g - 1} " +
          s"(cohort $g's base)")
      byCohort(g).foreach(t => require(ctrl.contains(t),
        s"event_study: never-treated cohort missing period $t"))
    }
    // four broadcast self-joins of the cell frame — the SQL closed form
    val gCell = cells.filter(col("cohort") > 0)
      .select(col("cohort"), col("period"), col("m").as("__mg"),
        col("n_rows"))
    val gBase = cells.select(col("cohort"), (col("period") + 1).as("__bg"),
      col("m").as("__mgb"))
    val cCell = cells.filter(col("cohort") === 0)
      .select(col("period"), col("m").as("__mc"))
    val cBase = cells.filter(col("cohort") === 0)
      .select((col("period") + 1).as("__bc"), col("m").as("__mcb"))
    gCell
      .join(broadcast(gBase), gCell("cohort") === gBase("cohort") &&
        gCell("cohort") === col("__bg"))
      .drop(gBase("cohort")).drop("__bg")
      .join(broadcast(cCell), Seq("period"))
      .join(broadcast(cBase), col("cohort") === col("__bc"))
      .drop("__bc")
      .filter(col("period") =!= col("cohort") - 1)
      .select(col("cohort"), col("period"),
        (col("period") - col("cohort")).as("event_time"),
        (col("period") < col("cohort")).as("is_pre"),
        ((col("__mg") - col("__mgb")) - (col("__mc") - col("__mcb"))).as("att"),
        col("n_rows"))
  }

  /** Event-time aggregation of [[groupTimeAtt]]: the classic event-study
    * curve — at each event time e, the cohort-size-weighted mean of
    * ATT(g, g+e) over cohorts observed at e. Returns
    * (event_time, is_pre, att, n_cohorts, n_rows). */
  def eventTimeCurve(df: DataFrame, firstTreat: Column, period: Column,
                     y: Column, maxCells: Int = 100000): DataFrame =
    groupTimeAtt(df, firstTreat, period, y, maxCells)
      .groupBy(col("event_time"), col("is_pre"))
      .agg((sum(col("att") * col("n_rows")) / sum(col("n_rows"))).as("att"),
        count(lit(1)).as("n_cohorts"), sum(col("n_rows")).as("n_rows"))
}
