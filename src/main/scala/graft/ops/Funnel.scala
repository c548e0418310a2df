package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-analytics verbs over event logs: ordered funnels and cohort
  * retention — the two queries every experimentation platform runs next
  * to its tests, absent from the reference (whose engine ships them as
  * ClickHouse builtins the causal SDK never surfaces).
  *
  * Both are pure closed forms over conditional aggregates — no
  * sequence-matching state, no per-user event buffers — so every output
  * replays in plain SQL and the plans are a handful of keyed shuffles on
  * the user id no matter the row count.
  */
object Funnel {

  /** Ordered funnel with sequential-first-match semantics: the anchor is
    * the user's FIRST step-1 event; step i (i ≥ 2) matches the user's
    * earliest step-i event STRICTLY after their step-(i−1) time and
    * within `window` of the anchor. `ts` and `window` share one unit —
    * epoch seconds for timestamp columns (Spark's numeric cast), whatever
    * the caller's unit for numeric columns.
    *
    * Scale shape: one pass filters the log to funnel-step events only
    * (tiny for real funnels); each step is then ONE conditional aggregate
    * keyed by user joined to the shrinking per-user state frame — k−1
    * keyed shuffles for a k-step funnel, nothing collected, no per-user
    * event lists. Returns one row per step:
    * (step, event, n_users, pct_of_first, pct_of_prev). */
  def funnel(df: DataFrame, user: Column, ts: Column, event: Column,
             steps: Seq[String], window: Double): DataFrame = {
    require(steps.length >= 2, "funnel: need at least 2 steps")
    require(steps.distinct.length == steps.length,
      "funnel: repeated step events are ambiguous under first-match semantics")
    require(window > 0, "funnel: window must be positive")
    // the step NAME collapses to its ordinal before the checkpoint: the
    // materialized frame is 3 fixed-width columns (24 B/row vs a string
    // per row — at 100M events that halving is the difference between
    // fitting the storage pool and starving execution memory of it)
    val stepIx = steps.zipWithIndex
      .map { case (s, i) => (lit(s), lit(i)) }
    val ev = df
      .filter(user.isNotNull && ts.isNotNull && event.isNotNull &&
        event.isin(steps: _*))
      .select(user.cast("long").as("u"), ts.cast("double").as("t"),
        stepIx.foldRight(lit(-1): Column) { case ((s, i), acc) =>
          when(event.cast("string") === s, i).otherwise(acc) }.as("e"))
      // every step re-reads this slim projection; materialize once
      .localCheckpoint(false)
    val counts = Array.fill(steps.length)(0L)
    try {
      var state = ev.filter(col("e") === 0)
        .groupBy(col("u")).agg(min(col("t")).as("t1"))
      counts(0) = state.count()
      for (i <- 1 until steps.length) {
        val prev = s"t$i"
        val curr = s"t${i + 1}"
        // state has exactly ONE row per user, so prior step times are
        // functionally dependent on u — group by u alone (narrow keys)
        // and carry them through with max()
        val aggs = (1 to i).map(j => max(col(s"t$j")).as(s"t$j")) :+
          min(col("t")).as(curr)
        state = ev.filter(col("e") === i)
          .join(state, "u")
          .filter(col("t") > col(prev) && col("t") <= col("t1") + window)
          .groupBy(col("u"))
          .agg(aggs.head, aggs.tail: _*)
        // one count per step: the state frame only shrinks, and funnels
        // have a handful of steps — k−1 small actions, not row-scale work
        counts(i) = state.count()
      }
    } finally {
      // the returned frame is driver-built from `counts` — the event
      // checkpoint is dead the moment the loop exits
      graft.Ckpt.release(ev)
    }
    import df.sparkSession.implicits._
    steps.zipWithIndex.map { case (e, i) =>
      val first = counts(0)
      val prev = if (i == 0) counts(0) else counts(i - 1)
      (i + 1, e, counts(i),
        if (first == 0) 0.0 else counts(i).toDouble / first,
        if (prev == 0) 0.0 else counts(i).toDouble / prev)
    }.toDF("step", "event", "n_users", "pct_of_first", "pct_of_prev")
  }

  /** Cohort retention matrix: cohort = the period (floor(ts/bucketLen))
    * of the user's first event; a user is retained at offset d if they
    * have ANY event in period cohort+d. One aggregate finds first-seen
    * periods, one distinct collapses (user, period), one join + count
    * builds the matrix — all keyed on the user id. Returns
    * (cohort, offset, n_users, retention) with retention relative to the
    * cohort's size (offset 0 row = 1.0 by construction). */
  def retentionMatrix(df: DataFrame, user: Column, ts: Column,
                      bucketLen: Double): DataFrame = {
    require(bucketLen > 0, "retention: bucketLen must be positive")
    val ev0 = df.filter(user.isNotNull && ts.isNotNull)
      .select(user.cast("long").as("u"),
        floor(ts.cast("double") / bucketLen).cast("long").as("p"))
      .distinct()
    val ev = graft.Ckpt.checkpoint(ev0)
    val firstSeen = ev.groupBy(col("u")).agg(min(col("p")).as("cohort"))
    val sizes = firstSeen.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    ev.join(firstSeen, "u")
      .groupBy(col("cohort"), (col("p") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_users"))
      // no broadcast hint: cohort count is usually report-sized (AQE will
      // broadcast it) but is unbounded for tiny bucketLen over long
      // horizons — let the runtime stats decide instead of forcing it
      .join(sizes, "cohort")
      .select(col("cohort"), col("offset"), col("n_users"),
        (col("n_users").cast("double") / col("cohort_size")).as("retention"))
  }
}
