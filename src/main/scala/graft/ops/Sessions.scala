package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: split each key's ordered event stream into
  * sessions wherever the inter-event gap exceeds `gapSeconds` (the batch
  * twin of [[graft.streaming.StreamOps.sessionize]], which does the same
  * with `flatMapGroupsWithState`).
  *
  * The 100 TB shape: ONE shuffle, by the session key — the window sort is
  * per-key within its partition (Spark sorts each partition's key groups,
  * never a global sort), and the follow-up per-session aggregate reuses the
  * same hash partitioning, so `assign` → `stats` is shuffle-once. Session
  * boundaries are order-tie-safe: equal timestamps have gap 0 ≤ any
  * positive `gapSeconds`, so tie order can never open a new session and
  * membership is deterministic even with duplicate timestamps. A single
  * hyper-active key is the one skew risk; AQE's skew-split cannot break an
  * ORDER-dependent window, so cap such keys upstream (they are bots at
  * training-corpus scale anyway).
  *
  * `ts` must be numeric (epoch nanos the way the driver reads parquet
  * timestamps, epoch millis, whatever) — `tsUnitPerSecond` says how many
  * ticks make a second (1e9 for nanos). Rows with a null key or timestamp
  * are dropped: no order, no session.
  */
object Sessions {

  /** Adds `session_id` (per-key ordinal, 1-based, in time order). */
  def assign(df: DataFrame, key: Column, ts: Column, gapSeconds: Double,
             tsUnitPerSecond: Double = 1e9): DataFrame = {
    require(gapSeconds > 0, "gapSeconds must be positive")
    // Order and lag in the ts column's NATIVE numeric type — epoch nanos
    // exceed double's 2^53 mantissa, so a double cast would quantize to
    // ~256 ns (the pitfall AsofJoin documents). Only the gap DIFFERENCE is
    // cast, and a difference of nearby ticks is small enough to be exact.
    val w = Window.partitionBy(key).orderBy(ts)
    val gapTicks = gapSeconds * tsUnitPerSecond
    val prev = lag(ts, 1).over(w)
    val newSession =
      when(prev.isNull || (ts - prev).cast("double") > gapTicks, 1L).otherwise(0L)
    df.filter(key.isNotNull && ts.isNotNull)
      .withColumn("session_id",
        sum(newSession).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session stats over an assigned frame: event count, duration in
    * seconds, and the sum of `value` (pass `lit(0)` to skip). Groups on the
    * same (key, session_id) the window just partitioned by, so with
    * `assign` this is one shuffle total. */
  def stats(assigned: DataFrame, key: Column, ts: Column, value: Column,
            tsUnitPerSecond: Double = 1e9): DataFrame =
    assigned.groupBy(key.as("key"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        ((max(ts) - min(ts)).cast("double") / tsUnitPerSecond)
          .as("duration_sec"),
        sum(value.cast("double")).as("sum_value"))
}
