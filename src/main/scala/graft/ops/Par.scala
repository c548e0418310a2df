package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

/** Input-parallelism guard for operators whose per-row work is AMPLIFIED
  * (B× bootstrap replicates, T× tree memberships, k× hash signatures) or
  * ITERATED (IRLS passes, per-level forest scans).
  *
  * Such work runs at the INPUT partition count — and a single-row-group
  * parquet file scans as ONE partition no matter how many cores exist, so
  * the whole amplified pipeline can serialize on one thread. A narrow O(n)
  * repartition of the un-amplified rows unlocks full parallelism; on any
  * input that already has enough splits (the many-file 100 TB case) this
  * is a no-op, so it never adds a shuffle where scale already provides
  * parallelism. Plain single-pass aggregates do NOT use this: shuffling n
  * rows to aggregate n rows once is no cheaper than aggregating in place.
  */
object Par {
  /** Repartition `df` to the session default parallelism when it has fewer
    * partitions — by hash of `keys` when given (co-locates downstream
    * keyed work), round-robin otherwise.
    *
    * Partition count comes from `queryExecution.toRdd` — the memoized
    * internal-row RDD of the plan the action will actually run — not
    * `df.rdd`, which builds a SEPARATE deserializing physical plan on
    * every call just to be counted. Callers that already know the
    * input's partition count (e.g. a loop re-scoring the same cached
    * frame) pass it via `knownPartitions` and skip planning entirely. */
  def ensure(df: DataFrame, keys: Seq[Column] = Seq.empty,
             knownPartitions: Int = -1): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    val current =
      if (knownPartitions >= 0) knownPartitions
      else df.queryExecution.toRdd.getNumPartitions
    if (current >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }
}
