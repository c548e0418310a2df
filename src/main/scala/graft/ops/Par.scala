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
    * keyed work), round-robin otherwise. */
  def ensure(df: DataFrame, keys: Seq[Column] = Seq.empty): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }
}
