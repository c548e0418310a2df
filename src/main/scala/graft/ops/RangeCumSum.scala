package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed prefix sums over a global order WITHOUT a single-partition
  * window (the `Window.orderBy(...)` scale-killer: Spark moves the whole
  * table to one partition).
  *
  * Two-phase cumulative sum: range-repartition on the order key so partition
  * i holds smaller keys than partition i+1, aggregate one row per partition
  * (a P-row collect), turn those into exclusive per-partition offsets, then
  * run the window PARTITIONED by the physical partition id — every partition
  * sorts only its own range, full parallelism — and add the offset.
  * Deterministic on any input layout: range boundaries come from Spark's
  * deterministic range partitioner and ties on the order key stay in one
  * partition.
  */
object RangeCumSum {

  /** Runs `f` on `df` extended with `cum_<name>` columns (running DOUBLE sum
    * of each `sumCols` entry in ascending `order`, inclusive of the current
    * row) plus per-column grand totals. The repartitioned input is persisted
    * for the two passes and unpersisted after `f` returns, so `f` must
    * materialize everything it needs (all callers here reduce to scalars).
    */
  def withCumSums[T](df: DataFrame, order: Seq[Column], sumCols: Seq[String],
                     partitions: Int = 0)
                    (f: (DataFrame, Map[String, Double]) => T): T = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(p, order: _*)
      .withColumn("__pid", spark_partition_id())
    parted.persist()
    try {
      val perPart = parted.groupBy(col("__pid"))
        .agg(sum(col(sumCols.head)).cast("double").as(sumCols.head),
          sumCols.tail.map(c => sum(col(c)).cast("double").as(c)): _*)
        .collect()
        .sortBy(_.getInt(0))
      val running = Array.fill(sumCols.length)(0.0)
      val offsets = perPart.map { r =>
        val o = r.getInt(0) -> running.clone()
        sumCols.indices.foreach { i =>
          if (!r.isNullAt(i + 1)) running(i) += r.getDouble(i + 1)
        }
        o
      }.toMap
      val totals = sumCols.zipWithIndex.map { case (c, i) => c -> running(i) }.toMap
      val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = sumCols.zipWithIndex.foldLeft(parted) { case (d, (c, i)) =>
        val offMap = typedlit(offsets.map { case (pid, v) => pid -> v(i) })
        d.withColumn(s"cum_$c",
          sum(col(c).cast("double")).over(w) +
            coalesce(element_at(offMap, col("__pid")), lit(0.0)))
      }
      f(cum, totals)
    } finally {
      parted.unpersist()
      ()
    }
  }

  /** Globally-ordered row number with the same two-phase construction, but
    * NO second shuffle: range-repartition + sortWithinPartitions puts rows
    * in global order across partitions, `monotonically_increasing_id` (pid
    * << 33 | local index, assigned in iteration order after the sort, and
    * non-deterministic so Catalyst cannot push it below the Sort) encodes
    * the local rank arithmetically, and the collected per-partition counts
    * splice the partitions together. Runs `f` on (frame with `rnCol`
    * 1-based, total row count).
    */
  def withRowNumber[T](df: DataFrame, order: Seq[Column], rnCol: String,
                       partitions: Int = 0)(f: (DataFrame, Long) => T): T = {
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val parted = df.repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33).cast("int"))
    parted.persist()
    try {
      val perPart = parted.groupBy(col("__pid")).agg(count(lit(1)).as("c"))
        .collect().sortBy(_.getInt(0))
      var running = 0L
      val offsets = perPart.map { r =>
        val o = r.getInt(0) -> running
        running += r.getLong(1)
        o
      }.toMap
      val out = parted.withColumn(rnCol,
        col("__mid").bitwiseAND(lit((1L << 33) - 1)) + lit(1L) +
          coalesce(element_at(typedlit(offsets), col("__pid")), lit(0L)))
      f(out, running)
    } finally {
      parted.unpersist()
      ()
    }
  }
}
