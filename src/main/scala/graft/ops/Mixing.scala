package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus-mixture construction for training-data pipelines: sample each
  * stratum (language, source, domain ...) down to a TOKEN budget rather
  * than a document count — the unit a training mixture is actually
  * specified in.
  *
  * Documents are taken in deterministic `orderKey` order (pass a hash for
  * a uniform random-but-reproducible sample; the caller chooses the hash
  * so an external oracle can replay it) and a stratum stops accepting
  * once its running token total reaches the budget. The document that
  * crosses the budget is KEPT: every positive budget yields at least one
  * document and ends within one document of the target. Strata without a
  * budget entry are dropped — the mixture is the explicit contract.
  *
  * 100 TB shape: ONE exchange — a range repartition on
  * (stratum, orderKey) — then the same two-phase prefix sum as
  * [[RangeCumSum]], but grouped: the driver sees one row per
  * (partition, stratum) cell (O(P × strata), and mixtures have tens of
  * strata), offsets go back as a broadcast literal map, and the cumsum
  * window partitions by (physical partition, stratum) so no stratum ever
  * sorts inside a single task — the scale trap of
  * `Window.partitionBy(stratum)`.
  *
  * Like RangeCumSum, runs `f` over the sampled frame while the shuffled
  * input is persisted (the offsets collect and the output are two passes
  * over the same exchange), so `f` must materialize what it needs.
  */
object Mixing {
  def tokenBudgetSample[T](df: DataFrame, stratum: Column, tokens: Column,
                           orderKey: Column, budgets: Map[String, Long],
                           partitions: Int = 0)
                          (f: DataFrame => T): T = {
    require(budgets.nonEmpty, "budgets must not be empty")
    require(budgets.values.forall(_ > 0), "budgets must be positive")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val keep = df.columns
    val base = df
      .withColumn("__stratum", stratum.cast("string"))
      .filter(col("__stratum").isin(budgets.keys.toSeq: _*))
      .withColumn("__ord", orderKey)
      .withColumn("__tok", tokens.cast("long"))
    val parted = base.repartitionByRange(p, col("__stratum"), col("__ord"))
      .withColumn("__pid", spark_partition_id())
    parted.persist()
    try {
      // one row per (partition, stratum) cell — the driver-side state is
      // O(P × strata), never O(rows)
      val perCell = parted.groupBy(col("__pid"), col("__stratum"))
        .agg(sum(col("__tok")).as("t")).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
        .sortBy(c => (c._2, c._1))
      val running = scala.collection.mutable.Map.empty[String, Long]
      val offsets = perCell.map { case (pid, s, t) =>
        val off = running.getOrElse(s, 0L)
        running(s) = off + t
        s"$pid|$s" -> off
      }.toMap
      val offMap = typedlit(offsets)
      val budgetMap = typedlit(budgets)
      val w = Window.partitionBy(col("__pid"), col("__stratum"))
        .orderBy(col("__ord"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = sum(col("__tok")).over(w) +
        coalesce(element_at(offMap,
          concat_ws("|", col("__pid"), col("__stratum"))), lit(0L))
      // keep while the EXCLUSIVE prefix is under budget → the crossing
      // document is included
      val sampled = parted
        .withColumn("__cum", cum)
        .filter(col("__cum") - col("__tok") <
          element_at(budgetMap, col("__stratum")))
        .select(keep.map(col): _*)
      f(sampled)
    } finally {
      parted.unpersist()
      ()
    }
  }

  /** At most `n` documents per group, taken in deterministic `orderKey`
    * order — the C4-style per-domain cap (a handful of mega-domains must
    * not dominate a web corpus). Pass a content/id hash as `orderKey` for
    * a uniform random-but-reproducible choice; it must be UNIQUE within a
    * group (tie order is engine-dependent — add the id as a tiebreaker).
    *
    * Unlike [[tokenBudgetSample]] the group key is unbounded (millions of
    * domains), so the per-(partition, group) offsets stay a DataFrame
    * instead of driver cells: one range exchange on (group, orderKey),
    * per-cell counts (≤ P rows per group), a cumsum over that CELL table
    * windowed by group (never over row data), and a join back that AQE
    * broadcasts while the cell table is small and shuffles keyed by
    * (partition, group) when it isn't. No group ever sorts inside a
    * single task.
    *
    * Runs `f` over the capped frame while the shuffled input is persisted
    * (cells and output are two passes over the same exchange). */
  def capPerGroup[T](df: DataFrame, group: Column, orderKey: Column, n: Long,
                     partitions: Int = 0)(f: DataFrame => T): T = {
    require(n > 0, s"cap must be positive, got $n")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val keep = df.columns
    val base = df
      .withColumn("__grp", group.cast("string"))
      .filter(col("__grp").isNotNull)
      .withColumn("__ord", orderKey)
    val parted = base.repartitionByRange(p, col("__grp"), col("__ord"))
      .withColumn("__pid", spark_partition_id())
    parted.persist()
    try {
      val cells = parted.groupBy(col("__pid"), col("__grp"))
        .agg(count(lit(1)).as("__c"))
      val wOff = Window.partitionBy(col("__grp")).orderBy(col("__pid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val offs = cells
        .withColumn("__off", sum(col("__c")).over(wOff) - col("__c"))
        .select(col("__pid"), col("__grp"), col("__off"))
      val wRn = Window.partitionBy(col("__pid"), col("__grp"))
        .orderBy(col("__ord"))
      val sampled = parted
        .withColumn("__rn", row_number().over(wRn).cast("long"))
        .join(offs, Seq("__pid", "__grp"))
        .filter(col("__rn") + col("__off") <= n)
        .select(keep.map(col): _*)
      f(sampled)
    } finally {
      parted.unpersist()
      ()
    }
  }
}
