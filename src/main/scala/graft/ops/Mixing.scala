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
  * 100 TB shape: the document PAYLOAD never enters an exchange. A narrow
  * (stratum, orderKey, tokens) projection — a column-pruned scan — takes
  * one range repartition on (stratum, orderKey), then the grouped
  * two-phase prefix sum of [[RangeCumSum]]: the driver sees one row per
  * (partition, stratum) cell (O(P × strata), and mixtures have tens of
  * strata), offsets go back as a broadcast literal map, and the cumsum
  * window partitions by (physical partition, stratum) so no stratum ever
  * sorts inside a single task — the scale trap of
  * `Window.partitionBy(stratum)`. The prefix sum collapses to ONE
  * threshold order key per stratum (the crossing document's), and the
  * output is the original frame broadcast-semi-joined on
  * `stratum = s AND orderKey <= threshold` — a filter at the scan, wide
  * columns untouched, input partitioning preserved for downstream `f`.
  *
  * Order-key ties at the crossing point keep ALL tied documents (the
  * threshold is a value cut, not a row cut) — deterministic where a
  * row-number cut would be layout-dependent. With a hash `orderKey`,
  * ties do not occur. `orderKey` must be deterministic (hash, not
  * rand()): it is evaluated once in each pass.
  *
  * Measured A/B at 100M docs on local[32]/8g: with a 128-byte payload
  * the previous plan (payload through the range exchange + persist)
  * DIED with UNABLE_TO_ACQUIRE_MEMORY, while this plan completes; on a
  * payload-free frame this plan pays ~1.7× (82 s vs 47 s — the extra
  * narrow pass with nothing saved), the right trade for an operator
  * whose input is documents.
  *
  * The sampled frame `f` receives is a live filter over `df` (nothing is
  * persisted on its behalf), so `f` must materialize what it needs.
  */
object Mixing {
  /** `tokenizer` turns the `tokens` column into the budget unit:
    * [[TextOps.PrecomputedCounts]] (default — `tokens` is already a
    * count), [[TextOps.WhitespaceTokens]] or [[TextOps.BpeTokens]]
    * (`tokens` is raw text; the tokenizer-true 100 TB budget). The count
    * is computed INSIDE the narrow pass-1 projection, so the text column
    * still never enters the exchange. */
  def tokenBudgetSample[T](df: DataFrame, stratum: Column, tokens: Column,
                           orderKey: Column, budgets: Map[String, Long],
                           partitions: Int = 0,
                           tokenizer: TextOps.Tokenizer =
                             TextOps.PrecomputedCounts)
                          (f: DataFrame => T): T = {
    require(budgets.nonEmpty, "budgets must not be empty")
    require(budgets.values.forall(_ > 0), "budgets must be positive")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val keep = df.columns
    // pass 1 (narrow): per-stratum threshold order key. Only three thin
    // columns shuffle — at corpus scale the text/bytes stay in place.
    val narrow = df.select(stratum.cast("string").as("__stratum"),
        orderKey.as("__ord"), tokenizer.counts(tokens).cast("long").as("__tok"))
      .filter(col("__stratum").isin(budgets.keys.toSeq: _*) &&
        // null tokens can't count against a budget and null order keys
        // have no place in the value cut — exclude them HERE so pass 2's
        // semi join (which must apply the same predicate) agrees
        col("__tok").isNotNull && col("__ord").isNotNull)
    val parted = narrow.repartitionByRange(p, col("__stratum"), col("__ord"))
      .withColumn("__pid", spark_partition_id())
    parted.persist()
    val thresholds = try {
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
      // document is included, and its order key is the stratum's cut
      val thr = parted
        .withColumn("__cum", cum)
        .filter(col("__cum") - col("__tok") <
          element_at(budgetMap, col("__stratum")))
        .groupBy(col("__stratum")).agg(max(col("__ord")).as("__thr"))
      thr.persist()
      thr.count()
      thr
    } finally {
      parted.unpersist()
      ()
    }
    try {
      // pass 2 (wide): value-cut the original frame against the tiny
      // threshold table — broadcast semi join, no payload shuffle. The
      // null-token/null-order filter mirrors pass 1 exactly: a row pass 1
      // excluded from the budget prefix sum must not be re-admitted here.
      val tagged = df.withColumn("__s0", stratum.cast("string"))
        .withColumn("__o0", orderKey)
        .filter(tokenizer.counts(tokens).cast("long").isNotNull &&
          col("__o0").isNotNull)
      val sampled = tagged.join(broadcast(thresholds),
          tagged("__s0") === thresholds("__stratum") &&
            tagged("__o0") <= thresholds("__thr"), "left_semi")
        .select(keep.map(col): _*)
      f(sampled)
    } finally {
      thresholds.unpersist()
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
  /** Weighted sampling WITHOUT replacement, k documents per stratum —
    * Efraimidis & Spirakis (2006) "A-ES" exponential keys: item i gets key
    * uᵢ^(1/wᵢ) (u uniform on (0,1)); the k LARGEST keys per stratum are a
    * weighted sample without replacement. Implemented as the k smallest
    * values of the equivalent order key −ln(u)/w riding [[capPerGroup]],
    * so the plan is the same narrow two-phase cap (no stratum ever sorts
    * in one task).
    *
    * `u01` must be a DETERMINISTIC uniform in the OPEN interval (0, 1) —
    * derive it from a hash of the id (e.g. the leading hex of an md5, as
    * `(conv(substring(md5(id), 1, 8), 16, 10) + 0.5) / 2^32`) so the exact
    * sample replays in an external engine and survives retries; `rand()`
    * would silently break both. Weights must be strictly positive. Both
    * contracts are enforced IN the order-key expression (`raise_error`
    * branch — no extra validation pass over the data). */
  def weightedSample[T](df: DataFrame, stratum: Column, weight: Column,
                        u01: Column, k: Long, partitions: Int = 0)
                       (f: DataFrame => T): T = {
    val w = weight.cast("double")
    val u = u01.cast("double")
    val key = when(w > 0.0 && u > 0.0 && u < 1.0, -log(u) / w)
      .otherwise(raise_error(concat(
        lit("weighted_sample: weight must be > 0 and u01 in (0,1), got weight="),
        w.cast("string"), lit(" u01="), u.cast("string"))))
    capPerGroup(df, stratum, key, k, partitions)(f)
  }

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
