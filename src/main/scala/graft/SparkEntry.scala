package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — one entry per implemented operator (SURVEY.md §2), with
  * DuckDB-equivalent oracle SQL for the correctness gate.
  *
  * Determinism rules for oracle parity (the driver hash-compares values):
  * sums aggregate in DECIMAL (exact, order-independent) and cast to double
  * at the end; derived floating stats are rounded to a scale far above the
  * accumulation-order error; averages are computed as exact-decimal-sum /
  * count. Column names are aliased identically on both sides.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize the events `ts` column to long epoch nanos under EITHER
    * parquet read: LongType nanos (legacy nanosAsLong flag, pre-round-9
    * testdata) passes through; native timestamp[us] (current testdata)
    * converts via unix_micros·1000, which stays exact in long. DuckDB's
    * epoch_ns(ts) mirrors both. */
  private def tsNanos(ev: DataFrame): DataFrame =
    if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType) ev
    else ev.withColumn("ts",
      unix_micros(col("ts").cast("timestamp")) * lit(1000L))

  /** Shared planted-heterogeneous-effect fixture for the causal tree/forest
    * oracles: deterministic treatment, segment h = 1{l_quantity > 25}, true
    * CATE τ = 2 + 8·h, outcome noise = hash-uniform in ±0.4995. */
  private def plantedEffect(li: DataFrame): DataFrame = {
    val h = (col("l_quantity") > 25.0).cast("double")
    val u = pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(1000L))
      .cast("double") / 1000.0 - 0.4995
    li.withColumn("treat", (col("l_orderkey") % 2).cast("int"))
      .withColumn("h", h)
      .withColumn("y",
        lit(10.0) + lit(5.0) * h + col("treat") * (lit(2.0) + lit(8.0) * h) + u)
  }

  /** SF token parsed from the data dir, surfaced as a column on every query
    * whose oracle pins sf0.01-only constants (q34/q38/q46/…): at the gate SF
    * both sides agree; at any other SF the correctness dump disagrees on
    * THIS column, naming the cause instead of a bare hash mismatch. */
  private def sfTag(dir: String): String =
    "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1)).getOrElse("unknown")

  private def dec(c: Column): Column = c.cast("decimal(18,2)")
  /** exact decimal sum surfaced as double */
  private def dsum(c: Column): Column = sum(dec(c)).cast("double")
  /** exact average: decimal sum / count */
  private def davg(c: Column): Column = sum(dec(c)).cast("double") / count(lit(1))

  /** Flagship: CUPED-adjusted two-sample ratio-metric t-test on lineitem —
    * the reference's headline capability (ttest_2samp with X=, SURVEY §2b#3)
    * in one Spark aggregate pass. */
  def entry(spark: SparkSession): DataFrame = {
    val li = t(spark, "/root/testdata/sf0.001", "lineitem")
      .withColumn("treat", (col("l_orderkey") % 2).cast("int"))
    li.select(functions.ttest2Samp(
      "avg(l_extendedprice)/avg(l_quantity)", col("treat"),
      cuped = "avg(l_discount)").as("r"))
      .select(col("r.*"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---------------------------------------------------------------- §2a relational
    "q01_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(dec(col("l_extendedprice")) * (lit(1.0).cast("decimal(18,2)") - dec(col("l_discount"))))
            .cast("double").as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),
    "q02_revenue_by_nation" -> ((s, d) => {
      val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
      val c = t(s, d, "customer"); val n = t(s, d, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(dec(col("l_extendedprice")) * (lit(1.0).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
    }),
    "q03_filter_project_sort" -> ((s, d) => {
      t(s, d, "orders")
        .filter(col("o_totalprice") > 100000.0 && col("o_orderstatus") === "O")
        .select(col("o_orderkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(50)
    }),
    "q04_semi_join" -> ((s, d) => {
      val o = t(s, d, "orders")
      val li = t(s, d, "lineitem").filter(col("l_quantity") > 45.0)
      o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n_orders"))
    }),
    "q05_anti_join" -> ((s, d) => {
      // anti-join against the BIG orders only, so the result is non-empty
      // (every customer has some order in this data — an anti-join on all
      // orders would pass vacuously with 0 rows)
      val c = t(s, d, "customer")
      val o = t(s, d, "orders").filter(col("o_totalprice") > 450000.0)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_customers"))
    }),
    "q06_union" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val a = li.filter(col("l_returnflag") === "A").select(col("l_linestatus"), col("l_quantity"))
      val r = li.filter(col("l_returnflag") === "R").select(col("l_linestatus"), col("l_quantity"))
      a.unionByName(r).groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
    }),
    "q07_distinct_agg" -> ((s, d) => {
      t(s, d, "lineitem").groupBy(col("l_suppkey"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_orderkey")).as("n_orders"))
    }),
    "q08_window_topk" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders").withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("rk"))
    }),
    "q09_quantiles" -> ((s, d) => {
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000000)).as("med_raw"),
          expr("percentile(l_extendedprice, array(0.25, 0.5, 0.75, 0.9))").as("qs"))
        .select(col("l_returnflag"),
          round(element_at(col("qs"), 1), 4).as("p25"),
          round(element_at(col("qs"), 2), 4).as("p50"),
          round(element_at(col("qs"), 3), 4).as("p75"),
          round(element_at(col("qs"), 4), 4).as("p90"))
    }),
    "q10_describe" -> ((s, d) => {
      t(s, d, "lineitem").groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"),
          davg(col("l_quantity")).as("avg_qty"),
          round(stddev_samp(col("l_quantity")), 6).as("std_qty"),
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"))
    }),
    "q11_deterministic_sample" -> ((s, d) => {
      // rand()-style sampling is engine-specific; the parity check uses an
      // explicit LCG so both engines draw the same rows (SURVEY §2a sample)
      t(s, d, "lineitem")
        .filter((col("l_orderkey") * 1103515245L + 12345L) % 1000 < 100)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_extendedprice")).as("sum_price"))
    }),
    "q12_cut_bins" -> ((s, d) => {
      val b = when(col("l_quantity") < 10, "[0,10)")
        .when(col("l_quantity") < 20, "[10,20)")
        .when(col("l_quantity") < 30, "[20,30)")
        .when(col("l_quantity") < 40, "[30,40)")
        .otherwise("[40,inf)")
      t(s, d, "lineitem").withColumn("bin", b)
        .groupBy(col("bin")).agg(count(lit(1)).as("n_rows"))
    }),
    "q13_pivot_counts" -> ((s, d) => {
      t(s, d, "lineitem").groupBy(col("l_linestatus"))
        .agg(sum(when(col("l_returnflag") === "A", 1L).otherwise(0L)).as("cnt_a"),
          sum(when(col("l_returnflag") === "N", 1L).otherwise(0L)).as("cnt_n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("cnt_r"))
    }),
    // ---------------------------------------------------------------- §2b statistics
    "q14_delta_method" -> ((s, d) => {
      t(s, d, "lineitem").groupBy(col("l_returnflag"))
        .agg(functions.delta_method("x1", isStd = false, Seq(col("l_quantity"))).as("v"))
        .select(col("l_returnflag"), round(col("v"), 8).as("dm_var"))
    }),
    "q15_ttest_2samp" -> ((s, d) => {
      val li = t(s, d, "lineitem").withColumn("treat", (col("l_orderkey") % 2).cast("int"))
      li.select(functions.ttest_2samp("x1", col("treat"))(col("l_quantity")).as("r"))
        .select(round(col("r.mean0"), 6).as("mean0"),
          round(col("r.mean1"), 6).as("mean1"),
          round(col("r.estimate"), 6).as("estimate"),
          round(col("r.stderr"), 6).as("stderr"))
    }),
    "q62_ttest_one_sided" -> ((s, d) => {
      // one-sided alternatives (ttest_common.h:199-241): p(less) = Φ(t),
      // p(greater) = 1 − Φ(t); the one-sided CI bound uses the Student-t
      // quantile at 1−α. estimate/stderr/t oracle closed-form; the Φ and
      // t-quantile values are pinned sf0.01 constants
      val li = t(s, d, "lineitem").withColumn("treat", (col("l_orderkey") % 2).cast("int"))
      li.select(
          functions.ttest_2samp("x1", col("treat"), alternative = "less")(col("l_quantity")).as("lo"),
          functions.ttest_2samp("x1", col("treat"), alternative = "greater")(col("l_quantity")).as("hi"))
        .select(
          round(col("lo.estimate"), 6).as("estimate"),
          round(col("lo.stderr"), 6).as("stderr"),
          round(col("lo.t_statistic"), 6).as("t_statistic"),
          round(col("lo.p_value"), 6).as("p_less"),
          round(col("hi.p_value"), 6).as("p_greater"),
          round(col("lo.upper"), 6).as("upper_less"),
          round(col("hi.lower"), 6).as("lower_greater"),
          lit(sfTag(d)).as("oracle_sf"))
    }),
    "q86_repetition" -> ((s, d) => {
      // Gopher-style repetition signals, zero-shuffle per-row expressions:
      // duplicate-token share and top-bigram/trigram share via the sorted
      // longest-equal-run fold (no explode/groupBy round trip).
      import graft.ops.TextOps
      t(s, d, "documents").select(
          TextOps.dupTokenRatio(col("text")).as("dup"),
          TextOps.topNgramShare(col("text"), 2).as("top2"),
          TextOps.topNgramShare(col("text"), 3).as("top3"))
        .agg(
          count(lit(1)).as("n_docs"),
          round(avg(col("dup")), 6).as("avg_dup_token_ratio"),
          round(avg(col("top2")), 6).as("avg_top2_share"),
          round(max(col("top2")), 6).as("max_top2_share"),
          count(when(col("top2") >= 0.1, 1)).as("n_top2_ge_10pct"),
          round(avg(col("top3")), 6).as("avg_top3_share"))
    }),
    "q85_pii_redaction" -> ((s, d) => {
      // PII scrub over documents with deterministically planted emails /
      // phones / IPv4s (the corpus itself is digit-free word salad). The
      // regexes are Java∩RE2 so DuckDB replays them exactly.
      import graft.ops.TextOps
      val planted = t(s, d, "documents").withColumn("txt", concat(
        col("text"),
        when(col("doc_id") % 2 === 0, concat(lit(" mail u"),
          col("doc_id").cast("string"), lit("@example.com"))).otherwise(lit("")),
        when(col("doc_id") % 3 === 0, concat(lit(" call +1-555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))).otherwise(lit("")),
        when(col("doc_id") % 5 === 0, concat(lit(" host 10.0."),
          (col("doc_id") % 200).cast("string"), lit("."),
          (col("doc_id") % 250).cast("string"))).otherwise(lit(""))))
      planted.withColumn("clean", TextOps.redactPii(col("txt")))
        .agg(
          sum(TextOps.emailCount(col("txt"))).cast("long").as("n_emails"),
          sum(TextOps.phoneCount(col("txt"))).cast("long").as("n_phones"),
          sum(TextOps.ipCount(col("txt"))).cast("long").as("n_ips"),
          count(when(TextOps.emailCount(col("clean")) +
            TextOps.phoneCount(col("clean")) +
            TextOps.ipCount(col("clean")) === 0, 1)).as("n_clean_docs"),
          sum(length(col("txt")) - length(col("clean"))).cast("long")
            .as("chars_removed"),
          count(when(col("clean").contains("<EMAIL>"), 1)).as("n_docs_with_email"))
    }),
    "q84_asof_join" -> ((s, d) => {
      // as-of attribution: each purchase gets the user's latest prior click
      // (one union-tag shuffle + window carry — no inequality join). ts is
      // normalized to long epoch NANOS whichever way the parquet reads
      // (LongType nanos under the legacy flag, timestamp[us] natively —
      // unix_micros*1000 stays exact in long); DuckDB mirrors with
      // epoch_ns(ts) either way.
      val ev = tsNanos(t(s, d, "events"))
      val p = ev.filter(col("event_type") === "purchase")
      val c = ev.filter(col("event_type") === "click")
        .select("user_id", "ts", "value", "event_id")
      graft.ops.AsofJoin.asof(p, c, Seq("user_id"), "ts", "ts",
          payload = Seq("value"), tieBreak = Some(col("event_id")))
        .withColumn("gap", (col("ts") - col("asof_ts")).cast("double") / 1e9)
        .agg(
          count(lit(1)).as("n_purchases"),
          count(col("asof_ts")).as("n_matched"),
          count(when(col("gap") <= 3600.0, 1)).as("n_within_1h"),
          round(avg(col("gap")), 6).as("avg_gap_sec"),
          round(max(col("gap")), 6).as("max_gap_sec"),
          round(sum(col("asof_value")), 2).as("sum_click_value"))
    }),
    "q83_packing" -> ((s, d) => {
      // context-window packing over documents in doc_id order, ctx = 512:
      // per-doc window spans from the distributed range cumsum, summarized.
      val docs = t(s, d, "documents")
      graft.ops.Packing.contextChunks(docs, Seq(col("doc_id")),
        col("text"), ctx = 512,
        tokenizer = graft.ops.TextOps.WhitespaceTokens) { packed =>
        packed.agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_windows") - lit(1)).cast("long").as("n_boundary_crossings"),
          max(col("last_window") + 1).as("n_windows_total"),
          count(when(col("n_windows") > 1, 1)).as("n_boundary_docs"),
          round(avg(col("n_windows")), 6).as("avg_windows_per_doc"),
          max(col("n_windows")).as("max_windows_per_doc"))
          .collect()
      }.toSeq match { case rows =>
        val spark = s
        import spark.implicits._
        rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getLong(5)))
          .toDF("n_docs", "n_boundary_crossings", "n_windows_total",
            "n_boundary_docs", "avg_windows_per_doc", "max_windows_per_doc")
      }
    }),
    "q82_contamination" -> ((s, d) => {
      // decontamination scan: probe = every 20th doc (a planted "benchmark"
      // that is also IN the corpus, so those docs score exactly 1.0). Runs
      // the production fused-hash path (hashes = true): the oracle compares
      // the final COUNT aggregates, which the 64-bit-hash join preserves
      // exactly (collision odds ≈ pairs/2⁶⁴; PipelineOpsSpec asserts the
      // hash and string paths return the identical frame), while DuckDB
      // replays the same counts from the raw shingle strings.
      val docs = t(s, d, "documents")
      val probe = docs.filter(col("doc_id") % 20 === 0)
      graft.ops.Dedup.contamination(docs, probe, col("text"), col("doc_id"),
          n = 5)
        .agg(
          count(lit(1)).as("n_docs"),
          count(when(col("contamination") === 1.0, 1)).as("n_full"),
          count(when(col("contamination") >= 0.5, 1)).as("n_above_half"),
          sum(col("n_hit")).as("n_hits"),
          sum(col("n_shingles")).as("n_shingles"),
          round(avg(col("contamination")), 6).as("avg_contamination"))
    }),
    "q92_token_budget_mix" -> ((s, d) => {
      // corpus-mixture construction: per-language char budgets, documents
      // taken in md5(doc_id) order — a hash DuckDB computes bit-identically,
      // so the oracle replays the exact sample. The budget-crossing doc is
      // kept, budget-less languages (de, es) are dropped. The tiny result
      // is persisted inside the callback (the operator unpersists its
      // shuffled input when the callback returns).
      val docs = t(s, d, "documents")
      val budgets = Map("en" -> 10000L, "fr" -> 5000L, "zh" -> 3000L)
      graft.ops.Mixing.tokenBudgetSample(docs, col("lang"), col("n_chars"),
          md5(col("doc_id").cast("string")), budgets,
          tokenizer = graft.ops.TextOps.PrecomputedCounts) { sampled =>
        val r = sampled.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("kept_tokens"),
            max(col("n_chars")).as("max_doc_tokens"))
          .orderBy(col("lang"))
        r.persist()
        r.count()
        r
      }
    }),
    "q91_paragraph_dedup" -> ((s, d) => {
      // boilerplate removal: plant paragraph structure — a global cookie
      // banner + the doc's own body + a footer shared by the doc_id % 7
      // cohort. maxDocFreq = 2 drops any paragraph seen in > 2 documents
      // (banner and footers always; body lines only when the corpus itself
      // contains > 2 copies), and reassembly keeps original order. The
      // oracle replays doc-frequency over the NORMALIZED paragraph string —
      // same equivalence classes as the fingerprint modulo 64-bit collisions.
      val docs = t(s, d, "documents").select(col("doc_id"),
        concat_ws("\n",
          lit("accept all cookies"),
          col("text"),
          concat(lit("footer "), (col("doc_id") % 7).cast("string"))).as("text"))
      graft.ops.Dedup.paragraphDedup(docs, col("doc_id"), col("text"),
          maxDocFreq = 2)
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_paras")).as("total_paras"),
          sum(col("n_kept")).as("total_kept"),
          sum(length(col("text"))).as("total_len"),
          count(when(col("n_kept") === col("n_paras"), 1)).as("n_untouched"))
    }),
    "q81_sessionize" -> ((s, d) => {
      // batch gap-sessionization over events (4h gap): assign → stats →
      // global summary. ts normalized to long epoch NANOS (see q84);
      // DuckDB mirrors with epoch_ns(ts).
      val ev = tsNanos(t(s, d, "events"))
      val assigned = graft.ops.Sessions.assign(ev, col("user_id"), col("ts"),
        gapSeconds = 14400)
      graft.ops.Sessions.stats(assigned, col("user_id"), col("ts"), col("value"))
        .agg(
          count(lit(1)).as("n_sessions"),
          countDistinct(col("key")).as("n_users"),
          sum(col("n_events")).as("n_events"),
          max(col("n_events")).as("max_session_events"),
          round(avg(col("n_events")), 6).as("avg_session_events"),
          round(max(col("duration_sec")), 6).as("max_duration_sec"),
          round(sum(col("sum_value")), 2).as("sum_value"))
    }),
    "q80_stratified_sample" -> ((s, d) => {
      // deterministic sampleBy (corpus-mixing primitive): per-stratum keep
      // fractions. Parity uses the q11 trick — an explicit LCG uniform both
      // engines compute identically; the production xxhash64 membership path
      // is covered by ApiSpec (layout invariance, fraction accuracy).
      import graft.api.implicits._
      val li = t(s, d, "lineitem")
      val u = ((col("l_orderkey") * 8 + col("l_linenumber")) * 1103515245L
        + 12345L) % 1000 / lit(1000.0)
      li.sampleByDeterministic(col("l_returnflag"),
          Map("A" -> 0.2, "N" -> 0.05, "R" -> 0.5), uniform = u)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("l_returnflag"))
    }),
    "q79_dml_interval" -> ((s, d) => {
      // effect_interval / ate_interval (uplift.py:2322,2356): the DuckDB
      // side re-derives the cv=2 cross-fit residuals exactly like q32, then
      // solves the 2×2 final-stage normal equations closed-form; the
      // Student-t quantile at df = n−3 has no DuckDB builtin, so it is a
      // pinned constant (Dist.tQuantile(0.975, 59997) = 1.960003524667,
      // cross-checked against independent numeric integration at 1e-9).
      val li = t(s, d, "lineitem")
      val m = graft.ops.Dml.linearDml(li, col("l_extendedprice"), col("l_quantity"),
        Seq(col("l_discount")), cv = 2, foldKey = col("l_orderkey"),
        heterogeneous = Seq(col("l_discount")))
      val ai = graft.ops.Dml.ateInterval(li, m, Seq(col("l_discount")))
      // per-row interval at a pinned basis (1, 0.05): a one-row frame with a
      // constant feature makes ateInterval evaluate exactly that basis
      val ei = graft.ops.Dml.ateInterval(
        li.limit(1).withColumn("__x", lit(0.05)), m, Seq(col("__x")))
      import s.implicits._
      Seq((ai.ate, ai.stderr, ai.lower, ai.upper, ei.ate, ei.lower, ei.upper))
        .toDF("a", "b", "c", "e", "f", "g", "h")
        .select(round($"a", 6).as("ate"), round($"b", 6).as("stderr"),
          round($"c", 6).as("lower"), round($"e", 6).as("upper"),
          round($"f", 6).as("effect_at_x"), round($"g", 6).as("eff_lower"),
          round($"h", 6).as("eff_upper"))
        .withColumn("oracle_sf", lit(sfTag(d)))
    }),
    "q78_prognostic_matching" -> ((s, d) => {
      // prognostic-score matching (match.py:329-440): the outcome is an
      // EXACT linear function of the covariates, so the OLS prog-score model
      // fit on the held-out control half recovers it exactly and the score
      // math (fit → predict → caliper bucket) oracles closed-form in DuckDB.
      // The +0.5 offset keeps every score mid-bucket, so coefficient float
      // jitter can never flip a floor(). Split-dependent counts (which
      // control rows stayed matchable, how many pairs formed) are pinned
      // sf0.01 constants — the split is content-hash deterministic on id.
      val li = t(s, d, "lineitem")
        .withColumn("id", col("l_orderkey") * 8 + col("l_linenumber"))
        .withColumn("tr", (col("l_orderkey") % 2).cast("int"))
        .withColumn("x1", col("l_quantity").cast("double"))
        .withColumn("x2", col("l_linenumber").cast("double"))
        .withColumn("y", lit(2.0) * col("x1") - lit(3.0) * col("x2") + lit(0.5))
      val m = graft.ops.Matching.prognosticMatching(li, col("tr"), col("y"),
        Seq(col("x1"), col("x2")), caliper = 1.0, idCols = Seq(col("id")))
      m.withColumn("bucket", floor(col("prog_score")).cast("long"))
        .agg(
          count(when(col("tr") === 1, 1)).as("n_treated"),
          min(when(col("tr") === 1, col("bucket"))).as("bucket_min"),
          max(when(col("tr") === 1, col("bucket"))).as("bucket_max"),
          round(avg(when(col("tr") === 1, col("bucket"))), 6).as("bucket_avg"),
          countDistinct(col("bucket")).as("n_buckets"),
          count(when(col("tr") === 0, 1)).as("n_control_test"),
          count(when(col("tr") === 1 && col("matching_index") > 0, 1))
            .as("n_matched_pairs"))
        .withColumn("oracle_sf", lit(sfTag(d)))
    }),
    "q77_pearson_corr" -> ((s, d) => {
      // Pearsonr (AggregateFunctionPearsonr.h:56-72) over price~quantity:
      // r and t oracle closed-form against DuckDB corr(); the Student-t
      // CDF p-value is a pinned sf0.01 constant (q38 idiom), cross-checked
      // against an independent incomplete-beta implementation.
      t(s, d, "lineitem")
        .select(functions.pearson_corr(col("l_extendedprice"), col("l_quantity")).as("pr"),
          count(lit(1)).as("n"))
        .select(round(col("pr.r"), 6).as("r"),
          round(col("pr.r") * sqrt((col("n") - 2).cast("double")) /
            sqrt(lit(1.0) - col("pr.r") * col("pr.r")), 4).as("t_statistic"),
          round(col("pr.p_value"), 6).as("p_value"),
          col("n"),
          lit(sfTag(d)).as("oracle_sf"))
    }),
    "q76_salted_join" -> ((s, d) => {
      // the skew-join layout helper under the gate: a salted join must be
      // RESULT-identical to the plain join (the salt only splits reducers).
      // lineitem rides as the skewed big side, orders as the replicable
      // small side; revenue per orderstatus is the DuckDB closed form.
      val li = t(s, d, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
      val ords = t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus"))
      graft.ops.Layout.saltedJoin(li, ords, "o_orderkey", salt = 8,
          bigId = Seq(col("o_orderkey"), col("l_linenumber")))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(dec(col("l_extendedprice"))).cast("double").as("revenue"))
        .orderBy(col("o_orderstatus"))
    }),
    "q74_gateway_transform" -> ((s, d) => {
      // the gateway's transform-then-project rewrite under the gate: a
      // table-transform verb (exact_matching) sits BESIDE plain projections
      // in raw SQL; per-cell matched counts are the closed form
      // 2·min(treated, control)
      t(s, d, "lineitem")
        .withColumn("treat", (col("l_orderkey") % 2).cast("int"))
        .createOrReplaceTempView("li_gt")
      GraftGateway.sql(s,
        "SELECT l_linenumber, exact_matching(treat, l_linenumber), l_extendedprice FROM li_gt")
        .groupBy(col("l_linenumber"))
        .agg(sum(when(col("matching_index") > 0, 1L).otherwise(0L)).as("matched"),
          count(lit(1)).as("n"))
        .orderBy(col("l_linenumber"))
    }),
    "q75_gateway_ranktest" -> ((s, d) => {
      // the gateway's rank-test auto-route (top-level SQL → the
      // range-partitioned RankTests path): U must equal the histogram
      // aggregate's closed form (q23's oracle)
      t(s, d, "lineitem")
        .withColumn("treat", (col("l_orderkey") % 2).cast("int"))
        .createOrReplaceTempView("li_rt")
      GraftGateway.sql(s, "SELECT mann_whitney_utest(l_quantity, treat) FROM li_rt")
        .select(round(col("u_statistic"), 4).as("u_statistic"))
    }),
    "q73_streaming_metrics" -> ((s, d) => {
      // the streaming surface under the oracle gate: windowedMetrics runs
      // as a REAL readStream (file source → AvailableNow → memory sink)
      // over the events table; processed to completion in complete mode,
      // the watermarked windowed aggregates equal the batch hourly window
      // DuckDB computes (windows align to epoch-hour boundaries in UTC)
      import org.apache.spark.sql.streaming.Trigger
      val ev = t(s, d, "events")
      // ts arrives as timestamp[ns]: LongType nanos under the
      // nanosAsLong flag (Verify/Bench), native timestamp otherwise
      val tsExpr =
        if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          (col("ts") / lit(1e9)).cast("timestamp")
        else col("ts").cast("timestamp")
      // the file source wants a directory: glob the single events file
      val stream = s.readStream.schema(ev.schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
      val sink = "q73_mem_" + math.abs(s.sparkContext.applicationId.hashCode)
      graft.streaming.StreamRun.runAvailableNow(
        graft.streaming.StreamOps.windowedMetrics(stream, tsExpr,
            col("event_type"), col("value"), "1 hour", "10 minutes")
          .writeStream.format("memory").queryName(sink).outputMode("complete"),
        s, graft.streaming.StreamRun.inputBytes(d, "events.parquet"))
      s.table(sink)
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("group").as("event_type"), col("n"),
          round(col("sum_value"), 2).as("sum_value"))
        .orderBy(col("w_start"), col("event_type"))
    }),
    "q72_ttests_mu" -> ((s, d) => {
      // ttests_2samp with a per-test mu list (null hypothesis diff = mu_i),
      // through the SQL name so the optional-array builder path is under
      // the gate: the mu=5 test's estimate and t shift by exactly 5 (and
      // 5/stderr) while stderr is invariant — all DuckDB closed forms
      graft.GraftSql.register(s)
      t(s, d, "lineitem").withColumn("treat", (col("l_orderkey") % 2).cast("int"))
        .createOrReplaceTempView("li_mu")
      s.sql(
        """SELECT ttests_2samp('x1', 'two-sided', array(0.05, 0.05),
          |  array(0.0, 5.0), treat, l_quantity) AS rs FROM li_mu""".stripMargin)
        .select(round(col("rs")(0)("estimate"), 6).as("est0"),
          round(col("rs")(1)("estimate"), 6).as("est_mu"),
          round(col("rs")(0)("stderr"), 6).as("stderr"),
          round(col("rs")(1)("t_statistic"), 6).as("t_mu"))
    }),
    "q71_xexpt_cuped" -> ((s, d) => {
      // xexpt with the pre-period CUPED covariate (cuped='x3/x4', the
      // reference's only accepted form): numerator/denominator/pre sums are
      // DuckDB closed forms; the bucket-level θ adjustment makes the
      // adjusted means and t a pinned sf0.01 constant
      val li = t(s, d, "lineitem")
        .withColumn("treat", (col("l_orderkey") % 2).cast("int"))
        .withColumn("uin", col("l_orderkey") * 10 + col("l_linenumber"))
        .withColumn("y_pre", col("l_quantity") * 0.7 + col("l_discount") * 5.0)
      li.select(functions.xexpt_ttest_2samp(col("uin"), col("treat"),
          Seq(col("l_quantity"), lit(1.0), col("y_pre"), lit(1.0)),
          cuped = "x3/x4").as("r"))
        .select(round(col("r.numerator0"), 2).as("num0"),
          round(col("r.numerator1"), 2).as("num1"),
          round(col("r.numerator_pre0"), 2).as("pre0"),
          round(col("r.numerator_pre1"), 2).as("pre1"),
          round(col("r.denominator0"), 2).as("den0"),
          round(col("r.denominator1"), 2).as("den1"),
          round(col("r.mean0"), 6).as("mean0"),
          round(col("r.mean1"), 6).as("mean1"),
          round(col("r.t_statistic"), 6).as("t_stat"),
          lit(sfTag(d)).as("oracle_sf"))
    }),
    "q70_multimodal_plan" -> ((s, d) => {
      // the multimodal PLUMBING beyond image decode (q45): frame sampling
      // (posexplode over a sequence of timestamps) and the aspect-preserving
      // resize plan are metadata arithmetic — every output is a DuckDB
      // closed form, no pins
      val li = t(s, d, "lineitem")
      val nFrames = graft.ops.Multimodal.sampleFrames(li,
        col("l_orderkey"), col("l_orderkey") % 5000, everyMs = 1000L).count()
      li.select(graft.ops.Multimodal.resizePlan(
          (lit(640) + col("l_partkey") % 2000).cast("int"),
          (lit(480) + col("l_suppkey") % 1000).cast("int"), 1024).as("p"))
        .agg(sum(when(col("p.needs_resize"), 1L).otherwise(0L)).as("n_resize"),
          sum(col("p.w").cast("long")).as("sum_w"),
          sum(col("p.h").cast("long")).as("sum_h"))
        .withColumn("n_frames", lit(nFrames))
    }),
    "q69_xexpt_sum" -> ((s, d) => {
      // xexpt SUM metric (xexpt_ttest_2samp.h: denominator replaced by the
      // traffic-ratio share): group mean = Σy/ratio and diff_relative are
      // DuckDB closed forms; the bucketed stderr → t-statistic is a pinned
      // sf0.01 constant
      val li = t(s, d, "lineitem")
        .withColumn("treat", (col("l_orderkey") % 2).cast("int"))
        .withColumn("uin", col("l_orderkey") * 10 + col("l_linenumber"))
      li.select(functions.xexpt_ttest_2samp(col("uin"), col("treat"),
          Seq(col("l_quantity"), lit(1.0)), metricType = "sum",
          ratios = (0.5, 0.5)).as("r"))
        .select(round(col("r.numerator0"), 2).as("num0"),
          round(col("r.numerator1"), 2).as("num1"),
          round(col("r.mean0"), 2).as("mean0"),
          round(col("r.mean1"), 2).as("mean1"),
          round(col("r.diff_relative"), 6).as("diff_relative"),
          round(col("r.t_statistic"), 6).as("t_stat"),
          lit(sfTag(d)).as("oracle_sf"))
    }),
    "q68_ttest1_cuped" -> ((s, d) => {
      // one-sample CUPED (ttest_common.h:121-131): mean NOT shifted, the
      // variance alone drops by the regression term — θ, variances and the
      // covariance are single-sample DuckDB closed forms
      val li = t(s, d, "lineitem")
      li.select(functions.ttest_1samp("x1", mu = 25.0, cuped = "x2")(
          col("l_quantity"), col("l_discount")).as("r"))
        .select(round(col("r.estimate"), 6).as("estimate"),
          round(col("r.stderr"), 6).as("stderr"))
    }),
    "q67_ttest_pse" -> ((s, d) => {
      // post-stratified t-test (ttest_2samp.h:292-357): per-stratum Welch
      // pieces recombined by stratum share w = n_s/N, variance by w² —
      // DuckDB closed form per stratum. Stratum (orderkey%4) must not
      // determine treatment, so treatment keys on suppkey
      val li = t(s, d, "lineitem")
        .withColumn("treat", (col("l_suppkey") % 2).cast("int"))
        .withColumn("stratum", pmod(col("l_orderkey"), lit(4)))
      li.select(functions.ttest_2samp_pse("x1", col("treat"), col("stratum"))(
          col("l_quantity")).as("r"))
        .select(round(col("r.mean0"), 6).as("mean0"),
          round(col("r.mean1"), 6).as("mean1"),
          round(col("r.estimate"), 6).as("estimate"),
          round(col("r.stderr"), 6).as("stderr"))
    }),
    "q66_ttest_cuped" -> ((s, d) => {
      // CUPED covariate adjustment under the oracle gate (the flagship
      // entry() capability): θ = cov(y,x)/var(x) on the combined sample,
      // per-group mean shifted by θ(x̄_g − x̄), variance reduced by the
      // regression term (ttest_common.h:102-119) — all DuckDB closed forms
      val li = t(s, d, "lineitem").withColumn("treat", (col("l_orderkey") % 2).cast("int"))
      li.select(functions.ttest_2samp("x1", col("treat"), cuped = "x2")(
          col("l_quantity"), col("l_discount")).as("r"))
        .select(round(col("r.mean0"), 6).as("mean0"),
          round(col("r.mean1"), 6).as("mean1"),
          round(col("r.estimate"), 6).as("estimate"),
          round(col("r.stderr"), 6).as("stderr"))
    }),
    "q16_srm" -> ((s, d) => {
      // sample-ratio mismatch: observed quantity share per linestatus vs 50/50
      val li = t(s, d, "lineitem")
      val sums = li.groupBy(col("l_linestatus")).agg(dsum(col("l_quantity")).as("observed"))
      val tot = sums.agg(sum(col("observed")).as("total"), count(lit(1)).as("k"))
      sums.crossJoin(tot)
        .withColumn("expected", col("total") / col("k"))
        .withColumn("chisq_part",
          (col("observed") - col("expected")) * (col("observed") - col("expected")) / col("expected"))
        .agg(round(sum(col("chisq_part")), 6).as("chisq"))
    }),
    "q17_ols" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(functions.ols(col("l_extendedprice"), Seq(col("l_quantity"))).as("m"))
        .select(round(element_at(col("m.coefficients"), 1), 4).as("slope"),
          round(element_at(col("m.coefficients"), 2), 4).as("intercept"),
          round(col("m.r2"), 6).as("r2"))
    }),
    "q18_ttest_1samp" -> ((s, d) => {
      t(s, d, "lineitem")
        .select(functions.ttest_1samp("x1", "two-sided", 25.0)(col("l_quantity")).as("r"))
        .select(round(col("r.estimate"), 6).as("estimate"),
          round(col("r.stderr"), 6).as("stderr"))
    }),
    "q23_mann_whitney" -> ((s, d) => {
      val li = t(s, d, "lineitem").withColumn("treat", (col("l_orderkey") % 2).cast("int"))
      li.select(functions.mann_whitney_utest(col("l_quantity"), col("treat")).as("r"))
        .select(round(col("r.u_statistic"), 4).as("u_statistic"))
    }),
    "q24_ks_test" -> ((s, d) => {
      val li = t(s, d, "lineitem").withColumn("treat", (col("l_orderkey") % 2).cast("int"))
      li.select(functions.kolmogorov_smirnov_test(col("l_quantity"), col("treat")).as("r"))
        .select(round(col("r.d_statistic"), 6).as("d_statistic"))
    }),
    "q25_group_set" -> ((s, d) => {
      val li = t(s, d, "lineitem").withColumn("treat", (col("l_orderkey") % 2).cast("int"))
      graft.ops.GroupSet.groupSet(li, col("l_quantity"), col("treat"),
        Seq("returnflag" -> col("l_returnflag"), "linestatus" -> col("l_linestatus")))
        .select(col("treatment"), col("col_name"), col("col_value"), col("cnt"),
          round(col("sum_y"), 2).as("sum_y"), round(col("sum_y2"), 2).as("sum_y2"))
    }),
    "q26_srm_groups" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      li.select(functions.srm(col("l_quantity"), col("l_returnflag"), Seq(1.0, 1.0, 1.0)).as("r"))
        .select(posexplode(col("r.groups")).as(Seq("pos", "grp")), col("r.observed"), round(col("r.chisq"), 4).as("chisq"))
        .select(col("grp"), round(element_at(col("observed"), col("pos") + 1), 2).as("observed"), col("chisq"))
    }),
    "q27_xexpt" -> ((s, d) => {
      val li = t(s, d, "lineitem").withColumn("treat", (col("l_orderkey") % 2).cast("int"))
      li.select(functions.xexpt_ttest_2samp(col("l_orderkey"), col("treat"),
        Seq(col("l_extendedprice"), col("l_quantity"))).as("r"))
        .select(col("r.groupname0"), col("r.groupname1"),
          round(col("r.numerator0"), 0).as("numerator0"),
          round(col("r.numerator1"), 0).as("numerator1"),
          round(col("r.denominator0"), 0).as("denominator0"),
          round(col("r.denominator1"), 0).as("denominator1"),
          round(col("r.mean0"), 6).as("mean0"),
          round(col("r.mean1"), 6).as("mean1"))
    }),
    "q28_lift_gain" -> ((s, d) => {
      val li = t(s, d, "lineitem").withColumn("treat", (col("l_orderkey") % 2).cast("int"))
      graft.ops.Uplift.liftGain(li, col("l_discount"), col("l_quantity"), col("treat"),
        k = 10, tieBreak = Seq(col("l_orderkey"), col("l_linenumber")))
        .select(round(col("ratio"), 6).as("ratio"), round(col("lift"), 6).as("lift"),
          round(col("gain"), 6).as("gain"), round(col("ate"), 6).as("ate"),
          round(col("random_gain"), 6).as("random_gain"))
    }),
    "q29_exact_matching" -> ((s, d) => {
      val li = t(s, d, "lineitem").withColumn("treat", (col("l_orderkey") % 2).cast("int"))
      val m = graft.ops.Matching.exactMatching(li, col("treat"),
        Seq(col("l_returnflag"), col("l_linestatus")))
      m.filter(col("matching_index") > 0)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n_matched"))
    }),
    "q61_caliper_matching" -> ((s, d) => {
      // the REAL caliper path (reference caliper_matching_info.h:117-146):
      // planted propensity spanning 4 score buckets × l_returnflag exact
      // groups, 1:2 matching. Treated share is 70% in 'N' cells (control
      // capacity binds: pairs = floor(c0/2)) and 20% elsewhere (treated
      // side binds: pairs = c1) — per-cell matched counts are closed form
      // on both regimes.
      val li = t(s, d, "lineitem")
        .withColumn("score", (col("l_orderkey") % 100) / lit(100.0))
        .withColumn("tr",
          when(col("l_returnflag") === "N", (col("l_suppkey") % 10 < 7).cast("int"))
            .otherwise((col("l_suppkey") % 10 < 2).cast("int")))
      val m = graft.ops.Matching.caliperMatching(li, col("tr"), col("score"),
        caliper = 0.25, exactCols = Seq(col("l_returnflag")), k = 2)
      m.groupBy(floor(col("score") / 0.25).cast("long").as("bucket"),
          col("l_returnflag").as("flag"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("tr") === 1 && col("matching_index") > 0, 1L).otherwise(0L))
            .as("matched_treated"),
          sum(when(col("tr") === 0 && col("matching_index") > 0, 1L).otherwise(0L))
            .as("matched_control"))
        .orderBy(col("bucket"), col("flag"))
    }),
    "q30_smd" -> ((s, d) => {
      val li = t(s, d, "lineitem").withColumn("treat", (col("l_orderkey") % 2).cast("int"))
      graft.ops.Matching.smd(li, col("treat"), Seq("l_quantity", "l_discount"))
        .select(col("covariate"), round(col("smd"), 6).as("smd"))
    }),
    "q31_student_ttest" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val li = t(s, d, "lineitem").withColumn("treat", (col("l_orderkey") % 2).cast("int"))
      val r = graft.ops.SimpleTests.studentTtest(li, col("l_extendedprice"), col("treat"))
      val w = graft.ops.SimpleTests.welchTtest(li, col("l_extendedprice"), col("treat"))
      Seq(("student", r.statistic), ("welch", w.statistic)).toDF("test", "stat_raw")
        .select(col("test"), round(col("stat_raw"), 6).as("statistic"))
    }),
    "q32_dml" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      val li = t(s, d, "lineitem")
      val m = graft.ops.Dml.linearDml(li, col("l_extendedprice"), col("l_quantity"),
        Seq(col("l_discount")), cv = 2, foldKey = col("l_orderkey"))
      Seq(m.ate).toDF("theta_raw").select(round(col("theta_raw"), 6).as("theta"))
    }),
    "q33_quantile_bucket" -> ((s, d) => {
      val li = t(s, d, "lineitem").withColumn("treat", (col("l_linenumber") % 2).cast("int"))
      graft.ops.QuantileTest.quantileTestWithBuckets(li, col("l_extendedprice"),
        col("treat"), pmod(col("l_orderkey"), lit(8)), Seq(0.25, 0.5, 0.75))
        .select(col("percentile"),
          round(col("q0"), 2).as("q0"), round(col("q1"), 2).as("q1"),
          round(col("diff"), 2).as("diff"), round(col("stderr"), 2).as("stderr"))
    }),
    "q34_logistic" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      // high-price indicator ~ quantity + discount (IRLS, one agg pass per
      // iteration). Oracle: the MLE is unique and the fit deterministic, so
      // the sf0.01 coefficients are pinned as literals (rounded to 6, far
      // above the partition-order float noise).
      val li = t(s, d, "lineitem")
        .withColumn("y", (col("l_extendedprice") > 30000.0).cast("double"))
      val fit = graft.ops.MlWrappers.logisticIrls(li, col("y"),
        Seq(col("l_quantity"), col("l_discount")), maxIter = 20)
      Seq((fit.coefficients(0), fit.coefficients(1), fit.intercept, fit.converged))
        .toDF("b_raw", "d_raw", "i_raw", "converged")
        .select(round(col("b_raw"), 6).as("b_quantity"),
          round(col("d_raw"), 6).as("b_discount"),
          round(col("i_raw"), 6).as("intercept"), col("converged"),
          lit(sfTag(d)).as("oracle_sf"))
    }),
    // ---------------------------------------------- §2b unit-only → oracled
    "q47_ttests_2samp" -> ((s, d) => {
      // vectorized multi-alpha ttests_2samp in ONE aggregate pass; the
      // alpha-invariant stats oracle exactly, the alpha-dependent CI bounds
      // gate by strict nesting (0.01-CI ⊃ 0.05-CI)
      val li = t(s, d, "lineitem").withColumn("treat", (col("l_orderkey") % 2).cast("int"))
      val Seq(a05, a01) = functions.ttests2Samp("avg(l_quantity)", col("treat"),
        alphas = Seq(0.05, 0.01))
      li.select(a05.as("a05"), a01.as("a01"))
        .select(round(col("a05.estimate"), 6).as("estimate"),
          round(col("a05.stderr"), 6).as("stderr"),
          (round(col("a01.estimate"), 6) === round(col("a05.estimate"), 6)).as("same_estimate"),
          (col("a01.lower") < col("a05.lower")).as("ci_nested_lower"),
          (col("a01.upper") > col("a05.upper")).as("ci_nested_upper"))
    }),
    "q48_predict_interval" -> ((s, d) => {
      // OlsState → predict + confidence interval at 3 probe points
      // (reference evalMLMethod / 11_ols_interval.sql semantics). The t
      // quantile cancels out of se_fit = (upper − fit)/t, so the oracle
      // checks fit and the quadratic-form se against DuckDB regr_* closed
      // forms: se(x0) = σ·sqrt(1/n + (x0−x̄)²/Sxx).
      val li = t(s, d, "lineitem")
      val m = graft.ops.Regression.fitOls(li, col("l_extendedprice"), Seq(col("l_quantity")))
      val tq = graft.stats.Dist.tQuantile(0.975, (m.summary.n - m.summary.k - 1).toDouble)
      val probes = s.range(3).select((col("id") * 15 + 10).cast("double").as("x"))
      probes
        .select(col("x"),
          graft.ops.Regression.predictInterval(m, Seq(col("x"))).as("iv"))
        .select(col("x"), round(col("iv.fit"), 4).as("fit"),
          round((col("iv.upper") - col("iv.fit")) / lit(tq), 4).as("se_fit"),
          (col("iv.upper") > col("iv.fit") && col("iv.fit") > col("iv.lower")).as("ordered"))
        .orderBy(col("x"))
    }),
    "q49_lasso" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      // stochastic linear regression with L1 (Lasso, reference 13_lasso.sql):
      // a pure-noise covariate must shrink to EXACTLY zero under the L1
      // proximal step while the real signal survives. Fit is deterministic
      // (OWL-QN on a fixed layout); coefficients pinned at coarse rounding.
      val li = t(s, d, "lineitem")
        .withColumn("noise", (pmod(col("l_orderkey") * 2654435761L, lit(97L))).cast("double") / 97.0)
      val fit = graft.ops.MlWrappers.stochasticLinearRegression(li,
        col("l_extendedprice"), Seq(col("l_quantity"), col("noise")), l1 = 100.0)
      Seq((fit.coefficients(0), fit.coefficients(1), fit.intercept))
        .toDF("bq_raw", "bn_raw", "i_raw")
        .select(round(col("bq_raw"), 2).as("b_quantity"),
          (col("bn_raw") === 0.0).as("noise_zeroed"),
          round(col("i_raw"), 2).as("intercept"),
          lit(sfTag(d)).as("oracle_sf"))
    }),
    "q50_matrix_mult" -> ((s, d) => {
      // one-pass Gram matrix XᵀX over (l_quantity, l_discount, 1) — every
      // entry a DuckDB closed form
      t(s, d, "lineitem")
        .select(functions.matrix_multiplication(
          Seq(col("l_quantity"), col("l_discount"), lit(1.0))).as("m"))
        .select(
          round(element_at(element_at(col("m.matrix"), 1), 1), 2).as("g_qq"),
          round(element_at(element_at(col("m.matrix"), 1), 2), 4).as("g_qd"),
          round(element_at(element_at(col("m.matrix"), 1), 3), 2).as("g_q1"),
          round(element_at(element_at(col("m.matrix"), 2), 2), 6).as("g_dd"),
          round(element_at(element_at(col("m.matrix"), 2), 3), 4).as("g_d1"),
          round(element_at(element_at(col("m.matrix"), 3), 3), 1).as("g_11"))
    }),
    "q51_bootstrap" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      // generic bootstrap: 50 deterministic Poisson replicates of the mean
      // of l_quantity in one pass (weights are pure functions of
      // (id, rep, seed) — partition-layout invariant), summarized to
      // mean/std/CI. Pinned oracle (q34 idiom).
      val li = t(s, d, "lineitem")
      val reps = graft.ops.Bootstrap.bootstrapAgg(li, b = 50, seed = 42L,
        idCols = Seq(col("l_orderkey"), col("l_linenumber"))) { w =>
        Seq("stat" -> (sum(col("l_quantity") * w) / sum(w)))
      }
      // one job: a separate reps.count() would re-run the replicate
      // pipeline (explode + groupBy) a second time
      val r = reps.agg(count(lit(1)).as("n"), avg(col("stat")).as("m"),
        stddev_samp(col("stat")).as("s"),
        expr("percentile(stat, array(0.025, 0.975))").as("ci")).head()
      val ci = r.getSeq[Double](3)
      Seq((r.getLong(0), r.getDouble(1), r.getDouble(2), ci(0), ci(1)))
        .toDF("n_reps", "m_raw", "s_raw", "l_raw", "u_raw")
        .select(col("n_reps"), round(col("m_raw"), 6).as("boot_mean"),
          round(col("s_raw"), 6).as("boot_std"),
          round(col("l_raw"), 6).as("ci_lower"),
          round(col("u_raw"), 6).as("ci_upper"),
          lit(sfTag(d)).as("oracle_sf"))
    }),
    "q52_permutation" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      // permutation test, 200 deterministic re-randomizations: the observed
      // diff-in-means oracles against DuckDB closed form; the p-value is a
      // deterministic fixture constant (pinned)
      val li = t(s, d, "lineitem")
      val (obs, p, _) = graft.ops.Bootstrap.permutationTest(li,
        col("l_quantity"), (col("l_orderkey") % 2).cast("int"), b = 200,
        idCols = Seq(col("l_orderkey"), col("l_linenumber")))
      Seq((obs, p, 200L)).toDF("obs_raw", "p_raw", "n_reps")
        .select(round(col("obs_raw"), 6).as("observed"),
          round(col("p_raw"), 6).as("p_value"), col("n_reps"),
          lit(sfTag(d)).as("oracle_sf"))
    }),
    "q53_iv_regression" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      // 2SLS: y ~ (t ~ z), single instrument z = t + independent shift →
      // strong first stage; both stages + the naive stage-2 stderr are
      // DuckDB regr_* closed forms
      val li = t(s, d, "lineitem")
        .withColumn("z", col("l_quantity") + (col("l_orderkey") % 5).cast("double"))
      val sm = graft.ops.Regression.ivRegression(li, col("l_extendedprice"),
        col("l_quantity"), col("z"))
      Seq((sm.coefficients(0), sm.coefficients(1), sm.stderr(0)))
        .toDF("b_raw", "i_raw", "se_raw")
        .select(round(col("b_raw"), 4).as("beta_t"),
          round(col("i_raw"), 2).as("intercept"),
          round(col("se_raw"), 4).as("stderr"))
    }),
    "q54_did" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      // difference-in-differences: saturated OLS y ~ treat + post + treat·post
      // equals the 4 interaction-cell means in closed form
      val li = t(s, d, "lineitem")
      val m = graft.ops.Regression.did(li, col("l_extendedprice"),
        (col("l_orderkey") % 2).cast("double"), (col("l_linenumber") % 2).cast("double"))
      val c = m.coefficients
      Seq((c(0), c(1), c(2), c(3))).toDF("bt_raw", "bp_raw", "bi_raw", "b0_raw")
        .select(round(col("bt_raw"), 2).as("b_treat"),
          round(col("bp_raw"), 2).as("b_post"),
          round(col("bi_raw"), 2).as("b_did"),
          round(col("b0_raw"), 2).as("intercept"))
    }),
    "q55_longterm" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      // surrogate-index recursive forecasting, 1 surrogate × 3 observed
      // periods → 2 forecast horizons. The pooled transition is univariate
      // OLS over stacked adjacent pairs and the per-horizon effect is
      // b^h·(diff-in-means of the last observed period) — closed form
      val li = t(s, d, "lineitem")
      val p0 = col("l_quantity")
      val p1 = col("l_quantity") * 0.8 + col("l_discount") * 10.0
      val p2 = col("l_quantity") * 0.6 + col("l_extendedprice") / 10000.0
      val r = graft.ops.Longterm.recursiveForecast(li, Seq(Seq(p0), Seq(p1), Seq(p2)),
        (col("l_orderkey") % 2).cast("int"), horizon = 2, bootstrapB = 50,
        idCols = Seq(col("l_orderkey"), col("l_linenumber")))
      r.effects.zipWithIndex.map { case (e, i) => (i + 1, e.estimate) }
        .toDF("horizon", "est_raw")
        .select(col("horizon"), round(col("est_raw"), 6).as("estimate"))
        .orderBy(col("horizon"))
    }),
    "q63_longterm_multi" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      // VECTOR-surrogate recursive forecasting (2 surrogates × 3 observed
      // periods → 2 horizons): the pooled transition is a 2×2 coefficient
      // matrix W and the per-horizon effect is (W^h · dm)[0] — the DuckDB
      // oracle solves the two 2-regressor normal equations from covariances
      // and applies the literal matrix power
      val li = t(s, d, "lineitem")
      val p0 = Seq(col("l_quantity"), col("l_discount") * 100.0)
      val p1 = Seq(col("l_quantity") * 0.8 + col("l_discount") * 10.0,
        col("l_quantity") * 0.3 + col("l_extendedprice") / 20000.0)
      val p2 = Seq(col("l_quantity") * 0.6 + col("l_extendedprice") / 10000.0,
        col("l_discount") * 5.0 + col("l_quantity") * 0.1)
      val r = graft.ops.Longterm.recursiveForecast(li, Seq(p0, p1, p2),
        (col("l_orderkey") % 2).cast("int"), horizon = 2, bootstrapB = 50,
        idCols = Seq(col("l_orderkey"), col("l_linenumber")))
      r.effects.zipWithIndex.map { case (e, i) => (i + 1, e.estimate) }
        .toDF("horizon", "est_raw")
        .select(col("horizon"), round(col("est_raw"), 6).as("estimate"))
        .orderBy(col("horizon"))
    }),
    "q56_one_hot" -> ((s, d) => {
      // one-hot encode l_returnflag and aggregate the indicators — closed
      // form CASE sums
      val oh = graft.ops.Features.oneHot(t(s, d, "lineitem"), Seq("l_returnflag"))
      oh.groupBy(col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_returnflag_A")).as("n_a"),
          sum(col("l_returnflag_N")).as("n_n"),
          sum(col("l_returnflag_R")).as("n_r"))
    }),
    "q57_cdf_scalars" -> ((s, d) => {
      // distribution scalar surface through the SQL registry (GraftSql):
      // tgamma/lgamma oracle against DuckDB's gamma/lgamma; the normal and
      // Student-t CDFs are math constants pinned per l_linenumber
      graft.GraftSql.register(s)
      t(s, d, "lineitem").groupBy(col("l_linenumber"))
        .agg(count(lit(1)).as("n_rows"))
        .withColumn("x", col("l_linenumber").cast("double"))
        .select(col("l_linenumber"), col("n_rows"),
          round(expr("tgamma(x)"), 4).as("tgamma_x"),
          round(expr("lgamma(x)"), 6).as("lgamma_x"),
          round(expr("cdf_norm(x / 4.0)"), 6).as("norm_cdf"),
          round(expr("cdf(x / 4.0, 10.0)"), 6).as("t_cdf"))
        .orderBy(col("l_linenumber"))
    }),
    "q58_ipw_ate" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      // ATE (diff-in-means) and IPW estimators with bootstrap inference:
      // both point estimates are DuckDB closed forms (propensity is a known
      // deterministic function); the bootstrap stderr is pinned
      val li = t(s, d, "lineitem")
        .withColumn("e", lit(0.3) + lit(0.4) * (col("l_quantity") > 25.0).cast("double"))
        .withColumn("tr", (col("l_orderkey") % 2).cast("int"))
      // the natural key skips the stable-id derivation (full-frame hash +
      // row_number window shuffle) in both bootstrap passes
      val key = Seq(col("l_orderkey"), col("l_linenumber"))
      val ate = graft.ops.Bootstrap.ateEstimator(li, col("l_extendedprice"),
        col("tr"), b = 100, idCols = key)
      val ipw = graft.ops.Bootstrap.ipwEstimator(li, col("l_extendedprice"),
        col("tr"), col("e"), b = 100, idCols = key)
      Seq((ate.estimate, ate.stderr, ipw.estimate))
        .toDF("a_raw", "as_raw", "i_raw")
        .select(round(col("a_raw"), 6).as("ate"),
          round(col("as_raw"), 6).as("ate_stderr"),
          round(col("i_raw"), 6).as("ipw"),
          lit(sfTag(d)).as("oracle_sf"))
    }),
    "q60_gateway_sql" -> ((s, d) => {
      // the SQL gateway end-to-end under the oracle gate: a graft verb
      // (smd) dispatched from raw SQL whose input is a CTE — exercises the
      // Spark-parser rewrite path, not just the Scala DSL
      t(s, d, "lineitem").createOrReplaceTempView("li_gw")
      GraftGateway.sql(s,
        """WITH flagged AS (
          |  SELECT l_quantity, l_discount, CAST(l_orderkey % 2 AS INT) AS treat
          |  FROM li_gw)
          |SELECT smd(treat, l_quantity, l_discount) FROM flagged""".stripMargin)
        .select(col("covariate"), round(col("smd"), 6).as("smd"))
    }),
    "q65_csv_rename_split" -> ((s, d) => {
      // the CSV source, withColumnRenamed, and train/test split under the
      // gate: lineitem round-trips through CSV (explicit schema), a column
      // is renamed, and the deterministic-seed split partitions the rows.
      // n_rows/price_sum are closed forms; the split sizes are pinned
      // per-SF constants (randomSplit is seed+layout deterministic here)
      val spark = s
      import spark.implicits._
      val src = t(s, d, "lineitem").filter(col("l_linenumber") === 1)
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      // per-run unique scratch dir: two concurrent drivers on the same SF
      // (bench + verify) must not overwrite each other's round-trip files
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_csv_${sfTag(d)}_" +
        s.sparkContext.applicationId
      src.coalesce(1).write.mode("overwrite").option("header", "true").csv(dir)
      val csv = s.read.schema(src.schema).option("header", "true").csv(dir)
        .withColumnRenamed("l_extendedprice", "price")
      val (train, test) = {
        val Array(a, b) = csv.randomSplit(Array(0.75, 0.25), seed = 42L)
        (a, b)
      }
      val (nTrain, nTest) = (train.count(), test.count())
      csv.agg(count(lit(1)).as("n_rows"),
          round(sum(dec(col("price"))), 2).cast("double").as("price_sum"))
        .withColumn("n_train", lit(nTrain))
        .withColumn("n_test", lit(nTest))
        .withColumn("split_consistent", (lit(nTrain) + lit(nTest) === col("n_rows")))
        .withColumn("oracle_sf", lit(sfTag(d)))
    }),
    "q64_gateway_compose" -> ((s, d) => {
      // the gateway's SELECT-list composition path end-to-end: a summary
      // verb (smd) sits BESIDE plain aggregates in one SQL statement over a
      // CTE — every output column is a DuckDB closed form
      t(s, d, "lineitem").createOrReplaceTempView("li_gwc")
      GraftGateway.sql(s,
        """WITH flagged AS (
          |  SELECT l_quantity, l_discount, CAST(l_orderkey % 2 AS INT) AS treat
          |  FROM li_gwc)
          |SELECT count(*) AS n_rows, smd(treat, l_quantity, l_discount)
          |FROM flagged""".stripMargin)
        .select(col("n_rows"), col("covariate"), round(col("smd"), 6).as("smd"))
        .orderBy(col("covariate"))
    }),
    "q59_wls" -> ((s, d) => {
      // weighted least squares (reference 5_wls.sql): integer weights from
      // the line number; slope/intercept have exact closed forms over
      // weighted sums
      val li = t(s, d, "lineitem")
        .withColumn("w", (col("l_linenumber") % 3 + 1).cast("double"))
      li.select(functions.wls(col("l_extendedprice"), Seq(col("l_quantity")),
        col("w")).as("m"))
        .select(round(element_at(col("m.coefficients"), 1), 4).as("slope"),
          round(element_at(col("m.coefficients"), 2), 2).as("intercept"))
    }),
    "q44_winnow_dupes" -> ((s, d) => {
      // winnowing (rolling-hash) fingerprint duplicate pairs: 50 docs + 50
      // planted exact copies; exact copies share the whole fingerprint set
      // (sim 1.0) and no two of the first 50 docs are normalized-equal at
      // either SF (natural near-dups top out below 1.0), so the oracle is
      // closed form
      val docs = t(s, d, "documents").filter(col("doc_id") < 50)
      val all = docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 10000))
      graft.ops.Dedup.winnowPairs(all, col("doc_id"), col("text"),
          threshold = 1.0)
        .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim"))
    }),
    "q45_image_decode" -> ((s, d) => {
      // REAL image decode (javax.imageio): encode a deterministic solid
      // 8×8 PNG per part row (channel values from the key), decode it back,
      // and aggregate the per-channel means — a solid n=2^k image decodes
      // to mean exactly c/255, so the oracle is closed form over `part`
      val p = graft.ops.Par.ensure(t(s, d, "part").select(
        col("p_partkey").cast("long").as("id"),
        (col("p_partkey") % 251).cast("int").as("r"),
        (col("p_partkey") % 241).cast("int").as("g"),
        (col("p_partkey") % 239).cast("int").as("b")))
      val png = p.withColumn("content",
        graft.ops.Multimodal.solidPng(col("r"), col("g"), col("b"), lit(8), lit(8)))
      graft.ops.Multimodal.decodeImages(png.select(col("id"), col("content")))
        .groupBy((col("id") % 10).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("decode_ok").cast("long")).as("n_ok"),
          sum(col("width").cast("long")).as("sum_w"),
          sum(col("height").cast("long")).as("sum_h"),
          round(sum(element_at(col("means"), 1)), 6).as("sum_mean_r"),
          round(sum(element_at(col("means"), 2)), 6).as("sum_mean_g"),
          round(sum(element_at(col("means"), 3)), 6).as("sum_mean_b"),
          round(sum(element_at(col("stds"), 1) + element_at(col("stds"), 2)
            + element_at(col("stds"), 3)), 6).as("sum_std"))
        .orderBy(col("bucket"))
    }),
    "q46_ivf_recall" -> ((s, d) => {
      // IVF quality gate: ivfKnn at nprobe=4 of 16 cells vs the exact
      // brute-force top-5, on a corpus with PLANTED near-neighbors — 5
      // scaled copies per probe (scaling preserves direction, so cosine is
      // exactly 1 and the copy lands in the probe's own IVF cell). ANN
      // recall is only meaningful on clustered data: on this table's
      // structureless uniform embeddings a probe's true neighbors sit in
      // arbitrary cells and recall ≈ nprobe/cells by construction (~0.59
      // here), which no index can beat. Everything is seeded and tie-broken
      // (sim desc, neighbor_id), so the recall is a deterministic fixture
      // constant.
      val e = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val probes = e.filter(col("vec_id") < 20)
        .select(col("vec_id").as("pid"), col("v").as("q"))
      val planted = probes
        .withColumn("j", explode(sequence(lit(1), lit(5))))
        .select((col("pid") * 10 + col("j") + 100000L).as("vec_id"),
          transform(col("q"), x => x * (lit(1.0) + col("j").cast("double") * lit(1e-6))).as("v"))
      val corpus = e.unionByName(planted)
      val idx = graft.ops.Ann.trainIvf(corpus, col("v"), numCells = 16,
        sampleSize = 500, seed = 7L)
      val brute = graft.ops.Ann.bruteForceKnn(corpus, col("vec_id"), col("v"),
        probes, col("pid"), col("q"), k = 5)
        .select(col("query_id"), col("neighbor_id"))
      val ivf = graft.ops.Ann.ivfKnn(corpus, col("vec_id"), col("v"),
        probes, col("pid"), col("q"), idx, k = 5, nprobe = 4)
        .select(col("query_id"), col("neighbor_id"))
      // one job for both counts: a separate brute.count() would evaluate
      // the brute KNN twice (IVF pairs are unique per key, so the left
      // join cannot duplicate rows)
      val cnt = brute.join(ivf.withColumn("__hit", lit(1)),
          Seq("query_id", "neighbor_id"), "left_outer")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("__hit"), lit(0))).as("n_hit")).head()
      val nTrue = cnt.getLong(0)
      val nHit = cnt.getLong(1)
      val recall = if (nTrue == 0) 0.0 else nHit.toDouble / nTrue
      // the gate GATES: an IVF quality regression fails the query loudly
      // instead of writing a false row nothing reads
      require(recall >= 0.95,
        f"q46 IVF recall gate failed: recall=$recall%.4f < 0.95 ($nHit/$nTrue)")
      import s.implicits._
      Seq((20L, 5, nTrue, nHit,
        math.rint(recall * 10000) / 10000, recall >= 0.95, sfTag(d)))
        .toDF("n_queries", "k", "n_true", "n_hit", "recall", "pass", "oracle_sf")
    }),
    "q43_connected_components" -> ((s, d) => {
      // distributed min-label propagation with pointer jumping over planted
      // 50-long duplicate chains (edges (id-1, id) except at chain starts);
      // the oracle is closed form: component = floor(id/50)*50
      val ids = t(s, d, "documents").select(col("doc_id")).filter(col("doc_id") < 1000)
      val edges = ids.filter(col("doc_id") % 50 =!= 0)
        .select((col("doc_id") - 1).as("id_a"), col("doc_id").as("id_b"))
      graft.ops.Dedup.connectedComponents(edges)
        .select(col("id"), col("component"))
        .orderBy(col("id"))
    }),
    "q42_causal_forest" -> ((s, d) => {
      // planted-effect oracle (mirrors the reference's own tree fixtures,
      // uplift.py:1243-1895): y = 10 + 5·h + treat·(2 + 8·h) + u with
      // h = 1{l_quantity > 25} and u deterministic hash noise in ±0.5 whose
      // per-cell mean ~0. An honest forest must recover τ=2 on h=0 and τ=10
      // on h=1; with the τ gap at 8 and leaf noise ≪ 0.5, the segment
      // averages round to exactly those integers. Scoring goes through the
      // leaf-table scale path (Model.score), not the when-chain sum.
      val li = plantedEffect(t(s, d, "lineitem"))
      val fs = Seq("l_quantity" -> col("l_quantity"), "l_discount" -> col("l_discount"))
      val m = graft.ops.CausalForest.fit(li, col("y"), col("treat"), fs,
        numTrees = 8, maxDepth = 3, minNodeSize = 100, bins = 50)
      m.score(li, Seq(col("l_quantity"), col("l_discount")), "eff", "se")
        .groupBy(col("h").cast("int").as("segment"))
        .agg(count(lit(1)).as("n_rows"),
          round(avg(col("eff")), 0).as("recovered_effect"),
          round(avg(when(col("se") > 0.0, 1.0).otherwise(0.0)), 0).as("se_positive"))
        .orderBy(col("segment"))
    }),
    "q41_causal_tree" -> ((s, d) => {
      // same planted-effect oracle as q42 on a single honest tree
      val li = plantedEffect(t(s, d, "lineitem"))
      val fs = Seq("l_quantity" -> col("l_quantity"), "l_discount" -> col("l_discount"))
      val m = graft.ops.CausalTree.fit(li, col("y"), col("treat"), fs,
        maxDepth = 3, minNodeSize = 50, bins = 50)
      li.withColumn("eff", m.effectColumn(Seq(col("l_quantity"), col("l_discount"))))
        .groupBy(col("h").cast("int").as("segment"))
        .agg(count(lit(1)).as("n_rows"),
          round(avg(col("eff")), 0).as("recovered_effect"))
        .orderBy(col("segment"))
    }),
    "q97_uplift_eval" -> ((s, d) => {
      // population ATE / ROI / iROI point estimates (spark_evaluation.py's
      // estimate_ate / estimate_roi / estimate_iroi, bootstrap off) on a
      // deterministic lineitem fixture — every metric a DuckDB closed form.
      // benefit/cost differ by arm so incremental cost is large and the
      // iROI ratio is rounding-stable.
      val tr = (col("l_orderkey") % 2).cast("int")
      val li = t(s, d, "lineitem").select(tr.as("tr"),
          col("l_quantity").cast("double").as("y"),
          (col("l_extendedprice") / 1000.0 *
            (lit(1.0) + lit(0.5) * tr)).as("ben"),
          (col("l_quantity") * (lit(1.0) + tr)).as("cost"))
        .persist()
      val ate = graft.ops.UpliftEval.estimateAte(li, col("y"), col("tr"))
        .select(col("count").cast("long").as("n"),
          round(col("target_rate_treated"), 6).as("rate_t"),
          round(col("target_rate_control"), 6).as("rate_c"),
          round(col("ate"), 6).as("ate"))
      val roi = graft.ops.UpliftEval.estimateRoi(li, col("ben"), col("cost"))
        .select(round(col("roi"), 6).as("roi"))
      val iroi = graft.ops.UpliftEval.estimateIroi(li, col("ben"), col("cost"), col("tr"))
        .select(round(col("incremental_benefit"), 2).as("inc_benefit"),
          round(col("incremental_cost"), 2).as("inc_cost"),
          round(col("iroi"), 6).as("iroi"))
      val res = ate.crossJoin(roi).crossJoin(iroi)
      res.persist(); res.count(); li.unpersist()
      res
    }),
    "q98_qini_curve" -> ((s, d) => {
      // qini curve over pre-assigned buckets (estimate_qini with the
      // bucket column supplied): cumulative ATE × cumulative fraction from
      // the top bucket down, origin row included, AUUC as the trapezoid
      // over the curve — all closed forms DuckDB replays with windows
      val li = t(s, d, "lineitem").select(
          (col("l_quantity").cast("int") % 5).as("bucket"),
          (col("l_orderkey") % 2).cast("int").as("tr"),
          (col("l_extendedprice") / 1000.0).as("y"))
        .persist()
      val qini = graft.ops.UpliftEval.estimateQini(li, score = lit(null),
        target = col("y"), treatment = col("tr"), nBuckets = 0)
      qini.persist()
      val auucVal = graft.ops.UpliftEval.auuc(qini)
      val res = qini.select(col("bucket").cast("int").as("bucket"),
        col("count").cast("double").as("n_cum"),
        round(col("fraction"), 6).as("fraction"),
        round(col("ate"), 6).as("qini"),
        round(lit(auucVal), 6).as("auuc"))
      res.persist(); res.count()
      qini.unpersist(); li.unpersist()
      res
    }),
    "q99_eval_ci" -> ((s, d) => {
      // estimate_ate with 50 deterministic Poisson bootstrap replicates:
      // observed + all replicates in ONE scan (rep = -1 idiom); the point
      // estimate oracles closed-form, the CI band is a pinned fixture
      // constant (q51 idiom — weights are pure functions of (id, rep,
      // seed), partition-layout invariant)
      graft.ops.UpliftEval.estimateAte(t(s, d, "lineitem"),
          col("l_quantity"), (col("l_orderkey") % 2).cast("int"),
          bootstrapB = 50,
          idCols = Seq(col("l_orderkey"), col("l_linenumber")))
        .select(round(col("ate"), 6).as("ate"),
          round(col("ate_lower"), 6).as("ate_lower"),
          round(col("ate_upper"), 6).as("ate_upper"),
          round(col("ate_std_error"), 6).as("ate_std_error"),
          lit(sfTag(d)).as("oracle_sf"))
    }),
    "q104_cate_quantile" -> ((s, d) => {
      // catePerQuantile end-to-end: EXACT quantile splits over a discrete
      // score ((l_orderkey % 97)/97 — ~620 rows per level at the gate SF,
      // so every interpolated split lands inside a run of equal values and
      // both engines compute the identical k/97 double); left-closed
      // assignment replayed in SQL
      val li = t(s, d, "lineitem").select(
        ((col("l_orderkey") % 97).cast("double") / 97.0).as("score"),
        (col("l_partkey") % 2).cast("int").as("tr"),
        col("l_quantity").cast("double").as("y"))
      graft.ops.UpliftEval.catePerQuantile(li, col("y"), col("tr"),
          col("score"), nBuckets = 4, exactSplits = true)
        .select(col("bucket"),
          round(col("threshold"), 6).as("threshold"),
          col("count").cast("long").as("n_rows"),
          round(col("fraction"), 6).as("fraction"),
          round(col("ate"), 6).as("cate"))
        .orderBy(col("bucket"))
    }),
    "q103_perplexity" -> ((s, d) => {
      // corpus-trained add-one bigram LM perplexity (the CCNet-class
      // quality signal): train + score are keyed exchanges; per-lang
      // roll-up for a closed-form DuckDB oracle
      val docs = t(s, d, "documents")
      val m = graft.ops.NgramLm.train(docs, col("text"))
      val scored = graft.ops.NgramLm.scorePerplexity(docs, col("doc_id"),
        col("text"), m)
      scored.join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_bigrams")).as("n_bigrams"),
          round(avg(col("avg_logp")), 6).as("mean_logp"),
          round(avg(col("perplexity")), 4).as("mean_ppl"))
        .orderBy(col("lang"))
    }),
    "q102_simulated_trial" -> ((s, d) => {
      // distributed Nie-Wager Setup B generator: every draw is a pure
      // function of (id, tag, seed), so the per-arm moments are pinned
      // constants at ANY partition layout and ANY sf (the query reads no
      // table — no oracle_sf tag needed)
      val df = graft.ops.Simulate.randomizedTrial(s, n = 100000L, seed = 11L)
      df.groupBy(col("treatment"))
        .agg(count(lit(1)).as("n_rows"),
          round(avg(col("outcome")), 6).as("avg_outcome"),
          round(avg(col("actual_cate")), 6).as("avg_cate"),
          round(avg(col("expected_outcome")), 6).as("avg_baseline"))
        .orderBy(col("treatment"))
    }),
    "q192_pr_curve" -> ((s, d) => {
      // precision-recall + average precision over the q100 fixture —
      // the imbalance-honest readout; same bounded cell construction,
      // AP as the step integral over descending thresholds
      val li = t(s, d, "lineitem")
      graft.ops.MlEval.prCurve(li,
          (col("l_extendedprice") > 30000.0).cast("int"),
          col("l_quantity") / 50.0,
          thresholds = (1 to 9).map(_ / 10.0))
        .select(round(col("threshold"), 2).as("threshold"),
          col("tp"), col("fp"), col("fn"),
          round(col("precision"), 6).as("precision"),
          round(col("recall"), 6).as("recall"),
          round(col("f1"), 6).as("f1"), round(col("ap"), 6).as("ap"))
        .orderBy(col("threshold"))
    }),
    "q100_roc_curve" -> ((s, d) => {
      // ROC over explicit thresholds (ml_spark.py ROC_curve): one scan
      // folds each row to its threshold-coverage index — no ARRAY JOIN row
      // amplification — and the confusion counts are suffix sums over the
      // tiny cell table. Integer-ratio score and decimal thresholds are
      // IEEE-identical in both engines.
      val li = t(s, d, "lineitem")
      val roc = graft.ops.MlEval.rocCurve(li,
        (col("l_extendedprice") > 30000.0).cast("int"),
        col("l_quantity") / 50.0,
        thresholds = (1 to 9).map(_ / 10.0))
      val aucVal = graft.ops.MlEval.rocAuc(roc)
      roc.select(round(col("threshold"), 2).as("threshold"),
        col("tp"), col("fp"), col("tn"), col("fn"),
        round(col("tpr"), 6).as("tpr"), round(col("fpr"), 6).as("fpr"),
        round(lit(aucVal), 6).as("auc"))
    }),
    "q101_corr_matrix" -> ((s, d) => {
      // pairwise Pearson matrix in ONE Gram-matrix scan (tools.py
      // find_correlation_matrix); long form oracles directly against
      // DuckDB's corr()
      graft.ops.MlEval.corrMatrix(t(s, d, "lineitem"), Seq(
          "l_quantity" -> col("l_quantity"),
          "l_extendedprice" -> col("l_extendedprice"),
          "l_discount" -> col("l_discount")))
        .select(col("x_col"), col("y_col"), round(col("corr"), 6).as("corr"))
    }),
    "q96_vocabulary" -> ((s, d) => {
      // tokenizer-vocab primitive: top-20 corpus tokens, (count desc,
      // token) total order so the limit is deterministic on both engines
      graft.ops.TextOps.vocabulary(t(s, d, "documents"), col("text"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    }),
    "q95_quality_filter" -> ((s, d) => {
      // the Gopher hard filter as a loss report: per-rule drop counts.
      // Token and mean-word-length bounds bind on this corpus (10..99
      // tokens, mwl 3.7..5.3); the repetition/stopword caps are set
      // permissive so the oracle needs only SQL-replicable signals.
      val r = graft.ops.TextOps.gopherFilter(col("text"),
        graft.ops.TextOps.GopherRules(minTokens = 30, maxTokens = 80,
          minMeanWordLen = 4.0, maxMeanWordLen = 5.0,
          maxDupLineRatio = 1.0, maxTopBigramShare = 1.0,
          minStopwordRatio = 0.0))
      t(s, d, "documents").select(r.as("r"))
        .groupBy(col("r.keep").as("keep"),
          coalesce(col("r.reason"), lit("kept")).as("reason"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy(col("keep"), col("reason"))
    }),
    "q94_forest_verb" -> ((s, d) => {
      // the causal_forest gateway verb end-to-end: train through SQL, get
      // the variable-importance summary. On the planted fixture the effect
      // is a pure function of h, so h's importance rounds to 1 and the
      // noise feature's to 0 (q41 recovery idiom).
      plantedEffect(t(s, d, "lineitem"))
        .createOrReplaceTempView("li_forest_verb")
      GraftGateway.sql(s,
        "SELECT causal_forest(y, treat, h, l_discount, 8, 3, 100) FROM li_forest_verb")
        .select(col("term"), round(col("importance"), 0).as("importance"))
        .orderBy(col("term"))
    }),
    "q93_sql_train_eval" -> ((s, d) => {
      // the reference's ols_train → eval_ml_method model-in-SQL flow with
      // no Scala in the loop: a scalar subquery trains the model value
      // (coefficient array, intercept last) and eval_ml_method applies it
      // per row. One feature keeps the DuckDB mirror closed-form
      // (regr_slope/regr_intercept).
      GraftSql.register(s)
      t(s, d, "lineitem").createOrReplaceTempView("li_train_eval")
      s.sql(
        """SELECT l_returnflag, count(*) AS n_rows,
          |  round(avg(eval_ml_method(
          |    (SELECT ols_train(l_extendedprice, l_quantity) FROM li_train_eval),
          |    l_quantity)), 2) AS avg_pred
          |FROM li_train_eval GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    }),
    "q87_eval_forest_sql" -> ((s, d) => {
      // eval_ml_method's stored-model dispatch end-to-end (the reference
      // routes on model type to ols | causal_forest,
      // udf/starrocks/.../eval_ml_method.cpp:65-67): fit an honest forest
      // on the planted-effect fixture, persist it with ModelIo, and score
      // it THROUGH spark.sql by path — the segment averages recover the
      // planted τ exactly as q42's Scala-side scoring does.
      val li = plantedEffect(t(s, d, "lineitem"))
      val fs = Seq("l_quantity" -> col("l_quantity"), "l_discount" -> col("l_discount"))
      val m = graft.ops.CausalForest.fit(li, col("y"), col("treat"), fs,
        numTrees = 8, maxDepth = 3, minNodeSize = 100, bins = 50)
      // per-run unique model path (the q65 scratch idiom), and a cache
      // clear so a bench pass re-reading the overwritten path never scores
      // a stale forest
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_forest_${sfTag(d)}_" +
        s.sparkContext.applicationId
      graft.ops.ModelIo.saveCausalForest(s, m, dir)
      GraftSql.clearModelCache()
      GraftSql.register(s) // idempotent; Verify's session has no extensions
      li.createOrReplaceTempView("li_forest_eval")
      s.sql(
        s"""SELECT CAST(h AS INT) AS segment, count(*) AS n_rows,
           |  round(avg(eval_ml_method('$dir', l_quantity, l_discount)), 0) AS recovered_effect
           |FROM li_forest_eval GROUP BY 1 ORDER BY 1""".stripMargin)
    }),
    "q89_meta_learners" -> ((s, d) => {
      // S/T/X meta-learners on the planted-effect fixture with the segment
      // indicator as a feature — every stage is correctly specified, so
      // each learner's per-segment average recovers the planted τ (2, 10)
      // exactly after rounding (the q41 idiom). One scan for S, one for T,
      // two for X — the arm fits fuse via indicator-weighted multi-OLS.
      val li = plantedEffect(t(s, d, "lineitem"))
      val xs = Seq(col("h"), col("l_discount"))
      val sm = graft.ops.MetaLearners.sLearner(li, col("y"), col("treat"), xs)
      val tm = graft.ops.MetaLearners.tLearner(li, col("y"), col("treat"), xs)
      val xm = graft.ops.MetaLearners.xLearner(li, col("y"), col("treat"), xs)
      li.select(col("h"),
          sm.effectColumn(xs).as("s_eff"),
          tm.effectColumn(xs).as("t_eff"),
          xm.effectColumn(xs).as("x_eff"))
        .groupBy(col("h").cast("int").as("segment"))
        .agg(count(lit(1)).as("n_rows"),
          round(avg(col("s_eff")), 0).as("s_learner_effect"),
          round(avg(col("t_eff")), 0).as("t_learner_effect"),
          round(avg(col("x_eff")), 0).as("x_learner_effect"))
        .orderBy(col("segment"))
    }),
    "q90_uplift_estimators" -> ((s, d) => {
      // CVT / Propensity / Retrospective estimators (the reference's other
      // three upliftml classes) with a SATURATED logistic base — the only
      // feature is the segment indicator, so each fitted score equals a
      // closed-form cell statistic the oracle replays in SQL (the
      // saturated-logistic MLE IS the cell mean; IRLS tol 1e-8 ≪ the 1e-6
      // rounding). Scores are constant per cell, so the per-cell avg is the
      // score itself.
      // cached: three IRLS fits iterate over this 3-column frame ~10 times
      // each — without the cache every iteration re-scans the parquet
      val li = t(s, d, "lineitem").select(
        (col("l_quantity") > 25).cast("int").as("seg"),
        (col("l_orderkey") % 2).cast("int").as("treat"),
        (col("l_extendedprice") > 30000.0).cast("int").as("y"))
        .persist()
      val xs = Seq(col("seg"))
      val cm = graft.ops.MetaLearners.cvt(li, col("y"), col("treat"), xs)
      val pSimple = graft.ops.MetaLearners.propensity(li, col("treat"))
      val pModel = graft.ops.MetaLearners.propensity(li, col("treat"), xs)
      val rm = graft.ops.MetaLearners.retrospective(li, col("y"), col("treat"), xs)
      val res = li.select(col("seg"), col("treat"),
          cm.effectColumn(xs).as("cvt"),
          pSimple.propensityColumn(col("treat")).as("ps"),
          pModel.propensityColumn(col("treat"), xs).as("pm"),
          rm.scoreColumn(xs).as("retro"))
        .groupBy(col("seg"), col("treat"))
        .agg(count(lit(1)).as("n_rows"),
          round(avg(col("cvt")), 6).as("cvt_score"),
          round(avg(col("ps")), 6).as("propensity_simple"),
          round(avg(col("pm")), 6).as("propensity_model"),
          round(avg(col("retro")), 6).as("retrospective_score"))
        .orderBy(col("seg"), col("treat"))
      res.persist()
      res.count()
      li.unpersist()
      res
    }),
    "q88_kaplan_meier" -> ((s, d) => {
      // Kaplan-Meier with censoring over a data-derived cohort: time =
      // integer quantity (50 distinct times), event = linenumber parity
      // (~4/7 events). DuckDB replays the textbook estimator exactly, so
      // every column is a closed form on the same derivation — no pinning.
      val subj = t(s, d, "lineitem").select(
        col("l_quantity").cast("int").as("time"),
        (col("l_linenumber") % 2).cast("int").as("event"))
      graft.ops.Survival.kaplanMeier(subj, col("time"), col("event"))
        .select(col("time"), col("n_risk"), col("n_event"), col("n_censored"),
          round(col("survival"), 6).as("survival"))
        .orderBy(col("time"))
    }),
    // ------------------------------------------------- data-pipeline (north star)
    "q19_dedup_exact" -> ((s, d) => {
      t(s, d, "documents")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_unique"),
          (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dupes"))
    }),
    "q20_text_stats" -> ((s, d) => {
      t(s, d, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), "\\s+"))).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"))
    }),
    "q21_events_agg" -> ((s, d) => {
      t(s, d, "events").groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"),
          countDistinct(col("user_id")).as("n_users"))
    }),
    "q35_token_stats" -> ((s, d) => {
      val ops = graft.ops.TextOps
      t(s, d, "documents").groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(ops.tokenCount(col("text"))).as("bpe_tokens"),
          round(avg(ops.charsPerToken(col("text"))), 6).as("avg_chars_per_token"))
    }),
    "q36_ngram_jaccard" -> ((s, d) => {
      // shingle each doc ONCE before the pair join — shingling inside the
      // join projection would re-split every text once per pair (49× here).
      // Suffix-modified copies (doc_id+10000) plant pairs with jaccard
      // n/(n+3) ≈ 0.9, so the threshold filter has real rows to keep (no
      // two natural docs clear 0.3 — the check would otherwise be vacuous)
      val base36 = t(s, d, "documents").filter(col("doc_id") < 25)
        .select(col("doc_id"), col("text"))
      val modified = base36.select((col("doc_id") + 10000).as("doc_id"),
        concat(col("text"), lit(" zz yy xx")).as("text"))
      val docs = base36.unionByName(modified)
        .select(col("doc_id"), graft.ops.TextOps.shingles(col("text"), 2).as("sh"))
      val a = docs.select(col("doc_id").as("id_a"), col("sh").as("sa"))
      val b = docs.select(col("doc_id").as("id_b"), col("sh").as("sb"))
      a.join(b, col("id_a") < col("id_b"))
        .withColumn("jaccard",
          size(array_intersect(col("sa"), col("sb"))).cast("double") /
            greatest(size(array_union(col("sa"), col("sb"))), lit(1)).cast("double"))
        .filter(col("jaccard") >= 0.3)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),
    "q37_minhash_pairs" -> ((s, d) => {
      // collapseExact=false: the oracle is the TRUE all-pairs jaccard>=0.9
      // SQL join, which requires full pair multiplicity — sf0.01 has one
      // signature-identical doc pair (267, 413) that the default collapse
      // would rep-reduce. The capped band buckets still bound the plan.
      // maxBucket raised to 20000 for the ALL-PAIRS AUDIT contract this
      // query states: at sf1 the salted template corpus concentrates
      // whole copy-families into single band buckets past the 500
      // production default, and a dropped bucket loses real J>=0.9 pairs
      // the exact SQL oracle keeps (19 of 222k measured). The audit cap
      // still bounds the plan; production pipelines keep collapseExact
      // =true + the default cap (the documented recall/scale trade).
      graft.ops.Dedup.minHashLsh(t(s, d, "documents"), col("doc_id"), col("text"),
        numHashes = 96, bands = 16, shingleN = 2, threshold = 0.9,
        collapseExact = false, maxBucket = 20000)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
    }),
    "q38_simhash_pairs" -> ((s, d) => {
      // simhash itself is not expressible in ANSI SQL, but the pipeline is
      // fully deterministic (seeded xxhash64, layout-invariant groupBy
      // counts) → the sf0.01 per-hamming pair counts are pinned as a
      // literal oracle, like q34's MLE constants
      graft.ops.Dedup.simHashPairs(t(s, d, "documents"), col("doc_id"), col("text"),
        maxHamming = 16)
        .groupBy(col("hamming")).agg(count(lit(1)).as("n_pairs"))
        .withColumn("oracle_sf", lit(sfTag(d)))
    }),
    "q39_embed_neardup" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val planted = e.filter(col("vec_id") < 50)
        .withColumn("vec_id", col("vec_id") + 10000)
      graft.ops.Dedup.embeddingNearDup(e.unionByName(planted),
        col("vec_id"), col("embedding"), threshold = 0.99, bits = 4)
        .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
    }),
    "q40_dedup_pipeline" -> ((s, d) => {
      // full dedup pipeline on a corpus with planted exact dups:
      // exact-fingerprint dedup (xxhash64 → rows-only check)
      val docs = t(s, d, "documents")
      val planted = docs.filter(col("doc_id") < 100)
        .withColumn("doc_id", col("doc_id") + 10000)
      val out = graft.ops.Dedup.exactDedup(docs.unionByName(planted),
        col("text"), col("doc_id"))
      out.agg(count(lit(1)).as("n_after"),
        sum(when(col("doc_id") >= 10000, 1L).otherwise(0L)).as("n_planted_kept"))
    }),
    "q22_embedding_knn" -> ((s, d) => {
      // brute-force cosine top-3 neighbors for 5 probe vectors — the exact
      // baseline an IVF/LSH variant must reproduce (north-star ANN)
      val e = t(s, d, "embeddings")
        .withColumn("embedding", col("embedding").cast("array<double>"))
      val probes = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      val cosSim = {
        val dot = aggregate(zip_with(col("qv"), col("embedding"), (a, b) => a * b),
          lit(0.0), (acc, x) => acc + x)
        val nq = sqrt(aggregate(transform(col("qv"), x => x * x), lit(0.0), (a, x) => a + x))
        val nv = sqrt(aggregate(transform(col("embedding"), x => x * x), lit(0.0), (a, x) => a + x))
        dot / (nq * nv)
      }
      val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("vec_id"))
      probes.join(e, col("vec_id") =!= col("query_id"))
        .withColumn("sim", cosSim)
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("query_id"), col("vec_id").as("neighbor_id"), round(col("sim"), 4).as("sim"))
    }),
    "q105_tfidf" -> ((s, d) => {
      // TF-IDF + BM25 term scoring: idf/avgdl from the FULL corpus, then
      // top-3 terms for a 1-in-57 sample of documents. tf/df/dl are exact
      // integers and idf/bm25 pure IEEE arithmetic on them, so both
      // engines agree to well past 6 decimals.
      val docs = t(s, d, "documents")
      val scored = graft.ops.TfIdf.termScores(docs, col("doc_id"), col("text"))
      graft.ops.TfIdf.topTerms(scored, 3)
        .filter(col("doc_id") % 57 === 0)
        .select(col("doc_id"), col("rank"), col("token"), col("tf"),
          col("df"), round(col("idf"), 6).as("idf"),
          round(col("tfidf"), 6).as("tfidf"),
          round(col("bm25"), 6).as("bm25"))
        .orderBy(col("doc_id"), col("rank"))
    }),
    "q124_power_analysis" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      // pre-experiment planning: sigma from the data, then per-arm n for
      // delta=0.5 and the MDE at the observed arm size — the oracle
      // replays the normal-approximation forms with 16-digit z constants
      val r = t(s, d, "lineitem").agg(
        stddev_samp(col("l_quantity")).as("sd"),
        (count(lit(1)) / 2).cast("double").as("npa")).head()
      val (sd, npa) = (r.getDouble(0), r.getDouble(1))
      val n = graft.ops.SimpleTests.sampleSizePerArm(sd, delta = 0.5)
      val m = graft.ops.SimpleTests.mde(sd, npa)
      Seq((sd, n, m)).toDF("sd_raw", "n_raw", "m_raw")
        .select(round(col("sd_raw"), 6).as("sigma"),
          round(col("n_raw"), 2).as("n_per_arm"),
          round(col("m_raw"), 6).as("mde"))
    }),
    "q144_audio_neardup" -> ((s, d) => {
      // volume-invariant audio near-dup (q143's audio twin): every part
      // row renders a deterministic block-pattern mono WAV; 1-in-20 gains
      // an exact half-volume copy (even amplitudes, no rounding) —
      // exactly the planted copies pair at hamming 0
      // copy ids carry a high-bit tag (1L<<40), provably above any part
      // key range — a fixed 100000 offset would collide with real keys
      // at sf >= ~0.5 and perturb the pair counts
      val base = t(s, d, "part").select(col("p_partkey").cast("long").as("id"))
      val wavs = base.select(col("id"),
          graft.ops.Multimodal.patternWav(col("id"), lit(2000), lit(16000),
            lit(1)).as("content"))
        .unionByName(base.filter(col("id") % 20 === 0)
          .select((col("id") + (1L << 40)).as("id"),
            graft.ops.Multimodal.patternWav(col("id"), lit(2000), lit(16000),
              lit(2)).as("content")))
      val hashed = graft.ops.Multimodal.audioFingerprint(wavs)
      val pairs = graft.ops.Dedup.hammingPairs(hashed, col("id"),
        col("afp"), maxHamming = 3)
      hashed.agg(count(lit(1)).as("n_clips"),
          sum(col("decode_ok").cast("long")).as("n_decoded"))
        .crossJoin(pairs.agg(count(lit(1)).as("n_pairs"),
          sum(col("id_a") + col("id_b")).as("pair_id_sum"),
          max(col("hamming")).as("max_hamming")))
    }),
    "q143_image_neardup" -> ((s, d) => {
      // perceptual image near-dup end-to-end: every part row renders a
      // deterministic block-pattern PNG; 1-in-20 gains a +20-brightness
      // copy (id + 2^40 tag). dHash is exactly invariant to the uniform shift
      // (patterns live in [40,200], no clip), so precisely the planted
      // copies pair at hamming 0 and the pair set is a closed form
      // copy ids: high-bit tag, same rationale as q144
      // parallelize BEFORE the render projection: repartitioning after
      // would shuffle the rendered bytes and still render on one core
      val base = graft.ops.Par.ensure(
        t(s, d, "part").select(col("p_partkey").cast("long").as("id")))
      val imgs = base.select(col("id"),
          graft.ops.Multimodal.patternPng(col("id"), lit(64), lit(64),
            lit(0)).as("content"))
        .unionByName(base.filter(col("id") % 20 === 0)
          .select((col("id") + (1L << 40)).as("id"),
            graft.ops.Multimodal.patternPng(col("id"), lit(64), lit(64),
              lit(20)).as("content")))
      // checkpoint the hash table ONCE: both consumers below (the decode
      // census and the pair kernel) would otherwise re-run the whole
      // PNG render + decode codec pass (guide §8: fingerprints are the
      // lightweight proxy — compute them once, reuse everywhere). The
      // pair kernel's own materialization is then redundant.
      val hashed = graft.Ckpt.checkpoint(
        graft.ops.Multimodal.imageDHash(imgs), eager = true)
      val pairs = graft.ops.Dedup.hammingPairs(hashed, col("id"),
        col("dhash"), maxHamming = 3, materialize = false)
      hashed.agg(count(lit(1)).as("n_images"),
          sum(col("decode_ok").cast("long")).as("n_decoded"))
        .crossJoin(pairs.agg(count(lit(1)).as("n_pairs"),
          sum(col("id_a") + col("id_b")).as("pair_id_sum"),
          max(col("hamming")).as("max_hamming")))
    }),
    "q154_ivfpq_recall" -> ((s, d) => {
      // IVF-PQ composition gate (q46 + q150 combined): cells prune WHICH
      // codes are scored, codes compress WHAT is scored. 5 exact copies
      // per probe live in the probe's own nearest cell and carry its
      // argmin codes, so they survive both stages; the query throws
      // below 0.95 recall vs the exact-copy truth set.
      val e = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("pid"), col("v").as("q"))
      val planted = probes.withColumn("j", explode(sequence(lit(1), lit(5))))
        .select((col("pid") * 10 + col("j") + 100000L).as("vec_id"),
          col("q").as("v"))
      val corpus = e.unionByName(planted)
      val ivf = graft.ops.Ann.trainIvf(corpus, col("v"), numCells = 16,
        sampleSize = 500, seed = 7L)
      val pq = graft.ops.Ann.trainPq(corpus, col("v"), numSub = 8,
        codebookSize = 16, sampleSize = 500, seed = 7L)
      val got = graft.ops.Ann.ivfPqKnn(corpus, col("vec_id"), col("v"),
        probes, col("pid"), col("q"), ivf, pq, k = 5, nprobe = 4)
      val expect = probes.withColumn("j", explode(sequence(lit(1), lit(5))))
        .select(col("pid").as("query_id"),
          (col("pid") * 10 + col("j") + 100000L).as("neighbor_id"))
      val cnt = expect.join(got.select(col("query_id"), col("neighbor_id"))
          .withColumn("__hit", lit(1)),
          Seq("query_id", "neighbor_id"), "left_outer")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("__hit"), lit(0))).as("n_hit")).head()
      val (nTrue, nHit) = (cnt.getLong(0), cnt.getLong(1))
      val recall = if (nTrue == 0) 0.0 else nHit.toDouble / nTrue
      require(recall >= 0.95,
        f"q154 IVF-PQ recall gate failed: recall=$recall%.4f ($nHit/$nTrue)")
      import s.implicits._
      Seq((10L, 5, nTrue, nHit, math.rint(recall * 10000) / 10000,
        recall >= 0.95, sfTag(d)))
        .toDF("n_queries", "k", "n_true", "n_hit", "recall", "pass", "oracle_sf")
    }),
    "q164_bayes_ab" -> ((s, d) => {
      // exact beta-binomial exceedance through the gateway; the interior
      // p (~0.75 at the gate SF) discriminates the full lgamma sum, not
      // just a saturated 0/1
      val li = t(s, d, "lineitem")
      li.withColumn("t", (col("l_partkey") % 2).cast("int"))
        .withColumn("success", (col("l_returnflag") === "R").cast("int"))
        .createOrReplaceTempView("q164_li")
      GraftGateway.sql(s, "SELECT bayes_ab(t, success) FROM q164_li")
        .select(col("n0"), col("s0"), col("n1"), col("s1"),
          round(col("rate0"), 6).as("rate0"),
          round(col("rate1"), 6).as("rate1"),
          round(col("p_beats_control"), 6).as("p_beats_control"),
          round(col("expected_lift"), 6).as("expected_lift"))
    }),
    "q163_metric_anomaly" -> ((s, d) => {
      // seasonal anomaly monitor on hourly event values: baseline = prior
      // same-hour-of-day periods, z against their mean/sd — daily cycles
      // never read as anomalies the way a flat rolling window reads them
      val ev = t(s, d, "events")
      ev.withColumn("period",
          floor(unix_timestamp(col("ts")) / 3600).cast("long"))
        .createOrReplaceTempView("q163_ev")
      GraftGateway.sql(s,
          "SELECT metric_anomaly(period, value, 24, 3, 2) FROM q163_ev")
        .select(col("period"), round(col("metric"), 6).as("metric"),
          col("n_hist"), round(col("baseline"), 6).as("baseline"),
          round(col("baseline_sd"), 6).as("baseline_sd"),
          round(col("z"), 6).as("z"), col("is_anomaly"))
        .orderBy(col("period"))
    }),
    "q162_jackknife" -> ((s, d) => {
      // delete-one-bucket jackknife for the price-per-unit ratio diff over
      // 32 randomization buckets, through the gateway; the CI's t quantile
      // (df = 31) is a pinned constant in the oracle
      val li = t(s, d, "lineitem")
      li.withColumn("bucket", col("l_suppkey") % 32)
        .withColumn("t", (col("l_partkey") % 2).cast("int"))
        .createOrReplaceTempView("q162_li")
      GraftGateway.sql(s,
          "SELECT jackknife_ratio_diff(bucket, l_extendedprice, l_quantity, t) " +
            "FROM q162_li")
        .select(round(col("estimate"), 6).as("estimate"),
          round(col("stderr"), 6).as("stderr"),
          round(col("lower"), 6).as("lower"),
          round(col("upper"), 6).as("upper"),
          col("n_buckets"))
    }),
    "q161_fuzzy_join" -> ((s, d) => {
      // record linkage through the gateway: link customers to a perturbed
      // registry copy (last name char swapped to 'x'), edit distance <= 1.
      // Blocking key = nation + all-but-last-2 name chars: any dist<=1
      // match here spends its one edit on the final char ('x' vs digit),
      // so both sides agree on the first len-2 prefix — the composite key
      // has 100% recall by construction and keeps block products tiny
      // (the coarse nation-only key costs 9M levenshtein evals for the
      // same 25-row answer; this is the finer key the operator's own
      // product guard asks for at scale). Output still reports per nation.
      val cust = t(s, d, "customer")
      val blockKey = expr(
        "concat(cast(c_nationkey as string), '#', " +
          "substring(c_name, 1, length(c_name) - 2))")
      cust.select(col("c_custkey").as("id"), blockKey.as("block"),
          col("c_name").as("key"))
        .createOrReplaceTempView("q161_left")
      cust.select((col("c_custkey") + 1000000L).as("id"),
          blockKey.as("block"),
          expr("concat(substring(c_name, 1, length(c_name) - 1), 'x')")
            .as("key"))
        .createOrReplaceTempView("q161_right")
      GraftGateway.sql(s,
          "SELECT fuzzy_join(id, block, key, 'q161_right', 1) FROM q161_left")
        .groupBy(substring_index(col("block"), "#", 1).as("block"))
        .agg(count(lit(1)).as("n_pairs"), sum(col("dist")).as("sum_dist"),
          sum(col("id_a")).as("id_a_sum"), sum(col("id_b")).as("id_b_sum"))
        .orderBy(col("block").cast("int"))
    }),
    "q160_srm_sequential" -> ((s, d) => {
      // anytime-valid SRM through the gateway: arm assignment carries a
      // planted ~2.4% tilt toward arm 1 (every 21st event flips); the
      // Dirichlet-multinomial e-process accumulates evidence across looks
      // and p_always_valid is nonincreasing by construction
      val ev = t(s, d, "events")
      ev.withColumn("bucket", floor(col("event_id") / 500))
        .withColumn("arm", when(col("event_id") % 21 === 0, 1L)
          .otherwise(col("event_id") % 2))
        .createOrReplaceTempView("q160_ev")
      GraftGateway.sql(s,
          "SELECT srm_sequential(bucket, arm, 1, 1) FROM q160_ev")
        .withColumn("log_e", round(col("log_e"), 6))
        .withColumn("p_always_valid", round(col("p_always_valid"), 6))
        .orderBy(col("bucket"))
    }),
    "q159_weighted_sample" -> ((s, d) => {
      // weighted sampling WITHOUT replacement (Efraimidis-Spirakis A-ES
      // keys): 30 docs per language with inclusion odds ∝ n_chars; u
      // replays from the leading 32 md5 bits, so the kept SET is
      // engine-independent and the id checksum pins the exact selection
      val docs = t(s, d, "documents")
      val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 8),
        16, 10).cast("double") + 0.5) / 4294967296.0
      graft.ops.Mixing.weightedSample(docs, col("lang"),
          col("n_chars").cast("double"), u, k = 30) { sampled =>
        sampled.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("doc_id")).as("id_checksum"),
            sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("lang"))
          .transform(x => graft.Ckpt.register(x.localCheckpoint()))
      }
    }),
    "q158_profile_diff" -> ((s, d) => {
      // release audit through the gateway: the "new release" drops a
      // column, adds another, and filters 1-in-5 rows; every metric is a
      // pure closed form (exact distincts for oracle parity)
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_orderpriority"))
        .createOrReplaceTempView("rel_old")
      t(s, d, "orders").filter(col("o_orderkey") % 5 =!= 0)
        .select(col("o_orderkey"), col("o_orderstatus"),
          col("o_custkey").as("cust"))
        .createOrReplaceTempView("rel_new")
      GraftGateway.sql(s,
          "SELECT profile_diff('rel_new', 'exact') FROM rel_old")
        .withColumn("null_frac_old", round(col("null_frac_old"), 6))
        .withColumn("null_frac_new", round(col("null_frac_new"), 6))
        .orderBy(col("column"))
    }),
    "q157_e_value" -> ((s, d) => {
      // E-value sensitivity analysis through the gateway: how strong an
      // unmeasured confounder must be (risk-ratio scale) to explain away
      // the observed return-rate difference between odd and even
      // suppliers — every output a closed form over per-arm event counts
      t(s, d, "lineitem")
        .select((col("l_returnflag") === "R").cast("int").as("ret"),
          (col("l_suppkey") % 2).cast("int").as("arm"))
        .createOrReplaceTempView("li_ev")
      GraftGateway.sql(s, "SELECT e_value(ret, arm) FROM li_ev")
        .select(col("n1"), col("n0"), round(col("p1"), 6).as("p1"),
          round(col("p0"), 6).as("p0"), round(col("rr"), 6).as("rr"),
          round(col("rr_lower"), 6).as("rr_lower"),
          round(col("rr_upper"), 6).as("rr_upper"),
          round(col("e_value"), 6).as("e_value"),
          round(col("e_value_ci"), 6).as("e_value_ci"))
    }),
    "q155_funnel" -> ((s, d) => {
      // ordered view -> click -> purchase funnel through the gateway,
      // 3-day window. Times ride as EXACT epoch-micros (integer-valued
      // doubles well under 2^53), so every strict/window comparison is
      // bit-identical across engines and the whole funnel replays as a
      // chain of conditional-min CTEs
      tsNanos(t(s, d, "events"))
        .select(col("user_id"), expr("ts div 1000").as("tus"),
          col("event_type"))
        .createOrReplaceTempView("ev_funnel")
      GraftGateway.sql(s, "SELECT funnel(user_id, tus, event_type, " +
          "'view', 'click', 'purchase', 259200000000) FROM ev_funnel")
        .select(col("step"), col("event"), col("n_users"),
          round(col("pct_of_first"), 6).as("pct_of_first"),
          round(col("pct_of_prev"), 6).as("pct_of_prev"))
        .orderBy(col("step"))
    }),
    "q156_retention" -> ((s, d) => {
      // weekly cohort retention matrix through the gateway (7-day buckets
      // in epoch-micros) — first-seen cohorts, presence offsets, all
      // closed-form
      tsNanos(t(s, d, "events"))
        .select(col("user_id"), expr("ts div 1000").as("tus"))
        .createOrReplaceTempView("ev_ret")
      GraftGateway.sql(s,
          "SELECT retention(user_id, tus, 604800000000) FROM ev_ret")
        .select(col("cohort"), col("offset"), col("n_users"),
          round(col("retention"), 6).as("retention"))
        .orderBy(col("cohort"), col("offset"))
    }),
    "q153_top_k" -> ((s, d) => {
      // heavy hitters through the gateway verb, riding Spark 4's native
      // approx_top_k (DataSketches frequent-items). The fixture domain
      // (returnflag x linestatus, 4 live combos) sits far under
      // maxTracked, where the sketch is EXACT — so the oracle is the
      // plain groupBy-count top-k; the eviction regime is unit- and
      // probe-covered instead
      t(s, d, "lineitem")
        .select(concat_ws("|", col("l_returnflag"), col("l_linestatus"))
          .as("combo"))
        .createOrReplaceTempView("li_topk")
      GraftGateway.sql(s, "SELECT top_k(combo, 10) FROM li_topk")
        .orderBy(col("rank"))
    }),
    "q152_event_study" -> ((s, d) => {
      // staggered-adoption event study (Callaway-Sant'Anna group-time
      // ATT, never-treated comparison) through the 4-arg gateway verb:
      // unit = the order, cohort from the ORDER key (a unit attribute),
      // periods = the 7 line numbers (one row per unit-period by the
      // lineitem PK). ATT and its exact two-sample standard error come
      // from unit-level base deltas, so att AND se/lower/upper all
      // replay in plain SQL — no pinning.
      t(s, d, "lineitem").select(
          col("l_orderkey").cast("long").as("u"),
          when(col("l_orderkey") % 3 === 1, 3L)
            .when(col("l_orderkey") % 3 === 2, 5L).otherwise(0L).as("g"),
          col("l_linenumber").cast("long").as("period"),
          col("l_quantity").cast("double").as("y"))
        .createOrReplaceTempView("li_es")
      GraftGateway.sql(s, "SELECT event_study(u, g, period, y) FROM li_es")
        .select(col("cohort"), col("period"), col("event_time"),
          col("is_pre"), round(col("att"), 6).as("att"),
          round(col("se"), 6).as("se"),
          round(col("lower"), 6).as("lower"),
          round(col("upper"), 6).as("upper"), col("n_rows"))
        .orderBy(col("cohort"), col("period"))
    }),
    "q151_group_sequential" -> ((s, d) => {
      // classical K-look interim analysis on the A/A split: Lan-DeMets
      // OBF-spending boundaries at the OBSERVED information fractions
      // (cumulative pooled information per day) vs per-look cumulative z.
      // The z trajectory replays closed-form (q135's cells); the
      // boundaries are deterministic Armitage-recursion numerics, pinned
      // at 4 decimals. A/A must never cross.
      val ev = tsNanos(t(s, d, "events"))
      graft.ops.Sequential.groupSequentialTest(ev,
          expr("ts div 86400000000000"), col("value"),
          (col("user_id") % 2).cast("int"))
        .select(col("look"), col("bucket"), col("n1"), col("n0"),
          round(col("estimate"), 6).as("estimate"),
          round(col("z"), 6).as("z"),
          round(col("z_boundary"), 4).as("z_boundary"), col("crossed"))
        .withColumn("oracle_sf", lit(sfTag(d)))
        .orderBy(col("look"))
    }),
    "q150_pq_recall" -> ((s, d) => {
      // product-quantization quality gate (q46's idiom, PQ edition): 5
      // EXACT copies planted per probe. A copy quantizes to the probe's
      // own per-subspace argmin codes, so its ADC distance is the global
      // minimum — any other vector ties only by matching all 8 codes
      // (~16^-8). True L2 top-5 = the copies (distance 0), so recall is a
      // deterministic fixture constant, and the query THROWS below 0.95.
      val e = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("pid"), col("v").as("q"))
      val planted = probes.withColumn("j", explode(sequence(lit(1), lit(5))))
        .select((col("pid") * 10 + col("j") + 100000L).as("vec_id"),
          col("q").as("v"))
      val corpus = e.unionByName(planted)
      val idx = graft.ops.Ann.trainPq(corpus, col("v"), numSub = 8,
        codebookSize = 16, sampleSize = 500, seed = 7L)
      val pq = graft.ops.Ann.pqKnn(corpus, col("vec_id"), col("v"),
        probes, col("pid"), col("q"), idx, k = 5)
      val expect = probes.withColumn("j", explode(sequence(lit(1), lit(5))))
        .select(col("pid").as("query_id"),
          (col("pid") * 10 + col("j") + 100000L).as("neighbor_id"))
      val cnt = expect.join(pq.select(col("query_id"), col("neighbor_id"))
          .withColumn("__hit", lit(1)),
          Seq("query_id", "neighbor_id"), "left_outer")
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("__hit"), lit(0))).as("n_hit")).head()
      val (nTrue, nHit) = (cnt.getLong(0), cnt.getLong(1))
      val recall = if (nTrue == 0) 0.0 else nHit.toDouble / nTrue
      require(recall >= 0.95,
        f"q150 PQ recall gate failed: recall=$recall%.4f < 0.95 ($nHit/$nTrue)")
      import s.implicits._
      Seq((10L, 5, nTrue, nHit, math.rint(recall * 10000) / 10000,
        recall >= 0.95, sfTag(d)))
        .toDF("n_queries", "k", "n_true", "n_hit", "recall", "pass", "oracle_sf")
    }),
    "q148_ratio_mde" -> ((s, d) => {
      // pre-experiment planning for a RATIO metric (revenue per unit
      // quantity) through the gateway verb: the delta-method linearized
      // stddev, observed-n MDE, and the per-arm n for a 1% lift — every
      // output a closed form over one moment pass (q124's idiom, ratio
      // edition)
      t(s, d, "lineitem")
        .select((col("l_extendedprice").cast("double") / 1000.0).as("rev"),
          col("l_quantity").cast("double").as("qty"))
        .createOrReplaceTempView("li_ratio")
      GraftGateway.sql(s, "SELECT ratio_mde(rev, qty, 0.01) FROM li_ratio")
        .select(col("n"), round(col("ratio"), 6).as("ratio"),
          round(col("sd_delta"), 6).as("sd_delta"),
          round(col("mde_abs"), 6).as("mde_abs"),
          round(col("mde_rel"), 6).as("mde_rel"),
          round(col("n_per_arm_target"), 2).as("n_per_arm_target"))
    }),
    "q149_synth_control" -> ((s, d) => {
      // synthetic control on the events panel: units = user_id % 10 with
      // daily mean-value paths, unit '0' nominated as "treated" (an A/A
      // placebo — no intervention exists, so the post gap is fit noise).
      // The pairwise Frank-Wolfe fit is deterministic (no RNG, exact
      // steps, lowest-index tie breaks), so the sf0.01 path is pinned
      // like q34's MLE constants; n_periods and the pre flag stay honest
      // closed forms.
      val ev = tsNanos(t(s, d, "events"))
      val r = graft.ops.SynthControl.synthControl(ev,
        (col("user_id") % 10).cast("int"), expr("ts div 86400000000000"),
        col("value"), "0", preEnd = 19742.0)
      r.path.select(col("period").cast("long").as("period"), col("is_pre"),
          round(col("y_treated"), 6).as("y_treated"),
          round(col("y_synth"), 6).as("y_synth"),
          round(col("gap"), 6).as("gap"))
        .withColumn("oracle_sf", lit(sfTag(d)))
        .orderBy(col("period"))
    }),
    "q165_synth_placebo" -> ((s, d) => {
      // in-space placebo inference for q149's synthetic control, with a
      // PLANTED +25 post-period effect on the treated unit: every donor
      // refit as pseudo-treated (ADH 2010 §2.2), so the treated post/pre
      // RMSE ratio must rank FIRST of the 10 units (p = 0.1 exactly —
      // that part is an honest closed form). The per-unit RMSEs are the
      // same deterministic pairwise-FW numerics as q149 — pinned.
      val ev = tsNanos(t(s, d, "events"))
      ev.select((col("user_id") % 10).cast("int").as("unit"),
          expr("ts div 86400000000000").as("period"), col("value").as("v0"))
        .withColumn("y", col("v0") +
          when(col("unit") === 0 && col("period") > 19742, lit(25.0))
            .otherwise(lit(0.0)))
        .createOrReplaceTempView("ev_synth_pl")
      GraftGateway.sql(s,
          "SELECT synth_placebo(unit, period, y, '0', 19742.0) FROM ev_synth_pl")
        .select(col("unit"), col("is_treated"),
          round(col("pre_rmse"), 6).as("pre_rmse"),
          round(col("post_rmse"), 6).as("post_rmse"),
          round(col("rmse_ratio"), 6).as("rmse_ratio"),
          col("rank"), round(col("p_value"), 6).as("p_value"))
        .withColumn("oracle_sf", lit(sfTag(d)))
        .orderBy(col("rank"), col("unit"))
    }),
    "q171_mediation" -> ((s, d) => {
      // Baron-Kenny decomposition with PLANTED paths over natural noise:
      // M = quantity + 2T (a ~ 2), Y = price/1000 + 3M + 1.5T (b ~ 3,
      // c' ~ 1.5) — every output is second-moment algebra, plain SQL
      t(s, d, "lineitem")
        .select((col("l_orderkey") % 2).cast("double").as("t"),
          col("l_quantity").cast("double").as("q"),
          col("l_extendedprice").cast("double").as("p"))
        .withColumn("m", col("q") + lit(2.0) * col("t"))
        .withColumn("y",
          col("p") / 1000 + lit(3.0) * col("m") + lit(1.5) * col("t"))
        .createOrReplaceTempView("li_med")
      GraftGateway.sql(s, "SELECT mediation(y, t, m) FROM li_med")
        .select(col("n"), round(col("a"), 6).as("a"),
          round(col("b"), 6).as("b"),
          round(col("c_total"), 6).as("c_total"),
          round(col("c_direct"), 6).as("c_direct"),
          round(col("indirect"), 6).as("indirect"),
          round(col("se_indirect"), 6).as("se_indirect"),
          round(col("z"), 4).as("z"),
          round(col("prop_mediated"), 6).as("prop_mediated"))
    }),
    "q169_equivalence" -> ((s, d) => {
      // TOST equivalence readout on the A/A order-parity split with a
      // +/-0.5 quantity margin: an A/A diff near 0 with tight se must
      // clear both one-sided bounds. Pure moment closed forms; the
      // boolean replays against the literal one-sided normal critical
      // value (p_equiv needs a normal CDF DuckDB lacks — q166 idiom).
      t(s, d, "lineitem")
        .select(col("l_quantity").cast("double").as("y"),
          (col("l_orderkey") % 2).cast("int").as("t"))
        .createOrReplaceTempView("li_equiv")
      GraftGateway.sql(s, "SELECT equivalence_test(y, t, 0.5) FROM li_equiv")
        .select(col("n0"), col("n1"), round(col("mean0"), 6).as("mean0"),
          round(col("mean1"), 6).as("mean1"), round(col("diff"), 6).as("diff"),
          round(col("se"), 6).as("se"),
          round(col("z_lower"), 4).as("z_lower"),
          round(col("z_upper"), 4).as("z_upper"), col("equivalent"))
    }),
    "q170_rate_ratio" -> ((s, d) => {
      // Poisson rate-ratio with unequal exposure: high-value events per
      // exposure unit across the user-parity split — every output incl.
      // the CI is a plain exp/ln closed form
      tsNanos(t(s, d, "events"))
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select(when(col("value") > 80, 1.0).otherwise(0.0).as("ev"),
          ((col("user_id") % 5) + 1).cast("double").as("ex"),
          (col("user_id") % 2).cast("int").as("t"))
        .createOrReplaceTempView("ev_rates")
      GraftGateway.sql(s, "SELECT rate_ratio(ev, t, ex) FROM ev_rates")
        .select(col("events0"), col("events1"), col("exposure0"),
          col("exposure1"), round(col("rate0"), 6).as("rate0"),
          round(col("rate1"), 6).as("rate1"),
          round(col("ratio"), 6).as("ratio"),
          round(col("lower"), 6).as("lower"),
          round(col("upper"), 6).as("upper"), round(col("z"), 4).as("z"),
          round(col("dispersion"), 6).as("dispersion"),
          round(col("lower_od"), 6).as("lower_od"),
          round(col("upper_od"), 6).as("upper_od"),
          round(col("z_od"), 4).as("z_od"))
    }),
    "q168_rdd_sharp" -> ((s, d) => {
      // sharp regression discontinuity at quantity 25.5 with a PLANTED
      // +50 jump: local-linear fits (triangular kernel, h=10) per side,
      // HC0 sandwich SEs — 18 conditional moment sums per side, so every
      // output replays in plain SQL
      t(s, d, "lineitem")
        .select((col("l_extendedprice").cast("double") / 100 +
            when(col("l_quantity") >= 26, 50.0).otherwise(0.0)).as("y"),
          col("l_quantity").cast("double").as("x"))
        .createOrReplaceTempView("li_rdd")
      GraftGateway.sql(s, "SELECT rdd_sharp(y, x, 25.5, 10.0) FROM li_rdd")
        .select(col("n_left"), col("n_right"),
          round(col("y_left"), 6).as("y_left"),
          round(col("y_right"), 6).as("y_right"),
          round(col("tau"), 6).as("tau"), round(col("se"), 6).as("se"),
          round(col("z"), 4).as("z"))
    }),
    "q194_mantel_haenszel" -> ((s, d) => {
      // stratum-adjusted OR: treatment from event parity, outcome rate
      // 30% vs 50% planted via the PARITY-FREE half-index (the BayesSpec
      // lesson: id%k shares parity with id%2), shifted per stratum
      t(s, d, "events")
        .selectExpr("event_type AS stratum", "event_id % 2 AS t",
          "CASE WHEN (CAST(floor(event_id / 2) AS BIGINT) * 7 " +
            "+ length(event_type) * 3) % 10 < 3 + 2 * (event_id % 2) " +
            "THEN 1 ELSE 0 END AS y")
        .createOrReplaceTempView("ev_mh")
      GraftGateway.sql(s, "SELECT mantel_haenszel(stratum, t, y) FROM ev_mh")
        .select(col("strata"), col("strata_skipped"), col("n"),
          round(col("or_mh"), 6).as("or_mh"),
          round(col("log_or_se"), 6).as("log_or_se"),
          round(col("cmh_chisq"), 4).as("cmh_chisq"))
    }),
    "q195_fisher_exact" -> ((s, d) => {
      // small-table exact test: 200 paired binaries, b-rate 20% vs 50%
      // by arm — the hypergeometric enumeration replays via
      // generate_series + lgamma
      t(s, d, "events").filter(col("event_id") < 200)
        .selectExpr("event_id % 2 AS a",
          "CASE WHEN (CAST(floor(event_id / 2) AS BIGINT) * 11) % 10 " +
            "< 2 + 3 * (event_id % 2) THEN 1 ELSE 0 END AS b")
        .createOrReplaceTempView("ev_fx")
      GraftGateway.sql(s, "SELECT fisher_exact(a, b) FROM ev_fx")
        .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
          round(col("odds_ratio"), 6).as("odds_ratio"),
          round(col("p_two_sided"), 8).as("p_two_sided"),
          round(col("p_greater"), 8).as("p_greater"))
    }),
    "q196_kruskal_wallis" -> ((s, d) => {
      // k-group rank test of quantity across return flags: tie-group
      // average ranks (heavy ties — quantity is integer-valued), rank
      // sums per group, tie-corrected H; p checks through the statistic
      t(s, d, "lineitem").createOrReplaceTempView("li_kw")
      GraftGateway.sql(s,
          "SELECT kruskal_wallis(l_quantity, l_returnflag) FROM li_kw")
        .select(col("n"), col("k"), round(col("h"), 4).as("h"),
          round(col("h_corrected"), 4).as("h_corrected"), col("df"))
    }),
    "q197_brunner_munzel" -> ((s, d) => {
      // heteroskedastic rank test on the tied quantity column: overall
      // and within-arm average ranks both replay as window constructions
      t(s, d, "lineitem")
        .selectExpr("l_quantity AS y", "l_orderkey % 2 AS t")
        .createOrReplaceTempView("li_bm")
      GraftGateway.sql(s, "SELECT brunner_munzel(y, t) FROM li_bm")
        .select(col("n0"), col("n1"), round(col("p_hat"), 6).as("p_hat"),
          round(col("stat"), 4).as("stat"), round(col("df"), 2).as("df"))
    }),
    "q198_effect_size" -> ((s, d) => {
      // standardized effect sizes for the price metric by order parity:
      // moments for d/g/Glass, the MW rank machinery for Cliff's delta
      t(s, d, "lineitem")
        .selectExpr("l_extendedprice AS y", "l_orderkey % 2 AS t")
        .createOrReplaceTempView("li_es")
      GraftGateway.sql(s, "SELECT effect_size(y, t) FROM li_es")
        .select(col("n0"), col("n1"),
          round(col("mean_diff"), 4).as("mean_diff"),
          round(col("cohens_d"), 6).as("cohens_d"),
          round(col("hedges_g"), 6).as("hedges_g"),
          round(col("glass_delta"), 6).as("glass_delta"),
          round(col("cliffs_delta"), 6).as("cliffs_delta"))
    }),
    "q199_nelson_aalen" -> ((s, d) => {
      // cumulative hazard by arm over the q88-style synthetic cohort:
      // KM cells, then two cell-scale running sums (H and its variance)
      t(s, d, "events")
        .selectExpr("event_id % 50 AS time",
          "CASE WHEN value > 30 THEN 1 ELSE 0 END AS ev",
          "CASE WHEN event_id % 3 = 0 THEN 'a' ELSE 'b' END AS arm")
        .createOrReplaceTempView("ev_na")
      GraftGateway.sql(s, "SELECT nelson_aalen(time, ev, arm) FROM ev_na")
        .select(col("group"), col("time"), col("n_risk"), col("n_event"),
          round(col("cum_hazard"), 6).as("cum_hazard"),
          round(col("se"), 6).as("se"),
          round(col("fh_survival"), 6).as("fh_survival"))
        .orderBy(col("group"), col("time"))
    }),
    "q200_cumulative_incidence" -> ((s, d) => {
      // competing risks: cause 0 = censored, 1 and 2 compete; the
      // Aalen-Johansen CIF replays as windowed SQL (exclusive
      // log-survival prefix x per-cause hazard increments)
      t(s, d, "events")
        .selectExpr("event_id % 40 AS time",
          "CAST((event_id * 7) % 3 AS INT) AS cause")
        .createOrReplaceTempView("ev_cif")
      GraftGateway.sql(s,
          "SELECT cumulative_incidence(time, cause) FROM ev_cif")
        .select(col("cause"), col("time"), col("n_risk"), col("n_event"),
          round(col("cif"), 6).as("cif"))
        .orderBy(col("cause"), col("time"))
    }),
    "q201_ewma" -> ((s, d) => {
      // EWMA control chart over 100-event periods: the exact recursion
      // replays as a DuckDB recursive CTE (doubles CAST explicitly —
      // decimal literals truncate inside recursive CTEs)
      t(s, d, "events")
        .selectExpr("CAST(floor(event_id / 100) AS BIGINT) AS period",
          "value")
        .createOrReplaceTempView("ev_ew")
      GraftGateway.sql(s, "SELECT ewma(period, value, 0.3, 3) FROM ev_ew")
        .select(col("period"), round(col("metric"), 6).as("metric"),
          round(col("ewma"), 6).as("ewma"),
          round(col("limit_lower"), 6).as("limit_lower"),
          round(col("limit_upper"), 6).as("limit_upper"),
          col("is_anomaly"))
        .orderBy(col("period"))
    }),
    "q202_ljung_box" -> ((s, d) => {
      // white-noise check of the same period series: 6 lag
      // autocorrelations + the cumulative Q path
      t(s, d, "events")
        .selectExpr("CAST(floor(event_id / 100) AS BIGINT) AS period",
          "value")
        .createOrReplaceTempView("ev_lb")
      GraftGateway.sql(s, "SELECT ljung_box(period, value, 6) FROM ev_lb")
        .select(col("lag"), round(col("acf"), 6).as("acf"),
          round(col("q_stat"), 4).as("q_stat"), col("df"))
        .orderBy(col("lag"))
    }),
    "q203_sprt" -> ((s, d) => {
      // classic Wald SPRT: planted 25% success rate tested as p0=0.2 vs
      // p1=0.3 over 500-event looks — LLR drifts +0.63/look, so the
      // board shows 4 'continue' looks, then the H1 crossing sticks
      t(s, d, "events")
        .selectExpr("CAST(floor(event_id / 500) AS BIGINT) AS look",
          "CASE WHEN (event_id * 31) % 100 < 25 THEN 1 ELSE 0 END AS y")
        .createOrReplaceTempView("ev_sprt")
      GraftGateway.sql(s, "SELECT sprt(look, y, 0.2, 0.3) FROM ev_sprt")
        .select(col("bucket"), col("n"), col("successes"),
          round(col("llr"), 6).as("llr"),
          round(col("lower_bound"), 6).as("lower_bound"),
          round(col("upper_bound"), 6).as("upper_bound"), col("decision"))
        .orderBy(col("bucket"))
    }),
    "q204_hosmer_lemeshow" -> ((s, d) => {
      // calibration GOF: a deliberately miscalibrated score (rate is a
      // damped version of the score) — deciles via the house exact
      // percentile, so the oracle's quantile_cont bins agree exactly
      t(s, d, "lineitem")
        .selectExpr(
          // integer/integer division is DOUBLE in both engines; DIV/'//'
          // keeps the label cut in integer arithmetic (no decimal-cast
          // rounding divergence between Spark and DuckDB)
          "(l_partkey % 97) / 193 + 0.2 AS score",
          "CASE WHEN (l_partkey * 13) % 193 < 39 + " +
            "((l_partkey % 97) * 7) DIV 10 THEN 1 ELSE 0 END AS y")
        .createOrReplaceTempView("li_hl")
      GraftGateway.sql(s, "SELECT hosmer_lemeshow(y, score, 'exact') FROM li_hl")
        .select(col("n"), col("bins"), round(col("chisq"), 4).as("chisq"),
          col("df"))
    }),
    "q205_classification_report" -> ((s, d) => {
      // one-threshold eval: label and prediction overlap by construction
      // (both threshold the same hash stream at different cuts)
      t(s, d, "events")
        .selectExpr(
          "CASE WHEN (event_id * 7) % 10 < 4 THEN 1 ELSE 0 END AS y",
          "CASE WHEN (event_id * 7) % 10 < 3 OR (event_id * 3) % 20 = 0 " +
            "THEN 1 ELSE 0 END AS yhat")
        .createOrReplaceTempView("ev_cr")
      GraftGateway.sql(s, "SELECT classification_report(y, yhat) FROM ev_cr")
        .select(col("n"), col("tp"), col("fp"), col("fn"), col("tn"),
          round(col("accuracy"), 6).as("accuracy"),
          round(col("precision"), 6).as("precision"),
          round(col("recall"), 6).as("recall"),
          round(col("f1"), 6).as("f1"), round(col("mcc"), 6).as("mcc"))
    }),
    "q206_cronbach_alpha" -> ((s, d) => {
      // 3-item scale sharing the quantity factor plus independent
      // integer noise — alpha lands mid-range, far from 0 and 1
      t(s, d, "lineitem")
        .selectExpr("l_quantity + (l_partkey % 7) AS i1",
          "l_quantity + (l_suppkey % 5) AS i2",
          "l_quantity + (l_orderkey % 3) AS i3")
        .createOrReplaceTempView("li_ca")
      GraftGateway.sql(s, "SELECT cronbach_alpha(i1, i2, i3) FROM li_ca")
        .select(col("n"), col("k"),
          round(col("sum_item_var"), 4).as("sum_item_var"),
          round(col("total_var"), 4).as("total_var"),
          round(col("alpha"), 6).as("alpha"))
    }),
    "q207_oaxaca_blinder" -> ((s, d) => {
      // price-gap decomposition by order parity with quantity as the
      // composition covariate: both group fits ride one scan; the
      // two-fold identity (gap = explained + unexplained) is exact
      t(s, d, "lineitem")
        .selectExpr("l_extendedprice AS y", "l_orderkey % 2 AS g",
          "l_quantity AS x")
        .createOrReplaceTempView("li_ob")
      GraftGateway.sql(s, "SELECT oaxaca_blinder(y, g, x) FROM li_ob")
        .select(col("n0"), col("n1"), round(col("gap"), 4).as("gap"),
          round(col("explained"), 4).as("explained"),
          round(col("unexplained"), 4).as("unexplained"))
    }),
    "q208_chao1" -> ((s, d) => {
      // unseen-vocabulary estimate over the corpus: q96's tokenization,
      // frequency spectrum, bias-corrected chao1 + Good-Turing coverage
      t(s, d, "documents").createOrReplaceTempView("doc_c1")
      GraftGateway.sql(s, "SELECT chao1(text) FROM doc_c1")
        .select(col("terms"), col("total_tokens"), col("f1"), col("f2"),
          round(col("chao1"), 4).as("chao1"),
          round(col("coverage"), 6).as("coverage"))
    }),
    "q209_kmeans" -> ((s, d) => {
      // distributed Lloyd's, k=4, 2 iterations, init = 4 lowest vec_ids:
      // deterministic end to end, so DuckDB replays both iterations with
      // list arithmetic and the cluster sizes/inertia hash-match
      t(s, d, "embeddings").createOrReplaceTempView("emb_km")
      GraftGateway.sql(s,
          "SELECT kmeans(vec_id, embedding, 4, 2) FROM emb_km")
        .select(col("cluster"), col("n"),
          round(col("inertia"), 3).as("inertia"))
        .orderBy(col("cluster"))
    }),
    "q210_ordinal_assoc" -> ((s, d) => {
      // tau-b / gamma / Somers' D between quantity and a price bucket:
      // ~1000 cells, pair counting on cells both sides
      t(s, d, "lineitem")
        .selectExpr("CAST(l_quantity AS BIGINT) AS x",
          "CAST(floor(l_extendedprice / 5000) AS BIGINT) AS y")
        .createOrReplaceTempView("li_oa")
      GraftGateway.sql(s, "SELECT ordinal_assoc(x, y) FROM li_oa")
        .select(col("n"), col("cells"), col("concordant"),
          col("discordant"), round(col("tau_b"), 6).as("tau_b"),
          round(col("gamma"), 6).as("gamma"),
          // Agresti inference (r17): delta-method ASEs scaled into O(1)
          // by multiplying out the pair-count magnitude (ase ~ 1/n), z
          // from the H0 test-based variance; p omitted (no normal CDF in
          // the oracle engine — z encodes it)
          round(col("gamma_ase") * sqrt(col("n")), 6).as("gamma_ase_sqn"),
          round(col("gamma_z"), 4).as("gamma_z"),
          round(col("somers_d"), 6).as("somers_d"),
          round(col("somers_ase") * sqrt(col("n")), 6).as("somers_ase_sqn"),
          round(col("somers_z"), 4).as("somers_z"))
    }),
    "q211_mood_median" -> ((s, d) => {
      // median test of price across return flags: pooled exact median
      // (house percentile == quantile_cont), 2xk chi-square
      t(s, d, "lineitem").createOrReplaceTempView("li_mm")
      GraftGateway.sql(s,
          "SELECT mood_median(l_extendedprice, l_returnflag, 'exact') FROM li_mm")
        .select(col("n"), col("k"),
          round(col("grand_median"), 4).as("grand_median"),
          round(col("chisq"), 4).as("chisq"), col("df"))
    }),
    "q212_dunn_test" -> ((s, d) => {
      // post-hoc after q196: which return flags differ — pairwise z on
      // the POOLED ranks (p/p_adj need the normal CDF; rows check
      // through the z and the shared mean ranks)
      t(s, d, "lineitem").createOrReplaceTempView("li_dunn")
      GraftGateway.sql(s,
          "SELECT dunn_test(l_quantity, l_returnflag) FROM li_dunn")
        .select(col("g1"), col("g2"),
          round(col("mean_rank_1"), 4).as("mean_rank_1"),
          round(col("mean_rank_2"), 4).as("mean_rank_2"),
          round(col("z"), 4).as("z"))
        .orderBy(col("g1"), col("g2"))
    }),
    "q213_ks_uniform" -> ((s, d) => {
      // p-value calibration audit: a lattice-uniform score column reads
      // a small D whose Kolmogorov tail replays as the truncated series
      t(s, d, "events")
        .selectExpr("((event_id * 37) % 1000) / 999 AS p")
        .createOrReplaceTempView("ev_ksu")
      GraftGateway.sql(s, "SELECT ks_uniform(p) FROM ev_ksu")
        .select(col("n"), round(col("d_plus"), 6).as("d_plus"),
          round(col("d_minus"), 6).as("d_minus"),
          round(col("d"), 6).as("d"),
          round(col("p_value"), 6).as("p_value"))
    }),
    "q214_theil_sen" -> ((s, d) => {
      // robust trend of the per-period metric (+0.05/period planted
      // drift): pairwise slopes stay distributed, medians are the house
      // exact percentile on both engines
      t(s, d, "events")
        .selectExpr("CAST(floor(event_id / 100) AS BIGINT) AS period",
          "value")
        .groupBy(col("period"))
        .agg((avg(col("value")) + col("period") * 0.05).as("m"))
        .createOrReplaceTempView("ev_ts")
      GraftGateway.sql(s, "SELECT theil_sen(period, m) FROM ev_ts")
        .select(col("n"), col("n_pairs"), round(col("slope"), 6).as("slope"),
          round(col("intercept"), 6).as("intercept"))
    }),
    "q215_cochran_q" -> ((s, d) => {
      // 3 matched checkers on the same 2000 blocks: m2 planted strictly
      // worse; complete-panel contract validated in-op
      t(s, d, "events").filter(col("event_id") < 2000)
        .selectExpr("event_id AS b",
          "explode(array('m1', 'm2', 'm3')) AS t")
        .selectExpr("b", "t",
          "CASE WHEN t = 'm1' THEN CASE WHEN (b * 7) % 10 < 5 THEN 1 ELSE 0 END " +
            "WHEN t = 'm2' THEN CASE WHEN (b * 7) % 10 < 3 THEN 1 ELSE 0 END " +
            "ELSE CASE WHEN (b * 7 + 3) % 10 < 5 THEN 1 ELSE 0 END END AS y")
        .createOrReplaceTempView("ev_cq")
      GraftGateway.sql(s, "SELECT cochran_q(b, t, y) FROM ev_cq")
        .select(col("blocks"), col("k"), col("n_success"),
          round(col("q"), 4).as("q"), col("df"))
    }),
    "q216_durbin_watson" -> ((s, d) => {
      // lag-1 dependence scalar over the q201 period series
      t(s, d, "events")
        .selectExpr("CAST(floor(event_id / 100) AS BIGINT) AS period",
          "value")
        .createOrReplaceTempView("ev_dw")
      GraftGateway.sql(s, "SELECT durbin_watson(period, value) FROM ev_dw")
        .select(col("n_periods"), round(col("dw"), 6).as("dw"),
          round(col("rho1"), 6).as("rho1"))
    }),
    "q217_logrank_power" -> ((s, d) => {
      // survival planning: observed events + allocation vs HR 1.2 —
      // checks through z_power and the required-events closed forms
      t(s, d, "events")
        .selectExpr("CASE WHEN value > 30 THEN 1 ELSE 0 END AS ev",
          "CAST(event_id % 2 AS INT) AS t")
        .createOrReplaceTempView("ev_lrp")
      GraftGateway.sql(s, "SELECT logrank_power(ev, t, 1.2) FROM ev_lrp")
        .select(col("n"), col("events"), round(col("share1"), 6).as("share1"),
          round(col("z_power"), 4).as("z_power"),
          round(col("required_events_80"), 2).as("required_events_80"),
          round(col("required_events_90"), 2).as("required_events_90"))
    }),
    "q228_ngram_novelty" -> ((s, d) => {
      // shard admission: the top half of doc_ids as the NEW shard vs the
      // bottom half as the reference corpus — trigram sets anti-join on
      // the gram key (the snapshot-diff shape)
      val docs = t(s, d, "documents")
      val half = docs.agg(expr("percentile(doc_id, 0.5)")).head().getDouble(0)
      docs.filter(col("doc_id") > half).createOrReplaceTempView("q228_new")
      docs.filter(col("doc_id") <= half).createOrReplaceTempView("q228_ref")
      GraftGateway.sql(s,
          "SELECT ngram_novelty(text, 'q228_ref', 3) FROM q228_new")
        .select(col("ngrams_current"), col("ngrams_new"),
          round(col("novelty_distinct"), 6).as("novelty_distinct"),
          col("occurrences_current"), col("occurrences_new"),
          round(col("novelty_weighted"), 6).as("novelty_weighted"))
    }),
    "q229_bpe_token_count" -> ((s, d) => {
      // tokenizer-true token budgeting unit: byte-fallback BPE counts per
      // language against a 12-merge hand vocab (well-formed: every operand
      // is a byte or an earlier output). The oracle replays the EXACT
      // merge algorithm — rank-ordered left-to-right sweeps to fixpoint,
      // equivalent to min-rank-first for well-formed lists — via a
      // recursive CTE over |-delimited token strings.
      val spark = s
      import spark.implicits._
      val docs = t(s, d, "documents")
      docs.createOrReplaceTempView("q229_docs")
      Seq((1, "a", "t"), (2, "r", "o"), (3, "ro", "w"), (4, "d", "at"),
          (5, "dat", "a"), (6, "e", "r"), (7, "t", "er"), (8, "s", "t"),
          (9, "a", "n"), (10, "c", "an"), (11, "l", "l"), (12, "g", "g"))
        .toDF("rank", "left", "right")
        .createOrReplaceTempView("q229_merges")
      GraftGateway.sql(s,
        "SELECT bpe_token_count(text, 'q229_merges', lang) FROM q229_docs")
        .withColumnRenamed("group", "lang")
    }),
    "q230_semantic_dedup" -> ((s, d) => {
      // end-to-end semantic dedup on planted EXACT duplicates (copies of
      // vec_id < 50 at +10000): kmeans buckets -> within-bucket cosine
      // pairs -> min-id representative. threshold 0.99 isolates identical
      // vectors (max non-identical cosine in the fixture is ~0.6), so the
      // oracle's representative set is exactly the per-embedding min id —
      // no kmeans replay needed (identical vectors share a cluster by
      // construction of the deterministic argmin)
      val e = t(s, d, "embeddings")
      val planted = e.filter(col("vec_id") < 50)
        .withColumn("vec_id", col("vec_id") + 10000)
      e.unionByName(planted).createOrReplaceTempView("q230_emb")
      // max_bucket 50000 keeps the fixed k=8 fixture sf-portable (the
      // brute within-cluster pass is fine at gate scale; production uses
      // k scaled to the corpus instead); probes pinned to 1 — this row
      // documents the single-assignment baseline (q236 gates probes=2)
      GraftGateway.sql(s,
        "SELECT semantic_dedup(vec_id, embedding, 8, 0.99, 2, 50000, 1) " +
          "FROM q230_emb")
        .select(col("id"), col("rep_id"), col("is_representative"))
        .orderBy(col("id"))
    }),
    "q231_friedman" -> ((s, d) => {
      // repeated measures: 700 blocks x 3 treatments from dense event ids
      // (floor(id/3) blocks are complete by construction); the oracle
      // replays the identical within-block rank() + tie-count windows
      t(s, d, "events").filter(col("event_id") < 2100)
        .select(floor(col("event_id") / 3).cast("long").as("blk"),
          (col("event_id") % 3).cast("string").as("t"),
          col("value").as("y"))
        .createOrReplaceTempView("q231_fr")
      GraftGateway.sql(s, "SELECT friedman(blk, t, y) FROM q231_fr")
        .select(col("n_blocks"), col("k"),
          round(col("chisq"), 6).as("chisq"), col("df"))
    }),
    "q232_welch_anova" -> ((s, d) => {
      // heteroskedastic 3-group mean test on return flags; oracle checks
      // through F* and the Welch dofs (the q190 levene idiom)
      t(s, d, "lineitem").createOrReplaceTempView("q232_li")
      GraftGateway.sql(s,
        "SELECT welch_anova(l_extendedprice, l_returnflag) FROM q232_li")
        .select(col("n"), col("k"), round(col("f_stat"), 6).as("f_stat"),
          col("df1"), round(col("df2"), 4).as("df2"))
    }),
    "q233_jarque_bera" -> ((s, d) => {
      // normality screen on a uniform-ish metric: skew ~ 0, excess
      // kurtosis ~ -1.2, JB enormous — the oracle replays the raw-moment
      // expansion term-for-term
      t(s, d, "lineitem").createOrReplaceTempView("q233_li")
      GraftGateway.sql(s, "SELECT jarque_bera(l_quantity) FROM q233_li")
        .select(col("n"), round(col("mean"), 6).as("mean"),
          round(col("sd"), 6).as("sd"),
          round(col("skewness"), 6).as("skewness"),
          round(col("ex_kurtosis"), 6).as("ex_kurtosis"),
          round(col("jb"), 4).as("jb"))
    }),
    "q234_vocab_drift" -> ((s, d) => {
      // token-distribution JS divergence: top doc_id half (new shard) vs
      // bottom half (reference) — the q228 split, but weighing SHARED
      // vocabulary usage instead of new-gram share
      val docs = t(s, d, "documents")
      val half = docs.agg(expr("percentile(doc_id, 0.5)")).head().getDouble(0)
      docs.filter(col("doc_id") > half).createOrReplaceTempView("q234_new")
      docs.filter(col("doc_id") <= half).createOrReplaceTempView("q234_ref")
      GraftGateway.sql(s, "SELECT vocab_drift(text, 'q234_ref') FROM q234_new")
        .select(col("tokens_current"), col("tokens_ref"),
          col("vocab_current"), col("vocab_ref"), col("vocab_union"),
          round(col("js_divergence"), 6).as("js_divergence"),
          round(col("l1_distance"), 6).as("l1_distance"))
    }),
    "q235_embedding_drift" -> ((s, d) => {
      // per-label centroid geometry between two slices of the embedding
      // corpus (vec_id < 250 as "current", the rest as reference)
      val e = t(s, d, "embeddings")
      e.filter(col("vec_id") < 250).createOrReplaceTempView("q235_cur")
      e.filter(col("vec_id") >= 250).createOrReplaceTempView("q235_ref")
      GraftGateway.sql(s,
        "SELECT embedding_drift(label, embedding, 'q235_ref') FROM q235_cur")
        .select(col("label"), col("n_current"), col("n_ref"),
          round(col("centroid_l2"), 6).as("centroid_l2"),
          round(col("centroid_cosine"), 6).as("centroid_cosine"))
        .orderBy(col("label"))
    }),
    "q236_semantic_dedup_probes" -> ((s, d) => {
      // boundary-straddling near-duplicates: 4 axis-aligned 2-d blobs
      // (direction from id % 4, magnitude 10 + id % 7 — all members of a
      // blob are exactly parallel, cosine 1, so each blob is one dup
      // group with rep = its min id) plus planted pairs u = (6.5, 7.5) /
      // w = (7.5, 6.5) between blobs 0 and 1. After the deterministic
      // 2-iter Lloyd fit, u's nearest centroid is blob 1's and w's is
      // blob 0's, so single-assignment (probes = 1) misses every u-w
      // edge BY CONSTRUCTION while the default probes = 2 puts u and w
      // in both boundary buckets (Round15OpsSpec pins the p=1 miss).
      // Every cross-group cosine is <= 0.76 and every in-group cosine is
      // >= 0.98985 — margins so wide the representative set is the
      // closed form the oracle replays (the q230 analytic-oracle idiom):
      // rep = 13 for the 8 straddlers, else id % 4's blob min id.
      t(s, d, "events").filter(col("event_id") < 1000)
        .selectExpr("event_id AS vid",
          "CASE WHEN event_id % 250 = 13 THEN array(6.5D, 7.5D) " +
            "WHEN event_id % 250 = 14 THEN array(7.5D, 6.5D) " +
            "WHEN event_id % 4 = 0 THEN array(10.0D + event_id % 7, 0.0D) " +
            "WHEN event_id % 4 = 1 THEN array(0.0D, 10.0D + event_id % 7) " +
            "WHEN event_id % 4 = 2 THEN array(-(10.0D + event_id % 7), 0.0D) " +
            "ELSE array(0.0D, -(10.0D + event_id % 7)) END AS emb")
        .createOrReplaceTempView("q236_emb")
      GraftGateway.sql(s,
        "SELECT semantic_dedup(vid, emb, 4, 0.95, 2, 2000, 2) FROM q236_emb")
        .groupBy(col("rep_id")).agg(count(lit(1)).as("n_members"))
        .orderBy(col("rep_id"))
    }),
    "q237_partial_corr" -> ((s, d) => {
      // correlation of price and quantity NET of discount: one Gram pass,
      // precision-matrix close on the driver; the oracle replays the
      // single-control recursive closed form (analytically identical)
      t(s, d, "lineitem").createOrReplaceTempView("q237_li")
      GraftGateway.sql(s,
        "SELECT partial_corr(l_extendedprice, l_quantity, l_discount) " +
          "FROM q237_li")
        .select(col("n"), round(col("r_xy"), 6).as("r_xy"),
          round(col("partial_r"), 6).as("partial_r"),
          round(col("t_stat"), 4).as("t_stat"), col("df"))
    }),
    "q238_kendall_tau" -> ((s, d) => {
      // tie-heavy ordinal pair (7 x 3 lattice, correlated by construction
      // since y = x + noise term); concordance/tie counts are integers,
      // tau_b the one closed form — the oracle replays the cell self-join
      t(s, d, "events")
        .select((col("event_id") % 7).as("x"),
          ((col("event_id") % 7) + (col("event_id") % 3)).as("y"))
        .createOrReplaceTempView("q238_ev")
      GraftGateway.sql(s, "SELECT kendall_tau(x, y) FROM q238_ev")
        .select(col("n"), col("cells"), col("concordant"),
          col("discordant"), col("ties_x"), col("ties_y"),
          round(col("tau_b"), 6).as("tau_b"),
          // var_s at bounded RELATIVE precision: raw var_s is ~n³, and
          // the tie-moment terms t(t-1)(2t+5) exceed 2^53 once a margin's
          // tie count passes ~150k (sf1's y margin holds ~333k), after
          // which cross-engine summation order can flip the last ulp and
          // break the hash on the raw double. Scaling by n³ puts the
          // value at O(1) where a 12-dp round absorbs ulp noise while
          // keeping ~11 significant digits of the formula to check.
          round(col("var_s") /
            (col("n").cast("double") * col("n").cast("double") *
              col("n").cast("double")), 12).as("var_s_scaled"),
          round(col("z"), 6).as("z"))
    }),
    "q239_ad_uniform" -> ((s, d) => {
      // tail-weighted uniformity of a near-uniform score strictly inside
      // (0, 1); rank weights replay as a row_number window in SQL
      t(s, d, "events")
        .select((((col("event_id") * 37) % 1000) + 0.5).cast("double")
          ./(1000.0).as("p"))
        .createOrReplaceTempView("q239_ev")
      GraftGateway.sql(s, "SELECT ad_uniform(p) FROM q239_ev")
        .select(col("n"), round(col("a2"), 6).as("a2"))
    }),
    "q240_page_hinkley" -> ((s, d) => {
      // sequential mean-increase detection: +3 planted from period 50 on;
      // the running-mean/cum-sum/min windows replay verbatim in SQL
      t(s, d, "events")
        .select(floor(col("event_id") / 100).cast("long").as("period"),
          (col("value") + when(floor(col("event_id") / 100) >= 50, 3.0)
            .otherwise(0.0)).as("v"))
        .createOrReplaceTempView("q240_ev")
      GraftGateway.sql(s,
        "SELECT page_hinkley(period, v, 25, 0.25) FROM q240_ev")
        .select(col("period"), round(col("metric"), 6).as("metric"),
          round(col("ph"), 6).as("ph"), col("is_alarm"))
        .orderBy(col("period"))
    }),
    "q241_hellinger" -> ((s, d) => {
      // bounded binned distance on a planted +5 location shift (same
      // binning contract as q118's PSI cells)
      t(s, d, "lineitem")
        .select((col("l_quantity") +
          when(col("l_orderkey") % 2 === 1, 5.0).otherwise(0.0)).as("v"),
          (col("l_orderkey") % 2).cast("int").as("g"))
        .createOrReplaceTempView("q241_li")
      GraftGateway.sql(s,
        "SELECT hellinger(v, g, 10, 20, 30, 40) FROM q241_li")
        .select(round(col("bhattacharyya"), 8).as("bhattacharyya"),
          round(col("hellinger"), 6).as("hellinger"))
    }),
    "q248_mann_kendall" -> ((s, d) => {
      // planted +0.25/period monotone trend; the noise term (id % 7) sums
      // to an exact integer per 100-id period, so per-period means are
      // bit-identical across engines and every pair sign is stable
      t(s, d, "events")
        .select(floor(col("event_id") / 100).cast("long").as("period"),
          ((col("event_id") % 7).cast("double") +
            floor(col("event_id") / 100) * 0.25).as("v"))
        .createOrReplaceTempView("q248_ev")
      GraftGateway.sql(s, "SELECT mann_kendall(period, v) FROM q248_ev")
        .select(col("n_periods"), col("s"),
          round(col("var_s"), 4).as("var_s"), round(col("z"), 6).as("z"))
    }),
    "q249_distinct_n" -> ((s, d) => {
      // corpus diversity at n = 1..3; totals count occurrences (no
      // per-doc distinct), the oracle enumerates the same windows
      t(s, d, "documents").createOrReplaceTempView("q249_docs")
      GraftGateway.sql(s, "SELECT distinct_n(text, 1, 2, 3) FROM q249_docs")
        .select(col("n"), col("total_ngrams"), col("distinct_ngrams"),
          round(col("distinct_ratio"), 8).as("distinct_ratio"))
        .orderBy(col("n"))
    }),
    "q250_poisson_reg" -> ((s, d) => {
      // saturated binary-covariate fixture: the Poisson MLE has the
      // closed form beta1 = ln(mean1/mean0), beta0 = ln(mean0), with
      // se = sqrt(1/S0 + 1/S1) and sqrt(1/S0) (S_t = arm outcome sums) —
      // the oracle replays those; IRLS must land on them to 6 decimals
      t(s, d, "events")
        .select((col("event_id") % 5).cast("double").as("y"),
          (col("event_id") % 2).cast("int").as("x"))
        .createOrReplaceTempView("q250_ev")
      GraftGateway.sql(s, "SELECT poisson_reg(y, x) FROM q250_ev")
        .select(col("term"), round(col("estimate"), 6).as("estimate"),
          round(col("stderr"), 6).as("stderr"),
          round(col("dispersion"), 6).as("dispersion"), col("n"))
        .orderBy(col("term"))
    }),
    "q251_c_index" -> ((s, d) => {
      // bounded cohort (the oracle replays ALL pairs — quadratic by
      // construction, so the fixture pins 2000 subjects); higher score
      // must sit on earlier events to count concordant
      t(s, d, "events").filter(col("event_id") < 2000)
        .select(((col("event_id") % 50) + 1).cast("double").as("t"),
          (col("event_id") % 3 =!= 0).cast("int").as("e"),
          col("value").as("score"))
        .createOrReplaceTempView("q251_ev")
      GraftGateway.sql(s, "SELECT c_index(t, e, score) FROM q251_ev")
        .select(col("n"), col("comparable"), col("concordant"),
          col("tied_score"), col("discordant"),
          round(col("c_index"), 8).as("c_index"))
    }),
    "q252_krippendorff" -> ((s, d) => {
      // 500 units x ~20 ratings each, nominal categories = event_type;
      // the oracle replays the coincidence-matrix form exactly
      t(s, d, "events")
        .select((col("event_id") % 500).as("unit"), col("event_type"))
        .createOrReplaceTempView("q252_ev")
      GraftGateway.sql(s, "SELECT krippendorff(unit, event_type) FROM q252_ev")
        .select(col("units"), col("n"), col("n_values"),
          round(col("d_o"), 8).as("d_o"), round(col("d_e"), 8).as("d_e"),
          round(col("alpha"), 8).as("alpha"))
    }),
    "q253_retrieval_eval" -> ((s, d) => {
      // 50 queries, rel = every 7th item; ranking ties break by item id
      // (the ndcg convention) so both engines rank identically
      t(s, d, "events")
        .select((col("event_id") % 50).as("q"), col("event_id").as("i"),
          col("value").as("s"),
          (col("event_id") % 7 === 0).cast("int").as("r"))
        .createOrReplaceTempView("q253_ev")
      GraftGateway.sql(s, "SELECT retrieval_eval(q, i, s, r, 10) FROM q253_ev")
        .select(col("n_queries"), col("n_scored"),
          round(col("mrr"), 8).as("mrr"),
          round(col("recall_at_k"), 8).as("recall_at_k"),
          round(col("precision_at_k"), 8).as("precision_at_k"),
          round(col("hit_rate_at_k"), 8).as("hit_rate_at_k"))
    }),
    "q254_dagostino_k2" -> ((s, d) => {
      // l_quantity is integer-valued, so every raw-moment sum is exact in
      // doubles on BOTH engines and the z-transform chain replays
      // term-identically (the q233 jarque-bera discipline)
      t(s, d, "lineitem").createOrReplaceTempView("q254_li")
      GraftGateway.sql(s, "SELECT dagostino_k2(l_quantity) FROM q254_li")
        .select(col("n"), round(col("skewness"), 8).as("skewness"),
          round(col("ex_kurtosis"), 8).as("ex_kurtosis"),
          round(col("z_skew"), 6).as("z_skew"),
          round(col("z_kurt"), 6).as("z_kurt"),
          round(col("k2"), 4).as("k2"))
    }),
    "q255_win_ratio" -> ((s, d) => {
      // hierarchical composite: quantity decides, price breaks quantity
      // ties; bounded cohort (the pair product is the statistic itself)
      t(s, d, "lineitem").filter(col("l_orderkey") < 2000)
        .select((col("l_orderkey") % 2).cast("int").as("t"),
          col("l_quantity").as("o1"), col("l_extendedprice").as("o2"))
        .createOrReplaceTempView("q255_li")
      GraftGateway.sql(s, "SELECT win_ratio(t, o1, o2) FROM q255_li")
        .select(col("n_treat"), col("n_ctrl"), col("pairs"), col("wins"),
          col("losses"), col("ties"),
          round(col("win_ratio"), 6).as("win_ratio"),
          round(col("z"), 6).as("z"))
    }),
    "q256_pagerank" -> ((s, d) => {
      // 100-node functional graph (dst = 7*src-class + 3 mod 100): every
      // node has an out-edge, so no dangling mass and the oracle's
      // 10-iteration unrolled replay is exact
      t(s, d, "events")
        .select((col("event_id") % 100).as("src"),
          ((col("event_id") * 7 + 3) % 100).as("dst"))
        .createOrReplaceTempView("q256_ev")
      GraftGateway.sql(s, "SELECT pagerank(src, dst, 0.85, 10) FROM q256_ev")
        .select(col("node"), round(col("rank"), 8).as("rank"))
        .orderBy(col("node"))
    }),
    "q257_streaming_ph" -> ((s, d) => {
      // Page-Hinkley as an always-on stream (q220 idiom): per event_type
      // metric, 500-event periods close when a later period arrives; the
      // streaming mean is sum/count, bit-identical to the batch window avg
      import org.apache.spark.sql.streaming.Trigger
      val spark = s
      import spark.implicits._
      val ev = t(s, d, "events")
      val stream = s.readStream.schema(ev.schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
      val evs = stream.filter(col("value").isNotNull)
        .select(col("event_type").as("metricId"),
          (col("event_id") / 500).cast("long").as("period"),
          col("value"))
        .as[graft.streaming.StreamOps.EwmaEvent]
      val out = graft.streaming.StreamOps.streamingPageHinkley(evs,
        lambda = 10.0, delta = 0.05)
      val sink = "q257_mem_" + math.abs(s.sparkContext.applicationId.hashCode)
      s.catalog.dropTempView(sink)
      graft.streaming.StreamRun.runAvailableNow(
        out.writeStream.format("memory").queryName(sink).outputMode("update"),
        s, graft.streaming.StreamRun.inputBytes(d, "events.parquet"))
      s.table(sink)
        .select(col("metricId").as("metric_id"), col("period"),
          col("nEvents").as("n_events"),
          round(col("metric"), 6).as("metric"),
          round(col("ph"), 6).as("ph"),
          col("isAlarm").as("is_alarm"))
        .orderBy(col("metric_id"), col("period"))
    }),
    "q258_adf_test" -> ((s, d) => {
      // white-noise period cells — strongly mean-reverting, so the unit
      // root rejects hard; lags=0 keeps the oracle a single-regressor
      // closed form (the spec covers lags>=1 against commons-math OLS)
      t(s, d, "events")
        .select(floor(col("event_id") / 100).cast("long").as("period"),
          col("value"))
        .createOrReplaceTempView("q258_ev")
      GraftGateway.sql(s, "SELECT adf_test(period, value, 0) FROM q258_ev")
        .select(col("n_periods"), col("n_used"), col("lags"),
          round(col("beta"), 6).as("beta"), round(col("se"), 6).as("se"),
          round(col("adf_stat"), 4).as("adf_stat"), col("stationary_5pct"))
    }),
    "q259_mmr" -> ((s, d) => {
      // diversity-aware top-5 from a 40-candidate pool; relevance is an
      // exact rational both engines share, ties break by id at every pick
      t(s, d, "embeddings").filter(col("vec_id") < 40)
        .select(col("vec_id"), col("embedding"),
          ((col("vec_id") * 37) % 97).cast("double") / 97.0 as "rel")
        .createOrReplaceTempView("q259_emb")
      GraftGateway.sql(s,
        "SELECT mmr(vec_id, embedding, rel, 5, 0.7) FROM q259_emb")
        .select(col("rank"), col("id"),
          round(col("relevance"), 6).as("relevance"),
          round(col("mmr_score"), 6).as("mmr_score"))
        .orderBy(col("rank"))
    }),
    "q260_chow_test" -> ((s, d) => {
      // planted regime break: slope shifts by +0.5 in regime 1, so the
      // pooled fit can't absorb it and F lands far in the tail
      t(s, d, "lineitem")
        .select((col("l_extendedprice") +
          when(col("l_orderkey") % 2 === 1, col("l_quantity") * 0.5)
            .otherwise(0.0)).as("y"),
          col("l_quantity").as("x"),
          (col("l_orderkey") % 2).cast("int").as("g"))
        .createOrReplaceTempView("q260_li")
      GraftGateway.sql(s, "SELECT chow_test(y, g, x) FROM q260_li")
        .select(col("n1"), col("n0"), col("k"),
          round(col("f_stat"), 2).as("f_stat"))
    }),
    "q261_breusch_pagan" -> ((s, d) => {
      // extendedprice ≈ qty x unit price, so the residual spread grows
      // with quantity — a naturally heteroskedastic fixture
      t(s, d, "lineitem")
        .select(col("l_extendedprice").as("y"), col("l_quantity").as("x"))
        .createOrReplaceTempView("q261_li")
      GraftGateway.sql(s, "SELECT breusch_pagan(y, x) FROM q261_li")
        .select(col("n"), col("k"), round(col("r2_aux"), 6).as("r2_aux"),
          round(col("lm"), 2).as("lm"))
    }),
    "q262_k_anonymity" -> ((s, d) => {
      // release audit over (nation, segment) quasi-ids at k=10
      t(s, d, "customer").createOrReplaceTempView("q262_cu")
      GraftGateway.sql(s,
        "SELECT k_anonymity(10, c_nationkey, c_mktsegment) FROM q262_cu")
        .select(col("n"), col("classes"), col("min_class_size"), col("k"),
          col("violating_classes"), col("violating_rows"),
          col("k_anonymous"))
    }),
    "q263_mmd_rff" -> ((s, d) => {
      // embedding-distribution two-sample: labels 0-4 vs 5-9; the RFF
      // matrix derives from integer-modular Box-Muller, so both engines
      // construct the identical frequencies from (f, d) alone
      t(s, d, "embeddings")
        .select((col("label") < 5).cast("int").as("g"), col("embedding"))
        .createOrReplaceTempView("q263_emb")
      GraftGateway.sql(s,
        "SELECT mmd_rff(g, embedding, 32, 0.015625) FROM q263_emb")
        .select(col("n_x"), col("n_y"), col("features"), col("gamma"),
          round(col("mmd2"), 8).as("mmd2"))
    }),
    "q264_cochran_armitage" -> ((s, d) => {
      // planted dose-response: success threshold widens by 5 points per
      // dose level, so the rate climbs monotonically with dose
      t(s, d, "events")
        .select((col("event_id") % 4).cast("double").as("dose"),
          (col("event_id") % 100 <
            lit(40) + (col("event_id") % 4) * 5).cast("int").as("y"))
        .createOrReplaceTempView("q264_ev")
      GraftGateway.sql(s, "SELECT cochran_armitage(dose, y) FROM q264_ev")
        .select(col("n"), col("k"),
          round(col("pooled_rate"), 8).as("pooled_rate"),
          round(col("t"), 4).as("t"), round(col("var_t"), 4).as("var_t"),
          round(col("z"), 6).as("z"))
    }),
    "q265_auc_ci" -> ((s, d) => {
      // label-separated scores (+20 on positives) so AUC is high and the
      // DeLong variance is exercised on real tie structure
      t(s, d, "events")
        .select((col("event_id") % 3 === 0).cast("int").as("y"),
          (col("value") +
            when(col("event_id") % 3 === 0, 20.0).otherwise(0.0)).as("s"))
        .createOrReplaceTempView("q265_ev")
      GraftGateway.sql(s, "SELECT auc_ci(y, s) FROM q265_ev")
        .select(col("n_pos"), col("n_neg"), round(col("auc"), 8).as("auc"),
          round(col("se"), 8).as("se"),
          round(col("ci_low"), 6).as("ci_low"),
          round(col("ci_high"), 6).as("ci_high"))
    }),
    "q266_g_test" -> ((s, d) => {
      // returnflag x linestatus dependence (the q140 chisq fixture's
      // G-square sibling); G2 = 2 sum O ln(O/E) over observed cells
      t(s, d, "lineitem").createOrReplaceTempView("q266_li")
      GraftGateway.sql(s,
        "SELECT g_test(l_returnflag, l_linestatus) FROM q266_li")
        .select(col("n"), col("n_rows"), col("n_cols"), col("dof"),
          round(col("g2"), 4).as("g2"))
    }),
    "q267_dedup_rank_election" -> ((s, d) => {
      // the PageRank -> dedup composition (canonical-member election):
      // the q236 4-blob + straddler fixture, plus a planted link graph
      // where every member links to its group's HUB (blob b -> id b+4,
      // straddlers -> 514; hubs self-loop, so no dangling mass). The
      // hub is the only in-linked node of each dup component, so its
      // PageRank strictly exceeds every other member's and the rank
      // election must return the hub — NOT the min id (blob 0's min id
      // is 0, its hub is 4) — making the rep set a closed form the
      // oracle replays without floats.
      val emb = t(s, d, "events").filter(col("event_id") < 1000)
        .selectExpr("event_id AS vid",
          "CASE WHEN event_id % 250 = 13 THEN array(6.5D, 7.5D) " +
            "WHEN event_id % 250 = 14 THEN array(7.5D, 6.5D) " +
            "WHEN event_id % 4 = 0 THEN array(10.0D + event_id % 7, 0.0D) " +
            "WHEN event_id % 4 = 1 THEN array(0.0D, 10.0D + event_id % 7) " +
            "WHEN event_id % 4 = 2 THEN array(-(10.0D + event_id % 7), 0.0D) " +
            "ELSE array(0.0D, -(10.0D + event_id % 7)) END AS emb",
          "CASE WHEN event_id % 250 IN (13, 14) THEN 514L " +
            "ELSE (event_id % 4) + 4L END AS hub")
      val ranks = graft.ops.Graph.pageRank(
        emb.select(col("vid").as("src"), col("hub").as("dst")),
        col("src"), col("dst"), damping = 0.85, iterations = 3)
      emb.join(ranks, emb("vid") === ranks("node"), "left")
        .select(col("vid"), col("emb"),
          coalesce(col("rank"), lit(0.0)).as("pr"))
        .createOrReplaceTempView("q267_emb")
      GraftGateway.sql(s,
        "SELECT semantic_dedup(vid, emb, 4, 0.95, 2, 2000, 2, pr) " +
          "FROM q267_emb")
        .groupBy(col("rep_id")).agg(count(lit(1)).as("n_members"))
        .orderBy(col("rep_id"))
    }),
    "q268_ope" -> ((s, d) => {
      // off-policy value of a planted target policy on logged traffic:
      // propensities are exact decimal grids, reward integer-valued, the
      // outcome model a coarse per-row baseline; clip at 2.0 exercises
      // the clipped_share path (max raw ratio 0.5/0.2 = 2.5)
      t(s, d, "events")
        .select(((col("event_id") % 4 + 2) / lit(10.0)).as("pl"),
          ((col("event_id") % 5 + 1) / lit(10.0)).as("pt"),
          (col("event_id") % 7).cast("double").as("r"),
          ((col("event_id") % 3) * lit(0.5)).as("q"))
        .createOrReplaceTempView("q268_ev")
      GraftGateway.sql(s, "SELECT ope(r, pt, pl, q, 2.0) FROM q268_ev")
        .select(col("n"), round(col("ess"), 4).as("ess"),
          round(col("clipped_share"), 8).as("clipped_share"),
          round(col("ips"), 8).as("ips"),
          round(col("ips_se"), 8).as("ips_se"),
          round(col("snips"), 8).as("snips"),
          round(col("snips_se"), 8).as("snips_se"),
          round(col("dr"), 8).as("dr"),
          round(col("dr_se"), 8).as("dr_se"))
    }),
    "q269_neg_bin_reg" -> ((s, d) => {
      // saturated binary-covariate NB2: the planted id%6 lattice gives
      // arm0 y in {0,0,2}, arm1 y in {0,1,9} — heavily overdispersed in
      // arm1 — so the MLE means are the arm means (slope ln(m1/m0)),
      // the moment alpha closes from the arm stats, and the NB weights
      // give the closed-form (X'WX)^-1 the oracle replays
      t(s, d, "events")
        .select(
          when(col("event_id") % 6 === 3, 1.0)
            .when(col("event_id") % 6 === 4, 2.0)
            .when(col("event_id") % 6 === 5, 9.0)
            .otherwise(0.0).as("y"),
          (col("event_id") % 2).cast("int").as("x"))
        .createOrReplaceTempView("q269_ev")
      GraftGateway.sql(s, "SELECT neg_bin_reg(y, x) FROM q269_ev")
        .select(col("term"), round(col("estimate"), 6).as("estimate"),
          round(col("stderr"), 6).as("stderr"),
          round(col("alpha"), 6).as("alpha"),
          // r17 inference: auxiliary-regression SE of alpha and the
          // boundary-corrected Poisson-vs-NB2 LR stat — both close over
          // the arm cells on this saturated fixture, so the oracle
          // replays them live (p omitted: no chi-square CDF in SQL)
          round(col("alpha_se"), 6).as("alpha_se"),
          round(col("lr_stat"), 4).as("lr_stat"), col("n"))
        .orderBy(col("term"))
    }),
    "q270_isotonic_calibrate" -> ((s, d) => {
      // 10 score levels with planted per-level positive rates
      // [.1,.2,.3,.4,.5,.45,.6,.7,.8,.9] driven by an independent
      // sub-position — monotone except the (4,5) inversion, which PAVA
      // pools to their weighted mean (0.4 < pooled < 0.6, margins wide
      // enough that count imbalance cannot change the pooling) — so the
      // oracle replays the fit as a closed-form CASE over level cells
      t(s, d, "events")
        .select((col("event_id") % 10).cast("double").as("s"),
          (((col("event_id") / 10).cast("long") % 20) <
            element_at(typedLit(Seq(2, 4, 6, 8, 10, 9, 12, 14, 16, 18)),
              (col("event_id") % 10).cast("int") + 1)).cast("int").as("y"))
        .createOrReplaceTempView("q270_ev")
      GraftGateway.sql(s, "SELECT isotonic_calibrate(s, y) FROM q270_ev")
        .select(col("score"), col("n"),
          round(col("raw_rate"), 8).as("raw_rate"),
          round(col("calibrated"), 8).as("calibrated"))
        .orderBy(col("score"))
    }),
    "q271_weighted_kappa" -> ((s, d) => {
      // ordinal judge-vs-judge grades on a 5-level scale: mostly equal,
      // planted 1-step and 2-step disagreements — quadratic weights
      // punish the 2-step ones 4x; all five labels appear on both sides
      // so the sorted-union index equals the value itself and the oracle
      // replays weights as value distance over (k-1) = 4
      t(s, d, "events")
        .select((col("event_id") % 5).cast("double").as("a"),
          ((col("event_id") % 5 +
            when(col("event_id") % 7 === 0, 1).otherwise(0) +
            when(col("event_id") % 11 === 0, 2).otherwise(0)) % 5)
            .cast("double").as("b"))
        .createOrReplaceTempView("q271_ev")
      GraftGateway.sql(s, "SELECT weighted_kappa(a, b) FROM q271_ev")
        .select(col("n"), col("categories"), col("weighting"),
          round(col("po_w"), 8).as("po_w"), round(col("pe_w"), 8).as("pe_w"),
          round(col("kappa_w"), 8).as("kappa_w"),
          round(col("se"), 8).as("se"), round(col("z"), 4).as("z"))
    }),
    "q272_cox_zph" -> ((s, d) => {
      // PH-assumption check on the q142 cox fixture (heavy Breslow
      // ties, two covariates, rank transform). The score test rides the
      // Newton fit, so the oracle pins the sf0.01 statistics (q142/q34
      // idiom) while n per term stays a live closed form via count(*)
      t(s, d, "lineitem").select(col("l_quantity").cast("int").as("stime"),
          (col("l_linenumber") % 2).cast("int").as("ev"),
          (col("l_discount") * 10.0).as("x1"),
          (col("l_orderkey") % 2).cast("double").as("x2"))
        .createOrReplaceTempView("q272_cox")
      GraftGateway.sql(s, "SELECT cox_zph(stime, ev, x1, x2) FROM q272_cox")
        .select(col("term"), round(col("chisq"), 4).as("chisq"),
          col("df"),
          // r17: the trend DIRECTION θ̂ = S⁻¹u per covariate (null on
          // the GLOBAL row) — a failing test also says which way the
          // hazard ratio drifts
          round(col("theta"), 6).as("theta"),
          lit(sfTag(d)).as("oracle_sf"))
        .orderBy(col("term"))
    }),
    "q273_isotonic_score" -> ((s, d) => {
      // calibrate-then-score: fit on the q270 fixture (closed-form PAVA
      // — only the (4,5) inversion pools), apply the step function to a
      // HELD-OUT score grid at half-integer steps spanning below-range
      // (-1.0, -0.5 clamp to the first block), between-level fractions
      // (carry the level below), and above-range (9.5..11 carry level 9)
      t(s, d, "events")
        .select((col("event_id") % 10).cast("double").as("sc"),
          (((col("event_id") / 10).cast("long") % 20) <
            element_at(typedLit(Seq(2, 4, 6, 8, 10, 9, 12, 14, 16, 18)),
              (col("event_id") % 10).cast("int") + 1)).cast("int").as("y"))
        .createOrReplaceTempView("q273_train")
      t(s, d, "events")
        .select(((col("event_id") % 25).cast("double") * 0.5 - 1.0).as("sc"))
        .createOrReplaceTempView("q273_tgt")
      GraftGateway.sql(s,
        "SELECT isotonic_score(sc, y, 'q273_train') FROM q273_tgt")
        .groupBy(col("sc").as("score"),
          round(col("calibrated"), 8).as("calibrated"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("score"))
    }),
    "q274_cox_ph_strat" -> ((s, d) => {
      // the q272 cox fixture with a 3-level stratum riding the same
      // cells: per-stratum baseline, shared beta. The Newton fit has no
      // closed SQL form, so the oracle pins the sf0.01 estimates (q142
      // idiom) while n / n_events stay live closed forms
      t(s, d, "lineitem").select(col("l_quantity").cast("int").as("stime"),
          (col("l_linenumber") % 2).cast("int").as("ev"),
          (col("l_suppkey") % 3).cast("string").as("site"),
          (col("l_discount") * 10.0).as("x1"),
          (col("l_orderkey") % 2).cast("double").as("x2"))
        .createOrReplaceTempView("q274_cox")
      GraftGateway.sql(s,
        "SELECT cox_ph_strat(stime, ev, site, x1, x2) FROM q274_cox")
        .select(col("term"), round(col("estimate"), 6).as("estimate"),
          round(col("stderr"), 6).as("stderr"), col("n"), col("n_events"),
          lit(sfTag(d)).as("oracle_sf"))
        .orderBy(col("term"))
    }),
    "q276_rmst_diff" -> ((s, d) => {
      // hazard-ratio-free between-arm effect on the q177 KM fixture with
      // a binary arm: per-arm RMST/variance replay as the q177 window
      // chain, the difference closes as arithmetic over the two arm rows
      t(s, d, "lineitem")
        .select((col("l_orderkey") % 2).cast("int").as("g"),
          col("l_quantity").cast("int").as("time"),
          (col("l_linenumber") % 2).cast("int").as("event"))
        .createOrReplaceTempView("q276_su")
      GraftGateway.sql(s,
        "SELECT rmst_diff(time, event, 40.0, g) FROM q276_su")
        .select(col("tau"), col("n0"), col("n1"),
          round(col("rmst0"), 6).as("rmst0"),
          round(col("rmst1"), 6).as("rmst1"),
          round(col("diff"), 6).as("diff"), round(col("se"), 6).as("se"),
          round(col("z"), 4).as("z"),
          round(col("lower"), 6).as("lower"),
          round(col("upper"), 6).as("upper"))
    }),
    "q275_cox_survival" -> ((s, d) => {
      // scoring a STORED Cox model (the eval_ml_method idiom): explicit
      // beta literals make every output a live closed form at any sf —
      // Breslow H0 is a suffix/prefix window chain over time cells in
      // SQL; the q142 fixture has an event at every distinct time, so
      // raw-time cells equal bucketed cells in both engines
      t(s, d, "lineitem").select(col("l_quantity").cast("int").as("stime"),
          (col("l_linenumber") % 2).cast("int").as("ev"),
          (col("l_discount") * 10.0).as("x1"),
          (col("l_orderkey") % 2).cast("double").as("x2"))
        .createOrReplaceTempView("q275_cox")
      GraftGateway.sql(s,
        "SELECT cox_survival(stime, ev, x1, x2, '0.02,-0.01', '5.0,1.0') " +
          "FROM q275_cox")
        .select(col("time"), col("n_events"), round(col("s0"), 4).as("s0"),
          round(col("h0_cum"), 6).as("h0_cum"),
          round(col("survival"), 6).as("survival"))
        .orderBy(col("time"))
    }),
    "q277_cox_ph_efron" -> ((s, d) => {
      // the q142 heavy-tie fixture under Efron's convention (R
      // survival::coxph's default — ~690 tied events per distinct time
      // is exactly the shape where Breslow attenuates beta toward 0:
      // x1 reads 0.020925 here vs 0.018778 under Breslow). The Newton
      // fit has no closed SQL form, so the oracle pins the sf0.01
      // estimates (q142 idiom) while n / n_events stay live closed forms
      t(s, d, "lineitem").select(col("l_quantity").cast("int").as("stime"),
          (col("l_linenumber") % 2).cast("int").as("ev"),
          (col("l_discount") * 10.0).as("x1"),
          (col("l_orderkey") % 2).cast("double").as("x2"))
        .createOrReplaceTempView("q277_cox")
      GraftGateway.sql(s,
        "SELECT cox_ph(stime, ev, x1, x2, 'efron') FROM q277_cox")
        .select(col("term"), round(col("estimate"), 6).as("estimate"),
          round(col("stderr"), 6).as("stderr"),
          round(col("z_value"), 4).as("z_value"),
          col("n"), col("n_events"), lit(sfTag(d)).as("oracle_sf"))
        .orderBy(col("term"))
    }),
    "q278_cox_ph_cluster" -> ((s, d) => {
      // Lin-Wei sandwich SEs on the q142 fixture with cluster =
      // l_orderkey % 200 — x2 = l_orderkey % 2 is CLUSTER-CONSTANT
      // (every cluster's orders share parity), the designed use case:
      // its robust SE reads above the model SE. Point estimates equal
      // q142's Breslow fit (same subjects); the sandwich has no closed
      // SQL form, so the oracle pins the sf0.01 SEs (q142 idiom) while
      // n / n_events / n_clusters stay live closed forms
      t(s, d, "lineitem").select(
          (col("l_orderkey") % 200).cast("string").as("cl"),
          col("l_quantity").cast("int").as("stime"),
          (col("l_linenumber") % 2).cast("int").as("ev"),
          (col("l_discount") * 10.0).as("x1"),
          (col("l_orderkey") % 2).cast("double").as("x2"))
        .createOrReplaceTempView("q278_cox")
      GraftGateway.sql(s,
        "SELECT cox_ph_cluster(stime, ev, cl, x1, x2) FROM q278_cox")
        .select(col("term"), round(col("estimate"), 6).as("estimate"),
          round(col("se_model"), 6).as("se_model"),
          round(col("se_robust"), 6).as("se_robust"),
          round(col("z_robust"), 4).as("z_robust"),
          col("n"), col("n_events"), col("n_clusters"),
          lit(sfTag(d)).as("oracle_sf"))
        .orderBy(col("term"))
    }),
    "q279_fine_gray" -> ((s, d) => {
      // competing-risks regression: cause = l_linenumber % 3 splits the
      // cohort into censored / modeled / competing thirds over the q142
      // tied time grid. The IPCW Newton fit has no closed SQL form, so
      // the oracle pins the sf0.01 estimates (q142 idiom) while
      // n / n_events / n_competing stay live closed forms
      t(s, d, "lineitem").select(col("l_quantity").cast("int").as("stime"),
          (col("l_linenumber") % 3).cast("int").as("cause"),
          (col("l_discount") * 10.0).as("x1"),
          (col("l_orderkey") % 2).cast("double").as("x2"))
        .createOrReplaceTempView("q279_cr")
      GraftGateway.sql(s,
        "SELECT fine_gray(stime, cause, x1, x2) FROM q279_cr")
        .select(col("term"), round(col("estimate"), 6).as("estimate"),
          round(col("stderr"), 6).as("stderr"),
          round(col("z_value"), 4).as("z_value"),
          col("n"), col("n_events"), col("n_competing"),
          lit(sfTag(d)).as("oracle_sf"))
        .orderBy(col("term"))
    }),
    "q280_fine_gray_cif" -> ((s, d) => {
      // scoring a STORED Fine-Gray model (the q275 idiom): explicit beta
      // literals keep every output a live closed form at any sf — the
      // censoring KM, both role sums, and the hazard prefix replay as
      // window chains over the 50 time cells in SQL
      t(s, d, "lineitem").select(col("l_quantity").cast("int").as("stime"),
          (col("l_linenumber") % 3).cast("int").as("cause"),
          (col("l_discount") * 10.0).as("x1"),
          (col("l_orderkey") % 2).cast("double").as("x2"))
        .createOrReplaceTempView("q280_cr")
      GraftGateway.sql(s,
        "SELECT fine_gray_cif(stime, cause, x1, x2, '0.02,0.01', " +
          "'5.0,1.0') FROM q280_cr")
        .select(col("time"), col("n_events"), round(col("w0"), 4).as("w0"),
          round(col("h0_cum"), 6).as("h0_cum"),
          round(col("cif"), 6).as("cif"))
        .orderBy(col("time"))
    }),
    "q281_gray_test" -> ((s, d) => {
      // Gray's 2-sample test for equal cumulative-incidence functions
      // over the q279 competing-risks cohort, split by order parity. The
      // score test at beta = 0 is closed-form, so the ENTIRE statistic
      // stays a live oracle: the censoring KM, both per-group role
      // chains, and the score/information sums replay as window chains
      t(s, d, "lineitem").select(col("l_quantity").cast("int").as("stime"),
          (col("l_linenumber") % 3).cast("int").as("cause"),
          (col("l_orderkey") % 2).as("grp"))
        .createOrReplaceTempView("q281_cr")
      GraftGateway.sql(s,
        "SELECT gray_test(stime, cause, grp) FROM q281_cr")
        .select(col("group_value"), col("n"), col("n_events"),
          col("n_competing"), col("observed"),
          round(col("expected"), 4).as("expected"),
          round(col("chi2"), 6).as("chi2"), col("df"))
        .orderBy(col("group_value"))
    }),
    "q282_aft_weibull" -> ((s, d) => {
      // parametric Weibull AFT fit over the q277 censored cohort. The
      // damped-Newton MLE has no closed SQL form, so the oracle pins
      // the sf0.01 estimates (q142 idiom); n / n_events stay live
      t(s, d, "lineitem").select(col("l_quantity").cast("int").as("stime"),
          when(col("l_linenumber") % 3 === 1, 1).otherwise(0).as("ev"),
          (col("l_discount") * 10.0).as("x1"),
          (col("l_orderkey") % 2).cast("double").as("x2"))
        .createOrReplaceTempView("q282_surv")
      GraftGateway.sql(s,
        "SELECT aft(stime, ev, x1, x2) FROM q282_surv")
        .select(col("term"), round(col("estimate"), 6).as("estimate"),
          round(col("stderr"), 6).as("stderr"),
          round(col("z_value"), 4).as("z_value"),
          col("n"), col("n_events"), col("dist"),
          lit(sfTag(d)).as("oracle_sf"))
        .orderBy(col("term"))
    }),
    "q283_aft_lognormal" -> ((s, d) => {
      // lognormal AFT with NO censoring reduces in closed form to OLS
      // of log t on x with sigma^2 = RSS/n and se(log_scale) =
      // 1/sqrt(2n) — so even though the engine path is the iterative
      // damped Newton, the oracle stays fully LIVE at any sf
      t(s, d, "lineitem").select(col("l_quantity").cast("int").as("stime"),
          lit(1).as("ev"), (col("l_discount") * 10.0).as("x1"))
        .createOrReplaceTempView("q283_surv")
      GraftGateway.sql(s,
        "SELECT aft(stime, ev, x1, 'lognormal') FROM q283_surv")
        .select(col("term"), round(col("estimate"), 6).as("estimate"),
          round(col("stderr"), 6).as("stderr"),
          round(col("z_value"), 4).as("z_value"),
          col("n"), col("n_events"), col("dist"))
        .orderBy(col("term"))
    }),
    "q296_multinomial_score" -> ((s, d) => {
      // scoring a STORED softmax model: per-row class probabilities are
      // pure exp closed forms, collapsed per predicted class so the
      // oracle stays live and the output bounded at any sf
      t(s, d, "lineitem").select((col("l_discount") * 10.0).as("x1"),
          (col("l_quantity") / 25.0).as("x2"))
        .createOrReplaceTempView("q296_x")
      GraftGateway.sql(s,
        "SELECT multinomial_score(x1, x2, " +
          "'0.2,-0.5,0.8,-0.4,0.6,-0.9', 3) FROM q296_x")
        .groupBy(col("pred_class"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("prob_1")), 6).as("avg_p1"),
          round(avg(col("prob_2")), 6).as("avg_p2"),
          round(avg(col("prob_3")), 6).as("avg_p3"))
        .orderBy(col("pred_class"))
    }),
    "q295_multinomial_logit" -> ((s, d) => {
      // softmax regression of a 3-level quantity tier vs the lowest
      // tier. The damped-Newton MLE has no closed SQL form, so the
      // oracle pins the sf0.01 estimates (q142 idiom); n stays live
      t(s, d, "lineitem").select(
          ceil(col("l_quantity") / 17.0).cast("double").as("tier"),
          (col("l_discount") * 10.0).as("x1"),
          (col("l_orderkey") % 2).cast("double").as("x2"))
        .createOrReplaceTempView("q295_mn")
      GraftGateway.sql(s,
        "SELECT multinomial_logit(tier, x1, x2) FROM q295_mn")
        .select(col("class_value"), col("term"),
          round(col("estimate"), 6).as("estimate"),
          round(col("stderr"), 6).as("stderr"),
          round(col("z_value"), 4).as("z_value"),
          col("n"), col("n_levels"), lit(sfTag(d)).as("oracle_sf"))
        .orderBy(col("class_value"), col("term"))
    }),
    "q294_platt_score" -> ((s, d) => {
      // parametric calibrate-then-score: logistic of (quantity > 25) on
      // the discount score, applied back to the same table and
      // collapsed per distinct score. The 2-parameter fit is iterative,
      // so the oracle pins (a, b) at sf0.01 and replays the sigmoid +
      // collapse live
      t(s, d, "lineitem").select((col("l_discount") * 10.0).as("sc"),
          (col("l_quantity") > 25).cast("double").as("lbl"))
        .createOrReplaceTempView("q294_cal")
      GraftGateway.sql(s,
        "SELECT platt_score(sc, lbl, 'q294_cal') FROM q294_cal")
        .groupBy(col("sc")).agg(count(lit(1)).as("n"),
          round(avg(col("calibrated")), 6).as("avg_cal"),
          round(avg(col("lbl")), 6).as("rate"))
        .withColumn("sc", round(col("sc"), 2))
        .select(col("sc"), col("n"), col("avg_cal"), col("rate"),
          lit(sfTag(d)).as("oracle_sf"))
        .orderBy(col("sc"))
    }),
    "q293_ordinal_score" -> ((s, d) => {
      // scoring a STORED proportional-odds model (the isotonic_score
      // pattern): per-row class probabilities are pure sigmoid closed
      // forms, collapsed per predicted class so the oracle stays live
      // and the output bounded at any sf
      t(s, d, "lineitem").select((col("l_discount") * 10.0).as("x1"))
        .createOrReplaceTempView("q293_x")
      GraftGateway.sql(s,
        "SELECT ordinal_score(x1, '-0.2,0.3,0.8', '1.2') FROM q293_x")
        .groupBy(col("pred_class"))
        .agg(count(lit(1)).as("n"),
          round(avg(col("prob_1")), 6).as("avg_p1"),
          round(avg(col("prob_2")), 6).as("avg_p2"),
          round(avg(col("prob_3")), 6).as("avg_p3"),
          round(avg(col("prob_4")), 6).as("avg_p4"))
        .orderBy(col("pred_class"))
    }),
    "q292_gamma_reg" -> ((s, d) => {
      // gamma GLM of a positive skewed outcome (price in thousands) on
      // discount and quantity. The IRLS MLE has no closed SQL form, so
      // the oracle pins the sf0.01 estimates (q142 idiom); n stays live
      t(s, d, "lineitem").select(
          (col("l_extendedprice") / 1000.0).as("y"),
          (col("l_discount") * 10.0).as("x1"),
          (col("l_quantity") / 10.0).as("x2"))
        .createOrReplaceTempView("q292_rev")
      GraftGateway.sql(s, "SELECT gamma_reg(y, x1, x2) FROM q292_rev")
        .select(col("term"), round(col("estimate"), 6).as("estimate"),
          round(col("stderr"), 6).as("stderr"),
          round(col("z_value"), 4).as("z_value"), col("n"),
          round(col("dispersion"), 6).as("dispersion"),
          lit(sfTag(d)).as("oracle_sf"))
        .orderBy(col("term"))
    }),
    "q291_ordinal_logit" -> ((s, d) => {
      // proportional-odds regression of a 4-level quantity tier. The
      // damped-Newton MLE has no closed SQL form, so the oracle pins
      // the sf0.01 estimates (q142 idiom); n / n_levels stay live
      t(s, d, "lineitem").select(
          ceil(col("l_quantity") / 13.0).cast("double").as("tier"),
          (col("l_discount") * 10.0).as("x1"),
          (col("l_orderkey") % 2).cast("double").as("x2"))
        .createOrReplaceTempView("q291_ord")
      GraftGateway.sql(s, "SELECT ordinal_logit(tier, x1, x2) FROM q291_ord")
        .select(col("term"), round(col("estimate"), 6).as("estimate"),
          round(col("stderr"), 6).as("stderr"),
          round(col("z_value"), 4).as("z_value"),
          col("n"), col("n_levels"), lit(sfTag(d)).as("oracle_sf"))
        .orderBy(col("term"))
    }),
    "q288_bartlett" -> ((s, d) => {
      // parametric equal-variance test across return-flag arms; the
      // whole statistic is closed-form over per-arm variance cells
      t(s, d, "lineitem").select(col("l_quantity").cast("double").as("y"),
          col("l_returnflag").as("arm"))
        .createOrReplaceTempView("q288_arms")
      GraftGateway.sql(s, "SELECT bartlett(y, arm) FROM q288_arms")
        .select(col("n"), col("k"),
          round(col("statistic"), 4).as("statistic"), col("df"))
    }),
    "q289_breslow_day" -> ((s, d) => {
      // odds-ratio homogeneity across supplier-bucket strata (the CMH
      // assumption check); the per-stratum quadratic solve replays as
      // closed-form SQL, so the oracle stays fully live
      t(s, d, "lineitem").select((col("l_suppkey") % 7).cast("string").as("st"),
          (col("l_orderkey") % 2).cast("int").as("t"),
          (col("l_quantity") > 25).cast("int").as("y"))
        .createOrReplaceTempView("q289_strata")
      GraftGateway.sql(s, "SELECT breslow_day(st, t, y) FROM q289_strata")
        .select(col("strata"), col("strata_skipped"),
          round(col("or_mh"), 6).as("or_mh"),
          round(col("bd_chisq"), 4).as("bd_chisq"),
          round(col("tarone_chisq"), 4).as("tarone_chisq"), col("df"))
    }),
    "q290_design_effect" -> ((s, d) => {
      // Kish design effect / effective sample size of quantity-as-weight
      // per return flag — the honest-precision line before any weighted
      // estimate
      t(s, d, "lineitem").select(col("l_quantity").cast("double").as("w"),
          col("l_returnflag").as("g"))
        .createOrReplaceTempView("q290_w")
      GraftGateway.sql(s, "SELECT design_effect(w, g) FROM q290_w")
        .select(col("group_value"), col("n"),
          round(col("sum_w"), 4).as("sum_w"),
          round(col("deff"), 6).as("deff"),
          round(col("ess"), 4).as("ess"))
        .orderBy(col("group_value"))
    }),
    "q286_acf_pacf" -> ((s, d) => {
      // Box-Jenkins order identification over the q202 period series:
      // ACF + Durbin-Levinson PACF per lag. At 3 lags the DL recursion
      // unrolls to closed forms, so the WHOLE output stays a live oracle
      t(s, d, "events")
        .selectExpr("CAST(floor(event_id / 100) AS BIGINT) AS period",
          "value")
        .createOrReplaceTempView("ev_ap")
      GraftGateway.sql(s, "SELECT acf_pacf(period, value, 3) FROM ev_ap")
        .select(col("lag"), round(col("acf"), 6).as("acf"),
          round(col("pacf"), 6).as("pacf"),
          round(col("ci_band"), 6).as("ci_band"))
        .orderBy(col("lag"))
    }),
    "q287_vif" -> ((s, d) => {
      // multicollinearity screen over three lineitem measures; the
      // 3x3 correlation inverse unrolls to cofactor closed forms, so
      // the oracle stays live through vif/tolerance/r_squared
      t(s, d, "lineitem").select(
          col("l_quantity").cast("double").as("x1"),
          col("l_extendedprice").as("x2"), col("l_discount").as("x3"))
        .createOrReplaceTempView("q287_x")
      GraftGateway.sql(s, "SELECT vif(x1, x2, x3) FROM q287_x")
        .select(col("term"), round(col("vif"), 6).as("vif"),
          round(col("tolerance"), 6).as("tolerance"),
          round(col("r_squared"), 6).as("r_squared"), col("n"))
        .orderBy(col("term"))
    }),
    "q285_synth_did" -> ((s, d) => {
      // synthetic DID over a supplier x quantity-bucket panel: suppliers
      // 0-2 of 12 are 'treated', periods > 3.5 are post. The double
      // Frank-Wolfe fit has no closed SQL form, so the oracle pins the
      // sf0.01 estimates (q142 idiom); the design counts stay live
      t(s, d, "lineitem").select(
          (col("l_suppkey") % 12).cast("string").as("u"),
          (col("l_quantity") % 8).cast("double").as("p"),
          (col("l_extendedprice") / 1000.0).as("v"),
          ((col("l_suppkey") % 12) < 3).cast("int").as("tr"))
        .createOrReplaceTempView("q285_panel")
      GraftGateway.sql(s,
        "SELECT synth_did(u, p, v, tr, 3.5) FROM q285_panel")
        .select(round(col("att"), 6).as("att"),
          round(col("se"), 6).as("se"), col("se_method"),
          round(col("z_value"), 4).as("z_value"),
          col("n_treated"), col("n_donors"), col("n_pre"), col("n_post"),
          lit(sfTag(d)).as("oracle_sf"))
    }),
    "q284_aft_survival" -> ((s, d) => {
      // scoring a STORED Weibull AFT model (the q275/q280 idiom):
      // explicit param literals keep the whole curve a closed form per
      // distinct time — live at any sf, no collect anywhere
      t(s, d, "lineitem").select(col("l_quantity").cast("int").as("stime"),
          when(col("l_linenumber") % 3 === 1, 1).otherwise(0).as("ev"),
          (col("l_discount") * 10.0).as("x1"),
          (col("l_orderkey") % 2).cast("double").as("x2"))
        .createOrReplaceTempView("q284_surv")
      GraftGateway.sql(s,
        "SELECT aft_survival(stime, ev, x1, x2, '3.8,0.02,0.01,-0.5', " +
          "'5.0,1.0') FROM q284_surv")
        .select(col("time"), round(col("survival"), 6).as("survival"),
          round(col("cum_hazard"), 6).as("cum_hazard"))
        .orderBy(col("time"))
    }),
    "q243_bowker_test" -> ((s, d) => {
      // paired labels with a planted ASYMMETRIC shift: every 5th item's
      // second label moves one category up, so disagreement flows one way
      // and the symmetry chi-square grows with n (p checked in spec; the
      // oracle replays chisq/df closed-form over the cell self-join)
      t(s, d, "events")
        .select((col("event_id") % 4).as("a"),
          ((col("event_id") % 4) + when(col("event_id") % 5 === 0, 1)
            .otherwise(0)) % 4 as "b")
        .createOrReplaceTempView("q243_ev")
      GraftGateway.sql(s, "SELECT bowker_test(a, b) FROM q243_ev")
        .select(col("n"), col("categories"),
          round(col("chisq"), 6).as("chisq"), col("df"))
    }),
    "q244_lin_ccc" -> ((s, d) => {
      // y is a location+scale-shifted copy of x plus discount noise:
      // Pearson r stays high while CCC drops — exactly the gap the
      // statistic exists to expose
      t(s, d, "lineitem")
        .select(col("l_quantity").cast("double").as("x"),
          (col("l_quantity") * 0.9 + 2.0 + col("l_discount") * 10.0).as("y"))
        .createOrReplaceTempView("q244_li")
      GraftGateway.sql(s, "SELECT lin_ccc(x, y) FROM q244_li")
        .select(col("n"), round(col("pearson_r"), 6).as("pearson_r"),
          round(col("ccc"), 6).as("ccc"), round(col("c_b"), 6).as("c_b"),
          round(col("location_shift"), 6).as("location_shift"),
          round(col("scale_shift"), 6).as("scale_shift"))
    }),
    "q245_brier_decomposition" -> ((s, d) => {
      // 10-cell forecast lattice with a deterministic outcome rule — the
      // Murphy identity holds exactly on discrete forecasts, and every
      // term is a cell closed form
      t(s, d, "events")
        .select((((col("event_id") % 10) * 10 + 5) / lit(100.0)).as("f"),
          when((col("event_id") * 13) % 100 <
            (col("event_id") % 10) * 10 + 5, 1.0).otherwise(0.0).as("y"))
        .createOrReplaceTempView("q245_ev")
      GraftGateway.sql(s,
        "SELECT brier_decomposition(y, f) FROM q245_ev")
        .select(col("n"), round(col("brier"), 8).as("brier"),
          round(col("reliability"), 8).as("reliability"),
          round(col("resolution"), 8).as("resolution"),
          round(col("uncertainty"), 8).as("uncertainty"),
          round(col("base_rate"), 8).as("base_rate"))
    }),
    "q246_ndcg" -> ((s, d) => {
      // 50 queries x ~200 ranked items, graded relevance 0..3, heavy
      // score ties broken by item id both sides (deterministic windows
      // the oracle replays verbatim)
      t(s, d, "events")
        .select((col("event_id") % 50).as("q"), col("event_id").as("item"),
          (((col("event_id") * 37) % 1000) / lit(1000.0)).as("score"),
          ((col("event_id") * 13) % 4).cast("double").as("rel"))
        .createOrReplaceTempView("q246_ev")
      GraftGateway.sql(s,
        "SELECT ndcg(q, item, score, rel, 10) FROM q246_ev")
        .select(col("query"), col("n_items"),
          round(col("dcg"), 6).as("dcg"), round(col("idcg"), 6).as("idcg"),
          round(col("ndcg"), 6).as("ndcg"))
        .orderBy(col("query"))
    }),
    "q247_flesch" -> ((s, d) => {
      // corpus readability summary; every term (ws words, [.!?]+ runs,
      // vowel groups) is a regexp count both engines evaluate identically
      t(s, d, "documents").createOrReplaceTempView("q247_docs")
      GraftGateway.sql(s, "SELECT flesch(text) FROM q247_docs")
        .select(col("n_docs"), round(col("avg_fre"), 4).as("avg_fre"),
          round(col("min_fre"), 4).as("min_fre"),
          round(col("max_fre"), 4).as("max_fre"))
    }),
    "q242_fleming_harrington" -> ((s, d) => {
      // G^{0,1} late-weighted log-rank on the q108 survival fixture: the
      // pooled-KM weight window replays in SQL over event times
      t(s, d, "lineitem").select(
        (col("l_orderkey") % 2).cast("int").as("arm"),
        col("l_quantity").cast("int").as("time"),
        (col("l_linenumber") % 2).cast("int").as("event"))
        .createOrReplaceTempView("q242_su")
      GraftGateway.sql(s,
        "SELECT fleming_harrington(arm, time, event, 0, 1) FROM q242_su")
        .select(round(col("observed1_w"), 6).as("observed1_w"),
          round(col("expected1_w"), 6).as("expected1_w"),
          round(col("variance_w"), 6).as("variance_w"),
          round(col("chi2"), 6).as("chi2"))
    }),
    "q225_binomial_test" -> ((s, d) => {
      // exact rate test: 1000 trials at a planted 26% vs p0 = 0.3 — the
      // full support enumerates via generate_series + lgamma
      t(s, d, "events").filter(col("event_id") < 1000)
        .selectExpr("CASE WHEN (CAST(floor(event_id / 2) AS BIGINT) * 13) " +
          "% 50 < 13 THEN 1 ELSE 0 END AS y")
        .createOrReplaceTempView("ev_bt")
      GraftGateway.sql(s, "SELECT binomial_test(y, 0.3) FROM ev_bt")
        .select(col("n"), col("successes"), round(col("rate"), 6).as("rate"),
          round(col("p_two_sided"), 8).as("p_two_sided"),
          round(col("p_greater"), 8).as("p_greater"))
    }),
    "q226_runs_test" -> ((s, d) => {
      // randomness around the median of the period series: the planted
      // weekly lift makes same-sign runs persist, so z goes negative
      t(s, d, "events")
        .selectExpr("CAST(floor(event_id / 100) AS BIGINT) AS period",
          "value + CASE WHEN CAST(floor(event_id / 100) AS BIGINT) " +
            "% 10 < 5 THEN 4 ELSE 0 END AS v")
        .createOrReplaceTempView("ev_rt")
      GraftGateway.sql(s, "SELECT runs_test(period, v) FROM ev_rt")
        .select(col("n_periods"), col("n_above"), col("n_below"),
          col("runs"), round(col("expected_runs"), 6).as("expected_runs"),
          round(col("z"), 4).as("z"))
    }),
    "q227_grubbs_test" -> ((s, d) => {
      // single-suspect outlier check on price + one planted spike row
      // (union keeps the base table untouched); checks through G
      val li = t(s, d, "lineitem")
        .select(col("l_extendedprice").cast("double").as("x"))
      val spark = s
      import spark.implicits._
      li.union(Seq(9.9e7).toDF("x")).createOrReplaceTempView("li_gr")
      GraftGateway.sql(s, "SELECT grubbs_test(x) FROM li_gr")
        .select(col("n"), round(col("mean"), 4).as("mean"),
          round(col("sd"), 4).as("sd"), round(col("suspect"), 4).as("suspect"),
          round(col("g"), 4).as("g"))
    }),
    "q222_mad_outliers" -> ((s, d) => {
      // Hampel MAD fence on price: exact medians (house percentile ==
      // quantile_cont); the consistency constant comes from the library's
      // own normal quantile, mirrored to 17 digits in the oracle
      t(s, d, "lineitem").createOrReplaceTempView("li_mad")
      GraftGateway.sql(s, "SELECT mad_outliers(l_extendedprice, 'exact') FROM li_mad")
        .select(col("n"), round(col("median"), 4).as("median"),
          round(col("mad"), 4).as("mad"),
          round(col("sigma_robust"), 4).as("sigma_robust"),
          col("n_outliers"), round(col("outlier_share"), 6).as("outlier_share"),
          round(col("min_kept"), 4).as("min_kept"),
          round(col("max_kept"), 4).as("max_kept"))
    }),
    "q223_seasonal_strength" -> ((s, d) => {
      // planted weekly cycle (+20 on phase 2 of 7): the variance-share
      // readout lands strictly inside (0, 1); peak phase is exact
      t(s, d, "events")
        .selectExpr("CAST(floor(event_id / 100) AS BIGINT) AS period",
          "value + CASE WHEN CAST(floor(event_id / 100) AS BIGINT) % 7 = 2 " +
            "THEN 20 ELSE 0 END AS v")
        .createOrReplaceTempView("ev_ss")
      GraftGateway.sql(s, "SELECT seasonal_strength(period, v, 7) FROM ev_ss")
        .select(col("n_periods"), col("season"),
          round(col("var_total"), 4).as("var_total"),
          round(col("var_residual"), 4).as("var_residual"),
          round(col("strength"), 6).as("strength"),
          col("peak_phase"), round(col("peak_lift"), 4).as("peak_lift"))
    }),
    "q224_cluster_power" -> ((s, d) => {
      // cluster-randomized planning on the q173 cohort: the icc design
      // effect feeds the two-sample normal power forms — rows check
      // through z_power and the required-cluster closed forms
      t(s, d, "events").createOrReplaceTempView("ev_cp")
      GraftGateway.sql(s,
          "SELECT cluster_power(value, user_id, 2) FROM ev_cp")
        .select(col("n"), col("n_clusters"),
          round(col("sigma"), 6).as("sigma"), round(col("icc"), 6).as("icc"),
          round(col("deff"), 6).as("deff"),
          round(col("se_diff"), 6).as("se_diff"),
          round(col("z_power"), 4).as("z_power"),
          col("clusters_per_arm_80"), col("clusters_per_arm_90"))
    }),
    "q221_overlap" -> ((s, d) => {
      // positivity diagnostic: the arms' scores shift by 0.2, so the
      // common-support and overlap-coefficient readouts sit strictly
      // inside (0, 1) — every share replays as plain cell SQL
      t(s, d, "lineitem")
        .selectExpr("CAST(l_orderkey % 2 AS INT) AS t",
          "(l_partkey % 97) / 193 + " +
            "CASE WHEN l_orderkey % 2 = 1 THEN 0.3 ELSE 0.1 END AS score")
        .createOrReplaceTempView("li_ovl")
      GraftGateway.sql(s, "SELECT overlap(t, score, 20) FROM li_ovl")
        .select(col("bin"), col("n0"), col("n1"),
          round(col("share0"), 6).as("share0"),
          round(col("share1"), 6).as("share1"),
          round(col("common_support"), 6).as("common_support"),
          round(col("ovl"), 6).as("ovl"))
        .orderBy(col("bin"))
    }),
    "q220_streaming_ewma" -> ((s, d) => {
      // the EWMA chart as an always-on stream (q111 idiom): per
      // event_type metric, 500-event periods close when a later period
      // arrives, the LAST period per metric stays open in state — DuckDB
      // mirrors by dropping each metric's max period. lambda = 0.25 is
      // exact in binary, so no literal-representation skew either side
      import org.apache.spark.sql.streaming.Trigger
      val spark = s
      import spark.implicits._
      val ev = t(s, d, "events")
      val stream = s.readStream.schema(ev.schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
      val evs = stream.filter(col("value").isNotNull)
        .select(col("event_type").as("metricId"),
          (col("event_id") / 500).cast("long").as("period"),
          col("value"))
        .as[graft.streaming.StreamOps.EwmaEvent]
      val out = graft.streaming.StreamOps.streamingEwma(evs,
        lambda = 0.25, l = 3.0)
      val sink = "q220_mem_" + math.abs(s.sparkContext.applicationId.hashCode)
      s.catalog.dropTempView(sink)
      graft.streaming.StreamRun.runAvailableNow(
        out.writeStream.format("memory").queryName(sink).outputMode("update"),
        s, graft.streaming.StreamRun.inputBytes(d, "events.parquet"))
      s.table(sink)
        .select(col("metricId").as("metric_id"), col("period"),
          col("nEvents").as("n_events"),
          round(col("metric"), 6).as("metric"),
          round(col("ewma"), 6).as("ewma"),
          round(col("baseline"), 6).as("baseline"),
          round(col("limitLower"), 6).as("limit_lower"),
          round(col("limitUpper"), 6).as("limit_upper"),
          col("isAnomaly").as("is_anomaly"))
        .orderBy(col("metric_id"), col("period"))
    }),
    "q218_heaps_fit" -> ((s, d) => {
      // vocabulary growth over doc_id order: first-occurrence cells,
      // cumulative (N, V) curve, ln-ln OLS — all windowed SQL
      t(s, d, "documents").createOrReplaceTempView("doc_heaps")
      GraftGateway.sql(s, "SELECT heaps_fit(doc_id, text) FROM doc_heaps")
        .select(col("docs"), col("terms"), col("total_tokens"),
          round(col("beta"), 6).as("beta"), round(col("k"), 4).as("k"),
          round(col("r2"), 6).as("r2"))
    }),
    "q219_kmeans_eval" -> ((s, d) => {
      // cluster quality vs the embeddings ground-truth label: the q209
      // Lloyd replay + a label join; majority ties break (count desc,
      // label desc) on both engines
      t(s, d, "embeddings").createOrReplaceTempView("emb_ke")
      GraftGateway.sql(s,
          "SELECT kmeans_eval(vec_id, embedding, label, 4, 2) FROM emb_ke")
        .select(col("cluster"), col("n"), col("majority_label"),
          round(col("cluster_purity"), 6).as("cluster_purity"),
          round(col("purity"), 6).as("purity"),
          round(col("nmi"), 6).as("nmi"))
        .orderBy(col("cluster"))
    }),
    "q193_zipf_fit" -> ((s, d) => {
      // corpus Zipf diagnostics over the documents table: vocabulary
      // cells, distributed rank, one moment aggregate — slope/r2 replay
      // closed-form on q96's established tokenization
      t(s, d, "documents").createOrReplaceTempView("doc_zipf")
      GraftGateway.sql(s, "SELECT zipf_fit(text) FROM doc_zipf")
        .select(col("terms"), col("total_tokens"),
          round(col("slope"), 6).as("slope"),
          round(col("intercept"), 6).as("intercept"),
          round(col("r2"), 6).as("r2"))
    }),
    "q191_fleiss_kappa" -> ((s, d) => {
      // multi-rater agreement: 500 items x 2 raters (event_id splits into
      // item/rater), ~70% planted agreement on the item's own label —
      // all closed-form over (item x category) cells
      t(s, d, "events")
        .filter(col("event_id").isNotNull && col("event_id") < 1000)
        .select((col("event_id") % 500).cast("string").as("i"),
          concat(lit("c"),
            when((col("event_id") * 37) % 10 < 7, col("event_id") % 500 % 5)
              .otherwise((col("event_id") * 7 + 3) % 5)).as("c"))
        .createOrReplaceTempView("ev_fk")
      GraftGateway.sql(s, "SELECT fleiss_kappa(i, c) FROM ev_fk")
        .select(col("items"), col("raters"), col("categories"),
          round(col("p_bar"), 6).as("p_bar"), round(col("p_e"), 6).as("p_e"),
          round(col("kappa"), 6).as("kappa"))
    }),
    "q189_spearman" -> ((s, d) => {
      // rank correlation of quantity vs extended price: average-rank tie
      // groups via the cumulative count, rank tables joined back, corr —
      // DuckDB replays the identical construction (p needs the normal
      // CDF, so the row checks through z)
      t(s, d, "lineitem")
        .select(col("l_quantity").cast("double").as("x"),
          col("l_extendedprice").cast("double").as("y"))
        .createOrReplaceTempView("li_sp")
      GraftGateway.sql(s, "SELECT spearman(x, y) FROM li_sp")
        .select(col("n"), round(col("rho"), 6).as("rho"),
          round(col("z"), 4).as("z"))
    }),
    "q190_levene" -> ((s, d) => {
      // Brown-Forsythe equal-variance check of quantity across return
      // flags: per-arm exact medians, |y - med| ANOVA — F and dofs
      // replay closed-form (p needs the F CDF, q138 idiom)
      t(s, d, "lineitem").createOrReplaceTempView("li_lev")
      GraftGateway.sql(s,
          "SELECT levene(l_quantity, l_returnflag, 'exact') FROM li_lev")
        .select(col("n"), col("k"), round(col("f_stat"), 6).as("f_stat"),
          col("df1"), col("df2"))
    }),
    "q187_bland_altman" -> ((s, d) => {
      // method agreement between value and a drifted re-measurement:
      // bias, limits of agreement, share inside — two moment passes
      t(s, d, "events")
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select(col("value").cast("double").as("a"),
          (col("value") * 1.02 + (col("user_id") % 7 - 3).cast("double"))
            .as("b"))
        .createOrReplaceTempView("ev_ba")
      GraftGateway.sql(s, "SELECT bland_altman(a, b) FROM ev_ba")
        .select(col("n"), round(col("bias"), 6).as("bias"),
          round(col("sd"), 6).as("sd"),
          round(col("loa_lower"), 6).as("loa_lower"),
          round(col("loa_upper"), 6).as("loa_upper"),
          round(col("pct_within"), 6).as("pct_within"))
    }),
    "q188_trend_test" -> ((s, d) => {
      // Cochran-Armitage: is the value>60 rate monotone in the user
      // residue score? Two-level closed form over arm cells
      t(s, d, "events")
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select(when(col("value") > 60, 1).otherwise(0).as("s"),
          (col("user_id") % 4).cast("double").as("c"))
        .createOrReplaceTempView("ev_tr")
      GraftGateway.sql(s, "SELECT trend_test(s, c) FROM ev_tr")
        .select(col("n"), col("n_arms"), round(col("p_bar"), 6).as("p_bar"),
          round(col("t_stat"), 6).as("t_stat"),
          round(col("var_t"), 4).as("var_t"), round(col("z"), 4).as("z"))
    }),
    "q186_mutual_info" -> ((s, d) => {
      // event-type vs user-residue dependence: MI/NMI over observed
      // cells with margins joined back — fully distributed (no grid
      // walk), fully SQL-replayable
      t(s, d, "events")
        .filter(col("event_type").isNotNull && col("user_id").isNotNull)
        .select(col("event_type").as("a"),
          (col("user_id") % 3).cast("string").as("b"))
        .createOrReplaceTempView("ev_mi")
      GraftGateway.sql(s, "SELECT mutual_info(a, b) FROM ev_mi")
        .select(col("n"), col("cells"), round(col("h_a"), 6).as("h_a"),
          round(col("h_b"), 6).as("h_b"), round(col("mi"), 8).as("mi"),
          round(col("nmi"), 8).as("nmi"))
    }),
    "q182_yuen" -> ((s, d) => {
      // Yuen trimmed-means robust test on the order-parity split: trim
      // points are exact per-arm percentiles (Spark percentile ==
      // DuckDB quantile_cont), winsorized moments close the SE — the
      // whole readout through t and df replays in SQL (p needs the t
      // CDF DuckDB lacks)
      t(s, d, "lineitem")
        .select((col("l_extendedprice").cast("double") / 100).as("y"),
          (col("l_orderkey") % 2).cast("int").as("t"))
        .createOrReplaceTempView("li_yuen")
      GraftGateway.sql(s, "SELECT yuen_test(y, t, 'exact') FROM li_yuen")
        .select(col("n0"), col("n1"), col("h0"), col("h1"),
          round(col("tmean0"), 6).as("tmean0"),
          round(col("tmean1"), 6).as("tmean1"),
          round(col("diff"), 6).as("diff"), round(col("se"), 6).as("se"),
          round(col("t_stat"), 4).as("t_stat"), round(col("df"), 2).as("df"))
    }),
    "q183_mcnemar" -> ((s, d) => {
      // paired binary readings per event (value threshold vs user-residue
      // rule): the marginal-shift test over discordant cells only
      t(s, d, "events")
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select(when(col("value") > 60, 1).otherwise(0).as("a"),
          when(col("user_id") % 3 === 0, 1).otherwise(0).as("b"))
        .createOrReplaceTempView("ev_mcn")
      GraftGateway.sql(s, "SELECT mcnemar(a, b) FROM ev_mcn")
        .select(col("n"), col("both0"), col("both1"), col("only_a"),
          col("only_b"), round(col("z"), 4).as("z"),
          round(col("chisq_cc"), 4).as("chisq_cc"))
    }),
    "q184_cohens_kappa" -> ((s, d) => {
      // inter-annotator agreement: rater B corrupts 20% of event-type
      // labels to 'other' — chance-corrected kappa over the confusion
      // cells, margins joined back at cell scale
      t(s, d, "events")
        .filter(col("event_type").isNotNull && col("user_id").isNotNull)
        .select(col("event_type").as("a"),
          when(col("user_id") % 10 < 8, col("event_type"))
            .otherwise(lit("other")).as("b"))
        .createOrReplaceTempView("ev_kap")
      GraftGateway.sql(s, "SELECT cohens_kappa(a, b) FROM ev_kap")
        .select(col("n"), col("categories"), round(col("po"), 6).as("po"),
          round(col("pe"), 6).as("pe"),
          round(col("kappa"), 6).as("kappa"),
          round(col("se"), 6).as("se"), round(col("z"), 4).as("z"))
    }),
    "q185_rdd_bandwidth" -> ((s, d) => {
      // Imbens-Lemieux rule-of-thumb pilot bandwidth for the q168 design
      t(s, d, "lineitem")
        .select((col("l_extendedprice").cast("double") / 100).as("y"),
          col("l_quantity").cast("double").as("x"))
        .createOrReplaceTempView("li_rbw")
      GraftGateway.sql(s, "SELECT rdd_bandwidth(y, x) FROM li_rbw")
        .select(col("n"), round(col("sd"), 6).as("sd"),
          round(col("h"), 6).as("h"))
    }),
    "q180_prop_test" -> ((s, d) => {
      // two-proportion conversion test (user-parity arms, value > 60 as
      // success): Wilson per-arm + Newcombe diff CIs + pooled score z —
      // every output a closed form over four conditional counts
      t(s, d, "events")
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select(when(col("value") > 60, 1).otherwise(0).as("s"),
          (col("user_id") % 2).cast("int").as("t"))
        .createOrReplaceTempView("ev_prop")
      GraftGateway.sql(s, "SELECT prop_test(s, t) FROM ev_prop")
        .select(col("n0"), col("n1"), col("s0"), col("s1"),
          round(col("p0"), 6).as("p0"), round(col("p1"), 6).as("p1"),
          round(col("p0_lower"), 6).as("p0_lower"),
          round(col("p0_upper"), 6).as("p0_upper"),
          round(col("p1_lower"), 6).as("p1_lower"),
          round(col("p1_upper"), 6).as("p1_upper"),
          round(col("diff"), 6).as("diff"),
          round(col("diff_lower"), 6).as("diff_lower"),
          round(col("diff_upper"), 6).as("diff_upper"),
          round(col("z"), 4).as("z"))
    }),
    "q181_benford" -> ((s, d) => {
      // Benford first-digit audit of extended price: 9 cells vs
      // log10(1+1/d), chi-square terms included — pure column math
      t(s, d, "lineitem")
        .select(col("l_extendedprice").cast("double").as("v"))
        .createOrReplaceTempView("li_ben")
      GraftGateway.sql(s, "SELECT benford(v) FROM li_ben")
        .select(col("digit"), col("n"), round(col("share"), 6).as("share"),
          round(col("expected_share"), 6).as("expected_share"),
          round(col("chisq_term"), 4).as("chisq_term"))
        .orderBy(col("digit"))
    }),
    "q178_weighted_ttest" -> ((s, d) => {
      // Hajek-weighted A/A comparison (user-parity arms, synthetic
      // design weights): means, linearization SEs, and ESS are pure
      // moment closed forms
      t(s, d, "events")
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select(col("value").cast("double").as("y"),
          (col("user_id") % 2).cast("int").as("t"),
          ((col("user_id") % 5) + 1).cast("double").as("w"))
        .createOrReplaceTempView("ev_wtt")
      GraftGateway.sql(s, "SELECT weighted_ttest(y, t, w) FROM ev_wtt")
        .select(col("n0"), col("n1"),
          round(col("ess0"), 3).as("ess0"), round(col("ess1"), 3).as("ess1"),
          round(col("mean0"), 6).as("mean0"),
          round(col("mean1"), 6).as("mean1"),
          round(col("diff"), 6).as("diff"), round(col("se"), 6).as("se"),
          round(col("z"), 4).as("z"))
    }),
    "q179_gini" -> ((s, d) => {
      // revenue concentration: Gini + top-1%/top-10% Lorenz shares of
      // extended price — rank-sum closed form over the two-phase row
      // number, replayed with a DuckDB row_number window
      t(s, d, "lineitem")
        .select(col("l_extendedprice").cast("double").as("v"))
        .createOrReplaceTempView("li_gini")
      GraftGateway.sql(s, "SELECT gini(v) FROM li_gini")
        .select(col("n"), round(col("total"), 2).as("total"),
          round(col("mean"), 6).as("mean"),
          round(col("gini"), 6).as("gini"),
          round(col("top1_share"), 6).as("top1_share"),
          round(col("top10_share"), 6).as("top10_share"))
    }),
    "q177_rmst" -> ((s, d) => {
      // restricted mean survival time per return-flag arm to horizon 40
      // over the q107 KM fixture — the step integral, suffix areas, and
      // Greenwood-type variance all replay as cell-scale SQL windows
      t(s, d, "lineitem")
        .select(col("l_returnflag").as("g"),
          col("l_quantity").cast("int").as("time"),
          (col("l_linenumber") % 2).cast("int").as("event"))
        .createOrReplaceTempView("li_rmst")
      GraftGateway.sql(s, "SELECT rmst(time, event, 40.0, g) FROM li_rmst")
        .select(col("group"), col("tau"), col("n"), col("events"),
          round(col("rmst"), 6).as("rmst"), round(col("se"), 6).as("se"),
          round(col("lower"), 6).as("lower"),
          round(col("upper"), 6).as("upper"))
        .orderBy(col("group"))
    }),
    "q176_p_adjust" -> ((s, d) => {
      // Holm (FWER step-down) and Benjamini-Yekutieli (FDR under
      // arbitrary dependence) over the q139 p-value table — prefix-max /
      // harmonic-scaled suffix-min, both tie-invariant, both replayed as
      // DuckDB windows
      t(s, d, "lineitem").filter(col("l_linenumber") === 1 &&
          col("l_orderkey") % 97 === 0)
        .select(col("l_orderkey").as("test_id"),
          (((col("l_orderkey") * 13) % 1000).cast("double") / 1000.0 + 0.0005)
            .as("p_value"))
        // the synthetic lineitem repeats linenumber 1 within an order;
        // p_value is a function of the key, so distinct is deterministic
        // (and keeps the holm x by join 1:1)
        .distinct()
        .createOrReplaceTempView("li_padj")
      val holm = GraftGateway.sql(s,
          "SELECT fdr_bh(p_value, 'holm') FROM li_padj")
        .select(col("test_id"), col("p_value"),
          col("p_adjusted").as("p_holm"))
      val by = GraftGateway.sql(s, "SELECT fdr_bh(p_value, 'by') FROM li_padj")
        .select(col("test_id"), col("p_adjusted").as("p_by"))
      holm.join(by, "test_id")
        .select(col("test_id"), round(col("p_value"), 6).as("p_value"),
          round(col("p_holm"), 6).as("p_holm"),
          round(col("p_by"), 6).as("p_by"))
        .orderBy(col("test_id"))
    }),
    "q175_changepoint" -> ((s, d) => {
      // CUSUM mean-shift locator over 100 period cells with a +5 shift
      // planted at period 60 — cells, the CUSUM path, the argmax, and
      // the Kolmogorov p (k <= 100 truncation) all replay in plain SQL
      t(s, d, "events")
        .select((col("event_id") % 100).as("p"),
          (col("value") + when(col("event_id") % 100 >= 60, 5.0)
            .otherwise(0.0)).as("v"))
        .createOrReplaceTempView("ev_cp")
      GraftGateway.sql(s, "SELECT changepoint(p, v) FROM ev_cp")
        .select(col("n_periods"), col("change_period"),
          round(col("stat"), 6).as("stat"),
          round(col("p_value"), 6).as("p_value"),
          round(col("mean_before"), 6).as("mean_before"),
          round(col("mean_after"), 6).as("mean_after"),
          round(col("shift"), 6).as("shift"))
    }),
    "q174_its" -> ((s, d) => {
      // interrupted time series at t = 500 over a derived period index:
      // a planted +8 level jump and +0.01/period trend break on top of
      // the value noise — 12 moment sums per segment, so level/slope
      // contrasts AND their HC0 sandwiches replay in plain SQL
      t(s, d, "events")
        .select((col("event_id") % 1000).cast("double").as("t"),
          (col("value") + when(col("event_id") % 1000 >= 500, 8.0)
            .otherwise(0.0) +
            (col("event_id") % 1000).cast("double") *
              when(col("event_id") % 1000 >= 500, 0.02).otherwise(0.01))
            .as("y"))
        .createOrReplaceTempView("ev_its")
      GraftGateway.sql(s,
          "SELECT interrupted_time_series(y, t, 500.0) FROM ev_its")
        .select(col("n_pre"), col("n_post"),
          round(col("level_pre"), 6).as("level_pre"),
          round(col("level_post"), 6).as("level_post"),
          round(col("level_change"), 6).as("level_change"),
          round(col("se_level"), 6).as("se_level"),
          round(col("z_level"), 4).as("z_level"),
          round(col("slope_pre"), 6).as("slope_pre"),
          round(col("slope_post"), 6).as("slope_post"),
          round(col("slope_change"), 6).as("slope_change"),
          round(col("se_slope"), 6).as("se_slope"),
          round(col("z_slope"), 4).as("z_slope"))
    }),
    "q173_icc" -> ((s, d) => {
      // intraclass correlation of event values clustered by user +
      // the Donner-Klar design effect — pure two-level closed forms
      t(s, d, "events").createOrReplaceTempView("ev_icc")
      GraftGateway.sql(s, "SELECT icc(value, user_id) FROM ev_icc")
        .select(col("n"), col("n_clusters"),
          round(col("m_bar"), 6).as("m_bar"), round(col("m0"), 6).as("m0"),
          round(col("msb"), 3).as("msb"), round(col("msw"), 3).as("msw"),
          round(col("icc"), 6).as("icc"), round(col("deff"), 6).as("deff"),
          round(col("n_effective"), 3).as("n_effective"))
    }),
    "q172_rdd_fuzzy" -> ((s, d) => {
      // fuzzy RDD at quantity 25.5: take-up jumps ~0.2 -> ~0.7 at the
      // cutoff (order-key residue), the outcome moves ONLY through
      // take-up (+40 per unit) — the local Wald ratio must recover ~40.
      // 30 conditional moment sums per side, so the whole delta-method
      // sandwich replays in plain SQL
      t(s, d, "lineitem")
        .select(col("l_quantity").cast("double").as("x"),
          when(col("l_quantity") >= 26, (col("l_orderkey") % 10 < 7).cast("int"))
            .otherwise((col("l_orderkey") % 10 < 2).cast("int"))
            .cast("double").as("td"),
          (col("l_extendedprice").cast("double") / 10000).as("noise"))
        .withColumn("y", col("x") * 0.5 + col("td") * 40.0 + col("noise"))
        .createOrReplaceTempView("li_rddf")
      GraftGateway.sql(s,
          "SELECT rdd_fuzzy(y, td, x, 25.5, 10.0) FROM li_rddf")
        .select(col("n_left"), col("n_right"),
          round(col("jump_y"), 6).as("jump_y"),
          round(col("jump_d"), 6).as("jump_d"),
          round(col("se_first"), 6).as("se_first"),
          round(col("tau"), 6).as("tau"), round(col("se"), 6).as("se"),
          round(col("z"), 4).as("z"))
    }),
    "q166_stratified_ate" -> ((s, d) => {
      // post-stratification ATE through the gateway verb: an A/A split
      // (order-key parity) blocked on the return flag — every output is
      // a pure closed form over (stratum x arm) moment cells. p_value
      // needs a normal CDF DuckDB lacks, so the oracle row checks
      // through z (the q15 stderr idiom).
      t(s, d, "lineitem")
        .select(col("l_extendedprice").cast("double").as("y"),
          (col("l_orderkey") % 2).cast("int").as("t"),
          col("l_returnflag").as("flag"))
        .createOrReplaceTempView("li_strat")
      GraftGateway.sql(s, "SELECT stratified_ate(y, t, flag) FROM li_strat")
        .select(col("n"), col("n_strata"), round(col("ate"), 6).as("ate"),
          round(col("se"), 6).as("se"), round(col("z"), 6).as("z"))
    }),
    "q167_bayes_best_arm" -> ((s, d) => {
      // K-arm Thompson weights on a 3-way split of the events stream
      // (success = value > 60; the three arms convert within ~1pp of
      // each other, so the weights are genuinely mixed). n/s/rate are
      // honest closed forms; p_best/expected_loss are deterministic
      // Simpson numerics over the Beta posteriors — pinned.
      tsNanos(t(s, d, "events"))
        .filter(col("user_id").isNotNull && col("value").isNotNull)
        .select((col("user_id") % 3).cast("string").as("arm"),
          when(col("value") > 60.0, 1).otherwise(0).as("succ"))
        .createOrReplaceTempView("ev_arms")
      GraftGateway.sql(s, "SELECT bayes_best_arm(arm, succ) FROM ev_arms")
        .select(col("arm"), col("n"), col("s"),
          round(col("rate"), 6).as("rate"),
          round(col("p_best"), 6).as("p_best"),
          round(col("expected_loss"), 6).as("expected_loss"))
        .withColumn("oracle_sf", lit(sfTag(d)))
        .orderBy(col("arm"))
    }),
    "q145_multimodal_sql" -> ((s, d) => {
      // SQL reach for the multimodal near-dup tier (the reference thesis:
      // everything drivable from SQL): image_dhash then hamming_pairs,
      // BOTH through the gateway, on a 1-in-4 subset of q143's
      // planted-copy PNG fixture. Copies (key % 20 == 0, all of which sit
      // inside the % 4 subset) pair with their originals at hamming 0.
      val base = graft.ops.Par.ensure(
        t(s, d, "part").filter(col("p_partkey") % 4 === 0)
          .select(col("p_partkey").cast("long").as("id")))
      val imgs = base.select(col("id"),
          graft.ops.Multimodal.patternPng(col("id"), lit(64), lit(64),
            lit(0)).as("content"))
        .unionByName(base.filter(col("id") % 20 === 0)
          .select((col("id") + (1L << 40)).as("id"),
            graft.ops.Multimodal.patternPng(col("id"), lit(64), lit(64),
              lit(20)).as("content")))
      imgs.createOrReplaceTempView("q145_imgs")
      GraftGateway.sql(s, "SELECT image_dhash(id, content) FROM q145_imgs")
        .createOrReplaceTempView("q145_hashed")
      val pairs = GraftGateway.sql(s,
        "SELECT hamming_pairs(id, dhash) FROM q145_hashed")
      pairs.agg(count(lit(1)).as("n_pairs"),
        sum(col("id_a") + col("id_b")).as("pair_id_sum"),
        max(col("hamming")).as("max_hamming"))
    }),
    "q146_video_metadata" -> ((s, d) => {
      // ISO-BMFF container walk: every part row renders a structurally
      // valid MP4 header tree with dims/duration derived from the key;
      // 1-in-3 carries an audio track, 1-in-50 is corrupt bytes
      // (decode_ok = false, all-null metadata). The aggregate is a pure
      // closed form over the key arithmetic — the oracle replays it.
      val base = t(s, d, "part").select(col("p_partkey").cast("long").as("id"))
      val vids = base.select(col("id"),
        when(col("id") % 50 === 0, lit(Array[Byte](1, 2, 3)))
          .otherwise(graft.ops.Multimodal.patternMp4(
            (col("id") % 640 + 16).cast("int"),
            (col("id") % 360 + 9).cast("int"),
            col("id") % 100000 + 1000,
            col("id") % 3 === 0)).as("content"))
      graft.ops.Multimodal.videoMetadata(vids)
        .agg(count(lit(1)).as("n_videos"),
          sum(col("decode_ok").cast("long")).as("n_decoded"),
          sum(col("duration_ms")).as("dur_ms_sum"),
          sum(col("width").cast("long")).as("w_sum"),
          sum(col("height").cast("long")).as("h_sum"),
          sum(col("n_tracks").cast("long")).as("tracks_sum"),
          sum(when(col("video_codec") === "avc1", 1L).otherwise(0L)).as("n_avc1"),
          sum(when(col("audio_codec") === "mp4a", 1L).otherwise(0L)).as("n_mp4a"))
    }),
    "q147_msprt_by" -> ((s, d) => {
      // grouped always-valid monitoring: ONE call, one anytime-valid
      // trajectory per experiment (user_id % 3 tags 3 experiments), the
      // shape a platform monitor actually runs. Every per-look value
      // replays closed-form from per-(experiment, day) cumulative moments.
      val ev = tsNanos(t(s, d, "events"))
      graft.ops.Sequential.msprtBy(ev, (col("user_id") % 3).cast("int"),
          expr("ts div 86400000000000"), col("value"),
          (col("user_id") % 2).cast("int"), tau = 1.0)
        .select(col("experiment"), col("bucket"), col("n1"), col("n0"),
          round(col("estimate"), 6).as("estimate"),
          round(col("lambda"), 6).as("lambda"),
          round(col("p_always_valid"), 6).as("p_always_valid"))
        .orderBy(col("experiment"), col("bucket"))
    }),
    "q142_cox_ph" -> ((s, d) => {
      // Cox proportional hazards through the verb: 50 distinct times with
      // heavy Breslow ties, two covariates. The Newton fit has no closed
      // SQL form, so the oracle pins the sf0.01 estimates (q34 idiom)
      // while n / n_events stay honest closed forms
      t(s, d, "lineitem").select(col("l_quantity").cast("int").as("stime"),
          (col("l_linenumber") % 2).cast("int").as("ev"),
          (col("l_discount") * 10.0).as("x1"),
          (col("l_orderkey") % 2).cast("double").as("x2"))
        .createOrReplaceTempView("li_cox")
      GraftGateway.sql(s, "SELECT cox_ph(stime, ev, x1, x2) FROM li_cox")
        .select(col("term"), round(col("estimate"), 6).as("estimate"),
          round(col("stderr"), 6).as("stderr"),
          round(col("z_value"), 4).as("z_value"),
          col("n"), col("n_events"), lit(sfTag(d)).as("oracle_sf"))
        .orderBy(col("term"))
    }),
    "q141_eb_shrinkage" -> ((s, d) => {
      // empirical-Bayes per-segment mean shrinkage through the verb,
      // segments = part brand (~25 groups, heterogeneous n): mu, the MoM
      // tau^2, and every posterior mean replay closed-form
      t(s, d, "part").createOrReplaceTempView("p_eb")
      GraftGateway.sql(s,
          "SELECT eb_shrink_means(p_brand, p_retailprice) FROM p_eb")
        .select(col("group"), col("n"), round(col("mean"), 6).as("mean"),
          round(col("shrinkage"), 6).as("shrinkage"),
          round(col("shrunk_mean"), 6).as("shrunk_mean"))
        .orderBy(col("group"))
    }),
    "q139_fdr_bh" -> ((s, d) => {
      // Benjamini-Hochberg adjustment over a deterministic ~620-test
      // p-value table, driven through the transform verb; the suffix-min
      // ranks replay as a reverse-frame window in DuckDB (adjusted values
      // are tie-invariant, so rank tie order cannot matter)
      t(s, d, "lineitem").filter(col("l_linenumber") === 1 &&
          col("l_orderkey") % 97 === 0)
        .select(col("l_orderkey").as("test_id"),
          (((col("l_orderkey") * 13) % 1000).cast("double") / 1000.0 + 0.0005)
            .as("p_value"))
        .createOrReplaceTempView("li_fdr")
      GraftGateway.sql(s, "SELECT fdr_bh(p_value) FROM li_fdr")
        .select(col("test_id"), round(col("p_value"), 6).as("p_value"),
          round(col("p_adjusted"), 6).as("p_adjusted"))
        .orderBy(col("test_id"))
    }),
    "q140_chisq_independence" -> ((s, d) => {
      // r x c contingency chi-square through the verb; the statistic is a
      // closed form over the cell counts (p needs the chi-square CDF, so
      // the gate pins chisq and the dof)
      t(s, d, "lineitem").createOrReplaceTempView("li_chi")
      GraftGateway.sql(s,
          "SELECT chisq_independence(l_returnflag, l_linestatus) FROM li_chi")
        .select(col("n"), col("n_rows"), col("n_cols"), col("dof"),
          round(col("chisq"), 6).as("chisq"),
          round(col("cramers_v"), 6).as("cramers_v"))
    }),
    "q138_anova" -> ((s, d) => {
      // multi-variant one-way ANOVA through the verb (3 arms =
      // l_returnflag): SSB/SSW from per-arm moment cells replay
      // closed-form; p needs the F CDF, so the gate pins the statistic
      t(s, d, "lineitem").createOrReplaceTempView("li_an")
      GraftGateway.sql(s, "SELECT anova(l_quantity, l_returnflag) FROM li_an")
        .select(col("k"), col("n"),
          round(col("f_statistic"), 6).as("f_statistic"))
    }),
    "q137_blp_test" -> ((s, d) => {
      // CATE-model validation on a planted-effect fixture with LCG noise
      // (the q122 replayable-noise idiom — plantedEffect's xxhash noise
      // has no DuckDB twin): the proxy score IS the true CATE (2 + 8h),
      // so the BLP loading must be ~1 and significant; DuckDB solves the
      // same centered 2-regressor normal equations by Cramer's rule
      val li = t(s, d, "lineitem")
        .withColumn("treat", (col("l_orderkey") % 2).cast("int"))
        .withColumn("h", (col("l_quantity") > 25.0).cast("double"))
        .withColumn("u",
          (((col("l_orderkey") * 8 + col("l_linenumber")) * 1103515245L
            + 12345L) % 1000L).cast("double") / 1000.0 - 0.4995)
        .withColumn("y", lit(10.0) + lit(5.0) * col("h") +
          col("treat") * (lit(2.0) + lit(8.0) * col("h")) + col("u"))
        .withColumn("cate_hat", lit(2.0) + lit(8.0) * col("h"))
      li.createOrReplaceTempView("li_blp")
      GraftGateway.sql(s, "SELECT blp_test(cate_hat, y, treat) FROM li_blp")
        .select(col("n"), round(col("ate_coef"), 6).as("ate_coef"),
          round(col("ate_se"), 6).as("ate_se"),
          round(col("het_coef"), 6).as("het_coef"),
          round(col("het_se"), 6).as("het_se"),
          round(col("het_t"), 4).as("het_t"))
    }),
    "q136_cluster_se" -> ((s, d) => {
      // Liang–Zeger CR1 cluster-robust OLS through the verb: cluster =
      // order (lineitems of one order are genuinely correlated), so the
      // sandwich inflates the iid SEs; slope/intercept/SE/t replay
      // closed-form 2x2 sandwich algebra in DuckDB (p needs the t CDF, so
      // the gate carries the G-1 dof instead)
      t(s, d, "lineitem").select(col("l_orderkey").as("g"),
          col("l_quantity").cast("double").as("x"),
          (col("l_extendedprice") / 1000.0).as("yy"))
        .createOrReplaceTempView("li_cr")
      GraftGateway.sql(s, "SELECT cluster_robust_ols(yy, g, x) FROM li_cr")
        .select(col("term"), round(col("estimate"), 6).as("estimate"),
          round(col("se_cluster"), 6).as("se_cluster"),
          round(col("t_value"), 4).as("t_value"), col("n_clusters"))
        .orderBy(col("term"))
    }),
    "q135_msprt" -> ((s, d) => {
      // always-valid sequential monitoring (mSPRT) over daily cumulative
      // looks: the A/A split (user_id parity is independent of value)
      // must keep the anytime-valid p near 1 while every per-look
      // likelihood ratio replays closed-form from cumulative moments
      val ev = tsNanos(t(s, d, "events"))
      graft.ops.Sequential.msprt(ev, expr("ts div 86400000000000"),
          col("value"), (col("user_id") % 2).cast("int"), tau = 1.0)
        .select(col("bucket"), col("n1"), col("n0"),
          round(col("estimate"), 6).as("estimate"),
          round(col("lambda"), 6).as("lambda"),
          round(col("p_always_valid"), 6).as("p_always_valid"))
        .orderBy(col("bucket"))
    }),
    "q134_per_source_cap" -> ((s, d) => {
      // the C4-style per-domain cap: at most 40 docs per source, chosen by
      // a replayable LCG rank (q80 idiom) with doc_id tiebreak — the kept
      // SET is engine-independent, so per-source counts and id sums match
      val docs = t(s, d, "documents")
      val ord = (col("doc_id") * 1103515245L + 12345L) % 2147483648L
      graft.ops.Mixing.capPerGroup(docs, col("source"),
          struct(ord.as("r"), col("doc_id")), n = 40) { capped =>
        capped.groupBy(col("source"))
          .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
          .orderBy(col("source"))
          .transform(x => graft.Ckpt.register(x.localCheckpoint()))
      }
    }),
    "q131_chunking" -> ((s, d) => {
      // the RAG/pretraining sliding-window chunker: 32-token chunks every
      // 24 tokens (8 overlap); per-doc chunk counts, token sums, and char
      // sums are pure closed forms over the token arrays
      graft.ops.TextOps.chunkDocuments(
          t(s, d, "documents").filter(col("doc_id") % 29 === 0),
          col("doc_id"), col("text"), chunkSize = 32, overlap = 8)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(length(col("chunk_text"))).as("sum_chars"))
        .orderBy(col("doc_id"))
    }),
    "q130_histogram_by" -> ((s, d) => {
      // matching_plot's data tier (dataframe/match.py:228-295): per-arm
      // distribution of a score column over SHARED global bin edges —
      // here the per-returnflag price distribution, 6 bins
      t(s, d, "lineitem").createOrReplaceTempView("li_hby")
      GraftGateway.sql(s,
          "SELECT histogram_by(l_returnflag, l_extendedprice, 6) FROM li_hby")
        .select(col("group"), col("bin"), round(col("lo"), 4).as("lo"),
          round(col("hi"), 4).as("hi"), col("count"))
        .orderBy(col("group"), col("bin"))
    }),
    "q125_histogram" -> ((s, d) => {
      // the histplot data verb (lib/tools.py:309-357) through the SQL
      // gateway: equal-width bin counts, empty bins included. Bin edges
      // and ordinals are the same IEEE double ops in both engines; counts
      // are exact integers
      t(s, d, "lineitem").createOrReplaceTempView("li_hist")
      GraftGateway.sql(s, "SELECT histogram(l_extendedprice, 8) FROM li_hist")
        .select(col("bin"), round(col("lo"), 4).as("lo"),
          round(col("hi"), 4).as("hi"), col("count"))
        .orderBy(col("bin"))
    }),
    "q126_box_stats" -> ((s, d) => {
      // the boxplot data verb (lib/tools.py:361-430) through the gateway:
      // five-number summary + IQR whiskers + outlier counts, exact
      // quartiles for quantile_cont parity (q09/q114 precedent)
      t(s, d, "lineitem").createOrReplaceTempView("li_box")
      GraftGateway.sql(s, "SELECT box_stats(l_quantity, 'exact') FROM li_box")
        .select(col("n"), round(col("min"), 2).as("min"),
          round(col("q1"), 6).as("q1"), round(col("median"), 6).as("median"),
          round(col("q3"), 6).as("q3"), round(col("max"), 2).as("max"),
          round(col("iqr"), 6).as("iqr"),
          round(col("whisker_lo"), 6).as("whisker_lo"),
          round(col("whisker_hi"), 6).as("whisker_hi"),
          col("n_outliers_lo"), col("n_outliers_hi"))
    }),
    "q127_pipeline_verbs" -> ((s, d) => {
      // the text-pipeline ops reached from raw SQL (the reference's
      // everything-through-SQL thesis): incremental_dedup as a TRANSFORM
      // verb filtering the corpus batch against a named history view
      // (q115 fixture), and perplexity as a SUMMARY verb scoring the same
      // corpus in place (q103 model); both one-row roll-ups cross-join
      val docs = t(s, d, "documents")
      docs.select(col("doc_id"), col("lang"), col("text"))
        .unionByName(docs.filter(col("doc_id") < 100)
          .select((col("doc_id") + 10000).as("doc_id"), col("lang"),
            col("text")))
        .createOrReplaceTempView("g_corpus")
      docs.filter(col("doc_id") < 250).createOrReplaceTempView("g_hist")
      val newDocs = GraftGateway.sql(s,
          "SELECT incremental_dedup(text, 'g_hist') FROM g_corpus")
        .agg(count(lit(1)).as("n_new"), sum(col("doc_id")).as("id_sum"))
      val ppl = GraftGateway.sql(s,
          "SELECT perplexity(doc_id, text) FROM g_corpus")
        .agg(count(lit(1)).as("n_scored"),
          sum(col("n_bigrams")).as("n_bigrams"),
          round(avg(col("avg_logp")), 6).as("mean_logp"))
      newDocs.crossJoin(ppl)
    }),
    "q128_conformal_verb" -> ((s, d) => {
      // the conformal_interval TRANSFORM verb (q122 fixture): band columns
      // added to every row, coverage and half-width replayed closed-form
      t(s, d, "lineitem").select(
          (col("l_extendedprice") / 1000.0).as("y"),
          col("l_quantity").cast("double").as("x"),
          (((col("l_orderkey") * 8 + col("l_linenumber")) * 1103515245L
            + 12345L) % 1000 < 500).as("is_cal"))
        .createOrReplaceTempView("li_conf")
      GraftGateway.sql(s,
          "SELECT conformal_interval(y, is_cal, x, 0.1) FROM li_conf")
        .agg(count(lit(1)).as("n_rows"),
          round(avg((col("y") >= col("lower") && col("y") <= col("upper"))
            .cast("double")), 6).as("coverage"),
          round(avg(col("upper") - col("lower")) / 2.0, 6).as("q_hat"))
    }),
    "q122_conformal" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      // split-conformal interval: LCG calibration split (q80 idiom — both
      // engines replay the integer arithmetic), exact k-th-residual
      // quantile, empirical band coverage over the whole table
      val li = t(s, d, "lineitem").select(
        (col("l_extendedprice") / 1000.0).as("y"),
        col("l_quantity").cast("double").as("x"),
        (((col("l_orderkey") * 8 + col("l_linenumber")) * 1103515245L
          + 12345L) % 1000 < 500).as("is_cal"))
      val (m, q, nCal) = graft.ops.Regression.conformalOls(li, col("y"),
        Seq(col("x")), col("is_cal"), alpha = 0.1)
      val pred = graft.ops.Regression.predict(m, Seq(col("x")))
      val cov = li.agg(avg(when(abs(col("y") - pred) <= q, 1.0)
        .otherwise(0.0))).head().getDouble(0)
      Seq((nCal, q, m.coefficients(0), m.intercept, cov))
        .toDF("n_raw", "q_raw", "s_raw", "i_raw", "c_raw")
        .select(col("n_raw").as("n_cal"), round(col("q_raw"), 6).as("q_hat"),
          round(col("s_raw"), 6).as("slope"),
          round(col("i_raw"), 6).as("intercept"),
          round(col("c_raw"), 6).as("coverage"))
    }),
    "q123_snapshot_diff" -> ((s, d) => {
      // dataset-release audit: v1 = docs 0..399, v2 = docs 100..499 with
      // the first 50 texts edited -> added/removed/changed/unchanged
      // counts are closed forms on the id ranges
      val docs = t(s, d, "documents")
      val oldV = docs.filter(col("doc_id") < 400)
      val newV = docs.filter(col("doc_id") >= 100).select(col("doc_id"),
        when(col("doc_id") < 150, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"))
      graft.ops.Dedup.snapshotDiff(oldV, newV, col("doc_id"), col("doc_id"),
          col("text"), col("text"))
        .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))
        .orderBy(col("status"))
    }),
    "q121_profile" -> ((s, d) => {
      // the ingestion-gate data profile: per-column rows/nulls/distincts/
      // extremes in ONE aggregate pass (exact distincts for the oracle;
      // production default is the HLL sketch)
      import graft.api.implicits._
      t(s, d, "orders").profileAll(
          Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"),
          exactDistinct = true)
        .select(col("column"), col("n_rows"), col("n_null"),
          round(col("null_frac"), 6).as("null_frac"), col("n_distinct"),
          col("min"), col("max"))
        .orderBy(col("column"))
    }),
    "q119_calibration" -> ((s, d) => {
      // binned calibration table + ECE for a probability score: <=10 cells
      // cross the wire; both engines compute the identical IEEE bin index
      graft.ops.MlEval.calibration(t(s, d, "lineitem"),
          (col("l_extendedprice") > 30000.0).cast("int"),
          col("l_quantity") / 50.0, nBins = 10)
        .select(col("bin"), col("n"),
          round(col("avg_score"), 6).as("avg_score"),
          round(col("avg_label"), 6).as("avg_label"),
          round(col("abs_gap"), 6).as("abs_gap"),
          round(col("ece"), 6).as("ece"))
    }),
    "q120_weighted_ess" -> ((s, d) => {
      // IPW-weighted mean with Kish effective sample size / design effect
      // (the weighting-quality diagnostic): one scan, all closed forms
      val e = lit(0.3) + lit(0.4) * (col("l_quantity") > 25.0).cast("double")
      graft.ops.Robust.weightedMeanEss(t(s, d, "lineitem"),
          col("l_extendedprice"), lit(1.0) / e)
        .select(col("n"), round(col("sum_w"), 4).as("sum_w"),
          round(col("weighted_mean"), 4).as("weighted_mean"),
          round(col("ess"), 4).as("ess"),
          round(col("design_effect"), 6).as("design_effect"))
    }),
    "q118_psi_drift" -> ((s, d) => {
      // binned drift metrics (PSI + Jensen-Shannon): one <=5-cell groupBy,
      // every column a closed form on the cell table (no bin is near the
      // minShare floor on this fixture, so the floor is inert)
      graft.ops.Drift.binnedDrift(t(s, d, "lineitem"), col("l_quantity"),
          (col("l_orderkey") % 2).cast("int"), bins = Seq(10, 20, 30, 40))
        .select(col("bin"), col("n_base"), col("n_cur"),
          round(col("share_base"), 6).as("share_base"),
          round(col("share_cur"), 6).as("share_cur"),
          round(col("psi_term"), 8).as("psi_term"),
          round(col("js_term"), 8).as("js_term"))
    }),
    "q116_qte" -> ((s, d) => {
      // population quantile treatment effects with exact per-arm
      // percentiles (quantile_cont parity proven by q09/q114)
      graft.ops.QuantileTest.quantileTreatmentEffect(
          t(s, d, "lineitem"), col("l_extendedprice"),
          (col("l_orderkey") % 2).cast("int"),
          probs = Seq(0.25, 0.5, 0.75, 0.9), exact = true)
        .select(col("percentile"), round(col("q0"), 4).as("q0"),
          round(col("q1"), 4).as("q1"), round(col("qte"), 4).as("qte"))
    }),
    "q117_wasserstein" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      // distributed 1-Wasserstein between arms on two metrics: ECDF gaps
      // from the range cumsum, step widths from partition-local lead with
      // driver-stitched boundaries — no global-order window
      val li = t(s, d, "lineitem")
      val tr = (col("l_orderkey") % 2).cast("int")
      val wPrice = graft.ops.RankTests.wasserstein1(li,
        col("l_extendedprice"), tr)
      val wQty = graft.ops.RankTests.wasserstein1(li, col("l_quantity"), tr)
      Seq(("l_extendedprice", wPrice), ("l_quantity", wQty))
        .toDF("metric", "w1_raw")
        .select(col("metric"), round(col("w1_raw"), 6).as("w1"))
        .orderBy(col("metric"))
    }),
    "q115_incremental_dedup" -> ((s, d) => {
      // incremental-ingestion dedup: the corpus batch carries 100 planted
      // re-ingestions plus the history docs themselves; only genuinely-new
      // docs survive the bloom-prefiltered exact anti-join. The oracle is
      // the closed-form new-docs set (normalized texts are unique in this
      // table, verified).
      val docs = t(s, d, "documents")
      val corpus = docs.select(col("doc_id"), col("lang"), col("text"))
        .unionByName(docs.filter(col("doc_id") < 100)
          .select((col("doc_id") + 10000).as("doc_id"), col("lang"),
            col("text")))
      val history = docs.filter(col("doc_id") < 250)
      graft.ops.Dedup.incrementalDedup(corpus, history, col("text"),
          col("text"), expectedHistory = 1000L)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_new"))
        .orderBy(col("lang"))
    }),
    "q114_robust_means" -> ((s, d) => {
      // winsorized/trimmed means with EXACT percentile bounds (q09 proved
      // Spark percentile == DuckDB quantile_cont interpolation); the
      // metric scan replays closed-form with the bounds as a 1-row cross
      // join
      graft.ops.Robust.robustMeans(t(s, d, "lineitem"),
          col("l_extendedprice"), pLo = 0.05, pHi = 0.95, exact = true)
        .select(col("n"), round(col("lo"), 4).as("lo"),
          round(col("hi"), 4).as("hi"),
          round(col("mean"), 4).as("mean"),
          round(col("winsorized_mean"), 4).as("winsorized_mean"),
          round(col("trimmed_mean"), 4).as("trimmed_mean"),
          col("n_clipped_lo"), col("n_clipped_hi"))
    }),
    "q113_json_orc_roundtrip" -> ((s, d) => {
      // JSONL and ORC sources/sinks under the gate (q65 idiom): a lineitem
      // slice round-trips text JSON then columnar ORC; Spark's JSON writer
      // emits full-precision doubles, so the aggregates equal the parquet
      // closed forms exactly
      val src = t(s, d, "lineitem").filter(col("l_linenumber") === 2)
        .select(col("l_orderkey"), col("l_quantity"), col("l_discount"))
      val dir = s"${System.getProperty("java.io.tmpdir")}/graft_jsonorc_${sfTag(d)}_" +
        s.sparkContext.applicationId
      src.coalesce(1).write.mode("overwrite").json(s"$dir/j")
      val j = s.read.schema(src.schema).json(s"$dir/j")
      j.write.mode("overwrite").orc(s"$dir/o")
      s.read.orc(s"$dir/o").agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("qty_sum"),
        round(sum(col("l_discount") * col("l_quantity")), 4).as("disc_qty"))
    }),
    "q112_audio_decode" -> ((s, d) => {
      // REAL PCM-WAV decode (pure RIFF chunk parsing, the audio twin of
      // q45): a constant-amplitude mono clip per part row decodes to
      // mean = rms = amp/32768 EXACTLY (power-of-two division), so the
      // aggregate is closed form over `part`
      val p = t(s, d, "part").select(
        col("p_partkey").cast("long").as("id"),
        (col("p_partkey") % 3001).cast("int").as("amp"),
        (lit(800) + col("p_partkey") % 100).cast("int").as("n"))
      val wav = p.withColumn("content",
        graft.ops.Multimodal.constWavMono(col("amp"), col("n"), lit(16000)))
      graft.ops.Multimodal.decodeAudio(wav.select(col("id"), col("content")))
        .groupBy((col("id") % 10).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("decode_ok").cast("long")).as("n_ok"),
          sum(col("n_samples")).as("sum_samples"),
          sum(col("sample_rate").cast("long")).as("sum_rate"),
          round(sum(element_at(col("means"), 1)), 6).as("sum_mean"),
          round(sum(element_at(col("rms"), 1)), 6).as("sum_rms"))
        .orderBy(col("bucket"))
    }),
    "q132_streaming_srm" -> ((s, d) => {
      // the live experiment-health monitor under the oracle gate (q73
      // harness): per-hour arm counts + chi-square vs an expected 1:1
      // split — counts and the chisq form replay closed-form in DuckDB
      // (p-value needs the chi-square CDF, so the gate pins the statistic)
      import org.apache.spark.sql.streaming.Trigger
      val ev = t(s, d, "events")
      val tsExpr =
        if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          (col("ts") / lit(1e9)).cast("timestamp")
        else col("ts").cast("timestamp")
      val stream = s.readStream.schema(ev.schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
      val sink = "q132_mem_" + math.abs(s.sparkContext.applicationId.hashCode)
      graft.streaming.StreamRun.runAvailableNow(
        graft.streaming.StreamOps.windowedSrm(stream, tsExpr,
            col("user_id") % 2, ratios = Seq(1.0, 1.0),
            windowDuration = "1 hour", watermarkDelay = "10 minutes")
          .writeStream.format("memory").queryName(sink).outputMode("complete"),
        s, graft.streaming.StreamRun.inputBytes(d, "events.parquet"))
      s.table(sink)
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("c0"), col("c1"), col("c_unexpected"),
          round(col("chisq"), 6).as("chisq"))
        .orderBy(col("w_start"))
    }),
    "q133_streaming_ttest" -> ((s, d) => {
      // the continuous two-sample t-test under the oracle gate: 6-hour
      // windows (epoch-aligned both engines), Welch moments from the same
      // conditional sums DuckDB replays; windows where either arm has < 2
      // events are filtered on both sides (their variance is undefined)
      import org.apache.spark.sql.streaming.Trigger
      val ev = t(s, d, "events")
      val tsExpr =
        if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          (col("ts") / lit(1e9)).cast("timestamp")
        else col("ts").cast("timestamp")
      val stream = s.readStream.schema(ev.schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
      val sink = "q133_mem_" + math.abs(s.sparkContext.applicationId.hashCode)
      graft.streaming.StreamRun.runAvailableNow(
        graft.streaming.StreamOps.windowedTtest(stream, tsExpr,
            (col("user_id") % 2).cast("int"), col("value"),
            windowDuration = "6 hours", watermarkDelay = "30 minutes")
          .writeStream.format("memory").queryName(sink).outputMode("complete"),
        s, graft.streaming.StreamRun.inputBytes(d, "events.parquet"))
      s.table(sink).filter(col("n0") >= 2 && col("n1") >= 2)
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("n0"), col("n1"),
          round(col("mean0"), 6).as("mean0"),
          round(col("mean1"), 6).as("mean1"),
          round(col("estimate"), 6).as("estimate"),
          round(col("stderr"), 6).as("stderr"),
          round(col("t_statistic"), 6).as("t_statistic"))
        .orderBy(col("w_start"))
    }),
    "q129_streaming_psi" -> ((s, d) => {
      // the streaming drift monitor under the oracle gate (q73 harness):
      // windowedPsi as a REAL readStream processed to completion — the
      // per-hour PSI against a fixed uniform-quartile baseline equals the
      // batch bin-count closed form DuckDB replays (identical IEEE term
      // order: the 4 bin terms fold left)
      import org.apache.spark.sql.streaming.Trigger
      val ev = t(s, d, "events")
      val tsExpr =
        if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          (col("ts") / lit(1e9)).cast("timestamp")
        else col("ts").cast("timestamp")
      val stream = s.readStream.schema(ev.schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
      val sink = "q129_mem_" + math.abs(s.sparkContext.applicationId.hashCode)
      graft.streaming.StreamRun.runAvailableNow(
        graft.streaming.StreamOps.windowedPsi(stream, tsExpr,
            col("value"), bins = Seq(15.0, 35.0, 70.0),
            baselineShares = Seq(0.25, 0.25, 0.25, 0.25),
            windowDuration = "1 hour", watermarkDelay = "10 minutes")
          .writeStream.format("memory").queryName(sink).outputMode("complete"),
        s, graft.streaming.StreamRun.inputBytes(d, "events.parquet"))
      s.table(sink)
        .select(unix_timestamp(col("window.start")).as("w_start"),
          col("n_window"), round(col("psi"), 6).as("psi"))
        .orderBy(col("w_start"))
    }),
    "q111_streaming_sessionize" -> ((s, d) => {
      // the custom-state streaming op under the oracle gate (q73 idiom):
      // gap-sessionization via flatMapGroupsWithState over a REAL
      // readStream. With NoTimeout and the single AvailableNow batch,
      // exactly the NON-FINAL sessions per user close (the last stays in
      // state) — DuckDB mirrors by sessionizing in SQL and dropping each
      // user's final session. Gap compares in epoch NANOS end-to-end.
      import org.apache.spark.sql.streaming.{GroupStateTimeout, Trigger}
      val spark = s
      import spark.implicits._
      val ev = t(s, d, "events")
      val stream = s.readStream.schema(ev.schema)
        .option("pathGlobFilter", "events.parquet").parquet(d)
      val evs = tsNanos(stream)
        .select(col("user_id").as("userId"), col("ts"), col("value"))
        .as[graft.streaming.StreamOps.SessionEvent]
      val sess = graft.streaming.StreamOps.sessionize(evs,
        gap = 14400L * 1000000000L, timeout = GroupStateTimeout.NoTimeout())
      val sink = "q111_mem_" + math.abs(s.sparkContext.applicationId.hashCode)
      // append-mode memory sink accumulates across re-runs in one session
      // (Bench passes): reset the table first
      s.catalog.dropTempView(sink)
      graft.streaming.StreamRun.runAvailableNow(
        sess.writeStream.format("memory").queryName(sink).outputMode("append"),
        s, graft.streaming.StreamRun.inputBytes(d, "events.parquet"))
      s.table(sink).agg(
        count(lit(1)).as("n_sessions"),
        countDistinct(col("userId")).as("n_users"),
        sum(col("n")).as("n_events"),
        max(col("n")).as("max_session_events"),
        round(avg(col("n")), 6).as("avg_session_events"),
        round(max(col("duration").cast("double") / 1e9), 6).as("max_duration_sec"),
        round(sum(col("sum")), 2).as("sum_value"))
    }),
    "q110_survival_verb" -> ((s, d) => {
      // the grouped kaplan_meier gateway verb end-to-end (q94 idiom:
      // same capability as q107, dispatched from raw SQL)
      t(s, d, "lineitem").select(col("l_returnflag").as("arm"),
          col("l_quantity").cast("int").as("time"),
          (col("l_linenumber") % 2).cast("int").as("event"))
        .createOrReplaceTempView("li_surv")
      GraftGateway.sql(s, "SELECT kaplan_meier(time, event, arm) FROM li_surv")
        .select(col("group").as("arm"), col("time"), col("n_risk"),
          col("n_event"), col("n_censored"),
          round(col("survival"), 6).as("survival"))
        .orderBy(col("arm"), col("time"))
    }),
    "q109_aipw" -> ((s, d) => {
      val spark = s
      import spark.implicits._
      // doubly-robust (AIPW) ATE with SATURATED cell models (m1/m0/e are
      // exact cell statistics): the oracle replays the full per-row
      // influence-term mean — same IEEE row arithmetic, only summation
      // order differs (y scaled to O(100) keeps that far below 1e-6).
      // Bootstrap band pinned (deterministic hash weights, q99 idiom).
      val li = t(s, d, "lineitem").select(
        (col("l_quantity") > 25).cast("int").as("seg"),
        (col("l_orderkey") % 2).cast("int").as("tr"),
        (col("l_extendedprice") / 1000.0).as("y"),
        col("l_orderkey"), col("l_linenumber"))
      val cell = li.groupBy(col("seg")).agg(
        avg(when(col("tr") === 1, col("y"))).as("m1"),
        avg(when(col("tr") === 0, col("y"))).as("m0"),
        avg(col("tr").cast("double")).as("e"))
      val j = li.join(broadcast(cell), "seg")
      val est = graft.ops.Bootstrap.aipwEstimator(j, col("y"), col("tr"),
        col("e"), col("m1"), col("m0"), b = 100,
        idCols = Seq(col("l_orderkey"), col("l_linenumber")))
      Seq((est.estimate, est.stderr, est.lower, est.upper))
        .toDF("e_raw", "s_raw", "l_raw", "u_raw")
        .select(round(col("e_raw"), 6).as("aipw_ate"),
          round(col("s_raw"), 6).as("stderr"),
          round(col("l_raw"), 6).as("lower"),
          round(col("u_raw"), 6).as("upper"),
          lit(sfTag(d)).as("oracle_sf"))
    }),
    "q107_km_grouped" -> ((s, d) => {
      // per-group Kaplan-Meier in ONE call: global range cumsum over
      // (group, time) with per-group offset subtraction — no per-group
      // window over row data, no driver loop. DuckDB replays the textbook
      // estimator with a partitioned window over the tiny curve frame.
      val subj = t(s, d, "lineitem").select(
        col("l_returnflag").as("arm"),
        col("l_quantity").cast("int").as("time"),
        (col("l_linenumber") % 2).cast("int").as("event"))
      graft.ops.Survival.kaplanMeierBy(subj, col("arm"), col("time"),
          col("event"))
        .select(col("group").as("arm"), col("time"), col("n_risk"),
          col("n_event"), col("n_censored"),
          round(col("survival"), 6).as("survival"))
        .orderBy(col("arm"), col("time"))
    }),
    "q108_log_rank" -> ((s, d) => {
      // Mantel-Cox log-rank test: O/E/V accumulate over pooled event times
      // from ONE RangeCumSum pass; chi2 is closed-form in SQL (p, a pure
      // driver function of chi2, is unit-tested against chiSqCdf)
      val subj = t(s, d, "lineitem").select(
        (col("l_orderkey") % 2).cast("int").as("arm"),
        col("l_quantity").cast("int").as("time"),
        (col("l_linenumber") % 2).cast("int").as("event"))
      graft.ops.Survival.logRankTest(subj, col("arm"), col("time"),
          col("event"))
        .select(round(col("observed1"), 6).as("observed1"),
          round(col("expected1"), 6).as("expected1"),
          round(col("variance"), 6).as("variance"),
          round(col("chi2"), 6).as("chi2"))
    }),
    "q106_feature_process" -> ((s, d) => {
      // the reference's feature_process pipeline end-to-end: dtype
      // classification, min-max scaling, cardinality-capped one-hot,
      // dense feature assembly — all stats from ONE agg pass. Scaled
      // features are pure IEEE row arithmetic on driver-literal min/max,
      // so the per-group means replay exactly in SQL.
      val li = t(s, d, "lineitem").select(
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_returnflag"),
        (col("l_orderkey") % 2).cast("double").as("label"))
      val (out, names) = graft.ops.Features.featureProcess(li, "label",
        scaleMethod = "minmax", oneHotThreshold = 30)
      out.groupBy(col("label").cast("int").as("label"))
        .agg(count(lit(1)).as("n_rows"),
          max(lit(names.length)).as("n_features"),
          round(avg(element_at(col("features"), 1)), 6).as("avg_qty_scaled"),
          round(avg(element_at(col("features"), 2)), 6).as("avg_price_scaled"),
          round(avg(element_at(col("features"), 3)), 6).as("avg_disc_scaled"),
          sum(element_at(col("features"), 4)).cast("long").as("n_flag_a"),
          sum(element_at(col("features"), 5)).cast("long").as("n_flag_n"),
          sum(element_at(col("features"), 6)).cast("long").as("n_flag_r"))
        .orderBy(col("label"))
    })
  )

  /** q256's oracle: PageRank's power iteration unrolled to `iters` chained
    * CTEs (no recursive CTE — aggregation over the recursive reference is
    * not portable SQL). The fixture graph has NO dangling node (every
    * node class appears as a src), so the replay needs no dangling-mass
    * term. */
  private def pagerankOracle(iters: Int): String = {
    val head =
      """WITH e AS (SELECT DISTINCT event_id % 100 AS src,
        |    (event_id * 7 + 3) % 100 AS dst FROM events),
        |nn AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
        |cnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nn),
        |deg AS (SELECT src AS node, CAST(count(*) AS DOUBLE) AS deg
        |  FROM e GROUP BY src),
        |r0 AS (SELECT node, (SELECT 1.0 / n FROM cnt) AS pr FROM nn)""".stripMargin
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT nn.node,
         |  (SELECT 0.15 / n FROM cnt) + 0.85 * coalesce(m.mass, 0.0) AS pr
         |  FROM nn LEFT JOIN (SELECT e.dst AS node,
         |      sum(r.pr / deg.deg) AS mass
         |    FROM e JOIN r${i - 1} r ON e.src = r.node
         |    JOIN deg ON deg.node = e.src GROUP BY e.dst) m
         |  ON nn.node = m.node)""".stripMargin
    }.mkString(",\n")
    s"$head,\n$steps\nSELECT node, round(pr, 8) AS rank FROM r$iters ORDER BY node"
  }

  /** q259's oracle: the MMR greedy unrolled to k chained picks. Each step
    * is ORDER BY score DESC, id LIMIT 1 over the not-yet-picked pool with
    * a correlated max-cosine over the picks so far; vectors are CAST to
    * DOUBLE[] because DuckDB's list_cosine_similarity computes in the
    * input's width (FLOAT would put ~3e-8 noise against Spark's double
    * path). */
  private def mmrOracle(k: Int, lambda: Double): String = {
    val head =
      s"""WITH c AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v,
         |    CAST((vec_id * 37) % 97 AS DOUBLE) / 97.0 AS rel
         |  FROM embeddings WHERE vec_id < 40),
         |s1 AS (SELECT id, v, rel, $lambda * rel AS sc FROM c
         |  ORDER BY sc DESC, id LIMIT 1)""".stripMargin
    val steps = (2 to k).map { i =>
      val sel = (1 until i).map(j => s"SELECT v FROM s$j")
        .mkString(" UNION ALL ")
      val notIn = (1 until i).map(j => s"SELECT id FROM s$j")
        .mkString(" UNION ALL ")
      s"""s$i AS (SELECT r.id, r.v, r.rel,
         |    $lambda * r.rel - ${1.0 - lambda} * (SELECT
         |      max(list_cosine_similarity(r.v, s.v)) FROM ($sel) s) AS sc
         |  FROM c r WHERE r.id NOT IN ($notIn)
         |  ORDER BY sc DESC, r.id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (1 to k).map(i =>
      s"SELECT $i AS rank, id, round(rel, 6) AS relevance, " +
        s"round(sc, 6) AS mmr_score FROM s$i").mkString(" UNION ALL ")
    s"$head,\n$steps\n$out ORDER BY rank"
  }

  def oracleSql: Map[String, String] = Map(
    "q105_tfidf" ->
      // same tokenizer, counts, and smoothed-idf/BM25 formulas replayed
      // relationally; rank by (tfidf desc, token) is a total order
      """WITH tk AS (
        |  SELECT doc_id, tok FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
        |    FROM documents)
        |  WHERE length(tok) > 0),
        |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
        |dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
        |dfq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
        |corpus AS (SELECT count(DISTINCT doc_id) AS n,
        |    sum(tf) * 1.0 / count(DISTINCT doc_id) AS avgdl FROM tf),
        |scored AS (SELECT tf.doc_id, tf.tok, tf.tf, dl.dl, dfq.df,
        |    ln((corpus.n + 1.0) / (dfq.df + 1.0)) + 1.0 AS idf
        |  FROM tf JOIN dl USING (doc_id) JOIN dfq USING (tok), corpus),
        |full_s AS (SELECT doc_id, tok, tf, dl, df, idf, tf * idf AS tfidf,
        |    idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (SELECT avgdl FROM corpus))) AS bm25
        |  FROM scored),
        |ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf DESC, tok) AS rank FROM full_s)
        |SELECT doc_id, CAST(rank AS INT) AS rank, tok AS token,
        |  CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
        |  round(idf, 6) AS idf, round(tfidf, 6) AS tfidf,
        |  round(bm25, 6) AS bm25
        |FROM ranked WHERE rank <= 3 AND doc_id % 57 = 0
        |ORDER BY doc_id, rank""".stripMargin,
    "q109_aipw" ->
      // the full AIPW influence-term mean replayed per row (cell models
      // joined back); bootstrap band pinned at sf0.01
      """WITH li AS (SELECT CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS seg,
        |    CAST(l_orderkey % 2 AS INT) AS tr, l_extendedprice / 1000.0 AS y
        |  FROM lineitem),
        |cell AS (SELECT seg, avg(CASE WHEN tr = 1 THEN y END) AS m1,
        |    avg(CASE WHEN tr = 0 THEN y END) AS m0,
        |    avg(CAST(tr AS DOUBLE)) AS e FROM li GROUP BY seg),
        |psi AS (SELECT m1 - m0 + tr * (y - m1) / e
        |      - (1 - tr) * (y - m0) / (1 - e) AS v
        |  FROM li JOIN cell USING (seg))
        |SELECT round(avg(v), 6) AS aipw_ate,
        |  CAST(0.243309 AS DOUBLE) AS stderr,
        |  CAST(-0.111791 AS DOUBLE) AS lower,
        |  CAST(0.821377 AS DOUBLE) AS upper,
        |  '0.01' AS oracle_sf
        |FROM psi""".stripMargin,
    "q144_audio_neardup" ->
      // same planted-pair closed form as q143, audio side
      """WITH c AS (SELECT p_partkey AS k FROM part WHERE p_partkey % 20 = 0)
        |SELECT CAST((SELECT count(*) FROM part) + (SELECT count(*) FROM c) AS BIGINT) AS n_clips,
        |  CAST((SELECT count(*) FROM part) + (SELECT count(*) FROM c) AS BIGINT) AS n_decoded,
        |  CAST((SELECT count(*) FROM c) AS BIGINT) AS n_pairs,
        |  CAST((SELECT sum(2 * k + 1099511627776) FROM c) AS BIGINT) AS pair_id_sum,
        |  CAST(0 AS INT) AS max_hamming""".stripMargin,
    "q143_image_neardup" ->
      // the planted-copy pair set in closed form: one pair per 1-in-20
      // part key, ids (k, k + 2^40), all at hamming 0
      """WITH c AS (SELECT p_partkey AS k FROM part WHERE p_partkey % 20 = 0)
        |SELECT CAST((SELECT count(*) FROM part) + (SELECT count(*) FROM c) AS BIGINT) AS n_images,
        |  CAST((SELECT count(*) FROM part) + (SELECT count(*) FROM c) AS BIGINT) AS n_decoded,
        |  CAST((SELECT count(*) FROM c) AS BIGINT) AS n_pairs,
        |  CAST((SELECT sum(2 * k + 1099511627776) FROM c) AS BIGINT) AS pair_id_sum,
        |  CAST(0 AS INT) AS max_hamming""".stripMargin,
    "q154_ivfpq_recall" ->
      // pinned deterministic fixture constant (q46/q150 idiom)
      """SELECT CAST(10 AS BIGINT) AS n_queries, CAST(5 AS INT) AS k,
        |  CAST(50 AS BIGINT) AS n_true, CAST(50 AS BIGINT) AS n_hit,
        |  CAST(1.0 AS DOUBLE) AS recall, TRUE AS pass,
        |  '0.01' AS oracle_sf""".stripMargin,
    "q164_bayes_ab" ->
      // the same lgamma-log-space exceedance sum; generate_series is not
      // lateral-correlated in DuckDB, so a fixed 1M bound joins with
      // i < alpha_B (covers success counts up to 1M)
      """WITH m AS (SELECT
        |    sum(CASE WHEN l_partkey % 2 = 0 THEN 1 ELSE 0 END) AS n0,
        |    sum(CASE WHEN l_partkey % 2 = 0 AND l_returnflag = 'R'
        |        THEN 1 ELSE 0 END) AS s0,
        |    sum(CASE WHEN l_partkey % 2 = 1 THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN l_partkey % 2 = 1 AND l_returnflag = 'R'
        |        THEN 1 ELSE 0 END) AS s1
        |  FROM lineitem),
        |q AS (SELECT n0, s0, n1, s1,
        |    1.0 + s0 AS aa, 1.0 + (n0 - s0) AS ba,
        |    1.0 + s1 AS ab, 1.0 + (n1 - s1) AS bb FROM m),
        |terms AS (
        |  SELECT q.*, CAST(g.i AS DOUBLE) AS i
        |  FROM q JOIN generate_series(0, 1000000) AS g(i)
        |    ON g.i < CAST(q.ab AS BIGINT)),
        |p AS (SELECT any_value(n0) AS n0, any_value(s0) AS s0,
        |    any_value(n1) AS n1, any_value(s1) AS s1,
        |    any_value(aa) AS aa, any_value(ba) AS ba,
        |    any_value(ab) AS ab, any_value(bb) AS bb,
        |    sum(exp( (lgamma(aa+i)+lgamma(ba+bb)-lgamma(aa+i+ba+bb))
        |           - ln(bb+i)
        |           - (lgamma(1.0+i)+lgamma(bb)-lgamma(1.0+i+bb))
        |           - (lgamma(aa)+lgamma(ba)-lgamma(aa+ba)) )) AS pr
        |  FROM terms)
        |SELECT CAST(n0 AS BIGINT) AS n0, CAST(s0 AS BIGINT) AS s0,
        |  CAST(n1 AS BIGINT) AS n1, CAST(s1 AS BIGINT) AS s1,
        |  round(aa/(aa+ba), 6) AS rate0, round(ab/(ab+bb), 6) AS rate1,
        |  round(least(1.0, pr), 6) AS p_beats_control,
        |  round((ab/(ab+bb))/(aa/(aa+ba)) - 1.0, 6) AS expected_lift
        |FROM p""".stripMargin,
    "q163_metric_anomaly" ->
      // per-hour metric cells, same-phase prior window for the baseline;
      // epoch(ts) fractions never move an hour floor, so periods agree
      """WITH cells AS (
        |  SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS period,
        |    avg(value) AS metric
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1),
        |s AS (
        |  SELECT period, metric,
        |    count(metric) OVER w AS n_hist,
        |    avg(metric) OVER w AS baseline,
        |    stddev_samp(metric) OVER w AS baseline_sd
        |  FROM cells
        |  WINDOW w AS (PARTITION BY period % 24 ORDER BY period
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT period, round(metric, 6) AS metric, n_hist,
        |  round(baseline, 6) AS baseline,
        |  round(baseline_sd, 6) AS baseline_sd,
        |  round(CASE WHEN n_hist >= 3 AND baseline_sd > 0
        |    THEN (metric - baseline) / baseline_sd END, 6) AS z,
        |  coalesce(abs(CASE WHEN n_hist >= 3 AND baseline_sd > 0
        |    THEN (metric - baseline) / baseline_sd END) > 2, false)
        |    AS is_anomaly
        |FROM s ORDER BY period""".stripMargin,
    "q162_jackknife" ->
      // bucket cells -> leave-one-out ratio diffs; (G-1)*var_pop(d) equals
      // the jackknife sum-of-squares form; t_{0.975,31} pinned to 16
      // digits (commons-math3 value, q157's z-pinning idiom)
      """WITH c AS (
        |  SELECT l_suppkey % 32 AS b,
        |    sum(CASE WHEN l_partkey % 2 = 1
        |        THEN CAST(l_extendedprice AS DOUBLE) ELSE 0 END) AS y1,
        |    sum(CASE WHEN l_partkey % 2 = 1
        |        THEN CAST(l_quantity AS DOUBLE) ELSE 0 END) AS x1,
        |    sum(CASE WHEN l_partkey % 2 = 0
        |        THEN CAST(l_extendedprice AS DOUBLE) ELSE 0 END) AS y0,
        |    sum(CASE WHEN l_partkey % 2 = 0
        |        THEN CAST(l_quantity AS DOUBLE) ELSE 0 END) AS x0
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(y1) AS s1, sum(x1) AS t1, sum(y0) AS s0,
        |        sum(x0) AS t0, count(*) AS g FROM c),
        |d AS (SELECT (t.s1 - c.y1) / (t.t1 - c.x1)
        |           - (t.s0 - c.y0) / (t.t0 - c.x0) AS dd FROM c, t),
        |e AS (SELECT (SELECT s1 / t1 - s0 / t0 FROM t) AS est,
        |        sqrt(((SELECT g FROM t) - 1) * var_pop(dd)) AS se FROM d)
        |SELECT round(est, 6) AS estimate, round(se, 6) AS stderr,
        |  round(est - 2.0395134463964073 * se, 6) AS lower,
        |  round(est + 2.0395134463964073 * se, 6) AS upper,
        |  (SELECT CAST(g AS BIGINT) FROM t) AS n_buckets
        |FROM e""".stripMargin,
    "q161_fuzzy_join" ->
      // blocking + levenshtein gate; DuckDB's levenshtein agrees with
      // Spark's on these plain-ASCII keys. The oracle blocks on the SAME
      // composite key as the query (nation + all-but-last-2 name chars)
      // instead of nation alone: the coarse key is O(per-nation²)
      // levenshtein evals — the sf1 timeout — and the fine key loses no
      // pair BY CONSTRUCTION (names are fixed-width, the right side ends
      // 'x' vs the left's digit, so any dist<=1 pair spends its whole
      // budget on that final char and agrees on the len-2 prefix)
      """WITH l AS (SELECT c_custkey AS id,
        |    CAST(c_nationkey AS VARCHAR) || '#'
        |      || substr(c_name, 1, length(c_name) - 2) AS block,
        |    c_name AS key
        |  FROM customer),
        |r AS (SELECT c_custkey + 1000000 AS id,
        |    CAST(c_nationkey AS VARCHAR) || '#'
        |      || substr(c_name, 1, length(c_name) - 2) AS block,
        |    substr(c_name, 1, length(c_name) - 1) || 'x' AS key
        |  FROM customer),
        |p AS (SELECT l.id AS id_a, r.id AS id_b,
        |    string_split(l.block, '#')[1] AS block,
        |    levenshtein(l.key, r.key) AS dist
        |  FROM l JOIN r ON l.block = r.block
        |  WHERE levenshtein(l.key, r.key) <= 1)
        |SELECT block, count(*) AS n_pairs,
        |  CAST(sum(dist) AS BIGINT) AS sum_dist,
        |  CAST(sum(id_a) AS BIGINT) AS id_a_sum,
        |  CAST(sum(id_b) AS BIGINT) AS id_b_sum
        |FROM p GROUP BY block ORDER BY CAST(block AS INTEGER)""".stripMargin,
    "q160_srm_sequential" ->
      // cumulative arm counts per look + the closed-form Dirichlet-
      // multinomial marginal vs the null; running-max window inverts the
      // e-process into the always-valid p (rounded well above fp drift)
      """WITH e AS (
        |  SELECT CAST(floor(event_id / 500) AS BIGINT) AS bucket,
        |    CASE WHEN event_id % 21 = 0 THEN 1 ELSE event_id % 2 END AS arm
        |  FROM events),
        |cells AS (
        |  SELECT bucket,
        |    sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS c0,
        |    sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS c1
        |  FROM e GROUP BY bucket),
        |cum AS (
        |  SELECT bucket, sum(c0) OVER w AS n0, sum(c1) OVER w AS n1
        |  FROM cells
        |  WINDOW w AS (ORDER BY bucket
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |le AS (
        |  SELECT bucket, n0 + n1 AS n,
        |    lgamma(2.0) - 2 * lgamma(1.0)
        |      + lgamma(1.0 + n0) + lgamma(1.0 + n1)
        |      - lgamma(2.0 + n0 + n1)
        |      - n0 * ln(0.5) - n1 * ln(0.5) AS log_e
        |  FROM cum)
        |SELECT bucket, CAST(n AS BIGINT) AS n, round(log_e, 6) AS log_e,
        |  round(least(1.0, exp(-max(log_e) OVER
        |    (ORDER BY bucket
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))), 6)
        |    AS p_always_valid
        |FROM le ORDER BY bucket""".stripMargin,
    "q159_weighted_sample" ->
      // same A-ES key -ln(u)/w in the same IEEE order; row_number replays
      // the per-language k-smallest cut (keys are hash-unique, no ties)
      """WITH b AS (
        |  SELECT doc_id, lang, n_chars,
        |    -ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |         + 0.5) / 4294967296.0) / n_chars AS k
        |  FROM documents),
        |r AS (SELECT *, row_number() OVER (PARTITION BY lang ORDER BY k) AS rn
        |      FROM b)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(doc_id) AS BIGINT) AS id_checksum,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM r WHERE rn <= 30
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q158_profile_diff" ->
      // per-column closed forms; statuses/dtypes are schema facts
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_orderpriority
        |  FROM orders),
        |nw AS (SELECT o_orderkey, o_orderstatus, o_custkey AS cust
        |  FROM orders WHERE o_orderkey % 5 <> 0)
        |SELECT * FROM (
        |SELECT 'cust' AS "column", 'added' AS status,
        |  CAST(NULL AS VARCHAR) AS dtype_old, 'bigint' AS dtype_new,
        |  CAST(NULL AS BIGINT) AS n_old,
        |  (SELECT count(*) FROM nw) AS n_new,
        |  CAST(NULL AS DOUBLE) AS null_frac_old, 0.0 AS null_frac_new,
        |  CAST(NULL AS BIGINT) AS n_distinct_old,
        |  (SELECT count(DISTINCT cust) FROM nw) AS n_distinct_new,
        |  CAST(NULL AS VARCHAR) AS min_old,
        |  (SELECT CAST(min(cust) AS VARCHAR) FROM nw) AS min_new,
        |  CAST(NULL AS VARCHAR) AS max_old,
        |  (SELECT CAST(max(cust) AS VARCHAR) FROM nw) AS max_new
        |UNION ALL
        |SELECT 'o_orderkey', 'kept', 'bigint', 'bigint',
        |  (SELECT count(*) FROM o), (SELECT count(*) FROM nw), 0.0, 0.0,
        |  (SELECT count(DISTINCT o_orderkey) FROM o),
        |  (SELECT count(DISTINCT o_orderkey) FROM nw),
        |  (SELECT CAST(min(o_orderkey) AS VARCHAR) FROM o),
        |  (SELECT CAST(min(o_orderkey) AS VARCHAR) FROM nw),
        |  (SELECT CAST(max(o_orderkey) AS VARCHAR) FROM o),
        |  (SELECT CAST(max(o_orderkey) AS VARCHAR) FROM nw)
        |UNION ALL
        |SELECT 'o_orderpriority', 'removed', 'string', NULL,
        |  (SELECT count(*) FROM o), NULL, 0.0, NULL,
        |  (SELECT count(DISTINCT o_orderpriority) FROM o), NULL,
        |  (SELECT min(o_orderpriority) FROM o), NULL,
        |  (SELECT max(o_orderpriority) FROM o), NULL
        |UNION ALL
        |SELECT 'o_orderstatus', 'kept', 'string', 'string',
        |  (SELECT count(*) FROM o), (SELECT count(*) FROM nw), 0.0, 0.0,
        |  (SELECT count(DISTINCT o_orderstatus) FROM o),
        |  (SELECT count(DISTINCT o_orderstatus) FROM nw),
        |  (SELECT min(o_orderstatus) FROM o),
        |  (SELECT min(o_orderstatus) FROM nw),
        |  (SELECT max(o_orderstatus) FROM o),
        |  (SELECT max(o_orderstatus) FROM nw))
        |ORDER BY "column"""".stripMargin,
    "q157_e_value" ->
      // per-arm event counts -> RR, log-RR delta CI (z pinned to 16
      // digits), E = RR + sqrt(RR(RR-1)) with the away-from-null flip and
      // the cross-null CI pin, in the SAME IEEE order as the Scala forms
      """WITH m AS (SELECT
        |    sum(CASE WHEN l_suppkey % 2 <> 0 THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN l_suppkey % 2 <> 0 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS e1,
        |    sum(CASE WHEN l_suppkey % 2 = 0 THEN 1 ELSE 0 END) AS n0,
        |    sum(CASE WHEN l_suppkey % 2 = 0 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS e0
        |  FROM lineitem),
        |c AS (SELECT n1, n0, e1, e0,
        |    CAST(e1 AS DOUBLE) / n1 AS p1, CAST(e0 AS DOUBLE) / n0 AS p0
        |  FROM m),
        |d AS (SELECT n1, n0, p1, p0, p1 / p0 AS rr,
        |    sqrt((1.0 - p1) / e1 + (1.0 - p0) / e0) AS sel,
        |    1.9599639845400545 AS z
        |  FROM c),
        |e AS (SELECT n1, n0, p1, p0, rr,
        |    exp(ln(rr) - z * sel) AS lo, exp(ln(rr) + z * sel) AS hi
        |  FROM d),
        |f AS (SELECT *,
        |    CASE WHEN rr < 1.0 THEN 1.0 / rr ELSE rr END AS arr,
        |    CASE WHEN lo <= 1.0 AND hi >= 1.0 THEN NULL
        |         WHEN rr >= 1.0 THEN (CASE WHEN lo < 1.0 THEN 1.0 / lo ELSE lo END)
        |         ELSE (CASE WHEN hi < 1.0 THEN 1.0 / hi ELSE hi END) END AS aci
        |  FROM e)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
        |  round(p1, 6) AS p1, round(p0, 6) AS p0, round(rr, 6) AS rr,
        |  round(lo, 6) AS rr_lower, round(hi, 6) AS rr_upper,
        |  round(arr + sqrt(arr * (arr - 1.0)), 6) AS e_value,
        |  round(coalesce(aci + sqrt(aci * (aci - 1.0)), 1.0), 6) AS e_value_ci
        |FROM f""".stripMargin,
    "q155_funnel" ->
      // the same sequential-min chain: anchor = first view; click after
      // the anchor inside the window; purchase after the click inside the
      // SAME anchor window
      """WITH ev AS (SELECT user_id AS u,
        |    CAST(epoch_us(ts) AS DOUBLE) AS t, event_type AS e
        |  FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IN ('view', 'click', 'purchase')),
        |s1 AS (SELECT u, min(t) AS t1 FROM ev WHERE e = 'view' GROUP BY u),
        |s2 AS (SELECT e2.u, s1.t1, min(e2.t) AS t2 FROM ev e2
        |  JOIN s1 ON e2.u = s1.u
        |  WHERE e2.e = 'click' AND e2.t > s1.t1
        |    AND e2.t <= s1.t1 + 259200000000
        |  GROUP BY e2.u, s1.t1),
        |s3 AS (SELECT e3.u, min(e3.t) AS t3 FROM ev e3
        |  JOIN s2 ON e3.u = s2.u
        |  WHERE e3.e = 'purchase' AND e3.t > s2.t2
        |    AND e3.t <= s2.t1 + 259200000000
        |  GROUP BY e3.u),
        |c AS (SELECT (SELECT count(*) FROM s1) AS c1,
        |  (SELECT count(*) FROM s2) AS c2,
        |  (SELECT count(*) FROM s3) AS c3)
        |SELECT step, event, n_users, round(pf, 6) AS pct_of_first,
        |  round(pp, 6) AS pct_of_prev
        |FROM (
        |  SELECT 1 AS step, 'view' AS event, CAST(c1 AS BIGINT) AS n_users,
        |    1.0 AS pf, 1.0 AS pp FROM c
        |  UNION ALL
        |  SELECT 2, 'click', CAST(c2 AS BIGINT),
        |    CAST(c2 AS DOUBLE) / c1, CAST(c2 AS DOUBLE) / c1 FROM c
        |  UNION ALL
        |  SELECT 3, 'purchase', CAST(c3 AS BIGINT),
        |    CAST(c3 AS DOUBLE) / c1, CAST(c3 AS DOUBLE) / c2 FROM c)
        |ORDER BY step""".stripMargin,
    "q156_retention" ->
      """WITH ev AS (SELECT DISTINCT user_id AS u,
        |    CAST(floor(CAST(epoch_us(ts) AS DOUBLE) / 604800000000) AS BIGINT) AS p
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |fs AS (SELECT u, min(p) AS cohort FROM ev GROUP BY u),
        |sz AS (SELECT cohort, count(*) AS cs FROM fs GROUP BY cohort)
        |SELECT ev2.cohort, ev2.offset, ev2.n_users,
        |  round(CAST(ev2.n_users AS DOUBLE) / sz.cs, 6) AS retention
        |FROM (SELECT fs.cohort, ev.p - fs.cohort AS offset,
        |    CAST(count(*) AS BIGINT) AS n_users
        |  FROM ev JOIN fs ON ev.u = fs.u
        |  GROUP BY fs.cohort, ev.p - fs.cohort) ev2
        |JOIN sz ON ev2.cohort = sz.cohort
        |ORDER BY ev2.cohort, ev2.offset""".stripMargin,
    "q153_top_k" ->
      // exact regime: the sketch tracks every live combo, so counts equal
      // the plain group-by; rank ties break by item (none here)
      """SELECT CAST(row_number() OVER (ORDER BY count(*) DESC,
        |    l_returnflag || '|' || l_linestatus) AS INT) AS rank,
        |  l_returnflag || '|' || l_linestatus AS item,
        |  CAST(count(*) AS BIGINT) AS count
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY rank""".stripMargin,
    "q152_event_study" ->
      // the CS delta estimator: unit-level base differences, then the
      // two-sample mean/variance per (cohort, period) — att AND se are
      // plain SQL self-joins, fully closed-form
      """WITH p AS (SELECT l_orderkey AS u,
        |    CASE WHEN l_orderkey % 3 = 1 THEN 3
        |      WHEN l_orderkey % 3 = 2 THEN 5 ELSE 0 END AS cohort,
        |    l_linenumber AS period, CAST(l_quantity AS DOUBLE) AS y
        |  FROM lineitem),
        |bases AS (SELECT * FROM (VALUES (3, 2), (5, 4)) AS b(cohort, bp)),
        |tre AS (SELECT a.cohort, a.period, a.y - b.y AS d
        |  FROM p a JOIN p b ON a.u = b.u AND a.cohort = b.cohort
        |  JOIN bases s ON s.cohort = a.cohort AND b.period = s.bp
        |  WHERE a.cohort > 0 AND a.period <> s.bp),
        |ctl AS (SELECT s.cohort, a.period, a.y - b.y AS d
        |  FROM p a JOIN p b ON a.u = b.u JOIN bases s ON b.period = s.bp
        |  WHERE a.cohort = 0 AND b.cohort = 0 AND a.period <> s.bp),
        |g AS (SELECT cohort, period, avg(d) AS mg, var_samp(d) AS vg,
        |    count(*) AS ng FROM tre GROUP BY 1, 2),
        |c AS (SELECT cohort, period, avg(d) AS mc, var_samp(d) AS vc,
        |    count(*) AS nc FROM ctl GROUP BY 1, 2)
        |SELECT CAST(g.cohort AS BIGINT) AS cohort,
        |  CAST(g.period AS BIGINT) AS period,
        |  CAST(g.period - g.cohort AS BIGINT) AS event_time,
        |  g.period < g.cohort AS is_pre,
        |  round(g.mg - c.mc, 6) AS att,
        |  round(sqrt(g.vg / g.ng + c.vc / c.nc), 6) AS se,
        |  round((g.mg - c.mc)
        |    - 1.959963984540054 * sqrt(g.vg / g.ng + c.vc / c.nc), 6) AS lower,
        |  round((g.mg - c.mc)
        |    + 1.959963984540054 * sqrt(g.vg / g.ng + c.vc / c.nc), 6) AS upper,
        |  CAST(g.ng AS BIGINT) AS n_rows
        |FROM g JOIN c ON c.cohort = g.cohort AND c.period = g.period
        |ORDER BY 1, 2""".stripMargin,
    "q151_group_sequential" ->
      // per-look cumulative moments/z replay closed-form (q135's CTEs);
      // the spending boundaries are deterministic Armitage-recursion
      // numerics pinned at 4 decimals (10.0 = the bisection bracket cap:
      // the first looks' spend increment is below grid resolution, i.e.
      // effectively un-crossable)
      """WITH cells AS (SELECT epoch_ns(ts) // 86400000000000 AS bucket,
        |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN user_id % 2 = 1 THEN value ELSE 0 END) AS s1,
        |    sum(CASE WHEN user_id % 2 = 1 THEN value * value ELSE 0 END) AS q1,
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n0,
        |    sum(CASE WHEN user_id % 2 = 0 THEN value ELSE 0 END) AS s0,
        |    sum(CASE WHEN user_id % 2 = 0 THEN value * value ELSE 0 END) AS q0
        |  FROM events
        |  WHERE value IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |cum AS (SELECT bucket,
        |    sum(n1) OVER w AS cn1, sum(s1) OVER w AS cs1, sum(q1) OVER w AS cq1,
        |    sum(n0) OVER w AS cn0, sum(s0) OVER w AS cs0, sum(q0) OVER w AS cq0
        |  FROM cells
        |  WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |v AS (SELECT bucket, cn1, cn0, cs1 / cn1 - cs0 / cn0 AS d,
        |    ((cq1 - cs1 * cs1 / cn1) + (cq0 - cs0 * cs0 / cn0)) / (cn1 + cn0 - 2)
        |      * (1.0 / cn1 + 1.0 / cn0) AS vv
        |  FROM cum WHERE cn1 >= 2 AND cn0 >= 2),
        |looks AS (SELECT CAST(row_number() OVER (ORDER BY bucket) AS INT) AS look,
        |    bucket, cn1, cn0, d, d / sqrt(vv) AS z FROM v),
        |b AS (SELECT * FROM (VALUES
        |    (1,10.0),(2,7.3736),(3,5.897),(4,5.2326),(5,4.7192),(6,4.3349),
        |    (7,3.9809),(8,3.7646),(9,3.6194),(10,3.439),(11,3.2737),
        |    (12,3.1378),(13,3.0213),(14,2.9364),(15,2.8563),(16,2.7729),
        |    (17,2.706),(18,2.6545),(19,2.5956),(20,2.5412),(21,2.5197),
        |    (22,2.4794),(23,2.4247),(24,2.3819),(25,2.337),(26,2.2981),
        |    (27,2.268),(28,2.2343),(29,2.2241),(30,2.17))
        |  AS t(look, zb))
        |SELECT look, bucket, CAST(cn1 AS BIGINT) AS n1, CAST(cn0 AS BIGINT) AS n0,
        |  round(d, 6) AS estimate, round(z, 6) AS z,
        |  CAST(zb AS DOUBLE) AS z_boundary, abs(z) > zb AS crossed,
        |  '0.01' AS oracle_sf
        |FROM looks JOIN b USING (look) ORDER BY look""".stripMargin,
    "q150_pq_recall" ->
      // pinned deterministic fixture constant (q46 idiom): 10 probes x 5
      // exact copies, all recovered at the minimum ADC distance
      """SELECT CAST(10 AS BIGINT) AS n_queries, CAST(5 AS INT) AS k,
        |  CAST(50 AS BIGINT) AS n_true, CAST(50 AS BIGINT) AS n_hit,
        |  CAST(1.0 AS DOUBLE) AS recall, TRUE AS pass,
        |  '0.01' AS oracle_sf""".stripMargin,
    "q148_ratio_mde" ->
      // one moment pass + the Scala closed forms in the SAME IEEE order;
      // z(0.975)+z(0.8) pinned to 16 digits (q124 idiom)
      """WITH m AS (SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
        |    sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
        |  FROM (SELECT l_extendedprice::DOUBLE / 1000.0 AS x,
        |          CAST(l_quantity AS DOUBLE) AS y FROM lineitem)),
        |c AS (SELECT n, sx / sy AS ratio, sy / n AS dbar, sx, sy, sxx, syy, sxy FROM m),
        |v AS (SELECT n, ratio, dbar,
        |    sqrt((sxx - 2.0 * ratio * sxy + ratio * ratio * syy
        |      - n * (sx / n - ratio * dbar) * (sx / n - ratio * dbar)) / (n - 1)) AS sdd,
        |    1.9599639845400545 + 0.8416212335729143 AS zz
        |  FROM c)
        |SELECT CAST(n AS BIGINT) AS n, round(ratio, 6) AS ratio,
        |  round(sdd, 6) AS sd_delta,
        |  round(zz * (sdd / abs(dbar)) * sqrt(2.0 / n), 6) AS mde_abs,
        |  round(zz * (sdd / abs(dbar)) * sqrt(2.0 / n) / abs(ratio), 6) AS mde_rel,
        |  round(2.0 * pow(zz * (sdd / abs(dbar)) / (0.01 * abs(ratio)), 2), 2) AS n_per_arm_target
        |FROM v""".stripMargin,
    "q149_synth_control" ->
      // pinned sf0.01 path (deterministic pairwise-FW fit over
      // deterministic daily mean cells — the q34/q38 pinned-literal
      // idiom); is_pre stays an honest closed form of the period
      """SELECT CAST(period AS BIGINT) AS period, is_pre,
        |  CAST(y_treated AS DOUBLE) AS y_treated,
        |  CAST(y_synth AS DOUBLE) AS y_synth, CAST(gap AS DOUBLE) AS gap,
        |  '0.01' AS oracle_sf
        |FROM (VALUES
        |  (19723,true,40.46359,50.189592,-9.726002),
        |  (19724,true,66.390625,50.698469,15.692156),
        |  (19725,true,45.652,47.349712,-1.697712),
        |  (19726,true,34.088235,46.924649,-12.836413),
        |  (19727,true,49.673438,58.396844,-8.723406),
        |  (19728,true,48.018205,49.901337,-1.883132),
        |  (19729,true,37.725806,42.100143,-4.374337),
        |  (19730,true,52.683333,56.110055,-3.426722),
        |  (19731,true,39.450541,52.989947,-13.539406),
        |  (19732,true,69.418158,52.892815,16.525343),
        |  (19733,true,46.864848,49.479213,-2.614365),
        |  (19734,true,59.371515,48.41441,10.957105),
        |  (19735,true,43.207179,55.392275,-12.185095),
        |  (19736,true,47.625517,53.618,-5.992483),
        |  (19737,true,47.664828,51.843463,-4.178635),
        |  (19738,true,62.288947,48.656193,13.632755),
        |  (19739,true,68.408889,49.427469,18.981419),
        |  (19740,true,55.209091,55.973646,-0.764555),
        |  (19741,true,44.3372,41.578111,2.759089),
        |  (19742,true,46.135,52.960807,-6.825807),
        |  (19743,false,49.088824,56.385131,-7.296307),
        |  (19744,false,41.998966,43.980803,-1.981837),
        |  (19745,false,43.812778,53.071443,-9.258665),
        |  (19746,false,55.552692,45.959029,9.593663),
        |  (19747,false,43.778065,45.190486,-1.412422),
        |  (19748,false,44.986774,50.552281,-5.565507),
        |  (19749,false,51.494545,57.714312,-6.219766),
        |  (19750,false,51.049355,40.784686,10.264669),
        |  (19751,false,62.742333,46.61794,16.124393),
        |  (19752,false,48.127368,44.821911,3.305458))
        |AS t(period, is_pre, y_treated, y_synth, gap)
        |ORDER BY period""".stripMargin,
    "q165_synth_placebo" ->
      // rank/p are honest closed forms of the ratio order; the per-unit
      // RMSEs are deterministic pairwise-FW numerics pinned at sf0.01
      // (the q149/q34 pinned-literal idiom). The planted +25 treated
      // effect must rank FIRST of the 10 units: p = rank/10 = 0.1.
      """SELECT unit, is_treated, CAST(pre_rmse AS DOUBLE) AS pre_rmse,
        |  CAST(post_rmse AS DOUBLE) AS post_rmse,
        |  CAST(rmse_ratio AS DOUBLE) AS rmse_ratio,
        |  CAST(rank AS INT) AS rank, CAST(p_value AS DOUBLE) AS p_value,
        |  '0.01' AS oracle_sf
        |FROM (VALUES
        |  ('0', TRUE, 10.012726, 27.038028, 2.700366, 1, 0.1),
        |  ('1', FALSE, 4.70656, 9.229566, 1.961, 2, 0.2),
        |  ('8', FALSE, 7.306618, 10.769349, 1.473917, 3, 0.3),
        |  ('7', FALSE, 7.239903, 10.551756, 1.457444, 4, 0.4),
        |  ('6', FALSE, 9.458415, 12.403022, 1.311321, 5, 0.5),
        |  ('5', FALSE, 6.33991, 7.888172, 1.244209, 6, 0.6),
        |  ('4', FALSE, 7.026655, 8.076144, 1.149358, 7, 0.7),
        |  ('2', FALSE, 8.963028, 8.503069, 0.948683, 8, 0.8),
        |  ('9', FALSE, 6.771072, 6.224712, 0.91931, 9, 0.9),
        |  ('3', FALSE, 7.465412, 5.930311, 0.794371, 10, 1.0))
        |AS t(unit, is_treated, pre_rmse, post_rmse, rmse_ratio, rank, p_value)
        |ORDER BY rank, unit""".stripMargin,
    "q171_mediation" ->
      // the same 10 raw sums -> centered moments -> path algebra, all in
      // closed-form SQL
      """WITH p0 AS (SELECT CAST(l_orderkey % 2 AS DOUBLE) AS t,
        |    CAST(l_quantity AS DOUBLE) AS q,
        |    CAST(l_extendedprice AS DOUBLE) AS pr
        |  FROM lineitem),
        |p AS (SELECT t, q + 2.0 * t AS m,
        |    pr / 1000 + 3.0 * (q + 2.0 * t) + 1.5 * t AS y FROM p0),
        |s AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(t) AS st,
        |    sum(m) AS sm, sum(y) AS sy, sum(t*t) AS stt, sum(t*m) AS stm,
        |    sum(t*y) AS sty, sum(m*m) AS smm, sum(m*y) AS smy,
        |    sum(y*y) AS syy FROM p),
        |c AS (SELECT n, stt - st*st/n AS ctt, stm - st*sm/n AS ctm,
        |    sty - st*sy/n AS cty, smm - sm*sm/n AS cmm,
        |    smy - sm*sy/n AS cmy, syy - sy*sy/n AS cyy FROM s),
        |d AS (SELECT n, ctt, ctm, cty, cmm, cmy, cyy,
        |    ctm/ctt AS a, cmm*ctt - ctm*ctm AS det FROM c),
        |e AS (SELECT n, a, cty/ctt AS ctot,
        |    (cmm - a*ctm) / (n - 2) / ctt AS va,
        |    (cmy*ctt - cty*ctm) / det AS b,
        |    (cty*cmm - cmy*ctm) / det AS cdir,
        |    det, ctt, cmm, cmy, cty, cyy FROM d),
        |f AS (SELECT n, a, b, ctot, cdir, va,
        |    greatest(cyy - b*cmy - cdir*cty, 0.0) / (n - 3) * ctt / det AS vb
        |  FROM e),
        |g AS (SELECT n, a, b, ctot, cdir, a*b AS ind,
        |    sqrt(a*a*vb + b*b*va) AS se FROM f)
        |SELECT CAST(n AS BIGINT) AS n, round(a, 6) AS a, round(b, 6) AS b,
        |  round(ctot, 6) AS c_total, round(cdir, 6) AS c_direct,
        |  round(ind, 6) AS indirect, round(se, 6) AS se_indirect,
        |  round(ind / se, 4) AS z, round(ind / ctot, 6) AS prop_mediated
        |FROM g""".stripMargin,
    "q169_equivalence" ->
      // TOST closed forms; the equivalence boolean against the literal
      // one-sided 5% normal critical value
      """WITH g AS (SELECT
        |    count(*) FILTER (WHERE l_orderkey % 2 = 0) AS n0,
        |    count(*) FILTER (WHERE l_orderkey % 2 = 1) AS n1,
        |    avg(CAST(l_quantity AS DOUBLE))
        |      FILTER (WHERE l_orderkey % 2 = 0) AS m0,
        |    avg(CAST(l_quantity AS DOUBLE))
        |      FILTER (WHERE l_orderkey % 2 = 1) AS m1,
        |    var_samp(CAST(l_quantity AS DOUBLE))
        |      FILTER (WHERE l_orderkey % 2 = 0) AS v0,
        |    var_samp(CAST(l_quantity AS DOUBLE))
        |      FILTER (WHERE l_orderkey % 2 = 1) AS v1
        |  FROM lineitem)
        |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
        |  round(m0, 6) AS mean0, round(m1, 6) AS mean1,
        |  round(m1 - m0, 6) AS diff,
        |  round(sqrt(v1 / n1 + v0 / n0), 6) AS se,
        |  round((m1 - m0 + 0.5) / sqrt(v1 / n1 + v0 / n0), 4) AS z_lower,
        |  round((0.5 - (m1 - m0)) / sqrt(v1 / n1 + v0 / n0), 4) AS z_upper,
        |  least((m1 - m0 + 0.5) / sqrt(v1 / n1 + v0 / n0),
        |    (0.5 - (m1 - m0)) / sqrt(v1 / n1 + v0 / n0))
        |    > 1.6448536269514722 AS equivalent
        |FROM g""".stripMargin,
    "q170_rate_ratio" ->
      // the Poisson delta interval is pure exp/ln, and the quasi-Poisson
      // dispersion adds only the Σe²/x moment — fully closed-form
      """WITH g AS (SELECT
        |    sum(CASE WHEN user_id % 2 = 0 AND value > 80 THEN 1.0 ELSE 0 END) AS e0,
        |    sum(CASE WHEN user_id % 2 = 1 AND value > 80 THEN 1.0 ELSE 0 END) AS e1,
        |    sum(CASE WHEN user_id % 2 = 0 THEN CAST(user_id % 5 + 1 AS DOUBLE) ELSE 0 END) AS x0,
        |    sum(CASE WHEN user_id % 2 = 1 THEN CAST(user_id % 5 + 1 AS DOUBLE) ELSE 0 END) AS x1,
        |    sum(CASE WHEN user_id % 2 = 0 AND value > 80
        |      THEN 1.0 / CAST(user_id % 5 + 1 AS DOUBLE) ELSE 0 END) AS s0,
        |    sum(CASE WHEN user_id % 2 = 1 AND value > 80
        |      THEN 1.0 / CAST(user_id % 5 + 1 AS DOUBLE) ELSE 0 END) AS s1,
        |    count(*) AS n
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
        |h AS (SELECT *,
        |    greatest(1.0, ((s0 / (e0 / x0) - e0) + (s1 / (e1 / x1) - e1))
        |      / (n - 2)) AS phi
        |  FROM g)
        |SELECT e0 AS events0, e1 AS events1, x0 AS exposure0, x1 AS exposure1,
        |  round(e0 / x0, 6) AS rate0, round(e1 / x1, 6) AS rate1,
        |  round((e1 / x1) / (e0 / x0), 6) AS ratio,
        |  round(exp(ln((e1 / x1) / (e0 / x0))
        |    - 1.959963984540054 * sqrt(1.0 / e1 + 1.0 / e0)), 6) AS lower,
        |  round(exp(ln((e1 / x1) / (e0 / x0))
        |    + 1.959963984540054 * sqrt(1.0 / e1 + 1.0 / e0)), 6) AS upper,
        |  round(ln((e1 / x1) / (e0 / x0))
        |    / sqrt(1.0 / e1 + 1.0 / e0), 4) AS z,
        |  round(phi, 6) AS dispersion,
        |  round(exp(ln((e1 / x1) / (e0 / x0))
        |    - 1.959963984540054 * sqrt(1.0 / e1 + 1.0 / e0) * sqrt(phi)), 6)
        |    AS lower_od,
        |  round(exp(ln((e1 / x1) / (e0 / x0))
        |    + 1.959963984540054 * sqrt(1.0 / e1 + 1.0 / e0) * sqrt(phi)), 6)
        |    AS upper_od,
        |  round(ln((e1 / x1) / (e0 / x0))
        |    / (sqrt(1.0 / e1 + 1.0 / e0) * sqrt(phi)), 4) AS z_od
        |FROM h""".stripMargin,
    "q168_rdd_sharp" ->
      // the same 18 moment sums per side + the 2x2 weighted-LS and HC0
      // sandwich algebra, all in closed-form SQL
      """WITH p AS (SELECT
        |    CAST(l_extendedprice AS DOUBLE) / 100 +
        |      CASE WHEN l_quantity >= 26 THEN 50.0 ELSE 0 END AS y,
        |    CAST(l_quantity AS DOUBLE) - 25.5 AS x
        |  FROM lineitem
        |  WHERE abs(CAST(l_quantity AS DOUBLE) - 25.5) < 10),
        |b AS (SELECT y, x, 1.0 - abs(x) / 10.0 AS w FROM p),
        |m AS (SELECT CASE WHEN x >= 0 THEN 1 ELSE 0 END AS r,
        |    count(*) AS n, sum(w) AS w, sum(w*x) AS wx, sum(w*x*x) AS wxx,
        |    sum(w*y) AS wy, sum(w*x*y) AS wxy,
        |    sum(w*w) AS w2, sum(w*w*x) AS w2x, sum(w*w*x*x) AS w2xx,
        |    sum(w*w*x*x*x) AS w2x3, sum(w*w*x*x*x*x) AS w2x4,
        |    sum(w*w*y) AS w2y, sum(w*w*x*y) AS w2xy,
        |    sum(w*w*x*x*y) AS w2xxy, sum(w*w*x*x*x*y) AS w2x3y,
        |    sum(w*w*y*y) AS w2yy, sum(w*w*x*y*y) AS w2xyy,
        |    sum(w*w*x*x*y*y) AS w2xxyy
        |  FROM b GROUP BY 1),
        |ab AS (SELECT *, w*wxx - wx*wx AS det,
        |    (wxx*wy - wx*wxy) / (w*wxx - wx*wx) AS alpha,
        |    (w*wxy - wx*wy) / (w*wxx - wx*wx) AS beta
        |  FROM m),
        |vv AS (SELECT r, n, alpha, det, wxx, wx,
        |    w2yy - 2*alpha*w2y - 2*beta*w2xy
        |      + alpha*alpha*w2 + 2*alpha*beta*w2x + beta*beta*w2xx AS m0,
        |    w2xyy - 2*alpha*w2xy - 2*beta*w2xxy
        |      + alpha*alpha*w2x + 2*alpha*beta*w2xx + beta*beta*w2x3 AS m1,
        |    w2xxyy - 2*alpha*w2xxy - 2*beta*w2x3y
        |      + alpha*alpha*w2xx + 2*alpha*beta*w2x3 + beta*beta*w2x4 AS m2
        |  FROM ab),
        |v2 AS (SELECT r, n, alpha,
        |    (wxx*wxx*m0 - 2*wxx*wx*m1 + wx*wx*m2) / (det*det) AS v
        |  FROM vv)
        |SELECT
        |  CAST(max(CASE WHEN r = 0 THEN n END) AS BIGINT) AS n_left,
        |  CAST(max(CASE WHEN r = 1 THEN n END) AS BIGINT) AS n_right,
        |  round(max(CASE WHEN r = 0 THEN alpha END), 6) AS y_left,
        |  round(max(CASE WHEN r = 1 THEN alpha END), 6) AS y_right,
        |  round(max(CASE WHEN r = 1 THEN alpha END)
        |    - max(CASE WHEN r = 0 THEN alpha END), 6) AS tau,
        |  round(sqrt(sum(v)), 6) AS se,
        |  round((max(CASE WHEN r = 1 THEN alpha END)
        |      - max(CASE WHEN r = 0 THEN alpha END)) / sqrt(sum(v)), 4) AS z
        |FROM v2""".stripMargin,
    "q228_ngram_novelty" ->
      // per-doc DISTINCT trigrams via data-driven position enumeration
      // (unnest(range(1, len-1)) — no fixed truncation, any doc length);
      // the half split point is the exact doc_id median (quantile_cont ==
      // the house percentile)
      """WITH h AS (SELECT quantile_cont(doc_id, 0.5) AS m FROM documents),
        |tk AS (SELECT doc_id, string_split(lower(text), ' ') AS w
        |  FROM documents),
        |tg AS (SELECT DISTINCT doc_id,
        |    w[i] || ' ' || w[i + 1] || ' ' || w[i + 2] AS g
        |  FROM (SELECT doc_id, w,
        |      unnest(range(1, greatest(1, len(w) - 1))) AS i FROM tk)
        |  WHERE len(w) >= 3
        |  UNION
        |  SELECT DISTINCT doc_id, array_to_string(w, ' ') AS g
        |  FROM tk WHERE len(w) < 3),
        |cur AS (SELECT g, count(*) AS c FROM tg, h
        |  WHERE doc_id > h.m GROUP BY g),
        |ref AS (SELECT DISTINCT g FROM tg, h WHERE doc_id <= h.m),
        |nw AS (SELECT count(*) AS d, coalesce(sum(c), 0) AS o FROM cur
        |  WHERE g NOT IN (SELECT g FROM ref)),
        |tot AS (SELECT count(*) AS d, sum(c) AS o FROM cur)
        |SELECT CAST(tot.d AS BIGINT) AS ngrams_current,
        |  CAST(nw.d AS BIGINT) AS ngrams_new,
        |  round(CAST(nw.d AS DOUBLE) / tot.d, 6) AS novelty_distinct,
        |  CAST(tot.o AS BIGINT) AS occurrences_current,
        |  CAST(nw.o AS BIGINT) AS occurrences_new,
        |  round(CAST(nw.o AS DOUBLE) / tot.o, 6) AS novelty_weighted
        |FROM tot, nw""".stripMargin,
    "q229_bpe_token_count" ->
      // replay the DOCUMENTED merge algorithm: |-delimited token strings,
      // rules applied in rank order, each swept (replace-all) to fixpoint
      // before the next rank — equivalent to min-rank-first for the
      // well-formed list (rule r cannot create a pair of rank < r)
      """WITH RECURSIVE m(rk, l, r) AS (
        |  SELECT * FROM (VALUES (1,'a','t'),(2,'r','o'),(3,'ro','w'),
        |    (4,'d','at'),(5,'dat','a'),(6,'e','r'),(7,'t','er'),
        |    (8,'s','t'),(9,'a','n'),(10,'c','an'),(11,'l','l'),
        |    (12,'g','g'))),
        |w AS (SELECT lang, unnest(string_split(text, ' ')) AS wd
        |  FROM documents),
        |init AS (SELECT lang,
        |    regexp_replace(wd, '(.)', '|\1', 'g') || '|' AS ts FROM w),
        |bpe AS (
        |  SELECT lang, ts, 1 AS rk FROM init
        |  UNION ALL
        |  SELECT lang, CASE WHEN rep <> ts THEN rep ELSE ts END,
        |    CASE WHEN rep <> ts THEN rk ELSE rk + 1 END
        |  FROM (SELECT b.lang, b.ts, b.rk,
        |      replace(b.ts, '|' || m.l || '|' || m.r || '|',
        |        '|' || m.l || m.r || '|') AS rep
        |    FROM bpe b JOIN m ON m.rk = b.rk) s),
        |cnt AS (SELECT lang, len(ts) - len(replace(ts, '|', '')) - 1 AS n
        |  FROM bpe WHERE rk = 13),
        |bp AS (SELECT lang, CAST(sum(n) AS BIGINT) AS bpe_tokens
        |  FROM cnt GROUP BY lang),
        |wt AS (SELECT lang, CAST(count(*) AS BIGINT) AS ws_tokens
        |  FROM w GROUP BY lang),
        |nd AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang)
        |SELECT nd.lang AS lang, CAST(nd.n_docs AS BIGINT) AS n_docs,
        |  bp.bpe_tokens, wt.ws_tokens
        |FROM nd JOIN bp USING (lang) JOIN wt USING (lang)
        |ORDER BY lang""".stripMargin,
    "q230_semantic_dedup" ->
      // at threshold 0.99 the duplicate groups are exactly the equality
      // classes of the embedding vectors (planted copies), so the
      // representative set replays as a per-embedding min id
      """WITH u AS (SELECT vec_id, embedding FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000, embedding FROM embeddings
        |  WHERE vec_id < 50),
        |rep AS (SELECT embedding, min(vec_id) AS r FROM u
        |  GROUP BY embedding)
        |SELECT u.vec_id AS id, rep.r AS rep_id,
        |  u.vec_id = rep.r AS is_representative
        |FROM u JOIN rep ON u.embedding = rep.embedding
        |ORDER BY id""".stripMargin,
    "q231_friedman" ->
      // identical within-block rank construction: rank() + (ties-1)/2
      """WITH b AS (SELECT CAST(floor(event_id / 3) AS BIGINT) AS blk,
        |    CAST(event_id % 3 AS VARCHAR) AS t, value AS y
        |  FROM events WHERE event_id < 2100),
        |r AS (SELECT blk, t,
        |    RANK() OVER (PARTITION BY blk ORDER BY y)
        |      + (COUNT(*) OVER (PARTITION BY blk, y) - 1) / 2.0 AS r
        |  FROM b),
        |pt AS (SELECT t, sum(r) AS rj FROM r GROUP BY t),
        |tot AS (SELECT count(*) AS k, sum(rj * rj) AS sumrj2 FROM pt),
        |sc AS (SELECT sum(r * r) AS a, count(DISTINCT blk) AS n FROM r)
        |SELECT CAST(sc.n AS BIGINT) AS n_blocks, CAST(tot.k AS BIGINT) AS k,
        |  round((tot.k - 1) * (tot.sumrj2
        |      - tot.k * sc.n * sc.n * (tot.k + 1) * (tot.k + 1) / 4.0)
        |    / (sc.a - sc.n * tot.k * (tot.k + 1) * (tot.k + 1) / 4.0), 6)
        |    AS chisq,
        |  CAST(tot.k - 1 AS BIGINT) AS df
        |FROM tot, sc""".stripMargin,
    "q232_welch_anova" ->
      """WITH c AS (SELECT l_returnflag AS a, count(*) AS nk,
        |    avg(l_extendedprice) AS mk, var_samp(l_extendedprice) AS vk
        |  FROM lineitem GROUP BY 1),
        |w AS (SELECT a, nk, mk, nk / vk AS wk FROM c),
        |s AS (SELECT sum(wk) AS sw, sum(wk * mk) AS swm, count(*) AS k,
        |  sum(nk) AS n FROM w),
        |f AS (SELECT
        |    sum(wk * (mk - s.swm / s.sw) * (mk - s.swm / s.sw)) AS num,
        |    sum((1.0 - wk / s.sw) * (1.0 - wk / s.sw) / (nk - 1.0)) AS lam
        |  FROM w, s GROUP BY s.sw, s.swm)
        |SELECT CAST(s.n AS BIGINT) AS n, CAST(s.k AS BIGINT) AS k,
        |  round((f.num / (s.k - 1))
        |    / (1.0 + 2.0 * (s.k - 2) / (s.k * s.k - 1) * f.lam), 6) AS f_stat,
        |  CAST(s.k - 1 AS DOUBLE) AS df1,
        |  round((s.k * s.k - 1) / (3.0 * f.lam), 4) AS df2
        |FROM s, f""".stripMargin,
    "q233_jarque_bera" ->
      // raw central-moment expansion replicated term-for-term (the house
      // IEEE-order rule); sd = sqrt(m2 n/(n-1))
      """WITH s AS (SELECT count(*) AS n, sum(l_quantity) AS s1,
        |    sum(l_quantity * l_quantity) AS s2,
        |    sum(l_quantity * l_quantity * l_quantity) AS s3,
        |    sum(l_quantity * l_quantity * l_quantity * l_quantity) AS s4
        |  FROM lineitem),
        |m AS (SELECT n, s1 / n AS m, s2 / n - (s1 / n) * (s1 / n) AS m2,
        |    s3 / n - 3.0 * (s1 / n) * s2 / n
        |      + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
        |    s4 / n - 4.0 * (s1 / n) * s3 / n
        |      + 6.0 * (s1 / n) * (s1 / n) * s2 / n
        |      - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
        |  FROM s)
        |SELECT CAST(n AS BIGINT) AS n, round(m, 6) AS mean,
        |  round(sqrt(m2 * n / (n - 1.0)), 6) AS sd,
        |  round(m3 / (m2 ^ 1.5), 6) AS skewness,
        |  round(m4 / (m2 * m2) - 3.0, 6) AS ex_kurtosis,
        |  round(n / 6.0 * ((m3 / (m2 ^ 1.5)) * (m3 / (m2 ^ 1.5))
        |    + (m4 / (m2 * m2) - 3.0) * (m4 / (m2 * m2) - 3.0) / 4.0), 4)
        |    AS jb
        |FROM m""".stripMargin,
    "q234_vocab_drift" ->
      """WITH h AS (SELECT quantile_cont(doc_id, 0.5) AS m FROM documents),
        |tk AS (SELECT doc_id,
        |    unnest(string_split(lower(text), ' ')) AS tok FROM documents),
        |tc AS (SELECT tok, count(*) AS nc FROM tk, h
        |  WHERE doc_id > h.m AND len(tok) > 0 GROUP BY tok),
        |tr AS (SELECT tok, count(*) AS nr FROM tk, h
        |  WHERE doc_id <= h.m AND len(tok) > 0 GROUP BY tok),
        |j AS (SELECT coalesce(tc.nc, 0) AS nc, coalesce(tr.nr, 0) AS nr
        |  FROM tc FULL OUTER JOIN tr ON tc.tok = tr.tok),
        |t AS (SELECT sum(nc) AS tcn, sum(nr) AS trn, count(*) AS u,
        |    sum(CASE WHEN nc > 0 THEN 1 ELSE 0 END) AS vc,
        |    sum(CASE WHEN nr > 0 THEN 1 ELSE 0 END) AS vr FROM j),
        |d AS (SELECT
        |    sum(CASE WHEN nc > 0 THEN (nc / CAST(t.tcn AS DOUBLE))
        |      * ln((nc / CAST(t.tcn AS DOUBLE))
        |        / ((nc / CAST(t.tcn AS DOUBLE)
        |          + nr / CAST(t.trn AS DOUBLE)) / 2.0)) ELSE 0.0 END) AS klp,
        |    sum(CASE WHEN nr > 0 THEN (nr / CAST(t.trn AS DOUBLE))
        |      * ln((nr / CAST(t.trn AS DOUBLE))
        |        / ((nc / CAST(t.tcn AS DOUBLE)
        |          + nr / CAST(t.trn AS DOUBLE)) / 2.0)) ELSE 0.0 END) AS klq,
        |    sum(abs(nc / CAST(t.tcn AS DOUBLE)
        |      - nr / CAST(t.trn AS DOUBLE))) AS l1
        |  FROM j, t GROUP BY t.tcn, t.trn)
        |SELECT CAST(t.tcn AS BIGINT) AS tokens_current,
        |  CAST(t.trn AS BIGINT) AS tokens_ref,
        |  CAST(t.vc AS BIGINT) AS vocab_current,
        |  CAST(t.vr AS BIGINT) AS vocab_ref,
        |  CAST(t.u AS BIGINT) AS vocab_union,
        |  round(0.5 * d.klp + 0.5 * d.klq, 6) AS js_divergence,
        |  round(d.l1, 6) AS l1_distance
        |FROM t, d""".stripMargin,
    "q235_embedding_drift" ->
      """WITH cur AS (SELECT label, embedding FROM embeddings
        |  WHERE vec_id < 250),
        |ref AS (SELECT label, embedding FROM embeddings
        |  WHERE vec_id >= 250),
        |cc AS (SELECT label, g.i AS pos, avg(embedding[g.i]) AS c_cur,
        |    count(*) AS n_cur
        |  FROM cur, generate_series(1, 64) g(i) GROUP BY label, g.i),
        |cr AS (SELECT label, g.i AS pos, avg(embedding[g.i]) AS c_ref,
        |    count(*) AS n_ref
        |  FROM ref, generate_series(1, 64) g(i) GROUP BY label, g.i),
        |j AS (SELECT cc.label, cc.pos, cc.c_cur, cr.c_ref, cc.n_cur,
        |    cr.n_ref
        |  FROM cc JOIN cr ON cc.label = cr.label AND cc.pos = cr.pos)
        |SELECT label, CAST(max(n_cur) AS BIGINT) AS n_current,
        |  CAST(max(n_ref) AS BIGINT) AS n_ref,
        |  round(sqrt(sum((c_cur - c_ref) * (c_cur - c_ref))), 6)
        |    AS centroid_l2,
        |  round(sum(c_cur * c_ref) / (sqrt(sum(c_cur * c_cur))
        |    * sqrt(sum(c_ref * c_ref))), 6) AS centroid_cosine
        |FROM j GROUP BY label ORDER BY label""".stripMargin,
    "q236_semantic_dedup_probes" ->
      // ground truth is analytic (the q230 idiom): the 8 straddlers
      // (ids ≡ 13 or 14 mod 250) merge into one group with rep 13 —
      // reachable only because probes = 2 shares a boundary bucket —
      // and each axis blob collapses to its min id (= its residue mod 4)
      """WITH b AS (SELECT event_id AS vid,
        |    CASE WHEN event_id % 250 IN (13, 14) THEN 13
        |         ELSE event_id % 4 END AS rep
        |  FROM events WHERE event_id < 1000)
        |SELECT CAST(rep AS BIGINT) AS rep_id, count(*) AS n_members
        |FROM b GROUP BY rep ORDER BY rep_id""".stripMargin,
    "q237_partial_corr" ->
      // the single-control recursion r_xy.z = (r_xy − r_xz r_yz)/√(...)
      // — analytically the precision-matrix form at k = 1
      """WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x,
        |    CAST(l_quantity AS DOUBLE) AS y,
        |    CAST(l_discount AS DOUBLE) AS z FROM lineitem),
        |c AS (SELECT count(*) AS n, corr(x, y) AS rxy, corr(x, z) AS rxz,
        |    corr(y, z) AS ryz FROM b),
        |pr AS (SELECT n, rxy,
        |    (rxy - rxz * ryz) / sqrt((1 - rxz * rxz) * (1 - ryz * ryz)) AS p
        |  FROM c)
        |SELECT CAST(n AS BIGINT) AS n, round(rxy, 6) AS r_xy,
        |  round(p, 6) AS partial_r,
        |  round(p * sqrt(n - 3.0) / sqrt(1 - p * p), 4) AS t_stat,
        |  CAST(n - 3 AS DOUBLE) AS df
        |FROM pr""".stripMargin,
    "q238_kendall_tau" ->
      // concordant/discordant from the cell self-join (each unordered
      // pair counted twice, halved); tie pairs per marginal
      """WITH b AS (SELECT event_id % 7 AS x,
        |    (event_id % 7) + (event_id % 3) AS y FROM events),
        |cells AS (SELECT x, y, count(*) AS c FROM b GROUP BY x, y),
        |n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM cells),
        |cd AS (SELECT
        |    sum(CASE WHEN (a.x < b.x AND a.y < b.y)
        |          OR (a.x > b.x AND a.y > b.y)
        |        THEN a.c * b.c ELSE 0 END) // 2 AS conc,
        |    sum(CASE WHEN (a.x < b.x AND a.y > b.y)
        |          OR (a.x > b.x AND a.y < b.y)
        |        THEN a.c * b.c ELSE 0 END) // 2 AS disc
        |  FROM cells a, cells b),
        |tx AS (SELECT sum(t * (t - 1) // 2) AS n1,
        |    sum(CAST(t AS DOUBLE) * (t - 1)) AS t1,
        |    sum(CAST(t AS DOUBLE) * (t - 1) * (2 * t + 5)) AS t2,
        |    sum(CAST(t AS DOUBLE) * (t - 1) * (t - 2)) AS t3
        |  FROM (SELECT sum(c) AS t FROM cells GROUP BY x)),
        |ty AS (SELECT sum(t * (t - 1) // 2) AS n2,
        |    sum(CAST(t AS DOUBLE) * (t - 1)) AS u1,
        |    sum(CAST(t AS DOUBLE) * (t - 1) * (2 * t + 5)) AS u2,
        |    sum(CAST(t AS DOUBLE) * (t - 1) * (t - 2)) AS u3
        |  FROM (SELECT sum(c) AS t FROM cells GROUP BY y)),
        |vs AS (SELECT
        |    (n.n * (n.n - 1) * (2 * n.n + 5) - t2 - u2) / 18.0
        |      + t3 * u3 / (9.0 * n.n * (n.n - 1) * (n.n - 2))
        |      + t1 * u1 / (2.0 * n.n * (n.n - 1)) AS var_s
        |  FROM tx, ty, n)
        |SELECT CAST(n.n AS BIGINT) AS n,
        |  (SELECT count(*) FROM cells) AS cells,
        |  CAST(conc AS BIGINT) AS concordant,
        |  CAST(disc AS BIGINT) AS discordant,
        |  CAST(n1 AS BIGINT) AS ties_x, CAST(n2 AS BIGINT) AS ties_y,
        |  round((conc - disc)
        |    / sqrt((n.n * (n.n - 1) / 2 - n1) * (n.n * (n.n - 1) / 2 - n2)),
        |    6) AS tau_b,
        |  round(var_s / (n.n * n.n * n.n), 12) AS var_s_scaled,
        |  round((conc - disc) / sqrt(var_s), 6) AS z
        |FROM cd, tx, ty, n, vs""".stripMargin,
    "q239_ad_uniform" ->
      // the folded one-pass form: (2j−1)ln p + (2n+1−2j)ln(1−p) over
      // ranked rows (tie blocks are contiguous, so the sum is tie-safe)
      """WITH b AS (SELECT (((event_id * 37) % 1000) + 0.5) / 1000.0 AS p
        |  FROM events),
        |r AS (SELECT p, row_number() OVER (ORDER BY p) AS i FROM b),
        |nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM b)
        |SELECT CAST(nn.n AS BIGINT) AS n,
        |  round(-nn.n - sum((2.0 * i - 1) * ln(p)
        |    + (2.0 * nn.n + 1 - 2.0 * i) * ln(1 - p)) / nn.n, 6) AS a2
        |FROM r, nn GROUP BY nn.n""".stripMargin,
    "q240_page_hinkley" ->
      // running mean -> cumulative deviation -> running min, all over
      // period cells in the same ROWS frame
      """WITH b AS (SELECT CAST(floor(event_id / 100) AS BIGINT) AS period,
        |    value + CASE WHEN floor(event_id / 100) >= 50
        |      THEN 3.0 ELSE 0.0 END AS v
        |  FROM events),
        |cells AS (SELECT period, avg(v) AS metric FROM b GROUP BY period),
        |m AS (SELECT period, metric, avg(metric) OVER w AS rm
        |  FROM cells WINDOW w AS (ORDER BY period
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |u AS (SELECT period, metric,
        |    sum(metric - rm - 0.25) OVER w AS uu
        |  FROM m WINDOW w AS (ORDER BY period
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |ph AS (SELECT period, metric, uu - min(uu) OVER w AS ph
        |  FROM u WINDOW w AS (ORDER BY period
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT period, round(metric, 6) AS metric, round(ph, 6) AS ph,
        |  ph > 25.0 AS is_alarm
        |FROM ph ORDER BY period""".stripMargin,
    "q241_hellinger" ->
      // q118's binning on the shifted value; BC = Σ√(pq), H = √(1−BC)
      """WITH b AS (SELECT CASE
        |      WHEN l_quantity + CASE WHEN l_orderkey % 2 = 1
        |        THEN 5.0 ELSE 0.0 END < 10 THEN 0
        |      WHEN l_quantity + CASE WHEN l_orderkey % 2 = 1
        |        THEN 5.0 ELSE 0.0 END < 20 THEN 1
        |      WHEN l_quantity + CASE WHEN l_orderkey % 2 = 1
        |        THEN 5.0 ELSE 0.0 END < 30 THEN 2
        |      WHEN l_quantity + CASE WHEN l_orderkey % 2 = 1
        |        THEN 5.0 ELSE 0.0 END < 40 THEN 3
        |      ELSE 4 END AS bin,
        |    (l_orderkey % 2) AS g FROM lineitem),
        |c AS (SELECT bin,
        |    sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS n_base,
        |    sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS n_cur
        |  FROM b GROUP BY bin),
        |t AS (SELECT sum(n_base) AS t0, sum(n_cur) AS t1 FROM c),
        |s AS (SELECT greatest(n_base * 1.0 / (SELECT t0 FROM t), 1e-6) AS p,
        |    greatest(n_cur * 1.0 / (SELECT t1 FROM t), 1e-6) AS q FROM c),
        |bc AS (SELECT sum(sqrt(p * q)) AS bc FROM s)
        |SELECT round(bc, 8) AS bhattacharyya,
        |  round(sqrt(greatest(0.0, 1.0 - bc)), 6) AS hellinger
        |FROM bc""".stripMargin,
    "q248_mann_kendall" ->
      // pair-sign sum over period cells + the tie-corrected variance
      """WITH b AS (SELECT CAST(floor(event_id / 100) AS BIGINT) AS period,
        |    CAST(event_id % 7 AS DOUBLE)
        |      + floor(event_id / 100) * 0.25 AS v
        |  FROM events),
        |cells AS (SELECT period, avg(v) AS m FROM b GROUP BY period),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM cells),
        |sp AS (SELECT CAST(sum(CASE WHEN b2.m > a2.m THEN 1
        |      WHEN b2.m < a2.m THEN -1 ELSE 0 END) AS BIGINT) AS s
        |  FROM cells a2 JOIN cells b2 ON a2.period < b2.period),
        |tt AS (SELECT coalesce(sum(t * (t - 1.0) * (2 * t + 5)), 0.0) AS tt
        |  FROM (SELECT CAST(count(*) AS DOUBLE) AS t FROM cells
        |        GROUP BY m HAVING count(*) > 1)),
        |v AS (SELECT (n.n * (n.n - 1) * (2 * n.n + 5) - tt.tt) / 18.0
        |    AS var_s FROM n, tt)
        |SELECT CAST(n.n AS BIGINT) AS n_periods, sp.s AS s,
        |  round(v.var_s, 4) AS var_s,
        |  round(CASE WHEN sp.s > 0 THEN (sp.s - 1) / sqrt(v.var_s)
        |    WHEN sp.s < 0 THEN (sp.s + 1) / sqrt(v.var_s)
        |    ELSE 0.0 END, 6) AS z
        |FROM n, sp, v""".stripMargin,
    "q249_distinct_n" ->
      // n-gram windows by list comprehension (the q37 idiom); totals are
      // occurrences, distincts global
      """WITH d AS (SELECT string_split_regex(
        |    lower(regexp_replace(text, '^\s+|\s+$', '')), '\s+') AS toks
        |  FROM documents WHERE text IS NOT NULL),
        |g1 AS (SELECT unnest(toks) AS g FROM d),
        |g2 AS (SELECT unnest([toks[i] || ' ' || toks[i+1]
        |    for i in range(1, len(toks))]) AS g FROM d),
        |g3 AS (SELECT unnest([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |    for i in range(1, len(toks) - 1)]) AS g FROM d),
        |r AS (
        |  SELECT 1 AS n, count(*) AS t, count(DISTINCT g) AS dd
        |  FROM g1 WHERE length(g) > 0
        |  UNION ALL
        |  SELECT 2, count(*), count(DISTINCT g) FROM g2 WHERE length(g) > 0
        |  UNION ALL
        |  SELECT 3, count(*), count(DISTINCT g) FROM g3 WHERE length(g) > 0)
        |SELECT CAST(n AS INT) AS n, CAST(t AS BIGINT) AS total_ngrams,
        |  CAST(dd AS BIGINT) AS distinct_ngrams,
        |  round(CASE WHEN t > 0 THEN dd * 1.0 / t ELSE 0.0 END, 8)
        |    AS distinct_ratio
        |FROM r ORDER BY n""".stripMargin,
    "q250_poisson_reg" ->
      // saturated binary-covariate Poisson MLE closed form: slope =
      // ln(mean1/mean0), se from the arm outcome sums; Pearson
      // dispersion at the fitted cell means
      """WITH a AS (SELECT CAST(event_id % 5 AS DOUBLE) AS y,
        |    CAST(event_id % 2 AS INT) AS x FROM events),
        |arm AS (SELECT x, count(*) AS cnt, sum(y) AS s, avg(y) AS m
        |  FROM a GROUP BY x),
        |b AS (SELECT
        |  ln((SELECT m FROM arm WHERE x = 1) /
        |     (SELECT m FROM arm WHERE x = 0)) AS b1,
        |  ln((SELECT m FROM arm WHERE x = 0)) AS b0,
        |  sqrt(1.0/(SELECT s FROM arm WHERE x = 0)
        |     + 1.0/(SELECT s FROM arm WHERE x = 1)) AS se1,
        |  sqrt(1.0/(SELECT s FROM arm WHERE x = 0)) AS se0,
        |  (SELECT count(*) FROM a) AS n),
        |disp AS (SELECT sum((y - m)*(y - m)/m)
        |    / ((SELECT count(*) FROM a) - 2.0) AS phi
        |  FROM a JOIN arm USING (x))
        |SELECT 'x' AS term, round(b1, 6) AS estimate,
        |  round(se1, 6) AS stderr, round(phi, 6) AS dispersion, n
        |FROM b, disp
        |UNION ALL
        |SELECT '(intercept)', round(b0, 6), round(se0, 6), round(phi, 6), n
        |FROM b, disp
        |ORDER BY term""".stripMargin,
    "q251_c_index" ->
      // ground-truth ALL-pairs replay (the fixture is bounded for this):
      // comparable iff the earlier subject's event is observed (or ties
      // on time with the other censored); concordant iff the higher
      // score sits on the earlier event
      """WITH a AS (SELECT CAST((event_id % 50) + 1 AS DOUBLE) AS t,
        |    CASE WHEN event_id % 3 <> 0 THEN 1 ELSE 0 END AS e,
        |    value AS s
        |  FROM events WHERE event_id < 2000),
        |p AS (SELECT x.s AS sa, y.s AS sb
        |  FROM a x JOIN a y
        |  ON x.e = 1 AND (x.t < y.t OR (x.t = y.t AND y.e = 0)))
        |SELECT (SELECT count(*) FROM a) AS n,
        |  count(*) AS comparable,
        |  CAST(sum(CASE WHEN sa > sb THEN 1 ELSE 0 END) AS BIGINT)
        |    AS concordant,
        |  CAST(sum(CASE WHEN sa = sb THEN 1 ELSE 0 END) AS BIGINT)
        |    AS tied_score,
        |  CAST(sum(CASE WHEN sa < sb THEN 1 ELSE 0 END) AS BIGINT)
        |    AS discordant,
        |  round((sum(CASE WHEN sa > sb THEN 1 ELSE 0 END)
        |    + 0.5 * sum(CASE WHEN sa = sb THEN 1 ELSE 0 END))
        |    / count(*), 8) AS c_index
        |FROM p""".stripMargin,
    "q252_krippendorff" ->
      // coincidence-matrix nominal alpha: observed coincidences weight
      // within-unit value pairs by 1/(m_u - 1); expectation from the
      // value marginals over units with 2+ ratings
      """WITH cells AS (SELECT event_id % 500 AS u, event_type AS v,
        |    count(*) AS c FROM events GROUP BY 1, 2),
        |mm AS (SELECT u, sum(c) AS m FROM cells GROUP BY u),
        |j AS (SELECT cells.u, cells.v, cells.c, mm.m
        |  FROM cells JOIN mm USING (u) WHERE mm.m >= 2),
        |pv AS (SELECT v, sum(c * (c - 1.0) / (m - 1)) AS occ,
        |    sum(c) AS nc FROM j GROUP BY v),
        |tot AS (SELECT sum(occ) AS occ, sum(nc) AS n,
        |    sum(nc * (nc - 1.0)) AS np, count(*) AS nv FROM pv)
        |SELECT (SELECT count(DISTINCT u) FROM j) AS units,
        |  CAST(n AS BIGINT) AS n, nv AS n_values,
        |  round(1.0 - occ / n, 8) AS d_o,
        |  round(1.0 - np / (n * (n - 1.0)), 8) AS d_e,
        |  round(1.0 - (1.0 - occ / n) / (1.0 - np / (n * (n - 1.0))), 8)
        |    AS alpha
        |FROM tot""".stripMargin,
    "q253_retrieval_eval" ->
      // per-query first-relevant rank + top-k relevant counts; queries
      // with no relevant item are counted but excluded from every mean
      """WITH a AS (SELECT event_id % 50 AS q, event_id AS i, value AS s,
        |    CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END AS r
        |  FROM events),
        |rk AS (SELECT *, row_number() OVER
        |    (PARTITION BY q ORDER BY s DESC, i ASC) AS pos FROM a),
        |pq AS (SELECT q, sum(r) AS nr,
        |    min(CASE WHEN r = 1 THEN pos END) AS fr,
        |    sum(CASE WHEN pos <= 10 THEN r ELSE 0 END) AS rt
        |  FROM rk GROUP BY q)
        |SELECT count(*) AS n_queries,
        |  CAST(sum(CASE WHEN nr > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_scored,
        |  round(avg(CASE WHEN nr > 0 THEN 1.0 / fr END), 8) AS mrr,
        |  round(avg(CASE WHEN nr > 0 THEN rt * 1.0 / nr END), 8)
        |    AS recall_at_k,
        |  round(avg(CASE WHEN nr > 0 THEN rt / 10.0 END), 8)
        |    AS precision_at_k,
        |  round(avg(CASE WHEN nr > 0 THEN
        |    (CASE WHEN rt > 0 THEN 1.0 ELSE 0.0 END) END), 8)
        |    AS hit_rate_at_k
        |FROM pq""".stripMargin,
    "q254_dagostino_k2" ->
      // the z-transform chain replayed term-identically from raw moments
      // (products written out, never pow, so both engines share every
      // intermediate bit on the integer-valued fixture)
      """WITH r AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    sum(l_quantity) AS s1,
        |    sum(l_quantity * l_quantity) AS s2,
        |    sum(l_quantity * l_quantity * l_quantity) AS s3,
        |    sum(l_quantity * l_quantity * l_quantity * l_quantity) AS s4
        |  FROM lineitem WHERE l_quantity IS NOT NULL),
        |m AS (SELECT n, s1 / n AS mu, s2 / n - (s1/n)*(s1/n) AS m2,
        |    s3/n - 3.0*(s1/n)*s2/n + 2.0*(s1/n)*(s1/n)*(s1/n) AS m3,
        |    s4/n - 4.0*(s1/n)*s3/n + 6.0*(s1/n)*(s1/n)*s2/n
        |      - 3.0*(s1/n)*(s1/n)*(s1/n)*(s1/n) AS m4
        |  FROM r),
        |g AS (SELECT n, m3 / pow(m2, 1.5) AS g1, m4 / (m2 * m2) AS b2
        |  FROM m),
        |sk AS (SELECT n, g1, b2,
        |    g1 * sqrt((n+1)*(n+3)/(6.0*(n-2))) AS y,
        |    -1.0 + sqrt(2.0 * (3.0*(n*n + 27*n - 70)*(n+1)*(n+3)
        |      / ((n-2)*(n+5)*(n+7)*(n+9)) - 1.0)) AS w2
        |  FROM g),
        |z1t AS (SELECT n, g1, b2,
        |    CASE WHEN y = 0 THEN 0.0
        |    ELSE (1.0/sqrt(0.5*ln(w2))) * ln(y/sqrt(2.0/(w2-1.0))
        |      + sqrt(y*y/(2.0/(w2-1.0)) + 1.0)) END AS z1
        |  FROM sk),
        |kt AS (SELECT n, g1, b2, z1,
        |    (b2 - 3.0*(n-1)/(n+1))
        |      / sqrt(24.0*n*(n-2)*(n-3)/((n+1)*(n+1)*(n+3)*(n+5))) AS xs,
        |    6.0*(n*n - 5*n + 2)/((n+7)*(n+9))
        |      * sqrt(6.0*(n+3)*(n+5)/(n*(n-2)*(n-3))) AS sb1
        |  FROM z1t),
        |kz AS (SELECT n, g1, b2, z1, xs,
        |    6.0 + 8.0/sb1 * (2.0/sb1 + sqrt(1.0 + 4.0/(sb1*sb1))) AS a
        |  FROM kt),
        |z2t AS (SELECT n, g1, b2, z1,
        |    ((1.0 - 2.0/(9.0*a))
        |      - cbrt((1.0 - 2.0/a)/(1.0 + xs*sqrt(2.0/(a - 4.0)))))
        |      / sqrt(2.0/(9.0*a)) AS z2
        |  FROM kz)
        |SELECT CAST(n AS BIGINT) AS n, round(g1, 8) AS skewness,
        |  round(b2 - 3.0, 8) AS ex_kurtosis, round(z1, 6) AS z_skew,
        |  round(z2, 6) AS z_kurt, round(z1*z1 + z2*z2, 4) AS k2
        |FROM z2t""".stripMargin,
    "q255_win_ratio" ->
      // all treated x control pairs, lexicographic outcome cascade
      """WITH a AS (SELECT l_orderkey % 2 AS t, l_quantity AS o1,
        |    l_extendedprice AS o2 FROM lineitem WHERE l_orderkey < 2000),
        |p AS (SELECT CASE WHEN x.o1 > y.o1 THEN 1 WHEN x.o1 < y.o1 THEN -1
        |    WHEN x.o2 > y.o2 THEN 1 WHEN x.o2 < y.o2 THEN -1
        |    ELSE 0 END AS v
        |  FROM (SELECT * FROM a WHERE t = 1) x
        |  CROSS JOIN (SELECT * FROM a WHERE t = 0) y)
        |SELECT (SELECT count(*) FROM a WHERE t = 1) AS n_treat,
        |  (SELECT count(*) FROM a WHERE t = 0) AS n_ctrl,
        |  count(*) AS pairs,
        |  CAST(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS wins,
        |  CAST(sum(CASE WHEN v = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS losses,
        |  CAST(sum(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ties,
        |  round(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END) * 1.0
        |    / sum(CASE WHEN v = -1 THEN 1 ELSE 0 END), 6) AS win_ratio,
        |  round((sum(CASE WHEN v = 1 THEN 1 ELSE 0 END)
        |      - sum(CASE WHEN v = -1 THEN 1 ELSE 0 END))
        |    / sqrt(CAST(sum(CASE WHEN v <> 0 THEN 1 ELSE 0 END) AS DOUBLE)),
        |    6) AS z
        |FROM p""".stripMargin,
    "q256_pagerank" -> pagerankOracle(10),
    "q258_adf_test" ->
      // lags=0 Dickey-Fuller: dy on y_lag with constant — explicit
      // moment closed form (no regr_* so every term is spelled out)
      """WITH cells AS (SELECT CAST(floor(event_id / 100) AS BIGINT) AS p,
        |    avg(value) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |l AS (SELECT p, y, lag(y) OVER (ORDER BY p) AS yl FROM cells),
        |d AS (SELECT y - yl AS dy, yl FROM l WHERE yl IS NOT NULL),
        |f AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(yl) AS sx,
        |    sum(yl * yl) AS sxx, sum(dy) AS sy, sum(dy * dy) AS syy,
        |    sum(yl * dy) AS sxy FROM d),
        |b AS (SELECT n,
        |    (sxy - sx * sy / n) / (sxx - sx * sx / n) AS beta,
        |    sxx - sx * sx / n AS cxx,
        |    (syy - sy * sy / n) AS cyy, (sxy - sx * sy / n) AS cxy
        |  FROM f),
        |s AS (SELECT n, beta,
        |    sqrt(((cyy - beta * cxy) / (n - 2)) / cxx) AS se
        |  FROM b)
        |SELECT (SELECT count(*) FROM cells) AS n_periods,
        |  CAST(n AS BIGINT) AS n_used, 0 AS lags,
        |  round(beta, 6) AS beta, round(se, 6) AS se,
        |  round(beta / se, 4) AS adf_stat,
        |  beta / se < -2.86 AS stationary_5pct
        |FROM s""".stripMargin,
    "q259_mmr" -> mmrOracle(5, 0.7),
    "q260_chow_test" ->
      // per-regime + pooled single-regressor SSE closed forms:
      // SSE = Cyy - Cxy^2/Cxx; F over k+1 = 2 restrictions
      """WITH a AS (SELECT l_extendedprice + CASE WHEN l_orderkey % 2 = 1
        |      THEN l_quantity * 0.5 ELSE 0.0 END AS y,
        |    l_quantity AS x, CAST(l_orderkey % 2 AS INT) AS g
        |  FROM lineitem),
        |m AS (SELECT g, CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
        |    sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy,
        |    sum(y*y) AS syy
        |  FROM a GROUP BY g),
        |p AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
        |    sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy,
        |    sum(y*y) AS syy
        |  FROM a),
        |sse AS (SELECT
        |  (SELECT (syy - sy*sy/n) - (sxy - sx*sy/n)*(sxy - sx*sy/n)
        |     / (sxx - sx*sx/n) FROM p) AS ssep,
        |  (SELECT (syy - sy*sy/n) - (sxy - sx*sy/n)*(sxy - sx*sy/n)
        |     / (sxx - sx*sx/n) FROM m WHERE g = 1) AS sse1,
        |  (SELECT (syy - sy*sy/n) - (sxy - sx*sy/n)*(sxy - sx*sy/n)
        |     / (sxx - sx*sx/n) FROM m WHERE g = 0) AS sse0,
        |  (SELECT n FROM m WHERE g = 1) AS n1,
        |  (SELECT n FROM m WHERE g = 0) AS n0)
        |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
        |  1 AS k,
        |  round(((ssep - sse1 - sse0) / 2)
        |    / ((sse1 + sse0) / (n1 + n0 - 4)), 2) AS f_stat
        |FROM sse""".stripMargin,
    "q261_breusch_pagan" ->
      // first fit's residuals squared, then the aux r2 closed form;
      // LM = n * r2_aux (Koenker's studentized form)
      """WITH a AS (SELECT l_extendedprice AS y, l_quantity AS x
        |  FROM lineitem),
        |m AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
        |    sum(y) AS sy, sum(x*x) AS sxx, sum(x*y) AS sxy FROM a),
        |b AS (SELECT n, (sxy - sx*sy/n)/(sxx - sx*sx/n) AS beta,
        |    sy/n - (sxy - sx*sy/n)/(sxx - sx*sx/n) * sx/n AS alpha
        |  FROM m),
        |r AS (SELECT a.x,
        |    (a.y - b.alpha - b.beta*a.x)*(a.y - b.alpha - b.beta*a.x) AS u
        |  FROM a, b),
        |m2 AS (SELECT CAST(count(*) AS DOUBLE) AS n, sum(x) AS sx,
        |    sum(u) AS su, sum(x*x) AS sxx, sum(x*u) AS sxu,
        |    sum(u*u) AS suu FROM r)
        |SELECT CAST(n AS BIGINT) AS n, 1 AS k,
        |  round((sxu - sx*su/n)*(sxu - sx*su/n)
        |    / ((sxx - sx*sx/n)*(suu - su*su/n)), 6) AS r2_aux,
        |  round(n * (sxu - sx*su/n)*(sxu - sx*su/n)
        |    / ((sxx - sx*sx/n)*(suu - su*su/n)), 2) AS lm
        |FROM m2""".stripMargin,
    "q262_k_anonymity" ->
      // equivalence classes over the quasi-id tuple; min size vs k
      """WITH cells AS (SELECT c_nationkey, c_mktsegment, count(*) AS c
        |  FROM customer GROUP BY 1, 2)
        |SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS classes,
        |  min(c) AS min_class_size, 10 AS k,
        |  CAST(sum(CASE WHEN c < 10 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS violating_classes,
        |  CAST(sum(CASE WHEN c < 10 THEN c ELSE 0 END) AS BIGINT)
        |    AS violating_rows,
        |  min(c) >= 10 AS k_anonymous
        |FROM cells""".stripMargin,
    "q263_mmd_rff" ->
      // per-(group, feature) mean of sqrt(2/D) cos(w_f . v + b_f) with
      // w from the SAME integer-modular Box-Muller both engines derive;
      // MMD^2 = sum_f (zbar_x - zbar_y)^2
      """WITH v AS (SELECT CAST(label < 5 AS INT) AS g,
        |    CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |zf AS (SELECT g, f.f AS f,
        |    avg(sqrt(2.0/32) * cos(list_sum([
        |      sqrt(-2 * ln(((f.f*2654435761 + (i-1)*40503 + 17) % 1048576
        |          + 1) / 1048577.0))
        |        * cos(2*pi() * (((f.f*1099087573 + (i-1)*2654435761 + 31)
        |            % 1048576 + 1) / 1048577.0))
        |        * sqrt(2*0.015625) * e[i]
        |      for i in range(1, len(e)+1)])
        |      + 2*pi() * ((f.f*40503 + 7) % 1048576) / 1048576.0)) AS z,
        |    count(*) AS n
        |  FROM v CROSS JOIN (SELECT unnest(range(32)) AS f) f
        |  GROUP BY g, f.f),
        |d AS (SELECT f, max(CASE WHEN g = 1 THEN z END) AS zx,
        |    max(CASE WHEN g = 0 THEN z END) AS zy,
        |    max(CASE WHEN g = 1 THEN n END) AS nx,
        |    max(CASE WHEN g = 0 THEN n END) AS ny
        |  FROM zf GROUP BY f)
        |SELECT max(nx) AS n_x, max(ny) AS n_y, 32 AS features,
        |  0.015625 AS gamma,
        |  round(sum((zx - zy)*(zx - zy)), 8) AS mmd2
        |FROM d""".stripMargin,
    "q264_cochran_armitage" ->
      // dose cells -> the trend statistic's moment closed form
      """WITH a AS (SELECT CAST(event_id % 4 AS DOUBLE) AS w,
        |    CASE WHEN event_id % 100 < 40 + (event_id % 4) * 5
        |      THEN 1 ELSE 0 END AS y
        |  FROM events),
        |cells AS (SELECT w, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(y) AS DOUBLE) AS r FROM a GROUP BY w),
        |m AS (SELECT sum(n) AS nn, sum(r) AS rr, sum(n*w) AS snw,
        |    sum(n*w*w) AS snw2, sum(r*w) AS srw, count(*) AS k
        |  FROM cells),
        |f AS (SELECT nn, k, rr/nn AS pbar,
        |    srw - (rr/nn) * snw AS t,
        |    (rr/nn) * (1 - rr/nn) * (snw2 - snw*snw/nn) AS v
        |  FROM m)
        |SELECT CAST(nn AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |  round(pbar, 8) AS pooled_rate, round(t, 4) AS t,
        |  round(v, 4) AS var_t, round(t / sqrt(v), 6) AS z
        |FROM f""".stripMargin,
    "q265_auc_ci" ->
      // distinct-score cells, placement values by cumulative windows,
      // DeLong variances as weighted cell variances
      """WITH a AS (SELECT CASE WHEN event_id % 3 = 0 THEN 1 ELSE 0 END
        |      AS y,
        |    value + CASE WHEN event_id % 3 = 0 THEN 20.0 ELSE 0.0 END AS s
        |  FROM events),
        |cells AS (SELECT s AS v, CAST(sum(y) AS DOUBLE) AS np,
        |    CAST(sum(1 - y) AS DOUBLE) AS nn FROM a GROUP BY s),
        |c2 AS (SELECT v, np, nn,
        |    coalesce(sum(nn) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS neg_below,
        |    sum(np) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_pos
        |  FROM cells),
        |tot AS (SELECT sum(np) AS n1, sum(nn) AS n0 FROM cells),
        |pv AS (SELECT np, nn,
        |    (neg_below + 0.5 * nn) / t.n0 AS v10,
        |    ((t.n1 - cum_pos) + 0.5 * np) / t.n1 AS v01
        |  FROM c2, tot t),
        |au AS (SELECT sum(np * v10) / t.n1 AS auc FROM pv, tot t
        |  GROUP BY t.n1),
        |se AS (SELECT sqrt(
        |    (sum(np * (v10 - au.auc) * (v10 - au.auc)) / (t.n1 - 1)) / t.n1
        |    + (sum(nn * (v01 - au.auc) * (v01 - au.auc)) / (t.n0 - 1)) / t.n0)
        |      AS se
        |  FROM pv, tot t, au GROUP BY t.n1, t.n0)
        |SELECT CAST(t.n1 AS BIGINT) AS n_pos, CAST(t.n0 AS BIGINT) AS n_neg,
        |  round(au.auc, 8) AS auc, round(se.se, 8) AS se,
        |  round(greatest(0.0, au.auc - 1.959963984540054 * se.se), 6)
        |    AS ci_low,
        |  round(least(1.0, au.auc + 1.959963984540054 * se.se), 6)
        |    AS ci_high
        |FROM tot t, au, se""".stripMargin,
    "q266_g_test" ->
      // cell counts -> marginals -> 2 sum O ln(O/E); zero cells drop out
      """WITH cells AS (SELECT l_returnflag AS a, l_linestatus AS b,
        |    count(*) AS c FROM lineitem GROUP BY 1, 2),
        |rt AS (SELECT a, sum(c) AS r FROM cells GROUP BY a),
        |ct AS (SELECT b, sum(c) AS t FROM cells GROUP BY b),
        |n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM cells),
        |g AS (SELECT 2.0 * sum(c * ln(c / (rt.r * ct.t / n.n))) AS g2
        |  FROM cells JOIN rt USING (a) JOIN ct USING (b), n)
        |SELECT CAST(n.n AS BIGINT) AS n,
        |  (SELECT count(*) FROM rt) AS n_rows,
        |  (SELECT count(*) FROM ct) AS n_cols,
        |  ((SELECT count(*) FROM rt) - 1)
        |    * ((SELECT count(*) FROM ct) - 1) AS dof,
        |  round(g.g2, 4) AS g2
        |FROM n, g""".stripMargin,
    "q267_dedup_rank_election" ->
      // the planted star graph makes each dup component's rep a CLOSED
      // FORM (its hub — the unique in-linked, hence max-PageRank,
      // member): blob b (id % 4 = b, straddlers carved out) -> b + 4,
      // the 8 straddlers (id % 250 in {13, 14}) -> 514
      """WITH a AS (SELECT event_id AS vid,
        |    CASE WHEN event_id % 250 IN (13, 14) THEN 514
        |         ELSE (event_id % 4) + 4 END AS rep
        |  FROM events WHERE event_id < 1000)
        |SELECT CAST(rep AS BIGINT) AS rep_id, count(*) AS n_members
        |FROM a GROUP BY rep ORDER BY rep""".stripMargin,
    "q272_cox_zph" ->
      // pinned sf0.01 score-test statistics (the q142 idiom: the test
      // rides the Newton fit, which has no closed SQL form); the fixture
      // is proportional by construction so the small chisq is the point
      """SELECT 'GLOBAL' AS term, CAST(0.7083 AS DOUBLE) AS chisq,
        |  CAST(2.0 AS DOUBLE) AS df, CAST(NULL AS DOUBLE) AS theta,
        |  '0.01' AS oracle_sf
        |UNION ALL SELECT 'x1', CAST(0.4026 AS DOUBLE),
        |  CAST(1.0 AS DOUBLE), CAST(-0.000822 AS DOUBLE), '0.01'
        |UNION ALL SELECT 'x2', CAST(0.3002 AS DOUBLE),
        |  CAST(1.0 AS DOUBLE), CAST(-0.000414 AS DOUBLE), '0.01'
        |ORDER BY term""".stripMargin,
    "q274_cox_ph_strat" ->
      // pinned sf0.01 stratified-Newton estimates (q142 idiom); n and
      // n_events are live closed forms (every event row is its own cell)
      """WITH m AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(l_linenumber % 2) AS BIGINT) AS ne FROM lineitem)
        |SELECT 'x1' AS term, CAST(0.018348 AS DOUBLE) AS estimate,
        |  CAST(0.018591 AS DOUBLE) AS stderr, n, ne AS n_events,
        |  '0.01' AS oracle_sf FROM m
        |UNION ALL SELECT 'x2', CAST(-0.001792 AS DOUBLE),
        |  CAST(0.010801 AS DOUBLE), n, ne, '0.01' FROM m
        |ORDER BY term""".stripMargin,
    "q276_rmst_diff" ->
      // the q177 KM window chain per binary arm, then the difference,
      // pooled se, z and CI close as arithmetic over the two arm rows
      """WITH s AS (SELECT CAST(l_orderkey % 2 AS INT) AS arm,
        |              CAST(l_quantity AS INT) AS time,
        |              CAST(l_linenumber % 2 AS INT) AS event FROM lineitem),
        |g AS (SELECT arm, time, sum(event) AS d, count(*) AS c
        |      FROM s GROUP BY 1, 2),
        |o AS (SELECT arm, time, d, c,
        |        sum(c) OVER (PARTITION BY arm ORDER BY time
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
        |      FROM g),
        |t AS (SELECT arm, sum(c) AS tot FROM g GROUP BY 1),
        |r AS (SELECT o.arm, time, d, c, tot - cumc + c AS n_risk
        |      FROM o JOIN t ON o.arm = t.arm),
        |km AS (SELECT arm, time, d, c, n_risk,
        |  exp(sum(ln(1.0 - d * 1.0 / n_risk))
        |    OVER (PARTITION BY arm ORDER BY time
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS surv
        |  FROM r),
        |leq AS (SELECT *, CAST(time AS DOUBLE) AS td FROM km
        |  WHERE time <= 40.0),
        |e AS (SELECT arm, td, d, n_risk, surv,
        |    coalesce(least(lead(td) OVER (PARTITION BY arm ORDER BY td),
        |      40.0), 40.0) AS nxt,
        |    min(td) OVER (PARTITION BY arm) AS frst
        |  FROM leq),
        |e2 AS (SELECT arm, td, d, n_risk, frst,
        |    surv * (nxt - td) AS contrib FROM e),
        |e3 AS (SELECT arm, td, d, n_risk, frst, contrib,
        |    frst + sum(contrib) OVER (PARTITION BY arm) AS total,
        |    coalesce(sum(contrib) OVER (PARTITION BY arm ORDER BY td
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
        |      AS prefix
        |  FROM e2),
        |e4 AS (SELECT arm, d, total,
        |    total - (frst + prefix) AS aj,
        |    CASE WHEN d > 0 AND n_risk > d
        |      THEN (total - (frst + prefix)) * (total - (frst + prefix))
        |        * d / (n_risk * (n_risk - d)) ELSE 0.0 END AS vterm
        |  FROM e3),
        |ga AS (SELECT arm, max(total) AS rmst, sum(vterm) AS v
        |    FROM e4 GROUP BY 1),
        |tn AS (SELECT arm, sum(c) AS n FROM g GROUP BY 1),
        |f AS (SELECT
        |    max(CASE WHEN ga.arm = 0 THEN ga.rmst END) AS r0,
        |    max(CASE WHEN ga.arm = 1 THEN ga.rmst END) AS r1,
        |    max(CASE WHEN ga.arm = 0 THEN ga.v END) AS v0,
        |    max(CASE WHEN ga.arm = 1 THEN ga.v END) AS v1,
        |    max(CASE WHEN tn.arm = 0 THEN tn.n END) AS n0,
        |    max(CASE WHEN tn.arm = 1 THEN tn.n END) AS n1
        |  FROM ga JOIN tn ON ga.arm = tn.arm)
        |SELECT 40.0 AS tau, CAST(n0 AS BIGINT) AS n0,
        |  CAST(n1 AS BIGINT) AS n1,
        |  round(r0, 6) AS rmst0, round(r1, 6) AS rmst1,
        |  round(r1 - r0, 6) AS diff, round(sqrt(v0 + v1), 6) AS se,
        |  round((r1 - r0) / sqrt(v0 + v1), 4) AS z,
        |  round(r1 - r0 - 1.959963984540054 * sqrt(v0 + v1), 6) AS lower,
        |  round(r1 - r0 + 1.959963984540054 * sqrt(v0 + v1), 6) AS upper
        |FROM f""".stripMargin,
    "q275_cox_survival" ->
      // Breslow baseline at the GIVEN beta: suffix risk sum desc, hazard
      // prefix sum asc, survival at the profile's risk score — all live
      """WITH b AS (SELECT CAST(l_quantity AS DOUBLE) AS t,
        |    l_linenumber % 2 AS ev,
        |    exp(0.02 * (l_discount * 10.0) - 0.01 * (l_orderkey % 2))
        |      AS w
        |  FROM lineitem),
        |cells AS (SELECT t, CAST(sum(ev) AS DOUBLE) AS d, sum(w) AS a0
        |  FROM b GROUP BY t),
        |suff AS (SELECT t, d, sum(a0) OVER (ORDER BY t DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s0
        |  FROM cells),
        |h AS (SELECT t, d, s0, sum(d / s0) OVER (ORDER BY t ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS h0
        |  FROM suff WHERE d > 0)
        |SELECT t AS time, CAST(d AS BIGINT) AS n_events,
        |  round(s0, 4) AS s0, round(h0, 6) AS h0_cum,
        |  round(exp(-h0 * exp(0.02 * 5.0 - 0.01 * 1.0)), 6) AS survival
        |FROM h ORDER BY time""".stripMargin,
    "q271_weighted_kappa" ->
      // cells + full marginal grid; quadratic agreement weights from
      // value distance (all 5 labels present on both sides, so sorted-
      // union index == value); po/pe/kappa and the Fleiss-Cohen-Everitt
      // variance as the same cell-scale closed forms
      """WITH x AS (SELECT CAST(event_id % 5 AS DOUBLE) AS a,
        |    CAST((event_id % 5 + CASE WHEN event_id % 7 = 0 THEN 1
        |      ELSE 0 END + CASE WHEN event_id % 11 = 0 THEN 2 ELSE 0 END)
        |      % 5 AS DOUBLE) AS b
        |  FROM events),
        |cells AS (SELECT a, b, count(*) AS c FROM x GROUP BY a, b),
        |nn AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM cells),
        |pa AS (SELECT a, sum(c) AS ca FROM cells GROUP BY a),
        |pb AS (SELECT b, sum(c) AS cb FROM cells GROUP BY b),
        |grid AS (SELECT pa.a, pb.b, pa.ca / nn.n AS pia,
        |    pb.cb / nn.n AS pjb,
        |    1 - ((pa.a - pb.b) / 4) * ((pa.a - pb.b) / 4) AS w
        |  FROM pa, pb, nn),
        |po AS (SELECT sum((1 - ((a - b) / 4) * ((a - b) / 4)) * c)
        |    / (SELECT n FROM nn) AS po FROM cells),
        |pe AS (SELECT sum(w * pia * pjb) AS pe FROM grid),
        |wa AS (SELECT a, sum(pjb * w) AS wai FROM grid GROUP BY a),
        |wb AS (SELECT b, sum(pia * w) AS wbj FROM grid GROUP BY b),
        |s2 AS (SELECT sum((c / nn.n) * pow(
        |      (1 - ((cells.a - cells.b) / 4) * ((cells.a - cells.b) / 4))
        |        * (1 - pe.pe) - (wa.wai + wb.wbj) * (1 - po.po), 2))
        |    AS s2
        |  FROM cells JOIN wa USING (a) JOIN wb USING (b), nn, pe, po),
        |f AS (SELECT nn.n AS n, po.po AS po, pe.pe AS pe,
        |    (po.po - pe.pe) / (1 - pe.pe) AS kap,
        |    sqrt(greatest(0.0, (s2.s2 - pow(po.po * pe.pe - 2 * pe.pe
        |      + po.po, 2)) / (nn.n * pow(1 - pe.pe, 4)))) AS se
        |  FROM nn, po, pe, s2)
        |SELECT CAST(n AS BIGINT) AS n, 5 AS categories,
        |  'quadratic' AS weighting,
        |  round(po, 8) AS po_w, round(pe, 8) AS pe_w,
        |  round(kap, 8) AS kappa_w, round(se, 8) AS se,
        |  round(kap / se, 4) AS z
        |FROM f""".stripMargin,
    "q268_ope" ->
      // the three estimators' moment closed forms, replayed term-shaped
      // (same max(0,.) guards, same variance expressions)
      """WITH a AS (SELECT (event_id % 4 + 2) / 10.0 AS pl,
        |    (event_id % 5 + 1) / 10.0 AS pt,
        |    CAST(event_id % 7 AS DOUBLE) AS r,
        |    (event_id % 3) * 0.5 AS q
        |  FROM events),
        |b AS (SELECT least(pt / pl, 2.0) AS w, pt / pl AS wraw, r, q
        |  FROM a),
        |m AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    sum(w) AS sw, sum(w*w) AS sww, sum(w*r) AS swr,
        |    sum(w*w*r) AS swwr, sum(w*r*w*r) AS swr2,
        |    sum(q + w*(r - q)) AS sd,
        |    sum((q + w*(r - q)) * (q + w*(r - q))) AS sd2,
        |    CAST(sum(CASE WHEN wraw > 2.0 THEN 1 ELSE 0 END) AS DOUBLE)
        |      AS clipped
        |  FROM b)
        |SELECT CAST(n AS BIGINT) AS n,
        |  round(sw * sw / sww, 4) AS ess,
        |  round(clipped / n, 8) AS clipped_share,
        |  round(swr / n, 8) AS ips,
        |  round(sqrt(greatest(0.0, (swr2 - n * (swr/n) * (swr/n))
        |    / (n - 1)) / n), 8) AS ips_se,
        |  round(swr / sw, 8) AS snips,
        |  round(sqrt(greatest(0.0, swr2 - 2 * (swr/sw) * swwr
        |    + (swr/sw) * (swr/sw) * sww)) / sw, 8) AS snips_se,
        |  round(sd / n, 8) AS dr,
        |  round(sqrt(greatest(0.0, (sd2 - n * (sd/n) * (sd/n))
        |    / (n - 1)) / n), 8) AS dr_se
        |FROM m""".stripMargin,
    "q269_neg_bin_reg" ->
      // saturated NB2 closed form: arm means are the MLE for ANY
      // positive working weight, alpha = sum((y-m)^2 - m)/sum(m^2) from
      // the Poisson pilot (= arm means), W_k = n_k m_k/(1 + alpha m_k),
      // var(b0) = 1/W0, var(b1) = 1/W0 + 1/W1
      """WITH a AS (SELECT CASE WHEN event_id % 6 = 3 THEN 1.0
        |      WHEN event_id % 6 = 4 THEN 2.0
        |      WHEN event_id % 6 = 5 THEN 9.0 ELSE 0.0 END AS y,
        |    CAST(event_id % 2 AS INT) AS x FROM events),
        |arm AS (SELECT x, count(*) AS cnt, avg(y) AS m FROM a GROUP BY x),
        |al AS (SELECT sum((y - m)*(y - m) - m) / sum(m * m) AS alpha
        |  FROM a JOIN arm USING (x)),
        |w AS (SELECT
        |    (SELECT cnt * m / (1 + al.alpha * m) FROM arm WHERE x = 0)
        |      AS w0,
        |    (SELECT cnt * m / (1 + al.alpha * m) FROM arm WHERE x = 1)
        |      AS w1,
        |    al.alpha AS alpha FROM al),
        |ase AS (SELECT sqrt(
        |    sum((((y-m)*(y-m) - m)/m - al.alpha*m)
        |      * (((y-m)*(y-m) - m)/m - al.alpha*m))
        |      / (count(*) - 1) / sum(m*m)) AS alpha_se
        |  FROM a JOIN arm USING (x), al GROUP BY al.alpha),
        |ll AS (SELECT
        |    sum(y*ln(m) - m - lgamma(y + 1)) AS ll_pois,
        |    sum(lgamma(y + 1/al.alpha) - lgamma(1/al.alpha)
        |      - lgamma(y + 1)
        |      + (1/al.alpha)*ln((1/al.alpha)/(1/al.alpha + m))
        |      + y*ln(m/(1/al.alpha + m))) AS ll_nb
        |  FROM a JOIN arm USING (x), al GROUP BY al.alpha),
        |b AS (SELECT
        |    ln((SELECT m FROM arm WHERE x = 1)
        |      / (SELECT m FROM arm WHERE x = 0)) AS b1,
        |    ln((SELECT m FROM arm WHERE x = 0)) AS b0,
        |    (SELECT count(*) FROM a) AS n)
        |SELECT 'x' AS term, round(b1, 6) AS estimate,
        |  round(sqrt(1.0/w0 + 1.0/w1), 6) AS stderr,
        |  round(alpha, 6) AS alpha, round(alpha_se, 6) AS alpha_se,
        |  round(2*(ll_nb - ll_pois), 4) AS lr_stat, n
        |FROM b, w, ase, ll
        |UNION ALL
        |SELECT '(intercept)', round(b0, 6), round(sqrt(1.0/w0), 6),
        |  round(alpha, 6), round(alpha_se, 6),
        |  round(2*(ll_nb - ll_pois), 4), n
        |FROM b, w, ase, ll
        |ORDER BY term""".stripMargin,
    "q270_isotonic_calibrate" ->
      // the planted inversion makes the PAVA fit a closed form: levels
      // 4 and 5 pool to their weighted mean, every other level keeps
      // its own rate (margins guarantee no cascade)
      """WITH a AS (SELECT CAST(event_id % 10 AS DOUBLE) AS s,
        |    CASE WHEN (event_id // 10) % 20 <
        |      [2, 4, 6, 8, 10, 9, 12, 14, 16, 18][(event_id % 10) + 1]
        |    THEN 1 ELSE 0 END AS y
        |  FROM events),
        |cells AS (SELECT s, count(*) AS n, sum(y) AS pos,
        |    avg(CAST(y AS DOUBLE)) AS rate FROM a GROUP BY s),
        |pool AS (SELECT sum(pos) * 1.0 / sum(n) AS pm FROM cells
        |  WHERE s IN (4, 5))
        |SELECT s AS score, n, round(rate, 8) AS raw_rate,
        |  round(CASE WHEN s IN (4, 5) THEN pool.pm ELSE rate END, 8)
        |    AS calibrated
        |FROM cells, pool ORDER BY s""".stripMargin,
    "q273_isotonic_score" ->
      // q270's closed-form fit as a mapping table, applied to the
      // held-out grid with the step-function rule: fitted value of the
      // largest training score <= s, clamped to the first block below
      // range (the correlated-subquery ASOF)
      """WITH a AS (SELECT CAST(event_id % 10 AS DOUBLE) AS sc,
        |    CASE WHEN (event_id // 10) % 20 <
        |      [2, 4, 6, 8, 10, 9, 12, 14, 16, 18][(event_id % 10) + 1]
        |    THEN 1 ELSE 0 END AS y
        |  FROM events),
        |cells AS (SELECT sc, avg(CAST(y AS DOUBLE)) AS rate, sum(y) AS pos,
        |    count(*) AS n FROM a GROUP BY sc),
        |pool AS (SELECT sum(pos) * 1.0 / sum(n) AS pm FROM cells
        |  WHERE sc IN (4, 5)),
        |map AS (SELECT sc AS score,
        |    CASE WHEN sc IN (4, 5) THEN pool.pm ELSE rate END AS cal
        |  FROM cells, pool),
        |tgt AS (SELECT (event_id % 25) * 0.5 - 1.0 AS sc FROM events),
        |app AS (SELECT sc, coalesce(
        |    (SELECT cal FROM map WHERE map.score <= tgt.sc
        |     ORDER BY map.score DESC LIMIT 1),
        |    (SELECT cal FROM map ORDER BY score ASC LIMIT 1))
        |  AS calibrated FROM tgt)
        |SELECT sc AS score, round(calibrated, 8) AS calibrated,
        |  count(*) AS n
        |FROM app GROUP BY sc, calibrated ORDER BY score""".stripMargin,
    "q257_streaming_ph" ->
      // batch replay of the streaming semantics: per-metric cells minus
      // each metric's OPEN (max) period, then the q240 window chain
      // partitioned by metric
      """WITH cells AS (
        |  SELECT event_type AS m, CAST(floor(event_id / 500) AS BIGINT)
        |      AS p,
        |    count(*) AS ne, avg(value) AS x
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |keep AS (SELECT * FROM cells
        |  WHERE p < (SELECT max(p) FROM cells c2 WHERE c2.m = cells.m)),
        |rm AS (SELECT m, p, ne, x, avg(x) OVER w AS mu
        |  FROM keep WINDOW w AS (PARTITION BY m ORDER BY p
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |u AS (SELECT m, p, ne, x, sum(x - mu - 0.05) OVER w AS uu
        |  FROM rm WINDOW w AS (PARTITION BY m ORDER BY p
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |ph AS (SELECT m, p, ne, x, uu - min(uu) OVER w AS ph
        |  FROM u WINDOW w AS (PARTITION BY m ORDER BY p
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT m AS metric_id, p AS period, CAST(ne AS BIGINT) AS n_events,
        |  round(x, 6) AS metric, round(ph, 6) AS ph,
        |  ph > 10.0 AS is_alarm
        |FROM ph ORDER BY metric_id, period""".stripMargin,
    "q243_bowker_test" ->
      // off-diagonal cell pairing i<j; chisq = sum (nij-nji)^2/(nij+nji)
      """WITH b AS (SELECT event_id % 4 AS a,
        |    ((event_id % 4) + CASE WHEN event_id % 5 = 0 THEN 1 ELSE 0 END)
        |      % 4 AS b
        |  FROM events),
        |cells AS (SELECT CAST(a AS VARCHAR) AS a, CAST(b AS VARCHAR) AS b,
        |    count(*) AS c FROM b GROUP BY 1, 2),
        |off AS (SELECT least(a, b) AS i, greatest(a, b) AS j,
        |    sum(CASE WHEN a < b THEN c ELSE 0 END) AS nij,
        |    sum(CASE WHEN a > b THEN c ELSE 0 END) AS nji
        |  FROM cells WHERE a <> b GROUP BY 1, 2),
        |t AS (SELECT sum((nij - nji) * (nij - nji) * 1.0 / (nij + nji))
        |    AS chisq, count(*) AS df
        |  FROM off WHERE nij + nji > 0),
        |k AS (SELECT count(DISTINCT v) AS cats FROM (
        |    SELECT a AS v FROM cells UNION SELECT b FROM cells))
        |SELECT (SELECT CAST(sum(c) AS BIGINT) FROM cells) AS n,
        |  CAST(k.cats AS BIGINT) AS categories,
        |  round(t.chisq, 6) AS chisq, CAST(t.df AS BIGINT) AS df
        |FROM t, k""".stripMargin,
    "q244_lin_ccc" ->
      // population moments; ccc/c_b/shift closed forms
      """WITH b AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
        |    l_quantity * 0.9 + 2.0 + l_discount * 10.0 AS y FROM lineitem),
        |m AS (SELECT count(*) AS n, avg(x) AS mx, avg(y) AS my,
        |    var_pop(x) AS vx, var_pop(y) AS vy, covar_pop(x, y) AS cxy
        |  FROM b),
        |f AS (SELECT n, cxy / sqrt(vx * vy) AS pr,
        |    2.0 * cxy / (vx + vy + (mx - my) * (mx - my)) AS ccc,
        |    (mx - my) / pow(vx * vy, 0.25) AS u, sqrt(vx / vy) AS v
        |  FROM m)
        |SELECT CAST(n AS BIGINT) AS n, round(pr, 6) AS pearson_r,
        |  round(ccc, 6) AS ccc, round(ccc / pr, 6) AS c_b,
        |  round(u, 6) AS location_shift, round(v, 6) AS scale_shift
        |FROM f""".stripMargin,
    "q245_brier_decomposition" ->
      // Murphy terms over the 10 exact forecast cells
      """WITH b AS (SELECT ((event_id % 10) * 10 + 5) / 100.0 AS f,
        |    CASE WHEN (event_id * 13) % 100 < (event_id % 10) * 10 + 5
        |      THEN 1.0 ELSE 0.0 END AS y
        |  FROM events),
        |cells AS (SELECT f, count(*) AS nf, avg(y) AS o FROM b GROUP BY f),
        |t AS (SELECT sum(nf) AS n,
        |    sum(o * nf) / sum(nf) AS obar FROM cells),
        |terms AS (SELECT
        |    sum(nf * (f - o) * (f - o)) / (SELECT n FROM t) AS rel,
        |    sum(nf * (o - (SELECT obar FROM t)) * (o - (SELECT obar FROM t)))
        |      / (SELECT n FROM t) AS res
        |  FROM cells)
        |SELECT (SELECT CAST(n AS BIGINT) FROM t) AS n,
        |  round(rel - res + (SELECT obar * (1 - obar) FROM t), 8) AS brier,
        |  round(rel, 8) AS reliability, round(res, 8) AS resolution,
        |  round((SELECT obar * (1 - obar) FROM t), 8) AS uncertainty,
        |  round((SELECT obar FROM t), 8) AS base_rate
        |FROM terms""".stripMargin,
    "q246_ndcg" ->
      // the same two row_number windows (score desc / rel desc, item asc)
      """WITH b AS (SELECT event_id % 50 AS q, event_id AS item,
        |    ((event_id * 37) % 1000) / 1000.0 AS score,
        |    CAST((event_id * 13) % 4 AS DOUBLE) AS rel
        |  FROM events),
        |r AS (SELECT *,
        |    row_number() OVER (PARTITION BY q ORDER BY score DESC, item)
        |      AS pos,
        |    row_number() OVER (PARTITION BY q ORDER BY rel DESC, item)
        |      AS ipos
        |  FROM b),
        |d AS (SELECT q, sum((pow(2.0, rel) - 1) / log2(pos + 1.0)) AS dcg
        |  FROM r WHERE pos <= 10 GROUP BY q),
        |i AS (SELECT q, sum((pow(2.0, rel) - 1) / log2(ipos + 1.0)) AS idcg
        |  FROM r WHERE ipos <= 10 GROUP BY q),
        |c AS (SELECT q, count(*) AS n_items FROM b GROUP BY q)
        |SELECT c.q AS query, c.n_items,
        |  round(coalesce(d.dcg, 0.0), 6) AS dcg,
        |  round(coalesce(i.idcg, 0.0), 6) AS idcg,
        |  round(CASE WHEN coalesce(i.idcg, 0) > 0
        |    THEN d.dcg / i.idcg ELSE 0.0 END, 6) AS ndcg
        |FROM c LEFT JOIN d ON c.q = d.q LEFT JOIN i ON c.q = i.q
        |ORDER BY query""".stripMargin,
    "q247_flesch" ->
      // ws words, [.!?]+ sentence runs, vowel-group syllables — each a
      // regexp count; the clamp and minimums replayed exactly
      """WITH b AS (SELECT
        |    greatest(CASE WHEN length(trim(text)) = 0 THEN 0
        |      ELSE len(regexp_split_to_array(trim(text), '\s+')) END, 1)
        |      * 1.0 AS w,
        |    greatest(len(regexp_extract_all(text, '[.!?]+')), 1) * 1.0 AS s,
        |    len(regexp_extract_all(text, '[aeiouyAEIOUY]+')) * 1.0 AS vg
        |  FROM documents),
        |f AS (SELECT least(greatest(
        |    206.835 - 1.015 * (w / s) - 84.6 * (greatest(vg, w) / w),
        |    -200.0), 121.22) AS fre FROM b)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  round(avg(fre), 4) AS avg_fre, round(min(fre), 4) AS min_fre,
        |  round(max(fre), 4) AS max_fre
        |FROM f""".stripMargin,
    "q242_fleming_harrington" ->
      // q108's at-risk construction + the pooled-KM S(t−) weight window
      // over event times; rho = 0, gamma = 1 → w = 1 − S(t−)
      """WITH s AS (SELECT CAST(l_orderkey % 2 AS INT) AS arm,
        |              CAST(l_quantity AS INT) AS time,
        |              CAST(l_linenumber % 2 AS INT) AS event FROM lineitem),
        |g AS (SELECT time,
        |        sum(CASE WHEN arm = 1 THEN event ELSE 0 END) AS d1,
        |        sum(CASE WHEN arm = 0 THEN event ELSE 0 END) AS d0,
        |        sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS x1,
        |        sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS x0
        |      FROM s GROUP BY 1),
        |o AS (SELECT *,
        |        (SELECT sum(x1) FROM g) - sum(x1) OVER w + x1 AS n1,
        |        (SELECT sum(x0) FROM g) - sum(x0) OVER w + x0 AS n0
        |      FROM g WINDOW w AS (ORDER BY time
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |e AS (SELECT time, d1, d0, n1, n0 FROM o WHERE d1 + d0 > 0),
        |w2 AS (SELECT *, exp(coalesce(sum(ln(1.0 - (d1 + d0) * 1.0
        |          / (n1 + n0))) OVER (ORDER BY time
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |        0.0)) AS sp
        |      FROM e),
        |f AS (SELECT d1, (1.0 - sp) AS wt,
        |        (d1 + d0) * n1 * 1.0 / (n1 + n0) AS e1,
        |        CASE WHEN n1 + n0 > 1 THEN
        |          (d1 + d0) * (n1 * 1.0 / (n1 + n0)) * (n0 * 1.0 / (n1 + n0))
        |            * (n1 + n0 - d1 - d0) / (n1 + n0 - 1.0) ELSE 0.0 END AS v
        |      FROM w2)
        |SELECT round(sum(wt * d1), 6) AS observed1_w,
        |  round(sum(wt * e1), 6) AS expected1_w,
        |  round(sum(wt * wt * v), 6) AS variance_w,
        |  round((sum(wt * d1) - sum(wt * e1)) * (sum(wt * d1) - sum(wt * e1))
        |    / sum(wt * wt * v), 6) AS chi2
        |FROM f""".stripMargin,
    "q225_binomial_test" ->
      // the full n+1 support via generate_series + lgamma; R's
      // minimum-likelihood two-sided rule with the 1+1e-7 tie tolerance
      """WITH b AS (SELECT CASE WHEN
        |    (CAST(floor(event_id / 2) AS BIGINT) * 13) % 50 < 13
        |    THEN 1 ELSE 0 END AS y
        |  FROM events WHERE event_id < 1000),
        |m AS (SELECT count(*) AS n, sum(y) AS s FROM b),
        |lp AS (SELECT g.k AS k, m.s,
        |    lgamma(m.n + 1.0) - lgamma(g.k + 1.0) - lgamma(m.n - g.k + 1.0)
        |    + g.k * ln(CAST(0.3 AS DOUBLE))
        |    + (m.n - g.k) * ln(CAST(0.7 AS DOUBLE)) AS l
        |  FROM m, generate_series(0, 1000) g(k) WHERE g.k <= m.n),
        |obs AS (SELECT l AS lobs FROM lp WHERE k = s)
        |SELECT CAST(m.n AS BIGINT) AS n, CAST(m.s AS BIGINT) AS successes,
        |  round(CAST(m.s AS DOUBLE) / m.n, 6) AS rate,
        |  round(least(1.0, (SELECT sum(exp(l)) FROM lp, obs
        |    WHERE l <= lobs + ln(1.0000001))), 8) AS p_two_sided,
        |  round(least(1.0, (SELECT sum(exp(lp.l)) FROM lp, m
        |    WHERE lp.k >= m.s)), 8) AS p_greater
        |FROM m""".stripMargin,
    "q226_runs_test" ->
      // exact median split over period cells, lag-window run starts
      """WITH cells AS (
        |  SELECT CAST(floor(event_id / 100) AS BIGINT) AS period,
        |    avg(value + CASE WHEN CAST(floor(event_id / 100) AS BIGINT)
        |      % 10 < 5 THEN 4 ELSE 0 END) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |md AS (SELECT quantile_cont(y, 0.5) AS m FROM cells),
        |sg AS (SELECT period,
        |    CASE WHEN y > (SELECT m FROM md) THEN 1 ELSE 0 END AS s
        |  FROM cells WHERE y <> (SELECT m FROM md)),
        |rn AS (SELECT s, CASE WHEN lag(s) OVER (ORDER BY period) IS NULL
        |    OR lag(s) OVER (ORDER BY period) <> s THEN 1 ELSE 0 END AS nw
        |  FROM sg),
        |ag AS (SELECT count(*) AS n, sum(s) AS n1, sum(nw) AS runs FROM rn)
        |SELECT CAST(n AS BIGINT) AS n_periods, CAST(n1 AS BIGINT) AS n_above,
        |  CAST(n - n1 AS BIGINT) AS n_below, CAST(runs AS BIGINT) AS runs,
        |  round(2.0 * n1 * (n - n1) / n + 1, 6) AS expected_runs,
        |  round((runs - (2.0 * n1 * (n - n1) / n + 1))
        |    / sqrt(2.0 * n1 * (n - n1) * (2.0 * n1 * (n - n1) - n)
        |      / (CAST(n AS DOUBLE) * n * (n - 1))), 4) AS z
        |FROM ag""".stripMargin,
    "q227_grubbs_test" ->
      // moments + the farther extreme; G closed form
      """WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
        |  UNION ALL SELECT 9.9e7),
        |m AS (SELECT count(*) AS n, avg(x) AS mu, stddev_samp(x) AS sd,
        |    max(x) AS mx, min(x) AS mn FROM b)
        |SELECT CAST(n AS BIGINT) AS n, round(mu, 4) AS mean,
        |  round(sd, 4) AS sd,
        |  round(CASE WHEN mx - mu >= mu - mn THEN mx ELSE mn END, 4)
        |    AS suspect,
        |  round(abs((CASE WHEN mx - mu >= mu - mn THEN mx ELSE mn END) - mu)
        |    / sd, 4) AS g
        |FROM m""".stripMargin,
    "q222_mad_outliers" ->
      // exact medians + the 17-digit consistency constant; fence counts
      """WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |m AS (SELECT quantile_cont(x, 0.5) AS med FROM b),
        |md AS (SELECT med, quantile_cont(abs(x - med), 0.5) AS mad
        |  FROM b, m GROUP BY med),
        |f AS (SELECT med, mad, mad / 0.67448975019608160 AS sig FROM md),
        |c AS (SELECT count(*) AS n,
        |    sum(CASE WHEN x < med - 3 * sig OR x > med + 3 * sig
        |      THEN 1 ELSE 0 END) AS o,
        |    min(CASE WHEN x >= med - 3 * sig AND x <= med + 3 * sig
        |      THEN x END) AS mnk,
        |    max(CASE WHEN x >= med - 3 * sig AND x <= med + 3 * sig
        |      THEN x END) AS mxk
        |  FROM b, f GROUP BY med, mad, sig)
        |SELECT CAST(n AS BIGINT) AS n, round(f.med, 4) AS median,
        |  round(f.mad, 4) AS mad, round(f.sig, 4) AS sigma_robust,
        |  CAST(o AS BIGINT) AS n_outliers,
        |  round(CAST(o AS DOUBLE) / n, 6) AS outlier_share,
        |  round(mnk, 4) AS min_kept, round(mxk, 4) AS max_kept
        |FROM c, f""".stripMargin,
    "q223_seasonal_strength" ->
      // phase means joined back over period cells; variance shares
      """WITH cells AS (
        |  SELECT CAST(floor(event_id / 100) AS BIGINT) AS period,
        |    avg(value + CASE WHEN CAST(floor(event_id / 100) AS BIGINT)
        |      % 7 = 2 THEN 20 ELSE 0 END) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |ph AS (SELECT period % 7 AS phase, avg(y) AS pm FROM cells
        |  GROUP BY 1),
        |j AS (SELECT c.y, p.pm FROM cells c
        |  JOIN ph p ON c.period % 7 = p.phase),
        |st AS (SELECT count(*) AS t, var_samp(y) AS vt,
        |    var_samp(y - pm) AS vr, avg(y) AS mu FROM j),
        |pk AS (SELECT phase, pm FROM ph ORDER BY pm DESC, phase LIMIT 1)
        |SELECT CAST(t AS BIGINT) AS n_periods, CAST(7 AS BIGINT) AS season,
        |  round(vt, 4) AS var_total, round(vr, 4) AS var_residual,
        |  round(greatest(0.0, 1.0 - vr / vt), 6) AS strength,
        |  pk.phase AS peak_phase, round(pk.pm - st.mu, 4) AS peak_lift
        |FROM st, pk""".stripMargin,
    "q224_cluster_power" ->
      // q173's icc closed forms + sigma + the 17-digit z constants
      """WITH cells AS (SELECT user_id AS c, count(*) AS m,
        |    sum(CAST(value AS DOUBLE)) AS s,
        |    sum(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)) AS ss
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY 1),
        |a AS (SELECT CAST(sum(m) AS DOUBLE) AS n, count(*) AS k,
        |    CAST(sum(m*m) AS DOUBLE) AS m2, sum(s) AS s, sum(ss) AS ss,
        |    sum(s*s/m) AS sb
        |  FROM cells),
        |f AS (SELECT n, k,
        |    (sb - s*s/n) / (k - 1) AS msb,
        |    (ss - sb) / (n - k) AS msw,
        |    (n - m2/n) / (k - 1) AS m0,
        |    sqrt((ss - s*s/n) / (n - 1)) AS sd
        |  FROM a),
        |g AS (SELECT n, k, sd,
        |    (msb - msw) / (msb + (m0 - 1.0) * msw) AS rho
        |  FROM f),
        |h AS (SELECT n, k, sd, rho,
        |    1.0 + (n / k - 1.0) * greatest(0.0, rho) AS deff,
        |    n / k AS mbar
        |  FROM g),
        |p AS (SELECT *, 2.0 * sd * sqrt(deff / n) AS sedt FROM h)
        |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS n_clusters,
        |  round(sd, 6) AS sigma, round(rho, 6) AS icc,
        |  round(deff, 6) AS deff, round(sedt, 6) AS se_diff,
        |  round(2.0 / sedt - 1.9599639845400540, 4) AS z_power,
        |  CAST(ceil((1.9599639845400540 + 0.84162123357291440)
        |    * (1.9599639845400540 + 0.84162123357291440)
        |    * 2.0 * sd * sd * deff / (4.0 * mbar)) AS BIGINT)
        |    AS clusters_per_arm_80,
        |  CAST(ceil((1.9599639845400540 + 1.2815515655446008)
        |    * (1.9599639845400540 + 1.2815515655446008)
        |    * 2.0 * sd * sd * deff / (4.0 * mbar)) AS BIGINT)
        |    AS clusters_per_arm_90
        |FROM p""".stripMargin,
    "q221_overlap" ->
      // equal-width score cells per arm; shares, common support, OVL
      """WITH b AS (SELECT CAST(l_orderkey % 2 AS INT) AS t,
        |    (l_partkey % 97) / 193 +
        |      CASE WHEN l_orderkey % 2 = 1 THEN 0.3 ELSE 0.1 END AS s
        |  FROM lineitem),
        |cells AS (SELECT least(CAST(floor(s * 20) AS INT), 19) AS bin,
        |    sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS n0,
        |    sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS n1
        |  FROM b WHERE s >= 0 AND s <= 1 GROUP BY 1),
        |tot AS (SELECT sum(n0) AS t0, sum(n1) AS t1,
        |    sum(CASE WHEN n0 > 0 AND n1 > 0 THEN n0 + n1 ELSE 0 END)
        |      AS both FROM cells),
        |ov AS (SELECT sum(least(CAST(n0 AS DOUBLE) / tot.t0,
        |    CAST(n1 AS DOUBLE) / tot.t1)) AS ovl
        |  FROM cells, tot GROUP BY tot.t0, tot.t1)
        |SELECT bin, CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
        |  round(CAST(n0 AS DOUBLE) / tot.t0, 6) AS share0,
        |  round(CAST(n1 AS DOUBLE) / tot.t1, 6) AS share1,
        |  round(CAST(tot.both AS DOUBLE) / (tot.t0 + tot.t1), 6)
        |    AS common_support,
        |  round(ov.ovl, 6) AS ovl
        |FROM cells, tot, ov ORDER BY bin""".stripMargin,
    "q220_streaming_ewma" ->
      // batch replay of the streaming semantics: per-metric period cells
      // minus each metric's OPEN (max) period; causal prior mean/sd via
      // exclusive windows; the z recursion as a per-metric recursive CTE
      """WITH RECURSIVE cells AS (
        |  SELECT event_type AS m, CAST(floor(event_id / 500) AS BIGINT)
        |      AS p,
        |    count(*) AS ne, avg(value) AS x
        |  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        |keep AS (SELECT * FROM cells
        |  WHERE p < (SELECT max(p) FROM cells c2 WHERE c2.m = cells.m)),
        |idx AS (SELECT m, p, ne, x,
        |    row_number() OVER (PARTITION BY m ORDER BY p) - 1 AS i
        |  FROM keep),
        |pri AS (SELECT m, p, ne, x, i,
        |    count(*) OVER w AS np, avg(x) OVER w AS mp,
        |    stddev_samp(x) OVER w AS sp
        |  FROM idx
        |  WINDOW w AS (PARTITION BY m ORDER BY i
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |z(m, i, z) AS (
        |  SELECT m, i, x FROM idx WHERE i = 0
        |  UNION ALL
        |  SELECT idx.m, idx.i,
        |    CAST(0.25 AS DOUBLE) * idx.x + CAST(0.75 AS DOUBLE) * z.z
        |  FROM z JOIN idx ON idx.m = z.m AND idx.i = z.i + 1),
        |f AS (SELECT pri.m, pri.p, pri.ne, pri.x, z.z, pri.i,
        |    CASE WHEN pri.np = 0 THEN pri.x ELSE pri.mp END AS base,
        |    3 * (CASE WHEN pri.np >= 2 THEN pri.sp ELSE 0 END)
        |      * sqrt(CAST(0.25 AS DOUBLE) / 1.75
        |        * (1 - pow(CAST(0.75 AS DOUBLE), 2.0 * (pri.i + 1))))
        |      AS lim,
        |    pri.np, CASE WHEN pri.np >= 2 THEN pri.sp ELSE 0 END AS sd
        |  FROM pri JOIN z ON pri.m = z.m AND pri.i = z.i)
        |SELECT m AS metric_id, p AS period, CAST(ne AS BIGINT) AS n_events,
        |  round(x, 6) AS metric, round(z, 6) AS ewma,
        |  round(base, 6) AS baseline,
        |  round(base - lim, 6) AS limit_lower,
        |  round(base + lim, 6) AS limit_upper,
        |  (np >= 3 AND sd > 0 AND abs(z - base) > lim) AS is_anomaly
        |FROM f ORDER BY metric_id, period""".stripMargin,
    "q218_heaps_fit" ->
      // first-occurrence doc of each token, cumulative (N, V), ln-ln OLS
      """WITH tok AS (SELECT doc_id,
        |    unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents),
        |tk AS (SELECT doc_id, token FROM tok WHERE length(token) > 0),
        |pd AS (SELECT doc_id, count(*) AS nt FROM tk GROUP BY doc_id),
        |fo AS (SELECT fid, count(*) AS nv FROM (
        |    SELECT token, min(doc_id) AS fid FROM tk GROUP BY token)
        |  GROUP BY fid),
        |cells AS (SELECT pd.doc_id, pd.nt, coalesce(fo.nv, 0) AS nv
        |  FROM pd LEFT JOIN fo ON pd.doc_id = fo.fid),
        |cum AS (SELECT
        |    sum(nt) OVER w AS cn, sum(nv) OVER w AS cv
        |  FROM cells
        |  WINDOW w AS (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |m AS (SELECT CAST(count(*) AS DOUBLE) AS md, count(*) AS docs,
        |    max(cv) AS terms, max(cn) AS tot,
        |    sum(ln(cn)) AS sx, sum(ln(cv)) AS sy,
        |    sum(ln(cn) * ln(cv)) AS sxy, sum(ln(cn) * ln(cn)) AS sxx,
        |    sum(ln(cv) * ln(cv)) AS syy
        |  FROM cum)
        |SELECT CAST(docs AS BIGINT) AS docs, CAST(terms AS BIGINT) AS terms,
        |  CAST(tot AS BIGINT) AS total_tokens,
        |  round((sxy - sx*sy/md) / (sxx - sx*sx/md), 6) AS beta,
        |  round(exp((sy - (sxy - sx*sy/md)/(sxx - sx*sx/md)*sx)/md), 4)
        |    AS k,
        |  round(pow((sxy - sx*sy/md)/(sxx - sx*sx/md), 2)
        |    * (sxx - sx*sx/md) / (syy - sy*sy/md), 6) AS r2
        |FROM m""".stripMargin,
    "q219_kmeans_eval" ->
      // the q209 two-iteration Lloyd replay + the label join; purity and
      // NMI as closed forms over (cluster, label) cells
      """WITH init AS (SELECT row_number() OVER (ORDER BY vec_id) - 1
        |      AS cluster,
        |    CAST(embedding AS DOUBLE[]) AS cv
        |  FROM embeddings ORDER BY vec_id LIMIT 4),
        |a1 AS (SELECT e.vec_id, e.embedding, i.cluster,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), i.cv),
        |        i.cluster) AS rk
        |  FROM embeddings e, init i),
        |c1 AS (SELECT cluster, g.i AS pos,
        |    avg(CAST(embedding[g.i] AS DOUBLE)) AS v
        |  FROM a1, generate_series(1, 64) g(i) WHERE rk = 1
        |  GROUP BY cluster, g.i),
        |cl1 AS (SELECT cluster, list(v ORDER BY pos) AS cv FROM c1
        |  GROUP BY cluster),
        |a2 AS (SELECT e.vec_id, e.embedding, i.cluster,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), i.cv),
        |        i.cluster) AS rk
        |  FROM embeddings e, cl1 i),
        |c2 AS (SELECT cluster, g.i AS pos,
        |    avg(CAST(embedding[g.i] AS DOUBLE)) AS v
        |  FROM a2, generate_series(1, 64) g(i) WHERE rk = 1
        |  GROUP BY cluster, g.i),
        |cl2 AS (SELECT cluster, list(v ORDER BY pos) AS cv FROM c2
        |  GROUP BY cluster),
        |fin AS (SELECT e.vec_id, i.cluster,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), i.cv),
        |        i.cluster) AS rk
        |  FROM embeddings e, cl2 i),
        |cells AS (SELECT f.cluster, CAST(e.label AS VARCHAR) AS lbl,
        |    count(*) AS c
        |  FROM fin f JOIN embeddings e ON f.vec_id = e.vec_id
        |  WHERE f.rk = 1 GROUP BY f.cluster, lbl),
        |n AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM cells),
        |pc AS (SELECT cluster, sum(c) AS nc FROM cells GROUP BY cluster),
        |pl AS (SELECT lbl, sum(c) AS nl FROM cells GROUP BY lbl),
        |maj AS (SELECT cluster, lbl, c,
        |    row_number() OVER (PARTITION BY cluster
        |      ORDER BY c DESC, lbl DESC) AS r
        |  FROM cells),
        |pur AS (SELECT sum(c) / (SELECT n FROM n) AS purity FROM maj
        |  WHERE r = 1),
        |hc AS (SELECT -sum(nc/(SELECT n FROM n)
        |    * ln(nc/(SELECT n FROM n))) AS h FROM pc),
        |hl AS (SELECT -sum(nl/(SELECT n FROM n)
        |    * ln(nl/(SELECT n FROM n))) AS h FROM pl),
        |mi AS (SELECT sum(cells.c/(SELECT n FROM n)
        |    * ln((cells.c/(SELECT n FROM n))
        |      / ((pc.nc/(SELECT n FROM n)) * (pl.nl/(SELECT n FROM n)))))
        |    AS mi
        |  FROM cells JOIN pc ON cells.cluster = pc.cluster
        |  JOIN pl ON cells.lbl = pl.lbl)
        |SELECT CAST(pc.cluster AS INT) AS cluster,
        |  CAST(pc.nc AS BIGINT) AS n, maj.lbl AS majority_label,
        |  round(CAST(maj.c AS DOUBLE) / pc.nc, 6) AS cluster_purity,
        |  round(pur.purity, 6) AS purity,
        |  round(mi.mi / sqrt(hc.h * hl.h), 6) AS nmi
        |FROM pc JOIN maj ON pc.cluster = maj.cluster AND maj.r = 1,
        |  pur, hc, hl, mi
        |ORDER BY cluster""".stripMargin,
    "q212_dunn_test" ->
      // pooled window ranks -> k group cells -> pairwise z closed forms
      """WITH b AS (SELECT CAST(l_quantity AS DOUBLE) AS v,
        |    l_returnflag AS g FROM lineitem),
        |r AS (SELECT g, rank() OVER (ORDER BY v)
        |    + (count(*) OVER (PARTITION BY v) - 1) / CAST(2 AS DOUBLE) AS ar
        |  FROM b),
        |pg AS (SELECT g, count(*) AS ng, avg(ar) AS m FROM r GROUP BY g),
        |tie AS (SELECT sum(CAST(cnt AS DOUBLE)*cnt*cnt - cnt) AS tn
        |  FROM (SELECT count(*) AS cnt FROM b GROUP BY v)),
        |tot AS (SELECT sum(ng) AS n FROM pg),
        |vb AS (SELECT CAST(tot.n AS DOUBLE)*(tot.n+1)/12
        |    - tie.tn/(12*(CAST(tot.n AS DOUBLE)-1)) AS v
        |  FROM tot, tie)
        |SELECT a.g AS g1, c.g AS g2,
        |  round(a.m, 4) AS mean_rank_1, round(c.m, 4) AS mean_rank_2,
        |  round((a.m - c.m)
        |    / sqrt(vb.v * (1.0/a.ng + 1.0/c.ng)), 4) AS z
        |FROM pg a JOIN pg c ON a.g < c.g, vb
        |ORDER BY g1, g2""".stripMargin,
    "q213_ks_uniform" ->
      // sorted ranks vs the unit-uniform CDF; truncated Kolmogorov tail
      """WITH b AS (SELECT ((event_id * 37) % 1000) / 999 AS p FROM events),
        |r AS (SELECT p, row_number() OVER (ORDER BY p) AS i,
        |    count(*) OVER () AS n FROM b),
        |d AS (SELECT max(n) AS n,
        |    greatest(0, max(i/CAST(n AS DOUBLE) - p)) AS dp,
        |    greatest(0, max(p - (i-1)/CAST(n AS DOUBLE))) AS dm
        |  FROM r),
        |kk AS (SELECT sum(CASE WHEN g.k % 2 = 1 THEN 1 ELSE -1 END
        |      * exp(-2.0 * g.k * g.k * d.n
        |        * greatest(dp, dm) * greatest(dp, dm))) AS tail
        |  FROM d, generate_series(1, 5000) g(k))
        |SELECT CAST(n AS BIGINT) AS n, round(dp, 6) AS d_plus,
        |  round(dm, 6) AS d_minus, round(greatest(dp, dm), 6) AS d,
        |  round(CASE WHEN d.n * greatest(dp, dm) * greatest(dp, dm) < 1e-6
        |    THEN 1.0 ELSE least(1.0, 2.0 * kk.tail) END, 6) AS p_value
        |FROM d, kk""".stripMargin,
    "q214_theil_sen" ->
      // all pair slopes (x ascending), exact medians both engines
      """WITH cells AS (
        |  SELECT CAST(floor(event_id / 100) AS BIGINT) AS period,
        |    avg(value) + period * CAST(0.05 AS DOUBLE) AS m
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |s AS (SELECT (b.m - a.m) / (b.period - a.period) AS sl
        |  FROM cells a JOIN cells b ON a.period < b.period),
        |med AS (SELECT count(*) AS np, quantile_cont(sl, 0.5) AS slope
        |  FROM s),
        |ic AS (SELECT quantile_cont(m - med.slope * period, 0.5) AS icept
        |  FROM cells, med GROUP BY med.slope)
        |SELECT (SELECT CAST(count(*) AS BIGINT) FROM cells) AS n,
        |  CAST(np AS BIGINT) AS n_pairs, round(slope, 6) AS slope,
        |  round(icept, 6) AS intercept
        |FROM med, ic""".stripMargin,
    "q215_cochran_q" ->
      // complete 3-treatment panels; Q from row/column totals
      """WITH base AS (SELECT event_id AS b FROM events
        |  WHERE event_id < 2000),
        |rows_ AS (
        |  SELECT b, 'm1' AS t,
        |    CASE WHEN (b * 7) % 10 < 5 THEN 1 ELSE 0 END AS y FROM base
        |  UNION ALL
        |  SELECT b, 'm2',
        |    CASE WHEN (b * 7) % 10 < 3 THEN 1 ELSE 0 END FROM base
        |  UNION ALL
        |  SELECT b, 'm3',
        |    CASE WHEN (b * 7 + 3) % 10 < 5 THEN 1 ELSE 0 END FROM base),
        |ri AS (SELECT b, sum(y) AS r FROM rows_ GROUP BY b),
        |ra AS (SELECT count(*) AS blocks, sum(r) AS n,
        |    sum(CAST(r AS DOUBLE)*r) AS r2 FROM ri),
        |cj AS (SELECT t, sum(y) AS c FROM rows_ GROUP BY t),
        |ca AS (SELECT sum(CAST(c AS DOUBLE)*c) AS c2 FROM cj)
        |SELECT CAST(blocks AS BIGINT) AS blocks, CAST(3 AS BIGINT) AS k,
        |  CAST(n AS BIGINT) AS n_success,
        |  round(2 * (3*c2 - CAST(n AS DOUBLE)*n)
        |    / (3*CAST(n AS DOUBLE) - r2), 4) AS q,
        |  CAST(2 AS BIGINT) AS df
        |FROM ra, ca""".stripMargin,
    "q216_durbin_watson" ->
      // lag-1 squared-difference sum over period cells
      """WITH cells AS (
        |  SELECT CAST(floor(event_id / 100) AS BIGINT) AS period,
        |    avg(value) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |st AS (SELECT count(*) AS t,
        |    sum(y*y) - sum(y)*avg(y) AS denom FROM cells),
        |nm AS (SELECT sum(d*d) AS num FROM (
        |  SELECT y - lag(y) OVER (ORDER BY period) AS d FROM cells)
        |  WHERE d IS NOT NULL)
        |SELECT CAST(t AS BIGINT) AS n_periods,
        |  round(num/denom, 6) AS dw, round(1 - num/denom/2, 6) AS rho1
        |FROM st, nm""".stripMargin,
    "q217_logrank_power" ->
      // Schoenfeld closed forms; z constants to 17 digits (q124 idiom)
      """WITH b AS (SELECT CASE WHEN value > 30 THEN 1 ELSE 0 END AS ev,
        |    CAST(event_id % 2 AS INT) AS t FROM events),
        |m AS (SELECT count(*) AS n, sum(ev) AS d,
        |    CAST(sum(t) AS DOUBLE)/count(*) AS p FROM b)
        |SELECT CAST(n AS BIGINT) AS n, CAST(d AS BIGINT) AS events,
        |  round(p, 6) AS share1,
        |  round(sqrt(d * p * (1-p)) * abs(ln(CAST(1.2 AS DOUBLE)))
        |    - 1.9599639845400540, 4) AS z_power,
        |  round(pow((1.9599639845400540 + 0.84162123357291440)
        |      / abs(ln(CAST(1.2 AS DOUBLE))), 2) / (p*(1-p)), 2)
        |    AS required_events_80,
        |  round(pow((1.9599639845400540 + 1.2815515655446008)
        |      / abs(ln(CAST(1.2 AS DOUBLE))), 2) / (p*(1-p)), 2)
        |    AS required_events_90
        |FROM m""".stripMargin,
    "q194_mantel_haenszel" ->
      // per-stratum 2x2 cells, MH/RBG/CMH closed forms over cell sums
      """WITH b AS (SELECT event_type AS s, event_id % 2 AS t,
        |    CASE WHEN (CAST(floor(event_id / 2) AS BIGINT) * 7
        |      + length(event_type) * 3) % 10 < 3 + 2 * (event_id % 2)
        |      THEN 1 ELSE 0 END AS y
        |  FROM events),
        |cells AS (SELECT s,
        |    CAST(sum(CASE WHEN t=1 AND y=1 THEN 1 ELSE 0 END) AS DOUBLE) AS a,
        |    CAST(sum(CASE WHEN t=1 AND y=0 THEN 1 ELSE 0 END) AS DOUBLE) AS b2,
        |    CAST(sum(CASE WHEN t=0 AND y=1 THEN 1 ELSE 0 END) AS DOUBLE) AS c,
        |    CAST(sum(CASE WHEN t=0 AND y=0 THEN 1 ELSE 0 END) AS DOUBLE) AS d
        |  FROM b GROUP BY s),
        |k AS (SELECT a, b2, c, d, a+b2+c+d AS n FROM cells
        |  WHERE a+b2+c+d >= 2),
        |agg AS (SELECT count(*) AS strata, sum(n) AS ntot,
        |    sum(a*d/n) AS sumr, sum(b2*c/n) AS sums,
        |    sum((a+d)/n * (a*d/n)) AS sumpr,
        |    sum((a+d)/n * (b2*c/n) + (b2+c)/n * (a*d/n)) AS sumpsqr,
        |    sum((b2+c)/n * (b2*c/n)) AS sumqs,
        |    sum(a) AS suma, sum((a+b2)*(a+c)/n) AS sumea,
        |    sum((a+b2)*(c+d)*(a+c)*(b2+d)/(n*n*(n-1))) AS sumva
        |  FROM k),
        |skip AS (SELECT count(*) AS sk FROM cells WHERE a+b2+c+d < 2)
        |SELECT CAST(strata AS BIGINT) AS strata,
        |  CAST(sk AS BIGINT) AS strata_skipped, CAST(ntot AS BIGINT) AS n,
        |  round(sumr/sums, 6) AS or_mh,
        |  round(sqrt(sumpr/(2*sumr*sumr) + sumpsqr/(2*sumr*sums)
        |    + sumqs/(2*sums*sums)), 6) AS log_or_se,
        |  round((suma-sumea)*(suma-sumea)/sumva, 4) AS cmh_chisq
        |FROM agg, skip""".stripMargin,
    "q195_fisher_exact" ->
      // hypergeometric support enumeration via generate_series + lgamma;
      // the two-sided rule is "tables at most as likely", R's tolerance
      """WITH b AS (SELECT event_id % 2 AS a,
        |    CASE WHEN (CAST(floor(event_id / 2) AS BIGINT) * 11) % 10
        |      < 2 + 3 * (event_id % 2) THEN 1 ELSE 0 END AS bb
        |  FROM events WHERE event_id < 200),
        |m AS (SELECT count(*) AS n,
        |    sum(CASE WHEN a=1 AND bb=1 THEN 1 ELSE 0 END) AS n11,
        |    sum(CASE WHEN a=1 AND bb=0 THEN 1 ELSE 0 END) AS n10,
        |    sum(CASE WHEN a=0 AND bb=1 THEN 1 ELSE 0 END) AS n01,
        |    sum(CASE WHEN a=0 AND bb=0 THEN 1 ELSE 0 END) AS n00
        |  FROM b),
        |mm AS (SELECT *, n11+n10 AS r1, n11+n01 AS c1 FROM m),
        |lp AS (SELECT g.k AS k, mm.n11,
        |    lgamma(r1+1.0)-lgamma(g.k+1.0)-lgamma(r1-g.k+1.0)
        |    + lgamma(n-r1+1.0)-lgamma(c1-g.k+1.0)-lgamma(n-r1-c1+g.k+1.0)
        |    - (lgamma(n+1.0)-lgamma(c1+1.0)-lgamma(n-c1+1.0)) AS l
        |  FROM mm, generate_series(0, 200) g(k)
        |  WHERE g.k >= greatest(0, r1 + c1 - n) AND g.k <= least(r1, c1)),
        |obs AS (SELECT l AS lobs FROM lp WHERE k = n11)
        |SELECT CAST(n AS BIGINT) AS n, CAST(n11 AS BIGINT) AS n11,
        |  CAST(n10 AS BIGINT) AS n10, CAST(n01 AS BIGINT) AS n01,
        |  CAST(n00 AS BIGINT) AS n00,
        |  round(CAST(n11 AS DOUBLE)*n00/(CAST(n10 AS DOUBLE)*n01), 6)
        |    AS odds_ratio,
        |  round(least(1.0, (SELECT sum(exp(l)) FROM lp, obs
        |    WHERE l <= lobs + ln(1.0000001))), 8) AS p_two_sided,
        |  round(least(1.0, (SELECT sum(exp(lp.l)) FROM lp, mm
        |    WHERE lp.k >= mm.n11)), 8) AS p_greater
        |FROM mm""".stripMargin,
    "q196_kruskal_wallis" ->
      // window average ranks (min-rank + (ties−1)/2), centered H form,
      // tie correction from the value-cell spectrum
      """WITH b AS (SELECT CAST(l_quantity AS DOUBLE) AS v,
        |    l_returnflag AS g FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_returnflag IS NOT NULL),
        |r AS (SELECT g, rank() OVER (ORDER BY v)
        |    + (count(*) OVER (PARTITION BY v) - 1) / CAST(2 AS DOUBLE) AS ar
        |  FROM b),
        |pg AS (SELECT g, count(*) AS ng, sum(ar) AS rg FROM r GROUP BY g),
        |tie AS (SELECT sum(CAST(cnt AS DOUBLE)*cnt*cnt - cnt) AS tn
        |  FROM (SELECT count(*) AS cnt FROM b GROUP BY v)),
        |tot AS (SELECT count(*) AS k, sum(ng) AS n FROM pg),
        |dev AS (SELECT sum(ng * (rg/ng - (tot.n+1)/CAST(2 AS DOUBLE))
        |    * (rg/ng - (tot.n+1)/CAST(2 AS DOUBLE))) AS dv
        |  FROM pg, tot GROUP BY tot.n)
        |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |  round(12.0/(CAST(n AS DOUBLE)*(n+1)) * dv, 4) AS h,
        |  round(12.0/(CAST(n AS DOUBLE)*(n+1)) * dv
        |    / (1 - tn/(CAST(n AS DOUBLE)*n*n - n)), 4) AS h_corrected,
        |  CAST(k - 1 AS BIGINT) AS df
        |FROM tot, tie, dev""".stripMargin,
    "q197_brunner_munzel" ->
      // overall + within-arm window ranks; rank-difference variances per
      // arm; the BM t statistic with Satterthwaite df
      """WITH b AS (SELECT CAST(l_quantity AS DOUBLE) AS v,
        |    l_orderkey % 2 AS t FROM lineitem),
        |r AS (SELECT t,
        |    rank() OVER (ORDER BY v)
        |      + (count(*) OVER (PARTITION BY v) - 1)
        |        / CAST(2 AS DOUBLE) AS ovr,
        |    rank() OVER (PARTITION BY t ORDER BY v)
        |      + (count(*) OVER (PARTITION BY t, v) - 1)
        |        / CAST(2 AS DOUBLE) AS wr
        |  FROM b),
        |g AS (SELECT t, count(*) AS ng, avg(ovr) AS m,
        |    (sum((ovr-wr)*(ovr-wr)) - sum(ovr-wr)*sum(ovr-wr)/count(*))
        |      / (count(*) - 1) AS s2
        |  FROM r GROUP BY t),
        |w AS (SELECT
        |    max(CASE WHEN t=0 THEN ng END) AS n0,
        |    max(CASE WHEN t=1 THEN ng END) AS n1,
        |    max(CASE WHEN t=0 THEN m END) AS m0,
        |    max(CASE WHEN t=1 THEN m END) AS m1,
        |    max(CASE WHEN t=0 THEN s2 END) AS v0,
        |    max(CASE WHEN t=1 THEN s2 END) AS v1
        |  FROM g)
        |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
        |  round((m1 - (n1+1)/CAST(2 AS DOUBLE))/n0, 6) AS p_hat,
        |  round(n0*n1*(m1-m0) / ((n0+n1) * sqrt(n0*v0 + n1*v1)), 4) AS stat,
        |  round((n0*v0 + n1*v1)*(n0*v0 + n1*v1)
        |    / (v0*v0*n0*n0/(n0-1) + v1*v1*n1*n1/(n1-1)), 2) AS df
        |FROM w""".stripMargin,
    "q198_effect_size" ->
      // moments for d/g/Glass; Cliff via the arm-1 rank sum
      """WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v,
        |    l_orderkey % 2 AS t FROM lineitem),
        |m AS (SELECT
        |    sum(CASE WHEN t=0 THEN 1 ELSE 0 END) AS n0,
        |    sum(CASE WHEN t=1 THEN 1 ELSE 0 END) AS n1,
        |    avg(CASE WHEN t=0 THEN v END) AS m0,
        |    avg(CASE WHEN t=1 THEN v END) AS m1,
        |    var_samp(CASE WHEN t=0 THEN v END) AS v0,
        |    var_samp(CASE WHEN t=1 THEN v END) AS v1
        |  FROM b),
        |r AS (SELECT t, rank() OVER (ORDER BY v)
        |    + (count(*) OVER (PARTITION BY v) - 1) / CAST(2 AS DOUBLE) AS ar
        |  FROM b),
        |r1 AS (SELECT sum(ar) AS rs FROM r WHERE t = 1)
        |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
        |  round(m1 - m0, 4) AS mean_diff,
        |  round((m1-m0)/sqrt(((n0-1)*v0 + (n1-1)*v1)/(n0+n1-2)), 6)
        |    AS cohens_d,
        |  round((m1-m0)/sqrt(((n0-1)*v0 + (n1-1)*v1)/(n0+n1-2))
        |    * (1 - 3.0/(4*(n0+n1) - 9)), 6) AS hedges_g,
        |  round((m1-m0)/sqrt(v0), 6) AS glass_delta,
        |  round(2*(rs - n1*(CAST(n1 AS DOUBLE)+1)/2)
        |    / (CAST(n0 AS DOUBLE)*n1) - 1, 6) AS cliffs_delta
        |FROM m, r1""".stripMargin,
    "q199_nelson_aalen" ->
      // per-group KM cells (at-risk by cumulative exit counts), then
      // running sums of d/n and d/n² — all windowed over cells
      """WITH b AS (SELECT event_id % 50 AS time,
        |    CASE WHEN value > 30 THEN 1 ELSE 0 END AS ev,
        |    CASE WHEN event_id % 3 = 0 THEN 'a' ELSE 'b' END AS arm
        |  FROM events),
        |cells AS (SELECT arm, time, sum(ev) AS d, count(*) AS x
        |  FROM b GROUP BY arm, time),
        |cum AS (SELECT arm, time, d,
        |    sum(x) OVER (PARTITION BY arm) -
        |      coalesce(sum(x) OVER (PARTITION BY arm ORDER BY time
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_risk
        |  FROM cells)
        |SELECT arm AS "group", time, CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(d AS BIGINT) AS n_event,
        |  round(sum(CAST(d AS DOUBLE)/n_risk) OVER w, 6) AS cum_hazard,
        |  round(sqrt(sum(CAST(d AS DOUBLE)/(CAST(n_risk AS DOUBLE)*n_risk))
        |    OVER w), 6) AS se,
        |  round(exp(-(sum(CAST(d AS DOUBLE)/n_risk) OVER w)), 6)
        |    AS fh_survival
        |FROM cum
        |WINDOW w AS (PARTITION BY arm ORDER BY time
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |ORDER BY "group", time""".stripMargin,
    "q200_cumulative_incidence" ->
      // all-cause exclusive log-survival prefix x per-cause hazard
      // increments, cumulated per cause — Aalen-Johansen in windows
      """WITH b AS (SELECT event_id % 40 AS time,
        |    CAST((event_id * 7) % 3 AS INT) AS cause FROM events),
        |tc AS (SELECT time, cause, count(*) AS cnt FROM b
        |  GROUP BY time, cause),
        |tt AS (SELECT time, sum(cnt) AS n_total,
        |    sum(CASE WHEN cause > 0 THEN cnt ELSE 0 END) AS d_all
        |  FROM tc GROUP BY time),
        |cum AS (SELECT time, d_all,
        |    sum(n_total) OVER () -
        |      coalesce(sum(n_total) OVER (ORDER BY time
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS n_risk
        |  FROM tt),
        |lt AS (SELECT time, n_risk,
        |    CASE WHEN d_all = n_risk THEN CAST(0 AS DOUBLE)
        |      ELSE ln(1 - CAST(d_all AS DOUBLE)/n_risk) END AS l
        |  FROM cum),
        |sm AS (SELECT time, n_risk,
        |    exp(coalesce(sum(l) OVER (ORDER BY time
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
        |      AS s_minus
        |  FROM lt)
        |SELECT tc.cause, tc.time, CAST(sm.n_risk AS BIGINT) AS n_risk,
        |  CAST(tc.cnt AS BIGINT) AS n_event,
        |  round(sum(sm.s_minus * tc.cnt / sm.n_risk)
        |    OVER (PARTITION BY tc.cause ORDER BY tc.time
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cif
        |FROM tc JOIN sm ON tc.time = sm.time
        |WHERE tc.cause > 0
        |ORDER BY tc.cause, tc.time""".stripMargin,
    "q201_ewma" ->
      // the exact recursion as a recursive CTE (all-DOUBLE casts:
      // decimal literals truncate inside recursive CTEs); limits from
      // the closed-form variance ramp
      """WITH RECURSIVE cells AS (
        |  SELECT CAST(floor(event_id / 100) AS BIGINT) AS period,
        |    avg(value) AS metric
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |idx AS (SELECT period, metric,
        |    row_number() OVER (ORDER BY period) - 1 AS i FROM cells),
        |st AS (SELECT CAST(avg(metric) AS DOUBLE) AS mu,
        |    CAST(stddev_samp(metric) AS DOUBLE) AS sd,
        |    count(*) AS t FROM cells),
        |w(i, z) AS (
        |  SELECT -1, (SELECT mu FROM st)
        |  UNION ALL
        |  SELECT w.i + 1,
        |    CAST(0.3 AS DOUBLE) * idx.metric + CAST(0.7 AS DOUBLE) * w.z
        |  FROM w JOIN idx ON idx.i = w.i + 1)
        |SELECT idx.period, round(idx.metric, 6) AS metric,
        |  round(w.z, 6) AS ewma,
        |  round(st.mu - 3*st.sd*sqrt(CAST(0.3 AS DOUBLE)/1.7
        |    * (1 - pow(CAST(0.7 AS DOUBLE), 2.0*(idx.i+1)))), 6)
        |    AS limit_lower,
        |  round(st.mu + 3*st.sd*sqrt(CAST(0.3 AS DOUBLE)/1.7
        |    * (1 - pow(CAST(0.7 AS DOUBLE), 2.0*(idx.i+1)))), 6)
        |    AS limit_upper,
        |  abs(w.z - st.mu) > 3*st.sd*sqrt(CAST(0.3 AS DOUBLE)/1.7
        |    * (1 - pow(CAST(0.7 AS DOUBLE), 2.0*(idx.i+1)))) AS is_anomaly
        |FROM idx JOIN w ON w.i = idx.i, st
        |ORDER BY idx.period""".stripMargin,
    "q202_ljung_box" ->
      // lag-k cross sums via a dense-index self-join; cumulative Q over
      // the lag table
      """WITH cells AS (
        |  SELECT CAST(floor(event_id / 100) AS BIGINT) AS period,
        |    avg(value) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |st AS (SELECT count(*) AS t, avg(y) AS mu,
        |    sum(y*y) - sum(y)*avg(y) AS denom FROM cells),
        |idx AS (SELECT y, row_number() OVER (ORDER BY period) AS i
        |  FROM cells),
        |lagk AS (SELECT g.k AS lag,
        |    sum((a.y - st.mu) * (b.y - st.mu)) AS sk
        |  FROM generate_series(1, 6) g(k)
        |  JOIN idx a ON true JOIN idx b ON b.i = a.i + g.k, st
        |  GROUP BY g.k),
        |acf AS (SELECT lag, sk / st.denom AS r,
        |    st.t*(st.t+2.0) * (sk/st.denom)*(sk/st.denom) / (st.t - lag)
        |      AS qterm
        |  FROM lagk, st)
        |SELECT CAST(lag AS BIGINT) AS lag, round(r, 6) AS acf,
        |  round(sum(qterm) OVER (ORDER BY lag
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS q_stat,
        |  CAST(lag AS BIGINT) AS df
        |FROM acf ORDER BY lag""".stripMargin,
    "q203_sprt" ->
      // cumulative LLR per look; sticky decision from the FIRST
      // bound-crossing look
      """WITH b AS (SELECT CAST(floor(event_id / 500) AS BIGINT) AS look,
        |    CASE WHEN (event_id * 31) % 100 < 25 THEN 1 ELSE 0 END AS y
        |  FROM events),
        |cells AS (SELECT look, count(*) AS n, sum(y) AS s FROM b
        |  GROUP BY look),
        |cum AS (SELECT look,
        |    sum(n) OVER w AS cn, sum(s) OVER w AS cs
        |  FROM cells
        |  WINDOW w AS (ORDER BY look
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |llr AS (SELECT look, cn, cs,
        |    cs * ln(CAST(0.3 AS DOUBLE)/0.2)
        |      + (cn - cs) * ln(CAST(0.7 AS DOUBLE)/0.8) AS l
        |  FROM cum),
        |cross1 AS (SELECT min(CASE WHEN l >= ln(0.8/0.05) THEN look END)
        |      AS up1,
        |    min(CASE WHEN l <= ln(0.2/0.95) THEN look END) AS lo1
        |  FROM llr)
        |SELECT look AS bucket, CAST(cn AS BIGINT) AS n,
        |  CAST(cs AS BIGINT) AS successes, round(l, 6) AS llr,
        |  round(ln(0.2/0.95), 6) AS lower_bound,
        |  round(ln(0.8/0.05), 6) AS upper_bound,
        |  CASE
        |    WHEN up1 IS NOT NULL AND (lo1 IS NULL OR up1 <= lo1)
        |      AND look >= up1 THEN 'accept_h1'
        |    WHEN lo1 IS NOT NULL AND (up1 IS NULL OR lo1 < up1)
        |      AND look >= lo1 THEN 'accept_h0'
        |    ELSE 'continue' END AS decision
        |FROM llr, cross1 ORDER BY look""".stripMargin,
    "q204_hosmer_lemeshow" ->
      // exact decile cuts (quantile_cont == house percentile), bins by
      // strictly-above threshold count, the HL chi-square over bins
      """WITH b AS (SELECT
        |    (l_partkey % 97) / 193 + 0.2 AS s,
        |    CASE WHEN (l_partkey * 13) % 193 < 39 +
        |      ((l_partkey % 97) * 7) // 10 THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |q AS (SELECT quantile_cont(s, 0.1) q1, quantile_cont(s, 0.2) q2,
        |    quantile_cont(s, 0.3) q3, quantile_cont(s, 0.4) q4,
        |    quantile_cont(s, 0.5) q5, quantile_cont(s, 0.6) q6,
        |    quantile_cont(s, 0.7) q7, quantile_cont(s, 0.8) q8,
        |    quantile_cont(s, 0.9) q9 FROM b),
        |binned AS (SELECT y, s,
        |    (CASE WHEN s > q1 THEN 1 ELSE 0 END) +
        |    (CASE WHEN s > q2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN s > q3 THEN 1 ELSE 0 END) +
        |    (CASE WHEN s > q4 THEN 1 ELSE 0 END) +
        |    (CASE WHEN s > q5 THEN 1 ELSE 0 END) +
        |    (CASE WHEN s > q6 THEN 1 ELSE 0 END) +
        |    (CASE WHEN s > q7 THEN 1 ELSE 0 END) +
        |    (CASE WHEN s > q8 THEN 1 ELSE 0 END) +
        |    (CASE WHEN s > q9 THEN 1 ELSE 0 END) AS bin
        |  FROM b, q),
        |cells AS (SELECT bin, count(*) AS n, sum(y) AS o, sum(s) AS e
        |  FROM binned GROUP BY bin)
        |SELECT CAST(sum(n) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS bins,
        |  round(sum((o - e)*(o - e) / (e * (1 - e/n))), 4) AS chisq,
        |  CAST(count(*) - 2 AS BIGINT) AS df
        |FROM cells""".stripMargin,
    "q205_classification_report" ->
      // confusion counts + closed-form threshold metrics
      """WITH b AS (SELECT
        |    CASE WHEN (event_id * 7) % 10 < 4 THEN 1 ELSE 0 END AS y,
        |    CASE WHEN (event_id * 7) % 10 < 3 OR (event_id * 3) % 20 = 0
        |      THEN 1 ELSE 0 END AS yh
        |  FROM events),
        |m AS (SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN y=1 AND yh=1 THEN 1 ELSE 0 END) AS DOUBLE) tp,
        |    CAST(sum(CASE WHEN y=0 AND yh=1 THEN 1 ELSE 0 END) AS DOUBLE) fp,
        |    CAST(sum(CASE WHEN y=1 AND yh=0 THEN 1 ELSE 0 END) AS DOUBLE) fn,
        |    CAST(sum(CASE WHEN y=0 AND yh=0 THEN 1 ELSE 0 END) AS DOUBLE) tn
        |  FROM b)
        |SELECT CAST(n AS BIGINT) AS n, CAST(tp AS BIGINT) AS tp,
        |  CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
        |  CAST(tn AS BIGINT) AS tn,
        |  round((tp + tn) / n, 6) AS accuracy,
        |  round(tp / (tp + fp), 6) AS precision,
        |  round(tp / (tp + fn), 6) AS recall,
        |  round(2 * (tp/(tp+fp)) * (tp/(tp+fn))
        |    / (tp/(tp+fp) + tp/(tp+fn)), 6) AS f1,
        |  round((tp*tn - fp*fn)
        |    / sqrt((tp+fp)*(tp+fn)*(tn+fp)*(tn+fn)), 6) AS mcc
        |FROM m""".stripMargin,
    "q206_cronbach_alpha" ->
      // per-item + total-score variances in one pass, alpha closed form
      """WITH b AS (SELECT
        |    CAST(l_quantity + (l_partkey % 7) AS DOUBLE) AS i1,
        |    CAST(l_quantity + (l_suppkey % 5) AS DOUBLE) AS i2,
        |    CAST(l_quantity + (l_orderkey % 3) AS DOUBLE) AS i3
        |  FROM lineitem),
        |m AS (SELECT count(*) AS n,
        |    (sum(i1*i1) - sum(i1)*sum(i1)/count(*)) / (count(*) - 1)
        |    + (sum(i2*i2) - sum(i2)*sum(i2)/count(*)) / (count(*) - 1)
        |    + (sum(i3*i3) - sum(i3)*sum(i3)/count(*)) / (count(*) - 1)
        |      AS iv,
        |    (sum((i1+i2+i3)*(i1+i2+i3))
        |      - sum(i1+i2+i3)*sum(i1+i2+i3)/count(*)) / (count(*) - 1) AS tv
        |  FROM b)
        |SELECT CAST(n AS BIGINT) AS n, CAST(3 AS BIGINT) AS k,
        |  round(iv, 4) AS sum_item_var, round(tv, 4) AS total_var,
        |  round(3.0/2 * (1 - iv/tv), 6) AS alpha
        |FROM m""".stripMargin,
    "q207_oaxaca_blinder" ->
      // per-group slope from cov/var (k=1 closed form), two-fold
      // decomposition at group-0 coefficients
      """WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS y,
        |    l_orderkey % 2 AS g, CAST(l_quantity AS DOUBLE) AS x
        |  FROM lineitem),
        |m AS (SELECT g, count(*) AS n, avg(y) AS my, avg(x) AS mx,
        |    (sum(x*y) - sum(x)*sum(y)/count(*))
        |      / (sum(x*x) - sum(x)*sum(x)/count(*)) AS beta
        |  FROM b GROUP BY g),
        |w AS (SELECT
        |    max(CASE WHEN g=0 THEN n END) AS n0,
        |    max(CASE WHEN g=1 THEN n END) AS n1,
        |    max(CASE WHEN g=1 THEN my END)
        |      - max(CASE WHEN g=0 THEN my END) AS gap,
        |    (max(CASE WHEN g=1 THEN mx END)
        |      - max(CASE WHEN g=0 THEN mx END))
        |      * max(CASE WHEN g=0 THEN beta END) AS explained
        |  FROM m)
        |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
        |  round(gap, 4) AS gap, round(explained, 4) AS explained,
        |  round(gap - explained, 4) AS unexplained
        |FROM w""".stripMargin,
    "q208_chao1" ->
      // q96's tokenization; frequency spectrum -> chao1 + coverage
      """WITH v AS (SELECT token, count(*) AS n
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
        |        FROM documents)
        |  WHERE length(token) > 0 GROUP BY token),
        |m AS (SELECT count(*) AS terms, sum(n) AS tot,
        |    sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS f1,
        |    sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS f2
        |  FROM v)
        |SELECT CAST(terms AS BIGINT) AS terms, CAST(tot AS BIGINT)
        |    AS total_tokens,
        |  CAST(f1 AS BIGINT) AS f1, CAST(f2 AS BIGINT) AS f2,
        |  round(terms + CAST(f1 AS DOUBLE)*(f1-1)/(2.0*(f2+1)), 4) AS chao1,
        |  round(1 - CAST(f1 AS DOUBLE)/tot, 6) AS coverage
        |FROM m""".stripMargin,
    "q209_kmeans" ->
      // two Lloyd iterations replayed with list arithmetic: init = 4
      // lowest vec_ids, assignment by min Euclidean (ties -> lower
      // cluster), centroid update per (cluster, dim), final inertia
      """WITH init AS (SELECT row_number() OVER (ORDER BY vec_id) - 1
        |      AS cluster,
        |    CAST(embedding AS DOUBLE[]) AS cv
        |  FROM embeddings ORDER BY vec_id LIMIT 4),
        |a1 AS (SELECT e.vec_id, e.embedding, i.cluster,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), i.cv),
        |        i.cluster) AS rk
        |  FROM embeddings e, init i),
        |c1 AS (SELECT cluster, g.i AS pos,
        |    avg(CAST(embedding[g.i] AS DOUBLE)) AS v
        |  FROM a1, generate_series(1, 64) g(i) WHERE rk = 1
        |  GROUP BY cluster, g.i),
        |cl1 AS (SELECT cluster, list(v ORDER BY pos) AS cv FROM c1
        |  GROUP BY cluster),
        |a2 AS (SELECT e.vec_id, e.embedding, i.cluster,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), i.cv),
        |        i.cluster) AS rk
        |  FROM embeddings e, cl1 i),
        |c2 AS (SELECT cluster, g.i AS pos,
        |    avg(CAST(embedding[g.i] AS DOUBLE)) AS v
        |  FROM a2, generate_series(1, 64) g(i) WHERE rk = 1
        |  GROUP BY cluster, g.i),
        |cl2 AS (SELECT cluster, list(v ORDER BY pos) AS cv FROM c2
        |  GROUP BY cluster),
        |fin AS (SELECT e.vec_id, i.cluster,
        |    list_distance(CAST(e.embedding AS DOUBLE[]), i.cv) AS dist,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), i.cv),
        |        i.cluster) AS rk
        |  FROM embeddings e, cl2 i)
        |SELECT CAST(cluster AS INT) AS cluster,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(dist * dist), 3) AS inertia
        |FROM fin WHERE rk = 1 GROUP BY cluster ORDER BY cluster""".stripMargin,
    "q210_ordinal_assoc" ->
      // concordant/discordant pair counting over the cell self-join;
      // inference (r17) from per-cell neighbor masses A/B: the SAME
      // self-join aggregated per LEFT cell, then the Agresti ASE /
      // test-based var0 sums over cells with the x-margin joined back
      """WITH b AS (SELECT CAST(l_quantity AS BIGINT) AS x,
        |    CAST(floor(l_extendedprice / 5000) AS BIGINT) AS y
        |  FROM lineitem),
        |cells AS (SELECT x, y, count(*) AS c FROM b GROUP BY x, y),
        |p AS (SELECT
        |    sum(CASE WHEN (a.x < b.x AND a.y < b.y)
        |      OR (a.x > b.x AND a.y > b.y)
        |      THEN CAST(a.c AS DOUBLE)*b.c ELSE 0 END) / 2 AS conc,
        |    sum(CASE WHEN (a.x < b.x AND a.y > b.y)
        |      OR (a.x > b.x AND a.y < b.y)
        |      THEN CAST(a.c AS DOUBLE)*b.c ELSE 0 END) / 2 AS disc,
        |    sum(CASE WHEN a.x = b.x AND a.y <> b.y
        |      THEN CAST(a.c AS DOUBLE)*b.c ELSE 0 END) / 2 AS tx,
        |    sum(CASE WHEN a.y = b.y AND a.x <> b.x
        |      THEN CAST(a.c AS DOUBLE)*b.c ELSE 0 END) / 2 AS ty
        |  FROM cells a, cells b
        |  WHERE NOT (a.x = b.x AND a.y = b.y)),
        |m AS (SELECT count(*) AS nc, CAST(sum(c) AS DOUBLE) AS n
        |  FROM cells),
        |ab AS (SELECT a.x, a.y, a.c,
        |    sum(CASE WHEN (b.x > a.x AND b.y > a.y)
        |      OR (b.x < a.x AND b.y < a.y)
        |      THEN CAST(b.c AS DOUBLE) ELSE 0 END) AS am,
        |    sum(CASE WHEN (b.x > a.x AND b.y < a.y)
        |      OR (b.x < a.x AND b.y > a.y)
        |      THEN CAST(b.c AS DOUBLE) ELSE 0 END) AS bm
        |  FROM cells a, cells b GROUP BY a.x, a.y, a.c),
        |rt AS (SELECT x, CAST(sum(c) AS DOUBLE) AS nr FROM cells
        |  GROUP BY x),
        |s AS (SELECT
        |    sum(ab.c * (2*disc*am - 2*conc*bm) * (2*disc*am - 2*conc*bm))
        |      AS s_gam,
        |    sum(ab.c * (am - bm) * (am - bm)) AS s_cd2,
        |    sum(ab.c * (2*(conc+disc+ty)*(am - bm)
        |        - 2*(conc - disc)*(m.n - rt.nr))
        |      * (2*(conc+disc+ty)*(am - bm)
        |        - 2*(conc - disc)*(m.n - rt.nr))) AS s_som
        |  FROM ab JOIN rt ON ab.x = rt.x, p, m
        |  GROUP BY conc, disc, ty, m.n)
        |SELECT CAST(n AS BIGINT) AS n, CAST(nc AS BIGINT) AS cells,
        |  conc AS concordant, disc AS discordant,
        |  round((conc - disc)/sqrt((conc+disc+tx)*(conc+disc+ty)), 6)
        |    AS tau_b,
        |  round((conc - disc)/(conc + disc), 6) AS gamma,
        |  round(4*sqrt(s_gam)/((2*conc+2*disc)*(2*conc+2*disc))
        |    * sqrt(n), 6) AS gamma_ase_sqn,
        |  round(((conc - disc)/(conc + disc))
        |    / sqrt(16*(s_cd2 - (2*conc-2*disc)*(2*conc-2*disc)/n)
        |        / ((2*conc+2*disc)*(2*conc+2*disc))), 4) AS gamma_z,
        |  round((conc - disc)/(conc + disc + ty), 6) AS somers_d,
        |  round(2*sqrt(s_som)
        |    / ((2*(conc+disc+ty))*(2*(conc+disc+ty)))
        |    * sqrt(n), 6) AS somers_ase_sqn,
        |  round(((conc - disc)/(conc + disc + ty))
        |    / sqrt(4*(s_cd2 - (2*conc-2*disc)*(2*conc-2*disc)/n)
        |        / ((2*(conc+disc+ty))*(2*(conc+disc+ty)))), 4)
        |    AS somers_z
        |FROM p, m, s""".stripMargin,
    "q211_mood_median" ->
      // pooled exact median, 2xk above/below chi-square
      """WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS y,
        |    l_returnflag AS g FROM lineitem),
        |md AS (SELECT quantile_cont(y, 0.5) AS m FROM b),
        |cells AS (SELECT g, count(*) AS ng,
        |    sum(CASE WHEN y > (SELECT m FROM md) THEN 1 ELSE 0 END) AS ag
        |  FROM b GROUP BY g),
        |tot AS (SELECT count(*) AS k, CAST(sum(ng) AS DOUBLE) AS n,
        |    CAST(sum(ag) AS DOUBLE) AS a FROM cells),
        |x2 AS (SELECT sum(
        |    (ag - ng*(tot.a/tot.n))*(ag - ng*(tot.a/tot.n))
        |      / (ng*(tot.a/tot.n))
        |    + ((ng-ag) - ng*((tot.n-tot.a)/tot.n))
        |      * ((ng-ag) - ng*((tot.n-tot.a)/tot.n))
        |      / (ng*((tot.n-tot.a)/tot.n))) AS chisq
        |  FROM cells, tot GROUP BY tot.n, tot.a)
        |SELECT CAST(tot.n AS BIGINT) AS n, CAST(tot.k AS BIGINT) AS k,
        |  round((SELECT m FROM md), 4) AS grand_median,
        |  round(x2.chisq, 4) AS chisq, CAST(tot.k - 1 AS BIGINT) AS df
        |FROM tot, x2""".stripMargin,
    "q193_zipf_fit" ->
      // q96's tokenization, frequency-desc rank, ln-ln OLS closed form
      """WITH v AS (SELECT token, count(*) AS n
        |  FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
        |        FROM documents)
        |  WHERE length(token) > 0 GROUP BY token),
        |r AS (SELECT n,
        |    row_number() OVER (ORDER BY n DESC, token) AS rk FROM v),
        |m AS (SELECT CAST(count(*) AS DOUBLE) AS m, sum(n) AS tot,
        |    sum(ln(rk)) AS sx, sum(ln(n)) AS sy,
        |    sum(ln(rk) * ln(n)) AS sxy, sum(ln(rk) * ln(rk)) AS sxx,
        |    sum(ln(n) * ln(n)) AS syy
        |  FROM r),
        |f AS (SELECT m, tot,
        |    (sxy - sx * sy / m) / (sxx - sx * sx / m) AS slope,
        |    sx, sy, sxx - sx * sx / m AS cxx, syy - sy * sy / m AS cyy
        |  FROM m)
        |SELECT CAST(m AS BIGINT) AS terms, CAST(tot AS BIGINT)
        |    AS total_tokens,
        |  round(slope, 6) AS slope,
        |  round((sy - slope * sx) / m, 6) AS intercept,
        |  round(slope * slope * cxx / cyy, 6) AS r2
        |FROM f""".stripMargin,
    "q191_fleiss_kappa" ->
      // (item x category) cells -> item squared-cell sums -> Pbar;
      // category margins -> Pe; plain two-level SQL
      """WITH b AS (SELECT CAST(event_id % 500 AS VARCHAR) AS i,
        |    'c' || CAST(CASE WHEN (event_id * 37) % 10 < 7
        |      THEN event_id % 500 % 5
        |      ELSE (event_id * 7 + 3) % 5 END AS VARCHAR) AS c
        |  FROM events WHERE event_id IS NOT NULL AND event_id < 1000),
        |cells AS (SELECT i, c, count(*) AS n FROM b GROUP BY 1, 2),
        |it AS (SELECT i, sum(n) AS ni, sum(n * n) AS ni2
        |  FROM cells GROUP BY 1),
        |s AS (SELECT count(*) AS items, min(ni) AS n, sum(ni2) AS s2,
        |    CAST(sum(ni) AS DOUBLE) AS total FROM it),
        |pe AS (SELECT sum(CAST(nc AS DOUBLE) * nc
        |      / ((SELECT total FROM s) * (SELECT total FROM s))) AS pe,
        |    count(*) AS k
        |  FROM (SELECT c, sum(n) AS nc FROM cells GROUP BY 1)),
        |f AS (SELECT items, n, pe.k, pe.pe,
        |    (s2 - items * CAST(n AS DOUBLE))
        |      / (items * CAST(n AS DOUBLE) * (n - 1)) AS pbar
        |  FROM s, pe)
        |SELECT CAST(items AS BIGINT) AS items, CAST(n AS BIGINT) AS raters,
        |  CAST(k AS BIGINT) AS categories, round(pbar, 6) AS p_bar,
        |  round(pe, 6) AS p_e,
        |  round((pbar - pe) / (1 - pe), 6) AS kappa
        |FROM f""".stripMargin,
    "q189_spearman" ->
      // the same average-rank construction: tie-group counts, running
      // count to avg rank, join back, corr of ranks, Fieller-Fisher z
      """WITH b AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y FROM lineitem),
        |gx AS (SELECT x AS v, count(*) AS cnt FROM b GROUP BY 1),
        |cx AS (SELECT v, (sum(cnt) OVER (ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) - cnt
        |    + sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) + 1) / 2.0
        |    AS rx
        |  FROM gx),
        |gy AS (SELECT y AS v, count(*) AS cnt FROM b GROUP BY 1),
        |cy AS (SELECT v, (sum(cnt) OVER (ORDER BY v
        |      ROWS UNBOUNDED PRECEDING) - cnt
        |    + sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) + 1) / 2.0
        |    AS ry
        |  FROM gy),
        |j AS (SELECT count(*) AS n, corr(cx.rx, cy.ry) AS rho
        |  FROM b JOIN cx ON b.x = cx.v JOIN cy ON b.y = cy.v)
        |SELECT CAST(n AS BIGINT) AS n, round(rho, 6) AS rho,
        |  round(0.5 * ln((1 + rho) / (1 - rho))
        |    * sqrt((n - 3) / 1.06), 4) AS z
        |FROM j""".stripMargin,
    "q190_levene" ->
      // per-arm quantile_cont medians, |y - med| cells, ANOVA closed form
      """WITH b AS (SELECT l_returnflag AS a,
        |    CAST(l_quantity AS DOUBLE) AS y
        |  FROM lineitem WHERE l_quantity IS NOT NULL
        |    AND l_returnflag IS NOT NULL),
        |md AS (SELECT a, quantile_cont(y, 0.5) AS med FROM b GROUP BY 1),
        |z AS (SELECT b.a, abs(b.y - md.med) AS z
        |  FROM b JOIN md ON b.a = md.a),
        |g AS (SELECT a, count(*) AS nk, sum(z) AS s, sum(z*z) AS ss
        |  FROM z GROUP BY 1),
        |t AS (SELECT sum(nk) AS n, count(*) AS k, sum(s) AS st,
        |    sum(ss) AS sst, sum(s * s / nk) AS sb
        |  FROM g),
        |f AS (SELECT n, k, sb - st * st / CAST(n AS DOUBLE) AS ssb,
        |    sst - sb AS ssw FROM t)
        |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |  round((ssb / (k - 1)) / (ssw / (CAST(n AS DOUBLE) - k)), 6)
        |    AS f_stat,
        |  CAST(k - 1 AS DOUBLE) AS df1,
        |  CAST(n AS DOUBLE) - k AS df2
        |FROM f""".stripMargin,
    "q187_bland_altman" ->
      // bias/sd pass, then the within-limits share against the computed
      // limits
      """WITH b AS (SELECT
        |    (CAST(value AS DOUBLE) * 1.02
        |      + CAST(user_id % 7 - 3 AS DOUBLE)) - CAST(value AS DOUBLE)
        |      AS d
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
        |m AS (SELECT count(*) AS n, avg(d) AS bias, stddev_samp(d) AS sd
        |  FROM b),
        |f AS (SELECT n, bias, sd,
        |    bias - 1.959963984540054 * sd AS lo,
        |    bias + 1.959963984540054 * sd AS hi
        |  FROM m),
        |w AS (SELECT sum(CASE WHEN b.d BETWEEN f.lo AND f.hi
        |    THEN 1 ELSE 0 END) AS wi FROM b, f)
        |SELECT CAST(f.n AS BIGINT) AS n, round(f.bias, 6) AS bias,
        |  round(f.sd, 6) AS sd, round(f.lo, 6) AS loa_lower,
        |  round(f.hi, 6) AS loa_upper,
        |  round(w.wi * 1.0 / f.n, 6) AS pct_within
        |FROM f, w""".stripMargin,
    "q188_trend_test" ->
      // arm cells then the Armitage closed form
      """WITH b AS (SELECT CASE WHEN value > 60 THEN 1 ELSE 0 END AS s,
        |    CAST(user_id % 4 AS DOUBLE) AS c
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
        |g AS (SELECT c, count(*) AS nk, sum(s) AS sk FROM b GROUP BY 1),
        |a AS (SELECT sum(nk) AS n, count(*) AS k, sum(sk) AS s,
        |    sum(c * sk) AS cs, sum(c * nk) AS cn, sum(c * c * nk) AS ccn
        |  FROM g),
        |f AS (SELECT n, k, s * 1.0 / n AS pbar,
        |    cs - (s * 1.0 / n) * cn AS t,
        |    (s * 1.0 / n) * (1 - s * 1.0 / n) * (ccn - cn * cn / n) AS v
        |  FROM a)
        |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS n_arms,
        |  round(pbar, 6) AS p_bar, round(t, 6) AS t_stat,
        |  round(v, 4) AS var_t, round(t / sqrt(v), 4) AS z
        |FROM f""".stripMargin,
    "q186_mutual_info" ->
      // observed-cell MI with margins joined back; NMI from the margin
      // entropies; the mi clamp at 0 mirrors the Spark driver
      """WITH b AS (SELECT event_type AS a,
        |    CAST(user_id % 3 AS VARCHAR) AS b
        |  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |c AS (SELECT a, b, count(*) AS c FROM b GROUP BY 1, 2),
        |ra AS (SELECT a, sum(c) AS ca FROM c GROUP BY 1),
        |rb AS (SELECT b, sum(c) AS cb FROM c GROUP BY 1),
        |tt AS (SELECT CAST(sum(c) AS DOUBLE) AS n FROM c),
        |j AS (SELECT count(*) AS cells,
        |    greatest(0.0, sum(c.c / tt.n
        |      * ln(c.c * tt.n / (CAST(ra.ca AS DOUBLE) * rb.cb)))) AS mi
        |  FROM c JOIN ra ON c.a = ra.a JOIN rb ON c.b = rb.b, tt
        |  GROUP BY tt.n),
        |h AS (SELECT
        |    (SELECT sum(-(ca / tt.n) * ln(ca / tt.n)) FROM ra, tt) AS ha,
        |    (SELECT sum(-(cb / tt.n) * ln(cb / tt.n)) FROM rb, tt) AS hb)
        |SELECT CAST((SELECT n FROM tt) AS BIGINT) AS n,
        |  CAST(cells AS BIGINT) AS cells,
        |  round(ha, 6) AS h_a, round(hb, 6) AS h_b,
        |  round(mi, 8) AS mi,
        |  round(CASE WHEN ha > 0 AND hb > 0 THEN mi / sqrt(ha * hb)
        |    ELSE 0.0 END, 8) AS nmi
        |FROM j, h""".stripMargin,
    "q182_yuen" ->
      // per-arm quantile_cont trim points, winsorized moments, Yuen SE —
      // the d-term association mirrors the Spark driver arithmetic
      """WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) / 100 AS y,
        |    CAST(l_orderkey % 2 AS INT) AS t FROM lineitem),
        |q AS (SELECT t, count(*) AS n, quantile_cont(y, 0.2) AS lo,
        |    quantile_cont(y, 0.8) AS hi FROM b GROUP BY 1),
        |m AS (SELECT b.t, q.n, q.lo, q.hi,
        |    sum(CASE WHEN y BETWEEN lo AND hi THEN 1 ELSE 0 END) AS h,
        |    sum(CASE WHEN y BETWEEN lo AND hi THEN y ELSE 0 END) AS ts,
        |    sum(greatest(lo, least(hi, y))) AS ws,
        |    sum(greatest(lo, least(hi, y)) * greatest(lo, least(hi, y)))
        |      AS wss
        |  FROM b JOIN q ON b.t = q.t GROUP BY 1, 2, 3, 4),
        |a AS (SELECT t, n, h, ts / h AS tm,
        |    greatest(0.0, wss - ws * ws / n) / (n - 1) * (n - 1)
        |      / (h * 1.0 * (h - 1)) AS dd
        |  FROM m),
        |f AS (SELECT
        |    max(CASE WHEN t = 0 THEN n END) AS n0,
        |    max(CASE WHEN t = 1 THEN n END) AS n1,
        |    max(CASE WHEN t = 0 THEN h END) AS h0,
        |    max(CASE WHEN t = 1 THEN h END) AS h1,
        |    max(CASE WHEN t = 0 THEN tm END) AS tm0,
        |    max(CASE WHEN t = 1 THEN tm END) AS tm1,
        |    max(CASE WHEN t = 0 THEN dd END) AS d0,
        |    max(CASE WHEN t = 1 THEN dd END) AS d1
        |  FROM a)
        |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
        |  CAST(h0 AS BIGINT) AS h0, CAST(h1 AS BIGINT) AS h1,
        |  round(tm0, 6) AS tmean0, round(tm1, 6) AS tmean1,
        |  round(tm1 - tm0, 6) AS diff, round(sqrt(d0 + d1), 6) AS se,
        |  round((tm1 - tm0) / sqrt(d0 + d1), 4) AS t_stat,
        |  round((d0 + d1) * (d0 + d1)
        |    / (d0 * d0 / (h0 - 1) + d1 * d1 / (h1 - 1)), 2) AS df
        |FROM f""".stripMargin,
    "q183_mcnemar" ->
      // discordant-cell closed forms with the continuity correction
      """WITH b AS (SELECT CASE WHEN value > 60 THEN 1 ELSE 0 END AS a,
        |    CASE WHEN user_id % 3 = 0 THEN 1 ELSE 0 END AS b
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
        |m AS (SELECT count(*) AS n,
        |    sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END) AS n00,
        |    sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END) AS n11,
        |    sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END) AS n10,
        |    sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END) AS n01
        |  FROM b)
        |SELECT CAST(n AS BIGINT) AS n, CAST(n00 AS BIGINT) AS both0,
        |  CAST(n11 AS BIGINT) AS both1, CAST(n10 AS BIGINT) AS only_a,
        |  CAST(n01 AS BIGINT) AS only_b,
        |  round((n01 - n10) / sqrt(CAST(n10 + n01 AS DOUBLE)), 4) AS z,
        |  round(greatest(0.0, abs(CAST(n01 - n10 AS DOUBLE)) - 1.0)
        |    * greatest(0.0, abs(CAST(n01 - n10 AS DOUBLE)) - 1.0)
        |    / (n10 + n01), 4) AS chisq_cc
        |FROM m""".stripMargin,
    "q184_cohens_kappa" ->
      // confusion cells + margins, kappa closed form with Cohen's
      // large-sample se
      """WITH b AS (SELECT event_type AS a,
        |    CASE WHEN user_id % 10 < 8 THEN event_type ELSE 'other' END AS b
        |  FROM events WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
        |c AS (SELECT a, b, count(*) AS c FROM b GROUP BY 1, 2),
        |ra AS (SELECT a, sum(c) AS ca FROM c GROUP BY 1),
        |rb AS (SELECT b, sum(c) AS cb FROM c GROUP BY 1),
        |mg AS (SELECT sum(CAST(coalesce(ra.ca, 0) AS DOUBLE)
        |      * CAST(coalesce(rb.cb, 0) AS DOUBLE)) AS pesum,
        |    count(*) AS k
        |  FROM ra FULL JOIN rb ON ra.a = rb.b),
        |tt AS (SELECT sum(c) AS n,
        |    sum(CASE WHEN a = b THEN c ELSE 0 END) AS agree FROM c),
        |f AS (SELECT n, k, agree * 1.0 / n AS po,
        |    pesum / (CAST(n AS DOUBLE) * n) AS pe
        |  FROM tt, mg)
        |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS categories,
        |  round(po, 6) AS po, round(pe, 6) AS pe,
        |  round((po - pe) / (1 - pe), 6) AS kappa,
        |  round(sqrt(po * (1 - po)) / ((1 - pe) * sqrt(CAST(n AS DOUBLE))), 6)
        |    AS se,
        |  round(((po - pe) / (1 - pe))
        |    / (sqrt(po * (1 - po)) / ((1 - pe) * sqrt(CAST(n AS DOUBLE)))), 4)
        |    AS z
        |FROM f""".stripMargin,
    "q185_rdd_bandwidth" ->
      // h = 1.84 * sd * n^(-1/5)
      """SELECT CAST(count(*) AS BIGINT) AS n,
        |  round(stddev_samp(CAST(l_quantity AS DOUBLE)), 6) AS sd,
        |  round(1.84 * stddev_samp(CAST(l_quantity AS DOUBLE))
        |    * pow(count(*), -0.2), 6) AS h
        |FROM lineitem
        |WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL"""
        .stripMargin,
    "q180_prop_test" ->
      // Wilson algebra per arm + Newcombe square-and-add, closed form
      """WITH b AS (SELECT CASE WHEN value > 60 THEN 1 ELSE 0 END AS s,
        |    CAST(user_id % 2 AS INT) AS t
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
        |m AS (SELECT t, count(*) AS n, sum(s) AS s FROM b GROUP BY 1),
        |w AS (SELECT t, n, s, s * 1.0 / n AS p,
        |    (s * 1.0 / n + 3.841458820694124 / n / 2
        |      - 1.959963984540054 * sqrt((s * 1.0 / n) * (1 - s * 1.0 / n) / n
        |        + 3.841458820694124 / n / (4 * n)))
        |      / (1 + 3.841458820694124 / n) AS lo,
        |    (s * 1.0 / n + 3.841458820694124 / n / 2
        |      + 1.959963984540054 * sqrt((s * 1.0 / n) * (1 - s * 1.0 / n) / n
        |        + 3.841458820694124 / n / (4 * n)))
        |      / (1 + 3.841458820694124 / n) AS hi
        |  FROM m),
        |f AS (SELECT
        |    max(CASE WHEN t = 0 THEN n END) AS n0,
        |    max(CASE WHEN t = 1 THEN n END) AS n1,
        |    max(CASE WHEN t = 0 THEN s END) AS s0,
        |    max(CASE WHEN t = 1 THEN s END) AS s1,
        |    max(CASE WHEN t = 0 THEN p END) AS p0,
        |    max(CASE WHEN t = 1 THEN p END) AS p1,
        |    max(CASE WHEN t = 0 THEN lo END) AS l0,
        |    max(CASE WHEN t = 1 THEN lo END) AS l1,
        |    max(CASE WHEN t = 0 THEN hi END) AS u0,
        |    max(CASE WHEN t = 1 THEN hi END) AS u1
        |  FROM w)
        |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
        |  CAST(s0 AS BIGINT) AS s0, CAST(s1 AS BIGINT) AS s1,
        |  round(p0, 6) AS p0, round(p1, 6) AS p1,
        |  round(l0, 6) AS p0_lower, round(u0, 6) AS p0_upper,
        |  round(l1, 6) AS p1_lower, round(u1, 6) AS p1_upper,
        |  round(p1 - p0, 6) AS diff,
        |  round(p1 - p0 - sqrt((p1-l1)*(p1-l1) + (u0-p0)*(u0-p0)), 6)
        |    AS diff_lower,
        |  round(p1 - p0 + sqrt((u1-p1)*(u1-p1) + (p0-l0)*(p0-l0)), 6)
        |    AS diff_upper,
        |  round((p1 - p0) / sqrt(((s0+s1)*1.0/(n0+n1))
        |    * (1 - (s0+s1)*1.0/(n0+n1)) * (1.0/n0 + 1.0/n1)), 4) AS z
        |FROM f""".stripMargin,
    "q181_benford" ->
      // same arithmetic digit extraction (incl. the raw=10 remap), cells
      // left-joined to the 1..9 digit table, chi-square from unrounded
      // shares
      """WITH b AS (SELECT abs(CAST(l_extendedprice AS DOUBLE)) AS v
        |  FROM lineitem
        |  WHERE l_extendedprice IS NOT NULL
        |    AND abs(CAST(l_extendedprice AS DOUBLE)) > 0),
        |c AS (SELECT CASE WHEN floor(v / pow(10, floor(log10(v)))) = 10
        |      THEN 1
        |      ELSE CAST(floor(v / pow(10, floor(log10(v)))) AS INT) END
        |      AS digit,
        |    count(*) AS n
        |  FROM b GROUP BY 1),
        |tt AS (SELECT CAST(sum(n) AS DOUBLE) AS tot FROM c),
        |d AS (SELECT CAST(g.k AS INT) AS digit,
        |    log10(1.0 + 1.0 / g.k) AS ex
        |  FROM generate_series(1, 9) g(k))
        |SELECT d.digit, CAST(coalesce(c.n, 0) AS BIGINT) AS n,
        |  round(coalesce(c.n, 0) / tot, 6) AS share,
        |  round(ex, 6) AS expected_share,
        |  round(tot * (coalesce(c.n, 0) / tot - ex)
        |    * (coalesce(c.n, 0) / tot - ex) / ex, 4) AS chisq_term
        |FROM d LEFT JOIN c ON c.digit = d.digit, tt
        |ORDER BY d.digit""".stripMargin,
    "q178_weighted_ttest" ->
      // per-arm weighted moments, V = (Σw²y² − 2μΣw²y + μ²Σw²)/(Σw)²
      """WITH b AS (SELECT CAST(value AS DOUBLE) AS y,
        |    CAST(user_id % 2 AS INT) AS t,
        |    CAST(user_id % 5 + 1 AS DOUBLE) AS w
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
        |m AS (SELECT t, count(*) AS n, sum(w) AS sw, sum(w*y) AS swy,
        |    sum(w*w) AS sw2, sum(w*w*y) AS sw2y, sum(w*w*y*y) AS sw2yy
        |  FROM b GROUP BY 1),
        |a AS (SELECT t, n, sw*sw/sw2 AS ess, swy/sw AS mu,
        |    greatest(0.0, sw2yy - 2*(swy/sw)*sw2y
        |      + (swy/sw)*(swy/sw)*sw2) / (sw*sw) AS v
        |  FROM m)
        |SELECT CAST(max(CASE WHEN t = 0 THEN n END) AS BIGINT) AS n0,
        |  CAST(max(CASE WHEN t = 1 THEN n END) AS BIGINT) AS n1,
        |  round(max(CASE WHEN t = 0 THEN ess END), 3) AS ess0,
        |  round(max(CASE WHEN t = 1 THEN ess END), 3) AS ess1,
        |  round(max(CASE WHEN t = 0 THEN mu END), 6) AS mean0,
        |  round(max(CASE WHEN t = 1 THEN mu END), 6) AS mean1,
        |  round(max(CASE WHEN t = 1 THEN mu END)
        |    - max(CASE WHEN t = 0 THEN mu END), 6) AS diff,
        |  round(sqrt(sum(v)), 6) AS se,
        |  round((max(CASE WHEN t = 1 THEN mu END)
        |    - max(CASE WHEN t = 0 THEN mu END)) / sqrt(sum(v)), 4) AS z
        |FROM a""".stripMargin,
    "q179_gini" ->
      // ascending row_number, G = 2Σiy/(nΣy) − (n+1)/n, integer-division
      // top-share cutoffs exactly as the Spark side computes them
      """WITH b AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem),
        |nn AS (SELECT count(*) AS n FROM b),
        |r AS (SELECT v, row_number() OVER (ORDER BY v) AS rk FROM b),
        |a AS (SELECT sum(v) AS total, sum(v * rk) AS iy,
        |    sum(CASE WHEN rk > (SELECT n - n // 100 FROM nn)
        |      THEN v ELSE 0 END) AS top1,
        |    sum(CASE WHEN rk > (SELECT n - n // 10 FROM nn)
        |      THEN v ELSE 0 END) AS top10
        |  FROM r)
        |SELECT CAST(nn.n AS BIGINT) AS n, round(total, 2) AS total,
        |  round(total / nn.n, 6) AS mean,
        |  round(2.0 * iy / (nn.n * total) - (nn.n + 1.0) / nn.n, 6) AS gini,
        |  round(top1 / total, 6) AS top1_share,
        |  round(top10 / total, 6) AS top10_share
        |FROM a, nn""".stripMargin,
    "q177_rmst" ->
      // q107's KM estimator, then the step integral to tau, suffix areas
      // A_j, and the Greenwood-type variance as windows over the cells
      """WITH s AS (SELECT l_returnflag AS arm, CAST(l_quantity AS INT) AS time,
        |              CAST(l_linenumber % 2 AS INT) AS event FROM lineitem),
        |g AS (SELECT arm, time, sum(event) AS d, count(*) AS c
        |      FROM s GROUP BY 1, 2),
        |o AS (SELECT arm, time, d, c,
        |        sum(c) OVER (PARTITION BY arm ORDER BY time
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
        |      FROM g),
        |t AS (SELECT arm, sum(c) AS tot FROM g GROUP BY 1),
        |r AS (SELECT o.arm, time, d, c, tot - cumc + c AS n_risk
        |      FROM o JOIN t ON o.arm = t.arm),
        |km AS (SELECT arm, time, d, c, n_risk,
        |  exp(sum(ln(1.0 - d * 1.0 / n_risk))
        |    OVER (PARTITION BY arm ORDER BY time
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS surv
        |  FROM r),
        |leq AS (SELECT *, CAST(time AS DOUBLE) AS td FROM km
        |  WHERE time <= 40.0),
        |e AS (SELECT arm, td, d, n_risk, surv,
        |    coalesce(least(lead(td) OVER (PARTITION BY arm ORDER BY td),
        |      40.0), 40.0) AS nxt,
        |    min(td) OVER (PARTITION BY arm) AS frst
        |  FROM leq),
        |e2 AS (SELECT arm, td, d, n_risk, frst,
        |    surv * (nxt - td) AS contrib FROM e),
        |e3 AS (SELECT arm, td, d, n_risk, frst, contrib,
        |    frst + sum(contrib) OVER (PARTITION BY arm) AS total,
        |    coalesce(sum(contrib) OVER (PARTITION BY arm ORDER BY td
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
        |      AS prefix
        |  FROM e2),
        |e4 AS (SELECT arm, d, total,
        |    total - (frst + prefix) AS aj,
        |    CASE WHEN d > 0 AND n_risk > d
        |      THEN (total - (frst + prefix)) * (total - (frst + prefix))
        |        * d / (n_risk * (n_risk - d)) ELSE 0.0 END AS vterm
        |  FROM e3),
        |ga AS (SELECT arm, max(total) AS rmst, sum(vterm) AS v,
        |    sum(d) AS events FROM e4 GROUP BY 1),
        |tn AS (SELECT arm, sum(c) AS n FROM g GROUP BY 1)
        |SELECT tn.arm AS "group", 40.0 AS tau, CAST(tn.n AS BIGINT) AS n,
        |  CAST(ga.events AS BIGINT) AS events,
        |  round(ga.rmst, 6) AS rmst, round(sqrt(ga.v), 6) AS se,
        |  round(ga.rmst - 1.959963984540054 * sqrt(ga.v), 6) AS lower,
        |  round(ga.rmst + 1.959963984540054 * sqrt(ga.v), 6) AS upper
        |FROM tn JOIN ga ON tn.arm = ga.arm
        |ORDER BY tn.arm""".stripMargin,
    "q176_p_adjust" ->
      // Holm = prefix max of (m-rank+1)*p; BY = BH scaled by the
      // harmonic number c(m) (generated-series sum), suffix min
      """WITH t AS (SELECT DISTINCT l_orderkey AS test_id,
        |    ((l_orderkey * 13) % 1000) / 1000.0 + 0.0005 AS p
        |  FROM lineitem WHERE l_linenumber = 1 AND l_orderkey % 97 = 0),
        |r AS (SELECT test_id, p,
        |    row_number() OVER (ORDER BY p) AS rank,
        |    count(*) OVER () AS m FROM t),
        |cm AS (SELECT sum(1.0 / rank) AS c FROM r),
        |q AS (SELECT test_id, p, rank,
        |    least(1.0, p * (m - rank + 1)) AS qh,
        |    least(1.0, p * (SELECT c FROM cm) * m / rank) AS qb
        |  FROM r),
        |a AS (SELECT test_id, p,
        |    max(qh) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING) AS ph,
        |    min(qb) OVER (ORDER BY rank
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS pb
        |  FROM q)
        |SELECT test_id, round(p, 6) AS p_value, round(ph, 6) AS p_holm,
        |  round(pb, 6) AS p_by
        |FROM a ORDER BY test_id""".stripMargin,
    "q175_changepoint" ->
      // the CUSUM path in a window, the argmax with the exact Spark
      // tiebreak, and the truncated Kolmogorov series over a generated
      // k = 1..100 table
      """WITH cells AS (SELECT CAST(event_id % 100 AS BIGINT) AS p,
        |    avg(value + CASE WHEN event_id % 100 >= 60 THEN 5.0 ELSE 0 END)
        |      AS y
        |  FROM events WHERE event_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1),
        |st AS (SELECT count(*) AS t, avg(y) AS mu, stddev_samp(y) AS sd
        |  FROM cells),
        |cum AS (SELECT p, sum(y - (SELECT mu FROM st))
        |    OVER (ORDER BY p ROWS UNBOUNDED PRECEDING) AS c
        |  FROM cells),
        |top AS (SELECT p, abs(c) AS ac FROM cum
        |  ORDER BY abs(c) DESC, p ASC LIMIT 1),
        |qq AS (SELECT top.ac / (st.sd * sqrt(st.t)) AS q, top.p AS cp,
        |    st.t AS t
        |  FROM top, st),
        |pv AS (SELECT least(1.0, 2.0 * sum(
        |      CASE WHEN g.k % 2 = 1 THEN 1.0 ELSE -1.0 END
        |        * exp(-2.0 * g.k * g.k * qq.q * qq.q))) AS p
        |  FROM qq, generate_series(1, 100) g(k)),
        |sides AS (SELECT
        |    avg(CASE WHEN cells.p <= (SELECT cp FROM qq) THEN y END) AS mb,
        |    avg(CASE WHEN cells.p > (SELECT cp FROM qq) THEN y END) AS ma
        |  FROM cells)
        |SELECT CAST(qq.t AS BIGINT) AS n_periods,
        |  CAST(qq.cp AS BIGINT) AS change_period,
        |  round(qq.q, 6) AS stat, round(pv.p, 6) AS p_value,
        |  round(sides.mb, 6) AS mean_before,
        |  round(sides.ma, 6) AS mean_after,
        |  round(sides.ma - sides.mb, 6) AS shift
        |FROM qq, pv, sides""".stripMargin,
    "q174_its" ->
      // segmented-regression closed form: 12 moment sums per segment,
      // 2x2 solves, HC0 sandwich for intercept AND slope rows
      """WITH p AS (SELECT
        |    CAST(event_id % 1000 AS DOUBLE) - 500.0 AS x,
        |    value + CASE WHEN event_id % 1000 >= 500 THEN 8.0 ELSE 0 END
        |      + CAST(event_id % 1000 AS DOUBLE) *
        |        CASE WHEN event_id % 1000 >= 500 THEN 0.02 ELSE 0.01 END AS y
        |  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL),
        |m AS (SELECT CASE WHEN x >= 0 THEN 1 ELSE 0 END AS r,
        |    count(*) AS cnt, sum(1.0) AS n, sum(x) AS sx, sum(x*x) AS sxx,
        |    sum(x*x*x) AS x3, sum(x*x*x*x) AS x4,
        |    sum(y) AS sy, sum(x*y) AS sxy, sum(x*x*y) AS xxy,
        |    sum(x*x*x*y) AS x3y,
        |    sum(y*y) AS syy, sum(x*y*y) AS xyy, sum(x*x*y*y) AS xxyy
        |  FROM p GROUP BY 1),
        |ab AS (SELECT *, n*sxx - sx*sx AS det,
        |    (sxx*sy - sx*sxy) / (n*sxx - sx*sx) AS alpha,
        |    (n*sxy - sx*sy) / (n*sxx - sx*sx) AS beta
        |  FROM m),
        |vv AS (SELECT r, cnt, alpha, beta, det, n, sx, sxx,
        |    syy - 2*alpha*sy - 2*beta*sxy
        |      + alpha*alpha*n + 2*alpha*beta*sx + beta*beta*sxx AS m0,
        |    xyy - 2*alpha*sxy - 2*beta*xxy
        |      + alpha*alpha*sx + 2*alpha*beta*sxx + beta*beta*x3 AS m1,
        |    xxyy - 2*alpha*xxy - 2*beta*x3y
        |      + alpha*alpha*sxx + 2*alpha*beta*x3 + beta*beta*x4 AS m2
        |  FROM ab),
        |v2 AS (SELECT r, cnt, alpha, beta,
        |    (sxx*sxx*m0 - 2*sxx*sx*m1 + sx*sx*m2) / (det*det) AS va,
        |    (sx*sx*m0 - 2*n*sx*m1 + n*n*m2) / (det*det) AS vb
        |  FROM vv),
        |f AS (SELECT
        |    max(CASE WHEN r = 0 THEN cnt END) AS n_pre,
        |    max(CASE WHEN r = 1 THEN cnt END) AS n_post,
        |    max(CASE WHEN r = 0 THEN alpha END) AS al,
        |    max(CASE WHEN r = 1 THEN alpha END) AS ar,
        |    max(CASE WHEN r = 0 THEN beta END) AS bl,
        |    max(CASE WHEN r = 1 THEN beta END) AS br,
        |    sqrt(sum(va)) AS sel, sqrt(sum(vb)) AS ses
        |  FROM v2)
        |SELECT CAST(n_pre AS BIGINT) AS n_pre,
        |  CAST(n_post AS BIGINT) AS n_post,
        |  round(al, 6) AS level_pre, round(ar, 6) AS level_post,
        |  round(ar - al, 6) AS level_change, round(sel, 6) AS se_level,
        |  round((ar - al) / sel, 4) AS z_level,
        |  round(bl, 6) AS slope_pre, round(br, 6) AS slope_post,
        |  round(br - bl, 6) AS slope_change, round(ses, 6) AS se_slope,
        |  round((br - bl) / ses, 4) AS z_slope
        |FROM f""".stripMargin,
    "q173_icc" ->
      // one-way random-effects ANOVA estimator, two-level closed-form SQL
      """WITH cells AS (SELECT user_id AS c, count(*) AS m,
        |    sum(CAST(value AS DOUBLE)) AS s,
        |    sum(CAST(value AS DOUBLE) * CAST(value AS DOUBLE)) AS ss
        |  FROM events WHERE value IS NOT NULL AND user_id IS NOT NULL
        |  GROUP BY 1),
        |a AS (SELECT CAST(sum(m) AS DOUBLE) AS n, count(*) AS k,
        |    CAST(sum(m*m) AS DOUBLE) AS m2, sum(s) AS s, sum(ss) AS ss,
        |    sum(s*s/m) AS sb
        |  FROM cells),
        |f AS (SELECT n, k,
        |    (sb - s*s/n) / (k - 1) AS msb,
        |    (ss - sb) / (n - k) AS msw,
        |    (n - m2/n) / (k - 1) AS m0
        |  FROM a),
        |g AS (SELECT n, k, msb, msw, m0,
        |    (msb - msw) / (msb + (m0 - 1.0) * msw) AS rho
        |  FROM f)
        |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS n_clusters,
        |  round(n / k, 6) AS m_bar, round(m0, 6) AS m0,
        |  round(msb, 3) AS msb, round(msw, 3) AS msw,
        |  round(rho, 6) AS icc,
        |  round(1.0 + (n / k - 1.0) * greatest(0.0, rho), 6) AS deff,
        |  round(n / (1.0 + (n / k - 1.0) * greatest(0.0, rho)), 3)
        |    AS n_effective
        |FROM g""".stripMargin,
    "q172_rdd_fuzzy" ->
      // the fuzzy generalization: 30 moment sums per side, both 2x2
      // fits, the HC0 sandwich for V(a_y), V(a_d), AND Cov(a_y, a_d)
      // (the cross-meat), then the delta-method Wald variance — all in
      // closed-form SQL
      """WITH p AS (SELECT
        |    CAST(l_quantity AS DOUBLE) - 25.5 AS x,
        |    CAST(CASE WHEN l_quantity >= 26
        |        THEN CASE WHEN l_orderkey % 10 < 7 THEN 1 ELSE 0 END
        |        ELSE CASE WHEN l_orderkey % 10 < 2 THEN 1 ELSE 0 END
        |      END AS DOUBLE) AS d,
        |    CAST(l_quantity AS DOUBLE) * 0.5
        |      + CAST(CASE WHEN l_quantity >= 26
        |          THEN CASE WHEN l_orderkey % 10 < 7 THEN 1 ELSE 0 END
        |          ELSE CASE WHEN l_orderkey % 10 < 2 THEN 1 ELSE 0 END
        |        END AS DOUBLE) * 40.0
        |      + CAST(l_extendedprice AS DOUBLE) / 10000 AS y
        |  FROM lineitem
        |  WHERE abs(CAST(l_quantity AS DOUBLE) - 25.5) < 10),
        |b AS (SELECT y, d, x, 1.0 - abs(x) / 10.0 AS w FROM p),
        |m AS (SELECT CASE WHEN x >= 0 THEN 1 ELSE 0 END AS r,
        |    count(*) AS n, sum(w) AS w, sum(w*x) AS wx, sum(w*x*x) AS wxx,
        |    sum(w*w) AS w2, sum(w*w*x) AS w2x, sum(w*w*x*x) AS w2xx,
        |    sum(w*w*x*x*x) AS w2x3, sum(w*w*x*x*x*x) AS w2x4,
        |    sum(w*y) AS wy, sum(w*x*y) AS wxy,
        |    sum(w*w*y) AS w2y, sum(w*w*x*y) AS w2xy,
        |    sum(w*w*x*x*y) AS w2xxy, sum(w*w*x*x*x*y) AS w2x3y,
        |    sum(w*w*y*y) AS w2yy, sum(w*w*x*y*y) AS w2xyy,
        |    sum(w*w*x*x*y*y) AS w2xxyy,
        |    sum(w*d) AS wd, sum(w*x*d) AS wxd,
        |    sum(w*w*d) AS w2d, sum(w*w*x*d) AS w2xd,
        |    sum(w*w*x*x*d) AS w2xxd, sum(w*w*x*x*x*d) AS w2x3d,
        |    sum(w*w*d*d) AS w2dd, sum(w*w*x*d*d) AS w2xdd,
        |    sum(w*w*x*x*d*d) AS w2xxdd,
        |    sum(w*w*y*d) AS w2yd, sum(w*w*x*y*d) AS w2xyd,
        |    sum(w*w*x*x*y*d) AS w2xxyd
        |  FROM b GROUP BY 1),
        |ab AS (SELECT *, w*wxx - wx*wx AS det,
        |    (wxx*wy - wx*wxy) / (w*wxx - wx*wx) AS ay,
        |    (w*wxy - wx*wy) / (w*wxx - wx*wx) AS byy,
        |    (wxx*wd - wx*wxd) / (w*wxx - wx*wx) AS ad,
        |    (w*wxd - wx*wd) / (w*wxx - wx*wx) AS bd
        |  FROM m),
        |vv AS (SELECT r, n, ay, ad, det, wxx, wx,
        |    w2yy - 2*ay*w2y - 2*byy*w2xy
        |      + ay*ay*w2 + 2*ay*byy*w2x + byy*byy*w2xx AS m0y,
        |    w2xyy - 2*ay*w2xy - 2*byy*w2xxy
        |      + ay*ay*w2x + 2*ay*byy*w2xx + byy*byy*w2x3 AS m1y,
        |    w2xxyy - 2*ay*w2xxy - 2*byy*w2x3y
        |      + ay*ay*w2xx + 2*ay*byy*w2x3 + byy*byy*w2x4 AS m2y,
        |    w2dd - 2*ad*w2d - 2*bd*w2xd
        |      + ad*ad*w2 + 2*ad*bd*w2x + bd*bd*w2xx AS m0d,
        |    w2xdd - 2*ad*w2xd - 2*bd*w2xxd
        |      + ad*ad*w2x + 2*ad*bd*w2xx + bd*bd*w2x3 AS m1d,
        |    w2xxdd - 2*ad*w2xxd - 2*bd*w2x3d
        |      + ad*ad*w2xx + 2*ad*bd*w2x3 + bd*bd*w2x4 AS m2d,
        |    w2yd - ad*w2y - bd*w2xy - ay*w2d - byy*w2xd
        |      + ay*ad*w2 + (ay*bd + byy*ad)*w2x + byy*bd*w2xx AS m0c,
        |    w2xyd - ad*w2xy - bd*w2xxy - ay*w2xd - byy*w2xxd
        |      + ay*ad*w2x + (ay*bd + byy*ad)*w2xx + byy*bd*w2x3 AS m1c,
        |    w2xxyd - ad*w2xxy - bd*w2x3y - ay*w2xxd - byy*w2x3d
        |      + ay*ad*w2xx + (ay*bd + byy*ad)*w2x3 + byy*bd*w2x4 AS m2c
        |  FROM ab),
        |v2 AS (SELECT r, n, ay, ad,
        |    (wxx*wxx*m0y - 2*wxx*wx*m1y + wx*wx*m2y) / (det*det) AS vy,
        |    (wxx*wxx*m0d - 2*wxx*wx*m1d + wx*wx*m2d) / (det*det) AS vd,
        |    (wxx*wxx*m0c - 2*wxx*wx*m1c + wx*wx*m2c) / (det*det) AS cyd
        |  FROM vv),
        |fin AS (SELECT
        |    max(CASE WHEN r = 0 THEN n END) AS n_left,
        |    max(CASE WHEN r = 1 THEN n END) AS n_right,
        |    max(CASE WHEN r = 1 THEN ay END)
        |      - max(CASE WHEN r = 0 THEN ay END) AS jy,
        |    max(CASE WHEN r = 1 THEN ad END)
        |      - max(CASE WHEN r = 0 THEN ad END) AS jd,
        |    sum(vy) AS vy, sum(vd) AS vd, sum(cyd) AS cyd
        |  FROM v2)
        |SELECT CAST(n_left AS BIGINT) AS n_left,
        |  CAST(n_right AS BIGINT) AS n_right,
        |  round(jy, 6) AS jump_y, round(jd, 6) AS jump_d,
        |  round(sqrt(vd), 6) AS se_first,
        |  round(jy / jd, 6) AS tau,
        |  round(sqrt((vy + (jy/jd)*(jy/jd)*vd - 2*(jy/jd)*cyd)
        |    / (jd*jd)), 6) AS se,
        |  round((jy / jd) / sqrt((vy + (jy/jd)*(jy/jd)*vd
        |    - 2*(jy/jd)*cyd) / (jd*jd)), 4) AS z
        |FROM fin""".stripMargin,
    "q167_bayes_best_arm" ->
      // n/s/rate are honest closed forms (posterior mean = (1+s)/(2+n));
      // p_best/expected_loss are deterministic Simpson quadrature over
      // the Beta posteriors — pinned at sf0.01 (q149/q165 idiom)
      """WITH m AS (SELECT CAST(user_id % 3 AS VARCHAR) AS arm,
        |    count(*) AS n,
        |    sum(CASE WHEN value > 60 THEN 1 ELSE 0 END) AS s
        |  FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |  GROUP BY 1)
        |SELECT m.arm, CAST(m.n AS BIGINT) AS n, CAST(m.s AS BIGINT) AS s,
        |  round((1.0 + m.s) / (2.0 + m.n), 6) AS rate,
        |  p.p_best, p.expected_loss, '0.01' AS oracle_sf
        |FROM m JOIN (VALUES
        |    ('0', 0.094211, 0.014028),
        |    ('1', 0.585509, 0.003201),
        |    ('2', 0.32028, 0.007271))
        |  AS p(arm, p_best, expected_loss) ON p.arm = m.arm
        |ORDER BY m.arm""".stripMargin,
    "q166_stratified_ate" ->
      // the blocked difference-in-means closed form: stratum moment
      // cells, population-weighted combine — plain two-level SQL
      """WITH cells AS (SELECT l_returnflag AS flag,
        |    count(*) FILTER (WHERE l_orderkey % 2 = 0) AS n0,
        |    count(*) FILTER (WHERE l_orderkey % 2 = 1) AS n1,
        |    avg(CAST(l_extendedprice AS DOUBLE))
        |      FILTER (WHERE l_orderkey % 2 = 0) AS m0,
        |    avg(CAST(l_extendedprice AS DOUBLE))
        |      FILTER (WHERE l_orderkey % 2 = 1) AS m1,
        |    var_samp(CAST(l_extendedprice AS DOUBLE))
        |      FILTER (WHERE l_orderkey % 2 = 0) AS v0,
        |    var_samp(CAST(l_extendedprice AS DOUBLE))
        |      FILTER (WHERE l_orderkey % 2 = 1) AS v1
        |  FROM lineitem GROUP BY 1)
        |SELECT CAST(sum(n0 + n1) AS BIGINT) AS n,
        |  CAST(count(*) AS BIGINT) AS n_strata,
        |  round(sum((n0 + n1) * (m1 - m0)) / sum(n0 + n1), 6) AS ate,
        |  round(sqrt(sum((n0 + n1) * (n0 + n1) * (v1 / n1 + v0 / n0)))
        |    / sum(n0 + n1), 6) AS se,
        |  round((sum((n0 + n1) * (m1 - m0)) / sum(n0 + n1)) /
        |    (sqrt(sum((n0 + n1) * (n0 + n1) * (v1 / n1 + v0 / n0)))
        |      / sum(n0 + n1)), 6) AS z
        |FROM cells""".stripMargin,
    "q145_multimodal_sql" ->
      // planted-pair closed form on the 1-in-4 subset: every key % 20 == 0
      // is also % 4 == 0, so each contributes exactly one (k, k + 2^40)
      // pair at hamming 0
      """WITH c AS (SELECT p_partkey AS k FROM part WHERE p_partkey % 20 = 0)
        |SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS n_pairs,
        |  CAST((SELECT sum(2 * k + 1099511627776) FROM c) AS BIGINT) AS pair_id_sum,
        |  CAST(0 AS INT) AS max_hamming""".stripMargin,
    "q146_video_metadata" ->
      // the fixture metadata in closed form: corrupt rows (k % 50 = 0)
      // contribute nulls, audio rows (k % 3 = 0) one extra track
      """WITH p AS (SELECT p_partkey AS k, p_partkey % 50 = 0 AS corrupt,
        |    p_partkey % 3 = 0 AS audio FROM part)
        |SELECT CAST(count(*) AS BIGINT) AS n_videos,
        |  CAST(sum(CASE WHEN corrupt THEN 0 ELSE 1 END) AS BIGINT) AS n_decoded,
        |  CAST(sum(CASE WHEN corrupt THEN NULL ELSE k % 100000 + 1000 END) AS BIGINT) AS dur_ms_sum,
        |  CAST(sum(CASE WHEN corrupt THEN NULL ELSE k % 640 + 16 END) AS BIGINT) AS w_sum,
        |  CAST(sum(CASE WHEN corrupt THEN NULL ELSE k % 360 + 9 END) AS BIGINT) AS h_sum,
        |  CAST(sum(CASE WHEN corrupt THEN 0 WHEN audio THEN 2 ELSE 1 END) AS BIGINT) AS tracks_sum,
        |  CAST(sum(CASE WHEN corrupt THEN 0 ELSE 1 END) AS BIGINT) AS n_avc1,
        |  CAST(sum(CASE WHEN corrupt THEN 0 WHEN audio THEN 1 ELSE 0 END) AS BIGINT) AS n_mp4a
        |FROM p""".stripMargin,
    "q147_msprt_by" ->
      // q135's window closed forms, partitioned by experiment
      """WITH cells AS (SELECT CAST(user_id % 3 AS VARCHAR) AS experiment,
        |    epoch_ns(ts) // 86400000000000 AS bucket,
        |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN user_id % 2 = 1 THEN value ELSE 0 END) AS s1,
        |    sum(CASE WHEN user_id % 2 = 1 THEN value * value ELSE 0 END) AS q1,
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n0,
        |    sum(CASE WHEN user_id % 2 = 0 THEN value ELSE 0 END) AS s0,
        |    sum(CASE WHEN user_id % 2 = 0 THEN value * value ELSE 0 END) AS q0
        |  FROM events
        |  WHERE value IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |cum AS (SELECT experiment, bucket,
        |    sum(n1) OVER w AS cn1, sum(s1) OVER w AS cs1, sum(q1) OVER w AS cq1,
        |    sum(n0) OVER w AS cn0, sum(s0) OVER w AS cs0, sum(q0) OVER w AS cq0
        |  FROM cells
        |  WINDOW w AS (PARTITION BY experiment ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |v AS (SELECT experiment, bucket, cn1, cn0, cs1 / cn1 - cs0 / cn0 AS d,
        |    ((cq1 - cs1 * cs1 / cn1) + (cq0 - cs0 * cs0 / cn0)) / (cn1 + cn0 - 2)
        |      * (1.0 / cn1 + 1.0 / cn0) AS vv
        |  FROM cum WHERE cn1 >= 2 AND cn0 >= 2),
        |l AS (SELECT experiment, bucket, cn1, cn0, d,
        |    sqrt(vv / (vv + 1.0)) * exp(d * d * 1.0 / (2.0 * vv * (vv + 1.0))) AS lambda
        |  FROM v WHERE vv > 0),
        |f AS (SELECT *, max(lambda) OVER
        |    (PARTITION BY experiment ORDER BY bucket
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mx
        |  FROM l)
        |SELECT experiment, bucket, CAST(cn1 AS BIGINT) AS n1,
        |  CAST(cn0 AS BIGINT) AS n0,
        |  round(d, 6) AS estimate, round(lambda, 6) AS lambda,
        |  round(least(1.0, 1.0 / mx), 6) AS p_always_valid
        |FROM f ORDER BY experiment, bucket""".stripMargin,
    "q277_cox_ph_efron" ->
      // pinned Efron-ties Newton estimates at sf0.01 (q142 idiom); n and
      // n_events are live closed forms
      """WITH s AS (SELECT count(*) AS n,
        |    CAST(sum(l_linenumber % 2) AS BIGINT) AS n_events FROM lineitem)
        |SELECT 'x1' AS term, CAST(0.020925 AS DOUBLE) AS estimate,
        |  CAST(0.018589 AS DOUBLE) AS stderr,
        |  CAST(1.1256 AS DOUBLE) AS z_value,
        |  CAST(n AS BIGINT) AS n, n_events, '0.01' AS oracle_sf FROM s
        |UNION ALL SELECT 'x2', CAST(-0.002595 AS DOUBLE),
        |  CAST(0.010800 AS DOUBLE), CAST(-0.2403 AS DOUBLE),
        |  CAST(n AS BIGINT), n_events, '0.01' FROM s
        |ORDER BY term""".stripMargin,
    "q278_cox_ph_cluster" ->
      // pinned sandwich SEs at sf0.01 (q142 idiom); n / n_events /
      // n_clusters are live closed forms
      """WITH s AS (SELECT count(*) AS n,
        |    CAST(sum(l_linenumber % 2) AS BIGINT) AS n_events,
        |    CAST(count(DISTINCT l_orderkey % 200) AS BIGINT)
        |      AS n_clusters FROM lineitem)
        |SELECT 'x1' AS term, CAST(0.018778 AS DOUBLE) AS estimate,
        |  CAST(0.018590 AS DOUBLE) AS se_model,
        |  CAST(0.017730 AS DOUBLE) AS se_robust,
        |  CAST(1.0591 AS DOUBLE) AS z_robust,
        |  CAST(n AS BIGINT) AS n, n_events, n_clusters,
        |  '0.01' AS oracle_sf FROM s
        |UNION ALL SELECT 'x2', CAST(-0.001958 AS DOUBLE),
        |  CAST(0.010800 AS DOUBLE), CAST(0.010915 AS DOUBLE),
        |  CAST(-0.1793 AS DOUBLE),
        |  CAST(n AS BIGINT), n_events, n_clusters, '0.01' FROM s
        |ORDER BY term""".stripMargin,
    "q280_fine_gray_cif" ->
      // fully LIVE at explicit beta literals (q275 idiom): censoring-KM
      // left limits, the at-risk suffix, the IPCW competing prefix, and
      // the hazard prefix all replay as window chains over time cells
      """WITH s AS (SELECT CAST(l_quantity AS INT) AS t,
        |    CAST(l_linenumber % 3 AS INT) AS c,
        |    exp(0.02 * (l_discount * 10.0) + 0.01 * (l_orderkey % 2)) AS w
        |  FROM lineitem),
        |cells AS (SELECT t, count(*) AS n_tot,
        |    sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS dc,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        |    sum(w) AS wall,
        |    sum(CASE WHEN c >= 2 THEN w ELSE 0 END) AS wcomp
        |  FROM s GROUP BY t),
        |o AS (SELECT *, sum(n_tot) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
        |  FROM cells),
        |tot AS (SELECT sum(n_tot) AS n FROM cells),
        |r AS (SELECT o.*, tot.n - cum_n + n_tot AS atrisk FROM o, tot),
        |g AS (SELECT *, exp(coalesce(sum(ln(1.0 -
        |      CAST(dc AS DOUBLE) / atrisk)) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0))
        |    AS g_minus
        |  FROM r),
        |a AS (SELECT *,
        |    sum(wall) OVER (ORDER BY t
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS a0,
        |    coalesce(sum(wcomp / g_minus) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
        |      AS b0prev
        |  FROM g),
        |ev AS (SELECT t, d1, a0 + g_minus * b0prev AS w0 FROM a
        |  WHERE d1 > 0),
        |h AS (SELECT t, d1, w0, sum(CAST(d1 AS DOUBLE) / w0) OVER (
        |    ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS h0
        |  FROM ev)
        |SELECT CAST(t AS DOUBLE) AS time, d1 AS n_events,
        |  round(w0, 4) AS w0, round(h0, 6) AS h0_cum,
        |  round(1.0 - exp(-h0 * exp(0.02 * 5.0 + 0.01 * 1.0)), 6) AS cif
        |FROM h ORDER BY time""".stripMargin,
    "q281_gray_test" ->
      // fully LIVE (the statistic is a score test at beta = 0, no
      // Newton): censoring-KM left limits, per-group at-risk suffixes,
      // per-group IPCW competing prefixes, then the score u and
      // information i close the chi2 in one aggregate
      """WITH s AS (SELECT CAST(l_quantity AS INT) AS t,
        |    CAST(l_linenumber % 3 AS INT) AS c,
        |    CAST(l_orderkey % 2 AS INT) AS g
        |  FROM lineitem),
        |cells AS (SELECT t, count(*) AS n_tot,
        |    sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS dc,
        |    CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS d1,
        |    CAST(sum(CASE WHEN c = 1 AND g = 1 THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS d1g,
        |    CAST(count(*) AS DOUBLE) AS wall,
        |    CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |      AS wallg,
        |    CAST(sum(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
        |      AS wcomp,
        |    CAST(sum(CASE WHEN c >= 2 AND g = 1 THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS wcompg
        |  FROM s GROUP BY t),
        |o AS (SELECT *, sum(n_tot) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
        |  FROM cells),
        |tot AS (SELECT sum(n_tot) AS n FROM cells),
        |r AS (SELECT o.*, tot.n - cum_n + n_tot AS atrisk FROM o, tot),
        |gkm AS (SELECT *, exp(coalesce(sum(ln(1.0 -
        |      CAST(dc AS DOUBLE) / atrisk)) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0))
        |    AS g_minus
        |  FROM r),
        |a AS (SELECT *,
        |    sum(wall) OVER (ORDER BY t
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS a0,
        |    sum(wallg) OVER (ORDER BY t
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS a0g,
        |    coalesce(sum(wcomp / g_minus) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
        |      AS b0p,
        |    coalesce(sum(wcompg / g_minus) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)
        |      AS b0pg
        |  FROM gkm),
        |ev AS (SELECT t, d1, d1g, a0 + g_minus * b0p AS w0,
        |    a0g + g_minus * b0pg AS w0g
        |  FROM a WHERE d1 > 0),
        |stat AS (SELECT
        |    sum(d1 - d1g) AS obs0, sum(d1 * (1.0 - w0g / w0)) AS exp0,
        |    sum(d1g) AS obs1, sum(d1 * w0g / w0) AS exp1,
        |    sum(d1g - d1 * w0g / w0) AS u,
        |    sum(d1 * (w0g / w0) * (1.0 - w0g / w0)) AS i
        |  FROM ev),
        |cnt AS (SELECT CAST(l_orderkey % 2 AS VARCHAR) AS group_value,
        |    CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(CASE WHEN l_linenumber % 3 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_events,
        |    CAST(sum(CASE WHEN l_linenumber % 3 = 2 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_competing
        |  FROM lineitem GROUP BY 1)
        |SELECT c.group_value, c.n, c.n_events, c.n_competing,
        |  CASE WHEN c.group_value = '0' THEN s2.obs0 ELSE s2.obs1 END
        |    AS observed,
        |  round(CASE WHEN c.group_value = '0' THEN s2.exp0 ELSE s2.exp1
        |    END, 4) AS expected,
        |  round(s2.u * s2.u / s2.i, 6) AS chi2,
        |  CAST(1 AS BIGINT) AS df
        |FROM cnt c, stat s2 ORDER BY c.group_value""".stripMargin,
    "q296_multinomial_score" ->
      // per-row softmax closed forms, argmax (ties to the LOWEST class
      // — the engine's strict-> fold), per-class collapse
      """WITH s AS (SELECT l_discount * 10.0 AS x1,
        |    l_quantity / 25.0 AS x2 FROM lineitem),
        |e AS (SELECT exp(0.2 - 0.5*x1 + 0.8*x2) AS e2,
        |    exp(-0.4 + 0.6*x1 - 0.9*x2) AS e3 FROM s),
        |p AS (SELECT 1.0/(1.0 + e2 + e3) AS p1, e2/(1.0 + e2 + e3) AS p2,
        |    e3/(1.0 + e2 + e3) AS p3 FROM e),
        |cls AS (SELECT *, CASE
        |    WHEN p1 >= p2 AND p1 >= p3 THEN 1
        |    WHEN p2 >= p3 THEN 2 ELSE 3 END AS pred_class FROM p)
        |SELECT CAST(pred_class AS INT) AS pred_class,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(avg(p1), 6) AS avg_p1, round(avg(p2), 6) AS avg_p2,
        |  round(avg(p3), 6) AS avg_p3
        |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin,
    "q295_multinomial_logit" ->
      // pinned damped-Newton MLE at sf0.01 (q142 idiom); n is live
      """WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem),
        |pins(class_value, term, estimate, stderr, z_value) AS (VALUES
        |  (2.0, '(intercept)', 0.040792, 0.021993, 1.8548),
        |  (2.0, 'x1', -0.049959, 0.034033, -1.4679),
        |  (2.0, 'x2', -0.045375, 0.019774, -2.2947),
        |  (3.0, '(intercept)', -0.059830, 0.022447, -2.6654),
        |  (3.0, 'x1', -0.018034, 0.034622, -0.5209),
        |  (3.0, 'x2', -0.010427, 0.020114, -0.5184))
        |SELECT p.class_value, p.term,
        |  CAST(p.estimate AS DOUBLE) AS estimate,
        |  CAST(p.stderr AS DOUBLE) AS stderr,
        |  CAST(p.z_value AS DOUBLE) AS z_value,
        |  s.n, CAST(3 AS BIGINT) AS n_levels, '0.01' AS oracle_sf
        |FROM pins p, s ORDER BY p.class_value, p.term""".stripMargin,
    "q294_platt_score" ->
      // pinned sigmoid values per score cell at sf0.01 (calibrated is
      // CONSTANT within a cell, so the 11 pins capture the whole fit);
      // n and the empirical rate stay live
      """WITH cells AS (SELECT round(l_discount * 10.0, 2) AS sc,
        |    CAST(count(*) AS BIGINT) AS n,
        |    round(avg(CASE WHEN l_quantity > 25 THEN 1.0 ELSE 0.0 END),
        |      6) AS rate
        |  FROM lineitem GROUP BY 1),
        |pins(sc, avg_cal) AS (VALUES
        |  (0.0, 0.500912), (0.1, 0.500382), (0.2, 0.499852),
        |  (0.3, 0.499322), (0.4, 0.498792), (0.5, 0.498262),
        |  (0.6, 0.497732), (0.7, 0.497202), (0.8, 0.496672),
        |  (0.9, 0.496142), (1.0, 0.495612))
        |SELECT c.sc, c.n, p.avg_cal, c.rate, '0.01' AS oracle_sf
        |FROM cells c JOIN pins p ON c.sc = p.sc
        |ORDER BY c.sc""".stripMargin,
    "q293_ordinal_score" ->
      // per-row cumulative sigmoids, category differences, argmax (ties
      // to the LOWEST class — matches the engine's strict-> fold), then
      // the per-class collapse
      """WITH s AS (SELECT l_discount * 10.0 AS x FROM lineitem),
        |p AS (SELECT
        |    1.0/(1.0 + exp(-(-0.2 - 1.2*x))) AS c1,
        |    1.0/(1.0 + exp(-(0.3 - 1.2*x))) AS c2,
        |    1.0/(1.0 + exp(-(0.8 - 1.2*x))) AS c3
        |  FROM s),
        |pr AS (SELECT c1 AS p1, c2 - c1 AS p2, c3 - c2 AS p3,
        |    1.0 - c3 AS p4 FROM p),
        |cls AS (SELECT *, CASE
        |    WHEN p1 >= p2 AND p1 >= p3 AND p1 >= p4 THEN 1
        |    WHEN p2 >= p3 AND p2 >= p4 THEN 2
        |    WHEN p3 >= p4 THEN 3 ELSE 4 END AS pred_class FROM pr)
        |SELECT CAST(pred_class AS INT) AS pred_class,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(avg(p1), 6) AS avg_p1, round(avg(p2), 6) AS avg_p2,
        |  round(avg(p3), 6) AS avg_p3, round(avg(p4), 6) AS avg_p4
        |FROM cls GROUP BY 1 ORDER BY 1""".stripMargin,
    "q292_gamma_reg" ->
      // pinned IRLS MLE at sf0.01 (q142 idiom); n is a live closed form
      """WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem)
        |SELECT * FROM (
        |SELECT '(intercept)' AS term, CAST(3.961445 AS DOUBLE)
        |    AS estimate,
        |  CAST(0.006152 AS DOUBLE) AS stderr,
        |  CAST(643.9554 AS DOUBLE) AS z_value, n,
        |  CAST(0.321531 AS DOUBLE) AS dispersion,
        |  '0.01' AS oracle_sf FROM s
        |UNION ALL SELECT 'x1', CAST(0.012848 AS DOUBLE),
        |  CAST(0.007969 AS DOUBLE), CAST(1.6123 AS DOUBLE), n,
        |  CAST(0.321531 AS DOUBLE), '0.01' FROM s
        |UNION ALL SELECT 'x2', CAST(0.001357 AS DOUBLE),
        |  CAST(0.001604 AS DOUBLE), CAST(0.8462 AS DOUBLE), n,
        |  CAST(0.321531 AS DOUBLE), '0.01' FROM s
        |) ORDER BY term""".stripMargin,
    "q291_ordinal_logit" ->
      // pinned damped-Newton MLE at sf0.01 (q142 idiom); n / n_levels
      // are live closed forms
      """WITH s AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(count(DISTINCT ceil(l_quantity / 13.0)) AS BIGINT)
        |      AS nl FROM lineitem)
        |SELECT * FROM (
        |SELECT 'cut_1' AS term, CAST(-1.030948 AS DOUBLE) AS estimate,
        |  CAST(0.017215 AS DOUBLE) AS stderr,
        |  CAST(-59.8863 AS DOUBLE) AS z_value,
        |  n, nl AS n_levels, '0.01' AS oracle_sf FROM s
        |UNION ALL SELECT 'cut_2', CAST(0.083183 AS DOUBLE),
        |  CAST(0.016641 AS DOUBLE), CAST(4.9986 AS DOUBLE),
        |  n, nl, '0.01' FROM s
        |UNION ALL SELECT 'cut_3', CAST(1.274454 AS DOUBLE),
        |  CAST(0.017549 AS DOUBLE), CAST(72.6231 AS DOUBLE),
        |  n, nl, '0.01' FROM s
        |UNION ALL SELECT 'x1', CAST(-0.004948 AS DOUBLE),
        |  CAST(0.025146 AS DOUBLE), CAST(-0.1968 AS DOUBLE),
        |  n, nl, '0.01' FROM s
        |UNION ALL SELECT 'x2', CAST(-0.006618 AS DOUBLE),
        |  CAST(0.014615 AS DOUBLE), CAST(-0.4528 AS DOUBLE),
        |  n, nl, '0.01' FROM s
        |) ORDER BY term""".stripMargin,
    "q288_bartlett" ->
      // per-arm sample variances, then the textbook closed form
      """WITH cells AS (SELECT l_returnflag AS a, count(*) AS nk,
        |    var_samp(CAST(l_quantity AS DOUBLE)) AS v
        |  FROM lineitem GROUP BY 1),
        |st AS (SELECT CAST(sum(nk) AS BIGINT) AS n,
        |    CAST(count(*) AS BIGINT) AS k,
        |    sum((nk - 1) * v) AS sw, sum((nk - 1) * ln(v)) AS slog,
        |    sum(1.0 / (nk - 1)) AS sinv FROM cells)
        |SELECT n, k,
        |  round(((n - k) * ln(sw / (n - k)) - slog)
        |    / (1 + (sinv - 1.0 / (n - k)) / (3.0 * (k - 1))), 4)
        |    AS statistic,
        |  CAST(k - 1 AS DOUBLE) AS df
        |FROM st""".stripMargin,
    "q289_breslow_day" ->
      // MH common OR, then the per-stratum expected-a quadratic and the
      // harmonic variance as closed forms; Tarone subtracts the
      // score-sum correction
      """WITH cells AS (SELECT CAST(l_suppkey % 7 AS VARCHAR) AS s,
        |    CAST(sum(CASE WHEN l_orderkey % 2 = 1 AND l_quantity > 25
        |      THEN 1 ELSE 0 END) AS DOUBLE) AS a,
        |    CAST(sum(CASE WHEN l_orderkey % 2 = 1 AND l_quantity <= 25
        |      THEN 1 ELSE 0 END) AS DOUBLE) AS b,
        |    CAST(sum(CASE WHEN l_orderkey % 2 = 0 AND l_quantity > 25
        |      THEN 1 ELSE 0 END) AS DOUBLE) AS c,
        |    CAST(sum(CASE WHEN l_orderkey % 2 = 0 AND l_quantity <= 25
        |      THEN 1 ELSE 0 END) AS DOUBLE) AS d
        |  FROM lineitem GROUP BY 1),
        |m AS (SELECT sum(a*d/(a+b+c+d)) AS sr, sum(b*c/(a+b+c+d)) AS ss
        |  FROM cells),
        |q AS (SELECT cells.*, m.sr/m.ss AS orr, a+b AS r1, a+c AS c1,
        |    a+b+c+d AS n FROM cells, m),
        |e AS (SELECT *, (1.0 - orr) AS qa,
        |    (n - r1 - c1) + orr*(r1+c1) AS qb, -orr*r1*c1 AS qc FROM q),
        |x AS (SELECT *, CASE WHEN abs(qa) < 1e-12 THEN r1*c1/n
        |    WHEN ((-qb + sqrt(qb*qb - 4*qa*qc))/(2*qa))
        |        > greatest(0.0, r1+c1-n)
        |      AND ((-qb + sqrt(qb*qb - 4*qa*qc))/(2*qa)) < least(r1, c1)
        |    THEN (-qb + sqrt(qb*qb - 4*qa*qc))/(2*qa)
        |    ELSE (-qb - sqrt(qb*qb - 4*qa*qc))/(2*qa) END AS e0 FROM e),
        |x2 AS (SELECT *, least(greatest(e0,
        |    greatest(0.0, r1+c1-n) + 1e-12),
        |    least(r1, c1) - 1e-12) AS ee FROM x),
        |v AS (SELECT *, 1.0/(1.0/ee + 1.0/(r1-ee) + 1.0/(c1-ee)
        |    + 1.0/(n-r1-c1+ee)) AS vv FROM x2),
        |f AS (SELECT CAST(count(*) AS BIGINT) AS strata, max(orr) AS orr,
        |    sum((a-ee)*(a-ee)/vv) AS t0, sum(a-ee) AS sd, sum(vv) AS sv
        |  FROM v)
        |SELECT strata, CAST(0 AS BIGINT) AS strata_skipped,
        |  round(orr, 6) AS or_mh, round(t0, 4) AS bd_chisq,
        |  round(t0 - sd*sd/sv, 4) AS tarone_chisq,
        |  CAST(strata - 1 AS BIGINT) AS df
        |FROM f""".stripMargin,
    "q290_design_effect" ->
      // two weight moments per group
      """SELECT l_returnflag AS group_value,
        |  CAST(count(*) AS BIGINT) AS n,
        |  round(sum(CAST(l_quantity AS DOUBLE)), 4) AS sum_w,
        |  round(count(*) * sum(CAST(l_quantity AS DOUBLE)
        |      * CAST(l_quantity AS DOUBLE))
        |    / (sum(CAST(l_quantity AS DOUBLE))
        |      * sum(CAST(l_quantity AS DOUBLE))), 6) AS deff,
        |  round(sum(CAST(l_quantity AS DOUBLE))
        |      * sum(CAST(l_quantity AS DOUBLE))
        |    / sum(CAST(l_quantity AS DOUBLE)
        |      * CAST(l_quantity AS DOUBLE)), 4) AS ess
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "q286_acf_pacf" ->
      // the q202 lag-sum self-join plus the Durbin-Levinson recursion
      // unrolled to closed forms at 3 lags
      """WITH cells AS (
        |  SELECT CAST(floor(event_id / 100) AS BIGINT) AS period,
        |    avg(value) AS y
        |  FROM events WHERE value IS NOT NULL GROUP BY 1),
        |st AS (SELECT count(*) AS t, avg(y) AS mu,
        |    sum(y*y) - sum(y)*avg(y) AS denom FROM cells),
        |idx AS (SELECT y, row_number() OVER (ORDER BY period) AS i
        |  FROM cells),
        |lagk AS (SELECT g.k AS lag,
        |    sum((a.y - st.mu) * (b.y - st.mu)) AS sk
        |  FROM generate_series(1, 3) g(k)
        |  JOIN idx a ON true JOIN idx b ON b.i = a.i + g.k, st
        |  GROUP BY g.k),
        |acfx AS (SELECT lag, sk / st.denom AS r FROM lagk, st),
        |rv AS (SELECT max(CASE WHEN lag = 1 THEN r END) AS r1,
        |    max(CASE WHEN lag = 2 THEN r END) AS r2,
        |    max(CASE WHEN lag = 3 THEN r END) AS r3 FROM acfx),
        |dl AS (SELECT *, r1 AS p1,
        |    (r2 - r1*r1) / (1.0 - r1*r1) AS p2 FROM rv),
        |dl2 AS (SELECT *, r1 - p2*r1 AS phi21 FROM dl),
        |dl3 AS (SELECT *, (r3 - phi21*r2 - p2*r1)
        |    / (1.0 - phi21*r1 - p2*r2) AS p3 FROM dl2)
        |SELECT CAST(lag AS BIGINT) AS lag, round(r, 6) AS acf,
        |  round(CASE lag WHEN 1 THEN d.p1 WHEN 2 THEN d.p2
        |    ELSE d.p3 END, 6) AS pacf,
        |  round(1.96 / sqrt(st.t), 6) AS ci_band
        |FROM acfx, dl3 d, st ORDER BY lag""".stripMargin,
    "q287_vif" ->
      // 3x3 correlation-inverse diagonal via cofactor closed forms:
      // det = 1 + 2 r12 r13 r23 - r12^2 - r13^2 - r23^2
      """WITH s AS (SELECT CAST(l_quantity AS DOUBLE) AS x1,
        |    l_extendedprice AS x2, l_discount AS x3 FROM lineitem),
        |c AS (SELECT corr(x1, x2) AS r12, corr(x1, x3) AS r13,
        |    corr(x2, x3) AS r23, CAST(count(*) AS BIGINT) AS n FROM s),
        |d AS (SELECT *, 1 + 2*r12*r13*r23 - r12*r12 - r13*r13 - r23*r23
        |    AS det FROM c)
        |SELECT * FROM (
        |SELECT 'x1' AS term, round((1 - r23*r23) / det, 6) AS vif,
        |  round(det / (1 - r23*r23), 6) AS tolerance,
        |  round(1 - det / (1 - r23*r23), 6) AS r_squared, n FROM d
        |UNION ALL
        |SELECT 'x2', round((1 - r13*r13) / det, 6),
        |  round(det / (1 - r13*r13), 6),
        |  round(1 - det / (1 - r13*r13), 6), n FROM d
        |UNION ALL
        |SELECT 'x3', round((1 - r12*r12) / det, 6),
        |  round(det / (1 - r12*r12), 6),
        |  round(1 - det / (1 - r12*r12), 6), n FROM d
        |) ORDER BY term""".stripMargin,
    "q285_synth_did" ->
      // pinned double-Frank-Wolfe estimates at sf0.01 (q142 idiom); the
      // panel design counts are live closed forms
      """WITH d AS (SELECT count(DISTINCT l_suppkey % 12) AS nu
        |  FROM lineitem)
        |SELECT CAST(-0.221058 AS DOUBLE) AS att,
        |  CAST(0.430857 AS DOUBLE) AS se,
        |  'jackknife_treated' AS se_method,
        |  CAST(-0.5131 AS DOUBLE) AS z_value,
        |  CAST(3 AS BIGINT) AS n_treated,
        |  CAST(nu - 3 AS BIGINT) AS n_donors,
        |  CAST(4 AS BIGINT) AS n_pre, CAST(4 AS BIGINT) AS n_post,
        |  '0.01' AS oracle_sf
        |FROM d""".stripMargin,
    "q284_aft_survival" ->
      // fully LIVE: z = (ln t - eta*)/sigma at the stored params, then
      // weibull S = exp(-exp(z)) per distinct time — pure closed form
      """WITH tg AS (SELECT DISTINCT CAST(l_quantity AS INT) AS t
        |  FROM lineitem WHERE l_quantity > 0),
        |z AS (SELECT CAST(t AS DOUBLE) AS time,
        |    (ln(CAST(t AS DOUBLE)) - (3.8 + 0.02 * 5.0 + 0.01 * 1.0))
        |      / exp(-0.5) AS zv
        |  FROM tg)
        |SELECT time, round(exp(-exp(zv)), 6) AS survival,
        |  round(exp(zv), 6) AS cum_hazard
        |FROM z ORDER BY time""".stripMargin,
    "q282_aft_weibull" ->
      // pinned damped-Newton MLE at sf0.01 (q142 idiom); n / n_events
      // are live closed forms over the event split
      """WITH s AS (SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN l_linenumber % 3 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_events FROM lineitem)
        |SELECT * FROM (
        |SELECT 'intercept' AS term, CAST(3.849520 AS DOUBLE) AS estimate,
        |  CAST(0.008350 AS DOUBLE) AS stderr,
        |  CAST(461.0421 AS DOUBLE) AS z_value,
        |  CAST(n AS BIGINT) AS n, n_events, 'weibull' AS dist,
        |  '0.01' AS oracle_sf FROM s
        |UNION ALL SELECT 'log_scale', CAST(-0.532764 AS DOUBLE),
        |  CAST(0.005277 AS DOUBLE), CAST(-100.9553 AS DOUBLE),
        |  CAST(n AS BIGINT), n_events, 'weibull', '0.01' FROM s
        |UNION ALL SELECT 'x1', CAST(-0.015583 AS DOUBLE),
        |  CAST(0.012629 AS DOUBLE), CAST(-1.2339 AS DOUBLE),
        |  CAST(n AS BIGINT), n_events, 'weibull', '0.01' FROM s
        |UNION ALL SELECT 'x2', CAST(-0.003921 AS DOUBLE),
        |  CAST(0.007331 AS DOUBLE), CAST(-0.5348 AS DOUBLE),
        |  CAST(n AS BIGINT), n_events, 'weibull', '0.01' FROM s
        |) ORDER BY term""".stripMargin,
    "q283_aft_lognormal" ->
      // fully LIVE despite the iterative engine path: lognormal AFT
      // with no censoring is OLS of log t on x in closed form, with
      // sigma^2 = RSS/n (the MLE, not the dof-corrected variance) and
      // se(log_scale) = 1/sqrt(2n)
      """WITH s AS (SELECT ln(CAST(l_quantity AS INT)) AS y,
        |    l_discount * 10.0 AS x FROM lineitem),
        |m AS (SELECT count(*) AS n, avg(y) AS ybar, avg(x) AS xbar,
        |    covar_pop(y, x) AS sxy, var_pop(x) AS sxx, avg(x * x) AS xx
        |  FROM s),
        |f AS (SELECT n, sxy / sxx AS b1, ybar - sxy / sxx * xbar AS b0,
        |    sxx, xx FROM m),
        |r AS (SELECT f.n, f.b0, f.b1, f.sxx, f.xx,
        |    sqrt((SELECT avg((y - f.b0 - f.b1 * x) *
        |      (y - f.b0 - f.b1 * x)) FROM s)) AS sigma
        |  FROM f)
        |SELECT * FROM (
        |SELECT 'intercept' AS term, round(b0, 6) AS estimate,
        |  round(sigma * sqrt(xx / (n * sxx)), 6) AS stderr,
        |  round(b0 / (sigma * sqrt(xx / (n * sxx))), 4) AS z_value,
        |  CAST(n AS BIGINT) AS n, CAST(n AS BIGINT) AS n_events,
        |  'lognormal' AS dist FROM r
        |UNION ALL
        |SELECT 'log_scale', round(ln(sigma), 6),
        |  round(1.0 / sqrt(2.0 * n), 6),
        |  round(ln(sigma) * sqrt(2.0 * n), 4),
        |  CAST(n AS BIGINT), CAST(n AS BIGINT), 'lognormal' FROM r
        |UNION ALL
        |SELECT 'x1', round(b1, 6), round(sigma / sqrt(n * sxx), 6),
        |  round(b1 / (sigma / sqrt(n * sxx)), 4),
        |  CAST(n AS BIGINT), CAST(n AS BIGINT), 'lognormal' FROM r
        |) ORDER BY term""".stripMargin,
    "q279_fine_gray" ->
      // pinned IPCW Newton estimates at sf0.01 (q142 idiom); n /
      // n_events / n_competing are live closed forms over the cause split
      """WITH s AS (SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN l_linenumber % 3 = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_events,
        |    CAST(sum(CASE WHEN l_linenumber % 3 = 2 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_competing FROM lineitem)
        |SELECT 'x1' AS term, CAST(0.024000 AS DOUBLE) AS estimate,
        |  CAST(0.021498 AS DOUBLE) AS stderr,
        |  CAST(1.1164 AS DOUBLE) AS z_value,
        |  CAST(n AS BIGINT) AS n, n_events, n_competing,
        |  '0.01' AS oracle_sf FROM s
        |UNION ALL SELECT 'x2', CAST(0.013329 AS DOUBLE),
        |  CAST(0.012490 AS DOUBLE), CAST(1.0672 AS DOUBLE),
        |  CAST(n AS BIGINT), n_events, n_competing, '0.01' FROM s
        |ORDER BY term""".stripMargin,
    "q142_cox_ph" ->
      // pinned Newton estimates at sf0.01 (no closed SQL form for the
      // partial-likelihood fit); n and n_events are live closed forms
      """WITH s AS (SELECT count(*) AS n,
        |    CAST(sum(l_linenumber % 2) AS BIGINT) AS n_events FROM lineitem)
        |SELECT 'x1' AS term, CAST(0.018778 AS DOUBLE) AS estimate,
        |  CAST(0.018590 AS DOUBLE) AS stderr,
        |  CAST(1.0101 AS DOUBLE) AS z_value,
        |  CAST(n AS BIGINT) AS n, n_events, '0.01' AS oracle_sf FROM s
        |UNION ALL SELECT 'x2', CAST(-0.001958 AS DOUBLE),
        |  CAST(0.010800 AS DOUBLE), CAST(-0.1813 AS DOUBLE),
        |  CAST(n AS BIGINT), n_events, '0.01' FROM s
        |ORDER BY term""".stripMargin,
    "q141_eb_shrinkage" ->
      // mu = pooled grand mean; tau2 = max(0, var of group means - avg
      // per-group squared SE); B = se2/(se2+tau2); all driver-order sums
      // round away under 1e-6
      """WITH g AS (SELECT p_brand AS grp, count(*) AS n,
        |    avg(p_retailprice) AS m, var_samp(p_retailprice) AS v
        |  FROM part GROUP BY 1),
        |t AS (SELECT sum(n * m) / sum(n) AS mu,
        |    avg(m) AS mbar, count(*) AS k FROM g),
        |s AS (SELECT (SELECT sum((m - t.mbar) * (m - t.mbar)) FROM g, t)
        |      / ((SELECT k FROM t) - 1) AS var_means,
        |    (SELECT avg(v / n) FROM g WHERE n >= 2) AS avg_se2),
        |tau AS (SELECT greatest(0.0, var_means - avg_se2) AS tau2 FROM s)
        |SELECT grp AS "group", CAST(n AS BIGINT) AS n,
        |  round(m, 6) AS mean,
        |  round(CASE WHEN n < 2 OR (SELECT tau2 FROM tau) = 0 THEN 1.0
        |    ELSE (v / n) / (v / n + (SELECT tau2 FROM tau)) END, 6) AS shrinkage,
        |  round((SELECT mu FROM t) +
        |    (1.0 - CASE WHEN n < 2 OR (SELECT tau2 FROM tau) = 0 THEN 1.0
        |      ELSE (v / n) / (v / n + (SELECT tau2 FROM tau)) END)
        |    * (m - (SELECT mu FROM t)), 6) AS shrunk_mean
        |FROM g ORDER BY "group"""".stripMargin,
    "q139_fdr_bh" ->
      // rank ascending, q = p*m/rank clamped at 1, suffix min via a
      // reverse-frame window
      """WITH t AS (SELECT l_orderkey AS test_id,
        |    ((l_orderkey * 13) % 1000) / 1000.0 + 0.0005 AS p
        |  FROM lineitem WHERE l_linenumber = 1 AND l_orderkey % 97 = 0),
        |r AS (SELECT test_id, p,
        |    row_number() OVER (ORDER BY p) AS rank,
        |    count(*) OVER () AS m FROM t),
        |q AS (SELECT test_id, p,
        |    least(1.0, p * m / rank) AS qv, rank FROM r),
        |a AS (SELECT test_id, p,
        |    min(qv) OVER (ORDER BY rank
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS adj
        |  FROM q)
        |SELECT test_id, round(p, 6) AS p_value, round(adj, 6) AS p_adjusted
        |FROM a ORDER BY test_id""".stripMargin,
    "q140_chisq_independence" ->
      // observed cells vs products of the margins
      """WITH c AS (SELECT l_returnflag AS a, l_linestatus AS b,
        |    count(*) AS o FROM lineitem GROUP BY 1, 2),
        |rt AS (SELECT a, sum(o) AS r FROM c GROUP BY 1),
        |ct AS (SELECT b, sum(o) AS cc FROM c GROUP BY 1),
        |tot AS (SELECT sum(o) AS n FROM c),
        |grid AS (SELECT rt.a, ct.b, rt.r, ct.cc, coalesce(c.o, 0) AS o
        |  FROM rt CROSS JOIN ct LEFT JOIN c ON c.a = rt.a AND c.b = ct.b),
        |x AS (SELECT sum((o - CAST(r AS DOUBLE) * cc / (SELECT n FROM tot))
        |      * (o - CAST(r AS DOUBLE) * cc / (SELECT n FROM tot))
        |      / (CAST(r AS DOUBLE) * cc / (SELECT n FROM tot))) AS chisq
        |  FROM grid)
        |SELECT CAST((SELECT n FROM tot) AS BIGINT) AS n,
        |  (SELECT count(*) FROM rt) AS n_rows,
        |  (SELECT count(*) FROM ct) AS n_cols,
        |  ((SELECT count(*) FROM rt) - 1) * ((SELECT count(*) FROM ct) - 1) AS dof,
        |  round(chisq, 6) AS chisq,
        |  round(sqrt(chisq / (CAST((SELECT n FROM tot) AS DOUBLE)
        |    * least((SELECT count(*) FROM rt) - 1,
        |        (SELECT count(*) FROM ct) - 1))), 6) AS cramers_v
        |FROM x""".stripMargin,
    "q138_anova" ->
      // same per-arm cells, same SSB/SSW forms
      """WITH g AS (SELECT l_returnflag AS arm, count(*) AS n,
        |    avg(l_quantity) AS m, var_samp(l_quantity) AS v
        |  FROM lineitem GROUP BY 1),
        |t AS (SELECT sum(n) AS n, count(*) AS k,
        |    sum(n * m) / sum(n) AS grand FROM g),
        |s AS (SELECT t.k, t.n,
        |    sum(g.n * (g.m - t.grand) * (g.m - t.grand)) AS ssb,
        |    sum((g.n - 1) * g.v) AS ssw FROM g, t GROUP BY t.k, t.n)
        |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
        |  round((ssb / (k - 1)) / (ssw / (n - k)), 6) AS f_statistic
        |FROM s""".stripMargin,
    "q137_blp_test" ->
      // centered 2-regressor normal equations by Cramer's rule:
      // beta = C^-1 [cxy, czy], C the centered Gram; sig2 = RSS/(n-3)
      """WITH b AS (SELECT CAST(l_orderkey % 2 AS INT) AS tr,
        |    CAST(l_quantity > 25 AS DOUBLE) AS h,
        |    (((l_orderkey * 8 + l_linenumber) * 1103515245 + 12345) % 1000)
        |      / 1000.0 - 0.4995 AS u
        |  FROM lineitem),
        |c AS (SELECT tr, 2.0 + 8.0 * h AS cate,
        |    10.0 + 5.0 * h + tr * (2.0 + 8.0 * h) + u AS y FROM b),
        |mm AS (SELECT avg(CAST(tr AS DOUBLE)) AS p, avg(cate) AS mt FROM c),
        |d AS (SELECT y, (tr - p) AS x1, (tr - p) * (cate - mt) AS x2
        |  FROM c, mm),
        |g AS (SELECT count(*) AS n,
        |    var_pop(x1) * count(*) AS cxx,
        |    covar_pop(x1, x2) * count(*) AS cxz,
        |    var_pop(x2) * count(*) AS czz,
        |    covar_pop(x1, y) * count(*) AS cxy,
        |    covar_pop(x2, y) * count(*) AS czy,
        |    var_pop(y) * count(*) AS cyy
        |  FROM d),
        |s AS (SELECT *, cxx * czz - cxz * cxz AS det FROM g),
        |e AS (SELECT n, det, cxx, czz,
        |    (czz * cxy - cxz * czy) / det AS b1,
        |    (cxx * czy - cxz * cxy) / det AS b2,
        |    (cyy - ((czz * cxy - cxz * czy) / det) * cxy
        |         - ((cxx * czy - cxz * cxy) / det) * czy) / (n - 3) AS sig2
        |  FROM s)
        |SELECT CAST(n AS BIGINT) AS n, round(b1, 6) AS ate_coef,
        |  round(sqrt(sig2 * czz / det), 6) AS ate_se,
        |  round(b2, 6) AS het_coef,
        |  round(sqrt(sig2 * cxx / det), 6) AS het_se,
        |  round(b2 / sqrt(sig2 * cxx / det), 4) AS het_t
        |FROM e""".stripMargin,
    "q136_cluster_se" ->
      // the 2x2 sandwich spelled out: A^-1 = [[n,-sx],[-sx,sxx]]/det,
      // meat from per-cluster score sums, CR1 small-sample factor
      """WITH b AS (SELECT l_orderkey AS g, CAST(l_quantity AS DOUBLE) AS x,
        |    l_extendedprice / 1000.0 AS yy FROM lineitem),
        |m AS (SELECT regr_slope(yy, x) AS a, regr_intercept(yy, x) AS b0,
        |    count(*) AS n, sum(x) AS sx, sum(x * x) AS sxx FROM b),
        |r AS (SELECT g, x, yy - (m.a * x + m.b0) AS e FROM b, m),
        |u AS (SELECT g, sum(x * e) AS u0, sum(e) AS u1 FROM r GROUP BY g),
        |mt AS (SELECT count(*) AS gg, sum(u0 * u0) AS m00,
        |    sum(u0 * u1) AS m01, sum(u1 * u1) AS m11 FROM u),
        |f AS (SELECT m.a, m.b0, m.n, mt.gg,
        |    m.n / (m.n * m.sxx - m.sx * m.sx) AS a00,
        |    -m.sx / (m.n * m.sxx - m.sx * m.sx) AS a01,
        |    m.sxx / (m.n * m.sxx - m.sx * m.sx) AS a11,
        |    mt.m00, mt.m01, mt.m11,
        |    (mt.gg / (mt.gg - 1.0)) * ((m.n - 1.0) / (m.n - 2.0)) AS c
        |  FROM m, mt),
        |v AS (SELECT *,
        |    (a00 * m00 + a01 * m01) * a00 + (a00 * m01 + a01 * m11) * a01 AS v00,
        |    (a01 * m00 + a11 * m01) * a01 + (a01 * m01 + a11 * m11) * a11 AS v11
        |  FROM f)
        |SELECT * FROM (
        |  SELECT 'x' AS term, round(a, 6) AS estimate,
        |    round(sqrt(c * v00), 6) AS se_cluster,
        |    round(a / sqrt(c * v00), 4) AS t_value,
        |    CAST(gg AS BIGINT) AS n_clusters FROM v
        |  UNION ALL
        |  SELECT '(intercept)', round(b0, 6), round(sqrt(c * v11), 6),
        |    round(b0 / sqrt(c * v11), 4), CAST(gg AS BIGINT) FROM v)
        |ORDER BY term""".stripMargin,
    "q135_msprt" ->
      // cumulative per-arm moments by daily bucket, pooled-variance V,
      // mixture LR, running-max inversion — all window closed forms
      """WITH cells AS (SELECT epoch_ns(ts) // 86400000000000 AS bucket,
        |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN user_id % 2 = 1 THEN value ELSE 0 END) AS s1,
        |    sum(CASE WHEN user_id % 2 = 1 THEN value * value ELSE 0 END) AS q1,
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n0,
        |    sum(CASE WHEN user_id % 2 = 0 THEN value ELSE 0 END) AS s0,
        |    sum(CASE WHEN user_id % 2 = 0 THEN value * value ELSE 0 END) AS q0
        |  FROM events
        |  WHERE value IS NOT NULL AND user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1),
        |cum AS (SELECT bucket,
        |    sum(n1) OVER w AS cn1, sum(s1) OVER w AS cs1, sum(q1) OVER w AS cq1,
        |    sum(n0) OVER w AS cn0, sum(s0) OVER w AS cs0, sum(q0) OVER w AS cq0
        |  FROM cells
        |  WINDOW w AS (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |v AS (SELECT bucket, cn1, cn0, cs1 / cn1 - cs0 / cn0 AS d,
        |    ((cq1 - cs1 * cs1 / cn1) + (cq0 - cs0 * cs0 / cn0)) / (cn1 + cn0 - 2)
        |      * (1.0 / cn1 + 1.0 / cn0) AS vv
        |  FROM cum WHERE cn1 >= 2 AND cn0 >= 2),
        |l AS (SELECT bucket, cn1, cn0, d,
        |    sqrt(vv / (vv + 1.0)) * exp(d * d * 1.0 / (2.0 * vv * (vv + 1.0))) AS lambda
        |  FROM v),
        |f AS (SELECT *, max(lambda) OVER
        |    (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mx
        |  FROM l)
        |SELECT bucket, CAST(cn1 AS BIGINT) AS n1, CAST(cn0 AS BIGINT) AS n0,
        |  round(d, 6) AS estimate, round(lambda, 6) AS lambda,
        |  round(least(1.0, 1.0 / mx), 6) AS p_always_valid
        |FROM f ORDER BY bucket""".stripMargin,
    "q134_per_source_cap" ->
      // same LCG rank + doc_id tiebreak; DuckDB takes the per-source
      // top-40 directly with a window
      """WITH r AS (SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY (doc_id * 1103515245 + 12345) % 2147483648, doc_id) AS rn
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
        |  CAST(sum(doc_id) AS BIGINT) AS id_sum
        |FROM r WHERE rn <= 40 GROUP BY source ORDER BY source""".stripMargin,
    "q131_chunking" ->
      // same tokenization, same start offsets (range step = stride), same
      // inclusive 1-based slices
      """WITH toks AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0) AS ts
        |  FROM documents WHERE doc_id % 29 = 0),
        |st AS (SELECT doc_id, ts, unnest(range(0, len(ts), 24)) AS s FROM toks),
        |ch AS (SELECT doc_id,
        |    array_to_string(ts[CAST(s + 1 AS BIGINT):CAST(s + 32 AS BIGINT)], ' ') AS chunk_text,
        |    least(len(ts) - s, 32) AS n_tokens
        |  FROM st)
        |SELECT doc_id, count(*) AS n_chunks,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(sum(length(chunk_text)) AS BIGINT) AS sum_chars
        |FROM ch GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q130_histogram_by" ->
      // q125's bin arithmetic with a group key; zero-fill from the
      // (distinct groups x bins) cross product
      """WITH s AS (SELECT min(l_extendedprice) AS mn,
        |    max(l_extendedprice) AS mx,
        |    (max(l_extendedprice) - min(l_extendedprice)) / 6.0 AS w
        |  FROM lineitem),
        |c AS (SELECT l_returnflag AS "group",
        |    least(CAST(floor((l_extendedprice - mn) / w) AS INT), 5) AS bin,
        |    count(*) AS cnt FROM lineitem, s GROUP BY 1, 2),
        |g AS (SELECT DISTINCT l_returnflag AS "group" FROM lineitem),
        |b AS (SELECT CAST(range AS INT) AS bin FROM range(0, 6))
        |SELECT "group", bin, round(mn + bin * w, 4) AS lo,
        |  round(mn + (bin + 1) * w, 4) AS hi,
        |  CAST(coalesce(cnt, 0) AS BIGINT) AS "count"
        |FROM g CROSS JOIN b CROSS JOIN s LEFT JOIN c USING ("group", bin)
        |ORDER BY "group", bin""".stripMargin,
    "q125_histogram" ->
      // identical IEEE bin arithmetic: width = (mx-mn)/8, ordinal =
      // least(floor((x-mn)/width), 7); empty bins from range(0,8)
      """WITH s AS (SELECT min(l_extendedprice) AS mn,
        |    max(l_extendedprice) AS mx,
        |    (max(l_extendedprice) - min(l_extendedprice)) / 8.0 AS w
        |  FROM lineitem),
        |c AS (SELECT least(CAST(floor((l_extendedprice - mn) / w) AS INT), 7) AS bin,
        |    count(*) AS cnt FROM lineitem, s GROUP BY 1),
        |b AS (SELECT CAST(range AS INT) AS bin FROM range(0, 8))
        |SELECT bin, round(mn + bin * w, 4) AS lo,
        |  round(mn + (bin + 1) * w, 4) AS hi,
        |  CAST(coalesce(cnt, 0) AS BIGINT) AS "count"
        |FROM b CROSS JOIN s LEFT JOIN c USING (bin)
        |ORDER BY bin""".stripMargin,
    "q126_box_stats" ->
      // five-number summary (quantile_cont == Spark exact percentile),
      // whiskers clamped to the data range, outlier counts closed-form
      """WITH q AS (SELECT count(l_quantity) AS n,
        |    CAST(min(l_quantity) AS DOUBLE) AS mn,
        |    CAST(max(l_quantity) AS DOUBLE) AS mx,
        |    quantile_cont(CAST(l_quantity AS DOUBLE), 0.25) AS q1,
        |    quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS med,
        |    quantile_cont(CAST(l_quantity AS DOUBLE), 0.75) AS q3
        |  FROM lineitem),
        |w AS (SELECT *, q3 - q1 AS iqr,
        |    greatest(q1 - 1.5 * (q3 - q1), mn) AS wlo,
        |    least(q3 + 1.5 * (q3 - q1), mx) AS whi FROM q)
        |SELECT n, round(mn, 2) AS "min", round(q1, 6) AS q1,
        |  round(med, 6) AS median, round(q3, 6) AS q3,
        |  round(mx, 2) AS "max", round(iqr, 6) AS iqr,
        |  round(wlo, 6) AS whisker_lo, round(whi, 6) AS whisker_hi,
        |  CAST((SELECT count(*) FROM lineitem, w WHERE l_quantity < wlo) AS BIGINT) AS n_outliers_lo,
        |  CAST((SELECT count(*) FROM lineitem, w WHERE l_quantity > whi) AS BIGINT) AS n_outliers_hi
        |FROM w""".stripMargin,
    "q127_pipeline_verbs" ->
      // incremental dedup: only docs outside the history survive (q115
      // closed form); perplexity: the q103 bigram-model replay over the
      // corpus-with-planted-dups, global roll-up
      """WITH corpus AS (SELECT doc_id, text FROM documents
        |    UNION ALL SELECT doc_id + 10000, text FROM documents
        |    WHERE doc_id < 100),
        |nd AS (SELECT CAST(count(*) AS BIGINT) AS n_new,
        |    CAST(sum(doc_id) AS BIGINT) AS id_sum
        |  FROM documents WHERE doc_id >= 250),
        |tk AS (
        |  SELECT doc_id, tok,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS pos
        |  FROM (SELECT doc_id, unnest(ts) AS tok,
        |          generate_subscripts(ts, 1) AS ord
        |        FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS ts
        |              FROM corpus))
        |  WHERE length(tok) > 0),
        |uni AS (SELECT tok AS w1, count(*) AS cu FROM tk GROUP BY 1),
        |vocab AS (SELECT count(*) AS v FROM uni),
        |pairs AS (SELECT a.doc_id, a.tok AS w1, b.tok AS w2
        |  FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        |big AS (SELECT w1, w2, count(*) AS cb FROM pairs GROUP BY 1, 2),
        |scored AS (SELECT p.doc_id,
        |    ln((coalesce(cb, 0) + 1.0) / (coalesce(cu, 0) + (SELECT v FROM vocab))) AS logp
        |  FROM pairs p
        |  LEFT JOIN big USING (w1, w2)
        |  LEFT JOIN uni USING (w1)),
        |perdoc AS (SELECT doc_id, count(*) AS nb, avg(logp) AS lp
        |  FROM scored GROUP BY 1),
        |ppl AS (SELECT CAST(count(*) AS BIGINT) AS n_scored,
        |    CAST(sum(nb) AS BIGINT) AS n_bigrams,
        |    round(avg(lp), 6) AS mean_logp FROM perdoc)
        |SELECT nd.n_new, nd.id_sum, ppl.n_scored, ppl.n_bigrams,
        |  ppl.mean_logp
        |FROM nd CROSS JOIN ppl""".stripMargin,
    "q128_conformal_verb" ->
      // q122's fit/rank-q chain; coverage and the band half-width replay
      // the verb's per-row lower/upper expressions bit-for-bit
      """WITH b AS (SELECT l_extendedprice / 1000.0 AS y,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    ((l_orderkey * 8 + l_linenumber) * 1103515245 + 12345) % 1000 < 500 AS is_cal
        |  FROM lineitem),
        |m AS (SELECT regr_slope(y, x) AS a, regr_intercept(y, x) AS b0
        |  FROM b WHERE NOT is_cal),
        |r AS (SELECT abs(y - (m.a * x + m.b0)) AS ar FROM b, m WHERE is_cal),
        |kk AS (SELECT count(*) AS n,
        |    least(count(*), CAST(ceil(CAST(0.9 AS DOUBLE) * (count(*) + 1)) AS BIGINT)) AS k
        |  FROM r),
        |o AS (SELECT ar, row_number() OVER (ORDER BY ar) AS rn FROM r),
        |qq AS (SELECT ar AS qv FROM o, kk WHERE rn = kk.k),
        |sc AS (SELECT y, m.a * x + m.b0 AS fit, qq.qv FROM b, m, qq)
        |SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  round(avg(CASE WHEN y >= fit - qv AND y <= fit + qv
        |    THEN 1.0 ELSE 0.0 END), 6) AS coverage,
        |  round(avg((fit + qv) - (fit - qv)) / 2.0, 6) AS q_hat
        |FROM sc""".stripMargin,
    "q124_power_analysis" ->
      // z(0.975)+z(0.8) to 16 digits; same IEEE order as the Scala forms
      """WITH s AS (SELECT stddev_samp(l_quantity) AS sd,
        |    count(*) / 2.0 AS npa FROM lineitem),
        |z AS (SELECT 1.9599639845400545 + 0.8416212335729143 AS zz)
        |SELECT round(sd, 6) AS sigma,
        |  round(2.0 * pow((SELECT zz FROM z) * sd / 0.5, 2), 2) AS n_per_arm,
        |  round((SELECT zz FROM z) * sd * sqrt(2.0 / npa), 6) AS mde
        |FROM s""".stripMargin,
    "q122_conformal" ->
      // fit on the non-cal half (regr_slope/intercept), k-th smallest
      // absolute calibration residual by window rank, coverage closed-form.
      // CAST(0.9 AS DOUBLE) keeps ceil() in IEEE (decimal 0.9*(n+1) can
      // ceil differently when the product is integral)
      """WITH b AS (SELECT l_extendedprice / 1000.0 AS y,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    ((l_orderkey * 8 + l_linenumber) * 1103515245 + 12345) % 1000 < 500 AS is_cal
        |  FROM lineitem),
        |m AS (SELECT regr_slope(y, x) AS a, regr_intercept(y, x) AS b0
        |  FROM b WHERE NOT is_cal),
        |r AS (SELECT abs(y - (m.a * x + m.b0)) AS ar FROM b, m WHERE is_cal),
        |kk AS (SELECT count(*) AS n,
        |    least(count(*), CAST(ceil(CAST(0.9 AS DOUBLE) * (count(*) + 1)) AS BIGINT)) AS k
        |  FROM r),
        |o AS (SELECT ar, row_number() OVER (ORDER BY ar) AS rn FROM r),
        |q AS (SELECT ar AS qv FROM o, kk WHERE rn = kk.k)
        |SELECT (SELECT n FROM kk) AS n_cal,
        |  round((SELECT qv FROM q), 6) AS q_hat,
        |  round((SELECT a FROM m), 6) AS slope,
        |  round((SELECT b0 FROM m), 6) AS intercept,
        |  round(avg(CASE WHEN abs(y - ((SELECT a FROM m) * x + (SELECT b0 FROM m)))
        |      <= (SELECT qv FROM q) THEN 1.0 ELSE 0.0 END), 6) AS coverage
        |FROM b""".stripMargin,
    "q123_snapshot_diff" ->
      // the diff statuses are pure id-range closed forms on this fixture
      """SELECT 'added' AS status, CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents WHERE doc_id >= 400
        |UNION ALL SELECT 'changed', count(*) FROM documents
        |WHERE doc_id BETWEEN 100 AND 149
        |UNION ALL SELECT 'removed', count(*) FROM documents
        |WHERE doc_id < 100
        |UNION ALL SELECT 'unchanged', count(*) FROM documents
        |WHERE doc_id BETWEEN 150 AND 399
        |ORDER BY status""".stripMargin,
    "q121_profile" ->
      // one UNION branch per profiled column; doubles render identically
      // (shortest-roundtrip) in both engines at this value range
      """WITH p AS (
        |  SELECT 'o_orderkey' AS "column", count(*) AS n_rows,
        |    count(*) - count(o_orderkey) AS n_null,
        |    round((count(*) - count(o_orderkey)) * 1.0 / count(*), 6) AS null_frac,
        |    count(DISTINCT o_orderkey) AS n_distinct,
        |    CAST(min(o_orderkey) AS VARCHAR) AS "min",
        |    CAST(max(o_orderkey) AS VARCHAR) AS "max" FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
        |    round((count(*) - count(o_custkey)) * 1.0 / count(*), 6),
        |    count(DISTINCT o_custkey),
        |    CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
        |    round((count(*) - count(o_orderstatus)) * 1.0 / count(*), 6),
        |    count(DISTINCT o_orderstatus),
        |    CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
        |    round((count(*) - count(o_totalprice)) * 1.0 / count(*), 6),
        |    count(DISTINCT o_totalprice),
        |    CAST(min(o_totalprice) AS VARCHAR), CAST(max(o_totalprice) AS VARCHAR)
        |  FROM orders)
        |SELECT * FROM p ORDER BY "column"""".stripMargin,
    "q119_calibration" ->
      // identical bin index ((q/50)*10 in the same IEEE order), per-bin
      // averages, and the n-weighted ECE
      """WITH b AS (SELECT least(CAST(floor((l_quantity / 50.0) * 10) AS INT), 9) AS bin,
        |    l_quantity / 50.0 AS s,
        |    CASE WHEN l_extendedprice > 30000.0 THEN 1 ELSE 0 END AS y
        |  FROM lineitem WHERE l_quantity / 50.0 BETWEEN 0.0 AND 1.0),
        |c AS (SELECT bin, count(*) AS n, avg(s) AS avg_score,
        |    avg(y * 1.0) AS avg_label FROM b GROUP BY bin),
        |g AS (SELECT *, abs(avg_score - avg_label) AS abs_gap FROM c),
        |e AS (SELECT sum(abs_gap * n) / sum(n) AS ece FROM g)
        |SELECT bin, n, round(avg_score, 6) AS avg_score,
        |  round(avg_label, 6) AS avg_label, round(abs_gap, 6) AS abs_gap,
        |  round((SELECT ece FROM e), 6) AS ece
        |FROM g ORDER BY bin""".stripMargin,
    "q120_weighted_ess" ->
      """WITH b AS (SELECT l_extendedprice AS x,
        |    1.0 / (0.3 + 0.4 * CASE WHEN l_quantity > 25.0 THEN 1 ELSE 0 END) AS w
        |  FROM lineitem)
        |SELECT count(*) AS n, round(sum(w), 4) AS sum_w,
        |  round(sum(x * w) / sum(w), 4) AS weighted_mean,
        |  round(sum(w) * sum(w) / sum(w * w), 4) AS ess,
        |  round(count(*) / (sum(w) * sum(w) / sum(w * w)), 6) AS design_effect
        |FROM b""".stripMargin,
    "q118_psi_drift" ->
      // same ordinal binning, shares, and log terms replayed per cell
      """WITH b AS (SELECT CASE WHEN l_quantity < 10 THEN 0
        |    WHEN l_quantity < 20 THEN 1 WHEN l_quantity < 30 THEN 2
        |    WHEN l_quantity < 40 THEN 3 ELSE 4 END AS bin,
        |    (l_orderkey % 2) AS g FROM lineitem),
        |c AS (SELECT bin,
        |    sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS n_base,
        |    sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS n_cur
        |  FROM b GROUP BY bin),
        |t AS (SELECT sum(n_base) AS t0, sum(n_cur) AS t1 FROM c),
        |s AS (SELECT bin, n_base, n_cur,
        |    n_base * 1.0 / (SELECT t0 FROM t) AS p,
        |    n_cur * 1.0 / (SELECT t1 FROM t) AS q FROM c)
        |SELECT CAST(bin AS INT) AS bin, CAST(n_base AS BIGINT) AS n_base,
        |  CAST(n_cur AS BIGINT) AS n_cur,
        |  round(p, 6) AS share_base, round(q, 6) AS share_cur,
        |  round((q - p) * ln(q / p), 8) AS psi_term,
        |  round((q * ln(q / ((p + q) / 2.0)) + p * ln(p / ((p + q) / 2.0))) / 2.0, 8) AS js_term
        |FROM s ORDER BY bin""".stripMargin,
    "q116_qte" ->
      // per-arm quantile_cont at each probability; DuckDB aggregates need
      // constant probabilities, so one SELECT per row
      """WITH b AS (SELECT l_extendedprice AS y, (l_orderkey % 2) AS tr
        |  FROM lineitem),
        |q AS (
        |  SELECT CAST(0.25 AS DOUBLE) AS percentile,
        |    quantile_cont(CASE WHEN tr = 0 THEN y END, 0.25) AS a,
        |    quantile_cont(CASE WHEN tr = 1 THEN y END, 0.25) AS c FROM b
        |  UNION ALL SELECT CAST(0.5 AS DOUBLE),
        |    quantile_cont(CASE WHEN tr = 0 THEN y END, 0.5),
        |    quantile_cont(CASE WHEN tr = 1 THEN y END, 0.5) FROM b
        |  UNION ALL SELECT CAST(0.75 AS DOUBLE),
        |    quantile_cont(CASE WHEN tr = 0 THEN y END, 0.75),
        |    quantile_cont(CASE WHEN tr = 1 THEN y END, 0.75) FROM b
        |  UNION ALL SELECT CAST(0.9 AS DOUBLE),
        |    quantile_cont(CASE WHEN tr = 0 THEN y END, 0.9),
        |    quantile_cont(CASE WHEN tr = 1 THEN y END, 0.9) FROM b)
        |SELECT percentile, round(a, 4) AS q0, round(c, 4) AS q1,
        |  round(c - a, 4) AS qte
        |FROM q ORDER BY percentile""".stripMargin,
    "q117_wasserstein" ->
      // W1 = sum over distinct values of |F0 - F1| * (next v - v)
      """WITH bp AS (SELECT l_extendedprice AS v, (l_orderkey % 2) AS t FROM lineitem),
        |gp AS (SELECT v, sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS c0,
        |    sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS c1 FROM bp GROUP BY v),
        |op AS (SELECT v, sum(c0) OVER w AS s0, sum(c1) OVER w AS s1,
        |    lead(v) OVER (ORDER BY v) AS nv
        |  FROM gp WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |wp AS (SELECT sum(abs(s0 * 1.0 / (SELECT sum(c0) FROM gp)
        |      - s1 * 1.0 / (SELECT sum(c1) FROM gp)) * (nv - v)) AS w1
        |  FROM op WHERE nv IS NOT NULL),
        |bq AS (SELECT l_quantity AS v, (l_orderkey % 2) AS t FROM lineitem),
        |gq AS (SELECT v, sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS c0,
        |    sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS c1 FROM bq GROUP BY v),
        |oq AS (SELECT v, sum(c0) OVER w AS s0, sum(c1) OVER w AS s1,
        |    lead(v) OVER (ORDER BY v) AS nv
        |  FROM gq WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |wq AS (SELECT sum(abs(s0 * 1.0 / (SELECT sum(c0) FROM gq)
        |      - s1 * 1.0 / (SELECT sum(c1) FROM gq)) * (nv - v)) AS w1
        |  FROM oq WHERE nv IS NOT NULL)
        |SELECT 'l_extendedprice' AS metric, round((SELECT w1 FROM wp), 6) AS w1
        |UNION ALL
        |SELECT 'l_quantity', round((SELECT w1 FROM wq), 6)
        |ORDER BY metric""".stripMargin,
    "q115_incremental_dedup" ->
      // exact semantics: only docs outside the history (doc_id >= 250)
      // are new — the planted re-ingestions and the history members drop
      """SELECT lang, count(*) AS n_new FROM documents
        |WHERE doc_id >= 250 GROUP BY lang ORDER BY lang""".stripMargin,
    "q114_robust_means" ->
      // same bounds (quantile_cont interpolation), same clip/trim forms
      """WITH b AS (SELECT quantile_cont(l_extendedprice, 0.05) AS lo,
        |    quantile_cont(l_extendedprice, 0.95) AS hi FROM lineitem)
        |SELECT count(l_extendedprice) AS n,
        |  round(lo, 4) AS lo, round(hi, 4) AS hi,
        |  round(avg(l_extendedprice), 4) AS mean,
        |  round(avg(CASE WHEN l_extendedprice < lo THEN lo
        |    WHEN l_extendedprice > hi THEN hi
        |    ELSE l_extendedprice END), 4) AS winsorized_mean,
        |  round(avg(CASE WHEN l_extendedprice BETWEEN lo AND hi
        |    THEN l_extendedprice END), 4) AS trimmed_mean,
        |  CAST(sum(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_lo,
        |  CAST(sum(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_hi
        |FROM lineitem, b GROUP BY lo, hi""".stripMargin,
    "q113_json_orc_roundtrip" ->
      // the round-trip preserves every double bit, so plain closed forms
      """SELECT count(*) AS n_rows,
        |  round(sum(l_quantity), 2) AS qty_sum,
        |  round(sum(l_discount * l_quantity), 4) AS disc_qty
        |FROM lineitem WHERE l_linenumber = 2""".stripMargin,
    "q112_audio_decode" ->
      // constant-amplitude PCM16 decode: mean = rms = amp/32768 exact
      """SELECT p_partkey % 10 AS bucket, count(*) AS n, count(*) AS n_ok,
        |  CAST(sum(800 + p_partkey % 100) AS BIGINT) AS sum_samples,
        |  CAST(count(*) * 16000 AS BIGINT) AS sum_rate,
        |  round(sum((p_partkey % 3001) / 32768.0), 6) AS sum_mean,
        |  round(sum((p_partkey % 3001) / 32768.0), 6) AS sum_rms
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,
    "q132_streaming_srm" ->
      // hourly arm counts; chisq = sum over arms of (obs-exp)^2/exp with
      // exp = 0.5*total, terms summed in arm order like the projection
      """WITH c AS (SELECT epoch(date_trunc('hour', ts)) AS w_start,
        |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1
        |  FROM events GROUP BY 1)
        |SELECT CAST(w_start AS BIGINT) AS w_start, c0, c1,
        |  CAST(0 AS BIGINT) AS c_unexpected,
        |  round((c0 - 0.5 * CAST(c0 + c1 AS DOUBLE))
        |      * (c0 - 0.5 * CAST(c0 + c1 AS DOUBLE))
        |      / (0.5 * CAST(c0 + c1 AS DOUBLE))
        |    + (c1 - 0.5 * CAST(c0 + c1 AS DOUBLE))
        |      * (c1 - 0.5 * CAST(c0 + c1 AS DOUBLE))
        |      / (0.5 * CAST(c0 + c1 AS DOUBLE)), 6) AS chisq
        |FROM c ORDER BY w_start""".stripMargin,
    "q133_streaming_ttest" ->
      // Welch moments from the same conditional sums: v = (q - s*s/n)/(n-1),
      // se = sqrt(v1/n1 + v0/n0), t = (m1-m0)/se; 6-hour epoch windows
      """WITH m AS (SELECT CAST(floor(epoch(ts) / 21600) AS BIGINT) * 21600 AS w_start,
        |    sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS n1,
        |    sum(CASE WHEN user_id % 2 = 1 THEN value ELSE 0 END) AS s1,
        |    sum(CASE WHEN user_id % 2 = 1 THEN value * value ELSE 0 END) AS q1,
        |    sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS n0,
        |    sum(CASE WHEN user_id % 2 = 0 THEN value ELSE 0 END) AS s0,
        |    sum(CASE WHEN user_id % 2 = 0 THEN value * value ELSE 0 END) AS q0
        |  FROM events GROUP BY 1),
        |d AS (SELECT *, s1 / n1 AS m1, s0 / n0 AS m0,
        |    (q1 - s1 * s1 / n1) / (n1 - 1) AS v1,
        |    (q0 - s0 * s0 / n0) / (n0 - 1) AS v0 FROM m
        |  WHERE n0 >= 2 AND n1 >= 2)
        |SELECT CAST(w_start AS BIGINT) AS w_start,
        |  CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
        |  round(m0, 6) AS mean0, round(m1, 6) AS mean1,
        |  round(m1 - m0, 6) AS estimate,
        |  round(sqrt(v1 / n1 + v0 / n0), 6) AS stderr,
        |  round((m1 - m0) / sqrt(v1 / n1 + v0 / n0), 6) AS t_statistic
        |FROM d ORDER BY w_start""".stripMargin,
    "q129_streaming_psi" ->
      // batch replay of the windowed PSI: hourly bin counts, shares
      // floored at 1e-6, the 4 terms summed left-to-right like the
      // streaming projection's reduce
      """WITH e AS (SELECT epoch(date_trunc('hour', ts)) AS w_start, value
        |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL),
        |b AS (SELECT w_start, CASE WHEN value < 15 THEN 0
        |    WHEN value < 35 THEN 1 WHEN value < 70 THEN 2
        |    ELSE 3 END AS bin FROM e),
        |c AS (SELECT w_start,
        |    CAST(sum(CASE WHEN bin = 0 THEN 1 ELSE 0 END) AS DOUBLE) AS n0,
        |    CAST(sum(CASE WHEN bin = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS n1,
        |    CAST(sum(CASE WHEN bin = 2 THEN 1 ELSE 0 END) AS DOUBLE) AS n2,
        |    CAST(sum(CASE WHEN bin = 3 THEN 1 ELSE 0 END) AS DOUBLE) AS n3,
        |    CAST(count(*) AS DOUBLE) AS nw
        |  FROM b GROUP BY 1),
        |t AS (SELECT w_start, nw,
        |    (greatest(n0 / nw, 1e-6) - 0.25) * ln(greatest(n0 / nw, 1e-6) / 0.25)
        |  + (greatest(n1 / nw, 1e-6) - 0.25) * ln(greatest(n1 / nw, 1e-6) / 0.25)
        |  + (greatest(n2 / nw, 1e-6) - 0.25) * ln(greatest(n2 / nw, 1e-6) / 0.25)
        |  + (greatest(n3 / nw, 1e-6) - 0.25) * ln(greatest(n3 / nw, 1e-6) / 0.25)
        |    AS psi FROM c)
        |SELECT CAST(w_start AS BIGINT) AS w_start,
        |  CAST(nw AS BIGINT) AS n_window, round(psi, 6) AS psi
        |FROM t ORDER BY w_start""".stripMargin,
    "q111_streaming_sessionize" ->
      // batch replay of the streaming semantics: gap-break sessions per
      // user, drop each user's LAST session (it never closes in-stream)
      """WITH e AS (SELECT user_id, epoch_ns(ts) AS t, value FROM events),
        |l AS (SELECT user_id, t, value,
        |    CASE WHEN lag(t) OVER w IS NULL
        |      OR t - lag(t) OVER w > 14400000000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t)),
        |s AS (SELECT user_id, t, value, sum(brk) OVER (PARTITION BY user_id
        |    ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM l),
        |g AS (SELECT user_id, sid, count(*) AS n, sum(value) AS sv,
        |    max(t) - min(t) AS dur FROM s GROUP BY 1, 2),
        |closed AS (SELECT g.* FROM g
        |  JOIN (SELECT user_id, max(sid) AS ms FROM g GROUP BY 1) f
        |  ON g.user_id = f.user_id AND g.sid < f.ms)
        |SELECT count(*) AS n_sessions,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(n) AS BIGINT) AS n_events,
        |  CAST(max(n) AS BIGINT) AS max_session_events,
        |  round(avg(n * 1.0), 6) AS avg_session_events,
        |  round(max(dur / 1e9), 6) AS max_duration_sec,
        |  round(sum(sv), 2) AS sum_value
        |FROM closed""".stripMargin,
    "q110_survival_verb" ->
      // identical estimator to q107 (same derivation), via the SQL verb
      // q88's estimator with the window partitioned by group; at-risk from
      // per-group totals joined back
      """WITH s AS (SELECT l_returnflag AS arm, CAST(l_quantity AS INT) AS time,
        |              CAST(l_linenumber % 2 AS INT) AS event FROM lineitem),
        |g AS (SELECT arm, time, sum(event) AS d, count(*) AS c
        |      FROM s GROUP BY 1, 2),
        |o AS (SELECT arm, time, d, c,
        |        sum(c) OVER (PARTITION BY arm ORDER BY time
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
        |      FROM g),
        |t AS (SELECT arm, sum(c) AS tot FROM g GROUP BY 1),
        |r AS (SELECT o.arm, time, d, c, tot - cumc + c AS n_risk
        |      FROM o JOIN t ON o.arm = t.arm)
        |SELECT arm, time, CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(d AS BIGINT) AS n_event, CAST(c - d AS BIGINT) AS n_censored,
        |  round(exp(sum(ln(1.0 - d * 1.0 / n_risk))
        |    OVER (PARTITION BY arm ORDER BY time
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS survival
        |FROM r ORDER BY arm, time""".stripMargin,
    "q107_km_grouped" ->
      // q88's estimator with the window partitioned by group; at-risk from
      // per-group totals joined back
      """WITH s AS (SELECT l_returnflag AS arm, CAST(l_quantity AS INT) AS time,
        |              CAST(l_linenumber % 2 AS INT) AS event FROM lineitem),
        |g AS (SELECT arm, time, sum(event) AS d, count(*) AS c
        |      FROM s GROUP BY 1, 2),
        |o AS (SELECT arm, time, d, c,
        |        sum(c) OVER (PARTITION BY arm ORDER BY time
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
        |      FROM g),
        |t AS (SELECT arm, sum(c) AS tot FROM g GROUP BY 1),
        |r AS (SELECT o.arm, time, d, c, tot - cumc + c AS n_risk
        |      FROM o JOIN t ON o.arm = t.arm)
        |SELECT arm, time, CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(d AS BIGINT) AS n_event, CAST(c - d AS BIGINT) AS n_censored,
        |  round(exp(sum(ln(1.0 - d * 1.0 / n_risk))
        |    OVER (PARTITION BY arm ORDER BY time
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS survival
        |FROM r ORDER BY arm, time""".stripMargin,
    "q108_log_rank" ->
      // O1/E1/V per pooled event time with at-risk by cumulative
      // subtraction; only times with d > 0 contribute
      """WITH s AS (SELECT CAST(l_orderkey % 2 AS INT) AS arm,
        |              CAST(l_quantity AS INT) AS time,
        |              CAST(l_linenumber % 2 AS INT) AS event FROM lineitem),
        |g AS (SELECT time,
        |        sum(CASE WHEN arm = 1 THEN event ELSE 0 END) AS d1,
        |        sum(CASE WHEN arm = 0 THEN event ELSE 0 END) AS d0,
        |        sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS x1,
        |        sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS x0
        |      FROM s GROUP BY 1),
        |o AS (SELECT *,
        |        (SELECT sum(x1) FROM g) - sum(x1) OVER w + x1 AS n1,
        |        (SELECT sum(x0) FROM g) - sum(x0) OVER w + x0 AS n0
        |      FROM g WINDOW w AS (ORDER BY time
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |e AS (SELECT d1, (d1 + d0) * n1 * 1.0 / (n1 + n0) AS e1,
        |        CASE WHEN n1 + n0 > 1 THEN
        |          (d1 + d0) * (n1 * 1.0 / (n1 + n0)) * (n0 * 1.0 / (n1 + n0))
        |            * (n1 + n0 - d1 - d0) / (n1 + n0 - 1.0) ELSE 0.0 END AS v
        |      FROM o WHERE d1 + d0 > 0)
        |SELECT round(sum(d1), 6) AS observed1, round(sum(e1), 6) AS expected1,
        |  round(sum(v), 6) AS variance,
        |  round((sum(d1) - sum(e1)) * (sum(d1) - sum(e1)) / sum(v), 6) AS chi2
        |FROM e""".stripMargin,
    "q106_feature_process" ->
      // min-max scaling replayed with corpus-level min/max as a 1-row
      // cross join; one-hot sums are plain conditional counts
      """WITH base AS (SELECT l_quantity AS q, l_extendedprice AS p,
        |    l_discount AS dc, l_returnflag AS rf,
        |    (l_orderkey % 2) AS label FROM lineitem),
        |m AS (SELECT min(q) AS qmn, max(q) AS qmx, min(p) AS pmn,
        |    max(p) AS pmx, min(dc) AS dmn, max(dc) AS dmx FROM base)
        |SELECT CAST(label AS INT) AS label, count(*) AS n_rows,
        |  CAST(6 AS INT) AS n_features,
        |  round(avg((q - qmn) / (qmx - qmn)), 6) AS avg_qty_scaled,
        |  round(avg((p - pmn) / (pmx - pmn)), 6) AS avg_price_scaled,
        |  round(avg((dc - dmn) / (dmx - dmn)), 6) AS avg_disc_scaled,
        |  CAST(sum(CASE WHEN rf = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_a,
        |  CAST(sum(CASE WHEN rf = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_n,
        |  CAST(sum(CASE WHEN rf = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_r
        |FROM base, m GROUP BY label ORDER BY label""".stripMargin,
    "q46_ivf_recall" ->
      // pinned deterministic fixture constant (q38 idiom): 20 probes × 5
      // planted exact-direction copies each, all recovered — recall 1.0.
      // The query itself ALSO throws below 0.95, so the gate gates twice.
      """SELECT CAST(20 AS BIGINT) AS n_queries, CAST(5 AS INT) AS k,
        |  CAST(100 AS BIGINT) AS n_true, CAST(100 AS BIGINT) AS n_hit,
        |  CAST(1.0 AS DOUBLE) AS recall, TRUE AS pass,
        |  '0.01' AS oracle_sf""".stripMargin,
    "q41_causal_tree" ->
      // planted τ(x) = 2 + 8·1{l_quantity>25}: the recovered segment-average
      // effect rounds to the planted integers; counts come from the data
      """SELECT segment, count(*) AS n_rows,
        |  CAST(CASE WHEN segment = 1 THEN 10.0 ELSE 2.0 END AS DOUBLE) AS recovered_effect
        |FROM (SELECT CAST(l_quantity > 25 AS INT) AS segment FROM lineitem)
        |GROUP BY segment ORDER BY segment""".stripMargin,
    "q42_causal_forest" ->
      """SELECT segment, count(*) AS n_rows,
        |  CAST(CASE WHEN segment = 1 THEN 10.0 ELSE 2.0 END AS DOUBLE) AS recovered_effect,
        |  CAST(1.0 AS DOUBLE) AS se_positive
        |FROM (SELECT CAST(l_quantity > 25 AS INT) AS segment FROM lineitem)
        |GROUP BY segment ORDER BY segment""".stripMargin,
    "q97_uplift_eval" ->
      // estimate_ate / estimate_roi / estimate_iroi closed forms on the
      // same deterministic arm-dependent benefit/cost fixture
      """WITH b AS (SELECT (l_orderkey % 2) AS tr, l_quantity AS y,
        |    l_extendedprice/1000 * (1 + 0.5*(l_orderkey % 2)) AS ben,
        |    l_quantity * (1 + (l_orderkey % 2)) AS cost FROM lineitem),
        |a AS (SELECT count(*) AS n,
        |    sum(CASE WHEN tr=1 THEN 1 ELSE 0 END) AS c1,
        |    sum(CASE WHEN tr=0 THEN 1 ELSE 0 END) AS c0,
        |    sum(CASE WHEN tr=1 THEN y ELSE 0 END) AS y1,
        |    sum(CASE WHEN tr=0 THEN y ELSE 0 END) AS y0,
        |    sum(ben) AS sben, sum(cost) AS scost,
        |    sum(CASE WHEN tr=1 THEN ben ELSE 0 END) AS b1,
        |    sum(CASE WHEN tr=0 THEN ben ELSE 0 END) AS b0,
        |    sum(CASE WHEN tr=1 THEN cost ELSE 0 END) AS k1,
        |    sum(CASE WHEN tr=0 THEN cost ELSE 0 END) AS k0
        |  FROM b)
        |SELECT n, round(y1/c1, 6) AS rate_t, round(y0/c0, 6) AS rate_c,
        |  round(y1/c1 - y0/c0, 6) AS ate, round(sben/scost, 6) AS roi,
        |  round(b1 - b0*(c1*1.0/c0), 2) AS inc_benefit,
        |  round(k1 - k0*(c1*1.0/c0), 2) AS inc_cost,
        |  round((b1 - b0*(c1*1.0/c0)) / (k1 - k0*(c1*1.0/c0)), 6) AS iroi
        |FROM a""".stripMargin,
    "q98_qini_curve" ->
      // cumulative-from-top qini curve + trapezoid AUUC, replayed with
      // window cumsums over the 5-bucket cell table + the (0,0) origin
      """WITH b AS (SELECT (CAST(l_quantity AS INT) % 5) AS bucket,
        |    (l_orderkey % 2) AS tr, l_extendedprice/1000 AS y FROM lineitem),
        |cells AS (SELECT bucket, count(*) AS cnt,
        |    sum(CASE WHEN tr=1 THEN 1 ELSE 0 END) AS tc,
        |    sum(CASE WHEN tr=0 THEN 1 ELSE 0 END) AS cc,
        |    sum(CASE WHEN tr=1 THEN y ELSE 0 END) AS tt,
        |    sum(CASE WHEN tr=0 THEN y ELSE 0 END) AS ct
        |  FROM b GROUP BY bucket),
        |tot AS (SELECT sum(cnt) AS n FROM cells),
        |cum AS (SELECT bucket,
        |    sum(cnt) OVER w AS ccnt, sum(tc) OVER w AS ctc,
        |    sum(cc) OVER w AS ccc, sum(tt) OVER w AS ctt, sum(ct) OVER w AS cct
        |  FROM cells
        |  WINDOW w AS (ORDER BY bucket DESC
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |curve AS (
        |  SELECT CAST(bucket AS INT) AS bucket, CAST(ccnt AS DOUBLE) AS n_cum,
        |    ccnt * 1.0 / (SELECT n FROM tot) AS fraction,
        |    (ctt/ctc - cct/ccc) * (ccnt * 1.0 / (SELECT n FROM tot)) AS qini
        |  FROM cum
        |  UNION ALL SELECT NULL, 0.0, 0.0, 0.0),
        |auuc AS (SELECT sum(df * my) AS a FROM (
        |  SELECT (fraction - lag(fraction) OVER (ORDER BY fraction)) AS df,
        |         (qini + lag(qini) OVER (ORDER BY fraction)) / 2 AS my
        |  FROM curve))
        |SELECT bucket, n_cum, round(fraction, 6) AS fraction,
        |  round(qini, 6) AS qini, round((SELECT a FROM auuc), 6) AS auuc
        |FROM curve""".stripMargin,
    "q99_eval_ci" ->
      // closed-form point estimate; pinned sf0.01 bootstrap band (weights
      // are pure functions of (id, rep, seed) → layout invariant)
      """SELECT round(avg(CASE WHEN l_orderkey % 2 = 1 THEN l_quantity END) -
        |        avg(CASE WHEN l_orderkey % 2 = 0 THEN l_quantity END), 6) AS ate,
        |  CAST(-0.31642 AS DOUBLE) AS ate_lower,
        |  CAST(0.186542 AS DOUBLE) AS ate_upper,
        |  CAST(0.130412 AS DOUBLE) AS ate_std_error,
        |  '0.01' AS oracle_sf
        |FROM lineitem""".stripMargin,
    "q104_cate_quantile" ->
      // exact quantile splits (linear interpolation — identical to Spark's
      // percentile on this discrete fixture), left-closed bucket
      // assignment, per-bucket difference in arm means; threshold = left
      // split edge, -inf for bucket 0
      """WITH b AS (SELECT (l_orderkey % 97)/97.0 AS score,
        |    (l_partkey % 2) AS tr, l_quantity AS y FROM lineitem),
        |s AS (SELECT quantile_cont(score, 0.25) AS s1,
        |    quantile_cont(score, 0.5) AS s2,
        |    quantile_cont(score, 0.75) AS s3 FROM b),
        |a AS (SELECT (CASE WHEN score >= s1 THEN 1 ELSE 0 END +
        |              CASE WHEN score >= s2 THEN 1 ELSE 0 END +
        |              CASE WHEN score >= s3 THEN 1 ELSE 0 END) AS bucket,
        |    tr, y FROM b, s),
        |c AS (SELECT bucket, count(*) AS n_rows,
        |    sum(CASE WHEN tr=1 THEN y ELSE 0 END) AS y1,
        |    sum(CASE WHEN tr=1 THEN 1 ELSE 0 END) AS c1,
        |    sum(CASE WHEN tr=0 THEN y ELSE 0 END) AS y0,
        |    sum(CASE WHEN tr=0 THEN 1 ELSE 0 END) AS c0
        |  FROM a GROUP BY bucket)
        |SELECT bucket,
        |  round(CASE bucket WHEN 0 THEN CAST('-infinity' AS DOUBLE)
        |    WHEN 1 THEN (SELECT s1 FROM s) WHEN 2 THEN (SELECT s2 FROM s)
        |    ELSE (SELECT s3 FROM s) END, 6) AS threshold,
        |  n_rows,
        |  round(n_rows * 1.0 / (SELECT sum(n_rows) FROM c), 6) AS fraction,
        |  round(y1/c1 - y0/c0, 6) AS cate
        |FROM c ORDER BY bucket""".stripMargin,
    "q103_perplexity" ->
      // the same add-one bigram model replayed relationally: tokens with a
      // post-filter renumbered position, bigrams by position join, counts,
      // smoothing, per-doc averages, per-lang roll-up
      """WITH tk AS (
        |  SELECT doc_id, tok,
        |    row_number() OVER (PARTITION BY doc_id ORDER BY ord) AS pos
        |  FROM (SELECT doc_id, unnest(ts) AS tok,
        |          generate_subscripts(ts, 1) AS ord
        |        FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS ts
        |              FROM documents))
        |  WHERE length(tok) > 0),
        |uni AS (SELECT tok AS w1, count(*) AS cu FROM tk GROUP BY 1),
        |vocab AS (SELECT count(*) AS v FROM uni),
        |pairs AS (SELECT a.doc_id, a.tok AS w1, b.tok AS w2
        |  FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
        |big AS (SELECT w1, w2, count(*) AS cb FROM pairs GROUP BY 1, 2),
        |scored AS (SELECT p.doc_id,
        |    ln((coalesce(cb, 0) + 1.0) / (coalesce(cu, 0) + (SELECT v FROM vocab))) AS logp
        |  FROM pairs p
        |  LEFT JOIN big USING (w1, w2)
        |  LEFT JOIN uni USING (w1)),
        |perdoc AS (SELECT doc_id, count(*) AS nb, avg(logp) AS lp,
        |    exp(-avg(logp)) AS ppl
        |  FROM scored GROUP BY 1)
        |SELECT lang, count(*) AS n_docs, CAST(sum(nb) AS BIGINT) AS n_bigrams,
        |  round(avg(lp), 6) AS mean_logp, round(avg(ppl), 4) AS mean_ppl
        |FROM perdoc JOIN documents USING (doc_id)
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q102_simulated_trial" ->
      // deterministic generator: pinned per-arm moments (pure function of
      // (n, seed) — valid at any sf and any layout)
      """SELECT * FROM (VALUES
        |  (0, CAST(49824 AS BIGINT), CAST(0.854120 AS DOUBLE), CAST(0.807813 AS DOUBLE), CAST(1.257213 AS DOUBLE)),
        |  (1, CAST(50176 AS BIGINT), CAST(1.669316 AS DOUBLE), CAST(0.807055 AS DOUBLE), CAST(1.261786 AS DOUBLE)))
        |AS t(treatment, n_rows, avg_outcome, avg_cate, avg_baseline)""".stripMargin,
    "q192_pr_curve" ->
      // same quadrants; precision with the empty-set=1 convention, AP as
      // a lag-window step integral over DESCENDING thresholds
      """WITH d AS (SELECT CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0 END AS label,
        |    l_quantity/50.0 AS score FROM lineitem),
        |t(threshold) AS (SELECT unnest([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])),
        |c AS (SELECT threshold,
        |    CAST(sum(CASE WHEN label=1 AND score>=threshold THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN label=0 AND score>=threshold THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN label=1 AND score<threshold THEN 1 ELSE 0 END) AS BIGINT) AS fn
        |  FROM d, t GROUP BY threshold),
        |r AS (SELECT threshold, tp, fp, fn,
        |    CASE WHEN tp+fp > 0 THEN tp*1.0/(tp+fp) ELSE 1.0 END AS prec,
        |    tp*1.0/(tp+fn) AS rec FROM c),
        |ap AS (SELECT sum(term) AS a FROM (
        |  SELECT (rec - coalesce(lag(rec) OVER (ORDER BY threshold DESC),
        |    0.0)) * prec AS term FROM r))
        |SELECT round(threshold, 2) AS threshold, tp, fp, fn,
        |  round(prec, 6) AS precision, round(rec, 6) AS recall,
        |  round(CASE WHEN prec+rec > 0 THEN 2*prec*rec/(prec+rec)
        |    ELSE 0.0 END, 6) AS f1,
        |  round((SELECT a FROM ap), 6) AS ap
        |FROM r ORDER BY threshold""".stripMargin,
    "q100_roc_curve" ->
      // confusion quadrants per threshold + trapezoid AUC over the sorted
      // deduplicated (fpr, tpr) points with the (0,0)/(1,1) rails
      """WITH d AS (SELECT CASE WHEN l_extendedprice > 30000 THEN 1 ELSE 0 END AS label,
        |    l_quantity/50.0 AS score FROM lineitem),
        |t(threshold) AS (SELECT unnest([0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9])),
        |c AS (SELECT threshold,
        |    CAST(sum(CASE WHEN label=1 AND score>=threshold THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(sum(CASE WHEN label=0 AND score>=threshold THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(sum(CASE WHEN label=0 AND score<threshold THEN 1 ELSE 0 END) AS BIGINT) AS tn,
        |    CAST(sum(CASE WHEN label=1 AND score<threshold THEN 1 ELSE 0 END) AS BIGINT) AS fn
        |  FROM d, t GROUP BY threshold),
        |r AS (SELECT threshold, tp, fp, tn, fn,
        |    tp*1.0/(tp+fn) AS tpr_raw, fp*1.0/(fp+tn) AS fpr_raw FROM c),
        |pts AS (SELECT fpr_raw AS x, tpr_raw AS y FROM r
        |  UNION SELECT 0.0, 0.0 UNION SELECT 1.0, 1.0),
        |auc AS (SELECT sum(term) AS a FROM (
        |  SELECT (x - lag(x) OVER (ORDER BY x, y)) *
        |         (y + lag(y) OVER (ORDER BY x, y))/2 AS term FROM pts))
        |SELECT round(threshold, 2) AS threshold, tp, fp, tn, fn,
        |  round(tpr_raw, 6) AS tpr, round(fpr_raw, 6) AS fpr,
        |  round((SELECT a FROM auc), 6) AS auc
        |FROM r""".stripMargin,
    "q101_corr_matrix" ->
      """WITH c AS (SELECT corr(l_quantity, l_extendedprice) AS qe,
        |    corr(l_quantity, l_discount) AS qd,
        |    corr(l_extendedprice, l_discount) AS ed FROM lineitem)
        |SELECT 'l_quantity' AS x_col, 'l_quantity' AS y_col, CAST(1.0 AS DOUBLE) AS corr FROM c
        |UNION ALL SELECT 'l_extendedprice', 'l_extendedprice', 1.0 FROM c
        |UNION ALL SELECT 'l_discount', 'l_discount', 1.0 FROM c
        |UNION ALL SELECT 'l_quantity', 'l_extendedprice', round(qe, 6) FROM c
        |UNION ALL SELECT 'l_extendedprice', 'l_quantity', round(qe, 6) FROM c
        |UNION ALL SELECT 'l_quantity', 'l_discount', round(qd, 6) FROM c
        |UNION ALL SELECT 'l_discount', 'l_quantity', round(qd, 6) FROM c
        |UNION ALL SELECT 'l_extendedprice', 'l_discount', round(ed, 6) FROM c
        |UNION ALL SELECT 'l_discount', 'l_extendedprice', round(ed, 6) FROM c""".stripMargin,
    "q96_vocabulary" ->
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split(lower(text), ' ')) AS token
        |      FROM documents)
        |WHERE length(token) > 0
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,
    "q95_quality_filter" ->
      // same rule order, same signals: whitespace token count and
      // non-space chars per token
      """WITH s AS (SELECT len(string_split(trim(text), ' ')) AS n,
        |  CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE) /
        |    greatest(len(string_split(trim(text), ' ')), 1) AS mwl
        |  FROM documents),
        |r AS (SELECT CASE
        |    WHEN n < 30 THEN 'too_few_tokens'
        |    WHEN n > 80 THEN 'too_many_tokens'
        |    WHEN mwl < 4.0 THEN 'mean_word_len_low'
        |    WHEN mwl > 5.0 THEN 'mean_word_len_high' END AS reason FROM s)
        |SELECT reason IS NULL AS keep, coalesce(reason, 'kept') AS reason,
        |  count(*) AS n_docs
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q94_forest_verb" ->
      // the planted effect is a pure function of h: all split improvement
      // lands on h, so the normalized importances round to (1, 0)
      """SELECT 'h' AS term, CAST(1 AS DOUBLE) AS importance
        |UNION ALL
        |SELECT 'l_discount' AS term, CAST(0 AS DOUBLE) AS importance
        |ORDER BY term""".stripMargin,
    "q93_sql_train_eval" ->
      // the one-feature OLS is closed-form in DuckDB: slope/intercept from
      // the regression aggregates, prediction = b0 + b1·x
      """WITH m AS (SELECT regr_slope(l_extendedprice, l_quantity) AS b1,
        |                  regr_intercept(l_extendedprice, l_quantity) AS b0
        |           FROM lineitem)
        |SELECT l_returnflag, count(*) AS n_rows,
        |  round(avg(m.b0 + m.b1 * l_quantity), 2) AS avg_pred
        |FROM lineitem CROSS JOIN m
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q87_eval_forest_sql" ->
      // the stored forest scored by path through SQL recovers the same
      // planted per-segment τ as q41/q42's in-process scoring
      """SELECT segment, count(*) AS n_rows,
        |  CAST(CASE WHEN segment = 1 THEN 10.0 ELSE 2.0 END AS DOUBLE) AS recovered_effect
        |FROM (SELECT CAST(l_quantity > 25 AS INT) AS segment FROM lineitem)
        |GROUP BY segment ORDER BY segment""".stripMargin,
    "q89_meta_learners" ->
      // all three meta-learners recover the same planted per-segment τ
      """SELECT segment, count(*) AS n_rows,
        |  CAST(CASE WHEN segment = 1 THEN 10.0 ELSE 2.0 END AS DOUBLE) AS s_learner_effect,
        |  CAST(CASE WHEN segment = 1 THEN 10.0 ELSE 2.0 END AS DOUBLE) AS t_learner_effect,
        |  CAST(CASE WHEN segment = 1 THEN 10.0 ELSE 2.0 END AS DOUBLE) AS x_learner_effect
        |FROM (SELECT CAST(l_quantity > 25 AS INT) AS segment FROM lineitem)
        |GROUP BY segment ORDER BY segment""".stripMargin,
    "q90_uplift_estimators" ->
      // every estimator's saturated-logistic score is a cell statistic:
      // CVT = 2·E[1{T=Y}|seg]−1, model propensity = E[T|seg], simple
      // propensity = the arm's share, retrospective = E[T|seg, Y=1]
      """WITH base AS (
        |  SELECT CAST(l_quantity > 25 AS INT) AS seg,
        |         CAST(l_orderkey % 2 AS INT) AS treat,
        |         CAST(l_extendedprice > 30000 AS INT) AS y
        |  FROM lineitem),
        |tot AS (SELECT avg(CAST(treat AS DOUBLE)) AS pt FROM base),
        |segs AS (SELECT seg,
        |    avg(CASE WHEN treat = y THEN 1.0 ELSE 0.0 END) AS ez,
        |    avg(CAST(treat AS DOUBLE)) AS pseg
        |  FROM base GROUP BY seg),
        |retro AS (SELECT seg, avg(CAST(treat AS DOUBLE)) AS rseg
        |  FROM base WHERE y = 1 GROUP BY seg)
        |SELECT b.seg, b.treat, count(*) AS n_rows,
        |  round(2 * s.ez - 1, 6) AS cvt_score,
        |  round(CASE WHEN b.treat = 1 THEN t.pt ELSE 1 - t.pt END, 6)
        |    AS propensity_simple,
        |  round(s.pseg, 6) AS propensity_model,
        |  round(r.rseg, 6) AS retrospective_score
        |FROM base b
        |CROSS JOIN tot t
        |JOIN segs s ON s.seg = b.seg
        |JOIN retro r ON r.seg = b.seg
        |GROUP BY b.seg, b.treat, s.ez, s.pseg, r.rseg, t.pt
        |ORDER BY b.seg, b.treat""".stripMargin,
    "q88_kaplan_meier" ->
      // the textbook Kaplan-Meier product-limit estimator, replayed in
      // SQL: per-time death/total counts, at-risk by cumulative
      // subtraction, survival = exp(running sum of ln(1 - d/r))
      """WITH s AS (SELECT CAST(l_quantity AS INT) AS time,
        |              CAST(l_linenumber % 2 AS INT) AS event FROM lineitem),
        |g AS (SELECT time, sum(event) AS d, count(*) AS c FROM s GROUP BY time),
        |o AS (SELECT time, d, c,
        |        sum(c) OVER (ORDER BY time ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc
        |      FROM g),
        |r AS (SELECT time, d, c,
        |        (SELECT sum(c) FROM g) - cumc + c AS n_risk FROM o)
        |SELECT time, CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(d AS BIGINT) AS n_event, CAST(c - d AS BIGINT) AS n_censored,
        |  round(exp(sum(ln(1.0 - d * 1.0 / n_risk))
        |    OVER (ORDER BY time ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS survival
        |FROM r ORDER BY time""".stripMargin,
    "q38_simhash_pairs" ->
      // pinned sf0.01 per-hamming-distance pair counts (deterministic:
      // content-seeded xxhash64 simhash, pigeonhole bucketing, groupBy
      // count is partition-layout invariant). The driver's gate runs at
      // sf0.01 only. Counts reflect the kernel's representative-reduced
      // pair semantics (exact-simhash clusters pair through their min-id
      // representative — see Dedup.hammingPairs guard 1), which trims a
      // few member-level cross pairs at hamming >= 6 vs the pre-collapse
      // r10 pins.
      """SELECT CAST(hamming AS INT) AS hamming, CAST(n_pairs AS BIGINT) AS n_pairs,
        |  '0.01' AS oracle_sf
        |FROM (VALUES (0,4),(1,2),(2,6),(3,5),(4,14),(5,29),(6,60),(7,105),
        |  (8,153),(9,217),(10,231),(11,280),(12,287),(13,243),(14,205),
        |  (15,162),(16,120)) AS t(hamming, n_pairs)
        |ORDER BY hamming""".stripMargin,
    "q44_winnow_dupes" ->
      // exact copies share all winnow fingerprints (sim 1.0); no natural
      // exact dupes among doc_id < 50 at either SF
      """SELECT doc_id AS id_a, doc_id + 10000 AS id_b,
        |  CAST(1.0 AS DOUBLE) AS sim
        |FROM documents WHERE doc_id < 50""".stripMargin,
    "q45_image_decode" ->
      // solid 8×8 PNG decode: channel mean is exactly c/255, stds exactly 0
      """SELECT p_partkey % 10 AS bucket, COUNT(*) AS n, COUNT(*) AS n_ok,
        |  CAST(COUNT(*) * 8 AS BIGINT) AS sum_w,
        |  CAST(COUNT(*) * 8 AS BIGINT) AS sum_h,
        |  ROUND(SUM((p_partkey % 251) / 255.0), 6) AS sum_mean_r,
        |  ROUND(SUM((p_partkey % 241) / 255.0), 6) AS sum_mean_g,
        |  ROUND(SUM((p_partkey % 239) / 255.0), 6) AS sum_mean_b,
        |  ROUND(SUM(0.0), 6) AS sum_std
        |FROM part GROUP BY 1 ORDER BY 1""".stripMargin,
    "q43_connected_components" ->
      // chains [0..49],[50..99],... → component = chain start, closed form
      """SELECT doc_id AS id, CAST((doc_id // 50) * 50 AS BIGINT) AS component
        |FROM documents WHERE doc_id < 1000 ORDER BY doc_id""".stripMargin,
    "q47_ttests_2samp" ->
      """WITH g AS (
        |  SELECT (l_orderkey % 2) AS treat, count(*) AS n,
        |    avg(l_quantity) AS m, var_samp(l_quantity) AS v
        |  FROM lineitem GROUP BY 1)
        |SELECT
        |  round(max(CASE WHEN treat = 1 THEN m END) - max(CASE WHEN treat = 0 THEN m END), 6) AS estimate,
        |  round(sqrt(max(CASE WHEN treat = 0 THEN v / n END) + max(CASE WHEN treat = 1 THEN v / n END)), 6) AS stderr,
        |  TRUE AS same_estimate, TRUE AS ci_nested_lower, TRUE AS ci_nested_upper
        |FROM g""".stripMargin,
    "q48_predict_interval" ->
      """WITH st AS (
        |  SELECT count(*) AS n, avg(l_quantity) AS xb,
        |    regr_slope(l_extendedprice, l_quantity) AS b,
        |    regr_intercept(l_extendedprice, l_quantity) AS a,
        |    regr_sxx(l_extendedprice, l_quantity) AS sxx,
        |    regr_syy(l_extendedprice, l_quantity) AS syy,
        |    regr_r2(l_extendedprice, l_quantity) AS r2
        |  FROM lineitem)
        |SELECT x, round(b * x + a, 4) AS fit,
        |  round(sqrt(syy * (1 - r2) / (n - 2) * (1.0 / n + (x - xb) * (x - xb) / sxx)), 4) AS se_fit,
        |  TRUE AS ordered
        |FROM st, (VALUES (10.0), (25.0), (40.0)) AS p(x)
        |ORDER BY x""".stripMargin,
    "q49_lasso" ->
      // pinned sf0.01 Lasso fit (deterministic OWL-QN; the noise covariate
      // is exactly zeroed by the L1 proximal step)
      """SELECT CAST(0.23 AS DOUBLE) AS b_quantity, TRUE AS noise_zeroed,
        |  CAST(53048.36 AS DOUBLE) AS intercept, '0.01' AS oracle_sf""".stripMargin,
    "q50_matrix_mult" ->
      """SELECT
        |  round(sum(l_quantity * l_quantity), 2) AS g_qq,
        |  round(sum(l_quantity * l_discount), 4) AS g_qd,
        |  round(sum(l_quantity), 2) AS g_q1,
        |  round(sum(l_discount * l_discount), 6) AS g_dd,
        |  round(sum(l_discount), 4) AS g_d1,
        |  round(count(*) * 1.0, 1) AS g_11
        |FROM lineitem""".stripMargin,
    "q51_bootstrap" ->
      // pinned sf0.01 bootstrap summary (weights are pure functions of
      // (id, rep, seed) → partition-layout invariant)
      """SELECT CAST(50 AS BIGINT) AS n_reps,
        |  CAST(25.402763 AS DOUBLE) AS boot_mean,
        |  CAST(0.05931 AS DOUBLE) AS boot_std,
        |  CAST(25.289389 AS DOUBLE) AS ci_lower,
        |  CAST(25.531296 AS DOUBLE) AS ci_upper,
        |  '0.01' AS oracle_sf""".stripMargin,
    "q52_permutation" ->
      // observed diff-in-means is a closed form; the permutation p-value is
      // a deterministic fixture constant (pinned, sf0.01)
      """WITH g AS (
        |  SELECT (l_orderkey % 2) AS treat, avg(l_quantity) AS m
        |  FROM lineitem GROUP BY 1)
        |SELECT
        |  round(max(CASE WHEN treat = 1 THEN m END) - max(CASE WHEN treat = 0 THEN m END), 6) AS observed,
        |  CAST(0.49 AS DOUBLE) AS p_value, CAST(200 AS BIGINT) AS n_reps,
        |  '0.01' AS oracle_sf
        |FROM g""".stripMargin,
    "q53_iv_regression" ->
      """WITH base AS (
        |  SELECT l_extendedprice AS y, l_quantity AS t,
        |    l_quantity + (l_orderkey % 5) AS z
        |  FROM lineitem),
        |s1 AS (SELECT regr_slope(t, z) AS b1, regr_intercept(t, z) AS a1 FROM base),
        |r AS (SELECT y, a1 + b1 * z AS th FROM base, s1),
        |s2 AS (SELECT regr_slope(y, th) AS beta, regr_intercept(y, th) AS a2,
        |              regr_syy(y, th) AS syy, regr_r2(y, th) AS r2,
        |              regr_sxx(y, th) AS sxx, count(*) AS n FROM r)
        |SELECT round(beta, 4) AS beta_t, round(a2, 2) AS intercept,
        |  round(sqrt(syy * (1 - r2) / (n - 2) / sxx), 4) AS stderr
        |FROM s2""".stripMargin,
    "q54_did" ->
      """WITH cells AS (
        |  SELECT (l_orderkey % 2) AS tr, (l_linenumber % 2) AS po,
        |    avg(l_extendedprice) AS m
        |  FROM lineitem GROUP BY 1, 2),
        |w AS (SELECT
        |  max(CASE WHEN tr = 0 AND po = 0 THEN m END) AS m00,
        |  max(CASE WHEN tr = 1 AND po = 0 THEN m END) AS m10,
        |  max(CASE WHEN tr = 0 AND po = 1 THEN m END) AS m01,
        |  max(CASE WHEN tr = 1 AND po = 1 THEN m END) AS m11 FROM cells)
        |SELECT round(m10 - m00, 2) AS b_treat, round(m01 - m00, 2) AS b_post,
        |  round(m11 - m10 - m01 + m00, 2) AS b_did, round(m00, 2) AS intercept
        |FROM w""".stripMargin,
    "q55_longterm" ->
      """WITH pairs AS (
        |  SELECT l_quantity AS f, 0.8 * l_quantity + 10.0 * l_discount AS tt FROM lineitem
        |  UNION ALL
        |  SELECT 0.8 * l_quantity + 10.0 * l_discount,
        |         0.6 * l_quantity + l_extendedprice / 10000.0 FROM lineitem),
        |tr AS (SELECT regr_slope(tt, f) AS b, regr_intercept(tt, f) AS a FROM pairs),
        |g AS (SELECT (l_orderkey % 2) AS t2,
        |        avg(0.6 * l_quantity + l_extendedprice / 10000.0) AS m
        |      FROM lineitem GROUP BY 1),
        |dm AS (SELECT max(CASE WHEN t2 = 1 THEN m END)
        |         - max(CASE WHEN t2 = 0 THEN m END) AS d FROM g)
        |SELECT 1 AS horizon, round(b * d, 6) AS estimate FROM tr, dm
        |UNION ALL
        |SELECT 2, round(b * b * d, 6) FROM tr, dm
        |ORDER BY horizon""".stripMargin,
    "q63_longterm_multi" ->
      """WITH pairs AS (
        |  SELECT l_quantity AS f1, l_discount * 100.0 AS f2,
        |    0.8 * l_quantity + 10.0 * l_discount AS u1,
        |    0.3 * l_quantity + l_extendedprice / 20000.0 AS u2
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 0.8 * l_quantity + 10.0 * l_discount,
        |    0.3 * l_quantity + l_extendedprice / 20000.0,
        |    0.6 * l_quantity + l_extendedprice / 10000.0,
        |    5.0 * l_discount + 0.1 * l_quantity
        |  FROM lineitem),
        |c AS (SELECT
        |  covar_samp(f1, f1) AS v11, covar_samp(f1, f2) AS v12, covar_samp(f2, f2) AS v22,
        |  covar_samp(u1, f1) AS c11, covar_samp(u1, f2) AS c12,
        |  covar_samp(u2, f1) AS c21, covar_samp(u2, f2) AS c22
        |FROM pairs),
        |w AS (SELECT
        |  (c11 * v22 - c12 * v12) / (v11 * v22 - v12 * v12) AS w11,
        |  (c12 * v11 - c11 * v12) / (v11 * v22 - v12 * v12) AS w12,
        |  (c21 * v22 - c22 * v12) / (v11 * v22 - v12 * v12) AS w21,
        |  (c22 * v11 - c21 * v12) / (v11 * v22 - v12 * v12) AS w22
        |FROM c),
        |g AS (SELECT (l_orderkey % 2) AS t2,
        |    avg(0.6 * l_quantity + l_extendedprice / 10000.0) AS m1,
        |    avg(5.0 * l_discount + 0.1 * l_quantity) AS m2
        |  FROM lineitem GROUP BY 1),
        |dm AS (SELECT
        |  max(CASE WHEN t2 = 1 THEN m1 END) - max(CASE WHEN t2 = 0 THEN m1 END) AS d1,
        |  max(CASE WHEN t2 = 1 THEN m2 END) - max(CASE WHEN t2 = 0 THEN m2 END) AS d2
        |FROM g)
        |SELECT 1 AS horizon, round(w11 * d1 + w12 * d2, 6) AS estimate FROM w, dm
        |UNION ALL
        |SELECT 2, round(w11 * (w11 * d1 + w12 * d2) + w12 * (w21 * d1 + w22 * d2), 6) FROM w, dm
        |ORDER BY horizon""".stripMargin,
    "q56_one_hot" ->
      """SELECT l_linestatus, count(*) AS n_rows,
        |  CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS n_n,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS n_r
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q57_cdf_scalars" ->
      // tgamma/lgamma against DuckDB's own gamma/lgamma; Φ(x/4) and
      // t-CDF(x/4, df=10) are SF-independent math constants (values from
      // commons-math, cross-checked against stdlib erf / numeric
      // integration)
      """SELECT l_linenumber, count(*) AS n_rows,
        |  round(gamma(l_linenumber), 4) AS tgamma_x,
        |  round(lgamma(l_linenumber), 6) AS lgamma_x,
        |  CASE l_linenumber
        |    WHEN 1 THEN 0.598706 WHEN 2 THEN 0.691462 WHEN 3 THEN 0.773373
        |    WHEN 4 THEN 0.841345 WHEN 5 THEN 0.89435 WHEN 6 THEN 0.933193
        |    WHEN 7 THEN 0.959941 END AS norm_cdf,
        |  CASE l_linenumber
        |    WHEN 1 THEN 0.596176 WHEN 2 THEN 0.686053 WHEN 3 THEN 0.764734
        |    WHEN 4 THEN 0.829553 WHEN 5 THEN 0.88012 WHEN 6 THEN 0.917746
        |    WHEN 7 THEN 0.94466 END AS t_cdf
        |FROM lineitem GROUP BY l_linenumber ORDER BY l_linenumber""".stripMargin,
    "q58_ipw_ate" ->
      """WITH base AS (
        |  SELECT l_extendedprice AS y, (l_orderkey % 2) AS t,
        |    0.3 + 0.4 * CASE WHEN l_quantity > 25.0 THEN 1 ELSE 0 END AS e
        |  FROM lineitem),
        |est AS (SELECT
        |  avg(CASE WHEN t = 1 THEN y END) - avg(CASE WHEN t = 0 THEN y END) AS ate,
        |  sum(t * y / e) / count(*) - sum((1 - t) * y / (1 - e)) / count(*) AS ipw
        |FROM base)
        |SELECT round(ate, 6) AS ate, CAST(243.294201 AS DOUBLE) AS ate_stderr,
        |  round(ipw, 6) AS ipw, '0.01' AS oracle_sf
        |FROM est""".stripMargin,
    "q60_gateway_sql" ->
      // same statistic as q30 computed through the SQL gateway + CTE
      """WITH g AS (
        |  SELECT
        |    avg(CASE WHEN l_orderkey % 2 = 1 THEN l_quantity END) AS m1q,
        |    avg(CASE WHEN l_orderkey % 2 = 0 THEN l_quantity END) AS m0q,
        |    var_samp(CASE WHEN l_orderkey % 2 = 1 THEN l_quantity END) AS v1q,
        |    var_samp(CASE WHEN l_orderkey % 2 = 0 THEN l_quantity END) AS v0q,
        |    avg(CASE WHEN l_orderkey % 2 = 1 THEN l_discount END) AS m1d,
        |    avg(CASE WHEN l_orderkey % 2 = 0 THEN l_discount END) AS m0d,
        |    var_samp(CASE WHEN l_orderkey % 2 = 1 THEN l_discount END) AS v1d,
        |    var_samp(CASE WHEN l_orderkey % 2 = 0 THEN l_discount END) AS v0d
        |  FROM lineitem)
        |SELECT 'l_quantity' AS covariate, round((m1q - m0q) / sqrt((v1q + v0q) / 2), 6) AS smd FROM g
        |UNION ALL
        |SELECT 'l_discount', round((m1d - m0d) / sqrt((v1d + v0d) / 2), 6) FROM g""".stripMargin,
    "q65_csv_rename_split" ->
      // n_rows / price_sum are closed forms over the filtered source; the
      // split sizes are pinned sf0.01 constants (seed+layout deterministic)
      """SELECT CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS price_sum,
        |  CAST(6506 AS BIGINT) AS n_train, CAST(2084 AS BIGINT) AS n_test,
        |  TRUE AS split_consistent, '0.01' AS oracle_sf
        |FROM lineitem WHERE l_linenumber = 1""".stripMargin,
    "q64_gateway_compose" ->
      // q30's smd closed form, with the row count cross-joined in — the
      // SQL analogue of the gateway's broadcast splice
      """WITH g AS (
        |  SELECT count(*) AS n_rows,
        |    avg(CASE WHEN l_orderkey % 2 = 1 THEN l_quantity END) AS m1q,
        |    avg(CASE WHEN l_orderkey % 2 = 0 THEN l_quantity END) AS m0q,
        |    var_samp(CASE WHEN l_orderkey % 2 = 1 THEN l_quantity END) AS v1q,
        |    var_samp(CASE WHEN l_orderkey % 2 = 0 THEN l_quantity END) AS v0q,
        |    avg(CASE WHEN l_orderkey % 2 = 1 THEN l_discount END) AS m1d,
        |    avg(CASE WHEN l_orderkey % 2 = 0 THEN l_discount END) AS m0d,
        |    var_samp(CASE WHEN l_orderkey % 2 = 1 THEN l_discount END) AS v1d,
        |    var_samp(CASE WHEN l_orderkey % 2 = 0 THEN l_discount END) AS v0d
        |  FROM lineitem)
        |SELECT n_rows, 'l_quantity' AS covariate,
        |  round((m1q - m0q) / sqrt((v1q + v0q) / 2), 6) AS smd FROM g
        |UNION ALL
        |SELECT n_rows, 'l_discount',
        |  round((m1d - m0d) / sqrt((v1d + v0d) / 2), 6) FROM g
        |ORDER BY covariate""".stripMargin,
    "q59_wls" ->
      """WITH s AS (
        |  SELECT sum(w) AS sw, sum(w * x) AS swx, sum(w * y) AS swy,
        |         sum(w * x * x) AS swxx, sum(w * x * y) AS swxy
        |  FROM (SELECT CAST(l_linenumber % 3 + 1 AS DOUBLE) AS w,
        |               l_quantity AS x, l_extendedprice AS y FROM lineitem))
        |SELECT round((sw * swxy - swx * swy) / (sw * swxx - swx * swx), 4) AS slope,
        |  round((swy - (sw * swxy - swx * swy) / (sw * swxx - swx * swx) * swx) / sw, 2) AS intercept
        |FROM s""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "q03_filter_project_sort" ->
      """SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders WHERE o_totalprice > 100000.0 AND o_orderstatus = 'O'
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 50""".stripMargin,
    "q04_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45.0)
        |GROUP BY o_orderpriority""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_totalprice > 450000.0)
        |GROUP BY c_mktsegment""".stripMargin,
    "q06_union" ->
      """SELECT l_linestatus, count(*) AS n_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM (SELECT l_linestatus, l_quantity FROM lineitem WHERE l_returnflag = 'A'
        |      UNION ALL
        |      SELECT l_linestatus, l_quantity FROM lineitem WHERE l_returnflag = 'R')
        |GROUP BY l_linestatus""".stripMargin,
    "q07_distinct_agg" ->
      """SELECT l_suppkey, count(DISTINCT l_partkey) AS n_parts,
        |  count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_suppkey""".stripMargin,
    "q08_window_topk" ->
      """SELECT o_custkey, o_orderkey, rk FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders) WHERE rk <= 3""".stripMargin,
    "q09_quantiles" ->
      """SELECT l_returnflag,
        |  round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
        |  round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q10_describe" ->
      """SELECT l_linestatus, count(*) AS cnt,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
        |  round(stddev_samp(l_quantity), 6) AS std_qty,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q11_deterministic_sample" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem WHERE (l_orderkey * 1103515245 + 12345) % 1000 < 100
        |GROUP BY l_returnflag""".stripMargin,
    "q12_cut_bins" ->
      """SELECT CASE WHEN l_quantity < 10 THEN '[0,10)'
        |            WHEN l_quantity < 20 THEN '[10,20)'
        |            WHEN l_quantity < 30 THEN '[20,30)'
        |            WHEN l_quantity < 40 THEN '[30,40)'
        |            ELSE '[40,inf)' END AS bin, count(*) AS n_rows
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q13_pivot_counts" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN l_returnflag = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
        |  CAST(sum(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_n,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_r
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,
    "q14_delta_method" ->
      """SELECT l_returnflag, round(var_samp(l_quantity) / count(*), 8) AS dm_var
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q15_ttest_2samp" ->
      """WITH g AS (
        |  SELECT (l_orderkey % 2) AS treat, count(*) AS n,
        |    avg(l_quantity) AS m, var_samp(l_quantity) AS v
        |  FROM lineitem GROUP BY 1)
        |SELECT
        |  round(max(CASE WHEN treat = 0 THEN m END), 6) AS mean0,
        |  round(max(CASE WHEN treat = 1 THEN m END), 6) AS mean1,
        |  round(max(CASE WHEN treat = 1 THEN m END) - max(CASE WHEN treat = 0 THEN m END), 6) AS estimate,
        |  round(sqrt(max(CASE WHEN treat = 0 THEN v / n END) + max(CASE WHEN treat = 1 THEN v / n END)), 6) AS stderr
        |FROM g""".stripMargin,
    "q86_repetition" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents),
        |d AS (
        |  SELECT doc_id,
        |    1.0 - len(list_distinct(ts)) * 1.0 / greatest(len(ts), 1) AS dup,
        |    CASE WHEN len(ts) < 2 THEN [array_to_string(ts, ' ')]
        |      ELSE list_transform(generate_series(1, len(ts) - 1),
        |        i -> ts[i] || ' ' || ts[i + 1]) END AS bg2,
        |    CASE WHEN len(ts) < 3 THEN [array_to_string(ts, ' ')]
        |      ELSE list_transform(generate_series(1, len(ts) - 2),
        |        i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2]) END AS bg3
        |  FROM w),
        |e2 AS (SELECT doc_id, unnest(bg2) AS g, len(bg2) AS nb FROM d),
        |c2 AS (SELECT doc_id, count(*) AS c, any_value(nb) AS nb FROM e2
        |       GROUP BY doc_id, g),
        |t2 AS (SELECT doc_id, max(c) * 1.0 / any_value(nb) AS top2 FROM c2
        |       GROUP BY doc_id),
        |e3 AS (SELECT doc_id, unnest(bg3) AS g, len(bg3) AS nb FROM d),
        |c3 AS (SELECT doc_id, count(*) AS c, any_value(nb) AS nb FROM e3
        |       GROUP BY doc_id, g),
        |t3 AS (SELECT doc_id, max(c) * 1.0 / any_value(nb) AS top3 FROM c3
        |       GROUP BY doc_id),
        |j AS (SELECT d.doc_id, d.dup, t2.top2, t3.top3 FROM d
        |      JOIN t2 ON d.doc_id = t2.doc_id JOIN t3 ON d.doc_id = t3.doc_id)
        |SELECT count(*) AS n_docs,
        |  round(avg(dup), 6) AS avg_dup_token_ratio,
        |  round(avg(top2), 6) AS avg_top2_share,
        |  round(max(top2), 6) AS max_top2_share,
        |  count(CASE WHEN top2 >= 0.1 THEN 1 END) AS n_top2_ge_10pct,
        |  round(avg(top3), 6) AS avg_top3_share
        |FROM j""".stripMargin,
    "q85_pii_redaction" ->
      """WITH p AS (
        |  SELECT doc_id, text ||
        |    CASE WHEN doc_id % 2 = 0 THEN ' mail u' || doc_id || '@example.com'
        |         ELSE '' END ||
        |    CASE WHEN doc_id % 3 = 0 THEN ' call +1-555-' ||
        |         lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
        |    CASE WHEN doc_id % 5 = 0 THEN ' host 10.0.' || (doc_id % 200) ||
        |         '.' || (doc_id % 250) ELSE '' END AS txt
        |  FROM documents),
        |r AS (
        |  SELECT txt, regexp_replace(regexp_replace(regexp_replace(txt,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
        |    '\+[0-9][0-9\- ]{6,}[0-9]', '<PHONE>', 'g') AS clean
        |  FROM p)
        |SELECT
        |  CAST(sum(len(regexp_extract_all(txt,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT)
        |    AS n_emails,
        |  CAST(sum(len(regexp_extract_all(txt,
        |    '\+[0-9][0-9\- ]{6,}[0-9]'))) AS BIGINT) AS n_phones,
        |  CAST(sum(len(regexp_extract_all(txt,
        |    '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b'))) AS BIGINT) AS n_ips,
        |  count(CASE WHEN len(regexp_extract_all(clean,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) +
        |    len(regexp_extract_all(clean, '\+[0-9][0-9\- ]{6,}[0-9]')) +
        |    len(regexp_extract_all(clean,
        |      '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) = 0 THEN 1 END)
        |    AS n_clean_docs,
        |  CAST(sum(length(txt) - length(clean)) AS BIGINT) AS chars_removed,
        |  count(CASE WHEN contains(clean, '<EMAIL>') THEN 1 END)
        |    AS n_docs_with_email
        |FROM r""".stripMargin,
    "q84_asof_join" ->
      """WITH p AS (
        |  SELECT event_id, user_id, epoch_ns(ts) AS tn FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (
        |  SELECT user_id, epoch_ns(ts) AS tn, value FROM events
        |  WHERE event_type = 'click'),
        |m AS (
        |  SELECT p.event_id, p.tn, max(c.tn) AS ctn,
        |         max_by(c.value, c.tn) AS cv
        |  FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.tn <= p.tn
        |  GROUP BY 1, 2),
        |g AS (SELECT (tn - ctn) / 1e9 AS gap, cv, ctn FROM m)
        |SELECT count(*) AS n_purchases,
        |  count(ctn) AS n_matched,
        |  count(CASE WHEN gap <= 3600.0 THEN 1 END) AS n_within_1h,
        |  round(avg(gap), 6) AS avg_gap_sec,
        |  round(max(gap), 6) AS max_gap_sec,
        |  round(sum(cv), 2) AS sum_click_value
        |FROM g""".stripMargin,
    "q83_packing" ->
      """WITH d AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
        |c AS (
        |  SELECT doc_id, n,
        |    sum(n) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM d),
        |p AS (
        |  SELECT n, CAST(floor((cum - n) / 512.0) AS BIGINT) AS fw,
        |         CAST(floor((cum - 1) / 512.0) AS BIGINT) AS lw FROM c)
        |SELECT count(*) AS n_docs,
        |  CAST(sum(lw - fw) AS BIGINT) AS n_boundary_crossings,
        |  CAST(max(lw) + 1 AS BIGINT) AS n_windows_total,
        |  count(CASE WHEN lw > fw THEN 1 END) AS n_boundary_docs,
        |  round(avg(lw - fw + 1), 6) AS avg_windows_per_doc,
        |  CAST(max(lw - fw + 1) AS BIGINT) AS max_windows_per_doc
        |FROM p""".stripMargin,
    "q82_contamination" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents
        |  WHERE text IS NOT NULL AND length(text) > 0),
        |sh AS (
        |  SELECT doc_id, list_distinct(CASE WHEN len(w) < 5
        |    THEN [array_to_string(w, ' ')]
        |    ELSE list_transform(generate_series(1, len(w) - 4),
        |                        i -> array_to_string(w[i:i+4], ' ')) END) AS gs
        |  FROM w),
        |cg AS (SELECT doc_id, unnest(gs) AS g FROM sh),
        |pg AS (SELECT DISTINCT g FROM cg WHERE doc_id % 20 = 0),
        |j AS (
        |  SELECT cg.doc_id, count(*) AS n_shingles,
        |    sum(CASE WHEN pg.g IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
        |  FROM cg LEFT JOIN pg ON cg.g = pg.g GROUP BY 1),
        |f AS (SELECT *, n_hit * 1.0 / n_shingles AS c FROM j)
        |SELECT count(*) AS n_docs,
        |  count(CASE WHEN c = 1.0 THEN 1 END) AS n_full,
        |  count(CASE WHEN c >= 0.5 THEN 1 END) AS n_above_half,
        |  CAST(sum(n_hit) AS BIGINT) AS n_hits,
        |  CAST(sum(n_shingles) AS BIGINT) AS n_shingles,
        |  round(avg(c), 6) AS avg_contamination
        |FROM f""".stripMargin,
    "q92_token_budget_mix" ->
      // same md5 order, same exclusive-prefix budget rule
      """WITH base AS (
        |  SELECT doc_id, lang, n_chars, md5(CAST(doc_id AS VARCHAR)) AS ord
        |  FROM documents WHERE lang IN ('en', 'fr', 'zh')),
        |c AS (SELECT *, sum(n_chars) OVER (PARTITION BY lang ORDER BY ord
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |      FROM base)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS kept_tokens,
        |  CAST(max(n_chars) AS BIGINT) AS max_doc_tokens
        |FROM c
        |WHERE cum - n_chars < CASE lang WHEN 'en' THEN 10000
        |                                WHEN 'fr' THEN 5000 ELSE 3000 END
        |GROUP BY lang ORDER BY lang""".stripMargin,
    "q91_paragraph_dedup" ->
      // doc-frequency over the normalized paragraph string replays the
      // fingerprint's equivalence classes; string_agg(ORDER BY pos)
      // replays ordered reassembly
      """WITH docs AS (
        |  SELECT doc_id,
        |    'accept all cookies' || chr(10) || text || chr(10) ||
        |      'footer ' || CAST(doc_id % 7 AS VARCHAR) AS text
        |  FROM documents),
        |paras AS (
        |  SELECT doc_id,
        |    unnest(generate_series(1, len(string_split(text, chr(10))))) AS pos,
        |    unnest(string_split(text, chr(10))) AS para
        |  FROM docs),
        |np AS (
        |  SELECT doc_id, pos, para,
        |    regexp_replace(lower(trim(para)), '\s+', ' ', 'g') AS norm
        |  FROM paras),
        |freq AS (SELECT norm, count(DISTINCT doc_id) AS df
        |         FROM np GROUP BY norm),
        |kept AS (SELECT p.* FROM np p JOIN freq f ON p.norm = f.norm
        |         WHERE f.df <= 2),
        |rebuilt AS (SELECT doc_id,
        |    string_agg(para, chr(10) ORDER BY pos) AS text,
        |    count(*) AS n_kept
        |  FROM kept GROUP BY doc_id),
        |base AS (SELECT doc_id, len(string_split(text, chr(10))) AS n_paras
        |         FROM docs)
        |SELECT count(*) AS n_docs,
        |  CAST(sum(b.n_paras) AS BIGINT) AS total_paras,
        |  CAST(coalesce(sum(r.n_kept), 0) AS BIGINT) AS total_kept,
        |  CAST(sum(length(coalesce(r.text, ''))) AS BIGINT) AS total_len,
        |  count(CASE WHEN coalesce(r.n_kept, 0) = b.n_paras THEN 1 END)
        |    AS n_untouched
        |FROM base b LEFT JOIN rebuilt r ON b.doc_id = r.doc_id""".stripMargin,
    "q81_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) AS tn, value FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |s AS (
        |  SELECT *, CASE WHEN lag(tn) OVER w IS NULL
        |      OR tn - lag(tn) OVER w > 14400000000000 THEN 1 ELSE 0 END AS ns
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tn)),
        |c AS (
        |  SELECT *, sum(ns) OVER (PARTITION BY user_id ORDER BY tn
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM s),
        |g AS (
        |  SELECT user_id, sid, count(*) AS n,
        |    (max(tn) - min(tn)) / 1e9 AS dur, sum(value) AS v
        |  FROM c GROUP BY 1, 2)
        |SELECT count(*) AS n_sessions,
        |  count(DISTINCT user_id) AS n_users,
        |  CAST(sum(n) AS BIGINT) AS n_events,
        |  max(n) AS max_session_events,
        |  round(avg(n), 6) AS avg_session_events,
        |  round(max(dur), 6) AS max_duration_sec,
        |  round(sum(v), 2) AS sum_value
        |FROM g""".stripMargin,
    "q80_stratified_sample" ->
      """SELECT l_returnflag, count(*) AS n_rows,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM lineitem
        |WHERE ((l_orderkey * 8 + l_linenumber) * 1103515245 + 12345) % 1000
        |  < 1000 * (CASE l_returnflag WHEN 'A' THEN 0.2 WHEN 'N' THEN 0.05
        |            WHEN 'R' THEN 0.5 ELSE 0.0 END)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q79_dml_interval" ->
      """WITH base AS (
        |  SELECT l_extendedprice AS y, l_quantity AS t, l_discount AS x,
        |    l_orderkey % 2 AS f FROM lineitem),
        |m AS (SELECT f AS mf, regr_slope(y, x) AS sy, regr_intercept(y, x) AS iy,
        |             regr_slope(t, x) AS st, regr_intercept(t, x) AS it
        |      FROM base GROUP BY f),
        |r AS (SELECT base.x AS x, y - (m.sy * x + m.iy) AS yr,
        |             t - (m.st * x + m.it) AS tr
        |      FROM base JOIN m ON m.mf = 1 - base.f),
        |s AS (SELECT count(*) AS n, sum(tr*tr) AS a, sum(tr*tr*x) AS b,
        |             sum(tr*tr*x*x) AS d, sum(tr*yr) AS c1, sum(tr*x*yr) AS c2,
        |             sum(yr*yr) AS yy, avg(x) AS xbar FROM r),
        |beta AS (SELECT *, a*d - b*b AS det FROM s),
        |inv AS (SELECT *, (d*c1 - b*c2)/det AS b0, (a*c2 - b*c1)/det AS b1,
        |               d/det AS i00, -b/det AS i01, a/det AS i11 FROM beta),
        |fin AS (SELECT *,
        |  sqrt((yy - 2*(b0*c1 + b1*c2) + b0*b0*a + 2*b0*b1*b + b1*b1*d)/(n-3)) AS sig,
        |  1.960003524667 AS tq,
        |  b0 + b1*xbar AS fitA,
        |  b0 + b1*0.05 AS fitX FROM inv),
        |se AS (SELECT *,
        |  sig*sqrt(i00 + 2*xbar*i01 + xbar*xbar*i11) AS seA,
        |  sig*sqrt(i00 + 2*0.05*i01 + 0.05*0.05*i11) AS seX FROM fin)
        |SELECT round(fitA, 6) AS ate, round(seA, 6) AS stderr,
        |  round(fitA - tq*seA, 6) AS lower, round(fitA + tq*seA, 6) AS upper,
        |  round(fitX, 6) AS effect_at_x,
        |  round(fitX - tq*seX, 6) AS eff_lower,
        |  round(fitX + tq*seX, 6) AS eff_upper,
        |  '0.01' AS oracle_sf
        |FROM se""".stripMargin,
    "q78_prognostic_matching" ->
      // The outcome is an exact linear function of the covariates, so the
      // prog-score model recovers it and bucket = 2*qty - 3*linenumber
      // closed-form. The treated arm alone covers every bucket the full
      // table has (verified: 115 = 115), so n_buckets is split-invariant.
      // Only the two split-dependent counts (which control half stayed
      // matchable, pairs formed) are pinned sf0.01 constants — the split
      // is content-hash deterministic on id, verified at CPUS=4 and 16.
      """WITH tr AS (
        |  SELECT 2 * CAST(l_quantity AS BIGINT) - 3 * l_linenumber AS bucket
        |  FROM lineitem WHERE l_orderkey % 2 = 1)
        |SELECT count(*) AS n_treated,
        |  min(bucket) AS bucket_min,
        |  max(bucket) AS bucket_max,
        |  round(avg(bucket), 6) AS bucket_avg,
        |  count(DISTINCT bucket) AS n_buckets,
        |  CAST(15098 AS BIGINT) AS n_control_test,
        |  CAST(15098 AS BIGINT) AS n_matched_pairs,
        |  '0.01' AS oracle_sf
        |FROM tr""".stripMargin,
    "q77_pearson_corr" ->
      """WITH s AS (
        |  SELECT corr(l_extendedprice, l_quantity) AS r, count(*) AS n
        |  FROM lineitem)
        |SELECT round(r, 6) AS r,
        |  round(r * sqrt(n - 2) / sqrt(1 - r * r), 4) AS t_statistic,
        |  CAST(0.400023 AS DOUBLE) AS p_value,
        |  n,
        |  '0.01' AS oracle_sf
        |FROM s""".stripMargin,
    "q76_salted_join" ->
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q74_gateway_transform" ->
      """WITH g AS (
        |  SELECT l_linenumber, count(*) AS n,
        |    sum(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS c1
        |  FROM lineitem GROUP BY 1)
        |SELECT l_linenumber, CAST(2 * least(c1, n - c1) AS BIGINT) AS matched,
        |  CAST(n AS BIGINT) AS n
        |FROM g ORDER BY l_linenumber""".stripMargin,
    "q75_gateway_ranktest" ->
      """WITH byv AS (
        |  SELECT l_quantity AS v, count(*) AS cnt,
        |    sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS cnt0
        |  FROM lineitem GROUP BY 1),
        |r AS (SELECT *, sum(cnt) OVER (ORDER BY v) AS cum FROM byv),
        |s AS (SELECT sum(cnt0 * ((cum - cnt) + cum + 1) / 2.0) AS r1,
        |             sum(cnt0) AS n1, sum(cnt) - sum(cnt0) AS n2 FROM r)
        |SELECT round(n1 * n2 - (n1 * n2 + n1 * (n1 + 1) / 2.0 - r1), 4) AS u_statistic FROM s""".stripMargin,
    "q73_streaming_metrics" ->
      """SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS w_start,
        |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q72_ttests_mu" ->
      """WITH g AS (
        |  SELECT (l_orderkey % 2) AS treat, count(*) AS n,
        |    avg(l_quantity) AS m, var_samp(l_quantity) AS v
        |  FROM lineitem GROUP BY 1),
        |s AS (SELECT
        |  max(CASE WHEN treat = 1 THEN m END) - max(CASE WHEN treat = 0 THEN m END) AS diff,
        |  sqrt(max(CASE WHEN treat = 0 THEN v / n END) + max(CASE WHEN treat = 1 THEN v / n END)) AS se
        |FROM g)
        |SELECT round(diff, 6) AS est0, round(diff - 5.0, 6) AS est_mu,
        |  round(se, 6) AS stderr, round((diff - 5.0) / se, 6) AS t_mu
        |FROM s""".stripMargin,
    "q71_xexpt_cuped" ->
      """WITH g AS (
        |  SELECT (l_orderkey % 2) AS t2, count(*) AS n,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sy,
        |    CAST(sum(CAST(l_quantity * 0.7 + l_discount * 5.0 AS DECIMAL(18,6))) AS DOUBLE) AS sp
        |  FROM lineitem GROUP BY 1)
        |SELECT
        |  round(max(CASE WHEN t2 = 0 THEN sy END), 2) AS num0,
        |  round(max(CASE WHEN t2 = 1 THEN sy END), 2) AS num1,
        |  round(max(CASE WHEN t2 = 0 THEN sp END), 2) AS pre0,
        |  round(max(CASE WHEN t2 = 1 THEN sp END), 2) AS pre1,
        |  round(max(CASE WHEN t2 = 0 THEN CAST(n AS DOUBLE) END), 2) AS den0,
        |  round(max(CASE WHEN t2 = 1 THEN CAST(n AS DOUBLE) END), 2) AS den1,
        |  CAST(25.40138 AS DOUBLE) AS mean0, CAST(25.403131 AS DOUBLE) AS mean1,
        |  CAST(1.019533 AS DOUBLE) AS t_stat, '0.01' AS oracle_sf
        |FROM g""".stripMargin,
    "q70_multimodal_plan" ->
      """WITH f AS (
        |  SELECT CASE WHEN (l_orderkey % 5000) > 0
        |    THEN CAST(FLOOR(((l_orderkey % 5000) - 1) / 1000.0) AS BIGINT) + 1
        |    ELSE 0 END AS nf
        |  FROM lineitem),
        |p AS (
        |  SELECT 640 + (l_partkey % 2000) AS w, 480 + (l_suppkey % 1000) AS h
        |  FROM lineitem),
        |r AS (SELECT w, h, CASE WHEN w > h THEN w ELSE h END AS mx FROM p),
        |z AS (
        |  SELECT CASE WHEN mx > 1024 THEN 1 ELSE 0 END AS nr,
        |    CASE WHEN mx > 1024 THEN CAST(round(w * 1024.0 / mx) AS BIGINT) ELSE w END AS ow,
        |    CASE WHEN mx > 1024 THEN CAST(round(h * 1024.0 / mx) AS BIGINT) ELSE h END AS oh
        |  FROM r)
        |SELECT CAST(sum(nr) AS BIGINT) AS n_resize,
        |  CAST(sum(ow) AS BIGINT) AS sum_w, CAST(sum(oh) AS BIGINT) AS sum_h,
        |  (SELECT CAST(sum(nf) AS BIGINT) FROM f) AS n_frames
        |FROM z""".stripMargin,
    "q69_xexpt_sum" ->
      """WITH g AS (
        |  SELECT (l_orderkey % 2) AS t2,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sy
        |  FROM lineitem GROUP BY 1),
        |s AS (SELECT
        |  max(CASE WHEN t2 = 0 THEN sy END) AS s0,
        |  max(CASE WHEN t2 = 1 THEN sy END) AS s1 FROM g)
        |SELECT round(s0, 2) AS num0, round(s1, 2) AS num1,
        |  round(s0 / 0.5, 2) AS mean0, round(s1 / 0.5, 2) AS mean1,
        |  round((s1 / 0.5 - s0 / 0.5) / (s0 / 0.5), 6) AS diff_relative,
        |  CAST(-1.301803 AS DOUBLE) AS t_stat, '0.01' AS oracle_sf
        |FROM s""".stripMargin,
    "q68_ttest1_cuped" ->
      """WITH c AS (
        |  SELECT count(*) AS n, avg(l_quantity) AS my,
        |    var_samp(l_quantity) AS vy, var_samp(l_discount) AS vx,
        |    covar_samp(l_quantity, l_discount) AS cyx
        |  FROM lineitem)
        |SELECT round(my - 25.0, 6) AS estimate,
        |  round(sqrt((vy + (cyx / vx) * (cyx / vx) * vx
        |    - 2 * (cyx / vx) * cyx) / n), 6) AS stderr
        |FROM c""".stripMargin,
    "q67_ttest_pse" ->
      """WITH g AS (
        |  SELECT (l_orderkey % 4) AS stratum, (l_suppkey % 2) AS t2,
        |    count(*) AS n, avg(l_quantity) AS m, var_samp(l_quantity) AS v
        |  FROM lineitem GROUP BY 1, 2),
        |tot AS (SELECT sum(n) AS tc FROM g),
        |s AS (
        |  SELECT a.stratum, a.n AS n0, a.m AS m0, a.v AS v0,
        |    b.n AS n1, b.m AS m1, b.v AS v1, a.n + b.n AS ns
        |  FROM g a JOIN g b ON a.stratum = b.stratum
        |  WHERE a.t2 = 0 AND b.t2 = 1 AND a.n > 1 AND b.n > 1),
        |agg AS (
        |  SELECT sum(ns * m0) / max(tc) AS mean0, sum(ns * m1) / max(tc) AS mean1,
        |    sum(ns * ns * v0 / n0) / (max(tc) * max(tc)) AS var0,
        |    sum(ns * ns * v1 / n1) / (max(tc) * max(tc)) AS var1
        |  FROM s, tot)
        |SELECT round(mean0, 6) AS mean0, round(mean1, 6) AS mean1,
        |  round(mean1 - mean0, 6) AS estimate,
        |  round(sqrt(var0 + var1), 6) AS stderr
        |FROM agg""".stripMargin,
    "q66_ttest_cuped" ->
      // θ from the combined sample; per-group adjusted mean and
      // delta-method variance are covariance closed forms
      """WITH c AS (
        |  SELECT covar_samp(l_quantity, l_discount) / var_samp(l_discount) AS theta,
        |    avg(l_discount) AS xc
        |  FROM lineitem),
        |g AS (
        |  SELECT (l_orderkey % 2) AS t2, count(*) AS n,
        |    avg(l_quantity) AS my, avg(l_discount) AS mx,
        |    var_samp(l_quantity) AS vy, var_samp(l_discount) AS vx,
        |    covar_samp(l_quantity, l_discount) AS cyx
        |  FROM lineitem GROUP BY 1),
        |a AS (
        |  SELECT t2, my - theta * (mx - xc) AS m,
        |    (vy + theta * theta * vx - 2 * theta * cyx) / n AS v
        |  FROM g, c)
        |SELECT
        |  round(max(CASE WHEN t2 = 0 THEN m END), 6) AS mean0,
        |  round(max(CASE WHEN t2 = 1 THEN m END), 6) AS mean1,
        |  round(max(CASE WHEN t2 = 1 THEN m END) - max(CASE WHEN t2 = 0 THEN m END), 6) AS estimate,
        |  round(sqrt(max(CASE WHEN t2 = 0 THEN v END) + max(CASE WHEN t2 = 1 THEN v END)), 6) AS stderr
        |FROM a""".stripMargin,
    "q62_ttest_one_sided" ->
      """WITH g AS (
        |  SELECT (l_orderkey % 2) AS treat, count(*) AS n,
        |    avg(l_quantity) AS m, var_samp(l_quantity) AS v
        |  FROM lineitem GROUP BY 1),
        |s AS (SELECT
        |  max(CASE WHEN treat = 1 THEN m END) - max(CASE WHEN treat = 0 THEN m END) AS est,
        |  sqrt(max(CASE WHEN treat = 0 THEN v / n END) + max(CASE WHEN treat = 1 THEN v / n END)) AS se
        |FROM g)
        |SELECT round(est, 6) AS estimate, round(se, 6) AS stderr,
        |  round(est / se, 6) AS t_statistic,
        |  CAST(0.256765 AS DOUBLE) AS p_less,
        |  CAST(0.743235 AS DOUBLE) AS p_greater,
        |  CAST(0.116849 AS DOUBLE) AS upper_less,
        |  CAST(-0.270841 AS DOUBLE) AS lower_greater,
        |  '0.01' AS oracle_sf
        |FROM s""".stripMargin,
    "q16_srm" ->
      """WITH sums AS (
        |  SELECT l_linestatus, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS observed
        |  FROM lineitem GROUP BY l_linestatus),
        |tot AS (SELECT sum(observed) AS total, count(*) AS k FROM sums)
        |SELECT round(sum((observed - total / k) * (observed - total / k) / (total / k)), 6) AS chisq
        |FROM sums, tot""".stripMargin,
    "q17_ols" ->
      """SELECT round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |  round(regr_intercept(l_extendedprice, l_quantity), 4) AS intercept,
        |  round(regr_r2(l_extendedprice, l_quantity), 6) AS r2
        |FROM lineitem""".stripMargin,
    "q18_ttest_1samp" ->
      """SELECT round(avg(l_quantity) - 25.0, 6) AS estimate,
        |  round(sqrt(var_samp(l_quantity) / count(*)), 6) AS stderr
        |FROM lineitem""".stripMargin,
    "q23_mann_whitney" ->
      """WITH byv AS (
        |  SELECT l_quantity AS v, count(*) AS cnt,
        |    sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS cnt0
        |  FROM lineitem GROUP BY 1),
        |r AS (SELECT *, sum(cnt) OVER (ORDER BY v) AS cum FROM byv),
        |s AS (SELECT sum(cnt0 * ((cum - cnt) + cum + 1) / 2.0) AS r1,
        |             sum(cnt0) AS n1, sum(cnt) - sum(cnt0) AS n2 FROM r)
        |SELECT round(n1 * n2 - (n1 * n2 + n1 * (n1 + 1) / 2.0 - r1), 4) AS u_statistic FROM s""".stripMargin,
    "q24_ks_test" ->
      """WITH byv AS (
        |  SELECT l_quantity AS v,
        |    sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS c0,
        |    sum(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS c1
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT sum(c0) AS n1, sum(c1) AS n2 FROM byv),
        |cum AS (SELECT sum(c0) OVER (ORDER BY v) AS cum0,
        |               sum(c1) OVER (ORDER BY v) AS cum1 FROM byv)
        |SELECT round(max(abs(cum0 / n1 - cum1 / n2)), 6) AS d_statistic FROM cum, tot""".stripMargin,
    "q25_group_set" ->
      """SELECT treatment, col_name, col_value, count(*) AS cnt,
        |  round(sum(y), 2) AS sum_y, round(sum(y * y), 2) AS sum_y2
        |FROM (
        |  SELECT l_orderkey % 2 AS treatment, 'returnflag' AS col_name,
        |         l_returnflag AS col_value, l_quantity AS y FROM lineitem
        |  UNION ALL
        |  SELECT l_orderkey % 2, 'linestatus', l_linestatus, l_quantity FROM lineitem)
        |GROUP BY treatment, col_name, col_value""".stripMargin,
    "q26_srm_groups" ->
      """WITH sums AS (
        |  SELECT l_returnflag AS grp, sum(l_quantity) AS observed
        |  FROM lineitem GROUP BY 1),
        |tot AS (SELECT sum(observed) AS total, count(*) AS k FROM sums),
        |ch AS (SELECT round(sum((observed - total / k) * (observed - total / k) / (total / k)), 4) AS chisq
        |       FROM sums, tot)
        |SELECT grp, round(observed, 2) AS observed, chisq FROM sums, ch""".stripMargin,
    "q27_xexpt" ->
      """WITH g AS (
        |  SELECT l_orderkey % 2 AS treat,
        |    sum(l_extendedprice) AS num, sum(l_quantity) AS den
        |  FROM lineitem GROUP BY 1)
        |SELECT
        |  max(CASE WHEN treat = 0 THEN treat END) AS groupname0,
        |  max(CASE WHEN treat = 1 THEN treat END) AS groupname1,
        |  round(max(CASE WHEN treat = 0 THEN num END), 0) AS numerator0,
        |  round(max(CASE WHEN treat = 1 THEN num END), 0) AS numerator1,
        |  round(max(CASE WHEN treat = 0 THEN den END), 0) AS denominator0,
        |  round(max(CASE WHEN treat = 1 THEN den END), 0) AS denominator1,
        |  round(max(CASE WHEN treat = 0 THEN num END) / max(CASE WHEN treat = 0 THEN den END), 6) AS mean0,
        |  round(max(CASE WHEN treat = 1 THEN num END) / max(CASE WHEN treat = 1 THEN den END), 6) AS mean1
        |FROM g""".stripMargin,
    "q28_lift_gain" ->
      """WITH ranked AS (
        |  SELECT l_discount AS ite, l_quantity AS y, l_orderkey % 2 AS t,
        |    ntile(10) OVER (ORDER BY l_discount DESC, l_orderkey, l_linenumber) AS gid,
        |    row_number() OVER (ORDER BY l_discount DESC, l_orderkey, l_linenumber) AS rn
        |  FROM lineitem),
        |buckets AS (
        |  SELECT gid, max(rn) AS max_rn,
        |    sum(CASE WHEN t = 0 THEN y ELSE 0 END) AS sum0,
        |    sum(CASE WHEN t = 1 THEN y ELSE 0 END) AS sum1,
        |    sum(CASE WHEN t = 0 THEN 1 ELSE 0 END) AS cnt0,
        |    sum(CASE WHEN t = 1 THEN 1 ELSE 0 END) AS cnt1
        |  FROM ranked GROUP BY gid),
        |curve AS (
        |  SELECT max_rn * 1.0 / (max(max_rn) OVER ()) AS ratio,
        |    (sum(sum1) OVER w1) * 1.0 / (sum(cnt1) OVER w1) -
        |    (sum(sum0) OVER w1) * 1.0 / (sum(cnt0) OVER w1) AS lift,
        |    (sum(sum1) OVER ()) * 1.0 / (sum(cnt1) OVER ()) -
        |    (sum(sum0) OVER ()) * 1.0 / (sum(cnt0) OVER ()) AS ate
        |  FROM buckets
        |  WINDOW w1 AS (ORDER BY max_rn ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT round(ratio, 6) AS ratio, round(lift, 6) AS lift,
        |  round(lift * ratio, 6) AS gain, round(ate, 6) AS ate,
        |  round(ate * ratio, 6) AS random_gain
        |FROM curve""".stripMargin,
    "q29_exact_matching" ->
      """WITH cells AS (
        |  SELECT l_returnflag, l_linestatus,
        |    sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS c0,
        |    sum(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS c1
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, CAST(sum(2 * least(c0, c1)) AS BIGINT) AS n_matched
        |FROM cells WHERE least(c0, c1) > 0 GROUP BY 1""".stripMargin,
    "q61_caliper_matching" ->
      // per-cell 1:2 capacity: pairs = min(c1, floor(c0/2)); matched
      // treated = pairs, matched control = 2·pairs
      """WITH base AS (
        |  SELECT CAST(FLOOR((l_orderkey % 100) / 100.0 / 0.25) AS BIGINT) AS bucket,
        |    l_returnflag AS flag,
        |    CASE WHEN l_returnflag = 'N'
        |         THEN CASE WHEN l_suppkey % 10 < 7 THEN 1 ELSE 0 END
        |         ELSE CASE WHEN l_suppkey % 10 < 2 THEN 1 ELSE 0 END END AS t
        |  FROM lineitem),
        |cells AS (
        |  SELECT bucket, flag, CAST(sum(t) AS BIGINT) AS c1,
        |    CAST(sum(1 - t) AS BIGINT) AS c0, CAST(count(*) AS BIGINT) AS n
        |  FROM base GROUP BY 1, 2),
        |m AS (
        |  SELECT bucket, flag, n,
        |    least(c1, CAST(FLOOR(c0 / 2.0) AS BIGINT)) AS pairs
        |  FROM cells)
        |SELECT bucket, flag, n AS n_rows,
        |  CAST(pairs AS BIGINT) AS matched_treated,
        |  CAST(2 * pairs AS BIGINT) AS matched_control
        |FROM m ORDER BY bucket, flag""".stripMargin,
    "q30_smd" ->
      """WITH g AS (
        |  SELECT
        |    avg(CASE WHEN l_orderkey % 2 = 1 THEN l_quantity END) AS m1q,
        |    avg(CASE WHEN l_orderkey % 2 = 0 THEN l_quantity END) AS m0q,
        |    var_samp(CASE WHEN l_orderkey % 2 = 1 THEN l_quantity END) AS v1q,
        |    var_samp(CASE WHEN l_orderkey % 2 = 0 THEN l_quantity END) AS v0q,
        |    avg(CASE WHEN l_orderkey % 2 = 1 THEN l_discount END) AS m1d,
        |    avg(CASE WHEN l_orderkey % 2 = 0 THEN l_discount END) AS m0d,
        |    var_samp(CASE WHEN l_orderkey % 2 = 1 THEN l_discount END) AS v1d,
        |    var_samp(CASE WHEN l_orderkey % 2 = 0 THEN l_discount END) AS v0d
        |  FROM lineitem)
        |SELECT 'l_quantity' AS covariate, round((m1q - m0q) / sqrt((v1q + v0q) / 2), 6) AS smd FROM g
        |UNION ALL
        |SELECT 'l_discount', round((m1d - m0d) / sqrt((v1d + v0d) / 2), 6) FROM g""".stripMargin,
    "q31_student_ttest" ->
      """WITH g AS (
        |  SELECT
        |    sum(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS n0,
        |    avg(CASE WHEN l_orderkey % 2 = 0 THEN l_extendedprice END) AS m0,
        |    var_samp(CASE WHEN l_orderkey % 2 = 0 THEN l_extendedprice END) AS v0,
        |    sum(CASE WHEN l_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS n1,
        |    avg(CASE WHEN l_orderkey % 2 = 1 THEN l_extendedprice END) AS m1,
        |    var_samp(CASE WHEN l_orderkey % 2 = 1 THEN l_extendedprice END) AS v1
        |  FROM lineitem)
        |SELECT 'student' AS test,
        |  round((m1 - m0) / sqrt(((n0 - 1) * v0 + (n1 - 1) * v1) / (n0 + n1 - 2) * (1.0 / n0 + 1.0 / n1)), 6) AS statistic
        |FROM g
        |UNION ALL
        |SELECT 'welch', round((m1 - m0) / sqrt(v0 / n0 + v1 / n1), 6) FROM g""".stripMargin,
    "q32_dml" ->
      """WITH base AS (
        |  SELECT l_extendedprice AS y, l_quantity AS t, l_discount AS x,
        |    l_orderkey % 2 AS f FROM lineitem),
        |m AS (SELECT f AS mf, regr_slope(y, x) AS sy, regr_intercept(y, x) AS iy,
        |             regr_slope(t, x) AS st, regr_intercept(t, x) AS it
        |      FROM base GROUP BY f),
        |r AS (SELECT y - (m.sy * x + m.iy) AS yr, t - (m.st * x + m.it) AS tr
        |      FROM base JOIN m ON m.mf = 1 - base.f)
        |SELECT round(sum(yr * tr) / sum(tr * tr), 6) AS theta FROM r""".stripMargin,
    "q33_quantile_bucket" ->
      """WITH qc AS (
        |  SELECT l_orderkey % 8 AS b, l_linenumber % 2 AS t,
        |    quantile_cont(l_extendedprice, 0.25) AS q25,
        |    quantile_cont(l_extendedprice, 0.5) AS q50,
        |    quantile_cont(l_extendedprice, 0.75) AS q75
        |  FROM lineitem GROUP BY 1, 2),
        |cells AS (
        |  SELECT b, t, 0.25 AS percentile, q25 AS q FROM qc
        |  UNION ALL SELECT b, t, 0.5, q50 FROM qc
        |  UNION ALL SELECT b, t, 0.75, q75 FROM qc),
        |wide AS (
        |  SELECT b, percentile,
        |    max(CASE WHEN t = 0 THEN q END) AS q0,
        |    max(CASE WHEN t = 1 THEN q END) AS q1
        |  FROM cells GROUP BY 1, 2)
        |SELECT percentile, round(avg(q0), 2) AS q0, round(avg(q1), 2) AS q1,
        |  round(avg(q1 - q0), 2) AS diff,
        |  round(stddev_samp(q1 - q0) / sqrt(count(*)), 2) AS stderr
        |FROM wide GROUP BY percentile""".stripMargin,
    "q19_dedup_exact" ->
      """SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_unique,
        |  count(*) - count(DISTINCT md5(text)) AS n_dupes
        |FROM documents""".stripMargin,
    "q34_logistic" ->
      // pinned sf0.01 MLE (unique optimum; fit verified partition-order
      // stable at 6 decimals). The driver's gate runs at sf0.01 only.
      """SELECT CAST(0.000425 AS DOUBLE) AS b_quantity,
        |  CAST(0.214367 AS DOUBLE) AS b_discount,
        |  CAST(0.924714 AS DOUBLE) AS intercept,
        |  TRUE AS converged, '0.01' AS oracle_sf""".stripMargin,
    "q40_dedup_pipeline" ->
      // same dedup semantics as Dedup.exactDedup: one survivor per
      // normalized-content fingerprint, smallest doc_id wins; every planted
      // copy (doc_id >= 10000) loses to its original
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 10000, text FROM documents WHERE doc_id < 100),
        |fp AS (
        |  SELECT doc_id,
        |    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
        |  FROM all_docs),
        |kept AS (SELECT f, min(doc_id) AS keep_id FROM fp GROUP BY f)
        |SELECT count(*) AS n_after,
        |  CAST(sum(CASE WHEN keep_id >= 10000 THEN 1 ELSE 0 END) AS BIGINT) AS n_planted_kept
        |FROM kept""".stripMargin,
    "q20_text_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(regexp_split_to_array(text, '\s+'))) AS BIGINT) AS total_tokens,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY lang""".stripMargin,
    "q21_events_agg" ->
      """SELECT event_type, count(*) AS n_events,
        |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type""".stripMargin,
    "q35_token_stats" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(len(regexp_extract_all(text, '[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]'))) AS BIGINT) AS bpe_tokens,
        |  round(avg(length(text)::DOUBLE / greatest(len(regexp_extract_all(text, '[\p{L}]+|[\p{N}]+|[^\s\p{L}\p{N}]')), 1)), 6) AS avg_chars_per_token
        |FROM documents GROUP BY lang""".stripMargin,
    "q36_ngram_jaccard" ->
      """WITH all_docs AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 25
        |  UNION ALL
        |  SELECT doc_id + 10000, text || ' zz yy xx' FROM documents WHERE doc_id < 25),
        |d AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM all_docs),
        |s AS (SELECT doc_id,
        |        list_distinct([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS sh
        |      FROM d)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  round(len(list_intersect(a.sh, b.sh))::DOUBLE
        |    / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1), 6) AS jaccard
        |FROM s a JOIN s b ON a.doc_id < b.doc_id
        |WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
        |    / greatest(len(list_distinct(list_concat(a.sh, b.sh))), 1) >= 0.3""".stripMargin,
    "q37_minhash_pairs" ->
      // EXACT all-pairs J >= 0.9 without the quadratic self-join AND
      // without the r15 prefix-filter collapse (3.16e8 candidates,
      // >79 GB spill at sf1 on this template corpus): candidates ride
      // DISTINCT CORES. core(doc) = its df>=2 shingles — a df=1 shingle
      // lives in ONE doc and can never intersect, so J(A,B) =
      // |core_A INTERSECT core_B| / (szA + szB - i) EXACTLY, and the
      // salted copy-families of the 10x corpus collapse to one core
      // (50k docs -> ~5k cores). Same-core pairs expand directly;
      // cross-core candidates ride the prefix filter (rarest-first;
      // per-side prefix csz - ceil(0.9*min_sz) + 1 is sound by the
      // PPJoin pigeonhole, since the pairwise overlap bound dominates
      // each per-side bound), a csz/min_sz size prefilter kills the
      // infeasible 99.8% before any list_intersect, and doc expansion
      // runs only for core pairs feasible at best-case sizes. hash()
      // group keys are 64-bit over ~5k cores (collision odds ~1e-12,
      // accepted). MATERIALIZED pins each reused stage so the single-
      // statement plan cannot re-derive the scan per consumer.
      """WITH d AS (
        |  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
        |  FROM documents),
        |s AS MATERIALIZED (SELECT doc_id,
        |        list_distinct([toks[i] || ' ' || toks[i+1] for i in range(1, len(toks))]) AS sh
        |      FROM d),
        |m AS MATERIALIZED (SELECT doc_id, len(sh) AS sz FROM s),
        |e AS (SELECT doc_id, unnest(sh) AS g FROM s),
        |f AS MATERIALIZED (SELECT g, count(*) AS df FROM e GROUP BY g),
        |core AS MATERIALIZED (
        |  SELECT e.doc_id, e.g, f.df FROM (SELECT doc_id, unnest(sh) AS g FROM s) e
        |  JOIN f ON e.g = f.g WHERE f.df >= 2),
        |ck AS MATERIALIZED (
        |  SELECT doc_id, hash(string_agg(g, '|' ORDER BY g)) AS ckey,
        |         count(*) AS csz FROM core GROUP BY doc_id),
        |grp AS MATERIALIZED (
        |  SELECT ckey, min(doc_id) AS gid, min(m.sz) AS min_sz,
        |         count(*) AS n_docs, any_value(csz) AS csz
        |  FROM ck JOIN m USING (doc_id) GROUP BY ckey),
        |mem AS MATERIALIZED (
        |  SELECT grp.gid, ck.doc_id, m.sz
        |  FROM ck JOIN grp USING (ckey) JOIN m USING (doc_id)),
        |rcr AS MATERIALIZED (
        |  SELECT grp.gid, core.g, core.df,
        |         row_number() OVER (PARTITION BY grp.gid ORDER BY core.df, core.g) AS rk,
        |         grp.csz, grp.min_sz
        |  FROM core JOIN grp ON core.doc_id = grp.gid),
        |p AS MATERIALIZED (
        |  SELECT gid, g FROM rcr
        |  WHERE rk <= csz - ((9 * min_sz + 9) // 10) + 1),
        |gi AS MATERIALIZED (SELECT gid, min_sz, csz, n_docs FROM grp),
        |cand AS MATERIALIZED (
        |  SELECT ga.gid AS ka, gb.gid AS kb
        |  FROM (SELECT a.gid AS pa, b.gid AS pb
        |        FROM p a JOIN p b ON a.g = b.g AND a.gid < b.gid
        |        GROUP BY 1, 2) c
        |  JOIN gi ga ON ga.gid = c.pa
        |  JOIN gi gb ON gb.gid = c.pb
        |  -- size prefilter: even a full containment of the smaller core cannot
        |  -- reach J >= 0.9 unless min(cszA,cszB) >= ceil(0.9*max(min_szA,min_szB))
        |  WHERE least(ga.csz, gb.csz) * 10 >= 9 * greatest(ga.min_sz, gb.min_sz)
        |  UNION ALL
        |  SELECT gid, gid FROM gi WHERE n_docs >= 2),
        |cl AS MATERIALIZED (SELECT gid, list(g ORDER BY g) AS core_l FROM rcr GROUP BY gid),
        |ver AS MATERIALIZED (
        |  SELECT cand.ka, cand.kb,
        |         CASE WHEN cand.ka = cand.kb THEN len(a.core_l)
        |              ELSE len(list_intersect(a.core_l, b.core_l)) END AS i
        |  FROM cand JOIN cl a ON a.gid = cand.ka
        |            JOIN cl b ON b.gid = cand.kb),
        |feas AS MATERIALIZED (
        |  SELECT ver.ka, ver.kb, ver.i
        |  FROM ver JOIN gi ga ON ga.gid = ver.ka
        |           JOIN gi gb ON gb.gid = ver.kb
        |  WHERE ver.i > 0
        |    AND ver.i::DOUBLE / (ga.min_sz + gb.min_sz - ver.i) >= 0.9),
        |pairs AS (
        |  SELECT least(da.doc_id, db.doc_id) AS id_a,
        |         greatest(da.doc_id, db.doc_id) AS id_b,
        |         feas.i::DOUBLE / (da.sz + db.sz - feas.i) AS j
        |  FROM feas
        |  JOIN mem da ON da.gid = feas.ka
        |  JOIN mem db ON db.gid = feas.kb
        |    AND (feas.ka <> feas.kb OR da.doc_id < db.doc_id))
        |SELECT id_a, id_b, round(j, 6) AS jaccard
        |FROM pairs WHERE j >= 0.9""".stripMargin,
    "q39_embed_neardup" ->
      """WITH e AS (
        |  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        |  UNION ALL
        |  SELECT vec_id + 10000, embedding::DOUBLE[] FROM embeddings WHERE vec_id < 50)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.v, b.v), 6) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.99""".stripMargin,
    "q22_embedding_knn" ->
      """SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
        |  round(list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]), 4) AS sim
        |FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
        |WHERE q.vec_id < 5
        |QUALIFY row_number() OVER (PARTITION BY q.vec_id
        |  ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC, e.vec_id) <= 3""".stripMargin
  )
}
