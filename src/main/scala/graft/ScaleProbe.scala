package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the BASELINE.md "parity spirit" target: single-pass
  * aggregates (OLS / t-test family) over 100M generated rows on local[*].
  * Not part of the driver bench — run manually:
  * `SPARK_GRAFT_PROBE_ROWS=100000000 sbt "runMain graft.ScaleProbe"`.
  *
  * Besides the PROBE lines, writes every timing to a JSON artifact
  * (SPARK_GRAFT_PROBE_OUT, default `probe.json` in the working dir) so a
  * scale regression shows up as a diff instead of needing a manual
  * compare against the README table. */
object ScaleProbe {
  /** Synthetic production-scale BPE vocabulary, well-formed BY
    * CONSTRUCTION and fully reachable in lowercase text: ranks 0..675 are
    * every lowercase byte 2-gram (row-major), ranks 676.. are every
    * (2-gram, 2-gram) 4-gram composition over the first `span` 2-grams —
    * 676 + span² merges (33,076 at span = 180). Outputs are unique: a
    * 4-letter string has exactly one 2+2 split. Shared by the 33k-merge
    * probe entry and Round15OpsSpec (which pins hand-derivable counts
    * and the big-codec == sub-codec equivalence on restricted text). */
  private[graft] def syntheticMerges(span: Int = 180): Seq[(String, String)] = {
    val alpha = ('a' to 'z').map(_.toString)
    val g2 = for (l <- alpha; r <- alpha) yield (l, r)
    val firstTokens = g2.take(span).map { case (l, r) => l + r }
    val g4 = for (x <- firstTokens; y <- firstTokens) yield (x, y)
    g2 ++ g4
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROWS", "100000000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_PROBE_OUT", "probe.json")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic synthetic: y = 2 x1 - x2 + 0.5 x3 + noise-ish hash term
    val df = spark.range(rows).select(
      col("id"),
      (pmod(xxhash64(col("id"), lit(1)), lit(1000L)).cast("double") / 500.0 - 1.0).as("x1"),
      (pmod(xxhash64(col("id"), lit(2)), lit(1000L)).cast("double") / 500.0 - 1.0).as("x2"),
      (pmod(xxhash64(col("id"), lit(3)), lit(1000L)).cast("double") / 500.0 - 1.0).as("x3"),
      (col("id") % 2).cast("int").as("t"))
      .withColumn("y", col("x1") * 2.0 - col("x2") + col("x3") * 0.5 +
        (pmod(xxhash64(col("id"), lit(4)), lit(1000L)).cast("double") / 1000.0))

    // Interleaved multi-pass, per-label min — the same protocol Bench uses
    // and for the same reason: single samples on this box class confuse
    // transient load with regressions (one run measured OLS at 14.2 s and
    // the immediate re-run 3.5 s; another put the forest at 82.6 s vs 53 s).
    // Back-to-back repeats of one probe are load-correlated; interleaving
    // the whole suite between samples decorrelates them. The CPU-bound
    // sentinel (Bench.scala's calibration job) brackets each pass so a
    // reader can judge artifact health without re-running.
    val timings =
      scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.ArrayBuffer[Double]]
    // optional label filter: `runMain graft.ScaleProbe cox minhash` runs
    // only entries whose label contains one of the substrings (plus the
    // warmup) — the single-entry iteration loop while tuning an operator
    val only = args.toSeq
    def time(label: String)(f: => Unit): Unit = {
      if (only.nonEmpty && label != "warmup count" &&
          !only.exists(label.contains)) return
      val t0 = System.nanoTime(); f
      val sec = (System.nanoTime() - t0) / 1e9
      timings.getOrElseUpdate(label,
        scala.collection.mutable.ArrayBuffer.empty[Double]) += math.round(sec * 100.0) / 100.0
      println(f"PROBE $label rows=$rows $sec%.2f s")
      // entry boundary: release checkpoints/caches (the Bench discipline)
      // — without it ~50 entries accumulate storage in one JVM and the
      // checkpoint-heavy entries (funnel, event_study) hard-OOM the heap
      try Ckpt.sweep(spark) catch { case _: Throwable => () }
    }
    def sentinel(): Double = {
      val s = Array.fill(5) {
        val t0 = System.nanoTime()
        spark.range(0L, 1280L * 1000 * 1000, 1, cpus.toInt)
          .selectExpr("sum(id % 7)").collect()
        (System.nanoTime() - t0) / 1e9
      }
      s.min
    }
    def suite(): Unit = {
    time("warmup count")(df.count())
    time("ols y ~ x1+x2+x3") {
      val r = df.select(functions.ols(col("y"), Seq(col("x1"), col("x2"), col("x3"))).as("m"))
        .select("m.coefficients").head()
      val c = r.getSeq[Double](0)
      assert(math.abs(c.head - 2.0) < 0.01, s"coef ${c.head}")
    }
    time("ttest_2samp y by t") {
      df.select(functions.ttest_2samp("x1", col("t"))(col("y")).as("r"))
        .select("r.p_value").head()
    }
    time("delta_method var(avg(y)/avg(x1+2))") {
      df.select(functions.delta_method("x1/x2", isStd = false,
        Seq(col("y"), col("x1") + lit(2.0))).as("v")).head()
    }
    // xexpt sum-metric at full scale: the state is a fixed 128-bucket
    // moment matrix (id hashes to a bucket inside the aggregate), so the
    // partial buffers are constant-size regardless of rows
    time(s"xexpt sum-metric ($rows rows, 128-bucket state)") {
      val r = df.select(functions.xexpt_ttest_2samp(col("id"), col("t"),
        Seq(col("y"), lit(1.0)), metricType = "sum").as("r"))
        .select("r.p_value", "r.mean0").head()
      assert(!r.getDouble(1).isNaN)
    }

    // the distributed rank/lift paths (RangeCumSum: no single-partition
    // window anywhere) on rows with ~all-distinct continuous values — the
    // shape that breaks a global Window.orderBy. Capped at 10M rows: the
    // by-value table is O(distinct), i.e. O(n) here.
    val rankRows = math.min(rows, 10000000L)
    val cont = spark.range(rankRows).select(
      (col("id") % 2).cast("int").as("t"),
      (pmod(xxhash64(col("id"), lit(9)), lit(1000000000L)).cast("double") / 1e6 +
        (col("id") % 2).cast("double") * 0.5).as("v"),
      (pmod(xxhash64(col("id"), lit(10)), lit(1000L)).cast("double") / 1000.0).as("score"))
    time(s"mann_whitney distributed ($rankRows rows, ~distinct values)") {
      val r = graft.ops.RankTests.mannWhitneyU(cont, col("v"), col("t"))
      assert(!r.u_statistic.isNaN)
    }
    time(s"ks_test distributed ($rankRows rows)") {
      val r = graft.ops.RankTests.ksTest(cont, col("v"), col("t"))
      assert(r.d_statistic > 0)
    }
    time(s"auc distributed ($rankRows rows)") {
      val a = graft.ops.MlWrappers.auc(cont, col("score"), col("t"))
      assert(!a.isNaN)
    }
    time(s"lift_gain distributed ($rankRows rows, k=100)") {
      val r = graft.ops.Uplift.liftGain(cont, col("score"), col("v"), col("t"), k = 100)
      assert(r.count() == 100)
    }
    // caliper matching at claims scale: the salted two-pass design (slice
    // table broadcast, per-slice parallel sorts) must hold when cells are
    // few and rows are many — 12 cells over 10M rows, 1:2
    time(s"caliper_matching 1:2 ($rankRows rows, 4 buckets x 3 exact)") {
      val md = spark.range(rankRows).select(
        (pmod(xxhash64(col("id"), lit(31)), lit(100L)).cast("double") / 100.0).as("score"),
        (col("id") % 3).cast("string").as("g"),
        (pmod(xxhash64(col("id"), lit(32)), lit(10L)) < 4).cast("int").as("t"))
      val m = graft.ops.Matching.caliperMatching(md, col("t"), col("score"),
        caliper = 0.25, exactCols = Seq(col("g")), k = 2)
      val matched = m.filter(col("matching_index") > 0).count()
      assert(matched > rankRows / 2, s"only $matched matched")
    }

    // causal forest at the reference's claims class ("minute-level on tens
    // of millions of rows"): level-synchronous growth over the persisted
    // exploded membership — D+1 scans, histogram-only collects
    val forestRows = math.min(rows, 10000000L)
    val fdf = spark.range(forestRows).select(
      (col("id") % 2).cast("int").as("t"),
      (pmod(xxhash64(col("id"), lit(21)), lit(1000L)).cast("double") / 500.0 - 1.0).as("f1"),
      (pmod(xxhash64(col("id"), lit(22)), lit(1000L)).cast("double") / 500.0 - 1.0).as("f2"))
      .withColumn("h", (col("f1") > 0.0).cast("double"))
      .withColumn("y", col("h") * 5.0 + col("t") * (lit(1.0) + col("h") * 4.0) +
        (pmod(xxhash64(col("t"), col("f1"), col("f2"), lit(23)), lit(1000L)).cast("double") / 1000.0))
    time(s"causal_forest fit+score ($forestRows rows, 16 trees, depth 4)") {
      val m = graft.ops.CausalForest.fit(fdf, col("y"), col("t"),
        Seq("f1" -> col("f1"), "f2" -> col("f2")),
        numTrees = 16, maxDepth = 4, minNodeSize = 1000, bins = 32)
      val seg = m.score(fdf, Seq(col("f1"), col("f2")), "eff", "se")
        .groupBy(col("h")).agg(avg(col("eff")).as("e")).collect()
        .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      assert(math.abs(seg(0.0) - 1.0) < 0.3, s"tau(h=0) ${seg(0.0)}")
      assert(math.abs(seg(1.0) - 5.0) < 0.3, s"tau(h=1) ${seg(1.0)}")
    }

    // dedup path at corpus scale: 1M synthetic ~40-word docs, 1% planted
    // near-dups. Candidate generation must stay bucket-local (no all-pairs):
    // wall-clock here is dominated by the two signature scans.
    val docRows = math.min(rows, 1000000L)
    val words = (d: org.apache.spark.sql.Column, salt: Int) =>
      transform(sequence(lit(0), lit(39)),
        i => concat(lit("w"), pmod(xxhash64(d, i, lit(salt)), lit(50000L))))
    val docs = spark.range(docRows).select(
      col("id"),
      // dup docs (id % 100 == 99) copy the word stream of id - 1
      concat_ws(" ", when(col("id") % 100 === 99, words(col("id") - 1, 7))
        .otherwise(words(col("id"), 7))).as("text"))
    time(s"minhash_lsh dedup candidates ($docRows docs)") {
      val pairs = graft.ops.Dedup.minHashLsh(docs, col("id"), col("text"),
        numHashes = 96, bands = 16, shingleN = 2, threshold = 0.9)
      val n = pairs.count()
      assert(n >= docRows / 100 * 95 / 100, s"recall too low: $n pairs")
    }
    // k must span several tokens for this 50k-token synthetic vocabulary:
    // at k=8 a fingerprint is ~one token, shared by ~160 docs → hot-bucket
    // candidate blowup. k=24 (~3 tokens) makes fingerprints discriminative.
    time(s"winnow fingerprint pairs ($docRows docs, k=24)") {
      val pairs = graft.ops.Dedup.winnowPairs(docs, col("id"), col("text"),
        k = 24, w = 8, threshold = 0.9)
      val n = pairs.count()
      assert(n >= docRows / 100 * 95 / 100, s"winnow recall too low: $n pairs")
    }
    // embedding near-dup with DEFAULT args: auto bits/tables must keep the
    // candidate set linear in n (never the O(n²) cross join) while
    // recovering the 1% planted same-direction duplicates
    val vecRows = math.min(rows, 200000L)
    val dim = 32
    val vecs = spark.range(vecRows).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        when(col("id") % 100 === 99,
          pmod(xxhash64(col("id") - 1, d, lit(13)), lit(1000L)).cast("double") / 500.0 - 1.0)
          .otherwise(
            pmod(xxhash64(col("id"), d, lit(13)), lit(1000L)).cast("double") / 500.0 - 1.0)).as("v"))
    time(s"embedding near-dup, default LSH config ($vecRows vectors)") {
      val pairs = graft.ops.Dedup.embeddingNearDup(vecs, col("id"), col("v"),
        threshold = 0.999)
      val n = pairs.count()
      assert(n >= vecRows / 100 * 90 / 100, s"near-dup recall too low: $n pairs")
      assert(n <= vecRows / 100 + vecRows / 1000, s"false-positive blowup: $n pairs")
    }
    // IVF at corpus scale: planted identical copies must be recovered as
    // top-1 neighbors (a copy shares its source's cell exactly), probing
    // 8 of 64 cells — the index is useful only if the probe-cell equi-join
    // touches ~1/8 of the corpus instead of all of it
    time(s"ivf knn ($vecRows vectors, 100 probes, 64 cells, nprobe 8)") {
      val e = vecs.select(col("id").as("vec_id"), col("v"))
      val probes = e.filter(col("vec_id") % 100 === 99 && col("vec_id") < 10000)
        .select(col("vec_id").as("pid"), col("v").as("q"))
      val idx = graft.ops.Ann.trainIvf(e, col("v"), numCells = 64,
        sampleSize = 2000, seed = 7L)
      val ivf = graft.ops.Ann.ivfKnn(e, col("vec_id"), col("v"),
        probes, col("pid"), col("q"), idx, k = 1, nprobe = 8)
      val perfect = ivf.filter(col("rk") === 1 && col("sim") > 0.999999).count()
      assert(perfect == 100, s"IVF top-1 recall: $perfect/100")
    }
    time(s"connected components (${docRows / 100} chain edges, depth 50)") {
      // 50-long duplicate chains: worst-case diameter for label propagation
      val edges = spark.range(docRows / 100)
        .select((col("id") + lit(1)).as("id_b"))
        .filter(col("id_b") % 50 =!= 0)
        .select((col("id_b") - 1).as("id_a"), col("id_b"))
      val comp = graft.ops.Dedup.connectedComponents(edges)
      // every chain collapses to its head: component count = #chains
      val heads = comp.select(col("component")).distinct().count()
      assert(heads == docRows / 100 / 50, s"$heads components")
    }
    time(s"connected components skewed (${docRows / 100} edges, one hot component = 50%)") {
      // adversarial skew: HALF the edge set attaches to one hub (a giant
      // component — the hot-key case for the per-round joins), the rest
      // are depth-50 chains. maxIter = 10 is the O(log D) round budget:
      // if convergence took more rounds, unconverged labels would break
      // the exact component count below.
      val m = docRows / 100
      val star = spark.range(m / 2)
        .select(lit(0L).as("id_a"), (col("id") + lit(1)).as("id_b"))
      val chains = spark.range(m / 2)
        .filter(col("id") % 50 =!= 49)
        .select((col("id") + lit(m)).as("id_a"), (col("id") + lit(m + 1)).as("id_b"))
      val comp = graft.ops.Dedup.connectedComponents(star.unionByName(chains),
        maxIter = 10)
      val heads = comp.select(col("component")).distinct().count()
      assert(heads == 1 + m / 2 / 50, s"$heads components")
    }
    time("caliper_matching 1:1 (1M rows, 1e5 matchable cells)") {
      // the driver prefix sum is O(cells): at the guard's intended scale
      // (well under maxCells) the whole job must cost about what the
      // few-cells shape costs per row — cell count must not dominate
      val cd = spark.range(1000000L).select(
        floor(col("id") / 2).mod(100000L).cast("double").as("score"),
        (col("id") % 2).cast("int").as("t"))
      val matched = graft.ops.Matching.caliperMatching(cd, col("t"), col("score"),
        caliper = 1.0).filter(col("matching_index") > 0).count()
      assert(matched == 1000000L, s"$matched matched")
    }
    // contamination at decontamination scale: every corpus doc scanned
    // against a broadcast probe of ~1M distinct shingles (benchmark-suite
    // size). The corpus side never shuffles shingles — the only exchange is
    // the per-doc count groupBy — so the cost is the corpus scan itself.
    val contDocs = math.min(rows, 10000000L)
    val cdocs = spark.range(contDocs).select(
      col("id"), concat_ws(" ", words(col("id"), 7)).as("text"))
    val cprobe = cdocs.filter(col("id") % 333 === 0)
    time(s"contamination scan ($contDocs docs, ~1M-shingle broadcast probe)") {
      val r = graft.ops.Dedup.contamination(cdocs, cprobe, col("text"), col("id"))
      // probe docs come from the corpus: each must read back fully contaminated
      val full = r.filter(col("contamination") >= 0.999).count()
      assert(full >= contDocs / 333, s"only $full fully-contaminated docs")
    }

    // paragraph dedup at corpus scale: 1M docs x 8 paragraphs, one global
    // banner (in every doc) + per-cohort footers (1k docs each) — the hot
    // set stays tiny while every doc loses paragraphs. The corpus-side
    // work is the broadcast flag join + ONE doc-keyed exchange.
    time(s"paragraph dedup ($docRows docs, 4 paras, planted boilerplate)") {
      val pd = spark.range(docRows).select(col("id"),
        concat_ws("\n",
          lit("global banner"),
          concat_ws(" ", words(col("id"), 61)),
          concat(lit("footer "), (col("id") % (docRows / 1000)).cast("string")),
          concat_ws(" ", words(col("id"), 62))).as("text"))
      val r = graft.ops.Dedup.paragraphDedup(pd, col("id"), col("text"),
        maxDocFreq = 2)
      val agg = r.agg(sum(col("n_paras")).cast("long"),
        sum(col("n_kept")).cast("long")).head()
      // banner + footer dropped everywhere: exactly 2 of 4 paras survive
      assert(agg.getLong(0) == 4 * docRows && agg.getLong(1) == 2 * docRows,
        s"paras ${agg.getLong(0)} kept ${agg.getLong(1)}")
    }

    // token-budget mixing at full scale: 16 strata over 100M docs, each
    // budgeted to ~1% of its token mass. Docs carry a ~128-byte payload —
    // the shape the operator exists for: the narrow threshold pass ranges
    // only (stratum, ord, tok) and the payload NEVER enters an exchange
    // (it meets only the broadcast value-cut semi join). Driver state is
    // O(partitions x strata) cells.
    time(s"token budget mix ($rows docs, 16 strata, 128B payload)") {
      val md = spark.range(rows).select(col("id"),
        concat(lit("s"), (col("id") % 16).cast("string")).as("strat"),
        (pmod(xxhash64(col("id"), lit(71)), lit(900L)) + 100L).as("ntok"),
        concat(md5(col("id").cast("string")),
          md5((col("id") + 1).cast("string")),
          md5((col("id") + 2).cast("string")),
          md5((col("id") + 3).cast("string"))).as("text"))
      val budgets = (0 until 16).map(i => s"s$i" -> rows * 55L / 16 / 100).toMap
      val kept = graft.ops.Mixing.tokenBudgetSample(md, col("strat"),
        col("ntok"), xxhash64(col("id"), lit(72)), budgets) { s2 => s2.count() }
      // ~550-token docs against a 0.55%-of-rows x 100-token budget → ~0.1%
      assert(kept > rows / 2000 && kept < rows / 500, s"kept $kept")
    }

    // weighted sampling w/o replacement at full scale: 1000 per 16 strata
    // via A-ES keys over a hash uniform — capPerGroup's narrow two-phase
    // cap, exact count contract (every stratum has ≫ 1000 rows)
    time(s"weighted_sample k=1000 x 16 strata ($rows docs)") {
      val md = spark.range(rows).select(col("id"),
        concat(lit("s"), (col("id") % 16).cast("string")).as("strat"),
        (pmod(xxhash64(col("id"), lit(81)), lit(99L)) + 1L).cast("double").as("w"),
        ((pmod(xxhash64(col("id"), lit(82)), lit(1000000L)).cast("double") + 0.5)
          / 1000000.0).as("u"))
      val kept = graft.ops.Mixing.weightedSample(md, col("strat"),
        col("w"), col("u"), k = 1000) { s2 => s2.count() }
      assert(kept == 16L * 1000, s"kept $kept")
    }

    // meta-learner uplift at full scale: the T-learner's two arm fits are
    // ONE indicator-weighted multi-OLS scan. t = id%2 is independent of the
    // planted outcome, so the recovered effect must be ~0 — a correctness
    // pin on the fused per-arm normal equations at 1e8 rows
    time(s"t_learner fused arm fits ($rows rows)") {
      val tm = graft.ops.MetaLearners.tLearner(df, col("y"), col("t"),
        Seq(col("x1"), col("x2")))
      val eff = tm.effectColumn(Seq(col("x1"), col("x2")))
      val r = df.limit(1).select(eff).head().getDouble(0)
      assert(math.abs(r) < 0.1, s"null effect drifted: $r")
    }

    // bigram-LM perplexity: train + score over ~40-word docs — counts stay
    // DataFrames, the score join shuffles by token pair, unigram table
    // broadcasts. The hash-random vocabulary makes nearly every bigram
    // distinct (worst case for the count table), so 200k docs ≈ 8M-row
    // model join — the keyed-exchange shape under test
    val lmRows = math.min(docRows, 200000L)
    val lmDocs = spark.range(lmRows).select(col("id"),
      concat_ws(" ", words(col("id"), 7)).as("text"))
    time(s"ngram_lm perplexity train+score ($lmRows docs)") {
      val m = graft.ops.NgramLm.train(lmDocs, col("text"))
      val scored = graft.ops.NgramLm.scorePerplexity(lmDocs, col("id"),
        col("text"), m)
      val r = scored.agg(avg(col("perplexity")).as("p"), count(lit(1)).as("n")).head()
      assert(r.getLong(1) == lmRows, s"scored ${r.getLong(1)} of $lmRows")
      assert(r.getDouble(0) > 1.0)
    }

    // bootstrapped qini at full scale: the replicate id explodes on a
    // 4-narrow-column frame and map-side combine collapses each partition
    // to buckets×(B+1) cells — the shuffle carries ~1.5k cells however
    // many rows go in (vs the reference's ×(B+1) full-width row blowup)
    time(s"uplift_eval qini B=50 ($rows rows, 30 buckets)") {
      val ud = df.select(col("id"),
        pmod(xxhash64(col("id"), lit(81)), lit(30L)).cast("int").as("bucket"),
        col("t"), col("y"))
      val qini = graft.ops.UpliftEval.estimateQini(ud, score = lit(null),
        target = col("y"), treatment = col("t"), nBuckets = 0,
        bootstrapB = 50, idCols = Seq(col("id")))
      val n = qini.filter(col("bucket").isNotNull).count()
      assert(n == 30, s"expected 30 curve buckets, got $n")
    }
    // ROC at full scale: K threshold comparisons per row inside ONE
    // codegen'd fold (no ARRAY-JOIN amplification), ≤K+1 shuffled cells
    time(s"roc_curve 256 thresholds ($rows rows)") {
      val roc = graft.ops.MlEval.rocCurve(df,
        (col("y") > 1.0).cast("int"), col("x1"),
        thresholds = (0 until 256).map(i => i / 128.0 - 1.0))
      val a = graft.ops.MlEval.rocAuc(roc)
      assert(a > 0.5, s"separable fixture must beat chance, auc=$a")
    }
    // correlation matrix: every pairwise r off one (k+1)² Gram pass
    time(s"corr_matrix 4 cols ($rows rows)") {
      val m = graft.ops.MlEval.corrMatrix(df, Seq("x1" -> col("x1"),
        "x2" -> col("x2"), "x3" -> col("x3"), "y" -> col("y")))
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
      assert(m(("x1", "y")) > 0.5, s"planted x1-y corr lost: ${m(("x1", "y"))}")
    }
    // trial simulator: generation is pure codegen over spark.range — one
    // pass generates AND aggregates, nothing materializes
    time(s"simulate_randomized_trial ($rows rows)") {
      val sim = graft.ops.Simulate.randomizedTrial(spark, rows, seed = 5L)
      val r = sim.groupBy(col("treatment")).agg(avg(col("outcome")).as("m"))
        .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
      assert(math.abs((r(1) - r(0)) - 0.806) < 0.02,
        s"ATE drifted: ${r(1) - r(0)}")
    }

    // as-of join under adversarial key skew: ONE key owns half of both
    // sides. The carry window is order-dependent, so AQE's skew split
    // cannot break it up (splitting a key's rows would sever the
    // last-value carry); the hot key's whole (left+right) row set sorts
    // inside a single task. This probe documents the practical cap: keep
    // per-key (left+right) rows to what one executor core can sort —
    // ~10M rows here is a few seconds; beyond that, pre-bucket the hot
    // key by coarse time range and as-of join per bucket with a
    // boundary-carry pass.
    val asofRows = math.min(rows, 10000000L)
    val hotKey = (c: org.apache.spark.sql.Column, salt: Int) =>
      when(pmod(xxhash64(c, lit(salt)), lit(2)) === 0, lit("HOT"))
        .otherwise(concat(lit("k"), pmod(xxhash64(c, lit(salt + 1)), lit(10000L))))
    val aleft = spark.range(asofRows).select(
      hotKey(col("id"), 41).as("key"),
      (col("id") * 1000L + pmod(xxhash64(col("id"), lit(43)), lit(997L))).as("ts"))
    val aright = spark.range(asofRows / 10).select(
      hotKey(col("id") + 7, 41).as("key"),
      (col("id") * 10000L).as("rts"),
      col("id").as("v"))
    time(s"asof join skewed ($asofRows left, ${asofRows / 10} right, one key = 50%)") {
      val j = graft.ops.AsofJoin.asof(aleft, aright, Seq("key"), "ts", "rts",
        payload = Seq("v"), tsUnitPerSecond = 1.0)
      assert(j.count() == asofRows) // left-outer: every left row survives
    }

    // context packing at full probe scale (100M docs, ctx=2048):
    // RangeCumSum's range-partitioned prefix sum replaces the
    // single-partition global window — the point of this probe is that
    // token_start/window assignment stays distributed at 1e8 docs.
    val pdocs = spark.range(rows).select(col("id"),
      (pmod(xxhash64(col("id"), lit(51)), lit(900L)) + 100L).as("ntok"))
    time(s"context packing ($rows docs, ctx=2048)") {
      val totalTok = pdocs.agg(sum(col("ntok"))).head().getLong(0)
      val lastW = graft.ops.Packing.contextChunks(pdocs, Seq(col("id")),
        col("ntok"), 2048) { d => d.agg(max(col("last_window"))).head().getLong(0) }
      assert(lastW == (totalTok - 1) / 2048,
        s"last window $lastW != ${(totalTok - 1) / 2048}")
    }

    // grouped Kaplan-Meier + log-rank at full scale: 100M subjects
    // collapse to |groups|x|distinct times| curve rows in the first
    // groupBy; everything after (cumsums, offsets, O/E/V) runs on that
    // tiny frame — the probe pins that the row-scale work is ONE exchange
    val survDf = df.select(
      (col("id") % 4).cast("int").as("arm2"),
      (col("id") % 2).cast("int").as("arm"),
      pmod(xxhash64(col("id"), lit(91)), lit(10000L)).cast("int").as("stime"),
      (pmod(xxhash64(col("id"), lit(92)), lit(10L)) < 7).cast("int").as("ev"))
    time(s"kaplan_meier grouped ($rows rows, 4 groups, 10k times)") {
      val km = graft.ops.Survival.kaplanMeierBy(survDf, col("arm2"),
        col("stime"), col("ev"))
      assert(km.count() == 40000L)
    }
    time(s"log_rank_test ($rows rows, 10k times)") {
      val r = graft.ops.Survival.logRankTest(survDf, col("arm"),
        col("stime"), col("ev")).head()
      // arm is independent of time/event: p must not report an effect
      assert(r.getDouble(4) > 1e-6, s"null log-rank p ${r.getDouble(4)}")
    }
    // Cox PH at full scale: each Newton iteration is ONE agg pass to 10k
    // time cells; the suffix scan + step run on the driver over the cells
    time(s"cox_ph 2 covariates ($rows rows, 10k times)") {
      val r = graft.ops.Survival.coxPh(survDf,
        col("stime"), col("ev"),
        Seq(col("arm").cast("double"),
          (pmod(xxhash64(col("arm2"), lit(7)), lit(1000L)).cast("double")
            / 1000.0)))
      assert(r.iterations < 20 && !r.coefficients(0).isNaN,
        s"cox iters ${r.iterations}")
    }

    // tf-idf at corpus scale: 1M docs x 40 hash-random words explode to
    // 40M (doc, token) pairs; df table ~50k vocabulary rows; the join
    // back is token-keyed under AQE. The top-k window re-keys by doc.
    time(s"tfidf term scores + top3 ($docRows docs)") {
      val scored = graft.ops.TfIdf.termScores(docs, col("id"), col("text"))
      val top = graft.ops.TfIdf.topTerms(scored, 3)
      assert(top.filter(col("rank") === 1).count() == docRows)
    }

    // feature_process at full scale: the stats pass is ONE agg (4 numeric
    // aggregates + a 16-category capped set), the transform pure codegen
    time(s"feature_process minmax+onehot ($rows rows)") {
      val fdf = df.select(col("id"), col("x1"), col("x2"), col("y"),
        concat(lit("c"), (col("id") % 16).cast("string")).as("cat"),
        col("t").cast("double").as("label"))
      val (out, names) = graft.ops.Features.featureProcess(fdf, "label",
        exclude = Seq("id"))
      assert(names.length == 3 + 16, names.mkString(","))
      val r = out.agg(avg(element_at(col("features"), 1))).head().getDouble(0)
      assert(r > 0.0 && r < 1.0, s"minmax mean $r")
    }

    // incremental dedup at batch-ingest scale: 1M-doc batch against a
    // 1M-doc history with 10% planted re-ingestions — the bloom sketch
    // (one distributed agg) prunes ~90% of the batch before the exact
    // anti-join
    time(s"incremental dedup ($docRows batch vs $docRows history)") {
      val hist = spark.range(docRows).select(col("id"),
        concat_ws(" ", words(col("id"), 93)).as("text"))
      val batch = spark.range(docRows).select(col("id"),
        when(col("id") % 10 === 0, concat_ws(" ", words(col("id"), 93)))
          .otherwise(concat_ws(" ", words(col("id"), 94))).as("text"))
      val nNew = graft.ops.Dedup.incrementalDedup(batch, hist,
        col("text"), col("text"), expectedHistory = docRows).count()
      assert(nNew == docRows - docRows / 10, s"new $nNew")
    }

    // AIPW at full scale: the influence term is a projection; observed +
    // 20 replicates ride one scan like the other estimators
    time(s"aipw estimator B=20 ($rows rows)") {
      val ad = df.select(col("id"), col("y"), col("t"), lit(0.5).as("e"),
        (col("x1") * 2.0).as("m1"), (col("x1") * 2.0 - 1.0).as("m0"))
      val est = graft.ops.Bootstrap.aipwEstimator(ad, col("y"), col("t"),
        col("e"), col("m1"), col("m0"), b = 20, idCols = Seq(col("id")))
      assert(!est.estimate.isNaN)
    }

    // 1-Wasserstein at the adversarial all-distinct shape: every row is
    // its own ECDF step (nothing collapses in the value groupBy), so the
    // RangeCumSum frame is row-scale — the probe pins that the cumsum
    // stays range-partitioned and the driver holds only the P boundary
    // scalars. W1 between evens and odds of 0..n is ~1 by construction.
    time(s"wasserstein all-distinct ($rows values)") {
      val wd = spark.range(rows).select(col("id").cast("double").as("v"),
        (col("id") % 2).cast("int").as("arm"))
      val w = graft.ops.RankTests.wasserstein1(wd, col("v"), col("arm"))
      assert(math.abs(w - 1.0) < 0.1, s"W1 $w")
    }

    // split-conformal at full scale: the exact k-th calibration residual
    // via the sketch-bracketed order statistic — one sketch agg, one
    // count agg, one take-ordered over a ~4n/accuracy-row slice. Never a
    // global sort, never O(n) driver rows.
    time(s"conformal_ols exact k-th residual ($rows rows)") {
      val (_, q, nCal) = graft.ops.Regression.conformalOls(df, col("y"),
        Seq(col("x1"), col("x2"), col("x3")),
        pmod(xxhash64(col("id"), lit(77)), lit(2L)) === 0, alpha = 0.1)
      assert(q > 0 && nCal > rows / 3, s"q=$q nCal=$nCal")
    }

    // snapshot diff at release-audit scale: both versions collapse to
    // (id, fp) before the ONE full-outer join — the exchange carries two
    // longs per doc at 1e8 ids. 10% turnover + 1-in-7 edits planted.
    time(s"snapshot diff ($rows ids, 10% turnover)") {
      val shift = rows / 10
      val oldV = spark.range(rows).select(col("id").as("doc_id"),
        concat(lit("t"), col("id")).as("text"))
      val newV = spark.range(shift, rows + shift).select(
        col("id").as("doc_id"),
        when(col("id") % 7 === 0, concat(lit("u"), col("id")))
          .otherwise(concat(lit("t"), col("id"))).as("text"))
      val cnt = graft.ops.Dedup.snapshotDiff(oldV, newV, col("doc_id"),
          col("doc_id"), col("text"), col("text"))
        .groupBy(col("status")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(cnt("added") == shift && cnt("removed") == shift, cnt.toString)
    }

    // feature_process with a row-scale-cardinality string column
    // mis-declared as categorical: the bounded-set aggregate saturates at
    // cap+1 strings instead of collect_set hauling 1e8 distinct values
    // into the global merge task — the stats pass must cost about what
    // the 16-category shape costs
    time(s"feature_process high-cardinality categorical ($rows rows)") {
      val fdf = df.select(col("id"), col("x1"), col("x2"), col("y"),
        concat(lit("u"), col("id")).as("user_key"),
        concat(lit("c"), (col("id") % 16).cast("string")).as("cat"),
        col("t").cast("double").as("label"))
      val (_, names) = graft.ops.Features.featureProcess(fdf, "label",
        exclude = Seq("id"))
      assert(!names.exists(_.startsWith("user_key")), names.mkString(","))
      assert(names.count(_.startsWith("cat_")) == 16, names.mkString(","))
    }

    // perplexity scoring with the shuffled (non-broadcast) unigram join —
    // the guarded escape for web-scale vocabularies; same keyed-exchange
    // shape as the bigram join
    time(s"ngram_lm score broadcastUnigrams=false ($lmRows docs)") {
      val m = graft.ops.NgramLm.train(lmDocs, col("text"))
      val scored = graft.ops.NgramLm.scorePerplexity(lmDocs, col("id"),
        col("text"), m, broadcastUnigrams = false)
      assert(scored.count() == lmRows)
    }

    // multimodal fingerprints: the cost is the real codec (imageio / PCM
    // parse) inside batched mapPartitions — embarrassingly parallel, no
    // shuffle until the tiny chunk-bucket candidate pass
    val imgRows = math.min(rows / 1000, 100000L)
    time(s"image dhash + near-dup pairs ($imgRows 64x64 PNGs)") {
      val base = spark.range(imgRows).select(col("id"),
        graft.ops.Multimodal.patternPng(pmod(col("id"), lit(imgRows / 50)),
          lit(64), lit(64), lit(0)).as("content"))
      val hashed = graft.ops.Multimodal.imageDHash(base)
      val pairs = graft.ops.Dedup.hammingPairs(hashed, col("id"),
        col("dhash"), maxHamming = 0)
      // 50 exact copies per pattern -> a LINEAR 49-edge star per pattern
      // (representative-reduced), not the old C(50,2) clique
      assert(pairs.count() == (imgRows / 50) * 49L)
    }
    time(s"audio fingerprint + near-dup pairs ($imgRows 2k-sample WAVs)") {
      val base = spark.range(imgRows).select(col("id"),
        graft.ops.Multimodal.patternWav(pmod(col("id"), lit(imgRows / 50)),
          lit(2000), lit(16000), lit(1)).as("content"))
      val hashed = graft.ops.Multimodal.audioFingerprint(base)
      val pairs = graft.ops.Dedup.hammingPairs(hashed, col("id"),
        col("afp"), maxHamming = 0)
      assert(pairs.count() == (imgRows / 50) * 49L)
    }

    // the r10 scale-killer scenario head-on: a 10%-hot exact-hash cluster
    // (the 100k-copy viral image) inside 1M hashed items. Pre-collapse
    // this was C(100k, 2) = 5e9 expanded pair structs through one bucket;
    // collapsed it is a 99,999-edge star + a pigeonhole over ~900k
    // DISTINCT pseudo-random hashes (~14 per 16-bit chunk bucket, far
    // under the cap), with bounded-state bucket aggregation throughout.
    val hotRows = math.min(rows / 100, 1000000L)
    val hotN = hotRows / 10
    time(s"hamming_pairs 10%-hot exact cluster ($hotRows items)") {
      val hashed = spark.range(hotRows).select(col("id"),
        when(col("id") < hotN, lit(0x5a5a5a5a5a5a5a5aL))
          .otherwise(xxhash64(col("id"))).as("h"))
      val n = graft.ops.Dedup.hammingPairs(hashed, col("id"), col("h"),
        maxHamming = 3).count()
      assert(n >= hotN - 1 && n < hotN + 1000, s"pair count $n")
    }

    // cox PH with CONTINUOUS censoring timestamps: ~70% of rows censored
    // at all-distinct times (the production shape — censor times are
    // ingestion timestamps). Cells live on the 100 EVENT times only; the
    // r10 shape would have needed maxTimes >= distinct-censor-times and a
    // driver cell table ~700k x state.
    time(s"cox_ph continuous censor times ($rows rows, 100 event times)") {
      val surv = df.select(col("id"),
        (col("id") % 2).cast("double").as("cx"),
        when(pmod(xxhash64(col("id"), lit(9)), lit(10L)) < 3,
          (pmod(xxhash64(col("id"), lit(10)), lit(100L)) + 1).cast("double"))
          .otherwise(lit(null).cast("double")).as("evt"),
        (pmod(xxhash64(col("id"), lit(11)), lit(1000000007L)).cast("double") /
          lit(1.0e7)).as("censt"))
      val r = graft.ops.Survival.coxPh(surv,
        coalesce(col("evt"), col("censt")),
        col("evt").isNotNull.cast("int"), Seq(col("cx")),
        maxIter = 5, maxTimes = 1000)
      assert(r.nTimes == 100, s"expected 100 event-time cells, got ${r.nTimes}")
    }

    // heavy hitters over a row-scale-cardinality column: the DataSketches
    // frequent-items state is bounded at maxTracked counters per stage —
    // the groupBy-count-sort alternative would shuffle ~rows/10 distinct
    // keys. Two planted ~5% heavies must surface with <= n/maxTracked
    // count error.
    time(s"top_k heavy hitters ($rows rows, ~${rows / 10} distinct tail)") {
      val vals = df.select(
        when(col("id") % 20 === 0, lit("HEAVY1"))
          .when(col("id") % 21 === 0, lit("HEAVY2"))
          .otherwise(concat(lit("tail_"),
            pmod(xxhash64(col("id"), lit(5)), lit(rows / 10L)))).as("v"))
      val r = graft.ops.Explore.topK(vals, col("v"), k = 2,
        maxTracked = 10000).collect()
      assert(r.map(_.getString(1)).toSet == Set("HEAVY1", "HEAVY2"),
        r.mkString(","))
    }

    // video container metadata walk: pure chunk parsing, no codec — the
    // predicate tier that lets 100 TB of video filter before decoding
    time(s"video metadata box walk ($imgRows MP4 headers)") {
      val vids = spark.range(imgRows).select(col("id"),
        graft.ops.Multimodal.patternMp4(
          (pmod(col("id"), lit(640L)) + 16).cast("int"),
          (pmod(col("id"), lit(360L)) + 9).cast("int"),
          pmod(col("id"), lit(100000L)) + 1000,
          pmod(col("id"), lit(3L)) === 0))
      val m = graft.ops.Multimodal.videoMetadata(vids.toDF("id", "content"))
      val ok = m.agg(sum(col("decode_ok").cast("long"))).head().getLong(0)
      assert(ok == imgRows, s"decoded $ok of $imgRows")
    }
    time(s"event_study unit deltas ($rows rows, 10 periods, 2 cohorts)") {
      // the round-12 se path: one unit-keyed join of the checkpointed slim
      // panel against its base-period slice (control rows fan out by the
      // 2 treated cohorts), then cell-scale stats
      val units = rows / 10
      // 256 source partitions bound the checkpoint-unroll pressure (see
      // the funnel entry) — the base frame here is 5 narrow columns
      val panel = spark.range(0L, rows, 1L, 256).select(
          (col("id") % units).as("u"),
          (col("id") / lit(units) + 1).cast("long").as("p"))
        .withColumn("g", when(col("u") % 3 === 1, 4L)
          .when(col("u") % 3 === 2, 7L).otherwise(0L))
        .withColumn("y", col("p") * 1.5 +
          pmod(xxhash64(col("u"), col("p")), lit(1000L)).cast("double") / 1000.0 +
          when(col("g") > 0 && col("p") >= col("g"), 1.0).otherwise(0.0))
      val r = graft.ops.EventStudy.groupTimeAtt(panel, col("g"), col("p"),
        col("y"), unit = Some(col("u"))).collect()
      assert(r.length == 18, s"${r.length} ATT rows")
      assert(r.forall(_.getDouble(5) > 0), "se must be positive")
      graft.Ckpt.releaseAll()
    }
    time(s"stratified_ate ($rows rows, 100k strata)") {
      val r = graft.ops.SimpleTests.stratifiedAte(
        df.withColumn("s", pmod(xxhash64(col("id"), lit(9)), lit(100000L))),
        col("y"), col("t"), col("s")).head()
      assert(r.getAs[Long]("n") == rows && r.getAs[Long]("n_strata") == 100000L)
    }
    time(s"rdd_sharp triangular ($rows rows)") {
      // one aggregate to 36 conditional moment sums; planted jump 3.0
      val r = graft.ops.Regression.rddSharp(
        df.withColumn("yr", col("y") +
          when(col("x1") >= 0.25, 3.0).otherwise(0.0)),
        col("yr"), col("x1"), cutoff = 0.25, bandwidth = 0.5).head()
      assert(math.abs(r.getAs[Double]("tau") - 3.0) < 0.05, r.toString)
    }
    time(s"synth_placebo 50 donors (${rows} rows, 20 periods)") {
      // the data cost is ONE (unit x period) cell aggregate; the 51
      // pairwise-FW refits are driver arithmetic over the collected cells
      val panel = spark.range(rows).select(
          (col("id") % 51).as("unit"),
          (col("id") % 20).as("p"))
        .withColumn("y", pmod(xxhash64(col("unit"), col("p")), lit(1000L))
          .cast("double") / 100.0 +
          when(col("unit") === 0 && col("p") >= 15, 4.0).otherwise(0.0))
      val pl = graft.ops.SynthControl.placeboTest(panel, col("unit"),
        col("p"), col("y"), "0", preEnd = 14.5).collect()
      assert(pl.length == 51)
      assert(pl.find(_.getBoolean(1)).get.getInt(5) <= 3,
        "planted treated effect should rank near the top")
    }
    time(s"funnel 4 steps (${rows} events, ${rows / 20} users)") {
      // 256 source partitions: the funnel checkpoints its slim event
      // frame, and 32 × 2.5M-row blocks unrolling concurrently with the
      // first aggregate starves execution memory in one 8g JVM — smaller
      // blocks bound the storage-unroll pressure (a cluster tunes the
      // same knob with maxPartitionBytes)
      val ev = spark.range(0L, rows, 1L, 256).select(
        (col("id") % (rows / 20)).as("u"),
        (col("id") / lit(rows / 20)).cast("double").as("ts"),
        element_at(
          array(lit("a"), lit("b"), lit("c"), lit("d"), lit("x")),
          (pmod(xxhash64(col("id"), lit(11)), lit(5)) + 1).cast("int")).as("e"))
      val f = graft.ops.Funnel.funnel(ev, col("u"), col("ts"), col("e"),
        Seq("a", "b", "c", "d"), 100.0).collect()
      assert(f.length == 4 && f.head.getLong(2) > 0)
    }
    time(s"gini + top shares ($rows values)") {
      // the heaviest r12 op: a global two-phase row number (range
      // repartition + per-partition sort) and one closing aggregate
      val r = graft.ops.Explore.gini(
        df.select((col("y") - lit(-10.0) + col("x1") * col("x1")).as("v")),
        col("v")).head()
      assert(r.getAs[Long]("n") == rows && r.getAs[Double]("gini") > 0)
    }
    time(s"rmst 4 groups ($rows rows, 10k times)") {
      // rides the KM cell frame; integral + variance are cell windows
      val r = graft.ops.Survival.rmst(
        df.select(pmod(xxhash64(col("id"), lit(13)), lit(10000L))
            .cast("double").as("tm"),
          (col("id") % 4).cast("string").as("g"),
          (col("id") % 3 =!= 0).cast("int").as("e")),
        col("tm"), col("e"), tau = 8000.0, group = col("g")).collect()
      assert(r.length == 4 && r.forall(_.getAs[Double]("se") > 0))
    }
    time(s"spearman ($rankRows rows, rank-join shape)") {
      // two rank-table builds + two row-scale joins back — the heaviest
      // shape among the r12 adds (gini ranks once and never joins back)
      val d = spark.range(rankRows).select(
        pmod(xxhash64(col("id"), lit(21)), lit(1000000L)).cast("double").as("x"),
        (pmod(xxhash64(col("id"), lit(21)), lit(1000000L)).cast("double") +
          pmod(xxhash64(col("id"), lit(22)), lit(500000L)).cast("double")).as("y"))
      val r = graft.ops.RankTests.spearman(d, col("x"), col("y")).head()
      assert(r.getAs[Double]("rho") > 0.5, r.toString)
    }
    time(s"zipf_fit (${rows / 100} docs, hash vocabulary)") {
      val docs = spark.range(rows / 100).select(
        concat_ws(" ",
          concat(lit("w"), pmod(xxhash64(col("id"), lit(31)), lit(50000L))),
          concat(lit("w"), pmod(col("id"), lit(1000L))),
          concat(lit("w"), pmod(xxhash64(col("id"), lit(32)), lit(5000L))))
          .as("text"))
      val r = graft.ops.TextOps.zipfFit(docs, col("text")).head()
      assert(r.getAs[Long]("terms") > 10000 && r.getAs[Double]("slope") < 0)
    }
    time(s"changepoint ($rows rows, 10k period cells)") {
      val r = graft.ops.Drift.changepoint(
        df.select((col("id") % 10000).as("p"),
          (col("y") + when(col("id") % 10000 >= 7000, 5.0).otherwise(0.0))
            .as("v")),
        col("p"), col("v")).head()
      assert(r.getAs[Long]("change_period") == 6999L)
    }
    time(s"mantel_haenszel ($rows rows, 100k strata)") {
      // ONE groupBy(stratum) to 2x2 cells + ONE cell aggregate
      val r = graft.ops.Contingency.mantelHaenszel(
        df.select(pmod(xxhash64(col("id"), lit(41)), lit(100000L)).as("s"),
          col("t"),
          (pmod(xxhash64(col("id"), lit(42)), lit(10L)) <
            lit(3) + lit(2) * col("t")).cast("int").as("yy")),
        col("s"), col("t"), col("yy")).head()
      assert(r.getAs[Long]("strata") == 100000L &&
        r.getAs[Double]("or_mh") > 1.5, r.toString)
    }
    time(s"kruskal_wallis ($rankRows rows, ~1M distinct, 5 groups)") {
      // the 3-frame rank shape: (v,g) cells, value cells, rank join back
      val d = spark.range(rankRows).select(
        (pmod(xxhash64(col("id"), lit(43)), lit(1000000L)).cast("double") +
          (col("id") % 5) * 10000.0).as("v"),
        (col("id") % 5).cast("string").as("g"))
      val r = graft.ops.RankTests.kruskalWallis(d, col("v"), col("g")).head()
      assert(r.getAs[Long]("k") == 5 && r.getAs[Double]("h_corrected") > 0)
    }
    time(s"brunner_munzel ($rankRows rows, 3 rank passes)") {
      val d = spark.range(rankRows).select(
        (pmod(xxhash64(col("id"), lit(44)), lit(100000L)).cast("double") +
          (col("id") % 2) * 5000.0).as("v"),
        (col("id") % 2).cast("int").as("t"))
      val r = graft.ops.RankTests.brunnerMunzel(d, col("v"), col("t")).head()
      assert(r.getAs[Double]("p_hat") > 0.5, r.toString)
    }
    time(s"cumulative_incidence ($rows rows, 10k times, 3 causes)") {
      val r = graft.ops.Survival.cumulativeIncidence(
        df.select(pmod(xxhash64(col("id"), lit(45)), lit(10000L)).as("tm"),
          pmod(xxhash64(col("id"), lit(46)), lit(3L)).cast("int").as("c")),
        col("tm"), col("c")).count()
      assert(r == 20000L, s"cif rows $r")
    }
    time(s"kmeans k=16 x 3 iters (1M vectors x 64d)") {
      // per iteration: one codegen argmin pass + (cluster,dim) cell agg
      val vecs = spark.range(1000000L).select(col("id"),
        array((0 until 64).map(j =>
          (pmod(xxhash64(col("id"), lit(100 + j)), lit(1000L))
            .cast("double") / 500.0 - 1.0) +
            (col("id") % 16).cast("double") * (if (j < 4) 2.0 else 0.0)): _*)
          .as("v"))
      val r = graft.ops.Ann.kmeans(vecs, col("id"), col("v"),
        k = 16, iters = 3).collect()
      assert(r.length == 16 && r.map(_.getAs[Long]("n")).sum == 1000000L)
    }
    time(s"ordinal_assoc ($rows rows, 2.5k cells)") {
      val r = graft.ops.Contingency.ordinalAssoc(
        df.select((pmod(xxhash64(col("id"), lit(47)), lit(50L))).as("x"),
          (pmod(xxhash64(col("id"), lit(47)), lit(50L)) +
            pmod(xxhash64(col("id"), lit(48)), lit(30L))).as("yy")),
        col("x"), col("yy")).head()
      assert(r.getAs[Double]("tau_b") > 0.3, r.toString)
    }
    time(s"heaps_fit (${rows / 100} docs, doc-order growth curve)") {
      val docs = spark.range(rows / 100).select(col("id"),
        concat_ws(" ",
          concat(lit("w"), pmod(xxhash64(col("id"), lit(52)), lit(2000000L))),
          concat(lit("w"), pmod(col("id"), lit(1000L)))).as("text"))
      val r = graft.ops.TextOps.heapsFit(docs, col("id"), col("text")).head()
      assert(r.getAs[Double]("beta") > 0.1 && r.getAs[Double]("beta") < 1.0,
        r.toString)
    }
    time(s"ngram_novelty trigrams (${rows / 100} new vs ${rows / 100} ref docs)") {
      def corpus(seed: Int) = spark.range(rows / 100).select(
        concat_ws(" ",
          (0 until 8).map(j => concat(lit("w"),
            pmod(xxhash64(col("id"), lit(seed + j)), lit(200000L)))): _*)
          .as("text"))
      val r = graft.ops.TextOps.ngramNovelty(corpus(60), corpus(90),
        col("text"), col("text"), n = 3).head()
      assert(r.getAs[Double]("novelty_distinct") > 0.5, r.toString)
    }
    time("theil_sen at the 20k-row cap (~2e8 distributed pair slopes)") {
      val d = spark.range(20000).select(col("id").cast("double").as("x"),
        (col("id") * 3 + pmod(xxhash64(col("id"), lit(61)), lit(100L)))
          .cast("double").as("y"))
      val r = graft.ops.Regression.theilSen(d, col("x"), col("y")).head()
      assert(math.abs(r.getAs[Double]("slope") - 3.0) < 0.1, r.toString)
    }
    time(s"dunn_test 10 groups ($rankRows rows)") {
      val d = spark.range(rankRows).select(
        (pmod(xxhash64(col("id"), lit(62)), lit(100000L)).cast("double") +
          (col("id") % 10) * 2000.0).as("v"),
        (col("id") % 10).cast("string").as("g"))
      val r = graft.ops.RankTests.dunnTest(d, col("v"), col("g")).collect()
      assert(r.length == 45)
    }
    time(s"chao1 (${rows / 100} docs)") {
      val docs = spark.range(rows / 100).select(
        concat_ws(" ",
          concat(lit("w"), pmod(xxhash64(col("id"), lit(51)), lit(2000000L))),
          concat(lit("w"), pmod(col("id"), lit(1000L)))).as("text"))
      val r = graft.ops.TextOps.chao1(docs, col("text")).head()
      assert(r.getAs[Double]("chao1") >= r.getAs[Long]("terms"), r.toString)
    }
    time(s"bpe_token_count 12-merge vocab (${rows / 100} docs x 40 words)") {
      val vocab = array(Seq("data", "row", "filter", "scan", "small", "agg",
        "fast", "stream", "key", "value", "table", "query", "batch", "merge",
        "window", "spark", "order", "column", "join", "big").map(lit): _*)
      val docs = spark.range(rows / 100).select(
        concat_ws(" ", transform(sequence(lit(0), lit(39)),
          i => element_at(vocab,
            (pmod(xxhash64(col("id"), i), lit(20)) + 1).cast("int")))).as("text"))
      val merges = Seq(("a", "t"), ("r", "o"), ("ro", "w"), ("d", "at"),
        ("dat", "a"), ("e", "r"), ("t", "er"), ("s", "t"), ("a", "n"),
        ("c", "an"), ("l", "l"), ("g", "g"))
      val r = docs.agg(
        sum(graft.ops.TextOps.bpeTokenCount(col("text"), merges))).head()
      assert(r.getLong(0) > 0)
    }
    time(s"bpe_token_count 33k-merge vocab via bpeMergesFrom (${rows / 100} docs x 40 words)") {
      // PRODUCTION vocabulary scale: a real tokenizer ships ~32-50k
      // merges, and every adjacent pair in every merge round pays a
      // binary search over that table — the 12-merge entry above cannot
      // see that cost. The synthetic vocab is well-formed and REACHABLE
      // (all 26² lowercase 2-grams, then every (2-gram, 2-gram) 4-gram
      // composition over the first 180 2-grams = 33,076 merges), loaded
      // through the DataFrame path a production merge table would use.
      val spark2 = spark
      import spark2.implicits._
      val mergeDf = syntheticMerges(180).zipWithIndex
        .map { case ((l, r), i) => (i.toLong, l, r) }
        .toDF("rank", "left", "right")
      val big = graft.ops.TextOps.bpeMergesFrom(mergeDf, col("rank"),
        col("left"), col("right"))
      assert(big.length >= 32000, s"vocab has only ${big.length} merges")
      // words are 4-12 letter slices of a fixed lowercase literal —
      // dense in 2-/4-gram merges, so the deep vocab actually applies
      val letters = ("the" + "quickbrownfoxjumpsoverthelazydog" * 8)
        .filter(_.isLetter).take(240).mkString
      val docs = spark.range(rows / 100).selectExpr(
        s"concat_ws(' ', transform(sequence(0, 39), w -> " +
          s"substring('$letters', " +
          "cast(pmod(xxhash64(id, w), 228) as int) + 1, " +
          "cast(pmod(xxhash64(id, w, 3), 9) as int) + 4))) as text")
      val r = docs.agg(
        sum(graft.ops.TextOps.bpeTokenCount(col("text"), big))).head()
      assert(r.getLong(0) > 0)
    }
    time("semantic_dedup 1M vectors x 16d, k=4096 (+10k planted dups)") {
      val dim = 16
      val vecs = spark.range(1000000L).select(
        // 4096 blobs with REAL angular spread (within-blob cosine ~0.98,
        // so only the planted exact copies clear the threshold); ids >=
        // 990k duplicate (id - 990000)'s vector exactly — every planted
        // pair shares a blob by the deterministic argmin
        when(col("id") >= 990000L, col("id") - 990000L).otherwise(col("id"))
          .as("src"),
        col("id"))
        .select(col("id"), transform(sequence(lit(0), lit(dim - 1)), d =>
          pmod(xxhash64(pmod(col("src"), lit(4096L)), d), lit(1000L))
            .cast("double") +
            pmod(xxhash64(col("src"), d, lit(7L)), lit(200L)).cast("double"))
          .as("v"))
      val out = graft.ops.Dedup.semanticDedup(vecs, col("id"), col("v"),
        k = 4096, threshold = 0.999999, iters = 2, probes = 1)
      val dups = out.filter(!col("is_representative")).count()
      assert(dups >= 10000L, s"found only $dups non-representatives")
    }
    time("semantic_dedup probes=2 1M vectors x 16d, k=4096 (+10k planted dups)") {
      // the SAME corpus on the default multi-assignment path: every
      // vector probes its top-2 centroids, so bucket membership doubles
      // and pair expansion pays ~4x per bucket — the price of closing
      // the one-boundary recall miss (q236 gates the semantics; this
      // entry certifies the cost stays bounded at corpus scale)
      val dim = 16
      val vecs = spark.range(1000000L).select(
        when(col("id") >= 990000L, col("id") - 990000L).otherwise(col("id"))
          .as("src"),
        col("id"))
        .select(col("id"), transform(sequence(lit(0), lit(dim - 1)), d =>
          pmod(xxhash64(pmod(col("src"), lit(4096L)), d), lit(1000L))
            .cast("double") +
            pmod(xxhash64(col("src"), d, lit(7L)), lit(200L)).cast("double"))
          .as("v"))
      val out = graft.ops.Dedup.semanticDedup(vecs, col("id"), col("v"),
        k = 4096, threshold = 0.999999, iters = 2, probes = 2)
      val dups = out.filter(!col("is_representative")).count()
      assert(dups >= 10000L, s"found only $dups non-representatives")
    }
    // the five quantile-flagged ops on their 100 TB path: percentile_approx
    // sketch (exact = false default) over an ALL-DISTINCT double column —
    // the shape whose exact-percentile value buffer would OOM an executor
    val adx = (xxhash64(col("id"), lit(71)).cast("double") / 1e19).as("x")
    time(s"mad_outliers sketch path ($rows all-distinct doubles)") {
      val d = spark.range(rows).select(adx)
      val r = graft.ops.Robust.madOutliers(d, col("x")).head()
      assert(r.getAs[Long]("n") == rows, r.toString)
    }
    time(s"yuen_test sketch path ($rows all-distinct doubles)") {
      val d = spark.range(rows).select(adx,
        (col("id") % 2).cast("int").as("t"))
        .select((col("x") + col("t") * 10.0).as("y"), col("t"))
      val r = graft.ops.Robust.yuenTest(d, col("y"), col("t")).head()
      assert(math.abs(r.getAs[Double]("diff") - 10.0) < 0.5, r.toString)
    }
    time(s"mood_median sketch path ($rows all-distinct doubles, 10 groups)") {
      val d = spark.range(rows).select(adx,
        (col("id") % 10).cast("string").as("g"))
      val r = graft.ops.Contingency.moodMedian(d, col("x"), col("g")).head()
      assert(r.getAs[Long]("k") == 10, r.toString)
    }
    time(s"hosmer_lemeshow sketch path ($rows all-distinct scores)") {
      val d = spark.range(rows).select(
        (pmod(xxhash64(col("id"), lit(72)), lit(1000000000L)).cast("double")
          / 1e9).as("s"))
        .select(col("s"), (col("s") > 0.5).cast("int").as("y"))
        .select((col("s") * 0.98 + 0.01).as("s"), col("y"))
      val r = graft.ops.MlEval.hosmerLemeshow(d, col("y"), col("s")).head()
      assert(r.getAs[Long]("bins") == 10, r.toString)
    }
    time(s"levene sketch path ($rows all-distinct doubles, 5 arms)") {
      val d = spark.range(rows).select(adx,
        (col("id") % 5).cast("string").as("a"))
        .select((col("x") * (col("a").cast("int") + 1)).as("y"), col("a"))
      val r = graft.ops.SimpleTests.leveneTest(d, col("y"), col("a")).head()
      assert(r.getAs[Double]("p_value") < 0.01, r.toString)
    }
    time(s"poisson_reg 2 covariates ($rows rows, IRLS)") {
      // count outcome, ~8 aggregate passes; the loop compiles once
      val d = spark.range(rows).select(
        pmod(xxhash64(col("id"), lit(11)), lit(6L)).cast("double").as("y"),
        (col("id") % 3).cast("double").as("x1"),
        (pmod(xxhash64(col("id"), lit(12)), lit(1000L)).cast("double") / 1000.0).as("x2"))
      val fit = graft.ops.MlWrappers.poissonIrls(d, col("y"),
        Seq(col("x1"), col("x2")))
      assert(fit.converged, s"did not converge in ${fit.iterations}")
    }
    time(s"c_index Fenwick sweep ($rows rows, 10k times x 50 scores)") {
      // production shape: scores pre-quantized so the cell table stays
      // bounded (500k cells through the guard, ONE groupBy + driver sweep)
      val d = spark.range(rows).select(
        (col("id") % 10000).cast("double").as("t"),
        (col("id") % 4 =!= 0).cast("int").as("e"),
        (pmod(xxhash64(col("id"), lit(13)), lit(50L)).cast("double") / 50.0).as("s"))
      val r = graft.ops.Survival.concordanceIndex(d, col("t"), col("e"),
        col("s")).head()
      assert(r.getAs[Long]("n") == rows, r.toString)
    }
    time(s"krippendorff ($rows ratings, ${rows / 10} units)") {
      // ragged-coverage agreement at corpus scale: ~10 ratings per unit,
      // 20 nominal values; everything stays keyed, nothing collects
      val d = spark.range(rows).select(
        floor(col("id") / 10).cast("long").as("u"),
        pmod(xxhash64(col("id"), lit(14)), lit(20L)).cast("string").as("v"))
      val r = graft.ops.Agreement.krippendorffAlpha(d, col("u"), col("v"))
        .head()
      assert(r.getAs[Long]("n") == rows, r.toString)
    }
    time(s"retrieval_eval ($rows rows, ${rows / 100} queries x 100 items)") {
      val d = spark.range(rows).select(
        floor(col("id") / 100).cast("long").as("q"), col("id").as("i"),
        (pmod(xxhash64(col("id"), lit(15)), lit(1000000L)).cast("double")).as("s"),
        (pmod(xxhash64(col("id"), lit(16)), lit(50L)) === 0).cast("int").as("r"))
      val out = graft.ops.MlEval.retrievalEval(d, col("q"), col("i"),
        col("s"), col("r"), k = 10).head()
      assert(out.getAs[Long]("n_queries") == rows / 100, out.toString)
    }
    time(s"dagostino_k2 ($rows rows, one moment pass)") {
      val d = spark.range(rows).select(
        (pmod(xxhash64(col("id"), lit(17)), lit(100000L)).cast("double") / 1000.0).as("x"))
      val r = graft.ops.SimpleTests.dagostinoK2(d, col("x")).head()
      assert(r.getAs[Long]("n") == rows, r.toString)
    }
    time("win_ratio 5000x5000 arms (2.5e7 distributed pair cascade)") {
      val d = spark.range(10000L).select(
        (col("id") % 2).cast("int").as("t"),
        pmod(xxhash64(col("id"), lit(18)), lit(100L)).cast("double").as("o1"),
        pmod(xxhash64(col("id"), lit(19)), lit(1000L)).cast("double").as("o2"))
      val r = graft.ops.SimpleTests.winRatio(d, col("t"),
        Seq(col("o1"), col("o2"))).head()
      assert(r.getAs[Long]("pairs") == 25000000L, r.toString)
    }
    // The BASELINE claims ("OLS 100M sub-second", "second-level causal
    // queries") are measured by the reference on a STORED table; the
    // synthetic entries above also pay xxhash generation inside the
    // timing. These cached-input twins separate operator cost from
    // generator cost: the projected slice persists (untimed) and only the
    // aggregate is on the clock — the stored-table read the claims assume.
    locally {
      val cached = df.select(col("y"), col("x1"), col("x2"), col("x3"))
        .persist()
      cached.count()
      time("ols y ~ x1+x2+x3 (cached columnar input)") {
        val r = cached.select(functions.ols(col("y"),
          Seq(col("x1"), col("x2"), col("x3"))).as("m"))
          .select("m.coefficients").head()
        assert(math.abs(r.getSeq[Double](0).head - 2.0) < 0.01)
      }
    }
    locally {
      val cached = df.select(col("y"), col("t")).persist()
      cached.count()
      time("ttest_2samp y by t (cached columnar input)") {
        cached.select(functions.ttest_2samp("x1", col("t"))(col("y")).as("r"))
          .select("r.p_value").head()
      }
    }
    time(s"pagerank 10 iters (${rows / 10} edges, ${rows / 100} nodes)") {
      // 10 edges/node functional graph; 10 join+agg rounds under the
      // persist-release bracket
      val nNodes = rows / 100
      val e = spark.range(rows / 10).select(
        (col("id") % nNodes).as("s"),
        pmod(xxhash64(col("id"), lit(20)), lit(nNodes)).as("d"))
      val total = graft.ops.Graph.pageRank(e, col("s"), col("d"),
          iterations = 10)
        .agg(sum(col("rank"))).head().getDouble(0)
      assert(math.abs(total - 1.0) < 1e-6, s"rank mass $total")
    }
    time(s"adf_test lags=2 ($rows rows, 10k period cells)") {
      val d = spark.range(rows).select((col("id") % 10000).as("p"),
        (pmod(xxhash64(col("id"), lit(21)), lit(1000L)).cast("double") / 100.0).as("v"))
      val r = graft.ops.Regression.adfTest(d, col("p"), col("v"), lags = 2)
        .head()
      assert(r.getAs[Boolean]("stationary_5pct"), r.toString)
    }
    time(s"ope IPS/SNIPS/DR ($rows rows, one moment pass)") {
      val d = spark.range(rows).select(
        ((col("id") % 4 + 2) / lit(10.0)).as("pl"),
        ((col("id") % 5 + 1) / lit(10.0)).as("pt"),
        (col("id") % 7).cast("double").as("r"),
        ((col("id") % 3) * lit(0.5)).as("q"))
      val o = graft.ops.PolicyEval.opeEval(d, col("r"), col("pt"),
        col("pl"), qhat = Some(col("q")), wClip = 2.0).head()
      assert(o.getAs[Double]("snips") > 0, o.toString)
    }
    time(s"neg_bin_reg y ~ x ($rows rows, pilot + moment alpha + IRLS)") {
      val d = spark.range(rows).select(
        when(col("id") % 6 === 3, 1.0).when(col("id") % 6 === 4, 2.0)
          .when(col("id") % 6 === 5, 9.0).otherwise(0.0).as("y"),
        (col("id") % 2).cast("int").as("x"))
      val r = graft.ops.MlWrappers.negBinIrls(d, col("y"), Seq(col("x")))
      assert(r.alpha > 0 && r.converged, s"alpha ${r.alpha}")
    }
    time(s"isotonic_calibrate ($rows rows, 10k score cells)") {
      val d = spark.range(rows).select(
        (col("id") % 10000).cast("double").as("s"),
        (pmod(xxhash64(col("id"), lit(23)), lit(100L)) <
          least((col("id") % 10000) / lit(110) + 5, lit(95))).cast("int")
          .as("y"))
      val r = graft.ops.MlEval.isotonicCalibrate(d, col("s"), col("y"))
      assert(r.count() == 10000L)
    }
    time(s"weighted_kappa ($rows ordinal pairs, 10 levels)") {
      // ordinal grades with planted 1-step disagreements: ONE cell
      // aggregate (<=100 cells), the FCE variance closes on the driver
      val d = spark.range(rows).select(
        (col("id") % 10).cast("double").as("a"),
        ((col("id") % 10 + (pmod(xxhash64(col("id"), lit(31)), lit(3L)) === 0)
          .cast("int")) % 10).cast("double").as("b"))
      val r = graft.ops.Agreement.weightedKappa(d, col("a"), col("b")).head()
      assert(r.getAs[Long]("n") == rows && !r.getAs[Double]("kappa_w").isNaN)
    }
    time(s"cox_zph 2 covariates ($rows rows, 10k times)") {
      // the cox_ph fit plus ONE more cell aggregate at beta-hat and the
      // O(m k^2) driver close over the 10k cells
      val out = graft.ops.Survival.coxZph(survDf, col("stime"), col("ev"),
        Seq(col("arm").cast("double"),
          (pmod(xxhash64(col("arm2"), lit(7)), lit(1000L)).cast("double")
            / 1000.0)), Seq("a", "h")).collect()
      assert(out.length == 3 && !out.head.getAs[Double]("chisq").isNaN)
    }
    time(s"cox_ph_strat 2 covariates ($rows rows, 4 strata x 10k times)") {
      // stratified fit: same per-iteration aggregate keyed by (stratum,
      // time); ~40k driver cells, suffix sums reset per stratum. The
      // stratum is an INDEPENDENT hash — survDf's arm is a function of
      // arm2, which would leave zero within-stratum covariate variance
      // (a genuinely singular stratified information, not a probe bug)
      val sdf = df.select(
        pmod(xxhash64(col("id"), lit(41)), lit(4L)).cast("string").as("site"),
        (col("id") % 2).cast("double").as("arm"),
        pmod(xxhash64(col("id"), lit(91)), lit(10000L)).cast("int").as("stime"),
        (pmod(xxhash64(col("id"), lit(92)), lit(10L)) < 7).cast("int").as("ev"),
        (pmod(xxhash64(col("id"), lit(7)), lit(1000L)).cast("double")
          / 1000.0).as("x2"))
      val r = graft.ops.Survival.coxPhStratified(sdf,
        col("stime"), col("ev"), col("site"), Seq(col("arm"), col("x2")))
      assert(r.iterations < 20 && !r.coefficients(0).isNaN)
    }
    time(s"cox_ph efron 2 covariates ($rows rows, 10k times, ~7k-deep ties)") {
      // Efron cells = Breslow cells + the three C-moment groups (same
      // ONE pass per Newton iteration); the driver scan's l/d loop runs
      // O(total events) ~ 70M pure-arithmetic iterations per pass
      val r = graft.ops.Survival.coxPh(survDf, col("stime"), col("ev"),
        Seq(col("arm").cast("double"),
          (pmod(xxhash64(col("arm2"), lit(7)), lit(1000L)).cast("double")
            / 1000.0)), ties = "efron")
      assert(r.iterations < 20 && !r.coefficients(0).isNaN)
    }
    time(s"cox_ph_cluster 2 covariates ($rows rows, 100k clusters)") {
      // the fit + one cell pass at beta-hat + one row-scale residual
      // aggregate (codegen step lookups) + a cluster-scale outer-moment
      // aggregate
      // clusters hash from the ROW id (hashing stime would cap distinct
      // clusters at the 10k distinct times — the r18 first-run assert)
      val cdf = df.select(
        (col("id") % 2).cast("int").as("arm"),
        (col("id") % 4).cast("int").as("arm2"),
        pmod(xxhash64(col("id"), lit(91)), lit(10000L)).cast("int").as("stime"),
        (pmod(xxhash64(col("id"), lit(92)), lit(10L)) < 7).cast("int").as("ev"),
        pmod(xxhash64(col("id"), lit(53)), lit(100000L)).cast("string").as("cl"))
      val r = graft.ops.Survival.coxPhRobust(cdf, col("stime"), col("ev"),
        col("cl"), Seq(col("arm").cast("double"),
          (pmod(xxhash64(col("arm2"), lit(7)), lit(1000L)).cast("double")
            / 1000.0)))
      assert(r.nClusters == 100000L && r.seRobust.forall(_ > 0))
    }
    time(s"fine_gray 2 covariates ($rows rows, 3 causes, 10k times)") {
      // censoring-KM cell pass + one-time role bucketing/join, then ONE
      // (role, time) cell aggregate per Newton pass
      val fdf = df.select(
        pmod(xxhash64(col("id"), lit(91)), lit(10000L)).cast("int").as("stime"),
        pmod(xxhash64(col("id"), lit(92)), lit(3L)).cast("int").as("cause"),
        (col("id") % 2).cast("double").as("x1"),
        (pmod(xxhash64(col("id"), lit(7)), lit(1000L)).cast("double")
          / 1000.0).as("x2"))
      val r = graft.ops.Survival.fineGray(fdf, col("stime"), col("cause"),
        Seq(col("x1"), col("x2")))
      assert(r.iterations < 20 && !r.coefficients(0).isNaN)
    }
    time(s"gray_test 4 groups ($rows rows, 3 causes, 10k times)") {
      // prep's one-time passes + ONE (role, time, group) cell aggregate
      // (no Newton loop) + an O(m*K) driver scan
      val gdf = df.select(
        pmod(xxhash64(col("id"), lit(91)), lit(10000L)).cast("int").as("stime"),
        pmod(xxhash64(col("id"), lit(92)), lit(3L)).cast("int").as("cause"),
        (col("id") % 4).cast("string").as("grp"))
      val r = graft.ops.Survival.grayTest(gdf, col("stime"), col("cause"),
        col("grp")).collect()
      assert(r.length == 4 && !r.head.getAs[Double]("chi2").isNaN)
    }
    time(s"fine_gray_cif stored-beta ($rows rows, 3 causes, 10k times)") {
      // the fineGray pass without the Newton loop: prep's one-time
      // passes + ONE (role, time) cell aggregate at the stored beta +
      // an O(m) driver suffix/prefix scan
      val fdf = df.select(
        pmod(xxhash64(col("id"), lit(91)), lit(10000L)).cast("int").as("stime"),
        pmod(xxhash64(col("id"), lit(92)), lit(3L)).cast("int").as("cause"),
        (col("id") % 2).cast("double").as("x1"),
        (pmod(xxhash64(col("id"), lit(7)), lit(1000L)).cast("double")
          / 1000.0).as("x2"))
      val n = graft.ops.Survival.fineGrayCif(fdf, col("stime"), col("cause"),
        Seq(col("x1"), col("x2")), Seq(1.0, 0.5),
        beta = Some(Array(0.1, -0.2))).count()
      assert(n == 10000L, s"$n curve rows")
    }
    time(s"aft weibull 2 covariates ($rows rows, ~30% censored)") {
      // ONE distributed aggregate per damped-Newton iteration (O(k^2)
      // codegen sums over z); accepted line-search trials cost no
      // extra pass
      val adf = df.select(
        (pmod(xxhash64(col("id"), lit(91)), lit(10000L)) + 1L)
          .cast("double").as("stime"),
        (pmod(xxhash64(col("id"), lit(92)), lit(10L)) < 7).cast("int")
          .as("ev"),
        (col("id") % 2).cast("double").as("ax1"),
        (pmod(xxhash64(col("id"), lit(7)), lit(1000L)).cast("double")
          / 1000.0).as("ax2"))
      val r = graft.ops.Aft.aftFit(adf, col("stime"), col("ev"),
        Seq(col("ax1"), col("ax2")), Seq("ax1", "ax2"))
      assert(r.iterations < 30 && !r.estimates(0).isNaN)
    }
    time(s"multinomial_logit 4 classes 2 covariates ($rows rows)") {
      // one softmax-moment aggregate per damped-Newton iteration
      val mdf = df.select(
        (pmod(xxhash64(col("id"), lit(96)), lit(4L)) + 1).cast("double")
          .as("cls"),
        col("x1"), col("x2"))
      val r = graft.ops.Multinomial.multinomialLogit(mdf, col("cls"),
        Seq(col("x1"), col("x2")), Seq("x1", "x2"))
      assert(r.iterations < 30 && !r.estimates(0)(0).isNaN)
    }
    time(s"gamma_reg 3 covariates ($rows rows)") {
      // one unweighted OLS scan per IRLS iteration + a dispersion scan
      val gdf = df.withColumn("gy",
        exp(col("x1") * 0.3 + col("x2") * 0.1) *
          (pmod(xxhash64(col("id"), lit(97)), lit(1000L)).cast("double")
            / 1000.0 + 0.5))
      val r = graft.ops.MlWrappers.gammaIrls(gdf, col("gy"),
        Seq(col("x1"), col("x2"), col("x3")))
      assert(r.converged && r.dispersion > 0)
    }
    time(s"ordinal_logit 5 levels 2 covariates ($rows rows)") {
      // one O((J+k)^2)-sum aggregate per damped-Newton iteration
      val odf = df.select(
        (pmod(xxhash64(col("id"), lit(95)), lit(5L)) + 1).cast("double")
          .as("tier"),
        col("x1"), col("x2"))
      val r = graft.ops.Ordinal.ordinalLogit(odf, col("tier"),
        Seq(col("x1"), col("x2")), Seq("x1", "x2"))
      assert(r.iterations < 30 && !r.estimates(0).isNaN)
    }
    time(s"bartlett 8 arms ($rows rows)") {
      val r = graft.ops.SimpleTests.bartlettTest(
        df.withColumn("arm", (col("id") % 8).cast("string")),
        col("y"), col("arm")).head()
      assert(r.getAs[Long]("k") == 8L)
    }
    time(s"breslow_day ($rows rows, 100k strata)") {
      // one 2x2 cell aggregate + two cell-scale closing aggregates with
      // the quadratic solve as a codegen cell expression
      val bdf = df.select(
        pmod(xxhash64(col("id"), lit(81)), lit(100000L)).cast("string")
          .as("st"),
        (col("id") % 2).cast("int").as("t"),
        (pmod(xxhash64(col("id"), lit(82)), lit(10L)) < 4).cast("int")
          .as("yy"))
      val r = graft.ops.Contingency.breslowDay(bdf, col("st"), col("t"),
        col("yy")).head()
      assert(r.getAs[Long]("strata") == 100000L)
    }
    time(s"design_effect grouped ($rows rows, 16 groups)") {
      val r = graft.ops.SimpleTests.designEffect(
        df.withColumn("w", col("y") * col("y") + 1.0)
          .withColumn("g", (col("id") % 16).cast("string")),
        col("w"), Some(col("g"))).collect()
      assert(r.length == 16)
    }
    time(s"acf_pacf 48 lags ($rows rows, 100k periods)") {
      // one row-scale collapse to 100k period cells, 48 lag columns on
      // one ordered cell window, one cell aggregate + O(m^2) driver DL
      val sdf = df.select(
        pmod(xxhash64(col("id"), lit(71)), lit(100000L)).as("p"),
        col("y"))
      val r = graft.ops.Drift.acfPacf(sdf, col("p"), col("y"), lags = 48)
        .collect()
      assert(r.length == 48 && !r.head.getAs[Double]("pacf").isNaN)
    }
    time(s"vif 4 covariates ($rows rows)") {
      // one moment aggregate (4 means + 10 cross moments), driver inverse
      // NB the 4th column is a NONLINEAR mix — an exact linear
      // combination is the collinear error path, probed in the spec
      val r = graft.ops.Regression.vif(df,
        Seq(col("x1"), col("x2"), col("x3"),
          col("x1") + col("x2") * col("x2") * 0.5),
        Seq("x1", "x2", "x3", "mix")).collect()
      assert(r.length == 4 && r.forall(_.getAs[Double]("vif") >= 1.0 - 1e-9))
    }
    time(s"synth_did (${rows} rows, 24 units x 12 periods, 6 treated)") {
      // ONE distributed cell collapse; the double FW fit + jackknife
      // replicates are driver arithmetic over 288 cells
      val pdf = df.select(
        pmod(xxhash64(col("id"), lit(61)), lit(24L)).cast("string").as("u"),
        pmod(xxhash64(col("id"), lit(62)), lit(12L)).cast("double").as("p"),
        (col("x1") + col("x2")).as("v"),
        (pmod(xxhash64(col("id"), lit(61)), lit(24L)) < 6).cast("int")
          .as("tr"))
      val r = graft.ops.SynthControl.synthDid(pdf, col("u"), col("p"),
        col("v"), col("tr"), 5.5).head()
      assert(!r.getAs[Double]("att").isNaN &&
        r.getAs[Long]("n_treated") == 6L)
    }
    time(s"aft_survival stored-params ($rows rows, 10k distinct times)") {
      // one distinct-time collapse + a codegen closed-form expression;
      // no driver scan, no collect
      val adf = df.select(
        (pmod(xxhash64(col("id"), lit(91)), lit(10000L)) + 1L)
          .cast("double").as("stime"),
        (pmod(xxhash64(col("id"), lit(92)), lit(10L)) < 7).cast("int")
          .as("ev"),
        (col("id") % 2).cast("double").as("ax1"))
      val n = graft.ops.Aft.aftSurvival(adf, col("stime"), col("ev"),
        Seq(col("ax1")), Seq(1.0),
        params = Some(Array(8.0, 0.1, -0.3))).count()
      assert(n == 10000L, s"$n curve rows")
    }
    time(s"cox_survival stored-beta ($rows rows, 10k times)") {
      // ONE cell aggregate at the given beta + O(m) driver scan — the
      // coxPh pass without the Newton loop
      val n = graft.ops.Survival.coxSurvival(survDf, col("stime"),
        col("ev"), Seq(col("arm").cast("double")), Seq(1.0),
        beta = Some(Array(0.1))).count()
      assert(n == 10000L, s"$n curve rows")
    }
    time(s"rmst_diff tau=5000 ($rows rows, 2 arms x 10k times)") {
      val r = graft.ops.Survival.rmstDiff(survDf, col("stime"),
        col("ev"), 5000.0, col("arm")).head()
      assert(!r.getAs[Double]("diff").isNaN)
    }
    time(s"isotonic_score fit 10k cells + apply $rows rows") {
      // calibrate-then-score: the PAVA fit's cell pass plus a broadcast
      // binary-search application over the full target frame
      val tr = spark.range(rows / 10).select(
        (col("id") % 10000).cast("double").as("s"),
        (pmod(xxhash64(col("id"), lit(23)), lit(100L)) <
          least((col("id") % 10000) / lit(110) + 5, lit(95))).cast("int")
          .as("y"))
      val tgt = spark.range(rows).select(
        (pmod(xxhash64(col("id"), lit(37)), lit(1100000L)).cast("double")
          / 100.0 - 500.0).as("s"))
      val n = graft.ops.MlEval.isotonicScore(tr, col("s"), col("y"),
        tgt, col("s")).filter(col("calibrated").isNotNull).count()
      assert(n == rows, s"scored $n")
    }
    time(s"elect_representatives (${rows / 10} labeled vertices)") {
      // dup components of ~10 members each + a rank table
      val comp = spark.range(rows / 10).select(col("id"),
        (col("id") - col("id") % 10).as("component"))
      val ranks = spark.range(rows / 10).select(col("id"),
        pmod(xxhash64(col("id"), lit(29)), lit(1000L)).cast("double")
          .as("r"))
      val n = graft.ops.Dedup.electRepresentatives(comp, ranks,
        col("id"), col("r")).count()
      assert(n == rows / 100, s"$n components")
    }
    } // suite()

    val passes = sys.env.getOrElse("SPARK_GRAFT_PROBE_PASSES", "2").toInt
    sentinel(); sentinel(); sentinel() // untimed codegen/JIT warmup (Bench idiom)
    val sentinels = scala.collection.mutable.ArrayBuffer(sentinel())
    for (_ <- 1 to passes) {
      suite()
      sentinels += sentinel()
    }
    val json = timings
      .map { case (l, s) =>
        val lab = l.replace("\"", "'")
        s""""$lab": ${s.min}""" }
      .mkString(s"""{"rows": $rows, "cpus": $cpus, "passes": $passes, """ +
        s""""sentinel_sec": ${sentinels.map(s => f"$s%.3f").mkString("[", ",", "]")}, """ +
        """"timings_sec": {""", ", ", "}")
    val samples = timings
      .map { case (l, s) =>
        s""""${l.replace("\"", "'")}": ${s.mkString("[", ",", "]")}""" }
      .mkString(""", "samples_sec": {""", ", ", "}}")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json + samples)
    println(s"PROBE artifact written to $outPath")
    spark.stop()
  }
}
