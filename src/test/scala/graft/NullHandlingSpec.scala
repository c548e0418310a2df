package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incomplete rows (any null among an aggregate's inputs) must be dropped
  * listwise, exactly like the reference engines skip NULL aggregate inputs
  * (and R's lm na.omit) — never coerced to 0. */
class NullHandlingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val withNulls = Seq[(java.lang.Double, java.lang.Double, java.lang.Integer)](
    (1.0, 2.0, 0), (2.0, 3.0, 1), (null, 4.0, 0), (3.0, null, 1),
    (4.0, 5.0, 0), (5.0, 6.0, 1), (6.0, 7.0, null)
  ).toDF("x", "y", "t")
  private lazy val complete = withNulls.na.drop(Seq("x", "y"))
  // complete cases w.r.t. (x, t) only — y is not an input of these tests
  private lazy val completeXT = withNulls.na.drop(Seq("x", "t"))

  test("delta_method drops incomplete rows") {
    val a = withNulls.select(functions.delta_method("x1/x2", isStd = false,
      Seq($"x", $"y")).as("v")).head().getDouble(0)
    val b = complete.select(functions.delta_method("x1/x2", isStd = false,
      Seq($"x", $"y")).as("v")).head().getDouble(0)
    assert(a == b, s"$a vs complete-case $b")
  }

  test("ols drops rows with null y or x") {
    val a = withNulls.select(functions.ols($"y", Seq($"x")).as("m"))
      .select("m.coefficients").head().getSeq[Double](0)
    val b = complete.select(functions.ols($"y", Seq($"x")).as("m"))
      .select("m.coefficients").head().getSeq[Double](0)
    assert(a == b, s"$a vs complete-case $b")
    // complete-case slope on these collinear-ish points is 1 (y = x + 1)
    assert(math.abs(a.head - 1.0) < 1e-9)
  }

  test("ttest_2samp drops rows with null value or treatment") {
    val a = withNulls.select(functions.ttest_2samp("x1", $"t")($"x").as("r"))
      .select("r.mean0", "r.mean1").head()
    val b = completeXT.select(functions.ttest_2samp("x1", $"t")($"x").as("r"))
      .select("r.mean0", "r.mean1").head()
    assert(a.getDouble(0) == b.getDouble(0) && a.getDouble(1) == b.getDouble(1))
    // t=null row (x=6) must not land in either arm
    assert(a.getDouble(0) == (1.0 + 4.0) / 2)
  }

  test("mann_whitney and ks drop null rows") {
    val mw = withNulls.select(
      functions.mann_whitney_utest($"x", $"t").as("r")).select("r.u_statistic").head()
    val mwc = completeXT.select(
      functions.mann_whitney_utest($"x", $"t").as("r")).select("r.u_statistic").head()
    assert(mw.getDouble(0) == mwc.getDouble(0))
    val ks = withNulls.select(
      functions.kolmogorov_smirnov_test($"x", $"t").as("r")).select("r.d_statistic").head()
    val ksc = completeXT.select(
      functions.kolmogorov_smirnov_test($"x", $"t").as("r")).select("r.d_statistic").head()
    assert(ks.getDouble(0) == ksc.getDouble(0))
  }

  test("distributed rank tests agree with agg variants under nulls") {
    val mwAgg = withNulls.select(
      functions.mann_whitney_utest($"x", $"t").as("r")).select("r.u_statistic").head().getDouble(0)
    val mwDist = graft.ops.RankTests.mannWhitneyU(withNulls, $"x", $"t").u_statistic
    assert(mwAgg == mwDist, s"agg $mwAgg vs distributed $mwDist")
    val ksAgg = withNulls.select(
      functions.kolmogorov_smirnov_test($"x", $"t").as("r")).select("r.d_statistic").head().getDouble(0)
    val ksDist = graft.ops.RankTests.ksTest(withNulls, $"x", $"t").d_statistic
    assert(ksAgg == ksDist, s"agg $ksAgg vs distributed $ksDist")
  }

  test("srm skips null values and null groups") {
    val a = withNulls.select(functions.srm($"x", $"t", Seq(1.0, 1.0)).as("r"))
      .select("r.observed").head().getSeq[Double](0)
    val b = completeXT.select(functions.srm($"x", $"t", Seq(1.0, 1.0)).as("r"))
      .select("r.observed").head().getSeq[Double](0)
    assert(a == b, s"$a vs complete-case $b")
  }

  test("exactDedup keeps every null-text row (unknown != identical)") {
    val d = Seq[(Long, String)](
      (1L, "same doc"), (2L, "same doc"), (3L, "other"),
      (4L, null), (5L, null), (6L, null)).toDF("id", "text")
    val kept = graft.ops.Dedup.exactDedup(d, $"text", $"id")
      .select($"id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L, 5L, 6L), s"kept $kept")
  }

  test("incrementalDedup and snapshotDiff null-text semantics") {
    // null-text batch rows are NEVER matched against history (history
    // filters its nulls; the batch nulls share one sentinel fingerprint
    // but nothing in the filtered history can equal it) -> they pass as new
    val hist = Seq[(Long, String)]((1L, "known"), (2L, null)).toDF("id", "text")
    val batch = Seq[(Long, String)]((10L, "known"), (11L, null), (12L, "fresh"))
      .toDF("id", "text")
    val kept = graft.ops.Dedup.incrementalDedup(batch, hist, $"text", $"text",
      expectedHistory = 10L).select($"id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(11L, 12L), s"kept $kept")
    // snapshotDiff: null -> text and text -> null read as changed;
    // null -> null reads as unchanged (both unknown, nothing to report)
    val v1 = Seq[(Long, String)]((1L, null), (2L, "a"), (3L, null)).toDF("id", "text")
    val v2 = Seq[(Long, String)]((1L, "now set"), (2L, null), (3L, null)).toDF("id", "text")
    val m = graft.ops.Dedup.snapshotDiff(v1, v2, $"id", $"id", $"text", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "changed", 2L -> "changed", 3L -> "unchanged"), m.toString)
  }

  test("effect estimators and longterm means are listwise under nulls") {
    val d = Seq[(Long, java.lang.Double, java.lang.Integer)](
      (1L, 10.0, 1), (2L, 12.0, 1), (3L, 8.0, 0), (4L, 9.0, 0),
      (5L, null, 1), (6L, null, 0), (7L, 11.0, null)
    ).toDF("id", "y", "t")
    val complete = d.na.drop(Seq("y", "t"))
    val a = graft.ops.Bootstrap.ateEstimator(d, $"y", $"t", b = 20, idCols = Seq($"id"))
    val b = graft.ops.Bootstrap.ateEstimator(complete, $"y", $"t", b = 20, idCols = Seq($"id"))
    assert(a.estimate == b.estimate && a.stderr == b.stderr,
      s"nulls changed the estimator: $a vs $b")
    val (obsA, _, _) = graft.ops.Bootstrap.permutationTest(d, $"y", $"t",
      b = 20, idCols = Seq($"id"))
    val (obsB, _, _) = graft.ops.Bootstrap.permutationTest(complete, $"y", $"t",
      b = 20, idCols = Seq($"id"))
    assert(obsA == obsB, s"permutation observed drifted: $obsA vs $obsB")
  }

  test("knn ignores null vectors on both sides") {
    val vecs = Seq[(Long, Seq[java.lang.Double])](
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.9, 0.1)), (3L, null), (4L, Seq(0.0, 1.0)))
      .toDF("id", "v").select($"id", $"v".cast("array<double>").as("v"))
    val probes = Seq[(Long, Seq[java.lang.Double])]((10L, Seq(1.0, 0.0)), (11L, null))
      .toDF("pid", "q").select($"pid", $"q".cast("array<double>").as("q"))
    val r = graft.ops.Ann.bruteForceKnn(vecs, $"id", $"v", probes, $"pid", $"q", k = 4)
      .collect()
    // null-vector corpus row 3 never appears; null-vector probe 11 gets no rows
    assert(r.forall(_.getLong(1) != 3L))
    assert(r.forall(_.getLong(0) == 10L))
    assert(r.length == 3) // all non-null corpus rows ranked for probe 10
  }

  test("caliper matching never matches rows with null/NaN score or treatment") {
    // nulls mean UNKNOWN: without an explicit gate, struct grouping would
    // treat null cell fields as equal and silently match the unknowns
    val d = Seq[(Long, java.lang.Double, java.lang.Integer, String)](
      (1L, 0.10, 1, "a"), (2L, 0.12, 0, "a"), (3L, 0.11, 0, "a"),
      (4L, null, 1, "a"), (5L, null, 0, "a"),          // null scores
      (6L, Double.NaN, 1, "a"), (7L, Double.NaN, 0, "a"), // NaN scores
      (8L, 0.10, null, "a"),                           // null treatment
      (9L, 0.10, 1, null), (10L, 0.10, 0, null)        // null exact col
    ).toDF("id", "score", "t", "g")
    val m = graft.ops.Matching.caliperMatching(d, $"t", $"score",
      caliper = 0.5, exactCols = Seq($"g"), k = 1)
    val idx = m.select($"id", $"matching_index").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the three complete rows in cell (bucket 0, "a") match 1:1
    assert(idx(1L) > 0 && (idx(2L) > 0 || idx(3L) > 0))
    // every incomplete row is unmatched
    Seq(4L, 5L, 6L, 7L, 8L, 9L, 10L).foreach(i =>
      assert(idx(i) == 0L, s"row $i with incomplete keys got index ${idx(i)}"))
  }

  test("uplift evaluation follows the reference's conditional-sum null convention") {
    // null treatment rows count in `count` but in NEITHER arm; null target
    // sums skip (spark_evaluation.py's cnt_cond/sum_cond, NOT listwise)
    val d = Seq[(java.lang.Double, java.lang.Integer)](
      (10.0, 1), (20.0, 0), (30.0, null), (null, 1)
    ).toDF("y", "t")
    val r = graft.ops.UpliftEval.estimateAte(d, $"y", $"t").head()
    assert(r.getAs[Double]("count") == 4.0)
    assert(r.getAs[Double]("treatment_count") == 2.0) // null-y treated row still counts
    assert(r.getAs[Double]("control_count") == 1.0)
    assert(r.getAs[Double]("treatment_target") == 10.0) // null y skipped by sum
    // assignBuckets drops null scores (QuantileDiscretizer handleInvalid=skip)
    val s = Seq[(java.lang.Double)](1.0, 2.0, 3.0, 4.0, null).toDF("score")
    assert(graft.ops.UpliftEval.assignBuckets(s, $"score", 2, exact = true).count() == 4)
  }

  test("rocCurve drops rows with null label or score listwise") {
    val d = Seq[(java.lang.Integer, java.lang.Double)](
      (1, 0.9), (0, 0.1), (null, 0.5), (1, null)
    ).toDF("label", "score")
    val roc = graft.ops.MlEval.rocCurve(d, $"label", $"score",
      thresholds = Seq(0.5)).head()
    assert(roc.getAs[Long]("tp") == 1 && roc.getAs[Long]("fp") == 0)
    assert(roc.getAs[Long]("tn") == 1 && roc.getAs[Long]("fn") == 0)
  }

  test("ngram LM drops null-text and sub-bigram docs from train and score") {
    val d = Seq[(Long, String)]((1L, "a b"), (2L, null), (3L, "a"))
      .toDF("id", "text")
    val m = graft.ops.NgramLm.train(d, $"text")
    // only doc 1 contributes bigrams; unigrams come from all non-null text
    assert(m.bigrams.count() == 1)
    val scored = graft.ops.NgramLm.scorePerplexity(d, $"id", $"text", m)
    assert(scored.select("doc_id").collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("robustMeans ignores null x everywhere (winsorized mean included)") {
    // least/greatest skip nulls, so an unguarded clip would count every
    // null-x row as the upper bound hi in the winsorized mean
    val d = Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0, 100.0, null, null)
      .toDF("x")
    val r = graft.ops.Robust.robustMeans(d, $"x", pLo = 0.2, pHi = 0.8,
      exact = true).head()
    val nn = graft.ops.Robust.robustMeans(d.na.drop(Seq("x")), $"x",
      pLo = 0.2, pHi = 0.8, exact = true).head()
    assert(r.getLong(0) == 5L)
    (1 to 7).foreach { i =>
      val (a, b) = (r.get(i), nn.get(i))
      assert(a == b, s"col $i: $a with nulls vs $b complete-case")
    }
  }
}
