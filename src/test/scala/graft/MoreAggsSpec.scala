package graft

import graft.agg.{KsMath, MannWhitneyMath}
import graft.ops.{GroupSet, RankTests}
import graft.stats.TtestCommon
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MoreAggsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  private lazy val rows: Seq[(Double, Int, String)] = {
    val rng = new scala.util.Random(31)
    (1 to 3000).map { i =>
      val t = i % 2
      // integer-ish values to force ties
      val v = math.floor((rng.nextGaussian() + (if (t == 1) 0.3 else 0.0)) * 4) / 2.0
      (v, t, if (rng.nextDouble() < 0.52) "a" else "b")
    }
  }
  private lazy val df = spark.createDataFrame(rows).toDF("v", "t", "g").repartition(4)

  test("srm chisq and p match local computation") {
    val r = df.select(functions.srm($"v" + 10.0, $"g", Seq(1.0, 1.0)).as("r")).select($"r.*").head()
    val sums = rows.groupBy(_._3).view.mapValues(_.map(_._1 + 10.0).sum).toMap
    val obs = Seq(sums("a"), sums("b"))
    val exp = obs.sum / 2
    val chisq = obs.map(o => (o - exp) * (o - exp) / exp).sum
    assert(approx(r.getAs[Double]("chisq"), chisq, 1e-9))
    val p = 1 - graft.stats.Dist.chiSqCdf(chisq, 1)
    assert(approx(r.getAs[Double]("p_value"), p, 1e-9))
    assert(r.getSeq[String](r.fieldIndex("groups")) == Seq("a", "b"))
  }

  test("pearson_corr matches commons-math r and t-dist p; nulls pairwise-dropped") {
    val withNulls = df
      .withColumn("x", when($"v" > -100, $"v"))
      .withColumn("y", when($"t" === 1 || $"v" < 1.5, $"v" * 0.7 + $"t"))
    val r = withNulls.select(functions.pearson_corr($"x", $"y").as("r"))
      .select($"r.*").head()
    // local reference: commons-math PearsonsCorrelation on the complete pairs
    val pairs = withNulls.select($"x", $"y").collect()
      .filter(row => !row.isNullAt(0) && !row.isNullAt(1))
      .map(row => (row.getDouble(0), row.getDouble(1)))
    val pc = new org.apache.commons.math3.stat.correlation.PearsonsCorrelation()
    val expR = pc.correlation(pairs.map(_._1), pairs.map(_._2))
    val dfree = pairs.length - 2.0
    val tStat = expR * math.sqrt(dfree) / math.sqrt(1 - expR * expR)
    val expP = 2 * (1 - new org.apache.commons.math3.distribution.TDistribution(dfree)
      .cumulativeProbability(math.abs(tStat)))
    assert(approx(r.getAs[Double]("r"), expR, 1e-9))
    assert(approx(r.getAs[Double]("p_value"), expP, 1e-9))
    // SQL names plan the same column
    withNulls.createOrReplaceTempView("pearson_fixture")
    GraftSql.register(spark)
    val viaSql = spark.sql(
      "SELECT pearsonr(x, y) AS a, pearson_corr(x, y) AS b FROM pearson_fixture").head()
    assert(approx(viaSql.getStruct(0).getAs[Double]("r"), expR, 1e-9))
    assert(approx(viaSql.getStruct(1).getAs[Double]("p_value"), expP, 1e-9))
    // degenerate inputs: n < 3 → null p (reference throws BAD_ARGUMENTS)
    val tiny = Seq((1.0, 2.0), (2.0, 4.0)).toDF("x", "y")
      .select(functions.pearson_corr($"x", $"y").as("r")).select($"r.*").head()
    assert(tiny.isNullAt(tiny.fieldIndex("p_value")))
    // perfectly collinear: r = 1 exactly, p = 0 (t → ∞)
    val exact = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0)).toDF("x", "y")
      .select(functions.pearson_corr($"x", $"y").as("r")).select($"r.*").head()
    assert(approx(exact.getAs[Double]("r"), 1.0, 1e-12))
    assert(exact.getAs[Double]("p_value") <= 1e-12)
  }

  test("mann-whitney agg matches scipy-convention local math with ties") {
    val r = df.select(functions.mann_whitney_utest($"v", $"t").as("r")).select($"r.*").head()
    val x0 = rows.filter(_._2 == 0).map(_._1).toArray
    val x1 = rows.filter(_._2 == 1).map(_._1).toArray
    val local = MannWhitneyMath.test(x0, x1, TtestCommon.TwoSided, continuity = true)
    assert(approx(r.getAs[Double]("u_statistic"), local.u_statistic, 1e-12))
    assert(approx(r.getAs[Double]("p_value"), local.p_value, 1e-12))
    // detectable shift → small p
    assert(local.p_value < 0.01)
  }

  test("distributed mann-whitney == collect-based aggregate") {
    val viaAgg = df.select(functions.mann_whitney_utest($"v", $"t").as("r")).select($"r.*").head()
    val viaRank = RankTests.mannWhitneyU(df, $"v", $"t")
    assert(approx(viaAgg.getAs[Double]("u_statistic"), viaRank.u_statistic, 1e-9))
    assert(approx(viaAgg.getAs[Double]("p_value"), viaRank.p_value, 1e-9))
  }

  test("wasserstein1: hand fixture, identical arms, layout invariance") {
    // arm0 = {0,1}, arm1 = {1,2}: pure shift by 1 -> W1 = 1
    val shifted = Seq((0.0, 0), (1.0, 0), (1.0, 1), (2.0, 1)).toDF("v", "t")
    assert(math.abs(RankTests.wasserstein1(shifted, $"v", $"t") - 1.0) < 1e-12)
    // identical arms -> 0
    val same = Seq((1.0, 0), (2.0, 0), (1.0, 1), (2.0, 1)).toDF("v", "t")
    assert(RankTests.wasserstein1(same, $"v", $"t") == 0.0)
    // layout invariance on a bigger frame (boundary stitching under test)
    val big = (1 to 5000).map(i => (((i * 7919) % 1000).toDouble, i % 2)).toDF("v", "t")
    val a = RankTests.wasserstein1(big, $"v", $"t")
    val b = RankTests.wasserstein1(big.repartition(17), $"v", $"t")
    assert(math.abs(a - b) < 1e-12, s"$a vs $b")
    // one empty arm -> NaN
    assert(RankTests.wasserstein1(Seq((1.0, 0)).toDF("v", "t"), $"v", $"t").isNaN)
  }

  test("quantileTreatmentEffect: interleaved-arm medians") {
    val df = (1 to 100).map(i => (i.toDouble, i % 2)).toDF("y", "t")
    val r = graft.ops.QuantileTest.quantileTreatmentEffect(df, $"y", $"t",
      probs = Seq(0.5), exact = true).head()
    assert(r.getDouble(0) == 0.5)
    assert(math.abs(r.getDouble(1) - 51.0) < 1e-9) // evens: 2..100
    assert(math.abs(r.getDouble(2) - 50.0) < 1e-9) // odds: 1..99
    assert(math.abs(r.getDouble(3) + 1.0) < 1e-9)
  }

  test("Drift: psi/js zero on identical groups, positive and bounded on shift") {
    val same = Seq((5.0, 0), (15.0, 0), (5.0, 1), (15.0, 1)).toDF("v", "g")
    assert(graft.ops.Drift.psi(same, $"v", $"g", Seq(10.0, 20.0)) == 0.0)
    assert(graft.ops.Drift.jensenShannon(same, $"v", $"g", Seq(10.0, 20.0)) == 0.0)
    val shifted = Seq((5.0, 0), (15.0, 0), (15.0, 1), (25.0, 1)).toDF("v", "g")
    val p = graft.ops.Drift.psi(shifted, $"v", $"g", Seq(10.0, 20.0))
    val j = graft.ops.Drift.jensenShannon(shifted, $"v", $"g", Seq(10.0, 20.0))
    assert(p > 1.0) // disjoint mass in bins 0 and 2 -> large PSI
    assert(j > 0.0 && j <= math.log(2.0) + 1e-12)
    intercept[IllegalArgumentException] {
      graft.ops.Drift.psi(same.filter($"g" === 0), $"v", $"g", Seq(10.0, 20.0))
    }
  }

  test("distributed ks p-value matches the aggregate at small n (exact path)") {
    val viaAgg = df.select(functions.kolmogorov_smirnov_test($"v", $"t").as("r"))
      .select($"r.*").head()
    val viaRank = RankTests.ksTest(df, $"v", $"t")
    assert(approx(viaAgg.getAs[Double]("d_statistic"), viaRank.d_statistic, 1e-12))
    assert(approx(viaAgg.getAs[Double]("p_value"), viaRank.p_value, 1e-12))
  }

  test("histogram aggregate fails fast above maxDistinct, naming the scale path") {
    val saved = graft.agg.TwoSampleHist.maxDistinct
    graft.agg.TwoSampleHist.maxDistinct = 100
    try {
      val d = spark.range(1000).select(
        $"id".cast("double").as("v"), ($"id" % 2).cast("int").as("t"))
      val e = intercept[Exception] {
        d.select(functions.mann_whitney_utest($"v", $"t")).head()
      }
      // the guard message survives Spark's task-failure wrapping
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("RankTests")), messages(e).toString)
    } finally graft.agg.TwoSampleHist.maxDistinct = saved
  }

  test("sql rank tests auto-route to the distributed path: 10M unique doubles") {
    // all-distinct continuous column — the histogram aggregate would need
    // a 10M-entry buffer per partition (it fails fast instead); the
    // gateway routes top-level SQL to RankTests, which has O(distinct)
    // SHUFFLE but constant executor state
    spark.range(10000000L).select(
      $"id".cast("double").as("v"), ($"id" % 2).cast("int").as("t"))
      .createOrReplaceTempView("mw_big")
    val r = GraftGateway.sql(spark, "SELECT mann_whitney_utest(v, t) FROM mw_big").head()
    // closed form: v = 0..N-1, group0 = even ids with ranks 1,3,..,N-1 →
    // R0 = n² , U2 = n·n − (n·n + n·(n+1)/2 − n²) = n²/... computed below
    val n = 5000000.0
    val u1 = n * n + n * (n + 1) / 2.0 - n * n
    val u2 = n * n - u1
    assert(r.getAs[Double]("u_statistic") == u2, r.toString)
    assert(r.getAs[Double]("p_value") > 0.9) // a 1-rank shift is no evidence
    val ks = GraftGateway.sql(spark, "SELECT kolmogorov_smirnov_test(v, t) FROM mw_big").head()
    // F1 and F2 interleave every other value: D = 1/n
    assert(approx(ks.getAs[Double]("d_statistic"), 1.0 / n, 1e-9), ks.toString)
  }

  test("ks agg: exact and asymptotic p-values behave, distributed matches D") {
    val r = df.select(functions.kolmogorov_smirnov_test($"v", $"t").as("r")).select($"r.*").head()
    val d = r.getAs[Double]("d_statistic")
    assert(d > 0 && d < 1)
    val viaRank = RankTests.ksTest(df, $"v", $"t")
    assert(approx(viaRank.d_statistic, d, 1e-9), s"${viaRank.d_statistic} vs $d")
    // asymptotic close to exact at n=1500/group
    val asymp = df.select(functions.kolmogorov_smirnov_test($"v", $"t", method = "asymp").as("r"))
      .select($"r.*").head().getAs[Double]("p_value")
    assert(math.abs(asymp - r.getAs[Double]("p_value")) < 0.05)
  }

  test("ks exact p matches known scipy value on small fixture") {
    // scipy.stats.ks_2samp([1,2,3,4], [1.5,2.5,3.5], method='exact') -> D=0.25, p=1.0
    val res = KsMath.test(Array(1, 2, 3, 4), Array(1.5, 2.5, 3.5), TtestCommon.TwoSided, "exact")
    assert(approx(res.d_statistic, 0.25, 1e-12))
    assert(approx(res.p_value, 1.0, 1e-9))
    // exhaustive-permutation ground truth: D=0.5, p = 3638/12870 = 0.2826728827
    val res2 = KsMath.test(Array(1, 2, 3, 4, 5, 6, 7, 8),
      Array(5, 6, 7, 8, 9, 10, 11, 12), TtestCommon.TwoSided, "exact")
    assert(approx(res2.d_statistic, 0.5, 1e-12))
    assert(math.abs(res2.p_value - 3638.0 / 12870.0) < 1e-9)
  }

  test("ks terminates and stays sane with infinite values") {
    // regression: the histogram walk used `vs(i) - anchor <= Tol` alone,
    // which with anchor = ±Inf never admits the anchor itself (NaN compare)
    // and spun forever; the old sorted co-walk handled Inf fine
    val x = Array(1.0, 2.0, 3.0, Double.PositiveInfinity)
    val y = Array(1.5, 2.5, Double.NegativeInfinity, 3.5)
    val res = KsMath.test(x, y, TtestCommon.TwoSided, "asymp")
    assert(res.d_statistic > 0 && res.d_statistic <= 1)
    assert(res.p_value >= 0 && res.p_value <= 1)
    // -Inf shifts sample-1's CDF up by 1/4 at the far left → D from a
    // hand-walk of the merged steps: sup|F1-F2| = 0.25 at the -Inf step,
    // then |1/4 - 1/4|, ... max gap is 0.25
    assert(approx(res.d_statistic, 0.25, 1e-12))
  }

  test("ks -0.0 and 0.0 are the same histogram key") {
    val res = KsMath.test(Array(-0.0, 1.0), Array(0.0, 1.0), TtestCommon.TwoSided, "exact")
    assert(res.d_statistic == 0.0)
    val mw = MannWhitneyMath.test(Array(-0.0, 1.0), Array(0.0, 1.0), TtestCommon.TwoSided, continuity = true)
    // perfectly tied samples → U = n1*n2/2
    assert(approx(mw.u_statistic, 2.0, 1e-12))
  }

  test("explicit exact method falls back to asymptotic beyond the cap") {
    // synthetic giant counts via the histogram directly — no O(n) memory
    val h = graft.agg.TwoSampleHist.empty
    h.m(0.0) = Array(100000L, 50000L)
    h.m(1.0) = Array(50000L, 100000L)
    val res = KsMath.testHist(h, TtestCommon.TwoSided, "exact")
    val asymp = KsMath.testHist(h, TtestCommon.TwoSided, "asymp")
    assert(res.d_statistic == asymp.d_statistic)
    assert(res.p_value == asymp.p_value) // did not attempt the O(n1*n2) recursion
  }

  test("matrix_multiplication returns XtX and its inverse") {
    def mat(row: org.apache.spark.sql.Row): collection.Seq[collection.Seq[Double]] =
      row.getAs[collection.Seq[collection.Seq[Double]]](0)
    val m = mat(df.select(functions.matrix_multiplication(Seq($"v", lit(1.0))).as("r"))
      .select($"r.*").head())
    val sxx = rows.map(r => r._1 * r._1).sum
    val sx = rows.map(_._1).sum
    assert(approx(m(0)(0), sxx, 1e-9) && approx(m(0)(1), sx, 1e-9) &&
      approx(m(1)(1), rows.length.toDouble, 1e-9))
    val inv = mat(df.select(functions.matrix_multiplication(Seq($"v", lit(1.0)), invert = true).as("r"))
      .select($"r.*").head())
    // inv * m == I
    val prod00 = inv(0)(0) * m(0)(0) + inv(0)(1) * m(1)(0)
    val prod01 = inv(0)(0) * m(0)(1) + inv(0)(1) * m(1)(1)
    assert(approx(prod00, 1.0, 1e-9) && math.abs(prod01) < 1e-9)
  }

  test("group_set one-pass stats match per-column groupBy") {
    val d2 = df.withColumn("g2", ($"v" > 0).cast("string"))
    val gs = GroupSet.groupSet(d2, $"v", $"t", Seq("g" -> $"g", "g2" -> $"g2"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    val direct = d2.groupBy($"t", $"g").agg(count(lit(1)).as("c"), sum($"v").as("s"))
      .collect()
    direct.foreach { r =>
      val key = (r.getInt(0).toLong, "g", r.getString(1))
      val (c, sv) = gs(key)
      assert(c == r.getLong(2) && approx(sv, r.getDouble(3), 1e-9))
    }
  }

  test("xexpt avg-metric matches plain CUPED ratio ttest direction and is finite") {
    val rng = new scala.util.Random(91)
    val expt = (1 to 8000).map { i =>
      val uin = i.toLong
      val tr = i % 2
      val den = 1.0
      val denPre = 1.0
      val numPre = 5.0 + rng.nextGaussian()
      val num = numPre * 0.8 + 0.05 * tr + rng.nextGaussian() * 0.3
      (uin, tr, num, den, numPre, denPre)
    }
    val d = spark.createDataFrame(expt).toDF("uin", "t", "num", "den", "num_pre", "den_pre")
    val r = d.select(functions.xexpt_ttest_2samp($"uin", $"t",
      Seq($"num", $"den", $"num_pre", $"den_pre"), cuped = "x3/x4").as("r"))
      .select($"r.*").head()
    assert(r.getAs[Long]("groupname0") == 0 && r.getAs[Long]("groupname1") == 1)
    assert(r.getAs[Double]("denominator0") == 4000.0)
    assert(r.getAs[Double]("diff") > 0)
    assert(r.getAs[Double]("p_value") >= 0 && r.getAs[Double]("p_value") <= 1)
    assert(r.getAs[Double]("power") > 0 && r.getAs[Double]("power") <= 1)
    assert(r.getAs[Double]("recommend_samples") > 0)
    // CUPED xexpt should be more sensitive than non-CUPED
    val r2 = d.select(functions.xexpt_ttest_2samp($"uin", $"t", Seq($"num", $"den")).as("r"))
      .select($"r.*").head()
    assert(r.getAs[Double]("p_value") <= r2.getAs[Double]("p_value"))
  }

  test("xexpt sum-metric runs with ratios") {
    val rng = new scala.util.Random(17)
    val expt = (1 to 4000).map { i =>
      (i.toLong, i % 2, 2.0 + rng.nextGaussian() * 0.5, 1.0)
    }
    val d = spark.createDataFrame(expt).toDF("uin", "t", "num", "den")
    val r = d.select(functions.xexpt_ttest_2samp($"uin", $"t", Seq($"num", $"den"),
      metricType = "sum", ratios = (1.0, 1.0)).as("r")).select($"r.*").head()
    assert(!r.getAs[Double]("t_statistic").isNaN)
    assert(r.getAs[Double]("denominator0") == 1.0) // ratio echoed for sum metric
  }
}
