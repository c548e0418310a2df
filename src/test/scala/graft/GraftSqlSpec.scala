package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftSqlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val setup: Unit = {
    GraftSql.register(spark)
    val rng = new scala.util.Random(41)
    (1 to 4000).map { i =>
      val t = i % 2
      val x = rng.nextGaussian()
      val y = 1.0 + 0.5 * t + 2.0 * x + rng.nextGaussian()
      (y, t, x, i.toLong)
    }.toDF("y", "t", "x", "uin").createOrReplaceTempView("exp_data")
  }

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("sql ttest_2samp matches the DSL result") {
    setup
    val sqlRow = spark.sql(
      "SELECT ttest_2samp('x1', 'two-sided', t, y) AS r FROM exp_data")
      .select($"r.estimate", $"r.p_value").head()
    val dslRow = spark.table("exp_data")
      .select(functions.ttest_2samp("x1", $"t")($"y").as("r"))
      .select($"r.estimate", $"r.p_value").head()
    assert(approx(sqlRow.getDouble(0), dslRow.getDouble(0)))
    assert(approx(sqlRow.getDouble(1), dslRow.getDouble(1)))
  }

  test("sql delta_method and ols run and agree with DSL") {
    setup
    val dm = spark.sql(
      "SELECT delta_method('x1/x2', false, y, x) AS v FROM exp_data").head().getDouble(0)
    val dmDsl = spark.table("exp_data")
      .select(functions.delta_method("x1/x2", isStd = false, Seq($"y", $"x")).as("v"))
      .head().getDouble(0)
    assert(approx(dm, dmDsl))
    val coef = spark.sql("SELECT ols(y, t, x) AS m FROM exp_data")
      .select(element_at($"m.coefficients", 1), element_at($"m.coefficients", 2)).head()
    assert(approx(coef.getDouble(0), 0.5, 0.15) || math.abs(coef.getDouble(0) - 0.5) < 0.15)
    assert(math.abs(coef.getDouble(1) - 2.0) < 0.1)
  }

  test("sql group-by usage: ttest per group") {
    setup
    val rows = spark.sql(
      """SELECT t % 2 AS g, delta_method('x1', false, y) AS v
        |FROM exp_data GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(rows.length == 2 && rows.forall(_.getDouble(1) > 0))
  }

  test("scalar math and vector sql functions") {
    setup
    val r = spark.sql(
      """SELECT cdf(1.96, 1000.0) AS c, cdf_norm(1.96) AS n, erf(1.0) AS e,
        |  l2_norm(array(3.0, 4.0)) AS l2,
        |  cosine_similarity(array(1.0, 0.0), array(1.0, 0.0)) AS cs,
        |  l2_distance(array(0.0, 0.0), array(3.0, 4.0)) AS d2,
        |  lp_norm(array(1.0, 1.0), 2.0) AS lp
        |FROM (SELECT 1)""".stripMargin).head()
    assert(math.abs(r.getAs[Double]("c") - 0.975) < 0.001)
    assert(math.abs(r.getAs[Double]("n") - 0.975) < 0.001)
    assert(math.abs(r.getAs[Double]("e") - 0.8427) < 0.001)
    assert(approx(r.getAs[Double]("l2"), 5.0))
    assert(approx(r.getAs[Double]("cs"), 1.0))
    assert(approx(r.getAs[Double]("d2"), 5.0))
    assert(approx(r.getAs[Double]("lp"), math.sqrt(2.0)))
  }

  test("text sql functions") {
    setup
    val r = spark.sql(
      """SELECT token_count('hello world x=1') AS tc,
        |  lang_id('the cat and the dog is in the house for a while') AS l,
        |  ngram_jaccard('a b c d', 'b c d e', 2) AS j,
        |  content_fingerprint('  Hello   World ') = content_fingerprint('hello world') AS same
        |FROM (SELECT 1)""".stripMargin).head()
    assert(r.getAs[Int]("tc") == 5)
    assert(r.getAs[String]("l") == "en")
    assert(approx(r.getAs[Double]("j"), 0.5))
    assert(r.getAs[Boolean]("same"))
  }

  test("ttests2Samp: one pass, one struct per alpha, nested CIs") {
    setup
    val cols = functions.ttests2Samp("avg(y)", $"t", alphas = Seq(0.05, 0.01))
    val row = spark.table("exp_data").select(cols: _*).head()
    val r5 = row.getStruct(0); val r1 = row.getStruct(1)
    assert(approx(r5.getAs[Double]("estimate"), r1.getAs[Double]("estimate")))
    // 99% CI strictly wider than 95% CI
    assert(r1.getAs[Double]("lower") < r5.getAs[Double]("lower"))
    assert(r1.getAs[Double]("upper") > r5.getAs[Double]("upper"))
  }

  test("vector distance/normalize sql functions") {
    setup
    val r = spark.sql(
      """SELECT l1_distance(array(1.0D, 2.0D), array(3.0D, 0.0D)) AS d1,
        |  linf_distance(array(1.0D, 2.0D), array(3.0D, 0.0D)) AS di,
        |  l2_squared_distance(array(0.0D), array(3.0D)) AS d2s,
        |  l2_normalize(array(3.0D, 4.0D)) AS n2,
        |  l1_normalize(array(1.0D, 3.0D)) AS n1,
        |  lp_distance(array(1.0D, 2.0D), array(4.0D, 6.0D), 2.0) AS dp,
        |  linf_normalize(array(2.0D, -4.0D)) AS ni,
        |  lp_normalize(array(3.0D, 4.0D), 2.0) AS np
        |FROM (SELECT 1)""".stripMargin).head()
    assert(approx(r.getAs[Double]("d1"), 4.0))
    assert(approx(r.getAs[Double]("di"), 2.0))
    assert(approx(r.getAs[Double]("d2s"), 9.0))
    assert(r.getSeq[Double](3).zip(Seq(0.6, 0.8)).forall { case (a, b) => approx(a, b) })
    assert(r.getSeq[Double](4).zip(Seq(0.25, 0.75)).forall { case (a, b) => approx(a, b) })
    assert(approx(r.getAs[Double]("dp"), 5.0))
    assert(r.getSeq[Double](6).zip(Seq(0.5, -1.0)).forall { case (a, b) => approx(a, b) })
    assert(r.getSeq[Double](7).zip(Seq(0.6, 0.8)).forall { case (a, b) => approx(a, b) })
  }

  test("srm over sql with ratio literals") {
    setup
    val r = spark.sql(
      "SELECT srm(y, CAST(t AS STRING), array(1.0, 1.0)) AS r FROM exp_data")
      .select($"r.chisq", $"r.p_value").head()
    assert(r.getDouble(0) >= 0 && r.getDouble(1) <= 1.0)
  }

  test("ttest_2samp_pse and ttests_2samp sql names") {
    setup
    val pse = spark.sql(
      "SELECT ttest_2samp_pse('x1', 'two-sided', t, CAST((uin DIV 2) % 4 AS BIGINT), y) AS r FROM exp_data")
      .select($"r.estimate", $"r.p_value").head()
    assert(!pse.getDouble(0).isNaN && pse.getDouble(1) <= 1.0)
    val multi = spark.sql(
      "SELECT ttests_2samp('x1', 'two-sided', array(0.05, 0.01), t, y) AS rs FROM exp_data")
      .selectExpr("rs[0].estimate AS e05", "rs[0].lower AS l05",
        "rs[1].lower AS l01").head()
    assert(approx(multi.getDouble(0), 0.5, 0.2))
    assert(multi.getDouble(2) < multi.getDouble(1), "99% CI wider than 95%")
    // ratio metric must NOT be mangled to its numerator: the ttests_2samp
    // estimate for 'x3/x4' must equal the single-test ttest_2samp estimate
    val ratioMulti = spark.sql(
      "SELECT ttests_2samp('x1/x2', 'two-sided', array(0.05), t, y, x) AS rs FROM exp_data")
      .selectExpr("rs[0].estimate AS e").head().getDouble(0)
    val ratioSingle = spark.sql(
      "SELECT ttest_2samp('x1/x2', 'two-sided', t, y, x) AS r FROM exp_data")
      .selectExpr("r.estimate").head().getDouble(0)
    assert(ratioMulti == ratioSingle,
      s"ratio metric mangled: $ratioMulti vs $ratioSingle")
    // per-test mu list: estimate and t shift by mu, stderr invariant
    val mu = spark.sql(
      "SELECT ttests_2samp('x1', 'two-sided', array(0.05, 0.05), array(0.0, 0.3), t, y) AS rs FROM exp_data")
      .selectExpr("rs[0].estimate AS e0", "rs[1].estimate AS em",
        "rs[0].stderr AS s0", "rs[1].stderr AS sm").head()
    assert(approx(mu.getDouble(1), mu.getDouble(0) - 0.3, 1e-12))
    assert(mu.getDouble(2) == mu.getDouble(3))
    // mismatched mu length names itself
    val eMu = intercept[Exception] {
      spark.sql(
        "SELECT ttests_2samp('x1', 'two-sided', array(0.05, 0.01), array(0.0), t, y) AS rs FROM exp_data")
        .head()
    }
    assert(eMu.getMessage.contains("mus"), eMu.getMessage)
    // a NON-foldable array in the mus slot (array(col)) must raise the
    // named literal-array error, not silently route into the treatment slot
    val eFold = intercept[Exception] {
      spark.sql(
        "SELECT ttests_2samp('x1', 'two-sided', array(0.05), array(y), t, y) AS rs FROM exp_data")
        .head()
    }
    assert(eFold.getMessage.contains("literal array"), eFold.getMessage)
  }

  test("xexpt cuped and sum-metric sql names run") {
    setup
    val c = spark.sql(
      """SELECT xexpt_ttest_2samp_cuped('x3/x4', uin, t, y, 1.0 + x - x, x, 1.0 + x - x) AS r
        |FROM exp_data""".stripMargin).select($"r.mean0", $"r.p_value").head()
    assert(!c.getDouble(0).isNaN)
    val s = spark.sql(
      "SELECT xexpt_ttest_2samp_sum(uin, t, y, 1.0 + x - x, 1.0, 1.0) AS r FROM exp_data")
      .select($"r.mean0").head()
    assert(!s.getDouble(0).isNaN)
  }

  test("gateway verbs: lift, matching, dml, iv, cut_bins dispatch; passthrough works") {
    setup
    val lift = GraftGateway.sql(spark, "SELECT lift(x, y, t, 10) FROM exp_data")
    assert(lift.columns.toSeq == Seq("ratio", "lift", "gain", "ate", "random_gain"))
    assert(lift.count() == 10)
    val m = GraftGateway.sql(spark,
      "SELECT exact_matching(t, CAST(uin % 3 AS STRING)) FROM exp_data")
    assert(m.columns.contains("matching_index"))
    assert(m.filter($"matching_index" > 0).count() > 0)
    val dml = GraftGateway.sql(spark, "SELECT linear_dml(y, t, x) FROM exp_data").head()
    assert(math.abs(dml.getAs[Double]("ate") - 0.5) < 0.2, dml.toString)
    val iv = GraftGateway.sql(spark,
      "SELECT iv_regression(y, t, t) FROM exp_data WHERE uin > 0")
    assert(iv.columns.toSeq ==
      Seq("term", "estimate", "stderr", "t_value", "p_value"))
    val bins = GraftGateway.sql(spark, "SELECT cut_bins(x, 4) FROM exp_data")
    assert(bins.columns.contains("x_bin"))
    // non-verb query passes through to spark.sql untouched
    val pass = GraftGateway.sql(spark, "SELECT count(*) AS n FROM exp_data").head()
    assert(pass.getLong(0) == 4000L)
  }

  test("gateway verbs: kaplan_meier, log_rank_test, aipw dispatch") {
    setup
    val km = GraftGateway.sql(spark,
      "SELECT kaplan_meier(CAST(uin % 5 AS INT), CAST(uin % 2 AS INT)) FROM exp_data")
    assert(km.columns.toSeq ==
      Seq("time", "n_risk", "n_event", "n_censored", "survival"))
    assert(km.count() == 5)
    val kmg = GraftGateway.sql(spark,
      "SELECT kaplan_meier(CAST(uin % 5 AS INT), CAST(uin % 2 AS INT), t) FROM exp_data")
    assert(kmg.columns.head == "group" && kmg.count() == 10)
    val lr = GraftGateway.sql(spark,
      "SELECT log_rank_test(t, CAST(uin % 5 AS INT), CAST(uin % 2 AS INT)) FROM exp_data")
      .head()
    assert(lr.getDouble(4) >= 0.0 && lr.getDouble(4) <= 1.0) // p_value
    val aipw = GraftGateway.sql(spark,
      "SELECT aipw(y, t, 0.5 + 0.0 * x, y - y, y - y, 50) FROM exp_data").head()
    assert(!aipw.getAs[Double]("estimate").isNaN)
  }

  test("gateway verbs: robust_means, wasserstein, psi, calibration, ess, qte") {
    setup
    val rm = GraftGateway.sql(spark,
      "SELECT robust_means(y, 0.1, 0.9) FROM exp_data").head()
    assert(rm.schema.fieldNames.contains("winsorized_mean"))
    val w = GraftGateway.sql(spark,
      "SELECT wasserstein(y, t) FROM exp_data").head().getDouble(0)
    assert(w >= 0.0 && !w.isNaN)
    val p = GraftGateway.sql(spark,
      "SELECT psi(y, t, -1.0, 0.0, 1.0) FROM exp_data")
    assert(p.columns.contains("psi_term") && p.count() >= 2)
    val cal = GraftGateway.sql(spark,
      "SELECT calibration(t, 0.5 + 0.0 * y, 4) FROM exp_data")
    assert(cal.columns.contains("ece") && cal.count() == 1)
    val ess = GraftGateway.sql(spark,
      "SELECT weighted_mean_ess(y, 1.0 + x - x) FROM exp_data").head()
    assert(math.abs(ess.getAs[Double]("design_effect") - 1.0) < 1e-9)
    val qte = GraftGateway.sql(spark,
      "SELECT qte(y, t, 0.25, 0.75) FROM exp_data")
    assert(qte.count() == 2)
  }

  test("GraftExtensions injects the sql surface into a fresh session") {
    setup
    // newSession() has a FRESH temp-function registry — GraftSql.register
    // was never called on it, so resolution can only come from the
    // spark.sql.extensions=graft.GraftExtensions injection
    val s2 = spark.newSession()
    val r = s2.sql("SELECT erf(0.5) AS e, cdf(1.96, 1e9) AS c").head()
    assert(approx(r.getDouble(0), org.apache.commons.math3.special.Erf.erf(0.5), 1e-12))
    assert(approx(r.getDouble(1), 0.975, 1e-3))
    s2.range(10).selectExpr("CAST(id AS DOUBLE) AS y", "CAST(id % 2 AS INT) AS t")
      .createOrReplaceTempView("tiny")
    val tt = s2.sql("SELECT welch_ttest(y, t) AS r FROM tiny").select("r.statistic").head()
    assert(!tt.getDouble(0).isNaN)
  }

  test("student/welch/mean_z sql names match the ops closed forms") {
    setup
    val d = spark.table("exp_data")
    val s = spark.sql("SELECT student_ttest(y, t) AS r FROM exp_data")
      .select($"r.statistic", $"r.p_value").head()
    val sRef = graft.ops.SimpleTests.studentTtest(d, $"y", $"t")
    assert(approx(s.getDouble(0), sRef.statistic, 1e-9))
    assert(approx(s.getDouble(1), sRef.p_value, 1e-9))
    val w = spark.sql("SELECT welch_ttest(y, t) AS r FROM exp_data")
      .select($"r.statistic", $"r.p_value").head()
    val wRef = graft.ops.SimpleTests.welchTtest(d, $"y", $"t")
    assert(approx(w.getDouble(0), wRef.statistic, 1e-9))
    assert(approx(w.getDouble(1), wRef.p_value, 1e-9))
    val z = spark.sql("SELECT mean_z_test(y, t, 1.0, 1.0) AS r FROM exp_data")
      .select($"r.statistic", $"r.p_value").head()
    val zRef = graft.ops.SimpleTests.meanZTest(d, $"y", $"t", 1.0, 1.0)
    assert(approx(z.getDouble(0), zRef.statistic, 1e-9))
    assert(approx(z.getDouble(1), zRef.p_value, 1e-9))
  }

  test("eval_ml_method predicts from a stored coefficient array") {
    setup
    val d = spark.table("exp_data")
    val m = graft.ops.Regression.fitOls(d, $"y", Seq($"x", $"t"))
    // predict via SQL with the model row cross-joined in
    Seq(Tuple1(m.coefficients)).toDF("coef").createOrReplaceTempView("model")
    val preds = spark.sql(
      "SELECT eval_ml_method(coef, x, t) AS yhat, x, t FROM exp_data CROSS JOIN model")
      .limit(5).collect()
    preds.foreach { r =>
      val expect = m.coefficients(0) * r.getDouble(1) +
        m.coefficients(1) * r.getInt(2) + m.coefficients(2)
      assert(approx(r.getDouble(0), expect, 1e-9))
    }
    // logistic variant is the sigmoid of the same linear predictor
    val lg = spark.sql(
      "SELECT eval_ml_method_logistic(array(1.0d, 0.0d), x) AS p, x FROM exp_data")
      .limit(3).collect()
    lg.foreach(r => assert(approx(r.getDouble(0),
      1.0 / (1.0 + math.exp(-r.getDouble(1))), 1e-9)))
  }

  test("ols_train/wls_train compose with eval_ml_method in pure SQL") {
    setup
    val d = spark.table("exp_data")
    val m = graft.ops.Regression.fitOls(d, $"y", Seq($"x", $"t"))
    // one statement: train in a scalar subquery, eval per row
    val preds = spark.sql(
      """SELECT eval_ml_method((SELECT ols_train(y, x, t) FROM exp_data),
        |  x, t) AS yhat, x, t FROM exp_data""".stripMargin)
      .limit(5).collect()
    preds.foreach { r =>
      val expect = m.coefficients(0) * r.getDouble(1) +
        m.coefficients(1) * r.getInt(2) + m.coefficients(2)
      assert(approx(r.getDouble(0), expect, 1e-9))
    }
    // wls_train with unit weights is the same fit
    val w = spark.sql(
      "SELECT wls_train(y, 1.0, x, t) AS c FROM exp_data").head()
      .getSeq[Double](0)
    m.coefficients.zip(w).foreach { case (a, b) => assert(approx(a, b, 1e-9)) }
  }

  test("eval_ml_method dispatches a stored model path: ols and forest") {
    setup
    val d = spark.table("exp_data")
    val scratch = java.nio.file.Files.createTempDirectory("graft_evalml").toString
    // stored OLS: SQL-by-path prediction equals the in-process predict column
    val ols = graft.ops.Regression.fitOls(d, $"y", Seq($"x", $"t"))
    graft.ops.ModelIo.saveOls(spark, ols, s"$scratch/ols")
    GraftSql.clearModelCache()
    val rows = spark.sql(
      s"SELECT eval_ml_method('$scratch/ols', x, t) AS yhat, x, t FROM exp_data")
      .limit(5).collect()
    rows.foreach { r =>
      val expect = ols.coefficients(0) * r.getDouble(1) +
        ols.coefficients(1) * r.getInt(2) + ols.coefficients(2)
      assert(approx(r.getDouble(0), expect, 1e-9))
    }
    // stored forest: SQL-by-path scoring equals Model.score's effect column
    val fdf = d.withColumn("seg", ($"uin" % 2).cast("double"))
      .withColumn("yy", $"y" + $"t" * (lit(1.0) + lit(3.0) * $"seg"))
    val forest = graft.ops.CausalForest.fit(fdf, $"yy", $"t",
      Seq("x" -> $"x", "seg" -> $"seg"), numTrees = 4, maxDepth = 2,
      minNodeSize = 20, bins = 20)
    graft.ops.ModelIo.saveCausalForest(spark, forest, s"$scratch/forest")
    GraftSql.clearModelCache()
    fdf.createOrReplaceTempView("forest_eval_in")
    val viaSql = spark.sql(
      s"SELECT uin, eval_ml_method('$scratch/forest', x, seg) AS eff FROM forest_eval_in")
    val viaScala = forest.score(fdf, Seq($"x", $"seg"), "eff2", "se2")
      .select($"uin", $"eff2")
    val joined = viaSql.join(viaScala, "uin")
      .select(max(abs($"eff" - $"eff2"))).head().getDouble(0)
    assert(joined <= 1e-9, s"sql vs scala forest scoring diverge by $joined")
    // wrong feature arity and not-a-model both name themselves
    val eArity = intercept[Exception] {
      spark.sql(s"SELECT eval_ml_method('$scratch/forest', x) AS e FROM forest_eval_in").head()
    }
    assert(eArity.getMessage.contains("feature"), eArity.getMessage)
    d.select($"x").write.mode("overwrite").parquet(s"$scratch/notamodel")
    val eModel = intercept[Exception] {
      spark.sql(s"SELECT eval_ml_method('$scratch/notamodel', x) AS e FROM exp_data").head()
    }
    assert(eModel.getMessage.contains("not a stored graft model"), eModel.getMessage)
  }

  test("gateway verbs: group_set, boot_strap, permutation") {
    setup
    val gs = GraftGateway.sql(spark,
      "SELECT group_set(y, t, CAST(uin % 3 AS STRING)) FROM exp_data")
    assert(gs.columns.toSeq ==
      Seq("treatment", "col_name", "col_value", "cnt", "sum_y", "sum_y2"))
    assert(gs.count() == 6) // 2 treatments x 3 group values
    val bs = GraftGateway.sql(spark, "SELECT boot_strap(avg(y), 50) FROM exp_data")
    assert(bs.columns.toSeq == Seq("rep", "stat") && bs.count() == 50)
    val overall = spark.table("exp_data").agg(avg($"y")).head().getDouble(0)
    val bsm = bs.agg(avg($"stat")).head().getDouble(0)
    assert(approx(bsm, overall, 0.1), s"bootstrap mean $bsm vs $overall")
    val perm = GraftGateway.sql(spark,
      "SELECT permutation(y, t, 200) FROM exp_data").head()
    assert(perm.getDouble(1) < 0.05, "true effect should reject under permutation")
  }

  test("gateway verbs compose with joins, CTEs, and subqueries") {
    setup
    // verb over a JOIN (the old regex gateway could only see one table)
    spark.range(3).selectExpr("id AS grp", "CAST(id AS DOUBLE) / 10 AS bump")
      .createOrReplaceTempView("dims")
    val j = GraftGateway.sql(spark,
      """SELECT lift(x + bump, y, t, 5)
        |FROM exp_data JOIN dims ON uin % 3 = grp""".stripMargin)
    assert(j.columns.toSeq == Seq("ratio", "lift", "gain", "ate", "random_gain"))
    assert(j.count() == 5)
    // verb whose input is a CTE
    val cte = GraftGateway.sql(spark,
      """WITH filtered AS (SELECT * FROM exp_data WHERE uin <= 2000)
        |SELECT linear_dml(y, t, x) FROM filtered""".stripMargin).head()
    assert(math.abs(cte.getAs[Double]("ate") - 0.5) < 0.3, cte.toString)
    // verb over an inline subquery
    val sub = GraftGateway.sql(spark,
      "SELECT boot_strap(avg(y), 20) FROM (SELECT * FROM exp_data WHERE t = 1)")
    assert(sub.count() == 20)
    // a WITH query with NO verb still falls through to spark.sql
    val plain = GraftGateway.sql(spark,
      "WITH c AS (SELECT count(*) AS n FROM exp_data) SELECT n FROM c").head()
    assert(plain.getLong(0) == 4000L)
  }

  test("summary verbs compose beside other top-level projections") {
    setup
    // verb result (1 covariate row) splices in beside global aggregates
    val r = GraftGateway.sql(spark,
      "SELECT count(*) AS n, avg(y) AS my, smd(t, x) FROM exp_data")
    assert(r.columns.toSeq == Seq("n", "my", "covariate", "smd"))
    val row = r.head()
    assert(row.getAs[Long]("n") == 4000L)
    assert(!row.getAs[Double]("smd").isNaN)
    // verb first: its columns lead the output
    val r2 = GraftGateway.sql(spark,
      "SELECT linear_dml(y, t, x), count(*) AS n FROM exp_data")
    assert(r2.columns.toSeq == Seq("ate", "stderr", "p_value", "n"))
    // CTE input still wraps, and a name collision suffixes the verb column
    val r3 = GraftGateway.sql(spark,
      """WITH f AS (SELECT * FROM exp_data WHERE uin <= 2000)
        |SELECT avg(x) AS smd, smd(t, x) FROM f""".stripMargin)
    assert(r3.columns.toSeq == Seq("smd", "covariate", "smd_smd"))
    // table-transform verbs beside others rewrite as transform-then-project
    // (SqlForward.java:86-215's CTE scaffolding semantics)
    val tp = GraftGateway.sql(spark,
      "SELECT uin, exact_matching(t, CAST(uin % 3 AS STRING)), y FROM exp_data")
    assert(tp.columns.toSeq == Seq("uin", "matching_index", "y"))
    assert(tp.count() == 4000L)
    assert(tp.filter(tp("matching_index") > 0).count() > 0)
    val tb = GraftGateway.sql(spark, "SELECT cut_bins(x, 4), uin FROM exp_data")
    assert(tb.columns.toSeq == Seq("x_bin", "uin"))
    // transform verb + sibling projections under a CTE: the CTE wraps the
    // verb input, then the projection resolves over the transformed frame
    val tcte = GraftGateway.sql(spark,
      """WITH f AS (SELECT * FROM exp_data WHERE uin <= 2000)
        |SELECT uin, cut_bins(x, 4) FROM f""".stripMargin)
    assert(tcte.columns.toSeq == Seq("uin", "x_bin"))
    assert(tcte.count() == 2000L)
    // a summary verb beside PER-ROW projections is an undefined N×M cross
    // product — the guard names it instead of silently exploding
    val e = intercept[IllegalArgumentException] {
      GraftGateway.sql(spark, "SELECT uin, smd(t, x) FROM exp_data")
    }
    assert(e.getMessage.contains("global aggregates"))
    // negative numeric literal arguments parse (UnaryMinus at parse time)
    val perm = GraftGateway.sql(spark,
      "SELECT permutation(y, t, 50, -0.02, 'abs') FROM exp_data").head()
    assert(!perm.getDouble(1).isNaN)
  }

  test("mann_whitney_u_test starrocks spelling aliases the utest name") {
    setup
    val a = spark.sql("SELECT mann_whitney_u_test(y, t) AS r FROM exp_data")
      .selectExpr("r.u_statistic").head().getDouble(0)
    val b = spark.sql("SELECT mann_whitney_utest(y, t) AS r FROM exp_data")
      .selectExpr("r.u_statistic").head().getDouble(0)
    assert(a == b)
  }

  test("any_min / any_max sql names are min_by / max_by") {
    setup
    val r = spark.sql(
      "SELECT any_min(uin, y) AS am, any_max(uin, y) AS ax FROM exp_data").head()
    val expect = spark.sql(
      "SELECT min_by(uin, y) AS am, max_by(uin, y) AS ax FROM exp_data").head()
    assert(r.getLong(0) == expect.getLong(0) && r.getLong(1) == expect.getLong(1))
  }

  test("gateway verbs: did, nonparam_dml, quantile_test_bucket") {
    setup
    val did = GraftGateway.sql(spark,
      "SELECT did(y, t, CAST(uin % 2 AS DOUBLE)) FROM exp_data")
    assert(did.columns.toSeq == Seq("term", "estimate", "stderr", "t_value", "p_value"))
    val terms = did.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(terms.keySet == Set("treatment", "time", "treatment:time", "(intercept)"))
    // y has a pure treatment effect of 0.5 and no time/interaction structure
    assert(math.abs(terms("treatment") - 0.5) < 0.3, terms.toString)
    assert(math.abs(terms("treatment:time")) < 0.3, terms.toString)
    val np = GraftGateway.sql(spark,
      "SELECT nonparam_dml(y, t, x) FROM exp_data").head()
    assert(math.abs(np.getAs[Double]("ate") - 0.5) < 0.2, np.toString)
    val qt = GraftGateway.sql(spark,
      "SELECT quantile_test_bucket(y, t, uin % 8, 0.25, 0.75) FROM exp_data")
    assert(qt.count() == 2)
    assert(qt.columns.contains("percentile") && qt.columns.contains("diff"))
  }

  test("gateway verbs: text-pipeline ops reach SQL (tfidf, perplexity, dedup, diff, conformal)") {
    setup
    val docs = Seq((1L, "a b a"), (2L, "a c"), (3L, "b b b"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("g_docs")
    val tf = GraftGateway.sql(spark, "SELECT tfidf(doc_id, text, 1) FROM g_docs")
    assert(tf.count() == 3 && tf.columns.contains("bm25"))
    val p = GraftGateway.sql(spark, "SELECT perplexity(doc_id, text) FROM g_docs")
    assert(p.count() == 3 && p.columns.contains("perplexity"))
    Seq((10L, "A  B a")).toDF("doc_id", "text") // normalizes equal to doc 1
      .createOrReplaceTempView("g_hist_t")
    val nd = GraftGateway.sql(spark,
      "SELECT incremental_dedup(text, 'g_hist_t') FROM g_docs")
    assert(nd.select("doc_id").collect().map(_.getLong(0)).toSet == Set(2L, 3L))
    Seq((1L, "a b a"), (2L, "a c CHANGED"), (4L, "new doc"))
      .toDF("doc_id", "text").createOrReplaceTempView("g_new_t")
    val sd = GraftGateway.sql(spark,
        "SELECT snapshot_diff(doc_id, text, 'g_new_t') FROM g_docs")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sd == Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "added"), sd.toString)
    // conformal_interval is a TRANSFORM: band columns on every input row
    val ci = GraftGateway.sql(spark,
      "SELECT conformal_interval(y, uin % 2 = 0, x, 0.1) FROM exp_data")
    assert(ci.count() == 4000)
    assert(Seq("fit", "lower", "upper").forall(ci.columns.contains))
    val cov = ci.agg(avg(($"y" >= $"lower" && $"y" <= $"upper")
      .cast("double"))).head().getDouble(0)
    assert(cov > 0.85 && cov < 0.95, s"coverage $cov")
  }

  test("models round-trip through tables (ModelIo)") {
    setup
    val dir = java.nio.file.Files.createTempDirectory("graft_models").toString
    val d = spark.table("exp_data")
    val ols = graft.ops.Regression.fitOls(d, $"y", Seq($"x", $"t"))
    graft.ops.ModelIo.saveOls(spark, ols, s"$dir/ols")
    val ols2 = graft.ops.ModelIo.loadOls(spark, s"$dir/ols")
    assert(ols2.coefficients.toSeq == ols.coefficients.toSeq)
    assert(ols2.xtxInv.map(_.toSeq).toSeq == ols.xtxInv.map(_.toSeq).toSeq)

    val lf = graft.ops.MlWrappers.logisticIrls(
      d.withColumn("yb", ($"y" > 1.0).cast("double")), $"yb", Seq($"x"))
    graft.ops.ModelIo.saveLogistic(spark, lf, s"$dir/logit")
    val lf2 = graft.ops.ModelIo.loadLogistic(spark, s"$dir/logit")
    assert(lf2.coefficients.toSeq == lf.coefficients.toSeq &&
      lf2.intercept == lf.intercept && lf2.stderr.toSeq == lf.stderr.toSeq)

    val forest = graft.ops.CausalForest.fit(d, $"y", $"t",
      Seq("x" -> $"x"), numTrees = 3, maxDepth = 2, minNodeSize = 100, bins = 8)
    graft.ops.ModelIo.saveCausalForest(spark, forest, s"$dir/forest")
    val forest2 = graft.ops.ModelIo.loadCausalForest(spark, s"$dir/forest")
    assert(forest2.numTrees == forest.numTrees)
    assert(forest2.variableImportance.toSeq == forest.variableImportance.toSeq)
    val probe = Seq(0.5, -0.5).toDF("x")
    val e1 = probe.select(forest.effectColumn(Seq($"x"))).collect().map(_.getDouble(0))
    val e2 = probe.select(forest2.effectColumn(Seq($"x"))).collect().map(_.getDouble(0))
    assert(e1.toSeq == e2.toSeq)

    // bigram LM: the count tables round-trip as tables and score
    // identically (train once, score every batch)
    val docs = Seq((1L, "a b a"), (2L, "a c")).toDF("id", "text")
    val lm = graft.ops.NgramLm.train(docs, $"text")
    graft.ops.ModelIo.saveBigramModel(spark, lm, s"$dir/lm")
    val lm2 = graft.ops.ModelIo.loadBigramModel(spark, s"$dir/lm")
    assert(lm2.vocabSize == lm.vocabSize)
    val s1 = graft.ops.NgramLm.scorePerplexity(docs, $"id", $"text", lm)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val s2 = graft.ops.NgramLm.scorePerplexity(docs, $"id", $"text", lm2)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s1 == s2, s"$s1 vs $s2")
  }

  test("gateway verb: weighted_sample replays the A-ES selection") {
    import spark.implicits._
    (1 to 40).map(i => (i.toLong, if (i % 2 == 0) "A" else "B",
        (i % 5 + 1).toDouble, i / 41.0))
      .toDF("id", "s", "w", "u").createOrReplaceTempView("ws_t")
    val got = GraftGateway.sql(spark,
        "SELECT weighted_sample(s, w, u, 6) FROM ws_t")
      .collect().map(r => r.getString(1) -> r.getLong(0))
      .groupBy(_._1).map { case (g, v) => g -> v.map(_._2).toSet }
    val expected = (1 to 40).map(i => (i.toLong, if (i % 2 == 0) "A" else "B",
        (i % 5 + 1).toDouble, i / 41.0))
      .groupBy(_._2).map { case (g, rs) =>
        g -> rs.sortBy(r => -math.log(r._4) / r._3).take(6).map(_._1).toSet }
    assert(got == expected)
  }
}
