package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout invariance: every single-pass aggregate must produce
  * the same statistic (to floating-point merge-order tolerance) whether the
  * data arrives in 1 partition or is scattered across many — the property
  * that makes results reproducible on any cluster layout. */
class PartitionInvarianceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val base: DataFrame = {
    val rng = new scala.util.Random(7)
    (1 to 4000).map { i =>
      val t = i % 2
      val x = rng.nextGaussian()
      val y = 0.5 * t + x + rng.nextGaussian()
      (i.toLong, t, x, y, math.abs(x) + 0.1)
    }.toDF("uin", "t", "x", "y", "d")
  }

  private def layouts(df: DataFrame): Seq[DataFrame] =
    Seq(df.coalesce(1), df.repartition(7, col("uin")), df.repartition(13))

  private def assertClose(vals: Seq[Double], what: String): Unit = {
    val ref = vals.head
    vals.tail.foreach(v =>
      assert(math.abs(v - ref) <= 1e-9 * math.max(1.0, math.abs(ref)),
        s"$what: $v vs $ref across layouts"))
  }

  test("delta_method, ols, ttest_2samp, srm, xexpt invariant to partitioning") {
    val dm = layouts(base).map(_.select(
      functions.delta_method("x1/x2", isStd = false, Seq($"y", $"d")).as("v"))
      .head().getDouble(0))
    assertClose(dm, "delta_method")

    val ols = layouts(base).map(_.select(functions.ols($"y", Seq($"x", $"t")).as("m"))
      .select(element_at($"m.coefficients", 1)).head().getDouble(0))
    assertClose(ols, "ols slope")

    val tt = layouts(base).map(_.select(
      functions.ttest_2samp("x1", $"t")($"y").as("r"))
      .select($"r.estimate").head().getDouble(0))
    assertClose(tt, "ttest_2samp estimate")

    val srm = layouts(base).map(_.select(
      functions.srm($"d", $"t", Seq(1.0, 1.0)).as("r"))
      .select($"r.chisq").head().getDouble(0))
    assertClose(srm, "srm chisq")

    val xe = layouts(base).map(_.select(
      functions.xexpt_ttest_2samp($"uin", $"t", Seq($"y", $"d")).as("r"))
      .select($"r.p_value").head().getDouble(0))
    assertClose(xe, "xexpt p_value")
  }

  test("fused multi-OLS and bootstrap refit invariant to partitioning") {
    // the indicator-weight fused cross-fit must equal a filtered fit on
    // every layout, and the Poisson-weighted replicate effects are pure
    // functions of (id, rep, seed) — layout cannot move them
    val perLayout = layouts(base).map { d =>
      val models = graft.ops.Regression.fitOlsMultiWeighted(d,
        Seq((col("y"), Seq(col("x")), when(col("uin") % 2 === 0, 1.0)),
          (col("y"), Seq(col("x")), when(col("uin") % 2 === 1, 1.0))))
      val filtered = graft.ops.Regression.fitOls(
        d.filter(col("uin") % 2 === 0), col("y"), Seq(col("x")))
      (models(0).summary.coefficients(0), models(0).summary.n,
        filtered.summary.coefficients(0))
    }
    assertClose(perLayout.map(_._1), "fused even-half slope")
    assert(perLayout.map(_._2).distinct.size == 1, "fused n drifts with layout")
    perLayout.foreach { case (fused, _, filt) =>
      assert(math.abs(fused - filt) <= 1e-9, s"fused $fused vs filtered $filt")
    }
    val effects = layouts(base).map { d =>
      graft.ops.Longterm.recursiveForecast(d,
        Seq(Seq(col("x")), Seq(col("x") * 0.8 + col("d") * 0.1),
          Seq(col("x") * 0.6 + col("y") * 0.05)),
        col("t"), horizon = 1, bootstrapB = 20, idCols = Seq(col("uin")))
        .effects.head
    }
    assertClose(effects.map(_.estimate), "longterm estimate")
    assertClose(effects.map(_.stderr), "longterm bootstrap stderr")
  }

  test("rank tests and distributed variants invariant to partitioning") {
    val mw = layouts(base).map(_.select(
      functions.mann_whitney_utest($"y", $"t").as("r"))
      .select($"r.u_statistic").head().getDouble(0))
    assertClose(mw, "mann_whitney U")

    val ks = layouts(base).map(_.select(
      functions.kolmogorov_smirnov_test($"y", $"t").as("r"))
      .select($"r.d_statistic").head().getDouble(0))
    assertClose(ks, "ks D")

    val mwD = layouts(base).map(d =>
      graft.ops.RankTests.mannWhitneyU(d, $"y", $"t").u_statistic)
    assertClose(mwD, "distributed mann_whitney U")
    // collect-based and distributed variants agree with each other too
    assert(math.abs(mw.head - mwD.head) < 1e-6, s"${mw.head} vs ${mwD.head}")
  }

  test("caliper matching assigns identical matching_index on every layout") {
    // the docstring claims layout-determinism (content-hash ordering, not
    // rand()): the FULL per-row assignment — not just counts — must be
    // byte-identical across partitionings
    val assignments = layouts(base).map { d =>
      graft.ops.Matching.caliperMatching(d, $"t", abs($"x"),
          caliper = 0.5, exactCols = Seq($"uin" % 3), k = 2)
        .select($"uin", $"matching_index")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    assert(assignments.head.values.exists(_ > 0), "nothing matched")
    assignments.tail.foreach(a => assert(a == assignments.head,
      "matching_index assignment drifts with partition layout"))
  }

  test("roc counts, qini curve, and perplexity invariant to partitioning") {
    // roc: integer confusion counts must be IDENTICAL, not just close
    val rocs = layouts(base).map(d =>
      graft.ops.MlEval.rocCurve(d, ($"y" > 0.5).cast("int"), $"x",
        thresholds = Seq(-0.5, 0.0, 0.5))
        .collect().map(r => (r.getAs[Double]("threshold"),
          r.getAs[Long]("tp"), r.getAs[Long]("fp"))).sortBy(_._1).toSeq)
    rocs.tail.foreach(r => assert(r == rocs.head, "roc counts drift"))
    // bootstrapped qini: deterministic hash weights → same curve + bands
    val qinis = layouts(base).map { d =>
      graft.ops.UpliftEval.estimateQini(
        d.withColumn("bucket", (col("uin") % 4).cast("int")),
        score = lit(null), target = $"y", treatment = $"t", nBuckets = 0,
        bootstrapB = 20, idCols = Seq($"uin"))
        .filter(col("bucket").isNotNull)
        .collect().map(r => r.getAs[Int]("bucket") ->
          (r.getAs[Double]("ate"), r.getAs[Double]("ate_lower"))).toMap
    }
    qinis.tail.foreach { q =>
      q.foreach { case (b, (a, lo)) =>
        assert(math.abs(a - qinis.head(b)._1) < 1e-9, s"qini ate bucket $b")
        assert(math.abs(lo - qinis.head(b)._2) < 1e-9, s"qini band bucket $b")
      }
    }
    // perplexity: per-doc values to FP merge-order tolerance
    val docs = Seq((1L, "a b a c"), (2L, "b b a"), (3L, "c a b a")).toDF("id", "text")
    val docLayouts = Seq(docs.coalesce(1), docs.repartition(2, col("id")),
      docs.repartition(3))
    val pp = docLayouts.map { d =>
      val m = graft.ops.NgramLm.train(d, $"text")
      graft.ops.NgramLm.scorePerplexity(d, $"id", $"text", m)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Double]("perplexity")).toMap
    }
    pp.tail.foreach(p => p.foreach { case (id, v) =>
      assert(math.abs(v - pp.head(id)) < 1e-9, s"perplexity doc $id") })
  }

  test("survival curves and log-rank invariant to partitioning") {
    val surv = base.select(($"uin" % 3).cast("int").as("g"),
      ($"uin" % 40).cast("int").as("tm"), $"t".as("ev"))
    val curves = layouts(surv).map(d =>
      graft.ops.Survival.kaplanMeierBy(d, $"g", $"tm", $"ev")
        .collect().map(r => (r.getInt(0), r.getInt(1)) ->
          (r.getLong(2), r.getDouble(5))).toMap)
    curves.tail.foreach { c =>
      assert(c.keySet == curves.head.keySet)
      c.foreach { case (k, (nr, s)) =>
        assert(nr == curves.head(k)._1, s"n_risk at $k")
        assert(math.abs(s - curves.head(k)._2) < 1e-9, s"survival at $k")
      }
    }
    val lr = layouts(surv).map(d =>
      graft.ops.Survival.logRankTest(d, ($"g" % 2).cast("int"), $"tm", $"ev")
        .head().getDouble(3))
    assertClose(lr, "log_rank chi2")
  }

  test("tfidf scores and drift metrics invariant to partitioning") {
    val docs = base.select($"uin".as("id"),
      concat_ws(" ", ($"uin" % 23).cast("string"), ($"uin" % 7).cast("string"),
        ($"uin" % 3).cast("string")).as("text"))
    val scored = layouts(docs).map(d =>
      graft.ops.TfIdf.termScores(d, $"id", $"text")
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(6))
        .toMap)
    scored.tail.foreach { m =>
      assert(m.keySet == scored.head.keySet)
      m.foreach { case (k, v) =>
        assert(math.abs(v - scored.head(k)) < 1e-12, s"tfidf at $k") }
    }
    val psis = layouts(base).map(d =>
      graft.ops.Drift.psi(d, $"y", $"t", Seq(-1.0, 0.0, 1.0)))
    assertClose(psis, "psi")
    val w1s = layouts(base).map(d =>
      graft.ops.RankTests.wasserstein1(d, $"y", $"t"))
    assertClose(w1s, "wasserstein1")
  }

  test("robust means and weighted ess invariant to partitioning") {
    val rm = layouts(base).map { d =>
      val r = graft.ops.Robust.robustMeans(d, $"y", exact = true).head()
      (r.getDouble(4), r.getDouble(5))
    }
    assertClose(rm.map(_._1), "winsorized_mean")
    assertClose(rm.map(_._2), "trimmed_mean")
    val ess = layouts(base).map(d =>
      graft.ops.Robust.weightedMeanEss(d, $"y", $"d").head().getDouble(3))
    assertClose(ess, "ess")
  }

  test("histogram, box stats, conformal q, and chunking invariant to partitioning") {
    // histogram: identical (bin -> count) maps on every layout (edges are
    // exact min/max; counts are integers, so equality is exact)
    val hs = layouts(base).map(d =>
      graft.ops.Explore.histogram(d, $"y", bins = 7)
        .collect().map(r => r.getInt(0) -> r.getLong(3)).toMap)
    hs.tail.foreach(h => assert(h == hs.head, "histogram counts"))
    val hbs = layouts(base).map(d =>
      graft.ops.Explore.histogramBy(d, $"t", $"y", bins = 5)
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(4)).toMap)
    hbs.tail.foreach(h => assert(h == hbs.head, "histogramBy counts"))
    val bs = layouts(base).map(d =>
      graft.ops.Explore.boxStats(d, $"y", exact = true).head())
    assertClose(bs.map(_.getAs[Double]("median")), "box median")
    assert(bs.map(_.getAs[Long]("n_outliers_hi")).distinct.size == 1)
    // conformal q: the exact order statistic is layout-independent
    val qs = layouts(base).map(d => graft.ops.Regression.conformalOls(
      d, $"y", Seq($"x"), $"uin" % 2 === 0)._2)
    assertClose(qs, "conformal q")
    // chunking: per-row transform — identical (doc, chunk) rows anywhere
    val txt = base.withColumn("text",
      concat_ws(" ", typedLit((0 until 25).map(i => s"w$i"))))
    val chs = layouts(txt).map(d =>
      graft.ops.TextOps.chunkDocuments(d, $"uin", $"text", 8, 2)
        .groupBy($"chunk_ix").count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap)
    chs.tail.foreach(c => assert(c == chs.head, "chunk counts"))
  }

  // layouts for frames keyed by a column other than uin
  private def layoutsBy(df: DataFrame, key: String): Seq[DataFrame] =
    Seq(df.coalesce(1), df.repartition(7, col(key)), df.repartition(13))

  test("round-11 verbs invariant to partitioning: funnel, retention, top_k, pairs, event study, synth control") {
    // funnel / retention: integer user counts, exact equality
    val ev = (1 to 900).map { i =>
      val u = i % 90
      val step = i % 3 match { case 0 => "A"; case 1 => "B"; case _ => "C" }
      (u.toLong, (i % 50).toDouble, step)
    }.toDF("u", "t", "e")
    val fs = layoutsBy(ev, "u").map(d =>
      graft.ops.Funnel.funnel(d, $"u", $"t", $"e", Seq("A", "B", "C"), 30.0)
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap)
    fs.tail.foreach(f => assert(f == fs.head, "funnel counts"))
    val rs = layoutsBy(ev, "u").map(d =>
      graft.ops.Funnel.retentionMatrix(d, $"u", $"t", 10.0)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap)
    rs.tail.foreach(r => assert(r == rs.head, "retention counts"))
    // top_k in the exact regime: identical (rank, item, count) rows
    val ts = layoutsBy(ev, "u").map(d =>
      graft.ops.Explore.topK(d, $"e", k = 3, maxTracked = 100)
        .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq)
    ts.tail.foreach(t => assert(t == ts.head, "top_k rows"))
    // hammingPairs: exact pair set (hash arithmetic + integer hamming)
    val hashed = (0L until 300L).map(i => (i, i / 3 * 1024L)).toDF("id", "h")
    val ps = layoutsBy(hashed, "id").map(d =>
      graft.ops.Dedup.hammingPairs(d, $"id", $"h", maxHamming = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet)
    ps.tail.foreach(p => assert(p == ps.head, "hamming pair set"))
    // event study ATT: cell means merge in different orders -> tolerance
    val panel = (for { u <- 0 until 60; t <- 1 to 6 } yield {
      val g = if (u % 2 == 0) 0L else 4L
      (u.toLong, g, t.toLong, t * 1.5 + (u % 5) * 0.3 +
        (if (g == 4L && t >= 4) 2.0 else 0.0))
    }).toDF("u", "g", "t", "y")
    val es = layoutsBy(panel, "u").map(d =>
      graft.ops.EventStudy.groupTimeAtt(d, $"g", $"t", $"y")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap)
    es.head.keys.foreach { k =>
      assertClose(es.map(_(k)), s"event-study ATT $k")
    }
    // synth control: deterministic FW over cell means -> tolerance
    val sp = (for { u <- Seq("tr", "d1", "d2", "d3"); t <- 1 to 12 } yield {
      val v = u match {
        case "tr" => 5.0 + t + 0.05 * t * t
        case "d1" => 10.0 + t + 0.1 * t * t
        case "d2" => 3.0 + 0.9 * t
        case _ => 7.0 - 0.2 * t
      }
      (u, t.toLong, v)
    }).toDF("u", "t", "y")
    val ws = layoutsBy(sp, "u").map(d =>
      graft.ops.SynthControl.synthControl(d, $"u", $"t", $"y", "tr", 8.0)
        .weights.toSeq)
    ws.head.indices.foreach(i => assertClose(ws.map(_(i)), s"synth w$i"))
  }

  test("round-12 verbs invariant to partitioning: gini, spearman, rmst, changepoint, rdd, icc, yuen, mi") {
    // gini / spearman exercise the distributed rank machinery — the
    // layout-riskiest construction this round
    val gs = layouts(base).map(d =>
      graft.ops.Explore.gini(d.select((abs($"y") + 0.1).as("v")), $"v")
        .head())
    assertClose(gs.map(_.getAs[Double]("gini")), "gini")
    assertClose(gs.map(_.getAs[Double]("top10_share")), "gini top10")
    val sps = layouts(base).map(d =>
      graft.ops.RankTests.spearman(d, $"x", $"y").head()
        .getAs[Double]("rho"))
    assertClose(sps, "spearman rho")
    // rmst: KM cells + windows; integer event counts exact, rmst tolerance
    val rms = layouts(base).map(d =>
      graft.ops.Survival.rmst(d.select((abs($"x") * 10).as("tm"),
          ($"uin" % 3 =!= 0).cast("int").as("e"), ($"t").cast("string").as("g")),
        $"tm", $"e", tau = 15.0, group = $"g")
        .collect().map(r => r.getAs[String]("group") ->
          (r.getAs[Long]("events"), r.getAs[Double]("rmst"))).toMap)
    rms.head.keys.foreach { k =>
      assert(rms.map(_(k)._1).distinct.size == 1, s"rmst events $k")
      assertClose(rms.map(_(k)._2), s"rmst $k")
    }
    // changepoint: exact argmax period + stat tolerance
    val cps = layouts(base).map(d =>
      graft.ops.Drift.changepoint(
        d.select(($"uin" % 40).as("p"),
          ($"y" + when($"uin" % 40 >= 25, 4.0).otherwise(0.0)).as("v")),
        $"p", $"v").head())
    assert(cps.map(_.getAs[Long]("change_period")).distinct.size == 1,
      "changepoint location")
    assertClose(cps.map(_.getAs[Double]("stat")), "changepoint stat")
    // fuzzy RDD: 60 moment sums merge in any order
    val rds = layouts(base.select($"x",
      when($"x" >= 0, ($"uin" % 10 < 7).cast("double"))
        .otherwise(($"uin" % 10 < 2).cast("double")).as("dd"))
      .withColumn("yy", $"x" * 0.5 + $"dd" * 3.0))
      .map(d => graft.ops.Regression.rddFuzzy(d, $"yy", $"dd", $"x",
        0.0, 1.5).head().getAs[Double]("tau"))
    assertClose(rds, "rdd_fuzzy tau")
    // icc / yuen / mutual_info: cell aggregates + exact percentiles
    val ics = layouts(base.select(($"uin" % 50).as("c"), $"y"))
      .map(d => graft.ops.SimpleTests.icc(d, $"y", $"c").head()
        .getAs[Double]("icc"))
    assertClose(ics, "icc")
    val ys = layouts(base).map(d =>
      graft.ops.Robust.yuenTest(d, $"y", $"t", exact = true).head())
    assertClose(ys.map(_.getAs[Double]("diff")), "yuen diff")
    assert(ys.map(_.getAs[Long]("h1")).distinct.size == 1, "yuen h1")
    val mis = layouts(base.select(($"uin" % 5).cast("string").as("a"),
        ($"uin" % 7).cast("string").as("b")))
      .map(d => graft.ops.SimpleTests.mutualInfo(d, $"a", $"b").head()
        .getAs[Double]("mi"))
    assertClose(mis, "mutual_info")
  }

  test("round-13 verbs invariant to partitioning: mh, kw, bm, cif, kmeans, oaxaca") {
    // Mantel-Haenszel: stratum cells merge in any order. Stratum modulus
    // COPRIME to the t = uin % 2 arm (uin % 6 shares parity: every
    // stratum would hold a single arm and the table degenerates)
    val mhs = layouts(base.select(($"uin" % 5).cast("string").as("s"), $"t",
        ($"y" > 0).cast("int").as("yy")))
      .map(d => graft.ops.Contingency.mantelHaenszel(d, $"s", $"t", $"yy")
        .head())
    assertClose(mhs.map(_.getAs[Double]("or_mh")), "mh or")
    assertClose(mhs.map(_.getAs[Double]("cmh_chisq")), "mh chisq")
    // Kruskal-Wallis + Brunner-Munzel: the 3-way rank machinery
    val kws = layouts(base.select((round($"y", 1)).as("v"),
        ($"uin" % 3).cast("string").as("g")))
      .map(d => graft.ops.RankTests.kruskalWallis(d, $"v", $"g").head()
        .getAs[Double]("h_corrected"))
    assertClose(kws, "kruskal h")
    val bms = layouts(base.select((round($"y", 1)).as("v"), $"t"))
      .map(d => graft.ops.RankTests.brunnerMunzel(d, $"v", $"t").head())
    assertClose(bms.map(_.getAs[Double]("p_hat")), "bm p_hat")
    assertClose(bms.map(_.getAs[Double]("stat")), "bm stat")
    // cumulative incidence: per-(cause,time) curve identical everywhere
    val cifs = layouts(base.select(($"uin" % 15).as("tm"),
        ($"uin" % 4).cast("int").as("cause")))
      .map(d => graft.ops.Survival.cumulativeIncidence(d, $"tm", $"cause")
        .collect().map(r => (r.getAs[Int]("cause"), r.getAs[Long]("time")) ->
          r.getAs[Double]("cif")).toMap)
    cifs.head.keys.foreach { k =>
      assertClose(cifs.map(_(k)), s"cif $k") }
    // kmeans: deterministic init + argmin -> identical cluster sizes
    val vecs = base.select($"uin".as("id"),
      array($"x", $"y", $"d", ($"uin" % 9).cast("double")).as("v"))
    val kms = layouts(vecs).map(d =>
      graft.ops.Ann.kmeans(d, $"id", $"v", k = 3, iters = 2)
        .orderBy($"cluster").collect())
    kms.tail.foreach(r => assert(r.map(_.getAs[Long]("n")).toSeq ==
      kms.head.map(_.getAs[Long]("n")).toSeq, "kmeans sizes"))
    kms.head.indices.foreach { i =>
      assertClose(kms.map(_(i).getAs[Double]("inertia")), s"kmeans inertia $i")
    }
    // oaxaca: two OLS fits + moments in one scan
    val obs = layouts(base).map(d =>
      graft.ops.Regression.oaxacaBlinder(d, $"y", $"t", Seq($"x")).head())
    assertClose(obs.map(_.getAs[Double]("explained")), "oaxaca explained")
    assertClose(obs.map(_.getAs[Double]("gap")), "oaxaca gap")
  }
}
