package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-16 additions: the τ-b tie-corrected null variance (validated
  * against full permutation enumeration — the mannKendall Var(S)
  * discipline), domain guards promoted from ADVICE, the Cochran-Armitage
  * alias collapse, rank-elected dedup representatives, off-policy
  * evaluation (IPS/SNIPS/DR), the NB2 count GLM, isotonic calibration,
  * weighted Cohen's kappa (FCE variance vs a numeric delta method), and
  * the Cox PH-assumption score test (vs a numeric profiled Hessian of
  * the brute-force time-varying partial likelihood). */
class Round16OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("kendallTau: Var(S) equals the exact permutation variance on ties") {
    // tied fixture on BOTH margins: x marginals (2,2,2), y marginals
    // (2,2,2) with a non-diagonal pairing
    val xs = Seq(1, 1, 2, 2, 3, 3)
    val ys = Seq(1, 2, 2, 3, 3, 1)
    def sOf(y: Seq[Int]): Long = {
      var s = 0L
      for (i <- xs.indices; j <- i + 1 until xs.length) {
        val cx = Integer.compare(xs(i), xs(j))
        val cy = Integer.compare(y(i), y(j))
        if (cx != 0 && cy != 0) s += (if (cx == cy) 1 else -1)
      }
      s
    }
    // the null: y permuted against fixed x — enumerate ALL 6! pairings
    val perms = ys.permutations.toVector
    val ss = perms.map(p => sOf(p).toDouble)
    val mean = ss.sum / ss.length
    assert(math.abs(mean) < 1e-9, s"E[S] must be 0, got $mean")
    val empVar = ss.map(s => (s - mean) * (s - mean)).sum / ss.length
    val r = graft.ops.Agreement.kendallTau(
      xs.zip(ys).toDF("x", "y"), col("x"), col("y")).head()
    // var_s depends only on the two tie-marginal structures, so the
    // observed pairing's var_s IS the permutation variance
    assert(math.abs(r.getAs[Double]("var_s") - empVar) < 1e-9,
      s"formula ${r.getAs[Double]("var_s")} vs enumeration $empVar")
    // z/p consistency with the returned S = C - D
    val s = (r.getAs[Long]("concordant") - r.getAs[Long]("discordant")).toDouble
    assert(math.abs(r.getAs[Double]("z") -
      s / math.sqrt(r.getAs[Double]("var_s"))) < 1e-12)
    val p = r.getAs[Double]("p_value")
    assert(p > 0.0 && p <= 1.0)
  }

  test("kendallTau: no-ties Var(S) reduces to n(n-1)(2n+5)/18") {
    val xs = Seq(1, 2, 3, 4, 5)
    val ys = Seq(2, 1, 4, 3, 5)
    val r = graft.ops.Agreement.kendallTau(
      xs.zip(ys).toDF("x", "y"), col("x"), col("y")).head()
    val n = 5.0
    assert(math.abs(r.getAs[Double]("var_s") -
      n * (n - 1) * (2 * n + 5) / 18.0) < 1e-12)
  }

  test("cochranArmitage alias: identical numbers to trendTest") {
    val df = (0 until 300).map { i =>
      ((i % 3).toDouble, if (i % 50 < 10 + 5 * (i % 3)) 1 else 0)
    }.toDF("dose", "y")
    val a = graft.ops.Contingency.cochranArmitage(df, col("dose"), col("y"))
      .head()
    val b = graft.ops.SimpleTests.trendTest(df, col("y"), col("dose")).head()
    assert(a.getAs[Long]("n") == b.getAs[Long]("n"))
    assert(a.getAs[Double]("t") == b.getAs[Double]("t_stat"))
    assert(a.getAs[Double]("var_t") == b.getAs[Double]("var_t"))
    assert(a.getAs[Double]("z") == b.getAs[Double]("z"))
    // column names follow the dose-response vocabulary
    assert(a.schema.fieldNames.toSeq ==
      Seq("n", "k", "pooled_rate", "t", "var_t", "z", "p_value"))
  }

  test("aucCi: label outside {0,1} raises the named error") {
    val bad = Seq((0, 1.0), (1, 2.0), (2, 3.0), (0, 0.5), (1, 2.5))
      .toDF("y", "s")
    val e = intercept[IllegalArgumentException] {
      graft.ops.MlEval.aucCi(bad, col("y"), col("s"))
    }
    assert(e.getMessage.contains("outside {0, 1}"), e.getMessage)
  }

  test("winRatio: treatment outside {0,1} raises the named error") {
    val bad = Seq((0, 1.0), (1, 2.0), (2, 3.0), (0, 0.5), (1, 2.5))
      .toDF("t", "o")
    val e = intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.winRatio(bad, col("t"), Seq(col("o")))
    }
    assert(e.getMessage.contains("outside {0, 1}"), e.getMessage)
  }

  test("distinctN: duplicate ns are idempotent, not double-counted") {
    val df = Seq("a b c a b", "x y").toDF("text")
    val once = graft.ops.TextOps.distinctN(df, col("text"), Seq(1, 2))
      .orderBy("n").collect()
    val dup = graft.ops.TextOps.distinctN(df, col("text"), Seq(1, 2, 1, 2))
      .orderBy("n").collect()
    assert(once.length == dup.length)
    once.zip(dup).foreach { case (a, b) =>
      assert(a.getAs[Long]("total_ngrams") == b.getAs[Long]("total_ngrams"))
      assert(a.getAs[Long]("distinct_ngrams") ==
        b.getAs[Long]("distinct_ngrams"))
    }
    // sanity on the values themselves: 7 unigrams / 5 distinct
    assert(once(0).getAs[Long]("total_ngrams") == 7L)
    assert(once(0).getAs[Long]("distinct_ngrams") == 5L)
  }

  test("mmrSelect: mismatched vector dimension raises the named error") {
    val df = Seq((1L, Seq(1.0, 0.0), 0.9), (2L, Seq(0.0, 1.0, 0.5), 0.8))
      .toDF("id", "v", "rel")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Ann.mmrSelect(df, col("id"), col("v"), col("rel"), k = 2)
    }
    assert(e.getMessage.contains("dimension"), e.getMessage)
  }

  test("electRepresentatives: max rank wins, ties break to min id, " +
    "unranked ids lose") {
    val comp = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("id", "component")
    val ranks = Seq((1L, 0.1), (2L, 0.9), (3L, 0.9), (11L, 0.5))
      .toDF("id", "r") // id 10 has no rank -> -inf
    val out = graft.ops.Dedup.electRepresentatives(
        comp, ranks, col("id"), col("r"))
      .orderBy("component").collect()
    // component 1: ranks (0.1, 0.9, 0.9) -> tie between 2 and 3 -> 2
    assert(out(0).getAs[Long]("rep_id") == 2L)
    // component 10: id 10 unranked sorts below 11's 0.5
    assert(out(1).getAs[Long]("rep_id") == 11L)
  }

  test("semanticDedup: rank election picks the max-rank member as rep") {
    // two parallel-vector dup groups; rank makes the LAST id the rep
    val df = Seq(
      (1L, Seq(1.0, 0.0), 1.0), (2L, Seq(2.0, 0.0), 2.0),
      (3L, Seq(3.0, 0.0), 3.0),
      (10L, Seq(0.0, 1.0), 10.0), (11L, Seq(0.0, 2.0), 99.0))
      .toDF("id", "v", "pr")
      .withColumn("v", col("v").cast("array<double>"))
    // probes = k = 2: every point lands in BOTH buckets, so the cosine
    // threshold alone defines the groups (single-assignment can split
    // the parallel trio across buckets)
    val out = graft.ops.Dedup.semanticDedup(df, col("id"), col("v"),
        k = 2, threshold = 0.95, iters = 2, probes = 2,
        rank = Some(col("pr")))
      .orderBy("id").collect()
    val reps = out.map(r => r.getAs[Long]("id") -> r.getAs[Long]("rep_id"))
      .toMap
    assert(reps(1L) == 3L && reps(2L) == 3L && reps(3L) == 3L, reps.toString)
    assert(reps(10L) == 11L && reps(11L) == 11L, reps.toString)
    // default (no rank) still elects min id
    val dft = graft.ops.Dedup.semanticDedup(df, col("id"), col("v"),
        k = 2, threshold = 0.95, iters = 2, probes = 2)
      .orderBy("id").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("rep_id")).toMap
    assert(dft(3L) == 1L && dft(11L) == 10L, dft.toString)
  }

  test("opeEval: hand moments; identity policy; clip; guards") {
    import graft.ops.PolicyEval
    val rows = Seq(
      (1.0, 0.5, 0.25, 0.8), (0.0, 0.2, 0.4, 0.1),
      (2.0, 0.3, 0.3, 1.0), (1.0, 0.1, 0.5, 0.4),
      (3.0, 0.6, 0.2, 2.0), (0.0, 0.4, 0.4, 0.2))
    val df = rows.toDF("r", "pt", "pl", "q")
    val out = PolicyEval.opeEval(df, col("r"), col("pt"), col("pl"),
      qhat = Some(col("q"))).head()
    // independent replay of the definitions
    val ws = rows.map { case (_, pt, pl, _) => pt / pl }
    val n = rows.length.toDouble
    val ips = rows.zip(ws).map { case ((r, _, _, _), w) => w * r }.sum / n
    val snips = rows.zip(ws).map { case ((r, _, _, _), w) => w * r }.sum / ws.sum
    val dr = rows.zip(ws).map { case ((r, _, _, q), w) => q + w * (r - q) }.sum / n
    assert(math.abs(out.getAs[Double]("ips") - ips) < 1e-12)
    assert(math.abs(out.getAs[Double]("snips") - snips) < 1e-12)
    assert(math.abs(out.getAs[Double]("dr") - dr) < 1e-12)
    val ess = math.pow(ws.sum, 2) / ws.map(w => w * w).sum
    assert(math.abs(out.getAs[Double]("ess") - ess) < 1e-9)
    // identity policy: pt == pl -> every w = 1, all three = mean reward
    val same = rows.map { case (r, _, pl, q) => (r, pl, pl, q) }
      .toDF("r", "pt", "pl", "q")
    val so = PolicyEval.opeEval(same, col("r"), col("pt"), col("pl"),
      qhat = Some(col("q"))).head()
    val mr = rows.map(_._1).sum / n
    assert(math.abs(so.getAs[Double]("ips") - mr) < 1e-12)
    assert(math.abs(so.getAs[Double]("snips") - mr) < 1e-12)
    assert(math.abs(so.getAs[Double]("dr") - mr) < 1e-12)
    assert(so.getAs[Double]("clipped_share") == 0.0)
    // clip at 1.5: the w = 0.6/0.2 = 3 and 0.5/0.25 = 2 rows clip
    val co = PolicyEval.opeEval(df, col("r"), col("pt"), col("pl"),
      wClip = 1.5).head()
    assert(math.abs(co.getAs[Double]("clipped_share") - 2.0 / 6) < 1e-12)
    val wc = ws.map(math.min(_, 1.5))
    val ipsC = rows.zip(wc).map { case ((r, _, _, _), w) => w * r }.sum / n
    assert(math.abs(co.getAs[Double]("ips") - ipsC) < 1e-12)
    // no qhat -> dr is null
    assert(co.isNullAt(co.fieldIndex("dr")))
    // guards: zero logging propensity; partial qhat
    val e1 = intercept[IllegalArgumentException] {
      PolicyEval.opeEval(Seq((1.0, 0.5, 0.0), (1.0, 0.5, 0.5))
        .toDF("r", "pt", "pl"), col("r"), col("pt"), col("pl"))
    }
    assert(e1.getMessage.contains("propensities"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      PolicyEval.opeEval(
        Seq((1.0, 0.5, 0.5, Some(0.2)), (2.0, 0.4, 0.4, None))
          .toDF("r", "pt", "pl", "q"),
        col("r"), col("pt"), col("pl"), qhat = Some(col("q")))
    }
    assert(e2.getMessage.contains("qhat"), e2.getMessage)
  }

  test("negBinIrls: saturated closed form; alpha moments; guards") {
    import graft.ops.MlWrappers
    // arm0 y in {0,0,2} (x60), arm1 y in {0,1,9} (x60) - planted
    // overdispersion; saturated MLE means = arm means
    val rows = (0 until 360).map { i =>
      val v = (i % 6) match {
        case 3 => 1.0; case 4 => 2.0; case 5 => 9.0; case _ => 0.0
      }
      (v, i % 2)
    }
    val df = rows.toDF("y", "x")
    val fit = MlWrappers.negBinIrls(df, col("y"), Seq(col("x")))
    val m0 = rows.filter(_._2 == 0).map(_._1).sum / 180.0
    val m1 = rows.filter(_._2 == 1).map(_._1).sum / 180.0
    assert(math.abs(fit.intercept - math.log(m0)) < 1e-6)
    assert(math.abs(fit.coefficients(0) - math.log(m1 / m0)) < 1e-6)
    // moment alpha replayed by hand at the arm means
    val num = rows.map { case (y, x) =>
      val m = if (x == 0) m0 else m1; (y - m) * (y - m) - m
    }.sum
    val den = rows.map { case (_, x) =>
      val m = if (x == 0) m0 else m1; m * m
    }.sum
    val alpha = num / den
    assert(math.abs(fit.alpha - alpha) < 1e-6, s"${fit.alpha} vs $alpha")
    // closed-form SEs from the NB working weights
    val w0 = 180.0 * m0 / (1 + alpha * m0)
    val w1 = 180.0 * m1 / (1 + alpha * m1)
    assert(math.abs(fit.interceptStderr - math.sqrt(1 / w0)) < 1e-6)
    assert(math.abs(fit.stderr(0) - math.sqrt(1 / w0 + 1 / w1)) < 1e-6)
    // NB SEs must exceed the Poisson SEs on overdispersed data
    val pois = MlWrappers.poissonIrls(df, col("y"), Seq(col("x")))
    assert(fit.stderr(0) > pois.stderr(0))
    // equidispersed (constant positive y) -> named alpha error
    val e = intercept[IllegalArgumentException] {
      MlWrappers.negBinIrls((0 until 40).map(i => (1.0, i % 2)).toDF("y", "x"),
        col("y"), Seq(col("x")))
    }
    assert(e.getMessage.contains("overdispersed"), e.getMessage)
  }

  test("isotonicCalibrate: PAVA pools violators; monotone; guards") {
    import graft.ops.MlEval
    // levels 0..3 with rates .1 .4 .3 .2 (inversion cascade) then .8:
    // PAVA pools {1,2,3} -> .3; fitted = [.1, .3, .3, .3, .8]
    val rows = (0 until 500).flatMap { i =>
      val lvl = i % 5
      val rate = Seq(0.1, 0.4, 0.3, 0.2, 0.8)(lvl)
      // deterministic sub-position drives the label
      Seq((lvl.toDouble, if ((i / 5) % 10 < rate * 10) 1 else 0))
    }
    val out = MlEval.isotonicCalibrate(rows.toDF("s", "y"), col("s"),
      col("y")).orderBy("score").collect()
    val cal = out.map(_.getAs[Double]("calibrated"))
    assert(math.abs(cal(0) - 0.1) < 1e-12)
    assert(math.abs(cal(1) - 0.3) < 1e-12 && math.abs(cal(2) - 0.3) < 1e-12
      && math.abs(cal(3) - 0.3) < 1e-12, cal.toSeq.toString)
    assert(math.abs(cal(4) - 0.8) < 1e-12)
    // monotone non-decreasing always
    assert(cal.sliding(2).forall(p => p(0) <= p(1)))
    // raw rates preserved
    assert(math.abs(out(1).getAs[Double]("raw_rate") - 0.4) < 1e-12)
    // already-monotone input is unchanged
    val mono = (0 until 300).map { i =>
      (i % 3 * 1.0, if ((i / 3) % 10 < (i % 3) * 3 + 1) 1 else 0)
    }
    val mo = MlEval.isotonicCalibrate(mono.toDF("s", "y"), col("s"),
      col("y")).orderBy("score").collect()
    mo.foreach(r => assert(r.getAs[Double]("calibrated") ==
      r.getAs[Double]("raw_rate")))
    // guards
    val e1 = intercept[IllegalArgumentException] {
      MlEval.isotonicCalibrate(Seq((1.0, 2)).toDF("s", "y"), col("s"),
        col("y"))
    }
    assert(e1.getMessage.contains("{0, 1}"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      MlEval.isotonicCalibrate(
        Seq((1.0, 1), (2.0, 0), (3.0, 1)).toDF("s", "y"),
        col("s"), col("y"), maxCells = 2)
    }
    assert(e2.getMessage.contains("distinct scores"), e2.getMessage)
  }

  test("weightedKappa: FCE variance matches numeric delta method; " +
    "k=2 quadratic equals unweighted kappa") {
    import graft.ops.Agreement
    val rows = (0 until 400).map { i =>
      val a = i % 5
      val b = (a + (if (i % 7 == 0) 1 else 0) + (if (i % 11 == 0) 2 else 0)) % 5
      (a, b)
    }
    val r = Agreement.weightedKappa(rows.toDF("a", "b"), col("a"), col("b"))
      .head()
    // independent replay of po/pe/kappa from the definition
    val k = 5
    val n = rows.length.toDouble
    val p = Array.ofDim[Double](k, k)
    rows.foreach { case (a, b) => p(a)(b) += 1 / n }
    def w(i: Int, j: Int) = 1.0 - math.pow((i - j).toDouble / (k - 1), 2)
    def kappaOf(q: Array[Array[Double]]): Double = {
      val tot = q.map(_.sum).sum
      val pa = q.map(_.sum / tot)
      val pb = (0 until k).map(j => (0 until k).map(q(_)(j)).sum / tot)
      var po = 0.0; var pe = 0.0
      for (i <- 0 until k; j <- 0 until k) {
        po += w(i, j) * q(i)(j) / tot; pe += w(i, j) * pa(i) * pb(j)
      }
      (po - pe) / (1 - pe)
    }
    assert(math.abs(r.getAs[Double]("kappa_w") - kappaOf(p)) < 1e-12)
    // numeric delta method: gradient of kappa(cells) by central
    // differences, multinomial covariance (diag(p) - pp')/n
    val g = Array.ofDim[Double](k, k)
    val eps = 1e-7
    for (i <- 0 until k; j <- 0 until k) {
      val up = p.map(_.clone); up(i)(j) += eps
      val dn = p.map(_.clone); dn(i)(j) -= eps
      g(i)(j) = (kappaOf(up) - kappaOf(dn)) / (2 * eps)
    }
    var egg = 0.0; var eg = 0.0
    for (i <- 0 until k; j <- 0 until k) {
      egg += p(i)(j) * g(i)(j) * g(i)(j); eg += p(i)(j) * g(i)(j)
    }
    val varNum = (egg - eg * eg) / n
    val seFce = r.getAs[Double]("se")
    assert(math.abs(seFce * seFce - varNum) < 1e-8,
      s"FCE ${seFce * seFce} vs delta $varNum")
    // k=2: quadratic weights degenerate to identity -> unweighted kappa
    val bin = rows.map { case (a, b) => (a % 2, b % 2) }.toDF("a", "b")
    val kw = Agreement.weightedKappa(bin, col("a"), col("b")).head()
    val ku = Agreement.cohensKappa(bin, col("a"), col("b")).head()
    assert(math.abs(kw.getAs[Double]("kappa_w") -
      ku.getAs[Double]("kappa")) < 1e-12)
    // linear weighting runs and differs from quadratic on k=5
    val lin = Agreement.weightedKappa(rows.toDF("a", "b"), col("a"),
      col("b"), weighting = "linear").head()
    assert(lin.getAs[Double]("kappa_w") != r.getAs[Double]("kappa_w"))
    val e = intercept[IllegalArgumentException] {
      Agreement.weightedKappa(Seq((1, 1)).toDF("a", "b"), col("a"),
        col("b"))
    }
    assert(e.getMessage.contains("constant"), e.getMessage)
  }

  test("coxZph: score test matches the numeric time-varying likelihood; " +
    "planted non-PH rejects, PH data does not") {
    import graft.ops.Survival
    // planted NON-proportional hazard: x shortens time early, not late
    val rng = new scala.util.Random(11)
    val rows = (0 until 120).map { i =>
      val x = if (i % 2 == 0) 1.0 else 0.0
      val base = 1.0 + (i * 13 % 29) + rng.nextDouble() * 0.01
      // treated die fast EARLY and slow LATE - a sign-flipping hazard
      val t = if (x > 0) { if (base < 15) base * 0.15 else base * 1.8 }
        else base
      (t, 1, x)
    }
    val df = rows.toDF("t", "e", "x")
    val out = Survival.coxZph(df, col("t"), col("e"), Seq(col("x")),
      Seq("x"), transform = "identity").collect()
    val chiOp = out.find(_.getString(0) == "x").get.getAs[Double]("chisq")
    // ---- independent path: numeric score + profiled Hessian of the
    // brute-force time-varying partial likelihood at (beta_hat, 0) ----
    val bhat = Survival.coxPh(df, col("t"), col("e"), Seq(col("x")))
      .coefficients(0)
    val data = rows.sortBy(_._1)
    val gbar = data.map(_._1).sum / data.length // all rows are events
    def ll(b: Double, th: Double): Double = {
      data.map { case (ti, _, xi) =>
        val c = ti - gbar
        val beta = b + th * c
        val denom = data.filter(_._1 >= ti).map(r => math.exp(beta * r._3)).sum
        beta * xi - math.log(denom)
      }.sum
    }
    val h = 1e-5
    def d1(f: (Double, Double) => Double, wrt: Int): Double =
      if (wrt == 0) (f(bhat + h, 0) - f(bhat - h, 0)) / (2 * h)
      else (f(bhat, h) - f(bhat, -h)) / (2 * h)
    val uNum = d1(ll, 1)
    def d2(i: Int, j: Int): Double = {
      def at(db: Double, dt: Double) = ll(bhat + db, bhat * 0 + dt)
      (i, j) match {
        case (0, 0) => (at(h, 0) - 2 * at(0, 0) + at(-h, 0)) / (h * h)
        case (1, 1) => (at(0, h) - 2 * at(0, 0) + at(0, -h)) / (h * h)
        case _ => (at(h, h) - at(h, -h) - at(-h, h) + at(-h, -h)) / (4 * h * h)
      }
    }
    val ibb = -d2(0, 0); val itt = -d2(1, 1); val ibt = -d2(0, 1)
    val sNum = itt - ibt * ibt / ibb
    val chiNum = uNum * uNum / sNum
    assert(math.abs(chiOp - chiNum) < 1e-3 * math.max(1.0, chiNum),
      s"op $chiOp vs numeric $chiNum (u=$uNum s=$sNum)")
    assert(chiOp > 6.63, s"planted non-PH must reject at 1%: chi=$chiOp")
    // PH data (time-constant effect): should NOT reject at 1%
    val ph = (0 until 60).map { i =>
      val x = if (i % 2 == 0) 1.0 else 0.0
      val u0 = (i * 17 % 97 + 1) / 98.0
      (-math.log(u0) / math.exp(0.8 * x), 1, x)
    }
    val outPh = Survival.coxZph(ph.toDF("t", "e", "x"), col("t"),
      col("e"), Seq(col("x")), Seq("x"), transform = "rank").collect()
    assert(outPh.find(_.getString(0) == "x").get
      .getAs[Double]("p_value") > 0.01, outPh.mkString(";"))
  }

  test("krippendorffAlpha: double npairs path keeps the small-case value") {
    // 4 units x 3 raters, mostly agreeing — hand value via the pre-fix
    // Long path on small data must be unchanged by the double cast
    val rows = Seq(
      (1, "a"), (1, "a"), (1, "a"),
      (2, "b"), (2, "b"), (2, "a"),
      (3, "a"), (3, "a"), (3, "b"),
      (4, "b"), (4, "b"), (4, "b"))
    val r = graft.ops.Agreement.krippendorffAlpha(
      rows.toDF("u", "v"), col("u"), col("v")).head()
    // observed: units 1,4 perfect (6 agreeing pairs each of 6... ) —
    // replay the definition directly
    val n = 12.0
    val occA = 3 * 2.0 / 2 + 1 * 0.0 + 2 * 1.0 / 2 + 0.0 // per-unit a-pairs / (m-1)
    // cleaner: coincidence matrix arithmetic
    // unit contributions o_vv' = n_v*(n_v-1)/(m-1) for same-value pairs
    val oAA = 3.0 * 2 / 2 + 1.0 * 0 / 2 + 2.0 * 1 / 2 + 0
    val oBB = 0 + 2.0 * 1 / 2 + 1.0 * 0 / 2 + 3.0 * 2 / 2
    val dO = 1.0 - (oAA + oBB) / n
    val nA = 6.0; val nB = 6.0
    val dE = 1.0 - (nA * (nA - 1) + nB * (nB - 1)) / (n * (n - 1))
    val alpha = 1.0 - dO / dE
    assert(math.abs(r.getAs[Double]("alpha") - alpha) < 1e-12,
      s"got ${r.getAs[Double]("alpha")}, want $alpha (occA=$occA)")
  }
}
