package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 additions: the codegen step-function lookup that replaced
  * isotonicScore's scalar UDF (clamp/boundary/NaN semantics vs a
  * reference fold), the per-group floor lookup that replaced stratified
  * Cox's broadcast UDF (per-group semantics vs per-group floorIndex,
  * unknown-group and below-range nulls), Efron tie handling for
  * coxPh/coxPhStratified (brute tied partial likelihood maximized at
  * β̂; no-ties ≡ Breslow; heavier-ties-move-β̂-away-from-0 direction),
  * cluster-robust (Lin–Wei sandwich) Cox SEs (score residuals sum to
  * the gradient ≈ 0; brute per-subject residual identity; row-cluster
  * equals unclustered robust), and Fine–Gray competing-risks regression
  * (no-censoring reduction to coxPh on the subdistribution recode;
  * brute weighted partial likelihood with the same IPCW convention). */
class Round18OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------------------------------------------------------------
  // SortedStepLookup: codegen step-function application
  // ---------------------------------------------------------------

  test("sortedStepLookup applies the step function with below-range clamp " +
    "and NaN->null, matching a reference scan") {
    val bounds = Array(1.0, 3.0, 3.5, 10.0)
    val values = Array(0.1, 0.25, 0.5, 0.9)
    def ref(v: Double): Double = {
      var ix = -1
      var i = 0
      while (i < bounds.length && bounds(i) <= v) { ix = i; i += 1 }
      values(math.max(0, ix))
    }
    val probes = Seq(-5.0, 0.999999, 1.0, 1.5, 2.999999, 3.0, 3.25, 3.5,
      9.999, 10.0, 10.000001, 1e9)
    val got = probes.toDF("v")
      .select(graft.expr.SearchExprs.sortedStepLookup(col("v"), bounds, values)
        .as("out"))
      .collect().map(_.getDouble(0))
    probes.zip(got).foreach { case (v, g) =>
      assert(g === ref(v), s"probe $v")
    }
    // NaN and null both yield null
    val nulls = Seq(Some(Double.NaN), None).toDF("v")
      .select(graft.expr.SearchExprs.sortedStepLookup(col("v"), bounds, values)
        .as("out"))
      .collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("sortedStepLookup agrees between codegen and interpreted eval") {
    val bounds = Array(0.0, 2.0, 4.0)
    val values = Array(1.0, 2.0, 3.0)
    val e = graft.expr.SortedStepLookup(
      org.apache.spark.sql.catalyst.expressions.Literal(1.5), bounds, values)
    // greatest bound <= 1.5 is 0.0 (index 0) -> values(0)
    assert(e.eval(null) === 1.0) // interpreted path directly
    val viaPlan = Seq(1.5).toDF("v")
      .select(graft.expr.SearchExprs.sortedStepLookup(col("v"), bounds, values))
      .head().getDouble(0)
    assert(viaPlan === 1.0)
  }

  // ---------------------------------------------------------------
  // PerGroupFloorLookup: per-group codegen binary search
  // ---------------------------------------------------------------

  test("perGroupFloorLookup floors within the group's own slice; unknown " +
    "group and below-range yield null") {
    val groups = Array("a", "b", "c")
    val flat = Array(1.0, 5.0, 9.0, /* b: */ 2.0, 4.0) // c: empty slice
    val offsets = Array(0, 3, 5, 5)
    val rows = Seq(
      ("a", 0.5, None), ("a", 1.0, Some(1.0)), ("a", 6.9, Some(5.0)),
      ("a", 9.0, Some(9.0)), ("a", 100.0, Some(9.0)),
      ("b", 1.9, None), ("b", 2.0, Some(2.0)), ("b", 4.5, Some(4.0)),
      ("c", 3.0, None), // empty slice
      ("zz", 3.0, None)) // unknown group
    val got = rows.map { case (g, v, _) => (g, v) }.toDF("g", "v")
      .select(col("g"), col("v"),
        graft.expr.SearchExprs.perGroupFloorLookup(col("g"), col("v"),
          groups, flat, offsets).as("out"))
      .collect()
    rows.zip(got).foreach { case ((g, v, want), r) =>
      val gotV = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      assert(gotV === want, s"group $g value $v")
    }
  }

  // ---------------------------------------------------------------
  // Efron tie handling for coxPh / coxPhStratified
  // ---------------------------------------------------------------

  /** brute-force Efron log partial likelihood, one covariate: per event
    * time, risk set by direct filter, the within-tie sum subtracted in
    * l/d fractions — an independent O(n·m) code path. */
  private def bruteEfron1(data: Seq[(Double, Int, Double)])(b: Double): Double = {
    val evTimes = data.filter(_._2 == 1).map(_._1).distinct.sorted
    evTimes.map { t =>
      val risk = data.filter(_._1 >= t)
      val dead = data.filter(r => r._1 == t && r._2 == 1)
      val d = dead.size
      val c0 = dead.map(r => math.exp(b * r._3)).sum
      val s0 = risk.map(r => math.exp(b * r._3)).sum
      dead.map(r => b * r._3).sum -
        (0 until d).map(l => math.log(s0 - (l.toDouble / d) * c0)).sum
    }.sum
  }

  /** brute Efron log partial likelihood, two covariates. */
  private def bruteEfron2(data: Seq[(Double, Int, Double, Double)])
                         (b1: Double, b2: Double): Double = {
    val evTimes = data.filter(_._2 == 1).map(_._1).distinct.sorted
    evTimes.map { t =>
      val risk = data.filter(_._1 >= t)
      val dead = data.filter(r => r._1 == t && r._2 == 1)
      val d = dead.size
      def eta(r: (Double, Int, Double, Double)) = b1 * r._3 + b2 * r._4
      val c0 = dead.map(r => math.exp(eta(r))).sum
      val s0 = risk.map(r => math.exp(eta(r))).sum
      dead.map(eta).sum -
        (0 until d).map(l => math.log(s0 - (l.toDouble / d) * c0)).sum
    }.sum
  }

  private def ternaryMax(f: Double => Double, lo0: Double, hi0: Double): Double = {
    var lo = lo0; var hi = hi0
    while (hi - lo > 1e-11) {
      val m1 = lo + (hi - lo) / 3
      val m2 = hi - (hi - lo) / 3
      if (f(m1) < f(m2)) lo = m1 else hi = m2
    }
    (lo + hi) / 2
  }

  // heavily tied fixture: 3 event times with d = 3, 2, 2, interleaved
  // censoring, a planted positive effect (higher x fails earlier)
  private val tiedFix: Seq[(Double, Int, Double)] = Seq(
    (2.0, 1, 1.9), (2.0, 1, 1.2), (2.0, 1, 0.4), (2.0, 0, 0.3),
    (4.0, 1, 1.1), (4.0, 1, 0.2), (4.5, 0, 1.4),
    (7.0, 1, 0.8), (7.0, 1, 0.1),
    (9.0, 1, 0.5), (9.0, 0, 0.0), (11.0, 0, 0.6))

  test("coxPh efron maximizes the brute tied partial likelihood (k=1) " +
    "and reports its value as logLik") {
    val df = tiedFix.toDF("t", "e", "x")
    val fit = ops.Survival.coxPh(df, col("t"), col("e"), Seq(col("x")),
      ties = "efron")
    val brute = bruteEfron1(tiedFix) _
    val bHat = ternaryMax(brute, -5.0, 5.0)
    assert(math.abs(fit.coefficients(0) - bHat) < 1e-7,
      s"fit ${fit.coefficients(0)} vs brute $bHat")
    assert(math.abs(fit.logLik - brute(bHat)) < 1e-9)
    // the two conventions genuinely differ on this fixture, and Breslow
    // attenuates the planted positive effect toward 0
    val bres = ops.Survival.coxPh(df, col("t"), col("e"), Seq(col("x")))
    assert(bres.coefficients(0) < fit.coefficients(0))
    assert(math.abs(bres.coefficients(0) - fit.coefficients(0)) > 1e-3)
  }

  test("coxPh efron: zero numeric gradient of the brute likelihood at " +
    "the fitted beta (k=2), logLik matches brute") {
    val fix2 = tiedFix.zipWithIndex.map { case ((t, e, x), i) =>
      (t, e, x, ((i * 7) % 5).toDouble / 4.0)
    }
    val df = fix2.toDF("t", "e", "x1", "x2")
    val fit = ops.Survival.coxPh(df, col("t"), col("e"),
      Seq(col("x1"), col("x2")), ties = "efron")
    val Array(b1, b2) = fit.coefficients
    val brute = bruteEfron2(fix2) _
    assert(math.abs(fit.logLik - brute(b1, b2)) < 1e-9)
    val h = 1e-6
    val g1 = (brute(b1 + h, b2) - brute(b1 - h, b2)) / (2 * h)
    val g2 = (brute(b1, b2 + h) - brute(b1, b2 - h)) / (2 * h)
    assert(math.abs(g1) < 1e-4, s"grad1 $g1")
    assert(math.abs(g2) < 1e-4, s"grad2 $g2")
  }

  test("coxPh efron == breslow exactly when no event time is tied") {
    // distinct event times: every d = 1, the two conventions coincide
    val fix = Seq(
      (1.0, 1, 0.7), (2.0, 1, 1.3), (3.0, 0, 0.2), (4.0, 1, 0.9),
      (5.0, 1, 0.1), (6.0, 0, 1.0), (7.0, 1, 0.4), (9.0, 1, 1.1))
    val df = fix.toDF("t", "e", "x")
    val ef = ops.Survival.coxPh(df, col("t"), col("e"), Seq(col("x")),
      ties = "efron")
    val br = ops.Survival.coxPh(df, col("t"), col("e"), Seq(col("x")))
    assert(math.abs(ef.coefficients(0) - br.coefficients(0)) < 1e-12)
    assert(math.abs(ef.stderr(0) - br.stderr(0)) < 1e-12)
    assert(math.abs(ef.logLik - br.logLik) < 1e-12)
  }

  test("coxPhStratified efron maximizes the summed per-stratum brute " +
    "likelihood; one stratum reduces to coxPh efron") {
    // two strata with different baselines, shared planted effect
    val sA = tiedFix.map { case (t, e, x) => ("A", t, e, x) }
    val sB = tiedFix.map { case (t, e, x) => ("B", t * 2.0 + 1.0, e, 1.0 - x) }
    val both = sA ++ sB
    val df = both.toDF("s", "t", "e", "x")
    val fit = ops.Survival.coxPhStratified(df, col("t"), col("e"), col("s"),
      Seq(col("x")), ties = "efron")
    def brute(b: Double): Double =
      bruteEfron1(sA.map(r => (r._2, r._3, r._4)))(b) +
        bruteEfron1(sB.map(r => (r._2, r._3, r._4)))(b)
    val bHat = ternaryMax(brute, -5.0, 5.0)
    assert(math.abs(fit.coefficients(0) - bHat) < 1e-7,
      s"fit ${fit.coefficients(0)} vs brute $bHat")
    assert(math.abs(fit.logLik - brute(bHat)) < 1e-9)
    // single stratum ≡ the unstratified efron fit
    val one = ops.Survival.coxPhStratified(tiedFix.toDF("t", "e", "x"),
      col("t"), col("e"), lit("only"), Seq(col("x")), ties = "efron")
    val flat = ops.Survival.coxPh(tiedFix.toDF("t", "e", "x"),
      col("t"), col("e"), Seq(col("x")), ties = "efron")
    assert(math.abs(one.coefficients(0) - flat.coefficients(0)) < 1e-10)
    assert(math.abs(one.stderr(0) - flat.stderr(0)) < 1e-10)
  }

  // ---------------------------------------------------------------
  // Cluster-robust (Lin-Wei sandwich) Cox SEs
  // ---------------------------------------------------------------

  /** brute Breslow log partial likelihood, one covariate. */
  private def bruteBreslow1(data: Seq[(Double, Int, Double)])(b: Double): Double = {
    val evTimes = data.filter(_._2 == 1).map(_._1).distinct.sorted
    evTimes.map { t =>
      val dead = data.filter(r => r._1 == t && r._2 == 1)
      val s0 = data.filter(_._1 >= t).map(r => math.exp(b * r._3)).sum
      dead.map(r => b * r._3).sum - dead.size * math.log(s0)
    }.sum
  }

  /** brute observed information at b (Breslow, k=1): Σ_event-times
    * d·(S2/S0 − x̄²) by direct risk-set filters. */
  private def bruteInfo1(data: Seq[(Double, Int, Double)], b: Double): Double = {
    val evTimes = data.filter(_._2 == 1).map(_._1).distinct.sorted
    evTimes.map { t =>
      val risk = data.filter(_._1 >= t)
      val s0 = risk.map(r => math.exp(b * r._3)).sum
      val s1 = risk.map(r => r._3 * math.exp(b * r._3)).sum
      val s2 = risk.map(r => r._3 * r._3 * math.exp(b * r._3)).sum
      val d = data.count(r => r._1 == t && r._2 == 1).toDouble
      d * (s2 / s0 - (s1 / s0) * (s1 / s0))
    }.sum
  }

  /** brute per-subject score residuals at b (Breslow), one covariate:
    * U_i = δ_i(x_i − x̄(t_i)) − Σ_{event s ≤ t_i} (d_s/S0(s))·e^{bx_i}·
    * (x_i − x̄(s)) — computed by direct risk-set filters. */
  private def bruteResiduals(data: Seq[(Double, Int, Double)],
                             b: Double): Seq[Double] = {
    val evTimes = data.filter(_._2 == 1).map(_._1).distinct.sorted
    def s0(t: Double) = data.filter(_._1 >= t).map(r => math.exp(b * r._3)).sum
    def xbar(t: Double) =
      data.filter(_._1 >= t).map(r => r._3 * math.exp(b * r._3)).sum / s0(t)
    def d(t: Double) = data.count(r => r._1 == t && r._2 == 1).toDouble
    data.map { r =>
      val own = if (r._2 == 1) r._3 - xbar(r._1) else 0.0
      val cum = evTimes.filter(_ <= r._1).map { s =>
        (d(s) / s0(s)) * math.exp(b * r._3) * (r._3 - xbar(s))
      }.sum
      own - cum
    }
  }

  test("coxPhRobust: per-row clusters reproduce the brute Lin-Wei " +
    "sandwich; residuals sum to the gradient ~ 0") {
    val withC = tiedFix.zipWithIndex.map { case ((t, e, x), i) =>
      (s"r$i", t, e, x)
    }
    val df = withC.toDF("cl", "t", "e", "x")
    val r = ops.Survival.coxPhRobust(df, col("t"), col("e"), col("cl"),
      Seq(col("x")))
    val b = r.coefficients(0)
    val us = bruteResiduals(tiedFix, b)
    assert(math.abs(us.sum) < 1e-8, s"gradient identity: ${us.sum}")
    val i2 = bruteInfo1(tiedFix, b)
    val bMat = us.map(u => u * u).sum
    val want = math.sqrt(bMat) / i2
    assert(math.abs(r.seRobust(0) - want) < 1e-6,
      s"robust se ${r.seRobust(0)} vs brute $want")
    assert(r.nClusters === tiedFix.size)
    // model SE present and different from robust on this fixture
    assert(r.seModel(0) > 0 && math.abs(r.seModel(0) - r.seRobust(0)) > 1e-6)
  }

  test("coxPhRobust: genuine clusters sum residuals within cluster " +
    "before the outer product") {
    val withC = tiedFix.zipWithIndex.map { case ((t, e, x), i) =>
      (s"c${i % 4}", t, e, x)
    }
    val df = withC.toDF("cl", "t", "e", "x")
    val r = ops.Survival.coxPhRobust(df, col("t"), col("e"), col("cl"),
      Seq(col("x")))
    val b = r.coefficients(0)
    val us = bruteResiduals(tiedFix, b)
    val perC = us.zipWithIndex.groupBy(_._2 % 4).values
      .map(_.map(_._1).sum)
    val bMat = perC.map(s => s * s).sum
    val i2 = bruteInfo1(tiedFix, b)
    val want = math.sqrt(bMat) / i2
    assert(math.abs(r.seRobust(0) - want) < 1e-6,
      s"robust se ${r.seRobust(0)} vs brute $want")
    assert(r.nClusters === 4)
  }

  test("coxPhRobust: k=2 runs, z/p consistent with beta/se, and a " +
    "single cluster is a named error") {
    val fix2 = tiedFix.zipWithIndex.map { case ((t, e, x), i) =>
      (s"c${i % 3}", t, e, x, ((i * 7) % 5).toDouble / 4.0)
    }
    val df = fix2.toDF("cl", "t", "e", "x1", "x2")
    val r = ops.Survival.coxPhRobust(df, col("t"), col("e"), col("cl"),
      Seq(col("x1"), col("x2")))
    (0 until 2).foreach { j =>
      assert(r.seRobust(j) > 0)
      assert(math.abs(r.zRobust(j) - r.coefficients(j) / r.seRobust(j)) < 1e-12)
    }
    val ex = intercept[IllegalArgumentException] {
      ops.Survival.coxPhRobust(df, col("t"), col("e"), lit("one"),
        Seq(col("x1")))
    }
    assert(ex.getMessage.contains("cox_ph_cluster") &&
      ex.getMessage.contains("2 clusters"))
  }

  // ---------------------------------------------------------------
  // Fine-Gray competing-risks regression
  // ---------------------------------------------------------------

  /** brute Fine-Gray log pseudo-likelihood (Breslow ties), one covariate,
    * same convention as the implementation: Ĝ left limits both sides,
    * competing subjects stay in every later risk set with weight
    * Ĝ(t−)/Ĝ(s−), censored subjects leave. Direct filters throughout. */
  private def bruteFineGray(data: Seq[(Double, Int, Double)])(b: Double): Double = {
    def gMinus(u: Double): Double =
      data.map(_._1).distinct.sorted.filter(_ < u).map { s =>
        val n = data.count(_._1 >= s).toDouble
        val dc = data.count(r => r._1 == s && r._2 == 0).toDouble
        if (dc == 0) 1.0 else 1.0 - dc / n
      }.product
    val evTimes = data.filter(_._2 == 1).map(_._1).distinct.sorted
    evTimes.map { t =>
      val dead = data.filter(r => r._1 == t && r._2 == 1)
      val atRisk = data.filter(_._1 >= t).map(r => math.exp(b * r._3)).sum
      val competing = data.filter(r => r._2 >= 2 && r._1 < t)
        .map(r => math.exp(b * r._3) / gMinus(r._1)).sum
      val w0 = atRisk + gMinus(t) * competing
      dead.map(r => b * r._3).sum - dead.size * math.log(w0)
    }.sum
  }

  // competing-risks fixture: cause 0/1/2 interleaved over tied times
  private val crFix: Seq[(Double, Int, Double)] = Seq(
    (1.0, 1, 1.2), (1.0, 2, 0.9), (2.0, 0, 0.4), (2.0, 1, 1.6),
    (3.0, 2, 0.2), (3.0, 1, 0.7), (4.0, 0, 1.1), (5.0, 1, 0.3),
    (5.0, 1, 1.0), (6.0, 2, 0.8), (7.0, 1, 0.5), (8.0, 0, 0.1),
    (9.0, 1, 0.6), (10.0, 0, 1.3))

  test("fineGray with NO censoring reduces exactly to coxPh on the " +
    "'competing stays forever' recode") {
    val noCens = crFix.filter(_._2 != 0)
    val df = noCens.toDF("t", "c", "x")
    val fg = ops.Survival.fineGray(df, col("t"), col("c"), Seq(col("x")))
    // recode: competing subjects become censored PAST the last time, so
    // they sit in every risk set — the subdistribution risk set
    val tMax = noCens.map(_._1).max + 1.0
    val recoded = noCens.map { case (t, c, x) =>
      if (c >= 2) (tMax, 0, x) else (t, 1, x)
    }
    val cox = ops.Survival.coxPh(recoded.toDF("t", "e", "x"),
      col("t"), col("e"), Seq(col("x")))
    assert(math.abs(fg.coefficients(0) - cox.coefficients(0)) < 1e-8,
      s"fg ${fg.coefficients(0)} vs cox ${cox.coefficients(0)}")
    assert(math.abs(fg.stderr(0) - cox.stderr(0)) < 1e-8)
    assert(math.abs(fg.logLik - cox.logLik) < 1e-9)
  }

  test("fineGray with censoring maximizes the brute IPCW pseudo-" +
    "likelihood and reports its value as logLik") {
    val df = crFix.toDF("t", "c", "x")
    val fg = ops.Survival.fineGray(df, col("t"), col("c"), Seq(col("x")))
    val brute = bruteFineGray(crFix) _
    val bHat = ternaryMax(brute, -5.0, 5.0)
    assert(math.abs(fg.coefficients(0) - bHat) < 1e-7,
      s"fit ${fg.coefficients(0)} vs brute $bHat")
    assert(math.abs(fg.logLik - brute(bHat)) < 1e-9)
    assert(fg.nEvents === crFix.count(_._2 == 1))
    assert(fg.nCompeting === crFix.count(_._2 >= 2))
    assert(fg.nCensored === crFix.count(_._2 == 0))
  }

  test("fineGray k=2: zero numeric gradient of the brute likelihood at " +
    "the fitted beta; named errors for no events and negative cause") {
    val fix2 = crFix.zipWithIndex.map { case ((t, c, x), i) =>
      (t, c, x, ((i * 3) % 4).toDouble / 3.0)
    }
    // direct 2-covariate brute (inline, same convention)
    def bruteFG2(b1: Double, b2: Double): Double = {
      val data = fix2
      def gMinus(u: Double): Double =
        data.map(_._1).distinct.sorted.filter(_ < u).map { s =>
          val n = data.count(_._1 >= s).toDouble
          val dc = data.count(r => r._1 == s && r._2 == 0).toDouble
          if (dc == 0) 1.0 else 1.0 - dc / n
        }.product
      def eta(r: (Double, Int, Double, Double)) = b1 * r._3 + b2 * r._4
      val evTimes = data.filter(_._2 == 1).map(_._1).distinct.sorted
      evTimes.map { t =>
        val dead = data.filter(r => r._1 == t && r._2 == 1)
        val atRisk = data.filter(_._1 >= t).map(r => math.exp(eta(r))).sum
        val competing = data.filter(r => r._2 >= 2 && r._1 < t)
          .map(r => math.exp(eta(r)) / gMinus(r._1)).sum
        val w0 = atRisk + gMinus(t) * competing
        dead.map(eta).sum - dead.size * math.log(w0)
      }.sum
    }
    val df = fix2.toDF("t", "c", "x1", "x2")
    val fg = ops.Survival.fineGray(df, col("t"), col("c"),
      Seq(col("x1"), col("x2")))
    val Array(b1, b2) = fg.coefficients
    assert(math.abs(fg.logLik - bruteFG2(b1, b2)) < 1e-9)
    val h = 1e-6
    assert(math.abs((bruteFG2(b1 + h, b2) - bruteFG2(b1 - h, b2)) / (2 * h)) < 1e-4)
    assert(math.abs((bruteFG2(b1, b2 + h) - bruteFG2(b1, b2 - h)) / (2 * h)) < 1e-4)
    val exNoEv = intercept[IllegalArgumentException] {
      ops.Survival.fineGray(df.filter(col("c") =!= 1), col("t"), col("c"),
        Seq(col("x1")))
    }
    assert(exNoEv.getMessage.contains("fine_gray") &&
      exNoEv.getMessage.contains("no cause-1"))
    val exNeg = intercept[IllegalArgumentException] {
      ops.Survival.fineGray(df.withColumn("c2", col("c") - 1), col("t"),
        col("c2"), Seq(col("x1")))
    }
    assert(exNeg.getMessage.contains("negative"))
  }

  test("fineGrayCif: no competing + no censoring at beta=0/profile=0 " +
    "reduces exactly to 1 - exp(-NelsonAalen)") {
    val pure = crFix.map { case (t, _, x) => (t, 1, x) } // all cause 1
    val df = pure.toDF("t", "c", "x")
    val cif = ops.Survival.fineGrayCif(df, col("t"), col("c"),
      Seq(col("x")), Seq(0.0), Some(Array(0.0))).collect()
    val na = ops.Survival.nelsonAalen(pure.toDF("t", "e", "x"),
        col("t"), lit(1)).orderBy(col("time")).collect()
    assert(cif.length === na.length)
    cif.zip(na).foreach { case (cr, nr) =>
      assert(cr.getDouble(0) === nr.getAs[Double]("time"))
      val want = 1.0 - nr.getAs[Double]("fh_survival")
      assert(math.abs(cr.getAs[Double]("cif") - want) < 1e-12,
        s"t=${cr.getDouble(0)}")
    }
  }

  test("fineGrayCif: monotone in [0,1], stored-beta equals fit-path at " +
    "the fitted coefficients, and h0 matches the brute W0 chain") {
    val df = crFix.toDF("t", "c", "x")
    val fit = ops.Survival.fineGray(df, col("t"), col("c"), Seq(col("x")))
    val viaFit = ops.Survival.fineGrayCif(df, col("t"), col("c"),
      Seq(col("x")), Seq(0.5)).orderBy(col("time")).collect()
    val viaStored = ops.Survival.fineGrayCif(df, col("t"), col("c"),
      Seq(col("x")), Seq(0.5), Some(fit.coefficients))
      .orderBy(col("time")).collect()
    viaFit.zip(viaStored).foreach { case (a, b) =>
      assert(math.abs(a.getAs[Double]("cif") - b.getAs[Double]("cif")) < 1e-12)
    }
    val cifs = viaFit.map(_.getAs[Double]("cif"))
    assert(cifs.forall(v => v >= 0.0 && v <= 1.0))
    assert(cifs.zip(cifs.tail).forall { case (a, b) => b >= a - 1e-15 })
    // brute W0 at the fitted beta, same convention as bruteFineGray
    val b0 = fit.coefficients(0)
    def gMinus(u: Double): Double =
      crFix.map(_._1).distinct.sorted.filter(_ < u).map { s =>
        val n = crFix.count(_._1 >= s).toDouble
        val dc = crFix.count(r => r._1 == s && r._2 == 0).toDouble
        if (dc == 0) 1.0 else 1.0 - dc / n
      }.product
    val evTimes = crFix.filter(_._2 == 1).map(_._1).distinct.sorted
    var h = 0.0
    evTimes.zip(viaFit).foreach { case (t, row) =>
      val atRisk = crFix.filter(_._1 >= t).map(r => math.exp(b0 * r._3)).sum
      val competing = crFix.filter(r => r._2 >= 2 && r._1 < t)
        .map(r => math.exp(b0 * r._3) / gMinus(r._1)).sum
      val w0 = atRisk + gMinus(t) * competing
      val d = crFix.count(r => r._1 == t && r._2 == 1)
      h += d / w0
      assert(math.abs(row.getAs[Double]("w0") - w0) < 1e-9, s"w0 at $t")
      assert(math.abs(row.getAs[Double]("h0_cum") - h) < 1e-12, s"h0 at $t")
    }
  }

  test("efronSums: polygamma closed form agrees with the explicit loop " +
    "across the threshold, and deep ties still match the brute maximum") {
    // direct loop reference (independent of the production small-d path)
    def loop(s0: Double, c0: Double, d: Int): (Double, Double, Double) = {
      var sLog = 0.0; var s1 = 0.0; var s2 = 0.0
      (0 until d).foreach { l =>
        val den = s0 - (l.toDouble / d) * c0
        sLog += math.log(den); s1 += 1.0 / den; s2 += 1.0 / (den * den)
      }
      (sLog, s1, s2)
    }
    for {
      d <- Seq(1, 2, 15, 16, 17, 40, 700, 7001)
      (s0, c0) <- Seq((10.0 * d, 1.0 * d), (3.7 * d, 3.7 * d / 2),
        (1.0 * d, 1.0 * d), (1e6, 17.0))
      if s0 >= c0
    } {
      val (wl, w1, w2) = loop(s0, c0, d)
      val (gl, g1, g2) = ops.Survival.efronSums(s0, c0, d)
      // commons-math3 digamma/trigamma document ~1e-8 RELATIVE error
      // (asymptotic-expansion branch) — the bound the production path
      // inherits; logGamma is ~1e-13
      assert(math.abs(gl - wl) < 1e-8 * math.max(1.0, math.abs(wl)),
        s"sumLog d=$d s0=$s0 c0=$c0: $gl vs $wl")
      assert(math.abs(g1 - w1) < 5e-8 * math.max(1.0, w1),
        s"sum1 d=$d s0=$s0 c0=$c0: $g1 vs $w1")
      assert(math.abs(g2 - w2) < 1e-7 * math.max(1.0, w2),
        s"sum2 d=$d s0=$s0 c0=$c0: $g2 vs $w2")
    }
    // end-to-end through the closed-form path: 3 times x 40-deep ties
    val deep = (0 until 150).map { i =>
      val t = (i % 3 + 1).toDouble
      val ev = if (i < 120) 1 else 0
      (t, ev, ((i * 13) % 11).toDouble / 10.0)
    }
    val fit = ops.Survival.coxPh(deep.toDF("t", "e", "x"), col("t"),
      col("e"), Seq(col("x")), ties = "efron")
    val brute = bruteEfron1(deep) _
    val bHat = ternaryMax(brute, -5.0, 5.0)
    assert(math.abs(fit.coefficients(0) - bHat) < 1e-7,
      s"deep-tie fit ${fit.coefficients(0)} vs brute $bHat")
    assert(math.abs(fit.logLik - brute(bHat)) < 1e-8)
  }

  test("cox verbs reject an unknown ties convention by name") {
    val df = tiedFix.toDF("t", "e", "x")
    val ex = intercept[IllegalArgumentException] {
      ops.Survival.coxPh(df, col("t"), col("e"), Seq(col("x")),
        ties = "exact")
    }
    assert(ex.getMessage.contains("cox_ph") &&
      ex.getMessage.contains("breslow|efron"))
  }

  test("perGroupFloorLookup matches per-group floorIndex on a random grid") {
    val rnd = new scala.util.Random(18)
    val perGroup = (0 until 7).map { gi =>
      s"g$gi" -> Array.fill(1 + rnd.nextInt(9))(rnd.nextInt(50).toDouble)
        .distinct.sorted
    }.sortBy(_._1)
    val groups = perGroup.map(_._1).toArray
    val flat = perGroup.flatMap(_._2).toArray
    val offsets = perGroup.scanLeft(0)(_ + _._2.length).toArray
    val byG = perGroup.toMap
    val probes = for { g <- groups.toSeq; _ <- 0 until 20 }
      yield (g, rnd.nextInt(60).toDouble - 3.0)
    val got = probes.toDF("g", "v")
      .select(col("g"), col("v"),
        graft.expr.SearchExprs.perGroupFloorLookup(col("g"), col("v"),
          groups, flat, offsets).as("out"))
      .collect()
    probes.zip(got).foreach { case ((g, v), r) =>
      val arr = byG(g)
      val ix = graft.expr.SearchOps.floorIndex(arr, v)
      val want = if (ix < 0) None else Some(arr(ix))
      val gotV = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      assert(gotV === want, s"group $g value $v grid ${arr.mkString(",")}")
    }
  }

  // ---------------------------------------------------------------
  // grayTest: Gray's K-sample CIF test (Fine-Gray score test at 0)
  // ---------------------------------------------------------------

  test("grayTest with no competing events, no censoring, untied times " +
    "reduces exactly to the log-rank chi2") {
    // untied event times, every subject an event, two groups
    val fix = Seq(
      (1.0, 0), (2.0, 1), (3.0, 0), (4.0, 1), (5.0, 1), (6.0, 0),
      (7.0, 1), (8.0, 0), (9.0, 1), (10.0, 0), (11.0, 1), (12.0, 0))
    val df = fix.toDF("t", "grp").select(col("t"), lit(1).as("c"),
      col("grp"))
    val gray = ops.Survival.grayTest(df, col("t"), col("c"), col("grp"))
      .orderBy(col("group_value")).collect()
    val lr = ops.Survival.logRankTest(fix.toDF("t", "grp"), col("grp"),
      col("t")).head()
    assert(gray.length === 2)
    assert(math.abs(gray(0).getAs[Double]("chi2") -
      lr.getAs[Double]("chi2")) < 1e-9,
      s"gray ${gray(0).getAs[Double]("chi2")} vs lr ${lr.getAs[Double]("chi2")}")
    assert(gray(0).getAs[Long]("df") === 1L)
    // observed/expected on group 1 match the log-rank O1/E1
    assert(math.abs(gray(1).getAs[Double]("observed") -
      lr.getAs[Double]("observed1")) < 1e-12)
    assert(math.abs(gray(1).getAs[Double]("expected") -
      lr.getAs[Double]("expected1")) < 1e-9)
  }

  test("grayTest matches a brute-force IPCW score/information build " +
    "with competing risks and censoring (K=2)") {
    val data = crFix.zipWithIndex.map { case ((t, c, _), i) => (t, c, i % 2) }
    val df = data.toDF("t", "c", "grp")
    val got = ops.Survival.grayTest(df, col("t"), col("c"), col("grp"))
      .orderBy(col("group_value")).collect()
    // brute: pooled censoring KM left limit, per-group IPCW risk mass
    def gMinus(u: Double): Double =
      data.map(_._1).distinct.sorted.filter(_ < u).map { s =>
        val n = data.count(_._1 >= s).toDouble
        val dc = data.count(r => r._1 == s && r._2 == 0).toDouble
        if (dc == 0) 1.0 else 1.0 - dc / n
      }.product
    val evTimes = data.filter(_._2 == 1).map(_._1).distinct.sorted
    var u = 0.0
    var inf = 0.0
    val obs = Array(0.0, 0.0)
    val expd = Array(0.0, 0.0)
    evTimes.foreach { t =>
      val w0g = (0 to 1).map { g =>
        val atRisk = data.count(r => r._1 >= t && r._3 == g).toDouble
        val comp = data.filter(r => r._2 >= 2 && r._1 < t && r._3 == g)
          .map(r => 1.0 / gMinus(r._1)).sum
        atRisk + gMinus(t) * comp
      }
      val w0 = w0g.sum
      val d = (0 to 1).map(g =>
        data.count(r => r._1 == t && r._2 == 1 && r._3 == g).toDouble)
      val dTot = d.sum
      (0 to 1).foreach { g =>
        obs(g) += d(g); expd(g) += dTot * w0g(g) / w0
      }
      val f = w0g(1) / w0
      u += d(1) - dTot * f
      inf += dTot * (f - f * f)
    }
    val chi2 = u * u / inf
    assert(math.abs(got(0).getAs[Double]("chi2") - chi2) < 1e-9,
      s"got ${got(0).getAs[Double]("chi2")} want $chi2")
    (0 to 1).foreach { g =>
      assert(math.abs(got(g).getAs[Double]("observed") - obs(g)) < 1e-12)
      assert(math.abs(got(g).getAs[Double]("expected") - expd(g)) < 1e-9)
      assert(got(g).getAs[Long]("n") ===
        data.count(_._3 == g).toLong)
      assert(got(g).getAs[Long]("n_events") ===
        data.count(r => r._3 == g && r._2 == 1).toLong)
      assert(got(g).getAs[Long]("n_competing") ===
        data.count(r => r._3 == g && r._2 >= 2).toLong)
    }
    val p = got(0).getAs[Double]("p_value")
    assert(p > 0.0 && p <= 1.0)
  }

  test("grayTest K=3: observed sums to total cause-1 events, expected " +
    "sums to observed, df=2, and relabeling groups preserves chi2") {
    val data = crFix.zipWithIndex.map { case ((t, c, _), i) => (t, c, i % 3) }
    val df = data.toDF("t", "c", "grp")
    val got = ops.Survival.grayTest(df, col("t"), col("c"), col("grp"))
      .orderBy(col("group_value")).collect()
    assert(got.length === 3)
    assert(got(0).getAs[Long]("df") === 2L)
    val sumObs = got.map(_.getAs[Double]("observed")).sum
    val sumExp = got.map(_.getAs[Double]("expected")).sum
    assert(math.abs(sumObs - data.count(_._2 == 1)) < 1e-12)
    assert(math.abs(sumExp - sumObs) < 1e-9)
    // relabel groups with strings in a DIFFERENT sort order; the test
    // statistic is label-invariant even though the reference group moves
    val relabeled = data.map { case (t, c, g) => (t, c, s"z${2 - g}") }
    val got2 = ops.Survival.grayTest(relabeled.toDF("t", "c", "grp"),
      col("t"), col("c"), col("grp")).head()
    assert(math.abs(got2.getAs[Double]("chi2") -
      got(0).getAs[Double]("chi2")) < 1e-9)
  }

  // ---------------------------------------------------------------
  // plattScore: parametric calibration
  // ---------------------------------------------------------------

  test("plattScore: calibrated equals the fitted sigmoid per row, is " +
    "monotone, and mean(calibrated) over train equals mean(label) " +
    "exactly (the intercept score equation)") {
    val rows = (0 until 240).map { i =>
      val s = i / 240.0
      val u = (math.sin(i * 2.39996) + 1.0) / 2.0
      (s, if (u < 1.0 / (1.0 + math.exp(-(3.0 * s - 1.5)))) 1.0 else 0.0)
    }
    val df = rows.toDF("s", "y")
    val fit = ops.MlWrappers.logisticIrls(df, col("y"), Seq(col("s")))
    val got = ops.MlEval.plattScore(df, col("s"), col("y"), df, col("s"))
      .orderBy(col("s")).collect()
    got.foreach { r =>
      val want = 1.0 / (1.0 +
        math.exp(-(fit.intercept + fit.coefficients(0) * r.getAs[Double]("s"))))
      assert(math.abs(r.getAs[Double]("calibrated") - want) < 1e-12)
    }
    val cal = got.map(_.getAs[Double]("calibrated"))
    assert(cal.zip(cal.tail).forall { case (a, b) => b >= a },
      "not monotone (b should be positive on this fixture)")
    val meanCal = cal.sum / cal.length
    val meanY = rows.map(_._2).sum / rows.length
    assert(math.abs(meanCal - meanY) < 1e-8, s"$meanCal vs $meanY")
    // gateway wiring: train table registered by name
    df.createOrReplaceTempView("platt_train")
    df.createOrReplaceTempView("platt_target")
    val viaSql = GraftGateway.sql(spark,
      "SELECT platt_score(s, y, 'platt_train') FROM platt_target")
    assert(viaSql.columns.contains("calibrated") &&
      viaSql.count() === 240L)
  }

  // ---------------------------------------------------------------
  // gammaIrls: positive-continuous GLM (log link)
  // ---------------------------------------------------------------

  test("gammaIrls: intercept-only closes to mean(y) exactly, score " +
    "equations vanish at the fit, scale equivariance, named y<=0 error") {
    val rnd = new scala.util.Random(23)
    val rows = (0 until 300).map { i =>
      val x = (i % 10) / 5.0
      // mean exp(0.5 + 0.6x), gamma-ish multiplicative noise
      val noise = math.exp(0.5 * rnd.nextGaussian() - 0.125)
      (math.exp(0.5 + 0.6 * x) * noise, x)
    }
    val df = rows.toDF("y", "x")
    // intercept-only: mu-hat = mean(y) EXACTLY (the score closes)
    val fI = ops.MlWrappers.gammaIrls(df, col("y"), Seq.empty)
    val ybar = rows.map(_._1).sum / rows.length
    assert(math.abs(math.exp(fI.intercept) - ybar) < 1e-9 * ybar,
      s"${math.exp(fI.intercept)} vs $ybar")
    // full fit: score equations sum(y/mu - 1) = 0 and sum((y/mu - 1)x) = 0
    val fit = ops.MlWrappers.gammaIrls(df, col("y"), Seq(col("x")))
    assert(fit.converged)
    val scores = rows.map { case (yv, xv) =>
      val mu = math.exp(fit.intercept + fit.coefficients(0) * xv)
      (yv / mu - 1.0, (yv / mu - 1.0) * xv)
    }
    assert(math.abs(scores.map(_._1).sum) < 1e-6,
      s"score0 ${scores.map(_._1).sum}")
    assert(math.abs(scores.map(_._2).sum) < 1e-6,
      s"scoreX ${scores.map(_._2).sum}")
    // scale equivariance: y -> 100y shifts only the intercept by ln 100
    val f100 = ops.MlWrappers.gammaIrls(
      rows.map { case (yv, xv) => (yv * 100.0, xv) }.toDF("y", "x"),
      col("y"), Seq(col("x")))
    assert(math.abs(f100.intercept - fit.intercept - math.log(100.0)) < 1e-7)
    assert(math.abs(f100.coefficients(0) - fit.coefficients(0)) < 1e-7)
    assert(math.abs(f100.dispersion - fit.dispersion) < 1e-7)
    assert(math.abs(f100.stderr(0) - fit.stderr(0)) < 1e-7)
    val e1 = intercept[IllegalArgumentException] {
      ops.MlWrappers.gammaIrls(df.withColumn("y2", col("y") - 3.0),
        col("y2"), Seq(col("x")))
    }
    assert(e1.getMessage.contains("gamma_reg") &&
      e1.getMessage.contains("y <= 0"))
  }

  // ---------------------------------------------------------------
  // bartlettTest / breslowDay / designEffect
  // ---------------------------------------------------------------

  test("bartlettTest matches the textbook closed form and names its " +
    "errors") {
    val rnd = new scala.util.Random(11)
    val data = (0 until 60).map { i =>
      val arm = i % 3
      (s"a$arm", 10.0 + arm + (1.0 + 0.5 * arm) * rnd.nextGaussian())
    }
    val df = data.toDF("arm", "y")
    val got = ops.SimpleTests.bartlettTest(df, col("y"), col("arm")).head()
    // brute
    val byArm = data.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val k = byArm.size
    val n = data.length
    val vars = byArm.view.mapValues { ys =>
      val m = ys.sum / ys.length
      ys.map(v => (v - m) * (v - m)).sum / (ys.length - 1)
    }.toMap
    val sp2 = byArm.map { case (a, ys) => (ys.length - 1) * vars(a) }.sum /
      (n - k)
    val c = 1.0 + (byArm.values.map(ys => 1.0 / (ys.length - 1)).sum -
      1.0 / (n - k)) / (3.0 * (k - 1))
    val t = ((n - k) * math.log(sp2) -
      byArm.map { case (a, ys) => (ys.length - 1) * math.log(vars(a)) }.sum) / c
    assert(math.abs(got.getAs[Double]("statistic") - t) < 1e-9,
      s"got ${got.getAs[Double]("statistic")} want $t")
    assert(got.getAs[Long]("k") === 3L)
    assert(got.getAs[Double]("p_value") > 0 &&
      got.getAs[Double]("p_value") <= 1)
    val e1 = intercept[IllegalArgumentException] {
      ops.SimpleTests.bartlettTest(df, col("y"), lit("one"))
    }
    assert(e1.getMessage.contains("bartlett") &&
      e1.getMessage.contains("at least 2"))
    val e2 = intercept[IllegalArgumentException] {
      ops.SimpleTests.bartlettTest(
        df.withColumn("y2", when(col("arm") === "a0", 5.0)
          .otherwise(col("y"))), col("y2"), col("arm"))
    }
    assert(e2.getMessage.contains("zero variance"))
  }

  test("breslowDay matches a brute per-stratum quadratic build; " +
    "homogeneous strata give a small statistic") {
    // 3 strata with similar ORs + one with a planted different OR
    val tables = Seq( // (a, b, c, d) per stratum
      (20L, 10L, 12L, 18L), (35L, 15L, 20L, 30L), (12L, 8L, 7L, 13L),
      (5L, 25L, 22L, 8L))
    val rows = tables.zipWithIndex.flatMap { case ((a, b, c, d), s) =>
      Seq.fill(a.toInt)((s"s$s", 1, 1)) ++ Seq.fill(b.toInt)((s"s$s", 1, 0)) ++
        Seq.fill(c.toInt)((s"s$s", 0, 1)) ++ Seq.fill(d.toInt)((s"s$s", 0, 0))
    }
    val df = rows.toDF("s", "t", "y")
    val got = ops.Contingency.breslowDay(df, col("s"), col("t"), col("y"))
      .head()
    // brute
    val orMh = tables.map { case (a, b, c, d) =>
      a.toDouble * d / (a + b + c + d) }.sum /
      tables.map { case (a, b, c, d) => b.toDouble * c / (a + b + c + d) }.sum
    var t0 = 0.0; var sd0 = 0.0; var sv0 = 0.0
    tables.foreach { case (a, b, c, d) =>
      val n = (a + b + c + d).toDouble
      val r1 = (a + b).toDouble; val c1 = (a + c).toDouble
      val qa = 1.0 - orMh
      val qb = (n - r1 - c1) + orMh * (r1 + c1)
      val qc = -orMh * r1 * c1
      val sq = math.sqrt(qb * qb - 4 * qa * qc)
      val x1 = (-qb + sq) / (2 * qa); val x2 = (-qb - sq) / (2 * qa)
      val lo = math.max(0.0, r1 + c1 - n); val hi = math.min(r1, c1)
      val e = if (x1 > lo && x1 < hi) x1 else x2
      val v = 1.0 / (1.0 / e + 1.0 / (r1 - e) + 1.0 / (c1 - e) +
        1.0 / (n - r1 - c1 + e))
      t0 += (a - e) * (a - e) / v; sd0 += a - e; sv0 += v
    }
    assert(math.abs(got.getAs[Double]("bd_chisq") - t0) < 1e-9,
      s"got ${got.getAs[Double]("bd_chisq")} want $t0")
    assert(math.abs(got.getAs[Double]("tarone_chisq") -
      (t0 - sd0 * sd0 / sv0)) < 1e-9)
    assert(math.abs(got.getAs[Double]("or_mh") - orMh) < 1e-12)
    assert(got.getAs[Long]("strata") === 4L && got.getAs[Long]("df") === 3L)
    // homogeneous: every stratum shares OR = 3 exactly in expectation
    val homo = Seq((30L, 10L, 10L, 10L), (60L, 20L, 20L, 20L),
      (15L, 5L, 5L, 5L))
    val hrows = homo.zipWithIndex.flatMap { case ((a, b, c, d), s) =>
      Seq.fill(a.toInt)((s"s$s", 1, 1)) ++ Seq.fill(b.toInt)((s"s$s", 1, 0)) ++
        Seq.fill(c.toInt)((s"s$s", 0, 1)) ++ Seq.fill(d.toInt)((s"s$s", 0, 0))
    }
    val gh = ops.Contingency.breslowDay(hrows.toDF("s", "t", "y"),
      col("s"), col("t"), col("y")).head()
    assert(gh.getAs[Double]("bd_chisq") < 1e-9, // identical tables: exact fit
      s"homogeneous chisq ${gh.getAs[Double]("bd_chisq")}")
    assert(gh.getAs[Double]("p_value") > 0.999)
  }

  test("designEffect: equal weights give deff exactly 1, known skewed " +
    "weights match the closed form, grouped and error paths work") {
    val eq = (1 to 40).map(i => (1.0 + i * 0.0, s"g${i % 2}"))
      .toDF("w", "g")
    val r1 = ops.SimpleTests.designEffect(eq, col("w")).head()
    assert(math.abs(r1.getAs[Double]("deff") - 1.0) < 1e-12)
    assert(math.abs(r1.getAs[Double]("ess") - 40.0) < 1e-9)
    val ws = Seq(1.0, 2.0, 3.0, 4.0)
    val r2 = ops.SimpleTests.designEffect(ws.toDF("w"), col("w")).head()
    val deff = 4.0 * ws.map(w => w * w).sum / math.pow(ws.sum, 2)
    assert(math.abs(r2.getAs[Double]("deff") - deff) < 1e-12)
    val rg = ops.SimpleTests.designEffect(eq, col("w"), Some(col("g")))
      .orderBy(col("group_value")).collect()
    assert(rg.length === 2 && rg(0).getString(0) === "g0" &&
      rg(0).getAs[Long]("n") === 20L)
    val e1 = intercept[IllegalArgumentException] {
      ops.SimpleTests.designEffect(Seq(-1.0, 2.0).toDF("w"), col("w"))
    }
    assert(e1.getMessage.contains("design_effect") &&
      e1.getMessage.contains("negative"))
  }

  // ---------------------------------------------------------------
  // acfPacf: Box-Jenkins order identification
  // ---------------------------------------------------------------

  test("acfPacf: acf matches ljungBox, pacf follows Durbin-Levinson " +
    "closed forms, band is 1.96/sqrt(T)") {
    val ys = Seq(3.0, 5.0, 4.0, 6.0, 5.5, 7.0, 6.2, 8.1, 7.4, 9.0,
      8.2, 10.1, 9.3, 11.0, 10.4, 12.2)
    val df = ys.zipWithIndex.map { case (y, i) => (i.toLong, y) }
      .toDF("p", "y")
    val got = ops.Drift.acfPacf(df, col("p"), col("y"), lags = 3)
      .orderBy(col("lag")).collect()
    val lb = ops.Drift.ljungBox(df, col("p"), col("y"), lags = 3)
      .orderBy(col("lag")).collect()
    got.zip(lb).foreach { case (a, b) =>
      assert(math.abs(a.getAs[Double]("acf") - b.getAs[Double]("acf")) < 1e-12)
    }
    val r = got.map(_.getAs[Double]("acf"))
    val p1 = r(0)
    val p2 = (r(1) - r(0) * r(0)) / (1.0 - r(0) * r(0))
    // DL step to k=3: phi21 = r1(1 - phi22), phi22 = p2
    val phi21 = p1 - p2 * p1
    val p3 = (r(2) - phi21 * r(1) - p2 * r(0)) /
      (1.0 - phi21 * r(0) - p2 * r(1))
    val wantP = Seq(p1, p2, p3)
    got.map(_.getAs[Double]("pacf")).zip(wantP).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-12, s"pacf $g vs $w")
    }
    assert(math.abs(got(0).getAs[Double]("ci_band") -
      1.96 / math.sqrt(16.0)) < 1e-12)
    val ex = intercept[IllegalArgumentException] {
      ops.Drift.acfPacf(df, col("p"), lit(1.0), lags = 3)
    }
    assert(ex.getMessage.contains("acf_pacf") &&
      ex.getMessage.contains("constant"))
  }

  // ---------------------------------------------------------------
  // vif: variance inflation factors
  // ---------------------------------------------------------------

  test("vif: k=2 symmetry 1/(1-r^2), near-collinear triple blows up, " +
    "orthogonal columns give exactly 1, named errors") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val x1 = rnd.nextDouble()
      val x2 = rnd.nextDouble()
      (x1, x2, x1 + x2 + 0.01 * rnd.nextDouble())
    }
    val df = rows.toDF("x1", "x2", "x3")
    // k=2: both terms = 1/(1-r^2)
    val v2 = ops.Regression.vif(df, Seq(col("x1"), col("x2")),
      Seq("x1", "x2")).orderBy(col("term")).collect()
    val xs1 = rows.map(_._1); val xs2 = rows.map(_._2)
    val n = rows.length
    val m1 = xs1.sum / n; val m2 = xs2.sum / n
    val c12 = xs1.zip(xs2).map { case (a, b) => (a - m1) * (b - m2) }.sum
    val v1 = xs1.map(a => (a - m1) * (a - m1)).sum
    val v2s = xs2.map(b => (b - m2) * (b - m2)).sum
    val r = c12 / math.sqrt(v1 * v2s)
    val want = 1.0 / (1.0 - r * r)
    v2.foreach { row =>
      assert(math.abs(row.getAs[Double]("vif") - want) < 1e-9)
      assert(math.abs(row.getAs[Double]("tolerance") * want - 1.0) < 1e-9)
    }
    // near-collinear: x3 ~ x1 + x2 => all three VIFs large
    val v3 = ops.Regression.vif(df,
      Seq(col("x1"), col("x2"), col("x3")), Seq("x1", "x2", "x3"))
      .collect()
    assert(v3.forall(_.getAs[Double]("vif") > 100.0),
      v3.map(_.getAs[Double]("vif")).mkString(","))
    // exactly orthogonal: alternating patterns with zero correlation
    val ortho = (0 until 8).map { i =>
      (if (i % 2 == 0) 1.0 else -1.0, if (i % 4 < 2) 1.0 else -1.0)
    }.toDF("a", "b")
    val vo = ops.Regression.vif(ortho, Seq(col("a"), col("b")),
      Seq("a", "b")).collect()
    vo.foreach(row => assert(math.abs(row.getAs[Double]("vif") - 1.0) < 1e-12))
    val e1 = intercept[IllegalArgumentException] {
      ops.Regression.vif(df, Seq(col("x1"), lit(2.0)), Seq("x1", "c"))
    }
    assert(e1.getMessage.contains("vif") && e1.getMessage.contains("constant"))
    val e2 = intercept[IllegalArgumentException] {
      ops.Regression.vif(df,
        Seq(col("x1"), col("x2"), col("x1") + col("x2")),
        Seq("x1", "x2", "sum"))
    }
    assert(e2.getMessage.contains("collinear"))
    val e3 = intercept[IllegalArgumentException] {
      ops.Regression.vif(df, Seq(col("x1")), Seq("x1"))
    }
    assert(e3.getMessage.contains("at least 2"))
  }

  // ---------------------------------------------------------------
  // synthDid: synthetic difference-in-differences
  // ---------------------------------------------------------------

  // periods 1..8 (pre <= 4.5): two NONPARALLEL donors, treated units =
  // the 0.5/0.5 donor mix + unit-specific LEVELS + an additive post
  // effect of 5 — levels must be absorbed by the DID differencing and
  // the intercepted weight fits, and the effect recovered exactly
  private def sdidFix(effect: Double): Seq[(String, Double, Double, Int)] = {
    val periods = (1 to 8).map(_.toDouble)
    def d1(t: Double) = 10.0 + t
    def d2(t: Double) = 20.0 + 2.0 * t
    val mix = (t: Double) => 0.5 * d1(t) + 0.5 * d2(t)
    periods.flatMap { t =>
      val post = if (t > 4.5) 1.0 else 0.0
      Seq(
        ("d1", t, d1(t), 0), ("d2", t, d2(t), 0),
        ("tr_a", t, mix(t) + 3.0 + effect * post, 1),
        ("tr_b", t, mix(t) - 2.0 + effect * post, 1))
    }
  }

  test("synthDid recovers an additive post effect EXACTLY when the " +
    "treated pre-path is a convex donor mix (unit levels absorbed), " +
    "and is invariant to a global level shift") {
    val df = sdidFix(5.0).toDF("u", "p", "v", "tr")
    val r = ops.SynthControl.synthDid(df, col("u"), col("p"), col("v"),
      col("tr"), 4.5).head()
    assert(math.abs(r.getAs[Double]("att") - 5.0) < 1e-8,
      s"att ${r.getAs[Double]("att")}")
    assert(r.getAs[String]("se_method") === "jackknife_treated")
    assert(r.getAs[Long]("n_treated") === 2L)
    assert(r.getAs[Long]("n_donors") === 2L)
    assert(r.getAs[Long]("n_pre") === 4L && r.getAs[Long]("n_post") === 4L)
    // each leave-one-treated-out replicate also recovers 5 exactly
    assert(r.getAs[Double]("se") < 1e-8)
    val shifted = sdidFix(5.0).map { case (u, p, v, t) =>
      (u, p, v + 1000.0, t) }.toDF("u", "p", "v", "tr")
    val r2 = ops.SynthControl.synthDid(shifted, col("u"), col("p"),
      col("v"), col("tr"), 4.5).head()
    assert(math.abs(r2.getAs[Double]("att") - 5.0) < 1e-6)
    // null effect: att collapses to 0
    val r0 = ops.SynthControl.synthDid(sdidFix(0.0).toDF("u", "p", "v", "tr"),
      col("u"), col("p"), col("v"), col("tr"), 4.5).head()
    assert(math.abs(r0.getAs[Double]("att")) < 1e-8)
  }

  test("synthDid single treated unit: in-space placebo SE over the " +
    "donor pool, gateway verb works") {
    val periods = (1 to 8).map(_.toDouble)
    val rows = periods.flatMap { t =>
      val post = if (t > 4.5) 1.0 else 0.0
      Seq(("d1", t, 10.0 + t, 0), ("d2", t, 20.0 + 2.0 * t, 0),
        ("d3", t, 5.0 + 0.5 * t + 0.3 * math.sin(t), 0),
        ("d4", t, 8.0 + 3.0 * t - 0.2 * t * t, 0),
        ("tr", t, 14.0 + 1.4 * t + 4.0 * post, 1))
    }
    rows.toDF("u", "p", "v", "tr").createOrReplaceTempView("sdid_one")
    val r = GraftGateway.sql(spark,
      "SELECT synth_did(u, p, v, tr, 4.5) FROM sdid_one").head()
    assert(r.getAs[Long]("n_treated") === 1L)
    assert(r.getAs[String]("se_method") === "placebo_4")
    assert(r.getAs[Double]("se") > 0.0)
    assert(!r.getAs[Double]("att").isNaN)
  }

  test("synthDid names its errors: no treated, too few donors, too few " +
    "pre-periods") {
    val df = sdidFix(5.0).toDF("u", "p", "v", "tr")
    val e1 = intercept[IllegalArgumentException] {
      ops.SynthControl.synthDid(df, col("u"), col("p"), col("v"),
        lit(0), 4.5)
    }
    assert(e1.getMessage.contains("synth_did") &&
      e1.getMessage.contains("no complete treated"))
    val e2 = intercept[IllegalArgumentException] {
      ops.SynthControl.synthDid(df.filter(col("u") =!= "d2"), col("u"),
        col("p"), col("v"), col("tr"), 4.5)
    }
    assert(e2.getMessage.contains(">= 2 complete donor"))
    val e3 = intercept[IllegalArgumentException] {
      ops.SynthControl.synthDid(df, col("u"), col("p"), col("v"),
        col("tr"), 1.5)
    }
    assert(e3.getMessage.contains(">= 2 pre-periods"))
  }

  test("grayTest names its errors: single group and too many groups") {
    val df = crFix.toDF("t", "c", "x")
    val ex1 = intercept[IllegalArgumentException] {
      ops.Survival.grayTest(df, col("t"), col("c"), lit("only"))
    }
    assert(ex1.getMessage.contains("gray_test") &&
      ex1.getMessage.contains("at least 2"))
    val ex2 = intercept[IllegalArgumentException] {
      ops.Survival.grayTest(df.withColumn("g", col("x")), col("t"),
        col("c"), col("g"), maxGroups = 2)
    }
    assert(ex2.getMessage.contains("gray_test") &&
      ex2.getMessage.contains("maxGroups"))
  }
}
