package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-17 additions: Agresti asymptotic inference for ordinal_assoc
  * (gamma / Somers' D ASEs validated three ways — a brute-force O(n²)
  * row-pair implementation, a numeric delta-method gradient under the
  * multinomial covariance, and the exact permutation-null variance on a
  * tied fixture, the kendall_tau discipline), the isotonic apply verb
  * (step-function boundary/between/clamp/null semantics), the NB2 alpha
  * SE + Poisson-vs-NB2 likelihood-ratio test (closed term-by-term on
  * the saturated fixture), the cox_zph per-covariate trend direction
  * (k=1 identity (θ/se)² = χ² and the planted-drift sign), stratified
  * Cox PH (one-stratum ≡ coxPh; score test ≡ summed per-stratum
  * log-rank; brute stratified partial likelihood maximized at β̂), Cox
  * survival prediction (exact Nelson-Aalen reduction at β = 0; brute
  * risk-set H₀ identity; fit-path monotonicity), and the RMST
  * difference test (per-arm composition to 1e-12; binary-group guard). */
class Round17OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // tied fixture on both margins (3×3 lattice, 12 rows, non-uniform)
  private val oaXs = Seq(1, 1, 1, 1, 2, 2, 2, 3, 3, 3, 3, 3)
  private val oaYs = Seq(1, 1, 2, 3, 1, 2, 2, 1, 2, 3, 3, 3)

  /** brute-force row-pair computation of every ordinalAssoc output —
    * an independent O(n²) code path with per-ROW neighbor masses (rows
    * of one cell share A/B, so the cell sums match exactly). */
  private def bruteOrdinal(xs: Seq[Int], ys: Seq[Int])
  : Map[String, Double] = {
    val n = xs.length
    val a = new Array[Double](n); val b = new Array[Double](n)
    var conc = 0.0; var disc = 0.0; var tx = 0.0; var ty = 0.0
    for (i <- 0 until n; j <- i + 1 until n) {
      val cx = Integer.compare(xs(i), xs(j))
      val cy = Integer.compare(ys(i), ys(j))
      if (cx == 0) { if (cy != 0) tx += 1 }
      else if (cy == 0) ty += 1
      else if (cx == cy) { conc += 1; a(i) += 1; a(j) += 1 }
      else { disc += 1; b(i) += 1; b(j) += 1 }
    }
    val p = 2 * conc; val q = 2 * disc
    val w = 2 * (conc + disc + ty)
    val rowTot = xs.groupBy(identity).map { case (k, v) => k -> v.size }
    var sGam = 0.0; var sCd2 = 0.0; var sSom = 0.0
    for (i <- 0 until n) {
      val d = a(i) - b(i)
      val g = q * a(i) - p * b(i)
      val s = w * d - (p - q) * (n - rowTot(xs(i)))
      sGam += g * g; sCd2 += d * d; sSom += s * s
    }
    val gamma = (conc - disc) / (conc + disc)
    val somers = (conc - disc) / (conc + disc + ty)
    Map(
      "gamma" -> gamma,
      "somers_d" -> somers,
      "gamma_ase" -> 4 * math.sqrt(sGam) / ((p + q) * (p + q)),
      "somers_ase" -> 2 * math.sqrt(sSom) / (w * w),
      "gamma_var0" -> 16 * (sCd2 - (p - q) * (p - q) / n) / ((p + q) * (p + q)),
      "somers_var0" -> 4 * (sCd2 - (p - q) * (p - q) / n) / (w * w))
  }

  test("ordinalAssoc: cell-path inference equals the brute row-pair path") {
    val r = graft.ops.Contingency.ordinalAssoc(
      oaXs.zip(oaYs).toDF("x", "y"), col("x"), col("y")).head()
    val bf = bruteOrdinal(oaXs, oaYs)
    for (k <- Seq("gamma", "somers_d", "gamma_ase", "somers_ase"))
      assert(math.abs(r.getAs[Double](k) - bf(k)) < 1e-12,
        s"$k: cell ${r.getAs[Double](k)} vs brute ${bf(k)}")
    assert(math.abs(r.getAs[Double]("gamma_z") -
      bf("gamma") / math.sqrt(bf("gamma_var0"))) < 1e-12)
    assert(math.abs(r.getAs[Double]("somers_z") -
      bf("somers_d") / math.sqrt(bf("somers_var0"))) < 1e-12)
  }

  test("ordinalAssoc: ASEs match a numeric delta-method gradient") {
    // statistic as a function of cell PROPORTIONS; multinomial
    // covariance (diag(p) − pp^T)/n; both statistics are 0-homogeneous
    // so Σ p_k g_k = 0 and var = Σ p_k g_k² / n
    val cells = oaXs.zip(oaYs).groupBy(identity).toSeq
      .map { case ((x, y), v) => (x, y, v.size.toDouble) }
    val n = oaXs.length.toDouble
    def stat(cnt: Seq[Double], which: String): Double = {
      var conc = 0.0; var disc = 0.0; var ty = 0.0
      for (i <- cells.indices; j <- i + 1 until cells.length) {
        val (xi, yi, _) = cells(i); val (xj, yj, _) = cells(j)
        val w = cnt(i) * cnt(j)
        if (xi != xj) {
          if (yi == yj) ty += w
          else if ((xi < xj) == (yi < yj)) conc += w
          else disc += w
        }
      }
      if (which == "gamma") (conc - disc) / (conc + disc)
      else (conc - disc) / (conc + disc + ty)
    }
    val base = cells.map(_._3)
    def numericAse(which: String): Double = {
      val h = 1e-6
      val grad = cells.indices.map { k =>
        val up = base.updated(k, base(k) + h)
        val dn = base.updated(k, base(k) - h)
        (stat(up, which) - stat(dn, which)) / (2 * h)
      }
      // delta method with multinomial counts: Var = Σ n_k g_k² − (Σ n_k g_k)²/n
      val s2 = cells.indices.map(k => base(k) * grad(k) * grad(k)).sum
      val s1 = cells.indices.map(k => base(k) * grad(k)).sum
      math.sqrt(s2 - s1 * s1 / n)
    }
    val r = graft.ops.Contingency.ordinalAssoc(
      oaXs.zip(oaYs).toDF("x", "y"), col("x"), col("y")).head()
    assert(math.abs(r.getAs[Double]("gamma_ase") - numericAse("gamma")) < 1e-5,
      s"gamma: ${r.getAs[Double]("gamma_ase")} vs ${numericAse("gamma")}")
    assert(math.abs(r.getAs[Double]("somers_ase") - numericAse("somers")) < 1e-5,
      s"somers: ${r.getAs[Double]("somers_ase")} vs ${numericAse("somers")}")
  }

  test("ordinalAssoc: Somers' z tracks the exact permutation null") {
    // Somers' denominator is margin-fixed, so the exact permutation z is
    // S/√Var_perm(S) with S = C − D; enumerate all 12! / (multiplicities)
    // pairings via distinct permutations of the y multiset
    val perms = oaYs.permutations.toVector
    def sOf(y: Seq[Int]): Double = {
      var s = 0.0
      for (i <- oaXs.indices; j <- i + 1 until oaXs.length) {
        val cx = Integer.compare(oaXs(i), oaXs(j))
        val cy = Integer.compare(y(i), y(j))
        if (cx != 0 && cy != 0) s += (if (cx == cy) 1 else -1)
      }
      s
    }
    val ss = perms.map(sOf)
    val mean = ss.sum / ss.length
    val empVar = ss.map(s => (s - mean) * (s - mean)).sum / ss.length
    assert(math.abs(mean) < 1e-9)
    // the exact null variance agrees with kendallTau's four-term Var(S)
    val kt = graft.ops.Agreement.kendallTau(
      oaXs.zip(oaYs).toDF("x", "y"), col("x"), col("y")).head()
    assert(math.abs(kt.getAs[Double]("var_s") - empVar) < 1e-9)
    // the var0-based somers_z approximates the exact z on this fixture
    val r = graft.ops.Contingency.ordinalAssoc(
      oaXs.zip(oaYs).toDF("x", "y"), col("x"), col("y")).head()
    val sObs = (kt.getAs[Long]("concordant") -
      kt.getAs[Long]("discordant")).toDouble
    val zExact = sObs / math.sqrt(empVar)
    val zAsym = r.getAs[Double]("somers_z")
    assert(math.abs(zAsym - zExact) / math.abs(zExact) < 0.15,
      s"asymptotic $zAsym vs exact-permutation $zExact")
  }

  test("isotonicScore: step-function application with clamping") {
    // train: scores 1,2,3,4 with rates .2,.6,.4,.8 — PAVA pools (2,3)
    // to .5, so blocks are [1→.2, 2→.5, 4→.8]
    val train = Seq(
      (1.0, 1), (1.0, 0), (1.0, 0), (1.0, 0), (1.0, 0),
      (2.0, 1), (2.0, 1), (2.0, 1), (2.0, 0), (2.0, 0),
      (3.0, 1), (3.0, 1), (3.0, 0), (3.0, 0), (3.0, 0),
      (4.0, 1), (4.0, 1), (4.0, 1), (4.0, 1), (4.0, 0)
    ).toDF("s", "y")
    val target = Seq(
      Some(0.5),  // below range → clamp to first block (.2)
      Some(1.0),  // exact boundary → .2
      Some(1.9),  // between 1 and 2 → carry 1's block (.2)
      Some(2.0),  // boundary of pooled block → .5
      Some(3.7),  // inside pooled block → .5
      Some(4.0),  // boundary → .8
      Some(99.0), // above range → carry last block (.8)
      None        // null → null
    ).toDF("s")
    val out = graft.ops.MlEval.isotonicScore(
      train, col("s"), col("y"), target, col("s"))
      .collect().map(r =>
        (Option(r.get(0)).map(_.asInstanceOf[Double]),
          Option(r.get(1)).map(_.asInstanceOf[Double]))).toMap
    assert(out(Some(0.5)) == Some(0.2))
    assert(out(Some(1.0)) == Some(0.2))
    assert(out(Some(1.9)) == Some(0.2))
    assert(out(Some(2.0)) == Some(0.5))
    assert(out(Some(3.7)) == Some(0.5))
    assert(out(Some(4.0)) == Some(0.8))
    assert(out(Some(99.0)) == Some(0.8))
    assert(out(None).isEmpty)
  }

  test("negBinIrls: alpha SE and Poisson-vs-NB2 LR close on the saturated fixture") {
    // the q269 lattice: arm0 y in {0,0,2}, arm1 y in {0,1,9}; arm means
    // are the MLE for BOTH models, so every inference term closes
    val rows = (0 until 60).map { i =>
      val y = (i % 6) match { case 3 => 1.0; case 4 => 2.0; case 5 => 9.0; case _ => 0.0 }
      (y, i % 2)
    }
    val fit = graft.ops.MlWrappers.negBinIrls(
      rows.toDF("y", "x"), col("y"), Seq(col("x")))
    import org.apache.commons.math3.special.Gamma.logGamma
    val m = rows.groupBy(_._2).map { case (x, v) =>
      x -> v.map(_._1).sum / v.size }
    val mu = rows.map { case (_, x) => m(x) }
    val ys = rows.map(_._1)
    val alpha = ys.zip(mu).map { case (y, u) => (y - u) * (y - u) - u }.sum /
      mu.map(u => u * u).sum
    assert(math.abs(fit.alpha - alpha) < 1e-9)
    // auxiliary OLS SE at the pilot means
    val uRes = ys.zip(mu).map { case (y, u) =>
      ((y - u) * (y - u) - u) / u - alpha * u }
    val se = math.sqrt(uRes.map(r => r * r).sum / (ys.length - 1) /
      mu.map(u => u * u).sum)
    assert(math.abs(fit.alphaSe - se) < 1e-9,
      s"alpha_se ${fit.alphaSe} vs closed $se")
    // log-likelihoods term by term
    val llP = ys.zip(mu).map { case (y, u) =>
      y * math.log(u) - u - logGamma(y + 1) }.sum
    val r = 1.0 / alpha
    val llN = ys.zip(mu).map { case (y, u) =>
      logGamma(y + r) - logGamma(r) - logGamma(y + 1) +
        r * math.log(r / (r + u)) + y * math.log(u / (r + u)) }.sum
    assert(math.abs(fit.llPois - llP) < 1e-8)
    assert(math.abs(fit.llNb - llN) < 1e-8)
    assert(math.abs(fit.lrStat - 2 * (llN - llP)) < 1e-8)
    // overdispersed fixture: NB2 must beat Poisson decisively (LR ≈ 79
    // here, so the boundary p underflows to 0 in double — allowed)
    assert(fit.lrStat > 10)
    assert(fit.lrP >= 0 && fit.lrP <= 0.5)
  }

  test("coxZph: theta reports the drift direction and closes with chisq") {
    import graft.ops.Survival
    // the r16 planted non-PH fixture: treated die fast EARLY, slow LATE
    // — beta(t) decreasing in t, so theta must be negative
    val rng = new scala.util.Random(11)
    val rows = (0 until 120).map { i =>
      val x = if (i % 2 == 0) 1.0 else 0.0
      val base = 1.0 + (i * 13 % 29) + rng.nextDouble() * 0.01
      val t = if (x > 0) { if (base < 15) base * 0.15 else base * 1.8 }
        else base
      (t, 1, x)
    }
    val out = Survival.coxZph(rows.toDF("t", "e", "x"), col("t"),
      col("e"), Seq(col("x")), Seq("x"), transform = "identity").collect()
    val r = out.find(_.getString(0) == "x").get
    val theta = r.getAs[Double]("theta")
    val se = r.getAs[Double]("theta_se")
    assert(theta < 0, s"drift direction must be negative, got $theta")
    // k = 1 identity: (theta/se)^2 == chisq exactly (same S scalar)
    val chi = r.getAs[Double]("chisq")
    assert(math.abs((theta / se) * (theta / se) - chi) < 1e-9 * chi,
      s"(theta/se)^2 ${(theta / se) * (theta / se)} vs chisq $chi")
    // GLOBAL row carries no direction
    val g = out.find(_.getString(0) == "GLOBAL").get
    assert(g.isNullAt(g.fieldIndex("theta")))
    assert(g.isNullAt(g.fieldIndex("theta_se")))
  }

  test("coxPhStratified: one stratum reduces exactly to coxPh") {
    import graft.ops.Survival
    val rng = new scala.util.Random(7)
    val rows = (0 until 80).map { i =>
      val x = (i % 3).toDouble
      (1.0 + (i * 17 % 41) + rng.nextDouble() * 0.01, i % 2, x)
    }
    val df = rows.toDF("t", "e", "x")
    val a = Survival.coxPhStratified(df, col("t"), col("e"), lit("all"),
      Seq(col("x")))
    val b = Survival.coxPh(df, col("t"), col("e"), Seq(col("x")))
    assert(math.abs(a.coefficients(0) - b.coefficients(0)) < 1e-9)
    assert(math.abs(a.stderr(0) - b.stderr(0)) < 1e-9)
    assert(math.abs(a.logLik - b.logLik) < 1e-9)
    assert(math.abs(a.scoreChi2 - b.scoreChi2) < 1e-9)
    assert(a.nEvents == b.nEvents)
  }

  test("coxPhStratified: score test equals the summed-strata log-rank; " +
    "fit maximizes the brute stratified partial likelihood") {
    import graft.ops.Survival
    // two strata, binary x, all distinct times within each stratum (no
    // ties, so Breslow == exact == log-rank variance per stratum)
    val rng = new scala.util.Random(23)
    val rows = (0 until 90).map { i =>
      val s = if (i % 2 == 0) "a" else "b"
      val x = if ((i / 2) % 2 == 0) 1.0 else 0.0
      val base = 1.0 + i * 0.37 + rng.nextDouble() * 0.001
      val t = if (x > 0 && s == "a") base * 0.6 else base
      (s, t, if (i % 7 == 0) 0 else 1, x)
    }
    val df = rows.toDF("s", "t", "e", "x")
    val fit = Survival.coxPhStratified(df, col("t"), col("e"), col("s"),
      Seq(col("x")))
    // per-stratum log-rank components summed
    val lrA = Survival.logRankTest(df.filter(col("s") === "a"), col("x"),
      col("t"), col("e")).head()
    val lrB = Survival.logRankTest(df.filter(col("s") === "b"), col("x"),
      col("t"), col("e")).head()
    val oe = (lrA.getAs[Double]("observed1") - lrA.getAs[Double]("expected1")) +
      (lrB.getAs[Double]("observed1") - lrB.getAs[Double]("expected1"))
    val v = lrA.getAs[Double]("variance") + lrB.getAs[Double]("variance")
    val chiStrat = oe * oe / v
    assert(math.abs(fit.scoreChi2 - chiStrat) < 1e-9 * math.max(1.0, chiStrat),
      s"score ${fit.scoreChi2} vs stratified log-rank $chiStrat")
    // brute stratified partial likelihood: ll at beta_hat matches, and
    // the numeric gradient vanishes there
    val byS = rows.groupBy(_._1)
    def ll(beta: Double): Double = byS.values.map { rs =>
      rs.filter(_._3 == 1).map { case (_, ti, _, xi) =>
        val denom = rs.filter(_._2 >= ti).map(r => math.exp(beta * r._4)).sum
        beta * xi - math.log(denom)
      }.sum
    }.sum
    val bh = fit.coefficients(0)
    assert(math.abs(fit.logLik - ll(bh)) < 1e-8,
      s"ll ${fit.logLik} vs brute ${ll(bh)}")
    val h = 1e-6
    val grad = (ll(bh + h) - ll(bh - h)) / (2 * h)
    assert(math.abs(grad) < 1e-4, s"gradient at beta_hat: $grad")
  }

  test("coxSurvival: beta=0 is Nelson-Aalen; hand identity; fit path") {
    import graft.ops.Survival
    val rng = new scala.util.Random(31)
    val rows = (0 until 70).map { i =>
      val x = if (i % 2 == 0) 1.0 else 0.0
      val base = 1.0 + (i * 13 % 23) + rng.nextDouble() * 0.01
      (if (x > 0) base * 0.7 else base, if (i % 5 == 0) 0 else 1, x)
    }
    val df = rows.toDF("t", "e", "x")
    // beta = 0, profile = 0: h0_cum must equal the Nelson-Aalen
    // cumulative hazard at every event time, survival its FH transform
    val cs = Survival.coxSurvival(df, col("t"), col("e"), Seq(col("x")),
      Seq(0.0), beta = Some(Array(0.0))).collect()
      .map(r => r.getAs[Double]("time") ->
        (r.getAs[Double]("h0_cum"), r.getAs[Double]("survival"))).toMap
    val na = Survival.nelsonAalen(df, col("t"), col("e")).collect()
      .filter(_.getAs[Long]("n_event") > 0)
      .map(r => r.getAs[Double]("time") ->
        (r.getAs[Double]("cum_hazard"), r.getAs[Double]("fh_survival")))
    assert(na.nonEmpty && na.length == cs.size)
    na.foreach { case (t, (h, s)) =>
      assert(math.abs(cs(t)._1 - h) < 1e-9, s"H0($t): ${cs(t)._1} vs $h")
      assert(math.abs(cs(t)._2 - s) < 1e-9)
    }
    // hand identity at a nonzero beta: H0 from a brute risk-set loop
    val b = 0.4
    val out = Survival.coxSurvival(df, col("t"), col("e"), Seq(col("x")),
      Seq(2.0), beta = Some(Array(b))).collect()
    val evT = rows.filter(_._2 == 1).map(_._1).distinct.sorted
    var h0 = 0.0
    val brute = evT.map { t =>
      val d = rows.count(r => r._1 == t && r._2 == 1).toDouble
      val s0 = rows.filter(_._1 >= t).map(r => math.exp(b * r._3)).sum
      h0 += d / s0
      t -> h0
    }.toMap
    out.foreach { r =>
      val t = r.getAs[Double]("time")
      assert(math.abs(r.getAs[Double]("h0_cum") - brute(t)) < 1e-9)
      assert(math.abs(r.getAs[Double]("survival") -
        math.exp(-brute(t) * math.exp(2.0 * b))) < 1e-9)
    }
    // fit path runs and survival is monotone non-increasing
    val fitted = Survival.coxSurvival(df, col("t"), col("e"),
      Seq(col("x")), Seq(1.0)).collect().map(_.getAs[Double]("survival"))
    assert(fitted.zip(fitted.tail).forall { case (a2, b2) => b2 <= a2 + 1e-12 })
  }

  test("rmstDiff: closes over the per-arm rmst rows; binary-group guard") {
    import graft.ops.Survival
    val rng = new scala.util.Random(5)
    val rows = (0 until 100).map { i =>
      val g = i % 2
      val base = 1.0 + (i * 7 % 31) + rng.nextDouble() * 0.01
      (if (g == 1) base * 1.4 else base, if (i % 6 == 0) 0 else 1, g)
    }
    val df = rows.toDF("t", "e", "g")
    val d = Survival.rmstDiff(df, col("t"), col("e"), 25.0, col("g")).head()
    val per = Survival.rmst(df, col("t"), col("e"), 25.0,
      col("g").cast("string")).collect()
      .map(r => r.getAs[String]("group") -> r).toMap
    val expDiff = per("1").getAs[Double]("rmst") - per("0").getAs[Double]("rmst")
    val expSe = math.sqrt(
      math.pow(per("1").getAs[Double]("se"), 2) +
        math.pow(per("0").getAs[Double]("se"), 2))
    assert(math.abs(d.getAs[Double]("diff") - expDiff) < 1e-12)
    assert(math.abs(d.getAs[Double]("se") - expSe) < 1e-12)
    assert(math.abs(d.getAs[Double]("z") - expDiff / expSe) < 1e-12)
    // treated arm survives longer by construction
    assert(d.getAs[Double]("diff") > 0)
    val err = intercept[IllegalArgumentException] {
      Survival.rmstDiff(rows.map(r => (r._1, r._2, r._3 + 1)).toDF("t", "e", "g"),
        col("t"), col("e"), 25.0, col("g")).head()
    }
    assert(err.getMessage.contains("binary"), err.getMessage)
  }

  test("ordinalAssoc: no ties collapses gamma = somers_d = tau_b") {
    val xs = Seq(1, 2, 3, 4, 5, 6, 7)
    val ys = Seq(2, 1, 4, 3, 6, 5, 7)
    val r = graft.ops.Contingency.ordinalAssoc(
      xs.zip(ys).toDF("x", "y"), col("x"), col("y")).head()
    val g = r.getAs[Double]("gamma")
    assert(math.abs(g - r.getAs[Double]("somers_d")) < 1e-12)
    assert(math.abs(g - r.getAs[Double]("tau_b")) < 1e-12)
    assert(r.getAs[Double]("gamma_ase") > 0)
    assert(r.getAs[Double]("somers_ase") > 0)
  }
}
