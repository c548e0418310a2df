package graft

import graft.ops._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 operators: hand-computed fixtures, closed-form identities and
  * named-guard checks for the contingency / rank / survival / monitor /
  * decomposition / clustering additions. */
class Round13OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("mantelHaenszel: single-stratum hand case + Simpson fixture") {
    // one stratum: a=10 b=5 c=4 d=20, n=39 -> OR = ad/bc = 10
    val one = (Seq.fill(10)((1, 1)) ++ Seq.fill(5)((1, 0)) ++
      Seq.fill(4)((0, 1)) ++ Seq.fill(20)((0, 0)))
      .map { case (t, y) => ("s", t, y) }.toDF("s", "t", "y")
    val r = Contingency.mantelHaenszel(one, $"s", $"t", $"y").head()
    assert(r.getAs[Long]("strata") == 1 && r.getAs[Long]("n") == 39)
    assert(approx(r.getAs[Double]("or_mh"), 10.0))
    // CMH on one stratum: (a - E)^2 / V with the hypergeometric V
    val e = 15.0 * 14 / 39
    val v = 15.0 * 24 * 14 * 25 / (39.0 * 39 * 38)
    assert(approx(r.getAs[Double]("cmh_chisq"), (10 - e) * (10 - e) / v))
    // Simpson fixture: two strata, each with NO within-stratum
    // association (OR = 1), sizes arranged so the POOLED table shows one
    val s1 = (Seq.fill(16)((1, 1)) ++ Seq.fill(4)((1, 0)) ++
      Seq.fill(8)((0, 1)) ++ Seq.fill(2)((0, 0)))
      .map { case (t, y) => ("a", t, y) }
    val s2 = (Seq.fill(2)((1, 1)) ++ Seq.fill(8)((1, 0)) ++
      Seq.fill(4)((0, 1)) ++ Seq.fill(16)((0, 0)))
      .map { case (t, y) => ("b", t, y) }
    val mh = Contingency.mantelHaenszel((s1 ++ s2).toDF("s", "t", "y"),
      $"s", $"t", $"y").head()
    assert(approx(mh.getAs[Double]("or_mh"), 1.0))
    assert(mh.getAs[Double]("cmh_chisq") < 1e-12)
    val pooled = Contingency.mantelHaenszel(
      (s1 ++ s2).map { case (_, t, y) => ("all", t, y) }.toDF("s", "t", "y"),
      $"s", $"t", $"y").head()
    assert(pooled.getAs[Double]("or_mh") > 2.0) // the confounded read
    intercept[IllegalArgumentException] {
      Contingency.mantelHaenszel(
        Seq(("s", 2, 1), ("s", 0, 0)).toDF("s", "t", "y"),
        $"s", $"t", $"y").head()
    }
  }

  test("fisherExact: exhaustive 2x2x2x2 support + guards") {
    // n=4, both margins 2: support k in {0,1,2}, P = (1/6, 4/6, 1/6)
    val df = Seq((1, 1), (1, 1), (0, 0), (0, 0)).toDF("a", "b")
    val r = Contingency.fisherExact(df, $"a", $"b").head()
    assert(r.getAs[Long]("n11") == 2 && r.getAs[Long]("n00") == 2)
    assert(approx(r.getAs[Double]("p_greater"), 1.0 / 6))
    assert(approx(r.getAs[Double]("p_two_sided"), 2.0 / 6))
    // the balanced table: obs = 1 is the mode -> two-sided p = 1
    val flat = Seq((1, 1), (1, 0), (0, 1), (0, 0)).toDF("a", "b")
    val r2 = Contingency.fisherExact(flat, $"a", $"b").head()
    assert(approx(r2.getAs[Double]("p_two_sided"), 1.0))
    intercept[IllegalArgumentException] {
      Contingency.fisherExact(Seq((3, 1)).toDF("a", "b"), $"a", $"b").head()
    }
    val g = intercept[IllegalArgumentException] {
      Contingency.fisherExact(df, $"a", $"b", maxSupport = 1L).head()
    }
    assert(g.getMessage.contains("chisq"), g.getMessage)
  }

  test("kruskalWallis: hand case, MW z^2 identity with ties, guards") {
    // {1,2} vs {3,4}: ranks (1,2) vs (3,4) -> H = 12/20 * 4 = 2.4
    val hand = Seq((1.0, "a"), (2.0, "a"), (3.0, "b"), (4.0, "b"))
      .toDF("y", "g")
    val h = RankTests.kruskalWallis(hand, $"y", $"g").head()
    assert(approx(h.getAs[Double]("h"), 2.4) &&
      h.getAs[Long]("df") == 1)
    // k = 2 with heavy ties: tie-corrected H equals the MW z^2 (no
    // continuity correction) — same ranks, same tie correction
    val tied = (1 to 400).map(i => ((i % 7).toDouble + (i % 3), i % 2))
      .toDF("y", "t")
    val hc = RankTests.kruskalWallis(tied, $"y", $"t".cast("string"))
      .head().getAs[Double]("h_corrected")
    val mw = RankTests.mannWhitneyU(tied, $"y", $"t",
      continuityCorrection = false)
    val z = graft.stats.Dist.normQuantile(1 - mw.p_value / 2)
    assert(approx(hc, z * z, 1e-6), s"H=$hc z^2=${z * z}")
    intercept[IllegalArgumentException] {
      RankTests.kruskalWallis(Seq((1.0, "a")).toDF("y", "g"), $"y", $"g")
    }
    intercept[IllegalArgumentException] { // constant values
      RankTests.kruskalWallis(
        Seq((1.0, "a"), (1.0, "b")).toDF("y", "g"), $"y", $"g")
    }
  }

  test("brunnerMunzel: p_hat by pair counting, symmetry, rank invariance") {
    val rows = (1 to 300).map { i =>
      val t = i % 2
      // arm 1 shifted AND more spread (the BM use case), integer ties
      val y = (if (t == 1) (i % 11) + 3 else (i % 5)).toDouble
      (y, t)
    }
    val df = rows.toDF("y", "t")
    val r = RankTests.brunnerMunzel(df, $"y", $"t").head()
    // p_hat = (#(y0 < y1) + 0.5 #(=)) / (n0 n1) by brute force
    val y0 = rows.filter(_._2 == 0).map(_._1)
    val y1 = rows.filter(_._2 == 1).map(_._1)
    val wins = (for (a <- y0; b <- y1)
      yield if (a < b) 1.0 else if (a == b) 0.5 else 0.0).sum
    assert(approx(r.getAs[Double]("p_hat"), wins / (y0.length * y1.length)))
    assert(r.getAs[Double]("p_value") < 1e-6) // the shift is real
    // arm swap flips the statistic's sign and p_hat -> 1 - p_hat
    val sw = RankTests.brunnerMunzel(df, $"y", lit(1) - $"t").head()
    assert(approx(sw.getAs[Double]("stat"), -r.getAs[Double]("stat")))
    assert(approx(sw.getAs[Double]("p_hat"), 1.0 - r.getAs[Double]("p_hat")))
    // strictly monotone transform leaves every output unchanged
    val tr = RankTests.brunnerMunzel(df, exp($"y"), $"t").head()
    assert(approx(tr.getAs[Double]("stat"), r.getAs[Double]("stat")))
    assert(approx(tr.getAs[Double]("df"), r.getAs[Double]("df")))
  }

  test("effectSize: hand moments + Cliff by pair counting") {
    val df = (Seq(0.0, 0.0, 2.0, 2.0).map((_, 0)) ++
      Seq(2.0, 2.0, 4.0, 4.0).map((_, 1))).toDF("y", "t")
    val r = RankTests.effectSize(df, $"y", $"t").head()
    val d = 2.0 / math.sqrt(4.0 / 3)
    assert(approx(r.getAs[Double]("mean_diff"), 2.0))
    assert(approx(r.getAs[Double]("cohens_d"), d))
    assert(approx(r.getAs[Double]("hedges_g"), d * (1 - 3.0 / 23)))
    assert(approx(r.getAs[Double]("glass_delta"), d))
    // wins 12, ties 4, losses 0 over 16 pairs -> delta = 0.75
    assert(approx(r.getAs[Double]("cliffs_delta"), 0.75))
    intercept[IllegalArgumentException] {
      RankTests.effectSize(Seq((1.0, 0), (1.0, 1)).toDF("y", "t"),
        $"y", $"t").head()
    }
  }

  test("nelsonAalen: hand hazard path and KM dominance") {
    val df = Seq((1, 1), (2, 1), (3, 1)).toDF("time", "ev")
    val na = Survival.nelsonAalen(df, $"time", $"ev")
      .orderBy($"time").collect()
    val h = Seq(1.0 / 3, 1.0 / 3 + 1.0 / 2, 1.0 / 3 + 1.0 / 2 + 1.0)
    val v = Seq(1.0 / 9, 1.0 / 9 + 1.0 / 4, 1.0 / 9 + 1.0 / 4 + 1.0)
    na.zipWithIndex.foreach { case (r, i) =>
      assert(approx(r.getAs[Double]("cum_hazard"), h(i)))
      assert(approx(r.getAs[Double]("se"), math.sqrt(v(i))))
    }
    // exp(-H) >= KM everywhere (standard dominance, strict with d >= 1)
    val big = (1 to 200).map(i => (i % 13 + 1, if (i % 4 == 0) 0 else 1))
      .toDF("time", "ev")
    val km = Survival.kaplanMeier(big, $"time", $"ev")
      .select($"time", $"survival")
    val both = Survival.nelsonAalen(big, $"time", $"ev")
      .join(km, "time").collect()
    assert(both.nonEmpty && both.forall(r =>
      r.getAs[Double]("fh_survival") >= r.getAs[Double]("survival") - 1e-12))
  }

  test("cumulativeIncidence: sums to 1 - all-cause KM; single cause = 1 - KM") {
    val rows = (1 to 500).map { i =>
      val time = i % 17 + 1
      val cause = (i * 7) % 3 // 0 censored, 1 and 2 compete
      (time, cause)
    }
    val df = rows.toDF("time", "cause")
    val cif = Survival.cumulativeIncidence(df, $"time", $"cause")
    val km = Survival.kaplanMeier(df, $"time",
      when($"cause" > 0, 1).otherwise(0))
    // identity: at every event time, sum_k CIF_k(t) = 1 - S(t)
    val perT = cif.groupBy($"time").agg(sum($"cif").as("total"))
      .join(km.select($"time", $"survival"), "time").collect()
    assert(perT.nonEmpty && perT.forall(r =>
      approx(r.getAs[Double]("total"), 1.0 - r.getAs[Double]("survival"))))
    // one cause, no censoring: CIF = 1 - KM at each time
    val one = rows.map { case (t, _) => (t, 1) }.toDF("time", "cause")
    val c1 = Survival.cumulativeIncidence(one, $"time", $"cause")
      .join(Survival.kaplanMeier(one, $"time", lit(1))
        .select($"time", $"survival"), "time").collect()
    assert(c1.forall(r =>
      approx(r.getAs[Double]("cif"), 1.0 - r.getAs[Double]("survival"))))
  }

  test("ewmaMonitor: hand recursion, shift flags, guards") {
    // 20 quiet periods at 10, then 5 at 14: the EWMA walks out of the
    // limits; the first periods stay inside
    val rows = (0 until 25).flatMap { p =>
      val v = if (p < 20) 10.0 + (p % 3 - 1) * 0.1 else 14.0
      Seq((p.toLong, v))
    }
    val df = rows.toDF("period", "v")
    val out = Drift.ewmaMonitor(df, $"period", $"v", lambda = 0.5, l = 3.0)
      .orderBy($"period").collect()
    // replay the recursion by hand
    val mu = rows.map(_._2).sum / rows.length
    var z = mu
    rows.zipWithIndex.foreach { case ((_, v), i) =>
      z = 0.5 * v + 0.5 * z
      assert(approx(out(i).getAs[Double]("ewma"), z))
    }
    assert(!out.head.getAs[Boolean]("is_anomaly"))
    assert(out.last.getAs[Boolean]("is_anomaly"))
    intercept[IllegalArgumentException] { // constant series
      Drift.ewmaMonitor(Seq((1L, 2.0), (2L, 2.0)).toDF("p", "v"),
        $"p", $"v")
    }
    val g = intercept[IllegalArgumentException] {
      Drift.ewmaMonitor(df, $"period", $"v", maxPeriods = 3)
    }
    assert(g.getMessage.contains("maxPeriods"), g.getMessage)
  }

  test("ljungBox: hand r1, trend series vs white noise") {
    val hand = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0))
      .toDF("p", "v")
    val r1 = Drift.ljungBox(hand, $"p", $"v", lags = 1).head()
    assert(approx(r1.getAs[Double]("acf"), 0.25))
    // a strong trend autocorrelates; a hash scramble does not
    val n = 200
    val trend = (1 to n).map(i => (i.toLong, i.toDouble)).toDF("p", "v")
    // avalanche-mixed noise — a bare linear-congruential (i*c % m) is a
    // circular sawtooth with PERFECT lag correlations (the r11
    // perceptual-hash fixture lesson: fixtures need real mixing)
    val noise = (1 to n).map { i =>
      var x = i.toLong * 0x9E3779B97F4A7C15L
      x ^= (x >>> 32)
      (i.toLong, math.abs(x % 1000).toDouble)
    }.toDF("p", "v")
    val qt = Drift.ljungBox(trend, $"p", $"v", lags = 5)
      .orderBy($"lag".desc).head()
    val qn = Drift.ljungBox(noise, $"p", $"v", lags = 5)
      .orderBy($"lag".desc).head()
    assert(qt.getAs[Double]("q_stat") > 100 &&
      qt.getAs[Double]("p_value") < 1e-10)
    assert(qn.getAs[Double]("q_stat") < 30, qn.toString)
  }

  test("sprt: hand LLR, sticky decision after a reversal") {
    // look 0: 80/100 successes -> huge LLR, crosses H1; look 1: 0/100
    // drags the LLR back below the bound — the decision must NOT flip
    val rows = (0 until 100).map(i => (0L, if (i < 80) 1 else 0)) ++
      (0 until 100).map(_ => (1L, 0))
    val out = Sequential.sprt(rows.toDF("look", "y"), $"look", $"y",
      p0 = 0.2, p1 = 0.3).orderBy($"bucket").collect()
    val lw = math.log(0.3 / 0.2)
    val ll = math.log(0.7 / 0.8)
    assert(approx(out(0).getAs[Double]("llr"), 80 * lw + 20 * ll))
    assert(approx(out(1).getAs[Double]("llr"), 80 * lw + 120 * ll))
    assert(out(0).getAs[String]("decision") == "accept_h1")
    assert(out(1).getAs[String]("decision") == "accept_h1") // sticky
    assert(approx(out(0).getAs[Double]("upper_bound"), math.log(0.8 / 0.05)))
    assert(approx(out(0).getAs[Double]("lower_bound"), math.log(0.2 / 0.95)))
    // null-rate data drifts to accept_h0
    val nullRows = (0 until 2000).map(i => ((i / 200).toLong,
      if ((i * 2654435761L) % 10 < 2) 1 else 0))
    val nd = Sequential.sprt(nullRows.toDF("look", "y"), $"look", $"y",
      0.2, 0.3).orderBy($"bucket".desc).head()
    assert(nd.getAs[String]("decision") == "accept_h0", nd.toString)
    intercept[IllegalArgumentException] {
      Sequential.sprt(rows.toDF("look", "y"), $"look", $"y", 0.2, 0.2)
    }
  }

  test("hosmerLemeshow: exactly calibrated -> 0; damped labels -> large") {
    // rate per score value is EXACTLY the score (each residue class r
    // sees (37m + 7r) % 100 sweep every residue once across m)
    val cal = (0 until 10000).map { i =>
      val r = i % 100
      val m = i / 100
      val s = r / 100.0 + 1e-4 // keep strictly inside (0, 1)
      val y = if ((37 * m + 7 * r) % 100 < r) 1 else 0
      (s, y)
    }.toDF("s", "y")
    val r0 = MlEval.hosmerLemeshow(cal, $"y", $"s").head()
    // the +1e-4 zero-guard offset leaves O - E = exactly -1 per bin,
    // so chisq is ~1e-3, not 0 — still indistinguishable from perfect
    assert(r0.getAs[Double]("chisq") < 0.01, r0.toString)
    assert(r0.getAs[Double]("p_value") > 0.999999)
    // damp the label rate to 60% of the score: chisq explodes
    val off = (0 until 10000).map { i =>
      val r = i % 100
      val m = i / 100
      val s = r / 100.0 + 1e-4
      val y = if ((37 * m + 7 * r) % 100 < r * 6 / 10) 1 else 0
      (s, y)
    }.toDF("s", "y")
    val r1 = MlEval.hosmerLemeshow(off, $"y", $"s").head()
    assert(r1.getAs[Double]("chisq") > 100, r1.toString)
  }

  test("classificationReport: hand confusion matrix") {
    val df = (Seq.fill(40)((1, 1)) ++ Seq.fill(10)((0, 1)) ++
      Seq.fill(20)((1, 0)) ++ Seq.fill(30)((0, 0))).toDF("y", "p")
    val r = MlEval.classificationReport(df, $"y", $"p").head()
    assert(r.getAs[Long]("tp") == 40 && r.getAs[Long]("tn") == 30)
    assert(approx(r.getAs[Double]("accuracy"), 0.7))
    assert(approx(r.getAs[Double]("precision"), 0.8))
    assert(approx(r.getAs[Double]("recall"), 2.0 / 3))
    assert(approx(r.getAs[Double]("f1"),
      2 * 0.8 * (2.0 / 3) / (0.8 + 2.0 / 3)))
    assert(approx(r.getAs[Double]("mcc"),
      (40.0 * 30 - 10 * 20) / math.sqrt(50.0 * 60 * 40 * 50)))
  }

  test("cronbachAlpha: duplicate items -> 1, independent items -> near 0") {
    val base = (1 to 2000).map { i =>
      val f = (i % 23).toDouble
      (f, f, f + (i % 7), ((i * 13 + 5) % 23).toDouble)
    }.toDF("a", "b", "c", "noise")
    // two identical items: total var = 4 Var, item sum = 2 Var -> alpha 1
    val dup = Agreement.cronbachAlpha(base, Seq($"a", $"b")).head()
    assert(approx(dup.getAs[Double]("alpha"), 1.0))
    // an unrelated item drags alpha down
    val mixed = Agreement.cronbachAlpha(base, Seq($"a", $"noise")).head()
    assert(math.abs(mixed.getAs[Double]("alpha")) < 0.3, mixed.toString)
    intercept[IllegalArgumentException] {
      Agreement.cronbachAlpha(base, Seq($"a"))
    }
  }

  test("oaxacaBlinder: exact additivity; same-slope groups -> all explained") {
    // y = 2x + 3 EXACTLY in both groups; group 1's x shifted by +5
    val rows = (1 to 1000).map { i =>
      val g = i % 2
      val x = (i % 17).toDouble + 5 * g
      (2 * x + 3, g, x)
    }.toDF("y", "g", "x")
    val r = Regression.oaxacaBlinder(rows, $"y", $"g", Seq($"x")).head()
    assert(approx(r.getAs[Double]("gap"),
      r.getAs[Double]("explained") + r.getAs[Double]("unexplained")))
    assert(math.abs(r.getAs[Double]("unexplained")) < 1e-6, r.toString)
    assert(approx(r.getAs[Double]("explained_share"), 1.0, 1e-6))
    // different intercepts: the shift lands in 'unexplained'
    val rows2 = (1 to 1000).map { i =>
      val g = i % 2
      val x = (i % 17).toDouble
      (2 * x + 3 + 10 * g, g, x)
    }.toDF("y", "g", "x")
    val r2 = Regression.oaxacaBlinder(rows2, $"y", $"g", Seq($"x")).head()
    assert(approx(r2.getAs[Double]("unexplained"), 10.0, 1e-6))
  }

  test("chao1: hand spectrum") {
    val docs = Seq("a a b", "c").toDF("text")
    val r = TextOps.chao1(docs, $"text").head()
    assert(r.getAs[Long]("terms") == 3 && r.getAs[Long]("total_tokens") == 4)
    assert(r.getAs[Long]("f1") == 2 && r.getAs[Long]("f2") == 1)
    assert(approx(r.getAs[Double]("chao1"), 3.5))
    assert(approx(r.getAs[Double]("coverage"), 0.5))
  }

  test("kmeans: separated blobs recovered exactly, partition-invariant") {
    // blob A on even ids at 0-vector, blob B on odd ids at 10-vector:
    // init takes ids 0 (A) and 1 (B), Lloyd converges in one step
    val vecs = (0 until 40).map { i =>
      val c = if (i % 2 == 0) 0.0 else 10.0
      (i.toLong, Array.fill(8)(c) ++ Array(i / 100.0)) // tiny within-blob spread
    }.toDF("id", "v")
    val r = Ann.kmeans(vecs, $"id", $"v", k = 2, iters = 3)
      .orderBy($"cluster").collect()
    assert(r.map(_.getAs[Long]("n")).toSeq == Seq(20L, 20L))
    assert(r.forall(_.getAs[Double]("inertia") < 1.0))
    val rep = Ann.kmeans(vecs.repartition(7), $"id", $"v", k = 2, iters = 3)
      .orderBy($"cluster").collect()
    assert(r.zip(rep).forall { case (x, y) =>
      x.getAs[Long]("n") == y.getAs[Long]("n") &&
        approx(x.getAs[Double]("inertia"), y.getAs[Double]("inertia"))
    })
    intercept[IllegalArgumentException] {
      Ann.kmeans(vecs, $"id", $"v", k = 50, iters = 1)
    }
  }

  test("ordinalAssoc: perfect monotone, hand tie case, cap guard") {
    val mono = Seq((1, 1), (2, 2), (3, 3)).toDF("x", "y")
    val m = Contingency.ordinalAssoc(mono, $"x", $"y").head()
    assert(approx(m.getAs[Double]("tau_b"), 1.0) &&
      approx(m.getAs[Double]("gamma"), 1.0) &&
      approx(m.getAs[Double]("somers_d"), 1.0))
    val anti = Contingency.ordinalAssoc(
      Seq((1, 3), (2, 2), (3, 1)).toDF("x", "y"), $"x", $"y").head()
    assert(approx(anti.getAs[Double]("tau_b"), -1.0))
    // cells (1,1)x2 (2,1)x1 (2,2)x1: C=2 D=0 Tx=1 Ty=2
    val ties = Seq((1, 1), (1, 1), (2, 1), (2, 2)).toDF("x", "y")
    val t = Contingency.ordinalAssoc(ties, $"x", $"y").head()
    assert(approx(t.getAs[Double]("concordant"), 2.0) &&
      approx(t.getAs[Double]("discordant"), 0.0))
    assert(approx(t.getAs[Double]("tau_b"), 2.0 / math.sqrt(3.0 * 4)))
    assert(approx(t.getAs[Double]("gamma"), 1.0))
    assert(approx(t.getAs[Double]("somers_d"), 0.5))
    val g = intercept[IllegalArgumentException] {
      Contingency.ordinalAssoc(
        (1 to 100).map(i => (i, i)).toDF("x", "y"), $"x", $"y",
        maxCells = 10)
    }
    assert(g.getMessage.contains("cut_bins"), g.getMessage)
  }

  test("moodMedian: hand 2-group split") {
    val df = (Seq(1.0, 2.0, 3.0, 4.0).map(("a", _)) ++
      Seq(5.0, 6.0, 7.0, 8.0).map(("b", _))).toDF("g", "y")
    val r = Contingency.moodMedian(df, $"y", $"g", exact = true).head()
    assert(approx(r.getAs[Double]("grand_median"), 4.5))
    assert(approx(r.getAs[Double]("chisq"), 8.0))
    assert(r.getAs[Long]("df") == 1)
    // sketch default (the 100 TB path): the approx median is a data value
    // (4.0), which splits above/below identically here -> same chisq
    val rs = Contingency.moodMedian(df, $"y", $"g").head()
    assert(approx(rs.getAs[Double]("chisq"), 8.0))
    intercept[IllegalArgumentException] { // one-sided degenerate
      Contingency.moodMedian(
        Seq(("a", 1.0), ("b", 1.0)).toDF("g", "y"), $"y", $"g").head()
    }
  }

  test("dunnTest: z matches the 2-group closed form, BH ordering") {
    val rows = (1 to 600).map { i =>
      val g = i % 3
      ((i % 10).toDouble + (if (g == 2) 5.0 else 0.0), s"g$g")
    }
    val out = RankTests.dunnTest(rows.toDF("y", "g"), $"y", $"g").collect()
    assert(out.length == 3) // 3 choose 2
    // replay one pair by hand from pooled average ranks
    val all = rows.map(_._1).sorted
    def avgRank(v: Double): Double = {
      val lo = all.indexWhere(_ == v) + 1
      val hi = all.lastIndexWhere(_ == v) + 1
      (lo + hi) / 2.0
    }
    val byG = rows.groupBy(_._2).view.mapValues(_.map(r => avgRank(r._1)))
    val n = rows.length.toDouble
    val ties = rows.map(_._1).groupBy(identity).values
      .map(t => math.pow(t.size, 3) - t.size).sum
    val vb = n * (n + 1) / 12 - ties / (12 * (n - 1))
    val (m0, m2) = (byG("g0").sum / byG("g0").size,
      byG("g2").sum / byG("g2").size)
    val zHand = (m0 - m2) /
      math.sqrt(vb * (1.0 / byG("g0").size + 1.0 / byG("g2").size))
    val row02 = out.find(r => r.getAs[String]("g1") == "g0" &&
      r.getAs[String]("g2") == "g2").get
    assert(approx(row02.getAs[Double]("z"), zHand))
    // the planted g2 shift is significant; g0 vs g1 is not
    assert(row02.getAs[Double]("p_adjusted") < 1e-6)
    val row01 = out.find(r => r.getAs[String]("g1") == "g0" &&
      r.getAs[String]("g2") == "g1").get
    assert(row01.getAs[Double]("p_value") > 0.05, row01.toString)
    // BH never decreases a p-value
    assert(out.forall(r =>
      r.getAs[Double]("p_adjusted") >= r.getAs[Double]("p_value") - 1e-15))
  }

  test("ksUniform: exact D on a tiny grid, uniform vs clumped") {
    // p = (0.2, 0.4, 0.6, 0.8, 1.0): D+ = max(i/5 - p_i) = 0,
    // D- = max(p_i - (i-1)/5) = 0.2
    val tiny = Seq(0.2, 0.4, 0.6, 0.8, 1.0).toDF("p")
    val r = RankTests.ksUniform(tiny, $"p").head()
    assert(approx(r.getAs[Double]("d_plus"), 0.0))
    assert(approx(r.getAs[Double]("d_minus"), 0.2))
    assert(approx(r.getAs[Double]("d"), 0.2))
    // near-uniform lattice: large p; everything clumped at 0.01: p ~ 0
    val unif = (0 until 2000).map(i => (i + 0.5) / 2000.0).toDF("p")
    assert(RankTests.ksUniform(unif, $"p").head()
      .getAs[Double]("p_value") > 0.99)
    val clump = Seq.fill(2000)(0.01).toDF("p")
    assert(RankTests.ksUniform(clump, $"p").head()
      .getAs[Double]("p_value") < 1e-12)
    intercept[IllegalArgumentException] {
      RankTests.ksUniform(Seq(1.5).toDF("p"), $"p")
    }
  }

  test("theilSen: exact line recovery, outlier immunity, guards") {
    // exact line y = 3x + 1: every pair slope is 3
    val line = (1 to 50).map(i => (i.toDouble, 3.0 * i + 1)).toDF("x", "y")
    val r = Regression.theilSen(line, $"x", $"y").head()
    assert(approx(r.getAs[Double]("slope"), 3.0))
    assert(approx(r.getAs[Double]("intercept"), 1.0))
    assert(r.getAs[Long]("n_pairs") == 50L * 49 / 2)
    // one wild outlier: OLS slope moves, Theil-Sen stays ~3
    val dirty = line.union(Seq((25.5, 1e6)).toDF("x", "y"))
    val rd = Regression.theilSen(dirty, $"x", $"y").head()
    assert(math.abs(rd.getAs[Double]("slope") - 3.0) < 0.2, rd.toString)
    val g = intercept[IllegalArgumentException] {
      Regression.theilSen(line, $"x", $"y", maxRows = 10)
    }
    assert(g.getMessage.contains("pre-aggregate"), g.getMessage)
  }

  test("cochranQ: k=2 equals McNemar chi-square without correction") {
    // blocks with (m1, m2) readings: discordant 8 vs 2
    val pairs = (Seq.fill(5)((1, 1)) ++ Seq.fill(5)((0, 0)) ++
      Seq.fill(2)((1, 0)) ++ Seq.fill(8)((0, 1))).zipWithIndex
    val rows = pairs.flatMap { case ((a, b), i) =>
      Seq((i.toLong, "m1", a), (i.toLong, "m2", b)) }
    val q = Agreement.cochranQ(rows.toDF("b", "t", "y"),
      $"b", $"t", $"y").head()
    // McNemar without cc: (8-2)^2/(8+2) = 3.6
    assert(approx(q.getAs[Double]("q"), 3.6))
    assert(q.getAs[Long]("df") == 1 && q.getAs[Long]("blocks") == 20)
    intercept[IllegalArgumentException] { // incomplete block
      Agreement.cochranQ(
        (rows :+ (99L, "m1", 1)).toDF("b", "t", "y"), $"b", $"t", $"y")
        .head()
    }
  }

  test("durbinWatson: white noise ~2, trend ~0, alternation ~4") {
    def dw(vals: Seq[Double]): Double =
      Drift.durbinWatson(vals.zipWithIndex.map { case (v, i) =>
        (i.toLong, v) }.toDF("p", "v"), $"p", $"v")
        .head().getAs[Double]("dw")
    val noise = (1 to 500).map { i =>
      var x = i.toLong * 0x9E3779B97F4A7C15L; x ^= (x >>> 32)
      math.abs(x % 1000).toDouble
    }
    assert(math.abs(dw(noise) - 2.0) < 0.3, dw(noise).toString)
    assert(dw((1 to 500).map(_.toDouble)) < 0.1)
    assert(dw((1 to 500).map(i => if (i % 2 == 0) 1.0 else -1.0)) > 3.5)
  }

  test("logRankPower: closed forms and monotonicity") {
    val df = (1 to 1000).map(i => (if (i % 4 == 0) 1 else 0, i % 2))
      .toDF("ev", "t")
    val r = Survival.logRankPower(df, $"ev", $"t", hr = 1.5).head()
    assert(r.getAs[Long]("events") == 250 &&
      approx(r.getAs[Double]("share1"), 0.5))
    val za = graft.stats.Dist.normQuantile(0.975)
    assert(approx(r.getAs[Double]("z_power"),
      math.sqrt(250 * 0.25) * math.log(1.5) - za))
    // required events shrink as the target HR grows
    val r2 = Survival.logRankPower(df, $"ev", $"t", hr = 2.0).head()
    assert(r2.getAs[Double]("required_events_80") <
      r.getAs[Double]("required_events_80"))
    // 90% power needs more events than 80%
    assert(r.getAs[Double]("required_events_90") >
      r.getAs[Double]("required_events_80"))
    intercept[IllegalArgumentException] {
      Survival.logRankPower(df, $"ev", $"t", hr = 1.0)
    }
  }

  test("heapsFit: one-new-token-per-doc corpus reads beta ~ 1, repeats ~ 0") {
    // doc i = "x t_i": N(r) = 2r, V(r) = r + 1 -> beta -> 1
    val grow = (1 to 200).map(i => (i.toLong, s"x t$i")).toDF("id", "text")
    val g = TextOps.heapsFit(grow, $"id", $"text").head()
    assert(g.getAs[Long]("docs") == 200 && g.getAs[Long]("terms") == 201)
    assert(g.getAs[Long]("total_tokens") == 400)
    // V = r+1 over N = 2r is a pure power law only asymptotically — the
    // r <= 200 curve fits beta ~ 0.95
    assert(math.abs(g.getAs[Double]("beta") - 1.0) < 0.08, g.toString)
    assert(g.getAs[Double]("r2") > 0.99)
    // a corpus that only repeats: vocabulary saturates immediately ->
    // the flat branch reads beta = 0 with r2 = 1 (exact flat fit)
    val flat = (1 to 50).map(i => (i.toLong, "a b c")).toDF("id", "text")
    val f = TextOps.heapsFit(flat, $"id", $"text").head()
    assert(f.getAs[Double]("beta") == 0.0 && f.getAs[Double]("r2") == 1.0)
    intercept[IllegalArgumentException] {
      TextOps.heapsFit(grow.limit(5), $"id", $"text")
    }
  }

  test("kmeansEval: labeled blobs read purity 1 / nmi 1; mixing lowers both") {
    val pure = (0 until 40).map { i =>
      val c = if (i % 2 == 0) 0.0 else 10.0
      (i.toLong, Array.fill(6)(c) ++ Array(i / 100.0),
        if (i % 2 == 0) "a" else "b")
    }.toDF("id", "v", "lbl")
    val r = Ann.kmeansEval(pure, $"id", $"v", $"lbl", k = 2, iters = 3)
      .orderBy($"cluster").collect()
    assert(r.length == 2)
    assert(r.map(_.getAs[String]("majority_label")).toSet == Set("a", "b"))
    assert(r.forall(x => approx(x.getAs[Double]("cluster_purity"), 1.0)))
    assert(approx(r.head.getAs[Double]("purity"), 1.0))
    assert(approx(r.head.getAs[Double]("nmi"), 1.0))
    // labels independent of geometry: purity ~ 0.5-ish, nmi near 0
    val mixed = pure.withColumn("lbl2",
      when($"id" % 4 < 2, "a").otherwise("b"))
    val m = Ann.kmeansEval(mixed, $"id", $"v", $"lbl2", k = 2, iters = 3)
      .head()
    assert(m.getAs[Double]("nmi") < 0.1, m.toString)
    intercept[IllegalArgumentException] {
      Ann.kmeansEval(pure, $"id", $"v", $"id", k = 2, iters = 1,
        maxCells = 3)
    }
  }

  test("overlap: identical arms read 1/1, disjoint arms read 0/0") {
    // score from the HALF-index: i % 10 shares parity with the i % 2 arm
    // (the recurring trap — parity-locked fixtures put the arms in
    // disjoint bins and fake a positivity violation)
    val same = (1 to 400).map(i => (i % 2, (i / 2 % 10) / 10.0 + 0.05))
      .toDF("t", "s")
    val r = Matching.overlap(same, $"t", $"s", bins = 10).collect()
    assert(approx(r.head.getAs[Double]("common_support"), 1.0))
    assert(approx(r.head.getAs[Double]("ovl"), 1.0))
    val disjoint = (1 to 400).map { i =>
      val t = i % 2
      (t, (i / 2 % 4) / 10.0 + 0.05 + 0.5 * t)
    }.toDF("t", "s")
    val d = Matching.overlap(disjoint, $"t", $"s", bins = 10).collect()
    assert(approx(d.head.getAs[Double]("common_support"), 0.0))
    assert(approx(d.head.getAs[Double]("ovl"), 0.0))
    // per-bin shares sum to 1 within each arm
    assert(approx(d.map(_.getAs[Double]("share0")).sum, 1.0))
    assert(approx(d.map(_.getAs[Double]("share1")).sum, 1.0))
    intercept[IllegalArgumentException] {
      Matching.overlap(Seq((2, 0.5)).toDF("t", "s"), $"t", $"s").collect()
    }
  }

  test("madOutliers: hand fence, robustness to the outliers themselves") {
    // median 5, MAD 2 on 1..9 (symmetric); one wild point doesn't move
    // either (the property mean±k·sd lacks)
    val clean = (1 to 9).map(_.toDouble)
    val r = Robust.madOutliers(clean.toDF("x"), $"x").head()
    assert(approx(r.getAs[Double]("median"), 5.0))
    assert(approx(r.getAs[Double]("mad"), 2.0))
    assert(r.getAs[Long]("n_outliers") == 0)
    val dirty = (clean ++ Seq(1e9)).toDF("x")
    val d = Robust.madOutliers(dirty, $"x", exact = true).head()
    assert(approx(d.getAs[Double]("median"), 5.5))
    assert(d.getAs[Long]("n_outliers") == 1)
    assert(d.getAs[Double]("max_kept") <= 9.0)
    // sketch default (the 100 TB path): the fence still catches exactly
    // the wild point (the approx median is a data value, 5 or 6)
    val ds = Robust.madOutliers(dirty, $"x").head()
    assert(ds.getAs[Long]("n_outliers") == 1)
    assert(ds.getAs[Double]("max_kept") <= 9.0)
    intercept[IllegalArgumentException] { // MAD 0
      Robust.madOutliers(Seq(1.0, 1.0, 1.0, 2.0).toDF("x"), $"x").head()
    }
  }

  test("seasonalStrength: pure cycle ~1, pure noise ~0, peak phase exact") {
    val pure = (0 until 70).map(p => (p.toLong, 10.0 + 5 * (p % 7)))
      .toDF("p", "v")
    val r = Drift.seasonalStrength(pure, $"p", $"v", season = 7).head()
    assert(approx(r.getAs[Double]("strength"), 1.0))
    assert(r.getAs[Long]("peak_phase") == 6)
    assert(approx(r.getAs[Double]("peak_lift"), 5 * 6 - 15.0)) // 6*5 - mean(0..30)
    val noise = (0 until 70).map { p =>
      var x = p.toLong * 0x9E3779B97F4A7C15L; x ^= (x >>> 32)
      (p.toLong, math.abs(x % 1000).toDouble)
    }.toDF("p", "v")
    val n = Drift.seasonalStrength(noise, $"p", $"v", season = 7).head()
    assert(n.getAs[Double]("strength") < 0.25, n.toString)
    intercept[IllegalArgumentException] { // under two cycles
      Drift.seasonalStrength(pure.limit(10), $"p", $"v", season = 7)
    }
  }

  test("clusterPower: iid clusters match the unclustered form; icc inflates") {
    // within-cluster-identical outcomes: icc ~ 1, deff ~ m_bar
    val clustered = (1 to 2000).map { i =>
      val c = i % 100
      (c.toLong, (c % 13).toDouble)
    }.toDF("c", "y")
    val r = SimpleTests.clusterPower(clustered, $"y", $"c", delta = 2.0)
      .head()
    assert(r.getAs[Double]("deff") > 10, r.toString)
    // iid outcomes (cluster uninformative): deff ~ 1, se matches the
    // plain two-sample closed form 2*sigma*sqrt(1/n)
    val iid = (1 to 2000).map { i =>
      var x = i.toLong * 0x9E3779B97F4A7C15L; x ^= (x >>> 32)
      ((i % 100).toLong, (x % 1000).toDouble / 100.0)
    }.toDF("c", "y")
    val r2 = SimpleTests.clusterPower(iid, $"y", $"c", delta = 2.0).head()
    assert(r2.getAs[Double]("deff") < 1.3, r2.toString)
    val sigma = r2.getAs[Double]("sigma")
    val expected = 2 * sigma * math.sqrt(r2.getAs[Double]("deff") / 2000)
    assert(approx(r2.getAs[Double]("se_diff"), expected))
    // 90% power always needs at least as many clusters as 80%
    assert(r2.getAs[Long]("clusters_per_arm_90") >=
      r2.getAs[Long]("clusters_per_arm_80"))
  }

  test("binomialTest: exhaustive n=4 support, null vs planted rates") {
    // n=4, p0=0.5, s=4: P(4)=1/16; two-sided sums {0,4} -> 2/16
    val all1 = Seq(1, 1, 1, 1).toDF("y")
    val r = SimpleTests.binomialTest(all1, $"y", 0.5).head()
    assert(approx(r.getAs[Double]("p_greater"), 1.0 / 16))
    assert(approx(r.getAs[Double]("p_two_sided"), 2.0 / 16))
    // s=2 of 4 at p0=0.5 is the mode: two-sided p = 1
    val half = Seq(1, 1, 0, 0).toDF("y")
    assert(approx(SimpleTests.binomialTest(half, $"y", 0.5).head()
      .getAs[Double]("p_two_sided"), 1.0))
    // a big planted deviation is detected
    val dev = (1 to 500).map(i => if (i % 2 == 0) 1 else 0).toDF("y")
    assert(SimpleTests.binomialTest(dev, $"y", 0.3).head()
      .getAs[Double]("p_two_sided") < 1e-10)
    val g = intercept[IllegalArgumentException] {
      SimpleTests.binomialTest(dev, $"y", 0.3, maxN = 10)
    }
    assert(g.getMessage.contains("prop_test"), g.getMessage)
  }

  test("runsTest: hand run count, trend vs alternation vs noise") {
    // periods: +,+,+,-,-,-  (values 9,9,9,1,1,1 around median 5): 2 runs
    val hand = Seq(9.0, 9.0, 9.0, 1.0, 1.0, 1.0).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("p", "v")
    val r = Drift.runsTest(hand, $"p", $"v").head()
    assert(r.getAs[Long]("runs") == 2 && r.getAs[Long]("n_above") == 3)
    assert(approx(r.getAs[Double]("expected_runs"), 2.0 * 9 / 6 + 1))
    assert(r.getAs[Double]("z") < 0) // too FEW runs = persistence
    // perfect alternation: maximal runs, z > 0
    val alt = (0 until 100).map(i =>
      (i.toLong, if (i % 2 == 0) 10.0 else 1.0)).toDF("p", "v")
    assert(Drift.runsTest(alt, $"p", $"v").head().getAs[Double]("z") > 5)
    // avalanche noise: |z| small
    val noise = (0 until 200).map { i =>
      var x = i.toLong * 0x9E3779B97F4A7C15L; x ^= (x >>> 32)
      (i.toLong, math.abs(x % 1000).toDouble)
    }.toDF("p", "v")
    assert(math.abs(Drift.runsTest(noise, $"p", $"v").head()
      .getAs[Double]("z")) < 2.5)
  }

  test("grubbsTest: planted spike detected, clean data not") {
    val clean = (1 to 200).map { i =>
      var x = i.toLong * 0x9E3779B97F4A7C15L; x ^= (x >>> 32)
      math.abs(x % 1000).toDouble / 100.0
    }
    val rc = Robust.grubbsTest(clean.toDF("x"), $"x").head()
    assert(rc.getAs[Double]("p_value") > 0.05, rc.toString)
    val spiked = (clean :+ 1000.0).toDF("x")
    val rs = Robust.grubbsTest(spiked, $"x"). head()
    assert(approx(rs.getAs[Double]("suspect"), 1000.0))
    assert(rs.getAs[Double]("p_value") < 1e-6, rs.toString)
    // the suspect is the FARTHER extreme, low side too
    val low = (clean :+ -1000.0).toDF("x")
    assert(approx(Robust.grubbsTest(low, $"x").head()
      .getAs[Double]("suspect"), -1000.0))
  }

  test("ngramNovelty: hand trigram sets, full overlap 0, disjoint 1") {
    val cur = Seq("a b c d").toDF("text") // trigrams {a b c, b c d}
    val ref = Seq("b c d e").toDF("text") // trigrams {b c d, c d e}
    val r = TextOps.ngramNovelty(cur, ref, $"text", $"text", n = 3).head()
    assert(r.getAs[Long]("ngrams_current") == 2 &&
      r.getAs[Long]("ngrams_new") == 1)
    assert(approx(r.getAs[Double]("novelty_distinct"), 0.5))
    val same = TextOps.ngramNovelty(cur, cur, $"text", $"text", n = 3).head()
    assert(approx(same.getAs[Double]("novelty_distinct"), 0.0))
    val disj = TextOps.ngramNovelty(cur,
      Seq("x y z w").toDF("text"), $"text", $"text", n = 3).head()
    assert(approx(disj.getAs[Double]("novelty_weighted"), 1.0))
    // weighted counts per-doc-distinct occurrences: a repeated gram in
    // TWO docs counts twice in occurrences, once in distinct
    val rep = TextOps.ngramNovelty(
      Seq("a b c", "a b c x").toDF("text"), ref, $"text", $"text",
      n = 3).head()
    assert(rep.getAs[Long]("occurrences_current") == 3) // abc x2, bcx x1
    assert(rep.getAs[Long]("ngrams_current") == 2)
  }

  test("round-13 gateway verbs dispatch and leave no storage") {
    val ev = (0 until 400).map(i =>
      (i.toLong, (i % 2), ((i / 2 * 7) % 10 < 3 + 2 * (i % 2)),
        s"s${i % 3}")).toDF("id", "t", "yb", "s")
      .withColumn("y", $"yb".cast("int"))
    ev.createOrReplaceTempView("r13_ev")
    assert(GraftGateway.sql(spark,
      "SELECT mantel_haenszel(s, t, y) FROM r13_ev").columns.head == "strata")
    assert(GraftGateway.sql(spark,
      "SELECT kruskal_wallis(y, s) FROM r13_ev").head()
      .getAs[Long]("k") == 3)
    assert(GraftGateway.sql(spark,
      "SELECT effect_size(y, t) FROM r13_ev").columns
      .contains("cliffs_delta"))
    assert(GraftGateway.sql(spark,
      "SELECT sprt(id, y, 0.2, 0.3) FROM r13_ev").columns
      .contains("decision"))
    graft.Ckpt.sweep(spark)
    assert(graft.Ckpt.persistentRddCount(spark) == 0)
  }
}
