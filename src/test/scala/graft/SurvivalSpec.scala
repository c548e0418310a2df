package graft

import graft.ops._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SurvivalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("kaplanMeierBy matches per-group kaplanMeier run separately") {
    val df = Seq(
      (0, 1, 1), (0, 2, 1), (0, 2, 0), (0, 4, 1), (0, 5, 0),
      (1, 1, 0), (1, 3, 1), (1, 3, 1), (1, 6, 1), (1, 7, 1))
      .toDF("g", "t", "e")
    val grouped = Survival.kaplanMeierBy(df, $"g", $"t", $"e")
      .collect().map(r => ((r.getInt(0), r.getInt(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    for (g <- Seq(0, 1)) {
      val single = Survival.kaplanMeier(df.filter($"g" === g), $"t", $"e")
        .collect().map(r => (r.getInt(0),
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      assert(single.keySet.map((g, _)) == grouped.keySet.filter(_._1 == g))
      single.foreach { case (t, v) =>
        val gv = grouped((g, t))
        assert(gv._1 == v._1 && gv._2 == v._2 && gv._3 == v._3)
        assert(math.abs(gv._4 - v._4) < 1e-12, s"g=$g t=$t $gv vs $v")
      }
    }
  }

  test("kaplanMeierBy: terminal d=r gives exact survival 0 without poisoning the next group") {
    // group "a" dies out completely at t=2 (d=r there); group "b" follows
    // in (group, time) order and must be unaffected
    val df = Seq(
      ("a", 1, 1), ("a", 2, 1), ("a", 2, 1),
      ("b", 1, 1), ("b", 3, 0)).toDF("g", "t", "e")
    val m = Survival.kaplanMeierBy(df, $"g", $"t", $"e")
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getDouble(5))).toMap
    assert(m(("a", 2)) == 0.0)
    assert(math.abs(m(("b", 1)) - 0.5) < 1e-12)
    assert(math.abs(m(("b", 3)) - 0.5) < 1e-12) // censored, no drop
  }

  test("logRankTest: identical arms give chi2 ~ 0") {
    val base = Seq((1, 1), (2, 1), (3, 0), (4, 1), (5, 1))
    val df = (base.map { case (t, e) => (0, t, e) } ++
      base.map { case (t, e) => (1, t, e) }).toDF("g", "t", "e")
    val r = Survival.logRankTest(df, $"g", $"t", $"e").head()
    assert(math.abs(r.getDouble(3)) < 1e-12) // chi2
    assert(r.getDouble(4) > 0.999)           // p
  }

  test("logRankTest: hand-computed O/E/V on a 4-subject fixture") {
    // arm1: events at t=1,2; arm0: events at t=3,4
    val df = Seq((1, 1, 1), (1, 2, 1), (0, 3, 1), (0, 4, 1)).toDF("g", "t", "e")
    // t=1: n1=2,n0=2,d=1 -> e1=0.5, v=1*(2/4)*(2/4)*(3/3)=0.25
    // t=2: n1=1,n0=2,d=1 -> e1=1/3, v=(1/3)*(2/3)*1=2/9
    // t=3: n1=0,n0=2,d=1 -> e1=0,   v=0
    // t=4: n1=0,n0=1,d=1 -> e1=0,   v=0 (n=1 branch)
    val r = Survival.logRankTest(df, $"g", $"t", $"e").head()
    assert(r.getDouble(0) == 2.0)
    assert(math.abs(r.getDouble(1) - (0.5 + 1.0 / 3)) < 1e-12)
    assert(math.abs(r.getDouble(2) - (0.25 + 2.0 / 9)) < 1e-12)
    val chi2 = math.pow(2.0 - 5.0 / 6, 2) / (0.25 + 2.0 / 9)
    assert(math.abs(r.getDouble(3) - chi2) < 1e-12)
    assert(math.abs(r.getDouble(4) -
      (1.0 - graft.stats.Dist.chiSqCdf(chi2, 1.0))) < 1e-12)
  }

  test("logRankTest: degenerate one-arm input raises the named error") {
    val df = Seq((1, 1, 1), (1, 2, 1)).toDF("g", "t", "e")
    val e = intercept[IllegalArgumentException] {
      Survival.logRankTest(df, $"g", $"t", $"e")
    }
    assert(e.getMessage.contains("log_rank_test"))
  }

  test("coxPh: score test at beta=0 equals the log-rank chi2 when times are tie-free") {
    val rng = new scala.util.Random(43)
    val rows = (1 to 600).map { i =>
      val x = i % 2
      // continuous times: no ties a.s., so the hypergeometric (n-d)/(n-1)
      // factor is 1 and score == log-rank EXACTLY
      val t = -math.log(rng.nextDouble()) / math.exp(0.5 * x)
      val e = if (rng.nextDouble() < 0.8) 1 else 0
      (t, e, x)
    }
    val d = spark.createDataFrame(rows).toDF("t", "e", "x")
    val cox = Survival.coxPh(d, $"t", $"e", Seq($"x"))
    val lr = Survival.logRankTest(d, $"x", $"t", $"e").head()
    assert(math.abs(cox.scoreChi2 - lr.getAs[Double]("chi2")) < 1e-9,
      s"score ${cox.scoreChi2} vs logrank ${lr.getAs[Double]("chi2")}")
    assert(cox.nEvents == rows.count(_._2 == 1))
  }

  test("coxPh recovers a planted log hazard ratio, multi-covariate") {
    val rng = new scala.util.Random(47)
    val rows = (1 to 20000).map { _ =>
      val x1 = rng.nextInt(2)
      val x2 = rng.nextGaussian()
      val nz = rng.nextGaussian() // independent of the hazard
      val h = math.exp(0.7 * x1 - 0.3 * x2)
      val t = -math.log(rng.nextDouble()) / h
      // administrative censoring at 1.5
      if (t > 1.5) (1.5, 0, x1, x2, nz) else (t, 1, x1, x2, nz)
    }
    val d = spark.createDataFrame(rows).toDF("t", "e", "x1", "x2", "noise")
    val r = Survival.coxPh(d, $"t", $"e", Seq($"x1", $"x2"))
    assert(r.iterations < 20, s"did not converge: ${r.iterations}")
    assert(math.abs(r.coefficients(0) - 0.7) < 3 * r.stderr(0) + 0.05,
      s"beta1 ${r.coefficients(0)} +- ${r.stderr(0)}")
    assert(math.abs(r.coefficients(1) + 0.3) < 3 * r.stderr(1) + 0.05,
      s"beta2 ${r.coefficients(1)} +- ${r.stderr(1)}")
    assert(r.p_values(0) < 1e-6 && r.p_values(1) < 1e-6)
    // null covariate: no effect reported
    val rn = Survival.coxPh(d, $"t", $"e", Seq($"noise"))
    assert(math.abs(rn.z_values(0)) < 3.5, s"null z ${rn.z_values(0)}")
    // guards
    intercept[IllegalArgumentException] {
      Survival.coxPh(d, $"t", $"e", Seq($"x1"), maxTimes = 10)
    }
    intercept[IllegalArgumentException] {
      Survival.coxPh(d.filter($"e" === 0), $"t", $"e", Seq($"x1"))
    }
  }

  test("coxPh: continuous censor times cost nothing — cells live on event times only") {
    // censoring-heavy fixture: events on a 10-point grid, censor times
    // CONTINUOUS (every one distinct). The partial likelihood only looks
    // at event times, so (1) the fit must equal the same data with censor
    // times pre-snapped to the event grid by hand, and (2) the cell table
    // must have exactly 10 rows — the r10 shape would have carried ~2800
    // censored-time cells and tripped a maxTimes = 50 guard.
    val rng = new scala.util.Random(61)
    val rows = (1 to 4000).map { _ =>
      val x = rng.nextGaussian()
      if (rng.nextDouble() < 0.3) ((1 + rng.nextInt(10)).toDouble, 1, x)
      else (rng.nextDouble() * 12.0, 0, x)
    }
    val d = spark.createDataFrame(rows).toDF("t", "e", "x")
    val a = Survival.coxPh(d, $"t", $"e", Seq($"x"), maxTimes = 50)
    assert(a.nTimes == 10, s"expected 10 event-time cells, got ${a.nTimes}")
    assert(a.n == 4000 && a.nEvents == rows.count(_._2 == 1))
    // manual snap: censored at greatest event time <= t; pre-first-event
    // censorings (t < 1) sit below the grid either way
    val snapped = rows.map { case (t, e, x) =>
      if (e == 1) (t, e, x) else (math.min(math.floor(t), 10.0), e, x)
    }
    val d2 = spark.createDataFrame(snapped).toDF("t", "e", "x")
    val b = Survival.coxPh(d2, $"t", $"e", Seq($"x"), maxTimes = 50)
    assert(math.abs(a.coefficients(0) - b.coefficients(0)) < 1e-12 &&
      math.abs(a.stderr(0) - b.stderr(0)) < 1e-12 &&
      math.abs(a.logLik - b.logLik) < 1e-9,
      s"${a.coefficients(0)} vs ${b.coefficients(0)}")
    assert(a.n == b.n && a.nEvents == b.nEvents && a.nTimes == b.nTimes)
  }
}
