package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** The r18 optimization round's Cox-tier cell collapse
  * ([[graft.stats.DesignCells]] riding [[graft.ops.Survival]]): every
  * survival fit/score/test must produce the SAME output whether its
  * cell passes run distributed (one aggregate per pass) or driver-side
  * over collapsed design cells. Each test runs both ways — maxCells = 0
  * forces the distributed row path — and pins the paths together far
  * tighter than any query's rounding. */
class CoxCellsSpec extends AnyFunSpec with Matchers {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val tol = 1e-8

  /** Heavy ties (7 distinct times), binary + 5-level covariates, a mix
    * of censored (d = 0) rows, plus subjects censored BEFORE the first
    * event time (t = 0.5) who must drop from every risk set on both
    * paths. */
  private def frame() = {
    val rows = (0 until 420).map { i =>
      val x1 = (i % 5).toDouble
      val x2 = ((i / 4) % 2).toDouble
      val t = if (i % 19 == 0) 0.5 else 1.0 + (i % 7).toDouble
      val d = if (i % 3 == 0) 0 else 1
      val s = if (i % 11 == 10) "c" else if (i % 2 == 0) "a" else "b"
      val cl = (i % 13).toString
      (t, d, x1, x2, s, cl)
    }
    rows.toDF("t", "d", "x1", "x2", "s", "cl")
  }

  /** cause 0 = censored, 1 = modeled, 2 = competing — with competing
    * events AT the last event time (their ceil bucket does not exist
    * and they must drop from role B on both paths). */
  private def crFrame() = {
    val rows = (0 until 420).map { i =>
      val x1 = (i % 5).toDouble
      val x2 = ((i / 4) % 2).toDouble
      val t = 1.0 + (i % 7).toDouble
      val cause = i % 3
      val g = (i % 2).toString
      (t, cause, x1, x2, g)
    }
    rows.toDF("t", "cause", "x1", "x2", "g")
  }

  private def sameFrames(a: org.apache.spark.sql.DataFrame,
                         b: org.apache.spark.sql.DataFrame): Unit = {
    val (ra, rb) = (a.collect(), b.collect())
    ra.length shouldBe rb.length
    a.columns shouldBe b.columns
    ra.zip(rb).foreach { case (x, y) =>
      x.length shouldBe y.length
      (0 until x.length).foreach { j =>
        (x.get(j), y.get(j)) match {
          case (u: Double, v: Double) =>
            if (u.isNaN) v.isNaN shouldBe true else u shouldBe v +- tol
          case (u, v) => u shouldBe v
        }
      }
    }
  }

  describe("cox-tier cell collapse matches the distributed row paths") {
    it("coxPh: breslow and efron estimates/inference/counts") {
      val df = frame()
      for (ties <- Seq("breslow", "efron")) {
        val fast = ops.Survival.coxPh(df, col("t"), col("d"),
          Seq(col("x1"), col("x2")), ties = ties)
        val slow = ops.Survival.coxPh(df, col("t"), col("d"),
          Seq(col("x1"), col("x2")), ties = ties, maxCells = 0)
        fast.coefficients.zip(slow.coefficients).foreach { case (a, b) =>
          a shouldBe b +- tol }
        fast.stderr.zip(slow.stderr).foreach { case (a, b) =>
          a shouldBe b +- tol }
        fast.logLik shouldBe slow.logLik +- tol
        fast.scoreChi2 shouldBe slow.scoreChi2 +- tol
        fast.n shouldBe slow.n
        fast.nEvents shouldBe slow.nEvents
        fast.nTimes shouldBe slow.nTimes
        fast.iterations shouldBe slow.iterations
      }
    }

    it("coxPhStratified: shared beta, per-stratum grids, censored-only stratum") {
      val df = frame() // stratum "c" rides d = 0 rows only on some seeds;
      // force one genuinely censored-only stratum too:
      val df2 = df.withColumn("d",
        when(col("s") === "c", lit(0)).otherwise(col("d")))
      for (ties <- Seq("breslow", "efron")) {
        val fast = ops.Survival.coxPhStratified(df2, col("t"), col("d"),
          col("s"), Seq(col("x1"), col("x2")), ties = ties)
        val slow = ops.Survival.coxPhStratified(df2, col("t"), col("d"),
          col("s"), Seq(col("x1"), col("x2")), ties = ties, maxCells = 0)
        fast.coefficients.zip(slow.coefficients).foreach { case (a, b) =>
          a shouldBe b +- tol }
        fast.stderr.zip(slow.stderr).foreach { case (a, b) =>
          a shouldBe b +- tol }
        fast.logLik shouldBe slow.logLik +- tol
        fast.scoreChi2 shouldBe slow.scoreChi2 +- tol
        fast.n shouldBe slow.n
        fast.nEvents shouldBe slow.nEvents
        fast.nTimes shouldBe slow.nTimes
      }
    }

    it("coxZph: chisq/theta frame equal on both paths") {
      val df = frame()
      sameFrames(
        ops.Survival.coxZph(df, col("t"), col("d"),
          Seq(col("x1"), col("x2")), Seq("x1", "x2")),
        ops.Survival.coxZph(df, col("t"), col("d"),
          Seq(col("x1"), col("x2")), Seq("x1", "x2"), maxCells = 0))
    }

    it("coxSurvival: stored-beta and fit-then-score curves equal") {
      val df = frame()
      sameFrames(
        ops.Survival.coxSurvival(df, col("t"), col("d"),
          Seq(col("x1"), col("x2")), Seq(2.0, 1.0),
          beta = Some(Array(0.05, -0.1))),
        ops.Survival.coxSurvival(df, col("t"), col("d"),
          Seq(col("x1"), col("x2")), Seq(2.0, 1.0),
          beta = Some(Array(0.05, -0.1)), maxCells = 0))
      sameFrames(
        ops.Survival.coxSurvival(df, col("t"), col("d"),
          Seq(col("x1"), col("x2")), Seq(2.0, 1.0)),
        ops.Survival.coxSurvival(df, col("t"), col("d"),
          Seq(col("x1"), col("x2")), Seq(2.0, 1.0), maxCells = 0))
    }

    it("fineGray: IPCW fit equal on both paths") {
      val df = crFrame()
      val fast = ops.Survival.fineGray(df, col("t"), col("cause"),
        Seq(col("x1"), col("x2")))
      val slow = ops.Survival.fineGray(df, col("t"), col("cause"),
        Seq(col("x1"), col("x2")), maxCells = 0)
      fast.coefficients.zip(slow.coefficients).foreach { case (a, b) =>
        a shouldBe b +- tol }
      fast.stderr.zip(slow.stderr).foreach { case (a, b) =>
        a shouldBe b +- tol }
      fast.logLik shouldBe slow.logLik +- tol
      fast.n shouldBe slow.n
      fast.nEvents shouldBe slow.nEvents
      fast.nCompeting shouldBe slow.nCompeting
      fast.nCensored shouldBe slow.nCensored
      fast.nTimes shouldBe slow.nTimes
    }

    it("fineGrayCif: stored-beta curve equal on both paths") {
      val df = crFrame()
      sameFrames(
        ops.Survival.fineGrayCif(df, col("t"), col("cause"),
          Seq(col("x1"), col("x2")), Seq(2.0, 1.0),
          beta = Some(Array(0.05, 0.02))),
        ops.Survival.fineGrayCif(df, col("t"), col("cause"),
          Seq(col("x1"), col("x2")), Seq(2.0, 1.0),
          beta = Some(Array(0.05, 0.02)), maxCells = 0))
    }

    it("grayTest: O/E/chi2 frame equal on both paths") {
      val df = crFrame()
      sameFrames(
        ops.Survival.grayTest(df, col("t"), col("cause"), col("g")),
        ops.Survival.grayTest(df, col("t"), col("cause"), col("g"),
          maxCells = 0))
    }

    it("continuous time defeats the collapse and falls back to the row path") {
      // 420 distinct (t, d, x…) rows > maxCells = 64 — the probe must
      // return None and the row path must run (same result as default)
      val df = frame().withColumn("t", col("t") + col("x1") * 1e-6)
      val fast = ops.Survival.coxPh(df, col("t"), col("d"),
        Seq(col("x1"), col("x2")), maxCells = 64)
      val slow = ops.Survival.coxPh(df, col("t"), col("d"),
        Seq(col("x1"), col("x2")), maxCells = 0)
      fast.coefficients.zip(slow.coefficients).foreach { case (a, b) =>
        a shouldBe b +- tol }
      fast.nTimes shouldBe slow.nTimes
    }
  }
}
