package graft

import org.apache.spark.sql.functions._
import org.scalatest.funspec.AnyFunSpec
import org.scalatest.matchers.should.Matchers

/** The r18 optimization round's cell-collapse fast paths
  * ([[graft.stats.DesignCells]]): every iterative fit must produce the
  * SAME estimates/inference whether the loop runs distributed (one
  * aggregate per iteration) or driver-side over collapsed cells. Each
  * test fits both ways — maxCells = 0 forces the distributed row path —
  * and pins the paths together far tighter than any query's rounding. */
class FitCellsSpec extends AnyFunSpec with Matchers {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val tol = 1e-8

  private def frame() = {
    val rows = (0 until 400).map { i =>
      val x1 = (i % 5).toDouble
      val x2 = ((i / 4) % 2).toDouble
      // y depends on BOTH covariates through shifted thresholds over a
      // pseudo-random draw, with full support everywhere: a y exactly
      // independent of x makes the init gradient exactly zero (both
      // paths reject the zero direction), and a y deterministic in x
      // separates the softmax fit — both are genuine edge cases of the
      // MODEL, not of the cell collapse under test here
      val r = (i * 37 + (i * i) % 101) % 10
      val y = if (r < 2 + (i % 5)) 1.0
              else if (r < 5) 2.0
              else if (r < 8 - ((i / 4) % 2)) 3.0
              else 4.0
      val t = 1.0 + (i % 7).toDouble
      val d = if (i % 3 == 0) 0 else 1
      val cnt = (i % 6).toDouble
      (t, d, x1, x2, y, cnt)
    }
    rows.toDF("t", "d", "x1", "x2", "y", "cnt")
  }

  describe("cell-collapse fast paths match the distributed row paths") {
    it("aft: all three distributions") {
      val df = frame()
      for (dist <- Seq("weibull", "lognormal", "loglogistic")) {
        val fast = ops.Aft.aftFit(df, col("t"), col("d"),
          Seq(col("x1"), col("x2")), Seq("x1", "x2"), dist = dist)
        val slow = ops.Aft.aftFit(df, col("t"), col("d"),
          Seq(col("x1"), col("x2")), Seq("x1", "x2"), dist = dist,
          maxCells = 0)
        fast.estimates.zip(slow.estimates).foreach { case (a, b) =>
          a shouldBe b +- tol
        }
        fast.stderr.zip(slow.stderr).foreach { case (a, b) =>
          a shouldBe b +- tol
        }
        fast.n shouldBe slow.n
        fast.nEvents shouldBe slow.nEvents
      }
    }

    it("ordinal_logit") {
      val df = frame()
      val fast = ops.Ordinal.ordinalLogit(df, col("y"),
        Seq(col("x1"), col("x2")), Seq("x1", "x2"))
      val slow = ops.Ordinal.ordinalLogit(df, col("y"),
        Seq(col("x1"), col("x2")), Seq("x1", "x2"), maxCells = 0)
      fast.estimates.zip(slow.estimates).foreach { case (a, b) =>
        a shouldBe b +- tol
      }
      fast.stderr.zip(slow.stderr).foreach { case (a, b) =>
        a shouldBe b +- tol
      }
      fast.levels shouldBe slow.levels
      fast.n shouldBe slow.n
    }

    it("multinomial_logit") {
      val df = frame()
      val fast = ops.Multinomial.multinomialLogit(df, col("y"),
        Seq(col("x1"), col("x2")), Seq("x1", "x2"))
      val slow = ops.Multinomial.multinomialLogit(df, col("y"),
        Seq(col("x1"), col("x2")), Seq("x1", "x2"), maxCells = 0)
      fast.estimates.flatMap(_.toSeq).zip(slow.estimates.flatMap(_.toSeq))
        .foreach { case (a, b) => a shouldBe b +- tol }
      fast.stderr.flatMap(_.toSeq).zip(slow.stderr.flatMap(_.toSeq))
        .foreach { case (a, b) => a shouldBe b +- tol }
      fast.n shouldBe slow.n
    }

    it("logistic IRLS") {
      val df = frame().withColumn("lbl", (col("y") > 2.0).cast("double"))
      val fast = ops.MlWrappers.logisticIrls(df, col("lbl"),
        Seq(col("x1"), col("x2")))
      val slow = ops.MlWrappers.logisticIrls(df, col("lbl"),
        Seq(col("x1"), col("x2")), maxCells = 0)
      (fast.coefficients :+ fast.intercept)
        .zip(slow.coefficients :+ slow.intercept).foreach { case (a, b) =>
          a shouldBe b +- tol
        }
      (fast.stderr :+ fast.interceptStderr)
        .zip(slow.stderr :+ slow.interceptStderr).foreach { case (a, b) =>
          a shouldBe b +- tol
        }
    }

    it("poisson IRLS") {
      val df = frame()
      val fast = ops.MlWrappers.poissonIrls(df, col("cnt"),
        Seq(col("x1"), col("x2")))
      val slow = ops.MlWrappers.poissonIrls(df, col("cnt"),
        Seq(col("x1"), col("x2")), maxCells = 0)
      (fast.coefficients :+ fast.intercept)
        .zip(slow.coefficients :+ slow.intercept).foreach { case (a, b) =>
          a shouldBe b +- tol
        }
      fast.dispersion shouldBe slow.dispersion +- tol
      fast.n shouldBe slow.n
    }

    it("gamma IRLS") {
      val df = frame().withColumn("pos", col("y") + col("x1") * 0.5)
      val fast = ops.MlWrappers.gammaIrls(df, col("pos"),
        Seq(col("x1"), col("x2")))
      val slow = ops.MlWrappers.gammaIrls(df, col("pos"),
        Seq(col("x1"), col("x2")), maxCells = 0)
      (fast.coefficients :+ fast.intercept)
        .zip(slow.coefficients :+ slow.intercept).foreach { case (a, b) =>
          a shouldBe b +- tol
        }
      (fast.stderr :+ fast.interceptStderr)
        .zip(slow.stderr :+ slow.interceptStderr).foreach { case (a, b) =>
          a shouldBe b +- tol
        }
      fast.dispersion shouldBe slow.dispersion +- tol
    }

    it("negative-binomial IRLS") {
      // overdispersed counts: variance grows with the mean faster than
      // Poisson (y has a planted multiplicative burst)
      val df = frame().withColumn("nb",
        (col("cnt") * (lit(1.0) + col("x2") * 3.0)).cast("double"))
      val fast = ops.MlWrappers.negBinIrls(df, col("nb"), Seq(col("x1")))
      val slow = ops.MlWrappers.negBinIrls(df, col("nb"), Seq(col("x1")),
        maxCells = 0)
      fast.alpha shouldBe slow.alpha +- tol
      fast.alphaSe shouldBe slow.alphaSe +- tol
      (fast.coefficients :+ fast.intercept)
        .zip(slow.coefficients :+ slow.intercept).foreach { case (a, b) =>
          a shouldBe b +- tol
        }
      fast.llPois shouldBe slow.llPois +- 1e-6
      fast.llNb shouldBe slow.llNb +- 1e-6
      fast.lrStat shouldBe slow.lrStat +- 1e-6
    }

    it("continuous covariates fall back to the row path (collapse bails)") {
      val df = (0 until 300).map { i =>
        (i.toDouble / 7.0 + 0.1, (i % 2).toDouble)
      }.toDF("xc", "lbl")
      // xc has 300 distinct values > maxCells 16: must still fit fine
      val fit = ops.MlWrappers.logisticIrls(df, col("lbl"), Seq(col("xc")),
        maxCells = 16)
      fit.converged shouldBe true
    }
  }
}
