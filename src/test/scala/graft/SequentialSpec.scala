package graft

import graft.ops.Sequential
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SequentialSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fixture(effect: Double, seed: Int) = {
    val rng = new scala.util.Random(seed)
    (1 to 8000).map { i =>
      val t = i % 2
      val b = (i - 1) / 400 // 20 looks of 400 rows
      (b.toLong, t, effect * t + rng.nextGaussian())
    }.toDF("b", "t", "y")
  }

  test("msprt: planted effect rejects, A/A stays high, p is nonincreasing") {
    val eff = Sequential.msprt(fixture(0.5, 11), $"b", $"y", $"t", tau = 1.0)
      .collect()
    val ps = eff.map(_.getAs[Double]("p_always_valid"))
    assert(ps.length == 20)
    // p never increases (running-max inversion)
    ps.sliding(2).foreach(w => assert(w(1) <= w(0) + 1e-15))
    assert(ps.last < 0.01, s"planted effect not detected: ${ps.last}")
    val nul = Sequential.msprt(fixture(0.0, 12), $"b", $"y", $"t", tau = 1.0)
      .collect().map(_.getAs[Double]("p_always_valid"))
    assert(nul.last > 0.2, s"A/A false-positive: ${nul.last}")
    // lambda replays the closed form at the final look
    val last = eff.last
    assert(last.getAs[Long]("n1") == 4000 && last.getAs[Long]("n0") == 4000)
    assert(last.getAs[Double]("lambda") > 1.0)
  }

  test("msprt guards: bucket overflow and bad tau fail fast") {
    val d = fixture(0.0, 13)
    val e = intercept[IllegalArgumentException] {
      Sequential.msprt(d, $"b", $"y", $"t", maxBuckets = 5)
    }
    assert(e.getMessage.contains("maxBuckets"), e.getMessage)
    intercept[IllegalArgumentException] {
      Sequential.msprt(d, $"b", $"y", $"t", tau = 0.0)
    }
    // pre-variance looks are not emitted: a bucket where one arm has < 2
    // cumulative rows drops out instead of dividing by zero
    val sparse = Seq((0L, 1, 1.0), (0L, 1, 2.0), (1L, 0, 0.5), (1L, 0, 1.5),
      (2L, 1, 1.2)).toDF("b", "t", "y")
    val r = Sequential.msprt(sparse, $"b", $"y", $"t").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L), r.mkString(","))
    // gateway verb dispatch
    d.createOrReplaceTempView("msprt_t")
    assert(GraftGateway.sql(spark,
      "SELECT msprt(b, y, t, 1.0) FROM msprt_t").count() == 20)
  }

  test("msprtBy: per-experiment trajectories equal msprt run separately") {
    val parts = Seq(("A", 0.5, 21), ("B", 0.0, 22), ("C", 0.3, 23))
    val combined = parts.map { case (name, eff, seed) =>
      fixture(eff, seed).withColumn("exp", lit(name))
    }.reduce(_ unionByName _).repartition(5)
    val grouped = Sequential.msprtBy(combined, $"exp", $"b", $"y", $"t",
        tau = 1.0).collect()
      .groupBy(_.getString(0))
    assert(grouped.keySet == Set("A", "B", "C"))
    parts.foreach { case (name, eff, seed) =>
      val solo = Sequential.msprt(fixture(eff, seed), $"b", $"y", $"t",
        tau = 1.0).collect()
      val g = grouped(name).sortBy(_.getLong(1))
      assert(g.length == solo.length, s"$name: ${g.length} vs ${solo.length}")
      solo.zip(g).foreach { case (a, b) =>
        assert(a.getLong(0) == b.getLong(1) && a.getLong(1) == b.getLong(2) &&
          a.getLong(2) == b.getLong(3))
        // cells aggregate over different partitionings (union+repartition
        // vs solo), so sums differ in the last ulp and exp() amplifies:
        // compare at relative 1e-6, not bit-exactly
        Seq((3, 4), (4, 5), (5, 6)).foreach { case (ia, ib) =>
          val (x, y) = (a.getDouble(ia), b.getDouble(ib))
          assert(math.abs(x - y) < 1e-6 * math.max(1.0, math.abs(x)),
            s"$name bucket ${a.getLong(0)} col $ia: $x vs $y")
        }
      }
    }
    // the planted-effect experiments reject; the A/A one does not
    assert(grouped("A").map(_.getAs[Double]("p_always_valid")).min < 0.01)
    assert(grouped("B").map(_.getAs[Double]("p_always_valid")).min > 0.2)
    // cell guard names its knob; gateway verb dispatches
    val e = intercept[IllegalArgumentException] {
      Sequential.msprtBy(combined, $"exp", $"b", $"y", $"t", maxCells = 5)
    }
    assert(e.getMessage.contains("maxCells"), e.getMessage)
    combined.createOrReplaceTempView("msprt_by_t")
    assert(GraftGateway.sql(spark,
      "SELECT msprt_by(exp, b, y, t, 1.0) FROM msprt_by_t").count() == 60)
  }

  test("groupSequentialBounds reproduces the textbook Lan-DeMets OBF boundaries") {
    // K = 5 equally-spaced looks, alpha 0.05 two-sided, OBF-like
    // spending. Look 1 is ANALYTIC: no prior looks, so the boundary is
    // exactly Phi^-1(1 - a(0.2)/2) = 4.3827. Look 2 was verified against
    // a DIRECT bivariate-normal integration (corr sqrt(t1/t2), conditional
    // tail integrated over the look-1 corridor): 3.0997 — the recursion
    // lands within grid error. Later looks pin the recursion at a finer
    // reference grid (n = 4001), same algorithm replicated independently.
    val obf = Sequential.groupSequentialBounds(spark,
      Seq(0.2, 0.4, 0.6, 0.8, 1.0)).collect().map(_.getDouble(3))
    val expect = Seq(4.3827, 3.0997, 2.5510, 2.2540, 2.0640)
    obf.zip(expect).zipWithIndex.foreach { case ((g, e), i) =>
      assert(math.abs(g - e) < 0.01, s"look ${i + 1}: $g vs $e")
    }
    // Pocock-like spending: near-constant nominal boundary ~2.41
    val poc = Sequential.groupSequentialBounds(spark,
      Seq(0.2, 0.4, 0.6, 0.8, 1.0), spending = "pocock")
      .collect().map(_.getDouble(3))
    assert(poc.forall(b => b > 2.3 && b < 2.5), poc.mkString(","))
    assert(poc.max - poc.min < 0.1, "Pocock boundaries should be near-flat")
    // spending is monotone and tops out at alpha
    val spent = Sequential.groupSequentialBounds(spark,
      Seq(0.25, 0.5, 0.75, 1.0)).collect().map(_.getDouble(2))
    spent.sliding(2).foreach(w => assert(w.length < 2 || w(1) >= w(0)))
    assert(math.abs(spent.last - 0.05) < 1e-12)
    intercept[IllegalArgumentException] {
      Sequential.groupSequentialBounds(spark, Seq(0.5, 0.4))
    }
    intercept[IllegalArgumentException] {
      Sequential.groupSequentialBounds(spark, Seq(0.5, 1.0), spending = "nope")
    }
  }

  test("groupSequentialTest: planted effect crosses, A/A does not") {
    val eff = Sequential.groupSequentialTest(fixture(0.5, 31), $"b", $"y", $"t")
      .collect()
    assert(eff.length == 20)
    assert(eff.map(_.getInt(0)).toSeq == (1 to 20))
    // boundaries decrease as information accrues (OBF shape)
    val bounds = eff.map(_.getDouble(6))
    bounds.sliding(2).foreach(w => assert(w.length < 2 || w(1) <= w(0) + 1e-9))
    assert(eff.exists(_.getBoolean(7)), "planted effect never crossed")
    val nul = Sequential.groupSequentialTest(fixture(0.0, 32), $"b", $"y", $"t")
      .collect()
    assert(!nul.forall(_.getBoolean(7)), "A/A crossed at every look??")
    assert(nul.count(_.getBoolean(7)) == 0, "A/A false positive")
    // look-count guard names the knob
    val e = intercept[IllegalArgumentException] {
      Sequential.groupSequentialTest(fixture(0.0, 33), $"b", $"y", $"t",
        maxBuckets = 5)
    }
    assert(e.getMessage.contains("maxBuckets"), e.getMessage)
    // gateway verb
    fixture(0.5, 31).createOrReplaceTempView("gst_t")
    assert(GraftGateway.sql(spark,
      "SELECT group_sequential(b, y, t) FROM gst_t").count() == 20)
  }

  test("srmSequential: closed form matches, mismatch detected, balance survives") {
    import org.apache.commons.math3.special.Gamma.logGamma
    // tiny exact fixture: 2 looks, counts (3,1) then cumulative (5,3)
    val tiny = Seq((1L, 0), (1L, 0), (1L, 0), (1L, 1),
        (2L, 0), (2L, 0), (2L, 1), (2L, 1))
      .toDF("b", "arm")
    val r = Sequential.srmSequential(tiny, $"b", $"arm", Seq(1.0, 1.0))
      .collect()
    def logE(n0: Long, n1: Long): Double =
      logGamma(2.0) - 2 * logGamma(1.0) +
        logGamma(1.0 + n0) + logGamma(1.0 + n1) -
        logGamma(2.0 + n0 + n1) - n0 * math.log(0.5) - n1 * math.log(0.5)
    assert(r.length == 2)
    assert(math.abs(r(0).getAs[Double]("log_e") - logE(3, 1)) < 1e-12)
    assert(math.abs(r(1).getAs[Double]("log_e") - logE(5, 3)) < 1e-12)
    assert(math.abs(r(1).getAs[Double]("p_always_valid") -
      math.min(1.0, math.exp(-math.max(logE(3, 1), logE(5, 3))))) < 1e-12)
    // ratio normalization: (2,2) is the same null as (1,1)
    val r2 = Sequential.srmSequential(tiny, $"b", $"arm", Seq(2.0, 2.0))
      .collect()
    assert(math.abs(r2(0).getAs[Double]("log_e") -
      r(0).getAs[Double]("log_e")) < 1e-12)
    // planted 60/40 against a 50/50 null: p collapses; true 50/50 stays
    // comfortably high (the e-process has expectation 1 under the null)
    def arms(p1Num: Int) = (1 to 20000).map { i =>
      ((i - 1) / 1000L, if (i % 10 < p1Num) 1 else 0) }.toDF("b", "arm")
    val bad = Sequential.srmSequential(arms(6), $"b", $"arm", Seq(1.0, 1.0))
      .collect().map(_.getAs[Double]("p_always_valid"))
    assert(bad.last < 1e-6, s"mismatch p ${bad.last}")
    assert(bad.zip(bad.tail).forall { case (a, c) => c <= a + 1e-15 },
      "p must be nonincreasing")
    val ok = Sequential.srmSequential(arms(5), $"b", $"arm", Seq(1.0, 1.0))
      .collect().map(_.getAs[Double]("p_always_valid"))
    assert(ok.last > 0.05, s"A/A p ${ok.last}")
    // named guards: arm outside 0..K-1; bad ratios
    val e1 = intercept[IllegalArgumentException] {
      Sequential.srmSequential(tiny.withColumn("arm", $"arm" + 5),
        $"b", $"arm", Seq(1.0, 1.0)) }
    assert(e1.getMessage.contains("outside"))
    val e2 = intercept[IllegalArgumentException] {
      Sequential.srmSequential(tiny, $"b", $"arm", Seq(1.0)) }
    assert(e2.getMessage.contains("arms"))
  }
}
