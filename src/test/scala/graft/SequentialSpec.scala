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
}
