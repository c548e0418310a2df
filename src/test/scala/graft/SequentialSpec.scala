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
}
