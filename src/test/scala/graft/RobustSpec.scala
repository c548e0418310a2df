package graft

import graft.ops._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RobustSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("robustMeans: hand-checked winsorized/trimmed means on 1..20 with outliers") {
    // 1..18 plus two whales; p10/p90 exact-interpolated on the sorted set
    val xs = (1 to 18).map(_.toDouble) ++ Seq(1000.0, 5000.0)
    val df = xs.toDF("x")
    val r = Robust.robustMeans(df, $"x", pLo = 0.1, pHi = 0.9, exact = true).head()
    val sorted = xs.sorted
    def q(p: Double): Double = {
      val idx = p * (sorted.length - 1)
      val f = idx.toInt
      sorted(f) + (idx - f) * (sorted(math.min(f + 1, sorted.length - 1)) - sorted(f))
    }
    val (lo, hi) = (q(0.1), q(0.9))
    assert(r.getLong(0) == 20L)
    // Spark interpolates (1-f)*a + f*b; the replica a + f*(b-a) differs in
    // the last ulp — value parity with DuckDB is covered by the q114 oracle
    assert(math.abs(r.getDouble(1) - lo) < 1e-9 &&
      math.abs(r.getDouble(2) - hi) < 1e-9)
    val win = xs.map(v => math.max(lo, math.min(hi, v))).sum / 20
    assert(math.abs(r.getDouble(4) - win) < 1e-9)
    val trimmed = xs.filter(v => v >= lo && v <= hi)
    assert(math.abs(r.getDouble(5) - trimmed.sum / trimmed.length) < 1e-9)
    assert(r.getLong(6) == xs.count(_ < lo) && r.getLong(7) == xs.count(_ > hi))
    // whales dominate the raw mean but not the robust ones
    assert(r.getDouble(3) > 100 && r.getDouble(4) < 100)
  }

  test("robustMeans: approx path agrees with exact on a smooth column") {
    val df = (1 to 10000).map(_.toDouble).toDF("x")
    val ex = Robust.robustMeans(df, $"x", exact = true).head()
    val ap = Robust.robustMeans(df, $"x", exact = false).head()
    assert(math.abs(ex.getDouble(4) - ap.getDouble(4)) / ex.getDouble(4) < 0.01)
    assert(math.abs(ex.getDouble(5) - ap.getDouble(5)) / ex.getDouble(5) < 0.01)
  }

  test("winsorize column clips and quantileBounds validates") {
    val v = Seq(-5.0, 0.5, 99.0).toDF("x")
      .select(Robust.winsorize($"x", 0.0, 1.0).as("w"))
      .collect().map(_.getDouble(0)).toSeq
    assert(v == Seq(0.0, 0.5, 1.0))
    intercept[IllegalArgumentException] {
      Robust.quantileBounds(v.toDF("x"), $"x", 0.9, 0.1)
    }
  }
}
