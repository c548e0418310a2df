package graft

import graft.ops.Jackknife
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JackknifeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ratio: leave-one-out arithmetic matches a local replay") {
    val rows = (1 to 200).map { i =>
      (i % 8, 2.0 + (i % 5), 1.0 + (i % 3)) }
    val df = rows.toDF("b", "y", "x").repartition(5)
    val r = Jackknife.ratio(df, $"b", $"y", $"x").head()
    val cells = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, v) =>
      (v.map(_._2).sum, v.map(_._3).sum) }
    val s = cells.map(_._1).sum; val t = cells.map(_._2).sum
    val loo = cells.map { case (sy, sx) => (s - sy) / (t - sx) }
    val m = loo.sum / loo.length
    val se = math.sqrt((loo.length - 1.0) / loo.length *
      loo.map(v => (v - m) * (v - m)).sum)
    assert(math.abs(r.getAs[Double]("estimate") - s / t) < 1e-12)
    assert(math.abs(r.getAs[Double]("stderr") - se) < 1e-12)
    assert(r.getAs[Long]("n_buckets") == 8)
    assert(r.getAs[Double]("lower") < s / t && s / t < r.getAs[Double]("upper"))
  }

  test("ratioDiff: A/A keeps the null, planted ratio shift is detected") {
    val rng = new scala.util.Random(3)
    def mk(effect: Double) = (1 to 20000).map { i =>
      val t = i % 2
      val x = 1.0 + rng.nextDouble()
      (i % 64, t, x * (2.0 + effect * t) + rng.nextGaussian() * 0.1, x)
    }.toDF("b", "t", "y", "x")
    val aa = Jackknife.ratioDiff(mk(0.0), $"b", $"y", $"x", $"t").head()
    assert(aa.getAs[Double]("p_value") > 0.01)
    val eff = Jackknife.ratioDiff(mk(0.3), $"b", $"y", $"x", $"t").head()
    assert(eff.getAs[Double]("p_value") < 1e-6)
    assert(math.abs(eff.getAs[Double]("estimate") - 0.3) < 0.05)
  }

  test("named guards: too few buckets, zeroed denominator") {
    val one = Seq((1, 1.0, 1.0)).toDF("b", "y", "x")
    val e1 = intercept[IllegalArgumentException] {
      Jackknife.ratio(one, $"b", $"y", $"x") }
    assert(e1.getMessage.contains("buckets"))
    // bucket 2 holds the entire denominator: removing it divides by zero
    val conc = Seq((1, 1.0, 0.0), (2, 1.0, 5.0)).toDF("b", "y", "x")
    val e2 = intercept[IllegalArgumentException] {
      Jackknife.ratio(conc, $"b", $"y", $"x") }
    assert(e2.getMessage.contains("denominator"))
  }
}
