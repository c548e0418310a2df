package graft

import graft.stats.{DeltaStats, TtestCommon}
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .getOrCreate()
}

class DeltaAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic synthetic experiment data: ratio metric + correlated pre-period
  private lazy val rows: Seq[(Int, Double, Double, Double, Double)] = {
    val rng = new scala.util.Random(42)
    (1 to 4000).map { _ =>
      val t = if (rng.nextDouble() < 0.5) 1 else 0
      val pre = 5.0 + rng.nextGaussian()
      val dpre = 1.0 + (if (rng.nextDouble() < 0.3) 1.0 else 0.0)
      val d = 1.0 + (if (rng.nextDouble() < 0.3) 1.0 else 0.0)
      val y = 0.8 * pre + 0.3 * t + rng.nextGaussian() + 2.0
      (t, y, d, pre, dpre)
    }
  }
  private lazy val df = spark.createDataFrame(rows).toDF("t", "y", "d", "y_pre", "d_pre")
    .repartition(4)

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("delta_method of plain mean == var_samp/n (distributed == closed form)") {
    val got = df.select(
      functions.delta_method("x1", isStd = false, Seq(col("y"))).as("dm"),
      (var_samp($"y") / count(lit(1))).as("expect")
    ).head()
    assert(approx(got.getDouble(0), got.getDouble(1), 1e-9))
  }

  test("delta_method ratio: distributed matches local DeltaStats") {
    val got = df.select(functions.delta_method("x1/x2", isStd = true, Seq($"y", $"d"))).head().getDouble(0)
    val local = DeltaStats.zero(2)
    rows.foreach(r => local.update(Array(r._2, r._3)))
    val expect = DeltaStats.calcDeltaMethod(
      graft.expr.ExprTree("x1/x2", 2), local.count, local.means, local.covMatrix, isStd = true)
    assert(approx(got, expect, 1e-9))
  }

  test("ttest_1samp matches local math and z-test closed form") {
    val r = df.select(functions.ttest_1samp("x1", "two-sided", 4.0)($"y").as("r"))
      .select($"r.*").head()
    val ys = rows.map(_._2)
    val n = ys.length
    val mean = ys.sum / n
    val v = ys.map(x => (x - mean) * (x - mean)).sum / (n - 1)
    val stderr = math.sqrt(v / n)
    val t = (mean - 4.0) / stderr
    assert(approx(r.getAs[Double]("estimate"), mean - 4.0, 1e-9))
    assert(approx(r.getAs[Double]("stderr"), stderr, 1e-9))
    assert(approx(r.getAs[Double]("t_statistic"), t, 1e-9))
    val p = 2 * (1 - graft.stats.Dist.normCdf(math.abs(t)))
    assert(approx(r.getAs[Double]("p_value"), p, 1e-9))
  }

  test("ttest_2samp ratio metric matches local reference math") {
    val r = df.select(
      functions.ttest_2samp("x1/x2", $"t")($"y", $"d").as("r")).select($"r.*").head()
    // local ground truth with the same algorithm structure
    val s0 = DeltaStats.zero(2); val s1 = DeltaStats.zero(2)
    rows.foreach(x => (if (x._1 == 0) s0 else s1).update(Array(x._2, x._3)))
    val combined = DeltaStats.zero(2).merge(s0).merge(s1)
    val (m0, m1, v0, v1) = TtestCommon.calcMeansAndVars("x1/x2", "", 2, s0, s1, combined)
    assert(approx(r.getAs[Double]("mean0"), m0, 1e-9))
    assert(approx(r.getAs[Double]("mean1"), m1, 1e-9))
    assert(approx(r.getAs[Double]("estimate"), m1 - m0, 1e-9))
    assert(approx(r.getAs[Double]("stderr"), math.sqrt(v0 + v1), 1e-9))
    // sanity: detectable effect, significant p
    assert(r.getAs[Double]("p_value") >= 0 && r.getAs[Double]("p_value") <= 1)
  }

  test("ttest_2samp with CUPED narrows stderr and matches local math") {
    val plain = df.select(functions.ttest2Samp("avg(y)/avg(d)", $"t").as("r")).select($"r.*").head()
    val cuped = df.select(functions.ttest2Samp("avg(y)/avg(d)", $"t",
      cuped = "avg(y_pre)/avg(d_pre)").as("r")).select($"r.*").head()
    assert(cuped.getAs[Double]("stderr") < plain.getAs[Double]("stderr"))

    val s0 = DeltaStats.zero(4); val s1 = DeltaStats.zero(4)
    rows.foreach(x => (if (x._1 == 0) s0 else s1).update(Array(x._2, x._3, x._4, x._5)))
    val combined = DeltaStats.zero(4).merge(s0).merge(s1)
    val (m0, m1, v0, v1) = TtestCommon.calcMeansAndVars("x1/x2", "x3/x4", 4, s0, s1, combined)
    assert(approx(cuped.getAs[Double]("mean0"), m0, 1e-9))
    assert(approx(cuped.getAs[Double]("mean1"), m1, 1e-9))
    assert(approx(cuped.getAs[Double]("stderr"), math.sqrt(v0 + v1), 1e-9))

    // multi-covariate CUPED (reference 'X=x3/x4+x5' flat split on +,
    // ttest_common.h:133-175): still a valid variance reduction, at least
    // as tight as the single-covariate adjustment on the strongest part
    val multi = df.select(functions.ttest2Samp("avg(y)/avg(d)", $"t",
      cuped = "avg(y_pre)/avg(d_pre)+avg(d_pre)").as("r")).select($"r.*").head()
    assert(multi.getAs[Double]("stderr") <= cuped.getAs[Double]("stderr") + 1e-12)
    assert(multi.getAs[Double]("p_value") >= 0 && multi.getAs[Double]("p_value") <= 1)
  }

  test("ttest_2samp_pse recombines strata") {
    val withStratum = df.withColumn("s", (abs(hash($"y")) % 3).cast("long"))
    val r = withStratum.select(functions.ttest_2samp_pse("x1", $"t", $"s")($"y").as("r"))
      .select($"r.*").head()
    assert(!r.getAs[Double]("estimate").isNaN)
    assert(r.getAs[Double]("stderr") > 0)
  }

  test("grouped ttest_2samp works per group") {
    val withG = df.withColumn("g", ($"d" > 1.5).cast("int"))
    val out = withG.groupBy($"g")
      .agg(functions.ttest_2samp("x1", $"t")($"y").as("r"))
      .select($"g", $"r.estimate")
      .collect()
    assert(out.length == 2 && out.forall(r => !r.getDouble(1).isNaN))
  }
}
