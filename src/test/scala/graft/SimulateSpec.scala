package graft

import graft.ops.{Bootstrap, Simulate}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimulateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("randomizedTrial moments match the Nie-Wager Setup B design") {
    val df = Simulate.randomizedTrial(spark, n = 40000, seed = 7L).persist()
    val r = df.agg(avg($"treatment").as("w"),
      avg($"feature_1").as("f1"), stddev_samp($"feature_1").as("s1"),
      avg($"actual_cate").as("tau"),
      corr($"feature_1", $"feature_2").as("c12")).head()
    assert(math.abs(r.getAs[Double]("w") - 0.5) < 0.01)            // e = 0.5
    assert(math.abs(r.getAs[Double]("f1")) < 0.02)                 // N(0,1)
    assert(math.abs(r.getAs[Double]("s1") - 1.0) < 0.02)
    // E[τ] = E[x1] + E[log(1+e^x2)] ≈ 0 + 0.806
    assert(math.abs(r.getAs[Double]("tau") - 0.806) < 0.03)
    assert(math.abs(r.getAs[Double]("c12")) < 0.02)                // independent
    // difference in means recovers E[τ] on a randomized design
    val ate = Bootstrap.ateEstimator(df, $"outcome", $"treatment", b = 30,
      idCols = Seq($"id"))
    assert(math.abs(ate.estimate - r.getAs[Double]("tau")) < 0.06)
    df.unpersist()
  }

  test("deterministic across partition layouts and seeds differ") {
    def sig(n: Long, seed: Long) =
      Simulate.randomizedTrial(spark, n, seed = seed)
        .select(xxhash64($"id", $"treatment", round($"outcome", 9)).as("h"))
        .agg(expr("bit_xor(h)")).head().getLong(0)
    assert(sig(5000, 1L) == sig(5000, 1L))
    assert(sig(5000, 1L) != sig(5000, 2L))
  }

  test("binary outcome and cost/benefit columns follow the contract") {
    val df = Simulate.randomizedTrial(spark, n = 20000, binaryOutcome = true,
      addCostBenefit = true, seed = 3L).persist()
    // outcome is 0/1
    assert(df.filter($"outcome" =!= 0.0 && $"outcome" =!= 1.0).count() == 0)
    // actual_cate bounded in [-1, 1] (sigmoid difference)
    assert(df.filter(abs($"actual_cate") > 1.0).count() == 0)
    // benefit zero iff outcome zero; cost = benefit/4 for treated, 0 control
    assert(df.filter($"outcome" === 0.0 && $"benefit" =!= 0.0).count() == 0)
    assert(df.filter($"treatment" === 0 && $"cost" =!= 0.0).count() == 0)
    assert(df.filter($"treatment" === 1 &&
      abs($"cost" - $"benefit" * 0.25) > 1e-12).count() == 0)
    // Gamma(3) mean = 3 among positive-outcome rows
    val m = df.filter($"outcome" === 1.0).agg(avg($"benefit")).head().getDouble(0)
    assert(math.abs(m - 3.0) < 0.1)
    df.unpersist()
  }
}
