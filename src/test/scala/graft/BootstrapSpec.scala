package graft

import graft.ops.Bootstrap
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BootstrapSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("poisson multiplicity has the right mean and determinism") {
    val d = (1 to 20000).map(_.toLong).toDF("id")
      .withColumn("u", (xxhash64($"id").cast("double") / lit(2.0 * Long.MaxValue)) + lit(0.5))
    val m = d.select(Bootstrap.poissonMultiplicity($"u", 1.0).as("k"))
    val stats = m.agg(avg($"k"), variance($"k")).head()
    assert(math.abs(stats.getDouble(0) - 1.0) < 0.05, s"mean ${stats.getDouble(0)}")
    assert(math.abs(stats.getDouble(1) - 1.0) < 0.1, s"var ${stats.getDouble(1)}")
    // deterministic: same input → same multiplicities
    val a = m.agg(sum($"k")).head().getLong(0)
    val b = m.agg(sum($"k")).head().getLong(0)
    assert(a == b)
  }

  test("bootstrap mean distribution approximates sampling distribution") {
    val rng = new scala.util.Random(5)
    val xs = (1 to 5000).map(i => (i.toLong, rng.nextGaussian() * 2 + 10))
    val d = spark.createDataFrame(xs).toDF("id", "x").repartition(4)
    val reps = Bootstrap.bootstrapAgg(d, b = 200, idCols = Seq($"id")) { w =>
      Seq("stat" -> (sum($"x" * w) / sum(w)))
    }
    assert(reps.count() == 200)
    val s = Bootstrap.summarize(reps, "stat")
    // bootstrap std ≈ σ/√n = 2/√5000 ≈ 0.0283
    assert(math.abs(s.mean - 10.0) < 0.05, s"mean ${s.mean}")
    assert(s.std > 0.015 && s.std < 0.045, s"std ${s.std}")
    assert(s.lower < 10.0 && 10.0 < s.upper)
    // reproducible across runs
    val s2 = Bootstrap.summarize(Bootstrap.bootstrapAgg(d, b = 200, idCols = Seq($"id")) { w =>
      Seq("stat" -> (sum($"x" * w) / sum(w)))
    }, "stat")
    assert(s.mean == s2.mean && s.std == s2.std)
  }

  test("permutation test: null is uniform-ish, real effect detected") {
    val rng = new scala.util.Random(17)
    val nullRows = (1 to 2000).map(i => (i.toLong, rng.nextGaussian(), rng.nextInt(2)))
    val dNull = spark.createDataFrame(nullRows).toDF("id", "y", "t")
    val (obsN, pN, _) = Bootstrap.permutationTest(dNull, $"y", $"t", b = 200, idCols = Seq($"id"))
    assert(pN > 0.01, s"null p should not be tiny: $pN (obs=$obsN)")

    val effRows = (1 to 2000).map { i =>
      val t = rng.nextInt(2)
      (i.toLong, rng.nextGaussian() + t * 0.8, t)
    }
    val dEff = spark.createDataFrame(effRows).toDF("id", "y", "t")
    val (obsE, pE, _) = Bootstrap.permutationTest(dEff, $"y", $"t", b = 200, idCols = Seq($"id"))
    assert(obsE > 0.5)
    assert(pE < 0.02, s"effect p should be small: $pE")
  }

  test("ate and ipw estimators recover effects") {
    val rng = new scala.util.Random(29)
    // confounded: P(T=1) depends on x; Y = 1.5*T + 2*x + noise
    val rows = (1 to 8000).map { i =>
      val x = rng.nextGaussian()
      val e = 1.0 / (1.0 + math.exp(-x))          // true propensity
      val t = if (rng.nextDouble() < e) 1 else 0
      val y = 1.5 * t + 2.0 * x + rng.nextGaussian() * 0.5
      (i.toLong, y, t, e)
    }
    val d = spark.createDataFrame(rows).toDF("id", "y", "t", "e")
    val naive = Bootstrap.ateEstimator(d, $"y", $"t", b = 200)
    val ipw = Bootstrap.ipwEstimator(d, $"y", $"t", $"e", b = 200)
    assert(naive.estimate > 2.0, s"naive should be confounded upward: ${naive.estimate}")
    assert(math.abs(ipw.estimate - 1.5) < 0.25, s"ipw ≈ 1.5: ${ipw.estimate}")
    assert(ipw.lower < ipw.estimate && ipw.estimate < ipw.upper)
    assert(ipw.p_value < 0.01)
  }
}
