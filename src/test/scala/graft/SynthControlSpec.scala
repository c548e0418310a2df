package graft

import graft.ops.SynthControl
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SynthControlSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // three donors with linearly-independent nonlinear paths, so the
  // planted convex combination is the UNIQUE simplex optimum
  private def donorVal(u: String, t: Int): Double = u match {
    case "d1" => 10.0 + t + 0.1 * t * t
    case "d2" => 40.0 - 0.5 * t
    case _ => 15.0 + 3.0 * ((t * 7) % 5)
  }

  private lazy val panel = {
    val rows = (1 to 30).flatMap { t =>
      val tr = 0.3 * donorVal("d1", t) + 0.7 * donorVal("d2", t) +
        (if (t > 20) 5.0 else 0.0) // effect appears after the pre window
      Seq(("treated", t, tr), ("d1", t, donorVal("d1", t)),
        ("d2", t, donorVal("d2", t)), ("d3", t, donorVal("d3", t)))
    }
    rows.toDF("u", "t", "y").repartition(5)
  }

  test("synthControl recovers planted simplex weights and the post effect path") {
    val r = SynthControl.synthControl(panel, $"u", $"t", $"y", "treated", 20.0)
    assert(r.donors.toSeq == Seq("d1", "d2", "d3"))
    assert(math.abs(r.weights(0) - 0.3) < 0.01 &&
      math.abs(r.weights(1) - 0.7) < 0.01 && r.weights(2) < 0.01,
      r.weights.mkString(","))
    assert(math.abs(r.weights.sum - 1.0) < 1e-12 && r.weights.forall(_ >= 0))
    assert(r.preRmse < 0.05, s"preRmse ${r.preRmse}")
    val path = r.path.collect()
    assert(path.length == 30 && path.map(_.getDouble(0)).toSeq ==
      (1 to 30).map(_.toDouble))
    val postGaps = path.filter(!_.getBoolean(1)).map(_.getDouble(4))
    assert(postGaps.length == 10 &&
      postGaps.forall(g => math.abs(g - 5.0) < 0.1), postGaps.mkString(","))
    assert(path.filter(_.getBoolean(1)).forall(p => math.abs(p.getDouble(4)) < 0.1))
  }

  test("synthControl guards and gateway verb") {
    intercept[IllegalArgumentException] { // treated unit absent
      SynthControl.synthControl(panel.filter($"u" =!= "treated"),
        $"u", $"t", $"y", "treated", 20.0)
    }
    // unbalanced donors are EXCLUDED; with d1 and d3 holed the pool
    // shrinks below the 2-donor floor and the error says to balance
    val holed = panel.filter(!($"u" === "d1" && $"t" === 5) &&
      !($"u" === "d3" && $"t" === 7))
    val e = intercept[IllegalArgumentException] {
      SynthControl.synthControl(holed, $"u", $"t", $"y", "treated", 20.0)
    }
    assert(e.getMessage.contains("balance"), e.getMessage)
    intercept[IllegalArgumentException] { // one pre-period is not a fit
      SynthControl.synthControl(panel, $"u", $"t", $"y", "treated", 1.0)
    }
    panel.createOrReplaceTempView("synth_t")
    val viaSql = GraftGateway.sql(spark,
      "SELECT synth_control(u, t, y, 'treated', 20) FROM synth_t")
    assert(viaSql.count() == 30)
    assert(viaSql.columns.toSeq ==
      Seq("period", "is_pre", "y_treated", "y_synth", "gap"))
  }

  test("placeboTest ranks the planted-effect treated unit first") {
    val rows = SynthControl.placeboTest(panel, $"u", $"t", $"y", "treated", 20.0)
      .collect()
    assert(rows.length == 4) // treated + 3 donor placebos
    val byUnit = rows.map(r => r.getString(0) ->
      (r.getBoolean(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getInt(5), r.getDouble(6))).toMap
    val (isT, pre, post, ratio, rank, p) = byUnit("treated")
    assert(isT && rank == 1 && math.abs(p - 0.25) < 1e-12)
    // the +5 planted post effect against a <0.05 pre fit: a huge ratio
    assert(pre < 0.05 && post > 4.0 && ratio > 50.0, s"$pre $post $ratio")
    // placebos carry no effect: ratios well under the treated one, and
    // the treated unit is excluded from every placebo donor pool (their
    // fits must not be able to borrow the effect)
    rows.filter(!_.getBoolean(1)).foreach { r =>
      assert(r.getDouble(4) < ratio / 10, s"placebo ${r.getString(0)}: $r")
      assert(!r.getBoolean(1) && r.getInt(5) > 1)
    }
    // ranks are the descending-ratio order, p = rank / n
    rows.foreach(r => assert(
      math.abs(r.getDouble(6) - r.getInt(5) / 4.0) < 1e-12))
    // gateway verb
    panel.createOrReplaceTempView("synth_t")
    val viaSql = GraftGateway.sql(spark,
      "SELECT synth_placebo(u, t, y, 'treated', 20) FROM synth_t")
    assert(viaSql.columns.toSeq == Seq("unit", "is_treated", "pre_rmse",
      "post_rmse", "rmse_ratio", "rank", "p_value"))
    assert(viaSql.count() == 4)
    // guard: too few donors for placebo pools
    val e = intercept[IllegalArgumentException] {
      SynthControl.placeboTest(panel.filter($"u" =!= "d3"),
        $"u", $"t", $"y", "treated", 20.0)
    }
    assert(e.getMessage.contains(">= 3"), e.getMessage)
  }
}
