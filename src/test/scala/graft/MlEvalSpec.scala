package graft

import graft.ops.MlEval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MlEvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("rocCurve confusion quadrants and AUC on a hand-checkable fixture") {
    // scores 0.1..1.0; positives are the top 5 scores → perfect separation
    // at t=0.6, AUC = 1
    val perfect = (1 to 10).map(i => (if (i > 5) 1 else 0, i / 10.0))
      .toDF("label", "score")
    val roc = MlEval.rocCurve(perfect, $"label", $"score",
      thresholds = Seq(0.3, 0.6, 0.8))
    val rows = roc.orderBy($"threshold").collect()
    // t=0.3: predicts positive for score>=0.3 → tp=5 fp=3 tn=2 fn=0
    assert(rows(0).getAs[Long]("tp") == 5 && rows(0).getAs[Long]("fp") == 3)
    assert(rows(0).getAs[Long]("tn") == 2 && rows(0).getAs[Long]("fn") == 0)
    // t=0.6: tp=5 fp=0
    assert(rows(1).getAs[Long]("tp") == 5 && rows(1).getAs[Long]("fp") == 0)
    assert(approx(rows(1).getAs[Double]("tpr"), 1.0) &&
      approx(rows(1).getAs[Double]("fpr"), 0.0))
    // t=0.8: tp=3 fn=2
    assert(rows(2).getAs[Long]("tp") == 3 && rows(2).getAs[Long]("fn") == 2)
    assert(approx(MlEval.rocAuc(roc), 1.0))

    // an uninformative score (label independent of score) → AUC 0.5 with
    // dense thresholds
    val flat = (0 until 100).map(i => (i % 2, (i / 2) / 50.0)).toDF("label", "score")
    val rocFlat = MlEval.rocCurve(flat, $"label", $"score",
      thresholds = (0 to 50).map(_ / 50.0))
    assert(approx(MlEval.rocAuc(rocFlat), 0.5, 1e-6))
  }

  test("prCurve precision/recall/AP on the hand fixture") {
    // same perfect-separation fixture: at t=0.6 precision=1 recall=1;
    // at t=0.3 precision=5/8 recall=1; at t=0.8 precision=1 recall=3/5
    val perfect = (1 to 10).map(i => (if (i > 5) 1 else 0, i / 10.0))
      .toDF("label", "score")
    val pr = MlEval.prCurve(perfect, $"label", $"score",
      thresholds = Seq(0.3, 0.6, 0.8))
    val rows = pr.orderBy($"threshold").collect()
    assert(approx(rows(0).getAs[Double]("precision"), 5.0 / 8))
    assert(approx(rows(0).getAs[Double]("recall"), 1.0))
    assert(approx(rows(1).getAs[Double]("precision"), 1.0) &&
      approx(rows(1).getAs[Double]("recall"), 1.0))
    assert(approx(rows(2).getAs[Double]("recall"), 0.6))
    // AP over descending thresholds: R steps 0.6 (P=1), 1.0 (P=1), then
    // 1.0 again (P=5/8, zero step) -> AP = 0.6*1 + 0.4*1 + 0 = 1.0
    assert(approx(rows(0).getAs[Double]("ap"), 1.0), rows(0).toString)
    // f1 closes over p and r
    assert(approx(rows(0).getAs[Double]("f1"),
      2 * (5.0 / 8) * 1.0 / (5.0 / 8 + 1.0)))
    // degraded score: AP must drop below 1
    val noisy = (1 to 100).map(i => ((i % 2), ((i * 7) % 100) / 100.0))
      .toDF("label", "score")
    val ap = MlEval.prCurve(noisy, $"label", $"score",
      thresholds = (1 to 9).map(_ / 10.0)).head().getAs[Double]("ap")
    assert(ap < 0.8 && ap > 0.2, s"uninformative AP $ap")
  }

  test("rocCurve default thresholds come from score quantiles") {
    val df = (1 to 1000).map(i => (if (i > 500) 1 else 0, i / 1000.0))
      .toDF("label", "score")
    val roc = MlEval.rocCurve(df, $"label", $"score", nThresholds = 100)
    assert(roc.count() >= 50)
    assert(MlEval.rocAuc(roc) > 0.95) // near-perfect separation
  }

  test("rocCurve on empty input returns an empty curve, not an error") {
    val empty = Seq.empty[(Int, Double)].toDF("label", "score")
    assert(MlEval.rocCurve(empty, $"label", $"score").count() == 0)
  }

  test("calibration: per-bin gaps and weighted ECE on a hand fixture") {
    // bin 2 (score .25): labels 0,1 -> gap |.25-.5| = .25 over 2 rows
    // bin 7 (score .75): labels 1,1 -> gap .25 over 2 rows; ECE = .25
    val d = Seq((0.25, 0), (0.25, 1), (0.75, 1), (0.75, 1),
      (1.5, 1) /* out of range, dropped */).toDF("s", "y")
    val rows = MlEval.calibration(d, $"y", $"s", nBins = 10).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(2, 7))
    val b2 = rows(0)
    assert(b2.getLong(1) == 2 && approx(b2.getDouble(3), 0.5)
      && approx(b2.getDouble(4), 0.25))
    assert(rows.forall(r => approx(r.getDouble(5), 0.25))) // ece
    // score exactly 1.0 lands in the last bin, not bin nBins
    val edge = MlEval.calibration(Seq((1.0, 1)).toDF("s", "y"), $"y", $"s").head()
    assert(edge.getInt(0) == 9)
  }

  test("weightedMeanEss: equal weights give ess = n, skew shrinks it") {
    val d = Seq((1.0, 1.0), (3.0, 1.0), (5.0, 1.0)).toDF("x", "w")
    val r = graft.ops.Robust.weightedMeanEss(d, $"x", $"w").head()
    assert(r.getLong(0) == 3 && approx(r.getDouble(2), 3.0)
      && approx(r.getDouble(3), 3.0) && approx(r.getDouble(4), 1.0))
    // one dominant weight: ess -> ~1, mean -> dominant x; w<=0/null dropped
    val skew = Seq((10.0, 100.0), (0.0, 0.01), (7.0, 0.0), (9.0, -1.0))
      .toDF("x", "w")
    val s = graft.ops.Robust.weightedMeanEss(skew, $"x", $"w").head()
    assert(s.getLong(0) == 2 && s.getDouble(3) < 1.01)
    assert(approx(s.getDouble(2), (10.0 * 100 + 0.0 * 0.01) / 100.01))
  }

  test("corrMatrix matches closed-form pairwise correlations") {
    val df = (1 to 100).map { i =>
      val x = i.toDouble
      (x, 2.0 * x + 1.0, if (i % 2 == 0) 1.0 else -1.0)
    }.toDF("x", "y2", "alt")
    val m = MlEval.corrMatrix(df, Seq("x" -> $"x", "y2" -> $"y2", "alt" -> $"alt"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m.size == 9)
    assert(approx(m(("x", "x")), 1.0))
    assert(approx(m(("x", "y2")), 1.0))     // exact linear
    assert(approx(m(("y2", "x")), 1.0))
    // alt alternates ±1 against an increasing ramp: tiny correlation
    assert(math.abs(m(("x", "alt"))) < 0.02)
    // symmetry
    assert(approx(m(("x", "alt")), m(("alt", "x"))))
  }
}
