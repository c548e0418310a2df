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
