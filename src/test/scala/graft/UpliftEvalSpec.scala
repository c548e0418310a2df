package graft

import graft.ops.UpliftEval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UpliftEvalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  // 4 buckets × (10 treated @ y=b+2, 20 control @ y=1): every per-bucket and
  // cumulative statistic is a closed form. id is unique per row.
  private lazy val df = (for {
    b <- 0 to 3
    (t, n, y) <- Seq((1, 10, b + 2.0), (0, 20, 1.0))
    i <- 1 to n
  } yield (b.toLong * 1000 + t * 100 + i, b, t, y, b.toDouble))
    .toDF("id", "bucket", "t", "y", "score").repartition(4)

  test("estimateAte point estimate is the closed-form difference in rates") {
    val r = UpliftEval.estimateAte(df, $"y", $"t").head()
    // treated mean = (2+3+4+5)/4 = 3.5, control mean = 1
    assert(approx(r.getAs[Double]("target_rate_treated"), 3.5))
    assert(approx(r.getAs[Double]("target_rate_control"), 1.0))
    assert(approx(r.getAs[Double]("ate"), 2.5))
    assert(approx(r.getAs[Double]("count"), 120.0))
  }

  test("estimateRoi / estimateIroi closed forms") {
    val roi = UpliftEval.estimateRoi(df, benefit = $"y" * 2, cost = $"y").head()
    assert(approx(roi.getAs[Double]("roi"), 2.0))
    // benefit=y, cost=1: scale = 40/80; inc benefit = 140 - 80*(1/2) = 100,
    // inc cost = 40 - 80*(1/2) = 0 → skip iroi div, check parts
    val ir = UpliftEval.estimateIroi(df, benefit = $"y", cost = lit(1.0), treatment = $"t").head()
    assert(approx(ir.getAs[Double]("incremental_benefit"), 100.0))
    assert(approx(ir.getAs[Double]("incremental_cost"), 0.0, 1e-12))
  }

  test("catePerBucket and targetRatePerBucket closed forms") {
    val cate = UpliftEval.catePerBucket(df, $"y", $"t", "bucket")
      .orderBy($"bucket").collect()
    assert(cate.length == 4)
    cate.zipWithIndex.foreach { case (r, b) =>
      assert(approx(r.getAs[Double]("ate"), b + 1.0))
      assert(approx(r.getAs[Double]("fraction"), 0.25))
    }
    val tr = UpliftEval.targetRatePerBucket(df, $"y", "bucket")
      .orderBy($"bucket").collect()
    // per-bucket mean = (10(b+2) + 20)/30
    tr.zipWithIndex.foreach { case (r, b) =>
      assert(approx(r.getAs[Double]("target_rate"), (10.0 * (b + 2) + 20) / 30))
    }
  }

  test("qini curve: cumulative ate × fraction from the top bucket, with origin") {
    val qini = UpliftEval.estimateQini(df, $"score", $"y", $"t", nBuckets = 0)
    val rows = qini.collect()
    assert(rows.length == 5)
    // origin first
    assert(rows.head.isNullAt(rows.head.fieldIndex("bucket")))
    assert(approx(rows.head.getAs[Double]("fraction"), 0.0))
    assert(approx(rows.head.getAs[Double]("ate"), 0.0))
    val expected = Map(3 -> 1.0, 2 -> 1.75, 1 -> 2.25, 0 -> 2.5)
    rows.tail.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(approx(r.getAs[Double]("ate"), expected(b)), s"bucket $b")
    }
    assert(approx(UpliftEval.auuc(qini), 1.5625))
    assert(approx(UpliftEval.qiniCoefficient(qini), 0.3125))
  }

  test("assignBuckets exact splits reproduce the discrete score buckets") {
    val b = UpliftEval.assignBuckets(df, $"score", 4, exact = true)
    // interpolated splits land strictly between the discrete score levels,
    // so the quantile bucket equals the score itself
    assert(b.filter(col("bucket") =!= col("score").cast("int")).count() == 0)
    // thresholds: -inf for bucket 0, then monotone increasing
    val thr = b.groupBy("bucket").agg(first("threshold").as("thr"))
      .orderBy("bucket").collect().map(_.getAs[Double]("thr"))
    assert(thr.head.isNegInfinity)
    assert(thr.sliding(2).forall(p => p(0) < p(1)))
  }

  test("bootstrap CI is partition-layout invariant and brackets the estimate") {
    def run(parts: Int) = UpliftEval.estimateAte(
      df.repartition(parts), $"y", $"t", bootstrapB = 40,
      idCols = Seq($"id")).head()
    val a = run(3); val b = run(7)
    for (c <- Seq("ate", "ate_lower", "ate_upper", "ate_std_error"))
      assert(approx(a.getAs[Double](c), b.getAs[Double](c)),
        s"$c differs across layouts: ${a.getAs[Double](c)} vs ${b.getAs[Double](c)}")
    assert(a.getAs[Double]("ate_lower") <= a.getAs[Double]("ate"))
    assert(a.getAs[Double]("ate_upper") >= a.getAs[Double]("ate"))
    assert(a.getAs[Double]("ate_std_error") > 0)
  }

  test("cumIroiCurve cumulates incremental benefit and cost from the top") {
    // benefit = y, cost = 1 for treated / 1 for control. Per closed form:
    // cum from bucket 3 (see qini fixture): sf = cum_tc/cum_cc = 0.5 always;
    // inc_cost = cum_tc - cum_cc*0.5 = 0 → iroi null; inc_benefit at
    // bucket 3 = 50 - 20*0.5 = 40
    val curve = UpliftEval.cumIroiCurve(df, $"score", benefit = $"y",
      cost = lit(1.0), treatment = $"t", nBuckets = 0)
      .collect().map(r => r.getAs[Int]("bucket") -> r).toMap
    assert(curve.size == 4)
    assert(approx(curve(3).getAs[Double]("incremental_benefit"), 40.0))
    assert(approx(curve(3).getAs[Double]("incremental_cost"), 0.0, 1e-12))
    // bucket 0 (whole population): 140 - 80*0.5 = 100
    assert(approx(curve(0).getAs[Double]("incremental_benefit"), 100.0))
    assert(approx(curve(0).getAs[Double]("fraction"), 1.0))
  }

  test("per-quantile wrappers compose bucketing with the per-bucket scans") {
    val cq = UpliftEval.catePerQuantile(df, $"y", $"t", $"score",
      nBuckets = 4, exactSplits = true).orderBy($"bucket").collect()
    assert(cq.length == 4)
    // quantile buckets of the discrete score recover the planted buckets
    cq.zipWithIndex.foreach { case (r, b) =>
      assert(approx(r.getAs[Double]("ate"), b + 1.0)) }
    val tq = UpliftEval.targetRatePerQuantile(df, $"y", $"score",
      nBuckets = 4, exactSplits = true).orderBy($"bucket").collect()
    tq.zipWithIndex.foreach { case (r, b) =>
      assert(approx(r.getAs[Double]("target_rate"), (10.0 * (b + 2) + 20) / 30)) }
  }

  test("row-scale bucket columns trip the maxCells guard with a named error") {
    val prev = UpliftEval.maxCells
    UpliftEval.maxCells = 2
    try {
      val e = intercept[IllegalArgumentException] {
        UpliftEval.catePerBucket(df, $"y", $"t", "bucket")
      }
      assert(e.getMessage.contains("maxCells"))
      assert(e.getMessage.contains("assignBuckets"))
    } finally UpliftEval.maxCells = prev
  }

  test("cateLift is the cumulative ate without the fraction rescale") {
    val lift = UpliftEval.cateLift(df, $"score", $"y", $"t", nBuckets = 0)
      .collect()
    assert(lift.length == 4)
    // cum ate from the top: bucket 3 → 4, then 3.5, 3, 2.5
    val expected = Map(3 -> 4.0, 2 -> 3.5, 1 -> 3.0, 0 -> 2.5)
    lift.foreach { r =>
      assert(approx(r.getAs[Double]("cum_cate"), expected(r.getAs[Int]("bucket"))))
    }
    assert(!lift.head.schema.fieldNames.contains("ate"))
  }

  test("bootstrapped qini keeps the point curve and adds per-bucket bands") {
    val qini = UpliftEval.estimateQini(df, $"score", $"y", $"t", nBuckets = 0,
      bootstrapB = 30, idCols = Seq($"id"))
    val rows = qini.filter(col("bucket").isNotNull).collect()
    assert(rows.length == 4)
    val expected = Map(3 -> 1.0, 2 -> 1.75, 1 -> 2.25, 0 -> 2.5)
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(approx(r.getAs[Double]("ate"), expected(b)))
      assert(r.getAs[Double]("ate_lower") <= r.getAs[Double]("ate") + 1e-12)
      assert(r.getAs[Double]("ate_upper") >= r.getAs[Double]("ate") - 1e-12)
    }
  }

  test("blpTest: calibrated score loads at ~1, noise score at ~0") {
    val rng = new scala.util.Random(31)
    val rows = (1 to 8000).map { i =>
      val t = i % 2
      val trueCate = if (i % 4 < 2) 3.0 else 1.0 // heterogeneous effect
      val y = 5.0 + t * trueCate + rng.nextGaussian()
      (t, y, trueCate, rng.nextGaussian())
    }
    val d = spark.createDataFrame(rows).toDF("t", "y", "cate_hat", "noise")
    val cal = graft.ops.Uplift.blpTest(d, $"cate_hat", $"y", $"t").head()
    assert(math.abs(cal.getAs[Double]("ate_coef") - 2.0) < 0.1)
    assert(math.abs(cal.getAs[Double]("het_coef") - 1.0) < 0.15,
      s"calibrated loading ${cal.getAs[Double]("het_coef")}")
    assert(cal.getAs[Double]("het_p") < 1e-6)
    val noi = graft.ops.Uplift.blpTest(d, $"noise", $"y", $"t").head()
    assert(math.abs(noi.getAs[Double]("het_coef")) < 0.2,
      s"noise loading ${noi.getAs[Double]("het_coef")}")
    assert(noi.getAs[Double]("het_p") > 0.01)
    // degenerate treatment fails fast
    intercept[IllegalArgumentException] {
      graft.ops.Uplift.blpTest(d.filter($"t" === 1), $"cate_hat", $"y", $"t")
    }
  }
}
