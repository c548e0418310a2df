package graft

import graft.api.implicits._
import graft.ops._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  private lazy val uplift: Seq[(Double, Double, Int)] = {
    val rng = new scala.util.Random(53)
    (1 to 5000).map { _ =>
      val ite = rng.nextDouble()             // "predicted" effect
      val t = rng.nextInt(2)
      // real effect correlated with ite → top buckets should show lift
      val y = (if (t == 1) ite * 2.0 else 0.0) + rng.nextGaussian() * 0.5
      (ite, y, t)
    }
  }
  private lazy val upliftDf = spark.createDataFrame(uplift).toDF("ite", "y", "t").repartition(4)

  test("liftGain: monotone ratio, correct ATE, top-bucket lift > ate") {
    val curve = Uplift.liftGain(upliftDf, $"ite", $"y", $"t", k = 10).collect()
    assert(curve.length == 10)
    val ratios = curve.map(_.getAs[Double]("ratio"))
    assert(ratios.zip(ratios.tail).forall { case (a, b) => a < b })
    assert(approx(ratios.last, 1.0))
    // ATE from curve == closed form
    val full = uplift
    val ate = full.filter(_._3 == 1).map(_._2).sum / full.count(_._3 == 1) -
      full.filter(_._3 == 0).map(_._2).sum / full.count(_._3 == 0)
    assert(approx(curve.head.getAs[Double]("ate"), ate, 1e-9))
    // top 10% bucket lift should exceed overall ate (ite is informative)
    assert(curve.head.getAs[Double]("lift") > ate)
    // last point of lift == ate
    assert(approx(curve.last.getAs[Double]("lift"), ate, 1e-9))
    val a = Uplift.auuc(upliftDf, $"ite", $"y", $"t", k = 10)
    val randomArea = ate / 2.0
    assert(a > randomArea, s"auuc $a should beat random $randomArea")
  }

  test("cutBins labels and ordinals") {
    val d = Seq(5.0, 15.0, 25.0, 35.0, 45.0).toDF("x")
    val lab = d.select(Features.cutBins($"x", Seq(10, 20, 30, 40)).as("b")).collect().map(_.getString(0))
    assert(lab.toSeq == Seq("(-inf,10)", "[10,20)", "[20,30)", "[30,40)", "[40,inf)"))
    val ord = d.select(Features.cutBins($"x", Seq(10, 20, 30, 40), ifString = false).as("b"))
      .collect().map(_.getInt(0))
    assert(ord.toSeq == Seq(0, 1, 2, 3, 4))
  }

  test("cutBinsQuantile produces requested bins") {
    val d = (1 to 1000).map(_.toDouble).toDF("x")
    val (binned, splits) = Features.cutBinsQuantile(d, "x", 4)
    assert(splits.length == 3)
    val counts = binned.groupBy($"x_bin").count().collect().map(_.getLong(1))
    assert(counts.length == 4 && counts.forall(c => c > 200 && c < 300))
  }

  test("oneHot expands categories") {
    val d = Seq("a", "b", "a", "c").toDF("cat")
    val oh = Features.oneHot(d, Seq("cat"))
    assert(oh.columns.toSet == Set("cat", "cat_a", "cat_b", "cat_c"))
    assert(oh.agg(sum($"cat_a")).head().getLong(0) == 2L)
  }

  test("caliper matching: 1:1 within caliper buckets, balanced indexes") {
    val rng = new scala.util.Random(71)
    val rows = (1 to 2000).map { _ =>
      val t = rng.nextInt(2)
      val score = if (t == 1) 0.4 + rng.nextDouble() * 0.4 else rng.nextDouble() * 0.6
      (t, score)
    }
    val d = spark.createDataFrame(rows).toDF("t", "score")
    val matched = Matching.caliperMatching(d, $"t", $"score", caliper = 0.1)
    matched.cache()
    val m = matched.filter($"matching_index" > 0)
    // every index appears exactly once per treatment arm
    val byIdx = m.groupBy($"matching_index")
      .agg(sum(when($"t" === 1, 1).otherwise(0)).as("n1"),
        sum(when($"t" === 0, 1).otherwise(0)).as("n0")).collect()
    assert(byIdx.nonEmpty)
    assert(byIdx.forall(r => r.getLong(1) == 1 && r.getLong(2) == 1))
    // matched pairs share a score bucket
    val pairBuckets = m.withColumn("b", floor($"score" / 0.1))
      .groupBy($"matching_index").agg(countDistinct($"b").as("nb")).collect()
    assert(pairBuckets.forall(_.getLong(1) == 1L))
    matched.unpersist()
  }

  test("prognostic matching: trains on held-out control, matches on predicted outcome") {
    val rng = new scala.util.Random(97)
    val rows = (1 to 4000).map { i =>
      val t = rng.nextInt(2)
      // covariates imbalanced by arm (with overlap) so matching has work to do
      val x1 = rng.nextDouble() * 4 + (if (t == 1) 1.0 else 0.0)
      val x2 = rng.nextDouble() * 2
      // baseline outcome depends only on covariates (+noise)
      val y = 2.0 * x1 - x2 + rng.nextGaussian() * 0.1 + (if (t == 1) 0.5 else 0.0)
      (i.toLong, t, x1, x2, y)
    }
    val d = spark.createDataFrame(rows).toDF("id", "t", "x1", "x2", "y")
    val matched = Matching.prognosticMatching(d, $"t", $"y", Seq($"x1", $"x2"),
      caliper = 0.5, idCols = Seq($"id"))
    matched.cache()
    // training half of the control arm is excluded from the matchable output
    val nOut = matched.count()
    val nTreat = rows.count(_._2 == 1)
    val nControl = rows.count(_._2 == 0)
    assert(nOut > nTreat && nOut < nTreat + nControl)
    // the score is the OLS prediction from the SAME deterministic split —
    // refit locally and spot-check agreement
    import graft.api.implicits._
    val control = d.filter($"t" === 0)
    val (train, _) = control.trainTestSplitDeterministic(0.5, 42L, Seq($"id"))
    val model = Regression.fitOls(train, $"y", Seq($"x1", $"x2"))
    val check = matched.withColumn("expected",
        Regression.predict(model, Seq($"x1", $"x2")))
      .filter(abs($"prog_score" - $"expected") > 1e-9).count()
    assert(check == 0L)
    // matched pairs balance arms and share a caliper bucket of the score
    val m = matched.filter($"matching_index" > 0)
    val byIdx = m.groupBy($"matching_index")
      .agg(sum(when($"t" === 1, 1).otherwise(0)).as("n1"),
        sum(when($"t" === 0, 1).otherwise(0)).as("n0")).collect()
    assert(byIdx.nonEmpty)
    assert(byIdx.forall(r => r.getLong(1) == 1 && r.getLong(2) == 1))
    // matching on the prognostic score balances the covariates: SMD of the
    // matched set is far smaller than the raw set's on x1
    val rawSmd = Matching.smd(d, $"t", Seq("x1")).head().getAs[Double]("smd")
    val matchedSmd = Matching.smd(m, $"t", Seq("x1")).head().getAs[Double]("smd")
    assert(math.abs(matchedSmd) < math.abs(rawSmd))
    // layout-deterministic: same output under a different partitioning
    val again = Matching.prognosticMatching(d.repartition(13), $"t", $"y",
      Seq($"x1", $"x2"), caliper = 0.5, idCols = Seq($"id"))
    val a = matched.select($"id", $"matching_index").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = again.select($"id", $"matching_index").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
    matched.unpersist()
  }

  test("caliper matching: cell-cardinality guard trips on a micro-caliper") {
    // a micro-caliper on a continuous score makes cells ~ rows — the
    // driver prefix sum must refuse before collecting a row-scale table
    val d = spark.range(500).select(
      ($"id" % 2).cast("int").as("t"),
      floor($"id" / 2).mod(100).cast("double").as("score"))
    val e = intercept[IllegalArgumentException] {
      graft.ops.Matching.caliperMatching(d, $"t", $"score",
        caliper = 1e-9, maxCells = 50)
    }
    assert(e.getMessage.contains("increase the caliper"), e.getMessage)
  }

  test("exact matching matches on covariate tuples") {
    val rows = Seq((1, "x"), (1, "x"), (0, "x"), (0, "y"), (1, "y"), (0, "z"))
    val d = spark.createDataFrame(rows).toDF("t", "g")
    val m = Matching.exactMatching(d, $"t", Seq($"g"))
    val matched = m.filter($"matching_index" > 0).select($"g", $"t").collect()
    // "x": 1 pair (2 treated vs 1 control → 1 pair); "y": 1 pair; "z": none
    assert(matched.count(_.getString(0) == "x") == 2)
    assert(matched.count(_.getString(0) == "y") == 2)
    assert(!matched.exists(_.getString(0) == "z"))
  }

  test("smd standardizes group differences") {
    val rng = new scala.util.Random(3)
    val rows = (1 to 4000).map { _ =>
      val t = rng.nextInt(2)
      (t, rng.nextGaussian() + t * 0.5, rng.nextGaussian() * 2.0)
    }
    val d = spark.createDataFrame(rows).toDF("t", "shifted", "balanced")
    val out = Matching.smd(d, $"t", Seq("shifted", "balanced")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("shifted") - 0.5) < 0.1)
    assert(math.abs(out("balanced")) < 0.1)
  }

  test("student/welch/z tests match commons-math conventions") {
    val rng = new scala.util.Random(13)
    val rows = (1 to 3000).map { _ =>
      val t = rng.nextInt(2)
      (t, rng.nextGaussian() * (1 + t) + 0.1 * t)
    }
    val d = spark.createDataFrame(rows).toDF("t", "v")
    val x0 = rows.filter(_._1 == 0).map(_._2).toArray
    val x1 = rows.filter(_._1 == 1).map(_._2).toArray
    val tt = new org.apache.commons.math3.stat.inference.TTest()
    val st = SimpleTests.studentTtest(d, $"v", $"t")
    assert(approx(math.abs(st.statistic), math.abs(tt.homoscedasticT(x1, x0)), 1e-9))
    assert(approx(st.p_value, tt.homoscedasticTTest(x1, x0), 1e-9))
    val wt = SimpleTests.welchTtest(d, $"v", $"t")
    assert(approx(math.abs(wt.statistic), math.abs(tt.t(x1, x0)), 1e-9))
    assert(approx(wt.p_value, tt.tTest(x1, x0), 1e-9))
    val zt = SimpleTests.meanZTest(d, $"v", $"t", 1.0, 4.0)
    assert(zt.p_value >= 0 && zt.p_value <= 1)
  }

  test("anovaF matches commons-math OneWayAnova; k=2 equals t-squared") {
    val rng = new scala.util.Random(19)
    val rows = (1 to 3000).map { i =>
      val a = i % 3
      (a, 0.2 * a + rng.nextGaussian())
    }
    val d = spark.createDataFrame(rows).toDF("arm", "v")
    val r = SimpleTests.anovaF(d, $"v", $"arm").head()
    assert(r.getAs[Long]("k") == 3 && r.getAs[Long]("n") == 3000)
    val cm = new org.apache.commons.math3.stat.inference.OneWayAnova()
    val groups = new java.util.ArrayList[Array[Double]]()
    (0 until 3).foreach(a =>
      groups.add(rows.filter(_._1 == a).map(_._2).toArray))
    assert(approx(r.getAs[Double]("f_statistic"), cm.anovaFValue(groups), 1e-9))
    assert(approx(r.getAs[Double]("p_value"), cm.anovaPValue(groups), 1e-9))
    // k = 2: F is exactly the pooled t statistic squared
    val d2 = d.filter($"arm" < 2)
    val f2 = SimpleTests.anovaF(d2, $"v", $"arm").head().getAs[Double]("f_statistic")
    val t2 = SimpleTests.studentTtest(d2, $"v", $"arm").statistic
    assert(approx(f2, t2 * t2, 1e-9), s"$f2 vs ${t2 * t2}")
    // guards: one arm and arm-cardinality overflow fail fast
    intercept[IllegalArgumentException] {
      SimpleTests.anovaF(d.filter($"arm" === 0), $"v", $"arm")
    }
    intercept[IllegalArgumentException] {
      SimpleTests.anovaF(d, $"v", $"v", maxArms = 10)
    }
  }

  test("bhAdjust matches R p.adjust semantics, passes nulls through") {
    val d = Seq[(Long, java.lang.Double)]((1L, 0.01), (2L, 0.02), (3L, 0.03),
      (4L, 0.04), (5L, 0.5), (6L, null)).toDF("id", "p")
    val adj = graft.ops.MultipleTesting.bhAdjust(d.repartition(3), $"p")
      .collect().map(r => r.getLong(0) ->
        Option(r.getAs[java.lang.Double]("p_adjusted")).map(_.doubleValue))
      .toMap
    // R: p.adjust(c(.01,.02,.03,.04,.5), "BH") = .05 .05 .05 .05 .5
    Seq(1L, 2L, 3L, 4L).foreach(i =>
      assert(math.abs(adj(i).get - 0.05) < 1e-12, s"id $i -> ${adj(i)}"))
    assert(math.abs(adj(5L).get - 0.5) < 1e-12)
    assert(adj(6L).isEmpty) // untested row passes through unadjusted
    // adjusted values are monotone in p and never exceed 1
    val many = (1 to 500).map(i => (i.toLong, (i % 97 + 1) / 100.0)).toDF("id", "p")
    val a2 = graft.ops.MultipleTesting.bhAdjust(many.repartition(7), $"p")
      .select($"p", $"p_adjusted").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).sortBy(_._1)
    a2.sliding(2).foreach(w => assert(w(1)._2 >= w(0)._2 - 1e-12))
    assert(a2.forall(_._2 <= 1.0))
    intercept[IllegalArgumentException] {
      graft.ops.MultipleTesting.bhAdjust(Seq((1L, 1.5)).toDF("id", "p"), $"p")
        .count()
    }
  }

  test("adjust: holm and by match R p.adjust references") {
    val d = Seq((1L, 0.005), (2L, 0.01), (3L, 0.03), (4L, 0.04))
      .toDF("id", "p")
    // R: p.adjust(c(.005,.01,.03,.04), "holm") = .02 .03 .06 .06
    val holm = graft.ops.MultipleTesting.adjust(d.repartition(3), $"p", "holm")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("p_adjusted")).toMap
    assert(math.abs(holm(1L) - 0.02) < 1e-12, holm.toString)
    assert(math.abs(holm(2L) - 0.03) < 1e-12)
    assert(math.abs(holm(3L) - 0.06) < 1e-12)
    assert(math.abs(holm(4L) - 0.06) < 1e-12)
    // R: p.adjust(..., "BY") = BH scaled by c(4) = 1+1/2+1/3+1/4
    val c4 = 1.0 + 0.5 + 1.0 / 3 + 0.25
    val by = graft.ops.MultipleTesting.adjust(d.repartition(2), $"p", "by")
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("p_adjusted")).toMap
    assert(math.abs(by(1L) - 0.005 * 4 * c4) < 1e-12, by.toString)
    assert(math.abs(by(2L) - 0.005 * 4 * c4) < 1e-12) // suffix min pulls down
    assert(math.abs(by(3L) - 0.04 * c4) < 1e-12)
    assert(math.abs(by(4L) - 0.04 * c4) < 1e-12)
    // holm step-down is monotone nondecreasing in p and capped at 1
    val many = (1 to 300).map(i => (i.toLong, (i % 89 + 1) / 90.0)).toDF("id", "p")
    val a2 = graft.ops.MultipleTesting.adjust(many.repartition(5), $"p", "holm")
      .select($"p", $"p_adjusted").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).sortBy(_._1)
    a2.sliding(2).foreach(w => assert(w(1)._2 >= w(0)._2 - 1e-12))
    assert(a2.forall(_._2 <= 1.0))
    intercept[IllegalArgumentException] {
      graft.ops.MultipleTesting.adjust(d, $"p", "bonferroni") }
    // gateway: method argument reaches the op
    d.createOrReplaceTempView("padj_t")
    val viaSql = GraftGateway.sql(spark,
      "SELECT fdr_bh(p, 'holm') FROM padj_t").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("p_adjusted")).toMap
    assert(math.abs(viaSql(3L) - 0.06) < 1e-12)
  }

  test("bhAdjust domain validation rides the cell pass — no job of its own") {
    // the [0,1] require used to be its own distributed filter job; it now
    // reads per-partition p min/max off the SAME groupBy(__pid) cell
    // aggregation. Count jobs via a job group (public statusTracker API —
    // its store is listener-fed, so poll until the count stabilizes).
    val sc = spark.sparkContext
    val d = (1 to 300).map(i => (i.toLong, (i % 89 + 1) / 100.0)).toDF("id", "p")
    def jobsFor(group: String)(work: => Unit): Int = {
      sc.setJobGroup(group, group)
      try work finally sc.clearJobGroup()
      var last = -1; var cur = sc.statusTracker.getJobIdsForGroup(group).length
      var spins = 0
      while (cur != last && spins < 50) {
        last = cur; Thread.sleep(100)
        cur = sc.statusTracker.getJobIdsForGroup(group).length
        spins += 1
      }
      cur
    }
    val n = jobsFor("bh_probe") {
      graft.ops.MultipleTesting.bhAdjust(d.repartition(4), $"p").collect()
      ()
    }
    // measured floor on Spark 4.1 with AQE: 12 jobs end-to-end (range
    // sampling, persisted-rank materialization, THE cell aggregation
    // carrying the validation, checkpoint, final collect — several split
    // by AQE). The pre-fuse implementation spent one more on its
    // standalone [0,1] filter; a regression that splits validation back
    // out pushes past this pin.
    assert(n <= 12, s"bhAdjust spent $n jobs — validation split out again?")
  }

  test("eValue: VanderWeele-Ding closed forms, null-crossing CI pin") {
    // 30/100 vs 15/100: RR = 2, E = 2 + sqrt(2) — the textbook example
    val rows = (1 to 100).map(i => (if (i <= 30) 1 else 0, 1)) ++
      (1 to 100).map(i => (if (i <= 15) 1 else 0, 0))
    val r = graft.ops.SimpleTests.eValue(rows.toDF("y", "t"), $"y", $"t")
      .head()
    assert(r.getAs[Long]("n1") == 100 && r.getAs[Long]("n0") == 100)
    assert(math.abs(r.getAs[Double]("rr") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("e_value") - (2.0 + math.sqrt(2.0))) < 1e-12)
    // protective direction inverts before the map: RR 0.5 -> same E
    val inv = graft.ops.SimpleTests.eValue(
      rows.map { case (y, t) => (y, 1 - t) }.toDF("y", "t"), $"y", $"t").head()
    assert(math.abs(inv.getAs[Double]("rr") - 0.5) < 1e-12)
    assert(math.abs(inv.getAs[Double]("e_value") -
      (2.0 + math.sqrt(2.0))) < 1e-12)
    // a CI that crosses the null pins e_value_ci at exactly 1
    val weak = (1 to 60).map(i => (if (i <= 12) 1 else 0, 1)) ++
      (1 to 60).map(i => (if (i <= 10) 1 else 0, 0))
    val w = graft.ops.SimpleTests.eValue(weak.toDF("y", "t"), $"y", $"t").head()
    assert(w.getAs[Double]("rr_lower") < 1.0 && w.getAs[Double]("rr_upper") > 1.0)
    assert(w.getAs[Double]("e_value_ci") == 1.0)
    intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.eValue(
        Seq((0, 1), (0, 0)).toDF("y", "t"), $"y", $"t")
    }
  }

  test("ratioMde replays the delta-method closed forms") {
    val rows = Seq((10.0, 100.0), (12.0, 90.0), (8.0, 110.0), (15.0, 120.0),
      (9.0, 95.0), (11.0, 105.0))
    val out = graft.ops.SimpleTests.ratioMde(rows.toDF("x", "y"),
      $"x", $"y", targetRelLift = 0.02).head()
    val n = rows.length
    val (sx, sy) = (rows.map(_._1).sum, rows.map(_._2).sum)
    val ratio = sx / sy
    val dbar = sy / n
    val varD = (rows.map(r => r._1 * r._1).sum -
      2.0 * ratio * rows.map(r => r._1 * r._2).sum +
      ratio * ratio * rows.map(r => r._2 * r._2).sum -
      n * (sx / n - ratio * dbar) * (sx / n - ratio * dbar)) / (n - 1)
    val sdD = math.sqrt(varD)
    val z = graft.stats.Dist.normQuantile(0.975) +
      graft.stats.Dist.normQuantile(0.8)
    val mdeAbs = z * (sdD / dbar) * math.sqrt(2.0 / n)
    assert(out.getAs[Long]("n") == n)
    assert(math.abs(out.getAs[Double]("ratio") - ratio) < 1e-12)
    assert(math.abs(out.getAs[Double]("sd_delta") - sdD) < 1e-9)
    assert(math.abs(out.getAs[Double]("mde_abs") - mdeAbs) < 1e-9)
    assert(math.abs(out.getAs[Double]("mde_rel") - mdeAbs / ratio) < 1e-9)
    assert(math.abs(out.getAs[Double]("n_per_arm_target") -
      2.0 * math.pow(z * (sdD / dbar) / (0.02 * ratio), 2)) < 1e-6)
    // null rows drop listwise; degenerate inputs fail fast
    val withNulls = (rows.map { case (a, b) =>
      (java.lang.Double.valueOf(a), java.lang.Double.valueOf(b))
    } :+ ((null: java.lang.Double), java.lang.Double.valueOf(5.0)))
      .toDF("x", "y")
    assert(graft.ops.SimpleTests.ratioMde(withNulls, $"x", $"y")
      .head().getAs[Long]("n") == n)
    intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.ratioMde(rows.toDF("x", "y"), $"x", $"y",
        targetRelLift = 0.0)
    }
    // gateway verb
    rows.toDF("x", "y").createOrReplaceTempView("ratio_t")
    assert(GraftGateway.sql(spark,
      "SELECT ratio_mde(x, y, 0.02) FROM ratio_t").count() == 1)
  }

  test("chisqIndependence matches commons-math ChiSquareTest") {
    val rng = new scala.util.Random(23)
    val rows = (1 to 5000).map { _ =>
      val a = rng.nextInt(3)
      // b depends on a -> dependence must be detected
      val b = if (rng.nextDouble() < 0.3) a % 2 else rng.nextInt(2)
      (s"a$a", s"b$b")
    }
    val d = spark.createDataFrame(rows).toDF("x", "y")
    val r = SimpleTests.chisqIndependence(d, $"x", $"y").head()
    val counts = Array.ofDim[Long](3, 2)
    rows.foreach { case (a, b) =>
      counts(a.drop(1).toInt)(b.drop(1).toInt) += 1 }
    val cm = new org.apache.commons.math3.stat.inference.ChiSquareTest()
    assert(approx(r.getAs[Double]("chisq"), cm.chiSquare(counts), 1e-9))
    assert(approx(r.getAs[Double]("p_value"), cm.chiSquareTest(counts), 1e-9))
    assert(r.getAs[Long]("dof") == 2)
    assert(approx(r.getAs[Double]("cramers_v"),
      math.sqrt(r.getAs[Double]("chisq") / (5000.0 * 1)), 1e-12))
    intercept[IllegalArgumentException] {
      SimpleTests.chisqIndependence(d.filter($"x" === "a0"), $"x", $"y")
    }
  }

  test("mutualInfo: independence zero, identity ln k, hand cells") {
    // balanced independent bits: p_ab = p_a p_b exactly -> MI exactly 0
    val ind = (0 until 100).map(i => (i % 2, (i / 2) % 2)).toDF("a", "b")
    val ri = graft.ops.SimpleTests.mutualInfo(ind, $"a", $"b").head()
    assert(math.abs(ri.getAs[Double]("mi")) < 1e-12, ri.toString)
    // identical 4-category uniform columns: MI = H = ln 4, NMI = 1
    val idn = (0 until 100).map(i => (i % 4, i % 4)).toDF("a", "b")
    val rd = graft.ops.SimpleTests.mutualInfo(idn, $"a", $"b").head()
    assert(math.abs(rd.getAs[Double]("mi") - math.log(4.0)) < 1e-12)
    assert(math.abs(rd.getAs[Double]("nmi") - 1.0) < 1e-12)
    assert(rd.getAs[Long]("cells") == 4)
    // hand 2x2 (the kappa fixture): recompute MI/H by direct loops
    val cells = Map(("y", "y") -> 40, ("y", "n") -> 20, ("n", "y") -> 10,
      ("n", "n") -> 30)
    val lab = cells.toSeq.flatMap { case ((a, b), c) =>
      Seq.fill(c)((a, b)) }.toDF("a", "b")
    val rh = graft.ops.SimpleTests.mutualInfo(lab, $"a", $"b").head()
    val pa = Map("y" -> 0.6, "n" -> 0.4)
    val pb = Map("y" -> 0.5, "n" -> 0.5)
    val miHand = cells.map { case ((a, b), c) =>
      val p = c / 100.0; p * math.log(p / (pa(a) * pb(b))) }.sum
    assert(math.abs(rh.getAs[Double]("mi") - miHand) < 1e-12, rh.toString)
    val haHand = -pa.values.map(p => p * math.log(p)).sum
    assert(math.abs(rh.getAs[Double]("h_a") - haHand) < 1e-12)
    assert(math.abs(rh.getAs[Double]("nmi") -
      miHand / math.sqrt(haHand * (-pb.values.map(p => p * math.log(p)).sum)))
      < 1e-12)
    // constant column: zero entropy -> mi 0, nmi 0 (not NaN)
    val const = (0 until 50).map(i => ("k", i % 3)).toDF("a", "b")
    val rc = graft.ops.SimpleTests.mutualInfo(const, $"a", $"b").head()
    assert(rc.getAs[Double]("mi") == 0.0 && rc.getAs[Double]("nmi") == 0.0)
    // gateway verb
    lab.createOrReplaceTempView("mi_t")
    assert(GraftGateway.sql(spark, "SELECT mutual_info(a, b) FROM mi_t")
      .columns.toSeq == Seq("n", "cells", "h_a", "h_b", "mi", "nmi"))
  }

  test("ebShrinkMeans: small groups shrink harder, big groups barely move") {
    val rng = new scala.util.Random(27)
    // big groups with real spread + one tiny group with a wild mean
    val rows = (0 until 4).flatMap { gId =>
      (1 to 2000).map(_ => (s"g$gId", gId * 2.0 + rng.nextGaussian()))
    } ++ (1 to 3).map(_ => ("tiny", 50.0 + rng.nextGaussian()))
    val d = spark.createDataFrame(rows).toDF("g", "y")
    val out = graft.ops.Shrinkage.ebShrinkMeans(d, $"g", $"y")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("mean"), r.getAs[Double]("shrinkage"),
          r.getAs[Double]("shrunk_mean"))).toMap
    // big groups: almost no shrinkage, posterior ~ raw mean
    (0 until 4).foreach { gId =>
      val (m, b, s) = out(s"g$gId")
      assert(b < 0.01, s"g$gId shrinkage $b")
      assert(math.abs(s - m) < 0.2, s"g$gId moved $m -> $s")
    }
    // the tiny wild group moves toward the grand mean, monotonically
    val (mT, bT, sT) = out("tiny")
    assert(bT > out("g0")._2, "tiny must shrink harder than a big group")
    assert(sT < mT, s"tiny must move toward the grand mean: $mT -> $sT")
    // degenerate: identical group means -> tau2 = 0 -> everything at mu
    val flat = Seq(("a", 1.0), ("a", 3.0), ("b", 1.0), ("b", 3.0))
      .toDF("g", "y")
    val f = graft.ops.Shrinkage.ebShrinkMeans(flat, $"g", $"y").collect()
    f.foreach(r => assert(r.getAs[Double]("shrunk_mean") == 2.0 &&
      r.getAs[Double]("shrinkage") == 1.0))
    intercept[IllegalArgumentException] {
      graft.ops.Shrinkage.ebShrinkMeans(flat.filter($"g" === "a"), $"g", $"y")
    }
  }

  test("describeAll one-pass summary") {
    val d = (1 to 100).map(_.toDouble).toDF("x")
    val out = d.describeAll(Seq("x")).head()
    assert(out.getAs[Double]("count") == 100.0)
    assert(approx(out.getAs[Double]("avg"), 50.5))
    assert(approx(out.getAs[Double]("p50"), 50.5))
    assert(out.getAs[Double]("min") == 1.0 && out.getAs[Double]("max") == 100.0)
  }

  test("profileAll one-pass data-quality report") {
    val d = Seq((Some(1L), Some("a")), (None, Some("b")), (Some(3L), None),
      (Some(3L), Some("b"))).toDF("k", "s")
    val rows = d.profileAll(Seq("k", "s"), exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    val k = rows("k")
    assert(k.getLong(1) == 4 && k.getLong(2) == 1) // rows, nulls
    assert(math.abs(k.getDouble(3) - 0.25) < 1e-12)
    assert(k.getLong(4) == 2 && k.getString(5) == "1" && k.getString(6) == "3")
    val s = rows("s")
    assert(s.getLong(2) == 1 && s.getLong(4) == 2)
    assert(s.getString(5) == "a" && s.getString(6) == "b")
    // sketch path returns plausible counts without the exact shuffle
    val hll = d.profileAll(Seq("k")).head()
    assert(hll.getLong(4) >= 1 && hll.getLong(4) <= 3)
  }

  test("RichDataFrame DSL verbs work end to end") {
    val r = upliftDf.ttest2Samp("avg(y)", "t")
    assert(r.columns.contains("estimate"))
    val (train, test) = upliftDf.trainTestSplit(0.3)
    assert(train.count() + test.count() == 5000)
    // deterministic variant: identical membership on every layout, sizes
    // near the fraction, sides disjoint
    val keyed = spark.range(5000).select($"id".as("uin"),
      (col("id") % 7).cast("double").as("v"))
    val layouts = Seq(keyed.coalesce(1), keyed.repartition(13))
    val sides = layouts.map { d =>
      val (tr, te) = d.trainTestSplitDeterministic(0.3, idCols = Seq($"uin"))
      (tr.select($"uin").collect().map(_.getLong(0)).toSet,
        te.select($"uin").collect().map(_.getLong(0)).toSet)
    }
    assert(sides(0) == sides(1), "deterministic split drifted with layout")
    val (trIds, teIds) = sides.head
    assert(trIds.intersect(teIds).isEmpty && trIds.size + teIds.size == 5000)
    assert(math.abs(teIds.size - 1500) < 150, s"test side ${teIds.size} far from 30%")
  }

  test("sampleByDeterministic: layout-invariant, per-stratum fractions, grow-stable") {
    import graft.api.implicits._
    val keyed = spark.range(9000).select($"id".as("uin"),
      (col("id") % 3).cast("string").as("src"))
    val fr = Map("0" -> 0.5, "1" -> 0.1) // stratum "2" absent → dropped
    val layouts = Seq(keyed.coalesce(1), keyed.repartition(13))
    val kept = layouts.map(
      _.sampleByDeterministic($"src", fr, idCols = Seq($"uin"))
        .select($"uin").collect().map(_.getLong(0)).toSet)
    assert(kept(0) == kept(1), "membership drifted with layout")
    val byStratum = kept.head.groupBy(_ % 3).map { case (k, v) => (k, v.size) }
    assert(math.abs(byStratum.getOrElse(0L, 0) - 1500) < 150, byStratum.toString)
    assert(math.abs(byStratum.getOrElse(1L, 0) - 300) < 90, byStratum.toString)
    assert(byStratum.getOrElse(2L, 0) == 0, "unlisted stratum must be dropped")
    // incremental curation: membership is per-row, so sampling a GROWN
    // table keeps every previously-kept row
    val grown = spark.range(12000).select($"id".as("uin"),
      (col("id") % 3).cast("string").as("src"))
    val keptGrown = grown.sampleByDeterministic($"src", fr, idCols = Seq($"uin"))
      .select($"uin").collect().map(_.getLong(0)).toSet
    assert(kept.head.subsetOf(keptGrown), "grown-table sample lost kept rows")
  }

  test("Sessions: gap boundaries, tie safety, layout invariance") {
    // user 1: events at 0s,10s,20s | gap | 1000s,1010s → 2 sessions
    // user 2: one event → 1 session; duplicate-ts rows stay in-session
    val rows = Seq(
      (1L, 0L, 1.0), (1L, 10L, 2.0), (1L, 20L, 3.0),
      (1L, 1000L, 4.0), (1L, 1010L, 5.0),
      (2L, 50L, 6.0), (2L, 50L, 7.0), // exact tie
      (3L, 7L, 8.0))
    val d = spark.createDataFrame(
      rows.map { case (u, t, v) => (u, t * 1000000000L, v) })
      .toDF("user_id", "ts", "value")
    val st = Sessions.stats(
      Sessions.assign(d.repartition(5), $"user_id", $"ts", gapSeconds = 100),
      $"user_id", $"ts", $"value").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3), r.getDouble(4))))
      .toMap
    assert(st.size == 4, st.toString)
    assert(st((1L, 1L)) == ((3L, 20.0, 6.0)))
    assert(st((1L, 2L)) == ((2L, 10.0, 9.0)))
    assert(st((2L, 1L)) == ((2L, 0.0, 13.0)))
    assert(st((3L, 1L)) == ((1L, 0.0, 8.0)))
    // exactly at the gap is NOT a new session (strict >)
    val edge = spark.createDataFrame(Seq((1L, 0L, 0.0), (1L, 100L * 1000000000L, 0.0)))
      .toDF("user_id", "ts", "value")
    assert(Sessions.assign(edge, $"user_id", $"ts", 100)
      .agg(max($"session_id")).head().getLong(0) == 1L)
  }

  test("CSV source round-trips schema and values") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    // deterministic subset: bare limit() picks arbitrary rows per evaluation
    val out = upliftDf.orderBy($"y", $"t").limit(100)
    out.write.mode("overwrite").option("header", "true").csv(s"$dir/u")
    val back = spark.read.option("header", "true")
      .schema(out.schema).csv(s"$dir/u")
    assert(back.count() == 100)
    val a = out.agg(org.apache.spark.sql.functions.sum($"y")).head().getDouble(0)
    val b = back.agg(org.apache.spark.sql.functions.sum($"y")).head().getDouble(0)
    assert(approx(a, b, 1e-9), s"$a vs $b")
    // an aggregate operator runs identically over the CSV-backed frame
    val t1 = out.select(functions.ttest_2samp("x1", $"t")($"y").as("r"))
      .select("r.estimate").head().getDouble(0)
    val t2 = back.select(functions.ttest_2samp("x1", $"t")($"y").as("r"))
      .select("r.estimate").head().getDouble(0)
    assert(approx(t1, t2, 1e-9))
  }

  test("kaplanMeier: textbook fixture with censoring, layout invariance") {
    // subjects: (time, event) with 1=event 0=censored; hand-computed KM:
    // t=1 r=8 d=1 S=7/8; t=2 r=7 d=1 c=1 S=0.75; t=3 r=5 d=1 S=0.6;
    // t=4 r=4 c=1 S=0.6; t=5 r=3 d=2 S=0.2; t=6 r=1 c=1 S=0.2
    val subj = Seq((1, 1), (2, 1), (2, 0), (3, 1), (4, 0), (5, 1), (5, 1), (6, 0))
    for (parts <- Seq(1, 3)) {
      val df = subj.toDF("time", "event").repartition(parts)
      val km = Survival.kaplanMeier(df, col("time"), col("event"))
        .orderBy("time").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      assert(km.map(x => (x._1, x._2, x._3, x._4)).toSeq ==
        Seq((1, 8L, 1L, 0L), (2, 7L, 1L, 1L), (3, 5L, 1L, 0L),
          (4, 4L, 0L, 1L), (5, 3L, 2L, 0L), (6, 1L, 0L, 1L)))
      val s = km.map(_._5)
      Seq(0.875, 0.75, 0.6, 0.6, 0.2, 0.2).zip(s).foreach { case (e, g) =>
        assert(approx(g, e, 1e-12), s"parts=$parts got ${s.toSeq}")
      }
    }
    // everyone left dies at the last time: survival hits an exact 0 (the
    // -inf branch), not NULL from ln(0)
    val allDie = Seq((1, 1), (2, 1), (2, 1)).toDF("time", "event")
    val km2 = Survival.kaplanMeier(allDie, col("time"), col("event"))
      .orderBy("time").collect().map(_.getDouble(4))
    assert(approx(km2(0), 2.0 / 3.0, 1e-12) && km2(1) == 0.0, km2.toSeq.toString)
    // no event column: everyone is an event
    val noCens = Survival.kaplanMeier(Seq(1, 1, 2).toDF("time"), col("time"))
      .orderBy("time").collect()
    val sNc = noCens.map(_.getDouble(4))
    assert(approx(sNc(0), 1.0 / 3.0, 1e-12) && sNc(1) == 0.0, sNc.toSeq.toString)
  }

  test("metricAnomaly: seasonal baseline flags the planted spike only") {
    import graft.ops.Drift
    import org.apache.spark.sql.functions._
    // 20 days x 24 hours, metric = 10 + phase (clean daily cycle) except a
    // +9 spike at period 400; a flat rolling window would flag every
    // morning/evening swing, the seasonal baseline flags only the spike
    val rows = (0 until 480).flatMap { p =>
      // deterministic within-phase jitter (sd ~ 0.16, |z| stays < 2) so
      // the baseline sd is nonzero; the spike is ~57 sd out
      val base = 10.0 + (p % 24) + ((p * 7) % 5) * 0.1
      val v = if (p == 400) base + 9.0 else base
      // two rows per period so avg() has something to do
      Seq((p.toLong, v - 0.5), (p.toLong, v + 0.5))
    }
    val df = spark.createDataFrame(rows).toDF("p", "v").repartition(7)
    val r = Drift.metricAnomaly(df, col("p"), col("v"), season = 24,
        minHistory = 3, zThresh = 3.0)
      .collect().map(x => x.getAs[Long]("period") ->
        x.getAs[Boolean]("is_anomaly")).toMap
    assert(r(400L), "spike not flagged")
    assert(r.count(_._2) == 1, s"extra anomalies: ${r.filter(_._2).keys}")
    // early periods (no history yet) are never flagged
    assert((0L until 72L).forall(p => !r(p)))
  }

  test("mediation: planted paths recovered exactly; Sobel se; guards") {
    // noise-free planted model: M = 5 + 2T + u, Y = 1 + 3M + 1.5T + v,
    // with u, v deterministic, mean-balanced, and independent of T
    val rows = (1 to 2000).map { i =>
      val t = (i % 2).toDouble
      val u = ((i / 2) % 10 - 4.5) * 0.2
      val v = ((i / 3) % 7 - 3.0) * 0.1
      val m = 5.0 + 2.0 * t + u
      (t, m, 1.0 + 3.0 * m + 1.5 * t + v)
    }
    val df = rows.toDF("t", "m", "y")
    val r = graft.ops.Regression.mediation(df, $"y", $"t", $"m").head()
    assert(math.abs(r.getAs[Double]("a") - 2.0) < 0.02, r.toString)
    assert(math.abs(r.getAs[Double]("b") - 3.0) < 0.02)
    assert(math.abs(r.getAs[Double]("c_direct") - 1.5) < 0.05)
    assert(math.abs(r.getAs[Double]("indirect") - 6.0) < 0.1)
    assert(math.abs(r.getAs[Double]("c_total") -
      (r.getAs[Double]("c_direct") + r.getAs[Double]("indirect"))) < 1e-9,
      "total = direct + indirect must hold exactly in the linear model")
    assert(r.getAs[Double]("se_indirect") > 0 &&
      r.getAs[Double]("z") > 10)
    assert(math.abs(r.getAs[Double]("prop_mediated") - 6.0 / 7.5) < 0.02)
    // mediator collinear with treatment: no decomposition identified
    val coll = (1 to 100).map(i => ((i % 2).toDouble, (i % 2) * 3.0, i * 1.0))
      .toDF("t", "m", "y")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Regression.mediation(coll, $"y", $"t", $"m").head() }
    assert(e.getMessage.contains("collinear"), e.getMessage)
    df.createOrReplaceTempView("med_t")
    val viaSql = GraftGateway.sql(spark, "SELECT mediation(y, t, m) FROM med_t")
    assert(viaSql.columns.toSeq == Seq("n", "a", "b", "c_total", "c_direct",
      "indirect", "se_indirect", "z", "prop_mediated"))
  }

  test("equivalenceTest: TOST accepts an A/A inside the margin, rejects a real shift") {
    // arms identical up to a mean shift of 0.1, margin 0.5, large n
    // (i/2)%40 cycles uniformly WITHIN each parity class (the BayesSpec
    // lesson: i%40 would be parity-locked and shift the arm means)
    val rows = (1 to 4000).map { i =>
      val t = i % 2
      (t, ((i / 2) % 40) / 4.0 + t * 0.1)
    }
    val df = rows.toDF("t", "y")
    val r = graft.ops.SimpleTests.equivalenceTest(df, $"y", $"t", 0.5).head()
    assert(math.abs(r.getAs[Double]("diff") - 0.1) < 1e-9)
    assert(r.getAs[Boolean]("equivalent"), r.toString)
    assert(r.getAs[Double]("p_equiv") < 0.05)
    // hand-check the z bounds: (diff + m)/se and (m - diff)/se
    val se = r.getAs[Double]("se")
    assert(math.abs(r.getAs[Double]("z_lower") - 0.6 / se) < 1e-9)
    assert(math.abs(r.getAs[Double]("z_upper") - 0.4 / se) < 1e-9)
    // a shift beyond the margin must NOT be declared equivalent
    val shifted = rows.map { case (t, y) => (t, y + t * 0.8) }.toDF("t", "y")
    val rs = graft.ops.SimpleTests.equivalenceTest(shifted, $"y", $"t", 0.5).head()
    assert(!rs.getAs[Boolean]("equivalent") && rs.getAs[Double]("p_equiv") > 0.5)
    intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.equivalenceTest(df, $"y", $"t", -1.0) }
    df.createOrReplaceTempView("tost_t")
    assert(GraftGateway.sql(spark,
      "SELECT equivalence_test(y, t, 0.5) FROM tost_t").count() == 1)
  }

  test("rateRatioTest: hand-computed Poisson ratio with exposure, guards") {
    // arm 0: 20 events over exposure 100; arm 1: 45 events over 150
    val rows = (1 to 100).map(i => (0, if (i <= 20) 1.0 else 0.0, 1.0)) ++
      (1 to 75).map(i => (1, if (i <= 45) 1.0 else 0.0, 2.0))
    val df = rows.toDF("t", "ev", "ex")
    val r = graft.ops.SimpleTests.rateRatioTest(df, $"ev", $"t", $"ex").head()
    assert(r.getAs[Double]("events0") == 20.0 && r.getAs[Double]("events1") == 45.0)
    assert(r.getAs[Double]("exposure0") == 100.0 &&
      r.getAs[Double]("exposure1") == 150.0)
    val ratio = (45.0 / 150.0) / (20.0 / 100.0)
    assert(math.abs(r.getAs[Double]("ratio") - ratio) < 1e-12)
    val se = math.sqrt(1.0 / 45 + 1.0 / 20)
    assert(math.abs(r.getAs[Double]("z") - math.log(ratio) / se) < 1e-12)
    assert(math.abs(r.getAs[Double]("lower") -
      math.exp(math.log(ratio) - 1.959963984540054 * se)) < 1e-9)
    assert(r.getAs[Double]("lower") < ratio && ratio < r.getAs[Double]("upper"))
    // quasi-Poisson dispersion: X²_a = (1/r̂)Σe²/x − Σe by hand; the 0/1
    // fixture is UNDER-dispersed, so φ floors at 1 and the od interval
    // equals the Poisson one
    val x2Hand = (1.0 / (20.0 / 100) * 20.0 - 20.0) +
      (1.0 / (45.0 / 150) * (45.0 / 2) - 45.0)
    assert(math.max(1.0, x2Hand / (175 - 2)) == r.getAs[Double]("dispersion")
      || math.abs(r.getAs[Double]("dispersion") -
        math.max(1.0, x2Hand / 173.0)) < 1e-12)
    assert(math.abs(r.getAs[Double]("lower_od") - r.getAs[Double]("lower")) <
      1e-12 || r.getAs[Double]("dispersion") > 1.0)
    // clumped events at EQUAL per-row exposure (all of an arm's events
    // on one row) must raise dispersion and widen the interval: per arm,
    // X² = Σe²/x / r̂ − Σe with r̂ = 2 resp. 4.5 -> φ = (180+405)/18
    val clumped =
      ((1 to 10).map(i => (0, if (i == 1) 20.0 else 0.0, 1.0)) ++
        (1 to 10).map(i => (1, if (i == 1) 45.0 else 0.0, 1.0)))
        .toDF("t", "ev", "ex")
    val rc = graft.ops.SimpleTests.rateRatioTest(clumped, $"ev", $"t", $"ex")
      .head()
    assert(math.abs(rc.getAs[Double]("dispersion") - (180.0 + 405.0) / 18)
      < 1e-12, rc.toString)
    assert(rc.getAs[Double]("upper_od") > rc.getAs[Double]("upper"))
    assert(rc.getAs[Double]("lower_od") < rc.getAs[Double]("lower"))
    assert(math.abs(rc.getAs[Double]("ratio") - 2.25) < 1e-12,
      "point estimate must not move with the dispersion")
    // guards: negative events / nonpositive exposure are named errors
    val e = intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.rateRatioTest(
        Seq((0, -1.0, 1.0), (1, 1.0, 1.0)).toDF("t", "ev", "ex"),
        $"ev", $"t", $"ex").head() }
    assert(e.getMessage.contains("negative"), e.getMessage)
    df.createOrReplaceTempView("rate_t")
    val viaSql = GraftGateway.sql(spark,
      "SELECT rate_ratio(ev, t, ex) FROM rate_t").head()
    assert(math.abs(viaSql.getAs[Double]("ratio") - ratio) < 1e-12)
  }

  test("rddSharp: exact jump recovery, kernel/noise behavior, guards") {
    // noise-free piecewise-linear with BOTH a jump and a slope change:
    // local-linear is exact on each side, so tau must be the planted 4.0
    val grid = (0 to 1000).map { i =>
      val x = i / 100.0
      val y = 2.0 + 0.3 * x + (if (x >= 5.0) 4.0 + 0.4 * (x - 5.0) else 0.0)
      (x, y)
    }
    val df = grid.toDF("x", "y")
    val r = graft.ops.Regression.rddSharp(df, $"y", $"x", 5.0, 3.0).head()
    assert(math.abs(r.getAs[Double]("tau") - 4.0) < 1e-9, r.toString)
    assert(r.getAs[Double]("se") < 1e-6)
    assert(math.abs(r.getAs[Double]("y_left") - (2.0 + 0.3 * 5.0)) < 1e-9)
    assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") ==
      grid.count(p => math.abs(p._1 - 5.0) < 3.0))
    // uniform kernel: still exact on the linear design
    val ru = graft.ops.Regression.rddSharp(df, $"y", $"x", 5.0, 3.0,
      kernel = "uniform").head()
    assert(math.abs(ru.getAs[Double]("tau") - 4.0) < 1e-9)
    // deterministic bounded noise: the 95% CI must cover the planted jump
    val noisy = df.withColumn("y",
      $"y" + pmod(xxhash64($"x"), lit(1000)).cast("double") / 1000.0 - 0.5)
    val rn = graft.ops.Regression.rddSharp(noisy, $"y", $"x", 5.0, 3.0).head()
    val (tau, se) = (rn.getAs[Double]("tau"), rn.getAs[Double]("se"))
    assert(se > 0 && math.abs(tau - 4.0) < 1.96 * se + 0.2,
      s"tau $tau se $se")
    // guards: bad kernel/bandwidth, thin side, degenerate design
    intercept[IllegalArgumentException] {
      graft.ops.Regression.rddSharp(df, $"y", $"x", 5.0, -1.0) }
    intercept[IllegalArgumentException] {
      graft.ops.Regression.rddSharp(df, $"y", $"x", 5.0, 3.0, kernel = "epa") }
    val thin = df.filter($"x" < 5.0)
    val e = intercept[IllegalArgumentException] {
      graft.ops.Regression.rddSharp(thin, $"y", $"x", 5.0, 3.0).head() }
    assert(e.getMessage.contains("right side"), e.getMessage)
    val degen = df.filter($"x" >= 5.0)
      .unionByName(Seq((4.0, 1.0), (4.0, 2.0), (4.0, 3.0)).toDF("x", "y"))
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Regression.rddSharp(degen, $"y", $"x", 5.0, 3.0).head() }
    assert(e2.getMessage.contains("degenerate"), e2.getMessage)
    // gateway verb
    df.createOrReplaceTempView("rdd_t")
    val viaSql = GraftGateway.sql(spark,
      "SELECT rdd_sharp(y, x, 5.0, 3.0) FROM rdd_t")
    assert(viaSql.columns.toSeq == Seq("n_left", "n_right", "y_left",
      "y_right", "tau", "se", "z"))
    assert(math.abs(viaSql.head().getAs[Double]("tau") - 4.0) < 1e-9)
  }

  test("rddFuzzy: Wald ratio, sharp cross-pin, weak first stage guard") {
    // noise-free design: outcome jumps 2.0 at the cutoff, take-up jumps
    // 0.5 (from 0.2 to 0.7, both arms with slope in x) — local-linear is
    // exact on each side, so the Wald ratio must be exactly 2.0/0.5
    val grid = (0 to 1000).map { i =>
      val x = i / 100.0
      val d = (if (x >= 5.0) 0.7 else 0.2) + 0.01 * x
      val y = 1.0 + 0.3 * x + (if (x >= 5.0) 2.0 else 0.0)
      (x, y, d)
    }
    val df = grid.toDF("x", "y", "d")
    val r = graft.ops.Regression.rddFuzzy(df, $"y", $"d", $"x", 5.0, 3.0)
      .head()
    assert(math.abs(r.getAs[Double]("jump_y") - 2.0) < 1e-9, r.toString)
    assert(math.abs(r.getAs[Double]("jump_d") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("tau") - 4.0) < 1e-9)
    assert(r.getAs[Double]("se") < 1e-6 && r.getAs[Double]("se_first") < 1e-6)
    // sharp take-up (d = 1{x >= c}): tau and se must equal rddSharp's —
    // the cross-meat terms vanish and the Wald denominator is exactly 1
    val sharpD = df.withColumn("d", when($"x" >= 5.0, 1.0).otherwise(0.0))
      .withColumn("y", $"y" + pmod(xxhash64($"x"), lit(1000))
        .cast("double") / 1000.0)
    val fz = graft.ops.Regression.rddFuzzy(sharpD, $"y", $"d", $"x",
      5.0, 3.0).head()
    val sh = graft.ops.Regression.rddSharp(sharpD, $"y", $"x", 5.0, 3.0)
      .head()
    assert(math.abs(fz.getAs[Double]("jump_d") - 1.0) < 1e-12)
    assert(math.abs(fz.getAs[Double]("tau") - sh.getAs[Double]("tau")) < 1e-9)
    assert(math.abs(fz.getAs[Double]("se") - sh.getAs[Double]("se")) < 1e-9)
    // no take-up jump: a named weak-first-stage error, not a huge ratio
    val flat = df.withColumn("d", lit(0.4) +
      pmod(xxhash64($"x"), lit(1000)).cast("double") / 5000.0)
    val e = intercept[IllegalArgumentException] {
      graft.ops.Regression.rddFuzzy(flat, $"y", $"d", $"x", 5.0, 3.0)
        .head() }
    assert(e.getMessage.contains("weak first stage"), e.getMessage)
    // gateway verb
    df.createOrReplaceTempView("rddf_t")
    val viaSql = GraftGateway.sql(spark,
      "SELECT rdd_fuzzy(y, d, x, 5.0, 3.0) FROM rddf_t")
    assert(viaSql.columns.toSeq == Seq("n_left", "n_right", "jump_y",
      "jump_d", "se_first", "tau", "se", "z"))
    assert(math.abs(viaSql.head().getAs[Double]("tau") - 4.0) < 1e-9)
  }

  test("yuenTest: exact trimmed diff on clean shift, outlier robustness") {
    // arms 1..10 and 2..11: trim 0.2 -> windows [2.8, 8.2] / [3.8, 9.2],
    // trimmed rows 3..8 / 4..9, means 5.5 / 6.5 — diff exactly 1, h = 6
    val clean = ((1 to 10).map(i => (0, i.toDouble)) ++
      (1 to 10).map(i => (1, i + 1.0))).toDF("t", "y")
    val r = graft.ops.Robust.yuenTest(clean, $"y", $"t", exact = true).head()
    assert(r.getAs[Long]("h0") == 6 && r.getAs[Long]("h1") == 6, r.toString)
    assert(math.abs(r.getAs[Double]("tmean0") - 5.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("diff") - 1.0) < 1e-12)
    assert(r.getAs[Double]("se") > 0 && r.getAs[Double]("df") > 5)
    // outliers with the SAME rank structure per arm (one extreme low,
    // one extreme high) but wildly different values: the trim windows
    // shift identically, so the trimmed diff is exactly the planted 2.0
    // while the plain mean diff is destroyed. (A single one-sided
    // outlier would shift the percentile window by a rank — that is
    // correct trimming behavior, not noise.)
    val dirty = ((1 to 40).map(i => (0, (i % 20).toDouble)) ++
      (1 to 40).map(i => (1, (i % 20) + 2.0)) ++
      Seq((0, -1e6), (0, 9e6), (1, -3e6), (1, 1e6))).toDF("t", "y")
    val rd = graft.ops.Robust.yuenTest(dirty, $"y", $"t").head()
    assert(math.abs(rd.getAs[Double]("diff") - 2.0) < 1e-9, rd.toString)
    val plainDiff = dirty.filter($"t" === 1).agg(avg($"y")).head().getDouble(0) -
      dirty.filter($"t" === 0).agg(avg($"y")).head().getDouble(0)
    assert(math.abs(plainDiff - 2.0) > 1000, "fixture must actually poison the mean")
    // guards: trim domain, missing arm, tiny arm
    intercept[IllegalArgumentException] {
      graft.ops.Robust.yuenTest(clean, $"y", $"t", trim = 0.5) }
    val e = intercept[IllegalArgumentException] {
      graft.ops.Robust.yuenTest(clean.filter($"t" === 0), $"y", $"t").head() }
    assert(e.getMessage.contains("{0, 1}"), e.getMessage)
    // gateway verb
    clean.createOrReplaceTempView("yuen_t")
    val viaSql = GraftGateway.sql(spark, "SELECT yuen_test(y, t) FROM yuen_t")
    assert(viaSql.columns.toSeq == Seq("n0", "n1", "h0", "h1", "tmean0",
      "tmean1", "diff", "se", "t_stat", "df", "p_value"))
  }

  test("mcnemar + cohensKappa: hand confusion cells, guards") {
    // McNemar: n00=5, n11=5, n10=2, n01=8 -> z = 6/sqrt(10),
    // chisq_cc = 25/10
    val pairs = (Seq.fill(5)((0, 0)) ++ Seq.fill(5)((1, 1)) ++
      Seq.fill(2)((1, 0)) ++ Seq.fill(8)((0, 1))).toDF("a", "b")
    val m = graft.ops.Agreement.mcnemar(pairs, $"a", $"b").head()
    assert(m.getAs[Long]("n") == 20 && m.getAs[Long]("only_a") == 2 &&
      m.getAs[Long]("only_b") == 8)
    assert(math.abs(m.getAs[Double]("z") - 6.0 / math.sqrt(10)) < 1e-12)
    assert(math.abs(m.getAs[Double]("chisq_cc") - 2.5) < 1e-12)
    intercept[IllegalArgumentException] {
      graft.ops.Agreement.mcnemar(
        Seq((2, 0), (1, 1)).toDF("a", "b"), $"a", $"b").head() }
    intercept[IllegalArgumentException] { // no discordant pairs
      graft.ops.Agreement.mcnemar(
        Seq((1, 1), (0, 0)).toDF("a", "b"), $"a", $"b").head() }
    // kappa: cells yy=40, yn=20, ny=10, nn=30 -> po=.7, pe=.5, kappa=.4,
    // se = sqrt(.21)/(.5*10)
    val lab = (Seq.fill(40)(("y", "y")) ++ Seq.fill(20)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(30)(("n", "n"))).toDF("a", "b")
    val k = graft.ops.Agreement.cohensKappa(lab, $"a", $"b").head()
    assert(k.getAs[Long]("n") == 100 && k.getAs[Long]("categories") == 2)
    assert(math.abs(k.getAs[Double]("po") - 0.7) < 1e-12)
    assert(math.abs(k.getAs[Double]("pe") - 0.5) < 1e-12)
    assert(math.abs(k.getAs[Double]("kappa") - 0.4) < 1e-12)
    assert(math.abs(k.getAs[Double]("se") -
      math.sqrt(0.21) / (0.5 * 10)) < 1e-12)
    // perfect agreement -> kappa 1; constant raters -> named error
    val perfect = Seq.fill(50)(("x", "x")).toDF("a", "b")
      .unionByName(Seq.fill(50)(("z", "z")).toDF("a", "b"))
    assert(math.abs(graft.ops.Agreement.cohensKappa(perfect, $"a", $"b")
      .head().getAs[Double]("kappa") - 1.0) < 1e-12)
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Agreement.cohensKappa(
        Seq.fill(10)(("x", "x")).toDF("a", "b"), $"a", $"b").head() }
    assert(e2.getMessage.contains("constant"), e2.getMessage)
    // gateway verbs
    pairs.createOrReplaceTempView("mcn_t")
    lab.createOrReplaceTempView("kap_t")
    assert(GraftGateway.sql(spark, "SELECT mcnemar(a, b) FROM mcn_t")
      .columns.toSeq == Seq("n", "both0", "both1", "only_a", "only_b",
        "z", "chisq_cc"))
    assert(math.abs(GraftGateway.sql(spark,
      "SELECT cohens_kappa(a, b) FROM kap_t").head()
      .getAs[Double]("kappa") - 0.4) < 1e-12)
  }

  test("spearman: monotone 1, tie hand case, balanced independence, guards") {
    // perfect monotone but wildly nonlinear: rho exactly 1
    val mono = (1 to 50).map(i => (i.toDouble, math.pow(i, 3))).toDF("x", "y")
    val rm = graft.ops.RankTests.spearman(mono, $"x", $"y").head()
    assert(math.abs(rm.getAs[Double]("rho") - 1.0) < 1e-12)
    assert(rm.getAs[Double]("p_value") == 0.0)
    // hand tie case: x = (1,2,2,3) avg-ranks to (1,2.5,2.5,4);
    // y = (1,3,2,4) -> rho = 3/sqrt(10)
    val ties = Seq((1.0, 1.0), (2.0, 3.0), (2.0, 2.0), (3.0, 4.0))
      .toDF("x", "y")
    val rt = graft.ops.RankTests.spearman(ties, $"x", $"y").head()
    assert(math.abs(rt.getAs[Double]("rho") - 3.0 / math.sqrt(10)) < 1e-12,
      rt.toString)
    // balanced grid: ranks are exactly independent -> rho = 0
    val grid = (0 until 25).map(i => ((i % 5).toDouble, (i / 5).toDouble))
      .toDF("x", "y")
    assert(math.abs(graft.ops.RankTests.spearman(grid, $"x", $"y").head()
      .getAs[Double]("rho")) < 1e-12)
    // constant column: named error
    val e = intercept[IllegalArgumentException] {
      graft.ops.RankTests.spearman(
        mono.withColumn("y", lit(2.0)), $"x", $"y").head() }
    assert(e.getMessage.contains("constant"), e.getMessage)
    // gateway verb
    mono.createOrReplaceTempView("sp_t")
    assert(GraftGateway.sql(spark, "SELECT spearman(x, y) FROM sp_t")
      .columns.toSeq == Seq("n", "rho", "z", "p_value"))
  }

  test("leveneTest: hand Brown-Forsythe F, spread detection, guards") {
    // arm a = (0,2,4), arm b = (0,6,12): z-ANOVA F = 1.6 by hand
    val hand = Seq(("a", 0.0), ("a", 2.0), ("a", 4.0),
      ("b", 0.0), ("b", 6.0), ("b", 12.0)).toDF("g", "y")
    val r = graft.ops.SimpleTests.leveneTest(hand, $"y", $"g").head()
    assert(r.getAs[Long]("n") == 6 && r.getAs[Long]("k") == 2)
    assert(math.abs(r.getAs[Double]("f_stat") - 1.6) < 1e-12, r.toString)
    assert(r.getAs[Double]("df1") == 1.0 && r.getAs[Double]("df2") == 4.0)
    // same means, 5x the spread in one arm: detected decisively
    val spread = ((1 to 200).map(i => ("a", (i % 21 - 10).toDouble)) ++
      (1 to 200).map(i => ("b", (i % 21 - 10) * 5.0))).toDF("g", "y")
    val rs = graft.ops.SimpleTests.leveneTest(spread, $"y", $"g").head()
    assert(rs.getAs[Double]("p_value") < 1e-6, rs.toString)
    // equal spreads: not significant
    val eq = ((1 to 200).map(i => ("a", (i % 21).toDouble)) ++
      (1 to 200).map(i => ("b", (i % 21).toDouble))).toDF("g", "y")
    assert(graft.ops.SimpleTests.leveneTest(eq, $"y", $"g").head()
      .getAs[Double]("p_value") > 0.9)
    // guards: one arm; singleton arm
    intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.leveneTest(hand.filter($"g" === "a"), $"y", $"g")
        .head() }
    intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.leveneTest(
        hand.filter($"g" === "a" || $"y" === 0.0), $"y", $"g").head() }
    // gateway verb
    hand.createOrReplaceTempView("lev_t")
    assert(GraftGateway.sql(spark, "SELECT levene(y, g) FROM lev_t")
      .columns.toSeq == Seq("n", "k", "f_stat", "df1", "df2", "p_value"))
  }

  test("zipfFit: exact power law, flat corpus, guards") {
    // exact f = 2520/r for r = 1..10: ln f is exactly linear in ln r
    // with slope -1 and r2 = 1
    val zipf = (1 to 10).flatMap { r =>
      Seq.fill(2520 / r)(s"w$r") }.toDF("text")
    val rz = graft.ops.TextOps.zipfFit(zipf, $"text").head()
    assert(rz.getAs[Long]("terms") == 10)
    assert(rz.getAs[Long]("total_tokens") == (1 to 10).map(2520 / _).sum)
    assert(math.abs(rz.getAs[Double]("slope") - (-1.0)) < 1e-9, rz.toString)
    assert(math.abs(rz.getAs[Double]("r2") - 1.0) < 1e-9)
    assert(math.abs(rz.getAs[Double]("intercept") - math.log(2520.0)) < 1e-9)
    // flat corpus: every term equally frequent -> slope 0, exact flat fit
    val flat = (1 to 12).flatMap(k => Seq.fill(5)(s"t$k")).toDF("text")
    val rf = graft.ops.TextOps.zipfFit(flat, $"text").head()
    assert(rf.getAs[Double]("slope") == 0.0 && rf.getAs[Double]("r2") == 1.0)
    // guard: tiny vocabulary
    intercept[IllegalArgumentException] {
      graft.ops.TextOps.zipfFit(Seq("a b c").toDF("text"), $"text").head() }
    // gateway verb
    zipf.createOrReplaceTempView("zipf_t")
    assert(GraftGateway.sql(spark, "SELECT zipf_fit(text) FROM zipf_t")
      .columns.toSeq == Seq("terms", "total_tokens", "slope", "intercept",
        "r2"))
  }

  test("fleissKappa: hand 3x4 panel, perfect agreement, guards") {
    // items (a,a,a,b), (a,b,b,b), (a,a,b,b) with 4 raters:
    // P_i = .5, .5, 1/3 -> Pbar = 4/9; p_a = p_b = .5 -> Pe = .5;
    // kappa = (4/9 - 1/2)/(1/2) = -1/9
    val rows = Seq(("i1", "a"), ("i1", "a"), ("i1", "a"), ("i1", "b"),
      ("i2", "a"), ("i2", "b"), ("i2", "b"), ("i2", "b"),
      ("i3", "a"), ("i3", "a"), ("i3", "b"), ("i3", "b")).toDF("i", "c")
    val r = graft.ops.Agreement.fleissKappa(rows, $"i", $"c").head()
    assert(r.getAs[Long]("items") == 3 && r.getAs[Long]("raters") == 4 &&
      r.getAs[Long]("categories") == 2)
    assert(math.abs(r.getAs[Double]("p_bar") - 4.0 / 9) < 1e-12, r.toString)
    assert(math.abs(r.getAs[Double]("p_e") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("kappa") - (-1.0 / 9)) < 1e-12)
    // perfect agreement across mixed categories: kappa exactly 1
    val perfect = Seq("x", "y", "x", "y").zipWithIndex.flatMap { case (c, i) =>
      (1 to 3).map(_ => (s"it$i", c)) }.toDF("i", "c")
    assert(math.abs(graft.ops.Agreement.fleissKappa(perfect, $"i", $"c")
      .head().getAs[Double]("kappa") - 1.0) < 1e-12)
    // guards: unequal panel sizes; constant category
    val e = intercept[IllegalArgumentException] {
      graft.ops.Agreement.fleissKappa(rows.limit(11), $"i", $"c").head() }
    assert(e.getMessage.contains("unequal"), e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.Agreement.fleissKappa(
        rows.withColumn("c", lit("k")), $"i", $"c").head() }
    assert(e2.getMessage.contains("same category"), e2.getMessage)
    // gateway verb
    rows.createOrReplaceTempView("fk_t")
    assert(GraftGateway.sql(spark, "SELECT fleiss_kappa(i, c) FROM fk_t")
      .columns.toSeq == Seq("items", "raters", "categories", "p_bar",
        "p_e", "kappa"))
  }

  test("blandAltman: hand bias/LoA, outlier share, guards") {
    // diffs 19 x 0 and one 10: bias .5, sd = sqrt(5), the outlier falls
    // outside the limits -> pct_within = 0.95
    val df = ((1 to 19).map(_ => (0.0, 0.0)) ++ Seq((0.0, 10.0)))
      .toDF("a", "b")
    val r = graft.ops.Agreement.blandAltman(df, $"a", $"b").head()
    assert(math.abs(r.getAs[Double]("bias") - 0.5) < 1e-12, r.toString)
    assert(math.abs(r.getAs[Double]("sd") - math.sqrt(5.0)) < 1e-12)
    assert(math.abs(r.getAs[Double]("loa_lower") -
      (0.5 - 1.959963984540054 * math.sqrt(5.0))) < 1e-12)
    assert(math.abs(r.getAs[Double]("pct_within") - 0.95) < 1e-12)
    // constant difference: exact agreement up to bias -> named error
    val e = intercept[IllegalArgumentException] {
      graft.ops.Agreement.blandAltman(
        (1 to 5).map(i => (i.toDouble, i + 2.0)).toDF("a", "b"),
        $"a", $"b").head() }
    assert(e.getMessage.contains("constant"), e.getMessage)
    // gateway verb
    df.createOrReplaceTempView("ba_t")
    assert(GraftGateway.sql(spark, "SELECT bland_altman(a, b) FROM ba_t")
      .columns.toSeq == Seq("n", "bias", "sd", "loa_lower", "loa_upper",
        "pct_within"))
  }

  test("trendTest: hand Cochran-Armitage, flat null, guards") {
    // arms 0/1/2, 100 rows each, rates .1/.2/.3: T = 20, Var = 32
    val rows = (0 to 2).flatMap { k =>
      (1 to 100).map(i => (k, if (i <= (k + 1) * 10) 1 else 0)) }
    val df = rows.toDF("c", "s")
    val r = graft.ops.SimpleTests.trendTest(df, $"s", $"c").head()
    assert(r.getAs[Long]("n") == 300 && r.getAs[Long]("n_arms") == 3)
    assert(math.abs(r.getAs[Double]("p_bar") - 0.2) < 1e-12)
    assert(math.abs(r.getAs[Double]("t_stat") - 20.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("var_t") - 32.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("z") - 20.0 / math.sqrt(32.0)) < 1e-12)
    // flat rates: T = 0 exactly
    val flat = (0 to 2).flatMap { k =>
      (1 to 100).map(i => (k, if (i <= 20) 1 else 0)) }.toDF("c", "s")
    assert(math.abs(graft.ops.SimpleTests.trendTest(flat, $"s", $"c").head()
      .getAs[Double]("t_stat")) < 1e-12)
    // guards: one arm; degenerate rate; bad domain
    intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.trendTest(df.filter($"c" === 1), $"s", $"c")
        .head() }
    intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.trendTest(
        df.withColumn("s", lit(1)), $"s", $"c").head() }
    val e = intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.trendTest(
        Seq((0, 2), (1, 1)).toDF("c", "s"), $"s", $"c").head() }
    assert(e.getMessage.contains("outside"), e.getMessage)
    // gateway verb
    df.createOrReplaceTempView("tr_t")
    assert(GraftGateway.sql(spark, "SELECT trend_test(s, c) FROM tr_t")
      .columns.toSeq == Seq("n", "n_arms", "p_bar", "t_stat", "var_t",
        "z", "p_value"))
  }

  test("rddBandwidth: rule-of-thumb formula, guards") {
    val df = (1 to 1000).map(i => (i / 100.0, i % 7 * 1.0)).toDF("x", "y")
    val r = graft.ops.Regression.rddBandwidth(df, $"y", $"x").head()
    val sd = df.agg(stddev_samp($"x")).head().getDouble(0)
    assert(r.getAs[Long]("n") == 1000)
    assert(math.abs(r.getAs[Double]("sd") - sd) < 1e-12)
    assert(math.abs(r.getAs[Double]("h") -
      1.84 * sd * math.pow(1000.0, -0.2)) < 1e-12)
    intercept[IllegalArgumentException] {
      graft.ops.Regression.rddBandwidth(
        Seq((1.0, 1.0), (1.0, 2.0), (1.0, 3.0), (1.0, 4.0), (1.0, 5.0),
          (1.0, 6.0), (1.0, 7.0), (1.0, 8.0), (1.0, 9.0), (1.0, 10.0))
          .toDF("x", "y"), $"y", $"x").head() }
    df.createOrReplaceTempView("rbw_t")
    assert(GraftGateway.sql(spark, "SELECT rdd_bandwidth(y, x) FROM rbw_t")
      .columns.toSeq == Seq("n", "sd", "h"))
  }

  test("propTest: Wilson interval matches the textbook 20/100 case, guards") {
    // arm 0: 20/100, arm 1: 30/100 — Wilson 95% for 20/100 is
    // (0.13337, 0.28883) (direct evaluation of the closed form, matches
    // R binom.confint wilson); pooled score z = .1/.061237
    val rows = (1 to 100).map(i => (0, if (i <= 20) 1 else 0)) ++
      (1 to 100).map(i => (1, if (i <= 30) 1 else 0))
    val df = rows.toDF("t", "s")
    val r = graft.ops.SimpleTests.propTest(df, $"s", $"t").head()
    assert(r.getAs[Long]("s0") == 20 && r.getAs[Long]("s1") == 30)
    assert(math.abs(r.getAs[Double]("p0_lower") - 0.13337) < 5e-5, r.toString)
    assert(math.abs(r.getAs[Double]("p0_upper") - 0.28883) < 5e-5)
    assert(math.abs(r.getAs[Double]("z") - 1.6330) < 1e-3)
    // Newcombe diff CI brackets the diff and sits inside (-1, 1)
    assert(r.getAs[Double]("diff_lower") < 0.1 &&
      0.1 < r.getAs[Double]("diff_upper"))
    // zero-success arm: Wilson lower bound is exactly 0
    val zero = ((1 to 50).map(_ => (0, 0)) ++ (1 to 50).map(i => (1, i % 2)))
      .toDF("t", "s")
    val rz = graft.ops.SimpleTests.propTest(zero, $"s", $"t").head()
    assert(math.abs(rz.getAs[Double]("p0_lower")) < 1e-12)
    assert(rz.getAs[Double]("p0_upper") > 0, "Wilson upper must exceed 0 at s=0")
    // guards: non-binary success
    val e = intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.propTest(
        Seq((0, 2), (1, 1)).toDF("t", "s"), $"s", $"t").head() }
    assert(e.getMessage.contains("outside"), e.getMessage)
    // gateway verb
    df.createOrReplaceTempView("prop_t")
    val viaSql = GraftGateway.sql(spark, "SELECT prop_test(s, t) FROM prop_t")
    assert(viaSql.columns.length == 14)
  }

  test("benford: digit extraction, expected shares, conforming series") {
    // 1..9 once each: uniform shares, 9 complete rows ordered by digit
    val uni = (1 to 9).map(_.toDouble).toDF("v")
    val ru = graft.ops.Explore.benford(uni, $"v").collect()
    assert(ru.length == 9 && ru.map(_.getAs[Int]("digit")).toSeq == (1 to 9))
    assert(ru.forall(r => math.abs(r.getAs[Double]("share") - 1.0 / 9) < 1e-12))
    assert(math.abs(ru.head.getAs[Double]("expected_share") - math.log10(2.0))
      < 1e-12)
    // digits survive magnitude, sign, and powers of ten; zeros/nulls drop
    val mixed = Seq[java.lang.Double](123.0, -23.5, 1000.0, 0.0045, 0.0, null)
      .toDF("v")
    val rm = graft.ops.Explore.benford(mixed, $"v").collect()
      .map(r => r.getAs[Int]("digit") -> r.getAs[Long]("n")).toMap
    assert(rm(1) == 2 && rm(2) == 1 && rm(4) == 1) // 123, 1000 | -23.5 | .0045
    assert(rm.values.sum == 4, "zero and null must not carry a digit")
    // 2^i is the classic Benford-conforming series: Nigrini MAD small
    val pows = (1 to 200).map(i => math.pow(2.0, i)).toDF("v")
    val rp = graft.ops.Explore.benford(pows, $"v").collect()
    val mad = rp.map(r => math.abs(r.getAs[Double]("share") -
      r.getAs[Double]("expected_share"))).sum / 9
    assert(mad < 0.01, s"MAD $mad — 2^i should conform")
    // chisq_term closes over (share, expected): recompute one cell
    val c1 = rp.head
    assert(math.abs(c1.getAs[Double]("chisq_term") -
      200.0 * math.pow(c1.getAs[Double]("share") -
        c1.getAs[Double]("expected_share"), 2) /
        c1.getAs[Double]("expected_share")) < 1e-9)
    intercept[IllegalArgumentException] {
      graft.ops.Explore.benford(Seq(0.0, 0.0).toDF("v"), $"v").collect() }
    // gateway verb
    pows.createOrReplaceTempView("ben_t")
    assert(GraftGateway.sql(spark, "SELECT benford(v) FROM ben_t")
      .count() == 9)
  }

  test("weightedTtest: hand Hajek means/variance, guards") {
    // arm 0: (y=1,w=1),(y=3,w=3) -> mu 2.5, V 0.28125, ESS 1.6
    // arm 1: (y=2,w=2),(y=4,w=2) -> mu 3.0, V 0.5, ESS 2.0
    val df = Seq((0, 1.0, 1.0), (0, 3.0, 3.0), (1, 2.0, 2.0), (1, 4.0, 2.0))
      .toDF("t", "y", "w")
    val r = graft.ops.SimpleTests.weightedTtest(df, $"y", $"t", $"w").head()
    assert(math.abs(r.getAs[Double]("mean0") - 2.5) < 1e-12, r.toString)
    assert(math.abs(r.getAs[Double]("mean1") - 3.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("ess0") - 1.6) < 1e-12)
    assert(math.abs(r.getAs[Double]("ess1") - 2.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("se") - math.sqrt(0.28125 + 0.5)) < 1e-12)
    assert(math.abs(r.getAs[Double]("diff") - 0.5) < 1e-12)
    // unit weights: means reduce to the plain arithmetic means
    val unit = df.withColumn("w", lit(1.0))
    val ru = graft.ops.SimpleTests.weightedTtest(unit, $"y", $"t", $"w").head()
    assert(math.abs(ru.getAs[Double]("mean0") - 2.0) < 1e-12)
    assert(math.abs(ru.getAs[Double]("ess0") - 2.0) < 1e-12)
    // guards: negative weight; zero-weight arm
    val e = intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.weightedTtest(
        Seq((0, 1.0, -1.0), (1, 1.0, 1.0)).toDF("t", "y", "w"),
        $"y", $"t", $"w").head() }
    assert(e.getMessage.contains("negative weight"), e.getMessage)
    intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.weightedTtest(
        Seq((0, 1.0, 0.0), (0, 2.0, 0.0), (1, 1.0, 1.0), (1, 2.0, 1.0))
          .toDF("t", "y", "w"), $"y", $"t", $"w").head() }
    // gateway verb
    df.createOrReplaceTempView("wtt_t")
    val viaSql = GraftGateway.sql(spark,
      "SELECT weighted_ttest(y, t, w) FROM wtt_t")
    assert(viaSql.columns.toSeq == Seq("n0", "n1", "ess0", "ess1", "mean0",
      "mean1", "diff", "se", "z", "p_value"))
  }

  test("gini: closed-form limits, hand case, top shares, guards") {
    // equal values -> 0; one holder -> (n-1)/n; 1..4 -> 0.25
    val eq = (1 to 10).map(i => i.toLong -> 5.0).toDF("id", "v")
    assert(math.abs(graft.ops.Explore.gini(eq, $"v").head()
      .getAs[Double]("gini")) < 1e-12)
    val one = Seq(0.0, 0.0, 0.0, 10.0).toDF("v")
    val r1 = graft.ops.Explore.gini(one, $"v").head()
    assert(math.abs(r1.getAs[Double]("gini") - 0.75) < 1e-12)
    val asc = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val ra = graft.ops.Explore.gini(asc.repartition(3), $"v").head()
    assert(math.abs(ra.getAs[Double]("gini") - 0.25) < 1e-12)
    assert(math.abs(ra.getAs[Double]("total") - 10.0) < 1e-12)
    // top shares: 200 rows of 1..200 -> top 20 rows hold sum(181..200),
    // top 2 rows hold 199+200
    val big = (1 to 200).map(_.toDouble).toDF("v").repartition(7)
    val rb = graft.ops.Explore.gini(big, $"v").head()
    val tot = 200.0 * 201 / 2
    assert(math.abs(rb.getAs[Double]("top10_share") -
      (181 to 200).sum / tot) < 1e-12, rb.toString)
    assert(math.abs(rb.getAs[Double]("top1_share") - (199 + 200) / tot) < 1e-12)
    // guards: negative values, zero total, n < 2
    val e = intercept[IllegalArgumentException] {
      graft.ops.Explore.gini(Seq(-1.0, 2.0).toDF("v"), $"v").head() }
    assert(e.getMessage.contains("negative"), e.getMessage)
    intercept[IllegalArgumentException] {
      graft.ops.Explore.gini(Seq(0.0, 0.0).toDF("v"), $"v").head() }
    // gateway verb
    big.createOrReplaceTempView("gini_t")
    val viaSql = GraftGateway.sql(spark, "SELECT gini(v) FROM gini_t")
    assert(viaSql.columns.toSeq == Seq("n", "total", "mean", "gini",
      "top1_share", "top10_share"))
  }

  test("rmst: hand integral + variance, horizon clamp, groups, guards") {
    // no censoring, horizon past the last event: RMST = the sample mean
    // (area = 1*1 + .75 + .5 + .25 = 2.5), variance by hand:
    // A_j terms 1.5/0.75/0.25 -> 0.1875 + 0.09375 + 0.03125 = 0.3125
    val d4 = Seq((1.0, 1), (2.0, 1), (3.0, 1), (4.0, 1)).toDF("t", "e")
    val r = graft.ops.Survival.rmst(d4, $"t", $"e", tau = 10.0).head()
    assert(math.abs(r.getAs[Double]("rmst") - 2.5) < 1e-12, r.toString)
    assert(math.abs(r.getAs[Double]("se") - math.sqrt(0.3125)) < 1e-12)
    assert(r.getAs[Long]("n") == 4 && r.getAs[Long]("events") == 4)
    // horizon inside the curve: tau = 2.5 -> 1 + .75 + .5*0.5 = 2.0
    val r2 = graft.ops.Survival.rmst(d4, $"t", $"e", tau = 2.5).head()
    assert(math.abs(r2.getAs[Double]("rmst") - 2.0) < 1e-12)
    // horizon before the first event: flat 1 on [0, tau] -> rmst = tau, se 0
    val r3 = graft.ops.Survival.rmst(d4, $"t", $"e", tau = 0.5).head()
    assert(math.abs(r3.getAs[Double]("rmst") - 0.5) < 1e-12)
    assert(r3.getAs[Double]("se") == 0.0)
    // censoring reduces events and widens nothing incorrectly (se > 0)
    val cen = Seq((1.0, 1), (2.0, 0), (3.0, 1), (4.0, 1)).toDF("t", "e")
    val rc = graft.ops.Survival.rmst(cen, $"t", $"e", tau = 10.0).head()
    assert(rc.getAs[Long]("events") == 3 && rc.getAs[Double]("se") > 0)
    // KM with the censored-at-2 subject: S(1)=.75, S(3)=.375, S(4)=0
    // area = 1 + .75*2 + .375*1 = 2.875
    assert(math.abs(rc.getAs[Double]("rmst") - 2.875) < 1e-12, rc.toString)
    // grouped: the worse arm must have the smaller rmst
    val two = ((1 to 50).map(i => ("a", i % 5 + 1.0, 1)) ++
      (1 to 50).map(i => ("b", i % 10 + 1.0, 1))).toDF("g", "t", "e")
    val rg = graft.ops.Survival.rmst(two, $"t", $"e", tau = 12.0, group = $"g")
      .collect().map(x => x.getAs[String]("group") ->
        x.getAs[Double]("rmst")).toMap
    assert(rg("a") < rg("b"))
    // guards: negative time, bad tau
    intercept[IllegalArgumentException] {
      graft.ops.Survival.rmst(
        Seq((-1.0, 1), (2.0, 1)).toDF("t", "e"), $"t", $"e", 5.0).head() }
    intercept[IllegalArgumentException] {
      graft.ops.Survival.rmst(d4, $"t", $"e", tau = -1.0) }
    // gateway verb
    d4.createOrReplaceTempView("rmst_t")
    val viaSql = GraftGateway.sql(spark, "SELECT rmst(t, e, 10.0) FROM rmst_t")
    assert(viaSql.columns.toSeq == Seq("group", "tau", "n", "events",
      "rmst", "se", "lower", "upper"))
    assert(math.abs(viaSql.head().getAs[Double]("rmst") - 2.5) < 1e-12)
  }

  test("changepoint: hand CUSUM, planted shift, null p, guards") {
    // exact hand case: y = (0,0,0,6,6,6) over periods 1..6 -> C path
    // (-3,-6,-9,-6,-3,0), break after period 3, Q = 9/(sd*sqrt(6))
    val hand = Seq((1L, 0.0), (2L, 0.0), (3L, 0.0),
      (4L, 6.0), (5L, 6.0), (6L, 6.0)).toDF("p", "y")
    val r = graft.ops.Drift.changepoint(hand, $"p", $"y").head()
    assert(r.getAs[Long]("change_period") == 3L)
    val sd = math.sqrt(54.0 / 5)
    val q = 9.0 / (sd * math.sqrt(6.0))
    assert(math.abs(r.getAs[Double]("stat") - q) < 1e-12)
    val pExp = math.min(1.0, 2.0 * (1 to 100).map(k =>
      (if (k % 2 == 1) 1.0 else -1.0) * math.exp(-2.0 * k * k * q * q)).sum)
    assert(math.abs(r.getAs[Double]("p_value") - pExp) < 1e-12)
    assert(math.abs(r.getAs[Double]("mean_before")) < 1e-12)
    assert(math.abs(r.getAs[Double]("shift") - 6.0) < 1e-12)
    // planted +4 shift under bounded noise at period 25 of 40: located
    // exactly, p effectively zero, shift within the noise envelope
    val series = (1 to 40).map { p =>
      (p.toLong, (if (p >= 25) 14.0 else 10.0) +
        ((p * 2654435761L) % 100) / 1000.0) }.toDF("p", "y")
    val rs = graft.ops.Drift.changepoint(series, $"p", $"y").head()
    assert(rs.getAs[Long]("change_period") == 24L, rs.toString)
    assert(rs.getAs[Double]("p_value") < 1e-6)
    assert(math.abs(rs.getAs[Double]("shift") - 4.0) < 0.1)
    // no change: same bounded noise, no planted shift -> not significant
    val flat = (1 to 40).map { p =>
      (p.toLong, 10.0 + ((p * 2654435761L) % 100) / 100.0) }.toDF("p", "y")
    val rf = graft.ops.Drift.changepoint(flat, $"p", $"y").head()
    assert(rf.getAs[Double]("p_value") > 0.05, rf.toString)
    // row-scale input collapses to period cells first (avg within period)
    val dup = hand.unionByName(hand)
    val rd = graft.ops.Drift.changepoint(dup, $"p", $"y").head()
    assert(rd.getAs[Long]("change_period") == 3L &&
      rd.getAs[Long]("n_periods") == 6L)
    // guards: too few periods, constant metric
    intercept[IllegalArgumentException] {
      graft.ops.Drift.changepoint(hand.limit(3), $"p", $"y").head() }
    val e = intercept[IllegalArgumentException] {
      graft.ops.Drift.changepoint(
        Seq((1L, 2.0), (2L, 2.0), (3L, 2.0), (4L, 2.0)).toDF("p", "y"),
        $"p", $"y").head() }
    assert(e.getMessage.contains("constant"), e.getMessage)
    // gateway verb
    hand.createOrReplaceTempView("cp_t")
    val viaSql = GraftGateway.sql(spark, "SELECT changepoint(p, y) FROM cp_t")
    assert(viaSql.columns.toSeq == Seq("n_periods", "change_period",
      "stat", "p_value", "mean_before", "mean_after", "shift"))
    assert(viaSql.head().getAs[Long]("change_period") == 3L)
  }

  test("interruptedTimeSeries: exact level+slope recovery, guards") {
    // noise-free two-segment series: level jumps +5, slope 0.2 -> 0.7 at
    // t = 50 — segmented OLS is exact, both contrasts recovered to fp
    val grid = (0 to 100).map { i =>
      val t = i.toDouble
      val y = if (t >= 50) 10.0 + 5.0 + 0.2 * 50 + 0.7 * (t - 50)
        else 10.0 + 0.2 * t
      (t, y)
    }
    val df = grid.toDF("t", "y")
    val r = graft.ops.Regression.interruptedTimeSeries(df, $"y", $"t", 50.0)
      .head()
    assert(r.getAs[Long]("n_pre") == 50 && r.getAs[Long]("n_post") == 51)
    assert(math.abs(r.getAs[Double]("level_change") - 5.0) < 1e-9, r.toString)
    assert(math.abs(r.getAs[Double]("slope_change") - 0.5) < 1e-9)
    assert(math.abs(r.getAs[Double]("slope_pre") - 0.2) < 1e-9)
    assert(math.abs(r.getAs[Double]("level_pre") - 20.0) < 1e-9)
    assert(r.getAs[Double]("se_level") < 1e-6 && r.getAs[Double]("se_slope") < 1e-6)
    // deterministic bounded noise: CIs must cover the planted contrasts
    val noisy = df.withColumn("y",
      $"y" + pmod(xxhash64($"t"), lit(1000)).cast("double") / 1000.0 - 0.5)
    val rn = graft.ops.Regression.interruptedTimeSeries(noisy, $"y", $"t",
      50.0).head()
    assert(math.abs(rn.getAs[Double]("level_change") - 5.0) <
      1.96 * rn.getAs[Double]("se_level") + 0.3)
    assert(math.abs(rn.getAs[Double]("slope_change") - 0.5) <
      1.96 * rn.getAs[Double]("se_slope") + 0.05)
    // guards: thin segment, degenerate times
    val e = intercept[IllegalArgumentException] {
      graft.ops.Regression.interruptedTimeSeries(
        df.filter($"t" < 50), $"y", $"t", 50.0).head() }
    assert(e.getMessage.contains("post"), e.getMessage)
    // gateway verb
    df.createOrReplaceTempView("its_t")
    val viaSql = GraftGateway.sql(spark,
      "SELECT interrupted_time_series(y, t, 50.0) FROM its_t")
    assert(viaSql.columns.toSeq == Seq("n_pre", "n_post", "level_pre",
      "level_post", "level_change", "se_level", "z_level", "slope_pre",
      "slope_post", "slope_change", "se_slope", "z_slope"))
    assert(math.abs(viaSql.head().getAs[Double]("slope_change") - 0.5) < 1e-9)
  }

  test("icc: ANOVA estimator limits, hand case, guards") {
    // perfect clustering: constant within, varying between -> rho = 1,
    // DEFF = average cluster size
    val perfect = Seq(("a", 1.0), ("a", 1.0), ("a", 1.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0)).toDF("c", "y")
    val rp = graft.ops.SimpleTests.icc(perfect, $"y", $"c").head()
    assert(math.abs(rp.getAs[Double]("icc") - 1.0) < 1e-12)
    assert(math.abs(rp.getAs[Double]("deff") - 3.0) < 1e-12)
    assert(math.abs(rp.getAs[Double]("n_effective") - 2.0) < 1e-12)
    // identical within-cluster patterns: MSB = 0 -> rho = -1/(m0-1),
    // DEFF clamps the negative estimate to 1 (never claims FREE precision)
    val anti = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0),
      ("b", 1.0), ("b", 2.0), ("b", 3.0)).toDF("c", "y")
    val ra = graft.ops.SimpleTests.icc(anti, $"y", $"c").head()
    assert(math.abs(ra.getAs[Double]("msb")) < 1e-12)
    assert(math.abs(ra.getAs[Double]("icc") - (-0.5)) < 1e-12)
    assert(math.abs(ra.getAs[Double]("deff") - 1.0) < 1e-12)
    // unbalanced hand case: clusters {0,2}, {4}, {6,8,10} — replicate the
    // ANOVA sums by hand
    val hand = Seq(("a", 0.0), ("a", 2.0), ("b", 4.0),
      ("c", 6.0), ("c", 8.0), ("c", 10.0)).toDF("c", "y")
    val rh = graft.ops.SimpleTests.icc(hand, $"y", $"c").head()
    val n = 6.0; val k = 3.0
    val sb = (2.0 * 2.0 / 2) + (4.0 * 4.0 / 1) + (24.0 * 24.0 / 3)
    val ssb = sb - 30.0 * 30.0 / n
    val ssw = (0 + 4 + 16 + 36 + 64 + 100) - sb
    val msb = ssb / (k - 1); val msw = ssw / (n - k)
    val m0 = (n - (4.0 + 1.0 + 9.0) / n) / (k - 1)
    val rho = (msb - msw) / (msb + (m0 - 1) * msw)
    assert(math.abs(rh.getAs[Double]("icc") - rho) < 1e-12)
    assert(math.abs(rh.getAs[Double]("m0") - m0) < 1e-12)
    assert(math.abs(rh.getAs[Double]("deff") - (1 + (2 - 1) * rho)) < 1e-12)
    assert(rh.getAs[Long]("n") == 6 && rh.getAs[Long]("n_clusters") == 3)
    // guards: one cluster; all-singleton clusters
    intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.icc(perfect.filter($"c" === "a"), $"y", $"c")
        .head() }
    val e = intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.icc(
        Seq(("a", 1.0), ("b", 2.0)).toDF("c", "y"), $"y", $"c").head() }
    assert(e.getMessage.contains("single row"), e.getMessage)
    // gateway verb
    hand.createOrReplaceTempView("icc_t")
    val viaSql = GraftGateway.sql(spark, "SELECT icc(y, c) FROM icc_t")
    assert(viaSql.columns.toSeq == Seq("n", "n_clusters", "m_bar", "m0",
      "msb", "msw", "icc", "deff", "n_effective"))
    assert(math.abs(viaSql.head().getAs[Double]("icc") - rho) < 1e-12)
  }

  test("stratifiedAte: hand-computed blocked estimator, guards") {
    // 2 strata with DIFFERENT within-stratum effects and sizes; the
    // blocked estimator must weight by stratum size, not arm size
    val rows =
      (1 to 40).map(i => ("a", i % 2, 10.0 + (i % 2) * 2.0 + (i % 4) / 2)) ++
      (1 to 20).map(i => ("b", i % 2, 50.0 + (i % 2) * 5.0 + (i % 4) / 2))
    val df = rows.toDF("s", "t", "y")
    val r = graft.ops.SimpleTests.stratifiedAte(df, $"y", $"t", $"s").head()
    assert(r.getAs[Long]("n") == 60 && r.getAs[Long]("n_strata") == 2)
    // per-stratum diffs are exactly the planted 2.0 and 5.0 (the (i%4)/2
    // noise term has identical arm distributions within each stratum)
    val ate = r.getAs[Double]("ate")
    assert(math.abs(ate - (40.0 / 60 * 2.0 + 20.0 / 60 * 5.0)) < 1e-9, ate)
    val se = r.getAs[Double]("se")
    // closed form: w² (v1/n1 + v0/n0) summed over strata
    def vs(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    }
    val byCell = rows.groupBy(x => (x._1, x._2))
      .map { case (k, v) => k -> v.map(_._3.toDouble) }
    val seExp = math.sqrt(
      math.pow(40.0 / 60, 2) * (vs(byCell(("a", 1))) / 20 + vs(byCell(("a", 0))) / 20) +
      math.pow(20.0 / 60, 2) * (vs(byCell(("b", 1))) / 10 + vs(byCell(("b", 0))) / 10))
    assert(math.abs(se - seExp) < 1e-9, s"$se vs $seExp")
    assert(math.abs(r.getAs[Double]("z") - ate / se) < 1e-9)
    // a stratum missing an arm is a named error, not a null in the sum
    val oneArm = df.filter(!($"s" === "b" && $"t" === 1))
    val e = intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.stratifiedAte(oneArm, $"y", $"t", $"s").head()
    }
    assert(e.getMessage.contains("coarsen"), e.getMessage)
    val badT = Seq(("a", 2, 1.0), ("a", 0, 2.0)).toDF("s", "t", "y")
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.stratifiedAte(badT, $"y", $"t", $"s").head()
    }
    assert(e2.getMessage.contains("outside"), e2.getMessage)
    // gateway verb
    df.createOrReplaceTempView("strat_t")
    val viaSql = GraftGateway.sql(spark,
      "SELECT stratified_ate(y, t, s) FROM strat_t")
    assert(viaSql.columns.toSeq ==
      Seq("n", "n_strata", "ate", "se", "z", "p_value"))
    assert(math.abs(viaSql.head().getAs[Double]("ate") - ate) < 1e-12)
  }
}
