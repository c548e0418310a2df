package graft

import graft.ops.Explore
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExploreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("histogram: hand-checked bins, empty bins emitted, max in last bin") {
    // values 0..9 into 5 bins of width 2: two per bin; 9 (the max) lands
    // in bin 4, not a phantom bin 5
    val d = (0 until 10).map(_.toDouble).toDF("x")
    val h = Explore.histogram(d, $"x", bins = 5).collect()
    assert(h.length == 5)
    assert(h.forall(_.getAs[Long]("count") == 2L))
    assert(h.map(_.getAs[Int]("bin")).toSeq == (0 until 5))
    assert(h.head.getAs[Double]("lo") == 0.0 && h.last.getAs[Double]("hi") == 9.0)
    // a gap leaves an explicit zero bin
    val g = Explore.histogram(Seq(0.0, 1.0, 9.0, 10.0).toDF("x"), $"x", 5)
      .collect().map(r => r.getAs[Int]("bin") -> r.getAs[Long]("count")).toMap
    assert(g(0) == 2L && g(1) == 0L && g(2) == 0L && g(3) == 0L && g(4) == 2L)
    // constant column: one degenerate bin holding everything
    val c = Explore.histogram(Seq(7.0, 7.0, 7.0).toDF("x"), $"x", 5).collect()
    assert(c.length == 1 && c.head.getAs[Long]("count") == 3L
      && c.head.getAs[Double]("lo") == 7.0)
    // nulls don't count; empty input errors
    val withNull = Seq[java.lang.Double](1.0, null, 3.0).toDF("x")
    assert(Explore.histogram(withNull, $"x", 2).agg(sum($"count"))
      .head().getLong(0) == 2L)
    intercept[IllegalArgumentException] {
      Explore.histogram(Seq.empty[Double].toDF("x"), $"x", 5)
    }
  }

  test("box_stats: five-number summary, whiskers clamp to range, outliers counted") {
    // 1..100 plus two whales: q1/median/q3 from linear interpolation
    val xs = (1 to 100).map(_.toDouble) ++ Seq(1000.0, 2000.0)
    val r = Explore.boxStats(xs.toDF("x"), $"x", exact = true).head()
    assert(r.getAs[Long]("n") == 102L)
    assert(r.getAs[Double]("min") == 1.0 && r.getAs[Double]("max") == 2000.0)
    val q1 = r.getAs[Double]("q1"); val q3 = r.getAs[Double]("q3")
    // index p*(n-1): 0.25*101 = 25.25 -> 26.25; 0.75*101 = 75.75 -> 76.75
    assert(math.abs(q1 - 26.25) < 1e-9 && math.abs(q3 - 76.75) < 1e-9)
    assert(math.abs(r.getAs[Double]("iqr") - (q3 - q1)) < 1e-12)
    // lower whisker clamps to min (q1 - 1.5*iqr < 1); upper stays inside
    assert(r.getAs[Double]("whisker_lo") == 1.0)
    val wHi = r.getAs[Double]("whisker_hi")
    assert(math.abs(wHi - (q3 + 1.5 * (q3 - q1))) < 1e-9)
    assert(r.getAs[Long]("n_outliers_lo") == 0L)
    assert(r.getAs[Long]("n_outliers_hi") == 2L) // the whales
    // approx path lands close on a smooth column
    val ap = Explore.boxStats((1 to 10000).map(_.toDouble).toDF("x"), $"x")
      .head()
    assert(math.abs(ap.getAs[Double]("median") - 5000.5) < 100)
  }

  test("histogramBy: shared global edges, per-group zero-fill") {
    // group a: 0..9, group b: 10..19 — edges span 0..19 for BOTH groups,
    // so each group's counts sit in its half and the other half zero-fills
    val d = ((0 until 10).map(i => ("a", i.toDouble)) ++
      (10 until 20).map(i => ("b", i.toDouble))).toDF("g", "x")
    val h = Explore.histogramBy(d, $"g", $"x", bins = 2)
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getAs[Long]("count"))
      .toMap
    assert(h.size == 4)
    assert(h(("a", 0)) == 10L && h(("a", 1)) == 0L)
    assert(h(("b", 0)) == 0L && h(("b", 1)) == 10L) // width 9.5: 10 -> bin 1
    // every group shares the same lo/hi edges
    val edges = Explore.histogramBy(d, $"g", $"x", bins = 2)
      .select("bin", "lo", "hi").distinct().count()
    assert(edges == 2L)
  }

  test("histogram and box_stats dispatch as gateway verbs") {
    (1 to 50).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
      .createOrReplaceTempView("explore_t")
    val h = GraftGateway.sql(spark, "SELECT histogram(v, 7) FROM explore_t")
    assert(h.count() == 7 &&
      h.agg(sum($"count")).head().getLong(0) == 50L)
    val b = GraftGateway.sql(spark,
      "SELECT box_stats(v, 'exact') FROM explore_t").head()
    assert(b.getAs[Long]("n") == 50L && b.getAs[Double]("median") == 25.5)
  }

  test("profileDiff: schema status and per-side shape metrics") {
    val oldDf = Seq((1L, Option("a"), 1.5), (2L, Option("b"), 2.5),
      (3L, Option.empty[String], 3.5)).toDF("id", "s", "x")
    val newDf = Seq((1L, 10, "u"), (2L, 20, "v")).toDF("id", "x", "z")
    val r = Explore.profileDiff(oldDf, newDf, exactDistinct = true)
      .collect().map(row => row.getString(0) -> row).toMap
    assert(r("id").getString(1) == "kept")
    assert(r("s").getString(1) == "removed" && r("s").isNullAt(5))
    assert(r("x").getString(1) == "type_changed")
    assert(r("z").getString(1) == "added" && r("z").isNullAt(4))
    assert(r("id").getLong(4) == 3 && r("id").getLong(5) == 2)
    assert(math.abs(r("s").getDouble(6) - 1.0 / 3) < 1e-12)
    assert(r("id").getString(10) == "1" && r("id").getString(11) == "1" &&
      r("id").getString(12) == "3" && r("id").getString(13) == "2")
    assert(r("x").getString(2) == "double" && r("x").getString(3) == "int")
    // gateway: the new release is a registered view, the FROM side is old
    oldDf.createOrReplaceTempView("pd_old")
    newDf.createOrReplaceTempView("pd_new")
    assert(GraftGateway.sql(spark,
      "SELECT profile_diff('pd_new', 'exact') FROM pd_old").count() == 4)
  }

  test("topK: exact in the bounded-domain regime, heavies survive eviction") {
    val small = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(2)("c") ++ Seq("d")
    val r = Explore.topK(small.toDF("x"), $"x", k = 3, maxTracked = 100)
      .collect()
    assert(r.map(x => (x.getInt(0), x.getString(1), x.getLong(2))).toSeq ==
      Seq((1, "a", 5L), (2, "b", 3L), (3, "c", 2L)), r.mkString(","))
    // eviction regime: ~40k-distinct tail + two ~5% heavies, 200 counters:
    // the sketch must keep the heavies with counts inside n/maxTracked
    val rng = new scala.util.Random(9)
    val big = (1 to 100000).map { i =>
      if (i % 20 == 0) "HEAVY1"
      else if (i % 21 == 0) "HEAVY2"
      else s"tail_${rng.nextInt(40000)}"
    }
    val r2 = Explore.topK(big.toDF("x").repartition(8), $"x",
      k = 2, maxTracked = 200).collect()
    assert(r2.map(_.getString(1)).toSet == Set("HEAVY1", "HEAVY2"),
      r2.mkString(","))
    r2.foreach { row =>
      val exact = big.count(_ == row.getString(1)).toLong
      assert(math.abs(row.getLong(2) - exact) <= 100000 / 200,
        s"$row vs exact $exact")
    }
    intercept[IllegalArgumentException] {
      Explore.topK(small.toDF("x"), $"x", k = 0)
    }
    small.toDF("x").createOrReplaceTempView("topk_t")
    assert(GraftGateway.sql(spark, "SELECT top_k(x, 2) FROM topk_t")
      .count() == 2)
  }
}
