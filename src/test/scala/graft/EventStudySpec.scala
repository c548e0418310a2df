package graft

import graft.ops.EventStudy
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventStudySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // balanced staggered panel: common time trend + unit fixed effects
  // (both difference out EXACTLY in the CS double difference) + planted
  // dynamic effects: cohort 4 gains 2 + 0.5e from t >= 4, cohort 6 gains
  // 1.0 from t >= 6, never-treated cohort 0 untouched
  private def effect(g: Long, t: Long): Double =
    if (g == 4L && t >= 4) 2.0 + 0.5 * (t - 4)
    else if (g == 6L && t >= 6) 1.0
    else 0.0

  private lazy val panel = {
    val rows = for {
      u <- 0 until 90
      t <- 1L to 8L
    } yield {
      val g = (u % 3) match { case 0 => 0L; case 1 => 4L; case 2 => 6L }
      val common = 10.0 + 1.5 * t + 0.2 * t * t
      val fe = (u % 7) * 0.9
      (u.toLong, g, t, common + fe + effect(g, t))
    }
    rows.toDF("u", "g", "t", "y").repartition(6)
  }

  test("groupTimeAtt recovers planted dynamic effects exactly; pre-periods are 0") {
    val att = EventStudy.groupTimeAtt(panel, $"g", $"t", $"y").collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3), r.getDouble(4))).toMap
    // cohort 4: base period 3 excluded; 1..2 pre, 4..8 dynamic
    (1L to 8L).filter(_ != 3L).foreach { t =>
      val (e, isPre, a) = att((4L, t))
      assert(e == t - 4 && isPre == (t < 4))
      assert(math.abs(a - effect(4L, t)) < 1e-9, s"ATT(4,$t) = $a")
    }
    (1L to 8L).filter(_ != 5L).foreach { t =>
      val (_, _, a) = att((6L, t))
      assert(math.abs(a - effect(6L, t)) < 1e-9, s"ATT(6,$t) = $a")
    }
    assert(att.size == 14) // 7 periods per cohort (8 minus the base)
  }

  test("eventTimeCurve aggregates cohorts by size; guards name the gaps") {
    val curve = EventStudy.eventTimeCurve(panel, $"g", $"t", $"y").collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getLong(3))).toMap
    // e = 0: cohorts 4 (att 2.0, 240 rows) and 6 (att 1.0, 240 rows)
    assert(curve(0L)._2 == 2 && math.abs(curve(0L)._1 - 1.5) < 1e-9)
    // e = 4: only cohort 4 is observed that far out
    assert(curve(4L)._2 == 1 && math.abs(curve(4L)._1 - 4.0) < 1e-9)
    // missing base period: drop period 3 so cohort 4 has no anchor
    val e1 = intercept[IllegalArgumentException] {
      EventStudy.groupTimeAtt(panel.filter($"t" =!= 3L), $"g", $"t", $"y")
    }
    assert(e1.getMessage.contains("base period"), e1.getMessage)
    // no never-treated cohort at all
    val e2 = intercept[IllegalArgumentException] {
      EventStudy.groupTimeAtt(panel.filter($"g" > 0), $"g", $"t", $"y")
    }
    assert(e2.getMessage.contains("never-treated"), e2.getMessage)
    // gateway verbs
    panel.createOrReplaceTempView("es_t")
    assert(GraftGateway.sql(spark,
      "SELECT event_study(g, t, y) FROM es_t").count() == 14)
    assert(GraftGateway.sql(spark,
      "SELECT event_study_curve(g, t, y) FROM es_t").count() > 5)
  }

  test("unit mode: delta estimator matches the cell form on a balanced panel " +
      "and its CI covers the planted effect") {
    // deterministic unit-level noise so the delta variance is nonzero
    val noisy = panel.withColumn("y",
      $"y" + (($"u" * 31 + $"t" * 17) % 7).cast("double") * 0.05)
    val cell = EventStudy.groupTimeAtt(noisy, $"g", $"t", $"y").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    val delta = EventStudy.groupTimeAtt(noisy, $"g", $"t", $"y",
      unit = Some($"u")).collect()
    delta.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      // balanced panel: unit-delta mean == cell double difference exactly
      assert(math.abs(r.getDouble(4) - cell(key)) < 1e-9, s"att mismatch $key")
      val (att, se) = (r.getDouble(4), r.getDouble(5))
      val (lo, hi) = (r.getDouble(6), r.getDouble(7))
      assert(se > 0 && lo < att && att < hi, s"CI shape $key: $lo $att $hi")
      // the deterministic noise is bounded by 0.35, so every 95% CI must
      // cover the PLANTED effect (pre-periods: zero)
      val planted = effect(r.getLong(0), r.getLong(1))
      assert(lo <= planted && planted <= hi,
        s"CI [$lo, $hi] misses planted $planted at $key")
      assert(r.getLong(8) == 30, "n_rows = treated units per cohort")
    }
    assert(delta.length == 14)
    // no unit spans (base, t): cohort-4 unit 1000 holds ONLY the base
    // period, unit 1001 only the non-base periods — the cells all exist
    // but the delta join is empty, which must be a named error
    val disjoint = panel.filter($"g" === 0L).unionByName(
      (Seq((1000L, 4L, 3L, 1.0)) ++
        (1L to 8L).filter(_ != 3).map(t => (1001L, 4L, t, 2.0)))
        .toDF("u", "g", "t", "y"))
    val e = intercept[IllegalArgumentException] {
      EventStudy.groupTimeAtt(disjoint, $"g", $"t", $"y", unit = Some($"u"))
    }
    assert(e.getMessage.contains("observed at both"), e.getMessage)
    // 4-arg gateway verb surfaces the se columns
    noisy.createOrReplaceTempView("es_u")
    val viaSql = GraftGateway.sql(spark,
      "SELECT event_study(u, g, t, y) FROM es_u")
    assert(viaSql.columns.toSeq == Seq("cohort", "period", "event_time",
      "is_pre", "att", "se", "lower", "upper", "n_rows"))
    assert(viaSql.filter($"se".isNull).count() == 0)
  }
}
