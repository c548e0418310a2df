package graft

import graft.ops.Funnel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val log = Seq(
    // u1: clean A->B->C
    (1L, 1.0, "A"), (1L, 2.0, "B"), (1L, 3.0, "C"),
    // u2: C before B — sequential match stops at B
    (2L, 1.0, "A"), (2L, 2.0, "C"), (2L, 3.0, "B"),
    // u3: B before the anchor A doesn't count; the later B/C do
    (3L, 1.0, "B"), (3L, 2.0, "A"), (3L, 5.0, "B"), (3L, 6.0, "C"),
    // u4: B lands outside the window
    (4L, 1.0, "A"), (4L, 20.0, "B"),
    // u5: never enters the funnel
    (5L, 1.0, "C"),
    // u6: C outside the window
    (6L, 1.0, "A"), (6L, 2.0, "B"), (6L, 30.0, "C"))
    .toDF("u", "t", "e").repartition(4)

  test("funnel: sequential first-match semantics, window anchored at step 1") {
    val r = Funnel.funnel(log, $"u", $"t", $"e", Seq("A", "B", "C"),
      window = 10.0).collect().sortBy(_.getInt(0))
    assert(r.map(x => (x.getInt(0), x.getString(1), x.getLong(2))).toSeq ==
      Seq((1, "A", 5L), (2, "B", 4L), (3, "C", 2L)), r.mkString(","))
    assert(math.abs(r(1).getDouble(3) - 0.8) < 1e-12) // 4/5 of step 1
    assert(math.abs(r(2).getDouble(4) - 0.5) < 1e-12) // 2/4 of step 2
    intercept[IllegalArgumentException] {
      Funnel.funnel(log, $"u", $"t", $"e", Seq("A"), 10.0)
    }
    intercept[IllegalArgumentException] {
      Funnel.funnel(log, $"u", $"t", $"e", Seq("A", "A"), 10.0)
    }
    log.createOrReplaceTempView("funnel_t")
    val viaSql = GraftGateway.sql(spark,
      "SELECT funnel(u, t, e, 'A', 'B', 'C', 10) FROM funnel_t").collect()
    assert(viaSql.map(_.getLong(2)).toSeq == Seq(5L, 4L, 2L))
  }

  test("retentionMatrix: cohorts by first-seen period, offsets by presence") {
    val ev = Seq((1L, 1.0), (1L, 12.0), (1L, 35.0), (2L, 15.0), (2L, 22.0),
      (3L, 2.0), (3L, 5.0)).toDF("u", "t").repartition(3)
    val r = Funnel.retentionMatrix(ev, $"u", $"t", bucketLen = 10.0)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getLong(2), x.getDouble(3))).toMap
    assert(r == Map(
      (0L, 0L) -> (2L, 1.0), (0L, 1L) -> (1L, 0.5), (0L, 3L) -> (1L, 0.5),
      (1L, 0L) -> (1L, 1.0), (1L, 1L) -> (1L, 1.0)), r)
    ev.createOrReplaceTempView("ret_t")
    assert(GraftGateway.sql(spark,
      "SELECT retention(u, t, 10) FROM ret_t").count() == 5)
  }
}
