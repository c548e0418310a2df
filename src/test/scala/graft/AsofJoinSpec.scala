package graft

import graft.ops.AsofJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // left: (key, ts, tag)  right: (key, ts, v, rid) — ts in "nanos" (1e9/sec)
  private def L(rows: (String, Long, String)*) =
    rows.toDF("k", "lts", "tag")
  private def R(rows: (String, Long, Double, Long)*) =
    rows.toDF("k", "rts", "v", "rid")

  test("backward: latest right <= left per key; left-outer on no match") {
    val left = L(("a", 100L, "p1"), ("a", 250L, "p2"), ("b", 50L, "p3"))
    val right = R(("a", 90L, 1.0, 1L), ("a", 200L, 2.0, 2L), ("b", 60L, 9.0, 3L))
    val out = AsofJoin.asof(left, right, Seq("k"), "lts", "rts", Seq("v"))
      .orderBy("tag").collect()
    assert(out.map(r => Option(r.getAs[Double]("asof_v"))).toSeq ==
      Seq(Some(1.0), Some(2.0), None)) // b@50 precedes b@60 → no match
    assert(out(1).getAs[Long]("asof_ts") == 200L)
  }

  test("equal timestamps: simultaneous right row IS visible (<=)") {
    val out = AsofJoin.asof(
      L(("a", 100L, "p")), R(("a", 100L, 5.0, 1L)),
      Seq("k"), "lts", "rts", Seq("v")).collect()
    assert(out.head.getAs[Double]("asof_v") == 5.0)
  }

  test("tie among right rows at same ts: tieBreak decides, later id wins") {
    val right = R(("a", 100L, 1.0, 1L), ("a", 100L, 2.0, 2L))
    val out = AsofJoin.asof(L(("a", 150L, "p")), right,
      Seq("k"), "lts", "rts", Seq("v"), tieBreak = Some(col("rid"))).collect()
    assert(out.head.getAs[Double]("asof_v") == 2.0)
  }

  test("forward: earliest right >= left; tolerance filters far matches") {
    val left = L(("a", 100L, "p1"), ("a", 300L, "p2"))
    val right = R(("a", 150L, 1.0, 1L), ("a", 5000000000L, 2.0, 2L))
    val out = AsofJoin.asof(left, right, Seq("k"), "lts", "rts", Seq("v"),
      direction = "forward").orderBy("tag").collect()
    assert(out(0).getAs[Double]("asof_v") == 1.0)  // earliest >= 100 is 150
    assert(out(1).getAs[Double]("asof_v") == 2.0)  // only the far one >= 300
    val tol = AsofJoin.asof(left, right, Seq("k"), "lts", "rts", Seq("v"),
      direction = "forward", toleranceSeconds = Some(1.0)).orderBy("tag").collect()
    assert(tol(0).getAs[Double]("asof_v") == 1.0)  // 50ns gap < 1s
    assert(tol(1).isNullAt(tol(1).fieldIndex("asof_v"))) // ~5s gap > 1s
  }

  test("null keys never cross-match; null left ts yields null payload") {
    val left = Seq((null.asInstanceOf[String], 100L, "pnullk"))
      .toDF("k", "lts", "tag")
      .union(Seq(("a", null.asInstanceOf[java.lang.Long], "pnullt"))
        .toDF("k", "lts", "tag"))
    val right = Seq((null.asInstanceOf[String], 50L, 7.0, 1L),
      ("a", 50L, 8.0, 2L)).toDF("k", "rts", "v", "rid")
    val out = AsofJoin.asof(left, right, Seq("k"), "lts", "rts", Seq("v"))
      .orderBy("tag").collect()
    assert(out.length == 2 &&
      out.forall(r => r.isNullAt(r.fieldIndex("asof_v"))))
  }

  test("left columns and row count survive untouched (100-row fuzz vs sort-merge oracle)") {
    val rng = new scala.util.Random(7)
    val left = (1 to 100).map(i =>
      (s"k${rng.nextInt(5)}", rng.nextInt(1000).toLong, s"p$i")).toDF("k", "lts", "tag")
    val right = (1 to 200).map(i =>
      (s"k${rng.nextInt(5)}", rng.nextInt(1000).toLong, i.toDouble, i.toLong))
      .toDF("k", "rts", "v", "rid")
    val got = AsofJoin.asof(left, right, Seq("k"), "lts", "rts", Seq("v"),
        tieBreak = Some(col("rid")))
      .select("tag", "asof_v").as[(String, Option[Double])].collect().toMap
    // oracle: per-left-row argmax by (ts, rid) over right rows with rts <= lts
    val rrows = right.as[(String, Long, Double, Long)].collect()
    val lrows = left.as[(String, Long, String)].collect()
    assert(got.size == 100)
    lrows.foreach { case (k, lts, tag) =>
      val cands = rrows.filter(r => r._1 == k && r._2 <= lts)
      val want = if (cands.isEmpty) None
        else Some(cands.maxBy(r => (r._2, r._4))._3)
      assert(got(tag) == want, s"row $tag")
    }
  }
}
