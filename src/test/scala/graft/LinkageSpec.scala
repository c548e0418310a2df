package graft

import graft.ops.Linkage
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LinkageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("blockedFuzzyJoin: within-block edit-distance pairs, exact set") {
    val left = Seq((1L, "b1", "kitten"), (2L, "b1", "hello"),
      (3L, "b2", "kitten"), (4L, null.asInstanceOf[String], "kitten"))
      .toDF("id", "blk", "k")
    val right = Seq((10L, "b1", "mitten"), (11L, "b1", "help"),
      (12L, "b2", "sitting"), (13L, "b1", "kitten"))
      .toDF("id", "blk", "k")
    val got = Linkage.blockedFuzzyJoin(left, right,
        $"id", $"blk", $"k", $"id", $"blk", $"k", maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    // kitten-mitten 1, kitten-kitten 0, hello-help 2 in b1; b2's
    // kitten-sitting is 3 (dropped); null block never matches
    assert(got == Set((1L, 10L, 1), (1L, 13L, 0), (2L, 11L, 2)))
  }

  test("blockedFuzzyJoin: hot-block product is a named error") {
    val left = (1 to 60).map(i => (i.toLong, "hot", s"k$i")).toDF("id", "b", "k")
    val e = intercept[IllegalArgumentException] {
      Linkage.blockedFuzzyJoin(left, left, $"id", $"b", $"k",
        $"id", $"b", $"k", maxDist = 1, maxBlockProduct = 1000)
    }
    assert(e.getMessage.contains("maxBlockProduct"))
    // under the cap it runs: every key matches itself (+ one-digit twins)
    val n = Linkage.blockedFuzzyJoin(left, left, $"id", $"b", $"k",
      $"id", $"b", $"k", maxDist = 0, maxBlockProduct = 3600).count()
    assert(n == 60)
  }
}
