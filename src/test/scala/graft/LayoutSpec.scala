package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("bucketed tables join with no shuffle on either side") {
    val left = spark.range(10000).select(
      col("id").as("k"), (col("id") * 2).as("lv"))
    val right = spark.range(5000).select(
      col("id").as("k"), (col("id") * 3).as("rv"))
    Layout.writeBucketed(left, "graft_bkt_l", "k", 8)
    Layout.writeBucketed(right, "graft_bkt_r", "k", 8)
    try {
      // disable broadcast so the no-shuffle property comes from bucketing,
      // not from a broadcast exchange
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val j = Layout.bucketedJoin(spark, "graft_bkt_l", "graft_bkt_r", "k")
        val plan = j.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
        assert(j.count() == 5000)
        val r = j.filter($"k" === 42).head()
        assert(r.getAs[Long]("lv") == 84 && r.getAs[Long]("rv") == 126)
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_l")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_r")
      ()
    }
  }

  test("salted join equals the plain join on skewed data") {
    // 90% of rows share one hot key
    val big = spark.range(20000).select(
      when(col("id") % 10 < 9, 7L).otherwise(col("id") % 100).as("k"),
      col("id").as("row_id"))
    val small = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("dim"))
    val plain = big.join(small, Seq("k"), "inner")
      .select($"row_id", $"dim").orderBy($"row_id").collect()
    val salted = Layout.saltedJoin(big, small, "k", salt = 8, bigId = Seq($"row_id"))
      .select($"row_id", $"dim").orderBy($"row_id").collect()
    assert(salted.length == plain.length)
    assert(salted.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
    // left join keeps unmatched big rows exactly once
    val bigMiss = big.withColumn("k", $"k" + 1000) // no matches
    val leftJ = Layout.saltedJoin(bigMiss, small, "k", salt = 4,
      bigId = Seq($"row_id"), joinType = "left")
    assert(leftJ.count() == 20000)
    assert(leftJ.filter($"dim".isNotNull).count() == 0)
  }
}
