package graft

import graft.ops._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TfIdfFeatureSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------------------------------------------------------------- tfidf

  test("TfIdf.termScores: hand-checked tf/df/idf on a 3-doc corpus") {
    val docs = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry"),
      (3L, "banana banana banana")).toDF("id", "text")
    val s = TfIdf.termScores(docs, $"id", $"text")
      .collect().map(r => ((r.getLong(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // apple: df=2; banana: df=2; cherry: df=1; N=3
    val idf2 = math.log(4.0 / 3.0) + 1.0
    val idf1 = math.log(4.0 / 2.0) + 1.0
    assert(s((1L, "apple")) == ((2L, 3L, 2L, idf2)))
    assert(s((2L, "cherry")) == ((1L, 2L, 1L, idf1)))
    assert(s((3L, "banana"))._1 == 3L) // tf
    assert(s((3L, "banana"))._2 == 3L) // dl
  }

  test("TfIdf.termScores: bm25 saturates with tf, tfidf grows linearly") {
    val docs = Seq(
      (1L, "x x x x x x x x x x y"),
      (2L, "x y")).toDF("id", "text")
    val s = TfIdf.termScores(docs, $"id", $"text")
      .collect().map(r => ((r.getLong(0), r.getString(1)),
        (r.getDouble(6), r.getDouble(7)))).toMap
    val (tfidfHot, bm25Hot) = s((1L, "x"))
    val (tfidfOne, bm25One) = s((2L, "x"))
    assert(tfidfHot == 10.0 * tfidfOne) // linear in tf at equal idf
    assert(bm25Hot < 10.0 * bm25One)    // bm25 saturates
    assert(bm25Hot > bm25One)
  }

  test("TfIdf.topTerms: rank is dense per doc, ties break by token") {
    val docs = Seq(
      (1L, "b a c a b c"), // all tf=2, same idf -> alphabetical rank
      (2L, "z z z w")).toDF("id", "text")
    val top = TfIdf.topTerms(TfIdf.termScores(docs, $"id", $"text"), 2)
      .select($"doc_id", $"rank", $"token")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(top.contains((1L, 1, "a")) && top.contains((1L, 2, "b")))
    assert(top.contains((2L, 1, "z")))
  }

  // ------------------------------------------------------- feature_process

  test("featureProcess: minmax scaling, one-hot, assembly order") {
    val df = Seq(
      (0.0, 10.0, "r", 1.0),
      (5.0, 20.0, "g", 0.0),
      (10.0, 30.0, "r", 1.0)).toDF("a", "b", "color", "label")
    val (out, names) = Features.featureProcess(df, "label")
    assert(names == Seq("a_scaled", "b_scaled", "color_g", "color_r"))
    val rows = out.orderBy($"a").select($"features").collect()
      .map(_.getSeq[Double](0))
    assert(rows(0) == Seq(0.0, 0.0, 0.0, 1.0))
    assert(rows(1) == Seq(0.5, 0.5, 1.0, 0.0))
    assert(rows(2) == Seq(1.0, 1.0, 0.0, 1.0))
  }

  test("featureProcess: zscore, constant column scales to 0") {
    val df = Seq((1.0, 7.0, 0.0), (2.0, 7.0, 1.0), (3.0, 7.0, 0.0))
      .toDF("a", "c", "label")
    val (out, names) = Features.featureProcess(df, "label", scaleMethod = "zscore")
    assert(names == Seq("a_scaled", "c_scaled"))
    val rows = out.orderBy($"a").select($"features").collect()
      .map(_.getSeq[Double](0))
    assert(math.abs(rows(0).head + 1.0) < 1e-12) // (1-2)/1
    assert(rows.forall(_(1) == 0.0))             // constant col
  }

  test("featureProcess: over-cardinality categorical is dropped, nulls filled") {
    val df = Seq(
      (Some(1.0), Some("a"), "k1", 0.0), (None, Some("b"), "k2", 1.0),
      (Some(3.0), None, "k3", 0.0), (Some(4.0), Some("d"), "k4", 1.0),
      (Some(5.0), Some("a"), "k5", 0.0))
      .toDF("x", "cat", "hi_card", "label")
    val (out, names) = Features.featureProcess(df, "label", oneHotThreshold = 4)
    // hi_card has 5 distinct > 4 -> dropped; cat {a,b,d,NA} kept at the cap
    assert(!names.exists(_.startsWith("hi_card")))
    assert(names.contains("cat_NA"))
    val na = out.filter($"cat".isNull || $"cat" === "NA").count()
    assert(na == 1)
    // null numeric filled to 0 then scaled: min is 0 -> scales to 0
    val xs = out.select(element_at($"features", 1)).collect().map(_.getDouble(0))
    assert(xs.min == 0.0)
  }

  test("category-set aggregate state stays bounded on a row-scale-cardinality column") {
    // 120k distinct strings across 8 partitions: BoundedSetAgg holds at
    // most cap+1 of them at any stage (collect_set would hold all 120k in
    // the single global merge task); featureProcess drops the column,
    // keeps the small one, and the run completes in bounded memory
    val spark2 = spark
    import spark2.implicits._
    val n = 120000
    val df = spark.range(n).repartition(8)
      .select($"id".cast("double").as("x"),
        concat(lit("u"), $"id").as("hi_card"),
        (pmod($"id", lit(3))).cast("string").as("small"),
        pmod($"id", lit(2)).cast("double").as("label"))
    val (out, names) = Features.featureProcess(df, "label", oneHotThreshold = 5)
    assert(!names.exists(_.startsWith("hi_card")))
    assert(names.count(_.startsWith("small_")) == 3)
    assert(out.count() == n)
    // oneHot's cap check still fires on the same bounded state
    val e = intercept[IllegalArgumentException] {
      Features.oneHot(df.toDF(), Seq("hi_card"), maxCategories = 5)
    }
    assert(e.getMessage.contains("exceeds"))
    // the bounded set is complete (and sorted) when distinct <= cap
    val s = df.agg(graft.ops.Features.boundedSet(5, $"small").as("s"))
      .head().getSeq[String](0)
    assert(s == Seq("0", "1", "2"))
  }

  test("empty inputs raise named errors instead of silent zeros") {
    val emptyDocs = Seq.empty[(Long, String)].toDF("id", "text")
    intercept[IllegalArgumentException] {
      TfIdf.termScores(emptyDocs, $"id", $"text")
    }
    val emptyNum = Seq.empty[(Double, Double)].toDF("x", "label")
    intercept[IllegalArgumentException] {
      Features.featureProcess(emptyNum, "label")
    }
    intercept[IllegalArgumentException] {
      Robust.quantileBounds(emptyNum, $"x", 0.1, 0.9)
    }
  }

  test("featureProcess: rejects non-numeric label and bad scale method") {
    val df = Seq((1.0, "a", 0.0)).toDF("x", "cat", "label")
    intercept[IllegalArgumentException] {
      Features.featureProcess(df, "cat")
    }
    intercept[IllegalArgumentException] {
      Features.featureProcess(df, "label", scaleMethod = "bogus")
    }
  }
}
