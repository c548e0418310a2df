package graft

import graft.ops.TextOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextPiiSpec extends AnyFunSuite {
  test("gopherFilter names the first failing rule, keeps clean docs") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import graft.ops.TextOps
    val rules = TextOps.GopherRules(minTokens = 3, maxTokens = 6,
      minMeanWordLen = 2.0, maxMeanWordLen = 6.0,
      maxDupLineRatio = 0.4, maxTopBigramShare = 0.9,
      minStopwordRatio = 0.0)
    val docs = Seq(
      1L -> "the quick brown fox jumps",            // clean -> kept
      2L -> "hi yo",                                // 2 tokens -> too_few
      3L -> "a b c d e f g",                        // 7 tokens -> too_many
      4L -> "a b c",                                // mwl 1.0 -> word_len_low
      5L -> "elephantine gargantuan stupendous",    // mwl > 6 -> word_len_high
      6L -> "one two three\nx\nx\nx"                // dup lines -> dup_lines
    ).toDF("id", "text")
    val r = docs.select($"id", TextOps.gopherFilter($"text", rules).as("r"))
      .select($"id", $"r.keep", $"r.reason").collect()
      .map(x => x.getLong(0) -> (x.getBoolean(1), Option(x.getString(2)))).toMap
    assert(r(1L) == ((true, None)))
    assert(r(2L) == ((false, Some("too_few_tokens"))))
    assert(r(3L) == ((false, Some("too_many_tokens"))))
    assert(r(4L) == ((false, Some("mean_word_len_low"))))
    assert(r(5L) == ((false, Some("mean_word_len_high"))))
    assert(r(6L) == ((false, Some("dup_lines"))))
  }

  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("t").select(c.as("v")).collect().head.get(0)

  test("dupTokenRatio: repeats over total") {
    assert(one("a a b", TextOps.dupTokenRatio(col("t"))) == 1.0 - 2.0 / 3)
    assert(one("x y z", TextOps.dupTokenRatio(col("t"))) == 0.0)
  }

  test("dupLineRatio: blank lines ignored, duplicates counted") {
    val t = "foo\n\n  foo \nbar\nfoo"
    // lines after trim/blank-drop: foo, foo, bar, foo → 2 distinct of 4
    assert(one(t, TextOps.dupLineRatio(col("t"))) == 0.5)
  }

  test("topNgramShare: longest equal run over sorted n-grams") {
    // bigrams of "a b a b a": [a b, b a, a b, b a] → top 2/4
    assert(one("a b a b a", TextOps.topNgramShare(col("t"), 2)) == 0.5)
    // all-distinct bigrams → 1/3
    assert(one("p q r s", TextOps.topNgramShare(col("t"), 2)) == 1.0 / 3)
    // doc shorter than n: whole text is the single gram
    assert(one("only", TextOps.topNgramShare(col("t"), 3)) == 1.0)
  }

  test("redactPii replaces emails, IPs, phones with typed placeholders") {
    val t = "write a.user+x@sub.example.org from 192.168.0.1 or +44 20 7946 0958 now"
    assert(one(t, TextOps.redactPii(col("t"))) ==
      "write <EMAIL> from <IP> or <PHONE> now")
    assert(one(t, TextOps.emailCount(col("t"))) == 1)
    assert(one(t, TextOps.ipCount(col("t"))) == 1)
    assert(one(t, TextOps.phoneCount(col("t"))) == 1)
  }

  test("redactPii is a no-op on clean text and idempotent") {
    val clean = "no personal data here just words 42 and 3.14"
    assert(one(clean, TextOps.redactPii(col("t"))) == clean)
    val dirty = "mail me x@y.io"
    val once = one(dirty, TextOps.redactPii(col("t"))).toString
    assert(one(once, TextOps.redactPii(col("t"))) == once)
  }

  test("chunkDocuments: overlapping windows, short tail, empty doc drops") {
    val spark2 = spark
    import spark2.implicits._
    // 10 tokens a0..a9, chunkSize 4, overlap 1 -> starts 0,3,6,9:
    // [a0..a3] [a3..a6] [a6..a9] [a9]
    val d = Seq((1L, (0 until 10).map(i => s"a$i").mkString(" ")),
      (2L, "  "), (3L, "x y")).toDF("id", "text")
    val ch = TextOps.chunkDocuments(d, col("id"), col("text"),
        chunkSize = 4, overlap = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getInt(3))).toMap
    assert(ch.size == 5, ch.toString) // 4 chunks for doc 1, 1 for doc 3
    assert(ch((1L, 0)) == ("a0 a1 a2 a3", 4))
    assert(ch((1L, 1)) == ("a3 a4 a5 a6", 4))
    assert(ch((1L, 2)) == ("a6 a7 a8 a9", 4))
    assert(ch((1L, 3)) == ("a9", 1)) // short tail still emitted
    assert(ch((3L, 0)) == ("x y", 2))
    assert(!ch.keySet.exists(_._1 == 2L)) // token-less doc: no chunks
    // every token appears in at least one chunk; overlap duplicates 3
    val toks = ch.collect { case ((1L, _), (t, _)) => t.split(" ").toSeq }
      .toSeq.flatten
    assert(toks.length == 13 && toks.distinct.length == 10)
    intercept[IllegalArgumentException] {
      TextOps.chunkDocuments(d, col("id"), col("text"), 4, overlap = 4)
    }
    // gateway verb dispatch
    d.createOrReplaceTempView("chunk_t")
    val g = GraftGateway.sql(spark,
      "SELECT chunk_documents(id, text, 4, 1) FROM chunk_t")
    assert(g.count() == 5)
  }
}
