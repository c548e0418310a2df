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
}
