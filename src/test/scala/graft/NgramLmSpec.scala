package graft

import graft.ops.NgramLm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class NgramLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  // corpus: "a b" ×3, "a c" ×1 → V = 3 (a, b, c); c(a)=4, c(b)=3, c(c)=1
  // (unigrams count ALL tokens); c(a,b)=3, c(a,c)=1
  private lazy val corpus = (Seq.fill(3)("a b") ++ Seq("a c"))
    .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

  test("hand-checkable add-one bigram probabilities") {
    val m = NgramLm.train(corpus, $"text")
    assert(m.vocabSize == 3)
    val scored = NgramLm.scorePerplexity(corpus, $"id", $"text", m)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 0 "a b": logp = ln((3+1)/(4+3)) = ln(4/7)
    val lp0 = scored(0L).getAs[Double]("avg_logp")
    assert(approx(lp0, math.log(4.0 / 7.0)), s"got $lp0")
    assert(approx(scored(0L).getAs[Double]("perplexity"), 7.0 / 4.0))
    // doc 3 "a c": ln((1+1)/(4+3)) = ln(2/7) — rarer continuation,
    // higher perplexity
    assert(approx(scored(3L).getAs[Double]("avg_logp"), math.log(2.0 / 7.0)))
    assert(scored(3L).getAs[Double]("perplexity") >
      scored(0L).getAs[Double]("perplexity"))
  }

  test("unseen bigrams back off to zero counts; short docs drop") {
    val m = NgramLm.train(corpus, $"text")
    val probe = Seq((0L, "b a"), (1L, "z z"), (2L, "a")).toDF("id", "text")
    val scored = NgramLm.scorePerplexity(probe, $"id", $"text", m)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // "b a": c(b,a)=0, c(b)=3 → ln(1/6)
    assert(approx(scored(0L).getAs[Double]("avg_logp"), math.log(1.0 / 6.0)))
    // "z z": both unseen → ln((0+1)/(0+3))
    assert(approx(scored(1L).getAs[Double]("avg_logp"), math.log(1.0 / 3.0)))
    // single-token doc scores nothing
    assert(!scored.contains(2L))
  }

  test("unigram broadcast is guarded by vocab size; shuffled join agrees") {
    val m = NgramLm.train(corpus, $"text")
    // over the cap: fail fast naming the broadcastUnigrams=false escape
    val e = intercept[IllegalArgumentException] {
      NgramLm.scorePerplexity(corpus, $"id", $"text", m,
        maxBroadcastVocab = 2L)
    }
    assert(e.getMessage.contains("broadcastUnigrams=false"), e.getMessage)
    // the shuffled-join path is value-identical to the broadcast path
    val bc = NgramLm.scorePerplexity(corpus, $"id", $"text", m)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_logp")).toMap
    val sh = NgramLm.scorePerplexity(corpus, $"id", $"text", m,
        broadcastUnigrams = false)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_logp")).toMap
    assert(bc == sh, s"$bc vs $sh")
    // the guard is inert when not broadcasting
    assert(NgramLm.scorePerplexity(corpus, $"id", $"text", m,
      broadcastUnigrams = false, maxBroadcastVocab = 2L).count() == 4)
  }

  test("natural text ranks repeated boilerplate as lower perplexity") {
    val docs = (Seq.fill(20)("the quick brown fox jumps over the lazy dog") ++
      Seq("zebra quantum flux oscillates purple telemetry"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val m = NgramLm.train(docs, $"text")
    val scored = NgramLm.scorePerplexity(docs, $"id", $"text", m)
    val common = scored.filter($"doc_id" < 20).agg(avg($"perplexity")).head().getDouble(0)
    val rare = scored.filter($"doc_id" === 20).agg(avg($"perplexity")).head().getDouble(0)
    assert(common < rare, s"boilerplate $common should beat rare $rare")
  }
}
