package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** N-gram language-model perplexity scoring — the CCNet / RefinedWeb-class
  * quality signal a training-data pipeline filters on (Wenzek et al. 2020
  * score documents with a KenLM model; the same decision only needs
  * relative perplexity, which a corpus-trained add-one bigram model
  * supplies without an external model artifact). Not present in the
  * reference (its quality tier stops at Gopher-style hard rules,
  * TextOps.gopherFilter); included as a first-class pipeline operator.
  *
  * 100 TB shape — two keyed exchanges, no driver-side model:
  *  - train: one pass explodes each document's token stream into bigram
  *    pairs (array arithmetic, no window) and groupBy-counts them with
  *    map-side combine; counts stay a DataFrame, never a driver map.
  *  - score: documents re-explode to bigrams and LEFT-join the count
  *    tables. The unigram table is broadcast when small; the bigram join
  *    shuffles by (w1, w2) — the natural key — and AQE handles token
  *    skew. Per-document aggregation brings everything back keyed by id.
  *
  * Probability model: add-one-smoothed bigram
  * p(w2 | w1) = (c(w1,w2) + 1) / (c(w1) + V), V = training vocabulary
  * size; tokens are lowercase whitespace splits (the [[TextOps]]
  * convention). Documents with fewer than 2 tokens score null.
  */
object NgramLm {

  /** lowercase whitespace tokens, empties dropped */
  private def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  case class BigramModel(bigrams: DataFrame, unigrams: DataFrame,
                         vocabSize: Long)

  /** Train bigram/unigram count tables over a corpus. The tables are
    * DataFrames (persisted by the caller if scoring repeatedly). */
  def train(docs: DataFrame, text: Column): BigramModel = {
    val toks = docs.select(tokens(text).as("__t"))
      .filter(size(col("__t")) >= 2)
    val pairs = toks.select(explode(
      transform(sequence(lit(1), size(col("__t")) - 1),
        i => struct(element_at(col("__t"), i).as("w1"),
          element_at(col("__t"), i + 1).as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    val bigrams = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c_bigram"))
    val unigrams = docs.select(explode(tokens(text)).as("w1"))
      .groupBy(col("w1")).agg(count(lit(1)).as("c_unigram"))
    // cheap: reuses the unigram aggregation's result set size
    val v = unigrams.count()
    BigramModel(bigrams, unigrams, v)
  }

  /** Score each document: (id columns, n_bigrams, avg_logp, perplexity =
    * exp(-avg_logp)). Unseen bigrams/unigrams fall back to counts of 0
    * under the same smoothing.
    *
    * The unigram-table broadcast is GUARDED: `model.vocabSize` (already
    * computed at train time, no extra job) must be ≤ `maxBroadcastVocab`
    * or the call fails fast naming the escape — a web-scale corpus
    * vocabulary (100M+ distinct tokens once typos are in) is exactly the
    * full-vocab broadcast that does not survive real corpora (see
    * [[TfIdf]]'s design notes, which reject it outright). With
    * `broadcastUnigrams = false` the unigram join shuffles by w1 — the
    * same keyed exchange the bigram join already does — and AQE handles
    * the Zipf-head skew. */
  def scorePerplexity(docs: DataFrame, id: Column, text: Column,
                      model: BigramModel,
                      broadcastUnigrams: Boolean = true,
                      maxBroadcastVocab: Long = 8L << 20): DataFrame = {
    require(maxBroadcastVocab > 0, "maxBroadcastVocab must be positive")
    require(!broadcastUnigrams || model.vocabSize <= maxBroadcastVocab,
      s"ngram_lm: vocabulary has ${model.vocabSize} distinct tokens " +
        s"(max $maxBroadcastVocab for broadcast): pass " +
        "broadcastUnigrams=false for a shuffled unigram join, or raise " +
        "maxBroadcastVocab if every executor can hold the table")
    val uni0 = model.unigrams
    val uni = if (broadcastUnigrams) broadcast(uni0) else uni0
    val base = docs.select(id.as("doc_id"), tokens(text).as("__t"))
      .filter(size(col("__t")) >= 2)
    val pairs = base.select(col("doc_id"), explode(
      transform(sequence(lit(1), size(col("__t")) - 1),
        i => struct(element_at(col("__t"), i).as("w1"),
          element_at(col("__t"), i + 1).as("w2")))).as("p"))
      .select(col("doc_id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
    val joined = pairs
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(uni, Seq("w1"), "left")
      .select(col("doc_id"),
        (log(coalesce(col("c_bigram"), lit(0L)) + 1.0) -
          log(coalesce(col("c_unigram"), lit(0L)) + lit(model.vocabSize.toDouble)))
          .as("logp"))
    joined.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        avg(col("logp")).as("avg_logp"),
        exp(-avg(col("logp"))).as("perplexity"))
  }
}
