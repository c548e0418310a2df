package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** TF-IDF and BM25 term scoring over a document corpus — the keyword /
  * relevance primitive a training-data pipeline uses for topic filtering,
  * keyword extraction, and query-based subcorpus selection. Not present in
  * the reference (its text tier stops at hard quality rules); included as a
  * first-class pipeline operator alongside [[TextOps.vocabulary]].
  *
  * 100 TB shape — three keyed exchanges, nothing driver-side:
  *  1. explode tokens → groupBy(doc_id, token) with map-side combine: a
  *     document's repeated tokens collapse before the shuffle.
  *  2. groupBy(token) over the per-doc counts for document frequency; the
  *     result is vocabulary-sized, far smaller than the corpus.
  *  3. join term counts back to the df table on token. Zipf-head tokens
  *     make this key skewed, so the join must stay a shuffle join with AQE
  *     skew-split enabled (a broadcast of the full vocabulary does not
  *     survive real corpora); corpus-level scalars (N, avgdl) ride in as
  *     literals from one tiny agg.
  * The optional per-doc top-k re-keys by doc_id — bounded fan-in, no skew
  * (a document has bounded distinct terms).
  *
  * Scoring: idf = ln((N+1)/(df+1)) + 1 (smoothed, strictly positive);
  * tfidf = tf * idf; bm25 = idf * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))
  * (Robertson et al., k1=1.2 b=0.75 defaults). Tokens are lowercase
  * whitespace splits (the [[TextOps]] convention).
  */
object TfIdf {

  private def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Per-(doc, term) frame: doc_id, token, tf (count in doc), dl (doc
    * token length), df (docs containing token), tfidf, bm25. */
  def termScores(docs: DataFrame, id: Column, text: Column,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // dl rides the explode as a per-row constant, so no per-doc window (a
    // 40M-row shuffle+sort saved per 1M docs); the corpus scalars (N,
    // avgdl) come from one cheap pass over the RAW docs — token-array
    // sizes only, never the exploded frame. The tf subtree below IS built
    // twice (df-table branch + join branch; column pruning makes the
    // subtrees differ so exchange reuse cannot deduplicate them) and that
    // is the MEASURED best shape: a localCheckpoint that materialized tf
    // once made the 1M-doc probe ~40% slower (58 s vs 41 s) — writing 40M
    // rows to block storage costs more than re-running the codegen'd
    // tokenize+explode+agg lineage.
    val corpus = docs.select(size(tokens(text)).as("dl"))
      .filter(col("dl") > 0)
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl")).head()
    val nDocs = corpus.getLong(0)
    require(nDocs > 0, "tfidf: corpus has no tokenizable documents")
    val avgdl = corpus.getDouble(1)
    val tf = docs
      .select(id.as("doc_id"), tokens(text).as("__toks"))
      .select(col("doc_id"), explode(col("__toks")).as("token"),
        size(col("__toks")).cast("long").as("dl"))
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    val dfTable = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    val idf = log((lit(nDocs) + 1.0) / (col("df") + 1.0)) + 1.0
    val tfD = col("tf").cast("double")
    tf.join(dfTable, "token")
      .withColumn("idf", idf)
      .withColumn("tfidf", tfD * col("idf"))
      .withColumn("bm25", col("idf") * tfD * (k1 + 1.0) /
        (tfD + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / avgdl)))
      .select(col("doc_id"), col("token"), col("tf"), col("dl"), col("df"),
        col("idf"), col("tfidf"), col("bm25"))
  }

  /** Top-k terms per document by tfidf (ties broken by token for a total
    * order). One doc-keyed window over the already-scored frame — the
    * per-partition sort stays in codegen and each partition sorts only its
    * own range (no skew: a document has bounded distinct terms). A
    * collect_list/array_sort aggregate was tried instead and measured
    * ~20% SLOWER at the 1M-doc probe: the per-doc lists ride the
    * object-hash aggregate path with wide structs, which costs more than
    * the codegen'd sort it avoids. */
  def topTerms(scores: DataFrame, k: Int): DataFrame =
    scores.withColumn("rank",
        row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("token"))))
      .filter(col("rank") <= k)
}
