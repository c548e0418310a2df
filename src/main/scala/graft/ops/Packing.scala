package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GPT-style sample packing: concatenate documents in a deterministic
  * global order and slice the token stream into fixed-size context
  * windows — the layout step between a curated corpus and a pretraining
  * dataloader. A document with `n` tokens whose running total (inclusive)
  * is `cum` occupies token span [cum−n, cum), so it touches windows
  * floor((cum−n)/ctx) … floor((cum−1)/ctx).
  *
  * The global running total is [[RangeCumSum.withCumSums]] — range-
  * repartition + per-partition windows + a P-row driver splice — NOT a
  * single-partition `Window.orderBy`, so the concat order is global while
  * every partition sorts only its own key range. Same continuation shape
  * as RangeCumSum: the cumsum frame is persisted for the duration of `f`
  * and unpersisted after, so `f` must materialize what it needs.
  */
object Packing {

  /** Runs `f` on the frame extended with per-document packing columns:
    * `token_start` (0-based position of the doc's first token in the
    * concatenated stream), `first_window` / `last_window` (ctx-window
    * indices the doc touches) and `n_windows` (how many — >1 means the doc
    * crosses a window boundary; 0 for empty/null-token docs, which occupy
    * no span). `tokenizer` turns the `tokens` column into the count unit
    * ([[TextOps.PrecomputedCounts]] default; [[TextOps.WhitespaceTokens]]
    * / [[TextOps.BpeTokens]] take raw text — the tokenizer-true window
    * budget; the count rides the same narrow cumsum projection). */
  def contextChunks[T](df: DataFrame, order: Seq[Column], tokens: Column,
                       ctx: Int,
                       tokenizer: TextOps.Tokenizer =
                         TextOps.PrecomputedCounts)(f: DataFrame => T): T = {
    require(ctx > 0, "ctx must be positive")
    val base = df.withColumn("__tok",
      coalesce(tokenizer.counts(tokens).cast("double"), lit(0.0)))
    RangeCumSum.withCumSums(base, order, Seq("__tok")) { (cum, _) =>
      val n = col("__tok")
      val start = col("cum___tok") - n
      val fw = floor(start / ctx).cast("long")
      val lw = floor((col("cum___tok") - 1) / ctx).cast("long")
      f(cum
        .withColumn("token_start", start.cast("long"))
        .withColumn("first_window", when(n > 0, fw))
        .withColumn("last_window", when(n > 0, lw))
        .withColumn("n_windows", when(n > 0, lw - fw + 1).otherwise(0L))
        .drop("__tok", "__pid"))
    }
  }
}
