package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Record linkage / entity resolution: fuzzy-match two tables on a noisy
  * key (names, addresses, titles) without the all-pairs product. The
  * training-data version of the problem is linking scraped documents to a
  * registry (and its self-join form finds near-identical titles); the
  * reference has nothing in this tier.
  *
  * Candidate pairs come from an equi-join on a BLOCKING key — the scale
  * decision: comparisons happen only within a block, so the cost is
  * Σ_b |L_b|·|R_b|, not |L|·|R|. A deterministic block (nation, zip
  * prefix, soundex-ish key, LSH bucket...) is the caller's modeling
  * choice; the guard below makes its worst product a NAMED error instead
  * of a runaway stage.
  *
  * 100 TB shape: one equi-join (AQE splits skewed blocks), the
  * edit-distance gate fused in the join condition. Two cheap
  * column-pruned per-block count aggregates bound the worst block product
  * BEFORE the join runs (the house guard idiom — raise
  * `maxBlockProduct` if a hot block's quadratic cost is really intended).
  * A length pre-filter (|len(a) − len(b)| ≤ maxDist, a necessary
  * condition for edit distance) and Spark's bounded `levenshtein(a, b,
  * threshold)` (early-exit banded DP) keep the inner comparison cheap.
  */
object Linkage {

  /** Pairs (id_a, id_b, block, dist) with dist = levenshtein ≤ maxDist,
    * compared only within equal blocks. Null blocks/keys never match. */
  def blockedFuzzyJoin(left: DataFrame, right: DataFrame,
                       leftId: Column, leftBlock: Column, leftKey: Column,
                       rightId: Column, rightBlock: Column, rightKey: Column,
                       maxDist: Int,
                       maxBlockProduct: Long = 10000000L): DataFrame = {
    require(maxDist >= 0, s"fuzzy_join: maxDist must be >= 0, got $maxDist")
    require(maxBlockProduct > 0, "fuzzy_join: maxBlockProduct must be positive")
    val l = left.select(leftId.as("id_a"),
      leftBlock.cast("string").as("block"), leftKey.cast("string").as("__ka"))
      .filter(col("block").isNotNull && col("__ka").isNotNull)
    val r = right.select(rightId.as("id_b"),
      rightBlock.cast("string").as("__blk_b"),
      rightKey.cast("string").as("__kb"))
      .filter(col("__blk_b").isNotNull && col("__kb").isNotNull)
    // guard: the largest |L_b| x |R_b| product, from two per-block count
    // aggregates joined block-to-block — metadata-sized, never row-scale
    val worst = l.groupBy(col("block")).agg(count(lit(1)).as("na"))
      .join(r.groupBy(col("__blk_b").as("block")).agg(count(lit(1)).as("nb")),
        "block")
      .agg(max(col("na") * col("nb")).as("p")).head()
    val maxProduct = if (worst.isNullAt(0)) 0L else worst.getLong(0)
    require(maxProduct <= maxBlockProduct,
      s"fuzzy_join: a block pairs up to $maxProduct comparisons " +
        s"(> maxBlockProduct=$maxBlockProduct) — refine the blocking key " +
        "or raise maxBlockProduct if the quadratic block is intended")
    // the bounded levenshtein is evaluated ONCE per length-qualified pair
    // (projected, then filtered on the projection) — putting it in the
    // join condition AND the output would run the banded DP twice per
    // surviving pair
    l.join(r, col("block") === col("__blk_b") &&
        abs(length(col("__ka")) - length(col("__kb"))) <= maxDist)
      .withColumn("dist", levenshtein(col("__ka"), col("__kb"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("block"), col("dist"))
  }
}
