package graft.ops

import graft.stats.Dist
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Honest causal decision tree (reference python uplift.py:266-980 CausalTree
  * class, 1243-1895 fit/effect; Athey & Imbens criterion).
  *
  * The reference drives one SQL query per candidate evaluation round over
  * `group_set` statistics. Spark-first we make the recursion
  * LEVEL-SYNCHRONOUS: one aggregation pass per tree depth evaluates every
  * open node at that depth simultaneously —
  *
  *   1. assign each row its current node id (a codegen'd when-chain over
  *      the fitted splits so far),
  *   2. bin every feature into global quantile bins (computed once up
  *      front, LightGBM-histogram style; the reference re-sketches per node
  *      with max_centroids=1024 — global bins are the scale-friendly
  *      equivalent),
  *   3. one exploded groupBy(node, feature, bin, treatment) →
  *      (count, Σy, Σy²) histogram — tiny result, collected to the driver,
  *   4. driver scans prefix sums over bins to pick each node's best split
  *      by the Athey-Imbens criterion Σ_child n_child·τ_child².
  *
  * Honesty: rows are hash-split into a SPLIT half (chooses splits) and an
  * ESTIMATE half (leaf effects + Welch t-tests) so leaf effects are not
  * overfit by the split search. Depth D costs D+1 full scans total,
  * regardless of node count.
  */
object CausalTree {

  /** Binary tree as parallel arrays; node 0 is the root. Leaves have
    * feature = -1. */
  case class Model(feature: Array[Int], threshold: Array[Double],
                   left: Array[Int], right: Array[Int],
                   effect: Array[Double], stderr: Array[Double],
                   pValue: Array[Double], n: Array[Long],
                   featureNames: Seq[String]) {
    def numNodes: Int = feature.length
    def isLeaf(i: Int): Boolean = feature(i) < 0

    /** Per-row effect as a nested when-expression (codegen; no join). */
    def effectColumn(features: Seq[Column]): Column = {
      def go(i: Int): Column =
        if (isLeaf(i)) lit(effect(i))
        else when(features(feature(i)).cast("double") <= threshold(i), go(left(i)))
          .otherwise(go(right(i)))
      go(0)
    }

    /** Per-row honest leaf standard error (codegen when-chain, same shape
      * as effectColumn). */
    def stderrColumn(features: Seq[Column]): Column = {
      def go(i: Int): Column =
        if (isLeaf(i)) lit(stderr(i))
        else when(features(feature(i)).cast("double") <= threshold(i), go(left(i)))
          .otherwise(go(right(i)))
      go(0)
    }

    /** Leaf id per row (for diagnostics / joining leaf stats). */
    def leafColumn(features: Seq[Column]): Column = {
      def go(i: Int): Column =
        if (isLeaf(i)) lit(i)
        else when(features(feature(i)).cast("double") <= threshold(i), go(left(i)))
          .otherwise(go(right(i)))
      go(0)
    }

    def describe(): String = {
      val sb = new StringBuilder
      def go(i: Int, indent: String): Unit = {
        if (isLeaf(i))
          sb.append(f"$indent leaf[$i]: effect=${effect(i)}%.4f se=${stderr(i)}%.4f p=${pValue(i)}%.4g n=${n(i)}%d\n")
        else {
          sb.append(s"$indent node[$i]: ${featureNames(feature(i))} <= ${threshold(i)}\n")
          go(left(i), indent + "  "); go(right(i), indent + "  ")
        }
      }
      go(0, "")
      sb.toString
    }

    /** Root→leaf path predicate, e.g. `x1 <= 0.12 and x2 > 3.4`. */
    def leafPath(leaf: Int): String = {
      def go(i: Int, acc: List[String]): Option[List[String]] = {
        if (i == leaf) Some(acc.reverse)
        else if (isLeaf(i)) None
        else go(left(i), f"${featureNames(feature(i))} <= ${threshold(i)}%.6g" :: acc)
          .orElse(go(right(i), f"${featureNames(feature(i))} > ${threshold(i)}%.6g" :: acc))
      }
      go(0, Nil).map(p => if (p.isEmpty) "(root)" else p.mkString(" and "))
        .getOrElse("(unreachable)")
    }

    /** Per-leaf hypothesis-test table (the reference's leaf t-tests on the
      * honest estimation half, uplift.py:1243-1895): one row per leaf with
      * the Welch effect/stderr, the test statistic, its normal p-value
      * (pValue convention shared with the aggregate tests), and the leaf's
      * path predicate. Driver-side — the model already holds the moments. */
    def leafTests(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      feature.indices.filter(isLeaf).map { i =>
        val t = effect(i) / stderr(i)
        (i, n(i), effect(i), stderr(i), t, pValue(i), leafPath(i))
      }.toDF("leaf", "n", "effect", "stderr", "t_statistic", "p_value", "path")
    }
  }

  private case class CellStat(node: Int, feat: Int, bin: Int, t: Int,
                              cnt: Long, sum: Double, sum2: Double)

  /** Fit an honest causal tree.
    * @param features numeric feature columns (name -> column)
    * @param bins     quantile bins per feature for the split histogram
    */
  def fit(df: DataFrame, y: Column, treatment: Column,
          features: Seq[(String, Column)], maxDepth: Int = 4,
          minNodeSize: Long = 100, bins: Int = 32,
          honest: Boolean = true, seed: Long = 42L): Model = {
    require(features.nonEmpty, "need at least one feature")
    require(maxDepth >= 1 && maxDepth <= 12,
      s"maxDepth must be in [1, 12], got $maxDepth " +
        "(the navigation when-chain inlines up to 2^(D+1) nodes per pass)")
    val k = features.size
    val featNames = features.map(_._1)

    val base0 = df.select(
      (y.cast("double").as("__y") +: treatment.cast("int").as("__t") +:
        features.zipWithIndex.map { case ((_, c), i) => c.cast("double").as(s"__f$i") }): _*)
      .filter(col("__y").isNotNull && !isnan(col("__y")))
    // honest split: deterministic hash halves
    val base = base0.withColumn("__half",
      pmod(xxhash64(struct(base0.columns.toIndexedSeq.map(col): _*), lit(seed)), lit(2)).cast("int"))
    base.cache()
    try fitCached(base, k, featNames, maxDepth, minNodeSize, bins, honest)
    finally base.unpersist()
  }

  private def fitCached(base: DataFrame, k: Int, featNames: Seq[String],
                        maxDepth: Int, minNodeSize: Long, bins: Int,
                        honest: Boolean): Model = {
    val splitDf = if (honest) base.filter(col("__half") === 0) else base
    val estDf = if (honest) base.filter(col("__half") === 1) else base

    // global quantile boundaries per feature (bins-1 cut points), all
    // features sketched in ONE pass
    val probs = (1 until bins).map(_.toDouble / bins).toArray
    val boundaries: Array[Array[Double]] = splitDf.stat
      .approxQuantile((0 until k).map(i => s"__f$i").toArray, probs, 0.01)
      .map(_.distinct.sorted)

    def binExpr(i: Int): Column = {
      val bs = boundaries(i)
      var c: Column = lit(bs.length) // above all boundaries
      for (b <- bs.indices.reverse)
        c = when(col(s"__f$i") <= bs(b), b).otherwise(c)
      c
    }

    // growing tree state
    val feature = scala.collection.mutable.ArrayBuffer(-1)
    val threshold = scala.collection.mutable.ArrayBuffer(Double.NaN)
    val left = scala.collection.mutable.ArrayBuffer(-1)
    val right = scala.collection.mutable.ArrayBuffer(-1)
    var open = Set(0)

    // Navigation is a nested when-chain over the splits fitted so far:
    // per-row work is one comparison per LEVEL actually descended
    // (branch-pruned), and the chain inlines each level's thresholds into
    // the generated source. That re-compiles one small class per level
    // pass — for a SINGLE tree that is ~maxDepth compiles total, which the
    // round-9 interleaved A/B (BENCHAB.json, q41) measured as strictly
    // cheaper than the forest's literal-array unroll in BOTH regimes
    // (when-chain cold ~7 s / warm ~1.9 s vs unrolled element_at cold
    // ~13 s / warm ~6.6 s at sf0.1): the unroll's per-row fixed maxDepth
    // element_at/struct-field work dominates its one-compile saving at
    // tree scale. The forest keeps the literal-array scheme, where the
    // compile count (numTrees × levels) is what explodes instead.
    def nodeIdExpr(): Column = {
      def go(i: Int): Column =
        if (feature(i) < 0) lit(i)
        else when(col(s"__f${feature(i)}") <= threshold(i), go(left(i))).otherwise(go(right(i)))
      go(0)
    }

    var depth = 0
    while (depth < maxDepth && open.nonEmpty) {
      // ONE pass: histogram of (node, feature, bin, treatment)
      val featStructs = array((0 until k).map(i =>
        struct(lit(i).as("feat"), binExpr(i).as("bin"))): _*)
      val hist = splitDf
        .withColumn("__node", nodeIdExpr())
        .filter(col("__node").isin(open.toSeq: _*))
        .withColumn("__fb", explode(featStructs))
        .groupBy(col("__node"), col("__fb.feat"), col("__fb.bin"), col("__t"))
        .agg(count(lit(1)).as("cnt"), sum(col("__y")).as("s"),
          sum(col("__y") * col("__y")).as("s2"))
        .collect()
        .map(r => CellStat(r.getAs[Int]("__node"), r.getAs[Int]("feat"),
          r.getAs[Int]("bin"), r.getAs[Int]("__t"),
          r.getAs[Long]("cnt"), r.getAs[Double]("s"), r.getAs[Double]("s2")))

      val nextOpen = scala.collection.mutable.Set[Int]()
      for (node <- open) {
        val cells = hist.filter(_.node == node)
        bestSplit(cells, k, minNodeSize).foreach { case (f, binIdx) =>
          val thr = boundaries(f)(binIdx)
          feature(node) = f; threshold(node) = thr
          val l = feature.length
          feature += -1; threshold += Double.NaN; left += -1; right += -1
          feature += -1; threshold += Double.NaN; left += -1; right += -1
          left(node) = l; right(node) = l + 1
          nextOpen += l; nextOpen += (l + 1)
        }
      }
      open = nextOpen.toSet
      depth += 1
    }

    // estimation pass: per-leaf per-arm moments on the estimate half
    val nNodes = feature.length
    val effect = Array.fill(nNodes)(Double.NaN)
    val stderr = Array.fill(nNodes)(Double.NaN)
    val pValue = Array.fill(nNodes)(Double.NaN)
    val nArr = Array.fill(nNodes)(0L)
    val leafStats = estDf
      .withColumn("__node", nodeIdExpr())
      .groupBy(col("__node"), col("__t"))
      .agg(count(lit(1)).as("cnt"), avg(col("__y")).as("m"),
        var_samp(col("__y")).as("v"))
      .collect()
      .map(r => (r.getAs[Int]("__node"), r.getAs[Int]("__t")) ->
        (r.getAs[Long]("cnt"), r.getAs[Double]("m"),
          Option(r.getAs[Any]("v")).fold(0.0)(_.asInstanceOf[Double])))
      .toMap
    for (i <- 0 until nNodes if feature(i) < 0) {
      (leafStats.get((i, 0)), leafStats.get((i, 1))) match {
        case (Some((n0, m0, v0)), Some((n1, m1, v1))) if n0 > 1 && n1 > 1 =>
          effect(i) = m1 - m0
          stderr(i) = math.sqrt(v1 / n1 + v0 / n0)
          val tstat = effect(i) / stderr(i)
          pValue(i) = 2.0 * (1.0 - Dist.normCdf(math.abs(tstat)))
          nArr(i) = n0 + n1
        case _ => // starved leaf: NaN effect
      }
    }
    Model(feature.toArray, threshold.toArray, left.toArray, right.toArray,
      effect, stderr, pValue, nArr, featNames)
  }

  /** Best (feature, boundaryIndex) by Σ n·τ² gain over the parent's, or
    * None if no split satisfies minNodeSize per side and per arm. */
  private def bestSplit(cells: Array[CellStat], k: Int,
                        minNodeSize: Long): Option[(Int, Int)] = {
    // parent stats
    val pc = Array.fill(2)(0L); val ps = Array.fill(2)(0.0)
    cells.filter(_.feat == 0).foreach { c => pc(c.t) += c.cnt; ps(c.t) += c.sum }
    if (pc(0) == 0 || pc(1) == 0) return None
    val parentTau = ps(1) / pc(1) - ps(0) / pc(0)
    val parentGain = (pc(0) + pc(1)).toDouble * parentTau * parentTau
    var best: Option[(Int, Int)] = None
    var bestGain = parentGain + 1e-12
    for (f <- 0 until k) {
      val fc = cells.filter(_.feat == f)
      if (fc.nonEmpty) {
        val maxBin = fc.map(_.bin).max
        // prefix sums over bins: running (count, sum) per arm
        val lc = Array.fill(2)(0L); val ls = Array.fill(2)(0.0)
        for (b <- 0 until maxBin) { // split at boundary b: left = bins <= b
          fc.filter(_.bin == b).foreach { c => lc(c.t) += c.cnt; ls(c.t) += c.sum }
          val rc0 = pc(0) - lc(0); val rc1 = pc(1) - lc(1)
          val nl = lc(0) + lc(1); val nr = rc0 + rc1
          if (lc(0) >= minNodeSize && lc(1) >= minNodeSize &&
              rc0 >= minNodeSize && rc1 >= minNodeSize) {
            val tl = ls(1) / lc(1) - ls(0) / lc(0)
            val rs0 = ps(0) - ls(0); val rs1 = ps(1) - ls(1)
            val tr = rs1 / rc1 - rs0 / rc0
            val gain = nl * tl * tl + nr * tr * tr
            if (gain > bestGain) { bestGain = gain; best = Some((f, b)) }
          }
        }
      }
    }
    best
  }
}
