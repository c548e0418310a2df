package graft.ops

import graft.stats.Dist
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed bootstrap / permutation engine.
  *
  * The reference computes B replicates of an inner aggregate in one pass,
  * with per-node row counts + a shared seed pinned up front so every node
  * draws its share of each replicate deterministically
  * (AggregateFunctionBootStrap.h:85-136, 188-215; StarRocks
  * distributed_node_row_number.h:37-105). Spark partitions are not stable
  * across runs, so we get determinism a different way: the multiplicity of
  * row r in replicate b is a pure function of (id(r), b, seed) —
  * xxhash64 → uniform → Poisson inverse-CDF, all as codegen'd column
  * expressions. No RNG state, no shuffle-order sensitivity, reproducible
  * on any cluster layout. Poisson(λ=frac) bootstrap is the standard
  * large-n approximation of the multinomial draw (replicate totals vary
  * by O(√n), irrelevant at scale and already accepted by the reference's
  * binomial-splitting approach).
  *
  * Cost model: explode(B) amplifies rows B× before the aggregate, but
  * map-side partial aggregation reduces each partition to B×k cells, so
  * the shuffle is tiny; the scan stays single-pass.
  */
object Bootstrap {

  /** u ∈ [0,1) deterministic per (idCols, rep, seed). */
  private def uniform(idCols: Seq[Column], rep: Column, seed: Long): Column =
    (xxhash64((idCols :+ rep :+ lit(seed)): _*).cast("double") / lit(2.0 * Long.MaxValue)) + lit(0.5)

  /** Poisson(λ) multiplicity from a uniform, as a when-chain over the
    * inverse CDF (closed thresholds computed on the driver; tail clamped
    * at mean+10σ). Stays inside whole-stage codegen. */
  def poissonMultiplicity(u: Column, lambda: Double): Column = {
    require(lambda > 0 && lambda <= 100, "lambda in (0, 100]")
    val maxK = math.max(8, (lambda + 10 * math.sqrt(lambda)).toInt)
    var cdf = math.exp(-lambda)
    var pk = cdf
    var c: Column = when(u < cdf, 0)
    for (k <- 1 to maxK) {
      pk = pk * lambda / k
      cdf += pk
      c = c.when(u < cdf, k)
    }
    c.otherwise(maxK + 1)
  }

  /** Deterministic Poisson bootstrap weight for (idCols, rep, seed) — the
    * composable form of [[replicated]]'s weight column, for callers that
    * build their own replicate frames (Longterm's transition refit). */
  def poissonWeight(idCols: Seq[Column], rep: Column, seed: Long,
                    frac: Double = 1.0): Column =
    poissonMultiplicity(uniform(idCols, rep, seed), frac)

  /** Exact stable row identity when the caller has none: content hash of
    * every column PLUS a within-duplicate-group counter, so two identical
    * rows get DISTINCT identities (hashing content alone would give
    * duplicate rows perfectly correlated draws in every replicate,
    * understating resampling variance on discrete data). The counter
    * window partitions by the hash — parallel, no global sort; which
    * physical duplicate gets which counter is layout-dependent, but the
    * duplicates are indistinguishable so every aggregate is invariant. */
  private[graft] def withStableIds(df: DataFrame): (DataFrame, Seq[Column]) = {
    val all = df.columns.map(col).toSeq
    val d = df.withColumn("__rid", xxhash64(all: _*))
      .withColumn("__dup", row_number().over(
        Window.partitionBy(col("__rid")).orderBy(monotonically_increasing_id())))
    (d, Seq(col("__rid"), col("__dup")))
  }

  /** The replicate pass amplifies every input row B× before the aggregate —
    * see [[Par.ensure]] for why the input must be parallel first. */
  private[graft] def ensureParallel(df: DataFrame, ids: Seq[Column]): DataFrame =
    Par.ensure(df, ids)

  /** Explode df into B replicates with a deterministic bootstrap `weight`
    * column (rows with weight 0 are dropped). `idCols` identify a row
    * stably (pass a real key to skip the stable-id derivation shuffle). */
  def replicated(df: DataFrame, b: Int, frac: Double = 1.0, seed: Long = 42L,
                 idCols: Seq[Column] = Seq.empty): DataFrame = {
    val (base0, ids) =
      if (idCols.nonEmpty) (df, idCols) else withStableIds(df)
    val base = ensureParallel(base0, ids)
    val withRep = base.withColumn("rep", explode(sequence(lit(0), lit(b - 1))))
    withRep
      .withColumn("weight", poissonMultiplicity(uniform(ids, col("rep"), seed), frac))
      .filter(col("weight") > 0)
      .drop("__rid", "__dup")
  }

  /** Like [[replicated]] but physically duplicates each row `weight` times,
    * so ANY inner aggregate — quantiles, rank statistics, our UDAFs — runs
    * unweighted per replicate (the reference's generic
    * `BootStrap('anyAgg', n, B)` surface, AggregateFunctionBootStrap.h:375-497).
    * Costs ~B×frac row amplification before the aggregate; map-side partial
    * aggregation keeps the shuffle at B×state cells. */
  def replicatedRows(df: DataFrame, b: Int, frac: Double = 1.0, seed: Long = 42L,
                     idCols: Seq[Column] = Seq.empty): DataFrame =
    replicated(df, b, frac, seed, idCols)
      .withColumn("__dup_i", explode(sequence(lit(1), col("weight"))))
      .drop("__dup_i", "weight")

  /** Bootstrap distribution of weighted aggregates: one pass, returns a
    * B-row frame (rep, <agg columns>). aggs receive the weight column. */
  def bootstrapAgg(df: DataFrame, b: Int, frac: Double = 1.0, seed: Long = 42L,
                   idCols: Seq[Column] = Seq.empty)
                  (aggs: (Column => Seq[(String, Column)])): DataFrame = {
    val rep = replicated(df, b, frac, seed, idCols)
    val w = col("weight").cast("double")
    val named = aggs(w).map { case (n, c) => c.as(n) }
    rep.groupBy(col("rep")).agg(named.head, named.tail: _*)
  }

  /** Bootstrap distribution of ARBITRARY aggregates (quantiles, UDAFs, rank
    * stats — anything expressible as an aggregate Column): physically
    * replicates rows per [[replicatedRows]] and aggregates each replicate
    * unweighted. One pass, returns a B-row frame (rep, <agg columns>). */
  def bootstrapAny(df: DataFrame, b: Int, frac: Double = 1.0, seed: Long = 42L,
                   idCols: Seq[Column] = Seq.empty)
                  (aggs: Seq[(String, Column)]): DataFrame = {
    val rep = replicatedRows(df, b, frac, seed, idCols)
    val named = aggs.map { case (n, c) => c.as(n) }
    rep.groupBy(col("rep")).agg(named.head, named.tail: _*)
  }

  /** `BootStrapOls` equivalent (AggregateFunctionBootStrap.h:375-497): the
    * bootstrap distribution of OLS coefficients in ONE pass, by feeding the
    * replicate weight into the weighted OLS aggregate (WLS with integer
    * weights IS resampled OLS). Returns a B-row frame
    * (rep, coefficients array — xs order, intercept last if useBias). */
  def bootstrapOls(df: DataFrame, y: Column, xs: Seq[Column], b: Int,
                   useBias: Boolean = true, frac: Double = 1.0,
                   seed: Long = 42L, idCols: Seq[Column] = Seq.empty): DataFrame = {
    val rep = replicated(df, b, frac, seed, idCols)
    rep.groupBy(col("rep"))
      .agg(Regression.olsAggColumn(y, xs, useBias,
        weight = col("weight").cast("double")).getField("coefficients")
        .as("coefficients"))
  }

  /** Per-coefficient bootstrap CI from a [[bootstrapOls]] frame. */
  def summarizeCoefficients(reps: DataFrame, kb: Int,
                            alpha: Double = 0.05): Seq[BootSummary] =
    (0 until kb).map { i =>
      summarize(reps.select(element_at(col("coefficients"), i + 1).as("c")), "c", alpha)
    }

  /** Bootstrap mean/std/percentile CI of a statistic column from the
    * per-replicate frame. */
  case class BootSummary(mean: Double, std: Double, lower: Double, upper: Double)
  def summarize(reps: DataFrame, statCol: String, alpha: Double = 0.05): BootSummary = {
    val r = reps.agg(
      avg(col(statCol)).as("m"), stddev_samp(col(statCol)).as("s"),
      expr(s"percentile($statCol, array(${alpha / 2}, ${1 - alpha / 2}))").as("ci")).head()
    val ci = r.getSeq[Double](2)
    BootSummary(r.getDouble(0), r.getDouble(1), ci(0), ci(1))
  }

  // ---------------------------------------------------------------- permutation

  /** Default permutation statistic: difference in means. */
  val diffInMeans: (Column, Column) => Column = (y, t) =>
    sum(when(t === 1, y)) / sum(when(t === 1, 1)) -
      sum(when(t === 0, y)) / sum(when(t === 0, 1))

  /** Permutation test (AggregateFunctionPermutation.h:48-263): B replicas
    * with treatment re-randomized per replica; two-sided p = share of
    * permuted |stat| ≥ |observed|. The inner statistic is ANY aggregate
    * builder (y, t) => Column — diff-in-means by default, but a
    * Mann-Whitney U, a quantile difference, or any UDAF works (the
    * reference re-runs an arbitrary named aggregate per permutation,
    * Permutation.h:48-263). `mde` shifts treated outcomes to probe
    * sensitivity: absolute (`mdeType="abs"`, y+mde) or relative
    * (`mdeType="rel"`, y·(1+mde)) — Permutation.h:207-263's shift types.
    *
    * Scan economy: the observed statistic rides the replicate job as
    * rep = -1 carrying the identity assignment, so the whole test is ONE
    * distributed aggregation (plus a driver-side reduce over the B+1 result
    * rows). The permuted assignment needs the treated share p1 up front;
    * pass the DESIGN share in `p1Design` (known for any planned experiment)
    * for a strictly single-scan test, else a t-column-only pre-scan
    * estimates it.
    *
    * Returns (observed, p_value, reps df — B local rows, no recompute). */
  def permutationTest(df: DataFrame, y: Column, treatment: Column, b: Int = 1000,
                      seed: Long = 42L, mde: Double = 0.0, mdeType: String = "abs",
                      idCols: Seq[Column] = Seq.empty,
                      p1Design: Option[Double] = None,
                      stat: (Column, Column) => Column = diffInMeans): (Double, Double, DataFrame) = {
    require(mdeType == "abs" || mdeType == "rel", "mdeType must be abs or rel")
    def shifted(yc: Column, tc: Column): Column =
      if (mde == 0.0) yc
      else if (mdeType == "abs") when(tc === 1, yc + lit(mde)).otherwise(yc)
      else when(tc === 1, yc * lit(1.0 + mde)).otherwise(yc)
    val idNamed = idCols.zipWithIndex.map { case (c, i) => c.as(s"__id_$i") }
    val base0 = df.select(Seq(y.cast("double").as("y"),
      treatment.cast("int").as("t")) ++ idNamed: _*)
      .filter(col("y").isNotNull && col("t").isNotNull) // listwise
    val (base1, ids) =
      if (idCols.nonEmpty) (base0, idNamed.indices.map(i => col(s"__id_$i")))
      else withStableIds(base0)
    val base = ensureParallel(base1, ids)
    // column-pruned to t alone when the design share isn't supplied
    val p1 = p1Design.getOrElse(
      base.agg((sum(when(col("t") === 1, 1)) / count(lit(1)).cast("double"))).head().getDouble(0))
    val statRows = base
      .withColumn("rep", explode(sequence(lit(-1), lit(b - 1))))
      .withColumn("tp", when(col("rep") === -1, col("t"))
        .otherwise((uniform(ids, col("rep"), seed) < lit(p1)).cast("int")))
      .groupBy(col("rep"))
      .agg(stat(shifted(col("y"), col("tp")), col("tp")).as("stat"))
      .collect() // B+1 tiny rows
    def statOf(r: org.apache.spark.sql.Row): Double =
      if (r.isNullAt(1)) Double.NaN else r.getDouble(1)
    val observed = statRows.find(_.getInt(0) == -1).map(statOf).getOrElse(Double.NaN)
    val permuted = statRows.filter(_.getInt(0) >= 0)
    // NaN/null replicate stats count 0 in the numerator but stay in the
    // denominator, matching the previous when(...).otherwise(0) reduce
    val pval = permuted.map(r => if (math.abs(statOf(r)) >= math.abs(observed)) 1.0 else 0.0)
      .sum / permuted.length
    val spark = df.sparkSession
    val reps = spark.createDataFrame(
      java.util.Arrays.asList(permuted: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rep", org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("stat", org.apache.spark.sql.types.DoubleType))))
    (observed, pval, reps)
  }

  // ---------------------------------------------------------------- estimators

  case class EffectEstimate(estimate: Double, stderr: Double, lower: Double,
                            upper: Double, p_value: Double)

  /** Select (y, t[, e]) plus renamed id columns, dropping incomplete rows
    * listwise (the aggregate family's null convention); returns the
    * narrowed frame and the id Columns to hand to the bootstrap (empty →
    * stable-id path). */
  private def narrowWithIds(df: DataFrame, cols: Seq[Column],
                            idCols: Seq[Column]): (DataFrame, Seq[Column]) = {
    val idNamed = idCols.zipWithIndex.map { case (c, i) => c.as(s"__id_$i") }
    val narrowed = df.select(cols ++ idNamed: _*)
    val complete = cols.indices.map(i => col(narrowed.columns(i)).isNotNull).reduce(_ && _)
    (narrowed.filter(complete), idNamed.indices.map(i => col(s"__id_$i")))
  }

  /** ONE distributed job for observed + B bootstrap replicates of a
    * weighted aggregate statistic: the observed value rides the replicate
    * pass as rep = -1 with weight 1 (the [[permutationTest]] scan-economy
    * idiom), so no separate full scan computes it. Returns (observed,
    * B-row local reps frame). */
  private def repsWithObserved(base00: DataFrame, idCols: Seq[Column], b: Int,
                               seed: Long, frac: Double = 1.0)
                              (stat: Column => Column): (Double, DataFrame) = {
    val (base0, ids) =
      if (idCols.nonEmpty) (base00, idCols) else withStableIds(base00)
    val base = ensureParallel(base0, ids)
    val statRows = base
      .withColumn("rep", explode(sequence(lit(-1), lit(b - 1))))
      .withColumn("weight", when(col("rep") === -1, 1)
        .otherwise(poissonMultiplicity(uniform(ids, col("rep"), seed), frac)))
      .filter(col("weight") > 0)
      .groupBy(col("rep"))
      .agg(stat(col("weight").cast("double")).as("stat"))
      .collect() // B+1 tiny rows
    def statOf(r: org.apache.spark.sql.Row): Double =
      if (r.isNullAt(1)) Double.NaN else r.getDouble(1)
    val observed = statRows.find(_.getInt(0) == -1).map(statOf).getOrElse(Double.NaN)
    val permuted = statRows.filter(_.getInt(0) >= 0)
    val spark = base0.sparkSession
    val reps = spark.createDataFrame(
      java.util.Arrays.asList(permuted: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rep", org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("stat", org.apache.spark.sql.types.DoubleType))))
    (observed, reps)
  }

  /** Difference-in-means ATE with bootstrap CI (statistics.py:1054-1119's
    * ATEestimator over BootStrapMulti sums). Pass a real row key in
    * `idCols` to skip the stable-id derivation (a full-frame hash +
    * row_number window shuffle). Observed + replicates share ONE scan
    * ([[repsWithObserved]]): the observed stat is the same weighted
    * aggregate at weight 1. */
  def ateEstimator(df: DataFrame, y: Column, treatment: Column, b: Int = 500,
                   alpha: Double = 0.05, seed: Long = 42L,
                   idCols: Seq[Column] = Seq.empty): EffectEstimate = {
    val (base, ids) = narrowWithIds(df,
      Seq(y.cast("double").as("y"), treatment.cast("int").as("t")), idCols)
    val (obs, reps) = repsWithObserved(base, ids, b, seed) { w =>
      (sum(when(col("t") === 1, col("y") * w)) / sum(when(col("t") === 1, w))) -
        (sum(when(col("t") === 0, col("y") * w)) / sum(when(col("t") === 0, w)))
    }
    finishEffect(obs, reps, alpha)
  }

  /** Inverse-propensity-weighted ATE with bootstrap CI
    * (statistics.py:1122-1217). `propensity` is a precomputed e(x) column;
    * `idCols` as in [[ateEstimator]]; observed fused as in
    * [[repsWithObserved]]. */
  def ipwEstimator(df: DataFrame, y: Column, treatment: Column, propensity: Column,
                   b: Int = 500, alpha: Double = 0.05, seed: Long = 42L,
                   idCols: Seq[Column] = Seq.empty): EffectEstimate = {
    val (base, ids) = narrowWithIds(df,
      Seq(y.cast("double").as("y"), treatment.cast("int").as("t"),
        propensity.cast("double").as("e")), idCols)
    def ipw(w: Column): Column =
      sum(col("t") * col("y") * w / col("e")) / sum(w) -
        sum((lit(1) - col("t")) * col("y") * w / (lit(1) - col("e"))) / sum(w)
    val (obs, reps) = repsWithObserved(base, ids, b, seed)(ipw)
    finishEffect(obs, reps, alpha)
  }

  /** Doubly-robust (AIPW) ATE with bootstrap CI — consistent if EITHER the
    * propensity `e(x)` OR the outcome models `mu1(x)`/`mu0(x)` are right
    * (Robins-Rotnitzky-Zhao augmented IPW; the natural completion of the
    * reference's ATE/IPW estimator pair, statistics.py:1054-1217). All
    * three model columns are precomputed, like [[ipwEstimator]]'s
    * propensity; the per-row influence term
    * ψ = μ₁−μ₀ + T(Y−μ₁)/e − (1−T)(Y−μ₀)/(1−e) is a codegen projection
    * and the estimator is its (replicate-weighted) mean — observed +
    * all replicates in the same ONE scan. */
  def aipwEstimator(df: DataFrame, y: Column, treatment: Column,
                    propensity: Column, mu1: Column, mu0: Column,
                    b: Int = 500, alpha: Double = 0.05, seed: Long = 42L,
                    idCols: Seq[Column] = Seq.empty): EffectEstimate = {
    val (base, ids) = narrowWithIds(df,
      Seq(y.cast("double").as("y"), treatment.cast("int").as("t"),
        propensity.cast("double").as("e"), mu1.cast("double").as("m1"),
        mu0.cast("double").as("m0")), idCols)
    def aipw(w: Column): Column = {
      val psi = col("m1") - col("m0") +
        col("t") * (col("y") - col("m1")) / col("e") -
        (lit(1) - col("t")) * (col("y") - col("m0")) / (lit(1) - col("e"))
      sum(psi * w) / sum(w)
    }
    val (obs, reps) = repsWithObserved(base, ids, b, seed)(aipw)
    finishEffect(obs, reps, alpha)
  }

  private def finishEffect(obs: Double, reps: DataFrame, alpha: Double): EffectEstimate = {
    val s = summarize(reps, "stat", alpha)
    val z = obs / s.std
    val p = if (z.isNaN) Double.NaN else 2.0 * (1.0 - Dist.normCdf(math.abs(z)))
    EffectEstimate(obs, s.std, s.lower, s.upper, p)
  }
}
