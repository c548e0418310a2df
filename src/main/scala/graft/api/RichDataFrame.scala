package graft.api

import graft.agg.{KsResult, MannWhitneyResult}
import graft.ops._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** User-facing DSL parity with the reference Python SDK
  * (dataframe.py:384-1033): the relational surface is Spark's own
  * DataFrame API (select/drop/withColumn/filter/groupBy/orderBy/limit/
  * join/union/sample/randomSplit are identical concepts); this implicit
  * class adds the statistical verbs and the few reference-specific
  * conveniences on top. `import graft.api.implicits._` to enable.
  */
object implicits {
  implicit class RichDataFrame(val df: DataFrame) {

    // ------------------------------------------------ reference DSL extras

    /** describe: one aggregate pass of count/avg/std/min/quantiles/max per
      * numeric column (dataframe.py:610-669), long format. */
    def describeAll(cols: Seq[String]): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val aggs = cols.flatMap { c =>
        Seq(count(col(c)).cast("double").as(s"cnt_$c"),
          avg(col(c)).as(s"avg_$c"),
          stddev_samp(col(c)).as(s"std_$c"),
          min(col(c)).cast("double").as(s"min_$c"),
          expr(s"percentile($c, array(0.25, 0.5, 0.75, 0.9, 0.99))").as(s"q_$c"),
          max(col(c)).cast("double").as(s"max_$c"))
      }
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      cols.map { c =>
        val q = r.getSeq[Double](r.fieldIndex(s"q_$c"))
        (c, r.getAs[Double](s"cnt_$c"), r.getAs[Double](s"avg_$c"),
          r.getAs[Double](s"std_$c"), r.getAs[Double](s"min_$c"),
          q(0), q(1), q(2), q(3), q(4), r.getAs[Double](s"max_$c"))
      }.toDF("column", "count", "avg", "std", "min",
        "p25", "p50", "p75", "p90", "p99", "max")
    }

    /** Data-quality profile: per-column row/null/distinct counts plus
      * min/max rendered as strings (works for ANY column type, unlike
      * [[describeAll]]'s numeric summary) — the ingestion-gate report a
      * pipeline runs on every new batch. ONE aggregate pass; `exactDistinct
      * = false` (default) uses the HLL sketch (constant state, the 100 TB
      * path), `true` uses count(distinct) for oracle-exact counts. */
    def profileAll(cols: Seq[String],
                   exactDistinct: Boolean = false): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val aggs = count(lit(1)).as("__rows") +: cols.flatMap { c =>
        Seq(count(col(c)).as(s"nn_$c"),
          (if (exactDistinct) countDistinct(col(c))
           else approx_count_distinct(col(c))).as(s"nd_$c"),
          min(col(c)).cast("string").as(s"mn_$c"),
          max(col(c)).cast("string").as(s"mx_$c"))
      }
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      val n = r.getAs[Long]("__rows")
      cols.map { c =>
        val nn = r.getAs[Long](s"nn_$c")
        (c, n, n - nn, (n - nn).toDouble / math.max(n, 1L),
          r.getAs[Long](s"nd_$c"), r.getAs[String](s"mn_$c"),
          r.getAs[String](s"mx_$c"))
      }.toDF("column", "n_rows", "n_null", "null_frac", "n_distinct",
        "min", "max")
    }

    /** train/test split by fraction (dataframe.py:857-874). NOTE:
      * `randomSplit` draws per-partition streams, so membership changes
      * with the cluster layout — use [[trainTestSplitDeterministic]] when
      * the split must reproduce across runs and clusters. */
    def trainTestSplit(testSize: Double, seed: Long = 42L): (DataFrame, DataFrame) = {
      val Array(train, test) = df.randomSplit(Array(1.0 - testSize, testSize), seed)
      (train, test)
    }

    /** Layout-deterministic train/test split: membership is a pure function
      * of (idCols, seed) via a content hash, so the same row lands on the
      * same side on any partitioning, any cluster, any run — the convention
      * every other sampled/bootstrapped operator here follows. Pass a real
      * key in `idCols`; defaults to hashing the whole row (duplicates then
      * co-travel to the same side). */
    def trainTestSplitDeterministic(testSize: Double, seed: Long = 42L,
                                    idCols: Seq[Column] = Seq.empty)
        : (DataFrame, DataFrame) = {
      require(testSize > 0 && testSize < 1, "testSize in (0,1)")
      val key = if (idCols.nonEmpty) idCols
        else Seq(struct(df.columns.toIndexedSeq.map(col): _*))
      val u = (xxhash64((key :+ lit(seed)): _*).cast("double") /
        lit(2.0 * Long.MaxValue)) + lit(0.5)
      (df.filter(u >= testSize), df.filter(u < testSize))
    }

    /** Layout-deterministic per-stratum sampling — `sampleBy` with the same
      * content-hash membership rule as [[trainTestSplitDeterministic]]: a
      * row's fate is a pure function of (idCols, seed), so a corpus-mixing
      * recipe ("keep 20% of source A, 5% of B…") reproduces exactly on any
      * partitioning or cluster, and re-running over grown data keeps every
      * previously-kept row (reservoir-free incremental curation). Strata
      * missing from `fractions` are dropped, like Spark's `sampleBy`.
      * `uniform` overrides the membership draw with a caller-supplied
      * [0,1) column (used by the q80 oracle to share an explicit LCG with
      * DuckDB); leave it null for the xxhash64 default. */
    def sampleByDeterministic(strata: Column, fractions: Map[String, Double],
                              seed: Long = 42L, idCols: Seq[Column] = Seq.empty,
                              uniform: Column = null): DataFrame = {
      require(fractions.nonEmpty, "fractions must be non-empty")
      require(fractions.values.forall(f => f >= 0 && f <= 1),
        "every fraction must be in [0,1]")
      val key = if (idCols.nonEmpty) idCols
        else Seq(struct(df.columns.toIndexedSeq.map(col): _*))
      val u = Option(uniform).getOrElse(
        (xxhash64((key :+ lit(seed)): _*).cast("double") /
          lit(2.0 * Long.MaxValue)) + lit(0.5))
      val frac = fractions.foldLeft(lit(0.0)) { case (acc, (k, f)) =>
        when(strata.cast("string") === k, lit(f)).otherwise(acc)
      }
      df.filter(u < frac)
    }

    // ------------------------------------------------ statistics verbs

    def deltaMethod(metric: String, isStd: Boolean = true): Double =
      df.select(graft.functions.deltaMethod(metric, isStd)).head().getDouble(0)

    def ttest1Samp(metric: String, alternative: String = "two-sided",
                   mu: Double = 0.0, cuped: String = ""): DataFrame =
      df.select(graft.functions.ttest1Samp(metric, alternative, mu, cuped).as("r"))
        .select(col("r.*"))

    def ttest2Samp(metric: String, treatment: String,
                   alternative: String = "two-sided", cuped: String = ""): DataFrame =
      df.select(graft.functions.ttest2Samp(metric, col(treatment), alternative, cuped).as("r"))
        .select(col("r.*"))

    def srm(value: String, group: String, ratios: Seq[Double]): DataFrame =
      df.select(graft.functions.srm(col(value), col(group), ratios).as("r"))
        .select(col("r.*"))

    def mannWhitneyUTest(value: String, treatment: String,
                         alternative: String = "two-sided"): MannWhitneyResult =
      RankTests.mannWhitneyU(df, col(value), col(treatment), alternative)

    def kolmogorovSmirnovTest(value: String, treatment: String,
                              alternative: String = "two-sided"): KsResult =
      RankTests.ksTest(df, col(value), col(treatment), alternative)

    def ols(y: String, xs: Seq[String], useBias: Boolean = true): DataFrame =
      df.select(graft.functions.ols(col(y), xs.map(col), useBias).as("m"))
        .select(col("m.*"))

    def wls(y: String, xs: Seq[String], weight: String, useBias: Boolean = true): DataFrame =
      df.select(graft.functions.wls(col(y), xs.map(col), col(weight), useBias).as("m"))
        .select(col("m.*"))

    /** R `summary(lm)`-style text block for y ~ xs (visual parity with the
      * reference's formatted OLS output). */
    def olsReport(y: String, xs: Seq[String], useBias: Boolean = true): String =
      graft.Formatters.formatOls(
        Regression.fitOls(df, col(y), xs.map(col), useBias).summary, xs)

    /** Two-block experiment table for the xexpt t-test (visual parity with
      * the reference's formatted output). */
    def xexptReport(uin: String, treatment: String, numerator: String,
                    denominator: String, alpha: Double = 0.05,
                    mde: Double = 0.005, power: Double = 0.8): String = {
      val row = df.select(graft.functions.xexpt_ttest_2samp(col(uin),
        col(treatment), Seq(col(numerator), col(denominator)),
        alpha = alpha, mde = mde, power = power).as("r"))
        .select(col("r.*")).head()
      graft.Formatters.formatXexpt(row, alpha, mde, power, "avg")
    }

    def did(y: String, treatment: String, time: String, xs: Seq[String] = Seq.empty): DataFrame = {
      val m = Regression.did(df, col(y), col(treatment), col(time), xs.map(col)).summary
      summaryToDf(df, m)
    }

    def ivRegression(y: String, t: String, z: String, xs: Seq[String] = Seq.empty): DataFrame =
      summaryToDf(df, Regression.ivRegression(df, col(y), col(t), col(z), xs.map(col)))

    def liftGain(ite: String, y: String, treatment: String, k: Int = 100): DataFrame =
      Uplift.liftGain(df, col(ite), col(y), col(treatment), k)

    def caliperMatching(treatment: String, score: String, caliper: Double,
                        exactCols: Seq[String] = Seq.empty, k: Int = 1): DataFrame =
      Matching.caliperMatching(df, col(treatment), col(score), caliper, exactCols.map(col), k)

    def exactMatching(treatment: String, exactCols: Seq[String], k: Int = 1): DataFrame =
      Matching.exactMatching(df, col(treatment), exactCols.map(col), k)

    def smd(treatment: String, cols: Seq[String]): DataFrame =
      Matching.smd(df, col(treatment), cols)

    def cutBins(colName: String, bins: Seq[Double], ifString: Boolean = true): DataFrame =
      df.withColumn(s"${colName}_bin", Features.cutBins(col(colName), bins, ifString))

    def oneHot(cols: Seq[String]): DataFrame = Features.oneHot(df, cols)

    def groupSet(y: String, treatment: String, groupCols: Seq[String]): DataFrame =
      GroupSet.groupSet(df, col(y), col(treatment), groupCols.map(c => c -> col(c)))

    // ------------------------------------------------------------ causal ML
    def linearDml(y: String, t: String, xs: Seq[String], cv: Int = 2,
                  heterogeneous: Seq[String] = Seq.empty): Dml.DmlModel =
      Dml.linearDml(df, col(y), col(t), xs.map(col), cv,
        heterogeneous = heterogeneous.map(col))

    def causalTree(y: String, t: String, features: Seq[String],
                   maxDepth: Int = 4, minNodeSize: Long = 100): CausalTree.Model =
      CausalTree.fit(df, col(y), col(t), features.map(f => f -> col(f)),
        maxDepth, minNodeSize)

    def causalForest(y: String, t: String, features: Seq[String],
                     numTrees: Int = 20, maxDepth: Int = 4): CausalForest.Model =
      CausalForest.fit(df, col(y), col(t), features.map(f => f -> col(f)),
        numTrees, maxDepth)

    def bootstrap(b: Int, seed: Long = 42L)
                 (aggs: Column => Seq[(String, Column)]): DataFrame =
      Bootstrap.bootstrapAgg(df, b, seed = seed)(aggs)

    def permutationTest(y: String, t: String, b: Int = 1000): (Double, Double) = {
      val (obs, p, _) = Bootstrap.permutationTest(df, col(y), col(t), b)
      (obs, p)
    }

    def quantileTestBucket(value: String, treatment: String, uin: String,
                           percentiles: Seq[Double]): DataFrame =
      QuantileTest.quantileTestBucket(df, col(value), col(treatment), col(uin), percentiles)

    // ------------------------------------------------------------ pipeline
    def exactDedup(text: String, keep: String): DataFrame =
      Dedup.exactDedup(df, col(text), col(keep))

    def minHashDedup(id: String, text: String, threshold: Double = 0.8): DataFrame =
      Dedup.minHashDedup(df, col(id), col(text), threshold = threshold)

    def simHashDedup(id: String, text: String, maxHamming: Int = 3): DataFrame =
      Dedup.simHashDedup(df, col(id), col(text), maxHamming)

    def winnowPairs(id: String, text: String, threshold: Double = 0.5): DataFrame =
      Dedup.winnowPairs(df, col(id), col(text), threshold = threshold)

    def withTextStats(text: String): DataFrame = df
      .withColumn("token_count", TextOps.tokenCount(col(text)))
      .withColumn("lang_id", TextOps.langId(col(text)))
      .withColumn("quality_score", TextOps.qualityScore(col(text)))
      .withColumn("fingerprint", TextOps.contentFingerprint(col(text)))

    def knn(id: String, vec: String, probes: DataFrame, k: Int): DataFrame =
      Ann.bruteForceKnn(df, col(id), col(vec), probes, probes(id), probes(vec), k)
  }

  private def summaryToDf(df: DataFrame, s: graft.agg.OlsSummary): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val names = (0 until s.k).map(i => s"x${i + 1}") ++
      (if (s.use_bias) Seq("(Intercept)") else Seq.empty)
    names.indices.map { i =>
      (names(i), s.coefficients(i), s.stderr(i), s.t_values(i), s.p_values(i))
    }.toDF("term", "estimate", "stderr", "t_value", "p_value")
  }
}
