package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Propensity-score / exact matching, Spark-native two-pass design
  * (reference caliper_matching_info.h:45-150 + caliper_matching.cpp:69-160;
  * ExactMatchingParser.java:1-173; python match.py:13-155).
  *
  * Pass 1 aggregates per-(score-bucket, exact-group) treated/control counts
  * — a small table — computes how many pairs each cell supports, and a
  * cumulative global index offset per cell. Pass 2 joins the (broadcast)
  * cell table back and assigns `matching_index` by a per-cell Window
  * row_number: 0 = unmatched, same index = matched partners. The big table
  * is touched twice but never collected; the Window partitions by cell, so
  * no global sort.
  */
object Matching {

  /** 1:k caliper matching on a propensity score.
    * Adds `matching_index` (long, 0 = unmatched). */
  def caliperMatching(df: DataFrame, treatment: Column, score: Column,
                      caliper: Double, exactCols: Seq[Column] = Seq.empty,
                      k: Int = 1, seed: Long = 42L): DataFrame = {
    require(caliper > 0, "caliper must be positive")
    val cell = struct(
      floor(score.cast("double") / caliper).as("bucket") +: exactCols.map(_.cast("string")): _*)
    val withCell = df.withColumn("__cell", cell)
      .withColumn("__t", treatment.cast("int"))
    // pass 1: per-cell pair capacity + global offsets (small aggregate)
    val cells = withCell.groupBy(col("__cell"))
      .agg(sum(when(col("__t") === 0, 1L).otherwise(0L)).as("c0"),
        sum(when(col("__t") === 1, 1L).otherwise(0L)).as("c1"))
      .withColumn("pairs", least(col("c1"), floor(col("c0") / k).cast("long")))
      .filter(col("pairs") > 0)
      .withColumn("offset",
        coalesce(sum(col("pairs")).over(
          Window.orderBy(col("__cell")).rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__cell"), col("pairs"), col("offset"))
    // pass 2: assign indexes inside each cell. Order by a content hash, not
    // rand(): rand() draws per-partition streams, so the matched pairs would
    // change with the cluster layout; the hash gives the same "random" order
    // on any layout.
    val wT = Window.partitionBy(col("__cell"), col("__t"))
      .orderBy(xxhash64(struct(df.columns.map(col): _*), lit(seed)))
    withCell.join(broadcast(cells), Seq("__cell"), "left")
      .withColumn("__rn", row_number().over(wT))
      .withColumn("matching_index",
        when(col("pairs").isNull, 0L)
          .when(col("__t") === 1 && col("__rn") <= col("pairs"), col("offset") + col("__rn"))
          .when(col("__t") === 0 && col("__rn") <= col("pairs") * k,
            col("offset") + ceil(col("__rn") / k).cast("long"))
          .otherwise(0L))
      .drop("__cell", "__t", "__rn", "pairs", "offset")
  }

  /** Exact matching on a covariate tuple — caliper matching degenerate case
    * with no score bucket. */
  def exactMatching(df: DataFrame, treatment: Column, exactCols: Seq[Column],
                    k: Int = 1, seed: Long = 42L): DataFrame =
    caliperMatching(df.withColumn("__zero", lit(0.0)), treatment, col("__zero"),
      caliper = 1.0, exactCols = exactCols, k = k, seed = seed)
      .drop("__zero")

  /** Standardized mean difference per covariate between treatment groups
    * (match.py:159-225): smd = (x̄₁−x̄₀)/sqrt((s₁²+s₀²)/2). One agg pass. */
  def smd(df: DataFrame, treatment: Column, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = cols.flatMap { c =>
      Seq(avg(when(treatment === 1, col(c))).as(s"m1_$c"),
        avg(when(treatment === 0, col(c))).as(s"m0_$c"),
        var_samp(when(treatment === 1, col(c))).as(s"v1_$c"),
        var_samp(when(treatment === 0, col(c))).as(s"v0_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.map { c =>
      val m1 = row.getAs[Double](s"m1_$c"); val m0 = row.getAs[Double](s"m0_$c")
      val v1 = row.getAs[Double](s"v1_$c"); val v0 = row.getAs[Double](s"v0_$c")
      (c, (m1 - m0) / math.sqrt((v1 + v0) / 2.0))
    }.toDF("covariate", "smd")
  }
}
