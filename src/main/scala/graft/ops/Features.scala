package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Feature engineering parity ops (reference CutBinsParser.java:1-94,
  * features.py:17-282). */
object Features {

  /** Bucketize by explicit split points; labels `[a,b)` like the reference
    * (ordinal ints when ifString=false). Pure CASE chain → codegen. */
  def cutBins(c: Column, bins: Seq[Double], ifString: Boolean = true): Column = {
    require(bins.length >= 2, "need at least 2 split points")
    val sorted = bins.sorted
    def label(i: Int): String = s"[${fmt(sorted(i))},${fmt(sorted(i + 1))})"
    var out: Column = when(c < sorted.head, if (ifString) lit(s"(-inf,${fmt(sorted.head)})") else lit(0))
    for (i <- 0 until sorted.length - 1)
      out = out.when(c < sorted(i + 1), if (ifString) lit(label(i)) else lit(i + 1))
    out.otherwise(if (ifString) lit(s"[${fmt(sorted.last)},inf)") else lit(sorted.length))
  }

  private def fmt(d: Double): String =
    if (d == math.floor(d) && !d.isInfinite) d.toLong.toString else d.toString

  /** Quantile-based bins: split points from approxQuantile (the reference's
    * Bucketizer path, features.py:143-282). Returns (withBinColumn, splits). */
  def cutBinsQuantile(df: DataFrame, colName: String, numBins: Int,
                      relativeError: Double = 1e-4): (DataFrame, Array[Double]) = {
    val probes = (1 until numBins).map(_.toDouble / numBins).toArray
    val splits = df.stat.approxQuantile(colName, probes, relativeError).distinct
    (df.withColumn(s"${colName}_bin", cutBins(col(colName), splits.toSeq)), splits)
  }

  /** One-hot: distinct values → 0/1 indicator columns named col_value
    * (features.py:17-109). ALL columns' category sets come from ONE
    * aggregate pass (`collect_set` per column, capped + sorted inside the
    * agg so only ≤ maxCategories+1 values per column reach the driver) —
    * not k sequential distinct+collect round trips — and all indicators are
    * added in one projection. Aggregate state is O(distinct) per column;
    * the cardinality cap errors exactly like the reference does. */
  def oneHot(df: DataFrame, cols: Seq[String], maxCategories: Int = 100): DataFrame = {
    if (cols.isEmpty) return df
    val setCols = cols.map(c =>
      slice(sort_array(collect_set(col(c).cast("string"))), 1, maxCategories + 1).as(c))
    val row = df.agg(setCols.head, setCols.tail: _*).head()
    val indicators = cols.zipWithIndex.flatMap { case (c, i) =>
      val values = row.getSeq[String](i).filter(_ != null).sorted
      require(values.length <= maxCategories,
        s"one_hot: column $c exceeds $maxCategories categories")
      values.map { v =>
        val safe = v.replaceAll("[^A-Za-z0-9_]", "_")
        when(col(c).cast("string") === v, 1).otherwise(0).as(s"${c}_$safe")
      }
    }
    df.select(col("*") +: indicators: _*)
  }
}
