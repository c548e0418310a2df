package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Feature engineering parity ops (reference CutBinsParser.java:1-94,
  * features.py:17-282). */
object Features {

  /** Bounded distinct-set aggregate: collects up to cap+1 DISTINCT values
    * and then STOPS inserting, so aggregate state is ≤ cap+1 strings no
    * matter the column's true cardinality — `collect_set`'s state, by
    * contrast, is O(distinct), and a mis-declared row-scale string column
    * (URL, user id) OOMs the single task that merges the global partials.
    * A result of length cap+1 means "over the cap" — exactness of WHICH
    * cap+1 values survive doesn't matter, because callers discard
    * over-cap sets. Under the cap the set is complete: no partial can
    * saturate when global distinct ≤ cap, so the merged union misses
    * nothing. Output is sorted (TreeSet natural order). */
  private[graft] class BoundedSetAgg(cap: Int)
      extends Aggregator[String, java.util.TreeSet[String], Array[String]] {
    def zero: java.util.TreeSet[String] = new java.util.TreeSet[String]()
    def reduce(b: java.util.TreeSet[String], a: String): java.util.TreeSet[String] = {
      if (a != null && b.size <= cap) b.add(a)
      b
    }
    def merge(b1: java.util.TreeSet[String], b2: java.util.TreeSet[String])
        : java.util.TreeSet[String] = {
      val it = b2.iterator()
      while (it.hasNext && b1.size <= cap) b1.add(it.next())
      b1
    }
    def finish(b: java.util.TreeSet[String]): Array[String] =
      b.toArray(new Array[String](b.size))
    def bufferEncoder = Encoders.kryo[java.util.TreeSet[String]]
    def outputEncoder =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
  }

  /** `boundedSet(cap)(col)` as an untyped aggregate column. */
  private[graft] def boundedSet(cap: Int, c: Column): Column =
    udaf(new BoundedSetAgg(cap), Encoders.STRING)(c)

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
    * aggregate pass ([[BoundedSetAgg]] per column — state capped at
    * maxCategories+1 values per column at every stage, so a mis-declared
    * high-cardinality column fails the cap check instead of OOMing the
    * merge task) — not k sequential distinct+collect round trips — and all
    * indicators are added in one projection. The cardinality cap errors
    * exactly like the reference does. */
  def oneHot(df: DataFrame, cols: Seq[String], maxCategories: Int = 100): DataFrame = {
    if (cols.isEmpty) return df
    val setCols = cols.map(c =>
      boundedSet(maxCategories, col(c).cast("string")).as(c))
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

  /** Split a frame's columns into (numeric, categorical-string) by dtype,
    * skipping timestamps/dates and the exclude list — the reference's
    * `get_num_cat_feat` (spark_utility.py:117-166). Pure schema
    * inspection, no job. */
  def numCatSplit(df: DataFrame,
                  exclude: Seq[String] = Nil): (Seq[String], Seq[String]) = {
    val skip = exclude.toSet
    val ts = df.dtypes.collect {
      case (n, t) if t.startsWith("Timestamp") || t.startsWith("Date") => n
    }.toSet
    val num = df.dtypes.collect {
      case (n, t) if !skip(n) && !ts(n) &&
        Seq("Int", "Long", "Double", "Float", "Short", "Byte", "Decimal")
          .exists(t.startsWith) => n
    }.toSeq
    val cat = df.dtypes.collect {
      case (n, t) if !skip(n) && !ts(n) && t.startsWith("String") => n
    }.toSeq
    (num, cat)
  }

  /** The reference's `feature_process` (spark_utility.py:519-599) as one
    * composed pipeline: classify columns, null-fill (0.0 / "NA"), scale
    * every numeric column (minmax or zscore), one-hot the categorical
    * columns whose cardinality is at or below `oneHotThreshold`, and
    * assemble everything into a dense `features` array<double>.
    *
    * 100 TB shape: ALL per-column statistics — min/max or mean/std for
    * every numeric column AND the capped category sets for every
    * categorical column — come from ONE aggregate pass with TRULY
    * constant-size state: numeric stats are 4 doubles each, and the
    * per-categorical sets are [[BoundedSetAgg]]s whose state never exceeds
    * oneHotThreshold+1 strings at ANY stage (partial, shuffle, final
    * merge) — a mis-declared row-scale string column (URL, user id)
    * saturates its set and is dropped from the feature vector, instead of
    * `collect_set` hauling every distinct value into the single global
    * merge task. The transform itself is a single projection that stays
    * in the scan's codegen stage. No MLlib Pipeline object, no per-column
    * jobs.
    *
    * A constant numeric column (max == min or std == 0) scales to 0.0,
    * matching MinMaxScaler/StandardScaler degenerate behavior. A
    * categorical column above the cardinality cap is dropped from the
    * feature vector (the reference's `get_cat_feat_one_hot` filter) —
    * its name is reported in the returned column list so callers see what
    * was excluded rather than silently losing it.
    *
    * Returns (transformed frame, feature names in array order). */
  def featureProcess(df: DataFrame, label: String,
                     exclude: Seq[String] = Nil,
                     scaleMethod: String = "minmax",
                     oneHotThreshold: Int = 30): (DataFrame, Seq[String]) = {
    require(Seq("minmax", "zscore").contains(scaleMethod),
      s"feature_process: unknown scale_method '$scaleMethod'")
    val (numAll, catAll) = numCatSplit(df, exclude)
    require(numAll.contains(label),
      s"feature_process: label '$label' must be a numeric column")
    val num = numAll.filterNot(_ == label)
    val filled = df.na.fill(0.0, num).na.fill("NA", catAll)

    // one pass: per-numeric (min,max,avg,std) + per-categorical capped set
    val numAggs = num.flatMap { c =>
      val d = col(c).cast("double")
      Seq(min(d).as(s"${c}__mn"), max(d).as(s"${c}__mx"),
        avg(d).as(s"${c}__av"), stddev_samp(d).as(s"${c}__sd"))
    }
    val catAggs = catAll.map { c =>
      boundedSet(oneHotThreshold, col(c)).as(s"${c}__set")
    }
    val aggs = numAggs ++ catAggs
    val row = filled.agg(aggs.head, aggs.tail: _*).head()
    require(num.isEmpty || !row.isNullAt(0),
      "feature_process: empty input (per-column stats would read as 0.0)")

    val scaled = num.zipWithIndex.map { case (c, i) =>
      val mn = row.getDouble(4 * i); val mx = row.getDouble(4 * i + 1)
      val av = row.getDouble(4 * i + 2)
      val sd = Option(row.get(4 * i + 3)).fold(0.0)(_.asInstanceOf[Double])
      val d = col(c).cast("double")
      val e = scaleMethod match {
        case "minmax" =>
          if (mx == mn) lit(0.0) else (d - mn) / (mx - mn)
        case "zscore" =>
          if (sd == 0.0 || sd.isNaN) lit(0.0) else (d - av) / sd
      }
      (s"${c}_scaled", e)
    }
    val oneHots = catAll.zipWithIndex.flatMap { case (c, i) =>
      val values = row.getSeq[String](4 * num.length + i).filter(_ != null)
      if (values.length > oneHotThreshold) Nil
      else values.sorted.map { v =>
        val safe = v.replaceAll("[^A-Za-z0-9_]", "_")
        (s"${c}_$safe", when(col(c) === v, 1.0).otherwise(0.0))
      }
    }
    val feats = scaled ++ oneHots
    val out = filled.withColumn("features",
      array(feats.map { case (n, e) => e.cast("double").as(n) }: _*))
    (out, feats.map(_._1))
  }
}
