package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-exploration summaries behind the reference's notebook plotting
  * helpers (lib/tools.py:309-357 `histplot`, tools.py:361-430 `boxplot`).
  * The matplotlib rendering is out of scope; these return the underlying
  * data tables — the bin-count frame and the five-number/whisker row — that
  * the plots draw, as first-class queryable outputs.
  */
object Explore {

  /** Equal-width histogram: (bin, lo, hi, count), `bins` rows, empty bins
    * included with count 0 (a bar chart with holes is wrong).
    *
    * Two scans, constant state: ONE aggregate for (min, max, n), then ONE
    * groupBy on the computed bin ordinal (≤ bins cells) outer-joined with
    * a `spark.range(bins)` frame — bins rows end to end, never row-scale
    * anywhere. The reference samples 100k rows to draw its histogram
    * (tools.py:335-350); the full-scan bin counts here are exact at any
    * size for the same exchange cost as a global count. The max value
    * lands in the last bin (right-closed top edge, numpy convention). */
  def histogram(df: DataFrame, x: Column, bins: Int = 50): DataFrame = {
    require(bins >= 1, s"histogram: bins must be >= 1, got $bins")
    val xd = x.cast("double")
    val r = df.agg(count(xd).as("n"), min(xd).as("mn"), max(xd).as("mx")).head()
    require(r.getLong(0) > 0,
      "histogram: no non-null values (empty bins would otherwise read as a zero range)")
    val (mn, mx) = (r.getDouble(1), r.getDouble(2))
    val spark = df.sparkSession
    if (mx == mn)
      return spark.range(1).select(col("id").cast("int").as("bin"),
        lit(mn).as("lo"), lit(mx).as("hi"), lit(r.getLong(0)).as("count"))
    val width = (mx - mn) / bins
    val binCol = least(floor((xd - lit(mn)) / lit(width)).cast("int"),
      lit(bins - 1))
    val counts = df.filter(xd.isNotNull)
      .groupBy(binCol.as("bin")).agg(count(lit(1)).as("count"))
    spark.range(bins).select(col("id").cast("int").as("bin"))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"),
        (lit(mn) + col("bin") * lit(width)).as("lo"),
        (lit(mn) + (col("bin") + lit(1)) * lit(width)).as("hi"),
        coalesce(col("count"), lit(0L)).as("count"))
      .orderBy(col("bin"))
  }

  /** Grouped equal-width histogram: (group, bin, lo, hi, count) — the data
    * behind the reference's `matching_plot` overlay (dataframe/match.py:
    * 228-295 draws the per-arm distribution of a covariate or propensity
    * score from a 10k-row sample per arm; these are the exact full-scan
    * counts). Bin edges are GLOBAL (one (min, max) pass over all rows) so
    * the per-group histograms share an axis and overlay comparably.
    *
    * Scale shape: one constant-state agg for the edges, ONE
    * groupBy(group, bin) (≤ groups·bins cells), and a zero-fill join
    * against the (distinct groups × bins) dim frame — built from the
    * already-aggregated cell table, so no extra row-scale pass. */
  def histogramBy(df: DataFrame, group: Column, x: Column,
                  bins: Int = 50): DataFrame = {
    require(bins >= 1, s"histogram_by: bins must be >= 1, got $bins")
    val xd = x.cast("double")
    val r = df.agg(count(xd).as("n"), min(xd).as("mn"), max(xd).as("mx")).head()
    require(r.getLong(0) > 0, "histogram_by: no non-null values")
    val (mn, mx) = (r.getDouble(1), r.getDouble(2))
    val nb = if (mx == mn) 1 else bins
    val width = if (mx == mn) 0.0 else (mx - mn) / bins
    val binCol =
      if (mx == mn) lit(0)
      else least(floor((xd - lit(mn)) / lit(width)).cast("int"), lit(bins - 1))
    // the cell table feeds BOTH the group dim and the zero-fill join;
    // materialize it (≤ groups·bins rows) so the row-scale scan runs
    // ONCE — without this the plan scans the input twice, because the
    // two consumers prune differently and exchange reuse can't dedupe
    val counts = graft.Ckpt.checkpoint(
      df.filter(xd.isNotNull)
        .groupBy(group.as("group"), binCol.as("bin"))
        .agg(count(lit(1)).as("count")), eager = true)
    val groups = counts.select(col("group")).distinct()
    val spark = df.sparkSession
    val dim = groups.crossJoin(
      spark.range(nb).select(col("id").cast("int").as("bin")))
    dim.join(counts, Seq("group", "bin"), "left")
      .select(col("group"), col("bin"),
        (lit(mn) + col("bin") * lit(width)).as("lo"),
        (if (mx == mn) lit(mx)
         else lit(mn) + (col("bin") + lit(1)) * lit(width)).as("hi"),
        coalesce(col("count"), lit(0L)).as("count"))
      .orderBy(col("group"), col("bin"))
  }

  /** Box-plot statistics, one row: n, min, q1, median, q3, max, iqr,
    * whisker_lo = max(q1 − 1.5·IQR, min), whisker_hi = min(q3 + 1.5·IQR,
    * max) (the reference's box geometry, tools.py:384-396), plus the
    * outlier counts beyond each whisker.
    *
    * Two scans, constant state: ONE aggregate for (n, min, max, quartiles)
    * — `exact = false` (default) takes the quartiles from the
    * percentile_approx sketch (the 100 TB path); `exact = true` uses the
    * sort-buffer `percentile` (gate-SF parity with DuckDB's quantile_cont)
    * — then ONE conditional-count pass for the outliers. */
  def boxStats(df: DataFrame, x: Column, exact: Boolean = false): DataFrame = {
    val xd = x.cast("double")
    val qs = array(lit(0.25), lit(0.5), lit(0.75))
    val qCol = if (exact) percentile(xd, qs)
      else percentile_approx(xd, qs, lit(100000))
    val r = df.agg(count(xd).as("n"), min(xd).as("mn"), max(xd).as("mx"),
      qCol.as("q")).head()
    require(r.getLong(0) > 0, "box_stats: no non-null values")
    val n = r.getLong(0)
    val mn = r.getDouble(1); val mx = r.getDouble(2)
    val q = r.getSeq[Double](3)
    val (q1, med, q3) = (q(0), q(1), q(2))
    val iqr = q3 - q1
    val wLo = math.max(q1 - 1.5 * iqr, mn)
    val wHi = math.min(q3 + 1.5 * iqr, mx)
    val oc = df.agg(
      sum(when(xd < wLo, 1L).otherwise(0L)).as("lo"),
      sum(when(xd > wHi, 1L).otherwise(0L)).as("hi")).head()
    import df.sparkSession.implicits._
    Seq((n, mn, q1, med, q3, mx, iqr, wLo, wHi, oc.getLong(0), oc.getLong(1)))
      .toDF("n", "min", "q1", "median", "q3", "max", "iqr",
        "whisker_lo", "whisker_hi", "n_outliers_lo", "n_outliers_hi")
  }

  /** Release-to-release PROFILE DIFF: the schema/shape audit a pipeline
    * runs between dataset versions, one step up from [[Dedup.snapshotDiff]]'s
    * row-level diff. Column status (added / removed / type_changed / kept)
    * comes from pure schema comparison (no job); per-side metrics (rows,
    * null fraction, distinct count, min/max as strings) come from ONE
    * aggregate pass PER SIDE over that side's compared columns —
    * `exactDistinct = false` (default) keeps distincts HLL-approximate
    * (the 100 TB path), `true` gives exact parity for audited releases.
    * Returns one row per column in either schema, absent-side metrics
    * null. */
  def profileDiff(oldDf: DataFrame, newDf: DataFrame,
                  exactDistinct: Boolean = false): DataFrame = {
    val spark = oldDf.sparkSession
    import spark.implicits._
    val oldT = oldDf.schema.map(f => f.name -> f.dataType.catalogString).toMap
    val newT = newDf.schema.map(f => f.name -> f.dataType.catalogString).toMap
    val cols = (oldDf.schema.map(_.name) ++
      newDf.schema.map(_.name).filterNot(oldT.contains)).toSeq
    def side(df: DataFrame, names: Seq[String]): Map[String, (Long, Long, Long, String, String)] = {
      if (names.isEmpty) return Map.empty
      val aggs = count(lit(1)).as("__rows") +: names.flatMap { c =>
        Seq(count(col(c)).as(s"nn_$c"),
          (if (exactDistinct) countDistinct(col(c))
           else approx_count_distinct(col(c))).as(s"nd_$c"),
          min(col(c)).cast("string").as(s"mn_$c"),
          max(col(c)).cast("string").as(s"mx_$c"))
      }
      val r = df.agg(aggs.head, aggs.tail: _*).head()
      val n = r.getAs[Long]("__rows")
      names.map { c =>
        c -> ((n, n - r.getAs[Long](s"nn_$c"), r.getAs[Long](s"nd_$c"),
          r.getAs[String](s"mn_$c"), r.getAs[String](s"mx_$c")))
      }.toMap
    }
    val o = side(oldDf, cols.filter(oldT.contains))
    val nw = side(newDf, cols.filter(newT.contains))
    val out = cols.map { c =>
      val status = (oldT.get(c), newT.get(c)) match {
        case (Some(_), None) => "removed"
        case (None, Some(_)) => "added"
        case (Some(a), Some(b)) if a != b => "type_changed"
        case _ => "kept"
      }
      def frac(m: Option[(Long, Long, Long, String, String)]): Option[Double] =
        m.map { case (n, nulls, _, _, _) =>
          if (n == 0) 0.0 else nulls.toDouble / n }
      (c, status, oldT.get(c), newT.get(c),
        o.get(c).map(_._1), nw.get(c).map(_._1),
        frac(o.get(c)), frac(nw.get(c)),
        o.get(c).map(_._3), nw.get(c).map(_._3),
        o.get(c).flatMap(x => Option(x._4)), nw.get(c).flatMap(x => Option(x._4)),
        o.get(c).flatMap(x => Option(x._5)), nw.get(c).flatMap(x => Option(x._5)))
    }
    out.toDF("column", "status", "dtype_old", "dtype_new", "n_old", "n_new",
      "null_frac_old", "null_frac_new", "n_distinct_old", "n_distinct_new",
      "min_old", "min_new", "max_old", "max_new")
  }

  /** Heavy hitters: approximate top-k items of a column by frequency via
    * Spark 4's native `approx_top_k` (a DataSketches frequent-items
    * sketch — mergeable, state bounded by `maxTracked` counters at every
    * stage regardless of true cardinality; estimate error <= n/maxTracked).
    * When the column's distinct count is <= maxTracked the counts are
    * EXACT — the profile/dashboard regime — while a row-scale id column
    * stays safely approximate instead of OOMing a groupBy-count-sort.
    * The sketch's own item order is not contractual, so rows are
    * re-ranked deterministically by (count desc, item). Returns
    * (rank, item, count). */
  def topK(df: DataFrame, c: Column, k: Int = 10,
           maxTracked: Int = 10000): DataFrame = {
    require(k >= 1 && maxTracked >= k,
      s"top_k: need 1 <= k <= maxTracked, got k=$k maxTracked=$maxTracked")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("count").desc, col("item"))
    df.select(call_function("approx_top_k", c.cast("string"), lit(k),
        lit(maxTracked)).as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("count"))
      // <= k rows: the single-partition window is over the sketch result,
      // never over row-scale data
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("item"), col("count"))
  }

  /** Benford first-digit audit (Newcomb 1881/Benford 1938; Nigrini's
    * fraud-screening MAD readout): naturally occurring multi-magnitude
    * amounts have first-digit shares log₁₀(1+1/d) — fabricated or
    * systematically generated values usually don't. One row per digit:
    * (digit, n, share, expected_share, chisq_term) — Σ chisq_term is the
    * 8-dof Pearson statistic and avg|share−expected| is Nigrini's MAD.
    *
    * 100 TB shape: a pure column expression for the digit (no UDF),
    * ONE groupBy into ≤ 9 cells, a broadcast join against the expected
    * table. Zero/null values are excluded (they carry no leading digit);
    * negatives contribute |v|. Exactly-power-of-ten values hinge on
    * log₁₀ returning the exact integer — the raw-digit-10 branch remaps
    * them to digit 1 so a 1-ulp-low library log cannot fabricate an
    * out-of-range digit. */
  def benford(df: DataFrame, value: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vd = abs(value.cast("double"))
    val e = floor(log10(vd))
    val raw = floor(vd / pow(lit(10.0), e))
    val digit = when(raw === 10, 1).otherwise(raw).cast("int")
    val cells = df.filter(vd.isNotNull && vd > 0)
      .groupBy(digit.as("digit")).agg(count(lit(1)).as("n"))
    val expected = (1 to 9).map(d1 =>
      (d1, math.log10(1.0 + 1.0 / d1))).toDF("digit", "expected_share")
    val tot = cells.agg(sum(col("n"))).head()
    require(!tot.isNullAt(0) && tot.getLong(0) > 0,
      "benford: no nonzero values")
    val n = tot.getLong(0).toDouble
    expected.join(broadcast(cells), Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
        (coalesce(col("n"), lit(0L)) / n).as("share"),
        col("expected_share"))
      .withColumn("chisq_term",
        lit(n) * (col("share") - col("expected_share")) *
          (col("share") - col("expected_share")) / col("expected_share"))
      .orderBy(col("digit"))
  }

  /** Gini concentration + top-share summary of a nonnegative value
    * (revenue per customer, tokens per document, events per user) — the
    * inequality audit behind "how concentrated is this corpus/revenue":
    *
    *   G = 2·Σᵢ i·y_(i) / (n·Σy) − (n+1)/n   (ranks i ascending)
    *
    * plus the Lorenz top shares (what fraction of the total the largest
    * 1% / 10% of rows hold). 100 TB shape: the rank comes from
    * [[RangeCumSum.withRowNumber]] (range-partitioned two-phase row
    * number — no single-partition sort), then ONE aggregate closes G and
    * both shares; the value-domain guard rides the same pass. Ties at a
    * share boundary are value-identical, so the shares are deterministic
    * even though tie order is not. Returns one row:
    * (n, total, mean, gini, top1_share, top10_share). */
  def gini(df: DataFrame, value: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vd = value.cast("double")
    val base = df.filter(vd.isNotNull).select(vd.as("__v"))
    RangeCumSum.withRowNumber(base, Seq(col("__v").asc), "__rank") {
      (ranked, n) =>
        require(n >= 2, s"gini: need at least 2 non-null rows, got $n")
        val r = ranked.agg(
          sum(col("__v")).as("total"),
          sum(col("__v") * col("__rank")).as("iy"),
          sum(when(col("__v") < 0, 1L).otherwise(0L)).as("neg"),
          sum(when(col("__rank") > n - n / 100, col("__v"))
            .otherwise(lit(0.0))).as("top1"),
          sum(when(col("__rank") > n - n / 10, col("__v"))
            .otherwise(lit(0.0))).as("top10")).head()
        require(r.getAs[Long]("neg") == 0,
          s"gini: ${r.getAs[Long]("neg")} negative values — the Lorenz " +
            "construction needs a nonnegative measure")
        val total = r.getAs[Double]("total")
        require(total > 0, "gini: total is zero")
        val g = 2.0 * r.getAs[Double]("iy") / (n * total) -
          (n + 1.0) / n
        Seq((n, total, total / n, g,
            r.getAs[Double]("top1") / total, r.getAs[Double]("top10") / total))
          .toDF("n", "total", "mean", "gini", "top1_share", "top10_share")
    }
  }

  /** k-anonymity audit (Sweeney 2002) — the privacy gate next to
    * [[TextOps]]' PII redaction a dataset release runs on its
    * quasi-identifier columns: every combination of the quasi-ids must be
    * shared by at least k rows, or the rare combination re-identifies.
    * NULL in a quasi-id is its own equivalence class (the conservative
    * read — a null pattern can re-identify too).
    *
    * 100 TB shape: ONE groupBy over the quasi-id tuple + one cell-scale
    * aggregate; class cardinality unbounded, O(1) driver. Returns one
    * row: (n, classes, min_class_size, k, violating_classes,
    * violating_rows, k_anonymous). */
  def kAnonymity(df: DataFrame, quasiIds: Seq[Column], k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(quasiIds.nonEmpty, "k_anonymity: need at least one quasi-id column")
    require(k >= 2, s"k_anonymity: k must be >= 2, got $k")
    val cells = df
      .groupBy(quasiIds.zipWithIndex.map { case (c, i) => c.as(s"__q$i") }: _*)
      .agg(count(lit(1)).as("c"))
    val r = cells.agg(sum(col("c")).as("n"), count(lit(1)).as("classes"),
      min(col("c")).as("minc"),
      sum(when(col("c") < k, 1L).otherwise(0L)).as("vc"),
      sum(when(col("c") < k, col("c")).otherwise(0L)).as("vr")).head()
    require(!r.isNullAt(0), "k_anonymity: the table is empty")
    val minC = r.getAs[Long]("minc")
    Seq((r.getAs[Long]("n"), r.getAs[Long]("classes"), minC, k,
        r.getAs[Long]("vc"), r.getAs[Long]("vr"), minC >= k))
      .toDF("n", "classes", "min_class_size", "k", "violating_classes",
        "violating_rows", "k_anonymous")
  }
}
