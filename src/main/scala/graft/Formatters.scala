package graft

import graft.agg.{OlsSummary, XexptResult}
import org.apache.spark.sql.Row

/** Text renderers for the human-facing `.formatted` surfaces the reference
  * prints from its engines: the R `summary(lm)`-style block for OLS
  * (ols.h:508-547's get_formatted_result) and the two-row experiment table
  * for xexpt_ttest_2samp (xexpt_ttest_2samp.h:540-612, parsed into columns
  * by UdfFormatUtil.java:15-123). The typed structs remain the
  * machine-facing surface; these produce the visual-parity text. */
object Formatters {

  private val W = 16
  private def pad(s: String): String =
    if (s.length >= W) s + " " else s + " " * (W - s.length)
  private def f6(d: Double): String = f"$d%.6f"
  private def i0(d: Double): String = math.floor(d + 0.5).toLong.toString

  // ------------------------------------------------------------------ OLS

  /** R `lm`-style summary block. `names` label the x columns (default
    * x1..xk, like the reference when no argument names are stored). */
  def formatOls(s: OlsSummary, names: Seq[String] = Seq.empty): String = {
    val xNames = if (names.nonEmpty) names else (1 to s.k).map(i => s"x$i")
    require(xNames.length == s.k, s"need ${s.k} names, got ${xNames.length}")
    val df = s.n - s.k - (if (s.use_bias) 1 else 0)
    def row(name: String, i: Int): String =
      pad(name) + pad(f6(s.coefficients(i))) + pad(f6(s.stderr(i))) +
        pad(f6(s.t_values(i))) + pad(f6(s.p_values(i))) + "\n"
    val sb = new StringBuilder
    sb.append("\nCall:\n  lm( formula = y ~ ")
      .append(xNames.mkString(" + ")).append(" )\n\n")
    sb.append("Coefficients:\n")
    sb.append(pad(".")).append(pad("Estimate")).append(pad("Std. Error"))
      .append(pad("t value")).append(pad("Pr(>|t|)")).append("\n")
    if (s.use_bias) sb.append(row("(Intercept)", s.k))
    (0 until s.k).foreach(i => sb.append(row(xNames(i), i)))
    sb.append(s"\nResidual standard error: ${f6(s.residual_stderr)} on $df degrees of freedom\n")
    sb.append(s"Multiple R-squared: ${f6(s.r2)}, Adjusted R-squared: ${f6(s.adj_r2)}\n")
    sb.append(s"F-statistic: ${f6(s.f_statistic)} on ${s.k} and $df DF,  p-value: ${f6(s.f_pvalue)}\n")
    sb.toString
  }

  /** Row overload: pass the struct produced by `functions.ols(...)`. */
  def formatOls(row: Row): String = formatOls(olsFromRow(row))

  private def olsFromRow(r: Row): OlsSummary = OlsSummary(
    r.getAs[Long]("n"), r.getAs[Int]("k"), r.getAs[Boolean]("use_bias"),
    r.getAs[Seq[Double]]("coefficients").toArray,
    r.getAs[Seq[Double]]("stderr").toArray,
    r.getAs[Seq[Double]]("t_values").toArray,
    r.getAs[Seq[Double]]("p_values").toArray,
    r.getAs[Double]("residual_stderr"), r.getAs[Double]("r2"),
    r.getAs[Double]("adj_r2"), r.getAs[Double]("f_statistic"),
    r.getAs[Double]("f_pvalue"))

  // ---------------------------------------------------------------- xexpt

  /** Two-block experiment table: per-group rows (groupname / denominator /
    * numerator / mean / std_samp), then the inference row (diff_relative,
    * relative CI, p-value, t-statistic, absolute diff + CI, power,
    * recommend_samples, MDE) — the layout UdfFormatUtil parses from lines
    * 1-3 and 5-6 of the engine text. */
  def formatXexpt(r: XexptResult, alpha: Double = 0.05, mde: Double = 0.005,
                  power: Double = 0.8, metricType: String = "avg"): String = {
    val ci = {
      val p = (1 - alpha) * 100
      if (p == math.floor(p)) p.toInt.toString else p.toString
    }
    val avg = metricType == "avg"
    val hasPre = !r.numerator_pre0.isNaN && r.numerator_pre0 != 0.0
    // pre-period denominator column only under avg (sum replaces the
    // denominator with the traffic ratio; xexpt_ttest_2samp.h:540-612)
    val hasPreDen = hasPre && avg && !r.denominator_pre0.isNaN && r.denominator_pre0 != 0.0
    // pre-period order matches the reference's add_result3 sequence:
    // denominator_pre (avg-only) BEFORE numerator_pre, both inside the
    // same !denominators_pre.empty() block (xexpt_ttest_2samp.h:560-570)
    val head1 = Seq("groupname") ++
      (if (avg) Seq("denominator") else Seq("ratio")) ++ Seq("numerator") ++
      (if (hasPreDen) Seq("denominator_pre") else Seq.empty) ++
      (if (hasPre) Seq("numerator_pre") else Seq.empty) ++
      (if (avg) Seq("mean", "std_samp") else Seq.empty)
    def groupRow(name: Long, den: Double, num: Double, pre: Double,
                 preDen: Double, mean: Double, std: Double): Seq[String] =
      Seq(name.toString) ++ Seq(i0(den)) ++ Seq(f6(num)) ++
        (if (hasPreDen) Seq(i0(preDen)) else Seq.empty) ++
        (if (hasPre) Seq(f6(pre)) else Seq.empty) ++
        (if (avg) Seq(f6(mean), f6(std)) else Seq.empty)
    val g0 = groupRow(r.groupname0, r.denominator0, r.numerator0,
      r.numerator_pre0, r.denominator_pre0, r.mean0, r.std_samp0)
    val g1 = groupRow(r.groupname1, r.denominator1, r.numerator1,
      r.numerator_pre1, r.denominator_pre1, r.mean1, r.std_samp1)
    // mde/power labels carry std::to_string's fixed 6 decimals so
    // UdfFormatUtil-style column parsers key on the exact header text
    val head2 = Seq("diff_relative", s"$ci%_relative_CI", "p-value",
      "t-statistic") ++
      (if (avg) Seq("diff", s"$ci%_CI") else Seq.empty) ++
      Seq(s"power(MDE=${f6(mde)})", "recommend_samples", s"MDE(power=${f6(power)})")
    val row2 = Seq(f"${r.diff_relative * 100}%.6f%%",
      f"[${r.lower_relative * 100}%.6f%%,${r.upper_relative * 100}%.6f%%]",
      f6(r.p_value), f6(r.t_statistic)) ++
      (if (avg) Seq(f6(r.diff), s"[${f6(r.lower)},${f6(r.upper)}]") else Seq.empty) ++
      Seq(f6(r.power), i0(r.recommend_samples), f6(r.mde))
    def line(cells: Seq[String]): String = cells.map(pad).mkString
    "\n" + line(head1) + "\n" + line(g0) + "\n" + line(g1) + "\n\n" +
      line(head2) + "\n" + line(row2) + "\n"
  }

  /** Row overload: pass the struct produced by
    * `functions.xexpt_ttest_2samp(...)`. */
  def formatXexpt(row: Row, alpha: Double, mde: Double, power: Double,
                  metricType: String): String =
    formatXexpt(xexptFromRow(row), alpha, mde, power, metricType)
  def formatXexpt(row: Row): String = formatXexpt(xexptFromRow(row))

  private def xexptFromRow(r: Row): XexptResult = XexptResult(
    r.getAs[Long]("groupname0"), r.getAs[Long]("groupname1"),
    r.getAs[Double]("numerator0"), r.getAs[Double]("numerator1"),
    r.getAs[Double]("denominator0"), r.getAs[Double]("denominator1"),
    r.getAs[Double]("numerator_pre0"), r.getAs[Double]("numerator_pre1"),
    r.getAs[Double]("denominator_pre0"), r.getAs[Double]("denominator_pre1"),
    r.getAs[Double]("mean0"), r.getAs[Double]("mean1"),
    r.getAs[Double]("std_samp0"), r.getAs[Double]("std_samp1"),
    r.getAs[Double]("diff_relative"), r.getAs[Double]("lower_relative"),
    r.getAs[Double]("upper_relative"), r.getAs[Double]("p_value"),
    r.getAs[Double]("t_statistic"), r.getAs[Double]("diff"),
    r.getAs[Double]("lower"), r.getAs[Double]("upper"),
    r.getAs[Double]("power"), r.getAs[Double]("recommend_samples"),
    r.getAs[Double]("mde"))

  // ---------------------------------------------------------- causal tree

  /** Per-leaf hypothesis-test table for an honest causal tree (the
    * reference's leaf t-test report, uplift.py:1243-1895): one aligned row
    * per leaf with n, effect, stderr, t, p and the root→leaf predicate. */
  def formatLeafTests(m: graft.ops.CausalTree.Model): String = {
    val sb = new StringBuilder
    sb.append("\n").append(pad("leaf")).append(pad("n")).append(pad("effect"))
      .append(pad("stderr")).append(pad("t value")).append(pad("Pr(>|t|)"))
      .append("path").append("\n")
    m.feature.indices.filter(m.isLeaf).foreach { i =>
      val t = m.effect(i) / m.stderr(i)
      sb.append(pad(i.toString)).append(pad(m.n(i).toString))
        .append(pad(f6(m.effect(i)))).append(pad(f6(m.stderr(i))))
        .append(pad(f6(t))).append(pad(f6(m.pValue(i))))
        .append(m.leafPath(i)).append("\n")
    }
    sb.toString
  }
}
