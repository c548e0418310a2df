package graft

import graft.agg.{OlsSummary, XexptResult}
import org.scalatest.funsuite.AnyFunSuite

/** Golden-string checks modulo whitespace: each logical line of the
  * rendered block must match after collapsing runs of spaces. */
class FormattersSpec extends AnyFunSuite {

  private def norm(s: String): Seq[String] =
    s.split("\n").map(_.trim.replaceAll("\\s+", " ")).filter(_.nonEmpty).toSeq

  test("formatOls renders the R lm block") {
    val s = OlsSummary(
      n = 100, k = 2, use_bias = true,
      coefficients = Array(1.5, -2.0, 0.5),
      stderr = Array(0.1, 0.2, 0.05),
      t_values = Array(15.0, -10.0, 10.0),
      p_values = Array(0.0, 1e-4, 0.02),
      residual_stderr = 1.23, r2 = 0.9, adj_r2 = 0.89,
      f_statistic = 450.0, f_pvalue = 1e-9)
    val lines = norm(Formatters.formatOls(s, Seq("qty", "disc")))
    assert(lines.head == "Call:")
    assert(lines(1) == "lm( formula = y ~ qty + disc )")
    assert(lines(2) == "Coefficients:")
    assert(lines(3) == ". Estimate Std. Error t value Pr(>|t|)")
    assert(lines(4) == "(Intercept) 0.500000 0.050000 10.000000 0.020000")
    assert(lines(5) == "qty 1.500000 0.100000 15.000000 0.000000")
    assert(lines(6) == "disc -2.000000 0.200000 -10.000000 0.000100")
    assert(lines(7) == "Residual standard error: 1.230000 on 97 degrees of freedom")
    assert(lines(8) == "Multiple R-squared: 0.900000, Adjusted R-squared: 0.890000")
    assert(lines(9) == "F-statistic: 450.000000 on 2 and 97 DF, p-value: 0.000000")
    // default names fall back to x1..xk
    assert(norm(Formatters.formatOls(s))(1) == "lm( formula = y ~ x1 + x2 )")
  }

  test("formatXexpt renders the two-block experiment table") {
    val r = XexptResult(
      groupname0 = 0L, groupname1 = 1L,
      numerator0 = 5000.25, numerator1 = 5100.75,
      denominator0 = 1000.2, denominator1 = 999.8,
      numerator_pre0 = 0.0, numerator_pre1 = 0.0,
      denominator_pre0 = 0.0, denominator_pre1 = 0.0,
      mean0 = 5.0, mean1 = 5.1,
      std_samp0 = 1.2, std_samp1 = 1.3,
      diff_relative = 0.02, lower_relative = -0.001, upper_relative = 0.041,
      p_value = 0.0567, t_statistic = 1.91,
      diff = 0.1, lower = -0.005, upper = 0.205,
      power = 0.42, recommend_samples = 12345.6, mde = 0.0123)
    val lines = norm(Formatters.formatXexpt(r))
    assert(lines(0) == "groupname denominator numerator mean std_samp")
    assert(lines(1) == "0 1000 5000.250000 5.000000 1.200000")
    assert(lines(2) == "1 1000 5100.750000 5.100000 1.300000")
    assert(lines(3) == "diff_relative 95%_relative_CI p-value t-statistic diff 95%_CI power(MDE=0.005000) recommend_samples MDE(power=0.800000)")
    assert(lines(4) ==
      "2.000000% [-0.100000%,4.100000%] 0.056700 1.910000 0.100000 [-0.005000,0.205000] 0.420000 12346 0.012300")
    // sum metric drops denominator/mean/std and the absolute-diff block
    val sumLines = norm(Formatters.formatXexpt(r, metricType = "sum"))
    assert(sumLines(0) == "groupname ratio numerator")
    assert(!sumLines(3).contains("95%_CI ") || sumLines(3).contains("relative"))
    // alpha changes the CI labels
    assert(norm(Formatters.formatXexpt(r, alpha = 0.01))(3).contains("99%_relative_CI"))
    // pre-period data adds denominator_pre BEFORE numerator_pre, matching
    // the reference's add_result3 order (xexpt_ttest_2samp.h:560-570)
    val rPre = r.copy(numerator_pre0 = 4900.0, numerator_pre1 = 4950.0,
      denominator_pre0 = 998.0, denominator_pre1 = 997.0)
    val preLines = norm(Formatters.formatXexpt(rPre))
    assert(preLines(0) ==
      "groupname denominator numerator denominator_pre numerator_pre mean std_samp")
    assert(preLines(1) == "0 1000 5000.250000 998 4900.000000 5.000000 1.200000")
  }

  test("Row overloads rebuild from aggregate struct output") {
    val spark = SparkTestSession.spark
    import org.apache.spark.sql.functions._
    val df = spark.range(2000).select(
      col("id").as("uin"),
      (col("id") % 2).cast("int").as("t"),
      (col("id") % 7).cast("double").as("x"))
      .withColumn("y", col("x") * 2.0 + col("t") * 0.5)
    val olsRow = df.select(functions.ols(col("y"), Seq(col("x"))).as("m"))
      .select("m.*").head()
    val olsTxt = Formatters.formatOls(olsRow)
    assert(olsTxt.contains("(Intercept)") && olsTxt.contains("Multiple R-squared"))
    val xRow = df.select(functions.xexpt_ttest_2samp(col("uin"), col("t"),
      Seq(col("y"), lit(1.0))).as("r")).select("r.*").head()
    val xTxt = Formatters.formatXexpt(xRow)
    assert(xTxt.contains("groupname") && xTxt.contains("recommend_samples"))
    // DSL conveniences produce the same blocks
    import graft.api.implicits._
    val rep = df.withColumn("one", lit(1.0)).olsReport("y", Seq("x"))
    assert(rep.contains("lm( formula = y ~ x )"))
    val xr = df.withColumn("one", lit(1.0)).xexptReport("uin", "t", "y", "one")
    assert(xr.contains("95%_relative_CI"))
  }
}
