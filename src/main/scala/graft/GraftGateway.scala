package graft

import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL entry point for the COMPOSED (whole-query) operators — the Spark
  * equivalent of the reference's SQL gateway, which intercepts causal verbs
  * and rewrites them into full queries before the engine sees them (calcite
  * LiftParser.java:26-444, ExactMatchingParser.java:1-173,
  * LinearDMLParser.java:1-176, python `SqlGateWayConn.sql`). Aggregate- and
  * scalar-level names live in [[GraftSql]]; this layer handles the verbs
  * whose output is a TABLE TRANSFORM of the input, which Spark's
  * FunctionRegistry cannot express.
  *
  * Supported (case-insensitive):
  * {{{
  * SELECT lift(ite, y, t, k)                 FROM tbl [WHERE ...]
  * SELECT exact_matching(t, x1, x2, ...)     FROM tbl [WHERE ...]
  * SELECT caliper_matching(t, score, c[, k]) FROM tbl [WHERE ...]
  * SELECT smd(t, x1, x2, ...)                FROM tbl [WHERE ...]
  * SELECT linear_dml(y, t, x1[, x2, ...])    FROM tbl [WHERE ...]
  * SELECT iv_regression(y, t, z[, x...])     FROM tbl [WHERE ...]
  * SELECT cut_bins(x, b)                     FROM tbl [WHERE ...]
  * SELECT group_set(y, t, g1, g2, ...)       FROM tbl [WHERE ...]
  * SELECT boot_strap(aggExpr, B)             FROM tbl [WHERE ...]
  * SELECT permutation(y, t, B[, mde, type])  FROM tbl [WHERE ...]
  * }}}
  * Anything else falls through to `spark.sql` unchanged, so this is a
  * drop-in `sql()` replacement, exactly like the reference gateway.
  */
object GraftGateway {

  private val Verb =
    """(?is)\s*select\s+(\w+)\s*\((.*)\)\s+from\s+([\w.]+)(?:\s+where\s+(.+?))?\s*;?\s*""".r

  def sql(spark: SparkSession, query: String): DataFrame = query match {
    case Verb(verb, argStr, table, where) if handles(verb) =>
      val df0 = spark.table(table)
      val df = Option(where).map(w => df0.filter(expr(w))).getOrElse(df0)
      val args = splitArgs(argStr)
      dispatch(spark, verb.toLowerCase, df, args)
    case _ => spark.sql(query)
  }

  private val verbs = Set("lift", "exact_matching", "caliper_matching",
    "smd", "linear_dml", "iv_regression", "cut_bins", "group_set",
    "boot_strap", "permutation")
  private def handles(v: String): Boolean = verbs(v.toLowerCase)

  /** split on top-level commas (args are column names / literals; no nested
    * calls in the reference's verb syntax either) */
  private def splitArgs(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; val cur = new StringBuilder
    s.foreach {
      case '(' => depth += 1; cur += '('
      case ')' => depth -= 1; cur += ')'
      case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
      case c => cur += c
    }
    if (cur.nonEmpty) out += cur.toString.trim
    out.toSeq.filter(_.nonEmpty)
  }

  private def num(s: String): Double = s.toDouble

  private def dispatch(spark: SparkSession, verb: String, df: DataFrame,
                       a: Seq[String]): DataFrame = {
    import spark.implicits._
    verb match {
      case "lift" =>
        require(a.length >= 4, "lift(ite, y, t, k)")
        Uplift.liftGain(df, expr(a(0)), expr(a(1)), expr(a(2)), k = num(a(3)).toInt)
      case "exact_matching" =>
        require(a.length >= 2, "exact_matching(t, x...)")
        Matching.exactMatching(df, expr(a.head), a.tail.map(expr))
      case "caliper_matching" =>
        require(a.length >= 3, "caliper_matching(t, score, caliper[, k])")
        Matching.caliperMatching(df, expr(a(0)), expr(a(1)), caliper = num(a(2)),
          k = if (a.length > 3) num(a(3)).toInt else 1)
      case "smd" =>
        require(a.length >= 2, "smd(t, x...)")
        Matching.smd(df, expr(a.head), a.tail)
      case "linear_dml" =>
        require(a.length >= 3, "linear_dml(y, t, x...)")
        val m = Dml.linearDml(df, expr(a(0)), expr(a(1)), a.drop(2).map(expr))
        Seq((m.ate, m.ateStderr, m.atePValue)).toDF("ate", "stderr", "p_value")
      case "iv_regression" =>
        require(a.length >= 3, "iv_regression(y, t, z[, x...])")
        val s = Regression.ivRegression(df, expr(a(0)), expr(a(1)), expr(a(2)),
          a.drop(3).map(expr))
        val names = "t_hat" +: (a.drop(3) :+ "(intercept)")
        names.zipWithIndex.map { case (n, i) =>
          (n, s.coefficients(i), s.stderr(i), s.t_values(i), s.p_values(i))
        }.toDF("term", "estimate", "stderr", "t_value", "p_value")
      case "cut_bins" =>
        require(a.length == 2, "cut_bins(x, num_bins)")
        Features.cutBinsQuantile(df, a(0), num(a(1)).toInt)._1
      case "group_set" =>
        require(a.length >= 3, "group_set(y, t, g...)")
        GroupSet.groupSet(df, expr(a(0)), expr(a(1)),
          a.drop(2).map(g => g -> expr(g)))
      case "boot_strap" =>
        // any inner aggregate by SQL string — the reference's
        // BootStrap('aggName', ...) generality (BootStrap.h:375-497)
        require(a.length >= 2, "boot_strap(aggExpr, B)")
        Bootstrap.bootstrapAny(df, num(a(1)).toInt)(Seq("stat" -> expr(a(0))))
      case "permutation" =>
        require(a.length >= 3, "permutation(y, t, B[, mde, mde_type])")
        val (obs, p, _) = Bootstrap.permutationTest(df, expr(a(0)), expr(a(1)),
          b = num(a(2)).toInt,
          mde = if (a.length > 3) num(a(3)) else 0.0,
          mdeType = if (a.length > 4) a(4).stripPrefix("'").stripSuffix("'") else "abs")
        Seq((obs, p)).toDF("observed", "p_value")
      case other => throw new IllegalArgumentException(s"unknown verb $other")
    }
  }
}
