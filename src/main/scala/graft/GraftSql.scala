package graft

import graft.ops.{Ann, TextOps}
import graft.stats.Dist
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** SQL surface: registers every graft function in the session's
  * FunctionRegistry so `spark.sql("SELECT ttest_2samp(...) FROM t")` works —
  * the reference's Entry point B (`SqlGateWayConn.sql`, SURVEY §3B). The
  * reference needs a forked Calcite to rewrite these calls; here each name
  * is a builder from SQL argument expressions to the same Column the Scala
  * DSL produces, so Catalyst plans both entry points identically.
  *
  * String/number parameters must be literals (they configure the aggregate
  * before planning — same restriction the engine UDFs have).
  */
object GraftSql {

  private def toCol(e: Expression): Column = ColumnBridge.column(e)
  private def ex(c: Column): Expression = ColumnBridge.expression(c)

  private def strArg(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case Literal(null, _) => ""
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }
  private def dblArg(e: Expression, what: String): Double = e match {
    case Literal(v, _) if v != null => v.toString.toDouble
    case other => throw new IllegalArgumentException(
      s"$what must be a numeric literal, got $other")
  }
  private def boolArg(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }
  private def dblArrayArg(e: Expression, what: String): Seq[Double] = {
    require(e.foldable, s"$what must be a foldable array literal")
    (e.eval(), e.dataType) match {
      case (a: org.apache.spark.sql.catalyst.util.ArrayData,
            org.apache.spark.sql.types.ArrayType(elem, _)) =>
        a.toObjectArray(elem).toSeq.map {
          case d: java.lang.Number => d.doubleValue()
          case d: org.apache.spark.sql.types.Decimal => d.toDouble
          case other => throw new IllegalArgumentException(
            s"$what must contain numbers, got $other")
        }
      case other => throw new IllegalArgumentException(
        s"$what must be an array literal, got $other")
    }
  }

  /** Stored models referenced by path from SQL, loaded once per JVM: the
    * builder can re-run on every analysis pass, and a forest load collects
    * every tree to the driver — cache it. Keyed by path only; a model
    * OVERWRITTEN at the same path during the session needs
    * [[clearModelCache]]. */
  private val modelCache =
    new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
  def clearModelCache(): Unit = modelCache.clear()
  private def loadModel(path: String): AnyRef =
    modelCache.computeIfAbsent(path, _ => {
      val spark = SparkSession.active
      val fields =
        try spark.read.parquet(path).schema.fieldNames.toSet
        catch { case e: Exception => throw new IllegalArgumentException(
          s"eval_ml_method: cannot read a stored model at '$path' " +
            s"(string model arguments are ModelIo parquet paths): ${e.getMessage}") }
      // dispatch on the stored shape, not a type tag: the schema IS the
      // model structure (ModelIo's design), so ForestRow's `tree` field or
      // OlsModel's `xtxInv` identifies the family unambiguously
      if (fields.contains("tree")) graft.ops.ModelIo.loadCausalForest(spark, path)
      else if (fields.contains("xtxInv")) graft.ops.ModelIo.loadOls(spark, path)
      else throw new IllegalArgumentException(
        s"eval_ml_method: parquet at '$path' is not a stored graft model " +
          s"(fields: ${fields.mkString(", ")}); expected a ModelIo-written " +
          "causal forest or OLS model")
    })

  /** Every SQL name as a session-independent (name, FunctionBuilder) pair —
    * consumed by [[register]] (temp functions on a live session) and by
    * [[GraftExtensions]] (SparkSessionExtensions.injectFunction, so
    * `--conf spark.sql.extensions=graft.GraftExtensions` ships the whole
    * surface into every new session with no code call). */
  lazy val builders: Seq[(String, Seq[Expression] => Expression)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Seq[Expression] => Expression)]
    def fn(name: String)(builder: Seq[Expression] => Column): Unit =
      out += (name -> ((exprs: Seq[Expression]) => ex(builder(exprs))))

    // ---------------------------------------------------------- aggregates
    // delta_method('x1/x2', is_std, x1, x2, ...)
    fn("delta_method") { a =>
      functions.delta_method(strArg(a(0), "expr"), boolArg(a(1), "is_std"),
        a.drop(2).map(toCol))
    }
    // ttest_1samp('x1/x2', 'two-sided', mu, x...)  (+_cuped variant)
    fn("ttest_1samp") { a =>
      functions.ttest_1samp(strArg(a(0), "expr"), strArg(a(1), "alternative"),
        dblArg(a(2), "mu"))(a.drop(3).map(toCol): _*)
    }
    fn("ttest_1samp_cuped") { a =>
      functions.ttest_1samp(strArg(a(0), "expr"), strArg(a(1), "alternative"),
        dblArg(a(2), "mu"), strArg(a(3), "cuped"))(a.drop(4).map(toCol): _*)
    }
    // ttest_2samp('x1/x2', 'two-sided', treatment, x...)
    fn("ttest_2samp") { a =>
      functions.ttest_2samp(strArg(a(0), "expr"), toCol(a(2)),
        strArg(a(1), "alternative"))(a.drop(3).map(toCol): _*)
    }
    fn("ttest_2samp_cuped") { a =>
      functions.ttest_2samp(strArg(a(0), "expr"), toCol(a(3)),
        strArg(a(1), "alternative"), strArg(a(2), "cuped"))(a.drop(4).map(toCol): _*)
    }
    // ttest_2samp_pse('x1/x2', 'two-sided', treatment, stratum, x...)
    fn("ttest_2samp_pse") { a =>
      functions.ttest_2samp_pse(strArg(a(0), "expr"), toCol(a(2)), toCol(a(3)),
        strArg(a(1), "alternative"))(a.drop(4).map(toCol): _*)
    }
    fn("ttest_2samp_pse_cuped") { a =>
      functions.ttest_2samp_pse(strArg(a(0), "expr"), toCol(a(3)), toCol(a(4)),
        strArg(a(1), "alternative"), strArg(a(2), "cuped"))(a.drop(5).map(toCol): _*)
    }
    // ttests_2samp('x1/x2', 'two-sided', array(alpha...)[, array(mu...)],
    // treatment, x...) — one struct per alpha in a single pass, surfaced as
    // an array of structs (the Scala DSL splats them into a select
    // instead). The optional mu array shifts each test's null hypothesis
    // (diff tested against mu_i).
    fn("ttests_2samp") { a =>
      // positional x1..xn metric string passes straight through, exactly
      // like the sibling builders — routing it via parseMetrics mangled
      // 'x1/x2' into 'x1' (bare-column branch), dropping the denominator
      val alphas = dblArrayArg(a(2), "alphas")
      // dataType alone decides "is this the mus slot" — an array-typed but
      // NON-foldable a(3) (e.g. array(col)) was meant as mus and must not
      // silently fall through to the treatment slot, where it dies later
      // with an unrelated cast error
      val isArrayTyped = scala.util.Try(
        a(3).dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType]).getOrElse(false)
      require(!isArrayTyped || a(3).foldable,
        "ttests_2samp: mus must be a literal array of constants " +
          s"(argument 4 is array-typed but not foldable: ${a(3).sql})")
      val hasMus = isArrayTyped
      val mus =
        if (hasMus) dblArrayArg(a(3), "mus") else Seq.fill(alphas.length)(0.0)
      require(mus.length == alphas.length,
        s"mus must match alphas in length (${alphas.length}), got ${mus.length}")
      val rest = if (hasMus) a.drop(4) else a.drop(3)
      array(alphas.zip(mus).map { case (al, mu) =>
        functions.ttest_2samp(strArg(a(0), "expr"), toCol(rest.head),
          strArg(a(1), "alternative"), "", al, mu)(rest.tail.map(toCol): _*)
      }: _*)
    }
    // srm(x, groupby, array(r0, r1, ...))
    fn("srm") { a =>
      functions.srm(toCol(a(0)), toCol(a(1)), dblArrayArg(a(2), "ratios"))
    }
    // both reference spellings: python/ClickHouse `mann_whitney_utest`
    // (statistics.py:620) and the StarRocks SQL name `mann_whitney_u_test`
    // (all_in_sql_functions.h:42)
    Seq("mann_whitney_utest", "mann_whitney_u_test").foreach { nm =>
      fn(nm) { a =>
        functions.mann_whitney_utest(toCol(a(0)), toCol(a(1)))
      }
    }
    fn("kolmogorov_smirnov_test") { a =>
      functions.kolmogorov_smirnov_test(toCol(a(0)), toCol(a(1)))
    }
    // Pearsonr(x, y) (AggregateFunctionPearsonr.cpp:50; snake_case alias for
    // the Spark-side convention)
    Seq("pearsonr", "pearson_corr").foreach { nm =>
      fn(nm) { a => functions.pearson_corr(toCol(a(0)), toCol(a(1))) }
    }
    // ols(y, x...), ols_nobias(y, x...), wls(y, weight, x...)
    fn("ols") { a => functions.ols(toCol(a.head), a.tail.map(toCol)) }
    fn("ols_nobias") { a =>
      functions.ols(toCol(a.head), a.tail.map(toCol), useBias = false) }
    fn("wls") { a =>
      functions.wls(toCol(a(0)), a.drop(2).map(toCol), toCol(a(1))) }
    // ols_train/wls_train (reference model-returning aggregates, JSON state
    // in aggregate_resolver_all_in_sql.cpp): here the model VALUE is the
    // coefficient array with the intercept LAST — exactly the layout
    // eval_ml_method(coefficients, x...) consumes, so SQL-only train→eval
    // composes via a scalar subquery:
    //   SELECT eval_ml_method((SELECT ols_train(y, x1, x2) FROM t), x1, x2)
    //   FROM t
    // (dotCoef evaluates the array at runtime; no literal required).
    fn("ols_train") { a =>
      functions.ols(toCol(a.head), a.tail.map(toCol)).getField("coefficients") }
    fn("wls_train") { a =>
      functions.wls(toCol(a(0)), a.drop(2).map(toCol), toCol(a(1)))
        .getField("coefficients") }
    // matrix_multiplication(invert, x...)
    fn("matrix_multiplication") { a =>
      functions.matrix_multiplication(a.tail.map(toCol), boolArg(a.head, "invert")) }
    // xexpt_ttest_2samp(uin, treatment, numerator, denominator)
    fn("xexpt_ttest_2samp") { a =>
      functions.xexpt_ttest_2samp(toCol(a(0)), toCol(a(1)), a.drop(2).map(toCol)) }
    // CUPED variant: xexpt_ttest_2samp_cuped('x3/x4', uin, treatment,
    //   numerator, denominator, numerator_pre, denominator_pre)
    fn("xexpt_ttest_2samp_cuped") { a =>
      functions.xexpt_ttest_2samp(toCol(a(1)), toCol(a(2)), a.drop(3).map(toCol),
        cuped = strArg(a(0), "cuped")) }
    // sum-metric variant: xexpt_ttest_2samp_sum(uin, treatment, num, den,
    //   ratio0, ratio1)
    fn("xexpt_ttest_2samp_sum") { a =>
      functions.xexpt_ttest_2samp(toCol(a(0)), toCol(a(1)),
        a.slice(2, 4).map(toCol), metricType = "sum",
        ratios = (dblArg(a(4), "ratio0"), dblArg(a(5), "ratio1"))) }

    // classic 2-sample tests (reference re-exports engine built-ins,
    // registerAggregateFunctions.cpp:49-51): closed forms over conditional
    // aggregates, p-value via a tiny UDF on the two aggregated scalars
    val tTwoSided = udf((t: Double, d: Double) => Dist.tTwoSidedP(t, d))
    val zTwoSided = udf((z: Double) =>
      if (z.isNaN) Double.NaN else 2.0 * (1.0 - Dist.normCdf(math.abs(z))))
    // count(when(t, x)) counts only non-null x, keeping n consistent with
    // the null-skipping avg/var_samp (listwise deletion)
    def condStats(x: Column, t: Column): (Column, Column, Column, Column, Column, Column) =
      (count(when(t === 0, x)).cast("double"),
        avg(when(t === 0, x)), var_samp(when(t === 0, x)),
        count(when(t =!= 0, x)).cast("double"),
        avg(when(t =!= 0, x)), var_samp(when(t =!= 0, x)))
    // student_ttest(x, treatment) -> struct(statistic, p_value)
    fn("student_ttest") { a =>
      val (n0, m0, v0, n1, m1, v1) = condStats(toCol(a(0)), toCol(a(1)))
      val dfree = n0 + n1 - lit(2.0)
      val sp2 = ((n0 - lit(1.0)) * v0 + (n1 - lit(1.0)) * v1) / dfree
      val t = (m1 - m0) / sqrt(sp2 * (lit(1.0) / n0 + lit(1.0) / n1))
      struct(t.as("statistic"), tTwoSided(t, dfree).as("p_value"))
    }
    // welch_ttest(x, treatment) -> struct(statistic, p_value)
    fn("welch_ttest") { a =>
      val (n0, m0, v0, n1, m1, v1) = condStats(toCol(a(0)), toCol(a(1)))
      val va = v0 / n0; val vb = v1 / n1
      val t = (m1 - m0) / sqrt(va + vb)
      val dfree = (va + vb) * (va + vb) /
        (va * va / (n0 - lit(1.0)) + vb * vb / (n1 - lit(1.0)))
      struct(t.as("statistic"), tTwoSided(t, dfree).as("p_value"))
    }
    // mean_z_test(x, treatment, var0, var1) -> struct(statistic, p_value)
    fn("mean_z_test") { a =>
      val (n0, m0, _, n1, m1, _) = condStats(toCol(a(0)), toCol(a(1)))
      val z = (m1 - m0) /
        sqrt(lit(dblArg(a(2), "var0")) / n0 + lit(dblArg(a(3), "var1")) / n1)
      struct(z.as("statistic"), zTwoSided(z).as("p_value"))
    }

    // eval_ml_method(coefficients, x...): model-as-value prediction
    // (reference evalMLMethod/eval_ml_method, ols_eval.h:37-124): dot of the
    // feature row with a coefficient ARRAY (from ModelIo tables or a
    // literal); intercept last when the array is one longer than the
    // feature list — the OlsModel/bootstrapOls layout.
    def dotCoef(a: Seq[Expression]): Column = {
      require(a.length >= 2,
        "eval_ml_method(coefficients, x...) needs at least one feature column")
      val coef = toCol(a.head)
      val xs = a.tail.map(toCol)
      val dot = xs.zipWithIndex
        .map { case (x, i) => x.cast("double") * element_at(coef, i + 1) }
        .reduce(_ + _)
      val pred = dot + when(size(coef) === xs.length + 1,
        element_at(coef, xs.length + 1)).otherwise(lit(0.0))
      // a wrong-arity coefficient array (model/feature-list drift) must
      // fail loudly, not emit NULL or silently skip the intercept
      when(size(coef) === xs.length || size(coef) === xs.length + 1, pred)
        .otherwise(raise_error(concat(
          lit(s"eval_ml_method: coefficient array size "), size(coef),
          lit(s" does not match ${xs.length} feature(s) (+ optional intercept)"))))
    }
    // Stored-model dispatch (eval_ml_method.cpp:65-67 routes on the model's
    // type name to ols | causal_forest): a STRING first argument is a
    // ModelIo parquet path; the stored schema decides the scoring — forest
    // rows route to the per-tree leaf + literal-lookup composition (the
    // Model.score idiom as one scalar expression), an OlsModel to its
    // literal-coefficient dot. Loads happen once per path at analysis time
    // and are cached for the JVM (overwrite a model under a live session →
    // GraftSql.clearModelCache()).
    def evalStored(path: String, xs: Seq[Column]): Column =
      loadModel(path) match {
        case m: graft.ops.CausalForest.Model =>
          require(xs.length == m.featureNames.length,
            s"eval_ml_method: stored forest at $path expects " +
              s"${m.featureNames.length} feature(s) " +
              s"(${m.featureNames.mkString(", ")}), got ${xs.length}")
          m.trees.map(tr =>
              element_at(typedLit(tr.effect.toSeq), tr.leafColumn(xs) + 1))
            .reduce(_ + _) / lit(m.numTrees.toDouble)
        case m: graft.ops.OlsModel =>
          val coefs = m.coefficients
          val k = coefs.length - (if (m.summary.use_bias) 1 else 0)
          require(xs.length == k,
            s"eval_ml_method: stored OLS at $path has $k feature " +
              s"coefficient(s), got ${xs.length} feature(s)")
          xs.zipWithIndex.map { case (x, i) => x.cast("double") * lit(coefs(i)) }
            .reduceOption(_ + _).getOrElse(lit(0.0)) + lit(m.intercept)
        case other => throw new IllegalArgumentException(
          s"eval_ml_method: unsupported stored model ${other.getClass} at $path")
      }
    def evalMl(a: Seq[Expression]): Column = a.head match {
      case Literal(s: UTF8String, StringType) if s != null =>
        evalStored(s.toString, a.tail.map(toCol))
      case _ => dotCoef(a)
    }
    fn("eval_ml_method") { a => evalMl(a) }
    // logistic variant: sigmoid of the linear predictor (stored logistic
    // fits ship their coefficients; path dispatch applies the same way)
    fn("eval_ml_method_logistic") { a =>
      lit(1.0) / (lit(1.0) + exp(-evalMl(a)))
    }

    // ---------------------------------------------------------- scalar math
    val cdfTUdf = udf((x: Double, df: Double) => Dist.tCdf(x, df))
    fn("cdf") { a => cdfTUdf(toCol(a(0)), toCol(a(1))) } // reference cdf.cpp: Student-t CDF
    val cdfNormUdf = udf((x: Double) => Dist.normCdf(x))
    fn("cdf_norm") { a => cdfNormUdf(toCol(a(0))) }
    // codegen expressions, not UDFs — these also sit in iterative hot
    // paths (Aft's lognormal Newton pass), where a ScalaUDF would pay a
    // per-row serialization tax
    fn("erf") { a => graft.expr.MathExprs.erf(toCol(a(0)).cast("double")) }
    fn("erfc") { a => graft.expr.MathExprs.erfc(toCol(a(0)).cast("double")) }
    val lgammaUdf = udf((x: Double) => org.apache.commons.math3.special.Gamma.logGamma(x))
    fn("lgamma") { a => lgammaUdf(toCol(a(0))) }
    val tgammaUdf = udf((x: Double) => org.apache.commons.math3.special.Gamma.gamma(x))
    fn("tgamma") { a => tgammaUdf(toCol(a(0))) }

    // vector ops over array columns (reference functions.py L*Norm/Distance)
    fn("l1_norm") { a =>
      aggregate(transform(toCol(a(0)), x => abs(x)), lit(0.0), (s, x) => s + x) }
    fn("l2_norm") { a =>
      sqrt(aggregate(transform(toCol(a(0)), x => x * x), lit(0.0), (s, x) => s + x)) }
    fn("linf_norm") { a => array_max(transform(toCol(a(0)), x => abs(x))) }
    fn("lp_norm") { a =>
      val p = dblArg(a(1), "p")
      pow(aggregate(transform(toCol(a(0)), x => pow(abs(x), p)), lit(0.0),
        (s, x) => s + x), 1.0 / p) }
    fn("l2_distance") { a =>
      sqrt(aggregate(zip_with(toCol(a(0)), toCol(a(1)), (x, y) => (x - y) * (x - y)),
        lit(0.0), (s, x) => s + x)) }
    fn("l2_squared_distance") { a =>
      aggregate(zip_with(toCol(a(0)), toCol(a(1)), (x, y) => (x - y) * (x - y)),
        lit(0.0), (s, x) => s + x) }
    fn("l1_distance") { a =>
      aggregate(zip_with(toCol(a(0)), toCol(a(1)), (x, y) => abs(x - y)),
        lit(0.0), (s, x) => s + x) }
    fn("linf_distance") { a =>
      array_max(zip_with(toCol(a(0)), toCol(a(1)), (x, y) => abs(x - y))) }
    fn("lp_distance") { a =>
      val p = dblArg(a(2), "p")
      pow(aggregate(zip_with(toCol(a(0)), toCol(a(1)),
        (x, y) => pow(abs(x - y), p)), lit(0.0), (s, x) => s + x), 1.0 / p) }
    fn("l2_normalize") { a =>
      val v = toCol(a(0))
      val n = sqrt(aggregate(transform(v, x => x * x), lit(0.0), (s, x) => s + x))
      transform(v, x => x / n) }
    fn("l1_normalize") { a =>
      val v = toCol(a(0))
      val n = aggregate(transform(v, x => abs(x)), lit(0.0), (s, x) => s + x)
      transform(v, x => x / n) }
    fn("linf_normalize") { a =>
      val v = toCol(a(0))
      val n = array_max(transform(v, x => abs(x)))
      transform(v, x => x / n) }
    fn("lp_normalize") { a =>
      val v = toCol(a(0))
      val p = dblArg(a(1), "p")
      val n = pow(aggregate(transform(v, x => pow(abs(x), p)), lit(0.0),
        (s, x) => s + x), 1.0 / p)
      transform(v, x => x / n) }
    fn("cosine_similarity") { a => Ann.cosine(toCol(a(0)), toCol(a(1))) }
    fn("cosine_distance") { a => lit(1.0) - Ann.cosine(toCol(a(0)), toCol(a(1))) }
    // reference anyMin/anyMax/anyLast aggregates (functions.py:737-771):
    // value of x at the min/max of y = Spark's min_by/max_by; anyLast = last
    fn("any_min") { a => min_by(toCol(a(0)), toCol(a(1))) }
    fn("any_max") { a => max_by(toCol(a(0)), toCol(a(1))) }
    fn("any_last") { a => last(toCol(a(0))) }

    // ---------------------------------------------------------- text / pipeline
    fn("token_count") { a => TextOps.tokenCount(toCol(a(0))) }
    fn("ws_token_count") { a => TextOps.wsTokenCount(toCol(a(0))) }
    fn("lang_id") { a => TextOps.langId(toCol(a(0))) }
    fn("quality_score") { a => TextOps.qualityScore(toCol(a(0))) }
    fn("simhash64") { a => TextOps.simHash(toCol(a(0))) }
    fn("content_fingerprint") { a => TextOps.contentFingerprint(toCol(a(0))) }
    fn("ngram_jaccard") { a =>
      TextOps.ngramJaccard(toCol(a(0)), toCol(a(1)), dblArg(a(2), "n").toInt) }
    // winnow_fingerprints(text[, k, w]) / winnow_similarity(a, b[, k, w])
    fn("winnow_fingerprints") { a =>
      TextOps.winnowFingerprints(toCol(a(0)),
        if (a.length > 1) dblArg(a(1), "k").toInt else 8,
        if (a.length > 2) dblArg(a(2), "w").toInt else 4) }
    fn("winnow_similarity") { a =>
      TextOps.winnowSimilarity(toCol(a(0)), toCol(a(1)),
        if (a.length > 2) dblArg(a(2), "k").toInt else 8,
        if (a.length > 3) dblArg(a(3), "w").toInt else 4) }
    out.toSeq
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}

/** `SparkSessionExtensions` hook: set
  * `spark.sql.extensions=graft.GraftExtensions` (spark-submit --conf or
  * builder config) and every new session resolves the full graft SQL
  * surface without any code call — the idiomatic packaging for a Spark
  * function library (the reference needs its forked-Calcite gateway
  * deployed in front of the engine for the same effect). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    GraftSql.builders.foreach { case (name, b) =>
      ext.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft.GraftSql", name),
        (children: Seq[Expression]) => b(children)))
    }
}
