package graft.ops

import graft.agg.OlsSummary
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Double machine learning (reference calcite LinearDMLParser.java:1-176,
  * NonParamDMLParser.java:1-197; python uplift.py:2163-2410).
  *
  * The reference compiles DML into one giant generated CTE SQL: fold
  * assignment by row hash, an `OlsState` nuisance model per fold,
  * residualization, then a final Ols. Spark-first, the same computation is a
  * driver-orchestrated sequence of aggregate passes over one cached frame:
  *
  *   1. fold = pmod(foldKey, cv)              — deterministic, no shuffle
  *   2. per fold f: fit y~X and t~X on the complement (2·cv tiny agg passes,
  *      each a single O(k²)-state aggregate — the scan is the only cost)
  *   3. residuals as a codegen'd when-chain over fold (no join: models are
  *      literal coefficients baked into the expression)
  *   4. final OLS of ỹ on t̃ (LinearDML adds t̃·X columns for heterogeneous
  *      effects) — one more pass
  *
  * At 100 TB the frame should be cached (or the fold column cheap to
  * recompute); every pass is a full scan + O(k²) shuffle, nothing else.
  */
object Dml {

  /** Cross-fitted residualized frame: adds `__fold`, `__y_res`, `__t_res`.
    * `foldKey` must be a deterministic numeric column (e.g. a key column);
    * pass `xxhash64(pk)` for hash-random folds. */
  def residualize(df: DataFrame, y: Column, t: Column, xs: Seq[Column],
                  cv: Int, foldKey: Column): DataFrame = {
    require(cv >= 2, "cv must be >= 2")
    val withFold = df.withColumn("__fold", pmod(foldKey.cast("long"), lit(cv)).cast("int"))
    // ALL 2·cv complement-fold nuisance fits in ONE scan: a null weight
    // drops the row from that fold's fit (identical to filtering), so the
    // whole cross-fit costs one pass instead of 2·cv
    val models = Regression.fitOlsMultiWeighted(withFold,
      (0 until cv).flatMap { f =>
        val w = when(col("__fold") =!= f, 1.0)
        Seq((y, xs, w), (t, xs, w))
      })
    val perFold = (0 until cv).map(f => (f, models(2 * f), models(2 * f + 1)))
    // residual expressions: each row predicted by the model that did NOT see it
    val yHat = perFold.foldLeft(lit(Double.NaN)) { case (acc, (f, my, _)) =>
      when(col("__fold") === f, Regression.predict(my, xs)).otherwise(acc)
    }
    val tHat = perFold.foldLeft(lit(Double.NaN)) { case (acc, (f, _, mt)) =>
      when(col("__fold") === f, Regression.predict(mt, xs)).otherwise(acc)
    }
    withFold
      .withColumn("__y_res", y.cast("double") - yHat)
      .withColumn("__t_res", t.cast("double") - tHat)
  }

  /** Fitted DML model: θ(x) = β₀ + βᵀx (NonParam: θ constant = β₀). */
  case class DmlModel(finalModel: OlsModel, featureNames: Seq[String]) {
    def finalStage: OlsSummary = finalModel.summary
    /** Constant-effect ATE = coefficient on t̃ (first final-stage column). */
    def ate: Double = finalStage.coefficients(0)
    def ateStderr: Double = finalStage.stderr(0)
    def atePValue: Double = finalStage.p_values(0)
  }

  /** LinearDML: final stage regresses ỹ on [t̃, t̃·x₁ … t̃·xₖ] (no intercept —
    * E[ỹ|t̃=0] = 0 by construction). θ(x) = β₀ + Σ βᵢxᵢ. */
  def linearDml(df: DataFrame, y: Column, t: Column, xs: Seq[Column],
                cv: Int = 2, foldKey: Column = null,
                heterogeneous: Seq[Column] = Seq.empty): DmlModel = {
    val key = Option(foldKey).getOrElse(xxhash64(y, t))
    val res = residualize(df, y, t, xs, cv, key)
    val finalXs = col("__t_res") +: heterogeneous.map(h => col("__t_res") * h.cast("double"))
    val m = Regression.fitOls(res, col("__y_res"), finalXs, useBias = false)
    DmlModel(m, "t" +: heterogeneous.indices.map(i => s"t*x$i"))
  }

  /** NonParamDML with a constant effect — final stage ỹ ~ t̃ alone. */
  def nonParamDml(df: DataFrame, y: Column, t: Column, xs: Seq[Column],
                  cv: Int = 2, foldKey: Column = null): DmlModel =
    linearDml(df, y, t, xs, cv, foldKey, heterogeneous = Seq.empty)

  /** Per-row effect as a column, given the heterogeneous features used at
    * fit time (uplift.py:2263 `effect`). `dt` = T1−T0 fills the t̃ slot of
    * the evaluation basis exactly like the reference's
    * `evalMLMethod(final_model, X…, T1-T0)` — the x slots stay unscaled. */
  def effect(model: DmlModel, heterogeneous: Seq[Column], dt: Double = 1.0): Column = {
    val c = model.finalStage.coefficients
    require(heterogeneous.length + 1 == c.length,
      s"model has ${c.length} final-stage coefficients, got ${heterogeneous.length} features")
    heterogeneous.zipWithIndex.foldLeft(lit(c(0) * dt)) { case (acc, (h, i)) =>
      acc + h.cast("double") * lit(c(i + 1))
    }
  }

  /** Per-row effect with a confidence interval (uplift.py:2322
    * `effect_interval`): the reference evaluates the final OlsStateIf model
    * in 'confidence' mode at (Δt, x₁…xₖ), i.e. se(θ) = σ̂·√(vᵀ(XᵀX)⁻¹v) over
    * the final-stage normal matrix with basis v = (T1−T0, x…) — the x
    * slots stay UNSCALED; only the t̃ slot carries Δt (ate.py passes
    * `X..., T1-T0` verbatim). That is exactly
    * [[Regression.predictInterval]] on the retained final model, so the
    * quadratic form stays a codegen'd column — no per-row driver math.
    * Returns struct(fit, lower, upper). */
  def effectInterval(model: DmlModel, heterogeneous: Seq[Column],
                     alpha: Double = 0.05, dt: Double = 1.0): Column = {
    require(heterogeneous.length + 1 == model.finalStage.coefficients.length,
      s"model has ${model.finalStage.coefficients.length} final-stage coefficients, " +
        s"got ${heterogeneous.length} features")
    Regression.predictInterval(model.finalModel,
      lit(dt) +: heterogeneous.map(_.cast("double")),
      interval = "confidence", alpha = alpha)
  }

  /** ATE with a confidence interval (uplift.py:2356 `ate_interval`): the
    * reference evaluates the final model's confidence interval at the MEAN
    * of the heterogeneous features — one tiny agg for the means, then
    * scalar math on the driver from the retained (XᵀX)⁻¹. */
  case class AteSummary(ate: Double, stderr: Double,
                        lower: Double, upper: Double)
  def ateInterval(df: DataFrame, model: DmlModel, heterogeneous: Seq[Column],
                  alpha: Double = 0.05, dt: Double = 1.0): AteSummary = {
    val c = model.finalStage.coefficients
    require(heterogeneous.length + 1 == c.length,
      s"model has ${c.length} final-stage coefficients, got ${heterogeneous.length} features")
    val means: Array[Double] =
      if (heterogeneous.isEmpty) Array.empty
      else {
        val row = df.agg(avg(heterogeneous.head.cast("double")),
          heterogeneous.tail.map(h => avg(h.cast("double"))): _*).head()
        // a null avg (empty frame / all-null column) would silently unbox
        // to 0.0 and yield a plausible-looking interval at x̄=0 — fail with
        // a named error instead
        require(!row.anyNull, "ateInterval: a heterogeneous-feature mean is " +
          "null — empty input frame or an all-null feature column")
        row.toSeq.map(_.asInstanceOf[Double]).toArray
      }
    val v = dt +: means
    val fit = v.indices.map(i => c(i) * v(i)).sum
    val inv = model.finalModel.xtxInv
    val quad = (for (i <- v.indices; j <- v.indices) yield v(i) * v(j) * inv(i)(j)).sum
    val s = model.finalStage
    val se = s.residual_stderr * math.sqrt(quad)
    val tq = graft.stats.Dist.tQuantile(1 - alpha / 2, (s.n - s.k - 1).toDouble)
    AteSummary(fit, se, fit - tq * se, fit + tq * se)
  }

  /** θ(x) per unit treatment (uplift.py:2441 `const_marginal_effect`); for
    * the linear-in-T final stage this IS [[effect]] with Δt = 1, and
    * `marginal_effect` (uplift.py:2464) coincides with it. */
  def constMarginalEffect(model: DmlModel, heterogeneous: Seq[Column]): Column =
    effect(model, heterogeneous)
}
