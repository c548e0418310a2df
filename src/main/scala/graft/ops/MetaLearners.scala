package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Meta-learner uplift estimators (reference `lib/spark_upliftml.py`:
  * SLearnerEstimator:9-122, TLearnerEstimator:124-219,
  * XLearnerEstimator:221-370, TransformedOutcomeEstimator — thin PySpark
  * wrappers that fit MLlib base models per group and subtract predictions;
  * Künzel et al. 2019, arXiv:1706.03461).
  *
  * Spark-first re-expression with the library's OLS base learner: every
  * group fit fuses into ONE scan via [[Regression.fitOlsMultiWeighted]]'s
  * indicator weights (a `when(cond, 1.0)` weight drops rows listwise, so
  * "fit on treated" and "fit on control" are two aggregates in the same
  * job, not two filtered scans), and every effect estimate is a
  * literal-coefficient column expression — whole-stage codegen, zero
  * driver-side row work, no MLlib pipeline round-trips. T-learner: 1 scan.
  * X-learner: 2 scans (stage 2's targets need stage 1's coefficients —
  * inherently sequential). S-learner: 1 scan.
  */
object MetaLearners {

  /** S-learner: one model of E[Y | X, T], effect = prediction at T=1 minus
    * at T=0. With a LINEAR base model the no-interaction S-learner
    * degenerates to a constant effect (the T coefficient), so by default
    * the treatment also enters interacted with every feature —
    * effect(x) = c_t + Σ c_{x·t,i}·x_i. */
  case class SLearnerModel(base: OlsModel, nFeatures: Int,
                           interactions: Boolean) {
    def effectColumn(xs: Seq[Column]): Column = {
      require(xs.length == nFeatures,
        s"model was fit on $nFeatures feature(s), got ${xs.length}")
      val c = base.coefficients // layout: xs, t, [xs·t], intercept
      val cT = lit(c(nFeatures))
      if (!interactions) cT
      else xs.zipWithIndex.foldLeft(cT) { case (acc, (x, i)) =>
        acc + x.cast("double") * lit(c(nFeatures + 1 + i))
      }
    }
  }
  def sLearner(df: DataFrame, y: Column, t: Column, xs: Seq[Column],
               interactions: Boolean = true): SLearnerModel = {
    val t01 = t.cast("double")
    val design = xs.map(_.cast("double")) ++ (t01 +:
      (if (interactions) xs.map(_.cast("double") * t01) else Nil))
    SLearnerModel(Regression.fitOls(df, y, design), xs.length, interactions)
  }

  /** T-learner: separate models of E[Y | X] on the treated and control
    * groups; effect = m1(x) − m0(x). Both models come from one scan. */
  case class TLearnerModel(m0: OlsModel, m1: OlsModel) {
    def effectColumn(xs: Seq[Column]): Column =
      Regression.predict(m1, xs) - Regression.predict(m0, xs)
  }
  def tLearner(df: DataFrame, y: Column, t: Column,
               xs: Seq[Column]): TLearnerModel = {
    val Seq(m0, m1) = Regression.fitOlsMultiWeighted(df, Seq(
      (y, xs, when(t.cast("int") === 0, 1.0)),
      (y, xs, when(t.cast("int") === 1, 1.0))))
    TLearnerModel(m0, m1)
  }

  /** X-learner: stage 1 is a T-learner; stage 2 regresses the imputed
    * individual effects — D = Y − m0(x) on the treated, m1(x) − Y on the
    * controls — giving τ1 and τ0; the estimate blends them,
    * τ(x) = g·τ0(x) + (1−g)·τ1(x). The reference pins g = 0.5
    * (spark_upliftml.py:226 "Our implementation sets p(X) = 0.5"); pass a
    * propensity column (e.g. a logistic fit's prediction) to weight by
    * e(x) as in the paper. */
  case class XLearnerModel(first: TLearnerModel, tau0: OlsModel,
                           tau1: OlsModel) {
    def effectColumn(xs: Seq[Column],
                     propensity: Column = lit(0.5)): Column = {
      val g = propensity.cast("double")
      g * Regression.predict(tau0, xs) +
        (lit(1.0) - g) * Regression.predict(tau1, xs)
    }
  }
  def xLearner(df: DataFrame, y: Column, t: Column,
               xs: Seq[Column]): XLearnerModel = {
    val first = tLearner(df, y, t, xs)
    val t1 = t.cast("int") === 1
    val d = when(t1, y.cast("double") - Regression.predict(first.m0, xs))
      .otherwise(Regression.predict(first.m1, xs) - y.cast("double"))
    // τ0 on the CONTROL rows, τ1 on the TREATED rows — one fused scan
    val Seq(tau0, tau1) = Regression.fitOlsMultiWeighted(df, Seq(
      (d, xs, when(!t1, 1.0)),
      (d, xs, when(t1, 1.0))))
    XLearnerModel(first, tau0, tau1)
  }

  /** Class-variable-transformation estimator (spark_upliftml.py
    * CVTEstimator:375-461; Jaskowski & Jaroszewicz 2012): for a binary
    * outcome under a 50-50 RCT, Z = 1{T = Y} turns uplift into a
    * classification target with τ(x) = 2·E[Z | X] − 1. The base model is
    * the library's logistic IRLS (one aggregate pass per iteration); the
    * score is a literal-coefficient sigmoid column. */
  case class CvtModel(base: MlWrappers.LogisticFit) {
    def effectColumn(xs: Seq[Column]): Column =
      lit(2.0) * base.predictProba(xs) - lit(1.0)
  }
  def cvt(df: DataFrame, y: Column, t: Column, xs: Seq[Column],
          maxIter: Int = 25): CvtModel =
    CvtModel(MlWrappers.logisticIrls(df,
      when(t.cast("double") === y.cast("double"), 1.0).otherwise(0.0),
      xs, maxIter))

  /** Propensity estimator (spark_upliftml.py PropensityEstimator:577-667):
    * with no features, E[T] from the observed arm shares — the reference
    * assigns the TREATED share to treated rows and the CONTROL share to
    * control rows (predict:641-657), reproduced verbatim; with features, a
    * logistic model of E[T | X]. One aggregate scan either way. */
  case class PropensityModel(pTreated: Double,
                             base: Option[MlWrappers.LogisticFit]) {
    def propensityColumn(t: Column, xs: Seq[Column] = Nil): Column =
      base match {
        case Some(m) => m.predictProba(xs)
        case None => when(t.cast("int") === 1, lit(pTreated))
          .otherwise(lit(1.0 - pTreated))
      }
  }
  def propensity(df: DataFrame, t: Column, xs: Seq[Column] = Nil,
                 maxIter: Int = 25): PropensityModel =
    if (xs.isEmpty) {
      val row = df.agg(
        avg((t.cast("int") === 1).cast("double")).as("p")).head()
      require(!row.isNullAt(0),
        "propensity: no rows with a non-null treatment indicator")
      PropensityModel(row.getDouble(0), None)
    } else PropensityModel(Double.NaN, Some(MlWrappers.logisticIrls(
      df, (t.cast("int") === 1).cast("double"), xs, maxIter)))

  /** Retrospective estimator (spark_upliftml.py
    * RetrospectiveEstimator:667-741; Goldenberg et al. 2020): E[T | Y=1, X]
    * — a logistic fit of the treatment indicator over the positive-outcome
    * rows only, which under a 50-50 RCT ranks by the relative effect
    * E[Y|T=1,X] / E[Y|T=0,X]. */
  case class RetrospectiveModel(base: MlWrappers.LogisticFit) {
    def scoreColumn(xs: Seq[Column]): Column = base.predictProba(xs)
  }
  def retrospective(df: DataFrame, y: Column, t: Column, xs: Seq[Column],
                    positiveOutcome: Double = 1.0,
                    maxIter: Int = 25): RetrospectiveModel =
    RetrospectiveModel(MlWrappers.logisticIrls(
      df.filter(y.cast("double") === positiveOutcome),
      (t.cast("int") === 1).cast("double"), xs, maxIter))

  /** R-learner (Nie & Wager 2021; the upliftml family's fifth meta-learner
    * and the reference R-learner analogue): residualize Y and T on X with
    * cross-fitted nuisance models, then regress ỹ on t̃ — which is exactly
    * [[Dml.nonParamDml]]'s objective, so this is that estimator under its
    * meta-learner name. `effectColumn` is the constant ATE (the
    * non-heterogeneous final stage); pass heterogeneous features through
    * [[Dml.linearDml]] directly for τ(x). */
  case class RLearnerModel(dml: Dml.DmlModel) {
    def effectColumn: Column = lit(dml.ate)
  }
  def rLearner(df: DataFrame, y: Column, t: Column, xs: Seq[Column],
               cv: Int = 2): RLearnerModel =
    RLearnerModel(Dml.nonParamDml(df, y, t, xs, cv))

  /** Transformed-outcome estimator (spark_upliftml.py
    * TransformedOutcomeEstimator; Athey & Imbens 2016): one regression of
    * Z = T·Y/p − (1−T)·Y/(1−p) on X, where E[Z | X] = τ(X) under a known
    * treatment probability p (a propensity column composes the same way). */
  case class TransformedOutcomeModel(base: OlsModel) {
    def effectColumn(xs: Seq[Column]): Column = Regression.predict(base, xs)
  }
  def transformedOutcome(df: DataFrame, y: Column, t: Column,
                         xs: Seq[Column],
                         propensity: Column = lit(0.5)): TransformedOutcomeModel = {
    val p = propensity.cast("double")
    val t01 = t.cast("double")
    val z = t01 * y.cast("double") / p -
      (lit(1.0) - t01) * y.cast("double") / (lit(1.0) - p)
    TransformedOutcomeModel(Regression.fitOls(df, z, xs))
  }
}
