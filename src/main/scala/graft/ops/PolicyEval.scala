package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Off-policy evaluation from logged bandit feedback — "what reward would
  * the NEW policy have earned on the traffic the OLD policy logged", the
  * counterfactual question behind every ranking/recommendation/agent
  * policy swap evaluated without an online A/B. Beyond-reference: the
  * reference's causal tier stops at experiment analysis; OPE is its
  * logged-data sibling (Horvitz-Thompson 1952 weighting; SNIPS per
  * Swaminathan & Joachims 2015; doubly-robust per Dudík, Langford & Li
  * 2011).
  *
  * All three estimators are single-pass moment aggregates — the 100 TB
  * cost is the scan.
  */
object PolicyEval {

  /** IPS / SNIPS / doubly-robust value estimates for a target policy from
    * logged (action-propensity, reward) rows:
    *
    *   w       = π_target(a|x) / π_logging(a|x), clipped at `wClip`
    *   IPS     = (1/n)Σ w·r                (unbiased, high variance)
    *   SNIPS   = Σ w·r / Σ w              (self-normalized; biased O(1/n),
    *                                       much tighter when w dispersion
    *                                       is large)
    *   DR      = (1/n)Σ (q̂ + w·(r − q̂))   (doubly robust — unbiased if
    *                                       EITHER the propensities or the
    *                                       caller-supplied outcome model
    *                                       q̂ = E[r|x, a~target] is right)
    *
    * Standard errors: IPS/DR from the sample variance of their per-row
    * terms; SNIPS via the delta method on the ratio (same linearization
    * as [[graft.ops.SimpleTests]]' weighted means). ESS = (Σw)²/Σw² says
    * how much logged traffic effectively supports the target policy —
    * read it before trusting any of the three.
    *
    * `qhat`: optional outcome-model column for DR (None → DR columns are
    * null). `wClip`: propensity-ratio cap (Infinity → no clipping); the
    * clipped share is reported, not hidden.
    *
    * Guards (house named errors, all riding the single aggregate):
    * π_logging must be in (0, 1]; π_target in [0, 1]; rewards non-null.
    *
    * 100 TB shape: ONE row-scale moment aggregate + O(1) driver close.
    * Returns one row: (n, ess, clipped_share, ips, ips_se, snips,
    * snips_se, dr, dr_se). */
  def opeEval(df: DataFrame, reward: Column, pTarget: Column,
              pLogging: Column, qhat: Option[Column] = None,
              wClip: Double = Double.PositiveInfinity): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(wClip > 0, s"ope: wClip must be > 0, got $wClip")
    val r = reward.cast("double")
    val pt = pTarget.cast("double")
    val pl = pLogging.cast("double")
    val q = qhat.map(_.cast("double")).getOrElse(lit(null).cast("double"))
    val base = df.filter(r.isNotNull && pt.isNotNull && pl.isNotNull)
      .select(r.as("r"), pt.as("pt"), pl.as("pl"), q.as("q"))
    // division guarded for pl <= 0 (ANSI would throw before the bad-row
    // count fires); when any such row exists the require below throws
    // the named error, so the 0.0 placeholder never reaches a result
    val wRaw = when(col("pl") > 0, col("pt") / col("pl")).otherwise(lit(0.0))
    val w =
      if (wClip.isPosInfinity) wRaw else least(wRaw, lit(wClip))
    val drTerm = col("q") + w * (col("r") - col("q"))
    val agg = base.agg(
      count(lit(1)).as("n"),
      coalesce(sum(when(col("pl") <= 0 || col("pl") > 1 ||
        col("pt") < 0 || col("pt") > 1, 1L).otherwise(0L)), lit(0L))
        .as("bad"),
      coalesce(sum(when(wRaw > lit(wClip), 1L).otherwise(0L)), lit(0L))
        .as("clipped"),
      sum(w).as("sw"), sum(w * w).as("sww"),
      sum(w * col("r")).as("swr"),
      sum(w * w * col("r")).as("swwr"),
      sum(w * col("r") * w * col("r")).as("swr2"),
      sum(drTerm).as("sd"), sum(drTerm * drTerm).as("sd2"),
      count(col("q")).as("nq")).head()
    val n = agg.getAs[Long]("n")
    require(n >= 2, s"ope: need at least 2 complete rows, got $n")
    require(agg.getAs[Long]("bad") == 0,
      s"ope: ${agg.getAs[Long]("bad")} rows have propensities outside " +
        "(0, 1] (logging) or [0, 1] (target)")
    val nd = n.toDouble
    val sw = agg.getAs[Double]("sw"); val sww = agg.getAs[Double]("sww")
    val swr = agg.getAs[Double]("swr")
    val swr2 = agg.getAs[Double]("swr2")
    val swwr = agg.getAs[Double]("swwr")
    val ess = if (sww > 0) sw * sw / sww else 0.0
    val ips = swr / nd
    // Var(mean of w·r): (Σ(wr)² − n·mean²) / (n−1) / n
    val ipsVar = math.max(0.0, (swr2 - nd * ips * ips) / (nd - 1)) / nd
    require(sw > 0, "ope: total importance weight is 0 — the target " +
      "policy never acts where the logging policy logged")
    val snips = swr / sw
    // delta method on R = Σwr/Σw: Var ≈ Σ w²(r − R)² / (Σw)²
    //   Σw²(r−R)² = Σw²r² − 2RΣw²r + R²Σw²
    val snipsVar = math.max(0.0,
      swr2 - 2 * snips * swwr + snips * snips * sww) / (sw * sw)
    val nq = agg.getAs[Long]("nq")
    require(qhat.isEmpty || nq == n,
      s"ope: qhat is null on ${n - nq} of $n rows — DR needs the outcome " +
        "model everywhere (impute or drop those rows explicitly)")
    val haveQ = qhat.isDefined && nq == n
    val (dr, drSe) =
      if (haveQ) {
        val sd = agg.getAs[Double]("sd"); val sd2 = agg.getAs[Double]("sd2")
        val m = sd / nd
        val v = math.max(0.0, (sd2 - nd * m * m) / (nd - 1)) / nd
        (Some(m), Some(math.sqrt(v)))
      } else (None, None)
    Seq((n, ess, agg.getAs[Long]("clipped").toDouble / nd, ips,
        math.sqrt(ipsVar), snips, math.sqrt(snipsVar), dr, drSe))
      .toDF("n", "ess", "clipped_share", "ips", "ips_se", "snips",
        "snips_se", "dr", "dr_se")
  }
}
