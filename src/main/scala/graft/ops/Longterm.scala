package graft.ops

import graft.stats.Dist
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Long-term effect via surrogate-index recursive forecasting (reference
  * calcite RecursiveForcasting.java:1-184; python longterm.py:11-290).
  *
  * Data layout: one row per unit, surrogate columns repeated per period
  * (`s1_p0, s2_p0, s1_p1, s2_p1, …`). For each transition t→t+1 in the
  * training window, fit OLS of each period-(t+1) surrogate on the period-t
  * surrogate vector; to forecast, roll the fitted transition forward from
  * the last observed period, then estimate the treatment effect on the
  * forecast index per predicted period.
  *
  * The pooled transition fit is ONE aggregate pass (one OlsBuf per target
  * surrogate, [[Regression.fitOlsMulti]]); every roll-forward step is a
  * codegen'd column expression (coefficients are literals). Bootstrap CIs
  * REFIT the whole transition per replicate (longterm.py:239-279's
  * sample_num resampling), not just the final diff-in-means: units get
  * deterministic Poisson weights, one weighted multi-OLS `groupBy(rep)`
  * pass fits all B transitions — WITH the unweighted point fit riding as
  * rep = -1, weight 1, so no separate fitTransition scan — a second
  * grouped pass takes the per-rep treated/control mean vectors of the
  * last observed period, and the driver rolls each replicate's own
  * transition forward: the interval carries transition-fit uncertainty,
  * at 2 scans total for the point fit and all B replicates.
  */
object Longterm {

  /** One fitted transition: models(j) predicts surrogate j of period t+1
    * from all surrogates of period t. */
  case class Transition(models: Seq[OlsModel])

  case class LongtermResult(
      /** per forecast period: diff-in-means effect of `treatment` on the
        * forecast outcome (surrogate 0 = the outcome surrogate by
        * convention, longterm.py:239-279) */
      effects: Seq[Bootstrap.EffectEstimate],
      transition: Transition)

  /** Stack adjacent (t, t+1) pairs; `extra` columns (ids, treatment) ride
    * along for the bootstrap passes. */
  private def stackedPairs(df: DataFrame, surrogates: Seq[Seq[Column]],
                           extra: Seq[Column] = Seq.empty): DataFrame = {
    surrogates.sliding(2).toSeq.map { case Seq(from, to) =>
      df.select(from.zipWithIndex.map { case (c, i) => c.cast("double").as(s"__f$i") } ++
        to.zipWithIndex.map { case (c, i) => c.cast("double").as(s"__t$i") } ++ extra: _*)
    }.reduce(_ unionByName _)
  }

  /** Fit the pooled transition on the training periods (the reference fits
    * one model pooled over all adjacent training pairs) — all k target
    * models in ONE scan. */
  def fitTransition(df: DataFrame, surrogates: Seq[Seq[Column]]): Transition = {
    require(surrogates.length >= 2, "need at least 2 training periods")
    val k = surrogates.head.length
    val stacked = stackedPairs(df, surrogates)
    val fromCols = (0 until k).map(i => col(s"__f$i"))
    Transition(Regression.fitOlsMulti(stacked,
      (0 until k).map(j => (col(s"__t$j"), fromCols))))
  }

  /** Roll the transition forward from `current` surrogate columns, returning
    * the next period's predicted surrogate columns. */
  def step(tr: Transition, current: Seq[Column]): Seq[Column] =
    tr.models.map(m => Regression.predict(m, current))

  /** Affine roll-forward on the driver: coefficients (W, c) with
    * s_{t+1} = W s_t + c; after h steps the forecast is A_h s + d_h with
    * A_1 = W, A_{h+1} = W·A_h (d cancels out of any diff-in-means). */
  private def matVec(a: Array[Array[Double]], v: Array[Double]): Array[Double] =
    a.map(row => row.zip(v).map { case (x, y) => x * y }.sum)
  private def matMat(a: Array[Array[Double]], b: Array[Array[Double]]): Array[Array[Double]] =
    a.map(row => b.head.indices.map(j => row.indices.map(i => row(i) * b(i)(j)).sum).toArray)

  /** Recursive forecast + effect per future period.
    * @param surrogates  observed periods, outer = period, inner = surrogate
    *                    columns (same order every period; index 0 = outcome)
    * @param horizon     number of future periods to forecast
    * @param idCols      stable unit identity for the bootstrap draws (pass a
    *                    real key to skip the stable-id derivation shuffle)
    */
  def recursiveForecast(df: DataFrame, surrogates: Seq[Seq[Column]],
                        treatment: Column, horizon: Int,
                        bootstrapB: Int = 200, seed: Long = 42L,
                        idCols: Seq[Column] = Seq.empty): LongtermResult = {
    val k = surrogates.head.length

    // ---- bootstrap frame (also carries the POINT transition fit) ----
    val (base, ids) =
      if (idCols.nonEmpty) (df, idCols) else Bootstrap.withStableIds(df)
    val idNamed = ids.zipWithIndex.map { case (c, i) => c.as(s"__id_$i") }
    val idRefs = ids.indices.map(i => col(s"__id_$i"))
    // rep = -1 rides along with weight 1: the unweighted (point) fit is the
    // same grouped aggregate, so the separate fitTransition scan is fused
    // away (the permutationTest/ateEstimator scan-economy idiom)
    def withRepWeight(frame: DataFrame): DataFrame =
      Bootstrap.ensureParallel(frame, idRefs)
        .withColumn("rep", explode(sequence(lit(-1), lit(bootstrapB - 1))))
        .withColumn("w", when(col("rep") === -1, 1)
          .otherwise(Bootstrap.poissonWeight(idRefs, col("rep"), seed)))
        .filter(col("w") > 0)

    // pass 1: the point fit + all B weighted transition fits in ONE
    // grouped aggregate
    val stacked = withRepWeight(stackedPairs(base, surrogates, idNamed))
    val fromCols = (0 until k).map(i => col(s"__f$i"))
    val bufAggs = (0 until k).map(j =>
      Regression.olsBufColumn(col(s"__t$j"), fromCols, useBias = true,
        weight = col("w").cast("double")).as(s"b$j"))
    val fitRows = stacked.groupBy(col("rep")).agg(bufAggs.head, bufAggs.tail: _*)
      .collect()
    val tr = Transition(fitRows.find(_.getInt(0) == -1).map { row =>
      (0 until k).map(j =>
        Regression.modelFromBuf(Regression.bufFromRow(row.getStruct(j + 1)), k,
          useBias = true))
    }.getOrElse(throw new IllegalStateException("point transition fit missing")))

    // point estimates through the column-expression path — ALL horizons as
    // aggregate columns of ONE scan (one job per horizon would re-read the
    // input h times)
    val pointEst = {
      var cur = surrogates.last
      val t = treatment.cast("int")
      val aggs = (1 to horizon).map { h =>
        cur = step(tr, cur)
        val outcome = cur.head
        // count() over the outcome keeps the denominator listwise with the
        // numerator when some surrogate values are null
        (sum(when(t === 1, outcome)) / count(when(t === 1, outcome)) -
          sum(when(t === 0, outcome)) / count(when(t === 0, outcome))).as(s"d$h")
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      (0 until horizon).map(row.getDouble)
    }

    // pass 2: per-rep weighted mean vector of the LAST observed period by arm
    val t = treatment.cast("int")
    val lastNamed = surrogates.last.zipWithIndex.map { case (c, i) =>
      c.cast("double").as(s"__s$i")
    }
    val meanAggs = (0 until k).flatMap { i =>
      Seq((sum(when(col("__t") === 1, col(s"__s$i") * col("w"))) /
            sum(when(col("__t") === 1 && col(s"__s$i").isNotNull, col("w")))).as(s"m1_$i"),
        (sum(when(col("__t") === 0, col(s"__s$i") * col("w"))) /
            sum(when(col("__t") === 0 && col(s"__s$i").isNotNull, col("w")))).as(s"m0_$i"))
    }
    val meanRows = withRepWeight(base.select(idNamed ++ lastNamed :+ t.as("__t"): _*))
      .groupBy(col("rep")).agg(meanAggs.head, meanAggs.tail: _*)
      .collect().map(r => r.getInt(0) -> r).toMap

    // driver: roll each replicate's own transition forward
    val repEffects = Array.fill(horizon)(
      scala.collection.mutable.ArrayBuffer.empty[Double])
    fitRows.filter(_.getInt(0) >= 0).foreach { row =>
      val rep = row.getInt(0)
      meanRows.get(rep).foreach { mr =>
        val models = (0 until k).map(j =>
          Regression.modelFromBuf(Regression.bufFromRow(row.getStruct(j + 1)), k, useBias = true))
        val w = models.map(_.summary.coefficients.take(k)).toArray
        val dm = (0 until k).map(i =>
          mr.getDouble(1 + 2 * i) - mr.getDouble(2 + 2 * i)).toArray
        var a = w
        (0 until horizon).foreach { h =>
          val eff = matVec(a, dm)(0)
          if (!eff.isNaN) repEffects(h) += eff
          if (h + 1 < horizon) a = matMat(w, a)
        }
      }
    }

    val effects = (1 to horizon).map { h =>
      val es = repEffects(h - 1).toArray.sorted
      val obs = pointEst(h - 1)
      if (es.length < 2) Bootstrap.EffectEstimate(obs, Double.NaN, Double.NaN,
        Double.NaN, Double.NaN)
      else {
        val mean = es.sum / es.length
        val sd = math.sqrt(es.map(e => (e - mean) * (e - mean)).sum / (es.length - 1))
        def pct(p: Double): Double = es(math.min(es.length - 1,
          math.max(0, math.round(p * (es.length - 1)).toInt)))
        val z = obs / sd
        val p = if (z.isNaN) Double.NaN else 2.0 * (1.0 - Dist.normCdf(math.abs(z)))
        Bootstrap.EffectEstimate(obs, sd, pct(0.025), pct(0.975), p)
      }
    }
    LongtermResult(effects, tr)
  }
}
