package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** Structured Streaming surface for the engine: continuous experiment
  * metrics over an event stream.
  *
  * The reference is purely batch (SURVEY §1: no streaming surface), but a
  * 100 TB training-data/experimentation pipeline ingests continuously, so
  * the streaming module provides the always-on versions of the core
  * operators: watermarked windowed metric aggregation, streaming two-sample
  * t-tests (the same single-pass moment state the batch aggregate uses —
  * sums/counts per arm are associative, so they fold per window), and
  * stateful sessionization via flatMapGroupsWithState.
  *
  * All outputs are append/update-mode compatible: aggregations key on
  * (window, …) with an event-time watermark bounding state.
  */
object StreamOps {

  /** Watermarked per-window metric aggregation: count/sum/avg of `value`
    * per (window, group). Works on `readStream` frames with an event-time
    * column. */
  def windowedMetrics(events: DataFrame, eventTime: Column, group: Column,
                      value: Column, windowDuration: String,
                      watermarkDelay: String): DataFrame =
    events
      .withColumn("__et", eventTime.cast("timestamp"))
      .withWatermark("__et", watermarkDelay)
      .groupBy(window(col("__et"), windowDuration), group.as("group"))
      .agg(count(lit(1)).as("n"),
        sum(value.cast("double")).as("sum_value"),
        avg(value.cast("double")).as("avg_value"))

  /** Streaming drift monitor: per-window PSI of an incoming metric against
    * a FIXED baseline distribution (the training-data-quality alarm — fire
    * when a window's PSI crosses 0.25). `baselineShares(i)` is the
    * baseline probability of ordinal bin i under `bins`
    * ([[graft.ops.Features.cutBins]] convention, bins.length + 1 bins
    * total). Per-(window, bin) counts fold associatively under
    * late/out-of-order arrivals; the PSI term is a projection, and the
    * per-window total is a second (tiny, windows×bins-cell) aggregation.
    * Shares are floored like [[graft.ops.Drift.binnedDrift]]. */
  def windowedPsi(events: DataFrame, eventTime: Column, value: Column,
                  bins: Seq[Double], baselineShares: Seq[Double],
                  windowDuration: String, watermarkDelay: String,
                  minShare: Double = 1e-6): DataFrame = {
    require(baselineShares.length == bins.length + 1,
      s"need ${bins.length + 1} baseline shares for ${bins.length} splits")
    require(math.abs(baselineShares.sum - 1.0) < 1e-6,
      "baseline shares must sum to 1")
    val binCol = graft.ops.Features.cutBins(value, bins, ifString = false)
    val k = bins.length // bins 0..k
    // ONE streaming aggregation: per-bin conditional counts as columns (a
    // rank-over-window total is illegal on a stream); PSI unrolls in the
    // projection over the k+1 columns
    val counts = (0 to k).map(i =>
      sum(when(binCol === i, 1L).otherwise(0L)).as(s"__n$i"))
    // null metric values are dropped BEFORE binning (cutBins' otherwise
    // branch would silently assign them to the top ordinal bin), matching
    // the batch twin Drift.binnedDrift's null convention; rows whose event
    // time doesn't cast are dropped with them
    val agged = events
      .filter(value.isNotNull)
      .withColumn("__et", eventTime.cast("timestamp"))
      .filter(col("__et").isNotNull)
      .withWatermark("__et", watermarkDelay)
      .groupBy(window(col("__et"), windowDuration))
      .agg(counts.head, counts.tail: _*)
    val totalCol = (0 to k).map(i => col(s"__n$i")).reduce(_ + _)
    def term(i: Int): Column = {
      val p = greatest(lit(baselineShares(i)), lit(minShare))
      val q = greatest(col(s"__n$i").cast("double") / col("n_window"),
        lit(minShare))
      (q - p) * log(q / p)
    }
    agged
      .withColumn("n_window", totalCol.cast("double"))
      .withColumn("psi", (0 to k).map(term).reduce(_ + _))
      .select(col("window"), col("n_window").cast("long").as("n_window"),
        col("psi"))
  }

  /** Streaming two-sample t-test per window: per-(window, arm) moment
    * state (n, Σy, Σy²) folds associatively under late/out-of-order
    * arrivals; the Welch statistic is computed in the projection, so each
    * update-mode emission carries the current test result for its window. */
  def windowedTtest(events: DataFrame, eventTime: Column, treatment: Column,
                    value: Column, windowDuration: String,
                    watermarkDelay: String): DataFrame = {
    val v = value.cast("double")
    val moments = events
      .withColumn("__et", eventTime.cast("timestamp"))
      .withWatermark("__et", watermarkDelay)
      .groupBy(window(col("__et"), windowDuration))
      .agg(
        sum(when(treatment === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(treatment === 1, v).otherwise(0.0)).as("s1"),
        sum(when(treatment === 1, v * v).otherwise(0.0)).as("q1"),
        sum(when(treatment === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(treatment === 0, v).otherwise(0.0)).as("s0"),
        sum(when(treatment === 0, v * v).otherwise(0.0)).as("q0"))
    val m1 = col("s1") / col("n1"); val m0 = col("s0") / col("n0")
    val v1 = (col("q1") - col("s1") * col("s1") / col("n1")) / (col("n1") - 1)
    val v0 = (col("q0") - col("s0") * col("s0") / col("n0")) / (col("n0") - 1)
    val se = sqrt(v1 / col("n1") + v0 / col("n0"))
    moments.select(col("window"), col("n0"), col("n1"),
      m0.as("mean0"), m1.as("mean1"),
      (m1 - m0).as("estimate"), se.as("stderr"),
      ((m1 - m0) / se).as("t_statistic"))
  }

  /** Streaming sample-ratio-mismatch monitor: per-window chi-square of the
    * observed arm counts against expected `ratios` — the live experiment
    * health check (srm.h semantics on a stream). Per-(window, arm) counts
    * fold associatively under late/out-of-order arrivals; chisq and the
    * p-value are projection-time expressions, so every update-mode
    * emission carries the window's current verdict. */
  def windowedSrm(events: DataFrame, eventTime: Column, arm: Column,
                  ratios: Seq[Double], windowDuration: String,
                  watermarkDelay: String): DataFrame = {
    require(ratios.nonEmpty && ratios.forall(_ > 0), "ratios must be positive")
    val k = ratios.length
    val ratioSum = ratios.sum
    val armInt = arm.cast("int")
    val countCols = (0 until k).map(i =>
      sum(when(armInt === i, 1L).otherwise(0L)).as(s"c$i")) :+
      // arms outside 0..k-1 (or null) are surfaced, not silently dropped —
      // the batch SrmAgg likewise NaNs on a group-count mismatch
      sum(when(armInt.isNull || armInt < 0 || armInt >= k, 1L).otherwise(0L))
        .as("c_unexpected")
    val counts = events
      .withColumn("__et", eventTime.cast("timestamp"))
      .withWatermark("__et", watermarkDelay)
      .groupBy(window(col("__et"), windowDuration))
      .agg(countCols.head, countCols.tail: _*)
    val total = (0 until k).map(i => col(s"c$i")).reduce(_ + _).cast("double")
    val chisqRaw = (0 until k).map { i =>
      val e = lit(ratios(i) / ratioSum) * total
      (col(s"c$i") - e) * (col(s"c$i") - e) / e
    }.reduce(_ + _)
    val chisq = when(col("c_unexpected") > 0, lit(Double.NaN)).otherwise(chisqRaw)
    val pUdf = udf((x: Double) =>
      if (x.isNaN) Double.NaN else 1.0 - graft.stats.Dist.chiSqCdf(x, (k - 1).toDouble))
    counts.select(col("window") +: (0 until k).map(i => col(s"c$i")) :+
      col("c_unexpected") :+ chisq.as("chisq") :+ pUdf(chisq).as("p_value"): _*)
  }

  /** Streaming exact dedup for a continuously-ingested corpus: drops every
    * re-occurrence of a normalized-content fingerprint arriving within the
    * watermark horizon (`dropDuplicatesWithinWatermark`, so per-key state
    * is evicted once the watermark passes it — bounded state at any
    * ingest rate; the batch [[graft.ops.Dedup.exactDedup]] is the
    * full-corpus equivalent). */
  def streamingDedup(docs: DataFrame, eventTime: Column, text: Column,
                     watermarkDelay: String): DataFrame =
    docs
      .withColumn("__fp", graft.ops.TextOps.contentFingerprint(text))
      .withColumn("__et", eventTime.cast("timestamp"))
      .withWatermark("__et", watermarkDelay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp", "__et")

  case class MsprtEvent(expId: Long, t: Int, y: Double)
  case class MsprtState(n1: Long, s1: Double, q1: Double,
                        n0: Long, s0: Double, q0: Double, maxLam: Double)
  case class MsprtOut(expId: Long, n1: Long, n0: Long, estimate: Double,
                      lambda: Double, pAlwaysValid: Double)

  /** Always-on mSPRT monitor ([[graft.ops.Sequential.msprt]]'s streaming
    * twin): per-experiment cumulative moment state folds each micro-batch
    * (sums are associative, so in-batch order is irrelevant), and every
    * batch emits the experiment's current mixture likelihood ratio and
    * anytime-valid p = min(1, 1/max Λ) — valid at ANY look schedule, so
    * the micro-batch cadence needs no correction. State is 7 scalars per
    * experiment, bounded forever; nothing is emitted for an experiment
    * until both arms hold ≥ 2 observations (variance undefined before). */
  def streamingMsprt(events: org.apache.spark.sql.Dataset[MsprtEvent],
                     tau: Double = 1.0)
      : org.apache.spark.sql.Dataset[MsprtOut] = {
    require(tau > 0, s"streamingMsprt: tau must be positive, got $tau")
    import events.sparkSession.implicits._
    val t2 = tau * tau
    events.groupByKey(_.expId)
      .flatMapGroupsWithState[MsprtState, MsprtOut](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        case (id, evts, state: GroupState[MsprtState]) =>
          var st = state.getOption.getOrElse(
            MsprtState(0L, 0.0, 0.0, 0L, 0.0, 0.0, Double.NegativeInfinity))
          evts.foreach { e =>
            if (e.t == 1)
              st = st.copy(n1 = st.n1 + 1, s1 = st.s1 + e.y,
                q1 = st.q1 + e.y * e.y)
            else if (e.t == 0)
              st = st.copy(n0 = st.n0 + 1, s0 = st.s0 + e.y,
                q0 = st.q0 + e.y * e.y)
          }
          if (st.n1 < 2 || st.n0 < 2) { state.update(st); Iterator.empty }
          else {
            val varP = ((st.q1 - st.s1 * st.s1 / st.n1) +
              (st.q0 - st.s0 * st.s0 / st.n0)) / (st.n1 + st.n0 - 2)
            val v = varP * (1.0 / st.n1 + 1.0 / st.n0)
            if (v <= 0) { state.update(st); Iterator.empty }
            else {
              val d = st.s1 / st.n1 - st.s0 / st.n0
              val lam = math.sqrt(v / (v + t2)) *
                math.exp(d * d * t2 / (2.0 * v * (v + t2)))
              st = st.copy(maxLam = math.max(st.maxLam, lam))
              state.update(st)
              Iterator(MsprtOut(id, st.n1, st.n0, d, lam,
                math.min(1.0, 1.0 / st.maxLam)))
            }
          }
      }
  }

  case class EwmaEvent(metricId: String, period: Long, value: Double)
  case class EwmaState(openPeriod: Long, sum: Double, cnt: Long,
                       n: Long, mean: Double, m2: Double, z: Double,
                       steps: Long)
  case class EwmaOut(metricId: String, period: Long, nEvents: Long,
                     metric: Double, ewma: Double, baseline: Double,
                     limitLower: Double, limitUpper: Double,
                     isAnomaly: Boolean)

  /** Always-on EWMA control chart ([[graft.ops.Drift.ewmaMonitor]]'s
    * streaming twin): per-metric state accumulates the OPEN period's
    * sum/count and closes a period when a later one arrives (the
    * [[sessionize]] contract — each metric's LAST period stays open in
    * state, and late events for already-closed periods are dropped).
    * On close: z ← λ·x̄ + (1−λ)·z (seeded at the first period's metric),
    * flagged against the limits built from the PRIOR periods' running
    * mean/sd (Welford state — the stream cannot know the global mean the
    * batch op centers on, so the baseline is explicitly causal).
    * State is 8 scalars per metric, bounded forever. Deterministic under
    * a single AvailableNow batch — the oracle-gate shape. */
  def streamingEwma(events: org.apache.spark.sql.Dataset[EwmaEvent],
                    lambda: Double = 0.2, l: Double = 3.0,
                    minHistory: Int = 3)
      : org.apache.spark.sql.Dataset[EwmaOut] = {
    require(lambda > 0 && lambda <= 1, s"streamingEwma: lambda in (0, 1]")
    require(l > 0 && minHistory >= 2, "streamingEwma: l > 0, minHistory >= 2")
    import events.sparkSession.implicits._
    events.groupByKey(_.metricId)
      .flatMapGroupsWithState[EwmaState, EwmaOut](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        case (id, evts, state: GroupState[EwmaState]) =>
          var st = state.getOption.getOrElse(
            EwmaState(Long.MinValue, 0.0, 0L, 0L, 0.0, 0.0, 0.0, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[EwmaOut]
          def close(): Unit = if (st.cnt > 0) {
            val x = st.sum / st.cnt
            val zPrev = if (st.steps == 0) x else st.z
            val z = lambda * x + (1 - lambda) * zPrev
            val sd = if (st.n >= 2) math.sqrt(st.m2 / (st.n - 1)) else 0.0
            val ramp = 1.0 - math.pow(1.0 - lambda, 2.0 * (st.steps + 1))
            val lim = l * sd * math.sqrt(lambda / (2.0 - lambda) * ramp)
            val baseline = if (st.n == 0) x else st.mean
            out += EwmaOut(id, st.openPeriod, st.cnt, x, z,
              baseline, baseline - lim, baseline + lim,
              st.n >= minHistory && sd > 0 && math.abs(z - baseline) > lim)
            val n1 = st.n + 1
            val d = x - st.mean
            val mean1 = st.mean + d / n1
            st = st.copy(n = n1, mean = mean1, m2 = st.m2 + d * (x - mean1),
              z = z, steps = st.steps + 1, sum = 0.0, cnt = 0L)
          }
          evts.toSeq.sortBy(_.period).foreach { e =>
            if (st.cnt == 0 && e.period > st.openPeriod)
              st = st.copy(openPeriod = e.period)
            if (e.period == st.openPeriod)
              st = st.copy(sum = st.sum + e.value, cnt = st.cnt + 1)
            else if (e.period > st.openPeriod) {
              close()
              st = st.copy(openPeriod = e.period, sum = e.value, cnt = 1L)
            } // e.period < openPeriod: late for a closed period — dropped
          }
          state.update(st)
          out.iterator
      }
  }

  case class PhState(openPeriod: Long, sum: Double, cnt: Long,
                     steps: Long, sumX: Double, u: Double, minU: Double)
  case class PhOut(metricId: String, period: Long, nEvents: Long,
                   metric: Double, ph: Double, isAlarm: Boolean)

  /** Always-on Page-Hinkley mean-increase detector
    * ([[graft.ops.Drift.pageHinkley]]'s streaming twin, same period-close
    * contract as [[streamingEwma]]): on each period close with metric x,
    *
    *   m = (Σ closed x)/T  (inclusive running mean as sum/count — the
    *   same arithmetic as the batch window's avg, not Welford, so the
    *   two paths agree bit-for-bit)
    *   U ← U + (x − m − δ),   PH = U − min U,   alarm iff PH > λ
    *
    * — term-identical to the batch op's window form, so the two agree on
    * the same closed periods (spec-pinned). State is 7 scalars per
    * metric, bounded forever; late events for closed periods drop.
    * Deterministic under a single AvailableNow batch. */
  def streamingPageHinkley(events: org.apache.spark.sql.Dataset[EwmaEvent],
                           lambda: Double, delta: Double = 0.0)
      : org.apache.spark.sql.Dataset[PhOut] = {
    require(lambda > 0, s"streamingPageHinkley: lambda must be > 0, got $lambda")
    import events.sparkSession.implicits._
    events.groupByKey(_.metricId)
      .flatMapGroupsWithState[PhState, PhOut](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        case (id, evts, state: GroupState[PhState]) =>
          var st = state.getOption.getOrElse(
            PhState(Long.MinValue, 0.0, 0L, 0L, 0.0, 0.0, Double.MaxValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[PhOut]
          def close(): Unit = if (st.cnt > 0) {
            val x = st.sum / st.cnt
            val t = st.steps + 1
            val sumX = st.sumX + x
            val mean = sumX / t
            val u = st.u + (x - mean - delta)
            val minU = math.min(st.minU, u)
            val ph = u - minU
            out += PhOut(id, st.openPeriod, st.cnt, x, ph, ph > lambda)
            st = st.copy(steps = t, sumX = sumX, u = u, minU = minU,
              sum = 0.0, cnt = 0L)
          }
          evts.toSeq.sortBy(_.period).foreach { e =>
            if (st.cnt == 0 && e.period > st.openPeriod)
              st = st.copy(openPeriod = e.period)
            if (e.period == st.openPeriod)
              st = st.copy(sum = st.sum + e.value, cnt = st.cnt + 1)
            else if (e.period > st.openPeriod) {
              close()
              st = st.copy(openPeriod = e.period, sum = e.value, cnt = 1L)
            } // late for a closed period — dropped
          }
          state.update(st)
          out.iterator
      }
  }

  case class SessionEvent(userId: Long, ts: Long, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  case class SessionOut(userId: Long, start: Long, end: Long, n: Long,
                        sum: Double, duration: Long)

  /** Gap-based sessionization with flatMapGroupsWithState: a session closes
    * after `gap` of inactivity (in-batch gap always; idle-state expiry via
    * the configured timeout — ProcessingTimeTimeout in production, NoTimeout
    * for deterministic tests); emits one row per closed session. The
    * canonical custom-state streaming pattern the engine exposes for
    * per-entity accumulation beyond windowed aggs.
    *
    * UNITS: `gap` (and the emitted `duration` = last − start) are in
    * whatever unit the `ts` column carries — the comparison is pure long
    * arithmetic, deliberately unit-agnostic (epoch millis, micros, nanos
    * all work as long as gap matches). The ProcessingTimeTimeout idle
    * expiry, by contrast, is WALL-CLOCK and always milliseconds:
    * `idleTimeoutMs` sets it explicitly; its 0 default falls back to `gap`,
    * which is only correct when ts is epoch-millis — pass it when it
    * isn't. */
  def sessionize(events: org.apache.spark.sql.Dataset[SessionEvent], gap: Long,
                 timeout: GroupStateTimeout = GroupStateTimeout.ProcessingTimeTimeout(),
                 idleTimeoutMs: Long = 0L)
      : org.apache.spark.sql.Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val timeoutMs = if (idleTimeoutMs > 0L) idleTimeoutMs else gap
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        org.apache.spark.sql.streaming.OutputMode.Append(), timeout) {
        case (uid, evts, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(uid, s.start, s.last, s.n, s.sum, s.last - s.start))
          } else {
            val sorted = evts.toSeq.sortBy(_.ts)
            var cur = state.getOption
            val out = scala.collection.mutable.ArrayBuffer[SessionOut]()
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts - s.last <= gap =>
                  cur = Some(s.copy(last = e.ts, n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  out += SessionOut(uid, s.start, s.last, s.n, s.sum, s.last - s.start)
                  cur = Some(SessionState(e.ts, e.ts, 1, e.value))
                case None =>
                  cur = Some(SessionState(e.ts, e.ts, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              if (timeout == GroupStateTimeout.ProcessingTimeTimeout())
                state.setTimeoutDuration(timeoutMs)
            }
            out.iterator
          }
      }
  }
}
