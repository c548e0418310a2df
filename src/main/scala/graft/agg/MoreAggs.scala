package graft.agg

import graft.stats.{DeltaStats, Dist, LinAlg, TtestCommon}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import scala.collection.mutable

/** Sample-ratio-mismatch chi-square (reference srm.h:51-258): per-group
  * observed sums vs expected shares; χ² with k−1 dof. Groups are ordered
  * lexicographically (the reference iterates a std::map). */
case class SrmResult(groups: Array[String], observed: Array[Double],
                     expected: Array[Double], chisq: Double, p_value: Double)

class SrmAgg(ratios: Array[Double])
    extends Aggregator[(String, Double), mutable.HashMap[String, Double], SrmResult] {
  def zero: mutable.HashMap[String, Double] = mutable.HashMap.empty
  def reduce(b: mutable.HashMap[String, Double], a: (String, Double)): mutable.HashMap[String, Double] = {
    if (a._1 != null) b(a._1) = b.getOrElse(a._1, 0.0) + a._2
    b
  }
  def merge(b1: mutable.HashMap[String, Double], b2: mutable.HashMap[String, Double]): mutable.HashMap[String, Double] = {
    b2.foreach { case (k, v) => b1(k) = b1.getOrElse(k, 0.0) + v }
    b1
  }
  def finish(b: mutable.HashMap[String, Double]): SrmResult = {
    val groups = b.keys.toArray.sorted
    val obs = groups.map(b)
    val ratioSum = ratios.sum
    val obsSum = obs.sum
    val exp = ratios.map(_ / ratioSum * obsSum)
    if (groups.length != ratios.length || ratioSum == 0.0)
      return SrmResult(groups, obs, Array.fill(groups.length)(Double.NaN), Double.NaN, Double.NaN)
    var chisq = 0.0
    for (i <- obs.indices) chisq += (obs(i) - exp(i)) * (obs(i) - exp(i)) / exp(i)
    val dof = (obs.length - 1).toDouble
    val p = if (dof <= 0) Double.NaN else 1.0 - Dist.chiSqCdf(chisq, dof)
    SrmResult(groups, obs, exp, chisq, p)
  }
  def bufferEncoder: Encoder[mutable.HashMap[String, Double]] = Encoders.kryo
  def outputEncoder: Encoder[SrmResult] = Encoders.product[SrmResult]
}

/** Two-sample collection buffer shared by the rank tests. Parity port —
  * state holds the raw samples like the reference (mann_whitney.h:60-68,
  * kolmogorov_smirnov_test.h). Fine into the tens of millions of rows per
  * group; the distributed Window-based equivalents in [[graft.ops.RankTests]]
  * are the 100 TB path. */
case class TwoSamples(s0: mutable.ArrayBuffer[Double], s1: mutable.ArrayBuffer[Double])

case class MannWhitneyResult(u_statistic: Double, p_value: Double)

/** Mann-Whitney U (mann_whitney.h:90-175): average ranks with tie
  * correction, optional continuity correction, normal approximation. */
class MannWhitneyAgg(alternativeStr: String, continuity: Boolean)
    extends Aggregator[(Double, Int), TwoSamples, MannWhitneyResult] {
  @transient private lazy val alt = TtestCommon.alternative(alternativeStr)
  def zero: TwoSamples = TwoSamples(mutable.ArrayBuffer.empty, mutable.ArrayBuffer.empty)
  def reduce(b: TwoSamples, a: (Double, Int)): TwoSamples = {
    if (!a._1.isNaN && !a._1.isInfinite) { if (a._2 == 0) b.s0 += a._1 else b.s1 += a._1 }
    b
  }
  def merge(b1: TwoSamples, b2: TwoSamples): TwoSamples = {
    b1.s0 ++= b2.s0; b1.s1 ++= b2.s1; b1
  }
  def finish(b: TwoSamples): MannWhitneyResult =
    MannWhitneyMath.test(b.s0.toArray, b.s1.toArray, alt, continuity)
  def bufferEncoder: Encoder[TwoSamples] = Encoders.kryo
  def outputEncoder: Encoder[MannWhitneyResult] = Encoders.product[MannWhitneyResult]
}

object MannWhitneyMath {
  /** Returns (u2, p) exactly like the reference's [u2, p_value] JSON. */
  def test(x0: Array[Double], x1: Array[Double], alt: TtestCommon.Alternative,
           continuity: Boolean): MannWhitneyResult = {
    val n1 = x0.length.toDouble
    val n2 = x1.length.toDouble
    val size = x0.length + x1.length
    if (n1 == 0 || n2 == 0) return MannWhitneyResult(Double.NaN, Double.NaN)
    // sort merged values keeping origin; compute r1 = sum of avg ranks of sample0
    val all = new Array[(Double, Int)](size)
    var i = 0
    while (i < x0.length) { all(i) = (x0(i), 0); i += 1 }
    var j = 0
    while (j < x1.length) { all(i + j) = (x1(j), 1); j += 1 }
    val sorted = all.sortBy(_._1)
    var r1 = 0.0
    var tieNum = 0.0
    var left = 0
    while (left < size) {
      var right = left
      while (right < size && sorted(right)._1 == sorted(left)._1) right += 1
      val countEqual = (right - left).toDouble
      if (countEqual == size) return MannWhitneyResult(Double.NaN, Double.NaN)
      val adjusted = (left + right + 1) / 2.0
      tieNum += countEqual * countEqual * countEqual - countEqual
      var c0 = 0
      var p = left
      while (p < right) { if (sorted(p)._2 == 0) c0 += 1; p += 1 }
      r1 += c0 * adjusted
      left = right
    }
    val tieCorrection = 1.0 - tieNum / (size.toDouble * size * size - size)
    val u1 = n1 * n2 + n1 * (n1 + 1.0) / 2.0 - r1
    val u2 = n1 * n2 - u1
    val meanrank = n1 * n2 / 2.0 + (if (continuity) 0.5 else 0.0)
    val sd = math.sqrt(tieCorrection * n1 * n2 * (n1 + n2 + 1) / 12.0)
    if (sd.isNaN || sd.isInfinite || math.abs(sd) < 1e-7)
      return MannWhitneyResult(u2, Double.NaN)
    val u = alt match {
      case TtestCommon.TwoSided => math.max(u1, u2)
      case TtestCommon.Less => u1
      case TtestCommon.Greater => u2
    }
    var z = (u - meanrank) / sd
    if (alt == TtestCommon.TwoSided) z = math.abs(z)
    val cdf = Dist.normCdf(z)
    val p = if (alt == TtestCommon.TwoSided) 2.0 - 2.0 * cdf else 1.0 - cdf
    MannWhitneyResult(u2, p)
  }
}

case class KsResult(d_statistic: Double, p_value: Double)

/** Two-sample Kolmogorov-Smirnov (kolmogorov_smirnov_test.h:69-303):
  * D = sup |F1−F2| via sorted co-walk; exact Schröer-Trenkler recursion for
  * max(n1,n2) ≤ 10000, else Durbin (two-sided) / Hodges (one-sided)
  * asymptotics. */
class KsAgg(alternativeStr: String, methodStr: String = "auto")
    extends Aggregator[(Double, Int), TwoSamples, KsResult] {
  @transient private lazy val alt = TtestCommon.alternative(alternativeStr)
  def zero: TwoSamples = TwoSamples(mutable.ArrayBuffer.empty, mutable.ArrayBuffer.empty)
  def reduce(b: TwoSamples, a: (Double, Int)): TwoSamples = {
    if (!a._1.isNaN) { if (a._2 == 0) b.s0 += a._1 else b.s1 += a._1 }
    b
  }
  def merge(b1: TwoSamples, b2: TwoSamples): TwoSamples = {
    b1.s0 ++= b2.s0; b1.s1 ++= b2.s1; b1
  }
  def finish(b: TwoSamples): KsResult =
    KsMath.test(b.s0.toArray.sorted, b.s1.toArray.sorted, alt, methodStr)
  def bufferEncoder: Encoder[TwoSamples] = Encoders.kryo
  def outputEncoder: Encoder[KsResult] = Encoders.product[KsResult]
}

object KsMath {
  private val Tol = 1e-7
  private val TwoSidedScaler = 0.398942280401432677939946059934 // 1/sqrt(2π)

  /** x and y must be sorted ascending. */
  def test(x: Array[Double], y: Array[Double], alt: TtestCommon.Alternative,
           methodStr: String): KsResult = {
    val n1 = x.length; val n2 = y.length
    if (n1 == 0 || n2 == 0) return KsResult(Double.NaN, Double.NaN)
    // co-walk for sup CDF difference
    var maxS = Double.MinValue
    var minS = Double.MaxValue
    var nowS = 0.0
    val d1 = 1.0 / n1; val d2 = 1.0 / n2
    var px = 0; var py = 0
    while (px < n1 && py < n2) {
      if (math.abs(x(px) - y(py)) <= Tol) {
        val v = x(px)
        while (px < n1 && math.abs(x(px) - v) <= Tol) { nowS += d1; px += 1 }
        while (py < n2 && math.abs(y(py) - v) <= Tol) { nowS -= d2; py += 1 }
      } else if (x(px) < y(py)) { nowS += d1; px += 1 }
      else { nowS -= d2; py += 1 }
      maxS = math.max(maxS, nowS)
      minS = math.min(minS, nowS)
    }
    nowS += d1 * (n1 - px) - d2 * (n2 - py)
    maxS = math.max(maxS, nowS)
    minS = math.min(minS, nowS)
    val d = alt match {
      case TtestCommon.TwoSided => math.max(math.abs(maxS), math.abs(minS))
      case TtestCommon.Greater => maxS
      case TtestCommon.Less => -minS
    }
    val method =
      if (methodStr == "exact") "exact"
      else if (methodStr == "asymp" || methodStr == "asymptotic") "asymp"
      else if (math.max(n1, n2) <= 10000) "exact" else "asymp"
    val p = if (method == "exact") exactP(d, n1, n2, alt) else asympP(d, n1, n2, alt)
    KsResult(d, math.min(1.0, math.max(0.0, p)))
  }

  /** Schröer-Trenkler exact recursion (two- or one-sided). */
  private def exactP(d: Double, n1in: Int, n2in: Int, alt: TtestCommon.Alternative): Double = {
    var n1 = n1in; var n2 = n2in
    if (n2 > n1) { val t = n1; n1 = n2; n2 = t }
    val fN1 = n1.toDouble; val fN2 = n2.toDouble
    val kD = (0.5 + math.floor(d * fN2 * fN1 - Tol)) / (fN2 * fN1)
    val c = new Array[Double](n1 + 1)
    val twoSided = alt == TtestCommon.TwoSided
    @inline def check(q: Double, r: Double, s: Double): Boolean =
      if (twoSided) math.abs(r - s) >= q else r - s >= q
    c(0) = 0
    for (j <- 1 to n1) c(j) = if (check(kD, 0.0, j / fN1)) 1.0 else c(j - 1)
    for (i <- 1 to n2) {
      if (check(kD, i / fN2, 0.0)) c(0) = 1.0
      for (j <- 1 to n1) {
        if (check(kD, i / fN2, j / fN1)) c(j) = 1.0
        else {
          val v = i / (i + j).toDouble
          val w = j / (i + j).toDouble
          c(j) = v * c(j) + w * c(j - 1)
        }
      }
    }
    c(n1)
  }

  /** Asymptotic p-value (public for the distributed KS in ops.RankTests). */
  def asymptoticPValue(d: Double, n1: Long, n2: Long, alt: TtestCommon.Alternative): Double =
    math.min(1.0, math.max(0.0, asympP(d, n1, n2, alt)))

  private def asympP(d: Double, n1: Long, n2: Long, alt: TtestCommon.Alternative): Double = {
    val n = math.min(n1, n2).toDouble
    val m = math.max(n1, n2).toDouble
    var p = math.sqrt((n * m) / (n + m)) * d
    if (alt == TtestCommon.TwoSided) {
      if (p < 1) {
        val z = -(math.Pi * math.Pi / 8.0) / (p * p)
        val w = math.log(p)
        var s = 0.0
        val kMax = math.sqrt(2 - math.log(Tol)).toLong
        var k = 1L
        while (k < kMax) { s += math.exp(k * k * z - w); k += 2 }
        p = s / TwoSidedScaler
      } else {
        val z = -2 * p * p
        var s = -1.0
        var k = 1L
        var oldVal = 0.0
        var newVal = 1.0
        while (math.abs(oldVal - newVal) > Tol) {
          oldVal = newVal
          newVal += 2 * s * math.exp(z * k * k)
          s *= -1
          k += 1
        }
        p = newVal
      }
      1 - p
    } else {
      math.exp(-2 * p * p - 2 * p * (m + 2 * n) / math.sqrt(m * n * (m + n)) / 3.0)
    }
  }
}

/** `matrix_multiplication([cols], invert)` — one-pass Gram matrix XᵀX,
  * optionally inverted in the finalizer
  * (matrix_multiplication.h:162-189). Powers the IRLS logistic loop. */
case class MatrixResult(matrix: Array[Array[Double]])

class MatrixMulAgg(k: Int, invert: Boolean)
    extends Aggregator[Array[Double], DeltaStats, MatrixResult] {
  def zero: DeltaStats = DeltaStats.zero(k)
  def reduce(b: DeltaStats, a: Array[Double]): DeltaStats = {
    if (a != null && a.length == k) b.update(a)
    b
  }
  def merge(b1: DeltaStats, b2: DeltaStats): DeltaStats = b1.merge(b2)
  def finish(s: DeltaStats): MatrixResult = {
    val xtx = s.xtx
    if (!invert) MatrixResult(xtx)
    else {
      val (inv, _) = LinAlg.invertWithDropped(xtx)
      MatrixResult(inv)
    }
  }
  def bufferEncoder: Encoder[DeltaStats] = AggEncoders.deltaStatsEnc
  def outputEncoder: Encoder[MatrixResult] = Encoders.product[MatrixResult]
}
