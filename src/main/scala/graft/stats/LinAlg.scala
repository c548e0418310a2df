package graft.stats

/** Minimal dense linear algebra over Array[Array[Double]] — the state
  * matrices here are tiny (k ≤ a few dozen), so driver/finalizer-side
  * Gauss-Jordan is plenty. Semantics mirror the reference's
  * MathHelpers::invert_matrix (/root/reference/src/udf/starrocks/be/src/
  * exprs/helpers/math_helpers.hpp:36-106): collinear rows/columns are
  * dropped and their entries reported, remaining block inverted.
  */
object LinAlg {
  type Mat = Array[Array[Double]]

  def zeros(r: Int, c: Int): Mat = Array.fill(r)(new Array[Double](c))

  def matMul(a: Mat, b: Mat): Mat = {
    val r = a.length; val inner = b.length; val c = b(0).length
    val out = zeros(r, c)
    var i = 0
    while (i < r) {
      var k = 0
      while (k < inner) {
        val aik = a(i)(k)
        if (aik != 0.0) {
          var j = 0
          while (j < c) { out(i)(j) += aik * b(k)(j); j += 1 }
        }
        k += 1
      }
      i += 1
    }
    out
  }

  def transpose(a: Mat): Mat = {
    val out = zeros(a(0).length, a.length)
    for (i <- a.indices; j <- a(0).indices) out(j)(i) = a(i)(j)
    out
  }

  def matVec(a: Mat, x: Array[Double]): Array[Double] = {
    val out = new Array[Double](a.length)
    var i = 0
    while (i < a.length) {
      var s = 0.0; var j = 0
      while (j < x.length) { s += a(i)(j) * x(j); j += 1 }
      out(i) = s; i += 1
    }
    out
  }

  def dot(x: Array[Double], y: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < x.length) { s += x(i) * y(i); i += 1 }
    s
  }

  /** xᵀ A y for square A. */
  def quadForm(x: Array[Double], a: Mat, y: Array[Double]): Double =
    dot(x, matVec(a, y))

  /** Invert with collinearity handling: Gauss-Jordan with partial
    * pivoting; near-zero pivots mark that index as dropped — the returned
    * inverse has NaN on dropped rows/cols (callers zero or skip them),
    * matching the reference's nan_index contract. Returns (inverse,
    * droppedIndices). */
  def invertWithDropped(input: Mat, relEps: Double = 1e-12): (Mat, Array[Int]) = {
    val n = input.length
    require(n > 0 && input(0).length == n, "square matrix required")
    // scale reference for pivot threshold
    var maxAbs = 0.0
    for (i <- 0 until n; j <- 0 until n) maxAbs = math.max(maxAbs, math.abs(input(i)(j)))
    val eps = if (maxAbs == 0.0) relEps else relEps * maxAbs

    val a = input.map(_.clone())
    val inv = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    val dropped = scala.collection.mutable.ArrayBuffer.empty[Int]
    val active = Array.fill(n)(true)

    for (col <- 0 until n) {
      // Inputs here are symmetric PSD (covariance/Gram), so diagonal
      // pivoting with a magnitude check suffices; a vanishing diagonal
      // after elimination means the column is collinear with earlier ones.
      if (math.abs(a(col)(col)) <= eps) {
        dropped += col
        active(col) = false
      } else {
        val p = a(col)(col)
        var j = 0
        while (j < n) { a(col)(j) /= p; inv(col)(j) /= p; j += 1 }
        var r = 0
        while (r < n) {
          if (r != col && active(r)) {
            val f = a(r)(col)
            if (f != 0.0) {
              var jj = 0
              while (jj < n) {
                a(r)(jj) -= f * a(col)(jj); inv(r)(jj) -= f * inv(col)(jj); jj += 1
              }
            }
          }
          r += 1
        }
      }
    }
    if (dropped.nonEmpty) {
      for (d <- dropped; j <- 0 until n) { inv(d)(j) = Double.NaN; inv(j)(d) = Double.NaN }
    }
    (inv, dropped.toArray)
  }

  /** Plain inverse; throws on singular. */
  def invert(input: Mat): Mat = {
    val (inv, dropped) = invertWithDropped(input)
    require(dropped.isEmpty, "singular matrix")
    inv
  }
}
