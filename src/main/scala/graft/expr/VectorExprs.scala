package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fused per-row vector kernels for the ANN / embedding-dedup hot paths.
  *
  * The column-composition versions (`aggregate(zip_with(...))`) evaluate a
  * lambda per element per fold — three array traversals and ~6 virtual
  * calls per element for one cosine. These expressions make ONE pass in a
  * tight JIT'd loop and stay inside whole-stage codegen. Semantics mirror
  * the composed forms exactly: any null element, or a length mismatch
  * (zip_with pads with nulls), yields NULL; two empty arrays yield NaN
  * (0/0); accumulation order per accumulator is identical, so results are
  * bit-for-bit equal — verified in PipelineOpsSpec.
  */
object VectorOps {
  /** cosine(a, b); boxed so null can signal the composed form's null. */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; nx += x * x; ny += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(nx) * math.sqrt(ny)))
  }

  /** Σ (a_i − v_i)² against a plan-constant vector (IVF centroid). */
  def l2sq(a: ArrayData, v: Array[Double]): java.lang.Double = {
    val n = a.numElements()
    if (v.length != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val d = a.getDouble(i) - v(i)
      s += d * d
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Argmin L2² over a plan-constant centroid table: (best d², index).
    * Ties keep the LOWEST index — the same choice `array_min` over
    * struct(d, cluster) makes, so swapping one for the other is
    * result-identical. Null on any null element / length mismatch. */
  def nearestCentroid(a: ArrayData,
                      cs: Array[Array[Double]]): org.apache.spark.sql.catalyst.InternalRow = {
    val n = a.numElements()
    var best = Double.PositiveInfinity
    var bi = -1
    var c = 0
    while (c < cs.length) { // inlined l2sq: no box per centroid per row
      val v = cs(c)
      if (v.length != n) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return null
        val d = a.getDouble(i) - v(i)
        s += d * d
        i += 1
      }
      if (s < best) { best = s; bi = c }
      c += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, bi))
  }

  /** Top-`p` nearest centroid indices by L2², ascending distance — the
    * multi-assignment kernel behind semantic-dedup `probes` (a vector
    * lands in its p nearest buckets so near-duplicates straddling ONE
    * k-means boundary still share a bucket). Insertion uses strict `<`
    * over (distance, index): equal distances keep the EARLIER centroid
    * index, so element 0 is exactly [[nearestCentroid]]'s answer. Null on
    * any null element / length mismatch. */
  def nearestCentroids(a: ArrayData, cs: Array[Array[Double]],
                       p: Int): ArrayData = {
    val n = a.numElements()
    val m = math.min(p, cs.length)
    val bd = Array.fill(m)(Double.PositiveInfinity)
    val bi = Array.fill(m)(-1)
    var c = 0
    while (c < cs.length) {
      val v = cs(c)
      if (v.length != n) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return null
        val d = a.getDouble(i) - v(i)
        s += d * d
        i += 1
      }
      // insertion into the fixed-size top list: strict < keeps the
      // lower index on exact ties (centroids scan in index order)
      var j = m - 1
      if (s < bd(j)) {
        while (j > 0 && s < bd(j - 1)) {
          bd(j) = bd(j - 1); bi(j) = bi(j - 1); j -= 1
        }
        bd(j) = s; bi(j) = c
      }
      c += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(bi)
  }
}

/** Codegen'd cosine similarity over two array<double> columns. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.requireDoubleArray(left, prettyName)
      match {
        case TypeCheckResult.TypeCheckSuccess =>
          VectorExprs.requireDoubleArray(right, prettyName)
        case f => f
      }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh local: with non-nullable children nullSafeCodeGen inlines this
    // unbraced, so a fixed name collides when two kernels share a scope
    val r = ctx.freshName("r")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double $r = graft.expr.VectorOps.cosine($a, $b);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
    """)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd argmin-L2² over a plan-constant centroid TABLE, returning
  * struct(d: double, cluster: int). The k-means/IVF assignment kernel:
  * the composed form — `array_min(array(k × struct(l2SqToLit, lit)))` —
  * allocates k structs + one k-array per row and its generated code grows
  * O(k·dim); this is ONE reference object and one tight loop, so k in the
  * thousands (SemDeDup-scale bucketing) neither bloats codegen nor
  * allocates. Tie-break (lowest index) and arithmetic order match the
  * composed form exactly — result-identical, pinned in spec. */
case class NearestCentroid(child: Expression, cs: Array[Array[Double]])
    extends UnaryExpression {
  require(cs.nonEmpty, "nearest_centroid: centroid table is empty")
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.requireDoubleArray(child, prettyName)
  override def dataType: DataType = StructType(Seq(
    StructField("d", DoubleType, nullable = false),
    StructField("cluster", IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"
  override protected def nullSafeEval(input: Any): Any =
    VectorOps.nearestCentroid(input.asInstanceOf[ArrayData], cs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", cs, "double[][]")
    val r = ctx.freshName("r")
    nullSafeCodeGen(ctx, ev, a => s"""
      org.apache.spark.sql.catalyst.InternalRow $r =
        graft.expr.VectorOps.nearestCentroid($a, $ref);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroid =
    copy(child = newChild)
  // Array has reference equality; compare contents for canonicalization
  override def equals(o: Any): Boolean = o match {
    case NearestCentroid(c, ocs) => c == child && ocs.length == cs.length &&
      ocs.indices.forall(i => java.util.Arrays.equals(ocs(i), cs(i)))
    case _ => false
  }
  override def hashCode(): Int =
    child.hashCode() * 31 + cs.map(java.util.Arrays.hashCode).toSeq.hashCode()
}

/** Codegen'd top-`p` argmin-L2² over a plan-constant centroid TABLE,
  * returning array<int> of centroid indices ascending by distance —
  * element 0 is [[NearestCentroid]]'s cluster (same tie-break). The
  * semantic-dedup multi-assignment kernel: one reference object, one
  * tight loop, codegen size independent of k AND p. */
case class NearestCentroids(child: Expression, cs: Array[Array[Double]],
                            p: Int) extends UnaryExpression {
  require(cs.nonEmpty, "nearest_centroids: centroid table is empty")
  require(p >= 1, s"nearest_centroids: p must be >= 1, got $p")
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.requireDoubleArray(child, prettyName)
  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroids"
  override protected def nullSafeEval(input: Any): Any =
    VectorOps.nearestCentroids(input.asInstanceOf[ArrayData], cs, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", cs, "double[][]")
    val r = ctx.freshName("r")
    nullSafeCodeGen(ctx, ev, a => s"""
      org.apache.spark.sql.catalyst.util.ArrayData $r =
        graft.expr.VectorOps.nearestCentroids($a, $ref, $p);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCentroids =
    copy(child = newChild)
  // Array has reference equality; compare contents for canonicalization
  override def equals(o: Any): Boolean = o match {
    case NearestCentroids(c, ocs, op) => c == child && op == p &&
      ocs.length == cs.length &&
      ocs.indices.forall(i => java.util.Arrays.equals(ocs(i), cs(i)))
    case _ => false
  }
  override def hashCode(): Int =
    (child.hashCode() * 31 + cs.map(java.util.Arrays.hashCode).toSeq
      .hashCode()) * 31 + p
}

/** Codegen'd squared L2 distance to a plan-constant vector. */
case class L2SqToLit(child: Expression, v: Array[Double])
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VectorExprs.requireDoubleArray(child, prettyName)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2sq_to_lit"
  @transient private lazy val vRef = v
  override protected def nullSafeEval(input: Any): Any =
    VectorOps.l2sq(input.asInstanceOf[ArrayData], v)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vName = ctx.addReferenceObj("l2vec", v, "double[]")
    val r = ctx.freshName("r")
    nullSafeCodeGen(ctx, ev, a => s"""
      java.lang.Double $r = graft.expr.VectorOps.l2sq($a, $vName);
      if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.doubleValue(); }
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): L2SqToLit =
    copy(child = newChild)
  // Array[Double] has reference equality; compare contents so plan
  // canonicalization (and test ===) behaves
  override def equals(o: Any): Boolean = o match {
    case L2SqToLit(c, ov) => c == child && java.util.Arrays.equals(ov, v)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode() + java.util.Arrays.hashCode(v)
}

object VectorExprs {
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def l2SqToLit(a: Column, v: Array[Double]): Column =
    ColumnBridge.column(L2SqToLit(ColumnBridge.expression(a), v))

  def nearestCentroid(a: Column, cs: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(a), cs))

  def nearestCentroids(a: Column, cs: Array[Array[Double]], p: Int): Column =
    ColumnBridge.column(NearestCentroids(ColumnBridge.expression(a), cs, p))

  private[expr] def requireDoubleArray(e: Expression, name: String): TypeCheckResult =
    e.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<double> input, got ${other.catalogString}")
    }
}
