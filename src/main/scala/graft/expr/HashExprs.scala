package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Fused per-row hash kernels for the dedup operators.
  *
  * The column-composition versions traverse the token/shingle array once PER
  * OUTPUT COORDINATE (96 `array_min(zip_with(...))` expressions for a MinHash
  * signature, 64 `aggregate()` folds for a SimHash) — ~100x more array
  * traversals than necessary. These expressions make ONE pass over the array
  * per row and compute every coordinate in a tight JIT'd loop, while staying
  * inside whole-stage codegen (the generated code calls the static kernels
  * below). Bit-for-bit identical to the composed versions (same xxhash64
  * seeding, same per-slice affine permutations, same mod-prime wrap) —
  * verified in PipelineOpsSpec.
  */
object HashOps {
  /** 2^31 - 1; see Dedup.minHashesFromShingles for why the mod-prime wrap
    * is essential. */
  val MinHashPrime: Long = 2147483647L
  private val Mask = 0x3FFFFFFFL
  private val Seed = 42L // Spark's default xxhash64 seed

  /** Per-slice affine-permutation coefficients over p = 2^31 − 1:
    * h_c(x) = (a_c·x + b_c) mod p with (a_c, b_c) drawn independently
    * per slice from seeded xxhash. The pre-r16 Kirsch-Mitzenmacher walk
    * (h1 + c·h2 mod p) shared BOTH coefficients per ELEMENT, so across
    * slices the rankings were driven by each element's own slope h2 —
    * once c·h2 spreads past the h1 range, the globally-smallest-slope
    * element of a set wins nearly every remaining slice. For LSH that
    * is a recall pathology: if that dominating element is one of a
    * near-dup pair's few UNSHARED shingles, every band of the pair
    * disagrees at once (measured at sf1: 19 true J >= 0.94 pairs with
    * 0/16 equal bands, 68/96 equal hashes where J predicts ~94/96).
    * With per-slice coefficients every element within a slice shares
    * one map, and slices are independent — P(slice agrees) = J. */
  def sliceA(c: Int): Long =
    java.lang.Long.remainderUnsigned(XXH64.hashInt(c, 0xA11CEL),
      MinHashPrime - 1) + 1
  def sliceB(c: Int): Long =
    java.lang.Long.remainderUnsigned(XXH64.hashInt(c, 0xB0B5EEDL),
      MinHashPrime)
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Integer, (Array[Long], Array[Long])]()
  private def coeffs(k: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(k,
      _ => (Array.tabulate(k)(sliceA), Array.tabulate(k)(sliceB)))
  /** (a·x + b) mod p for p = 2^31 − 1 by Mersenne folding: a, b < p and
    * x < 2^30, so t < 2^61 and two folds + one subtract reduce fully. */
  @inline private def affineModP(a: Long, x: Long, b: Long): Long = {
    var t = a * x + b
    t = (t & MinHashPrime) + (t >>> 31)
    t = (t & MinHashPrime) + (t >>> 31)
    if (t >= MinHashPrime) t - MinHashPrime else t
  }

  /** MinHash signature: mins(c) = min over shingles of (a_c·x + b_c)
    * mod p, x = 30 masked bits of one xxhash64 of the shingle bytes. */
  def minHashSig(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k)) // array_min([]) = null
    val (as, bs) = coeffs(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < n) {
      // xxhash64(null) leaves the seed untouched — mirror that
      val h1full = if (arr.isNullAt(j)) Seed
        else XXH64.hashUTF8String(arr.getUTF8String(j), Seed)
      val x = h1full & Mask
      var i = 0
      while (i < k) {
        val v = affineModP(as(i), x, bs(i))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** Fused tokenize → n-token shingle → MinHash signature: one pass over
    * the normalized text bytes, no intermediate shingle strings or arrays.
    * Bit-identical to `minHashSig(shingles(text, n), k)`: tokens split on
    * the six ASCII regex-\s whitespace bytes (safe byte-wise in UTF-8),
    * each window of n tokens hashed as the space-joined byte sequence with
    * the same XXH64 seed, then the same per-slice affine permutations.
    * (array_distinct in the composed path cannot change a minimum, and
    * fewer than n tokens hash as one all-tokens shingle — both mirrored.)
    * The composed path allocates ~3 objects per shingle; this allocates
    * one reusable buffer per row. */
  def shingleMinHash(text: org.apache.spark.unsafe.types.UTF8String,
                     n: Int, k: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
    // tokenize: offsets into bytes
    var cap = 16
    var starts = new Array[Int](cap); var ends = new Array[Int](cap)
    var m = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        if (m == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(m) = i
        while (i < len && !isWs(bytes(i))) i += 1
        ends(m) = i
        m += 1
      }
    }
    val (as, bs) = coeffs(k)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val sn = if (m < n) m else n
    val nShingles = if (m < n) 1 else m - n + 1
    var buf = new Array[Byte](64)
    var w = 0
    while (w < nShingles) {
      var blen = 0
      var j = 0
      while (j < sn) {
        val tl = ends(w + j) - starts(w + j)
        if (blen + tl + 1 > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, blen + tl + 1))
        if (j > 0) { buf(blen) = ' '; blen += 1 }
        System.arraycopy(bytes, starts(w + j), buf, blen, tl)
        blen += tl
        j += 1
      }
      val h1full = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, blen, Seed)
      val x = h1full & Mask
      var c = 0
      while (c < k) {
        val v = affineModP(as(c), x, bs(c))
        if (v < mins(c)) mins(c) = v
        c += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }

  /** Fused tokenize → n-token shingle → DISTINCT xxhash64 array: the
    * contamination scan's per-doc shingle keys without ever materializing
    * the shingle strings. Tokenization and windowing are byte-identical to
    * [[shingleMinHash]] (whitespace-run split, fewer-than-n tokens collapse
    * to one all-tokens shingle, whitespace-only text hashes one empty
    * shingle — mirroring the composed `shingles()` column's split("") ⇒
    * [""] edge). Each window hashes the space-joined byte sequence with the
    * default XXH64 seed, then distinct via sort+unique (no boxing). The
    * composed explode(shingles)+xxhash64 path allocates ~3 objects per
    * shingle; this allocates two arrays per row. Output order is sorted,
    * which downstream set-membership joins don't observe. */
  def shingleHashes(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
    var cap = 16
    var starts = new Array[Int](cap); var ends = new Array[Int](cap)
    var m = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        if (m == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(m) = i
        while (i < len && !isWs(bytes(i))) i += 1
        ends(m) = i
        m += 1
      }
    }
    val sn = if (m < n) m else n
    val nShingles = if (m < n) 1 else m - n + 1
    val hs = new Array[Long](nShingles)
    var buf = new Array[Byte](64)
    var w = 0
    while (w < nShingles) {
      var blen = 0
      var j = 0
      while (j < sn) {
        val tl = ends(w + j) - starts(w + j)
        if (blen + tl + 1 > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, blen + tl + 1))
        if (j > 0) { buf(blen) = ' '; blen += 1 }
        System.arraycopy(bytes, starts(w + j), buf, blen, tl)
        blen += tl
        j += 1
      }
      hs(w) = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, blen, Seed)
      w += 1
    }
    java.util.Arrays.sort(hs)
    var uniq = 1
    var r = 1
    while (r < nShingles) {
      if (hs(r) != hs(r - 1)) { hs(uniq) = hs(r); uniq += 1 }
      r += 1
    }
    new GenericArrayData(
      if (uniq == nShingles) hs else java.util.Arrays.copyOf(hs, uniq))
  }

  /** Composite shingle KEYS for collision-audited hash-encoded gram
    * counting ([[graft.ops.TextOps.ngramNovelty]]): per document, the
    * DISTINCT word n-grams as (h1, h2, len) triples where h1/h2 are two
    * independently-seeded XXH64 hashes of the space-joined gram bytes and
    * len its byte length. Tokenization is byte-identical to
    * [[shingleHashes]] (same whitespace set, same <n-words ⇒ one
    * all-tokens shingle edge); distinct is over the FULL triple, so two
    * grams whose h1 collide within one document both survive to the
    * aggregate, where a (h1, len) group with min(h2) ≠ max(h2) flags the
    * collision and the caller falls back to exact strings. */
  def shingleKeys(text: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
    var cap = 16
    var starts = new Array[Int](cap); var ends = new Array[Int](cap)
    var m = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      if (i < len) {
        if (m == cap) {
          cap *= 2
          starts = java.util.Arrays.copyOf(starts, cap)
          ends = java.util.Arrays.copyOf(ends, cap)
        }
        starts(m) = i
        while (i < len && !isWs(bytes(i))) i += 1
        ends(m) = i
        m += 1
      }
    }
    val sn = if (m < n) m else n
    val nShingles = if (m < n) 1 else m - n + 1
    val h1 = new Array[Long](nShingles)
    val h2 = new Array[Long](nShingles)
    val ln = new Array[Int](nShingles)
    var buf = new Array[Byte](64)
    var w = 0
    while (w < nShingles) {
      var blen = 0
      var j = 0
      while (j < sn) {
        val tl = ends(w + j) - starts(w + j)
        if (blen + tl + 1 > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, blen + tl + 1))
        if (j > 0) { buf(blen) = ' '; blen += 1 }
        System.arraycopy(bytes, starts(w + j), buf, blen, tl)
        blen += tl
        j += 1
      }
      h1(w) = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, blen, Seed)
      h2(w) = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, blen, Seed2)
      ln(w) = blen
      w += 1
    }
    // distinct over the full (h1, h2, len) triple via index sort
    val ord = new Array[Integer](nShingles)
    i = 0
    while (i < nShingles) { ord(i) = i; i += 1 }
    java.util.Arrays.sort(ord, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        var c = java.lang.Long.compare(h1(a), h1(b))
        if (c == 0) c = java.lang.Long.compare(h2(a), h2(b))
        if (c == 0) c = java.lang.Integer.compare(ln(a), ln(b))
        c
      }
    })
    val out = new scala.collection.mutable.ArrayBuffer[Any](nShingles)
    i = 0
    while (i < nShingles) {
      val o = ord(i).intValue()
      if (i == 0 || {
        val p = ord(i - 1).intValue()
        h1(p) != h1(o) || h2(p) != h2(o) || ln(p) != ln(o)
      }) out += new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](h1(o), h2(o), ln(o)))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private val Seed2 = 0x9E3779B97F4A7C15L // independent second XXH64 seed

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    * algorithm): rolling Karp-Rabin hashes of the character k-grams, then
    * the minimum hash of every window of w consecutive k-gram hashes
    * (rightmost wins ties — the standard robust-winnowing rule), distinct,
    * in first-selection order. Guarantee: any substring match of length
    * ≥ w + k − 1 between two documents shares at least one fingerprint.
    * One O(n) pass: rolling hash + monotonic-deque window minima. */
  def winnow(text: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n < k) return new GenericArrayData(Array.empty[Any])
    val m = n - k + 1 // number of k-grams
    // rolling polynomial hash over chars, base 1000003, wrap in Long
    val B = 1000003L
    var bk = 1L // B^(k-1)
    var i = 1
    while (i < k) { bk *= B; i += 1 }
    val hs = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + s.charAt(i); i += 1 }
    hs(0) = h
    i = 1
    while (i < m) {
      h = (h - s.charAt(i - 1) * bk) * B + s.charAt(i + k - 1)
      hs(i) = h
      i += 1
    }
    if (m <= w) {
      // single window: emit its minimum (rightmost tie)
      var best = 0
      var j = 1
      while (j < m) { if (hs(j) <= hs(best)) best = j; j += 1 }
      return new GenericArrayData(Array[Any](hs(best)))
    }
    // monotonic deque of indices, increasing hash; ties evict (rightmost wins)
    val deque = new Array[Int](m)
    var head = 0; var tail = 0 // [head, tail)
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    val seen = new scala.collection.mutable.HashSet[Long]()
    i = 0
    while (i < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val v = hs(deque(head))
        if (seen.add(v)) out += v
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** SimHash-64: bit b of the result is the sign of Σ_tokens ±1 by bit b of
    * xxhash64(token). Null tokens vote -1 on every bit (when(null...) falls
    * to otherwise in the composed form). */
  def simHash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val votes = new Array[Int](64)
    var j = 0
    while (j < n) {
      if (arr.isNullAt(j)) {
        var b = 0
        while (b < 64) { votes(b) -= 1; b += 1 }
      } else {
        val h = XXH64.hashUTF8String(arr.getUTF8String(j), Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** One-pass MinHash signature of an array<string> of shingles. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes > 0, "numHashes must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    HashExprs.requireStringArray(child, prettyName)
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.minHashSig(input.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.HashOps.minHashSig($c, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** One-pass SimHash-64 of an array<string> of tokens. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    HashExprs.requireStringArray(child, prettyName)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.simHash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.HashOps.simHash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Fused shingle+MinHash signature of a (pre-normalized) string column. */
case class ShingleMinHash(child: Expression, shingleN: Int, numHashes: Int)
    extends UnaryExpression {
  require(shingleN > 0 && numHashes > 0, "shingleN and numHashes must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_minhash"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.shingleMinHash(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], shingleN, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.HashOps.shingleMinHash($c, $shingleN, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}

/** Fused shingle-hash set of a (pre-normalized) string column. */
case class ShingleHashes(child: Expression, shingleN: Int)
    extends UnaryExpression {
  require(shingleN > 0, "shingleN must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.shingleHashes(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], shingleN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.HashOps.shingleHashes($c, $shingleN)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Fused composite shingle keys (h1, h2, len) of a (pre-normalized)
  * string column — see [[HashOps.shingleKeys]]. */
case class ShingleKeys(child: Expression, shingleN: Int)
    extends UnaryExpression {
  require(shingleN > 0, "shingleN must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false),
    StructField("len", IntegerType, nullable = false))), containsNull = false)
  override def prettyName: String = "shingle_keys"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.shingleKeys(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], shingleN)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.HashOps.shingleKeys($c, $shingleN)")
  override protected def withNewChildInternal(newChild: Expression): ShingleKeys =
    copy(child = newChild)
}

/** One-pass winnowing fingerprints of a string column. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0, "k and w must be positive")
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"
  override protected def nullSafeEval(input: Any): Any =
    HashOps.winnow(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.HashOps.winnow($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object HashExprs {
  def minHashSig(shingles: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numHashes))
  def simHash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(text), k, w))
  def shingleMinHash(normalizedText: Column, shingleN: Int, numHashes: Int): Column =
    ColumnBridge.column(ShingleMinHash(ColumnBridge.expression(normalizedText),
      shingleN, numHashes))
  def shingleHashes(normalizedText: Column, shingleN: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(normalizedText), shingleN))
  def shingleKeys(normalizedText: Column, shingleN: Int): Column =
    ColumnBridge.column(ShingleKeys(ColumnBridge.expression(normalizedText), shingleN))

  private[expr] def requireStringArray(child: Expression, name: String): TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<string> input, got ${other.catalogString}")
    }
}
