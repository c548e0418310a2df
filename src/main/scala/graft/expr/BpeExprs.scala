package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-fallback BPE token counting as a codegen expression.
  *
  * A 100 TB corpus mixture is budgeted in TOKENIZER tokens, not
  * whitespace tokens — whitespace counts drift 30-40% on code/CJK text,
  * so a whitespace-budgeted mix silently over/under-allocates exactly
  * the shards that need care. This kernel counts true byte-level BPE
  * tokens (the GPT-2/LLaMA family construction: every byte is a base
  * token, so ANY input has a well-defined count — no <unk>) against a
  * caller-supplied merge list.
  *
  * Algorithm (documented contract, replayed verbatim by the SQL oracle):
  * the text splits into words on ASCII whitespace; within a word, start
  * from the UTF-8 bytes and repeatedly merge the adjacent pair with the
  * LOWEST merge rank, taking occurrences left to right, until no adjacent
  * pair is in the merge list; a word's count is its final symbol count
  * (whitespace itself is never part of a token). For a WELL-FORMED merge
  * list — each merge's operands are single bytes or outputs of EARLIER
  * merges, which is how BPE training emits lists — this is equivalent to
  * sweeping the rules once in rank order to fixpoint (rule r can never
  * create a pair of rank < r, because that pair's operands would have to
  * contain a symbol that does not exist until rule r runs). The codec
  * VALIDATES well-formedness at construction, so the equivalence is a
  * checked invariant rather than an assumption.
  *
  * Scale shape: the merge list is a plan-shipped reference object (the
  * broadcast-vocab idiom — ~100k merges is a few MB, guarded), the count
  * is a single generated call per row inside whole-stage codegen, and the
  * per-word working buffer is bounded by the longest whitespace-delimited
  * word. The cap (256 bytes — far beyond any natural word; real
  * tokenizers pre-split at a similar bound) degrades a pathological
  * unbroken blob to its byte count, which also bounds [[countWord]]'s
  * O(len² · log merges) rescan: at 256 bytes the worst word costs ~10⁶
  * comparisons, not the ~10⁹ an 8 KiB blob would.
  */
final class BpeCodec(mergeList: Seq[(String, String)],
                     maxWordBytes: Int = 256) extends Serializable {
  // merge operands are byte strings under the ISO-8859-1 char<->byte
  // correspondence (plain ASCII merges are just ASCII; a vocab over
  // non-ASCII bytes names each byte by its 8859-1 character)
  require(mergeList.nonEmpty, "bpe: merge list is empty")
  // symbol ids: 0..255 = single bytes, 256 + r = output of merge rank r
  private val nMerges = mergeList.length
  private val pairKey = new Array[Long](nMerges)
  locally {
    val ids = new java.util.HashMap[String, Integer](nMerges * 2)
    var b = 0
    while (b < 256) {
      ids.put(new String(Array(b.toByte), "ISO-8859-1"), b); b += 1
    }
    var r = 0
    mergeList.foreach { case (l, rt) =>
      val li = ids.get(l); val ri = ids.get(rt)
      require(li != null && ri != null,
        s"bpe: merge #${r + 1} ('$l', '$rt') is not well-formed — each " +
          "operand must be a single byte or the output of an EARLIER " +
          "merge (BPE training emits lists in this order)")
      pairKey(r) = (li.toLong << 32) | (ri.toLong & 0xffffffffL)
      val out = l + rt
      require(ids.get(out) == null,
        s"bpe: merge #${r + 1} output '$out' duplicates an earlier token")
      ids.put(out, 256 + r)
      r += 1
    }
  }
  // (left symbol, right symbol) -> rank via binary search over the sorted
  // key array: allocation-free in the per-row loop (a HashMap<Long, _>
  // would box one Long per adjacent pair per merge round)
  @transient private lazy val (sortedKeys, keyRank): (Array[Long], Array[Int]) = {
    val order = (0 until nMerges).sortBy(pairKey)
    (order.map(pairKey).toArray, order.toArray)
  }
  private def rankOf(key: Long): Int = {
    val i = java.util.Arrays.binarySearch(sortedKeys, key)
    if (i >= 0) keyRank(i) else Int.MaxValue
  }

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f'

  /** Final symbol count of ONE word given as ids[0, n). Mutates ids. */
  private def countWord(ids: Array[Int], n0: Int): Int = {
    var n = n0
    while (n > 1) {
      var best = Int.MaxValue
      var i = 0
      while (i < n - 1) {
        val rk = rankOf((ids(i).toLong << 32) | (ids(i + 1).toLong & 0xffffffffL))
        if (rk < best) best = rk
        i += 1
      }
      if (best == Int.MaxValue) return n
      val key = pairKey(best)
      val l = (key >>> 32).toInt
      val r = (key & 0xffffffffL).toInt
      val out = 256 + best
      var w = 0
      i = 0
      while (i < n) {
        if (i < n - 1 && ids(i) == l && ids(i + 1) == r) {
          ids(w) = out; i += 2
        } else { ids(w) = ids(i); i += 1 }
        w += 1
      }
      n = w
    }
    n
  }

  /** BPE token count of a whole text (sum over whitespace-split words). */
  def countTokens(bytes: Array[Byte]): Long = {
    var total = 0L
    var i = 0
    val len = bytes.length
    var buf: Array[Int] = null
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val start = i
      while (i < len && !isWs(bytes(i))) i += 1
      val wl = i - start
      if (wl > 0) {
        if (wl > maxWordBytes) total += wl // cap: degrade to byte count
        else {
          if (buf == null || buf.length < wl) buf = new Array[Int](math.max(wl, 64))
          var j = 0
          while (j < wl) { buf(j) = bytes(start + j) & 0xff; j += 1 }
          total += countWord(buf, wl)
        }
      }
    }
    total
  }
}

/** BPE token count of a string column against a broadcast merge list. */
case class BpeTokenCount(child: Expression, codec: BpeCodec)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string input, got ${other.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"
  override protected def nullSafeEval(input: Any): Any =
    codec.countTokens(input.asInstanceOf[UTF8String].getBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCodec", codec, "graft.expr.BpeCodec")
    defineCodeGen(ctx, ev, c => s"$ref.countTokens($c.getBytes())")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeExprs {
  def tokenCount(text: Column, codec: BpeCodec): Column =
    ColumnBridge.column(BpeTokenCount(ColumnBridge.expression(text), codec))
}
