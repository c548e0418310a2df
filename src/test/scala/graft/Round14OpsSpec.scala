package graft

import graft.ops._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 operators: BPE token counting (codec semantics, guards, the
  * tokenizer wiring into mixing/packing) and the semantic-dedup
  * composition verb. */
class Round14OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // the q229 hand vocab: well-formed (every operand is a byte or an
  // earlier output)
  private val merges = Seq(
    ("a", "t"), ("r", "o"), ("ro", "w"), ("d", "at"), ("dat", "a"),
    ("e", "r"), ("t", "er"), ("s", "t"), ("a", "n"), ("c", "an"),
    ("l", "l"), ("g", "g"))

  test("BpeCodec: hand merge sequences, min-rank order, left-greedy ties") {
    val codec = new graft.expr.BpeCodec(merges)
    def n(s: String): Long = codec.countTokens(s.getBytes("UTF-8"))
    // full merge chains
    assert(n("data") == 1)   // at -> dat -> data
    assert(n("row") == 1)    // ro -> row
    assert(n("filter") == 4) // er -> ter: f,i,l,ter
    assert(n("scan") == 2)   // an -> can: s,can
    assert(n("small") == 4)  // ll: s,m,a,ll
    assert(n("agg") == 2)    // gg: a,gg
    assert(n("fast") == 3)   // st: f,a,st
    assert(n("stream") == 5) // st: st,r,e,a,m
    assert(n("aaa") == 3)    // no (a,a) rule
    // min-rank order matters: in "dato", (a,t) rank 1 beats (t,o)-absent;
    // "rot": (r,o) rank 2 vs (a,t)? absent -> ro,t
    assert(n("rot") == 2)
    // multi-word sums; runs of whitespace collapse; empty is 0
    assert(n("data row data") == 3)
    assert(n("  data\t\nrow  ") == 2)
    assert(n("") == 0)
    assert(n("   ") == 0)
    // byte fallback: a 2-byte UTF-8 char counts as 2 base tokens
    assert(n("é") == 2)
    // left-greedy on overlapping same-rank pairs
    val aa = new graft.expr.BpeCodec(Seq(("a", "a")))
    assert(aa.countTokens("aaa".getBytes) == 2)  // aa, a
    assert(aa.countTokens("aaaa".getBytes) == 2) // aa, aa
    assert(aa.countTokens("aaaaa".getBytes) == 3) // aa, aa, a
  }

  test("BpeCodec: well-formedness and duplicate-output guards") {
    val e1 = intercept[IllegalArgumentException] {
      new graft.expr.BpeCodec(Seq(("ab", "c"))) // 'ab' never defined
    }
    assert(e1.getMessage.contains("well-formed"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      // second merge re-creates the same output token 'ab'
      new graft.expr.BpeCodec(Seq(("a", "b"), ("a", "b")))
    }
    assert(e2.getMessage.contains("duplicates"), e2.getMessage)
    // operand order matters: ("b","a") after ("a","b") is fine (output 'ba')
    new graft.expr.BpeCodec(Seq(("a", "b"), ("b", "a")))
    ()
  }

  test("bpeTokenCount expression: column counts, nulls, codegen path") {
    val df = Seq(("data row", 0), ("filter scan", 1), (null: String, 2),
      ("", 3)).toDF("text", "i")
    val out = df.select(col("i"),
        TextOps.bpeTokenCount(col("text"), merges).as("n"))
      .orderBy(col("i")).collect()
    assert(out(0).getLong(1) == 2)
    assert(out(1).getLong(1) == 6) // f,i,l,ter + s,can
    assert(out(2).isNullAt(1))
    assert(out(3).getLong(1) == 0)
    // merge-list size guard names the cap
    val e = intercept[IllegalArgumentException] {
      TextOps.bpeTokenCount(col("text"), merges, maxMerges = 3)
    }
    assert(e.getMessage.contains("maxMerges"), e.getMessage)
  }

  test("tokenizer wiring: packing and budget mix agree across token units") {
    val docs = Seq((1L, "data row data row"), (2L, "filter filter"),
      (3L, "scan")).toDF("id", "text")
    // whitespace: 4 + 2 + 1 = 7 tokens; bpe: 4x1 + 2x4 + 2 = wait
    // per doc: "data row data row" -> 4 bpe; "filter filter" -> 8; "scan" -> 2
    Packing.contextChunks(docs, Seq(col("id")), col("text"), ctx = 4,
      tokenizer = TextOps.BpeTokens(merges)) { packed =>
      val m = packed.select(col("id"), col("token_start"), col("n_windows"))
        .orderBy(col("id")).collect()
      assert(m(0).getLong(1) == 0L)  // doc1 starts at 0, spans [0,4) = 1 win
      assert(m(0).getLong(2) == 1L)
      assert(m(1).getLong(1) == 4L)  // doc2 spans [4,12) -> windows 1..2
      assert(m(1).getLong(2) == 2L)
      assert(m(2).getLong(1) == 12L) // doc3 spans [12,14) -> window 3
      assert(m(2).getLong(2) == 1L)
    }
    // budget mix with BPE counts: budget 5 in md5(id) order; the crossing
    // doc is kept
    val strat = docs.withColumn("lang", lit("en"))
    Mixing.tokenBudgetSample(strat, col("lang"), col("text"),
      md5(col("id").cast("string")), Map("en" -> 5L),
      tokenizer = TextOps.BpeTokens(merges)) { sampled =>
      val tot = sampled
        .agg(sum(TextOps.bpeTokenCount(col("text"), merges))).head().getLong(0)
      // >= budget (crossing doc kept), and strictly fewer docs than input
      // unless the first two already cross
      assert(tot >= 5L, s"kept $tot bpe tokens")
      ()
    }
  }

  test("semanticDedup: planted duplicate groups get min-id representatives") {
    // 3 well-separated blobs in 4d; ids 0..29; exact duplicates planted
    // at +100 for ids 0, 10, 20; a near-dup (not exact) of id 1 at 130
    def blob(center: Double, ids: Range): Seq[(Long, Array[Double])] =
      ids.map { i => // distinct DIRECTIONS within a blob (cosine ~0.95)
        (i.toLong, Array(center, center + (i % 10), -center, 1.0))
      }
    val base = blob(10.0, 0 until 10) ++ blob(-10.0, 10 until 20) ++
      blob(30.0, 20 until 30)
    val dups = Seq(0, 10, 20).map { i =>
      (i + 100L, base(i)._2)
    }
    val df = (base ++ dups).toDF("id", "v")
    val out = Dedup.semanticDedup(df, col("id"), col("v"), k = 3,
      threshold = 0.999999, iters = 3, maxBucket = 50)
    val reps = out.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Long]("rep_id")).toMap
    assert(reps(100L) == 0L && reps(110L) == 10L && reps(120L) == 20L)
    assert(reps(0L) == 0L && reps(10L) == 10L && reps(20L) == 20L)
    // non-duplicated ids are their own representatives
    assert(reps(5L) == 5L && reps(25L) == 25L)
    val nRep = out.filter(col("is_representative")).count()
    assert(nRep == 30, s"expected 30 representatives, got $nRep")
    // maxBucket guard names the knob
    val e = intercept[IllegalArgumentException] {
      Dedup.semanticDedup(df, col("id"), col("v"), k = 3,
        threshold = 0.99, maxBucket = 5)
    }
    assert(e.getMessage.contains("raise k"), e.getMessage)
  }

  test("nearestCentroid kernel: equals the composed array_min form, ties low") {
    val cs = Array(Array(0.0, 0.0), Array(3.0, 4.0), Array(3.0, 4.0),
      Array(-1.0, 1.0))
    val df = Seq((0L, Array(0.0, 0.0)), (1L, Array(3.0, 3.9)),
      (2L, Array(1.0, 2.0)), (3L, Array(-0.9, 0.9)),
      (4L, null: Array[Double])).toDF("id", "v")
    val kernel = df.select(col("id"),
        graft.expr.VectorExprs.nearestCentroid(col("v"), cs).as("b"))
      .select(col("id"), col("b.d").as("d"), col("b.cluster").as("c"))
      .orderBy(col("id")).collect()
    val composed = df.select(col("id"),
        array_min(array(cs.zipWithIndex.map { case (cv, i) =>
          struct(graft.expr.VectorExprs.l2SqToLit(col("v"), cv).as("d"),
            lit(i).as("cluster"))
        }.toIndexedSeq: _*)).as("b"))
      .select(col("id"), col("b.d").as("d"), col("b.cluster").as("c"))
      .orderBy(col("id")).collect()
    kernel.zip(composed).foreach { case (k, m) =>
      assert(k.isNullAt(1) == m.isNullAt(1), s"null mismatch at ${k.get(0)}")
      if (!k.isNullAt(1)) {
        assert(k.getDouble(1) == m.getDouble(1), s"d at ${k.get(0)}")
        assert(k.getInt(2) == m.getInt(2), s"cluster at ${k.get(0)}")
      }
    }
    // the duplicate centroid (index 2 == index 1): tie keeps index 1
    assert(kernel(1).getInt(2) == 1)
    // length mismatch -> null (both forms)
    val bad = Seq((0L, Array(1.0, 2.0, 3.0))).toDF("id", "v")
    assert(bad.select(graft.expr.VectorExprs.nearestCentroid(col("v"), cs))
      .head().isNullAt(0))
  }

  test("semanticDedup: near-dups within a cluster merge at their threshold") {
    // id 0 and id 1: cosine just under 1 (tiny angle); threshold 0.99
    // merges them, 0.9999999 does not
    val rows = Seq(
      (0L, Array(1.0, 0.0, 0.0, 0.0)),
      (1L, Array(1.0, 0.001, 0.0, 0.0)),
      (2L, Array(-1.0, 5.0, 0.0, 0.0)),
      (3L, Array(-1.0, 5.0, 0.2, 0.0)),
      (4L, Array(0.0, 0.0, 7.0, 1.0)),
      (5L, Array(0.0, 0.0, 7.0, 1.1))).toDF("id", "v")
    val loose = Dedup.semanticDedup(rows, col("id"), col("v"), k = 3,
      threshold = 0.99, iters = 2).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("rep_id")).toMap
    assert(loose(1L) == 0L, loose.toString)
    val tight = Dedup.semanticDedup(rows, col("id"), col("v"), k = 3,
      threshold = 0.9999999, iters = 2).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("rep_id")).toMap
    assert(tight(1L) == 1L, tight.toString)
  }
}
