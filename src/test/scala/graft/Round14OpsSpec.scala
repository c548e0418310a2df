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

  private def approx(a: Double, b: Double, tol: Double = 1e-9): Boolean =
    math.abs(a - b) <= tol * math.max(1.0, math.max(math.abs(a), math.abs(b)))

  test("friedmanTest: hand ranks, tie correction, panel guards") {
    // 3 blocks x 3 treatments, untied: chisq = 12/(nk(k+1))SumR^2 - 3n(k+1)
    //   b1 ranks (1,2,3), b2 (2,3,1), b3 (1,3,2) -> R = (4,8,6) -> 8/3
    val rows = Seq(
      ("b1", "t1", 1.0), ("b1", "t2", 2.0), ("b1", "t3", 3.0),
      ("b2", "t1", 5.0), ("b2", "t2", 6.0), ("b2", "t3", 4.0),
      ("b3", "t1", 1.0), ("b3", "t2", 9.0), ("b3", "t3", 5.0))
      .toDF("b", "t", "y")
    val r = RankTests.friedmanTest(rows, $"b", $"t", $"y").head()
    assert(r.getAs[Long]("n_blocks") == 3 && r.getAs[Long]("k") == 3)
    assert(approx(r.getAs[Double]("chisq"), 8.0 / 3.0), r.toString)
    assert(r.getAs[Long]("df") == 2)
    // tie in b1 (t1 = t2): ranks (1.5, 1.5, 3); hand chisq = 9/5.5
    val tied = Seq(
      ("b1", "t1", 1.0), ("b1", "t2", 1.0), ("b1", "t3", 3.0),
      ("b2", "t1", 5.0), ("b2", "t2", 6.0), ("b2", "t3", 4.0),
      ("b3", "t1", 1.0), ("b3", "t2", 9.0), ("b3", "t3", 5.0))
      .toDF("b", "t", "y")
    val rt = RankTests.friedmanTest(tied, $"b", $"t", $"y").head()
    assert(approx(rt.getAs[Double]("chisq"), 9.0 / 5.5), rt.toString)
    // incomplete panel is a named error
    val e = intercept[IllegalArgumentException] {
      RankTests.friedmanTest(rows.filter($"b" =!= "b1" || $"t" =!= "t2"),
        $"b", $"t", $"y").head()
    }
    assert(e.getMessage.contains("panel"), e.getMessage)
    // all-tied ranks are degenerate
    intercept[IllegalArgumentException] {
      RankTests.friedmanTest(
        Seq(("b1", "t1", 1.0), ("b1", "t2", 1.0),
          ("b2", "t1", 2.0), ("b2", "t2", 2.0)).toDF("b", "t", "y"),
        $"b", $"t", $"y").head()
    }
  }

  test("welchAnova: k=2 equals the Welch t-test squared; guards") {
    // arms (0,2,4) and (10,14): t_welch^2 = 18.75, df2 = 32/19
    val df2arm = Seq(("a", 0.0), ("a", 2.0), ("a", 4.0),
      ("b", 10.0), ("b", 14.0)).toDF("g", "y")
    val r = SimpleTests.welchAnova(df2arm, $"y", $"g").head()
    assert(approx(r.getAs[Double]("f_stat"), 18.75), r.toString)
    assert(approx(r.getAs[Double]("df1"), 1.0))
    assert(approx(r.getAs[Double]("df2"), 32.0 / 19.0), r.toString)
    // constant arm -> named error pointing at anovaF
    val e = intercept[IllegalArgumentException] {
      SimpleTests.welchAnova(
        df2arm.union(Seq(("c", 5.0), ("c", 5.0)).toDF("g", "y")),
        $"y", $"g").head()
    }
    assert(e.getMessage.contains("zero variance"), e.getMessage)
    intercept[IllegalArgumentException] {
      SimpleTests.welchAnova(df2arm.filter($"g" === "a"), $"y", $"g").head()
    }
  }

  test("jarqueBera: moments match stddev_samp/skewness/kurtosis built-ins") {
    val xs = spark.range(10000).select(
      (pmod(xxhash64($"id"), lit(100000L)).cast("double") / 100000.0).as("x"))
    val r = SimpleTests.jarqueBera(xs, $"x").head()
    val ref = xs.agg(stddev_samp($"x"), skewness($"x"), kurtosis($"x")).head()
    assert(approx(r.getAs[Double]("sd"), ref.getDouble(0), 1e-6))
    assert(approx(r.getAs[Double]("skewness"), ref.getDouble(1), 1e-4))
    assert(approx(r.getAs[Double]("ex_kurtosis"), ref.getDouble(2), 1e-4))
    // uniform: near-zero skew, excess kurtosis near -1.2, JB enormous
    assert(math.abs(r.getAs[Double]("skewness")) < 0.1)
    assert(math.abs(r.getAs[Double]("ex_kurtosis") + 1.2) < 0.1)
    assert(r.getAs[Double]("jb") > 100 && r.getAs[Double]("p_value") < 1e-10)
    intercept[IllegalArgumentException] {
      SimpleTests.jarqueBera(Seq(1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
        .toDF("x"), $"x").head()
    }
  }

  test("vocabDrift: identical -> 0, disjoint -> ln 2, hand shared case") {
    val a = Seq("x y x", "z").toDF("text")
    val b = Seq("x y", "x z").toDF("text")
    val same = TextOps.vocabDrift(a, a, $"text", $"text").head()
    assert(approx(same.getAs[Double]("js_divergence"), 0.0))
    assert(approx(same.getAs[Double]("l1_distance"), 0.0))
    val disj = TextOps.vocabDrift(Seq("p q").toDF("text"),
      Seq("r s").toDF("text"), $"text", $"text").head()
    assert(approx(disj.getAs[Double]("js_divergence"), math.log(2.0)), disj.toString)
    assert(approx(disj.getAs[Double]("l1_distance"), 2.0))
    // hand: a has p=(x .5, y .25, z .25); b has q=(x .5, y .25, z .25) -> 0
    val h = TextOps.vocabDrift(a, b, $"text", $"text").head()
    assert(approx(h.getAs[Double]("js_divergence"), 0.0))
    assert(h.getAs[Long]("vocab_union") == 3)
  }

  test("embeddingDrift: hand centroids; ref-only labels dropped") {
    val cur = Seq(("a", Array(1.0, 0.0)), ("a", Array(3.0, 0.0)),
      ("b", Array(0.0, 1.0))).toDF("l", "v")
    val ref = Seq(("a", Array(2.0, 0.0)), ("b", Array(1.0, 0.0)),
      ("c", Array(9.0, 9.0))).toDF("l", "v")
    val out = Drift.embeddingDrift(cur, ref, $"l", $"v", $"l", $"v").collect()
    assert(out.length == 2) // label c has no current rows
    val byL = out.map(r => r.getString(0) -> r).toMap
    assert(byL("a").getAs[Long]("n_current") == 2)
    assert(approx(byL("a").getAs[Double]("centroid_l2"), 0.0))
    assert(approx(byL("a").getAs[Double]("centroid_cosine"), 1.0))
    assert(approx(byL("b").getAs[Double]("centroid_l2"), math.sqrt(2.0)))
    assert(approx(byL("b").getAs[Double]("centroid_cosine"), 0.0))
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
