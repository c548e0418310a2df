package graft

import graft.ops._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------------------------------------------------------------- text

  test("tokenCount: BPE-ish pre-tokenization counts") {
    val d = Seq(
      ("hello world", 2), ("don't stop", 4), ("a1b2", 4), ("  ", 0),
      ("x=1+2", 5)).toDF("text", "expect")
    val r = d.select(TextOps.tokenCount($"text").as("n"), $"expect").collect()
    r.foreach(row => assert(row.getInt(0) == row.getInt(1), row.toString))
  }

  test("langId identifies scripted and latin languages") {
    val d = Seq(
      "the cat sat on the mat and looked at the dog for a while",
      "der Hund ist nicht mit der Katze und das ist ein Problem",
      "le chat est dans la maison et les oiseaux sont pour toi",
      "el perro es para la casa y los gatos son una familia",
      "这是一个中文句子用来测试语言识别功能",
      "это русское предложение для проверки",
      "zzz qqq xxx").toDF("text")
    val r = d.select(TextOps.langId($"text").as("l")).collect().map(_.getString(0))
    assert(r.toSeq == Seq("en", "de", "fr", "es", "zh", "ru", "und"), r.toSeq)
  }

  test("qualityScore rewards clean prose, punishes noise") {
    val good = ("the quick brown fox jumps over the lazy dog and keeps " +
      "running through the green field for a long time with great joy ") * 3
    val noisy = "!!! ??? *** ### $$$ %%% ^^^ &&& ((( ))) @@@ !!!"
    val d = Seq(good, noisy).toDF("text")
    val r = d.select(TextOps.qualityScore($"text").as("q")).collect().map(_.getDouble(0))
    assert(r(0) > 0.9, s"good text scored ${r(0)}")
    assert(r(1) < 0.2, s"noisy text scored ${r(1)}")
  }

  test("shingles and ngramJaccard") {
    val d = Seq(("a b c d", "a b c d"), ("a b c d", "b c d e"), ("a b", "c d"))
      .toDF("x", "y")
    val r = d.select(TextOps.ngramJaccard($"x", $"y", 2).as("j")).collect().map(_.getDouble(0))
    assert(r(0) == 1.0)
    assert(r(1) == 0.5) // {ab,bc,cd} vs {bc,cd,de}: 2 shared / 4 union
    assert(r(2) == 0.0)
  }

  test("simHash: near-identical texts within small hamming distance, different texts far") {
    val a = "the quick brown fox jumps over the lazy dog near the river bank today"
    val b = a.replace("today", "tonight") // one token changed
    val c = "completely unrelated content about database query optimization and shuffles"
    val d = Seq((1L, a), (2L, b), (3L, c)).toDF("id", "text")
      .withColumn("sh", TextOps.simHash($"text"))
    val m = d.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(ham(m(1L), m(2L)) <= 12, s"near-dup hamming ${ham(m(1L), m(2L))}")
    assert(ham(m(1L), m(3L)) > 12, s"unrelated hamming ${ham(m(1L), m(3L))}")
  }

  test("fused MinHashSig/SimHash64 match the column-composed definitions bit for bit") {
    val texts = Seq("the quick brown fox jumps over the lazy dog",
      "alpha beta gamma delta", "single", "a b a b a b", "", "  padded   text  ")
    val d = texts.toDF("text")
      .withColumn("sh", TextOps.shingles($"text", 2))
      .withColumn("toks", split(lower(trim($"text")), "\\s+"))
    // composed reference versions (the pre-fusion implementations)
    val p = 2147483647L
    val x = transform($"sh", s => xxhash64(s).bitwiseAND(0x3FFFFFFFL))
    val composedSig = array((0 until 32).map { i =>
      array_min(transform(x, v =>
        pmod(lit(graft.expr.HashOps.sliceA(i)) * v +
          lit(graft.expr.HashOps.sliceB(i)), lit(p))))
    }: _*)
    val hashes = transform($"toks", t => xxhash64(t))
    val composedSim = (0 until 64).map { b =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
      when(vote > 0, lit(1L << b)).otherwise(0L)
    }.reduce[org.apache.spark.sql.Column]((a, b) => a.bitwiseOR(b))
    val r = d.select(
      Dedup.minHashesFromShingles($"sh", 32).as("fusedSig"), composedSig.as("refSig"),
      TextOps.simHash($"text").as("fusedSim"), composedSim.as("refSim")).collect()
    r.foreach { row =>
      assert(row.getSeq[Long](0) == row.getSeq[Long](1), s"minhash mismatch: $row")
      assert(row.getLong(2) == row.getLong(3), s"simhash mismatch: $row")
    }
    // the fully-fused tokenize+shingle+minhash kernel matches the
    // shingle-array path bit for bit (incl. tabs, <n tokens, empty text)
    val moreTexts = texts ++ Seq("tab\tseparated\ttokens  and\nnewlines", "x",
      "\tleading tab and trailing newline\n", "\n\t ", " \t mixed \n edges \t ")
    val r2 = moreTexts.toDF("text").select(
      graft.expr.HashExprs.shingleMinHash(lower(trim($"text")), 2, 32).as("fused"),
      Dedup.minHashesFromShingles(TextOps.shingles($"text", 2), 32).as("viaShingles"))
      .collect()
    r2.foreach { row =>
      assert(row.getSeq[Long](0) == row.getSeq[Long](1),
        s"fused shingle-minhash mismatch: $row")
    }
  }

  // ---------------------------------------------------------------- dedup

  private lazy val docs: Seq[(Long, String)] = {
    val rng = new scala.util.Random(17)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
      "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi")
    val originals = (0L until 60L).map { i =>
      i -> (0 until 40).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
    // 10 near-duplicates: copy with one word changed; 5 exact duplicates
    val nearDups = (0L until 10L).map { i =>
      val (oid, t) = originals(i.toInt)
      (100L + i) -> (t.split(" ").init.mkString(" ") + " sigma")
    }
    val exactDups = (0L until 5L).map { i => (200L + i) -> originals(i.toInt)._2 }
    originals ++ nearDups ++ exactDups
  }
  private lazy val docsDf = docs.toDF("id", "text").repartition(4)

  test("tokenBudgetSample: exclusive-prefix budget per stratum, crossing doc kept") {
    import graft.ops.Mixing
    // stratum A: ids 1..5 @ 10 tokens; stratum B: ids 6..8 @ 7 tokens;
    // stratum C has no budget entry -> dropped entirely
    val docs = ((1 to 5).map(i => (i.toLong, "A", 10L)) ++
      (6 to 8).map(i => (i.toLong, "B", 7L)) ++
      Seq((9L, "C", 100L))).toDF("id", "s", "tok").repartition(7)
    def run(budgets: Map[String, Long]): Map[String, Seq[Long]] =
      Mixing.tokenBudgetSample(docs, $"s", $"tok", $"id", budgets) { sampled =>
        sampled.collect().map(r => r.getString(1) -> r.getLong(0))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq.sorted }
      }
    // A budget 25: exclusive prefixes 0,10,20,30,40 -> ids 1,2,3 (3 crosses)
    // B budget 14: prefixes 0,7,14 -> ids 6,7
    val r = run(Map("A" -> 25L, "B" -> 14L))
    assert(r == Map("A" -> Seq(1L, 2L, 3L), "B" -> Seq(6L, 7L)))
    // a budget smaller than the first doc still yields that doc
    assert(run(Map("A" -> 1L)) == Map("A" -> Seq(1L)))
    // budgets >= stratum total keep everything budgeted, still drop C
    assert(run(Map("A" -> 1000L, "B" -> 1000L)) ==
      Map("A" -> Seq(1L, 2L, 3L, 4L, 5L), "B" -> Seq(6L, 7L, 8L)))
    // forcing many range partitions must not change the sample
    val many = Mixing.tokenBudgetSample(docs, $"s", $"tok", $"id",
      Map("A" -> 25L, "B" -> 14L), partitions = 13) { s2 =>
      s2.collect().map(_.getLong(0)).toSeq.sorted
    }
    assert(many == Seq(1L, 2L, 3L, 6L, 7L))
  }

  test("capPerGroup keeps the n smallest order keys per group on any layout") {
    import graft.ops.Mixing
    // group A: 10 docs, group B: 2 docs, null group dropped
    val docs = ((1 to 10).map(i => (i.toLong, "A")) ++
      Seq((11L, "B"), (12L, "B"), (13L, null.asInstanceOf[String])))
      .toDF("id", "g").repartition(5)
    def run(n: Long, parts: Int = 0): Map[String, Seq[Long]] =
      Mixing.capPerGroup(docs, $"g", $"id", n, partitions = parts) { capped =>
        capped.collect().map(r => r.getString(1) -> r.getLong(0))
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq.sorted }
      }
    // cap 3: A keeps its 3 smallest ids, B keeps both (under the cap)
    assert(run(3) == Map("A" -> Seq(1L, 2L, 3L), "B" -> Seq(11L, 12L)))
    // cap >= every group keeps everything non-null
    assert(run(100) == Map("A" -> (1L to 10L), "B" -> Seq(11L, 12L)))
    // many range partitions must not change the kept set
    assert(run(3, parts = 13) == Map("A" -> Seq(1L, 2L, 3L), "B" -> Seq(11L, 12L)))
    intercept[IllegalArgumentException] { run(0) }
  }

  test("paragraphDedup drops cross-doc boilerplate, keeps order, keeps empty docs") {
    val corpus = Seq(
      (1L, "BANNER\nalpha body\nFooter A"),
      (2L, "banner\nbeta body\nFooter A"),   // banner case-folds onto doc 1's
      (3L, "BANNER \ngamma body\nFooter B"), // trailing space normalizes away
      (4L, "BANNER")                          // boilerplate-only doc
    ).toDF("doc_id", "text")
    val r = Dedup.paragraphDedup(corpus, $"doc_id", $"text", maxDocFreq = 2)
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getLong(2), x.getLong(3))).toMap
    // BANNER is in 4 docs (> 2) → dropped; Footer A in 2 docs (<= 2) → kept
    assert(r(1L) == (("alpha body\nFooter A", 3L, 2L)))
    assert(r(2L) == (("beta body\nFooter A", 3L, 2L)))
    assert(r(3L) == (("gamma body\nFooter B", 3L, 2L)))
    assert(r(4L) == (("", 1L, 0L))) // survives with empty text
    // guard trips when the hot set exceeds the broadcast cap
    val e = intercept[IllegalArgumentException] {
      Dedup.paragraphDedup(corpus, $"doc_id", $"text", maxDocFreq = 1,
        maxHotFingerprints = 0L)
    }
    assert(e.getMessage.contains("positive"))
    val e2 = intercept[IllegalArgumentException] {
      Dedup.paragraphDedup(corpus, $"doc_id", $"text", maxDocFreq = 1,
        maxHotFingerprints = 1L).collect()
    }
    assert(e2.getMessage.contains("broadcastHot=false"), e2.getMessage)
    // shuffled anti-join escape hatch returns the same frame
    val s = Dedup.paragraphDedup(corpus, $"doc_id", $"text", maxDocFreq = 2,
      broadcastHot = false)
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getLong(2), x.getLong(3))).toMap
    assert(s == r)
    // layout invariance: any input partitioning yields the identical frame
    val p7 = Dedup.paragraphDedup(corpus.repartition(7), $"doc_id", $"text",
      maxDocFreq = 2)
      .collect().map(x => x.getLong(0) ->
        (x.getString(1), x.getLong(2), x.getLong(3))).toMap
    assert(p7 == r)
  }

  test("contamination: planted overlap fractions, hash path matches string path") {
    // probe doc 100 is fully in the corpus; doc 2 shares a half; doc 3 none
    val corpus = Seq(
      (1L, "a b c d e f"),            // contains probe's "a b c" 4-grams? n=3
      (2L, "a b c x y z"),            // shares the "a b c" 3-gram only
      (3L, "p q r s t u"),            // no overlap
      (100L, "a b c d e f")           // the probe doc itself
    ).toDF("doc_id", "text")
    val probe = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val r = Dedup.contamination(corpus, probe, $"text", $"doc_id", n = 3,
      hashes = false).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    // 4 distinct 3-grams per 6-word doc
    assert(r(1L) == ((4L, 4L, 1.0)))
    assert(r(100L) == ((4L, 4L, 1.0)))
    assert(r(2L) == ((4L, 1L, 0.25)))
    assert(r(3L) == ((4L, 0L, 0.0)))
    // the 64-bit-hash scale path returns the identical frame
    val h = Dedup.contamination(corpus, probe, $"text", $"doc_id", n = 3,
      hashes = true).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(h == r)
    // shuffled-join variant agrees too (broadcast off)
    val s = Dedup.contamination(corpus, probe, $"text", $"doc_id", n = 3,
      hashes = true, broadcastProbe = false).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3))).toMap
    assert(s == r)
  }

  test("contamination: fused hash kernel matches string path on tokenizer edges") {
    // every composed-path edge the byte kernel must mirror: multi-whitespace
    // runs, tab/newline separators, leading/trailing whitespace, fewer
    // tokens than n (one all-tokens shingle), repeated shingles (per-doc
    // distinct), case normalization, and whitespace-only text (one empty
    // shingle — split("") ⇒ [""])
    val corpus = Seq(
      (1L, "a  b\tc\nd e"),          // mixed separators, same tokens as probe
      (2L, "  a b c d e  "),         // edge whitespace
      (3L, "A B C D E"),             // case-folds onto the probe
      (4L, "x y"),                   // < n tokens: one shingle "x y"
      (5L, "a b c a b c a b c"),     // repeated shingles collapse per-doc
      (6L, " \t\n ")                 // whitespace-only: one empty shingle
    ).toDF("doc_id", "text")
    val probe = Seq((100L, "a b c d e"), (101L, "x y")).toDF("doc_id", "text")
    def run(h: Boolean) =
      Dedup.contamination(corpus, probe, $"text", $"doc_id", n = 3, hashes = h)
        .collect()
        .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getDouble(3)))
        .toMap
    val s = run(false)
    assert(s(1L) == ((3L, 3L, 1.0)))
    assert(s(2L) == ((3L, 3L, 1.0)))
    assert(s(3L) == ((3L, 3L, 1.0)))
    assert(s(4L) == ((1L, 1L, 1.0)))
    assert(s(5L)._1 == 3L) // the 7 windows collapse to 3 distinct rotations
    assert(s(6L) == ((1L, 0L, 0.0)))
    assert(run(true) == s)
  }

  test("contamination: probe broadcast guard trips above maxProbeShingles") {
    val corpus = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val probe = Seq((100L, "a b c d e f")).toDF("doc_id", "text") // 4 shingles
    val e = intercept[IllegalArgumentException] {
      Dedup.contamination(corpus, probe, $"text", $"doc_id", n = 3,
        maxProbeShingles = 2L).collect()
    }
    assert(e.getMessage.contains("broadcastProbe=false"), e.getMessage)
    // the same probe passes with broadcastProbe=false (guard is broadcast-only)
    val ok = Dedup.contamination(corpus, probe, $"text", $"doc_id", n = 3,
      maxProbeShingles = 2L, broadcastProbe = false).collect()
    assert(ok.length == 1)
  }

  test("contextChunks: exact window spans, empty docs, layout invariance") {
    // ctx = 10; docs of 4,8,10,3 tokens concat to spans
    // [0,4) w0 | [4,12) w0-w1 | [12,22) w1-w2 | [22,25) w2
    val d = Seq((1L, 4), (2L, 8), (3L, 10), (4L, 3), (5L, 0))
      .toDF("id", "n")
    def run(in: org.apache.spark.sql.DataFrame) =
      Packing.contextChunks(in, Seq($"id"), $"n", ctx = 10) { p =>
        p.select($"id", $"token_start", $"first_window", $"last_window",
          $"n_windows").collect()
          .map(r => r.getLong(0) ->
            (r.getLong(1), Option(r.get(2)), Option(r.get(3)), r.getLong(4)))
          .toMap
      }
    val got = run(d.repartition(3))
    assert(got(1L) == ((0L, Some(0L), Some(0L), 1L)))
    assert(got(2L) == ((4L, Some(0L), Some(1L), 2L)))
    assert(got(3L) == ((12L, Some(1L), Some(2L), 2L)))
    assert(got(4L) == ((22L, Some(2L), Some(2L), 1L)))
    assert(got(5L)._4 == 0L) // empty doc occupies no window
    assert(run(d.coalesce(1)) == got, "packing drifted with layout")
  }

  test("exactDedup keeps one row per distinct content, keeps smallest id") {
    val out = Dedup.exactDedup(docsDf, $"text", $"id")
    assert(out.count() == 70) // 75 rows - 5 exact dups
    // the kept copy of each duplicated text is the original (id < 200)
    assert(out.filter($"id" >= 200L).count() == 0)
  }

  test("incrementalDedup: exact new-only semantics, whitespace-normalized, fp-proof") {
    val history = Seq((1L, "the cat sat"), (2L, "a dog ran"), (3L, "birds fly"))
      .toDF("id", "text")
    val corpus = Seq(
      (10L, "the cat sat"),        // exact dup
      (11L, "  THE   cat SAT  "),  // dup after normalization
      (12L, "a brand new doc"),    // new
      (13L, "another new one"),    // new
      (14L, "a dog ran")).toDF("id", "text")
    // fpp = 0.5 with a tiny sketch forces bloom false positives through
    // the verification join: semantics must stay exact regardless
    val out = Dedup.incrementalDedup(corpus, history, $"text", $"text",
      expectedHistory = 4L, fpp = 0.5)
    assert(out.select($"id").collect().map(_.getLong(0)).toSet == Set(12L, 13L))
    assert(out.columns.toSeq == corpus.columns.toSeq) // original schema back
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "text")
    val v2 = Seq((2L, "beta"), (3L, "GAMMA edited"), (4L, "delta"))
      .toDF("id", "text")
    val m = Dedup.snapshotDiff(v1, v2, $"id", $"id", $"text", $"text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "added"))
  }

  test("minHashLsh finds near and exact duplicate pairs with correct jaccard") {
    val pairs = Dedup.minHashLsh(docsDf, $"id", $"text",
      numHashes = 32, bands = 16, shingleN = 3, threshold = 0.5).collect()
    val pairSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    // all 5 exact-dup pairs present with jaccard 1.0
    (0 until 5).foreach { i =>
      assert(pairSet.contains((i.toLong, 200L + i)), s"missing exact pair $i")
    }
    pairs.filter(r => r.getLong(0) < 60L && r.getLong(1) >= 200L)
      .foreach(r => assert(r.getDouble(2) == 1.0))
    // most near-dup pairs found (1-word change at 40 words, 3-shingles → j≈0.85)
    val nearFound = (0 until 10).count(i => pairSet.contains((i.toLong, 100L + i)))
    assert(nearFound >= 8, s"found only $nearFound/10 near-dup pairs")
    // no false positives among unrelated originals
    assert(!pairs.exists(r => r.getLong(0) < 60 && r.getLong(1) < 60))
  }

  test("minHashDedup drops duplicates, keeps originals") {
    val out = Dedup.minHashDedup(docsDf, $"id", $"text",
      numHashes = 32, bands = 16, shingleN = 3, threshold = 0.5)
    val kept = out.select("id").collect().map(_.getLong(0)).toSet
    (0L until 60L).foreach(i => assert(kept.contains(i), s"original $i dropped"))
    assert((200L until 205L).forall(!kept.contains(_)), "exact dups not dropped")
  }

  test("winnowing fingerprints: deterministic, shared-substring guarantee, naive parity") {
    val k = 8; val w = 4
    // naive reference: all k-gram rolling hashes, min per window (rightmost
    // tie), distinct in selection order
    def naive(s: String): Seq[Long] = {
      val B = 1000003L
      val m = s.length - k + 1
      if (m <= 0) return Seq.empty
      val hs = (0 until m).map { i =>
        s.substring(i, i + k).foldLeft(0L)((h, c) => h * B + c)
      }
      val sel =
        if (m <= w) Seq(hs.zipWithIndex.minBy { case (h, i) => (h, -i) }._1)
        else (0 to m - w).map { st =>
          (st until st + w).minBy(i => (hs(i), -i))
        }.map(hs)
      sel.distinct
    }
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "pack my box with five dozen liquor jugs and more text here",
      "short")
    val got = texts.toDF("t")
      .select(graft.expr.HashExprs.winnowFingerprints(col("t"), k, w).as("fp"))
      .collect().map(_.getSeq[Long](0).toSeq)
    texts.zip(got).foreach { case (s, g) =>
      assert(g == naive(s), s"winnow mismatch for '$s'")
    }
    // shared-substring guarantee: docs sharing a >= w+k-1 char run overlap
    val shared = "this exact common fragment is long enough to fingerprint"
    val sim = Seq((s"prefix junk $shared", s"$shared totally different tail"))
      .toDF("a", "b")
      .select(graft.ops.TextOps.winnowSimilarity(col("a"), col("b"), k, w).as("s"))
      .head().getDouble(0)
    assert(sim > 0.2, s"shared-fragment similarity $sim")
    // disjoint docs share ~nothing
    val disj = Seq(("aaaaaaaaaaaaaaaaaaaaaaaa", "zzzzzzzzzzzzzzzzzzzzzzzz"))
      .toDF("a", "b")
      .select(graft.ops.TextOps.winnowSimilarity(col("a"), col("b"), k, w).as("s"))
      .head().getDouble(0)
    assert(disj == 0.0)
  }

  test("winnowPairs finds exact and near duplicates via fingerprint buckets") {
    val pairs = Dedup.winnowPairs(docsDf, $"id", $"text", k = 8, w = 4,
      threshold = 0.5).collect()
    val pairSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    // exact dups (200+i copies i) share every fingerprint
    (0 until 5).foreach { i =>
      assert(pairSet.contains((i.toLong, 200L + i)), s"missing exact pair $i")
    }
    pairs.filter(r => r.getLong(0) < 60L && r.getLong(1) >= 200L)
      .foreach(r => assert(r.getDouble(2) == 1.0))
    // near dups (100+i = 1-word change of i) share most fingerprints
    val nearFound = (0 until 10).count(i => pairSet.contains((i.toLong, 100L + i)))
    assert(nearFound >= 8, s"found only $nearFound/10 near-dup pairs")
    // unrelated originals do not pair at 0.5
    assert(!pairs.exists(r => r.getLong(0) < 60 && r.getLong(1) < 60))
  }

  test("connectedComponents: driver union-find equals the distributed loop") {
    // random multigraph with self-loops, stars, and long chains — the
    // r18 fast path (collected union-find) must produce the identical
    // (id, component = min id) labeling as the min-label propagation
    // loop (forced via maxLocalEdges = 0)
    val rng = new scala.util.Random(7)
    val es = (0 until 500).map(_ =>
      (rng.nextInt(300).toLong, rng.nextInt(300).toLong)) ++
      (900L until 950L).map(i => (i, i + 1)) // a 51-node chain
    val pairs = es.toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val slow = Dedup.connectedComponents(pairs, maxLocalEdges = 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == slow)
  }

  test("connectedComponents closes transitive chains; minHashDedup keeps one per cluster") {
    // star through 3: greedy drop-larger-of-each-pair would keep 1 AND 2
    val pairs = Seq((1L, 3L), (2L, 3L), (10L, 11L), (11L, 12L), (12L, 13L),
      (13L, 14L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    // 5-long chain collapses to min id
    (10L to 14L).foreach(i => assert(comp(i) == 10L, s"chain member $i -> ${comp(i)}"))
  }

  test("simHashPairs finds the exact-duplicate pairs") {
    val pairs = Dedup.simHashPairs(docsDf, $"id", $"text", maxHamming = 3).collect()
    val pairSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    (0 until 5).foreach { i =>
      assert(pairSet.contains((i.toLong, 200L + i)), s"missing exact pair $i") }
  }

  test("hammingPairs: a 1k-member constant-hash cluster collapses to a linear star") {
    // 1000 rows share one hash (the viral-copy shape that used to expand
    // C(1000,2) = 499500 pairs through every chunk bucket) + 3 distinct
    // near hashes. Expect exactly 999 star pairs at hamming 0 from the
    // cluster — LINEAR — plus the distinct-hash pigeonhole pairs.
    val hot = (0L until 1000L).map(i => (i, 0x0123456789abcdefL))
    val near = Seq((2000L, 0x0123456789abceefL), // hamming 2 from hot
      (2001L, 0x0123456789abcfefL), // hamming 1 from hot, 1 from 2000
      (3000L, 0x7777777777777777L)) // far from everything
    val df = (hot ++ near).toDF("id", "h").repartition(7)
    val pairs = Dedup.hammingPairs(df, $"id", $"h", maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val stars = pairs.filter(p => p._1 == 0L && p._2 < 1000L)
    assert(stars.length == 999 && stars.forall(_._3 == 0),
      s"expected a 999-edge star, got ${stars.length}")
    // cross-cluster pairs surface via the representative (id 0), ONCE each
    assert(pairs.contains((0L, 2000L, 2)) && pairs.contains((0L, 2001L, 1)) &&
      pairs.contains((2000L, 2001L, 1)),
      pairs.filter(p => p._2 >= 2000L).mkString(","))
    assert(!pairs.exists(p => p._1 > 0L && p._1 < 1000L),
      "non-representative cluster members must not source extra pairs")
    assert(!pairs.exists(p => p._1 == 3000L || p._2 == 3000L))
    // total output is star + rep-level pairs, nowhere near C(1003, 2)
    assert(pairs.length < 1010, s"pair blowup: ${pairs.length}")
  }

  test("hammingPairs: hot-bucket cap drops boilerplate chunks, keeps the rest") {
    // 40 DISTINCT hashes share chunks 1-3 and differ wildly in chunk 0
    // (boilerplate-template shape): with maxBucket = 10 each shared-chunk
    // bucket saturates and is dropped, and chunk 0 buckets are singletons,
    // so NO pairs emerge; a separate clean near-pair still does.
    val boiler = (0L until 40L).map(i => (i, 0x1111222233330000L | (i * 7 + 1)))
    val clean = Seq((100L, 0x4444555566667777L), (101L, 0x4444555566667775L))
    val df = (boiler ++ clean).toDF("id", "h")
    val pairs = Dedup.hammingPairs(df, $"id", $"h",
        maxHamming = 8, maxBucket = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((100L, 101L, 1)), pairs.mkString(","))
    // raising the cap readmits the boilerplate pairs
    val uncapped = Dedup.hammingPairs(df, $"id", $"h",
      maxHamming = 8, maxBucket = 1000).count()
    assert(uncapped > 100, s"uncapped should find the in-bucket pairs, got $uncapped")
  }

  test("minHashLsh: exact-signature flood stays linear and survives the band cap") {
    // one document body repeated 60 times + its 1-word near variant:
    // the 60 identical signatures collapse to one representative, so the
    // band buckets hold <= 2 members even with maxBucket = 5, and the
    // flood surfaces as 59 star pairs at jaccard 1.0
    val bodyA = (1 to 40).map(w => s"tok$w").mkString(" ")
    val bodyB = ((1 to 39).map(w => s"tok$w") :+ "changed").mkString(" ")
    val rows = (0L until 60L).map(i => (i, bodyA)) :+ (500L, bodyB)
    val pairs = Dedup.minHashLsh(rows.toDF("id", "text"), $"id", $"text",
        numHashes = 32, bands = 16, shingleN = 3, threshold = 0.5,
        maxBucket = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val stars = pairs.filter(p => p._1 == 0L && p._2 < 60L)
    assert(stars.length == 59 && stars.forall(_._3 == 1.0),
      s"expected 59 exact star pairs, got ${stars.length}")
    // the near variant pairs with the representative only (rep-reduced)
    assert(pairs.count(_._2 == 500L) == 1 &&
      pairs.exists(p => p._1 == 0L && p._2 == 500L && p._3 > 0.5 && p._3 < 1.0),
      pairs.filter(_._2 == 500L).mkString(","))
    // components — what minHashDedup consumes — cover the whole flood
    val comp = Dedup.connectedComponents(
        pairs.map(p => (p._1, p._2)).toSeq.toDF("id_a", "id_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 60L).forall(i => comp(i) == 0L) && comp(500L) == 0L)
  }

  // ---------------------------------------------------------------- embeddings

  private lazy val vecs: Seq[(Long, Array[Double])] = {
    val rng = new scala.util.Random(23)
    val base = (0L until 80L).map { i =>
      i -> Array.fill(16)(rng.nextGaussian())
    }
    // 8 near-dups: tiny perturbation of the first 8
    val dups = (0L until 8L).map { i =>
      (100L + i) -> base(i.toInt)._2.map(_ + rng.nextGaussian() * 0.01)
    }
    base ++ dups
  }
  private lazy val vecsDf = vecs.toDF("id", "v").repartition(4)

  test("embeddingNearDup: brute force finds the 8 planted pairs; LSH keeps recall") {
    val exact = Dedup.embeddingNearDup(vecsDf, $"id", $"v", threshold = 0.99, bits = 0)
    val ep = exact.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ep.size == 8, s"expected 8 planted pairs, got ${ep.size}")
    (0L until 8L).foreach(i => assert(ep.contains((i, 100L + i))))
    val lsh = Dedup.embeddingNearDup(vecsDf, $"id", $"v", threshold = 0.99, bits = 4)
    val lp = lsh.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lp.subsetOf(ep), "LSH must not invent pairs")
    assert(lp.size >= 6, s"LSH recall too low: ${lp.size}/8")
    // OR-amplification: more tables at the same bits can only add recall
    val amp = Dedup.embeddingNearDup(vecsDf, $"id", $"v", threshold = 0.99,
      bits = 8, tables = 4)
    val ap = amp.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ap.subsetOf(ep), "amplified LSH must not invent pairs")
    assert(ap.size == 8, s"4-table recall should be full: ${ap.size}/8")
  }

  test("bruteForceKnn guards the probe broadcast by row count") {
    val probes = vecsDf.filter($"id" < 5)
    val e = intercept[IllegalArgumentException] {
      Ann.bruteForceKnn(vecsDf, $"id", $"v", probes, $"id", $"v", k = 2,
        maxBroadcastProbes = 2L)
    }
    assert(e.getMessage.contains("ivfKnn"), e.getMessage)
  }

  test("ivfKnn matches brute force at full probe count, high recall at half") {
    val probes = vecsDf.filter($"id" < 5)
    val brute = Ann.bruteForceKnn(vecsDf, $"id", $"v", probes, $"id", $"v", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val idx = Ann.trainIvf(vecsDf, $"v", numCells = 8, sampleSize = 88, seed = 1L)
    val full = Ann.ivfKnn(vecsDf, $"id", $"v", probes, $"id", $"v", idx, k = 5, nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == brute, "nprobe=numCells must equal brute force")
    val half = Ann.ivfKnn(vecsDf, $"id", $"v", probes, $"id", $"v", idx, k = 5, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = half.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.6, s"ivf recall $recall")
  }

  // ---------------------------------------------------------------- multimodal

  test("decodeFeatures: deterministic stub features, batch plumbing, null safety") {
    val rows = (1L to 100L).map { i =>
      (i, Array.fill(32)((i % 7).toByte), "png", 640, 480)
    } :+ ((101L, Array.empty[Byte], "png", 0, 0))
    val d = rows.toDF("id", "content", "format", "width", "height").repartition(3)
    val out = Multimodal.decodeFeatures(d, featureDim = 8, batchSize = 16)
    val collected = out.collect()
    assert(collected.length == 101)
    val ok = collected.filter(_.getBoolean(2))
    assert(ok.length == 100)
    assert(ok.forall(_.getSeq[Float](1).length == 8))
    // determinism: same content → same features
    val byId = collected.map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(byId(1L) == byId(8L), "same bytes must give same features") // 1%7 == 8%7
    assert(byId(1L) != byId(2L))
    // empty content flagged, not crashed
    assert(!collected.find(_.getLong(0) == 101L).get.getBoolean(2))
  }

  test("decodeImages: real javax.imageio roundtrip, exact channel stats, corrupt bytes") {
    val rows = Seq(
      (1L, Multimodal.solidPngBytes(10, 200, 30, 8, 8)),
      (2L, Multimodal.solidPngBytes(0, 0, 255, 16, 4)),
      (3L, Array[Byte](1, 2, 3, 4)), // not an image
      (4L, Array.empty[Byte]))
    val d = rows.toDF("id", "content").repartition(2)
    val out = Multimodal.decodeImages(d, batchSize = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getInt(1) == 8 && r1.getInt(2) == 8 && r1.getBoolean(6))
    assert(r1.getSeq[Double](4) == Seq(10 / 255.0, 200 / 255.0, 30 / 255.0))
    assert(r1.getSeq[Double](5) == Seq(0.0, 0.0, 0.0))
    val r2 = out(2L)
    assert(r2.getInt(1) == 16 && r2.getInt(2) == 4)
    assert(r2.getSeq[Double](4) == Seq(0.0, 0.0, 1.0))
    assert(!out(3L).getBoolean(6) && !out(4L).getBoolean(6))
  }

  test("imageDHash: brightness-invariant, pattern-sensitive; hammingPairs pigeonhole") {
    val rows = Seq(
      (1L, Multimodal.patternPngBytes(7L, 64, 64, 0)),
      (2L, Multimodal.patternPngBytes(7L, 64, 64, 20)), // brightened copy
      (3L, Multimodal.patternPngBytes(8L, 64, 64, 0)), // different pattern
      (4L, Array[Byte](9, 9, 9))) // corrupt
    val h = Multimodal.imageDHash(rows.toDF("id", "content").repartition(2))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2)))
      .toMap
    assert(h(1L)._1.get == h(2L)._1.get, "uniform brightness must not change dHash")
    assert(h(1L)._1.get != h(3L)._1.get, "different patterns must differ")
    assert(java.lang.Long.bitCount(h(1L)._1.get ^ h(3L)._1.get) > 10,
      s"patterns too close: ${java.lang.Long.bitCount(h(1L)._1.get ^ h(3L)._1.get)} bits")
    // decode failure = NULL hash (never a sentinel that would cluster)
    assert(!h(4L)._2 && h(4L)._1.isEmpty)
    // no decode_ok filter needed: the pair kernel drops null hashes itself
    val pairs = graft.ops.Dedup.hammingPairs(
        Multimodal.imageDHash(rows.toDF("id", "content")),
        $"id", $"dhash")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0)), pairs.mkString(","))
  }

  test("audioFingerprint: volume-invariant, pattern-sensitive, short clips fail") {
    val rows = Seq(
      (1L, Multimodal.patternWavBytes(5L, 2000, 16000, 1)),
      (2L, Multimodal.patternWavBytes(5L, 2000, 16000, 2)), // half volume
      (3L, Multimodal.patternWavBytes(6L, 2000, 16000, 1)), // other pattern
      (4L, Multimodal.patternWavBytes(5L, 40, 16000, 1)), // < 65 samples
      (5L, Array[Byte](1, 2, 3)))
    val h = Multimodal.audioFingerprint(rows.toDF("id", "content")
        .repartition(2))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getBoolean(2)))
      .toMap
    assert(h(1L)._1.get == h(2L)._1.get, "half volume must not change the fingerprint")
    assert(h(1L)._1.get != h(3L)._1.get)
    assert(java.lang.Long.bitCount(h(1L)._1.get ^ h(3L)._1.get) > 10)
    assert(!h(4L)._2 && h(4L)._1.isEmpty && !h(5L)._2 && h(5L)._1.isEmpty)
    // MIXED decode failures feed the kernel unfiltered: null hashes never
    // pair, so the two corrupt clips produce zero failure-pairs
    val pairs = graft.ops.Dedup.hammingPairs(
        Multimodal.audioFingerprint(rows.toDF("id", "content")),
        $"id", $"afp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0)), pairs.mkString(","))
  }

  test("pqKnn: planted exact copies win the ADC ranking; shape guards hold") {
    // corpus = the 80 originals + 5 exact copies of each of 3 probes
    // (near-dup ids 100+ excluded: a perturbed twin can legitimately tie
    // the probe's codes and displace one copy by id order)
    val base = vecsDf.filter($"id" < 80)
    val copies = (0 until 3).flatMap(p =>
      (1 to 5).map(j => (1000L + p * 10 + j, vecs(p)._2)))
    val corpus = base.unionByName(copies.toDF("id", "v"))
    val idx = Ann.trainPq(corpus, $"v", numSub = 4, codebookSize = 8,
      sampleSize = 200, seed = 5L)
    assert(idx.numSub == 4 && idx.codebookSize == 8 && idx.subDim == 4)
    val probes = vecsDf.filter($"id" < 3).select($"id".as("pid"), $"v".as("q"))
    val top = Ann.pqKnn(corpus, $"id", $"v", probes, $"pid", $"q", idx, k = 5)
      .collect()
    val byQ = top.groupBy(_.getLong(0))
    (0L until 3L).foreach { p =>
      val rows = byQ(p).sortBy(_.getInt(3))
      val copyIds = (1 to 5).map(j => 1000L + p * 10 + j).toSet
      val gotCopies = rows.map(_.getLong(1)).count(copyIds)
      // every non-copy in the top-5 must TIE the copies' (global-minimum)
      // ADC distance — a strictly-closer non-copy would be a ranking bug
      val minD = rows.map(_.getDouble(2)).min
      assert(gotCopies >= 4 &&
        rows.filter(r => !copyIds(r.getLong(1))).forall(
          _.getDouble(2) <= minD + 1e-12),
        rows.map(r => (r.getLong(1), r.getDouble(2))).mkString(","))
    }
    // dim not divisible by numSub fails fast
    intercept[IllegalArgumentException] {
      Ann.trainPq(corpus, $"v", numSub = 5, codebookSize = 4, sampleSize = 50)
    }
    // probe-count guard names the runaway product
    val e = intercept[IllegalArgumentException] {
      Ann.pqKnn(corpus, $"id", $"v", corpus.select($"id".as("p"), $"v"),
        $"p", $"v", idx, k = 1, maxProbes = 3)
    }
    assert(e.getMessage.contains("maxProbes"), e.getMessage)
  }

  test("ivfPqKnn: the IVF-PQ composition keeps the planted copies") {
    val base = vecsDf.filter($"id" < 80)
    val copies = (0 until 3).flatMap(p =>
      (1 to 5).map(j => (1000L + p * 10 + j, vecs(p)._2)))
    val corpus = base.unionByName(copies.toDF("id", "v"))
    val ivf = Ann.trainIvf(corpus, $"v", numCells = 4, sampleSize = 95,
      seed = 11L)
    val pq = Ann.trainPq(corpus, $"v", numSub = 4, codebookSize = 8,
      sampleSize = 95, seed = 11L)
    val probes = vecsDf.filter($"id" < 3).select($"id".as("pid"), $"v".as("q"))
    // nprobe = ALL cells: recall equals plain PQ (the composition is then
    // pure plumbing), and the copies' global-minimum ADC property holds
    val top = Ann.ivfPqKnn(corpus, $"id", $"v", probes, $"pid", $"q",
      ivf, pq, k = 5, nprobe = 4).collect()
    val byQ = top.groupBy(_.getLong(0))
    (0L until 3L).foreach { p =>
      val rows = byQ(p).sortBy(_.getInt(3))
      val copyIds = (1 to 5).map(j => 1000L + p * 10 + j).toSet
      val minD = rows.map(_.getDouble(2)).min
      assert(rows.map(_.getLong(1)).count(copyIds) >= 4 &&
        rows.filter(r => !copyIds(r.getLong(1))).forall(
          _.getDouble(2) <= minD + 1e-12),
        rows.map(r => (r.getLong(1), r.getDouble(2))).mkString(","))
    }
    // nprobe = 1: an exact copy lives in the probe's own nearest cell, so
    // the copies still surface even under maximal pruning
    val pruned = Ann.ivfPqKnn(corpus, $"id", $"v", probes, $"pid", $"q",
      ivf, pq, k = 5, nprobe = 1).collect().groupBy(_.getLong(0))
    (0L until 3L).foreach { p =>
      val copyIds = (1 to 5).map(j => 1000L + p * 10 + j).toSet
      assert(pruned(p).map(_.getLong(1)).count(copyIds) >= 4,
        pruned(p).map(_.getLong(1)).mkString(","))
    }
  }

  test("videoMetadata: ISO-BMFF box walk — dims, duration, codecs, corrupt bytes") {
    val rows = Seq(
      (1L, Multimodal.patternMp4Bytes(640, 360, 5000L, withAudio = true)),
      (2L, Multimodal.patternMp4Bytes(1920, 1080, 123456L, withAudio = false)),
      (3L, Array[Byte](1, 2, 3, 4)), // not a box structure
      (4L, Array.empty[Byte]))
    val out = Multimodal.videoMetadata(rows.toDF("id", "content").repartition(2))
      .collect().map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getLong(1) == 5000L && r1.getInt(2) == 2)
    assert(r1.getInt(3) == 640 && r1.getInt(4) == 360)
    assert(r1.getString(5) == "avc1" && r1.getString(6) == "mp4a")
    assert(r1.getBoolean(7))
    val r2 = out(2L)
    assert(r2.getLong(1) == 123456L && r2.getInt(2) == 1 &&
      r2.getInt(3) == 1920 && r2.getInt(4) == 1080 &&
      r2.getString(5) == "avc1" && r2.isNullAt(6))
    assert(!out(3L).getBoolean(7) && out(3L).isNullAt(1) && out(3L).isNullAt(5))
    assert(!out(4L).getBoolean(7))
    // the 100 TB idiom: metadata predicates prune BEFORE any frame decode
    val longOnes = Multimodal.videoMetadata(rows.toDF("id", "content"))
      .filter($"decode_ok" && $"duration_ms" > 10000).select("id").collect()
    assert(longOnes.map(_.getLong(0)).toSeq == Seq(2L))
    // gateway verb reach
    rows.toDF("id", "content").createOrReplaceTempView("vids_t")
    assert(GraftGateway.sql(spark,
      "SELECT video_metadata(id, content) FROM vids_t")
      .filter($"decode_ok").count() == 2)
  }

  test("multimodal gateway verbs: image_dhash / audio_fingerprint / hamming_pairs") {
    Seq((1L, Multimodal.patternPngBytes(7L, 64, 64, 0)),
        (2L, Multimodal.patternPngBytes(7L, 64, 64, 20)),
        (3L, Multimodal.patternPngBytes(8L, 64, 64, 0)))
      .toDF("doc", "bytes").createOrReplaceTempView("gw_imgs")
    GraftGateway.sql(spark, "SELECT image_dhash(doc, bytes) FROM gw_imgs")
      .createOrReplaceTempView("gw_hashed")
    val pairs = GraftGateway.sql(spark,
        "SELECT hamming_pairs(id, dhash, 3) FROM gw_hashed")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0)), pairs.mkString(","))
    Seq((1L, Multimodal.patternWavBytes(5L, 2000, 16000, 1)),
        (2L, Multimodal.patternWavBytes(5L, 2000, 16000, 2)))
      .toDF("doc", "bytes").createOrReplaceTempView("gw_wavs")
    val afp = GraftGateway.sql(spark,
        "SELECT audio_fingerprint(doc, bytes) FROM gw_wavs")
      .collect().map(r => r.getLong(1)).distinct
    assert(afp.length == 1, "volume-invariant fingerprints must agree")
  }

  test("decodeAudio: real PCM-WAV parsing, exact channel stats, corrupt bytes") {
    // stereo with distinct per-channel amplitudes; mono; junk; truncated
    val stereo = Multimodal.constWavBytes(Array(1000, -2000), 50, 44100)
    val rows = Seq(
      (1L, Multimodal.constWavBytes(Array(4096), 800, 16000)),
      (2L, stereo),
      (3L, Array[Byte](82, 73, 70, 70, 1, 2, 3)), // RIFF but truncated
      (4L, Array.empty[Byte]))
    val d = rows.toDF("id", "content").repartition(2)
    val out = Multimodal.decodeAudio(d, batchSize = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = out(1L)
    assert(r1.getInt(1) == 16000 && r1.getInt(2) == 1 && r1.getLong(3) == 800L)
    assert(r1.getSeq[Double](4) == Seq(4096 / 32768.0)) // exact: 2^12/2^15
    assert(r1.getSeq[Double](5) == Seq(4096 / 32768.0))
    assert(r1.getBoolean(6))
    val r2 = out(2L)
    assert(r2.getInt(2) == 2 && r2.getLong(3) == 50L && r2.getInt(1) == 44100)
    assert(r2.getSeq[Double](4) == Seq(1000 / 32768.0, -2000 / 32768.0))
    assert(r2.getSeq[Double](5) == Seq(1000 / 32768.0, 2000 / 32768.0))
    assert(!out(3L).getBoolean(6) && !out(4L).getBoolean(6))
  }

  test("sampleFrames and resizePlan") {
    val d = Seq((1L, 1000L), (2L, 250L), (3L, 0L)).toDF("id", "dur")
    val frames = Multimodal.sampleFrames(d, $"id", $"dur", everyMs = 250L)
    assert(frames.filter($"id" === 1L).count() == 4) // 0,250,500,750
    assert(frames.filter($"id" === 3L).count() == 0)
    val rp = Seq((1920, 1080), (640, 480)).toDF("w", "h")
      .select(Multimodal.resizePlan($"w", $"h", 1024).as("p")).collect()
    assert(rp(0).getStruct(0).getInt(0) == 1024 && rp(0).getStruct(0).getBoolean(2))
    assert(rp(1).getStruct(0).getInt(0) == 640 && !rp(1).getStruct(0).getBoolean(2))
  }

  test("vector kernels are bit-identical to the composed HOF forms") {
    import org.apache.spark.sql.functions._
    val rng = new scala.util.Random(31)
    val rows = (1 to 200).map { _ =>
      (Array.fill(16)(rng.nextGaussian()), Array.fill(16)(rng.nextGaussian()))
    }
    val d = rows.toDF("a", "b")
      .select($"a".cast("array<double>").as("a"), $"b".cast("array<double>").as("b"))
    val hofCos = {
      val dot = aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      val na = sqrt(aggregate(transform($"a", x => x * x), lit(0.0), (acc, x) => acc + x))
      val nb = sqrt(aggregate(transform($"b", x => x * x), lit(0.0), (acc, x) => acc + x))
      dot / (na * nb)
    }
    val diff = d.select(graft.expr.VectorExprs.cosineSim($"a", $"b").as("k"), hofCos.as("h"))
      .filter($"k" =!= $"h").count() // bitwise equality: any diff fails =!=
    assert(diff == 0, s"$diff rows differ from the HOF cosine")
    // L2-to-literal vs the composed zip_with fold
    val v = Array.fill(16)(rng.nextGaussian())
    val lit2 = array(v.map(lit): _*)
    val hofL2 = aggregate(zip_with($"a", lit2, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)
    val diff2 = d.select(graft.expr.VectorExprs.l2SqToLit($"a", v).as("k"), hofL2.as("h"))
      .filter($"k" =!= $"h").count()
    assert(diff2 == 0, s"$diff2 rows differ from the HOF l2")
    // null / length-mismatch / empty semantics mirror zip_with padding
    val edge = Seq(
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)), // null elem
      (Seq[java.lang.Double](1.0), Seq[java.lang.Double](1.0, 2.0)),       // mismatch
      (Seq.empty[java.lang.Double], Seq.empty[java.lang.Double]))          // empty
      .toDF("a", "b")
      .select($"a".cast("array<double>").as("a"), $"b".cast("array<double>").as("b"))
      .select(graft.expr.VectorExprs.cosineSim($"a", $"b").as("k")).collect()
    assert(edge(0).isNullAt(0) && edge(1).isNullAt(0))
    assert(edge(2).getDouble(0).isNaN)
  }

  test("many vector kernels in one codegen scope compile (non-nullable children)") {
    import org.apache.spark.sql.functions._
    // transform(sequence(...)) yields a non-nullable array<double>, so
    // nullSafeCodeGen inlines the kernel body unbraced — several kernels in
    // one projection then share a Java scope (the Ann.cellOf shape).
    val confs = Seq("spark.sql.codegen.fallback" -> "false",
                    "spark.sql.codegen.factoryMode" -> "CODEGEN_ONLY")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val d = spark.range(100).select(
        transform(sequence(lit(1), lit(8)),
          i => (i + col("id")).cast("double")).as("a"))
      val cents = (0 until 4).map(c => Array.tabulate(8)(j => (c + j).toDouble))
      val dists = array(cents.map(v => graft.expr.VectorExprs.l2SqToLit($"a", v)): _*)
      val out = d.select(
        dists.as("d"),
        graft.expr.VectorExprs.cosineSim($"a", $"a").as("c1"),
        graft.expr.VectorExprs.cosineSim($"a", $"a").as("c2")).collect()
      assert(out.length == 100)
      assert(out.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-12))
      // row id=0: a = (1..8); centroid 0 = (0..7) → dist = 8 * 1
      assert(math.abs(out.head.getSeq[Double](0).head - 8.0) < 1e-12)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("weightedSample: A-ES keys select the k smallest -ln(u)/w per stratum") {
    import graft.ops.Mixing
    // u is caller-supplied and deterministic, so the exact selection is
    // computable locally: key = -ln(u)/w, keep the 10 smallest per stratum
    val rows = (1 to 99).map(i => (i.toLong, if (i % 2 == 0) "A" else "B",
      (i % 7 + 1).toDouble, i / 100.0))
    val df = rows.toDF("id", "s", "w", "u").repartition(5)
    val expected = rows.groupBy(_._2).map { case (g, rs) =>
      g -> rs.sortBy(r => -math.log(r._4) / r._3).take(10).map(_._1).toSet }
    val got = Mixing.weightedSample(df, $"s", $"w", $"u", 10) { sm =>
      sm.collect().map(r => r.getString(1) -> r.getLong(0))
        .groupBy(_._1).map { case (g, v) => g -> v.map(_._2).toSet } }
    assert(got == expected)
    // k >= stratum size keeps everything
    assert(Mixing.weightedSample(df, $"s", $"w", $"u", 1000)(_.count()) == 99)
    // contract violations (w <= 0, u outside (0,1)) are named errors fused
    // into the key expression -- no silent row drops
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    val badW = df.withColumn("w", when($"id" === 50, -1.0).otherwise($"w"))
    val e1 = intercept[Exception] {
      Mixing.weightedSample(badW, $"s", $"w", $"u", 10)(_.count()) }
    assert(chain(e1).contains("weighted_sample"))
    val badU = df.withColumn("u", when($"id" === 50, 1.0).otherwise($"u"))
    val e2 = intercept[Exception] {
      Mixing.weightedSample(badU, $"s", $"w", $"u", 10)(_.count()) }
    assert(chain(e2).contains("weighted_sample"))
  }
}
