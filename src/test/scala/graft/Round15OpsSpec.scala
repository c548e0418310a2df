package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 operators: the top-p centroid kernel and semantic-dedup
  * multi-assignment (`probes`) — the SemDeDup boundary-recall fix. */
class Round15OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("NearestCentroids: top-p order, tie-break, element 0 == NearestCentroid") {
    val cs = Array(Array(0.0, 0.0), Array(10.0, 0.0), Array(0.0, 10.0),
      Array(10.0, 10.0))
    val df = Seq(
      (1L, Seq(1.0, 1.0)),   // nearest 0, then 1/2 tie -> 1, then 3
      (2L, Seq(9.0, 9.0)),   // nearest 3, then 1/2 tie -> 1
      (3L, Seq(5.0, 0.0))    // 0/1 exact tie -> 0; then 2/3 tie -> 2
    ).toDF("id", "v").withColumn("v", col("v").cast("array<double>"))
    val out = df.select(col("id"),
        graft.expr.VectorExprs.nearestCentroids(col("v"), cs, 3).as("b"),
        graft.expr.VectorExprs.nearestCentroid(col("v"), cs)
          .getField("cluster").as("c"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Int](1) == Seq(0, 1, 2))
    assert(out(1).getSeq[Int](1) == Seq(3, 1, 2))
    assert(out(2).getSeq[Int](1) == Seq(0, 1, 2))
    // element 0 is exactly the single-assignment answer
    out.foreach(r => assert(r.getSeq[Int](1).head == r.getInt(2)))
    // p clamped to k: asking for more probes than centroids returns k
    val all = df.select(graft.expr.VectorExprs
      .nearestCentroids(col("v"), cs, 9).as("b")).head().getSeq[Int](0)
    assert(all.length == 4 && all.toSet == Set(0, 1, 2, 3))
  }

  // the q236 fixture in miniature: 4 axis blobs (members exactly
  // parallel) + one boundary pair u/w between blobs 0 and 1 that lands
  // in DIFFERENT single-assignment buckets after the Lloyd fit
  private def boundaryFixture = {
    val rows = (0 until 200).map { i =>
      val m = 10.0 + i % 7
      val v = i % 4 match {
        case 0 => Seq(m, 0.0)
        case 1 => Seq(0.0, m)
        case 2 => Seq(-m, 0.0)
        case _ => Seq(0.0, -m)
      }
      (i.toLong, v)
    } ++ Seq((213L, Seq(6.5, 7.5)), (214L, Seq(7.5, 6.5)))
    rows.toDF("id", "v").withColumn("v", col("v").cast("array<double>"))
  }

  test("semanticDedup: probes=1 misses the boundary pair, probes=2 finds it") {
    val df = boundaryFixture
    def reps(probes: Int): Map[Long, Long] =
      graft.ops.Dedup.semanticDedup(df, col("id"), col("v"), k = 4,
          threshold = 0.95, iters = 2, maxBucket = 2000, probes = probes)
        .select(col("id"), col("rep_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val p1 = reps(1)
    val p2 = reps(2)
    // u (213) and w (214) straddle the blob0/blob1 boundary: single
    // assignment puts them in different buckets -> never compared
    assert(p1(213L) != p1(214L),
      s"p=1 should miss the boundary pair, got ${p1(213L)} == ${p1(214L)}")
    // probes=2 shares a bucket -> one group under the min id
    assert(p2(213L) == 213L && p2(214L) == 213L)
    // the blob structure is identical under both settings: every blob
    // collapses to its min id (= residue mod 4)
    for (m <- Seq(p1, p2); i <- 0 until 200)
      assert(m(i.toLong) == (i % 4).toLong, s"id $i rep ${m(i.toLong)}")
    // probes only ADDS recall: p2's groups refine-or-equal p1's
    assert(p1.keySet == p2.keySet)
  }

  test("BpeCodec: counts stay correct at production vocabulary scale (33k merges)") {
    val vocab = ScaleProbe.syntheticMerges(180)
    assert(vocab.length == 676 + 180 * 180) // 33,076
    val big = new graft.expr.BpeCodec(vocab) // well-formedness validated
    def n(s: String): Long = big.countTokens(s.getBytes("UTF-8"))
    // hand-derivable counts under min-rank-first (2-grams rank row-major,
    // 4-grams only over the first 180 2-grams):
    // "abab": (a,b)=rank 1 wins -> [ab,ab]; (ab,ab) is a 4-gram -> 1
    assert(n("abab") == 1)
    // "abcd": (a,b)=1 -> [ab,c,d]; (c,d)=55 -> [ab,cd]; (ab,cd) 4-gram -> 1
    assert(n("abcd") == 1)
    // "zzzz": (z,z)=675 -> [zz,zz]; "zz" is 2-gram #675 >= 180 so
    // (zz,zz) is NOT in the 4-gram block -> 2
    assert(n("zzzz") == 2)
    assert(n("ab abab zzzz") == 1 + 1 + 2)
    // big-codec == sub-codec equivalence: restrict text to {a..c}; the
    // sub-vocabulary in the SAME relative rank order must count
    // identically (only the relative order of APPLICABLE rules matters)
    val subVocab = vocab.filter { case (l, r) =>
      (l + r).forall(ch => ch >= 'a' && ch <= 'c') }
    val sub = new graft.expr.BpeCodec(subVocab)
    val rnd = new scala.util.Random(15)
    (1 to 200).foreach { _ =>
      val w = (1 to (1 + rnd.nextInt(12)))
        .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      assert(big.countTokens(w.getBytes) == sub.countTokens(w.getBytes),
        s"count mismatch on '$w'")
    }
    // the 256-byte word cap: an unbroken blob degrades to byte count,
    // a word AT the cap still merges
    assert(n("ab" * 200) == 400) // 400 bytes > 256
    assert(n("ab" * 128) < 256)  // exactly 256 bytes: merged normally
  }

  test("partialCorr: precision-matrix form equals the textbook recursion") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { _ =>
      val z1 = rnd.nextGaussian(); val z2 = rnd.nextGaussian()
      val x = 2.0 * z1 + 0.5 * z2 + rnd.nextGaussian()
      val y = -1.5 * z1 + 0.3 * z2 + rnd.nextGaussian()
      (x, y, z1, z2)
    }
    val df = rows.toDF("x", "y", "z1", "z2")
    def corrOf(a: String, b: String): Double =
      df.agg(corr(col(a), col(b))).head().getDouble(0)
    // one control: closed form
    val one = graft.ops.MlEval.partialCorr(df, col("x"), col("y"),
      Seq(col("z1"))).head()
    val (rxy, rxz, ryz) = (corrOf("x", "y"), corrOf("x", "z1"), corrOf("y", "z1"))
    val expected1 = (rxy - rxz * ryz) /
      math.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    assert(math.abs(one.getAs[Double]("partial_r") - expected1) < 1e-9)
    assert(one.getAs[Double]("df") == 400.0 - 3.0)
    // two controls: the recursion r_xy.z1z2 from the three one-control
    // partials — an independent algebraic path to the same number
    def pc(a: String, b: String, z: String): Double = {
      val (rab, raz, rbz) = (corrOf(a, b), corrOf(a, z), corrOf(b, z))
      (rab - raz * rbz) / math.sqrt((1 - raz * raz) * (1 - rbz * rbz))
    }
    val rec = (pc("x", "y", "z1") - pc("x", "z2", "z1") * pc("y", "z2", "z1")) /
      math.sqrt((1 - math.pow(pc("x", "z2", "z1"), 2)) *
        (1 - math.pow(pc("y", "z2", "z1"), 2)))
    val two = graft.ops.MlEval.partialCorr(df, col("x"), col("y"),
      Seq(col("z1"), col("z2"))).head()
    assert(math.abs(two.getAs[Double]("partial_r") - rec) < 1e-9,
      s"precision ${two.getAs[Double]("partial_r")} vs recursion $rec")
    assert(two.getAs[Double]("df") == 400.0 - 4.0)
    // controlling the confounders should shrink |r| toward the noise corr
    assert(math.abs(two.getAs[Double]("partial_r")) <
      math.abs(two.getAs[Double]("r_xy")))
  }

  test("kendallTau: hand cells, tie counts, guards") {
    val df = Seq((1, 1), (2, 3), (2, 2), (3, 3)).toDF("x", "y")
    val r = graft.ops.Agreement.kendallTau(df, col("x"), col("y")).head()
    // pairs: C = 4 (11-23, 11-22, 11-33, 22-33), D = 0; x ties {2,2},
    // y ties {3,3} -> n1 = n2 = 1, n0 = 6, tau = 4/sqrt(25) = 0.8
    assert(r.getAs[Long]("concordant") == 4L)
    assert(r.getAs[Long]("discordant") == 0L)
    assert(r.getAs[Long]("ties_x") == 1L && r.getAs[Long]("ties_y") == 1L)
    assert(math.abs(r.getAs[Double]("tau_b") - 0.8) < 1e-12)
    // perfect reversal -> tau = -1
    val rev = Seq((1, 3), (2, 2), (3, 1)).toDF("x", "y")
    assert(math.abs(graft.ops.Agreement.kendallTau(rev, col("x"), col("y"))
      .head().getAs[Double]("tau_b") + 1.0) < 1e-12)
    val const = Seq((1, 1), (1, 2)).toDF("x", "y")
    val e = intercept[IllegalArgumentException] {
      graft.ops.Agreement.kendallTau(const, col("x"), col("y"))
    }
    assert(e.getMessage.contains("constant"))
    val g = intercept[IllegalArgumentException] {
      graft.ops.Agreement.kendallTau(
        Seq((1, 1), (2, 2), (3, 3)).toDF("x", "y"), col("x"), col("y"),
        maxCells = 2)
    }
    assert(g.getMessage.contains("maxCells") || g.getMessage.contains("cells"))
  }

  test("adUniform: folded form equals the classic two-log arrangement") {
    val ps = Seq(0.11, 0.28, 0.44, 0.63, 0.92, 0.05, 0.77)
    val r = graft.ops.RankTests.adUniform(ps.toDF("p"), col("p")).head()
    // independent path: the CLASSIC A^2 = -n - (1/n) sum_i (2i-1) *
    // [ln u_(i) + ln(1 - u_(n+1-i))]
    val s = ps.sorted
    val n = s.length
    val classic = -n - (1.0 / n) * (1 to n).map(i =>
      (2.0 * i - 1) * (math.log(s(i - 1)) + math.log(1 - s(n - i)))).sum
    assert(math.abs(r.getAs[Double]("a2") - classic) < 1e-9,
      s"${r.getAs[Double]("a2")} vs $classic")
    val e = intercept[IllegalArgumentException] {
      graft.ops.RankTests.adUniform(
        Seq(0.2, 0.5, 1.0, 0.4, 0.3).toDF("p"), col("p"))
    }
    assert(e.getMessage.contains("STRICTLY"))
  }

  test("pageHinkley: hand trajectory and alarm point") {
    val df = Seq((1L, 0.0), (2L, 0.0), (3L, 0.0), (4L, 10.0), (5L, 10.0))
      .toDF("t", "v")
    val out = graft.ops.Drift.pageHinkley(df, col("t"), col("v"),
        lambda = 5.0).collect()
    // m = [0,0,0,2.5,4]; U = [0,0,0,7.5,13.5]; min U = 0 -> PH = U
    val ph = out.map(_.getAs[Double]("ph"))
    assert(ph.zip(Seq(0.0, 0.0, 0.0, 7.5, 13.5))
      .forall { case (a, b) => math.abs(a - b) < 1e-12 }, ph.toSeq.toString)
    assert(out.map(_.getAs[Boolean]("is_alarm")).toSeq ==
      Seq(false, false, false, true, true))
  }

  test("hellinger: identical -> 0, disjoint -> ~1, monotone in shift") {
    // group from the BLOCK index, value from the within-block offset —
    // v = i % 40 with g = i % 2 is the parity-locked fixture trap (group
    // 0 would see only odd values)
    val same = (0 until 200).map(i => (i % 40 + 1.0, (i / 40) % 2))
      .toDF("v", "g")
    val r0 = graft.ops.Drift.hellinger(same, col("v"), col("g"),
      Seq(10.0, 20.0, 30.0)).head()
    assert(math.abs(r0.getAs[Double]("hellinger")) < 1e-6)
    // groups in disjoint bins
    val dis = (1 to 200).map(i =>
      (if (i % 2 == 0) 5.0 else 35.0, i % 2)).toDF("v", "g")
    val r1 = graft.ops.Drift.hellinger(dis, col("v"), col("g"),
      Seq(10.0, 20.0, 30.0)).head()
    assert(r1.getAs[Double]("hellinger") > 0.99)
  }

  test("flemingHarrington: (0,0) equals the standard log-rank; gamma=1 late weights") {
    val rnd = new scala.util.Random(3)
    val rows = (1 to 300).map { i =>
      (i % 2, 1 + rnd.nextInt(20), if (rnd.nextDouble() < 0.7) 1 else 0)
    }
    val df = rows.toDF("arm", "time", "event")
    val std = graft.ops.Survival.logRankTest(df, col("arm"), col("time"),
      col("event")).head()
    val fh00 = graft.ops.Survival.flemingHarrington(df, col("arm"),
      col("time"), col("event"), rho = 0.0, gamma = 0.0).head()
    assert(math.abs(fh00.getAs[Double]("chi2") -
      std.getAs[Double]("chi2")) < 1e-9)
    assert(math.abs(fh00.getAs[Double]("observed1_w") -
      std.getAs[Double]("observed1")) < 1e-9)
    // gamma = 1: weights grow with time (1 - S(t-) is nondecreasing), so
    // the weighted observed count is strictly below the unweighted one
    // (weights < 1) but positive on this fixture
    val fh01 = graft.ops.Survival.flemingHarrington(df, col("arm"),
      col("time"), col("event"), rho = 0.0, gamma = 1.0).head()
    assert(fh01.getAs[Double]("observed1_w") > 0.0)
    assert(fh01.getAs[Double]("observed1_w") <
      std.getAs[Double]("observed1"))
    assert(fh01.getAs[Double]("variance_w") > 0.0)
  }

  test("bowkerTest: k=2 equals McNemar's uncorrected z^2; asymmetry grows chisq") {
    val rnd = new scala.util.Random(11)
    val pairs = (1 to 300).map { _ =>
      val a = rnd.nextInt(2)
      // asymmetric flips: 0->1 more often than 1->0
      val b = if (a == 0 && rnd.nextDouble() < 0.3) 1
              else if (a == 1 && rnd.nextDouble() < 0.1) 0 else a
      (a, b)
    }
    val df = pairs.toDF("a", "b")
    val bow = graft.ops.Agreement.bowkerTest(df, col("a"), col("b")).head()
    val mcn = graft.ops.Agreement.mcnemar(df, col("a"), col("b")).head()
    val z = mcn.getAs[Double]("z")
    assert(math.abs(bow.getAs[Double]("chisq") - z * z) < 1e-9)
    assert(bow.getAs[Long]("df") == 1L)
    assert(bow.getAs[Double]("p_value") < 0.05) // the planted asymmetry
    // symmetric 3-category disagreement -> small chisq, df = 3
    val sym = Seq((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1), (0, 0))
      .toDF("a", "b")
    val bs = graft.ops.Agreement.bowkerTest(sym, col("a"), col("b")).head()
    assert(bs.getAs[Double]("chisq") == 0.0 && bs.getAs[Long]("df") == 3L)
    val e = intercept[IllegalArgumentException] {
      graft.ops.Agreement.bowkerTest(
        Seq((1, 1), (2, 2)).toDF("a", "b"), col("a"), col("b"))
    }
    assert(e.getMessage.contains("off-diagonal"))
  }

  test("linCcc: identity -> 1, pure location shift closed form") {
    val xs = (1 to 100).map(_.toDouble)
    val same = xs.map(x => (x, x)).toDF("x", "y")
    val r1 = graft.ops.Agreement.linCcc(same, col("x"), col("y")).head()
    assert(math.abs(r1.getAs[Double]("ccc") - 1.0) < 1e-12)
    assert(math.abs(r1.getAs[Double]("pearson_r") - 1.0) < 1e-12)
    // y = x + c: r = 1, ccc = 2v/(2v + c^2) with v = var_pop(x)
    val c = 10.0
    val shifted = xs.map(x => (x, x + c)).toDF("x", "y")
    val r2 = graft.ops.Agreement.linCcc(shifted, col("x"), col("y")).head()
    val v = xs.map(x => math.pow(x - xs.sum / xs.size, 2)).sum / xs.size
    assert(math.abs(r2.getAs[Double]("ccc") - 2 * v / (2 * v + c * c)) < 1e-9)
    assert(math.abs(r2.getAs[Double]("pearson_r") - 1.0) < 1e-12)
    assert(math.abs(r2.getAs[Double]("location_shift") + c / math.sqrt(v)) < 1e-9)
  }

  test("brierDecomposition: Murphy identity equals the direct mean square") {
    val rows = (0 until 1000).map { i =>
      val f = (i % 10) * 0.1 + 0.05
      val y = if ((i * 13) % 100 < (i % 10) * 10 + 5) 1.0 else 0.0
      (y, f)
    }
    val df = rows.toDF("y", "f")
    val r = graft.ops.MlEval.brierDecomposition(df, col("y"), col("f")).head()
    val direct = rows.map { case (y, f) => (f - y) * (f - y) }.sum / rows.size
    assert(math.abs(r.getAs[Double]("brier") - direct) < 1e-12,
      s"${r.getAs[Double]("brier")} vs $direct")
    assert(r.getAs[Double]("reliability") >= 0 &&
      r.getAs[Double]("resolution") >= 0)
    val g = intercept[IllegalArgumentException] {
      graft.ops.MlEval.brierDecomposition(
        (1 to 50).map(i => (0.0, i / 100.0)).toDF("y", "f"),
        col("y"), col("f"), maxForecasts = 10)
    }
    assert(g.getMessage.contains("bucket"))
  }

  test("ndcg: hand case, perfect ranking, zero-relevance query") {
    val df = Seq(
      // query 1: scores rank items (2, 1, 3); rels 0, 3, 1
      (1, 1, 0.5, 3.0), (1, 2, 0.9, 0.0), (1, 3, 0.1, 1.0),
      // query 2: perfect ranking
      (2, 1, 0.9, 3.0), (2, 2, 0.5, 1.0),
      // query 3: nothing relevant
      (3, 1, 0.9, 0.0), (3, 2, 0.5, 0.0)).toDF("q", "item", "s", "rel")
    val out = graft.ops.MlEval.ndcg(df, col("q"), col("item"), col("s"),
      col("rel"), k = 10).collect().map(r =>
      r.getInt(0) -> (r.getAs[Double]("dcg"), r.getAs[Double]("idcg"),
        r.getAs[Double]("ndcg"))).toMap
    def lg2(x: Double) = math.log(x) / math.log(2)
    // q1 ranking by score desc: item2(rel 0) pos1, item1(rel 3) pos2,
    // item3(rel 1) pos3 -> dcg = 7/lg2(3) + 1/lg2(4); ideal: rel 3,1,0
    val dcg1 = 7.0 / lg2(3) + 1.0 / lg2(4)
    val idcg1 = 7.0 / lg2(2) + 1.0 / lg2(3)
    assert(math.abs(out(1)._1 - dcg1) < 1e-12)
    assert(math.abs(out(1)._2 - idcg1) < 1e-12)
    assert(math.abs(out(1)._3 - dcg1 / idcg1) < 1e-12)
    assert(math.abs(out(2)._3 - 1.0) < 1e-12) // perfect ranking
    assert(out(3)._3 == 0.0 && out(3)._2 == 0.0) // idcg = 0 -> ndcg 0
  }

  test("fleschReadingEase: hand sentence and clamps") {
    val df = Seq(
      ("The cat sat. The dog ran!", 1),
      ("", 2), // empty -> words 1, sentences 1, syll 1 -> clamp top
      ("zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz " * 40, 3)
    ).toDF("text", "id")
    val out = df.select(col("id"),
      graft.ops.TextOps.fleschReadingEase(col("text")).as("fre"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    // 6 words, 2 sentence runs, 6 vowel groups:
    // 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert(math.abs(out(1) - 119.19) < 1e-9, out(1).toString)
    assert(out(2) == 121.22 || math.abs(out(2) - 121.22) < 1e-9)
    // 560 no-vowel words, one implied sentence -> far below the clamp
    assert(out(3) == -200.0)
  }

  test("mannKendall: Var(S) matches exact permutation enumeration on ties") {
    // values with a tie group of 2 and one of 3: n = 7
    val vals = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 5.0, 5.0)
    def sOf(xs: Seq[Double]): Long = (for {
      i <- xs.indices; j <- i + 1 until xs.size
    } yield java.lang.Double.compare(xs(j), xs(i)).sign.toLong).sum
    // exact null: S over ALL 7! orderings; Var from the enumeration
    val perms = vals.permutations.toSeq
    val ss = perms.map(p => sOf(p).toDouble)
    val mean = ss.sum / ss.size
    val exactVar = ss.map(s => (s - mean) * (s - mean)).sum / ss.size
    // the op on a series carrying exactly these values
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("p", "v")
    val r = graft.ops.Drift.mannKendall(df, col("p"), col("v")).head()
    assert(math.abs(r.getAs[Double]("var_s") - exactVar) < 1e-9,
      s"formula ${r.getAs[Double]("var_s")} vs enumerated $exactVar")
    assert(r.getAs[Long]("s") == sOf(vals))
    // strictly increasing series: S = n(n-1)/2, p tiny
    val inc = (1 to 12).map(i => (i.toLong, i.toDouble)).toDF("p", "v")
    val ri = graft.ops.Drift.mannKendall(inc, col("p"), col("v")).head()
    assert(ri.getAs[Long]("s") == 66L)
    assert(ri.getAs[Double]("p_value") < 0.01)
    val g = intercept[IllegalArgumentException] {
      graft.ops.Drift.mannKendall(inc, col("p"), col("v"), maxPeriods = 5)
    }
    assert(g.getMessage.contains("maxPeriods") ||
      g.getMessage.contains("coarsen"))
  }

  test("distinctN: hand corpus, short docs, ratio bounds") {
    val docs = Seq("a b a b", "a b", "c").toDF("text")
    val out = graft.ops.TextOps.distinctN(docs, col("text"))
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // 1-grams: a b a b a b c -> 7 total, 3 distinct
    assert(out(1) == ((7L, 3L, 3.0 / 7)))
    // 2-grams: "a b","b a","a b" + "a b" -> 4 total, 2 distinct
    // (doc "c" is shorter than 2 and contributes nothing)
    assert(out(2) == ((4L, 2L, 0.5)))
    // 3-grams: "a b a","b a b" -> 2 total, 2 distinct
    assert(out(3) == ((2L, 2L, 1.0)))
  }

  test("semanticDedup: probes bounds validated, maxBucket guard names probes") {
    val df = boundaryFixture
    val e = intercept[IllegalArgumentException] {
      graft.ops.Dedup.semanticDedup(df, col("id"), col("v"), k = 4,
        probes = 5)
    }
    assert(e.getMessage.contains("probes"), e.getMessage)
    val g = intercept[IllegalArgumentException] {
      graft.ops.Dedup.semanticDedup(df, col("id"), col("v"), k = 4,
        threshold = 0.95, iters = 1, maxBucket = 10, probes = 2)
    }
    assert(g.getMessage.contains("maxBucket") &&
      g.getMessage.contains("probes"), g.getMessage)
  }

  // ------------------------------------------------------------ poisson

  test("poissonIrls: binary covariate lands on the closed-form MLE") {
    // y depends on t only through cell membership -> MLE is the log of
    // the cell means; se1 = sqrt(1/S0 + 1/S1), se0 = sqrt(1/S0)
    val rows = (0 until 2000).map(i => ((i % 5).toDouble, i % 2))
    val df = rows.toDF("y", "x")
    val fit = graft.ops.MlWrappers.poissonIrls(df, col("y"), Seq(col("x")))
    val (m0, m1) = (2.0, 2.0) // i%5 means by parity over a full cycle
    val (s0, s1) = (1000 * m0, 1000 * m1)
    assert(fit.converged)
    assert(math.abs(fit.intercept - math.log(m0)) < 1e-8)
    assert(math.abs(fit.coefficients(0) - math.log(m1 / m0)) < 1e-8)
    assert(math.abs(fit.stderr(0) - math.sqrt(1 / s0 + 1 / s1)) < 1e-8)
    assert(math.abs(fit.interceptStderr - math.sqrt(1 / s0)) < 1e-8)
  }

  test("poissonIrls: multi-covariate score equations vanish at the optimum") {
    val rows = (0 until 3000).map { i =>
      val x1 = (i % 3).toDouble; val x2 = (i % 7) / 7.0
      // deterministic counts loosely tied to the covariates
      val y = ((i * 13) % 5 + x1).toDouble
      (y, x1, x2)
    }
    val df = rows.toDF("y", "x1", "x2")
    val fit = graft.ops.MlWrappers.poissonIrls(df, col("y"),
      Seq(col("x1"), col("x2")))
    assert(fit.converged)
    // Poisson MLE first-order conditions: sum (y - mu) * x_j == 0
    val b = fit.coefficients
    val resid = rows.map { case (y, x1, x2) =>
      val mu = math.exp(b(0) * x1 + b(1) * x2 + fit.intercept)
      (y - mu, x1, x2)
    }
    val scale = rows.map(_._1).sum
    assert(math.abs(resid.map(_._1).sum) / scale < 1e-6)
    assert(math.abs(resid.map(r => r._1 * r._2).sum) / scale < 1e-6)
    assert(math.abs(resid.map(r => r._1 * r._3).sum) / scale < 1e-6)
    assert(fit.dispersion > 0)
  }

  test("poissonIrls: all-zero outcome raises a named error") {
    val df = Seq((0.0, 1), (0.0, 0), (0.0, 1), (0.0, 0)).toDF("y", "x")
    val e = intercept[IllegalArgumentException] {
      graft.ops.MlWrappers.poissonIrls(df, col("y"), Seq(col("x")))
    }
    assert(e.getMessage.contains("all-zero"), e.getMessage)
  }

  // ------------------------------------------------------------ c-index

  test("concordanceIndex: Fenwick sweep matches all-pairs enumeration") {
    val rows = (0 until 120).map { i =>
      ((i % 8).toDouble, i % 2, ((i * 37) % 11).toDouble)
    }
    val df = rows.toDF("t", "e", "s")
    // first-principles pair count (the definition, not the algorithm)
    var conc = 0L; var tied = 0L; var disc = 0L
    for ((ti, ei, si) <- rows; (tj, _, sj) <- rows) {
      val comparable = ei == 1 && ti < tj
      if (comparable) {
        if (si > sj) conc += 1 else if (si == sj) tied += 1 else disc += 1
      }
    }
    // same-time event-vs-censored pairs
    for ((ti, ei, si) <- rows; (tj, ej, sj) <- rows
         if ei == 1 && ej == 0 && ti == tj) {
      if (si > sj) conc += 1 else if (si == sj) tied += 1 else disc += 1
    }
    val r = graft.ops.Survival.concordanceIndex(df, col("t"), col("e"),
      col("s")).head()
    assert(r.getAs[Long]("concordant") == conc)
    assert(r.getAs[Long]("tied_score") == tied)
    assert(r.getAs[Long]("discordant") == disc)
    val expC = (conc + 0.5 * tied) / (conc + tied + disc)
    assert(math.abs(r.getAs[Double]("c_index") - expC) < 1e-12)
  }

  test("concordanceIndex: perfect and anti-perfect scores; maxCells guard") {
    // all events, distinct times, score == -time (higher risk earlier)
    val perfect = (1 to 20).map(i => (i.toDouble, 1, -i.toDouble))
      .toDF("t", "e", "s")
    assert(graft.ops.Survival.concordanceIndex(perfect, col("t"), col("e"),
      col("s")).head().getAs[Double]("c_index") == 1.0)
    val anti = (1 to 20).map(i => (i.toDouble, 1, i.toDouble))
      .toDF("t", "e", "s")
    assert(graft.ops.Survival.concordanceIndex(anti, col("t"), col("e"),
      col("s")).head().getAs[Double]("c_index") == 0.0)
    val e = intercept[IllegalArgumentException] {
      graft.ops.Survival.concordanceIndex(perfect, col("t"), col("e"),
        col("s"), maxCells = 5)
    }
    assert(e.getMessage.contains("maxCells"), e.getMessage)
  }

  // ------------------------------------------------------- krippendorff

  test("krippendorffAlpha matches first-principles pair enumeration") {
    val ratings = Seq(
      (0, "a"), (0, "a"), (0, "b"),
      (1, "b"), (1, "b"),
      (2, "a"), // single rating: dropped by definition
      (3, "a"), (3, "b"), (3, "b"), (3, "c"),
      (4, "c"), (4, "c"), (4, "c"))
    val df = ratings.toDF("u", "v")
    // definition: weighted within-unit disagreeing pairs / expectation
    val kept = ratings.groupBy(_._1).filter(_._2.length >= 2)
    val n = kept.values.map(_.length).sum.toDouble
    var dis = 0.0
    kept.values.foreach { rs =>
      val m = rs.length
      for (i <- rs.indices; j <- rs.indices if i != j)
        if (rs(i)._2 != rs(j)._2) dis += 1.0 / (m - 1)
    }
    val dO = dis / n
    val marg = kept.values.flatten.groupBy(_._2).view.mapValues(_.size).toMap
    val dE = 1.0 - marg.values.map(c => c.toDouble * (c - 1)).sum / (n * (n - 1))
    val expAlpha = 1.0 - dO / dE
    val r = graft.ops.Agreement.krippendorffAlpha(df, col("u"), col("v"))
      .head()
    assert(r.getAs[Long]("units") == 4) // unit 2 dropped
    assert(r.getAs[Long]("n") == n.toLong)
    assert(math.abs(r.getAs[Double]("d_o") - dO) < 1e-12)
    assert(math.abs(r.getAs[Double]("d_e") - dE) < 1e-12)
    assert(math.abs(r.getAs[Double]("alpha") - expAlpha) < 1e-12)
    // perfect agreement -> alpha == 1 exactly (d_o == 0)
    val perf = Seq((0, "x"), (0, "x"), (1, "y"), (1, "y")).toDF("u", "v")
    assert(graft.ops.Agreement.krippendorffAlpha(perf, col("u"), col("v"))
      .head().getAs[Double]("alpha") == 1.0)
  }

  // ----------------------------------------------------- retrieval eval

  test("retrievalEval: hand fixture, zero-relevant queries excluded") {
    val df = Seq(
      // q1: rel at pos 3 of 4
      (1, 10, 4.0, 0), (1, 11, 3.0, 0), (1, 12, 2.0, 1), (1, 13, 1.0, 0),
      // q2: rel at pos 1
      (2, 20, 9.0, 1), (2, 21, 8.0, 0),
      // q3: no relevant item
      (3, 30, 5.0, 0), (3, 31, 4.0, 0)
    ).toDF("q", "i", "s", "r")
    val r = graft.ops.MlEval.retrievalEval(df, col("q"), col("i"), col("s"),
      col("r"), k = 2).head()
    assert(r.getAs[Long]("n_queries") == 3)
    assert(r.getAs[Long]("n_scored") == 2)
    assert(math.abs(r.getAs[Double]("mrr") - (1.0 / 3 + 1.0) / 2) < 1e-12)
    assert(math.abs(r.getAs[Double]("recall_at_k") - 0.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("precision_at_k") - 0.25) < 1e-12)
    assert(math.abs(r.getAs[Double]("hit_rate_at_k") - 0.5) < 1e-12)
  }

  // ------------------------------------------------------ dagostino k2

  test("dagostinoK2: exact zero skew-z on a symmetric fixture; guards") {
    val df = (0 until 20).flatMap(_ => Seq(-2.0, -1.0, 0.0, 1.0, 2.0))
      .toDF("x")
    val r = graft.ops.SimpleTests.dagostinoK2(df, col("x")).head()
    assert(r.getAs[Double]("skewness") == 0.0)
    assert(r.getAs[Double]("z_skew") == 0.0)
    // light-tailed (platykurtic) fixture -> negative kurtosis z
    assert(r.getAs[Double]("z_kurt") < 0.0)
    assert(r.getAs[Double]("k2") ==
      r.getAs[Double]("z_kurt") * r.getAs[Double]("z_kurt"))
    val small = (0 until 10).map(_.toDouble).toDF("x")
    val e = intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.dagostinoK2(small, col("x"))
    }
    assert(e.getMessage.contains("20"), e.getMessage)
    // heavy right tail -> positive skew z
    val skewed = ((0 until 90).map(_ => 1.0) ++ (0 until 10).map(_ => 50.0))
      .toDF("x")
    assert(graft.ops.SimpleTests.dagostinoK2(skewed, col("x")).head()
      .getAs[Double]("z_skew") > 2.0)
  }

  // ---------------------------------------------------------- win ratio

  test("winRatio: matches pair enumeration; ties cascade to outcome 2") {
    val rows = (0 until 40).map { i =>
      (i % 2, (i % 5).toDouble, ((i * 7) % 11).toDouble)
    }
    val df = rows.toDF("t", "o1", "o2")
    val treat = rows.filter(_._1 == 1); val ctrl = rows.filter(_._1 == 0)
    var w = 0L; var l = 0L; var tie = 0L
    for ((_, a1, a2) <- treat; (_, b1, b2) <- ctrl) {
      if (a1 > b1) w += 1 else if (a1 < b1) l += 1
      else if (a2 > b2) w += 1 else if (a2 < b2) l += 1 else tie += 1
    }
    val r = graft.ops.SimpleTests.winRatio(df, col("t"),
      Seq(col("o1"), col("o2"))).head()
    assert(r.getAs[Long]("wins") == w)
    assert(r.getAs[Long]("losses") == l)
    assert(r.getAs[Long]("ties") == tie)
    assert(math.abs(r.getAs[Double]("win_ratio") - w.toDouble / l) < 1e-12)
    // guard BEFORE expansion
    val e = intercept[IllegalArgumentException] {
      graft.ops.SimpleTests.winRatio(df, col("t"), Seq(col("o1")),
        maxPairs = 10)
    }
    assert(e.getMessage.contains("maxPairs"), e.getMessage)
    // higherWins = false flips wins and losses exactly
    val f = graft.ops.SimpleTests.winRatio(df, col("t"),
      Seq(col("o1"), col("o2")), higherWins = false).head()
    assert(f.getAs[Long]("wins") == l && f.getAs[Long]("losses") == w)
  }

  // ------------------------------------------------------- streaming ph

  test("streamingPageHinkley agrees with the batch op on closed periods") {
    import spark.implicits._
    // 12 periods x 10 events, +4 planted from period 8 on
    val rows = (0 until 120).map { i =>
      val p = i / 10
      ("m1", p.toLong, (i % 5).toDouble + (if (p >= 8) 4.0 else 0.0))
    }
    val batch = graft.ops.Drift.pageHinkley(
      rows.toDF("m", "period", "v"), col("period"), col("v"),
      lambda = 2.0, delta = 0.1)
      .collect().map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    // streaming over the same events in one MemoryStream batch
    implicit val sqlCtx = spark.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[graft.streaming.StreamOps.EwmaEvent]
    ms.addData(rows.map(r =>
      graft.streaming.StreamOps.EwmaEvent(r._1, r._2, r._3)): _*)
    val out = graft.streaming.StreamOps.streamingPageHinkley(
      ms.toDS(), lambda = 2.0, delta = 0.1)
    val sink = "ph_spec_sink"
    spark.catalog.dropTempView(sink)
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("update").start()
    val stream = try {
      q.processAllAvailable()
      spark.table(sink)
        .collect().map(r => r.getAs[Long]("period") ->
          (r.getAs[Double]("ph"), r.getAs[Boolean]("isAlarm"))).toMap
    } finally q.stop()
    // streaming closes periods 0..10 (11 stays open); batch has all 12
    assert(stream.keySet == (0L to 10L).toSet)
    stream.foreach { case (p, (ph, alarm)) =>
      assert(math.abs(ph - batch(p)._1) < 1e-9, s"period $p")
      assert(alarm == batch(p)._2, s"period $p alarm")
    }
    // the planted jump alarms
    assert(stream(9L)._2 || stream(10L)._2, "planted +4 jump never alarmed")
  }

  // ------------------------------------------------------------- adf

  test("adfTest: lags=1 fit matches commons-math OLS; white noise rejects") {
    import spark.implicits._
    val series = (0 until 150).map(p =>
      (p.toLong, ((p * 29) % 13).toDouble)) // bounded noise: stationary
    val df = series.toDF("period", "v")
    val r = graft.ops.Regression.adfTest(df, col("period"), col("v"),
      lags = 1).head()
    // independent fit: commons-math on the same differenced/lagged design
    val y = series.map(_._2).toArray
    val dy = y.indices.drop(1).map(t => y(t) - y(t - 1))
    val rowsUsed = (2 until y.length).map { t =>
      (dy(t - 1), Array(y(t - 1), dy(t - 2)))
    }
    val reg = new org.apache.commons.math3.stat.regression
      .OLSMultipleLinearRegression()
    reg.newSampleData(rowsUsed.map(_._1).toArray,
      rowsUsed.map(_._2).toArray)
    val beta = reg.estimateRegressionParameters() // intercept first
    val se = reg.estimateRegressionParametersStandardErrors()
    assert(math.abs(r.getAs[Double]("beta") - beta(1)) < 1e-8)
    assert(math.abs(r.getAs[Double]("se") - se(1)) < 1e-8)
    assert(r.getAs[Long]("n_used") == rowsUsed.length)
    assert(r.getAs[Boolean]("stationary_5pct"),
      s"white noise must reject the unit root, stat ${r.getAs[Double]("adf_stat")}")
    // a (deterministic) random walk must NOT reject: ±1 steps from an
    // LCG sign bit (seed 42 walks to ADF ≈ −1.7, well inside the
    // non-rejection region; a multiplicative-hash parity walk here was
    // anti-correlated and mean-reverted at −10)
    var acc = 0.0
    var lcgState = 42L
    val walk = (0 until 150).map { p =>
      lcgState = lcgState * 6364136223846793005L + 1442695040888963407L
      acc += (if (lcgState < 0) 1.0 else -1.0)
      (p.toLong, acc)
    }
    val rw = graft.ops.Regression.adfTest(walk.toDF("period", "v"),
      col("period"), col("v"), lags = 1).head()
    assert(!rw.getAs[Boolean]("stationary_5pct"),
      s"random walk rejected: stat ${rw.getAs[Double]("adf_stat")}")
  }

  // ------------------------------------------------------------- mmr

  test("mmrSelect: hand fixture — relevance vs diversity trade") {
    import spark.implicits._
    // two near-identical high-relevance vectors + one orthogonal lower-rel
    val df = Seq(
      (1L, Seq(1.0, 0.0), 1.0),
      (2L, Seq(0.999, 0.04), 0.95), // near-dup of 1, high rel
      (3L, Seq(0.0, 1.0), 0.5)      // orthogonal, lower rel
    ).toDF("id", "v", "rel")
      .withColumn("v", col("v").cast("array<double>"))
    // lambda 0.5: pick 1 first (rel 1.0); then 3 beats 2 because 2's
    // similarity ~1 wipes its relevance edge
    val picks = graft.ops.Ann.mmrSelect(df, col("id"), col("v"), col("rel"),
      k = 3, lambda = 0.5).select("rank", "id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(picks(1) == 1L && picks(2) == 3L && picks(3) == 2L, picks.toString)
    // lambda 1.0 is pure relevance order
    val pure = graft.ops.Ann.mmrSelect(df, col("id"), col("v"), col("rel"),
      k = 3, lambda = 1.0).select("rank", "id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(pure(1) == 1L && pure(2) == 2L && pure(3) == 3L)
    // k > candidates returns all candidates, ranked
    assert(graft.ops.Ann.mmrSelect(df, col("id"), col("v"), col("rel"),
      k = 10, lambda = 0.5).count() == 3)
  }

  // --------------------------------------------------------- chow / bp

  test("chowTest: identical regimes -> F ~ 0; planted slope break rejects") {
    import spark.implicits._
    // 420 = lcm(20, 7, 2) * 3: noise and x perfectly balanced per regime
    val same = (0 until 420).map { i =>
      val x = (i % 20).toDouble
      (2.0 * x + (i % 7) - 3.0, x, i % 2)
    }.toDF("y", "x", "g")
    val rSame = graft.ops.Regression.chowTest(same, col("y"),
      Seq(col("x")), col("g")).head()
    assert(rSame.getAs[Double]("p_value") > 0.01, rSame.toString)
    val break_ = (0 until 420).map { i =>
      val x = (i % 20).toDouble
      val slope = if (i % 2 == 1) 5.0 else 2.0
      (slope * x + (i % 7) - 3.0, x, i % 2)
    }.toDF("y", "x", "g")
    val rBreak = graft.ops.Regression.chowTest(break_, col("y"),
      Seq(col("x")), col("g")).head()
    assert(rBreak.getAs[Double]("f_stat") > 100.0, rBreak.toString)
    assert(rBreak.getAs[Double]("p_value") < 1e-6)
    // SSE identity: pooled >= sum of parts (the restriction only costs)
    assert(rBreak.getAs[Double]("sse_pooled") >=
      rBreak.getAs[Double]("sse1") + rBreak.getAs[Double]("sse0") - 1e-6)
    val e = intercept[IllegalArgumentException] {
      graft.ops.Regression.chowTest(
        Seq((1.0, 1.0, 2)).toDF("y", "x", "g"), col("y"), Seq(col("x")),
        col("g"))
    }
    assert(e.getMessage.contains("0/1"), e.getMessage)
  }

  test("breuschPagan: homoskedastic accepts, fanning residuals reject") {
    import spark.implicits._
    // 550 = 2 * lcm(25, 11): the noise lattice is exactly balanced
    // against x, so the aux r2 is ~0 by construction, not by luck
    val homo = (0 until 550).map { i =>
      val x = (i % 25).toDouble
      (3.0 * x + ((i * 13) % 11) - 5.0, x)
    }.toDF("y", "x")
    val rH = graft.ops.Regression.breuschPagan(homo, col("y"),
      Seq(col("x"))).head()
    assert(rH.getAs[Double]("p_value") > 0.01, rH.toString)
    val hetero = (0 until 550).map { i =>
      val x = (i % 25).toDouble
      (3.0 * x + x * (((i * 13) % 11) - 5.0), x) // spread grows with x
    }.toDF("y", "x")
    val rX = graft.ops.Regression.breuschPagan(hetero, col("y"),
      Seq(col("x"))).head()
    assert(rX.getAs[Double]("p_value") < 1e-4, rX.toString)
    assert(rX.getAs[Double]("lm") > rH.getAs[Double]("lm"))
  }

  // -------------------------------------------------------- k-anonymity

  test("kAnonymity: hand classes, null is its own class, guards") {
    import spark.implicits._
    val df = Seq(
      ("a", 1), ("a", 1), ("a", 1),          // class of 3
      ("b", 1), ("b", 1),                    // class of 2
      ("c", 2),                              // singleton -> violates
      (null.asInstanceOf[String], 2), (null.asInstanceOf[String], 2)
    ).toDF("seg", "code")
    val r = graft.ops.Explore.kAnonymity(df,
      Seq(col("seg"), col("code")), k = 2).head()
    assert(r.getAs[Long]("n") == 8)
    assert(r.getAs[Long]("classes") == 4) // null pair is its own class
    assert(r.getAs[Long]("min_class_size") == 1)
    assert(r.getAs[Long]("violating_classes") == 1)
    assert(r.getAs[Long]("violating_rows") == 1)
    assert(!r.getAs[Boolean]("k_anonymous"))
    val ok = graft.ops.Explore.kAnonymity(df.filter(col("seg") =!= "c"),
      Seq(col("seg"), col("code")), k = 2).head()
    assert(ok.getAs[Boolean]("k_anonymous"))
  }

  // ------------------------------------------------------------- mmd

  test("mmdRff: same distribution ~ 0, shifted distribution separates") {
    import spark.implicits._
    def blob(n: Int, shift: Double, g: Int) = (0 until n).map { i =>
      (g, Seq((i % 7).toDouble + shift, ((i * 3) % 5).toDouble - shift,
        (i % 4).toDouble))
    }
    val same = (blob(200, 0.0, 1) ++ blob(200, 0.0, 0))
      .toDF("g", "v").withColumn("v", col("v").cast("array<double>"))
    val mSame = graft.ops.Drift.mmdRff(same, col("g"), col("v"),
      features = 64, gamma = 0.05).head().getAs[Double]("mmd2")
    val far = (blob(200, 0.0, 1) ++ blob(200, 3.0, 0))
      .toDF("g", "v").withColumn("v", col("v").cast("array<double>"))
    val mFar = graft.ops.Drift.mmdRff(far, col("g"), col("v"),
      features = 64, gamma = 0.05).head().getAs[Double]("mmd2")
    // identical empirical distributions -> exactly equal feature means
    assert(mSame < 1e-20, s"same-dist mmd2 $mSame")
    assert(mFar > 1e-3, s"shifted mmd2 $mFar")
    // the W matrix is pure (f, d) arithmetic: re-derive one entry by hand
    val m = 1048576L
    val u1 = ((3 * 2654435761L + 2 * 40503L + 17L) % m + 1).toDouble / (m + 1)
    val u2 = ((3 * 1099087573L + 2 * 2654435761L + 31L) % m + 1).toDouble / (m + 1)
    val w32 = math.sqrt(-2 * math.log(u1)) * math.cos(2 * math.Pi * u2) *
      math.sqrt(2 * 0.05)
    assert(graft.ops.Drift.rffW(3, 2, 0.05) == w32)
  }

  // ------------------------------------------------- cochran-armitage

  test("cochranArmitage: closed form by enumeration; flat rate ~ 0") {
    import spark.implicits._
    val rows = (0 until 400).map { i =>
      val dose = (i % 4).toDouble
      (dose, if (i % 100 < 30 + 10 * (i % 4)) 1 else 0)
    }
    val df = rows.toDF("dose", "y")
    val r = graft.ops.Contingency.cochranArmitage(df, col("dose"),
      col("y")).head()
    // enumerate the definition directly
    val byDose = rows.groupBy(_._1)
    val n = rows.length.toDouble
    val pBar = rows.map(_._2).sum / n
    val snw = byDose.map { case (w, rs) => rs.length * w }.sum
    val snw2 = byDose.map { case (w, rs) => rs.length * w * w }.sum
    val srw = byDose.map { case (w, rs) => rs.map(_._2).sum * w }.sum
    val t = srw - pBar * snw
    val v = pBar * (1 - pBar) * (snw2 - snw * snw / n)
    assert(math.abs(r.getAs[Double]("t") - t) < 1e-9)
    assert(math.abs(r.getAs[Double]("var_t") - v) < 1e-9)
    assert(math.abs(r.getAs[Double]("z") - t / math.sqrt(v)) < 1e-9)
    assert(r.getAs[Double]("p_value") < 1e-3, "planted trend must reject")
    // flat rate: y alternates by BLOCK of 4 so each dose sees exactly
    // half successes -> t exactly 0 (i % 2 would alias dose parity)
    val flat = (0 until 400).map { i =>
      ((i % 4).toDouble, if ((i / 4) % 2 == 0) 1 else 0)
    }.toDF("dose", "y")
    val rf = graft.ops.Contingency.cochranArmitage(flat, col("dose"),
      col("y")).head()
    assert(rf.getAs[Double]("t") == 0.0)
    val e = intercept[IllegalArgumentException] {
      graft.ops.Contingency.cochranArmitage(
        Seq((1.0, 2)).toDF("dose", "y"), col("dose"), col("y"))
    }
    assert(e.getMessage.contains("{0, 1}"), e.getMessage)
  }

  // ---------------------------------------------------------- auc ci

  test("aucCi: DeLong variance matches per-sample enumeration") {
    import spark.implicits._
    val rows = (0 until 200).map { i =>
      val y = if (i % 3 == 0) 1 else 0
      (y, ((i * 7) % 23).toDouble + (if (y == 1) 5.0 else 0.0))
    }
    val df = rows.toDF("y", "s")
    val r = graft.ops.MlEval.aucCi(df, col("y"), col("s")).head()
    // brute-force placement values
    val pos = rows.filter(_._1 == 1).map(_._2)
    val neg = rows.filter(_._1 == 0).map(_._2)
    def v10(x: Double) =
      neg.map(yj => if (x > yj) 1.0 else if (x == yj) 0.5 else 0.0).sum / neg.length
    def v01(yj: Double) =
      pos.map(x => if (x > yj) 1.0 else if (x == yj) 0.5 else 0.0).sum / pos.length
    val vs10 = pos.map(v10); val vs01 = neg.map(v01)
    val auc = vs10.sum / pos.length
    def svar(xs: Seq[Double]) =
      xs.map(v => (v - auc) * (v - auc)).sum / (xs.length - 1)
    val se = math.sqrt(svar(vs10) / pos.length + svar(vs01) / neg.length)
    assert(math.abs(r.getAs[Double]("auc") - auc) < 1e-12,
      s"auc ${r.getAs[Double]("auc")} vs $auc")
    assert(math.abs(r.getAs[Double]("se") - se) < 1e-12,
      s"se ${r.getAs[Double]("se")} vs $se")
    // matches the point-estimate op and brackets it
    val point = graft.ops.MlWrappers.auc(df, col("s"), col("y"))
    assert(math.abs(point - auc) < 1e-12)
    assert(r.getAs[Double]("ci_low") < auc && auc < r.getAs[Double]("ci_high"))
  }

  // ------------------------------------------------------------- g-test

  test("gTest: hand 2x2 closed form; independent lattice ~ 0; sparse-safe") {
    import spark.implicits._
    // 2x2 with counts 30/10/10/30
    val rows = Seq.fill(30)(("x", "u")) ++ Seq.fill(10)(("x", "v")) ++
      Seq.fill(10)(("y", "u")) ++ Seq.fill(30)(("y", "v"))
    val r = graft.ops.SimpleTests.gTest(rows.toDF("a", "b"), col("a"),
      col("b")).head()
    // closed form: 2 sum O ln(O/E), E = 20 everywhere
    val exp = 2.0 * (30 * math.log(30.0 / 20) * 2 + 10 * math.log(10.0 / 20) * 2)
    assert(math.abs(r.getAs[Double]("g2") - exp) < 1e-10)
    assert(r.getAs[Long]("dof") == 1)
    assert(r.getAs[Double]("p_value") < 1e-4)
    // exactly independent lattice -> G2 exactly 0
    val ind = (0 until 120).map(i => ((i % 2).toString, (i % 3).toString))
      .toDF("a", "b")
    val ri = graft.ops.SimpleTests.gTest(ind, col("a"), col("b")).head()
    assert(math.abs(ri.getAs[Double]("g2")) < 1e-10)
    // a structurally-zero cell must not NaN the statistic
    val sparse = (Seq.fill(20)(("x", "u")) ++ Seq.fill(20)(("y", "v")) ++
      Seq.fill(1)(("x", "v"))).toDF("a", "b")
    val rs = graft.ops.SimpleTests.gTest(sparse, col("a"), col("b")).head()
    assert(!rs.getAs[Double]("g2").isNaN && rs.getAs[Double]("g2") > 0)
  }

  // ----------------------------------------------------------- pagerank

  test("pageRank: 2-cycle is uniform; dangling mass redistributes; sum==1") {
    val cycle = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val r = graft.ops.Graph.pageRank(cycle, col("s"), col("d"),
        iterations = 7)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.5) < 1e-12 && math.abs(r(2L) - 0.5) < 1e-12)
    // hand-computed single iteration with a dangling node:
    // A -> B, B dangling; r0 = (.5, .5), D = .5
    // rA = .15/2 + .85*(0 + .25) = .2875 ; rB = .075 + .85*(.5 + .25)
    val dang = Seq((1L, 2L)).toDF("s", "d")
    val r1 = graft.ops.Graph.pageRank(dang, col("s"), col("d"),
        iterations = 1)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r1(1L) - 0.2875) < 1e-12)
    assert(math.abs(r1(2L) - 0.7125) < 1e-12)
    // rank mass conserved on a bigger graph
    val edges = (0 until 300).map(i => (i % 30, (i * 11 + 5) % 30))
      .toDF("s", "d")
    val total = graft.ops.Graph.pageRank(edges, col("s"), col("d"),
      iterations = 10).agg(sum(col("rank"))).head().getDouble(0)
    assert(math.abs(total - 1.0) < 1e-9)
  }

  test("pageRank: driver power-iteration equals the distributed loop") {
    // functional graph with dangling nodes and parallel-edge collapse —
    // the r18 fast path (collected arrays) must match the distributed
    // rounds (forced via maxLocalEdges = 0) far below the oracle's 8dp
    val edges = ((0 until 400).map(i => ((i * 3) % 40L, (i * 7 + 3) % 50L))
      ++ Seq((60L, 61L))).toDF("s", "d") // 61 and the 40..49 sinks dangle
    val fast = graft.ops.Graph.pageRank(edges, col("s"), col("d"),
        iterations = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val slow = graft.ops.Graph.pageRank(edges, col("s"), col("d"),
        iterations = 10, maxLocalEdges = 0)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(fast.keySet == slow.keySet)
    fast.foreach { case (k, v) => assert(math.abs(v - slow(k)) < 1e-12) }
  }
}
