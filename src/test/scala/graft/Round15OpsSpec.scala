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
}
