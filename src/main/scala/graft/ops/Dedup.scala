package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication for training-data pipelines: exact, MinHash+LSH, SimHash,
  * and embedding-cosine near-dup. Scale shape for all variants: shuffle is
  * keyed on a small fingerprint (never the document text beyond the first
  * pass), candidate verification touches only bucket-colliding pairs, and
  * every hash is a deterministic function of content + seed, so results are
  * identical on any partition layout.
  */
object Dedup {

  /** Exact dedup on normalized content: keeps the row with the smallest
    * `keep` key per fingerprint. Shuffles (fingerprint, keep) only. */
  def exactDedup(df: DataFrame, text: Column, keep: Column): DataFrame = {
    val w = Window.partitionBy(TextOps.contentFingerprint(text)).orderBy(keep)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** k seeded minhashes of the shingle set, as one array column.
    * minhash_i = min over shingles of xxhash64(shingle, i). */
  def minHashes(text: Column, numHashes: Int, shingleN: Int): Column = {
    val sh = TextOps.shingles(text, shingleN)
    val arr = (0 until numHashes).map { i =>
      array_min(transform(sh, s => xxhash64(s, lit(i))))
    }
    array(arr: _*)
  }

  /** MinHash+LSH candidate pairs: band the signature (bands × rowsPerBand =
    * numHashes), bucket-join on (band, band-hash), emit each colliding pair
    * once, then verify with exact n-gram Jaccard. Returns (id_a, id_b,
    * jaccard) with id_a < id_b and jaccard >= threshold.
    *
    * Scale: the only wide exchange is groupBy band-hash (small keys); the
    * per-bucket self-join is quadratic ONLY within a bucket, and
    * deduplicates candidates before the (text, text) verify join. */
  def minHashLsh(df: DataFrame, id: Column, text: Column,
                 numHashes: Int = 32, bands: Int = 8, shingleN: Int = 3,
                 threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val base = df.select(id.cast("long").as("id"), text.as("text"))
    val sig = base.withColumn("sig", minHashes(col("text"), numHashes, shingleN))
    val banded = sig.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",",
          transform(slice(col("sig"), b * rows + 1, lit(rows)), _.cast("string"))))))
        .as(Seq("band", "bandhash")))
    // candidate pairs from same (band, bandhash) buckets, deduped across bands
    val l = banded.as("l"); val r = banded.as("r")
    val cands = l.join(r,
        col("l.band") === col("r.band") && col("l.bandhash") === col("r.bandhash") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    // verify with exact Jaccard over the original texts
    val ta = base.select(col("id").as("id_a"), col("text").as("text_a"))
    val tb = base.select(col("id").as("id_b"), col("text").as("text_b"))
    cands.join(ta, "id_a").join(tb, "id_b")
      .withColumn("jaccard", TextOps.ngramJaccard(col("text_a"), col("text_b"), shingleN))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Rows to drop under MinHash dedup: from each connected candidate pair,
    * drop the larger id (union-find-free greedy — every duplicate cluster
    * keeps its minimum id; pairs are transitive enough at high thresholds). */
  def minHashDedup(df: DataFrame, id: Column, text: Column,
                   numHashes: Int = 32, bands: Int = 8, shingleN: Int = 3,
                   threshold: Double = 0.8): DataFrame = {
    val dupes = minHashLsh(df, id, text, numHashes, bands, shingleN, threshold)
      .select(col("id_b").as("__drop")).distinct()
    df.join(dupes, id.cast("long") === col("__drop"), "left_anti")
  }

  /** SimHash near-dup pairs: 64-bit fingerprints, candidates from matching
    * any of 4 16-bit chunks (catches all pairs within Hamming distance 3 by
    * pigeonhole when ≤ 3 chunks differ), verified by Hamming distance. */
  def simHashPairs(df: DataFrame, id: Column, text: Column,
                   maxHamming: Int = 3): DataFrame = {
    val base = df.select(id.cast("long").as("id"),
      TextOps.simHash(text).as("sh"))
    val chunked = base.select(col("id"), col("sh"),
      posexplode(array((0 until 4).map(c =>
        shiftrightunsigned(col("sh"), c * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk", "chunkval")))
    val l = chunked.as("l"); val r = chunked.as("r")
    l.join(r, col("l.chunk") === col("r.chunk") &&
        col("l.chunkval") === col("r.chunkval") && col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        TextOps.hammingDistance(col("l.sh"), col("r.sh")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Embedding near-dup pairs above a cosine threshold, with random-
    * hyperplane LSH prefilter: k sign-bits of seeded random projections
    * (deterministic per dim via xxhash64-derived pseudo-gaussians); pairs
    * must share a bit-prefix bucket before the exact cosine verify. For
    * recall ~1 at high thresholds use few bits; bits=0 is exact brute
    * force. */
  def embeddingNearDup(df: DataFrame, id: Column, embedding: Column,
                       threshold: Double = 0.95, bits: Int = 0): DataFrame = {
    val base = df.select(id.cast("long").as("id"),
      embedding.cast("array<double>").as("v"))
    val withBucket =
      if (bits == 0) base.withColumn("bucket", lit(0L))
      else {
        // pseudo-random hyperplane h_b[d] = centered hash of (b, d)
        val bucket = (0 until bits).map { b =>
          val dot = aggregate(
            zip_with(col("v"),
              transform(sequence(lit(0), size(col("v")) - 1),
                d => (pmod(xxhash64(lit(b), d), lit(1000000L)).cast("double") / 500000.0) - 1.0),
              (x, h) => x * h),
            lit(0.0), (acc, x) => acc + x)
          when(dot > 0, lit(1L << b)).otherwise(0L)
        }.reduce[Column]((a, c) => a.bitwiseOR(c))
        base.withColumn("bucket", bucket)
      }
    val l = withBucket.as("l"); val r = withBucket.as("r")
    val dot = aggregate(zip_with(col("l.v"), col("r.v"), (a, b) => a * b),
      lit(0.0), (acc, x) => acc + x)
    def norm(c: Column) = sqrt(aggregate(transform(c, x => x * x), lit(0.0), (a, x) => a + x))
    l.join(r, col("l.bucket") === col("r.bucket") && col("l.id") < col("r.id"))
      .withColumn("cosine", dot / (norm(col("l.v")) * norm(col("r.v"))))
      .filter(col("cosine") >= threshold)
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"), col("cosine"))
  }
}
