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

  /** k minhashes of a precomputed shingle array via double hashing
    * (Kirsch-Mitzenmacher): two string-hash passes produce (h1, h2) per
    * shingle, then minhash_i = min over shingles of h1 + i·h2 — arithmetic,
    * not k string hashes. */
  def minHashesFromShingles(sh: Column, numHashes: Int): Column = {
    // 30-bit masks keep h1 + i·h2 far from Long overflow (ANSI mode); the
    // mod-prime wraparound is essential — without it the min is dominated by
    // argmin(h2) for large i, correlating every coordinate
    val p = 2147483647L // 2^31 - 1
    val h1 = transform(sh, s => xxhash64(s).bitwiseAND(0x3FFFFFFFL))
    val h2 = transform(sh, s => xxhash64(s, lit(1)).bitwiseAND(0x3FFFFFFFL))
    array((0 until numHashes).map { i =>
      array_min(zip_with(h1, h2, (a, b) => pmod(a + lit(i.toLong) * b, lit(p))))
    }: _*)
  }

  /** MinHash+LSH candidate pairs: band the signature (bands × rowsPerBand =
    * numHashes), bucket-join on (band, band-hash), emit each colliding pair
    * once, then verify with exact n-gram Jaccard over the PRECOMPUTED
    * shingle sets. Returns (id_a, id_b, jaccard) with id_a < id_b and
    * jaccard >= threshold.
    *
    * Scale shape: shingles + signature are computed once and cached (a
    * self-join would otherwise recompute them per side); the only wide
    * exchange is the (band, bandhash) bucket join on small keys; work is
    * quadratic only within a bucket. Choose rows-per-band ≈
    * log(1/bands)/log(threshold): the default 96/16 (r=6) puts the LSH
    * S-curve midpoint at ~0.63, giving miss probability < 1e-5 at j=0.9
    * while keeping sub-threshold collisions (and thus verify cost) low. */
  def minHashLsh(df: DataFrame, id: Column, text: Column,
                 numHashes: Int = 96, bands: Int = 16, shingleN: Int = 3,
                 threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val withSh = df.select(id.cast("long").as("id"),
        TextOps.shingles(text, shingleN).as("sh"))
      .withColumn("sig", minHashesFromShingles(col("sh"), numHashes))
    withSh.persist()
    val banded = withSh.select(col("id"),
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
    // verify with exact Jaccard over cached shingle sets
    val sa = withSh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val sb = withSh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    val out = cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          greatest(size(array_union(col("sh_a"), col("sh_b"))), lit(1)).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    out
  }

  /** Rows to drop under MinHash dedup: from each connected candidate pair,
    * drop the larger id (union-find-free greedy — every duplicate cluster
    * keeps its minimum id; pairs are transitive enough at high thresholds). */
  def minHashDedup(df: DataFrame, id: Column, text: Column,
                   numHashes: Int = 96, bands: Int = 16, shingleN: Int = 3,
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
    base.persist() // simhash is 64 array-aggregates per row; never recompute
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
    withBucket.persist() // both sides of the pair join read this
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
