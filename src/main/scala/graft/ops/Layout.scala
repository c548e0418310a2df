package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout helpers for the shuffle-dominated operations at scale:
  * co-located (bucketed) joins and salted skew joins.
  *
  * At 100 TB the expensive part of a join is moving both sides; these
  * helpers encode the two standard layouts that avoid it. Bucketing writes
  * each side hash-partitioned by the join key into the catalog, so a later
  * equi-join on that key runs with NO Exchange on either side (asserted in
  * LayoutSpec by inspecting the physical plan). Salting breaks a hot key
  * across `salt` sub-partitions when the small side is replicable — the
  * manual form of what AQE's skew-join split does for sort-merge joins,
  * usable also where AQE cannot help (e.g. a skewed key feeding a
  * bucketed-table join or a window).
  */
object Layout {

  /** Write `df` into the session catalog bucketed (and optionally sorted)
    * by `key`: `buckets` files per partition hash-split on the key. Two
    * tables bucketed with the SAME key and count join shuffle-free. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
                    sortCols: Seq[String] = Seq.empty): Unit = {
    require(buckets > 0, "buckets must be positive")
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Equi-join two same-key bucketed catalog tables. With
    * `spark.sql.sources.bucketing.enabled` (default true) and matching
    * bucket counts the plan contains no shuffle on either side. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)

  /** Salted equi-join for a skewed LEFT side: rows get a deterministic salt
    * in [0, salt) (hash of the row id — layout-independent), the right side
    * is replicated `salt` times, and the join key becomes (key, salt) — a
    * hot key's rows spread over `salt` reducers instead of one. Result ==
    * `big.join(small, Seq(key), joinType)` for inner/left joins; the right
    * side must be small enough to replicate (it usually is — that is what
    * makes the key hot). `bigId` must identify rows stably (any column set;
    * content hash works). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salt: Int,
                 bigId: Seq[Column], joinType: String = "inner"): DataFrame = {
    require(salt > 1, "salt must be > 1 (1 is a plain join)")
    require(joinType == "inner" || joinType == "left" || joinType == "left_outer",
      "salted join supports inner/left joins (right/full would duplicate unmatched right rows)")
    val saltCol = pmod(xxhash64(bigId :+ lit(salt): _*), lit(salt.toLong))
    val b = big.withColumn("__salt", saltCol)
    val sm = small.withColumnRenamed(key, "__rkey")
      .withColumn("__salt", explode(sequence(lit(0L), lit(salt.toLong - 1))))
    b.join(sm, b(key) === sm("__rkey") && b("__salt") === sm("__salt"), joinType)
      .drop("__salt", "__rkey")
  }
}
