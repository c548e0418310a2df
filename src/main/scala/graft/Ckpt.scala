package graft

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Session-scoped registry for `localCheckpoint` storage.
  *
  * Several operators checkpoint an intermediate (or their output) so a
  * row-scale scan runs exactly once — but a local checkpoint pins executor
  * storage blocks for the RDD's lifetime, and in a long-lived session
  * (gateway service, benchmark harness, notebook) dozens of such blocks
  * accumulate and evict/pressure execution memory long after their query
  * finished. Operators therefore route every checkpoint through
  * [[Ckpt.checkpoint]]; harness layers that know a query boundary
  * (Verify / Bench / gateway callers) call [[Ckpt.releaseAll]] once the
  * query's output is materialized.
  *
  * Contract: after `releaseAll()`, previously returned frames must NOT be
  * re-computed (a local checkpoint is unrecoverable once unpersisted — the
  * same contract `localCheckpoint` itself has under executor loss). Release
  * only at a boundary where the prior query's frames are dead.
  */
object Ckpt {
  private val live = scala.collection.mutable.ArrayBuffer.empty[Dataset[_]]

  /** `df.localCheckpoint(eager)` + register for later [[releaseAll]]. */
  def checkpoint(df: DataFrame, eager: Boolean = false): DataFrame =
    register(df.localCheckpoint(eager))

  /** Track an already-checkpointed frame. */
  def register[T <: Dataset[_]](df: T): T = {
    synchronized { live += df }
    df
  }

  /** Unpersist the storage behind one frame immediately — for operators
    * whose consumer is materialized in-op. Handles BOTH forms a graft op
    * uses: a CacheManager-level `.persist()` (plain no-op when the frame
    * was never cached) and a `localCheckpoint`'s pinned RDD blocks. */
  def release(df: Dataset[_]): Unit = {
    df.unpersist(blocking = false)
    df match {
      case d: org.apache.spark.sql.classic.Dataset[_] =>
        org.apache.spark.sql.graftbridge.ColumnBridge.unpersistCheckpoint(d)
      case _ => () // non-classic (e.g. Connect) frames: leave to GC
    }
  }

  /** Release every registered checkpoint (query boundary). */
  def releaseAll(): Unit = synchronized {
    live.foreach(release)
    live.clear()
  }

  /** Belt-and-braces query-boundary sweep: drop EVERY persisted RDD and
    * cached plan in the session. Only safe when nothing from the previous
    * query is still live (exactly the Bench/Verify inter-query state). */
  def sweep(spark: SparkSession): Unit = {
    releaseAll()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
    spark.catalog.clearCache()
  }

  /** Number of RDDs currently holding storage in the session — the spec
    * hook for asserting an operator left nothing behind. */
  def persistentRddCount(spark: SparkSession): Int =
    spark.sparkContext.getPersistentRDDs.size
}
