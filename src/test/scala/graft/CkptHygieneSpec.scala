package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The storage-hygiene contract: every operator that `localCheckpoint`s an
  * intermediate either releases it in-op (when its output is collected
  * in-op) or registers it with [[Ckpt]] so the query-boundary release
  * reclaims it — a long-lived session must not accumulate executor
  * storage from finished queries (the round-11 bench inflated 40% from
  * exactly that leak class). */
class CkptHygieneSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def cleanSlate(): Unit = {
    Ckpt.sweep(spark)
    assert(Ckpt.persistentRddCount(spark) == 0,
      s"pre-existing persisted RDDs: ${spark.sparkContext.getPersistentRDDs.keys}")
  }
  private def assertClean(label: String): Unit = {
    Ckpt.releaseAll()
    assert(Ckpt.persistentRddCount(spark) == 0,
      s"$label left persisted RDDs behind: " +
        spark.sparkContext.getPersistentRDDs.values.map(_.name).mkString(", "))
  }

  test("in-op-released operators leave zero storage WITHOUT any boundary call") {
    cleanSlate()
    // funnel: output is driver-built, checkpoint released in finally
    val ev = (1 to 300).flatMap { u =>
      Seq((u.toLong, 1.0, "a")) ++
        (if (u % 2 == 0) Seq((u.toLong, 2.0, "b")) else Nil)
    }.toDF("u", "ts", "e")
    graft.ops.Funnel.funnel(ev, $"u", $"ts", $"e", Seq("a", "b"), 10.0)
      .collect()
    assert(Ckpt.persistentRddCount(spark) == 0, "funnel leaked its checkpoint")
    // event study: output collected in-op to a LocalRelation, base released
    val panel = (for { u <- 0 until 40; t <- 1 to 5 } yield
      (u.toLong, if (u % 2 == 0) 0L else 3L, t.toLong,
        t * 1.0 + u % 3)).toDF("u", "g", "t", "y")
    graft.ops.EventStudy.groupTimeAtt(panel, $"g", $"t", $"y").collect()
    assert(Ckpt.persistentRddCount(spark) == 0, "event_study leaked its cells")
    graft.ops.EventStudy.groupTimeAtt(panel, $"g", $"t", $"y",
      unit = Some($"u")).collect()
    assert(Ckpt.persistentRddCount(spark) == 0,
      "event_study (unit mode) leaked its base")
  }

  test("registered checkpoints are reclaimed by the query-boundary release") {
    cleanSlate()
    // hamming pairs (base checkpoint) consumed to a small aggregate
    val hashed = (1L to 500L).map(i => (i, (i % 37) * 1024L)).toDF("id", "h")
    graft.ops.Dedup.hammingPairs(hashed, $"id", $"h", maxHamming = 1)
      .agg(count(lit(1))).collect()
    assertClean("hamming_pairs")
    // retention matrix (event checkpoint rides into the returned plan)
    val ev = (1 to 400).map(i => (i.toLong % 50, (i % 7).toDouble))
      .toDF("u", "ts")
    graft.ops.Funnel.retentionMatrix(ev, $"u", $"ts", 2.0).collect()
    assertClean("retention")
    // BH adjust (correctness checkpoint: physical partition ids)
    val ps = (1 to 200).map(i => (i.toLong, (i % 97) / 97.0)).toDF("id", "p")
    graft.ops.MultipleTesting.bhAdjust(ps, $"p").agg(count(lit(1))).collect()
    assertClean("fdr_bh")
    // grouped histogram (cell checkpoint)
    val xs = (1 to 300).map(i => (i % 3, i * 1.0)).toDF("g", "x")
    graft.ops.Explore.histogramBy(xs, $"g", $"x", bins = 5).collect()
    assertClean("histogram_by")
    // Kaplan-Meier (result checkpoint is the returned frame)
    val surv = (1 to 200).map(i => ((i % 20) * 1.0, i % 2)).toDF("t", "e")
    graft.ops.Survival.kaplanMeier(surv, $"t", $"e").collect()
    assertClean("kaplan_meier")
    // connected components (final label checkpoint is the returned frame)
    val pairs = (1L to 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    graft.ops.Dedup.connectedComponents(pairs).agg(count(lit(1))).collect()
    assertClean("connected_components")
    // minhash LSH (signature checkpoint)
    val docs = (1L to 60L)
      .map(i => (i, s"the quick brown fox ${i % 9} jumps over the lazy dog"))
      .toDF("id", "text")
    graft.ops.Dedup.minHashLsh(docs, $"id", $"text")
      .agg(count(lit(1))).collect()
    assertClean("minhash_lsh")
  }
}
