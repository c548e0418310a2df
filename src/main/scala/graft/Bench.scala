package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // shuffle/checkpoint scratch on tmpfs when available: the block-manager
    // disk I/O (q43's localCheckpoint, spill files) is the main ±0.7 s
    // noise source between otherwise-identical runs
    val localDir = {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) {
        val d = new java.io.File(shm, "graft_bench_scratch")
        d.mkdirs()
        d.deleteOnExit()
        d.getAbsolutePath
      } else System.getProperty("java.io.tmpdir")
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // the default generated-class cache (100 entries) is evicted by the
      // ~70-query suite between the two passes, so pass 2 re-pays janino
      // compilation for multi-stage queries (BENCHAB.json: that recompile
      // is q42's entire 7→11 s "regression"). A long-lived deployment
      // would warm this cache once; size it so pass 2 measures execution.
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (parquet reader, codegen infra, shuffle machinery)
    // so the first timed query doesn't absorb one-time startup cost
    Seq("lineitem", "documents", "embeddings", "events", "orders").foreach { t =>
      // degrade like the query loop: a missing table costs its queries -1,
      // not the whole run
      try spark.read.parquet(s"$sfDir/$t.parquet").count()
      catch { case _: Throwable => () }
    }
    // two timed passes over the WHOLE suite, per-query min across passes:
    // back-to-back min-of-2 samples are correlated (a transient load spike
    // poisons both, which is how r05 recorded q34 at 14.6 s when a quiet
    // re-run gives 2.3 s); interleaving the suite between the two samples
    // decorrelates the noise at zero extra cost
    // a failed query records -1, not its time-to-failure (which would be
    // indistinguishable from a fast success in the JSON)
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
    }
    // load sentinel: a fixed CPU-bound calibration job (no I/O, no shuffle,
    // fully deterministic work) timed before the first pass and after every
    // pass. On a quiet box its samples agree; sustained external load (the
    // firecracker noise that poisoned the committed r8 artifact wholesale —
    // 762 s vs 68.6 s for the same binary) shows up as >25% drift between
    // samples, in which case the whole suite loops again and the per-query
    // min spans all passes. All samples are emitted so any reader can judge
    // the artifact's health without re-running it.
    def sentinel(): Double = {
      // median of 3 — a single sample confuses its own scheduler jitter
      // with box load; min would hide exactly the load we're measuring
      // ~0.3 s of work per sample: at the 0.1 s scale per-task scheduler
      // jitter alone is ±40%, which would false-trigger the 25% threshold;
      // the load signal this guards against (r8: 3-10×) dwarfs 25%.
      // MIN of 5, not median: measured quiet-box medians still spread ~35%
      // (single samples mix in this box's transient jitter), while the
      // sentinel's target is SUSTAINED load — which inflates all 5 samples,
      // so the min detects it just as well and is far stabler when quiet.
      val s = Array.fill(5) {
        val t0 = System.nanoTime()
        spark.range(0L, 1280L * 1000 * 1000, 1, cpus.toInt)
          .selectExpr("sum(id % 7)").collect()
        (System.nanoTime() - t0) / 1e9
      }
      s.min
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    // untimed sentinel warmup first: its own cold codegen/JIT otherwise
    // inflates sample 0 by ~2× and fakes the very drift it exists to catch
    // (measured: one warmup call (3 runs) left sample 0 ~18% high — C2
    // tiering needs ~10 executions of the generated class to settle)
    sentinel(); sentinel(); sentinel()
    val sentinels = scala.collection.mutable.ArrayBuffer(sentinel())
    val passes = scala.collection.mutable.ArrayBuffer.empty[Seq[(String, Double)]]
    val maxPasses = 4
    var done = false
    while (!done) {
      passes += ordered.map { case (name, fn) => name -> time(fn) }
      sentinels += sentinel()
      // 2 passes minimum (interleaved min-of-2); loop while the sentinel
      // says some pass ran under load, up to a bound so a persistently
      // busy box terminates (the emitted samples then tell the story).
      // The pre-suite sample gets a wider allowance: measured on a quiet
      // box it sits a systematic ~18% above the post-pass samples (CPU
      // governor hasn't ramped before sustained work; JIT warmup was ruled
      // out — 9 warm executions don't close it), while post-pass samples
      // agree within ~4%. 45% still catches the 3-10× load class that
      // poisoned the committed r8 artifact.
      val post = sentinels.drop(1)
      val postDrift = (post.max - post.min) / post.min
      val preDrift = (sentinels.head - post.min) / post.min
      done = passes.length >= maxPasses ||
        (passes.length >= 2 && postDrift <= 0.25 && preDrift <= 0.45)
    }
    // single-core sentinel: same idea, one partition — cpus-independent, so
    // its quiet value is an ABSOLUTE cross-run reference (~0.4 s measured
    // quiet on this box class). A reader comparing two artifacts (or one artifact vs a
    // quiet re-run) divides the sentinel1 values to get the load factor
    // even when both runs used different SPARK_GRAFT_CPUS.
    def sentinel1Sample(): Double = {
      val s = Array.fill(5) {
        val t0 = System.nanoTime()
        spark.range(0L, 320L * 1000 * 1000, 1, 1)
          .selectExpr("sum(id % 7)").collect()
        (System.nanoTime() - t0) / 1e9
      }
      s.min
    }
    var sentinel1 = sentinel1Sample()
    // sentinel-gated retry: the r9 and r10 DRIVER artifacts were
    // load-poisoned wholesale even though the in-loop drift check passed —
    // sustained externally-imposed load inflates every sample equally,
    // which uniform drift can't see. The single-core sentinel vs the
    // post-pass multi-core sentinels is the cross-check. CALIBRATION
    // (measured on this box class, quiet): sentinel1 ~= 0.42 s while the
    // multi-core sentinel ~= 0.13 s — a ~3.2x inherent ratio (scheduler
    // overhead amortizes differently at 1 vs `cpus` partitions), so the
    // gate triggers at 2x THAT ratio, i.e. sentinel1 > 6.4x the quietest
    // post-pass sentinel. The r8-class load (3-10x) clears it easily; a
    // quiet run does not. On trigger: ONE more full pass (the per-query
    // min spans it) and the retry is recorded so the artifact explains
    // itself.
    var retries = 0
    val gateThreshold = 6.4 * sentinels.drop(1).min
    val gateTriggered = sentinel1 > gateThreshold
    if (gateTriggered && passes.length < maxPasses + 1) {
      passes += ordered.map { case (name, fn) => name -> time(fn) }
      sentinels += sentinel()
      sentinel1 = math.min(sentinel1, sentinel1Sample())
      retries = 1
    }
    val results = ordered.map { case (name, _) =>
      val ts = passes.map(_.toMap.apply(name)).filter(_ >= 0)
      name -> (if (ts.isEmpty) -1.0 else ts.min)
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val sj = sentinels.map(s => f"$s%.3f").mkString("[", ",", "]")
    val pj = passes.map(p => f"${p.map(_._2).filter(_ >= 0).sum}%.1f")
      .mkString("[", ",", "]")
    val gateJson = f"""{"triggered":$gateTriggered,"sentinel1_threshold":$gateThreshold%.3f}"""
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","sentinel_sec":$sj,"sentinel1_sec":$sentinel1,"pass_total_sec":$pj,"passes":${passes.length},"retries":$retries,"sentinel_gate":$gateJson}"""
    println(json)
    // the same line as a machine-readable artifact: the driver's log-tail
    // capture has truncated the per-query map more than once (r9:
    // `parsed: null`), so the authoritative numbers must not depend on it.
    // Best-effort — a read-only working dir must not fail the bench.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_SELF.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => () }
    spark.stop()
  }
}
