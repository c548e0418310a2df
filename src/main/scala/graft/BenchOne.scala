package graft
import org.apache.spark.sql.SparkSession

/** Single-JVM query probe: run one OR MORE SparkEntry queries in a fresh
  * JVM with the Bench session config and print cold (first execution) and
  * warm (min over re-executions, repeated until the per-execution JIT
  * delta settles — see the loop comment) seconds as one JSON line PER
  * QUERY. This
  * is the interleaved-pairs protocol BENCHAB.json documents — the only
  * measurement this box's ±25% load drift cannot poison asymmetrically,
  * since A and B runs alternate minutes apart.
  *
  * Multiple names amortize the ~30 s Spark boot over the whole flagged
  * list — Bench's fork-verify phase runs ONE of these instead of one JVM
  * per flagged query (the per-query-JVM design is what pushed the r14
  * driver bench past its wall budget, rc 124). Ckpt.sweep runs between
  * queries so query N's checkpoints never pressure query N+1.
  *
  * Usage: runMain graft.BenchOne <queryName> [more names...]
  * (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val localDir = {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) {
        val d = new java.io.File(shm, "graft_bench_scratch"); d.mkdirs(); d.getAbsolutePath
      } else System.getProperty("java.io.tmpdir")
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "16384")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).filter(_ >= 0).sum
    }
    def jitMs: Long = {
      val c = java.lang.management.ManagementFactory.getCompilationMXBean
      if (c != null && c.isCompilationTimeMonitoringSupported)
        c.getTotalCompilationTime else -1L
    }
    // single-core load sentinel (Bench's absolute cross-run reference,
    // quiet ~0.42 s on this box class): the r12 driver artifact recorded a
    // 31.8 s "fresh rerun" for a query that reads 3.6 s quiet — the fork
    // escaped the session's scar tissue but not the box's external load,
    // and without a sentinel IN the forked JVM the artifact couldn't say
    // which number to believe. Every BenchOne line carries its own,
    // sampled right after its query so a load burst mid-list is localized.
    def sentinel1(): Double = Array.fill(5) {
      val t0 = System.nanoTime()
      spark.range(0L, 320L * 1000 * 1000, 1, 1)
        .selectExpr("sum(id % 7)").collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once()
      val (gc0, jit0) = (gcMs, jitMs)
      // JIT-SETTLED warm floor (the r16 flag class: q196/q197/q199/q200
      // warm-rejected at ~2.1x with 3-11 s of jit_ms — a fresh JVM's first
      // 2-3 executions of a rank/survival path still run partly in the
      // interpreter/C1 tier, while the board min they were checked against
      // came from a long-lived JVM with C2-compiled code). Keep
      // re-executing until an execution compiles < `jitQuietMs` of new
      // code AND stops improving the min, so `warm` measures the operator
      // at the same tier the board did. Bounded at `maxWarmRuns` so a
      // query that never settles (giant generated classes) terminates —
      // the emitted jit_ms then explains the residual.
      val maxWarmRuns = 8
      val jitQuietMs = 150L
      var warm = Double.MaxValue
      var runs = 0
      var lastJitDelta = Long.MaxValue
      var jitBefore = jitMs
      var settled = false
      while (runs < maxWarmRuns && !settled) {
        val sec = once()
        val jitAfter = jitMs
        lastJitDelta = if (jitBefore >= 0 && jitAfter >= 0) jitAfter - jitBefore else -1L
        jitBefore = jitAfter
        val improved = sec < 0.95 * warm
        warm = math.min(warm, sec)
        runs += 1
        settled = runs >= 2 && !improved &&
          (lastJitDelta < 0 || lastJitDelta <= jitQuietMs)
      }
      // GC + JIT milliseconds spent DURING the warm executions: a fork
      // rerun that disagrees with the in-run min must explain itself (a
      // large jit_ms says "still compiling", a large gc_ms says "heap
      // pressure") instead of leaving a bare implausible number
      val (gcWarm, jitWarm) =
        (gcMs - gc0, if (jit0 >= 0) jitMs - jit0 else -1L)
      // JIT QUIESCE before sampling the load sentinel: the settled-warm
      // loop leaves background C2 threads still compiling for several
      // seconds on codegen-heavy queries, which inflates the sentinel and
      // reads as EXTERNAL load (the r17 board's q267 fork rejected itself
      // at sentinel1 0.94 with 45 s of jit_ms). Wait until compilation
      // goes quiet (<50 ms per 200 ms window), bounded at 5 s.
      locally {
        val tq0 = System.nanoTime()
        var lastJit = jitMs
        var quiet = false
        while (!quiet && (System.nanoTime() - tq0) < 5e9.toLong) {
          Thread.sleep(200)
          val now = jitMs
          quiet = now < 0 || now - lastJit < 50
          lastJit = now
        }
      }
      val s1 = sentinel1()
      println(f"""{"query":"$name","cold":$cold%.3f,"warm":$warm%.3f,"warm_runs":$runs,"jit_settled":$settled,"sentinel1":$s1%.3f,"gc_ms":$gcWarm,"jit_ms":$jitWarm}""")
      // query boundary: this query's checkpoints must not pressure the next
      try Ckpt.sweep(spark) catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
