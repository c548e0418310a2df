package graft
import org.apache.spark.sql.SparkSession

/** Dump the formatted physical plan of any SparkEntry query:
  * `sbt "runMain graft.PlanAudit q61_caliper_matching q37_minhash_pairs"`.
  * The per-operator review loop: after a query goes green, read its plan
  * here and iterate until the shape is right (scan count, broadcast vs
  * shuffle joins, pushdown/pruning, no unpartitioned windows). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (q <- args) {
      println(s"===== $q =====")
      println(SparkEntry.queries(q)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
