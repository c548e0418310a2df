package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass per-(treatment, grouping-column, group-value) count/Σy/Σy² for
  * MANY grouping columns simultaneously — the split-search primitive behind
  * CausalTree (reference group_set.h:45-281, 9_group_set.sql).
  *
  * Spark-native shape: explode an array of (name, value) structs and run one
  * hash aggregate — a single shuffle keyed by (treatment, name, value), with
  * map-side partial aggregation. No custom state needed.
  */
object GroupSet {
  def groupSet(df: DataFrame, y: Column, treatment: Column,
               groupCols: Seq[(String, Column)]): DataFrame = {
    val pairs = groupCols.map { case (n, c) =>
      struct(lit(n).as("col_name"), c.cast("string").as("col_value"))
    }
    df.select(treatment.cast("long").as("treatment"), y.cast("double").as("y"),
        explode(array(pairs: _*)).as("g"))
      .groupBy(col("treatment"), col("g.col_name").as("col_name"),
        col("g.col_value").as("col_value"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("y")).as("sum_y"),
        sum(col("y") * col("y")).as("sum_y2"))
  }
}
