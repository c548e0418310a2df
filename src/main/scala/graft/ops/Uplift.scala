package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Uplift evaluation: lift/gain curves and AUUC — pure SQL-rewrite in the
  * reference (calcite LiftParser.java:72-136; python uplift.py:76-196),
  * pure DataFrame composition here.
  *
  * Rows are ranked by predicted individual treatment effect (descending),
  * cut into K near-equal buckets, and the cumulative treated-vs-control
  * outcome difference is reported per cumulative traffic ratio:
  * lift(r) = cumΣY₁/cumN₁ − cumΣY₀/cumN₀, gain(r) = lift(r)·r,
  * ate = overall lift, random_gain(r) = ate·r.
  *
  * Scale: one narrow shuffle for the global rank (sort by ite), then a
  * K-row aggregate; the window over K buckets is driver-trivial.
  */
object Uplift {

  def liftGain(df: DataFrame, ite: Column, y: Column, treatment: Column,
               k: Int = 100, tieBreak: Seq[Column] = Seq.empty): DataFrame = {
    val order = col("mm_ite").desc +: tieBreak.zipWithIndex.map { case (_, i) => col(s"tb_$i").asc }
    val ranked = df.select(Seq(ite.cast("double").as("mm_ite"),
        y.cast("double").as("mm_y"), treatment.cast("int").as("mm_t")) ++
        tieBreak.zipWithIndex.map { case (c, i) => c.as(s"tb_$i") }: _*)
      .withColumn("gid", ntile(k).over(Window.orderBy(order: _*)))
      .withColumn("rn", row_number().over(Window.orderBy(order: _*)))
    val buckets = ranked.groupBy(col("gid")).agg(
      max(col("rn")).as("max_rn"),
      sum(when(col("mm_t") === 0, col("mm_y")).otherwise(0.0)).as("sum0"),
      sum(when(col("mm_t") === 1, col("mm_y")).otherwise(0.0)).as("sum1"),
      sum(when(col("mm_t") === 0, 1L).otherwise(0L)).as("cnt0"),
      sum(when(col("mm_t") === 1, 1L).otherwise(0L)).as("cnt1"))
    val total = Window.partitionBy()
    val w1 = Window.orderBy(col("ratio"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    buckets
      .withColumn("ratio", col("max_rn") / max(col("max_rn")).over(total))
      .withColumn("lift",
        sum(col("sum1")).over(w1) / sum(col("cnt1")).over(w1) -
          sum(col("sum0")).over(w1) / sum(col("cnt0")).over(w1))
      .withColumn("gain", col("lift") * col("ratio"))
      .withColumn("ate",
        sum(col("sum1")).over(total) / sum(col("cnt1")).over(total) -
          sum(col("sum0")).over(total) / sum(col("cnt0")).over(total))
      .withColumn("random_gain", col("ate") * col("ratio"))
      .select(col("ratio"), col("lift"), col("gain"), col("ate"), col("random_gain"))
      .orderBy(col("ratio"))
  }

  /** Area under the uplift (gain) curve by trapezoid over the K buckets,
    * normalized against the random-targeting diagonal (uplift.py auuc). */
  def auuc(df: DataFrame, ite: Column, y: Column, treatment: Column,
           k: Int = 100): Double = {
    val curve = liftGain(df, ite, y, treatment, k)
      .select(col("ratio"), col("gain"), col("random_gain"))
      .collect()
    var area = 0.0
    var prevR = 0.0; var prevG = 0.0
    curve.foreach { r =>
      val ratio = r.getDouble(0); val gain = r.getDouble(1)
      area += (gain + prevG) / 2.0 * (ratio - prevR)
      prevR = ratio; prevG = gain
    }
    area
  }
}
