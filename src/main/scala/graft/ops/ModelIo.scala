package graft.ops

import graft.agg.OlsSummary
import org.apache.spark.sql.{Encoders, SparkSession}

/** Model persistence: fitted models round-trip through tables, the
  * reference's pattern (models stored to / read from engine tables,
  * uplift.py:2040-2080; OlsState via CTE JSON, regression.py:266-302).
  * Spark-first that is a typed single-row Dataset written as parquet: the
  * schema IS the model structure, readable by any engine, no custom codec.
  */
object ModelIo {

  def saveOls(spark: SparkSession, m: OlsModel, path: String): Unit =
    spark.createDataset(Seq(m))(Encoders.product[OlsModel])
      .write.mode("overwrite").parquet(path)
  def loadOls(spark: SparkSession, path: String): OlsModel =
    spark.read.parquet(path).as(Encoders.product[OlsModel]).head()

  def saveLogistic(spark: SparkSession, m: MlWrappers.LogisticFit, path: String): Unit =
    spark.createDataset(Seq(m))(Encoders.product[MlWrappers.LogisticFit])
      .write.mode("overwrite").parquet(path)
  def loadLogistic(spark: SparkSession, path: String): MlWrappers.LogisticFit =
    spark.read.parquet(path).as(Encoders.product[MlWrappers.LogisticFit]).head()

  def saveCausalTree(spark: SparkSession, m: CausalTree.Model, path: String): Unit =
    spark.createDataset(Seq(m))(Encoders.product[CausalTree.Model])
      .write.mode("overwrite").parquet(path)
  def loadCausalTree(spark: SparkSession, path: String): CausalTree.Model =
    spark.read.parquet(path).as(Encoders.product[CausalTree.Model]).head()

  /** Forest rows: one row per tree plus the forest-level importance vector
    * replicated (parquet has no side-channel; one column, same value).
    * Public: a private nested case class defeats the codegen'd encoder
    * (janino cannot resolve its accessors) and forces an interpreted
    * fallback with an ERROR in the logs. */
  case class ForestRow(idx: Int, tree: CausalTree.Model,
                       variableImportance: Array[Double],
                       featureNames: Seq[String])

  def saveCausalForest(spark: SparkSession, m: CausalForest.Model, path: String): Unit = {
    val rows = m.trees.zipWithIndex.map { case (t, i) =>
      ForestRow(i, t, m.variableImportance, m.featureNames)
    }
    spark.createDataset(rows)(Encoders.product[ForestRow])
      .write.mode("overwrite").parquet(path)
  }
  def loadCausalForest(spark: SparkSession, path: String): CausalForest.Model = {
    val rows = spark.read.parquet(path).as(Encoders.product[ForestRow])
      .collect().sortBy(_.idx)
    CausalForest.Model(rows.map(_.tree).toIndexedSeq,
      rows.head.variableImportance, rows.head.featureNames)
  }

  def saveIvf(spark: SparkSession, m: Ann.IvfIndex, path: String): Unit =
    spark.createDataset(Seq(m))(Encoders.product[Ann.IvfIndex])
      .write.mode("overwrite").parquet(path)
  def loadIvf(spark: SparkSession, path: String): Ann.IvfIndex =
    spark.read.parquet(path).as(Encoders.product[Ann.IvfIndex]).head()

  /** Bigram-LM persistence: the count tables ARE DataFrames (they never
    * fit a single row at corpus scale), so they write as two parquet
    * tables plus a one-row meta table carrying vocabSize — training once
    * and scoring every ingestion batch is the op's whole point, and
    * re-counting the vocabulary on load would be a row-scale job. */
  def saveBigramModel(spark: SparkSession, m: NgramLm.BigramModel,
                      path: String): Unit = {
    m.bigrams.write.mode("overwrite").parquet(s"$path/bigrams")
    m.unigrams.write.mode("overwrite").parquet(s"$path/unigrams")
    spark.createDataset(Seq(m.vocabSize))(Encoders.scalaLong)
      .write.mode("overwrite").parquet(s"$path/meta")
  }
  def loadBigramModel(spark: SparkSession, path: String): NgramLm.BigramModel =
    NgramLm.BigramModel(
      spark.read.parquet(s"$path/bigrams"),
      spark.read.parquet(s"$path/unigrams"),
      spark.read.parquet(s"$path/meta").as(Encoders.scalaLong).head())
}
