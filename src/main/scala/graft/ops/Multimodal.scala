package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video ride as opaque `binary`
  * columns with a typed metadata struct; decode / feature-extract / resize /
  * frame-sample run as batched per-partition transforms.
  *
  * The actual codecs are STUBBED (no image/audio libraries in this
  * environment): `decodeStub` produces a deterministic fake decode from the
  * bytes. Everything Spark-side is real — schema, batching, partition
  * behavior, output shapes — so swapping the stub body for a JNI/ffmpeg call
  * changes no plan shape. At 100 TB the rule is: metadata-only predicates
  * (format/width/duration) filter BEFORE bytes are decoded, and decode runs
  * once per partition batch, never per driver row.
  */
object Multimodal {

  /** media metadata struct literal: (format, width, height, duration_ms). */
  def mediaMeta(format: Column, width: Column, height: Column,
                durationMs: Column): Column =
    struct(format.cast("string").as("format"), width.cast("int").as("width"),
      height.cast("int").as("height"), durationMs.cast("long").as("duration_ms"))

  case class MediaRow(id: Long, content: Array[Byte], format: String,
                      width: Int, height: Int)
  case class DecodedRow(id: Long, features: Array[Float], decodeOk: Boolean)

  /** STUB decode: a real implementation hands `batch` (already grouped to
    * `batchSize`) to the native decoder. The fake derives `featureDim`
    * floats deterministically from the content bytes so tests can assert
    * batch shape, ordering, and determinism end-to-end. */
  private def decodeBatchStub(batch: Seq[MediaRow], featureDim: Int): Seq[DecodedRow] =
    batch.map { r =>
      if (r.content == null || r.content.isEmpty) DecodedRow(r.id, Array.empty, decodeOk = false)
      else {
        val feats = new Array[Float](featureDim)
        var h = 1125899906842597L // deterministic FNV-ish fold of the bytes
        r.content.foreach(b => h = h * 31 + b)
        var i = 0
        while (i < featureDim) {
          h = h * 6364136223846793005L + 1442695040888963407L
          feats(i) = ((h >>> 33).toDouble / (1L << 31).toDouble - 0.5).toFloat
          i += 1
        }
        DecodedRow(r.id, feats, decodeOk = true)
      }
    }

  /** Decode + feature-extract: batched mapPartitions over (id, content,
    * meta). Input frame needs columns (id, content, format, width, height).
    * Returns (id, features array<float>, decode_ok). */
  def decodeFeatures(df: DataFrame, featureDim: Int = 64,
                     batchSize: Int = 64): DataFrame = {
    val ds: Dataset[MediaRow] = df
      .select(col("id").cast("long").as("id"), col("content"),
        col("format").cast("string").as("format"),
        col("width").cast("int").as("width"), col("height").cast("int").as("height"))
      .as(Encoders.product[MediaRow])
    ds.mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => decodeBatchStub(batch.toSeq, featureDim))
    }(Encoders.product[DecodedRow])
      .toDF("id", "features", "decode_ok")
  }

  /** Frame sampling plan for video rows: emits (id, frame_index, ts_ms) for
    * `fps`-spaced frames of each row's duration — pure column expressions
    * (sequence + explode); the decode of each sampled frame then rides the
    * same batched stub path. */
  def sampleFrames(df: DataFrame, id: Column, durationMs: Column,
                   everyMs: Long): DataFrame =
    df.select(id.cast("long").as("id"), durationMs.cast("long").as("dur"))
      .filter(col("dur") > 0)
      .select(col("id"),
        posexplode(sequence(lit(0L), col("dur") - 1, lit(everyMs)))
          .as(Seq("frame_index", "ts_ms")))

  /** Metadata-computed resize plan: target dims preserving aspect ratio with
    * max side `maxSide` — the arithmetic the real resizer would use, kept as
    * columns so it can gate/batch work without touching bytes. */
  def resizePlan(width: Column, height: Column, maxSide: Int): Column = {
    val scale = lit(maxSide.toDouble) / greatest(width, height).cast("double")
    val s = least(scale, lit(1.0))
    struct(round(width * s).cast("int").as("w"), round(height * s).cast("int").as("h"),
      (s < 1.0).as("needs_resize"))
  }
}
