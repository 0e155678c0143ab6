package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (beyond-reference, training-data-pipeline
  * scope): image/audio/video as opaque `binary` columns with typed
  * metadata, processed per-partition in bounded batches.
  *
  * The decode step is STUBBED (no image/audio libraries in this
  * environment): `fakeDecode` derives deterministic pseudo-features from
  * the bytes so the Spark-side plumbing — schema, batching, partition
  * flow — is real and testable. Swap `decodeBatch` for a real codec
  * (JNI/ONNX) without touching the pipeline.
  */
object Multimodal {

  /** Canonical media schema: opaque payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType),   // "image" | "audio" | "video"
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("payload", BinaryType)))

  /** Deterministic fake feature extraction: a D-dim float vector derived
    * from payload bytes. Stands in for a real decode+embed; STUB — the
    * numbers are meaningless, the shape/flow is what's exercised. */
  private[multimodal] def fakeDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    var i = 0
    while (i < payload.length) { h = 31 * h + payload(i); i += 1 }
    var d = 0
    while (d < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      out(d) = (h % 1000L).toFloat / 1000f
      d += 1
    }
    out
  }

  /** Feature-extract the payload column per-partition in bounded batches
    * (`batchSize` rows at a time — the mapInPandas batch shape, here as
    * mapPartitions + grouped iterator; memory is bounded by
    * batchSize × payload, not partition size).
    */
  def extractFeatures(df: DataFrame, dim: Int = 16, batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(df.schema.fields.filterNot(_.name == "payload") :+
      StructField("features", ArrayType(FloatType)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(outSchema)
    val payloadIdx = df.schema.fieldIndex("payload")
    val keepIdx = df.schema.fields.zipWithIndex
      .collect { case (f, i) if f.name != "payload" => i }
    df.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch boundary = where a real vectorized decoder would run once
        batch.map { row =>
          val payload = row.getAs[Array[Byte]](payloadIdx)
          val feats = if (payload == null) null else fakeDecode(payload, dim)
          Row.fromSeq(keepIdx.map(row.get).toSeq :+ feats)
        }
      }
    }(enc)
  }

  /** Frame-sample metadata rows from a video payload: emits one row per
    * sampled frame index (every `everyMs` ms of duration) — the explode
    * pattern for frame-level processing; decode itself stays stubbed. */
  def sampleFrames(df: DataFrame, everyMs: Long = 1000L): DataFrame =
    df.filter(col("media_type") === "video" && col("duration_ms").isNotNull &&
        col("duration_ms") > 0) // sequence(0, -1, +step) throws on 0-length media
      .withColumn("frame_ms",
        explode(sequence(lit(0L), col("duration_ms") - 1, lit(everyMs))))
      .drop("payload")
}
