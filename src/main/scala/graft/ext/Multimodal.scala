package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star brief): image/audio/video
  * payloads travel as opaque `binary` columns with a typed metadata
  * struct; decode/feature-extract runs batched per partition.
  *
  * The actual media decode is STUBBED (this environment has no codec
  * libraries): `decodeStub` derives a deterministic fake feature vector
  * from the bytes. Everything around it — schema, batch iteration,
  * partition-level processing, metadata extraction — is real and tested,
  * so a deployment swaps `decodeStub` for a JNI/codec call without
  * touching the dataflow.
  *
  * Scale notes: blobs never pass through the driver; metadata extraction
  * is a pure projection (scan-level, codegen); decode runs inside
  * mapPartitions with bounded per-batch memory (`batchSize` blobs at a
  * time), the Spark-idiomatic shape for vectorized/batched native calls.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("blob", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", LongType),
      StructField("content_hash", StringType),
      StructField("format", StringType))))))

  /** Wrap a (id, binary) frame with extracted metadata — a projection,
    * no shuffle; format sniffing here is a stand-in for magic-byte checks.
    */
  def withMeta(df: DataFrame, idCol: String, blobCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(blobCol).as("blob"),
      struct(
        length(col(blobCol)).cast("long").as("n_bytes"),
        substring(md5(col(blobCol)), 1, 16).as("content_hash"),
        when(length(col(blobCol)) % 3 === 0, "jpeg")
          .when(length(col(blobCol)) % 3 === 1, "png")
          .otherwise("webp").as("format")).as("meta"))

  /** Frame sampling for video-ish blobs: every `stride`-th byte offset
    * starts a `frameSize`-byte frame, one output row per sampled frame.
    * Pure Column ops (sequence → posexplode → binary substr): codegen'd,
    * no UDF, blobs never leave the executors, and the expansion is lazy —
    * a downstream filter on frame_idx prunes before any slicing runs. A
    * real video pipeline swaps the byte-window slicing for a keyframe
    * index lookup; the (media_id, frame_idx, frame) contract stays.
    *
    * A blob shorter than `frameSize` yields its single truncated frame
    * (same closed-world convention as the text shingles).
    */
  def sampleFrames(media: DataFrame, frameSize: Int = 16,
                   stride: Int = 64): DataFrame =
    media
      .select(col("media_id"), col("blob"),
        posexplode(sequence(
          lit(1L),
          greatest(length(col("blob")).cast("long") - (frameSize - 1), lit(1L)),
          lit(stride.toLong))))
      .select(col("media_id"), col("pos").cast("long").as("frame_idx"),
        col("blob").substr(col("col").cast("int"), lit(frameSize)).as("frame"))

  val featureDim = 8

  /** Deterministic fake "decode + feature extract" for one blob: a tiny
    * rolling hash per feature lane. Replace with a real codec call; the
    * signature (bytes in, float lane vector out) is the real contract.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](featureDim)
    var i = 0
    while (i < bytes.length) {
      val lane = i % featureDim
      acc(lane) = (acc(lane) * 31 + (bytes(i) & 0xFF)) % 1000003L
      i += 1
    }
    acc.map(v => v.toFloat / 1000003f)
  }

  /** Batched partition-level decode: iterates each partition in
    * `batchSize` groups (bounded memory for native/vectorized decoders)
    * and emits (media_id, features).
    */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = false)))
    val idIdx = media.schema.fieldIndex("media_id")
    val blobIdx = media.schema.fieldIndex("blob")
    val rdd = media.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // the grouped batch is where a real decoder would run vectorized
        batch.iterator.map { r =>
          Row(r.getLong(idIdx), decodeStub(r.getAs[Array[Byte]](blobIdx)).toSeq)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
