package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract
  * stages as mapPartitions pipelines.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic FAKE decoder — but everything Spark
  * cares about is real and tested: the schema contract, the
  * per-partition batching shape (one decoder init per partition, like
  * a Pandas-UDF batch), partitioning, and the metadata fast path that
  * never touches payload bytes.
  *
  * Scale notes: binary payloads dominate row size, so (a) metadata-only
  * queries must prune the payload column — parquet columnar pruning
  * does this for free when you select only meta columns; (b) decode is
  * per-row map work with NO shuffle; (c) repartition by size budget,
  * not row count, before decode-heavy stages.
  */
object Multimodal {

  /** Canonical asset schema: payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("payload", BinaryType, nullable = true),
    StructField("byte_len", LongType, nullable = false),
    StructField("meta", MapType(StringType, StringType), nullable = true)))

  /** Build an asset table from any table with an id + a string column,
    * treating the string bytes as the opaque payload (the test-data
    * stand-in for real image/audio bytes). */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String,
                     mediaType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit(mediaType).as("media_type"),
      col(textCol).cast("binary").as("payload"),
      length(col(textCol).cast("binary")).cast("long").as("byte_len"),
      map(lit("src_col"), lit(textCol)).as("meta"))

  /** Metadata inspection WITHOUT decoding: byte length, first-bytes
    * magic (hex), md5 — pure column work, payload column pruned
    * everywhere downstream that doesn't need it. */
  def inspect(assets: DataFrame): DataFrame =
    assets.select(col("asset_id"), col("media_type"), col("byte_len"),
      lower(hex(substring(col("payload"), 1, 4))).as("magic_hex"),
      md5(col("payload")).as("payload_md5"))

  /** Decoded-feature schema produced by the decode stage. */
  val featureSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("feature", ArrayType(FloatType), nullable = true)))

  /** STUB DECODER — deterministic fake in place of a real codec (none
    * is installed in this container). Produces stable pseudo-features
    * from the payload bytes so the pipeline is testable end-to-end.
    * Swap the body for OpenCV/ffmpeg bindings in production; the
    * partition-iterator shape (init once per partition, stream rows)
    * is exactly what a real codec needs. */
  def decodeStub(assets: DataFrame, featureDim: Int = 8): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = featureSchema
    val rdd = assets.select("asset_id", "media_type", "payload").rdd
      .mapPartitions { it =>
        // per-partition "codec init" happens here (once), not per row
        val digest = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val id = r.getLong(0)
          val mt = r.getString(1)
          val payload = if (r.isNullAt(2)) Array.empty[Byte] else r.getAs[Array[Byte]](2)
          val h = digest.digest(payload)
          val w = 16 + (java.lang.Byte.toUnsignedInt(h(0)) % 64)
          val ht = 16 + (java.lang.Byte.toUnsignedInt(h(1)) % 64)
          val frames = if (mt == "video") 1 + (java.lang.Byte.toUnsignedInt(h(2)) % 30) else 1
          val feat = (0 until featureDim).map(i =>
            (java.lang.Byte.toUnsignedInt(h(i % h.length)) / 255.0f)).toArray
          Row(id, mt, w, ht, frames, feat.toSeq)
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame-sample stage for video assets: pick every k-th frame index
    * up to n_frames (metadata-driven, no payload read). */
  def frameSample(features: DataFrame, everyK: Int): DataFrame =
    features.filter(col("media_type") === "video")
      .select(col("asset_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK)))
          .as("frame_idx"))
}
