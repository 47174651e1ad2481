package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with
  * typed metadata, processed in partition-batches (the Scala analog of
  * a Pandas-UDF / mapInPandas batch: one decoder instantiation per
  * partition, rows streamed through it).
  *
  * Reference provenance: the reference tracks and transforms images
  * (jobs/transform/images_jpg_generation.py, imaging/) by shelling to
  * external decoders; here the *decode step is a STUB* (no image/audio
  * libraries in this container) with a deterministic fake, while the
  * Spark-side plumbing — schema, binary column, batch shape,
  * partition-level decoder lifecycle — is real and tested.
  */
object Media {

  case class MediaRow(media_id: Long, media_type: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, media_type: String, byte_len: Int,
                           width: Int, height: Int, checksum: Long)

  /** Wrap a text corpus as a binary media table (simulates ingesting
    * raw bytes; in production the payload column would come from
    * `spark.read.format("binaryFile")`). */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      when(pmod(col("doc_id"), lit(3)) === 0, "image")
        .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
        .otherwise("video").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))

  /** STUB decoder: in production this would call an image/audio codec
    * (per-partition instantiation, batch decode). The fake derives
    * deterministic dimensions from the payload checksum so tests can
    * assert the plumbing end-to-end. */
  private def decodeStub(mediaType: String, payload: Array[Byte]): (Int, Int, Long) = {
    // ??? <- real codec goes here (e.g. javax.imageio / ffmpeg bridge)
    var crc = 0L
    var i = 0
    while (i < payload.length) { crc = crc * 31 + (payload(i) & 0xff); i += 1 }
    val w = 64 + math.floorMod(crc, 1856L).toInt   // fake 64..1919
    val h = 64 + math.floorMod(crc >> 11, 1016L).toInt
    (w, h, crc)
  }

  /** Feature extraction over partition batches. Narrow map — no
    * shuffle; scales linearly with input bytes. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-partition decoder lifecycle would be initialized here
      it.map { r =>
        val (w, h, crc) = decodeStub(r.media_type, r.payload)
        MediaFeatures(r.media_id, r.media_type, r.payload.length, w, h, crc)
      }
    }
  }

  case class FrameSample(media_id: Long, frame_idx: Int, frame_checksum: Long)

  /** STUB frame sampler: every `stride`-th "frame" of a video payload
    * (in production: ffmpeg seek + decode per partition batch). Fake
    * frames are deterministic byte-slices so the fan-out shape
    * (1 row → n frames) and downstream schema are real. */
  def sampleFrames(spark: SparkSession, media: DataFrame, stride: Int = 4,
                   maxFrames: Int = 8): Dataset[FrameSample] = {
    import spark.implicits._
    media.as[MediaRow].filter((r: MediaRow) => r.media_type == "video")
      .flatMap { r =>
        // ??? <- real decoder goes here
        val nFrames = math.min(maxFrames, math.max(1, r.payload.length / 32))
        (0 until nFrames by stride).map { i =>
          val slice = r.payload.slice(i * 32, math.min(r.payload.length, i * 32 + 32))
          var crc = 0L
          slice.foreach(b => crc = crc * 31 + (b & 0xff))
          FrameSample(r.media_id, i, crc)
        }
      }
  }

  /** STUB resize: rewrites the metadata to the target box preserving
    * aspect ratio (in production: a codec resize over the payload).
    * Pure column math — stays in whole-stage codegen. */
  def resizeMeta(features: DataFrame, maxW: Int = 256, maxH: Int = 256): DataFrame = {
    val scale = least(lit(maxW) / col("width"), lit(maxH) / col("height"), lit(1.0))
    features
      .withColumn("resized_w", floor(col("width") * scale).cast("int"))
      .withColumn("resized_h", floor(col("height") * scale).cast("int"))
  }

  /** Container magic numbers for [[sniffKind]] (hex of the leading
    * bytes): PNG, JPEG, RIFF (wav/avi/webp), FLAC. */
  val MagicPrefixes: Seq[(String, String)] = Seq(
    "png" -> "89504E47", "jpeg" -> "FFD8FF", "riff" -> "52494646", "flac" -> "664C6143")

  /** Classify a binary payload by its magic number — the ingest-time
    * file-type sniff (never trust the extension at 100 TB). Pure hex
    * prefix matching on the first bytes: codegen'd, no decoder
    * needed, so it runs in the scan stage before any expensive
    * dispatch to type-specific decode pipelines. */
  def sniffKind(payload: Column): Column = {
    // longest magic is 4 bytes -> 8 hex chars; extract once
    val prefix = hex(substring(payload, 1, 4))
    MagicPrefixes.foldLeft(when(lit(false), lit("unknown"))) {
      case (acc, (kind, magic)) =>
        acc.when(substring(prefix, 1, magic.length) === magic, lit(kind))
    }.otherwise(lit("unknown"))
  }

  /** Media table variant whose payloads carry REAL container magic
    * numbers (type-dependent prefix + content bytes) so the sniffing
    * path is testable without codecs. */
  def asMagicMediaTable(documents: DataFrame): DataFrame = {
    def magic(bytes: Int*) = typedlit(bytes.map(_.toByte).toArray)
    val prefix = when(pmod(col("doc_id"), lit(3)) === 0,
        magic(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A)) // PNG
      .when(pmod(col("doc_id"), lit(3)) === 1,
        magic(0x66, 0x4C, 0x61, 0x43))                          // fLaC
      .otherwise(magic(0x52, 0x49, 0x46, 0x46))                 // RIFF
    documents.select(col("doc_id").as("media_id"),
      concat(prefix, encode(col("text"), "UTF-8")).as("payload"))
  }

  /** End-to-end media pipeline: ingest → features → per-type stats. */
  def mediaStats(spark: SparkSession, documents: DataFrame): DataFrame = {
    val feats = extractFeatures(spark, asMediaTable(documents))
    feats.groupBy(col("media_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("byte_len").cast("long")).as("total_bytes"),
        min(col("width")).as("min_w"), max(col("width")).as("max_w"))
      .orderBy(col("media_type"))
  }
}
