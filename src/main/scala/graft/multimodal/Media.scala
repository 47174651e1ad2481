package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** Multimodal column plumbing with REAL JDK codecs: media as opaque
  * `binary` columns with typed metadata, processed in partition
  * batches (the Scala analog of a Pandas-UDF / mapInPandas batch: one
  * decoder instantiation per partition, rows streamed through it).
  *
  * Reference provenance: the reference tracks and transforms images
  * (jobs/transform/images_jpg_generation.py, imaging/) by shelling to
  * external decoders. Here the decode is real and dependency-free —
  * JDK built-ins only: `javax.imageio` for PNG (still images) and
  * multi-frame GIF (the "video" stand-in: real per-frame decode via
  * `ImageReader`), `javax.sound.sampled` for WAV/PCM audio. Payloads
  * are SYNTHESIZED deterministically from the media id (this
  * environment ships no media files), so an independent SQL oracle
  * can predict the decoded width/height/pixel sums exactly — which is
  * what graduates q_media_pipeline from rows-only to hash-checked:
  * the bytes really round-trip encoder → container format → decoder.
  *
  * Scale posture: synthesis and decode are both narrow mapPartitions
  * over the payload bytes — no shuffle; linear in total media bytes;
  * decoder instances are partition-local (no per-row setup). At
  * 100 TB the payload column would come from
  * `spark.read.format("binaryFile")` (see SourcesSpec) and the same
  * decode pass applies unchanged.
  */
object Media {

  // ImageIO's default stream cache is a TEMP FILE per image: every
  // ImageIO.read(InputStream) / createImageInput(Output)Stream call
  // creates and deletes an on-disk cache file, so a partition of
  // thousands of KB-sized payloads pays thousands of file-system
  // round-trips for data that already sits in a byte array. In-memory
  // cache streams produce byte-identical containers/decodes — this is
  // pure per-task overhead removal (optimization guide §1.2 step 2).
  // Object-initializer placement runs it once per JVM on first use of
  // any codec path (driver or executor alike).
  ImageIO.setUseCache(false)

  case class MediaRow(media_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded features. For images: real pixel dims + exact gray-pixel
    * sum. For audio: width = sample count, height = 1, px_sum = sum of
    * unsigned 8-bit samples. For video (multi-frame GIF): frame dims,
    * n_px counts every pixel of every frame, px_sum sums them all. */
  case class MediaFeatures(media_id: Long, media_type: String, byte_len: Int,
                           width: Int, height: Int, n_px: Long, px_sum: Long)

  // ── deterministic synthesis parameters ──────────────────────────
  // Shared contract with the q_media_pipeline SQL oracle — any change
  // here must be mirrored there. All arithmetic is integer-exact.
  private[graft] def mediaTypeOf(id: Long): String =
    (id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
  private[graft] def pngW(id: Long): Int = (8 + id % 24).toInt
  private[graft] def pngH(id: Long): Int = (8 + (id * 7) % 16).toInt
  private[graft] def pngPx(id: Long, x: Int, y: Int): Int = ((x + y + id) % 256).toInt
  private[graft] def wavN(id: Long): Int = (64 + id % 192).toInt
  private[graft] def wavSample(id: Long, i: Int): Int = ((i * 3 + id) % 256).toInt
  private[graft] def gifW(id: Long): Int = (8 + id % 16).toInt
  private[graft] def gifH(id: Long): Int = (6 + (id * 5) % 12).toInt
  private[graft] def gifFrames(id: Long): Int = (2 + id % 4).toInt
  private[graft] def gifPx(id: Long, f: Int, x: Int, y: Int): Int =
    ((x + y + id + f * 7) % 256).toInt

  // ── encoders (synthesis side) ───────────────────────────────────

  private def encodePng(id: Long): Array[Byte] = {
    val (w, h) = (pngW(id), pngH(id))
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) { var x = 0; while (x < w) { raster.setSample(x, y, 0, pngPx(id, x, y)); x += 1 }; y += 1 }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def encodeWav(id: Long): Array[Byte] = {
    val n = wavN(id)
    val pcm = new Array[Byte](n)
    var i = 0
    while (i < n) { pcm(i) = wavSample(id, i).toByte; i += 1 }
    // 8-bit WAV is unsigned PCM by spec; mono, 8 kHz
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  private def encodeGif(id: Long): Array[Byte] = {
    val (w, h, frames) = (gifW(id), gifH(id), gifFrames(id))
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
        val raster = img.getRaster
        var y = 0
        while (y < h) { var x = 0; while (x < w) { raster.setSample(x, y, 0, gifPx(id, f, x, y)); x += 1 }; y += 1 }
        writer.writeToSequence(new IIOImage(img, null, null), null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    bos.toByteArray
  }

  /** Synthesize the typed media table: REAL container bytes (PNG /
    * WAV / animated GIF) per id. Encoder state is partition-local;
    * only `doc_id` is read from the input.
    *
    * The id column REPARTITIONS to the session parallelism first:
    * scan splits follow file BYTES (maxPartitionBytes), but codec
    * work is per-ROW — a doc table that compresses into one small
    * parquet file would otherwise serialize the whole encode/decode
    * chain onto a single core at every corpus size (measured: the
    * x32 media queries ran single-threaded, wall-time ~linear instead
    * of /32). Shuffling the 8-byte ids costs nothing next to codec
    * work; the expensive payloads are BORN post-shuffle. */
  def asMediaTable(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(col("doc_id").cast("long")).repartition(col("doc_id")).as[Long]
      .mapPartitions { it =>
        it.map { id =>
          val t = mediaTypeOf(id)
          val payload = t match {
            case "image" => encodePng(id)
            case "audio" => encodeWav(id)
            case _       => encodeGif(id)
          }
          MediaRow(id, t, payload)
        }
      }.toDF()
  }

  // ── decoders (the real thing) ───────────────────────────────────

  /** Exact 8-bit gray sum of a decoded frame. Two traps worth the
    * comment: getRGB on a TYPE_BYTE_GRAY image gamma-converts linear
    * gray → sRGB (NOT identity — raw raster samples are the stored
    * values), while on an IndexColorModel (GIF) the raster holds
    * palette INDICES and getRGB's palette lookup returns the stored
    * color exactly (no conversion). */
  private def graySum(img: BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    var sum = 0L
    var y = 0
    if (img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]) {
      while (y < h) { var x = 0; while (x < w) { sum += (img.getRGB(x, y) & 0xFF); x += 1 }; y += 1 }
    } else {
      val raster = img.getRaster
      while (y < h) { var x = 0; while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }; y += 1 }
    }
    sum
  }

  private val Undecodable = (0, 0, 0L, 0L)

  /** Decode a still image (PNG/JPEG/GIF-first-frame) via ImageIO:
    * (width, height, n_px, exact gray-pixel sum). ImageIO.read
    * returns NULL (not an exception) for a payload whose magic lies
    * about its body — degrade to the byte-level row, never fail the
    * task over one corrupt blob. */
  private def decodeImage(payload: Array[Byte]): (Int, Int, Long, Long) = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    if (img == null) Undecodable
    else (img.getWidth, img.getHeight, img.getWidth.toLong * img.getHeight, graySum(img))
  }

  /** Decode WAV via javax.sound: (n_samples, 1, n_samples, sum of
    * unsigned 8-bit samples). */
  private def decodeWav(payload: Array[Byte]): (Int, Int, Long, Long) = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    try {
      val n = ais.getFrameLength.toInt
      val buf = ais.readAllBytes()
      var sum = 0L
      var i = 0
      while (i < buf.length) { sum += (buf(i) & 0xFF); i += 1 }
      (n, 1, n.toLong, sum)
    } finally ais.close()
  }

  /** Decode EVERY frame of a multi-frame GIF via ImageReader:
    * (frame_w, frame_h, total pixels across frames, total sum). */
  private def decodeGifAll(payload: Array[Byte]): (Int, Int, Long, Long) = {
    val reader = ImageIO.getImageReadersByFormatName("gif").next()
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      var (w, h) = (0, 0)
      var nPx = 0L
      var sum = 0L
      var f = 0
      while (f < n) {
        val img = reader.read(f)
        w = img.getWidth; h = img.getHeight
        sum += graySum(img)
        nPx += w.toLong * h
        f += 1
      }
      (w, h, nPx, sum)
    } finally { reader.dispose(); iis.close() }
  }

  /** Feature extraction over partition batches — REAL decode per
    * container type, dispatched on the payload's magic number (never
    * the declared type: ingest triage must not trust labels). Narrow
    * map, no shuffle; scales linearly with input bytes. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.map { r =>
        val kind = sniffBytes(r.payload)
        // every decoder degrades to the byte-level row on a body that
        // does not match its magic (corrupt blob, or RIFF that is
        // avi/webp rather than wav) — one bad payload in a 100 TB
        // ingest must not fail the task
        val (w, h, nPx, sum) = kind match {
          case "png" | "jpeg" => decodeImage(r.payload)
          case "gif" => try decodeGifAll(r.payload) catch { case _: Exception => Undecodable }
          case "riff" => try decodeWav(r.payload) catch { case _: Exception => Undecodable }
          case _ => Undecodable // unknown magic: byte-level row only
        }
        MediaFeatures(r.media_id, r.media_type, r.payload.length, w, h, nPx, sum)
      }
    }
  }

  case class AHashRow(media_id: Long, ahash: Long)

  /** Largest image (in pixels) [[aHash]]'s exact integer compare
    * covers: nPx² · 255/64 < 2^63 ⇒ nPx < ~1.52e9. Larger images are
    * skipped like undecodable ones (documented in [[aHash]]). */
  private[graft] val AHashMaxExactPixels = 1500000000L

  /** 64-bit average-hash (aHash, the classic perceptual image hash)
    * of every decodable IMAGE payload: decode via ImageIO, partition
    * pixels into an 8×8 grid by the forward map
    * `bit = (y·8 div H)·8 + (x·8 div W)`, set a bit iff its block's
    * mean gray exceeds the image's global mean — compared as exact
    * integer cross-products (`block_sum·n_px > total_sum·block_n`, no
    * division, no floats), so any engine that can see the pixels
    * reproduces the hash bit-for-bit. Same raster-sample access as
    * [[graySum]] (getRGB would gamma-convert TYPE_BYTE_GRAY).
    * Undecodable payloads are skipped, not failed — BOTH the
    * no-reader-claims-it case (ImageIO.read → null) and the
    * valid-header-truncated-body case (ImageIO.read → IOException);
    * one corrupt blob in a 100 TB ingest must not fail the task.
    * Images past [[AHashMaxExactPixels]] (~1.5 gigapixels) are also
    * skipped: beyond it the exact cross-product compare
    * `block_sum·n_px > total_sum·block_n` can exceed int64
    * (block_sum ≤ 255·nPx/64, so the product needs nPx² < 2^63·64/255)
    * and the bit-for-bit reproducibility contract would silently
    * break rather than loudly not apply. */
  def aHash(spark: SparkSession, media: DataFrame): Dataset[AHashRow] = {
    import spark.implicits._
    media.filter(col("media_type") === "image").as[MediaRow].mapPartitions { it =>
      it.flatMap { r =>
        val img =
          try ImageIO.read(new ByteArrayInputStream(r.payload))
          catch { case _: Exception => null } // corrupt body with a valid header
        if (img == null || img.getWidth.toLong * img.getHeight > AHashMaxExactPixels) None
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val indexed = img.getColorModel.isInstanceOf[java.awt.image.IndexColorModel]
          val raster = img.getRaster
          val sums = new Array[Long](64)
          val cnts = new Array[Long](64)
          var tot = 0L
          var y = 0
          while (y < h) {
            val by = y * 8 / h
            var x = 0
            while (x < w) {
              val v = if (indexed) img.getRGB(x, y) & 0xFF else raster.getSample(x, y, 0)
              val b = by * 8 + x * 8 / w
              sums(b) += v; cnts(b) += 1; tot += v
              x += 1
            }
            y += 1
          }
          val nPx = w.toLong * h
          var bits = 0L
          var b = 0
          while (b < 64) {
            if (cnts(b) > 0 && sums(b) * nPx > tot * cnts(b)) bits |= 1L << b
            b += 1
          }
          Some(AHashRow(r.media_id, bits))
        }
      }
    }
  }

  case class FrameSample(media_id: Long, frame_idx: Int, frame_px_sum: Long)

  /** REAL frame sampling: decode every `stride`-th frame of each
    * multi-frame GIF payload (ImageReader seek + per-frame decode,
    * partition-local reader lifecycle) and emit its exact pixel sum —
    * the 1 row → n frames fan-out a video pipeline runs at scale. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   stride: Int = 4, maxFrames: Int = 8): Dataset[FrameSample] = {
    import spark.implicits._
    // dispatch on the SNIFFED payload, not the declared label (the
    // same never-trust-the-label rule as extractFeatures: a mislabeled
    // non-GIF "video" yields no frames rather than a task failure);
    // one reader per PARTITION, setInput per row
    media.as[MediaRow]
      .filter((r: MediaRow) => r.media_type == "video" && sniffBytes(r.payload) == "gif")
      .mapPartitions { it =>
        val reader = ImageIO.getImageReadersByFormatName("gif").next()
        // dispose on TASK COMPLETION, not iterator exhaustion: a
        // downstream early-terminating consumer (limit, take) abandons
        // the iterator without draining it, which would leak the
        // reader's native/cache resources
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => reader.dispose())
        val rows = if (tc != null) it else new Iterator[MediaRow] {
          def hasNext: Boolean = { val h = it.hasNext; if (!h) reader.dispose(); h }
          def next(): MediaRow = it.next()
        }
        rows.flatMap { r =>
          val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(r.payload))
          try {
            reader.setInput(iis)
            val n = math.min(reader.getNumImages(true), maxFrames)
            (0 until n by stride).map { f =>
              FrameSample(r.media_id, f, graySum(reader.read(f)))
            }.toVector // materialize before the stream closes
          } catch { case _: Exception => Vector.empty } // corrupt body: no frames
          finally iis.close()
        }
      }
  }

  case class ThumbRow(media_id: Long, src_w: Int, src_h: Int,
                      thumb_w: Int, thumb_h: Int, jpeg_kind: String,
                      jpeg_w: Int, jpeg_h: Int, png_px_sum: Long)

  /** ENCODE-OUT: the write half of the image pipeline (reference
    * jobs/transform/images_jpg_generation.py:15 — convert_image emits
    * a full-res JPEG + a thumbnail per image). Decode → aspect-
    * preserving nearest-neighbor raster resize → re-encode, twice:
    * a JPEG (the reference's delivery format — lossy, so the oracle
    * checks its container magic + exact re-decoded DIMENSIONS) and a
    * PNG (lossless, so the re-decoded pixel sum is exactly the
    * nearest-neighbor sampling formula and the oracle predicts it to
    * the bit). The NN sample map is pure integer math —
    * src(x*w/tw, y*h/th) — deliberately, so any engine can replay it;
    * interpolating resamplers are implementation-defined.
    *
    * Scale posture: narrow mapPartitions, decode+encode bound, zero
    * shuffle — the same embarrassingly-parallel shape as
    * [[extractFeatures]]; at 100 TB the thumbnails write back out
    * through a binary sink partitioned however the store needs. */
  def thumbnails(spark: SparkSession, media: DataFrame,
                 maxW: Int = 12, maxH: Int = 12): Dataset[ThumbRow] = {
    import spark.implicits._
    media.as[MediaRow]
      .filter((r: MediaRow) => sniffBytes(r.payload) == "png")
      .mapPartitions { it =>
        it.flatMap { r =>
          val img = ImageIO.read(new ByteArrayInputStream(r.payload))
          if (img == null) None // corrupt blob: skip, never fail the task
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val scale = math.min(math.min(maxW.toDouble / w, maxH.toDouble / h), 1.0)
            val tw = math.max(1, math.floor(w * scale).toInt)
            val th = math.max(1, math.floor(h * scale).toInt)
            val src = img.getRaster
            val thumb = new BufferedImage(tw, th, BufferedImage.TYPE_BYTE_GRAY)
            val dst = thumb.getRaster
            var y = 0
            while (y < th) {
              var x = 0
              while (x < tw) {
                dst.setSample(x, y, 0, src.getSample(x * w / tw, y * h / th, 0))
                x += 1
              }
              y += 1
            }
            val jbos = new ByteArrayOutputStream()
            ImageIO.write(thumb, "jpg", jbos)
            val jpegBytes = jbos.toByteArray
            val pbos = new ByteArrayOutputStream()
            ImageIO.write(thumb, "png", pbos)
            val pngBytes = pbos.toByteArray
            // round-trip PROOF: re-decode both containers we just wrote
            val jpegImg = ImageIO.read(new ByteArrayInputStream(jpegBytes))
            val pngImg = ImageIO.read(new ByteArrayInputStream(pngBytes))
            Some(ThumbRow(r.media_id, w, h, tw, th, sniffBytes(jpegBytes),
              jpegImg.getWidth, jpegImg.getHeight, graySum(pngImg)))
          }
        }
      }
  }

  /** Resize METADATA to the target box preserving aspect ratio (the
    * planning step before a batch codec resize; the decode side of a
    * real resize is [[decodeImage]]). Pure column math — stays in
    * whole-stage codegen. */
  def resizeMeta(features: DataFrame, maxW: Int = 256, maxH: Int = 256): DataFrame = {
    val scale = least(lit(maxW) / col("width"), lit(maxH) / col("height"), lit(1.0))
    features
      .withColumn("resized_w", floor(col("width") * scale).cast("int"))
      .withColumn("resized_h", floor(col("height") * scale).cast("int"))
  }

  /** Container magic numbers for [[sniffKind]] (hex of the leading
    * bytes): PNG, JPEG, GIF, RIFF (wav/avi/webp), FLAC. */
  val MagicPrefixes: Seq[(String, String)] = Seq(
    "png" -> "89504E47", "jpeg" -> "FFD8FF", "gif" -> "47494638",
    "riff" -> "52494646", "flac" -> "664C6143")

  /** JVM-side magic sniff (decode dispatch inside mapPartitions). A
    * payload shorter than a magic can never match it. */
  private def sniffBytes(payload: Array[Byte]): String = {
    val prefix = payload.take(4).map(b => f"${b & 0xff}%02X").mkString
    MagicPrefixes.collectFirst {
      case (kind, magic) if prefix.startsWith(magic) => kind
    }.getOrElse("unknown")
  }

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
    * path is testable in isolation from the codecs. */
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

  /** End-to-end media pipeline: synthesize real containers → decode
    * them back → per-media decoded metadata. Every value except
    * byte_len is predicted exactly by the SQL oracle from the
    * synthesis formulas — proving the bytes really round-trip through
    * the container codecs. byte_len (compressed size) is
    * encoder-dependent, so it stays out of the oracle-checked set. */
  def decodedMedia(spark: SparkSession, documents: DataFrame): DataFrame = {
    extractFeatures(spark, asMediaTable(documents))
      .toDF()
      .select(col("media_id"), col("media_type"), col("width"), col("height"),
        col("n_px"), col("px_sum"))
  }
}
