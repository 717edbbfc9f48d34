package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded in batched `mapPartitions` (the Scala analog
  * of `mapInPandas` for Python decoders).
  *
  * The payloads are REAL container formats produced by the JDK's own codecs
  * (no external libraries needed):
  *  - image → PNG   (javax.imageio, grayscale raster)
  *  - audio → WAV   (javax.sound.sampled, 16-bit mono PCM)
  *  - video → animated GIF (javax.imageio sequence writer, indexed frames)
  * and the decode stage is a real header parser per format ([[MediaCodec]]):
  * PNG IHDR, RIFF/WAVE chunk walk, GIF logical-screen + block walk. That is
  * exactly what a 100-TB metadata-extraction scan does — read the container
  * header, never the pixel/sample payload. Full-payload decoding is
  * cross-checked in MultimodalSpec against the JDK's independent readers
  * (ImageIO.read / AudioSystem.getAudioFileFormat / GIF ImageReader).
  *
  * Payload metadata is planted deterministically from `doc_id`
  * ([[MediaCodec.plantedWidth]] etc.) so the DuckDB oracle can verify the
  * whole encode→parse round trip with pure arithmetic.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, kind: String, data: Array[Byte])
  final case class MediaMeta(doc_id: Long, kind: String, n_bytes: Long,
      width: Long, height: Long, frames: Long)

  /** Synthetic media table: REAL PNG/WAV/GIF bytes as the opaque payload,
    * kind cycled image/audio/video by doc_id — deterministic, so the planted
    * header metadata is mirrored in the oracle. Scans only `doc_id` (the fat
    * text column is pruned at the parquet reader). One encoder instantiation
    * per partition (the GIF ImageWriter is reused across rows).
    */
  def media(spark: SparkSession, sfDir: String,
      kind: Option[String] = None): Dataset[MediaRow] = {
    import spark.implicits._
    // the JDK-codec ENCODE stage runs in the scan stage and dominates the
    // media queries — spread a single-split id source over the cores
    val ids = graft.util.Reads.spread(spark,
      spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id")))
    // Optional kind restriction applied BEFORE the encode stage: the kind
    // is a pure function of doc_id, so a consumer that only wants videos
    // (q_media_frames) must not pay the PNG/WAV encode for the other 2/3.
    val wanted = kind match {
      case Some("image") => ids.filter(col("doc_id") % 3 === 0)
      case Some("audio") => ids.filter(col("doc_id") % 3 === 1)
      case Some("video") => ids.filter(col("doc_id") % 3 === 2)
      case _             => ids
    }
    wanted.as[Long]
      .mapPartitions { it =>
        val enc = new MediaEncoder // per-partition codec instantiation
        it.map { id =>
          (id % 3) match {
            case 0 => MediaRow(id, "image", enc.png(id))
            case 1 => MediaRow(id, "audio", enc.wav(id))
            case _ => MediaRow(id, "video", enc.gif(id))
          }
        }
      }
  }

  /** Partition-batched decode: Dataset[MediaRow] → Dataset[MediaMeta].
    * Sniffs the container from magic bytes and parses ONLY the header —
    * narrow stage, scales with input splits. Rows whose payload fails to
    * parse (truncated/corrupt container) are DROPPED, the standard contract
    * for a web-scale ingest scan; MultimodalSpec pins that truncated bytes
    * yield None rather than a crash.
    */
  def decode(rows: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.mapPartitions { it =>
      it.flatMap { r =>
        MediaCodec.parse(r.data).map { case (kind, w, h, f) =>
          MediaMeta(r.doc_id, kind, r.data.length.toLong, w, h, f)
        }
      }
    }
  }

  /** Frame sampling: every k-th frame index for video rows — the
    * explode-shaped output of a frame sampler over the parsed frame count.
    * Zero-frame containers (a valid GIF can carry no image descriptor)
    * contribute no rows — without the `frames >= 1` guard,
    * `sequence(0, -1, k)` throws illegal-boundaries and kills the scan.
    */
  def sampleFrames(meta: Dataset[MediaMeta], every: Long = 7): DataFrame = {
    meta.toDF()
      .filter(col("kind") === "video" && col("frames") >= 1)
      .select(col("doc_id"),
        explode(expr(s"sequence(0, frames - 1, $every)")).as("frame_no"))
  }
}

/** Planted-dimension arithmetic (shared by encoder, oracle SQL, and specs)
  * plus the real header parsers. All parsers are bounds-checked and return
  * None on any malformed input.
  */
object MediaCodec {

  // Planted header metadata as pure functions of doc_id (mirrored in the
  // DuckDB oracle, OracleOps.qMediaMeta).
  def plantedWidth(id: Long): Int  = (id % 95 + 16).toInt   // PNG + GIF
  def plantedHeight(id: Long): Int = (id * 7 % 61 + 16).toInt
  def plantedAudioFrames(id: Long): Int = (id % 480 + 32).toInt
  def plantedGifFrames(id: Long): Int   = (id % 12 + 2).toInt
  val AudioRate: Int = 8000 // Hz, 16-bit mono PCM

  /** Sniff the container from magic bytes and parse its header:
    * returns (kind, width, height, frames) where for audio
    * width = sample rate, height = channels, frames = PCM frame count.
    */
  def parse(b: Array[Byte]): Option[(String, Long, Long, Long)] =
    if (b.length >= 12 && b(0) == 0x89.toByte && b(1) == 'P')
      parsePng(b).map { case (w, h) => ("image", w, h, 1L) }
    else if (b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')
      parseWav(b).map { case (rate, ch, fr) => ("audio", rate, ch, fr) }
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      parseGif(b).map { case (w, h, fr) => ("video", w, h, fr) }
    else None

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xFFL) << 24) | ((b(i + 1) & 0xFFL) << 16) |
      ((b(i + 2) & 0xFFL) << 8) | (b(i + 3) & 0xFFL)
  private def le16(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)

  private val PngSig =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** PNG: 8-byte signature, then the IHDR chunk (length + "IHDR" + width,
    * height as big-endian u32). Per the PNG spec IHDR MUST be first.
    */
  def parsePng(b: Array[Byte]): Option[(Long, Long)] =
    if (b.length >= 24 && PngSig.indices.forall(i => b(i) == PngSig(i)) &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some((be32(b, 16), be32(b, 20)))
    else None

  /** WAV: RIFF/WAVE chunk walk — 'fmt ' gives channels/sampleRate/blockAlign,
    * 'data' size / blockAlign gives the PCM frame count. Chunks are
    * even-byte aligned per the RIFF spec.
    */
  def parseWav(b: Array[Byte]): Option[(Long, Long, Long)] = {
    if (b.length < 12 || b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return None
    var pos = 12
    var rate = -1L; var ch = -1L; var blockAlign = -1L; var dataLen = -1L
    while (pos + 8 <= b.length && (rate < 0 || dataLen < 0)) {
      val size = le32(b, pos + 4)
      // The chunk must lie fully within the buffer — checking size against
      // the TOTAL length would accept a truncated-mid-chunk file (frame
      // count overstated vs bytes present) and let a corrupt non-terminal
      // size land the walk inside payload bytes, misparsing garbage as
      // chunk headers instead of returning None.
      if (size < 0 || pos + 8 + size > b.length) return None
      if (b(pos) == 'f' && b(pos + 1) == 'm' && b(pos + 2) == 't' && size >= 16 &&
          pos + 8 + 16 <= b.length) {
        ch = le16(b, pos + 10)
        rate = le32(b, pos + 12)
        blockAlign = le16(b, pos + 20)
      } else if (b(pos) == 'd' && b(pos + 1) == 'a' && b(pos + 2) == 't' && b(pos + 3) == 'a') {
        dataLen = size
      }
      pos += 8 + size.toInt + (size.toInt & 1)
    }
    if (rate > 0 && ch > 0 && blockAlign > 0 && dataLen >= 0)
      Some((rate, ch, dataLen / blockAlign))
    else None
  }

  /** GIF: logical screen descriptor (width/height, little-endian u16) then a
    * block walk counting image descriptors (0x2C) as frames — skipping the
    * global/local color tables, extension blocks (0x21) and LZW data
    * sub-blocks — until the trailer (0x3B).
    */
  def parseGif(b: Array[Byte]): Option[(Long, Long, Long)] = {
    if (b.length < 14 || b(3) != '8' || (b(4) != '7' && b(4) != '9') || b(5) != 'a')
      return None
    val w = le16(b, 6); val h = le16(b, 8)
    val packed = b(10) & 0xFF
    var pos = 13 + (if ((packed & 0x80) != 0) 3 * (2 << (packed & 7)) else 0)
    var frames = 0L
    def skipSubBlocks(): Boolean = {
      while (pos < b.length && b(pos) != 0) pos += 1 + (b(pos) & 0xFF)
      pos += 1
      pos <= b.length
    }
    while (pos < b.length) {
      (b(pos) & 0xFF) match {
        case 0x3B => return Some((w, h, frames)) // trailer
        case 0x21 => // extension: label byte then sub-blocks
          pos += 2
          if (!skipSubBlocks()) return None
        case 0x2C => // image descriptor: 9 bytes, optional LCT, LZW min code
          frames += 1
          if (pos + 10 >= b.length) return None
          val p = b(pos + 9) & 0xFF
          pos += 10 + (if ((p & 0x80) != 0) 3 * (2 << (p & 7)) else 0) + 1
          if (!skipSubBlocks()) return None
        case _ => return None
      }
    }
    None // ran off the end without a trailer
  }
}

/** Deterministic JDK-codec encoders, one instance per partition. */
final class MediaEncoder {
  import java.io.ByteArrayOutputStream
  import java.awt.image.{BufferedImage, DataBufferByte}
  import javax.imageio.ImageIO

  // In-memory ImageIO streams (the default is a scratch-FILE cache — one
  // temp file per row would thrash the executor's disk at scale).
  ImageIO.setUseCache(false)

  // GIF sequence writer reused across rows (codec init amortized per
  // partition); PNG goes through the static ImageIO.write fast path.
  // (A reused PNG writer with explicit deflate-effort control was measured
  // in the optimization round and did NOT beat ImageIO.write on the
  // pseudo-random planted rasters — reverted.)
  private val gifWriter = ImageIO.getImageWritersByFormatName("gif").next()

  private def frame(id: Long, w: Int, h: Int, seed: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val px = img.getRaster.getDataBuffer.asInstanceOf[DataBufferByte].getData
    var i = 0
    while (i < px.length) { px(i) = ((id * 31 + i.toLong * 7 + seed) % 251).toByte; i += 1 }
    img
  }

  def png(id: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(frame(id, MediaCodec.plantedWidth(id), MediaCodec.plantedHeight(id), 0),
      "png", bos)
    bos.toByteArray
  }

  def wav(id: Long): Array[Byte] = {
    import javax.sound.sampled._
    val n = MediaCodec.plantedAudioFrames(id)
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) { // deterministic 16-bit LE sawtooth
      val s = ((id * 131 + i * 37) % 65536 - 32768).toInt
      pcm(2 * i) = (s & 0xFF).toByte; pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      i += 1
    }
    val fmt = new AudioFormat(MediaCodec.AudioRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  def gif(id: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    gifWriter.setOutput(ios)
    gifWriter.prepareWriteSequence(null)
    val (w, h) = (MediaCodec.plantedWidth(id), MediaCodec.plantedHeight(id))
    var f = 0
    while (f < MediaCodec.plantedGifFrames(id)) {
      gifWriter.writeToSequence(new javax.imageio.IIOImage(frame(id, w, h, f), null, null), null)
      f += 1
    }
    gifWriter.endWriteSequence()
    ios.close()
    bos.toByteArray
  }
}
