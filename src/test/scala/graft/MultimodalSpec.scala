package graft

import graft.multimodal.{MediaCodec, MediaEncoder, Multimodal}

class MultimodalSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("real PNG/WAV/GIF payloads decode to the planted header metadata") {
    val meta = Multimodal.decode(Multimodal.media(spark, sfTiny)).cache()
    val rows = meta.collect()
    assert(rows.length == 500) // no row dropped: every container parsed
    rows.foreach { m =>
      // kind is SNIFFED from the container magic bytes, not carried through
      val expectedKind =
        (m.doc_id % 3) match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      assert(m.kind == expectedKind)
      m.kind match {
        case "image" =>
          assert(m.width == MediaCodec.plantedWidth(m.doc_id))
          assert(m.height == MediaCodec.plantedHeight(m.doc_id))
          assert(m.frames == 1L)
        case "audio" =>
          assert(m.width == MediaCodec.AudioRate)
          assert(m.height == 1L)
          assert(m.frames == MediaCodec.plantedAudioFrames(m.doc_id))
        case _ =>
          assert(m.width == MediaCodec.plantedWidth(m.doc_id))
          assert(m.height == MediaCodec.plantedHeight(m.doc_id))
          assert(m.frames == MediaCodec.plantedGifFrames(m.doc_id))
      }
      assert(m.n_bytes > 0)
    }
  }

  test("header parsers agree with the JDK's independent full decoders") {
    import java.io.ByteArrayInputStream
    import javax.imageio.ImageIO
    val enc = new MediaEncoder
    for (id <- 0L to 30L) {
      val png = enc.png(id)
      val img = ImageIO.read(new ByteArrayInputStream(png))
      assert(MediaCodec.parsePng(png).contains((img.getWidth.toLong, img.getHeight.toLong)))

      val wav = enc.wav(id)
      val aff = javax.sound.sampled.AudioSystem
        .getAudioFileFormat(new ByteArrayInputStream(wav))
      assert(MediaCodec.parseWav(wav).contains((
        aff.getFormat.getSampleRate.toLong,
        aff.getFormat.getChannels.toLong,
        aff.getFrameLength.toLong)))

      val gif = enc.gif(id)
      val rd = ImageIO.getImageReadersByFormatName("gif").next()
      rd.setInput(ImageIO.createImageInputStream(new ByteArrayInputStream(gif)))
      assert(MediaCodec.parseGif(gif).contains((
        rd.getWidth(0).toLong, rd.getHeight(0).toLong,
        rd.getNumImages(true).toLong)))
      rd.dispose()
    }
  }

  test("malformed containers yield None, never a crash") {
    val enc = new MediaEncoder
    val payloads = Seq(enc.png(3L), enc.wav(7L), enc.gif(11L))
    for (p <- payloads; cut <- Seq(0, 3, 8, 13)) { // header destroyed
      assert(MediaCodec.parse(p.take(cut)).isEmpty, s"truncated at $cut parsed")
    }
    // contract: these are HEADER scans — a payload truncated past its intact
    // header still reports the header metadata (PNG keeps its leading IHDR;
    // GIF hits the missing trailer and returns None; WAV hits a chunk
    // extending past EOF — strict chunk bounds — and returns None)
    assert(MediaCodec.parse(enc.png(3L).dropRight(10)).nonEmpty)
    assert(MediaCodec.parse(enc.gif(11L).dropRight(10)).isEmpty)
    assert(MediaCodec.parse(enc.wav(7L).dropRight(10)).isEmpty)
    assert(MediaCodec.parse(Array.fill[Byte](64)(0x2A)).isEmpty)
    assert(MediaCodec.parse(Array.empty[Byte]).isEmpty)
    // corrupt a WAV chunk size to a huge value: must not loop or crash
    val wav = enc.wav(5L)
    wav(16) = 0xFF.toByte; wav(17) = 0xFF.toByte; wav(18) = 0xFF.toByte; wav(19) = 0xFF.toByte
    assert(MediaCodec.parseWav(wav).isEmpty)
  }

  test("frame sampling explodes video rows only, stride 7") {
    val meta = Multimodal.decode(Multimodal.media(spark, sfTiny))
    val frames = Multimodal.sampleFrames(meta).collect()
    assert(frames.nonEmpty)
    frames.foreach(r => assert(r.getLong(1) % 7 == 0))
    val vids = meta.filter(col("kind") === "video").count()
    assert(frames.map(_.getLong(0)).distinct.length == vids)
    // kind pre-filter: encoding only video rows yields the identical sample
    val videoOnly = Multimodal.sampleFrames(Multimodal.decode(
      Multimodal.media(spark, sfTiny, kind = Some("video")))).collect()
    assert(videoOnly.map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ==
      frames.map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
  }

  test("zero-frame video metadata yields no sampled rows, not a crash") {
    import spark.implicits._
    val meta = Seq(
      Multimodal.MediaMeta(1L, "video", 40L, 8L, 8L, 0L), // header-only GIF
      Multimodal.MediaMeta(2L, "video", 40L, 8L, 8L, 8L)).toDS()
    val rows = Multimodal.sampleFrames(meta).collect()
    assert(rows.map(_.getLong(0)).toSet == Set(2L))
  }
}
