package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded in batched `mapPartitions` (the Scala analog
  * of `mapInPandas` for Python decoders).
  *
  * The decode step is a clearly-marked deterministic STUB — real image/audio
  * libraries are not in this container. Everything around it is real and
  * tested: the binary schema, the typed partition-wise decode stage, the
  * metadata projection the downstream pipeline joins on.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, kind: String, data: Array[Byte])
  final case class MediaMeta(doc_id: Long, kind: String, n_bytes: Long,
      width: Long, height: Long, frames: Long)

  /** Synthetic media table: text bytes as the opaque payload, kind cycled
    * image/audio/video — deterministic, mirrored in the oracle.
    */
  def media(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
        encode(col("text"), "utf-8").as("data"))
      .as[MediaRow]
  }

  /** STUB DECODER: a real implementation parses the container header
    * (PNG/IHDR, WAV/fmt, MP4/moov) from `data`. Here the "header" is a
    * deterministic function of the payload length so tests and oracles can
    * verify the plumbing end to end. Swap this body for the real parser;
    * the partition-batched stage shape stays.
    */
  def decodeStub(data: Array[Byte]): (Long, Long, Long) = {
    val n = data.length.toLong
    (n % 509 + 16, (n * 7) % 389 + 16, n % 30 + 1)
  }

  /** Partition-batched decode: Dataset[MediaRow] → Dataset[MediaMeta].
    * One decoder instantiation per partition (amortizes codec init), narrow
    * stage, scales with input splits.
    */
  def decode(rows: Dataset[MediaRow]): Dataset[MediaMeta] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.mapPartitions { it =>
      // real code: val codec = Codecs.open(...)  (once per partition)
      it.map { r =>
        val (w, h, f) = decodeStub(r.data)
        MediaMeta(r.doc_id, r.kind, r.data.length.toLong, w, h, f)
      }
    }
  }

  /** Frame sampling stub: every k-th "frame" index for video rows —
    * demonstrates the explode-shaped output of a real frame sampler.
    */
  def sampleFrames(meta: Dataset[MediaMeta], every: Long = 7): DataFrame = {
    meta.toDF()
      .filter(col("kind") === "video")
      .select(col("doc_id"),
        explode(expr(s"sequence(0, frames - 1, $every)")).as("frame_no"))
  }
}
