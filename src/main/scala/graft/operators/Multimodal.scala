package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `BinaryType` columns with typed metadata, processed in batched
  * per-partition passes (SURVEY.md north star).
  *
  * The decode step is a clearly-marked STUB (no codec libraries in this
  * environment): [[StubDecode]] derives deterministic fake
  * width/height/format from the payload bytes. Everything around it — the
  * schema contract, the `mapPartitions` batching shape (the Scala-side
  * equivalent of an Arrow-batched UDF: one iterator per task, amortized
  * setup, no per-row driver involvement), and the partitioning — is the
  * real 100 TB design: payloads never leave executors, the decode pass is
  * embarrassingly parallel, and downstream joins use only the compact
  * metadata projection.
  */
object Multimodal {

  /** Typed result of the (stubbed) decode pass. */
  final case class MediaMeta(
      media_id: Long,
      n_bytes: Int,
      format: String,
      width: Int,
      height: Int)

  /** STUB decoder: a real implementation would parse the container header
    * (JPEG SOF / WAV fmt / MP4 moov). Deterministic in the payload so specs
    * can assert on it. */
  object StubDecode {
    def apply(id: Long, payload: Array[Byte]): MediaMeta = {
      val n = if (payload == null) 0 else payload.length
      val h = {
        var acc = 1469598103934665603L
        var i = 0
        while (i < n) { acc = (acc ^ payload(i)) * 1099511628211L; i += 1 }
        acc
      }
      val formats = Array("jpeg", "png", "wav", "mp4")
      val fmt = formats(((h % 4) + 4).toInt % 4)
      MediaMeta(id, n, fmt,
        width = 16 + (((h >>> 8) % 1024) + 1024).toInt % 1024,
        height = 16 + (((h >>> 24) % 1024) + 1024).toInt % 1024)
    }
  }

  /** Attach a binary payload column (here: utf-8 of a text column — the
    * testdata has no media table; the column type and flow are the point). */
  def withBinaryPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Batched decode pass: one partition = one batch, iterator-in /
    * iterator-out like `mapInPandas`, producing the compact metadata
    * projection. */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => StubDecode(id, bytes) })
  }
}
