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

  /** STUB resize: binary → binary, deterministic in (payload, w, h). A real
    * implementation decodes, scales, re-encodes; the engine-side contract —
    * payload stays opaque bytes, runs batched per partition, output size
    * bounded by the target dims — is what this preserves. */
  def resizeUdf(w: Int, h: Int) = udf { (payload: Array[Byte]) =>
    if (payload == null) null
    else {
      val outLen = math.min(payload.length, w * h / 8 + 16)
      val out = new Array[Byte](outLen)
      var i = 0
      while (i < outLen) { out(i) = (payload(i % payload.length) ^ (w + h)).toByte; i += 1 }
      out
    }
  }

  /** STUB frame sampling: one synthetic "frame" payload per sampled index —
    * the video-to-frames explode shape (rows multiply by nFrames, payload
    * stays on executors). */
  def sampleFrames(media: DataFrame, nFrames: Int): DataFrame =
    media.select(col("media_id"), posexplode(
      transform(sequence(lit(0), lit(nFrames - 1)),
        i => struct(i.as("frame_no"),
          substring(col("payload"), lit(1) + i * 8, lit(32)).as("frame_payload")))))
      .select(col("media_id"), col("col.frame_no").as("frame_no"),
        col("col.frame_payload").as("frame_payload"))

  /** STUB feature extraction: payload → deterministic L2-normalized
    * `dim`-d embedding (a seeded hash projection standing in for the
    * BioCLIP encoder, reference vector_db.py:102-118 — the GPU boundary).
    * Output plugs straight into [[AnnIvf.build]] / [[Knn.bruteForce]]. */
  def embedUdf(dim: Int) = udf { (payload: Array[Byte]) =>
    val v = new Array[Float](dim)
    if (payload != null && payload.nonEmpty) {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < payload.length) {
        h = (h ^ payload(i)) * 1099511628211L
        v((i + (h & 0x7fffffff).toInt) % dim) += ((h >> 32).toInt % 1000) / 1000.0f
        i += 1
      }
      var ss = 0.0
      var j = 0
      while (j < dim) { ss += v(j).toDouble * v(j).toDouble; j += 1 }
      val n = math.sqrt(ss)
      if (n > 0) { j = 0; while (j < dim) { v(j) = (v(j) / n).toFloat; j += 1 } }
    }
    v.toSeq
  }
}
