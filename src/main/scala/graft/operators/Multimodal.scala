package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `BinaryType` columns with typed metadata, processed in batched
  * per-partition passes (SURVEY.md north star; reference boundary:
  * vector_db.py:144-148 image preprocessing before the encoder).
  *
  * Decode and resize are REAL for JDK-supported raster formats
  * (PNG/JPEG/GIF/BMP/WBMP via `javax.imageio` — no external codec libs
  * needed): [[decodeMeta]] reads true width/height/format from the
  * container header without decoding pixels; [[resizeUdf]] decodes,
  * rescales, and re-encodes. The GPU-bound feature extraction
  * ([[embedUdf]]) and video frame sampling ([[sampleFrames]]) remain
  * clearly-marked stubs (no encoder / video codecs in the JDK). The
  * engine-side design holds for all of them: payloads never leave
  * executors, passes are batched per partition (iterator-in/iterator-out,
  * the Scala-side shape of an Arrow-batched UDF), and downstream joins
  * use only the compact metadata projection.
  */
object Multimodal {

  // ImageIO's default stream cache is a TEMP FILE per created
  // image input/output stream: every header decode and every PNG encode
  // paid a file create+write+delete — serially slow, and under
  // concurrent tasks the codec stage sat in IO wait (tools/Profile r19:
  // 32 decode tasks, 10 cpu-s, 111 run-s). Payloads here are in-memory
  // byte arrays; the memory cache is strictly better. One-time global
  // JVM switch, triggered when the object loads on each executor.
  javax.imageio.ImageIO.setUseCache(false)

  /** Typed result of the decode pass. Non-image payloads decode as
    * format "unknown" with 0×0 dims rather than failing the batch. */
  final case class MediaMeta(
      media_id: Long,
      n_bytes: Int,
      format: String,
      width: Int,
      height: Int)

  /** Header-only image decode via `javax.imageio`: reader is chosen by
    * content sniffing; `getWidth/getHeight` read the header, NOT the pixel
    * data — the cheap metadata pass a 100 TB profiling scan wants. */
  def decodeHeader(id: Long, payload: Array[Byte]): MediaMeta = {
    val n = if (payload == null) 0 else payload.length
    if (n == 0) return MediaMeta(id, 0, "empty", 0, 0)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (readers.hasNext) {
        val r = readers.next()
        // a payload the reader CLAIMS but cannot parse (valid signature,
        // truncated/garbage header) must degrade like any other
        // undecodable payload, not abort a 100 TB profiling scan on one
        // poison row — the JDK readers throw more than IOException here
        try {
          r.setInput(iis)
          MediaMeta(id, n, r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0))
        } catch {
          case scala.util.control.NonFatal(_) =>
            MediaMeta(id, n, "corrupt", 0, 0)
        } finally r.dispose()
      } else MediaMeta(id, n, "unknown", 0, 0)
    } finally iis.close()
  }

  /** Attach a binary payload column (here: utf-8 of a text column — the
    * testdata has no media table; the column type and flow are the point). */
  def withBinaryPayload(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Deterministic REAL-PNG fixture payloads: a `w×h` image whose dims are
    * pure functions of the id (w = 16 + id % 32, h = 16 + (id / 32) % 32)
    * and whose pixels hash off (id, x, y). The bytes are genuine PNG —
    * decodable by any conformant reader — so decode results are
    * oracle-checkable from the id alone. */
  def withPngPayload(df: DataFrame, idCol: String): DataFrame = {
    val pngUdf = udf { (id: Long) => encodePng(id, perturb = false) }
    spreadForPerRowCodec(df.select(col(idCol).cast("long").as("media_id")))
      .select(col("media_id"), pngUdf(col("media_id")).as("payload"))
  }

  /** Spread a (small-rowed) frame across the cluster before a per-row
    * image codec: the payload attach costs ~0.4 ms/row of pure CPU, and
    * a narrow small-file scan otherwise runs the WHOLE codec chain in
    * one task (tools/Profile r19: multimodal_decode = one 2.3 cpu-s task
    * — serial, and invisible to the core-scaling probe). Repartition of
    * the id-only projection is a few bytes/row; never fewer partitions
    * than the source already has (guide §2.2 — fit parallelism to the
    * cluster, don't shrink a big scan). */
  private def spreadForPerRowCodec(ids: DataFrame): DataFrame = {
    val spark = ids.sparkSession
    val n = math.max(spark.sparkContext.defaultParallelism,
      ids.rdd.getNumPartitions)
    ids.repartition(n)
  }

  /** Near-duplicate PNG fixtures: [[withPngPayload]]'s image for the id
    * with a 2×2 top-left pixel patch overwritten — a genuinely different
    * byte stream whose perceptual content is ~identical, re-keyed to
    * `id + idOffset`. The dHash of such a copy differs from the original
    * in at most the couple of grid cells the patch lands in. */
  def withPngPayloadPerturbed(df: DataFrame, idCol: String,
      idOffset: Long): DataFrame = {
    val pngUdf = udf { (id: Long) =>
      encodePng(id, perturb = true)
    }
    spreadForPerRowCodec(df.select(col(idCol).cast("long").as("__id")))
      .select((col("__id") + idOffset).as("media_id"),
        pngUdf(col("__id")).as("payload"))
  }

  private[graft] def encodePng(id: Long, perturb: Boolean): Array[Byte] = {
    val w = 16 + (id % 32).toInt
    val h = 16 + ((id / 32) % 32).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, (id * 2654435761L + x * 40503 + y * 65537).toInt & 0xffffff)
        x += 1
      }
      y += 1
    }
    if (perturb) {
      var py = 0
      while (py < 2) {
        var px = 0
        while (px < 2) { img.setRGB(px, py, 0x808080); px += 1 }
        py += 1
      }
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Default full-decode pixel cap: a ~100-byte crafted header can
    * declare 50000×50000 and make `ImageIO.read` allocate a ~10 GB
    * raster — one adversarial row must not OOM an executor. 2²⁶ px
    * ≈ 256 MB ARGB. Legitimate larger images (panoramas, scans) exist:
    * every decode entry point takes the cap as a parameter, and
    * [[decodeStatus]] classifies refusals as "oversized" — distinct from
    * "corrupt" — so a pipeline can COUNT what a given cap loses before
    * (or after) choosing it. */
  val DefaultMaxDecodePixels: Long = 1L << 26

  /** Classify a payload from its HEADER only (no pixel IO): "ok",
    * "empty", "unknown" (not an image), "corrupt" (claimed but
    * unparseable), or "oversized" (dims exceed `maxPixels` — the rows
    * [[dHash64]]/[[resizeUdf]] refuse at the same cap). The observable
    * twin of the silent nulls those functions return: group by this
    * column to see exactly what a cap excludes, separately from genuine
    * corruption. */
  def decodeStatus(payload: Array[Byte],
      maxPixels: Long = DefaultMaxDecodePixels): String = {
    val meta = decodeHeader(0L, payload)
    meta.format match {
      case "empty" | "unknown" | "corrupt" => meta.format
      case _ if meta.width <= 0 || meta.height <= 0 => "corrupt"
      case _ if meta.width.toLong * meta.height > maxPixels => "oversized"
      case _ => "ok"
    }
  }

  /** Column form of [[decodeStatus]]. */
  def decodeStatusUdf(maxPixels: Long = DefaultMaxDecodePixels) =
    udf { (payload: Array[Byte]) => decodeStatus(payload, maxPixels) }

  /** Decode an untrusted payload defensively: header-only dims gate
    * first (no pixel IO), then the full decode under a NonFatal catch —
    * the JDK GIF/BMP readers throw unchecked exceptions on malformed
    * input, not just IOException. Null on any refusal. */
  private def safeDecode(payload: Array[Byte],
      maxPixels: Long): java.awt.image.BufferedImage = {
    val meta = decodeHeader(0L, payload)
    if (meta.width <= 0 || meta.height <= 0 ||
        meta.width.toLong * meta.height > maxPixels) null
    else
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
  }

  /** 64-bit difference hash (dHash) of an image payload — the classic
    * perceptual fingerprint for image near-dup detection: decode, reduce
    * to a 9×8 luma grid with an INTEGER box filter (pure pixel-sum math
    * over `getRGB`, deliberately not Graphics2D resampling, so the hash
    * is a platform-independent pure function of the pixels), then bit
    * (x,y) = 1 iff cell(x,y) is brighter than cell(x+1,y). Survives
    * re-encode/resize/small edits; pairs join via [[Dedup.hamming64Pairs]].
    * Null for undecodable payloads. */
  def dHash64(payload: Array[Byte],
      maxPixels: Long = DefaultMaxDecodePixels): java.lang.Long = {
    if (payload == null || payload.isEmpty) return null
    val img = safeDecode(payload, maxPixels)
    if (img == null) return null
    val (gw, gh) = (9, 8)
    val w = img.getWidth
    val h = img.getHeight
    if (w < gw || h < gh) return null
    val lum = Array.ofDim[Long](gw, gh)
    var cy = 0
    while (cy < gh) {
      val y0 = cy * h / gh; val y1 = (cy + 1) * h / gh
      var cx = 0
      while (cx < gw) {
        val x0 = cx * w / gw; val x1 = (cx + 1) * w / gw
        var sum = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            // integer BT.601-ish luma: (77 R + 151 G + 28 B) >> 8
            sum += (77 * ((rgb >> 16) & 0xff) + 151 * ((rgb >> 8) & 0xff) +
              28 * (rgb & 0xff)) >> 8
            x += 1
          }
          y += 1
        }
        lum(cx)(cy) = sum / ((y1 - y0).toLong * (x1 - x0))
        cx += 1
      }
      cy += 1
    }
    var bits = 0L
    var i = 0
    cy = 0
    while (cy < gh) {
      var cx = 0
      while (cx < gw - 1) {
        if (lum(cx)(cy) > lum(cx + 1)(cy)) bits |= (1L << i)
        i += 1
        cx += 1
      }
      cy += 1
    }
    bits
  }

  /** Column form of [[dHash64]]. */
  def dHashUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    dHashUdf(DefaultMaxDecodePixels)

  /** [[dHashUdf]] with an explicit pixel cap; pair with
    * [[decodeStatusUdf]] at the same cap to observe refusals. */
  def dHashUdf(maxPixels: Long): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (payload: Array[Byte]) =>
      Option(dHash64(payload, maxPixels)).map(_.longValue) }

  /** Batched decode pass: one partition = one batch, iterator-in /
    * iterator-out like `mapInPandas`, producing the compact metadata
    * projection via the header-only [[decodeHeader]]. */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeHeader(id, bytes) })
  }

  /** REAL resize for JDK raster formats: decode → smooth-scale to (w, h) →
    * re-encode as PNG. Payload stays opaque bytes end to end, runs batched
    * on executors, output size bounded by the target dims. Non-image
    * payloads map to null (filter or quarantine downstream). */
  def resizeUdf(w: Int, h: Int,
      maxPixels: Long = DefaultMaxDecodePixels) = udf { (payload: Array[Byte]) =>
    if (payload == null) null
    else {
      val src = safeDecode(payload, maxPixels)
      if (src == null) null
      else {
        val dst = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        try {
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(src, 0, 0, w, h, null)
        } finally g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(dst, "png", bos)
        bos.toByteArray
      }
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
        // Long + floorMod: `(i + (h & 0x7fffffff).toInt) % dim` overflows
        // Int with probability ~i/2^31 per byte — near-certain somewhere
        // in any payload ≳64 KB — and a negative index crashes the task.
        // The Long sum is identical wherever the Int sum did not overflow
        v(java.lang.Math.floorMod(i.toLong + (h & 0x7fffffffL),
          dim.toLong).toInt) += ((h >> 32).toInt % 1000) / 1000.0f
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
