package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** WebDataset-style tar-shard source (S2) — the reference's local-dataset
  * ingest path (vector_db.py:74-80: `wds.SimpleShardList` →
  * `wds.tarfile_to_samples()`), Spark-first: `binaryFile` lists and reads
  * the shards (one task per shard — exactly WebDataset's
  * shard-per-worker parallelism, so a 1000-shard corpus fans out over
  * 1000 tasks with no coordination), and a per-partition ustar parser
  * groups member files into samples by key.
  *
  * Sample grouping follows the WebDataset convention: key = member name
  * up to the FIRST dot of the basename (directories included), extension
  * = the remainder; consecutive members sharing a key form one sample
  * (`{"jpg": bytes, "json": bytes}`). Payloads stay opaque binary —
  * decode belongs downstream ([[graft.operators.Multimodal]]).
  *
  * Scale note: a shard is read whole by `binaryFile` (tar has no
  * splittable index), so shard SIZE is the parallelism knob — the
  * standard ~0.1-1 GB WebDataset shards fit executor memory comfortably.
  */
object WebDataset {

  /** One sample: shard path, WebDataset key, extension → payload. */
  final case class Sample(shard: String, key: String, files: Map[String, Array[Byte]])

  private val BlockSize = 512

  private def octal(b: Array[Byte], start: Int, len: Int): Long = {
    var i = start
    val end = start + len
    // skip leading spaces/NULs, read octal digits, ignore trailing junk
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    // GNU base-256 encoding (high bit set): unsupported — signal the
    // caller's tolerant stop rather than misparse as 0 and desync
    if (i < end && (b(i) & 0x80) != 0) return -1L
    var v = 0L
    while (i < end && b(i) >= '0' && b(i) <= '7') { v = (v << 3) + (b(i) - '0'); i += 1 }
    v
  }

  private def cString(b: Array[Byte], start: Int, max: Int): String = {
    var end = start
    while (end < start + max && b(end) != 0) end += 1
    new String(b, start, end - start, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Parse one ustar archive into ordered (name, payload) members.
    * Tolerant: stops at the end-of-archive zero block, skips non-file
    * entries (dirs, symlinks, PAX headers), never reads past the buffer
    * (truncated shards yield the complete leading members). */
  private[graft] def tarMembers(bytes: Array[Byte]): Seq[(String, Array[Byte])] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var off = 0
    var done = false
    while (!done && off + BlockSize <= bytes.length) {
      if (bytes(off) == 0) done = true // zero block = end of archive
      else {
        val name = {
          // POSIX ustar prefix field (345, 155 bytes) for long paths
          val prefix = cString(bytes, off + 345, 155)
          val base = cString(bytes, off, 100)
          if (prefix.nonEmpty) s"$prefix/$base" else base
        }
        val size = octal(bytes, off + 124, 12)
        val typeflag = bytes(off + 156)
        // all offset math in Long: a corrupt (or GNU base-256, unsupported)
        // size field must hit the tolerant stop below, not wrap through
        // Int and turn into a negative advance / AIOOBE
        val dataStart = off.toLong + BlockSize
        val dataEnd = dataStart + size
        val next = dataStart + ((size + BlockSize - 1) / BlockSize) * BlockSize
        if (size < 0 || next <= off || next > Int.MaxValue) done = true
        else {
          if ((typeflag == '0'.toByte || typeflag == 0.toByte) &&
              dataEnd <= bytes.length && name.nonEmpty)
            out += ((name,
              java.util.Arrays.copyOfRange(bytes, dataStart.toInt, dataEnd.toInt)))
          off = next.toInt
        }
      }
    }
    out.toSeq
  }

  /** WebDataset key split: (key, extension) — key runs to the first dot
    * of the basename, extension is everything after it. */
  private[graft] def keyExt(name: String): (String, String) = {
    val slash = name.lastIndexOf('/')
    val dot = name.indexOf('.', slash + 1)
    if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
  }

  private[graft] def groupSamples(
      shard: String, members: Seq[(String, Array[Byte])]): Seq[Sample] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Sample]
    var curKey: String = null
    var cur = scala.collection.mutable.LinkedHashMap.empty[String, Array[Byte]]
    def flush(): Unit =
      if (curKey != null && cur.nonEmpty) { out += Sample(shard, curKey, cur.toMap) }
    members.foreach { case (name, payload) =>
      val (key, ext) = keyExt(name)
      if (key != curKey) { flush(); curKey = key; cur = scala.collection.mutable.LinkedHashMap.empty }
      cur(ext) = payload
    }
    flush()
    out.toSeq
  }

  /** Read every `*.tar` under `path` into one row per sample:
    * (shard, key, files: map<ext, binary>). */
  def samples(spark: SparkSession, path: String): Dataset[Sample] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (shard, bytes) =>
        groupSamples(shard, tarMembers(bytes))
      })
  }

  /** Flat member view (one row per file), for pipelines that want the
    * pre-grouping shape: (shard, key, ext, payload). */
  def members(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    samples(spark, path)
      .flatMap(s => s.files.iterator.map { case (ext, p) => (s.shard, s.key, ext, p) })
      .toDF("shard", "key", "ext", "payload")
  }
}
