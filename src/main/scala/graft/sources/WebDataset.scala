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

  /** Parse one ustar archive into ordered (name, payload) members plus a
    * parse status: "clean" (end-of-archive zero block reached),
    * "truncated" (buffer ended mid-archive), or "corrupt-header" (a
    * non-zero header whose size field is garbage or GNU base-256 —
    * unsupported). Tolerant by contract: either non-clean status stops
    * the parse and keeps the complete leading members (WebDatasetSpec
    * pins it) — [[auditShards]] is how the silent tail loss is SEEN. */
  private[graft] def parseShard(bytes: Array[Byte])
      : (Seq[(String, Array[Byte])], String) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Byte])]
    var off = 0
    var status: String = null
    while (status == null && off + BlockSize <= bytes.length) {
      if (bytes(off) == 0) status = "clean" // zero block = end of archive
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
        if (size < 0 || next <= off || next > Int.MaxValue)
          status = "corrupt-header"
        else {
          if ((typeflag == '0'.toByte || typeflag == 0.toByte) &&
              dataEnd <= bytes.length && name.nonEmpty)
            out += ((name,
              java.util.Arrays.copyOfRange(bytes, dataStart.toInt, dataEnd.toInt)))
          off = next.toInt
        }
      }
    }
    (out.toSeq, if (status == null) "truncated" else status)
  }

  /** Members only — the tolerant ingest view over [[parseShard]]. */
  private[graft] def tarMembers(bytes: Array[Byte]): Seq[(String, Array[Byte])] =
    parseShard(bytes)._1

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

  /** One row of [[auditShards]]. */
  final case class ShardAuditRow(shard: String, bytes: Long, members: Long,
      samples: Long, status: String)

  /** Per-shard parse audit — the observability behind the reader's
    * tolerant-stop contract: truncation or a corrupt header silently
    * drops the TAIL members of a shard by design, which at a 100 TB
    * corpus is undetectable training-data loss unless something looks.
    * One row per shard with member/sample counts and the parse status
    * ("clean" | "truncated" | "corrupt-header"); schedule it like any
    * data-quality scan and alert on status != "clean". Same
    * shard-per-task fan-out as [[samples]]. */
  def auditShards(spark: SparkSession, path: String): Dataset[ShardAuditRow] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.tar")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (shard, bytes) =>
        val (members, status) = parseShard(bytes)
        ShardAuditRow(shard, bytes.length.toLong, members.size.toLong,
          groupSamples(shard, members).size.toLong, status)
      }
  }

  // ---- sink: the writer dual of the source ----

  /** One written shard: path, samples packed, bytes on disk. */
  final case class ShardInfo(shard: String, samples: Long, bytes: Long)

  private def octalField(v: Long, len: Int): Array[Byte] = {
    val digits = len - 1
    val s = java.lang.Long.toOctalString(v)
    require(v >= 0 && s.length <= digits, s"value $v overflows $digits octal digits")
    val out = new Array[Byte](len)
    var i = 0
    while (i < digits - s.length) { out(i) = '0'; i += 1 }
    s.foreach { c => out(i) = c.toByte; i += 1 }
    out(len - 1) = 0
    out
  }

  /** Deterministic POSIX ustar header for a regular file: mode 0644,
    * uid/gid 0, mtime 0 — byte-identical across runs, so a re-written
    * shard of identical samples is bit-identical (the reproducibility
    * contract the parquet side gets from deterministic plans). */
  private[graft] def tarHeader(name: String, size: Long): Array[Byte] = {
    val nb = name.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    require(nb.length > 0 && nb.length <= 100,
      s"tar member name must be 1-100 bytes, got ${nb.length}: $name")
    val h = new Array[Byte](BlockSize)
    System.arraycopy(nb, 0, h, 0, nb.length)
    System.arraycopy(octalField(0x1a4 /* 0644 */, 8), 0, h, 100, 8)
    System.arraycopy(octalField(0, 8), 0, h, 108, 8)
    System.arraycopy(octalField(0, 8), 0, h, 116, 8)
    System.arraycopy(octalField(size, 12), 0, h, 124, 12)
    System.arraycopy(octalField(0, 12), 0, h, 136, 12)
    h(156) = '0'
    // magic "ustar\0" + version "00"
    val magic = Array[Byte]('u', 's', 't', 'a', 'r', 0, '0', '0')
    System.arraycopy(magic, 0, h, 257, 8)
    // checksum over the header with the checksum field itself as spaces,
    // stored as 6 octal digits + NUL + space (the historical format)
    java.util.Arrays.fill(h, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += h(i) & 0xff; i += 1 }
    val cs = java.lang.Long.toOctalString(sum)
    i = 0
    while (i < 6 - cs.length) { h(148 + i) = '0'; i += 1 }
    cs.foreach { c => h(148 + i) = c.toByte; i += 1 }
    h(154) = 0
    h(155) = ' '
    h
  }

  /** Pack (key, files) rows into WebDataset tar shards under `dir` —
    * the export half of the multimodal story (the source reads training
    * shards; this writes them, e.g. after dedup/curation, for a
    * WebDataset-consuming dataloader). One task per input partition,
    * `samplesPerShard` samples per tar (the WebDataset sizing knob:
    * shard size = download/parallelism granularity at training time);
    * members are `key.ext` with extensions emitted in sorted order, and
    * headers are deterministic ([[tarHeader]]), so layout is a pure
    * function of (partitioning, row order, payloads) — callers fix the
    * first two with `repartitionByRange(...).sortWithinPartitions(...)`
    * upstream and offsets become closed-form 512-block arithmetic (the
    * `multimodal_tar_layout` query's oracle).
    *
    * Scale shape: streaming write per task through the Hadoop
    * FileSystem API (local/HDFS/object store), no shard ever buffered
    * whole; driver work is only the returned one-row-per-shard
    * manifest. Executor-side `Configuration()` inherits the cluster's
    * site configs from the classpath, as on any real deployment.
    * Publish protocol: each shard streams to an attempt-suffixed temp
    * name and renames into place (last attempt wins) — task retries and
    * speculative execution are safe, and a died-mid-write attempt leaves
    * only a temp file the reader glob never matches, never a truncated
    * `.tar` the tolerant parser would silently accept. Keys with a dot
    * in the basename are rejected (they would not round-trip through
    * the first-dot key/extension split). */
  def writeShards(
      samples: DataFrame,
      keyCol: String,
      filesCol: String,
      dir: String,
      samplesPerShard: Int = 1000): Seq[ShardInfo] = {
    require(samplesPerShard > 0, "samplesPerShard must be positive")
    val spark = samples.sparkSession
    import spark.implicits._
    val rows = samples.select(
      col(keyCol).cast("string").as("key"),
      col(filesCol).as("files"))
    val out = rows.as[(String, Map[String, Array[Byte]])]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val conf = new org.apache.hadoop.conf.Configuration()
        val root = new org.apache.hadoop.fs.Path(dir)
        val fs = root.getFileSystem(conf)
        fs.mkdirs(root)
        val shards = scala.collection.mutable.ArrayBuffer.empty[ShardInfo]
        var seq = 0
        // retry-safe publish: task retries and speculative attempts must
        // neither collide on create nor leave a truncated FINAL shard the
        // tolerant reader would silently accept — each shard streams to an
        // attempt-suffixed temp name the "*.tar" reader glob never
        // matches, then renames into place last-attempt-wins
        val attemptId = Option(org.apache.spark.TaskContext.get())
          .map(_.taskAttemptId()).getOrElse(0L)
        while (it.hasNext) {
          val name = f"shard-$pid%05d-$seq%04d.tar"
          val path = new org.apache.hadoop.fs.Path(root, name)
          val tmp = new org.apache.hadoop.fs.Path(root,
            s".$name.inprogress-$attemptId")
          val os = fs.create(tmp, true)
          var n = 0L
          var bytes = 0L
          try {
            while (it.hasNext && n < samplesPerShard) {
              val (key, files) = it.next()
              // dotted BASENAMES do not round-trip: the read side splits
              // key/extension at the first dot of the basename, so a key
              // like "img.1" would regroup under sample "img" on read —
              // reject at write instead of silently mangling the corpus
              // (dots in DIRECTORY components are fine)
              val base = key.substring(key.lastIndexOf('/') + 1)
              require(!base.contains('.'),
                s"WebDataset key '$key' has a dot in its basename — keys " +
                  "split at the first dot on read and would not round-trip")
              files.toSeq.sortBy(_._1).foreach { case (ext, payload) =>
                val member = if (ext.isEmpty) key else s"$key.$ext"
                os.write(tarHeader(member, payload.length.toLong))
                os.write(payload)
                val pad = (BlockSize - payload.length % BlockSize) % BlockSize
                if (pad > 0) os.write(new Array[Byte](pad))
                bytes += BlockSize + payload.length + pad
              }
              n += 1
            }
            // end-of-archive: two zero blocks
            os.write(new Array[Byte](2 * BlockSize))
            bytes += 2 * BlockSize
          } finally os.close()
          // rename-into-place publish assumes an atomic move; on
          // copy+delete object stores the invisible-shard window widens
          // to the whole copy — warn loud (once per executor JVM)
          graft.operators.warnIfNonAtomicRename(
            fs, path.toString, "writeShards")
          fs.delete(path, false)
          require(fs.rename(tmp, path),
            s"writeShards: cannot publish $tmp -> $path")
          shards += ShardInfo(path.toString, n, bytes)
          seq += 1
        }
        shards.iterator
      }
    out.collect().toSeq.sortBy(_.shard)
  }
}
