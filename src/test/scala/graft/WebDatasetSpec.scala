package graft

import graft.sources.WebDataset

/** S2: real tar-shard reading — ustar parsing, WebDataset sample
  * grouping, and the binaryFile-backed distributed read path
  * (reference: vector_db.py:74-80, wds.tarfile_to_samples). */
class WebDatasetSpec extends SparkSpec {

  /** Minimal conformant ustar writer (test fixture only). */
  private def tarOf(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    entries.foreach { case (name, data) =>
      val h = new Array[Byte](512)
      def put(s: String, off: Int): Unit = {
        val b = s.getBytes("US-ASCII"); System.arraycopy(b, 0, h, off, b.length)
      }
      put(name, 0)
      put("0000644", 100); put("0000000", 108); put("0000000", 116)
      put(f"${data.length}%011o", 124)
      put("00000000000", 136)
      h(156) = '0'
      put("ustar", 257); put("00", 263)
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      val sum = h.map(b => b & 0xff).sum
      put(f"$sum%06o", 148); h(154) = 0; h(155) = ' '
      bos.write(h)
      bos.write(data)
      bos.write(new Array[Byte]((512 - data.length % 512) % 512))
    }
    bos.write(new Array[Byte](1024)) // end-of-archive zero blocks
    bos.toByteArray
  }

  private def bytes(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("tar shard parses into WebDataset samples grouped by key") {
    val dir = java.nio.file.Files.createTempDirectory("wds").toString
    val tar = tarOf(
      "shard/0001.jpg" -> bytes("JPGDATA-1"),
      "shard/0001.json" -> bytes("""{"label":"cat"}"""),
      "shard/0002.jpg" -> bytes("JPGDATA-2"),
      "shard/0002.json" -> bytes("""{"label":"dog"}"""))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "part-0000.tar"), tar)

    val got = WebDataset.samples(spark, dir).collect().sortBy(_.key)
    assert(got.length === 2)
    assert(got(0).key === "shard/0001")
    assert(got(0).files.keySet === Set("jpg", "json"))
    assert(new String(got(0).files("jpg"), "UTF-8") === "JPGDATA-1")
    assert(new String(got(1).files("json"), "UTF-8") === """{"label":"dog"}""")
    assert(got.forall(_.shard.endsWith("part-0000.tar")))

    val flat = WebDataset.members(spark, dir)
    assert(flat.count() === 4)
  }

  test("multiple shards read in parallel, non-tar files ignored") {
    val dir = java.nio.file.Files.createTempDirectory("wds2").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.tar"),
      tarOf("x.txt" -> bytes("aa")))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.tar"),
      tarOf("y.txt" -> bytes("bb")))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "ignore.parquet"),
      bytes("not a tar"))
    val got = WebDataset.samples(spark, dir).collect()
    assert(got.map(_.key).toSet === Set("x", "y"))
  }

  test("truncated shard yields the complete leading members, no crash") {
    val full = tarOf("0001.jpg" -> bytes("A" * 600), "0002.jpg" -> bytes("B" * 600))
    // cut inside the second member's data: first survives, second dropped
    val truncated = java.util.Arrays.copyOfRange(full, 0, 512 + 1024 + 512 + 100)
    val members = WebDataset.tarMembers(truncated)
    assert(members.map(_._1) === Seq("0001.jpg"))
    assert(members.head._2.length === 600)
  }

  test("corrupt or base-256 size field stops tolerantly, never throws") {
    val tar = tarOf("0001.jpg" -> bytes("ok"), "0002.jpg" -> bytes("later"))
    // overwrite the SECOND header's size field with a huge octal value
    // whose padded advance wraps Int (would have been a negative .toInt)
    val second = 512 + 512 // first header + one padded data block
    System.arraycopy("77777777777".getBytes("US-ASCII"), 0, tar, second + 124, 11)
    val members = WebDataset.tarMembers(tar)
    assert(members.map(_._1) === Seq("0001.jpg")) // leading member survives
    // GNU base-256 size marker (0x80 first byte): unsupported → stop, the
    // zero-size misparse must not let the cursor land mid-payload
    val tar2 = tarOf("0001.jpg" -> bytes("ok"), "0002.jpg" -> bytes("x" * 600))
    tar2(second + 124) = 0x80.toByte
    val members2 = WebDataset.tarMembers(tar2)
    assert(members2.map(_._1) === Seq("0001.jpg"))
  }

  test("parseShard reports clean / truncated / corrupt-header status") {
    val clean = tarOf("0001.jpg" -> bytes("A" * 600))
    assert(WebDataset.parseShard(clean)._2 === "clean")
    val truncated = java.util.Arrays.copyOfRange(clean, 0, 512 + 300)
    assert(WebDataset.parseShard(truncated)._2 === "truncated")
    val corrupt = tarOf("0001.jpg" -> bytes("ok"), "0002.jpg" -> bytes("x"))
    corrupt(512 + 512 + 124) = 0x80.toByte // GNU base-256 marker
    assert(WebDataset.parseShard(corrupt)._2 === "corrupt-header")
    // the audit surfaces all three per shard — the observability the
    // tolerant ingest path deliberately lacks
    val dir = java.nio.file.Files.createTempDirectory("wds-audit").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.tar"), clean)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "b.tar"), truncated)
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "c.tar"), corrupt)
    val audit = WebDataset.auditShards(spark, dir).collect()
      .map(r => (r.shard.split('/').last, r.status, r.members)).sortBy(_._1)
    assert(audit.map(t => (t._1, t._2)).toSeq ===
      Seq(("a.tar", "clean"), ("b.tar", "truncated"),
        ("c.tar", "corrupt-header")))
    assert(audit.map(_._3).toSeq === Seq(1L, 0L, 1L))
  }

  test("keyExt follows the first-dot-of-basename convention") {
    assert(WebDataset.keyExt("dir/0001.seg.json") === ("dir/0001", "seg.json"))
    assert(WebDataset.keyExt("0001.jpg") === ("0001", "jpg"))
    assert(WebDataset.keyExt("dir.v2/0001.jpg") === ("dir.v2/0001", "jpg"))
    assert(WebDataset.keyExt("noext") === ("noext", ""))
  }

  test("ustar prefix field reconstructs long paths") {
    val tar = tarOf("0001.jpg" -> bytes("zz"))
    // patch in a prefix manually
    System.arraycopy("deep/prefix".getBytes("US-ASCII"), 0, tar, 345, 11)
    val members = WebDataset.tarMembers(tar)
    assert(members.map(_._1) === Seq("deep/prefix/0001.jpg"))
  }

  // ---- writeShards: the sink dual ----

  import spark.implicits._

  private def sampleDf(rows: Seq[(String, Map[String, Array[Byte]])], parts: Int = 1) =
    spark.createDataset(rows).toDF("key", "files").repartition(parts)
      .sortWithinPartitions("key")

  test("writeShards → samples roundtrips payloads bit-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("wds-sink").toString
    val rows = Seq(
      "0001" -> Map("jpg" -> bytes("J" * 700), "json" -> bytes("""{"y":1}""")),
      "0002" -> Map("jpg" -> Array.empty[Byte], "json" -> bytes("""{"y":2}""")),
      "0003" -> Map("txt" -> bytes("hello")))
    val info = WebDataset.writeShards(sampleDf(rows), "key", "files", dir)
    assert(info.map(_.samples).sum === 3)
    val got = WebDataset.samples(spark, dir).collect()
      .map(s => s.key -> s.files).toMap
    assert(got.keySet === rows.map(_._1).toSet)
    rows.foreach { case (k, files) =>
      assert(got(k).keySet === files.keySet, k)
      files.foreach { case (ext, p) =>
        assert(java.util.Arrays.equals(got(k)(ext), p), s"$k.$ext")
      }
    }
  }

  test("writeShards re-run publishes over prior output; temp files invisible") {
    // retry-safe publish contract: a retried/speculative attempt must not
    // collide on create (the pre-fix fs.create(path, false) threw
    // FileAlreadyExistsException), and a died-mid-write attempt leaves
    // only an attempt-suffixed temp the "*.tar" glob never matches
    val dir = java.nio.file.Files.createTempDirectory("wds-retry").toString
    val rows = Seq("0001" -> Map("txt" -> bytes("v1")))
    WebDataset.writeShards(sampleDf(rows), "key", "files", dir)
    // second run over the same dir = the retry: overwrites, no throw
    val rows2 = Seq("0001" -> Map("txt" -> bytes("v2-longer")))
    WebDataset.writeShards(sampleDf(rows2), "key", "files", dir)
    // a truncated leftover from a dead attempt is never read
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, ".shard-00000-0000.tar.inprogress-99"),
      bytes("garbage"))
    val got = WebDataset.samples(spark, dir).collect()
    assert(got.length === 1)
    assert(new String(got.head.files("txt"), "UTF-8") === "v2-longer")
  }

  test("writeShards rejects keys with a dot in the basename") {
    val dir = java.nio.file.Files.createTempDirectory("wds-dot").toString
    val bad = Seq("img.1" -> Map("jpg" -> bytes("x")))
    val e = intercept[org.apache.spark.SparkException] {
      WebDataset.writeShards(sampleDf(bad), "key", "files", dir)
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("dot in its basename")),
      messages(e).mkString(" | "))
    // dots in DIRECTORY components round-trip fine and stay allowed
    val ok = Seq("dir.v2/0001" -> Map("jpg" -> bytes("y")))
    WebDataset.writeShards(sampleDf(ok), "key", "files", dir)
    assert(WebDataset.samples(spark, dir).collect()
      .exists(_.key === "dir.v2/0001"))
  }

  test("samplesPerShard splits a partition into multiple tars; order preserved") {
    val dir = java.nio.file.Files.createTempDirectory("wds-split").toString
    val rows = (1 to 7).map(i => f"k$i%04d" -> Map("txt" -> bytes(s"payload-$i")))
    val info = WebDataset.writeShards(sampleDf(rows), "key", "files", dir,
      samplesPerShard = 3)
    assert(info.length === 3 && info.map(_.samples) === Seq(3L, 3L, 1L))
    // global read-back order across shard filenames == input order
    val keys = info.sortBy(_.shard).flatMap { si =>
      val tarBytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(new java.net.URI(si.shard).getPath match {
          case "" | null => si.shard
          case p => p
        }))
      WebDataset.tarMembers(tarBytes).map(m => WebDataset.keyExt(m._1)._1)
    }
    assert(keys === rows.map(_._1))
  }

  test("written member offsets equal the closed-form 512-block layout") {
    val dir = java.nio.file.Files.createTempDirectory("wds-layout").toString
    val payloads = Seq(0, 1, 511, 512, 513, 1300).zipWithIndex.map {
      case (n, i) => f"k$i%04d" -> Map("bin" -> Array.fill[Byte](n)('x'))
    }
    val info = WebDataset.writeShards(sampleDf(payloads), "key", "files", dir)
    assert(info.length === 1)
    val tar = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(info.head.shard).getPath))
    // the multimodal_tar_layout formula: entry_i = Σ_{j<i} 512 + ⌈size/512⌉·512
    var expected = 0L
    payloads.foreach { case (k, files) =>
      val size = files("bin").length
      // header at expected: name matches and parsed size matches
      val name = new String(tar.slice(expected.toInt, expected.toInt + 20), "UTF-8")
        .takeWhile(_ != '\u0000')
      assert(name === s"$k.bin", s"at offset $expected")
      expected += 512 + ((size + 511L) / 512) * 512
    }
    // end-of-archive blocks land right after the last member
    assert(info.head.bytes === expected + 1024)
    assert(tar.length === expected + 1024)
    assert(tar(expected.toInt) === 0)
  }

  test("writeShards is deterministic: identical input → bit-identical shards") {
    val d1 = java.nio.file.Files.createTempDirectory("wds-d1").toString
    val d2 = java.nio.file.Files.createTempDirectory("wds-d2").toString
    val rows = (1 to 5).map(i => f"k$i%04d" ->
      Map("a" -> bytes(s"A$i"), "b" -> bytes("B" * i)))
    val i1 = WebDataset.writeShards(sampleDf(rows), "key", "files", d1)
    val i2 = WebDataset.writeShards(sampleDf(rows), "key", "files", d2)
    val b1 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(i1.head.shard).getPath))
    val b2 = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(new java.net.URI(i2.head.shard).getPath))
    assert(java.util.Arrays.equals(b1, b2))
  }

  test("member names over 100 bytes fail loudly at write time") {
    val dir = java.nio.file.Files.createTempDirectory("wds-long").toString
    val rows = Seq(("k" * 120) -> Map("txt" -> bytes("x")))
    val e = intercept[Exception] {
      WebDataset.writeShards(sampleDf(rows), "key", "files", dir)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("1-100 bytes")))
  }
}
