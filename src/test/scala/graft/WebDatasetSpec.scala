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
}
