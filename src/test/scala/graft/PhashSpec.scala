package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Multimodal}

/** Perceptual-hash image dedup: dHash64 determinism and robustness, and
  * hamming64Pairs' pigeonhole recall against the brute-force pair scan.
  * (End-to-end decode→hash→join parity vs DuckDB is the multimodal_phash
  * oracle's job; this pins the operator-level contracts.) */
class PhashSpec extends SparkSpec {
  import spark.implicits._

  test("pixel cap is a parameter; refusals classify as 'oversized', " +
      "distinct from 'corrupt'") {
    val p = Multimodal.encodePng(7L, perturb = false) // 23x16 = 368 px
    // default cap: decodes and hashes
    assert(Multimodal.dHash64(p) !== null)
    assert(Multimodal.decodeStatus(p) === "ok")
    // a cap below the image's pixel count refuses the SAME payload —
    // and decodeStatus reports the loss as oversized, not corrupt
    assert(Multimodal.dHash64(p, maxPixels = 100L) === null)
    assert(Multimodal.decodeStatus(p, maxPixels = 100L) === "oversized")
    // corrupt stays corrupt at any cap (PNG signature, garbage header)
    val corrupt = Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10,
      1, 2, 3, 4, 5, 6, 7, 8)
    assert(Multimodal.decodeStatus(corrupt, maxPixels = 100L) === "corrupt")
    assert(Multimodal.decodeStatus(Array.empty[Byte]) === "empty")
    assert(Multimodal.decodeStatus("not an image".getBytes) === "unknown")
    // column form at the same cap: countable refusal surface
    val media = Multimodal.withPngPayload(
      spark.range(0, 8).toDF("id"), "id")
    val counts = media
      .select(Multimodal.decodeStatusUdf(100L)($"payload").as("st"))
      .groupBy("st").count().as[(String, Long)].collect().toMap
    assert(counts === Map("oversized" -> 8L))
  }

  test("dHash64 is a deterministic pure function of the payload") {
    val p = Multimodal.encodePng(7L, perturb = false)
    assert(Multimodal.dHash64(p) === Multimodal.dHash64(p.clone()))
    // re-encoding the same pixels yields the same hash (PNG lossless)
    assert(Multimodal.dHash64(Multimodal.encodePng(7L, perturb = false)) ===
      Multimodal.dHash64(p))
  }

  test("a 2x2 patch stays within the pipelines' join threshold (maxHamming=6)") {
    // multimodal_phash / dedup_phash_apply / StreamingSpec all join with
    // maxHamming = 6. A perturbed copy drifting past that would not break
    // engine/oracle parity (both sides agree) — it would silently drop the
    // fixture's intended near-dup positives. Pin the bound over BOTH the
    // query fixtures' perturbed ids (doc_id % 5 == 0, doc_id < 200) and
    // the local 0..40 range, at the exact pipeline threshold.
    ((0L until 200L by 5) ++ (0L until 40L)).foreach { id =>
      val a = Multimodal.dHash64(Multimodal.encodePng(id, perturb = false))
      val b = Multimodal.dHash64(Multimodal.encodePng(id, perturb = true))
      val d = java.lang.Long.bitCount(a ^ b)
      assert(d <= 6, s"id=$id perturbed dHash moved $d bits (> maxHamming 6)")
    }
  }

  test("dHash64 rejects null/empty/undecodable payloads") {
    assert(Multimodal.dHash64(null) === null)
    assert(Multimodal.dHash64(Array.emptyByteArray) === null)
    assert(Multimodal.dHash64("not a png".getBytes) === null)
  }

  test("poison payloads degrade, never crash: corrupt header, bomb dims, big embed") {
    // corrupt-but-sniffable: valid PNG signature, garbage after — the
    // header decode must degrade (corrupt/unknown), not throw
    val good = Multimodal.encodePng(7L, perturb = false)
    val truncated = java.util.Arrays.copyOfRange(good, 0, 20)
    val meta = Multimodal.decodeHeader(1L, truncated)
    assert(meta.format === "corrupt" || meta.format === "unknown")
    assert(Multimodal.dHash64(truncated) === null)
    // decompression bomb: patch the IHDR dims of a REAL tiny PNG to
    // 50000x50000 — the header-gated decode must refuse before any
    // pixel allocation (a ~10 GB raster), not OOM the executor
    val bomb = good.clone()
    def putBE(off: Int, v: Int): Unit = {
      bomb(off) = ((v >>> 24) & 0xff).toByte
      bomb(off + 1) = ((v >>> 16) & 0xff).toByte
      bomb(off + 2) = ((v >>> 8) & 0xff).toByte
      bomb(off + 3) = (v & 0xff).toByte
    }
    putBE(16, 50000) // IHDR width (8-byte sig + 4 len + 4 type)
    putBE(20, 50000) // IHDR height
    assert(Multimodal.dHash64(bomb) === null)
    // embedUdf on a payload large enough that the old 32-bit bucket
    // index arithmetic overflowed negative (~certain at 200 KB)
    import spark.implicits._
    val big: Array[Byte] =
      Array.tabulate(200 * 1024)(i => ((i * 31) & 0xff).toByte)
    val emb = Seq(Tuple1(big)).toDF("payload")
      .select(Multimodal.embedUdf(32)($"payload").as("v"))
      .head().getSeq[Float](0)
    assert(emb.length === 32)
    val norm = math.sqrt(emb.map(x => x.toDouble * x).sum)
    assert(math.abs(norm - 1.0) < 1e-5)
  }

  test("hamming64Pairs equals brute force within the pigeonhole bound") {
    val sig = (0L until 120L)
      .map(id => (id, Multimodal.dHash64(Multimodal.encodePng(id, perturb = false)).longValue()))
      .toDF("id", "h")
    val banded = Dedup.hamming64Pairs(sig, "id", "h",
        maxHamming = 6, numBands = 8)
      .select("left_id", "right_id", "hamming")
      .as[(Long, Long, Int)].collect().toSet
    val rows = sig.as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 6
    } yield (a, b, d)).toSet
    assert(banded === brute)
  }
}
