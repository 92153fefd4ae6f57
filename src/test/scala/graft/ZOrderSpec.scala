package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ZOrder64

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave bit pattern and ordering semantics") {
    assert(ZOrder64.spread(5L) === 17L) // 0b101 → bits {0,2} → {0,4}
    assert(ZOrder64.spread(3L) === 5L) // 0b011 → {0,1} → {0,2}
    // raw word for small positives (offset cancels into bit 62/63)
    val z53 = ZOrder64.rawInterleave(5L + Int.MinValue, 3L + Int.MinValue)
    assert((z53 & 0xffL) === 27L) // 17 | (5 << 1)
    // signed ordering: negatives below positives, monotone in each arg
    assert(ZOrder64.interleave(-1L, 0L) < ZOrder64.interleave(1L, 0L))
    assert(ZOrder64.interleave(0L, -5L) < ZOrder64.interleave(0L, 5L))
    assert(ZOrder64.interleave(7L, 7L) < ZOrder64.interleave(8L, 8L))
  }

  test("z-ordered layout makes files prunable on the SECOND column too") {
    // uniform 128×128 grid, one row per cell, 16 files of 1024 rows
    val grid = spark.range(128L * 128L)
      .select(($"id" / 128).cast("long").as("a"), ($"id" % 128).cast("long").as("b"))

    def bSpanFraction(sortCol: org.apache.spark.sql.Column): Double = {
      val dir = java.nio.file.Files.createTempDirectory("zorder").toString
      grid.repartition(1).sortWithinPartitions(sortCol)
        .write.mode("overwrite").option("maxRecordsPerFile", 1024).parquet(dir)
      // per-file span of b, normalized: the probability a random b-filter
      // must read that file
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(((max("b") - min("b") + 1) / 128.0).as("frac"))
        .agg(avg("frac")).as[Double].head()
    }

    val zFrac = bSpanFraction(ZOrder64(col("a"), col("b")))
    val aSortFrac = bSpanFraction(col("a"))
    // sort-by-a leaves every file spanning all of b (fraction ≈ 1);
    // z-order confines each file to a 32-wide b tile (fraction ≈ 0.25)
    assert(aSortFrac > 0.9, s"aSort=$aSortFrac")
    assert(zFrac < 0.5, s"z=$zFrac vs aSort=$aSortFrac")
  }

  test("hilbert: aligned blocks are contiguous index ranges; bijective on a grid") {
    import graft.functions.Hilbert64
    // every aligned 16×16 block maps to a CONTIGUOUS run of 256 curve
    // positions — the defining locality property Morton order lacks
    for (bx <- Seq(0L, 16L, 64L); by <- Seq(0L, 48L)) {
      val ds = for (x <- 0 until 16; y <- 0 until 16)
        yield Hilbert64.index(bx + x, by + y)
      assert(ds.distinct.size === 256)
      assert(ds.max - ds.min === 255L, s"block ($bx,$by) not contiguous")
    }
    // signed ordering conventions match ZOrder64
    assert(Hilbert64.index(-1L, 0L) < Hilbert64.index(1L << 20, 0L))
    assert(Hilbert64.index(Long.MinValue, 0L) === Hilbert64.index(Int.MinValue.toLong, 0L))
    assert(Hilbert64.index(1L << 32, 0L) === Hilbert64.index(Int.MaxValue.toLong, 0L))
  }

  test("hilbert layout prunes at least as well as z-order on the second column") {
    import graft.functions.Hilbert64
    val grid = spark.range(128L * 128L)
      .select(($"id" / 128).cast("long").as("a"), ($"id" % 128).cast("long").as("b"))
    def bSpanFraction(sortCol: org.apache.spark.sql.Column): Double = {
      val dir = java.nio.file.Files.createTempDirectory("hilbert").toString
      grid.repartition(1).sortWithinPartitions(sortCol)
        .write.mode("overwrite").option("maxRecordsPerFile", 1024).parquet(dir)
      spark.read.parquet(dir)
        .groupBy(input_file_name())
        .agg(((max("b") - min("b") + 1) / 128.0).as("frac"))
        .agg(avg("frac")).as[Double].head()
    }
    val hFrac = bSpanFraction(Hilbert64(col("a"), col("b")))
    val zFrac = bSpanFraction(ZOrder64(col("a"), col("b")))
    assert(hFrac < 0.5, s"hilbert=$hFrac")
    assert(hFrac <= zFrac + 0.05, s"hilbert=$hFrac vs z=$zFrac")
  }

  test("out-of-32-bit longs saturate instead of wrapping") {
    // 2^32 must NOT alias 0 (the old wrap) — it clamps to Int.MaxValue
    assert(ZOrder64.interleave(1L << 32, 0L) === ZOrder64.interleave(Int.MaxValue.toLong, 0L))
    assert(ZOrder64.interleave(1L << 32, 0L) !== ZOrder64.interleave(0L, 0L))
    assert(ZOrder64.interleave(Long.MinValue, 0L) === ZOrder64.interleave(Int.MinValue.toLong, 0L))
    // ordering stays monotone across the domain edge
    val xs = Seq(-(1L << 40), Int.MinValue.toLong, -5L, 0L, 5L,
      Int.MaxValue.toLong, 1L << 40)
    val zs = xs.map(ZOrder64.interleave(_, 0L))
    assert(zs === zs.sorted)
  }
}
