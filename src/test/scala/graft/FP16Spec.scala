package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.{FP16, VectorOps}
import graft.streaming.EventStreams

class FP16Spec extends SparkSpec {
  import spark.implicits._

  test("fp16 pack/unpack: 2 bytes per element, bounded error, idempotent") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val got = emb.select(
      size($"embedding").as("dim"),
      length(FP16.packCol($"embedding")).as("packed_bytes"),
      round(VectorOps.l2Distance(
        FP16.unpackCol(FP16.packCol($"embedding")), $"embedding"), 6).as("err"),
      (FP16.packCol(FP16.unpackCol(FP16.packCol($"embedding"))) ===
        FP16.packCol($"embedding")).as("idempotent"))
    assert(got.filter($"packed_bytes" =!= $"dim" * 2).count() === 0)
    // unit vectors, 64 dims: per-element quantization ≤ 2^-11 ⇒ tiny L2 error
    assert(got.filter($"err" > 0.01).count() === 0)
    assert(got.filter(!$"idempotent").count() === 0)
    // scoring on dequantized vectors still ranks sanely: top-1 neighbor of
    // vec 0 under fp16 equals the fp32 top-1
    val packed = emb.select($"vec_id", FP16.unpackCol(FP16.packCol($"embedding")).as("embedding"))
    def top1(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Knn.bruteForce(df, df.filter($"vec_id" === 0L),
        "vec_id", "vec_id", "embedding", k = 1)
        .select("vec_id").as[Long].head()
    assert(top1(packed) === top1(emb.select($"vec_id", $"embedding")))
  }

  test("every NaN stays NaN through the half round trip; odd-length " +
      "binaries are refused") {
    // high-payload NaN (0x7fffffff): the rounding add overflows Int —
    // must not collapse to ±0; low-payload NaN (0x7f800001): top-13
    // mantissa bits are zero — must not collapse to ±Inf
    Seq(0x7fffffff, 0x7f800001, 0xffc00000, 0x7fc00000).foreach { bits =>
      val f = java.lang.Float.intBitsToFloat(bits)
      val back = FP16.halfToFloat(FP16.floatToHalf(f) & 0xffff)
      assert(back.isNaN, f"0x$bits%08x -> $back (expected NaN)")
    }
    // Inf and max-half survive unchanged
    assert(FP16.halfToFloat(FP16.floatToHalf(Float.PositiveInfinity) & 0xffff)
      === Float.PositiveInfinity)
    assert(FP16.halfToFloat(FP16.floatToHalf(Float.NegativeInfinity) & 0xffff)
      === Float.NegativeInfinity)
    val e = intercept[Exception] {
      Seq(Array[Byte](1, 2, 3)).toDF("b")
        .select(FP16.unpackCol($"b")).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("fp16_unpack"), msgs)
  }

  test("fp16 conversion properties over random + special values") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.oneOf(
      Gen.chooseNum(-65000f, 65000f),
      Gen.chooseNum(-1f, 1f),
      Gen.oneOf(0f, -0f, Float.NaN, Float.PositiveInfinity,
        Float.NegativeInfinity, 1e-7f, -1e-7f, 6.1e-5f, 65504f))
    val vals = (0 until 300).map(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)).get)
    vals.foreach { f =>
      val h = graft.functions.FP16.floatToHalf(f)
      val back = graft.functions.FP16.halfToFloat(h & 0xffff)
      // idempotency: a value already representable survives exactly
      assert(graft.functions.FP16.floatToHalf(back) === h, s"not idempotent for $f")
      if (f.isNaN) assert(back.isNaN)
      else if (f.isInfinite) assert(back === f)
      else if (math.abs(f) <= 65504f && math.abs(f) >= 6.2e-5f)
        // normal half range: relative error ≤ 2^-11 (+ rounding slack)
        assert(math.abs(back - f) <= math.abs(f) * 0.0005 + 1e-7, s"f=$f back=$back")
    }
  }

  test("fp16-compressed durable index: smaller on disk, searchable after read") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val index = graft.operators.AnnIvf.build(emb, "vec_id", "embedding", nlist = 8, seed = 42L)
    def dirSize(p: String): Long = {
      val d = new java.io.File(p)
      d.listFiles().filter(_.isFile).map(_.length).sum +
        d.listFiles().filter(_.isDirectory).map(f => dirSize(f.getPath)).sum
    }
    val full = java.nio.file.Files.createTempDirectory("ivf-f32").toString
    val half = java.nio.file.Files.createTempDirectory("ivf-f16").toString
    graft.operators.AnnIvf.write(index, full)
    graft.operators.AnnIvf.write(index, half, fp16 = true)
    val fullBytes = dirSize(s"$full/vectors")
    val halfBytes = dirSize(s"$half/vectors")
    assert(halfBytes < fullBytes * 0.75, s"fp16=$halfBytes vs fp32=$fullBytes")

    // search works transparently and matches search over hand-quantized
    // vectors (same fp16 values → same scores/ranking)
    val reread = graft.operators.AnnIvf.read(spark, half)
    assert(reread.assigned.schema("embedding").dataType.typeName === "array")
    val got = graft.operators.AnnIvf.searchPruned(reread,
      emb.filter($"vec_id" < 3), "vec_id", "embedding", k = 5, nprobe = 8)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    val quantized = emb.select($"vec_id",
      FP16.unpackCol(FP16.packCol($"embedding")).as("embedding"),
      $"label")
    val wantIdx = graft.operators.AnnIvf.Index(
      graft.operators.AnnIvf.assignPartitions(quantized, "embedding",
        index.centroids.orderBy("partition_id").collect().map(_.getSeq[Float](1).toArray)),
      index.centroids)
    val want = graft.operators.AnnIvf.search(wantIdx,
      emb.filter($"vec_id" < 3), "vec_id", "embedding", k = 5, nprobe = 8)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(got === want)
  }

  test("flatMapGroupsWithState: running per-user totals across micro-batches") {
    val batch = graft.queries.table(spark, sf0001, "events")
    val dir = java.nio.file.Files.createTempDirectory("fmgs").toString
    batch.repartition(4).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batch.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val q = EventStreams.userRunningStats(stream)
      .writeStream.format("memory").queryName("fmgs_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    // the LAST snapshot per user equals the batch totals
    val lastSnap = spark.table("fmgs_out")
      .groupBy("user_id").agg(max(struct($"n_events", $"total_value")).as("s"))
      .select($"user_id", $"s.n_events".as("n_events"))
    val want = batch.groupBy("user_id").agg(count(lit(1)).as("n_events"))
    assert(lastSnap.join(want, Seq("user_id", "n_events")).count() === want.count())
    // multiple snapshots per user ⇒ state really crossed batches
    assert(spark.table("fmgs_out").count() > want.count())
  }
}
