package graft

import org.apache.spark.sql.functions._

import graft.functions.{SQ8, VectorOps}
import graft.operators.AnnIvf

class Sq8Spec extends SparkSpec {
  import spark.implicits._

  test("sq8: 1 byte per element, error within step/2, clamps out-of-range") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val b = SQ8.train(emb, "embedding")
    assert(b.dim === 64)
    // trained bounds actually bracket the corpus
    val rows = emb.select($"embedding").as[Seq[Float]].collect()
    for (d <- 0 until b.dim) {
      assert(rows.map(_(d)).min === b.vmin(d))
      assert(rows.map(_(d)).max === b.vmax(d))
    }
    val got = emb.select(
      size($"embedding").as("dim"),
      length(SQ8.packCol(b, $"embedding")).as("packed_bytes"),
      SQ8.unpackCol(b, SQ8.packCol(b, $"embedding")).as("rt"),
      $"embedding")
    assert(got.filter($"packed_bytes" =!= $"dim").count() === 0)
    // per-dimension midpoint reconstruction: |err| <= step/2 everywhere
    got.select($"rt", $"embedding").as[(Seq[Float], Seq[Float])]
      .collect().foreach { case (rt, orig) =>
        for (d <- 0 until b.dim) {
          val step = (b.vmax(d) - b.vmin(d)) / 256.0f
          assert(math.abs(rt(d) - orig(d)) <= step / 2 + 1e-6, s"dim $d")
        }
      }
    // out-of-range values clamp to the extreme codes (the FAISS contract)
    val wild = Seq(Seq.fill(64)(1e9f), Seq.fill(64)(-1e9f)).toDF("embedding")
    val codes = wild.select(SQ8.packCol(b, $"embedding")).as[Array[Byte]].collect()
    assert(codes(0).forall(c => (c & 0xff) === 255))
    assert(codes(1).forall(_ === 0))
  }

  test("train: null vectors dropped, ragged dims refused loudly") {
    val ok = Seq((1L, Some(Seq(1f, 2f))), (2L, Option.empty[Seq[Float]]),
      (3L, Some(Seq(-1f, 5f)))).toDF("id", "v")
    val b = SQ8.train(ok, "v") // one null row: no NPE
    assert(b.vmin.toSeq === Seq(-1f, 2f) && b.vmax.toSeq === Seq(1f, 5f))
    val ragged = Seq(Seq(1f, 2f), Seq(1f, 2f, 3f)).toDF("v")
    val e = intercept[Exception] { SQ8.train(ragged, "v") }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("ragged"), msgs)
  }

  test("oobCountCol: exact strict-outside count; longer vectors don't crash") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val b = SQ8.train(emb.filter($"vec_id" < 250), "embedding")
    // scalar recompute on the held-out half — exact count parity
    val got = emb.filter($"vec_id" >= 250)
      .select($"embedding", SQ8.oobCountCol(b, $"embedding").as("oob"))
      .as[(Seq[Float], Int)].collect()
    got.foreach { case (v, oob) =>
      val expect = v.indices.count(d => v(d) < b.vmin(d) || v(d) > b.vmax(d))
      assert(oob === expect)
    }
    assert(got.map(_._2).sum > 0, "held-out half should drift somewhere")
    // a MALFORMED vector longer than the trained dim counts its overflow
    // elements as 0 instead of raising under ANSI (try_element_at): the
    // observability path must not introduce a crash packCol doesn't have
    val long = Seq((1L, Seq.fill(80)(1e9f))).toDF("vec_id", "embedding")
    val n = long.select(SQ8.oobCountCol(b, $"embedding").as("oob"))
      .as[Int].head()
    assert(n === 64, s"64 in-dim elements all out of bounds, got $n")
  }

  test("sq8 ADC: direct-on-codes dot tracks decode-then-dot, same ranking") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val b = SQ8.train(emb, "embedding")
    val q = emb.filter($"vec_id" === 0L)
      .select($"embedding").as[Seq[Float]].head().toArray
    val packed = emb.select($"vec_id", SQ8.packCol(b, $"embedding").as("codes"))
    val both = packed.select($"vec_id",
      SQ8.dotCodesUdf(b, q)($"codes").as("adc"),
      VectorOps.dot(SQ8.unpackCol(b, $"codes"),
        lit(q.map(_.toDouble)).cast("array<float>")).as("dec"))
      .as[(Long, Double, Double)].collect()
    both.foreach { case (id, adc, dec) =>
      assert(math.abs(adc - dec) < 1e-4, s"vec $id: $adc vs $dec")
    }
    // top-1 by either scoring is the same vector
    val top = (s: ((Long, Double, Double)) => Double) =>
      both.filter(_._1 != 0L).maxBy(s)._1
    assert(top(_._2) === top(_._3))
    // dimension mismatch fails fast
    intercept[IllegalArgumentException] { SQ8.dotCodesUdf(b, q.take(3)) }
  }

  test("sq8 durable index: write/read roundtrip, search ranks like fp32") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val index = AnnIvf.build(emb, "vec_id", "embedding", nlist = 4, seed = 42L)
    val dir = java.nio.file.Files.createTempDirectory("sq8-idx").toString
    AnnIvf.write(index, dir, writeSalt = 2, sq8 = true, vecCol = "embedding")
    val back = AnnIvf.read(spark, dir)
    assert(back.writeSalt === 2)
    assert(back.assigned.columns.contains("embedding"))
    assert(back.assigned.count() === emb.count())
    // decoded vectors are close (unit vectors, 64 dims: sq8 L2 error small)
    val err = back.assigned.select($"vec_id", $"embedding".as("rt"))
      .join(emb.select($"vec_id", $"embedding"), Seq("vec_id"))
      .select(round(VectorOps.l2Distance($"rt", $"embedding"), 6).as("e"))
      .agg(max($"e")).as[Double].head()
    assert(err < 0.02, s"l2 err $err")
    // exhaustive search on the sq8 index returns the fp32 top-1
    def top1(ix: AnnIvf.Index) =
      AnnIvf.search(ix, emb.filter($"vec_id" === 0L), "vec_id", "embedding",
        k = 2, nprobe = 4)
        .filter($"vec_id" =!= 0L)
        .orderBy($"rank").select($"vec_id").as[Long].head()
    assert(top1(back) === top1(index))
    // fp16 and sq8 are mutually exclusive codecs
    intercept[IllegalArgumentException] {
      AnnIvf.write(index, dir, fp16 = true, sq8 = true)
    }
  }
}
