package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnIvf, AnnPq, Knn}

/** IVF-PQ: deterministic codebooks, byte codes, ADC recall, and the
  * two-stage refine contract on the sf0.001 embeddings (dim 64). */
class AnnPqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val index =
    AnnIvf.build(emb, "vec_id", "embedding", nlist = 4, seed = 42L)

  test("train is deterministic and shapes are (m x ksub x dsub)") {
    val a = AnnPq.train(emb, "embedding", m = 8, ksub = 16, seed = 7L)
    val b = AnnPq.train(emb, "embedding", m = 8, ksub = 16, seed = 7L)
    assert(a.dim === 64 && a.dsub === 8 && a.codeBytes === 8)
    assert(a.centers.length === 8)
    assert(a.centers.forall(_.length === a.ksub))
    assert(a.centers.flatten.flatten.toSeq === b.centers.flatten.flatten.toSeq)
  }

  test("encode emits m bytes per vector with codes in [0, ksub)") {
    val cb = AnnPq.train(emb, "embedding", m = 8, ksub = 16, seed = 7L)
    val codes = AnnPq.encode(index, cb, "vec_id", "embedding")
      .select("pq_code").as[Array[Byte]].collect()
    assert(codes.length === emb.count())
    assert(codes.forall(_.length === 8))
    assert(codes.forall(_.forall(b => (b & 0xff) < cb.ksub)))
  }

  test("ADC search recalls most true neighbors; refine recovers the rest") {
    val cb = AnnPq.train(emb, "embedding", m = 8, ksub = 256, seed = 42L)
    val encoded = AnnPq.encode(index, cb, "vec_id", "embedding")
    val queries = emb.filter($"vec_id" < 20)
    val bf = Knn.bruteForce(emb, queries, "vec_id", "vec_id", "embedding",
        k = 10, excludeSelf = false)
      .select($"query_id", $"vec_id").as[(Long, Long)].collect().toSet

    // nprobe = nlist isolates pure quantization error
    def recall(res: org.apache.spark.sql.DataFrame): Double = {
      val got = res.select($"query_id", $"vec_id")
        .as[(Long, Long)].collect().toSet
      got.intersect(bf).size.toDouble / bf.size
    }
    val adc = recall(AnnPq.searchADC(index, cb, encoded, queries,
      "vec_id", "embedding", k = 10, nprobe = 4))
    val refined = recall(AnnPq.searchADC(index, cb, encoded, queries,
      "vec_id", "embedding", k = 10, nprobe = 4, refine = 50))
    info(s"ADC recall@10 = $adc, refined(50) recall@10 = $refined")
    assert(adc >= 0.5) // 8-byte codes keep the neighborhood signal
    assert(refined >= adc - 1e-9) // exact re-rank never hurts
    assert(refined >= 0.8) // two-stage plan recovers ranking quality
  }

  test("durable write/read roundtrip: same codebooks, same search results") {
    val cb = AnnPq.train(emb, "embedding", m = 8, ksub = 16, seed = 7L)
    val encoded = AnnPq.encode(index, cb, "vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("annpq").toString
    AnnPq.write(encoded, cb, dir)
    val (codes2, cb2) = AnnPq.read(spark, dir)
    assert(cb2.dim === cb.dim && cb2.m === cb.m && cb2.ksub === cb.ksub)
    assert(cb2.centers.flatten.flatten.toSeq === cb.centers.flatten.flatten.toSeq)
    val q = emb.filter($"vec_id" < 5)
    def res(e: org.apache.spark.sql.DataFrame, c: AnnPq.Codebooks) =
      AnnPq.searchADC(index, c, e, q, "vec_id", "embedding", k = 5, nprobe = 4)
        .select($"query_id", $"vec_id", $"rank")
        .as[(Long, Long, Int)].collect().toSet
    assert(res(codes2, cb2) === res(encoded, cb))
    encoded.unpersist()
  }

  test("refine result carries exact scores, ADC-only carries adc_score") {
    val cb = AnnPq.train(emb, "embedding", m = 8, ksub = 16, seed = 7L)
    val encoded = AnnPq.encode(index, cb, "vec_id", "embedding")
    val q = emb.filter($"vec_id" === 0)
    val adcCols = AnnPq.searchADC(index, cb, encoded, q,
      "vec_id", "embedding", k = 5, nprobe = 4).columns
    assert(adcCols.contains("adc_score") && !adcCols.contains("score"))
    val refCols = AnnPq.searchADC(index, cb, encoded, q,
      "vec_id", "embedding", k = 5, nprobe = 4, refine = 20).columns
    assert(refCols.contains("score"))
  }
}
