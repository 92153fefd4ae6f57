package graft

import org.apache.spark.sql.functions._

import graft.operators.{Knn, Mmr}

/** MMR rerank contract: greedy λ·rel − (1−λ)·maxSim selection, exact
  * agreement with an independently-written driver-side greedy, and the
  * diversity behavior that motivates the operator. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  private def candidates(nq: Int, n: Int) =
    Knn.bruteForce(emb, emb.filter($"vec_id" < nq),
      "vec_id", "vec_id", "embedding", k = n, excludeSelf = true,
      score = (a, b) => round(graft.functions.VectorOps.dot(a, b), 6))

  test("first pick is the top-relevance candidate; ranks contiguous, ids unique") {
    val got = Mmr.rerank(candidates(3, 20), "query_id", "vec_id",
        "embedding", "score", k = 8)
      .select("query_id", "vec_id", "rel", "rank")
      .as[(Long, Long, Double, Int)].collect()
    val byQ = got.groupBy(_._1)
    assert(byQ.size === 3)
    byQ.foreach { case (_, rows) =>
      assert(rows.map(_._4).sorted.toSeq === (1 to 8))
      assert(rows.map(_._2).distinct.length === rows.length)
      val first = rows.find(_._4 == 1).get
      assert(first._3 === rows.map(_._3).max) // argmax 0.5·rel = max rel
    }
  }

  test("matches an independent driver-side greedy on real embeddings") {
    val cands = candidates(2, 15)
    val got = Mmr.rerank(cands, "query_id", "vec_id", "embedding",
        "score", k = 10)
      .select("query_id", "vec_id", "mmr", "rank")
      .as[(Long, Long, Double, Int)].collect()
      .sortBy(r => (r._1, r._4)).toSeq

    // reference greedy, written from the paper, not from the operator
    val raw = cands.select($"query_id", $"vec_id", $"embedding", $"score")
      .as[(Long, Long, Array[Float], Double)].collect()
    val want = raw.groupBy(_._1).toSeq.flatMap { case (qid, cs0) =>
      val cs = cs0.sortBy(c => (-c._4, c._2))
      def sim(a: Array[Float], b: Array[Float]): Double =
        r6(a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum)
      var selected = Vector.empty[Int]
      (1 to 10).map { step =>
        val best = cs.indices.filterNot(selected.contains).minBy { i =>
          val ms =
            if (selected.isEmpty) 0.0
            else selected.map(j => sim(cs(i)._3, cs(j)._3)).max
          (-(0.5 * (r6(cs(i)._4) - ms)), cs(i)._2)
        }
        val ms =
          if (selected.isEmpty) 0.0
          else selected.map(j => sim(cs(best)._3, cs(j)._3)).max
        selected = selected :+ best
        (qid, cs(best)._2, r6(0.5 * (r6(cs(best)._4) - ms)), step)
      }
    }.sortBy(r => (r._1, r._4))
    assert(got === want)
  }

  test("defers a near-duplicate of the top pick in favor of a diverse one") {
    val cands = Seq(
      (0L, 1L, Seq(0.990f, 0.141f), 0.990),  // top pick
      (0L, 2L, Seq(0.985f, 0.172f), 0.985),  // near-dup of 1
      (0L, 3L, Seq(0.700f, -0.714f), 0.700)) // diverse
      .toDF("query_id", "vec_id", "embedding", "score")
    val got = Mmr.rerank(cands, "query_id", "vec_id", "embedding",
        "score", k = 2)
      .select("vec_id", "rank").as[(Long, Int)].collect().sortBy(_._2)
    assert(got.toSeq === Seq((1L, 1), (3L, 2)))
  }

  test("λ=1 reduces to plain relevance ranking") {
    val got = Mmr.rerank(candidates(1, 12), "query_id", "vec_id",
        "embedding", "score", k = 12, lambda = 1.0)
      .select("vec_id", "rel", "rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    val byRel = got.sortBy(r => (-r._2, r._1)).map(_._1)
    assert(got.map(_._1).toSeq === byRel.toSeq)
  }

  test("candidate sets over the cap fail loudly") {
    val e = intercept[org.apache.spark.SparkException] {
      Mmr.rerank(candidates(1, 30), "query_id", "vec_id", "embedding",
        "score", k = 5, maxCandidates = 10).collect()
    }
    assert(e.getMessage.contains("mmrRerank") ||
      Option(e.getCause).exists(_.getMessage.contains("mmrRerank")))
  }
}
