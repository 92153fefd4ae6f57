package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnIvf, Knn}

/** Pre-filtered vector search: the metadata predicate runs inside the
  * probed cells before scoring, so the top-k is over the filtered corpus
  * — exact at nprobe = nlist (the `ann_filtered_search` oracle's
  * premise), predicate-complete at any nprobe, and identical between the
  * in-memory and durable (pruned) serving paths. */
class FilteredSearchSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private val nlist = 8
  private lazy val index =
    AnnIvf.build(emb, "vec_id", "embedding", nlist = nlist, seed = 42L)
  private val rounded = (a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =>
    round(graft.functions.VectorOps.dot(a, b), 6)

  test("filtered search at nprobe = nlist equals filtered brute force") {
    val got = AnnIvf.search(index, emb.filter($"vec_id" < 4), "vec_id",
        "embedding", k = 5, nprobe = nlist,
        candidateFilter = $"label" === 1 && $"vec_id" =!= $"query_id",
        score = rounded)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    val want = Knn.bruteForce(emb.filter($"label" === 1),
        emb.filter($"vec_id" < 4), "vec_id", "vec_id", "embedding",
        k = 5, excludeSelf = true, score = rounded)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    assert(got.toSeq === want.toSeq)
  }

  test("every pruned-probe result satisfies the predicate, k-bounded") {
    val got = AnnIvf.search(index, emb.filter($"vec_id" < 6), "vec_id",
        "embedding", k = 4, nprobe = 2,
        candidateFilter = $"label" === 0)
      .select("query_id", "label")
      .as[(Long, Int)].collect()
    assert(got.nonEmpty)
    assert(got.forall(_._2 === 0))
    got.groupBy(_._1).foreach { case (_, rs) => assert(rs.length <= 4) }
  }

  test("durable pruned path agrees with the in-memory path under a filter") {
    val mem = AnnIvf.search(index, emb.filter($"vec_id" < 4), "vec_id",
        "embedding", k = 3, nprobe = 2, candidateFilter = $"label" === 1)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    val pruned = AnnIvf.searchPruned(index, emb.filter($"vec_id" < 4),
        "vec_id", "embedding", k = 3, nprobe = 2,
        candidateFilter = $"label" === 1)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    assert(mem.toSeq === pruned.toSeq)
  }

  test("filtered knnJoin at nprobe = nlist equals filtered brute force") {
    val got = AnnIvf.knnJoin(index, "vec_id", "embedding", k = 3,
        nprobe = nlist, score = rounded,
        querySide = $"vec_id" < 4, candidateFilter = $"label" === 1)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    val want = Knn.bruteForce(emb.filter($"label" === 1),
        emb.filter($"vec_id" < 4), "vec_id", "vec_id", "embedding",
        k = 3, excludeSelf = true, score = rounded)
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3))
    assert(got.nonEmpty)
    assert(got.toSeq === want.toSeq)
  }

  test("a filter selective enough to empty probed cells returns fewer rows, never wrong ones") {
    val got = AnnIvf.search(index, emb.filter($"vec_id" === 0), "vec_id",
        "embedding", k = 5, nprobe = 1,
        candidateFilter = $"vec_id" === -1L)
    assert(got.count() === 0)
  }
}
