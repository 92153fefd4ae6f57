package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal-marginal-relevance rerank (Carbonell & Goldstein, SIGIR'98):
  * greedily pick the candidate maximizing
  * `λ·rel(c) − (1−λ)·max_{s∈selected} sim(c, s)` — the diversity-aware
  * final stage of a retrieval pipeline (the reference serves raw top-k
  * only, neighborhood_server.py:209-226; a caller wanting diverse results
  * has no recourse but client-side post-processing).
  *
  * Distribution shape: the expensive part of serving stays in the
  * candidate generator ([[Knn.bruteForce]] / [[AnnIvf.search]] — corpus
  * scan, pruned probe); the rerank is O(k·N·d) over the ≤`maxCandidates`
  * survivors of ONE query, so it runs as a per-group tail inside
  * `flatMapGroups`, parallel across queries, never shuffling the corpus.
  *
  * Determinism/portability: relevance and pairwise similarities are
  * rounded to 6 dp (shortest-string HALF_UP — the engine-portable
  * convention of the query surface) BEFORE the greedy loop, and at the
  * default λ=0.5 the MMR objective is `0.5·(rel − maxSim)` — a subtraction
  * of exact inputs scaled by a power of two, so every comparison the
  * greedy makes is IEEE-exact and replayable in SQL (the `knn_mmr` oracle
  * is a recursive CTE running the same selection). Other λ values remain
  * deterministic across runs but lose the bit-exact SQL replay (same
  * trade-off as `Sampling.temperatureKeep`'s α=½).
  */
object Mmr {

  private def r6(x: Double): Double =
    // BigDecimal(Double) stringifies — NaN/Inf would throw
    // NumberFormatException in an executor; pass non-finites through
    if (!java.lang.Double.isFinite(x)) x
    else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    // a corpus with mixed dims is corrupt — a silently truncated dot is
    // a plausible-but-wrong similarity that changes which items MMR picks
    require(a.length == b.length,
      s"mmrRerank: candidate vector dims differ (${a.length} vs ${b.length})")
    var s = 0.0; var i = 0
    val n = a.length
    while (i < n) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  /** Rerank `candidates` (the bounded output of a prior top-N search) to
    * the `k` most marginally relevant per query.
    *
    * @param candidates (queryIdCol, idCol, vecCol, scoreCol) — scoreCol is
    *                   the relevance from the candidate generator; ids must
    *                   be integral
    * @param k          results per query (≤ candidates per query)
    * @param lambda     relevance/diversity trade-off; 0.5 is the
    *                   SQL-replayable default
    * @param maxCandidates hard per-query cap (the greedy is quadratic in
    *                   it); exceeding it fails loudly rather than letting
    *                   an unbounded candidate set hide a scan in a task
    * @return (query_id, id, rel, mmr, rank) with rank 1..k in pick order
    */
  def rerank(
      candidates: DataFrame,
      queryIdCol: String,
      idCol: String,
      vecCol: String,
      scoreCol: String,
      k: Int,
      lambda: Double = 0.5,
      maxCandidates: Int = 1024): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    candidates
      // rows the greedy cannot rank are EXCLUDED up front: a null vector
      // would NPE the pairwise pass, and a null/NaN relevance has no
      // place in a deterministic argmax (NaN compares false both ways)
      .filter(col(vecCol).isNotNull && col(scoreCol).isNotNull &&
        !isnan(col(scoreCol)))
      .select(col(queryIdCol).cast("long"), col(idCol).cast("long"),
        col(vecCol).cast("array<float>"), col(scoreCol).cast("double"))
      .as[(Long, Long, Array[Float], Double)]
      .groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cands = it.toArray.sortBy { case (_, id, _, rel) => (-rel, id) }
        require(cands.length <= maxCandidates,
          s"mmrRerank: query $qid has ${cands.length} candidates " +
            s"(cap $maxCandidates) — bound the generator's top-N first")
        val n = cands.length
        val rel = cands.map(c => r6(c._4))
        // pairwise candidate similarities, rounded like the query surface
        val sim = Array.ofDim[Double](n, n)
        var i = 0
        while (i < n) {
          var j = i + 1
          while (j < n) {
            val s = r6(dot(cands(i)._3, cands(j)._3))
            sim(i)(j) = s; sim(j)(i) = s
            j += 1
          }
          i += 1
        }
        val picked = Array.fill(n)(false)
        val maxSim = Array.fill(n)(0.0) // max sim to selected; 0 when empty
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Long, Double, Double, Int)]
        var step = 1
        while (step <= math.min(k, n)) {
          var best = -1; var bestMmr = 0.0
          var c = 0
          while (c < n) {
            if (!picked(c)) {
              val m = lambda * rel(c) - (1 - lambda) * (if (step == 1) 0.0 else maxSim(c))
              // tie-break: higher mmr, then lower id (cands sorted by
              // (-rel, id), so equal-mmr equal-id cannot occur twice)
              if (best < 0 || m > bestMmr ||
                  (m == bestMmr && cands(c)._2 < cands(best)._2)) {
                best = c; bestMmr = m
              }
            }
            c += 1
          }
          picked(best) = true
          out += ((qid, cands(best)._2, rel(best), r6(bestMmr), step))
          var u = 0
          while (u < n) {
            if (!picked(u)) {
              val s = sim(u)(best)
              if (step == 1 || s > maxSim(u)) maxSim(u) = s
            }
            u += 1
          }
          step += 1
        }
        out.iterator
      }
      .toDF("query_id", idCol, "rel", "mmr", "rank")
  }
}
