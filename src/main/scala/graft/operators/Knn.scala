package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Exact (brute-force) k-nearest-neighbor search: the reference's
  * per-partition `IndexFlatIP` flat scan generalized to a DataFrame operator
  * (reference: query/neighborhood_server.py:163-170, 209-219).
  *
  * Shape: broadcast the (small) query set against the (large) vector table,
  * score with a codegen'd fp64 dot product, then take the per-query top-k
  * with a rank window — Spark ≥3.5 rewrites the rank filter into
  * `WindowGroupLimit`, so each shuffle partition keeps only k rows per query
  * before the exchange (the same partial-top-k-then-merge the reference does
  * across partitions and servers, §3.2/§3.3).
  *
  * Ranking is by **descending similarity** with ascending id tiebreak — the
  * reference's stated intent, not its ascending-sort merge bug
  * (SURVEY.md §2.6 semantics flag).
  */
object Knn {

  /** Top-k neighbors for every query row.
    *
    * @param vectors   candidate table: (idCol, vecCol, …payload)
    * @param queries   query table: (queryIdCol, vecCol); must be small
    *                  enough to broadcast (the serving-path contract)
    * @param k         neighbors per query
    * @param score     scoring fn, default inner product (≡ cosine on the
    *                  reference's L2-normalized vectors)
    */
  def bruteForce(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      queryIdCol: String,
      vecCol: String,
      k: Int,
      excludeSelf: Boolean = true,
      score: (Column, Column) => Column = VectorOps.dot): DataFrame = {
    val q = broadcast(
      queries.select(
        col(queryIdCol).as("query_id"),
        col(vecCol).as("__query_vec")))
    val joined = vectors.crossJoin(q)
    val filtered =
      if (excludeSelf) joined.filter(col(idCol) =!= col("query_id"))
      else joined
    val scored = filtered
      .withColumn("score", score(col(vecCol), col("__query_vec")))
      .drop("__query_vec")
    topKPerGroup(scored, Seq(col("query_id")), k,
      desc("score"), asc(idCol))
  }

  /** Blocked brute-force KNN: the same contract as [[bruteForce]] (and
    * bit-identical scores/ranking — spec-checked) but executed as one
    * `mapPartitions` pass with primitive-array math and an in-scan bounded
    * top-k per query per partition.
    *
    * Why it wins at scale: the crossJoin plan materializes
    * |queries|·|corpus| joined rows before the window group-limit trims
    * them; this never materializes a pair — each task keeps k entries per
    * query and emits only |queries|·k rows into the final merge. Same
    * partial/merge structure as the reference's per-partition FAISS search
    * + client merge (SURVEY.md §3.2-3.3).
    *
    * Output: (query_id, id, score, rank) — join payload columns back by id.
    */
  def bruteForceBlocked(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      queryIdCol: String,
      vecCol: String,
      k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    requireIntegralId(vectors, idCol, "bruteForceBlocked")
    requireIntegralId(queries, queryIdCol, "bruteForceBlocked")
    // contract parity with bruteForce, which returns 0 rows for k <= 0
    // via its rank filter; the blocked accumulator would instead throw
    // buf.last-on-Nil deep inside a task
    if (k <= 0)
      return bruteForce(vectors, queries, idCol, queryIdCol, vecCol, k,
        excludeSelf)
    val spark = vectors.sparkSession
    import spark.implicits._
    val qArr: Array[(Long, Array[Float])] = queries
      .select(col(queryIdCol).cast("long"), col(vecCol))
      .as[(Long, Seq[Float])].collect()
      .map { case (i, v) => (i, v.toArray) }
    val bc = spark.sparkContext.broadcast(qArr)
    // null id / null vector rows are EXCLUDED (the primitive tuple
    // encoder and the array math cannot carry them; one bad row must not
    // fail a 100 TB scan). bruteForce instead ranks their null scores
    // last — the paths differ only when a query has fewer than k
    // non-null candidates.
    val partial = vectors
      .filter(col(idCol).isNotNull && col(vecCol).isNotNull)
      .select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val qs = bc.value
        val tops = Array.fill(qs.length)(List.empty[TopKAggregator.Entry])
        it.foreach { case (id, vSeq) =>
          val v = vSeq.toArray
          var qi = 0
          while (qi < qs.length) {
            val (qid, qv) = qs(qi)
            if (!(excludeSelf && id == qid)) {
              // loud on ragged dims, like the plan path's graft_dot — a
              // truncated prefix score would rank a corrupt vector
              // plausibly instead of failing the scan
              if (v.length != qv.length) throw new IllegalArgumentException(
                s"bruteForceBlocked: candidate $id has dim ${v.length}, " +
                  s"query $qid has dim ${qv.length} — fix the ragged " +
                  "vector upstream")
              var s = 0.0; var i = 0
              val n = v.length
              while (i < n) { s += v(i).toDouble * qv(i).toDouble; i += 1 }
              tops(qi) = TopKAggregator.insert(tops(qi), (id, s), k)
            }
            qi += 1
          }
        }
        qs.iterator.zipWithIndex.flatMap { case ((qid, _), qi) =>
          tops(qi).map { case (id, s) => (qid, id, s) }
        }
      }
      .toDF("query_id", idCol, "score")
    topKPerGroup(partial, Seq(col("query_id")), k, desc("score"), asc(idCol))
  }

  /** Radius (range) search: every candidate whose similarity to the query
    * meets `minScore` — the "all neighbors within ε" dual of top-k, the
    * query shape behind near-dup audits and density estimates. Same
    * broadcast-queries/scan-corpus plan as [[bruteForce]]; the threshold
    * filter sits directly on the scored scan (no window, no global sort),
    * so at scale each task emits only its in-radius rows and the result
    * needs no shuffle beyond the caller's ordering.
    *
    * The score column is produced by `score` (callers that need oracle
    * parity pass a rounded scorer and threshold on the rounded value, so
    * boundary membership agrees bit-for-bit with the replay). */
  def rangeSearch(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      queryIdCol: String,
      vecCol: String,
      minScore: Double,
      excludeSelf: Boolean = true,
      score: (Column, Column) => Column = VectorOps.dot): DataFrame = {
    val q = broadcast(
      queries.select(
        col(queryIdCol).as("query_id"),
        col(vecCol).as("__query_vec")))
    val joined = vectors.crossJoin(q)
    val filtered =
      if (excludeSelf) joined.filter(col(idCol) =!= col("query_id"))
      else joined
    filtered
      .withColumn("score", score(col(vecCol), col("__query_vec")))
      .filter(col("score") >= minScore)
      .drop("__query_vec")
  }

  /** Matryoshka (MRL) two-stage search: shortlist by an inner product over
    * the first `prefixDim` dims, then rerank the shortlist with the full
    * vector (Kusupati et al., "Matryoshka Representation Learning",
    * NeurIPS'22 — prefix dims of an MRL-trained embedding are themselves a
    * valid low-dim embedding).
    *
    * Scale shape: stage 1 reads a d'/d fraction of the vector bytes (with
    * a column layout that stores the prefix separately it prunes the scan
    * itself) and is the only pass over the corpus; stage 2 rescores just
    * `shortlist` rows per query via an id semi-join back to the full
    * vectors. Both stages rank on rounded scores with ascending-id
    * tiebreaks, so the candidate set — and therefore the final top-k — is
    * deterministic and replayable.
    *
    * Output: (query_id, id, score, rank) with the full-dim score. */
  def matryoshka(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      queryIdCol: String,
      vecCol: String,
      prefixDim: Int,
      shortlist: Int,
      k: Int,
      excludeSelf: Boolean = true,
      score: (Column, Column) => Column = VectorOps.dot): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist must be >= k $k")
    // prefixDim = 0 would slice every vector to [], score all candidates
    // 0.0, and ship a lowest-id shortlist that LOOKS confidently ranked
    require(prefixDim >= 1, s"prefixDim must be >= 1 (got $prefixDim)")
    val prefixScore = (a: Column, b: Column) =>
      score(slice(a, 1, prefixDim), slice(b, 1, prefixDim))
    val cand = bruteForce(vectors, queries, idCol, queryIdCol, vecCol,
        k = shortlist, excludeSelf = excludeSelf, score = prefixScore)
      .select(col("query_id"), col(idCol))
    val q = broadcast(
      queries.select(col(queryIdCol).as("query_id"),
        col(vecCol).as("__query_vec")))
    val rescored = cand
      .join(vectors.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(q, Seq("query_id"))
      .withColumn("score", score(col(vecCol), col("__query_vec")))
      .drop("__query_vec", vecCol)
    topKPerGroup(rescored, Seq(col("query_id")), k, desc("score"), asc(idCol))
  }

  /** Generic per-group top-k via rank window (planner turns the rank filter
    * into a group-limit: only k rows per group survive each partial sort). */
  def topKPerGroup(
      df: DataFrame,
      groupCols: Seq[Column],
      k: Int,
      order: Column*): DataFrame =
    df.withColumn("rank",
        row_number().over(Window.partitionBy(groupCols: _*).orderBy(order: _*)))
      .filter(col("rank") <= k)
}
