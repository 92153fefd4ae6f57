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
