package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Contrastive-training data prep: per-anchor negative selection over an
  * embedding corpus — the sampling stage between retrieval and training
  * for embedding/reranker finetunes (in-batch negatives aren't enough
  * once the corpus outgrows a batch).
  *
  * Two regimes, both deterministic and replayable:
  *  - [[hardNegatives]]: the k most-similar WRONG-label candidates per
  *    anchor (the informative near-misses) — a label anti-filter pushed
  *    under the same broadcast-scan/group-limit plan as
  *    [[Knn.bruteForce]], so each task emits only k rows per anchor;
  *  - [[randomNegatives]]: a seeded per-(anchor, candidate) lottery on
  *    the portable mix32 hash — unlike partition-order RNG the draw is a
  *    pure function of (ids, seed), stable under repartitioning and
  *    re-ingest and replayable outside Spark, which is what makes a
  *    100 TB sampling decision auditable.
  */
object Contrastive {

  /** Top-k wrong-label candidates per anchor by descending similarity
    * (ascending-id tiebreak). Output: (query_id, idCol, labelCol, score,
    * rank) plus the candidate table's payload columns. */
  def hardNegatives(
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      queryIdCol: String,
      vecCol: String,
      labelCol: String,
      k: Int,
      score: (Column, Column) => Column = VectorOps.dot): DataFrame = {
    // EXPLICIT null-label policy: unlabeled rows cannot participate in
    // label-contrastive selection — an unlabeled candidate might share
    // the anchor's class (a false negative poisons training), and an
    // unlabeled anchor has no wrong-label set. Filtered here, not left
    // to =!='s null propagation, which silently gave null-label anchors
    // ZERO negatives (the anchor just vanished from the output).
    val q = broadcast(queries
      .filter(col(labelCol).isNotNull)
      .select(
        col(queryIdCol).as("query_id"),
        col(vecCol).as("__query_vec"),
        col(labelCol).as("__query_label")))
    val scored = vectors
      .filter(col(labelCol).isNotNull)
      .crossJoin(q)
      .filter(col(labelCol) =!= col("__query_label"))
      .withColumn("score", score(col(vecCol), col("__query_vec")))
      // a NaN score (one corrupt candidate vector) sorts GREATEST in
      // Spark's ordering — it would claim rank 1..k for EVERY anchor,
      // displacing all genuine hard negatives corpus-wide
      .filter(col("score").isNotNull && !isnan(col("score")))
      .drop("__query_vec", "__query_label")
    Knn.topKPerGroup(scored, Seq(col("query_id")), k,
      desc("score"), asc(idCol))
  }

  /** k uniform wrong-label negatives per anchor, drawn by ranking the
    * portable 30-bit lottery value `mix32(anchor·1000003 + candidate,
    * seed)` (ascending, id tiebreak). Output: (query_id, idCol, labelCol,
    * lot, rank).
    *
    * Contract: `anchor·1000003 + candidate` must stay within Long —
    * i.e. ids below ~2⁴³ — or ANSI mode raises on the multiply; replays
    * outside Spark compute the same un-wrapped product, so the bound is
    * a portability contract, not just an overflow guard. */
  def randomNegatives(
      candidates: DataFrame,
      queries: DataFrame,
      idCol: String,
      queryIdCol: String,
      labelCol: String,
      k: Int,
      seed: Long): DataFrame = {
    // same explicit null-label policy as hardNegatives
    val q = broadcast(queries
      .filter(col(labelCol).isNotNull)
      .select(
        col(queryIdCol).as("query_id"),
        col(labelCol).as("__query_label")))
    val lotted = candidates.select(col(idCol), col(labelCol))
      .filter(col(labelCol).isNotNull)
      .crossJoin(q)
      .filter(col(labelCol) =!= col("__query_label"))
      .withColumn("lot", Sampling.portableSplitBucket(
        col("query_id").cast("long") * lit(1000003L) + col(idCol).cast("long"),
        seed, 1 << 30))
      .drop("__query_label")
    Knn.topKPerGroup(lotted, Seq(col("query_id")), k,
      asc("lot"), asc(idCol))
  }
}
