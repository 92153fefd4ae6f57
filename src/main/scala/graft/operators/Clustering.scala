package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density clustering (DBSCAN, Ester et al. KDD'96) decomposed the
  * Spark-native way: neighborhood generation and cluster formation are
  * SEPARATE stages, so the quadratic-risk step is pluggable.
  *
  *  - Pair generation: any ε-neighborhood pair source — exact
  *    [[Dedup.embeddingPairs]] (broadcast blocked-gemm) for bounded
  *    corpora, [[AnnIvf.cosinePairsViaIndex]] (IVF-bucketed, salted) at
  *    scale. DBSCAN's own cost model starts AFTER the pair list.
  *  - Cluster formation ([[Clustering.dbscanFromPairs]]): degree count →
  *    core gate → connected components over core–core edges → border
  *    attach — three node/pair-sized shuffles plus the [[Components]]
  *    rounds, nothing quadratic.
  *
  * The labeling is the DETERMINISTIC variant: a cluster is named by its
  * minimum core id, and a border point joins the minimum-named cluster
  * among its core neighbors. Classic DBSCAN leaves border assignment
  * scan-order-dependent; pinning it makes the result layout-stable,
  * re-ingest-stable, and oracle-checkable (the `cluster_dbscan` query
  * replays pairs → degrees → closure → attach in recursive SQL).
  */
object Clustering {

  /** DBSCAN cluster assignment from a precomputed ε-neighborhood pair
    * list.
    *
    * @param ids      one row per point (the universe; points absent from
    *                 `pairs` are noise)
    * @param idCol    point id column in `ids` (integral)
    * @param pairs    undirected ε-pairs (any orientation; symmetrized and
    *                 deduped here)
    * @param leftCol  pair left id
    * @param rightCol pair right id
    * @param minPts   core threshold: |N_ε(p)| ≥ minPts counting p itself
    *                 (the KDD'96 convention)
    * @return (id BIGINT, cluster BIGINT, role STRING) — role ∈
    *         core/border/noise, cluster = min core id of the density-
    *         connected component, −1 for noise. */
  def dbscanFromPairs(
      ids: DataFrame,
      idCol: String,
      pairs: DataFrame,
      leftCol: String,
      rightCol: String,
      minPts: Int): DataFrame = {
    require(minPts >= 1, s"minPts must be >= 1 (got $minPts)")
    val e = pairs
      .select(col(leftCol).cast("long").as("u"), col(rightCol).cast("long").as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(eager = true) // feeds degrees, core edges, border probe
    val sym = e.select(col("u").as("a"), col("v").as("b"))
      .unionAll(e.select(col("v").as("a"), col("u").as("b")))
    // +1: the point itself is in its own ε-neighborhood
    val core = sym.groupBy(col("a").as("id"))
      .agg((count(lit(1)) + 1).as("deg"))
      .filter(col("deg") >= minPts).select("id")
      .localCheckpoint(eager = true) // joined 3×: both edge ends + border anti
    val coreEdges = sym
      .join(core.withColumnRenamed("id", "a"), Seq("a"), "left_semi")
      .join(core.withColumnRenamed("id", "b"), Seq("b"), "left_semi")
    // isolated cores (no core neighbor) are their own singleton cluster.
    // Auto components: ε-graphs at eval scale fit the bounded driver
    // union-find (≤2²⁰ edges); larger graphs fall through to the
    // distributed star-contraction loop unchanged.
    val comp = core.join(
        Components.connectedComponentsAuto(coreEdges, "a", "b"), Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("cluster"))
    val border = sym
      .join(core.withColumnRenamed("id", "a"), Seq("a"), "left_anti")
      .join(comp.withColumnRenamed("id", "b"), Seq("b"))
      .groupBy(col("a").as("id")).agg(min(col("cluster")).as("cluster"))
    val labeled = comp.withColumn("role", lit("core"))
      .unionByName(border.withColumn("role", lit("border")))
    ids.select(col(idCol).cast("long").as("id"))
      .join(labeled, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), lit(-1L)).as("cluster"),
        coalesce(col("role"), lit("noise")).as("role"))
  }
}
