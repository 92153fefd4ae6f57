package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the clustering
  * step that turns pairwise dedup output ([[Dedup.minhashPairs]],
  * [[Dedup.simhashPairs]], [[Dedup.jaccardPairs]]) into per-document
  * cluster assignments with a canonical representative (the minimum id),
  * i.e. "keep one doc per near-dup cluster" at corpus scale. The reference
  * has no transitive grouping at all (its dedup is the per-id ingest skip,
  * vector_db.py:127-132); this is the standard completion of that story
  * for a training-data pipeline.
  *
  * Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
  * Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
  * and Beyond", SoCC 2014). Each round is two groupBy+join passes over the
  * edge set; the edge set converges to a union of stars rooted at each
  * component's minimum id in O(log n) rounds (the paper's bound; 2-4
  * rounds in practice on dedup graphs, whose components are tiny).
  *
  * 100 TB design notes:
  *  - no driver-side graph: edges stay a DataFrame end to end; the only
  *    driver values per round are a COUNT and an order-independent
  *    xxhash64 checksum (the convergence test);
  *  - each round's min-aggregation partial-aggregates map-side, and the
  *    node→min join is an equi-join on node id — AQE's skew-join split
  *    covers the high-degree hubs a giant component produces;
  *  - lineage is truncated every round with an eager localCheckpoint so
  *    the plan does not grow O(rounds) deep (on a cluster with an HDFS
  *    checkpoint dir configured, `reliable = true` switches to durable
  *    checkpoints — same truncation, executor-loss safe);
  *  - the result is deterministic regardless of round count or schedule:
  *    the component label is always the component's minimum node id,
  *    which is what makes the query oracle-checkable in SQL.
  */
object Components {

  /** Canonical edge form used throughout: src > dst, no self-loops, no
    * duplicates. With that invariant, "neighbors smaller than u" is
    * exactly the dst column of u's src rows — small-star needs no
    * symmetric expansion. */
  private def canonical(pairs: DataFrame, leftCol: String, rightCol: String): DataFrame =
    pairs
      .select(col(leftCol).cast("long").as("a"), col(rightCol).cast("long").as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .select(greatest(col("a"), col("b")).as("src"), least(col("a"), col("b")).as("dst"))
      .distinct()

  private def symmetrize(edges: DataFrame): DataFrame =
    edges.union(edges.select(col("dst").as("src"), col("src").as("dst")))

  /** Large-star: every node u connects its strictly-larger neighbors to
    * m(u) = min(N(u) ∪ {u}). Operates on the symmetric view; output is
    * canonical again because dst > src ≥ m. */
  private[graft] def largeStar(edges: DataFrame): DataFrame =
    largeStarOn(symmetrize(edges))

  /** [[largeStar]] body over a pre-built (optionally persisted) symmetric
    * view: `sym` is scanned twice — once for the per-node min, once for
    * the rewiring join — so the round loop persists it across the two
    * passes instead of recomputing the union + upstream edges. */
  private def largeStarOn(sym: DataFrame): DataFrame = {
    val m = sym.groupBy("src").agg(min("dst").as("__mn"))
      .select(col("src"), least(col("src"), col("__mn")).as("__m"))
    // no distinct here: different centers can emit the same (v, m) pair,
    // but the duplication is bounded by the degree sum (2|E|) and
    // small-star's terminal distinct canonicalizes the round — saving a
    // full shuffle per round (measured ~25% on the 2M-edge ScaleSmoke)
    sym.join(m, "src")
      .filter(col("dst") > col("src"))
      .select(col("dst").as("src"), col("__m").as("dst"))
  }

  /** Small-star: every node u connects its smaller neighbors (and itself)
    * to m(u) = min of those. On canonical edges the smaller-neighbor list
    * of u is exactly u's dst values. */
  private[graft] def smallStar(edges: DataFrame): DataFrame = {
    val m = edges.groupBy("src").agg(min("dst").as("__m"))
    val rewired = edges.join(m, "src")
      .filter(col("dst") =!= col("__m"))
      .select(col("dst").as("src"), col("__m").as("dst"))
    rewired.union(m.select(col("src"), col("__m").as("dst"))).distinct()
  }

  /** [[connectedComponentsStats]] result: the assignment plus the
    * observability numbers an operator wants in a pipeline log — rounds
    * to fixpoint (should stay O(log n); a linear count means the graph
    * shape defeated star contraction) and final edge count. */
  final case class CcStats(assignment: DataFrame, rounds: Int, edges: Long)

  /** Adaptive entry point: dedup pair graphs are usually TINY next to the
    * corpus (near-dup sparsity is the whole premise), and the distributed
    * star-contraction loop pays ~2 Spark jobs per round in fixed
    * overheads — so when the canonical edge set fits a bounded driver
    * budget, solve it there with union-find (path-halving + a min-label
    * pass) and skip the loop entirely. Identical output by construction:
    * both paths label every node with its component's minimum id.
    *
    * The budget is EDGES, checked after canonicalization with one cheap
    * count (the loop would pay that job anyway in its first signature):
    * `localMaxEdges` defaults to 2²⁰ ≈ 16 MB of longs collected — far
    * under driver headroom, far over any healthy dedup graph at sf0.1.
    * Above the budget, falls through to [[connectedComponents]] — the
    * 100 TB path is unchanged and never collects. */
  def connectedComponentsAuto(
      pairs: DataFrame,
      leftCol: String,
      rightCol: String,
      localMaxEdges: Long = 1L << 20,
      maxIter: Int = 50,
      reliable: Boolean = false): DataFrame = {
    requireIntegralId(pairs, leftCol, "connectedComponentsAuto")
    requireIntegralId(pairs, rightCol, "connectedComponentsAuto")
    val edges = canonical(pairs, leftCol, rightCol)
      .localCheckpoint(eager = true)
    if (edges.count() > localMaxEdges)
      // already canonical AND checkpointed — enter the loop directly
      // rather than re-paying a full distinct shuffle + a second
      // materializing checkpoint over the whole edge set (the exact
      // large-graph case this branch exists to keep cheap)
      statsFromCanonical(edges, maxIter, reliable).assignment
    else {
      val spark = pairs.sparkSession
      import spark.implicits._
      val es = edges.select(col("src"), col("dst")).as[(Long, Long)].collect()
      // the edge list now lives on the driver; the checkpoint backing it
      // is dead (the result below is built from driver rows)
      releaseCheckpoint(edges)
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) {
          val p = parent(r)
          parent(r) = parent.getOrElse(p, p) // path halving
          r = parent.getOrElse(r, r)
        }
        r
      }
      es.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = es.iterator.flatMap { case (a, b) => Iterator(a, b) }.toSet
      // second pass: label = min id in the component (roots are already
      // minima under the min-union rule above, but make it explicit)
      val label = scala.collection.mutable.HashMap.empty[Long, Long]
      nodes.foreach { n =>
        val r = find(n)
        label(r) = math.min(label.getOrElse(r, n), n)
      }
      nodes.toSeq.sorted.map(n => (n, label(find(n)))).toDF("id", "component")
    }
  }

  /** Component assignment for every node that appears in `pairs`:
    * returns (id BIGINT, component BIGINT) where component is the minimum
    * node id reachable from `id`. Nodes absent from `pairs` are absent
    * from the result (they are their own singleton component — callers
    * `coalesce` on join, see the `dedup_components` query). */
  def connectedComponents(
      pairs: DataFrame,
      leftCol: String,
      rightCol: String,
      maxIter: Int = 50,
      reliable: Boolean = false): DataFrame =
    connectedComponentsStats(pairs, leftCol, rightCol, maxIter, reliable)
      .assignment

  /** [[connectedComponents]] with convergence metadata. */
  def connectedComponentsStats(
      pairs: DataFrame,
      leftCol: String,
      rightCol: String,
      maxIter: Int = 50,
      reliable: Boolean = false): CcStats = {
    requireIntegralId(pairs, leftCol, "connectedComponents")
    requireIntegralId(pairs, rightCol, "connectedComponents")
    def truncate(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(eager = true)
    statsFromCanonical(
      truncate(canonical(pairs, leftCol, rightCol)), maxIter, reliable)
  }

  /** The star-contraction loop over ALREADY canonical (src > dst,
    * deduplicated, null-free), already materialized edges.
    *
    * Takes OWNERSHIP of `edges0`'s checkpoint: once the first round
    * supersedes it, its storage is released (both callers build it fresh
    * and never reuse it) — as with every superseded round, so pinned
    * storage stays O(1) instead of O(rounds × edge set). */
  private def statsFromCanonical(
      edges0: DataFrame,
      maxIter: Int,
      reliable: Boolean): CcStats = {
    def truncate(df: DataFrame): DataFrame =
      if (reliable) df.checkpoint(eager = true) else df.localCheckpoint(eager = true)
    def signature(e: DataFrame): (Long, Long) = {
      // bit_xor: order-independent AND overflow-free under ANSI mode
      // (sum(hash) trips ARITHMETIC_OVERFLOW)
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(src, dst))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var edges = edges0
    var sig = signature(edges)
    var iter = 0
    var converged = sig._1 == 0L
    while (!converged && iter < maxIter) {
      // sym is scanned twice inside the round (per-node min + rewiring
      // join); persist it for the round so the union and the upstream
      // checkpoint scan run once, not twice (the round's dominant cost
      // on the 2M-edge ScaleSmoke graph)
      val sym = symmetrize(edges)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val next = truncate(smallStar(largeStarOn(sym)))
      sym.unpersist(blocking = false)
      val nsig = signature(next)
      // Signature equality ((count, bit_xor(xxhash64))) could in principle
      // collide (~2⁻⁶⁴) and declare a false fixpoint — which would emit
      // silently wrong labels, since the assignment derivation below is
      // only valid at a true fixpoint. Confirm exactly, once, on the
      // round where signatures first agree: counts already match, so an
      // empty multiset difference proves set equality. Both sides are
      // checkpointed, so this is one extra join-sized pass per call.
      converged = nsig == sig && next.exceptAll(edges).isEmpty
      sig = nsig
      // next is materialized and the exceptAll probe above was this
      // round's last read of the superseded edge set — release it (for
      // reliable mode this also deletes the round's checkpoint FILES,
      // which Spark otherwise cleans only on GC, and only if
      // cleanCheckpoints is on). The final round's checkpoint stays: the
      // returned assignment plan reads it.
      releaseCheckpoint(edges)
      edges = next
      iter += 1
    }
    require(converged, s"connectedComponents: no fixpoint after $maxIter rounds")
    // At the fixpoint the edge set is a union of stars (a node with two
    // distinct dst values would be rewired by small-star), so src rows map
    // members to their root and roots map to themselves.
    val assignment = edges
      .select(col("src").as("id"), col("dst").as("component"))
      .union(edges.select(col("dst").as("id"), col("dst").as("component")))
      .groupBy("id").agg(min("component").as("component"))
    CcStats(assignment, iter, sig._1)
  }
}
