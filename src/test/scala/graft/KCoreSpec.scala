package graft

import org.apache.spark.sql.functions._

import graft.operators.LinkAnalysis

/** k-core correctness: hand graphs with known cores, equivalence against
  * local brute-force peeling, and the two defining invariants (every
  * member has ≥ k within-core neighbors; the result is the MAXIMAL such
  * subgraph, so one more peeling pass changes nothing). */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def localKCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Int] = {
    var es = edges.map { case (a, b) =>
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    var changed = true
    while (changed) {
      val deg = es.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => (n, xs.size) }
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter(e => keep(e._1) && keep(e._2))
      changed = next.size != es.size
      es = next
    }
    es.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => (n, xs.size) }
  }

  private def run(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] =
    LinkAnalysis.kCore(edges.toDF("a", "b"), "a", "b", k)
      .as[(Long, Long)].collect().toMap

  test("4-core of a 5-clique with pendant chain is exactly the clique") {
    val clique = for { i <- 0L until 5L; j <- (i + 1) until 5L } yield (i, j)
    val chain = Seq((4L, 10L), (10L, 11L), (11L, 12L))
    val got = run(clique ++ chain, k = 4)
    assert(got.keySet === (0L until 5L).toSet)
    assert(got.values.forall(_ === 4L))
  }

  test("2-core of a tree is empty") {
    val tree = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L), (2L, 5L))
    assert(run(tree, k = 2).isEmpty)
  }

  test("matches local brute-force peeling on a pseudo-random graph") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(600)((rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
    for (k <- Seq(2, 4, 6)) {
      val got = run(edges, k)
      val want = localKCore(edges, k).map { case (n, d) => (n, d.toLong) }
      assert(got === want, s"k=$k")
    }
  }

  test("maxIter short of the peeling depth returns a superset, not a throw") {
    // a long pendant chain into a 3-clique peels one chain link per
    // round under k=2 — depth ~ chain length, far beyond maxIter=1
    val chain = (0L until 20L).map(i => (i, i + 1))
    val clique = Seq((20L, 21L), (21L, 22L), (20L, 22L))
    val edges = chain ++ clique
    val partial = LinkAnalysis.kCore(edges.toDF("a", "b"), "a", "b",
      k = 2, maxIter = 1).as[(Long, Long)].collect().toMap
    val full = run(edges, k = 2)
    // one round peels exactly node 0; everything else still stands
    assert(partial.keySet === (1L to 22L).toSet)
    // monotone deletion: the partial result contains the true core
    assert(full.keySet.subsetOf(partial.keySet))
    // and with the default budget the same graph reaches the fixpoint
    assert(full.keySet === Set(20L, 21L, 22L))
  }

  test("pinned checkpoints stay O(1) across a deep peel, not O(rounds)") {
    // a 30-node path under k=2 peels one node off each end per round —
    // ~15 rounds, each producing its own eager localCheckpoint. Every
    // superseded round's edge copy must be released (Dataset.unpersist
    // is a no-op on localCheckpoint — the release goes through the RDD);
    // only the FINAL round's checkpoint may remain, since the returned
    // degrees plan reads it.
    val path = (0L until 30L).map(i => (i, i + 1))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = run(path, k = 2)
    assert(got.isEmpty, "a path has no 2-core")
    val leaked = SpecUtil.leakedAfterRelease(spark, before, budget = 1)
    assert(leaked.size <= 1,
      s"kCore left ${leaked.size} checkpoint RDD(s) pinned " +
        s"(expected <= 1, the result-backing one): $leaked")
  }

  test("multi-partition peel equals brute force (regression: the decrement " +
    "probe RE-KEYS to the neighbor, so its reduce must shuffle)") {
    // the r18 incremental peel emits (neighbor, 1) decrements from a
    // zipPartitions probe; a false preservesPartitioning claim let
    // reduceByKey skip its shuffle and sum only partition-local
    // decrements — invisible on the tiny graphs above (1 round
    // partition), caught only by the sf0.01 oracle. This graph is big
    // enough (~80k symmetric endpoints) to force >= 2 round partitions.
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(40000)(
      (rnd.nextInt(2500).toLong, rnd.nextInt(2500).toLong))
      .filter(e => e._1 != e._2).distinct
    val got = run(edges, k = 8)
    val want = localKCore(edges, k = 8).map { case (n, d) => (n, d.toLong) }
    assert(got === want)
  }

  test("invariants: min within-core degree >= k; result is maximal") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(400)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(e => e._1 != e._2)
    val k = 5
    val core = run(edges, k)
    if (core.nonEmpty) {
      assert(core.values.min >= k)
      // maximality: peeling the already-peeled core subgraph is a no-op
      val coreEdges = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
        .distinct.filter(e => core.contains(e._1) && core.contains(e._2))
      assert(run(coreEdges, k) === core)
    }
  }
}
