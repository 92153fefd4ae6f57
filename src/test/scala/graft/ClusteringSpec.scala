package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private def run(ids: Seq[Long], pairs: Seq[(Long, Long)], minPts: Int,
      repart: Int = 0) = {
    val idsDf0 = ids.toDF("pid")
    val pairsDf0 = pairs.toDF("l", "r")
    val (idsDf, pairsDf) =
      if (repart > 0) (idsDf0.repartition(repart), pairsDf0.repartition(repart))
      else (idsDf0, pairsDf0)
    Clustering.dbscanFromPairs(idsDf, "pid", pairsDf, "l", "r", minPts)
      .as[(Long, Long, String)].collect().map(t => t._1 -> (t._2, t._3)).toMap
  }

  test("two cliques, a border tail, and noise get the textbook labels") {
    val cliqueA = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val cliqueB = for (a <- 7L to 10L; b <- (a + 1) to 10L) yield (a, b)
    // 5 touches cliqueA through one edge (ε-neighbor but not dense); 6 isolated
    val got = run((1L to 10L), cliqueA ++ cliqueB ++ Seq((1L, 5L)), minPts = 4)
    (1L to 4L).foreach { i => assert(got(i) === (1L, "core"), s"node $i") }
    (7L to 10L).foreach { i => assert(got(i) === (7L, "core"), s"node $i") }
    assert(got(5L) === (1L, "border"))
    assert(got(6L) === (-1L, "noise"))
  }

  test("minPts counts the point itself (KDD'96 convention)") {
    // chain 1-2-3: degrees +self are 2,3,2
    val chain = Seq((1L, 2L), (2L, 3L))
    val lo = run(Seq(1L, 2L, 3L), chain, minPts = 2)
    assert(lo.values.forall(_ == (1L, "core")))
    val hi = run(Seq(1L, 2L, 3L), chain, minPts = 3)
    assert(hi(2L) === (2L, "core")) // isolated core: its own singleton cluster
    assert(hi(1L) === (2L, "border") && hi(3L) === (2L, "border"))
  }

  test("border point adjacent to two clusters attaches to the min-named one") {
    val a = for (x <- 1L to 4L; y <- (x + 1) to 4L) yield (x, y)
    val b = for (x <- 7L to 10L; y <- (x + 1) to 10L) yield (x, y)
    val got = run((1L to 10L), a ++ b ++ Seq((4L, 5L), (5L, 7L)), minPts = 4)
    assert(got(5L) === (1L, "border"))
    assert(got(4L) === (1L, "core") && got(7L) === (7L, "core"))
  }

  test("matches a driver-side reference DBSCAN on a seeded random graph") {
    val rnd = new scala.util.Random(13)
    val n = 60
    val pairs = (for (i <- 0 until n; j <- (i + 1) until n
      if rnd.nextDouble() < 0.06) yield (i.toLong, j.toLong)).toSeq
    val minPts = 3
    val adj = pairs.flatMap(e => Seq(e, e.swap))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      .withDefaultValue(Set.empty[Long])
    val cores = (0L until n).filter(v => adj(v).size + 1 >= minPts).toSet
    // min reachable core id through core-core edges
    var lbl = cores.map(c => c -> c).toMap
    var changed = true
    while (changed) {
      changed = false
      cores.foreach { c =>
        val m = (adj(c).filter(cores) + c).map(lbl).min
        if (m < lbl(c)) { lbl += c -> m; changed = true }
      }
    }
    val expect = (0L until n).map { v =>
      if (cores(v)) v -> (lbl(v), "core")
      else {
        val cn = adj(v).filter(cores)
        if (cn.nonEmpty) v -> (cn.map(lbl).min, "border")
        else v -> (-1L, "noise")
      }
    }.toMap
    val got = run((0L until n), pairs, minPts, repart = 7)
    assert(got === expect)
  }

  test("deterministic under repartitioning and pair orientation") {
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val a = run((1L to 5L), pairs, minPts = 3)
    val b = run((1L to 5L), pairs.map(_.swap), minPts = 3, repart = 5)
    assert(a === b)
  }
}
