package graft

import graft.operators.LinkAnalysis

/** Fixed-point PageRank contract: mass conservation up to the documented
  * floor leak, hub dominance, degenerate damping endpoints, and layout
  * determinism (pure integer arithmetic ⇒ bit-stable under any
  * partitioning). */
class LinkAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def pr(edges: Seq[(String, String)], iters: Int = 5,
      d100: Int = 85): Map[String, Long] =
    LinkAnalysis.pageRank(edges.toDF("src", "dst"), "src", "dst",
        iterations = iters, d100 = d100)
      .as[(String, Long)].collect().toMap

  // star: every leaf links to the hub, hub links back to l1 so no
  // node dangles
  private val star = Seq(
    "l1" -> "hub", "l2" -> "hub", "l3" -> "hub", "l4" -> "hub",
    "hub" -> "l1")

  test("hub with many in-links dominates; mass conserved up to floor leak") {
    val got = pr(star)
    assert(got.size === 5)
    assert(got("hub") > got("l2"), got.toString)
    assert(got("l1") > got("l2"), "hub's sole out-link inherits its rank")
    val total = got.values.sum
    // each node's update floors at most twice per iteration
    val maxLeak = 5L * 2 * 5 * 100
    assert(total <= LinkAnalysis.Scale && total >= LinkAnalysis.Scale - maxLeak,
      s"total=$total")
  }

  test("d100=0 degrades to the uniform teleport distribution") {
    val got = pr(star, d100 = 0)
    assert(got.values.toSet === Set(LinkAnalysis.Scale / 5))
  }

  test("iterations=0 returns the uniform initialization") {
    val got = pr(star, iters = 0)
    assert(got.values.toSet === Set(LinkAnalysis.Scale / 5))
  }

  test("duplicate edges collapse: rank equals the deduplicated graph's") {
    assert(pr(star ++ star ++ star) === pr(star))
  }

  test("bit-stable under repartitioning (pure integer recurrence)") {
    val df = star.toDF("src", "dst")
    val a = LinkAnalysis.pageRank(df, "src", "dst")
      .as[(String, Long)].collect().toMap
    val b = LinkAnalysis.pageRank(df.repartition(7), "src", "dst")
      .as[(String, Long)].collect().toMap
    assert(a === b)
  }

  private def hitsOf(edges: Seq[(String, String)], iters: Int = 3)
      : Map[String, (Long, Long)] =
    LinkAnalysis.hits(edges.toDF("src", "dst"), "src", "dst",
        iterations = iters)
      .as[(String, Long, Long)].collect()
      .map { case (n, a, h) => n -> (a, h) }.toMap

  test("hits: star center is the sole authority, leaves are equal hubs") {
    val got = hitsOf(Seq("l1" -> "c", "l2" -> "c", "l3" -> "c"))
    assert(got("c")._1 === LinkAnalysis.ScaleHits, "center auth = max-norm 1")
    assert(got("c")._2 === 0L, "center has no out-edges")
    Seq("l1", "l2", "l3").foreach { l =>
      assert(got(l) === ((0L, LinkAnalysis.ScaleHits)), got.toString)
    }
  }

  test("hits: authority rises with in-degree, hub with out-degree") {
    // s1 sourced by 3 hubs, s2 by 1; p1 points at both, p2 only at s1
    val g = Seq("p1" -> "s1", "p1" -> "s2", "p2" -> "s1", "p3" -> "s1")
    val got = hitsOf(g)
    assert(got("s1")._1 > got("s2")._1, "more/better in-links => more auth")
    assert(got("p1")._2 >= got("p2")._2, "broader hub covers more authorities")
    assert(got.values.map(_._1).max === LinkAnalysis.ScaleHits)
    assert(got.values.map(_._2).max === LinkAnalysis.ScaleHits)
  }

  test("hits: duplicate edges collapse; bit-stable under repartitioning") {
    val g = Seq("p1" -> "s1", "p1" -> "s2", "p2" -> "s1", "p3" -> "s2")
    assert(hitsOf(g ++ g) === hitsOf(g))
    val df = g.toDF("src", "dst")
    val a = LinkAnalysis.hits(df, "src", "dst")
      .as[(String, Long, Long)].collect().toSet
    val b = LinkAnalysis.hits(df.repartition(7), "src", "dst")
      .as[(String, Long, Long)].collect().toSet
    assert(a === b)
  }

  test("two disconnected cliques split mass by size, not topology luck") {
    // 3-cycle vs 2-cycle: within a cycle every node ends equal; larger
    // component holds proportionally more total mass
    val g = Seq("a" -> "b", "b" -> "c", "c" -> "a", "x" -> "y", "y" -> "x")
    val got = pr(g, iters = 20)
    val cyc3 = Seq("a", "b", "c").map(got).sum
    val cyc2 = Seq("x", "y").map(got).sum
    assert(math.abs(cyc3 - 3L * LinkAnalysis.Scale / 5) < LinkAnalysis.Scale / 100)
    assert(math.abs(cyc2 - 2L * LinkAnalysis.Scale / 5) < LinkAnalysis.Scale / 100)
    assert(math.abs(got("a") - got("b")) <= 1000, "cycle symmetry")
  }
}
