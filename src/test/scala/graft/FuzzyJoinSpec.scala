package graft

import graft.operators.FuzzyJoin

/** Ed-Join contract: the prefix-filtered candidate set has ZERO false
  * negatives — the emitted pair set must equal a brute-force quadratic
  * Levenshtein scan exactly, including repeated-gram and short-string
  * edge cases the multiset/padding machinery exists for. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def brute(docs: Seq[(Long, String)], k: Int): Set[(Long, Long, Int)] =
    (for {
      (i1, s1) <- docs; (i2, s2) <- docs
      if i1 < i2
      d = lev(s1, s2) if d <= k
    } yield (i1, i2, d)).toSet

  private def viaOp(docs: Seq[(Long, String)], k: Int, q: Int = 2): Set[(Long, Long, Int)] =
    FuzzyJoin.selfPairs(docs.toDF("id", "s"), "id", "s", maxDist = k, q = q)
      .as[(Long, Long, Int)].collect().toSet

  private def typoCorpus(seed: Int, n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(seed)
    val alphabet = "abcde"
    def randStr(len: Int) = Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString
    val originals = Seq.tabulate(n)(i => (i.toLong, randStr(6 + rnd.nextInt(10))))
    val typos = originals.map { case (id, s) =>
      val mutated = rnd.nextInt(3) match {
        case 0 => // substitution
          val p = rnd.nextInt(s.length)
          s.updated(p, alphabet(rnd.nextInt(alphabet.length)))
        case 1 => // deletion
          val p = rnd.nextInt(s.length)
          s.take(p) + s.drop(p + 1)
        case _ => // insertion
          val p = rnd.nextInt(s.length + 1)
          s.take(p) + alphabet(rnd.nextInt(alphabet.length)) + s.drop(p)
      }
      (id + 10000L, mutated)
    }
    originals ++ typos
  }

  test("typo corpus matches brute force exactly at k=1") {
    val docs = typoCorpus(seed = 11, n = 60)
    assert(viaOp(docs, 1) === brute(docs, 1))
  }

  test("typo corpus matches brute force exactly at k=2 (and with q=3)") {
    val docs = typoCorpus(seed = 23, n = 40)
    assert(viaOp(docs, 2) === brute(docs, 2))
    assert(viaOp(docs, 2, q = 3) === brute(docs, 2))
  }

  test("repeated-gram strings: multiset occurrence blocking has no false negatives") {
    val docs = Seq((1L, "aaaaaaa"), (2L, "aaaaaab"), (3L, "aaaaaa"),
      (4L, "aabaaaa"), (5L, "bbbbbbb"))
    assert(viaOp(docs, 1) === brute(docs, 1))
    assert(viaOp(docs, 2) === brute(docs, 2))
  }

  test("short strings survive via sentinel padding") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "ab"), (4L, "xy"), (5L, "x"))
    assert(viaOp(docs, 1) === brute(docs, 1))
  }

  test("k=0 degrades to exact-duplicate pairs") {
    val docs = Seq((1L, "same"), (2L, "same"), (3L, "diff"))
    assert(viaOp(docs, 0) === Set((1L, 2L, 0)))
  }
}
