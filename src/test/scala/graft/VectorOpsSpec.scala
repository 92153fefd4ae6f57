package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.VectorOps

/** ScalaCheck-generated properties for the vector math (SURVEY.md §5.3),
  * evaluated through the actual Column implementation — all generated
  * cases go through one DataFrame job per property. */
class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private val vecGen: Gen[Seq[Float]] =
    Gen.chooseNum(1, 16).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(-10f, 10f)).map(_.toSeq))

  private def sample[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.apply(Gen.Parameters.default, Seed(i.toLong)).get)

  test("dot(a,a) ≥ 0; |normalize(a)| ∈ {0, 1}; l2dist(a,a) = 0") {
    val vecs = sample(vecGen, 80)
    val got = vecs.toDF("a")
      .select(
        VectorOps.normSquared($"a").as("aa"),
        VectorOps.l2Norm(VectorOps.l2Normalize($"a")).as("na"),
        VectorOps.l2Distance($"a", $"a").as("daa"))
      .as[(Double, Double, Double)].collect()
    got.foreach { case (aa, na, daa) =>
      assert(aa >= 0.0)
      assert(daa == 0.0)
      assert(math.abs(na) < 1e-9 || math.abs(na - 1.0) < 1e-6)
    }
  }

  test("dot is symmetric and matches a sequential fp64 fold") {
    val cases = sample(
      vecGen.flatMap(a =>
        Gen.listOfN(a.length, Gen.chooseNum(-10f, 10f)).map(b => (a, b.toSeq))), 60)
    val got = cases.toDF("a", "b")
      .select(VectorOps.dot($"a", $"b"), VectorOps.dot($"b", $"a"))
      .as[(Double, Double)].collect()
    got.zip(cases).foreach { case ((ab, ba), (a, b)) =>
      val want = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x.toDouble * y.toDouble }
      assert(ab == want, s"dot mismatch for $a · $b")
      assert(ab == ba)
    }
  }

  test("codegen DotProductFP64 is bit-identical to the HOF formulation") {
    val cases = sample(
      vecGen.flatMap(a =>
        Gen.listOfN(a.length, Gen.chooseNum(-10f, 10f)).map(b => (a, b.toSeq))), 60)
    val got = cases.toDF("a", "b")
      .select(VectorOps.dot($"a", $"b"), VectorOps.dotHof($"a", $"b"))
      .as[(Double, Double)].collect()
    got.foreach { case (fused, hof) => assert(fused == hof) }
  }

  test("codegen DotProductInt / L2DistInt equal the HOF formulations exactly") {
    import org.apache.spark.sql.functions.{aggregate, lit, zip_with}
    val longVec = Gen.chooseNum(2, 16).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1000000L, 1000000L)).map(_.toSeq))
    val cases = sample(
      longVec.flatMap(a =>
        Gen.listOfN(a.length, Gen.chooseNum(-1000000L, 1000000L))
          .map(b => (a, b.toSeq))), 60)
    val got = cases.toDF("a", "b").select(
        graft.functions.DotProductInt($"a", $"b"),
        aggregate(zip_with($"a", $"b", (x, y) => x * y),
          lit(0L), (acc, x) => acc + x),
        graft.functions.L2DistInt($"a", $"b"),
        aggregate(zip_with($"a", $"b", (x, y) => (x - y) * (x - y)),
          lit(0L), (acc, x) => acc + x))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (dotFused, dotHof, l2Fused, l2Hof) =>
      assert(dotFused === dotHof)
      assert(l2Fused === l2Hof)
    }
    // overflow is loud (like the ANSI HOF path), never a silent wrap —
    // raw ArithmeticException when evaluated driver-side, Spark-wrapped
    // from a task
    val big = Seq((Seq(Long.MaxValue / 2, Long.MaxValue / 2), Seq(3L, 3L)))
    val e = intercept[Throwable] {
      big.toDF("a", "b")
        .select(graft.functions.DotProductInt($"a", $"b")).collect()
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain.exists(_.isInstanceOf[ArithmeticException]), e.toString)
    // dimension mismatch is loud too (the HOF form would null-pad; a
    // silent prefix product would be a plausible wrong score)
    for (expr <- Seq(graft.functions.DotProductInt($"a", $"b"),
        graft.functions.L2DistInt($"a", $"b"))) {
      val m = intercept[Throwable] {
        Seq((Seq(1L, 2L, 3L), Seq(1L, 2L))).toDF("a", "b")
          .select(expr).collect()
      }
      val mc = Iterator.iterate(m)(_.getCause).takeWhile(_ != null).toSeq
      assert(mc.exists(t => t.isInstanceOf[IllegalArgumentException] &&
        t.getMessage.contains("dimension mismatch")), m.toString)
    }
  }

  test("fp64 dot refuses a dimension mismatch like its integer twin") {
    // graft_dot is a registered SQL function; before this check it
    // scored the shorter PREFIX — a plausible wrong similarity a user
    // cannot detect (the posture already enforced by DotProductInt,
    // CentroidGemm, Mmr, and L2NormalizeFP32)
    val m = intercept[Throwable] {
      Seq((Seq(1f, 2f, 3f), Seq(1f, 2f))).toDF("a", "b")
        .select(graft.functions.VectorOps.dot($"a", $"b")).collect()
    }
    val mc = Iterator.iterate(m)(_.getCause).takeWhile(_ != null).toSeq
    assert(mc.exists(t => t.isInstanceOf[IllegalArgumentException] &&
      t.getMessage.contains("dimension mismatch")), m.toString)
  }

  test("cosine(v, v) = 1 for non-zero vectors") {
    val vecs = sample(vecGen, 40).filter(_.exists(_ != 0f))
    val got = vecs.map(v => (v, v)).toDF("a", "b")
      .select(VectorOps.cosine($"a", $"b")).as[Double].collect()
    got.foreach(c => assert(math.abs(c - 1.0) < 1e-9))
  }

  test("maxSim: single-slice works (greatest needs 2 args); slices=0 refused") {
    val got = Seq((Seq(1f, 2f), Seq(3f, 4f))).toDF("q", "d")
      .select(VectorOps.maxSim($"q", $"d", slices = 1, dim = 2))
      .as[Double].head()
    assert(got === 11.0)
    intercept[IllegalArgumentException] {
      VectorOps.maxSim($"q", $"d", slices = 0, dim = 2)
    }
  }

  test("null elements refused loudly by the fused normalize and jaccard") {
    import graft.functions.{L2NormalizeFP32, SortedLongJaccard}
    val e = intercept[Exception] {
      Seq(Seq(Some(3f), Option.empty[Float])).toDF("a")
        .select(L2NormalizeFP32($"a")).collect()
    }
    val m = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(m.contains("graft_l2_normalize"), m)
    // getLong would read a NULL slot as 0 — a phantom intersection
    val e2 = intercept[Exception] {
      Seq((Seq(Option.empty[Long]), Seq(Option(0L)))).toDF("a", "b")
        .select(SortedLongJaccard.sortedJaccard($"a", $"b")).collect()
    }
    val m2 = Iterator.iterate(e2: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(m2.contains("graft_sorted_jaccard"), m2)
  }

  test("maxSim sums each query slice's best doc-slice match") {
    // 2 token-vectors of dim 2 packed per side:
    // q = [(1,0), (0.5,0)], d = [(0.8,0), (0,1)]
    // slice 0: max(0.8, 0) = 0.8; slice 1: max(0.4, 0) = 0.4
    val got = Seq((Seq(1f, 0f, 0.5f, 0f), Seq(0.8f, 0f, 0f, 1f)))
      .toDF("q", "d")
      .select(VectorOps.maxSim($"q", $"d", slices = 2, dim = 2))
      .as[Double].head()
    assert(math.abs(got - 1.2) < 1e-9)
  }
}
