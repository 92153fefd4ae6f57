package graft

import org.apache.spark.sql.functions._

import graft.operators.EmbeddingPca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  private def dot(a: Array[Double], b: Array[Double]): Double =
    a.zip(b).map { case (x, y) => x * y }.sum

  // driver-side reference covariance of the sf0.001 embeddings
  private lazy val (refCov, refN) = {
    val vecs = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("embedding").cast("array<double>"))
      .as[Seq[Double]].collect().map(_.toArray)
    val d = vecs.head.length
    val n = vecs.length
    val mean = Array.tabulate(d)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n
    }
    (cov, n)
  }

  test("fit: components are orthonormal eigenvectors of the covariance") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val m = EmbeddingPca.fit(emb, "embedding", k = 4)
    assert(m.dim === 64 && m.k === 4)
    // orthonormal
    for (i <- 0 until 4; j <- i until 4) {
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(dot(m.components(i), m.components(j)) - want) < 1e-9,
        s"components $i,$j not orthonormal")
    }
    // eigenpairs of the reference covariance: C v = λ v
    m.components.zip(m.eigenvalues).foreach { case (v, lam) =>
      val cv = refCov.map(row => dot(row, v))
      val resid = math.sqrt(cv.zip(v).map { case (a, b) =>
        val r = a - lam * b; r * r
      }.sum)
      assert(resid < 1e-8 * math.max(lam, 1e-12), s"Cv != λv (resid $resid, λ $lam)")
    }
    // descending spectrum, all non-negative
    assert(m.eigenvalues.sameElements(m.eigenvalues.sorted(Ordering[Double].reverse)))
    assert(m.eigenvalues.forall(_ >= 0.0))
  }

  test("projections: per-component variance equals the eigenvalue") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val m = EmbeddingPca.fit(emb, "embedding", k = 3)
    val proj = emb
      .select(EmbeddingPca.project(m, col("embedding")).as("p"))
      .as[Seq[Double]].collect()
    for (c <- 0 until 3) {
      val xs = proj.map(_(c))
      val mu = xs.sum / xs.length
      val varc = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
      // scores are already centered, so the mean is ~0 and the empirical
      // variance is exactly the eigenvalue up to fp accumulation
      assert(math.abs(mu) < 1e-9, s"component $c scores not centered: $mu")
      assert(math.abs(varc - m.eigenvalues(c)) < 1e-9 * math.max(m.eigenvalues(c), 1e-12),
        s"variance $varc != eigenvalue ${m.eigenvalues(c)}")
    }
    assert(proj.length === refN)
  }

  test("whitened projections have unit variance per component") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val m = EmbeddingPca.fit(emb, "embedding", k = 3)
    val proj = emb
      .select(EmbeddingPca.whiten(m, col("embedding")).as("p"))
      .as[Seq[Double]].collect()
    for (c <- 0 until 3) {
      val xs = proj.map(_(c))
      val varc = xs.map(x => x * x).sum / xs.length // scores are centered
      assert(math.abs(varc - 1.0) < 1e-9, s"component $c variance $varc")
    }
  }

  test("fit is layout-insensitive up to fp rounding; guards fire") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val m1 = EmbeddingPca.fit(emb, "embedding", k = 2)
    val m2 = EmbeddingPca.fit(emb.repartition(7), "embedding", k = 2)
    m1.eigenvalues.zip(m2.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9 * math.max(a, 1e-12), s"$a vs $b")
    }
    // eigenvector sign is arbitrary; compare up to sign
    m1.components.zip(m2.components).foreach { case (u, v) =>
      assert(math.min(
        math.sqrt(u.zip(v).map { case (a, b) => (a - b) * (a - b) }.sum),
        math.sqrt(u.zip(v).map { case (a, b) => (a + b) * (a + b) }.sum)) < 1e-7)
    }
    intercept[IllegalArgumentException] {
      EmbeddingPca.fit(emb, "embedding", k = 65)
    }
    intercept[IllegalArgumentException] {
      EmbeddingPca.fit(emb.limit(1), "embedding", k = 1)
    }
  }

  test("symmetricEigen: equal-diagonal pairs rotate (the tau = 0 case)") {
    // [[1, .5], [.5, 1]] — equal variances, nonzero covariance: with
    // t = signum(0)/... = 0 the rotation was the identity, the sweep
    // spun to its cap, and fit() returned wrong components. True
    // eigenpairs are 1.5/0.5 at ±45°.
    val a = Array(Array(1.0, 0.5), Array(0.5, 1.0))
    val (vals, vecs) = EmbeddingPca.symmetricEigen(a)
    assert(vals.sorted.zip(Array(0.5, 1.5)).forall {
      case (x, y) => math.abs(x - y) < 1e-12 }, vals.toSeq)
    // eigenvector components are ±1/√2
    vecs.foreach(_.foreach(v =>
      assert(math.abs(math.abs(v) - math.sqrt(0.5)) < 1e-12, v)))
  }

  test("fit: empty input and ragged dims are clear errors, in one pass") {
    val e = intercept[Exception] {
      EmbeddingPca.fit(Seq.empty[Seq[Double]].toDF("v"), "v", k = 1)
    }
    val m = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(m.contains(">= 2 rows"), m)
    val e2 = intercept[Exception] {
      EmbeddingPca.fit(
        Seq(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)).toDF("v"), "v", k = 1)
    }
    val m2 = Iterator.iterate(e2: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(m2.contains("ragged"), m2)
  }

  test("symmetricEigen recovers a known spectrum exactly") {
    // diag(5, 2, -1) rotated by a fixed orthogonal basis
    val theta = 0.6
    val c = math.cos(theta); val s = math.sin(theta)
    val q = Array(
      Array(c, -s, 0.0),
      Array(s, c, 0.0),
      Array(0.0, 0.0, 1.0))
    val d = Array(5.0, 2.0, -1.0)
    val a = Array.tabulate(3, 3) { (i, j) =>
      (0 until 3).map(k => q(i)(k) * d(k) * q(j)(k)).sum
    }
    val (vals, vecs) = EmbeddingPca.symmetricEigen(a)
    assert(vals.sorted.zip(d.sorted).forall { case (x, y) => math.abs(x - y) < 1e-12 })
    // each recovered eigenvector satisfies Av = λv
    for (j <- 0 until 3) {
      val v = Array.tabulate(3)(i => vecs(i)(j))
      val av = a.map(row => dot(row, v))
      assert(av.zip(v).forall { case (x, y) => math.abs(x - vals(j) * y) < 1e-12 })
    }
  }
}
