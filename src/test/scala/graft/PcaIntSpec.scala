package graft

import graft.operators.{EmbeddingPca, EmbeddingPcaInt}

/** Integer power-iteration PCA twin: the fixed-point dominant eigenvector
  * must align with the float Jacobi eigensolve's top component, be
  * invariant to input partitioning (exact integer moment adds commute),
  * and the portable floor-div must be true floor division. */
class PcaIntSpec extends SparkSpec {

  test("dominant eigenvector aligns with the float eigensolve's top component") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val pm = EmbeddingPcaInt.fitPower(emb, "embedding", rounds = 80)
    val fl = EmbeddingPca.fit(emb, "embedding", k = 1)
    val v = pm.vector.map(_.toDouble)
    val w = fl.components.head
    val cos = {
      val dot = v.zip(w).map { case (a, b) => a * b }.sum
      val na = math.sqrt(v.map(x => x * x).sum)
      val nb = math.sqrt(w.map(x => x * x).sum)
      dot / (na * nb)
    }
    assert(math.abs(cos) > 0.999, s"|cos| = ${math.abs(cos)}")
    // Rayleigh quotient in A-units ≈ n²·10⁸·λ_cov: same eigenvalue the
    // float path reports, within power-iteration + quantization error
    val n = emb.count().toDouble
    val lamCov = pm.lambdaQ.toDouble / (n * n * 1e8)
    val lamFl = fl.eigenvalues.head
    assert(math.abs(lamCov - lamFl) / lamFl < 0.01,
      s"lambda $lamCov vs float $lamFl")
  }

  test("fitPower is invariant to input partitioning") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val a = EmbeddingPcaInt.fitPower(emb, "embedding", rounds = 6)
    val b = EmbeddingPcaInt.fitPower(emb.repartition(7), "embedding",
      rounds = 6)
    assert(a.vector.toSeq === b.vector.toSeq)
    assert(a.lambdaQ === b.lambdaQ)
    assert(a.n === b.n)
  }

  test("fitTop2: deflated second pair aligns with the float eigensolve; first pair is fitPower bit-for-bit") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dm = EmbeddingPcaInt.fitTop2(emb, "embedding", rounds = 80)
    val pm = EmbeddingPcaInt.fitPower(emb, "embedding", rounds = 80)
    // the dominant chain inside fitTop2 IS fitPower's — bit-identical
    assert(dm.v1.toSeq === pm.vector.toSeq)
    assert(dm.lambda1Q === pm.lambdaQ)
    val fl = EmbeddingPca.fit(emb, "embedding", k = 2)
    def cos(v: Array[Double], w: Array[Double]): Double = {
      val dot = v.zip(w).map { case (a, b) => a * b }.sum
      dot / (math.sqrt(v.map(x => x * x).sum) *
        math.sqrt(w.map(x => x * x).sum))
    }
    val v2 = dm.v2.map(_.toDouble)
    assert(math.abs(cos(v2, fl.components(1))) > 0.99,
      s"|cos v2| = ${math.abs(cos(v2, fl.components(1)))}")
    // deflation residual: x2 must have left the x1 direction
    assert(math.abs(cos(v2, dm.v1.map(_.toDouble))) < 0.05,
      s"|cos(v2, v1)| = ${math.abs(cos(v2, dm.v1.map(_.toDouble)))}")
    // λ₂ in covariance units matches the float second eigenvalue
    val n = emb.count().toDouble
    val lam2Cov = dm.lambda2Q.toDouble / (n * n * 1e8)
    assert(math.abs(lam2Cov - fl.eigenvalues(1)) / fl.eigenvalues(1) < 0.02,
      s"lambda2 $lam2Cov vs float ${fl.eigenvalues(1)}")
    // ordering: the deflated eigenvalue sits below the dominant one
    assert(dm.lambda2Q < dm.lambda1Q)
  }

  test("fitTop2 + projectTop2 recover an analytic 2-D spectrum exactly") {
    import spark.implicits._
    // points (±3,0),(0,±1): mean 0, cov = diag(4.5, 0.5) — eigenpairs
    // known in closed form, every fixed-point intermediate exact
    val df = Seq((1L, Seq(3.0f, 0.0f)), (2L, Seq(-3.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.0f, -1.0f)))
      .toDF("vec_id", "embedding")
    val dm = EmbeddingPcaInt.fitTop2(df, "embedding", rounds = 40)
    // A = n·S = diag(72e8, 8e8); the off-axis coordinate decays 9× per
    // round from the all-ones start, hitting exactly 0 well before 40
    assert(dm.v1.toSeq === Seq(1000000L, 0L))
    assert(dm.v2.toSeq === Seq(0L, 1000000L))
    // λ in covariance units: λ_q / (n²·10⁸)
    assert(dm.lambda1Q === 72L * 100000000L) // 4.5 · 16 · 1e8
    assert(dm.lambda2Q === 8L * 100000000L) // 0.5 · 16 · 1e8
    assert(dm.mu.toSeq === Seq(0L, 0L))
    val got = EmbeddingPcaInt.projectTop2(df, "embedding", "vec_id", dm)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, 30000000000L, 0L), (2L, -30000000000L, 0L),
      (3L, 0L, 10000000000L), (4L, 0L, -10000000000L)))
  }

  test("projectTop2 equals an independent scalar recompute, bit for bit") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val dm = EmbeddingPcaInt.fitTop2(emb, "embedding", rounds = 80)
    val got = EmbeddingPcaInt.projectTop2(emb, "embedding", "vec_id", dm)
      .select($"vec_id", $"pc1_q", $"pc2_q").as[(Long, Long, Long)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    // independent reference: quantize + mean + projection in plain scalar
    // loops over the collected rows (no model.mu — mu is recomputed here)
    val rows = emb.select($"vec_id",
        $"embedding".cast("array<double>")).as[(Long, Seq[Double])]
      .collect().map { case (id, v) =>
        id -> v.map(x => math.floor(x * 10000.0).toLong).toArray
      }
    val d = rows.head._2.length
    val n = rows.length
    val mu = Array.tabulate(d) { i =>
      EmbeddingPcaInt.floorDivPortable(
        BigInt(rows.map(_._2(i)).sum), BigInt(n)).toLong
    }
    for ((id, qv) <- rows) {
      val want1 = (0 until d).map(i => (qv(i) - mu(i)) * dm.v1(i)).sum
      val want2 = (0 until d).map(i => (qv(i) - mu(i)) * dm.v2(i)).sum
      assert(got(id) === ((want1, want2)), s"projection mismatch at $id")
    }
    // and the integer projections align with the float PCA's (same
    // components up to sign and the fixed q-scales): |pearson| ≈ 1
    val fl = EmbeddingPca.fit(emb, "embedding", k = 2)
    val flp = emb.select($"vec_id",
        EmbeddingPca.project(fl, $"embedding").as("p"))
      .select($"vec_id", $"p"(0), $"p"(1)).as[(Long, Double, Double)]
      .collect().map(t => t._1 -> (t._2, t._3)).toMap
    def pearson(a: Seq[Double], b: Seq[Double]): Double = {
      val ma = a.sum / a.size; val mb = b.sum / b.size
      val cov = a.zip(b).map { case (x, y) => (x - ma) * (y - mb) }.sum
      val sa = math.sqrt(a.map(x => (x - ma) * (x - ma)).sum)
      val sb = math.sqrt(b.map(x => (x - mb) * (x - mb)).sum)
      cov / (sa * sb)
    }
    val ids = got.keys.toSeq.sorted
    val r1 = pearson(ids.map(got(_)._1.toDouble), ids.map(flp(_)._1))
    val r2 = pearson(ids.map(got(_)._2.toDouble), ids.map(flp(_)._2))
    assert(math.abs(r1) > 0.999, s"pc1 pearson $r1")
    assert(math.abs(r2) > 0.99, s"pc2 pearson $r2")
  }

  test("fitTop2 is invariant to input partitioning") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val a = EmbeddingPcaInt.fitTop2(emb, "embedding", rounds = 6)
    val b = EmbeddingPcaInt.fitTop2(emb.repartition(7), "embedding",
      rounds = 6)
    assert(a.v1.toSeq === b.v1.toSeq)
    assert(a.v2.toSeq === b.v2.toSeq)
    assert(a.lambda1Q === b.lambda1Q)
    assert(a.lambda2Q === b.lambda2Q)
  }

  test("fitTop2 raises loudly on a zero-variance corpus") {
    import spark.implicits._
    val flat = Seq((1L, Seq(1.0f, 2.0f)), (2L, Seq(1.0f, 2.0f)),
      (3L, Seq(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      EmbeddingPcaInt.fitTop2(flat, "embedding", rounds = 4)
    }
    assert(e.getMessage.contains("zero scatter"), e.getMessage)
  }

  test("blocked scatter layout is bit-identical to the plain treeAggregate") {
    // the 768-d scale path must never change a result: force the
    // row-block-sharded moment layout on the 64-d fixture and compare
    // every model field against the plain layout, bit for bit
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val plain = EmbeddingPcaInt.fitTop2(emb, "embedding", rounds = 80)
    val blocked = EmbeddingPcaInt.fitTop2(emb, "embedding", rounds = 80,
      blockedScatter = true)
    assert(blocked.n === plain.n)
    assert(blocked.v1.toSeq === plain.v1.toSeq)
    assert(blocked.v2.toSeq === plain.v2.toSeq)
    assert(blocked.lambda1Q === plain.lambda1Q)
    assert(blocked.lambda2Q === plain.lambda2Q)
    assert(blocked.mu.toSeq === plain.mu.toSeq)
    // and under adversarial partitioning (exact adds commute)
    val blockedRep = EmbeddingPcaInt.fitTop2(emb.repartition(7),
      "embedding", rounds = 80, blockedScatter = true)
    assert(blockedRep.v1.toSeq === plain.v1.toSeq)
    assert(blockedRep.lambda1Q === plain.lambda1Q)
  }

  test("a 768-d corpus fits through the blocked path with a recoverable spectrum") {
    import spark.implicits._
    // deterministic 768-d corpus with a PLANTED dominant direction: rows
    // are s·u + noise, u the normalized alternating ramp; the blocked
    // moment pass (auto-selected above PlainScatterMaxDim = 512) must
    // recover u — this dim raised a require() before r13
    val d = 768
    val u = {
      val raw = Array.tabulate(d)(i => (if (i % 2 == 0) 1.0 else -1.0) *
        (1.0 + (i % 7) / 7.0))
      val norm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / norm)
    }
    val rnd = new scala.util.Random(42)
    val rows = (0 until 600).map { id =>
      val s = if (id % 2 == 0) 1.0 else -1.0 // symmetric: mean ≈ 0
      val v = Array.tabulate(d)(i =>
        (s * u(i) + rnd.nextGaussian() * 0.01).toFloat)
      (id.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("embedding",
        org.apache.spark.sql.functions.col("embedding").cast("array<float>"))
      .repartition(5)
    val pm = EmbeddingPcaInt.fitPower(df, "embedding", rounds = 40)
    assert(pm.n === 600L)
    assert(pm.vector.length === d)
    assert(pm.lambdaQ > 0L)
    val v = pm.vector.map(_.toDouble)
    val cos = {
      val dot = v.zip(u).map { case (a, b) => a * b }.sum
      dot / math.sqrt(v.map(x => x * x).sum)
    }
    assert(math.abs(cos) > 0.999, s"|cos vs planted| = ${math.abs(cos)}")
    // projections stay long-safe at 768-d (the projectTop2 bound is
    // 2·10¹⁰·d): exercise the full top-2 surface end to end
    val dm = EmbeddingPcaInt.fitTop2(df, "embedding", rounds = 40)
    assert(dm.v1.toSeq === pm.vector.toSeq)
    assert(dm.lambda1Q === pm.lambdaQ)
    assert(dm.lambda2Q < dm.lambda1Q)
    val proj = EmbeddingPcaInt.projectTop2(df, "embedding", "vec_id", dm)
    assert(proj.count() === 600L)
  }

  test("floorDivPortable is floor division for every sign combination") {
    for {
      s <- Seq(BigInt(-7), BigInt(7), BigInt(-6), BigInt(0), BigInt(1),
        BigInt(-1))
      n <- Seq(BigInt(2), BigInt(3), BigInt(5))
    } {
      val want = BigInt(Math.floorDiv(s.toLong, n.toLong))
      assert(EmbeddingPcaInt.floorDivPortable(s, n) === want, s"($s, $n)")
    }
  }
}
