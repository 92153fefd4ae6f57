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
