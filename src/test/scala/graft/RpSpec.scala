package graft

import org.apache.spark.sql.functions._

import graft.operators.RandomProjection

class RpSpec extends SparkSpec {
  import spark.implicits._

  test("sign matrix: deterministic in (k,d,seed), balanced, ±1 only") {
    val a = RandomProjection.signMatrix(8, 64, 7L)
    val b = RandomProjection.signMatrix(8, 64, 7L)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    assert(a.flatten.forall(v => v == 1.0 || v == -1.0))
    // a different seed gives a different matrix
    val c = RandomProjection.signMatrix(8, 64, 8L)
    assert(a.map(_.toSeq).toSeq !== c.map(_.toSeq).toSeq)
    // Rademacher balance: mean |row sum| over 8 rows of 64 fair signs
    // should be well under d/4 (crude 4σ-ish bound, seed-pinned anyway)
    val imbalance = a.map(_.sum.abs).max
    assert(imbalance <= 24.0, s"suspicious sign imbalance $imbalance")
  }

  test("projectExpr matches a driver-side fold bit-for-bit") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(20)
    val got = emb.select(col("vec_id"),
        RandomProjection.projectExpr("embedding", 8, 64, 7L).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    val s = RandomProjection.signMatrix(8, 64, 7L)
    val raw = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    raw.foreach { case (id, v) =>
      val want = s.map { row =>
        var acc = 0.0
        var j = 0
        while (j < 64) { acc += v(j) * row(j); j += 1 }
        acc
      }
      assert(got(id) === want.toSeq, s"projection mismatch for vec $id")
    }
  }

  test("JL: pairwise distances are preserved within Achlioptas distortion") {
    // k=32 on unit-ish 64-d vectors: eps ~ sqrt(8 ln(n) / k) is the
    // textbook bound; with n=40 pairs and k=32 the observed distortion
    // should sit comfortably inside eps = 1.0 (loose, but the point is
    // catching a broken fold/sign matrix, which distorts wildly)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet").limit(40)
    val proj = emb.select(col("vec_id"),
        RandomProjection.projectExpr("embedding", 32, 64, 3L).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    val raw = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect()
    val scale = 1.0 / 32 // E[||proj||^2] = k ||x||^2 for Rademacher signs
    for (i <- raw.indices; j <- (i + 1) until raw.length) {
      val d0 = raw(i)._2.zip(raw(j)._2).map { case (a, b) => (a - b) * (a - b) }.sum
      val d1 = proj(raw(i)._1).zip(proj(raw(j)._1))
        .map { case (a, b) => (a - b) * (a - b) }.sum * scale
      assert(d1 >= d0 * 0.2 && d1 <= d0 * 3.0,
        s"distance distorted: $d0 -> $d1 for pair (${raw(i)._1},${raw(j)._1})")
    }
  }

  test("projectLong emits k rows per vector with stable rounding") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val out = RandomProjection.projectLong(emb, "vec_id", "embedding", 8, 64, 7L)
    val n = emb.count()
    assert(out.count() === n * 8)
    assert(out.groupBy("vec_id").count().filter(col("count") =!= 8).count() === 0L)
  }
}
