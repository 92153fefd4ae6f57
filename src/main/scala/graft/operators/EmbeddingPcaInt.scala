package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer fixed-point power-iteration twin of [[EmbeddingPca]] — the
  * dominant eigenvector (and its Rayleigh quotient) of the embedding
  * covariance computed ENTIRELY in exact integer arithmetic, so the whole
  * run — quantize → one distributed moment pass → scatter matrix →
  * unrolled normalized power rounds — REPLAYS in ANSI SQL and the PCA
  * family gains a hash-checked member beyond the trace invariant
  * (`emb_pca_trace`). The float production path stays [[EmbeddingPca]]
  * (full Jacobi spectrum, float projections — a driver-side eigensolve is
  * not SQL-expressible); THIS twin verifies the dominant-eigenstructure
  * mechanics against an independent engine.
  *
  * Reference behavior being twinned: the embedding-space geometry the
  * reference's IVF training consumes (`storage_impl.py:152-162`) — PCA
  * whitening/reduction is the standard preprocessing stage of that
  * pipeline.
  *
  * Fixed-point contract (mirrored verbatim by the SQL oracle):
  *  - quantize: qv = ⌊v·10⁴⌋ (BIGINT);
  *  - scatter: A = n·S − M·Mᵀ where S_ij = Σ_v qv_i qv_j and M_i = Σ_v
  *    qv_i — n² times the covariance in quantized units, all integral;
  *  - power rounds from x₀ = (10⁶, …, 10⁶): y = A·x, then renormalize
  *    x′ = floorDiv(y·10⁶, max|y|) — floor division written in the
  *    engine-portable non-negative-mod form, so |x′| ≤ 10⁶ and every
  *    coordinate is engine-identical;
  *  - λ_q = floorDiv(xᵀA x, xᵀx) — the Rayleigh quotient in A-units
  *    (divide by n²·10⁸ for covariance units).
  *
  * Magnitudes (64-dim): |qv| ≤ 10⁴ ⇒ S_ij ≤ n·10⁸ (long-safe to n ≈
  * 9·10¹⁰); A_ij ≤ 2n²·10⁸ and the iteration runs in BigInt / HUGEINT
  * (y ≤ 64·A·10⁶ ≈ 10²³ at n = 4000 — far inside 128-bit).
  *
  * Scale design: the ONLY corpus-sized work is the moment pass — one
  * treeAggregate computing (n, M[d], S[d][d]) in exact longs (commutative
  * integer adds: partition-order invariant by construction). Everything
  * after is model-sized (d² = 4096 entries) on the driver, the same
  * split as [[EmbeddingPca.fit]]'s Gramian-then-Jacobi.
  */
object EmbeddingPcaInt {

  val QScale = 10000L
  val XScale = 1000000L

  final case class PowerModel(n: Long, vector: Array[Long], lambdaQ: Long,
      rounds: Int)

  /** Engine-portable floor division (n > 0): the dividend is reduced by
    * its non-negative remainder first, so truncating division is exact —
    * the same form the k-means/PQ oracles use. */
  def floorDivPortable(s: BigInt, n: BigInt): BigInt =
    (s - ((s % n + n) % n)) / n

  def fitPower(df: DataFrame, vecCol: String, rounds: Int): PowerModel = {
    require(rounds >= 1, s"rounds=$rounds")
    val rows = df.select(col(vecCol).cast("array<double>")).rdd
      .map(_.getSeq[Double](0).toArray)
    val d = rows.first().length
    require(d <= 512, s"dim $d too large for a d^2 driver accumulator")
    val zero = (0L, new Array[Long](d), Array.ofDim[Long](d, d))
    val (n, m, s) = rows.treeAggregate(zero)(
      seqOp = { case ((n0, m0, s0), x) =>
        val q = new Array[Long](d)
        var i = 0
        while (i < d) { q(i) = math.floor(x(i) * QScale).toLong; i += 1 }
        i = 0
        while (i < d) {
          m0(i) += q(i)
          val si = s0(i); val qi = q(i)
          var j = 0
          while (j < d) { si(j) += qi * q(j); j += 1 }
          i += 1
        }
        (n0 + 1, m0, s0)
      },
      combOp = { case ((n1, m1, s1), (n2, m2, s2)) =>
        var i = 0
        while (i < d) {
          m1(i) += m2(i)
          val a = s1(i); val b = s2(i)
          var j = 0
          while (j < d) { a(j) += b(j); j += 1 }
          i += 1
        }
        (n1 + n2, m1, s1)
      })
    require(n > 0, "fitPower: empty input")
    // scatter in BigInt: A_ij = n·S_ij − M_i·M_j
    val a = Array.tabulate(d, d) { (i, j) =>
      BigInt(n) * s(i)(j) - BigInt(m(i)) * BigInt(m(j))
    }
    var x = Array.fill(d)(BigInt(XScale))
    for (_ <- 1 to rounds) {
      val y = Array.tabulate(d) { i =>
        var acc = BigInt(0)
        var j = 0
        while (j < d) { acc += a(i)(j) * x(j); j += 1 }
        acc
      }
      val mx = y.map(_.abs).max
      require(mx > 0,
        "fitPower: zero scatter — the corpus has no variance to iterate on")
      x = y.map(v => floorDivPortable(v * XScale, mx))
    }
    val num = {
      var acc = BigInt(0)
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { acc += x(i) * a(i)(j) * x(j); j += 1 }
        i += 1
      }
      acc
    }
    val den = x.map(v => v * v).sum
    PowerModel(n, x.map(_.toLong), floorDivPortable(num, den).toLong, rounds)
  }
}
