package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the whitening / dimension-
  * reduction stage of an embedding pipeline (and the preprocessing OPQ
  * papers assume). The reference ships raw CLIP vectors only; this adds
  * the standard corpus-level spectral tooling a 100 TB embedding table
  * needs: energy compaction before PQ, drift monitoring via spectrum
  * change, low-d projections for visualization/clustering.
  *
  * Scale shape: ONE `treeAggregate` pass over the data computing the
  * d-vector sum and the d×d raw second-moment matrix per partition
  * (d ≤ 512 → ≤ 2 MB per task accumulator, combined tree-wise on the
  * driver side in O(log P) rounds); the eigensolve is a driver-side d×d
  * symmetric Jacobi — sub-millisecond at d = 64, independent of row
  * count. No shuffle of the data itself, no quadratic term in n.
  */
object EmbeddingPca {

  /** Fitted model: `mean` (d), `components` (k rows × d, orthonormal,
    * descending eigenvalue), `eigenvalues` (k, the per-component variance
    * of the CENTERED data). */
  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double]) {
    def dim: Int = mean.length
    def k: Int = components.length
  }

  /** Fit a k-component PCA. One pass; deterministic (fp addition order is
    * fixed per partition and the tree combine is order-insensitive only up
    * to fp rounding — at spec scale the variation is below the solver
    * tolerance, and determinism-sensitive callers can `repartition(1)`
    * first at small n). */
  def fit(df: DataFrame, vecCol: String, k: Int): PcaModel = {
    val rows = df.select(col(vecCol).cast("array<double>")).rdd
      .map(_.getSeq[Double](0).toArray)
    // ONE pass, as documented: the accumulator lazily sizes itself from
    // the first row it sees (the SQ8.train pattern) instead of paying a
    // separate first() job just to learn d — which also threw an
    // unhelpful NoSuchElementException on an empty input before the
    // row-count require could speak
    val zero = (0L, null: Array[Double], null: Array[Array[Double]])
    val (n, s, m) = rows.treeAggregate(zero)(
      seqOp = { case ((n0, s0x, m0x), x) =>
        val s0 = if (s0x == null) new Array[Double](x.length) else s0x
        val m0 = if (m0x == null) Array.ofDim[Double](x.length, x.length) else m0x
        val d = s0.length
        require(x.length == d,
          s"PCA: ragged vector dims (${x.length} vs $d)")
        var i = 0
        while (i < d) {
          s0(i) += x(i)
          val mi = m0(i); val xi = x(i)
          var j = i
          while (j < d) { mi(j) += xi * x(j); j += 1 }
          i += 1
        }
        (n0 + 1, s0, m0)
      },
      combOp = {
        case ((0L, _, _), r) => r
        case (l, (0L, _, _)) => l
        case ((n1, s1, m1), (n2, s2, m2)) =>
          require(s1.length == s2.length,
            s"PCA: ragged vector dims across partitions " +
              s"(${s1.length} vs ${s2.length})")
          var i = 0
          while (i < s1.length) {
            s1(i) += s2(i)
            val a = m1(i); val b = m2(i)
            var j = i
            while (j < s1.length) { a(j) += b(j); j += 1 }
            i += 1
          }
          (n1 + n2, s1, m1)
      })
    require(n > 1, s"PCA needs >= 2 rows, got $n")
    val d = s.length
    require(d <= 512, s"dim $d too large for a d^2 driver accumulator")
    require(k >= 1 && k <= d, s"k=$k out of range for dim $d")
    val mean = s.map(_ / n)
    // covariance = M/n - mean meanᵀ, symmetrized from the upper triangle
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = m(i)(j) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        j += 1
      }
      i += 1
    }
    val (vals, vecs) = symmetricEigen(cov)
    val order = vals.indices.sortBy(ix => -vals(ix)).take(k)
    PcaModel(mean,
      order.map(ix => Array.tabulate(d)(r => vecs(r)(ix))).toArray,
      order.map(ix => math.max(vals(ix), 0.0)).toArray)
  }

  /** Column: project a vector onto the model's components → k-array of
    * centered scores. Broadcast-friendly (the model is k·d + d doubles);
    * applied as a scan-local map, no shuffle. */
  def projectUdf(model: PcaModel) = udf { (v: Seq[Double]) =>
    require(v.length == model.dim, s"dim ${v.length} != model dim ${model.dim}")
    val c = new Array[Double](model.dim)
    var i = 0
    while (i < model.dim) { c(i) = v(i) - model.mean(i); i += 1 }
    model.components.map { comp =>
      var acc = 0.0
      var j = 0
      while (j < comp.length) { acc += comp(j) * c(j); j += 1 }
      acc
    }
  }

  def project(model: PcaModel, vecCol: Column): Column =
    projectUdf(model)(vecCol.cast("array<double>"))

  /** Whitened projection: each component score scaled by 1/√eigenvalue,
    * so the output has identity covariance — the standard preprocessing
    * before product quantization or Euclidean clustering when component
    * energies are imbalanced. Components with near-zero variance (below
    * `eps`) are passed through unscaled rather than exploded. */
  def whiten(model: PcaModel, vecCol: Column, eps: Double = 1e-12): Column = {
    val scales = model.eigenvalues.map(l => if (l > eps) 1.0 / math.sqrt(l) else 1.0)
    val w = udf { (p: Seq[Double]) =>
      Array.tabulate(p.length)(i => p(i) * scales(i))
    }
    w(projectUdf(model)(vecCol.cast("array<double>")))
  }

  /** Eigendecomposition of a symmetric matrix by cyclic two-sided Jacobi:
    * zero out the largest-magnitude off-diagonal pairs with Givens
    * rotations until off-diagonal mass is gone, accumulating the
    * eigenvector basis. Deterministic, dependency-free; d ≤ 512 solves in
    * milliseconds. Returns (eigenvalues, eigenvectors-as-columns). */
  private[graft] def symmetricEigen(a0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var rotated = true
    while (rotated && sweep < 64) {
      rotated = false
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-14 * (math.abs(a(p)(p)) + math.abs(a(q)(q)))
              + Double.MinPositiveValue) {
            rotated = true
            val tau = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            // tau == 0 (equal diagonal entries): signum(0) = 0 would make
            // t = 0 — an IDENTITY rotation still marked as progress, so
            // the sweep loop spins to its cap and returns a
            // non-diagonalized matrix (hit by any two features with
            // equal variance and nonzero covariance, e.g. a duplicated
            // embedding dim). The 45° rotation t = 1 zeroes apq exactly
            // in that case — the standard Jacobi guard.
            val t =
              if (tau == 0.0) 1.0
              else math.signum(tau) / (math.abs(tau) + math.sqrt(1.0 + tau * tau))
            val c = 1.0 / math.sqrt(1.0 + t * t)
            val s = c * t
            // A <- JᵀAJ on rows/cols p,q
            var k = 0
            while (k < n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }
}
