package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
  * Scale design: the ONLY corpus-sized work is the moment pass computing
  * (n, M[d], upper-triangle S) in exact longs (commutative integer adds:
  * partition-order invariant by construction) — one treeAggregate up to
  * [[PlainScatterMaxDim]], the row-block-sharded layout above it
  * (768/1024/4096-d embedding models), bit-identical by construction.
  * Everything after is model-sized (d² entries) on the driver, the same
  * split as [[EmbeddingPca.fit]]'s Gramian-then-Jacobi.
  */
object EmbeddingPcaInt {

  val QScale = 10000L
  val XScale = 1000000L

  /** Coarsening divisor for the deflation step: z = ⌊x₁/ZDiv⌋ keeps
    * |z| ≤ 10², which bounds every deflated-matrix intermediate inside
    * HUGEINT at the fixture sizes (n ≤ ~10⁴, d = 64). */
  val ZDiv = 10000L

  final case class PowerModel(n: Long, vector: Array[Long], lambdaQ: Long,
      rounds: Int)

  /** Top-2 model from [[fitTop2]]: the dominant pair plus the deflated
    * second pair, all in exact fixed point. λ values are in A-units
    * (divide by n²·10⁸ for covariance units); `mu` is the quantized
    * per-dim mean ⌊M_i/n⌋ consumed by [[projectTop2]]. */
  final case class Deflate2Model(n: Long, v1: Array[Long], lambda1Q: Long,
      v2: Array[Long], lambda2Q: Long, rounds: Int, mu: Array[Long])

  /** Engine-portable floor division (n > 0): the dividend is reduced by
    * its non-negative remainder first, so truncating division is exact —
    * the same form the k-means/PQ oracles use. */
  def floorDivPortable(s: BigInt, n: BigInt): BigInt =
    (s - ((s % n + n) % n)) / n

  /** Loud BigInt→Long narrowing: λ_q is in A-units ≈ n²·10⁸·λ_cov, which
    * leaves Long range near n ≈ 3·10⁵ — wrap silently and the model is
    * garbage while the DuckDB oracle's CAST errors asymmetrically. Same
    * loud-overflow discipline as DotProductInt. */
  private def toLongExact(b: BigInt, what: String): Long = {
    require(b.isValidLong,
      s"$what = $b exceeds Long range (corpus too large for A-unit " +
        "fixed-point — reduce n or rescale)")
    b.toLong
  }

  /** Above this dim the moment pass switches from one treeAggregate to
    * the row-block-sharded layout ([[momentsBlocked]]) — both are exact
    * integer sums of the same terms, so the two layouts are bit-identical
    * (PcaIntSpec proves it by running both on the same corpus). */
  val PlainScatterMaxDim = 512

  /** Target record size for one row-block of the sharded triangle:
    * 2¹⁸ longs = 2 MB — small enough to shuffle/merge comfortably, large
    * enough that 4096-d needs only 64 blocks (blkRows = 2¹⁸/d). */
  private val BlockTargetLongs = 1 << 18

  /** Hard dim ceiling: the driver holds the d² BigInt scatter and runs
    * the d²-per-round power chain, so past ~8k dims the model-sized work
    * stops being model-sized (8192² BigInts ≈ several GB). Raising this
    * needs a driver-side blocked scatter too, not just the moment pass.
    * This is a PERMANENT contract, not a TODO (posture recorded in
    * COVERAGE.md, r14): no published embedding model exceeds ~4096 dims,
    * so the driver-blocked scatter would be complexity for a dim nobody
    * ships. */
  val MaxDim = 8192

  /** Ragged upper triangle: row i holds S(i, i), …, S(i, d−1). */
  private type TriRows = Array[Array[Long]]

  /** The ONLY corpus-sized work: one moment pass in exact longs
    * (commutative integer adds — partition-order invariant), then the
    * d×d scatter A = n·S − M·Mᵀ in BigInt on the driver. S is symmetric,
    * so the pass accumulates the upper triangle only (halves the
    * inner-loop flops on the corpus-sized work) and mirrors on the
    * driver. All accumulation is `Math.multiplyExact`/`addExact`: the
    * fixed-point family's loud-overflow discipline — an un-normalized
    * corpus (|qv| beyond the documented ≲10⁴ moment budget) raises with
    * an ArithmeticException instead of silently wrapping into a
    * plausible-but-garbage model.
    *
    * Two layouts, bit-identical by construction (same integer terms,
    * exact adds):
    *  - d ≤ [[PlainScatterMaxDim]]: one treeAggregate whose accumulator
    *    is the whole triangle — the 64-d board path, zero shuffles;
    *  - above it (768/1024/4096-d embedding models): the triangle is
    *    sharded into contiguous ROW BLOCKS of ~[[BlockTargetLongs]]
    *    longs each; every input partition still makes one local pass,
    *    then emits its partial triangle as per-block records that merge
    *    via `reduceByKey` ACROSS executors (no single d²-long object is
    *    ever serialized, merge parallelism = block count) and collect as
    *    B modest records — one extra shuffle of ≤ d²/2 longs PER INPUT
    *    PARTITION (each partition ships its whole partial; 67 MB × P at
    *    4096-d — trivial next to the corpus scan it replaces, and the
    *    reduce side only ever holds two copies of one block).
    *    Per-TASK working memory is still the d²/2-long partial triangle
    *    (67 MB at 4096-d — executor-sized, not driver-sized; MEASURED by
    *    ScaleSmoke's `pcaint-wide` section, 32 concurrent tasks at
    *    2048/4096-d inside one 8 GB JVM); a
    *    sketched-moments variant would shrink that but trades exactness
    *    away and is NOT compatible with the fixed-point replay contract. */
  private def scatter(df: DataFrame, vecCol: String, blocked: Boolean)
      : (Long, Array[Long], Array[Array[BigInt]]) = {
    val rows = df.select(col(vecCol).cast("array<double>")).rdd
      .map(_.getSeq[Double](0).toArray)
    val d = rows.first().length
    // loud ceiling instead of an unguided driver/executor OOM: past this
    // the d^2 BigInt scatter and power rounds are no longer driver-sized
    require(d <= MaxDim, s"dim $d > $MaxDim — the driver-side d^2 scatter/" +
      "power chain is the limit; reduce the dim (PCA-project first) or " +
      "extend the blocked layout to the driver stage before raising MaxDim")
    val (n, m, s) =
      if (blocked || d > PlainScatterMaxDim) momentsBlocked(rows, d)
      else momentsPlain(rows, d)
    require(n > 0, "fitPower: empty input")
    val a = Array.tabulate(d, d) { (i, j) =>
      val sij = if (j >= i) s(i)(j - i) else s(j)(i - j) // mirror the triangle
      BigInt(n) * sij - BigInt(m(i)) * BigInt(m(j))
    }
    (n, m, a)
  }

  /** Quantize one row in place into `q`. */
  @inline private def quantize(x: Array[Double], q: Array[Long], d: Int)
      : Unit = {
    var i = 0
    while (i < d) { q(i) = math.floor(x(i) * QScale).toLong; i += 1 }
  }

  /** Accumulate one quantized row into (m, tri). */
  @inline private def accumulate(q: Array[Long], m: Array[Long],
      tri: TriRows, d: Int): Unit = {
    var i = 0
    while (i < d) {
      m(i) = Math.addExact(m(i), q(i))
      val ti = tri(i); val qi = q(i)
      var j = i
      while (j < d) {
        ti(j - i) = Math.addExact(ti(j - i), Math.multiplyExact(qi, q(j)))
        j += 1
      }
      i += 1
    }
  }

  private def newTri(d: Int): TriRows =
    Array.tabulate(d)(i => new Array[Long](d - i))

  /** ≤512-d layout: one treeAggregate, the triangle is the accumulator. */
  private def momentsPlain(rows: org.apache.spark.rdd.RDD[Array[Double]],
      d: Int): (Long, Array[Long], TriRows) =
    rows.treeAggregate((0L, new Array[Long](d), newTri(d)))(
      seqOp = { case ((n0, m0, s0), x) =>
        val q = new Array[Long](d)
        quantize(x, q, d)
        accumulate(q, m0, s0, d)
        (n0 + 1, m0, s0)
      },
      combOp = { case ((n1, m1, s1), (n2, m2, s2)) =>
        var i = 0
        while (i < d) {
          m1(i) = Math.addExact(m1(i), m2(i))
          val a = s1(i); val b = s2(i)
          var j = 0
          while (j < a.length) { a(j) = Math.addExact(a(j), b(j)); j += 1 }
          i += 1
        }
        (n1 + n2, m1, s1)
      })

  /** >512-d layout: per-partition local pass, triangle emitted as
    * contiguous row-block records, merged distributed via reduceByKey.
    * Key −1 carries (n, M) packed as one long array. */
  private def momentsBlocked(rows: org.apache.spark.rdd.RDD[Array[Double]],
      d: Int): (Long, Array[Long], TriRows) = {
    val blkRows = math.max(1, BlockTargetLongs / d)
    val nBlocks = (d + blkRows - 1) / blkRows
    val parts = rows.mapPartitions { it =>
      var n0 = 0L
      val m0 = new Array[Long](d)
      val tri = newTri(d)
      val q = new Array[Long](d)
      while (it.hasNext) {
        quantize(it.next(), q, d)
        accumulate(q, m0, tri, d)
        n0 += 1L
      }
      if (n0 == 0L) Iterator.empty
      else {
        val head = new Array[Long](d + 1)
        head(0) = n0
        System.arraycopy(m0, 0, head, 1, d)
        // lazily flatten each row block so only one block copy is live
        // beyond the partial triangle at any moment
        Iterator.single((-1, head)) ++ (0 until nBlocks).iterator.map { b =>
          val lo = b * blkRows
          val hi = math.min(d, lo + blkRows)
          var len = 0
          var i = lo
          while (i < hi) { len += d - i; i += 1 }
          val out = new Array[Long](len)
          var off = 0
          i = lo
          while (i < hi) {
            val ti = tri(i)
            System.arraycopy(ti, 0, out, off, ti.length)
            off += ti.length
            i += 1
          }
          (b, out)
        }
      }
    }
    val merged = parts.reduceByKey(
      { (a, b) =>
        var i = 0
        while (i < a.length) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
        a
      },
      numPartitions =
        math.min(nBlocks + 1, rows.sparkContext.defaultParallelism))
      .collectAsMap()
    require(merged.contains(-1), "fitPower: empty input")
    val head = merged(-1)
    val n = head(0)
    val m = java.util.Arrays.copyOfRange(head, 1, d + 1)
    val tri = new Array[Array[Long]](d)
    var b = 0
    while (b < nBlocks) {
      val arr = merged(b)
      val lo = b * blkRows
      val hi = math.min(d, lo + blkRows)
      var off = 0
      var i = lo
      while (i < hi) {
        tri(i) = java.util.Arrays.copyOfRange(arr, off, off + (d - i))
        off += d - i
        i += 1
      }
      b += 1
    }
    (n, m, tri)
  }

  /** Unrolled normalized power rounds from x₀ = (XScale, …): y = A·x,
    * then x′ = ⌊y·XScale / max|y|⌋ coordinate-wise. */
  private def powerRounds(a: Array[Array[BigInt]], rounds: Int)
      : Array[BigInt] = {
    val d = a.length
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
    x
  }

  /** Rayleigh quotient ⌊xᵀAx / xᵀx⌋ in A-units. */
  private def rayleigh(a: Array[Array[BigInt]], x: Array[BigInt]): BigInt = {
    val d = a.length
    var acc = BigInt(0)
    var i = 0
    while (i < d) {
      var j = 0
      while (j < d) { acc += x(i) * a(i)(j) * x(j); j += 1 }
      i += 1
    }
    floorDivPortable(acc, x.map(v => v * v).sum)
  }

  /** `blockedScatter` pins the sharded moment layout regardless of dim
    * (the two layouts are bit-identical — PcaIntSpec proves it); above
    * [[PlainScatterMaxDim]] the blocked layout is used either way. */
  def fitPower(df: DataFrame, vecCol: String, rounds: Int,
      blockedScatter: Boolean = false): PowerModel = {
    require(rounds >= 1, s"rounds=$rounds")
    val (n, _, a) = scatter(df, vecCol, blockedScatter)
    val x = powerRounds(a, rounds)
    PowerModel(n, x.map(_.toLong),
      toLongExact(rayleigh(a, x), "lambda_q"), rounds)
  }

  /** Top-2 eigenpairs by exact-integer power iteration with Hotelling
    * deflation — one shared moment pass, then (driver-side, d²-sized):
    *
    *  - x₁ = the dominant chain ([[fitPower]]'s rounds, bit-identical);
    *  - coarsen z = ⌊x₁/ZDiv⌋ (|z| ≤ 10²), den = zᵀz, num = zᵀAz;
    *  - deflate ENTIRELY in integers, back to A-units:
    *    B_ij = ⌊(den²·A_ij − num·z_i·z_j) / den²⌋ — the num·zzᵀ/den²
    *    rank-1 subtraction with one portable floor per entry (the ≤1
    *    absolute error per entry is ~10⁻¹⁴ relative at fixture scale and
    *    identical in every engine);
    *  - x₂ = the same power chain over B; λ₂ = Rayleigh over B (B is in
    *    A-units, so λ₁ and λ₂ are directly comparable).
    *
    * The coarse z (2 significant digits) leaves a deflation residual of
    * ~10⁻² λ₁ in the x₁ direction — far below λ₂ for any non-degenerate
    * spectrum, so the B chain converges to the second component; the spec
    * adjudicates alignment against the float Jacobi eigensolve while the
    * DuckDB oracle replays every integer of this contract. */
  def fitTop2(df: DataFrame, vecCol: String, rounds: Int,
      blockedScatter: Boolean = false): Deflate2Model = {
    require(rounds >= 1, s"rounds=$rounds")
    val (n, m, a) = scatter(df, vecCol, blockedScatter)
    val d = a.length
    val x1 = powerRounds(a, rounds)
    val z = x1.map(v => floorDivPortable(v, BigInt(ZDiv)))
    val den = z.map(v => v * v).sum
    require(den > 0, "fitTop2: dominant eigenvector vanished under ZDiv")
    val num = {
      var acc = BigInt(0)
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { acc += z(i) * a(i)(j) * z(j); j += 1 }
        i += 1
      }
      acc
    }
    val den2 = den * den
    val b = Array.tabulate(d, d) { (i, j) =>
      floorDivPortable(den2 * a(i)(j) - num * z(i) * z(j), den2)
    }
    val x2 = powerRounds(b, rounds)
    val mu = m.map(mi => floorDivPortable(BigInt(mi), BigInt(n)).toLong)
    Deflate2Model(n, x1.map(_.toLong),
      toLongExact(rayleigh(a, x1), "lambda1_q"),
      x2.map(_.toLong), toLongExact(rayleigh(b, x2), "lambda2_q"),
      rounds, mu)
  }

  /** Exact integer top-2 projection — the twin of
    * [[EmbeddingPca.project]]'s score step, with the quantized-mean
    * centering defined so EVERY value is engine-replayable:
    *
    *   pc_kq = Σ_i (qv_i − mu_i) · v_k,i,   qv = ⌊x·10⁴⌋, mu = ⌊M/n⌋
    *
    * n never multiplies a per-row term, so with |qv − mu| ≤ 2·10⁴,
    * |v| ≤ 10⁶ the scores stay ≤ 2·10¹⁰·d — long-safe at ANY corpus size
    * up to d ≈ 4·10⁸ (every real embedding dim). Per-row map over broadcast literal vectors: no shuffle, no
    * driver loop; projection units are QScale·XScale times the
    * unit-vector projection (v is not unit-norm — callers comparing to
    * float PCA divide by ‖v‖). */
  def projectTop2(df: DataFrame, vecCol: String, idCol: String,
      model: Deflate2Model): DataFrame = {
    val qv = transform(col(vecCol).cast("array<double>"),
      x => floor(x * lit(QScale.toDouble)))
    val cd = zip_with(qv, typedLit(model.mu.toSeq), (a, b) => a - b)
    def pc(v: Array[Long]): Column =
      graft.functions.DotProductInt(cd, typedLit(v.toSeq))
    df.select(col(idCol), pc(model.v1).as("pc1_q"), pc(model.v2).as("pc2_q"))
  }
}
