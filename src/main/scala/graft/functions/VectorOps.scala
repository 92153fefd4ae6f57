package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level vector math over `ArrayType(FloatType)` embedding columns.
  *
  * Semantics follow the reference engine: similarity is the inner product of
  * L2-normalized vectors, i.e. cosine similarity — higher is more similar
  * (reference: storage/faiss_utils.py:139 `IndexFlatIP`,
  * storage/storage_factory.py:33 `"hnsw:space": "ip"`, vector_db.py:112-114
  * normalize-at-embed). All math accumulates in fp64 regardless of the fp32
  * storage type so results are order-stable and oracle-comparable
  * (SURVEY.md §7.4 "float summation order").
  *
  * Everything here is built from codegen'd higher-order functions
  * (`zip_with`/`aggregate`/`transform`) — no UDFs — so Catalyst keeps the
  * whole expression inside whole-stage codegen and the parquet scan still
  * prunes to just the embedding column.
  */
object VectorOps {

  /** Inner product Σ aᵢ·bᵢ accumulated in DoubleType, left-to-right —
    * bit-identical to a sequential fold over the array. Dispatches to the
    * fused codegen expression [[DotProductFP64]] for ARRAY<FLOAT> inputs;
    * [[dotHof]] is the pure-built-in formulation (same bits, slower). */
  def dot(a: Column, b: Column): Column = DotProductFP64(a, b)

  /** Reference higher-order-function implementation of [[dot]]; kept for
    * spec-level cross-checking and for non-float array inputs. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0),
      (acc, v) => acc + v)

  /** Squared L2 norm Σ aᵢ². */
  def normSquared(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(normSquared(a))

  /** Cosine similarity for arbitrary (not necessarily normalized) vectors. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine distance in [0, 2]: 1 − cosine. The reference's "distance" is
    * the raw inner product (larger = closer); we expose both and rank by
    * descending similarity (SURVEY.md §2.6 semantics flag). */
  def cosineDistance(a: Column, b: Column): Column =
    lit(1.0) - cosine(a, b)

  /** Euclidean (L2) distance. */
  def l2Distance(a: Column, b: Column): Column =
    sqrt(aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast(DoubleType) - y.cast(DoubleType)
        d * d
      }),
      lit(0.0),
      (acc, v) => acc + v))

  /** Manhattan (L1) distance. */
  def l1Distance(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => abs(x.cast(DoubleType) - y.cast(DoubleType))),
      lit(0.0),
      (acc, v) => acc + v)

  /** Chebyshev (L∞) distance. */
  def lInfDistance(a: Column, b: Column): Column =
    array_max(zip_with(a, b, (x, y) => abs(x.cast(DoubleType) - y.cast(DoubleType))))

  /** L2-normalize to unit length, keeping fp32 element type (the storage
    * type of the embedding column). Zero vectors pass through unchanged. */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    transform(a, x =>
      (x.cast(DoubleType) / when(n === 0.0, 1.0).otherwise(n))
        .cast(FloatType))
  }

  /** Late-interaction MaxSim (ColBERT, Khattab & Zaharia SIGIR'20): treat
    * each embedding as `slices` packed token-vectors of `dim` floats and
    * score `Σᵢ maxⱼ ⟨aᵢ, bⱼ⟩` — each query token matches its best document
    * token, sums over query tokens. Composed entirely from codegen'd
    * [[dot]] over `slice()`s + `greatest` + an exact DECIMAL sum of the
    * 6-dp-rounded per-token maxima, so the whole score replays in SQL
    * (`knn_maxsim` oracle) and stays inside whole-stage codegen — no UDF.
    *
    * The multi-vector-in-one-array layout (token vectors concatenated
    * into a single `array<float>` column) is the storage shape a
    * late-interaction corpus would use on the durable index: one row per
    * document, slicing at scoring time. */
  def maxSim(a: Column, b: Column, slices: Int, dim: Int): Column = {
    // slices = 0 would reduce an empty term list and slices = 1 would
    // hand `greatest` a single argument (analysis error) — both are
    // legitimate-looking degenerate calls (a single-token document)
    require(slices >= 1 && dim >= 1,
      s"maxSim: need slices >= 1 and dim >= 1 (got $slices, $dim)")
    val terms = (0 until slices).map { i =>
      val ai = slice(a, i * dim + 1, dim)
      val dots = (0 until slices).map { j =>
        dot(ai, slice(b, j * dim + 1, dim))
      }
      val maxJ = if (dots.length == 1) dots.head else greatest(dots: _*)
      round(maxJ, 6).cast(DecimalType(18, 6))
    }
    terms.reduce(_ + _).cast(DoubleType)
  }
}
