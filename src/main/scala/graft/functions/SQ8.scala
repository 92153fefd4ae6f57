package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained 8-bit scalar quantization — the `SQ8` sibling of the
  * reference's `SQfp16` index compression (reference:
  * storage/storage_impl.py:87 builds `IVF{nlist},SQfp16`; FAISS's
  * `QT_8bit` is the next notch down): 1 byte/element at rest, 4× smaller
  * than fp32, 2× smaller than [[FP16]].
  *
  * FAISS `QT_8bit` semantics: per-dimension trained bounds [vmin_i,
  * vmax_i]; encode x → ⌊(x−vmin)/(vmax−vmin)·256⌋ clamped to [0,255];
  * decode code → vmin + (code+0.5)/256·(vmax−vmin) (midpoint
  * reconstruction, so the worst-case error is step/2 per dimension).
  *
  * Unlike fp16, SQ8 is a TRAINED codec — bounds come from one distributed
  * min/max pass ([[train]]) and ride into the pack/unpack closures
  * (broadcast with the task). Pack/unpack are storage-path UDFs, not
  * scan-hot expressions: search decodes once per scanned row, and the
  * FLOP-heavy scoring still runs on the decoded float arrays through the
  * codegen'd dot product.
  */
object SQ8 {

  /** Per-dimension quantization bounds. A dimension with vmax == vmin is
    * constant: it encodes to 0 and decodes to the midpoint
    * vmin + step/2 with step = 0 → exactly vmin. */
  final case class Bounds(vmin: Array[Float], vmax: Array[Float]) {
    require(vmin.length == vmax.length, "bounds dim mismatch")
    def dim: Int = vmin.length
  }

  /** One pass over the corpus: per-dimension (min, max). Accumulator is
    * 2·dim floats per task — executor-side combine, driver merge is
    * #partitions · dim. */
  def train(df: DataFrame, vecCol: String): Bounds = {
    val spark = df.sparkSession
    import spark.implicits._
    // null vectors carry no bounds information — dropped up front (the
    // packUdf convention), not an executor NPE; ragged dims are refused
    // loudly in the fold, not an index crash / silent tail truncation
    val (mins, maxs) = df.select(col(vecCol)).filter(col(vecCol).isNotNull)
      .as[Seq[Float]].rdd
      .treeAggregate((null: Array[Float], null: Array[Float]))(
        seqOp = { case ((mn, mx), v) =>
          if (mn == null) (v.toArray, v.toArray.clone())
          else {
            require(v.length == mn.length,
              s"SQ8.train: ragged vector dims (${v.length} vs ${mn.length}) " +
                "— quantization bounds need one consistent dimension")
            var i = 0
            while (i < mn.length) {
              val x = v(i)
              if (x < mn(i)) mn(i) = x
              if (x > mx(i)) mx(i) = x
              i += 1
            }
            (mn, mx)
          }
        },
        combOp = {
          case ((null, _), r) => r
          case (l, (null, _)) => l
          case ((lmn, lmx), (rmn, rmx)) =>
            require(lmn.length == rmn.length,
              s"SQ8.train: ragged vector dims across partitions " +
                s"(${lmn.length} vs ${rmn.length})")
            var i = 0
            while (i < lmn.length) {
              if (rmn(i) < lmn(i)) lmn(i) = rmn(i)
              if (rmx(i) > lmx(i)) lmx(i) = rmx(i)
              i += 1
            }
            (lmn, lmx)
        })
    require(mins != null, "SQ8.train needs a non-empty corpus")
    Bounds(mins, maxs)
  }

  def encode(b: Bounds, v: Seq[Float]): Array[Byte] = {
    val out = new Array[Byte](b.dim)
    var i = 0
    while (i < b.dim) {
      val span = b.vmax(i) - b.vmin(i)
      val c =
        if (span <= 0f) 0
        else {
          val q = math.floor((v(i) - b.vmin(i)) / span * 256.0).toInt
          if (q < 0) 0 else if (q > 255) 255 else q
        }
      out(i) = c.toByte
      i += 1
    }
    out
  }

  def decode(b: Bounds, bytes: Array[Byte]): Array[Float] = {
    val out = new Array[Float](b.dim)
    var i = 0
    while (i < b.dim) {
      val span = b.vmax(i) - b.vmin(i)
      val code = bytes(i) & 0xff
      out(i) =
        if (span <= 0f) b.vmin(i)
        else b.vmin(i) + ((code + 0.5f) / 256.0f) * span
      i += 1
    }
    out
  }

  def packUdf(b: Bounds) = udf { (v: Seq[Float]) =>
    if (v == null) null else encode(b, v)
  }

  def unpackUdf(b: Bounds) = udf { (bytes: Array[Byte]) =>
    if (bytes == null) null else decode(b, bytes).toSeq
  }

  /** Pack a vector column (out-of-range values clamp to the byte range —
    * the FAISS contract for vectors outside the trained bounds). */
  def packCol(b: Bounds, v: Column): Column = packUdf(b)(v)
  def unpackCol(b: Bounds, v: Column): Column = unpackUdf(b)(v)

  /** How many elements of `v` fall STRICTLY outside the trained per-dim
    * bounds — the elements [[packCol]] silently clamps to code 0/255.
    * This is the drift signal for the add-after-train regime: a stream
    * whose distribution moves past the bounds it was trained on degrades
    * its appended vectors with no error, so operators aggregate this
    * fraction per micro-batch (`annIngest`'s `onSq8OutOfBounds`) and
    * re-train when it climbs. Pure built-in HOFs (transform +
    * try_element_at + aggregate) over two scalar array literals —
    * codegen-friendly, no UDF; elements beyond the trained dim count 0
    * rather than erroring under ANSI. */
  def oobCountCol(b: Bounds, v: Column): Column = {
    // two SCALAR array literals + one fused transform/aggregate pass —
    // NOT one Literal node per dimension per bound (at 4096-d that is 8k
    // expression nodes re-analyzed per use; typedlit keeps the tree 2
    // nodes wide at any d). try_element_at, not element_at: a malformed
    // vector LONGER than the trained dim must count its overflow
    // elements as 0 (null comparison → otherwise-arm), matching the old
    // zip_with null-padding — under Spark 4's default ANSI mode a plain
    // element_at past the bounds array would instead kill the stream,
    // and enabling observability must not introduce a crash path packCol
    // itself doesn't have.
    val vmin = typedLit(b.vmin.toSeq)
    val vmax = typedLit(b.vmax.toSeq)
    aggregate(
      transform(v, (x, i) =>
        when(x < try_element_at(vmin, i + lit(1)) ||
          x > try_element_at(vmax, i + lit(1)), 1).otherwise(0)),
      lit(0), (acc, e) => acc + e)
  }

  /** Inner product DIRECTLY on the byte codes — the ADC move for a linear
    * quantizer: q·decode(c) = Σ qᵢ(vminᵢ + (cᵢ+0.5)/256·spanᵢ) folds into
    * `base(q) + Σ wᵢ(q)·cᵢ` with `base` and the per-dimension weight LUT
    * `w` computed ONCE per query on the driver. Scanning a packed index
    * then needs one multiply-add per byte and never materializes a float
    * array per row (the [[unpackCol]]→dot path allocates dim floats
    * per row). Numerically ≈ the decode path (double accumulation here vs
    * float reconstruction there — Sq8Spec bounds the difference and pins
    * equal ranking); constant-dim (span 0) contributes exactly qᵢ·vminᵢ,
    * matching decode. */
  def dotCodesUdf(b: Bounds, query: Array[Float]) = {
    require(query.length == b.dim, s"query dim ${query.length} != ${b.dim}")
    var base = 0.0
    val w = new Array[Double](b.dim)
    var i = 0
    while (i < b.dim) {
      val span = (b.vmax(i) - b.vmin(i)).toDouble
      base += query(i).toDouble * (b.vmin(i) + span * (0.5 / 256.0))
      w(i) = query(i).toDouble * span / 256.0
      i += 1
    }
    udf { (codes: Array[Byte]) =>
      if (codes == null) null.asInstanceOf[java.lang.Double]
      else {
        var s = base
        var j = 0
        while (j < w.length) { s += w(j) * (codes(j) & 0xff); j += 1 }
        java.lang.Double.valueOf(s)
      }
    }
  }
}
