package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Dependency-free HyperLogLog with MERGEABLE binary sketches.
  *
  * `approx_count_distinct` returns only the estimate; a training-data
  * profiling pipeline needs the SKETCH itself so per-partition / per-day
  * profiles compose without rescanning (SURVEY.md A8 generalized — the
  * mergeable form is what survives at 100 TB). Shapes:
  *
  *  - [[HllSketchAgg]]: aggregates a pre-hashed LongType column (feed
  *    `xxhash64(cols...)`) into a register array (BinaryType);
  *  - [[HllMergeAgg]]: merges sketch columns (register-wise max);
  *  - [[HllEstimate]]: scalar sketch → distinct estimate, with the
  *    standard bias correction + linear-counting small-range correction.
  *
  * Merging per-group sketches is REGISTER-EXACT equal to sketching the
  * union (max commutes) — spec-checked by byte equality.
  */
object Hll {
  val P = 12 // 4096 registers, standard error ≈ 1.04/√m ≈ 1.6 %
  val M = 1 << P

  /** Sketch byte layout: `[version][register 0..M-1]` — M+1 bytes total.
    * The leading version byte exists because the v1 format (bare M
    * register bytes, register index = top 12 hash bits) was silently
    * broken over the engine's portable hash (bit 63 permanently clear →
    * estimates capped at m·ln 2 ≈ 2839): v2 moved the index to bits
    * 62..51, which REASSIGNS every hash to a different register, so
    * merging v1 and v2 register arrays would OR unrelated registers into
    * meaningless values with no error. The version byte makes any
    * persisted pre-fix sketch fail loudly in [[merge]]/[[estimate]]
    * (v1 sketches are also distinguishable by length alone). */
  val Version: Byte = 2
  private val SketchLen = M + 1

  def emptySketch(): Array[Byte] = {
    val s = new Array[Byte](SketchLen)
    s(0) = Version
    s
  }

  private def requireV2(op: String, sk: Array[Byte]): Unit = {
    if (sk.length == M) throw new IllegalArgumentException(
      s"$op: v1 graft HLL sketch bytes ($M bytes, no version byte) — the " +
        "v1 register indexing was broken over the portable hash and its " +
        "registers do not line up with v2's; re-sketch the source data " +
        "instead of merging stale bytes")
    require(sk.length == SketchLen && sk(0) == Version,
      s"$op: input is not a graft HLL v$Version sketch — expected " +
        s"$SketchLen bytes starting with version $Version, got " +
        s"${sk.length} bytes (feed only columns produced by " +
        "hll_sketch/hll_merge)")
  }

  def add(sketch: Array[Byte], hash: Long): Unit = {
    // register index from bits 62..51, NOT the top 12 bits: the engine's
    // portable token hash keeps bit 63 permanently clear, so a top-bit
    // index would leave registers 2048..4095 forever zero — the
    // linear-counting branch then never exits and the estimate CAPS at
    // m·ln 2 ≈ 2839 regardless of true cardinality. Skipping the sign
    // bit costs full-range feeds (xxhash64) nothing: the index needs 12
    // uniform bits and the rank a geometric source, and bits 62..51 /
    // 50..0 supply both for every feed.
    val idx = ((hash >>> 51) & (M - 1)).toInt + 1 // +1: version header
    val rest = hash << 13
    val rank = (if (rest == 0) 51 else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rank > sketch(idx)) sketch(idx) = rank.toByte
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    // BOTH operands: `a` is the aggregator's own buffer on every internal
    // call today, but merge is public API — a v1 `a` must fail with the
    // same descriptive re-sketch message, not an ArrayIndexOutOfBounds
    requireV2("hll_merge", a)
    requireV2("hll_merge", b)
    var i = 1
    while (i < SketchLen) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** Estimate with an ORDER-FREE inverse-power sum: Σ 2^−reg is
    * accumulated as the exact integer Σ 2^(53−reg) (registers are ≤ 53
    * at P = 12) and divided by 2⁵³ once — so the double value is a pure
    * function of the register MULTISET, not of accumulation order, and
    * the whole estimate replays in SQL as the identical IEEE op sequence
    * (SUM of shifted BIGINTs → one divide → alpha·m²/invSum, with the
    * linear-counting branch on the zero-register count). The previous
    * sequential float accumulation was ulp-sensitive to register order —
    * the one step that kept the estimate off the DuckDB hash gate. */
  def estimate(sketch: Array[Byte]): Long = {
    requireV2("hll_estimate", sketch)
    val m = M.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var s = BigInt(0)
    var zeros = 0
    var i = 1
    while (i < SketchLen) {
      val r = sketch(i) & 0xff
      s += BigInt(1) << math.max(0, 53 - r)
      if (r == 0) zeros += 1
      i += 1
    }
    val invSum = s.toDouble / 9007199254740992.0 // 2^53
    val raw = alpha * m * m / invSum
    val corrected =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros.toDouble)
      else raw
    math.round(corrected)
  }

  def sketchAgg(hashed: Column): Column =
    ColumnBridge.column(
      HllSketchAgg(ColumnBridge.expression(hashed)).toAggregateExpression())

  def mergeAgg(sketch: Column): Column =
    ColumnBridge.column(
      HllMergeAgg(ColumnBridge.expression(sketch)).toAggregateExpression())

  def estimateCol(sketch: Column): Column =
    ColumnBridge.column(HllEstimate(ColumnBridge.expression(sketch)))
}

abstract class HllAggBase extends TypedImperativeAggregate[Array[Byte]] {
  override def createAggregationBuffer(): Array[Byte] = Hll.emptySketch()
  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] =
    Hll.merge(buf, other)
  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** Sketch-building aggregate over a pre-hashed LongType column. */
case class HllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends HllAggBase {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hll_sketch expects a 64-bit hash column (use xxhash64(...)), got ${t.sql}")
  }

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) Hll.add(buf, v.asInstanceOf[Long])
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = c.head)
}

/** Sketch-merging aggregate over a BinaryType sketch column. */
case class HllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends HllAggBase {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hll_merge expects a sketch (BINARY) column, got ${t.sql}")
  }

  override def update(buf: Array[Byte], row: InternalRow): Array[Byte] = {
    val v = child.eval(row)
    if (v != null) Hll.merge(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = c.head)
}

/** Scalar estimate from a sketch. */
case class HllEstimate(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hll_estimate expects BINARY, got ${t.sql}")
  }
  override def nullSafeEval(v: Any): Any =
    Hll.estimate(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): HllEstimate =
    copy(child = c)
}
