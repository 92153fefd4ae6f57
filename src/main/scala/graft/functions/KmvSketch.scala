package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) bottom-k sketch with MERGEABLE binary states —
  * the third member of the mergeable-sketch family next to [[Hll]]
  * (distincts) and [[Cms]] (frequencies), with a property neither has:
  * the state IS a uniform sample of the distinct keys (Bar-Yossef et al.
  * RANDOM'02; Beyer et al. SIGMOD'07). One k-long array per group
  * answers BOTH "roughly how many distinct?" and "show me k unbiased
  * examples" — the profiling pair a 100 TB corpus card wants from one
  * pass. `profile_kmv` is the integer-domain query twin (oracle-checked
  * end to end); this aggregate is the engine primitive over full-range
  * 64-bit hashes.
  *
  *  - [[KmvSketchAgg]]: aggregates a pre-hashed LongType column (feed
  *    `xxhash64(cols...)` — FULL-range hashes; the estimate assumes a
  *    uniform 2⁶⁴ domain) into the k smallest distinct values;
  *  - [[KmvMergeAgg]]: merges sketch columns (min-wise: keep the k
  *    smallest of the union — merging per-partition sketches is
  *    byte-exact equal to sketching the union, spec-checked);
  *  - [[KmvEstimate]]: sketch → distinct estimate ((k−1)/uₖ, exact count
  *    when the sketch never filled).
  *
  * Values are stored sign-flipped so signed order == unsigned hash order.
  */
object Kmv {
  val K = 64 // relative error ≈ 1/√(k−2) ≈ 12.7 %

  def empty: Array[Long] = Array.emptyLongArray

  /** Insert one hash (unsigned order); sorted-distinct state capped at K. */
  def add(buf: Array[Long], hash: Long): Array[Long] = {
    val f = hash ^ Long.MinValue
    val pos = java.util.Arrays.binarySearch(buf, f)
    if (pos >= 0) buf // already sampled
    else {
      val ins = -pos - 1
      if (buf.length < K) {
        val out = new Array[Long](buf.length + 1)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = f
        System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
        out
      } else if (ins < K) {
        val out = new Array[Long](K)
        System.arraycopy(buf, 0, out, 0, ins)
        out(ins) = f
        System.arraycopy(buf, ins, out, ins + 1, K - ins - 1)
        out
      } else buf
    }
  }

  /** Min-wise merge: k smallest distinct of the union. */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, K))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < b.length)) {
      val take =
        if (i >= a.length) { j += 1; b(j - 1) }
        else if (j >= b.length) { i += 1; a(i - 1) }
        else if (a(i) < b(j)) { i += 1; a(i - 1) }
        else if (a(i) > b(j)) { j += 1; b(j - 1) }
        else { i += 1; j += 1; a(i - 1) }
      if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
    }
    if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Distinct estimate: exact below K; (K−1)/uₖ once full, uₖ = the k-th
    * smallest hash as a fraction of the unsigned 2⁶⁴ domain. */
  def estimate(buf: Array[Long]): Long =
    if (buf.length < K) buf.length.toLong
    else {
      val uk = (buf(K - 1).toDouble - Long.MinValue.toDouble) /
        math.pow(2.0, 64)
      // uk == 0 only if all K smallest hashes collapse onto unsigned 0 —
      // K distinct values make that impossible, but guard the division
      // against a single-value corruption rather than emitting Long.Min
      if (uk <= 0.0) K.toLong else math.round((K - 1) / uk)
    }

  def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length % 8 == 0 && bytes.length <= K * 8,
      s"kmv: not a graft KMV sketch (${bytes.length} bytes)")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  def sketchAgg(hashed: Column): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(hashed)).toAggregateExpression())

  def mergeAgg(sketch: Column): Column =
    ColumnBridge.column(
      KmvMergeAgg(ColumnBridge.expression(sketch)).toAggregateExpression())

  def estimateCol(sketch: Column): Column =
    ColumnBridge.column(KmvEstimate(ColumnBridge.expression(sketch)))
}

abstract class KmvAggBase extends TypedImperativeAggregate[Array[Long]] {
  override def createAggregationBuffer(): Array[Long] = Kmv.empty
  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    Kmv.merge(buf, other)
  override def eval(buf: Array[Long]): Any = Kmv.serialize(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = Kmv.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Kmv.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** Sketch-building aggregate over a pre-hashed LongType column. */
case class KmvSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KmvAggBase {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch expects a 64-bit hash column (use xxhash64(...)), got ${t.sql}")
  }

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) Kmv.add(buf, v.asInstanceOf[Long]) else buf
  }

  override def withNewMutableAggBufferOffset(n: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = c.head)
}

/** Sketch-merging aggregate over a BinaryType sketch column. */
case class KmvMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KmvAggBase {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_merge expects a sketch (BINARY) column, got ${t.sql}")
  }

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) Kmv.merge(buf, Kmv.deserialize(v.asInstanceOf[Array[Byte]]))
    else buf
  }

  override def withNewMutableAggBufferOffset(n: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvMergeAgg =
    copy(child = c.head)
}

/** Scalar estimate from a sketch. */
case class KmvEstimate(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_estimate expects BINARY, got ${t.sql}")
  }
  override def nullSafeEval(v: Any): Any =
    Kmv.estimate(Kmv.deserialize(v.asInstanceOf[Array[Byte]]))
  override protected def withNewChildInternal(c: Expression): KmvEstimate =
    copy(child = c)
}
