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
  * The accuracy knob `k` is a parameter (like HLL's register count and
  * CMS's width/depth): relative error ≈ 1/√(k−2), so k = 64 → ~12.7 %,
  * k = 256 → ~6.3 %, k = 1024 → ~3.1 %. Sketch bytes are
  * SELF-DESCRIBING — a 4-byte big-endian k header precedes the values —
  * so merges adopt k from the first sketch they see and REJECT a
  * mismatched k loudly (min-wise union of different-k sketches would
  * silently produce a biased sample), and the estimator needs no
  * side-channel k.
  *
  * FORMAT BREAK (round 9): the 4-byte k header is an incompatible change
  * to the sketch wire/storage format. Pre-header sketch bytes (persisted
  * sketch columns, streaming state from `distinctUsersKmv` checkpoints)
  * fail [[Kmv.deserialize]]'s length check LOUDLY (an old headerless
  * payload has length % 8 == 0, which can never satisfy
  * (length − 4) % 8 == 0) — the right failure mode, but it means old
  * sketches must be RECOMPUTED from source, not resumed or merged.
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
  val K = 64 // default k; relative error ≈ 1/√(k−2) ≈ 12.7 %

  /** Mutable aggregation state: bound k (0 = not yet bound, for a merge
    * aggregate that has seen no sketch) + sorted flipped values. */
  final class Buf(var k: Int, var values: Array[Long])

  def empty(k: Int): Buf = new Buf(k, Array.emptyLongArray)

  /** Insert one hash (unsigned order); sorted-distinct state capped at k. */
  def add(buf: Buf, hash: Long): Unit = {
    val k = buf.k
    val vs = buf.values
    val f = hash ^ Long.MinValue
    val pos = java.util.Arrays.binarySearch(vs, f)
    if (pos < 0) {
      val ins = -pos - 1
      if (vs.length < k) {
        val out = new Array[Long](vs.length + 1)
        System.arraycopy(vs, 0, out, 0, ins)
        out(ins) = f
        System.arraycopy(vs, ins, out, ins + 1, vs.length - ins)
        buf.values = out
      } else if (ins < k) {
        val out = new Array[Long](k)
        System.arraycopy(vs, 0, out, 0, ins)
        out(ins) = f
        System.arraycopy(vs, ins, out, ins + 1, k - ins - 1)
        buf.values = out
      }
    }
  }

  /** Min-wise merge of (other k, other values) into buf: the k smallest
    * distinct of the union. Binds buf's k if unbound; rejects a bound
    * mismatch loudly. An empty unbound side (k = 0) is a neutral element. */
  def mergeInto(buf: Buf, otherK: Int, other: Array[Long]): Unit = {
    if (otherK == 0) return // neutral: an unbound empty sketch
    if (buf.k == 0) buf.k = otherK
    require(buf.k == otherK,
      s"kmv: cannot merge sketches with different k (${buf.k} vs $otherK) — " +
        "a min-wise union across k values yields a biased sample")
    val a = buf.values
    val k = buf.k
    val out = new Array[Long](math.min(a.length + other.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < out.length && (i < a.length || j < other.length)) {
      val take =
        if (i >= a.length) { j += 1; other(j - 1) }
        else if (j >= other.length) { i += 1; a(i - 1) }
        else if (a(i) < other(j)) { i += 1; a(i - 1) }
        else if (a(i) > other(j)) { j += 1; other(j - 1) }
        else { i += 1; j += 1; a(i - 1) }
      if (n == 0 || out(n - 1) != take) { out(n) = take; n += 1 }
    }
    buf.values = if (n == out.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** Distinct estimate: exact below k; (k−1)/uₖ once full, uₖ = the k-th
    * smallest hash as a fraction of the unsigned 2⁶⁴ domain. */
  def estimate(k: Int, values: Array[Long]): Long =
    if (k == 0 || values.length < k) values.length.toLong
    else {
      val uk = (values(k - 1).toDouble - Long.MinValue.toDouble) /
        math.pow(2.0, 64)
      // uk == 0 only if all k smallest hashes collapse onto unsigned 0 —
      // k distinct values make that impossible, but guard the division
      // against a single-value corruption rather than emitting Long.Min
      if (uk <= 0.0) k.toLong else math.round((k - 1) / uk)
    }

  /** [k: int32 BE][values: int64 BE ×n] — self-describing sketch bytes. */
  def serialize(buf: Buf): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.values.length * 8)
    bb.putInt(buf.k)
    buf.values.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buf = {
    require(bytes.length >= 4 && (bytes.length - 4) % 8 == 0,
      s"kmv: not a graft KMV sketch (${bytes.length} bytes)")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt()
    val n = (bytes.length - 4) / 8
    require(k >= 0 && n <= math.max(k, 0),
      s"kmv: corrupt sketch header (k=$k, $n values)")
    new Buf(k, Array.fill(n)(bb.getLong))
  }

  /** The sampled (flipped-order) values — spec/introspection view. */
  def values(bytes: Array[Byte]): Array[Long] = deserialize(bytes).values
  /** The k recorded in a sketch's header. */
  def kOf(bytes: Array[Byte]): Int = deserialize(bytes).k

  def sketchAgg(hashed: Column, k: Int = K): Column =
    ColumnBridge.column(
      KmvSketchAgg(ColumnBridge.expression(hashed), k).toAggregateExpression())

  def mergeAgg(sketch: Column): Column =
    ColumnBridge.column(
      KmvMergeAgg(ColumnBridge.expression(sketch)).toAggregateExpression())

  def estimateCol(sketch: Column): Column =
    ColumnBridge.column(KmvEstimate(ColumnBridge.expression(sketch)))
}

abstract class KmvAggBase extends TypedImperativeAggregate[Kmv.Buf] {
  override def merge(buf: Kmv.Buf, other: Kmv.Buf): Kmv.Buf = {
    Kmv.mergeInto(buf, other.k, other.values); buf
  }
  override def eval(buf: Kmv.Buf): Any = Kmv.serialize(buf)
  override def serialize(buf: Kmv.Buf): Array[Byte] = Kmv.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Kmv.Buf =
    Kmv.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** Sketch-building aggregate over a pre-hashed LongType column. */
case class KmvSketchAgg(
    child: Expression,
    k: Int = Kmv.K,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends KmvAggBase {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 3) TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch needs k >= 3 (error ~ 1/sqrt(k-2)), got $k")
    else child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch expects a 64-bit hash column (use xxhash64(...)), got ${t.sql}")
    }

  override def createAggregationBuffer(): Kmv.Buf = Kmv.empty(k)

  override def update(buf: Kmv.Buf, row: InternalRow): Kmv.Buf = {
    val v = child.eval(row)
    if (v != null) Kmv.add(buf, v.asInstanceOf[Long])
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = c.head)
}

/** Sketch-merging aggregate over a BinaryType sketch column. Adopts k from
  * the first sketch it sees (the header travels with the bytes) and throws
  * on a cross-k merge. */
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

  override def createAggregationBuffer(): Kmv.Buf = Kmv.empty(0)

  override def update(buf: Kmv.Buf, row: InternalRow): Kmv.Buf = {
    val v = child.eval(row)
    if (v != null) {
      val o = Kmv.deserialize(v.asInstanceOf[Array[Byte]])
      Kmv.mergeInto(buf, o.k, o.values)
    }
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvMergeAgg =
    copy(child = c.head)
}

/** Scalar estimate from a sketch (k read from the sketch header). */
case class KmvEstimate(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_estimate expects BINARY, got ${t.sql}")
  }
  override def nullSafeEval(v: Any): Any = {
    val b = Kmv.deserialize(v.asInstanceOf[Array[Byte]])
    Kmv.estimate(b.k, b.values)
  }
  override protected def withNewChildInternal(c: Expression): KmvEstimate =
    copy(child = c)
}
