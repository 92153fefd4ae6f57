package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Dependency-free Count-Min sketch (Cormode & Muthukrishnan, J.Alg 2005)
  * with MERGEABLE binary sketches — the frequency twin of [[Hll]]'s
  * cardinality sketch (SURVEY.md A8 generalized): per-partition /
  * per-day token-frequency profiles compose by counter addition without
  * rescanning, and a point query lower-bounds nothing / overestimates by
  * at most εN — the heavy-hitter screen of a corpus-profiling pipeline
  * at 100 TB (the exact groupBy is the small-scale baseline; the sketch
  * is the fixed-size — D·W·8 B = 16 KB — mergeable form).
  *
  * Everything is integer arithmetic on the PORTABLE hash stack
  * ([[TextOps.portableTokenHash64]] + [[TextOps.mix32]] row re-keying,
  * the same additive-constant scheme as the portable MinHash perms), so
  * a SQL oracle replays registers and estimates bit-for-bit
  * (`profile_cms_topk`) — no float estimate layer at all, unlike HLL
  * where only the register mechanics are hash-checkable.
  *
  * Merging per-group sketches is counter-exact equal to sketching the
  * union (addition commutes) — spec-checked by byte equality.
  */
object Cms {
  val D = 4   // hash rows; overestimate prob per query ≈ (1/2)^D-ish
  val W = 512 // counters per row; overestimate ≤ e·N/W w.h.p.

  /** Row `r`'s counter index for pre-hashed key `h`: fold the two 32-bit
    * halves through [[TextOps.mix32]] with the portable-MinHash additive
    * constants, mod W. All intermediates < 2⁵⁹ → overflow-checked BIGINT
    * in the oracle. */
  def index(h: Long, r: Int): Int = {
    val rekey = TextOps.mix32(
      ((h ^ (h >>> 32)) + 2654435761L * (r + 1)) & 0xffffffffL)
    (rekey % W).toInt
  }

  def emptySketch(): Array[Long] = new Array[Long](D * W)

  def add(sketch: Array[Long], h: Long): Unit = {
    var r = 0
    while (r < D) { sketch(r * W + index(h, r)) += 1L; r += 1 }
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(b.length == D * W,
      s"cms_merge: input is not a graft CMS sketch — expected ${D * W} " +
        s"counters, got ${b.length} (feed only columns produced by cms_sketch/cms_merge)")
    var i = 0
    while (i < D * W) { a(i) += b(i); i += 1 }
    a
  }

  /** Point frequency estimate: min over the D counters — never below the
    * true count, above it only on collisions. */
  def estimate(sketch: Array[Long], h: Long): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < D) {
      val c = sketch(r * W + index(h, r))
      if (c < best) best = c
      r += 1
    }
    best
  }

  def serialize(sketch: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(D * W * 8)
    bb.asLongBuffer().put(sketch)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length == D * W * 8,
      s"cms_merge/cms_estimate: input is not a graft CMS sketch — expected " +
        s"${D * W * 8} bytes, got ${bytes.length} (feed only columns " +
        "produced by cms_sketch/cms_merge)")
    val out = new Array[Long](D * W)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  def sketchAgg(hashed: Column): Column =
    ColumnBridge.column(
      CmsSketchAgg(ColumnBridge.expression(hashed)).toAggregateExpression())

  def mergeAgg(sketch: Column): Column =
    ColumnBridge.column(
      CmsMergeAgg(ColumnBridge.expression(sketch)).toAggregateExpression())

  def estimateCol(sketch: Column, hashed: Column): Column =
    ColumnBridge.column(CmsEstimate(
      ColumnBridge.expression(sketch), ColumnBridge.expression(hashed)))
}

abstract class CmsAggBase extends TypedImperativeAggregate[Array[Long]] {
  override def createAggregationBuffer(): Array[Long] = Cms.emptySketch()
  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    Cms.merge(buf, other)
  override def eval(buf: Array[Long]): Any = Cms.serialize(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = Cms.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    Cms.deserialize(bytes)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
}

/** Sketch-building aggregate over a pre-hashed LongType column (feed
  * [[TextOps.portableTokenHash64]] for oracle parity, or `xxhash64` when
  * SQL replay is not needed). */
case class CmsSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends CmsAggBase {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects a 64-bit hash column, got ${t.sql}")
  }

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) Cms.add(buf, v.asInstanceOf[Long])
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsSketchAgg =
    copy(child = c.head)
}

/** Sketch-merging aggregate over a BinaryType sketch column. */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends CmsAggBase {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_merge expects a sketch (BINARY) column, got ${t.sql}")
  }

  override def update(buf: Array[Long], row: InternalRow): Array[Long] = {
    val v = child.eval(row)
    if (v != null) Cms.merge(buf, Cms.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def withNewMutableAggBufferOffset(n: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsMergeAgg =
    copy(child = c.head)
}

/** Scalar point-estimate from a sketch: (sketch, hashedKey) → count. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects (BINARY sketch, BIGINT hash), got (${l.sql}, ${r.sql})")
    }
  override def nullSafeEval(sk: Any, h: Any): Any =
    Cms.estimate(Cms.deserialize(sk.asInstanceOf[Array[Byte]]),
      h.asInstanceOf[Long])
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): CmsEstimate = copy(left = l, right = r)
}
