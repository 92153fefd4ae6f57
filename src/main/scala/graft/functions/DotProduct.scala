package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Inner product of two `ARRAY<FLOAT>` embedding columns as a native
  * Catalyst expression with whole-stage codegen — the hot loop of every
  * KNN/assignment/near-dup scan (reference semantics: FAISS `IndexFlatIP`,
  * faiss_utils.py:139).
  *
  * Numerically identical to the higher-order-function formulation
  * (`aggregate(zip_with(...))`, [[VectorOps.dot]]'s reference path): a
  * strict left-to-right fp64 fold over fp32 elements — VectorOpsSpec
  * asserts bit-equality between the two. The difference is mechanical: the
  * HOF path materializes an intermediate fp64 array per row pair
  * (`zip_with`) and walks it with per-element branching (`aggregate`);
  * this is one allocation-free fused loop, ~3-4× faster on the
  * brute-force KNN bench.
  *
  * Length mismatch → LOUD IllegalArgumentException, matching the integer
  * twin ([[DotProductInt]]) and the engine-wide posture (CentroidGemm,
  * Mmr, L2NormalizeFP32): this is a registered SQL function (`graft_dot`),
  * and a silent shorter-prefix product is a plausible-but-wrong score a
  * user cannot detect. The check is once per CALL (two cached lengths),
  * not per element — free next to the fused loop.
  */
case class DotProductFP64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"DotProductFP64 needs two ARRAY<FLOAT>, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    DotProductFP64.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProductFP64.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductFP64 =
    copy(left = newLeft, right = newRight)
}

object DotProductFP64 {
  /** Strict sequential fp64 fold; static so generated code can call it. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"graft_dot: dimension mismatch ($n vs ${b.numElements()}) — a " +
        "silent prefix product would be a plausible wrong score; fix the " +
        "ragged vector upstream")
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductFP64(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Integer sibling of [[DotProductFP64]] for the fixed-point twins
  * (`ARRAY<BIGINT> × ARRAY<BIGINT> → BIGINT`) — the hot loop of the
  * integer IVF/PQ/PCA replay family ([[graft.operators.AnnIvfInt]]'s
  * `dotQ`, quantized scoring, LUT builds).
  *
  * Value-identical to `aggregate(zip_with(a, b, _*_), 0L, _+_)` for
  * equal-length inputs: integer products summed left to right
  * (associative — any order gives the same BIGINT). Both failure modes
  * stay LOUD: overflow raises via `Math.multiplyExact`/`addExact`
  * (matching the ANSI HOF path), and a LENGTH MISMATCH raises too —
  * where the HOF form would quietly null-pad — so a dimension bug can
  * never produce a plausible truncated score (call sites bound |q| ≤
  * 10⁶ per coordinate and guarantee equal dims). Mechanically it is one
  * allocation-free fused loop instead of zip_with's materialized
  * intermediate array.
  */
case class DotProductInt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"DotProductInt needs two ARRAY<BIGINT>, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    DotProductInt.dot(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProductInt.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductInt =
    copy(left = newLeft, right = newRight)
}

object DotProductInt {
  private[functions] def sameLength(a: ArrayData, b: ArrayData,
      op: String): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"$op: dimension mismatch ($n vs ${b.numElements()})")
    n
  }

  /** Exact integer fold; static so generated code can call it. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = sameLength(a, b, "DotProductInt")
    var s = 0L
    var i = 0
    while (i < n) {
      s = Math.addExact(s, Math.multiplyExact(a.getLong(i), b.getLong(i)))
      i += 1
    }
    s
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductInt(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Exact integer squared-L2 distance (`ARRAY<BIGINT> × ARRAY<BIGINT> →
  * BIGINT`) — the PQ trainer's argmin metric ([[graft.operators.AnnPqInt]]
  * `l2Q`). Same contract as [[DotProductInt]]: value-identical to the
  * `aggregate(zip_with(a, b, (x,y) => (x−y)²))` form for equal lengths,
  * overflow AND length mismatch loud, one fused loop. */
case class L2DistInt(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"L2DistInt needs two ARRAY<BIGINT>, got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    L2DistInt.dist(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.L2DistInt.dist($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2DistInt =
    copy(left = newLeft, right = newRight)
}

object L2DistInt {
  /** Exact integer fold; static so generated code can call it. */
  def dist(a: ArrayData, b: ArrayData): Long = {
    val n = DotProductInt.sameLength(a, b, "L2DistInt")
    var s = 0L
    var i = 0
    while (i < n) {
      val d = Math.subtractExact(a.getLong(i), b.getLong(i))
      s = Math.addExact(s, Math.multiplyExact(d, d))
      i += 1
    }
    s
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(L2DistInt(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
