package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** L2-normalization of an `ARRAY<FLOAT>` vector as one fused pass
  * (reference behavior: `normalize=True` at embed time, vector_db.py:112-114).
  *
  * The pure higher-order-function formulation
  * (`transform(a, x => x / sqrt(aggregate(...)))`) re-evaluates the norm
  * subexpression for every element — O(d²) per row. This computes the norm
  * once and scales in a second pass: O(d), allocation limited to the output
  * array. Zero vectors pass through unchanged (same contract as
  * [[VectorOps.l2Normalize]], which remains as the spec cross-check).
  */
case class L2NormalizeFP32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"L2NormalizeFP32 needs ARRAY<FLOAT>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    L2NormalizeFP32.normalize(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.L2NormalizeFP32.normalize($a);")

  override protected def withNewChildInternal(newChild: Expression): L2NormalizeFP32 =
    copy(child = newChild)
}

object L2NormalizeFP32 {
  def normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) {
      // a NULL element would silently read as 0.0f through getFloat —
      // diverging from the HOF twin and laundering a corrupt vector
      // into a clean containsNull=false output; refuse loudly instead
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        "graft_l2_normalize: vector contains a NULL element — normalize " +
          "a complete vector or filter/repair upstream")
      val x = a.getFloat(i).toDouble; ss += x * x; i += 1
    }
    // divide (not multiply-by-reciprocal) for bit-parity with the HOF
    // x / sqrt(Σx²) formulation
    val norm0 = math.sqrt(ss)
    val norm = if (norm0 == 0.0) 1.0 else norm0
    // primitive-backed output: this runs once per scanned row
    val out = new Array[Float](n)
    i = 0
    while (i < n) {
      out(i) = (a.getFloat(i).toDouble / norm).toFloat
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  def apply(a: Column): Column =
    ColumnBridge.column(L2NormalizeFP32(ColumnBridge.expression(a)))
}
