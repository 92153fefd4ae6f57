package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Shared contract for the codegen'd (integral, integral) → LONG
  * space-filling-curve expressions ([[ZOrder64]], [[Hilbert64]]): both
  * children must be integral, values widen to long, and eval/codegen
  * delegate to ONE static long function — eval calls [[compute]], codegen
  * emits a call to the same method via [[staticCall]], so the two paths
  * cannot drift. Held once here: the two implementations previously
  * duplicated this scaffolding verbatim, and a contract fix applied to
  * one (e.g. widening the accepted key types) could silently miss the
  * other. */
abstract class IntegralPairExpression extends BinaryExpression {

  /** SQL-facing function name, for the type-check error message. */
  protected def prettyFn: String

  /** The curve mapping both eval and generated code execute. */
  protected def compute(a: Long, b: Long): Long

  /** Fully-qualified static form of [[compute]] for codegen, e.g.
    * `"graft.functions.ZOrder64.interleave"`. */
  protected def staticCall: String

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyFn needs two integral columns, got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  private def asLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    compute(asLong(l), asLong(r))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $staticCall((long)$a, (long)$b);")
}
