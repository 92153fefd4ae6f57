package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Jaccard similarity over two SORTED long arrays as a native Catalyst
  * expression with codegen — the hot inner loop of near-dup verification.
  *
  * `array_intersect`/`array_union` are correct but build a hash set per
  * row pair (boxed elements, per-call allocation); at near-dup scale the
  * verify stage runs millions of pair comparisons, so this is the one place
  * the higher-order-function formulation doesn't survive the bench
  * (SURVEY.md §4 "custom pieces actually warranted"). A merge-intersection
  * over pre-sorted arrays is allocation-free and O(|a|+|b|).
  *
  * Inputs MUST be sorted ascending and duplicate-free
  * (`sort_array(array_distinct(...))` upstream — [[TextOps.hashedShingles]]
  * already distincts); |A∪B| = |A|+|B|−|A∩B|.
  */
case class SortedLongJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"SortedLongJaccard needs two ARRAY<BIGINT>, got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    SortedLongJaccard.jaccard(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedLongJaccard.jaccard($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLongJaccard =
    copy(left = newLeft, right = newRight)
}

object SortedLongJaccard {
  /** Merge-intersection count → Jaccard; static so codegen can call it. */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      // a NULL element would silently read as 0L through getLong and
      // match a real 0 shingle (or another null) — phantom intersections
      // on corrupt input; the sorted-distinct contract excludes nulls
      if (a.isNullAt(i) || b.isNullAt(j)) throw new IllegalArgumentException(
        "graft_sorted_jaccard: shingle arrays must not contain NULL " +
          "elements (sorted-distinct contract)")
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  /** Scala twin of [[jaccard]] for executor-side non-SQL callers (the
    * streaming near-dup verify). Same contract: sorted ascending,
    * duplicate-free. */
  def jaccardArrays(a: Array[Long], b: Array[Long]): Double = {
    if (a.length == 0 && b.length == 0) return 1.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter).toDouble
  }

  /** Column API: Jaccard of two sorted, distinct long arrays. */
  def sortedJaccard(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongJaccard(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Sorted-distinct 64-bit shingle set — the pairing-ready form.
    * `toks` must be a bound token-array column (see
    * [[TextOps.shinglesFromTokens]]). */
  def sortedHashedShingles(toks: Column, n: Int): Column =
    sort_array(TextOps.hashedShingles(toks, n))
}
