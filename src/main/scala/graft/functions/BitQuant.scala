package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** 1-bit (binary) quantization of embedding vectors — the most aggressive
  * point on the compression ladder the engine already walks (fp32 → fp16
  * [[FP16]] → int8 [[SQ8]] → PQ bytes [[graft.operators.AnnPq]] → 1 bit
  * here): keep only each coordinate's SIGN, packed 64 coordinates per
  * BIGINT. A dim-1024 fp32 vector (4 KiB) becomes 16 longs (128 B) — 32×
  * smaller at rest, and candidate scoring degrades to XOR + POPCNT.
  *
  * Why signs are a usable proxy: for unit vectors, P[sign(aᵢ)≠sign(bᵢ)]
  * = θ(a,b)/π per random hyperplane (Goemans-Williamson / Charikar
  * SimHash bound); with the COORDINATE basis as the hyperplane set,
  * Hamming distance over sign bits is the standard "binary quantization"
  * rerank filter modern vector stores ship. Serving shape: Hamming
  * top-C coarse scan over the packed bits (C ≫ k), exact-dot rescore of
  * the C survivors — the same filter-then-refine contract as
  * [[graft.operators.AnnPq]]'s ADC + refine.
  *
  * Both directions are codegen expressions ([[PackSignBits]],
  * [[HammingPacked]]) so the coarse scan stays inside whole-stage
  * codegen: per candidate row it is words(dim/64) XOR+POPCNT ops on
  * longs already in Tungsten rows — no float math, no allocation.
  *
  * Determinism: the sign rule is `> 0f` (exact zero packs as 0), pad
  * bits beyond dim are zero on both sides, so Hamming over packed words
  * equals the positional count of sign disagreements — which is what
  * makes the `ann_bq_hamming` query replayable in DuckDB without bit
  * packing at all.
  */
case class PackSignBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"PackSignBits needs ARRAY<FLOAT>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any = BitQuant.pack(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = graft.functions.BitQuant.pack($a);")

  override protected def withNewChildInternal(c: Expression): PackSignBits = copy(child = c)
}

/** Hamming distance between two sign-bit words arrays (INT; arrays must
  * be the same length — pack both sides with [[PackSignBits]]). */
case class HammingPacked(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"HammingPacked needs ARRAY<BIGINT> × ARRAY<BIGINT>, got ${l.sql} × ${r.sql}")
  }

  override def nullSafeEval(l: Any, r: Any): Any =
    BitQuant.hamming(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      (a, b) => s"${ev.value} = graft.functions.BitQuant.hamming($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): HammingPacked =
    copy(left = l, right = r)
}

object BitQuant {

  /** Sign-bit packing: bit i of word w is set iff v(64·w + i) > 0.
    * NULL elements are refused (getFloat would silently read them as 0f
    * and launder a corrupt vector into a valid-looking signature — the
    * L2NormalizeFP32 contract); NaN packs as 0 deterministically
    * (NaN > 0f is false). Output is a primitive-backed UnsafeArrayData:
    * the coarse Hamming scan reads these words per candidate row, and a
    * boxed array would allocate on every read. */
  def pack(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val words = new Array[Long]((n + 63) >>> 6)
    var w = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"PackSignBits: vector element $i is NULL — binary-quantizing it " +
          "would silently treat the vector as valid; filter or repair " +
          "null-element vectors first")
      if (a.getFloat(i) > 0f) w |= 1L << (i & 63)
      if ((i & 63) == 63) { words(i >>> 6) = w; w = 0L }
      i += 1
    }
    if ((n & 63) != 0) words(n >>> 6) = w
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(words)
  }

  /** Σ POPCNT(aᵢ XOR bᵢ); lengths must match ([[HammingPacked]] contract). */
  def hamming(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    require(n == b.numElements(),
      s"HammingPacked: word-count mismatch ($n vs ${b.numElements()})")
    var s = 0
    var i = 0
    while (i < n) {
      // a NULL word is corrupt input (packCol emits containsNull=false;
      // only a foreign array can carry one) — refuse descriptively
      // instead of NPEing out of the unboxing in generated code
      if (a.isNullAt(i) || b.isNullAt(i)) throw new IllegalArgumentException(
        "HammingPacked: packed word arrays must not contain NULL elements")
      s += java.lang.Long.bitCount(a.getLong(i) ^ b.getLong(i))
      i += 1
    }
    s
  }

  def packCol(v: Column): Column =
    ColumnBridge.column(PackSignBits(ColumnBridge.expression(v)))
  def hammingCol(a: Column, b: Column): Column =
    ColumnBridge.column(HammingPacked(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
