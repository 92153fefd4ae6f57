package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** fp16 (IEEE binary16) packing of embedding vectors — the reference's
  * `SQfp16` scalar quantization (reference: storage/storage_impl.py:87,
  * factory string `IVF{nlist},SQfp16`) as a pair of codegen expressions.
  *
  * [[PackFP16]]: ARRAY<FLOAT> → BINARY (2 bytes/element, little-endian) —
  * halves at-rest vector storage. [[UnpackFP16]] restores ARRAY<FLOAT>
  * with ≤ 2⁻¹¹ relative quantization error (bit-exact idempotent:
  * unpack(pack(unpack(pack(v)))) == unpack(pack(v))). Use on the stored
  * side of an IVF layout when scan bandwidth, not recall, is the
  * bottleneck; scoring still runs in fp32/fp64 after unpack.
  * JDK17's `Float.float16ToFloat`/`floatToFloat16` do the conversions.
  */
case class PackFP16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"PackFP16 needs ARRAY<FLOAT>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any = FP16.pack(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = graft.functions.FP16.pack($a);")

  override protected def withNewChildInternal(c: Expression): PackFP16 = copy(child = c)
}

case class UnpackFP16(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"UnpackFP16 needs BINARY, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any = FP16.unpack(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = graft.functions.FP16.unpack($a);")

  override protected def withNewChildInternal(c: Expression): UnpackFP16 = copy(child = c)
}

object FP16 {

  /** fp32 → binary16 bits (JDK17 has no Float.floatToFloat16; this is the
    * standard public bit algorithm, round-half-up; Inf/subnormal
    * preserving, and every NaN maps to a QUIET half NaN — still NaN
    * after the round trip, payload truncated to the bits that fit).
    *
    * Rounding-mode deviation: exact-tie values round half-UP here, where
    * IEEE 754 (and FAISS's F16C-based SQfp16 encoder) round half-to-EVEN —
    * a 1-ulp difference on ties only. The "SQfp16 parity" claim is parity
    * of format and error bound (≤ 2⁻¹¹ relative), NOT bit parity with
    * FAISS-encoded bytes; decode ([[halfToFloat]]) is exact for any
    * binary16 input, so foreign fp16 data reads back bit-exactly. */
  def floatToHalf(fval: Float): Short = {
    val fbits = java.lang.Float.floatToIntBits(fval)
    val sign = (fbits >>> 16) & 0x8000
    val abs = fbits & 0x7fffffff
    // NaN handled FIRST, as a quiet half NaN (0x7e00 | payload bits):
    // the rounding add below overflows Int on high-payload NaNs
    // (collapsing them to ±0 through the subnormal fall-through), and a
    // low-payload NaN's top-13 mantissa bits are all zero (collapsing it
    // to ±Inf) — either silently turns an unordered value into an
    // ordered one in every downstream comparison
    if (abs > 0x7f800000)
      return (sign | 0x7e00 | ((fbits & 0x007fffff) >>> 13)).toShort
    val value = abs + 0x1000
    if (value >= 0x47800000) {
      if (abs >= 0x47800000) {
        (sign | 0x7c00).toShort                                        // → inf
      } else (sign | 0x7bff).toShort                                   // max half
    }
    else if (value >= 0x38800000) (sign | ((value - 0x38000000) >>> 13)).toShort
    else if (value < 0x33000000) sign.toShort                          // → ±0
    else { // subnormal half
      val exp = abs >>> 23
      (sign | ((((fbits & 0x7fffff) | 0x800000) + (0x800000 >>> (exp - 102))) >>> (126 - exp))).toShort
    }
  }

  /** binary16 bits → fp32 (exact). */
  def halfToFloat(hbits: Int): Float = {
    var mant = hbits & 0x03ff
    var exp = hbits & 0x7c00
    if (exp == 0x7c00) exp = 0x3fc00              // inf/NaN
    else if (exp != 0) exp += 0x1c000             // normal
    else if (mant != 0) {                         // subnormal: renormalize;
      exp = 0x1c400                               // exp drops on EVERY shift
      var cont = true
      while (cont) { mant <<= 1; exp -= 0x400; cont = (mant & 0x400) == 0 }
      mant &= 0x3ff
    }
    java.lang.Float.intBitsToFloat(((hbits & 0x8000) << 16) | ((exp | mant) << 13))
  }

  def pack(a: ArrayData): Array[Byte] = {
    val n = a.numElements()
    val out = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val h = floatToHalf(a.getFloat(i))
      out(2 * i) = (h & 0xff).toByte
      out(2 * i + 1) = ((h >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  def unpack(b: Array[Byte]): ArrayData = {
    // reject a torn/foreign binary loudly (the sketch-deserializer
    // discipline) — silently dropping a trailing byte would decode a
    // shorter vector that mis-scores downstream instead of failing here
    require(b.length % 2 == 0,
      s"fp16_unpack: binary length ${b.length} is not a whole number of " +
        "half-floats — corrupt or foreign input")
    val n = b.length / 2
    // primitive-backed ArrayData: this decode runs once per SCANNED row
    // (the file's own contract), and a GenericArrayData of boxed Floats
    // costs ~dim allocations per row of pure GC pressure
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val h = (b(2 * i) & 0xff) | ((b(2 * i + 1) & 0xff) << 8)
      out(i) = halfToFloat(h)
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  def packCol(a: Column): Column =
    ColumnBridge.column(PackFP16(ColumnBridge.expression(a)))
  def unpackCol(a: Column): Column =
    ColumnBridge.column(UnpackFP16(ColumnBridge.expression(a)))
}
