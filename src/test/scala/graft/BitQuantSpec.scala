package graft

import org.apache.spark.sql.functions._

import graft.functions.BitQuant

/** Sign-bit packing + popcount Hamming: packed-word Hamming must equal
  * the positional sign-disagreement count (the property the
  * `ann_bq_hamming` oracle relies on), across word-boundary dims and
  * the zero edge case. */
class BitQuantSpec extends SparkSpec {
  import spark.implicits._

  private def naive(a: Seq[Float], b: Seq[Float]): Int =
    a.zip(b).count { case (x, y) => (x > 0f) != (y > 0f) }

  private def viaSpark(a: Seq[Float], b: Seq[Float]): Int =
    Seq((a, b)).toDF("a", "b")
      .select(BitQuant.hammingCol(
        BitQuant.packCol(col("a")), BitQuant.packCol(col("b"))))
      .as[Int].head()

  test("known vector packs to the expected words") {
    val v = Seq.tabulate(66)(i => if (i == 0 || i == 64) 1f else -1f)
    val words = Seq(v).toDF("v").select(BitQuant.packCol(col("v")))
      .as[Seq[Long]].head()
    assert(words === Seq(1L, 1L))
  }

  test("exact zero packs as 0 (sign rule is > 0)") {
    assert(viaSpark(Seq(0f, 1f), Seq(-1f, 1f)) === 0)
    assert(viaSpark(Seq(0f, 1f), Seq(1f, 1f)) === 1)
  }

  test("a NULL vector element is refused at pack time, not laundered " +
      "into a 0-bit") {
    // getFloat on a null slot reads 0f — a corrupt vector would pack
    // into a valid-looking signature and quietly join the candidate scan
    val df = Seq(Tuple1(Seq(Some(1f), None, Some(-1f)))).toDF("v")
    val e = intercept[Exception] {
      df.select(BitQuant.packCol(col("v"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("element 1 is NULL")),
      msgs(e).mkString(" | "))
  }

  test("packed words are primitive-backed (no boxed reads in the scan)") {
    val arr = graft.functions.BitQuant.pack(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array(1f, -1f, 1f)))
    assert(arr.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData])
    assert(arr.toLongArray().toSeq === Seq(5L))
  }

  test("packed Hamming equals positional sign-disagreement count across dims") {
    val rnd = new scala.util.Random(13)
    for (dim <- Seq(1, 7, 63, 64, 65, 128, 200)) {
      val a = Seq.fill(dim)(rnd.nextFloat() - 0.5f)
      val b = Seq.fill(dim)(rnd.nextFloat() - 0.5f)
      assert(viaSpark(a, b) === naive(a, b), s"dim=$dim")
    }
  }

  test("identical vectors are at distance 0; negation flips every nonzero bit") {
    val a = Seq(0.5f, -1f, 2f, -3f)
    assert(viaSpark(a, a) === 0)
    assert(viaSpark(a, a.map(-_)) === 4, "every nonzero coord's sign bit flips")
  }

  test("a NULL packed word is refused descriptively, not an NPE") {
    val e = intercept[Exception] {
      spark.sql("SELECT 1").select(BitQuant.hammingCol(
          array(lit(1L), lit(null).cast("long")), array(lit(1L), lit(2L))))
        .collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("must not contain NULL"), msgs)
  }

  test("word-count mismatch fails loudly, not with a silent prefix scan") {
    val e = intercept[Exception] {
      Seq((Seq.fill(64)(1f), Seq.fill(128)(1f))).toDF("a", "b")
        .select(BitQuant.hammingCol(
          BitQuant.packCol(col("a")), BitQuant.packCol(col("b"))))
        .as[Int].head()
    }
    assert(e.getMessage.contains("word-count mismatch") ||
      e.getCause != null && e.getCause.getMessage.contains("word-count mismatch"))
  }
}
