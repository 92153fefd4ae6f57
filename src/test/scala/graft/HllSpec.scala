package graft

import org.apache.spark.sql.functions._

import graft.functions.Hll
import graft.queries.table

class HllSpec extends SparkSpec {
  import spark.implicits._

  test("estimate within 5% of true distinct counts") {
    val li = table(spark, sf0001, "lineitem")
    val got = li.agg(
        Hll.estimateCol(Hll.sketchAgg(xxhash64($"l_partkey"))).as("est_parts"),
        countDistinct($"l_partkey").as("true_parts"),
        Hll.estimateCol(Hll.sketchAgg(xxhash64($"l_orderkey"))).as("est_orders"),
        countDistinct($"l_orderkey").as("true_orders"))
      .as[(Long, Long, Long, Long)].head()
    assert(math.abs(got._1 - got._2).toDouble / got._2 < 0.05, got)
    assert(math.abs(got._3 - got._4).toDouble / got._4 < 0.05, got)
  }

  test("estimate accurate over the PORTABLE hash too (bit 63 always clear)") {
    // the production profiling queries feed portableTokenHash64, whose
    // sign bit is permanently 0 — a top-12-bit register index would
    // strand half the registers and CAP the estimate at m·ln 2 ≈ 2839
    // forever; 20k distinct keys must estimate near 20k, not 2.8k
    val hUdf = udf((x: String) => graft.functions.TextOps.portableTokenHash64(x))
    val got = spark.range(0, 20000).toDF("id")
      .agg(Hll.estimateCol(Hll.sketchAgg(hUdf($"id".cast("string")))))
      .as[Long].head()
    assert(math.abs(got - 20000L).toDouble / 20000.0 < 0.05,
      s"portable-hash estimate $got is not within 5% of 20000")
  }

  test("estimate rejects non-sketch binary with a descriptive error") {
    val e = intercept[Exception] {
      Seq(Array[Byte](1, 2, 3)).toDF("sk")
        .select(Hll.estimateCol($"sk")).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(msgs.contains("hll_estimate"), msgs)
  }

  test("merging per-group sketches is register-exact vs global sketch") {
    val li = table(spark, sf0001, "lineitem")
    val perGroup = li.groupBy("l_returnflag")
      .agg(Hll.sketchAgg(xxhash64($"l_partkey")).as("sk"))
    val merged = perGroup.agg(Hll.mergeAgg($"sk").as("sk"))
      .select($"sk").as[Array[Byte]].head()
    val global = li.agg(Hll.sketchAgg(xxhash64($"l_partkey")).as("sk"))
      .select($"sk").as[Array[Byte]].head()
    assert(java.util.Arrays.equals(merged, global))
    assert(Hll.estimate(merged) === Hll.estimate(global))
  }

  test("small-range linear counting is near-exact") {
    val got = (1 to 40).map(_.toLong).toDF("v")
      .agg(Hll.estimateCol(Hll.sketchAgg(xxhash64($"v"))))
      .as[Long].head()
    assert(got === 40L)
  }

  test("v1 sketch bytes (pre-register-fix, no version header) are " +
      "refused loudly, never merged into garbage") {
    // the v1→v2 register-index move reassigned every hash to a different
    // register — OR-merging v1 bytes would corrupt silently; the version
    // header (and v1's distinct length) makes it a loud refusal instead
    val v1 = new Array[Byte](Hll.M) // bare registers, no header
    val e = intercept[IllegalArgumentException] { Hll.estimate(v1) }
    assert(e.getMessage.contains("v1") && e.getMessage.contains("re-sketch"),
      e.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Hll.merge(Hll.emptySketch(), v1)
    }
    assert(e2.getMessage.contains("v1"), e2.getMessage)
    // BOTH operands are validated: a v1 LEFT operand (merge is public
    // API, even though internal calls always pass the aggregator's own
    // buffer) gets the same descriptive re-sketch message, never a raw
    // ArrayIndexOutOfBoundsException at a(M)
    val e3 = intercept[IllegalArgumentException] {
      Hll.merge(v1, Hll.emptySketch())
    }
    assert(e3.getMessage.contains("v1") && e3.getMessage.contains("re-sketch"),
      e3.getMessage)
    // and a current sketch carries the version marker
    assert(Hll.emptySketch().length === Hll.M + 1)
    assert(Hll.emptySketch()(0) === Hll.Version)
  }

  test("hll_merge rejects non-sketch binary with a descriptive error") {
    val junk = Seq(Array[Byte](1, 2, 3)).toDF("sk")
    val e = intercept[Exception] {
      junk.agg(Hll.mergeAgg($"sk")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("hll_merge")), msgs(e).mkString(" | "))
  }
}
