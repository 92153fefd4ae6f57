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
