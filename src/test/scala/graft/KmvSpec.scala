package graft

import org.apache.spark.sql.functions._

import graft.functions.Kmv

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (0 until n).map(i => i.toLong * 7919 + 13)

  test("sketch state IS the k smallest hashes (a real uniform sample)") {
    val df = ids(5000).toDF("id")
      .select(xxhash64(col("id")).as("h"))
    val sk = Kmv.deserialize(
      df.agg(Kmv.sketchAgg(col("h"))).head.getAs[Array[Byte]](0))
    val want = df.as[Long].collect()
      .map(_ ^ Long.MinValue).distinct.sorted.take(Kmv.K)
    assert(sk.toSeq === want.toSeq)
  }

  test("merging per-group sketches is byte-exact vs the global sketch") {
    val df = ids(20000).toDF("id")
      .select(col("id"), xxhash64(col("id")).as("h"))
    val global = df.agg(Kmv.sketchAgg(col("h"))).head.getAs[Array[Byte]](0)
    val merged = df.groupBy(pmod(col("id"), lit(13)))
      .agg(Kmv.sketchAgg(col("h")).as("sk"))
      .agg(Kmv.mergeAgg(col("sk"))).head.getAs[Array[Byte]](0)
    assert(merged.toSeq === global.toSeq)
    val repart = df.repartition(17)
      .agg(Kmv.sketchAgg(col("h"))).head.getAs[Array[Byte]](0)
    assert(repart.toSeq === global.toSeq, "layout-stable")
  }

  test("estimate: exact below K, within tolerance above; duplicates ignored") {
    val small = ids(40).toDF("id").select(xxhash64(col("id")).as("h"))
    val smallEst = small.agg(
      Kmv.estimateCol(Kmv.sketchAgg(col("h")))).head.getLong(0)
    assert(smallEst === 40L)
    val dup = ids(40).flatMap(i => Seq(i, i, i)).toDF("id")
      .select(xxhash64(col("id")).as("h"))
    assert(dup.agg(Kmv.estimateCol(Kmv.sketchAgg(col("h"))))
      .head.getLong(0) === 40L, "multiplicity must not inflate the sample")
    val big = ids(10000).toDF("id").select(xxhash64(col("id")).as("h"))
    val est = big.agg(Kmv.estimateCol(Kmv.sketchAgg(col("h")))).head.getLong(0)
    assert(math.abs(est - 10000.0) / 10000.0 < 0.4,
      s"K=${Kmv.K} estimate $est too far from 10000")
  }

  test("kmv_merge rejects non-sketch binary with a descriptive error") {
    val bad = Seq(Array[Byte](1, 2, 3)).toDF("sk")
    val e = intercept[Exception] {
      bad.agg(Kmv.mergeAgg(col("sk"))).head
    }
    assert(e.getMessage.contains("kmv") ||
      Option(e.getCause).exists(_.getMessage.contains("kmv")))
  }
}
