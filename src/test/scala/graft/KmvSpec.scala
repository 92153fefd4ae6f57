package graft

import org.apache.spark.sql.functions._

import graft.functions.Kmv

class KmvSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (0 until n).map(i => i.toLong * 7919 + 13)

  test("sketch state IS the k smallest hashes (a real uniform sample)") {
    val df = ids(5000).toDF("id")
      .select(xxhash64(col("id")).as("h"))
    val bytes = df.agg(Kmv.sketchAgg(col("h"))).head.getAs[Array[Byte]](0)
    val want = df.as[Long].collect()
      .map(_ ^ Long.MinValue).distinct.sorted.take(Kmv.K)
    assert(Kmv.values(bytes).toSeq === want.toSeq)
    assert(Kmv.kOf(bytes) === Kmv.K, "sketch bytes carry their k")
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

  test("k is a real knob: larger k carries more sample and tightens error") {
    val df = ids(50000).toDF("id").select(xxhash64(col("id")).as("h"))
    for (k <- Seq(16, 512)) {
      val bytes = df.agg(Kmv.sketchAgg(col("h"), k))
        .head.getAs[Array[Byte]](0)
      assert(Kmv.kOf(bytes) === k)
      assert(Kmv.values(bytes).length === k, s"k=$k sketch should be full")
      // mergeability holds at every k, byte-exactly
      val merged = df.groupBy(pmod(xxhash64(col("h")), lit(7)))
        .agg(Kmv.sketchAgg(col("h"), k).as("sk"))
        .agg(Kmv.mergeAgg(col("sk"))).head.getAs[Array[Byte]](0)
      assert(merged.toSeq === bytes.toSeq, s"k=$k merge != global")
    }
    def err(k: Int): Double = {
      val est = df.agg(Kmv.estimateCol(Kmv.sketchAgg(col("h"), k)))
        .head.getLong(0)
      math.abs(est - 50000.0) / 50000.0
    }
    // theory: ~1/sqrt(k-2) → 26% at k=16, 4.4% at k=512; allow slack but
    // the big sketch must beat the theoretical error of the small one
    assert(err(512) < 0.27, s"k=512 error ${err(512)}")
  }

  test("merging sketches with different k fails loudly, not biased-silently") {
    val df = ids(5000).toDF("id").select(xxhash64(col("id")).as("h"))
    val a = df.agg(Kmv.sketchAgg(col("h"), 16).as("sk"))
    val b = df.agg(Kmv.sketchAgg(col("h"), 64).as("sk"))
    val e = intercept[Exception] {
      a.union(b).agg(Kmv.mergeAgg(col("sk"))).head
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("different k"), msgs.take(300))
  }

  test("kmv_merge rejects non-sketch binary with a descriptive error") {
    val bad = Seq(Array[Byte](1, 2, 3)).toDF("sk")
    val e = intercept[Exception] {
      bad.agg(Kmv.mergeAgg(col("sk"))).head
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("kmv"), msgs.take(300))
  }

  test("SQL surface: graft_kmv_sketch takes an optional k argument") {
    Graft.register(spark)
    ids(5000).toDF("id").createOrReplaceTempView("kmv_ids")
    val est = spark.sql(
      """SELECT graft_kmv_estimate(
           graft_kmv_sketch(xxhash64(CAST(id AS STRING)), 256)) AS e
         FROM kmv_ids""").head.getLong(0)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.2, s"SQL k=256 estimate $est")
  }
}
