package graft

import org.apache.spark.sql.functions._

import graft.operators.TemporalJoins

/** Range-join shape and semantics: the bucketized equi-join must emit
  * exactly the |Δts| ≤ width pairs a theta join would (each pair once),
  * and it must read the right table ONCE — the previous 3-shift
  * unionByName planned three separate scans of the larger side. */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) =
    new java.sql.Timestamp(sec * 1000L)

  test("rangeJoin equals the theta join, each pair exactly once") {
    val left = Seq(
      (1L, ts(100), 10L), (1L, ts(250), 11L), (2L, ts(100), 12L))
      .toDF("k", "t", "id")
    val right = Seq(
      (1L, ts(40), 20L),   // 60s before left 10 — in at width 60
      (1L, ts(100), 21L),  // exact tie with left 10
      (1L, ts(170), 22L),  // 70s from both left rows — out at width 60
      (2L, ts(220), 23L),  // other key, 120s away — out
      (3L, ts(100), 24L))  // key absent on the left
      .toDF("k", "t", "id")
    val got = TemporalJoins.rangeJoin(left, right, "k", "t", "id", 60L)
      .select($"left_id", $"right_id").as[(Long, Long)].collect().toSeq
    val want = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" &&
          abs(unix_timestamp($"l.t") - unix_timestamp($"r.t")) <= 60L)
      .select($"l.id", $"r.id").as[(Long, Long)].collect().toSeq
    assert(got.sorted === want.sorted, s"got $got want $want")
    assert(got.size === got.distinct.size, "a pair was emitted twice")
    assert(want.nonEmpty)
  }

  test("rangeJoin reads the right table ONCE (explode, not a 3-scan union)") {
    val dir = java.nio.file.Files.createTempDirectory("rj-right").toString
    Seq((1L, ts(40), 20L), (1L, ts(100), 21L)).toDF("k", "t", "id")
      .write.mode("overwrite").parquet(dir)
    val right = spark.read.parquet(dir)
    val left = Seq((1L, ts(100), 10L)).toDF("k", "t", "id")
    val plan = TemporalJoins.rangeJoin(left, right, "k", "t", "id", 60L)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans === 1, s"right table scanned $scans times:\n$plan")
    assert(!plan.contains("Union"), s"3-shift union is back:\n$plan")
  }
}
