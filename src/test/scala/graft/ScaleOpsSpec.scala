package graft

import org.apache.spark.sql.functions._

import graft.functions.{L2NormalizeFP32, VectorOps}
import graft.operators.Salting
import graft.queries.{dec, table}

/** Scale-machinery specs: salted aggregation equivalence, fused normalize
  * parity, bucketed co-located joins. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salt is a pure function of row content (deterministic under retry); " +
      "misuse refused") {
    // monotonically_increasing_id-derived salts change when a retried
    // task re-enumerates rows — partials from two attempts then
    // double-merge. Content-hash salts make two independent evaluations
    // of the same input land every row on the same salt.
    val li = table(spark, sf0001, "lineitem").limit(500)
    def run() = Salting.saltedSumCount(li, Seq("l_returnflag"), 8,
        Map(col("l_quantity") -> "q"), Some("n"))
      .collect().map(_.toSeq).toSet
    assert(run() === run())
    intercept[IllegalArgumentException] {
      Salting.saltedSumCount(li, Seq("l_returnflag"), 0,
        Map(col("l_quantity") -> "q"))
    }
    intercept[IllegalArgumentException] {
      Salting.saltedSumCount(li, Seq("l_returnflag"), 8, Map.empty)
    }
  }

  test("map-typed payload columns don't break the salt (excluded from " +
      "the content hash); all-map payloads refused") {
    // xxhash64 fails analysis on MapType — the salt hashes only the
    // hashable columns, so a map payload rides along untouched
    val df = Seq(
      ("a", 1L, Map("k" -> 1)), ("a", 2L, Map("k" -> 2)),
      ("b", 3L, Map("x" -> 9)))
      .toDF("key", "v", "props")
    val got = Salting.saltedSumCount(df, Seq("key"), 4,
        Map(col("v") -> "sv"), Some("n"))
      .orderBy("key").as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 3L, 2L), ("b", 3L, 1L)))
    // nothing hashable at all → loud refusal, not an analysis error
    val allMap = Seq((Map("k" -> 1), 1L)).toDF("m", "v")
      .select($"m", map($"v".cast("string"), $"v").as("v2"))
    val e = intercept[IllegalArgumentException] {
      Salting.saltedSumCount(allMap, Seq("m"), 4, Map(col("v2") -> "s"))
    }
    assert(e.getMessage.contains("map-typed"), e.getMessage)
  }

  test("contrastive negatives: explicit null-label policy, NaN scores " +
      "never claim ranks") {
    import graft.operators.Contrastive
    val vecs = Seq(
      (1L, Seq(1f, 0f), Some("cat")), (2L, Seq(0.9f, 0.1f), Some("dog")),
      (3L, Seq(0f, 1f), Option.empty[String]),
      (4L, Seq(Float.NaN, 1f), Some("dog")))
      .toDF("id", "vec", "label")
    val qs = Seq(
      (10L, Seq(1f, 0f), Some("cat")),
      (11L, Seq(0f, 1f), Option.empty[String]))
      .toDF("qid", "vec", "label")
    val got = Contrastive.hardNegatives(vecs, qs, "id", "qid", "vec",
        "label", k = 2)
      .select($"query_id", $"id").as[(Long, Long)].collect().toSet
    // unlabeled anchor 11 and unlabeled candidate 3 are excluded by the
    // documented policy; NaN-scored candidate 4 never outranks real ones
    assert(got === Set((10L, 2L)))
    val rnd = Contrastive.randomNegatives(vecs, qs, "id", "qid",
        "label", k = 2, seed = 7L)
      .select($"query_id", $"id").as[(Long, Long)].collect().toSet
    assert(rnd.forall(_._1 == 10L) && rnd.forall(t => Set(2L, 4L)(t._2)))
  }

  test("salted aggregation equals direct aggregation") {
    val li = table(spark, sf0001, "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .as[(String, Double, Long)].collect().toSeq
    val salted = Salting.saltedSumCount(
        li, Seq("l_returnflag"), saltBuckets = 16,
        sums = Map(dec($"l_quantity") -> "sum_qty_dec"),
        countName = Some("n"))
      .select($"l_returnflag", $"sum_qty_dec".cast("double").as("sum_qty"), $"n")
      .orderBy("l_returnflag")
      .as[(String, Double, Long)].collect().toSeq
    assert(salted === direct)
  }

  test("fused L2NormalizeFP32 is bit-identical to the HOF normalize") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val diff = emb.select(
        L2NormalizeFP32($"embedding").as("fused"),
        VectorOps.l2Normalize($"embedding").as("hof"))
      .filter($"fused" =!= $"hof")
    assert(diff.count() === 0)
    // and unit norm afterwards
    val norms = emb.select(
      round(VectorOps.l2Norm(L2NormalizeFP32($"embedding")), 9).as("n"))
    assert(norms.filter(abs($"n" - 1.0) > 1e-6).count() === 0)
  }

  test("bucketed tables join without an exchange (co-located join)") {
    val li = table(spark, sf0001, "lineitem").select("l_orderkey", "l_quantity")
    val o = table(spark, sf0001, "orders").select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bkt")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bkt")
    val joined = spark.table("li_bkt")
      .join(spark.table("o_bkt"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("x", col("l_quantity") * col("o_totalprice"))
    // disable broadcast so the join must pick SMJ — bucketing should
    // remove the shuffle exchanges on both sides
    withBroadcastDisabled {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(600))
      assert(joined.count() === table(spark, sf0001, "lineitem").count())
    }
  }

  private def withBroadcastDisabled[T](f: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
