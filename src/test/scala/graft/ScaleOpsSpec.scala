package graft

import org.apache.spark.sql.functions._

import graft.functions.{L2NormalizeFP32, VectorOps}
import graft.operators.Salting
import graft.queries.{dec, table}

/** Scale-machinery specs: salted aggregation equivalence, fused normalize
  * parity, bucketed co-located joins. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

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
