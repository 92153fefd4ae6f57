package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed total-order primitives: `row_number`, `ntile`, and running
  * (prefix) sums over a WHOLE table without ever funnelling it through a
  * single-partition window sort — Spark's "No Partition Defined for Window
  * operation" is the textbook scale-killer this module exists to remove.
  *
  * The shape is the classic external-rank construction:
  *
  *   1. `repartitionByRange` on the sort key — each partition holds a
  *      contiguous key range, partitions are globally ordered;
  *   2. one tiny per-partition aggregate (≤ numShufflePartitions rows)
  *      computes each partition's row count / value total;
  *   3. cumulative offsets over those P rows come from a broadcast
  *      triangular self-join (P² pairs with P ≤ a few thousand — driver-
  *      free, window-free, fully lazy);
  *   4. a `Window.partitionBy(partition-id)` ranks/sums locally and adds
  *      the broadcast offset.
  *
  * Every partition processes only its own slice, so the construction holds
  * at 10⁹ keys where `Window.orderBy(...)` without a partition spec means
  * one task sorting the world.
  *
  * Determinism contract: the sort columns must define a TOTAL order
  * (callers append a unique tiebreak key). Range boundaries come from
  * sampling and may vary run-to-run, but with a total order the assigned
  * rank of every row is boundary-independent — only WHERE the work happens
  * varies. The range-partitioned input is `localCheckpoint`ed so the
  * counts branch and the rank branch observe the SAME boundaries (two
  * independent range exchanges could legally sample different bounds,
  * which would mis-align offsets with partitions).
  *
  * Callers should project to the slim (sort keys + carry keys) view
  * before ranking — the checkpoint materializes whatever it is given.
  */
object GlobalRank {

  /** Range-partition `df` by `sort`, pin the layout, and tag each row with
    * its (now-stable) partition id. */
  private def ranged(df: DataFrame, sort: Seq[Column], partitions: Int)
      : DataFrame = {
    val p =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    df.repartitionByRange(p, sort: _*)
      .withColumn("__grpid", spark_partition_id())
      .localCheckpoint(eager = true)
  }

  /** Per-partition totals of `weight` → exclusive running offset per
    * partition id, via a broadcast triangular join over ≤P rows. The
    * result carries (`__grpid`, `__grpoff`, `__grpc`) with `__grpoff` typed
    * like `sum(weight)`. */
  private def offsets(tagged: DataFrame, weight: Column): DataFrame = {
    val counts = tagged.groupBy(col("__grpid")).agg(sum(weight).as("__grpc"))
    val zero = lit(0).cast(counts.schema("__grpc").dataType)
    val right = counts
      .select(col("__grpid").as("__pb"), col("__grpc").as("__cb"))
    counts
      .join(broadcast(right), col("__pb") < col("__grpid"), "left")
      .groupBy(col("__grpid"), col("__grpc"))
      .agg(coalesce(sum(col("__cb")), zero).as("__grpoff"))
  }

  /** Distributed `row_number() over (order by sort…)` as a LongType column
    * `out` (1-based). `sort` must be a total order. */
  def rowNumber(df: DataFrame, sort: Seq[Column], out: String,
      partitions: Int = 0): DataFrame = {
    val tagged = ranged(df, sort, partitions)
    val off = offsets(tagged, lit(1L))
    tagged
      .join(broadcast(off.select(col("__grpid"), col("__grpoff"))),
        Seq("__grpid"))
      .withColumn("__grploc", row_number()
        .over(Window.partitionBy(col("__grpid")).orderBy(sort: _*))
        .cast(LongType))
      .withColumn(out, col("__grpoff") + col("__grploc"))
      .drop("__grpid", "__grpoff", "__grploc")
  }

  /** Distributed `ntile(n) over (order by sort…)` as an IntegerType column
    * `out`, bit-equal to SQL NTILE: with c rows, the first `c mod n`
    * buckets get `⌈c/n⌉` rows, the rest `⌊c/n⌋` — derived arithmetically
    * from the distributed rank plus a broadcast total, no quantile
    * approximation anywhere. */
  def ntile(df: DataFrame, sort: Seq[Column], n: Int, out: String,
      partitions: Int = 0): DataFrame = {
    require(n > 0, s"ntile buckets must be positive, got $n")
    val tagged = ranged(df, sort, partitions)
    val off = offsets(tagged, lit(1L))
    val total = off
      .agg(max(col("__grpoff") + col("__grpc")).as("__grptot"))
    val base = (col("__grptot") / n).cast(LongType)     // ⌊c/n⌋
    val rem = col("__grptot") % n                        // first rem buckets +1
    val cut = rem * (base + lit(1L))                     // rows in fat buckets
    val rn = col("__grpoff") + col("__grploc")
    tagged
      .join(broadcast(off.select(col("__grpid"), col("__grpoff"))),
        Seq("__grpid"))
      .crossJoin(broadcast(total))
      .withColumn("__grploc", row_number()
        .over(Window.partitionBy(col("__grpid")).orderBy(sort: _*))
        .cast(LongType))
      .withColumn(out,
        when(col("__grptot") <= n, rn) // every bucket has ≤1 row
          .when(rn <= cut, (rn - 1) / (base + lit(1L)) + 1)
          .otherwise(rem + (rn - lit(1L) - cut) / greatest(base, lit(1L)) + 1)
          .cast("int"))
      .drop("__grpid", "__grpoff", "__grploc", "__grptot")
  }

  /** Distributed inclusive running sum of `value` over the total order
    * `sort`, as column `out` typed like `sum(value)` — callers pass an
    * exact type (long / decimal) when bit-replayability matters, since a
    * double prefix sum is order-exact here but loses exactness to
    * representation. */
  def prefixSum(df: DataFrame, sort: Seq[Column], value: Column, out: String,
      partitions: Int = 0): DataFrame = {
    val tagged = ranged(df, sort, partitions)
    val off = offsets(tagged, value)
    tagged
      .join(broadcast(off.select(col("__grpid"), col("__grpoff"))),
        Seq("__grpid"))
      .withColumn(out, col("__grpoff") + sum(value)
        .over(Window.partitionBy(col("__grpid")).orderBy(sort: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__grpid", "__grpoff")
  }
}
