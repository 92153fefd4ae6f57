package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
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

  /** Integral (long) division — `a div b`, integer arithmetic end to end.
    * The fractional `/` is a double Divide whose cast-truncation equals
    * floor division only while quotients stay below ~2⁵³; a primitive
    * advertising exact SQL-NTILE arithmetic must not rest on FP rounding.
    * All ntile operands are non-negative, so truncation == floor. */
  private def ldiv(a: Column, b: Column): Column =
    ColumnBridge.column(new IntegralDivide(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Range-partition `df` by `sort`, pin the layout, and tag each row with
    * its (now-stable) partition id. */
  private def ranged(df: DataFrame, sort: Seq[Column], partitions: Int)
      : DataFrame = {
    val p =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // localCheckpoint (not persist): if blocks are lost the job FAILS
    // LOUDLY instead of silently recomputing the range exchange with
    // freshly-sampled (possibly different) boundaries under one branch.
    // eager = false: materialization folds into the first action (the
    // offsets broadcast build) instead of costing its own job at
    // query-construction time.
    df.repartitionByRange(p, sort: _*)
      .withColumn("__grpid", spark_partition_id())
      .localCheckpoint(eager = false)
  }

  /** Per-partition totals of `weight` → exclusive running offset per
    * partition id, via a broadcast triangular join over ≤P rows. The
    * result carries (`__grpid`, `__grpoff`, `__grpc`) with `__grpoff` typed
    * like `sum(weight)`. */
  private def offsets(tagged: DataFrame, weight: Column): DataFrame = {
    // __grpn guard: the per-partition local rank is Spark's row_number,
    // whose buffer is an Int — a range partition past 2^31-1 rows would
    // WRAP it silently into wrong (negative/duplicate) global ranks at
    // exactly the 10^12-row scale this module exists for. The row count
    // rides the same agg for free; raise_error fires loudly instead.
    val counts = tagged.groupBy(col("__grpid"))
      .agg(sum(weight).as("__grpc"), count(lit(1)).as("__grpn"))
      .withColumn("__grpc",
        when(col("__grpn") <= lit(Int.MaxValue.toLong), col("__grpc"))
          .otherwise(raise_error(format_string(
            "GlobalRank: range partition %s holds %s rows — past the " +
              "2^31-1 row_number buffer; pass a larger `partitions`",
            col("__grpid"), col("__grpn")))))
      .drop("__grpn")
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
    val base = ldiv(col("__grptot"), lit(n.toLong))      // ⌊c/n⌋
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
        // The outer greatest(1, least(n, …)) is a value-level no-op (the
        // arithmetic already lands in [1, n]) that writes the bucket
        // bound INTO the plan: downstream aggregates keyed on this
        // column are structurally literal-bounded, so the join sweep's
        // clamp rule can vouch for broadcast builds grouped by ntile
        // buckets without a per-query allowlist entry.
        greatest(lit(1L), least(lit(n.toLong),
          when(col("__grptot") <= n, rn) // every bucket has ≤1 row
            .when(rn <= cut, ldiv(rn - 1, base + lit(1L)) + 1)
            .otherwise(rem + ldiv(rn - lit(1L) - cut, greatest(base, lit(1L))) + 1)))
          .cast("int"))
      .drop("__grpid", "__grpoff", "__grploc", "__grptot")
  }

  /** Exact interpolated quantiles of `value` over the WHOLE table,
    * computed distributed AND selection-pruned: range-partition by value,
    * count per partition (a sortless aggregate), locate which partitions
    * hold each prob's two bracketing ranks, and SORT ONLY THOSE — every
    * other partition is filtered out before the window, so at most
    * 2·|probs| partitions pay a local sort no matter how large the table.
    * No task ever holds the column in memory, unlike `percentile`, whose
    * aggregation buffer IS the whole group (a real OOM at 10¹⁰-row
    * groups; `percentile_approx` trades exactness away instead). Ties are
    * harmless: row_number among equal values is arbitrary but the value
    * AT any such rank is identical, so the output is deterministic.
    * Interpolation matches SQL QUANTILE_CONT / percentile_cont exactly:
    * pos = p·(N−1), v = v_lo + (v_hi − v_lo)·(pos − ⌊pos⌋) — shared-text
    * replayable.
    *
    * @return (prob DOUBLE, p_value DOUBLE unrounded), one row per prob. */
  def quantileCont(df: DataFrame, value: Column, probs: Seq[Double],
      partitions: Int = 0): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probs must be in [0, 1], got $probs")
    val spark = df.sparkSession
    import spark.implicits._
    // NULLs are excluded before ranking — SQL percentile_cont ignores
    // them, and Spark sorts them FIRST, so counting them in N would
    // silently shift every bracket rank onto the wrong rows. (NaN sorts
    // LAST in Spark and is passed through like any engine-specific
    // garbage value — filter upstream if the metric can be NaN.)
    val tagged = ranged(
      df.select(value.cast("double").as("__v")).filter(col("__v").isNotNull),
      Seq(col("__v")), partitions)
    val off = offsets(tagged, lit(1L)) // (__grpid, __grpc, __grpoff)
    val total = off.agg(sum(col("__grpc")).as("__n"))
    val brackets = probs.toDF("prob")
      .crossJoin(total)
      .withColumn("__pos", col("prob") * (col("__n") - 1))
      .withColumn("__lo", floor(col("__pos")) + 1)
      .withColumn("__hi", ceil(col("__pos")) + 1)
    // partitions whose global-rank span [offset+1, offset+count] contains
    // a bracket rank — the ONLY ones whose local order matters
    val needed = off
      .join(broadcast(brackets),
        col("__lo").between(col("__grpoff") + 1,
          col("__grpoff") + col("__grpc")) ||
        col("__hi").between(col("__grpoff") + 1,
          col("__grpoff") + col("__grpc")))
      .select(col("__grpid")).distinct()
    val ranked = tagged
      .join(broadcast(needed), Seq("__grpid")) // prune before the sort
      .join(broadcast(off.select(col("__grpid"), col("__grpoff"))),
        Seq("__grpid"))
      .withColumn("__r", col("__grpoff") + row_number()
        .over(Window.partitionBy(col("__grpid")).orderBy(col("__v")))
        .cast(LongType))
    ranked
      .join(broadcast(brackets),
        col("__r") === col("__lo") || col("__r") === col("__hi"))
      .groupBy(col("prob"), col("__pos"))
      .agg(min(when(col("__r") === col("__lo"), col("__v"))).as("__vlo"),
        min(when(col("__r") === col("__hi"), col("__v"))).as("__vhi"))
      .select(col("prob"),
        (col("__vlo") + (col("__vhi") - col("__vlo")) *
          (col("__pos") - floor(col("__pos")))).as("p_value"))
      .orderBy("prob")
  }

  /** Distributed inclusive running sum of `value` over the total order
    * `sort`, as column `out` typed like `sum(value)` — callers pass an
    * exact type (long / decimal) when bit-replayability matters, since a
    * double prefix sum is order-exact here but loses exactness to
    * representation.
    *
    * NON-NULL CONTRACT on `value`: a null would make this diverge from
    * the global running window it is bit-equal to (a partition whose
    * local prefix is all-null would yield null where the global window
    * returns the earlier partitions' sum — and no local fix can know
    * whether an earlier partition held a non-null). Enforced per row:
    * a null raises rather than silently mis-summing. Callers pass
    * counts/weights; `coalesce` at the call-site if nulls mean zero. */
  def prefixSum(df: DataFrame, sort: Seq[Column], value: Column, out: String,
      partitions: Int = 0): DataFrame = {
    val tagged = ranged(df, sort, partitions)
    val off = offsets(tagged, value)
    // The guard lives INSIDE the summed expression, so column pruning
    // cannot drop it; the otherwise-branch raises only when a null row is
    // actually summed, and the when/otherwise result type is exactly
    // `value`'s type (no decimal-precision widening of the output).
    val vt = tagged.select(value.as("__v")).schema.head.dataType
    val guarded = when(value.isNotNull, value).otherwise(
      raise_error(lit("GlobalRank.prefixSum: value contains NULL — " +
        "non-null contract (coalesce at the call-site if nulls mean zero)"))
        .cast(vt))
    tagged
      .join(broadcast(off.select(col("__grpid"), col("__grpoff"))),
        Seq("__grpid"))
      .withColumn(out, col("__grpoff") + sum(guarded)
        .over(Window.partitionBy(col("__grpid")).orderBy(sort: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__grpid", "__grpoff")
  }
}
