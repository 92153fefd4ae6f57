package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.GlobalRank

/** GlobalRank = the single-partition window, distributed. Every assert is
  * bit-equality against the corresponding global window on data small
  * enough to make the window trustworthy, plus a plan audit proving no
  * empty-partition-spec WindowExec survives in GlobalRank's own plans. */
class GlobalRankSpec extends SparkSpec {
  import spark.implicits._

  // queryExecution.sparkPlan, NOT executedPlan: under AQE the executed
  // plan is an AdaptiveSparkPlanExec LEAF whose inner tree collect() never
  // visits — the audit would pass vacuously (the negative control below
  // proves this collector really sees windows).
  private def globalWindows(
      df: org.apache.spark.sql.DataFrame): Seq[WindowExec] =
    df.queryExecution.sparkPlan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }

  private def noGlobalWindow(df: org.apache.spark.sql.DataFrame): Unit = {
    val bad = globalWindows(df)
    assert(bad.isEmpty, s"single-partition WindowExec found:\n${bad.mkString}")
  }

  test("negative control: the collector does flag a global window") {
    val bad = spark.range(10)
      .withColumn("rn", row_number().over(Window.orderBy("id")))
    assert(globalWindows(bad).nonEmpty)
  }

  // 1000 rows, deliberately tie-heavy (only 17 distinct keys) so rank
  // correctness under ties rides entirely on the unique tiebreak column.
  private lazy val df = spark
    .range(1000)
    .select(col("id"), (col("id") * 37 % 17).as("k"))
    .repartition(7) // scramble the input layout
    .localCheckpoint(eager = true)

  test("rowNumber matches row_number() over a global window, ties included") {
    val want = df
      .withColumn("rn",
        row_number().over(Window.orderBy(col("k"), col("id"))).cast("long"))
    val got = GlobalRank.rowNumber(df, Seq(col("k"), col("id")), "rn",
      partitions = 5)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    noGlobalWindow(got)
  }

  test("rowNumber with a descending sort column") {
    val want = df.withColumn("rn",
      row_number().over(Window.orderBy(desc("k"), asc("id"))).cast("long"))
    val got = GlobalRank.rowNumber(df, Seq(desc("k"), asc("id")), "rn",
      partitions = 5)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("ntile matches ntile(n) for n that divides, n that doesn't, n > rows") {
    for (n <- Seq(4, 7, 10, 1500)) {
      val want = df.withColumn("b",
        ntile(n).over(Window.orderBy(col("k"), col("id"))))
      val got = GlobalRank.ntile(df, Seq(col("k"), col("id")), n, "b",
        partitions = 5)
      assert(got.except(want).isEmpty && want.except(got).isEmpty, s"n=$n")
      noGlobalWindow(got)
    }
  }

  test("prefixSum matches a running window sum (exact long arithmetic)") {
    val v = (col("id") % 13 + 1).cast("long")
    val want = df.withColumn("run", sum(v).over(
      Window.orderBy(col("k"), col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = GlobalRank.prefixSum(df, Seq(col("k"), col("id")), v, "run",
      partitions = 5)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    noGlobalWindow(got)
  }

  test("rank is independent of requested partition count") {
    val a = GlobalRank.rowNumber(df, Seq(col("k"), col("id")), "rn",
      partitions = 2)
    val b = GlobalRank.rowNumber(df, Seq(col("k"), col("id")), "rn",
      partitions = 31)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("empty input yields empty output, no failure") {
    val empty = df.filter(col("id") < 0)
    assert(GlobalRank.rowNumber(empty, Seq(col("id")), "rn").count() === 0L)
    assert(GlobalRank.ntile(empty, Seq(col("id")), 5, "b").count() === 0L)
    assert(GlobalRank
      .prefixSum(empty, Seq(col("id")), col("id"), "run").count() === 0L)
  }

  test("single-row input: rank 1, bucket 1") {
    val one = Seq((1L, 2L)).toDF("id", "k")
    val r = GlobalRank.rowNumber(one, Seq(col("id")), "rn")
      .select("rn").as[Long].head()
    assert(r === 1L)
    val b = GlobalRank.ntile(one, Seq(col("id")), 10, "b")
      .select("b").as[Int].head()
    assert(b === 1)
  }

  test("quantileCont ignores NULL values exactly like percentile_cont") {
    import spark.implicits._
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), None, None).toDF("v")
    val probs = Seq(0.0, 0.5, 1.0)
    val got = GlobalRank.quantileCont(df, col("v"), probs)
      .orderBy("prob").select("p_value").as[Double].collect().toSeq
    // SQL semantics: N = 3 non-null values {1,2,3}
    assert(got === Seq(1.0, 2.0, 3.0),
      s"nulls must not shift bracket ranks: $got")
  }

  test("quantileCont equals the exact percentile builtin (selection-pruned path)") {
    // 1000 shuffled distinct values + duplicates; probs hitting exact
    // ranks, interpolated positions, and both endpoints — the pruned
    // bracket-partition path must be value-identical to Spark's exact
    // percentile (same QUANTILE_CONT interpolation)
    val vals = ((1 to 1000).map(i => (i * 37 % 1000).toDouble) ++
      Seq(5.0, 5.0, 5.0)).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = vals.toDF("id", "v")
    val probs = Seq(0.0, 0.01, 0.25, 0.5, 0.613, 0.99, 1.0)
    val got = GlobalRank.quantileCont(df, col("v"), probs)
      .orderBy("prob").select("p_value").as[Double].collect()
    val exp = df.agg(org.apache.spark.sql.functions.percentile(col("v"),
        org.apache.spark.sql.functions.lit(probs.toArray)).as("p"))
      .select("p").as[Seq[Double]].head()
    assert(got.toSeq === exp)
  }

  test("prefixSum REJECTS null values loudly (non-null contract)") {
    // a null would silently diverge from the global-window semantics
    // (null partition-prefix vs earlier-partition sum) — the guard must
    // raise, not mis-sum, and must survive column pruning
    val df = Seq((1L, Option(5L)), (2L, None), (3L, Option(7L)))
      .toDF("k", "v")
    val e = intercept[Exception] {
      GlobalRank.prefixSum(df, Seq(col("k")), col("v"), "run")
        .agg(org.apache.spark.sql.functions.max("run")).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("non-null contract")),
      s"unexpected failure: ${messages(e).mkString(" | ")}")
  }
}
