package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for wide aggregations (SURVEY.md §7.4: k-means
  * partitions — and real-world keys — are naturally skewed; the reference
  * has no answer to skew at all).
  *
  * Two-phase salted aggregation: phase 1 aggregates on
  * (key, hash(row) % saltBuckets) so one hot key spreads over
  * `saltBuckets` reducers; phase 2 merges the partials on the key alone.
  * Correct for any algebraic aggregate (sum/count/min/max) — the caller
  * supplies the partial and merge forms.
  *
  * AQE's skew-join splitting handles JOIN skew at runtime; salting is the
  * complementary fix for AGGREGATION skew, where a single hot group would
  * otherwise pin one reducer.
  */
object Salting {

  /** Salted sum/count aggregate: `sums` are (inputExpr → outName);
    * `counts` adds an optional row-count column. */
  def saltedSumCount(
      df: DataFrame,
      keys: Seq[String],
      saltBuckets: Int,
      sums: Map[Column, String],
      countName: Option[String] = None): DataFrame = {
    require(saltBuckets >= 1,
      s"saltedSumCount: saltBuckets must be >= 1 (got $saltBuckets)")
    require(sums.nonEmpty || countName.nonEmpty,
      "saltedSumCount: nothing to aggregate (empty sums, no countName)")
    // salt must be DETERMINISTIC per row content, never
    // monotonically_increasing_id: a task retry after a fetch failure
    // re-enumerates ids in a different order, rows land in different
    // (key, salt) groups than the first attempt, and phase 2 merges
    // partials from BOTH attempts — silently double-counted sums.
    // Hashing all columns keeps identical rows on one salt (harmless for
    // algebraic merges) while hot KEYS still spread across buckets
    // through their varying payload columns.
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(saltBuckets)))
    val phase1Aggs =
      sums.toSeq.map { case (c, n) => sum(c).as(s"__p_$n") } ++
        countName.map(n => count(lit(1)).as(s"__p_$n")).toSeq
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(phase1Aggs.head, phase1Aggs.tail: _*)
    val phase2Aggs =
      sums.toSeq.map { case (_, n) => sum(col(s"__p_$n")).as(n) } ++
        countName.map(n => sum(col(s"__p_$n")).as(n)).toSeq
    partial
      .groupBy(keys.map(col): _*)
      .agg(phase2Aggs.head, phase2Aggs.tail: _*)
  }
}
