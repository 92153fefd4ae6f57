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
    // Hashing all HASHABLE columns keeps identical rows on one salt
    // while hot KEYS still spread across buckets through their varying
    // payload columns. Map-typed columns are excluded (xxhash64 fails
    // analysis on them — maps have no canonical order to hash).
    // LIMITATION, accepted: rows that are fully identical necessarily
    // share a salt bucket — ANY deterministic content hash must send
    // them together, and a positional/random salt is exactly the retry
    // bug above. A hot key whose rows are exact duplicates therefore
    // stays skewed; aggregate duplicates upstream (they collapse to a
    // count) or carry a distinct discriminator column if that shape
    // matters.
    val hashable = df.schema.fields
      .filterNot(f => containsMap(f.dataType)).map(f => col(f.name))
    require(hashable.nonEmpty,
      "saltedSumCount: every column is map-typed — nothing deterministic " +
        "to salt on; add a non-map discriminator column")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(hashable.toIndexedSeq: _*), lit(saltBuckets)))
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

  /** xxhash64 rejects MapType anywhere in a type (no canonical entry
    * order) — detect it through structs and arrays. */
  private def containsMap(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.MapType => true
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.exists(f => containsMap(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType =>
        containsMap(a.elementType)
      case _ => false
    }
}
