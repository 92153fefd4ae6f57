package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins over event streams (SURVEY.md §2 J10): as-of join and
  * bounded range join, built scale-first.
  *
  * A naive as-of join is a non-equi theta join (BroadcastNestedLoop —
  * quadratic per key). Instead:
  *
  *  - [[asOfJoin]] uses the union-and-carry pattern: union both sides
  *    tagged, sort per key by time, and carry the most recent right-side
  *    row forward with a `last(..., ignoreNulls)` running window. ONE
  *    shuffle on the key, linear scan per key — the same plan a
  *    sort-merge as-of would produce, with no custom SparkPlan needed.
  *  - [[rangeJoin]] buckets both sides by `⌊ts/width⌋` and equi-joins on
  *    (key, bucket ± 1), turning the inequality predicate into a hash join
  *    with a residual filter — candidate space is bounded by bucket
  *    occupancy instead of |left|×|right| per key.
  */
object TemporalJoins {

  /** For each left row, attach the latest right row (by `tsCol`) with
    * `right.ts <= left.ts`, matching on `keyCol` — e.g. "the signup a
    * session error refers back to". Right-side payload columns come
    * through as `prefix<col>`, null when no prior right row exists. */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      rightPayload: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    val lCols = left.columns.toSeq
    // The right payload is carried as ONE struct (non-null for every right
    // row even when its fields are null), so the attached as-of values all
    // come from the SAME right row — a per-column last(ignoreNulls) would
    // back-fill a null field from an OLDER right row, mixing rows.
    val rStructType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(right.schema.fieldIndex(c))))
    // tag: right rows sort BEFORE left rows at identical ts (<= semantics)
    val lSel: Seq[Column] =
      Seq(col(keyCol).as("__key"), col(tsCol).as("__ts"), lit(1).as("__side"),
        struct(lCols.map(col): _*).as("__lrow"),
        lit(null).cast(rStructType).as("__rrow"))
    val l = left.select(lSel: _*)
    val rSel: Seq[Column] =
      Seq(col(keyCol).as("__key"), col(tsCol).as("__ts"), lit(0).as("__side"),
        lit(null).cast(l.schema("__lrow").dataType).as("__lrow"),
        struct(rightPayload.map(col): _*).as("__rrow"))
    // SQL comparison semantics on the right side: a null key can equal
    // nothing and a null ts is never <= any left ts — unfiltered they
    // would match null-key LEFT rows and sort "earliest" (Spark sorts
    // nulls first). Left rows with a null key keep their row, payload
    // null, exactly like the SQL as-of subquery.
    val r = right
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(rSel: _*)
    // Final sort key: several right rows tying on (key, ts) must resolve
    // DETERMINISTICALLY (the greatest payload wins), not by shuffle
    // arrival order — a single-partition test is stable either way, a
    // clustered run is not. Ordering by the whole payload struct would
    // fail analysis when any payload field is unorderable (MapType), so
    // the tiebreak restricts to the ORDERABLE payload fields; a payload
    // with none falls back to a content hash of its JSON rendering —
    // still a pure function of the row's values, never of arrival order
    val orderableTie = rightPayload.filter(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        right.schema(right.schema.fieldIndex(c)).dataType))
    val tie: Column =
      if (orderableTie.nonEmpty)
        struct(orderableTie.map(c => col(s"__rrow.$c")): _*)
      else xxhash64(to_json(col("__rrow")))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"), tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(col("__lrow"),
        last(col("__rrow"), ignoreNulls = true).over(w).as("__r"))
      .filter(col("__lrow").isNotNull)
    carried.select(lCols.map(c => col(s"__lrow.$c").as(c)) ++
      rightPayload.map(c => col(s"__r.$c").as(s"$prefix$c")): _*)
  }

  /** Pairs (l, r) matching on `keyCol` with |l.ts − r.ts| ≤ `widthSec`,
    * via bucketized equi-join. Output: key, left ts/id, right ts/id.
    *
    * Granularity contract: comparisons run on `unix_timestamp`, i.e.
    * WHOLE SECONDS — sub-second differences truncate before the width
    * test (two events 0.9 s past the width can pair). Pass a TIMESTAMP
    * column: a string ts parses in the session timezone (and DST-gap
    * strings parse to null, silently dropping rows). */
  def rangeJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      widthSec: Long): DataFrame = {
    // widthSec = 0 divides the bucket index by zero (null buckets under
    // legacy mode -> silently empty result; an ANSI error mid-job) and
    // negative widths are meaningless — refuse both up front
    require(widthSec >= 1, s"rangeJoin: widthSec must be >= 1 (got $widthSec)")
    def bucketed(df: DataFrame, side: String) = df.select(
      col(keyCol),
      floor(unix_timestamp(col(tsCol)) / widthSec).as("__bucket"),
      col(tsCol).as(s"${side}_ts"),
      col(idCol).as(s"${side}_id"))
    // right appears once per bucket in {b-1, b, b+1} so every candidate
    // within widthSec of a left row shares a bucket with it exactly once.
    // ONE scan + a 3-way explode of the shifts — a unionByName of three
    // bucketed() reads planned as three separate scans of the right
    // table (Spark reuses exchanges, not scans), i.e. 3× the IO of the
    // larger side at 100 TB for byte-identical output
    val r = bucketed(right, "right")
      .withColumn("__bucket",
        explode(array(col("__bucket") - 1, col("__bucket"),
          col("__bucket") + 1)))
    bucketed(left, "left").join(r, Seq(keyCol, "__bucket"))
      .filter(abs(unix_timestamp(col("left_ts")) - unix_timestamp(col("right_ts"))) <= widthSec)
      .drop("__bucket")
  }
}
