package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing: assigning variable-length documents to fixed-token-
  * budget training sequences — the step between "deduped, filtered docs"
  * and "what the trainer actually loads" (GPT-3 §2.3 packs documents into
  * 2048-token contexts; T5 calls it "packing").
  *
  * [[nextFit]] is the streaming-friendly NEXT-FIT discipline: walk each
  * group's documents in a deterministic order, append to the open
  * sequence while it fits, else seal it and start the next. Within-2×
  * of optimal bin count, one pass, O(1) state — and, crucially for this
  * engine, a pure function of the (group, order) so the layout is
  * re-ingest-stable and replays in recursive SQL. (Best-fit-decreasing
  * packs ~10% tighter but needs a mutable bin index — order-dependent
  * and unreplayable; next-fit is what a 100 TB pipeline actually runs,
  * per shard, in parallel.)
  *
  * Scale shape: one shuffle by `groupCol` (the shard axis — language,
  * source, hash bucket), then a sorted linear scan per group via
  * `flatMapSortedGroups`; no window over the corpus, no driver state.
  * Groups are independent, so parallelism = number of shards; size the
  * shard key so groups are executor-sized (the same contract as
  * `text_pack_shards`).
  */
object Packing {

  /** Injective multi-column group key for [[nextFit]]: each component is
    * null-tagged and length-prefixed (`N;` for NULL, `V<len>;<value>`
    * otherwise), so — unlike `concat_ws`, which DROPS nulls and lets a
    * delimiter inside a value merge distinct groups — no two distinct
    * column tuples ever collide ("train"+NULL ≠ "train"+"" and
    * ("a|b","c") ≠ ("a","b|c")). */
  def groupKey(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    concat(cols.map { c0 =>
      val c = c0.cast("string")
      when(c.isNull, lit("N;"))
        .otherwise(concat(lit("V"), length(c), lit(";"), c))
    }: _*)

  /** Next-fit packing of rows into capacity-bounded sequences per group.
    *
    * A row larger than `capacity` gets a sequence of its own (it opens a
    * new sequence that nothing else joins) — oversized docs are the
    * chunking operator's job, not the packer's.
    *
    * @return (group STRING, id BIGINT, size BIGINT, seq_id BIGINT) —
    *         seq_id is 0-based per group, in ascending-id order. */
  def nextFit(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      sizeCol: String,
      capacity: Long): DataFrame = {
    require(capacity >= 1, s"capacity must be >= 1 (got $capacity)")
    val spark = df.sparkSession
    import spark.implicits._
    // refuse incomplete rows IN-PLAN, loudly: a NULL id/size would
    // otherwise surface as an opaque encoder error mid-job, and silently
    // dropping rows from a PACKER loses documents from the training set
    def reqNotNull(c: Column, what: String): Column =
      when(c.isNull, raise_error(lit(
        s"Packing.nextFit: NULL $what — pack input must be complete")))
        .otherwise(c)
    val ds = df.select(col(groupCol).cast("string").as("group"),
        reqNotNull(col(idCol).cast("long"), idCol).as("id"),
        reqNotNull(col(sizeCol).cast("long"), sizeCol).as("size"))
      .as[(String, Long, Long)]
    ds.groupByKey(_._1)
      .flatMapSortedGroups($"id") { (g: String, it: Iterator[(String, Long, Long)]) =>
        var bin = 0L
        var fill = 0L
        it.map { case (_, id, sz) =>
          // a negative size (upstream bug) would let a sealed sequence
          // exceed capacity with no error at pack time
          require(sz >= 0,
            s"Packing.nextFit: negative size $sz for id $id in group $g")
          if (fill + sz > capacity && fill > 0) { bin += 1; fill = 0 }
          fill += sz
          (g, id, sz, bin)
        }
      }
      .toDF("group", "id", "size", "seq_id")
  }
}
