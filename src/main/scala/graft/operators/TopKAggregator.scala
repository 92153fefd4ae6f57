package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed bounded top-k aggregator (SURVEY.md §2 A4): the algebraic form of
  * per-group top-k. Each map-side partial reduces to at most k (id, score)
  * pairs and buffers merge associatively — exactly the reference's
  * partition-top-n → hierarchical merge (neighborhood_server.py:209-226 +
  * nearest_neighbor_client.py:62-72) as a Spark `Aggregator`, so the
  * shuffle carries ≤ k entries per group per map partition.
  *
  * Versus the window/group-limit plan ([[Knn.topKPerGroup]]): the window
  * sorts within each group; this keeps only a k-bounded buffer. Use it
  * when k ≪ group size; the window form when the ranked prefix itself is
  * wanted. Ordering: descending score, ascending id tiebreak (the
  * engine's KNN contract, SURVEY.md §2.6).
  */
object TopKAggregator {

  type Entry = (Long, Double) // (id, score)

  /** Insert into a descending-sorted, k-bounded buffer in O(k).
    * Double.compare, not raw >/== — raw float comparison is not a total
    * order under NaN (NaN==NaN is false, so two NaN scores never resolve
    * their id tiebreak and an all-NaN buffer rejects every finite
    * entry), while Double.compare matches Spark's own sort semantics
    * exactly (NaN greatest, -0.0 < 0.0) — the bit-parity contract with
    * the window plan. */
  def insert(buf: List[Entry], e: Entry, k: Int): List[Entry] = {
    def better(a: Entry, b: Entry): Boolean = {
      val c = java.lang.Double.compare(a._2, b._2)
      c > 0 || (c == 0 && a._1 < b._1)
    }
    if (buf.lengthCompare(k) >= 0 && !better(e, buf.last)) buf
    else {
      val (hi, lo) = buf.span(better(_, e))
      (hi ::: e :: lo).take(k)
    }
  }

  def aggregator(k: Int): Aggregator[Entry, List[Entry], Seq[Entry]] =
    new Aggregator[Entry, List[Entry], Seq[Entry]] {
      override def zero: List[Entry] = Nil
      override def reduce(buf: List[Entry], e: Entry): List[Entry] =
        insert(buf, e, k)
      override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
        b.foldLeft(a)((acc, e) => insert(acc, e, k))
      override def finish(buf: List[Entry]): Seq[Entry] = buf
      override def bufferEncoder: Encoder[List[Entry]] =
        ExpressionEncoder[List[Entry]]()
      override def outputEncoder: Encoder[Seq[Entry]] =
        ExpressionEncoder[Seq[Entry]]()
    }

  /** DataFrame form with real partial aggregation: group by `groupCol`,
    * emit exploded (group, id, score, rank) rows. Rows with a null id or
    * null score are EXCLUDED (the primitive (Long, Double) buffer cannot
    * rank them); the window form ranks null scores last instead — the
    * two differ only when a group has fewer than k non-null rows.
    * k <= 0 returns the empty result the window form's rank filter
    * produces, instead of throwing from the first insert. */
  def topK(df: DataFrame, groupCol: String, idCol: String, scoreCol: String,
      k: Int): DataFrame = {
    requireIntegralId(df, idCol, "TopKAggregator.topK")
    if (k <= 0)
      return df.select(col(groupCol), col(idCol).cast("long").as(idCol),
        col(scoreCol).cast("double").as(scoreCol), lit(1).as("rank")).limit(0)
    val topkUdaf = udaf(aggregator(k))
    df.filter(col(idCol).isNotNull && col(scoreCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(topkUdaf(col(idCol).cast("long"), col(scoreCol).cast("double")).as("topk"))
      .select(col(groupCol),
        posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(col(groupCol), col("entry._1").as(idCol),
        col("entry._2").as(scoreCol), (col("pos") + 1).as("rank"))
  }
}
