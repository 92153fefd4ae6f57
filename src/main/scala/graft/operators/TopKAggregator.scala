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

  /** Insert into a descending-sorted, k-bounded buffer in O(k). */
  def insert(buf: List[Entry], e: Entry, k: Int): List[Entry] = {
    def better(a: Entry, b: Entry): Boolean =
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
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
    * emit exploded (group, id, score, rank) rows. */
  def topK(df: DataFrame, groupCol: String, idCol: String, scoreCol: String,
      k: Int): DataFrame = {
    requireIntegralId(df, idCol, "TopKAggregator.topK")
    val topkUdaf = udaf(aggregator(k))
    df.groupBy(col(groupCol))
      .agg(topkUdaf(col(idCol).cast("long"), col(scoreCol).cast("double")).as("topk"))
      .select(col(groupCol),
        posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(col(groupCol), col("entry._1").as(idCol),
        col("entry._2").as(scoreCol), (col("pos") + 1).as("rank"))
  }
}
