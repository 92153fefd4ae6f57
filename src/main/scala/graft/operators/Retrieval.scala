package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextOps

/** Lexical retrieval scoring — Okapi BM25 (Robertson et al., TREC-3) over
  * the whitespace token surface the rest of the text stack uses.
  *
  * The sparse counterpart of the engine's dense KNN serving path: TF-IDF
  * candidate generation already powers `hybrid_search`; BM25 adds the
  * document-length-normalized ranking production lexical search actually
  * runs (tf saturation via k1, length prior via b).
  *
  * Shape at scale: one explode + two hash aggregations over the corpus
  * (tf, df) — both shuffle on `term`, the natural inverted-index
  * partitioning — then an equi-join with the (broadcast) query-term set,
  * so the per-query cost after the corpus stats exist is proportional to
  * the postings of the query's terms, not the corpus. Corpus-level stats
  * (N, avgdl) enter as a 1-row broadcast cross join, not a driver count.
  *
  * Portability: integer tf/df/dl and exact-integer-sum avgdl feed a
  * per-term score rounded to 6 dp, then DECIMAL(18,6)-summed per doc —
  * order-independent and bit-replayable in the DuckDB oracle.
  */
object Retrieval {

  /** BM25 score of every document in `docs` against `queryTerms`.
    *
    * @param docs       corpus: (idCol, textCol); exclude the query doc
    *                   upstream if self-matches are unwanted
    * @param queryTerms single-column DataFrame `term` (deduplicated bag of
    *                   query terms); must be broadcast-small
    * @return (idCol, bm25) for every doc sharing ≥1 term with the query
    */
  def bm25(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: DataFrame,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    val toks = TextOps.tokens(col(textCol))
    val t = docs.select(col(idCol), explode(toks).as("term"))
    val dl = t.groupBy(idCol).agg(count(lit(1)).as("__dl"))
    val stats = dl.agg(
      count(lit(1)).cast("double").as("__n"),
      (sum(col("__dl")).cast("double") / count(lit(1))).as("__avgdl"))
    val tf = t.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val dfc = t.groupBy("term").agg(countDistinct(col(idCol)).as("df"))
    tf.join(broadcast(queryTerms.select(col("term")).distinct()), Seq("term"))
      .join(dfc, Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(stats))
      .withColumn("__ts",
        round(
          log((col("__n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)) *
            (col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl"))),
          6))
      .groupBy(idCol)
      .agg(sum(col("__ts").cast(DecimalType(18, 6))).cast("double").as("bm25"))
  }
}
