package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Real byte-pair encoding (Sennrich et al., "Neural Machine Translation
  * of Rare Words with Subword Units", ACL 2016) — the learned-merges
  * upgrade over the regex chunker behind `text_bpe_tokens`.
  *
  * Spark shape mirrors how production tokenizers are actually built:
  * merge rules are TRAINED driver-side on a bounded corpus sample (pair
  * counting over the word-frequency table — HF/SentencePiece train on
  * samples too; the loop is O(merges · vocab · wordLen), milliseconds at
  * these sizes), then APPLIED distributed as one UDF pass with the rule
  * table broadcast — the same frozen-model/broadcast-apply pattern as
  * centroids and PQ codebooks. Training is deterministic: ties on pair
  * count break lexicographically.
  */
object Bpe {

  /** End-of-word marker (keeps merges from crossing word boundaries and
    * makes detokenization exact). */
  val Eow = "</w>"

  /** Merge rules in priority order, e.g. ("t","h") then ("th","e"). */
  final case class Model(merges: Seq[(String, String)]) {
    /** rank map for fast apply */
    @transient lazy val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  private def wordSymbols(w: String): Vector[String] =
    w.map(_.toString).toVector :+ Eow

  /** Learn `numMerges` merge rules from the word-frequency table of a
    * bounded text sample. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      sampleLimit: Int = 2048): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val texts = docs.select(col(textCol).cast("string"))
      .limit(sampleLimit).as[String].collect()
    val wordFreq = scala.collection.mutable.HashMap.empty[String, Long]
    texts.foreach(_.split("\\s+").foreach { w =>
      if (w.nonEmpty) wordFreq(w) = wordFreq.getOrElse(w, 0L) + 1L
    })
    var vocab: Vector[(Vector[String], Long)] =
      wordFreq.toVector.sortBy(_._1).map { case (w, n) => (wordSymbols(w), n) }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.maxBy { case ((a, b), n) => (n, a, b) } // det. tie-break
        if (best._2 < 2) done = true // nothing repeats — no signal left
        else {
          val (a, b) = best._1
          merges += ((a, b))
          val ab = a + b
          vocab = vocab.map { case (syms, n) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                out += ab; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), n)
          }
        }
      }
      round += 1
    }
    Model(merges.result())
  }

  /** Tokenize one word with the learned merges (greedy lowest-rank-first,
    * the standard BPE apply). */
  def tokenizeWord(model: Model, w: String): Seq[String] = {
    var syms = wordSymbols(w)
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        model.rank.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) continue = false
      else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
        syms.drop(bestAt + 2)
    }
    syms
  }

  /** Distributed apply: text column → learned subword tokens. The model
    * rides the closure as a broadcast-sized constant (merge table,
    * ~numMerges strings). */
  def tokenizeUdf(model: Model) = udf { (text: String) =>
    if (text == null) Seq.empty[String]
    else text.split("\\s+").toSeq.filter(_.nonEmpty)
      .flatMap(w => tokenizeWord(model, w))
  }

  def subwordCount(model: Model)(text: Column): Column =
    size(tokenizeUdf(model)(text))
}
