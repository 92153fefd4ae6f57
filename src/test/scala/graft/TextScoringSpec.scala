package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextScoring}
import graft.queries.table

class TextScoringSpec extends SparkSpec {
  import spark.implicits._

  test("unigram cross-entropy: common-token docs score below rare-token docs") {
    val docs = Seq(
      (1L, "the the the the the"), // all high-frequency tokens
      (2L, "the the the the zzzq"), // one rare token
      (3L, "zzzq qqxz jjvw kkpy wwzz") // all singletons
    ).toDF("doc_id", "text")
    val got = TextScoring.unigramCrossEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._2).toSeq === Seq(5L, 5L, 5L))
    assert(got(0)._3 < got(1)._3)
    assert(got(1)._3 < got(2)._3)
    // doc 1: every token is 'the' with count 9 of 15 → H = -ln(9/15)
    assert(math.abs(got(0)._3 - (-math.log(9.0 / 15.0))) < 1e-5)
    // order-independence: same result from a different layout
    val again = TextScoring.unigramCrossEntropy(docs.repartition(7), "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(again.toSeq === got.toSeq)
  }

  test("bigram cross-entropy: fluent order scores below shuffled tokens") {
    // same token multiset, different order: the unigram model cannot tell
    // them apart, the bigram model must. A corpus of many fluent copies
    // establishes the bigram statistics; one shuffled doc is the outlier.
    val fluent = "the cat sat on the mat"
    val docs = ((1L to 9L).map(i => (i, fluent)) :+
      (10L, "mat the on sat cat the")).toDF("doc_id", "text")
    val got = TextScoring.bigramCrossEntropy(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.length === 10)
    assert(got.map(_._2).forall(_ === 5L)) // 6 tokens → 5 bigrams each
    val fluentH = got.filter(_._1 <= 9L).map(_._3)
    val shuffledH = got.last._3
    assert(fluentH.forall(_ < shuffledH),
      s"fluent ${fluentH.head} !< shuffled $shuffledH")
    // short docs (<2 tokens) are omitted, not errored
    val withShort = docs.union(Seq((11L, "one")).toDF("doc_id", "text"))
    assert(TextScoring.bigramCrossEntropy(withShort, "doc_id", "text")
      .count() === 10)
  }

  test("dsir: target-like docs get higher log-weights than off-target docs") {
    val docs = table(spark, sf0001, "documents")
    val target = docs.filter($"lang" === "en")
    val got = TextScoring.dsirLogWeights(docs, target, "doc_id", "text")
      .join(docs.select(col("doc_id").as("id"), col("lang")), Seq("id"))
    val byLang = got.groupBy("lang")
      .agg(avg($"log_weight").as("w"))
      .as[(String, Double)].collect().toMap
    // English (the target domain) must dominate every other language
    assert(byLang.keySet.contains("en"))
    (byLang - "en").foreach { case (lang, w) =>
      assert(byLang("en") > w, s"en ${byLang("en")} !> $lang $w")
    }
    // weights are layout-stable (exact decimal accumulation)
    val a = TextScoring.dsirLogWeights(docs, target, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    val b = TextScoring.dsirLogWeights(docs.repartition(13), target, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(a === b)
  }

  test("chunk dedup: shared boilerplate drops once, first occurrence survives") {
    val boiler = "one two three four five six seven eight nine ten" // exactly 10 tokens
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, s"$boiler lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (3L, "entirely distinct words without any shared chunk content at all")
    ).toDF("doc_id", "text")
    val got = Dedup.dropRepeatedChunks(docs, "doc_id", "text", chunkTokens = 10)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    // doc 1 keeps both chunks (it owns the first boilerplate occurrence)
    assert(got(0) === ((1L, 2L, 2L,
      s"$boiler alpha beta gamma delta epsilon zeta eta theta iota kappa")))
    // doc 2 loses the boilerplate chunk, keeps its unique tail
    assert(got(1) === ((2L, 2L, 1L,
      "lambda mu nu xi omicron pi rho sigma tau upsilon")))
    // doc 3 untouched
    assert(got(2)._3 === 1L && got(2)._4 === docs.filter($"doc_id" === 3)
      .select("text").as[String].head())
    // a full duplicate of doc 3 empties out
    val withDup = docs.union(Seq((4L,
      "entirely distinct words without any shared chunk content at all"))
      .toDF("doc_id", "text"))
    val d4 = Dedup.dropRepeatedChunks(withDup, "doc_id", "text", chunkTokens = 10)
      .filter($"id" === 4L).as[(Long, Long, Long, String)].head()
    assert(d4._3 === 0L && d4._4 === "")
  }

  test("winnow candidates: shared long runs pair, disjoint texts do not") {
    val shared = "the quick brown fox jumps over the lazy dog today"
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta epsilon"),
      (2L, s"unrelated prefix text $shared and a different suffix"),
      (3L, "completely different content with no overlap at all here"),
      (4L, "another disjoint document about something else entirely")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowCandidates(docs, "doc_id", "text")
      .as[(Long, Long, Long)].collect().toSeq
    // the 49-char shared run is far over the k+w-1 = 23 guarantee
    assert(pairs.exists(p => p._1 === 1L && p._2 === 2L))
    // docs 3 and 4 share no common substring anywhere near gram length
    assert(!pairs.exists(p => (p._1, p._2) === (3L, 4L)))
  }

  test("winnow candidates: boilerplate fingerprint cap drops degenerate fps") {
    // 60 docs all sharing one long boilerplate run: every fingerprint of
    // that run appears in 60 > maxDocsPerFp docs and must be dropped,
    // leaving no pairs at all
    val boiler = "this exact licence header appears verbatim in every file"
    val docs = (1L to 60L).map(i => (i, s"doc number $i $boiler")).toDF("doc_id", "text")
    val pairs = Dedup.winnowCandidates(docs, "doc_id", "text",
      k = 8, w = 16, maxDocsPerFp = 50)
    // pair space is bounded: nothing survives the cap except fingerprints
    // from the short distinct prefixes, which share no 8-gram
    assert(pairs.count() === 0)
    // raising the cap restores the pairs
    val uncapped = Dedup.winnowCandidates(docs, "doc_id", "text",
      k = 8, w = 16, maxDocsPerFp = 100)
    assert(uncapped.count() > 0)
  }

  test("PMI: a planted collocation outranks independent co-occurrences") {
    // 'new york' always adjacent; 'red'/'blue' frequent but independently
    // placed — the collocation's PMI must dominate
    val rnd = new scala.util.Random(5)
    val fill = Array("red", "blue", "green", "cat", "dog", "sun", "sky", "run")
    val docs = (1L to 80L).map { i =>
      val words = Array.fill(10)(fill(rnd.nextInt(fill.length))).toBuffer
      words.insertAll(rnd.nextInt(8), Seq("new", "york"))
      (i, words.mkString(" "))
    }.toDF("doc_id", "text")
    val top = TextScoring.pmiPairs(docs, "doc_id", "text", minCount = 5L)
      .orderBy(desc("pmi"), asc("w1"), asc("w2"))
      .select("w1", "w2").as[(String, String)].head()
    assert(top === (("new", "york")), s"collocation not top: $top")
  }

  test("PMI: pairs under minCount are gated out; PMI sign is sane") {
    val docs = Seq(
      (1L, "rare pair common common common common"),
      (2L, "common common common common common common"),
      (3L, "common common rare pair common common"))
      .toDF("doc_id", "text")
    val all = TextScoring.pmiPairs(docs, "doc_id", "text", minCount = 1L)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    // 'rare pair' occurs twice, always adjacent → strongly positive PMI;
    // 'common common' is the independence baseline → near zero or below
    assert(all(("rare", "pair"))._2 > 1.0)
    assert(all(("rare", "pair"))._2 > all(("common", "common"))._2)
    val gated = TextScoring.pmiPairs(docs, "doc_id", "text", minCount = 3L)
      .select("w1", "w2").as[(String, String)].collect().toSet
    assert(!gated.contains(("rare", "pair")), "minCount gate failed")
  }
}
