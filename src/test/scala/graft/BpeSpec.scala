package graft

import org.apache.spark.sql.functions._

import graft.functions.Bpe

/** Learned BPE: deterministic training, exact detokenization, and real
  * compression vs character-level on the documents corpus. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("training learns the expected merges on a toy corpus, deterministically") {
    val docs = Seq.fill(10)("low lower lowest").toDF("text")
    val m1 = Bpe.train(docs, "text", numMerges = 3)
    val m2 = Bpe.train(docs, "text", numMerges = 3)
    assert(m1.merges === m2.merges)
    // every word contains l-o-w, so the first two merges assemble "low"
    // (tie on count broken lexicographically: (o,w) before (l,ow))
    assert(m1.merges.take(2) === Seq(("o", "w"), ("l", "ow")))
    assert(Bpe.tokenizeWord(m1, "low").head === "low")
  }

  test("tokenization is lossless: concatenated tokens rebuild each word") {
    val docs = graft.queries.table(spark, sf0001, "documents")
    val model = Bpe.train(docs, "text", numMerges = 100, sampleLimit = 200)
    val words = Seq("the", "antique", "chocolate", "xylophone-ish", "a")
    words.foreach { w =>
      val toks = Bpe.tokenizeWord(model, w)
      assert(toks.mkString.stripSuffix(Bpe.Eow) === w, s"word $w -> $toks")
    }
  }

  test("learned merges compress the corpus vs character-level") {
    val docs = graft.queries.table(spark, sf0001, "documents")
    val model = Bpe.train(docs, "text", numMerges = 200, sampleLimit = 500)
    assert(model.merges.size > 50) // natural text has plenty of repeated pairs
    val stats = docs
      .select(Bpe.subwordCount(model)(col("text")).as("n_sub"),
        length(regexp_replace(col("text"), " ", "")).as("n_chars"))
      .agg(sum(col("n_sub")).as("sub"), sum(col("n_chars")).as("chars"))
      .as[(Long, Long)].head()
    // every word is <= chars+1 symbols and merges strictly reduce tokens
    assert(stats._1 < stats._2 / 2, s"subwords=${stats._1} chars=${stats._2}")
  }

  test("train ≡ trainDistributed on tabs, double spaces, nulls, and emoji") {
    // word surface parity: both sides split on LITERAL single space
    // (tabs/newlines stay inside words, double spaces yield dropped
    // empties, null text contributes nothing) and segment words by CODE
    // POINT (an emoji is one symbol, not two UTF-16 surrogates)
    val docs = Seq(
      Some("foo\tbar foo\tbar foo\tbar baz  baz"),
      Some("low low low 😀x 😀x 😀x"),
      Option.empty[String],
      Some("foo\tbar baz low")).toDF("text")
    val driver = Bpe.train(docs, "text", numMerges = 6,
      sampleLimit = Int.MaxValue)
    val dist = Bpe.trainDistributed(docs, "text", numMerges = 6)
      .orderBy("merge_rank")
      .select($"left_sym", $"right_sym")
      .as[(String, String)].collect().toSeq
    assert(dist === driver.merges.take(dist.length))
    // the emoji word tokenizes with the surrogate PAIR intact
    val toks = Bpe.tokenizeWord(driver, "😀x")
    assert(toks.mkString.stripSuffix(Bpe.Eow) === "😀x")
    assert(!toks.exists(t => t.length == 1 && t.charAt(0).isSurrogate))
  }

  test("trainDistributed emits exactly train's merges, in order, with counts") {
    val docs = graft.queries.table(spark, sf0001, "documents")
    // same corpus on both sides: sampleLimit covers the whole table
    val driver = Bpe.train(docs, "text", numMerges = 12,
      sampleLimit = Int.MaxValue)
    val dist = Bpe.trainDistributed(docs, "text", numMerges = 12)
      .orderBy("merge_rank")
      .select($"left_sym", $"right_sym", $"pair_count")
      .as[(String, String, Long)].collect()
    assert(dist.length === 12)
    assert(dist.map(t => (t._1, t._2)).toSeq === driver.merges.take(12))
    // counts strictly positive and the first merge is the global max pair
    assert(dist.forall(_._3 >= 2))
    assert(dist.head._3 === dist.map(_._3).max)
  }

  test("trainDistributed is invariant to input partitioning") {
    val docs = graft.queries.table(spark, sf0001, "documents")
    val a = Bpe.trainDistributed(docs, "text", numMerges = 6)
      .orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect().toSeq
    val b = Bpe.trainDistributed(docs.repartition(13), "text", numMerges = 6)
      .orderBy("merge_rank")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(a === b)
  }

  test("trainDistributed stops where train stops: no sub-2 merges ever emitted") {
    // every pair in this corpus is unique except "ab" (×3): train learns
    // (a,b) then stops at count < 2 — the distributed trainer must emit
    // the same single merge instead of padding with count-1 rows (or
    // wiping state through an empty-argmax cross join)
    val docs = Seq("ab cd ef", "ab gh ij", "ab").toDF("text")
    val driver = Bpe.train(docs, "text", numMerges = 8,
      sampleLimit = Int.MaxValue)
    val dist = Bpe.trainDistributed(docs, "text", numMerges = 8)
      .orderBy("merge_rank")
      .select($"left_sym", $"right_sym", $"pair_count")
      .as[(String, String, Long)].collect().toSeq
    assert(driver.merges === dist.map(t => (t._1, t._2)))
    assert(dist.forall(_._3 >= 2))
    assert(dist.length < 8) // it actually stopped early
  }

  test("applyMergesDistributed equals greedy tokenizeWord on every vocab word") {
    val docs = graft.queries.table(spark, sf0001, "documents")
    val model = Bpe.train(docs, "text", numMerges = 12,
      sampleLimit = Int.MaxValue)
    val got = Bpe.applyMergesDistributed(docs, "text", model.merges)
      .groupBy($"w")
      .agg(org.apache.spark.sql.functions.array_sort(
        org.apache.spark.sql.functions.collect_list(
          org.apache.spark.sql.functions.struct($"p", $"sym"))).as("t"))
      .select($"w", org.apache.spark.sql.functions.transform(
        $"t", x => x.getField("sym")).as("toks"))
      .as[(String, Seq[String])].collect().toMap
    assert(got.nonEmpty)
    got.foreach { case (w, toks) =>
      assert(toks === Bpe.tokenizeWord(model, w), s"word '$w'")
    }
  }
}
