package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.TextOps

/** Corpus-statistics document scoring for training-data curation — the two
  * model-based quality signals a CCNet/DSIR-style pipeline runs after the
  * rule-based gates (Gopher rules, `text_gopher`) and before sampling:
  *
  *  - [[unigramCrossEntropy]]: perplexity-style fluency scoring against a
  *    unigram LM estimated from the corpus itself (the Spark-native stand-in
  *    for CCNet's KenLM stage — same selection semantics, model order 1, no
  *    external model artifact);
  *  - [[dsirLogWeights]]: hashed n-gram importance weights log
  *    p_target(doc)/p_raw(doc) (Xie et al. 2023, "Data Selection for
  *    Language Models via Importance Resampling"), for resampling a raw
  *    corpus toward a target domain.
  *
  * Float determinism: every per-token/per-feature log term is rounded to
  * 6 dp and accumulated in DECIMAL(18,6) — exact, order-independent — so
  * results are bit-stable across shuffles and reproducible by the DuckDB
  * oracles (`text_unigram_ppl`, `text_dsir`). `ln` itself carries no
  * cross-engine correctly-rounded guarantee; rounding to 6 dp absorbs the
  * ≤1-ulp divergence except on measure-zero boundary ties.
  */
object TextScoring {

  private def decSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Per-document cross-entropy (nats/token) under the corpus MLE unigram
    * LM: H(d) = −(1/|d|) Σ_t ln(count(t)/N). Lower = more stereotypical
    * text; the top tail is gibberish/rare-vocab, the bottom tail is
    * boilerplate — both standard cut points.
    *
    * No smoothing: the model is estimated on the same corpus it scores, so
    * every scored token has count ≥ 1. (Scoring a FOREIGN corpus against
    * these counts needs the +1 floor of [[dsirLogWeights]].)
    *
    * Scale shape: one explode (linear in corpus tokens), one groupBy on the
    * token (vocab-sized, partial-aggregated map-side), one equi-join of
    * tokens against that vocab table — AQE broadcasts it when the vocab is
    * small — and one groupBy on the doc id. The corpus total N rides along
    * as a 1-row broadcast crossJoin, not a driver collect. */
  def unigramCrossEntropy(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // Scan-count posture (r17, priced by the bench fingerprint and kept
    // DELIBERATELY): this shape pays 2 pruned scans + 2 tokenizes but
    // its only exchanges are vocab-sized and doc-sized partial aggs.
    // The bm25-style collapse to one scan (score from per-doc tf) was
    // built, measured, and REVERTED: it introduces a distinct-(id,tok)
    // corpus exchange that did not exist (shuffle_mb 0.03 -> 1.18 at
    // sf0.1) — trading a map-local re-tokenize, which scales linearly
    // across executors, for network+disk+sort. Minimize shuffles wins.
    val toks = docs.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("__c"))
    // N derives from the vocab-sized table (sum of exact counts ≡ the
    // corpus token count) — aggregating toks directly would tokenize and
    // explode the whole corpus a second time
    val total = vocab.agg(sum(col("__c")).as("__N"))
    toks.join(vocab, Seq("tok"))
      .crossJoin(broadcast(total))
      .withColumn("__nll",
        round(-log(col("__c").cast("double") / col("__N").cast("double")), 6))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"), decSum(col("__nll")).as("__s"))
      // FLOOR-quantized mean (the emb_dim_stats lesson): the exact-decimal
      // sum ÷ count can land on a .xxxxx5 boundary where Spark's decimal
      // HALF_UP and DuckDB's double-value ROUND disagree (hit at sf0.1 in
      // the bigram twin) — floor of the identical double is engine-exact
      .select(col("id"), col("n_tokens"),
        (floor(col("__s").cast("double") / col("n_tokens") * 1e6) / 1e6)
          .as("cross_entropy"))
  }

  /** Per-document cross-entropy (nats/bigram) under an interpolated bigram
    * LM estimated from the corpus: each adjacent pair (w₁,w₂) contributes
    * −ln(λ·c(w₁w₂)/c(w₁·) + (1−λ)·c(w₂)/N) — Jelinek-Mercer smoothing, so
    * the score is defined even for bigrams never seen with that history
    * (the unigram floor carries them). Order-2 context separates fluent
    * text from shuffled-token gibberish that a unigram model scores
    * identically.
    *
    * Docs with fewer than 2 tokens have no bigrams and are omitted —
    * length gates (`text_gopher`) own that regime.
    *
    * Scale shape: bigrams are built SCAN-LOCALLY from the token array
    * (transform over the array — no positional self-join); three
    * vocab-sized count tables meet the stream in equi-joins (AQE
    * broadcasts the small ones), one final groupBy per doc. Same
    * rounded-term DECIMAL accumulation as [[unigramCrossEntropy]]. */
  def bigramCrossEntropy(docs: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.75): DataFrame = {
    // Deliberately NOT spreadToCluster'd (r19): repartitioning (id,
    // text) before the three tokenize passes made them 32-wide but
    // inflated total task CPU ~12× (tokenize is allocation-bound;
    // parallel copies contend on memory bandwidth) with no reliable
    // wall win — the serial ~0.4 cpu-s per pass is the honest cost at
    // this corpus size, and a real corpus arrives already split.
    // Scan-count posture (r17): same priced revert as
    // [[unigramCrossEntropy]] — the per-doc-pair collapse shipped the
    // ENTIRE bigram stream through a new exchange (bigrams rarely
    // repeat within a doc: shuffle_mb 0.05 -> 4.93 at sf0.1) to save
    // map-local re-tokenizes. Re-derivation is the cheaper plan.
    val toks = docs.select(col(idCol).as("id"),
      explode(TextOps.tokens(col(textCol))).as("tok"))
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("__cu"))
    // N from the vocab table, cw1 from the bigram-count table below —
    // each derived total saves one full corpus tokenize+explode pass
    val total = uni.agg(sum(col("__cu")).as("__N"))
    val bi = docs
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .filter(size(col("__toks")) >= 2)
      .select(col(idCol).as("id"), explode(expr(
        """transform(sequence(0, size(__toks) - 2),
           i -> struct(__toks[i] AS w1, __toks[i + 1] AS w2))""")).as("bg"))
      .select(col("id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val cb = bi.groupBy("w1", "w2").agg(count(lit(1)).as("__cb"))
    val cw1 = cb.groupBy("w1").agg(sum(col("__cb")).as("__cw1"))
    bi.join(cb, Seq("w1", "w2"))
      .join(cw1, Seq("w1"))
      .join(uni.withColumnRenamed("tok", "w2"), Seq("w2"))
      .crossJoin(broadcast(total))
      .withColumn("__nll", round(-log(
        lit(lambda) * (col("__cb").cast("double") / col("__cw1").cast("double")) +
        lit(1.0 - lambda) * (col("__cu").cast("double") / col("__N").cast("double"))), 6))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"), decSum(col("__nll")).as("__s"))
      // FLOOR-quantized mean — same tie-boundary rationale as the unigram
      // twin above (2 of 5000 docs diverged at sf0.1 with round())
      .select(col("id"), col("n_bigrams"),
        (floor(col("__s").cast("double") / col("n_bigrams") * 1e6) / 1e6)
          .as("cross_entropy"))
  }

  /** PMI formula text shared with the `text_pmi` oracle — `cab`/`ca`/`cb`
    * are BIGINT counts, `t1`/`t2` DOUBLE totals, so every division is the
    * same BIGINT⊘DOUBLE op in both engines and the parse is identical. */
  val PmiExprSql: String = "round(ln(((cab / t2) * (t1 / ca)) * (t1 / cb)), 6)"

  /** Collocation mining: pointwise mutual information over ADJACENT word
    * pairs, PMI = ln(p(a,b) / (p(a)p(b))) with unigram probabilities from
    * the token stream and bigram probabilities from the adjacent-pair
    * stream. High-PMI pairs are multiword expressions ("new york") —
    * phrase-vocabulary induction for tokenizers, stop-phrase lists, and
    * the feature stage in front of [[dsirLogWeights]]-style hashing.
    * `minCount` gates the long noise tail (a pair seen twice has huge
    * PMI variance).
    *
    * Scale shape: bigrams are built scan-locally from the token array
    * (no self-join on position); two map-side-combined groupBys + two
    * 1-row broadcast totals; the count filter runs before the join
    * fan-in. Output is (w1, w2, cab, pmi), unranked — callers top-k it. */
  def pmiPairs(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long = 5L): DataFrame = {
    val toks = docs.select(explode(TextOps.tokens(col(textCol))).as("tok"))
    val cu = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    // totals derive from the count tables (vocab-sized), not from
    // re-exploding the corpus
    val t1 = cu.agg(sum(col("c")).cast("double").as("t1"))
    val bi = docs
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .filter(size(col("__toks")) >= 2)
      .select(explode(expr(
        """transform(sequence(0, size(__toks) - 2),
           i -> struct(__toks[i] AS w1, __toks[i + 1] AS w2))""")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      // explicit null filters: the scoring branch's joins infer
      // isnotnull(w1)/isnotnull(w2) below cabAll while the t2 total
      // branch does not — the subtrees stopped being canonically equal
      // and the corpus was re-scanned + re-tokenized for the total
      // (scan-count sweep, r17; vacuous filters — transform over a
      // non-null token array never yields null pair members)
      .filter(col("w1").isNotNull && col("w2").isNotNull)
    val cabAll = bi.groupBy("w1", "w2").agg(count(lit(1)).as("cab"))
    val t2 = cabAll.agg(sum(col("cab")).cast("double").as("t2"))
    cabAll
      .filter(col("cab") >= minCount)
      .join(cu.select(col("tok").as("w1"), col("c").as("ca")), Seq("w1"))
      .join(cu.select(col("tok").as("w2"), col("c").as("cb")), Seq("w2"))
      .crossJoin(broadcast(t1)).crossJoin(broadcast(t2))
      .withColumn("pmi", expr(PmiExprSql))
      .select("w1", "w2", "cab", "pmi")
  }

  /** DSIR importance log-weights: features are the document's DISTINCT word
    * bigrams hashed into `numBuckets` buckets on the portable 64-bit stack
    * (distinct n-grams, COUNTED per bucket after hashing — two distinct
    * shingles landing in one bucket both contribute, so the per-doc
    * feature vector is a hashed multinomial, not strictly binary; docs
    * shorter than n contribute their whole text as one feature, the
    * shingle udf's documented fallback); each feature contributes
    * ln(p̂_target(b)/p̂_raw(b)) with add-one smoothing over the bucket space,
    * and the document's weight is the rounded-term sum. Resample the raw
    * corpus with probability ∝ exp(log_weight) to shift it toward the
    * target distribution.
    *
    * @param raw     corpus to score (idCol, textCol)
    * @param target  exemplar slice of the wanted domain (textCol); usually
    *                tiny next to `raw`, so its bucket histogram — at most
    *                `numBuckets` rows regardless of size — broadcasts.
    *
    * Scale shape: both sides explode linearly to (doc, bucket); histograms
    * are ≤ numBuckets rows each, so the per-feature log-ratio table is a
    * broadcast join against the exploded raw side; one final groupBy on the
    * doc id. Nothing n² anywhere. */
  def dsirLogWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, n: Int = 2, numBuckets: Int = 1024): DataFrame = {
    def feats(df: DataFrame, cols: Column*) = df
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .select(cols :+
        explode(TextOps.portableHashedShinglesUdf(n)(col("__toks"))).as("__h"): _*)
      .withColumn("b", pmod(col("__h"), lit(numBuckets.toLong)))
      .drop("__h")
    val rawF = feats(raw, col(idCol).as("id"))
    val tgtF = feats(target)
    val cRaw = rawF.groupBy("b").agg(count(lit(1)).as("__cr"))
    val cTgt = tgtF.groupBy("b").agg(count(lit(1)).as("__ct"))
    // totals DERIVE from the bucket histograms (Σ counts ≡ the feature
    // count, exact in longs) — each derived total removes a full
    // scan+tokenize+shingle pass over its side, and the histograms'
    // numBuckets-sized exchanges already exist, so this passes the r17
    // existing-exchange rule (scan-count sweep: 5 → 3 scans, no new
    // exchange). The apply branch stays its own scan deliberately:
    // collapsing it would INTRODUCE a corpus-sized (id, b) exchange —
    // the exact trade the unigram/bigram reverts priced out.
    val nRaw = cRaw.agg(coalesce(sum(col("__cr")), lit(0L)).as("__nr"))
    val nTgt = cTgt.agg(coalesce(sum(col("__ct")), lit(0L)).as("__nt"))
    val ratios = cRaw.join(cTgt, Seq("b"), "left")
      .na.fill(0L, Seq("__ct"))
      .crossJoin(broadcast(nTgt)).crossJoin(broadcast(nRaw))
      .withColumn("__lr", round(log(
        ((col("__ct") + 1).cast("double") / (col("__nt") + numBuckets).cast("double")) /
        ((col("__cr") + 1).cast("double") / (col("__nr") + numBuckets).cast("double"))), 6))
      .select("b", "__lr")
    rawF.join(broadcast(ratios), Seq("b"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_feats"), decSum(col("__lr")).as("__s"))
      .select(col("id"), col("n_feats"),
        round(col("__s"), 6).as("log_weight"))
  }
}
