package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** One-call corpus preparation: the end-to-end chain a training-data
  * pipeline runs over a raw document table —
  *
  *   exact dedup → near-dup removal (MinHash-LSH pairs → connected
  *   components, keep each cluster's min-id doc) → optional benchmark
  *   decontamination (n-gram overlap vs an eval corpus) → quality gate
  *   (Gopher-style rules) → deterministic train/valid/test split →
  *   per-(split, language) token-budget shard packing.
  *
  * Every stage is one of the individually-tested operators; this wires
  * them in the canonical order (dedup before quality: a near-dup cluster
  * should survive as ONE doc even if some members fail quality later;
  * split before pack: shards never straddle splits). Scale shape is the
  * sum of its parts — hash shuffles and banded LSH joins only, no pair
  * space, no driver materialization beyond Components' bounded state.
  */
object CorpusPrep {

  /** Tuning knobs, defaulted to the declared-query parameters. */
  final case class Config(
      shingleSize: Int = 3,
      numBands: Int = 8,
      rowsPerBand: Int = 4,
      jaccardThreshold: Double = 0.5,
      minWords: Int = 20,
      maxWords: Int = 100000,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      minAlphaRatio: Double = 0.8,
      minStopHits: Int = 2,
      stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "with"),
      decontamNgram: Int = 5,
      chunkDedupTokens: Int = 0, // >0 enables C4-style span removal
      phashMaxHamming: Int = 6,  // used when a media payload col is given
      phashNumBands: Int = 8,
      ragChunkWin: Int = 0,      // >0 enables strided RAG chunk output
      ragChunkStride: Int = 0,   // required 1..ragChunkWin when enabled
      trainNum: Int = 8,
      validNum: Int = 1,
      splitDenom: Int = 10,
      splitSeed: Long = 1L,
      tokensPerShard: Long = 2000L,
      packNextFit: Boolean = false, // capacity-BOUNDED shards via Packing.nextFit
      packSubGroups: Int = 1) // >1: hash-split each (split, lang) into N
                              // independently-packed sub-groups — the
                              // parallelism knob for few-language corpora

  /** Run the chain. Returns `(idCol, langCol, textCol, n_tokens, split,
    * shard_id)` — one row per surviving document, shard-packed within
    * each (split, language) group.
    *
    * Optional stages:
    *  - `mediaPayloadCol`: docs carrying a binary media payload
    *    additionally dedup PERCEPTUALLY — dHash64 the payload, band-join
    *    near-identical signatures ([[Dedup.hamming64Pairs]]), keep each
    *    transitive cluster's min-id doc, exactly the text near-dup
    *    contract. Undecodable payloads never pair (null hash) and pass
    *    through.
    *  - `cfg.ragChunkWin > 0`: the output grain becomes RETRIEVAL CHUNKS —
    *    each surviving doc explodes into `ragChunkWin`-token windows every
    *    `ragChunkStride` tokens ([[graft.functions.TextOps.chunkStride]])
    *    BEFORE shard packing, so shard token budgets measure the tokens
    *    actually emitted; output gains a `chunk_no` column, `textCol`
    *    holds the chunk text and `n_tokens` the chunk's token count. */
  def prepare(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      langCol: String,
      cfg: Config = Config(),
      evalDocs: Option[DataFrame] = None,
      mediaPayloadCol: Option[String] = None): DataFrame = {
    // 1. exact dedup (min id survives per identical text)
    val exact = Dedup.dropExactDuplicates(docs, idCol, textCol)

    // 2. near-dup removal: transitive clusters keep their min-id member
    val pairs = Dedup.minhashPairs(exact, idCol, textCol,
      cfg.shingleSize, cfg.numBands, cfg.rowsPerBand, cfg.jaccardThreshold)
    val cc = Components.connectedComponentsAuto(pairs, "left_id", "right_id")
    val dropIds = cc.filter(col("id") =!= col("component")).select(col("id").as(idCol))
    val textDeduped = exact.join(dropIds, Seq(idCol), "left_anti")

    // 2p. optional perceptual near-dup removal: same cluster-keep-min
    // contract as the text stage, over dHash64 of the media payload —
    // banded 64-bit signature join, never a pair scan
    val nearDeduped = mediaPayloadCol match {
      case Some(pc) =>
        val sig = textDeduped
          .select(col(idCol), Multimodal.dHashUdf(col(pc)).as("__ph"))
          .filter(col("__ph").isNotNull)
        val ppairs = Dedup.hamming64Pairs(sig, idCol, "__ph",
          cfg.phashMaxHamming, cfg.phashNumBands)
        val pcc = Components.connectedComponentsAuto(ppairs, "left_id", "right_id")
        val pdrop = pcc.filter(col("id") =!= col("component"))
          .select(col("id").as(idCol))
        textDeduped.join(pdrop, Seq(idCol), "left_anti")
      case None => textDeduped
    }

    // 2b. optional decontamination: drop any doc sharing an n-gram with
    // the benchmark/eval corpus — a tainted doc is tainted in every
    // split, so this runs before the split assignment
    val decontaminated = evalDocs match {
      case Some(ev) =>
        Dedup.decontaminate(nearDeduped, ev, idCol, textCol, cfg.decontamNgram)
      case None => nearDeduped
    }

    // 2c. optional sub-document chunk dedup (the C4 span-removal stage):
    // rewrite every doc from its globally-first-occurrence chunks; docs
    // emptied out (pure boilerplate) drop here, BEFORE the quality gate
    // re-measures the rewritten text
    val spanDeduped =
      if (cfg.chunkDedupTokens <= 0) decontaminated
      else {
        val r = Dedup.dropRepeatedChunks(
          decontaminated, idCol, textCol, cfg.chunkDedupTokens)
        decontaminated.withColumn("__cid", col(idCol).cast("long"))
          .join(r.filter(col("n_kept") > 0)
            .select(col("id").as("__cid"), col("text_deduped")), Seq("__cid"))
          .drop(textCol, "__cid")
          .withColumnRenamed("text_deduped", textCol)
      }

    // 3. Gopher-style quality gate (same thresholds as the text_gopher query)
    val toks = TextOps.tokens(col(textCol))
    val gated = spanDeduped
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("__mean", TextOps.avgTokenLength(col(textCol)))
      .withColumn("__alpha",
        size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double") / size(toks))
      .withColumn("__stop", size(filter(toks, t => t.isInCollection(cfg.stopwords))))
      .filter(col("n_tokens").between(cfg.minWords, cfg.maxWords) &&
        col("__mean").between(cfg.minMeanWordLen, cfg.maxMeanWordLen) &&
        col("__alpha") > cfg.minAlphaRatio &&
        col("__stop") >= cfg.minStopHits)

    // 4. deterministic portable split — stable across layout and re-ingest
    val bucket = Sampling.portableSplitBucket(
      col(idCol).cast("long"), cfg.splitSeed, cfg.splitDenom)
    val split = gated.withColumn("split",
      when(bucket < cfg.trainNum, "train")
        .when(bucket < cfg.trainNum + cfg.validNum, "valid")
        .otherwise("test"))

    // 4b. optional RAG chunking: explode surviving docs into strided
    // windows BEFORE packing, so shard budgets count the tokens that
    // will actually ship; chunk grain carries (doc id, chunk_no)
    val unit =
      if (cfg.ragChunkWin <= 0) split
      else {
        val ch = TextOps.chunkStride(
            split.select(col(idCol), col(textCol)),
            idCol, textCol, cfg.ragChunkWin, cfg.ragChunkStride)
          .select(col(idCol), col("chunk_no"),
            col("chunk_text").as("__chunk"))
        split.drop(textCol).drop("n_tokens")
          .join(ch, Seq(idCol))
          .withColumn(textCol, col("__chunk")).drop("__chunk")
          .withColumn("n_tokens", size(TextOps.tokens(col(textCol))).cast("long"))
      }

    // 5. pack into token-budget shards per (split, language). Parallelism
    // contract: each group's running sum funnels through ONE task — fine
    // when #(split × language) groups is large, but a MONOLINGUAL corpus
    // has ~3 groups and would sort its whole train split (text column
    // included) in one reducer. packSubGroups > 1 is the knob for that
    // shape: ids hash-split each group into N independently-packed
    // sub-groups (shard ids interleave so they stay globally unique, and
    // shard token budgets still hold per shard; the cost is up to N−1
    // partially-filled shards per group). packNextFit = capacity-BOUNDED
    // shards (no multi-doc shard exceeds the budget — the
    // trainer-sequence contract) via the next-fit walk; the default
    // offset-derived shards are cheaper (pure window, no typed scan) but
    // may straddle the budget at doc boundaries.
    require(cfg.packSubGroups >= 1,
      s"packSubGroups must be >= 1 (got ${cfg.packSubGroups})")
    val sub =
      if (cfg.packSubGroups == 1) lit(0L)
      else pmod(xxhash64(col(idCol)), lit(cfg.packSubGroups.toLong))
    val orderCols =
      if (cfg.ragChunkWin <= 0) Seq(col(idCol)) else Seq(col(idCol), col("chunk_no"))
    val packed =
      if (cfg.packNextFit) {
        require(cfg.ragChunkWin <= 0,
          "packNextFit packs at document grain; chunk grain uses offset shards")
        // injective key — concat_ws would merge ("train", NULL) with
        // ("train", "") and let a '|' inside lang fuse distinct groups,
        // silently interleaving packing across shards (round-8 advice)
        val withGrp = unit
          .withColumn("__sub", sub)
          .withColumn("__grp",
            Packing.groupKey(col("split"), col(langCol), col("__sub")))
        val assign = Packing.nextFit(withGrp, "__grp", idCol, "n_tokens",
            cfg.tokensPerShard)
          .select(col("id").as(idCol), col("seq_id").as("shard_id"))
        unit.withColumn("__sub", sub).join(assign, Seq(idCol))
          .withColumn("shard_id",
            col("__sub") + lit(cfg.packSubGroups.toLong) * col("shard_id"))
          .drop("__sub")
      } else {
        val w = Window.partitionBy(col("split"), col(langCol), sub)
          .orderBy(orderCols: _*)
        unit.withColumn("shard_id", sub +
          lit(cfg.packSubGroups.toLong) *
            ((sum("n_tokens").over(w) - col("n_tokens")) / cfg.tokensPerShard)
              .cast("long"))
      }
    val outCols = Seq(col(idCol), col(langCol), col(textCol),
      col("n_tokens"), col("split"), col("shard_id")) ++
      (if (cfg.ragChunkWin <= 0) Nil else Seq(col("chunk_no")))
    packed.select(outCols: _*)
  }
}
