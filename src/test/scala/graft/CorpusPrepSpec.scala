package graft

import org.apache.spark.sql.functions._

import graft.operators.{Components, CorpusPrep, Dedup}

class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf0001/documents.parquet")
  private lazy val prepared =
    CorpusPrep.prepare(docs, "doc_id", "text", "lang").cache()

  test("output carries no exact or near duplicates") {
    assert(prepared.groupBy(md5(col("text"))).count()
      .filter($"count" > 1).count() === 0)
    // the surviving set intersected with each near-dup cluster is exactly
    // the cluster's canonical (min-id) member
    val exact = Dedup.dropExactDuplicates(docs, "doc_id", "text")
    val pairs = Dedup.minhashPairs(exact, "doc_id", "text", 3, 8, 4, 0.5)
    val cc = Components.connectedComponents(pairs, "left_id", "right_id")
    val survivors = prepared.select($"doc_id".cast("long")).as[Long].collect().toSet
    val nonCanonical = cc.filter($"id" =!= $"component")
      .select($"id".cast("long")).as[Long].collect().toSet
    assert(survivors.intersect(nonCanonical).isEmpty)
  }

  test("every surviving doc passes the quality gate") {
    val toks = graft.functions.TextOps.tokens(col("text"))
    val bad = prepared.filter(
      !size(toks).between(20, 100000) ||
      !graft.functions.TextOps.avgTokenLength(col("text")).between(3.0, 10.0) ||
      size(filter(toks, t => t.rlike("[a-zA-Z]"))).cast("double") / size(toks) <= 0.8 ||
      size(filter(toks, t =>
        t.isInCollection(Seq("the", "a", "of", "and", "to", "in", "is", "with")))) < 2)
    assert(bad.count() === 0)
    assert(prepared.count() > 0)
    // and the gate actually bites on this corpus (docs were dropped)
    assert(prepared.count() < docs.count())
  }

  test("splits are portable-hash buckets; shards respect the token budget") {
    // split must agree with the portable bucket of the id (seed 1, /10)
    val wrong = prepared.withColumn("b",
        graft.operators.Sampling.portableSplitBucket($"doc_id".cast("long"), 1L, 10))
      .filter(
        ($"b" < 8 && $"split" =!= "train") ||
        ($"b" === 8 && $"split" =!= "valid") ||
        ($"b" === 9 && $"split" =!= "test"))
    assert(wrong.count() === 0)
    // within each (split, lang, shard): token sum stays under budget +
    // one max-doc overhang (a doc is never split across shards)
    val shard = prepared.groupBy("split", "lang", "shard_id")
      .agg(sum("n_tokens").as("t"), max("n_tokens").as("m"))
    assert(shard.filter($"t" - $"m" >= 2000).count() === 0)
  }

  test("optional decontamination drops docs overlapping the eval corpus") {
    // eval set = verbatim copies of two surviving docs → they (and any doc
    // sharing a 5-gram with them) must vanish; everything else unchanged
    val evalIds = prepared.orderBy("doc_id").limit(2)
      .select($"doc_id".cast("long")).as[Long].collect().toSet
    val eval = docs.filter($"doc_id".isInCollection(evalIds))
      .select(($"doc_id" + 10000).as("doc_id"), $"text")
    val decon = CorpusPrep.prepare(docs, "doc_id", "text", "lang",
      evalDocs = Some(eval))
    val deconIds = decon.select($"doc_id".cast("long")).as[Long].collect().toSet
    assert(evalIds.intersect(deconIds).isEmpty, "copied docs survived decontamination")
    assert(deconIds.size < prepared.count())
    // every dropped doc (beyond the copies) genuinely shares a 5-gram
    val base = prepared.select($"doc_id".cast("long")).as[Long].collect().toSet
    val dropped = base -- deconIds -- evalIds
    if (dropped.nonEmpty) {
      val flagged = Dedup.contaminationCounts(
          docs.filter($"doc_id".isInCollection(dropped)), eval, "doc_id", "text", 5)
        .select($"id").as[Long].collect().toSet
      assert(flagged === dropped)
    }
  }

  test("prepare is deterministic across layouts") {
    val again = CorpusPrep.prepare(docs.repartition(13), "doc_id", "text", "lang")
      .select($"doc_id".cast("long"), $"split", $"shard_id")
      .as[(Long, String, Long)].collect().toSet
    val base = prepared.select($"doc_id".cast("long"), $"split", $"shard_id")
      .as[(Long, String, Long)].collect().toSet
    assert(again === base)
  }

  test("full pipeline with phash AND RAG-chunking stages on") {
    import graft.operators.Multimodal
    // payload column: docs sharing doc_id % 50 carry the SAME image, so
    // each class is a perceptual-dup cluster whose min id must survive
    val pngUdf = udf { (id: Long) => Multimodal.encodePng(id % 50, perturb = false) }
    val withMedia = docs.withColumn("payload", pngUdf($"doc_id".cast("long")))
    val cfg = CorpusPrep.Config(ragChunkWin = 64, ragChunkStride = 48)
    val out = CorpusPrep.prepare(withMedia, "doc_id", "text", "lang",
      cfg = cfg, mediaPayloadCol = Some("payload")).cache()
    assert(out.count() > 0)

    // (a) the phash stage applied the cluster-keep-min contract: compute
    // the expected drop set with the independently-tested operators over
    // the text-deduped set the stage actually saw
    val exact = Dedup.dropExactDuplicates(withMedia, "doc_id", "text")
    val tpairs = Dedup.minhashPairs(exact, "doc_id", "text", 3, 8, 4, 0.5)
    val tcc = Components.connectedComponents(tpairs, "left_id", "right_id")
    val textDeduped = exact.join(
      tcc.filter($"id" =!= $"component").select($"id".as("doc_id")),
      Seq("doc_id"), "left_anti")
    val sig = textDeduped.select($"doc_id",
      Multimodal.dHashUdf($"payload").as("ph")).filter($"ph".isNotNull)
    val ppairs = Dedup.hamming64Pairs(sig, "doc_id", "ph", 6, 8)
    val expectedDrop = Components.connectedComponents(ppairs, "left_id", "right_id")
      .filter($"id" =!= $"component").select($"id".cast("long")).as[Long]
      .collect().toSet
    assert(expectedDrop.nonEmpty, "fixture produced no perceptual dups")
    val survivors = out.select($"doc_id".cast("long")).distinct().as[Long].collect().toSet
    assert(survivors.intersect(expectedDrop).isEmpty,
      "non-canonical perceptual dups survived")

    // (b) chunk grain: chunk text equals TextOps.chunkStride of the doc,
    // n_tokens is the chunk's own token count, bounded by the window
    assert(out.filter($"n_tokens" > 64).count() === 0)
    assert(out.filter(size(split($"text", " ")) =!= $"n_tokens").count() === 0)
    // chunk_no is dense from 0 per doc
    val holes = out.groupBy("doc_id")
      .agg(min("chunk_no").as("lo"), max("chunk_no").as("hi"),
        count(lit(1)).as("n"))
      .filter($"lo" =!= 0 || $"n" =!= $"hi" + 1)
    assert(holes.count() === 0)

    // (c) shard budgets hold at CHUNK grain: sum under budget + one
    // max-chunk overhang per shard
    val shard = out.groupBy("split", "lang", "shard_id")
      .agg(sum("n_tokens").as("t"), max("n_tokens").as("m"))
    assert(shard.filter($"t" - $"m" >= 2000).count() === 0)
  }

  test("optional chunk dedup stage strips cross-doc boilerplate spans") {
    val withSpans = CorpusPrep.prepare(docs, "doc_id", "text", "lang",
      cfg = CorpusPrep.Config(chunkDedupTokens = 10))
    assert(withSpans.count() > 0)
    // no 10-token chunk appears twice anywhere in the surviving corpus
    val chunkDups = withSpans
      .withColumn("__toks", org.apache.spark.sql.functions.split($"text", " "))
      .select($"doc_id",
        explode(sequence(lit(0),
          ceil(size($"__toks") / lit(10.0)).cast("int") - 1)).as("pos"),
        $"__toks")
      .select(concat_ws(" ",
        org.apache.spark.sql.functions.slice($"__toks", $"pos" * 10 + 1, lit(10))).as("chunk"))
      .groupBy("chunk").count().filter($"count" > 1)
    assert(chunkDups.count() === 0)
    // rewritten texts re-pass the gate: n_tokens matches the kept text
    val bad = withSpans.filter(size(split($"text", " ")) =!= $"n_tokens")
    assert(bad.count() === 0)
  }

  test("packSubGroups splits the per-group funnel; budgets and coverage hold") {
    val base = docs
    val cfg1 = CorpusPrep.Config()
    val cfgN = CorpusPrep.Config(packSubGroups = 4)
    val p1 = CorpusPrep.prepare(base, "doc_id", "text", "lang", cfg1)
    val pN = CorpusPrep.prepare(base, "doc_id", "text", "lang", cfgN)
    // survivors identical — sub-grouping only re-shards, never re-gates
    assert(p1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      pN.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // every (split, lang, shard) still respects the token budget at the
    // offset grain: shards are CONTIGUOUS runs per sub-group, so within a
    // shard the token sum stays <= budget + one straddling doc
    val budget = cfgN.tokensPerShard
    val worst = pN.groupBy("split", "lang", "shard_id")
      .agg(org.apache.spark.sql.functions.sum("n_tokens").as("tok"),
        org.apache.spark.sql.functions.max("n_tokens").as("mx"))
      .filter(col("tok") > lit(budget) + col("mx"))
    assert(worst.count() === 0L, "a sub-grouped shard blew its budget")
    // shard ids from different sub-groups never collide (interleaved)
    val perShardSubs = pN
      .withColumn("__sub", pmod(xxhash64(col("doc_id")), lit(4L)))
      .groupBy("split", "lang", "shard_id")
      .agg(org.apache.spark.sql.functions.countDistinct("__sub").as("ns"))
      .filter(col("ns") > 1)
    assert(perShardSubs.count() === 0L,
      "one shard id mixed docs from two sub-groups")
  }

  test("packNextFit: same survivors, multi-doc shards bounded by the budget") {
    val budget = 300L
    val nf = CorpusPrep.prepare(docs, "doc_id", "text", "lang",
      cfg = CorpusPrep.Config(tokensPerShard = budget, packNextFit = true))
    val base = CorpusPrep.prepare(docs, "doc_id", "text", "lang",
      cfg = CorpusPrep.Config(tokensPerShard = budget))
    assert(nf.select("doc_id").as[Long].collect().sorted.toSeq ===
      base.select("doc_id").as[Long].collect().sorted.toSeq,
      "packing mode must not change survivorship")
    val overBudget = nf.groupBy("split", "lang", "shard_id")
      .agg(count(lit(1)).as("n"), sum($"n_tokens").as("tok"))
      .filter($"n" > 1 && $"tok" > budget)
    assert(overBudget.count() === 0,
      "no multi-doc shard may exceed the token budget")
    assert(nf.groupBy("split", "lang", "shard_id").count().count() >=
      base.groupBy("split", "lang", "shard_id").count().count(),
      "capacity-bounded packing can only use at least as many shards")
  }
}
