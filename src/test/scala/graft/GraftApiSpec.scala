package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnIvf, Knn, TopKAggregator}

class GraftApiSpec extends SparkSpec {
  import spark.implicits._

  test("SQL registration: graft_dot / graft_sorted_jaccard / udfs usable from spark.sql") {
    Graft.register(spark)
    val dot = spark.sql(
      "SELECT graft_dot(CAST(ARRAY(1.0, 2.0) AS ARRAY<FLOAT>), CAST(ARRAY(3.0, 4.0) AS ARRAY<FLOAT>))")
      .as[Double].head()
    assert(dot === 11.0)
    val jac = spark.sql(
      "SELECT graft_sorted_jaccard(ARRAY(1L, 2L, 3L), ARRAY(2L, 3L, 4L))")
      .as[Double].head()
    assert(jac === 0.5)
    val parsed = spark.sql(
      "SELECT graft_parse_taxontag('a photo of kingdom Animalia species x.')['kingdom']")
      .as[String].head()
    assert(parsed === "Animalia")
    assert(spark.sql("SELECT graft_lang_id('the cat and the dog')").as[String].head() === "en")
    assert(spark.sql("SELECT graft_zorder64(1L, 1L) < graft_zorder64(2L, 2L)")
      .as[Boolean].head())
    val rt = spark.sql(
      "SELECT graft_fp16_unpack(graft_fp16_pack(CAST(ARRAY(0.5, -1.25) AS ARRAY<FLOAT>)))")
      .as[Seq[Float]].head()
    assert(rt === Seq(0.5f, -1.25f)) // exact half-representable values
    val nrm = spark.sql(
      "SELECT graft_l2_normalize(CAST(ARRAY(3.0, 4.0) AS ARRAY<FLOAT>))")
      .as[Seq[Float]].head()
    assert(nrm === Seq(0.6f, 0.8f))
    assert(spark.sql("SELECT graft_dot_int(ARRAY(1L, 2L), ARRAY(3L, 4L))")
      .as[Long].head() === 11L)
    assert(spark.sql("SELECT graft_l2sq_int(ARRAY(1L, 2L), ARRAY(3L, 5L))")
      .as[Long].head() === 13L)
  }

  test("facade pcaFitInt/pcaProjectInt match the engine's emb_pca twin") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val m = Graft.pcaFitInt(emb, "embedding")
    val got = Graft.pcaProjectInt(emb, "embedding", "vec_id", m)
      .orderBy("vec_id").limit(3)
      .as[(Long, Long, Long)].collect().toSeq
    val want = graft.operators.EmbeddingPcaInt.projectTop2(emb, "embedding",
        "vec_id", graft.operators.EmbeddingPcaInt.fitTop2(
          emb, "embedding", rounds = 80))
      .orderBy("vec_id").limit(3).as[(Long, Long, Long)].collect().toSeq
    assert(got === want)
  }

  test("TopKAggregator matches the window-based top-k") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val scored = Knn.bruteForce(
      emb, emb.filter($"vec_id" < 3), "vec_id", "vec_id", "embedding",
      k = Int.MaxValue - 1, excludeSelf = true)
      .select($"query_id", $"vec_id", $"score")
    val viaAgg = TopKAggregator.topK(scored, "query_id", "vec_id", "score", 5)
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    val viaWindow = Knn.topKPerGroup(scored, Seq($"query_id"), 5,
        desc("score"), asc("vec_id"))
      .select("query_id", "vec_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(viaAgg === viaWindow)
  }

  test("durable IVF search prunes parquet partitions (PartitionFilters)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val index = AnnIvf.build(emb, "vec_id", "embedding", nlist = 8, seed = 42L)
    val dir = java.nio.file.Files.createTempDirectory("annivf-prune").toString
    AnnIvf.write(index, dir)
    val durable = AnnIvf.read(spark, dir)
    // static partition list (the probed set) → PartitionFilters in the scan
    val probedPartitions = Seq(0, 1)
    val pruned = durable.assigned
      .filter(col("partition_id").isin(probedPartitions: _*))
    val plan = pruned.queryExecution.executedPlan.toString
    // the partition predicate must land in PartitionFilters (metadata-only
    // pruning), not in PushedFilters/data filters
    assert(plan.contains("PartitionFilters: [partition_id"), plan.take(800))
    // and row counts confirm only the probed partitions were read
    val want = index.assigned
      .filter(col("partition_id").isin(probedPartitions: _*)).count()
    assert(pruned.count() === want)
  }

  test("searchPruned on durable index: PartitionFilters + equals in-memory search") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val index = AnnIvf.build(emb, "vec_id", "embedding", nlist = 8, seed = 42L)
    val dir = java.nio.file.Files.createTempDirectory("annivf-sp").toString
    AnnIvf.write(index, dir)
    val durable = AnnIvf.read(spark, dir)
    val queries = emb.filter($"vec_id" < 3)
    val prunedSearch = AnnIvf.searchPruned(durable, queries,
      "vec_id", "embedding", k = 5, nprobe = 2, idCol = "vec_id")
    val plan = prunedSearch.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [partition_id"), plan.take(800))
    val viaJoin = AnnIvf.search(durable, queries,
        "vec_id", "embedding", k = 5, nprobe = 2, idCol = "vec_id")
      .select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val got = prunedSearch.select("query_id", "vec_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === viaJoin)
  }

  test("facade: corpus prep, decontaminate, pca wire through") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val eval = docs.filter($"doc_id" % 97 === 0)
      .select(($"doc_id" + 90000).as("doc_id"), $"text")
    val prepared = Graft.prepareCorpus(docs, "doc_id", "text", "lang",
      evalDocs = Some(eval))
    assert(prepared.count() > 0)
    assert(prepared.columns.contains("split") && prepared.columns.contains("shard_id"))
    assert(Graft.decontaminate(docs, eval, "doc_id", "text").count() < docs.count())
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val m = Graft.pcaFit(emb, "embedding", k = 2)
    assert(emb.select(Graft.pcaProject(m, $"embedding")).head().getSeq[Double](0).size === 2)
  }

  test("facade: pqTrain/pqEncode/pqSearch and webDataset wire through") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val index = Graft.annBuild(emb, "vec_id", "embedding", nlist = 4)
    val cb = Graft.pqTrain(emb, "embedding", m = 8, ksub = 16)
    val encoded = Graft.pqEncode(index, cb, "vec_id", "embedding")
    val got = Graft.pqSearch(index, cb, encoded, emb.filter($"vec_id" === 0),
      "vec_id", "embedding", k = 5, nprobe = 4, refine = 20)
    assert(got.count() === 5)
    encoded.unpersist()
    val dir = java.nio.file.Files.createTempDirectory("wds-api").toString
    assert(Graft.webDataset(spark, dir).count() === 0)
  }

  test("facade: curation stages (temperature, ppl, dsir, substring, semdedup) wire through") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val kept = Graft.temperatureKeep(docs, "lang", col("doc_id"), seed = 1L)
    assert(kept.columns.contains("keep") && kept.count() === docs.count())
    assert(Graft.unigramCrossEntropy(docs, "doc_id", "text").count() === docs.count())
    assert(Graft.dsirLogWeights(docs, docs.filter(col("lang") === "en"),
      "doc_id", "text").count() === docs.count())
    // winnow candidates: at minimum the natural near-dup docs pair up
    assert(Graft.substringCandidates(docs, "doc_id", "text").count() > 0)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val index = Graft.annBuild(emb, "vec_id", "embedding", nlist = 4)
    val sem = Graft.semanticDedup(index, "vec_id", "embedding", threshold = 0.4)
    assert(sem.count() === emb.count())
    assert(sem.filter(col("keep") === 1).count() > 0)
  }

  test("facade: globalRowNumber/globalNtile/globalPrefixSum/globalQuantileCont wire through") {
    val df = (1 to 100).map(i => (i.toLong, (i * 37 % 100).toLong))
      .toDF("id", "v")
    val rn = Graft.globalRowNumber(df, Seq($"v", $"id"), "rn")
    assert(rn.agg(min($"rn"), max($"rn")).as[(Long, Long)].head() === ((1L, 100L)))
    val nt = Graft.globalNtile(df, Seq($"v", $"id"), 4, "q")
    assert(nt.groupBy($"q").count().as[(Int, Long)].collect().toMap ===
      Map(1 -> 25L, 2 -> 25L, 3 -> 25L, 4 -> 25L))
    val ps = Graft.globalPrefixSum(df, Seq($"id"), $"v", "run")
    assert(ps.filter($"id" === 100).select($"run").as[Long].head() ===
      (1 to 100).map(i => (i * 37 % 100).toLong).sum)
    val qc = Graft.globalQuantileCont(df, $"v", Seq(0.0, 0.5, 1.0))
    assert(qc.count() === 3)
  }

  test("facade: pinned truncates lineage, resets stats, preserves rows") {
    val base = (1 to 50).map(i => (i.toLong, i * 2L)).toDF("k", "v")
    var st = Graft.pinned(base)
    // a loop that joins the previous state with itself — the shape whose
    // inherited-stats sizeInBytes would compound exponentially unpinned
    for (_ <- 1 to 6) {
      st = Graft.pinned(
        st.as("x").join(st.as("y"), $"x.k" === $"y.k")
          .select($"x.k".as("k"), ($"x.v" + $"y.v" - $"y.v").as("v")))
      // stats stay at the constant default instead of compounding: the
      // BigInt must remain small enough to print instantly
      val bits = st.queryExecution.optimizedPlan.stats.sizeInBytes.bitLength
      assert(bits < 512, s"stats compounding: $bits bits")
    }
    assert(st.orderBy("k").as[(Long, Long)].collect().toSeq ===
      (1 to 50).map(i => (i.toLong, i * 2L)))
  }
}
