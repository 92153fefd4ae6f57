package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.AnnIvf

/** CLI twin of the reference's two entry points (SURVEY.md §3.1-3.2):
  * the ingest/build `main()` of vector_db.py and the `/search` route of
  * neighborhood_server.py — no services, just Spark jobs over a durable
  * partitioned index.
  *
  * {{{
  * runMain graft.Pipeline build  <vectorsParquet> <idCol> <vecCol> <indexDir> [nlist]
  * runMain graft.Pipeline search <indexDir> <queriesParquet> <idCol> <vecCol> [k] [nprobe] [partitions]
  * runMain graft.Pipeline corpus <docsParquet> <idCol> <textCol> <langCol> <outDir> [evalParquet]
  * runMain graft.Pipeline textindex  <docsParquet> <idCol> <textCol> <indexDir>
  * runMain graft.Pipeline textsearch <indexDir> <idCol> <term> [term ...]
  * runMain graft.Pipeline textprune  <indexDir> [keepGenerations]
  * }}}
  *
  * `partitions` is the reference's shard-subset spec (`"1,2,5-10"`) —
  * serving a subset of partitions, as one filter instead of N servers.
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        math.min(32, Runtime.getRuntime.availableProcessors).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var exitCode = 0
    try args.toList match {
      case "build" :: vectors :: idCol :: vecCol :: indexDir :: rest =>
        val df = spark.read.parquet(vectors)
        // one full-table count, reused (this is the 100 TB table)
        val nVecs = df.count()
        val nlist = rest.headOption.map(_.toInt)
          .getOrElse(AnnIvf.defaultNlist(nVecs))
        val index = AnnIvf.build(df, idCol, vecCol, nlist)
        AnnIvf.write(index, indexDir)
        println(s"[pipeline] built index: $nVecs vectors, nlist=$nlist → $indexDir")

      case "search" :: indexDir :: queriesPath :: idCol :: vecCol :: rest =>
        val k = rest.headOption.map(_.toInt).getOrElse(10)
        val nprobe = rest.drop(1).headOption.map(_.toInt).getOrElse(1)
        val index0 = AnnIvf.read(spark, indexDir)
        val index = rest.drop(2).headOption match {
          case Some(spec) =>
            val subset = AnnIvf.parsePartitionSpec(spec)
            index0.copy(assigned =
              index0.assigned.filter(col("partition_id").isin(subset: _*)))
          case None => index0
        }
        val queries = spark.read.parquet(queriesPath)
        val hits = AnnIvf.searchPruned(index, queries, idCol, vecCol, k, nprobe,
            idCol = idCol)
          .orderBy("query_id", "rank")
          // one execution serves both the preview and the count — the
          // show-then-count pattern re-ran the whole probe+join+topk
          .cache()
        try {
          hits.show(50, truncate = false)
          println(s"[pipeline] ${hits.count()} results")
        } finally hits.unpersist()

      case "health" :: indexDir :: Nil =>
        val index = AnnIvf.read(spark, indexDir)
        val row = Graft.annStats(index).head()
        println(s"[pipeline] health: total_vectors=${row.getLong(0)} " +
          s"n_partitions=${row.getLong(1)} n_distinct_dims=${row.getLong(2)} " +
          s"status=${if (row.getLong(2) == 1L) "SERVING" else "DEGRADED"}")

      // end-to-end training-corpus preparation: exact dedup → near-dup
      // cluster removal → quality gate → split → shard packing, written
      // as split-partitioned parquet
      case "corpus" :: docsPath :: idCol :: textCol :: langCol :: outDir :: rest
          if rest.filterNot(_ == "--nextfit").size <= 1 =>
        val docs = spark.read.parquet(docsPath)
        val nIn = docs.count()
        // optional: --nextfit packs capacity-BOUNDED shards; optional
        // trailing path: eval/benchmark parquet to decontaminate against
        val nextFit = rest.contains("--nextfit")
        val evalDocs = rest.filterNot(_ == "--nextfit")
          .headOption.map(spark.read.parquet)
        val prepared = graft.operators.CorpusPrep.prepare(
          docs, idCol, textCol, langCol,
          cfg = graft.operators.CorpusPrep.Config(packNextFit = nextFit),
          evalDocs = evalDocs)
        prepared.write.mode("overwrite").partitionBy("split").parquet(outDir)
        val out = spark.read.parquet(outDir)
        val bySplit = out.groupBy("split")
          .agg(count(lit(1)).as("docs"), sum("n_tokens").as("tokens"))
          .orderBy("split").collect()
        println(s"[pipeline] corpus: $nIn docs in → ${out.count()} kept → $outDir")
        bySplit.foreach(r => println(
          s"[pipeline]   ${r.getString(0)}: ${r.getLong(1)} docs, ${r.getLong(2)} tokens"))

      // per-document quality signals: Gopher-rule composite + unigram and
      // interpolated bigram LM cross-entropy — the score table a curation
      // run joins against when choosing cut thresholds
      case "score" :: docsPath :: idCol :: textCol :: outDir :: Nil =>
        val docs = spark.read.parquet(docsPath)
        val uni = graft.operators.TextScoring
          .unigramCrossEntropy(docs, idCol, textCol)
          .select(col("id").as(idCol), col("n_tokens"),
            col("cross_entropy").as("unigram_ce"))
        val bi = graft.operators.TextScoring
          .bigramCrossEntropy(docs, idCol, textCol)
          .select(col("id").as(idCol), col("cross_entropy").as("bigram_ce"))
        val scored = uni.join(bi, Seq(idCol), "left")
        scored.write.mode("overwrite").parquet(outDir)
        val s = spark.read.parquet(outDir)
          .agg(count(lit(1)), avg("unigram_ce"), avg("bigram_ce")).head()
        // avg over zero rows (empty input) is NULL — report NaN, don't
        // NPE out of Row.getDouble after the real work succeeded
        def mean(i: Int) = if (s.isNullAt(i)) Double.NaN else s.getDouble(i)
        println(f"[pipeline] score: ${s.getLong(0)} docs → $outDir " +
          f"(mean unigram_ce=${mean(1)}%.3f, bigram_ce=${mean(2)}%.3f)")

      // lexical twin of build/search: durable inverted index + BM25 serve
      case "textindex" :: docsPath :: idCol :: textCol :: indexDir :: Nil =>
        val docs = spark.read.parquet(docsPath)
        graft.operators.Retrieval.writeIndex(docs, idCol, textCol, indexDir)
        // count ONLY the batches the live generation's manifest serves —
        // a recursive lookup would also count orphans of crashed appends
        // and superseded rebuilds, overstating the built index
        val n = spark.read.parquet(graft.operators.Retrieval
            .livePostingsPaths(spark, indexDir): _*).count()
        println(s"[pipeline] built text index: $n postings → $indexDir")

      case "textsearch" :: indexDir :: idCol :: rest if rest.nonEmpty =>
        val hits = graft.operators.Retrieval
          .searchIndex(spark, indexDir, idCol, rest)
          .orderBy(desc("bm25"), col(idCol)).limit(20)
          .cache() // one execution for preview + count
        try {
          hits.show(20, truncate = false)
          println(s"[pipeline] ${hits.count()} results for terms $rest")
        } finally hits.unpersist()

      // janitor for a textindex layout: drop superseded generations and
      // orphan batches outside the retention window (single maintainer)
      case "textprune" :: indexDir :: rest if rest.length <= 1 =>
        val keep = rest.headOption.map(_.toInt).getOrElse(2)
        val removed = graft.operators.Retrieval.pruneIndex(spark, indexDir, keep)
        println(s"[pipeline] pruned $removed superseded dir(s) from " +
          s"$indexDir (keeping $keep generation(s))")

      // dbt-style data-quality audit on any parquet table: PK
      // uniqueness/nullability plus per-column null counts — one
      // violation-count row per check, nonzero exit when any fail (the
      // CI-gate contract)
      case "dq" :: path :: idCol :: cols =>
        val df = spark.read.parquet(path)
        val dupPk = df.groupBy(col(idCol)).count()
          .filter(col("count") > 1).count()
        // ALL null counts in ONE aggregation pass (a per-column filter
        // job would scan the full table once per checked column);
        // count(when(...)), not sum(...): sum over a ZERO-ROW table is
        // NULL and the getLong below would NPE on an empty parquet table
        val nullAggs = (idCol +: cols).map(c =>
          count(when(col(c).isNull, lit(1))).as(c))
        val nulls = df.agg(nullAggs.head, nullAggs.tail: _*).head()
        val checks = Seq(s"duplicate $idCol" -> dupPk,
          s"null $idCol" -> nulls.getLong(0)) ++
          cols.zipWithIndex.map { case (c, i) =>
            s"null $c" -> nulls.getLong(i + 1) }
        checks.foreach { case (name, v) =>
          println(f"[pipeline] dq: $name%-28s $v violations")
        }
        // record, exit AFTER the finally — sys.exit here would skip
        // spark.stop()
        if (checks.exists(_._2 > 0L)) exitCode = 1

      // RAG chunking: fixed win/stride token windows per document
      case "chunk" :: docsPath :: idCol :: textCol :: outDir :: rest
          if rest.length <= 2 =>
        val win = rest.headOption.map(_.toInt).getOrElse(64)
        val stride = rest.lift(1).map(_.toInt).getOrElse(48)
        val docs = spark.read.parquet(docsPath)
        graft.functions.TextOps.chunkStride(docs, idCol, textCol, win, stride)
          .write.mode("overwrite").parquet(outDir)
        val c = spark.read.parquet(outDir)
          .agg(count(lit(1)), countDistinct(col(idCol))).head()
        println(s"[pipeline] chunk: ${c.getLong(0)} chunks from " +
          s"${c.getLong(1)} docs (win=$win stride=$stride) → $outDir")

      case other =>
        System.err.println(s"unknown args: $other " +
          "(want build|search|health|corpus|score|textindex|textsearch|" +
          "dq|chunk ...)")
        exitCode = 2
    } finally spark.stop()
    if (exitCode != 0) sys.exit(exitCode)
  }
}
