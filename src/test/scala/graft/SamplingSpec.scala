package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.operators.Sampling
import graft.queries.table

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("seeded sampling is reproducible; stratified respects strata") {
    val docs = table(spark, sf0001, "documents")
    val s1 = Sampling.uniform(docs, 0.3, seed = 11L).select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.uniform(docs, 0.3, seed = 11L).select("doc_id").as[Long].collect().toSet
    assert(s1 === s2)
    assert(s1.size > 50 && s1.size < 250)
    val strat = Sampling.stratified(docs, "lang",
      Map("en" -> 1.0, "es" -> 0.0), seed = 11L)
    assert(strat.filter($"lang" === "es").count() === 0)
    assert(strat.filter($"lang" === "en").count() ===
      docs.filter($"lang" === "en").count())
  }

  test("hash split: disjoint, covering, stable under repartitioning") {
    val docs = table(spark, sf0001, "documents")
    val (train, valid) = Sampling.hashSplit(docs, "doc_id", 9, 10, seed = 5L)
    assert(train.count() + valid.count() === docs.count())
    assert(train.join(valid, Seq("doc_id"), "left_semi").count() === 0)
    val (train2, _) = Sampling.hashSplit(docs.repartition(13), "doc_id", 9, 10, seed = 5L)
    assert(train2.select("doc_id").as[Long].collect().toSet ===
      train.select("doc_id").as[Long].collect().toSet)
  }

  test("portable split bucket: matches the scala mix32, stable under layout") {
    val docs = table(spark, sf0001, "documents")
    def buckets(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.select(col("doc_id").cast("long"),
          Sampling.portableSplitBucket(col("doc_id").cast("long"), 1L, 10))
        .as[(Long, Long)].collect().toMap
    val got = buckets(docs)
    // scala reference: same mix32 the whole portable hash stack uses
    got.foreach { case (id, b) =>
      val x0 = ((id % 4294967296L) + 2654435761L) % 4294967296L
      assert(b === graft.functions.TextOps.mix32(x0) % 10, s"id $id")
    }
    // all buckets populated, assignment layout-independent
    assert(got.values.toSet.size === 10)
    assert(buckets(docs.repartition(13)) === got)
  }

  test("capPerGroup keeps at most n deterministic rows per group") {
    val docs = table(spark, sf0001, "documents")
    val capped = Sampling.capPerGroup(docs, "lang", "doc_id", 10)
    assert(capped.groupBy("lang").count().filter($"count" > 10).count() === 0)
    // deterministic: the kept rows are the lowest doc_ids per lang
    val minIds = docs.groupBy("lang").agg(min("doc_id").as("m"))
    assert(capped.join(minIds, capped("lang") === minIds("lang") &&
      capped("doc_id") === minIds("m")).count() === minIds.count())
  }

  test("stratifiedPortable: per-stratum rates, stable under layout") {
    val docs = table(spark, sf0001, "documents")
    def kept(df: org.apache.spark.sql.DataFrame): Set[Long] =
      Sampling.stratifiedPortable(df, col("doc_id"), col("lang"),
          Map("en" -> 500, "zh" -> 0), defaultPerMille = 200, seed = 3L)
        .select(col("doc_id").cast("long")).as[Long].collect().toSet
    val got = kept(docs)
    // a zero-rate stratum is fully dropped; membership is a pure function
    // of (key, seed) so repartitioning cannot move rows between strata
    assert(docs.filter($"lang" === "zh").count() > 0)
    val zhIds = docs.filter($"lang" === "zh")
      .select($"doc_id".cast("long")).as[Long].collect().toSet
    assert(got.intersect(zhIds).isEmpty)
    assert(kept(docs.repartition(13)) === got)
    // rates land near the per-mille targets (binomial tolerance)
    val en = docs.filter($"lang" === "en").count().toDouble
    val enKept = docs.filter($"lang" === "en")
      .filter($"doc_id".isInCollection(got)).count().toDouble
    assert(math.abs(enKept / en - 0.5) < 0.15, s"en rate ${enKept / en}")
  }

  test("capPerGroupRanked: hash order is content-independent and exact") {
    val docs = table(spark, sf0001, "documents")
    val ord = Sampling.portableSplitBucket(col("doc_id"), 7L, 1000003)
    val capped = Sampling.capPerGroupRanked(
      docs.withColumn("__k", ord), "source", Seq(col("__k"), col("doc_id")), 5)
    assert(capped.groupBy("source").count().filter($"count" > 5).count() === 0)
    // ranks are 1..min(5, groupSize) with no gaps
    assert(capped.groupBy("source").agg(min("rn").as("lo"), max("rn").as("hi"),
        count(lit(1)).as("n"))
      .filter($"lo" =!= 1 || $"hi" =!= $"n").count() === 0)
    // same survivors regardless of input layout
    val again = Sampling.capPerGroupRanked(
        docs.repartition(17).withColumn("__k", ord),
        "source", Seq(col("__k"), col("doc_id")), 5)
      .select($"doc_id".cast("long")).as[Long].collect().toSet
    assert(again === capped.select($"doc_id".cast("long")).as[Long].collect().toSet)
  }

  test("temperature keep: rarest stratum keeps all, rates flatten the mix") {
    val docs = table(spark, sf0001, "documents")
    val got = Sampling.temperatureKeep(docs, "lang", col("doc_id"), seed = 11L)
    val byLang = got.groupBy("lang")
      .agg(first("stratum_docs").as("n"), first("keep_rate").as("rate"),
        sum("keep").as("kept"))
      .as[(String, Long, Double, Long)].collect().sortBy(_._2)
    // rarest language: rate exactly 1, every row kept
    assert(byLang.head._3 === 1.0)
    assert(byLang.head._4 === byLang.head._2)
    // rates are monotone non-increasing in stratum size and equal
    // sqrt(n_min/n) to rounding
    val nMin = byLang.head._2
    byLang.foreach { case (lang, n, rate, _) =>
      assert(math.abs(rate - math.sqrt(nMin.toDouble / n)) < 1e-6, lang)
    }
    // the kept mix is flatter than the raw mix: largest/smallest stratum
    // ratio shrinks toward its square root
    val rawRatio = byLang.last._2.toDouble / nMin
    val keptRatio = byLang.last._4.toDouble / byLang.head._4
    assert(keptRatio < rawRatio)
    // deterministic: keep decisions survive repartitioning
    val again = Sampling.temperatureKeep(docs.repartition(13), "lang",
        col("doc_id"), seed = 11L)
      .filter($"keep" === 1).select($"doc_id".cast("long")).as[Long].collect().toSet
    assert(again === got.filter($"keep" === 1)
      .select($"doc_id".cast("long")).as[Long].collect().toSet)
  }

  test("weightedTopK: k rows per stratum, stable under repartitioning") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def pick(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Sampling.weightedTopK(df, "lang", $"doc_id",
          $"n_chars", k = 5, seed = 11L)
        .select($"doc_id".cast("long"), $"lang", $"rn")
        .as[(Long, String, Int)].collect().sortBy(r => (r._2, r._3))
    val a = pick(docs)
    val b = pick(docs.repartition(13))
    assert(a.toSeq === b.toSeq)
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1 to math.min(5, rows.length)))
    }
  }

  test("weightedTopK: null / non-positive weights are refused in-plan, " +
      "never silently ranked first") {
    // a null weight makes wkey null, and ascending sort puts nulls
    // FIRST — the weightless row would WIN the top-k with no error
    def run(w: Any) = {
      val df = Seq((1L, "x", Option(w).map(_.toString.toLong)),
          (2L, "x", Some(10L))).toDF("doc_id", "lang", "w")
      graft.operators.Sampling.weightedTopK(
        df, "lang", $"doc_id", $"w", k = 2, seed = 11L).collect()
    }
    for (bad <- Seq(null, 0L, -5L)) {
      val e = intercept[Exception] { run(bad) }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("weightedTopK")),
        s"weight=$bad: " + msgs(e).mkString(" | "))
    }
  }

  test("weightedTopK: raising a row's weight never worsens its selection key") {
    val base = Seq((1L, "x", 10L), (2L, "x", 10L), (3L, "x", 10L))
      .toDF("doc_id", "lang", "w")
    def keyOf(weight: Long): Double =
      graft.operators.Sampling.weightedTopK(
          base.withColumn("w", when($"doc_id" === 2L, lit(weight)).otherwise($"w")),
          "lang", $"doc_id", $"w", k = 3, seed = 11L)
        .filter($"doc_id" === 2L).select($"wkey").as[Double].head()
    // wkey = −ln(u)/w is strictly decreasing in w (u fixed by id + seed)
    assert(keyOf(1000L) <= keyOf(10L))
    assert(keyOf(1000000L) <= keyOf(1000L))
  }

  test("mixturePlan: binding stratum exhausted, shares honored, N maximal") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val targets = Map("en" -> 0.4, "de" -> 0.2, "fr" -> 0.15,
      "es" -> 0.15, "zh" -> 0.1)
    val plan = Sampling.mixturePlan(docs, "lang", targets)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(plan.keySet === targets.keySet)
    // every take within supply, and the binding stratum nearly exhausted
    plan.foreach { case (l, (n, _, take)) =>
      assert(take <= n, s"$l over-subscribed: $take > $n") }
    val bigN = plan.map { case (_, (n, t, _)) => math.floor(n / t).toLong }.min
    plan.foreach { case (l, (_, t, take)) =>
      assert(take === math.floor(t * bigN).toLong, s"$l take wrong") }
    // maximality: at N+1 some stratum's REAL demand t·(N+1) exceeds its
    // supply (floor(n/t) = N ⇔ n < t·(N+1)) — the binding stratum
    val overs = plan.count { case (_, (n, t, _)) => t * (bigN + 1) > n }
    assert(overs >= 1, "plan not maximal")
  }

  test("applyMixture: per-stratum counts equal the plan, layout-stable") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val targets = Map("en" -> 0.5, "de" -> 0.5)
    val plan = Sampling.mixturePlan(docs, "lang", targets)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val kept = Sampling.applyMixture(docs, "lang", $"doc_id", targets, 5L)
    val counts = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === plan.filter(_._2 > 0))
    val keptIds = kept.select("doc_id").as[Long].collect().sorted.toSeq
    val kept2 = Sampling.applyMixture(docs.repartition(13), "lang",
      $"doc_id", targets, 5L).select("doc_id").as[Long].collect().sorted.toSeq
    assert(keptIds === kept2)
  }

  test("mixturePlan: stratum absent from the data binds N to zero") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val plan = Sampling.mixturePlan(docs, "lang",
        Map("en" -> 0.5, "xx" -> 0.5))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(plan("xx") === ((0L, 0L)))
    assert(plan("en")._2 === 0L)
  }

  test("temperatureKeep: null-stratum rows get a keep decision, not dropped") {
    import spark.implicits._
    val rows = Seq(
      (1L, Option("en")), (2L, Option("en")), (3L, Option("en")),
      (4L, Option("en")), (5L, Option.empty[String]), (6L, Option.empty[String]))
      .toDF("id", "lang")
    val kept = graft.operators.Sampling.temperatureKeep(
      rows, "lang", col("id"), seed = 7L)
    // EVERY input row comes back with a decision — the previous plain
    // equi-join silently dropped the null-stratum rows
    assert(kept.count() === 6L)
    val nullRows = kept.filter(col("lang").isNull)
    assert(nullRows.count() === 2L)
    // the null stratum is first-class: it is the smallest, so rate 1.0
    assert(nullRows.select("keep_rate").distinct().head().getDouble(0) === 1.0)
  }

  test("k-center coreset releases its per-round checkpoints deterministically") {
    // Dataset.unpersist is a no-op on a localCheckpoint'ed Dataset (it
    // only clears CacheManager entries; the RDD itself stays persisted
    // until GC) — the release must go through the checkpointed RDD, and
    // when it does, no round's corpus copy outlives the call
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val emb = table(spark, sf0001, "embeddings")
    Sampling.kCenterCoreset(emb, "vec_id", "embedding", k = 5).collect()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"k-center left ${leaked.size} checkpoint RDD(s) persisted: $leaked")
  }

  test("k-center coreset: null vectors are excluded, not argmin hijackers") {
    import spark.implicits._
    val pts = Seq(
      (1L, Some(Seq(1f, 0f))), (2L, Some(Seq(0f, 1f))),
      (3L, Some(Seq(1f, 1f))), (9L, Option.empty[Seq[Float]]))
      .toDF("id", "vec")
    val picks = graft.operators.Sampling.kCenterCoreset(pts, "id", "vec", k = 3)
      .select("id").as[Long].collect().toSet
    assert(picks === Set(1L, 2L, 3L)) // 9 never selected, no NPE
  }

  test("L1 and Linf distances: zero to self, triangle sanity") {
    val got = Seq((Seq(1f, 2f, -3f), Seq(0f, 2f, 1f)))
      .toDF("a", "b")
      .select(
        VectorOps.l1Distance($"a", $"b"),
        VectorOps.lInfDistance($"a", $"b"),
        VectorOps.l1Distance($"a", $"a"),
        VectorOps.lInfDistance($"a", $"a"))
      .as[(Double, Double, Double, Double)].head()
    assert(got._1 === 5.0)
    assert(got._2 === 4.0)
    assert(got._3 === 0.0)
    assert(got._4 === 0.0)
  }

  // ---- k-center coreset (Gonzalez farthest-first) ----

  private def r6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("k-center coreset matches an independent driver-side greedy") {
    val emb = table(spark, sf0001, "embeddings")
    val got = Sampling.kCenterCoreset(emb, "vec_id", "embedding", k = 6)
      .select($"step", $"id", $"nearest_sim")
      .as[(Int, Long, Option[Double])].collect().sortBy(_._1).toSeq

    // reference greedy: same rounded sequential-fold dot, min-id seed,
    // argmin of (max sim to selected, id)
    val pts = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
    def dot(a: Seq[Float], b: Seq[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      r6(s)
    }
    val byId = pts.toMap
    var sel = List(pts.head._1)
    var expected = List[(Int, Long, Option[Double])]((1, pts.head._1, None))
    for (step <- 2 to 6) {
      val best = pts.filter(p => !sel.contains(p._1))
        .map { case (id, v) => (id, sel.map(c => dot(v, byId(c))).max) }
        .minBy { case (id, ms) => (ms, id) }
      expected = ((step, best._1, Some(best._2))) :: expected
      sel = best._1 :: sel
    }
    assert(got === expected.reverse)

    val again = Sampling.kCenterCoreset(
        emb.repartition(13), "vec_id", "embedding", k = 6)
      .as[(Int, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(again === got, "layout must not change the greedy")
  }

  test("k-center coreset: k=1 returns only the min-id seed") {
    val emb = table(spark, sf0001, "embeddings")
    val got = Sampling.kCenterCoreset(emb, "vec_id", "embedding", k = 1)
      .as[(Int, Long, Option[Double])].collect().toSeq
    val minId = emb.agg(min($"vec_id")).as[Long].head()
    assert(got === Seq((1, minId, None)))
  }

  test("bottom-k (KMV) sampling is mergeable: union sketch == sketch of union") {
    // the profile_kmv contract: min-wise samples compose, so a 100 TB
    // corpus sketches per partition and merges k-sized states
    def h(id: Long): Long = {
      def mix(x: Long): Long = {
        var v = ((x ^ (x >>> 16)) * 73244475L) & 0xffffffffL
        v = ((v ^ (v >>> 16)) * 73244475L) & 0xffffffffL
        v ^ (v >>> 16)
      }
      mix((id % 4294967296L + 31L * 2654435761L) % 4294967296L) % 1000003L
    }
    val k = 5
    val ids = (0L until 400L)
    def bottomK(xs: Seq[Long]): Seq[(Long, Long)] =
      xs.map(i => (h(i), i)).sorted.take(k)
    val (a, b) = ids.partition(_ % 3 == 0)
    val merged = bottomK((bottomK(a) ++ bottomK(b)).map(_._2))
    assert(merged === bottomK(ids), "merge of partial sketches == full sketch")
  }

  test("poisson bootstrap: deterministic, layout-stable, k matches the " +
      "scala inverse-CDF replay") {
    val docs = table(spark, sf0001, "documents")
    def draws(df: org.apache.spark.sql.DataFrame): Map[(Long, Int), Int] =
      Sampling.poissonReplicates(df, col("doc_id").cast("long"),
          replicates = 5, seed = 17L)
        .select(col("doc_id").cast("long"), col("replicate"), col("k"))
        .as[(Long, Int, Int)].collect()
        .map(t => (t._1, t._2) -> t._3).toMap
    val got = draws(docs)
    val n = docs.count()
    assert(got.size === n * 5, "one draw per (row, replicate)")
    assert(got.values.forall(k => k >= 0 && k <= 7))
    // Poisson(1): mean 1, so total multiplicity tracks n per replicate
    val mean = got.values.map(_.toLong).sum.toDouble / got.size
    assert(mean > 0.85 && mean < 1.15, s"mean multiplicity $mean")
    assert(got.values.count(_ == 0).toDouble / got.size > 0.25,
      "~e^-1 of draws must be zero")
    assert(draws(docs.repartition(13)) === got, "layout-stable")
    // independent scala replay of bucket -> k for every draw
    def mix32(x: Long): Long = {
      var h = x
      h = ((h ^ (h >>> 16)) * 73244475L) & 0xffffffffL
      h = ((h ^ (h >>> 16)) * 73244475L) & 0xffffffffL
      h ^ (h >>> 16)
    }
    got.foreach { case ((id, r), k) =>
      val b = mix32(((id * 5 + r) % 4294967296L + 17L * 2654435761L)
        % 4294967296L) % 1000000L
      val expect = Sampling.poissonCdf1e6.indexWhere(b < _) match {
        case -1 => 7
        case i => i
      }
      assert(k === expect, s"doc $id replicate $r bucket $b")
    }
  }
}
