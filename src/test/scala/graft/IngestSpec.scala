package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Ingest
import graft.queries.table

/** Ingest-path specs: idempotent partitioned append (batch + streaming
  * foreachBatch — reference ST1/ST2), binaryFile source (S2), and the
  * serving JSON envelope (S7). */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("appendNew is idempotent: re-appending the same batch adds nothing") {
    val dir = Files.createTempDirectory("ingest").toString + "/t"
    val batch1 = Seq((1L, 0, "a"), (2L, 1, "b")).toDF("id", "pid", "v")
    Ingest.appendNew(spark, batch1, dir, "id", "pid")
    assert(spark.read.parquet(dir).count() === 2)
    Ingest.appendNew(spark, batch1, dir, "id", "pid") // replay
    assert(spark.read.parquet(dir).count() === 2)
    val batch2 = Seq((2L, 1, "b2"), (3L, 0, "c")).toDF("id", "pid", "v")
    Ingest.appendNew(spark, batch2, dir, "id", "pid") // only id=3 is new
    val got = spark.read.parquet(dir)
    assert(got.count() === 3)
    assert(got.filter($"id" === 2L).select("v").as[String].head() === "b")
    // the Bloom-routed form preserves idempotence bit-for-bit
    Ingest.appendNew(spark, batch2, dir, "id", "pid", bloomExpectedIds = Some(10L))
    assert(spark.read.parquet(dir).count() === 3)
    // layout is hive-partitioned by pid → partition pruning works
    assert(got.filter($"pid" === 0).queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(pid"))
  }

  test("newRecordsBloom equals the exact anti-join and never shuffles existing") {
    val existing = spark.range(0L, 5000L).toDF("id")
      .withColumn("payload", col("id") * 2)
    val incoming = spark.range(4000L, 6000L).toDF("id")
      .withColumn("payload", col("id") * 2)
    val exact = Ingest.newRecords(incoming, existing, "id")
      .select($"id").as[Long].collect().sorted
    // a deliberately undersized / high-fpp filter floods the candidate
    // path with false positives — the exact residual must absorb them all
    for (fpp <- Seq(0.5, 0.01)) {
      val got = Ingest.newRecordsBloom(incoming, existing, "id",
          expectedIds = 100L, fpp = fpp)
        .select($"id").as[Long].collect().sorted
      assert(got === exact, s"fpp=$fpp")
    }
    // plan shape: the residual joins are broadcast (map-side); the big
    // `existing` side is streamed, never sort-merge shuffled
    val p = Ingest.newRecordsBloom(incoming, existing, "id", 5000L)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("SortMergeJoin"), p.take(800))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(800))
    // null ids pass through as new, matching anti-join semantics
    val withNull = incoming.unionByName(
      Seq((Option.empty[Long], 0L)).toDF("id", "payload"))
    val gotNull = Ingest.newRecordsBloom(withNull, existing, "id", 5000L)
    assert(gotNull.filter($"id".isNull).count() === 1)
  }

  test("bloom reuse contract: id feedback keeps replays idempotent") {
    val existing = spark.range(0L, 100L).toDF("id")
    val bloom = Ingest.buildIdBloom(existing, "id", 1000L)
    val batch = spark.range(100L, 110L).toDF("id")
    val afterAppend = existing.union(batch)
    // without feedback the stale sketch calls a replayed id definitely-new
    // — the documented unsafe direction
    assert(Ingest.newRecordsBloomWith(batch, afterAppend, "id", bloom)
      .count() === 10)
    // with the contract's putLong feedback the replay resolves exactly
    (100L until 110L).foreach(bloom.putLong)
    assert(Ingest.newRecordsBloomWith(batch, afterAppend, "id", bloom)
      .count() === 0)
  }

  test("BloomIngestSession: amortized loop is idempotent across batches") {
    val dir = Files.createTempDirectory("bloomingest").toString + "/t"
    val s = new Ingest.BloomIngestSession(spark, dir, "id", "pid", 1000L)
    val b1 = Seq((1L, 0, "a"), (2L, 1, "b")).toDF("id", "pid", "v")
    assert(s.append(b1) === 2)
    // overlapping batch: only the new id lands (id 2 is rejected by the
    // SESSION sketch — it was never in the initial, empty layout)
    val b2 = Seq((2L, 1, "b2"), (3L, 0, "c")).toDF("id", "pid", "v")
    assert(s.append(b2) === 1)
    // full replay: nothing lands
    assert(s.append(b1) === 0)
    val got = spark.read.parquet(dir)
    assert(got.count() === 3)
    assert(got.filter($"id" === 2L).select("v").as[String].head() === "b")
  }

  test("BloomIngestSession: bulk backfill replay is exact via distributed feedback") {
    // the feedback path folds batch ids into the session sketch via a
    // distributed same-shape Bloom merge — a LOST id would fail in the
    // unsafe direction (replayed row classified definitely-new and
    // re-appended), so the replay-counts-zero assertions below verify
    // the merge really carried every id
    val dir = Files.createTempDirectory("bloombulk").toString + "/t"
    val s = new Ingest.BloomIngestSession(spark, dir, "id", "pid", 10000L)
    def rows(lo: Long, hi: Long) = spark.range(lo, hi).select(
      $"id", pmod($"id", lit(8)).cast("int").as("pid"),
      concat(lit("v"), $"id").as("v"))
    assert(s.append(rows(0, 5000)) === 5000)
    assert(s.append(rows(0, 5000)) === 0)
    // half-overlapping follow-up: exactly the new half lands
    assert(s.append(rows(2500, 7500)) === 2500)
    assert(spark.read.parquet(dir).count() === 7500)
    assert(spark.read.parquet(dir).select("id").distinct().count() === 7500)
  }

  test("streaming foreachBatch drives the same idempotent partitioned append (ST1)") {
    val src = Files.createTempDirectory("stream-src").toString
    val dst = Files.createTempDirectory("stream-dst").toString + "/t"
    val events = table(spark, sf0001, "events")
      .select($"event_id".as("id"), (pmod($"user_id", lit(4))).as("pid"), $"event_type".as("v"))
    events.limit(100).repartition(3).write.mode("overwrite").parquet(src)
    val q = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        Ingest.appendNew(spark, batch, dst, "id", "pid")
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(spark.read.parquet(dst).count() === 100)
    assert(spark.read.parquet(dst).select("id").distinct().count() === 100)
  }

  test("CSV and JSON sources round-trip the events subset (S1 generality)") {
    val events = table(spark, sf0001, "events")
      .select("event_id", "user_id", "event_type", "value").limit(200)
    val base = java.nio.file.Files.createTempDirectory("srcfmt").toString
    events.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    events.write.mode("overwrite").json(s"$base/json")
    val fromCsv = spark.read.option("header", "true").schema(events.schema).csv(s"$base/csv")
    val fromJson = spark.read.schema(events.schema).json(s"$base/json")
    assert(fromCsv.count() === 200)
    assert(fromJson.count() === 200)
    assert(fromCsv.join(events, Seq("event_id", "user_id", "event_type", "value"))
      .count() === 200)
    assert(fromJson.join(events, Seq("event_id", "user_id", "event_type", "value"))
      .count() === 200)
  }

  test("ORC source/sink round-trips the events subset incl. timestamps (S1 generality)") {
    // ORC is the other columnar format a lakehouse migration brings in;
    // unlike the CSV/JSON leg this keeps native TIMESTAMP columns
    val events = table(spark, sf0001, "events").limit(200)
    val base = java.nio.file.Files.createTempDirectory("orcfmt").toString
    events.write.mode("overwrite").orc(s"$base/orc")
    val fromOrc = spark.read.orc(s"$base/orc")
    assert(fromOrc.schema === events.schema)
    assert(fromOrc.count() === 200)
    assert(fromOrc.join(events, events.columns.toSeq).count() === 200)
  }

  test("binaryFile source reads opaque payloads with metadata (S2)") {
    val dir = Files.createTempDirectory("bin").toString
    Files.write(java.nio.file.Paths.get(dir, "a.jpg"), "payload-a".getBytes)
    Files.write(java.nio.file.Paths.get(dir, "b.jpg"), "payload-bb".getBytes)
    val got = spark.read.format("binaryFile").load(dir)
      .select(col("path"), col("length"), col("content"))
    assert(got.count() === 2)
    assert(got.filter(col("path").endsWith("b.jpg"))
      .select("length").as[Long].head() === 10L)
  }

  test("serving envelope round-trips via to_json/from_json (S7)") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val results = Graft.knn(emb, emb.filter($"vec_id" === 0L),
        "vec_id", "vec_id", "embedding", k = 3)
      .select($"query_id", $"vec_id".as("id"), $"score".as("distance"))
    val envelope = results
      .groupBy("query_id")
      .agg(collect_list(struct($"id", $"distance")).as("merged_neighbors"))
      .select(to_json(struct(
        lit("success").as("status"),
        struct($"merged_neighbors").as("data"))).as("body"))
    val body = envelope.as[String].head()
    assert(body.startsWith("""{"status":"success","data":{"merged_neighbors":["""))
    val parsed = envelope.select(from_json($"body",
      org.apache.spark.sql.types.StructType.fromDDL(
        "status STRING, data STRUCT<merged_neighbors: ARRAY<STRUCT<id: BIGINT, distance: DOUBLE>>>")))
      .select("from_json(body).data.merged_neighbors")
    assert(parsed.head().getSeq(0).size === 3)
  }

  // ---- upsertLatest (merge-into / SCD1) ----

  test("upsertLatest: newest version wins, inserts pass through, base-only keys survive") {
    val base = Seq((1L, 10L, "a"), (2L, 10L, "b"), (3L, 10L, "c"))
      .toDF("k", "v", "payload")
    val updates = Seq((1L, 20L, "a2"), (4L, 5L, "d"))
      .toDF("k", "v", "payload")
    val got = Ingest.upsertLatest(base, updates, Seq("k"), "v")
      .as[(Long, Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 20L, "a2"), (2L, 10L, "b"),
      (3L, 10L, "c"), (4L, 5L, "d")))
  }

  test("upsertLatest: equal versions resolved by the declared tiebreak, deterministically") {
    val base = Seq((1L, 10L, 100L, "old")).toDF("k", "v", "seq", "payload")
    val updates = Seq((1L, 10L, 200L, "new")).toDF("k", "v", "seq", "payload")
    val got = Ingest.upsertLatest(base, updates, Seq("k"), "v", Seq("seq"))
      .as[(Long, Long, Long, String)].collect()
    assert(got.toSeq === Seq((1L, 10L, 200L, "new")))
    // stale update (lower version) must NOT clobber the base row
    val stale = Seq((1L, 5L, 999L, "stale")).toDF("k", "v", "seq", "payload")
    val kept = Ingest.upsertLatest(base, stale, Seq("k"), "v", Seq("seq"))
      .as[(Long, Long, Long, String)].collect()
    assert(kept.toSeq === Seq((1L, 10L, 100L, "old")))
  }

  test("upsertLatest: composite keys partition independently") {
    val base = Seq((1L, "x", 1L, "b1"), (1L, "y", 1L, "b2")).toDF("k1", "k2", "v", "p")
    val updates = Seq((1L, "x", 2L, "u1")).toDF("k1", "k2", "v", "p")
    val got = Ingest.upsertLatest(base, updates, Seq("k1", "k2"), "v")
      .as[(Long, String, Long, String)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq((1L, "x", 2L, "u1"), (1L, "y", 1L, "b2")))
  }
}
