package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnIvf, ServingCache}

/** A6 cache observability: the LRU serving cache returns the same results
  * as the uncached pruned search, and its hit/miss/eviction counters
  * mirror the reference's `/health` (neighborhood_server.py:286-291). */
class ServingCacheSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
  private lazy val index =
    AnnIvf.build(emb, "vec_id", "embedding", nlist = 8, seed = 42L)

  private def results(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Int)] =
    df.select(col("query_id").cast("long"), col("vec_id").cast("long"), col("rank"))
      .as[(Long, Long, Int)].collect().toSet

  test("cached search equals uncached searchPruned") {
    val cache = new ServingCache(index, maxCachedPartitions = 8)
    val q = emb.filter(col("vec_id") < 5)
    val cached = results(cache.search(q, "vec_id", "embedding", k = 10, nprobe = 3))
    val uncached = results(
      AnnIvf.searchPruned(index, q, "vec_id", "embedding", k = 10, nprobe = 3))
    assert(cached === uncached)
    assert(cached.nonEmpty)
  }

  test("N-thread mixed hot/cold stress: no deadlock, eviction bound holds, " +
      "every result equals the uncached path") {
    // 8 partitions through a 3-slot cache, 8 threads × 4 rounds of
    // different query slices (different probe sets → constant churn of
    // resident/cold/bypass classification). The per-pid load gates +
    // cache monitor must never deadlock (gate never held inside the
    // monitor), never leave >cap resident, and every concurrent search
    // must equal AnnIvf.searchPruned on the same queries.
    val cache = new ServingCache(index, maxCachedPartitions = 3)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    try {
      val tasks = (0 until 8).map { t =>
        pool.submit(new Runnable {
          override def run(): Unit =
            try {
              (0 until 4).foreach { round =>
                val lo = (t * 7 + round * 13) % 40
                val q = emb.filter(col("vec_id") >= lo && col("vec_id") < lo + 4)
                val nprobe = 1 + (t + round) % 5
                val got = results(
                  cache.search(q, "vec_id", "embedding", k = 5, nprobe = nprobe))
                val want = results(AnnIvf.searchPruned(
                  index, q, "vec_id", "embedding", k = 5, nprobe = nprobe))
                if (got != want)
                  failures.add(s"thread $t round $round: $got != $want")
              }
            } catch {
              case e: Throwable => failures.add(s"thread $t threw: $e")
            }
        })
      }
      pool.shutdown()
      // a deadlock (gate vs monitor lock inversion) would hang here
      assert(pool.awaitTermination(300, java.util.concurrent.TimeUnit.SECONDS),
        "stress pool did not finish in 300 s — deadlock or livelock")
      tasks.foreach(_.get())
    } finally pool.shutdownNow()
    assert(failures.isEmpty, failures.toArray.mkString("\n"))
    // eviction bound: never more resident than capacity, and every
    // eviction was preceded by a load (no phantom eviction)
    assert(cache.cachedPartitions.size <= 3)
    assert(cache.evictions.value <= cache.misses.value)
    // the cache did real work across the stress, not all bypass
    assert(cache.hits.value + cache.misses.value > 0)
  }

  test("counters: miss on first load, hit on re-probe, evict past capacity") {
    val cache = new ServingCache(index, maxCachedPartitions = 2)
    val q = emb.filter(col("vec_id") === 0)
    cache.search(q, "vec_id", "embedding", k = 5, nprobe = 2).count()
    assert(cache.misses.value === 2) // two probed partitions, both cold
    assert(cache.hits.value === 0)
    assert(cache.evictions.value === 0)
    assert(cache.cachedPartitions.size === 2)
    assert(cache.rowsLoaded.value > 0)

    cache.search(q, "vec_id", "embedding", k = 5, nprobe = 2).count()
    assert(cache.misses.value === 2) // same partitions: pure hits
    assert(cache.hits.value === 2)

    // probe everything: 8 partitions through a 2-slot cache must NOT
    // thrash — the 2 residents serve as hits, the 6 overflow partitions
    // go through one direct pruned scan (bypasses), and nothing this
    // search paid for is evicted out from under it
    val r = cache.search(q, "vec_id", "embedding", k = 5, nprobe = 8)
    assert(r.count() > 0)
    assert(cache.hits.value === 4) // the 2 residents, re-served
    assert(cache.misses.value === 2) // no new loads
    assert(cache.evictions.value === 0)
    assert(cache.bypasses.value === 6)
    assert(cache.cachedPartitions.size === 2)
    // the wide (cache+bypass) search still equals the uncached pruned path
    assert(results(r) === results(AnnIvf.searchPruned(
      index, q, "vec_id", "embedding", k = 5, nprobe = 8)))
  }

  test("lazy mode: no eager count job, results still equal uncached path") {
    val cache = new ServingCache(index, maxCachedPartitions = 8, eagerLoad = false)
    val q = emb.filter(col("vec_id") < 5)
    val cached = results(cache.search(q, "vec_id", "embedding", k = 10, nprobe = 3))
    val uncached = results(
      AnnIvf.searchPruned(index, q, "vec_id", "embedding", k = 10, nprobe = 3))
    assert(cached === uncached)
    assert(cache.misses.value > 0)
    assert(cache.rowsLoaded.value === 0) // rowsLoaded counts only eager loads
    // second search over the same partitions hits the resident set
    cache.search(q, "vec_id", "embedding", k = 10, nprobe = 3).count()
    assert(cache.hits.value > 0)
  }

  test("stats row has /health shape, via Graft.annStats") {
    val cache = new ServingCache(index, maxCachedPartitions = 4)
    cache.search(emb.filter(col("vec_id") === 1), "vec_id", "embedding",
      k = 3, nprobe = 2).count()
    val row = Graft.annStats(index, cache, "embedding").head()
    assert(row.getAs[Long]("total_vectors") === emb.count())
    assert(row.getAs[Long]("n_partitions") === 8L)
    assert(row.getAs[Long]("n_distinct_dims") === 1L)
    assert(row.getAs[Int]("cached_partitions") === 2)
    assert(row.getAs[Long]("cache_misses") === 2L)
    cache.invalidate()
    assert(cache.cachedPartitions.isEmpty)
    // lifetime counters survive invalidation (process-lifetime semantics)
    assert(cache.misses.value === 2L)
  }
}
