package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
import org.apache.spark.storage.StorageLevel

/** Link analysis — fixed-point PageRank (Page et al. 1999) over an edge
  * list, the link-based quality prior web-corpus curation pipelines rank
  * domains with (Common-Crawl-style harvesting keeps pages whose hosts
  * score well) — the iterative-scoring sibling of [[Components]]'
  * label propagation. The reference has no graph surface; this
  * generalizes its corpus-curation role the same way the dedup stack
  * does.
  *
  * ALL arithmetic is integer fixed-point: ranks live in units of
  * 1e-12 (`Scale`), and each iteration is
  *   contrib(e)  = pr(src) div outdeg(src)          -- exact floor div
  *   pr'(node)   = ((100-d100)·Scale) div (100·N) + (d100·Σ contrib) div 100
  * with damping expressed in PERCENT (`d100`, default 85), so every
  * step is a BIGINT op that replays bit-for-bit in any engine —
  * no float rounding, no .xxx5 boundary risk (house pattern: the
  * HLL/CMS/minhash integer stacks). Floor rounding leaks ≤1 unit of
  * mass per node per step (≈1e-9 relative) — deterministic, and
  * irrelevant for RANKING, which is what the signal is used for.
  * Overflow-safe: Σ contrib ≤ Scale = 1e12, ×85 ≪ 2^63.
  *
  * Dangling nodes (no out-edges) keep receiving the teleport share but
  * contribute nothing — the "leaked mass" PageRank variant; callers
  * wanting stochastic completeness add reverse edges or self-loops
  * upstream (the bipartite query does the former).
  *
  * The iteration core deliberately runs on partition-preserving RDDs —
  * the sanctioned "genuine per-partition imperative logic" case, and
  * the same substrate GraphX/Pregel uses. A DataFrame loop re-plans
  * joins and re-launches AQE stages every round (~1.3 s/round of pure
  * driver overhead at sf0.1, and a fresh edge sort-or-broadcast per
  * round at scale). Here the graph is collapsed ONCE into a hash-
  * partitioned per-source adjacency list (the Spark-examples PageRank
  * layout), so each round's rank join is NODE-sized — the edge set is
  * only ever traversed by the flatMap that emits contributions, and the
  * round's single shuffle is the node-sized map-side-combined
  * `reduceByKey`, the information-theoretic minimum for PageRank.
  * Results are integers, so the output is bit-identical regardless of
  * partitioning. Web-scale hubs are handled by EDGE-PARTITIONING the
  * adjacency above a threshold: a source whose out-list exceeds
  * `hubSplit` is stored as several (src, (totalOutDeg, slice)) records,
  * so no single record/task ever materializes a mega-hub's full
  * out-list; every slice computes the identical per-edge contribution
  * `rank div totalOutDeg` (the total is carried in the record), so the
  * split is invisible in the output — bit-identical ranks at any
  * threshold, which LinkAnalysisSpec pins.
  */
object LinkAnalysis {

  val Scale: Long = 1000000000000L // 1e12: ranks in units of 1e-12

  /** Size the iteration partitioner to the GRAPH, not the cluster
    * default: one partition per [[EdgesPerPartition]] edge endpoints up
    * to the cluster's parallelism. Both bounds are load-bearing — tiny
    * graphs must not dissolve into pure task-launch latency (hundreds of
    * near-empty tasks per round), and large graphs cap at the cluster
    * width anyway. 64 Ki edges/partition ≈ tens of ms of boxed-key work
    * per task per round, ~10× the task-launch cost, while the previous
    * 1 M-edge target left a 32-core box running the whole fixed-point
    * loop on 1-2 partitions (measured: graph_hits wall ≈ its single-task
    * cpu_sec at sf0.1). Output of every caller is pinned bit-identical
    * under any partitioning (integer recurrences; LinkAnalysisSpec), so
    * this is purely a throughput knob. */
  private val EdgesPerPartition = 65536L
  private def roundPartitionCount(
      spark: org.apache.spark.sql.SparkSession, m: Long): Int =
    math.max(1, math.min(spark.sparkContext.defaultParallelism,
      (m / EdgesPerPartition).toInt + 1))
  private def roundPartitioner(
      spark: org.apache.spark.sql.SparkSession, m: Long): HashPartitioner =
    new HashPartitioner(roundPartitionCount(spark, m))

  /** RDD partitioner replicating a DataFrame `repartition(n, col)` hash
    * layout for a LONG key — `pmod(murmur3_hash(key, seed=42), n)`, the
    * exact `HashPartitioning.partitionIdExpression` Spark plans for that
    * exchange. Lets an RDD rebuilt from the exchange's output be
    * CO-PARTITIONED with every later `reduceByKey(part)` in the loop
    * without a second shuffle (spec-pinned against spark_partition_id
    * in LinkAnalysisSpec). */
  private[graft] final class DfLongHashPartitioner(n: Int)
      extends org.apache.spark.Partitioner {
    override def numPartitions: Int = n
    override def getPartition(key: Any): Int = {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32
        .hashLong(key.asInstanceOf[Long], 42)
      val m = h % n
      if (m < 0) m + n else m
    }
    override def equals(other: Any): Boolean = other match {
      case p: DfLongHashPartitioner => p.numPartitions == n
      case _ => false
    }
    override def hashCode: Int = n
  }

  /** Zero-copy narrow view that ATTACHES partitioner metadata to an RDD
    * whose physical layout already is `p` (rebuilt from a DataFrame
    * exchange with the matching hash) — so downstream `reduceByKey(p)`
    * over it stays shuffle-free. */
  private final class KeyedView[K, V](parent: RDD[(K, V)],
      p: org.apache.spark.Partitioner)(implicit
      kt: scala.reflect.ClassTag[K], vt: scala.reflect.ClassTag[V])
      extends RDD[(K, V)](parent) {
    override val partitioner: Option[org.apache.spark.Partitioner] = Some(p)
    override protected def getPartitions: Array[org.apache.spark.Partition] =
      firstParent[(K, V)].partitions
    override def compute(split: org.apache.spark.Partition,
        context: org.apache.spark.TaskContext): Iterator[(K, V)] =
      firstParent[(K, V)].iterator(split, context)
  }

  /** Canonical undirected LONG edge frame (u, v) → hash-partitioned,
    * hub-sliced PRIMITIVE adjacency: (node, Array[Long] neighbors), plus
    * |sym| = 2·E and the shared round partitioner. The frame is read
    * through `queryExecution.toRdd` (primitive `getLong`, no external
    * Row decode — the Row path measured ~7 µs/edge of pure boxing) and
    * the per-node lists grow in `ArrayBuilder.ofLong` (primitive
    * backing array, no element boxing). Returns (null, 0, null) for an
    * empty graph. Caller owns unpersisting `adj`. */
  private def buildAdjLong(eDist: DataFrame, hubSplit: Int)
      : (RDD[(Long, Array[Long])], Long, org.apache.spark.Partitioner) = {
    val spark = eDist.sparkSession
    val m2 = eDist.count() * 2
    if (m2 == 0L) return (null, 0L, null)
    val nParts = roundPartitionCount(spark, m2)
    val part = new DfLongHashPartitioner(nParts)
    // symmetrize + place THROUGH A DATAFRAME EXCHANGE (Tungsten rows,
    // whole-stage codegen, no per-record Kryo): r18's aggregateByKey
    // Kryo-(de)serialized an ArrayBuilder combiner per key on both
    // shuffle sides — tools/Profile measured that build at 7.3 of
    // graph_bfs' 19 cpu-s; an RDD partitionBy of the raw pairs paid
    // ~6 µs/record in Kryo stream overhead instead. The DF exchange
    // ships compact UnsafeRows, and the grouped primitive adjacency is
    // read straight off it (InternalRow getLong — no Row decode). The
    // murmur3-matched `part` (above) keeps the result co-partitioned
    // with every later reduceByKey(part) — no second shuffle.
    // (A columnar persist of eDist to avoid its double execution was
    // measured SLOWER than the re-execution — cache build+read 4.2 cpu-s
    // vs 1.6 for the second scan+distinct — so the count executes the
    // plan once and the union below executes it again, deliberately.)
    val c0 = eDist.columns(0)
    val c1 = eDist.columns(1)
    val symDf = eDist.select(col(c0).as("n"), col(c1).as("d"))
      .union(eDist.select(col(c1).as("n"), col(c0).as("d")))
      .repartition(nParts, col("n"))
    val adj: RDD[(Long, Array[Long])] = new KeyedView(
      symDf.queryExecution.toRdd.mapPartitions { rows =>
        val m = new scala.collection.mutable.LongMap[
          scala.collection.mutable.ArrayBuilder.ofLong]()
        rows.foreach { r =>
          m.getOrElseUpdate(r.getLong(0),
            new scala.collection.mutable.ArrayBuilder.ofLong) += r.getLong(1)
        }
        m.iterator.flatMap { case (s, b) =>
          val arr = b.result()
          if (arr.length <= hubSplit) Iterator.single((s, arr))
          else arr.grouped(hubSplit).map(g => (s, g))
        }
      }, part).persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()
    (adj, m2, part)
  }

  /** Fixed-point PageRank.
    *
    * @param edges   directed edge list; duplicates are collapsed; src
    *                and dst must share one data type
    * @param srcCol  source-node column
    * @param dstCol  destination-node column
    * @param iterations fixed iteration count (deterministic output)
    * @param d100    damping factor in percent (85 ⇒ d = 0.85)
    * @param assumeDistinct caller guarantees the edge list is already
    *                duplicate-free (e.g. built from a `distinct()` pair
    *                set fanned out over disjoint prefixes) — skips the
    *                internal edge-set shuffle
    * @param hubSplit out-degree above which a source's adjacency is
    *                edge-partitioned into slices of this size (the
    *                mega-hub layout); output is bit-identical at any
    *                value ≥ 1
    * @param teleportSeeds when non-empty, PERSONALIZED PageRank (random
    *                walk with restart): the teleport mass and the
    *                initial distribution concentrate uniformly on these
    *                seed nodes instead of the whole graph — rank becomes
    *                proximity-to-the-seed-set, the classic
    *                recommendation / related-items primitive
    *                (Jeh & Widom 2003 "Scaling personalized web search").
    *                Seeds must be nodes of the graph (an absent seed
    *                strands its share of the restart mass). Passing
    *                EVERY node is bit-identical to the empty default.
    * @return (node, pr) — pr is the fixed-point rank in units of
    *         1e-12; divide by `Scale.toDouble` for the float view
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 5,
      d100: Int = 85,
      assumeDistinct: Boolean = false,
      hubSplit: Int = 100000,
      teleportSeeds: Seq[Any] = Nil): DataFrame = {
    require(iterations >= 0 && d100 >= 0 && d100 <= 100 && hubSplit >= 1)
    val spark = edges.sparkSession
    val nodeType = edges.schema(srcCol).dataType
    require(edges.schema(dstCol).dataType == nodeType,
      s"src/dst type mismatch: $nodeType vs ${edges.schema(dstCol).dataType}")

    // null endpoints filtered like every sibling operator: an unfiltered
    // null would become a graph NODE and then a null value under the
    // nullable=false output schema — a false non-null contract Catalyst
    // is allowed to optimize against
    val eDist = edges.select(col(srcCol), col(dstCol))
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
    val e: RDD[(Any, Any)] = (if (assumeDistinct) eDist else eDist.distinct())
      .rdd.map(r => (r.get(0), r.get(1)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // size the round partitioner to the GRAPH, not the cluster default:
    // a round is a handful of narrow stages, and over-partitioning tiny
    // graphs turns each into pure task-launch latency, while huge graphs
    // get one partition per ~250k edges up to the cluster's parallelism —
    // the same fit-the-partition-to-the-data rule the sinks use
    val m = e.count()
    // empty graph: n = 0 would divide the teleport mass by zero below —
    // the honest answer is an empty rank table, not an ArithmeticException
    if (m == 0) {
      e.unpersist(blocking = false)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("node", nodeType, nullable = false),
          StructField("pr", LongType, nullable = false))))
    }
    val part = roundPartitioner(spark, m)

    // collapse to per-source adjacency ONCE; every later round joins
    // rank against NODE-sized tables only, and the edge set is traversed
    // solely by the contribution flatMap. Sources above `hubSplit`
    // out-degree are edge-partitioned into slices that each carry the
    // TOTAL out-degree, so the per-edge contribution is computed
    // identically from any slice (keys are unchanged, so the hash
    // partitioning is preserved through the slicing).
    // Honest bound: the slices cap each ROUND's per-record size, but the
    // one-time aggregateByKey build still merges a hub's whole out-list
    // in one combiner before slicing (and all slices of one key land in
    // one hash partition) — ~1 GB of boxed refs per 10^8-degree hub in
    // that task. Splitting the BUILD too needs salted keys plus a
    // total-degree join; do it if a corpus with 10^8-degree hubs ever
    // actually shows up
    // flat hash shuffle + one single-pass per-partition group (see
    // buildAdjLong): the aggregateByKey combiner form Kryo-serialized an
    // ArrayBuffer per key both ways — tools/Profile measured its reduce
    // side at 5.0 of graph_pagerank's 10.2 cpu-s at sf0.1
    val adj: RDD[(Any, (Int, Array[Any]))] = e.partitionBy(part)
      .mapPartitions({ it =>
        val m = new java.util.HashMap[
          Any, scala.collection.mutable.ArrayBuffer[Any]]()
        it.foreach { case (s, d) =>
          var b = m.get(s)
          if (b == null) {
            b = scala.collection.mutable.ArrayBuffer.empty[Any]; m.put(s, b)
          }
          b += d
        }
        import scala.jdk.CollectionConverters._
        m.entrySet().iterator().asScala.flatMap { en =>
          val s = en.getKey; val buf = en.getValue
          val n = buf.length
          if (n <= hubSplit) Iterator.single((s, (n, buf.toArray)))
          else buf.grouped(hubSplit).map(g => (s, (n, g.toArray)))
        }
      }, preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = e.flatMap { case (s, d) => Iterator((s, ()), (d, ())) }
      .reduceByKey(part, (a, _) => a) // distinct, landing directly on `part`
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    adj.count()
    e.unpersist(blocking = false)
    // personalized: restart mass and init concentrate on the seed set;
    // the uniform default is the seeds-= everything special case
    val personalized = teleportSeeds.nonEmpty
    // distinct BEFORE sizing: nRestart counting duplicate seeds while the
    // membership set dedups them would silently dilute every seed's
    // teleport mass (total rank mass < Scale)
    val seedsDistinct = teleportSeeds.distinct
    val nRestart = if (personalized) seedsDistinct.size.toLong else n
    val bcSeeds = spark.sparkContext.broadcast(seedsDistinct.toSet)
    val teleport = (100L - d100) * Scale / (100L * nRestart)

    // rank is a pure function of the in-sum (pr = teleport + d·s div 100,
    // s = 0 when absent), so the loop carries the NODE-sized in-sum and
    // folds the rank update into the next round's adjacency join — ONE
    // narrow cogroup + one node-sized shuffle per round. Round 1 needs
    // no join at all: every rank is the uniform init.
    val init = Scale / nRestart
    def isSeed(node: Any): Boolean = !personalized || bcSeeds.value.contains(node)
    def rankOf(node: Any, s: Option[Long]): Long =
      (if (isSeed(node)) teleport else 0L) + d100 * s.getOrElse(0L) / 100
    var insum: RDD[(Any, Long)] =
      if (iterations == 0) null
      else adj.flatMap { case (src, (deg, dsts)) =>
        if (isSeed(src)) {
          val c = init / deg
          dsts.iterator.map(d => (d, c))
        } else Iterator.empty // init 0 off-seed: nothing to contribute
      }.reduceByKey(part, _ + _)
    for (_ <- 2 to iterations) {
      // the round's rank attach is a narrow co-partitioned zipPartitions
      // probe: the NODE-sized in-sum builds a small hash map and the
      // persisted adjacency streams past it (the cogroup join form
      // hash-built the whole adjacency every round — measured ~2 cpu-s
      // a round at bench scale for pure rebuild). The output re-keys to
      // the destination, so the reduceByKey keeps its (node-sized,
      // map-side combined) shuffle — the round's ONLY one; contribution
      // order never matters (integer adds); a hub's slices each probe
      // the same rank record and emit the same `rank div totalDeg`.
      insum = adj.zipPartitions(insum) { (aIt, sIt) =>
        val sm = new java.util.HashMap[Any, java.lang.Long]()
        sIt.foreach { case (nd, s) => sm.put(nd, s) }
        aIt.flatMap { case (src, (deg, dsts)) =>
          val sv = sm.get(src)
          val c = rankOf(src,
            if (sv == null) None else Some(sv.longValue())) / deg
          dsts.iterator.map(d => (d, c))
        }
      }.reduceByKey(part, _ + _)
    }
    val pr: RDD[(Any, Long)] =
      if (insum == null)
        nodes.map { case (node, _) => (node, if (isSeed(node)) init else 0L) }
      else nodes.leftOuterJoin(insum, part)
        .map { case (node, (_, s)) => (node, rankOf(node, s)) }

    val rows = pr.map { case (node, p) => Row(node, p) }
    val out = spark.createDataFrame(rows,
        StructType(Seq(StructField("node", nodeType, nullable = false),
          StructField("pr", LongType, nullable = false))))
      .localCheckpoint(eager = true)
    adj.unpersist(blocking = false)
    nodes.unpersist(blocking = false)
    out
  }

  /** HITS fixed-point scale: 1e6 keeps every intermediate in BIGINT —
    * a raw score is ≤ maxInDegree·Scale, and the normalization multiply
    * raises it by another Scale factor, so exactness holds while
    * maxDegree < 2⁶³/ScaleHits² ≈ 9.2e6. Ranking resolution 1e-6 is the
    * house 6-dp standard. */
  val ScaleHits: Long = 1000000L

  /** HITS hubs/authorities (Kleinberg 1999, JACM 46(5)) — the other
    * classic link-quality prior: a good HUB points at good authorities,
    * a good AUTHORITY is pointed at by good hubs. Same integer
    * fixed-point discipline as [[pageRank]], with one twist: HITS needs
    * a per-round normalization, and to keep every step an exact BIGINT
    * op this uses the max-norm variant (divide by the round's maximum
    * score) — any norm yields the same RANKING, which is what the
    * signal is used for, and max-norm replays bit-for-bit in SQL where
    * an L2 norm would not.
    *
    * Per round (hub⁰ = Scale uniformly):
    *   araw(v) = Σ_{u→v} hub(u);  auth(v) = araw(v)·Scale div max araw
    *   hraw(u) = Σ_{u→v} auth(v); hub(u)  = hraw(u)·Scale div max hraw
    * Nodes with no in-edges have auth 0; no out-edges ⇒ hub 0.
    *
    * Spark shape: forward AND reverse adjacency built once on one
    * partitioner; each half-round is a node-sized narrow join + the
    * node-sized map-side-combined `reduceByKey` — identical plan
    * economics to [[pageRank]], plus one scalar `max` action per
    * half-round on a persisted node-sized RDD (the per-round driver
    * roundtrip every normalized iterative method pays).
    *
    * @return (node, auth, hub) — fixed-point scores in units of
    *         1/[[ScaleHits]]
    */
  def hits(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 3,
      assumeDistinct: Boolean = false): DataFrame = {
    require(iterations >= 1)
    val spark = edges.sparkSession
    val nodeType = edges.schema(srcCol).dataType
    require(edges.schema(dstCol).dataType == nodeType,
      s"src/dst type mismatch: $nodeType vs ${edges.schema(dstCol).dataType}")

    val eDist = edges.select(col(srcCol), col(dstCol))
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
    // ONE execution of the edge plan (columnar cache serves the sizing
    // count and the build — without it an assumeDistinct=false caller
    // would pay its distinct exchange twice, the buildAdjLong lesson)
    val eFrame = (if (assumeDistinct) eDist else eDist.distinct())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val m = eFrame.count()
    require(m > 0, "HITS needs at least one edge")
    val e: RDD[(Any, Any)] = eFrame.rdd.map(r => (r.get(0), r.get(1)))
    val part = roundPartitioner(spark, m)

    // ONE grouping pass builds out-lists, in-lists, AND the node set
    // (the pre-r18 shape paid three edge-sized shuffles and pinned
    // three RDDs: fwd, rev, and a distinct-endpoints reduce). `both` has
    // exactly one record per endpoint, so its KEYS are the node set;
    // fwd/rev are narrow partition-preserving views over the one
    // persisted RDD. Grouping is a flat hash shuffle + one per-partition
    // pass (see buildAdjLong) — the r18 aggregateByKey combiner form
    // Kryo-serialized a pair-of-ArrayBuffers per key both ways, measured
    // (tools/Profile) at 3.0 of graph_hits' 5.9 cpu-s at sf0.1.
    val both: RDD[(Any, (Array[Any], Array[Any]))] = e
      .flatMap { case (s, d) => Iterator((s, (d, true)), (d, (s, false))) }
      .partitionBy(part)
      .mapPartitions({ it =>
        val m = new java.util.HashMap[Any,
          (scala.collection.mutable.ArrayBuffer[Any],
            scala.collection.mutable.ArrayBuffer[Any])]()
        it.foreach { case (n, (p, isOut)) =>
          var b = m.get(n)
          if (b == null) {
            b = (scala.collection.mutable.ArrayBuffer.empty[Any],
              scala.collection.mutable.ArrayBuffer.empty[Any])
            m.put(n, b)
          }
          if (isOut) b._1 += p else b._2 += p
        }
        import scala.jdk.CollectionConverters._
        m.entrySet().iterator().asScala.map { en =>
          (en.getKey, (en.getValue._1.toArray, en.getValue._2.toArray))
        }
      }, preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    both.count()
    eFrame.unpersist(blocking = false)
    val fwd = both.mapPartitions(                           // u -> out(u)
      _.collect { case (n, (o, _)) if o.nonEmpty => (n, o) },
      preservesPartitioning = true)
    val rev = both.mapPartitions(                           // v -> in(v)
      _.collect { case (n, (_, i)) if i.nonEmpty => (n, i) },
      preservesPartitioning = true)
    val nodes = both.mapPartitions(
      _.map { case (n, _) => (n, ()) }, preservesPartitioning = true)

    val live = scala.collection.mutable.ArrayBuffer.empty[RDD[_]]
    // one half-round: raw = Σ over `a` of the partner score (uniform
    // `init` on round 1, else the node-keyed partner RDD), then max-norm
    def halfRound(a: RDD[(Any, Array[Any])], partner: RDD[(Any, Long)],
        init: Long): RDD[(Any, Long)] = {
      // partner attach = narrow co-partitioned zipPartitions probe (the
      // node-sized partner score map streams the persisted adjacency —
      // no per-round cogroup hash build of the adjacency; inner-join
      // semantics kept: unscored nodes contribute nothing). Output
      // re-keys to the neighbor, so the reduce keeps its shuffle.
      val raw = (if (partner == null)
          a.flatMap { case (_, ds) => ds.iterator.map(d => (d, init)) }
        else a.zipPartitions(partner) { (aIt, pIt) =>
          val pm = new java.util.HashMap[Any, java.lang.Long]()
          pIt.foreach { case (nd, s) => pm.put(nd, s) }
          aIt.flatMap { case (src, ds) =>
            val sv = pm.get(src)
            if (sv == null) Iterator.empty
            else { val s = sv.longValue(); ds.iterator.map(d => (d, s)) }
          }
        })
        .reduceByKey(part, _ + _)
        .persist(StorageLevel.MEMORY_AND_DISK)
      live += raw
      val mx = raw.values.max()
      // the documented exactness bound (maxDegree < 2^63/ScaleHits^2, see
      // ScaleHits scaladoc) enforced at runtime: s <= mx, so one check on
      // the round maximum guards every normalization multiply — real
      // web-graph authorities exceed ~9.2e6 in-degree and would otherwise
      // wrap into negative scores with no error (modularity() fails
      // loudly for its analogous bound; so does HITS now)
      require(mx <= Long.MaxValue / ScaleHits,
        s"HITS: round max raw score $mx would overflow the ScaleHits " +
          "normalization — in-degree beyond the documented ~9.2e6 bound")
      raw.mapValues(s => s * ScaleHits / mx)
    }

    var auth: RDD[(Any, Long)] = null
    var hub: RDD[(Any, Long)] = null
    for (i <- 1 to iterations) {
      auth = halfRound(fwd, hub, ScaleHits) // hub⁰ is uniform
      hub = halfRound(rev, auth, 0L)
    }

    // final attach: one narrow 3-way zipPartitions over the
    // co-partitioned node set and score maps (was two cogroup joins)
    val scored = nodes.zipPartitions(auth, hub) { (nIt, aIt, hIt) =>
      val am = new java.util.HashMap[Any, java.lang.Long]()
      aIt.foreach { case (n, s) => am.put(n, s) }
      val hm = new java.util.HashMap[Any, java.lang.Long]()
      hIt.foreach { case (n, s) => hm.put(n, s) }
      nIt.map { case (node, _) =>
        val a = am.get(node); val h = hm.get(node)
        Row(node, if (a == null) 0L else a.longValue(),
          if (h == null) 0L else h.longValue())
      }
    }
    val out = spark.createDataFrame(scored,
        StructType(Seq(StructField("node", nodeType, nullable = false),
          StructField("auth", LongType, nullable = false),
          StructField("hub", LongType, nullable = false))))
      .localCheckpoint(eager = true)
    (live ++ Seq(both)).foreach(_.unpersist(blocking = false))
    out
  }

  /** Per-node triangle count, degree, and local clustering coefficient
    * over an undirected graph given as a pair list — the community-
    * density signal of the link-quality stack (a crawl host whose
    * neighborhood closes lots of triangles is an organic community; link
    * farms are star-shaped), complementing [[pageRank]]'s centrality and
    * [[Components]]' reachability.
    *
    * Pure DataFrame joins (no iteration), with the classic DEGREE-ORDERED
    * orientation (Suri & Vassilvitskii, WWW'11 "Counting triangles and
    * the curse of the last reducer"): every canonical edge is directed
    * from its lower-(degree, id) endpoint to the higher, which bounds any
    * node's out-degree by O(√m) — so the wedge self-join (the only
    * superlinear step) does Σ outdeg² ≤ m^1.5 work spread evenly across
    * keys instead of deg² on hub nodes. The triangle SET is orientation-
    * independent (each triangle is generated exactly once, at its
    * lowest-rank corner), which is what makes the query oracle-checkable
    * against a plain id-ordered SQL enumeration.
    *
    * lcc = 2·triangles / (degree·(degree−1)) — one IEEE division of two
    * exact integers, rounded to 6 dp, so Spark and DuckDB agree bitwise;
    * degree-1 nodes get lcc 0.
    *
    * @return (node BIGINT, degree BIGINT, triangles BIGINT, lcc DOUBLE),
    *         one row per node that appears in `pairs`. */
  /** k-core: the maximal subgraph in which every node has degree ≥ k
    * (Seidman 1983), by Matula–Beck peeling — iteratively drop nodes with
    * degree < k and their edges until nothing changes. In curation this
    * isolates the densely-interlinked hub/boilerplate clusters that raw
    * degree or PageRank over-ranks; genuinely iterative (monotone edge
    * DELETION), so unlike the fixed-point rank queries it has no
    * recursive-SQL replay — correctness is KCoreSpec's (brute-force
    * peeling equivalence + the degree/maximality invariants).
    *
    * Scale shape (INCREMENTAL degree maintenance — the r18 rewrite of
    * the recompute-from-scratch DataFrame loop, for INTEGRAL node ids):
    * the adjacency is collapsed ONCE into the hash-partitioned
    * hub-sliced PRIMITIVE layout of [[buildAdjLong]], and the loop
    * carries only the NODE-sized live degree map. Per round, the set of
    * sub-k nodes is dropped and each dropped node sends one decrement
    * per incident edge — decrement traffic TOTALS O(E) across all
    * rounds (every edge dies at most twice), where the old shape paid a
    * full 2·E degree aggregate plus two edge-set semi-joins and an
    * edge-set checkpoint write EVERY round. The per-round adjacency
    * probe is a narrow co-partitioned zipPartitions with a sorted-array
    * membership test — no shuffle, no cogroup hash build, no boxing
    * (the boxed join form of this loop measured 5× the OLD shape's
    * CPU before the primitive specialization; measure first). Rounds
    * are the same synchronous Matula–Beck peel (all current sub-k nodes
    * leave together), so the per-round survivor sets — and the
    * maxIter-truncated partial result — are exactly the old
    * implementation's; KCoreSpec pins that equivalence. Non-integral
    * node ids (no primitive encoding) take the pre-r18 DataFrame peel,
    * kept verbatim.
    *
    * A graph whose peeling depth exceeds `maxIter` (pathological chains)
    * does NOT fail the query: peeling is monotone deletion, so the
    * partially-peeled result is a valid SUPERSET of the k-core — it is
    * returned as-is with a logged warning, and equals the k-core exactly
    * whenever `maxIter` ≥ peeling depth.
    *
    * Output: (node, core_degree) for k-core members — core_degree is the
    * degree WITHIN the core (≥ k by the fixpoint). */
  def kCore(
      pairs: DataFrame,
      leftCol: String,
      rightCol: String,
      k: Int,
      maxIter: Int = 100): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType}
    val nodeType = pairs.schema(leftCol).dataType
    require(pairs.schema(rightCol).dataType == nodeType,
      s"endpoint type mismatch: $nodeType vs ${pairs.schema(rightCol).dataType}")
    nodeType match {
      case ByteType | ShortType | IntegerType | LongType =>
        kCoreIntegral(pairs, leftCol, rightCol, k, maxIter)
      case _ => kCoreGeneric(pairs, leftCol, rightCol, k, maxIter)
    }
  }

  private def kCoreIntegral(
      pairs: DataFrame,
      leftCol: String,
      rightCol: String,
      k: Int,
      maxIter: Int): DataFrame = {
    val spark = pairs.sparkSession
    val nodeType = pairs.schema(leftCol).dataType
    val eDist = pairs
      .select(col(leftCol).cast("long").as("a"),
        col(rightCol).cast("long").as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val (adj, m2, part) = buildAdjLong(eDist, hubSplit = 100000)
    val outSchema = StructType(Seq(
      StructField("node", LongType, nullable = false),
      StructField("core_degree", LongType, nullable = false)))
    def toNodeType(df: DataFrame): DataFrame =
      if (nodeType == LongType) df
      else df.select(col("node").cast(nodeType).as("node"), col("core_degree"))
    if (m2 == 0L)
      return toNodeType(spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], outSchema))
    // live degrees, node-sized; slices of one hub sum back to its degree
    var alive: RDD[(Long, Long)] = adj
      .mapPartitions(_.map { case (n, a) => (n, a.length.toLong) },
        preservesPartitioning = true)
      .reduceByKey(part, _ + _)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // convergence is detected from the survivor count (next == alive ⟺
    // the round removed nothing ⟺ no node had degree < k), so each round
    // is ONE action — the r18 shape paid a separate removed.count() job
    // per round on top of next.count()
    var aliveCount = alive.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // removed recomputes narrowly from the persisted alive — cheaper
      // than persist/unpersist churn for a set read twice per round
      val removed = alive.mapPartitions(_.filter(_._2 < k),
        preservesPartitioning = true)
      locally {
        // each removed node decrements every neighbor once; decrements
        // aimed at other removed nodes vanish in the survivor probe —
        // the survivor degrees are exactly the induced-subgraph degrees,
        // so each round equals one synchronous recompute-from-scratch
        // peel. Membership tests are sorted-Array binary search / LongMap
        // probes over CO-PARTITIONED sides (zipPartitions — no cogroup
        // hash build, no boxing; the boxed join form of this loop
        // measured 5× the CPU of the old DataFrame peel): the round's
        // only shuffle is the decrement reduceByKey, sized by the
        // round's dying edges.
        // preservesPartitioning MUST be false here: the emitted key is
        // the NEIGHBOR, not the probed node — claiming the old layout
        // would let reduceByKey skip its shuffle and sum only
        // partition-local decrements (caught by the sf0.01 oracle diff:
        // kcore over-kept 267 nodes, bfs under-discovered 6k)
        val dec: RDD[(Long, Long)] = adj.zipPartitions(removed) { (aIt, rIt) =>
          val rs = rIt.map(_._1).toArray
          java.util.Arrays.sort(rs)
          if (rs.isEmpty) Iterator.empty
          else aIt.flatMap { case (n, nbrs) =>
            if (java.util.Arrays.binarySearch(rs, n) >= 0)
              nbrs.iterator.map((_, 1L))
            else Iterator.empty
          }
        }.reduceByKey(part, _ + _)
        val next = alive.zipPartitions(
            dec, preservesPartitioning = true) { (aIt, dIt) =>
          val dm = new scala.collection.mutable.LongMap[Long]()
          dIt.foreach { case (n, c) => dm(n) = c }
          aIt.collect { case (n, d) if d >= k => (n, d - dm.getOrElse(n, 0L)) }
        }.persist(StorageLevel.MEMORY_AND_DISK)
        // bound closure/lineage depth on pathological deep peels — the
        // truncation is metadata-only (the RDD is persisted either way)
        if (iter % 16 == 15) next.localCheckpoint()
        val nextCount = next.count()
        if (nextCount == aliveCount) {
          // nothing was removed (next ≡ alive): fixpoint reached
          converged = true
          next.unpersist(blocking = false)
        } else {
          alive.unpersist(blocking = false)
          alive = next
          aliveCount = nextCount
        }
      }
      iter += 1
    }
    if (!converged) {
      val live = alive.filter(_._2 >= 1L).count()
      if (live > 0L)
        org.slf4j.LoggerFactory.getLogger(LinkAnalysis.getClass).warn(
          s"kCore: no fixpoint after $maxIter rounds ($live nodes live); " +
            "returning the current still-shrinking superset of the k-core")
    }
    // degree-0 stragglers (possible only on the truncated path) match the
    // old shape's "no edge rows -> no degree row" behavior via the filter
    val rows = alive.filter(_._2 >= 1L).map { case (n, d) => Row(n, d) }
    val out = toNodeType(spark.createDataFrame(rows, outSchema))
      .localCheckpoint(eager = true)
    adj.unpersist(blocking = false)
    alive.unpersist(blocking = false)
    out
  }

  /** The pre-r18 DataFrame peel, kept verbatim for NON-integral node
    * ids (strings, decimals), which have no primitive-long encoding. */
  private def kCoreGeneric(
      pairs: DataFrame,
      leftCol: String,
      rightCol: String,
      k: Int,
      maxIter: Int): DataFrame = {
    def degrees(e: DataFrame): DataFrame =
      e.select(col("u").as("node"))
        .unionAll(e.select(col("v").as("node")))
        .groupBy("node").agg(count(lit(1)).as("core_degree"))
    var edges = pairs
      .select(col(leftCol).as("a"), col(rightCol).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint(eager = true)
    var n = edges.count()
    var iter = 0
    var converged = n == 0L
    while (!converged && iter < maxIter) {
      val keep = degrees(edges).filter(col("core_degree") >= k).select("node")
      val pruned = edges
        .join(keep.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .localCheckpoint(eager = true)
      val m = pruned.count()
      converged = m == n
      // pruned is MATERIALIZED (eager), so the superseded round's edge
      // copy can go — without this a deep peel pins O(rounds) edge-set
      // copies of un-evictable (lineage-truncated) blocks. The FINAL
      // round's checkpoint stays: the returned degrees plan reads it.
      releaseCheckpoint(edges)
      edges = pruned
      n = m
      iter += 1
    }
    if (!converged && n > 0L)
      org.slf4j.LoggerFactory.getLogger(LinkAnalysis.getClass).warn(
        s"kCore: no fixpoint after $maxIter rounds ($n edges live); " +
          "returning the current still-shrinking superset of the k-core")
    degrees(edges)
  }

  def triangles(pairs: DataFrame, leftCol: String, rightCol: String): DataFrame = {
    val e = pairs
      .select(col(leftCol).cast("long").as("a"), col(rightCol).cast("long").as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
      .localCheckpoint(eager = true) // scanned 4× below (deg ×2, orient, closure)
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    // orient by (degree, id) rank; carry the head's rank key so the wedge
    // step can order its two spokes without re-joining degrees
    val du = deg.select(col("node").as("u"), col("degree").as("du"))
    val dv = deg.select(col("node").as("v"), col("degree").as("dv"))
    val ranked = e.join(du, "u").join(dv, "v")
    val lowFirst = struct(col("du"), col("u")) < struct(col("dv"), col("v"))
    val oriented = ranked.select(
        when(lowFirst, col("u")).otherwise(col("v")).as("lo"),
        when(lowFirst, col("v")).otherwise(col("u")).as("hi"),
        when(lowFirst, col("dv")).otherwise(col("du")).as("dhi"))
      .localCheckpoint(eager = true) // feeds wedges twice + closure probe
    // wedges at the lowest-rank corner: two out-edges of `lo`, spokes
    // ordered by rank so the closing edge (b→c) is probed in ITS
    // orientation; the closure join is equi on both endpoints
    val o1 = oriented.select(col("lo"), col("hi").as("b"), col("dhi").as("db"))
    val o2 = oriented.select(col("lo"), col("hi").as("c"), col("dhi").as("dc"))
    val wedges = o1.join(o2, "lo")
      .filter(struct(col("db"), col("b")) < struct(col("dc"), col("c")))
    val closing = oriented.select(col("lo").as("b"), col("hi").as("c"))
    val tris = wedges.join(closing, Seq("b", "c"))
      .select(col("lo").as("x"), col("b").as("y"), col("c").as("z"))
    val perNode = tris.select(col("x").as("node"))
      .unionAll(tris.select(col("y").as("node")))
      .unionAll(tris.select(col("z").as("node")))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        round(
          when(col("degree") < 2, lit(0.0))
            .otherwise(lit(2.0) * coalesce(col("triangles"), lit(0L)) /
              (col("degree") * (col("degree") - 1))), 6).as("lcc"))
  }

  /** Deterministic random-walk corpus over an undirected graph — the
    * DeepWalk/node2vec (p=q=1) sampling step (Perozzi et al. KDD'14)
    * that turns a graph into skip-gram training sequences. Each of
    * `walksPerNode` walks per start node takes `length` uniform steps;
    * the "random" choice at (walk, step) is the portable split hash
    * reduced mod the node's degree over its id-RANKED neighbor list, so
    * the whole corpus is a pure function of (graph, seed): layout-
    * stable, re-ingest-stable, and replayable step by step in SQL —
    * `rand()`-driven walks would re-sample differently every run and be
    * uncheckable.
    *
    * Scale shape: the ranked adjacency is built once (one window sort by
    * node); each step is ONE equi-join of the walk frontier (|V|·W rows)
    * against it, lineage truncated per step — L joins total, no
    * iteration-to-fixpoint, no driver state. Hub neighbor lists are
    * rows, not arrays, so a mega-hub never materializes its list.
    *
    * Key contract (shared with [[biasedWalks]] and the Poisson
    * bootstrap): the lottery key is `(start·W + walk)·(L+1) + step`
    * before the 2³² fold — node ids must stay < 2⁶³/(W·(L+1)) or Spark
    * wraps silently while an overflow-checked SQL replay errors.
    *
    * Degree contract: the draw is `bucket mod degree` with bucket
    * uniform on [0, 1000003), so a node's degree (or, in
    * [[biasedWalks]], its total candidate WEIGHT) must stay well below
    * ~10⁶: at degree ≥ 1000003 the tail of the id-ranked neighbor list
    * is unreachable, and as degree approaches it the modulo bias skews
    * transitions (≤0.1 % skew at degree 1000 — negligible; material
    * past ~10⁵). Hub-heavy graphs should split mega-hubs (PageRank's
    * `hubSplit` pattern) or contract them before walking.
    *
    * @return (start BIGINT, walk INT, step INT, node BIGINT) — step 0 is
    *         the start node; (length+1) rows per walk. */
  def randomWalks(
      pairs: DataFrame,
      leftCol: String,
      rightCol: String,
      walksPerNode: Int,
      length: Int,
      seed: Long): DataFrame = {
    require(walksPerNode >= 1 && length >= 1, "need >=1 walks of >=1 steps")
    val e = pairs
      .select(col(leftCol).cast("long").as("u"), col(rightCol).cast("long").as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
    val sym = e.select(col("u").as("node"), col("v").as("nbr"))
      .unionAll(e.select(col("v").as("node"), col("u").as("nbr")))
    import org.apache.spark.sql.expressions.Window
    val ranked = sym
      .withColumn("rank",
        row_number().over(Window.partitionBy("node").orderBy("nbr")))
      .withColumn("deg", count(lit(1)).over(Window.partitionBy("node")))
      .localCheckpoint(eager = true) // probed once per step
    val starts = ranked.select(col("node")).distinct()
      .withColumn("walk", explode(array((0 until walksPerNode).map(lit): _*)))
      .select(col("node").as("start"), col("walk"), lit(0).as("step"),
        col("node"))
    var frontier = starts.localCheckpoint(eager = true)
    val steps = scala.collection.mutable.ArrayBuffer[DataFrame](frontier)
    for (st <- 1 to length) {
      // walkId·(L+1)+step keys the draw: every (walk, step) is its own
      // independent lottery, shared textually with the SQL replay
      val key = (col("start") * walksPerNode + col("walk")) *
        (length + 1) + lit(st)
      val pick = pmod(
        Sampling.portableSplitBucket(key, seed, 1000003), col("deg"))
      frontier = frontier
        .join(ranked, Seq("node"))
        .filter(col("rank") === pick + 1)
        .select(col("start"), col("walk"), lit(st).as("step"),
          col("nbr").as("node"))
        .localCheckpoint(eager = true)
      steps += frontier
    }
    // deliberately NOT releaseCheckpoint'd: unlike the fixpoint loops,
    // no step supersedes another — the returned union reads EVERY
    // step's checkpoint, so all L+1 frontiers (each |starts|-sized, not
    // edge-set-sized) stay live by construction
    steps.reduce(_ unionByName _)
  }

  /** Second-order (node2vec) biased random walks (Grover & Leskovec
    * KDD'16): like [[randomWalks]], but from step 2 on the transition
    * out of `cur` is weighted by where the candidate sits relative to
    * `prev` — `wReturn` for going back (1/p in paper units), `wCommon`
    * for a mutual neighbor of prev (BFS-ish), `wFar` otherwise
    * (DFS-ish). Weights are INTEGERS and the draw is the portable hash
    * mod the total weight over the id-ranked candidate list, so the
    * corpus remains a pure function of (graph, seed) and every step
    * replays in SQL — the property float-normalized transition
    * probabilities can't give.
    *
    * Scale shape per step: one frontier×adjacency equi-join (candidate
    * rows = Σ frontier degrees), one broadcast-free edge-existence probe
    * (equi-join on the canonical pair), and one per-walk window cumsum —
    * no alias tables, no driver state. Step 1 has no `prev` and draws
    * uniformly, exactly like [[randomWalks]].
    *
    * @return (start, walk INT, step INT, node BIGINT). */
  def biasedWalks(
      pairs: DataFrame,
      leftCol: String,
      rightCol: String,
      walksPerNode: Int,
      length: Int,
      seed: Long,
      wReturn: Int,
      wCommon: Int,
      wFar: Int): DataFrame = {
    require(walksPerNode >= 1 && length >= 1, "need >=1 walks of >=1 steps")
    require(wReturn >= 1 && wCommon >= 1 && wFar >= 1,
      "weights must be positive integers")
    val e = pairs
      .select(col(leftCol).cast("long").as("u"), col(rightCol).cast("long").as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      // LAZY checkpoints throughout this builder (eager = false): each
      // eager one was a separate driver-blocking job — 7 sequential jobs
      // for a query whose total task cpu is ~0.7 s (r19 profile: wall
      // 2.1 s, 33 stages, driver-bound). Lazy keeps the dedup property
      // (localCheckpoint persists the RDD, so each frame still computes
      // exactly once inside the single final action — the probe reuse
      // and the step-st/union double-read both hit the cached blocks)
      // while the whole walk materializes in ONE job. Lineage depth is
      // bounded by `length` (4), so the eager truncation bought nothing.
      .localCheckpoint(eager = false) // adjacency ranks + per-step edge probe
    val sym = e.select(col("u").as("node"), col("v").as("nbr"))
      .unionAll(e.select(col("v").as("node"), col("u").as("nbr")))
    import org.apache.spark.sql.expressions.Window
    val ranked = sym
      .withColumn("rank",
        row_number().over(Window.partitionBy("node").orderBy("nbr")))
      .withColumn("deg", count(lit(1)).over(Window.partitionBy("node")))
      .localCheckpoint(eager = false)
    def drawKey(st: Int) =
      (col("start") * walksPerNode + col("walk")) * (length + 1) + lit(st)
    val starts = ranked.select(col("node")).distinct()
      .withColumn("walk", explode(array((0 until walksPerNode).map(lit): _*)))
      .select(col("node").as("start"), col("walk"), lit(0).as("step"),
        lit(null).cast("long").as("prev"), col("node"))
    var frontier = starts.localCheckpoint(eager = false)
    val steps = scala.collection.mutable.ArrayBuffer[DataFrame](frontier)
    for (st <- 1 to length) {
      val cands = frontier.join(ranked, Seq("node"))
      val next =
        if (st == 1) {
          val pick = pmod(
            Sampling.portableSplitBucket(drawKey(st), seed, 1000003), col("deg"))
          cands.filter(col("rank") === pick + 1)
            .select(col("start"), col("walk"), lit(st).as("step"),
              col("node").as("prev"), col("nbr").as("node"))
        } else {
          val probe = e.select(col("u").as("__pu"), col("v").as("__pv"),
            lit(1).as("__adj"))
          val classed = cands
            .join(probe,
              least(col("prev"), col("nbr")) === col("__pu") &&
                greatest(col("prev"), col("nbr")) === col("__pv"), "left")
            .withColumn("w",
              when(col("nbr") === col("prev"), lit(wReturn.toLong))
                .when(col("__adj").isNotNull, lit(wCommon.toLong))
                .otherwise(lit(wFar.toLong)))
          val ww = Window.partitionBy("start", "walk")
          val cum = classed
            .withColumn("cum", sum(col("w")).over(ww.orderBy("rank")))
            .withColumn("total", sum(col("w")).over(
              ww.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
          val draw = pmod(
            Sampling.portableSplitBucket(drawKey(st), seed, 1000003),
            col("total"))
          cum.filter(draw >= col("cum") - col("w") && draw < col("cum"))
            .select(col("start"), col("walk"), lit(st).as("step"),
              col("node").as("prev"), col("nbr").as("node"))
        }
      frontier = next.localCheckpoint(eager = false)
      steps += frontier
    }
    // all steps live until (and beyond) the union — see randomWalks
    steps.reduce(_ unionByName _)
      .select("start", "walk", "step", "node")
  }

  /** Newman modularity of a community assignment over an undirected
    * graph (Newman & Girvan 2004): Q = Σ_c (e_c/m − (d_c/2m)²) — the
    * "are these communities denser than chance?" score that turns any
    * labeling ([[labelPropagation]], [[Components]], an external
    * partition) into a quality number. Kept EXACT: per-community terms
    * are emitted as the integer numerator 4·m·e_c − d_c² over the common
    * denominator 4m², with the rounded double total alongside — so the
    * whole evaluation replays in integer SQL.
    *
    * Scale shape: two label-joins of the edge list (broadcast when the
    * label table is node-sized vs corpus edges) + node-sized aggregates;
    * nothing quadratic, no iteration.
    *
    * @param labels (node, label) — one row per node, as produced by
    *               [[labelPropagation]]
    * @return (community, n_nodes, e_in, d_tot, q_term_scaled,
    *         q_total BIGINT/DOUBLE) — one row per community. */
  def modularity(
      pairs: DataFrame,
      leftCol: String,
      rightCol: String,
      labels: DataFrame): DataFrame = {
    val e = pairs
      .select(col(leftCol).cast("long").as("u"), col(rightCol).cast("long").as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(eager = true) // scanned for m, e_in, and degrees
    val m = e.count()
    // the integer numerators use 4·m·e_c ≤ 4m² and d_c² ≤ 4m²: exact in
    // BIGINT to ~1.5e9 edges. Web-scale graphs need the terms in
    // DECIMAL(38,0) — fail loudly instead of silently wrapping.
    require(m < 1500000000L,
      s"modularity: $m edges overflows the exact BIGINT numerators " +
        "(4·m² > 2⁶³); lift q_term arithmetic to DECIMAL(38,0) for " +
        "graphs beyond ~1.5e9 edges")
    val lab = labels.select(col("node").cast("long").as("node"),
      col("label").cast("long").as("label"))
    val eIn = e
      .join(lab.select(col("node").as("u"), col("label").as("__lu")), Seq("u"))
      .join(lab.select(col("node").as("v"), col("label").as("__lv")), Seq("v"))
      .filter(col("__lu") === col("__lv"))
      .groupBy(col("__lu").as("community")).agg(count(lit(1)).as("e_in"))
    val dTot = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .join(lab, Seq("node"))
      .groupBy(col("label").as("community")).agg(count(lit(1)).as("d_tot"))
    val nNodes = lab.groupBy(col("label").as("community"))
      .agg(count(lit(1)).as("n_nodes"))
    val terms = nNodes
      .join(eIn, Seq("community"), "left")
      .join(dTot, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"),
        coalesce(col("d_tot"), lit(0L)).as("d_tot"))
      .withColumn("q_term_scaled",
        lit(4L) * lit(m) * col("e_in") - col("d_tot") * col("d_tot"))
    // global Q total as a broadcast 1-row aggregate, NOT an
    // empty-partition-spec window: communities can approach node count
    // (every node its own label), and a partitionless window would sort
    // that entity-sized table in one task
    val tot = terms.agg(sum(col("q_term_scaled")).as("__tot"))
    terms
      .crossJoin(broadcast(tot))
      .withColumn("q_total",
        round(col("__tot").cast("double") /
          (lit(4.0) * m * m), 6))
      .drop("__tot")
  }

  /** Link prediction by neighborhood overlap (Liben-Nowell & Kleinberg
    * CIKM'03; Adamic & Adar 2003): for every non-adjacent pair at
    * distance 2, the common-neighbor count and the Adamic–Adar score
    * Σ_z 1/ln(deg z) over shared neighbors z — the "who should be
    * connected next" primitive behind recommendation and knowledge-graph
    * completion. The AA terms are FLOOR-quantized to 1e-6 units and
    * summed as BIGINT, so the score is shuffle-order-invariant and
    * replays exactly in integer SQL (a shared neighbor on a 2-hop path
    * always has degree ≥ 2, so ln is never 0; the nearest 1e6/ln(d)
    * gets to an integer over small-int degrees is ~0.04, far outside
    * double error).
    *
    * Scale shape: the wedge join fans each node into deg² candidate
    * pairs — the same Σ deg² bound as [[triangles]]' wedge step, EXCEPT
    * no orientation trick applies here (both spokes of a wedge are
    * candidates). `maxDegree` caps the fan-out: hub nodes above the cap
    * are excluded as common NEIGHBORS (they still appear as endpoints),
    * the standard craft for bounding open-wedge enumeration — a
    * 10⁶-degree hub contributes ~0 to AA (1/ln ≈ 0.07) but 10¹² wedges.
    *
    * @return (a, b, common_neighbors BIGINT, aa_score_scaled BIGINT) for
    *         non-adjacent pairs with ≥1 shared neighbor, a < b;
    *         aa_score_scaled is in 1e-6 units. */
  def adamicAdar(
      pairs: DataFrame,
      leftCol: String,
      rightCol: String,
      maxDegree: Int = 10000): DataFrame = {
    val e = pairs
      .select(col(leftCol).cast("long").as("u"), col(rightCol).cast("long").as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .select(least(col("u"), col("v")).as("u"), greatest(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(eager = true) // scanned 3×: degrees, wedges, anti probe
    val sym = e.select(col("u").as("a"), col("v").as("b"))
      .unionAll(e.select(col("v").as("a"), col("u").as("b")))
    val deg = sym.groupBy(col("a").as("z")).agg(count(lit(1)).as("d"))
    // wedge a–z–b through non-hub centers; each unordered candidate pair
    // is generated once per shared neighbor, canonically a < b
    val centerTerm = deg.filter(col("d") <= maxDegree && col("d") >= 2)
      .withColumn("term", floor(lit(1000000.0) / log(col("d"))).cast("long"))
    // hub centers must drop BEFORE the wedge self-join: Spark preserves
    // syntactic join order (no CBO reorder by default), so filtering
    // after the join would first materialize ~d² wedge rows for a
    // mega-hub — the exact fan-out maxDegree exists to bound. The
    // semi-joins are node-sized; results are identical (the old form
    // inner-joined centerTerm right after)
    val lowDeg = centerTerm.select("z")
    val s1 = sym.select(col("b").as("z"), col("a"))
      .join(lowDeg, Seq("z"), "left_semi")
    val s2 = sym.select(col("a").as("z"), col("b"))
      .join(lowDeg, Seq("z"), "left_semi")
    val wedges = s1.join(s2, "z").filter(col("a") < col("b"))
      .join(centerTerm, "z")
    wedges
      .join(e, wedges("a") === e("u") && wedges("b") === e("v"), "left_anti")
      .groupBy("a", "b")
      .agg(count(lit(1)).as("common_neighbors"),
        sum(col("term")).as("aa_score_scaled"))
  }

  /** Community detection by synchronous label propagation (Raghavan,
    * Albert & Kumara 2007, Phys. Rev. E 76): every node starts labeled
    * with its own id; each round, every node adopts the label held by the
    * PLURALITY of its neighbors (tiebreak: smallest label) — densely
    * interlinked groups converge onto one label within a few rounds. In
    * curation this is the modularity-flavored sibling of [[Components]]:
    * components find REACHABLE groups (any bridge merges two clusters),
    * LPA finds DENSE groups (a single bridge edge is outvoted), which is
    * what separates two boilerplate families that share one stray link.
    *
    * Determinism: the classic async/randomized LPA is not reproducible,
    * so this is the SYNCHRONOUS fixed-round variant with a total-order
    * tiebreak — all counts are integers and the argmax is
    * (count DESC, label ASC), so a fixed `iterations` replays bit-for-bit
    * as unrolled GROUP-BY + window CTEs in any engine (house pattern:
    * the [[pageRank]]/[[hits]] integer fixed points). Synchronous LPA on
    * a bipartite-ish region can oscillate rather than converge — also
    * deterministic, and why `iterations` is a fixed parameter rather
    * than a convergence test.
    *
    * Spark shape, per round: adjacency (built ONCE, hash-partitioned,
    * hub-sliced like [[pageRank]]) joins the node-sized label map
    * narrowly and emits one (neighbor, label) message per edge; the
    * round's ONLY shuffle is a node-sized `aggregateByKey` of partial
    * per-node label-count maps (map-side combined, so what crosses the
    * wire is one map per (node, sender-partition), not one record per
    * edge), and the plurality argmax folds into the same pass. Round 1
    * skips the join: the initial label of a source IS its id, already
    * in the adjacency key. A node's count map is bounded by its
    * neighbors' DISTINCT labels — worst case its degree, the same skew
    * profile as receiving the messages at all; a mega-hub's inbound
    * maps merge across its senders' combiners.
    *
    * @param pairs undirected edges as a pair list (self-loops/nulls
    *              dropped, duplicates collapsed); node ids cast to LONG —
    *              labels are node ids, and the tiebreak needs a total
    *              order that replays in SQL
    * @return (node BIGINT, label BIGINT) — `label` is the community id
    *         (some member's node id) after exactly `iterations` rounds
    */
  /** Single-source BFS hop distances over an undirected graph, bounded
    * at `maxHops` — unweighted shortest paths, the reachability-radius
    * signal (how many link hops from a trusted seed is this host?) that
    * complements [[pageRank]]'s centrality and [[Components]]' global
    * reachability. Fixed-depth min-plus relaxation is pure integer, so a
    * D-round unroll replays exactly in SQL (the kcore/pagerank pattern);
    * and because hop distances are monotone, rounds past the true
    * eccentricity are no-ops — the early-exit on an empty frontier is
    * purely an optimization, never a semantic change.
    *
    * Spark shape (the r18 rewrite of the DataFrame frontier loop, which
    * re-shuffled the FULL edge list three times per round — semi-join,
    * distinct, anti-join — plus a per-round checkpoint write): the
    * adjacency is collapsed ONCE into the hash-partitioned hub-sliced
    * PRIMITIVE layout of [[buildAdjLong]]; every later round probes it
    * with a narrow co-partitioned zipPartitions (sorted-array frontier
    * membership — no cogroup hash build, no boxing), so total
    * adjacency-EXPANSION work is O(E) across ALL rounds — each node's
    * list is expanded exactly once, the round it enters the frontier.
    * The known-distance map stays co-partitioned, so the dedup reduce
    * and the known-set subtraction are narrow too; the only per-round
    * shuffle-sized object is the new-neighbor candidate set. Hop
    * distances are unique integers, so the output is bit-identical to
    * the old shape under any partitioning.
    *
    * @return (node BIGINT, dist INT) for every node within `maxHops` of
    *         `source`; the source itself has dist 0. Empty if `source`
    *         has no edges (an isolated id is not "in" the pair graph). */
  def bfsHops(
      pairs: DataFrame,
      leftCol: String,
      rightCol: String,
      source: Long,
      maxHops: Int): DataFrame = {
    require(maxHops >= 0)
    val spark = pairs.sparkSession
    val und = pairs
      .select(col(leftCol).cast("long").as("a"), col(rightCol).cast("long").as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val (adj, m2, part) = buildAdjLong(und, hubSplit = 100000)
    val outSchema = StructType(Seq(
      StructField("node", LongType, nullable = false),
      StructField("dist", IntegerType, nullable = false)))
    if (m2 == 0L)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], outSchema)
    // seed only if the source actually appears in the graph; the filter
    // preserves adj's partitioning, and the reduce collapses hub slices
    val seed: RDD[(Long, Int)] = adj
      .mapPartitions(_.collect { case (n, _) if n == source => (n, 0) },
        preservesPartitioning = true)
      .reduceByKey(part, (a, _) => a)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // dist = the per-hop frontiers, each persisted once and UNIONED
    // narrowly (same partitioner → PartitionerAwareUnionRDD) — the r18
    // shape instead re-persisted and re-counted a merged COPY of the
    // whole known map every round, an O(V) cache write + count per hop
    // that the r18 verdict flagged in the cpu channel; the union view
    // reads the same persisted blocks with no copies (guide §1.2 step 1)
    var frontiers = List[RDD[(Long, Int)]](seed)
    var known: RDD[(Long, Int)] = seed
    var frontier: RDD[(Long, Int)] = seed
    var k = 1
    var frontierSize = seed.count()
    while (k <= maxHops && frontierSize > 0L) {
      val hop = k
      // expand the frontier's neighbor lists via a narrow co-partitioned
      // zipPartitions probe (sorted-array membership — no cogroup hash
      // build over the full adjacency, no boxing), dedup candidates in
      // the round's only shuffle (sized by discovered neighbors), then
      // drop already-known nodes with a LongMap probe (narrow again)
      // preservesPartitioning deliberately NOT claimed on the expansion:
      // its output key is the NEIGHBOR (a different node), so the dedup
      // reduce below genuinely needs its shuffle (claiming the layout
      // made reduceByKey skip it and lose cross-partition discoveries)
      val next = adj.zipPartitions(frontier) { (aIt, fIt) =>
          val fs = fIt.map(_._1).toArray
          java.util.Arrays.sort(fs)
          if (fs.isEmpty) Iterator.empty
          else aIt.flatMap { case (n, nbrs) =>
            if (java.util.Arrays.binarySearch(fs, n) >= 0)
              nbrs.iterator.map((_, hop))
            else Iterator.empty
          }
        }
        .reduceByKey(part, (a, _) => a)
        .zipPartitions(known, preservesPartitioning = true) { (cIt, dIt) =>
          val seen = new scala.collection.mutable.LongMap[Boolean]()
          dIt.foreach { case (n, _) => seen(n) = true }
          cIt.filter(c => !seen.contains(c._1))
        }
        .persist(StorageLevel.MEMORY_AND_DISK)
      frontierSize = next.count()
      if (frontierSize > 0L) {
        frontiers ::= next
        known = known.union(next) // partitioner-aware → stays narrow
        frontier = next
      } else {
        next.unpersist(blocking = false)
      }
      k += 1
    }
    val out = spark.createDataFrame(
        known.map { case (n, d) => Row(n, d) }, outSchema)
      .localCheckpoint(eager = true)
    adj.unpersist(blocking = false)
    frontiers.foreach(_.unpersist(blocking = false))
    out
  }

  /** One LPA plurality vote: per-node argmax (count DESC, label ASC) over
    * incoming (node, label) messages — map-merge form: ONE node-keyed
    * aggregateByKey whose combiner holds a per-node label→count map.
    * Shuffle-count intuition said this should win (one shuffle vs two),
    * but the ScaleSmoke "labelprop-vote" profile says otherwise: the
    * LongMap-per-node combiner's allocation + map serialization costs
    * ~2× the extra primitive-pair shuffle of [[votePreReduce]]
    * (9.7–11.6 s vs 4.9–6.7 s on 10M messages, interleaved runs,
    * identical checksums). Retained for the profile harness only; the
    * production vote is [[votePreReduce]]. */
  private[graft] def voteMapMerge(msgs: RDD[(Long, Long)],
      part: org.apache.spark.Partitioner): RDD[(Long, Long)] = msgs
    .aggregateByKey(
      scala.collection.mutable.LongMap.empty[Long], part)(
      (m, lab) => { m(lab) = m.getOrElse(lab, 0L) + 1L; m },
      (a, b) => { b.foreach { case (lab, c) =>
        a(lab) = a.getOrElse(lab, 0L) + c }; a })
    .mapValues { m =>
      var bestLab = Long.MaxValue; var bestC = -1L
      m.foreach { case (lab, c) =>
        if (c > bestC || (c == bestC && lab < bestLab)) {
          bestLab = lab; bestC = c
        }
      }
      bestLab
    }

  /** THE production vote (see [[voteMapMerge]] for the profile that
    * picked it): pre-reduce (node, label) pair counts — map-side combine
    * on the pair key collapses duplicate messages to primitive tuples —
    * then a second node-keyed argmax reduce whose records are one
    * (label, count) pair per node per map partition. Two shuffles, but
    * both ship flat primitives; no per-node map objects anywhere. */
  private[graft] def votePreReduce(msgs: RDD[(Long, Long)],
      part: org.apache.spark.Partitioner): RDD[(Long, Long)] = msgs
    .map { case (n, lab) => ((n, lab), 1L) }
    .reduceByKey(new HashPartitioner(part.numPartitions), _ + _)
    .map { case ((n, lab), c) => (n, (lab, c)) }
    .reduceByKey(part, (x, y) =>
      if (x._2 > y._2 || (x._2 == y._2 && x._1 < y._1)) x else y)
    .mapValues(_._1)

  def labelPropagation(
      pairs: DataFrame,
      leftCol: String,
      rightCol: String,
      iterations: Int = 4,
      hubSplit: Int = 100000): DataFrame = {
    require(iterations >= 0 && hubSplit >= 1)
    val spark = pairs.sparkSession
    val und = pairs
      .select(col(leftCol).cast("long").as("a"), col(rightCol).cast("long").as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull && col("b").isNotNull)
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val e: RDD[(Long, Long)] = und.rdd
      .flatMap { r =>
        val u = r.getLong(0); val v = r.getLong(1)
        Iterator((u, v), (v, u))
      }
      .persist(StorageLevel.MEMORY_AND_DISK)
    val m = e.count()
    val part = roundPartitioner(spark, m)
    val adj: RDD[(Long, Array[Long])] = e.aggregateByKey(
        scala.collection.mutable.ArrayBuffer.empty[Long], part)(
        (b, d) => b += d, (a, b) => a ++= b)
      .mapPartitions(_.flatMap { case (s, buf) =>
        if (buf.length <= hubSplit) Iterator.single((s, buf.toArray))
        else buf.grouped(hubSplit).map(g => (s, g.toArray))
      }, preservesPartitioning = true)
      .persist(StorageLevel.MEMORY_AND_DISK)
    adj.count()
    e.unpersist(blocking = false)
    // one plurality vote — pair pre-reduce form, kept after profiling both
    // candidates on the 10M-message smoke stream (ScaleSmoke
    // "labelprop-vote": pre-reduce 4.9–6.7 s vs map-merge 9.7–11.6 s,
    // interleaved runs, identical checksums; see NEXT.md)
    def vote(msgs: RDD[(Long, Long)]): RDD[(Long, Long)] =
      votePreReduce(msgs, part)
    // the graph is symmetrized, so every node appears as a source; the
    // round-1 message's label is the sender's id — no join needed
    var labels: RDD[(Long, Long)] =
      if (iterations == 0)
        adj.mapValues(_ => ())
          .reduceByKey(part, (a, _) => a)
          .mapPartitions(_.map { case (n, _) => (n, n) },
            preservesPartitioning = true)
          .persist(StorageLevel.MEMORY_AND_DISK)
      else vote(adj.flatMap { case (s, nbrs) => nbrs.iterator.map(d => (d, s)) })
        .persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()
    for (_ <- 2 to iterations) {
      val prev = labels
      labels = vote(adj.join(prev, part)
          .flatMap { case (_, (nbrs, lab)) =>
            nbrs.iterator.map(d => (d, lab))
          })
        .persist(StorageLevel.MEMORY_AND_DISK)
      labels.count() // materialize before dropping the previous round
      prev.unpersist(blocking = false)
    }
    val rows = labels.map { case (node, lab) => Row(node, lab) }
    val out = spark.createDataFrame(rows,
        StructType(Seq(StructField("node", LongType, nullable = false),
          StructField("label", LongType, nullable = false))))
      .localCheckpoint(eager = true)
    adj.unpersist(blocking = false)
    labels.unpersist(blocking = false)
    out
  }
}
