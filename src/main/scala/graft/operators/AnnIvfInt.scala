package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer fixed-point twin of the IVF build/probe pipeline
  * ([[AnnIvf]]) — every arithmetic step is scaled-BIGINT, so centroid
  * training, routing, and scoring REPLAY EXACTLY in ANSI SQL and the
  * whole ANN family gains DuckDB hash oracles (the same discipline that
  * made PageRank/HITS/modularity and the 24-round k-core
  * oracle-checkable: quantize, then stay in integers end to end).
  *
  * Reference behavior being twinned: k-means training over the embedding
  * corpus (`/root/reference/src/bioclip_vector_db/storage/storage_impl.py:152-162`)
  * and nearest-centroid assignment / nprobe routing
  * (`faiss_utils.py:110-111`, `query/neighborhood_server.py:181-185`).
  * The float production path stays [[AnnIvf]] (gemm-blocked, fp32); this
  * twin exists so the MECHANICS — seeded deterministic init, Lloyd's
  * fixed-iteration update with empty-cluster carry-over, argmax-dot
  * routing with a total-order tie-break, probe → candidate → top-k —
  * are verified end to end against an independent engine, not just
  * rows>0-checked.
  *
  * Fixed-point contract (mirrored verbatim by the SQL oracle):
  *  - quantize: qv = ⌊v · 10⁶⌋ as BIGINT (floor of an identical double is
  *    engine-identical; ROUND's tie handling is not);
  *  - init: the `nlist` vectors with the smallest ids, cid = ascending id
  *    order (0-based);
  *  - iterate `iters` rounds: assign every vector to argmax integer dot
  *    (tie → lowest cid), then per-coordinate center = floor-division
  *    sum/count written as ((s − ((s % n + n) % n)) div n) — explicit
  *    non-negative-mod floor division, because `div`'s truncation and
  *    `%`'s sign conventions differ across engines while THIS form does
  *    not. Empty clusters keep their previous center;
  *  - search: probe = top-`nprobe` centers by integer dot (tie → lowest
  *    cid), candidates = vectors in probed cells, score = integer dot,
  *    top-k per query by (score desc, id asc).
  *
  * Magnitudes: |v| ≤ 1 ⇒ |qv| ≤ 10⁶ ⇒ a 64-dim dot ≤ 6.4·10¹³ — far
  * inside BIGINT; center coords are means, so products never grow across
  * rounds.
  *
  * Scale design: assignment is a broadcast-centers map-side scan (the
  * centers table is nlist rows); the center update is posexplode →
  * partial+final hash agg on (cid, dim) whose shuffle is ≤ nlist·dim
  * rows per task — both linear, shuffle-light, no driver action. Each
  * round's centers are `localCheckpoint(eager = false)`ed: tiny (nlist
  * rows), it truncates the would-be-exponential lineage of
  * round-over-round self-reference, and a lost block fails loudly
  * instead of silently retraining.
  */
object AnnIvfInt {

  /** Quantization scale: 6 fractional digits of the unit-norm embedding. */
  val Scale = 1e6

  final case class IntIndex(assigned: DataFrame, centers: DataFrame,
      nlist: Int)

  /** array<float> → array<long>, qv = ⌊v·10⁶⌋. */
  def quantize(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * lit(Scale)))

  /** Exact integer dot of two array<long> columns. */
  def dotQ(a: Column, b: Column): Column =
    graft.functions.DotProductInt(a, b)

  /** argmax-dot assignment: (idCol, cid), tie → lowest cid. The max is a
    * plain aggregate over a struct (dot, −cid) — no window, no shuffle
    * beyond the groupBy. */
  private def assign(q: DataFrame, idCol: String, centers: DataFrame)
      : DataFrame =
    q.select(col(idCol), col("__q"))
      .crossJoin(broadcast(centers))
      .withColumn("__dot", dotQ(col("__q"), col("cvec")))
      .groupBy(col(idCol))
      .agg(max(struct(col("__dot").as("d"), (-col("cid")).as("nc"))).as("__m"))
      .select(col(idCol), (-col("__m.nc")).as("cid"))

  /** One Lloyd's center update: per-(cid, dim) integer sums → floor-div
    * means, empty clusters carry the previous center. */
  private def recompute(q: DataFrame, idCol: String, asg: DataFrame,
      prev: DataFrame): DataFrame = {
    val sums = q.select(col(idCol), posexplode(col("__q")).as(Seq("__i", "__v")))
      .join(asg, Seq(idCol))
      .groupBy(col("cid"), col("__i"))
      .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
      .withColumn("__cv", expr("(__s - ((__s % __n + __n) % __n)) div __n"))
    val collected = sums.groupBy(col("cid"))
      .agg(transform(
        array_sort(collect_list(struct(col("__i"), col("__cv")))),
        x => x.getField("__cv")).as("__nv"))
    prev.select(col("cid"), col("cvec").as("__pv"))
      .join(collected, Seq("cid"), "left")
      .select(col("cid"), coalesce(col("__nv"), col("__pv")).as("cvec"))
  }

  /** Deterministic fixed-point IVF build: quantize, init from the `nlist`
    * smallest-id vectors, run `iters` integer Lloyd's rounds, assign.
    * `assigned` carries every input column plus (__q, cid). */
  def build(emb: DataFrame, idCol: String, vecCol: String, nlist: Int,
      iters: Int): IntIndex = {
    require(nlist > 0 && iters >= 0, s"nlist=$nlist iters=$iters")
    val q = emb.withColumn("__q", quantize(col(vecCol)))
      .localCheckpoint(eager = false)
    // init cid via a broadcast triangular count over the nlist seed rows
    // (cid = #ids smaller) — window-free, same as the oracle's ROW_NUMBER
    val seeds = q.orderBy(col(idCol)).limit(nlist)
      .select(col(idCol).as("__sid"), col("__q").as("cvec"))
    val seedIds = seeds.select(col("__sid").as("__b"))
    var centers = seeds
      .join(broadcast(seedIds), col("__b") < col("__sid"), "left")
      .groupBy(col("__sid"), col("cvec"))
      .agg(count(col("__b")).cast("int").as("cid"))
      .select(col("cid"), col("cvec"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iters) {
      val asg = assign(q, idCol, centers)
      centers = recompute(q, idCol, asg, centers)
        .localCheckpoint(eager = false)
    }
    IntIndex(q.join(assign(q, idCol, centers), Seq(idCol)), centers, nlist)
  }

  /** Probe ranks for a query subset: one row per (query_id, cid) with the
    * center dot and its rank (1 = best) — callers filter `probe_rank <=
    * nprobe`, which makes an nprobe SWEEP one rank filter per point
    * instead of one probe per point (the top-np prefix of the full probe
    * IS the np-probe). */
  def probeRanks(index: IntIndex, idCol: String, queryPred: Column)
      : DataFrame =
    Knn.topKPerGroup(
      index.assigned.filter(queryPred)
        .select(col(idCol).as("query_id"), col("__q").as("__qq"))
        .crossJoin(broadcast(index.centers))
        .withColumn("__ps", dotQ(col("__qq"), col("cvec"))),
      Seq(col("query_id")), index.nlist, desc("__ps"), asc("cid"))
      .select(col("query_id"), col("cid"), col("__qq"),
        col("rank").as("probe_rank"))

  /** nprobe search over the fixed-point index: integer scores, top-k per
    * query by (score_q desc, id asc). The probed (query, cid) set
    * broadcasts into the cell join, so only probed cells are scanned.
    * `carryCols` names extra candidate columns (e.g. a label) to surface
    * past the top-k — the operator itself assumes nothing beyond
    * (idCol, vecCol) about the input schema. */
  def search(index: IntIndex, idCol: String, queryPred: Column, k: Int,
      nprobe: Int, excludeSelf: Boolean = false,
      carryCols: Seq[String] = Seq.empty): DataFrame = {
    val probed = probeRanks(index, idCol, queryPred)
      .filter(col("probe_rank") <= nprobe)
      .select(col("query_id"), col("cid"), col("__qq"))
    val cands = broadcast(probed)
      .join(index.assigned, Seq("cid"))
      .filter(if (excludeSelf) col(idCol) =!= col("query_id") else lit(true))
      .withColumn("score_q", dotQ(col("__q"), col("__qq")))
    Knn.topKPerGroup(
      cands.select((col("query_id") +: col(idCol) +: carryCols.map(col)) :+
        col("score_q"): _*),
      Seq(col("query_id")), k, desc("score_q"), asc(idCol))
  }

  /** The reference's verbose scatter-gather envelope over the fixed-point
    * index (per probed partition, that partition's local top-k pre-merge
    * — one row per (query, cid); `neighborhood_server.py:209-226,323-331`):
    * the integer twin of [[AnnIvf.searchVerbose]], so the envelope shape
    * itself is DuckDB-replayable. `neighbors` is the rank-ordered struct
    * array (rank, neighbor_id, score_q). */
  def searchVerbose(index: IntIndex, idCol: String, queryPred: Column,
      k: Int, nprobe: Int): DataFrame = {
    val probed = probeRanks(index, idCol, queryPred)
      .filter(col("probe_rank") <= nprobe)
      .select(col("query_id"), col("cid"), col("__qq"))
    val scored = broadcast(probed)
      .join(index.assigned, Seq("cid"))
      .withColumn("score_q", dotQ(col("__q"), col("__qq")))
    Knn.topKPerGroup(
      scored.select(col("query_id"), col("cid"), col(idCol), col("score_q")),
      Seq(col("query_id"), col("cid")), k, desc("score_q"), asc(idCol))
      .groupBy("query_id", "cid")
      .agg(sort_array(collect_list(
        struct(col("rank"), col(idCol).as("neighbor_id"), col("score_q"))))
        .as("neighbors"))
  }

  /** Corpus×corpus KNN join over the fixed-point index: top-k integer-dot
    * neighbors for EVERY vector — the integer twin of [[AnnIvf.knnJoin]],
    * same plan shape as the float production path: the probe side is
    * corpus-sized so nothing broadcasts; each vector explodes into its
    * `nprobe` probed cells and the candidate pairing is ONE shuffle join
    * co-partitioned on `cid` (candidate volume per vector is bounded by
    * probed-cell occupancy — no quadratic blowup); the merge is the
    * k-bounded [[TopKAggregator]] (partial before the exchange), so no
    * task sorts more than k rows per query. Integer scores ride the
    * aggregator's double slot losslessly ONLY while |dot| < 2⁵³ (true for
    * unit-norm 64-d at 10⁶ quantization: ≤ 6.4·10¹³), and are cast back
    * to long on the way out; the bound is enforced per row by
    * [[doubleSafe]], so a larger-dim or un-normalized corpus raises
    * instead of silently losing low bits in a hash-checked path. */
  def knnJoin(index: IntIndex, idCol: String, k: Int, nprobe: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val probed = probeRanks(index, idCol, lit(true))
      .filter(col("probe_rank") <= nprobe)
      .select(col("query_id"), col("cid"), col("__qq"))
    val joined = probed
      .join(index.assigned.select(col("cid"), col(idCol), col("__q")), Seq("cid"))
    val filtered =
      if (excludeSelf) joined.filter(col(idCol) =!= col("query_id")) else joined
    TopKAggregator.topK(
      filtered.withColumn("score_q", doubleSafe(dotQ(col("__q"), col("__qq"))))
        .select(col("query_id"), col(idCol), col("score_q")),
      "query_id", idCol, "score_q", k)
      .withColumn("score_q", col("score_q").cast("long"))
  }

  /** Per-row guard for integer scores routed through a double slot: a
    * long survives the long→double→long round-trip exactly only while
    * |score| < 2⁵³. Codegen-side `when` (no UDF, stays in whole-stage
    * codegen); the error path never allocates on the happy path. The
    * bound is checked symmetrically rather than via abs() — abs(Long
    * .MinValue) wraps negative, which would let that one value slip
    * past an abs-based guard. */
  private val DoubleExactBound = 1L << 53
  private def doubleSafe(score: Column): Column =
    when(score < lit(DoubleExactBound) && score > lit(-DoubleExactBound),
        score)
      .otherwise(raise_error(concat(
        lit("integer score magnitude >= 2^53 — TopKAggregator's double " +
          "slot would lose precision; reduce dim or quantization scale " +
          "(got "), score.cast("string"), lit(")"))))

  /** Integer brute-force top-k (the recall baseline): every (query,
    * corpus) pair scored with the integer dot. */
  def bruteForce(index: IntIndex, idCol: String, queryPred: Column, k: Int)
      : DataFrame = {
    val qs = index.assigned.filter(queryPred)
      .select(col(idCol).as("query_id"), col("__q").as("__qq"))
    Knn.topKPerGroup(
      index.assigned.crossJoin(broadcast(qs))
        .withColumn("score_q", dotQ(col("__q"), col("__qq")))
        .select(col("query_id"), col(idCol), col("score_q")),
      Seq(col("query_id")), k, desc("score_q"), asc(idCol))
  }
}
