package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling for training-data pipelines: seeded (reproducible) uniform and
  * stratified sampling, and deterministic train/validation splitting by
  * key hash — the split survives re-runs, repartitioning, and incremental
  * appends, unlike `randomSplit` (which is per-partition-order dependent).
  */
object Sampling {

  /** Seeded uniform sample (Bernoulli per row). */
  def uniform(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Seeded stratified sample: per-stratum fractions. */
  def stratified(df: DataFrame, strataCol: String,
      fractions: Map[String, Double], seed: Long): DataFrame =
    df.stat.sampleBy(strataCol, fractions, seed)

  /** Deterministic key-hash split: a row lands in "train" iff
    * hash(key, seed) mod denom < num. Stable across runs and data layout —
    * the property a 100 TB pipeline needs so that re-ingested or
    * re-partitioned data never migrates between splits. */
  def hashSplit(df: DataFrame, keyCol: String, trainNum: Int, denom: Int,
      seed: Long): (DataFrame, DataFrame) = {
    val bucket = pmod(xxhash64(col(keyCol), lit(seed)), lit(denom))
    (df.filter(bucket < trainNum), df.filter(bucket >= trainNum))
  }

  /** Portable split bucket: mix32((key + seed·φ₃₂) mod 2³²) mod denom —
    * the same stability contract as [[hashSplit]] but on the portable hash
    * stack, so split membership is reproducible OUTSIDE Spark (the
    * `sample_splits` DuckDB oracle replays it via `mixSql`) and therefore
    * auditable by any downstream consumer of the corpus. Every
    * intermediate stays under 2⁵⁹, safe for overflow-checked BIGINT
    * arithmetic on both engines. Keep |seed| small (< 2³¹) so seed·φ₃₂
    * cannot overflow a long. */
  def portableSplitBucket(key: Column, seed: Long, denom: Int): Column = {
    require(math.abs(seed) < Int.MaxValue, s"seed $seed too large")
    val mask = lit(4294967295L)
    def step(h: Column): Column =
      ((h.bitwiseXOR(shiftrightunsigned(h, 16))) * lit(73244475L)).bitwiseAND(mask)
    val x0 = pmod(pmod(key, lit(4294967296L)) + lit(seed * 2654435761L), lit(4294967296L))
    val s2 = step(step(x0))
    pmod(s2.bitwiseXOR(shiftrightunsigned(s2, 16)), lit(denom.toLong))
  }

  /** Deterministic stratified keep on the portable hash: a row survives
    * iff its split bucket (0..999) falls under its stratum's per-mille
    * fraction. Same auditability contract as [[portableSplitBucket]] —
    * membership is a pure function of (key, seed), stable across layout
    * and re-ingest, and replayable outside Spark — which `sampleBy`
    * (partition-order-dependent RNG) cannot give a 100 TB corpus. */
  def stratifiedPortable(df: DataFrame, keyCol: Column, strataCol: Column,
      perMille: Map[String, Int], defaultPerMille: Int, seed: Long): DataFrame = {
    require((perMille.values ++ Seq(defaultPerMille)).forall(v => v >= 0 && v <= 1000),
      "per-mille fractions must be in [0, 1000]")
    val thresh = perMille.foldLeft(lit(defaultPerMille)) {
      case (acc, (stratum, pm)) => when(strataCol === stratum, lit(pm)).otherwise(acc)
    }
    df.filter(portableSplitBucket(keyCol, seed, 1000) < thresh)
  }

  /** Temperature-based stratum rebalancing (the multilingual sampling rule
    * of XLM/mBERT: sample strata with probability ∝ p^α instead of their
    * raw share p, so head languages shrink and tail languages keep
    * everything) realized as a deterministic per-row keep decision at
    * α = 1/2: a stratum with n_s rows keeps each row with rate
    * √(n_min/n_s) — the rarest stratum keeps all rows, a stratum 100× its
    * size keeps 10%, flattening the mix toward p^½.
    *
    * α is fixed at ½ on purpose: the keep rate is then one IEEE division
    * and one square root, both correctly-rounded operations, so the
    * per-row threshold ⌊rate·denom⌋ is bit-identical in ANY IEEE-754
    * engine and the decision stays portable/auditable like
    * [[portableSplitBucket]] (a general p^(α−1) needs `pow`, which has no
    * cross-engine rounding guarantee). The `sample_temperature` DuckDB
    * oracle replays the whole decision.
    *
    * Scale shape: one tiny groupBy over the stratum column (#strata rows),
    * broadcast back — the corpus itself is never shuffled; the keep filter
    * runs scan-side. Output = input columns + `stratum_docs`, `keep_rate`
    * (rounded, informational), `keep`. */
  def temperatureKeep(df: DataFrame, strataCol: String, keyCol: Column,
      seed: Long): DataFrame = {
    val denom = 1000003
    val counts = df.groupBy(strataCol)
      .agg(count(lit(1)).as("stratum_docs"))
    val nMin = counts.agg(min(col("stratum_docs")).as("__nmin"))
    val rates = counts.crossJoin(broadcast(nMin))
      .withColumn("__rate",
        sqrt(col("__nmin").cast("double") / col("stratum_docs").cast("double")))
      .withColumn("__thresh", floor(col("__rate") * lit(denom.toLong)))
      .withColumn("keep_rate", round(col("__rate"), 6))
      .drop("__nmin", "__rate")
    // null-SAFE join (aliased <=>): a null stratum is a first-class
    // stratum here (counts groupBy already groups it), but a plain
    // equi-join would silently DROP every null-stratum row from the
    // output instead of giving it a keep decision
    df.alias("__tk_d")
      .join(broadcast(rates.alias("__tk_r")),
        col(s"__tk_d.$strataCol") <=> col(s"__tk_r.$strataCol"))
      .withColumn("keep",
        (portableSplitBucket(keyCol, seed, denom) < col("__thresh")).cast("int"))
      .drop("__thresh")
      .drop(col(s"__tk_r.$strataCol"))
  }

  /** Mixture planning — the static data-mixing stage (the fixed-weight
    * shape of DoReMi / Pile-style domain balancing): given target shares
    * per stratum, the largest achievable corpus is
    * N = min over targeted strata of ⌊n_s / t_s⌋ (the binding stratum
    * runs out first), and each stratum contributes ⌊t_s · N⌋ docs.
    * Returns one row per TARGETED stratum: (stratum, n_docs,
    * target_share, take_docs, rate). Strata missing from `targets` are
    * excluded (share 0); a targeted stratum absent from the data binds
    * the plan to N = 0, which is the honest answer.
    *
    * Every arithmetic step is a single correctly-rounded IEEE op on
    * exact inputs (integer counts ≤ 2⁵³, literal shares), so the plan
    * replays bit-identically in any engine — the audit property the
    * split/stratified samplers also guarantee.
    *
    * Scale shape: one groupBy over the corpus (map-side combined), then
    * literal-sized joins; the apply step is [[applyMixture]], which
    * ranks within strata on the portable hash — no global shuffle of
    * the kept data beyond the per-stratum window. */
  def mixturePlan(df: DataFrame, strataCol: String,
      targets: Map[String, Double]): DataFrame = {
    require(targets.nonEmpty && targets.values.forall(_ > 0.0),
      "targets must be positive shares")
    val spark = df.sparkSession
    import spark.implicits._
    val t = targets.toSeq.sortBy(_._1)
      .toDF(strataCol, "target_share")
    val counts = df.groupBy(strataCol).agg(count(lit(1)).as("n_docs"))
    val planned = t.join(counts, Seq(strataCol), "left")
      .withColumn("n_docs", coalesce(col("n_docs"), lit(0L)))
      .withColumn("__cap", floor(col("n_docs") / col("target_share")))
    val n = planned.agg(min(col("__cap")).as("__n"))
    planned.crossJoin(broadcast(n))
      .withColumn("take_docs", floor(col("target_share") * col("__n")))
      .withColumn("rate", round(
        when(col("n_docs") === 0L, lit(0.0))
          .otherwise(col("take_docs") / col("n_docs")), 6))
      .select(col(strataCol), col("n_docs"), col("target_share"),
        col("take_docs"), col("rate"))
  }

  /** Apply a [[mixturePlan]]: within each targeted stratum keep the
    * `take_docs` rows that rank first in portable-hash order (hash, then
    * key as tiebreak) — deterministic, layout-independent, replayable. */
  def applyMixture(df: DataFrame, strataCol: String, keyCol: Column,
      targets: Map[String, Double], seed: Long): DataFrame = {
    val plan = mixturePlan(df, strataCol, targets)
      .select(col(strataCol), col("take_docs"))
    // the rank bound must ALSO appear as a LITERAL conjunct: rn <= column
    // alone is not a shape InferWindowGroupLimit recognizes, so every
    // stratum would fully sort in its window task; rn <= lit(maxTake)
    // (a 1-row scalar off the already-tiny plan) lets the group-limit
    // push into the sort, and the dynamic per-stratum filter then
    // tightens it — semantically identical (take_docs <= maxTake)
    val maxTakeRow = plan.agg(max(col("take_docs"))).head()
    val maxTake = if (maxTakeRow.isNullAt(0)) 0L else maxTakeRow.getLong(0)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(portableSplitBucket(keyCol, seed, 1000003), keyCol)
    df.join(broadcast(plan), Seq(strataCol))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= lit(maxTake) && col("__rn") <= col("take_docs"))
      .drop("__rn", "take_docs")
  }

  /** Exact per-group cap: keep at most `n` rows per group (deterministic by
    * `orderCol`) — the "max documents per domain" dedup-adjacent primitive. */
  def capPerGroup(df: DataFrame, groupCol: String, orderCol: String, n: Int): DataFrame =
    capPerGroupRanked(df, groupCol, Seq(col(orderCol)), n).drop("rn")

  /** [[capPerGroup]] with explicit ranking columns and the rank kept —
    * order by the portable hash of the id to cap in a content-independent,
    * reproducible shuffle order (the "max N docs per domain" shape of
    * CommonCrawl-style pipelines). Executes as one per-group window;
    * Spark's `WindowGroupLimit` pushes the `rn <= n` bound into the sort,
    * so no group ever fully materializes its ranking. */
  def capPerGroupRanked(df: DataFrame, groupCol: String, order: Seq[Column],
      n: Int): DataFrame =
    df.withColumn("rn", row_number().over(
        Window.partitionBy(groupCol).orderBy(order: _*)))
      .filter(col("rn") <= n)

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis, IPL
    * 2006): per stratum, keep the `k` rows with the smallest
    * `−ln(u)/w` — the exponential-key form of "pick k items with
    * probability ∝ weight", the primitive behind size- or
    * quality-weighted corpus subsetting ("sample 10k docs per language,
    * long docs more likely").
    *
    * `u` comes from [[portableSplitBucket]]: `(bucket+1)/denom` is an
    * exact dyadic-free rational both engines compute identically, so the
    * decision is a pure function of (key, seed) — layout/re-ingest
    * stable and auditable outside Spark, like every sampler here. The key
    * is rounded to 6 dp BEFORE ranking with the id as tie-break, which
    * absorbs the ln() cross-engine ulp and makes the whole selection
    * SQL-replayable (`sample_weighted` oracle).
    *
    * Scale shape: scan-local key computation + ONE per-stratum window
    * (`WindowGroupLimit` keeps ≤k rows per stratum before the exchange) —
    * no corpus shuffle beyond the group-limit merge. Output = input +
    * `wkey`, `rn`. */
  def weightedTopK(df: DataFrame, strataCol: String, keyCol: Column,
      weightCol: Column, k: Int, seed: Long): DataFrame = {
    val denom = 1000003
    val u = (portableSplitBucket(keyCol, seed, denom) + lit(1L))
      .cast("double") / lit(denom.toDouble)
    // NON-POSITIVE/NULL/NaN weights raise IN-PLAN (the prefixSum guard
    // pattern): a null weight makes wkey null, and ascending sort puts
    // nulls FIRST — the weightless row would silently WIN the top-k; a
    // zero/negative weight flips or collapses the exponential key. The
    // guard lives inside the ranked expression so pruning cannot drop it
    // and it only fires on a row actually ranked.
    val wd = weightCol.cast("double")
    val wGuarded = when(wd.isNotNull && wd > 0.0, wd).otherwise(
      raise_error(lit("weightedTopK: weight must be positive and " +
        "non-null — a null weight would silently rank FIRST; filter or " +
        "coalesce weights upstream")).cast("double"))
    capPerGroupRanked(
      df.withColumn("wkey", round(-log(u) / wGuarded, 6)),
      strataCol, Seq(col("wkey"), keyCol), k)
  }

  /** Greedy k-center coreset selection (Gonzalez 1985, the farthest-first
    * traversal): pick the min-id point as the seed, then k−1 times pick
    * the point FARTHEST from everything picked so far — here "farthest" =
    * lowest maximum dot-similarity to any selected center (tiebreak min
    * id). The classic diversity sampler for training-data curation: a
    * k-point coreset whose covering radius is within 2× of the optimal
    * k-center cover, so a tiny picked set spans the embedding space —
    * seed sets for k-means, diverse eval suites, dedup-aware subset
    * selection (the complement of SemDeDup: keep the SPREAD, not one per
    * cluster).
    *
    * Every per-point similarity is rounded to 6 dp BEFORE the running
    * max / argmin (house `roundedDot` discipline), so the greedy replays
    * bit-for-bit as a recursive CTE + LATERAL argmin in DuckDB — same
    * replay pattern as the MMR oracle.
    *
    * Scale shape: the corpus never shuffles. The selection state is one
    * narrow (id, vec, ms) projection; each round is one scan-local
    * `greatest(ms, dot(vec, <broadcast center literal>))` update plus a
    * `TakeOrderedAndProject(1)` argmin, and `localCheckpoint` truncates
    * the k-deep lineage. Driver holds only the k picked vectors
    * (k·dim doubles). k corpus passes are inherent to Gonzalez; for
    * k in the thousands, batch several centers per pass (the
    * furthest-point batch variant) — out of contract here.
    *
    * @return (step INT ascending 1..k, id, nearest_sim DOUBLE) —
    *         `nearest_sim` is the picked point's max similarity to the
    *         previously selected centers (NULL for the seed): a
    *         decreasing novelty trace, useful as the coreset's coverage
    *         profile. */
  def kCenterCoreset(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    // null vectors carry no geometry: a null ms would sort FIRST under
    // asc (nulls-first), hijack every argmin pick, and then NPE the
    // driver loop — exclude them up front
    val pts = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    def simTo(center: Seq[Float]) =
      round(graft.functions.VectorOps.dot(col("vec"), typedlit(center)), 6)

    val seedRows = pts.orderBy(asc("id")).limit(1).collect()
    var picks = List.empty[(Int, Long, java.lang.Double)]
    // k beyond the corpus (or an empty corpus) degrades to "select
    // everything in greedy order" — never an error
    if (seedRows.nonEmpty) {
      val seed = seedRows(0)
      picks = (1, seed.getLong(0), null: java.lang.Double) :: picks
      var centerVec = seed.getSeq[Float](1)
      // state: every unpicked point with its running max-similarity to
      // the selected set; one scan-local update per round
      var state = pts.filter(col("id") =!= seed.getLong(0))
        .withColumn("ms", simTo(centerVec))
        .localCheckpoint(eager = true)
      var step = 2
      var exhausted = false
      while (step <= k && !exhausted) {
        val rows = state.orderBy(asc("ms"), asc("id")).limit(1).collect()
        if (rows.isEmpty) exhausted = true
        else {
          val p = rows(0)
          picks = (step, p.getLong(0), Double.box(p.getDouble(2))) :: picks
          centerVec = p.getSeq[Float](1)
          if (step < k) {
            val prev = state
            state = state.filter(col("id") =!= p.getLong(0))
              .withColumn("ms", greatest(col("ms"), simTo(centerVec)))
              .localCheckpoint(eager = true)
            // the new checkpoint is MATERIALIZED (eager), so the previous
            // round's blocks — a full (id, vec, ms) copy of the corpus —
            // can go; without this the storage pins k copies and a large
            // k spill-thrashes the executors
            releaseCheckpoint(prev)
          }
          step += 1
        }
      }
      // the final round's checkpoint is equally dead once picks are
      // collected — don't leave one corpus copy pinned until GC
      releaseCheckpoint(state)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        picks.reverse.map(t => Row(t._1, t._2, t._3)).asJava),
      StructType(Seq(
        StructField("step", IntegerType, nullable = false),
        StructField("id", LongType, nullable = false),
        StructField("nearest_sim", DoubleType, nullable = true))))
  }

  /** Cumulative Poisson(1) CDF in 1e-6 units — integer thresholds for the
    * inverse-CDF draw below, so the decision is pure BIGINT compare on
    * both engines (floor(1e6·Σₖ e⁻¹/k!)). Mass beyond k = 7 is < 1e-7 of
    * a bucket and maps to k = 7. */
  private[graft] val poissonCdf1e6 =
    Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L, 999916L)

  /** Poisson bootstrap replicates (Chamandy et al. 2012, "Estimating
    * uncertainty for massive data streams"): each row independently draws
    * a Poisson(1) multiplicity per replicate — the distributed form of
    * bootstrap resampling, since true with-replacement sampling of n rows
    * needs global coordination but n·Poisson(1) ≈ multinomial(n) at
    * corpus scale. The draw inverts the Poisson CDF on the portable split
    * bucket of (key·replicates + r), so every multiplicity is a pure
    * integer function of (key, replicate, seed): layout-stable,
    * re-ingest-stable, and replayable in SQL — `sampleBy`-style RNG draws
    * would tie the resample to partition order.
    *
    * Scale shape: scan-local explode (×`replicates` rows, no shuffle
    * here); downstream per-replicate aggregation is the only shuffle, and
    * replicate counts are small (20–100). Rows with k = 0 are emitted
    * with k = 0 so consumers can also count distinct coverage; filter
    * k ≥ 1 for the pure resample.
    *
    * Key contract: the lottery key is `key·replicates + r` BEFORE the
    * 2³² fold, so `|key| must stay < 2⁶³/replicates` — Spark would wrap
    * silently past that while an overflow-checked SQL replay errors (a
    * parity trap). Surrogate ids satisfy this by construction; hash-
    * derived keys should be masked to 32 bits first.
    *
    * @return input columns + (replicate INT, k INT) — k = multiplicity of
    *         this row in that replicate. */
  def poissonReplicates(
      df: DataFrame,
      keyCol: Column,
      replicates: Int,
      seed: Long): DataFrame = {
    require(replicates >= 1 && replicates <= 10000,
      s"replicates must be in [1, 10000] (got $replicates)")
    val withR = df.withColumn("replicate",
      explode(array((0 until replicates).map(lit): _*)))
    // long-cast BEFORE the multiply (the randomWalks discipline): an
    // IntegerType key would otherwise wrap at 2³¹ — far below the
    // documented 2⁶³/replicates contract — silently corrupting the draw
    val bucket = portableSplitBucket(
      keyCol.cast("long") * replicates + col("replicate"), seed,
      denom = 1000000)
    val k = poissonCdf1e6.zipWithIndex.foldRight(lit(poissonCdf1e6.length)) {
      case ((thr, i), rest) => when(bucket < thr, lit(i)).otherwise(rest)
    }
    withR.withColumn("k", k)
  }
}
