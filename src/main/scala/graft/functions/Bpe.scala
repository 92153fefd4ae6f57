package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Real byte-pair encoding (Sennrich et al., "Neural Machine Translation
  * of Rare Words with Subword Units", ACL 2016) — the learned-merges
  * upgrade over the regex chunker behind `text_bpe_tokens`.
  *
  * Spark shape mirrors how production tokenizers are actually built:
  * merge rules are TRAINED driver-side on a bounded corpus sample (pair
  * counting over the word-frequency table — HF/SentencePiece train on
  * samples too; the loop is O(merges · vocab · wordLen), milliseconds at
  * these sizes), then APPLIED distributed as one UDF pass with the rule
  * table broadcast — the same frozen-model/broadcast-apply pattern as
  * centroids and PQ codebooks. Training is deterministic: ties on pair
  * count break lexicographically.
  */
object Bpe {

  /** End-of-word marker (keeps merges from crossing word boundaries and
    * makes detokenization exact). */
  val Eow = "</w>"

  /** Merge rules in priority order, e.g. ("t","h") then ("th","e"). */
  final case class Model(merges: Seq[(String, String)]) {
    /** rank map for fast apply */
    @transient lazy val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  /** Symbols of one word = its Unicode CODE POINTS (+ [[Eow]]) — the
    * same segmentation as the distributed twin's `split(w, "")`, which
    * splits per code point on Spark 4. Mapping UTF-16 chars instead
    * would shatter any supplementary-plane character (emoji in web
    * text) into two lone surrogates and silently diverge the learned
    * merge tables between the driver reference and the engine. */
  private def wordSymbols(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result() :+ Eow
  }

  /** The engine-wide word surface: literal single-space split, empties
    * dropped, null text = no words — textually the distributed path's
    * `explode(split(col, " ")) ... filter(w =!= "")`, so [[train]] /
    * [[tokenizeUdf]] can never diverge from [[trainDistributed]] and
    * the ANSI-SQL oracle on tabs/newlines/double spaces (a `\\s+` split
    * here once did exactly that — latently, the fixtures being
    * single-spaced). */
  private def words(text: String): Seq[String] =
    if (text == null) Seq.empty
    else text.split(" ", -1).toSeq.filter(_.nonEmpty)

  /** Learn `numMerges` merge rules from the word-frequency table of a
    * bounded text sample. */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
      sampleLimit: Int = 2048): Model = {
    val spark = docs.sparkSession
    import spark.implicits._
    val texts = docs.select(col(textCol).cast("string"))
      .limit(sampleLimit).as[String].collect()
    val wordFreq = scala.collection.mutable.HashMap.empty[String, Long]
    texts.foreach(words(_).foreach { w =>
      wordFreq(w) = wordFreq.getOrElse(w, 0L) + 1L
    })
    var vocab: Vector[(Vector[String], Long)] =
      wordFreq.toVector.sortBy(_._1).map { case (w, n) => (wordSymbols(w), n) }
    val merges = Vector.newBuilder[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + n
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.maxBy { case ((a, b), n) => (n, a, b) } // det. tie-break
        if (best._2 < 2) done = true // nothing repeats — no signal left
        else {
          val (a, b) = best._1
          merges += ((a, b))
          val ab = a + b
          vocab = vocab.map { case (syms, n) =>
            val out = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                out += ab; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.result(), n)
          }
        }
      }
      round += 1
    }
    Model(merges.result())
  }

  /** DISTRIBUTED merge training over the FULL corpus, emitting the merge
    * table itself — (merge_rank, left_sym, right_sym, pair_count) — with
    * the loop structured so every round is plain relational algebra and
    * the whole run REPLAYS in ANSI SQL (the kcore unrolled-round
    * discipline; [[train]] is the driver-side reference this is
    * spec-equal to on a shared corpus).
    *
    * State = the word-frequency vocab exploded to (word, freq, pos, sym).
    * Each round: (1) adjacent-pair counts via a positional self-join;
    * (2) argmax by (count desc, left desc, right desc) — [[train]]'s
    * exact `maxBy` tie-break, binary string order in Spark, DuckDB, and
    * Scala alike; (3) LEFT-TO-RIGHT NON-OVERLAPPING application: within
    * each maximal run of consecutive match positions, take the 1st, 3rd,
    * 5th… (run-grouped `row_number` parity — provably equal to the
    * sequential walk, because a merge only consumes positions p, p+1 and
    * the walk resumes at p+2 against unchanged symbols); (4) renumber.
    *
    * Scale shape: state is vocab-sized (distinct words × word length),
    * all windows partition by word (bounded by word length), the 1-row
    * argmax broadcasts back, and each round's state is eagerly pinned
    * (localCheckpoint + stats reset via DatasetBridge.pinned — WITHOUT
    * the reset, LogicalRDD inherits the origin plan's stats and the
    * per-round joins compound sizeInBytes into an exponentially long
    * BigInt that stalls the optimizer) so lineage stays linear in
    * rounds. */
  def trainDistributed(docs: DataFrame, textCol: String,
      numMerges: Int): DataFrame =
    trainDistributedImpl(docs, textCol, numMerges, pin = true)

  /** `pin = false` keeps the full per-round plan visible (no checkpoint
    * re-wrap) so PlanAuditSpec can assert the round SHAPE — only usable
    * for a couple of rounds before the stats/lineage compounding that
    * pinning exists to stop. */
  private[graft] def trainDistributedImpl(docs: DataFrame, textCol: String,
      numMerges: Int, pin: Boolean): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val vocab = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
    import org.apache.spark.sql.graftbridge.DatasetBridge
    // pinnedKeepLayout, not pinned: round r's state RDD is ALREADY
    // hash-partitioned by w and sorted by (w, p) — its producing plan
    // ends in the row_number window over exactly that layout — so
    // keeping the layout in the checkpoint wrap lets every later round
    // skip the Exchange(w) a layout-blind wrap would re-pay (measured at
    // sf0.1: one shuffle per round × 12 rounds of vocab-sized state).
    def pinned(df: DataFrame): DataFrame =
      if (pin) DatasetBridge.pinnedKeepLayout(df) else df
    var st = pinned(vocab
      .select(col("w"), col("freq"),
        posexplode(concat(split(col("w"), ""), array(lit(Eow))))
          .as(Seq("p", "sym")))
      .withColumn("p", col("p") + 1))
    val rounds = Vector.newBuilder[DataFrame]
    var r = 1
    var done = false
    while (r <= numMerges && !done) {
      // one per-word exchange carries the WHOLE round: lead() supplies
      // adjacency (no positional self-join), the running match-count's
      // run-parity picks the left-to-right non-overlapping occurrences,
      // and lag(taken) marks consumed positions — every window clusters
      // by w, so Spark plans a single sort under one exchange. Positions
      // are dense (renumbered each round), which is what makes
      // "previous row" == "position p−1" in the lag.
      val byP = Window.partitionBy("w").orderBy("p")
      val withNext = st.withColumn("__nsym", lead(col("sym"), 1).over(byP))
      // train's stopping rules, verbatim: no adjacent pairs left, or the
      // best pair no longer repeats (count < 2 — no signal) → stop WITHOUT
      // emitting, exactly where the driver-side trainer stops.
      if (pin) {
        // production argmax: partial pair counts per partition off the
        // InternalRow iterator, merged + tie-broken on the driver — the
        // round's ONLY job is one single-stage collect (the DataFrame
        // agg paid an exchange, an AQE stage round-trip, and a
        // TakeOrdered job per round; this 12-round loop's wall was ~5×
        // its task CPU, pure driver/scheduling — r19 profile). The
        // driver merge is vocab-bounded (distinct adjacent pairs), the
        // ordering is bit-identical (BpeSpec pins pin=true ≡ pin=false).
        val bp = rddPairArgmax(withNext)
        if (bp.isEmpty || bp.get._3 < 2L) done = true
        else {
          val (a, b, cnt) = bp.get
          rounds += spark.createDataFrame(
            java.util.Arrays.asList(org.apache.spark.sql.Row(r, a, b, cnt)),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("merge_rank",
                org.apache.spark.sql.types.IntegerType, nullable = false),
              org.apache.spark.sql.types.StructField("left_sym",
                org.apache.spark.sql.types.StringType, nullable = true),
              org.apache.spark.sql.types.StructField("right_sym",
                org.apache.spark.sql.types.StringType, nullable = true),
              org.apache.spark.sql.types.StructField("pair_count",
                org.apache.spark.sql.types.LongType, nullable = true))))
          // the final round's state is never read — skip its rebuild
          if (r < numMerges) st = pinned(applyMergeStepLit(withNext, a, b))
        }
      } else {
        // audit path (pin = false): keep the round's plans VISIBLE in
        // the returned union so PlanAuditSpec can assert the shape
        val best = withNext
          .filter(col("__nsym").isNotNull)
          .groupBy(col("sym").as("a"), col("__nsym").as("b"))
          .agg(sum(col("freq")).as("pair_count"))
          .orderBy(desc("pair_count"), desc("a"), desc("b"))
          .limit(1)
        val bestRow = best.collect()
        if (bestRow.isEmpty || bestRow.head.getLong(2) < 2L) done = true
        else {
          rounds += best.select(lit(r).as("merge_rank"),
            col("a").as("left_sym"), col("b").as("right_sym"),
            col("pair_count"))
          if (r < numMerges)
            st = pinned(applyMergeStep(withNext,
              best.select(col("a"), col("b"))))
        }
      }
      r += 1
    }
    val out = rounds.result()
    require(out.nonEmpty,
      s"trainDistributed: no repeating adjacent pair in the corpus — " +
        s"0 of $numMerges merges learnable")
    out.reduce(_ unionAll _)
  }

  /** pin=true per-round argmax over the (sym, __nsym, freq) adjacency
    * view: per-partition partial pair counts read straight off the
    * InternalRow iterator (the state is already hash(w)-placed and
    * (w, p)-sorted via pinnedKeepLayout, so the whole plan — checkpoint
    * scan, lead() window, filter, partial count — is ONE stage with no
    * exchange), merged and tie-broken on the driver with the EXACT
    * ordering of the `orderBy(desc(pair_count), desc(a), desc(b))` form
    * it replaces: Long sums are associative, and string descent compares
    * UTF8 binary — `UTF8String.compareTo`, Spark's own string order.
    * The collect ships one (a, b, count) tuple per distinct adjacent
    * pair per partition — vocab-bounded, the same volume the exchange
    * carried. */
  private def rddPairArgmax(withNext: DataFrame)
      : Option[(String, String, Long)] = {
    val partial = withNext
      .filter(col("__nsym").isNotNull)
      .select(col("sym"), col("__nsym"), col("freq"))
      .queryExecution.toRdd.mapPartitions { it =>
        val m = new scala.collection.mutable.HashMap[(String, String), Long]()
        it.foreach { row =>
          // toString copies out of the (reused) UnsafeRow buffer
          val k = (row.getUTF8String(0).toString,
            row.getUTF8String(1).toString)
          m.update(k, m.getOrElse(k, 0L) + row.getLong(2))
        }
        m.iterator.map { case ((a, b), c) => (a, b, c) }
      }.collect()
    if (partial.isEmpty) return None
    val agg = new scala.collection.mutable.HashMap[(String, String), Long]()
    partial.foreach { case (a, b, c) =>
      agg.update((a, b), agg.getOrElse((a, b), 0L) + c)
    }
    import org.apache.spark.unsafe.types.UTF8String
    def gt(x: (String, String, Long), y: (String, String, Long)): Boolean =
      if (x._3 != y._3) x._3 > y._3
      else {
        val ca = UTF8String.fromString(x._1).compareTo(UTF8String.fromString(y._1))
        if (ca != 0) ca > 0
        else UTF8String.fromString(x._2).compareTo(UTF8String.fromString(y._2)) > 0
      }
    var best: (String, String, Long) = null
    agg.foreach { case ((a, b), c) =>
      val cand = (a, b, c)
      if (best == null || gt(cand, best)) best = cand
    }
    Some(best)
  }

  /** One left-to-right non-overlapping merge application over the
    * (w, freq, p, sym, __nsym) adjacency view: `best` is a 1-row (a, b)
    * frame (broadcast). Returns the renumbered (w, freq, p, sym) state. */
  private def applyMergeStep(withNext: DataFrame,
      best: DataFrame): DataFrame =
    applyMergeCore(withNext.crossJoin(broadcast(best)), col("a"), col("b"))

  /** [[applyMergeStep]] with the merge pair as DRIVER LITERALS — the
    * production-round form (the pair was just collected for the stop
    * rule anyway): no 1-row cross join, no per-round broadcast stage to
    * plan and schedule. The plan-audited crossJoin form stays for the
    * pin=false shape audit. */
  private def applyMergeStepLit(withNext: DataFrame,
      a: String, b: String): DataFrame =
    applyMergeCore(withNext, lit(a), lit(b))

  private def applyMergeCore(flagged0: DataFrame,
      aExpr: Column, bExpr: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byP = Window.partitionBy("w").orderBy("p")
    val flagged = flagged0
      .withColumn("__m", col("sym") === aExpr && col("__nsym") === bExpr)
      .withColumn("__rnm", sum(when(col("__m"), 1L).otherwise(0L)).over(
        byP.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // p − running-match-count is constant within a maximal run of
      // consecutive match positions — the classic gaps-and-islands key
      .withColumn("__grp", when(col("__m"), col("p") - col("__rnm")))
    val taken = flagged
      .withColumn("__taken", col("__m") &&
        (col("__rnm") - min(col("__rnm")).over(
          Window.partitionBy(col("w"), col("__grp")))) % 2 === 0)
      .withColumn("__consumed",
        coalesce(lag(col("__taken"), 1).over(byP), lit(false)))
    taken
      .filter(!col("__consumed"))
      .select(col("w"), col("freq"), col("p"),
        when(col("__taken"), concat(col("sym"), col("__nsym")))
          .otherwise(col("sym")).as("sym"))
      .withColumn("__p2", row_number().over(byP).cast("int"))
      .select(col("w"), col("freq"), col("__p2").as("p"), col("sym"))
  }

  /** DISTRIBUTED apply of a FIXED trained merge table: tokenize the
    * corpus vocabulary by replaying the merges in rank order — round r
    * applies merge r left-to-right non-overlapping over the per-word
    * symbol state, the exact transform a training round uses (and
    * provably equal to the greedy lowest-rank-first [[tokenizeWord]]:
    * merge r's operands are produced only by merges < r, and a merge
    * never deletes a symbol, so an earlier merge can never become newly
    * applicable after a later one — BpeSpec pins the equality).
    *
    * Returns the final per-word state (w, freq, p, sym): one row per
    * subword token occurrence, positions dense in token order. Per-word
    * token counts / per-doc subword counts are one groupBy away.
    *
    * Scale shape: identical to [[trainDistributed]] minus the pair-count
    * aggregations — state is vocab-sized, every window partitions by
    * word, each round's state is pinned, and the merge table is a
    * driver-side constant of |merges| rows (the frozen-model pattern). */
  def applyMergesDistributed(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.graftbridge.DatasetBridge
    val spark = docs.sparkSession
    val vocab = docs
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
    var st = DatasetBridge.pinned(vocab
      .select(col("w"), col("freq"),
        posexplode(concat(split(col("w"), ""), array(lit(Eow))))
          .as(Seq("p", "sym")))
      .withColumn("p", col("p") + 1))
    val byP = Window.partitionBy("w").orderBy("p")
    for ((a, b) <- merges) {
      val best = spark.range(1).select(lit(a).as("a"), lit(b).as("b"))
      val withNext = st.withColumn("__nsym", lead(col("sym"), 1).over(byP))
      st = DatasetBridge.pinned(applyMergeStep(withNext, best))
    }
    st
  }

  /** Tokenize one word with the learned merges (greedy lowest-rank-first,
    * the standard BPE apply). */
  def tokenizeWord(model: Model, w: String): Seq[String] = {
    var syms = wordSymbols(w)
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        model.rank.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) continue = false
      else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
        syms.drop(bestAt + 2)
    }
    syms
  }

  /** Distributed apply: text column → learned subword tokens. The model
    * rides the closure as a broadcast-sized constant (merge table,
    * ~numMerges strings). */
  def tokenizeUdf(model: Model) = udf { (text: String) =>
    words(text).flatMap(w => tokenizeWord(model, w))
  }

  def subwordCount(model: Model)(text: Column): Column =
    size(tokenizeUdf(model)(text))
}
