package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{SortedLongJaccard, TextOps, VectorOps}

/** Deduplication operators for a large-scale training-data pipeline:
  * exact (hash-groupBy), MinHash+LSH, SimHash, n-gram Jaccard, and
  * embedding-cosine near-dup. The reference's only dedup is the idempotent
  * skip-existing ingest check (reference: vector_db.py:127-132); these
  * generalize it to content-level dedup designed for 100 TB:
  *
  *  - exact/fingerprint dedup is one hash-shuffle on a 16-byte key;
  *  - near-dup never materializes the O(n²) pair space — LSH band keys
  *    bucket the corpus so only same-bucket pairs are scored, which is a
  *    shuffle on band keys + a within-bucket self-join;
  *  - every candidate pair is exact-verified (Jaccard / Hamming / cosine)
  *    so precision is 1.0 and only recall depends on the LSH parameters.
  */
object Dedup {

  /** Exact dedup groups by content hash: one row per duplicated text with
    * the surviving (minimum) id and the number of copies. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), md5(col(textCol)).as("h"))
      .groupBy("h")
      .agg(count("*").as("n_copies"), min(idCol).as("keep_id"))
      .filter(col("n_copies") > 1)

  /** Keep one row per distinct content hash (min id wins) — the "apply"
    * form of exact dedup. */
  def dropExactDuplicates(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash-LSH near-dup pairs, exact-verified with shingle Jaccard.
    *
    * shingle → minhash(numPerms) → band keys → explode → self-join on band
    * key (the bucket join) → distinct candidate pair → exact Jaccard ≥
    * threshold. Pair space is bounded by bucket sizes, not n².
    */
  def minhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      numBands: Int = 8,
      rowsPerBand: Int = 4,
      threshold: Double = 0.6,
      maxBucketSize: Int = 1024): DataFrame = {
    val numPerms = numBands * rowsPerBand
    val sh = docs
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .select(col(idCol).as("id"),
        SortedLongJaccard.sortedHashedShingles(col("__toks"), shingleSize).as("sh"))
    val allBands = sh
      .withColumn("band",
        explode(TextOps.bandsUdf(numBands, rowsPerBand)(
          TextOps.minhashUdf(numPerms)(col("sh")))))
      .select("band", "id")
    // candidate pairs from bucket MEMBER LISTS (one aggregation — the
    // shingle+minhash lineage is evaluated once, not once per join side).
    // The scale guard lives here too: a degenerate band key (boilerplate /
    // empty docs) would make its bucket quadratic; such buckets carry no
    // near-dup signal worth O(bucket²), so drop them (standard LSH
    // practice). The cap also bounds the in-memory pair expansion below:
    // maxBucketSize² / 2 tuples per bucket (1024 → ≤ ~524k pairs, ~8 MB).
    val pairsUdf = udf { (ids: Seq[Long]) =>
      val sorted = ids.sorted
      for {
        i <- sorted.indices
        j <- (i + 1) until sorted.length
      } yield (sorted(i), sorted(j))
    }
    val cands = allBands
      .groupBy("band").agg(collect_list(col("id").cast("long")).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucketSize)
      .select(explode(pairsUdf(col("ids"))).as("p"))
      .select(col("p._1").as("left_id"), col("p._2").as("right_id"))
      .dropDuplicates("left_id", "right_id")
    cands
      .join(sh.select(col("id").as("left_id"), col("sh").as("left_sh")), Seq("left_id"))
      .join(sh.select(col("id").as("right_id"), col("sh").as("right_sh")), Seq("right_id"))
      .withColumn("jaccard",
        round(SortedLongJaccard.sortedJaccard(col("left_sh"), col("right_sh")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("left_id"), col("right_id"), col("jaccard"))
  }

  /** SimHash near-dup pairs: 64-bit signature, banded into `numBands`
    * chunks (a pair within Hamming distance d < numBands must agree on at
    * least one chunk — pigeonhole), bucket-join on (band index, chunk),
    * exact-verify with `bit_count(xor)`. */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 3,
      numBands: Int = 4): DataFrame = {
    val bits = 64 / numBands
    require(maxHamming < numBands,
      s"pigeonhole needs maxHamming < numBands ($maxHamming >= $numBands)")
    val sig = docs.select(col(idCol).as("id"),
      TextOps.simhashUdf(
        transform(TextOps.tokens(col(textCol)), t => xxhash64(t))).as("sim"))
    val banded = sig.select(col("id"), col("sim"),
      explode(array((0 until numBands).map { i =>
        struct(lit(i).as("band"),
          shiftrightunsigned(col("sim"), i * bits)
            .bitwiseAND(lit((1L << bits) - 1)).as("chunk"))
      }: _*)).as("bk"))
      .select(col("id"), col("sim"), col("bk.band"), col("bk.chunk"))
    val a = banded.select(col("band"), col("chunk"), col("id").as("left_id"), col("sim").as("left_sim"))
    val b = banded.select(col("band"), col("chunk"), col("id").as("right_id"), col("sim").as("right_sim"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("left_id") < col("right_id"))
      .dropDuplicates("left_id", "right_id")
      .withColumn("hamming", TextOps.hamming64(col("left_sim"), col("right_sim")))
      .filter(col("hamming") <= maxHamming)
      .select("left_id", "right_id", "hamming")
  }

  /** Exact n-gram-Jaccard near-dup pairs with a blocking predicate on the
    * left side (`leftFilter`) to bound the pair space; at full scale the
    * MinHash path above is the candidate generator and this is the verify
    * stage. */
  def jaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int,
      threshold: Double,
      leftFilter: DataFrame => DataFrame = identity): DataFrame = {
    val sh = docs
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .select(col(idCol).as("id"),
        SortedLongJaccard.sortedHashedShingles(col("__toks"), shingleSize).as("sh"))
    val a = leftFilter(sh).select(col("id").as("left_id"), col("sh").as("left_sh"))
    val b = sh.select(col("id").as("right_id"), col("sh").as("right_sh"))
    a.crossJoin(b)
      .filter(col("left_id") < col("right_id"))
      .withColumn("jaccard",
        round(SortedLongJaccard.sortedJaccard(col("left_sh"), col("right_sh")), 6))
      .filter(col("jaccard") >= threshold)
      .select("left_id", "right_id", "jaccard")
  }

  /** Embedding-cosine near-dup pairs (exact, blocked on the left side).
    * The LSH-bucketed scale path is [[AnnIvf.cosinePairsViaIndex]]. */
  def embeddingPairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      leftFilter: DataFrame => DataFrame = identity): DataFrame = {
    val v = vectors.select(col(idCol).as("id"), col(vecCol).as("vec"))
    val a = leftFilter(v).select(col("id").as("left_id"), col("vec").as("left_vec"))
    val b = v.select(col("id").as("right_id"), col("vec").as("right_vec"))
    a.crossJoin(b)
      .filter(col("left_id") < col("right_id"))
      .withColumn("score",
        round(VectorOps.dot(col("left_vec"), col("right_vec")), 6))
      .filter(col("score") >= threshold)
      .select("left_id", "right_id", "score")
  }
}
