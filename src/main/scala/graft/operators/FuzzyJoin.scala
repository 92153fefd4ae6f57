package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Edit-distance similarity join — the entity-resolution primitive
  * (near-identical titles, OCR'd captions, URL slugs) the token-level
  * dedup stack ([[Dedup.jaccardPairs]] on word shingles) cannot express:
  * a one-character typo changes every shingle containing it but moves
  * Levenshtein distance by exactly 1.
  *
  * Algorithm: q-gram prefix filtering (Ed-Join, Xiao, Wang & Lin, VLDB
  * 2008 — public), composed from the same pieces as the PPJoin stack in
  * [[Dedup]]:
  *
  *  1. pad each string with q−1 sentinel chars on both ends and slide a
  *     q-char window → gram bags (padding guarantees ≥ q grams for ANY
  *     non-null string, so short strings stay joinable);
  *  2. one edit operation destroys at most q grams, so
  *     ed(s₁,s₂) ≤ k ⇒ |G₁ ∩ G₂| ≥ max(|G₁|,|G₂|) − q·k (count bound,
  *     multiset intersection);
  *  3. prefix-filter lemma: order every gram bag by ONE global total
  *     order (document frequency asc, tiebreak gram/occurrence — rarest
  *     first) and keep each string's first q·k+1 elements; any pair
  *     meeting the count bound shares ≥ 1 element between PREFIXES — so
  *     joining on prefix elements has zero false negatives;
  *  4. candidates pass the cheap |len₁−len₂| ≤ k filter, dedupe, and are
  *     verified with the exact `levenshtein` (codegen built-in).
  *
  * Scale shape: the gram-frequency pass is one map-side-combined groupBy
  * over ~L grams per string; the join key is the PREFIX element — by
  * construction each string's q·k+1 RAREST grams, so bucket sizes are
  * anti-correlated with gram frequency (the Ed-Join point: the
  * boilerplate gram every string shares is precisely the one that never
  * lands in a prefix unless the string has nothing rarer). Verification
  * is one codegen'd Levenshtein per surviving candidate. No cartesian
  * anywhere.
  */
object FuzzyJoin {

  /** Padding sentinel (U+0001) — a control char that does not appear in
    * text columns; it only affects BLOCKING (verification runs on the
    * raw strings), so even a collision would cost recall of nothing. */
  private val Sentinel = "\u0001"

  /** Gram bag of `strCol` padded with q−1 sentinel chars both ends: a
    * string of length L yields L+q−1 grams (≥ q even for L = 1, so no
    * string falls out of the blocking). */
  private def grams(strCol: Column, q: Int): Column = {
    val pad = Sentinel * (q - 1)
    val padded = concat(lit(pad), strCol, lit(pad))
    transform(
      sequence(lit(1), length(padded) - (q - 1)),
      i => substring(padded, i, lit(q)))
  }

  /** All pairs within Levenshtein distance `maxDist` inside one table:
    * (left_id, right_id, dist) with left_id < right_id, dist exact.
    * Ids must be numeric (cast to long).
    *
    * Multiset-correct blocking: gram OCCURRENCES are the join elements —
    * the o-th copy of gram g in s₁ can only match the o-th copy in s₂,
    * which makes set machinery exact on multisets (Σ min(c₁,c₂) elements
    * match) and keeps the prefix lemma airtight when strings repeat
    * grams ("aaaa…"). Exact-duplicate strings should be removed first
    * (one exact-dedup pass): N identical strings share identical
    * prefixes and legitimately produce all N²/2 pairs. */
  def selfPairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int,
      q: Int = 2): DataFrame = {
    require(maxDist >= 0 && q >= 2, s"need maxDist >= 0, q >= 2")
    // a fractional id column would silently truncate under the long cast
    // (two docs collapse onto one id; pairs vanish or mislabel) — the
    // exact hazard requireIntegralId exists for
    requireIntegralId(df, idCol, "FuzzyJoin.selfPairs")
    val prefixLen = q * maxDist + 1
    val docs = df
      .select(col(idCol).cast("long").as("id"), col(strCol).as("s"))
      .filter(col("id").isNotNull && col("s").isNotNull)
    val g = docs
      .select(col("id"), col("s"),
        posexplode(grams(col("s"), q)).as(Seq("pos", "gram")))
      .withColumn("occ", row_number().over(
        Window.partitionBy("id", "gram").orderBy("pos")))
    // element universe is (gram, occ); df = how many docs own that
    // element, i.e. have at least `occ` copies of `gram`
    val freq = g.groupBy("gram", "occ").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("id").orderBy(col("df"), col("gram"), col("occ"))
    // The count bound is vacuous for a pair whose LONGER string has
    // length < q·(k−1)+2 (its padded gram bag is ≤ q·k elements, all of
    // which k edits can destroy) — only short-SHORT pairs escape, since
    // a short-long pair is protected by the long side's bound and the
    // min(bag, q·k+1) prefix. Route strings at or under the threshold
    // into one extra universal block element; its bucket is quadratic in
    // the SHORT-string count, which after exact dedup is bounded by the
    // alphabet^threshold distinct values — trivial next to the corpus.
    val shortMax = q * (maxDist - 1) + 1
    val shortRows = docs.filter(length(col("s")) <= shortMax)
      .select(col("id"), col("s"), lit("\u0000S").as("gram"), lit(0).as("occ"))
    val prefixes = g
      .join(freq, Seq("gram", "occ"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= prefixLen)
      .select(col("id"), col("s"), col("gram"), col("occ"))
      .unionByName(shortRows)
    val cand = prefixes.as("a").join(prefixes.as("b"),
        col("a.gram") === col("b.gram") && col("a.occ") === col("b.occ") &&
          col("a.id") < col("b.id"))
      .filter(abs(length(col("a.s")) - length(col("b.s"))) <= maxDist)
      .select(col("a.id").as("left_id"), col("a.s").as("ls"),
        col("b.id").as("right_id"), col("b.s").as("rs"))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("ls"), col("rs")))
      .filter(col("dist") <= maxDist)
      .select(col("left_id"), col("right_id"), col("dist"))
  }
}
