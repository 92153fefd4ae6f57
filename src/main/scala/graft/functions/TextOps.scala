package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis building blocks for the LLM-data-pipeline surface
  * (dedup, quality scoring, language id, fingerprinting) over a
  * whitespace-tokenized `text` column.
  *
  * Everything that feeds an oracle-checked query is built from codegen'd
  * built-ins (`split`/`filter`/`transform`/`aggregate`/`xxhash64`/`md5`);
  * the MinHash/SimHash signatures used only for candidate generation are
  * compact Scala UDFs (single pass per document, no Python, no
  * serialization beyond the token array).
  */
object TextOps {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** 63-bit token hash from two char-polynomial folds, each finalized by
    * a Wang-style 32-bit mixer — unlike `xxhash64`, bit-for-bit
    * reproducible in ANSI SQL (the DuckDB `dedup_simhash` oracle
    * recomputes it): h = (mix₃₂(poly₃₁) ≫ 1)·2³² + mix₃₂(poly₃₇),
    * always ≥ 0 (bit 63 clear). The mixer (`((h≫16)⊕h)·0x45d9f3b mod
    * 2³²`, twice, then a final xor-shift) spreads short-token polys over
    * all 32 bits — without it the high bits of every short token are
    * zero and the simhash degenerates. Every intermediate stays < 2⁵⁹ so
    * ANSI overflow checking never trips on either engine. Empty chars
    * are filtered on both sides because Spark's `ascii('') = 0` and
    * DuckDB's `ord('') = -1` disagree. */
  def portableTokenHash64(tok: Column): Column = {
    val m32 = (1L << 32) - 1
    def mix(x: Column): Column = {
      def step(h: Column): Column =
        (h.bitwiseXOR(shiftrightunsigned(h, 16)) * lit(0x45d9f3bL)).bitwiseAND(lit(m32))
      val b = step(step(x))
      b.bitwiseXOR(shiftrightunsigned(b, 16))
    }
    def poly(base: Int): Column =
      aggregate(filter(split(tok, ""), c => length(c) > 0),
        lit(0L), (h, c) => (h * base + ascii(c)).bitwiseAND(lit(m32)))
    shiftrightunsigned(mix(poly(31)), 1) * lit(1L << 32) + mix(poly(37))
  }

  /** Wang-style 32-bit mixer shared by every portable hash: two rounds of
    * `((h≫16)⊕h)·0x45d9f3b mod 2³²` plus a final xor-shift. Intermediates
    * stay < 2⁵⁹, so the identical value is computable in overflow-checked
    * SQL (`BIGINT` only — the DuckDB oracles inline this expansion). */
  private[graft] def mix32(x: Long): Long = {
    var h = x
    h = ((h ^ (h >>> 16)) * 0x45d9f3bL) & 0xffffffffL
    h = ((h ^ (h >>> 16)) * 0x45d9f3bL) & 0xffffffffL
    h ^ (h >>> 16)
  }

  /** Scala twin of [[portableTokenHash64]] — identical bits (parity
    * spec'd), one pass per char with no per-char array materialization.
    * The Column form costs two `split(tok, "")` array builds per token,
    * which measured 5× slower on the sf0.1 simhash pipeline. */
  def portableTokenHash64(tok: String): Long = {
    var p1 = 0L; var p2 = 0L
    var i = 0
    while (i < tok.length) {
      val c = tok.charAt(i).toLong
      p1 = (p1 * 31 + c) & 0xffffffffL
      p2 = (p2 * 37 + c) & 0xffffffffL
      i += 1
    }
    ((mix32(p1) >>> 1) << 32) | mix32(p2)
  }

  /** Sorted-distinct PORTABLE shingle hashes, one UDF pass: the exact
    * shingle semantics of [[shinglesFromTokens]] (distinct word n-grams,
    * whole-text fallback for short docs) hashed with
    * [[portableTokenHash64]] — so a SQL oracle can rebuild the set
    * string-for-string, hash-for-hash. */
  def portableHashedShinglesUdf(n: Int) = udf { (toks: Seq[String]) =>
    // null token array (null text upstream) -> no shingles: the doc can
    // near-dup-match nothing, and one null row must not NPE a whole
    // corpus pass (winnowUdf set this convention)
    if (toks == null) Array.empty[Long]
    else {
    val shingles =
      if (toks.length >= n)
        (0 to toks.length - n).map(i => toks.slice(i, i + n).mkString(" ")).distinct
      else Seq(toks.mkString(" "))
    shingles.map(portableTokenHash64).distinct.sorted.toArray
    }
  }

  /** Portable MinHash permutations over 63-bit shingle hashes: perm `p`
    * re-keys each half through [[mix32]] with an additive per-perm
    * constant — h = (mix₃₂(hi + φ₃₂·(p+1)) ≫ 1)·2³² + mix₃₂(lo +
    * c₂·(p+1)) — then takes the per-perm minimum. Unlike the splitmix64
    * form ([[minhashUdf]]) every intermediate fits overflow-checked
    * BIGINT arithmetic, so the DuckDB oracle replays it exactly. */
  def portableMinhashUdf(numPerms: Int) = udf { (sh: Seq[Long]) =>
    val sig = Array.fill(numPerms)(Long.MaxValue)
    sh.foreach { s =>
      val hi = s >>> 32
      val lo = s & 0xffffffffL
      var p = 0
      while (p < numPerms) {
        val h = ((mix32((hi + 2654435761L * (p + 1)) & 0xffffffffL) >>> 1) << 32) |
          mix32((lo + 2246822507L * (p + 1)) & 0xffffffffL)
        if (h < sig(p)) sig(p) = h
        p += 1
      }
    }
    sig.toSeq
  }

  /** Portable LSH band keys: fold each band's slots — flattened to
    * (hi₃₂, lo₃₂) words — through `f = mix₃₂((f ⊕ word) ∧ (2³²−1))`, key =
    * band·2³² + f. Same collision contract as [[bandsUdf]] (equal keys ⟺
    * equal slots w.h.p.), SQL-replayable. */
  def portableBandsUdf(numBands: Int, rowsPerBand: Int) = udf { (sig: Seq[Long]) =>
    (0 until numBands).map { b =>
      var f = 0L
      var i = b * rowsPerBand
      while (i < (b + 1) * rowsPerBand) {
        val v = sig(i)
        f = mix32((f ^ (v >>> 32)) & 0xffffffffL)
        f = mix32((f ^ (v & 0xffffffffL)) & 0xffffffffL)
        i += 1
      }
      (b.toLong << 32) | f
    }
  }

  /** SimHash straight from the token array: portable per-token hash +
    * per-bit majority vote fused into one UDF pass — the hot path of
    * [[graft.operators.Dedup.simhashPairs]]. */
  val simhashFromTokensUdf = udf { (toks0: Seq[String]) =>
    // null-safe like the shingle UDF: null text simhashes as the empty
    // doc instead of NPE-ing the task (empty/null docs all sign 0 and
    // may pair with each other — the exact-dedup convention for equal
    // empty content)
    val toks = if (toks0 == null) Seq.empty[String] else toks0
    val acc = new Array[Int](64)
    toks.foreach { t =>
      val h = portableTokenHash64(t)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct word n-gram shingles (space-joined) from a PRE-MATERIALIZED
    * token-array column, the dedup unit for Jaccard / MinHash. Documents
    * shorter than n yield the whole text as a single shingle.
    *
    * `toks` must be a bound column (`withColumn("toks", tokens(text))`),
    * NOT an inline `split(...)`: each `element_at` in the lambda would
    * re-run the regex split, turning shingling O(tokens²) per document —
    * measured 10× slower at sf0.1. */
  def shinglesFromTokens(toks: Column, n: Int): Column = {
    val ngrams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (1 to n).map(j => element_at(toks, i + j)): _*))
    array_distinct(
      when(size(toks) >= n, ngrams).otherwise(array(concat_ws(" ", toks))))
  }

  /** |A ∩ B| / |A ∪ B| over two pre-distinct string arrays, in fp64. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast(DoubleType) /
      size(array_union(a, b)).cast(DoubleType)

  /** Ratio of tokens that are stopwords. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(text)
    size(filter(toks, t => t.isin(stopwords.map(lit): _*)))
      .cast(DoubleType) / size(toks).cast(DoubleType)
  }

  /** Mean token length (chars), assuming single-space joining. */
  def avgTokenLength(text: Column): Column = {
    val n = tokenCount(text)
    (length(text) - n + 1).cast(DoubleType) / n.cast(DoubleType)
  }

  /** Ratio of non-alphanumeric, non-space chars — a classic quality signal. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", "")))
      .cast(DoubleType) /
      greatest(length(text), lit(1)).cast(DoubleType)

  /** Canonical document fingerprint: md5 of the case/whitespace-normalized
    * text. Exact-dedup key that survives trivial reformatting. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** PII patterns for the scrub stage of a training-data pipeline. Kept
    * RE2-compatible (no backrefs/lookarounds) so Spark's java.util.regex
    * and DuckDB's RE2 match identically — the `text_scrub_pii` oracle
    * replays them verbatim. Conservative by design: a scrub stage wants
    * high precision; recall comes from running several narrow patterns. */
  val emailPattern: String = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  // \s not a literal space: a URL followed by a tab/newline must not
  // swallow the rest of the line (it would eat an adjacent email, which
  // n_emails then counts but the scrub replaces as <URL>). \s is
  // RE2-compatible and matches java.util.regex on ASCII whitespace.
  val urlPattern: String = "https?://[^\\s]+"

  /** Replace URLs then emails with placeholder tokens (URL first: a URL
    * userinfo part could otherwise be half-eaten by the email pattern). */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, urlPattern, "<URL>"),
      emailPattern, "<EMAIL>")

  // ---------------------------------------------------------------------
  // MinHash / SimHash signatures (candidate generation for near-dedup).
  // ---------------------------------------------------------------------

  /** Shingles hashed to 64-bit with codegen'd xxhash64 — the cheap set
    * representation for Jaccard/MinHash at scale (string sets and their
    * 64-bit images have equal cardinalities modulo ~2⁻⁶⁴ collisions).
    * Same bound-column contract as [[shinglesFromTokens]]. */
  def hashedShingles(toks: Column, n: Int): Column =
    transform(shinglesFromTokens(toks, n), s => xxhash64(s))

  /** splitmix64 — the standard 64-bit finalizer; each MinHash permutation
    * is splitmix64(shingleHash + golden·(p+1)), so the per-shingle string
    * hash is computed once (by xxhash64 upstream) and each permutation is
    * three multiplies. */
  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** MinHash signature over pre-hashed shingles: for each of `numPerms`
    * seeded mixes, the minimum over the document's shingle hashes. */
  def minhashUdf(numPerms: Int) = udf { (sh0: Seq[Long]) =>
    // null-guarded like simhashFromTokensUdf: one null row (null text
    // upstream) must not NPE a whole corpus pass
    val sh = if (sh0 == null) Seq.empty[Long] else sh0
    val sig = Array.fill(numPerms)(Long.MaxValue)
    sh.foreach { s0 =>
      var p = 0
      while (p < numPerms) {
        val h = mix64(s0 + 0x9e3779b97f4a7c15L * (p + 1))
        if (h < sig(p)) sig(p) = h
        p += 1
      }
    }
    sig.toSeq
  }

  /** LSH band keys from a MinHash signature: `numBands` keys, each hashing
    * `rowsPerBand` consecutive signature slots. Two docs collide on a band
    * iff that band's slots are all equal. */
  def bandsUdf(numBands: Int, rowsPerBand: Int) = udf { (sig0: Seq[Long]) =>
    val sig = if (sig0 == null) Seq.empty[Long] else sig0
    (0 until numBands).map { b =>
      val slice = sig.slice(b * rowsPerBand, (b + 1) * rowsPerBand)
      b.toLong << 56 | (slice.foldLeft(0xcbf29ce484222325L) { (h, v) =>
        (h ^ v) * 0x100000001b3L
      } & 0x00ffffffffffffffL)
    }
  }

  /** 64-bit SimHash over pre-hashed tokens (feed
    * `transform(tokens(c), t => portableTokenHash64(t))` for the
    * oracle-checkable pipeline). Near-duplicate docs land within a small
    * Hamming distance. */
  val simhashUdf = udf { (hashes0: Seq[Long]) =>
    // null-guarded (the docstring's transform(tokens(c), ...) feed IS
    // null for null text, and Graft.register exposes this as
    // graft_simhash): score the empty doc, don't NPE the query
    val hashes = if (hashes0 == null) Seq.empty[Long] else hashes0
    val acc = new Array[Int](64)
    hashes.foreach { h =>
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Hamming distance between two 64-bit simhashes (codegen'd, no UDF). */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** RAG-style strided chunking: fixed `win`-token windows every `stride`
    * tokens (overlap = win − stride) over the whitespace token array —
    * the retrieval-chunk prep between corpus and embedding. Scan-local
    * (a generated per-row sequence, no shuffle); short docs yield one
    * chunk, and a NULL-text doc behaves as an empty doc (one empty
    * chunk) rather than vanishing — under ANSI, size(null array) is
    * null and posexplode would silently drop the doc_id from the
    * output, losing the document from every downstream shard join.
    * Output: (idCol, chunk_no, n_tokens, chunk_text). */
  def chunkStride(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, win: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(win >= 1 && stride >= 1 && stride <= win,
      s"need 1 <= stride <= win (got win=$win stride=$stride)")
    df.select(col(idCol),
        tokens(coalesce(col(textCol), lit(""))).as("__t"))
      .select(col(idCol), size(col("__t")).as("n_tokens"),
        posexplode(transform(
          sequence(lit(0),
            greatest(ceil((size(col("__t")) - win).cast("double") / stride)
              .cast("int"), lit(0))),
          i => concat_ws(" ", slice(col("__t"), i * stride + 1, lit(win))))))
      .select(col(idCol), col("pos").cast("int").as("chunk_no"),
        col("n_tokens"), col("col").as("chunk_text"))
  }

  /** Winnowing-style rolling-hash fingerprint set: hash every k-gram of
    * chars, keep the minimum hash per window of w consecutive k-grams.
    * Compact sketch for containment-style near-dup detection.
    *
    * Gram hash is polynomial base-31 over UTF-16 units with NO modulus —
    * for k ≤ 9 printable-ASCII chars it stays far below 2⁶³, so the
    * identical value is computable in plain SQL and the
    * `text_winnow_sketch` DuckDB oracle recomputes it (ord == UTF-16
    * unit on ASCII; the testdata corpus is ASCII-only). */
  def winnowUdf(k: Int, w: Int) = udf { (text: String) =>
    if (text == null || text.length < k) Seq.empty[Long]
    else {
      val grams = (0 to text.length - k).map { i =>
        var h = 0L
        var j = i
        while (j < i + k) { h = h * 31 + text.charAt(j); j += 1 }
        h
      }
      (0 to grams.length - w)
        .map(i => grams.slice(i, i + w).min)
        .distinct
    }
  }
}
