package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection over an embedding column —
  * the data-independent sibling of [[EmbeddingPca]]: no fit pass at all,
  * so it is the dimension-reduction you reach for when even one
  * `treeAggregate` over 100 TB is too much, or when the sketch must be
  * reproducible across disjoint corpora (the projection depends only on
  * the seed, never on the data — two clusters can sketch independently
  * and their outputs land in the SAME space, unlike PCA whose basis
  * drifts with the corpus).
  *
  * Achlioptas (2001) shows Rademacher ±1 entries satisfy the JL lemma
  * with the same distortion bounds as Gaussian matrices; we draw the
  * signs from the repo-wide portable 32-bit mixer so an external system
  * (or the DuckDB oracle) can regenerate the identical matrix from
  * (seed, k, d) alone.
  *
  * Scale shape: the sign matrix is a k×d literal baked into the plan
  * (≤ 512×512 = 262 144 immediates — far under codegen limits for the
  * k ≤ 64 sketches this targets), the projection is a scan-local
  * `zip_with` + ordered `aggregate` fold per output dim: no shuffle, no
  * driver data movement, whole-stage-codegen friendly. The fold order is
  * fixed (ascending input dim), so results are bit-reproducible across
  * partitionings AND replayable in any engine with an ordered list fold.
  *
  * Reference ships raw 512-d CLIP vectors (vector_db.py:102-118); this
  * is the corpus-scale sketching stage in front of clustering / dedup.
  */
object RandomProjection {

  /** The k×d Rademacher sign matrix: entry (r, j) is +1 when the low bit
    * of `mix32(seed·k·d + r·d + j)` is set, else −1. Deterministic in
    * (k, d, seed); regenerable anywhere the mixer is (SQL included). */
  def signMatrix(k: Int, d: Int, seed: Long): Array[Array[Double]] = {
    require(k >= 1 && d >= 1 && k.toLong * d <= (1 << 18),
      s"sign matrix $k x $d too large to inline")
    // |seed| bound (the portableSplitBucket contract): seed·k·d must stay
    // in Long — JVM arithmetic would wrap silently while the documented
    // overflow-checked SQL replay raises, so the same (seed, k, d) would
    // regenerate a DIFFERENT matrix outside Spark
    require(math.abs(seed) < Int.MaxValue.toLong,
      s"signMatrix: |seed| must be < 2^31 for portable arithmetic (got $seed)")
    Array.tabulate(k, d) { (r, j) =>
      val h = graft.functions.TextOps.mix32(
        (seed * k * d + r.toLong * d + j) & 0xffffffffL)
      if ((h & 1L) == 1L) 1.0 else -1.0
    }
  }

  /** Projection column: `array<double>` of length k where entry r is the
    * UNSCALED signed sum Σⱼ sign(r,j)·x(j), folded in ascending j (JL
    * consumers wanting isometry multiply by 1/√k — kept out of the fold
    * so every arithmetic op here is exact: ±1 products don't round).
    * `vec` must be an array column of length d. */
  def projectExpr(vecCol: String, k: Int, d: Int, seed: Long): Column = {
    val s = signMatrix(k, d, seed)
    val dims = (0 until k).map { r =>
      val signs = s(r).map(v => if (v > 0) "1D" else "-1D").mkString(",")
      s"aggregate(zip_with(cast(`$vecCol` as array<double>), array($signs)," +
        s" (x, s) -> x * s), 0D, (a, v) -> a + v)"
    }
    expr(dims.mkString("array(", ",", ")"))
  }

  /** (id, r, proj): the long-form projection of `df`, one row per output
    * dimension, `proj` rounded to 6 dp for cross-engine comparison. */
  def projectLong(df: DataFrame, idCol: String, vecCol: String,
      k: Int, d: Int, seed: Long): DataFrame =
    df.select(col(idCol),
        posexplode(projectExpr(vecCol, k, d, seed)).as(Seq("r", "proj")))
      .select(col(idCol), col("r"), round(col("proj"), 6).as("proj"))

  /** The DuckDB replay of [[projectLong]] for table `tbl`: same sign
    * literals, same ascending-j `list_reduce` fold, same rounding. */
  def oracleSql(tbl: String, idCol: String, vecCol: String,
      k: Int, d: Int, seed: Long): String = {
    val s = signMatrix(k, d, seed)
    val arms = (0 until k).map { r =>
      val signs = s(r).map(v => if (v > 0) "1" else "-1").mkString(",")
      // list_prepend(0): list_reduce seeds from the first element, Spark's
      // aggregate seeds from 0D — identical folds except a -0.0 lead term,
      // which the explicit zero neutralizes on both engines
      s"""SELECT $idCol, $r AS r, ROUND(list_reduce(
         |  list_prepend(CAST(0 AS DOUBLE), list_transform(generate_series(1, $d),
         |    j -> CAST($vecCol[j] AS DOUBLE) * ([$signs]::DOUBLE[])[j])),
         |  (a, v) -> a + v), 6) AS proj FROM $tbl""".stripMargin
    }
    arms.mkString("", "\nUNION ALL\n", s"\nORDER BY $idCol, r")
  }
}
