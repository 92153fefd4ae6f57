package graft.operators

import org.apache.spark.sql.DataFrame
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

  /** Exact per-group cap: keep at most `n` rows per group (deterministic by
    * `orderCol`) — the "max documents per domain" dedup-adjacent primitive. */
  def capPerGroup(df: DataFrame, groupCol: String, orderCol: String, n: Int): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(groupCol).orderBy(orderCol)))
      .filter(col("__rn") <= n)
      .drop("__rn")
}
