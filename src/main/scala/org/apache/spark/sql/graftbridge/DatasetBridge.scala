package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge to `private[sql]` Dataset constructors.
  *
  * `pinned` exists for ITERATIVE dataframe loops: `Dataset.localCheckpoint`
  * truncates the RDD lineage but PRESERVES the origin plan's statistics in
  * its LogicalRDD — so a loop whose round-r plan joins round-(r−1)'s
  * checkpoint k times compounds `sizeInBytes` as S_r ≈ S_{r−1}^k.
  * Catalyst's size estimate is an exact BigInt: by round ~9 it carries
  * ~3^9 words and every stats visit burns seconds in BigInteger
  * multiplication (observed: 0.6 s → 135 s per round in BPE training).
  * Rebuilding the DataFrame from the checkpointed internal RDD drops the
  * inherited stats — each round restarts from the constant default — while
  * keeping the same rows, schema, and truncated lineage, zero-copy. */
object DatasetBridge {
  def fromInternal(spark: SparkSession, rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** localCheckpoint `df` (lazy by default — materialization folds into
    * the first consuming action instead of costing one job per call, the
    * GlobalRank discipline) and re-wrap it stats-free. */
  def pinned(df: DataFrame, eager: Boolean = false): DataFrame = {
    val ck = df.localCheckpoint(eager)
    fromInternal(df.sparkSession, ck.queryExecution.toRdd, ck.schema)
  }
}
