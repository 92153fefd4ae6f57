package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

package object operators {

  /** Fail fast on the numeric-id contract shared by the blocked/aggregated
    * operators (bruteForceBlocked, TopKAggregator.topK, minhashPairs,
    * embeddingPairs): ids are carried as primitive longs in their hot
    * paths, and a silent `cast("long")` would turn non-numeric ids into
    * nulls that unbox to 0 — wrong neighbors with no error. */
  private[operators] def requireIntegralId(df: DataFrame, c: String, op: String): Unit =
    df.schema(c).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"$op: id column '$c' must be integral (byte/short/int/long) — " +
          s"got ${t.sql}. Map ids to a long surrogate key first.")
    }
}
