package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the oracle-checked query surface.
  *
  * Oracle-parity rules (SURVEY.md §5.1, §7.4):
  *  - money/quantity sums aggregate in DECIMAL(18,4) — exact, order-
  *    independent — then cast to DOUBLE for output, so Spark and DuckDB
  *    produce bit-identical values regardless of shuffle order;
  *  - every computed float column is explicitly rounded;
  *  - every query output is deterministically ordered with explicit
  *    tiebreak keys, and every aggregate/computed column is aliased to the
  *    same name on both sides.
  */
package object queries {

  type Query = (SparkSession, String) => DataFrame

  /** Session-scoped build-once caches (ANN index registry, component
    * map), keyed by the session object. RETENTION CONTRACT: cached
    * values (DataFrames, indexes) strongly reference their
    * SparkSession, so an entry keeps its session reachable and the weak
    * keying alone cannot collect it — a long-lived JVM hosting MANY
    * short-lived sessions must call [[clearSessionCache]] when it
    * retires a session (the repo's own mains run one session per JVM
    * and the test harness one shared session, so they never need to).
    * The weak keying still prevents identity-hash collisions against a
    * cleared-and-collected session's stale entries. */
  private val sessionCaches =
    new java.util.WeakHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[Any, Any]]()

  def sessionCached[T](s: SparkSession, key: Any)(build: => T): T = {
    val cache = sessionCaches.synchronized {
      var c = sessionCaches.get(s)
      if (c == null) {
        c = scala.collection.concurrent.TrieMap.empty[Any, Any]
        sessionCaches.put(s, c)
      }
      c
    }
    // fast path lock-free; the BUILD runs under the per-session cache
    // monitor — TrieMap.getOrElseUpdate alone may evaluate the thunk in
    // two racing threads and discard one result, leaking the loser's
    // persisted artifacts (an index build, a temp dir) for the session's
    // life
    cache.get(key) match {
      case Some(v) => v.asInstanceOf[T]
      case None =>
        cache.synchronized {
          cache.getOrElseUpdate(key, build).asInstanceOf[T]
        }
    }
  }

  /** Drop (and unpersist) everything cached for `s` — the hook a host
    * that cycles through many sessions calls on session retirement; see
    * the retention contract above. */
  def clearSessionCache(s: SparkSession): Unit = {
    val c = sessionCaches.synchronized(sessionCaches.remove(s))
    if (c != null) c.values.foreach {
      case df: DataFrame =>
        try df.unpersist(blocking = false)
        catch { case _: Throwable => () }
      case _ => ()
    }
  }

  def table(s: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // Some testdata generations declare events.ts as TIMESTAMP(NANOS),
      // which the vectorized parquet reader rejects; read nanos as long
      // and convert to a µs timestamp (lossless here: the generator emits
      // whole microseconds, which is also what DuckDB sees after its
      // NANOS→TIMESTAMP coercion). Other generations write µs TIMESTAMP
      // directly — the shim must then be a no-op, so gate it on the
      // actually-read type.
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = s.read.parquet(s"$dir/$name.parquet")
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          // µs TIMESTAMP without zone: reinterpret at the (UTC) session
          // zone — watermarks/windows require TIMESTAMP_LTZ, and this
          // matches what the nanos shim produced on older generations.
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    } else s.read.parquet(s"$dir/$name.parquet")

  /** Exact decimal view of a double expression. Scale 6 because every
    * summand in the testdata is an exact ≤6-dp decimal (prices/balances
    * have 2 dp; discount/tax products have ≤6), so the double→decimal cast
    * is exact — and identical — in both Spark (shortest-string HALF_UP)
    * and DuckDB (numeric scaling), keeping sums bit-equal. A 4-dp scale is
    * NOT safe: 6-dp products land on .xxxx5 boundaries where the two
    * engines' rounding modes diverge. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 6))

  /** Order-independent sum of a double expression: exact decimal
    * accumulation, double output. */
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  /** Mean from an exact decimal sum: deterministic double division. */
  def davg(c: Column): Column =
    round(sum(dec(c)).cast(DoubleType) / count(lit(1)), 4)

  /** DuckDB fragments mirroring dsum/davg. */
  def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE)"
  def sqlDavg(expr: String): String =
    s"ROUND(CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4)"

  /** DuckDB expansion of `TextOps.mix32` — the shared 32-bit finalizer
    * behind every portable hash (token/simhash/minhash/bands/HLL). */
  def mixSql(y: String): String = {
    val s1 = s"((XOR(($y), ($y) >> 16) * 73244475) & 4294967295)"
    val s2 = s"((XOR($s1, $s1 >> 16) * 73244475) & 4294967295)"
    s"XOR($s2, $s2 >> 16)"
  }

  /** DuckDB expansion of `TextOps.portableTokenHash64(s)` given char
    * polys `p1`/`p2` already computed. */
  def tokenHashSql(p1: String, p2: String): String =
    s"(${mixSql(p1)} >> 1) * 4294967296 + ${mixSql(p2)}"

  /** The char polys over a string SQL expression, as a 2-element list:
    * plug into [[tokenHashSql]] after naming them in a CTE. */
  def polySql(strExpr: String, base: Int): String =
    s"""LIST_REDUCE(LIST_PREPEND(0::BIGINT,
       [ORD(c) FOR c IN REGEXP_SPLIT_TO_ARRAY($strExpr, '') IF c <> '']),
       (a, b) -> (a * $base + b) & 4294967295)"""
}
