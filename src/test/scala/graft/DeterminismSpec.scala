package graft

/** Oracle-parity guard: every oracle-checked query must be fully
  * deterministic INCLUDING row order — two independent executions must
  * collect identical row sequences (the driver hash-compares ordered
  * values against DuckDB, so a nondeterministic sort tiebreak or
  * shuffle-order-dependent float would flip hashes between rounds). */
class DeterminismSpec extends SparkSpec {

  for (name <- SparkEntry.oracleSql.keys.toSeq.sorted) {
    test(s"$name is run-to-run deterministic incl. row order") {
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sf0001).collect().toSeq
      val b = fn(spark, sf0001).collect().toSeq
      assert(a === b, s"$name differs between runs")
    }
  }

  // rows-only queries get no driver hash, so a nondeterminism regression
  // there would be invisible to the correctness gate — pin them here
  // (seeded k-means, Jacobi eigensolve, and BPE training are all
  // deterministic by construction)
  for (name <- (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted) {
    test(s"$name (rows-only) is run-to-run deterministic incl. row order") {
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sf0001).collect().toSeq
      val b = fn(spark, sf0001).collect().toSeq
      assert(a === b, s"$name differs between runs")
    }
  }
}
