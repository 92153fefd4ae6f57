package graft

/** Contract smoke: entry returns rows; every declared query runs and is
  * non-empty at sf0.001; every oracle key has a query. */
class EntrySpec extends SparkSpec {

  test("entry (flagship) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs non-empty on sf0.001") {
      assert(fn(spark, sf0001).count() > 0, s"$name returned 0 rows")
    }
  }
}
