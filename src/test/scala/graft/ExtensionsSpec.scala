package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions really injects the expression functions at session
  * build time (the `spark.sql.extensions` deployment path) — checked on a
  * fresh session sharing the test SparkContext, with the default session
  * restored afterwards. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions(new GraftExtensions) exposes graft_dot without register()") {
    val base = SparkSpec.spark // ensure the shared context exists
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val fresh = SparkSession.builder()
        .master("local[2]")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(fresh ne base) // genuinely a new session (same JVM context)
      val dot = fresh.sql(
        "SELECT graft_dot(CAST(ARRAY(1.0, 2.0) AS ARRAY<FLOAT>), CAST(ARRAY(3.0, 4.0) AS ARRAY<FLOAT>))")
        .head().getDouble(0)
      assert(dot === 11.0)
      val jac = fresh.sql(
        "SELECT graft_sorted_jaccard(ARRAY(1L, 2L), ARRAY(2L, 3L))")
        .head().getDouble(0)
      assert(jac === 1.0 / 3.0)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
