package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator in SURVEY.md §2 is exercised by a keyed entry in
  * [[queries]]; entries with a DuckDB-expressible equivalent also appear in
  * [[oracleSql]] (hash-compared by the driver at sf0.01), the rest
  * (k-means ANN, LSH candidate generation, language-id heuristics) get the
  * rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Brute-force KNN with label enrichment — scan → broadcast theta-join →
    * fp64 dot product → group-limit top-k (SURVEY.md §7.1). */
  def entry(spark: SparkSession): DataFrame =
    VectorQueries.queries("knn_bruteforce")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val mods = Seq(RelationalQueries.queries, VectorQueries.queries,
      TextQueries.queries, EventQueries.queries)
    // ++ is silently last-wins: a duplicate key across modules would
    // drop one implementation and could hash its survivor against the
    // OTHER module's oracle — refuse loudly instead
    val merged = mods.reduce(_ ++ _)
    require(merged.size == mods.map(_.size).sum,
      "duplicate query keys across modules: " +
        mods.flatMap(_.keys).groupBy(identity).collect {
          case (k, v) if v.size > 1 => k }.mkString(", "))
    merged
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops →
    * driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++ VectorQueries.oracle ++
      TextQueries.oracle ++ EventQueries.oracle
}
