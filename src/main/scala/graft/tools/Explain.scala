package graft.tools


import graft.SparkEntry

/** Plan auditor: print formatted physical plans for selected queries.
  * Usage: runMain graft.tools.Explain [queryName ...] */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    // the EXACT session shape the benchmark runs (shared builder, like
    // tools/Time) — a hand-copied config here once made audited plans
    // free to drift from benchmarked plans whenever Bench's changed
    val spark = graft.Bench.benchSession(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      println(s"\n========== $name ==========")
      try println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
    }
    spark.stop()
  }
}
