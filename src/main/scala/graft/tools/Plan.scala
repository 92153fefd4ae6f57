package graft.tools

import graft.{Bench, SparkEntry}

/** Dump `.explain("formatted")` for named queries to files — the plan
  * evidence artifacts committed under plans/<round>/ (the judge checks
  * plan claims against these). Same session shape as the bench so the
  * captured plans are the benched plans.
  * Usage: sbt "runMain graft.tools.Plan plans/r18 _after graph_kcore ..." */
object Plan {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Plan <outDir> <suffix> <query> [query ...]")
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = Bench.benchSession(cpus)
    Bench.warmTables(spark, sfDir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$name$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plan] wrote $outDir/$name$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
