package graft.tools

import graft.{Bench, SparkEntry}

/** Targeted per-query timer for perf work: the EXACT session shape as
  * [[graft.Bench]] (shared `Bench.benchSession`/`warmTables`, so the
  * timer can never drift from the benchmark's plans) but runs ONLY the
  * named queries — one untimed warmup then median of
  * `SPARK_GRAFT_BENCH_TRIALS` (default 5) timed runs each. A failing
  * query is reported and skipped; the remaining queries still time.
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *          sbt "runMain graft.tools.Time graph_kcore graph_bfs" */
object Time {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Time <queryName> [queryName ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val trials = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "5").toInt
    val unknown = args.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown queries: ${unknown.mkString(", ")} — nothing was timed")
    val spark = Bench.benchSession(cpus)
    Bench.warmTables(spark, sfDir)
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      try {
        fn(spark, sfDir).count() // warmup: codegen + footer cache
        val samples = Vector.fill(trials) {
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        val med = samples(samples.size / 2)
        println(f"[time] $name%-28s median=$med%7.3f s  " +
          s"all=${samples.map(s => f"$s%.3f").mkString(",")}")
      } catch { case e: Throwable =>
        println(s"[time] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
