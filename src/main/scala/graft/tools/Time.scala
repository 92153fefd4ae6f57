package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Targeted per-query timer for perf work: same session shape as
  * [[graft.Bench]] (broadcast threshold, shuffle partitions, table
  * warmup), but runs ONLY the named queries — one untimed warmup then
  * median of `SPARK_GRAFT_BENCH_TRIALS` (default 5) timed runs each.
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *          sbt "runMain graft.tools.Time graph_kcore graph_bfs" */
object Time {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Time <queryName> [queryName ...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val trials = sys.env.getOrElse("SPARK_GRAFT_BENCH_TRIALS", "5").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try graft.queries.table(spark, sfDir, t).count()
      catch { case _: Throwable => }
    }
    for (name <- args) {
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      try fn(spark, sfDir).count() // warmup: codegen + footer cache
      catch { case e: Throwable =>
        println(s"[time] $name WARMUP FAILED: ${e.getMessage}")
      }
      val samples = Vector.fill(trials) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = samples(samples.size / 2)
      println(f"[time] $name%-28s median=$med%7.3f s  " +
        s"all=${samples.map(s => f"$s%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
