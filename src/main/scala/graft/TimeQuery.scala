package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time one declared query in isolation.
  *
  * {{{ sbt "runMain graft.TimeQuery <queryName> <sfDir> [runs]" }}}
  *
  * Prints one `[timeq]` line per run (cold first run includes session/
  * index warmup; later runs show the steady state the bench medians
  * report). Not part of the driver contract — Bench remains the
  * measurement of record.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQuery <queryName> <sfDir> [runs]")
    val (name, sfDir) = (args(0), args(1))
    val runs = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-timeq")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries(name)
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = q(spark, sfDir).count()
      println(f"[timeq] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
