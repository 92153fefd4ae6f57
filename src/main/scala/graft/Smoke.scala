package graft

import org.apache.spark.sql.SparkSession

/** t1-style smoke: run SparkEntry.entry the way the driver does and print
  * the row count + a sample. Usage: runMain graft.Smoke */
object Smoke {
  def main(args: Array[String]): Unit = {
    // same session shape + parallelism convention as every other main —
    // a hardcoded local[8] exercised a different partitioning than the
    // driver's verify/bench runs
    val spark = Bench.benchSession(sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(8, Runtime.getRuntime.availableProcessors).toString))
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[smoke] entry rows=${rows.length}")
    rows.take(5).foreach(r => println(s"[smoke] $r"))
    require(rows.nonEmpty, "entry returned 0 rows")
    spark.stop()
  }
}
