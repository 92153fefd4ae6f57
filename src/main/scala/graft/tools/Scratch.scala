package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Throwaway perf/debug scratch — NOT part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val kryo = sys.env.getOrElse("SCRATCH_KRYO", "0") == "1"
    val b = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.autoBroadcastJoinThreshold", "67108864")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val spark = (if (kryo)
      b.config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    else b).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.warmTables(spark, sfDir)
    println(s"[scratch] kryo=$kryo")
    for (name <- Seq("graph_bfs", "graph_kcore", "graph_pagerank", "graph_hits")) {
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).count() // warm
      val samples = Vector.fill(5) {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[scratch] $name%-20s median=${samples(2)}%7.3f all=${samples.map(s => f"$s%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
