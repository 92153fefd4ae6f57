package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Throwaway perf/debug scratch — NOT part of the driver contract. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.Bench.benchSession("32")
    val tally = new SparkListener {
      @volatile var cpuNs = 0L
      @volatile var runMs = 0L
      @volatile var tasks = 0
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        Option(e.stageInfo.taskMetrics).foreach { m =>
          cpuNs += m.executorCpuTime; runMs += m.executorRunTime
          tasks += e.stageInfo.numTasks
        }
    }
    spark.sparkContext.addSparkListener(tally)
    def drain(): Unit = {
      val sc = spark.sparkContext
      val lb = sc.getClass.getMethod("listenerBus").invoke(sc)
      lb.getClass.getMethod("waitUntilEmpty").invoke(lb)
    }
    def probe(name: String)(f: => Unit): Unit = {
      f // warm
      drain()
      val c0 = tally.cpuNs; val r0 = tally.runMs; val t0 = tally.tasks
      val w0 = System.nanoTime()
      f
      val wall = (System.nanoTime() - w0) / 1e9
      drain()
      val cpu = (tally.cpuNs - c0) / 1e9
      val run = (tally.runMs - r0) / 1e3
      val nt = tally.tasks - t0
      println(f"[scratch] $name%-34s wall=$wall%6.3f cpu=$cpu%7.3f run=$run%7.3f tasks=$nt cpu/task=${cpu / math.max(1, nt) * 1000}%7.1f ms")
    }
    // fixed per-task overhead probes: same trivial work, different widths
    probe("range-sum 1 part")(
      spark.range(0, 1000000L, 1, 1).selectExpr("sum(id)").collect())
    probe("range-sum 32 parts")(
      spark.range(0, 1000000L, 1, 32).selectExpr("sum(id)").collect())
    probe("range-sum 256 parts")(
      spark.range(0, 1000000L, 1, 256).selectExpr("sum(id)").collect())
    // alloc-heavy per-row work (string build + split), serial vs wide
    import org.apache.spark.sql.functions._
    def allocWork(parts: Int) = {
      val df = spark.range(0, 200000L, 1, parts)
        .select(col("id"), concat_ws(" ",
          (0 until 20).map(i => conv(col("id") * i, 10, 16)): _*).as("s"))
        .select(explode(split(col("s"), " ")).as("t"))
        .groupBy("t").agg(count(lit(1)))
      df.write.format("noop").mode("overwrite").save()
    }
    probe("alloc-work 1 part")(allocWork(1))
    probe("alloc-work 8 parts")(allocWork(8))
    probe("alloc-work 32 parts")(allocWork(32))
    spark.stop()
  }
}
