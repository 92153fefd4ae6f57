package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg (dev only; the driver passes two): comma-separated
    // query names — dump just those for a focused oracle diff
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    // THE shared session shape (Bench.benchSession — also Time/Explain):
    // a hand-copied builder here had already drifted once (this main
    // pinned UTC while the bench did not, so benchmarks timed timestamp
    // plans the oracle never verified on a non-UTC host)
    val spark = Bench.benchSession(cpus)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
        // coalesce(1): ONE part file so the query's orderBy survives the
        // parquet round-trip for the driver's row-ordered compare
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch {
          // NonFatal only: an OOM/StackOverflow must abort the run —
          // results produced by a heap-exhausted JVM would be compared
          // as if genuine. e.toString, not getMessage: message-less
          // exceptions logged "null" with no class name
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"[verify] $name failed: $e")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // a focused dev run dumps only its queries' oracles too, so the
    // checker can STRICTLY require an output for every oracle key (no
    // "partial run" heuristic that would also mask a half-crashed full run)
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
