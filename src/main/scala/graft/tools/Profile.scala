package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{SortedLongJaccard, TextOps}

/** Scratch stage-profiler for operator tuning (not part of the contract). */
object Profile {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    time("warmup count")(docs.count())

    val sh = docs
      .withColumn("__toks", TextOps.tokens(col("text")))
      .select(col("doc_id").as("id"),
        SortedLongJaccard.sortedHashedShingles(col("__toks"), 3).as("sh"))
    time("shingles")(sh.agg(sum(size(col("sh")))).collect())
    val sig = sh.withColumn("sig", TextOps.minhashUdf(32)(col("sh"))).persist()
    time("minhash (persist)")(sig.agg(sum(size(col("sig")))).collect())
    val bands = sig
      .withColumn("band", explode(TextOps.bandsUdf(8, 4)(col("sig"))))
      .select("band", "id")
    time("bands")(bands.count())
    val cands = bands.join(bands.withColumnRenamed("id", "rid"), Seq("band"))
      .filter(col("id") < col("rid"))
      .select(col("id").as("left_id"), col("rid").as("right_id"))
      .dropDuplicates("left_id", "right_id")
    println("[profile] n_cands=" + time("bucket join")(cands.count()))
    val verified = cands
      .join(sh.select(col("id").as("left_id"), col("sh").as("left_sh")), Seq("left_id"))
      .join(sh.select(col("id").as("right_id"), col("sh").as("right_sh")), Seq("right_id"))
      .withColumn("jaccard",
        round(SortedLongJaccard.sortedJaccard(col("left_sh"), col("right_sh")), 6))
      .filter(col("jaccard") >= 0.5)
    println("[profile] n_pairs=" + time("verify")(verified.count()))
    spark.stop()
  }
}
