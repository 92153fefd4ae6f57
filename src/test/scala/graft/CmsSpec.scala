package graft

import org.apache.spark.sql.functions._

import graft.functions.{Cms, TextOps}

/** Count-Min sketch contract: overestimate-only point queries, exact
  * counts when the key space can't collide, and counter-exact merge
  * (per-group sketches summed ≡ one global sketch). */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  private val hUdf = udf((t: String) => TextOps.portableTokenHash64(t))

  private lazy val terms = spark.read
    .parquet(s"$sf0001/documents.parquet")
    .select($"doc_id", explode(split($"text", " ")).as("term"))

  test("estimates never undercount (CMS guarantee)") {
    val sk = terms.withColumn("h", hUdf($"term"))
      .agg(Cms.sketchAgg($"h").as("sk"))
    val got = terms.groupBy("term").agg(count(lit(1)).as("true_cnt"))
      .crossJoin(broadcast(sk))
      .withColumn("est", Cms.estimateCol($"sk", hUdf($"term")))
      .select("true_cnt", "est").as[(Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (t, e) => assert(e >= t) }
  }

  test("exact when distinct keys are far below the width") {
    val tiny = Seq.tabulate(40)(i => (i.toLong, s"k${i % 5}"))
      .toDF("id", "key")
    val sk = tiny.withColumn("h", hUdf($"key"))
      .agg(Cms.sketchAgg($"h").as("sk"))
    val got = tiny.groupBy("key").agg(count(lit(1)).as("t"))
      .crossJoin(broadcast(sk))
      .withColumn("e", Cms.estimateCol($"sk", hUdf($"key")))
      .select("t", "e").as[(Long, Long)].collect()
    // 5 distinct keys into 4×512 counters: a collision would need two of
    // the 5 to agree in ALL four rows — deterministic data, seeded hash,
    // verified exact
    got.foreach { case (t, e) => assert(e === t) }
  }

  test("merged per-group sketches are byte-equal to the global sketch") {
    val hashed = terms.withColumn("h", hUdf($"term"))
    val merged = hashed.groupBy($"doc_id" % 5)
      .agg(Cms.sketchAgg($"h").as("sk"))
      .agg(Cms.mergeAgg($"sk").as("sk"))
      .select("sk").as[Array[Byte]].head()
    val global = hashed.agg(Cms.sketchAgg($"h").as("sk"))
      .select("sk").as[Array[Byte]].head()
    assert(java.util.Arrays.equals(merged, global))
  }

  test("row-sum invariant: every row's counters sum to the item count") {
    val n = terms.count()
    val sk = Cms.deserialize(
      terms.withColumn("h", hUdf($"term"))
        .agg(Cms.sketchAgg($"h").as("sk"))
        .select("sk").as[Array[Byte]].head())
    (0 until Cms.D).foreach { r =>
      val rowSum = (0 until Cms.W).map(j => sk(r * Cms.W + j)).sum
      assert(rowSum === n)
    }
  }

  test("SQL surface: graft_cms_sketch/merge/estimate work from spark.sql") {
    Graft.register(spark)
    spark.read.parquet(s"$sf0001/documents.parquet")
      .select($"doc_id", explode(split($"text", " ")).as("term"))
      .createOrReplaceTempView("cms_terms")
    val got = spark.sql(
      """SELECT graft_cms_estimate(sk, h) FROM
           (SELECT graft_cms_merge(sk) AS sk FROM
             (SELECT graft_cms_sketch(xxhash64(term)) AS sk
              FROM cms_terms GROUP BY doc_id % 3)),
           (SELECT xxhash64('the') AS h)""").head().getLong(0)
    val want = spark.table("cms_terms").filter($"term" === "the").count()
    assert(got >= want) // CMS overestimate-only, same hash domain
  }

  test("malformed sketch input fails loudly on merge") {
    val bad = Seq(Array[Byte](1, 2, 3)).toDF("sk")
    val e = intercept[Exception] {
      bad.agg(Cms.mergeAgg($"sk")).collect()
    }
    val sw = new java.io.StringWriter
    e.printStackTrace(new java.io.PrintWriter(sw))
    assert(sw.toString.contains("cms_merge"))
  }
}
