package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.AnnIvf

/** Index maintenance: hot-cell splitting under the add-after-train
  * regime. The invariants that matter: the corpus is untouched (same
  * ids, same count), cold cells keep their ids, balance improves, and
  * exhaustive search (nprobe = nlist) is EXACTLY unchanged — splitting
  * relabels cells, it must never change what a full probe can see. */
class AnnMaintainSpec extends SparkSpec {
  import spark.implicits._

  private def mk(center: Array[Double], n: Int, base: Long, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val v = center.map(c => c + rnd.nextGaussian() * 0.05)
      val norm = math.sqrt(v.map(x => x * x).sum)
      (base + i, v.map(x => (x / norm).toFloat).toSeq)
    }
  }

  private def toVecDf(rows: Seq[(Long, Seq[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))

  /** Three balanced, well-separated direction clusters in dim 4. */
  private lazy val corpus: DataFrame = toVecDf(
    mk(Array(1, 0, 0, 0), 40, 0L, 7) ++
      mk(Array(0, 1, 0, 0), 40, 1000L, 8) ++
      mk(Array(0, 0, 1, 0), 40, 2000L, 9))

  /** The add-after-train drift scenario: build on the balanced corpus,
    * then append 300 more cluster-0 rows assigned against the FROZEN
    * centroids (what streaming ingest does) — one cell goes hot. */
  private lazy val drifted: (AnnIvf.Index, DataFrame) = {
    val idx0 = AnnIvf.build(corpus, "vec_id", "embedding", nlist = 3,
      seed = 11L, trainSize = 120)
    val centers = idx0.centroids.orderBy("partition_id")
      .as[(Int, Seq[Float])].collect().map(_._2.toArray)
    val extra = toVecDf(mk(Array(1, 0, 0, 0), 300, 5000L, 13))
    val full = corpus.unionByName(extra)
    val assignedExtra = AnnIvf.assignPartitions(extra, "embedding", centers)
      .select(idx0.assigned.columns.map(col): _*)
    (AnnIvf.Index(idx0.assigned.unionByName(assignedExtra), idx0.centroids),
      full)
  }

  private def cellSizes(ix: AnnIvf.Index): Map[Int, Long] =
    ix.assigned.groupBy("partition_id").count()
      .as[(Int, Long)].collect().toMap

  private def searchSet(ix: AnnIvf.Index, full: DataFrame,
      nprobe: Int): Set[(Long, Long, Double)] = {
    val q = full.filter(col("vec_id") % 97 === 0)
      .select(col("vec_id").as("qid"), col("embedding"))
    AnnIvf.search(ix, q, "qid", "embedding", k = 5, nprobe = nprobe)
      .select(col("query_id").cast("long"), col("vec_id").cast("long"), col("score"))
      .as[(Long, Long, Double)].collect().toSet
  }

  test("splitHotCells rebalances the drifted hot cell and preserves exact search") {
    val (idx, full) = drifted
    val before = cellSizes(idx)
    assert(before.values.max > 200, s"drift setup failed: $before")
    val split = AnnIvf.splitHotCells(idx, "vec_id", "embedding", maxCellRows = 200)
    assert(split.centroids.count() === 4)
    assert(split.assigned.count() === full.count())
    assert(split.assigned.select("vec_id").distinct().count() === full.count())
    val after = cellSizes(split)
    assert(after.values.max < before.values.max,
      s"hot cell did not shrink: before=$before after=$after")
    // cold cells keep their ids and sizes
    val hotId = before.maxBy(_._2)._1
    before.filter(_._1 != hotId).foreach { case (pid, n) =>
      assert(after(pid) === n, s"cold cell $pid changed size")
    }
    // exhaustive probe sees the identical result set before and after
    assert(searchSet(split, full, nprobe = 4) === searchSet(idx, full, nprobe = 3))
  }

  test("no cell above the cap returns the index unchanged") {
    val (idx, _) = drifted
    assert(AnnIvf.splitHotCells(idx, "vec_id", "embedding",
      maxCellRows = 100000) eq idx)
  }

  test("split of a durable fp16+salted index round-trips through write/read") {
    val (idx, full) = drifted
    val dir = java.nio.file.Files.createTempDirectory("splitdurable").toString
    AnnIvf.write(idx, dir, writeSalt = 4, fp16 = true)
    val durable = AnnIvf.read(spark, dir)
    val split = AnnIvf.splitHotCells(durable, "vec_id", "embedding", maxCellRows = 200)
    assert(split.writeSalt === 4)
    // the stored __salt column and fp16 decode survive the reassignment
    assert(split.assigned.columns.contains("__salt"))
    val out = java.nio.file.Files.createTempDirectory("splitout").toString
    AnnIvf.write(split, out, writeSalt = 4, fp16 = true)
    val reread = AnnIvf.read(spark, out)
    assert(reread.centroids.count() === 4)
    assert(reread.assigned.count() === full.count())
    // exhaustive search on the re-read split index equals the original
    // durable index (both fp16-quantized, so scores are comparable)
    assert(searchSet(reread, full, nprobe = 4) === searchSet(durable, full, nprobe = 3))
  }

  test("splitting is deterministic for a fixed seed") {
    val (idx, _) = drifted
    def centroidsOf(ix: AnnIvf.Index): Seq[(Int, Seq[Float])] =
      ix.centroids.orderBy("partition_id")
        .as[(Int, Seq[Float])].collect().toSeq
    val a = centroidsOf(AnnIvf.splitHotCells(idx, "vec_id", "embedding", 200, seed = 5L))
    val b = centroidsOf(AnnIvf.splitHotCells(idx, "vec_id", "embedding", 200, seed = 5L))
    assert(a === b)
  }
}
