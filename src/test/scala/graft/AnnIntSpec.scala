package graft

import org.apache.spark.sql.functions._

import graft.operators.AnnIvfInt

/** Integer fixed-point IVF twin (AnnIvfInt): the distributed build must
  * equal a plain-Scala reference implementation BIT FOR BIT (quantize →
  * seeded init → Lloyd's rounds with floor-div means and empty-cluster
  * carry-over → argmax assignment), independent of input partitioning —
  * that exactness is what makes the ANN routing family DuckDB-replayable. */
class AnnIntSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64

  /** Reference build on collected arrays — the semantic gold standard. */
  private def refBuild(vecs: Seq[(Long, Array[Double])], nlist: Int,
      iters: Int): (Vector[Array[Long]], Map[Long, Int]) = {
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x * 1e6).toLong)
    }.sortBy(_._1)
    def assign(c: Vector[Array[Long]]): Map[Long, Int] =
      q.map { case (id, qv) =>
        val dots = c.map(cv => cv.zip(qv).map { case (a, b) => a * b }.sum)
        id -> dots.zipWithIndex.maxBy { case (d, i) => (d, -i) }._2
      }.toMap
    var centers: Vector[Array[Long]] = q.take(nlist).map(_._2.clone()).toVector
    for (_ <- 1 to iters) {
      val a = assign(centers)
      val byC = q.groupBy { case (id, _) => a(id) }
      centers = Vector.tabulate(centers.size) { c =>
        byC.get(c) match {
          case Some(members) =>
            val n = members.size.toLong
            Array.tabulate(Dim) { i =>
              Math.floorDiv(members.map(_._2(i)).sum, n)
            }
          case None => centers(c)
        }
      }
    }
    (centers, assign(centers))
  }

  private def collected(dir: String): Seq[(Long, Array[Double])] =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toSeq
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }

  test("build equals the scalar reference bit for bit (centers + assignment)") {
    val ix = AnnIvfInt.build(
      spark.read.parquet(s"$sf0001/embeddings.parquet"),
      "vec_id", "embedding", nlist = 8, iters = 3)
    val (refCenters, refAssign) = refBuild(collected(sf0001), 8, 3)
    val gotCenters = ix.centers.select($"cid", $"cvec")
      .as[(Int, Seq[Long])].collect().toMap
    assert(gotCenters.keySet === (0 until 8).toSet)
    for (c <- 0 until 8)
      assert(gotCenters(c) === refCenters(c).toSeq, s"center $c diverged")
    val gotAssign = ix.assigned.select($"vec_id", $"cid")
      .as[(Long, Int)].collect().toMap
    assert(gotAssign === refAssign)
  }

  test("build is invariant to input partitioning") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val a = AnnIvfInt.build(emb, "vec_id", "embedding", 8, 2)
    val b = AnnIvfInt.build(emb.repartition(7), "vec_id", "embedding", 8, 2)
    assert(a.centers.select($"cid", $"cvec").as[(Int, Seq[Long])].collect().toMap
      === b.centers.select($"cid", $"cvec").as[(Int, Seq[Long])].collect().toMap)
    assert(a.assigned.select($"vec_id", $"cid").as[(Long, Int)].collect().toMap
      === b.assigned.select($"vec_id", $"cid").as[(Long, Int)].collect().toMap)
  }

  test("search at nprobe = nlist equals integer brute force") {
    val ix = AnnIvfInt.build(
      spark.read.parquet(s"$sf0001/embeddings.parquet"),
      "vec_id", "embedding", nlist = 8, iters = 2)
    val viaIvf = AnnIvfInt.search(ix, "vec_id", $"vec_id" < 5, k = 10,
        nprobe = 8)
      .select($"query_id", $"vec_id", $"score_q", $"rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    val viaBf = AnnIvfInt.bruteForce(ix, "vec_id", $"vec_id" < 5, k = 10)
      .select($"query_id", $"vec_id", $"score_q", $"rank")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(viaIvf === viaBf)
  }

  test("quantize floors toward -inf; the floor-div form equals Math.floorDiv") {
    val got = spark.range(1)
      .select(AnnIvfInt.quantize(
        array(lit(-0.0000015f), lit(0.0000015f), lit(-1.0f), lit(0.5f)))
        .as("q"))
      .as[Seq[Long]].head()
    assert(got === Seq(-2L, 1L, -1000000L, 500000L))
    // the engine-portable floor-div written in recompute/oracle SQL
    val pairs = Seq((-7L, 2L), (7L, 2L), (-6L, 3L), (-1L, 5L), (1L, 5L))
    val viaSql = pairs.toDF("s", "n")
      .withColumn("d", expr("(s - ((s % n + n) % n)) div n"))
      .select($"s", $"n", $"d").as[(Long, Long, Long)].collect()
    viaSql.foreach { case (s, n, d) =>
      assert(d === Math.floorDiv(s, n), s"floorDiv($s, $n)")
    }
  }

  test("empty clusters keep their previous center") {
    // two far groups + nlist=3 seeded from the first three ids: the
    // duplicate seed centers collapse onto one winner and at least one
    // cid ends empty — its center must survive verbatim from the seed
    val rows = Seq(
      (0L, Array.fill(Dim)(1.0f), 0),
      (1L, Array.fill(Dim)(1.0f), 0),
      (2L, Array.fill(Dim)(1.0f), 0),
      (3L, Array.fill(Dim)(-1.0f), 0),
      (4L, Array.fill(Dim)(-1.0f), 0))
    val df = rows.toDF("vec_id", "embedding", "label")
      .withColumn("embedding", $"embedding".cast("array<float>"))
    val ix = AnnIvfInt.build(df, "vec_id", "embedding", nlist = 3, iters = 2)
    val centers = ix.centers.select($"cid", $"cvec")
      .as[(Int, Seq[Long])].collect().toMap
    // ids 0,1,2 are identical seeds: cid 0 wins every tie, cids 1-2 go
    // empty and keep the seed vector (quantized 1.0 → 1_000_000)
    assert(centers(1) === Seq.fill(Dim)(1000000L))
    assert(centers(2) === Seq.fill(Dim)(1000000L))
    val asg = ix.assigned.select($"vec_id", $"cid").as[(Long, Int)]
      .collect().toMap
    // round 1 collapses everything onto cid 0 (ties → lowest), dragging
    // its center to the +0.2 mean; round 2 then splits +1s back out onto
    // cid 1 (higher dot than the dragged cid 0) — and the cid-1-vs-cid-2
    // tie goes to the LOWER cid, so cid 2 stays empty throughout
    assert(asg.values.toSet === Set(0, 1))
    assert(asg(3L) === 0 && asg(4L) === 0 && asg(0L) === 1)
  }
}
