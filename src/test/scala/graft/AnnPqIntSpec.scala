package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnIvfInt, AnnPqInt}

/** Integer fixed-point PQ twin (AnnPqInt): the distributed per-subspace
  * build must equal a plain-Scala reference implementation BIT FOR BIT
  * (sub-slice → seeded init → Lloyd's rounds with argmin-L2 assignment,
  * floor-div means and empty-code carry-over → final encode), independent
  * of input partitioning — the same evidence shape that converted the IVF
  * family (AnnIntSpec). */
class AnnPqIntSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64
  private val M = 4
  private val Dsub = Dim / M
  private val Ksub = 8
  private val Iters = 2

  /** Reference build on collected arrays: per subspace, the full
    * quantize → Lloyd's → encode pipeline in straight-line Scala. */
  private def refBuild(vecs: Seq[(Long, Array[Double])])
      : (Map[(Int, Int), Array[Long]], Map[(Long, Int), Int]) = {
    val q = vecs.map { case (id, v) =>
      id -> v.map(x => math.floor(x * 1e6).toLong)
    }.sortBy(_._1)
    val codebook = scala.collection.mutable.Map.empty[(Int, Int), Array[Long]]
    val codes = scala.collection.mutable.Map.empty[(Long, Int), Int]
    for (sub <- 0 until M) {
      val sv = q.map { case (id, qv) =>
        id -> qv.slice(sub * Dsub, (sub + 1) * Dsub)
      }
      def assign(c: Vector[Array[Long]]): Map[Long, Int] =
        sv.map { case (id, x) =>
          val ds = c.map(cv => cv.zip(x).map { case (a, b) =>
            (a - b) * (a - b)
          }.sum)
          id -> ds.zipWithIndex.minBy { case (d, i) => (d, i) }._2
        }.toMap
      var centers: Vector[Array[Long]] = sv.take(Ksub).map(_._2.clone()).toVector
      for (_ <- 1 to Iters) {
        val a = assign(centers)
        val byC = sv.groupBy { case (id, _) => a(id) }
        centers = Vector.tabulate(centers.size) { c =>
          byC.get(c) match {
            case Some(members) =>
              val n = members.size.toLong
              Array.tabulate(Dsub) { i =>
                Math.floorDiv(members.map(_._2(i)).sum, n)
              }
            case None => centers(c)
          }
        }
      }
      val fin = assign(centers)
      for (c <- 0 until Ksub) codebook((sub, c)) = centers(c)
      for ((id, c) <- fin) codes((id, sub)) = c
    }
    (codebook.toMap, codes.toMap)
  }

  private def quantized(dir: String) =
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", AnnIvfInt.quantize($"embedding").as("__q"))

  test("build equals the scalar reference bit for bit (codebook + codes)") {
    val pq = AnnPqInt.build(quantized(sf0001), "vec_id", "__q",
      m = M, ksub = Ksub, iters = Iters, dim = Dim)
    val raw = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toSeq
      .map { case (id, v) => id -> v.map(_.toDouble).toArray }
    val (refCb, refCodes) = refBuild(raw)
    val gotCb = pq.codebook.select($"sub", $"code", $"cvec")
      .as[(Int, Int, Seq[Long])].collect()
      .map { case (s, c, v) => (s, c) -> v }.toMap
    assert(gotCb.keySet === refCb.keySet)
    for (((s, c), v) <- refCb)
      assert(gotCb((s, c)) === v.toSeq, s"codebook ($s, $c) diverged")
    val gotCodes = pq.encoded.select($"vec_id", $"sub", $"code")
      .as[(Long, Int, Int)].collect()
      .map { case (id, s, c) => (id, s) -> c }.toMap
    assert(gotCodes === refCodes)
  }

  test("build is invariant to input partitioning") {
    val qdf = quantized(sf0001)
    val a = AnnPqInt.build(qdf, "vec_id", "__q", M, Ksub, Iters, Dim)
    val b = AnnPqInt.build(qdf.repartition(7), "vec_id", "__q",
      M, Ksub, Iters, Dim)
    assert(a.codebook.select($"sub", $"code", $"cvec")
      .as[(Int, Int, Seq[Long])].collect().toSet ===
      b.codebook.select($"sub", $"code", $"cvec")
        .as[(Int, Int, Seq[Long])].collect().toSet)
    assert(a.encoded.select($"vec_id", $"sub", $"code")
      .as[(Long, Int, Int)].collect().toSet ===
      b.encoded.select($"vec_id", $"sub", $"code")
        .as[(Long, Int, Int)].collect().toSet)
  }

  test("ADC equals the LUT recomputed by hand for one query") {
    val qdf = quantized(sf0001)
    val pq = AnnPqInt.build(qdf, "vec_id", "__q", M, Ksub, Iters, Dim)
    val queries = qdf.filter($"vec_id" === 0)
      .select($"vec_id".as("query_id"), $"__q".as("__qq"))
    val got = AnnPqInt.adcScores(pq, queries, "vec_id")
      .select($"vec_id", $"adc").as[(Long, Long)].collect().toMap
    // hand recompute: Σ_sub dot(query sub-slice, center of the corpus
    // vector's code in that subspace)
    val qv = qdf.filter($"vec_id" === 0).select($"__q")
      .as[Seq[Long]].head().toArray
    val cb = pq.codebook.select($"sub", $"code", $"cvec")
      .as[(Int, Int, Seq[Long])].collect()
      .map { case (s, c, v) => (s, c) -> v.toArray }.toMap
    val codes = pq.encoded.select($"vec_id", $"sub", $"code")
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    for ((id, adc) <- got.take(50)) {
      val want = (0 until M).map { s =>
        val cv = cb((s, codes(id)(s)))
        val qs = qv.slice(s * Dsub, (s + 1) * Dsub)
        cv.zip(qs).map { case (a, b) => a * b }.sum
      }.sum
      assert(adc === want, s"ADC mismatch for corpus id $id")
    }
  }

  test("degenerate shapes: iters=0 keeps seed sub-slices; ksub > corpus") {
    val rows = (0L until 5L).map(i =>
      (i, Array.fill(8)(if (i % 2 == 0) 1.0f else -1.0f)))
    val df = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", $"embedding".cast("array<float>"))
      .select($"vec_id", AnnIvfInt.quantize($"embedding").as("__q"))
    val pq0 = AnnPqInt.build(df, "vec_id", "__q", m = 2, ksub = 2,
      iters = 0, dim = 8)
    val cb0 = pq0.codebook.orderBy($"sub", $"code")
      .select($"sub", $"code", $"cvec").as[(Int, Int, Seq[Long])].collect()
    assert(cb0.length === 4) // 2 subs × 2 codes
    assert(cb0.forall { case (_, c, v) =>
      v === Seq.fill(4)(if (c == 0) 1000000L else -1000000L)
    })
    val pqBig = AnnPqInt.build(df, "vec_id", "__q", m = 2, ksub = 9,
      iters = 1, dim = 8)
    assert(pqBig.codebook.count() === 10) // 2 subs × 5 available seeds
    assert(pqBig.encoded.count() === 10) // 5 vectors × 2 subs
    // ADC lookup must stay correct when cEff (5) < declared ksub (9):
    // the LUT array position is rank-based, not ksub-strided
    val queries = df.filter($"vec_id" === 0)
      .select($"vec_id".as("query_id"), $"__q".as("__qq"))
    val got = AnnPqInt.adcScores(pqBig, queries, "vec_id")
      .select($"vec_id", $"adc").as[(Long, Long)].collect().toMap
    val qv = df.filter($"vec_id" === 0).select($"__q").as[Seq[Long]]
      .head().toArray
    val cb = pqBig.codebook.select($"sub", $"code", $"cvec")
      .as[(Int, Int, Seq[Long])].collect()
      .map { case (s, c, v) => (s, c) -> v.toArray }.toMap
    val codes2 = pqBig.encoded.select($"vec_id", $"sub", $"code")
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    for ((id, adc) <- got) {
      val want = (0 until 2).map { s =>
        cb((s, codes2(id)(s))).zip(qv.slice(s * 4, (s + 1) * 4))
          .map { case (a, b) => a * b }.sum
      }.sum
      assert(adc === want, s"degenerate ADC mismatch for corpus id $id")
    }
  }
}
