package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def pack(rows: Seq[(String, Long, Long)], cap: Long,
      repart: Int = 0) = {
    val df0 = rows.toDF("g", "id", "sz")
    val df = if (repart > 0) df0.repartition(repart) else df0
    Packing.nextFit(df, "g", "id", "sz", cap)
      .as[(String, Long, Long, Long)].collect()
      .map(t => (t._1, t._2) -> t._4).toMap
  }

  test("next-fit walks in id order and seals on overflow") {
    val rows = Seq(("a", 1L, 100L), ("a", 2L, 100L), ("a", 3L, 100L),
      ("a", 4L, 60L), ("a", 5L, 250L))
    // cap 256: [100+100]=200, +100 overflows -> seq1 [100+60]=160, 250 -> seq2
    val got = pack(rows, 256)
    assert(got === Map(("a", 1L) -> 0L, ("a", 2L) -> 0L, ("a", 3L) -> 1L,
      ("a", 4L) -> 1L, ("a", 5L) -> 2L))
  }

  test("multi-doc sequences never exceed capacity; oversized docs sit alone") {
    val rnd = new scala.util.Random(5)
    val rows = (1L to 300L).map(i =>
      (s"g${i % 3}", i, 20L + rnd.nextInt(300).toLong))
    val cap = 256L
    val byId = rows.map(r => (r._1, r._2) -> r._3).toMap
    val got = pack(rows, cap, repart = 7)
    got.groupBy { case ((g, _), bin) => (g, bin) }.foreach {
      case ((g, bin), members) =>
        val sizes = members.keys.map(byId).toSeq
        if (sizes.size > 1)
          assert(sizes.sum <= cap, s"group $g seq $bin overflows: $sizes")
        else assert(sizes.head <= cap || sizes.size == 1)
    }
    // every row assigned exactly once
    assert(got.keySet === rows.map(r => (r._1, r._2)).toSet)
  }

  test("null id/size and negative sizes are refused loudly, not packed wrong") {
    import graft.operators.Packing
    val nullSize = Seq((Some("g"), Some(1L), Option.empty[Long]))
      .toDF("g", "id", "sz")
    val e1 = intercept[Exception] {
      Packing.nextFit(nullSize, "g", "id", "sz", capacity = 10).collect()
    }
    val m1 = Iterator.iterate(e1: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(m1.contains("NULL sz"), m1)
    // a negative size would let a sealed sequence exceed capacity
    val neg = Seq(("g", 1L, 5L), ("g", 2L, -10L), ("g", 3L, 20L))
      .toDF("g", "id", "sz")
    val e2 = intercept[Exception] {
      Packing.nextFit(neg, "g", "id", "sz", capacity = 10).collect()
    }
    val m2 = Iterator.iterate(e2: Throwable)(_.getCause)
      .takeWhile(_ != null).flatMap(t => Option(t.getMessage)).mkString(" | ")
    assert(m2.contains("negative size"), m2)
  }

  test("groups pack independently; layout does not change the walk") {
    val rows = Seq(("x", 1L, 200L), ("y", 2L, 200L), ("x", 3L, 100L),
      ("y", 4L, 100L))
    val a = pack(rows, 256)
    assert(a(("x", 1L)) === 0L && a(("x", 3L)) === 1L)
    assert(a(("y", 2L)) === 0L && a(("y", 4L)) === 1L)
    assert(pack(rows.reverse, 256, repart = 5) === a)
  }

  test("groupKey is injective: nulls and delimiter-bearing values never merge") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      ("train", null.asInstanceOf[String]), ("train", ""),
      ("a|b", "c"), ("a", "b|c"), ("a", "bc"), ("ab", "c"),
      (null.asInstanceOf[String], "x"), ("", "x"))
    val keys = rows.toDF("s", "l")
      .select(graft.operators.Packing.groupKey(col("s"), col("l")))
      .as[String].collect()
    assert(keys.distinct.length === rows.length,
      s"collision among ${keys.mkString(", ")}")
  }
}
