package graft

import org.apache.spark.sql.functions._

import graft.functions.{LangId, TextOps}
import graft.operators.{Ingest, Multimodal}

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount / stopwordRatio / avgTokenLength") {
    val got = Seq("the cat sat on a mat").toDF("text")
      .select(
        TextOps.tokenCount($"text"),
        TextOps.stopwordRatio($"text", Seq("the", "a")),
        TextOps.avgTokenLength($"text"))
      .as[(Int, Double, Double)].head()
    assert(got._1 === 6)
    assert(got._2 === 2.0 / 6.0)
    assert(got._3 === (20 - 5).toDouble / 6.0)
  }

  test("shinglesFromTokens: n-grams, distinct, short-doc fallback") {
    val got = Seq("a b c d", "a b c a b c", "xy").toDF("text")
      .withColumn("toks", TextOps.tokens($"text"))
      .select(TextOps.shinglesFromTokens($"toks", 3))
      .as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq("a b c", "b c a", "c a b")) // distinct
    assert(got(2) === Seq("xy")) // shorter than n → whole text
  }

  test("fingerprint is case/whitespace-normalization invariant") {
    val got = Seq("Hello  World ", "hello world").toDF("text")
      .select(TextOps.fingerprint($"text")).as[String].collect()
    assert(got(0) === got(1))
  }

  test("punctRatio counts non-alphanumeric chars") {
    val r = Seq("ab, cd!").toDF("text")
      .select(TextOps.punctRatio($"text")).as[Double].head()
    assert(r === 2.0 / 7.0)
  }

  test("scrubPii: URL-first ordering, existing placeholders untouched") {
    val got = Seq(
        (1L, "mail me at a.b@x.io or see https://x.io/u@v now"),
        (2L, "no pii here"),
        (3L, "already <EMAIL> plus b@c.de"))
      .toDF("id", "t")
      .select($"id", TextOps.scrubPii($"t"))
      .as[(Long, String)].collect().toMap
    // the URL containing '@' is consumed whole by the URL pass — the
    // email pass must not half-eat its userinfo
    assert(got(1L) === "mail me at <EMAIL> or see <URL> now")
    assert(got(2L) === "no pii here")
    assert(got(3L) === "already <EMAIL> plus <EMAIL>")
  }

  test("winnow fingerprints: deterministic, shared windows overlap") {
    val f = TextOps.winnowUdf(4, 3)
    val got = Seq(
      ("abcdefghijklmnop", "abcdefghijklmnop"),
      ("abcdefghijklmnop", "abcdefghijklmnoq"))
      .toDF("a", "b")
      .select(f($"a"), f($"b")).as[(Seq[Long], Seq[Long])].collect()
    assert(got(0)._1 === got(0)._2) // identical text → identical sketch
    assert(got(1)._1.toSet.intersect(got(1)._2.toSet).nonEmpty) // shared prefix
  }

  test("portableTokenHash64: Column expression and Scala twin agree bit-for-bit") {
    val toks = Seq("", "a", "the", "supplier", "antique-misty-chocolate",
      "x" * 100, "MiXeD", "123", "a b")
    val viaCol = toks.toDF("tok")
      .select(TextOps.portableTokenHash64(col("tok"))).as[Long].collect()
    val viaScala = toks.map(TextOps.portableTokenHash64)
    assert(viaCol.toSeq === viaScala)
    viaScala.foreach(h => assert(h >= 0L)) // bit 63 always clear
  }

  test("portableHashedShinglesUdf matches shinglesFromTokens + portable hash") {
    val docs = Seq("a b c d e", "x y", "one one one one").toDF("text")
      .withColumn("toks", TextOps.tokens(col("text")))
    val viaUdf = docs.select(TextOps.portableHashedShinglesUdf(3)(col("toks")))
      .as[Seq[Long]].collect()
    val viaCols = docs.select(TextOps.shinglesFromTokens(col("toks"), 3))
      .as[Seq[String]].collect()
      .map(_.map(TextOps.portableTokenHash64).distinct.sorted.toSeq)
    assert(viaUdf.map(_.toSeq).toSeq === viaCols.toSeq)
  }

  test("langid picks the profile with most stopword hits") {
    assert(LangId.detect("the cat and the dog in a house") === "en")
    assert(LangId.detect("el gato y la casa de un perro") === "es")
    assert(LangId.detect("zzz qqq vvv") === "und")
    assert(LangId.detect("") === "und")
  }

  test("multimodal decode: real PNG headers yield closed-form dims") {
    val docs = Seq(1L, 35L, 64L).toDF("doc_id")
    val got = Multimodal.decodeMeta(Multimodal.withPngPayload(docs, "doc_id"))
      .collect().sortBy(_.media_id)
    // withPngPayload dims are pure functions of the id:
    //   w = 16 + id % 32, h = 16 + (id / 32) % 32
    got.foreach { m =>
      assert(m.format === "png")
      assert(m.width === 16 + (m.media_id % 32).toInt)
      assert(m.height === 16 + ((m.media_id / 32) % 32).toInt)
      assert(m.n_bytes > 0)
    }
  }

  test("multimodal decode: non-image payloads map to unknown/0x0, not failure") {
    val docs = Seq((1L, "hello"), (2L, "hello"), (3L, "other")).toDF("doc_id", "text")
    val got = Multimodal.decodeMeta(
      Multimodal.withBinaryPayload(docs, "doc_id", "text"))
      .collect().sortBy(_.media_id)
    assert(got(0).n_bytes === 5)
    assert(got(0).copy(media_id = 2L) === got(1)) // same payload → same meta
    assert(got(0).format === "unknown")
    assert(got(0).width === 0 && got(0).height === 0)
  }

  test("empty first batch never poisons a new layout (footerless dir)") {
    // a zero-row partitioned write emits no parquet files; on a fresh
    // path that used to leave a dir readable by exists() but fatal to
    // spark.read.parquet (UNABLE_TO_INFER_SCHEMA) — killing the stream
    // from the second batch on
    val dir = java.nio.file.Files.createTempDirectory("ingest-empty").toString
    val p = s"$dir/layout"
    val empty = Seq.empty[(Long, Int, String)].toDF("id", "pid", "v")
    val sess = new Ingest.BloomIngestSession(spark, p, "id", "pid", 1000L)
    assert(sess.append(empty) === 0L)
    assert(sess.append(Seq((1L, 0, "a")).toDF("id", "pid", "v")) === 1L)
    assert(spark.read.parquet(p).count() === 1L)
    // same contract for the batch API
    val p2 = s"$dir/layout2"
    Ingest.appendNew(spark, empty, p2, "id", "pid")
    Ingest.appendNew(spark, Seq((2L, 0, "b")).toDF("id", "pid", "v"),
      p2, "id", "pid")
    assert(spark.read.parquet(p2).count() === 1L)
  }

  test("upsertLatest preserves a pre-existing user column named __rn") {
    val base = Seq((1L, 10L, "old", 7)).toDF("k", "ver", "v", "__rn")
    val upd = Seq((1L, 20L, "new", 9)).toDF("k", "ver", "v", "__rn")
    val got = Ingest.upsertLatest(base, upd, Seq("k"), "ver")
      .select("k", "ver", "v", "__rn").as[(Long, Long, String, Int)].collect()
    assert(got.toSeq === Seq((1L, 20L, "new", 9)))
  }

  test("idempotent ingest: anti-join keeps only new ids; append dedups") {
    val existing = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    val incoming = Seq((2L, "y2"), (3L, "z")).toDF("id", "v")
    val got = Ingest.newRecords(incoming, existing, "id").as[(Long, String)].collect()
    assert(got.toSeq === Seq((3L, "z")))
  }

  test("null text: chunkStride keeps the doc as one empty chunk; " +
      "hash UDFs score the empty doc instead of NPEing") {
    // a null doc must BEHAVE AS an empty doc, never vanish (ANSI
    // size(null) is null → posexplode drops the row) and never kill a
    // corpus pass through an unguarded Seq in a udf
    val docs = Seq((1L, Some("a b c d")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val chunks = TextOps.chunkStride(docs, "doc_id", "text", win = 2, stride = 2)
      .select("doc_id", "chunk_no").as[(Long, Int)].collect().toSet
    assert(chunks === Set((1L, 0), (1L, 1), (2L, 0)))
    val hashed = docs.select(
        TextOps.simhashUdf(transform(TextOps.tokens(col("text")),
          t => TextOps.portableTokenHash64(t))).as("sh"),
        TextOps.minhashUdf(4)(transform(TextOps.tokens(col("text")),
          t => TextOps.portableTokenHash64(t))).as("mh"))
    assert(hashed.count() === 2) // no NPE on the null row
  }

  test("partition ordinals are dense per partition") {
    val df = Seq((0, 10L), (0, 12L), (1, 11L), (0, 11L)).toDF("pid", "id")
    val got = Ingest.withPartitionOrdinals(df, "pid", "id")
      .select("pid", "id", "ordinal").as[(Int, Long, Int)].collect().toSet
    assert(got === Set((0, 10L, 0), (0, 11L, 1), (0, 12L, 2), (1, 11L, 0)))
  }
}
