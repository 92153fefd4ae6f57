package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Parser for BioCLIP taxonomy tag strings of the grammar
  *
  * {{{
  * "a photo of [kingdom K] [phylum P] [class C] [order O] [family F]
  *  [genus G] [species S] [with common name N]."
  * }}}
  *
  * Behavior contract = the reference's 10 golden tests
  * (reference: tests/parse_utils_test.py:7-208, impl parse_utils.py:9-65):
  * every rank key is always present in the output map, missing/blank ranks
  * map to "", values keep internal whitespace (including the word "with"
  * inside a common name), the trailing "." is stripped, and `raw_tag`
  * always echoes the input verbatim. Non-matching input (e.g. "") yields
  * all-empty ranks.
  */
object TaxonomyParser {

  val Ranks: Seq[String] =
    Seq("kingdom", "phylum", "class", "order", "family", "genus", "species")

  /** All output keys, in reference order (Ranks + "common name"). */
  val Keys: Seq[String] = Ranks :+ "common name"

  // One optional reluctant group per rank; each group's end is pinned by the
  // literal that follows it (the next rank keyword / "with common name" /
  // the final "."), so multiword values parse without per-rank lookaheads.
  private val pattern: Pattern = {
    val rankPart = Ranks.map(r => s"(?:$r\\s(.*?)\\s*)?").mkString
    Pattern.compile(
      "^a photo of\\s*" + rankPart + "(?:with common name\\s(.*?)\\s*)?\\.?$",
      Pattern.DOTALL | Pattern.UNICODE_CASE)
  }

  /** Parse one tag into the 9-key map (8 ranks + raw_tag). */
  def parse(tag: String): Map[String, String] = {
    val raw = if (tag == null) "" else tag
    val m = pattern.matcher(raw)
    val values: Seq[String] =
      if (m.matches()) (1 to Keys.length).map { g =>
        val v = m.group(g)
        if (v == null) "" else v.trim
      }
      else Keys.map(_ => "")
    (Keys.zip(values) :+ ("raw_tag" -> raw)).toMap
  }

  /** Column form: `MapType(String, String)` output, one pass per row. */
  val parseUdf = udf((tag: String) => parse(tag))

  def parseTag(c: Column): Column = parseUdf(c)
}
