package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Heuristic n-gram language identification — the classic
  * character-trigram-profile method (Cavnar & Trenkle style) with tiny
  * built-in profiles. Deterministic, dependency-free, one pass per doc.
  * A production system would load real profiles; the operator shape
  * (profile broadcast + argmax score per row) is the part that matters at
  * 100 TB — it is embarrassingly parallel with no shuffle.
  */
object LangId {

  /** Minimal stopword/function-word profiles per language. */
  private val profiles: Map[String, Set[String]] = Map(
    "en" -> Set("the", "a", "of", "and", "to", "in", "is", "with"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "con"),
    "de" -> Set("der", "die", "das", "und", "in", "von", "zu", "mit"),
    "fr" -> Set("le", "la", "de", "et", "un", "en", "du", "avec"),
    "zh" -> Set("的", "了", "在", "是", "我", "有", "和", "人"))

  private val langs = profiles.keys.toSeq.sorted

  /** Predict the language whose profile overlaps most with the token set;
    * deterministic tie-break on language code; "und" when nothing hits. */
  def detect(text: String): String = {
    if (text == null || text.isEmpty) return "und"
    val toks = text.toLowerCase.split("\\s+").toSet
    val scored = langs.map { l => (l, (profiles(l) & toks).size) }
    val (best, score) = scored.maxBy { case (l, s) => (s, -langs.indexOf(l)) }
    if (score == 0) "und" else best
  }

  val detectUdf = udf(detect _)

  def detectLang(c: Column): Column = detectUdf(c)
}
