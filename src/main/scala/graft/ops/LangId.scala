package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Heuristic language identification: score each candidate language by
  * stopword hits (token-set overlap with a per-language profile) plus a
  * character-class signal for CJK, take the argmax. Deterministic, pure
  * Column composition (codegen'd) — the shape of a real n-gram profile
  * classifier with the profiles inlined as literals.
  */
object LangId {

  /** Tiny but discriminative stopword profiles (public common-word lists). */
  val profiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "de" -> Seq("der", "die", "und", "das", "von", "zu", "mit", "den", "ist", "nicht"),
    "fr" -> Seq("le", "la", "les", "des", "est", "dans", "que", "une", "pour", "qui"),
    "zh" -> Seq() // scored by CJK character ratio instead
  )

  /** Per-language score columns over a token array. */
  private def score(toks: Column, lang: String, rawText: Column): Column = lang match {
    case "zh" =>
      // fraction of CJK chars (U+4E00–U+9FFF)
      val cjk = length(regexp_replace(rawText, "[^\\x{4e00}-\\x{9fff}]", ""))
      cjk.cast("double") / greatest(length(rawText), lit(1)).cast("double")
    case _ =>
      val profile = array(profiles(lang).map(lit): _*)
      size(array_intersect(array_distinct(toks), profile)).cast("double") /
        greatest(size(array_distinct(toks)), lit(1)).cast("double")
  }

  /** (predicted_lang, confidence) struct for a text column. */
  def detect(text: Column): Column = {
    val toks = transform(TextOps.tokens(lower(text)), t => regexp_replace(t, "[^\\p{L}]", ""))
    val scored = array(profiles.keys.toSeq.sorted.map { lang =>
      struct(score(toks, lang, text).as("score"), lit(lang).as("lang"))
    }: _*)
    // argmax by (score, lang) — deterministic tie-break on language code
    val best = array_max(scored)
    struct(best.getField("lang").as("lang"), round(best.getField("score"), 4).as("confidence"))
  }
}
