package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column combinators for the training-data pipeline
  * operators (SURVEY.md §2.C). All are builtin compositions (split,
  * replace, md5, transform) so they stay codegen'd — no UDFs.
  */
object TextFns {

  /** Whitespace tokens (literal single-space split, mirroring DuckDB
    * string_split semantics). */
  def words(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(words(text))

  /** BPE-ish subword token count: letter runs, digit runs, and single
    * punctuation marks each count as one token (the coarse shape of a
    * byte-pair tokenizer's pre-tokenization split, without lookahead so
    * the same pattern runs identically on Java regex and RE2). A better
    * estimate of LLM token cost than whitespace words — "don't!!" is 1
    * whitespace token but 4 BPE-ish tokens (don, ', t, !!→!,!). */
  val bpeTokenPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(bpeTokenPattern), lit(0))).cast("long")

  /** Sliding word n-gram shingles, e.g. n=3 → "w1 w2 w3" strings: the
    * native codegen'd WordShingles expression (one split + one linear
    * pass; a slice/zip_with composition runs its lambdas interpreted and
    * re-boxes every word n times). Short docs (< n words) yield an empty
    * array. */
  def shingles(text: Column, n: Int = 3): Column =
    graft.expressions.WordShingles.of(text, n)

  /** Number of non-overlapping occurrences of `marker` in `padded`
    * (left-to-right replace semantics, identical in both engines).
    * The divisor is the marker's CODE-POINT count — Spark `length()`
    * counts code points, so dividing by Java's UTF-16 `String.length`
    * would truncate to 0 for markers with astral-plane characters. */
  def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(replace(text, lit(marker), lit("")))) /
      lit(marker.codePointCount(0, marker.length))).cast("long")

  /** Content fingerprint: md5 of the text with spaces squeezed out
    * (rolling-hash analog; exact, normalization-insensitive). */
  def fingerprint(text: Column): Column = md5(replace(text, lit(" "), lit("")))

  /** Language-ID marker words per language (space-padded so they match
    * whole tokens). */
  val langMarkers: Seq[(String, String)] = Seq(
    "en" -> " the ",
    "es" -> " el ",
    "de" -> " der ",
    "fr" -> " le ",
    "zh" -> " de ",
  )

  /** Heuristic language ID: argmax of marker-occurrence scores with a
    * deterministic first-max tie-break. */
  def langId(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val scores = langMarkers.map { case (lang, m) => lang -> occurrences(padded, m) }
    val mx = greatest(scores.map(_._2): _*)
    scores.foldLeft(Option.empty[Column]) { case (acc, (lang, sc)) =>
      val cond = sc === mx
      Some(acc.fold(when(cond, lang))(_.when(cond, lang)))
    }.get.otherwise("und")
  }

  /** Vowel count: single-pass `translate` deletion (one scan of the text
    * vs a 5-deep replace chain — 5x fewer string allocations and a much
    * smaller codegen method; value-identical to the oracle's replace
    * chain). */
  def vowelCount(text: Column): Column = {
    val lowered = lower(text)
    (length(lowered) - length(translate(lowered, "aeiou", ""))).cast("long")
  }
}
