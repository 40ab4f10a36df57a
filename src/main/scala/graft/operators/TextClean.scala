package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus cleaning — the stage BEFORE dedup/sampling in a training-data
  * pipeline: canonicalize text and redact PII. All pure map stages
  * (codegen'd regexp/expression work, no shuffle, fully pushdown-safe).
  */
object TextClean {

  /** Unicode-canonicalized text (NFC, lowercase, control strip, whitespace
    * collapse) — see [[graft.expressions.NormalizeText]]. Run this before
    * fingerprinting/shingling so byte-different encodings of the same text
    * dedup together. */
  def normalized(text: Column): Column = graft.expressions.NormalizeText.of(text)

  /** PII redaction patterns, applied in order. Kept deliberately
    * conservative and auditable (each pattern has one job):
    *  - emails → `<EMAIL>`
    *  - IPv4 addresses → `<IP>`
    *  - 13–19-digit runs (card-shaped, with optional space/dash groups) → `<CARD>`
    *  - phone-shaped +digit groups (7+ digits with separators) → `<PHONE>`
    * Order matters: cards/phones before bare-digit heuristics would go
    * here; emails first so user@host digits don't half-match. */
  private[operators] val piiPatterns: Seq[(String, String)] = Seq(
    ("""[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
    ("""\b(?:\d{1,3}\.){3}\d{1,3}\b""", "<IP>"),
    ("""\b\d(?:[ -]?\d){12,18}\b""", "<CARD>"),
    // NOTE: `-` sits LAST in the separator class so it's a literal dash,
    // not a range (a [ -.] range spans 0x20–0x2E and would accept , + * (
    // etc. as phone separators, eating '1,234,567'-style numbers)
    ("""(?<!\w)\+?\d{1,3}[ .-]\d{2,4}[ .-]\d{2,4}(?:[ .-]\d{2,4})?(?!\w)""", "<PHONE>"),
  )

  /** Redacted copy of `textCol` in a new `redacted` column, plus
    * `n_redactions` (the number of replacements actually performed: each
    * pattern's matches are counted on the text AS THAT STAGE SEES IT,
    * before its replacement — so pre-existing literal placeholder strings
    * in a document never inflate the count, and a match consumed by an
    * earlier stage is never re-counted). A chain of codegen'd
    * `regexp_replace`/`regexp_count`s — linear scans per pattern, no UDF,
    * no shuffle; at 100 TB this is embarrassingly parallel map work. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val (redacted, counts) = piiPatterns.foldLeft((col(textCol), Seq.empty[Column])) {
      case ((acc, cs), (pat, tag)) =>
        (regexp_replace(acc, pat, tag), cs :+ regexp_count(acc, lit(pat)))
    }
    df.withColumn("redacted", redacted)
      .withColumn("n_redactions", counts.reduce(_ + _).cast("long"))
  }
}
