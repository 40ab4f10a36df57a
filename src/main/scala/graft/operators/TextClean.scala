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

  /** Order-preserving reassembly of (id, pos, line) rows back into one
    * text per id: collect (pos, line) structs, array_sort (struct order
    * = pos order), project the line, join with `sep`. */
  private def reassemble(lines: DataFrame, idCol: String, sep: String): DataFrame =
    lines
      .groupBy(idCol)
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
            f => f.getField("__line")), sep).as("cleaned"),
        count(lit(1)).as("__kept"),
      )

  /** Cross-corpus boilerplate line removal (the C4-pipeline rule): drop
    * every line that occurs in more than `maxDocs` distinct documents —
    * nav bars, cookie banners, license footers repeat across a crawl;
    * prose doesn't. Returns `idCol`, `cleaned` (surviving lines joined
    * in original order; "" when everything was boilerplate), and
    * `n_dropped`. Blank lines count like any other line — trim first if
    * they should survive.
    *
    * Scale shape: one explode (map), one line-keyed count-distinct
    * aggregate, one anti join against the (small — only lines crossing
    * `maxDocs`) boilerplate set, one group-key reassembly. Nothing is
    * quadratic; the line-frequency shuffle is the cost, and it's the
    * irreducible one (frequency IS a corpus-global fact). */
  def dropBoilerplateLines(df: DataFrame, textCol: String, idCol: String,
                           maxDocs: Long, sep: String = "\n"): DataFrame = {
    require(maxDocs >= 1, s"maxDocs must be >= 1, got $maxDocs")
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as(Seq("__pos", "__line")))
    val boiler = lines
      .groupBy("__line")
      .agg(countDistinct(col(idCol)).as("__docs"))
      .filter(col("__docs") > maxDocs)
      .select("__line")
    val kept = lines.join(boiler, Seq("__line"), "leftanti")
    df.select(col(idCol), size(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .cast("long").as("__orig"))
      .join(reassemble(kept, idCol, sep), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cleaned"), lit("")).as("cleaned"),
        (col("__orig") - coalesce(col("__kept"), lit(0L))).as("n_dropped"))
  }

  /** Within-doc duplicate line removal: keep the FIRST occurrence of
    * each line, preserving order (repeated paragraphs from templated
    * generation or scrape glitches). Returns `idCol`, `cleaned`,
    * `n_dropped`. One explode + one (id, line)-keyed min-pos aggregate +
    * reassembly — all shuffles on the doc/group key. */
  def dedupLines(df: DataFrame, textCol: String, idCol: String,
                 sep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep))).as(Seq("__pos", "__line")))
    val first = lines
      .groupBy(col(idCol), col("__line"))
      .agg(min(col("__pos")).as("__pos"))
    df.select(col(idCol), size(split(col(textCol), java.util.regex.Pattern.quote(sep)))
        .cast("long").as("__orig"))
      .join(reassemble(first, idCol, sep), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("cleaned"), lit("")).as("cleaned"),
        (col("__orig") - coalesce(col("__kept"), lit(0L))).as("n_dropped"))
  }
}
