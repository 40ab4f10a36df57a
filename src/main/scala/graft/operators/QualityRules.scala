package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style document quality rules (Rae et al. 2021,
  * arXiv:2112.11446 §A1.1) — the rule-based filtering pass between
  * cleaning and dedup in a training-data pipeline. Each rule is a named
  * boolean column so pipelines can FILTER on `keep` or AUDIT per-rule
  * failure rates per source (a source failing one rule at 40% is a
  * scraper bug, not forty percent bad prose).
  *
  * Every rule is integer/rational arithmetic over the whitespace
  * tokenization — deterministic and engine-reproducible (ratios compare
  * as IEEE doubles of exact integer operands, identical everywhere).
  * Line-shaped Gopher rules (bullet-line %, ellipsis-line %) live with
  * the line operators ([[TextClean.dropBoilerplateLines]] /
  * `dedupLines`); word-repetition rules are q45's repetition operator.
  *
  * Scale shape: a pure map stage — one codegen'd projection, no shuffle,
  * no UDF; at 100 TB this is embarrassingly parallel and pushdown-safe.
  */
object QualityRules {

  /** Rule thresholds; defaults follow the paper's reported bounds. */
  final case class Params(
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      minMeanWordLen: Double = 3.0,
      maxMeanWordLen: Double = 10.0,
      maxSymbolRatio: Double = 0.1,
      minAlphaWordFraction: Double = 0.8,
      minStopwords: Long = 2L,
      stopwords: Seq[String] = Seq("the", "be", "to", "of", "and", "that", "have", "with"))

  /** Adds per-rule booleans (`rule_*`), their diagnostics (`n_words`,
    * `mean_word_len`, `symbol_ratio`, `alpha_word_frac`, `n_stopwords`)
    * and the conjunction `keep`. */
  def gopher(df: DataFrame, textCol: String, p: Params = Params()): DataFrame = {
    require(p.minWords >= 1 && p.maxWords >= p.minWords, "bad word-count bounds")
    require(p.stopwords.nonEmpty, "stopword list must be non-empty")
    // True whitespace tokenization (Gopher's): split on runs of any
    // whitespace and drop empties, so consecutive/leading/trailing
    // spaces and tabs can't inflate n_words or skew the ratios.
    // Materialized ONCE as its own projection: five derived columns
    // reference the token array, and higher-order filter/split chains
    // are opaque to codegen subexpression elimination — inlining the
    // split into every rule re-tokenized each row ~7x (measured 4x
    // wall-clock on the full catalog bench at sf1).
    val base = df.withColumn("__ws",
      filter(split(col(textCol), "\\s+"), w => length(w) > 0))
    val ws = col("__ws")
    val nWords = size(ws).cast("long")
    // mean word length = total word code points / n words; the total IS
    // the non-whitespace character count (same \s class as the split),
    // which replaces a per-row aggregate() lambda with one scalar regex
    val meanLen = when(nWords > 0,
      length(regexp_replace(col(textCol), "\\s", "")).cast("double") / nWords)
    // '#' and ellipsis are the paper's symbol set
    val nSymbols = TextFnsSymbolCount(col(textCol))
    val symbolRatio = when(nWords > 0, nSymbols.cast("double") / nWords)
    val alphaFrac = when(nWords > 0,
      size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double") / nWords)
    val nStop = size(filter(ws, w => w.isInCollection(p.stopwords))).cast("long")

    val ruleWc = nWords >= p.minWords && nWords <= p.maxWords
    val ruleMwl = meanLen >= p.minMeanWordLen && meanLen <= p.maxMeanWordLen
    val ruleSym = symbolRatio <= p.maxSymbolRatio
    val ruleAlpha = alphaFrac >= p.minAlphaWordFraction
    val ruleStop = nStop >= p.minStopwords

    base.withColumn("n_words", nWords)
      .withColumn("mean_word_len", meanLen)
      .withColumn("symbol_ratio", symbolRatio)
      .withColumn("alpha_word_frac", alphaFrac)
      .withColumn("n_stopwords", nStop)
      .withColumn("rule_word_count", ruleWc)
      .withColumn("rule_mean_word_len", ruleMwl)
      .withColumn("rule_symbol_ratio", ruleSym)
      .withColumn("rule_alpha_words", ruleAlpha)
      .withColumn("rule_stopwords", ruleStop)
      .withColumn("keep", ruleWc && ruleMwl && ruleSym && ruleAlpha && ruleStop)
      .drop("__ws")
  }

  /** '#' plus ellipsis occurrences ('…' or '...'), counted left-to-right
    * non-overlapping — the Unicode ellipsis is one code point, the ASCII
    * form three, so a regexp alternation keeps both engines' counts
    * aligned. */
  private def TextFnsSymbolCount(text: Column): Column =
    regexp_count(text, lit("#|…|\\.\\.\\."))
}
