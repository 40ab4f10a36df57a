package graft

import graft.operators.QualityRules
import graft.operators.QualityRules.Params

/** Gopher quality-rule bundle: each rule flips on its engineered
  * violation and only that one; keep is the conjunction. */
class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  private val p = Params(
    minWords = 3L, maxWords = 6L,
    minMeanWordLen = 2.0, maxMeanWordLen = 5.0,
    maxSymbolRatio = 0.2, minAlphaWordFraction = 0.5,
    minStopwords = 1L, stopwords = Seq("the", "a"))

  private def run(text: String) =
    QualityRules.gopher(Seq((1L, text)).toDF("doc_id", "text"), "text", p)
      .select("rule_word_count", "rule_mean_word_len", "rule_symbol_ratio",
        "rule_alpha_words", "rule_stopwords", "keep")
      .as[(Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)].head()

  test("a clean doc passes every rule") {
    assert(run("the cat sat on mats") === ((true, true, true, true, true, true)))
  }

  test("each rule fails independently on its violation") {
    // too few words
    assert(run("the cat") === ((false, true, true, true, true, false)))
    // too many words
    assert(run("the a cat sat on two red mats") ===
      ((false, true, true, true, true, false)))
    // mean word length too high (8+8+9-ish chars per word)
    assert(run("the wonderful excellent magnificent")._2 === false)
    // symbol ratio: 2 ellipses + '#' over 4 words = 0.75 > 0.2
    assert(run("the end... really... #done")._3 === false)
    // alpha fraction: 3 of 5 words are pure digits → 0.4 < 0.5
    assert(run("the 123 456 789 cat")._4 === false)
    // no stopwords at all
    assert(run("cats sit on soft mats") === ((true, true, true, true, false, false)))
  }

  test("diagnostics are exact rationals of the tokenization") {
    val d = QualityRules.gopher(
        Seq((1L, "the cat sat")).toDF("doc_id", "text"), "text", p)
      .select("n_words", "mean_word_len", "n_stopwords")
      .as[(Long, Double, Long)].head()
    // word lengths 3+3+3 = 9 over 3 words
    assert(d === ((3L, 3.0, 1L)))
  }

  test("irregular whitespace does not inflate n_words or skew the ratios") {
    // leading/trailing spaces, a double space and a tab: still 3 words
    val d = QualityRules.gopher(
        Seq((1L, "  the  cat\tsat ")).toDF("doc_id", "text"), "text", p)
      .select("n_words", "mean_word_len", "alpha_word_frac", "n_stopwords")
      .as[(Long, Double, Double, Long)].head()
    assert(d === ((3L, 3.0, 1.0, 1L)))
  }

  test("an all-whitespace doc yields zero words and null diagnostics, keep null-false") {
    val row = QualityRules.gopher(
        Seq((1L, "   ")).toDF("doc_id", "text"), "text", p)
      .selectExpr("n_words", "mean_word_len IS NULL", "keep IS NOT TRUE")
      .as[(Long, Boolean, Boolean)].head()
    assert(row === ((0L, true, true)))
  }

  test("unicode ellipsis counts like the ASCII form") {
    val d = QualityRules.gopher(
        Seq((1L, "a b… c... d")).toDF("doc_id", "text"), "text", p)
      .select("symbol_ratio").as[Double].head()
    assert(d === 0.5) // 2 symbols / 4 words
  }
}
