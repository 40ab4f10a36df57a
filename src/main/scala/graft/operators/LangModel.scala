package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring (SURVEY.md §2.C) — the rung above
  * surface heuristics (q35) on the quality ladder: score each document by
  * its average log-probability under a word-bigram model trained on a
  * reference corpus, the CCNet/KenLM filtering recipe (Wenzek et al. 2020,
  * arXiv:1911.00359) re-expressed relationally. Low `avg_lp` = text the
  * reference corpus finds surprising (spam, keyboard mash, wrong
  * language); filtering thresholds are set per corpus on the score
  * distribution.
  *
  * Model = plain count tables, not a binary artifact: `P(w | w_prev) =
  * (c(w_prev, w) + 1) / (ctx(w_prev) + V)` with add-one smoothing over
  * the training vocabulary V — every quantity an exact integer count, so
  * scores are engine-reproducible (the one float op, ln, happens on
  * identical double inputs everywhere). The denominator ctx(w_prev) =
  * Σ_w c(w_prev, w) is w_prev's BIGRAM-CONTEXT count (how often it opens
  * a bigram), NOT its total unigram count — the unigram total includes
  * document-final occurrences that never open a bigram, which would make
  * P(·|w_prev) sum to under 1 over the vocabulary. With the context
  * count the conditional normalizes exactly: Σ_w P(w|w_prev) =
  * (ctx + V)/(ctx + V) = 1 (LangModelSpec pins this at vocab scale).
  * The context table is one tiny aggregate over the bigram counts.
  *
  * Scale shape: training is two corpus-sized groupBy counts (map-side
  * combining; bigram table ≈ corpus token count in the worst case, keyed
  * shuffle). Scoring builds each doc's bigram list with a zero-shuffle
  * array zip (no self-join, no window), then joins model counts on the
  * bigram/unigram key — both model tables are Heaps'-law unbounded, so
  * they are deliberately NOT broadcast; AQE may still choose to when a
  * small model fits. One final groupBy(doc) folds the per-term decimal sums.
  */
object LangModel {

  /** Trained model: `unigrams` (w, c), `bigrams` (w_prev, w, c), `vocab`
    * = distinct-word count (the smoothing denominator offset). */
  final case class Model(unigrams: DataFrame, bigrams: DataFrame, vocab: Long)

  /** Count tables from a whitespace-tokenized training corpus. The one
    * driver-side value is `vocab` (a scalar count — unavoidable and
    * cheap); the count tables stay distributed. */
  def train(corpus: DataFrame, textCol: String): Model = {
    // localCheckpoint on `bigrams`: it is read twice per scoring pass
    // (bigram join + context aggregate) and without a barrier each
    // reference re-tokenizes the training corpus (Spark does not CSE
    // duplicated subtrees — the q80 similarityJoin lesson). `unigrams`
    // is read exactly once (the vocab scalar) — no barrier can help it.
    // localCheckpoint, not persist: persist would alias identical plans
    // through the CacheManager ACROSS train() calls — a same-session
    // re-train would silently reuse (possibly stale) cached counts and
    // a benchmark rerun would measure cache hits, not the model build —
    // and it needs an unpersist lifecycle no lazy caller owns. The
    // trade: lineage truncation means a lost executor breaks a
    // long-lived Model; a deployment holding Models across sessions
    // should instead checkpoint to reliable storage (or persist and own
    // the unpersist), which is a deployment policy, not this builder's.
    val words = corpus.select(posexplode(split(col(textCol), " ")).as(Seq("__p", "w")))
    val unigrams = words.groupBy("w").agg(count(lit(1)).as("c"))
    val bigrams = corpus
      .select(explode(bigramArray(textCol)).as("bg"))
      .select(col("bg.w_prev").as("w_prev"), col("bg.w").as("w"))
      .groupBy("w_prev", "w").agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    Model(unigrams, bigrams, unigrams.count())
  }

  /** (w_prev, w) struct array of a doc's adjacent word pairs — built by
    * zipping the split array with its own tail: a pure map stage, where a
    * (pos, pos+1) self-join or a lag window would shuffle every token. */
  private def bigramArray(textCol: String) = {
    val ws = split(col(textCol), " ")
    filter(
      zip_with(ws, slice(ws, lit(2), greatest(size(ws) - 1, lit(0))),
        (a, b) => struct(a.as("w_prev"), b.as("w"))),
      s => s.getField("w").isNotNull)
  }

  /** Per-doc average bigram log-probability under `m`: (`idCol`,
    * `n_terms`, `avg_lp`). Docs with fewer than two words score NULL
    * (`n_terms` 0). Unseen bigrams/prevs fall back to the smoothed floor
    * (count 0). Per-term logs are rounded to DECIMAL(38,6) before the
    * order-insensitive decimal sum — the q72 recipe: ln's ≤1-ulp
    * cross-engine wobble dies at the cast, the sum is then exact. */
  def score(docs: DataFrame, textCol: String, idCol: String, m: Model): DataFrame = {
    val terms = docs
      .select(col(idCol).as("__id"), explode(bigramArray(textCol)).as("bg"))
      .select(col("__id"), col("bg.w_prev").as("w_prev"), col("bg.w").as("w"))
    // bigram-context counts: ctx(w_prev) = Σ_w c(w_prev, w) — derived
    // from the bigram table (one vocab-sized aggregate), so P(·|w_prev)
    // normalizes to exactly 1 over the training vocabulary
    val contexts = m.bigrams.groupBy("w_prev").agg(sum(col("c")).as("__ca"))
    val lp = terms
      .join(m.bigrams.withColumnRenamed("c", "__cab"), Seq("w_prev", "w"), "left")
      .join(contexts, Seq("w_prev"), "left")
      .withColumn("__lp",
        log((coalesce(col("__cab"), lit(0L)) + lit(1L)).cast("double") /
            (coalesce(col("__ca"), lit(0L)) + lit(m.vocab)).cast("double"))
          .cast("decimal(38,6)"))
      .groupBy("__id")
      .agg(count(lit(1)).as("__n"), sum(col("__lp")).as("__s"))
    docs.select(col(idCol))
      .join(lp, docs(idCol) === lp("__id"), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_terms"),
        when(col("__n") > 0, col("__s").cast("double") / col("__n")).as("avg_lp"))
  }

  /** Top-k word collocations by pointwise mutual information:
    * PMI(a,b) = ln(N·c(a,b) / (c(a)·c(b))) over adjacent word pairs with
    * c(a,b) ≥ `minCount` (rare pairs have unstable PMI — the standard
    * floor). High-PMI pairs are the corpus's multi-word expressions
    * ("new york", "machine learning"); a drifting PMI head is a
    * template-flood signal next to q72's Zipf slope.
    *
    * Engine-reproducible ordering: counts are exact integers, the ratio
    * is computed in IEEE doubles from identical operands, and PMI rounds
    * to DECIMAL(38,6) BEFORE ranking — so the top-k cut falls on the
    * same pairs in any engine (ties break by the pair itself). Counts
    * multiply as doubles, not longs: at 10¹³ tokens N·c(a,b) overflows
    * long but stays an exact-enough deterministic double.
    *
    * Scale shape: one bigram count shuffle + two unigram-keyed joins
    * (vocab-sized, NOT broadcast — Heaps' law), then a bounded-heap
    * global top-k (TakeOrderedAndProject), never a full sort. */
  def pmiTop(corpus: DataFrame, textCol: String, k: Int,
             minCount: Long = 5L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val uni = corpus
      .select(explode(split(col(textCol), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val bi = corpus
      .select(explode(bigramArray(textCol)).as("bg"))
      .select(col("bg.w_prev").as("w_prev"), col("bg.w").as("w"))
      .groupBy("w_prev", "w").agg(count(lit(1)).as("c_pair"))
      // read twice — by the eager N scalar below and by the PMI query
      // itself — and its producer is a full corpus tokenize+explode+
      // shuffle; the lazy barrier (materialized by the N aggregate, which
      // touches every partition) runs it once. Bounded by the distinct
      // bigram count, not the corpus.
      .localCheckpoint(false)
    // sum over an empty frame is NULL, not 0 — a corpus with no bigrams
    // (all docs < 2 words) must return an empty result, not NPE
    val nRow = bi.agg(sum(col("c_pair"))).head()
    if (nRow.isNullAt(0) || nRow.getLong(0) == 0L) {
      return bi.select(col("w_prev"), col("w"), col("c_pair"),
        lit(null).cast("double").as("pmi")).limit(0)
    }
    val n = nRow.getLong(0)
    bi.filter(col("c_pair") >= minCount)
      .join(uni.select(col("w").as("w_prev"), col("c").as("__ca")), Seq("w_prev"))
      .join(uni.select(col("w"), col("c").as("__cb")), Seq("w"))
      .withColumn("pmi",
        log(col("c_pair").cast("double") * lit(n.toDouble) /
            (col("__ca").cast("double") * col("__cb").cast("double")))
          .cast("decimal(38,6)").cast("double"))
      .select("w_prev", "w", "c_pair", "pmi")
      .orderBy(col("pmi").desc, col("w_prev"), col("w"))
      .limit(k)
  }
}
