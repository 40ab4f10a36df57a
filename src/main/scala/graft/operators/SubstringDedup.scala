package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Exact substring-duplication detection and removal — the third dedup
  * mode next to whole-document (`Dedup.exact` / `dedupCorpus`) and
  * line-level (`TextClean.dedupLines`): find runs of ≥ `k` consecutive
  * tokens that appear verbatim in MORE THAN ONE document, report them as
  * per-document duplicated spans, and optionally strip them from every
  * non-canonical holder.
  *
  * This is the distributed re-expression of suffix-array exact substring
  * dedup (Lee et al. 2022, "Deduplicating Training Data Makes Language
  * Models Better": remove substrings of ≥ 50 tokens appearing twice in
  * the corpus). A suffix array is inherently a single-machine index; the
  * Spark-native equivalent is token k-gram fingerprinting: every shared
  * substring of length ≥ k tokens contains at least one shared k-gram,
  * and the union of shared k-gram windows is exactly the duplicated
  * token coverage. Per-doc positions ride the native codegen'd
  * `WordShingles` expression (one split + one linear pass, no
  * explode-then-regroup of words).
  *
  * Scale shape (100 TB): the only shuffles are keyed on the gram (the
  * shared-gram count and the position↔shared join) and on the doc id
  * (the span merge window) — no all-pairs comparisons anywhere, and the
  * span merge is one sort per doc key. With `hashKeys = true` the gram
  * shuffle carries an 8-byte xxhash64 instead of the k-word string
  * (~6× narrower at k = 8); a cross-doc hash collision can only
  * FALSE-POSITIVE a span (two distinct grams colliding ⇒ a non-shared
  * window marked shared) at ~n²/2⁶⁵ odds — the right production
  * default, while `hashKeys = false` keys on the exact gram string for
  * engine-independent reproducibility (the oracle-checked q66 path).
  */
object SubstringDedup {

  /** Per-doc k-gram start positions: (`__id`, `pos` 0-based, `gram`).
    * Docs with fewer than `k` tokens emit nothing. */
  private[operators] def gramPositions(docs: DataFrame, textCol: String, idCol: String,
                                       k: Int): DataFrame =
    docs.select(col(idCol).as("__id"),
        posexplode(TextFns.shingles(col(textCol), k)).as(Seq("pos", "gram")))

  /** Merge per-doc duplicated k-gram start positions into maximal
    * contiguous covered token spans: interval-union of the windows
    * [pos, pos + k − 1], new span when a window starts past the running
    * previous end + 1. Input needs (`__id`, `pos`); output
    * (`__id`, `span_start`, `span_end`). O(n log n) per doc key (one
    * window sort), no cross-doc data movement. */
  private[graft] def mergeCoverage(positions: DataFrame, k: Int): DataFrame = {
    val byDoc = Window.partitionBy("__id").orderBy("pos")
    positions
      .withColumn("__end", col("pos") + lit(k - 1))
      .withColumn("__prev_end",
        max(col("__end")).over(byDoc.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new_span",
        when(col("__prev_end").isNull || col("pos") > col("__prev_end") + 1, 1L).otherwise(0L))
      .withColumn("__span_id",
        sum(col("__new_span")).over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("__id", "__span_id")
      .agg(min(col("pos")).as("span_start"), max(col("__end")).as("span_end"))
      .select("__id", "span_start", "span_end")
  }

  /** Annotate every gram-position row with its gram's distinct-doc count
    * and canonical (minimum) holder id — the shared-gram detection fused
    * onto the position rows themselves. The former shape computed a
    * separate shared-gram table (distinct → groupBy → filter) and joined
    * it back to `grams`: Spark does not CSE the duplicated subtree, so
    * the gram producer (corpus scan + split + shingle pass) ran TWICE,
    * plus a distinct shuffle and a gram-keyed join shuffle. Here ONE
    * gram-keyed exchange feeds two window functions over the same
    * partitioning: a first-occurrence flag per (gram, doc) via lag over
    * (gram ORDER BY doc, pos), then the full-frame sum of flags = the
    * gram's distinct-doc count (and min(__id) over the frame = the
    * canonical holder, since the frame is doc-ordered). Row set and
    * values are identical to the join form.
    *
    * Skew note: a gram shared by D docs sorts its position rows in one
    * window partition — the same rows the join form also placed in one
    * hash partition, so the skew class is unchanged. */
  private def withSharedCounts(grams: DataFrame): DataFrame = {
    val byGram = Window.partitionBy("gram").orderBy("__id", "pos")
    val whole = Window.partitionBy("gram")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    grams
      .withColumn("__first",
        when(lag(col("__id"), 1).over(byGram).isNull ||
          lag(col("__id"), 1).over(byGram) =!= col("__id"), 1L).otherwise(0L))
      .withColumn("__n_docs", sum(col("__first")).over(whole))
      .withColumn("min_id", min(col("__id")).over(whole))
      .drop("__first")
  }

  private def withKey(df: DataFrame, hashKeys: Boolean): DataFrame =
    if (hashKeys) df.withColumn("gram", xxhash64(col("gram"))) else df

  /** Duplicated-span table: one row per maximal cross-doc-duplicated
    * token span, (`idCol`, `span_start`, `span_end`) — token index
    * range, inclusive, 0-based. */
  def dupSpans(docs: DataFrame, textCol: String, idCol: String, k: Int,
               hashKeys: Boolean = true): DataFrame = {
    val grams = withKey(gramPositions(docs, textCol, idCol, k), hashKeys)
    val dupPos = withSharedCounts(grams)
      .filter(col("__n_docs") >= 2)
      .select("__id", "pos")
    mergeCoverage(dupPos, k).withColumnRenamed("__id", idCol)
  }

  /** Per-doc duplication report (the q66 shape): every doc with its
    * token count, number of maximal duplicated spans, duplicated-token
    * total and fraction — zero rows included, so `dup_frac` thresholds
    * select directly. */
  def spanStats(docs: DataFrame, textCol: String, idCol: String, k: Int,
                hashKeys: Boolean = true): DataFrame = {
    val spans = dupSpans(docs, textCol, idCol, k, hashKeys)
      .groupBy(idCol)
      .agg(count(lit(1)).as("__n_spans"),
        sum(col("span_end") - col("span_start") + 1).as("__dup_tokens"))
    docs
      .select(col(idCol), size(TextFns.words(col(textCol))).cast("long").as("n_tokens"))
      .join(spans, Seq(idCol), "left")
      .select(col(idCol),
        col("n_tokens"),
        coalesce(col("__n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("__dup_tokens"), lit(0L)).as("dup_tokens"),
        (coalesce(col("__dup_tokens"), lit(0L)).cast("double") / col("n_tokens"))
          .as("dup_frac"))
  }

  /** Remove every duplicated span from every NON-canonical holder: a
    * token is dropped when it sits inside a shared-k-gram window whose
    * gram's canonical (minimum) doc id is not this doc — so exactly one
    * copy of each duplicated run survives corpus-wide (identical docs
    * keep the min-id copy intact and strip the others to empty), the
    * same survivor policy as [[Dedup.exact]].
    *
    * Output: (`idCol`, `textCol` rebuilt from surviving tokens,
    * `removed_tokens`). Coverage is computed with a fixed k−1-row
    * sliding window over the token sequence (no token↔span range join),
    * so the whole operator stays key-partitioned shuffles. */
  def stripSpans(docs: DataFrame, textCol: String, idCol: String, k: Int,
                 hashKeys: Boolean = true): DataFrame = {
    val grams = withKey(gramPositions(docs, textCol, idCol, k), hashKeys)
    // duplicated gram starts this doc must NOT keep (it is not the
    // gram's canonical holder)
    val strip = withSharedCounts(grams)
      .filter(col("__n_docs") >= 2 && col("__id") =!= col("min_id"))
      .select("__id", "pos")
      .withColumn("__strip", lit(1L))
    val toks = docs.select(col(idCol).as("__id"),
      posexplode(TextFns.words(col(textCol))).as(Seq("pos", "tok")))
    val byDoc = Window.partitionBy("__id").orderBy("pos")
    val kept = toks
      .join(strip, Seq("__id", "pos"), "left")
      // covered ⇔ some stripped window starting within the last k−1
      // tokens (or here) reaches this token
      .withColumn("__covered",
        max(col("__strip")).over(byDoc.rowsBetween(-(k - 1), 0)))
      .filter(col("__covered").isNull)
      .groupBy("__id")
      .agg(array_sort(collect_list(struct(col("pos"), col("tok")))).as("__ordered"))
      .select(col("__id"),
        concat_ws(" ", transform(col("__ordered"), s => s.getField("tok"))).as("__text"),
        size(col("__ordered")).cast("long").as("__kept"))
    docs
      .select(col(idCol), size(TextFns.words(col(textCol))).cast("long").as("__total"))
      .join(kept, docs(idCol) === kept("__id"), "left")
      .select(col(idCol),
        coalesce(col("__text"), lit("")).as(textCol),
        (col("__total") - coalesce(col("__kept"), lit(0L))).as("removed_tokens"))
  }
}
