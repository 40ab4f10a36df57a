package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-scan data profiling — the QA pass run before a table is admitted
  * to a pipeline (PSRDB's summary queries over observation metadata;
  * corpus intake checks in a training-data pipeline).
  *
  * Output: one row per profiled column with row count, present (non-null)
  * count, exact distinct count, and min/max cast to double. Everything
  * computes in a SINGLE scan: one aggregate row holding every metric
  * (Spark plans the multi-distinct via one Expand — rows × #columns map
  * work, no extra scans), unpivoted to per-column rows.
  * At 100 TB swap `countDistinct` for `approx_count_distinct` (same
  * shape, sketch-mergeable, no Expand); the exact form is kept because
  * it is oracle-checkable.
  */
object Profile {

  /** One global frame over an already-tiny frame (totals-next-to-rows
    * without re-aggregating the subtree). Callers must only apply this
    * to category/cell-sized data — it is a single-partition window. */
  private val unboundedAll = org.apache.spark.sql.expressions.Window
    .partitionBy().rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)

  /** Profile numeric (or numeric-castable) columns. `approx = true`
    * swaps the exact multi-distinct for HLL sketches — same single-scan
    * shape with mergeable partials and no Expand, the 100 TB form
    * (3.8× faster at sf0.1). */
  def numeric(df: DataFrame, cols: Seq[String], approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "at least one column to profile")
    // Positional helper names: caller column names are DATA and must not
    // ride through any name parser (col("a.b") would parse the dot as
    // field access; a backtick breaks outright). Aliases set via .as()
    // are literal; these generated names are parser-safe by construction.
    def src(c: String) = df.col(s"`${c.replace("`", "``")}`")
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(src(c)).as(s"__cnt_$i"),
        (if (approx) approx_count_distinct(src(c)) else countDistinct(src(c))).as(s"__nd_$i"),
        min(src(c)).cast("double").as(s"__min_$i"),
        max(src(c)).cast("double").as(s"__max_$i"),
      )
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col(s"__cnt_$i").as("n_present"),
        col(s"__nd_$i").as("n_distinct"), col(s"__min_$i").as("min_val"),
        col(s"__max_$i").as("max_val"))
    }
    one.select(col("__rows").as("n_rows"), explode(array(rows: _*)).as("__r"))
      .select(col("__r.col_name").as("col_name"), col("n_rows"),
        col("__r.n_present").as("n_present"), col("__r.n_distinct").as("n_distinct"),
        col("__r.min_val").as("min_val"), col("__r.max_val").as("max_val"))
  }

  /** Zipf-law fit per group: OLS slope of ln(freq) vs ln(rank) over the
    * top-`k` most frequent words — natural text follows freq ∝ rank^s
    * with s ≈ −1, and a corpus slice whose slope drifts far from −1 is a
    * quality signal (template/boilerplate floods flatten it, key-value
    * spam steepens it). The standard fit uses only the head of the rank
    * curve, which is exactly what makes it scale-clean here:
    *
    *  - word counts: one explode + map-side-combining count keyed on
    *    (group, word) — the only corpus-sized shuffle;
    *  - top-k by frequency: the declarative rank-filter, rewritten to
    *    the bounded-heap TopKPerKey operator (k rows per group per
    *    partition cross the second shuffle, never a per-group sort);
    *  - the OLS moments then see ≤ groups×k rows. Decimal-exact sums
    *    (ln ulp wobble dies at the DECIMAL(38,6) cast), closed-form
    *    slope, zero-denominator groups NULL in any engine.
    *
    * Output: (group, n_top, slope, intercept). Deterministic: frequency
    * ties rank alphabetically. */
  def zipf(df: DataFrame, textCol: String, groupCol: String, k: Int): DataFrame = {
    require(k >= 2, s"need at least 2 ranks for a slope, got k=$k")
    graft.plans.RankFilterToTopK_Install(df.sparkSession)
    import graft.functions.Num.dsum
    val counts = df
      .select(col(groupCol).as("group"), explode(graft.functions.TextFns.words(col(textCol))).as("__w"))
      .groupBy("group", "__w")
      .agg(count(lit(1)).as("freq"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("group").orderBy(col("freq").desc, col("__w").asc)
    val x = log(col("rank").cast("double"))
    val y = log(col("freq").cast("double"))
    counts
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .groupBy("group")
      .agg(
        count(lit(1)).as("n_top"),
        dsum(x).as("__sx"), dsum(y).as("__sy"),
        dsum(x * y).as("__sxy"), dsum(x * x).as("__sxx"))
      .withColumn("__den", col("n_top") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("slope",
        when(col("__den") =!= 0.0,
          (col("n_top") * col("__sxy") - col("__sx") * col("__sy")) / col("__den")))
      .withColumn("intercept",
        (col("__sy") - col("slope") * col("__sx")) / col("n_top"))
      .select("group", "n_top", "slope", "intercept")
  }

  /** Categorical drift between two snapshots of the same column — the
    * chi-square homogeneity decomposition, per category: observed counts
    * in each snapshot, expected counts under "no drift" (row-total ×
    * column-share), and the cell's chi-square contribution. The sum of
    * `chi2_contrib` over categories is the classic two-sample chi-square
    * statistic; large per-category contributions localize WHICH value
    * drifted (a new-source flood, a vanished language, a schema change
    * upstream) — the check a training-data pipeline runs between
    * yesterday's corpus and today's.
    *
    * Two map-side-combining counts (one per snapshot, keyed on the
    * category) + a full-outer join of two category-sized frames +
    * closed-form arithmetic on exact longs — identical doubles in any
    * engine, trivially scale-safe (nothing after the counts exceeds the
    * category cardinality). Zero-count categories present in only one
    * snapshot still contribute (expected > 0 whenever the pooled count
    * is > 0). */
  def categoricalDrift(a: DataFrame, b: DataFrame, catCol: String): DataFrame = {
    val ca = a.groupBy(col(catCol).as("category")).agg(count(lit(1)).as("n_a"))
    val cb = b.groupBy(col(catCol).as("category")).agg(count(lit(1)).as("n_b"))
    val cells = ca.join(cb, Seq("category"), "full_outer")
      .select(col("category"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    // totals via a global window over the CATEGORY-SIZED cells frame — a
    // separate aggregate + crossJoin would recompute both count subtrees
    // (two extra scans of each snapshot, the q71 double-subtree trap);
    // the unpartitioned window is fine because cells is already tiny
    val totA = sum(col("n_a")).over(unboundedAll)
    val totB = sum(col("n_b")).over(unboundedAll)
    val pooled = (col("n_a") + col("n_b")).cast("double")
    val grand = (totA + totB).cast("double")
    val expA = pooled * totA.cast("double") / grand
    val expB = pooled * totB.cast("double") / grand
    val da = col("n_a").cast("double") - col("exp_a")
    val db = col("n_b").cast("double") - col("exp_b")
    cells
      .withColumn("exp_a", expA)
      .withColumn("exp_b", expB)
      .withColumn("chi2_contrib",
        when(col("exp_a") > 0.0, da * da / col("exp_a")).otherwise(lit(0.0)) +
          when(col("exp_b") > 0.0, db * db / col("exp_b")).otherwise(lit(0.0)))
      .select("category", "n_a", "n_b", "exp_a", "exp_b", "chi2_contrib")
  }

  /** Distribution-drift divergences over a keyed count table — the
    * quantitative "did the distribution shift" metric next to
    * [[categoricalDrift]]'s chi-square test: per group, the KL
    * divergence of snapshot A's item distribution from B's and the
    * symmetric, bounded Jensen–Shannon divergence (the standard corpus
    * drift / retrain-the-tokenizer signal — JSD in nats, ≤ ln 2).
    *
    * Input: one row per (group, item) with that item's counts in the two
    * snapshots (`aCol`, `bCol`; NULLs — what a full-outer count join
    * produces for absent items — are normalized to 0 internally, and a
    * null group key is treated as its own category, joined null-safely
    * rather than dropped). Distributions are add-α smoothed over the UNION
    * vocabulary (`p = (c + α) / (n + α·V)`), so q = 0 items contribute
    * finite mass and the divergences are always defined; α = 0.5 is
    * Jeffreys. Output per group: `n_a`, `n_b`, `vocab`, `kl_ab`, `jsd`.
    *
    * Scale shape: one bounded-group-count join of the counts table with
    * its per-group totals (broadcast), then ONE map-side-combined
    * aggregation — cost rides the (group, item) table, which the
    * upstream count already shrank from the corpus. Determinism: the
    * per-item terms are IEEE double chains summed through DECIMAL(38,18)
    * — exact and order-independent, with 18 decimals so the ~1e-19
    * cross-engine `ln` ulp wobble dies below the cast resolution while
    * 1e-6-scale item terms keep their full weight (the q38 dot-product
    * scale choice, not the 6-decimal aggregate policy, which would
    * round away small-item contributions). */
  def klDrift(counts: DataFrame, groupCol: String, itemCol: String,
              aCol: String, bCol: String, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0.0, s"smoothing alpha must be positive, got $alpha")
    // a full-outer count join produces NULL (not 0) for absent items, and
    // a null GROUP key is a legitimate category: normalize the former,
    // join null-safely for the latter — null-count items must weigh as 0
    // and the null group must surface, not silently vanish
    val normalized = counts.withColumn("__ca", coalesce(col(aCol), lit(0L)))
      .withColumn("__cb", coalesce(col(bCol), lit(0L)))
    val totals = normalized.groupBy(groupCol).agg(
      sum(col("__ca")).as("n_a"), sum(col("__cb")).as("n_b"),
      count(lit(1)).as("vocab"))
      .withColumnRenamed(groupCol, "__tg")
    val al = lit(alpha)
    val p = (col("__ca").cast("double") + al) /
      (col("n_a").cast("double") + al * col("vocab").cast("double"))
    val q = (col("__cb").cast("double") + al) /
      (col("n_b").cast("double") + al * col("vocab").cast("double"))
    def dsum18(c: org.apache.spark.sql.Column) =
      sum(c.cast("decimal(38,18)")).cast("double")
    val m = (col("p") + col("q")) / lit(2.0)
    normalized.join(broadcast(totals), col(groupCol) <=> col("__tg"))
      .drop("__tg")
      .withColumn("p", p)
      .withColumn("q", q)
      .withColumn("m", m)
      .groupBy(groupCol)
      .agg(
        first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        first(col("vocab")).as("vocab"),
        dsum18(col("p") * log(col("p") / col("q"))).as("kl_ab"),
        (dsum18(col("p") * log(col("p") / col("m"))) * lit(0.5) +
         dsum18(col("q") * log(col("q") / col("m"))) * lit(0.5)).as("jsd"))
  }

  /** Exact WEIGHTED quantiles per group — the weighted twin of the q42
    * order-statistic quantiles, for populations where rows carry
    * importance/frequency/duration weights (token-weighted doc-length
    * percentiles, duration-weighted latency percentiles): per group and
    * requested quantile p/q, the smallest value whose cumulative weight
    * reaches p/q of the group's total.
    *
    * Exactness contract: weights must be NON-NEGATIVE INTEGERS (an
    * integral column type — enforced, since cast-flooring doubles would
    * silently zero them) and quantiles are given as RATIONALS (p, q) —
    * the pick test `q·W_cum ≥ p·W_tot` runs in DECIMAL(38,0), so it is
    * exact and engine-independent for any weights whose GROUP TOTAL fits
    * a long (~9.2e18; the products go far beyond long range and must
    * not wrap). Fractional weights belong upstream: scale them to
    * integers at whatever resolution matters. Negative weights raise at
    * execution — they break cumulative monotonicity. (Scope: the guard
    * covers rows that PARTICIPATE — null-`valueCol` rows are excluded
    * before any weight is read, so a negative weight sitting on an
    * excluded row is never seen, by the same rule that excludes its
    * value.)
    *
    * Determinism: pass `tieCols` making (value, tieCols…) a total order
    * — cumulative weights are then identical in any engine (the RANGE
    * window frame's peer groups are singletons). Nulls in `valueCol` are
    * excluded (the q42 null-ranking rationale); `n` reports the measured
    * count, `w_total` the group's total weight.
    *
    * Scale shape: one windowed pass (sort within group) + one map-side
    * aggregation — the same two-exchange shape as q42; all requested
    * quantiles come from the SAME pass (conditional mins). */
  def weightedQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                        weightCol: String, quantiles: Seq[(Int, Int)],
                        tieCols: Seq[String] = Nil): DataFrame = {
    require(quantiles.nonEmpty, "at least one quantile")
    require(quantiles.distinct.length == quantiles.length,
      s"duplicate quantiles would collide on output column names: $quantiles")
    quantiles.foreach { case (p, q) =>
      require(q > 0 && p >= 0 && p <= q, s"quantile $p/$q not in [0, 1]") }
    // the integer contract is load-bearing (the pick test's exactness):
    // enforce it instead of letting cast("long") silently floor doubles
    val wType = df.schema(weightCol).dataType
    // explicit whitelist: Spark's IntegralType abstract class is
    // private[sql], so isInstanceOf[IntegralType] does not compile from
    // user code
    val integral = {
      import org.apache.spark.sql.types._
      wType == ByteType || wType == ShortType || wType == IntegerType || wType == LongType
    }
    require(integral,
      s"weights must be integral (got $wType for '$weightCol') — " +
        "scale fractional weights to integers upstream")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
      .orderBy((col(valueCol) +: tieCols.map(col)).map(_.asc): _*)
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCols.map(col): _*)
    // a negative weight breaks cumulative monotonicity and with it the
    // "smallest value reaching the threshold" semantics; a NULL weight
    // would slip past a plain `< 0` check (three-valued logic), turn the
    // row's cumulative weight null, be silently skipped by the window
    // sums, yet still count in `n` — so both fail loudly per row
    // (codegen'd branch), never return an arbitrary quantile
    // single CASE, not `w + when(bad, raise_error)`: binary arithmetic
    // short-circuits on a null left operand (BinaryExpression eval and
    // nullSafeCodeGen both skip the right side), so an Add-shaped guard
    // never fires for exactly the null weights it must catch
    val checkedW =
      when(col(weightCol).isNull || col(weightCol) < 0,
        raise_error(concat(lit(s"weightedQuantiles: null or negative weight in '$weightCol': "),
          coalesce(col(weightCol).cast("string"), lit("NULL")))).cast("long"))
        .otherwise(col(weightCol).cast("long"))
    val base = df.filter(col(valueCol).isNotNull)
      .withColumn("__w", checkedW)
      .withColumn("__cw", sum(col("__w")).over(w))
      .withColumn("__tw", sum(col("__w")).over(cw))
    // pick test in DECIMAL(38,0): q·W_cum and p·W_tot stay exact far past
    // the Long range (W_tot ~ 1e16 token weights × q = 1000 would wrap a
    // Long multiply negative and silently pick wrong rows)
    def dec(c: Column) = c.cast("decimal(38,0)")
    val aggs = quantiles.map { case (p, q) =>
      min(when(dec(col("__cw")) * lit(q.toLong) >= dec(col("__tw")) * lit(p.toLong),
        col(valueCol))).as(s"wq_${p}_$q")
    } ++ Seq(count(lit(1)).as("n"), max(col("__tw")).as("w_total"))
    base.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Mergeable distinct-count sketches as COLUMNS — the incremental /
    * compositional form of a distinct count. `distinctSketches` reduces
    * each group to one Apache DataSketches HLL binary (Spark's built-in
    * `hll_sketch_agg`, mergeable partials, fixed ~KB size);
    * `mergeSketchCounts` unions stored sketches up to any coarser
    * grouping and estimates. The 100 TB pattern this enables: persist
    * per-(day, source) sketches once, then answer "distinct docs this
    * month / per source / overall" from kilobytes WITHOUT rescanning the
    * corpus — exact distincts at that scale mean a full reshuffle per
    * question asked.
    *
    * lgConfigK = 12 (Spark's default): ~2.6% relative standard error,
    * 4 KB per sketch. Estimates are deterministic for a given input set
    * (hashing is seed-fixed) but are NOT cross-engine-oracle-able —
    * verification is the spec's exact-count comparison, not DuckDB. */
  def distinctSketches(df: DataFrame, groupCols: Seq[String], valueCol: String,
                       lgConfigK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("distinct_sketch"))

  /** Union per-group sketches up to `rollupCols` (subset of the original
    * grouping, empty = grand total) and estimate the distinct count. */
  def mergeSketchCounts(sketches: DataFrame, rollupCols: Seq[String]): DataFrame = {
    val merged =
      if (rollupCols.isEmpty)
        sketches.agg(hll_union_agg(col("distinct_sketch")).as("merged"))
      else
        sketches.groupBy(rollupCols.map(col): _*)
          .agg(hll_union_agg(col("distinct_sketch")).as("merged"))
    merged.withColumn("n_distinct_est", hll_sketch_estimate(col("merged")))
      .drop("merged")
  }

  /** Snapshot diff between two versions of a keyed table: each key is
    * `added` (only in b), `removed` (only in a), `changed` (both, value
    * fingerprint differs) or `unchanged` — the corpus-version diff run
    * before promoting a new crawl/pipeline output ("today's corpus
    * dropped 12% of yesterday's docs" should fail loudly, not surface in
    * a training run). Value comparison is by md5 fingerprint so
    * arbitrarily wide value columns diff at fixed cost.
    *
    * One full-outer join on the key (both sides shuffle-keyed the same
    * way — co-partitioned under AQE), classification is a pure
    * projection. Output: (diff_status, n, n_keys_total). */
  def snapshotDiff(a: DataFrame, b: DataFrame, keyCol: String,
                   valueCol: String): DataFrame = {
    // explicit presence flags: a NULL value hashes to NULL, which must
    // not read as "key absent" (null-text docs present in both versions
    // are unchanged, not added) — hashes compare null-safely instead
    val av = a.select(col(keyCol).as("__k"),
      md5(col(valueCol).cast("string")).as("__ha"), lit(true).as("__pa"))
    val bv = b.select(col(keyCol).as("__k"),
      md5(col(valueCol).cast("string")).as("__hb"), lit(true).as("__pb"))
    val status = when(col("__pa").isNull, lit("added"))
      .when(col("__pb").isNull, lit("removed"))
      .when(col("__ha") <=> col("__hb"), lit("unchanged"))
      .otherwise(lit("changed"))
    av.join(bv, Seq("__k"), "full_outer")
      .select(status.as("diff_status"))
      .groupBy("diff_status")
      .agg(count(lit(1)).as("n"))
      .withColumn("n_keys_total", sum(col("n")).over(unboundedAll))
  }
}
