package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Range joins that scale: point-in-interval and interval-overlap joins
  * expressed as bin-equi-joins instead of inequality joins.
  *
  * Spark plans a bare `ON p BETWEEN s AND e` as BroadcastNestedLoopJoin
  * (or a cartesian product when neither side fits in memory) — O(n·m)
  * comparisons and a single-threaded broadcast build, which is unusable
  * when both sides are large facts. The standard scale shape is binning:
  * each interval is exploded to every fixed-width bin it touches, each
  * point maps to exactly one bin, and the join becomes an equi-join on
  * the bin id (+ any extra keys) followed by an exact residual filter.
  * Cost: one hash shuffle per side and an interval blow-up factor of
  * ~(avg_len / binWidth + 1) — both bounded and partition-parallel.
  *
  * Engine-level form of meerpipe's "observation inside a chopped band
  * range" membership test (`chop_edges` config windows, archive_utils.py)
  * generalized to arbitrary interval tables.
  *
  * Bin width is the caller's lever: set it near the TYPICAL interval
  * length so most intervals copy into 1-2 bins. Too small explodes the
  * interval side; too large packs many intervals per bin and the
  * residual filter does the work. Both are correct.
  *
  * Time columns may be TimestampType/TimestampNTZType (binned on
  * unix_micros, so binWidth is in MICROSECONDS) or any integral type
  * (binWidth in the column's own units). Column names must be disjoint
  * across the two sides (standard graft operator contract).
  */
object RangeJoin {

  /** Exact floor-division bin id in pure long arithmetic. The naive
    * `floor(c / w)` goes through doubles and mis-bins longs past 2^53;
    * `(c - pmod(c, w)) div w` is exact for the full long range and
    * floors (not truncates) for negative values, so pre-epoch
    * timestamps bin correctly. */
  private def binId(c: Column, w: Long): Column =
    call_function("div", c - pmod(c, lit(w)), lit(w))

  /** Column as a long on the binning axis. */
  private def axis(df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case TimestampType => unix_micros(col(name))
      case TimestampNTZType =>
        // tz-invariant NTZ micros, computed arithmetically from the naive
        // wall-clock fields: a bare cast would shift by the session offset
        // (and by DIFFERENT offsets across a DST boundary, mis-binning
        // values near the transition; a convert-then-cast round trip is
        // ambiguous in the fall-back hour); on a UTC session the cast is
        // the identity — skip the field extraction
        if (graft.sources.Tables.sessionIsUtc(df.sparkSession))
          unix_micros(col(name).cast("timestamp"))
        else
          graft.sources.Tables.ntzMicros(col(name))
      case _ => col(name).cast("long")
    }

  /** For each point row, every interval row (same `extraKeys`, if given)
    * whose [start, end] CLOSED interval contains the point. Output =
    * matched pairs with both sides' columns; points with no containing
    * interval are dropped (inner semantics — wrap with a left join on a
    * key column for left semantics).
    *
    * Duplicate-free by construction: a point lives in exactly one bin
    * and an interval copies into each touched bin once, so each
    * qualifying (point, interval) pair meets exactly once.
    *
    * OUTPUT-BOUND AT SCALE: this form MATERIALIZES every qualifying
    * pair, and on a densifying axis the pair count grows as points ×
    * intervals (measured ×100.04 candidates on q56's 10× sf step —
    * SCALING.md round-12 addendum; that is the output's size, not an
    * inefficiency). If the downstream
    * need is an aggregate per interval/group (counts, sums), use
    * [[aggregatePointsInIntervals]] instead — it folds the pairs inside
    * the join stage and stays linear in the INPUT row counts (the
    * q88_interval_agg form). Reach for `pointInInterval` only when the
    * pairs themselves are the product.
    *
    * PERF (round-12 profile, SCALING.md): when the pair stream feeds an
    * aggregate, the per-matched-pair key cost is first-order — a STRING
    * group key hashed once per 1.25e9 pairs was 4 s of q56's 12 s at
    * sf1, while the candidate loop itself outran DuckDB's whole query.
    * Dictionary-encode low-cardinality string keys around the join
    * (pure-function surrogate like xxhash64 — the dict subtree plans
    * twice across the join-back, so positional ids would disagree;
    * null-safe <=> dict join keeps null-key rows), as q56 does.
    * COLLISION CAVEAT: a 64-bit hash collision between two distinct
    * key values would silently merge their aggregate groups and then
    * DUPLICATE rows at the dict join-back (the inner join matches both
    * colliding dict rows). Negligible at dictionary cardinality like
    * q56's 5 priorities, but when copying the pattern assert
    * `countDistinct(surrogate) == countDistinct(key)` on the broadcast
    * dict first — trivially cheap at dict size, and it turns the
    * silent merge into a loud failure.
    *
    * `pairBudget` (opt-in) bounds that output — the TOTAL candidate-pair
    * count. COMPATIBILITY NOTE: before round 11 the same parameter
    * bounded the WORST PER-BIN product; it now bounds the SUM over all
    * bins (strictly stricter for the same value — a budget calibrated to
    * the old per-bin meaning can only fail LOUDLY earlier, never let a
    * larger output through silently; recalibrate by multiplying by the
    * expected bin count). Mechanically: per-(bin, keys) products `n_points × n_intervals` are
    * pre-counted on both sides and the job raise_errors when their SUM
    * over all bins exceeds the budget (naming the single worst bin and
    * its two counts when that bin alone blows it — the skew diagnosis)
    * — BEFORE the pair join streams (the guard is a 1-row broadcast
    * built ahead of the stream side), so a densified axis at 100× scale
    * fails loudly instead of materializing a quadratic output. The guard is pure
    * plan composition on the 1-row side — the per-pair hot path gains
    * no filter (PlanGuardSpec pins this); `None` leaves the plan
    * byte-identical to the unguarded form. Products are compared in
    * DECIMAL(38,0): two 1e10-row sides would wrap a Long multiply. */
  def pointInInterval(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      extraKeys: Seq[(String, String)] = Nil,
      pairBudget: Option[Long] = None,
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    pairBudget.foreach(b => require(b > 0, s"pairBudget must be positive, got $b"))
    val p = axis(points, pointCol)
    val s = axis(intervals, startCol)
    val e = axis(intervals, endCol)

    val pts = points.withColumn("__bin", binId(p, binWidth))
    // end < start would make sequence() DESCEND (Spark quirk) and emit
    // phantom bins — empty intervals can never match, drop them up front
    val ivs = intervals
      .filter(s <= e)
      .withColumn("__bin", explode(sequence(binId(s, binWidth), binId(e, binWidth))))

    val keyCond = extraKeys
      .map { case (pk, ik) => pts(pk) === ivs(ik) }
      .foldLeft(pts("__bin") === ivs("__bin"))(_ && _)
    val joined = pts
      .join(ivs, keyCond)
      .filter(axis(points, pointCol).between(axis(intervals, startCol), axis(intervals, endCol)))
      .drop("__bin")
    pairBudget match {
      case None => joined
      case Some(budget) =>
        val dec = (c: Column) => c.cast("decimal(38,0)")
        val np = pts.groupBy((col("__bin") +: extraKeys.map(k => col(k._1))): _*)
          .agg(count(lit(1)).as("__np"))
        val ni = ivs.groupBy((col("__bin") +: extraKeys.map(k => col(k._2))): _*)
          .agg(count(lit(1)).as("__ni"))
        val cond = extraKeys
          .map { case (pk, ik) => np(pk) === ni(ik) }
          .foldLeft(np("__bin") === ni("__bin"))(_ && _)
        // one global aggregate over the per-bin candidate counts, so the
        // guard side is ONE row whose evaluation (during broadcast build)
        // fires the raise_error before the pair join streams anything.
        // The budget bounds the TOTAL candidate-pair output (sum of
        // per-bin products); the single worst bin is named when it alone
        // exceeds the budget (the skewed-bin diagnosis), otherwise the
        // total-sum message reports how many bins share the blame.
        val worst = np.join(ni, cond)
          .select(np("__bin").as("__b"), (dec(col("__np")) * dec(col("__ni"))).as("__pairs"),
            col("__np"), col("__ni"))
          .agg(max(col("__pairs")).as("__max_pairs"),
            sum(col("__pairs")).as("__tot_pairs"),
            // distinct BINS, not (bin, keys) groups — with extraKeys the
            // group count would over-report the bin count the skew
            // message diagnoses with
            countDistinct(col("__b")).as("__n_bins"),
            max_by(struct(col("__b"), col("__np"), col("__ni")), col("__pairs")).as("__w"))
          .filter(
            // single CASE chain: binary ops short-circuit null left
            // operands, so the raise_errors must live in ONE when-chain
            when(col("__max_pairs") > dec(lit(budget)),
              raise_error(concat(
                lit("RangeJoin.pointInInterval: bin "), col("__w.__b").cast("string"),
                lit(" would materialize "), col("__max_pairs").cast("string"),
                lit(" candidate pairs ("), col("__w.__np").cast("string"),
                lit(" points x "), col("__w.__ni").cast("string"),
                lit(s" intervals) > pairBudget=$budget — aggregate with " +
                  "aggregatePointsInIntervals, widen binWidth, or raise the budget"))).cast("boolean"))
              .when(col("__tot_pairs") > dec(lit(budget)),
                raise_error(concat(
                  lit("RangeJoin.pointInInterval: "), col("__tot_pairs").cast("string"),
                  lit(" total candidate pairs across "), col("__n_bins").cast("string"),
                  lit(s" bins > pairBudget=$budget (worst bin "), col("__w.__b").cast("string"),
                  lit(" holds "), col("__max_pairs").cast("string"),
                  lit(") — aggregate with aggregatePointsInIntervals, widen " +
                    "binWidth, or raise the budget"))).cast("boolean"))
              .otherwise(lit(true)))
          .select(lit(1).as("__guard_ok"))
        joined.crossJoin(broadcast(worst)).drop("__guard_ok")
    }
  }

  /** Decomposable aggregates (COUNT(*) + SUMs of point columns) over all
    * (point, interval-containing-it) pairs, grouped by interval columns,
    * WITHOUT materializing the pairs. `pointInInterval().groupBy(g)
    * .agg(count, sum)` is linear in the pair count, which densifying
    * data makes quadratic (10× points × 10× intervals on the same time
    * axis = 100× pairs); this is linear in |points| + |intervals|.
    *
    * Shape: each interval [s, e] becomes two boundary rows — (+1, t=e)
    * and (−1, t=s−1) — unioned with the points. A cumulative sum ordered
    * by t then reads, at each boundary, the prefix aggregate of all
    * points ≤ t, so an interval's net contribution is prefix(e) −
    * prefix(s−1) = the aggregate over points in [s, e] (closed, integer
    * axis). The prefix is computed in two levels so no global sort
    * exists: a within-bin cumulative window (parallel across `binWidth`
    * bins) plus a bins-sized prefix of per-bin totals joined back.
    * Cost: one hash shuffle of the union by bin + one window sort per
    * bin + one tiny bins-table window + the final groupBy — every stage
    * linear and partition-parallel. The bins-table window runs on a
    * single partition, which bounds binWidth from below: pick it so bin
    * count stays ≪ |points| (thousands-to-millions is fine).
    *
    * Output: `groupKeys` ++ `n_pairs` (pair count) ++ `sum_<c>` for each
    * of `sumCols`, with groups that matched zero points dropped (inner
    * pair-join semantics). Sum columns keep Spark's native sum typing
    * (long→long, decimal widening), so results are bit-identical to the
    * pair-join form for exact types.
    */
  def aggregatePointsInIntervals(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      binWidth: Long,
      groupKeys: Seq[String],
      sumCols: Seq[String] = Nil,
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(groupKeys.nonEmpty, "need at least one interval group column")
    val p = axis(points, pointCol)
    val s = axis(intervals, startCol)
    val e = axis(intervals, endCol)

    // Union schema: __t axis, __k orders boundaries AFTER coincident
    // points (prefix at t is inclusive of points at t), __sign ±1 on
    // boundaries / 0 on points, per-group null padding on points.
    val ptRows = points
      .filter(p.isNotNull)
      .select(
        Seq(p.as("__t"), lit(0).as("__k"), lit(0).as("__sign"), lit(1L).as("__cnt")) ++
          sumCols.map(c => points(c).as(s"__v_$c")) ++
          groupKeys.map(k => lit(null).cast(intervals.schema(k).dataType).as(s"__g_$k")): _*)
    val ivs = intervals.filter(s <= e)
    def boundary(t: Column, sign: Int) = ivs.select(
      Seq(t.as("__t"), lit(1).as("__k"), lit(sign).as("__sign"), lit(0L).as("__cnt")) ++
        sumCols.map(c => lit(null).cast(points.schema(c).dataType).as(s"__v_$c")) ++
        groupKeys.map(k => ivs(k).as(s"__g_$k")): _*)
    val union = ptRows.unionByName(boundary(e, 1)).unionByName(boundary(s - 1, -1))
      .withColumn("__bin", binId(col("__t"), binWidth))

    val win = Window.partitionBy("__bin").orderBy("__t", "__k")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withPrefix = union
      .withColumn("__pc", sum(col("__cnt")).over(win))
      .withColumns(sumCols.map(c => s"__pv_$c" -> sum(col(s"__v_$c")).over(win)).toMap)

    // Bin-level exclusive prefix: totals per bin, then a running sum over
    // the (small) bins table, joined back so each boundary's prefix
    // becomes global. AQE broadcasts the bins side when it is tiny.
    val binWin = Window.orderBy("__bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val binPrefix = union.groupBy("__bin")
      .agg(sum(col("__cnt")).as("__bc"),
        sumCols.map(c => sum(col(s"__v_$c")).as(s"__bv_$c")): _*)
      .select(
        Seq(col("__bin"), coalesce(sum(col("__bc")).over(binWin), lit(0L)).as("__cb")) ++
          sumCols.map(c => sum(col(s"__bv_$c")).over(binWin).as(s"__cb_$c")): _*)

    withPrefix
      .filter(col("__sign") =!= 0)
      .join(binPrefix, "__bin")
      .groupBy(groupKeys.map(k => col(s"__g_$k").as(k)): _*)
      .agg(
        sum(col("__sign") * (col("__pc") + col("__cb"))).as("n_pairs"),
        sumCols.map(c =>
          sum(col("__sign") *
            (coalesce(col(s"__pv_$c"), lit(0)) + coalesce(col(s"__cb_$c"), lit(0))))
            .as(s"sum_$c")): _*)
      .filter(col("n_pairs") > 0)
  }

  /** All pairs of left/right rows whose closed intervals overlap
    * (lStart ≤ rEnd AND rStart ≤ lEnd), same bin-equi-join shape with
    * both sides exploded. A pair sharing k bins would meet k times; the
    * first-shared-bin guard (`bin == max(floor(lStart), floor(rStart))`)
    * keeps exactly one copy WITHOUT a distinct shuffle. */
  def overlap(
      left: DataFrame,
      right: DataFrame,
      lStartCol: String,
      lEndCol: String,
      rStartCol: String,
      rEndCol: String,
      binWidth: Long,
      extraKeys: Seq[(String, String)] = Nil,
  ): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val ls = axis(left, lStartCol)
    val le = axis(left, lEndCol)
    val rs = axis(right, rStartCol)
    val re = axis(right, rEndCol)

    val l = left
      .filter(ls <= le)
      .withColumn("__lbin", explode(sequence(binId(ls, binWidth), binId(le, binWidth))))
    val r = right
      .filter(rs <= re)
      .withColumn("__rbin", explode(sequence(binId(rs, binWidth), binId(re, binWidth))))

    val keyCond = extraKeys
      .map { case (lk, rk) => l(lk) === r(rk) }
      .foldLeft(l("__lbin") === r("__rbin"))(_ && _)
    val lsA = axis(left, lStartCol)
    val leA = axis(left, lEndCol)
    val rsA = axis(right, rStartCol)
    val reA = axis(right, rEndCol)
    l.join(r, keyCond)
      .filter(lsA <= reA && rsA <= leA)
      .filter(col("__lbin") === binId(greatest(lsA, rsA), binWidth))
      .drop("__lbin", "__rbin")
  }
}
