package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the event-pipeline operators: the
  * streaming analog of meerpipe's per-observation processing loop (each new
  * observation triggers incremental computation).
  */
object EventStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)

  case class SessionOut(user_id: Long, start: Timestamp, end: Timestamp, n_events: Long, sum_value: Double)

  /** Running-session state (field names avoid clashing with generated
    * aggregate method names like `sum`). */
  case class SessionState(startMs: Long, endMs: Long, n: Long, total: Double)

  /** Watermarked sliding-window aggregation (decimation-at-cadence analog).
    * Late data beyond the watermark is dropped, state is bounded. */
  def windowedStats(events: DataFrame, windowDur: String = "10 minutes",
                    slide: String = "5 minutes", watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slide), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Inactivity-gap sessionization with explicit state
    * (flatMapGroupsWithState): emits a session when the gap exceeds
    * `gapSeconds`, or when the event-time watermark passes the open
    * session's gap horizon (EventTimeTimeout) — so a user who goes quiet
    * still gets their final session emitted and their state entry
    * removed; state stays bounded by the active-user population.
    * Late events inside an open session extend it monotonically
    * (max end / min start): a cross-batch straggler can never move the
    * session end backwards and corrupt later gap checks. */
  def sessionized(events: Dataset[Event], gapSeconds: Long,
                  watermark: String = "30 minutes"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMs = gapSeconds * 1000L

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          def close(st: SessionState) =
            SessionOut(userId, new Timestamp(st.startMs), new Timestamp(st.endMs), st.n, st.total)
          if (state.hasTimedOut) {
            // watermark passed the gap horizon: flush and drop the state
            val out = state.getOption.map(close).iterator
            state.remove()
            out
          } else {
            // Sort this micro-batch's events by time (micro-batches are small).
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val out = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(st) if t - st.endMs <= gapMs =>
                  cur = Some(SessionState(math.min(st.startMs, t), math.max(st.endMs, t),
                    st.n + 1, st.total + e.value))
                case Some(st) =>
                  out += close(st)
                  cur = Some(SessionState(t, t, 1L, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1L, e.value))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.endMs + gapMs)
            }
            out.result().iterator
          }
      }
  }

  /** Streaming exact dedup: drop events with a duplicate id inside the
    * watermark horizon (state bounded by the watermark — the streaming
    * form of Dedup.exact). */
  def deduplicated(events: DataFrame, watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming NEAR-dup drop: fingerprint each document with SimHash (the
    * shuffle-free native SimHashBits fold over its distinct words) and
    * drop any doc whose fingerprint collided inside the watermark horizon
    * — the streaming form of `Dedup.simhash` blocking, with state bounded
    * by the watermark. Collision at `bits` width means the same sign
    * pattern of word-hash votes ≈ near-identical word set. Default 32
    * bits: at 16 the 65536-value space birthday-collides after a few
    * hundred distinct docs in the watermark horizon and silently drops
    * unrelated documents; 32 bits pushes ~50% collision odds past ~77k
    * distinct docs per horizon. Size `bits` (and the watermark) to the
    * stream's distinct-doc rate.
    *
    * Deliberate tradeoff vs the batch pipeline: per-event decisions must
    * be O(1) with bounded state, so there is no candidate verification or
    * cluster resolution here — run `Dedup.dedupCorpus` over the archived
    * corpus for the exact drop set; this stage just keeps the stream's
    * obvious repeats from fanning out downstream. `docs` needs (`ts`,
    * `textCol`).
    *
    * Drops are OBSERVABLE: every micro-batch reports
    * `neardup_in.rows_in` (docs entering the dedup) and
    * `neardup_out.rows_out` (docs surviving it) through
    * `StreamingQueryProgress.observedMetrics` — `rows_in − rows_out` is
    * the per-batch drop count — plus
    * `neardup_collisions.fp_collision_hint`: distinct texts minus
    * distinct fingerprints in the batch, i.e. how many DISTINCT
    * documents collapsed onto an already-taken fingerprint. Exact
    * repeats don't move it; a hint creeping up with a steady input mix
    * is the birthday bound degrading (unrelated docs colliding) — the
    * false-drop monitor round-3/4 review asked for. HLL-approximate at
    * huge batch cardinalities, exact at the cardinalities where single
    * collisions are countable. */
  def deduplicatedNear(docs: DataFrame, textCol: String, bits: Int = 32,
                       watermark: String = "30 minutes"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .observe("neardup_in", count(lit(1)).as("rows_in"))
      .withColumn("__simhash", graft.expressions.SimHashBits.of(
        array_distinct(graft.functions.TextFns.words(col(textCol))), bits))
      .observe("neardup_collisions",
        (approx_count_distinct(xxhash64(col(textCol))) -
          approx_count_distinct(col("__simhash"))).as("fp_collision_hint"))
      .dropDuplicatesWithinWatermark("__simhash")
      .drop("__simhash")
      .observe("neardup_out", count(lit(1)).as("rows_out"))

  case class NearDupDoc(doc_id: Long, ts: Timestamp, text: String)
  // not `private`: encoder-generated (Janino) projections live outside this
  // class and cannot touch private members
  case class NearDupKeyed(doc_id: Long, ts: Timestamp, text: String,
                          sig: scala.collection.Seq[String], bucket: String)
  case class NearDupSeen(sigs: scala.collection.Seq[scala.collection.Seq[String]],
                         maxTsMs: Long)

  /** Streaming near-dup drop with MinHash state-store verification — the
    * threshold-based sibling of [[deduplicatedNear]]: where the SimHash
    * variant drops only exact fingerprint collisions, this one estimates
    * Jaccard similarity from an 8-component MinHash signature and drops a
    * doc when it agrees with a recently-seen signature on ≥ `threshold`
    * of components (granularity 1/`numHashes`).
    *
    * Design: docs key by their FIRST minhash component (their LSH bucket),
    * so a true near-dup pair lands on the same state-store key with
    * probability ≈ its Jaccard similarity — recall ≈ J for J-similar docs,
    * and one shuffle by bucket. Within a bucket the full signature is
    * verified against up to `maxStored` stored signatures (FIFO cap, so a
    * hot bucket has bounded state and O(maxStored) work per doc), which is
    * what keeps UNRELATED docs that happen to share the bucket from being
    * dropped. State expires via EventTimeTimeout one `horizonMs` past the
    * bucket's newest doc. Docs too short to fingerprint (< `shingleN`
    * words) bypass the stateful stage and are always kept.
    *
    * Same disclosed tradeoff as [[deduplicatedNear]]: per-event O(1)-ish
    * decisions with bounded state, no cluster resolution — the archived
    * corpus's exact drop set still comes from `Dedup.dedupCorpus`.
    * `docs` needs (`doc_id`, `ts`, `textCol`). */
  def deduplicatedNearMinHash(docs: DataFrame, textCol: String,
                              numHashes: Int = 8, threshold: Double = 0.5,
                              maxStored: Int = 64, shingleN: Int = 3,
                              watermark: String = "30 minutes",
                              horizonMs: Long = 30L * 60 * 1000): Dataset[NearDupDoc] = {
    import docs.sparkSession.implicits._
    require(threshold > 0.0 && threshold <= 1.0, s"threshold must be in (0,1], got $threshold")
    val base = docs
      .withWatermark("ts", watermark)
      .select(
        col("doc_id").cast("long").as("doc_id"),
        col("ts"),
        col(textCol).cast("string").as("text"))
      .withColumn("sig", graft.expressions.MinHashSig.of(
        graft.functions.TextFns.shingles(col("text"), shingleN), numHashes))
    // un-fingerprintable docs (no shingles) skip the stateful stage: they
    // cannot match anything, and routing them through one sentinel key
    // would funnel every short doc onto a single hot state partition
    val bypass = base.filter(col("sig").isNull)
      .select("doc_id", "ts", "text").as[NearDupDoc]
    val survivors = base.filter(col("sig").isNotNull)
      .withColumn("bucket", element_at(col("sig"), 1))
      .as[NearDupKeyed]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[NearDupSeen, NearDupDoc](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: String, rows: Iterator[NearDupKeyed], state: GroupState[NearDupSeen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // deterministic within-batch order (micro-batches are small)
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            var seen = state.getOption.map(_.sigs.toVector).getOrElse(Vector.empty)
            var maxTs = state.getOption.map(_.maxTsMs).getOrElse(Long.MinValue)
            val out = Seq.newBuilder[NearDupDoc]
            sorted.foreach { r =>
              val dup = seen.exists { s =>
                s.iterator.zip(r.sig.iterator).count { case (a, b) => a == b } >=
                  math.ceil(threshold * numHashes)
              }
              if (!dup) {
                out += NearDupDoc(r.doc_id, r.ts, r.text)
                seen = (seen :+ r.sig).takeRight(maxStored)
              }
              maxTs = math.max(maxTs, r.ts.getTime)
            }
            state.update(NearDupSeen(seen, maxTs))
            state.setTimeoutTimestamp(maxTs + horizonMs)
            out.result().iterator
          }
      }
    survivors.union(bypass)
  }

  case class FpDoc(doc_id: Long, ts: Timestamp, fp: Long)
  case class FpKeyed(doc_id: Long, ts: Timestamp, fp: Long, bucket: Long)
  case class FpSeen(fps: scala.collection.Seq[Long], maxTsMs: Long)

  /** Streaming FINGERPRINT near-dup drop — the live twin of
    * `Dedup.dedupCorpusByHammingHash` for 64-bit perceptual hashes
    * (image aHash/dHash/pHash, AudioHash, SimHash): docs key by their
    * LOW 16-bit fingerprint chunk (band 0 of the batch operator's
    * banded LSH), so a pair within Hamming distance d co-keys with
    * probability C(48,d)/C(64,d) (all flipped bits avoid the chunk —
    * 1.0 / 0.75 / 0.56 / 0.42 for d = 0/1/2/3); within the key the full
    * fingerprint is popcount-verified against up to `maxStored` stored
    * hashes (FIFO cap → bounded state and O(maxStored) work per doc),
    * which keeps unrelated chunk-collisions from being dropped. State
    * expires one `horizonMs` past the bucket's newest doc.
    *
    * Same disclosed tradeoff as the text variants: per-event bounded
    * decisions with single-key recall, no cluster resolution — the
    * archived corpus's exact drop set comes from the batch operator,
    * whose pigeonhole recall is perfect. `docs` needs
    * (`doc_id`, `ts`, `fpCol`: long). */
  def deduplicatedNearFingerprint(docs: DataFrame, fpCol: String,
                                  maxDist: Int = 3, maxStored: Int = 64,
                                  watermark: String = "30 minutes",
                                  horizonMs: Long = 30L * 60 * 1000): Dataset[FpDoc] = {
    import docs.sparkSession.implicits._
    docs
      .withWatermark("ts", watermark)
      .select(col("doc_id").cast("long").as("doc_id"), col("ts"),
        col(fpCol).cast("long").as("fp"))
      .withColumn("bucket", col("fp").bitwiseAND(lit(0xffffL)))
      .as[FpKeyed]
      .groupByKey(_.bucket)
      .flatMapGroupsWithState[FpSeen, FpDoc](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, rows: Iterator[FpKeyed], state: GroupState[FpSeen]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
            var seen = state.getOption.map(_.fps.toVector).getOrElse(Vector.empty)
            var maxTs = state.getOption.map(_.maxTsMs).getOrElse(Long.MinValue)
            val out = Seq.newBuilder[FpDoc]
            sorted.foreach { r =>
              val dup = seen.exists(s => java.lang.Long.bitCount(s ^ r.fp) <= maxDist)
              if (!dup) {
                out += FpDoc(r.doc_id, r.ts, r.fp)
                seen = (seen :+ r.fp).takeRight(maxStored)
              }
              maxTs = math.max(maxTs, r.ts.getTime)
            }
            state.update(FpSeen(seen, maxTs))
            state.setTimeoutTimestamp(maxTs + horizonMs)
            out.result().iterator
          }
      }
  }

  /** File-source stream over the events layout (parquet dir → stream).
    * `ts` normalizes to micros TimestampType whatever physical type the
    * files carry — TIMESTAMP(NANOS) (readable only as long; rounds 1-5)
    * or naive TIMESTAMP(MICROS) (reads as TIMESTAMP_NTZ; round 6+) —
    * mirroring Tables.events. A file source needs its schema declared up
    * front, so probe one batch read of the same dir (cheap: footer-only). */
  def fromParquetDir(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val probed = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(probed).parquet(dir)
    probed("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // timezone-invariant NTZ→UTC conversion with the UTC-session
        // fast path (see Tables.ntzCastSql)
        stream.withColumn("ts", expr(graft.sources.Tables.ntzCastSql(spark)))
      case _ => stream
    }
  }

  /** Stream-static enrichment: join a live stream against a broadcast
    * dimension table (re-read per micro-batch for file sources, so
    * dimension updates flow in). No stream state at all — the cheapest
    * enrichment shape; use the interval join below only when the
    * dimension itself is a stream. */
  def enrichedStatic(events: DataFrame, dim: DataFrame, keys: Seq[String]): DataFrame =
    events.join(broadcast(dim), keys)

  /** Watermarked stream-stream interval join: each event joins config
    * records of the same key whose validity window (`cfg_ts`,
    * `cfg_ts + validSeconds`) covers the event time. Both sides carry
    * watermarks and the join condition bounds event time against config
    * time in both directions, so state on each side is provably
    * droppable — the streaming analog of the as-of/config-validity match
    * (`dlyfix.getcorrection`), with bounded state at any scale.
    *
    * `configs` needs columns (cfg_user_id, cfg_ts, ...). */
  def enrichedByConfig(events: DataFrame, configs: DataFrame, validSeconds: Long,
                       watermark: String = "30 minutes"): DataFrame = {
    val ev = events.withWatermark("ts", watermark)
    val cfg = configs.withWatermark("cfg_ts", watermark)
    ev.join(cfg,
      expr(s"""
        user_id = cfg_user_id AND
        ts >= cfg_ts AND
        ts < cfg_ts + interval $validSeconds seconds
      """))
  }

  /** Streaming orbital-phase scoring: tag each live event with its binary
    * phase (full eccentric model — FB or PB parameterized) and aggregate
    * per phase bin per watermarked window. The phase math is stateless
    * per-row column code (Kepler solve included, via the native
    * KeplerSolve expression), so it composes with a streaming source
    * exactly like any builtin — the streaming analog of re-folding each
    * new observation onto the ephemeris as it arrives
    * (`get_binphase`, binary_tools.py:76).
    */
  def orbitalScored(events: DataFrame, pars: graft.functions.Orbital.BinaryPars,
                    bins: Int = 20, windowDur: String = "1 hour",
                    watermark: String = "30 minutes"): DataFrame = {
    graft.expressions.KeplerSolve.register(events.sparkSession)
    events
      .withWatermark("ts", watermark)
      .withColumn("phase", graft.functions.Orbital.binPhase(col("ts"), pars))
      .withColumn("phase_bin", floor(col("phase") * bins).cast("long"))
      .groupBy(window(col("ts"), windowDur), col("phase_bin"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
  }

  /** One surviving Misra-Gries counter for a closed window: `min_count`
    * undercounts the true frequency by at most
    * `group_total / (capacity + 1)` (group = this window's shard). */
  case class WindowHH(window_start: Timestamp, shard: Int, key: String,
                      min_count: Long, group_total: Long)

  /** Misra-Gries summary state for one open (window, shard). */
  case class HHState(counters: Map[String, Long], total: Long)

  case class WindowTopK(window_start: Timestamp, rank: Int, event_id: Long,
                        user_id: Long, value: Double)
  private[streaming] case class TopKState(heap: Seq[(Double, Long, Long)])

  /** Streaming per-window top-k by VALUE under BOUNDED state — the
    * leaderboard counterpart to [[windowedHeavyHitters]]' frequency
    * sketch: each open tumbling window holds at most k (value, event_id,
    * user_id) entries (a bounded min-heap kept as a sorted Seq — k is
    * small by definition), flushed in rank order exactly once when the
    * watermark passes the window end. An exact windowed rank would need
    * every event of the window in state; this keeps k rows per OPEN
    * window regardless of event rate. Ties break to the smaller
    * event_id, so results are deterministic and match the batch
    * row_number formulation over the same window. */
  def windowedTopK(events: Dataset[Event], k: Int, windowSeconds: Long,
                   watermark: String = "30 minutes"): Dataset[WindowTopK] = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(windowSeconds > 0, s"windowSeconds must be positive, got $windowSeconds")
    import events.sparkSession.implicits._
    val windowMs = windowSeconds * 1000L
    // ordering: better = higher value, then smaller event_id
    def better(a: (Double, Long, Long), b: (Double, Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

    events
      .withWatermark("ts", watermark)
      .groupByKey(e => Math.floorDiv(e.ts.getTime, windowMs) * windowMs)
      .flatMapGroupsWithState[TopKState, WindowTopK](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (windowStart: Long, rows: Iterator[Event], state: GroupState[TopKState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.iterator.flatMap { st =>
              st.heap.zipWithIndex.map { case ((v, eid, uid), i) =>
                WindowTopK(new Timestamp(windowStart), i + 1, eid, uid, v)
              }
            }
            state.remove()
            out
          } else {
            var heap = state.getOption.map(_.heap.toVector).getOrElse(Vector.empty)
            rows.foreach { e =>
              val cand = (e.value, e.event_id, e.user_id)
              if (heap.length < k) {
                heap = (heap :+ cand).sortWith(better)
              } else if (better(cand, heap.last)) {
                heap = (heap.init :+ cand).sortWith(better)
              }
            }
            state.update(TopKState(heap))
            state.setTimeoutTimestamp(
              math.max(windowStart + windowMs, state.getCurrentWatermarkMs + 1))
            Iterator.empty
          }
      }
  }

  /** Streaming per-window heavy hitters with BOUNDED state: the exact
    * `groupBy(window, key).count()` form needs one state entry per
    * distinct key per open window — fine for event types, fatal for a
    * high-cardinality key (user ids, URLs). This keeps at most
    * `capacity` Misra-Gries counters per (window, shard): increment a
    * present key, insert while there's room, otherwise decrement ALL
    * counters (evicting zeros) — every surviving count undercounts
    * truth by at most group_total/(capacity+1), so any key with
    * frequency above that bound is GUARANTEED to survive. Each window
    * flushes exactly once, when the watermark passes its end (late rows
    * beyond the watermark were already dropped, so no post-flush
    * reopen — unlike [[funnel]]'s idle-horizon episodes).
    *
    * `shards` is the parallelism lever: grouping by window alone would
    * funnel the whole stream through ONE task per open window. Keys
    * hash into `shards` independent summaries, so the stateful stage
    * runs `shards`-wide and — because each key lives in exactly one
    * shard — per-key counts never split: results need no merge, only
    * the undercount bound is per-shard. */
  def windowedHeavyHitters(events: Dataset[Event], keyOf: Event => String,
                           windowSeconds: Long, capacity: Int,
                           watermark: String = "30 minutes",
                           shards: Int = 1): Dataset[WindowHH] = {
    require(windowSeconds > 0, s"windowSeconds must be positive, got $windowSeconds")
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")
    require(shards >= 1, s"shards must be >= 1, got $shards")
    import events.sparkSession.implicits._
    val windowMs = windowSeconds * 1000L

    events
      .withWatermark("ts", watermark)
      .groupByKey(e => (Math.floorDiv(e.ts.getTime, windowMs) * windowMs,
        Math.floorMod(keyOf(e).hashCode, shards)))
      .flatMapGroupsWithState[HHState, WindowHH](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (group: (Long, Int), rows: Iterator[Event], state: GroupState[HHState]) =>
          val (windowStart, shard) = group
          if (state.hasTimedOut) {
            val out = state.getOption.iterator.flatMap { st =>
              st.counters.toSeq.sortBy { case (k, n) => (-n, k) }.map { case (k, n) =>
                WindowHH(new Timestamp(windowStart), shard, k, n, st.total)
              }
            }
            state.remove()
            out
          } else {
            var st = state.getOption.getOrElse(HHState(Map.empty, 0L))
            val counters = scala.collection.mutable.Map(st.counters.toSeq: _*)
            var total = st.total
            rows.foreach { e =>
              total += 1
              val k = keyOf(e)
              counters.get(k) match {
                case Some(n) => counters(k) = n + 1
                case None if counters.size < capacity => counters(k) = 1L
                case None => // decrement-all: the Misra-Gries eviction step
                  counters.keys.toSeq.foreach { c =>
                    val n = counters(c) - 1
                    if (n <= 0) counters.remove(c) else counters(c) = n
                  }
              }
            }
            state.update(HHState(counters.toMap, total))
            // clamp: a within-watermark straggler for a window whose end
            // the watermark already passed must still get a LEGAL horizon
            // (setTimeoutTimestamp below the watermark throws)
            state.setTimeoutTimestamp(
              math.max(windowStart + windowMs, state.getCurrentWatermarkMs + 1))
            Iterator.empty
          }
      }
  }

  /** Per-user funnel result: how deep into the ordered step list the
    * user's strictly-increasing first-occurrence chain reaches. */
  case class FunnelOut(user_id: Long, depth: Int)

  /** Per-step first-occurrence millis (Long.MaxValue = unseen) + the
    * latest event time, which anchors the idle-timeout horizon. */
  case class FunnelState(firstMs: Seq[Long], lastMs: Long)

  /** Streaming form of [[graft.operators.Funnel]], with EPISODE
    * semantics: tracks each user's FIRST occurrence time per step and
    * emits the funnel depth once the watermark passes their idle
    * horizon (quiet for `idleSeconds`) — one row per activity episode,
    * exactly like [[sessionized]] emits one row per session. Within an
    * episode, late events inside the watermark can still lower a
    * first-occurrence time (depth is only computed at flush), so an
    * episode's chain matches the batch operator run on that episode's
    * events. A user who resumes AFTER flushing starts a fresh episode —
    * the price of purging state; batch `Funnel.steps` is the
    * whole-history form. State is a fixed `steps.length + 1` longs per
    * active user, purged on flush: bounded by the active-user
    * population, never by stream length. */
  /** Streaming distribution drift: per event-time window, the chi-square
    * statistic of the window's category mix against a FIXED baseline
    * mixture (shares summing to 1 — yesterday's corpus, the contract
    * distribution). The batch `Profile.categoricalDrift` compares two
    * snapshots; this watches a live stream against a reference and emits
    * one (window, chi2, n) row when the watermark closes the window.
    *
    * Streaming constraint shapes the plan: append-mode allows ONE
    * aggregation, and expected counts need the window total — so the
    * category counts are conditional sums inside a single
    * groupBy(window) (the baseline's category list is known at plan
    * time), and the chi-square is a pure projection after the aggregate.
    * Categories outside the baseline list count toward `n_other` (their
    * expected share is 0 — any appearance is infinite-signal, reported
    * as the separate count rather than folded into chi2). State is one
    * row of K+2 longs per OPEN window. */
  def windowedDrift(events: DataFrame, baseline: Seq[(String, Double)],
                    catCol: String, windowDur: String = "10 minutes",
                    watermark: String = "30 minutes"): DataFrame = {
    require(baseline.nonEmpty, "baseline mixture must be non-empty")
    require(math.abs(baseline.map(_._2).sum - 1.0) < 1e-9,
      s"baseline shares must sum to 1, got ${baseline.map(_._2).sum}")
    require(baseline.forall(_._2 > 0), "baseline shares must be positive")
    require(baseline.map(_._1).distinct.size == baseline.size,
      "duplicate category in baseline")
    // positional count aliases: category VALUES are data and must never
    // ride through a column-name parser (a dotted category would parse
    // as a struct-field access; duplicates would alias-collide)
    val counts = baseline.zipWithIndex.map { case ((cat, _), i) =>
      sum(when(col(catCol) === cat, 1L).otherwise(0L)).as(s"__n_$i")
    }
    val other = sum(when(col(catCol).isInCollection(baseline.map(_._1)), 0L)
      .otherwise(1L)).as("n_other")
    val agged = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur))
      .agg(counts.head, (counts.tail :+ other :+ count(lit(1)).as("n_total")): _*)
    val inBase = baseline.indices.map(i => col(s"__n_$i"))
      .reduce(_ + _)
    val chi2 = baseline.zipWithIndex.map { case ((_, share), i) =>
      val exp = lit(share) * inBase.cast("double")
      val d = col(s"__n_$i").cast("double") - exp
      when(exp > 0.0, d * d / exp).otherwise(lit(0.0))
    }.reduce(_ + _)
    agged
      .withColumn("chi2", chi2)
      .select(col("window"), col("chi2"), col("n_total"), col("n_other"))
  }

  /** D21: streaming per-key windowed TREND — the live twin of q65/q128's
    * batch fits: per (tumbling window, key), the least-squares slope and
    * start-of-window intercept of `valueCol` against event time, from
    * decomposable moment sums (the `TimingFit` normal-equation shape —
    * sums merge, so the whole fit is ONE watermarked streaming
    * aggregation with five doubles of state per open (window, key); no
    * mapGroupsWithState, no per-event state). The drifting-calibration
    * alarm shape: a sensor whose slope_per_sec walks away from 0 is
    * drifting within the window, visible before the window even closes.
    *
    * Numerics: x is the event's offset WITHIN its window (ts mod the
    * window length — exact for epoch-aligned tumbling windows, which is
    * why the duration is taken in seconds rather than a free-form
    * interval string), keeping x in [0, windowSeconds) so the moment
    * difference n·Σx² − (Σx)² never catastrophically cancels the way
    * epoch-scale x would (~14 digits lost at 10-minute windows).
    * Moments are IEEE double sums — streaming carries no oracle; the
    * decimal-exact gate lives on the batch twins (q65/q128).
    * `slope_per_sec` is null for degenerate windows (n < 2 or a single
    * distinct timestamp) — degeneracy is detected STRUCTURALLY
    * (min(x) = max(x), exact on the integer micros), not by testing the
    * float denominator against zero: n·Σx² − (Σx)² of n equal x's is a
    * rounding-dust value ~1e-10 rather than 0.0, and tiny/tiny would
    * emit a garbage finite slope precisely on the windows that must
    * report null. `pmod` (not `%`) keeps x in [0, windowSeconds) for
    * pre-1970 timestamps too, so `intercept_at_start` stays the
    * window-START intercept on historical replays. */
  def windowedTrend(events: DataFrame, keyCol: String, valueCol: String,
                    windowSeconds: Long = 600L,
                    watermark: String = "30 minutes"): DataFrame = {
    require(windowSeconds > 0, s"windowSeconds must be positive, got $windowSeconds")
    val us = windowSeconds * 1000000L
    val xUs = pmod(unix_micros(col("ts")), lit(us))
    val x = xUs.cast("double") / lit(1e6)
    val y = col(valueCol).cast("double")
    val agged = events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), s"$windowSeconds seconds"), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(x).as("sx"), sum(y).as("sy"),
        sum(x * x).as("sxx"), sum(x * y).as("sxy"),
        min(xUs).as("x_min_us"), max(xUs).as("x_max_us"))
    val n = col("n").cast("double")
    val denom = n * col("sxx") - col("sx") * col("sx")
    val degenerate = col("n") < lit(2L) ||
      col("x_min_us") === col("x_max_us") || denom === lit(0.0)
    val slope = when(degenerate, lit(null).cast("double"))
      .otherwise((n * col("sxy") - col("sx") * col("sy")) / denom)
    agged
      .withColumn("slope_per_sec", slope)
      .withColumn("intercept_at_start",
        when(col("slope_per_sec").isNull, lit(null).cast("double"))
          .otherwise(col("sy") / n - col("slope_per_sec") * (col("sx") / n)))
      .select(col("window"), col(keyCol), col("n"),
        col("slope_per_sec"), col("intercept_at_start"))
  }

  /** D22: streaming IVF+PQ index ingest — the live half of the
    * train-once/serve-many index lifecycle (`IvfPq.train` → `save` →
    * `load` → THIS): newly arriving vectors are routed to their coarse
    * cluster and PQ-encoded against the loaded model's codebooks as ONE
    * STATELESS projection (`IvfPq.encodeStateless` — codebooks are plan
    * literals, distances fold per row), so the encoded stream appends
    * straight into the index's partition layout in any output mode, with
    * no state store, no watermark requirement, at line rate. The
    * timestamp column rides along for downstream windowed audits.
    * Same bounded divergence disclosure as encodeStateless vs the batch
    * path (ArgMaxPack's ~2^-48 tie window). */
  def ivfIngested(vectors: DataFrame, tsCol: String, idCol: String,
                  vecCol: String, model: graft.operators.IvfPq.Model): DataFrame =
    graft.operators.IvfPq.encodeStateless(vectors, idCol, vecCol, model,
      keep = Seq(tsCol))

  /** D23: streaming index-health monitor — per (tumbling window, coarse
    * cluster) ingest counts over the SAME stateless assignment as
    * [[ivfIngested]]. Cluster balance is the index operator's retrain
    * signal: a cluster absorbing a disproportionate share of new vectors
    * means the coarse quantizer no longer matches the data distribution
    * (probe lists balloon → recall and latency drift). One watermarked
    * windowed aggregation; state is one count per open (window, cluster),
    * bounded by nlist. */
  def ivfClusterBalance(vectors: DataFrame, tsCol: String, idCol: String,
                        vecCol: String, model: graft.operators.IvfPq.Model,
                        windowLength: String = "10 minutes",
                        watermark: String = "30 minutes"): DataFrame =
    ivfIngested(vectors, tsCol, idCol, vecCol, model)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col("cluster"))
      .agg(count(lit(1)).as("n_ingested"))

  /** Built-in `session_window` sessionization on a STREAM — the
    * one-aggregation form of [[sessionized]] (which uses explicit
    * flatMapGroupsWithState for custom state/emission control): Spark
    * merges a user's session windows inside the aggregate, emits a
    * session once the watermark passes its end (last event + gap), and
    * drops its state. Same operator call as batch q76 — the API is the
    * point: one sessionization declaration, both execution modes. */
  def sessionWindowed(events: DataFrame, gap: String = "30 minutes",
                      watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"), col("sw.start").as("start"), col("sw.end").as("end"),
        col("n_events"), col("sum_value"))

  case class LatestOut(user_id: Long, event_type: String, ts: Timestamp,
                       event_id: Long, value: Double)
  private[streaming] case class LatestState(tsMs: Long, eventId: Long,
                                            value: Double, lastMs: Long)

  /** Streaming CDC latest-state: per (user, event_type) key, the change
    * with the greatest (ts, event_id) — the streaming form of
    * `operators.Upsert.latest` (batch is the full-snapshot form). Emits
    * a key's latest row once the watermark passes its idle horizon
    * (quiet for `idleSeconds`), then purges — so state is ONE small
    * record per ACTIVE key, bounded by the live-key population, never by
    * stream length. A key that changes again after flushing opens a new
    * episode and will re-emit its (newer) latest row; downstream
    * consumers keep the last emission per key (idempotent upsert into
    * the serving store — the standard CDC sink contract).
    *
    * Late events inside the watermark fold in by the same max-(ts, id)
    * rule, so an episode's winner matches `Upsert.latest` run on that
    * episode's rows: a straggler with an older version can never
    * overwrite a newer state. */
  def latestState(events: Dataset[Event], idleSeconds: Long,
                  watermark: String = "30 minutes"): Dataset[LatestOut] = {
    require(idleSeconds > 0,
      s"idleSeconds must be positive (a non-positive horizon lands below the watermark and kills the query), got $idleSeconds")
    import events.sparkSession.implicits._
    val idleMs = idleSeconds * 1000L
    events
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[LatestState, LatestOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Long, String), rows: Iterator[Event], state: GroupState[LatestState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(st =>
              LatestOut(key._1, key._2, new Timestamp(st.tsMs), st.eventId, st.value)).iterator
            state.remove()
            out
          } else {
            var st = state.getOption.getOrElse(
              LatestState(Long.MinValue, Long.MinValue, 0.0, Long.MinValue))
            rows.foreach { e =>
              val t = e.ts.getTime
              if (t > st.lastMs) st = st.copy(lastMs = t)
              // max by (ts, event_id): same total order as Upsert.latest
              if (t > st.tsMs || (t == st.tsMs && e.event_id > st.eventId)) {
                st = st.copy(tsMs = t, eventId = e.event_id, value = e.value)
              }
            }
            state.update(st)
            state.setTimeoutTimestamp(
              math.max(st.lastMs + idleMs, state.getCurrentWatermarkMs + 1))
            Iterator.empty
          }
      }
  }

  def funnel(events: Dataset[Event], steps: Seq[String], idleSeconds: Long,
             watermark: String = "30 minutes"): Dataset[FunnelOut] = {
    require(steps.nonEmpty, "at least one funnel step required")
    require(steps.distinct == steps, "funnel steps must be distinct")
    require(idleSeconds > 0,
      s"idleSeconds must be positive (a non-positive horizon lands below the watermark and kills the query), got $idleSeconds")
    import events.sparkSession.implicits._
    val idleMs = idleSeconds * 1000L
    val stepIdx = steps.zipWithIndex.toMap

    def depthOf(firstMs: Seq[Long]): Int = {
      var depth = 0
      var prev = Long.MinValue
      var i = 0
      var chained = true
      while (chained && i < firstMs.length) {
        if (firstMs(i) != Long.MaxValue && firstMs(i) > prev) {
          depth += 1; prev = firstMs(i)
        } else chained = false
        i += 1
      }
      depth
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(st => FunnelOut(userId, depthOf(st.firstMs))).iterator
            state.remove()
            out
          } else {
            val st0 = state.getOption
              .getOrElse(FunnelState(Seq.fill(steps.length)(Long.MaxValue), Long.MinValue))
            val first = st0.firstMs.toArray
            var last = st0.lastMs
            rows.foreach { e =>
              val t = e.ts.getTime
              if (t > last) last = t
              stepIdx.get(e.event_type).foreach { i =>
                if (t < first(i)) first(i) = t
              }
            }
            val st = FunnelState(first.toSeq, last)
            state.update(st)
            // clamp like windowedHeavyHitters: a within-watermark
            // straggler whose idle horizon already passed must still get
            // a legal timeout (setTimeoutTimestamp below the watermark
            // throws and kills the query)
            state.setTimeoutTimestamp(
              math.max(last + idleMs, state.getCurrentWatermarkMs + 1))
            Iterator.empty
          }
      }
  }

  /** Streaming per-window approximate distinct count under BOUNDED state:
    * one Apache DataSketches HLL sketch per OPEN tumbling window (fixed
    * ~KB at `lgConfigK`, the same sketch family as the batch
    * `Profile.distinctSketches` — stream and batch estimates agree and
    * their sketches union), where exact `COUNT(DISTINCT key)` state
    * grows with the window's distinct-key population (fatal for user-id
    * / URL cardinalities). Append mode: each window emits exactly once
    * when the watermark passes its end, with the estimate AND the
    * binary sketch (mergeable downstream — union windows into
    * days/weeks without rescanning the stream). */
  def windowedDistinct(events: DataFrame, keyCol: String,
                       windowDur: String = "10 minutes",
                       watermark: String = "30 minutes",
                       lgConfigK: Int = 12): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur))
      .agg(hll_sketch_agg(col(keyCol), lit(lgConfigK)).as("distinct_sketch"))
      .select(col("window"),
        hll_sketch_estimate(col("distinct_sketch")).as("n_distinct_est"),
        col("distinct_sketch"))

  /** Streaming benchmark-decontamination tagger: flag documents on a
    * live stream whose word shingles might overlap the (static) eval
    * benchmark — the streaming face of `Corpus.decontaminateBloom`. The
    * benchmark collapses to a driver-built Bloom filter ONCE at stream
    * construction (~1.2 bytes/shingle at 1% fpp); the stream side is a
    * pure STATELESS map (`exists` short-circuits on the first
    * might-contain hit), so throughput is line-rate and there is no
    * state store at all.
    *
    * `maybe_contaminated` is a PREFILTER verdict: false ⇒ provably
    * clean (Bloom filters have no false negatives), true ⇒ contaminated
    * OR an ~fpp false positive. Route the (rare) positives to the batch
    * exact verify (`Corpus.decontaminate`) for adjudication — the
    * tag-then-adjudicate split keeps the stream stateless while the
    * final decision stays exact. */
  /** Streaming quality-rule audit: Gopher rule bundle per arriving doc
    * (a pure codegen'd projection — `QualityRules.gopher` composes onto
    * a stream unchanged, zero state) + per-window per-rule failure
    * counts, the live "did the crawler start emitting garbage" monitor
    * next to the batch q97. State is one row per open window (bounded
    * by the watermark); each window emits once in append mode. Output:
    * (window, n_docs, n_keep, fail_word_count, fail_mean_word_len,
    * fail_symbol_ratio, fail_alpha_words, fail_stopwords). Null-text
    * docs count as failing every rule (null booleans are not true),
    * matching the batch bundle's keep semantics. */
  def qualityAudited(docs: DataFrame, textCol: String,
                     windowDur: String = "10 minutes",
                     watermark: String = "30 minutes",
                     params: graft.operators.QualityRules.Params =
                       graft.operators.QualityRules.Params()): DataFrame = {
    def fails(rule: String) =
      sum(when(not(coalesce(col(rule), lit(false))), 1L).otherwise(0L))
    graft.operators.QualityRules.gopher(docs, textCol, params)
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(coalesce(col("keep"), lit(false)), 1L).otherwise(0L)).as("n_keep"),
        fails("rule_word_count").as("fail_word_count"),
        fails("rule_mean_word_len").as("fail_mean_word_len"),
        fails("rule_symbol_ratio").as("fail_symbol_ratio"),
        fails("rule_alpha_words").as("fail_alpha_words"),
        fails("rule_stopwords").as("fail_stopwords"))
  }

  /** Input/output records for [[packedOffsets]]. */
  case class PackDoc(doc_id: Long, source: String, n_tokens: Long)
  case class PackedOffset(source: String, doc_id: Long, start_offset: Long,
                          end_offset: Long, seq_first: Long, seq_last: Long)

  /** Streaming sequence packing: assign each arriving document its global
    * token OFFSET in its source's concatenated stream — the stateful half
    * of `Corpus.packSequences`, so a live ingest pipeline can cut
    * training sequences incrementally instead of re-windowing the whole
    * corpus per batch. State per source is ONE long (the next free
    * offset) — bounded by the source population (hundreds), not by
    * documents, so there is no growth and no timeout to tune. Docs sort
    * by doc_id within each micro-batch (offsets are deterministic given
    * the same micro-batch partitioning; the checkpointed state store
    * advances offsets exactly once, but output delivery to a generic
    * Update-mode sink is AT-LEAST-ONCE — a replayed batch re-emits the
    * same spans, so sinks should upsert by (source, doc_id)); zero- and
    * null-token docs occupy no span and are dropped, as in the batch
    * operator. Emits the doc's [start, end) global span plus the first/
    * last `seqLen`-sequence it touches — downstream slices spans into
    * per-sequence rows STATELESSLY with the batch arithmetic. */
  def packedOffsets(docs: Dataset[PackDoc], seqLen: Long): Dataset[PackedOffset] = {
    import docs.sparkSession.implicits._
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState[Long, PackedOffset](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (source: String, rows: Iterator[PackDoc], state: GroupState[Long]) =>
          var offset = state.getOption.getOrElse(0L)
          val out = rows.toSeq.filter(_.n_tokens > 0).sortBy(_.doc_id).map { d =>
            val start = offset
            val end = start + d.n_tokens
            offset = end
            PackedOffset(source, d.doc_id, start, end,
              start / seqLen, (end - 1) / seqLen)
          }
          state.update(offset)
          out.iterator
      }
  }

  def decontaminatedBloom(docs: DataFrame, benchmark: DataFrame,
                          textCol: String, n: Int = 8,
                          fpp: Double = 0.01): DataFrame = {
    import graft.functions.TextFns
    import graft.operators.Corpus
    require(n >= 1, s"n must be >= 1, got $n")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val benchShingles = benchmark
      .select(explode(TextFns.shingles(col(textCol), n)).as("__s"))
      .distinct()
    val nShingles = benchShingles.count()
    if (nShingles == 0L) docs.withColumn("maybe_contaminated", lit(false))
    else {
      val bloomBytes = Corpus.buildBloomBytes(benchShingles, nShingles, fpp)
      docs.withColumn("maybe_contaminated",
        exists(TextFns.shingles(col(textCol), n),
          s => Corpus.mightContainCol(bloomBytes, s)))
    }
  }
}
