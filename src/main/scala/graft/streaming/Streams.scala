package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators (SURVEY.md §2.7 — post-parity extension;
  * the reference is batch-only, with Airflow re-runs standing in for
  * incremental processing).
  *
  * Every transform here is expressed so the SAME plan runs in batch and
  * streaming: pass a batch DataFrame and it's a normal agg; pass a
  * `readStream` DataFrame and Spark runs it incrementally with state in the
  * state store. That is the Spark-native answer to the reference's
  * "re-run the DAG on new data" model.
  *
  * Scale notes: watermarks bound state (late data beyond the watermark is
  * dropped, state for closed windows is evicted); per-key state in
  * [[sessionStats]] is O(open sessions), not O(events).
  */
object Streams {

  /** Tumbling-window event counts (the q20 plan, streamable). With a
    * streaming source add `.withWatermark("ts", ...)` upstream or use
    * [[withBoundedLateness]]. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), graft.ops.Ops.sumDec(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("sum_value"))

  /** Watermarked variant for unbounded sources: bounds streaming state. */
  def withBoundedLateness(events: DataFrame, lateness: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", lateness)

  /** Gap-based sessionization via the built-in `session_window` — merges
    * events closer than `gap` per user. Works batch and streaming. */
  def sessionize(events: DataFrame, gap: String = "10 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        min(col("ts")).as("session_start"),
        count(lit(1)).as("n_events"),
        graft.ops.Ops.sumDec(col("value")).as("sum_value"))
      .select("user_id", "session_start", "n_events", "sum_value")

  /** X57's streaming face: per-session ordered event-type transcripts via
    * the built-in `session_window` — works batch AND streaming (append
    * mode emits a session's transcript once, when the watermark closes
    * it). The transcript is assembled inside the aggregation (a
    * collect_list buffer bounded by session length — the state any
    * sessionizer carries), sorted by (event-time µs, event_id) structs
    * with the tie-break natively typed, NULL tokens kept as empty slots —
    * the exact [[graft.ops.TimeSeries.assembleSessions]] contract, so the
    * streaming end state hash-matches the batch replay. */
  def sessionTranscripts(events: DataFrame, gap: String,
      token: Column, sep: String = " > "): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(
        min(col("ts")).as("session_start"),
        count(lit(1)).as("n_events"),
        // the shared transcript contract — ONE definition for both faces
        graft.ops.TimeSeries.transcriptAgg("ts", Seq("event_id"), token, sep))
      .select("user_id", "session_start", "n_events", "transcript")

  /** Streaming exact dedup: drop events whose `keys` were already seen,
    * with state bounded by the watermark (an id re-arriving later than
    * `lateness` after its event time is treated as new — the unbounded-state
    * alternative is a non-starter on infinite streams). Batch input degrades
    * to plain dropDuplicates — Spark REJECTS dropDuplicatesWithinWatermark
    * on batch frames, so the dispatch here is what makes the run-same-plan-
    * both-ways contract actually hold. The streaming face of X1. */
  def streamingDedup(events: DataFrame, tsCol: String, lateness: String,
      keys: Seq[String]): DataFrame =
    if (!events.isStreaming) events.dropDuplicates(keys)
    else events.withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** X75's EVENT-TIME streaming face: a watermarked tumbling-window
    * aggregation producing AggView PARTIAL rows
    * `(window_start, keys…, cnt, cnt_c, sum_c, min_c, max_c)` — run in
    * APPEND mode so each window emits exactly once, when the watermark
    * passes its end. Pair with [[graft.ops.AggView.commitPartials]] in
    * `foreachBatch` (segment id = batchId): the engine's window state is
    * what lets LATE data land in the RIGHT event-time bucket — a row
    * arriving after chronologically-later rows still merges into its own
    * window as long as the watermark hasn't closed it, and the window's
    * single finalized emission carries the late row's contribution. Rows
    * later than the watermark are dropped by the engine (the bounded-
    * lateness contract every streaming aggregation needs — the
    * arrival-batch face in [[graft.ops.AggView.commitSegment]] is the
    * unbounded-lateness alternative, trading watermark state eviction
    * for merge-on-read of per-batch partials).
    *
    * The aggregation columns are [[graft.ops.AggView.partialAggs]] —
    * ONE definition shared with the batch face, so the ledger the two
    * faces feed can never disagree with itself. Batch input runs the
    * same plan minus the watermark (the module's run-same-plan contract);
    * note batch emits EVERY window — the caller replays the eviction
    * predicate (window_end ≤ max event time − lateness) when comparing,
    * the q184 oracle pattern. */
  def windowedAggPartials(events: DataFrame, tsCol: String, lateness: String,
      window_ : String, keys: Seq[String],
      measures: Seq[graft.ops.AggView.Measure]): DataFrame = {
    graft.ops.AggView.checkMeasures(events.columns.toIndexedSeq, keys, measures)
    require(!events.columns.contains("window_start"),
      "column name window_start is reserved by windowedAggPartials")
    val src =
      if (events.isStreaming) events.withWatermark(tsCol, lateness) else events
    val aggs = graft.ops.AggView.partialAggs(measures)
    src
      .groupBy(window(col(tsCol), window_) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(col("window.start").as("window_start") +: keys.map(col) ++:
        (col("cnt") +: measures.flatMap(m => Seq(
          col(s"cnt_${m.column}"), col(s"sum_${m.column}"),
          col(s"min_${m.column}"), col(s"max_${m.column}")))): _*)
  }

  /** Stream-static enrichment join: each micro-batch joins to a static
    * dimension table — the standard "decorate the event stream with
    * reference data" shape. Stateless (no watermark, no stream state): the
    * dim is re-resolved per micro-batch, so an overwritten dim parquet is
    * picked up on the next trigger. Broadcast by hint — dimension tables
    * are small by contract; drop the hint for a dim too big to broadcast. */
  def enrichWithStatic(stream: DataFrame, dim: DataFrame,
      keys: Seq[String]): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), keys)

  /** Watermarked stream-stream interval join: (l, r) pairs sharing `keys`
    * with r's event time inside [l.ts − maxDelay, l.ts] — the attribution
    * shape (click ⟵ view within 30 minutes, purchase ⟵ ad impression).
    * On streaming inputs both sides carry watermarks and the two-sided
    * time-range condition is what lets Spark EVICT join state (an
    * unconstrained stream-stream join would buffer both streams forever);
    * state is O(events inside lateness + maxDelay), not O(stream). On
    * batch inputs the same plan is a plain interval join — the
    * run-same-plan-both-ways contract the rest of this module keeps.
    *
    * Non-key columns must not collide (rename upstream — the two sides are
    * usually different projections anyway); the timestamp columns must be
    * distinctly named so the output carries both. Inner join: unmatched
    * rows on either side are dropped. */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, maxDelay: String,
      lateness: String = "1 hour"): DataFrame = {
    require(keys.nonEmpty, "intervalJoin needs at least one key column")
    require(leftTs != rightTs,
      s"timestamp columns must have distinct names, both are '$leftTs'")
    val overlap = (left.columns.toSet intersect right.columns.toSet) -- keys.toSet
    require(overlap.isEmpty,
      s"non-key columns collide: ${overlap.mkString(", ")} — rename before joining")
    val l = (if (left.isStreaming) left.withWatermark(leftTs, lateness) else left)
      .alias("l")
    val r = (if (right.isStreaming) right.withWatermark(rightTs, lateness) else right)
      .alias("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    val timeCond = col(rightTs) >= col(leftTs) - expr(s"INTERVAL $maxDelay") &&
      col(rightTs) <= col(leftTs)
    l.join(r, keyCond && timeCond, "inner")
      .select(keys.map(k => col(s"l.$k")) ++
        left.columns.toSeq.filterNot(keys.contains).map(c => col(s"l.$c")) ++
        right.columns.toSeq.filterNot(keys.contains).map(c => col(s"r.$c")): _*)
  }

  /** Per-user running state for `flatMapGroupsWithState`-style custom logic. */
  final case class UserSessionState(nEvents: Long, total: Double, lastTs: Long)

  final case class UserEvent(user_id: Long, ts: Timestamp, value: Double)

  final case class UserSnapshot(user_id: Long, n_events: Long, total: Double)

  /** Custom stateful aggregation: running per-user event count/total — the
    * `mapGroupsWithState` path for semantics windowed aggs can't express
    * (decay, custom eviction, ML feature state). Emits a snapshot per batch
    * per active user.
    *
    * `idleTimeout = Some(d)` evicts idle users' state after d of processing
    * time (bounds state for churning key spaces). Note the engine then fires
    * timeout-check batches continuously, so tests that wait for quiescence
    * (`processAllAvailable`) should use `None`. */
  def userRunningTotals(
      events: Dataset[UserEvent],
      idleTimeout: Option[String] = None): Dataset[UserSnapshot] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserSessionState, UserSnapshot](timeoutConf) {
        case (userId, rows, state: GroupState[UserSessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            UserSnapshot(userId, s.nEvents, s.total)
          } else {
            val prev = state.getOption.getOrElse(UserSessionState(0L, 0.0, 0L))
            val it = rows.toSeq
            val next = UserSessionState(
              prev.nEvents + it.size,
              prev.total + it.map(_.value).sum,
              math.max(prev.lastTs, it.map(_.ts.getTime).maxOption.getOrElse(0L)))
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            UserSnapshot(userId, next.nEvents, next.total)
          }
      }
  }
}
