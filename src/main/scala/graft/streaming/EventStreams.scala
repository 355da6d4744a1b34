package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}

/** Event-stream operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props-json).
  *
  * Each operator is written once against the unified Dataset API so the SAME
  * code runs in batch (gate/oracle) and Structured Streaming (readStream →
  * writeStream) — the streaming specs feed it through a MemoryStream and
  * assert agreement with the batch run. Watermarks bound state at scale:
  * windowed aggregation state is O(open windows × event types), session
  * state O(active users), both executor-distributed by groupBy key.
  */
object EventStreams {

  /** Tumbling-window counts/sums per event type. In streaming mode the
    * 2-hour watermark admits late events up to 2h before dropping state. */
  def windowedStats(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("total"))
  }

  /** Fixed-width decile bin of `value` on a declared [0, scale) range —
    * shared by [[windowedPsi]] and its reference-histogram builder so
    * the monitored stream and the baseline bin identically. */
  def valueBin(scale: Double): org.apache.spark.sql.Column =
    least(greatest(floor(col("value") / scale * 10), lit(0.0)), lit(9.0))
      .cast("long")

  /** Windowed drift monitor — per tumbling window, the population
    * stability index of `value`'s decile distribution against a STATIC
    * reference histogram: the serve-time companion to the batch PSI
    * ([[graft.ops.Profiling.psi]]). The alarm a pipeline keeps on a live
    * event feed: a window whose value mix departs from the trained-on
    * baseline lights up within one watermark delay.
    *
    * Streaming-shape: ONE windowed aggregation (count + ten conditional
    * bin sums) and the PSI is a pure projection over its row — no second
    * aggregation, so the query runs in append mode with a watermark and
    * per-window state is eleven longs. The reference rides in as
    * LITERALS (ten numbers — model-sized by construction), never a join.
    * The same code path serves batch frames, which is what the gate row
    * and the stream≡batch spec compare.
    *
    * Determinism: the ½ pseudo-count device of the batch PSI; each bin's
    * term is rounded to 12 dp and the ten terms fold as decimal adds in
    * a fixed order — exact, so any engine agrees.
    *
    * @param refBins (bin → count) of the baseline histogram, bins 0-9
    * @return (win_start epoch-sec, n, psi) — psi 6-dp */
  def windowedPsi(events: DataFrame, refBins: Seq[(Long, Long)],
      scale: Double = 500.0, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    require(refBins.nonEmpty, "windowedPsi: empty reference histogram")
    val refMap = refBins.toMap
    val refN = refBins.map(_._2).sum
    val src0 = events.filter(col("value").isNotNull)
    val src = if (src0.isStreaming) src0.withWatermark("ts", watermark) else src0
    val bin = valueBin(scale)
    val binAggs = (0L to 9L).map(b =>
      sum(when(bin === b, 1L).otherwise(0L)).as(s"__c$b"))
    val agg = src.groupBy(window(col("ts"), windowLen))
      .agg(count(lit(1)).as("__n"), binAggs: _*)
    val terms = (0L to 9L).map { b =>
      val p = (col(s"__c$b").cast("double") + lit(0.5)) /
        (col("__n").cast("double") + lit(5.0))
      val q = lit((refMap.getOrElse(b, 0L) + 0.5) / (refN + 5.0))
      round((p - q) * log(p / q), 12).cast("decimal(27,15)")
    }
    agg.select(unix_timestamp(col("window.start")).as("win_start"),
      col("__n").as("n"),
      round(terms.reduce(_ + _).cast("double"), 6).as("psi"))
  }

  /** Per-SOURCE windowed drift monitor — the production shape of
    * [[windowedPsi]]: a fleet of feeds (sources, tenants, event types)
    * each monitored per tumbling window against ITS OWN trained baseline,
    * in one streaming query. [[windowedPsi]] is corpus-global; a real
    * alarm is keyed — drift in one source must light up that source, not
    * dilute into the fleet aggregate (the batch analog is
    * [[graft.ops.Profiling.psi]]'s per-group shape, gate q189).
    *
    * Streaming-shape: ONE aggregation keyed (window × source) — count
    * plus ten conditional bin sums — and the PSI is a pure projection
    * over its row. State per open (window, source) is eleven longs,
    * watermark-bounded; at 1000 executors the key space distributes on
    * the groupBy hash. The per-source baselines ride in as ONE literal
    * map expression (sources × 10 longs — model-sized), never a join.
    *
    * Sources with no baseline are filtered out up front: a feed can't be
    * scored against a histogram that was never trained.
    *
    * Determinism: identical devices to [[windowedPsi]] — ½ pseudo-counts,
    * 12-dp rounded terms, fixed-order decimal fold.
    *
    * @param refBins per-source baseline: source → (bin → count), bins 0-9
    * @return (win_start epoch-sec, source, n, psi) — psi 6-dp */
  def keyedWindowedPsi(events: DataFrame, keyCol: String,
      refBins: Map[String, Seq[(Long, Long)]],
      scale: Double = 500.0, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    require(refBins.nonEmpty, "keyedWindowedPsi: empty reference histograms")
    // densify each source's baseline to a 10-slot array so bin lookup is
    // positional (element_at), and precompute per-source totals
    val refArr: Map[String, Seq[Long]] = refBins.map { case (k, bins) =>
      val m = bins.toMap
      k -> (0L to 9L).map(b => m.getOrElse(b, 0L))
    }
    val refTot: Map[String, Long] =
      refBins.map { case (k, bins) => k -> bins.map(_._2).sum }
    val refArrLit = typedlit(refArr)
    val refTotLit = typedlit(refTot)
    val src0 = events.filter(col("value").isNotNull &&
      col(keyCol).isin(refBins.keys.toSeq: _*))
    val src = if (src0.isStreaming) src0.withWatermark("ts", watermark) else src0
    val bin = valueBin(scale)
    val binAggs = (0L to 9L).map(b =>
      sum(when(bin === b, 1L).otherwise(0L)).as(s"__c$b"))
    val agg = src.groupBy(window(col("ts"), windowLen), col(keyCol))
      .agg(count(lit(1)).as("__n"), binAggs: _*)
    val nRef = element_at(refTotLit, col(keyCol)).cast("double")
    val terms = (0 to 9).map { b =>
      val p = (col(s"__c$b").cast("double") + lit(0.5)) /
        (col("__n").cast("double") + lit(5.0))
      val q = (element_at(element_at(refArrLit, col(keyCol)), b + 1)
        .cast("double") + lit(0.5)) / (nRef + lit(5.0))
      round((p - q) * log(p / q), 12).cast("decimal(27,15)")
    }
    agg.select(unix_timestamp(col("window.start")).as("win_start"),
      col(keyCol).as("source"), col("__n").as("n"),
      round(terms.reduce(_ + _).cast("double"), 6).as("psi"))
  }

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  case class SessionState(start: Long, last: Long, n: Int, total: Double)
  case class Session(user_id: Long, session_start: Long, session_end: Long,
      n_events: Long, total_value: Double)

  /** Batch sessionization: sessions split on inactivity gaps > `gapSec`.
    * Classic two-window plan: lag → new-session flag → running sum = session
    * id → aggregate. One shuffle on user_id; within-user ordering is the
    * window sort. Mirrored exactly by the DuckDB oracle SQL. */
  def sessionizeBatch(events: DataFrame, gapSec: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new", when(col("__prev").isNull ||
        unix_timestamp(col("ts")) - unix_timestamp(col("__prev")) > gapSec, 1L)
        .otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(cum))
      .groupBy(col("user_id"), col("__sid"))
      .agg(
        unix_timestamp(min(col("ts"))).as("session_start"),
        unix_timestamp(max(col("ts"))).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .drop("__sid")
  }

  /** Linear multi-touch attribution (batch): each conversion's value is
    * split equally across the same user's touch events inside the
    * look-back window; conversions with no touches credit the synthetic
    * `direct` channel. Per-conversion credit assignment — the
    * complement of the funnel's path counting.
    *
    * Scale: the touch join is an equi-join on user with a time-range
    * predicate (fan-out bounded by touches-per-user-window); the touch
    * count is a window keyed by conversion id; credit sums follow the
    * decimal(27,15) rule.
    *
    * @return (channel, n_credits, credited_value) */
  def linearAttribution(events: DataFrame, conversionType: String,
      touchTypes: Seq[String], windowHours: Int): DataFrame = {
    require(windowHours >= 1, s"linearAttribution: windowHours >= 1, got $windowHours")
    val conv = events.filter(col("event_type") === conversionType)
      .select(col("event_id").as("__cid"), col("user_id"),
        col("ts").as("__cts"), col("value"))
    val touch = events.filter(col("event_type").isin(touchTypes: _*))
      .select(col("user_id").as("__tuid"), col("ts").as("__tts"),
        col("event_type").as("__touch"))
    val joined = conv.join(touch,
      col("user_id") === col("__tuid") &&
        col("__tts") < col("__cts") &&
        col("__tts") >= col("__cts") - expr(s"INTERVAL $windowHours HOURS"),
      "left")
    val w = Window.partitionBy(col("__cid"))
    joined
      .withColumn("__nt", count(col("__touch")).over(w))
      .select(coalesce(col("__touch"), lit("direct")).as("channel"),
        when(col("__touch").isNull, col("value"))
          .otherwise(col("value") / col("__nt")).as("__credit"))
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        round(sum(col("__credit").cast("decimal(27,15)")).cast("double"), 6)
          .as("credited_value"))
  }

  /** Streaming sessionization with explicit state:
    * flatMapGroupsWithState keyed on user, ProcessingTimeTimeout-free —
    * sessions are emitted when a new event arrives past the gap (plus a
    * final flush at timeout in production; the spec drives the happy path).
    * State per user is O(1): (start, last, count, sum). */
  def sessionizeStream(events: Dataset[Event], gapSec: Long = 1800): Dataset[Session] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          // events within one trigger arrive unordered: sort this batch
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val out = Seq.newBuilder[Session]
          var st = state.getOption.orNull
          sorted.foreach { e =>
            val sec = e.ts.getTime / 1000
            if (st == null) st = SessionState(sec, sec, 1, e.value)
            else if (sec - st.last > gapSec) {
              out += Session(userId, st.start, st.last, st.n, math.round(st.total * 100) / 100.0)
              st = SessionState(sec, sec, 1, e.value)
            } else st = st.copy(last = sec, n = st.n + 1, total = st.total + e.value)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  case class HistState(recent: List[(Long, Long, String)]) // (tsµs, id, type), newest-first
  case class History(user_id: Long, n_events: Long, first_ts: Long,
      last_ts: Long, history: Seq[String])

  /** Streaming twin of [[graft.ops.Curation.userHistories]]: a bounded
    * per-user buffer of the `maxLen` most recent events, maintained with
    * mapGroupsWithState and re-emitted (Update mode) whenever the user
    * sees traffic. State is O(maxLen) per user BY CONSTRUCTION — the
    * merge truncates before updating, so a bot user costs the same state
    * as anyone else; the batch operator gets the same bound from its
    * rank-truncate-before-collect. The final emission per user equals
    * the batch result on the same events (StreamingSpec pins this). */
  def userHistoriesStream(events: Dataset[Event], maxLen: Int): Dataset[History] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[HistState, History](GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[HistState]) =>
          def micros(e: Event): Long = {
            val inst = e.ts.toInstant
            inst.getEpochSecond * 1000000L + inst.getNano / 1000L
          }
          val incoming = batch.map(e => (micros(e), e.event_id, e.event_type))
          val merged = (state.getOption.map(_.recent).getOrElse(Nil) ++ incoming)
            .sortBy(t => (-t._1, -t._2)).take(maxLen)
          state.update(HistState(merged))
          val chrono = merged.reverse
          History(userId, chrono.size.toLong, chrono.head._1, chrono.last._1,
            chrono.map(t => s"${t._1}:${t._3}"))
      }
  }

  case class DecayState(scoreAtRef: Double, refTsUs: Long, n: Long)
  case class DecayScore(user_id: Long, n_events: Long, last_seen_us: Long,
    score_at_last: Double)

  /** Incremental per-user time-decayed engagement — the streaming twin of
    * [[graft.ops.Curation.timeDecayedScores]]. The state carries the score
    * REFERENCED AT the user's newest-seen event: S(ref) = Σ v·2^(−(ref−t)/HL).
    * A newer event moves the reference (S·2^(−Δ/HL) + v); an out-of-order
    * straggler folds in place (S + v·2^(−(ref−t)/HL)) — both exact under the
    * algebra, so arrival order never changes the final state's VALUE, only
    * its double rounding. Decaying the final state to any global reference T
    * reproduces the batch score (S·2^(−(T−ref)/HL)); StreamingSpec pins
    * stream ≡ batch within fp tolerance (the online fold's summation order
    * necessarily differs from the batch decimal sum).
    *
    * State is one double and two longs per user (the reference timestamp IS
    * the max seen — it advances exactly on new maxima) — O(1) regardless of
    * traffic, the cheapest possible stateful shape at any event volume. */
  def decayedScoresStream(events: Dataset[Event],
      halfLifeDays: Double): Dataset[DecayScore] = {
    import events.sparkSession.implicits._
    require(halfLifeDays > 0,
      s"decayedScoresStream: halfLifeDays must be > 0, got $halfLifeDays")
    val lambdaUs = math.log(2.0) / (86400e6 * halfLifeDays)
    events.groupByKey(_.user_id)
      .mapGroupsWithState[DecayState, DecayScore](GroupStateTimeout.NoTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[DecayState]) =>
          def micros(e: Event): Long = {
            val inst = e.ts.toInstant
            inst.getEpochSecond * 1000000L + inst.getNano / 1000L
          }
          var (s, ref, n) = state.getOption
            .map(st => (st.scoreAtRef, st.refTsUs, st.n))
            .getOrElse((0.0, Long.MinValue, 0L))
          batch.toSeq.sortBy(e => (micros(e), e.event_id)).foreach { e =>
            val t = micros(e)
            if (ref == Long.MinValue) { s = e.value; ref = t }
            else if (t >= ref) {
              s = s * math.exp(-lambdaUs * (t - ref).toDouble) + e.value
              ref = t
            } else s = s + e.value * math.exp(-lambdaUs * (ref - t).toDouble)
            n += 1
          }
          state.update(DecayState(s, ref, n))
          DecayScore(userId, n, ref, s)
      }
  }

  /** Session path mining: the most common event-type SEQUENCES across
    * sessions — the product-analytics view that turns raw streams into
    * "what do users actually do" (view>click>purchase vs view>error>…).
    * Sessions split on the [[sessionizeBatch]] gap rule; each session's
    * path is its first `maxLen` event types in (ts, event_id) order
    * joined with '>', and paths are ranked by frequency.
    *
    * Scale shape: the same single user-keyed window as sessionization,
    * one (user, session) aggregate whose per-group state is capped by
    * `maxLen` after the in-group sort, one path-keyed count (map-side
    * combined), and a TakeOrdered top-k — never a global sort of the
    * path space.
    *
    * @return (path, n_sessions), top `k` by count desc then path asc */
  def sessionPaths(events: DataFrame, gapSec: Long = 1800,
      maxLen: Int = 8, k: Int = 20): DataFrame = {
    require(maxLen >= 1 && k >= 1, s"sessionPaths: maxLen/k must be >= 1")
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("__prev", lag(col("ts"), 1).over(byUser))
      .withColumn("__new", when(col("__prev").isNull ||
        unix_timestamp(col("ts")) - unix_timestamp(col("__prev")) > gapSec, 1L)
        .otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(cum))
      .groupBy(col("user_id"), col("__sid"))
      .agg(array_join(slice(transform(
        array_sort(collect_list(struct(unix_micros(col("ts")).as("__tsu"),
          col("event_id").as("__eid"), col("event_type").as("__ev")))),
        s => s.getField("__ev")), 1, maxLen), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  case class CdcEvent(op: String, key: String, value: Double)
  case class RollupState(cnt: Long, total: Double)
  case class RollupRow(key: String, cnt: Long, total: Double)

  /** Streaming twin of [[graft.ops.Mutations.incrementalRollup]]: the
    * same count/sum materialized view maintained live with
    * mapGroupsWithState — inserts add, deletes subtract, and a key whose
    * count reaches zero REMOVES its state (the self-maintainability
    * contract, now also a state-size bound: fully-deleted keys cost
    * nothing forever). Emits the key's current state on every trigger it
    * sees traffic; the final emission per key equals the batch operator
    * over the same CDC (StreamingSpec pins it, fp tolerance for the
    * online double sum vs the batch decimal sum).
    *
    * State is two numbers per LIVE key — the smallest possible stateful
    * shape, and exactly what a 100 TB fact stream's rollup needs. */
  def rollupStream(cdc: Dataset[CdcEvent]): Dataset[RollupRow] = {
    import cdc.sparkSession.implicits._
    cdc.groupByKey(_.key)
      .mapGroupsWithState[RollupState, RollupRow](GroupStateTimeout.NoTimeout()) {
        (key: String, batch: Iterator[CdcEvent], state: GroupState[RollupState]) =>
          var (c, t) = state.getOption.map(s => (s.cnt, s.total))
            .getOrElse((0L, 0.0))
          batch.foreach { e =>
            val sgn = if (e.op == "I") 1 else -1
            c += sgn; t += sgn * e.value
          }
          if (c <= 0) { state.remove(); RollupRow(key, 0L, 0.0) }
          else { state.update(RollupState(c, t)); RollupRow(key, c, t) }
      }
  }

  case class PatternState(lastView: Long, cTs: Long, vTs: Long,
      lastVeto: Long)
  case class PatternMatch(user_id: Long, v_ts: Long, c_ts: Long, p_ts: Long)

  /** Streaming twin of
    * [[graft.ops.SequencePatterns.threeStageWithVeto]]: the same
    * view→click→purchase automaton with an error veto, run live with
    * flatMapGroupsWithState. State per user is FOUR LONGS (latest view,
    * latest qualifying click and its view, latest veto) — constant-size
    * no matter how long the stream, the state-bound property the batch
    * op's cumulative windows get for free and a stream must earn.
    * Events inside a trigger are applied in (ts, event_id) order;
    * StreamingSpec pins final emissions ≡ the batch operator over the
    * same feed. Sentinel Long.MinValue = "unseen" (events predate it by
    * construction). */
  def patternStream(events: Dataset[Event]): Dataset[PatternMatch] = {
    import events.sparkSession.implicits._
    val None_ = Long.MinValue
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[PatternState, PatternMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[Event], state: GroupState[PatternState]) =>
          var st = state.getOption.getOrElse(
            PatternState(None_, None_, None_, None_))
          val out = scala.collection.mutable.ArrayBuffer.empty[PatternMatch]
          // full microsecond value (getTime truncates to millis; the
          // nanos field carries the sub-millisecond remainder) — must
          // match the batch twin's unix_micros for ordering AND emitted
          // v_ts/c_ts on microsecond-precision timestamps
          def micros(t: java.sql.Timestamp): Long =
            t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
          batch.toSeq.sortBy(e => (micros(e.ts), e.event_id)).foreach { e =>
            val tsu = micros(e.ts)
            e.event_type match {
              case "view" => st = st.copy(lastView = tsu)
              case "error" => st = st.copy(lastVeto = tsu)
              case "click" if st.lastView != None_ =>
                st = st.copy(cTs = tsu, vTs = st.lastView)
              case "purchase" if st.cTs != None_ &&
                  (st.lastVeto == None_ || st.lastVeto <= st.vTs) =>
                out += PatternMatch(user, st.vTs, st.cTs, tsu)
              case _ => ()
            }
          }
          state.update(st)
          out.iterator
      }
  }

  /** Per-type stats with JSON prop extraction (semi-structured path). */
  def typeStats(events: DataFrame): DataFrame =
    events
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("value")), 4).as("avg_value"),
        round(avg(col("k")), 4).as("avg_k"),
        countDistinct(col("user_id")).as("n_users"))
}
