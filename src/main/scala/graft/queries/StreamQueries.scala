package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Gate coverage for the event/stream operator family, run in batch mode
  * over `events` (the same plans run under Structured Streaming — see
  * StreamingSpec). Timestamps are compared as epoch seconds to stay
  * engine-neutral. */
object StreamQueries {

  /** Tumbling 1-hour windows per event type. */
  def q50EventWindow(s: SparkSession, d: String): DataFrame =
    EventStreams.windowedStats(Tables.events(s, d))
      .orderBy(col("win_start"), col("event_type"))

  val q50Sql: String =
    """SELECT CAST(epoch(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS win_start,
      | event_type, count(*) AS n, round(sum(value), 2) AS total
      |FROM events
      |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  /** Gap-based sessionization (30-minute inactivity). */
  def q51Sessionize(s: SparkSession, d: String): DataFrame =
    EventStreams.sessionizeBatch(Tables.events(s, d), gapSec = 1800)
      .orderBy(col("user_id"), col("session_start"))

  val q51Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
      |            - CAST(floor(epoch(CAST(lag(ts) OVER w AS TIMESTAMP))) AS BIGINT) > 1800
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sessions AS (
      |  SELECT user_id, ts, value,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged
      |)
      |SELECT user_id,
      |  CAST(floor(epoch(CAST(min(ts) AS TIMESTAMP))) AS BIGINT) AS session_start,
      |  CAST(floor(epoch(CAST(max(ts) AS TIMESTAMP))) AS BIGINT) AS session_end,
      |  count(*) AS n_events, round(sum(value), 2) AS total_value
      |FROM sessions GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Per-type stats with JSON property extraction. */
  def q52TypeStats(s: SparkSession, d: String): DataFrame =
    EventStreams.typeStats(Tables.events(s, d))
      .orderBy(col("event_type"))

  val q52Sql: String =
    """SELECT event_type, count(*) AS n,
      | round(avg(value), 4) AS avg_value,
      | round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k,
      | count(DISTINCT user_id) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Time-series gap filling (resampling): a dense hourly grid from the
    * data's own start, crossed with the type dimension, left-joined to the
    * actual per-hour counts — missing hours surface as explicit zeros.
    * The grid is generated from a 1-row aggregate (no driver constants).
    * The BROADCAST side is the counts aggregate: its cardinality is at
    * most the dense grid's (hours × types), and Spark can only broadcast
    * the non-preserved side of an outer join — a hint on the preserved
    * grid side would be silently dropped and force a shuffle join. */
  def q65GapFill(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val start = ev.agg(date_trunc("hour", min(col("ts"))).as("h0"))
    val grid = start.select(explode(sequence(col("h0"),
      col("h0") + expr("INTERVAL 71 HOURS"), expr("INTERVAL 1 HOUR"))).as("h"))
    val types = ev.select(col("event_type")).distinct()
    val counts = ev.crossJoin(broadcast(start))
      .filter(col("ts") < col("h0") + expr("INTERVAL 72 HOURS"))
      .select(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .groupBy(col("h"), col("event_type")).agg(count(lit(1)).as("n"))
    grid.crossJoin(types)
      .join(broadcast(counts), Seq("h", "event_type"), "left")
      .select(col("event_type"), col("h"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("event_type"), col("h"))
  }

  val q65Sql: String =
    """WITH h0 AS (SELECT date_trunc('hour', min(ts)) AS v FROM events),
      |grid AS (SELECT unnest(generate_series(v, v + INTERVAL 71 HOUR, INTERVAL 1 HOUR)) AS h FROM h0),
      |types AS (SELECT DISTINCT event_type FROM events),
      |counts AS (SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
      |  FROM events, h0 WHERE ts < h0.v + INTERVAL 72 HOUR GROUP BY 1, 2)
      |SELECT event_type, h, coalesce(n, 0) AS n
      |FROM grid CROSS JOIN types LEFT JOIN counts USING (h, event_type)
      |ORDER BY event_type, h""".stripMargin

  /** Event funnel: view → click (≤24h later) → purchase (≤24h after the
    * click), counting users surviving each stage. Each stage is one
    * user-keyed aggregation joined to the previous stage's per-user
    * timestamps — the shuffles all key on user_id, so the funnel runs in
    * three narrow-keyed passes at any event volume. */
  def q67Funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("view_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .join(views, "user_id")
      .filter(col("ts") > col("view_ts") &&
        col("ts") <= col("view_ts") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .join(clicks, "user_id")
      .filter(col("ts") > col("click_ts") &&
        col("ts") <= col("click_ts") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("purchase_ts"))
    views.agg(count(lit(1)).as("n_view"))
      .crossJoin(clicks.agg(count(lit(1)).as("n_click")))
      .crossJoin(purchases.agg(count(lit(1)).as("n_purchase")))
  }

  val q67Sql: String =
    """WITH v AS (SELECT user_id, min(ts) AS view_ts FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS click_ts
      |      FROM events e JOIN v USING (user_id)
      |      WHERE e.event_type = 'click' AND e.ts > v.view_ts
      |        AND e.ts <= v.view_ts + INTERVAL 24 HOUR
      |      GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
      |      FROM events e JOIN c USING (user_id)
      |      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
      |        AND e.ts <= c.click_ts + INTERVAL 24 HOUR
      |      GROUP BY e.user_id)
      |SELECT (SELECT count(*) FROM v) AS n_view,
      |       (SELECT count(*) FROM c) AS n_click,
      |       (SELECT count(*) FROM p) AS n_purchase""".stripMargin

  /** Cohort retention: users grouped by first-activity week, counted in
    * each subsequent active week. Two user-keyed aggregations; week
    * arithmetic in epoch seconds (`div`, exact at any range — both
    * truncations align to the same week start so differences are exact
    * multiples of 604800). */
  def q68Retention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val first = ev.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_ts"))
    ev.join(first, "user_id")
      .select(col("user_id"), col("cohort_ts"),
        expr("(CAST(date_trunc('week', ts) AS LONG) - CAST(cohort_ts AS LONG)) div 604800")
          .as("week_n"))
      .distinct()
      .groupBy(date_format(col("cohort_ts"), "yyyy-MM-dd").as("cohort"), col("week_n"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("cohort"), col("week_n"))
  }

  val q68Sql: String =
    """WITH first AS (
      |  SELECT user_id, date_trunc('week', min(ts)) AS cohort FROM events GROUP BY 1),
      |act AS (
      |  SELECT DISTINCT e.user_id, f.cohort,
      |    CAST(epoch(date_trunc('week', e.ts)) - epoch(f.cohort) AS BIGINT) // 604800 AS week_n
      |  FROM events e JOIN first f USING (user_id))
      |SELECT strftime(cohort, '%Y-%m-%d') AS cohort, week_n, count(*) AS n_active
      |FROM act GROUP BY 1, 2 ORDER BY cohort, week_n""".stripMargin

  /** Sliding 1-hour windows every 15 minutes: Spark's window() with a
    * slide emits each event into 4 overlapping windows; the oracle mirrors
    * by exploding offsets 0..3 off the 15-minute bucket. Same plan shape
    * under Structured Streaming (q50's tumbling case generalized). */
  def q69SlidingWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").cast("long").as("win_start"),
        col("event_type"), col("n"))
      .orderBy(col("win_start"), col("event_type"))

  val q69Sql: String =
    """SELECT CAST(epoch(time_bucket(INTERVAL 15 MINUTE, CAST(ts AS TIMESTAMP))
      |    - k * INTERVAL 15 MINUTE) AS BIGINT) AS win_start,
      |  event_type, count(*) AS n
      |FROM events, UNNEST([0, 1, 2, 3]) AS t(k)
      |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  /** Per-user training-sequence assembly: each sampled user's 20 most
    * recent events as a chronological "epochµs:type" array
    * ([[graft.ops.Curation.userHistories]] — rank-truncated BEFORE
    * collection, so per-user state is bounded at any scale). */
  def q111UserHistory(s: SparkSession, d: String): DataFrame =
    graft.ops.Curation.userHistories(
        Tables.events(s, d).filter(col("user_id") % 20 === 0),
        "user_id", "ts", "event_id", "event_type", maxLen = 20)
      // the gate compare hashes scalar cells — arrays ride as a joined
      // string, the q29 device
      .select(col("user_id"), col("n_events"), col("first_ts"),
        col("last_ts"), array_join(col("history"), "|").as("history"))
      .orderBy(col("user_id"))

  val q111Sql: String =
    """WITH ranked AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, event_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events WHERE user_id % 20 = 0)
      |SELECT user_id, count(*) AS n_events,
      |  min(tsu) AS first_ts, max(tsu) AS last_ts,
      |  string_agg(CAST(tsu AS VARCHAR) || ':' || event_type, '|' ORDER BY tsu, event_id) AS history
      |FROM ranked WHERE rn <= 20
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Per-user exponentially time-decayed engagement
    * ([[graft.ops.Curation.timeDecayedScores]], half-life 30 days,
    * reference = corpus-wide newest event): every user's score is pinned
    * to 6 decimals, so the epoch-µs age arithmetic, the shared broadcast
    * reference point, the per-event exp() contribution, and the
    * decimal(27,15) order-independent sum are all on the hook. */
  def q134DecayScore(s: SparkSession, d: String): DataFrame =
    graft.ops.Curation.timeDecayedScores(Tables.events(s, d),
        "user_id", "ts", "value", halfLifeDays = 30.0)
      .orderBy(col("user_id"))

  val q134Sql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, value FROM events
      |), ref AS (SELECT max(tsu) AS ref_us FROM e)
      |SELECT user_id, count(*) AS n_events, max(tsu) AS last_seen_us,
      |  round(CAST(sum(CAST(value * exp(-(ln(2) / (86400e6 * 30.0)) *
      |    CAST(ref_us - tsu AS DOUBLE)) AS DECIMAL(27,15))) AS DOUBLE), 6) AS decay_score
      |FROM e, ref GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Hourly volume anomaly screen ([[graft.ops.Profiling
    * .hourlyAnomaly]]): every (event_type, hour) count, its z-score
    * against the type's own hourly distribution, and the |z| > 2 flag
    * are hash-pinned — exact-integer sums feed the closed-form variance
    * and the flag compares the ROUNDED z, so no engine-ulp can flip a
    * boundary hour. */
  def q142HourlyAnomaly(s: SparkSession, d: String): DataFrame =
    graft.ops.Profiling.hourlyAnomaly(Tables.events(s, d),
        "event_type", "ts", cutoff = 2.0)
      .orderBy(col("event_type"), col("hour"))

  val q142Sql: String =
    """WITH hourly AS (
      |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY event_type, hour),
      |stats AS (
      |  SELECT event_type, count(*) AS h, sum(n) AS s, sum(n * n) AS ss
      |  FROM hourly GROUP BY event_type),
      |zs AS (
      |  SELECT h.event_type, hour, n,
      |    CASE WHEN hh.h >= 2 AND
      |        (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / hh.h)
      |          / (hh.h - 1) > 0
      |      THEN round((n - CAST(s AS DOUBLE) / hh.h) /
      |        sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / hh.h)
      |          / (hh.h - 1)), 6) END AS z
      |  FROM hourly h JOIN stats hh USING (event_type))
      |SELECT event_type, hour, n, z,
      |  coalesce(abs(z) > 2.0, false) AS is_anomaly
      |FROM zs ORDER BY event_type, hour""".stripMargin

  /** Linear multi-touch attribution: each purchase's value is split
    * equally across the user's view/click touches in the 24 h before it;
    * touchless purchases credit a synthetic `direct` channel. The classic
    * marketing-analytics op the funnel (q67) and retention (q68) family
    * was missing — per-conversion credit assignment, not path counting.
    *
    * Scale: the touch join is an equi-join on user_id with a range
    * predicate (per-user fan-out bounded by touches-per-user-day, the
    * q71 range-join discipline); the per-purchase touch count is a
    * window keyed by purchase id — never global. Credit sums follow the
    * decimal(27,15) rule, so partial-agg merge order can't wiggle them. */
  def q145Attribution(s: SparkSession, d: String): DataFrame =
    EventStreams.linearAttribution(Tables.events(s, d),
        conversionType = "purchase", touchTypes = Seq("view", "click"),
        windowHours = 24)
      .orderBy(col("channel"))

  val q145Sql: String =
    """WITH p AS (
      |  SELECT event_id AS pid, user_id, CAST(ts AS TIMESTAMP) AS pts, value
      |  FROM events WHERE event_type = 'purchase'),
      |t AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS tts, event_type AS touch_type
      |  FROM events WHERE event_type IN ('view', 'click')),
      |j AS (
      |  SELECT pid, value, touch_type
      |  FROM p LEFT JOIN t ON p.user_id = t.user_id
      |    AND t.tts < p.pts AND t.tts >= p.pts - INTERVAL 24 HOURS),
      |c AS (
      |  SELECT pid, value, touch_type,
      |    count(touch_type) OVER (PARTITION BY pid) AS n_t
      |  FROM j)
      |SELECT COALESCE(touch_type, 'direct') AS channel,
      |  CAST(count(*) AS BIGINT) AS n_credits,
      |  round(CAST(sum(CAST(CASE WHEN touch_type IS NULL THEN value
      |    ELSE value / n_t END AS DECIMAL(27,15))) AS DOUBLE), 6)
      |    AS credited_value
      |FROM c GROUP BY channel ORDER BY channel""".stripMargin

  /** Per-event-type value trend over the stream's lifetime
    * ([[graft.ops.Profiling.linearFit]] keyed on the type): slope of
    * event value against hours-since-corpus-start — the monitoring
    * regression that catches metric drift per segment. The corpus start
    * is a 1-row broadcast reference (the q134 device); the moment sums
    * are decimal-pinned; all four fit statistics per type are
    * hash-checked. */
  def q152TypeTrend(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val ref = ev.agg(min(unix_micros(col("ts"))).as("__t0"))
    val xy = ev.crossJoin(broadcast(ref))
      .select(col("event_type"),
        ((unix_micros(col("ts")) - col("__t0")).cast("double") / 3.6e9)
          .as("x"),
        col("value").as("y"))
    graft.ops.Profiling.linearFit(xy, Seq("event_type"), "x", "y")
      .orderBy(col("event_type"))
  }

  val q152Sql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS tsu, value
      |  FROM events
      |), ref AS (SELECT min(tsu) AS t0 FROM e
      |), xy AS (
      |  SELECT event_type, CAST(tsu - t0 AS DOUBLE) / 3.6e9 AS x,
      |    value AS y
      |  FROM e, ref
      |), m AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(27,15))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS DECIMAL(27,15))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(x * x AS DECIMAL(27,15))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(x * y AS DECIMAL(27,15))) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(y * y AS DECIMAL(27,15))) AS DOUBLE) AS syy
      |  FROM xy GROUP BY 1
      |), g AS (
      |  SELECT event_type, n, sx, sy,
      |    CAST(n AS DOUBLE) * sxx - sx * sx AS varx,
      |    CAST(n AS DOUBLE) * syy - sy * sy AS vary,
      |    CAST(n AS DOUBLE) * sxy - sx * sy AS cov
      |  FROM m
      |)
      |SELECT event_type, n, round(cov / varx, 6) AS slope,
      |  round((sy - (cov / varx) * sx) / CAST(n AS DOUBLE), 6) AS intercept,
      |  round(cov * cov / (varx * vary), 6) AS r2
      |FROM g ORDER BY event_type""".stripMargin

  /** Session path mining ([[EventStreams.sessionPaths]]): the 20 most
    * common 8-step session paths with counts — the gap rule, the
    * in-session (ts, event_id) order, the truncation, and the ranking
    * tiebreak are all pinned. */
  def q158SessionPaths(s: SparkSession, d: String): DataFrame =
    EventStreams.sessionPaths(Tables.events(s, d),
        gapSec = 1800, maxLen = 8, k = 20)
      .orderBy(col("n_sessions").desc, col("path"))

  val q158Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
      |            - CAST(floor(epoch(CAST(lag(ts) OVER w AS TIMESTAMP))) AS BIGINT) > 1800
      |         THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |), sessions AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM flagged
      |), paths AS (
      |  SELECT user_id, sid,
      |    array_to_string(list_slice(
      |      list(event_type ORDER BY ts, event_id), 1, 8), '>') AS path
      |  FROM sessions GROUP BY user_id, sid
      |)
      |SELECT path, count(*) AS n_sessions
      |FROM paths GROUP BY path
      |ORDER BY n_sessions DESC, path LIMIT 20""".stripMargin

  /** Sequence-pattern matches with veto
    * ([[graft.ops.SequencePatterns.threeStageWithVeto]]): every
    * view→click→purchase occurrence per user where no error falls inside
    * the matched span, each match's three binding timestamps hash-pinned.
    * The MATCH_RECOGNIZE shape (per-occurrence with negation) the funnel
    * (q67, per-user stage counts) can't express; the oracle replays the
    * same two cumulative-window automaton passes with arg_max. */
  def q164SequenceMatch(s: SparkSession, d: String): DataFrame =
    graft.ops.SequencePatterns.threeStageWithVeto(
        Tables.events(s, d), "user_id", "event_id", "ts", "event_type",
        "view", "click", "purchase", "error")
      .orderBy(col("user_id"), col("p_ts"))

  val q164Sql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS tsu
      |  FROM events),
      |p1 AS (
      |  SELECT *,
      |    max(CASE WHEN event_type = 'view' THEN tsu END) OVER w AS lv,
      |    max(CASE WHEN event_type = 'error' THEN tsu END) OVER w AS le
      |  FROM e
      |  WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      |p2 AS (
      |  SELECT *,
      |    max(CASE WHEN event_type = 'click' AND lv IS NOT NULL
      |        THEN tsu END) OVER w AS c_tsu,
      |    arg_max(CASE WHEN event_type = 'click' AND lv IS NOT NULL
      |        THEN lv END,
      |      CASE WHEN event_type = 'click' AND lv IS NOT NULL
      |        THEN tsu END) OVER w AS v_tsu
      |  FROM p1
      |  WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      |SELECT user_id, make_timestamp(v_tsu) AS v_ts,
      |  make_timestamp(c_tsu) AS c_ts, ts AS p_ts
      |FROM p2
      |WHERE event_type = 'purchase' AND c_tsu IS NOT NULL
      |  AND (le IS NULL OR le <= v_tsu)
      |ORDER BY user_id, p_ts""".stripMargin

  /** JSON key profiling ([[graft.ops.Profiling.jsonKeyProfile]]) over a
    * typed-variant props column (the q33 synthesize-in-query device —
    * the real props carry one key): purchases gain integer cents and a
    * currency string, views a page string, errors a boolean, so the
    * profile exercises every JSON scalar spelling. Each key's count,
    * distinct values, and min/max are hash-pinned; the oracle parses
    * the identical JSON with its own json functions. */
  def q172JsonProfile(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val k = get_json_object(col("props"), "$.k")
    val cents = round(col("value") * 100).cast("long").cast("string")
    val props2 = when(col("event_type") === "purchase",
        concat(lit("{\"k\": "), k, lit(", \"amount\": "), cents,
          lit(", \"cur\": \"usd\"}")))
      .when(col("event_type") === "view",
        concat(lit("{\"k\": "), k, lit(", \"page\": \"p"), k, lit("\"}")))
      .when(col("event_type") === "error",
        concat(lit("{\"k\": "), k, lit(", \"fatal\": true}")))
      .otherwise(col("props"))
    graft.ops.Profiling.jsonKeyProfile(
        ev.select(props2.as("props")), "props")
      .orderBy(col("key"))
  }

  val q172Sql: String =
    """WITH p2 AS (
      |  SELECT CASE
      |    WHEN event_type = 'purchase' THEN
      |      '{"k": ' || json_extract_string(props, '$.k') || ', "amount": ' ||
      |      CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR) ||
      |      ', "cur": "usd"}'
      |    WHEN event_type = 'view' THEN
      |      '{"k": ' || json_extract_string(props, '$.k') || ', "page": "p' ||
      |      json_extract_string(props, '$.k') || '"}'
      |    WHEN event_type = 'error' THEN
      |      '{"k": ' || json_extract_string(props, '$.k') || ', "fatal": true}'
      |    ELSE props END AS pj
      |  FROM events WHERE props IS NOT NULL),
      |kv AS (
      |  SELECT unnest(json_keys(pj)) AS key, pj FROM p2),
      |kv2 AS (
      |  SELECT key, json_extract_string(pj, '$.' || key) AS val FROM kv)
      |SELECT key, CAST(count(*) AS BIGINT) AS n,
      |  count(DISTINCT val) AS n_distinct,
      |  min(val) AS min_val, max(val) AS max_val
      |FROM kv2 GROUP BY key ORDER BY key""".stripMargin

  /** Windowed PSI drift monitor ([[EventStreams.windowedPsi]], batch
    * twin): per 1-hour window, the decile PSI of `value` against the
    * corpus-wide histogram — serve-time drift alarms with every
    * per-window score hash-pinned. The reference histogram is collected
    * once (ten numbers) and inlined as literals, exactly as a deployed
    * monitor would carry its trained-on baseline; the oracle recomputes
    * the same baseline in SQL. The stream side of the identical code
    * path is pinned ≡-batch in StreamingSpec. */
  def q193WindowedPsi(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val ref = ev.filter(col("value").isNotNull)
      .groupBy(EventStreams.valueBin(500.0).as("__b"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    EventStreams.windowedPsi(ev, ref).orderBy(col("win_start"))
  }

  val q193Sql: String =
    """WITH e AS (
      |  SELECT CAST(epoch(time_bucket(INTERVAL '1 hour',
      |      CAST(ts AS TIMESTAMP))) AS BIGINT) AS h,
      |    CAST(least(greatest(floor(value / CAST(500.0 AS DOUBLE) * 10),
      |      0), 9) AS BIGINT) AS bin
      |  FROM events WHERE value IS NOT NULL),
      |ref AS (SELECT bin, CAST(count(*) AS BIGINT) AS gc FROM e GROUP BY 1),
      |rt AS (SELECT CAST(sum(gc) AS BIGINT) AS nn FROM ref),
      |wc AS (SELECT h, bin, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY 1, 2),
      |wt AS (SELECT h, CAST(sum(c) AS BIGINT) AS n FROM wc GROUP BY 1),
      |dims AS (SELECT CAST(i AS BIGINT) AS bin FROM range(0, 10) t(i)),
      |dense AS (
      |  SELECT wt.h, wt.n, dims.bin, coalesce(wc.c, 0) AS cc,
      |    coalesce(ref.gc, 0) AS gc, rt.nn
      |  FROM wt CROSS JOIN dims CROSS JOIN rt
      |  LEFT JOIN wc ON wc.h = wt.h AND wc.bin = dims.bin
      |  LEFT JOIN ref ON ref.bin = dims.bin),
      |terms AS (
      |  SELECT h, n,
      |    CAST(round(
      |      ((CAST(cc AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
      |         (CAST(n AS DOUBLE) + CAST(5.0 AS DOUBLE))
      |       - (CAST(gc AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
      |         (CAST(nn AS DOUBLE) + CAST(5.0 AS DOUBLE)))
      |      * ln(((CAST(cc AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
      |         (CAST(n AS DOUBLE) + CAST(5.0 AS DOUBLE)))
      |        / ((CAST(gc AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
      |         (CAST(nn AS DOUBLE) + CAST(5.0 AS DOUBLE)))), 12)
      |      AS DECIMAL(27,15)) AS tm
      |  FROM dense)
      |SELECT h AS win_start, CAST(max(n) AS BIGINT) AS n,
      |  round(CAST(sum(tm) AS DOUBLE), 6) AS psi
      |FROM terms GROUP BY h ORDER BY h""".stripMargin

  /** Per-SOURCE windowed PSI ([[EventStreams.keyedWindowedPsi]], batch
    * twin): the q193 monitor in its production shape — every event type
    * scored per hour against ITS OWN corpus-wide baseline, one keyed
    * aggregation, per-source alarms. The per-source baselines (a few
    * event types × 10 bins) are collected once and ride as a literal map;
    * the oracle rebuilds them in SQL. Stream ≡ batch is pinned in
    * StreamingSpec alongside q193's. */
  def q199KeyedWindowedPsi(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val ref = ev.filter(col("value").isNotNull && col("event_type").isNotNull)
      .groupBy(col("event_type"),
        EventStreams.valueBin(500.0).as("__b"))
      .agg(count(lit(1)).as("__c"))
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) =>
        k -> rows.map(r => r.getLong(1) -> r.getLong(2)).toSeq
      }
    EventStreams.keyedWindowedPsi(ev, "event_type", ref)
      .orderBy(col("win_start"), col("source"))
  }

  val q199Sql: String =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(epoch(time_bucket(INTERVAL '1 hour',
      |      CAST(ts AS TIMESTAMP))) AS BIGINT) AS h,
      |    CAST(least(greatest(floor(value / CAST(500.0 AS DOUBLE) * 10),
      |      0), 9) AS BIGINT) AS bin
      |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
      |ref AS (
      |  SELECT event_type, bin, CAST(count(*) AS BIGINT) AS gc
      |  FROM e GROUP BY 1, 2),
      |rt AS (
      |  SELECT event_type, CAST(sum(gc) AS BIGINT) AS nn
      |  FROM ref GROUP BY 1),
      |wc AS (
      |  SELECT event_type, h, bin, CAST(count(*) AS BIGINT) AS c
      |  FROM e GROUP BY 1, 2, 3),
      |wt AS (
      |  SELECT event_type, h, CAST(sum(c) AS BIGINT) AS n
      |  FROM wc GROUP BY 1, 2),
      |dims AS (SELECT CAST(i AS BIGINT) AS bin FROM range(0, 10) t(i)),
      |dense AS (
      |  SELECT wt.event_type, wt.h, wt.n, dims.bin, coalesce(wc.c, 0) AS cc,
      |    coalesce(ref.gc, 0) AS gc, rt.nn
      |  FROM wt CROSS JOIN dims
      |  JOIN rt ON rt.event_type = wt.event_type
      |  LEFT JOIN wc ON wc.event_type = wt.event_type
      |    AND wc.h = wt.h AND wc.bin = dims.bin
      |  LEFT JOIN ref ON ref.event_type = wt.event_type
      |    AND ref.bin = dims.bin),
      |terms AS (
      |  SELECT event_type, h, n,
      |    CAST(round(
      |      ((CAST(cc AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
      |         (CAST(n AS DOUBLE) + CAST(5.0 AS DOUBLE))
      |       - (CAST(gc AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
      |         (CAST(nn AS DOUBLE) + CAST(5.0 AS DOUBLE)))
      |      * ln(((CAST(cc AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
      |         (CAST(n AS DOUBLE) + CAST(5.0 AS DOUBLE)))
      |        / ((CAST(gc AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
      |         (CAST(nn AS DOUBLE) + CAST(5.0 AS DOUBLE)))), 12)
      |      AS DECIMAL(27,15)) AS tm
      |  FROM dense)
      |SELECT h AS win_start, event_type AS source,
      |  CAST(max(n) AS BIGINT) AS n,
      |  round(CAST(sum(tm) AS DOUBLE), 6) AS psi
      |FROM terms GROUP BY h, event_type ORDER BY win_start, source""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q199_keyed_windowed_psi" -> (q199KeyedWindowedPsi _),
    "q193_windowed_psi" -> (q193WindowedPsi _),
    "q172_json_profile" -> (q172JsonProfile _),
    "q164_sequence_match" -> (q164SequenceMatch _),
    "q158_session_paths" -> (q158SessionPaths _),
    "q152_type_trend" -> (q152TypeTrend _),
    "q145_attribution" -> (q145Attribution _),
    "q142_hourly_anomaly" -> (q142HourlyAnomaly _),
    "q134_decay_score" -> (q134DecayScore _),
    "q111_user_history" -> (q111UserHistory _),
    "q65_gapfill" -> (q65GapFill _),
    "q67_funnel" -> (q67Funnel _),
    "q68_retention" -> (q68Retention _),
    "q69_sliding_window" -> (q69SlidingWindow _),
    "q50_event_window" -> (q50EventWindow _),
    "q51_sessionize" -> (q51Sessionize _),
    "q52_type_stats" -> (q52TypeStats _))

  val oracles: Map[String, String] = Map(
    "q193_windowed_psi" -> q193Sql,
    "q199_keyed_windowed_psi" -> q199Sql,
    "q172_json_profile" -> q172Sql,
    "q164_sequence_match" -> q164Sql,
    "q152_type_trend" -> q152Sql,
    "q158_session_paths" -> q158Sql,
    "q145_attribution" -> q145Sql,
    "q142_hourly_anomaly" -> q142Sql,
    "q134_decay_score" -> q134Sql,
    "q111_user_history" -> q111Sql,
    "q65_gapfill" -> q65Sql,
    "q67_funnel" -> q67Sql,
    "q68_retention" -> q68Sql,
    "q69_sliding_window" -> q69Sql,
    "q50_event_window" -> q50Sql,
    "q51_sessionize" -> q51Sql,
    "q52_type_stats" -> q52Sql)
}
