package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_event_window" -> (q50EventWindow _),
    "q51_sessionize" -> (q51Sessionize _),
    "q52_type_stats" -> (q52TypeStats _))

  val oracles: Map[String, String] = Map(
    "q50_event_window" -> q50Sql,
    "q51_sessionize" -> q51Sql,
    "q52_type_stats" -> q52Sql)
}
