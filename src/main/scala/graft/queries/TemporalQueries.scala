package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TemporalJoins

/** Gate coverage for the temporal join operators over `events`.
  * DuckDB's native ASOF JOIN / BETWEEN theta join are the oracles, so these
  * also pin our composed plans against an independent implementation of the
  * same semantics. */
object TemporalQueries {

  /** Backward as-of: for each click, the user's latest prior-or-equal
    * purchase (value + time); null when none. */
  def q70AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("value").as("p_value0"), col("ts").as("p_ts0"))
    TemporalJoins.asofJoin(clicks, purchases,
        keyCol = "user_id", leftTimeCol = "ts", rightTimeCol = "ts",
        rightCols = Map("p_value0" -> "p_value", "p_ts0" -> "p_ts"))
      .select(col("event_id"), col("user_id"),
        round(col("p_value"), 2).as("p_value"),
        unix_timestamp(col("p_ts")).as("p_ts"))
      .orderBy(col("event_id"))
  }

  val q70Sql: String =
    """WITH clicks AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
      |               FROM events WHERE event_type = 'click'),
      |     purchases AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
      |               FROM events WHERE event_type = 'purchase')
      |SELECT c.event_id, c.user_id,
      |  round(p.value, 2) AS p_value,
      |  CAST(floor(epoch(p.ts)) AS BIGINT) AS p_ts
      |FROM clicks c ASOF LEFT JOIN purchases p
      |  ON c.user_id = p.user_id AND p.ts <= c.ts
      |ORDER BY c.event_id""".stripMargin

  /** Range join: events of the same user within ±5 minutes of each
    * purchase, counted per purchase (binned-equi-join plan). */
  def q71RangeJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val windows = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        (col("ts").cast("long") - 300).as("w_start"),
        (col("ts").cast("long") + 300).as("w_end"))
    val points = ev.select(col("user_id"), col("event_id"), col("ts"))
    TemporalJoins.rangeJoinBinned(windows, points,
        keyCol = "user_id", startCol = "w_start", endCol = "w_end",
        tsCol = "ts", binWidthSec = 600)
      .groupBy(col("purchase_id"))
      .agg(count(lit(1)).as("n_nearby"))
      .orderBy(col("purchase_id"))
  }

  val q71Sql: String =
    """WITH ev AS (SELECT event_id, user_id, event_type,
      |              CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS tss
      |            FROM events)
      |SELECT p.event_id AS purchase_id, count(*) AS n_nearby
      |FROM ev p JOIN ev e
      |  ON p.user_id = e.user_id AND e.tss BETWEEN p.tss - 300 AND p.tss + 300
      |WHERE p.event_type = 'purchase'
      |GROUP BY p.event_id
      |ORDER BY purchase_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_asof_join" -> (q70AsofJoin _),
    "q71_range_join" -> (q71RangeJoin _))

  val oracles: Map[String, String] = Map(
    "q70_asof_join" -> q70Sql,
    "q71_range_join" -> q71Sql)
}
