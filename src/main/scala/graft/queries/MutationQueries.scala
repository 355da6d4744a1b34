package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Mutations

/** Copy-on-write mutation gates: MERGE-style upsert and SCD-2 history,
  * the table-evolution operators a catalog-backed lakehouse pipeline
  * needs between full rewrites (SURVEY.md §2.1 ops 11–13 cover declare /
  * overwrite / drop; these are the row-level semantics on top). */
object MutationQueries {

  /** MERGE upsert into `customer`: keys ending 0–2 get a balance bump and
    * an UPDATED segment, keys ending 3 are re-inserted under shifted keys
    * as NEW customers; output is the full post-merge table — the gate
    * pins every row the merge touches and every row it must not touch. */
  def q84MergeUpsert(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val updates = cust.filter(col("c_custkey") % 10 < 3)
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        (col("c_acctbal") + lit(100.0)).as("c_acctbal"),
        lit("UPDATED").as("c_mktsegment"))
    val inserts = cust.filter(col("c_custkey") % 10 === 3)
      .select((col("c_custkey") + lit(1000000L)).as("c_custkey"),
        concat(lit("NEW-"), col("c_name")).as("c_name"),
        col("c_nationkey"), lit(0.0).as("c_acctbal"),
        lit("NEW").as("c_mktsegment"))
    Mutations.upsert(cust, updates.unionByName(inserts), Seq("c_custkey"))
      .orderBy(col("c_custkey"))
  }

  val q84Sql: String =
    """WITH inc AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    c_acctbal + 100.0 AS c_acctbal, 'UPDATED' AS c_mktsegment
      |  FROM customer WHERE c_custkey % 10 < 3
      |  UNION ALL
      |  SELECT c_custkey + 1000000, 'NEW-' || c_name, c_nationkey,
      |    0.0, 'NEW'
      |  FROM customer WHERE c_custkey % 10 = 3)
      |SELECT
      |  COALESCE(i.c_custkey, e.c_custkey) AS c_custkey,
      |  CASE WHEN i.c_custkey IS NOT NULL THEN i.c_name ELSE e.c_name END AS c_name,
      |  CASE WHEN i.c_custkey IS NOT NULL THEN i.c_nationkey ELSE e.c_nationkey END AS c_nationkey,
      |  CASE WHEN i.c_custkey IS NOT NULL THEN i.c_acctbal ELSE e.c_acctbal END AS c_acctbal,
      |  CASE WHEN i.c_custkey IS NOT NULL THEN i.c_mktsegment ELSE e.c_mktsegment END AS c_mktsegment
      |FROM customer e FULL OUTER JOIN inc i ON e.c_custkey = i.c_custkey
      |ORDER BY c_custkey""".stripMargin

  /** SCD-2 history of each user's event_type stream (users < 20): one row
    * per run of equal values with µs validity bounds and a current flag. */
  def q85Scd2(s: SparkSession, d: String): DataFrame =
    Mutations.scd2(
      Tables.events(s, d).filter(col("user_id") < 20)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type")),
      "user_id", Seq("ts", "event_id"), "event_type")
      .select(col("user_id"),
        unix_micros(col("valid_from")).as("valid_from_us"),
        unix_micros(col("valid_to")).as("valid_to_us"),
        col("event_type"), col("is_current"))
      .orderBy(col("user_id"), col("valid_from_us"))

  val q85Sql: String =
    """WITH src AS (
      |  SELECT user_id, ts, event_id, event_type
      |  FROM events WHERE user_id < 20),
      |marked AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    lag(event_type) OVER w AS prev, lag(1) OVER w AS has_prev
      |  FROM src
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |runs AS (
      |  SELECT user_id, ts, event_id, event_type FROM marked
      |  WHERE has_prev IS NULL OR prev IS DISTINCT FROM event_type)
      |SELECT user_id,
      |  epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us,
      |  lead(epoch_us(CAST(ts AS TIMESTAMP))) OVER w2 AS valid_to_us,
      |  event_type,
      |  lead(ts) OVER w2 IS NULL AS is_current
      |FROM runs
      |WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, valid_from_us""".stripMargin

  /** CDC between two customer snapshots: balance bumps (updated), keys
    * ending 4 dropped (deleted), keys ending 3 re-inserted shifted
    * (added); unchanged rows must NOT appear. */
  def q89SnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val newSnap = cust.filter(col("c_custkey") % 10 =!= 4)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 10 < 3, col("c_acctbal") + lit(100.0))
          .otherwise(col("c_acctbal")))
      .unionByName(cust.filter(col("c_custkey") % 10 === 3)
        .select((col("c_custkey") + lit(1000000L)).as("c_custkey"),
          col("c_name"), col("c_nationkey"), col("c_acctbal"),
          col("c_mktsegment")))
    Mutations.snapshotDiff(cust, newSnap, Seq("c_custkey"))
      .select(col("change_type"), col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_custkey"), col("change_type"))
  }

  val q89Sql: String =
    """WITH newsnap AS (
      |  SELECT c_custkey, c_name, c_nationkey,
      |    CASE WHEN c_custkey % 10 < 3 THEN c_acctbal + 100.0
      |         ELSE c_acctbal END AS c_acctbal,
      |    c_mktsegment
      |  FROM customer WHERE c_custkey % 10 <> 4
      |  UNION ALL
      |  SELECT c_custkey + 1000000, c_name, c_nationkey, c_acctbal,
      |    c_mktsegment
      |  FROM customer WHERE c_custkey % 10 = 3)
      |SELECT * FROM (
      |  SELECT CASE WHEN o.c_custkey IS NULL THEN 'added'
      |              WHEN n.c_custkey IS NULL THEN 'deleted'
      |              WHEN (o.c_name IS DISTINCT FROM n.c_name)
      |                OR (o.c_nationkey IS DISTINCT FROM n.c_nationkey)
      |                OR (o.c_acctbal IS DISTINCT FROM n.c_acctbal)
      |                OR (o.c_mktsegment IS DISTINCT FROM n.c_mktsegment)
      |              THEN 'updated' END AS change_type,
      |    COALESCE(n.c_custkey, o.c_custkey) AS c_custkey,
      |    CASE WHEN n.c_custkey IS NOT NULL THEN n.c_acctbal
      |         ELSE o.c_acctbal END AS c_acctbal
      |  FROM customer o FULL OUTER JOIN newsnap n
      |    ON o.c_custkey = n.c_custkey)
      |WHERE change_type IS NOT NULL
      |ORDER BY c_custkey, change_type""".stripMargin

  /** Incremental rollup maintenance
    * ([[Mutations.incrementalRollup]]): the per-priority (cnt, total)
    * state built from the "old" orders (o_orderkey % 4 ≠ 0) is
    * incrementally merged with a CDC delta — inserts (the % 4 = 0 rows)
    * and deletes (old rows with % 7 = 0, full delete images). The
    * oracle is the FROM-SCRATCH rebuild over kept+inserted facts:
    * hash-match proves the maintained state is exactly the rebuild,
    * which is the self-maintainability contract. */
  def q154IncrementalRollup(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val old = orders.filter(col("o_orderkey") % 4 =!= 0)
    val base = old.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(27,15)")).as("total"))
    val inserts = orders.filter(col("o_orderkey") % 4 === 0)
      .select(lit("I").as("op"), col("o_orderpriority"), col("o_totalprice"))
    val deletes = old.filter(col("o_orderkey") % 7 === 0)
      .select(lit("D").as("op"), col("o_orderpriority"), col("o_totalprice"))
    Mutations.incrementalRollup(base, inserts.unionByName(deletes),
        "o_orderpriority", "op", "o_totalprice")
      .select(col("o_orderpriority"), col("cnt"),
        round(col("total").cast("double"), 6).as("total"))
      .orderBy(col("o_orderpriority"))
  }

  val q154Sql: String =
    """WITH oldf AS (
      |  SELECT * FROM orders WHERE o_orderkey % 4 <> 0
      |), f AS (
      |  SELECT * FROM oldf WHERE o_orderkey % 7 <> 0
      |  UNION ALL
      |  SELECT * FROM orders WHERE o_orderkey % 4 = 0
      |)
      |SELECT o_orderpriority, count(*) AS cnt,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(27,15))) AS DOUBLE), 6)
      |    AS total
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  /** The DELETE-TO-ZERO (tombstone) path of
    * [[Mutations.incrementalRollup]], gated at per-customer key grain:
    * every order of every 5th customer arrives as a full delete image, so
    * those keys' maintained counts reach exactly 0 and the keys must
    * VANISH from the state (the state-size bound the streaming twin
    * [[graft.streaming.EventStreams.rollupStream]] enforces via
    * `state.remove()` — StreamingSpec pins stream ≡ batch; this row pins
    * batch ≡ rebuild on the same shape). A sprinkle of inserts on
    * surviving keys proves mixed batches don't disturb the tombstones.
    * The oracle is the from-scratch rebuild, which simply never sees the
    * deleted customers — any resurrected or lingering key breaks the
    * row-count and hash alike. */
  def q160RollupTombstone(s: SparkSession, d: String): DataFrame = {
    val orders = Tables.orders(s, d)
    val base = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(27,15)")).as("total"))
    val deletes = orders.filter(col("o_custkey") % 5 === 0)
      .select(lit("D").as("op"), col("o_custkey"), col("o_totalprice"))
    val inserts = orders
      .filter(col("o_custkey") % 5 === 1 && col("o_orderkey") % 3 === 0)
      .select(lit("I").as("op"), col("o_custkey"), col("o_totalprice"))
    Mutations.incrementalRollup(base, deletes.unionByName(inserts),
        "o_custkey", "op", "o_totalprice")
      .select(col("o_custkey"), col("cnt"),
        round(col("total").cast("double"), 6).as("total"))
      .orderBy(col("o_custkey"))
  }

  val q160Sql: String =
    """WITH f AS (
      |  SELECT o_custkey, o_totalprice FROM orders WHERE o_custkey % 5 <> 0
      |  UNION ALL
      |  SELECT o_custkey, o_totalprice FROM orders
      |  WHERE o_custkey % 5 = 1 AND o_orderkey % 3 = 0
      |)
      |SELECT o_custkey, CAST(count(*) AS BIGINT) AS cnt,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(27,15))) AS DOUBLE), 6)
      |    AS total
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q154_incremental_rollup" -> (q154IncrementalRollup _),
    "q160_rollup_tombstone" -> (q160RollupTombstone _),
    "q84_merge_upsert" -> (q84MergeUpsert _),
    "q85_scd2" -> (q85Scd2 _),
    "q89_snapshot_diff" -> (q89SnapshotDiff _))

  val oracles: Map[String, String] = Map(
    "q154_incremental_rollup" -> q154Sql,
    "q160_rollup_tombstone" -> q160Sql,
    "q84_merge_upsert" -> q84Sql,
    "q85_scd2" -> q85Sql,
    "q89_snapshot_diff" -> q89Sql)
}
