package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.GraphOps

/** Gate coverage for iterative graph measures: PageRank over the
  * customer↔supplier interaction graph (an edge per customer/supplier
  * pair connected through an order's lineitems, symmetrized so every
  * vertex has outlinks). The DuckDB oracle unrolls the same three damped
  * iterations as nested CTEs — aggregation inside a recursive CTE is not
  * portable SQL, a fixed unroll is — and every reduction on both sides is
  * a decimal sum, so the doubles agree bitwise before the 9-dp round.
  */
object GraphQueries {

  /** Symmetrized customer↔supplier interaction edges — one edge per
    * (customer, supplier) pair connected through an order's lineitems.
    * Graph construction is index prep (a serving system builds the graph
    * once and runs many measures over it), so the materialized edge set
    * is memoized per (session, dir); q96 and q99 share it. */
  // keyed by the session REFERENCE (SparkSession equality is identity):
  // an identityHashCode key could collide with a later session at the
  // same address after GC and hand out checkpoint blocks of a stopped
  // context. Stale-session entries are few (sessions per JVM) and tiny.
  private val edgeCache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String), DataFrame]

  private def interactionEdges(s: SparkSession, d: String): DataFrame =
    edgeCache.getOrElseUpdate((s, d), {
      val pairs = Tables.orders(s, d)
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("src"),
          concat(lit("s"), col("l_suppkey")).as("dst"))
        .distinct()
      pairs.unionByName(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint()
    })

  def q96Pagerank(s: SparkSession, d: String): DataFrame = {
    GraphOps.pageRank(interactionEdges(s, d), "src", "dst",
        iters = 3, damping = 0.85)
      .select(col("vertex"), round(col("rank"), 9).as("rank"))
      .orderBy(col("vertex"))
  }

  val q96Sql: String = {
    def step(prev: Int, cur: Int): String =
      s"""i$cur AS (
         |  SELECT d.dst AS v, CAST(sum(CAST(p.r / d.outdeg AS DECIMAL(38,18))) AS DOUBLE) AS s
         |  FROM deg d JOIN p$prev p ON d.src = p.v GROUP BY d.dst
         |), p$cur AS (
         |  SELECT verts.v, CAST(0.15 AS DOUBLE)/(SELECT n FROM nn) + CAST(0.85 AS DOUBLE) * coalesce(i$cur.s, CAST(0 AS DOUBLE)) AS r
         |  FROM verts LEFT JOIN i$cur ON verts.v = i$cur.v
         |)""".stripMargin
    s"""WITH pairs AS (
       |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |), edges AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
       |verts AS (SELECT DISTINCT src AS v FROM edges),
       |nn AS (SELECT count(*) AS n FROM verts),
       |deg0 AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
       |deg AS (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg0 d ON e.src = d.src),
       |p0 AS (SELECT v, CAST(1 AS DOUBLE)/(SELECT n FROM nn) AS r FROM verts),
       |${step(0, 1)},
       |${step(1, 2)},
       |${step(2, 3)}
       |SELECT v AS vertex, round(p3.r, 9) AS rank FROM p3 ORDER BY vertex""".stripMargin
  }

  /** Two rounds of clamped majority label propagation: suppliers seeded
    * with s_suppkey % 5, customers (and back-propagated suppliers) adopt
    * the majority label of labeled neighbors, smaller label winning ties.
    * Deterministic by construction (integer votes, total-ordered
    * tie-break), so the full 1,600-vertex assignment hash-matches. */
  def q99LabelProp(s: SparkSession, d: String): DataFrame = {
    val seeds = Tables.supplier(s, d)
      .select(concat(lit("s"), col("s_suppkey")).as("vertex"),
        (col("s_suppkey") % 5).as("label"))
    GraphOps.labelPropagation(interactionEdges(s, d), "src", "dst",
        seeds, "vertex", "label", iters = 2)
      .orderBy(col("vertex"))
  }

  val q99Sql: String = {
    def step(prev: Int, cur: Int): String =
      s"""v$cur AS (
         |  SELECT e.dst AS v, l.lbl, count(*) AS c
         |  FROM edges e JOIN l$prev l ON e.src = l.v AND l.lbl IS NOT NULL
         |  GROUP BY 1, 2
         |), w$cur AS (
         |  SELECT v, lbl FROM (
         |    SELECT v, lbl, row_number() OVER (PARTITION BY v ORDER BY c DESC, lbl) AS rn
         |    FROM v$cur) WHERE rn = 1
         |), l$cur AS (
         |  SELECT verts.v, coalesce(s.lbl, w$cur.lbl, l$prev.lbl) AS lbl
         |  FROM verts
         |  LEFT JOIN seeds s ON verts.v = s.v
         |  LEFT JOIN w$cur ON verts.v = w$cur.v
         |  LEFT JOIN l$prev ON verts.v = l$prev.v
         |)""".stripMargin
    s"""WITH pairs AS (
       |  SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |), edges AS (SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs),
       |verts AS (SELECT DISTINCT src AS v FROM edges),
       |seeds AS (SELECT 's' || s_suppkey AS v, s_suppkey % 5 AS lbl FROM supplier),
       |l0 AS (SELECT verts.v, s.lbl FROM verts LEFT JOIN seeds s ON verts.v = s.v),
       |${step(0, 1)},
       |${step(1, 2)}
       |SELECT v AS vertex, lbl AS label FROM l2 ORDER BY vertex""".stripMargin
  }

  /** Bradley–Terry preference strengths
    * ([[graft.ops.Preference.bradleyTerry]]) over a deterministic
    * judge: docs chain-paired inside their `doc_id % 50` cohort (lag
    * window), the higher unrounded quality score wins each game (tie →
    * smaller id), then 3 MM rounds fit per-doc strengths — every win
    * count and 6-dp strength hash-pinned. The reward-model data op:
    * pairwise comparisons distilled into scalar item quality. The oracle
    * unrolls the same 3 rounds with the q96 decimal-pinned-sum device. */
  /** Deterministic judge shared by q166/q182: docs chain-paired inside
    * their `doc_id % 50` cohort (lag window), the higher unrounded
    * quality score wins each game (tie → smaller id). */
  private def judgeComparisons(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .select(col("doc_id"),
        graft.ops.TextFunctions.qualityScoreRaw(col("text")).as("__q"),
        (col("doc_id") % 50).as("__grp"))
    val w = Window.partitionBy(col("__grp")).orderBy(col("doc_id"))
    val lagged = docs
      .withColumn("__pid", lag(col("doc_id"), 1).over(w))
      .withColumn("__pq", lag(col("__q"), 1).over(w))
      .filter(col("__pid").isNotNull)
    val iWins = col("__q") > col("__pq") ||
      (col("__q") === col("__pq") && col("doc_id") < col("__pid"))
    lagged.select(
      when(iWins, col("doc_id")).otherwise(col("__pid")).as("winner"),
      when(iWins, col("__pid")).otherwise(col("doc_id")).as("loser"))
  }

  /** DuckDB CTE chain producing the same `cmp(winner, loser)` table. */
  private val judgeCmpSql: String =
    s"""docs AS (
       |  SELECT doc_id,
       |    ${graft.ops.TextFunctions.qualityRawSql} AS q,
       |    doc_id % 50 AS grp
       |  FROM documents),
       |lagged AS (
       |  SELECT doc_id, q, grp,
       |    lag(doc_id) OVER (PARTITION BY grp ORDER BY doc_id) AS pid,
       |    lag(q) OVER (PARTITION BY grp ORDER BY doc_id) AS pq
       |  FROM docs),
       |cmp AS (
       |  SELECT CASE WHEN q > pq OR (q = pq AND doc_id < pid)
       |           THEN doc_id ELSE pid END AS winner,
       |         CASE WHEN q > pq OR (q = pq AND doc_id < pid)
       |           THEN pid ELSE doc_id END AS loser
       |  FROM lagged WHERE pid IS NOT NULL)""".stripMargin

  def q166BradleyTerry(s: SparkSession, d: String): DataFrame =
    graft.ops.Preference.bradleyTerry(judgeComparisons(s, d),
        "winner", "loser", iters = 3)
      .orderBy(col("item"))

  /** Per-doc win rate with the Wilson 95% interval
    * ([[graft.ops.Preference.winRateWilson]]) over the same
    * deterministic judge as q166 — the uncertainty-aware leaderboard
    * column next to the Bradley–Terry point estimate: an item's rate,
    * and the interval a dashboard sorts by so thin records don't
    * outrank well-measured ones. Integer counts + per-row arithmetic —
    * bit-stable by construction, every bound hash-pinned. */
  def q182WinRateCi(s: SparkSession, d: String): DataFrame =
    graft.ops.Preference.winRateWilson(judgeComparisons(s, d),
        "winner", "loser")
      .orderBy(col("item"))

  val q182Sql: String =
    s"""WITH $judgeCmpSql,
       |part AS (
       |  SELECT winner AS item, 1 AS w FROM cmp
       |  UNION ALL SELECT loser, 0 FROM cmp),
       |g AS (
       |  SELECT item, CAST(count(*) AS BIGINT) AS games,
       |    CAST(sum(w) AS BIGINT) AS wins
       |  FROM part GROUP BY 1),
       |wr AS (SELECT item, games, wins,
       |  wins / CAST(games AS DOUBLE) AS p,
       |  CAST(games AS DOUBLE) AS n,
       |  CAST(1.96 AS DOUBLE) AS z,
       |  CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) AS z2 FROM g)
       |SELECT item, games, wins, round(p, 6) AS win_rate,
       |  round((p + z2/(CAST(2.0 AS DOUBLE)*n)
       |    - z*sqrt(p*(CAST(1.0 AS DOUBLE)-p)/n
       |      + z2/(CAST(4.0 AS DOUBLE)*n*n)))
       |    / (CAST(1.0 AS DOUBLE) + z2/n), 6) AS ci_lo,
       |  round((p + z2/(CAST(2.0 AS DOUBLE)*n)
       |    + z*sqrt(p*(CAST(1.0 AS DOUBLE)-p)/n
       |      + z2/(CAST(4.0 AS DOUBLE)*n*n)))
       |    / (CAST(1.0 AS DOUBLE) + z2/n), 6) AS ci_hi
       |FROM wr ORDER BY item""".stripMargin

  val q166Sql: String = {
    def step(prev: Int, cur: Int): String =
      s"""d$cur AS (
         |  SELECT e.i AS item,
         |    CAST(sum(CAST(round(e.n / (si.s + sj.s), 12)
         |      AS DECIMAL(27,15))) AS DOUBLE) AS den
         |  FROM ed e JOIN s$prev si ON e.i = si.item
         |    JOIN s$prev sj ON e.j = sj.item
         |  GROUP BY e.i
         |), s$cur AS (
         |  SELECT w.item,
         |    (w.w + 0.5) / (coalesce(d$cur.den, CAST(0 AS DOUBLE))
         |      + round(1.0 / (sp.s + 1.0), 12)) AS s
         |  FROM wt w LEFT JOIN d$cur ON w.item = d$cur.item
         |    JOIN s$prev sp ON w.item = sp.item
         |)""".stripMargin
    s"""WITH $judgeCmpSql,
       |items AS (SELECT DISTINCT item FROM
       |  (SELECT winner AS item FROM cmp UNION ALL SELECT loser FROM cmp)),
       |wn AS (SELECT winner AS item, count(*) AS w FROM cmp GROUP BY 1),
       |wt AS (SELECT items.item, CAST(coalesce(w, 0) AS BIGINT) AS w
       |  FROM items LEFT JOIN wn USING (item)),
       |g AS (SELECT least(winner, loser) AS a, greatest(winner, loser) AS b,
       |  count(*) AS n FROM cmp GROUP BY 1, 2),
       |ed AS (SELECT a AS i, b AS j, n FROM g
       |  UNION ALL SELECT b, a, n FROM g),
       |s0 AS (SELECT item, CAST(1.0 AS DOUBLE) AS s FROM items),
       |${step(0, 1)},
       |${step(1, 2)},
       |${step(2, 3)}
       |SELECT w.item, w.w AS wins, round(s3.s, 6) AS strength
       |FROM wt w JOIN s3 ON w.item = s3.item ORDER BY w.item""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q96_pagerank" -> (q96Pagerank _),
    "q99_label_prop" -> (q99LabelProp _),
    "q166_bradley_terry" -> (q166BradleyTerry _),
    "q182_win_rate_ci" -> (q182WinRateCi _))

  val oracles: Map[String, String] = Map(
    "q96_pagerank" -> q96Sql,
    "q99_label_prop" -> q99Sql,
    "q166_bradley_terry" -> q166Sql,
    "q182_win_rate_ci" -> q182Sql)
}
