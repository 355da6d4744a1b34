package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Profiling, Resolution}

/** Gate coverage for entity resolution (blocked sorted-neighborhood
  * fuzzy key matching), triangle counting, and single-pass column
  * profiling. All integer/string outputs — exact oracle compares.
  */
object ResolutionQueries {

  /** Fuzzy record linkage over part names: originals (partkey < 150)
    * plus planted mutants (even keys, last character rewritten, re-keyed
    * +10000), paired by blocked sorted-neighborhood (4-char prefix
    * blocks, window 7) and verified with Levenshtein ≤ 2. Recovers the
    * planted original↔mutant pairs plus exact-duplicate names. */
  def q103FuzzyNames(s: SparkSession, d: String): DataFrame = {
    val base = Tables.part(s, d).filter(col("p_partkey") < 150)
      .select(col("p_partkey").as("rec_id"), col("p_name").as("name"))
    val mutants = base.filter(col("rec_id") % 2 === 0)
      .select((col("rec_id") + 10000L).as("rec_id"),
        regexp_replace(col("name"), ".$", "x").as("name"))
    Resolution.blockedFuzzyPairs(base.unionByName(mutants), "rec_id", "name",
        substring(col("name"), 1, 4), window = 7, maxDist = 2)
      .orderBy(col("id_a"), col("id_b"))
  }

  val q103Sql: String =
    """WITH recs AS (
      |  SELECT p_partkey AS rec_id, p_name AS name FROM part WHERE p_partkey < 150
      |  UNION ALL
      |  SELECT p_partkey + 10000, regexp_replace(p_name, '.$', 'x')
      |  FROM part WHERE p_partkey < 150 AND p_partkey % 2 = 0),
      |pos AS (
      |  SELECT rec_id, name, substr(name, 1, 4) AS b,
      |    CAST(row_number() OVER (PARTITION BY substr(name, 1, 4)
      |      ORDER BY name, rec_id) AS BIGINT) AS p
      |  FROM recs)
      |SELECT a.rec_id AS id_a, c.rec_id AS id_b, a.name AS key_a, c.name AS key_b,
      |  CAST(levenshtein(a.name, c.name) AS BIGINT) AS dist
      |FROM pos a JOIN pos c ON a.b = c.b AND c.p > a.p AND c.p <= a.p + 7
      |WHERE levenshtein(a.name, c.name) <= 2
      |ORDER BY id_a, id_b""".stripMargin

  /** Multi-pass fuzzy linkage: even-keyed mutants rewrite the FIRST
    * character (invisible to the prefix block of q103), odd-keyed
    * mutants the last (invisible to an ignore-first-char key). Pass 1
    * blocks on the 4-char prefix, pass 2 on the name minus its first
    * character; the union-dedup recovers both planted families — the
    * standard recall repair for single-pass blocking. */
  def q112MultiPassFuzzy(s: SparkSession, d: String): DataFrame = {
    val base = Tables.part(s, d).filter(col("p_partkey") < 150)
      .select(col("p_partkey").as("rec_id"), col("p_name").as("name"))
    val mutants = base
      .select((col("rec_id") + 10000L).as("rec_id"),
        when(col("rec_id") % 2 === 0,
          regexp_replace(col("name"), "^.", "z"))
          .otherwise(regexp_replace(col("name"), ".$", "x")).as("name"))
    val recs = base.unionByName(mutants)
    Resolution.multiPassFuzzyPairs(recs, "rec_id", "name",
        Seq(substring(col("name"), 1, 4),
          col("name").substr(lit(2), length(col("name")))),
        window = 7, maxDist = 2)
      .orderBy(col("id_a"), col("id_b"))
  }

  val q112Sql: String =
    """WITH recs AS (
      |  SELECT p_partkey AS rec_id, p_name AS name FROM part WHERE p_partkey < 150
      |  UNION ALL
      |  SELECT p_partkey + 10000,
      |    CASE WHEN p_partkey % 2 = 0 THEN regexp_replace(p_name, '^.', 'z')
      |         ELSE regexp_replace(p_name, '.$', 'x') END
      |  FROM part WHERE p_partkey < 150),
      |pos1 AS (
      |  SELECT rec_id, name, substr(name, 1, 4) AS b,
      |    CAST(row_number() OVER (PARTITION BY substr(name, 1, 4)
      |      ORDER BY name, rec_id) AS BIGINT) AS p
      |  FROM recs),
      |pos2 AS (
      |  SELECT rec_id, name, substr(name, 2, length(name)) AS b,
      |    CAST(row_number() OVER (PARTITION BY substr(name, 2, length(name))
      |      ORDER BY name, rec_id) AS BIGINT) AS p
      |  FROM recs),
      |raw AS (
      |  SELECT a.rec_id AS ia, c.rec_id AS ib, a.name AS ka, c.name AS kb,
      |    CAST(levenshtein(a.name, c.name) AS BIGINT) AS dist
      |  FROM pos1 a JOIN pos1 c ON a.b = c.b AND c.p > a.p AND c.p <= a.p + 7
      |  WHERE levenshtein(a.name, c.name) <= 2
      |  UNION ALL
      |  SELECT a.rec_id, c.rec_id, a.name, c.name,
      |    CAST(levenshtein(a.name, c.name) AS BIGINT)
      |  FROM pos2 a JOIN pos2 c ON a.b = c.b AND c.p > a.p AND c.p <= a.p + 7
      |  WHERE levenshtein(a.name, c.name) <= 2),
      |canon AS (
      |  SELECT least(ia, ib) AS id_a, greatest(ia, ib) AS id_b,
      |    CASE WHEN ia <= ib THEN ka ELSE kb END AS key_a,
      |    CASE WHEN ia <= ib THEN kb ELSE ka END AS key_b, dist
      |  FROM raw)
      |SELECT id_a, id_b, min(key_a) AS key_a, min(key_b) AS key_b,
      |  min(dist) AS dist
      |FROM canon GROUP BY id_a, id_b ORDER BY id_a, id_b""".stripMargin

  /** Triangle census of the supplier co-occurrence graph (suppliers
    * sharing an order, every 10th order): vertex/edge/wedge/triangle
    * counts and the global clustering coefficient. Runs the default
    * (degree-ordered, hub-safe) orientation; the oracle replays the
    * census with the naive join — orientation never changes counts. */
  def q104Triangles(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).filter(col("l_orderkey") % 10 === 0)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk")).distinct()
    val edges = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
      .select(col("x.sk").as("src"), col("y.sk").as("dst"))
    Resolution.triangleStats(edges, "src", "dst")
      .select(col("n_vertices"), col("n_edges"), col("n_wedges"),
        col("n_triangles"), round(col("clustering"), 6).as("clustering"))
  }

  val q104Sql: String =
    """WITH li AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_suppkey AS sk
      |  FROM lineitem WHERE l_orderkey % 10 = 0),
      |e AS (
      |  SELECT DISTINCT x.sk AS a, y.sk AS b
      |  FROM li x JOIN li y ON x.ok = y.ok AND x.sk < y.sk),
      |deg AS (
      |  SELECT v, count(*) AS d
      |  FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v),
      |w AS (
      |  SELECT count(*) AS n_vertices,
      |    CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS n_wedges FROM deg),
      |t AS (
      |  SELECT count(*) AS n_triangles
      |  FROM e e1 JOIN e e2 ON e1.b = e2.a
      |       JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      |m AS (SELECT count(*) AS n_edges FROM e)
      |SELECT n_vertices, n_edges, n_wedges, n_triangles,
      |  round(CASE WHEN n_wedges = 0 THEN 0.0
      |             ELSE 3.0 * n_triangles / n_wedges END, 6) AS clustering
      |FROM w, m, t""".stripMargin

  /** Triangle census on a deliberately HUB-SKEWED graph via the
    * degree-ordered orientation — the variant that survives celebrities.
    * The graph: every customer links to hub A, every even customer also
    * to hub B, customers chain to their successor, and the hubs link to
    * each other. Hub degrees are O(|customers|), so the id-oriented
    * wedge join would fan out quadratically at the hubs; orienting by
    * (degree, id) points every customer edge AT the hub, capping each
    * vertex's out-degree — the O(m^1.5) compact-forward bound. The
    * oracle replays the census with the naive oriented join (orientation
    * never changes the count), so the scale-safe path is hash-pinned. */
  def q118TrianglesSkewed(s: SparkSession, d: String): DataFrame = {
    val ck = Tables.customer(s, d).select(col("c_custkey").as("c"))
    val hubA = lit(10000000L)
    val hubB = lit(10000001L)
    val edges = ck.select(col("c").as("src"), hubA.as("dst"))
      .unionByName(ck.filter(col("c") % 2 === 0)
        .select(col("c").as("src"), hubB.as("dst")))
      .unionByName(ck.select(col("c").as("src"), (col("c") + 1).as("dst")))
      .unionByName(s.range(1).select(hubA.as("src"), hubB.as("dst")))
    Resolution.triangleStatsDegreeOrdered(edges, "src", "dst")
      .select(col("n_vertices"), col("n_edges"), col("n_wedges"),
        col("n_triangles"), round(col("clustering"), 6).as("clustering"))
  }

  val q118Sql: String =
    """WITH ck AS (SELECT c_custkey AS c FROM customer),
      |edges0 AS (
      |  SELECT c AS src, CAST(10000000 AS BIGINT) AS dst FROM ck
      |  UNION ALL
      |  SELECT c, CAST(10000001 AS BIGINT) FROM ck WHERE c % 2 = 0
      |  UNION ALL
      |  SELECT c, c + 1 FROM ck
      |  UNION ALL
      |  SELECT CAST(10000000 AS BIGINT), CAST(10000001 AS BIGINT)),
      |e AS (
      |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |  FROM edges0 WHERE src <> dst),
      |deg AS (
      |  SELECT v, count(*) AS d
      |  FROM (SELECT a AS v FROM e UNION ALL SELECT b FROM e) GROUP BY v),
      |w AS (
      |  SELECT count(*) AS n_vertices,
      |    CAST(sum((d * (d - 1)) // 2) AS BIGINT) AS n_wedges FROM deg),
      |t AS (
      |  SELECT count(*) AS n_triangles
      |  FROM e e1 JOIN e e2 ON e1.b = e2.a
      |       JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
      |m AS (SELECT count(*) AS n_edges FROM e)
      |SELECT n_vertices, n_edges, n_wedges, n_triangles,
      |  round(CASE WHEN n_wedges = 0 THEN 0.0
      |             ELSE 3.0 * n_triangles / n_wedges END, 6) AS clustering
      |FROM w, m, t""".stripMargin

  /** Single-pass column profile of lineitem (nulls, exact distincts,
    * native-typed min/max) — the new-table-drop quality report. */
  private val ProfileCols =
    Seq("l_orderkey", "l_suppkey", "l_linenumber", "l_returnflag", "l_linestatus")

  def q105Profile(s: SparkSession, d: String): DataFrame =
    Profiling.profile(Tables.lineitem(s, d), ProfileCols)
      .orderBy(col("column"))

  val q105Sql: String = ProfileCols.map { c =>
    s"""SELECT '$c' AS "column", count(*) AS n_rows,
       |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       |  count(DISTINCT $c) AS n_distinct,
       |  CAST(min($c) AS VARCHAR) AS min_val, CAST(max($c) AS VARCHAR) AS max_val
       |FROM lineitem""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")

  /** Median/MAD robust outlier screen ([[Profiling.robustOutliers]]) on
    * l_extendedprice per supplier: every supplier's exact median, MAD,
    * and outlier count are hash-pinned, so the per-group exact
    * percentile, the 6 dp pre-rounding discipline, and the
    * 3·1.4826·MAD threshold comparison must replay identically. */
  def q139RobustOutliers(s: SparkSession, d: String): DataFrame =
    Profiling.robustOutliers(
        Tables.lineitem(s, d).select(col("l_suppkey"), col("l_extendedprice")),
        "l_suppkey", "l_extendedprice", cutoff = 3.0)
      .orderBy(col("l_suppkey"))

  val q139Sql: String =
    """WITH med AS (
      |  SELECT l_suppkey, round(quantile_cont(l_extendedprice, 0.5), 6) AS med
      |  FROM lineitem GROUP BY l_suppkey),
      |dev AS (
      |  SELECT l.l_suppkey, med,
      |    round(abs(l_extendedprice - med), 6) AS absdev
      |  FROM lineitem l JOIN med USING (l_suppkey)),
      |mad AS (
      |  SELECT l_suppkey, round(quantile_cont(absdev, 0.5), 6) AS mad
      |  FROM dev GROUP BY l_suppkey)
      |SELECT d.l_suppkey, CAST(count(*) AS BIGINT) AS n, d.med, m.mad,
      |  CAST(sum(CASE WHEN absdev > round(3.0 * 1.4826 * mad, 6)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM dev d JOIN mad m USING (l_suppkey)
      |GROUP BY d.l_suppkey, d.med, m.mad
      |ORDER BY l_suppkey""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q139_robust_outliers" -> (q139RobustOutliers _),
    "q103_fuzzy_names" -> (q103FuzzyNames _),
    "q112_multipass_fuzzy" -> (q112MultiPassFuzzy _),
    "q104_triangles" -> (q104Triangles _),
    "q118_triangles_skewed" -> (q118TrianglesSkewed _),
    "q105_profile" -> (q105Profile _))

  val oracles: Map[String, String] = Map(
    "q139_robust_outliers" -> q139Sql,
    "q103_fuzzy_names" -> q103Sql,
    "q112_multipass_fuzzy" -> q112Sql,
    "q104_triangles" -> q104Sql,
    "q118_triangles_skewed" -> q118Sql,
    "q105_profile" -> q105Sql)
}
