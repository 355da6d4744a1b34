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

  def q96Pagerank(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst"))
      .distinct()
    val edges = pairs.unionByName(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
    GraphOps.pageRank(edges, "src", "dst", iters = 3, damping = 0.85)
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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q96_pagerank" -> (q96Pagerank _))

  val oracles: Map[String, String] = Map(
    "q96_pagerank" -> q96Sql)
}
