package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second tranche of relational coverage (SURVEY.md §2.3): outer-join
  * variants, pattern matching, union-all aggregation, date arithmetic and
  * nested subqueries — same Spark-first + broadcast-dimension discipline as
  * [[RelationalQueries]]. */
object RelationalQueries2 {

  /** LEFT OUTER join preserving customers with no orders + null-safe agg. */
  def q23LeftOuter(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 250000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(col("o_orderkey")).as("n_big_orders"),
        count(lit(1)).as("n_rows"),
        round(sum(coalesce(col("o_totalprice"), lit(0.0))), 2).as("total"))
      .orderBy(col("c_mktsegment"))
  }

  val q23Sql: String =
    """SELECT c_mktsegment, count(o_orderkey) AS n_big_orders,
      | count(*) AS n_rows, round(sum(coalesce(o_totalprice, 0.0)), 2) AS total
      |FROM customer LEFT OUTER JOIN orders
      |  ON c_custkey = o_custkey AND o_totalprice > 250000
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** LIKE / regexp pattern filters (string-matching pushdown surface). */
  def q24Patterns(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_name").like("%widget%") ||
        col("p_type").rlike("^(PROMO|LARGE)$"))
      .select(col("p_partkey"), col("p_name"), col("p_type"))
      .orderBy(col("p_partkey"))

  val q24Sql: String =
    """SELECT p_partkey, p_name, p_type FROM part
      |WHERE p_name LIKE '%widget%' OR regexp_matches(p_type, '^(PROMO|LARGE)$')
      |ORDER BY p_partkey""".stripMargin

  /** UNION ALL of two differently-filtered scans, aggregated after. */
  def q25UnionAll(s: SparkSession, d: String): DataFrame = {
    val hi = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
      .select(col("o_orderstatus"), lit("high").as("band"), col("o_totalprice"))
    val lo = Tables.orders(s, d).filter(col("o_totalprice") < 10000)
      .select(col("o_orderstatus"), lit("low").as("band"), col("o_totalprice"))
    hi.unionAll(lo)
      .groupBy(col("o_orderstatus"), col("band"))
      .agg(count(lit(1)).as("n"), round(avg(col("o_totalprice")), 2).as("avg_price"))
      .orderBy(col("o_orderstatus"), col("band"))
  }

  val q25Sql: String =
    """SELECT o_orderstatus, band, count(*) AS n, round(avg(o_totalprice),2) AS avg_price
      |FROM (
      |  SELECT o_orderstatus, 'high' AS band, o_totalprice FROM orders WHERE o_totalprice > 300000
      |  UNION ALL
      |  SELECT o_orderstatus, 'low' AS band, o_totalprice FROM orders WHERE o_totalprice < 10000)
      |GROUP BY o_orderstatus, band ORDER BY o_orderstatus, band""".stripMargin

  /** Date arithmetic: order→ship latency per ship month. */
  def q26DateArithmetic(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).filter(col("l_orderkey") % 50 === 0)
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(
        date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"),
        datediff(col("l_shipdate"), col("o_orderdate")).cast("long").as("lag_days"))
      .groupBy(col("ship_month"))
      .agg(count(lit(1)).as("n"),
        round(avg(col("lag_days")), 4).as("avg_lag"),
        max(col("lag_days")).as("max_lag"))
      .orderBy(col("ship_month"))
  }

  val q26Sql: String =
    """SELECT strftime(l_shipdate, '%Y-%m') AS ship_month, count(*) AS n,
      | round(avg(CAST(datediff('day', CAST(o_orderdate AS TIMESTAMP), CAST(l_shipdate AS TIMESTAMP)) AS BIGINT)), 4) AS avg_lag,
      | CAST(max(datediff('day', CAST(o_orderdate AS TIMESTAMP), CAST(l_shipdate AS TIMESTAMP))) AS BIGINT) AS max_lag
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_orderkey % 50 = 0
      |GROUP BY 1 ORDER BY ship_month""".stripMargin

  /** Nested aggregation subquery: nations whose supplier count exceeds the
    * all-nation average (HAVING over a scalar subquery). */
  def q27NestedAgg(s: SparkSession, d: String): DataFrame = {
    val perNation = Tables.supplier(s, d)
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
    val avgCount = perNation.agg(avg(col("n_supp")).as("a"))
    perNation.join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(avgCount))
      .filter(col("n_supp") >= col("a"))
      .select(col("n_name"), col("n_supp"))
      .orderBy(col("n_name"))
  }

  val q27Sql: String =
    """SELECT n_name, n_supp FROM (
      |  SELECT s_nationkey, count(*) AS n_supp FROM supplier GROUP BY s_nationkey) t
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE n_supp >= (SELECT avg(cnt) FROM (
      |  SELECT count(*) AS cnt FROM supplier GROUP BY s_nationkey))
      |ORDER BY n_name""".stripMargin

  /** Window frame variants: range-between moving average + lead/lag. */
  def q28WindowFrames(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    Tables.orders(s, d)
      .filter(col("o_custkey") % 200 === 0)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(avg(col("o_totalprice")).over(w.rowsBetween(-2, 0)), 2).as("ma3"),
        round(lag(col("o_totalprice"), 1).over(w), 2).as("prev_price"),
        round(lead(col("o_totalprice"), 1).over(w), 2).as("next_price"),
        ntile(4).over(w).cast("long").as("quartile"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  val q28Sql: String =
    """SELECT o_custkey, o_orderkey,
      | round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
      |       ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS ma3,
      | round(lag(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey), 2) AS prev_price,
      | round(lead(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey), 2) AS next_price,
      | CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS BIGINT) AS quartile
      |FROM orders WHERE o_custkey % 200 = 0
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Array/map construction + higher-order SQL functions over groups. */
  def q29ArrayAgg(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .groupBy(col("n_regionkey"))
      .agg(sort_array(collect_list(col("n_name"))).as("nations"))
      .select(
        col("n_regionkey").cast("long").as("region"),
        size(col("nations")).cast("long").as("n"),
        element_at(col("nations"), 1).as("first_nation"),
        array_join(slice(col("nations"), 1, 3), ",").as("top3"))
      .orderBy(col("region"))

  val q29Sql: String =
    """SELECT CAST(n_regionkey AS BIGINT) AS region,
      | CAST(len(nations) AS BIGINT) AS n,
      | nations[1] AS first_nation,
      | array_to_string(nations[1:3], ',') AS top3
      |FROM (SELECT n_regionkey, list_sort(list(n_name)) AS nations
      |      FROM nation GROUP BY n_regionkey)
      |ORDER BY region""".stripMargin

  /** Arbitrary GROUPING SETS (beyond rollup/cube) with grouping() markers. */
  def q76GroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority,
        | CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
        | CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
        | count(*) AS n, round(sum(o_totalprice), 2) AS total
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
        |                        (o_orderstatus, o_orderpriority))
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST,
        |         g_status, g_prio""".stripMargin)
  }

  val q76Sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      | CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      | CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
      | count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
      |                        (o_orderstatus, o_orderpriority))
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST,
      |         g_status, g_prio""".stripMargin

  /** TPC-H Q22 pattern: wealthy-but-inactive customers — scalar subquery
    * threshold + anti join, grouped by nation. */
  def q82WealthyInactive(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("__avg_bal"))
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
      .select(col("o_custkey"))
    c.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("__avg_bal"))
      .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"),
        round(sum(col("c_acctbal")), 2).as("total_bal"))
      .orderBy(col("c_nationkey"))
  }

  val q82Sql: String =
    """SELECT c_nationkey, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
      |FROM customer
      |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin

  /** First-class pivot (wide aggregation): avg order value by priority,
    * pivoted over order status. Explicit pivot values keep the plan
    * single-pass (no distinct-value pre-query) — the at-scale form. */
  def q59Pivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(round(avg(col("o_totalprice")), 6))
      .orderBy(col("o_orderpriority"))

  val q59Sql: String =
    """SELECT o_orderpriority,
      | round(avg(CASE WHEN o_orderstatus='F' THEN o_totalprice END), 6) AS F,
      | round(avg(CASE WHEN o_orderstatus='O' THEN o_totalprice END), 6) AS O,
      | round(avg(CASE WHEN o_orderstatus='P' THEN o_totalprice END), 6) AS P
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Exact interpolated percentiles per group (the non-approximate
    * counterpart of q73's sketches): single aggregation, percentile()
    * holds the group's values — use q73's approx path when groups are
    * 100 TB-cardinality. */
  def q74Percentiles(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      // one array-percentile agg, not one buffer per quantile: the group's
      // values are collected (and merge-sorted) once for both cut points
      .agg(expr("percentile(o_totalprice, array(0.5, 0.9))").as("ps"))
      .select(col("o_orderpriority"),
        round(col("ps").getItem(0), 6).as("p50"),
        round(col("ps").getItem(1), 6).as("p90"))
      .orderBy(col("o_orderpriority"))

  val q74Sql: String =
    """SELECT o_orderpriority,
      | round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
      | round(quantile_cont(o_totalprice, 0.9), 6) AS p90
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Analytic-window suite beyond q07/q28: lag, ntile, percent_rank over
    * priority-partitioned order streams — one shuffle on the partition
    * key, every function shares the same window sort. */
  def q63WindowSuite(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority")).orderBy(col("o_orderkey"))
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 193 === 0)
      .select(col("o_orderpriority"), col("o_orderkey"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pr"))
      .orderBy(col("o_orderpriority"), col("o_orderkey"))
  }

  val q63Sql: String =
    """SELECT o_orderpriority, o_orderkey,
      | lag(o_totalprice, 1) OVER w AS prev_price,
      | CAST(ntile(4) OVER w AS INT) AS quartile,
      | round(percent_rank() OVER w, 6) AS pr
      |FROM orders WHERE o_orderkey % 193 = 0
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** Unpivot (wide → long), the inverse of q59: melt the per-status
    * averages back into (status, avg_price) rows. */
  def q64Unpivot(s: SparkSession, d: String): DataFrame =
    q59Pivot(s, d).unpivot(
        Array(col("o_orderpriority")),
        Array(col("F"), col("O"), col("P")),
        "status", "avg_price")
      .orderBy(col("o_orderpriority"), col("status"))

  val q64Sql: String =
    """WITH piv AS (
      |  SELECT o_orderpriority,
      |    round(avg(CASE WHEN o_orderstatus='F' THEN o_totalprice END), 6) AS f,
      |    round(avg(CASE WHEN o_orderstatus='O' THEN o_totalprice END), 6) AS o,
      |    round(avg(CASE WHEN o_orderstatus='P' THEN o_totalprice END), 6) AS p
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderpriority, status, avg_price FROM (
      |  SELECT o_orderpriority, 'F' AS status, f AS avg_price FROM piv
      |  UNION ALL SELECT o_orderpriority, 'O', o FROM piv
      |  UNION ALL SELECT o_orderpriority, 'P', p FROM piv)
      |ORDER BY o_orderpriority, status""".stripMargin

  /** Fixed-width 20-bucket histogram with data-derived bounds: the min/max
    * ride in as a broadcast 1-row aggregate (exact, fold-order-free), the
    * bucket id is pure codegen'd arithmetic, counts are one map-side-
    * combinable aggregation. */
  def q75Histogram(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val mm = o.agg(min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
    // hi == lo (degenerate bounds) must not divide by zero — ANSI mode
    // throws on double x/0.0; every value then belongs in bucket 0
    o.crossJoin(broadcast(mm))
      .select(when(col("hi") === col("lo"), 0L)
        .otherwise(least(floor((col("o_totalprice") - col("lo")) /
          ((col("hi") - col("lo")) / 20)).cast("long"), lit(19L))).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
      .orderBy(col("bucket"))
  }

  val q75Sql: String =
    """WITH mm AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders)
      |SELECT CASE WHEN hi = lo THEN 0 ELSE
      |    least(CAST(floor((o_totalprice - lo) / ((hi - lo) / 20)) AS BIGINT), 19) END AS bucket,
      |  count(*) AS n
      |FROM orders, mm GROUP BY 1 ORDER BY bucket""".stripMargin

  /** Ordered string aggregation (listagg): nation names per region,
    * sorted then joined — deterministic regardless of row arrival order
    * (collect_list alone is partition-order-dependent; the sort_array
    * makes it reproducible, the portable analog of ORDER BY in
    * string_agg/listagg). */
  def q78StringAgg(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .groupBy(col("n_regionkey"))
      .agg(array_join(sort_array(collect_list(col("n_name"))), ",").as("names"),
        count(lit(1)).as("n"))
      .orderBy(col("n_regionkey"))

  val q78Sql: String =
    """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS names,
      |  count(*) AS n
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** Argmax per group without a window: max over a lexicographically
    * ordered struct (balance, key, name) gives the top customer per
    * segment in ONE map-side-combinable aggregation — the shuffle carries
    * one struct per group per partition, vs a window's full sorted
    * partition. Tie-safe: the custkey tiebreak is inside the struct. */
  def q62ArgMax(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(max(struct(col("c_acctbal"), col("c_custkey"), col("c_name"))).as("m"))
      .select(col("c_mktsegment"),
        round(col("m.c_acctbal"), 2).as("top_bal"),
        col("m.c_custkey").as("top_cust"),
        col("m.c_name").as("top_name"))
      .orderBy(col("c_mktsegment"))

  val q62Sql: String =
    """SELECT c_mktsegment,
      |  round((max(struct_pack(bal := c_acctbal, ck := c_custkey, nm := c_name))).bal, 2) AS top_bal,
      |  (max(struct_pack(bal := c_acctbal, ck := c_custkey, nm := c_name))).ck AS top_cust,
      |  (max(struct_pack(bal := c_acctbal, ck := c_custkey, nm := c_name))).nm AS top_name
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Recursive CTE (Spark 4's UnionLoop): per-level accounting of a
    * binary-tree hierarchy synthesized over doc ids (parent of i is
    * (i-1) div 2). Each recursion step is one join against the previous
    * level — the iterative-join shape org-chart / BOM traversals take. */
  def q77Recursive(s: SparkSession, d: String): DataFrame = {
    Tables.documents(s, d).createOrReplaceTempView("__q77_docs")
    s.sql(
      """WITH RECURSIVE tree AS (
        |  SELECT CAST(0 AS BIGINT) AS doc_id, 0 AS depth
        |  UNION ALL
        |  SELECT d.doc_id, t.depth + 1
        |  FROM __q77_docs d JOIN tree t ON (d.doc_id - 1) DIV 2 = t.doc_id
        |  WHERE d.doc_id > 0)
        |SELECT depth, count(*) AS n, min(doc_id) AS lo, max(doc_id) AS hi
        |FROM tree GROUP BY depth ORDER BY depth""".stripMargin)
  }

  val q77Sql: String =
    """WITH RECURSIVE tree AS (
      |  SELECT CAST(0 AS BIGINT) AS doc_id, 0 AS depth
      |  UNION ALL
      |  SELECT d.doc_id, t.depth + 1
      |  FROM documents d JOIN tree t ON (d.doc_id - 1) // 2 = t.doc_id
      |  WHERE d.doc_id > 0)
      |SELECT depth, count(*) AS n, min(doc_id) AS lo, max(doc_id) AS hi
      |FROM tree GROUP BY depth ORDER BY depth""".stripMargin

  /** Per-group z-score outlier detection with bit-stable moments: mean
    * and population std come from exact decimal sums (double-cast once),
    * so the 2.5σ threshold is the same double on any partial-merge order;
    * the per-row flag is then one broadcast join — two passes total, both
    * map-side-combinable. */
  def q88ZscoreOutliers(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val st = o.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(30,12)"))
          .cast("double").as("s1"),
        sum((col("o_totalprice") * col("o_totalprice"))
          .cast("decimal(38,12)")).cast("double").as("s2"))
      .select(col("o_orderpriority"), col("n"),
        (col("s1") / col("n")).as("mean"),
        sqrt(greatest(col("s2") / col("n")
          - (col("s1") / col("n")) * (col("s1") / col("n")), lit(0.0)))
          .as("std"))
    o.join(broadcast(st), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"))
      .agg(max(col("n")).as("n"),
        sum(when(abs(col("o_totalprice") - col("mean")) > col("std") * 2.5,
          1L).otherwise(0L)).as("n_outliers"),
        round(max(col("mean")), 6).as("mean"),
        round(max(col("std")), 6).as("std"))
      .orderBy(col("o_orderpriority"))
  }

  val q88Sql: String =
    """WITH st AS (
      |  SELECT o_orderpriority, count(*) AS n,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(30,12))) AS DOUBLE) AS s1,
      |    CAST(sum(CAST(o_totalprice * o_totalprice AS DECIMAL(38,12))) AS DOUBLE) AS s2
      |  FROM orders GROUP BY o_orderpriority),
      |m AS (
      |  SELECT o_orderpriority, n, s1 / n AS mean,
      |    sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0)) AS std
      |  FROM st)
      |SELECT o.o_orderpriority, max(m.n) AS n,
      |  CAST(sum(CASE WHEN abs(o.o_totalprice - m.mean) > m.std * 2.5
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
      |  round(max(m.mean), 6) AS mean, round(max(m.std), 6) AS std
      |FROM orders o JOIN m USING (o_orderpriority)
      |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q88_zscore_outliers" -> (q88ZscoreOutliers _),
    "q59_pivot" -> (q59Pivot _),
    "q62_argmax" -> (q62ArgMax _),
    "q77_recursive" -> (q77Recursive _),
    "q63_window_suite" -> (q63WindowSuite _),
    "q75_histogram" -> (q75Histogram _),
    "q78_string_agg" -> (q78StringAgg _),
    "q64_unpivot" -> (q64Unpivot _),
    "q74_percentiles" -> (q74Percentiles _),
    "q76_grouping_sets" -> (q76GroupingSets _),
    "q82_wealthy_inactive" -> (q82WealthyInactive _),
    "q23_left_outer" -> (q23LeftOuter _),
    "q24_patterns" -> (q24Patterns _),
    "q25_union_all" -> (q25UnionAll _),
    "q26_date_arithmetic" -> (q26DateArithmetic _),
    "q27_nested_agg" -> (q27NestedAgg _),
    "q28_window_frames" -> (q28WindowFrames _),
    "q29_array_agg" -> (q29ArrayAgg _))

  val oracles: Map[String, String] = Map(
    "q88_zscore_outliers" -> q88Sql,
    "q59_pivot" -> q59Sql,
    "q62_argmax" -> q62Sql,
    "q77_recursive" -> q77Sql,
    "q63_window_suite" -> q63Sql,
    "q75_histogram" -> q75Sql,
    "q78_string_agg" -> q78Sql,
    "q64_unpivot" -> q64Sql,
    "q74_percentiles" -> q74Sql,
    "q76_grouping_sets" -> q76Sql,
    "q82_wealthy_inactive" -> q82Sql,
    "q23_left_outer" -> q23Sql,
    "q24_patterns" -> q24Sql,
    "q25_union_all" -> q25Sql,
    "q26_date_arithmetic" -> q26Sql,
    "q27_nested_agg" -> q27Sql,
    "q28_window_frames" -> q28Sql,
    "q29_array_agg" -> q29Sql)
}
