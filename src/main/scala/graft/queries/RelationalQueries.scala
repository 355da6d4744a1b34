package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational operator coverage (SURVEY.md §2.3) expressed Spark-first:
  * declarative DataFrame plans that Catalyst compiles to pushed-down scans,
  * partial aggregation, broadcast/sort-merge joins and whole-stage codegen.
  *
  * Scale notes (100 TB mandate):
  *  - every query filters/projects before joining, so parquet scans read only
  *    the needed columns (`ReadSchema`) with `PushedFilters`;
  *  - dimension tables (region/nation/customer/supplier/part) are broadcast
  *    explicitly — at 100 TB lineitem/orders shuffle once on their join key
  *    and never move the small side;
  *  - aggregations are hash-based with map-side partial combine (free from
  *    Catalyst since all aggs here are algebraic);
  *  - no collect()/driver loops anywhere.
  *
  * All monetary aggregates are rounded (2 dp) IN THE QUERY so that the
  * DuckDB-oracle hash compare is stable across engines' summation order.
  */
object RelationalQueries {

  private def ts(lit0: String): Column = lit(lit0).cast("timestamp")

  /** TPC-H Q1-style pricing summary: scan + filter + hash agg + sort. */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(sum(l_quantity),2) AS sum_qty,
      | round(sum(l_extendedprice),2) AS sum_base_price,
      | round(sum(l_extendedprice*(1-l_discount)),2) AS sum_disc_price,
      | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)),2) AS sum_charge,
      | round(avg(l_quantity),4) AS avg_qty,
      | round(avg(l_extendedprice),4) AS avg_price,
      | count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Projection + predicate pushdown: both reach the parquet scan. */
  def q02FilterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1997-06-01 00:00:00") && col("l_quantity") < 5)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00' AND l_quantity < 5
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** TPC-H Q3-style: 3-way join (broadcast dim), agg, top-k. */
  def q03ShippingPriority(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d).filter(col("o_orderdate") < ts("1995-03-15 00:00:00"))
    val l = Tables.lineitem(s, d).filter(col("l_shipdate") > ts("1995-03-15 00:00:00"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"), col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q03Sql: String =
    """SELECT l_orderkey,
      | round(sum(l_extendedprice*(1-l_discount)),2) AS revenue,
      | strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate, o_orderpriority
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Semi join (EXISTS) with a correlated non-equi condition: orders in a
    * window having at least one line shipped >60 days after the order
    * (TPC-H Q4 pattern adapted to this schema's columns). */
  def q04OrderPriority(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
              col("o_orderdate") < ts("1996-10-01 00:00:00"))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, o("o_orderkey") === l("l_orderkey") &&
              l("l_shipdate") > o("o_orderdate") + expr("INTERVAL 60 DAYS"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q04Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q5-style 6-table join; all dims broadcast, facts shuffle once. */
  def q05NationRevenue(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= ts("1994-01-01 00:00:00") &&
              col("o_orderdate") < ts("1996-01-01 00:00:00"))
    val l = Tables.lineitem(s, d)
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(c),
        o("o_custkey") === c("c_custkey") && c("c_nationkey") === sup("s_nationkey"))
      .join(broadcast(n), sup("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q05Sql: String =
    """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),2) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND o_orderdate >= TIMESTAMP '1994-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** TPC-H Q6-style: tight filter + single scalar agg (pure scan speed). */
  def q06RevenueForecast(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1994-01-01 00:00:00") &&
              col("l_shipdate") < ts("1995-01-01 00:00:00") &&
              col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"))

  val q06Sql: String =
    """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Window functions: top-2 line items per order by price (dense ranking
    * with deterministic tie-break), plus a running sum. */
  def q07WindowTopPerOrder(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") % 100 === 0)
      .withColumn("rn", row_number().over(w))
      .withColumn("run_qty",
        round(sum(col("l_quantity")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .filter(col("rn") <= 2)
      .select(col("l_orderkey"), col("l_linenumber"), col("rn"), col("run_qty"))
      .orderBy(col("l_orderkey"), col("rn"))
  }

  val q07Sql: String =
    """SELECT l_orderkey, l_linenumber, rn, run_qty FROM (
      |  SELECT l_orderkey, l_linenumber,
      |   row_number() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber) AS rn,
      |   round(sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),2) AS run_qty
      |  FROM lineitem WHERE l_orderkey % 100 = 0) t
      |WHERE rn <= 2
      |ORDER BY l_orderkey, rn""".stripMargin

  /** Distinct aggregates + approx sketch sanity (exact ones oracled). */
  def q08DistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("nd_part"),
        countDistinct(col("l_suppkey")).as("nd_supp"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  val q08Sql: String =
    """SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_part,
      | count(DISTINCT l_suppkey) AS nd_supp, count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** ROLLUP grouping sets. */
  def q09Rollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val q09Sql: String =
    """SELECT l_returnflag, l_linestatus, round(sum(l_quantity),2) AS sum_qty, count(*) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Set operations: customers in BUILDING segment who also have big orders
    * (INTERSECT), then minus those from AUTOMOBILE (EXCEPT). */
  def q10SetOps(s: SparkSession, d: String): DataFrame = {
    val building = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
    val bigOrders = Tables.orders(s, d)
      .filter(col("o_totalprice") > 100000).select(col("o_custkey").as("k"))
    val auto = Tables.customer(s, d)
      .filter(col("c_mktsegment") === "AUTOMOBILE").select(col("c_custkey").as("k"))
    building.intersect(bigOrders).except(auto).orderBy(col("k"))
  }

  val q10Sql: String =
    """SELECT k FROM (
      |  SELECT c_custkey AS k FROM customer WHERE c_mktsegment='BUILDING'
      |  INTERSECT
      |  SELECT o_custkey AS k FROM orders WHERE o_totalprice > 100000
      |  EXCEPT
      |  SELECT c_custkey AS k FROM customer WHERE c_mktsegment='AUTOMOBILE') t
      |ORDER BY k""".stripMargin

  /** Anti join: customers with no high-value orders. */
  def q11AntiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_totalprice") > 200000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_without_big"))
      .orderBy(col("c_mktsegment"))
  }

  val q11Sql: String =
    """SELECT c_mktsegment, count(*) AS n_without_big
      |FROM customer WHERE NOT EXISTS (
      |  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 200000)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** Scalar function surface: string / date / math functions. */
  def q12ScalarFunctions(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 997 === 0)
      .select(
        col("o_orderkey"),
        upper(substring(col("o_orderpriority"), 1, 3)).as("pri3"),
        concat_ws("#", col("o_orderstatus"), col("o_orderpriority")).as("tag"),
        length(col("o_orderpriority")).cast("long").as("pri_len"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        round(abs(col("o_totalprice") - 100000.0), 2).as("dist"),
        round(sqrt(col("o_totalprice")), 4).as("root"),
        round(log(col("o_totalprice")), 6).as("ln_price"),
        pmod(col("o_custkey"), lit(7)).cast("long").as("bucket"))
      .orderBy(col("o_orderkey"))

  val q12Sql: String =
    """SELECT o_orderkey,
      | upper(substr(o_orderpriority,1,3)) AS pri3,
      | concat_ws('#', o_orderstatus, o_orderpriority) AS tag,
      | CAST(length(o_orderpriority) AS BIGINT) AS pri_len,
      | CAST(year(o_orderdate) AS BIGINT) AS yr,
      | CAST(month(o_orderdate) AS BIGINT) AS mo,
      | CAST(day(o_orderdate) AS BIGINT) AS dom,
      | round(abs(o_totalprice - 100000.0),2) AS dist,
      | round(sqrt(o_totalprice),4) AS root,
      | round(ln(o_totalprice),6) AS ln_price,
      | CAST(o_custkey % 7 AS BIGINT) AS bucket
      |FROM orders WHERE o_orderkey % 997 = 0
      |ORDER BY o_orderkey""".stripMargin

  /** Global top-k: TakeOrderedAndProject, no full sort at scale. */
  def q13TopK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)

  val q13Sql: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** Theta (non-equi) join: nation pairs within a region. Broadcast NLJ —
    * correct plan for a small×small theta join. */
  def q14ThetaJoin(s: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(s, d).select(
      col("n_nationkey").as("k1"), col("n_name").as("name1"), col("n_regionkey").as("r1"))
    val n2 = Tables.nation(s, d).select(
      col("n_nationkey").as("k2"), col("n_name").as("name2"), col("n_regionkey").as("r2"))
    n1.join(broadcast(n2), col("r1") === col("r2") && col("k1") < col("k2"))
      .select(col("name1"), col("name2"), col("r1").cast("long").as("region"))
      .orderBy(col("name1"), col("name2"))
  }

  val q14Sql: String =
    """SELECT a.n_name AS name1, b.n_name AS name2, CAST(a.n_regionkey AS BIGINT) AS region
      |FROM nation a JOIN nation b
      |  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
      |ORDER BY name1, name2""".stripMargin

  /** CUBE grouping sets over two dims. */
  def q15Cube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  val q15Sql: String =
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n, round(sum(o_totalprice),2) AS total
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  /** HAVING: suppliers with above-threshold shipped quantity. */
  def q16Having(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_quantity")), 2).as("total_qty"))
      .filter(col("total_qty") > 300)
      .orderBy(col("l_suppkey"))

  val q16Sql: String =
    """SELECT l_suppkey, round(sum(l_quantity),2) AS total_qty
      |FROM lineitem GROUP BY l_suppkey
      |HAVING round(sum(l_quantity),2) > 300 ORDER BY l_suppkey""".stripMargin

  /** Correlated scalar subquery (TPC-H Q17 pattern), expressed Spark-first
    * as an aggregate-then-join — identical semantics, one shuffle, no
    * per-row subquery execution. The `q*2*count < sum` formulation keeps the
    * comparison exact in integer-valued doubles (quantities are 1..50), so
    * the oracle compare is immune to float summation-order differences.
    */
  def q17AvgQuantityFilter(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d)
    val perPart = l.groupBy(col("l_partkey").as("ap_partkey"))
      .agg(sum(col("l_quantity")).as("sq"), count(lit(1)).as("cq"))
    l.join(perPart, col("l_partkey") === col("ap_partkey"))
      .filter(col("l_quantity") * 2 * col("cq") < col("sq"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
  }

  val q17Sql: String =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
      |FROM lineitem l1 JOIN
      | (SELECT l_partkey AS ap_partkey, sum(l_quantity) AS sq, count(*) AS cq
      |  FROM lineitem GROUP BY 1) a
      | ON l1.l_partkey = a.ap_partkey
      |WHERE l1.l_quantity * 2 * a.cq < a.sq""".stripMargin

  /** IN-subquery: orders of the top-spending customers. */
  def q18InSubquery(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val bigCust = o.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("spend"))
      .filter(col("spend") > 1000000)
      .select(col("o_custkey").as("bk"))
    o.join(bigCust, o("o_custkey") === col("bk"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
  }

  val q18Sql: String =
    """SELECT o_orderstatus, count(*) AS n FROM orders
      |WHERE o_custkey IN (SELECT o_custkey FROM orders
      |                    GROUP BY o_custkey HAVING sum(o_totalprice) > 1000000)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** Conditional aggregation (CASE WHEN pivot). */
  def q19CaseWhen(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .agg(
        round(sum(when(col("l_returnflag") === "R", col("l_extendedprice")).otherwise(0.0)), 2).as("returned"),
        round(sum(when(col("l_returnflag") === "A", col("l_extendedprice")).otherwise(0.0)), 2).as("accepted"),
        round(sum(when(col("l_returnflag") === "N", col("l_extendedprice")).otherwise(0.0)), 2).as("neither"))
      .orderBy(col("l_linestatus"))

  val q19Sql: String =
    """SELECT l_linestatus,
      | round(sum(CASE WHEN l_returnflag='R' THEN l_extendedprice ELSE 0.0 END),2) AS returned,
      | round(sum(CASE WHEN l_returnflag='A' THEN l_extendedprice ELSE 0.0 END),2) AS accepted,
      | round(sum(CASE WHEN l_returnflag='N' THEN l_extendedprice ELSE 0.0 END),2) AS neither
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  /** Full outer join with null-handling coalesce. */
  def q20FullOuter(s: SparkSession, d: String): DataFrame = {
    val custNation = Tables.customer(s, d)
      .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
    val suppNation = Tables.supplier(s, d)
      .groupBy(col("s_nationkey").as("nk2")).agg(count(lit(1)).as("n_supp"))
    custNation.join(suppNation, col("nk") === col("nk2"), "full_outer")
      .select(
        coalesce(col("nk"), col("nk2")).cast("long").as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  val q20Sql: String =
    """SELECT CAST(coalesce(c.nk, s.nk2) AS BIGINT) AS nationkey,
      |       coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
      |FULL OUTER JOIN (SELECT s_nationkey AS nk2, count(*) AS n_supp FROM supplier GROUP BY 1) s
      |  ON c.nk = s.nk2
      |ORDER BY nationkey""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _),
    "q02_filter_project" -> (q02FilterProject _),
    "q03_shipping_priority" -> (q03ShippingPriority _),
    "q04_order_priority" -> (q04OrderPriority _),
    "q05_nation_revenue" -> (q05NationRevenue _),
    "q06_revenue_forecast" -> (q06RevenueForecast _),
    "q07_window_top_per_order" -> (q07WindowTopPerOrder _),
    "q08_distinct_agg" -> (q08DistinctAgg _),
    "q09_rollup" -> (q09Rollup _),
    "q10_set_ops" -> (q10SetOps _),
    "q11_anti_join" -> (q11AntiJoin _),
    "q12_scalar_functions" -> (q12ScalarFunctions _),
    "q13_top_k" -> (q13TopK _),
    "q14_theta_join" -> (q14ThetaJoin _),
    "q15_cube" -> (q15Cube _),
    "q16_having" -> (q16Having _),
    "q17_avg_quantity_filter" -> (q17AvgQuantityFilter _),
    "q18_in_subquery" -> (q18InSubquery _),
    "q19_case_when" -> (q19CaseWhen _),
    "q20_full_outer" -> (q20FullOuter _))

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> q01Sql,
    "q02_filter_project" -> q02Sql,
    "q03_shipping_priority" -> q03Sql,
    "q04_order_priority" -> q04Sql,
    "q05_nation_revenue" -> q05Sql,
    "q06_revenue_forecast" -> q06Sql,
    "q07_window_top_per_order" -> q07Sql,
    "q08_distinct_agg" -> q08Sql,
    "q09_rollup" -> q09Sql,
    "q10_set_ops" -> q10Sql,
    "q11_anti_join" -> q11Sql,
    "q12_scalar_functions" -> q12Sql,
    "q13_top_k" -> q13Sql,
    "q14_theta_join" -> q14Sql,
    "q15_cube" -> q15Sql,
    "q16_having" -> q16Sql,
    "q17_avg_quantity_filter" -> q17Sql,
    "q18_in_subquery" -> q18Sql,
    "q19_case_when" -> q19Sql,
    "q20_full_outer" -> q20Sql)
}
