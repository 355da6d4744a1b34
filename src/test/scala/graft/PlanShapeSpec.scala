package graft

import org.apache.spark.sql.DataFrame

import graft.queries.RelationalQueries

/** Physical-plan assertions: each headline query must compile to the plan
  * we designed for 100 TB — broadcast joins for dims, pushdown reaching the
  * scan, top-k instead of global sort, partial aggregation — not merely a
  * plan that returns the right rows. */
class PlanShapeSpec extends SparkSpec {

  private def executed(df: DataFrame): String = {
    df.collect() // finalize AQE
    df.queryExecution.executedPlan.toString
  }

  test("q03: dimension side broadcast, fact sides shuffle at most once") {
    val plan = executed(RelationalQueries.q03ShippingPriority(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"))
  }

  test("q05: all five dims broadcast — no shuffle join anywhere") {
    val plan = executed(RelationalQueries.q05NationRevenue(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q02: filter and projection pushed into the parquet scan") {
    val df = RelationalQueries.q02FilterProject(spark, sfDir)
    val plan = executed(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate)"), plan)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber"), plan)
    assert(!plan.contains("l_comment"), "unused columns must be pruned")
  }

  test("q13: global top-k is TakeOrderedAndProject, not a full sort") {
    val plan = executed(RelationalQueries.q13TopK(spark, sfDir))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q01: partial (map-side) aggregation before the exchange") {
    val plan = executed(RelationalQueries.q01PricingSummary(spark, sfDir))
    val firstAgg = plan.linesIterator.toSeq.reverse
      .find(_.contains("HashAggregate"))
    assert(firstAgg.exists(_.contains("partial_")),
      s"expected partial aggregation below the exchange:\n$plan")
  }

  test("q04: EXISTS becomes a semi join, never a full join + filter") {
    val plan = executed(RelationalQueries.q04OrderPriority(spark, sfDir))
    assert(plan.contains("LeftSemi"), plan)
  }

  test("q40: query side broadcast for similarity search") {
    val plan = executed(graft.queries.SimilarityQueries.q40CosineTopK(spark, sfDir))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("graft_cosine"), "custom codegen expression in the plan")
  }
}
