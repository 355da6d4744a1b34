package graft

import graft.ops.GraphOps

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: symmetric graph ranks sum to 1 every run") {
    val pairs = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
      .toDF("src", "dst")
    val edges = pairs.unionByName(pairs.select($"dst".as("src"), $"src".as("dst")))
    val ranks = GraphOps.pageRank(edges, "src", "dst", iters = 5)
      .as[(String, Double)].collect().toMap
    assert(math.abs(ranks.values.sum - 1.0) < 1e-9)
    assert(ranks.size == 4)
  }

  test("pageRank: uniform cycle stays uniform") {
    val cycle = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    val ranks = GraphOps.pageRank(cycle, "src", "dst", iters = 4)
      .as[(String, Double)].collect().toMap
    val third = 1.0 / 3
    assert(ranks.values.forall(r => math.abs(r - third) < 1e-12))
  }

  test("pageRank: star hub outranks its leaves") {
    val spokes = (1 to 6).map(i => ("hub", s"leaf$i"))
    val pairs = spokes.toDF("src", "dst")
    val edges = pairs.unionByName(pairs.select($"dst".as("src"), $"src".as("dst")))
    val ranks = GraphOps.pageRank(edges, "src", "dst", iters = 5)
      .as[(String, Double)].collect().toMap
    assert(ranks("hub") > ranks("leaf1") * 3)
    assert((1 to 6).map(i => ranks(s"leaf$i")).distinct.size == 1)
  }

  test("pageRank: iters=0 returns the uniform prior") {
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val ranks = GraphOps.pageRank(edges, "src", "dst", iters = 0)
      .as[(String, Double)].collect().toMap
    assert(ranks == Map("a" -> 0.5, "b" -> 0.5))
  }

  test("labelPropagation: seeds clamp, majority wins, smaller label breaks ties") {
    // x seeded 1, y seeded 2; m has neighbors x (1) and y (2) -> tie -> 1;
    // z only reaches y -> 2; x/y stay clamped after back-propagation
    val pairs = Seq(("x", "m"), ("y", "m"), ("y", "z")).toDF("src", "dst")
    val edges = pairs.unionByName(pairs.select($"dst".as("src"), $"src".as("dst")))
    val seeds = Seq(("x", 1), ("y", 2)).toDF("vertex", "label")
    val got = graft.ops.GraphOps
      .labelPropagation(edges, "src", "dst", seeds, "vertex", "label", iters = 2)
      .as[(String, Option[Int])].collect().toMap
    assert(got == Map("x" -> Some(1), "y" -> Some(2),
      "m" -> Some(1), "z" -> Some(2)))
  }

  test("labelPropagation: unreachable vertices stay null") {
    val edges = Seq(("a", "b"), ("b", "a"), ("p", "q"), ("q", "p"))
      .toDF("src", "dst")
    val seeds = Seq(("a", 7)).toDF("vertex", "label")
    val got = graft.ops.GraphOps
      .labelPropagation(edges, "src", "dst", seeds, "vertex", "label", iters = 3)
      .as[(String, Option[Int])].collect().toMap
    assert(got("b") == Some(7) && got("p").isEmpty && got("q").isEmpty)
  }

  test("pageRank: deterministic across runs (decimal sums)") {
    val docs = graft.queries.Tables(spark, sfDir, "orders")
    val li = graft.queries.Tables(spark, sfDir, "lineitem")
    def run() = graft.queries.GraphQueries.q96Pagerank(spark, sfDir)
      .as[(String, Double)].collect().toMap
    assert(run() == run())
  }
}
