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

  test("iteration joins stream the pinned edge frame: no exchange, no sort " +
      "on the cached side (the invariant GraphOps' loops rely on)") {
    import org.apache.spark.sql.functions._
    // Replicates GraphOps' pinPartitioned + SHUFFLE_HASH iteration shape:
    // a cached InMemoryRelation must preserve its explicit hash
    // partitioning (canChangeCachedPlanOutputPartitioning=false default),
    // so the only exchange in the join is the vertex-sized hinted side.
    // If a Spark upgrade ever breaks this, the graph loops silently
    // reshuffle edges every round — this test turns that into a failure.
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val edges = (1 to 1000).map(i => (s"v${i % 50}", s"v${(i * 7) % 50}"))
      .toDF("src", "dst")
    val pinned = edges.repartition(p, $"src").persist()
    pinned.count()
    try {
      val state = (0 until 50).map(i => (s"v$i", i * 1.0)).toDF("vertex", "w")
      val joined = pinned
        .join(state.hint("SHUFFLE_HASH"), $"src" === $"vertex")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("ShuffledHashJoin"), s"expected SHJ in:\n$plan")
      // the cached InMemoryRelation renders its one-time REPARTITION_BY_NUM
      // build exchange inline; only ENSURE_REQUIREMENTS exchanges are
      // per-iteration cost, and the single one allowed is the state side
      val perIter = "Exchange hashpartitioning\\(([a-z]+)[^)]*\\), ENSURE_REQUIREMENTS"
        .r.findAllMatchIn(plan).map(_.group(1)).toList
      assert(perIter == List("vertex"),
        s"expected the state side as the only runtime exchange, got $perIter:\n$plan")
      assert(!plan.contains("Sort "), s"expected no sort:\n$plan")
    } finally pinned.unpersist(true)
  }

  test("pageRank: deterministic across runs (decimal sums)") {
    val docs = graft.queries.Tables(spark, sfDir, "orders")
    val li = graft.queries.Tables(spark, sfDir, "lineitem")
    def run() = graft.queries.GraphQueries.q96Pagerank(spark, sfDir)
      .as[(String, Double)].collect().toMap
    assert(run() == run())
  }
}
