package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph measures over edge frames — the corpus-weighting side
  * of a training-data pipeline (PageRank over a link/interaction graph is
  * the classic quality prior for web-scale corpora).
  *
  * Same execution shape as [[DedupClustering]]: each iteration is a keyed
  * join + map-side-combinable aggregate (shuffle on vertex id), and every
  * floating-point reduction is a decimal sum so results are bit-stable
  * under Spark's nondeterministic partial-merge order (the repo-wide
  * reproducibility rule for trained/iterated artifacts). Rounds are
  * materialized with plain localCheckpoint: unlike the UNBOUNDED loop in
  * [[DedupClustering]] (which needs the stats-resetting
  * [[DedupClustering.cut]]), these loops run a FIXED handful of rounds,
  * so the multiplicative size estimate only reaches ~4^iters of the
  * honest scan size — harmless — and skipping cut()'s row round-trip
  * saves a serialize/deserialize pass per round.
  *
  * Per-iteration network is held at the Pregel lower bound — ONE
  * edge-sized shuffle (the map-side-combined contribution/vote
  * aggregation). The edge frame itself never re-shuffles inside a loop:
  * it is cached pre-partitioned on the join key ([[pinPartitioned]] —
  * `persist` rather than `localCheckpoint`, because a cached
  * InMemoryRelation preserves its plan's hash partitioning while a
  * checkpointed LogicalRDD under AQE reports Unknown and re-exchanges
  * every round), and the small per-round state (ranks/labels, vertex-
  * sized) is the SHUFFLE_HASH build side, so the edge side is neither
  * exchanged nor sorted. MEMORY_AND_DISK (the `persist()` default) keeps
  * the pinned edges spill-safe when a 100 TB graph outgrows executor
  * memory.
  */
object GraphOps {

  /** Checkpoint unless the frame is already a materialized RDD scan — a
    * caller that hands us a checkpointed/cached edge set must not pay for
    * (and store) a second copy in the block manager. */
  private def materialize(df: DataFrame): DataFrame =
    df.queryExecution.analyzed match {
      case _: org.apache.spark.sql.execution.LogicalRDD => df
      case _ => df.localCheckpoint()
    }

  /** Cache `df` hash-partitioned on `key` with the session's shuffle
    * parallelism, materialized eagerly. Joins inside the iteration loops
    * whose key side matches need no exchange and no sort (the explicit
    * partition count keeps AQE from coalescing the layout out from under
    * the co-partitioning). Callers unpersist after their loop. */
  private def pinPartitioned(df: DataFrame, key: String): DataFrame = {
    val p = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val pinned = df.repartition(p, col(key)).persist()
    pinned.count()
    pinned
  }

  /** Damped PageRank with a fixed iteration count.
    *
    * Simple variant without dangling-mass redistribution: callers supply
    * an edge set where every vertex has out-degree ≥ 1 (symmetric/
    * undirected graphs satisfy this by construction); ranks of a
    * dangling-free graph sum to 1 every iteration.
    *
    * @param edges directed (srcCol, dstCol) edges, pre-deduplicated
    * @return (vertex, rank) for every vertex appearing in `edges` */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85): DataFrame = {
    require(iters >= 0, s"pageRank: iters must be >= 0, got $iters")
    val e = materialize(edges)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val verts = pinPartitioned(e.select(col("src").as("vertex"))
      .unionByName(e.select(col("dst").as("vertex"))).distinct(), "vertex")
    val n = verts.count()
    // out-degree rides along each edge so the per-iteration join is a
    // single equi-join on src (degree never recomputed inside the loop);
    // pinned on src, the loop joins it exchange- and sort-free
    val withDeg = pinPartitioned(
      e.join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
        Seq("src")), "src")

    var ranks = verts.withColumn("rank", lit(1.0) / n).localCheckpoint()
    for (_ <- 1 to iters) {
      // contributions shuffle once on dst; decimal addition is associative,
      // so the merge order can't wiggle low bits run-to-run. Ranks (vertex-
      // sized) are the hash build side — the pinned edge frame streams.
      val in = withDeg
        .join(ranks.hint("SHUFFLE_HASH"), col("src") === col("vertex"))
        .groupBy(col("dst"))
        .agg(sum((col("rank") / col("outdeg")).cast("decimal(38,18)"))
          .as("in_sum"))
      // in_sum is already hash-partitioned on dst by its aggregation, and
      // verts is pinned on vertex: the outer join is co-partitioned, and
      // the SHUFFLE_HASH build on the in_sum side skips both sorts
      ranks = verts.join(in.hint("SHUFFLE_HASH"),
          col("vertex") === col("dst"), "left")
        .select(col("vertex"),
          (lit((1.0 - damping)) / n + lit(damping) *
            coalesce(col("in_sum").cast("double"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    verts.unpersist(false)
    withDeg.unpersist(false)
    ranks
  }

  /** Semi-supervised label propagation: seed vertices hold fixed labels;
    * every round each vertex adopts the MAJORITY label among its labeled
    * in-neighbors, ties broken by the smaller label — fully deterministic
    * (integer vote counts, total-ordered tie-break), so the result is
    * oracle-pinnable unlike classic randomized LPA. Seeds are clamped.
    * One shuffle per round on the destination vertex; votes are map-side
    * combinable counts.
    *
    * Inputs are normalized defensively: edges are deduplicated (majority
    * is defined on the simple graph — a repeated edge must not double a
    * neighbor's vote) and conflicting seed rows for one vertex collapse
    * to the smallest label (deterministic, consistent with the tie rule).
    *
    * @param seeds (vertexCol, labelCol) fixed assignments
    * @return (vertex, label) for every vertex in `edges`; label is null
    *         where no labeled vertex is reachable within `iters` hops */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      seeds: DataFrame, vertexCol: String, labelCol: String,
      iters: Int = 2): DataFrame = {
    require(iters >= 0, s"labelPropagation: iters must be >= 0, got $iters")
    val e = pinPartitioned(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst")).distinct(),
      "src")
    val verts = e.select(col("src").as("vertex"))
      .unionByName(e.select(col("dst").as("vertex"))).distinct()
      .localCheckpoint()
    val seed = seeds.select(col(vertexCol).as("vertex"),
      col(labelCol).as("__seed"))
      .groupBy(col("vertex")).agg(min(col("__seed")).as("__seed"))
    // (vertex, __seed [static clamp], __lbl [current assignment])
    var labels = verts.join(seed, Seq("vertex"), "left")
      .withColumn("__lbl", col("__seed")).localCheckpoint()
    for (_ <- 1 to iters) {
      // labeled state (vertex-sized) is the hash build side; the pinned
      // edge frame streams with no exchange and no sort
      val votes = e
        .join(labels.filter(col("__lbl").isNotNull)
          .select(col("vertex").as("src"), col("__lbl"))
          .hint("SHUFFLE_HASH"), Seq("src"))
        .groupBy(col("dst"), col("__lbl"))
        .agg(count(lit(1)).as("__c"))
      // arg-max via struct min: (-count, label) orders by majority first,
      // then smallest label — one aggregate, no window
      val winners = votes
        .groupBy(col("dst"))
        .agg(min(struct((-col("__c")).as("nc"), col("__lbl").as("l")))
          .as("__w"))
        .select(col("dst").as("vertex"), col("__w").getField("l").as("__win"))
      labels = labels.join(winners.hint("SHUFFLE_HASH"),
          Seq("vertex"), "left")
        .select(col("vertex"), col("__seed"),
          coalesce(col("__seed"), col("__win"), col("__lbl")).as("__lbl"))
        .localCheckpoint()
    }
    e.unpersist(false)
    labels.select(col("vertex"), col("__lbl").as("label"))
  }
}
