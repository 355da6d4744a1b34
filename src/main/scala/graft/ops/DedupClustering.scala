package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair sets — the final step of a
  * dedup pipeline: pairs → clusters → one survivor per cluster.
  *
  * Algorithm: iterative min-label propagation (each vertex adopts the
  * smallest id reachable through its edges) until a fixpoint. Iterations are
  * keyed joins — shuffle on vertex id — and converge in O(log(diameter))
  * rounds for near-dup graphs, whose components are tiny cliques in
  * practice. `localCheckpoint` every round truncates lineage so 20
  * iterations don't build a 20-deep plan.
  */
object DedupClustering {

  /** @param pairs  (aCol, bCol) undirected edges
    * @return (id, cluster_id) with cluster_id = min id in the component;
    *         isolated ids never in `pairs` are absent (their cluster is
    *         themselves by definition). */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20): DataFrame = {
    // id type is preserved (numeric or string); labels propagate by the
    // natural ordering of the id type — no lossy casts (string ids would
    // silently become null under cast("long"))
    val edges = pairs.select(col(aCol).as("a"), col(bCol).as("b"))
      .unionByName(pairs.select(col(bCol).as("a"), col(aCol).as("b")))
      .distinct()
      .localCheckpoint()

    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
      .localCheckpoint()

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each vertex adopts min(own label, neighbors' labels)
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("cluster_id", "nl"), "b")
        .groupBy(col("a").as("id"))
        .agg(min(col("nl")).as("neighbor_min"))
      val viaEdges = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("neighbor_min"), col("cluster_id")))
            .as("cluster_id"))
      // pointer jumping: also adopt the label OF the label, halving chain
      // depth each round → O(log diameter) convergence instead of O(diameter)
      val parents = viaEdges
        .select(col("id").as("__pid"), col("cluster_id").as("__plabel"))
      val updated = viaEdges.join(parents, col("cluster_id") === col("__pid"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("__plabel"), col("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint()
      val changed = updated.alias("u").join(labels.alias("l"), "id")
        .filter(col("u.cluster_id") =!= col("l.cluster_id")).limit(1).count()
      labels = updated
      converged = changed == 0
      iter += 1
    }
    labels
  }

  /** End-to-end near-dup collapse: MinHash-LSH pairs → components → keep the
    * minimum id per cluster; returns the deduplicated frame. */
  def collapseNearDups(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8): DataFrame = {
    val pairs = Dedup.minhashNearDupPairs(df, idCol, textCol, threshold = threshold)
    val clusters = connectedComponents(pairs, "doc_a", "doc_b")
    val losers = clusters.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
