package graft.ops

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair sets — the final step of a
  * dedup pipeline: pairs → clusters → one survivor per cluster.
  *
  * Algorithm: iterative min-label propagation (each vertex adopts the
  * smallest id reachable through its edges) until a fixpoint. Iterations are
  * keyed joins — shuffle on vertex id — and converge in O(log(diameter))
  * rounds for near-dup graphs, whose components are tiny cliques in
  * practice. Every round is materialized through [[cut]] so 20 iterations
  * build neither a 20-deep plan nor a 4^20-bit size estimate.
  */
object DedupClustering {

  /** Materialize a frame and cut BOTH lineage and statistics.
    *
    * `localCheckpoint()` alone keeps the origin plan's sizeInBytes
    * estimate, and a join's estimate is the PRODUCT of its children's —
    * so across k checkpointed join-iterations the BigInt estimate's bit
    * length grows ~4^k and the driver ends up spending minutes inside
    * BigInteger Toom-Cook multiplication during planning (observed via
    * jstack on the sf0.1 gate). Rebuilding the frame from the
    * checkpointed RDD resets the estimate, keeping every iteration's
    * planning cost constant. The row round-trip costs one
    * serialize/deserialize pass over the (small) label frame, never the
    * corpus. */
  private[ops] def cut(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint()
    df.sparkSession.createDataFrame(cp.rdd, cp.schema)
  }

  /** @param pairs  (aCol, bCol) undirected edges
    * @param driverMaxEdges  when the (deduplicated, undirected) edge set
    *        fits under this bound it is collected and solved with exact
    *        union-find on the driver: a dedup pair set is ≪ the corpus
    *        (it only names the near-duplicates), so even a 100 TB corpus
    *        usually yields an edge set of millions, and one collect beats
    *        ~10 shuffle rounds of label propagation. Pass 0 to force the
    *        distributed loop (graphs whose edges genuinely don't fit).
    * @return (id, cluster_id) with cluster_id = min id in the component;
    *         isolated ids never in `pairs` are absent (their cluster is
    *         themselves by definition). */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 20, driverMaxEdges: Long = 4000000L): DataFrame = {
    // id type is preserved (numeric or string); labels propagate by the
    // natural ordering of the id type — no lossy casts (string ids would
    // silently become null under cast("long")). Canonical (min, max)
    // orientation + distinct gives the true undirected edge count — the
    // count the driver bound is documented against, and half the volume a
    // both-directions collect would haul.
    val canon = cut(pairs.select(
        least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .distinct())
    if (canon.count() <= driverMaxEdges) return driverUnionFind(canon)
    val edges = cut(canon
      .unionByName(canon.select(col("b").as("a"), col("a").as("b")))
      .distinct())

    var labels = cut(edges.select(col("a").as("id")).distinct()
      .withColumn("cluster_id", col("id")))

    // one pointer-jumping hop: every vertex adopts the label OF its label,
    // halving chain depth — two hops per round quarter it, so a diameter-D
    // path converges in ~log4(D)+1 rounds instead of D
    def jump(frame: DataFrame): DataFrame = {
      val parents = frame
        .select(col("id").as("__pid"), col("cluster_id").as("__plabel"))
      frame.join(parents, col("cluster_id") === col("__pid"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("__plabel"), col("cluster_id")))
            .as("cluster_id"))
    }
    // order-independent label-set fingerprint: labels only ever decrease,
    // so the (id, label) set is stable iff no label changed — a bit_xor
    // of row hashes detects that in ONE narrow aggregate instead of a
    // join + count per round (works for string ids too, which a plain
    // sum(label) would not; xor can't overflow under ANSI mode). Changed
    // rows whose old/new hashes xor-cancel could fake a match (~2^-64 per
    // round), so a fingerprint match is CONFIRMED with one exact
    // changed-row check before the loop exits — the expensive join runs
    // once at convergence, not every round.
    def fingerprint(frame: DataFrame): Long =
      frame.agg(coalesce(
          expr("bit_xor(xxhash64(id, cluster_id))"), lit(0L)))
        .head.getLong(0)
    def provablyStable(prev: DataFrame, next: DataFrame): Boolean =
      next.alias("u").join(prev.alias("l"), "id")
        .filter(col("u.cluster_id") =!= col("l.cluster_id"))
        .limit(1).isEmpty

    var converged = false
    var iter = 0
    var lastFp = fingerprint(labels)
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
      val updated = cut(jump(jump(viaEdges)))
      val fp = fingerprint(updated)
      converged = fp == lastFp && provablyStable(labels, updated)
      labels = updated
      lastFp = fp
      iter += 1
    }
    labels
  }

  /** Keep only each component's minimum-id row of `corpus`: the shared
    * pruning tail of every dedup entry point (near-dup text collapse,
    * SemDeDup) — one place owns the survivor rule. */
  private[ops] def pruneByComponents(corpus: DataFrame, pairs: DataFrame,
      aCol: String, bCol: String, idCol: String): DataFrame = {
    val losers = connectedComponents(pairs, aCol, bCol)
      .filter(col("id") =!= col("cluster_id"))
      .select(col("id").as(idCol))
    corpus.join(losers, Seq(idCol), "left_anti")
  }

  /** Exact union-find (path compression + union by size) over a collected
    * (canonical, undirected) edge list; labels each component with its
    * minimum member under SPARK's ordering for the id type — identical
    * semantics to the distributed loop, minus its per-round scheduling
    * cost. Strings compare as UTF-8 bytes (what least()/min do), NOT
    * Java's UTF-16 code units — the two differ for supplementary
    * characters, and the two paths must agree. */
  private def driverUnionFind(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val idType = edges.schema("a").dataType
    val collected = edges.collect()
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    val sz = scala.collection.mutable.HashMap.empty[Any, Int]
    def find(x: Any): Any = {
      var root = x
      while (parent.getOrElse(root, root) != root)
        root = parent.getOrElse(root, root)
      var cur = x // path compression
      while (cur != root) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
      root
    }
    collected.foreach { r =>
      val (ra, rb) = (find(r.get(0)), find(r.get(1)))
      if (ra != rb) {
        val (sa, sb) = (sz.getOrElse(ra, 1), sz.getOrElse(rb, 1))
        val (big, small) = if (sa >= sb) (ra, rb) else (rb, ra)
        parent(small) = big
        sz(big) = sa + sb
      }
    }
    // component label = MIN member (matches the propagation fixpoint);
    // strings by unsigned UTF-8 bytes to match Spark's binary collation
    val cmp = (x: Any, y: Any) => (x, y) match {
      case (a: String, b: String) =>
        java.util.Arrays.compareUnsigned(
          a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
      case _ => x.asInstanceOf[Comparable[Any]].compareTo(y) < 0
    }
    val minOf = scala.collection.mutable.HashMap.empty[Any, Any]
    val ids = collected.iterator
      .flatMap(r => Iterator(r.get(0), r.get(1))).toSet
    ids.foreach { id =>
      val root = find(id)
      if (!minOf.contains(root) || cmp(id, minOf(root))) minOf(root) = id
    }
    val rows: java.util.List[org.apache.spark.sql.Row] =
      ids.toSeq.map(id =>
        org.apache.spark.sql.Row(id, minOf(find(id)))).asJava
    spark.createDataFrame(rows, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType),
      org.apache.spark.sql.types.StructField("cluster_id", idType))))
  }

  /** LEAKAGE-SAFE train/test split: a naive per-document hash split puts
    * one member of a near-dup cluster in train and its twin in test —
    * the eval set silently contains the training data. Here the split
    * key is the CLUSTER (near-dup components from `pairs`; singletons
    * key on their own id), so a whole duplicate family lands on one side
    * by construction. The split itself is a deterministic md5 bucket of
    * the cluster key (`md5(salt:cluster) % 10 < trainBuckets`), fully
    * replayable by any engine — no RNG state anywhere.
    *
    * Scale: rides the banded pair generation + components machinery
    * (never all-pairs); the split assignment is one id-keyed left join
    * plus pure codegen'd expressions.
    *
    * @param pairs near-dup pairs (aCol, bCol) over idCol's domain
    * @param trainBuckets of 10 md5 buckets go to train (8 → 80/20)
    * @return (idCol, cluster, split ∈ train|test) */
  def splitByComponents(df: DataFrame, pairs: DataFrame, aCol: String,
      bCol: String, idCol: String, trainBuckets: Int = 8,
      salt: String = "split"): DataFrame = {
    require(trainBuckets >= 1 && trainBuckets <= 9,
      s"splitByComponents: trainBuckets in [1,9], got $trainBuckets")
    val comps = connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("id", idCol)
    val cluster = coalesce(col("cluster_id"), col(idCol))
    val bucket = pmod(
      conv(substring(md5(concat(lit(s"$salt:"), cluster.cast("string"))),
        1, 4), 16, 10).cast("long"),
      lit(10L))
    df.select(col(idCol)).join(comps, Seq(idCol), "left")
      .select(col(idCol), cluster.as("cluster"),
        when(bucket < trainBuckets, "train").otherwise("test").as("split"))
  }

  /** End-to-end near-dup collapse: MinHash-LSH pairs → components → keep the
    * minimum id per cluster; returns the deduplicated frame. */
  def collapseNearDups(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8): DataFrame = {
    val pairs = Dedup.minhashNearDupPairs(df, idCol, textCol, threshold = threshold)
    pruneByComponents(df, pairs, "doc_a", "doc_b", idCol)
  }

  /** Quality-aware near-dup collapse: the survivor of each near-dup
    * cluster is its HIGHEST-scoring member (ties break on minimum id),
    * not the minimum id — the SemDeDup/CCNet refinement where the kept
    * representative is chosen by a quality signal, so dedup never trades
    * a clean page for the boilerplate-ridden copy that happens to have
    * the smaller id. Callers supply any score column (char entropy, LM
    * bucket, length…).
    *
    * Shape: identical to [[collapseNearDups]] (band-bounded pair
    * generation + components) plus one cluster-partitioned
    * `row_number() over (score desc, id asc)` argmax — clusters are
    * band-bounded near-dup cliques, so no partition is corpus-sized —
    * and one id-keyed semi-join. No new scale surface. Works for ANY id
    * type (string keys included): the tie-break orders the id itself
    * rather than negating it, which for non-numeric ids would cast to
    * null and silently mark every member a loser.
    *
    * @return the deduplicated frame (all original columns). */
  def collapseNearDupsByQuality(df: DataFrame, idCol: String,
      textCol: String, scoreCol: String,
      threshold: Double = 0.8): DataFrame = {
    val pairs = Dedup.minhashNearDupPairs(df, idCol, textCol, threshold = threshold)
    val comps = connectedComponents(pairs, "doc_a", "doc_b")
    val scored = comps.join(
      df.select(col(idCol).as("id"), col(scoreCol).as("__q")), Seq("id"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("__q").desc, col("id").asc)
    val winners = scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id").as(idCol))
    val losers = comps.select(col("id").as(idCol))
      .join(winners, Seq(idCol), "left_anti")
    df.join(losers, Seq(idCol), "left_anti")
  }
}
