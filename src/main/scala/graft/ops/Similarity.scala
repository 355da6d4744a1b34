package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two tiers, per the 100 TB mandate:
  *  - [[bruteForceTopK]]: exact cosine top-k. The query set is broadcast
  *    (small side never shuffles); the corpus streams through one columnar
  *    scan; per-query top-k is a rank-truncated window — at 1000 executors
  *    this is embarrassingly parallel with a single shuffle keyed on
  *    query_id of only the per-partition survivors.
  *  - [[ivfTopK]]: IVF-style approximate search. Vectors are assigned to
  *    their nearest centroid once (a narrow map); queries probe only
  *    `nprobe` cells, cutting scanned vectors by ~|cells|/nprobe. Centroids
  *    here are seeded from the corpus deterministically; at real scale
  *    they'd come from a k-means job and live as a broadcast table — the
  *    query plan is identical.
  *
  * All arithmetic is double-precision folds via codegen'd higher-order
  * functions — identical fold order to the DuckDB oracle so scores
  * hash-match exactly.
  */
object Similarity {

  private def widen(df: DataFrame): DataFrame = TextFunctions.widen(df)

  /** Left-fold dot product of two float vectors in double precision
    * (composable form; kept as the readable spec of the numerics). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm2(a: Column): Column = dot(a, a)

  /** Same numerics as [[cosineComposable]], via the codegen'd custom
    * expression [[graft.functions.CosineSimilarity]] — one fused primitive
    * loop in whole-stage codegen instead of interpreted lambdas. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity(a, b)

  /** Reference formulation built only from org.apache.spark.sql.functions;
    * bit-identical to [[cosine]] (same left fold, double precision). */
  def cosineComposable(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(norm2(a)) * sqrt(norm2(b)))

  /** Symmetric int8 scalar quantization of an embedding column, the 4×
    * memory cut in front of ANN re-ranking: per-vector scale = max |x|,
    * q_i = round(x_i · 127 / scale) ∈ [-127, 127]. Fully relational
    * (posexplode → per-vector max via one map-side-combinable agg → join
    * back), never a nested higher-order-function pair — `aggregate` +
    * `transform` over the same array is interpreted AND re-evaluated per
    * element once CollapseProject inlines it (the repo-wide HOF trap).
    * Output: one row per (id, pos) with the quantized value and scale;
    * callers regroup with collect_list over a (id, pos) sort or aggregate
    * stats directly. All-zero vectors quantize to 0 (no ANSI div-by-zero). */
  def int8Quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val rows = widen(df)
      .select(col(idCol).as("__id"), posexplode(col(vecCol)).as(Seq("pos", "x")))
      .select(col("__id"), col("pos").cast("long").as("pos"),
        col("x").cast("double").as("x"))
    val scales = rows.groupBy(col("__id"))
      .agg(max(abs(col("x"))).as("scale"))
    rows.join(scales, Seq("__id"))
      .select(col("__id").as(idCol), col("pos"),
        when(col("scale") === 0.0, lit(0))
          .otherwise(round(col("x") * 127.0 / col("scale"), 0).cast("int"))
          .as("q"),
        col("scale"))
  }

  /** Exact top-k by cosine for each query vector.
    * @param queries (qid, qvec) — small, broadcast
    * @param corpus  (id, vec) — large, streamed */
  def bruteForceTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      k: Int = 10): DataFrame = {
    val scored = widen(corpus).select(col(idCol).as("vec_id"), col(vecCol).as("__v"))
      .join(broadcast(queries.select(col(qidCol).as("qid"), col(qvecCol).as("__q"))),
        col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(cosine(col("__q"), col("__v")), 6).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("score"))
  }

  /** Lloyd's k-means for IVF cell centroids, Spark-first: each iteration
    * is one broadcast-join assignment pass over the corpus plus a
    * (cell, dim)-keyed mean — map-side combinable, two narrow shuffles —
    * and the kCells×dim means (a few KB) are collected and re-broadcast
    * as literals, the same driver-aggregate shape MLlib's k-means uses.
    * Deterministic end to end: seeding is the kCells corpus vectors with
    * the smallest salted md5 of their id (no RNG), ties in assignment
    * break on cell id. A cell that loses all members keeps its previous
    * centroid. Returns (cid int, cvec array<float>). */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      kCells: Int, iters: Int = 3): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = widen(corpus).select(col(idCol).as("__id"), col(vecCol).as("__v"))
    var cents: Map[Int, Seq[Float]] = vecs
      .orderBy(md5(concat(lit("ivf:"), col("__id").cast("string")).cast("binary")))
      .limit(kCells)
      .select(col("__v")).as[Seq[Float]].collect()
      .zipWithIndex.map { case (v, i) => i -> v }.toMap
    for (_ <- 1 to iters) {
      val cdf = cents.toSeq.sortBy(_._1).toDF("cid", "cvec")
      // nearest-centroid argmax via max_by, not a row_number window: the
      // aggregate is map-side combinable, so partials collapse to one
      // row per vector BEFORE the shuffle instead of exchanging
      // |corpus|×kCells rows. Ordering (sim, -cid) is a total order per
      // group (cid unique) → deterministic: best sim, ties to lowest cid.
      // sums as decimals, not doubles: decimal addition is associative, so
      // the merge-fetch order of partial aggregates can't wiggle the mean
      // in its last ulp — training output is bit-stable on any cluster
      // (the same merge-order hazard Buckets documents for percentiles)
      val means = vecs.join(broadcast(cdf))
        .select(col("__id"), col("__v"), col("cid"),
          cosine(col("__v"), col("cvec")).as("__sim"))
        .groupBy(col("__id"))
        .agg(max_by(struct(col("cid"), col("__v")),
          struct(col("__sim"), -col("cid"))).as("__best"))
        .select(col("__best.cid").as("cid"),
          posexplode(col("__best.__v")).as(Seq("pos", "x")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(col("x").cast("decimal(30,15)")).as("s"), count(col("x")).as("n"))
        .as[(Int, Int, java.math.BigDecimal, Long)].collect()
      val updated = means.groupBy(_._1).map { case (cid, rows) =>
        cid -> rows.sortBy(_._2)
          .map(r => (r._3.doubleValue() / r._4).toFloat).toSeq
      }
      cents = cents ++ updated
    }
    cents.toSeq.sortBy(_._1).toDF("cid", "cvec")
  }

  /** IVF-style ANN: assign corpus vectors to nearest of `centroids`;
    * each query probes its `nprobe` nearest cells only.
    * Returns the same shape as [[bruteForceTopK]]; recall < 1 by design —
    * measured against brute force in the test suite. */
  def ivfTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String,
      k: Int = 10, nprobe: Int = 2): DataFrame = {
    val cells = centroids.select(col(cidCol).as("cid"), col(cvecCol).as("__c"))

    // one narrow pass: nearest centroid per corpus vector. max_by, not
    // a row_number window — map-side combinable, so partials collapse
    // to one row per vector before the shuffle instead of exchanging
    // |corpus|×kCells rows; (sim, -cid) is a total order per group
    // (cid unique) → deterministic: best sim, ties to the lowest cid.
    val assigned = widen(corpus).select(col(idCol).as("vec_id"), col(vecCol).as("__v"))
      .join(broadcast(cells))
      .select(col("vec_id"), col("__v"), col("cid"), cosine(col("__v"), col("__c")).as("__sim"))
      .groupBy(col("vec_id"))
      .agg(max_by(struct(col("cid"), col("__v")),
        struct(col("__sim"), -col("cid"))).as("__best"))
      .select(col("vec_id"), col("__best.__v").as("__v"), col("__best.cid").as("cid"))

    // per query: nprobe nearest cells
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("__sim").desc, col("cid"))
    val probes = queries.select(col(qidCol).as("qid"), col(qvecCol).as("__q"))
      .join(broadcast(cells))
      .select(col("qid"), col("__q"), col("cid"), cosine(col("__q"), col("__c")).as("__sim"))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col("qid"), col("__q"), col("cid"))

    // search only probed cells
    val wTop = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        round(cosine(col("__q"), col("__v")), 6).as("score"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("score"))
  }

  /** All-pairs cosine above a threshold (embedding near-dup detection).
    * O(n²) verification — intended for within-block use or modest corpus
    * sizes; the LSH candidate generator below is the 100 TB path. */
  def cosineNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val wide = widen(corpus)
    val a = wide.select(col(idCol).as("id_a"), col(vecCol).as("__va"))
    val b = wide.select(col(idCol).as("id_b"), col(vecCol).as("__vb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("__va"), col("__vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** Per-group GEOMETRIC MEDIAN of an embedding column (Weiszfeld
    * iterations, fixed count) — the robust centroid: a handful of
    * corrupted or adversarial vectors drag a mean centroid arbitrarily
    * far but barely move the geometric median, so this is the statistic
    * a drift monitor (q148's family) should anchor on when the corpus
    * can't be trusted. Update rule per group g:
    *   c ← Σ xᵢ/dᵢ / Σ 1/dᵢ,  dᵢ = ‖xᵢ − c‖₂
    * with the standard singularity guard (a vector AT the centroid gets
    * weight 0 this round).
    *
    * Determinism: per-round numerator/denominator terms are rounded to
    * 12 dp and summed as decimal(30,15) (the trainCentroids device), so
    * aggregation order can't wiggle the state; the state itself is
    * group-count × dims — model-sized, collected per round like k-means
    * centroids.
    *
    * Scale: each round = one broadcast join of the (tiny) centroid
    * table + one posexplode + one map-side-combinable (group, dim)
    * aggregation. `iters` bounds rounds, never data.
    *
    * @return scalar rows (grpCol, dim, value) — value 6-dp rounded */
  def geometricMedian(df: DataFrame, grpCol: String, vecCol: String,
      iters: Int = 2): DataFrame = {
    require(iters >= 1, s"geometricMedian: iters >= 1, got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = widen(df.filter(col(grpCol).isNotNull))
      .select(col(grpCol).cast("string").as("__g"), col(vecCol).as("__v"))
    // init: per-(group, dim) decimal-exact mean
    var cents: Map[String, Seq[Double]] = vecs
      .select(col("__g"), posexplode(col("__v")).as(Seq("__p", "__x")))
      .groupBy(col("__g"), col("__p"))
      .agg(sum(col("__x").cast("decimal(30,15)")).as("s"),
        count(lit(1)).as("n"))
      .as[(String, Int, java.math.BigDecimal, Long)].collect()
      .groupBy(_._1).map { case (g, rows) =>
        g -> rows.sortBy(_._2).map(r => r._3.doubleValue() / r._4).toSeq
      }
    for (_ <- 1 to iters) {
      val cdf = cents.toSeq.sortBy(_._1).toDF("__g", "__c")
      val dist = vecs.join(broadcast(cdf), Seq("__g"))
        .select(col("__g"), col("__v"),
          sqrt(aggregate(zip_with(col("__v"), col("__c"),
            (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
            lit(0.0), (acc, t) => acc + t)).as("__d"))
        .filter(col("__d") > 0)
      val agg = dist
        .select(col("__g"), col("__d"),
          round(lit(1.0) / col("__d"), 12).as("__w"),
          posexplode(col("__v")).as(Seq("__p", "__x")))
        .groupBy(col("__g"), col("__p"))
        .agg(
          sum(round(col("__x").cast("double") / col("__d"), 12)
            .cast("decimal(30,15)")).as("num"),
          sum(col("__w").cast("decimal(30,15)")).as("den"))
        .as[(String, Int, java.math.BigDecimal, java.math.BigDecimal)]
        .collect()
      val updated = agg.groupBy(_._1).map { case (g, rows) =>
        g -> rows.sortBy(_._2)
          .map(r => r._3.doubleValue() / r._4.doubleValue()).toSeq
      }
      cents = cents ++ updated
    }
    cents.toSeq.sortBy(_._1)
      .flatMap { case (g, vs) =>
        vs.zipWithIndex.map { case (v, p) =>
          // HALF_UP like both engines' round(), not rint's half-to-even
          (g, p, BigDecimal(v)
            .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
        }
      }
      .toDF(grpCol, "dim", "value")
  }

  /** Simplified (centroid-based) silhouette of a label partition — the
    * clustering-quality score an embedding pipeline reports for any
    * grouping it is about to trust (k-means output, SemDeDup cells, a
    * taxonomy column): per point, a = distance to its OWN label
    * centroid, b = distance to the NEAREST other centroid, s =
    * (b−a)/max(a,b); averaged per label. The centroid form (Hruschka
    * et al.'s simplified silhouette) replaces the classic all-pairs
    * mean distance with distance-to-centroid, which is what makes the
    * metric computable at corpus scale — O(n·k) instead of O(n²).
    *
    * Determinism: centroid means are decimal-exact sums over
    * decimal(30,15) casts (the q174 init device); each point-centroid
    * distance is a sequential zip_with fold (array order — bit-stable,
    * and mirrored by DuckDB's list_reduce); per-label averaging rounds
    * the per-point scores to 12 dp and sums as decimal(27,15).
    *
    * Scale: one (label, dim)-keyed map-side-combined aggregation builds
    * the k·dim centroid table, which broadcasts; the corpus streams
    * through the broadcast cross join (k rows per point, k =
    * label-count — model-sized) into a point-keyed partial agg and a
    * final label-keyed agg. No shuffle ever carries more than n·k tiny
    * rows, and nothing collects to the driver.
    *
    * @return (labelCol, n, silhouette) — silhouette 6-dp; s = 0 for a
    *         point exactly on both centroids (max distance 0);
    *         silhouette NULL when only one label exists (no "nearest
    *         other centroid" — undefined, as in the classic metric) */
  def labelSilhouette(df: DataFrame, idCol: String, labelCol: String,
      vecCol: String): DataFrame = {
    // null vectors must drop here: a null distance would null the
    // point's silhouette while its row still counted in the average
    val vecs = widen(
        df.filter(col(labelCol).isNotNull && col(vecCol).isNotNull))
      .select(col(idCol).as("__id"), col(labelCol).as("__l"),
        col(vecCol).as("__v"))
    val cm = vecs
      .select(col("__l"), posexplode(col("__v")).as(Seq("__p", "__x")))
      .groupBy(col("__l"), col("__p"))
      .agg((sum(col("__x").cast("decimal(30,15)"))
        .cast("double") / count(lit(1))).as("__m"))
    val cent = cm.groupBy(col("__l"))
      .agg(transform(
        array_sort(collect_list(struct(col("__p").as("p"), col("__m").as("m")))),
        e => e.getField("m")).as("__c"))
    val dist = vecs
      .crossJoin(broadcast(cent.select(col("__l").as("__cl"), col("__c"))))
      .select(col("__id"), col("__l"), col("__cl"),
        sqrt(aggregate(zip_with(col("__v"), col("__c"),
          (x, c) => (x.cast("double") - c) * (x.cast("double") - c)),
          lit(0.0), (a, t) => a + t)).as("__d"))
    val ab = dist.groupBy(col("__id"), col("__l"))
      .agg(max(when(col("__cl") === col("__l"), col("__d"))).as("__a"),
        min(when(col("__cl") =!= col("__l"), col("__d"))).as("__b"))
    val sil = when(greatest(col("__a"), col("__b")) > 0,
      (col("__b") - col("__a")) / greatest(col("__a"), col("__b")))
      .otherwise(lit(0.0))
    ab.select(col("__l"), round(sil, 12).as("__s"))
      .groupBy(col("__l"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("__s").cast("decimal(27,15)")).cast("double") /
          count(lit(1)), 6).as("silhouette"))
      .select(col("__l").as(labelCol), col("n"), col("silhouette"))
  }

  /** EMBEDDING-SPACE decontamination report — train/eval leakage at the
    * semantic level, the companion to the n-gram path
    * ([[Curation.contaminatedIdsBloom]]): for every corpus vector, its
    * single closest eval-set vector by exact cosine, globally ranked so
    * the top-k report is the "most contaminated" list a pipeline reviews
    * (or thresholds) before training. Ties break deterministically
    * (higher cos, then smaller eval id, then smaller corpus id).
    *
    * Scale: the eval set is benchmark-sized (thousands) and BROADCAST —
    * the corpus streams through one scan with zero shuffle of the big
    * side; per-vector best-match is a corpus-id-keyed window (millions of
    * tiny partitions, embarrassingly parallel) and the global top-k is a
    * rank-truncated TakeOrdered, never a full sort. The q40 brute-force
    * shape, pointed at leakage instead of retrieval.
    *
    * @return (idCol, evalIdCol, cos) — the k worst offenders,
    *         cos desc then idCol asc */
  def decontamTopMatches(corpus: DataFrame, idCol: String, vecCol: String,
      evalSet: DataFrame, evalIdCol: String, evalVecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"decontamTopMatches: k >= 1, got $k")
    val scored = widen(corpus).crossJoin(broadcast(evalSet))
      .select(col(idCol), col(evalIdCol),
        round(cosine(col(vecCol), col(evalVecCol)), 6).as("cos"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("cos").desc, col(evalIdCol))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .orderBy(col("cos").desc, col(idCol)).limit(k)
  }

  /** Random-hyperplane LSH bucketing for cosine: sign-bit signature of the
    * vector against `nPlanes` deterministic pseudo-random hyperplanes
    * (hash-derived, no RNG state). Near-identical vectors share buckets;
    * pairs are then verified with exact cosine. The at-scale analog of
    * [[cosineNearDupPairs]]: shuffle keys are (bucket), never a cross join. */
  def cosineLshPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      nPlanes: Int = 16, threshold: Double = 0.9): DataFrame = {
    // plane p, dim i weight = hash-derived value in [-1,1): deterministic,
    // engine-portable, no stored model
    def planeWeight(p: Column, i: Column): Column =
      (conv(substring(md5(concat_ws("_", p, i).cast("binary")), 1, 6), 16, 10)
        .cast("double") / lit(8388608.0)) - lit(1.0)
    val dims = sequence(lit(1), size(col("__v")))
    val sig = aggregate(
      transform(sequence(lit(0), lit(nPlanes - 1)), p =>
        when(aggregate(transform(dims, i =>
          element_at(col("__v"), i).cast("double") * planeWeight(p, i)),
          lit(0.0), (acc, x) => acc + x) > 0,
          pow(lit(2.0), p).cast("long")).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
    val hashed = widen(corpus).select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__bucket", sig)
    val a = hashed.select(col("__id").as("id_a"), col("__v").as("__va"), col("__bucket"))
    val b = hashed.select(col("__id").as("id_b"), col("__v").as("__vb"), col("__bucket"))
    a.join(b, Seq("__bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("__va"), col("__vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** Deterministic ±1 SRP hyperplane weights from md5 parity: plane p,
    * 1-based dim d gets +1 iff the first hex digit of md5("p:d") is odd.
    * Engine-portable — the JVM's MD5 and DuckDB's md5() agree on the hex,
    * so the oracle re-derives the identical matrix inline in SQL. The
    * matrix is tiny (planes × dims doubles) and rides into executors as a
    * codegen constant, never a per-row hash. */
  def srpPlaneWeights(planes: Int, dims: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until planes).map { p =>
      (1 to dims).map { d =>
        md.reset()
        val h = md.digest(s"$p:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first hex char = high nibble of byte 0; odd digits 1,3,5,7,9,b,d,f
        if (((h(0) >> 4) & 1) == 1) 1.0 else -1.0
      }
    }
  }

  /** Salted Rademacher (±1) matrix from md5 parity — same construction as
    * [[srpPlaneWeights]] with a salt so independent operators (SRP
    * hashing, JL projection) never share a matrix. Row p, column d is the
    * parity of the first hex digit of md5("salt:p:d") — reproducible by
    * any engine with md5, which is what makes the oracle exact. */
  def rademacherMatrix(outDims: Int, inDims: Int, salt: String): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until outDims).map { p =>
      (1 to inDims).map { d =>
        md.reset()
        val h = md.digest(s"$salt:$p:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))
        if (((h(0) >> 4) & 1) == 1) 1.0 else -1.0
      }
    }
  }

  /** Johnson–Lindenstrauss dimensionality reduction with a Rademacher
    * sign matrix (Achlioptas 2003: ±1 entries satisfy the JL lemma with
    * the same distortion bound as Gaussians, and — unlike Gaussians —
    * generate EXACTLY the same matrix on any engine via md5 parity, so
    * the projection is oracle-checkable to the last bit). Embeddings
    * project k-dim → `weights.length`-dim as proj_p = ⟨v, row_p⟩/√k;
    * inner products and norms are preserved in expectation, so
    * downstream cosine/ANN operators run unchanged on the short vectors
    * at 1/4 the bytes.
    *
    * Pure per-row codegen'd array math — zero shuffles at any corpus
    * size. The per-component left fold matches DuckDB's `list_reduce`
    * order, the q127-proven device for float-exact array oracles. */
  def rademacherProject(vec: Column, weights: Seq[Seq[Double]]): Column = {
    val w = typedLit(weights)
    val k = weights.length
    transform(sequence(lit(0), lit(k - 1)), p =>
      aggregate(
        zip_with(vec, element_at(w, p + 1), (x, wd) => x.cast("double") * wd),
        lit(0.0), (acc, x) => acc + x) / lit(math.sqrt(k.toDouble)))
  }

  /** Readable spec of [[graft.functions.SrpSignature]]'s numerics built
    * only from org.apache.spark.sql.functions — bit-identical (same
    * per-plane left fold, double precision). Interpreted HOFs: use the
    * codegen'd expression in any hot path. */
  def srpSignatureBitsComposable(vec: Column, weights: Seq[Seq[Double]]): Column = {
    val w = typedLit(weights)
    transform(sequence(lit(0), lit(weights.length - 1)), p =>
      when(aggregate(
        zip_with(vec, element_at(w, p + 1), (x, wd) => x.cast("double") * wd),
        lit(0.0), (acc, x) => acc + x) >= 0, lit(1)).otherwise(lit(0)))
  }

  /** Banded SRP-LSH near-dup pairs — the at-scale path for
    * [[cosineNearDupPairs]] with tunable recall (vs [[cosineLshPairs]]'s
    * single exact-signature bucket): `bands` independent slices of
    * `rowsPerBand` sign bits each; two vectors are candidates iff they
    * agree on ALL bits of at least one band (collision prob
    * 1-(1-p^r)^b with p = 1-θ/π). Candidates are verified with exact
    * cosine at `threshold`.
    *
    * Scale: the only shuffles are the (band, key) aggregation and the
    * verify join — never a cross join. Bucket members are collected
    * sorted and capped at `maxBucket` (a degenerate bucket — e.g. the
    * all-zeros signature of near-zero vectors — is dropped the way
    * boilerplate buckets are in the MinHash path), so pair expansion is
    * O(cap²) per bucket worst case. Signatures are one codegen'd
    * primitive loop per row ([[graft.functions.SrpSignature]]).
    *
    * @return (id_a, id_b, cos) with id_a < id_b, cos rounded to 6 dp */
  def srpBandedNearDupPairs(
      corpus: DataFrame, idCol: String, vecCol: String,
      dims: Int, bands: Int = 4, rowsPerBand: Int = 4,
      threshold: Double = 0.3, maxBucket: Int = 1000): DataFrame = {
    val weights = srpPlaneWeights(bands * rowsPerBand, dims)
    val hashed = widen(corpus)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"))
      .withColumn("__bits", graft.functions.SrpSignature(col("__v"), weights))
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        concat((0 until rowsPerBand).map(r =>
          element_at(col("__bits"), b * rowsPerBand + r + 1).cast("string")): _*)
          .as("band_key"))
    }
    val banded = hashed
      .select(col("__id"), explode(array(bandStructs: _*)).as("__band"))
      .select(col("__id"), col("__band.band_id").as("__band_id"),
        col("__band.band_key").as("__band_key"))
    val cand = banded.groupBy(col("__band_id"), col("__band_key"))
      .agg(sort_array(collect_list(col("__id"))).as("__ids"))
      .filter(size(col("__ids")).between(2, maxBucket))
      .select(explode(flatten(transform(col("__ids"), (x, i) =>
        transform(slice(col("__ids"), i + 2, size(col("__ids"))),
          y => struct(x.as("a"), y.as("b")))))).as("__p"))
      .select(col("__p.a").as("id_a"), col("__p.b").as("id_b"))
      .distinct()
    val va = hashed.select(col("__id").as("id_a"), col("__v").as("__va"))
    val vb = hashed.select(col("__id").as("id_b"), col("__v").as("__vb"))
    cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("cos", cosine(col("__va"), col("__vb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** SemDeDup (semantic dedup): within each pre-assigned cluster, vectors
    * whose cosine ≥ `threshold` are duplicates; every duplicate component
    * keeps only its minimum id. The cluster column (a k-means cell from
    * [[trainCentroids]], a label, an LSH bucket) bounds the pair search —
    * the join shuffles on the cluster key, never a corpus cross join, so
    * at 100 TB the cost is Σ|cluster|² not |corpus|². Transitive chains
    * (a≈b≈c with cos(a,c) < τ) collapse to ONE survivor via
    * [[DedupClustering.connectedComponents]], matching the paper's
    * cluster-then-prune semantics rather than naive pair-wins.
    *
    * @return the surviving rows of `corpus` (schema unchanged) */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
      clusterCol: String, threshold: Double): DataFrame = {
    val wide = widen(corpus)
    val a = wide.select(col(clusterCol).as("__c"), col(idCol).as("id_a"),
      col(vecCol).as("__va"))
    val b = wide.select(col(clusterCol).as("__c"), col(idCol).as("id_b"),
      col(vecCol).as("__vb"))
    val pairs = a.join(b, Seq("__c")).filter(col("id_a") < col("id_b"))
      .filter(cosine(col("__va"), col("__vb")) >= threshold)
      .select(col("id_a"), col("id_b"))
    DedupClustering.pruneByComponents(corpus, pairs, "id_a", "id_b", idCol)
  }

  /** Matryoshka search: brute-force cosine top-k over the first `dims`
    * components only. MRL-trained embeddings keep most of their signal in
    * the prefix, so truncating cuts the dot-product cost (and the shuffled
    * bytes of any downstream exchange) by dims/D with modest recall loss.
    * Cosine self-normalizes, so no re-normalization pass is needed. */
  def matryoshkaTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      dims: Int, k: Int = 10): DataFrame = {
    require(dims >= 1, s"matryoshkaTopK: dims must be >= 1, got $dims")
    bruteForceTopK(
      corpus.withColumn(vecCol, slice(col(vecCol), 1, dims)), idCol, vecCol,
      queries.withColumn(qvecCol, slice(col(qvecCol), 1, dims)), qidCol, qvecCol,
      k)
  }

  /** ColBERT-style late-interaction MaxSim re-ranking (Khattab &
    * Zaharia, "ColBERT: Efficient and Effective Passage Search via
    * Contextualized Late Interaction over BERT", SIGIR 2020): each
    * vector is treated as `m` contiguous sub-vectors of dim/m components
    * (the multi-vector representation), and score(q, d) =
    * Σ_i max_j cos(q_i, d_j) — every query sub-vector matches its best
    * doc sub-vector independently, which is what lets late interaction
    * beat single-vector cosine on multi-topic documents.
    *
    * The m×m interaction grid is unrolled STATICALLY into m² codegen'd
    * [[cosine]] expressions combined with `greatest` and `+` — no
    * higher-order functions at all, so the whole score stays inside
    * whole-stage codegen and sidesteps the nested-HOF
    * re-evaluation trap documented on [[int8Quantize]]. Queries
    * broadcast; the corpus is never shuffled before the per-query
    * top-k window (WindowGroupLimit pushes the rank filter).
    *
    * Output: (qid, rank, vec_id, score), top `k` per query, score
    * rounded to 6 decimals, ties broken on vec_id. */
  def maxSimTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      dim: Int, m: Int, k: Int): DataFrame = {
    require(m >= 2, s"maxSimTopK: m must be >= 2, got $m")
    require(dim % m == 0, s"maxSimTopK: m=$m must divide dim=$dim")
    val sub = dim / m
    def subv(c: Column, i: Int) = slice(c, i * sub + 1, sub)
    val score = (0 until m).map { i =>
      greatest((0 until m).map(j =>
        cosine(subv(col("__q"), i), subv(col("__v"), j))): _*)
    }.reduce(_ + _)
    val scored = widen(corpus)
      .select(col(idCol).as("vec_id"), col(vecCol).as("__v"))
      .join(broadcast(queries.select(col(qidCol).as("qid"),
        col(qvecCol).as("__q"))), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), round(score, 6).as("score"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("score"))
  }
}
