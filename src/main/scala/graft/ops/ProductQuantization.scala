package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-quantization ANN: the memory-scaling tier of the similarity
  * family. Vectors are split into `m` subvectors; each subvector is
  * replaced by the id of its nearest codebook centroid → a d-float vector
  * becomes m small ints (64 floats → 8 codes here, 32× compression). Search
  * uses asymmetric distance computation (ADC): per query, one tiny
  * (m × k) table of query-subvector↔centroid distances; a candidate's
  * approximate distance is the sum of m table lookups.
  *
  * Spark-first shape (no index server, no UDF):
  *  - the codebook is a tiny model (m·k·(d/m) floats) — broadcast;
  *  - encoding = explode(subspace) → broadcast-join centroids → min_by —
  *    one narrow pass over the corpus;
  *  - ADC scoring = equi-join codes⋈distance-table on (subspace, code) +
  *    partial-agg sum — shuffle keys are (query, candidate), never a
  *    full-vector movement; at 100 TB only the 8-byte codes shuffle.
  *
  * The codebook here is seeded from the first k corpus vectors per
  * subspace (deterministic stand-in for a k-means job; the query plans are
  * identical with trained centroids).
  */
object ProductQuantization {

  /** Subvector slice s (0-based) of an array column, given subDim. */
  private def sub(vec: Column, s: Int, subDim: Int): Column =
    slice(vec, s * subDim + 1, subDim)

  /** Squared L2 between two float arrays (left fold, double precision). */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, x) => acc + x)

  /** Per-dimension affine int8 quantization audit — the OTHER embedding
    * compression tier (4× vs PQ's 32×, but reconstruction good enough to
    * search on directly, which is why vector stores default to it):
    * each dimension d gets scale = (max_d − min_d)/255 from the corpus,
    * values map to q = clamp(⌊(x − min_d)/scale + 0.5⌋, 0, 255), and the
    * audit reports per-dimension reconstruction error of x̂ = min_d +
    * q·scale. The report is what an engineer actually decides on: which
    * dimensions lose how much.
    *
    * Determinism: the ⌊·+0.5⌋ rounding is spelled out (engines disagree
    * on round-half semantics); error sums follow the decimal(27,15)
    * rule. Constant dimensions (scale 0) quantize to 0 with zero error.
    *
    * Scale: posexplode → one map-side-combinable min/max aggregate per
    * dimension (dim-count rows) → broadcast back onto the exploded
    * stream → one more keyed aggregate. Nothing driver-side; the wide
    * vector never shuffles.
    *
    * @return (dim, min_val, max_val, mean_abs_err, max_abs_err) */
  def int8QuantizationAudit(corpus: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val vals = corpus.filter(col(idCol).isNotNull)
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("dim", "__x")))
      .select(col("dim").cast("long").as("dim"), col("__x").cast("double").as("__x"))
    val ranges = vals.groupBy(col("dim"))
      .agg(min(col("__x")).as("__mn"), max(col("__x")).as("__mx"))
      .withColumn("__scale", (col("__mx") - col("__mn")) / 255.0)
    val err = vals.join(broadcast(ranges), Seq("dim"))
      .withColumn("__q",
        when(col("__scale") === 0.0, lit(0.0))
          .otherwise(least(greatest(
            floor((col("__x") - col("__mn")) / col("__scale") + 0.5), lit(0.0)),
            lit(255.0))))
      .withColumn("__err",
        abs(col("__mn") + col("__q") * col("__scale") - col("__x")))
    err.groupBy(col("dim"))
      .agg(round(min(col("__mn")), 6).as("min_val"),
        round(max(col("__mx")), 6).as("max_val"),
        round(sum(col("__err").cast("decimal(27,15)")).cast("double") /
          count(lit(1)), 6).as("mean_abs_err"),
        round(max(col("__err")), 6).as("max_abs_err"))
  }

  /** Codebook rows (s, c, cvec): centroid c of subspace s = subvector of
    * the c-th lowest-id corpus vector. */
  def seedCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val seeds = corpus.orderBy(col(idCol)).limit(k)
      .select(col(vecCol)).collect().map(_.getSeq[Float](0))
    val rows = for {
      s <- 0 until m
      c <- 0 until k
    } yield (s, c, seeds(c).slice(s * subDim, (s + 1) * subDim))
    corpus.sparkSession.createDataFrame(rows).toDF("s", "c", "cvec")
  }

  /** Collected codebook: (s, c) → centroid subvector, plus the sorted code
    * ids per subspace. The codebook is a MODEL (m·k·(d/m) floats — the
    * manifest bounds it), so pulling it to the driver is the
    * [[ScalarQuant.collectModel]] move, not a data collect; baked as
    * literals it turns encoding and ADC into pure codegen'd map work. */
  private def collectCodebook(codebook: DataFrame)
      : Map[Int, Seq[(Int, Seq[Float])]] =
    codebook.select(col("s").cast("int"), col("c").cast("int"), col("cvec"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Float](2)))
      .groupBy(_._1)
      .map { case (s, rows) =>
        s -> rows.map(r => (r._2, r._3)).sortBy(_._1).toSeq
      }

  /** Encode every corpus vector to its m nearest-centroid codes.
    *
    * Pure per-row codegen (r18, guide §2.4 + §4.1): the codebook rides as
    * LITERAL subvector arrays and the argmin per subspace is
    * `least(struct(dist, c)…)` — the same (dist asc, c asc) total order as
    * the previous min_by aggregate, over the same left-fold l2sq doubles,
    * so codes are bit-identical. The previous shape exploded the corpus to
    * m·k rows per vector through a broadcast join and TWO keyed
    * aggregations (two exchanges of |corpus|-scale rows); this one has
    * ZERO exchanges and ZERO joins — the encode pass is now scan-speed at
    * any corpus size (r17-VERDICT item 4). */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, m: Int): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val cb = collectCodebook(codebook)
    val codes = array((0 until m).map { s =>
      val cands = cb.getOrElse(s, Seq.empty).map { case (c, cvec) =>
        struct(l2sq(sub(col(vecCol), s, subDim), lit(cvec.toArray)).as("d"),
          lit(c).as("c"))
      }
      require(cands.nonEmpty, s"encode: codebook has no centroids for subspace $s")
      val best = if (cands.size == 1) cands.head else least(cands: _*)
      best.getField("c")
    }: _*)
    corpus.select(col(idCol), codes.as("codes"))
  }

  /** Per-query ADC lookup map (qid, __dt): the (s, c, partial) distance
    * table folded to ONE map per query keyed s·CodeSlot + c — query-count
    * rows, broadcast-sized by construction. */
  private[ops] val CodeSlot = 1L << 21
  private[ops] def dtableToMap(dtable: DataFrame): DataFrame =
    dtable.groupBy(col("qid"))
      .agg(map_from_entries(collect_list(struct(
        (col("s").cast("long") * CodeSlot + col("c").cast("long")).as("k"),
        col("partial").as("v")))).as("__dt"))

  /** Codegen'd ADC distance: Σ_s dt[s·CodeSlot + codes[s]] as a BALANCED
    * decimal add tree — one whole-stage-codegen expression per candidate
    * row instead of the previous posexplode → m-way broadcast probe →
    * hash re-aggregation of (qid, vec_id)·m rows (r17-VERDICT item 4).
    * Exactness: each partial is rounded double→decimal(…,18) exactly as
    * the previous sum's cast did; decimal adds are exact, and the
    * balanced tree grows precision by 1 per level (13 integer digits at
    * the leaves + ⌈log₂ 128⌉ = 38 max), so no Spark precision-loss
    * adjustment ever fires and the total equals the aggregate sum bit for
    * bit. Leaf bound: a partial ≥ 1e13 would overflow the leaf cast —
    * partials are squared L2 of unit-scale float subvectors, orders of
    * magnitude below it. */
  private[ops] def adcDistance(codes: Column, dt: Column, m: Int): Column = {
    require(m >= 1 && m <= 128, s"adcDistance: m must be in [1, 128], got $m")
    def bal(ts: Seq[Column]): Column =
      if (ts.size == 1) ts.head
      else bal(ts.grouped(2).map(_.reduce(_ + _)).toSeq)
    bal((0 until m).map(s =>
      element_at(dt,
        element_at(codes, s + 1).cast("long") + lit(s.toLong * CodeSlot))
        .cast("decimal(31,18)"))).cast("double")
  }

  /** ADC top-k: approximate L2² ranking via code lookups, then exact
    * cosine re-rank of the top `rerank` candidates.
    * @return (qid, rank, vec_id, score) like the other search ops. */
  def searchADC(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      codebook: DataFrame, m: Int, k: Int = 10, rerank: Int = 50): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val codes = encode(corpus, idCol, vecCol, codebook, m)

    // per-query distance table: (qid, s, c, partial L2²)
    val dtable = queries.select(col(qidCol).as("qid"),
        explode(array((0 until m).map(s =>
          struct(lit(s).as("s"), sub(col(qvecCol), s, subDim).as("qsv"))): _*)).as("__e"))
      .select(col("qid"), col("__e.s").as("s"), col("__e.qsv").as("qsv"))
      .join(broadcast(codebook), Seq("s"))
      .select(col("qid"), col("s"), col("c"), l2sq(col("qsv"), col("cvec")).as("partial"))

    // candidate scoring: one codegen'd m-lookup sum per (query, vector)
    // row against the broadcast per-query lookup map — no posexplode, no
    // (qid, vec_id)·m re-aggregation exchange; the balanced decimal tree
    // keeps the sum bit-identical to the previous aggregate (see
    // adcDistance)
    val approx = codes.select(col(idCol).as("vec_id"), col("codes"))
      .crossJoin(broadcast(dtableToMap(dtable)))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        adcDistance(col("codes"), col("__dt"), m).as("approx_l2sq"))
    val wApprox = Window.partitionBy(col("qid"))
      .orderBy(col("approx_l2sq"), col("vec_id"))
    val candidates = approx.withColumn("__rn", row_number().over(wApprox))
      .filter(col("__rn") <= rerank)
      .select(col("qid"), col("vec_id"))

    // exact re-rank of the shortlist
    rerankExact(candidates, corpus, idCol, vecCol, queries, qidCol, qvecCol, k)
  }

  /** Exact cosine re-rank of a (qid, vec_id) shortlist — the final stage
    * shared by every ANN variant. The shortlist is rerank·|queries| rows;
    * full vectors are fetched only for it. */
  private[ops] def rerankExact(candidates: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String, k: Int): DataFrame = {
    val wFinal = Window.partitionBy(col("qid"))
      .orderBy(col("score").desc, col("vec_id"))
    candidates
      .join(corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__v")), "vec_id")
      .join(broadcast(queries.select(col(qidCol).as("qid"), col(qvecCol).as("__q"))), "qid")
      .select(col("qid"), col("vec_id"),
        round(Similarity.cosine(col("__q"), col("__v")), 6).as("score"))
      .withColumn("rank", row_number().over(wFinal))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("score"))
  }

  /** IVF-PQ: the production ANN composition. IVF cells prune WHICH
    * vectors are scored (queries probe `nprobe` cells), PQ codes prune
    * WHAT is read to score them (m bytes per vector instead of d floats),
    * and the exact re-rank repairs quantization error on the shortlist.
    *
    * At 100 TB this is the only tier whose working set fits: the scored
    * stream is (probed fraction of corpus) × (m-byte codes); full vectors
    * surface only for rerank·|queries| rows. Both the cell index and the
    * codebook are tiny broadcast tables; the corpus-side plan is one
    * narrow assignment pass + one encode pass (both offline-amortizable —
    * a serving system materializes `assigned ⋈ codes` as the index), and
    * the per-query work is an equi-join on (cell, subspace, code).
    *
    * @param centroids IVF cells (cidCol, cvecCol), e.g. from
    *                  [[Similarity.trainCentroids]]
    * @param codebook  PQ codebook (s, c, cvec) from [[seedCodebook]]
    * @return (qid, rank, vec_id, score) — exact cosine on the shortlist */
  def searchIvfPq(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qidCol: String, qvecCol: String,
      centroids: DataFrame, cidCol: String, cvecCol: String,
      codebook: DataFrame, m: Int, k: Int = 10, nprobe: Int = 2,
      rerank: Int = 50): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val cells = centroids.select(col(cidCol).as("cid"), col(cvecCol).as("__c"))

    // offline index side: cell assignment + PQ codes per vector.
    // argmax via max_by, not a row_number window: the aggregate is
    // map-side combinable, so partials collapse to one row per vector
    // BEFORE the shuffle instead of exchanging |corpus|×kCells rows.
    // Ordering (sim, -cid) is a total order per group (cid unique), so
    // the result is deterministic: highest sim, ties to the lowest cid.
    val assigned = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("__v"))
      .join(broadcast(cells))
      .select(col("vec_id"), col("cid"),
        Similarity.cosine(col("__v"), col("__c")).as("__sim"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("__sim"), -col("cid"))).as("cid"))
    val indexed = encode(corpus, idCol, vecCol, codebook, m)
      .select(col(idCol).as("vec_id"), col("codes"))
      .join(assigned, Seq("vec_id"))

    // query side: nprobe cells + the (s, c) distance table
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("__sim").desc, col("cid"))
    val probes = queries.select(col(qidCol).as("qid"), col(qvecCol).as("__q"))
      .join(broadcast(cells))
      .select(col("qid"), col("cid"),
        Similarity.cosine(col("__q"), col("__c")).as("__sim"))
      .withColumn("__rn", row_number().over(wProbe))
      .filter(col("__rn") <= nprobe)
      .select(col("qid"), col("cid"))
    val dtable = queries.select(col(qidCol).as("qid"),
        explode(array((0 until m).map(s =>
          struct(lit(s).as("s"), sub(col(qvecCol), s, subDim).as("qsv"))): _*)).as("__e"))
      .select(col("qid"), col("__e.s").as("s"), col("__e.qsv").as("qsv"))
      .join(broadcast(codebook), Seq("s"))
      .select(col("qid"), col("s"), col("c"), l2sq(col("qsv"), col("cvec")).as("partial"))

    // ADC over probed cells only — one codegen'd m-lookup sum per
    // (query, probed vector) row (see adcDistance; bit-identical to the
    // previous posexplode → join → sum shape)
    val wApprox = Window.partitionBy(col("qid"))
      .orderBy(col("approx_l2sq"), col("vec_id"))
    val candidates = indexed.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(dtableToMap(dtable)), Seq("qid"))
      .select(col("qid"), col("vec_id"),
        adcDistance(col("codes"), col("__dt"), m).as("approx_l2sq"))
      .withColumn("__rn", row_number().over(wApprox))
      .filter(col("__rn") <= rerank)
      .select(col("qid"), col("vec_id"))

    rerankExact(candidates, corpus, idCol, vecCol, queries, qidCol, qvecCol, k)
  }
}
