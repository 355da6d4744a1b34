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

  /** Encode every corpus vector to its m nearest-centroid codes. */
  def encode(corpus: DataFrame, idCol: String, vecCol: String,
      codebook: DataFrame, m: Int): DataFrame = {
    val dim = corpus.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    corpus.select(col(idCol).as("__id"),
        explode(array((0 until m).map(s =>
          struct(lit(s).as("s"), sub(col(vecCol), s, subDim).as("sv"))): _*)).as("__e"))
      .select(col("__id"), col("__e.s").as("s"), col("__e.sv").as("sv"))
      .join(broadcast(codebook), Seq("s"))
      .groupBy(col("__id"), col("s"))
      // (dist, c) struct ordering: exact-tie distances break to the
      // lowest code id — encoding is deterministic, oracle-replayable
      .agg(min_by(col("c"), struct(l2sq(col("sv"), col("cvec")), col("c")))
        .as("code"))
      .groupBy(col("__id"))
      .agg(transform(array_sort(collect_list(struct(col("s"), col("code")))),
        x => x.getField("code")).as("codes"))
      .select(col("__id").as(idCol), col("codes"))
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

    // candidate scoring: explode codes, look up partials, sum per (qid, id)
    val exploded = codes.select(col(idCol).as("vec_id"),
      posexplode(col("codes")).as(Seq("s", "c")))
    // decimal partial sum: associative, so partial-merge fetch order
    // can't wiggle low bits and flip a rerank-boundary candidate
    val approx = exploded.join(broadcast(dtable), Seq("s", "c"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("partial").cast("decimal(38,18)")).cast("double")
        .as("approx_l2sq"))
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

    // ADC over probed cells only
    val wApprox = Window.partitionBy(col("qid"))
      .orderBy(col("approx_l2sq"), col("vec_id"))
    val candidates = indexed.join(broadcast(probes), Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), posexplode(col("codes")).as(Seq("s", "c")))
      .join(broadcast(dtable), Seq("qid", "s", "c"))
      .groupBy(col("qid"), col("vec_id"))
      .agg(sum(col("partial").cast("decimal(38,18)")).cast("double")
        .as("approx_l2sq"))
      .withColumn("__rn", row_number().over(wApprox))
      .filter(col("__rn") <= rerank)
      .select(col("qid"), col("vec_id"))

    rerankExact(candidates, corpus, idCol, vecCol, queries, qidCol, qvecCol, k)
  }
}
