package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword relevance ranking and rank fusion for retrieval-style corpus
  * queries: Okapi BM25, reciprocal rank fusion (hybrid keyword+vector
  * search), and deterministic negative sampling for contrastive training
  * pairs.
  *
  * The reference engine (lance-namespace-impls) serves tables to search
  * systems but ranks nothing itself; these give the Spark-side engine the
  * ranking layer a training-data pipeline needs (mining hard negatives,
  * building retrieval eval sets, hybrid near-dup triage). Same rules as
  * the rest of graft.ops: pure DataFrame plans over codegen'd functions,
  * no UDFs, no driver collects; every floating-point reduction is a
  * decimal sum so partial-merge order can't wiggle low bits, and every
  * "random" choice is a salted md5 so the DuckDB oracle replays it
  * bit-for-bit.
  */
object TextRanking {

  /** Okapi BM25 scores of every document against a bag of query terms.
    *
    * One token explode feeds both aggregates (df over the full corpus,
    * tf per document), both keyed on the term so the filter to the tiny
    * query vocabulary happens BEFORE any shuffle; corpus size and total
    * token count ride in as a broadcast 1-row aggregate, never a
    * driver-side constant. idf = ln(1 + (N - df + ½)/(df + ½)) (the
    * Lucene-style floor-at-zero variant), tf term = tf·(k1+1)/(tf +
    * k1·(1 - b + b·dl/avgdl)). Per-document summation over matched terms
    * is a decimal sum — associative, so bit-stable under Spark's
    * nondeterministic partial-merge order.
    *
    * At 100 TB: the exploded token stream is the only wide plan node and
    * it is filtered to query terms at the scan side of the shuffle; df
    * and the 1-row corpus stats broadcast to the tf side, so the whole
    * query is one shuffle keyed on doc id.
    *
    * @return (idCol, score) — one row per document containing ≥1 query
    *         term; callers rank/truncate (absent docs score 0)
    */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: queryTerms must be non-empty")
    val base = TextFunctions.widen(docs)
      .select(col(idCol).as("__id"), TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("__id"), col("__toks"), size(col("__toks")).cast("long").as("__dl"))
    val stats = base.agg(count(lit(1)).as("__n"), sum(col("__dl")).as("__sumdl"))
    val toks = base
      .select(col("__id"), col("__dl"), explode(col("__toks")).as("__t"))
      .filter(col("__t").isInCollection(queryTerms))
    val tf = toks.groupBy(col("__id"), col("__t"))
      .agg(count(lit(1)).as("__tf"), max(col("__dl")).as("__dl"))
    // df(t) = rows per term in the (id, term) aggregate — derived from tf
    // instead of a second scan+explode of the corpus; the two branches
    // share one Exchange (ReuseExchange), so BM25 costs two scans total
    // (token stream + the 1-row corpus stats)
    val dfreq = tf.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    val avgdl = col("__sumdl").cast("double") / col("__n")
    val idf = log(lit(1.0) + (col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val tfTerm = col("__tf") * lit(k1 + 1.0) /
      (col("__tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("__dl") / avgdl))
    tf.join(broadcast(dfreq), Seq("__t"))
      .crossJoin(broadcast(stats))
      .groupBy(col("__id"))
      .agg(sum((idf * tfTerm).cast("decimal(38,18)")).cast("double").as("score"))
      .select(col("__id").as(idCol), col("score"))
  }

  /** DuckDB mirror of the BM25 score expression pipeline, parameterized
    * the same way — single source for every oracle that replays it. The
    * caller supplies the terms as a SQL list literal. */
  def bm25Sql(termsList: String, k1: Double = 1.2, b: Double = 0.75,
      where: String = ""): String =
    s"""WITH base AS (
       |  SELECT doc_id AS id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
       |  FROM documents$where),
       |lens AS (SELECT id, CAST(len(tk) AS BIGINT) AS dl FROM base),
       |stats AS (SELECT count(*) AS n, sum(dl) AS sumdl FROM lens),
       |toks AS (
       |  SELECT id, dl, t
       |  FROM (SELECT id, dl, unnest(tk) AS t FROM base JOIN lens USING (id))
       |  WHERE list_contains($termsList, t)),
       |tf AS (SELECT id, t, count(*) AS tf, max(dl) AS dl FROM toks GROUP BY id, t),
       |dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t)
       |SELECT id, CAST(sum(CAST(
       |    ln(1.0 + (n - df + 0.5) / (df + 0.5)) *
       |    (tf * ${k1 + 1.0} / (tf + $k1 * (1.0 - $b + $b * dl / (CAST(sumdl AS DOUBLE) / n))))
       |  AS DECIMAL(38,18))) AS DOUBLE) AS score
       |FROM tf JOIN dfreq USING (t) CROSS JOIN stats
       |GROUP BY id""".stripMargin

  /** nDCG@k — the graded ranking-quality metric a retrieval stack
    * reports: DCG = Σ (2^grade − 1)/log₂(rank+1) over a system's ranked
    * list, normalized by the ideal DCG of the best-possible ordering of
    * the same query's candidate pool. Closes the evaluation family next
    * to the recall audits (q170/q171): recall says WHAT came back, nDCG
    * says whether it came back in the right ORDER with the right
    * emphasis on highly-relevant items.
    *
    * Determinism: discount terms are rounded to 12 dp and summed as
    * decimal(27,15) (the exact-sum rule); the ideal ordering breaks
    * grade ties by item id, a total order.
    *
    * Scale: the system list is already rank-truncated (k rows per
    * query); the ideal side ranks the judgment pool per query with a
    * query-keyed window — judgment pools are human-annotation-sized, so
    * neither side ever touches corpus-scale data.
    *
    * @param ranked system output: (qidCol, idCol, rankCol) — rank 1-based
    * @param judgments relevance pool: (qidCol, idCol, gradeCol ≥ 0);
    *                  items missing from the pool count as grade 0
    * @return (qidCol, dcg, idcg, ndcg) — 6-dp rounded */
  def ndcgAtK(ranked: DataFrame, judgments: DataFrame, qidCol: String,
      idCol: String, rankCol: String, gradeCol: String, k: Int): DataFrame = {
    require(k >= 1, s"ndcgAtK: k >= 1, got $k")
    val ln2 = log(lit(2.0))
    def gain(grade: Column) = pow(lit(2.0), grade) - 1.0
    def discount(rank: Column) = log(rank.cast("double") + 1.0) / ln2
    val sys = ranked.filter(col(rankCol) <= k)
      .join(judgments.select(col(qidCol), col(idCol), col(gradeCol)),
        Seq(qidCol, idCol), "left")
      .select(col(qidCol),
        round(gain(coalesce(col(gradeCol), lit(0))) /
          discount(col(rankCol)), 12).as("__t"))
      .groupBy(col(qidCol))
      .agg(sum(col("__t").cast("decimal(27,15)")).as("__dcg"))
    val w = Window.partitionBy(col(qidCol))
      .orderBy(col(gradeCol).desc, col(idCol))
    val ideal = judgments
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= k)
      .select(col(qidCol),
        round(gain(col(gradeCol)) / discount(col("__r")), 12).as("__t"))
      .groupBy(col(qidCol))
      .agg(sum(col("__t").cast("decimal(27,15)")).as("__idcg"))
    sys.join(ideal, Seq(qidCol))
      .select(col(qidCol),
        round(col("__dcg").cast("double"), 6).as("dcg"),
        round(col("__idcg").cast("double"), 6).as("idcg"),
        when(col("__idcg") > 0,
          round(col("__dcg").cast("double") /
            col("__idcg").cast("double"), 6)).as("ndcg"))
  }

  /** MRR and MAP@k — the binary-relevance companions to [[ndcgAtK]]:
    * reciprocal rank of the FIRST relevant hit (how fast the list gets
    * to something useful) and average precision (how densely the front
    * of the list is packed with relevant items). An item is relevant
    * when its judged grade ≥ `relMin`; unjudged items count 0, exactly
    * the sampled-pool convention of the nDCG row.
    *
    * AP@k = Σ_{i ≤ k, item_i relevant} P@i / min(R, k), where P@i is
    * precision at rank i over the system list and R is the query's
    * total relevant-pool size — the TREC normalization, so a query
    * whose pool holds fewer than k relevant items can still reach 1.
    *
    * Determinism: the P@i terms are rounded to 12 dp and summed as
    * decimal(27,15) (the exact-sum rule); counts are integers; the
    * per-query window orders by rank, a total order.
    *
    * Scale: the system side is already rank-truncated (≤ k rows per
    * query) so the window and aggregation touch k·|queries| rows; the
    * relevant pool is judgment-sized. Nothing here is corpus-scale.
    *
    * @param ranked system output: (qidCol, idCol, rankCol) — rank 1-based
    * @param judgments relevance pool: (qidCol, idCol, gradeCol ≥ 0);
    *                  one row per (query, item) — like [[ndcgAtK]], a
    *                  duplicated judgment would double-count the item
    * @return (qidCol, hits, first_rel_rank, rr, ap) — rr 0 when nothing
    *         relevant is retrieved; ap NULL when the query's pool has no
    *         relevant items at all (undefined, not zero) */
  def mrrMapAtK(ranked: DataFrame, judgments: DataFrame, qidCol: String,
      idCol: String, rankCol: String, gradeCol: String, k: Int,
      relMin: Int = 1): DataFrame = {
    require(k >= 1, s"mrrMapAtK: k >= 1, got $k")
    val rel = judgments.filter(col(gradeCol) >= relMin)
      .select(col(qidCol), col(idCol))
    val pool = rel.groupBy(col(qidCol)).agg(count(lit(1)).as("__R"))
    val sys = ranked.filter(col(rankCol) <= k)
      .join(rel.withColumn("__rel", lit(1L)), Seq(qidCol, idCol), "left")
      .select(col(qidCol), col(rankCol).cast("long").as("__rk"),
        coalesce(col("__rel"), lit(0L)).as("__rel"))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("__rk"))
    val per = sys.withColumn("__cum", sum(col("__rel")).over(w))
      .groupBy(col(qidCol))
      .agg(sum(col("__rel")).as("hits"),
        min(when(col("__rel") === 1L, col("__rk"))).as("first_rel_rank"),
        sum(when(col("__rel") === 1L,
          round(col("__cum").cast("double") / col("__rk"), 12)
            .cast("decimal(27,15)"))).as("__apsum"))
    per.join(pool, Seq(qidCol), "left")
      .select(col(qidCol), col("hits"), col("first_rel_rank"),
        round(coalesce(lit(1.0) / col("first_rel_rank"), lit(0.0)), 6)
          .as("rr"),
        when(col("__R").isNotNull,
          round(coalesce(col("__apsum"), lit(0L)).cast("double") /
            least(col("__R"), lit(k.toLong)).cast("double"), 6)).as("ap"))
  }

  /** Rank-truncate a scored frame: global top-n by (score desc, id) with
    * an explicit 1-based rank column. The truncation is a
    * TakeOrderedAndProject (scalable — per-partition top-n then a single
    * reduce); the row_number window only ever sees the ≤n survivors, so
    * the classic single-partition-window hazard can't bite. */
  def rankTopN(scored: DataFrame, idCol: String, scoreCol: String,
      n: Int): DataFrame = {
    val top = scored.orderBy(col(scoreCol).desc, col(idCol)).limit(n)
    top.withColumn("rank",
      row_number().over(Window.orderBy(col(scoreCol).desc, col(idCol)))
        .cast("long"))
  }

  /** Reciprocal rank fusion over any number of (id, rank) lists:
    * rrf(d) = Σ_lists 1/(k + rank_list(d)), the standard way to hybridize
    * keyword and vector retrieval without score calibration. Missing
    * entries contribute nothing. Decimal sum for bit-stability; one
    * union + one aggregate, no window. */
  def reciprocalRankFusion(rankings: Seq[DataFrame], idCol: String,
      rankCol: String, k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "reciprocalRankFusion: need >= 1 ranking")
    rankings
      .map(_.select(col(idCol).as("__id"),
        (lit(1.0) / (lit(k.toDouble) + col(rankCol))).as("__c")))
      .reduce(_ unionByName _)
      .groupBy(col("__id"))
      .agg(sum(col("__c").cast("decimal(38,18)")).cast("double").as("rrf"),
        count(lit(1)).cast("long").as("n_lists"))
      .select(col("__id").as(idCol), col("rrf"), col("n_lists"))
  }

  /** Per-document keyword extraction: the k highest-tf·idf terms of each
    * document (df over the FULL corpus, documents to tag selectable by
    * `docFilter`). Each term's score is a single product — tf·ln(N/df) —
    * so no float accumulation exists to destabilize; ranking ties break
    * on the term. Same two-aggregate shape as [[bm25]] (one exploded
    * token shuffle; df derived from the corpus tf aggregate; corpus size
    * broadcast as a 1-row aggregate), with the per-doc top-k as a
    * rank-truncated window (WindowGroupLimit). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int, docFilter: Column = lit(true)): DataFrame = {
    require(k >= 1, s"topTerms: k must be >= 1, got $k")
    val toks = TextFunctions.widen(docs)
      .select(col(idCol).as("__id"), col(textCol).as("__text"),
        docFilter.as("__keep"))
      .select(col("__id"), col("__keep"),
        explode(TextFunctions.tokens(col("__text"))).as("__t"))
    val tfAll = toks.groupBy(col("__id"), col("__t"))
      .agg(count(lit(1)).as("__tf"), first(col("__keep")).as("__keep"))
    val dfreq = tfAll.groupBy(col("__t")).agg(count(lit(1)).as("__df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = tfAll.filter(col("__keep"))
      .join(broadcast(dfreq), Seq("__t"))
      .crossJoin(broadcast(n))
      .select(col("__id"), col("__t"),
        (col("__tf") * log(col("__n").cast("double") / col("__df"))).as("score"))
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("__id"))
        .orderBy(col("score").desc, col("__t"))).cast("long"))
      .filter(col("rank") <= k)
      .select(col("__id").as(idCol), col("rank"), col("__t").as("term"),
        col("score"))
  }

  /** Vocabulary coverage curve — the tokenizer-budget question "what
    * share of token OCCURRENCES does a top-k vocabulary cover?",
    * answered at each requested k: rank terms by (count desc, term) and
    * report the cumulative occurrence share at rank k. The cut points
    * are well-defined under count ties (any order within a tie group
    * yields the same cumulative sum at every rank), so the curve is
    * deterministic even where the ranking itself is arbitrary.
    *
    * Scale shape: one term-count aggregate (map-side combined, vocab-
    * sized output), then the cumulative sum and the rank both ride
    * [[Curation.exclusivePrefixSum]]'s bucketed two-phase scan — a 100 TB
    * corpus's vocabulary (typos, numbers, URLs make it corpus-sized in
    * the tail) never lands in one window partition.
    *
    * @return (k, cum_tokens, coverage) — one row per requested k that is
    *         ≤ the vocabulary size */
  def vocabCoverageCurve(docs: DataFrame, idCol: String, textCol: String,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1),
      s"vocabCoverageCurve: ks must be >= 1, got $ks")
    // each exclusivePrefixSum call makes TWO eager passes over its input
    // (bucket boundaries + bucket totals) before the lazy windowed pass —
    // chained twice plus the total aggregate, the lazy census was
    // re-tokenizing the corpus ~6× (r17). The census and the first scan
    // are vocabulary-sized: materialize both once.
    val counts = TextFunctions.widen(docs)
      .select(explode(TextFunctions.tokens(col(textCol))).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
      // descending count = ascending negated count for the prefix scan
      .select(col("__t"), col("__c"), (-col("__c")).as("__nc"),
        lit(1L).as("__one"))
      .localCheckpoint()
    val withCum = graft.ops.Curation.exclusivePrefixSum(
      counts, "__nc", "__t", "__c", "__cumBefore").localCheckpoint()
    val withRank = graft.ops.Curation.exclusivePrefixSum(
      withCum, "__nc", "__t", "__one", "__rankBefore")
    val total = counts.agg(sum(col("__c")).as("__tot"))
    withRank
      .filter((col("__rankBefore") + 1).isInCollection(ks.map(_.toLong)))
      .crossJoin(broadcast(total))
      .select((col("__rankBefore") + 1).as("k"),
        (col("__cumBefore") + col("__c")).as("cum_tokens"),
        ((col("__cumBefore") + col("__c")).cast("double") / col("__tot"))
          .as("coverage"))
  }

  /** Deterministic negative sampling for contrastive pairs: for each
    * query id, the k corpus ids with the smallest salted hash
    * md5(salt:qid:cand) — uniform, reproducible, and join-free to audit
    * (membership depends only on ids and the salt, so regenerating over
    * a grown corpus never silently reshuffles old pairs; compare
    * [[Curation.hashBucket]]). The per-query rank-truncated window is the
    * [[Similarity.bruteForceTopK]] shape: queries broadcast, corpus
    * streams, survivors shuffle once keyed on the query id. */
  def negativeSample(corpus: DataFrame, idCol: String,
      queryIds: DataFrame, qidCol: String, k: Int,
      salt: String = "neg"): DataFrame = {
    val cands = TextFunctions.widen(corpus).select(col(idCol).as("__cand"))
      .crossJoin(broadcast(queryIds.select(col(qidCol).as("__qid"))))
      .filter(col("__cand") =!= col("__qid"))
      .withColumn("__h", md5(concat(lit(salt + ":"),
        col("__qid").cast("string"), lit(":"),
        col("__cand").cast("string")).cast("binary")))
    cands
      .withColumn("neg_rank",
        row_number().over(Window.partitionBy(col("__qid"))
          .orderBy(col("__h"), col("__cand"))).cast("long"))
      .filter(col("neg_rank") <= k)
      .select(col("__qid").as(qidCol), col("neg_rank"),
        col("__cand").as("neg_id"), col("__h").as("neg_key"))
  }
}
