package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Similarity, TextRanking}

/** Gate coverage for the retrieval/ranking family: BM25 keyword scoring,
  * hybrid keyword+vector reciprocal rank fusion, and deterministic
  * negative sampling. Every float reduction on both sides is a decimal
  * sum and every ordering carries an id tie-break, so the DuckDB oracle
  * hash-matches bit-for-bit.
  */
object RetrievalQueries {

  /** The fixed keyword query for the BM25 gates: one rare term ("dup"
    * appears only in the planted duplicate docs — high idf) and two
    * common ones, so the score actually discriminates. */
  private val Terms = Seq("dup", "vector", "spark")
  private val TermsSql = Terms.map(t => s"'$t'").mkString("[", ",", "]")

  /** Top-20 documents by BM25 for a 3-term keyword query. */
  def q101Bm25(s: SparkSession, d: String): DataFrame =
    TextRanking.bm25(Tables.documents(s, d), "doc_id", "text", Terms)
      .select(col("doc_id"), round(col("score"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(20)

  val q101Sql: String =
    s"""WITH scored AS (${TextRanking.bm25Sql(TermsSql)})
       |SELECT id AS doc_id, round(score, 6) AS bm25
       |FROM scored ORDER BY bm25 DESC, id LIMIT 20""".stripMargin

  /** Same left-fold cosine text as q40's oracle, pinned to query vector 0. */
  private val cosExpr =
    """list_reduce(list_transform(range(1, len(q.embedding)+1),
      |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), (a,x) -> a+x)
      |    / (sqrt(list_reduce(list_transform(range(1, len(q.embedding)+1),
      |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)), (a,x) -> a+x))
      |     * sqrt(list_reduce(list_transform(range(1, len(e.embedding)+1),
      |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), (a,x) -> a+x)))""".stripMargin

  /** Hybrid search: BM25 top-50 fused with cosine top-50 (query vector
    * vec_id=0, ids shared between `documents` and `embeddings`) via
    * reciprocal rank fusion; top-20 by fused score. */
  def q102HybridRrf(s: SparkSession, d: String): DataFrame = {
    val kw = TextRanking.rankTopN(
      TextRanking.bm25(Tables.documents(s, d), "doc_id", "text", Terms)
        .select(col("doc_id").as("id"), round(col("score"), 6).as("score")),
      "id", "score", 50)
      .select(col("id"), col("rank"))
    val emb = Tables.embeddings(s, d)
    val sem = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qvec")),
        "qid", "qvec", k = 50)
      .select(col("vec_id").as("id"), col("rank").cast("long").as("rank"))
    TextRanking.reciprocalRankFusion(Seq(kw, sem), "id", "rank")
      .select(col("id"), round(col("rrf"), 9).as("rrf"), col("n_lists"))
      .orderBy(col("rrf").desc, col("id")).limit(20)
  }

  val q102Sql: String =
    s"""WITH bm AS (${TextRanking.bm25Sql(TermsSql)}),
       |kw AS (
       |  SELECT id, CAST(row_number() OVER (ORDER BY round(score, 6) DESC, id) AS BIGINT) AS rank
       |  FROM bm QUALIFY rank <= 50),
       |sem0 AS (
       |  SELECT e.vec_id AS id, round($cosExpr, 6) AS score
       |  FROM embeddings q JOIN embeddings e ON q.vec_id = 0 AND e.vec_id <> 0),
       |sem AS (
       |  SELECT id, CAST(row_number() OVER (ORDER BY score DESC, id) AS BIGINT) AS rank
       |  FROM sem0 QUALIFY rank <= 50),
       |u AS (
       |  SELECT id, 1.0 / (60.0 + rank) AS c FROM kw
       |  UNION ALL
       |  SELECT id, 1.0 / (60.0 + rank) AS c FROM sem)
       |SELECT id, round(CAST(sum(CAST(c AS DECIMAL(38,18))) AS DOUBLE), 9) AS rrf,
       |  count(*) AS n_lists
       |FROM u GROUP BY id ORDER BY rrf DESC, id LIMIT 20""".stripMargin

  /** Keyword extraction: top-3 tf·idf terms per sampled document, df over
    * the full corpus ([[TextRanking.topTerms]]) — the topic-tagging
    * primitive of a curation pipeline. */
  def q113Keywords(s: SparkSession, d: String): DataFrame =
    TextRanking.topTerms(Tables.documents(s, d), "doc_id", "text", k = 3,
        docFilter = col("doc_id") % 25 === 0)
      .select(col("doc_id"), col("rank"), col("term"),
        round(col("score"), 6).as("score"))
      .orderBy(col("doc_id"), col("rank"))

  val q113Sql: String =
    """WITH toks AS (
      |  SELECT id, t FROM (
      |    SELECT doc_id AS id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
      |    FROM documents)),
      |tf AS (SELECT id, t, count(*) AS tf FROM toks GROUP BY id, t),
      |dfreq AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
      |n AS (SELECT count(*) AS n FROM documents),
      |scored AS (
      |  SELECT id, t, tf * ln(CAST(n AS DOUBLE) / df) AS score
      |  FROM tf JOIN dfreq USING (t) CROSS JOIN n
      |  WHERE id % 25 = 0)
      |SELECT id AS doc_id,
      |  CAST(row_number() OVER (PARTITION BY id ORDER BY score DESC, t) AS BIGINT) AS rank,
      |  t AS term, round(score, 6) AS score
      |FROM scored QUALIFY rank <= 3 ORDER BY doc_id, rank""".stripMargin

  /** Deterministic negative sampling: 5 hash-chosen negatives for each of
    * the first 5 docs (contrastive-pair mining, reproducible run-to-run). */
  def q106NegativeSample(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    TextRanking.negativeSample(docs, "doc_id",
        docs.filter(col("doc_id") < 5).select(col("doc_id").as("qid")),
        "qid", k = 5)
      .orderBy(col("qid"), col("neg_rank"))
  }

  val q106Sql: String =
    """WITH q AS (SELECT doc_id AS qid FROM documents WHERE doc_id < 5),
      |c AS (
      |  SELECT qid, doc_id AS cand,
      |    md5('neg:' || CAST(qid AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS h
      |  FROM documents CROSS JOIN q WHERE doc_id <> qid)
      |SELECT qid,
      |  CAST(row_number() OVER (PARTITION BY qid ORDER BY h, cand) AS BIGINT) AS neg_rank,
      |  cand AS neg_id, h AS neg_key
      |FROM c QUALIFY neg_rank <= 5 ORDER BY qid, neg_rank""".stripMargin

  /** nDCG@10 of the brute-force cosine ranking
    * ([[TextRanking.ndcgAtK]]) against an md5-derived graded judgment
    * pool (every 3rd vector judged, grades 0–3 — the q127 determinism
    * device standing in for human annotations): per-query DCG, ideal
    * DCG, and nDCG all hash-pinned — the ranking-quality harness next to
    * the recall audits (q170/q171). Unjudged retrieved items count 0,
    * judged-but-missed items shape the ideal — both realities of a
    * sampled judgment pool are exercised. */
  /** Shared eval harness for q176/q185: the brute-force cosine top-10
    * ranking for queries 100–102, and the md5-derived graded judgment
    * pool (every 3rd vector judged, grades 0–3 — the q127 determinism
    * device standing in for human annotations). */
  private def cosineRankedAndJudged(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") >= 100 && col("vec_id") < 103)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val ranked = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 10)
      .select(col("qid"), col("vec_id"), col("rank").cast("long").as("rank"))
    val judgments = emb.filter(col("vec_id") % 3 === 0)
      .select(col("vec_id")).crossJoin(queries.select(col("qid")))
      .select(col("qid"), col("vec_id"),
        pmod(conv(substring(md5(concat(lit("rel:"),
          col("qid").cast("string"), lit(":"),
          col("vec_id").cast("string"))), 1, 2), 16, 10).cast("long"),
          lit(4L)).as("grade"))
    (ranked, judgments)
  }

  def q176Ndcg(s: SparkSession, d: String): DataFrame = {
    val (ranked, judgments) = cosineRankedAndJudged(s, d)
    TextRanking.ndcgAtK(ranked, judgments, "qid", "vec_id", "rank",
        "grade", k = 10)
      .orderBy(col("qid"))
  }

  /** MRR + MAP@10 ([[TextRanking.mrrMapAtK]]) of the same ranking
    * against the same judgment pool as q176, with relevant = grade ≥ 2
    * — the binary-relevance metrics reported beside nDCG on every
    * retrieval eval sheet: time-to-first-hit and front-of-list
    * precision density, each per-query value hash-pinned. */
  def q185MrrMap(s: SparkSession, d: String): DataFrame = {
    val (ranked, judgments) = cosineRankedAndJudged(s, d)
    TextRanking.mrrMapAtK(ranked, judgments, "qid", "vec_id", "rank",
        "grade", k = 10, relMin = 2)
      .orderBy(col("qid"))
  }

  /** DuckDB twin of [[cosineRankedAndJudged]]: the `ranked` + `jd` CTE
    * chain shared by the q176 and q185 oracles. */
  private val rankedJdSql: String = {
    val cos =
      """list_reduce(list_transform(range(1, len(q.embedding)+1),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), (a,x) -> a+x)
        |    / (sqrt(list_reduce(list_transform(range(1, len(q.embedding)+1),
        |      i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)), (a,x) -> a+x))
        |     * sqrt(list_reduce(list_transform(range(1, len(e.embedding)+1),
        |      i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)), (a,x) -> a+x)))""".stripMargin
    s"""ranked AS (
       |  SELECT qid, vec_id, rank FROM (
       |    SELECT q.vec_id AS qid, e.vec_id,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY round($cos, 6) DESC, e.vec_id) AS rank
       |    FROM embeddings q JOIN embeddings e
       |      ON q.vec_id >= 100 AND q.vec_id < 103 AND e.vec_id <> q.vec_id)
       |  WHERE rank <= 10),
       |jd AS (
       |  SELECT q.vec_id AS qid, e.vec_id,
       |    CAST('0x' || substr(md5('rel:' || CAST(q.vec_id AS VARCHAR) || ':' ||
       |      CAST(e.vec_id AS VARCHAR)), 1, 2) AS BIGINT) % 4 AS grade
       |  FROM (SELECT vec_id FROM embeddings WHERE vec_id % 3 = 0) e
       |  CROSS JOIN (SELECT vec_id FROM embeddings
       |    WHERE vec_id >= 100 AND vec_id < 103) q)""".stripMargin
  }

  val q176Sql: String = {
    s"""WITH $rankedJdSql,
       |sys AS (
       |  SELECT r.qid,
       |    sum(CAST(round((power(2, coalesce(jd.grade, 0)) - 1.0) /
       |      (ln(r.rank + 1.0) / ln(2.0)), 12) AS DECIMAL(27,15))) AS dcg
       |  FROM ranked r LEFT JOIN jd ON r.qid = jd.qid AND r.vec_id = jd.vec_id
       |  GROUP BY r.qid),
       |ideal AS (
       |  SELECT qid,
       |    sum(CAST(round((power(2, grade) - 1.0) /
       |      (ln(r + 1.0) / ln(2.0)), 12) AS DECIMAL(27,15))) AS idcg
       |  FROM (
       |    SELECT qid, grade,
       |      row_number() OVER (PARTITION BY qid
       |        ORDER BY grade DESC, vec_id) AS r
       |    FROM jd)
       |  WHERE r <= 10 GROUP BY qid)
       |SELECT sys.qid, round(CAST(dcg AS DOUBLE), 6) AS dcg,
       |  round(CAST(idcg AS DOUBLE), 6) AS idcg,
       |  CASE WHEN idcg > 0
       |    THEN round(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6) END AS ndcg
       |FROM sys JOIN ideal USING (qid) ORDER BY qid""".stripMargin
  }

  val q185Sql: String =
    s"""WITH $rankedJdSql,
       |rel AS (SELECT qid, vec_id FROM jd WHERE grade >= 2),
       |pool AS (SELECT qid, CAST(count(*) AS BIGINT) AS R FROM rel GROUP BY 1),
       |sys AS (
       |  SELECT r.qid, r.rank AS rk,
       |    CASE WHEN rel.vec_id IS NOT NULL THEN 1 ELSE 0 END AS is_rel
       |  FROM ranked r LEFT JOIN rel
       |    ON r.qid = rel.qid AND r.vec_id = rel.vec_id),
       |cum AS (
       |  SELECT qid, rk, is_rel,
       |    sum(is_rel) OVER (PARTITION BY qid ORDER BY rk) AS c
       |  FROM sys),
       |per AS (
       |  SELECT qid, CAST(sum(is_rel) AS BIGINT) AS hits,
       |    min(CASE WHEN is_rel = 1 THEN rk END) AS first_rel_rank,
       |    sum(CASE WHEN is_rel = 1
       |      THEN CAST(round(CAST(c AS DOUBLE) / rk, 12) AS DECIMAL(27,15))
       |      END) AS apsum
       |  FROM cum GROUP BY 1)
       |SELECT per.qid, hits, first_rel_rank,
       |  round(coalesce(CAST(1.0 AS DOUBLE) / first_rel_rank,
       |    CAST(0.0 AS DOUBLE)), 6) AS rr,
       |  CASE WHEN pool.R IS NOT NULL
       |    THEN round(CAST(coalesce(apsum, 0) AS DOUBLE) /
       |      CAST(least(pool.R, 10) AS DOUBLE), 6) END AS ap
       |FROM per LEFT JOIN pool USING (qid) ORDER BY per.qid""".stripMargin

  /** Run-scoped root for persisted text indexes — the
    * [[SimilarityQueries]] ANN device, one dir per (sf basename, name). */
  private def textIndexLocation(d: String, name: String): String =
    s"${sys.props("java.io.tmpdir")}/graft-text-index/" +
      s"${new java.io.File(d).getName}/$name"

  /** q209: q101's BM25 run over a PERSISTED, CATALOG-REGISTERED inverted
    * index — the build-once/search-many split for full text, completing
    * the reference's index-type family next to the vector lifecycle
    * (q197/q198). [[graft.ops.TextIndex.ensureInverted]] materializes
    * (term, doc, tf, dl) postings PARTITIONED BY term-hash bucket (the
    * query's terms name their buckets before the scan — static pruning,
    * the cid device), and the search reads probed buckets + stats rows
    * only: the corpus is never re-tokenized. Hash-gated against q101's
    * oracle: persisted ≡ in-query, bit for bit. */
  def q209PersistedBm25(s: SparkSession, d: String): DataFrame = {
    val loc = textIndexLocation(d, "inverted")
    graft.ops.TextIndex.ensureInverted(Tables.documents(s, d),
      "doc_id", "text", loc, s"$d/documents.parquet")
    CatalogQueries.ensureCatalog(s)
    graft.ops.AnnIndex.registerIndexTable(s, "graft.tpch.docs_fts_idx", loc)
    val resolved =
      graft.ops.AnnIndex.resolveIndexLocation(s, "graft.tpch.docs_fts_idx")
    graft.ops.TextIndex.searchBm25(s, resolved, Terms)
      .select(col("doc_id"), round(col("score"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(20)
  }

  /** q210: the inverted index's INCREMENTAL-INGEST path — build on the
    * even half (`partial:` fingerprint), append the odd half, search.
    * tf/dl are per-doc, df/stats are derived at search time from the
    * combined postings and stats DELTAS, so build+append must be
    * indistinguishable from one-shot: q101's oracle, hash-checked. */
  def q210Bm25Append(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val loc = textIndexLocation(d, "inverted-append")
    val src = s"$d/documents.parquet"
    val fpFull = graft.ops.AnnIndex.sourceFingerprint(src)
    if (!graft.ops.AnnIndex.readManifest(loc)
        .exists(m => m.indexType == "inverted" && m.metric == "bm25pos" &&
          m.fingerprint == fpFull)) {
      graft.ops.TextIndex.ensureInverted(docs.filter(col("doc_id") % 2 === 0),
        "doc_id", "text", loc, src,
        fingerprintOverride = Some(s"partial:$fpFull"))
      graft.ops.TextIndex.appendInverted(docs.filter(col("doc_id") % 2 === 1),
        "doc_id", "text", loc, newFingerprint = fpFull)
    }
    graft.ops.TextIndex.searchBm25(s, loc, Terms)
      .select(col("doc_id"), round(col("score"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(20)
  }

  /** q211: DELETE from the inverted index — tombstone every doc_id ≡ 3
    * (mod 7), search. BM25 makes delete ≡ filter STRICTER than the
    * vector twin (q204): idf and avgdl are corpus statistics, so the
    * tombstones must subtract their length mass from the stats, not just
    * drop result rows — the oracle recomputes BM25 over the filtered
    * corpus and the hash pins both effects. */
  def q211Bm25Delete(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val loc = textIndexLocation(d, "inverted-delete")
    val built = graft.ops.TextIndex.ensureInverted(docs,
      "doc_id", "text", loc, s"$d/documents.parquet")
    if (built || !graft.ops.TextIndex.hasTombstones(loc))
      graft.ops.TextIndex.deleteDocs(
        docs.filter(col("doc_id") % 7 === 3), "doc_id", loc)
    graft.ops.TextIndex.searchBm25(s, loc, Terms)
      .select(col("doc_id"), round(col("score"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(20)
  }

  /** q212: FILTERED full-text search — BM25 top-20 among English docs
    * only (`lang = 'en'`, ~40%). The predicate evaluates on the base
    * table; [[graft.ops.TextIndex.searchBm25Filtered]] pushes the
    * allowed-id semi-join beneath the scoring aggregate while df and
    * (n, sum_dl) stay CORPUS-GLOBAL — a search-time filter restricts the
    * result set, it does not redefine the corpus (that is q211's delete
    * semantics, and the two gates pin the two sides of that line). The
    * oracle scores the FULL corpus and filters after ranking inputs are
    * fixed: every surviving doc's score must be exactly what the
    * unfiltered search gives it. */
  def q212FilteredBm25(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val loc = textIndexLocation(d, "inverted")
    graft.ops.TextIndex.ensureInverted(docs,
      "doc_id", "text", loc, s"$d/documents.parquet")
    graft.ops.TextIndex.searchBm25Filtered(s, loc,
      docs.filter(col("lang") === "en").select(col("doc_id")), "doc_id",
      Terms)
      .select(col("doc_id"), round(col("score"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).limit(20)
  }

  val q212Sql: String =
    s"""WITH scored AS (${TextRanking.bm25Sql(TermsSql)})
       |SELECT id AS doc_id, round(score, 6) AS bm25
       |FROM scored
       |WHERE id IN (SELECT doc_id FROM documents WHERE lang = 'en')
       |ORDER BY bm25 DESC, id LIMIT 20""".stripMargin

  /** q221: PHRASE search over the persisted index's POSITIONAL postings —
    * documents containing the exact consecutive sequence "fast sort",
    * with occurrence counts. Positions ride the posting rows (BM25
    * searches never read the column — parquet prunes it), the read is
    * bucket-pruned to the phrase terms, and matching is an intersection
    * of shift-adjusted position arrays. The oracle is a positional scan
    * of the raw text: adjacency in the token stream, counted. */
  def q221PhraseSearch(s: SparkSession, d: String): DataFrame = {
    val loc = textIndexLocation(d, "inverted")
    graft.ops.TextIndex.ensureInverted(Tables.documents(s, d),
      "doc_id", "text", loc, s"$d/documents.parquet")
    graft.ops.TextIndex.searchPhrase(s, loc, Seq("fast", "sort"))
      .orderBy(col("doc_id"))
  }

  private def phraseSql(docsWhere: String): String =
    s"""WITH toks AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS tk
       |  FROM documents$docsWhere),
       |hits AS (
       |  SELECT doc_id, count(*) AS n_hits
       |  FROM toks, UNNEST(range(1, len(tk))) AS r(i)
       |  WHERE tk[i] = 'fast' AND tk[i + 1] = 'sort'
       |  GROUP BY doc_id)
       |SELECT doc_id, n_hits FROM hits ORDER BY doc_id""".stripMargin

  /** q238: q221's phrase search reached through PURE SQL — the
    * `graft_phrase` TVF: the SQL user names the index and the phrase
    * text, and gets the identical shift-and-intersect positional plan
    * the Scala API builds. Hash-gated against the positional-scan
    * oracle — SQL ≡ API ≡ a scan of the text. */
  def q238SqlPhrase(s: SparkSession, d: String): DataFrame = {
    val loc = textIndexLocation(d, "inverted")
    graft.ops.TextIndex.ensureInverted(Tables.documents(s, d),
      "doc_id", "text", loc, s"$d/documents.parquet")
    s.sql(
      s"""SELECT doc_id, n_hits FROM graft_phrase('$loc', 'fast sort')
         |ORDER BY doc_id""".stripMargin)
  }

  /** q222: phrase search composed with the DELETE lifecycle — tombstone
    * every doc_id ≡ 1 (mod 5), then phrase-search: the per-term posting
    * frames are the live view, so a deleted doc can never match even
    * when its positions are still physically present. The oracle scans
    * the filtered corpus. */
  def q222PhraseDelete(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val loc = textIndexLocation(d, "inverted-phrase-del")
    val built = graft.ops.TextIndex.ensureInverted(docs,
      "doc_id", "text", loc, s"$d/documents.parquet")
    if (built || !graft.ops.TextIndex.hasTombstones(loc))
      graft.ops.TextIndex.deleteDocs(
        docs.filter(col("doc_id") % 5 === 1), "doc_id", loc)
    graft.ops.TextIndex.searchPhrase(s, loc, Seq("fast", "sort"))
      .orderBy(col("doc_id"))
  }

  private def bm25TopSql(where: String): String =
    s"""WITH scored AS (${TextRanking.bm25Sql(TermsSql, where = where)})
       |SELECT id AS doc_id, round(score, 6) AS bm25
       |FROM scored ORDER BY bm25 DESC, id LIMIT 20""".stripMargin

  /** q232: q209's search reached through PURE SQL — the `graft_bm25`
    * table-valued function ([[graft.functions.GraftExtensions]]): a SQL
    * user addresses the index by its catalog capability-pointer table
    * and gets the IDENTICAL bucket-pruned plan the Scala API builds (the
    * TVF splices that plan at analysis time). Hash-gated against q101's
    * oracle — SQL ≡ API ≡ in-query, bit for bit. */
  def q232SqlBm25(s: SparkSession, d: String): DataFrame = {
    val loc = textIndexLocation(d, "inverted")
    graft.ops.TextIndex.ensureInverted(Tables.documents(s, d),
      "doc_id", "text", loc, s"$d/documents.parquet")
    CatalogQueries.ensureCatalog(s)
    graft.ops.AnnIndex.registerIndexTable(s, "graft.tpch.docs_fts_idx", loc)
    s.sql(
      s"""SELECT doc_id, round(score, 6) AS bm25
         |FROM graft_bm25('graft.tpch.docs_fts_idx', '${Terms.mkString(" ")}')
         |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q232_sql_bm25" -> (q232SqlBm25 _),
    "q238_sql_phrase" -> (q238SqlPhrase _),
    "q209_persisted_bm25" -> (q209PersistedBm25 _),
    "q210_bm25_append" -> (q210Bm25Append _),
    "q211_bm25_delete" -> (q211Bm25Delete _),
    "q212_filtered_bm25" -> (q212FilteredBm25 _),
    "q221_phrase_search" -> (q221PhraseSearch _),
    "q222_phrase_delete" -> (q222PhraseDelete _),
    "q101_bm25" -> (q101Bm25 _),
    "q102_hybrid_rrf" -> (q102HybridRrf _),
    "q106_negative_sample" -> (q106NegativeSample _),
    "q176_ndcg" -> (q176Ndcg _),
    "q185_mrr_map" -> (q185MrrMap _),
    "q113_keywords" -> (q113Keywords _))

  val oracles: Map[String, String] = Map(
    // persisted-FTS searches replay q101's oracle (persisted ≡ in-query);
    // the delete gate pins delete ≡ filter INCLUDING the corpus-stats
    // effect on idf/avgdl — the oracle recomputes over the filtered docs
    // the SQL TVF surface must be invisible in results: q101's oracle
    "q232_sql_bm25" -> q101Sql,
    "q209_persisted_bm25" -> q101Sql,
    "q210_bm25_append" -> q101Sql,
    "q211_bm25_delete" -> bm25TopSql(" WHERE doc_id % 7 <> 3"),
    "q212_filtered_bm25" -> q212Sql,
    // phrase gates: a positional scan of the raw (resp. delete-filtered)
    // text is the oracle — the index is an access path, never a semantic
    "q221_phrase_search" -> phraseSql(""),
    "q222_phrase_delete" -> phraseSql(" WHERE doc_id % 5 <> 1"),
    // the SQL TVF twin of q221: same positional-scan oracle
    "q238_sql_phrase" -> phraseSql(""),
    "q101_bm25" -> q101Sql,
    "q102_hybrid_rrf" -> q102Sql,
    "q106_negative_sample" -> q106Sql,
    "q176_ndcg" -> q176Sql,
    "q185_mrr_map" -> q185Sql,
    "q113_keywords" -> q113Sql)
}
