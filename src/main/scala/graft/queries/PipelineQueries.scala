package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextFunctions

/** Capstone: the full curation pipeline the extension operators exist for —
  * quality-score → language-gate → exact-dedup → corpus accounting — as ONE
  * composed DataFrame plan (each stage narrow or single-shuffle), oracled
  * end-to-end in SQL. A 100 TB curation run is exactly this plan with more
  * input files. */
object PipelineQueries {

  def q80CurationPipeline(s: SparkSession, d: String): DataFrame = {
    // injected duplicates prove the dedup stage does real work
    val docs = Tables.documents(s, d)
    val corpus = docs.unionByName(
      docs.filter(col("doc_id") % 11 === 0)
        .withColumn("doc_id", col("doc_id") + 5000000L))

    // the gate thresholds on the RAW score (bit-identical across engines);
    // the rounded form is display-only — see qualityScoreRaw's contract
    val scored = TextFunctions.widen(corpus).select(
      col("doc_id"), col("source"),
      TextFunctions.qualityScore(col("text")).as("quality"),
      TextFunctions.qualityScoreRaw(col("text")).as("__qraw"),
      TextFunctions.langId(col("text")).as("pred_lang"),
      TextFunctions.fingerprint(col("text")).as("__fp"))
    val gated = scored
      .filter(col("__qraw") >= 0.5 && col("pred_lang") === "en")
    // dedup as min-id-per-fingerprint window over the already-scored rows:
    // text is dropped BEFORE the shuffle (only (id, source, quality, fp)
    // moves) and the expensive score/langid pass runs exactly once —
    // Dedup.exactDedup's semi-join form would recompute the scored subtree
    // on the join-back side
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__fp")).orderBy(col("doc_id"))
    val deduped = gated
      .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
    deduped.groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        round(avg(col("quality")), 6).as("avg_quality"))
      .orderBy(col("source"))
  }

  val q80Sql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, source, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 5000000, source, text FROM documents WHERE doc_id % 11 = 0
       |), scored AS (
       |  SELECT doc_id, source, text,
       |    ${graft.ops.TextFunctions.qualitySql} AS quality,
       |    (${graft.ops.TextFunctions.qualityRawSql}) AS qraw,
       |    ${graft.ops.TextFunctions.langIdSql} AS pred_lang
       |  FROM corpus
       |), gated AS (
       |  SELECT *, md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
       |  FROM scored WHERE qraw >= 0.5 AND pred_lang = 'en'
       |), keep AS (SELECT fp, min(doc_id) AS doc_id FROM gated GROUP BY fp)
       |SELECT source, count(*) AS n_kept, round(avg(quality), 6) AS avg_quality
       |FROM gated JOIN keep USING (fp, doc_id)
       |GROUP BY source ORDER BY source""".stripMargin

  /** Retrieval capstone: BM25-rank the corpus for a keyword query, then
    * DIVERSIFY the top-50 — drop any result whose text is a 3-gram-
    * Jaccard near-duplicate (≥ 0.5) of a higher-ranked result — and
    * return the survivors among the top 50. The suppression rule is the
    * non-chained one (any higher-ranked near-dup suppresses) so it is a
    * pure anti-join, deterministic and oracle-replayable; serving stacks
    * use exactly this shape to de-redundify retrieval shortlists. The
    * near-dup verify runs only within the 50-row shortlist: at any
    * corpus scale the quadratic stage is capped at shortlist². */
  def q114DiversifiedSearch(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // planted duplicates ensure the suppression stage does real work
    val corpus = docs.unionByName(
      docs.filter(col("doc_id") % 50 === 0)
        .withColumn("doc_id", col("doc_id") + 7000000L))
    // the 50-row shortlist is referenced four times downstream (text
    // join, both suppression sides, final anti-join) — materialize it
    // once or the whole BM25 subtree re-executes per reference
    val ranked = graft.ops.TextRanking.rankTopN(
      graft.ops.TextRanking.bm25(corpus, "doc_id", "text",
          Seq("dup", "vector", "spark"))
        .select(col("doc_id").as("id"), round(col("score"), 6).as("score")),
      "id", "score", 50).localCheckpoint()
    val shortlist = ranked
      .join(corpus.select(col("doc_id").as("id"), col("text")), Seq("id"))
    val pairs = graft.ops.Dedup.ngramJaccardPairs(
        shortlist.select(col("id"), col("text")), "id", "text",
        k = 3, threshold = 0.5)
    val suppressed = pairs
      .join(ranked.select(col("id").as("doc_a"), col("rank").as("__ra")), Seq("doc_a"))
      .join(ranked.select(col("id").as("doc_b"), col("rank").as("__rb")), Seq("doc_b"))
      .select(when(col("__ra") < col("__rb"), col("doc_b"))
        .otherwise(col("doc_a")).as("id")).distinct()
    ranked.join(suppressed, Seq("id"), "left_anti")
      .select(col("rank"), col("id"), col("score"))
      .orderBy(col("rank"))
  }

  val q114Sql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 7000000, text FROM documents WHERE doc_id % 50 = 0
       |), bm AS (${graft.ops.TextRanking.bm25Sql("['dup','vector','spark']")
            .replace("FROM documents", "FROM corpus")}
       |), ranked AS (
       |  SELECT id, round(score, 6) AS score,
       |    CAST(row_number() OVER (ORDER BY round(score, 6) DESC, id) AS BIGINT) AS rank
       |  FROM bm QUALIFY rank <= 50
       |), tok AS (
       |  SELECT r.id, regexp_split_to_array(lower(trim(c.text)), '\\s+') AS toks
       |  FROM corpus c JOIN ranked r ON c.doc_id = r.id
       |), sh AS (
       |  SELECT id, CASE WHEN len(toks) >= 3
       |    THEN list_distinct(list_transform(range(1, greatest(len(toks)-2,1)+1),
       |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
       |    ELSE [array_to_string(toks, ' ')] END AS shingles
       |  FROM tok
       |), sup AS (
       |  SELECT DISTINCT CASE WHEN ra.rank < rb.rank THEN b.id ELSE a.id END AS id
       |  FROM sh a JOIN sh b ON a.id < b.id
       |  JOIN ranked ra ON ra.id = a.id JOIN ranked rb ON rb.id = b.id
       |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
       |    / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.5)
       |SELECT rank, id, score FROM ranked
       |WHERE id NOT IN (SELECT id FROM sup)
       |ORDER BY rank""".stripMargin

  /** Training-priority scoreboard capstone: rank the corpus for training
    * by information content × novelty — entropy-degenerate text scores
    * low, and every 9th doc's planted verbatim clone gets novelty 0
    * (its grams' first occurrence is the original), so clones are
    * designed out of the top-k without a separate dedup pass. One
    * composed plan: per-row char-entropy fold (zero shuffle) ⋈ the
    * k-gram-novelty census (gram-keyed min) → priority product →
    * TakeOrdered top-100 (never a global window over the corpus). The
    * oracle replays every stage, so the fold, the census, the rounding
    * ladder, and the (priority desc, id) tie order are all pinned. */
  def q137Scoreboard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val corpus = docs.unionByName(
      docs.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 4000000L).as("doc_id"), col("text")))
    val novelty = graft.ops.Dedup.kgramNovelty(corpus, "doc_id", "text", 3)
      .select(col("doc_id"), col("novelty"))
    val quality = TextFunctions.widen(corpus)
      .select(col("doc_id"),
        round(TextFunctions.charEntropy(col("text")), 6).as("entropy"))
    val scored = quality.join(novelty, Seq("doc_id"))
      .withColumn("priority", round(col("entropy") * col("novelty"), 6))
    graft.ops.TextRanking.rankTopN(scored, "doc_id", "priority", 100)
      .select(col("rank"), col("doc_id"), col("priority"),
        col("entropy"), col("novelty"))
      .orderBy(col("rank"))
  }

  val q137Sql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 4000000, text FROM documents WHERE doc_id % 9 = 0
      |), tok AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM corpus
      |), sh AS (
      |  SELECT doc_id, CASE WHEN len(toks) >= 3
      |    THEN list_distinct(list_transform(range(1, greatest(len(toks)-2,1)+1),
      |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
      |    ELSE [array_to_string(toks, ' ')] END AS shingles
      |  FROM tok
      |), r AS (SELECT doc_id, unnest(shingles) AS g FROM sh
      |), f AS (SELECT g, min(doc_id) AS first_doc FROM r GROUP BY 1
      |), nov AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
      |      / count(*) AS novelty
      |  FROM r JOIN f USING (g) GROUP BY doc_id
      |), ch AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS c FROM corpus
      |), cc AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY doc_id, c
      |), n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ch GROUP BY doc_id
      |), ent AS (
      |  SELECT doc_id, round(CAST(sum(CAST(
      |    (CAST(cnt AS DOUBLE)/n) * ln(CAST(cnt AS DOUBLE)/n) * -1.0
      |    AS DECIMAL(27,15))) AS DOUBLE), 6) AS entropy
      |  FROM cc JOIN n USING (doc_id) GROUP BY doc_id
      |), scored AS (
      |  SELECT doc_id, entropy, novelty, round(entropy * novelty, 6) AS priority
      |  FROM ent JOIN nov USING (doc_id))
      |SELECT CAST(row_number() OVER (ORDER BY priority DESC, doc_id) AS BIGINT) AS rank,
      |  doc_id, priority, entropy, novelty
      |FROM scored ORDER BY priority DESC, doc_id LIMIT 100""".stripMargin

  /** Corpus card (q159): the one-row dataset summary a curation run
    * publishes with every drop — volume, lexicon, duplication, and
    * source/language balance, each a signal another gate query audits in
    * depth. Everything is exact-integer or decimal-pinned (the language
    * entropy terms follow the q134 device), so the whole card
    * hash-matches. One exploded token count + small aggregates; the
    * token census is the only corpus-scale pass. */
  def q159CorpusCard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val volume = graft.ops.TextFunctions.widen(docs).agg(
      count(lit(1)).as("n_docs"),
      sum(graft.ops.TextFunctions.tokenCount(col("text"))).as("n_tokens"),
      countDistinct(graft.ops.TextFunctions.fingerprint(col("text")))
        .as("__nfp"),
      countDistinct(col("source")).as("n_sources"))
    val vocab = graft.ops.TextFunctions.widen(docs)
      .select(explode(graft.ops.TextFunctions.tokens(col("text"))).as("__t"))
      .agg(countDistinct(col("__t")).as("n_vocab"))
    val langEnt = docs.groupBy(col("lang")).agg(count(lit(1)).as("__c"))
      .crossJoin(broadcast(docs.agg(count(lit(1)).as("__n"))))
      .select((col("__c").cast("double") / col("__n")).as("__p"))
      .agg(round(sum(round(-col("__p") * log(col("__p")), 12)
        .cast("decimal(27,15)")).cast("double"), 6).as("lang_entropy"))
    volume.crossJoin(broadcast(vocab)).crossJoin(broadcast(langEnt))
      .select(col("n_docs"), col("n_tokens"), col("n_vocab"),
        round(lit(1.0) - col("__nfp").cast("double") / col("n_docs"), 6)
          .as("dup_rate"),
        col("n_sources"), col("lang_entropy"))
  }

  val q159Sql: String =
    """WITH vol AS (
      |  SELECT count(*) AS n_docs,
      |    CAST(sum(len(regexp_split_to_array(lower(trim(text)), '\s+'))) AS BIGINT)
      |      AS n_tokens,
      |    count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
      |      AS nfp,
      |    count(DISTINCT source) AS n_sources
      |  FROM documents
      |), voc AS (
      |  SELECT count(DISTINCT t) AS n_vocab FROM (
      |    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
      |    FROM documents)
      |), le AS (
      |  SELECT round(CAST(sum(CAST(round(-p * ln(p), 12) AS DECIMAL(27,15)))
      |    AS DOUBLE), 6) AS lang_entropy
      |  FROM (SELECT CAST(count(*) AS DOUBLE)
      |          / (SELECT count(*) FROM documents) AS p
      |        FROM documents GROUP BY lang)
      |)
      |SELECT n_docs, n_tokens, n_vocab,
      |  round(1.0 - CAST(nfp AS DOUBLE) / n_docs, 6) AS dup_rate,
      |  n_sources, lang_entropy
      |FROM vol, voc, le""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q159_corpus_card" -> (q159CorpusCard _),
    "q80_curation_pipeline" -> (q80CurationPipeline _),
    "q114_diversified_search" -> (q114DiversifiedSearch _),
    "q137_scoreboard" -> (q137Scoreboard _))

  val oracles: Map[String, String] = Map(
    "q159_corpus_card" -> q159Sql,
    "q80_curation_pipeline" -> q80Sql,
    "q114_diversified_search" -> q114Sql,
    "q137_scoreboard" -> q137Sql)
}
