package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.TextFunctions._

/** Gate coverage for the text-analysis operator family over `documents`.
  * Every query here is pure per-row columnar work — no shuffle except the
  * final aggregate/sort — so it scales linearly with executors at 100 TB.
  * Oracle SQL mirrors each Spark expression exactly (same fold order, same
  * regexes; DuckDB regexp_replace needs the 'g' flag to match Spark's
  * replace-all semantics). */
object TextQueries {

  /** Per-document text statistics (token counts, ratios, quality score). */
  def q30TextStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .filter(col("doc_id") % 10 === 0)
      .select(
        col("doc_id"),
        tokenCount(col("text")).as("n_tokens"),
        bpeTokenCount(col("text")).as("n_bpe"),
        round(punctRatio(col("text")), 6).as("punct_ratio"),
        round(stopwordRatio(col("text")), 6).as("stop_ratio"),
        round(avgTokenLen(col("text")), 6).as("avg_tok_len"),
        qualityScore(col("text")).as("quality"))
      .orderBy(col("doc_id"))

  val q30Sql: String =
    """SELECT doc_id,
      | CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n_tokens,
      | CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS n_bpe,
      | round(CASE WHEN length(text)=0 THEN 0.0 ELSE
      |   CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)/length(text) END, 6) AS punct_ratio,
      | round(CASE WHEN len(regexp_split_to_array(lower(trim(text)), '\s+'))=0 THEN 0.0 ELSE
      |   CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
      |        t -> list_contains(['the','a','an','and','of','to','in','is','it','that'], t))) AS DOUBLE)
      |   / len(regexp_split_to_array(lower(trim(text)), '\s+')) END, 6) AS stop_ratio,
      | round(CAST(list_reduce(list_transform(regexp_split_to_array(lower(trim(text)), '\s+'),
      |        t -> CAST(length(t) AS BIGINT)), (a,b) -> a+b) AS DOUBLE)
      |   / len(regexp_split_to_array(lower(trim(text)), '\s+')), 6) AS avg_tok_len,
      | """.stripMargin + graft.ops.TextFunctions.qualitySql + """ AS quality
      |FROM documents WHERE doc_id % 10 = 0
      |ORDER BY doc_id""".stripMargin

  /** Language-ID heuristic vs the labeled lang column: distribution of
    * (predicted, labeled) pairs. */
  def q31LangId(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("lang"), langId(col("text")).as("pred"))
      .groupBy(col("lang"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred"))

  val q31Sql: String =
    s"""SELECT lang,
       | ${graft.ops.TextFunctions.langIdSql} AS pred,
       | count(*) AS n
       |FROM documents GROUP BY 1, 2 ORDER BY lang, pred""".stripMargin

  /** Content fingerprints: md5 of normalized text, for exact dedup;
    * returns per-source distinct-fingerprint counts. */
  def q32Fingerprint(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("source"), fingerprint(col("text")).as("fp"))
      .groupBy(col("source"))
      .agg(countDistinct(col("fp")).as("n_distinct"), count(lit(1)).as("n"))
      .orderBy(col("source"))

  val q32Sql: String =
    """SELECT source,
      | count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_distinct,
      | count(*) AS n
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Repetition ratio (1 - distinct 3-grams / total 3-grams): the classic
    * degenerate-text signal for corpus filtering. Relational gram rows
    * (codegen'd window k-grams via [[graft.ops.Dedup.kgramRows]], then one
    * count/count-distinct aggregation per doc) — the interpreted
    * higher-order-function form re-tokenizes per gram and goes quadratic
    * in document length. */
  def q37Repetition(s: SparkSession, d: String): DataFrame = {
    val base = graft.ops.TextFunctions.widen(
        Tables.documents(s, d).filter(col("doc_id") % 5 === 0))
      .select(col("doc_id").as("__id"), tokens(col("text")).as("__toks"))
      .select(col("__id"), col("__toks"),
        coalesce(size(col("__toks")), lit(0)).as("__n"))
    val stats = graft.ops.Dedup.kgramRows(base.filter(col("__n") >= 3), 3)
      .groupBy(col("__id"))
      .agg(countDistinct(col("__g")).as("__d"), count(lit(1)).as("__c"))
    base.select(col("__id"), col("__n"))
      .join(stats, Seq("__id"), "left")
      .select(col("__id").as("doc_id"),
        when(col("__n") < 3, 0.0).otherwise(
          round(lit(1.0) - col("__d").cast("double") / col("__c"), 6))
          .as("repetition"))
      .orderBy(col("doc_id"))
  }

  val q37Sql: String =
    """SELECT doc_id,
      | CASE WHEN len(toks) < 3 THEN 0.0 ELSE
      |   round(1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams), 6) END AS repetition
      |FROM (
      |  SELECT doc_id, toks,
      |    list_transform(range(1, greatest(len(toks)-2, 1)+1),
      |      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS grams
      |  FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |        FROM documents WHERE doc_id % 5 = 0))
      |ORDER BY doc_id""".stripMargin

  /** Corpus vocabulary profile: top terms by document frequency — the
    * stats stopword lists, IDF weights, and quality heuristics are built
    * from. One explode + one aggregation; countDistinct(doc) and count(*)
    * share the shuffle. */
  def q56Vocab(s: SparkSession, d: String): DataFrame =
    graft.ops.TextFunctions.widen(Tables.documents(s, d))
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("tf"))
      .orderBy(col("df").desc, col("token"))
      .limit(20)

  val q56Sql: String =
    """SELECT t AS token, count(DISTINCT doc_id) AS df, count(*) AS tf
      |FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
      |      FROM documents)
      |GROUP BY t ORDER BY df DESC, token LIMIT 20""".stripMargin

  /** TF-IDF document scores for a doc sample, with document frequencies
    * computed over the FULL corpus: explode once, df + tf as two
    * aggregations over the shared token rows, one join keyed on the token.
    * The corpus size rides in as a broadcast 1-row aggregate, never a
    * driver-side constant baked into the plan. */
  def q58Tfidf(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val toks = graft.ops.TextFunctions.widen(docs)
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
    val dfreq = toks.groupBy(col("t")).agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val tf = toks.filter(col("doc_id") % 25 === 0)
      .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("tf"))
    tf.join(dfreq, "t").crossJoin(broadcast(n))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("tf") * log(col("n").cast("double") / col("df"))), 6)
        .as("tfidf"))
      .orderBy(col("doc_id"))
  }

  val q58Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
      |  FROM documents),
      |dfreq AS (SELECT t, count(DISTINCT doc_id) AS df FROM toks GROUP BY t),
      |tf AS (SELECT doc_id, t, count(*) AS tf FROM toks
      |       WHERE doc_id % 25 = 0 GROUP BY 1, 2)
      |SELECT doc_id,
      |  round(sum(tf * ln((SELECT count(*) FROM documents) / df)), 6) AS tfidf
      |FROM tf JOIN dfreq USING (t) GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Bigram-LM coherence scoring: model trained on the whole corpus,
    * docs < 100 scored by mean transition probability (decimal-sum mean —
    * see [[graft.ops.LanguageModel.coherence]]). */
  def q87BigramCoherence(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    graft.ops.LanguageModel
      .coherence(docs.filter(col("doc_id") < 100), docs, "doc_id", "text")
      .select(col("doc_id"), col("n_bigrams"),
        round(col("coherence"), 6).as("coherence"))
      .orderBy(col("doc_id"))
  }

  val q87Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS a
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, a[i] AS w1, a[i+1] AS w2
      |  FROM toks, UNNEST(range(1, len(a))) AS t(i)
      |  WHERE len(a) >= 2),
      |pair AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
      |head AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM pair GROUP BY w1),
      |model AS (SELECT p.w1, p.w2, p.c2 / h.c1 AS p
      |          FROM pair p JOIN head h USING (w1)),
      |scored AS (
      |  SELECT b.doc_id, count(*) AS n_bigrams,
      |    CAST(sum(CAST(COALESCE(m.p, 0.0) AS DECIMAL(27,15))) AS DOUBLE)
      |      / count(*) AS coherence
      |  FROM bg b LEFT JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2
      |  WHERE b.doc_id < 100
      |  GROUP BY b.doc_id)
      |SELECT doc_id, n_bigrams, round(coherence, 6) AS coherence
      |FROM scored ORDER BY doc_id""".stripMargin

  /** Per-document out-of-vocabulary rate against the corpus's own top-12
    * token vocabulary — the tokenizer-fit metric a pipeline tracks when
    * deciding whether a vocab covers a new data source. One token
    * explode feeds both the vocab aggregation and the per-doc coverage
    * join; the vocab is tiny by construction so its join side broadcasts. */
  def q97OovRate(s: SparkSession, d: String): DataFrame = {
    val toks = graft.ops.TextFunctions.widen(Tables.documents(s, d))
      .select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val vocab = toks.groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("token")).limit(12)
      .select(col("token"), lit(1).as("__v"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"),
        sum(when(col("__v").isNotNull, 1L).otherwise(0L)).as("n_vocab"))
      .select(col("doc_id"), col("n_toks"),
        round(lit(1.0) - col("n_vocab").cast("double") / col("n_toks"), 6)
          .as("oov_rate"))
      .orderBy(col("doc_id"))
  }

  val q97Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
      |  FROM documents
      |), vocab AS (
      |  SELECT token FROM (
      |    SELECT token, count(*) AS tf FROM toks GROUP BY token
      |    ORDER BY tf DESC, token LIMIT 12)
      |), j AS (
      |  SELECT t.doc_id, CASE WHEN v.token IS NOT NULL THEN 1 ELSE 0 END AS iv
      |  FROM toks t LEFT JOIN vocab v USING (token)
      |)
      |SELECT doc_id, count(*) AS n_toks,
      |  round(CAST(1 AS DOUBLE) - CAST(sum(iv) AS DOUBLE)/count(*), 6) AS oov_rate
      |FROM j GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** One distributed BPE merge step: the 20 most frequent adjacent
    * character pairs inside words, corpus-wide — the inner loop of
    * tokenizer training as a single map-side-combinable aggregation.
    * (count desc, pair) is a total order, so the cut is oracle-exact. */
  def q120BpePairs(s: SparkSession, d: String): DataFrame =
    graft.ops.LanguageModel.bpePairCounts(
      Tables.documents(s, d), "doc_id", "text", topK = 20)

  val q120Sql: String =
    """WITH words AS (
      |  SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
      |  FROM documents WHERE doc_id IS NOT NULL),
      |pairs AS (
      |  SELECT substr(w, CAST(i AS INT), 2) AS pair
      |  FROM (SELECT w FROM words WHERE length(w) >= 2) t,
      |       UNNEST(range(1, length(w))) AS u(i))
      |SELECT pair, count(*) AS n FROM pairs
      |GROUP BY pair ORDER BY n DESC, pair LIMIT 20""".stripMargin

  /** PMI collocation mining ([[graft.ops.LanguageModel.pmiCollocations]]):
    * the full scored pair table at minCount 5, ordered by pair — the gate
    * pins every count and every PMI value, so the three marginal
    * aggregations and the fixed-shape double arithmetic are all on the
    * hook (top-k display cuts are a caller-side orderBy/limit; pinning the
    * whole table avoids tie-order instability at the cut). */
  def q128PmiCollocations(s: SparkSession, d: String): DataFrame =
    graft.ops.LanguageModel.pmiCollocations(
        Tables.documents(s, d), "doc_id", "text", minCount = 5)
      .select(col("w1"), col("w2"), col("pair_count"),
        round(col("pmi"), 6).as("pmi"))
      .orderBy(col("w1"), col("w2"))

  val q128Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS a
      |  FROM documents),
      |bg AS (
      |  SELECT a[i] AS w1, a[i+1] AS w2
      |  FROM toks, UNNEST(range(1, len(a))) AS t(i)
      |  WHERE len(a) >= 2),
      |pair AS (SELECT w1, w2, count(*) AS pair_count FROM bg
      |         GROUP BY w1, w2 HAVING count(*) >= 5),
      |head AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
      |tl AS (SELECT w2, count(*) AS ct FROM bg GROUP BY w2),
      |tot AS (SELECT count(*) AS n FROM bg)
      |SELECT w1, w2, pair_count,
      |  round(ln(CAST(pair_count AS DOUBLE) * n / (CAST(c1 AS DOUBLE) * ct)), 6) AS pmi
      |FROM pair JOIN head USING (w1) JOIN tl USING (w2), tot
      |ORDER BY w1, w2""".stripMargin

  /** Character-level Shannon entropy per document
    * ([[graft.ops.TextFunctions.charEntropy]]) — computed per-row with
    * zero shuffles on the Spark side; the oracle replays it via
    * explode+group (order-free because both sides sum the identical
    * −p·ln p doubles as decimal(27,15)). */
  def q130CharEntropy(s: SparkSession, d: String): DataFrame =
    // widen: the char-level fold is the heaviest per-row expression in the
    // gate (~2.8 ms/doc) and the sf0.1 table is ONE parquet file — without
    // the round-robin it runs serially on a single input split (measured
    // 13.9 s vs 1.4 s at sf0.1; at cluster scale splits are plentiful and
    // widen is a no-op)
    graft.ops.TextFunctions.widen(Tables.documents(s, d))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_obs"),
        distinctCharCount(col("text")).as("distinct_chars"),
        round(charEntropy(col("text")), 6).as("char_entropy"))
      .orderBy(col("doc_id"))

  val q130Sql: String =
    """WITH ch AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(text, '')) AS c
      |  FROM documents),
      |cc AS (SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY doc_id, c),
      |n AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ch GROUP BY doc_id)
      |SELECT doc_id, n AS n_chars_obs,
      |  CAST(count(*) AS BIGINT) AS distinct_chars,
      |  round(CAST(sum(CAST(
      |    (CAST(cnt AS DOUBLE)/n) * ln(CAST(cnt AS DOUBLE)/n) * -1.0
      |    AS DECIMAL(27,15))) AS DOUBLE), 6) AS char_entropy
      |FROM cc JOIN n USING (doc_id)
      |GROUP BY doc_id, n ORDER BY doc_id""".stripMargin

  /** Vocabulary coverage curve at k ∈ {5, 10, 20, 30, 100}: cumulative
    * share of token occurrences covered by the top-k terms (count desc,
    * term tie-break; the synthetic corpus holds 31 distinct words, so the
    * k=100 cut lands beyond the vocabulary and must emit no row on
    * either engine). Rank and cumulative sum both ride the bucketed
    * prefix scan — no vocab-sized window partition — and the cut values
    * are tie-invariant, so the oracle's window formulation must agree
    * exactly. */
  def q136VocabCoverage(s: SparkSession, d: String): DataFrame =
    graft.ops.TextRanking.vocabCoverageCurve(Tables.documents(s, d),
        "doc_id", "text", ks = Seq(5, 10, 20, 30, 100))
      .orderBy(col("k"))

  val q136Sql: String =
    """WITH toks AS (
      |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
      |  FROM documents
      |), tc AS (SELECT t, count(*) AS c FROM toks GROUP BY t
      |), r AS (
      |  SELECT c, row_number() OVER (ORDER BY c DESC, t) AS rk,
      |    sum(c) OVER (ORDER BY c DESC, t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM tc
      |), tot AS (SELECT sum(c) AS tot FROM tc)
      |SELECT rk AS k, CAST(cum AS BIGINT) AS cum_tokens,
      |  CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) AS coverage
      |FROM r, tot WHERE rk IN (5, 10, 20, 30, 100) ORDER BY k""".stripMargin

  /** CCNet perplexity terciles ([[graft.ops.LanguageModel
    * .ccnetQualityBuckets]]): every doc's add-one-smoothed bigram
    * cross-entropy AND its head/middle/tail bucket are hash-pinned, so
    * the smoothing arithmetic, the decimal-sum discipline, and the
    * rank-based (not threshold-comparison) tercile cut must all agree
    * with the oracle's replay.
    *
    * The TRAIN pass (bigram census) is an offline model build — a real
    * pipeline trains once and scores many batches — so the trained
    * [[graft.ops.LanguageModel.BigramModel]] is memoized per source dir
    * as PERSISTED vocabulary-sized tables (never collected to the
    * driver: the model can be vocabulary-large). Repeated q138
    * invocations in one JVM measure the scoring path, not re-training;
    * the model itself is deterministic so the cache changes cost, never
    * results. */
  private val ccnetModelCache = scala.collection.concurrent.TrieMap
    .empty[String, (SparkSession, graft.ops.LanguageModel.BigramModel)]

  def q138CcnetBuckets(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // persisted DataFrames are session-bound: a cached model from another
    // (possibly stopped) session in the same JVM must be rebuilt, not
    // served — the cache key alone (dir) can't see a session restart
    val model = ccnetModelCache.get(d) match {
      case Some((sess, m)) if sess eq s => m
      case stale =>
        stale.foreach { case (_, m) =>
          try { m.pair.unpersist(); m.head.unpersist(); m.vocab.unpersist() }
          catch { case _: Throwable => () } // stopped session: just drop
        }
        val m = graft.ops.LanguageModel.ccnetTrain(docs, "doc_id", "text")
          .persisted()
        ccnetModelCache.put(d, (s, m))
        m
    }
    graft.ops.LanguageModel.ccnetQualityBuckets(docs, model, "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  val q138Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS a
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, a[i] AS w1, a[i+1] AS w2
      |  FROM toks, UNNEST(range(1, len(a))) AS t(i)
      |  WHERE len(a) >= 2),
      |pair AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2),
      |hd AS (SELECT w1, sum(c2) AS c1 FROM pair GROUP BY w1),
      |v AS (SELECT count(DISTINCT w2) AS v FROM pair),
      |nll AS (
      |  SELECT bg.doc_id, -ln((c2 + 1.0) / (c1 + v)) AS nll
      |  FROM bg JOIN pair USING (w1, w2) JOIN hd USING (w1), v),
      |perdoc AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |    round(CAST(sum(CAST(nll AS DECIMAL(27,15))) AS DOUBLE) / count(*), 6) AS xent
      |  FROM nll GROUP BY doc_id),
      |n AS (SELECT count(*) AS n FROM perdoc),
      |r AS (
      |  SELECT doc_id, n_bigrams, xent,
      |    row_number() OVER (ORDER BY xent, doc_id) - 1 AS rank0
      |  FROM perdoc)
      |SELECT doc_id, n_bigrams, xent,
      |  ['head','middle','tail'][CAST((rank0 * 3) // n AS INT) + 1] AS bucket
      |FROM r, n ORDER BY doc_id""".stripMargin

  /** WordPiece tokenizer application
    * ([[graft.ops.LanguageModel.wordpieceVocab]] +
    * [[graft.ops.LanguageModel.wordpieceSegment]]): the corpus-trained
    * piece inventory (chars + ≤4-char whole words + frequent
    * 3-substrings) greedily segments every DISTINCT word, maximal munch
    * with `##` continuations and single-char fallback. The full piece
    * string of every word is hash-pinned; the oracle replays the greedy
    * walk with a recursive CTE over the same relational longest-match
    * table. */
  def q150Wordpiece(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val vocab = graft.ops.LanguageModel.wordpieceVocab(
      docs, "doc_id", "text", wholeWordLen = 4, minSubCount = 500)
    graft.ops.LanguageModel.wordpieceSegment(
        docs, "doc_id", "text", vocab, "piece",
        maxPieceLen = 4, maxWordLen = 16)
      .orderBy(col("word"))
  }

  val q150Sql: String =
    """WITH RECURSIVE w0 AS (
      |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
      |  FROM documents WHERE doc_id IS NOT NULL
      |), vw AS (
      |  SELECT w AS word, count(*) AS cnt FROM w0 GROUP BY 1
      |), chars AS (
      |  SELECT DISTINCT substr(word, i, 1) AS piece
      |  FROM vw, UNNEST(range(1, length(word) + 1)) AS t(i)
      |), whole AS (
      |  SELECT DISTINCT word AS piece FROM vw
      |  WHERE length(word) <= 4 AND length(word) >= 1
      |), subs AS (
      |  SELECT substr(word, p, 3) AS piece
      |  FROM vw, UNNEST(range(1, greatest(length(word) - 2, 0) + 1)) AS t(p)
      |  GROUP BY 1 HAVING sum(cnt) >= 500
      |), vocab AS (
      |  SELECT DISTINCT piece FROM
      |    (SELECT piece FROM chars UNION ALL SELECT piece FROM whole
      |     UNION ALL SELECT piece FROM subs)
      |), wf AS (
      |  SELECT substr(word, 1, 16) AS word, CAST(sum(cnt) AS BIGINT) AS cnt
      |  FROM vw WHERE length(word) >= 1 GROUP BY 1
      |), cand AS (
      |  SELECT word, p, l, substr(word, p + 1, l) AS piece
      |  FROM wf,
      |    UNNEST(range(0, length(word))) AS t(p),
      |    UNNEST(range(1, least(4, length(word) - p) + 1)) AS u(l)
      |), mt AS (
      |  SELECT word, p, max(l) AS g
      |  FROM cand JOIN vocab USING (piece) GROUP BY 1, 2
      |), allpos AS (
      |  SELECT word, i AS p FROM wf, UNNEST(range(0, length(word))) AS t(i)
      |), garr AS (
      |  SELECT a.word, list(coalesce(m.g, 1) ORDER BY a.p) AS g
      |  FROM allpos a LEFT JOIN mt m ON a.word = m.word AND a.p = m.p
      |  GROUP BY 1
      |), seg AS (
      |  SELECT word, length(word) AS len, g, 0 AS pos,
      |    CAST('' AS VARCHAR) AS pieces, CAST(0 AS BIGINT) AS np
      |  FROM garr
      |  UNION ALL
      |  SELECT word, len, g, pos + g[pos + 1],
      |    CASE WHEN pos = 0 THEN substr(word, 1, g[1])
      |      ELSE pieces || ' ##' || substr(word, pos + 1, g[pos + 1]) END,
      |    np + 1
      |  FROM seg WHERE pos < len
      |)
      |SELECT s.word, wf.cnt, s.np AS n_pieces, s.pieces
      |FROM seg s JOIN wf USING (word)
      |WHERE s.pos >= s.len ORDER BY s.word""".stripMargin

  /** Per-source unigram KL divergence from the corpus
    * ([[graft.ops.LanguageModel.sourceKlDivergence]]): every source's
    * domain-shift score, decimal-pinned per smoothing term, so the
    * add-one grid, the ln ratios, and the 12-dp term quantization all
    * replay identically. */
  def q157SourceKl(s: SparkSession, d: String): DataFrame =
    graft.ops.LanguageModel.sourceKlDivergence(
        Tables.documents(s, d), "doc_id", "text", "source")
      .orderBy(col("src"))

  val q157Sql: String =
    """WITH toks AS (
      |  SELECT source AS src,
      |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
      |  FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL
      |), psw AS (
      |  SELECT src, w, count(*) AS cs FROM toks GROUP BY 1, 2
      |), pw AS (SELECT w, sum(cs) AS c FROM psw GROUP BY 1
      |), ns AS (SELECT src, CAST(sum(cs) AS BIGINT) AS ns FROM psw GROUP BY 1
      |), tot AS (SELECT sum(c) AS n, count(*) AS v FROM pw
      |), grid AS (
      |  SELECT ns.src, ns.ns,
      |    CAST(round(
      |      (CAST(coalesce(psw.cs, 0) + 1 AS DOUBLE) / CAST(ns.ns + tot.v AS DOUBLE))
      |      * ln((CAST(coalesce(psw.cs, 0) + 1 AS DOUBLE) / CAST(ns.ns + tot.v AS DOUBLE))
      |         / (CAST(pw.c + 1 AS DOUBLE) / CAST(tot.n + tot.v AS DOUBLE))), 12)
      |      AS DECIMAL(27,15)) AS t
      |  FROM ns CROSS JOIN pw
      |  LEFT JOIN psw ON psw.src = ns.src AND psw.w = pw.w
      |  CROSS JOIN tot
      |)
      |SELECT src, max(ns) AS n_tokens,
      |  round(CAST(sum(t) AS DOUBLE), 6) AS kl
      |FROM grid GROUP BY 1 ORDER BY src""".stripMargin

  /** Zipf rank–frequency law fit: ln(freq) regressed on ln(rank) over
    * the whole vocabulary with [[graft.ops.Profiling.linearFit]] — the
    * corpus-statistics health check (natural text slopes ≈ −1; synthetic
    * or templated corpora flatten). Rank comes from the bucketed
    * exclusive prefix sum (the q136 device), NEVER a vocab-sized global
    * window; the five regression moments are decimal-pinned so the fit
    * replays exactly. */
  def q151ZipfFit(s: SparkSession, d: String): DataFrame = {
    val counts = graft.ops.TextFunctions.widen(Tables.documents(s, d))
      .select(explode(tokens(col("text"))).as("__t"))
      .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
      .select(col("__t"), col("__c"), (-col("__c")).as("__nc"),
        lit(1L).as("__one"))
    val ranked = graft.ops.Curation.exclusivePrefixSum(
      counts, "__nc", "__t", "__one", "__rb")
    val xy = ranked.select(
      log((col("__rb") + 1).cast("double")).as("x"),
      log(col("__c").cast("double")).as("y"))
    graft.ops.Profiling.linearFit(xy, Seq.empty, "x", "y")
  }

  val q151Sql: String =
    """WITH cnt AS (
      |  SELECT t, count(*) AS c FROM (
      |    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
      |    FROM documents)
      |  GROUP BY 1
      |), ranked AS (
      |  SELECT c, row_number() OVER (ORDER BY c DESC, t) AS r FROM cnt
      |), xy AS (
      |  SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y FROM ranked
      |), m AS (
      |  SELECT count(*) AS n,
      |    CAST(sum(CAST(x AS DECIMAL(27,15))) AS DOUBLE) AS sx,
      |    CAST(sum(CAST(y AS DECIMAL(27,15))) AS DOUBLE) AS sy,
      |    CAST(sum(CAST(x * x AS DECIMAL(27,15))) AS DOUBLE) AS sxx,
      |    CAST(sum(CAST(x * y AS DECIMAL(27,15))) AS DOUBLE) AS sxy,
      |    CAST(sum(CAST(y * y AS DECIMAL(27,15))) AS DOUBLE) AS syy
      |  FROM xy
      |), g AS (
      |  SELECT n, sx, sy,
      |    CAST(n AS DOUBLE) * sxx - sx * sx AS varx,
      |    CAST(n AS DOUBLE) * syy - sy * sy AS vary,
      |    CAST(n AS DOUBLE) * sxy - sx * sy AS cov
      |  FROM m
      |)
      |SELECT n, round(cov / varx, 6) AS slope,
      |  round((sy - (cov / varx) * sx) / CAST(n AS DOUBLE), 6) AS intercept,
      |  round(cov * cov / (varx * vary), 6) AS r2
      |FROM g""".stripMargin

  /** Stupid Backoff fluency ([[graft.ops.LanguageModel
    * .stupidBackoffScores]]): model trained on the even-id half, ALL
    * docs scored — so held-out docs genuinely exercise the bigram and
    * unigram back-off tiers and OOV words hit the half-count floor.
    * Every doc's mean ln-score is hash-pinned: trigram extraction, the
    * three-tier cascade, the 0.4/0.16 factors, and the decimal-sum mean
    * all must replay identically. */
  def q143StupidBackoff(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    graft.ops.LanguageModel.stupidBackoffScores(docs,
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  val q143Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS a
      |  FROM documents),
      |mtoks AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
      |uni AS (
      |  SELECT t AS w, count(*) AS u
      |  FROM (SELECT unnest(a) AS t FROM mtoks) GROUP BY t),
      |tot AS (SELECT sum(u) AS nn FROM uni),
      |bi AS (
      |  SELECT a[i] AS w1, a[i+1] AS w2, count(*) AS b
      |  FROM mtoks, UNNEST(range(1, len(a))) AS s(i)
      |  WHERE len(a) >= 2 GROUP BY w1, w2),
      |tri AS (
      |  SELECT a[i] AS w1, a[i+1] AS w2, a[i+2] AS w3, count(*) AS ct
      |  FROM mtoks, UNNEST(range(1, len(a) - 1)) AS s(i)
      |  WHERE len(a) >= 3 GROUP BY w1, w2, w3),
      |pos AS (
      |  SELECT doc_id, a[i] AS w1, a[i+1] AS w2, a[i+2] AS w3
      |  FROM toks, UNNEST(range(1, len(a) - 1)) AS s(i)
      |  WHERE len(a) >= 3),
      |scored AS (
      |  SELECT doc_id,
      |    CASE WHEN tri.ct IS NOT NULL THEN ln(CAST(tri.ct AS DOUBLE) / b12.b)
      |         WHEN b23.b IS NOT NULL THEN ln(0.4 * (CAST(b23.b AS DOUBLE) / u2.u))
      |         ELSE ln(0.16 * ((CAST(COALESCE(u3.u, 0) AS DOUBLE) + 0.5) / nn)) END AS lns
      |  FROM pos
      |  LEFT JOIN tri ON pos.w1 = tri.w1 AND pos.w2 = tri.w2 AND pos.w3 = tri.w3
      |  LEFT JOIN bi b12 ON pos.w1 = b12.w1 AND pos.w2 = b12.w2
      |  LEFT JOIN bi b23 ON pos.w2 = b23.w1 AND pos.w3 = b23.w2
      |  LEFT JOIN uni u2 ON pos.w2 = u2.w
      |  LEFT JOIN uni u3 ON pos.w3 = u3.w, tot)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
      |  round(CAST(sum(CAST(lns AS DECIMAL(27,15))) AS DOUBLE) / count(*), 6) AS sb_score
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** BPE merge-rule training ([[graft.ops.LanguageModel.bpeTrain]]):
    * the full 8-round merge table — every learned rule's (left, right)
    * symbols and its weighted pair count — is hash-pinned. The oracle
    * unrolls the identical rounds as CTE pairs (count → top-1 → replace):
    * both engines use the same non-overlapping left-to-right `replace`
    * builtin, so leftmost-first merge semantics and the lexicographic
    * tie-break must agree round by round — one wrong merge in round k
    * cascades into every later round's counts. Complements q150 (which
    * pins WordPiece SEGMENTATION with a pre-built vocab) and q120 (one
    * round of raw pair counts). */
  def q161BpeMerges(s: SparkSession, d: String): DataFrame =
    graft.ops.LanguageModel.bpeTrain(Tables.documents(s, d), "doc_id",
        "text", nMerges = 8, maxWordLen = 12)
      .orderBy(col("step"))

  val q161Sql: String = {
    // symbols are chr(1)-PREFIXED and space-FOLLOWED (the op's marker
    // layout), so the per-round replace is exactly canonical
    // leftmost-first BPE — see LanguageModel.bpeTrain's scaladoc
    val rounds = (1 to 8).map { i =>
      s"""p$i AS (
         |  SELECT l[i] AS lft, l[i+1] AS rgt, sum(f) AS c
         |  FROM (SELECT string_split(trim(s), ' ') AS l, f FROM w${i - 1}),
         |    UNNEST(range(1, len(l))) AS t(i)
         |  GROUP BY 1, 2),
         |b$i AS (SELECT lft, rgt, c FROM p$i ORDER BY c DESC, lft, rgt LIMIT 1),
         |w$i AS (
         |  SELECT CASE WHEN b.lft IS NULL THEN s
         |    ELSE replace(s, b.lft || ' ' || b.rgt || ' ',
         |                 b.lft || substr(b.rgt, 2) || ' ') END AS s, f
         |  FROM w${i - 1} LEFT JOIN b$i b ON TRUE)""".stripMargin
    }.mkString(",\n")
    val steps = (1 to 8)
      .map(i => s"SELECT $i AS step, lft, rgt, c FROM b$i")
      .mkString("\nUNION ALL\n")
    s"""WITH w0 AS (
       |  SELECT array_to_string(list_transform(range(1, length(w) + 1),
       |      i -> chr(1) || w[i] || ' '), '') AS s, f
       |  FROM (
       |    SELECT w, count(*) AS f FROM (
       |      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
       |      FROM documents WHERE doc_id IS NOT NULL)
       |    WHERE w <> '' AND length(w) <= 12 GROUP BY w)),
       |$rounds
       |SELECT CAST(step AS INT) AS step, substr(lft, 2) AS merge_left,
       |  substr(rgt, 2) AS merge_right, CAST(c AS BIGINT) AS pair_count
       |FROM ($steps) ORDER BY step""".stripMargin
  }

  /** Log-odds over-indexing terms
    * ([[graft.ops.LanguageModel.logOddsTerms]]): the 20 terms src0
    * over-uses vs the rest of the corpus, add-one-smoothed — counts and
    * 6-dp scores hash-pinned. The per-term drill-down next to q157's
    * per-source KL aggregate. */
  def q165LogOddsTerms(s: SparkSession, d: String): DataFrame =
    graft.ops.LanguageModel.logOddsTerms(Tables.documents(s, d),
        "doc_id", "text", "source", target = "src0", minCount = 10, k = 20)
      .orderBy(col("log_odds").desc, col("term"))

  val q165Sql: String =
    """WITH toks AS (
      |  SELECT source = 'src0' AS a,
      |    unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
      |  FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL),
      |counts AS (
      |  SELECT term,
      |    CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(sum(CASE WHEN a THEN 0 ELSE 1 END) AS BIGINT) AS cb
      |  FROM toks WHERE term <> '' GROUP BY term),
      |tot AS (SELECT sum(ca) AS na, sum(cb) AS nb, count(*) AS v FROM counts)
      |SELECT term, ca, cb,
      |  round(ln((CAST(ca + 1 AS DOUBLE) / (na + v)) /
      |           (CAST(cb + 1 AS DOUBLE) / (nb + v))), 6) AS log_odds
      |FROM counts CROSS JOIN tot
      |WHERE ca + cb >= 10
      |ORDER BY log_odds DESC, term LIMIT 20""".stripMargin

  /** Distinct-n diversity per source
    * ([[graft.ops.LanguageModel.distinctNgramRatios]]): every source's
    * unigram and bigram type/occurrence ratios hash-pinned — the
    * mode-collapse / templated-text detector a curation pipeline runs
    * per data source before mixing. */
  def q168DistinctN(s: SparkSession, d: String): DataFrame =
    graft.ops.LanguageModel.distinctNgramRatios(Tables.documents(s, d),
        "doc_id", "text", "source")
      .orderBy(col("source"))

  val q168Sql: String =
    """WITH base AS (
      |  SELECT doc_id, source,
      |    regexp_split_to_array(lower(trim(text)), '\s+') AS a
      |  FROM documents WHERE doc_id IS NOT NULL AND source IS NOT NULL),
      |uni AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
      |    count(DISTINCT w) AS d1
      |  FROM (SELECT source, unnest(a) AS w FROM base) WHERE w <> ''
      |  GROUP BY source),
      |bi AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
      |    count(DISTINCT w1 || chr(31) || w2) AS d2
      |  FROM (
      |    SELECT source, a[i] AS w1, a[i+1] AS w2
      |    FROM base, UNNEST(range(1, len(a))) AS t(i)
      |    WHERE len(a) >= 2)
      |  GROUP BY source)
      |SELECT uni.source, n_tokens,
      |  round(CAST(d1 AS DOUBLE) / n_tokens, 6) AS distinct1_ratio,
      |  coalesce(n_bigrams, 0) AS n_bigrams,
      |  CASE WHEN n_bigrams IS NOT NULL
      |    THEN round(CAST(d2 AS DOUBLE) / n_bigrams, 6) END AS distinct2_ratio
      |FROM uni LEFT JOIN bi USING (source)
      |ORDER BY source""".stripMargin

  /** BPE SEGMENTATION with the corpus-trained merges
    * ([[graft.ops.LanguageModel.bpeTrain]] →
    * [[graft.ops.LanguageModel.bpeSegment]]): every distinct word's
    * piece string under the 8 learned rules, applied in training order —
    * the full tokenizer lifecycle closed end-to-end (q161 pins the
    * rules; this pins their application). The oracle re-derives the
    * merge chain with the word carried through, so its round-8 state IS
    * the segmentation. The trained merge table (8 rows) is memoized per
    * source dir — train once, segment many, the serving shape. */
  private val bpeMergeCache = scala.collection.concurrent.TrieMap
    .empty[String, (Array[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType)]

  def q173BpeSegment(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val (rows, schema) = bpeMergeCache.getOrElseUpdate(d, {
      val m = graft.ops.LanguageModel.bpeTrain(docs, "doc_id", "text",
        nMerges = 8, maxWordLen = 12)
      (m.collect(), m.schema)
    })
    val merges = s.createDataFrame(
      java.util.Arrays.asList(rows: _*), schema)
    graft.ops.LanguageModel.bpeSegment(docs, "doc_id", "text", merges,
        maxWordLen = 12)
      .orderBy(col("word"))
  }

  val q173Sql: String = {
    val rounds = (1 to 8).map { i =>
      s"""p$i AS (
         |  SELECT l[i] AS lft, l[i+1] AS rgt, sum(f) AS c
         |  FROM (SELECT string_split(trim(s), ' ') AS l, f FROM w${i - 1}),
         |    UNNEST(range(1, len(l))) AS t(i)
         |  GROUP BY 1, 2),
         |b$i AS (SELECT lft, rgt, c FROM p$i ORDER BY c DESC, lft, rgt LIMIT 1),
         |w$i AS (
         |  SELECT w, CASE WHEN b.lft IS NULL THEN s
         |    ELSE replace(s, b.lft || ' ' || b.rgt || ' ',
         |                 b.lft || substr(b.rgt, 2) || ' ') END AS s, f
         |  FROM w${i - 1} LEFT JOIN b$i b ON TRUE)""".stripMargin
    }.mkString(",\n")
    s"""WITH w0 AS (
       |  SELECT w, array_to_string(list_transform(range(1, length(w) + 1),
       |      i -> chr(1) || w[i] || ' '), '') AS s, f
       |  FROM (
       |    SELECT w, count(*) AS f FROM (
       |      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS w
       |      FROM documents WHERE doc_id IS NOT NULL)
       |    WHERE w <> '' AND length(w) <= 12 GROUP BY w)),
       |$rounds
       |SELECT w AS word,
       |  CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_pieces,
       |  replace(trim(s), chr(1), '') AS pieces
       |FROM w8 ORDER BY word""".stripMargin
  }

  /** UNIGRAM-LM tokenization ([[graft.ops.LanguageModel.unigramVocab]] →
    * [[graft.ops.LanguageModel.unigramSegment]]): the third member of the
    * tokenizer triad (BPE q161/q173, WordPiece q150, unigram — the
    * SentencePiece default). Every distinct word's Viterbi-optimal
    * segmentation, piece count, and total integer micro-nat score are
    * hash-pinned: the oracle re-derives the corpus-frequency vocabulary,
    * the ⌊ln(p)·10⁶+0.5⌋ scores, and the full DP — 12 unrolled stages of
    * best[i] = max_l(best[i−l] + score), ties to the longest final piece
    * — so the lattice construction, the all-integer arithmetic, and the
    * tie rule must all agree cell by cell. */
  def q181UnigramSegment(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val vocab = graft.ops.LanguageModel.unigramVocab(docs, "doc_id", "text",
      maxPieceLen = 4, maxWordLen = 12, minCount = 2)
    graft.ops.LanguageModel.unigramSegment(docs, "doc_id", "text", vocab,
        maxPieceLen = 4, maxWordLen = 12)
      .orderBy(col("word"))
  }

  // Shared builders for the unigram-LM oracle's unrolled Viterbi chain
  // (q181 segmentation, q183 fertility): the 12 DP stages and the
  // final-cell selector are generated once, the words CTE is the
  // per-query parameter.
  private def uniLk(k: Int): String =
    s"ss[nullif(list_position(ks, $k), 0)]"

  private def uniStage(i: Int): String = {
    val cs = (1 to 4).map { l =>
      if (l > i) s"CAST(NULL AS BIGINT) AS c$l"
      else {
        val j = i - l
        val look =
          if (l == 1) s"coalesce(${uniLk(j * 8 + 1)}, -20000000)"
          else uniLk(j * 8 + l)
        s"CASE WHEN len >= $i THEN s$j + $look END AS c$l"
      }
    }.mkString(",\n      ")
    val picks = (4 to 1 by -1).filter(_ <= i)
    def pick(f: Int => String): String =
      "CASE " + picks.map(l => s"WHEN c$l = mx THEN ${f(l)}")
        .mkString(" ") + " END"
    val npSel = pick(l => s"np${i - l} + 1")
    val sgSel = pick { l =>
      val j = i - l
      s"(CASE WHEN sg$j = '' THEN '' ELSE sg$j || ' ' END) || substr(word, ${j + 1}, $l)"
    }
    s"""d$i AS (
       |  SELECT * EXCLUDE (c1, c2, c3, c4, mx),
       |    CASE WHEN len >= $i THEN mx END AS s$i,
       |    CASE WHEN len >= $i THEN $npSel END AS np$i,
       |    CASE WHEN len >= $i THEN $sgSel END AS sg$i
       |  FROM (SELECT *, greatest(c1, c2, c3, c4) AS mx FROM (
       |    SELECT *,
       |      $cs
       |    FROM d${i - 1}) a) b)""".stripMargin
  }

  private def uniFin(c: String): String =
    "CASE len " + (1 to 12).map(i => s"WHEN $i THEN $c$i").mkString(" ") +
      " END"

  /** The vocabulary + edge-map + 12-stage DP CTE chain, ending at `d12`.
    * `wordsCtes` must define a CTE `words(word, cnt, len)`. */
  private def uniDpChain(wordsCtes: String): String =
    s"""$wordsCtes,
       |pieces AS (
       |  SELECT substr(word, p + 1, l) AS piece, CAST(sum(cnt) AS BIGINT) AS freq
       |  FROM words, UNNEST(range(0, len)) AS tp(p),
       |       UNNEST(range(1, least(4, len - p) + 1)) AS tl(l)
       |  GROUP BY 1),
       |kept AS (SELECT piece, freq FROM pieces
       |         WHERE freq >= 2 OR length(piece) = 1),
       |tot AS (SELECT CAST(sum(freq) AS DOUBLE) AS t FROM kept),
       |vocab AS (
       |  SELECT piece,
       |    CAST(floor(ln(CAST(freq AS DOUBLE) / t) * 1000000.0 + 0.5) AS BIGINT) AS s
       |  FROM kept CROSS JOIN tot),
       |edges AS (
       |  SELECT e.word, e.k, v.s FROM (
       |    SELECT word, p * 8 + l AS k, substr(word, p + 1, l) AS pc
       |    FROM words, UNNEST(range(0, len)) AS tp(p),
       |         UNNEST(range(1, least(4, len - p) + 1)) AS tl(l)) e
       |  JOIN vocab v ON v.piece = e.pc),
       |em AS (SELECT word, list(k ORDER BY k) AS ks, list(s ORDER BY k) AS ss
       |       FROM edges GROUP BY word),
       |d0 AS (
       |  SELECT w.word, w.cnt, w.len, em.ks, em.ss,
       |    CAST(0 AS BIGINT) AS s0, CAST(0 AS BIGINT) AS np0, '' AS sg0
       |  FROM words w LEFT JOIN em USING (word)),
       |${(1 to 12).map(uniStage).mkString(",\n")}""".stripMargin

  val q181Sql: String =
    s"""WITH ${uniDpChain(
         """words AS (
           |  SELECT w AS word, count(*) AS cnt, length(w) AS len FROM (
           |    SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
           |    FROM documents WHERE doc_id IS NOT NULL)
           |  WHERE w <> '' AND length(w) <= 12 GROUP BY w)""".stripMargin)}
       |SELECT word, cnt, ${uniFin("np")} AS n_pieces,
       |  ${uniFin("s")} AS score_micro, ${uniFin("sg")} AS pieces
       |FROM d12 ORDER BY word""".stripMargin

  /** Tokenizer fertility / compression evaluation
    * ([[graft.ops.LanguageModel.unigramFertility]]): per source, pieces
    * per word (fertility — Rust et al. 2021's tokenizer-quality metric),
    * chars per piece (compression), and the whole-word-kept fraction
    * under the q181 unigram tokenizer — the MEASUREMENT step of the
    * tokenizer lifecycle (train q161/q181, apply q173/q181, measure
    * here). The oracle rides the same unrolled 12-stage Viterbi chain as
    * q181, then joins per-(source, word) occurrence counts back to the
    * per-word piece counts — so the integer numerators and all three
    * final divisions hash-match. */
  def q183TokenizerFertility(s: SparkSession, d: String): DataFrame =
    graft.ops.LanguageModel.unigramFertilitySelfTrained(
        Tables.documents(s, d), "doc_id", "text", "source",
        maxPieceLen = 4, maxWordLen = 12, minCount = 2)
      .withColumnRenamed("group", "source")

  val q183Sql: String =
    s"""WITH ${uniDpChain(
         """sw AS (
           |  SELECT source, w AS word, count(*) AS cnt FROM (
           |    SELECT source,
           |      unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
           |    FROM documents WHERE doc_id IS NOT NULL)
           |  WHERE w <> '' AND length(w) <= 12 GROUP BY source, w),
           |words AS (
           |  SELECT word, CAST(sum(cnt) AS BIGINT) AS cnt,
           |    length(word) AS len
           |  FROM sw GROUP BY word)""".stripMargin)}
       |SELECT s.source,
       |  CAST(sum(s.cnt) AS BIGINT) AS n_words,
       |  CAST(sum(s.cnt * f.np) AS BIGINT) AS n_pieces,
       |  CAST(sum(s.cnt * length(s.word)) AS BIGINT) AS n_chars,
       |  round(CAST(sum(s.cnt * f.np) AS DOUBLE) / sum(s.cnt), 6) AS fertility,
       |  round(CAST(sum(s.cnt * length(s.word)) AS DOUBLE) / sum(s.cnt * f.np), 6)
       |    AS chars_per_piece,
       |  round(CAST(sum(CASE WHEN f.np = 1 THEN s.cnt ELSE 0 END) AS DOUBLE)
       |    / sum(s.cnt), 6) AS pct_whole
       |FROM sw s
       |JOIN (SELECT word, ${uniFin("np")} AS np FROM d12) f USING (word)
       |GROUP BY s.source ORDER BY s.source""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q183_tokenizer_fertility" -> (q183TokenizerFertility _),
    "q181_unigram_segment" -> (q181UnigramSegment _),
    "q173_bpe_segment" -> (q173BpeSegment _),
    "q168_distinct_n" -> (q168DistinctN _),
    "q165_log_odds_terms" -> (q165LogOddsTerms _),
    "q161_bpe_merges" -> (q161BpeMerges _),
    "q143_stupid_backoff" -> (q143StupidBackoff _),
    "q150_wordpiece" -> (q150Wordpiece _),
    "q151_zipf_fit" -> (q151ZipfFit _),
    "q157_source_kl" -> (q157SourceKl _),
    "q138_ccnet_buckets" -> (q138CcnetBuckets _),
    "q136_vocab_coverage" -> (q136VocabCoverage _),
    "q128_pmi_collocations" -> (q128PmiCollocations _),
    "q130_char_entropy" -> (q130CharEntropy _),
    "q120_bpe_pairs" -> (q120BpePairs _),
    "q97_oov_rate" -> (q97OovRate _),
    "q87_bigram_coherence" -> (q87BigramCoherence _),
    "q30_text_stats" -> (q30TextStats _),
    "q31_lang_id" -> (q31LangId _),
    "q32_fingerprint" -> (q32Fingerprint _),
    "q37_repetition" -> (q37Repetition _),
    "q56_vocab" -> (q56Vocab _),
    "q58_tfidf" -> (q58Tfidf _))

  val oracles: Map[String, String] = Map(
    "q183_tokenizer_fertility" -> q183Sql,
    "q181_unigram_segment" -> q181Sql,
    "q173_bpe_segment" -> q173Sql,
    "q168_distinct_n" -> q168Sql,
    "q165_log_odds_terms" -> q165Sql,
    "q161_bpe_merges" -> q161Sql,
    "q143_stupid_backoff" -> q143Sql,
    "q150_wordpiece" -> q150Sql,
    "q151_zipf_fit" -> q151Sql,
    "q157_source_kl" -> q157Sql,
    "q138_ccnet_buckets" -> q138Sql,
    "q136_vocab_coverage" -> q136Sql,
    "q128_pmi_collocations" -> q128Sql,
    "q130_char_entropy" -> q130Sql,
    "q120_bpe_pairs" -> q120Sql,
    "q97_oov_rate" -> q97Sql,
    "q87_bigram_coherence" -> q87Sql,
    "q30_text_stats" -> q30Sql,
    "q31_lang_id" -> q31Sql,
    "q32_fingerprint" -> q32Sql,
    "q37_repetition" -> q37Sql,
    "q56_vocab" -> q56Sql,
    "q58_tfidf" -> q58Sql)
}
