package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dedup, TextFunctions}

/** Gate coverage for the corpus-curation operator family over `documents`.
  *
  * Every randomized choice (split, sample, shuffle) is a salted md5 hash,
  * so each oracle replays the identical bytes in DuckDB and the compare is
  * exact. Where the corpus lacks a phenomenon (PII strings, incoming
  * duplicates), the query synthesizes it deterministically inside the plan
  * — same device as q33 — and the oracle does the identical construction.
  */
object CurationQueries {

  /** PII redaction audit: inject deterministic emails/IPs/phone numbers,
    * then count matches per class and docs changed by redaction. */
  def q38PiiRedact(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val t = concat(
      col("text"),
      when(id % 3 === 0,
        concat(lit(" contact user"), id.cast("string"), lit("@example.com")))
        .otherwise(lit("")),
      when(id % 7 === 0,
        concat(lit(" from 10.0."), (id % 256).cast("string"), lit("."),
          (id % 100).cast("string"))).otherwise(lit("")),
      when(id % 5 === 0,
        concat(lit(" call 555-"), (id % 900 + 100).cast("string"), lit("-"),
          (id % 9000 + 1000).cast("string"))).otherwise(lit("")))
    Tables.documents(s, d)
      .select(col("source"), t.as("t"))
      .groupBy(col("source"))
      .agg(
        sum(Curation.emailCount(col("t"))).as("n_emails"),
        sum(Curation.ipv4Count(col("t"))).as("n_ips"),
        sum(Curation.phoneCount(col("t"))).as("n_phones"),
        sum(when(Curation.redactPii(col("t")) =!= col("t"), 1L).otherwise(0L))
          .as("n_redacted"))
      .orderBy(col("source"))
  }

  val q38Sql: String =
    s"""WITH pii AS (
      |  SELECT source, text
      |    || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
      |    || CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END
      |    || CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-' || CAST(doc_id % 9000 + 1000 AS VARCHAR) ELSE '' END AS t
      |  FROM documents)
      |SELECT source,
      |  CAST(sum(len(regexp_extract_all(t, '${Curation.EmailPattern}'))) AS BIGINT) AS n_emails,
      |  CAST(sum(len(regexp_extract_all(t, '${Curation.Ipv4Pattern}'))) AS BIGINT) AS n_ips,
      |  CAST(sum(len(regexp_extract_all(t, '${Curation.PhonePattern}'))) AS BIGINT) AS n_phones,
      |  CAST(sum(CASE WHEN regexp_replace(regexp_replace(regexp_replace(t,
      |      '${Curation.EmailPattern}', '<EMAIL>', 'g'),
      |      '${Curation.Ipv4Pattern}', '<IP>', 'g'),
      |      '${Curation.PhonePattern}', '<PHONE>', 'g') <> t THEN 1 ELSE 0 END) AS BIGINT) AS n_redacted
      |FROM pii GROUP BY source ORDER BY source""".stripMargin

  /** Deterministic 98/1/1 train/val/test split by hashed doc id. */
  def q39TrainSplit(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(Curation.splitAssign(col("doc_id")).as("split"),
        col("lang"), col("n_chars"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("lang")).as("n_langs"))
      .orderBy(col("split"))

  val q39Sql: String =
    """SELECT CASE WHEN b < 98 THEN 'train' WHEN b < 99 THEN 'val' ELSE 'test' END AS split,
      |  count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
      |  count(DISTINCT lang) AS n_langs
      |FROM (SELECT CAST('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS b,
      |             lang, n_chars FROM documents)
      |GROUP BY 1 ORDER BY split""".stripMargin

  /** Sequence packing into 2048-token bins via the distributed exclusive
    * prefix sum (never a single-partition window). */
  def q44PackSequences(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("tok"))
    Curation.packSequences(toks, "doc_id", "tok", 2048L)
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("bin_tokens"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .orderBy(col("bin"))
  }

  val q44Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS tok
      |  FROM documents),
      |packed AS (
      |  SELECT doc_id, tok,
      |    COALESCE(sum(tok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 2048 AS bin
      |  FROM toks)
      |SELECT CAST(bin AS BIGINT) AS bin, count(*) AS n_docs,
      |  CAST(sum(tok) AS BIGINT) AS bin_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM packed GROUP BY bin ORDER BY bin""".stripMargin

  /** Domain mixing: upsample low-resource languages by integer weights
    * (en×1, es×2, fr×2, de×3, zh×4) via row replication. */
  def q45DomainMix(s: SparkSession, d: String): DataFrame =
    Curation.replicate(Tables.documents(s, d),
        expr("CASE WHEN lang='en' THEN 1 WHEN lang='es' THEN 2 " +
          "WHEN lang='fr' THEN 2 WHEN lang='de' THEN 3 ELSE 4 END"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("doc_id")).as("n_docs"),
        max(col("copy")).cast("long").as("max_copy"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("lang"))

  val q45Sql: String =
    """SELECT lang, count(*) AS n_rows, count(DISTINCT doc_id) AS n_docs,
      |  CAST(max(i) AS BIGINT) AS max_copy, CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM documents,
      |  UNNEST(generate_series(1, CASE WHEN lang='en' THEN 1 WHEN lang='es' THEN 2
      |    WHEN lang='fr' THEN 2 WHEN lang='de' THEN 3 ELSE 4 END)) AS t(i)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Temperature-scaled source mixing under a 500k-token budget
    * (T = 0.7 sharpens toward the bigger sources): the multi-corpus
    * data-mixing step, deterministic by hash-priority admission.
    * Aggregated per source so the oracle hash-compares the realized
    * mixture (doc counts + token sums), which pins quota computation,
    * ordering, and the cumulative-sum admission all at once. */
  def q123MixtureSample(s: SparkSession, d: String): DataFrame =
    Curation.temperatureMixtureSample(
        Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars")),
        "doc_id", "source", "n_chars", budget = 500000L, temperature = 0.7)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"))

  val q123Sql: String =
    """WITH stats AS (
      |  SELECT source, CAST(SUM(n_chars) AS DOUBLE) AS toks FROM documents GROUP BY source),
      |w AS (
      |  SELECT source, POWER(toks / (SELECT SUM(toks) FROM stats), 1.0/0.7) AS wt FROM stats),
      |q AS (
      |  SELECT source,
      |    CAST(FLOOR(500000.0 * ROUND(wt / (SELECT SUM(wt) FROM w), 12)) AS BIGINT) AS quota
      |  FROM w),
      |c AS (
      |  SELECT doc_id, source, n_chars,
      |    SUM(n_chars) OVER (PARTITION BY source
      |      ORDER BY ((doc_id % 1048573) * 2654435761) % 2147483648, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM documents)
      |SELECT c.source, COUNT(*) AS n_docs, CAST(SUM(c.n_chars) AS BIGINT) AS sum_chars
      |FROM c JOIN q ON c.source = q.source
      |WHERE c.cum <= q.quota
      |GROUP BY c.source ORDER BY c.source""".stripMargin

  /** Stratified deterministic sampling: keep 10% of English, 50% of the
    * rest, by salted hash of the doc id — reproducible, join-free. */
  def q46StratifiedSample(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("keep", Curation.sampleKeep(col("doc_id"),
        expr("CASE WHEN lang='en' THEN 100000 ELSE 500000 END")))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("keep"), col("n_chars")).otherwise(0L)).as("kept_chars"))
      .orderBy(col("lang"))

  val q46Sql: String =
    """SELECT lang, count(*) AS n_total,
      |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  CAST(sum(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
      |FROM (SELECT lang, n_chars,
      |  CAST('0x' || substr(md5('sample:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000000
      |    < CASE WHEN lang='en' THEN 100000 ELSE 500000 END AS keep
      |  FROM documents)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Quality-proportional (weighted) sampling: each doc's keep rate is
    * floor(quality × 0.8 × 1e6) ppm, so high-quality docs survive more
    * often — the computed-ppm path of [[Curation.sampleKeep]], still
    * join-free and reproducible. The keep threshold uses the UNROUNDED
    * score ([[TextFunctions.qualityScoreRaw]]): raw doubles are
    * bit-identical across engines, while round(…,6) half-cases can
    * diverge and a divergence amplified through floor()+comparison would
    * flip row membership, not just a displayed cell. */
  def q47WeightedSample(s: SparkSession, d: String): DataFrame = {
    val scored = TextFunctions.widen(Tables.documents(s, d))
      .select(col("doc_id"), col("lang"),
        TextFunctions.qualityScoreRaw(col("text")).as("qraw"))
    scored
      .withColumn("keep", Curation.sampleKeep(col("doc_id"),
        floor(col("qraw") * 800000).cast("long"), "wsample"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
        round(avg(when(col("keep"), col("qraw"))), 6).as("kept_avg_q"))
      .orderBy(col("lang"))
  }

  val q47Sql: String =
    s"""WITH scored AS (
      |  SELECT doc_id, lang,
      |    (${TextFunctions.qualityRawSql}) AS qraw
      |  FROM documents),
      |k AS (
      |  SELECT lang, qraw,
      |    CAST('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000000
      |      < CAST(floor(qraw * 800000) AS BIGINT) AS keep
      |  FROM scored)
      |SELECT lang, count(*) AS n_total,
      |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  round(avg(CASE WHEN keep THEN qraw END), 6) AS kept_avg_q
      |FROM k GROUP BY lang ORDER BY lang""".stripMargin

  /** Length-grouped batching: 32-doc batches over (token count, id)
    * order, with the padding-waste accounting that motivates the
    * operator ([[Curation.lengthGroupedBatches]]). */
  def q115LengthBatching(s: SparkSession, d: String): DataFrame = {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), TextFunctions.tokenCount(col("text")).as("tok"))
    Curation.lengthGroupedBatches(toks, "doc_id", "tok", batchSize = 32)
      .orderBy(col("batch"))
  }

  val q115Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS tok
      |  FROM documents),
      |pos AS (
      |  SELECT tok,
      |    (row_number() OVER (ORDER BY tok, doc_id) - 1) // 32 AS batch
      |  FROM toks)
      |SELECT CAST(batch AS BIGINT) AS batch, count(*) AS n_docs,
      |  min(tok) AS min_tok, max(tok) AS max_tok,
      |  CAST(sum(tok) AS BIGINT) AS sum_tok,
      |  CAST(max(tok) * count(*) - sum(tok) AS BIGINT) AS padding_waste
      |FROM pos GROUP BY batch ORDER BY batch""".stripMargin

  /** Weighted sampling WITHOUT replacement: exactly 5 docs per language,
    * weight-proportional to n_chars, via the deterministic
    * Efraimidis–Spirakis key ([[Curation.weightedSampleTopK]]). Unlike
    * Bernoulli q46/q47 the sample size is exact, and the oracle replays
    * the identical hash→jitter-key arithmetic. */
  def q109WeightedTopK(s: SparkSession, d: String): DataFrame =
    Curation.weightedSampleTopK(
        Tables.documents(s, d).select(col("doc_id"), col("lang"), col("n_chars")),
        "doc_id", "lang", col("n_chars"), k = 5)
      .select(col("lang"), col("pos"), col("doc_id"),
        round(col("wkey") * 1000000.0, 6).as("wkey_ppm"))
      .orderBy(col("lang"), col("pos"))

  val q109Sql: String =
    """WITH keyed AS (
      |  SELECT lang, doc_id,
      |    -ln((CAST('0x' || substr(md5('wtopk:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000000 + 0.5) / 1000000.0)
      |      / n_chars AS wkey
      |  FROM documents)
      |SELECT lang,
      |  CAST(row_number() OVER (PARTITION BY lang ORDER BY wkey, doc_id) AS BIGINT) AS pos,
      |  doc_id, round(wkey * 1000000.0, 6) AS wkey_ppm
      |FROM keyed QUALIFY pos <= 5 ORDER BY lang, pos""".stripMargin

  /** Deterministic corpus shuffle: first 30 docs in salted-hash order.
    * At scale the full shuffle is `orderBy(shuffleKey)` (a range-
    * partitioned sort); the gate pins the key order via global top-30. */
  def q49CorpusShuffle(s: SparkSession, d: String): DataFrame = {
    val keyed = Tables.documents(s, d)
      .select(col("doc_id"), Curation.shuffleKey(col("doc_id")).as("shuffle_key"))
      .orderBy(col("shuffle_key")).limit(30)
    keyed.select(
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("shuffle_key"))).cast("long").as("pos"),
      col("doc_id"), col("shuffle_key"))
  }

  val q49Sql: String =
    """SELECT CAST(row_number() OVER (ORDER BY shuffle_key) AS BIGINT) AS pos,
      |  doc_id, shuffle_key
      |FROM (SELECT doc_id, md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      |      FROM documents ORDER BY shuffle_key LIMIT 30) ORDER BY pos""".stripMargin

  /** Incremental dedup: a synthetic incoming batch (every doc_id % 9,
    * re-keyed; the even half mutated by a suffix) deduped against the
    * existing corpus by content fingerprint — unmutated docs drop. */
  def q53IncrementalDedup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val incoming = docs.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        when(col("doc_id") % 2 === 0, concat(col("text"), lit(" fresh suffix")))
          .otherwise(col("text")).as("text"),
        col("source"))
    val corpusFp = docs
      .select(TextFunctions.fingerprint(col("text")).as("fp")).distinct()
    incoming
      .withColumn("fp", TextFunctions.fingerprint(col("text")))
      .join(corpusFp.withColumn("dup", lit(1L)), Seq("fp"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_incoming"),
        sum(coalesce(col("dup"), lit(0L))).as("n_dup"),
        sum(when(col("dup").isNull, 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("source"))
  }

  val q53Sql: String =
    """WITH incoming AS (
      |  SELECT doc_id + 2000000 AS doc_id,
      |    CASE WHEN doc_id % 2 = 0 THEN text || ' fresh suffix' ELSE text END AS text,
      |    source
      |  FROM documents WHERE doc_id % 9 = 0),
      |corpus_fp AS (
      |  SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      |  FROM documents)
      |SELECT source, count(*) AS n_incoming,
      |  CAST(sum(CASE WHEN fp IN (SELECT fp FROM corpus_fp) THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
      |  CAST(sum(CASE WHEN fp IN (SELECT fp FROM corpus_fp) THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
      |FROM (SELECT source, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      |      FROM incoming)
      |GROUP BY source ORDER BY source""".stripMargin

  /** Train/test decontamination: corpus docs sharing any word 5-gram with
    * the benchmark set (doc_id < 10), counted per source. */
  def q54Decontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val bench = docs.filter(col("doc_id") < 10)
    val corpus = docs.filter(col("doc_id") >= 10)
    val flagged = Curation.contaminatedIds(corpus, bench, "doc_id", "text", k = 5)
    corpus
      .join(flagged.withColumn("hit", lit(1L)), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
      .orderBy(col("source"))
  }

  val q54Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 5 THEN
      |      list_transform(range(1, greatest(len(tk)-4, 1)+1),
      |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3] || ' ' || tk[i+4])
      |    ELSE [array_to_string(tk, ' ')] END) AS g
      |  FROM toks),
      |flagged AS (
      |  SELECT DISTINCT doc_id FROM grams
      |  WHERE doc_id >= 10 AND g IN (SELECT g FROM grams WHERE doc_id < 10))
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM flagged) THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
      |FROM documents WHERE doc_id >= 10
      |GROUP BY source ORDER BY source""".stripMargin

  /** Decontamination through the Bloom-bucket prefilter (doc_id < 15
    * benchmark, word 4-grams): must agree with the exact oracle — the
    * prefilter is a pure pre-pruning step, so the oracle needs no notion
    * of it. Distinct split/k from q54 so the two gates don't share a
    * result by accident. */
  def q86BloomDecontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val bench = docs.filter(col("doc_id") < 15)
    val corpus = docs.filter(col("doc_id") >= 15)
    val flagged = Curation.contaminatedIdsBloom(corpus, bench, "doc_id",
      "text", k = 4, bits = 1 << 16)
    corpus
      .join(flagged.withColumn("hit", lit(1L)), Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"))
      .orderBy(col("source"))
  }

  val q86Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS tk
      |  FROM documents),
      |grams AS (
      |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 4 THEN
      |      list_transform(range(1, greatest(len(tk)-3, 1)+1),
      |        i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])
      |    ELSE [array_to_string(tk, ' ')] END) AS g
      |  FROM toks),
      |flagged AS (
      |  SELECT DISTINCT doc_id FROM grams
      |  WHERE doc_id >= 15 AND g IN (SELECT g FROM grams WHERE doc_id < 15))
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM flagged) THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated
      |FROM documents WHERE doc_id >= 15
      |GROUP BY source ORDER BY source""".stripMargin

  /** Epoch shuffle + balanced 16-shard assignment: the full per-document
    * (shard, pos) map for seed 7 — every row's permutation rank and
    * round-robin shard is hash-pinned, so the bucketed prefix-sum rank,
    * the 60-bit key-prefix ordering, and the exact shard balance are all
    * oracle-checked at once (the oracle's row_number replays the same
    * (key-prefix, id) order; shard sizes differ by ≤ 1 by construction). */
  def q124EpochShard(s: SparkSession, d: String): DataFrame =
    Curation.epochShardAssign(
        Tables.documents(s, d).select(col("doc_id")),
        "doc_id", seed = 7L, numShards = 16)
      .orderBy(col("doc_id"))

  val q124Sql: String =
    """WITH keyed AS (
      |  SELECT doc_id, md5('epoch7:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      |  FROM documents
      |), r AS (
      |  SELECT doc_id, shuffle_key,
      |    CAST(row_number() OVER (ORDER BY substr(shuffle_key, 1, 15), doc_id) - 1 AS BIGINT) AS rank0
      |  FROM keyed)
      |SELECT doc_id, shuffle_key, rank0 % 16 AS shard, rank0 // 16 AS pos
      |FROM r ORDER BY doc_id""".stripMargin

  /** DSIR importance log-weights ([[graft.ops.Curation.dsirLogWeights]]):
    * target = the corpus's English slice, features = md5-bucketed word
    * bigrams (1024 buckets), Laplace-smoothed log-ratio summed per doc
    * through the decimal(27,15) rule. English docs must score positive on
    * average and the rest negative — the gate pins every doc's weight, so
    * the bucketing hash, both smoothed distributions, and the sum order
    * discipline are all on the hook. */
  def q129DsirWeights(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Curation.dsirLogWeights(docs,
        docs.filter(col("lang") === "en").select(col("doc_id")),
        "doc_id", "text", buckets = 1024)
      .select(col("doc_id"), col("n_feats"),
        round(col("log_weight"), 6).as("log_weight"))
      .orderBy(col("doc_id"))
  }

  val q129Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, lang, regexp_split_to_array(lower(trim(text)), '\s+') AS a
      |  FROM documents),
      |bg AS (
      |  SELECT doc_id, lang, a[i] || ' ' || a[i+1] AS f
      |  FROM toks, UNNEST(range(1, len(a))) AS t(i)
      |  WHERE len(a) >= 2),
      |db AS (
      |  SELECT doc_id, lang,
      |    CAST('0x' || substr(md5('dsir:' || f), 1, 8) AS BIGINT) % 1024 AS b,
      |    count(*) AS c
      |  FROM bg GROUP BY doc_id, lang, b),
      |raw AS (SELECT b, sum(c) AS cr FROM db GROUP BY b),
      |tgt AS (SELECT b, sum(c) AS ct FROM db WHERE lang = 'en' GROUP BY b),
      |nr AS (SELECT sum(cr) AS nr FROM raw),
      |nt AS (SELECT sum(ct) AS nt FROM tgt),
      |ratio AS (
      |  SELECT b, ln((COALESCE(ct, 0) + 1.0) / (nt + 1024.0))
      |          - ln((cr + 1.0) / (nr + 1024.0)) AS llr
      |  FROM raw LEFT JOIN tgt USING (b), nr, nt)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_feats,
      |  round(CAST(sum(CAST(c * llr AS DECIMAL(27,15))) AS DOUBLE), 6) AS log_weight
      |FROM db JOIN ratio USING (b)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Per-source cap + round-robin interleave ([[Curation
    * .sourceCapInterleave]]): cap 12 per source, seed 7. The full
    * (pos, source, doc_id, rk) layout is hash-pinned, so the seeded
    * per-source shuffle, the WindowGroupLimit cap, and the prefix-sum
    * round-robin position all replay against the oracle's windows. */
  def q140SourceCap(s: SparkSession, d: String): DataFrame =
    Curation.sourceCapInterleave(
        Tables.documents(s, d).select(col("doc_id"), col("source")),
        "doc_id", "source", k = 12, seed = 7L)
      .orderBy(col("pos"))

  val q140Sql: String =
    """WITH keyed AS (
      |  SELECT doc_id, source,
      |    md5('cap7:' || CAST(doc_id AS VARCHAR)) AS sk
      |  FROM documents),
      |capped AS (
      |  SELECT doc_id, source,
      |    CAST(row_number() OVER (PARTITION BY source ORDER BY sk, doc_id)
      |      AS BIGINT) AS rk
      |  FROM keyed QUALIFY rk <= 12)
      |SELECT CAST(row_number() OVER (ORDER BY rk, source) - 1 AS BIGINT) AS pos,
      |  source, doc_id, rk
      |FROM capped ORDER BY pos""".stripMargin

  /** Cross-source score calibration ([[graft.ops.Profiling
    * .calibrateScores]]): every doc's within-source percent-rank and
    * z-score of n_chars are hash-pinned — the exact-decimal-sums
    * variance, the closed-form double arithmetic, and the tie-broken
    * total order are all on the hook. */
  def q141CalibrateScores(s: SparkSession, d: String): DataFrame =
    graft.ops.Profiling.calibrateScores(
        Tables.documents(s, d).select(col("doc_id"), col("source"), col("n_chars")),
        "doc_id", "source", "n_chars")
      .orderBy(col("doc_id"))

  val q141Sql: String =
    """WITH stats AS (
      |  SELECT source, count(*) AS n,
      |    sum(CAST(n_chars AS DECIMAL(38,0))) AS s,
      |    sum(CAST(n_chars * n_chars AS DECIMAL(38,0))) AS ss
      |  FROM documents GROUP BY source)
      |SELECT doc_id, d.source, n_chars,
      |  round(percent_rank() OVER (PARTITION BY d.source
      |    ORDER BY n_chars, doc_id), 6) AS pr,
      |  CASE WHEN n >= 2 AND
      |      (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
      |        / (n - 1) > 0
      |    THEN round((n_chars - CAST(s AS DOUBLE) / n) /
      |      sqrt((CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
      |        / (n - 1)), 6) END AS z
      |FROM documents d JOIN stats USING (source)
      |ORDER BY doc_id""".stripMargin

  /** Hashed-feature linear classifier inference
    * ([[graft.ops.Curation.hashedLinearScore]]): every doc's token
    * count, mean-bucket-weight logit, logistic probability, and keep
    * flag are hash-pinned. The oracle regenerates the identical hashed
    * model (md5 bucket hash + md5-parity weights — the q127 device) in
    * SQL, so the feature hashing, the decimal-exact weight sum, and the
    * sigmoid must all replay. The fastText-style quality-filter scoring
    * pass, gated end to end. */
  def q162QualityClassifier(s: SparkSession, d: String): DataFrame =
    graft.ops.Curation.hashedLinearScore(
        graft.ops.TextFunctions.widen(Tables.documents(s, d)),
        "doc_id", "text")
      .orderBy(col("doc_id"))

  /** DuckDB CTE chain regenerating the q162 hashed-classifier score per
    * doc (`pd(doc_id, n_tokens, logit)`) — shared by the q162 gate and
    * the q188/q190 classifier-evaluation oracles. */
  private val clfScoreCtes: String =
    """toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
      |  FROM documents WHERE doc_id IS NOT NULL),
      |tw AS (
      |  SELECT doc_id,
      |    CAST(round(CAST('0x' || substr(md5('qclf:' ||
      |        CAST(CAST('0x' || substr(md5(t), 1, 4) AS BIGINT) % 64 AS VARCHAR)),
      |        1, 2) AS BIGINT) / 127.5 - 1.0, 6) AS DECIMAL(27,15)) AS w
      |  FROM toks WHERE t <> ''),
      |pd0 AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |    CAST(sum(w) * 1000000 AS BIGINT) AS si
      |  FROM tw GROUP BY doc_id),
      |pd AS (
      |  SELECT doc_id, n_tokens,
      |    (CASE WHEN si >= 0
      |       THEN (si * 2 + n_tokens) // (2 * n_tokens)
      |       ELSE -((-si * 2 + n_tokens) // (2 * n_tokens)) END)
      |      / 1000000.0 AS logit
      |  FROM pd0)""".stripMargin

  val q162Sql: String =
    s"""WITH $clfScoreCtes
      |SELECT doc_id, n_tokens, logit,
      |  round(1.0 / (1.0 + exp(-logit)), 6) AS prob,
      |  round(1.0 / (1.0 + exp(-logit)), 6) >= 0.5 AS is_positive
      |FROM pd ORDER BY doc_id""".stripMargin

  /** Deterministic MLM masking plan
    * ([[graft.ops.Curation.mlmMaskingPlan]]): each doc's selected /
    * [MASK] / random / keep counts under the hash-derived 15% + 80-10-10
    * recipe, all integer arithmetic and all hash-pinned — the oracle
    * replays the md5 draws per (doc, position), so a single flipped
    * masking decision anywhere in the corpus fails the gate. */
  def q169MlmPlan(s: SparkSession, d: String): DataFrame =
    graft.ops.Curation.mlmMaskingPlan(
        graft.ops.TextFunctions.widen(Tables.documents(s, d)),
        "doc_id", "text")
      .orderBy(col("doc_id"))

  val q169Sql: String =
    """WITH base AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS a
      |  FROM documents WHERE doc_id IS NOT NULL),
      |toks AS (
      |  SELECT doc_id, a[CAST(p AS INT)] AS t, CAST(p - 1 AS BIGINT) AS p
      |  FROM base, UNNEST(range(1, len(a) + 1)) AS u(p)),
      |draws AS (
      |  SELECT doc_id,
      |    CAST('0x' || substr(md5('mlm:' || CAST(doc_id AS VARCHAR) || ':' ||
      |      CAST(p AS VARCHAR)), 1, 4) AS BIGINT) % 100 < 15 AS sel,
      |    CAST('0x' || substr(md5('mlm:' || CAST(doc_id AS VARCHAR) || ':' ||
      |      CAST(p AS VARCHAR)), 5, 2) AS BIGINT) % 10 AS act
      |  FROM toks WHERE t <> '')
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
      |  CAST(sum(CASE WHEN sel THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
      |  CAST(sum(CASE WHEN sel AND act < 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_mask,
      |  CAST(sum(CASE WHEN sel AND act = 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_random,
      |  CAST(sum(CASE WHEN sel AND act = 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
      |FROM draws GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Horvitz–Thompson corpus accounting from the q47 weighted sample
    * ([[graft.ops.Curation.horvitzThompson]]): per-language true and
    * HT-estimated row counts and token totals, all hash-pinned — the
    * oracle replays the hash draw, the 12-dp weight terms, and the
    * decimal sums, so the estimator itself (not just the sample) is
    * gated. The answer to "how many tokens does the sampled corpus
    * represent" that every mixture plan consumes. */
  def q175HtEstimate(s: SparkSession, d: String): DataFrame = {
    val docs = graft.ops.TextFunctions.widen(Tables.documents(s, d))
      .select(col("doc_id"), col("lang"),
        TextFunctions.qualityScoreRaw(col("text")).as("qraw"),
        TextFunctions.tokenCount(col("text")).as("toks"))
    graft.ops.Curation.horvitzThompson(docs, "doc_id", "lang",
        floor(col("qraw") * 800000).cast("long"), col("toks"), "wsample")
      .orderBy(col("lang"))
  }

  val q175Sql: String =
    s"""WITH scored AS (
      |  SELECT doc_id, lang,
      |    (${TextFunctions.qualityRawSql}) AS qraw,
      |    CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS toks
      |  FROM documents WHERE doc_id IS NOT NULL),
      |framed AS (
      |  SELECT lang, toks,
      |    CAST(floor(qraw * 800000) AS BIGINT) AS ppm,
      |    CAST('0x' || substr(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000000
      |      < CAST(floor(qraw * 800000) AS BIGINT) AS keep
      |  FROM scored
      |  WHERE CAST(floor(qraw * 800000) AS BIGINT) > 0)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_true,
      |  round(CAST(sum(CASE WHEN keep THEN
      |    CAST(round(1000000.0 / ppm, 12) AS DECIMAL(27,15)) END) AS DOUBLE), 4) AS n_est,
      |  CAST(sum(toks) AS BIGINT) AS y_true,
      |  round(CAST(sum(CASE WHEN keep THEN
      |    CAST(round(toks * 1000000.0 / ppm, 12) AS DECIMAL(27,15)) END) AS DOUBLE), 4) AS y_est
      |FROM framed GROUP BY lang ORDER BY lang""".stripMargin

  /** Cohen's kappa over a deterministic double-rating
    * ([[graft.ops.Profiling.cohensKappa]]): rater A buckets each doc by
    * the quality score (keep ≥ 0.6 > mid ≥ 0.4 > drop), rater B is A
    * with ~25% of docs md5-chosen and cyclically mis-rated — the q176
    * judgment device standing in for a second human annotator. The
    * annotation-QA gate every labeling campaign runs: raw agreement,
    * chance agreement from the marginals, and the chance-corrected
    * kappa, all ratios of exact integer counts and hash-pinned. */
  def q187CohensKappa(s: SparkSession, d: String): DataFrame = {
    val qraw = TextFunctions.qualityScoreRaw(col("text"))
    val a = when(qraw >= 0.6, lit("keep"))
      .when(qraw >= 0.4, lit("mid")).otherwise(lit("drop"))
    val flip = pmod(conv(substring(md5(concat(lit("rate:"),
      col("doc_id").cast("string"))), 1, 1), 16, 10).cast("long"),
      lit(4L)) === 0L
    val rated = graft.ops.TextFunctions.widen(Tables.documents(s, d))
      .select(a.as("__ra"), flip.as("__flip"))
      .select(col("__ra"),
        when(!col("__flip"), col("__ra"))
          .when(col("__ra") === "keep", lit("mid"))
          .when(col("__ra") === "mid", lit("drop"))
          .otherwise(lit("keep")).as("__rb"))
    graft.ops.Profiling.cohensKappa(rated, "__ra", "__rb")
  }

  val q187Sql: String =
    s"""WITH r AS (
      |  SELECT CASE WHEN q >= 0.6 THEN 'keep'
      |              WHEN q >= 0.4 THEN 'mid' ELSE 'drop' END AS ra,
      |    CAST('0x' || substr(md5('rate:' || CAST(doc_id AS VARCHAR)), 1, 1)
      |      AS BIGINT) % 4 = 0 AS flip
      |  FROM (SELECT doc_id, (${TextFunctions.qualityRawSql}) AS q
      |        FROM documents)),
      |p AS (
      |  SELECT ra,
      |    CASE WHEN NOT flip THEN ra
      |         WHEN ra = 'keep' THEN 'mid'
      |         WHEN ra = 'mid' THEN 'drop' ELSE 'keep' END AS rb
      |  FROM r),
      |t AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN ra = rb THEN 1 ELSE 0 END) AS BIGINT) AS agree
      |  FROM p),
      |ma AS (SELECT ra AS c, count(*) AS na FROM p GROUP BY 1),
      |mb AS (SELECT rb AS c, count(*) AS nb FROM p GROUP BY 1),
      |x AS (
      |  SELECT CAST(sum(coalesce(na, 0) * coalesce(nb, 0)) AS BIGINT) AS sx
      |  FROM ma FULL OUTER JOIN mb USING (c))
      |SELECT n, agree,
      |  round(CAST(agree AS DOUBLE) / n, 6) AS po,
      |  round(CAST(sx AS DOUBLE) / (n*n), 6) AS pe,
      |  CASE WHEN CAST(sx AS DOUBLE) / (n*n) < 1.0
      |    THEN round((CAST(agree AS DOUBLE) / n - CAST(sx AS DOUBLE) / (n*n))
      |      / (CAST(1.0 AS DOUBLE) - CAST(sx AS DOUBLE) / (n*n)), 6) END AS kappa
      |FROM t CROSS JOIN x""".stripMargin

  /** Deterministic ground-truth label shared by the classifier-eval
    * gates (q188/q190): the quality-threshold keep decision the q162
    * hashed classifier is meant to approximate. */
  private def qualityLabel(s: SparkSession, d: String): DataFrame =
    TextFunctions.widen(Tables.documents(s, d))
      .select(col("doc_id"),
        (TextFunctions.qualityScoreRaw(col("text")) >= 0.6).as("__y"))

  private val qualityLabelSql: String =
    s"lbl AS (SELECT doc_id, (${TextFunctions.qualityRawSql}) >= 0.6 AS y\n" +
      "  FROM documents)"

  /** Expected calibration error of the q162 classifier
    * ([[graft.ops.Profiling.calibrationError]]) against the
    * quality-threshold label: per confidence decile the stated
    * confidence, the realized positive rate, the gap, and the
    * count-weighted ECE — the model-card row that decides whether the
    * classifier's probabilities can be trusted as sampling weights.
    * Every bin statistic and the summary are hash-pinned. */
  def q188CalibrationEce(s: SparkSession, d: String): DataFrame = {
    val scored = Curation.hashedLinearScore(
        TextFunctions.widen(Tables.documents(s, d)), "doc_id", "text")
      .select(col("doc_id"), col("prob"))
    graft.ops.Profiling.calibrationError(
        scored.join(qualityLabel(s, d), Seq("doc_id")), "prob", "__y")
      .orderBy(col("bin"))
  }

  val q188Sql: String =
    s"""WITH $clfScoreCtes,
      |$qualityLabelSql,
      |j AS (
      |  SELECT round(1.0 / (1.0 + exp(-logit)), 6) AS prob, y
      |  FROM pd JOIN lbl USING (doc_id)),
      |b AS (
      |  SELECT CAST(least(greatest(floor(prob * 10), 0), 9) AS BIGINT) AS bin,
      |    prob, y
      |  FROM j),
      |per AS (
      |  SELECT bin, CAST(count(*) AS BIGINT) AS n,
      |    sum(CAST(prob AS DECIMAL(27,15))) AS sc,
      |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS np
      |  FROM b GROUP BY bin),
      |g AS (
      |  SELECT bin, n, sc, np,
      |    abs(CAST(sc AS DOUBLE) / n - CAST(np AS DOUBLE) / n) AS gap
      |  FROM per),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM g),
      |e AS (
      |  SELECT round(CAST(sum(CAST(round(n * gap / nn, 12)
      |    AS DECIMAL(27,15))) AS DOUBLE), 6) AS ece
      |  FROM g CROSS JOIN t)
      |SELECT bin, n, round(CAST(sc AS DOUBLE) / n, 6) AS avg_conf,
      |  round(CAST(np AS DOUBLE) / n, 6) AS frac_pos,
      |  round(gap, 6) AS gap, ece
      |FROM g CROSS JOIN e ORDER BY bin""".stripMargin

  /** Per-source population stability index
    * ([[graft.ops.Profiling.psi]]) of the quality score against the
    * whole corpus — the standing drift alarm on every curation signal:
    * a source whose score distribution departs from the population
    * lights up long before a mean shifts. Pseudo-counted bins, decimal
    * term sums, every per-source PSI hash-pinned. */
  def q189SourcePsi(s: SparkSession, d: String): DataFrame =
    graft.ops.Profiling.psi(
        TextFunctions.widen(Tables.documents(s, d))
          .select(col("source"),
            TextFunctions.qualityScoreRaw(col("text")).as("__q")),
        "source", "__q")
      .orderBy(col("source"))

  val q189Sql: String =
    s"""WITH b AS (
      |  SELECT source,
      |    CAST(least(greatest(floor(q * 10), 0), 9) AS BIGINT) AS bin
      |  FROM (SELECT source, (${TextFunctions.qualityRawSql}) AS q
      |        FROM documents WHERE source IS NOT NULL)),
      |c AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS c
      |  FROM b GROUP BY 1, 2),
      |st AS (SELECT source, CAST(sum(c) AS BIGINT) AS ns FROM c GROUP BY 1),
      |gl0 AS (SELECT bin, CAST(sum(c) AS BIGINT) AS gc FROM c GROUP BY 1),
      |gl AS (
      |  SELECT CAST(i AS BIGINT) AS bin, coalesce(gc, CAST(0 AS BIGINT)) AS gc
      |  FROM range(0, 10) t(i) LEFT JOIN gl0 ON gl0.bin = i),
      |t AS (SELECT CAST(sum(gc) AS BIGINT) AS nn FROM gl),
      |dense AS (
      |  SELECT st.source, st.ns, gl.gc, t.nn,
      |    coalesce(c.c, 0) AS cc
      |  FROM st CROSS JOIN gl CROSS JOIN t
      |  LEFT JOIN c ON c.source = st.source AND c.bin = gl.bin),
      |terms AS (
      |  SELECT source, ns,
      |    CAST(round(
      |      ((CAST(cc AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
      |         (CAST(ns AS DOUBLE) + CAST(5.0 AS DOUBLE))
      |       - (CAST(gc AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
      |         (CAST(nn AS DOUBLE) + CAST(5.0 AS DOUBLE)))
      |      * ln(((CAST(cc AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
      |         (CAST(ns AS DOUBLE) + CAST(5.0 AS DOUBLE)))
      |        / ((CAST(gc AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
      |         (CAST(nn AS DOUBLE) + CAST(5.0 AS DOUBLE)))), 12)
      |      AS DECIMAL(27,15)) AS tm
      |  FROM dense)
      |SELECT source, max(ns) AS n,
      |  round(CAST(sum(tm) AS DOUBLE), 6) AS psi
      |FROM terms GROUP BY source ORDER BY source""".stripMargin

  /** ROC AUC of the q162 classifier's logit against the
    * quality-threshold label ([[graft.ops.Profiling.rocAuc]]): the
    * tie-corrected Mann–Whitney statistic, integer-exact end to end —
    * the threshold-free companion to q188's calibration row. */
  def q190ClassifierAuc(s: SparkSession, d: String): DataFrame = {
    val scored = Curation.hashedLinearScore(
        TextFunctions.widen(Tables.documents(s, d)), "doc_id", "text")
      .select(col("doc_id"), col("logit"))
    graft.ops.Profiling.rocAuc(
      scored.join(qualityLabel(s, d), Seq("doc_id")), "logit", "__y")
  }

  val q190Sql: String =
    s"""WITH $clfScoreCtes,
      |$qualityLabelSql,
      |sc AS (SELECT logit, y FROM pd JOIN lbl USING (doc_id)),
      |bys AS (
      |  SELECT logit, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS np
      |  FROM sc GROUP BY 1),
      |cum AS (
      |  SELECT logit, n, np,
      |    CAST(coalesce(sum(n) OVER (ORDER BY logit
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS cl
      |  FROM bys),
      |agg AS (
      |  SELECT sum(CAST(np AS DECIMAL(38,0)) *
      |      CAST(cl * 2 + n + 1 AS DECIMAL(38,0))) AS s2,
      |    CAST(sum(np) AS DECIMAL(38,0)) AS p,
      |    CAST(sum(n) AS DECIMAL(38,0)) AS t
      |  FROM cum)
      |SELECT CAST(p AS BIGINT) AS n_pos, CAST(t - p AS BIGINT) AS n_neg,
      |  CASE WHEN p > 0 AND (t - p) > 0 THEN
      |    round(CAST(s2 - p * (p + 1) AS DOUBLE) /
      |      CAST(p * (t - p) * 2 AS DOUBLE), 6) END AS auc
      |FROM agg""".stripMargin

  /** DuckDB CTE chain replaying [[graft.ops.Curation.logisticTrainHashed]]
    * end to end (2 unrolled GD rounds → `w2(b, w)`, plus the shared
    * feature frame `x`) — the q161/q166/q174 unrolled-training device
    * applied to the classifier. Shared by the q191 and q192 oracles. */
  private val logTrainCtes: String = {
    val D = "CAST(%s AS DOUBLE)"
    val half = D.format("0.5")
    val one = D.format("1.0")
    val zero = D.format("0.0")
    s"""toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
      |  FROM documents WHERE doc_id IS NOT NULL),
      |$qualityLabelSql,
      |tb AS (
      |  SELECT doc_id,
      |    CAST(CAST('0x' || substr(md5(t), 1, 4) AS BIGINT) % 64 AS BIGINT) AS b
      |  FROM toks WHERE t <> ''),
      |fc AS (SELECT doc_id, b, CAST(count(*) AS BIGINT) AS c
      |  FROM tb GROUP BY 1, 2),
      |lens AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS len FROM fc GROUP BY 1),
      |x AS (
      |  SELECT fc.doc_id, b, CAST(c AS DOUBLE) / len AS x, y
      |  FROM fc JOIN lens USING (doc_id) JOIN lbl USING (doc_id)
      |  WHERE y IS NOT NULL),
      |nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM x),
      |dims AS (SELECT CAST(i AS BIGINT) AS b FROM range(0, 64) t(i)),
      |g1 AS (
      |  SELECT b, CAST(sum(CAST(round(
      |    (CASE WHEN y THEN $one ELSE $zero END - $half) * x, 12)
      |    AS DECIMAL(27,15))) AS DOUBLE) AS g
      |  FROM x GROUP BY b),
      |w1 AS (
      |  SELECT dims.b,
      |    round($zero + $half * (coalesce(g, $zero) / n), 12) AS w
      |  FROM dims LEFT JOIN g1 USING (b) CROSS JOIN nd),
      |z2 AS (
      |  SELECT doc_id, max(y) AS y,
      |    CAST(sum(CAST(round(x * w, 12) AS DECIMAL(27,15))) AS DOUBLE) AS z
      |  FROM x JOIN w1 USING (b) GROUP BY doc_id),
      |p2 AS (
      |  SELECT doc_id, y, round($one / ($one + exp(-z)), 12) AS p FROM z2),
      |g2 AS (
      |  SELECT b, CAST(sum(CAST(round(
      |    (CASE WHEN x.y THEN $one ELSE $zero END - p) * x.x, 12)
      |    AS DECIMAL(27,15))) AS DOUBLE) AS g
      |  FROM x JOIN p2 USING (doc_id) GROUP BY b),
      |w2 AS (
      |  SELECT w1.b, round(w1.w + $half * (coalesce(g2.g, $zero) / n), 12) AS w
      |  FROM w1 LEFT JOIN g2 USING (b) CROSS JOIN nd)""".stripMargin
  }

  /** Logistic-regression TRAINING over the hashed feature space
    * ([[graft.ops.Curation.logisticTrainHashed]], 2 full-batch GD
    * rounds, quality-threshold labels): all 64 learned weights
    * hash-pinned against the oracle's unrolled replay. The classifier
    * lifecycle now closes exactly like the tokenizer's — q162 applies a
    * fixed model, THIS learns one, q192 measures it. */
  def q191LogisticTrain(s: SparkSession, d: String): DataFrame =
    Curation.logisticTrainHashed(
        TextFunctions.widen(Tables.documents(s, d)), "doc_id", "text",
        TextFunctions.qualityScoreRaw(col("text")) >= 0.6)
      .orderBy(col("bucket"))

  val q191Sql: String =
    s"""WITH $logTrainCtes
      |SELECT b AS bucket, w AS weight FROM w2 ORDER BY bucket""".stripMargin

  /** ROC AUC of the TRAINED classifier
    * ([[graft.ops.Curation.logisticApplyHashed]] →
    * [[graft.ops.Profiling.rocAuc]]) — the evaluate step of the
    * train→apply→evaluate loop, one hash-pinned row. Read next to q190
    * (the untrained hashed baseline): two GD rounds must move the
    * ranking quality, and the gate would catch either engine drifting
    * anywhere in the whole loop. */
  def q192TrainedAuc(s: SparkSession, d: String): DataFrame = {
    val docs = TextFunctions.widen(Tables.documents(s, d))
    val lbl = TextFunctions.qualityScoreRaw(col("text")) >= 0.6
    // ONE feature extraction serves both legs (r17): train and apply
    // used to each tokenize + hash the corpus — the extraction dominates
    // this loop's cost, and the persisted frame is feature-sized
    val x = Curation.hashedFeatures(docs, "doc_id", "text", lbl, 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val w = Curation.logisticTrainOnFeatures(x)
      val out = graft.ops.Profiling.rocAuc(
        Curation.logisticApplyOnFeatures(x, "doc_id", w), "z", "y")
      val rows = out.collect()
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.toSeq.asJava, out.schema)
    } finally x.unpersist(false)
  }

  val q192Sql: String =
    s"""WITH $logTrainCtes,
      |z3 AS (
      |  SELECT doc_id, max(y) AS y,
      |    round(CAST(sum(CAST(round(x * w, 12) AS DECIMAL(27,15)))
      |      AS DOUBLE), 12) AS z
      |  FROM x JOIN w2 USING (b) GROUP BY doc_id),
      |bys AS (
      |  SELECT z, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS np
      |  FROM z3 GROUP BY 1),
      |cum AS (
      |  SELECT z, n, np,
      |    CAST(coalesce(sum(n) OVER (ORDER BY z
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |      AS BIGINT) AS cl
      |  FROM bys),
      |agg AS (
      |  SELECT sum(CAST(np AS DECIMAL(38,0)) *
      |      CAST(cl * 2 + n + 1 AS DECIMAL(38,0))) AS s2,
      |    CAST(sum(np) AS DECIMAL(38,0)) AS p,
      |    CAST(sum(n) AS DECIMAL(38,0)) AS t
      |  FROM cum)
      |SELECT CAST(p AS BIGINT) AS n_pos, CAST(t - p AS BIGINT) AS n_neg,
      |  CASE WHEN p > 0 AND (t - p) > 0 THEN
      |    round(CAST(s2 - p * (p + 1) AS DOUBLE) /
      |      CAST(p * (t - p) * 2 AS DOUBLE), 6) END AS auc
      |FROM agg""".stripMargin

  /** T5-style span-corruption plan
    * ([[graft.ops.Curation.spanCorruptionPlan]]): every span's block,
    * start token, and length hash-pinned — the denoising-objective
    * sibling of the q169 MLM plan, one span per 20-token block, 15%
    * expected corruption, resumable by construction. */
  def q194SpanPlan(s: SparkSession, d: String): DataFrame =
    Curation.spanCorruptionPlan(
        TextFunctions.widen(Tables.documents(s, d)), "doc_id", "text")
      .orderBy(col("doc_id"), col("block"))

  val q194Sql: String =
    """WITH d AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS BIGINT) AS n
      |  FROM documents WHERE doc_id IS NOT NULL),
      |b AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS block
      |  FROM (SELECT * FROM d WHERE n >= 20), UNNEST(range(0, n // 20)) AS t(i)),
      |h AS (
      |  SELECT doc_id, block,
      |    md5('span:' || CAST(doc_id AS VARCHAR) || ':' ||
      |      CAST(block AS VARCHAR)) AS hh
      |  FROM b),
      |sp AS (
      |  SELECT doc_id, block,
      |    2 + CAST('0x' || substr(hh, 1, 4) AS BIGINT) % 3 AS len_tok,
      |    CAST('0x' || substr(hh, 5, 4) AS BIGINT) %
      |      (21 - (2 + CAST('0x' || substr(hh, 1, 4) AS BIGINT) % 3)) AS off
      |  FROM h)
      |SELECT doc_id, block, CAST(block * 20 + off AS BIGINT) AS start_tok,
      |  CAST(len_tok AS BIGINT) AS len_tok
      |FROM sp ORDER BY doc_id, block""".stripMargin

  /** k-anonymity audit ([[graft.ops.Curation.kAnonymity]]) over the
    * (lang, source, length-bucket) quasi-identifier — every combination's
    * count and pass/fail flag hash-pinned: the privacy pre-release
    * check beside the q38 PII redaction row. */
  def q195KAnonymity(s: SparkSession, d: String): DataFrame =
    Curation.kAnonymity(
        TextFunctions.widen(Tables.documents(s, d)),
        Seq("lang" -> col("lang"), "source" -> col("source"),
          "len_bucket" -> floor(col("n_chars") / 200).cast("long")),
        k = 5)
      .orderBy(col("lang"), col("source"), col("len_bucket"))

  val q195Sql: String =
    """SELECT lang, source,
      |  CAST(floor(n_chars / CAST(200 AS DOUBLE)) AS BIGINT) AS len_bucket,
      |  CAST(count(*) AS BIGINT) AS n, count(*) >= 5 AS anonymous
      |FROM documents GROUP BY 1, 2, 3
      |ORDER BY 1 NULLS FIRST, 2 NULLS FIRST, 3 NULLS FIRST""".stripMargin

  /** Mutual-information feature selection
    * ([[graft.ops.LanguageModel.mutualInfoTerms]]) against the
    * quality-threshold label: the top-20 tokens that most reduce label
    * uncertainty, each 2×2 incidence cell and MI value hash-pinned —
    * the selection step between labeling (q187's rater A) and training
    * (q191), completing the classifier pipeline's missing middle. */
  def q196MutualInfo(s: SparkSession, d: String): DataFrame =
    graft.ops.LanguageModel.mutualInfoTerms(
      Tables.documents(s, d), "doc_id", "text",
      TextFunctions.qualityScoreRaw(col("text")) >= 0.6)

  val q196Sql: String = {
    def cell(nij: String, row: String, colTot: String) =
      s"""CASE WHEN $nij > 0 THEN CAST(round(
         |      CAST($nij AS DOUBLE) / nn *
         |        ln(nn * CAST($nij AS DOUBLE) /
         |          (CAST($row AS DOUBLE) * CAST($colTot AS DOUBLE))), 12)
         |      AS DECIMAL(27,15)) ELSE CAST(0.0 AS DECIMAL(27,15)) END""".stripMargin
    s"""WITH $qualityLabelSql,
      |inc AS (
      |  SELECT DISTINCT doc_id, y, t AS term FROM (
      |    SELECT d.doc_id, y,
      |      unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t
      |    FROM documents d JOIN lbl USING (doc_id))
      |  WHERE t <> '' AND y IS NOT NULL),
      |cnt AS (
      |  SELECT term, CAST(count(*) AS BIGINT) AS df,
      |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS df_pos
      |  FROM inc GROUP BY 1),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS bign,
      |    CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS p
      |  FROM lbl WHERE doc_id IS NOT NULL AND y IS NOT NULL),
      |scored AS (
      |  SELECT term, df, df_pos,
      |    round(CAST(
      |      ${cell("df_pos", "df", "p")}
      |      + ${cell("df - df_pos", "df", "bign - p")}
      |      + ${cell("p - df_pos", "bign - df", "p")}
      |      + ${cell("bign - p - df + df_pos", "bign - df", "bign - p")}
      |      AS DOUBLE), 6) AS mi
      |  FROM (SELECT *, CAST(bign AS DOUBLE) AS nn
      |        FROM cnt CROSS JOIN tot WHERE df >= 5))
      |SELECT term, df, df_pos, mi FROM scored
      |ORDER BY mi DESC, term LIMIT 20""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q196_mutual_info" -> (q196MutualInfo _),
    "q194_span_plan" -> (q194SpanPlan _),
    "q195_k_anonymity" -> (q195KAnonymity _),
    "q191_logistic_train" -> (q191LogisticTrain _),
    "q192_trained_auc" -> (q192TrainedAuc _),
    "q188_calibration_ece" -> (q188CalibrationEce _),
    "q189_source_psi" -> (q189SourcePsi _),
    "q190_classifier_auc" -> (q190ClassifierAuc _),
    "q187_cohens_kappa" -> (q187CohensKappa _),
    "q175_ht_estimate" -> (q175HtEstimate _),
    "q169_mlm_plan" -> (q169MlmPlan _),
    "q162_quality_classifier" -> (q162QualityClassifier _),
    "q140_source_cap" -> (q140SourceCap _),
    "q141_calibrate_scores" -> (q141CalibrateScores _),
    "q129_dsir_weights" -> (q129DsirWeights _),
    "q86_bloom_decontaminate" -> (q86BloomDecontaminate _),
    "q124_epoch_shard" -> (q124EpochShard _),
    "q38_pii_redact" -> (q38PiiRedact _),
    "q39_train_split" -> (q39TrainSplit _),
    "q44_pack_sequences" -> (q44PackSequences _),
    "q45_domain_mix" -> (q45DomainMix _),
    "q46_stratified_sample" -> (q46StratifiedSample _),
    "q47_weighted_sample" -> (q47WeightedSample _),
    "q109_weighted_topk" -> (q109WeightedTopK _),
    "q115_length_batching" -> (q115LengthBatching _),
    "q49_corpus_shuffle" -> (q49CorpusShuffle _),
    "q53_incremental_dedup" -> (q53IncrementalDedup _),
    "q54_decontaminate" -> (q54Decontaminate _),
    "q123_mixture_sample" -> (q123MixtureSample _))

  val oracles: Map[String, String] = Map(
    "q196_mutual_info" -> q196Sql,
    "q194_span_plan" -> q194Sql,
    "q195_k_anonymity" -> q195Sql,
    "q191_logistic_train" -> q191Sql,
    "q192_trained_auc" -> q192Sql,
    "q188_calibration_ece" -> q188Sql,
    "q189_source_psi" -> q189Sql,
    "q190_classifier_auc" -> q190Sql,
    "q187_cohens_kappa" -> q187Sql,
    "q175_ht_estimate" -> q175Sql,
    "q169_mlm_plan" -> q169Sql,
    "q162_quality_classifier" -> q162Sql,
    "q140_source_cap" -> q140Sql,
    "q141_calibrate_scores" -> q141Sql,
    "q129_dsir_weights" -> q129Sql,
    "q86_bloom_decontaminate" -> q86Sql,
    "q124_epoch_shard" -> q124Sql,
    "q38_pii_redact" -> q38Sql,
    "q39_train_split" -> q39Sql,
    "q44_pack_sequences" -> q44Sql,
    "q45_domain_mix" -> q45Sql,
    "q46_stratified_sample" -> q46Sql,
    "q47_weighted_sample" -> q47Sql,
    "q109_weighted_topk" -> q109Sql,
    "q115_length_batching" -> q115Sql,
    "q49_corpus_shuffle" -> q49Sql,
    "q53_incremental_dedup" -> q53Sql,
    "q54_decontaminate" -> q54Sql,
    "q123_mixture_sample" -> q123Sql)
}
