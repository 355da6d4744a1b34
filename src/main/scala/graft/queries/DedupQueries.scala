package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Gate coverage for the dedup operator family over `documents`.
  *
  * The corpus has no literal duplicates, so q33 synthesizes them
  * deterministically inside the query (union with a re-keyed subset) —
  * the oracle does the identical UNION ALL, proving the operator actually
  * removes rows. q34/q35/q36 run the real near-dup machinery; their oracle
  * SQL replays the exact same md5-based hashes in DuckDB.
  */
object DedupQueries {

  /** Exact dedup over a corpus with injected duplicates: every doc_id % 7
    * reappears shifted by 1,000,000; dedup must keep only the original. */
  def q33ExactDedup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val dupes = docs.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val corpus = docs.unionByName(dupes)
    Dedup.exactDedup(corpus, "doc_id", "text")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), max(col("doc_id")).as("max_kept_id"))
      .orderBy(col("source"))
  }

  val q33Sql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, text, source FROM documents WHERE doc_id % 7 = 0
      |), fp AS (
      |  SELECT doc_id, source,
      |         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f
      |  FROM corpus
      |), keep AS (SELECT f, min(doc_id) AS doc_id FROM fp GROUP BY f)
      |SELECT source, count(*) AS n_kept, max(fp.doc_id) AS max_kept_id
      |FROM fp JOIN keep USING (f, doc_id)
      |GROUP BY source ORDER BY source""".stripMargin

  /** MinHash-LSH near-dup pairs (12 hashes, 4 bands × 3 rows, J ≥ 0.5). */
  def q34MinhashLsh(s: SparkSession, d: String): DataFrame =
    Dedup.minhashNearDupPairs(Tables.documents(s, d), "doc_id", "text",
        k = 3, bands = 4, rowsPerBand = 3, threshold = 0.5)
      .orderBy(col("doc_a"), col("doc_b"))

  /** Shared DuckDB (tok, sh) CTE pair — THE definition of the k=3 word
    * shingle construction every dedup oracle in this file builds on. */
  private def shingleCtes(where: String, from: String = "documents"): String =
    s"""tok AS (
       |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks FROM $from$where
       |), sh AS (
       |  SELECT doc_id, CASE WHEN len(toks) >= 3
       |    THEN list_distinct(list_transform(range(1, greatest(len(toks)-2,1)+1),
       |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
       |    ELSE [array_to_string(toks, ' ')] END AS shingles
       |  FROM tok
       |)""".stripMargin

  /** The q34 LSH pair pipeline over any corpus relation — q91 builds its
    * component graph and q155 its quality-collapse clusters from the same
    * pairs. */
  private[queries] def minhashPairsSqlFrom(from: String): String = {
    val a = graft.ops.Dedup.permA(12).mkString("[", ",", "]")
    val b = graft.ops.Dedup.permB(12).mkString("[", ",", "]")
    s"""WITH ${shingleCtes("", from)}, mh AS (
      |  SELECT doc_id, shingles,
      |    list_transform(range(0, 12), s ->
      |      list_aggregate(list_transform(shingles, g ->
      |        ($a[s+1] * CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) + $b[s+1]) % 2147483647),
      |        'min')) AS sig
      |  FROM sh
      |), bands AS (
      |  SELECT doc_id, b AS band_id,
      |    sig[b*3+1] || '_' || sig[b*3+2] || '_' || sig[b*3+3] AS band_sig
      |  FROM mh, (SELECT unnest(range(0,4)) AS b)
      |), cand AS (""".stripMargin
  } + "\n" +
    """  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bands a JOIN bands b
      |    ON a.band_id = b.band_id AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
      |)
      |SELECT doc_a, doc_b,
      |  round(CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
      |    / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))), 6) AS jaccard
      |FROM cand JOIN sh sa ON cand.doc_a = sa.doc_id JOIN sh sb ON cand.doc_b = sb.doc_id
      |WHERE CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
      |    / (len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles))) >= 0.5""".stripMargin

  private[queries] val q34Pairs: String = minhashPairsSqlFrom("documents")

  val q34Sql: String = q34Pairs + "\nORDER BY doc_a, doc_b"

  /** Per-document 32-bit SimHash (sampled) — pins the exact bit pattern. */
  def q35Simhash(s: SparkSession, d: String): DataFrame =
    Dedup.simhashTable(
        Tables.documents(s, d).filter(col("doc_id") % 10 === 0), "doc_id", "text")
      .orderBy(col("doc_id"))

  val q35Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |  FROM documents WHERE doc_id % 10 = 0
      |), th AS (
      |  SELECT doc_id, list_transform(toks,
      |    t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT)) AS hashes
      |  FROM tok
      |), votes AS (
      |  SELECT doc_id, hashes, list_transform(range(0, 32), b ->
      |    list_reduce(list_transform(hashes, h ->
      |      CASE WHEN CAST(floor(h / power(2, b)) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END),
      |      (a, x) -> a + x)) AS v
      |  FROM th
      |)
      |SELECT doc_id,
      |  list_reduce(list_transform(range(0, 32), b ->
      |    CASE WHEN v[b+1] > 0 THEN CAST(power(2, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END),
      |    (a, x) -> a + x) AS simhash
      |FROM votes ORDER BY doc_id""".stripMargin

  /** Blocked all-pairs n-gram Jaccard on a 60-doc block, J ≥ 0.3. */
  def q36NgramJaccard(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardPairs(
        Tables.documents(s, d).filter(col("doc_id") < 60), "doc_id", "text",
        k = 3, threshold = 0.3)
      .orderBy(col("doc_a"), col("doc_b"))

  val q36Sql: String =
    s"""WITH ${shingleCtes(" WHERE doc_id < 60")}
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      |    / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))), 6) AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      |    / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= 0.3
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Connected components over the q34 near-dup pairs plus a deterministic
    * chain link (i → i+13 for every 13th doc) — the chain forms a 39-edge
    * path, so the gate exercises pointer jumping's O(log diameter)
    * convergence, not just 2-cliques. Output: per-cluster membership. */
  def q91Components(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val mh = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        k = 3, bands = 4, rowsPerBand = 3, threshold = 0.5)
      .select(col("doc_a"), col("doc_b"))
    val ids = docs.select(col("doc_id"))
    val chain = ids.filter(col("doc_id") % 13 === 0)
      .select(col("doc_id").as("doc_a"), (col("doc_id") + 13L).as("doc_b"))
      .join(ids.select(col("doc_id").as("doc_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    graft.ops.DedupClustering
      .connectedComponents(mh.unionByName(chain), "doc_a", "doc_b")
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("n_members"), max(col("id")).as("max_id"))
      .orderBy(col("cluster_id"))
  }

  val q91Sql: String =
    s"""WITH RECURSIVE pairs AS (
       |$q34Pairs
       |), chain AS (
       |  SELECT d.doc_id AS doc_a, d.doc_id + 13 AS doc_b
       |  FROM documents d JOIN documents e ON e.doc_id = d.doc_id + 13
       |  WHERE d.doc_id % 13 = 0
       |), edges AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_a, doc_b FROM chain
       |), und AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
       |verts AS (SELECT DISTINCT a AS id FROM und),
       |reach(id, r) AS (
       |  SELECT id, id FROM verts
       |  UNION
       |  SELECT u.a, reach.r FROM und u JOIN reach ON u.b = reach.id
       |), lbl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
       |SELECT cluster_id, count(*) AS n_members, max(id) AS max_id
       |FROM lbl GROUP BY cluster_id ORDER BY cluster_id""".stripMargin

  /** Leakage-safe train/test split
    * ([[graft.ops.DedupClustering.splitByComponents]]): every doc's
    * near-dup cluster key and its cluster-keyed 80/20 md5 split are
    * hash-pinned — the oracle replays the LSH pairs, the recursive-CTE
    * components, and the md5 bucket, so a single doc whose twin lands on
    * the other side fails the hash. The split a pipeline MUST use
    * instead of per-doc hashing (q39), which leaks near-dups across the
    * boundary. */
  def q167LeakageSplit(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        k = 3, bands = 4, rowsPerBand = 3, threshold = 0.5)
      .select(col("doc_a"), col("doc_b"))
    graft.ops.DedupClustering.splitByComponents(
        docs.select(col("doc_id")), pairs, "doc_a", "doc_b", "doc_id")
      .orderBy(col("doc_id"))
  }

  val q167Sql: String =
    s"""WITH RECURSIVE pairs AS (
       |$q34Pairs
       |), und AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b AS a, doc_a AS b FROM pairs
       |), verts AS (SELECT DISTINCT a AS id FROM und),
       |reach(id, r) AS (
       |  SELECT id, id FROM verts
       |  UNION
       |  SELECT u.a, reach.r FROM und u JOIN reach ON u.b = reach.id
       |), lbl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
       |SELECT d.doc_id, coalesce(l.cluster_id, d.doc_id) AS cluster,
       |  CASE WHEN CAST('0x' || substr(md5('split:' ||
       |      CAST(coalesce(l.cluster_id, d.doc_id) AS VARCHAR)), 1, 4)
       |      AS BIGINT) % 10 < 8
       |    THEN 'train' ELSE 'test' END AS split
       |FROM documents d LEFT JOIN lbl l ON d.doc_id = l.id
       |ORDER BY doc_id""".stripMargin

  /** DEDUP RECALL AUDIT — q170's sibling for the near-dup family: the
    * LSH pipeline's recall and precision against the exact
    * inverted-index Jaccard join, as ONE hash-pinned summary row. The
    * q34 pipeline verifies candidates with true Jaccard, so precision is
    * 1 by construction and the gate PROVES it; recall < 1 measures
    * exactly what the 4×3 banding misses at J ≥ 0.5 — the number a
    * pipeline owner checks before trusting LSH-only dedup at 100 TB.
    * Injected duplicates (every 7th doc re-keyed, the q33 device) give
    * the audit a known planted population on a corpus with no natural
    * dups. */
  def q171LshRecall(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val dupes = docs.filter(col("doc_id") % 7 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val corpus = docs.unionByName(dupes)
    // ONE shared (lazy) distinct shingle frame feeds BOTH arms — the
    // canonical-equal subtree lets runtime exchange reuse share the
    // distinct shuffle across them, and minhash signatures are invariant
    // under the distinct (min and collect_set ignore duplicate gram
    // rows). Deliberately NOT checkpointed: materializing the heavy
    // gram-string frame measured slower at 10× than recomputing it (r17,
    // same verdict as ngramJaccardIndexPairs).
    val grams = Dedup.shingleRows(corpus, "doc_id", "text", k = 3)
      .select(col("__id"), col("__g")).distinct()
    val lsh = Dedup.minhashNearDupPairsFromShingles(grams,
        bands = 4, rowsPerBand = 3, threshold = 0.5)
      .select(col("doc_a"), col("doc_b"))
    val exact = Dedup.ngramJaccardIndexPairsFromShingles(grams, threshold = 0.5)
      .select(col("doc_a"), col("doc_b"))
    // arms persisted once, three CONCURRENT counts, literal summary
    // (see AuditUtil)
    AuditUtil.recallSummary(s, lsh, exact, Seq("doc_a", "doc_b"), "n_lsh")
  }

  val q171Sql: String = {
    val corpusSelect =
      """SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0""".stripMargin
    s"""WITH lshp AS (
       |  SELECT doc_a, doc_b FROM (
       |${minhashPairsSqlFrom(s"($corpusSelect)")}
       |  )
       |), exct AS (
       |  SELECT doc_a, doc_b FROM (
       |    WITH ${shingleCtes("", s"($corpusSelect)")},
       |    r AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
       |    sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
       |    inter AS (
       |      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |      FROM r a JOIN r b ON a.g = b.g AND a.doc_id < b.doc_id
       |      GROUP BY 1, 2)
       |    SELECT doc_a, doc_b
       |    FROM inter JOIN sz sa ON inter.doc_a = sa.doc_id
       |      JOIN sz sb ON inter.doc_b = sb.doc_id
       |    WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.5
       |  )
       |), c AS (
       |  SELECT count(*) AS n_common FROM lshp JOIN exct USING (doc_a, doc_b)
       |), nl AS (SELECT count(*) AS n_lsh FROM lshp),
       |ne AS (SELECT count(*) AS n_exact FROM exct)
       |SELECT n_exact, n_lsh, n_common,
       |  round(n_common / CAST(n_exact AS DOUBLE), 6) AS recall,
       |  round(n_common / CAST(n_lsh AS DOUBLE), 6) AS precision
       |FROM ne CROSS JOIN nl CROSS JOIN c""".stripMargin
  }

  /** Exact all-corpus Jaccard ≥ 0.5 via the inverted-index join — the
    * at-scale counterpart of q36's blocked all-pairs form, and an exact
    * superset check on q34's LSH candidates. */
  def q98JaccardIndex(s: SparkSession, d: String): DataFrame =
    Dedup.ngramJaccardIndexPairs(Tables.documents(s, d), "doc_id", "text",
        k = 3, threshold = 0.5)
      .orderBy(col("doc_a"), col("doc_b"))

  val q98Sql: String =
    s"""WITH ${shingleCtes("")}, r AS (SELECT doc_id, unnest(shingles) AS g FROM sh
      |), sz AS (SELECT doc_id, len(shingles) AS n FROM sh
      |), inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
      |  FROM r a JOIN r b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT doc_a, doc_b,
      |  round(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jaccard
      |FROM inter
      |JOIN sz na ON inter.doc_a = na.doc_id
      |JOIN sz nb ON inter.doc_b = nb.doc_id
      |WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Containment dedup over a corpus with injected truncations: every
    * 11th doc reappears as its own 20-token prefix (re-keyed) — the
    * subset-duplicate shape Jaccard under-scores. Containment ≥ 0.9 must
    * recover each (prefix ⊂ source) pair. */
  def q100Containment(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val trunc = docs.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        array_join(slice(graft.ops.TextFunctions.tokens(col("text")), 1, 20), " ")
          .as("text"))
    Dedup.ngramContainmentPairs(docs.unionByName(trunc), "doc_id", "text",
        k = 3, threshold = 0.9)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val q100Sql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 2000000,
       |    array_to_string(list_slice(regexp_split_to_array(lower(trim(text)), '\\s+'), 1, 20), ' ')
       |  FROM documents WHERE doc_id % 11 = 0
       |), ${shingleCtes("", "corpus")},
       |r AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
       |sz AS (SELECT doc_id, len(shingles) AS n FROM sh),
       |inter AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
       |  FROM r a JOIN r b ON a.g = b.g AND a.doc_id <> b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT doc_a, doc_b,
       |  round(CAST(i AS DOUBLE) / na.n, 6) AS containment
       |FROM inter JOIN sz na ON inter.doc_a = na.doc_id
       |WHERE CAST(i AS DOUBLE) / na.n >= 0.9
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Cross-source duplicate-overlap matrix: every doc_id % 7 is mirrored
    * verbatim into the NEXT source (srcK → src(K+1 mod 20), re-keyed), so
    * each adjacent source pair must report exactly its planted share —
    * plus any natural cross-source duplicates the corpus already holds.
    * The gate pins the full (src_a, src_b, n_shared) matrix. */
  def q125SourceOverlap(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val srcNum = regexp_extract(col("source"), "src(\\d+)", 1).cast("int")
    val mirrored = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 7000000L).as("doc_id"),
        concat(lit("src"), pmod(srcNum + 1, lit(20)).cast("string")).as("source"),
        col("text"))
    val corpus = docs.select(col("doc_id"), col("source"), col("text"))
      .unionByName(mirrored)
    Dedup.crossSourceOverlap(corpus, "doc_id", "source", "text")
      .orderBy(col("src_a"), col("src_b"))
  }

  val q125Sql: String =
    """WITH corpus AS (
      |  SELECT doc_id, source, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 7000000,
      |    'src' || CAST((CAST(regexp_extract(source, 'src(\d+)', 1) AS INT) + 1) % 20 AS VARCHAR),
      |    text
      |  FROM documents WHERE doc_id % 7 = 0
      |), fp AS (
      |  SELECT DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS f, source
      |  FROM corpus)
      |SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
      |FROM fp a JOIN fp b ON a.f = b.f AND a.source < b.source
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Per-document 3-gram novelty with planted clones: every 7th doc
    * reappears verbatim under a HIGHER id, so each clone must score
    * novelty 0 (every gram's first occurrence is its original) while the
    * originals keep whatever novelty the raw corpus gives them — first-
    * occurrence attribution, the per-doc distinct, and the exact
    * n_novel/n_grams division are all pinned per document. */
  def q133KgramNovelty(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val clones = docs.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
    Dedup.kgramNovelty(docs.unionByName(clones), "doc_id", "text", k = 3)
      .orderBy(col("doc_id"))
  }

  val q133Sql: String =
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 3000000, text FROM documents WHERE doc_id % 7 = 0
       |), ${shingleCtes("", "corpus")},
       |r AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
       |f AS (SELECT g, min(doc_id) AS first_doc FROM r GROUP BY 1)
       |SELECT doc_id, count(*) AS n_grams,
       |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |  CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS novelty
       |FROM r JOIN f USING (g)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Source-level MinHash similarity matrix (64 hashes, 3-gram
    * shingles) over the raw corpus: every (src_a, src_b) pair's
    * component-match count and resemblance estimate is pinned, so the
    * linear-permutation family, the union-of-sets min aggregation, and
    * the pair compare must all be bit-exact. The content-space
    * counterpart of q125's verbatim-fingerprint matrix. */
  def q135SourceMinhash(s: SparkSession, d: String): DataFrame =
    Dedup.sourceMinhashMatrix(Tables.documents(s, d),
        "doc_id", "source", "text", k = 3, numHashes = 64)
      .orderBy(col("src_a"), col("src_b"))

  val q135Sql: String = {
    val a = graft.ops.Dedup.permA(64).mkString("[", ",", "]")
    val b = graft.ops.Dedup.permB(64).mkString("[", ",", "]")
    s"""WITH ${shingleCtes("")},
       |r AS (SELECT source, unnest(shingles) AS g
       |      FROM sh JOIN documents USING (doc_id)
       |), hs AS (SELECT source, CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) AS h FROM r
       |), sig AS (
       |  SELECT source, s, min(($a[s+1] * h + $b[s+1]) % 2147483647) AS m
       |  FROM hs, (SELECT unnest(range(0, 64)) AS s)
       |  GROUP BY source, s)
       |SELECT a.source AS src_a, b.source AS src_b,
       |  CAST(sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
       |  CAST(sum(CASE WHEN a.m = b.m THEN 1 ELSE 0 END) AS DOUBLE) / 64 AS est_jaccard
       |FROM sig a JOIN sig b ON a.s = b.s AND a.source < b.source
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Cross-document exact-substring dedup
    * ([[graft.ops.Dedup.exactSubstringDedup]], the Lee et al. ExactSubstr
    * pass on 8-token-gram anchors): the full reassembled text of every
    * document is pinned, so the keep-global-first semantics, the span
    * expansion, and the position filter must replay exactly. */
  def q146SubstrDedup(s: SparkSession, d: String): DataFrame =
    Dedup.exactSubstringDedup(
        Tables.documents(s, d).select(col("doc_id"), col("text")),
        "doc_id", "text", k = 8)
      .orderBy(col("doc_id"))

  val q146Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |  FROM documents WHERE doc_id IS NOT NULL
      |), g AS (
      |  SELECT doc_id, i AS pos,
      |    md5(array_to_string(list_slice(toks, i + 1, i + 8), ' ')) AS h
      |  FROM tok, UNNEST(range(0, len(toks) - 8 + 1)) AS t(i)
      |  WHERE len(toks) >= 8
      |), c AS (
      |  SELECT doc_id, pos,
      |    count(*) OVER (PARTITION BY h) AS cnt,
      |    row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
      |  FROM g
      |), rem AS (
      |  SELECT doc_id, list(DISTINCT j) AS removed
      |  FROM (SELECT doc_id, pos FROM c WHERE cnt > 1 AND rn > 1) f,
      |    UNNEST(range(f.pos, f.pos + 8)) AS u(j)
      |  GROUP BY doc_id
      |)
      |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
      |  CAST(coalesce(len(removed), 0) AS BIGINT) AS n_removed,
      |  coalesce(array_to_string(list_filter(toks,
      |    (x, i) -> removed IS NULL OR NOT list_contains(removed, i - 1)),
      |    ' '), '') AS text_dedup
      |FROM tok t LEFT JOIN rem USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Quality-aware near-dup collapse
    * ([[graft.ops.DedupClustering.collapseNearDupsByQuality]]): every
    * 10th doc gets a near-dup clone with a few tokens APPENDED, so the
    * clone scores higher on token count — the collapse must keep the
    * clone and drop the original, the opposite of min-id collapse. The
    * oracle replays LSH pairs + recursive-CTE components + the
    * (score desc, id asc) winner rule over the same corpus. */
  def q155QualityCollapse(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val clones = docs.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" appended bonus quality context tokens"))
          .as("text"))
    val corpus = docs.unionByName(clones)
      .withColumn("q", graft.ops.TextFunctions.tokenCount(col("text")))
    graft.ops.DedupClustering.collapseNearDupsByQuality(
        corpus, "doc_id", "text", "q", threshold = 0.5)
      .select(col("doc_id"), col("q"))
      .orderBy(col("doc_id"))
  }

  val q155Sql: String =
    s"""WITH RECURSIVE corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, text || ' appended bonus quality context tokens'
       |  FROM documents WHERE doc_id % 10 = 0
       |), pairs AS (
       |${minhashPairsSqlFrom("corpus")}
       |), und AS (
       |  SELECT doc_a AS a, doc_b AS b FROM pairs
       |  UNION SELECT doc_b, doc_a FROM pairs
       |), verts AS (SELECT DISTINCT a AS id FROM und),
       |reach(id, r) AS (
       |  SELECT id, id FROM verts
       |  UNION
       |  SELECT u.a, reach.r FROM und u JOIN reach ON u.b = reach.id
       |), lbl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
       |scored AS (
       |  SELECT l.id, l.cluster_id,
       |    len(regexp_split_to_array(lower(trim(c.text)), '\\s+')) AS q
       |  FROM lbl l JOIN corpus c ON c.doc_id = l.id
       |), ranked AS (
       |  SELECT id, row_number() OVER (
       |    PARTITION BY cluster_id ORDER BY q DESC, id) AS rn
       |  FROM scored
       |), losers AS (SELECT id FROM ranked WHERE rn > 1)
       |SELECT c.doc_id,
       |  CAST(len(regexp_split_to_array(lower(trim(c.text)), '\\s+')) AS BIGINT) AS q
       |FROM corpus c
       |WHERE NOT EXISTS (SELECT 1 FROM losers x WHERE x.id = c.doc_id)
       |ORDER BY c.doc_id""".stripMargin

  /** SIMHASH RECALL AUDIT — q171's device pointed at the Hamming-banded
    * family: the 4-band pigeonhole split of
    * [[graft.ops.Dedup.simhashNearDupPairs]] (any pair within Hamming ≤ 3
    * differs in ≤ 3 of 4 bands, so it shares one exactly) is PROVABLY
    * lossless, and this row measures it — band-pipeline pairs vs the
    * exact all-pairs popcount arm over the same hashes must agree
    * exactly (recall = precision = 1). Exactly the bug class the phash
    * band-derivation defect was: a wrong band count silently loses
    * recall, and only a measured audit catches it. The planted clones
    * (every 21st doc re-keyed with one appended token) sit at small
    * nonzero Hamming, so the audit exercises near-misses, not just
    * identical hashes.
    *
    * The exact arm is an all-pairs theta join — audit-scoped BY DESIGN
    * (the %3 sample caps it), like q98/q171: run on a sample to validate
    * the banding, while production stays band-bounded. */
  def q177SimhashRecall(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"))
    val planted = docs.filter(col("doc_id") % 21 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zqxduplicate")).as("text"))
    val corpus = docs.unionByName(planted)
    // ONE materialized hash table feeds BOTH arms (r17: the band op's
    // internal checkpoint and the exact arm's lazy pipeline used to each
    // build their own simhashTable — sharing the frame removes the
    // duplicate two-shuffle hash pipeline entirely)
    val h = Dedup.simhashTable(corpus, "doc_id", "text").localCheckpoint()
    val band = Dedup.simhashNearDupPairsFromHashes(h, "doc_id", maxDist = 3)
      .select(col("doc_a"), col("doc_b"))
    // broadcast the theta-join's build side: the audit sample is tiny by
    // design, and size estimates ride the underlying scan (the q179
    // 100×-receipt lesson — an estimate-driven cartesian fallback
    // recomputes the hash side per partition pair)
    val exact = h.select(col("doc_id").as("doc_a"), col("simhash").as("__ha"))
      .join(broadcast(h.select(col("doc_id").as("doc_b"), col("simhash").as("__hb"))),
        col("doc_a") < col("doc_b"))
      .filter(call_function("bit_count",
        col("__ha").bitwiseXOR(col("__hb"))) <= 3)
      .select(col("doc_a"), col("doc_b"))
    // single-job crossJoin form: the arm tails over the shared hash RDD
    // are cheap, and one job overlaps all three count branches' stages
    val nCommon = band.join(exact, Seq("doc_a", "doc_b"), "left_semi")
      .agg(count(lit(1)).as("n_common"))
    val nBand = band.agg(count(lit(1)).as("n_band"))
    val nExact = exact.agg(count(lit(1)).as("n_exact"))
    nExact.crossJoin(nBand).crossJoin(nCommon)
      .select(col("n_exact"), col("n_band"), col("n_common"),
        round(col("n_common") / col("n_exact").cast("double"), 6).as("recall"),
        round(col("n_common") / col("n_band").cast("double"), 6).as("precision"))
  }

  val q177Sql: String =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, text || ' zqxduplicate'
      |  FROM documents WHERE doc_id % 21 = 0
      |), tok AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |  FROM corpus
      |), th AS (
      |  SELECT doc_id, list_transform(toks,
      |    t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT)) AS hashes
      |  FROM tok
      |), votes AS (
      |  SELECT doc_id, list_transform(range(0, 32), b ->
      |    list_reduce(list_transform(hashes, h ->
      |      CASE WHEN CAST(floor(h / power(2, b)) AS BIGINT) % 2 = 1 THEN 1 ELSE -1 END),
      |      (a, x) -> a + x)) AS v
      |  FROM th
      |), ht AS (
      |  SELECT doc_id,
      |    list_reduce(list_transform(range(0, 32), b ->
      |      CASE WHEN v[b+1] > 0 THEN CAST(power(2, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END),
      |      (a, x) -> a + x) AS h
      |  FROM votes
      |), banded AS (
      |  SELECT doc_id, h, b,
      |    CAST(floor(h / power(2, b * 8)) AS BIGINT) % 256 AS key
      |  FROM ht, UNNEST(range(0, 4)) AS t(b)
      |), bandp AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM banded a JOIN banded b
      |    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.h, b.h)) <= 3
      |), exct AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM ht a JOIN ht b ON a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.h, b.h)) <= 3
      |), c AS (
      |  SELECT count(*) AS n_common FROM bandp JOIN exct USING (doc_a, doc_b)
      |), nb AS (SELECT count(*) AS n_band FROM bandp),
      |ne AS (SELECT count(*) AS n_exact FROM exct)
      |SELECT n_exact, n_band, n_common,
      |  round(n_common / CAST(n_exact AS DOUBLE), 6) AS recall,
      |  round(n_common / CAST(n_band AS DOUBLE), 6) AS precision
      |FROM ne CROSS JOIN nb CROSS JOIN c""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q177_simhash_recall" -> (q177SimhashRecall _),
    "q155_quality_collapse" -> (q155QualityCollapse _),
    "q146_substr_dedup" -> (q146SubstrDedup _),
    "q100_containment" -> (q100Containment _),
    "q125_source_overlap" -> (q125SourceOverlap _),
    "q133_kgram_novelty" -> (q133KgramNovelty _),
    "q135_source_minhash" -> (q135SourceMinhash _),
    "q33_exact_dedup" -> (q33ExactDedup _),
    "q34_minhash_lsh" -> (q34MinhashLsh _),
    "q35_simhash" -> (q35Simhash _),
    "q36_ngram_jaccard" -> (q36NgramJaccard _),
    "q91_components" -> (q91Components _),
    "q167_leakage_split" -> (q167LeakageSplit _),
    "q171_lsh_recall" -> (q171LshRecall _),
    "q98_jaccard_index" -> (q98JaccardIndex _))

  val oracles: Map[String, String] = Map(
    "q177_simhash_recall" -> q177Sql,
    "q146_substr_dedup" -> q146Sql,
    "q155_quality_collapse" -> q155Sql,
    "q100_containment" -> q100Sql,
    "q125_source_overlap" -> q125Sql,
    "q133_kgram_novelty" -> q133Sql,
    "q135_source_minhash" -> q135Sql,
    "q33_exact_dedup" -> q33Sql,
    "q34_minhash_lsh" -> q34Sql,
    "q35_simhash" -> q35Sql,
    "q36_ngram_jaccard" -> q36Sql,
    "q91_components" -> q91Sql,
    "q167_leakage_split" -> q167Sql,
    "q171_lsh_recall" -> q171Sql,
    "q98_jaccard_index" -> q98Sql)
}
