package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

/** Gate coverage for multimodal binary columns. The payloads are the
  * deterministic md5-derived fakes from [[Multimodal.fakePayload]], so the
  * DuckDB oracle rebuilds byte-identical blobs and checksums them — proving
  * the binary plumbing (hex/unhex, length, checksums, metadata structs)
  * end-to-end without real codecs. */
object MultimodalQueries {

  /** Per-row binary payload facts: length + md5-of-hex checksum. */
  def q60MediaChecksum(s: SparkSession, d: String): DataFrame =
    Multimodal.attachMedia(
        Tables.documents(s, d).filter(col("doc_id") % 20 === 0), "doc_id")
      .select(
        col("doc_id"),
        col("media_meta.mime").as("mime"),
        length(col("media")).cast("long").as("byte_len"),
        md5(hex(col("media")).cast("binary")).as("checksum"))
      .orderBy(col("doc_id"))

  val q60Sql: String =
    """SELECT doc_id,
      | (['image/png','image/jpeg','audio/wav','video/mp4'])[CAST(doc_id % 4 + 1 AS INT)] AS mime,
      | CAST(octet_length(from_hex(repeat(md5(CAST(doc_id AS VARCHAR)), CAST(doc_id % 4 + 1 AS INT)))) AS BIGINT) AS byte_len,
      | md5(hex(from_hex(repeat(md5(CAST(doc_id AS VARCHAR)), CAST(doc_id % 4 + 1 AS INT))))) AS checksum
      |FROM documents WHERE doc_id % 20 = 0
      |ORDER BY doc_id""".stripMargin

  /** Corpus accounting per mime type over media + metadata struct. */
  def q61MediaStats(s: SparkSession, d: String): DataFrame =
    Multimodal.mediaStats(Multimodal.attachMedia(Tables.documents(s, d), "doc_id"))
      .orderBy(col("mime"))

  val q61Sql: String =
    """SELECT (['image/png','image/jpeg','audio/wav','video/mp4'])[CAST(doc_id % 4 + 1 AS INT)] AS mime,
      | count(*) AS n,
      | CAST(sum(octet_length(from_hex(repeat(md5(CAST(doc_id AS VARCHAR)), CAST(doc_id % 4 + 1 AS INT))))) AS BIGINT) AS total_bytes,
      | round(avg(CAST((doc_id % 8 + 1) * 64 AS BIGINT) * CAST((doc_id % 6 + 1) * 64 AS BIGINT)), 2) AS avg_pixels,
      | max(CAST((doc_id % 30 + 1) * 1000 AS BIGINT)) AS max_duration_ms
      |FROM documents
      |GROUP BY 1 ORDER BY mime""".stripMargin

  /** Frame sampling over binary payloads: every 4th 4-byte chunk via
    * [[Multimodal.sampleFrames]]'s binary substring slices, checksummed
    * per frame. The oracle mirrors the byte arithmetic on the hex-string
    * form (DuckDB's substring is VARCHAR-only): byte position p ↔ hex
    * position 2p-1, 4 bytes ↔ 8 hex chars, Spark's hex() is uppercase. */
  def q66FrameSample(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(
        Multimodal.attachMedia(
          Tables.documents(s, d).filter(col("doc_id") % 25 === 0), "doc_id"),
        "media", stride = 4)
      .select(col("doc_id"), posexplode(col("frames")).as(Seq("frame_idx", "frame")))
      .select(col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        md5(hex(col("frame")).cast("binary")).as("frame_md5"))
      .orderBy(col("doc_id"), col("frame_idx"))

  val q66Sql: String =
    """WITH m AS (
      |  SELECT doc_id, repeat(md5(CAST(doc_id AS VARCHAR)), CAST(doc_id % 4 + 1 AS INT)) AS hx
      |  FROM documents WHERE doc_id % 25 = 0),
      |f AS (
      |  SELECT doc_id, unnest(range(0, greatest(CAST(len(hx)/32 AS INT) - 1, 0) + 1)) AS i, hx
      |  FROM m)
      |SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
      |  md5(upper(substr(hx, 1 + CAST(i*32 AS INT), 8))) AS frame_md5
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  /** Typed binary header decode: the first two big-endian 32-bit words
    * of each payload via [[Multimodal.headerWord]] byte slices — the
    * container-header parse (magic, box length) done entirely in
    * codegen'd column expressions. The oracle decodes the same bytes on
    * the hex-string form (8 hex chars per word). */
  def q107MediaHeader(s: SparkSession, d: String): DataFrame =
    Multimodal.attachMedia(
        Tables.documents(s, d).filter(col("doc_id") % 25 === 0), "doc_id")
      .select(col("doc_id"),
        Multimodal.headerWord(col("media"), 0).as("hdr_word0"),
        Multimodal.headerWord(col("media"), 4).as("hdr_word1"))
      .orderBy(col("doc_id"))

  val q107Sql: String =
    """SELECT doc_id,
      |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS hdr_word0,
      |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8) AS BIGINT) AS hdr_word1
      |FROM documents WHERE doc_id % 25 = 0
      |ORDER BY doc_id""".stripMargin

  /** Visual near-dup pairs via perceptual dHash
    * ([[Multimodal.phashTable]] + [[Multimodal.phashNearDupPairs]]):
    * every 10th doc's payload is re-attached under a shifted id, so the
    * 63-bit hashes, the derived `maxHamming+1 = 3`-band split (21 bits
    * each — pigeonhole-complete for the radius), and the Hamming verify must
    * recover the planted identical-payload pairs (Hamming 0) plus the
    * deterministic md5-coincidental twins the byte-sampled stand-in
    * grid admits. Both hashes are pinned per pair. */
  def q153PhashPairs(s: SparkSession, d: String): DataFrame = {
    val base = Multimodal.attachMedia(
      Tables.documents(s, d).select(col("doc_id")), "doc_id")
    val clones = base.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    Multimodal.phashNearDupPairs(base.unionByName(clones),
        "doc_id", "media", maxHamming = 2)
      .orderBy(col("id_a"), col("id_b"))
  }

  val q153Sql: String = {
    def byteAtSql(pos: String): String =
      s"CAST('0x' || substr(hx, ($pos) * 2 + 1, 2) AS BIGINT)"
    def vSql(i: Int): String =
      byteAtSql(s"(${i * 7}) % blen") + " * 256 + " +
        byteAtSql(s"(((${i * 7}) % blen) + 1) % blen")
    val gridCols = (0 to 71).map(i => s"${vSql(i)} AS v$i").mkString(",\n    ")
    val hashSql = (0 until 63).map { bit =>
      val r = bit / 8; val c = bit % 8
      s"(CASE WHEN v${r * 9 + c} < v${r * 9 + c + 1} THEN CAST(${1L << bit} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("\n    + ")
    s"""WITH corpus AS (
       |  SELECT doc_id, doc_id AS pid FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1000000, doc_id FROM documents WHERE doc_id % 10 = 0
       |), hxt AS (
       |  SELECT doc_id,
       |    repeat(md5(CAST(pid AS VARCHAR)), CAST(pid % 4 + 1 AS INT)) AS hx
       |  FROM corpus
       |), vt AS (
       |  SELECT doc_id, hx, length(hx) // 2 AS blen FROM hxt
       |), grid AS (
       |  SELECT doc_id,
       |    $gridCols
       |  FROM vt
       |), ht AS (
       |  SELECT doc_id,
       |    $hashSql AS h
       |  FROM grid
       |), banded AS (
       |  SELECT doc_id, h, b,
       |    (h >> CAST(b * 21 AS INT)) & 2097151 AS key
       |  FROM ht, UNNEST(range(0, 3)) AS t(b)
       |), pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |    a.h AS dhash_a, b.h AS dhash_b
       |  FROM banded a JOIN banded b
       |    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
       |)
       |SELECT id_a, id_b, dhash_a, dhash_b,
       |  bit_count(xor(dhash_a, dhash_b)) AS hamming
       |FROM pairs WHERE bit_count(xor(dhash_a, dhash_b)) <= 2
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** PHASH RECALL AUDIT — the measured check the round-10 band-derivation
    * bug proved necessary: [[Multimodal.phashNearDupPairs]]' pigeonhole
    * banding (maxHamming + 1 = 3 bands of 21 bits — any pair within
    * Hamming ≤ 2 shares one band exactly) vs the exact all-pairs popcount
    * arm over the same dHashes. Recall and precision must both read 1;
    * a wrong band count (the exact defect ADVICE caught: bands derived
    * from a constant instead of the radius) reads < 1 here and fails the
    * hash gate instead of silently losing near-dups. Planted pairs are
    * every 10th sampled doc's payload re-keyed (Hamming 0) plus the
    * md5-coincidental twins the byte-sampled grid admits (Hamming 1-2).
    *
    * Audit-scoped by design (%5 id sample caps the exact arm). */
  def q179PhashRecall(s: SparkSession, d: String): DataFrame = {
    val base = Multimodal.attachMedia(
      Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
        .select(col("doc_id")), "doc_id")
    val clones = base.filter(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 1000000L)
    val corpus = base.unionByName(clones)
    // ONE materialized phash table feeds BOTH arms (r17: the band op's
    // internal checkpoint and the exact arm used to each hash the corpus
    // separately — the 72-sample grid + 63-term fold over every payload
    // is THE cost of this audit, so it must run exactly once)
    val h = Multimodal.phashTable(corpus, "doc_id", "media").localCheckpoint()
    val band = Multimodal.phashNearDupPairsFromHashes(h, maxHamming = 2)
      .select(col("id_a"), col("id_b"))
    // the audit SAMPLE is tiny by design — broadcast the theta-join's
    // build side explicitly: size ESTIMATES ride the underlying scan, so
    // on a large corpus the planner would otherwise fall back to a
    // cartesian that recomputes the phash side per partition pair
    // (measured 97 s vs 6 s at the 100× receipt)
    val exact = h.select(col("__id").as("id_a"), col("dhash").as("__ha"))
      .join(broadcast(h.select(col("__id").as("id_b"), col("dhash").as("__hb"))),
        col("id_a") < col("id_b"))
      .filter(call_function("bit_count",
        col("__ha").bitwiseXOR(col("__hb"))) <= 2)
      .select(col("id_a"), col("id_b"))
    AuditUtil.recallSummary(s, band, exact, Seq("id_a", "id_b"), "n_band")
  }

  val q179Sql: String = {
    def byteAtSql(pos: String): String =
      s"CAST('0x' || substr(hx, ($pos) * 2 + 1, 2) AS BIGINT)"
    def vSql(i: Int): String =
      byteAtSql(s"(${i * 7}) % blen") + " * 256 + " +
        byteAtSql(s"(((${i * 7}) % blen) + 1) % blen")
    val gridCols = (0 to 71).map(i => s"${vSql(i)} AS v$i").mkString(",\n    ")
    val hashSql = (0 until 63).map { bit =>
      val r = bit / 8; val c = bit % 8
      s"(CASE WHEN v${r * 9 + c} < v${r * 9 + c + 1} THEN CAST(${1L << bit} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("\n    + ")
    s"""WITH corpus AS (
       |  SELECT doc_id, doc_id AS pid FROM documents WHERE doc_id % 5 = 0
       |  UNION ALL
       |  SELECT doc_id + 1000000, doc_id FROM documents WHERE doc_id % 10 = 0
       |), hxt AS (
       |  SELECT doc_id,
       |    repeat(md5(CAST(pid AS VARCHAR)), CAST(pid % 4 + 1 AS INT)) AS hx
       |  FROM corpus
       |), vt AS (
       |  SELECT doc_id, hx, length(hx) // 2 AS blen FROM hxt
       |), grid AS (
       |  SELECT doc_id,
       |    $gridCols
       |  FROM vt
       |), ht AS (
       |  SELECT doc_id,
       |    $hashSql AS h
       |  FROM grid
       |), banded AS (
       |  SELECT doc_id, h, b,
       |    (h >> CAST(b * 21 AS INT)) & 2097151 AS key
       |  FROM ht, UNNEST(range(0, 3)) AS t(b)
       |), bandp AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM banded a JOIN banded b
       |    ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.h, b.h)) <= 2
       |), exct AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM ht a JOIN ht b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.h, b.h)) <= 2
       |), c AS (
       |  SELECT count(*) AS n_common FROM bandp JOIN exct USING (id_a, id_b)
       |), nb AS (SELECT count(*) AS n_band FROM bandp),
       |ne AS (SELECT count(*) AS n_exact FROM exct)
       |SELECT n_exact, n_band, n_common,
       |  round(n_common / CAST(n_exact AS DOUBLE), 6) AS recall,
       |  round(n_common / CAST(n_band AS DOUBLE), 6) AS precision
       |FROM ne CROSS JOIN nb CROSS JOIN c""".stripMargin
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q179_phash_recall" -> (q179PhashRecall _),
    "q153_phash_pairs" -> (q153PhashPairs _),
    "q60_media_checksum" -> (q60MediaChecksum _),
    "q61_media_stats" -> (q61MediaStats _),
    "q66_frame_sample" -> (q66FrameSample _),
    "q107_media_header" -> (q107MediaHeader _))

  val oracles: Map[String, String] = Map(
    "q179_phash_recall" -> q179Sql,
    "q153_phash_pairs" -> q153Sql,
    "q60_media_checksum" -> q60Sql,
    "q61_media_stats" -> q61Sql,
    "q66_frame_sample" -> q66Sql,
    "q107_media_header" -> q107Sql)
}
