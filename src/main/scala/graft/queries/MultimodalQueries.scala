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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q60_media_checksum" -> (q60MediaChecksum _),
    "q61_media_stats" -> (q61MediaStats _),
    "q66_frame_sample" -> (q66FrameSample _),
    "q107_media_header" -> (q107MediaHeader _))

  val oracles: Map[String, String] = Map(
    "q60_media_checksum" -> q60Sql,
    "q61_media_stats" -> q61Sql,
    "q66_frame_sample" -> q66Sql,
    "q107_media_header" -> q107Sql)
}
