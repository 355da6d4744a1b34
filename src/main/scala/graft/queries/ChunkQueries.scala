package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Chunking

/** Gate coverage for the chunking family over `documents`: overlapping
  * token-window chunking (the RAG / context-budget primitive) and
  * corpus-level exact segment dedup (the C4-style repeated-lines pass).
  * Both are shuffle-free or single-shuffle plans — see [[graft.ops.Chunking]].
  */
object ChunkQueries {

  /** 32-token windows, stride 24 (8-token overlap); chunks are reported as
    * an 8-hex signature so the gate pins the exact window contents without
    * hauling text through the compare. */
  def q92Chunking(s: SparkSession, d: String): DataFrame =
    Chunking.chunk(Tables.documents(s, d), "doc_id", "text",
        chunkSize = 32, stride = 24)
      .select(col("__id").as("doc_id"), col("chunk_id"), col("n_toks"),
        substring(md5(col("chunk_text").cast("binary")), 1, 8).as("chunk_sig"))
      .orderBy(col("doc_id"), col("chunk_id"))

  val q92Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents
      |), n AS (SELECT doc_id, toks, len(toks) AS n FROM tok
      |), c AS (
      |  SELECT doc_id, toks,
      |    unnest(range(0, 1 + (greatest(n - 32, 0) + 23) // 24)) AS chunk_id
      |  FROM n
      |)
      |SELECT doc_id, chunk_id,
      |  len(list_slice(toks, chunk_id*24+1, chunk_id*24+32)) AS n_toks,
      |  substr(md5(array_to_string(list_slice(toks, chunk_id*24+1, chunk_id*24+32), ' ')), 1, 8) AS chunk_sig
      |FROM c ORDER BY doc_id, chunk_id""".stripMargin

  /** Corpus-wide 8-token segment dedup: per document, how many segments it
    * holds and how many it wins (first occurrence by (doc, position)). */
  def q95SegmentDedup(s: SparkSession, d: String): DataFrame =
    Chunking.segmentDedup(Tables.documents(s, d), "doc_id", "text", segSize = 8)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("doc_id"))

  val q95Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM documents
      |), n AS (SELECT doc_id, toks, len(toks) AS n FROM tok
      |), seg AS (
      |  SELECT doc_id, toks,
      |    unnest(range(0, 1 + (greatest(n - 8, 0) + 7) // 8)) AS seg_id
      |  FROM n
      |), h AS (
      |  SELECT doc_id, seg_id,
      |    md5(array_to_string(list_slice(toks, seg_id*8+1, seg_id*8+8), ' ')) AS seg_hash
      |  FROM seg
      |), win AS (SELECT seg_hash, min(doc_id*1000000 + seg_id) AS w FROM h GROUP BY seg_hash)
      |SELECT doc_id, count(*) AS n_segs,
      |  CAST(sum(CASE WHEN doc_id*1000000 + seg_id = w THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
      |FROM h JOIN win USING (seg_hash)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Intra-document repeated-tile removal with reassembly (the in-doc
    * counterpart of q95): every 5th document gets its first 4 tokens
    * repeated 3× prepended — planted boilerplate the 4-token tiling must
    * collapse to one occurrence — and the gate hash-pins the full deduped
    * text, so tile boundaries, first-occurrence choice, and reassembly
    * order are all on the hook. Zero-shuffle plan (per-row array ops). */
  def q126IntradocDedup(s: SparkSession, d: String): DataFrame = {
    val head = array_join(
      slice(graft.ops.TextFunctions.tokens(col("text")), 1, 4), " ")
    val corpus = Tables.documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 5 === 0,
        concat(repeat(concat(head, lit(" ")), 3), col("text")))
        .otherwise(col("text")).as("text"))
    Chunking.intraDocTileDedup(corpus, "doc_id", "text", k = 4)
      .orderBy(col("doc_id"))
  }

  val q126Sql: String =
    """WITH corpus AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 5 = 0 THEN
      |      repeat(array_to_string(
      |        (regexp_split_to_array(lower(trim(text)), '\s+'))[1:4], ' ') || ' ', 3) || text
      |    ELSE text END AS text
      |  FROM documents
      |), tok AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t FROM corpus
      |), tiles AS (
      |  SELECT doc_id, list_transform(range(0, CAST(ceil(len(t) / 4.0) AS INT)),
      |    i -> array_to_string(t[i*4+1:i*4+4], ' ')) AS tl
      |  FROM tok
      |), kept AS (
      |  SELECT doc_id, tl,
      |    list_filter(list_transform(range(1, len(tl) + 1),
      |      i -> CASE WHEN list_position(tl, tl[i]) = i THEN tl[i] ELSE NULL END),
      |      x -> x IS NOT NULL) AS kp
      |  FROM tiles)
      |SELECT doc_id, CAST(len(tl) AS BIGINT) AS n_tiles,
      |  CAST(len(kp) AS BIGINT) AS n_kept,
      |  array_to_string(kp, ' ') AS text_dedup
      |FROM kept ORDER BY doc_id""".stripMargin

  /** Corpus-frequency boilerplate removal (CCNet-style): every 3rd
    * document gets a fixed 10-token template header prepended — with
    * 5-token tiling the header is exactly 2 segments whose document
    * frequency (~n/3) blows through maxDf=10, so the pass must strip it
    * from EVERY planted document (unlike q95's keep-one-winner dedup)
    * while the body segments, df=1, survive. The gate hash-pins the full
    * reassembled text, putting tiling, the df census, the broadcast
    * boilerplate join, and in-order reassembly all on the hook. */
  def q132Boilerplate(s: SparkSession, d: String): DataFrame = {
    val corpus = Tables.documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 3 === 0,
        concat(lit("subscribe to our newsletter for updates click here " +
          "to unsubscribe "), col("text")))
        .otherwise(col("text")).as("text"))
    Chunking.boilerplateRemoval(corpus, "doc_id", "text",
        segSize = 5, maxDf = 10)
      .orderBy(col("doc_id"))
  }

  val q132Sql: String =
    """WITH corpus AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN
      |      'subscribe to our newsletter for updates click here to unsubscribe ' || text
      |    ELSE text END AS text
      |  FROM documents
      |), tok AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks FROM corpus
      |), n AS (SELECT doc_id, toks, len(toks) AS n FROM tok
      |), seg AS (
      |  SELECT doc_id, toks,
      |    unnest(range(0, 1 + (greatest(n - 5, 0) + 4) // 5)) AS seg_id
      |  FROM n
      |), h AS (
      |  SELECT doc_id, seg_id,
      |    array_to_string(list_slice(toks, seg_id*5+1, seg_id*5+5), ' ') AS seg_text
      |  FROM seg
      |), freq AS (SELECT seg_text, count(DISTINCT doc_id) AS df FROM h GROUP BY 1)
      |SELECT doc_id, count(*) AS n_segs,
      |  CAST(sum(CASE WHEN df <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  coalesce(string_agg(CASE WHEN df <= 10 THEN seg_text END, ' ' ORDER BY seg_id), '') AS text_clean
      |FROM h JOIN freq USING (seg_text)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Content-defined chunking ([[Chunking.contentDefinedChunks]], 4-token
    * rolling window, divisor 8 → ~8-token expected chunks): every chunk's
    * start, length, and full text are pinned, so the boundary rule (hash
    * of the window ENDING at the cut ≡ 0 mod 8), the no-trailing-cut
    * clamp, and the tiling reassembly must replay exactly. */
  def q149CdcChunks(s: SparkSession, d: String): DataFrame =
    Chunking.contentDefinedChunks(Tables.documents(s, d), "doc_id", "text",
        k = 4, divisor = 8)
      .select(col("__id").as("doc_id"), col("chunk_id"), col("start_pos"),
        col("n_toks"), col("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_id"))

  val q149Sql: String =
    """WITH tok AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS toks
      |  FROM documents
      |), cu AS (
      |  SELECT doc_id, toks, len(toks) AS n,
      |    [i FOR i IN range(3, len(toks) - 1) IF
      |       CAST('0x' || substr(md5(array_to_string(
      |         list_slice(toks, i - 2, i + 1), ' ')), 1, 8) AS BIGINT) % 8 = 0]
      |      AS cuts
      |  FROM tok
      |), st AS (
      |  SELECT doc_id, toks, n,
      |    list_prepend(0, list_transform(cuts, c -> c + 1)) AS starts
      |  FROM cu
      |), ch AS (
      |  SELECT doc_id, toks, n, starts, i AS cidx
      |  FROM st, UNNEST(range(1, len(starts) + 1)) AS t(i)
      |)
      |SELECT doc_id, CAST(cidx - 1 AS BIGINT) AS chunk_id,
      |  CAST(starts[cidx] AS BIGINT) AS start_pos,
      |  CAST(coalesce(starts[cidx + 1], n) - starts[cidx] AS BIGINT) AS n_toks,
      |  array_to_string(list_slice(toks, starts[cidx] + 1,
      |    coalesce(starts[cidx + 1], n)), ' ') AS chunk_text
      |FROM ch ORDER BY doc_id, chunk_id""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q149_cdc_chunks" -> (q149CdcChunks _),
    "q92_chunking" -> (q92Chunking _),
    "q95_segment_dedup" -> (q95SegmentDedup _),
    "q126_intradoc_dedup" -> (q126IntradocDedup _),
    "q132_boilerplate" -> (q132Boilerplate _))

  val oracles: Map[String, String] = Map(
    "q149_cdc_chunks" -> q149Sql,
    "q92_chunking" -> q92Sql,
    "q95_segment_dedup" -> q95Sql,
    "q126_intradoc_dedup" -> q126Sql,
    "q132_boilerplate" -> q132Sql)
}
