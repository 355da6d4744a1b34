package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-window chunking — the RAG / training-pipeline primitive the
  * reference's data plane feeds (documents → fixed-budget model inputs).
  * Reference analog: the corpus tables the namespace serves (see
  * `docs/src/hive2.md` table layout); chunking itself is an extension op.
  *
  * Everything is a single narrow projection + explode: no key shuffle
  * (only `widen`'s round-robin on under-partitioned input), so it scales
  * embarrassingly — 100 TB of documents chunk at scan speed.
  * The per-row chunk count is computed arithmetically (never by iterating
  * the token array twice), and `slice` is a codegen'd builtin, so the hot
  * path stays inside whole-stage codegen (no interpreted HOF lambdas —
  * the repo-wide CollapseProject trap).
  */
object Chunking {

  /** Overlapping token windows: starts 0, stride, 2·stride, …; the last
    * chunk is the first one whose window reaches the end of the document
    * (tail tokens are always covered exactly once by the final window).
    *
    * Output: (`__id`, `chunk_id`, `n_toks`, `chunk_text`); `chunk_id` and
    * `n_toks` are long (engine-portable types), `chunk_text` the
    * space-joined window.
    *
    * @param stride window start step; `stride == chunkSize` gives
    *               non-overlapping segments */
  def chunk(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunk: chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"chunk: stride must be in [1, chunkSize], got $stride")
    // nChunks = 1 + ceil(max(n - chunkSize, 0) / stride), integrally:
    // documents shorter than one window still emit exactly one chunk.
    // Column `/` is double division; operands are small ints so the
    // quotient is exact and floor() recovers the integral ceil-div.
    val n = size(col("__toks"))
    val nChunks = (lit(1) + floor(
      (greatest(n - chunkSize, lit(0)) + lit(stride - 1)) / lit(stride)))
      .cast("int")
    TextFunctions.widen(df)
      .select(col(idCol).as("__id"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
      .select(col("__id"), col("__toks"),
        explode(sequence(lit(0), nChunks - 1)).as("__c"))
      .select(col("__id"),
        col("__c").cast("long").as("chunk_id"),
        size(slice(col("__toks"), col("__c") * stride + 1, lit(chunkSize)))
          .cast("long").as("n_toks"),
        array_join(
          slice(col("__toks"), col("__c") * stride + 1, lit(chunkSize)), " ")
          .as("chunk_text"))
  }

  /** Non-overlapping fixed-width segments (stride = chunkSize). */
  def segments(df: DataFrame, idCol: String, textCol: String,
      segSize: Int): DataFrame =
    chunk(df, idCol, textCol, segSize, segSize)

  /** Corpus-level exact segment dedup (the C4/CCNet "repeated lines"
    * pass at segment granularity): every distinct segment keeps exactly
    * one winner occurrence — the minimum (doc, position) across the whole
    * corpus — and all other occurrences are flagged dropped.
    *
    * One hash-shuffle on the segment fingerprint (only (hash, doc, pos)
    * triples move, never text), then a broadcast-or-hash join back — the
    * minimal movement for corpus-wide dedup, same shape as
    * [[Dedup.exactDedup]]. Winner order is the lexicographic struct
    * (doc, pos) min — exact for any orderable id type and any document
    * length (no packed-arithmetic overflow ceiling).
    *
    * Output: one row per segment occurrence:
    * (doc_id, seg_id, seg_hash, kept). */
  def segmentDedup(df: DataFrame, idCol: String, textCol: String,
      segSize: Int): DataFrame = {
    val segs = segments(df, idCol, textCol, segSize)
      .select(col("__id").as("doc_id"), col("chunk_id").as("seg_id"),
        md5(col("chunk_text").cast("binary")).as("seg_hash"))
    val pos: Column = struct(col("doc_id"), col("seg_id"))
    val winners = segs
      .groupBy(col("seg_hash")).agg(min(pos).as("__win"))
    segs.join(winners, Seq("seg_hash"))
      .select(col("doc_id"), col("seg_id"), col("seg_hash"),
        (pos === col("__win")).as("kept"))
  }

  /** Intra-document repeated-segment removal with text reassembly — the
    * C4-style preprocessing step that strips a document's OWN repetition
    * (boilerplate runs, copy-paste loops) while [[segmentDedup]] handles
    * repetition ACROSS documents. The token stream is tiled into
    * consecutive non-overlapping k-token segments (last tile may be
    * short); a tile whose content equals an earlier tile in the same
    * document is dropped (first occurrence kept, order preserved) and the
    * survivors are re-joined into the deduped text.
    *
    * Scale: the whole operator is per-row array arithmetic — tile
    * construction, first-occurrence filter (`array_position` against the
    * tile list == own index), and reassembly all happen inside one
    * projection. ZERO shuffles at any corpus size; the in-row cost is
    * O(tiles²) with tiles = len/k, bounded by document length, not corpus
    * size.
    *
    * Output: (idCol, n_tiles, n_kept, text_dedup). */
  def intraDocTileDedup(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"intraDocTileDedup: k must be >= 1, got $k")
    val nTiles = ceil(size(col("__t")).cast("double") / k).cast("int")
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).as("__t"))
      .withColumn("__tiles", transform(sequence(lit(0), nTiles - 1),
        i => array_join(slice(col("__t"), i * k + 1, lit(k)), " ")))
      .withColumn("__kept", filter(col("__tiles"),
        (t, i) => array_position(col("__tiles"), t) === (i + 1).cast("long")))
      .select(col(idCol),
        size(col("__tiles")).cast("long").as("n_tiles"),
        size(col("__kept")).cast("long").as("n_kept"),
        array_join(col("__kept"), " ").as("text_dedup"))
  }

  /** Content-defined chunking (the rsync/LBFS rolling-hash boundary
    * scheme, token granularity): a chunk boundary falls AFTER token `i`
    * exactly when the hash of the `k`-token window ending at `i` is
    * ≡ 0 mod `divisor` — boundaries are decided by CONTENT, not
    * position, so inserting or deleting tokens reshuffles only the
    * chunks around the edit while every later chunk re-aligns
    * byte-identically (the property fixed-stride [[chunk]] windows
    * cannot have, and the reason dedup storage keys on CDC chunks).
    * Expected chunk length ≈ `divisor` tokens; the trailing position
    * never cuts, so every document emits ≥ 1 chunk and chunks tile the
    * token sequence exactly.
    *
    * Shape: cut detection is codegen'd per-position rows (scan-parallel,
    * linear); bounds assemble with one id-keyed window over START rows
    * (tiny ints, ≤ chunks-per-doc each) and one id join back to the
    * token arrays — the only shuffles, both keyed and narrow. The window
    * hash is the [[Dedup.shingleHash]] md5-prefix family, so the DuckDB
    * oracle replays it exactly.
    *
    * Output: (`__id`, `chunk_id`, `start_pos`, `n_toks`, `chunk_text`). */
  def contentDefinedChunks(df: DataFrame, idCol: String, textCol: String,
      k: Int, divisor: Int): DataFrame = {
    require(k >= 1, s"contentDefinedChunks: k must be >= 1, got $k")
    require(divisor >= 2, s"contentDefinedChunks: divisor must be >= 2, got $divisor")
    val withN = TextFunctions.widen(df).filter(col(idCol).isNotNull)
      .select(col(idCol).as("__id"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
    // candidate cut positions i ∈ [k-1, n-2] as ROWS (0-based; the last
    // token never cuts): explode-over-sequence is codegen'd and the window
    // hash is one md5 per row — never a higher-order-function lambda. The
    // HOF formulation (filter/transform arrays fed to posexplode) hits
    // GenerateExec's CodegenFallback, which re-evaluates the whole cut
    // chain once per OUTPUT chunk — measured ~7x slower at sf0.1.
    // sequence() descends when start > stop, so clamp the stop and reject
    // the phantom position on short docs below.
    val cutRows = withN
      .select(col("__id"), col("__n"), col("__toks"),
        explode(sequence(lit(k - 1), greatest(col("__n") - 2, lit(k - 1))))
          .as("__i"))
      .filter(col("__i") <= col("__n") - 2)
      .filter(Dedup.shingleHash(array_join(
        slice(col("__toks"), col("__i") - (k - 2), lit(k)), " "))
        % divisor === 0)
      .select(col("__id"), col("__i"))
    // chunk bounds: id-keyed window over START rows (tiny ints, ≤
    // chunks-per-doc rows each), then one id join back to the tokens
    val startRows = withN.select(col("__id"), lit(0).as("__s"))
      .unionByName(cutRows.select(col("__id"), (col("__i") + 1).as("__s")))
    val w = Window.partitionBy(col("__id")).orderBy(col("__s"))
    val bounds = startRows
      .withColumn("__c", row_number().over(w) - 1)
      .withColumn("__e0", lead(col("__s"), 1).over(w))
    bounds.join(withN, Seq("__id"))
      .select(col("__id"),
        col("__c").cast("long").as("chunk_id"),
        col("__s").cast("long").as("start_pos"),
        (coalesce(col("__e0"), col("__n")) - col("__s")).cast("long")
          .as("n_toks"),
        array_join(slice(col("__toks"), col("__s") + 1,
          coalesce(col("__e0"), col("__n")) - col("__s")), " ")
          .as("chunk_text"))
  }

  /** Corpus-frequency boilerplate removal (the CCNet/RefinedWeb "drop
    * paragraphs that repeat across the corpus" pass): a segment whose
    * DOCUMENT frequency exceeds `maxDf` is boilerplate — navigation
    * chrome, licence headers, templated footers — and is removed from
    * EVERY document it appears in, with the survivors re-joined in
    * original order. Complements [[segmentDedup]] (which keeps one global
    * winner per segment — dedup semantics) and [[intraDocTileDedup]]
    * (which only sees a document's own repetition).
    *
    * Scale shape for 100 TB: segment construction is the zero-shuffle
    * [[segments]] explode; the document-frequency census is one map-side-
    * combinable aggregate keyed on the segment hash (`count(DISTINCT doc)`
    * resolves to a two-phase partial); the boilerplate SET — segments with
    * df > maxDf — is tiny BY DEFINITION (at most total-segments/maxDf
    * entries, and real boilerplate is a handful of templates), so the
    * flagging join is an explicit broadcast instead of a corpus shuffle;
    * reassembly is one aggregate keyed on the doc id. Only (hash, doc)
    * pairs and the per-doc segment lists ever move.
    *
    * Output: (doc_id, n_segs, n_kept, text_clean), one row per input
    * document (docs whose every segment was boilerplate keep an empty
    * string). */
  def boilerplateRemoval(df: DataFrame, idCol: String, textCol: String,
      segSize: Int, maxDf: Int): DataFrame = {
    require(segSize >= 1, s"boilerplateRemoval: segSize must be >= 1, got $segSize")
    require(maxDf >= 1, s"boilerplateRemoval: maxDf must be >= 1, got $maxDf")
    val segs = segments(df, idCol, textCol, segSize)
      .select(col("__id").as("doc_id"), col("chunk_id").as("seg_id"),
        col("chunk_text"),
        md5(col("chunk_text").cast("binary")).as("__h"))
    val boiler = segs.groupBy(col("__h"))
      .agg(countDistinct(col("doc_id")).as("__df"))
      .filter(col("__df") > maxDf)
      .select(col("__h"), lit(true).as("__boiler"))
    segs.join(broadcast(boiler), Seq("__h"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("__boiler").isNull, 1L).otherwise(0L)).as("n_kept"),
        // collect_list skips nulls, so dropped segments vanish before the
        // in-group sort; the struct sorts on seg_id first → original order
        array_join(transform(
          array_sort(collect_list(when(col("__boiler").isNull,
            struct(col("seg_id"), col("chunk_text"))))),
          s => s.getField("chunk_text")), " ").as("text_clean"))
  }
}
