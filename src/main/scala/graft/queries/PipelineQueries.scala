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

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_curation_pipeline" -> (q80CurationPipeline _))

  val oracles: Map[String, String] = Map(
    "q80_curation_pipeline" -> q80Sql)
}
