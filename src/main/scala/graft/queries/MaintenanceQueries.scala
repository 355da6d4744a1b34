package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.ZOrder

/** Gate coverage for the table-maintenance family. The z-value is pure
  * integer arithmetic, so the oracle replays the interleave bit-for-bit
  * as `sum_b ((x div 2^b) mod 2) * 2^(2b)` terms; the file-layout side of
  * maintenance (compaction, clustered writes) is covered by
  * MaintenanceSpec — file counts aren't SQL-expressible. */
object MaintenanceQueries {

  /** Morton z-values of (customer, order-day) for a sample of orders —
    * the clustering key a 2-D-pruned orders table sorts by. */
  def q55ZOrder(s: SparkSession, d: String): DataFrame = {
    // o_orderdate is parquet TIMESTAMP_NTZ; NTZ→LONG needs the TIMESTAMP
    // hop, which under the UTC session tz is exactly DuckDB's epoch()
    val days = expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 86400")
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"),
        pmod(col("o_custkey"), lit(65536L)).as("zx"),
        pmod(days, lit(65536L)).as("zy"))
      .withColumn("z", ZOrder.zValue(col("zx"), col("zy"), 16))
      .orderBy(col("o_orderkey"))
  }

  val q55Sql: String = {
    val terms = (0 until 16).flatMap { b =>
      Seq(s"((zx // ${1L << b}) % 2) * ${1L << (2 * b)}",
        s"((zy // ${1L << b}) % 2) * ${1L << (2 * b + 1)}")
    }.mkString(" + ")
    s"""SELECT o_orderkey, zx, zy, CAST($terms AS BIGINT) AS z
      |FROM (SELECT o_orderkey,
      |        o_custkey % 65536 AS zx,
      |        CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) % 65536 AS zy
      |      FROM orders WHERE o_orderkey % 97 = 0)
      |ORDER BY o_orderkey""".stripMargin
  }

  /** Anti-entropy table sync: bucket checksums of the corpus vs a
    * deterministically mutated snapshot (every 17th doc re-texted, every
    * 29th dropped), diffed — returns exactly the buckets holding changed
    * rows, with both sides' counts and checksums. The oracle rebuilds the
    * same 60-bit row fingerprints and decimal sums in SQL; the full-outer
    * bucket compare is the Merkle-leaf exchange a 100 TB replica sync
    * ships instead of the table. */
  def q110BucketDiff(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val snapshot = docs.filter(col("doc_id") % 29 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 17 === 0, concat(col("text"), lit(" edited")))
          .otherwise(col("text")).as("text"))
    val a = graft.ops.Maintenance.bucketChecksums(
      docs.select(col("doc_id"), col("text")), "doc_id", Seq("text"), 64)
    val b = graft.ops.Maintenance.bucketChecksums(snapshot, "doc_id", Seq("text"), 64)
    graft.ops.Maintenance.diffBuckets(a, b)
      .select(col("bucket"), col("n_a"), col("n_b"),
        col("ck_a").cast("string").as("ck_a"),
        col("ck_b").cast("string").as("ck_b"))
      .orderBy(col("bucket"))
  }

  val q110Sql: String =
    """WITH snap AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 17 = 0 THEN text || ' edited' ELSE text END AS text
      |  FROM documents WHERE doc_id % 29 <> 0),
      |ck_a AS (
      |  SELECT CAST('0x' || substr(md5('sync:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 64 AS bucket,
      |    count(*) AS n_a,
      |    sum(CAST(CAST('0x' || substr(md5(coalesce('v' || CAST(doc_id AS VARCHAR), chr(0)) || chr(1) || coalesce('v' || text, chr(0))), 1, 15) AS BIGINT) AS DECIMAL(38,0))) AS ck_a
      |  FROM documents GROUP BY 1),
      |ck_b AS (
      |  SELECT CAST('0x' || substr(md5('sync:' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 64 AS bucket,
      |    count(*) AS n_b,
      |    sum(CAST(CAST('0x' || substr(md5(coalesce('v' || CAST(doc_id AS VARCHAR), chr(0)) || chr(1) || coalesce('v' || text, chr(0))), 1, 15) AS BIGINT) AS DECIMAL(38,0))) AS ck_b
      |  FROM snap GROUP BY 1)
      |SELECT bucket, n_a, n_b,
      |  CAST(ck_a AS VARCHAR) AS ck_a, CAST(ck_b AS VARCHAR) AS ck_b
      |FROM ck_a FULL OUTER JOIN ck_b USING (bucket)
      |WHERE n_a IS NULL OR n_b IS NULL OR n_a <> n_b OR ck_a <> ck_b
      |ORDER BY bucket""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q110_bucket_diff" -> (q110BucketDiff _),
    "q55_zorder" -> (q55ZOrder _))

  val oracles: Map[String, String] = Map(
    "q110_bucket_diff" -> q110Sql,
    "q55_zorder" -> q55Sql)
}
