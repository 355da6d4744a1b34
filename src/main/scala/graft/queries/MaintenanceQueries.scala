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

  /** Hilbert indices of the same (customer, order-day) sample
    * ([[ZOrder.hilbertValue]]): every cell's curve position is pinned, so
    * the per-level rotation fold — reflections, the axis swap, the
    * (3·rx)⊕ry quadrant code — must replay bit-for-bit. The oracle runs
    * the identical fold in DuckDB's list_reduce with the initial
    * accumulator prepended (list_reduce has no init parameter). */
  def q156Hilbert(s: SparkSession, d: String): DataFrame = {
    val days = expr("CAST(CAST(o_orderdate AS TIMESTAMP) AS LONG) div 86400")
    Tables.orders(s, d)
      .filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey"),
        pmod(col("o_custkey"), lit(65536L)).as("zx"),
        pmod(days, lit(65536L)).as("zy"))
      .withColumn("h", ZOrder.hilbertValue(col("zx"), col("zy"), 16))
      .orderBy(col("o_orderkey"))
  }

  // The obvious struct accumulator is NOT used: DuckDB 1.0's list_reduce
  // aliases struct-accumulator fields from the second merge on (a field
  // reading acc.a observes the CURRENT iteration's freshly-computed 'a'
  // — minimal repro: list_reduce([{a:1,b:0},{..},{..}],
  // (acc,e)->{a: acc.a+1, b: acc.a}) yields b = 3, not 2). The whole
  // (x, y, d) rotation state therefore rides ONE packed HUGEINT:
  // state = d·2^40 + (x+2^19)·2^20 + (y+2^19), unpacked per merge with
  // exact integer // and %.
  val q156Sql: String = {
    val OFF = 1L << 19; val P20 = 1L << 20; val P40 = 1L << 40
    val y0 = s"(acc % $P20 - $OFF)"
    val x0 = s"((acc // $P20) % $P20 - $OFF)"
    val d0 = s"(acc // CAST($P40 AS HUGEINT))"
    val sE = "CAST(power(2, CAST(e AS INT)) AS BIGINT)"
    val rx = s"(CASE WHEN (CAST($x0 AS BIGINT) & $sE) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN (CAST($y0 AS BIGINT) & $sE) > 0 THEN 1 ELSE 0 END)"
    val nx = s"(CASE WHEN $ry = 0 THEN CASE WHEN $rx = 1 THEN $sE - 1 - $y0 ELSE $y0 END ELSE $x0 END)"
    val ny = s"(CASE WHEN $ry = 0 THEN CASE WHEN $rx = 1 THEN $sE - 1 - $x0 ELSE $x0 END ELSE $y0 END)"
    val nd = s"($d0 + $sE * $sE * xor(3 * $rx, $ry))"
    val merge = s"CAST($nd AS HUGEINT) * CAST($P40 AS HUGEINT) + " +
      s"CAST(($nx + $OFF) AS HUGEINT) * $P20 + CAST(($ny + $OFF) AS HUGEINT)"
    s"""SELECT o_orderkey, zx, zy,
       |  CAST(list_reduce(
       |    list_prepend(
       |      CAST(zy + $OFF AS HUGEINT) + CAST(zx + $OFF AS HUGEINT) * $P20,
       |      list_transform(range(15, -1, -1), b -> CAST(b AS HUGEINT))),
       |    (acc, e) -> $merge) // CAST($P40 AS HUGEINT) AS BIGINT) AS h
       |FROM (SELECT o_orderkey,
       |        o_custkey % 65536 AS zx,
       |        CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) % 65536 AS zy
       |      FROM orders WHERE o_orderkey % 97 = 0)
       |ORDER BY o_orderkey""".stripMargin
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
    "q55_zorder" -> (q55ZOrder _),
    "q156_hilbert" -> (q156Hilbert _))

  val oracles: Map[String, String] = Map(
    "q110_bucket_diff" -> q110Sql,
    "q55_zorder" -> q55Sql,
    "q156_hilbert" -> q156Sql)
}
