package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir. At 100 TB
  * these would be multi-file datasets behind the graft catalog (see
  * [[graft.catalog.GraftCatalog]]); the loader API is the same either way —
  * `spark.read.parquet(dir)` scales to any number of files and Catalyst
  * handles partition pruning / pushdown identically.
  */
object Tables {
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame  = apply(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame    = apply(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame  = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = apply(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame    = apply(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame    = apply(s, d, "region")
  def documents(s: SparkSession, d: String): DataFrame = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** `events.ts` has shipped as parquet timestamp[ns] (read as long via the
    * legacy conf) in some data drops and timestamp[us] (read as
    * TIMESTAMP_NTZ) in others — adapt to whichever physical type this drop
    * carries and normalize to a session-tz TimestampType at micro
    * precision, which matches DuckDB's TIMESTAMP value (sessions run UTC).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = apply(s, d, "events")
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      // integral division: long/long with `/` is double-valued in Spark and
      // rounds epoch-nanos (>2^53) to ~256 ns — `div` truncates exactly like
      // DuckDB's ns→us read
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
      // already session-tz micros — nothing to normalize
      case TimestampType => raw
      // any other physical type is schema drift in a data drop: fail fast at
      // load with the observed type, not downstream with a confusing cast
      // error or a silent oracle hash-mismatch (ADVICE r8)
      case other => throw new IllegalArgumentException(
        s"events.ts: unsupported physical type $other — expected " +
          "timestamp[ns]-as-long, TIMESTAMP_NTZ(us), or TIMESTAMP")
    }
  }
}
