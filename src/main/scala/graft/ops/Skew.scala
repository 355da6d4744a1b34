package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation patterns. At 100 TB a handful of hot keys
  * (empty strings, bot users, boilerplate docs) concentrate a naive
  * `groupBy(key).agg(countDistinct(v))` onto single reducers; salting by a
  * hash of the VALUE splits each hot key across `buckets` reducers while
  * keeping exactness — every distinct value lands in exactly one bucket, so
  * per-bucket distinct counts add up to the global distinct count.
  */
object Skew {

  /** Exact distinct count per key, salted into `buckets` sub-aggregations.
    * Three map-side-combinable stages, no single-reducer hot spot:
    * (key, salt(v), v) dedup → per-(key,salt) counts → per-key sum. */
  def saltedCountDistinct(df: DataFrame, keyCol: String, valueCol: String,
      buckets: Int = 32): DataFrame =
    df.select(col(keyCol), col(valueCol))
      .filter(col(valueCol).isNotNull) // COUNT(DISTINCT v) ignores nulls
      .withColumn("__salt", pmod(hash(col(valueCol)), lit(buckets)))
      .groupBy(col(keyCol), col("__salt"), col(valueCol)).agg(lit(1).as("__one"))
      .groupBy(col(keyCol), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("n_distinct"))

  /** Salted sum for hot-key additive aggregation: pre-aggregate on
    * (key, random-ish salt from a row attribute), then combine. With
    * algebraic aggregates Spark's partial aggregation already does this;
    * the explicit form exists for aggregations forced through a single
    * grouping (e.g. exact collect-heavy pipelines) and as the documented
    * pattern. */
  def saltedSum(df: DataFrame, keyCol: String, valueCol: String,
      saltCol: String, buckets: Int = 32): DataFrame =
    df.withColumn("__salt", pmod(hash(col(saltCol)), lit(buckets)))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(keyCol))
      .agg(sum(col("__partial")).as("total"))
}
