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

  /** Heavy-key diagnostic — the report that decides WHETHER to salt:
    * the k most frequent keys with their share of all rows (count /
    * total via a broadcast 1-row aggregate) and the uniform share for
    * contrast. A key whose share is many multiples of `uniform_share`
    * concentrates that fraction of the shuffle on one reducer; feed
    * those keys to [[saltedCountDistinct]]/[[saltedSum]] or AQE skew
    * handling. One map-side-combinable count + a TakeOrdered top-k. */
  def skewReport(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"),
      count(lit(1)).as("__nkeys"))
    counts.crossJoin(broadcast(total))
      .select(col(keyCol), col("n"),
        round(col("n") / col("__total"), 6).as("share"),
        round(lit(1.0) / col("__nkeys"), 6).as("uniform_share"))
      .orderBy(col("n").desc, col(keyCol)).limit(k)
  }

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
