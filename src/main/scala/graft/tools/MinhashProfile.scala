package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextFunctions}

/** Ad-hoc stage-by-stage timing for the MinHash-LSH pipeline (q34). */
object MinhashProfile {
  def t(name: String)(df: => DataFrame): Unit = {
    val t0 = System.nanoTime()
    val n = df.queryExecution.toRdd.count()
    println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val widened = TextFunctions.widen(docs)
    val sh = widened.select(col("doc_id").as("__id"),
      Dedup.shingles(col("text"), 3).as("__sh"))

    t("scan")(docs)
    t("widen")(widened)
    t("tokens")(widened.select(TextFunctions.tokens(col("text")).as("t")))
    t("shingles")(sh)
    t("explode+hash")(sh.select(col("__id"), explode(col("__sh")).as("__g"))
      .select(col("__id"),
        conv(substring(md5(col("__g").cast("binary")), 1, 8), 16, 10)
          .cast("long").as("__h32")))
    val numHashes = 12
    val aC = Dedup.permA(numHashes); val bC = Dedup.permB(numHashes)
    val minAggs = (0 until numHashes).map(s =>
      min(pmod(lit(aC(s)) * col("__h32") + lit(bC(s)),
        lit(Dedup.MersennePrime))).as(s"__mh$s"))
    val sig = sh.select(col("__id"), explode(col("__sh")).as("__g"))
      .select(col("__id"),
        conv(substring(md5(col("__g").cast("binary")), 1, 8), 16, 10)
          .cast("long").as("__h32"))
      .groupBy(col("__id")).agg(minAggs.head, minAggs.tail: _*)
    t("signature")(sig)
    t("full")(Dedup.minhashNearDupPairs(docs, "doc_id", "text"))
    t("full-again")(Dedup.minhashNearDupPairs(docs, "doc_id", "text"))
    spark.stop()
  }
}
