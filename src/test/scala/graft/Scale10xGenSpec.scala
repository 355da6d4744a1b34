package graft

import org.apache.spark.sql.functions._

import graft.tools.Scale10xGen

/** Pins the invariants of the 10×-scale audit corpus generator
  * ([[Scale10xGen]]) at a small factor, so a future edit can't silently
  * weaken the full-suite scale audit: disjoint FK universes (no
  * cross-replica key collisions, FKs still join inside their universe),
  * fixed-size dimensions copied through, the ~2% planted verbatim-dup
  * slot rate (sparse duplicates, NOT clone cliques), word-reshuffle
  * semantics (token multiset preserved), and norm-preserving sign-flip
  * embeddings. */
class Scale10xGenSpec extends SparkSpec {

  private val factor = 3
  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-10x").toString
    Scale10xGen.generate(spark, sfDir, dir, factor)
    dir
  }
  private def gen(name: String) = spark.read.parquet(s"$out/$name.parquet")
  private def base(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")

  test("dimensions stay fixed-size; fact tables replicate exactly factor×") {
    assert(gen("region").count() === base("region").count())
    assert(gen("nation").count() === base("nation").count())
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "documents", "embeddings", "events"))
      assert(gen(t).count() === base(t).count() * factor, t)
  }

  test("key universes are disjoint: replicated keys stay unique") {
    for ((t, k) <- Seq("customer" -> "c_custkey", "part" -> "p_partkey",
        "orders" -> "o_orderkey", "documents" -> "doc_id",
        "embeddings" -> "vec_id", "events" -> "event_id")) {
      val df = gen(t)
      assert(df.select(k).distinct().count() === df.count(), s"$t.$k")
    }
  }

  test("FKs join inside their universe: orders→customer and " +
      "lineitem→orders resolve for every row") {
    val orders = gen("orders")
    val matchedCust = orders.join(gen("customer"),
      orders("o_custkey") === col("c_custkey"), "left_semi").count()
    assert(matchedCust === orders.count())
    val li = gen("lineitem")
    val matchedOrd = li.join(orders,
      li("l_orderkey") === orders("o_orderkey"), "left_semi").count()
    assert(matchedOrd === li.count())
    // and universes really are crossed consistently: a replica-1 order's
    // customer lives in replica 1, never replica 0
    val crossed = orders.filter(col("o_orderkey") >= 100000000L &&
      col("o_custkey") < 10000000L).count()
    assert(crossed === 0L)
  }

  test("documents: replica 0 verbatim; shifted replicas reshuffle words " +
      "but preserve the token multiset") {
    val docs = gen("documents")
    val orig = base("documents").select(col("doc_id"),
      col("text").as("orig_text"))
    // replica 0 is byte-identical
    val r0diff = docs.filter(col("doc_id") < 1000000L)
      .join(orig, "doc_id")
      .filter(col("text") =!= col("orig_text")).count()
    assert(r0diff === 0L)
    // shifted replicas: same sorted token multiset as the source row
    val shifted = docs.filter(col("doc_id") >= 1000000L)
      .withColumn("src_id", pmod(col("doc_id"), lit(1000000L)))
      .join(orig.withColumnRenamed("doc_id", "src_id"), "src_id")
    val multisetDiff = shifted.filter(
      array_sort(split(col("text"), " ")) =!=
        array_sort(split(col("orig_text"), " "))).count()
    assert(multisetDiff === 0L)
    // planted verbatim dup slots: sparse (> 0 but well under 10%)
    val n = shifted.count()
    val verbatim = shifted.filter(col("text") === col("orig_text")).count()
    assert(verbatim > 0, "no planted duplicates at all")
    assert(verbatim.toDouble / n < 0.10,
      s"dup slots too dense: $verbatim/$n — clone cliques, not sparse dups")
  }

  test("embeddings: sign-flip preserves the norm; planted verbatim " +
      "slots are sparse") {
    val emb = gen("embeddings")
    val orig = base("embeddings").select(col("vec_id").as("src_id"),
      col("embedding").as("orig_emb"))
    val joined = emb
      .withColumn("src_id", pmod(col("vec_id"), lit(1000000L)))
      .join(orig, "src_id")
    def norm2(c: String) = aggregate(col(c), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double"))
    val badNorm = joined.filter(
      abs(norm2("embedding") - norm2("orig_emb")) > lit(1e-3)).count()
    assert(badNorm === 0L, "sign flip must preserve vector norms")
    val shifted = joined.filter(col("vec_id") >= 1000000L)
    val verbatim = shifted.filter(col("embedding") === col("orig_emb")).count()
    assert(verbatim > 0, "no planted verbatim vectors")
    assert(verbatim.toDouble / shifted.count() < 0.10)
  }
}
