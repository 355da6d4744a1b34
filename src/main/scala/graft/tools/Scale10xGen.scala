package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materializes a 10×-scale copy of the sf0.1 testdata under
  * `target/sf0.1x10/` so the ENTIRE gate query sweep can run at 10× the
  * gate scale (VERDICT r8 item #6) — the per-operator soaks sample ~20
  * operators; this feeds all 127+ queries.
  *
  * Scaling follows TPC-H semantics rather than naive row cloning:
  *   - `nation`/`region` are fixed-size dimensions at every scale factor —
  *     copied through unchanged (so broadcast sides stay broadcast-sized
  *     and name-keyed group counts stay constant, as they would at sf1).
  *   - `customer`/`supplier`/`part`/`orders`/`lineitem` replicate into 10
  *     disjoint key universes (each key column shifted by a per-replica
  *     offset, consistently across tables so every FK still joins inside
  *     its universe).
  *   - `documents.text` is word-reshuffled per replica with a ~2% verbatim
  *     slot rate (the SOAK_REALISTIC shape): pair-producing dedup operators
  *     see a 10×-bigger corpus hiding a sparse duplicate population instead
  *     of 10-clone cliques whose output volume, not operator cost, would
  *     dominate the wall time.
  *   - `embeddings.embedding` gets a per-replica elementwise ±1 sign flip
  *     with the same ~2% verbatim rate (the SOAK_SRP shape): inner products
  *     are preserved within a replica, cross-replica cosine ~0.
  *   - `events` shifts ids; `ts` passes through (10× users, same window).
  */
object Scale10xGen {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val in = sys.env.getOrElse("SCALE_IN", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SCALE_OUT", "target/sf0.1x10")
    val factor = sys.env.getOrElse("SCALE_FACTOR", "10").toInt
    generate(spark, in, out, factor)
    spark.stop()
    sys.exit(0)
  }

  /** The generator proper, separated from the `main` env plumbing so
    * Scale10xGenSpec can pin the corpus invariants (disjoint FK
    * universes, ~2% planted dup slots, word-reshuffle semantics) at a
    * small factor — a future edit can't silently weaken the 10× audit. */
  def generate(spark: SparkSession, in: String, out: String,
      factor: Int): Unit = {
    def read(name: String): DataFrame = spark.read.parquet(s"$in/$name.parquet")
    def write(df: DataFrame, name: String): Unit = {
      df.repartition(32).write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"wrote $name")
    }

    // one row per replica; ids shift by a column-specific offset so FKs
    // keep joining within their universe
    def replicate(df: DataFrame, shifts: Map[String, Long]): DataFrame = {
      val reps = (0 until factor).map { i =>
        shifts.foldLeft(df) { case (d, (c, off)) =>
          d.withColumn(c, col(c) + lit(i * off))
        }
      }
      reps.reduce(_ unionByName _)
    }

    write(read("region"), "region")
    write(read("nation"), "nation")
    write(replicate(read("customer"), Map("c_custkey" -> 10000000L)), "customer")
    write(replicate(read("supplier"), Map("s_suppkey" -> 10000000L)), "supplier")
    write(replicate(read("part"), Map("p_partkey" -> 10000000L)), "part")
    write(replicate(read("orders"),
      Map("o_orderkey" -> 100000000L, "o_custkey" -> 10000000L)), "orders")
    write(replicate(read("lineitem"),
      Map("l_orderkey" -> 100000000L, "l_partkey" -> 10000000L,
        "l_suppkey" -> 10000000L)), "lineitem")

    // sparse-dup documents: replica 0 verbatim; others word-reshuffled
    // except a seeded ~2% slot rate (disjoint shingles → not near-dups)
    val docs = replicate(read("documents"), Map("doc_id" -> 1000000L))
      .withColumn("text",
        when(col("doc_id") < 1000000L ||
             pmod(hash(col("doc_id"), lit("dupslot")), lit(50)) === 0,
          col("text"))
        .otherwise(array_join(shuffle(split(col("text"), " ")), " ")))
    write(docs, "documents")

    // sign-flip embeddings: cross-replica cosine ~0, within-replica
    // geometry preserved
    val rnd = new scala.util.Random(7)
    val patterns: Seq[Seq[Double]] =
      Seq.fill(factor)(Seq.fill(64)(if (rnd.nextBoolean()) 1.0 else -1.0))
    val pat = typedLit(patterns)
    val emb = read("embeddings")
      .crossJoin(spark.range(factor).select(col("id").as("__rep")))
      .select((col("vec_id") + col("__rep") * 1000000L).as("vec_id"),
        col("embedding"), col("label"), col("__rep"))
      .withColumn("embedding",
        when(col("__rep") === 0 ||
             pmod(hash(col("vec_id"), lit("dupslot")), lit(50)) === 0,
          col("embedding"))
        .otherwise(zip_with(col("embedding"),
            element_at(pat, col("__rep").cast("int") + 1),
            (x, s) => x.cast("double") * s)
          .cast("array<float>")))
      .drop("__rep")
    write(emb, "embeddings")

    write(replicate(read("events"),
      Map("event_id" -> 10000000L, "user_id" -> 1000000L)), "events")
  }
}
