package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level diagnosis of the inverted-index similarity joins on the
  * 10×-audit corpus (round-9 q98/q100 investigation): counts gram rows,
  * distinct grams, the df distribution head, prefix sizes, candidate
  * pairs, and final pairs, timing each stage. Read-only; not part of the
  * gate. */
object PrefixDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/sf0.1x10")
    val theta = sys.env.getOrElse("DIAG_THETA", "0.9").toDouble
    val docs = graft.queries.Tables.documents(spark, d)
      .select(col("doc_id"), col("text"))
    val trunc = docs.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        array_join(slice(graft.ops.TextFunctions.tokens(col("text")), 1, 20), " ")
          .as("text"))
    val corpus = docs.unionByName(trunc)

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val rows = graft.ops.Dedup.shingleRows(corpus, "doc_id", "text", 3)
      .select(col("__id"), col("__g")).distinct().cache()
    val nRows = timed("gram rows (distinct)")(rows.count())
    println(s"  rows=$nRows")
    val dfreq = rows.groupBy(col("__g")).agg(count(lit(1)).as("__df")).cache()
    val nGrams = timed("distinct grams")(dfreq.count())
    val sumDf2 = dfreq.agg(sum(col("__df") * col("__df"))).first().getLong(0)
    println(s"  grams=$nGrams  sum_df2=$sumDf2")
    println("  df head: " + dfreq.orderBy(col("__df").desc).limit(5)
      .collect().map(r => r.getLong(1)).mkString(","))

    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col("__id"))
    val sized = rows.join(dfreq, Seq("__g"))
      .select(col("__id"), col("__g"),
        row_number().over(byDoc.orderBy(col("__df"), col("__g"))).as("__pos"),
        count(lit(1)).over(byDoc).as("__n"))
    val pref = sized.filter(col("__pos") <=
        col("__n") - ceil(lit(theta) * col("__n") - lit(1e-9)) + 1)
      .select(col("__id"), col("__g")).cache()
    val nPref = timed("prefix rows")(pref.count())
    // join mass for containment: prefixdf * df summed over grams
    val pdf = pref.groupBy(col("__g")).agg(count(lit(1)).as("__pdf"))
    val mass = pdf.join(dfreq, Seq("__g"))
      .agg(sum(col("__pdf") * col("__df"))).first().getLong(0)
    println(s"  prefix_rows=$nPref  containment_join_mass=$mass")

    val cand = pref.select(col("__id").as("doc_a"), col("__g"))
      .join(rows.select(col("__id").as("doc_b"), col("__g")), Seq("__g"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct().cache()
    val nCand = timed("containment candidates")(cand.count())
    println(s"  candidates=$nCand")

    val sets = rows.groupBy(col("__id")).agg(collect_list(col("__g")).as("__sh")).cache()
    timed("sets build")(sets.count())
    val fin = timed("verify join")(
      cand.join(sets.select(col("__id").as("doc_a"), col("__sh").as("__sha")), Seq("doc_a"))
        .join(sets.select(col("__id").as("doc_b"), col("__sh").as("__shb")), Seq("doc_b"))
        .withColumn("containment",
          size(array_intersect(col("__sha"), col("__shb"))).cast("double")
            / size(col("__sha")))
        .filter(col("containment") >= theta).count())
    println(s"  final_pairs=$fin")
    spark.stop(); sys.exit(0)
  }
}
