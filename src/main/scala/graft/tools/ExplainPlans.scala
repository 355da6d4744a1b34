package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for the queries named in args (or a
  * default round-5 set) — the `.explain("formatted")` iteration loop the
  * builder mandate requires after each operator goes green. */
object ExplainPlans {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q101_bm25", "q102_hybrid_rrf", "q103_fuzzy_names",
        "q104_triangles", "q105_profile", "q106_negative_sample")
    names.foreach { n =>
      println(s"\n=== $n ===")
      graft.SparkEntry.queries(n)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
