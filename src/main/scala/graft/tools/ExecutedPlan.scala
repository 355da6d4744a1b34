package graft.tools

import org.apache.spark.sql.SparkSession

/** Executes the named gate queries and prints their FINAL adaptive plans
  * (`explain("formatted")` under AQE shows only the INITIAL plan; reuse
  * decisions — ReusedExchange, AQEShuffleRead, runtime join changes — only
  * exist after execution). The optimization-round measurement loop needs
  * the final plan to tell "subtree recomputed" from "exchange reused".
  * Usage: runMain graft.tools.ExecutedPlan <sfDir> <q1,q2,...>
  */
object ExecutedPlan {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    // default 8 like ExplainTool; SPARK_GRAFT_CPUS overrides so the c32
    // (bench-shaped) executed plan can be inspected too
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.split(",").foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      df.queryExecution.toRdd.count()
      println(s"===== $n =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop(); sys.exit(0)
  }
}
