package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of the named gate queries — the
  * `.explain` feedback loop the build mandate requires after each new
  * operator (shuffle count, broadcast sides, TakeOrdered vs Sort,
  * WholeStageCodegen spans). Usage:
  *   runMain graft.tools.ExplainTool <sfDir> <q1,q2,...>
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.split(",").foreach { n =>
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop(); sys.exit(0)
  }
}
