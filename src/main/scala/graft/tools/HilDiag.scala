package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object HilDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val cells1 = Seq((0L,0L),(0L,1L),(1L,0L),(1L,1L)).toDF("x","y")
    println("bits=1: " + cells1.select($"x", $"y",
      graft.ops.ZOrder.hilbertValue($"x", $"y", 1).as("d"))
      .as[(Long,Long,Long)].collect().sortBy(_._3).mkString(" "))
    val cells2 = (for {x <- 0 to 3; y <- 0 to 3} yield (x.toLong, y.toLong)).toDF("x","y")
    println("bits=2: " + cells2.select($"x", $"y",
      graft.ops.ZOrder.hilbertValue($"x", $"y", 2).as("d"))
      .as[(Long,Long,Long)].collect().sortBy(_._3).mkString(" "))
    println("big: " + Seq((899L, 10502L)).toDF("x","y").select(
      graft.ops.ZOrder.hilbertValue($"x", $"y", 16)).as[Long].collect().head)
    spark.stop()
  }
}
