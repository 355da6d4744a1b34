package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Shared closer for the recall-audit gates (q170/q171/q177/q178/q179).
  *
  * Each audit used to feed one lazy plan to three aggregate branches
  * (n_exact, n_band, n_common) glued by crossJoins — and every branch
  * re-executed the full band/exact arm pipelines from the parquet scan
  * (measured in round 17: q179's initial plan held 32 corpus scans and
  * its total read 13.6 s in the sf0.1 sweep). The arms are tiny pair
  * sets derived from expensive pipelines: persist each ONCE, take the
  * three counts, release, and return the same single summary row built
  * from the counted literals THROUGH THE SAME SPARK EXPRESSIONS (round/
  * division semantics identical, so the oracle hash is unchanged —
  * guide §5: cache exactly what is reused and expensive).
  *
  * The eager counts run inside the gate builder, which the bench times
  * (it clocks `fn(spark, sfDir)` construction plus execution), so no
  * work escapes measurement.
  */
object AuditUtil {
  /** (n_exact, <bandCountName>, n_common, recall, precision) — identical
    * values and schema to the three-branch crossJoin form. `keys` are
    * the pair-identity columns of both arms. */
  def recallSummary(s: SparkSession, band: DataFrame, exact: DataFrame,
      keys: Seq[String], bandCountName: String): DataFrame = {
    val b = band.persist(StorageLevel.MEMORY_AND_DISK)
    val e = exact.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // run ALL THREE counting jobs concurrently (guide §2.6 — actions
      // are only sequential because the driver calls them sequentially):
      // each branch alone underfills the cluster, and the persisted arms
      // make the overlap safe — whichever job touches a partition first
      // fills the cache, the others read it
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration.Duration
      import scala.concurrent.ExecutionContext.Implicits.global
      val fBand = Future(b.count())
      val fExact = Future(e.count())
      val fCommon = Future(b.join(e, keys, "left_semi").count())
      val nBand = Await.result(fBand, Duration.Inf)
      val nExact = Await.result(fExact, Duration.Inf)
      val nCommon = Await.result(fCommon, Duration.Inf)
      s.range(1).select(
        lit(nExact).as("n_exact"),
        lit(nBand).as(bandCountName),
        lit(nCommon).as("n_common"),
        round(lit(nCommon) / lit(nExact).cast("double"), 6).as("recall"),
        round(lit(nCommon) / lit(nBand).cast("double"), 6).as("precision"))
    } finally {
      b.unpersist(false)
      e.unpersist(false)
    }
  }
}
