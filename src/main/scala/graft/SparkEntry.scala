package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps operator-coverage names to DataFrame builders over the
  * scale-factor dir; `oracleSql` holds the DuckDB-equivalent SQL for the
  * driver's correctness gate. Column names are aliased identically on both
  * sides (the driver hash-compares after sorting columns by name).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.all ++ RelationalQueries2.all ++ CatalogQueries.all ++ TextQueries.all ++
      DedupQueries.all ++ SimilarityQueries.all ++ StreamQueries.all ++
      MultimodalQueries.all ++ TemporalQueries.all ++ SkewQueries.all ++
      PipelineQueries.all ++ CurationQueries.all ++ MaintenanceQueries.all ++
      MutationQueries.all ++ ChunkQueries.all ++ GraphQueries.all ++
      RetrievalQueries.all ++ ResolutionQueries.all ++ ScalarIndexQueries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ RelationalQueries2.oracles ++ CatalogQueries.oracles ++ TextQueries.oracles ++
      DedupQueries.oracles ++ SimilarityQueries.oracles ++ StreamQueries.oracles ++
      MultimodalQueries.oracles ++ TemporalQueries.oracles ++ SkewQueries.oracles ++
      PipelineQueries.oracles ++ CurationQueries.oracles ++ MaintenanceQueries.oracles ++
      MutationQueries.oracles ++ ChunkQueries.oracles ++ GraphQueries.oracles ++
      RetrievalQueries.oracles ++ ResolutionQueries.oracles ++ ScalarIndexQueries.oracles
}
