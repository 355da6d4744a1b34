package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Column profiling: per-column null counts, exact distinct counts, and
  * min/max — the data-quality / schema-drift report a pipeline runs over
  * every new table drop before trusting it.
  *
  * Shape: one column-pruned aggregation pass PER COLUMN, unioned. The
  * tempting "single pass" alternative — one aggregate carrying multiple
  * exact count-distincts — plans as an Expand that multiplies the row
  * stream by |cols|+1 and shuffles the whole widened stream into one
  * dedup aggregate (measured 6× slower at sf0.1 than the per-column
  * form). Against a columnar source the per-column passes read exactly
  * one column each, so total bytes scanned equal the single-pass scan,
  * every pass is an ordinary two-stage hash aggregate, and passes for
  * different columns run as independent jobs. Min/max evaluate on the
  * NATIVE column type (lexicographic min of a stringified number would
  * be wrong) and stringify only for the uniform report schema.
  */
object Profiling {

  /** Profile `cols` of `df`. Columns must stringify portably (integers,
    * strings, dates — not doubles, whose string forms are
    * engine-specific).
    *
    * @return one row per column: (column, n_rows, n_nulls, n_distinct,
    *         min_val, max_val); n_distinct excludes nulls, min/max are
    *         null for all-null columns
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need >= 1 column")
    cols.map { c =>
      df.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_val"),
          max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_ unionByName _)
  }

  /** Schema drift between two table versions: one row per changed
    * column — `added`, `removed`, `retyped` (old/new SQL types shown),
    * or `renullabled`. The report a pipeline gates a new drop on before
    * q105-style content profiling; driver-side (schemas are metadata). */
  def schemaDiff(spark: SparkSession, before: StructType,
      after: StructType): DataFrame = {
    val b = before.fields.map(f => f.name -> f).toMap
    val a = after.fields.map(f => f.name -> f).toMap
    val rows =
      a.keySet.diff(b.keySet).toSeq.sorted.map(n =>
        (n, "added", null: String, a(n).dataType.sql)) ++
      b.keySet.diff(a.keySet).toSeq.sorted.map(n =>
        (n, "removed", b(n).dataType.sql, null: String)) ++
      a.keySet.intersect(b.keySet).toSeq.sorted.flatMap { n =>
        if (b(n).dataType != a(n).dataType)
          Some((n, "retyped", b(n).dataType.sql, a(n).dataType.sql))
        else if (b(n).nullable != a(n).nullable)
          Some((n, "renullabled", b(n).nullable.toString, a(n).nullable.toString))
        else None
      }
    import spark.implicits._
    rows.toDF("column", "change", "before", "after")
  }
}
