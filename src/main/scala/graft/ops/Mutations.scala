package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Table-mutation operators the reference's write path implies (it declares
  * tables and overwrites their data but has no row-level mutation engine —
  * `java/lance-namespace-impls-core/.../LanceNamespace.java` exposes only
  * declare/create/drop). On Spark the idiomatic equivalent is
  * copy-on-write: mutation = join + full rewrite through the catalog, so
  * both operators here are pure DataFrame transforms whose output is handed
  * to `writeTo(...).createOrReplace()` / `INSERT OVERWRITE`.
  *
  * Scale: both are one hash shuffle per input on the key columns — no
  * driver-side state, no collect; AQE broadcasts a small incoming batch in
  * [[upsert]] automatically, and [[scd2]]'s windows share a single
  * (key, order) sort.
  */
object Mutations {

  /** MERGE-style upsert: same-key rows of `incoming` replace rows of
    * `existing` (whole-row semantics, like MERGE ... WHEN MATCHED THEN
    * UPDATE SET * WHEN NOT MATCHED THEN INSERT *); unmatched incoming rows
    * are appended. Schemas must match by name and order.
    *
    * Implemented as one full-outer join on the keys with incoming-wins
    * column selection — the null-safe join condition means null key
    * components match each other, mirroring MERGE's single-match contract
    * as long as `keys` are unique per side (enforce upstream; duplicate
    * keys in `incoming` would fan out like they would in SQL MERGE).
    */
  def upsert(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(existing.columns.sameElements(incoming.columns),
      s"upsert: schemas must match (${existing.columns.mkString(",")} vs " +
        s"${incoming.columns.mkString(",")})")
    require(keys.nonEmpty && keys.forall(existing.columns.contains),
      s"upsert: keys $keys must be columns of the inputs")
    require(!existing.columns.contains("__inc"),
      "upsert: '__inc' is a reserved internal column name")
    val e = existing.alias("__e")
    val i = incoming.withColumn("__inc", lit(1)).alias("__i")
    val cond = keys.map(k => col(s"__e.$k") <=> col(s"__i.$k")).reduce(_ && _)
    val picked = existing.columns.toSeq.map { c =>
      when(col("__i.__inc").isNotNull, col(s"__i.$c"))
        .otherwise(col(s"__e.$c")).as(c)
    }
    e.join(i, cond, "full_outer").select(picked: _*)
  }

  /** SCD type-2 history build: collapse a keyed, ordered change stream to
    * one row per run of equal `attrCol` values, with `valid_from` /
    * `valid_to` (null = open) taken from the first `ordCols` column and
    * `is_current` on the last run. `ordCols` must totally order rows
    * within a key (pass a unique tiebreaker, e.g. the event id) — ties
    * would make lag/lead order nondeterministic.
    *
    * Both windows hash-partition on the key only; a key's history must fit
    * one task, which holds for dimension-style keys (bounded distinct
    * attribute runs), the shape SCD2 is for.
    */
  def scd2(df: DataFrame, keyCol: String, ordCols: Seq[String],
      attrCol: String): DataFrame = {
    require(ordCols.nonEmpty, "scd2: need at least one ordering column")
    val reserved = Seq("valid_from", "valid_to", "is_current")
    require(reserved.forall(r => !df.columns.contains(r)),
      s"scd2: input must not already have ${reserved.mkString("/")} columns")
    val w = Window.partitionBy(col(keyCol)).orderBy(ordCols.map(col): _*)
    // __first distinguishes "no previous row" from "previous attr was
    // null": a key whose history STARTS with a null attribute value still
    // opens a run, which a bare null-safe compare against lag would drop.
    df.withColumn("__prev", lag(col(attrCol), 1).over(w))
      .withColumn("__first", lag(lit(1), 1).over(w).isNull)
      .filter(col("__first") || !(col("__prev") <=> col(attrCol)))
      .withColumn("valid_from", col(ordCols.head))
      .withColumn("valid_to", lead(col(ordCols.head), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev", "__first")
  }
}
