package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between raw Catalyst [[Expression]]s and the public [[Column]] API.
  *
  * Spark 4 made `Column` wrap a `ColumnNode` rather than an `Expression`;
  * the conversion helpers live behind `private[sql]`. Extensions that ship
  * custom expressions conventionally host a small shim inside the
  * `org.apache.spark.sql` package tree to reach them — this is that shim,
  * kept to two forwarding calls. */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** Bridge from a resolved Catalyst [[LogicalPlan]] fragment back to the
  * public DataFrame API (`Dataset.ofRows` is `private[sql]`) — the
  * optimizer routes splice ORIGINAL filter subtrees as side inputs
  * (e.g. the filtered-ANN allowed set) and need to execute them as
  * standalone queries. */
object PlanBridge {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}

/** Public aliases for `private[sql]` type-coercion types, so custom
  * expressions outside the sql package tree can implement
  * `ImplicitCastInputTypes.inputTypes` (Spark 4 hid `AbstractDataType`). */
object TypeBridge {
  type AbstractType = org.apache.spark.sql.types.AbstractDataType
}

/** Arrow IPC ⇄ DataFrame through Spark's internal converters (the same
  * machinery PySpark's createDataFrame-from-Arrow uses). */
object ArrowBridge {
  import org.apache.spark.TaskContext
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.classic.SparkSession
  import org.apache.spark.sql.execution.arrow.ArrowConverters
  import org.apache.spark.sql.types.StructType

  /** Decode one Arrow IPC stream (schema + record batches) into a
    * DataFrame; the embedded schema is authoritative. Decoding happens on
    * the driver (op-12 payloads are table-creation sized); rows are copied
    * out of the reused Arrow-backed buffers before distribution. */
  def ipcStreamToDataFrame(spark: SparkSession, bytes: Array[Byte]): DataFrame = {
    val (it, schemaOrNull) =
      ArrowConverters.fromBatchWithSchemaIterator(Iterator(bytes), TaskContext.get())
    val rows = it.map(_.copy()).toIndexedSeq
    // zero-batch streams (the reference's canonical schema-only payload)
    // leave the converter's schema null — read it from the stream header
    val schema = Option(schemaOrNull).getOrElse(readStreamSchema(bytes))
    spark.internalCreateDataFrame(
      spark.sparkContext.parallelize(rows, math.max(1, math.min(rows.size, 4))),
      schema)
  }

  private def readStreamSchema(bytes: Array[Byte]): StructType = {
    val allocator = org.apache.spark.sql.util.ArrowUtils.rootAllocator
      .newChildAllocator("graft-ipc-schema", 0, Long.MaxValue)
    val reader = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), allocator)
    try org.apache.spark.sql.util.ArrowUtils.fromArrowSchema(
      reader.getVectorSchemaRoot.getSchema)
    finally { reader.close(); allocator.close() }
  }

  /** Schema embedded in an IPC stream, without materializing rows. */
  def ipcStreamSchema(bytes: Array[Byte]): StructType = readStreamSchema(bytes)

  /** Encode a DataFrame as one Arrow IPC stream (schema + batches) — the
    * reverse of [[ipcStreamToDataFrame]], for serving spec-op-12 payloads
    * back out (catalog export, cross-engine handoff). Driver-side like
    * the decode: op-12 payloads are table-creation sized by contract.
    * A single batch carries all rows so the result is one self-contained
    * stream; empty frames encode as a schema-only stream. */
  def dataFrameToIpcStream(df: DataFrame): Array[Byte] = {
    val schema = df.schema
    val rows = df.queryExecution.executedPlan.executeCollect()
    if (rows.isEmpty)
      ArrowConverters.createEmptyArrowBatch(schema, "UTC",
        errorOnDuplicatedFieldNames = true, largeVarTypes = false)
    else {
      val chunks = ArrowConverters.toBatchWithSchemaIterator(
        rows.iterator, schema, Long.MaxValue, Long.MaxValue, "UTC",
        errorOnDuplicatedFieldNames = true, largeVarTypes = false)
      val all = chunks.toSeq
      // one batch by construction (no record/size cap) — concatenating
      // multiple schema-bearing chunks would not be a single valid stream
      require(all.size == 1, s"expected one arrow chunk, got ${all.size}")
      all.head
    }
  }
}
