package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Arrow IPC ingestion — the Spark equivalent of the reference's
  * `createTable(request, byte[] ipcStream)` (spec op 12: declare + write
  * initial Arrow data, `Hive2Namespace.java:313,514-518`). The reference
  * hands the bytes to `Dataset.create`; here the IPC stream becomes a
  * DataFrame (embedded schema authoritative, `SURVEY.md §1.3`) which writes
  * to the catalog table through the normal DSv2 write path.
  */
object ArrowIngest {

  def ipcToDataFrame(spark: SparkSession, ipcStream: Array[Byte]): DataFrame =
    org.apache.spark.sql.graft.ArrowBridge.ipcStreamToDataFrame(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], ipcStream)

  /** Reverse direction: encode a DataFrame as one self-contained Arrow
    * IPC stream — catalog export / cross-engine handoff of an op-12
    * payload. Round-trips with [[ipcToDataFrame]] (fidelity pinned in
    * ArrowIngestSpec, nulls and empty frames included). */
  def dataFrameToIpc(df: DataFrame): Array[Byte] =
    org.apache.spark.sql.graft.ArrowBridge.dataFrameToIpcStream(df)

  /** Spec op 12 in one call: CREATE TABLE from the IPC schema, then append
    * the IPC rows. Table must not already exist. */
  def createTableWithData(spark: SparkSession, tableName: String,
      ipcStream: Array[Byte]): Unit = {
    val df = ipcToDataFrame(spark, ipcStream)
    val cols = df.schema.fields
      .map(f => s"`${f.name}` ${f.dataType.sql}").mkString(", ")
    spark.sql(s"CREATE TABLE $tableName ($cols)")
    df.writeTo(tableName).append()
  }
}
