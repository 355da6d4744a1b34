package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.backend.TableInfo
import graft.core.{GraftError, TableUtil}

/** DSv2 table for a catalog-registered graft table (SURVEY.md §7.1 module 5).
  *
  * The reference's `describeTable` is a capability handoff — location +
  * properties, with all data I/O delegated to the Lance library
  * (`LanceTableUtil.java:48-60`). Our equivalent hands the location to
  * Spark's columnar Parquet DSv2 machinery: scans delegate to
  * [[ParquetTable]], which supplies filter/column pushdown
  * (`SupportsPushDownFilters`/`...RequiredColumns` via `ParquetScanBuilder`),
  * vectorized reads and whole-stage codegen — the physical plan a 1000-node
  * cluster wants, with zero custom shuffle code.
  *
  * A *declared* table (metadata exists, no storage yet —
  * `LanceTableUtil.isOnlyDeclared:44-46`) scans as an empty batch of its
  * declared schema and materializes on first write.
  */
class GraftTable(
    ident: Identifier,
    info: TableInfo,
    declaredSchema: Option[StructType],
    spark: SparkSession,
    onCommit: () => Unit = () => ())
  extends Table with SupportsRead with SupportsWrite {

  private def scanOptions: CaseInsensitiveStringMap =
    new CaseInsensitiveStringMap(info.storageOptions.asJava)

  /** Files present at the location right now (re-checked per call so a first
    * write flips a declared table to materialized without a catalog refresh). */
  private def materialized: Boolean =
    TableUtil.hasStorageComponents(info.location,
      spark.sessionState.newHadoopConfWithOptions(info.storageOptions))

  /** An ANN-index entry ([[graft.ops.AnnIndex]]) is a CAPABILITY POINTER —
    * its location holds a multi-dataset layout (centroids/ + postings/
    * [+ codebook/]) that only the index module interprets. It must never be
    * planned as a flat parquet scan (partition-structure inference over the
    * mixed layout fails), and a direct write would corrupt the layout. */
  private def isIndexPointer: Boolean =
    info.properties.contains("graft.index.type")

  private lazy val delegate: ParquetTable =
    ParquetTable(ident.toString, spark, scanOptions, Seq(info.location),
      declaredSchema, classOf[ParquetFileFormat])

  override def name(): String = ident.toString

  override def schema(): StructType =
    if (materialized && !isIndexPointer) delegate.schema
    else declaredSchema.getOrElse(new StructType())

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER)

  override def properties(): util.Map[String, String] = {
    val m = new util.HashMap[String, String]()
    info.properties.foreach { case (k, v) => m.put(k, v) }
    m.put(TableCatalog.PROP_LOCATION, info.location)
    // the reference DescribeTableResponse.managedVersioning field, visible
    // to SHOW TBLPROPERTIES / loadTable like location is (q180 gates it)
    m.put(TableUtil.ManagedVersioningKey, info.managedVersioning.toString)
    m
  }

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    if (isIndexPointer)
      throw GraftError.Unsupported(
        s"direct scan of ANN index table ${ident.toString} " +
          "(search through graft.ops.AnnIndex.searchIvf/searchIvfPq)")
    else if (materialized) {
      val merged = new util.HashMap[String, String](options)
      scanOptions.forEach((k, v) => merged.putIfAbsent(k, v))
      delegate.newScanBuilder(new CaseInsensitiveStringMap(merged))
    } else new GraftTable.EmptyScanBuilder(schema())

  override def newWriteBuilder(writeInfo: LogicalWriteInfo): WriteBuilder =
    if (isIndexPointer)
      throw GraftError.Unsupported(
        s"direct write to ANN index table ${ident.toString} " +
          "(rebuild through graft.ops.AnnIndex.ensureIvf/ensureIvfPq)")
    else new GraftTable.TruncatableWriteBuilder(
      delegate.newWriteBuilder(writeInfo), info.location,
      () => spark.sessionState.newHadoopConfWithOptions(info.storageOptions),
      onCommit)
}

object GraftTable {
  import org.apache.hadoop.conf.Configuration
  import org.apache.hadoop.fs.Path
  import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, PhysicalWriteInfo, SupportsOverwrite, SupportsTruncate, Write, WriterCommitMessage}
  import org.apache.spark.sql.sources.{AlwaysTrue, Filter}

  /** Adds INSERT OVERWRITE to the delegate parquet write. Spark's V2 file
    * write is append-only (`FileWrite` has no truncate), so overwrite =
    * snapshot existing data files at write start, delete them in `commit`
    * just before the new files are committed in. Non-atomic on a crash
    * between the two steps — the same documented non-atomicity class as the
    * reference's drop-then-create overwrite (`Hive2Namespace.java:415-421`).
    * Only full-table overwrite (filters = AlwaysTrue) is supported, which is
    * exactly what INSERT OVERWRITE / CREATE OR REPLACE plan. */
  private class TruncatableWriteBuilder(
      delegate: WriteBuilder, location: String, hconf: () => Configuration,
      onCommit: () => Unit)
    extends WriteBuilder with SupportsTruncate with SupportsOverwrite {

    private var truncateFirst = false

    override def truncate(): WriteBuilder = { truncateFirst = true; this }

    override def overwrite(filters: Array[Filter]): WriteBuilder = {
      if (!filters.forall(_.isInstanceOf[AlwaysTrue]))
        throw new UnsupportedOperationException(
          s"graft tables support only full-table overwrite, got ${filters.mkString(",")}")
      truncate()
    }

    /** Fires `onCommit` after the delegate commit so the owning catalog can
      * evict its probe/describe caches — a write through this catalog must
      * be visible to its own `include_declared=false` listings immediately,
      * not after the probe TTL. */
    private def notifying(innerBatch: BatchWrite,
        beforeCommit: () => Unit = () => ()): BatchWrite = new BatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
        innerBatch.createBatchWriterFactory(info)
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        beforeCommit()
        innerBatch.commit(messages)
        onCommit()
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit =
        innerBatch.abort(messages)
      override def useCommitCoordinator(): Boolean = innerBatch.useCommitCoordinator()
    }

    override def build(): Write = {
      val inner = delegate.build()
      if (!truncateFirst) new Write {
        override def toBatch: BatchWrite = notifying(inner.toBatch)
        override def description(): String = inner.description()
      }
      else new Write {
        override def toBatch: BatchWrite = {
          val p = new Path(location)
          val fs = p.getFileSystem(hconf())
          val preexisting: Seq[Path] =
            if (!fs.exists(p)) Nil
            else {
              val it = fs.listFiles(p, true)
              val buf = Seq.newBuilder[Path]
              while (it.hasNext) {
                val f = it.next()
                val n = f.getPath.getName
                if (f.isFile && !n.startsWith("_") && !n.startsWith(".")) buf += f.getPath
              }
              buf.result()
            }
          notifying(inner.toBatch, beforeCommit = () => {
            val fs2 = new Path(location).getFileSystem(hconf())
            preexisting.foreach(f => try fs2.delete(f, false) catch { case _: Exception => () })
          })
        }
        override def description(): String = s"graft-truncate(${inner.description()})"
      }
    }
  }

  /** Zero-partition scan for declared-but-unmaterialized tables. */
  private class EmptyScanBuilder(schema: StructType) extends ScanBuilder {
    override def build(): Scan = new Scan {
      override def readSchema(): StructType = schema
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] = Array.empty
        override def createReaderFactory(): PartitionReaderFactory =
          (_: InputPartition) => throw new IllegalStateException(
            "empty scan has no partitions")
      }
    }
  }
}
