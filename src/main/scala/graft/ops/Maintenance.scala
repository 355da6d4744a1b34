package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance operators: small-file compaction and clustered
  * rewrite. A 100 TB table accreting streaming/incremental writes
  * degenerates into millions of KB-scale files — listing cost, scan task
  * explosion, and useless row-group stats. Compaction is the maintenance
  * op every lakehouse runs (Delta OPTIMIZE, Iceberg rewrite_data_files);
  * the reference's catalog serves table locations but ships no rewrite op,
  * so this fills that gap Spark-first: one range repartition by the sort
  * key (tight per-file key ranges → real min/max pruning), one write.
  */
object Maintenance {

  /** Data file = not a metadata sidecar: excludes _SUCCESS/_metadata,
    * hidden dotfiles, and local-FS .crc checksums — the same set for byte
    * and count accounting so the two always describe the same files. */
  private def isDataFile(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".") && !name.endsWith(".crc")

  /** True when `maybeAncestor` is a path prefix of `p` (qualified paths). */
  private def isAncestor(maybeAncestor: Path, p: Path): Boolean = {
    var cur = p.getParent
    while (cur != null) {
      if (cur == maybeAncestor) return true
      cur = cur.getParent
    }
    false
  }

  /** Total bytes of data files under a table directory (driver-side
    * listing — metadata only, never reads data). */
  def dataBytes(spark: SparkSession, dir: String): Long = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0L
    else {
      val it = fs.listFiles(p, true)
      var total = 0L
      while (it.hasNext) {
        val f = it.next()
        if (isDataFile(f.getPath.getName)) total += f.getLen
      }
      total
    }
  }

  /** Number of data files under a table directory. */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) {
        val f = it.next()
        if (isDataFile(f.getPath.getName)) n += 1
      }
      n
    }
  }

  /** Rewrite the parquet table at `srcDir` into `destDir` with files of
    * roughly `targetFileBytes`, clustered on `sortCols` (range partition +
    * in-partition sort → non-overlapping per-file key ranges). The file
    * count derives from the CURRENT compressed size — the one number a
    * driver can know without scanning — so output files land near the
    * target regardless of input fragmentation. Returns the number of data
    * files actually written (can be below the plan when the sort key has
    * fewer distinct values than planned ranges — empty range partitions
    * write no file). */
  def compact(spark: SparkSession, srcDir: String, destDir: String,
      sortCols: Seq[String], targetFileBytes: Long = 128L << 20): Int = {
    // Overwrite of destDir happens while srcDir is being lazily read —
    // same (or nested) paths would delete the input mid-scan.
    val hc = spark.sparkContext.hadoopConfiguration
    val srcQ = new Path(srcDir).getFileSystem(hc)
      .makeQualified(new Path(srcDir))
    val dstQ = new Path(destDir).getFileSystem(hc)
      .makeQualified(new Path(destDir))
    require(srcQ != dstQ && !isAncestor(srcQ, dstQ) && !isAncestor(dstQ, srcQ),
      s"compact: destDir must not equal or nest with srcDir ($srcQ vs $dstQ)")
    val bytes = dataBytes(spark, srcDir)
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val df = spark.read.parquet(srcDir)
    val clustered =
      if (sortCols.nonEmpty)
        df.repartitionByRange(nFiles, sortCols.map(col): _*)
          .sortWithinPartitions(sortCols.map(col): _*)
      else df.repartition(nFiles)
    clustered.write.mode(SaveMode.Overwrite).parquet(destDir)
    dataFileCount(spark, destDir)
  }

  /** Per-file min/max of a column (the stats pruning actually uses),
    * computed distributedly via the input_file_name of each row. */
  def fileStats(df: DataFrame, statCol: String): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(min(col(statCol)).as("min_v"), max(col(statCol)).as("max_v"),
        count(lit(1)).as("rows"))
}
