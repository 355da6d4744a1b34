package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two dimension keys
  * so a single range-partitioned sort co-locates rows that are close in
  * BOTH dimensions. The point at 100 TB: parquet row-group min/max stats
  * on z-sorted data prune multi-dimensional range predicates that a
  * single-column sort can only prune on its leading column — the standard
  * lakehouse OPTIMIZE/CLUSTER BY technique.
  *
  * Everything here is integer arithmetic over codegen'd built-ins (shifts,
  * masks, sums) — no UDFs — and bit-identical to the arithmetic form
  * `sum_b ((x div 2^b) mod 2) * 2^(2b)`, which is what the DuckDB oracle
  * replays.
  */
object ZOrder {

  /** Interleave the low `bits` bits of non-negative x (even positions) and
    * y (odd positions) into a single z-value: the k=2 case of [[zValueN]].
    * 2*bits ≤ 62. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    zValueN(Seq(x, y), bits)
  }

  /** k-dimensional Morton code: bit b of dimension d lands at position
    * b*k + d; k*bits ≤ 62. Codegen'd shift/mask/sum construction. Dims
    * are cast to long FIRST: Java masks a shift count to 5 bits on ints,
    * so `shiftright(intCol, 33)` would re-read low bits instead of 0. */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    val k = dims.length
    require(k >= 1 && bits >= 1 && k * bits <= 62,
      s"zValueN needs 1+ dims and k*bits <= 62, got k=$k bits=$bits")
    val terms = for {
      b <- 0 until bits
      (dim, d) <- dims.zipWithIndex
    } yield shiftleft(shiftright(dim.cast("long"), b).bitwiseAND(lit(1L)), b * k + d)
    terms.reduce(_ + _).cast("long")
  }

  /** Order-preserving quantization of a numeric column into [0, 2^bits):
    * rank against once-collected percentile boundaries ([[Buckets]] —
    * literal bounds, deterministic in every consumer plan). Equal values
    * always land in the same cell. Use to z-order doubles/skewed keys
    * where a fixed modulus would fold distant values into the same cell. */
  def quantize(df: DataFrame, valCol: String, outCol: String, bits: Int = 8): DataFrame = {
    // 2^12 cells = 4095 boundaries, Buckets.bucketId's expression cap
    require(bits >= 1 && bits <= 12, s"quantize bits out of range: $bits")
    val bounds = Buckets.boundaries(df, valCol, 1 << bits)
    df.withColumn(outCol, Buckets.bucketId(col(valCol), bounds).cast("long"))
  }

  /** 2-D Hilbert curve index (the xy2d walk of Warren's Hacker's Delight /
    * the Wikipedia formulation): like [[zValue]] a space-filling curve for
    * multi-dimensional clustering, but with strictly better locality —
    * consecutive Hilbert values are ALWAYS adjacent cells (Manhattan
    * distance 1), where the Z curve jumps across the plane at power-of-two
    * boundaries. Databricks OPTIMIZE and ClickHouse both offer Hilbert
    * for exactly this reason: tighter file bounding boxes → better
    * min/max pruning on both dimensions.
    *
    * The per-level rotation state is a bounded fold (`aggregate` over the
    * bit levels, integer CASE logic only — interpreted, but 16 integer
    * steps per row and never fed to a generator, so the GenerateExec
    * fallback trap documented on
    * [[graft.ops.Chunking.contentDefinedChunks]] can't bite). The DuckDB
    * oracle replays the identical fold via list_reduce with the initial
    * accumulator prepended.
    *
    * Requires 0 ≤ x,y < 2^bits; returns d ∈ [0, 4^bits). */
  def hilbertValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    aggregate(
      sequence(lit(bits - 1), lit(0), lit(-1)),
      struct(x.cast("long").as("x"), y.cast("long").as("y"), lit(0L).as("d")),
      (acc, lvl) => {
        val s = pow(lit(2.0), lvl).cast("long")
        val ax = acc.getField("x"); val ay = acc.getField("y")
        val rx = when(ax.bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L))
        val ry = when(ay.bitwiseAND(s) > 0, lit(1L)).otherwise(lit(0L))
        val d2 = acc.getField("d") + s * s * (rx * 3).bitwiseXOR(ry)
        val nx = when(ry === 0,
          when(rx === 1, s - 1 - ay).otherwise(ay)).otherwise(ax)
        val ny = when(ry === 0,
          when(rx === 1, s - 1 - ax).otherwise(ax)).otherwise(ay)
        struct(nx.as("x"), ny.as("y"), d2.as("d"))
      },
      acc => acc.getField("d"))
  }

  /** [[clusterByZ]] with the Hilbert index: range-partition-sort by the
    * Hilbert value of the two dimension keys. */
  def clusterByHilbert(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 16, numFiles: Int = 0): DataFrame = {
    val h = df.withColumn("__h", hilbertValue(col(xCol), col(yCol), bits))
    val parted =
      if (numFiles > 0) h.repartitionByRange(numFiles, col("__h"))
      else h.repartitionByRange(col("__h"))
    parted.sortWithinPartitions(col("__h")).drop("__h")
  }

  /** Cluster a table for 2-D range pruning: append the z-value of the two
    * (already non-negative integer) dimension keys and range-partition-sort
    * by it. `repartitionByRange` + in-partition sort is exactly the shape
    * a distributed OPTIMIZE ZORDER write needs — every output file gets a
    * tight z-range, hence tight min/max on BOTH dimensions. */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String, bits: Int = 16,
      numFiles: Int = 0): DataFrame = {
    val z = df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
    val parted =
      if (numFiles > 0) z.repartitionByRange(numFiles, col("__z"))
      else z.repartitionByRange(col("__z"))
    parted.sortWithinPartitions(col("__z")).drop("__z")
  }
}
