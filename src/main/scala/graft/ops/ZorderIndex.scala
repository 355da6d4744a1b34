package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Persisted 2-D Z-ORDER box index — multi-dimensional data skipping, the
  * fourth member of the scalar family next to btree/bitmap/label-list.
  *
  * A 1-D btree answers `x BETWEEN a AND b` with a contiguous-bucket read,
  * but a conjunctive BOX predicate (`x BETWEEN .. AND y BETWEEN ..`) gets
  * pruning on x only — every bucket spans the full y range, so the y
  * conjunct prunes nothing. Laying the buckets out along a Morton curve
  * (the [[ZOrder.zValue]] interleave over a frozen 16-bit affine grid of
  * both keys) makes each bucket a LOCALIZED tile in (x, y) space, so a
  * per-bucket 2-D zonemap prunes on BOTH dimensions at once — the
  * Databricks OPTIMIZE ZORDER / ClickHouse space-filling-curve story as a
  * persisted index. The reference's `.gitignore:84-86` IVF benchmark
  * anchor shows the same build-once/search-many economics this layout
  * targets for range predicates.
  *
  * On-disk layout under `location`:
  * {{{
  *   postings/bkt=<n>/...  (id, x, y, zv) PARTITIONED BY a z-range
  *                         bucket: one `repartitionByRange` over the
  *                         Morton value (sampled boundaries, no driver
  *                         sort bottleneck) — each bucket is a compact
  *                         curve segment ≈ a spatial tile
  *   zonemap/              (bkt, xlo, xhi, ylo, yhi, n_rows) DELTA rows —
  *                         searches aggregate per bucket (≤ nBuckets
  *                         rows, the only driver collect)
  *   ranges/               (xmin, xmax, ymin, ymax) — the affine grid,
  *                         FROZEN at build so appends land on the same
  *                         curve (out-of-range drift clamps to the edge
  *                         tiles; the zonemap records TRUE min/max so
  *                         pruning stays exact)
  *   boundaries/           (bkt, upper) — per-bucket max z, FROZEN at
  *                         build; appends assign buckets with a
  *                         codegen'd O(nBuckets) literal-array fold
  *   tombstones/ _MANIFEST.properties   the shared lifecycle contract
  *                         ([[AnnIndex]] codec, fingerprint staleness,
  *                         atomic publish, divergence flag)
  * }}}
  *
  * A box search prunes buckets DRIVER-SIDE against the aggregated 2-D
  * zonemap (1-ulp slack on the double shadows, the btree discipline) →
  * static `bkt IN (...)` partition filter → exact residual on the native
  * keys. At 100 TB a selective box reads ~the touched tiles' bytes; a
  * y-only constraint still prunes (impossible under any 1-D sort), which
  * is the whole reason this index exists.
  *
  * Scope: both keys numeric (int/float/double exact in the double
  * shadow; BIGINT enforced within ±2^53 at build/append — the
  * [[ScalarIndex]] rule). Null keys are not indexed (a box predicate can
  * never return them).
  */
object ZorderIndex {

  private val GridBits = 16
  private val GridMax = (1 << GridBits) - 1 // 65535

  private def tombstoneDir(location: String): String =
    s"$location/tombstones"

  def hasTombstones(location: String): Boolean =
    IndexFs.exists(tombstoneDir(location))

  /** DELETE ids — the shared tombstone discipline ([[ScalarIndex
    * .deleteIds]]: set semantics, `divergent` manifest stamp so the
    * optimizer route declines until a rebuild). */
  def deleteIds(ids: DataFrame, idCol: String, location: String): Unit =
    ScalarIndex.deleteIds(ids, idCol, location)

  private def antiTombstones(rows: DataFrame, location: String): DataFrame =
    if (!hasTombstones(location)) rows
    else rows.join(
      broadcast(rows.sparkSession.read.parquet(tombstoneDir(location))
        .select(col("id")).distinct()),
      Seq("id"), "left_anti")

  private final case class Ranges(xmin: Double, xmax: Double,
      ymin: Double, ymax: Double)

  private def readRanges(spark: SparkSession, location: String): Ranges = {
    val r = spark.read.parquet(s"$location/ranges").collect().head
    Ranges(r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
  }

  /** The frozen-grid curve value — IDENTICAL in build and append (the
    * append ≡ one-shot law hangs on it): each key affine-maps onto
    * [0, 2^16) against the build-time corpus range, clamped (degenerate
    * zero-width ranges collapse to cell 0), then the chosen space-filling
    * curve combines the two grid codes — [[ZOrder.zValue]] (Morton, pure
    * codegen) or [[ZOrder.hilbertValue]] (strictly better locality:
    * consecutive values are ALWAYS adjacent cells, so bucket tiles get
    * tighter bounding boxes and the 2-D zonemap prunes harder — the
    * Databricks OPTIMIZE / ClickHouse pairing). The curve is stamped in
    * the manifest metric (`box` / `hilbert-box`) so appends always ride
    * the build's curve. Search is curve-agnostic: it reads only the
    * zonemap envelopes. */
  private def gridCurve(x: Column, y: Column, r: Ranges,
      hilbert: Boolean): Column = {
    def g(c: Column, lo: Double, hi: Double): Column =
      if (hi > lo)
        least(greatest(
            floor((c.cast("double") - lit(lo)) / lit(hi - lo) *
              lit(GridMax.toDouble)), lit(0.0)),
          lit(GridMax.toDouble)).cast("long")
      else lit(0L)
    val (gx, gy) = (g(x, r.xmin, r.xmax), g(y, r.ymin, r.ymax))
    if (hilbert) ZOrder.hilbertValue(gx, gy, GridBits)
    else ZOrder.zValue(gx, gy, GridBits)
  }

  private def keyRows(df: DataFrame, idCol: String, xCol: String,
      yCol: String): DataFrame =
    TextFunctions.widen(df)
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        col(xCol).as("x"), col(yCol).as("y"))

  private val DoubleExactBound = (1L << 53).toDouble

  /** The btree family's ±2^53 rule for long keys, applied to both dims
    * (one narrow delta-sized aggregate). */
  private def requireKeysExact(rows: DataFrame, what: String): Unit = {
    val longCols = Seq("x", "y").filter(c =>
      rows.schema(c).dataType == LongType)
    if (longCols.nonEmpty) {
      val aggs = longCols.flatMap(c =>
        Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
      val mm = rows.agg(aggs.head, aggs.tail: _*).head()
      (0 until mm.length).foreach { i =>
        if (!mm.isNullAt(i))
          require(math.abs(mm.getDouble(i)) <= DoubleExactBound,
            s"$what: BIGINT keys beyond ±2^53 alias in the zonemap's " +
              "double shadow — rescale the key or index a narrower column")
      }
    }
  }

  /** Build (or reuse, if the source fingerprint is unchanged) the z-order
    * box index. One distributed range-sort over the Morton value; every
    * secondary output (zonemap, boundaries) derives from the WRITTEN
    * postings — the single-scan build discipline. */
  def ensureZorder(df: DataFrame, idCol: String, xCol: String, yCol: String,
      location: String, sourcePath: String, nBuckets: Int = 32,
      fingerprintOverride: Option[String] = None,
      curve: String = "z"): Boolean = {
    require(nBuckets >= 1, s"ensureZorder: nBuckets >= 1, got $nBuckets")
    require(curve == "z" || curve == "hilbert",
      s"ensureZorder: curve must be 'z' or 'hilbert', got '$curve'")
    val metric = if (curve == "hilbert") "hilbert-box" else "box"
    val fp = fingerprintOverride.getOrElse(
      AnnIndex.sourceFingerprint(sourcePath))
    AnnIndex.readManifest(location) match {
      case Some(m) if m.fingerprint == fp && m.indexType == "zorder" &&
          m.nlist == nBuckets && m.metric == metric => false
      case _ =>
        AnnIndex.deleteRecursively(location)
        val rows = keyRows(df, idCol, xCol, yCol)
        requireKeysExact(rows, "ensureZorder")
        import rows.sparkSession.implicits._
        val mm = rows.agg(
          min(col("x").cast("double")), max(col("x").cast("double")),
          min(col("y").cast("double")), max(col("y").cast("double"))).head()
        val ranges =
          if (mm.isNullAt(0)) Ranges(0, 0, 0, 0) // empty corpus
          else Ranges(mm.getDouble(0), mm.getDouble(1),
            mm.getDouble(2), mm.getDouble(3))
        val xDdl = rows.schema("x").dataType.sql
        val yDdl = rows.schema("y").dataType.sql
        AnnIndex.buildAndPublish(location,
          AnnIndex.Manifest("zorder", metric, nBuckets, GridBits, fp,
            keyType = s"$xDdl,$yDdl", sourcePath = sourcePath,
            sourceIdCol = idCol, sourceKeyCol = s"$xCol,$yCol")) { staging =>
          Seq((ranges.xmin, ranges.xmax, ranges.ymin, ranges.ymax))
            .toDF("xmin", "xmax", "ymin", "ymax")
            .coalesce(1).write.mode("overwrite").parquet(s"$staging/ranges")
          val bucketed = rows
            .withColumn("zv", gridCurve(col("x"), col("y"), ranges,
              hilbert = curve == "hilbert"))
            .repartitionByRange(nBuckets, col("zv"), col("id"))
            .withColumn("bkt", spark_partition_id())
          bucketed.write.mode("overwrite").partitionBy("bkt")
            .parquet(s"$staging/postings")
          val written = df.sparkSession.read.parquet(s"$staging/postings")
          val zm = written.groupBy(col("bkt"))
            .agg(min(col("x").cast("double")).as("xlo"),
              max(col("x").cast("double")).as("xhi"),
              min(col("y").cast("double")).as("ylo"),
              max(col("y").cast("double")).as("yhi"),
              count(lit(1)).as("n_rows"))
          zm.coalesce(1).write.mode("overwrite").parquet(s"$staging/zonemap")
          written.groupBy(col("bkt")).agg(max(col("zv")).as("upper"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$staging/boundaries")
        }
    }
  }

  /** Incrementally ADD rows against the FROZEN grid and bucket
    * boundaries: the delta's Morton values fold over the ≤nBuckets-entry
    * upper literal array (rows beyond the last upper land in the highest
    * bucket; grid clamping sends out-of-range keys to the edge tiles —
    * either way the appended zonemap DELTA records the true min/max, so
    * pruning stays conservative and exact). `partial:` crash discipline
    * as everywhere: re-stamps `newFingerprint` only after the appends
    * commit. */
  def appendZorder(delta: DataFrame, idCol: String, xCol: String,
      yCol: String, location: String, newFingerprint: String): Unit = {
    val man = AnnIndex.readManifest(location).getOrElse(
      throw new IllegalStateException(s"no index at $location"))
    require(man.indexType == "zorder", s"not a zorder index: $location")
    val spark = delta.sparkSession
    val ranges = readRanges(spark, location)
    val boundRows = spark.read.parquet(s"$location/boundaries")
      .orderBy(col("bkt")).collect()
    require(boundRows.nonEmpty, s"zorder index at $location has no buckets")
    val bktIds = boundRows.map(_.getInt(0))
    val rows = keyRows(delta, idCol, xCol, yCol)
    requireKeysExact(rows, "appendZorder")
    val assigned = {
      val withZ = rows.withColumn("zv",
        gridCurve(col("x"), col("y"), ranges,
          hilbert = man.metric == "hilbert-box"))
      val slot =
        if (boundRows.length == 1) lit(0)
        else {
          val uppers = boundRows.map(_.getLong(1)).dropRight(1)
          aggregate(lit(uppers), lit(0),
            (acc, u) => acc + when(col("zv") > u, 1).otherwise(0))
        }
      withZ.withColumn("bkt", element_at(lit(bktIds), slot + 1))
    }
    assigned.write.mode("append").partitionBy("bkt")
      .parquet(s"$location/postings")
    assigned.groupBy(col("bkt"))
      .agg(min(col("x").cast("double")).as("xlo"),
        max(col("x").cast("double")).as("xhi"),
        min(col("y").cast("double")).as("ylo"),
        max(col("y").cast("double")).as("yhi"),
        count(lit(1)).as("n_rows"))
      .coalesce(1).write.mode("append").parquet(s"$location/zonemap")
    AnnIndex.writeManifest(location, man.copy(fingerprint = newFingerprint))
  }

  /** Box search `x ∈ [xLo, xHi] AND y ∈ [yLo, yHi]` (inclusive):
    * aggregate the zonemap deltas (≤ nBuckets rows), keep buckets whose
    * 2-D envelope overlaps the box (1-ulp slack on both shadows — the
    * residual is exact on the native keys, so slack only ever costs one
    * extra bucket, never a wrong row), read ONLY those partitions, apply
    * the exact residual, anti-join tombstones. Returns (id, x, y). */
  def searchBox(spark: SparkSession, location: String,
      xLo: Double, xHi: Double, yLo: Double, yHi: Double): DataFrame = {
    val man = AnnIndex.readManifest(location).getOrElse(
      throw new IllegalStateException(s"no index at $location"))
    require(man.indexType == "zorder", s"not a zorder index: $location")
    val zm = spark.read.parquet(s"$location/zonemap")
      .groupBy(col("bkt"))
      .agg(min(col("xlo")).as("xlo"), max(col("xhi")).as("xhi"),
        min(col("ylo")).as("ylo"), max(col("yhi")).as("yhi"))
      .collect()
    val bkts = zm.filter { r =>
      Math.nextDown(r.getDouble(1)) <= xHi &&
        Math.nextUp(r.getDouble(2)) >= xLo &&
        Math.nextDown(r.getDouble(3)) <= yHi &&
        Math.nextUp(r.getDouble(4)) >= yLo
    }.map(_.getInt(0)).sorted
    val postings = spark.read.parquet(s"$location/postings")
    val pruned =
      if (bkts.isEmpty) postings.filter(lit(false))
      else postings.filter(col("bkt").isin(bkts.map(Int.box): _*))
    antiTombstones(
      pruned.filter(col("x") >= lit(xLo) && col("x") <= lit(xHi) &&
        col("y") >= lit(yLo) && col("y") <= lit(yHi)),
      location)
      .select(col("id"), col("x"), col("y"))
  }

  /** Fold tombstones into the layout: postings minus deleted ids
    * rewritten bucket-partitioned, zonemap recomputed EXACTLY from the
    * surviving rows (tiles tighten), grid ranges and bucket boundaries
    * kept frozen, tombstones cleared. Both staging subtrees written
    * before either swap commits — the zonemap derives from the WRITTEN
    * postings staging (the [[ScalarIndex.compactBtree]] ordering
    * discipline). Results unchanged. */
  def compactZorder(spark: SparkSession, location: String): Unit = {
    val man = AnnIndex.readManifest(location).getOrElse(
      throw new IllegalStateException(s"no index at $location"))
    require(man.indexType == "zorder", s"not a zorder index: $location")
    val pid = AnnIndex.uniqueSuffix()
    antiTombstones(spark.read.parquet(s"$location/postings"), location)
      .repartition(col("bkt"))
      .write.mode("overwrite").partitionBy("bkt")
      .parquet(s"$location/postings.compact.$pid")
    val compacted = spark.read.parquet(s"$location/postings.compact.$pid")
    compacted.groupBy(col("bkt"))
      .agg(min(col("x").cast("double")).as("xlo"),
        max(col("x").cast("double")).as("xhi"),
        min(col("y").cast("double")).as("ylo"),
        max(col("y").cast("double")).as("yhi"),
        count(lit(1)).as("n_rows"))
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$location/zonemap.compact.$pid")
    ScalarIndex.swapStaged(location, "postings", pid)
    ScalarIndex.swapStaged(location, "zonemap", pid)
    AnnIndex.deleteRecursively(tombstoneDir(location))
  }
}
