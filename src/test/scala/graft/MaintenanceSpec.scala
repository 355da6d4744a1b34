package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curation, Maintenance, ZOrder}

/** File-layout maintenance (compaction, clustered writes) and z-order
  * locality — the parts of the maintenance family the SQL oracle can't
  * express. */
class MaintenanceSpec extends SparkSpec {
  import spark.implicits._

  test("zValue matches a bit-twiddling reference implementation") {
    def ref(x: Long, y: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, b) =>
        acc | (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      }
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 7L))
    val zs = rows.toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y"), 16)).as[Long].collect()
    rows.zip(zs).foreach { case ((x, y), z) =>
      assert(z == ref(x, y), s"($x,$y): got $z want ${ref(x, y)}") }
  }

  test("hilbertValue: bijective over the grid and unit-step local (the " +
      "property the Z curve lacks)") {
    val bits = 3; val n = 1 << bits
    val cells = for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong)
    val got = cells.toDF("x", "y")
      .select($"x", $"y", ZOrder.hilbertValue($"x", $"y", bits).as("d"))
      .as[(Long, Long, Long)].collect()
    val byD = got.map(t => t._3 -> ((t._1, t._2))).toMap
    // bijection: every d in [0, 4^bits) hit exactly once
    assert(byD.keySet == (0L until (n.toLong * n)).toSet)
    // locality: consecutive curve positions are ALWAYS adjacent cells
    (0L until n.toLong * n - 1).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump at d=$d: ($x1,$y1)->($x2,$y2)")
    }
    // the Z curve genuinely fails this on the same grid (sanity contrast)
    val zByD = cells.toDF("x", "y")
      .select($"x", $"y", ZOrder.zValue($"x", $"y", bits).as("d"))
      .as[(Long, Long, Long)].collect().map(t => t._3 -> ((t._1, t._2))).toMap
    val zJumps = (0L until n.toLong * n - 1).count { d =>
      val (x1, y1) = zByD(d); val (x2, y2) = zByD(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) > 1
    }
    assert(zJumps > 0)
  }

  test("zValueN generalizes zValue and interleaves 3 dims correctly") {
    def ref3(x: Long, y: Long, z: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, b) =>
        acc | (((x >> b) & 1L) << (3 * b)) |
          (((y >> b) & 1L) << (3 * b + 1)) | (((z >> b) & 1L) << (3 * b + 2))
      }
    val rows = Seq((1L, 2L, 4L), (7L, 7L, 7L), (0L, 0L, 1L), (1023L, 512L, 33L))
    val got = rows.toDF("x", "y", "z")
      .select(
        ZOrder.zValueN(Seq(col("x"), col("y"), col("z")), 10).as("m3"),
        ZOrder.zValueN(Seq(col("x"), col("y")), 16).as("m2"),
        ZOrder.zValue(col("x"), col("y"), 16).as("m2ref"))
      .as[(Long, Long, Long)].collect()
    rows.zip(got).foreach { case ((x, y, z), (m3, m2, m2ref)) =>
      assert(m3 == ref3(x, y, z, 10), s"($x,$y,$z)")
      assert(m2 == m2ref, "k=2 zValueN must equal zValue")
    }
  }

  test("z-order clustering gives tighter 2-D partition bounding boxes than x-sort") {
    val n = 64
    val grid = spark.range(n.toLong * n).toDF("i")
      .select((col("i") % n).as("x"), (col("i") / n).cast("long").as("y"))
    def avgArea(df: org.apache.spark.sql.DataFrame): Double =
      df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg(((max("x") - min("x") + 1) * (max("y") - min("y") + 1)).as("area"))
        .agg(avg("area")).as[Double].head()
    val zArea = avgArea(ZOrder.clusterByZ(grid, "x", "y", bits = 6, numFiles = 16))
    val xArea = avgArea(grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x")))
    // x-sorted partitions span all of y (area ~ 4*64=256); z-ordered
    // partitions are near-square tiles (area ~ 256/16*16 = 256? no: 4096/16
    // rows per partition => ideal tile 16x16 = 256 cells but tight on BOTH
    // dims; x-sort boxes are 4x64. Same area, different shape — so compare
    // the max side length, the quantity stats pruning actually feels.
    def maxSide(df: org.apache.spark.sql.DataFrame): Double =
      df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg(greatest(max("x") - min("x") + 1, max("y") - min("y") + 1).as("s"))
        .agg(avg("s")).as[Double].head()
    val zSide = maxSide(ZOrder.clusterByZ(grid, "x", "y", bits = 6, numFiles = 16))
    val xSide = maxSide(grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions(col("x")))
    assert(zSide * 2 < xSide, s"z avg max-side $zSide vs x-sort $xSide")
    assert(zArea <= xArea * 1.5, s"z area $zArea vs x area $xArea")
  }

  test("quantize is order-preserving and lands in [0, 2^bits)") {
    val df = spark.range(4000).toDF("i")
      .select((col("i") * col("i") % 999983).cast("double").as("v")).distinct()
    val q = ZOrder.quantize(df, "v", "cell", bits = 6)
    val range = q.agg(min("cell"), max("cell")).as[(Long, Long)].head()
    assert(range._1 >= 0 && range._2 < 64, s"cells out of range: $range")
    // order-preserving: no pair with v1 < v2 but cell1 > cell2
    val a = q.select(col("v").as("v1"), col("cell").as("c1"))
    val b = q.select(col("v").as("v2"), col("cell").as("c2"))
    val inversions = a.join(b, col("v1") < col("v2") && col("c1") > col("c2")).count()
    assert(inversions == 0)
  }

  test("compact rewrites many small files into the computed file count") {
    val src = warehouse.resolve("frag").toString
    val dest = warehouse.resolve("compacted").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.repartition(50).write.mode("overwrite").parquet(src)
    assert(Maintenance.dataFileCount(spark, src) >= 50)
    val bytes = Maintenance.dataBytes(spark, src)
    val target = math.max(1L, bytes / 3)
    val planned = math.max(1, math.ceil(bytes.toDouble / target).toInt)
    val n = Maintenance.compact(spark, src, dest, Seq("doc_id"), target)
    // doc_id has plenty of distinct values, so every planned range is
    // non-empty and the files actually written must equal the plan
    assert(n == planned, s"wrote $n files, planned $planned")
    assert(n >= 2 && n <= 4, s"expected ~3 files, got $n")
    val out = spark.read.parquet(dest)
    assert(out.count() == docs.count())
    assert(out.exceptAll(docs).isEmpty && docs.exceptAll(out).isEmpty)
  }

  test("bucketChecksums: order/partitioning invariant; diffBuckets pinpoints edits") {
    val base = (1L to 500L).map(i => (i, s"content $i")).toDF("id", "v")
    val a = Maintenance.bucketChecksums(base, "id", Seq("v"), 32)
    // same rows, different physical order and partitioning → same sums
    val shuffled = Maintenance.bucketChecksums(
      base.orderBy(rand(42)).repartition(7), "id", Seq("v"), 32)
    assert(a.orderBy("bucket").collect().toSeq ==
      shuffled.orderBy("bucket").collect().toSeq)
    assert(Maintenance.diffBuckets(a, shuffled).count() == 0)
    // one edited row + one deleted row → only their buckets differ
    val mutated = base.filter($"id" =!= 400L)
      .withColumn("v", when($"id" === 123L, lit("EDITED")).otherwise($"v"))
    val b = Maintenance.bucketChecksums(mutated, "id", Seq("v"), 32)
    val diff = Maintenance.diffBuckets(a, b).select("bucket").as[Long].collect().toSet
    val bucketOf = base.filter($"id".isin(123L, 400L))
      .select(Curation.hashBucket($"id", "sync", 32)).as[Long].collect().toSet
    assert(diff == bucketOf, s"diff=$diff expected=$bucketOf")
  }

  test("overlapReport: 0 after compaction, positive for unclustered writes") {
    val src = warehouse.resolve("ovl_src").toString
    val dest = warehouse.resolve("ovl_dst").toString
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // random repartition interleaves doc_id ranges across files
    docs.repartition(8).write.mode("overwrite").parquet(src)
    val before = Maintenance.overlapReport(spark.read.parquet(src), "doc_id")
      .collect().head
    assert(before.getLong(0) >= 8 && before.getDouble(2) > 0.0,
      s"unclustered files must overlap: $before")
    val bytes = Maintenance.dataBytes(spark, src)
    Maintenance.compact(spark, src, dest, Seq("doc_id"),
      targetFileBytes = math.max(1L, bytes / 4))
    val after = Maintenance.overlapReport(spark.read.parquet(dest), "doc_id")
      .collect().head
    assert(after.getDouble(2) == 0.0 && after.getLong(3) == 0L,
      s"compacted ranges must be disjoint: $after")
    assert(after.getLong(1) == before.getLong(1), "row counts preserved")
  }

  test("compacted files have non-overlapping sort-key ranges") {
    val src = warehouse.resolve("frag2").toString
    val dest = warehouse.resolve("compacted2").toString
    spark.read.parquet(s"$sfDir/orders.parquet")
      .repartition(20).write.mode("overwrite").parquet(src)
    val bytes = Maintenance.dataBytes(spark, src)
    Maintenance.compact(spark, src, dest, Seq("o_orderkey"),
      targetFileBytes = math.max(1L, bytes / 4))
    val stats = Maintenance.fileStats(spark.read.parquet(dest), "o_orderkey")
      .orderBy("min_v").as[(String, Long, Long, Long)].collect()
    assert(stats.length >= 2)
    stats.sliding(2).foreach {
      case Array((_, _, hiA, _), (_, loB, _, _)) =>
        assert(hiA <= loB, s"overlapping file ranges: $hiA > $loB")
      case _ =>
    }
  }
}
