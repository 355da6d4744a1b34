package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{AnnIndex, ZorderIndex}

/** Persisted 2-D z-order box index — [[graft.ops.ZorderIndex]].
  * Pins (1) box search ≡ the base-table conjunctive range filter (an
  * index is an access path, never a semantic), (2) the 2-D pruning
  * receipt — a selective box AND a y-only box both carry a static
  * `bkt IN (...)` partition filter over a strict subset of the buckets
  * (the y-only prune is what NO 1-D sort can do), (3) the shared
  * lifecycle laws: fingerprint skip/rebuild, append ≡ one-shot against
  * the frozen grid+boundaries, delete ≡ filter with re-delete a no-op,
  * compaction folds/tightens/preserves, and (4) the ±2^53 long-key
  * refusal and catalog registration. */
class ZorderIndexSpec extends SparkSpec {

  private lazy val evSource = s"$sfDir/events.parquet"
  private lazy val events = spark.read.parquet(evSource)

  private def tmpLoc(name: String): String =
    s"${Files.createTempDirectory("graft-zorderspec").toString}/$name"

  // sf0.001's user_id spans [0, 14] — the box must be non-empty there
  private val XLo = 100.0; private val XHi = 250.0
  private val YLo = 3.0; private val YHi = 7.0

  private def baseBox(base: org.apache.spark.sql.DataFrame) =
    base.filter(col("value") >= XLo && col("value") <= XHi &&
        col("user_id") >= YLo && col("user_id") <= YHi)
      .select(col("event_id").as("id"), col("value").as("x"),
        col("user_id").as("y"))
      .orderBy(col("id")).collect()

  private def idxBox(loc: String) =
    ZorderIndex.searchBox(spark, loc, XLo, XHi, YLo, YHi)
      .orderBy(col("id")).collect()

  private def prunedBuckets(df: org.apache.spark.sql.DataFrame)
      : Option[Int] = {
    val plan = df.queryExecution.executedPlan.toString
    plan.linesIterator.find(_.contains("PartitionFilters"))
      .filter(_.contains("bkt"))
      .flatMap { l =>
        // ≤10 surviving buckets print as `bkt IN (…)`; more convert to
        // `bkt INSET …` (inSetConversionThreshold) — count either form
        "IN \\(([^)]*)\\)".r.findFirstMatchIn(l).map(_.group(1))
          .orElse("INSET ([^\\]]*)".r.findFirstMatchIn(l).map(_.group(1)))
          .map(_.count(_ == ',') + 1)
      }
  }

  test("box search ≡ the base-table conjunctive range filter") {
    val loc = tmpLoc("z")
    assert(ZorderIndex.ensureZorder(events, "event_id", "value", "user_id",
      loc, evSource), "first ensure must build")
    val got = idxBox(loc)
    assert(got.nonEmpty)
    assert(got.toSeq == baseBox(events).toSeq)
    // an empty intersection reads nothing at all
    assert(ZorderIndex.searchBox(spark, loc, 1e9, 2e9, 0, 1).count() == 0)
  }

  test("2-D pruning receipt: a selective box AND a y-only box both read " +
      "a strict subset of the buckets (no 1-D sort prunes on y)") {
    val loc = tmpLoc("z-prune")
    ZorderIndex.ensureZorder(events, "event_id", "value", "user_id",
      loc, evSource, nBuckets = 32)
    val total = spark.read.parquet(s"$loc/postings")
      .select(col("bkt")).distinct().count().toInt
    val box = ZorderIndex.searchBox(spark, loc, XLo, XHi, YLo, YHi)
    box.collect()
    val nBox = prunedBuckets(box)
    assert(nBox.isDefined, "expected a static bkt IN (...) filter")
    assert(nBox.get < total,
      s"selective box must prune: read ${nBox.get} of $total buckets")
    // full x range, narrow y: STILL prunes — the z-layout's whole point
    val yOnly = ZorderIndex.searchBox(spark, loc,
      -1e18, 1e18, YLo, YHi)
    yOnly.collect()
    val nY = prunedBuckets(yOnly)
    assert(nY.isDefined && nY.get < total,
      s"y-only box must prune under the z layout: ${nY.map(_.toString)
        .getOrElse("no filter")} of $total buckets")
  }

  test("unchanged fingerprint skips the build; stale rebuilds") {
    val loc = tmpLoc("z-fp")
    assert(ZorderIndex.ensureZorder(events, "event_id", "value", "user_id",
      loc, evSource))
    assert(!ZorderIndex.ensureZorder(events, "event_id", "value", "user_id",
      loc, evSource), "unchanged fingerprint must skip")
    val man = AnnIndex.readManifest(loc).get
    AnnIndex.readManifest(loc) // sanity
    assert(man.indexType == "zorder" && man.metric == "box" &&
      man.keyType == "DOUBLE,BIGINT" &&
      man.sourceKeyCol == "value,user_id")
  }

  test("incremental append against the frozen grid+boundaries ≡ one-shot") {
    val loc = tmpLoc("z-append")
    val fpFull = AnnIndex.sourceFingerprint(evSource)
    ZorderIndex.ensureZorder(events.filter(col("event_id") % 2 === 0),
      "event_id", "value", "user_id", loc, evSource,
      fingerprintOverride = Some(s"partial:$fpFull"))
    ZorderIndex.appendZorder(events.filter(col("event_id") % 2 === 1),
      "event_id", "value", "user_id", loc, newFingerprint = fpFull)
    assert(AnnIndex.readManifest(loc).get.fingerprint == fpFull)
    assert(idxBox(loc).toSeq == baseBox(events).toSeq)
    // out-of-range drift clamps to edge tiles but stays findable: append
    // a synthetic row beyond the build-time ranges
    import spark.implicits._
    val drift = Seq((900001L, 5000.0, 500L))
      .toDF("event_id", "value", "user_id")
    ZorderIndex.appendZorder(drift, "event_id", "value", "user_id",
      loc, newFingerprint = s"drift:$fpFull")
    val got = ZorderIndex.searchBox(spark, loc, 4999.0, 5001.0, 499.0, 501.0)
      .collect()
    assert(got.length == 1 && got.head.getLong(0) == 900001L,
      "an out-of-range append must still be exactly searchable")
  }

  test("delete ≡ filter (re-delete a no-op); compaction folds tombstones, " +
      "tightens the zonemap, preserves results") {
    val loc = tmpLoc("z-del")
    ZorderIndex.ensureZorder(events, "event_id", "value", "user_id",
      loc, evSource)
    ZorderIndex.deleteIds(events.filter(col("event_id") % 5 === 2),
      "event_id", loc)
    ZorderIndex.deleteIds(events.filter(col("event_id") % 5 === 2),
      "event_id", loc) // set semantics
    val want = baseBox(events.filter(col("event_id") % 5 =!= 2))
    assert(idxBox(loc).toSeq == want.toSeq)
    val beforeRows = spark.read.parquet(s"$loc/postings").count()
    ZorderIndex.compactZorder(spark, loc)
    assert(!ZorderIndex.hasTombstones(loc), "compaction clears tombstones")
    assert(spark.read.parquet(s"$loc/postings").count() < beforeRows,
      "compaction physically folds deleted rows")
    assert(idxBox(loc).toSeq == want.toSeq, "results unchanged by compaction")
    // divergence survives compaction: the index-only delete means the
    // live view is a strict subset of the source until a rebuild
    assert(AnnIndex.readManifest(loc).get.divergent)
  }

  test("hilbert curve option: search ≡ filter, append rides the build's " +
      "curve, and a curve change rebuilds") {
    val loc = tmpLoc("z-hilbert")
    assert(ZorderIndex.ensureZorder(events, "event_id", "value", "user_id",
      loc, evSource, curve = "hilbert"))
    assert(AnnIndex.readManifest(loc).get.metric == "hilbert-box")
    assert(idxBox(loc).toSeq == baseBox(events).toSeq)
    // append ≡ one-shot through the SAME curve (the manifest decides)
    val loc2 = tmpLoc("z-hilbert-append")
    val fpFull = AnnIndex.sourceFingerprint(evSource)
    ZorderIndex.ensureZorder(events.filter(col("event_id") % 2 === 0),
      "event_id", "value", "user_id", loc2, evSource,
      fingerprintOverride = Some(s"partial:$fpFull"), curve = "hilbert")
    ZorderIndex.appendZorder(events.filter(col("event_id") % 2 === 1),
      "event_id", "value", "user_id", loc2, newFingerprint = fpFull)
    assert(idxBox(loc2).toSeq == baseBox(events).toSeq)
    // same fingerprint but a DIFFERENT curve is a different layout:
    // ensure must rebuild, not reuse
    assert(ZorderIndex.ensureZorder(events, "event_id", "value", "user_id",
      loc, evSource, curve = "z"), "a curve change must rebuild")
    assert(AnnIndex.readManifest(loc).get.metric == "box")
  }

  test("BIGINT keys beyond ±2^53 are refused at build") {
    import spark.implicits._
    val big = Seq((1L, (1L << 54), 2L), (2L, 5L, 3L))
      .toDF("id", "x", "y")
    val e = intercept[IllegalArgumentException](
      ZorderIndex.ensureZorder(big, "id", "x", "y",
        tmpLoc("z-big"), evSource,
        fingerprintOverride = Some("fp")))
    assert(e.getMessage.contains("2^53"))
  }

  test("CDC streaming ingest: per-micro-batch adds (appendZorder against " +
      "the frozen grid+boundaries) and deletes (tombstones) keep the " +
      "served box search ≡ the equivalent batch corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val loc = tmpLoc("z-cdc")
    ZorderIndex.ensureZorder(events.filter(col("event_id") % 2 === 0),
      "event_id", "value", "user_id", loc, evSource,
      fingerprintOverride = Some("cdc:base"))
    val feed = events.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("value"), col("user_id"))
      .as[(Long, Double, Long)].collect().toSeq
      .map { case (id, v, u) => ("add", id, v, u) } ++
      events.filter(col("event_id") % 10 === 4)
        .select(col("event_id")).as[Long].collect().toSeq
        .map(id => ("del", id, 0.0, 0L))
    val stream = MemoryStream[(String, Long, Double, Long)]
    val batchNo = new java.util.concurrent.atomic.AtomicLong(0L)
    val query = stream.toDF().toDF("op", "event_id", "value", "user_id")
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
         _: Long) =>
        val n = batchNo.incrementAndGet()
        val adds = batch.filter(col("op") === "add")
          .select(col("event_id"), col("value"), col("user_id"))
        if (!adds.isEmpty)
          ZorderIndex.appendZorder(adds, "event_id", "value", "user_id",
            loc, newFingerprint = s"cdc:batch$n")
        val dels = batch.filter(col("op") === "del").select(col("event_id"))
        if (!dels.isEmpty) ZorderIndex.deleteIds(dels, "event_id", loc)
        ()
      }
      .start()
    try {
      val (b1, b2) = feed.splitAt(feed.length / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
    } finally query.stop()
    val equivalent = events.filter(col("event_id") % 10 =!= 4)
    val got = idxBox(loc)
    assert(got.nonEmpty)
    assert(got.toSeq == baseBox(equivalent).toSeq,
      "CDC-maintained zorder index diverged from the equivalent batch corpus")
  }

  test("zorder index is catalog-registrable with its native key DDLs") {
    val loc = tmpLoc("z-cat")
    ZorderIndex.ensureZorder(events, "event_id", "value", "user_id",
      loc, evSource)
    graft.queries.CatalogQueries.ensureCatalog(spark)
    AnnIndex.registerIndexTable(spark, "graft.tpch.zorder_spec_idx", loc)
    assert(AnnIndex.resolveIndexLocation(
      spark, "graft.tpch.zorder_spec_idx") == loc)
    // the declared schema carries the native key DDLs (stamped from the
    // manifest); the table itself stays a non-scannable capability
    // pointer like every index registration
    val ddl = spark.sql(
      "SHOW CREATE TABLE graft.tpch.zorder_spec_idx").collect().head
      .getString(0)
    assert(ddl.contains("x DOUBLE") && ddl.contains("y BIGINT"),
      s"expected native key DDLs in:\n$ddl")
  }
}
