package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{AnnIndex, ScalarIndex}

/** The persisted SCALAR indexes — [[graft.ops.ScalarIndex]]. Pins
  * (1) btree range search ≡ a base-table range filter, row-identical,
  * (2) the postings scan is partition-pruned to zonemap-overlapping
  * buckets, (3) fingerprint-gated rebuilds, (4) build+append ≡ one-shot,
  * (5) delete ≡ filter with set semantics, (6) compaction folds
  * tombstones and tightens the zonemap, (7) bitmap equality search ≡ an
  * IN filter with `k IN (...)` directory pruning, (8) bitmap conjunction
  * across two indexes, (9) the cardinality refusal that keeps bitmaps
  * honest. */
class ScalarIndexSpec extends SparkSpec {

  private lazy val events = spark.read.parquet(s"$sfDir/events.parquet")
  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val evSource = s"$sfDir/events.parquet"
  private lazy val docSource = s"$sfDir/documents.parquet"

  private def tmpLoc(name: String): String =
    s"${Files.createTempDirectory("graft-scalarspec").toString}/$name"

  private val Lo = 100.0
  private val Hi = 250.0

  private def baseRange(base: org.apache.spark.sql.DataFrame) =
    base.filter(col("value").isNotNull &&
        col("value") >= Lo && col("value") <= Hi)
      .select(col("event_id").as("id"), col("value").as("key"))
      .orderBy(col("id")).collect()

  private def idxRange(loc: String) =
    ScalarIndex.searchBtreeRange(spark, loc, Lo, Hi)
      .orderBy(col("id")).collect()

  test("btree range search is row-identical to a base-table range filter") {
    val loc = tmpLoc("bt")
    assert(ScalarIndex.ensureBtree(events, "event_id", "value", loc, evSource),
      "first ensure must build")
    val got = idxRange(loc)
    assert(got.nonEmpty)
    assert(got.toSeq == baseRange(events).toSeq)
  }

  test("btree postings scan is partition-pruned to overlapping buckets") {
    val loc = tmpLoc("bt-prune")
    ScalarIndex.ensureBtree(events, "event_id", "value", loc, evSource)
    // a selective range: prune must engage (fewer buckets than built)
    val df = ScalarIndex.searchBtreeRange(spark, loc, Lo, Hi)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val pruned = plan.linesIterator
      .filter(_.contains("PartitionFilters"))
      .exists(l => l.contains("bkt") && l.contains(" IN "))
    assert(pruned, s"expected a static bkt IN (...) partition filter:\n$plan")
    // and an empty intersection reads nothing at all
    assert(ScalarIndex.searchBtreeRange(spark, loc, 1e12, 2e12).count() == 0)
  }

  test("btree: unchanged fingerprint skips the build; stale rebuilds") {
    val loc = tmpLoc("bt-fresh")
    assert(ScalarIndex.ensureBtree(events, "event_id", "value", loc, evSource))
    assert(!ScalarIndex.ensureBtree(events, "event_id", "value", loc, evSource),
      "fresh index must not rebuild")
    assert(ScalarIndex.ensureBtree(events, "event_id", "value", loc, evSource,
      fingerprintOverride = Some("other")), "stale index must rebuild")
  }

  test("btree incremental append: build-half + append-half ≡ one-shot " +
      "(frozen boundaries, conservative zonemap deltas)") {
    val loc = tmpLoc("bt-append")
    val fp = AnnIndex.sourceFingerprint(evSource)
    ScalarIndex.ensureBtree(events.filter(col("event_id") % 2 === 0),
      "event_id", "value", loc, evSource,
      fingerprintOverride = Some(s"partial:$fp"))
    ScalarIndex.appendBtree(events.filter(col("event_id") % 2 === 1),
      "event_id", "value", loc, newFingerprint = fp)
    assert(AnnIndex.readManifest(loc).exists(_.fingerprint == fp),
      "append must re-stamp the full fingerprint")
    val got = idxRange(loc)
    assert(got.nonEmpty)
    assert(got.toSeq == baseRange(events).toSeq)
  }

  test("btree delete ≡ filter; re-delete is a set-semantics no-op") {
    val loc = tmpLoc("bt-del")
    ScalarIndex.ensureBtree(events, "event_id", "value", loc, evSource)
    val dead = events.filter(col("event_id") % 5 === 2)
    ScalarIndex.deleteIds(dead, "event_id", loc)
    assert(ScalarIndex.hasTombstones(loc))
    val want = baseRange(events.filter(col("event_id") % 5 =!= 2))
    val got = idxRange(loc)
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
    assert(!got.exists(_.getLong(0) % 5 == 2), "a deleted id was retrieved")
    ScalarIndex.deleteIds(dead, "event_id", loc)
    assert(idxRange(loc).toSeq == want.toSeq)
  }

  test("btree compaction: tombstones physically folded, zonemap recomputed " +
      "exactly, results unchanged") {
    val loc = tmpLoc("bt-compact")
    ScalarIndex.ensureBtree(events, "event_id", "value", loc, evSource)
    ScalarIndex.deleteIds(events.filter(col("event_id") % 5 === 2),
      "event_id", loc)
    val before = idxRange(loc)
    ScalarIndex.compactBtree(spark, loc)
    assert(!ScalarIndex.hasTombstones(loc), "compaction must clear tombstones")
    val live = spark.read.parquet(s"$loc/postings")
    assert(live.filter(col("id") % 5 === 2).count() == 0,
      "deleted ids must be physically gone after compaction")
    // zonemap collapsed to one exact row per surviving bucket
    val zm = spark.read.parquet(s"$loc/zonemap")
    assert(zm.groupBy(col("bkt")).count().filter(col("count") > 1).count() == 0,
      "compaction must collapse zonemap deltas")
    assert(idxRange(loc).toSeq == before.toSeq)
  }

  // ---- NATIVE-keyed btree (date): zonemap in the key's own type ------

  private def dayEvents = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(evSource)
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("timestamp_micros(ts div 1000)")
      case _ => col("ts").cast("timestamp")
    }
    raw.withColumn("day", to_date(ts))
  }

  private val DLo = java.sql.Date.valueOf("2024-01-08")
  private val DHi = java.sql.Date.valueOf("2024-01-17")

  test("date-keyed btree: native zonemap, typed range search ≡ base " +
      "filter, build+append ≡ one-shot, typed compaction") {
    val ev = dayEvents
    val loc = tmpLoc("bt-date")
    assert(ScalarIndex.ensureBtree(ev, "event_id", "day", loc, evSource))
    assert(graft.ops.AnnIndex.readManifest(loc).exists(_.keyType == "DATE"))
    // the zonemap holds DATE, not a double shadow
    assert(spark.read.parquet(s"$loc/zonemap").schema("lo").dataType ==
      org.apache.spark.sql.types.DateType)
    val want = ev.filter(col("day") >= lit(DLo) && col("day") <= lit(DHi))
      .select(col("event_id").as("id"), col("day").as("key"))
      .orderBy(col("id")).collect()
    assert(want.nonEmpty)
    val got = ScalarIndex.searchBtreeRangeTyped(spark, loc, DLo, DHi)
      .orderBy(col("id")).collect()
    assert(got.toSeq == want.toSeq)
    // the double API refuses a native index (and vice versa), loudly
    val e = intercept[IllegalArgumentException](
      ScalarIndex.searchBtreeRange(spark, loc, 0.0, 1.0))
    assert(e.getMessage.contains("searchBtreeRangeTyped"))
    // build+append ≡ one-shot through the native boundary fold
    val loc2 = tmpLoc("bt-date-append")
    val fp = graft.ops.AnnIndex.sourceFingerprint(evSource)
    ScalarIndex.ensureBtree(ev.filter(col("event_id") % 2 === 0),
      "event_id", "day", loc2, evSource,
      fingerprintOverride = Some(s"partial:$fp"))
    ScalarIndex.appendBtree(ev.filter(col("event_id") % 2 === 1),
      "event_id", "day", loc2, newFingerprint = fp)
    assert(ScalarIndex.searchBtreeRangeTyped(spark, loc2, DLo, DHi)
      .orderBy(col("id")).collect().toSeq == want.toSeq)
    // delete + typed compaction (native zonemap recompute)
    ScalarIndex.deleteIds(ev.filter(col("event_id") % 5 === 2),
      "event_id", loc)
    ScalarIndex.compactBtree(spark, loc)
    val wantDel = ev.filter(col("day") >= lit(DLo) && col("day") <= lit(DHi))
      .filter(col("event_id") % 5 =!= 2)
      .select(col("event_id").as("id"), col("day").as("key"))
      .orderBy(col("id")).collect()
    assert(ScalarIndex.searchBtreeRangeTyped(spark, loc, DLo, DHi)
      .orderBy(col("id")).collect().toSeq == wantDel.toSeq)
  }

  test("string-keyed btree: prefix search ≡ LIKE 'p%' on the base table, " +
      "bucket-pruned, tombstone-composed; numeric/short guards refuse") {
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
    val loc = tmpLoc("bt-prefix")
    assert(ScalarIndex.ensureBtree(parts, "p_partkey", "p_name", loc,
      s"$sfDir/part.parquet"))
    assert(spark.read.parquet(s"$loc/zonemap").schema("lo").dataType ==
      org.apache.spark.sql.types.StringType)
    val want = parts.filter(col("p_name").startsWith("sm"))
      .select(col("p_partkey").as("id"), col("p_name").as("key"))
      .orderBy(col("id")).collect()
    assert(want.nonEmpty)
    val df = ScalarIndex.searchBtreePrefix(spark, loc, "sm")
    assert(df.orderBy(col("id")).collect().toSeq == want.toSeq)
    // the prefix scan is partition-pruned: a sorted layout makes 'sm%'
    // a contiguous bucket read, not a full postings scan
    val plan = df.queryExecution.executedPlan.toString
    val prunedLine = plan.linesIterator
      .filter(_.contains("PartitionFilters")).mkString
    assert(prunedLine.contains("bkt") && prunedLine.contains(" IN "),
      s"expected a static bkt IN (...) partition filter:\n$plan")
    // an impossible prefix reads nothing
    assert(ScalarIndex.searchBtreePrefix(spark, loc, "zzzzzz~").count() == 0)
    // tombstones compose
    ScalarIndex.deleteIds(parts.filter(col("p_partkey") % 3 === 0),
      "p_partkey", loc)
    val wantDel = parts.filter(col("p_name").startsWith("sm") &&
        col("p_partkey") % 3 =!= 0)
      .select(col("p_partkey").as("id"), col("p_name").as("key"))
      .orderBy(col("id")).collect()
    assert(ScalarIndex.searchBtreePrefix(spark, loc, "sm")
      .orderBy(col("id")).collect().toSeq == wantDel.toSeq)
    // guards: empty prefix, and a numeric-keyed (double-shadow) index
    intercept[IllegalArgumentException](
      ScalarIndex.searchBtreePrefix(spark, loc, ""))
    val locNum = tmpLoc("bt-prefix-num")
    ScalarIndex.ensureBtree(events, "event_id", "value", locNum, evSource)
    val e = intercept[IllegalArgumentException](
      ScalarIndex.searchBtreePrefix(spark, locNum, "sm"))
    assert(e.getMessage.contains("string"))
  }

  test("timestamp-keyed btree: native zonemap, typed range search ≡ base " +
      "filter") {
    val ev = dayEvents.withColumn("tskey", col("day").cast("timestamp"))
    val loc = tmpLoc("bt-ts")
    assert(ScalarIndex.ensureBtree(ev, "event_id", "tskey", loc, evSource))
    assert(spark.read.parquet(s"$loc/zonemap").schema("lo").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val tLo = java.sql.Timestamp.valueOf("2024-01-08 00:00:00")
    val tHi = java.sql.Timestamp.valueOf("2024-01-17 00:00:00")
    val want = ev.filter(col("tskey") >= lit(tLo) && col("tskey") <= lit(tHi))
      .select(col("event_id").as("id"), col("tskey").as("key"))
      .orderBy(col("id")).collect()
    assert(want.nonEmpty)
    val got = ScalarIndex.searchBtreeRangeTyped(spark, loc, tLo, tHi)
      .orderBy(col("id")).collect()
    assert(got.toSeq == want.toSeq)
  }

  test("date-keyed btree: top-k scan walks the native zonemap") {
    val ev = dayEvents
    val loc = tmpLoc("bt-date-topk")
    ScalarIndex.ensureBtree(ev, "event_id", "day", loc, evSource)
    val scan = ScalarIndex.btreeTopKScan(spark, loc, 5, ascending = true)
    assert(scan.isDefined)
    val got = scan.get.orderBy(col("key"), col("id")).limit(5).collect()
    val want = ev.filter(col("day").isNotNull)
      .select(col("event_id").as("id"), col("day").as("key"))
      .orderBy(col("key"), col("id")).limit(5).collect()
    assert(got.toSeq == want.toSeq)
  }

  private val Langs = Seq("en", "de")

  private def baseEq(base: org.apache.spark.sql.DataFrame, ks: Seq[String]) =
    base.filter(col("lang").isInCollection(ks))
      .select(col("doc_id").as("id"), col("lang").as("k"))
      .orderBy(col("id")).collect()

  private def idxEq(loc: String, ks: Seq[String]) =
    ScalarIndex.searchBitmap(spark, loc, ks).orderBy(col("id")).collect()

  test("bitmap equality search is row-identical to a base-table IN filter " +
      "and the read is pruned to the asked-for values' directories") {
    val loc = tmpLoc("bm")
    assert(ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource),
      "first ensure must build")
    val got = idxEq(loc, Langs)
    assert(got.nonEmpty)
    assert(got.toSeq == baseEq(docs, Langs).toSeq)
    val df = ScalarIndex.searchBitmap(spark, loc, Langs)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val pruned = plan.linesIterator
      .filter(_.contains("PartitionFilters"))
      .exists(l => l.contains("k#") && l.contains("IN "))
    assert(pruned, s"expected a static k IN (...) partition filter:\n$plan")
  }

  test("empty-string keys are unindexed (the partition codec reads '' " +
      "back as NULL) — rows with them never match and never corrupt k") {
    import spark.implicits._
    val df = Seq((1L, "en"), (2L, ""), (3L, "de"), (4L, "en"))
      .toDF("id", "lang")
    val loc = tmpLoc("bm-empty")
    ScalarIndex.ensureBitmap(df, "id", "lang", loc, docSource,
      fingerprintOverride = Some("synth"))
    val got = ScalarIndex.searchBitmap(spark, loc, Seq("en", "de"))
      .orderBy(col("id")).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L))
    assert(got.forall(_.getString(1) != null), "a null k leaked out")
    // the empty-keyed row is simply absent from the index
    assert(spark.read.schema("id BIGINT, k STRING")
      .parquet(s"$loc/postings").count() == 3)
  }

  test("bitmap build refuses a high-cardinality key") {
    val loc = tmpLoc("bm-card")
    val e = intercept[IllegalArgumentException] {
      ScalarIndex.ensureBitmap(docs, "doc_id", "doc_id", loc, docSource,
        maxCardinality = 10)
    }
    assert(e.getMessage.contains("btree"),
      "the refusal must point at the btree alternative")
  }

  test("bitmap append ≡ one-shot (new values create new directories)") {
    val loc = tmpLoc("bm-append")
    val fp = AnnIndex.sourceFingerprint(docSource)
    ScalarIndex.ensureBitmap(docs.filter(col("lang") =!= "de"),
      "doc_id", "lang", loc, docSource,
      fingerprintOverride = Some(s"partial:$fp"))
    ScalarIndex.appendBitmap(docs.filter(col("lang") === "de"),
      "doc_id", "lang", loc, newFingerprint = fp)
    assert(AnnIndex.readManifest(loc).exists(_.fingerprint == fp))
    assert(idxEq(loc, Langs).toSeq == baseEq(docs, Langs).toSeq)
  }

  test("bitmap delete ≡ filter; compaction folds and collapses counts; " +
      "results unchanged") {
    val loc = tmpLoc("bm-del")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource)
    ScalarIndex.deleteIds(docs.filter(col("doc_id") % 3 === 1), "doc_id", loc)
    val want = baseEq(docs.filter(col("doc_id") % 3 =!= 1), Langs)
    assert(idxEq(loc, Langs).toSeq == want.toSeq)
    ScalarIndex.compactBitmap(spark, loc)
    assert(!ScalarIndex.hasTombstones(loc))
    val live = spark.read.schema("id BIGINT, k STRING")
      .parquet(s"$loc/postings")
    assert(live.filter(col("id") % 3 === 1).count() == 0,
      "deleted ids must be physically gone after compaction")
    val vals = spark.read.parquet(s"$loc/values")
    assert(vals.groupBy(col("k")).count().filter(col("count") > 1).count() == 0,
      "compaction must collapse per-value count deltas")
    assert(idxEq(loc, Langs).toSeq == want.toSeq)
  }

  test("bitmap conjunction across two indexes ≡ an AND filter on the base " +
      "table — no base-table scan in the searched plan") {
    val locL = tmpLoc("bm-and-lang")
    val locS = tmpLoc("bm-and-src")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", locL, docSource)
    ScalarIndex.ensureBitmap(docs, "doc_id", "source", locS, docSource)
    val srcVals = Seq("src1", "src2", "src3")
    val got = ScalarIndex.searchBitmapAnd(spark, locL, Langs, locS, srcVals)
      .orderBy(col("id")).collect()
    val want = docs.filter(col("lang").isInCollection(Langs) &&
        col("source").isInCollection(srcVals))
      .select(col("doc_id").as("id")).orderBy(col("id")).collect()
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
  }

  // ---- LABEL_LIST --------------------------------------------------------

  private def tagsDf =
    docs.select(col("doc_id"),
      array_distinct(split(lower(trim(col("text"))), "\\s+")).as("tags"))

  private val AnyL = Seq("vector", "dup")
  private val AllL = Seq("vector", "spark", "query")

  private def wantAny(base: org.apache.spark.sql.DataFrame) =
    base.filter(AnyL.map(l => array_contains(col("tags"), l))
        .reduce(_ || _))
      .select(col("doc_id").as("id")).orderBy(col("id")).collect()

  private def wantAll(base: org.apache.spark.sql.DataFrame) =
    base.filter(AllL.map(l => array_contains(col("tags"), l))
        .reduce(_ && _))
      .select(col("doc_id").as("id")).orderBy(col("id")).collect()

  test("label-list hasAny ≡ a membership disjunction (each id once, even " +
      "with several matching labels) and hasAll ≡ the conjunction") {
    val loc = tmpLoc("ll")
    assert(ScalarIndex.ensureLabelList(tagsDf, "doc_id", "tags",
      loc, docSource), "first ensure must build")
    val gotAny = ScalarIndex.searchHasAny(spark, loc, AnyL)
      .orderBy(col("id")).collect()
    assert(gotAny.nonEmpty)
    assert(gotAny.toSeq == wantAny(tagsDf).toSeq)
    assert(gotAny.map(_.getLong(0)).distinct.length == gotAny.length,
      "hasAny must deduplicate multi-label ids")
    val gotAll = ScalarIndex.searchHasAll(spark, loc, AllL)
      .orderBy(col("id")).collect()
    assert(gotAll.nonEmpty)
    assert(gotAll.toSeq == wantAll(tagsDf).toSeq)
    // repeated labels in the query must not break the count law
    assert(ScalarIndex.searchHasAll(spark, loc, AllL ++ AllL.take(1))
      .orderBy(col("id")).collect().toSeq == gotAll.toSeq)
  }

  test("label-list append ≡ one-shot; delete ≡ filter; compaction " +
      "accepts the label_list type and preserves results") {
    val loc = tmpLoc("ll-append")
    val fp = AnnIndex.sourceFingerprint(docSource)
    ScalarIndex.ensureLabelList(tagsDf.filter(col("doc_id") % 2 === 0),
      "doc_id", "tags", loc, docSource,
      fingerprintOverride = Some(s"partial:$fp"))
    ScalarIndex.appendLabelList(tagsDf.filter(col("doc_id") % 2 === 1),
      "doc_id", "tags", loc, newFingerprint = fp)
    assert(AnnIndex.readManifest(loc).exists(_.fingerprint == fp))
    assert(ScalarIndex.searchHasAny(spark, loc, AnyL)
      .orderBy(col("id")).collect().toSeq == wantAny(tagsDf).toSeq)
    ScalarIndex.deleteIds(docs.filter(col("doc_id") % 3 === 1),
      "doc_id", loc)
    val want = wantAny(tagsDf.filter(col("doc_id") % 3 =!= 1))
    assert(ScalarIndex.searchHasAny(spark, loc, AnyL)
      .orderBy(col("id")).collect().toSeq == want.toSeq)
    ScalarIndex.compactBitmap(spark, loc)
    assert(!ScalarIndex.hasTombstones(loc))
    assert(ScalarIndex.searchHasAny(spark, loc, AnyL)
      .orderBy(col("id")).collect().toSeq == want.toSeq)
  }

  test("CDC streaming ingest: per-micro-batch adds (appendBtree against " +
      "frozen boundaries) and deletes (tombstones) keep the served range " +
      "search ≡ the equivalent batch corpus") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val loc = tmpLoc("bt-cdc")
    val fp0 = "cdc:base"
    ScalarIndex.ensureBtree(events.filter(col("event_id") % 2 === 0),
      "event_id", "value", loc, evSource,
      fingerprintOverride = Some(fp0))
    val feed = events.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("value"))
      .as[(Long, Double)].collect().toSeq
      .map { case (id, v) => ("add", id, v) } ++
      events.filter(col("event_id") % 10 === 4)
        .select(col("event_id")).as[Long].collect().toSeq
        .map(id => ("del", id, 0.0))
    val stream = MemoryStream[(String, Long, Double)]
    val batchNo = new java.util.concurrent.atomic.AtomicLong(0L)
    val query = stream.toDF().toDF("op", "event_id", "value")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val n = batchNo.incrementAndGet()
        val adds = batch.filter(col("op") === "add")
          .select(col("event_id"), col("value"))
        if (!adds.isEmpty)
          ScalarIndex.appendBtree(adds, "event_id", "value", loc,
            newFingerprint = s"cdc:batch$n")
        val dels = batch.filter(col("op") === "del").select(col("event_id"))
        if (!dels.isEmpty) ScalarIndex.deleteIds(dels, "event_id", loc)
        ()
      }
      .start()
    try {
      val (b1, b2) = feed.splitAt(feed.length / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
    } finally query.stop()
    val equivalent = events.filter(col("event_id") % 10 =!= 4)
    val got = idxRange(loc)
    assert(got.nonEmpty)
    assert(got.toSeq == baseRange(equivalent).toSeq,
      "CDC-maintained btree diverged from the equivalent batch corpus")
  }

  test("vacuum deletes abandoned build/compaction stagings older than the " +
      "horizon — never live dirs, the manifest, or in-flight stagings") {
    val loc = tmpLoc("bt-vacuum")
    ScalarIndex.ensureBtree(events, "event_id", "value", loc, evSource)
    val want = idxRange(loc)
    def plant(path: String, old: Boolean): java.io.File = {
      val f = new java.io.File(path)
      assert(f.mkdirs())
      if (old) assert(f.setLastModified(
        System.currentTimeMillis() - 48L * 3600 * 1000))
      f
    }
    val oldSibling = plant(s"$loc.tmp.99999.1", old = true)
    val oldCompact = plant(s"$loc/postings.compact.99999.1", old = true)
    val freshStaging = plant(s"$loc/zonemap.compact.99999.2", old = false)
    val deleted = graft.ops.AnnIndex.vacuumIndex(loc)
    assert(deleted.toSet ==
      Set(oldSibling.getPath, oldCompact.getPath))
    assert(!oldSibling.exists() && !oldCompact.exists())
    assert(freshStaging.exists(),
      "an in-flight (young) staging must survive the vacuum")
    assert(new java.io.File(s"$loc/postings").exists())
    assert(graft.ops.AnnIndex.readManifest(loc).isDefined)
    assert(idxRange(loc).toSeq == want.toSeq, "results unchanged by vacuum")
    // idempotent: nothing left to collect
    assert(graft.ops.AnnIndex.vacuumIndex(loc).isEmpty)
  }

  test("scalar index is catalog-registrable and resolvable by name") {
    val loc = tmpLoc("bt-cat")
    ScalarIndex.ensureBtree(events, "event_id", "value", loc, evSource)
    graft.queries.CatalogQueries.ensureCatalog(spark)
    AnnIndex.registerIndexTable(spark, "graft.tpch.scalar_spec_idx", loc)
    assert(AnnIndex.resolveIndexLocation(
      spark, "graft.tpch.scalar_spec_idx") == loc)
  }

  test("string-btree driver pruning uses the zonemap's own UTF-8 byte " +
      "order — supplementary-plane keys are never wrongly pruned " +
      "(prefix, typed range, top-k walk)") {
    import spark.implicits._
    val src = tmpLoc("bt-utf8-src")
    // binary (code-point) order: "alpha" < "￿match" < "😀z"
    // (U+1F600 > U+FFFF in code points) — JVM UTF-16 order disagrees:
    // the surrogate pair sorts BELOW "￿…", so a JVM-ordered prune
    // against the UTF8String-binary zonemap would skip the bucket
    val smile = new String(Character.toChars(0x1F600))
    Seq((1L, "alpha"), (2L, "￿match"), (3L, smile + "z"))
      .toDF("id", "key").write.parquet(src)
    val base = spark.read.parquet(src)
    val loc = tmpLoc("bt-utf8")
    ScalarIndex.ensureBtree(base, "id", "key", loc, src, nBuckets = 1)
    assert(ScalarIndex.searchBtreePrefix(spark, loc, "￿")
      .select(col("id")).collect().map(_.getLong(0)).toSeq == Seq(2L),
      "the \\uFFFF-prefixed key must survive bucket pruning under a " +
        "supplementary-plane zonemap hi")
    assert(ScalarIndex.searchBtreeRangeTyped(spark, loc,
        "￿", smile + "z")
      .select(col("id")).collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(2L, 3L))
    val top = ScalarIndex.btreeTopKScan(spark, loc, 2, ascending = false)
    assert(top.isDefined)
    assert(top.get.orderBy(col("key").desc).limit(2)
      .select(col("id")).collect().map(_.getLong(0)).toSeq == Seq(3L, 2L))
  }

  test("typed range search serves STRICT bounds: exclusive endpoints " +
      "drop the boundary rows an inclusive ask keeps") {
    val ev = dayEvents
    val loc = tmpLoc("bt-date-strict")
    ScalarIndex.ensureBtree(ev, "event_id", "day", loc, evSource)
    val incl = ScalarIndex.searchBtreeRangeTyped(spark, loc, DLo, DHi)
      .orderBy(col("id")).collect()
    val strict = ScalarIndex.searchBtreeRangeTyped(spark, loc, DLo, DHi,
        loInclusive = false, hiInclusive = false)
      .orderBy(col("id")).collect()
    val want = ev.filter(col("day") > lit(DLo) && col("day") < lit(DHi))
      .select(col("event_id").as("id"), col("day").as("key"))
      .orderBy(col("id")).collect()
    assert(strict.toSeq == want.toSeq)
    assert(strict.length < incl.length,
      "the boundary days hold rows — strict must drop them")
  }

  test("vacuum refuses a horizon below the floor: a short horizon races " +
      "with live builders") {
    val loc = tmpLoc("bt-vacuum-floor")
    ScalarIndex.ensureBtree(events, "event_id", "value", loc, evSource)
    val e = intercept[IllegalArgumentException](
      graft.ops.AnnIndex.vacuumIndex(loc, olderThanMs = 1000))
    assert(e.getMessage.contains("floor"))
    // the floor itself is accepted
    assert(graft.ops.AnnIndex.vacuumIndex(loc,
      olderThanMs = graft.ops.AnnIndex.MinVacuumHorizonMs).isEmpty)
  }

  test("btreeStatsRange: filtered min/max/count equal the base-table " +
      "aggregate across inclusive/strict/one-sided/matchless shapes") {
    val loc = tmpLoc("bt-stats")
    ScalarIndex.ensureBtree(events, "event_id", "value", loc, evSource)
    def want(p: org.apache.spark.sql.Column) = events.filter(p)
      .agg(min(col("value")), max(col("value")), count(lit(1)))
      .collect().head
    def got(lo: Double, hi: Double, loInc: Boolean, hiInc: Boolean) =
      ScalarIndex.btreeStatsRange(spark, loc, lo, hi, loInc, hiInc)
        .collect().head
    val shapes = Seq(
      (Lo, Hi, true, true, col("value") >= Lo && col("value") <= Hi),
      (Lo, Hi, false, false, col("value") > Lo && col("value") < Hi),
      (Lo, Double.PositiveInfinity, true, true, col("value") >= Lo),
      (Double.NegativeInfinity, Hi, false, false, col("value") < Hi))
    shapes.foreach { case (lo, hi, li, hiI, p) =>
      val w = want(p); val g = got(lo, hi, li, hiI)
      assert(g.getDouble(0) == w.getDouble(0) &&
        g.getDouble(1) == w.getDouble(1) && g.getLong(2) == w.getLong(2),
        s"stats drifted for [$lo, $hi] inc=($li,$hiI): $g vs $w")
    }
    // a matchless range answers (NULL, NULL, 0) — SQL aggregate semantics
    val empty = got(1e12, 2e12, true, true)
    assert(empty.isNullAt(0) && empty.isNullAt(1) && empty.getLong(2) == 0L)
  }

  test("FILESTATS: btree candidate files are a pruning SUPERSET — every " +
      "file holding a matching row is named, and a selective range over " +
      "a clustered layout names fewer files than the source holds") {
    // a range-clustered multi-file copy: files get tight key ranges
    val dir = Files.createTempDirectory("graft-fscl").toString
    val src = s"$dir/ev.parquet"
    events.repartitionByRange(8, col("value"))
      .write.mode("overwrite").parquet(src)
    val loc = tmpLoc("bt-filestats")
    val clustered = spark.read.parquet(src)
    ScalarIndex.ensureBtree(clustered, "event_id", "value", loc, src)
    val cands = ScalarIndex.btreeCandidateFiles(spark, loc, Lo, Hi)
    assert(cands.isDefined, "a file-built btree must carry filestats")
    val truth = clustered
      .filter(col("value") >= Lo && col("value") <= Hi)
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(truth.subsetOf(cands.get.files.toSet),
      s"candidates must cover every matching file: " +
        s"missing ${truth.diff(cands.get.files.toSet)}")
    val total = clustered.select(input_file_name()).distinct().count()
    assert(cands.get.files.size < total,
      s"a selective range must prune " +
        s"(got ${cands.get.files.size} of $total)")
    // the receipt denominator rides the stats themselves — no listing
    assert(cands.get.totalFiles == total,
      s"stats total ${cands.get.totalFiles} != source files $total")
    // an append whose delta rows live OUTSIDE the source tree adds no
    // source files: the map stays a correct file-level zonemap OF THE
    // SOURCE (mutations only ever touch source files), so candidates
    // keep serving — r17's fresh-source derivation makes provenance
    // correct by construction instead of declining the whole map
    val extra = s"$dir/extra.parquet"
    events.limit(50).select(col("event_id") + 1000000L, col("value"))
      .toDF("event_id", "value").write.mode("overwrite").parquet(extra)
    ScalarIndex.appendBtree(spark.read.parquet(extra), "event_id", "value",
      loc, newFingerprint = "appended")
    val after = ScalarIndex.btreeCandidateFiles(spark, loc, Lo, Hi)
    assert(after.isDefined &&
        truth.subsetOf(after.get.files.toSet),
      "out-of-tree delta must leave the source file map serving")
  }

  test("FILESTATS (typed): date-keyed candidate files are a pruning " +
      "superset under the native ordering") {
    val dir = Files.createTempDirectory("graft-fstyped").toString
    val src = s"$dir/days.parquet"
    events.select(col("event_id"), to_date(col("ts")).as("day"))
      .repartitionByRange(8, col("day"))
      .write.mode("overwrite").parquet(src)
    val clustered = spark.read.parquet(src)
    val loc = tmpLoc("bt-filestats-typed")
    ScalarIndex.ensureBtree(clustered, "event_id", "day", loc, src)
    val lo = java.sql.Date.valueOf("2024-01-08")
    val hi = java.sql.Date.valueOf("2024-01-12")
    val cands = ScalarIndex.btreeCandidateFilesTyped(spark, loc, lo, hi)
    assert(cands.isDefined, "a file-built date btree must carry filestats")
    val truth = clustered
      .filter(col("day") >= lit(lo) && col("day") <= lit(hi))
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(truth.subsetOf(cands.get.files.toSet),
      s"missing ${truth.diff(cands.get.files.toSet)}")
    val total = clustered.select(input_file_name()).distinct().count()
    assert(cands.get.files.size < total,
      s"a selective date range must prune " +
        s"(got ${cands.get.files.size} of $total)")
    // the numeric reader refuses the native stats (and vice versa)
    assert(ScalarIndex.btreeCandidateFiles(spark, loc, 0.0, 1.0).isEmpty)
  }

  test("FILESTATS: bitmap candidates name only files holding the asked " +
      "values; unknown provenance (a non-file build source) declines") {
    val dir = Files.createTempDirectory("graft-fsbm").toString
    val src = s"$dir/docs.parquet"
    // cluster by lang so each file is single-valued → pruning is real
    docs.select(col("doc_id"), col("lang"), col("lang").as("lp"))
      .repartition(1).write.partitionBy("lp")
      .mode("overwrite").parquet(src)
    val loc = tmpLoc("bm-filestats")
    val clustered = spark.read.parquet(src)
    ScalarIndex.ensureBitmap(clustered, "doc_id", "lang", loc, src)
    val cands = ScalarIndex.bitmapCandidateFiles(spark, loc, Seq("de"))
    assert(cands.isDefined)
    val truth = clustered.filter(col("lang") === "de")
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(truth.subsetOf(cands.get.files.toSet))
    val total = clustered.select(input_file_name()).distinct().count()
    assert(cands.get.files.size < total,
      s"single-valued files must prune " +
        s"(got ${cands.get.files.size} of $total)")
    // an UNSCANNABLE source binding (no parquet there) can prove no
    // provenance → the build DECLINES the stats once (marker stamped),
    // readers fall back to the probe scan, and the next ensure call
    // REUSES the index instead of rebuilding forever (ADVICE r16)
    import spark.implicits._
    val mem = Seq((1L, "en"), (2L, "de")).toDF("doc_id", "lang")
    val locMem = tmpLoc("bm-filestats-mem")
    val ghost = s"$dir/nowhere.parquet"
    val built = ScalarIndex.ensureBitmap(mem, "doc_id", "lang", locMem,
      ghost, fingerprintOverride = Some("mem"))
    assert(built)
    assert(ScalarIndex.bitmapCandidateFiles(spark, locMem, Seq("en")).isEmpty,
      "unknown file provenance must decline, never mis-prune")
    val rebuilt = ScalarIndex.ensureBitmap(mem, "doc_id", "lang", locMem,
      ghost, fingerprintOverride = Some("mem"))
    assert(!rebuilt,
      "a declined-provenance index must be rebuilt at most once — " +
        "the declined marker settles the freshness match")
  }
}
