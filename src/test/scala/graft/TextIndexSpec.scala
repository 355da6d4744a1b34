package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{AnnIndex, TextIndex, TextRanking}

/** The persisted INVERTED text index — [[graft.ops.TextIndex]]. Pins
  * (1) persisted BM25 ≡ the in-query [[TextRanking.bm25]] bit-for-bit,
  * (2) the postings scan is partition-pruned to the query terms' buckets,
  * (3) fingerprint-gated rebuilds, (4) build+append ≡ one-shot,
  * (5) delete ≡ filter INCLUDING the corpus-stats effect on idf/avgdl,
  * (6) compaction folds tombstones without changing results. */
class TextIndexSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val source = s"$sfDir/documents.parquet"
  private val terms = Seq("dup", "vector", "spark")

  private def tmpLoc(name: String): String =
    s"${Files.createTempDirectory("graft-ftsspec").toString}/$name"

  private def inQuery(base: org.apache.spark.sql.DataFrame) =
    TextRanking.bm25(base, "doc_id", "text", terms)
      .select(col("doc_id"), round(col("score"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).collect()

  private def persisted(loc: String) =
    TextIndex.searchBm25(spark, loc, terms)
      .select(col("doc_id"), round(col("score"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).collect()

  test("persisted BM25 is row-identical to the in-query bm25") {
    val loc = tmpLoc("fts")
    assert(TextIndex.ensureInverted(docs, "doc_id", "text", loc, source),
      "first ensure must build")
    val got = persisted(loc)
    assert(got.nonEmpty)
    assert(got.toSeq == inQuery(docs).toSeq)
  }

  test("postings scan is partition-pruned to the query terms' buckets") {
    val loc = tmpLoc("fts-prune")
    TextIndex.ensureInverted(docs, "doc_id", "text", loc, source)
    val df = TextIndex.searchBm25(spark, loc, terms)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val pruned = plan.linesIterator
      .filter(_.contains("PartitionFilters"))
      .exists(l => l.contains("bkt") && l.contains(" IN "))
    assert(pruned, s"expected a static bkt IN (...) partition filter:\n$plan")
  }

  test("unchanged fingerprint skips the build; a changed source rebuilds") {
    val loc = tmpLoc("fts-fresh")
    assert(TextIndex.ensureInverted(docs, "doc_id", "text", loc, source))
    assert(!TextIndex.ensureInverted(docs, "doc_id", "text", loc, source),
      "fresh index must not rebuild")
    // simulate a new data drop by stamping a different fingerprint
    assert(TextIndex.ensureInverted(docs, "doc_id", "text", loc, source,
      fingerprintOverride = Some("other")), "stale index must rebuild")
  }

  test("incremental append: build-half + append-half ≡ one-shot (df and " +
      "stats derived from the combined deltas)") {
    val loc = tmpLoc("fts-append")
    val fp = AnnIndex.sourceFingerprint(source)
    TextIndex.ensureInverted(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", loc, source,
      fingerprintOverride = Some(s"partial:$fp"))
    TextIndex.appendInverted(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", loc, newFingerprint = fp)
    assert(AnnIndex.readManifest(loc).exists(_.fingerprint == fp),
      "append must re-stamp the full fingerprint")
    val got = persisted(loc)
    assert(got.nonEmpty)
    assert(got.toSeq == inQuery(docs).toSeq)
  }

  test("delete ≡ filter: tombstoned docs leave BOTH the result list and " +
      "the corpus statistics (idf/avgdl see the filtered corpus)") {
    val loc = tmpLoc("fts-del")
    TextIndex.ensureInverted(docs, "doc_id", "text", loc, source)
    TextIndex.deleteDocs(docs.filter(col("doc_id") % 7 === 3), "doc_id", loc)
    assert(TextIndex.hasTombstones(loc))
    val got = persisted(loc)
    val want = inQuery(docs.filter(col("doc_id") % 7 =!= 3))
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
    assert(!got.exists(_.getLong(0) % 7 == 3), "a deleted doc was retrieved")
    // re-delete is a no-op (set semantics): results unchanged
    TextIndex.deleteDocs(docs.filter(col("doc_id") % 7 === 3), "doc_id", loc)
    assert(persisted(loc).toSeq == want.toSeq)
  }

  test("compaction folds tombstones: physically removed, dir cleared, " +
      "results unchanged") {
    val loc = tmpLoc("fts-compact")
    TextIndex.ensureInverted(docs, "doc_id", "text", loc, source)
    TextIndex.deleteDocs(docs.filter(col("doc_id") % 7 === 3), "doc_id", loc)
    val before = persisted(loc)
    TextIndex.compactInverted(spark, loc)
    assert(!TextIndex.hasTombstones(loc), "compaction must clear tombstones")
    val livePostings = spark.read.parquet(s"$loc/postings")
    assert(livePostings.filter(col("doc_id") % 7 === 3).count() == 0,
      "deleted docs must be physically gone after compaction")
    // stats collapsed to the one true row of the filtered corpus
    val stats = spark.read.parquet(s"$loc/stats").collect()
    assert(stats.length == 1, "compaction must collapse stats deltas")
    assert(persisted(loc).toSeq == before.toSeq)
  }

  test("filtered search restricts results but NOT the corpus: surviving " +
      "docs score exactly as in the unfiltered search (contrast: delete " +
      "shifts idf/avgdl)") {
    val loc = tmpLoc("fts-filt")
    TextIndex.ensureInverted(docs, "doc_id", "text", loc, source)
    val allowed = docs.filter(col("lang") === "en").select(col("doc_id"))
    val got = TextIndex.searchBm25Filtered(spark, loc, allowed, "doc_id", terms)
      .select(col("doc_id"), round(col("score"), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id")).collect()
    val allowedIds = allowed.collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty)
    assert(got.forall(r => allowedIds(r.getLong(0))),
      "a filtered-out doc was returned")
    // global-stats law: every returned (doc, score) appears VERBATIM in
    // the unfiltered ranking — the filter must not move any score
    val unfiltered = persisted(loc).map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.forall(r => unfiltered.get(r.getLong(0)).contains(r.getDouble(1))),
      "filter changed a surviving doc's score")
    // and it differs from DELETE semantics on the same id set: deleting
    // the complement shifts the corpus stats, so scores move
    val locDel = tmpLoc("fts-filt-vs-del")
    TextIndex.ensureInverted(docs, "doc_id", "text", locDel, source)
    TextIndex.deleteDocs(docs.filter(col("lang") =!= "en"), "doc_id", locDel)
    val deleted = persisted(locDel).map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(deleted.keySet.subsetOf(allowedIds))
    assert(deleted.exists { case (id, s) => !unfiltered.get(id).contains(s) },
      "delete should shift scores (smaller corpus) — it matched filter exactly")
  }

  // ---- phrase search (positional postings) ------------------------------

  /** Independent formulation: adjacency semi-joins over a positional
    * explode of the raw text — never touches the index code. */
  private def phraseWant(base: org.apache.spark.sql.DataFrame,
      phrase: Seq[String]) = {
    val pos = base.select(col("doc_id"),
      posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("p", "t")))
      .cache()
    val anchors = phrase.zipWithIndex.map { case (t, i) =>
      pos.filter(col("t") === t).select(col("doc_id"), (col("p") - i).as("s"))
    }
    anchors.reduce((a, b) => a.join(b, Seq("doc_id", "s"), "left_semi"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
      .orderBy(col("doc_id")).collect()
  }

  test("phrase search ≡ an adjacency scan of the raw text (2- and 3-term)") {
    val loc = tmpLoc("fts-phrase")
    TextIndex.ensureInverted(docs, "doc_id", "text", loc, source)
    for (phrase <- Seq(Seq("fast", "sort"), Seq("big", "order", "scan"))) {
      val got = TextIndex.searchPhrase(spark, loc, phrase)
        .orderBy(col("doc_id")).collect()
      val want = phraseWant(docs, phrase)
      assert(want.nonEmpty, s"fixture phrase $phrase matches nothing")
      assert(got.toSeq == want.toSeq, s"phrase $phrase diverged")
    }
  }

  test("a repeated-term phrase counts OVERLAPPING occurrences, like a " +
      "positional scan does") {
    val loc = tmpLoc("fts-phrase-rep")
    TextIndex.ensureInverted(docs, "doc_id", "text", loc, source)
    val got = TextIndex.searchPhrase(spark, loc, Seq("table", "table"))
      .orderBy(col("doc_id")).collect()
    val want = phraseWant(docs, Seq("table", "table"))
    assert(want.nonEmpty, "fixture has no doc with 'table table'")
    assert(got.toSeq == want.toSeq)
  }

  test("a raw-cased phrase normalizes to the index's lowercase convention") {
    val loc = tmpLoc("fts-phrase-case")
    TextIndex.ensureInverted(docs, "doc_id", "text", loc, source)
    val want = phraseWant(docs, Seq("fast", "sort"))
    assert(want.nonEmpty)
    assert(TextIndex.searchPhrase(spark, loc, Seq("FAST", "Sort"))
      .orderBy(col("doc_id")).collect().toSeq == want.toSeq,
      "an uppercase phrase must match the lowercased token stream")
  }

  test("phrase search composes with tombstones and with compaction") {
    val loc = tmpLoc("fts-phrase-del")
    TextIndex.ensureInverted(docs, "doc_id", "text", loc, source)
    TextIndex.deleteDocs(docs.filter(col("doc_id") % 5 === 1), "doc_id", loc)
    val want = phraseWant(docs.filter(col("doc_id") % 5 =!= 1),
      Seq("fast", "sort"))
    val got = TextIndex.searchPhrase(spark, loc, Seq("fast", "sort"))
      .orderBy(col("doc_id")).collect()
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
    TextIndex.compactInverted(spark, loc)
    assert(TextIndex.searchPhrase(spark, loc, Seq("fast", "sort"))
      .orderBy(col("doc_id")).collect().toSeq == want.toSeq,
      "compaction must preserve the positions column")
  }

  test("phrase search over build+append ≡ one-shot (positions ride the " +
      "append path)") {
    val loc = tmpLoc("fts-phrase-append")
    val fp = AnnIndex.sourceFingerprint(source)
    TextIndex.ensureInverted(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", loc, source,
      fingerprintOverride = Some(s"partial:$fp"))
    TextIndex.appendInverted(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", loc, newFingerprint = fp)
    val got = TextIndex.searchPhrase(spark, loc, Seq("fast", "sort"))
      .orderBy(col("doc_id")).collect()
    assert(got.nonEmpty)
    assert(got.toSeq == phraseWant(docs, Seq("fast", "sort")).toSeq)
  }

  test("a pre-positional index layout (metric=bm25) is rebuilt by ensure " +
      "and refused by searchPhrase") {
    val loc = tmpLoc("fts-phrase-legacy")
    TextIndex.ensureInverted(docs, "doc_id", "text", loc, source)
    // simulate the previous layout generation by downgrading the manifest
    val mf = java.nio.file.Paths.get(s"$loc/_MANIFEST.properties")
    java.nio.file.Files.writeString(mf,
      java.nio.file.Files.readString(mf).replace("bm25pos", "bm25"))
    val e = intercept[IllegalArgumentException] {
      TextIndex.searchPhrase(spark, loc, Seq("fast", "sort"))
    }
    assert(e.getMessage.contains("positional"))
    assert(TextIndex.ensureInverted(docs, "doc_id", "text", loc, source),
      "a pre-positional layout must rebuild even on a fresh fingerprint")
    assert(TextIndex.searchPhrase(spark, loc, Seq("fast", "sort"))
      .count() > 0)
  }

  test("CDC streaming ingest: per-micro-batch adds (appendInverted) and " +
      "deletes (tombstones) keep the served BM25 ≡ the equivalent batch " +
      "corpus — including the corpus-stats effect of the deletes") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val loc = tmpLoc("fts-cdc")
    // base: even doc_ids; the CDC feed adds odd ids < 400 and deletes the
    // %10==6 stragglers, across two micro-batches
    TextIndex.ensureInverted(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", loc, source,
      fingerprintOverride = Some("cdc:base"))
    val feed = docs.filter(col("doc_id") % 2 === 1 && col("doc_id") < 400)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toSeq
      .map { case (id, t) => ("add", id, t) } ++
      docs.filter(col("doc_id") % 10 === 6)
        .select(col("doc_id")).as[Long].collect().toSeq
        .map(id => ("del", id, ""))
    val stream = MemoryStream[(String, Long, String)]
    val batchNo = new java.util.concurrent.atomic.AtomicLong(0L)
    val query = stream.toDF().toDF("op", "doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val n = batchNo.incrementAndGet()
        val adds = batch.filter(col("op") === "add")
          .select(col("doc_id"), col("text"))
        if (!adds.isEmpty)
          TextIndex.appendInverted(adds, "doc_id", "text", loc,
            newFingerprint = s"cdc:batch$n")
        val dels = batch.filter(col("op") === "del").select(col("doc_id"))
        if (!dels.isEmpty) TextIndex.deleteDocs(dels, "doc_id", loc)
        ()
      }
      .start()
    try {
      val (b1, b2) = feed.splitAt(feed.length / 2)
      stream.addData(b1); query.processAllAvailable()
      stream.addData(b2); query.processAllAvailable()
    } finally query.stop()
    val equivalent = docs.filter(
      (col("doc_id") % 2 === 0 ||
        (col("doc_id") % 2 === 1 && col("doc_id") < 400)) &&
        col("doc_id") % 10 =!= 6)
    val got = persisted(loc)
    assert(got.nonEmpty)
    assert(got.toSeq == inQuery(equivalent).toSeq,
      "CDC-maintained index diverged from the equivalent batch corpus")
    // and the phrase path sees the same live view
    val gotPhrase = TextIndex.searchPhrase(spark, loc, Seq("fast", "sort"))
      .orderBy(col("doc_id")).collect()
    assert(gotPhrase.toSeq == phraseWant(equivalent, Seq("fast", "sort")).toSeq)
  }

  test("index is catalog-registrable and resolvable by name") {
    val loc = tmpLoc("fts-cat")
    TextIndex.ensureInverted(docs, "doc_id", "text", loc, source)
    graft.queries.CatalogQueries.ensureCatalog(spark)
    AnnIndex.registerIndexTable(spark, "graft.tpch.fts_spec_idx", loc)
    assert(AnnIndex.resolveIndexLocation(
      spark, "graft.tpch.fts_spec_idx") == loc)
  }
}
