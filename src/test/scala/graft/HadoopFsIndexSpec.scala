package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{AnnIndex, IndexFs, NgramIndex, ScalarIndex, TextIndex}

/** The index lifecycle's control plane rides Hadoop `FileSystem`
  * ([[graft.ops.IndexFs]]) — these laws drive one full lifecycle per
  * index family over an EXPLICITLY `file://`-schemed location (and a
  * `file://`-schemed SOURCE path for the staleness stat), which any raw
  * `java.nio` escape hatch would fail: nio cannot open a `file://…` URI
  * string as a path, so build/publish/append/delete/compact surviving
  * the scheme proves every manifest read/write, fingerprint stat,
  * atomic publish, tombstone probe and swap goes through the
  * abstraction that also serves hdfs:// and s3a://. */
class HadoopFsIndexSpec extends SparkSpec {

  private def schemed(name: String): String =
    s"file://${Files.createTempDirectory("graft-hfs").toString}/$name"

  private lazy val docSource = s"file://$sfDir/documents.parquet"
  private lazy val docs = spark.read.parquet(docSource)

  test("IndexFs: scheme split — file/hdfs publish by rename, object " +
      "stores by manifest-last commit") {
    assert(IndexFs.renamePublish("file:///tmp/x"))
    assert(IndexFs.renamePublish("/tmp/x"))
    assert(IndexFs.renamePublish("hdfs://nn/x"))
    assert(!IndexFs.renamePublish("s3a://bucket/x"))
    assert(!IndexFs.renamePublish("gs://bucket/x"))
    assert(!IndexFs.renamePublish("abfss://c@a.dfs.core.windows.net/x"))
  }

  test("IndexFs: renameInto refuses an existing target and detects the " +
      "posix mv-into race") {
    val root = s"file://${Files.createTempDirectory("graft-hfs").toString}"
    IndexFs.writeBytes(s"$root/a/f.txt", "x".getBytes)
    IndexFs.writeBytes(s"$root/b/f.txt", "y".getBytes)
    // target exists -> clean false, both trees untouched
    assert(!IndexFs.renameInto(s"$root/a", s"$root/b"))
    assert(IndexFs.exists(s"$root/a/f.txt") && IndexFs.exists(s"$root/b/f.txt"))
    // fresh target -> true
    assert(IndexFs.renameInto(s"$root/a", s"$root/c"))
    assert(IndexFs.exists(s"$root/c/f.txt") && !IndexFs.exists(s"$root/a"))
  }

  test("manifest-last commit protocol (forced): build, staleness skip, " +
      "crash-residue recovery and search all work without rename-publish") {
    sys.props("graft.indexfs.protocol") = "manifest-last"
    try {
      val loc = schemed("bm-ml")
      assert(!IndexFs.renamePublish(loc))
      assert(ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource))
      val want = docs.filter(col("lang") === "en").count()
      assert(ScalarIndex.searchBitmap(spark, loc, Seq("en")).count() == want)
      // fresh → skip (the staleness stat rode the protocol too)
      assert(!ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource))
      // a crashed build = data without manifest: invisible to readers,
      // cleared and rebuilt by the next ensure — the commit-marker law
      IndexFs.deleteRecursively(s"$loc/_MANIFEST.properties")
      assert(AnnIndex.readManifest(loc).isEmpty,
        "no manifest must read as no index")
      assert(ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource))
      assert(ScalarIndex.searchBitmap(spark, loc, Seq("en")).count() == want)
    } finally {
      sys.props.remove("graft.indexfs.protocol")
      ()
    }
  }

  test("the manifest records the SOURCE BINDING: path + id/key columns") {
    val loc = schemed("bm-src")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource)
    val man = AnnIndex.readManifest(loc).get
    assert(man.sourcePath == docSource)
    assert(man.sourceIdCol == "doc_id" && man.sourceKeyCol == "lang")
  }

  test("bitmap over file:// — build, search, append, delete, compact") {
    val loc = schemed("bm")
    assert(ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource))
    // fresh rebuild is skipped: the fingerprint stat rode the scheme too
    assert(!ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource))
    val want = docs.filter(col("lang") === "en").count()
    assert(ScalarIndex.searchBitmap(spark, loc, Seq("en")).count() == want)
    val victim = docs.filter(col("lang") === "en")
      .select(col("doc_id")).limit(2)
    ScalarIndex.deleteIds(victim, "doc_id", loc)
    assert(ScalarIndex.hasTombstones(loc))
    assert(AnnIndex.readManifest(loc).exists(_.divergent))
    assert(ScalarIndex.searchBitmap(spark, loc, Seq("en")).count() == want - 2)
    ScalarIndex.compactBitmap(spark, loc)
    assert(!ScalarIndex.hasTombstones(loc))
    assert(AnnIndex.readManifest(loc).exists(_.divergent),
      "compaction must not clear the divergence flag")
    assert(ScalarIndex.searchBitmap(spark, loc, Seq("en")).count() == want - 2)
  }

  test("btree over file:// — build, range search, append, compact; " +
      "manifest records the native key type") {
    val evSource = s"file://$sfDir/events.parquet"
    val events = spark.read.parquet(evSource)
    val loc = schemed("bt")
    assert(ScalarIndex.ensureBtree(events, "event_id", "value", loc, evSource))
    assert(AnnIndex.readManifest(loc).exists(_.keyType == "DOUBLE"))
    val want = events
      .filter(col("value") >= 100.0 && col("value") <= 300.0).count()
    assert(ScalarIndex.searchBtreeRange(spark, loc, 100.0, 300.0)
      .count() == want)
    ScalarIndex.compactBtree(spark, loc)
    assert(ScalarIndex.searchBtreeRange(spark, loc, 100.0, 300.0)
      .count() == want)
  }

  test("zorder over file:// — build, box search, append, delete, compact, " +
      "vacuum, rebuild") {
    import graft.ops.ZorderIndex
    val evSource = s"file://$sfDir/events.parquet"
    val events = spark.read.parquet(evSource)
    val loc = schemed("z")
    assert(ZorderIndex.ensureZorder(events, "event_id", "value", "user_id",
      loc, evSource))
    val want = events.filter(col("value").between(100.0, 300.0) &&
      col("user_id").between(3, 7)).count()
    assert(want > 0)
    def got() = ZorderIndex.searchBox(spark, loc, 100.0, 300.0, 3.0, 7.0)
      .count()
    assert(got() == want)
    ZorderIndex.deleteIds(events.filter(col("event_id") % 9 === 1),
      "event_id", loc)
    val wantDel = events.filter(col("value").between(100.0, 300.0) &&
      col("user_id").between(3, 7) && col("event_id") % 9 =!= 1).count()
    assert(got() == wantDel)
    ZorderIndex.compactZorder(spark, loc)
    assert(got() == wantDel)
    // vacuum + the manifest-driven rebuild ride the abstraction too
    assert(AnnIndex.vacuumIndex(loc).isEmpty)
    AnnIndex.rebuildFromSource(spark, loc)
    assert(got() == want, "rebuild restores the full-corpus view")
  }

  test("inverted over file:// — build, bm25, phrase, delete, compact") {
    val loc = schemed("fts")
    assert(TextIndex.ensureInverted(docs, "doc_id", "text", loc, docSource))
    val hits = TextIndex.searchBm25(spark, loc, Seq("fast", "query"))
    // materialize BEFORE the compaction swap: a lazy plan captured its
    // file listing at read time and cannot re-execute over swapped dirs
    val nHits = hits.count()
    assert(nHits > 0)
    val victim = hits.select(col("doc_id")).limit(1)
    TextIndex.deleteDocs(victim, "doc_id", loc)
    assert(TextIndex.hasTombstones(loc))
    assert(TextIndex.searchBm25(spark, loc, Seq("fast", "query"))
      .count() == nHits - 1)
    TextIndex.compactInverted(spark, loc)
    assert(!TextIndex.hasTombstones(loc))
    assert(TextIndex.searchBm25(spark, loc, Seq("fast", "query"))
      .count() == nHits - 1)
  }

  test("ngram over file:// — build, contains search, delete, compact") {
    val loc = schemed("ng")
    assert(NgramIndex.ensureNgram(docs, "doc_id", "text", loc, docSource))
    val want = docs
      .filter(lower(trim(col("text"))).contains("fast")).count()
    assert(want > 0)
    assert(NgramIndex.searchContains(spark, loc, docs, "doc_id", "text",
      "fast").count() == want)
    val victim = docs.filter(lower(trim(col("text"))).contains("fast"))
      .select(col("doc_id")).limit(1)
    NgramIndex.deleteDocs(victim, "doc_id", loc)
    NgramIndex.compactNgram(spark, loc)
    assert(NgramIndex.searchContains(spark, loc, docs, "doc_id", "text",
      "fast").count() == want - 1)
  }

  test("ivf over file:// — build, search, append, tombstone, compact") {
    val embSource = s"file://$sfDir/embeddings.parquet"
    val emb = spark.read.parquet(embSource)
    val centroids = emb.limit(4)
      .select((col("vec_id") % 4).cast("int").as("cid"),
        col("embedding").as("cvec"))
    val loc = schemed("ivf")
    assert(AnnIndex.ensureIvf(emb, "vec_id", "embedding",
      centroids, "cid", "cvec", loc, embSource))
    assert(!AnnIndex.ensureIvf(emb, "vec_id", "embedding",
      centroids, "cid", "cvec", loc, embSource))
    val queries = emb.limit(3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val top = AnnIndex.searchIvf(spark, loc, queries, "qid", "qvec", k = 5)
    assert(top.count() == 15)
    val victim = top.filter(col("rank") === 1)
      .select(col("vec_id")).limit(1)
    AnnIndex.deleteIds(victim, "vec_id", loc)
    assert(AnnIndex.hasTombstones(loc))
    AnnIndex.compactIvf(spark, loc)
    assert(!AnnIndex.hasTombstones(loc))
    assert(AnnIndex.searchIvf(spark, loc, queries, "qid", "qvec", k = 5)
      .count() == 15)
  }

  test("an in-place source rewrite with IDENTICAL names and sizes flips " +
      "the fingerprint (mtime folded in) — a routed index goes stale, " +
      "never serves the old rows") {
    val root = s"file://${Files.createTempDirectory("graft-hfs").toString}"
    val src = s"$root/src"
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "k")
      .coalesce(1).write.parquet(src)
    val before = AnnIndex.sourceFingerprint(src)
    // same listing, same bytes — only the mtime moves (bumped explicitly
    // so the law does not depend on the FS clock granularity)
    val (fs, p) = IndexFs.resolve(src)
    val dataFile = fs.listStatus(p).filter(_.getPath.getName
      .startsWith("part-")).head.getPath
    fs.setTimes(dataFile, fs.getFileStatus(dataFile)
      .getModificationTime + 60000, -1)
    assert(AnnIndex.sourceFingerprint(src) != before,
      "an in-place rewrite (same name, same size) must flip the stamp")
    // and a one-level partition subtree: touching a child DIR's mtime
    // (what a write inside it does) flips the stamp too
    val part = s"$root/partsrc"
    Seq((1L, "a")).toDF("id", "k").write.partitionBy("k").parquet(part)
    val pBefore = AnnIndex.sourceFingerprint(part)
    val (pfs, pp) = IndexFs.resolve(part)
    val childDir = pfs.listStatus(pp).filter(_.isDirectory).head.getPath
    pfs.setTimes(childDir, pfs.getFileStatus(childDir)
      .getModificationTime + 60000, -1)
    assert(AnnIndex.sourceFingerprint(part) != pBefore,
      "direct-child churn in a partition tree must flip the stamp")
  }
}
