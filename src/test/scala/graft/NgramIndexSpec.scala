package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{AnnIndex, NgramIndex}

/** The persisted NGRAM index — [[graft.ops.NgramIndex]]. Pins (1) the
  * two-phase contains search ≡ a full-corpus contains scan, including a
  * needle that crosses token boundaries and one inside a word (neither is
  * servable by the tokenized inverted index), (2) the residual phase
  * removes gram-level false positives, (3) the postings read is
  * bucket-pruned, (4) short needles are refused, (5) the shared
  * append/delete/compaction lifecycle laws. */
class NgramIndexSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val source = s"$sfDir/documents.parquet"

  private def tmpLoc(name: String): String =
    s"${Files.createTempDirectory("graft-ngramspec").toString}/$name"

  private def scanWant(base: org.apache.spark.sql.DataFrame, needle: String) =
    base.filter(lower(trim(col("text"))).contains(needle))
      .select(col("doc_id")).orderBy(col("doc_id")).collect()

  private def idxGot(loc: String, needle: String,
      base: org.apache.spark.sql.DataFrame = docs) =
    NgramIndex.searchContains(spark, loc, base, "doc_id", "text", needle)
      .orderBy(col("doc_id")).collect()

  test("contains search ≡ a full-corpus contains scan — cross-token and " +
      "intra-word needles") {
    val loc = tmpLoc("ng")
    assert(NgramIndex.ensureNgram(docs, "doc_id", "text", loc, source),
      "first ensure must build")
    // "fast sort" crosses a token boundary; "usto" sits inside "customer"
    for (needle <- Seq("fast sort", "usto", "spark")) {
      val want = scanWant(docs, needle)
      assert(want.nonEmpty, s"fixture needle '$needle' matches nothing")
      assert(idxGot(loc, needle).toSeq == want.toSeq,
        s"needle '$needle' diverged from the scan")
    }
  }

  test("the residual phase removes gram-level false positives: all grams " +
      "present, needle absent → no rows") {
    import spark.implicits._
    val synth = Seq((1L, "zabcz zbcdz zcdez")).toDF("doc_id", "text")
    val loc = tmpLoc("ng-fp")
    NgramIndex.ensureNgram(synth, "doc_id", "text", loc, source,
      fingerprintOverride = Some("synth"))
    // every trigram of "abcde" (abc, bcd, cde) occurs — but never adjacent
    assert(idxGot(loc, "abc", synth).map(_.getLong(0)).toSeq == Seq(1L),
      "sanity: a genuinely present gram must match")
    assert(idxGot(loc, "abcde", synth).isEmpty,
      "gram candidacy alone must not produce a match")
  }

  test("a raw-cased needle normalizes to the index's lowercase convention") {
    val loc = tmpLoc("ng-case")
    NgramIndex.ensureNgram(docs, "doc_id", "text", loc, source)
    val want = scanWant(docs, "fast sort")
    assert(want.nonEmpty)
    assert(idxGot(loc, "FAST Sort").toSeq == want.toSeq,
      "an uppercase needle must match the normalized corpus")
  }

  test("needles shorter than the gram width are refused") {
    val loc = tmpLoc("ng-short")
    NgramIndex.ensureNgram(docs, "doc_id", "text", loc, source)
    val e = intercept[IllegalArgumentException] {
      NgramIndex.searchContains(spark, loc, docs, "doc_id", "text", "ab")
    }
    assert(e.getMessage.contains("gram width"))
  }

  test("the postings read is partition-pruned to the needle's grams' " +
      "buckets") {
    val loc = tmpLoc("ng-prune")
    NgramIndex.ensureNgram(docs, "doc_id", "text", loc, source)
    val df = NgramIndex.searchContains(spark, loc, docs, "doc_id", "text",
      "fast sort")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val pruned = plan.linesIterator
      .filter(_.contains("PartitionFilters"))
      .exists(l => l.contains("bkt") && l.contains(" IN "))
    assert(pruned, s"expected a static bkt IN (...) partition filter:\n$plan")
  }

  test("build-half + append-half ≡ one-shot; fingerprint re-stamped") {
    val loc = tmpLoc("ng-append")
    val fp = AnnIndex.sourceFingerprint(source)
    NgramIndex.ensureNgram(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", loc, source,
      fingerprintOverride = Some(s"partial:$fp"))
    NgramIndex.appendNgram(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", loc, newFingerprint = fp)
    assert(AnnIndex.readManifest(loc).exists(_.fingerprint == fp))
    val got = idxGot(loc, "fast sort")
    assert(got.nonEmpty)
    assert(got.toSeq == scanWant(docs, "fast sort").toSeq)
  }

  test("delete ≡ filter; compaction folds tombstones physically and " +
      "preserves results") {
    val loc = tmpLoc("ng-del")
    NgramIndex.ensureNgram(docs, "doc_id", "text", loc, source)
    NgramIndex.deleteDocs(docs.filter(col("doc_id") % 7 === 2),
      "doc_id", loc)
    val want = scanWant(docs.filter(col("doc_id") % 7 =!= 2), "fast sort")
    val got = idxGot(loc, "fast sort")
    assert(got.nonEmpty)
    assert(got.toSeq == want.toSeq)
    assert(!got.exists(_.getLong(0) % 7 == 2), "a deleted doc matched")
    NgramIndex.compactNgram(spark, loc)
    assert(!NgramIndex.hasTombstones(loc))
    assert(spark.read.parquet(s"$loc/postings")
      .filter(col("doc_id") % 7 === 2).count() == 0,
      "deleted docs must be physically gone after compaction")
    assert(idxGot(loc, "fast sort").toSeq == want.toSeq)
  }

  test("unchanged fingerprint skips the build; stale rebuilds") {
    val loc = tmpLoc("ng-fresh")
    assert(NgramIndex.ensureNgram(docs, "doc_id", "text", loc, source))
    assert(!NgramIndex.ensureNgram(docs, "doc_id", "text", loc, source))
    assert(NgramIndex.ensureNgram(docs, "doc_id", "text", loc, source,
      fingerprintOverride = Some("other")))
  }
}
