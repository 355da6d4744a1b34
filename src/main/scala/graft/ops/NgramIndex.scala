package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted NGRAM index — the substring/LIKE accelerator of the
  * index-type family, completing it next to the btree/bitmap scalars
  * ([[ScalarIndex]]), the inverted full-text index ([[TextIndex]]), and
  * the vector tiers ([[AnnIndex]]). The reference's format offers an
  * ngram index for exactly this: `contains()`-shaped predicates that the
  * tokenized inverted index cannot serve (a substring crosses token
  * boundaries and matches inside words).
  *
  * On-disk layout under `location`:
  * {{{
  *   postings/bkt=<n>/...  (gram, doc_id) DISTINCT pairs PARTITIONED BY a
  *                         gram-hash bucket — the needle's grams name
  *                         their buckets BEFORE the scan (static
  *                         `bkt IN (...)` pruning, the same device as the
  *                         inverted index)
  *   tombstones/           (id) — deletes since compaction
  *   _MANIFEST.properties  type=ngram/metric=contains/nlist=nBuckets/
  *                         m=n (the gram width)
  * }}}
  *
  * A `contains(needle)` search is a two-phase plan:
  *  1. CANDIDATES from the index alone: docs carrying EVERY distinct
  *     n-gram of the needle — a bucket-pruned postings read + one count
  *     aggregate (pairs are distinct, so carrying all k grams ⇔ matching
  *     k rows). Gram containment is necessary but not sufficient: the
  *     grams may sit apart in the doc.
  *  2. RESIDUAL verification on the BASE table: the candidate set
  *     broadcast-semi-joins the corpus and the exact `contains` predicate
  *     re-applies on the fetched rows only. At 100 TB the index turns a
  *     full-corpus LIKE scan into a postings intersection plus a
  *     candidate-sized fetch (with an id-clustered base layout the
  *     semi-join prunes to the candidates' files).
  *
  * Texts shorter than the gram width contribute no grams and can never
  * be CANDIDATES for any needle ≥ n — consistent, because a needle ≥ n
  * cannot occur in a shorter text. Needles shorter than n cannot name a
  * gram and are refused (the caller's fallback is the corpus scan the
  * index exists to avoid).
  *
  * Shared lifecycle discipline: [[AnnIndex]]'s manifest codec,
  * fingerprint staleness, atomic staging publish, `partial:` crash-safe
  * appends, tombstone DELETEs, atomic compaction swaps.
  */
object NgramIndex {

  private def tombstoneDir(location: String): String =
    s"$location/tombstones"

  def hasTombstones(location: String): Boolean =
    IndexFs.exists(tombstoneDir(location))

  private def bucketCol(gram: org.apache.spark.sql.Column, nBuckets: Int) =
    (conv(substring(md5(gram), 1, 8), 16, 10).cast("long") % nBuckets)
      .cast("int")

  /** The distinct (doc_id, gram) pairs of a corpus slice — grams over
    * `lower(trim(text))`, the normalization the residual predicate and
    * the oracle share. One corpus scan, shuffle only for the distinct. */
  private def gramRows(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    TextFunctions.widen(docs)
      .select(col(idCol).cast("long").as("doc_id"),
        lower(trim(col(textCol))).as("__t"))
      .select(col("doc_id"),
        explode(array_distinct(transform(
          when(length(col("__t")) >= n,
            sequence(lit(0), length(col("__t")) - n))
            .otherwise(array().cast("array<int>")),
          i => col("__t").substr(i + 1, lit(n))))).as("gram"))

  /** The needle's distinct grams — driver-side, so the search can name
    * its buckets before any scan. */
  def gramsOf(needle: String, n: Int): Seq[String] = {
    require(needle.length >= n,
      s"needle '$needle' is shorter than the gram width $n — " +
        "an ngram index cannot serve it; scan the corpus")
    (0 to needle.length - n).map(i => needle.substring(i, i + n)).distinct
  }

  /** Build (or reuse, if the source fingerprint is unchanged) an ngram
    * index. Same contract as the sibling ensure* calls. */
  def ensureNgram(docs: DataFrame, idCol: String, textCol: String,
      location: String, sourcePath: String, n: Int = 3, nBuckets: Int = 64,
      fingerprintOverride: Option[String] = None): Boolean = {
    require(n >= 2, s"ensureNgram: gram width >= 2, got $n")
    val fp = fingerprintOverride.getOrElse(
      AnnIndex.sourceFingerprint(sourcePath))
    AnnIndex.readManifest(location) match {
      // the gramstats probe is a LAYOUT-GENERATION gate (the bm25pos
      // device): pre-stop-gram-stats indexes rebuild once
      case Some(m) if m.fingerprint == fp && m.indexType == "ngram" &&
          m.nlist == nBuckets && m.m == n && m.sourcePath.nonEmpty &&
          IndexFs.exists(s"$location/gramstats") => false
      case _ =>
        AnnIndex.deleteRecursively(location)
        AnnIndex.buildAndPublish(location,
          AnnIndex.Manifest("ngram", "contains", nBuckets, n, fp,
            sourcePath = sourcePath, sourceIdCol = idCol,
            sourceKeyCol = textCol)) {
          staging =>
            gramRows(docs, idCol, textCol, n).distinct()
              .withColumn("bkt", bucketCol(col("gram"), nBuckets))
              .repartition(col("bkt"))
              .write.mode("overwrite").partitionBy("bkt")
              .parquet(s"$staging/postings")
            // STOP-GRAM stats for the optimizer's cost guard: the top
            // MaxStatGrams grams by document frequency, read back from
            // the written postings (pairs are distinct per doc, so
            // count = df), plus the corpus doc count as the denominator.
            // One small file; a gram ABSENT from it is rarer than the
            // recorded floor, so lookups stay sound under the cap.
            val totalDocs = docs.count()
            docs.sparkSession.read.parquet(s"$staging/postings")
              .groupBy(col("gram")).agg(count(lit(1)).as("df"))
              .orderBy(col("df").desc, col("gram")).limit(MaxStatGrams)
              .withColumn("total", lit(totalDocs))
              .coalesce(1).write.mode("overwrite")
              .parquet(s"$staging/gramstats")
        }
    }
  }

  /** Size cap of the persisted stop-gram table — metadata-sized by
    * construction, like the btree zonemap. */
  val MaxStatGrams = 1024

  /** COST estimate for the optimizer's contains route
    * ([[graft.plans.IndexedScanRewrite]]): true when the needle is worth
    * serving from the index. The candidate set of a needle is bounded by
    * its RAREST gram's document frequency, so a needle whose EVERY gram
    * is a recorded stop-gram (df/total > `maxDocFraction`) re-derives
    * ~the corpus as candidates and the residual fetch loses to the plain
    * scan — decline. A gram absent from the capped stats table is rarer
    * than the table's floor → selective. Stats are written at build and
    * not refreshed by appends/deletes (drift is conservative and
    * cost-only; results are exact either way). Missing stats (an index
    * built before this layout) stay permissive. Driver-side: one
    * existence probe + one ≤[[MaxStatGrams]]-row file filtered to the
    * needle's grams. */
  def needleSelective(spark: SparkSession, location: String,
      needle: String, maxDocFraction: Double): Boolean =
    scala.util.Try {
      val man = AnnIndex.readManifest(location).get
      val statsPath = s"$location/gramstats"
      if (!IndexFs.exists(statsPath)) true
      else {
        val gset = gramsOf(needle.toLowerCase, man.m)
        val rec = spark.read.parquet(statsPath)
          .filter(col("gram").isInCollection(gset))
          .collect()
          .map(r => r.getAs[String]("gram") ->
            ((r.getAs[Long]("df"), r.getAs[Long]("total"))))
          .toMap
        gset.exists(g => !rec.contains(g)) ||
          rec.values.exists { case (df, total) =>
            total <= 0L || df.toDouble / total <= maxDocFraction
          }
      }
    }.getOrElse(true)

  /** Incrementally ADD documents: gram ONLY the delta and append into the
    * bucketed layout. Pairs stay distinct per build/append slice (a doc
    * arrives once), so the candidate count law is preserved. Crash
    * discipline: `partial:` at build, re-stamp here after the commit. */
  def appendNgram(delta: DataFrame, idCol: String, textCol: String,
      location: String, newFingerprint: String): Unit = {
    val man = AnnIndex.readManifest(location).getOrElse(
      throw new IllegalStateException(s"no index at $location"))
    require(man.indexType == "ngram", s"not an ngram index: $location")
    gramRows(delta, idCol, textCol, man.m).distinct()
      .withColumn("bkt", bucketCol(col("gram"), man.nlist))
      .repartition(col("bkt"))
      .write.mode("append").partitionBy("bkt").parquet(s"$location/postings")
    AnnIndex.writeManifest(location,
      man.copy(fingerprint = newFingerprint))
  }

  /** DELETE documents — tombstones, never a postings rewrite; searches
    * anti-join the candidate set. Set semantics as everywhere. */
  def deleteDocs(ids: DataFrame, idCol: String, location: String): Unit = {
    val man = AnnIndex.readManifest(location).getOrElse(
      throw new IllegalStateException(s"no index at $location"))
    ids.select(col(idCol).cast("long").as("doc_id")).distinct()
      .coalesce(1)
      .write.mode("append").parquet(tombstoneDir(location))
    // index-only deletes diverge the live view from the source
    if (!man.divergent)
      AnnIndex.writeManifest(location, man.copy(divergent = true))
  }

  /** Substring search: documents whose `textCol` contains `needle`
    * (after the index's lower+trim normalization). Phase 1 intersects
    * the needle's grams' postings (bucket-pruned read, one count
    * aggregate); phase 2 re-applies the exact `contains` on the
    * candidates' base rows — gram containment admits false positives
    * (grams present but apart), never false negatives. Returns (doc_id).
    */
  def searchContains(spark: SparkSession, location: String,
      docs: DataFrame, idCol: String, textCol: String, needle: String)
      : DataFrame = {
    // the grams were taken over lower(trim(text)) — normalize the needle
    // so "Fast Sort" finds what a contains scan of the normalized text
    // would (a raw-cased needle would silently match nothing)
    val needleNorm = needle.toLowerCase
    docs.select(col(idCol).cast("long").as("doc_id"),
        lower(trim(col(textCol))).as("__t"))
      .join(broadcast(candidateIds(spark, location, needleNorm)),
        Seq("doc_id"), "left_semi")
      .filter(col("__t").contains(needleNorm))
      .select(col("doc_id"))
  }

  /** Phase 1 alone: the doc ids carrying EVERY distinct n-gram of the
    * (caller-normalized) needle — a bucket-pruned postings read + one
    * count aggregate, tombstone-cleaned. Gram containment admits false
    * positives, never false negatives, so the result is a SUPERSET of
    * the true contains matches and a caller (the optimizer's LIKE route,
    * [[graft.plans.IndexedScanRewrite]]) must re-apply its exact
    * predicate on the candidates' base rows. */
  def candidateIds(spark: SparkSession, location: String, needle: String)
      : DataFrame = {
    val man = AnnIndex.readManifest(location).getOrElse(
      throw new IllegalStateException(s"no index at $location"))
    require(man.indexType == "ngram", s"not an ngram index: $location")
    val gset = gramsOf(needle, man.m)
    // the same md5 arithmetic driver-side (TextIndex.bucketOf) and
    // executor-side (bucketCol) — the pruning literals need no Spark job
    val bktIds = gset.map(TextIndex.bucketOf(_, man.nlist)).distinct.sorted
    val raw = spark.read.parquet(s"$location/postings")
      .filter(col("bkt").isin(bktIds.map(Int.box): _*))
      .filter(col("gram").isInCollection(gset))
    val live =
      if (!hasTombstones(location)) raw
      else raw.join(
        broadcast(spark.read.parquet(tombstoneDir(location))
          .select(col("doc_id")).distinct()),
        Seq("doc_id"), "left_anti")
    live.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__k"))
      .filter(col("__k") === gset.size)
      .select(col("doc_id"))
  }

  /** Fold tombstones into the layout — postings minus deleted docs,
    * rewritten one file per bucket, tombstones cleared. Atomic swap via
    * the shared discipline; results unchanged. */
  def compactNgram(spark: SparkSession, location: String): Unit = {
    val man = AnnIndex.readManifest(location).getOrElse(
      throw new IllegalStateException(s"no index at $location"))
    require(man.indexType == "ngram", s"not an ngram index: $location")
    val tombIds =
      if (!hasTombstones(location)) return
      else spark.read.parquet(tombstoneDir(location))
        .select(col("doc_id")).distinct()
    val pid = AnnIndex.uniqueSuffix()
    val staging = s"$location/postings.compact.$pid"
    spark.read.parquet(s"$location/postings")
      .join(broadcast(tombIds), Seq("doc_id"), "left_anti")
      .repartition(col("bkt"))
      .write.mode("overwrite").partitionBy("bkt").parquet(staging)
    val live = s"$location/postings"
    val retired = s"$location/postings.retired.$pid"
    IndexFs.renameIntoOrThrow(live, retired)
    try IndexFs.renameIntoOrThrow(staging, live)
    catch {
      case e: Throwable =>
        IndexFs.renameIntoOrThrow(retired, live)
        throw e
    }
    AnnIndex.deleteRecursively(retired)
    AnnIndex.deleteRecursively(tombstoneDir(location))
  }
}
