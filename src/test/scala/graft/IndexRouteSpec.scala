package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.ScalarIndex
import graft.plans.{IndexRoute, IndexedScanRewrite}

/** Optimizer-integrated index access — [[graft.plans.IndexedScanRewrite]].
  * Pins (1) a covering equality/IN/range filter over a routed parquet
  * source is rewritten to read the INDEX, not the corpus, with results
  * identical to the un-rewritten plan, (2) exprId rewiring keeps parent
  * operators (aggregates) resolving over the spliced subtree, (3) the
  * rule DECLINES — falling back to the scan, never to wrong rows — for
  * non-covering projections, unrouted columns, and stale indexes. */
class IndexRouteSpec extends SparkSpec {

  private lazy val docSource = s"$sfDir/documents.parquet"
  private lazy val evSource = s"$sfDir/events.parquet"
  private lazy val docs = spark.read.parquet(docSource)
  private lazy val events = spark.read.parquet(evSource)

  private def tmpLoc(name: String): String =
    s"${Files.createTempDirectory("graft-routespec").toString}/$name"

  private def withRule[A](body: => A): A = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ IndexedScanRewrite(spark)
    try body
    finally {
      spark.experimental.extraOptimizations = before
      IndexRoute.clear()
    }
  }

  private def scansIndex(df: org.apache.spark.sql.DataFrame,
      location: String): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    plan.contains(new java.io.File(location).getName) &&
      !plan.contains("documents.parquet") && !plan.contains("events.parquet") &&
      !plan.contains("part.parquet")
  }

  test("covering equality filter rewrites to the bitmap index; results " +
      "are identical to the scan plan") {
    val loc = tmpLoc("route-bm")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource)
    val want = docs.filter(col("lang") === "en")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id")).collect()
    withRule {
      IndexRoute.register(docSource, "lang", "doc_id", loc)
      val df = docs.filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"))
      assert(scansIndex(df, loc),
        s"expected the index scan:\n${df.queryExecution.executedPlan}")
      assert(df.orderBy(col("doc_id")).collect().toSeq == want.toSeq)
    }
    // routes cleared → the same query scans the corpus again
    val after = docs.filter(col("lang") === "en")
      .select(col("doc_id"), col("lang"))
    assert(!scansIndex(after, loc))
  }

  test("IN filters rewrite too, and parents (an aggregate) resolve over " +
      "the spliced subtree") {
    val loc = tmpLoc("route-bm-in")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource)
    val want = docs.filter(col("lang").isin("en", "de"))
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .orderBy(col("lang")).collect()
    withRule {
      IndexRoute.register(docSource, "lang", "doc_id", loc)
      val df = docs.filter(col("lang").isin("en", "de"))
        .select(col("doc_id"), col("lang"))
        .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      assert(scansIndex(df, loc))
      assert(df.orderBy(col("lang")).collect().toSeq == want.toSeq)
    }
  }

  test("a LOW-SELECTIVITY IN declines (cost guard): asking for most of " +
      "the bitmap's value directories leaves nothing to prune, so the " +
      "column-pruned corpus scan stands") {
    val loc = tmpLoc("route-bm-broad")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource)
    val nLangs = docs.select(col("lang")).distinct().count()
    assert(nLangs == 5, "the guard thresholds below assume 5 langs")
    withRule {
      IndexRoute.register(docSource, "lang", "doc_id", loc)
      // 4 of 5 directories (80% > the default 50% threshold) → decline
      val broad = docs.filter(col("lang").isin("en", "de", "fr", "es"))
        .select(col("doc_id"), col("lang"))
      assert(!scansIndex(broad, loc),
        "an IN covering 4/5 of the directories must not be routed")
      // results are unaffected either way — the guard is cost-only
      val want = docs.filter(col("lang").isin("en", "de", "fr", "es"))
        .count()
      assert(broad.count() == want)
      // 2 of 5 (40%) stays routed
      val narrow = docs.filter(col("lang").isin("en", "de"))
        .select(col("doc_id"), col("lang"))
      assert(scansIndex(narrow, loc))
      // the threshold is session-tunable: raising it re-admits the broad
      // IN (a FRESH plan — queryExecution memoizes per DataFrame)
      spark.conf.set("spark.graft.route.maxInFraction", "0.9")
      try assert(scansIndex(
          docs.filter(col("lang").isin("en", "de", "fr", "es"))
            .select(col("doc_id"), col("lang")), loc),
        "maxInFraction=0.9 must re-admit the 4/5 IN")
      finally spark.conf.unset("spark.graft.route.maxInFraction")
    }
  }

  test("OR-of-equalities rewrites like the IN it is; an empty-string " +
      "literal declines (the bitmap cannot store '')") {
    val loc = tmpLoc("route-bm-or")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource)
    val want = docs.filter(col("lang") === "en" || col("lang") === "de")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id")).collect()
    assert(want.nonEmpty)
    withRule {
      IndexRoute.register(docSource, "lang", "doc_id", loc)
      val df = docs.filter(col("lang") === "en" || col("lang") === "de")
        .select(col("doc_id"), col("lang"))
      assert(scansIndex(df, loc),
        s"expected the OR to route like an IN:\n${df.queryExecution.executedPlan}")
      assert(df.orderBy(col("doc_id")).collect().toSeq == want.toSeq)
      // ORs across DIFFERENT attributes decline (no single index serves)
      val cross = docs.filter(col("lang") === "en" || col("source") === "src1")
        .select(col("doc_id"), col("lang"))
      assert(!cross.queryExecution.executedPlan.toString
        .contains(new java.io.File(loc).getName))
      // empty-string equality declines — builds drop '' keys, so only
      // the scan can answer it
      val empty = docs.filter(col("lang") === "")
        .select(col("doc_id"), col("lang"))
      assert(!scansIndex(empty, loc))
    }
  }

  test("covering range filter rewrites to the btree index") {
    val loc = tmpLoc("route-bt")
    ScalarIndex.ensureBtree(events, "event_id", "value", loc, evSource)
    val want = events
      .filter(col("value") >= 100.0 && col("value") <= 250.0)
      .select(col("event_id"), col("value"))
      .orderBy(col("event_id")).collect()
    withRule {
      IndexRoute.register(evSource, "value", "event_id", loc)
      val df = events
        .filter(col("value") >= 100.0 && col("value") <= 250.0)
        .select(col("event_id"), col("value"))
      assert(scansIndex(df, loc),
        s"expected the index scan:\n${df.queryExecution.executedPlan}")
      assert(df.orderBy(col("event_id")).collect().toSeq == want.toSeq)
    }
  }

  test("open and strict range shapes rewrite too: one-sided bounds, " +
      "strict comparisons, and reversed conjunct order") {
    val loc = tmpLoc("route-bt-open")
    ScalarIndex.ensureBtree(events, "event_id", "value", loc, evSource)
    withRule {
      IndexRoute.register(evSource, "value", "event_id", loc)
      def check(build: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
        val want = build(events).select(col("event_id"), col("value"))
          .orderBy(col("event_id")).collect()
        assert(want.nonEmpty)
        val df = build(events).select(col("event_id"), col("value"))
        assert(scansIndex(df, loc),
          s"expected the index scan:\n${df.queryExecution.executedPlan}")
        assert(df.orderBy(col("event_id")).collect().toSeq == want.toSeq)
      }
      // one-sided: >= / < alone
      check(_.filter(col("value") >= 300.0))
      check(_.filter(col("value") < 20.0))
      // strict two-sided
      check(_.filter(col("value") > 250.0 && col("value") < 300.0))
      // reversed conjunct order (upper bound written first)
      check(_.filter(col("value") <= 300.0 && col("value") >= 250.0))
      // mixed strictness
      check(_.filter(col("value") > 250.0 && col("value") <= 300.0))
      // boundary exactness: a strict bound must exclude the exact key a
      // non-strict one includes
      val v = events.select(col("value")).limit(1).collect().head.getDouble(0)
      val incl = events.filter(col("value") >= v && col("value") <= v)
        .select(col("event_id"), col("value"))
      val strict = events.filter(col("value") > v && col("value") < v)
        .select(col("event_id"), col("value"))
      assert(scansIndex(incl, loc) && scansIndex(strict, loc))
      assert(incl.count() > 0 && strict.count() == 0)
    }
  }

  test("LIKE 'p%' rewrites to the string btree's prefix scan; a suffix " +
      "LIKE declines") {
    val partSource = s"$sfDir/part.parquet"
    val parts = spark.read.parquet(partSource)
    val loc = tmpLoc("route-prefix")
    ScalarIndex.ensureBtree(parts, "p_partkey", "p_name", loc, partSource)
    val want = parts.filter(col("p_name").like("sm%"))
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey")).collect()
    assert(want.nonEmpty)
    withRule {
      IndexRoute.register(partSource, "p_name", "p_partkey", loc)
      val df = parts.filter(col("p_name").like("sm%"))
        .select(col("p_partkey"), col("p_name"))
      assert(scansIndex(df, loc),
        s"expected the prefix scan:\n${df.queryExecution.executedPlan}")
      assert(df.orderBy(col("p_partkey")).collect().toSeq == want.toSeq)
      // '%sm' has no prefix to serve — the scan stands
      val suffix = parts.filter(col("p_name").like("%sm"))
        .select(col("p_partkey"), col("p_name"))
      assert(!scansIndex(suffix, loc))
    }
  }

  test("a timestamp range rewrites through the NATIVE-keyed btree route") {
    val loc = tmpLoc("route-ts")
    // key the index on the raw ts column the route will see in the scan
    // (Spark 4 reads un-annotated parquet timestamps as TIMESTAMP_NTZ,
    // so the bounds carry the matching external LocalDateTime flavor)
    ScalarIndex.ensureBtree(events, "event_id", "ts", loc, evSource)
    val tLo = java.time.LocalDateTime.of(2024, 1, 8, 0, 0, 0)
    val tHi = java.time.LocalDateTime.of(2024, 1, 17, 0, 0, 0)
    val want = events.filter(col("ts") >= lit(tLo) && col("ts") <= lit(tHi))
      .select(col("event_id"), col("ts"))
      .orderBy(col("event_id")).collect()
    assert(want.nonEmpty)
    withRule {
      IndexRoute.register(evSource, "ts", "event_id", loc)
      val df = events.filter(col("ts") >= lit(tLo) && col("ts") <= lit(tHi))
        .select(col("event_id"), col("ts"))
      assert(scansIndex(df, loc),
        s"expected the native ts scan:\n${df.queryExecution.executedPlan}")
      assert(df.orderBy(col("event_id")).collect().toSeq == want.toSeq)
      // STRICT operators and REVERSED conjunct order route too (ADVICE
      // r14: the typed families only matched inclusive + one order)
      val wantStrict = events
        .filter(col("ts") > lit(tLo) && col("ts") < lit(tHi))
        .select(col("event_id"), col("ts"))
        .orderBy(col("event_id")).collect()
      val strictRev = events
        .filter(col("ts") < lit(tHi) && col("ts") > lit(tLo))
        .select(col("event_id"), col("ts"))
      assert(scansIndex(strictRev, loc),
        s"expected the strict reversed-order ts range to route:\n" +
          s"${strictRev.queryExecution.executedPlan}")
      assert(strictRev.orderBy(col("event_id")).collect().toSeq ==
        wantStrict.toSeq)
    }
  }

  test("a BIGINT literal whose double conversion is inexact declines the " +
      "zorder box route — the double-shadow residual would admit a row " +
      "the original predicate excludes") {
    import spark.implicits._
    val src = s"${Files.createTempDirectory("graft-routespec")}/bigxy"
    // x = 2^53 sits exactly at the boundary the ±2^53 build contract
    // admits; the literal 2^53+1 rounds DOWN to 2^53 in a double
    val twoP53 = 9007199254740992L
    (Seq((1L, twoP53, 5L), (2L, 100L, 5L), (3L, 200L, 6L)))
      .toDF("id", "x", "y").write.parquet(src)
    val base = spark.read.parquet(src)
    val loc = tmpLoc("route-z-bigint")
    graft.ops.ZorderIndex.ensureZorder(base, "id", "x", "y", loc, src)
    withRule {
      IndexRoute.register(src, "x", "id", loc)
      IndexRoute.register(src, "y", "id", loc)
      // sanity: an exact-literal box routes
      val exact = base.filter(col("x") >= 50L && col("x") <= twoP53 &&
          col("y") >= 5L && col("y") <= 6L)
        .select(col("id"), col("x"), col("y"))
      assert(exact.queryExecution.executedPlan.toString
        .contains(new java.io.File(loc).getName))
      assert(exact.count() == 3)
      // the INEXACT lower bound 2^53+1 must decline: its double shadow
      // (2^53) would admit id=1, which the original predicate excludes
      val inexact = base.filter(col("x") >= (twoP53 + 1) &&
          col("x") <= (twoP53 + 10) && col("y") >= 5L && col("y") <= 6L)
        .select(col("id"), col("x"), col("y"))
      assert(!inexact.queryExecution.executedPlan.toString
        .contains(new java.io.File(loc).getName),
        "an inexact bigint literal must fall back to the scan")
      assert(inexact.count() == 0,
        "no row satisfies x >= 2^53+1 — a routed shadow would have " +
          "wrongly returned x = 2^53")
    }
  }

  test("array_contains conjunctions rewrite to the label-list index when " +
      "only the id survives; projecting the array or an empty label " +
      "declines") {
    val tags = docs.select(col("doc_id"),
      array_distinct(split(lower(trim(col("text"))), "\\s+")).as("tags"))
    val tagSource =
      s"${Files.createTempDirectory("graft-routespec").toString}/tags.parquet"
    tags.write.mode("overwrite").parquet(tagSource)
    val tagged = spark.read.parquet(tagSource)
    val loc = tmpLoc("route-labels")
    ScalarIndex.ensureLabelList(tagged, "doc_id", "tags", loc, tagSource)
    val want = tagged.filter(array_contains(col("tags"), "vector") &&
        array_contains(col("tags"), "query"))
      .select(col("doc_id")).orderBy(col("doc_id")).collect()
    assert(want.nonEmpty)
    def noCorpus(df: org.apache.spark.sql.DataFrame): Boolean = {
      val plan = df.queryExecution.executedPlan.toString
      plan.contains(new java.io.File(loc).getName) &&
        !plan.contains("tags.parquet")
    }
    withRule {
      IndexRoute.register(tagSource, "tags", "doc_id", loc)
      val df = tagged.filter(array_contains(col("tags"), "vector") &&
          array_contains(col("tags"), "query"))
        .select(col("doc_id"))
      assert(noCorpus(df),
        s"expected the label-list scan:\n${df.queryExecution.executedPlan}")
      assert(df.orderBy(col("doc_id")).collect().toSeq == want.toSeq)
      // a single conjunct is the degenerate one-label has_all
      val one = tagged.filter(array_contains(col("tags"), "vector"))
        .select(col("doc_id"))
      assert(noCorpus(one))
      assert(one.count() ==
        tagged.filter(array_contains(col("tags"), "vector")).count())
      // projecting the array declines (the index cannot rebuild arrays)
      val proj = tagged.filter(array_contains(col("tags"), "vector"))
        .select(col("doc_id"), col("tags"))
      assert(!noCorpus(proj))
      // an empty label declines — the index does not store ''
      val empty = tagged.filter(array_contains(col("tags"), ""))
        .select(col("doc_id"))
      assert(!noCorpus(empty))
    }
  }

  test("a conjunctive 2-D numeric box rewrites to the zorder index; a " +
      "residual conjunct or one-dimension-only ask declines") {
    val loc = tmpLoc("route-z")
    graft.ops.ZorderIndex.ensureZorder(events, "event_id", "value",
      "user_id", loc, evSource)
    val box = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("value") >= 100.0 && col("value") <= 250.0 &&
        col("user_id") >= 3 && col("user_id") <= 7)
    val want = box(events)
      .select(col("event_id"), col("value"), col("user_id"))
      .orderBy(col("event_id")).collect()
    assert(want.nonEmpty)
    withRule {
      IndexRoute.register(evSource, "value", "event_id", loc)
      IndexRoute.register(evSource, "user_id", "event_id", loc)
      val df = box(events)
        .select(col("event_id"), col("value"), col("user_id"))
      assert(scansIndex(df, loc),
        s"expected the zorder scan:\n${df.queryExecution.executedPlan}")
      assert(df.orderBy(col("event_id")).collect().toSeq == want.toSeq)
      // an extra conjunct the box cannot serve declines
      val extra = box(events).filter(col("event_type") === "view")
        .select(col("event_id"), col("value"), col("user_id"))
      assert(!scansIndex(extra, loc))
      // a one-dimension range is the btree's shape, not the box's — with
      // only zorder routes registered it declines to the scan
      val oneDim = events
        .filter(col("value") >= 100.0 && col("value") <= 250.0)
        .select(col("event_id"), col("value"))
      assert(!scansIndex(oneDim, loc))
    }
  }

  test("rebuildFromSource closes the divergence loop: an index-only " +
      "delete declines the route even after compaction, the manifest-" +
      "driven rebuild restores service; derived-column and vector " +
      "indexes refuse") {
    import graft.ops.AnnIndex
    val loc = tmpLoc("route-rebuild")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource)
    withRule {
      IndexRoute.register(docSource, "lang", "doc_id", loc)
      def q = docs.filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"))
      assert(scansIndex(q, loc))
      // index-only delete: divergent — declines, and stays declined
      // through compaction (the tombstones fold away, the divergence
      // does not)
      ScalarIndex.deleteIds(docs.filter(col("doc_id") % 3 === 0),
        "doc_id", loc)
      assert(!scansIndex(q, loc))
      ScalarIndex.compactBitmap(spark, loc)
      assert(!scansIndex(q, loc),
        "a compacted-but-divergent index must stay declined")
      // the documented recovery: rebuild from the manifest's source
      // binding — route serves again, results are the full corpus
      AnnIndex.rebuildFromSource(spark, loc)
      assert(!AnnIndex.readManifest(loc).get.divergent)
      assert(scansIndex(q, loc),
        s"rebuild must restore the route:\n${q.queryExecution.executedPlan}")
      assert(q.count() == docs.filter(col("lang") === "en").count())
    }
    // a DERIVED-column binding refuses: the source has no such column
    val locDerived = tmpLoc("route-rebuild-derived")
    ScalarIndex.ensureBtree(
      events.withColumn("day", to_date(col("ts"))),
      "event_id", "day", locDerived, evSource)
    val e = intercept[IllegalArgumentException](
      AnnIndex.rebuildFromSource(spark, locDerived))
    assert(e.getMessage.contains("DERIVED"))
    // vector tiers refuse: training artifacts live outside the manifest
    val locVec = tmpLoc("route-rebuild-vec")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    import spark.implicits._
    val cells = Seq((0, Seq.fill(8)(0.1f)), (1, Seq.fill(8)(-0.1f)))
      .toDF("cid", "__c")
    AnnIndex.ensureIvf(emb, "vec_id", "embedding", cells, "cid", "__c",
      locVec, s"$sfDir/embeddings.parquet")
    val e2 = intercept[IllegalArgumentException](
      AnnIndex.rebuildFromSource(spark, locVec))
    assert(e2.getMessage.contains("training"))
  }

  test("count(*) over a routed filter is answered from the index: the " +
      "empty projection is trivially covering") {
    val loc = tmpLoc("route-count")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource)
    val want = docs.filter(col("lang") === "en").count()
    withRule {
      IndexRoute.register(docSource, "lang", "doc_id", loc)
      val df = docs.filter(col("lang") === "en").groupBy().count()
      assert(scansIndex(df, loc),
        s"expected the count to read the index:\n${df.queryExecution.executedPlan}")
      assert(df.collect().head.getLong(0) == want)
    }
  }

  test("a numeric point query rewrites through the btree route as the " +
      "degenerate range [v, v]") {
    val loc = tmpLoc("route-bt-eq")
    ScalarIndex.ensureBtree(events, "event_id", "value", loc, evSource)
    val v = events.select(col("value")).limit(1).collect().head.getDouble(0)
    val want = events.filter(col("value") === v)
      .select(col("event_id"), col("value"))
      .orderBy(col("event_id")).collect()
    assert(want.nonEmpty)
    withRule {
      IndexRoute.register(evSource, "value", "event_id", loc)
      val df = events.filter(col("value") === v)
        .select(col("event_id"), col("value"))
      assert(scansIndex(df, loc),
        s"expected the index scan:\n${df.queryExecution.executedPlan}")
      assert(df.orderBy(col("event_id")).collect().toSeq == want.toSeq)
    }
  }

  test("a two-column conjunction over two bitmap routes rewrites to the " +
      "index conjunction when only the id survives — and declines when a " +
      "key column is projected") {
    val locL = tmpLoc("route-and-lang")
    val locS = tmpLoc("route-and-src")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", locL, docSource)
    ScalarIndex.ensureBitmap(docs, "doc_id", "source", locS, docSource)
    val want = docs.filter(col("lang") === "en" && col("source") === "src1")
      .select(col("doc_id")).orderBy(col("doc_id")).collect()
    assert(want.nonEmpty)
    withRule {
      IndexRoute.register(docSource, "lang", "doc_id", locL)
      IndexRoute.register(docSource, "source", "doc_id", locS)
      val df = docs.filter(col("lang") === "en" && col("source") === "src1")
        .select(col("doc_id"))
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("documents.parquet"),
        s"expected the conjunction to read only the indexes:\n$plan")
      assert(df.orderBy(col("doc_id")).collect().toSeq == want.toSeq)
      // count over the conjunction rides the same rewrite
      assert(docs.filter(col("lang") === "en" && col("source") === "src1")
        .count() == want.length)
      // projecting a key column declines (the conjunction has no keys)
      val wide = docs.filter(col("lang") === "en" && col("source") === "src1")
        .select(col("doc_id"), col("lang"))
      assert(wide.queryExecution.executedPlan.toString
        .contains("documents.parquet"))
      assert(wide.count() == want.length)
    }
  }

  test("a NON-covering projection declines: the corpus scan stands and " +
      "results are untouched") {
    val loc = tmpLoc("route-noncover")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource)
    withRule {
      IndexRoute.register(docSource, "lang", "doc_id", loc)
      val df = docs.filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"), col("text"))
      assert(!scansIndex(df, loc), "text is not in the index — no rewrite")
      assert(df.count() ==
        docs.filter(col("lang") === "en").count())
    }
  }

  test("a STALE index declines: fingerprint mismatch falls back to the " +
      "scan, never to stale rows") {
    val loc = tmpLoc("route-stale")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource)
    withRule {
      IndexRoute.register(docSource, "lang", "doc_id", loc)
      // simulate a source data drop AFTER the build: downgrade the stamp
      val mf = java.nio.file.Paths.get(s"$loc/_MANIFEST.properties")
      java.nio.file.Files.writeString(mf,
        java.nio.file.Files.readString(mf)
          .replaceAll("(?m)^graft.index.fingerprint=.*$",
            "graft.index.fingerprint=stale"))
      val df = docs.filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"))
      assert(!scansIndex(df, loc), "a stale index must not serve queries")
      assert(df.count() == docs.filter(col("lang") === "en").count())
    }
  }

  test("a TOMBSTONED index declines: deleteIds shrinks the live view " +
      "without touching the fingerprint, so a routed read would silently " +
      "drop rows the plain filter still returns") {
    val loc = tmpLoc("route-tomb")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource)
    val want = docs.filter(col("lang") === "en").count()
    withRule {
      IndexRoute.register(docSource, "lang", "doc_id", loc)
      // sanity: fresh + tombstone-free serves from the index
      assert(scansIndex(docs.filter(col("lang") === "en")
        .select(col("doc_id"), col("lang")), loc))
      // delete a doc FROM THE INDEX only — the source is untouched
      val victim = docs.filter(col("lang") === "en")
        .select(col("doc_id")).limit(1)
      ScalarIndex.deleteIds(victim, "doc_id", loc)
      val df = docs.filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"))
      assert(!scansIndex(df, loc),
        "an index with uncompacted tombstones must not serve plain filters")
      assert(df.count() == want, "results must equal the un-deleted source")
      // the conjunction path declines on either side's tombstones too
      val locS = tmpLoc("route-tomb-src")
      ScalarIndex.ensureBitmap(docs, "doc_id", "source", locS, docSource)
      IndexRoute.register(docSource, "source", "doc_id", locS)
      val and = docs.filter(col("lang") === "en" && col("source") === "src1")
        .select(col("doc_id"))
      assert(and.queryExecution.executedPlan.toString
        .contains("documents.parquet"),
        "the AND rewrite must decline when one route is tombstoned")
      // compaction folds the tombstones away, but the index CONTENT still
      // diverges from a source that kept the row — the manifest's
      // divergent flag (stamped at deleteIds, cleared only by rebuild)
      // must keep the route declined even with zero tombstones on disk
      ScalarIndex.compactBitmap(spark, loc)
      assert(!ScalarIndex.hasTombstones(loc))
      val after = docs.filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"))
      assert(!scansIndex(after, loc),
        "a compacted-but-diverged index must stay declined until rebuilt")
      assert(after.count() == want)
    }
  }

  test("the config-time extension injection alone serves routed queries " +
      "(no extraOptimizations needed — GraftExtensions injected the rule " +
      "at session build)") {
    val loc = tmpLoc("route-ext")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource)
    try {
      IndexRoute.register(docSource, "lang", "doc_id", loc)
      val df = docs.filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"))
      assert(scansIndex(df, loc),
        s"expected the injected rule to fire:\n${df.queryExecution.executedPlan}")
    } finally IndexRoute.clear()
  }

  test("ORDER BY key LIMIT k over a covering projection rewrites to the " +
      "btree bucket-prefix scan — both directions, results identical") {
    val loc = tmpLoc("route-topk")
    ScalarIndex.ensureBtree(events, "event_id", "value", loc, evSource)
    val wantDesc = events.select(col("event_id"), col("value"))
      .orderBy(col("value").desc, col("event_id")).limit(7).collect()
    val wantAsc = events.select(col("event_id"), col("value"))
      .orderBy(col("value").asc_nulls_last, col("event_id")).limit(7).collect()
    withRule {
      IndexRoute.register(evSource, "value", "event_id", loc)
      val desc = events.select(col("event_id"), col("value"))
        .orderBy(col("value").desc, col("event_id")).limit(7)
      assert(scansIndex(desc, loc),
        s"expected the top-k index scan:\n${desc.queryExecution.executedPlan}")
      assert(desc.collect().toSeq == wantDesc.toSeq)
      val asc = events.select(col("event_id"), col("value"))
        .orderBy(col("value").asc_nulls_last, col("event_id")).limit(7)
      assert(scansIndex(asc, loc))
      assert(asc.collect().toSeq == wantAsc.toSeq)
      // ascending with default NullsFirst DECLINES: null-key rows (which
      // the index does not store) would legitimately lead the full plan
      val nf = events.select(col("event_id"), col("value"))
        .orderBy(col("value").asc, col("event_id")).limit(7)
      assert(!scansIndex(nf, loc),
        "asc_nulls_first must fall back to the corpus scan")
      // k larger than the indexed row count declines too
      val total = events.filter(col("value").isNotNull).count()
      val big = events.select(col("event_id"), col("value"))
        .orderBy(col("value").desc).limit(total.toInt + 10)
      assert(!scansIndex(big, loc))
    }
  }

  test("contains(text, needle) / LIKE '%needle%' rewrites through the " +
      "ngram route: candidates semi-join the base table and the exact " +
      "predicate re-applies — any projection, results identical") {
    val loc = tmpLoc("route-ngram")
    graft.ops.NgramIndex.ensureNgram(docs, "doc_id", "text", loc, docSource)
    val want = docs.filter(col("text").contains("fast"))
      .select(col("doc_id"), col("text"))
      .orderBy(col("doc_id")).collect()
    assert(want.nonEmpty)
    withRule {
      IndexRoute.register(docSource, "text", "doc_id", loc)
      val df = docs.filter(col("text").contains("fast"))
        .select(col("doc_id"), col("text"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(loc).getName),
        s"expected the ngram candidates in the plan:\n$plan")
      assert(plan.contains("LeftSemi"),
        s"expected the candidate semi-join:\n$plan")
      // IDEMPOTENT under the fixed-point optimizer batch: pushdown must
      // not re-expose a matchable Contains and stack candidate joins
      assert("LeftSemi".r.findAllIn(plan).size == 1,
        s"the contains rewrite must fire exactly once:\n$plan")
      assert(df.orderBy(col("doc_id")).collect().toSeq == want.toSeq)
      // a LIKE '%needle%' (parsed to Contains) rides the same route
      val like = docs.filter(col("text").like("%fast%"))
        .select(col("doc_id"))
      assert(like.queryExecution.executedPlan.toString
        .contains(new java.io.File(loc).getName))
      assert(like.count() == want.length)
      // scope guards: shorter than the gram width, or a needle the
      // index's lower(trim()) normalization could miss, decline
      val shortNeedle = docs.filter(col("text").contains("fa"))
        .select(col("doc_id"))
      assert(!shortNeedle.queryExecution.executedPlan.toString
        .contains(new java.io.File(loc).getName))
      val cased = docs.filter(col("text").contains("Fast"))
        .select(col("doc_id"))
      assert(!cased.queryExecution.executedPlan.toString
        .contains(new java.io.File(loc).getName))
      assert(cased.count() ==
        docs.filter(col("text").contains("Fast")).count())
    }
  }

  test("STOP-GRAM cost guard: a needle whose every gram is near-" +
      "universal declines the contains route; a selective needle routes " +
      "— results identical either way") {
    val src =
      s"${Files.createTempDirectory("graft-routespec")}/stopdocs"
    // every doc carries the suffix → its grams have df = 1.0 (> 0.9);
    // the body text keeps ordinary (selective-enough) needles working
    docs.select(col("doc_id"),
        concat(col("text"), lit(" zzqqzzqq")).as("text"))
      .write.parquet(src)
    val base = spark.read.parquet(src)
    val loc = tmpLoc("route-stopgram")
    graft.ops.NgramIndex.ensureNgram(base, "doc_id", "text", loc, src)
    withRule {
      IndexRoute.register(src, "text", "doc_id", loc)
      // all grams of "zzqqzz" sit in 100% of docs → decline to the scan
      val stop = base.filter(col("text").contains("zzqqzz"))
        .select(col("doc_id"))
      assert(!stop.queryExecution.executedPlan.toString
        .contains(new java.io.File(loc).getName),
        "an all-stop-gram needle must not be routed")
      assert(stop.count() == base.count(),
        "the declined plan still answers exactly (every doc matches)")
      // a selective needle routes as before
      val sel = base.filter(col("text").contains("fast"))
        .select(col("doc_id"))
      assert(sel.queryExecution.executedPlan.toString
        .contains(new java.io.File(loc).getName),
        s"a selective needle must route:\n" +
          s"${sel.queryExecution.executedPlan}")
      assert(sel.count() ==
        base.filter(col("text").contains("fast")).count())
      // the threshold is session-tunable: 1.0 re-admits the stop needle
      spark.conf.set("spark.graft.route.maxGramDocFraction", "1.0")
      try assert(base.filter(col("text").contains("zzqqzz"))
          .select(col("doc_id"))
          .queryExecution.executedPlan.toString
          .contains(new java.io.File(loc).getName))
      finally spark.conf.unset("spark.graft.route.maxGramDocFraction")
    }
  }

  test("a DATE-keyed range filter rewrites through the native-zonemap " +
      "btree route — the double-shadow scope guard is lifted for dates") {
    // a date-typed parquet derived from events (the route needs the
    // filtered column ON the scanned source)
    val srcDir = s"${Files.createTempDirectory("graft-routespec")}/dayev"
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(evSource)
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        expr("timestamp_micros(ts div 1000)")
      case _ => col("ts").cast("timestamp")
    }
    raw.select(col("event_id"), to_date(ts).as("day")).write.parquet(srcDir)
    val dayev = spark.read.parquet(srcDir)
    val loc = tmpLoc("route-bt-date")
    ScalarIndex.ensureBtree(dayev, "event_id", "day", loc, srcDir)
    val dLo = java.sql.Date.valueOf("2024-01-08")
    val dHi = java.sql.Date.valueOf("2024-01-17")
    val want = dayev.filter(col("day") >= lit(dLo) && col("day") <= lit(dHi))
      .select(col("event_id"), col("day"))
      .orderBy(col("event_id")).collect()
    val wantTop = dayev.select(col("event_id"), col("day"))
      .orderBy(col("day").desc, col("event_id")).limit(5).collect()
    assert(want.nonEmpty)
    withRule {
      IndexRoute.register(srcDir, "day", "event_id", loc)
      val df = dayev.filter(col("day") >= lit(dLo) && col("day") <= lit(dHi))
        .select(col("event_id"), col("day"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(loc).getName) &&
        !plan.contains("dayev"),
        s"expected the native btree route to fire:\n$plan")
      assert(df.orderBy(col("event_id")).collect().toSeq == want.toSeq)
      // date-keyed ORDER BY ... LIMIT rides the native top-k walk too
      val top = dayev.select(col("event_id"), col("day"))
        .orderBy(col("day").desc, col("event_id")).limit(5)
      assert(top.queryExecution.executedPlan.toString
        .contains(new java.io.File(loc).getName))
      assert(top.collect().toSeq == wantTop.toSeq)
      // ONE-SIDED typed bounds route too (null-sentinel missing side —
      // vacuous over the index's non-null keys)
      val wantOpen = dayev.filter(col("day") > lit(dHi))
        .select(col("event_id"), col("day"))
        .orderBy(col("event_id")).collect()
      assert(wantOpen.nonEmpty)
      val open = dayev.filter(col("day") > lit(dHi))
        .select(col("event_id"), col("day"))
      assert(open.queryExecution.executedPlan.toString
        .contains(new java.io.File(loc).getName),
        s"expected the one-sided date range to route:\n" +
          s"${open.queryExecution.executedPlan}")
      assert(open.orderBy(col("event_id")).collect().toSeq ==
        wantOpen.toSeq)
    }
  }

  test("WHERE <pred> ORDER BY cosine DESC LIMIT k rewrites to the " +
      "FILTERED ANN search; a selective predicate takes the exact arm " +
      "(results ≡ independent filtered brute force)") {
    val embSource = s"$sfDir/embeddings.parquet"
    val emb = spark.read.parquet(embSource)
    val loc = tmpLoc("route-ann-filt")
    graft.ops.AnnIndex.ensureIvf(emb, "vec_id", "embedding",
      emb.limit(4).select((col("vec_id") % 4).cast("int").as("cid"),
        col("embedding").as("cvec")),
      "cid", "cvec", loc, embSource)
    val qv = emb.filter(col("vec_id") === 7)
      .select(col("embedding")).head().getSeq[Float](0)
    def pred(df: org.apache.spark.sql.DataFrame) =
      df.filter(col("label") >= 2 && col("vec_id") % 2 === 0)
    // independent filtered brute force: the exact arm's promise
    val want = pred(emb)
      .select(col("vec_id"),
        round(graft.ops.Similarity.cosine(col("embedding"),
          typedLit(qv)), 6).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(5)
      .select(col("vec_id")).collect()
    withRule {
      IndexRoute.registerAnnApprox(embSource, "embedding", "vec_id", loc,
        nprobe = 2)
      val df = pred(emb)
        .orderBy(graft.ops.Similarity.cosine(col("embedding"),
          typedLit(qv)).desc)
        .limit(5).select(col("vec_id"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(loc).getName),
        s"expected the filtered ANN search in the plan:\n$plan")
      assert(df.collect().toSeq == want.toSeq,
        "the selective arm must be exact over the filtered set")
      // projecting beyond the id declines
      val wide = pred(emb)
        .orderBy(graft.ops.Similarity.cosine(col("embedding"),
          typedLit(qv)).desc)
        .limit(5).select(col("vec_id"), col("label"))
      assert(!wide.queryExecution.executedPlan.toString
        .contains(new java.io.File(loc).getName))
    }
  }

  test("INDEX INTERSECTION by rule composition: the filtered-ANN " +
      "rewrite's allowed-set subquery is itself served by a btree route " +
      "on the filter column — the corpus is never opened at all") {
    val embSource = s"$sfDir/embeddings.parquet"
    val emb = spark.read.parquet(embSource)
    val locAnn = tmpLoc("route-ann-ix")
    val locBt = tmpLoc("route-bt-ix")
    graft.ops.AnnIndex.ensureIvf(emb, "vec_id", "embedding",
      emb.limit(4).select((col("vec_id") % 4).cast("int").as("cid"),
        col("embedding").as("cvec")),
      "cid", "cvec", locAnn, embSource)
    ScalarIndex.ensureBtree(emb, "vec_id", "label", locBt, embSource)
    val qv = emb.filter(col("vec_id") === 7)
      .select(col("embedding")).head().getSeq[Float](0)
    val want = emb.filter(col("label") === 5)
      .select(col("vec_id"),
        round(graft.ops.Similarity.cosine(col("embedding"),
          typedLit(qv)), 6).as("s"))
      .orderBy(col("s").desc, col("vec_id")).limit(5)
      .select(col("vec_id")).collect()
    withRule {
      IndexRoute.registerAnnApprox(embSource, "embedding", "vec_id",
        locAnn, nprobe = 2)
      IndexRoute.register(embSource, "label", "vec_id", locBt)
      val df = emb.filter(col("label") === 5)
        .orderBy(graft.ops.Similarity.cosine(col("embedding"),
          typedLit(qv)).desc)
        .limit(5).select(col("vec_id"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(locAnn).getName),
        s"the ANN index must serve the top-k:\n$plan")
      assert(plan.contains(new java.io.File(locBt).getName),
        s"the btree must serve the allowed set (composition):\n$plan")
      assert(!plan.contains("embeddings.parquet"),
        s"the corpus must be fully closed:\n$plan")
      // selective predicate → exact arm → independent brute force holds
      assert(df.collect().toSeq == want.toSeq)
    }
  }

  test("ORDER BY cosine(vec, lit) DESC LIMIT k rewrites to the ANN index " +
      "search on an explicitly-consented approximate route — and never " +
      "fires without one") {
    val embSource = s"$sfDir/embeddings.parquet"
    val emb = spark.read.parquet(embSource)
    val loc = tmpLoc("route-ann")
    graft.ops.AnnIndex.ensureIvf(emb, "vec_id", "embedding",
      emb.limit(4).select((col("vec_id") % 4).cast("int").as("cid"),
        col("embedding").as("cvec")),
      "cid", "cvec", loc, embSource)
    val qv = emb.filter(col("vec_id") === 7)
      .select(col("embedding")).head().getSeq[Float](0)
    def topk = emb
      .orderBy(graft.ops.Similarity.cosine(col("embedding"),
        typedLit(qv)).desc)
      .limit(5).select(col("vec_id"))
    // WITHOUT the approximate route: the exact corpus scan stands, even
    // when an exact-family route exists on another column
    assert(topk.queryExecution.executedPlan.toString
      .contains("embeddings.parquet"))
    try {
      IndexRoute.registerAnnApprox(embSource, "embedding", "vec_id", loc,
        nprobe = 2)
      val df = topk
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(loc).getName) &&
        !plan.contains("embeddings.parquet"),
        s"expected the ANN index to serve the top-k:\n$plan")
      // results are the INDEX's approximation: identical to the search
      // API over the same index (the consented contract)
      val api = graft.ops.AnnIndex.searchIvf(spark, loc,
          emb.filter(col("vec_id") === 7)
            .select(lit(-1L).as("qid"), col("embedding").as("qvec")),
          "qid", "qvec", k = 5, nprobe = 2)
        .orderBy(col("rank")).select(col("vec_id")).collect()
      assert(df.collect().toSeq == api.toSeq)
      // projecting anything beyond the id declines (scores are the
      // index's rounded approximation and are not offered)
      val wide = emb
        .orderBy(graft.ops.Similarity.cosine(col("embedding"),
          typedLit(qv)).desc)
        .limit(5).select(col("vec_id"), col("label"))
      assert(wide.queryExecution.executedPlan.toString
        .contains("embeddings.parquet"))
    } finally IndexRoute.clear()
  }

  test("CATALOG-DRIVEN discovery: a fresh session configured with " +
      "nothing but extensions + catalog conf serves index plans on its " +
      "first query — no in-process register call") {
    val loc = tmpLoc("route-disc")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource)
    val catPath =
      s"${Files.createTempDirectory("graft-routespec")}/cat.json"
    // the capability pointer reaches the catalog through THIS session;
    // the FILE backend makes it durable across sessions
    graft.Graft.registerCatalog(spark, "graftdisc", "file",
      Map("path" -> catPath))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graftdisc.idx")
    graft.ops.AnnIndex.registerIndexTable(spark,
      "graftdisc.idx.docs_lang", loc)
    IndexRoute.clear() // no in-process route survives into the new session
    val s2 = spark.newSession()
    try {
      graft.Graft.registerCatalog(s2, "graftdisc", "file",
        Map("path" -> catPath))
      val df = s2.read.parquet(docSource).filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(loc).getName) &&
        !plan.contains("documents.parquet"),
        s"expected discovery to serve the plan from config alone:\n$plan")
      assert(df.count() == docs.filter(col("lang") === "en").count())
      // the off-switch: a third session with discovery disabled scans
      val s3 = spark.newSession()
      s3.conf.set("spark.graft.route.discover", "false")
      graft.Graft.registerCatalog(s3, "graftdisc", "file",
        Map("path" -> catPath))
      IndexRoute.clear()
      val scan = s3.read.parquet(docSource).filter(col("lang") === "en")
        .select(col("doc_id"), col("lang"))
      assert(scan.queryExecution.executedPlan.toString
        .contains("documents.parquet"),
        "discover=false must leave the corpus scan standing")
    } finally {
      IndexRoute.clear()
      spark.sql("DROP TABLE IF EXISTS graftdisc.idx.docs_lang")
      spark.conf.unset("spark.sql.catalog.graftdisc")
    }
  }

  test("MULTI-ROOT routing: the COMPLETE partition set of a common " +
      "parent routes; a partition SUBSET declines (serving it from the " +
      "whole-source index would return rows the read partitions lack)") {
    val root = s"${Files.createTempDirectory("graft-routespec")}/partev"
    events.select(col("event_id"), col("value"),
        pmod(col("user_id"), lit(4)).cast("int").as("bucket"))
      .write.partitionBy("bucket").parquet(root)
    val base = spark.read.parquet(root)
    val loc = tmpLoc("route-multiroot")
    ScalarIndex.ensureBtree(base, "event_id", "value", loc, root)
    val dirs = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(_.getPath).sorted
    assert(dirs.length == 4)
    val want = base.filter(col("value") >= 100.0 && col("value") <= 250.0)
      .select(col("event_id"), col("value"))
      .orderBy(col("event_id")).collect()
    assert(want.nonEmpty)
    withRule {
      IndexRoute.register(root, "value", "event_id", loc)
      val all = spark.read.option("basePath", root)
        .parquet(dirs.toIndexedSeq: _*)
        .filter(col("value") >= 100.0 && col("value") <= 250.0)
        .select(col("event_id"), col("value"))
      assert(scansIndex(all, loc),
        s"expected the complete multi-root read to route:\n" +
          s"${all.queryExecution.executedPlan}")
      assert(all.orderBy(col("event_id")).collect().toSeq == want.toSeq)
      // 3 of 4 partitions: completeness check fails → the scan stands,
      // and its (partition-limited) answer differs from the index's
      val subset = spark.read.option("basePath", root)
        .parquet(dirs.take(3).toIndexedSeq: _*)
        .filter(col("value") >= 100.0 && col("value") <= 250.0)
        .select(col("event_id"), col("value"))
      assert(!scansIndex(subset, loc),
        "a partition-subset read must not be served by the whole index")
      assert(subset.count() < want.length,
        "sanity: the subset genuinely holds fewer matching rows")
    }
  }

  test("count(*) over a btree RANGE is answered from zonemap interior " +
      "counts plus the edge buckets; min/max/count(key) without a filter " +
      "from the zonemap alone") {
    val loc = tmpLoc("route-agg")
    ScalarIndex.ensureBtree(events, "event_id", "value", loc, evSource)
    val wantCnt = events.filter(col("value").between(25.5, 250.25)).count()
    val wantMm = events
      .agg(min(col("value")), max(col("value")), count(col("value")))
      .collect().head
    withRule {
      IndexRoute.register(evSource, "value", "event_id", loc)
      val cnt = events.filter(col("value").between(25.5, 250.25))
        .agg(count(lit(1)).as("cnt"))
      assert(scansIndex(cnt, loc),
        s"expected the count-range rewrite:\n${cnt.queryExecution.executedPlan}")
      assert(cnt.collect().head.getLong(0) == wantCnt)
      val mm = events.agg(min(col("value")).as("mn"),
        max(col("value")).as("mx"), count(col("value")).as("n"))
      val plan = mm.queryExecution.executedPlan.toString
      assert(plan.contains("zonemap") && !plan.contains("events.parquet"),
        s"expected the zonemap-only answer:\n$plan")
      assert(!plan.contains("postings"),
        s"the postings were opened for a zonemap-only answer:\n$plan")
      val got = mm.collect().head
      assert(got.getDouble(0) == wantMm.getDouble(0) &&
        got.getDouble(1) == wantMm.getDouble(1) &&
        got.getLong(2) == wantMm.getLong(2))
    }
  }

  test("aggregate routes and NULL keys: count(key)/min/max rewrite and " +
      "stay null-correct; count(*) without a filter NEVER rewrites (the " +
      "index cannot see null-key rows); count(NULL) never rewrites") {
    import spark.implicits._
    val src = tmpLoc("aggnull-src")
    Seq[(Long, Option[Double])]((1L, Some(5.0)), (2L, None),
      (3L, Some(9.0)), (4L, None), (5L, Some(7.5)))
      .toDF("id", "v").write.parquet(src)
    val t = spark.read.parquet(src)
    val loc = tmpLoc("route-aggnull")
    ScalarIndex.ensureBtree(t, "id", "v", loc, src)
    withRule {
      IndexRoute.register(src, "v", "id", loc)
      // count(v): the three non-null keys — served from the zonemap
      val cnt = t.agg(count(col("v")).as("n"), min(col("v")).as("mn"))
      val cntPlan = cnt.queryExecution.executedPlan.toString
      assert(cntPlan.contains("zonemap"),
        s"expected the zonemap answer:\n$cntPlan")
      val got = cnt.collect().head
      assert(got.getLong(0) == 3L && got.getDouble(1) == 5.0)
      // count(*) counts the two null-key rows too: MUST stay on the scan
      val star = t.agg(count(lit(1)).as("n"))
      val starPlan = star.queryExecution.executedPlan.toString
      assert(!starPlan.contains("zonemap"),
        s"count(*) must not be served by a null-blind index:\n$starPlan")
      assert(star.collect().head.getLong(0) == 5L)
      // count(NULL) is always 0 — never the index's match count
      val nul = t.filter(col("v") >= 5.0)
        .agg(count(lit(null).cast("int")).as("n"))
      assert(nul.collect().head.getLong(0) == 0L)
    }
  }

  test("a TOMBSTONED index declines the aggregate routes: interior " +
      "counts and zonemap extremes would include deleted rows") {
    import spark.implicits._
    val src = tmpLoc("aggts-src")
    spark.range(1, 101).select(col("id"),
      (col("id") * 2.0).as("v")).write.parquet(src)
    val t = spark.read.parquet(src)
    val loc = tmpLoc("route-aggts")
    ScalarIndex.ensureBtree(t, "id", "v", loc, src)
    ScalarIndex.deleteIds(Seq(100L).toDF("id"), "id", loc)
    withRule {
      IndexRoute.register(src, "v", "id", loc)
      val mm = t.agg(max(col("v")).as("mx"))
      val plan = mm.queryExecution.executedPlan.toString
      assert(!plan.contains("zonemap"),
        s"a tombstoned index must decline the aggregate route:\n$plan")
      assert(mm.collect().head.getDouble(0) == 200.0)
      val cnt = t.filter(col("v").between(10.0, 500.0))
        .agg(count(lit(1)).as("n"))
      val cntPlan = cnt.queryExecution.executedPlan.toString
      assert(!cntPlan.contains(new java.io.File(loc).getName),
        s"a tombstoned index must decline the count route:\n$cntPlan")
    }
  }

  test("GROUP BY key / DISTINCT key / filterless count(*) are answered " +
      "from index metadata under the row-accounting proof") {
    val loc = tmpLoc("route-gb")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource)
    val wantGb = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .orderBy(col("lang")).collect()
    val wantD = docs.select(col("lang")).distinct()
      .orderBy(col("lang")).collect()
    val wantN = docs.count()
    withRule {
      IndexRoute.register(docSource, "lang", "doc_id", loc)
      val gb = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      assert(scansIndex(gb, loc),
        s"expected the values-table answer:\n${gb.queryExecution.executedPlan}")
      assert(!gb.queryExecution.executedPlan.toString.contains("postings"))
      assert(gb.orderBy(col("lang")).collect().toSeq == wantGb.toSeq)
      val d = docs.select(col("lang")).distinct()
      assert(scansIndex(d, loc),
        s"expected the values-list distinct:\n${d.queryExecution.executedPlan}")
      assert(d.orderBy(col("lang")).collect().toSeq == wantD.toSeq)
      // keyless count(*): the manifest literal — no corpus in the plan
      val n = docs.agg(count(lit(1)).as("cnt"))
      assert(!n.queryExecution.executedPlan.toString
        .contains("documents.parquet"),
        s"expected the manifest count:\n${n.queryExecution.executedPlan}")
      assert(n.collect().head.getLong(0) == wantN)
    }
  }

  test("filtered count(*) WHERE key =/IN (...) is answered from the " +
      "values table with the postings CLOSED — the q269 plan discipline " +
      "extended to the count shape (VERDICT r16 #4), absent values " +
      "summing to the same zero the postings count produced") {
    val loc = tmpLoc("route-cntin")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource)
    val wantEn = docs.filter(col("lang") === "en").count()
    val wantIn = docs.filter(col("lang").isin("en", "de")).count()
    withRule {
      IndexRoute.register(docSource, "lang", "doc_id", loc)
      val eq = docs.filter(col("lang") === "en").agg(count(lit(1)).as("cnt"))
      val eqPlan = eq.queryExecution.executedPlan.toString
      assert(scansIndex(eq, loc),
        s"expected the values-table count:\n$eqPlan")
      assert(!eqPlan.contains("postings"),
        s"the postings were opened for a values-table count:\n$eqPlan")
      assert(eq.collect().head.getLong(0) == wantEn)
      val in = docs.filter(col("lang").isin("en", "de"))
        .agg(count(lit(1)).as("cnt"))
      val inPlan = in.queryExecution.executedPlan.toString
      assert(!inPlan.contains("postings"),
        s"the postings were opened for a values-table IN count:\n$inPlan")
      assert(in.collect().head.getLong(0) == wantIn)
      val zero = docs.filter(col("lang") === "zz__absent")
        .agg(count(lit(1)).as("cnt"))
      assert(zero.collect().head.getLong(0) == 0L)
    }
  }

  test("row accounting declines when the index did not see every row: " +
      "null keys break the GROUP BY/count(*)/DISTINCT rewrites but " +
      "never the results") {
    import spark.implicits._
    val src = tmpLoc("gbnull-src")
    Seq[(Long, Option[String])]((1L, Some("en")), (2L, None),
      (3L, Some("de")), (4L, Some("en")))
      .toDF("id", "k").write.parquet(src)
    val t = spark.read.parquet(src)
    val loc = tmpLoc("route-gbnull")
    ScalarIndex.ensureBitmap(t, "id", "k", loc, src)
    // the accounting disagrees: 4 source rows, 3 indexed
    assert(graft.ops.AnnIndex.readManifest(loc).get.sourceRows == 4L)
    assert(ScalarIndex.indexedRowSum(spark, loc) == 3L)
    withRule {
      IndexRoute.register(src, "k", "id", loc)
      val gb = t.groupBy(col("k")).agg(count(lit(1)).as("n"))
      assert(!gb.queryExecution.executedPlan.toString
        .contains(new java.io.File(loc).getName),
        "a null-key source must decline the group-by rewrite")
      // the scan answer includes the NULL group the index cannot see
      assert(gb.collect().length == 3)
      val n = t.agg(count(lit(1)).as("cnt"))
      assert(!n.queryExecution.executedPlan.toString
        .contains(new java.io.File(loc).getName))
      assert(n.collect().head.getLong(0) == 4L)
      // count(DISTINCT k) needs the same proof — an empty-string key
      // would be a real distinct value the bitmap cannot see
      val dc = t.agg(countDistinct(col("k")).as("nd"))
      assert(!dc.queryExecution.executedPlan.toString
        .contains(new java.io.File(loc).getName),
        "a null-key source must decline the distinct-count rewrite")
      assert(dc.collect().head.getLong(0) == 2L)
      // ... but the FILTERED group-by still serves: the IN pins every
      // surviving group to an asked non-null value, so no accounting
      // is needed and the null row is irrelevant
      val fgb = t.filter(col("k").isin("en", "de"))
        .groupBy(col("k")).agg(count(lit(1)).as("n"))
      assert(fgb.queryExecution.executedPlan.toString
        .contains(new java.io.File(loc).getName),
        "the filtered group-by must serve despite the null-key row")
      assert(fgb.orderBy(col("k")).collect().map(r =>
        (r.getString(0), r.getLong(1))).toSeq ==
        Seq(("de", 1L), ("en", 2L)))
    }
  }

  test("count(DISTINCT key) over an accounted bitmap source is answered " +
      "by counting the values table") {
    val loc = tmpLoc("route-dcount")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource)
    val want = docs.agg(countDistinct(col("lang"))).collect().head.getLong(0)
    withRule {
      IndexRoute.register(docSource, "lang", "doc_id", loc)
      val df = docs.agg(countDistinct(col("lang")).as("nd"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(loc).getName) &&
          !plan.contains("documents.parquet"),
        s"expected the values-table count:\n$plan")
      assert(df.collect().head.getLong(0) == want)
    }
  }

  test("bitmap append maintains the row accounting: the grown index " +
      "still serves GROUP BY and matches the grown source") {
    import spark.implicits._
    val src = tmpLoc("gbapp-src")
    Seq((1L, "en"), (2L, "de"), (3L, "en"))
      .toDF("id", "k").write.parquet(src)
    val loc = tmpLoc("route-gbapp")
    ScalarIndex.ensureBitmap(spark.read.parquet(src), "id", "k", loc, src)
    // grow the source, fold the delta incrementally
    val delta = Seq((4L, "fr"), (5L, "en")).toDF("id", "k")
    delta.write.mode("append").parquet(src)
    ScalarIndex.appendBitmap(delta, "id", "k", loc,
      graft.ops.AnnIndex.sourceFingerprint(src))
    assert(graft.ops.AnnIndex.readManifest(loc).get.sourceRows == 5L)
    val t = spark.read.parquet(src)
    val want = t.groupBy(col("k")).agg(count(lit(1)).as("n"))
      .orderBy(col("k")).collect()
    withRule {
      IndexRoute.register(src, "k", "id", loc)
      val gb = t.groupBy(col("k")).agg(count(lit(1)).as("n"))
      assert(scansIndex(gb, loc),
        s"expected the appended values answer:\n${gb.queryExecution.executedPlan}")
      assert(gb.orderBy(col("k")).collect().toSeq == want.toSeq)
    }
  }

  test("routes of different families COEXIST on one (path, column) key: " +
      "a zorder route on the same column must not shadow the btree's " +
      "1-D range service, and the box shape still routes to the zorder") {
    val locB = tmpLoc("coex-bt")
    val locZ = tmpLoc("coex-z")
    ScalarIndex.ensureBtree(events, "event_id", "value", locB, evSource)
    graft.ops.ZorderIndex.ensureZorder(events, "event_id", "value",
      "user_id", locZ, evSource)
    val want = events.filter(col("value") > 150.0)
      .select(col("event_id"), col("value"))
      .orderBy(col("event_id")).collect()
    withRule {
      // registration order = the r15 bench poisoning: the zorder lands
      // LAST (as catalog discovery did), claiming (events, value)
      IndexRoute.register(evSource, "value", "event_id", locB)
      IndexRoute.register(evSource, "value", "event_id", locZ)
      val df = events.filter(col("value") > 150.0)
        .select(col("event_id"), col("value"))
      assert(scansIndex(df, locB),
        s"the btree must still serve the 1-D range:\n${df.queryExecution.executedPlan}")
      assert(df.orderBy(col("event_id")).collect().toSeq == want.toSeq)
      // and the 2-D box still finds the zorder on the same keys
      IndexRoute.register(evSource, "user_id", "event_id", locZ)
      val box = events.filter(col("value") >= 100.0 &&
          col("value") <= 250.0 &&
          col("user_id") >= 3L && col("user_id") <= 7L)
        .select(col("event_id"), col("value"), col("user_id"))
      assert(box.queryExecution.executedPlan.toString
        .contains(new java.io.File(locZ).getName),
        s"the box shape must route to the zorder:\n${box.queryExecution.executedPlan}")
    }
  }

  test("an unrouted column is untouched even when other routes exist") {
    val loc = tmpLoc("route-other")
    ScalarIndex.ensureBitmap(docs, "doc_id", "lang", loc, docSource)
    withRule {
      IndexRoute.register(docSource, "lang", "doc_id", loc)
      val df = docs.filter(col("source") === "src1")
        .select(col("doc_id"), col("source"))
      assert(!scansIndex(df, loc))
      assert(df.count() == docs.filter(col("source") === "src1").count())
    }
  }

  test("count(*) under a TIMESTAMP range is metadata-served through the " +
      "native zonemap walk — inclusive, strict, and one-sided shapes all " +
      "equal the scan plan's counts") {
    val loc = tmpLoc("route-tscount")
    ScalarIndex.ensureBtree(events, "event_id", "ts", loc, evSource)
    def lo = lit(java.time.LocalDateTime.of(2024, 1, 8, 0, 0, 0))
    def hi = lit(java.time.LocalDateTime.of(2024, 1, 17, 0, 0, 0))
    val shapes: Seq[org.apache.spark.sql.Column] = Seq(
      col("ts") >= lo && col("ts") <= hi, // inclusive two-sided
      col("ts") > lo && col("ts") < hi,   // strict two-sided
      col("ts") >= lo,                    // one-sided lower
      col("ts") < hi)                     // one-sided upper
    val want = shapes.map(p => events.filter(p).count())
    withRule {
      IndexRoute.register(evSource, "ts", "event_id", loc)
      shapes.zip(want).foreach { case (p, w) =>
        val df = events.filter(p).agg(count(lit(1)).as("cnt"))
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains(new java.io.File(loc).getName) &&
            !plan.contains("events.parquet"),
          s"typed count must be index-served for $p:\n$plan")
        assert(df.collect().head.getLong(0) == w,
          s"typed count drifted for $p")
      }
    }
  }

  test("filtered min/max/count under a TIMESTAMP range is metadata-" +
      "served across strict and one-sided shapes") {
    val loc = tmpLoc("route-tsstats")
    ScalarIndex.ensureBtree(events, "event_id", "ts", loc, evSource)
    def lo = lit(java.time.LocalDateTime.of(2024, 1, 8, 0, 0, 0))
    def hi = lit(java.time.LocalDateTime.of(2024, 1, 17, 0, 0, 0))
    val shapes: Seq[org.apache.spark.sql.Column] = Seq(
      col("ts") >= lo && col("ts") <= hi,
      col("ts") > lo && col("ts") < hi,
      col("ts") >= lo,
      col("ts") < hi)
    val want = shapes.map(p => events.filter(p)
      .agg(min(col("ts")), max(col("ts")), count(lit(1))).collect().head)
    withRule {
      IndexRoute.register(evSource, "ts", "event_id", loc)
      shapes.zip(want).foreach { case (p, w) =>
        val df = events.filter(p).agg(min(col("ts")).as("mn"),
          max(col("ts")).as("mx"), count(lit(1)).as("cnt"))
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains(new java.io.File(loc).getName) &&
            !plan.contains("events.parquet"),
          s"typed stats must be index-served for $p:\n$plan")
        assert(df.collect().head == w, s"typed stats drifted for $p")
      }
    }
  }

  test("metadata aggregates serve catalog-table (DSv2) reads too: " +
      "count(*) under a range through the table name reads the index") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.routespec")
    spark.sql(
      """CREATE TABLE IF NOT EXISTS graft.routespec.ev
        |(event_id BIGINT, value DOUBLE)""".stripMargin)
    spark.sql(
      s"""INSERT OVERWRITE graft.routespec.ev
         |SELECT event_id, value FROM parquet.`$evSource`""".stripMargin)
    val tblLoc = graft.catalog.GraftProcedures
      .tableLocation("graft.routespec.ev")
    val loc = tmpLoc("route-dsv2agg")
    ScalarIndex.ensureBtree(spark.table("graft.routespec.ev"),
      "event_id", "value", loc, tblLoc)
    val want = spark.table("graft.routespec.ev")
      .filter(col("value").between(100.0, 250.0)).count()
    withRule {
      IndexRoute.register(tblLoc, "value", "event_id", loc)
      val df = spark.sql(
        """SELECT count(*) AS cnt FROM graft.routespec.ev
           |WHERE value BETWEEN 100.0 AND 250.0""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(loc).getName) &&
          !plan.contains("routespec/ev") && !plan.contains("ev/part-"),
        s"expected the DSv2 aggregate to be index-served:\n$plan")
      assert(df.collect().head.getLong(0) == want)
    }
  }

  test("a DECIMAL-keyed btree DECLINES the filterless min/max metadata " +
      "route: decimals beyond double precision alias in the zonemap " +
      "shadow, so the scan must answer (ADVICE r15)") {
    val dir = Files.createTempDirectory("graft-decsrc").toString
    val src = s"$dir/dec.parquet"
    // 2^53 ± small offsets: distinct as DECIMAL(20,0), aliasing as double
    spark.sql(
      """SELECT id, CAST(9007199254740992 + id AS DECIMAL(20,0)) AS key
        |FROM range(0, 100)""".stripMargin)
      .write.mode("overwrite").parquet(src)
    val loc = tmpLoc("route-dec")
    val df0 = spark.read.parquet(src)
    ScalarIndex.ensureBtree(df0, "id", "key", loc, src)
    val want = df0.agg(min(col("key")).as("mn"), max(col("key")).as("mx"))
      .collect().toSeq
    withRule {
      IndexRoute.register(src, "key", "id", loc)
      val agg = spark.read.parquet(src)
        .agg(min(col("key")).as("mn"), max(col("key")).as("mx"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("zonemap"),
        s"decimal extremes must not be metadata-served:\n$plan")
      assert(agg.collect().toSeq == want)
    }
  }

  test("catalog-table (DSv2) reads get the same index service a path " +
      "read gets: the rewrite fires on DataSourceV2 relations over " +
      "GraftTable and results are identical to the scan plan") {
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.routespec")
    spark.sql(
      """CREATE TABLE IF NOT EXISTS graft.routespec.docs
        |(doc_id BIGINT, lang STRING)""".stripMargin)
    spark.sql(
      s"""INSERT OVERWRITE graft.routespec.docs
         |SELECT doc_id, lang FROM parquet.`$docSource`""".stripMargin)
    val tblLoc = graft.catalog.GraftProcedures
      .tableLocation("graft.routespec.docs")
    val loc = tmpLoc("route-dsv2")
    ScalarIndex.ensureBitmap(spark.table("graft.routespec.docs"),
      "doc_id", "lang", loc, tblLoc)
    val want = spark.table("graft.routespec.docs")
      .filter(col("lang") === "de")
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id")).collect()
    withRule {
      IndexRoute.register(tblLoc, "lang", "doc_id", loc)
      val df = spark.sql(
        """SELECT doc_id, lang FROM graft.routespec.docs
          |WHERE lang = 'de'""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains(new java.io.File(loc).getName) &&
          !plan.contains("routespec.docs") && !plan.contains("docs/part-"),
        s"expected the DSv2 read to be index-served:\n$plan")
      assert(df.orderBy(col("doc_id")).collect().toSeq == want.toSeq)
    }
  }

  test("DSv2 PARTITION GUARD: a partitioned V2 file scan is never " +
      "index-served — pushdown removes exactly-pushed partition " +
      "conjuncts from the logical Filter, so a whole-source index " +
      "would answer outside the pruned partitions (VERDICT r16)") {
    val dir = Files.createTempDirectory("graft-v2part").toString
    val src = s"$dir/part_ev"
    events.withColumn("pt", (col("event_id") % 2).cast("int"))
      .write.mode("overwrite").partitionBy("pt").parquet(src)
    // truths computed BEFORE forcing V2 (plan family is irrelevant here)
    val whole = spark.read.parquet(src)
    val wantCnt = whole.filter(col("pt") === 1).count()
    val wantRows = whole
      .filter(col("pt") === 1 && col("value").between(100.0, 250.0))
      .select(col("event_id"), col("value"))
      .orderBy(col("event_id")).collect().toSeq
    val loc = tmpLoc("route-v2part")
    ScalarIndex.ensureBtree(whole, "event_id", "value", loc, src)
    val prevV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try withRule {
      IndexRoute.register(src, "value", "event_id", loc)
      val idxName = new java.io.File(loc).getName
      // bare-relation metadata arm: count(*) whose ONLY conjunct is the
      // pushed partition filter — post-pushdown the Filter is GONE and
      // serving manifest sourceRows would count the whole table
      val cnt = spark.read.parquet(src).filter(col("pt") === 1)
        .agg(count(lit(1)).as("cnt"))
      assert(!cnt.queryExecution.executedPlan.toString.contains(idxName),
        "partition-pruned count must NOT be metadata-served:\n" +
          cnt.queryExecution.executedPlan)
      assert(cnt.collect().head.getLong(0) == wantCnt)
      // residual-filter arm: the index covers `value` but the scan is
      // partition-pruned — route must decline to the scan
      val q = spark.read.parquet(src)
        .filter(col("pt") === 1 && col("value").between(100.0, 250.0))
        .select(col("event_id"), col("value"))
      assert(!q.queryExecution.executedPlan.toString.contains(idxName),
        "partition-pruned filter must decline index service:\n" +
          q.queryExecution.executedPlan)
      assert(q.orderBy(col("event_id")).collect().toSeq == wantRows)
    } finally spark.conf.set("spark.sql.sources.useV1SourceList", prevV1)
  }
}
