package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{AnnIndex, ScalarIndex}

/** SQL-surface index management — [[graft.catalog.GraftProcedures]]:
  * the whole index lifecycle drivable from `CALL graft.system.*`
  * statements, receipts returned as rows. */
class GraftProcedureSpec extends SparkSpec {

  private lazy val evSource = s"$sfDir/events.parquet"
  private lazy val events = spark.read.parquet(evSource)

  private def tmpLoc(name: String): String =
    s"${Files.createTempDirectory("graft-procspec").toString}/$name"

  test("create_index → search; re-create reuses; compact, rebuild, and " +
      "vacuum drive the full lifecycle from SQL") {
    graft.queries.CatalogQueries.ensureCatalog(spark)
    val loc = tmpLoc("proc-bt")
    def create() = spark.sql(
      s"""CALL graft.system.create_index(
         |  name => 'graft.tpch.proc_btree_idx', index_type => 'btree',
         |  source => '$evSource', id_col => 'event_id',
         |  key_cols => 'value', location => '$loc')""".stripMargin)
      .collect().head
    val r1 = create()
    assert(r1.getString(0) == loc && r1.getString(1) == "btree" &&
      r1.getString(2) == "built")
    // the registered pointer resolves, and the index serves searches
    assert(AnnIndex.resolveIndexLocation(
      spark, "graft.tpch.proc_btree_idx") == loc)
    val want = events.filter(col("value") >= 100.0 && col("value") <= 250.0)
      .select(col("event_id").as("id"), col("value").as("key"))
      .orderBy(col("id")).collect()
    assert(ScalarIndex.searchBtreeRange(spark, loc, 100.0, 250.0)
      .orderBy(col("id")).collect().toSeq == want.toSeq)
    // unchanged fingerprint: the second CALL is a no-op receipt
    assert(create().getString(2) == "reused")

    // delete → compact via CALL: tombstones fold, divergence survives
    ScalarIndex.deleteIds(events.filter(col("event_id") % 5 === 2),
      "event_id", loc)
    val rc = spark.sql(
      "CALL graft.system.compact_index(index => 'graft.tpch.proc_btree_idx')")
      .collect().head
    assert(rc.getString(2) == "compacted")
    assert(!ScalarIndex.hasTombstones(loc))
    assert(AnnIndex.readManifest(loc).get.divergent)

    // rebuild via CALL: the manifest-driven recovery restores equality
    val rr = spark.sql(
      "CALL graft.system.rebuild_index(index => 'graft.tpch.proc_btree_idx')")
      .collect().head
    assert(rr.getString(2) == "rebuilt")
    assert(!AnnIndex.readManifest(loc).get.divergent)
    assert(ScalarIndex.searchBtreeRange(spark, loc, 100.0, 250.0)
      .orderBy(col("id")).collect().toSeq == want.toSeq)

    // vacuum via CALL: plant old residue, collect it
    val residue = new java.io.File(s"$loc/postings.compact.42424.1")
    assert(residue.mkdirs())
    assert(residue.setLastModified(
      System.currentTimeMillis() - 48L * 3600 * 1000))
    val rv = spark.sql(
      "CALL graft.system.vacuum_index(index => 'graft.tpch.proc_btree_idx')")
      .collect()
    assert(rv.map(_.getString(0)).toSet == Set(residue.getPath))
    assert(!residue.exists())
  }

  test("create_index dispatches every reconstructible family; vector " +
      "tiers and unknown procedures refuse loudly") {
    graft.queries.CatalogQueries.ensureCatalog(spark)
    val locZ = tmpLoc("proc-z")
    val rz = spark.sql(
      s"""CALL graft.system.create_index(
         |  name => 'graft.tpch.proc_zorder_idx', index_type => 'zorder',
         |  source => '$evSource', id_col => 'event_id',
         |  key_cols => 'value,user_id', location => '$locZ')""".stripMargin)
      .collect().head
    assert(rz.getString(1) == "zorder" && rz.getString(2) == "built")
    assert(graft.ops.ZorderIndex.searchBox(spark, locZ,
      100.0, 250.0, 3.0, 7.0).count() ==
      events.filter(col("value").between(100.0, 250.0) &&
        col("user_id").between(3, 7)).count())
    val e = intercept[Exception](spark.sql(
      s"""CALL graft.system.create_index(
         |  name => 'graft.tpch.never', index_type => 'ivf_pq',
         |  source => '$evSource', id_col => 'a', key_cols => 'b',
         |  location => '${tmpLoc("no")}')""".stripMargin).collect())
    assert(e.getMessage.contains("training"))
    val e2 = intercept[Exception](spark.sql(
      "CALL graft.system.no_such_proc(index => 'x')").collect())
    assert(e2.getMessage.contains("no_such_proc") ||
      e2.getMessage.contains("not found") ||
      e2.getMessage.contains("NOT_FOUND"))
    // the inventory of procedures is listable
    import org.apache.spark.sql.connector.catalog.{CatalogPlugin, ProcedureCatalog}
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[CatalogPlugin with ProcedureCatalog]
    assert(cat.listProcedures(Array("system")).map(_.name()).sorted.toSeq ==
      Seq("compact_index", "compact_table", "create_index",
        "describe_index", "rebuild_index", "refresh_index", "vacuum_index"))
    // describe_index surfaces the manifest by table name or raw location
    val desc = spark.sql(
      "CALL graft.system.describe_index(index => 'graft.tpch.proc_zorder_idx')")
      .collect().head
    assert(desc.getString(1) == "zorder" && desc.getString(2) == "box" &&
      desc.getString(5) == "false" &&
      desc.getString(8) == "value,user_id")
  }

  test("compact_table folds small files into target-sized ones, keeps " +
      "content bit-identical, supports 1-col range and 2-col z-order " +
      "clustering, and stales routed indexes by fingerprint") {
    graft.queries.CatalogQueries.ensureCatalog(spark)
    spark.sql(
      """CREATE TABLE IF NOT EXISTS graft.tpch.proc_cmp
        |(event_id BIGINT, user_id BIGINT, value DOUBLE)""".stripMargin)
    spark.sql(
      s"""INSERT OVERWRITE graft.tpch.proc_cmp
         |SELECT /*+ REPARTITION(32) */ event_id, user_id, value
         |FROM parquet.`$evSource`""".stripMargin)
    val want = spark.table("graft.tpch.proc_cmp")
      .orderBy(col("event_id")).collect()
    // an index routed over the table's files, fresh before compaction
    val loc = graft.catalog.GraftProcedures.tableLocation(
      "graft.tpch.proc_cmp")
    val idx = tmpLoc("proc-cmp-idx")
    ScalarIndex.ensureBtree(spark.table("graft.tpch.proc_cmp"),
      "event_id", "value", idx, loc)
    val fpBefore = AnnIndex.sourceFingerprint(loc)
    assert(AnnIndex.readManifest(idx).get.fingerprint == fpBefore)

    val r = spark.sql(
      """CALL graft.system.compact_table(
        |  table => 'graft.tpch.proc_cmp', target_mb => '128',
        |  cluster_by => 'value')""".stripMargin).collect().head
    assert(r.getString(3) == "compacted")
    assert(r.getString(1).toInt >= 32 && r.getString(2).toInt < 32,
      s"expected the file count to collapse, got ${r.getString(1)} -> " +
        r.getString(2))
    assert(spark.table("graft.tpch.proc_cmp")
      .orderBy(col("event_id")).collect().toSeq == want.toSeq)
    // the rewrite flipped the source fingerprint: the route's freshness
    // check now declines until rebuild_index (the q256 loop)
    assert(AnnIndex.sourceFingerprint(loc) != fpBefore)

    // the 2-col arm z-orders without changing content either
    val r2 = spark.sql(
      """CALL graft.system.compact_table(
        |  table => 'graft.tpch.proc_cmp', target_mb => '128',
        |  cluster_by => 'user_id,value')""".stripMargin).collect().head
    assert(r2.getString(3) == "compacted")
    assert(spark.table("graft.tpch.proc_cmp")
      .orderBy(col("event_id")).collect().toSeq == want.toSeq)
    // three+ cluster columns refuse loudly
    val e = intercept[Exception](spark.sql(
      """CALL graft.system.compact_table(
        |  table => 'graft.tpch.proc_cmp',
        |  cluster_by => 'a,b,c')""".stripMargin).collect())
    assert(e.getMessage.contains("0, 1 or 2"))
  }

  test("refresh_index folds a pure source DELETE incrementally (receipt " +
      "'folded', search ≡ the shrunken source) and falls back to a full " +
      "rebuild when rows were ADDED (receipt 'rebuilt')") {
    graft.queries.CatalogQueries.ensureCatalog(spark)
    val dir = Files.createTempDirectory("graft-refresh").toString
    val src = s"$dir/ev.parquet"
    events.select(col("event_id"), col("value"))
      .write.mode("overwrite").parquet(src)
    val loc = tmpLoc("refresh-bt")
    ScalarIndex.ensureBtree(spark.read.parquet(src), "event_id", "value",
      loc, src)
    // a pure delete: drop a slice, rewrite the source
    val kept = spark.read.parquet(src)
      .filter(col("event_id") % 5 =!= 0).cache()
    kept.count()
    kept.write.mode("overwrite").parquet(src)
    kept.unpersist()
    val r1 = spark.sql(
      s"CALL graft.system.refresh_index(index => '$loc')").collect().head
    assert(r1.getString(2) == "folded", s"expected the fold, got $r1")
    val man = AnnIndex.readManifest(loc).get
    assert(man.fingerprint == AnnIndex.sourceFingerprint(src) &&
      !man.divergent, "the fold must leave a FRESH, non-divergent index")
    val want = spark.read.parquet(src)
      .filter(col("value") >= 100.0 && col("value") <= 250.0)
      .select(col("event_id").as("id"), col("value").as("key"))
      .orderBy(col("id")).collect()
    assert(ScalarIndex.searchBtreeRange(spark, loc, 100.0, 250.0)
      .orderBy(col("id")).collect().toSeq == want.toSeq)
    // row accounting survives the fold: count(*) service stays provable
    assert(man.sourceRows ==
      ScalarIndex.indexedRowSum(spark, loc))
    // an ADDITIVE change is NOT a pure delete → the full rebuild leg
    val extra = spark.range(1).select(
      lit(99999999L).as("event_id"), lit(123.5).as("value"))
    extra.write.mode("append").parquet(src)
    val r2 = spark.sql(
      s"CALL graft.system.refresh_index(index => '$loc')").collect().head
    assert(r2.getString(2) == "rebuilt", s"expected the rebuild, got $r2")
    val want2 = spark.read.parquet(src)
      .filter(col("value") >= 100.0 && col("value") <= 250.0)
      .select(col("event_id").as("id"), col("value").as("key"))
      .orderBy(col("id")).collect()
    assert(ScalarIndex.searchBtreeRange(spark, loc, 100.0, 250.0)
      .orderBy(col("id")).collect().toSeq == want2.toSeq)
  }
}
