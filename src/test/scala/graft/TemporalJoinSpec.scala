package graft

import org.apache.spark.sql.functions._

import graft.ops.TemporalJoins

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asof join: backward, inclusive, per-key, nulls on miss") {
    val left = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")),
      (2L, 10L, ts("2024-01-01 12:00:00")),
      (3L, 20L, ts("2024-01-01 09:00:00")), // before any right row for key 20
      (4L, 30L, ts("2024-01-01 09:00:00"))  // key with no right rows at all
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), 1.0), // equal time -> visible (inclusive)
      (10L, ts("2024-01-01 11:30:00"), 2.0),
      (10L, ts("2024-01-01 13:00:00"), 9.0), // after both left rows
      (20L, ts("2024-01-01 10:00:00"), 5.0)
    ).toDF("k", "rt", "v")
    val out = TemporalJoins.asofJoin(left, right, "k", "t", "rt",
        Map("v" -> "last_v"))
      .select($"id", $"last_v").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(1L).contains(1.0)) // inclusive <=
    assert(out(2L).contains(2.0)) // latest prior, not the future row
    assert(out(3L).isEmpty)
    assert(out(4L).isEmpty)
  }

  test("asof join carries the matched row atomically, including its nulls") {
    val left = Seq((1L, 10L, ts("2024-01-01 12:00:00"))).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 10:00:00"), Option(5.0), Option("early")),
      (10L, ts("2024-01-01 11:00:00"), Option.empty[Double], Option("late"))
    ).toDF("k", "rt", "v", "tag")
    val out = TemporalJoins.asofJoin(left, right, "k", "t", "rt",
        Map("v" -> "last_v", "tag" -> "last_tag")).head()
    // the 11:00 row is the match; its null v must NOT fall back to 5.0
    assert(out.isNullAt(out.fieldIndex("last_v")))
    assert(out.getAs[String]("last_tag") == "late")
  }

  test("range join binned: inclusive bounds, bin-boundary spanning") {
    val intervals = Seq(
      (1L, 100L, 100L, 200L),  // exact-boundary interval
      (2L, 100L, 250L, 1250L)  // spans multiple 600s bins
    ).toDF("iid", "k", "s", "e")
    val points = Seq(
      (10L, 100L, 100L),  // == start (inclusive)
      (11L, 100L, 200L),  // == end (inclusive)
      (12L, 100L, 201L),  // just outside interval 1, inside none? (s=250 no)
      (13L, 100L, 599L),  // bin 0 for width 600, inside interval 2
      (14L, 100L, 600L),  // bin 1 boundary, inside interval 2
      (15L, 100L, 1250L), // == end of interval 2
      (16L, 100L, 1251L), // outside
      (17L, 999L, 150L)   // wrong key
    ).toDF("pid", "k", "p")
    val out = TemporalJoins.rangeJoinBinned(intervals, points,
        "k", "s", "e", "p", binWidthSec = 600)
      .select($"iid", $"pid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 10L), (1L, 11L), (2L, 13L), (2L, 14L), (2L, 15L)),
      out.toString)
  }

  test("range join binned equals raw theta join on events sample") {
    val ev = graft.queries.Tables.events(spark, sfDir)
    val windows = ev.filter($"event_type" === "purchase").limit(50)
      .select($"user_id", $"event_id".as("wid"),
        ($"ts".cast("long") - 300).as("s"), ($"ts".cast("long") + 300).as("e"))
    val points = ev.select($"user_id", $"event_id".as("pid"), $"ts")
    val binned = TemporalJoins.rangeJoinBinned(windows, points,
        "user_id", "s", "e", "ts", 600)
      .select($"wid", $"pid").as[(Long, Long)].collect().toSet
    val theta = windows.join(points, Seq("user_id"))
      .filter($"ts".cast("long").between($"s", $"e"))
      .select($"wid", $"pid").as[(Long, Long)].collect().toSet
    assert(binned == theta && theta.nonEmpty)
  }

  test("events loader fails fast on an unexpected ts physical type") {
    // schema drift in a data drop (ts as string) must throw at load with
    // the observed type, not surface downstream as a confusing cast error
    val dir = java.nio.file.Files.createTempDirectory("graft-evdrift")
    spark.range(3).selectExpr("id as event_id", "id as user_id",
        "'click' as event_type", "cast(id as string) as ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] {
      graft.queries.Tables.events(spark, dir.toString)
    }
    assert(e.getMessage.contains("events.ts") &&
      e.getMessage.contains("StringType"), e.getMessage)
  }
}
