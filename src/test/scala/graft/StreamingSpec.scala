package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

/** The streaming operators must produce batch-identical results when fed the
  * same events through a MemoryStream — the unified-API guarantee the module
  * is built on. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def sampleEvents: Seq[Event] = {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until 200).map { i =>
      Event(i.toLong, new java.sql.Timestamp(base + i * 97000L + (i % 7) * 1000L),
        (i % 5).toLong, s"type${i % 3}", (i % 11) * 1.5)
    }
  }

  test("windowed stats: streaming (complete mode) agrees with batch") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val query = EventStreams.windowedStats(stream.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    try {
      stream.addData(sampleEvents)
      query.processAllAvailable()
      val streamed = spark.table("win_out")
        .orderBy("win_start", "event_type").collect().toSeq
      val batch = EventStreams.windowedStats(sampleEvents.toDF())
        .orderBy("win_start", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally query.stop()
  }

  test("windowed PSI drift monitor: streaming agrees with batch, and a " +
      "shifted window alarms while matching windows stay near 0") {
    implicit val sqlCtx = spark.sqlContext
    // reference = the sample's own histogram; then append a drifted hour
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val drifted = sampleEvents ++ (0 until 50).map(i =>
      Event(1000L + i, new java.sql.Timestamp(base + 48L * 3600 * 1000 + i * 1000),
        1L, "a", 499.0)) // point mass in the top bin, far-future hour
    val ref = sampleEvents.toDF()
      .groupBy(EventStreams.valueBin(500.0).as("b")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val stream = MemoryStream[Event]
    val query = EventStreams.windowedPsi(stream.toDF(), ref)
      .writeStream.format("memory").queryName("psi_out")
      .outputMode("complete").start()
    try {
      stream.addData(drifted)
      query.processAllAvailable()
      val streamed = spark.table("psi_out").orderBy("win_start").collect().toSeq
      val batch = EventStreams.windowedPsi(drifted.toDF(), ref)
        .orderBy("win_start").collect().toSeq
      assert(streamed == batch, "stream/batch PSI divergence")
      assert(batch.nonEmpty)
      // the drifted hour must alarm; FULL in-reference hours must not
      // (a nearly-empty trailing window is pseudo-count-dominated and
      // legitimately noisy — monitoring reads psi next to n)
      val byWin = batch.map(r => r.getAs[Long]("win_start") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("psi")))).toMap
      val driftWin = (base / 1000) + 48L * 3600
      assert(byWin(driftWin)._2 > 0.25, s"drifted window: ${byWin(driftWin)}")
      val quiet = byWin.filterNot(_._1 == driftWin).filter(_._2._1 >= 20)
      assert(quiet.nonEmpty && quiet.values.forall(_._2 < 0.25),
        s"full baseline windows must stay quiet: $byWin")
    } finally query.stop()
  }

  test("keyed windowed PSI: streaming agrees with batch; drift in one " +
      "source alarms that source only; unbaselined sources are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val driftHour = base + 48L * 3600 * 1000
    // source type0 drifts (point mass in the top bin) in a far-future
    // hour; type1 keeps its baseline mix in that same hour
    val drifted = sampleEvents ++
      (0 until 50).map(i => Event(1000L + i,
        new java.sql.Timestamp(driftHour + i * 1000), 1L, "type0", 499.0)) ++
      (0 until 50).map(i => Event(2000L + i,
        new java.sql.Timestamp(driftHour + i * 1000), 2L, "type1",
        (i % 11) * 1.5)) ++
      // a source with NO baseline must be filtered, not scored
      (0 until 10).map(i => Event(3000L + i,
        new java.sql.Timestamp(driftHour + i * 1000), 3L, "unbaselined", 1.0))
    val ref: Map[String, Seq[(Long, Long)]] = sampleEvents.toDF()
      .groupBy(col("event_type"), EventStreams.valueBin(500.0).as("b"))
      .count()
      .collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(r => r.getLong(1) -> r.getLong(2)).toSeq }
    val stream = MemoryStream[Event]
    val query = EventStreams.keyedWindowedPsi(stream.toDF(), "event_type", ref)
      .writeStream.format("memory").queryName("kpsi_out")
      .outputMode("complete").start()
    try {
      stream.addData(drifted)
      query.processAllAvailable()
      val streamed = spark.table("kpsi_out")
        .orderBy("win_start", "source").collect().toSeq
      val batch = EventStreams.keyedWindowedPsi(drifted.toDF(), "event_type", ref)
        .orderBy("win_start", "source").collect().toSeq
      assert(streamed == batch, "stream/batch keyed-PSI divergence")
      assert(batch.nonEmpty)
      assert(!batch.exists(_.getAs[String]("source") == "unbaselined"),
        "a source without a trained baseline must not be scored")
      val driftWin = driftHour / 1000
      val atDrift = batch.filter(_.getAs[Long]("win_start") == driftWin)
        .map(r => r.getAs[String]("source") -> r.getAs[Double]("psi")).toMap
      assert(atDrift("type0") > 0.25, s"drifted source must alarm: $atDrift")
      assert(atDrift("type1") < 0.25,
        s"in-baseline source sharing the window must stay quiet: $atDrift")
    } finally query.stop()
  }

  test("watermark drops state for closed windows in append mode") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val query = EventStreams.windowedStats(stream.toDF(), watermark = "30 minutes")
      .writeStream.format("memory").queryName("wm_out")
      .outputMode("append").start()
    try {
      val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
      stream.addData((0 until 10).map(i =>
        Event(i.toLong, new java.sql.Timestamp(base + i * 60000L), 1L, "a", 1.0)))
      query.processAllAvailable()
      // advance event time far past watermark: hour-0 window closes + emits
      stream.addData(Seq(Event(99L,
        new java.sql.Timestamp(base + 3 * 3600 * 1000L), 1L, "a", 1.0)))
      query.processAllAvailable()
      val emitted = spark.table("wm_out").collect()
      assert(emitted.exists(_.getAs[Long]("win_start") ==
        java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime / 1000))
    } finally query.stop()
  }

  test("keyed PSI runs append-mode with a watermark: closed (window, " +
      "source) state emits and is evicted — the state bound is real") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val ref: Map[String, Seq[(Long, Long)]] = sampleEvents.toDF()
      .groupBy(col("event_type"), EventStreams.valueBin(500.0).as("b"))
      .count().collect()
      .groupBy(_.getString(0))
      .map { case (k, rs) => k -> rs.map(r => r.getLong(1) -> r.getLong(2)).toSeq }
    val stream = MemoryStream[Event]
    val query = EventStreams.keyedWindowedPsi(stream.toDF(), "event_type",
        ref, watermark = "30 minutes")
      .writeStream.format("memory").queryName("kpsi_append")
      .outputMode("append").start()
    try {
      stream.addData((0 until 20).map(i =>
        Event(i.toLong, new java.sql.Timestamp(base + i * 60000L), 1L,
          s"type${i % 2}", (i % 11) * 1.5)))
      query.processAllAvailable()
      // advance event time far past the watermark: hour-0 windows close,
      // BOTH sources' rows emit, and their state is dropped
      stream.addData(Seq(Event(99L,
        new java.sql.Timestamp(base + 3 * 3600 * 1000L), 1L, "type0", 1.0)))
      query.processAllAvailable()
      val emitted = spark.table("kpsi_append").collect()
      val hour0 = base / 1000
      val sources = emitted.filter(_.getAs[Long]("win_start") == hour0)
        .map(_.getAs[String]("source")).toSet
      assert(sources == Set("type0", "type1"),
        s"both sources' closed windows must emit: $emitted")
      val progress = query.lastProgress
      val stateRows = progress.stateOperators.apply(0).numRowsTotal
      // only the still-open far-future window's state may remain
      assert(stateRows <= 2, s"closed-window state must be evicted: $stateRows")
    } finally query.stop()
  }

  test("file-source stream: readStream over parquet dir matches batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-src")
    val events = sampleEvents.toDF()
    // two "arriving" files
    events.filter($"event_id" < 100).write.parquet(s"$dir/batch1")
    events.filter($"event_id" >= 100).write.parquet(s"$dir/batch2")
    val src = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/*")
    val query = EventStreams.windowedStats(src)
      .writeStream.format("memory").queryName("file_win")
      .outputMode("complete").start()
    try {
      query.processAllAvailable()
      val streamed = spark.table("file_win")
        .orderBy("win_start", "event_type").collect().toSeq
      val batch = EventStreams.windowedStats(events)
        .orderBy("win_start", "event_type").collect().toSeq
      assert(streamed == batch && batch.nonEmpty)
    } finally query.stop()
  }

  test("stream-stream interval join matches the batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[Event]
    val purchases = MemoryStream[Event]
    val cdf = clicks.toDF().withWatermark("ts", "1 hour")
      .select($"event_id".as("c_id"), $"user_id".as("c_user"), $"ts".as("c_ts"))
    val pdf = purchases.toDF().withWatermark("ts", "1 hour")
      .select($"event_id".as("p_id"), $"user_id".as("p_user"), $"ts".as("p_ts"))
    val joined = cdf.join(pdf,
      expr("c_user = p_user AND p_ts BETWEEN c_ts - INTERVAL 10 MINUTES AND c_ts"))
    val query = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    try {
      val all = sampleEvents
      val (cs, ps) = all.partition(_.event_id % 2 == 0)
      clicks.addData(cs); purchases.addData(ps)
      query.processAllAvailable()
      val streamed = spark.table("ssj_out")
        .select("c_id", "p_id").as[(Long, Long)].collect().toSet
      val batch = cs.toDF()
        .select($"event_id".as("c_id"), $"user_id".as("c_user"), $"ts".as("c_ts"))
        .join(ps.toDF().select($"event_id".as("p_id"), $"user_id".as("p_user"),
          $"ts".as("p_ts")),
          expr("c_user = p_user AND p_ts BETWEEN c_ts - INTERVAL 10 MINUTES AND c_ts"))
        .select("c_id", "p_id").as[(Long, Long)].collect().toSet
      assert(streamed == batch && batch.nonEmpty)
    } finally query.stop()
  }

  test("streaming exact dedup: watermarked dropDuplicates removes replays") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Event]
    val deduped = stream.toDF()
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
    val query = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      val events = sampleEvents.take(50)
      stream.addData(events)
      stream.addData(events.take(25)) // replayed duplicates
      query.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .as[Long].collect().sorted
      assert(ids.toSeq == events.map(_.event_id).sorted.toSeq)
    } finally query.stop()
  }

  test("streaming curation: stateless redact/split/quality matches batch") {
    import graft.ops.{Curation, TextFunctions}
    implicit val sqlCtx = spark.sqlContext
    def curate(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.select(col("doc_id"),
        Curation.redactPii(col("text")).as("clean"),
        Curation.splitAssign(col("doc_id")).as("split"),
        round(TextFunctions.qualityScore(col("text")), 6).as("q"))
    val docs = (0 until 60).map(i =>
      (i.toLong, s"the a of doc $i mail user$i@example.com from 10.0.0.$i end"))
    val stream = MemoryStream[(Long, String)]
    val query = curate(stream.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("curate_out")
      .outputMode("append").start()
    try {
      stream.addData(docs)
      query.processAllAvailable()
      val got = spark.table("curate_out")
        .as[(Long, String, String, Double)].collect().sortBy(_._1)
      val want = curate(docs.toDF("doc_id", "text"))
        .as[(Long, String, String, Double)].collect().sortBy(_._1)
      assert(got.toSeq == want.toSeq)
      assert(got.forall(r => !r._2.contains("@") && r._2.contains("<EMAIL>")))
    } finally query.stop()
  }

  test("parquet sink: restart from checkpoint neither drops nor replays rows") {
    implicit val sqlCtx = spark.sqlContext
    val outDir = warehouse.resolve("stream_sink").toString
    val ckpt = warehouse.resolve("stream_ckpt").toString
    val stream = MemoryStream[Event]
    def start() = stream.toDF()
      .withColumn("hour", date_trunc("hour", col("ts")))
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", ckpt)
      .outputMode("append").start()
    // batch 1, then STOP and restart a NEW query on the same checkpoint —
    // recovery is where a broken sink re-commits batch 0 (the duplicate
    // risk the checkpoint exists to prevent); a single continuous run
    // can't exercise it
    val q1 = start()
    try { stream.addData(sampleEvents.take(80)); q1.processAllAvailable() }
    finally q1.stop()
    val q2 = start()
    try { stream.addData(sampleEvents.drop(80)); q2.processAllAvailable() }
    finally q2.stop()
    val got = spark.read.parquet(outDir)
    assert(got.count() == sampleEvents.size)
    assert(got.select("event_id").as[Long].collect().sorted.toSeq ==
      sampleEvents.map(_.event_id).sorted.toSeq)
    assert(got.select("event_id").distinct().count() == sampleEvents.size)
  }

  test("stateful sessionization: stream output matches batch sessionizer") {
    implicit val sqlCtx = spark.sqlContext
    val events = sampleEvents
    val stream = MemoryStream[Event]
    val query = EventStreams.sessionizeStream(stream.toDS(), gapSec = 300)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      stream.addData(events)
      // force sessions to close: one far-future event per user
      val far = java.sql.Timestamp.valueOf("2024-06-01 00:00:00")
      stream.addData((0 until 5).map(u => Event(9000L + u, far, u.toLong, "x", 0.0)))
      query.processAllAvailable()
      val streamed = spark.table("sess_out")
        .select("user_id", "session_start", "session_end", "n_events", "total_value")
        .orderBy("user_id", "session_start")
        .collect().toSeq
      val batch = EventStreams.sessionizeBatch(events.toDF(), gapSec = 300)
        .orderBy("user_id", "session_start")
        .collect().toSeq
      assert(streamed == batch, s"stream=${streamed.take(3)} batch=${batch.take(3)}")
      assert(batch.nonEmpty)
    } finally query.stop()
  }

  test("hourly anomaly screen over streaming window output equals the " +
      "batch screen — the monitoring pipeline end to end") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    // ten 1-event hours + one 12-event spike hour for one type
    val base = (0 until 10).map(h => Event(h.toLong,
      Timestamp.valueOf(f"2024-01-01 0$h%02d:15:00"), 1L, "x", 1.0))
    val spike = (0 until 12).map(m => Event(100L + m,
      Timestamp.valueOf(f"2024-01-01 11:$m%02d:00"), 1L, "x", 1.0))
    val stream = MemoryStream[Event]
    val counts = stream.toDS().toDF()
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("window.start").as("hour"), col("n"))
    val query = counts.writeStream.format("memory")
      .queryName("anom_counts").outputMode("complete").start()
    try {
      stream.addData(base ++ spike); query.processAllAvailable()
      // score the STREAMED hourly counts with the same closed-form stats
      // the batch op derives internally (localCheckpoint: the self-join
      // of one memory-sink plan otherwise trips reference dedup)
      val hourly = spark.table("anom_counts").localCheckpoint()
      val stats = hourly.groupBy(col("event_type")).agg(
        count(lit(1)).as("h"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("ss"))
      val z = hourly.join(stats, Seq("event_type"))
        .withColumn("z", when(col("h") >= 2 &&
          (col("ss").cast("double") - col("s").cast("double") *
            col("s") / col("h")) / (col("h") - 1) > 0,
          round((col("n") - col("s").cast("double") / col("h")) /
            sqrt((col("ss").cast("double") - col("s").cast("double") *
              col("s") / col("h")) / (col("h") - 1)), 6)))
        .select(col("event_type"), col("hour"), col("n"), col("z"),
          coalesce(abs(col("z")) > 2.0, lit(false)).as("is_anomaly"))
        .collect().map(r => r.getTimestamp(1) ->
          ((r.getLong(2), r.getAs[Double]("z"),
            r.getAs[Boolean]("is_anomaly")))).toMap
      val batch = graft.ops.Profiling.hourlyAnomaly(
          (base ++ spike).toDF(), "event_type", "ts")
        .collect().map(r => r.getTimestamp(1) ->
          ((r.getLong(2), r.getAs[Double]("z"),
            r.getAs[Boolean]("is_anomaly")))).toMap
      assert(z == batch)
      assert(z.values.count(_._3) == 1)
    } finally query.stop()
  }

  test("stream-static enrichment join: streaming events joined to a batch " +
      "dimension match the batch join — the production enrichment shape") {
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    def ev(id: Long, u: Long, v: Double) = Event(id,
      Timestamp.valueOf("2024-01-01 00:00:01"), u, "purchase", v)
    val feed = Seq(ev(1, 1, 10.0), ev(2, 2, 5.0), ev(3, 3, 1.0), ev(4, 1, 2.5))
    val stream = MemoryStream[Event]
    // left join keeps un-enrichable events (user 3) — the shape a
    // pipeline needs to never silently drop facts on a stale dimension
    val enriched = stream.toDS().toDF()
      .join(dim, Seq("user_id"), "left")
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
    val query = enriched.writeStream.format("memory")
      .queryName("enrich_out").outputMode("complete").start()
    try {
      stream.addData(feed); query.processAllAvailable()
      val streamed = spark.table("enrich_out").collect()
        .map(r => Option(r.getString(0)).getOrElse("-") ->
          ((r.getLong(1), r.getDouble(2)))).toMap
      val batch = feed.toDF().join(dim, Seq("user_id"), "left")
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
        .collect().map(r => Option(r.getString(0)).getOrElse("-") ->
          ((r.getLong(1), r.getDouble(2)))).toMap
      assert(streamed == batch)
      assert(streamed("gold") == ((2L, 12.5)) && streamed("-") == ((1L, 1.0)))
    } finally query.stop()
  }

  test("sequence-pattern stream: matches equal the batch automaton even " +
      "when a pattern straddles the trigger boundary") {
    implicit val sqlCtx = spark.sqlContext
    def ev(id: Long, u: Long, t: String, sec: Int) = Event(id,
      java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d"), u, t, 1.0)
    val feed = Seq(
      ev(1, 1, "view", 1), ev(2, 1, "click", 2), ev(3, 1, "purchase", 3),
      ev(4, 2, "view", 1), ev(5, 2, "click", 2), ev(6, 2, "error", 3),
      ev(7, 2, "purchase", 4),
      ev(8, 3, "view", 1), ev(9, 3, "click", 2),  // continues in trigger 2
      ev(10, 4, "purchase", 1))
    val feed2 = Seq(ev(11, 3, "purchase", 3), ev(12, 4, "view", 2))
    val stream = MemoryStream[Event]
    val query = EventStreams.patternStream(stream.toDS())
      .writeStream.format("memory").queryName("pattern_out")
      .outputMode("append").start()
    try {
      stream.addData(feed); query.processAllAvailable()
      stream.addData(feed2); query.processAllAvailable()
      val streamed = spark.table("pattern_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val batch = graft.ops.SequencePatterns.threeStageWithVeto(
          (feed ++ feed2).toDF(), "user_id", "event_id", "ts", "event_type",
          "view", "click", "purchase", "error")
        .select(col("user_id"), unix_micros(col("v_ts")),
          unix_micros(col("c_ts")), unix_micros(col("p_ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      // user 1 matches inside trigger 1; user 3's pattern STRADDLES the
      // boundary (view/click in t1, purchase in t2 — state must carry);
      // user 2 is vetoed; user 4's purchase precedes any view
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      assert(streamed.map(_._1) == Set(1L, 3L))
    } finally query.stop()
  }

  test("sequence-pattern stream: microsecond-precision timestamps keep " +
      "stream ≡ batch — ordering ties inside one millisecond and the " +
      "emitted v_ts/c_ts carry full micros") {
    implicit val sqlCtx = spark.sqlContext
    def evm(id: Long, u: Long, t: String, frac: String) = Event(id,
      java.sql.Timestamp.valueOf(s"2024-01-01 00:00:01.$frac"), u, t, 1.0)
    // all three events share millisecond 01.000; the view (event_id 2)
    // precedes the click (event_id 1) ONLY at micro precision — a
    // millis-truncating stream would sort by event_id, see the click
    // before any view, and emit nothing
    val feed = Seq(
      evm(2, 1, "view", "000100"), evm(1, 1, "click", "000900"),
      evm(3, 1, "purchase", "000950"))
    val stream = MemoryStream[Event]
    val query = EventStreams.patternStream(stream.toDS())
      .writeStream.format("memory").queryName("pattern_micro_out")
      .outputMode("append").start()
    try {
      stream.addData(feed); query.processAllAvailable()
      val streamed = spark.table("pattern_micro_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      val batch = graft.ops.SequencePatterns.threeStageWithVeto(
          feed.toDF(), "user_id", "event_id", "ts", "event_type",
          "view", "click", "purchase", "error")
        .select(col("user_id"), unix_micros(col("v_ts")),
          unix_micros(col("c_ts")), unix_micros(col("p_ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(streamed == batch, s"stream=$streamed batch=$batch")
      assert(streamed.nonEmpty, "the micro-ordered pattern must match")
      // the emitted values carry the sub-millisecond component
      assert(streamed.head._2 % 1000L == 100L)
    } finally query.stop()
  }

  test("decayed scores: final stream state reproduces the batch operator, " +
      "including an out-of-order straggler trigger") {
    implicit val sqlCtx = spark.sqlContext
    val events = sampleEvents
    val stream = MemoryStream[Event]
    val query = EventStreams.decayedScoresStream(stream.toDS(), halfLifeDays = 30.0)
      .writeStream.format("memory").queryName("decay_out")
      .outputMode("update").start()
    try {
      // trigger 1: the NEWER half; trigger 2: the older half — the state
      // must fold stragglers in place without moving its reference
      val (older, newer) = events.splitAt(events.size / 2)
      stream.addData(newer); query.processAllAvailable()
      stream.addData(older); query.processAllAvailable()
      val streamed = spark.table("decay_out")
        .groupBy(col("user_id"))
        .agg(max_by(
          struct(col("n_events"), col("last_seen_us"), col("score_at_last")),
          col("n_events")).as("s"))
        .select(col("user_id"), col("s.n_events").as("n_events"),
          col("s.last_seen_us").as("last_seen_us"),
          col("s.score_at_last").as("score_at_last"))
        .orderBy("user_id").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
        .toMap
      val batch = graft.ops.Curation.timeDecayedScores(
          events.toDF(), "user_id", "ts", "value", halfLifeDays = 30.0)
        .orderBy("user_id").collect()
        .map(r => r.getAs[Long]("user_id") -> ((r.getAs[Long]("n_events"),
          r.getAs[Long]("last_seen_us"), r.getAs[Double]("decay_score"))))
        .toMap
      assert(streamed.keySet == batch.keySet)
      val globalT = batch.values.map(_._2).max
      val lambdaUs = math.log(2.0) / (86400e6 * 30.0)
      streamed.foreach { case (u, (n, last, scoreAtLast)) =>
        val (bn, blast, bscore) = batch(u)
        assert(n == bn && last == blast, s"user $u counts/ts")
        // decay the user's final state to the corpus-wide reference the
        // batch op uses; fp orders differ (online fold vs decimal sum)
        val atGlobal = scoreAtLast * math.exp(-lambdaUs * (globalT - last).toDouble)
        assert(math.abs(atGlobal - bscore) < 1e-6,
          s"user $u: stream→$atGlobal batch=$bscore")
      }
    } finally query.stop()
  }

  test("stateful user histories: final stream state matches the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val events = sampleEvents
    val stream = MemoryStream[Event]
    val query = EventStreams.userHistoriesStream(stream.toDS(), maxLen = 10)
      .writeStream.format("memory").queryName("hist_out")
      .outputMode("update").start()
    try {
      // two triggers, split mid-stream: the buffer must merge across them
      val (first, second) = events.splitAt(events.size / 2)
      stream.addData(first); query.processAllAvailable()
      stream.addData(second); query.processAllAvailable()
      // Update mode re-emits a row per (trigger, active user): the final
      // snapshot per user is the one with the greatest (last_ts,
      // n_events) — monotone across triggers for this in-order feed, and
      // independent of memory-sink row order
      val streamed = spark.table("hist_out")
        .groupBy(col("user_id"))
        .agg(max_by(
          struct(col("n_events"), col("first_ts"), col("last_ts"), col("history")),
          struct(col("last_ts"), col("n_events"))).as("s"))
        .select(col("user_id"), col("s.n_events").as("n_events"),
          col("s.first_ts").as("first_ts"), col("s.last_ts").as("last_ts"),
          array_join(col("s.history"), "|").as("h"))
        .orderBy("user_id").collect().toSeq
      val batch = graft.ops.Curation.userHistories(
          events.toDF(), "user_id", "ts", "event_id", "event_type", maxLen = 10)
        .select(col("user_id"), col("n_events"), col("first_ts"),
          col("last_ts"), array_join(col("history"), "|").as("h"))
        .orderBy("user_id").collect().toSeq
      assert(streamed == batch, s"stream=${streamed.take(2)} batch=${batch.take(2)}")
      assert(batch.nonEmpty && batch.forall(_.getLong(1) <= 10))
    } finally query.stop()
  }

  test("linearAttribution: equal split inside the window, stale touches " +
      "excluded, touchless conversions go direct") {
    val t0 = java.sql.Timestamp.valueOf("2024-01-02 12:00:00").getTime
    def ts(offMin: Long) = new java.sql.Timestamp(t0 + offMin * 60000L)
    val events = Seq(
      // user 1: purchase 10.0 with one view + one click in-window, plus
      // a view 25h earlier that must NOT share credit
      Event(1L, ts(-60), 1L, "view", 0.0),
      Event(2L, ts(-30), 1L, "click", 0.0),
      Event(3L, ts(-25 * 60), 1L, "view", 0.0),
      Event(4L, ts(0), 1L, "purchase", 10.0),
      // user 2: touchless purchase → direct
      Event(5L, ts(0), 2L, "purchase", 7.0),
      // user 3's view must not credit user 2's purchase
      Event(6L, ts(-10), 3L, "view", 0.0)).toDF()
    val got = EventStreams.linearAttribution(events, "purchase",
        Seq("view", "click"), windowHours = 24)
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("click", 1L, 5.0), ("direct", 1L, 7.0),
      ("view", 1L, 5.0)))
  }

  test("rollup stream: final state equals the batch incremental rollup; " +
      "delete-to-zero removes state") {
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.CdcEvent
    val batch1 = Seq(CdcEvent("I", "a", 10.5), CdcEvent("I", "a", 2.25),
      CdcEvent("I", "b", 7.0), CdcEvent("I", "c", 1.0))
    val batch2 = Seq(CdcEvent("I", "a", 4.75), CdcEvent("D", "c", 1.0),
      CdcEvent("D", "b", 7.0), CdcEvent("I", "d", 9.0))
    val stream = MemoryStream[CdcEvent]
    val query = EventStreams.rollupStream(stream.toDS())
      .writeStream.format("memory").queryName("rollup_out")
      .outputMode("update").start()
    try {
      stream.addData(batch1); query.processAllAvailable()
      stream.addData(batch2); query.processAllAvailable()
      // last emission per key; zero-count keys are tombstones
      val streamed = spark.table("rollup_out")
        .groupBy(col("key"))
        .agg(last(col("cnt")).as("cnt"), last(col("total")).as("total"))
        .collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val live = streamed.filter(_._2._1 > 0)
      import spark.implicits._
      val base = Seq.empty[(String, Long, Double)].toDF("key", "cnt", "total")
      val batch = graft.ops.Mutations.incrementalRollup(
          base, (batch1 ++ batch2).toDF("op", "key", "value"),
          "key", "op", "value")
        .select(col("key"), col("cnt"), col("total").cast("double"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(live.keySet == batch.keySet && live.keySet == Set("a", "d"))
      live.foreach { case (k, (c, t)) =>
        assert(c == batch(k)._1 && math.abs(t - batch(k)._2) < 1e-9, k) }
      // b and c were fully deleted: their final emission is the tombstone
      assert(streamed("b") == ((0L, 0.0)) && streamed("c") == ((0L, 0.0)))
    } finally query.stop()
  }
}
