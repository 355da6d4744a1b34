package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{CdcEvent, Event}

/** Streaming soak: drive the five stateful streaming twins
  * (q51 sessionize / q111 user histories / q134 decayed scores /
  * q160 rollup tombstone / q164 sequence pattern) over the 10×-scale
  * event corpus (1M events, 15k users) split across many triggers, and
  * record the STATE-STORE numbers that pin the per-key state claims:
  * `numRowsTotal` must track live keys (≈ user count — O(1) or
  * O(maxLen) per key, NOT per event), and `memoryUsedBytes` must stay
  * flat across triggers once every key has been seen. Results land in
  * BASELINE.md, the receipts for claims the gate's small feeds can't
  * measure.
  *
  * `SOAK_DIR` (default `target/sf0.1x10`), `SOAK_TRIGGERS` (default 10).
  * The rollup feed derives a CDC stream from the events (one insert per
  * event keyed by user), then a final trigger deletes HALF the users to
  * zero — the tombstone path must shrink the state store, which is the
  * round-10 state-size-bound contract measured instead of asserted.
  */
object StreamSoak {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val dir = sys.env.getOrElse("SOAK_DIR", "target/sf0.1x10")
    val nTriggers = sys.env.getOrElse("SOAK_TRIGGERS", "10").toInt

    val events: Array[Event] = graft.queries.Tables.events(spark, dir)
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[Event].collect()
    println(s"SOAK corpus: ${events.length} events, " +
      s"${events.map(_.user_id).distinct.length} users, $nTriggers triggers")
    val chunks = events.grouped(
      math.max(1, (events.length + nTriggers - 1) / nTriggers)).toSeq

    /** Run one streaming op over the chunked feed; report per-trigger
      * state rows/bytes and total wall seconds. */
    def soak[I, O](label: String, feed: Seq[Seq[I]])(
        start: MemoryStream[I] => StreamingQuery)(
        implicit enc: org.apache.spark.sql.Encoder[I]): Unit = {
      val stream = MemoryStream[I]
      val t0 = System.nanoTime()
      val q = start(stream)
      val stateTrace = Seq.newBuilder[(Long, Long)]
      try {
        feed.foreach { chunk =>
          stream.addData(chunk)
          q.processAllAvailable()
          val so = Option(q.lastProgress).toSeq.flatMap(_.stateOperators)
          if (so.nonEmpty)
            stateTrace += ((so.map(_.numRowsTotal).sum,
              so.map(_.memoryUsedBytes).sum))
        }
      } finally q.stop()
      val sec = (System.nanoTime() - t0) / 1e9
      val trace = stateTrace.result()
      val rows = trace.map(_._1)
      println(f"SOAK $label%-22s $sec%8.2f s  stateRows[first=${rows.head}" +
        f" max=${rows.max} last=${rows.last}]" +
        f" stateMB[max=${trace.map(_._2).max / 1e6}%.1f last=${trace.last._2 / 1e6}%.1f]")
    }

    def q(name: String)(ds: org.apache.spark.sql.Dataset[_],
        mode: String): StreamingQuery =
      ds.writeStream.format("noop").queryName(name).outputMode(mode).start()

    val evChunks = chunks.map(_.toSeq)
    soak[Event, Unit]("sessionize_q51", evChunks)(s =>
      q("soak_sess")(EventStreams.sessionizeStream(s.toDS()), "append"))
    soak[Event, Unit]("user_hist_q111", evChunks)(s =>
      q("soak_hist")(EventStreams.userHistoriesStream(s.toDS(), maxLen = 20),
        "update"))
    soak[Event, Unit]("decay_q134", evChunks)(s =>
      q("soak_decay")(EventStreams.decayedScoresStream(s.toDS(),
        halfLifeDays = 30.0), "update"))
    soak[Event, Unit]("pattern_q164", evChunks)(s =>
      q("soak_pat")(EventStreams.patternStream(s.toDS()), "append"))

    // windowed PSI monitor (q193): state = OPEN WINDOWS (count + ten bin
    // sums each), never events — the drift alarm's state receipt
    val refBins = graft.queries.Tables.events(spark, dir)
      .filter(org.apache.spark.sql.functions.col("value").isNotNull)
      .groupBy(EventStreams.valueBin(500.0).as("b")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
    soak[Event, Unit]("win_psi_q193", evChunks)(s =>
      q("soak_psi")(EventStreams.windowedPsi(s.toDS().toDF(), refBins),
        "append"))

    // CDC feed: one insert per event keyed by user; final trigger deletes
    // half the users back to zero — state rows must DROP (tombstones)
    val inserts = chunks.map(_.map(e =>
      CdcEvent("I", e.user_id.toString, e.value)).toSeq)
    val byUser = events.groupBy(_.user_id)
    val deletes = byUser.filterKeys(_ % 2 == 0).toSeq.flatMap { case (u, es) =>
      es.map(e => CdcEvent("D", u.toString, e.value))
    }
    soak[CdcEvent, Unit]("rollup_q160", inserts :+ deletes)(s =>
      q("soak_roll")(EventStreams.rollupStream(s.toDS()), "update"))

    spark.stop()
    sys.exit(0)
  }
}
