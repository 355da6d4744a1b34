package graft

import org.apache.spark.sql.functions._

import graft.ops.Curation

/** Properties of the curation operators beyond what the oracle gate pins:
  * redaction completeness/idempotence, split/sample determinism and rates,
  * distributed-prefix-sum equivalence to a single-partition scan, packing
  * contiguity, replication cardinality, and decontamination planting. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("redactPii removes every PII match and is idempotent") {
    val df = Seq(
      "mail bob.smith+x@foo.co.uk then ip 10.0.3.7 then 555-123-4567 done",
      "no pii here at all",
      "double a@b.io c@d.org and 1.2.3.4 5.6.7.8").toDF("t")
      .withColumn("r", Curation.redactPii(col("t")))
    val left = df.select(
      sum(Curation.emailCount(col("r"))) +
        sum(Curation.ipv4Count(col("r"))) +
        sum(Curation.phoneCount(col("r")))).as[Long].head()
    assert(left == 0, s"PII left after redaction: $left")
    val notIdempotent = df
      .filter(Curation.redactPii(col("r")) =!= col("r")).count()
    assert(notIdempotent == 0)
    val r = df.filter(col("t").startsWith("mail")).select("r").as[String].head()
    assert(r == "mail <EMAIL> then ip <IP> then <PHONE> done")
  }

  test("splitAssign is deterministic and near the 98/1/1 target") {
    val ids = spark.range(20000).toDF("id")
    val counts = ids.select(Curation.splitAssign(col("id")).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts("train") > 19000 && counts("val") > 50 && counts("test") > 50)
    assert(counts.values.sum == 20000)
    // same id always lands in the same split, independent of partitioning
    val a = ids.repartition(7).select(col("id"), Curation.splitAssign(col("id")).as("s"))
    val b = ids.repartition(3).select(col("id"), Curation.splitAssign(col("id")).as("s2"))
    assert(a.join(b, "id").filter(col("s") =!= col("s2")).count() == 0)
  }

  test("sampleKeep hits the requested rate within tolerance") {
    val n = spark.range(50000).toDF("id")
      .filter(Curation.sampleKeep(col("id"), lit(250000))).count()
    assert(math.abs(n - 12500) < 800, s"kept $n of 50000 at 25%")
  }

  test("exclusivePrefixSum equals the single-partition window scan") {
    // non-uniform ord values (quadratic gaps) exercise uneven buckets
    val df = spark.range(5000).toDF("i")
      .select((col("i") * col("i") % 100003).as("ord"), (col("i") % 97).as("v"))
      .groupBy("ord").agg(sum("v").as("v")) // make ord a key
    val got = Curation.exclusivePrefixSum(df, "ord", "v", "ps")
    val w = org.apache.spark.sql.expressions.Window.orderBy("ord")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val want = df.withColumn("ps2", coalesce(sum("v").over(w), lit(0L)))
    assert(got.join(want, "ord").filter(col("ps") =!= col("ps2")).count() == 0)
    assert(got.count() == df.count())
  }

  test("exclusivePrefixSumUniform (literal bounds) equals the percentile-" +
      "bucketed form, including values outside the declared range") {
    val df = spark.range(5000).toDF("i")
      .select((col("i") * col("i") % 100003).as("ord"), (col("i") % 97).as("v"))
      .groupBy("ord").agg(sum("v").as("v"))
    val got = Curation.exclusivePrefixSumUniform(
      df, "ord", "ord", "v", "ps", 0.0, 100003.0)
    val want = Curation.exclusivePrefixSum(df, "ord", "v", "ps2")
    assert(got.join(want, "ord").filter(col("ps") =!= col("ps2")).count() == 0)
    assert(got.count() == df.count())
    // a deliberately WRONG range only skews buckets, never values
    val off = Curation.exclusivePrefixSumUniform(
      df, "ord", "ord", "v", "ps", 50000.0, 60000.0)
    assert(off.join(want, "ord").filter(col("ps") =!= col("ps2")).count() == 0)
  }

  test("epochShardAssign: permutation, exact balance, determinism, seeds differ") {
    val ids = spark.range(1000).toDF("id")
    val got = Curation.epochShardAssign(ids, "id", seed = 7L, numShards = 16)
      .cache()
    // under round-robin, rank = pos*S + shard: recovering 0..N-1 exactly
    // proves (shard, pos) is a bijection over the whole input
    val ranks = got.select((col("pos") * 16 + col("shard")).as("r"))
      .orderBy("r").select("r").collect().map(_.getLong(0))
    assert(ranks.toSeq == (0L until 1000L), "ranks are not a permutation")
    // round-robin balance is exact: 1000 = 16*62 + 8 → 8 shards of 63
    val sizes = got.groupBy("shard").count()
      .select("count").collect().map(_.getLong(0))
    assert(sizes.max - sizes.min <= 1, s"unbalanced: ${sizes.toSeq}")
    assert(sizes.sum == 1000 && sizes.length == 16)
    // per-shard positions are contiguous from 0
    val posOk = got.groupBy("shard")
      .agg(min("pos").as("mn"), max("pos").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1).count()
    assert(posOk == 0, "per-shard positions are not contiguous")
    // same seed → identical assignment; different seed → different order
    val again = Curation.epochShardAssign(ids, "id", seed = 7L, numShards = 16)
    assert(got.join(again, Seq("id"))
      .filter(got("shard") =!= again("shard") || got("pos") =!= again("pos"))
      .count() == 0)
    val other = Curation.epochShardAssign(ids, "id", seed = 8L, numShards = 16)
    assert(got.join(other, Seq("id"))
      .filter(got("shard") =!= other("shard") || got("pos") =!= other("pos"))
      .count() > 0, "seed does not change the permutation")
    got.unpersist()
  }

  test("epochShardAssign: numShards=1 degenerates to the pure shuffle order") {
    val got = Curation.epochShardAssign(
        spark.range(100).toDF("id"), "id", seed = 3L, numShards = 1)
      .cache()
    assert(got.filter(col("shard") =!= 0).count() == 0)
    // pos order equals (key-prefix, id) order
    val byPos = got.orderBy("pos").select("shuffle_key").collect()
      .map(_.getString(0))
    assert(byPos.toSeq == byPos.toSeq.sorted, "pos does not follow key order")
    got.unpersist()
  }

  test("packSequences bins are contiguous in id order and budget-aligned") {
    val docs = spark.range(2000).toDF("id")
      .select(col("id"), (col("id") % 300 + 10).as("tok"))
    val packed = Curation.packSequences(docs, "id", "tok", 4096L)
    val bins = packed.groupBy("bin")
      .agg(min("id").as("lo"), max("id").as("hi"), sum("tok").as("tot"))
      .orderBy("bin").as[(Long, Long, Long, Long)].collect()
    // contiguity: bin i's ids all precede bin i+1's
    bins.sliding(2).foreach {
      case Array((_, _, hi, _), (_, lo, _, _)) => assert(hi < lo)
      case _ =>
    }
    // streaming packing: every bin's token sum stays under budget + one doc
    val maxTok = 309L
    bins.dropRight(1).foreach { case (b, _, _, tot) =>
      assert(tot <= 4096 + maxTok, s"bin $b overflows: $tot") }
    assert(bins.map(_._4).sum == docs.agg(sum("tok")).as[Long].head())
  }

  test("replicate emits exactly weight copies with copy index") {
    val df = Seq(("a", 1), ("b", 3), ("c", 2)).toDF("k", "w")
    val out = Curation.replicate(df, col("w"))
    assert(out.count() == 6)
    // weight 0 (the floor of a fractional epoch) must drop the row, not
    // emit the descending-sequence [1, 0] pair
    val zeroes = Curation.replicate(
      Seq(("a", 0), ("b", 2), ("c", -3)).toDF("k", "w"), col("w"))
    assert(zeroes.select("k").as[String].collect().toSeq.sorted == Seq("b", "b"))
    assert(out.filter(col("k") === "b").agg(max("copy")).as[Int].head() == 3)
    assert(out.filter(col("k") === "b").agg(countDistinct("copy")).as[Long].head() == 3)
  }

  test("curation SQL functions are registered via the extension") {
    val r = spark.sql(
      "SELECT graft_redact_pii('a@b.io and 1.2.3.4') AS r, graft_split(42) AS s, " +
        "graft_zvalue(3, 1) AS z").as[(String, String, Long)].head()
    assert(r._1 == "<EMAIL> and <IP>")
    assert(Set("train", "val", "test").contains(r._2))
    // z(3,1) = x bits 11 at even positions, y bit 1 at odd position 1: 0b0111
    assert(r._3 == 7L)
    // the raw-Catalyst SQL builders must agree with the Column forms
    val ids = spark.range(2000).toDF("id")
    ids.createOrReplaceTempView("__ids")
    val viaSql = spark.sql(
      "SELECT id, graft_split(id) AS s, graft_zvalue(id, id + 7) AS z FROM __ids")
    val viaCol = ids.select(col("id"),
      Curation.splitAssign(col("id")).as("s2"),
      graft.ops.ZOrder.zValue(col("id"), col("id") + 7, 16).as("z2"))
    val diff = viaSql.join(viaCol, "id")
      .filter(col("s") =!= col("s2") || col("z") =!= col("z2")).count()
    assert(diff == 0)
  }

  test("empty inputs: bucketed scans and curation ops return empty, not errors") {
    val emptyDocs = Seq.empty[(Long, Long)].toDF("id", "v")
    assert(Curation.exclusivePrefixSum(emptyDocs, "id", "v", "ps").count() == 0)
    assert(Curation.packSequences(emptyDocs, "id", "v", 100L).count() == 0)
    assert(Curation.replicate(emptyDocs, lit(3)).count() == 0)
    val emptyXY = Seq.empty[(Long, Double, Double)].toDF("id", "x", "y")
    assert(graft.ops.Skyline.skyline2Min(emptyXY, "x", "y").count() == 0)
    assert(graft.ops.ZOrder.quantize(emptyXY, "x", "cell").count() == 0)
    val emptyText = Seq.empty[(Long, String)].toDF("id", "text")
    assert(graft.ops.Dedup.minhashNearDupPairs(emptyText, "id", "text").count() == 0)
  }

  test("weightedSampleTopK: exact k per stratum, no replacement, weight bias") {
    val rows = (1L to 200L).map(i =>
      (i, if (i <= 100) "a" else "b", if (i == 7L) 1000000000L else 10L))
    val df = rows.toDF("id", "grp", "w")
    val got = Curation.weightedSampleTopK(df, "id", "grp", col("w"), k = 5)
      .select("grp", "id").as[(String, Long)].collect()
    assert(got.count(_._1 == "a") == 5 && got.count(_._1 == "b") == 5)
    assert(got.map(_._2).distinct.length == 10, "without replacement")
    // a weight 8 orders of magnitude above its peers is (for any of the
    // 1e6 possible u draws) certain to be selected
    assert(got.exists(_._2 == 7L), "overwhelming weight must win a slot")
    // deterministic across invocations; different salt → different draw
    val again = Curation.weightedSampleTopK(df, "id", "grp", col("w"), 5)
      .select("grp", "id").as[(String, Long)].collect()
    assert(got.sorted.toSeq == again.sorted.toSeq)
    val other = Curation.weightedSampleTopK(df, "id", "grp", col("w"), 5, "s2")
      .select("grp", "id").as[(String, Long)].collect()
    assert(other.sorted.toSeq != got.sorted.toSeq)
  }

  test("lengthGroupedBatches: full batches, length-sorted, exact waste, tie-safe") {
    // many duplicate token counts exercise the non-distinct order path
    val rows = (1L to 100L).map(i => (i, (i % 10) + 1))
    val got = Curation.lengthGroupedBatches(rows.toDF("id", "tok"), "id", "tok", 16)
      .orderBy("batch").collect()
    assert(got.map(_.getLong(1)).sum == 100)
    assert(got.dropRight(1).forall(_.getLong(1) == 16), "all but last batch full")
    // batches tile the sorted token sequence: each batch's max <= next's min
    got.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(3) <= b.getLong(2),
        s"batch overlap: ${a.getLong(3)} > ${b.getLong(2)}")
      case _ =>
    }
    // waste equals the hand-computed padding over the globally sorted list
    val sorted = rows.map(_._2).sorted
    val expectWaste = sorted.grouped(16)
      .map(g => g.max * g.size - g.sum).sum
    assert(got.map(_.getLong(5)).sum == expectWaste)
  }

  test("userHistories truncates to the most recent maxLen, oldest-first") {
    val ev = (1L to 30L).map(i =>
      (7L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1000 + i)),
        i, s"e$i")) :+
      (8L, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(5)), 99L, "solo")
    val df = ev.toDF("user_id", "ts", "event_id", "event_type")
    val got = Curation.userHistories(df, "user_id", "ts", "event_id",
        "event_type", maxLen = 10)
      .orderBy("user_id").collect()
    val u7 = got(0)
    assert(u7.getLong(1) == 10, "kept exactly maxLen")
    val hist = u7.getSeq[String](4)
    // most recent 10 of 30 events, in chronological order
    assert(hist.map(_.split(":")(1)).toSeq == (21 to 30).map(i => s"e$i"))
    assert(u7.getLong(2) == 1021L * 1000000 && u7.getLong(3) == 1030L * 1000000)
    val u8 = got(1)
    assert(u8.getLong(1) == 1 && u8.getSeq[String](4) == Seq("5000000:solo"))
  }

  test("contaminatedIds flags planted overlap only") {
    val bench = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val corpus = Seq(
      (10L, "intro words then the quick brown fox jumps over it ends"),
      (11L, "completely different vocabulary with zero shared phrases here"),
      (12L, "quick brown fox appears but only four gram not five")).toDF("id", "text")
    val flagged = Curation.contaminatedIds(corpus, bench, "id", "text", k = 5)
      .as[Long].collect().toSet
    assert(flagged == Set(10L), s"flagged=$flagged")
  }

  test("temperatureMixtureSample: quota law, maximality, determinism, T limits") {
    import spark.implicits._
    // three sources with very different token masses: big=10k docs of 100
    // tokens, mid=1k of 100, small=100 of 100 → shares 0.9009/0.0901/0.009
    val docs = ((1L to 10000L).map(i => (i, "big", 100L)) ++
      (20001L to 21000L).map(i => (i, "mid", 100L)) ++
      (30001L to 30100L).map(i => (i, "small", 100L)))
      .toDF("id", "src", "tok")
    val budget = 100000L

    def quotasFor(t: Double): Map[String, Long] = {
      val byToks = Map("big" -> 1000000.0, "mid" -> 100000.0, "small" -> 10000.0)
      val tot = byToks.values.sum
      val w = byToks.map { case (s, v) => s -> math.pow(v / tot, 1.0 / t) }
      val ws = w.values.sum
      w.map { case (s, v) =>
        s -> math.floor(budget.toDouble *
          BigDecimal(v / ws).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong }
    }

    for (t <- Seq(0.7, 1.0, 4.0)) {
      val sampled = Curation.temperatureMixtureSample(
        docs, "id", "src", "tok", budget, t)
      val sums = sampled.groupBy("src").agg(
          org.apache.spark.sql.functions.sum("tok").as("s"),
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val quota = quotasFor(t)
      for ((s, (toks, _)) <- sums)
        assert(toks <= quota(s), s"T=$t source $s: $toks > quota ${quota(s)}")
      // maximality: one more 100-token doc would overflow (unless the
      // source is exhausted — quota above its total mass)
      val totals = Map("big" -> 1000000L, "mid" -> 100000L, "small" -> 10000L)
      for ((s, q) <- quota) {
        val got = sums.get(s).map(_._1).getOrElse(0L)
        assert(got == math.min((q / 100L) * 100L, totals(s)),
          s"T=$t source $s: admitted $got of quota $q (total ${totals(s)})")
      }
      // determinism: bit-identical id sets across runs
      val ids1 = sampled.select("id").as[Long].collect().sorted.toSeq
      val ids2 = Curation.temperatureMixtureSample(
          docs, "id", "src", "tok", budget, t)
        .select("id").as[Long].collect().sorted.toSeq
      assert(ids1 == ids2, s"T=$t nondeterministic sample")
    }
    // T=1 keeps natural proportions; large T flattens toward uniform
    val q1 = quotasFor(1.0); val q4 = quotasFor(4.0)
    assert(math.abs(q1("big") - 90090L) < 100 && math.abs(q1("small") - 900L) < 100)
    assert(q4("small") > 15000L, s"T=4 should upsample small: ${q4("small")}")
    // budget covering everything returns the corpus unchanged
    assert(Curation.temperatureMixtureSample(
      docs, "id", "src", "tok", 10000000L, 1.0).count() == docs.count())
  }

  test("timeDecayedScores: closed form — zero age keeps full value, one " +
      "half-life halves, contributions sum") {
    val df = Seq(
      (1L, "2024-01-31 00:00:00", 10.0),  // at the reference → weight 1
      (2L, "2024-01-01 00:00:00", 8.0),   // exactly one 30d half-life → 4
      (2L, "2024-01-31 00:00:00", 1.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Curation.timeDecayedScores(df, "user_id", "ts", "value", 30.0)
      .orderBy("user_id").collect()
    assert(got(0).getAs[Long]("n_events") == 1L)
    assert(math.abs(got(0).getAs[Double]("decay_score") - 10.0) < 1e-9)
    assert(got(1).getAs[Long]("n_events") == 2L)
    assert(math.abs(got(1).getAs[Double]("decay_score") - 5.0) < 1e-9)
    // last_seen is the user's own newest event in epoch µs
    assert(got(1).getAs[Long]("last_seen_us") ==
      got(0).getAs[Long]("last_seen_us"))
  }

  test("timeDecayedScores: reference point is corpus-wide, not per user") {
    // user 2's only event is 30 days older than user 1's — with a GLOBAL
    // reference its weight must decay, though it is the user's newest
    val df = Seq(
      (1L, "2024-01-31 00:00:00", 6.0),
      (2L, "2024-01-01 00:00:00", 6.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", to_timestamp(col("ts_s")))
    val got = Curation.timeDecayedScores(df, "user_id", "ts", "value", 30.0)
      .orderBy("user_id").collect()
    assert(math.abs(got(0).getAs[Double]("decay_score") - 6.0) < 1e-9)
    assert(math.abs(got(1).getAs[Double]("decay_score") - 3.0) < 1e-9)
  }

  test("sourceCapInterleave: cap binds per source, pos is a round-robin " +
      "permutation, and the layout is partitioning-invariant") {
    val df = (Seq.tabulate(5)(i => (i.toLong, "A")) ++
      Seq.tabulate(3)(i => (100L + i, "B")) ++ Seq((200L, "C")))
      .toDF("doc_id", "source")
    val got = Curation.sourceCapInterleave(df, "doc_id", "source", k = 2, seed = 3L)
      .orderBy("pos").collect()
    // kept: min(2,5)+min(2,3)+min(2,1) = 5; pos is 0..4 with no gaps
    assert(got.map(_.getAs[Long]("pos")).toSeq == (0L until 5L))
    // round-robin: ALL sources' rank-1 docs come before any rank-2 doc,
    // source-name-ordered within the round
    assert(got.take(3).map(r =>
      (r.getAs[Long]("rk"), r.getAs[String]("source"))).toSeq ==
      Seq((1L, "A"), (1L, "B"), (1L, "C")))
    assert(got.drop(3).forall(_.getAs[Long]("rk") == 2L))
    // survivors are the seeded-shuffle winners, not ingest order: same
    // result under a different physical partitioning
    val re = Curation.sourceCapInterleave(
      df.repartition(7), "doc_id", "source", k = 2, seed = 3L)
      .orderBy("pos").collect()
    assert(re.map(_.toSeq).toSeq == got.map(_.toSeq).toSeq)
  }

  test("spanCorruptionPlan: one in-bounds span per full block, partial " +
      "blocks host none, rate lands near 15%, reruns identically") {
    val docs = Seq(
      (1L, Seq.fill(45)("tok").mkString(" ")),   // 2 full blocks + 5
      (2L, Seq.fill(19)("tok").mkString(" ")),   // no full block
      (3L, Seq.fill(2000)("tok").mkString(" "))) // 100 blocks
      .toDF("doc_id", "text")
    val got = Curation.spanCorruptionPlan(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.count(_._1 == 1L) == 2 && !got.exists(_._1 == 2L) &&
      got.count(_._1 == 3L) == 100)
    got.foreach { case (_, block, start, len) =>
      assert(len >= 2 && len <= 4, s"len $len")
      val off = start - block * 20
      assert(off >= 0 && off + len <= 20,
        s"span [$start, +$len) escapes block $block")
    }
    // expected corruption = 3/20 = 15%; 100 draws land close
    val rate = got.filter(_._1 == 3L).map(_._4).sum / 2000.0
    assert(rate > 0.12 && rate < 0.18, s"corruption rate $rate")
    val again = Curation.spanCorruptionPlan(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(again.sorted.toSeq == got.sorted.toSeq)
  }

  test("kAnonymity: combinations under k are flagged, counts exact") {
    val df = (Seq.fill(6)(("en", "web")) ++ Seq.fill(2)(("de", "web")))
      .toDF("lang", "src")
    val got = Curation.kAnonymity(df,
        Seq("lang" -> col("lang"), "src" -> col("src")), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(got == Set(("en", 6L, true), ("de", 2L, false)))
  }

  test("logisticTrainHashed: learns a separable signal to AUC 1, pulls " +
      "the class tokens' buckets apart, and reruns identically") {
    // 'alpha' → bucket 23, 'omega' → 22, 'common' → 58 (no collisions)
    val docs = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, "alpha alpha alpha common", true)
      else (i.toLong, "omega omega omega common", false)
    }.toDF("doc_id", "text", "y")
    val w = Curation.logisticTrainHashed(docs, "doc_id", "text", col("y"),
      iters = 3, lr = 4.0)
    val wm = w.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(wm.size == 64)
    assert(wm(23L) > 0.0 && wm(22L) < 0.0,
      s"alpha/omega weights must separate: ${wm(23L)} / ${wm(22L)}")
    // the shared token carries no signal: its gradient cancels (up to
    // the 12-dp pinning of the sigmoid's symmetric halves)
    assert(math.abs(wm(58L)) < 1e-9, s"common-token weight ${wm(58L)}")
    val scored = Curation.logisticApplyHashed(docs, "doc_id", "text",
      col("y"), w)
    val auc = graft.ops.Profiling.rocAuc(scored, "z", "y")
      .collect()(0).getAs[Double]("auc")
    assert(auc == 1.0, s"separable corpus must reach AUC 1, got $auc")
    // bit-identical rerun (the whole loop is pinned arithmetic)
    val w2 = Curation.logisticTrainHashed(docs, "doc_id", "text", col("y"),
      iters = 3, lr = 4.0).collect().map(_.toSeq).toSeq
    assert(w2 == w.collect().map(_.toSeq).toSeq)
  }

  test("logisticTrainHashed: unlabeled docs neither train nor count in " +
      "the gradient normalizer (the invariant the q191 oracle mirrors)") {
    val labeled = (0 until 20).map { i =>
      if (i % 2 == 0) (i.toLong, "alpha alpha common", Some(true))
      else (i.toLong, "omega omega common", Some(false))
    }
    val withNulls = labeled ++ Seq(
      (100L, "alpha omega noise", Option.empty[Boolean]),
      (101L, "common common common", Option.empty[Boolean]))
    val clean = Curation.logisticTrainHashed(
        labeled.toDF("doc_id", "text", "y"), "doc_id", "text", col("y"))
      .collect().map(_.toSeq).toSeq
    val noisy = Curation.logisticTrainHashed(
        withNulls.toDF("doc_id", "text", "y"), "doc_id", "text", col("y"))
      .collect().map(_.toSeq).toSeq
    assert(clean == noisy,
      "null-label docs must be invisible to training — weights AND nDocs")
  }
}
