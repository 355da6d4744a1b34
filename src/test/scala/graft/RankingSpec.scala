package graft

import org.apache.spark.sql.functions._

import graft.ops.{Profiling, Resolution, TextRanking}

/** Laws for the round-5 operator families: BM25 / reciprocal rank fusion
  * / negative sampling ([[TextRanking]]), blocked fuzzy matching and
  * triangle counting ([[Resolution]]), and single-pass profiling
  * ([[Profiling]]). */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tiny = Seq(
    (0L, "apple apple apple pie"),
    (1L, "apple pie"),
    (2L, "banana split"),
    (3L, "pie crust pie")).toDF("doc_id", "text")

  test("bm25 matches the hand-computed Okapi formula on a tiny corpus") {
    val got = TextRanking.bm25(tiny, "doc_id", "text", Seq("apple"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // N=4, sumdl=11, avgdl=2.75; df(apple)=2; idf=ln(1+(4-2+0.5)/(2+0.5))=ln(2)
    def okapi(tf: Long, dl: Long): Double =
      math.log(1.0 + (4 - 2 + 0.5) / (2 + 0.5)) *
        (tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / 2.75)))
    assert(got.keySet === Set(0L, 1L))
    assert(math.abs(got(0L) - okapi(3, 4)) < 1e-12)
    assert(math.abs(got(1L) - okapi(1, 2)) < 1e-12)
  }

  test("bm25: rarer terms out-score common terms at equal tf/dl") {
    // "banana" df=1 vs "pie" df=3; doc 2 holds banana, docs 0/1/3 hold pie
    val banana = TextRanking.bm25(tiny, "doc_id", "text", Seq("banana"))
      .collect().head.getDouble(1)
    val pie = TextRanking.bm25(tiny, "doc_id", "text", Seq("pie"))
      .filter(s"doc_id = 1").collect().head.getDouble(1)
    assert(banana > pie, s"idf discrimination: $banana should beat $pie")
  }

  test("topTerms: rare terms outrank common ones; k and df-scope honored") {
    // "apple" df=2, "pie" df=3, "banana"/"split" df=1
    val got = TextRanking.topTerms(tiny, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.count(_._1 == 2L) == 2)
    // doc 2's rarest terms rank above nothing else; doc 0: apple (tf 3,
    // df 2) must beat pie (tf 1, df 3)
    assert(got.filter(_._1 == 0L).sortBy(_._2).map(_._3).toSeq ==
      Seq("apple", "pie"))
    // ubiquitous terms score ln(N/df)=ln(1)=0 when df=N
    val all4 = Seq((0L, "x"), (1L, "x"), (2L, "x"), (3L, "x")).toDF("doc_id", "text")
    val z = TextRanking.topTerms(all4, "doc_id", "text", 1).collect()
    assert(z.forall(_.getDouble(3) == 0.0))
  }

  test("rankTopN truncates to n with dense 1-based ranks in score order") {
    val scored = Seq((1L, 3.0), (2L, 9.0), (3L, 5.0), (4L, 9.0))
      .toDF("id", "score")
    val got = TextRanking.rankTopN(scored, "id", "score", 3)
      .orderBy(col("rank")).collect().map(r => (r.getLong(2), r.getLong(0)))
    // ties (ids 2,4 at 9.0) break on id; rank column is (rank, id)
    assert(got.toSeq === Seq((1L, 2L), (2L, 4L), (3L, 3L)))
  }

  test("rrf: an item in both lists beats an item in one at the same rank") {
    val l1 = Seq((10L, 1L), (11L, 2L)).toDF("id", "rank")
    val l2 = Seq((11L, 1L), (12L, 2L)).toDF("id", "rank")
    val got = TextRanking.reciprocalRankFusion(Seq(l1, l2), "id", "rank")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(got(11L)._2 === 2L)
    assert(math.abs(got(11L)._1 - (1.0 / 62 + 1.0 / 61)) < 1e-15)
    assert(math.abs(got(10L)._1 - 1.0 / 61) < 1e-15)
    assert(got(11L)._1 > got(10L)._1 && got(11L)._1 > got(12L)._1)
  }

  test("negativeSample: k per query, positive excluded, deterministic") {
    val corpus = spark.range(0, 50).select(col("id").as("doc_id"))
    val qs = Seq(3L, 7L).toDF("qid")
    val a = TextRanking.negativeSample(corpus, "doc_id", qs, "qid", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = TextRanking.negativeSample(corpus, "doc_id", qs, "qid", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.toSeq === b.toSeq)
    assert(a.count(_._1 == 3L) === 4 && a.count(_._1 == 7L) === 4)
    assert(!a.exists(t => t._1 === t._3), "query id must not be its own negative")
    // a different salt draws a different sample
    val c = TextRanking.negativeSample(corpus, "doc_id", qs, "qid", 4, "neg2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(c.toSeq !== a.toSeq)
  }

  test("blockedFuzzyPairs recovers planted mutants and honors window/maxDist") {
    val recs = Seq(
      (1L, "alpha centauri"), (2L, "alpha centaurx"),   // dist 1, same block
      (3L, "alpha delta"),                              // dist > 2 from both
      (4L, "gamma ray"), (5L, "gamma rat")).toDF("rec_id", "name")
    val pairs = Resolution.blockedFuzzyPairs(recs, "rec_id", "name",
        substring(col("name"), 1, 4), window = 5, maxDist = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    assert(pairs.map(t => (t._1, t._2)).toSet === Set((1L, 2L), (5L, 4L)))
    assert(pairs.forall(_._3 <= 2))
    // window = 0 is rejected; maxDist 0 keeps only exact duplicates
    intercept[IllegalArgumentException] {
      Resolution.blockedFuzzyPairs(recs, "rec_id", "name", col("name"), 0, 2)
    }
    val exact = Resolution.blockedFuzzyPairs(
      recs.unionByName(Seq((6L, "gamma ray")).toDF("rec_id", "name")),
      "rec_id", "name", substring(col("name"), 1, 4), 5, 0)
    assert(exact.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((4L, 6L)))
  }

  test("blockedFuzzyPairs misses cross-block matches (documented recall loss)") {
    val recs = Seq((1L, "abcd x"), (2L, "zbcd x")).toDF("rec_id", "name")
    val got = Resolution.blockedFuzzyPairs(recs, "rec_id", "name",
      substring(col("name"), 1, 4), 5, 2)
    assert(got.count() === 0, "first-char mutation crosses prefix blocks")
  }

  test("multiPassFuzzyPairs: orthogonal keys recover what one pass misses") {
    val recs = Seq(
      (1L, "alpha beta"), (2L, "zlpha beta"),   // first-char mutant
      (3L, "gamma rho"), (4L, "gamma rhx"),     // last-char mutant
      (5L, "unrelated thing")).toDF("rec_id", "name")
    val prefix = substring(col("name"), 1, 4)
    val tail = col("name").substr(lit(2), length(col("name")))
    def pairs(ks: Seq[org.apache.spark.sql.Column]) =
      Resolution.multiPassFuzzyPairs(recs, "rec_id", "name", ks, 5, 2)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs(Seq(prefix)) === Set((3L, 4L)), "prefix alone misses first-char")
    assert(pairs(Seq(tail)) === Set((1L, 2L)), "tail alone misses last-char")
    assert(pairs(Seq(prefix, tail)) === Set((1L, 2L), (3L, 4L)))
    // dedup law: a pair found by both passes appears once with its dist
    val dup = Seq((1L, "same name"), (2L, "same name")).toDF("rec_id", "name")
    val got = Resolution.multiPassFuzzyPairs(dup, "rec_id", "name",
      Seq(prefix, tail), 5, 2).collect()
    assert(got.length == 1 && got.head.getLong(4) == 0L)
  }

  test("triangleStats: K4, path, and edge normalization") {
    val k4 = (for { a <- 1 to 4; b <- 1 to 4 if a < b } yield (a.toLong, b.toLong))
      .toDF("src", "dst")
    val k4row = Resolution.triangleStats(k4, "src", "dst").collect().head
    assert((k4row.getLong(0), k4row.getLong(1), k4row.getLong(2),
      k4row.getLong(3), k4row.getDouble(4)) === ((4L, 6L, 12L, 4L, 1.0)))
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    assert(Resolution.triangleStats(path, "src", "dst")
      .collect().head.getLong(3) === 0L)
    // duplicates, reversals, self-loops collapse before counting
    val messy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (1L, 3L), (3L, 3L))
      .toDF("src", "dst")
    val m = Resolution.triangleStats(messy, "src", "dst").collect().head
    assert((m.getLong(1), m.getLong(3)) === ((3L, 1L)))
  }

  test("degree-ordered triangle orientation counts identically to id order") {
    // hub graph: star center 1 + triangle (2,3,4) + chord through the hub
    val hub = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L), (1L, 6L),
      (2L, 3L), (3L, 4L), (2L, 4L)).toDF("src", "dst")
    val a = Resolution.triangleStatsIdOrdered(hub, "src", "dst").collect().head
    val b = Resolution.triangleStatsDegreeOrdered(hub, "src", "dst").collect().head
    assert(a == b, s"id=$a degree=$b")
    // random graphs: both orientations agree on every census field
    val rnd = new scala.util.Random(7)
    val edges = (1 to 120).map(_ => (rnd.nextInt(15).toLong, rnd.nextInt(15).toLong))
      .filter(t => t._1 != t._2).toDF("src", "dst")
    val ra = Resolution.triangleStatsIdOrdered(edges, "src", "dst").collect().head
    val rb = Resolution.triangleStatsDegreeOrdered(edges, "src", "dst").collect().head
    assert(ra == rb, s"id=$ra degree=$rb")
    // the default now IS the degree-ordered path
    val d = Resolution.triangleStats(hub, "src", "dst").collect().head
    assert(d == b, s"default=$d degree=$b")
  }

  test("schemaDiff reports adds/removes/retypes/nullability and nothing else") {
    import org.apache.spark.sql.types._
    val before = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("gone", StringType),
      StructField("widened", IntegerType),
      StructField("loosened", StringType, nullable = false),
      StructField("same", DoubleType)))
    val after = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("widened", LongType),
      StructField("loosened", StringType, nullable = true),
      StructField("same", DoubleType),
      StructField("fresh", DateType)))
    val got = Profiling.schemaDiff(spark, before, after)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got === Set(("fresh", "added"), ("gone", "removed"),
      ("widened", "retyped"), ("loosened", "renullabled")))
    assert(Profiling.schemaDiff(spark, before, before).count() == 0)
  }

  test("profile: exact nulls/distincts and native-type min/max in one pass") {
    val df = Seq[(java.lang.Long, String)]((9L, "b"), (10L, null), (null, "a"),
      (10L, "a")).toDF("num", "str")
    val got = Profiling.profile(df, Seq("num", "str"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    // native numeric min/max: 9 < 10 even though "10" < "9" lexically
    assert(got("num") === ((4L, 1L, 2L, "9", "10")))
    assert(got("str") === ((4L, 1L, 2L, "a", "b")))
  }

  test("vocabCoverageCurve: closed-form cuts, tie-invariant cumulative, " +
      "k beyond vocab emits nothing") {
    // counts: a=4, b=2, c=2, d=1 (total 9); ties b/c at ranks 2-3
    val docs = Seq((1L, "a a b c d"), (2L, "a a b c"))
      .toDF("doc_id", "text")
    val got = graft.ops.TextRanking
      .vocabCoverageCurve(docs, "doc_id", "text", Seq(1, 2, 3, 4, 9))
      .orderBy("k").collect()
      .map(r => (r.getAs[Long]("k"),
        (r.getAs[Long]("cum_tokens"), r.getAs[Double]("coverage")))).toMap
    assert(got(1L) == ((4L, 4.0 / 9)))
    // rank-2 cut inside the b/c tie group: cumulative is 6 either way
    assert(got(2L) == ((6L, 6.0 / 9)))
    assert(got(3L) == ((8L, 8.0 / 9)))
    assert(got(4L) == ((9L, 1.0)))
    // k=9 exceeds the 4-term vocabulary: no row on either engine
    assert(got.size == 4)
  }

  test("robustOutliers: hand-computed median/MAD, zero-MAD and even-count " +
      "interpolation edge groups") {
    val df = (Seq(1, 2, 3, 4, 100).map(("a", _)) ++
      Seq(5, 5, 5).map(("b", _)) ++ Seq(1, 2).map(("c", _)))
      .toDF("k", "v").withColumn("v", col("v").cast("double"))
    val got = Profiling.robustOutliers(df, "k", "v").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4)))).toMap
    // a: med 3, absdevs {2,1,0,1,97}, MAD 1, cutoff 4.4478 → only 97 flags
    assert(got("a") == ((5L, 3.0, 1.0, 1L)))
    // b: constant group → MAD 0, threshold 0, absdev 0 is NOT > 0 → clean
    assert(got("b") == ((3L, 5.0, 0.0, 0L)))
    // c: even count → interpolated median 1.5, MAD 0.5, nothing flags
    assert(got("c") == ((2L, 1.5, 0.5, 0L)))
  }

  test("calibrateScores: exact percent-rank with id tiebreak and " +
      "closed-form z from exact sums") {
    val df = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
      (4L, "b", 5L), (5L, "b", 7L)).toDF("id", "g", "v")
    val got = Profiling.calibrateScores(df, "id", "g", "v")
      .orderBy("id").collect()
      .map(r => (r.getAs[Double]("pr"), r.getAs[Double]("z")))
    // a: mean 20, sample sd 10 → z −1, 0, 1; pr 0, .5, 1
    assert(got(0) == ((0.0, -1.0)) && got(1) == ((0.5, 0.0)) &&
      got(2) == ((1.0, 1.0)))
    // b: mean 6, sd √2 → z = ∓1/√2 rounded to 6 dp
    assert(got(3) == ((0.0, -0.707107)) && got(4) == ((1.0, 0.707107)))
  }

  test("hourlyAnomaly: a planted volume spike flags, baseline hours don't") {
    val base = (0 until 10).map(h =>
      (s"2024-01-01 0$h:15:00".take(19), "x"))
    val spike = (0 until 12).map(m => (f"2024-01-01 11:$m%02d:00", "x"))
    val df = (base ++ spike).toDF("t", "event_type")
      .withColumn("ts", col("t").cast("timestamp"))
    val got = Profiling.hourlyAnomaly(df, "event_type", "ts")
      .orderBy("hour").collect()
    assert(got.length == 11)
    // counts: ten 1s + one 12 → mean 2, sample var 11; z(12) ≈ 3.015
    assert(got.count(_.getAs[Boolean]("is_anomaly")) == 1)
    val flagged = got.filter(_.getAs[Boolean]("is_anomaly")).head
    assert(flagged.getAs[Long]("n") == 12L)
    assert(math.abs(flagged.getAs[Double]("z") - 3.015113) < 1e-6)
  }

  test("hourlyAnomaly: a perfectly steady (or single-hour) series yields " +
      "null z and NO anomalies — never NaN that flags everything") {
    // variance 0 → the old 0/0 NaN compared greater than the cutoff and
    // flagged every hour of a flat series
    val flat = (0 until 6).map(h => (s"2024-01-01 0$h:15:00", "steady")) :+
      (("2024-01-01 00:30:00", "single"))
    val df = flat.toDF("t", "event_type")
      .withColumn("ts", col("t").cast("timestamp"))
    val got = Profiling.hourlyAnomaly(df, "event_type", "ts").collect()
    assert(got.length == 7)
    assert(got.forall(!_.getAs[Boolean]("is_anomaly")))
    assert(got.forall(_.isNullAt(got.head.fieldIndex("z"))))
  }

  test("jsonKeyProfile: per-key counts/distincts/min-max over heterogeneous " +
      "JSON objects; null and malformed rows drop cleanly") {
    val df = Seq(
      """{"a": 1, "b": "x"}""",
      """{"a": 2}""",
      """{"b": "y", "c": true}""",
      null,
      "not json at all").toDF("j")
    val got = graft.ops.Profiling.jsonKeyProfile(df, "j")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(got("a") == ((2L, 2L, "1", "2")))
    assert(got("b") == ((2L, 2L, "x", "y")))
    assert(got("c") == ((1L, 1L, "true", "true")))
    assert(got.size == 3)
  }

  test("mrrMapAtK: hand-computed MRR/AP, zero-hit rr, empty-pool NULL ap") {
    // q1: rel at ranks 2 and 4 of 5, pool R=3  → rr = 1/2,
    //     ap = (1/2 + 2/4) / min(3,5) = 1/3
    // q2: no relevant retrieved, pool R=1      → rr = 0, ap = 0
    // q3: pool empty                           → rr = 0, ap = NULL
    val ranked = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (1L, 13L, 4L), (1L, 14L, 5L),
      (2L, 20L, 1L), (2L, 21L, 2L),
      (3L, 30L, 1L)).toDF("qid", "id", "rank")
    val jd = Seq(
      (1L, 11L, 2L), (1L, 13L, 3L), (1L, 99L, 2L),
      (2L, 98L, 2L),
      (3L, 30L, 1L)).toDF("qid", "id", "grade")
    val got = TextRanking.mrrMapAtK(ranked, jd, "qid", "id", "rank",
        "grade", k = 5, relMin = 2)
      .orderBy("qid").collect()
    assert(got(0).getAs[Long]("hits") == 2L)
    assert(got(0).getAs[Long]("first_rel_rank") == 2L)
    assert(math.abs(got(0).getAs[Double]("rr") - 0.5) < 1e-9)
    assert(math.abs(got(0).getAs[Double]("ap") - 1.0 / 3) < 1e-6)
    assert(got(1).getAs[Long]("hits") == 0L)
    assert(got(1).isNullAt(got(1).fieldIndex("first_rel_rank")))
    assert(got(1).getAs[Double]("rr") == 0.0)
    assert(got(1).getAs[Double]("ap") == 0.0)
    // grade-1 judgment is below relMin=2: pool empty → ap undefined
    assert(got(2).getAs[Double]("rr") == 0.0)
    assert(got(2).isNullAt(got(2).fieldIndex("ap")))
  }

  test("mrrMapAtK: a perfect front-loaded list scores rr = ap = 1") {
    val ranked = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L))
      .toDF("qid", "id", "rank")
    val jd = Seq((1L, 10L, 3L), (1L, 11L, 2L)).toDF("qid", "id", "grade")
    val got = TextRanking.mrrMapAtK(ranked, jd, "qid", "id", "rank",
      "grade", k = 3, relMin = 2).collect()(0)
    assert(got.getAs[Double]("rr") == 1.0)
    assert(got.getAs[Double]("ap") == 1.0)
  }

  test("cohensKappa: perfect agreement is 1, constant raters undefined, " +
      "and majority-label inflation is corrected") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("a", "a")).toDF("ra", "rb")
    val g1 = Profiling.cohensKappa(perfect, "ra", "rb").collect()(0)
    assert(g1.getAs[Double]("po") == 1.0 &&
      g1.getAs[Double]("kappa") == 1.0)
    // both raters constant: pe = 1 → kappa undefined (NULL), never NaN
    val const = Seq(("x", "x"), ("x", "x")).toDF("ra", "rb")
    val g2 = Profiling.cohensKappa(const, "ra", "rb").collect()(0)
    assert(g2.isNullAt(g2.fieldIndex("kappa")))
    // 90% raw agreement driven by a shared majority label: kappa must
    // land far below the raw rate (chance-corrected)
    val skew = (Seq.fill(9)(("maj", "maj")) :+ (("min", "maj")))
      .toDF("ra", "rb")
    val g3 = Profiling.cohensKappa(skew, "ra", "rb").collect()(0)
    assert(g3.getAs[Double]("po") == 0.9)
    assert(g3.getAs[Double]("kappa") < 0.1,
      s"kappa ${g3.getAs[Double]("kappa")} not chance-corrected")
  }

  test("rocAuc: perfect separation 1, reversed 0, ties midranked, " +
      "single-class NULL") {
    def auc(rows: Seq[(Double, Boolean)]): Option[Double] = {
      val r = Profiling.rocAuc(rows.toDF("s", "y"), "s", "y").collect()(0)
      if (r.isNullAt(r.fieldIndex("auc"))) None
      else Some(r.getAs[Double]("auc"))
    }
    assert(auc(Seq((3.0, true), (2.0, true), (1.0, false))).contains(1.0))
    assert(auc(Seq((1.0, true), (2.0, false))).contains(0.0))
    // all scores equal → every pos/neg pair is a tie → 0.5 exactly
    assert(auc(Seq((1.0, true), (1.0, false), (1.0, false))).contains(0.5))
    // pos {2,1}, neg {1,3}: wins 1, ties 0.5 of 4 pairs → 0.375
    assert(auc(Seq((2.0, true), (1.0, true), (1.0, false), (3.0, false)))
      .contains(0.375))
    assert(auc(Seq((1.0, true), (2.0, true))).isEmpty) // no negatives
    // fully-null input survives the whole device: one row of NULLs
    val empty = Profiling.rocAuc(
      Seq((Option.empty[Double], Option.empty[Boolean])).toDF("s", "y"),
      "s", "y").collect()(0)
    assert(empty.isNullAt(0) && empty.isNullAt(1) && empty.isNullAt(2))
  }

  test("calibrationError: per-bin stats and the count-weighted ECE " +
      "match hand computation") {
    // bin 9: 4 rows at conf .95, 3 positive → gap .2
    // bin 1: 1 row at conf .15, 0 positive → gap .15
    val rows = (Seq.fill(3)((0.95, true)) :+ ((0.95, false))) :+ ((0.15, false))
    val got = Profiling.calibrationError(rows.toDF("p", "y"), "p", "y")
      .orderBy("bin").collect()
    assert(got.length == 2)
    assert(got(0).getAs[Long]("bin") == 1L &&
      got(0).getAs[Double]("gap") == 0.15)
    assert(got(1).getAs[Long]("bin") == 9L &&
      math.abs(got(1).getAs[Double]("avg_conf") - 0.95) < 1e-9 &&
      math.abs(got(1).getAs[Double]("frac_pos") - 0.75) < 1e-9 &&
      math.abs(got(1).getAs[Double]("gap") - 0.2) < 1e-9)
    // ece = (4·0.2 + 1·0.15)/5 = 0.19, identical on every row
    assert(got.forall(r => math.abs(r.getAs[Double]("ece") - 0.19) < 1e-9))
    // score exactly 1.0 clamps into bin 9, not a phantom bin 10
    val edge = Profiling.calibrationError(
      Seq((1.0, true)).toDF("p", "y"), "p", "y").collect()(0)
    assert(edge.getAs[Long]("bin") == 9L)
  }

  test("psi: a group matching the population scores 0; a shifted " +
      "group alarms") {
    val stable = (1 to 100).flatMap(i =>
      Seq(("a", (i % 10) / 10.0 + 0.05), ("b", (i % 10) / 10.0 + 0.05)))
    val g0 = Profiling.psi(stable.toDF("src", "s"), "src", "s")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("psi")).toMap
    // both groups ARE the population: p = q per bin (10.5/105 = 21/210),
    // so the smoothing cancels and PSI is exactly 0
    assert(g0("a") == 0.0 && g0("b") == 0.0, g0.toString)
    val shifted = stable ++ (1 to 200).map(_ => ("c", 0.95))
    val g1 = Profiling.psi(shifted.toDF("src", "s"), "src", "s")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("psi")).toMap
    assert(g1("a") == g1("b"), "identical groups must score identically")
    assert(g1("c") > 0.25, s"point-mass group must alarm: ${g1("c")}")
    // the point-mass group is further from the (polluted) population
    // than the uniform groups it polluted
    assert(g1("c") > g1("a"), g1.toString)
  }

  test("calibrateScores: degenerate groups (n = 1 or zero spread) emit " +
      "null z, not NaN/Infinity") {
    val df = Seq((1L, "solo", 10L), (2L, "flat", 5L), (3L, "flat", 5L),
      (4L, "ok", 1L), (5L, "ok", 3L)).toDF("id", "g", "v")
    val got = Profiling.calibrateScores(df, "id", "g", "v")
      .orderBy("id").collect()
    assert(got(0).isNullAt(got(0).fieldIndex("z")))          // n = 1
    assert(got(1).isNullAt(got(1).fieldIndex("z")))          // variance 0
    assert(got(2).isNullAt(got(2).fieldIndex("z")))
    assert(math.abs(got(3).getAs[Double]("z") + 0.707107) < 1e-6)
  }

  test("calibrationError scans its input exactly once (r11 advisory: " +
      "the per-bin aggregate was referenced three times unpersisted)") {
    val acc = spark.sparkContext.longAccumulator("rows_scanned")
    val src = spark.createDataset(1 to 1000)
      .map { i => acc.add(1); (i / 1000.0, i % 2 == 0) }
      .toDF("p", "y")
    Profiling.calibrationError(src, "p", "y")
    // the op materializes internally; one corpus pass means the mapper
    // ran once per row — the pre-fix plan read 3000 here
    assert(acc.value == 1000L, s"expected 1 scan (1000 rows), saw ${acc.value}")
  }

  test("psi densifies over ALL ten deciles: globally-empty bins keep " +
      "their symmetric pseudo-count terms (windowedPsi's convention)") {
    // only bins 0 and 9 are globally present; the eight empty deciles
    // must still contribute (p-q)·ln(p/q) with p = 0.5/(ns+5),
    // q = 0.5/(N+5) — the pre-fix plan dropped them while both
    // denominators still added the full +5.0
    val rows = Seq.fill(30)(("a", 0.05)) ++ Seq.fill(70)(("b", 0.95))
    val got = Profiling.psi(rows.toDF("src", "s"), "src", "s")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("psi")).toMap
    def r(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    def expect(ns: Long, cnt: Map[Int, Long]): Double = {
      val terms = (0 to 9).map { b =>
        val p = (cnt.getOrElse(b, 0L) + 0.5) / (ns + 5.0)
        val q = (Map(0 -> 30L, 9 -> 70L).getOrElse(b, 0L) + 0.5) / 105.0
        BigDecimal(r((p - q) * math.log(p / q), 12))
      }
      r(terms.sum.toDouble, 6)
    }
    assert(got("a") == expect(30, Map(0 -> 30L)), got.toString)
    assert(got("b") == expect(70, Map(9 -> 70L)), got.toString)
  }
}
