package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity, TextFunctions}

/** Semantics of the dedup / similarity / text operator families, including
  * the approximate ops the DuckDB gate can't oracle (recall vs brute force).
  */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet").cache()
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()

  test("exact dedup removes injected duplicates, keeps originals") {
    val dupes = docs.filter($"doc_id" % 5 === 0)
      .withColumn("doc_id", $"doc_id" + 1000000L)
    val corpus = docs.unionByName(dupes)
    val deduped = Dedup.exactDedup(corpus, "doc_id", "text")
    assert(deduped.count() == docs.count())
    // the kept id is always the original (minimum) one
    assert(deduped.filter($"doc_id" >= 1000000L).count() == 0)
    // idempotent
    assert(Dedup.exactDedup(deduped, "doc_id", "text").count() == deduped.count())
  }

  test("exactSubstringDedup: later copies of shared spans removed, global first kept") {
    val a = (1 to 10).map(i => s"a$i").mkString(" ")
    val shared = (3 to 8).map(i => s"a$i").mkString(" ")
    val b = s"b1 b2 $shared b3 b4"          // holds a 6-token copy of doc 1
    val c = "x1 x2 x3 x4 z x1 x2 x3 x4"     // repeats its own 4-gram
    val short = "s1 s2"                     // under k, untouched
    val df = Seq((1L, a), (2L, b), (3L, c), (4L, short)).toDF("doc_id", "text")
    val got = Dedup.exactSubstringDedup(df, "doc_id", "text", k = 4)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(got(0) == ((1L, 0L, a)))                          // first occurrence keeps all
    assert(got(1) == ((2L, 6L, "b1 b2 b3 b4")))              // shared span excised
    assert(got(2) == ((3L, 4L, "x1 x2 x3 x4 z")))            // intra-doc repeat excised
    assert(got(3) == ((4L, 0L, short)))
  }

  test("exactSubstringDedup: overlapping duplicated grams merge into one span") {
    // doc 2 copies a 5-token span of doc 1: two overlapping 4-grams whose
    // expanded [pos, pos+4) index sets union to exactly 5 positions
    val a = "p1 p2 p3 p4 p5 p6 p7"
    val b = "q1 p2 p3 p4 p5 p6 q2"
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val got = Dedup.exactSubstringDedup(df, "doc_id", "text", k = 4)
      .orderBy($"doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(got(0) == ((1L, 0L, a)))
    assert(got(1) == ((2L, 5L, "q1 q2")))
  }

  test("charEntropy: closed-form values, degenerate text scores 0") {
    val rows = Seq((1L, "aaaa"), (2L, "ab"), (3L, "aabb"), (4L, "abcd"))
      .toDF("id", "t")
      .select($"id", TextFunctions.charEntropy($"t").as("h"))
      .orderBy($"id").collect().map(_.getDouble(1))
    assert(math.abs(rows(0) - 0.0) < 1e-12)           // single symbol
    assert(math.abs(rows(1) - math.log(2)) < 1e-9)     // two equiprobable
    assert(math.abs(rows(2) - math.log(2)) < 1e-9)     // counts not positions
    assert(math.abs(rows(3) - math.log(4)) < 1e-9)     // uniform over 4
    // entropy never exceeds ln(distinct chars); real docs land inside
    val bound = docs.select(TextFunctions.charEntropy($"text").as("h"),
        TextFunctions.distinctCharCount($"text").as("d"))
      .filter($"h" > log($"d".cast("double")) + lit(1e-9))
    assert(bound.count() == 0)
  }

  test("charEntropy: the codegen'd one-pass expression is BIT-identical " +
      "to the composable HOF spec on real docs (incl. null and edge text)") {
    val edge = Seq((9000001L, null.asInstanceOf[String]), (9000002L, ""),
      (9000003L, " leading and trailing  "), (9000004L, "ü¶ mixed ¶ü"))
      .toDF("doc_id", "text")
    val both = docs.select($"doc_id", $"text").unionByName(edge)
      .select($"doc_id",
        TextFunctions.charEntropy($"text").as("fast"),
        TextFunctions.charEntropyComposable($"text").as("spec"))
    // bit-identical, not approximately equal: the expression must keep
    // every gate hash (q130/q137) unchanged
    val diff = both.filter(
      ($"fast".isNull =!= $"spec".isNull) ||
      ($"fast".isNotNull && $"fast" =!= $"spec"))
    assert(diff.count() == 0, diff.limit(5).collect().mkString("; "))
  }

  test("pmiCollocations: closed-form PMI on a fixed corpus, minCount honored") {
    // corpus of one doc: "a b a b a c" → bigrams (a,b)(b,a)(a,b)(b,a)(a,c)
    val df = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val got = graft.ops.LanguageModel.pmiCollocations(df, "doc_id", "text",
      minCount = 1).collect().map(r =>
        (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // N=5; heads: a→3, b→2; tails: b→2, a→2, c→1
    assert(got(("a", "b"))._1 == 2L)
    assert(math.abs(got(("a", "b"))._2 - math.log(2.0 * 5 / (3.0 * 2))) < 1e-12)
    assert(math.abs(got(("a", "c"))._2 - math.log(1.0 * 5 / (3.0 * 1))) < 1e-12)
    assert(math.abs(got(("b", "a"))._2 - math.log(2.0 * 5 / (2.0 * 2))) < 1e-12)
    // raising minCount drops the singleton pair
    val cut = graft.ops.LanguageModel.pmiCollocations(df, "doc_id", "text",
      minCount = 2).collect()
    assert(cut.length == 2 && !cut.exists(_.getString(1) == "c"))
  }

  test("dsirLogWeights: tilts toward the target slice; <2-token docs emit nothing") {
    val target = docs.filter($"lang" === "en").select($"doc_id")
    val w = graft.ops.Curation.dsirLogWeights(docs, target, "doc_id", "text")
    val j = w.join(docs.select($"doc_id", $"lang"), Seq("doc_id"))
      .groupBy($"lang" === "en").agg(avg($"log_weight")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    // the langs share one synthetic vocabulary, so the en bigram
    // distribution sits close to the corpus distribution and smoothing can
    // pull BOTH means below zero — the invariant is separation (importance
    // sampling ranks en above the rest), not the sign of the mean
    assert(j(true) > j(false) + 1.0,
      s"target slice must outscore off-target decisively: $j")
    // and the ranking property a resampler actually uses: the top-weight
    // quintile is en-enriched vs the corpus base rate
    val scored = w.join(docs.select($"doc_id", $"lang"), Seq("doc_id"))
    val q80 = scored.stat.approxQuantile("log_weight", Array(0.8), 0.001)(0)
    val top = scored.filter($"log_weight" >= q80)
    val topEn = top.filter($"lang" === "en").count().toDouble / top.count()
    val baseEn = docs.filter($"lang" === "en").count().toDouble / docs.count()
    assert(topEn > baseEn,
      s"top-quintile en fraction $topEn must exceed base rate $baseEn")
    // a doc with one token has no bigram features → absent, not zero
    val tiny = docs.limit(1).select(lit(99999999L).as("doc_id"), lit("solo").as("text"))
      .unionByName(docs.select($"doc_id", $"text"))
    val w2 = graft.ops.Curation.dsirLogWeights(tiny, target, "doc_id", "text")
    assert(w2.filter($"doc_id" === 99999999L).count() == 0)
  }

  test("rademacherProject: JL geometry — norms and pairwise distances preserved in expectation") {
    val m = Similarity.rademacherMatrix(outDims = 16, inDims = 64, salt = "jl")
    assert(m.length == 16 && m.forall(_.length == 64))
    assert(m.flatten.forall(w => w == 1.0 || w == -1.0))
    // deterministic: regeneration is identical
    assert(m == Similarity.rademacherMatrix(16, 64, "jl"))
    val sq = (c: org.apache.spark.sql.Column) =>
      aggregate(c, lit(0.0), (a, x) => a + x * x)
    val proj = emb.select($"vec_id",
      $"embedding".as("v"), Similarity.rademacherProject($"embedding", m).as("p"))
    // E[‖Pv‖²] = ‖v‖²: the mean ratio over the corpus concentrates near 1
    val normRatio = proj.select(
        (sq($"p") / sq(transform($"v", x => x.cast("double")))).as("r"))
      .agg(avg($"r")).collect()(0).getDouble(0)
    assert(math.abs(normRatio - 1.0) < 0.15, s"mean norm ratio $normRatio")
    // pairwise distance distortion over a 20-vector sample: k=16 gives a
    // loose but bounded band; catastrophic collapse (ratio→0) or blowup
    // would mean the matrix rows are correlated
    val s20 = proj.filter($"vec_id" < 20)
      .select($"vec_id".as("ia"), $"v".as("va"), $"p".as("pa"))
    val t20 = proj.filter($"vec_id" < 20)
      .select($"vec_id".as("ib"), $"v".as("vb"), $"p".as("pb"))
    val dist = s20.join(t20, $"ia" < $"ib")
      .select((sq(zip_with($"pa", $"pb", (a, b) => a - b)) /
        sq(zip_with($"va", $"vb", (a, b) => a.cast("double") - b))).as("r"))
    val Row(lo: Double, hi: Double, mean: Double) =
      dist.agg(min($"r"), max($"r"), avg($"r")).collect()(0)
    assert(lo > 0.25 && hi < 2.5, s"distance distortion out of band: [$lo, $hi]")
    assert(math.abs(mean - 1.0) < 0.2, s"mean distance ratio $mean")
  }

  test("crossSourceOverlap counts distinct shared fingerprints per pair") {
    val df = Seq(
      (1L, "A", "same doc"),
      (2L, "B", "same  DOC"),    // normalizes equal to doc 1 → A∩B
      (3L, "B", "other text"),
      (4L, "C", "other text"),   // B∩C
      (5L, "C", "same doc"),     // A∩C and a second B∩C member
      (6L, "A", "same doc"),     // duplicate within A: must not inflate counts
      (7L, "A", "only in a")
    ).toDF("doc_id", "source", "text")
    val got = Dedup.crossSourceOverlap(df, "doc_id", "source", "text")
      .orderBy("src_a", "src_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_shared")))
    // pairs are unordered-once (src_a < src_b); "same doc" links all three
    assert(got.toSeq == Seq(("A", "B", 1L), ("A", "C", 1L), ("B", "C", 2L)))
  }

  test("crossSourceOverlap: disjoint sources produce an empty matrix") {
    val df = Seq((1L, "A", "x"), (2L, "B", "y")).toDF("doc_id", "source", "text")
    assert(Dedup.crossSourceOverlap(df, "doc_id", "source", "text").count() == 0)
  }

  test("exact dedup is whitespace/case insensitive via normalization") {
    val df = Seq(
      (1L, "Hello   World"),
      (2L, "hello world"),
      (3L, "different doc")).toDF("doc_id", "text")
    val kept = Dedup.exactDedup(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("minhash LSH finds near-dup pairs with high recall vs exact jaccard") {
    // ground truth: all pairs with shingle-jaccard >= 0.5 (O(n^2) on 500 docs)
    val truth = Dedup.ngramJaccardPairs(docs, "doc_id", "text", k = 3, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val found = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        k = 3, bands = 4, rowsPerBand = 3, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // no false positives (every returned pair is verified by exact jaccard)
    assert(found.subsetOf(truth), s"false positives: ${found -- truth}")
    // recall: with b=4,r=3 and j>=0.5, P(detect) >= 1-(1-0.5^3)^4 = 0.41 per
    // pair at the threshold boundary, but near-dups here have j~0.9 where
    // P ~ 1-(1-0.73)^4 = 0.995; demand >= 80% overall
    if (truth.nonEmpty)
      assert(found.size.toDouble / truth.size >= 0.8,
        s"recall ${found.size}/${truth.size}")
  }

  test("minhash skew-safe path: identical pairs under planted boilerplate") {
    // plant a hot bucket: 120 exact copies of one document — every band
    // signature collides, the classic boilerplate skew channel
    val boiler = docs.limit(1).select(lit(0L).as("one"))
      .crossJoin(spark.range(120).select(($"id" + 2000000L).as("doc_id")))
      .crossJoin(docs.limit(1).select($"text"))
      .select($"doc_id", $"text")
    val corpus = docs.select($"doc_id", $"text").unionByName(boiler)
    def pairs(skewSafe: Boolean, cap: Int) =
      Dedup.minhashNearDupPairs(corpus, "doc_id", "text",
          k = 3, bands = 4, rowsPerBand = 3, threshold = 0.5,
          maxBucket = cap, skewSafe = skewSafe)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // cap below the boilerplate bucket: both paths drop it, identical sets
    val capped = pairs(skewSafe = false, cap = 100)
    assert(pairs(skewSafe = true, cap = 100) == capped)
    assert(!capped.exists { case (a, b) => a >= 2000000L && b >= 2000000L },
      "over-cap boilerplate bucket must be dropped")
    // cap above it: both paths keep it, identical sets again
    val kept = pairs(skewSafe = false, cap = 1000)
    assert(pairs(skewSafe = true, cap = 1000) == kept)
    assert(kept.exists { case (a, b) => a >= 2000000L && b >= 2000000L },
      "boilerplate pairs present under a generous cap")
  }

  test("incremental minhash: finds cross-set near-dups, never corpus-internal pairs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val corpus = docs.filter($"doc_id" < 400)
    // incoming: fresh ids, half are near-copies of corpus docs (same text
    // with a short suffix), half are corpus-disjoint doc texts
    val nearCopies = corpus.filter($"doc_id" % 40 === 0)
      .select(($"doc_id" + 900000L).as("doc_id"),
        concat($"text", lit(" tail marker")).as("text"))
    val fresh = docs.filter($"doc_id" >= 450)
      .select(($"doc_id" + 800000L).as("doc_id"), $"text")
    val incoming = nearCopies.unionByName(fresh)
    val pairs = Dedup.minhashNearDupAgainst(corpus, incoming, "doc_id", "text",
      threshold = 0.5)
      .select("incoming_id", "corpus_id").as[(Long, Long)].collect()
    // every pair crosses the sets
    assert(pairs.forall { case (i, c) => i >= 800000L && c < 400L })
    // each planted near-copy is matched back to its source doc
    val expected = corpus.filter($"doc_id" % 40 === 0)
      .select($"doc_id").as[Long].collect().toSet
    val unrecovered = expected.filterNot(e =>
      pairs.exists(p => p._1 == e + 900000L && p._2 == e))
    assert(unrecovered.isEmpty, s"planted copies not recovered: $unrecovered")
  }

  test("simhash: identical docs collide; banded pairs = exact hamming pairs") {
    val base = (1 to 40).map(i => s"word$i").mkString(" ")
    val nearDup = (1 to 40).map(i => if (i == 7) "changed" else s"word$i").mkString(" ")
    val df = Seq(
      (1L, base),
      (2L, base), // identical → hamming 0
      (3L, nearDup), // 1 token of 40 changed → small hamming
      (4L, "completely unrelated vocabulary in this document right here")
    ).toDF("doc_id", "text")
    val hashes = df.select($"doc_id", Dedup.simhash($"text").as("h"))
      .as[(Long, Long)].collect().toMap
    assert(hashes(1L) == hashes(2L))
    val dNear = java.lang.Long.bitCount(hashes(1L) ^ hashes(3L))
    val dFar = java.lang.Long.bitCount(hashes(1L) ^ hashes(4L))
    assert(dNear < dFar, s"near=$dNear far=$dFar")

    // the banding operator must return exactly the pairs whose true hamming
    // distance is within maxDist (banding is lossless for d <= maxDist)
    val maxDist = math.max(3, dNear)
    val expected = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      if java.lang.Long.bitCount(hashes(a) ^ hashes(b)) <= maxDist
    } yield (a, b)).toSet
    val pairs = Dedup.simhashNearDupPairs(df, "doc_id", "text", maxDist)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == expected, s"got $pairs expected $expected (maxDist=$maxDist)")
    assert(pairs.contains((1L, 2L)))
  }

  test("simhashTable (relational) equals simhash (column expression)") {
    val sample = docs.filter($"doc_id" < 100)
    val viaExpr = sample.select($"doc_id", Dedup.simhash($"text").as("simhash"))
      .as[(Long, Long)].collect().toMap
    val viaTable = Dedup.simhashTable(sample, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(viaTable == viaExpr)
  }

  test("brute-force cosine topk: self-similarity excluded, scores ordered") {
    val queries = emb.filter($"vec_id" < 3)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val topk = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "qid", "qvec", k = 5).collect()
    assert(topk.length == 15)
    topk.groupBy(_.getAs[Long]("qid")).foreach { case (_, rows) =>
      val scores = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    assert(!topk.exists(r => r.getAs[Long]("qid") == r.getAs[Long]("vec_id")))
  }

  test("maxSimTopK: late interaction matches permuted sub-vectors plain cosine misses") {
    // q's sub-vectors are [1,0] and [0,1]; doc 1 holds them SWAPPED, so
    // whole-vector cosine(q, doc1) = 0 but MaxSim = 1 + 1 = 2
    val corpus = Seq(
      (1L, Array(0f, 1f, 1f, 0f)),   // permuted copy of q
      (2L, Array(1f, 0f, 0f, 1f)),   // identical to q
      (3L, Array(1f, 1f, 1f, 1f))    // uniform: each sub cos = 1/√2
    ).toDF("vec_id", "embedding")
    val q = Seq((100L, Array(1f, 0f, 0f, 1f))).toDF("qid", "qvec")
    val got = Similarity.maxSimTopK(corpus, "vec_id", "embedding",
        q, "qid", "qvec", dim = 4, m = 2, k = 3)
      .orderBy($"rank")
      .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("score")))
    assert(got(0) == ((1, 1L, 2.0)))   // tie with doc 2 broken on vec_id
    assert(got(1) == ((2, 2L, 2.0)))
    assert(math.abs(got(2)._3 - 2.0 / math.sqrt(2)) < 1e-6 && got(2)._2 == 3L)
    // the property plain cosine can't have: permuted doc scores 0 there
    val plain = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        q, "qid", "qvec", k = 3)
      .filter($"vec_id" === 1L).collect().head.getAs[Double]("score")
    assert(plain == 0.0)
  }

  test("linearFit: exact line recovered, degenerate groups yield nulls") {
    val df = Seq(
      ("line", 0.0, 1.0), ("line", 1.0, 3.0), ("line", 2.0, 5.0),   // y = 2x+1
      ("flat", 0.0, 4.0), ("flat", 1.0, 4.0), ("flat", 2.0, 4.0),   // zero y-var
      ("point", 5.0, 1.0), ("point", 5.0, 2.0)                      // zero x-var
    ).toDF("g", "x", "y")
    val got = graft.ops.Profiling.linearFit(df, Seq("g"), "x", "y")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), Option(r.get(2)), Option(r.get(3)), Option(r.get(4))))).toMap
    assert(got("line") == ((3L, Some(2.0), Some(1.0), Some(1.0))))
    assert(got("flat") == ((3L, Some(0.0), Some(4.0), None)))      // r2 undefined
    assert(got("point") == ((2L, None, None, None)))               // no x variance
    // global (ungrouped) fit over the perfect line alone
    val all = graft.ops.Profiling.linearFit(
      df.filter($"g" === "line"), Seq.empty, "x", "y").collect().head
    assert(all.getDouble(1) == 2.0 && all.getDouble(2) == 1.0)
  }

  test("embeddingDrift: closed-form centroid distances; identical groups drift 0") {
    val df = Seq(
      ("a", Array(1f, 0f)), ("a", Array(1f, 0f)),
      ("b", Array(0f, 1f)), ("b", Array(0f, 1f))
    ).toDF("src", "embedding")
    val got = graft.ops.Profiling.embeddingDrift(df, "src", "embedding")
      .orderBy($"grp").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // global centroid (0.5, 0.5); each group deviates ±0.5 per dim
    assert(got(0) == (("a", 2L, 0.5, 0.707107)))
    assert(got(1) == (("b", 2L, 0.5, 0.707107)))
    // a group that mirrors the corpus distribution shows zero drift
    val same = Seq(("x", Array(3f, 4f)), ("y", Array(3f, 4f)))
      .toDF("src", "embedding")
    val zeros = graft.ops.Profiling.embeddingDrift(same, "src", "embedding")
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    assert(zeros.forall(_ == ((0.0, 0.0))))
  }

  test("sourceKlDivergence: non-negative; drifted source scores above a mirror") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta", "mirror"),
      (2L, "alpha beta gamma delta", "mirror"),
      (3L, "alpha beta gamma delta", "drift"),
      (4L, "omega psi chi phi", "drift")
    ).toDF("doc_id", "text", "source")
    val kl = graft.ops.LanguageModel.sourceKlDivergence(
        corpus, "doc_id", "text", "source")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // Gibbs: KL >= 0 always (smoothing keeps the mirror slightly above 0)
    assert(kl.values.forall(_ >= 0.0), kl.toString)
    // half of drift's mass sits on words the pool rarely has → bigger KL
    assert(kl("drift") > kl("mirror"), kl.toString)
    assert(kl("mirror") < 0.1, s"mirror should be near zero: ${kl("mirror")}")
  }

  test("wordpieceSegment: greedy longest match, ## continuations, char fallback") {
    val corpus = Seq((1L, "customer hash zq customer")).toDF("doc_id", "text")
    val vocab = Seq("c", "u", "s", "t", "o", "m", "e", "r", "a", "h", "z",
      "cust", "omer").toDF("piece")
    val got = graft.ops.LanguageModel.wordpieceSegment(
        corpus, "doc_id", "text", vocab, "piece", maxPieceLen = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // maximal munch: "cust" beats "c"/"cus"; continuation marked ##
    assert(got("customer") == ((2L, 2L, "cust ##omer")))
    // no multi-char pieces match → per-char pieces
    assert(got("hash") == ((1L, 4L, "h ##a ##s ##h")))
    // 'q' absent from vocab → single-char fallback still terminates
    assert(got("zq") == ((1L, 2L, "z ##q")))
  }

  test("wordpieceVocab: chars + short whole words + frequent 3-substrings") {
    val corpus = Seq((1L, "abcdef abcdef abcdef xy")).toDF("doc_id", "text")
    val v = graft.ops.LanguageModel.wordpieceVocab(
        corpus, "doc_id", "text", wholeWordLen = 2, minSubCount = 3)
      .collect().map(_.getString(0)).toSet
    assert(Set("a", "b", "c", "d", "e", "f", "x", "y").subsetOf(v)) // chars
    assert(v.contains("xy"))                                       // whole ≤ 2
    assert(v.contains("abc") && v.contains("cde"))                 // 3-subs ≥ 3
    assert(!v.contains("abcdef"))                                  // too long
  }

  test("ivf ann: recall vs brute force is reasonable at nprobe=4") {
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val centroids = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("cid"), $"embedding".as("cvec"))
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", centroids, "cid", "cvec", k = 10, nprobe = 4)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    // random gaussian vectors are a worst case for IVF; still expect
    // far-better-than-probe-fraction recall (4/10 cells scanned)
    assert(recall >= 0.4, s"IVF recall $recall")
    assert(approx.size == exact.size)
  }

  test("ivf trained centroids: deterministic, right shape, recall holds") {
    val trained = Similarity.trainCentroids(emb, "vec_id", "embedding",
      kCells = 8, iters = 2)
    val rows = trained.collect()
    assert(rows.length == 8)
    val dim = emb.select($"embedding").as[Seq[Float]].head().size
    assert(rows.forall(_.getAs[Seq[Float]]("cvec").size == dim))
    // deterministic: a second training run yields identical centroids
    val again = Similarity.trainCentroids(emb, "vec_id", "embedding",
      kCells = 8, iters = 2).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", trained, "cid", "cvec", k = 10, nprobe = 4)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"trained-IVF recall $recall")
  }

  test("cosine LSH pairs: subset of brute-force pairs at same threshold") {
    val brute = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosineLshPairs(emb, "vec_id", "embedding",
        nPlanes = 8, threshold = 0.4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(brute), s"LSH produced unverified pairs: ${lsh -- brute}")
  }

  test("SRP signature: codegen expression == composable formulation; " +
      "short/null vectors") {
    val w = Similarity.srpPlaneWeights(16, 64)
    assert(w.length == 16 && w.forall(_.length == 64))
    assert(w.flatten.forall(x => x == 1.0 || x == -1.0))
    val diff = emb.select(
        graft.functions.SrpSignature($"embedding", w).as("fast"),
        Similarity.srpSignatureBitsComposable($"embedding", w).as("ref"))
      .filter($"fast" =!= $"ref")
      .count()
    assert(diff == 0)
    // a shorter vector folds over its own length; null yields null
    val edge = Seq((1L, Some(Seq(1.0f, -2.0f))), (2L, None))
      .toDF("id", "v").select($"id", $"v".cast("array<float>").as("v"))
    val out = edge.select($"id", graft.functions.SrpSignature($"v", w).as("bits"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[scala.collection.Seq[Int]]("bits").length == 16)
    assert(out(2L).isNullAt(1))
  }

  test("SRP banded pairs: subset of brute force, exact cos on each pair, " +
      "strictly higher recall than the single-bucket LSH") {
    val brute = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.3)
      .select($"id_a", $"id_b", $"cos").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    val bandedRows = Similarity.srpBandedNearDupPairs(
        emb, "vec_id", "embedding", dims = 64,
        bands = 4, rowsPerBand = 4, threshold = 0.3)
      .select($"id_a", $"id_b", $"cos").as[(Long, Long, Double)].collect()
    assert(bandedRows.nonEmpty)
    assert(bandedRows.map(t => (t._1, t._2)).distinct.length == bandedRows.length)
    bandedRows.foreach { case (a, b, c) =>
      assert(brute.contains((a, b)), s"unverified pair ($a,$b)")
      assert(brute((a, b)) == c, s"cos mismatch on ($a,$b)")
    }
    // all 16 bits as ONE band == the exact-signature bucket of
    // cosineLshPairs: banding can only add candidates
    val oneBand = Similarity.srpBandedNearDupPairs(
        emb, "vec_id", "embedding", dims = 64,
        bands = 1, rowsPerBand = 16, threshold = 0.3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val banded = bandedRows.map(t => (t._1, t._2)).toSet
    assert(oneBand.subsetOf(banded))
    assert(banded.size > oneBand.size,
      s"banding added no recall: ${banded.size} vs ${oneBand.size}")
  }

  test("text functions: deterministic edge cases") {
    val df = Seq(
      (1L, "The quick brown fox, and the lazy dog!"),
      (2L, "word"),
      (3L, "a the of to in is and")).toDF("doc_id", "text")
    val out = df.select(
      $"doc_id",
      TextFunctions.tokenCount($"text").as("n"),
      TextFunctions.stopwordRatio($"text").as("sr"),
      TextFunctions.langId($"text").as("lang"),
      TextFunctions.fingerprint($"text").as("fp")).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n") == 8)
    assert(out(2L).getAs[Double]("sr") == 0.0)
    assert(out(3L).getAs[Double]("sr") == 1.0)
    assert(out(3L).getAs[String]("lang") == "en")
    assert(out(1L).getAs[String]("fp").length == 32)
    // fingerprint ignores case + whitespace runs
    val fps = Seq((1L, "A  B"), (2L, "a b")).toDF("doc_id", "text")
      .select(TextFunctions.fingerprint($"text")).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("bpe pair counts: hand-computed merge ranking on a tiny corpus") {
    val tiny = Seq((1L, "ab ab x"), (2L, "Abc")).toDF("doc_id", "text")
    // words after lower/split: ab, ab, x(dropped, len<2), abc
    // pairs: 'ab'×2 + ('ab','bc') from abc → ab:3, bc:1
    val got = graft.ops.LanguageModel.bpePairCounts(tiny, "doc_id", "text", 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("ab", 3L), ("bc", 1L)))
    // topK truncation respects the (count desc, pair) total order
    val top1 = graft.ops.LanguageModel.bpePairCounts(tiny, "doc_id", "text", 1)
      .as[(String, Long)].collect().toSeq
    assert(top1 == Seq(("ab", 3L)))
  }

  test("langId picks distinct languages from distinct stopwords") {
    val df = Seq(
      (1L, "el que y en un dia"),
      (2L, "der und das ein zu"),
      (3L, "le et un pour que"),
      (4L, "xyzzy plugh")).toDF("doc_id", "text")
    val langs = df.select($"doc_id", TextFunctions.langId($"text"))
      .as[(Long, String)].collect().toMap
    assert(langs(1L) == "es" && langs(2L) == "de" && langs(4L) == "und")
  }

  test("sourceMinhashMatrix: identical content matches fully; the union " +
      "signature is invariant to how docs split; disjoint content is low") {
    val df = Seq(
      (1L, "a", "w1 w2 w3 w4 w5 w6"),
      (2L, "b", "w1 w2 w3 w4 w5 w6"),
      // source c covers the SAME shingle union as a, split across 4 docs
      (3L, "c", "w1 w2 w3"), (4L, "c", "w2 w3 w4"),
      (5L, "c", "w3 w4 w5"), (6L, "c", "w4 w5 w6"),
      (7L, "d", "z1 z2 z3 z4 z5 z6 z7 z8"))
      .toDF("doc_id", "source", "text")
    val got = Dedup.sourceMinhashMatrix(df, "doc_id", "source", "text",
        k = 3, numHashes = 16)
      .collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b")) ->
        r.getAs[Double]("est_jaccard")).toMap
    assert(got(("a", "b")) == 1.0)
    assert(got(("a", "c")) == 1.0, s"doc-split must not change the signature: $got")
    assert(got(("a", "d")) < 0.5, s"disjoint sources must score low: $got")
    assert(got.size == 6)
  }

  test("kgramNovelty: clone scores 0, unique doc scores 1, shared gram " +
      "goes to the min id") {
    val df = Seq(
      (1L, "a b c d"),     // grams: abc, bcd — both first here
      (2L, "a b c d"),     // verbatim clone of 1 → novelty 0
      (3L, "x y z w"),     // fully unique → novelty 1
      (4L, "a b c q r"))   // abc first seen in doc 1; bcq/cqr novel
      .toDF("doc_id", "text")
    val got = Dedup.kgramNovelty(df, "doc_id", "text", 3)
      .orderBy("doc_id")
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_grams"),
        r.getAs[Long]("n_novel"), r.getAs[Double]("novelty")))).toMap
    assert(got(1L) == ((2L, 2L, 1.0)))
    assert(got(2L) == ((2L, 0L, 0.0)))
    assert(got(3L) == ((2L, 2L, 1.0)))
    assert(got(4L) == ((3L, 2L, 2.0 / 3.0)))
  }

  test("kgramNovelty: repeated gram within one doc counts once (distinct); " +
      "short doc falls back to whole text") {
    val df = Seq(
      (1L, "a b c a b c"),  // grams incl. 'a b c'×2 → distinct set of 4
      (2L, "hi"))           // < k tokens → single whole-text shingle
      .toDF("doc_id", "text")
    val got = Dedup.kgramNovelty(df, "doc_id", "text", 3)
      .orderBy("doc_id").collect()
    // doc1 windows: (a b c)(b c a)(c a b)(a b c) → 3 distinct grams
    assert(got(0).getAs[Long]("n_grams") == 3L)
    assert(got(0).getAs[Double]("novelty") == 1.0)
    assert(got(1).getAs[Long]("n_grams") == 1L)
    assert(got(1).getAs[Long]("n_novel") == 1L)
  }

  test("stupidBackoffScores: each back-off tier scores its hand case, " +
      "OOV hits the half-count floor") {
    // model: trigrams {abc, bcd}, bigrams {ab, bc, cd}, unigrams N=4
    val model = Seq((100L, "a b c d")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c"),  // trigram tier: T(abc)/B(ab) = 1 → ln 1 = 0
      (2L, "x b c"),  // bigram tier: 0.4·B(bc)/U(b) = 0.4
      (3L, "a b d"),  // unigram tier: 0.16·(U(d)+½)/N = 0.06
      (4L, "a b q"))  // OOV w3: 0.16·(0+½)/4 = 0.02
      .toDF("doc_id", "text")
    val got = graft.ops.LanguageModel
      .stupidBackoffScores(docs, model, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("n_trigrams"), r.getAs[Double]("sb_score")))
    assert(got.map(_._1).toSeq == Seq(1L, 1L, 1L, 1L))
    val exp = Seq(0.0, math.log(0.4), math.log(0.06), math.log(0.02))
      .map(v => math.rint(v * 1e6) / 1e6)
    got.map(_._2).zip(exp).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"got $g expected $e") }
  }

  test("int8QuantizationAudit: affine round-trip error matches closed " +
      "form; constant dimensions are exact") {
    val vecs = Seq((1L, Seq(0f, 10f)), (2L, Seq(5f, 10f)), (3L, Seq(10f, 10f)))
      .toDF("vec_id", "embedding")
    val got = graft.ops.ProductQuantization
      .int8QuantizationAudit(vecs, "vec_id", "embedding")
      .orderBy("dim").collect()
    // dim 1 is constant: scale 0, zero reconstruction error
    assert(got(1).getAs[Double]("mean_abs_err") == 0.0)
    assert(got(1).getAs[Double]("max_abs_err") == 0.0)
    // dim 0: same double arithmetic as the operator, by hand
    val scale = 10.0 / 255
    val err5 = math.abs(0.0 + math.floor(5.0 / scale + 0.5) * scale - 5.0)
    assert(got(0).getAs[Double]("min_val") == 0.0)
    assert(got(0).getAs[Double]("max_val") == 10.0)
    assert(math.abs(got(0).getAs[Double]("max_abs_err") -
      math.rint(err5 * 1e6) / 1e6) < 1e-9)
    assert(math.abs(got(0).getAs[Double]("mean_abs_err") -
      math.rint(err5 / 3 * 1e6) / 1e6) < 1e-9)
  }

  test("ccnetQualityBuckets: fluent repeated text ranks head, unique-word " +
      "gibberish ranks tail, terciles are equal-count") {
    // 3 docs sharing one high-count bigram pattern + 3 docs of words the
    // model sees once each: smoothing still separates them cleanly
    val corpus = Seq(
      (1L, "the cat sat on the mat"), (2L, "the cat sat on the rug"),
      (3L, "the cat sat on the bed"),
      (4L, "qq ww ee rr tt yy"), (5L, "uu ii oo pp aa ss"),
      (6L, "dd ff gg hh jj kk")).toDF("doc_id", "text")
    val got = graft.ops.LanguageModel
      .ccnetQualityBuckets(corpus, corpus, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.map(_.getAs[Long]("n_bigrams")).toSeq == Seq.fill(6)(5L))
    val byBucket = got.groupBy(_.getAs[String]("bucket"))
      .view.mapValues(_.map(_.getAs[Long]("doc_id")).toSet).toMap
    // rank-based terciles: exactly 2 docs per bucket
    assert(byBucket.values.map(_.size).toSeq.sorted == Seq(2, 2, 2))
    // every repeated-pattern doc scores below (more fluent than) every
    // gibberish doc
    val xent = got.map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[Double]("xent")).toMap
    assert(Seq(1L, 2L, 3L).map(xent).max < Seq(4L, 5L, 6L).map(xent).min)
    assert(byBucket("tail").subsetOf(Set(4L, 5L, 6L)))
  }
}
