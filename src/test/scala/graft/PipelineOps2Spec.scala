package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curation, LanguageModel, SequencePatterns, Similarity}

/** Laws for the round-10 operator additions: BPE merge training, hashed
  * linear classifier inference, embedding decontamination, sequence
  * pattern matching with veto, and log-odds over-indexing terms. */
class PipelineOps2Spec extends SparkSpec {
  import spark.implicits._

  test("bpeTrain learns the classic merges on a hand-checkable corpus") {
    // "aaab" x3 + "aab" x2: pair counts round 1: (a,a)=3+3+2=8, (a,b)=5
    // → merge (a,a). round 2: words " aa a b " x3, " aa b " x2 →
    // (aa,a)=3, (aa,b)=2, (a,b)=3 → tie (aa,a) vs (a,b) at 3 → lexicographic
    // (a,b) < (aa,a): merge (a,b)? NO — ordering is (lft, rgt): "a" < "aa"
    // so (a,b) wins the tie.
    val docs = Seq((1L, "aaab aaab aaab aab aab")).toDF("doc_id", "text")
    val got = LanguageModel.bpeTrain(docs, "doc_id", "text", nMerges = 3)
      .orderBy("step")
      .as[(Int, String, String, Long)].collect()
    assert(got(0) == ((1, "a", "a", 8L)))
    assert(got(1) == ((2, "a", "b", 3L)))
    // after merging (a,b): " aa a b "→" aa ab ", " aa b "... wait: " a a a b "
    // became " aa a b " then (a,b)→" aa ab " x3; " aa b " has no (a,b); pairs:
    // (aa,ab)=3, (aa,b)=2 → merge (aa,ab)
    assert(got(2) == ((3, "aa", "ab", 3L)))
  }

  test("bpeSegment applies merges in training order; unseen words fall " +
      "back to characters") {
    val docs = Seq((1L, "aaab aaab aaab aab aab")).toDF("doc_id", "text")
    val merges = LanguageModel.bpeTrain(docs, "doc_id", "text", nMerges = 3)
    // merges (from the train spec): (a,a) -> (a,b) -> (aa,ab)
    val seg = LanguageModel.bpeSegment(docs, "doc_id", "text", merges)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getString(2)))).toMap
    assert(seg("aaab") == ((1L, "aaab")))  // aa+ab -> aaab after merge 3
    assert(seg("aab") == ((2L, "aa b")))
    // a corpus word the merges never touch segments to raw characters
    val other = Seq((1L, "xyz")).toDF("doc_id", "text")
    val segO = LanguageModel.bpeSegment(other, "doc_id", "text", merges)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    assert(segO("xyz") == "x y z")
  }

  test("bpeTrain stops early when no pairs remain") {
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    // all words single-char: zero mergeable pairs from the start
    assert(LanguageModel.bpeTrain(docs, "doc_id", "text", nMerges = 5)
      .count() === 0L)
  }

  test("unigramSegment: hand-checkable Viterbi on a tiny vocab") {
    val vocab = Seq(("ab", -1000000L), ("c", -2000000L), ("abc", -3500000L),
      ("a", -3000000L), ("b", -3000000L)).toDF("piece", "score_micro")
    val docs = Seq((1L, "abc abc zc")).toDF("doc_id", "text")
    val got = LanguageModel.unigramSegment(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // abc: ab+c = -3.0M beats abc = -3.5M and a+b+c = -8M
    assert(got("abc") == ((2L, -3000000L, "ab c")))
    // z is not in the vocab: UNK floor -20M, then c = -2M
    assert(got("zc") == ((2L, -22000000L, "z c")))
  }

  test("unigramSegment matches a brute-force Viterbi enumeration on " +
      "random words and vocabularies") {
    // all compositions into pieces of length <= 4
    def comps(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to math.min(4, w.length)).flatMap(l =>
        comps(w.drop(l)).map(w.take(l) +: _))
    def score(seg: Seq[String], v: Map[String, Long]): Option[Long] = {
      val ss = seg.map(p => v.get(p).orElse(
        if (p.length == 1) Some(-20000000L) else None))
      if (ss.exists(_.isEmpty)) None else Some(ss.flatten.sum)
    }
    // the DP's local tie rule (max score, then longest final piece,
    // recursively) == among max-score segs, the lexicographically
    // largest REVERSED piece-length sequence
    def refBest(w: String, v: Map[String, Long]): (Long, Long, String) = {
      val scored = comps(w).flatMap(s => score(s, v).map(sc => (sc, s)))
      val mx = scored.map(_._1).max
      import Ordering.Implicits._
      val seg = scored.filter(_._1 == mx).map(_._2)
        .maxBy(s => s.map(_.length).reverse.toList)
      (seg.size.toLong, mx, seg.mkString(" "))
    }
    val rnd = new scala.util.Random(7)
    val words = Seq.fill(40)(
      Seq.fill(1 + rnd.nextInt(8))("abc"(rnd.nextInt(3))).mkString).distinct
    // vocab: a deterministic pseudo-random subset of all substrings
    val pieces = words.flatMap(w =>
      (0 until w.length).flatMap(p =>
        (1 to math.min(4, w.length - p)).map(l => w.substring(p, p + l))))
      .distinct.sorted
    val vm = pieces.zipWithIndex.collect {
      case (p, i) if (p.hashCode & 3) != 0 => // keep ~75%
        p -> (-(math.abs(p.hashCode) % 5000000L) - i - 1000000L)
    }.toMap
    val vocab = vm.toSeq.toDF("piece", "score_micro")
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val got = LanguageModel.unigramSegment(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    words.foreach { w =>
      val ref = refBest(w, vm)
      assert(got(w) == ref, s"word $w: ${got(w)} vs $ref")
    }
  }

  test("unigramFertility: hand-checked per-source metrics on a tiny " +
      "vocab, consistent with unigramSegment's piece counts") {
    val vocab = Seq(("ab", -1000000L), ("c", -2000000L), ("a", -3000000L),
      ("b", -3000000L)).toDF("piece", "score_micro")
    // src1: "abc abc" -> abc = [ab c] (2 pieces) x2 occurrences
    // src2: "ab zc"   -> ab = [ab] (1 piece), zc = [z c] (2, z is UNK)
    val docs = Seq((1L, "abc abc", "src1"), (2L, "ab zc", "src2"))
      .toDF("doc_id", "text", "source")
    val got = LanguageModel.unigramFertility(docs, "doc_id", "text",
        "source", vocab)
      .collect().map(r => r.getString(0) -> r).toMap
    val s1 = got("src1")
    assert((s1.getLong(1), s1.getLong(2), s1.getLong(3)) == ((2L, 4L, 6L)))
    assert(s1.getDouble(4) == 2.0)       // fertility: 4 pieces / 2 words
    assert(s1.getDouble(5) == 1.5)       // chars/piece: 6 / 4
    assert(s1.getDouble(6) == 0.0)       // nothing kept whole
    val s2 = got("src2")
    assert((s2.getLong(1), s2.getLong(2), s2.getLong(3)) == ((2L, 3L, 4L)))
    assert(s2.getDouble(4) == 1.5)
    assert(s2.getDouble(6) == 0.5)       // "ab" stays one piece
    // cross-check against unigramSegment: weighted piece sums must agree
    val seg = LanguageModel.unigramSegment(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(seg("abc") == 2L && seg("ab") == 1L && seg("zc") == 2L)
  }

  test("hashedLinearScore: deterministic, token-order-invariant, and the " +
      "flag agrees with the probability") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "gamma beta alpha"),
      (3L, "alpha alpha alpha")).toDF("doc_id", "text")
    val got = Curation.hashedLinearScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    // same multiset of tokens → identical score regardless of order
    assert(got(0).getAs[Double]("logit") == got(1).getAs[Double]("logit"))
    assert(got(0).getAs[Long]("n_tokens") == 3L)
    // single repeated token: the mean IS that token's bucket weight
    val w3 = got(2).getAs[Double]("logit")
    assert(w3 >= -1.0 && w3 <= 1.0)
    got.foreach { r =>
      val prob = r.getAs[Double]("prob")
      assert(r.getAs[Boolean]("is_positive") == (prob >= 0.5))
      assert(prob > 0.0 && prob < 1.0)
    }
  }

  test("decontamTopMatches: a planted eval-identical vector tops the " +
      "report at cosine 1") {
    val mk = (seed: Int) => Array.tabulate(8)(i =>
      (math.sin(seed * 31 + i) * 10).toFloat)
    val corpus = Seq((10L, mk(1)), (11L, mk(2)), (12L, mk(99)))
      .toDF("vec_id", "embedding")
    val eval = Seq((100L, mk(99)), (101L, mk(50)))
      .toDF("eval_id", "eval_vec")
    val got = Similarity.decontamTopMatches(corpus, "vec_id", "embedding",
      eval, "eval_id", "eval_vec", k = 3).collect()
    assert(got.length == 3)
    assert(got.head.getAs[Long]("vec_id") == 12L)
    assert(got.head.getAs[Long]("eval_id") == 100L)
    assert(got.head.getAs[Double]("cos") == 1.0)
    // one row per corpus vector (best match only), ordered cos desc
    assert(got.map(_.getAs[Long]("vec_id")).toSet == Set(10L, 11L, 12L))
    val coss = got.map(_.getAs[Double]("cos"))
    assert(coss.sameElements(coss.sortBy(-_)))
  }

  test("threeStageWithVeto: matches bind latest-click/latest-view and the " +
      "veto kills only in-span errors") {
    def ev(id: Long, u: Long, t: String, sec: Int) =
      (id, u, t, java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$sec%02d"))
    val events = Seq(
      // user 1: view(1) click(2) purchase(3) → match binds v=1,c=2
      ev(1, 1, "view", 1), ev(2, 1, "click", 2), ev(3, 1, "purchase", 3),
      // user 2: view click ERROR purchase → vetoed
      ev(4, 2, "view", 1), ev(5, 2, "click", 2), ev(6, 2, "error", 3),
      ev(7, 2, "purchase", 4),
      // user 3: ERROR view click purchase → error before span is fine
      ev(8, 3, "error", 1), ev(9, 3, "view", 2), ev(10, 3, "click", 3),
      ev(11, 3, "purchase", 4),
      // user 4: click purchase (no view) → no match
      ev(12, 4, "click", 1), ev(13, 4, "purchase", 2),
      // user 5: view1 click1 view2 click2 purchase → binds LATEST click2
      // and ITS latest view2
      ev(14, 5, "view", 1), ev(15, 5, "click", 2), ev(16, 5, "view", 3),
      ev(17, 5, "click", 4), ev(18, 5, "purchase", 5)
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = SequencePatterns.threeStageWithVeto(events, "user_id",
        "event_id", "ts", "event_type", "view", "click", "purchase", "error")
      .orderBy("user_id")
      .select(col("user_id"), second(col("v_ts")), second(col("c_ts")),
        second(col("p_ts")))
      .as[(Long, Int, Int, Int)].collect()
    assert(got.toSeq == Seq((1L, 1, 2, 3), (3L, 2, 3, 4), (5L, 3, 4, 5)),
      got.mkString(", "))
  }

  test("splitByComponents: near-dup clusters never straddle the split; " +
      "singletons split independently") {
    val docs = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    // clusters {1,2,3} and {10,11}; the rest singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val got = graft.ops.DedupClustering.splitByComponents(
        docs, pairs, "a", "b", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(got.size == 40)
    // whole cluster shares one side AND one cluster key
    assert(Set(got(1L), got(2L), got(3L)).size == 1)
    assert(got(1L)._1 == 1L)
    assert(got(10L) == got(11L) && got(10L)._1 == 10L)
    // both sides are populated over 35 singletons + 2 clusters
    val sides = got.values.map(_._2).toSet
    assert(sides == Set("train", "test"))
    // deterministic: rerun yields the identical assignment
    val again = graft.ops.DedupClustering.splitByComponents(
        docs, pairs, "a", "b", "doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(again == got)
  }

  test("distinctNgramRatios: repetitive text scores below diverse text") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam", "rep"),
      (2L, "one two three four five six", "div")).toDF("doc_id", "text", "src")
    val got = graft.ops.LanguageModel
      .distinctNgramRatios(docs, "doc_id", "text", "src")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getAs[Double]("distinct1_ratio"),
          r.getAs[Double]("distinct2_ratio")))).toMap
    assert(got("rep") == ((6L, 0.166667, 0.2)))
    assert(got("div") == ((6L, 1.0, 1.0)))
  }

  test("mlmMaskingPlan: counts are consistent, deterministic, and the " +
      "selection rate lands near 15%") {
    val docs = Tables_documents
    val got = graft.ops.Curation.mlmMaskingPlan(docs, "doc_id", "text")
      .collect()
    got.foreach { r =>
      assert(r.getAs[Long]("n_selected") == r.getAs[Long]("n_mask") +
        r.getAs[Long]("n_random") + r.getAs[Long]("n_keep"))
      assert(r.getAs[Long]("n_selected") <= r.getAs[Long]("n_tokens"))
    }
    val rate = got.map(_.getAs[Long]("n_selected")).sum.toDouble /
      got.map(_.getAs[Long]("n_tokens")).sum
    assert(rate > 0.10 && rate < 0.20, s"selection rate $rate")
    val again = graft.ops.Curation.mlmMaskingPlan(docs, "doc_id", "text")
      .collect()
    assert(got.map(_.toString).sorted.sameElements(
      again.map(_.toString).sorted))
  }

  private lazy val Tables_documents =
    spark.read.parquet(s"$sfDir/documents.parquet")

  test("ndcgAtK: the ideal ordering scores exactly 1; inversions and " +
      "unjudged items lose credit by the hand-computed amounts") {
    val judgments = Seq((1L, "a", 3L), (1L, "b", 2L), (1L, "c", 1L))
      .toDF("qid", "id", "grade")
    def run(order: Seq[String]) = graft.ops.TextRanking.ndcgAtK(
      order.zipWithIndex.map { case (id, i) => (1L, id, (i + 1).toLong) }
        .toDF("qid", "id", "rank"),
      judgments, "qid", "id", "rank", "grade", k = 3)
      .collect().head
    val perfect = run(Seq("a", "b", "c"))
    assert(perfect.getAs[Double]("ndcg") == 1.0)
    // idcg = 7/1 + 3/log2(3) + 1/2 = 7 + 1.892789 + 0.5
    assert(math.abs(perfect.getAs[Double]("idcg") - 9.392789) < 1e-5)
    val reversed = run(Seq("c", "b", "a"))
    // dcg = 1 + 3/log2(3) + 7/2 = 6.392789
    assert(math.abs(reversed.getAs[Double]("dcg") - 6.392789) < 1e-5)
    assert(reversed.getAs[Double]("ndcg") < 1.0)
    // an unjudged item in the list earns nothing; the judged-but-missed
    // item still shapes the ideal
    val offlist = run(Seq("a", "z", "b"))
    // a@1: 7/1; z@2: unjudged -> 0; b@3: 3/log2(4) = 1.5
    assert(math.abs(offlist.getAs[Double]("dcg") - 8.5) < 1e-5)
    assert(offlist.getAs[Double]("ndcg") < perfect.getAs[Double]("ndcg"))
  }

  test("horvitzThompson: certain inclusion reproduces truth exactly; " +
      "zero-probability rows leave the frame; estimates stay calibrated") {
    val docs = (1L to 400L).map(i => (i, "g", i % 7 + 1L))
      .toDF("id", "g", "y")
    // π = 1 for every row → the estimate IS the truth, bit-exact
    val sure = graft.ops.Curation.horvitzThompson(docs, "id", "g",
      lit(1000000L), col("y"), "ht").collect().head
    assert(sure.getAs[Long]("n_true") == 400L)
    assert(sure.getAs[Double]("n_est") == 400.0)
    assert(sure.getAs[Double]("y_est") == sure.getAs[Long]("y_true").toDouble)
    // π = 0 rows are outside the sampling frame on BOTH sides
    val framed = graft.ops.Curation.horvitzThompson(docs, "id", "g",
      when(col("id") <= 100, 0L).otherwise(500000L), col("y"), "ht")
      .collect().head
    assert(framed.getAs[Long]("n_true") == 300L)
    // π = 0.5: the deterministic draw keeps ~half; HT rescales back
    val est = framed.getAs[Double]("n_est")
    assert(math.abs(est - 300.0) / 300.0 < 0.15, s"n_est $est")
    val yEst = framed.getAs[Double]("y_est")
    val yTrue = framed.getAs[Long]("y_true").toDouble
    assert(math.abs(yEst - yTrue) / yTrue < 0.15, s"y_est $yEst vs $yTrue")
  }

  test("horvitzThompson: ppm above the 10^6 domain fails loud instead of " +
      "silently underestimating") {
    val docs = Seq((1L, "g", 1L), (2L, "g", 2L)).toDF("id", "g", "y")
    def msgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} ${msgs(t.getCause)}"
    val ex = intercept[Throwable] {
      Curation.horvitzThompson(docs, "id", "g",
        lit(2000000L), col("y"), "ht").collect()
    }
    assert(msgs(ex).contains("ppm must be <= 1000000"), msgs(ex))
    // the boundary itself stays legal (π = 1 → estimate ≡ truth)
    val ok = Curation.horvitzThompson(docs, "id", "g",
      lit(1000000L), col("y"), "ht").collect().head
    assert(ok.getAs[Double]("n_est") == 2.0)
  }

  test("q138 ccnet model cache is session-guarded: a different session " +
      "rebuilds the persisted model instead of serving a stale one") {
    val a = graft.queries.TextQueries.q138CcnetBuckets(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    // newSession() is a distinct SparkSession object — the (session, dir)
    // guard must miss and retrain rather than hand back DataFrames bound
    // to the first session
    val b = graft.queries.TextQueries.q138CcnetBuckets(
        spark.newSession(), sfDir)
      .collect().map(_.toSeq).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("geometricMedian: a planted outlier drags the mean far but the " +
      "geometric median barely moves — the robustness contract") {
    // 9 vectors tightly around (1, 0, ..., 0) plus one wild outlier
    def v(head: Float) = head +: Array.fill(7)(0.0f)
    val base = (0 until 9).map(i => (1, v(1.0f + i * 0.01f)))
    val withOutlier = (base :+ ((1, v(1000.0f)))).toDF("label", "embedding")
    val clean = base.toDF("label", "embedding")
    // Weiszfeld descends linearly from the (outlier-dragged) mean init,
    // so the robustness check runs enough rounds to converge; the gate's
    // 2-round setting pins the ITERATION, this pins the LIMIT
    def dim0(df: org.apache.spark.sql.DataFrame) =
      graft.ops.Similarity.geometricMedian(df, "label", "embedding", iters = 6)
        .filter(col("dim") === 0).collect().head.getAs[Double]("value")
    val gmClean = dim0(clean)
    val gmDirty = dim0(withOutlier)
    val meanDirty = (base.map(_._2(0).toDouble).sum + 1000.0) / 10
    assert(math.abs(gmClean - 1.04) < 0.02, s"clean gm $gmClean")
    // the mean is dragged past 100; the geometric median stays near 1
    assert(meanDirty > 100.0)
    assert(math.abs(gmDirty - gmClean) < 0.1,
      s"geometric median must resist the outlier: $gmDirty vs $gmClean")
    // determinism: identical rerun
    assert(dim0(withOutlier) == gmDirty)
  }

  test("bradleyTerry: strengths order by dominance, winless items stay " +
      "finite, and a sweep is strictly ranked") {
    val cmp = Seq(("A", "B"), ("A", "B"), ("B", "C"), ("A", "C"))
      .toDF("winner", "loser")
    val got = graft.ops.Preference.bradleyTerry(cmp, "winner", "loser")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getAs[Double]("strength")))).toMap
    assert(got("A")._1 == 3L && got("B")._1 == 1L && got("C")._1 == 0L)
    assert(got("A")._2 > got("B")._2 && got("B")._2 > got("C")._2,
      got.toString)
    // the virtual ½-win keeps the all-losing item positive and finite
    assert(got("C")._2 > 0.0 && !got("C")._2.isInfinite)
    // two items that only ever lose to each other's opponents: no NaN
    val lonely = Seq(("X", "Y")).toDF("winner", "loser")
    val g2 = graft.ops.Preference.bradleyTerry(lonely, "winner", "loser")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("strength")).toMap
    assert(g2("X") > g2("Y") && g2.values.forall(v => !v.isNaN))
  }

  test("winRateWilson: hand-computed Wilson bounds, [0,1] containment, " +
      "and thin records rank below well-measured ones") {
    val cmp = (Seq.fill(90)(("A", "B")) ++ Seq.fill(10)(("B", "A")) ++
      Seq(("C", "D"), ("C", "D"))).toDF("winner", "loser")
    val got = graft.ops.Preference.winRateWilson(cmp, "winner", "loser")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getAs[Double]("win_rate"),
          r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi")))).toMap
    // A: 90/100 — Wilson 95%: lo ≈ 0.825633, hi ≈ 0.944771
    assert(got("A")._1 == 100L && got("A")._2 == 90L)
    assert(math.abs(got("A")._3 - 0.9) < 1e-9)
    assert(math.abs(got("A")._4 - 0.825633) < 1e-5, got("A").toString)
    assert(math.abs(got("A")._5 - 0.944771) < 1e-5, got("A").toString)
    // C: 2/2 — the raw rate is 1 but the interval reaches far down
    assert(got("C")._3 == 1.0 && got("C")._4 < 0.45 && got("C")._5 == 1.0)
    // the 2/2 item's LOWER bound sits far below the 90/100 item's:
    // sorting by ci_lo demotes thin records exactly as intended
    assert(got("C")._4 < got("A")._4)
    // D: 0/2 — bounds stay inside [0,1] (Wilson never escapes)
    assert(got("D")._3 == 0.0 && got("D")._4 == 0.0 && got("D")._5 > 0.0 &&
      got("D")._5 < 1.0)
  }

  test("labelSilhouette: separated clusters score near 1, a label split " +
      "across two far-apart blobs scores low, and output is per-label") {
    def v(x: Double) = Array(x.toFloat, 0f, 0f)
    val tight = (
      (0 until 5).map(i => (i.toLong, 0, v(0.0 + i * 0.01))) ++
      (0 until 5).map(i => (100L + i, 1, v(10.0 + i * 0.01))) ++
      // label 2 straddles both blobs: its centroid helps nobody
      Seq((200L, 2, v(0.02)), (201L, 2, v(10.02))))
      .toDF("vec_id", "label", "embedding")
    val got = Similarity.labelSilhouette(tight, "vec_id", "label", "embedding")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getAs[Double]("silhouette")))).toMap
    assert(got.keySet == Set(0, 1, 2) && got(0)._1 == 5L && got(2)._1 == 2L)
    assert(got(0)._2 > 0.9 && got(1)._2 > 0.9,
      s"separated clusters must score near 1: $got")
    assert(got(2)._2 < 0.0,
      s"a straddling label must score negative: ${got(2)._2}")
    // determinism: identical rerun
    val again = Similarity.labelSilhouette(tight, "vec_id", "label",
      "embedding").collect().map(r => r.getAs[Double]("silhouette")).sorted
    assert(again.toSeq == got.values.map(_._2).toSeq.sorted)
    // a single-label partition has no "nearest other centroid":
    // silhouette is NULL (undefined), never NaN or a fabricated 0
    val solo = Seq((1L, 0, v(1.0)), (2L, 0, v(2.0)))
      .toDF("vec_id", "label", "embedding")
    val s1 = Similarity.labelSilhouette(solo, "vec_id", "label", "embedding")
      .collect()(0)
    assert(s1.getAs[Long]("n") == 2L &&
      s1.isNullAt(s1.fieldIndex("silhouette")))
  }

  test("mutualInfoTerms: a perfectly label-aligned token scores ln 2, " +
      "a label-independent token scores 0, minDf filters") {
    val docs = (0 until 10).map { i =>
      val body = if (i < 5) "signal common" else "common filler"
      (i.toLong, s"$body extra$i", i < 5)
    }.toDF("doc_id", "text", "y")
    val got = LanguageModel.mutualInfoTerms(docs, "doc_id", "text",
        col("y"), minDf = 3, k = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getAs[Double]("mi")))).toMap
    // signal: in exactly the 5 positive docs → I = ln 2 (one full bit)
    assert(got("signal")._1 == 5L && got("signal")._2 == 5L)
    assert(math.abs(got("signal")._3 - math.log(2.0)) < 1e-6)
    // common: in all docs → carries nothing → 0
    assert(got("common")._3 == 0.0, got("common").toString)
    // filler: in exactly the 5 negatives — same full bit as signal
    assert(math.abs(got("filler")._3 - math.log(2.0)) < 1e-6)
    // the extra<i> singletons fall below minDf
    assert(!got.keys.exists(_.startsWith("extra")))
  }

  test("mutualInfoTerms and labelSilhouette: null-label / null-vector " +
      "rows are invisible (the invariant the q196/q186 oracles mirror)") {
    val docs = (0 until 10).map { i =>
      val body = if (i < 5) "signal common" else "common filler"
      (i.toLong, s"$body extra$i", Some(i < 5))
    }
    val noisy = docs ++ Seq(
      (100L, "signal signal filler", Option.empty[Boolean]))
    def mi(rows: Seq[(Long, String, Option[Boolean])]) =
      LanguageModel.mutualInfoTerms(rows.toDF("doc_id", "text", "y"),
          "doc_id", "text", col("y"), minDf = 3, k = 10)
        .collect().map(_.toSeq).toSeq
    assert(mi(docs) == mi(noisy),
      "a null-label doc must affect neither incidence nor the totals")
    def v(x: Double) = Array(x.toFloat, 0f, 0f)
    val base = (0 until 5).map(i => (i.toLong, 0, Some(v(0.0 + i * 0.01)))) ++
      (0 until 5).map(i => (100L + i, 1, Some(v(10.0 + i * 0.01))))
    val withNullVec = base :+ ((200L, 0, Option.empty[Array[Float]]))
    def sil(rows: Seq[(Long, Int, Option[Array[Float]])]) =
      Similarity.labelSilhouette(rows.toDF("vec_id", "label", "embedding"),
        "vec_id", "label", "embedding").collect().map(_.toSeq).toSeq
    assert(sil(base) == sil(withNullVec),
      "a null-vector row must not count in centroids or the averages")
  }

  test("logOddsTerms: target-exclusive terms score positive, " +
      "rest-exclusive negative, and minCount filters") {
    val docs = Seq(
      (1L, "aa aa aa aa aa shared shared", "tgt"),
      (2L, "bb bb bb bb bb shared shared", "oth"),
      (3L, "rare", "tgt")).toDF("doc_id", "text", "source")
    val got = LanguageModel.logOddsTerms(docs, "doc_id", "text", "source",
        target = "tgt", minCount = 4, k = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getAs[Double]("log_odds")))).toMap
    assert(!got.contains("rare"), "minCount must drop the singleton")
    assert(got("aa")._1 == 5L && got("aa")._2 == 0L && got("aa")._3 > 0)
    assert(got("bb")._1 == 0L && got("bb")._2 == 5L && got("bb")._3 < 0)
    assert(math.abs(got("shared")._3) < got("aa")._3.abs)
  }
}
