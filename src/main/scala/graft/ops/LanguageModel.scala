package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-statistics language modeling for data curation: a bigram
  * transition model trained on the corpus itself, used to score documents
  * by average transition probability ("coherence") — the classic cheap
  * fluency proxy for filtering degenerate or shuffled text, alongside
  * [[TextFunctions]]' repetition and quality signals.
  *
  * Scale: bigram extraction is shuffle-free (array slicing per row, no
  * window); model training is one map-side-combinable count aggregation
  * keyed by (w1, w2); scoring is two hash joins on token keys. Nothing is
  * collected to the driver, so the model may be arbitrarily larger than
  * one machine — which a 100 TB corpus's bigram table is.
  */
object LanguageModel {

  /** (id, w1, w2) bigram rows — consecutive token pairs per document,
    * extracted by zipping the token array with itself shifted by one
    * (`arrays_zip(slice, slice)`: codegen'd array ops, no interpreted
    * lambda, no per-doc window shuffle). Docs with < 2 tokens emit no
    * rows. */
  def bigramRows(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val n = size(toks)
    df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("__id"), toks.as("__t"), n.as("__n"))
      .filter(col("__n") >= 2)
      .select(col("__id"),
        explode(arrays_zip(
          slice(col("__t"), lit(1), col("__n") - 1),
          slice(col("__t"), lit(2), col("__n") - 1))).as("__bg"))
      .select(col("__id"), col("__bg").getField("0").as("w1"),
        col("__bg").getField("1").as("w2"))
  }

  /** Bigram conditional-probability model over the corpus:
    * (w1, w2, p = count(w1 w2) / count(w1 ·)) where the denominator counts
    * w1 as a bigram head — so probabilities per w1 sum to exactly 1. */
  def bigramModel(corpus: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val bg = bigramRows(corpus, idCol, textCol)
    val pair = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c2"))
    val head = pair.groupBy(col("w1")).agg(sum(col("__c2")).as("__c1"))
    pair.join(head, Seq("w1"))
      .select(col("w1"), col("w2"), (col("__c2") / col("__c1")).as("p"))
  }

  /** One BPE merge-training step, distributed: count adjacent-character
    * pairs inside every (lowercased, whitespace-split) word across the
    * corpus and rank merge candidates by frequency. This is the hot
    * inner loop of byte-pair-encoding tokenizer training — every
    * iteration re-counts pairs over the full corpus, so at 100 TB the
    * count IS the job — and it is one map-side-combinable aggregation
    * over exploded (word, offset) rows: no window, no driver state, the
    * only shuffle carries (pair, partial-count). Ordering
    * (count desc, pair) is total, so the top-k merge list is
    * deterministic and oracle-replayable.
    * @return (pair, n) — the `topK` most frequent adjacent pairs */
  def bpePairCounts(df: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    require(topK >= 1, s"bpePairCounts: topK must be >= 1, got $topK")
    df.filter(col(idCol).isNotNull)
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .select(col("w"), explode(sequence(lit(1), length(col("w")) - 1)).as("i"))
      .select(expr("substring(w, i, 2)").as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("pair"))
      .limit(topK)
  }

  /** Per-document coherence: mean transition probability of the doc's
    * bigrams under [[bigramModel]] trained on `corpus`. The mean is a
    * decimal(27,15) sum over the (deterministic, IEEE-identical) double
    * probabilities divided by the bigram count — associative, so partial
    * merge order can't wiggle the score (the repo-wide float-avg rule).
    * Output: (idCol, n_bigrams, coherence). */
  def coherence(docs: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String): DataFrame =
    bigramRows(docs, idCol, textCol)
      .join(bigramModel(corpus, idCol, textCol), Seq("w1", "w2"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"),
        (sum(coalesce(col("p"), lit(0.0)).cast("decimal(27,15)"))
          .cast("double") / count(lit(1))).as("coherence"))
      .withColumnRenamed("__id", idCol)

  /** (id, w1, w2, w3) trigram rows — the [[bigramRows]] shape extended one
    * token: three aligned slices zipped per row, codegen'd array ops, no
    * shuffle. Docs with < 3 tokens emit no rows. */
  def trigramRows(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = TextFunctions.tokens(col(textCol))
    val n = size(toks)
    df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("__id"), toks.as("__t"), n.as("__n"))
      .filter(col("__n") >= 3)
      .select(col("__id"),
        explode(arrays_zip(
          slice(col("__t"), lit(1), col("__n") - 2),
          slice(col("__t"), lit(2), col("__n") - 2),
          slice(col("__t"), lit(3), col("__n") - 2))).as("__tg"))
      .select(col("__id"), col("__tg").getField("0").as("w1"),
        col("__tg").getField("1").as("w2"), col("__tg").getField("2").as("w3"))
  }

  /** Stupid Backoff trigram scoring (Brants et al. 2007) — the LM scoring
    * scheme DESIGNED for distributed corpus-scale models: no
    * discounting/normalization pass (which needs global coordination),
    * just relative frequencies with a fixed 0.4 back-off factor per
    * level:
    *   S(w3|w1,w2) = T(w1w2w3)/B(w1w2)            if the trigram was seen
    *               = 0.4 · B(w2w3)/U(w2)          else if the bigram was
    *               = 0.4² · (U(w3)+½)/N           else (½ = OOV floor).
    * Per-doc fluency = mean ln S over the doc's trigram positions — the
    * production-grade replacement for [[coherence]]'s unsmoothed bigram
    * mean.
    *
    * Scale: count tables are corpus-vocabulary-bounded and every join is
    * keyed on 1-3 tokens; N rides as a 1-row broadcast. The mean follows
    * the decimal(27,15) sum rule. Docs with < 3 tokens emit no row.
    *
    * @return (idCol, n_trigrams, sb_score) */
  def stupidBackoffScores(docs: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val uni = corpus.filter(col(idCol).isNotNull)
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("__u"))
    val total = uni.agg(sum(col("__u")).as("__nn"))
    val bi = bigramRows(corpus, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__b"))
    val tri = trigramRows(corpus, idCol, textCol)
      .groupBy(col("w1"), col("w2"), col("w3")).agg(count(lit(1)).as("__t"))
    val score = trigramRows(docs, idCol, textCol)
      .join(tri, Seq("w1", "w2", "w3"), "left")
      .join(bi, Seq("w1", "w2"), "left")
      .join(bi.select(col("w1").as("w2"), col("w2").as("w3"),
        col("__b").as("__b23")), Seq("w2", "w3"), "left")
      .join(uni.select(col("w").as("w2"), col("__u").as("__u2")), Seq("w2"), "left")
      .join(uni.select(col("w").as("w3"), col("__u").as("__u3")), Seq("w3"), "left")
      .crossJoin(broadcast(total))
      .select(col("__id"),
        when(col("__t").isNotNull,
            log(col("__t").cast("double") / col("__b")))
          .when(col("__b23").isNotNull,
            log(lit(0.4) * (col("__b23").cast("double") / col("__u2"))))
          .otherwise(
            // unigram floor; OOV words get half a count so the score
            // stays finite (ln 0 would poison the decimal-sum mean)
            log(lit(0.16) * ((coalesce(col("__u3"), lit(0L)).cast("double")
              + 0.5) / col("__nn"))))
          .as("__lns"))
    score.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_trigrams"),
        round(sum(col("__lns").cast("decimal(27,15)")).cast("double") /
          count(lit(1)), 6).as("sb_score"))
      .withColumnRenamed("__id", idCol)
  }

  /** CCNet-style quality bucketing: each document is scored by its
    * add-one-smoothed bigram cross-entropy under a model trained on
    * `corpus` — H(d) = −(1/n) Σ ln((c(w1,w2)+1)/(c(w1,·)+V)), V = tail
    * vocabulary — then the corpus is cut into equal-count thirds of the
    * score: `head` (most fluent), `middle`, `tail`. This is the
    * perplexity-tercile filter of CCNet (Wenzek et al. 2020), the
    * standard first quality gate of web-corpus curation; smoothing makes
    * the score well-defined for docs the model never saw, unlike the
    * unsmoothed [[coherence]] mean.
    *
    * Determinism and scale: the per-doc sum follows the decimal(27,15)
    * rule; terciles are RANK-based (floor(3·rank/n) on the bucketed
    * [[Curation.exclusivePrefixSum]] rank over (rounded score, id)), not
    * threshold-comparison-based — pure integer math, so no float-ulp can
    * move a boundary doc, and no global row_number window exists at any
    * scale. Model joins are keyed by token; V and n ride as 1-row
    * broadcasts.
    *
    * @return (idCol, n_bigrams, xent, bucket ∈ head|middle|tail) */
  def ccnetQualityBuckets(docs: DataFrame, corpus: DataFrame, idCol: String,
      textCol: String): DataFrame =
    ccnetQualityBuckets(docs, ccnetTrain(corpus, idCol, textCol), idCol,
      textCol)

  /** Trained CCNet bigram model: pair counts, head marginals, and the
    * 1-row tail-vocabulary size. Vocabulary-bounded, so a serving
    * pipeline trains ONCE, persists these, and scores many batches —
    * see [[ccnetTrain]]. */
  final case class BigramModel(pair: DataFrame, head: DataFrame,
      vocab: DataFrame) {
    /** Persist all three model tables (train-once semantics). */
    def persisted(): BigramModel = {
      pair.persist(); head.persist(); vocab.persist(); this
    }
  }

  /** The CCNet TRAIN pass, split out so callers can train once and score
    * repeatedly — a real pipeline trains the LM on a reference corpus one
    * time and broadcasts/persists it for every scoring batch. */
  def ccnetTrain(corpus: DataFrame, idCol: String,
      textCol: String): BigramModel = {
    val pair = bigramRows(corpus, idCol, textCol)
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("__c2"))
    val head = pair.groupBy(col("w1")).agg(sum(col("__c2")).as("__c1"))
    val vocab = pair.agg(countDistinct(col("w2")).as("__v"))
    BigramModel(pair, head, vocab)
  }

  /** Score + bucket against a pre-trained [[BigramModel]] (the SCORE
    * pass of [[ccnetQualityBuckets]]). */
  def ccnetQualityBuckets(docs: DataFrame, model: BigramModel,
      idCol: String, textCol: String): DataFrame = {
    val pair = model.pair
    val head = model.head
    val vocab = model.vocab
    // Measured-and-REVERTED (r18): pre-aggregating doc bigrams to
    // (doc, w1, w2, count) before the model join — the guide §2.3
    // "aggregate before you shuffle" shape, with the multiplicity folded
    // back exactly via decimal(27,15)×decimal(10,0) — read isolated
    // min-of-2 1× 3.29→3.74 s and 10× 3.82→17.4 s (quiet window, control
    // series attached in OPTIMIZATION_r18.md). Natural-text bigram
    // multiplicity per doc is ≈1, so the groupBy collapses almost
    // nothing while ADDING a full exchange + hash build over the
    // heavy (id, w1, w2) string rows; the model joins broadcast at every
    // measured scale, so per-occurrence rows never shuffled at all. Same
    // inversion class as the r17 heavy-payload checkpoints: never
    // materialize/shuffle variable-length payload frames to save work
    // that map-side partial aggregation already does.
    val nll = bigramRows(docs, idCol, textCol)
      .join(pair, Seq("w1", "w2"), "left")
      .join(head, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("__id"),
        (-log((coalesce(col("__c2"), lit(0L)) + lit(1.0)) /
          (coalesce(col("__c1"), lit(0L)) + col("__v")))).as("__nll"))
    val perDoc = nll.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("__nll").cast("decimal(27,15)")).cast("double") /
          count(lit(1)), 6).as("xent"))
    val n = perDoc.agg(count(lit(1)).as("__n"))
    Curation.exclusivePrefixSum(
        perDoc.withColumn("__one", lit(1L)), "xent", "__id", "__one", "__rank")
      .crossJoin(broadcast(n))
      .select(col("__id").as(idCol), col("n_bigrams"), col("xent"),
        element_at(array(lit("head"), lit("middle"), lit("tail")),
          expr("CAST((__rank * 3) div __n AS INT) + 1")).as("bucket"))
  }

  /** Pointwise-mutual-information collocation mining: every adjacent word
    * pair seen at least `minCount` times, scored by
    * PMI = ln(c(w1,w2) · N / (c(w1,·) · c(·,w2))) over the corpus's bigram
    * table (N = total bigrams; marginals are positional — w1 as head, w2
    * as tail — so the three counts come from one bigram extraction).
    * The classic collocation detector (Church & Hanks 1990), used in
    * pipelines to find multi-word units worth protecting from tokenizer
    * splits.
    *
    * Scale: one shuffle-free bigram extraction feeds three
    * map-side-combinable aggregations; the two marginal tables are
    * vocabulary-sized and join back onto the (already minCount-filtered)
    * pair table by key — never onto the corpus. N rides along as a 1-row
    * broadcast cross join. No driver collects; output is bounded by the
    * pair-vocabulary, not the corpus.
    *
    * Output: (w1, w2, pair_count, pmi) — full scored table, ordered by
    * (w1, w2); top-k selection is the caller's `.orderBy(...).limit(k)`.
    */
  def pmiCollocations(corpus: DataFrame, idCol: String, textCol: String,
      minCount: Long): DataFrame = {
    require(minCount >= 1, s"pmiCollocations: minCount must be >= 1, got $minCount")
    val bg = bigramRows(corpus, idCol, textCol)
    val pair = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("pair_count"))
      .filter(col("pair_count") >= minCount)
    val head = bg.groupBy(col("w1")).agg(count(lit(1)).as("__c1"))
    val tail = bg.groupBy(col("w2")).agg(count(lit(1)).as("__ct"))
    val total = bg.agg(count(lit(1)).as("__n"))
    pair.join(head, Seq("w1")).join(tail, Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("pair_count"),
        // marginal product as double×long, not long×long: c1·ct overflows
        // int64 once both marginals pass ~3e9 (a 100 TB corpus does), and
        // the oracle mirrors this exact shape so the rounding is identical
        log(col("pair_count").cast("double") * col("__n") /
          (col("__c1").cast("double") * col("__ct"))).as("pmi"))
      .orderBy(col("w1"), col("w2"))
  }

  /** Per-source unigram KL divergence from the corpus distribution —
    * the domain-shift monitor (CCNet's per-shard language-model distance,
    * reduced to unigrams): KL(p_src ‖ p_corpus) with add-one smoothing
    * over the corpus vocabulary, so a source whose word mix drifts from
    * the pool shows a rising score before any downstream model does.
    *
    * Numerically pinned: each term p·ln(p/q) is computed once in double,
    * rounded to 12 dp, and summed as decimal(27,15) (the q134 device) —
    * partial-merge order can't wiggle the divergence.
    *
    * Scale shape: token counts are map-side-combinable aggregates; the
    * (source × vocabulary) smoothing grid is |S|·|V| rows — sources are
    * few and the vocabulary is lexicon-sized, so the grid is bounded by
    * metadata scale, not corpus scale; the corpus totals ride in as a
    * broadcast 1-row aggregate.
    *
    * Output: (src, n_tokens, kl), kl rounded to 6 dp. */
  def sourceKlDivergence(corpus: DataFrame, idCol: String, textCol: String,
      srcCol: String): DataFrame = {
    val toks = TextFunctions.widen(corpus)
      .filter(col(idCol).isNotNull && col(srcCol).isNotNull)
      .select(col(srcCol).as("__src"),
        explode(TextFunctions.tokens(col(textCol))).as("__w"))
    val perSrcW = toks.groupBy(col("__src"), col("__w"))
      .agg(count(lit(1)).as("__cs"))
    val perW = perSrcW.groupBy(col("__w")).agg(sum(col("__cs")).as("__c"))
    val nS = perSrcW.groupBy(col("__src")).agg(sum(col("__cs")).as("__ns"))
    val tot = perW.agg(sum(col("__c")).as("__n"), count(lit(1)).as("__v"))
    val p = (coalesce(col("__cs"), lit(0L)) + 1).cast("double") /
      (col("__ns") + col("__v")).cast("double")
    val q = (col("__c") + 1).cast("double") /
      (col("__n") + col("__v")).cast("double")
    nS.crossJoin(perW)
      .join(perSrcW, Seq("__src", "__w"), "left")
      .crossJoin(broadcast(tot))
      .select(col("__src"), col("__ns"),
        round(p * log(p / q), 12).cast("decimal(27,15)").as("__t"))
      .groupBy(col("__src"))
      .agg(max(col("__ns")).as("n_tokens"),
        round(sum(col("__t")).cast("double"), 6).as("kl"))
      .select(col("__src").as("src"), col("n_tokens"), col("kl"))
  }

  /** Corpus-trained WordPiece-style vocabulary: every single character,
    * every whole word of ≤ `wholeWordLen` chars, and every length-3
    * substring whose corpus occurrence count (weighted by word
    * frequency) reaches `minSubCount`. The subword inventory greedy
    * segmentation ([[wordpieceSegment]]) matches against — the
    * APPLICATION side of the tokenizer whose TRAINING statistics
    * [[bpePairCounts]] computes. One column `piece`. */
  def wordpieceVocab(corpus: DataFrame, idCol: String, textCol: String,
      wholeWordLen: Int, minSubCount: Long): DataFrame = {
    val words = corpus.filter(col(idCol).isNotNull)
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("__cnt"))
      .filter(length(col("word")) >= 1)
    val chars = words
      .select(explode(split(col("word"), "")).as("piece"))
      .filter(length(col("piece")) === 1).distinct()
    val whole = words.filter(length(col("word")) <= wholeWordLen)
      .select(col("word").as("piece")).distinct()
    val subs = words
      .select(col("__cnt"), col("word"), explode(sequence(lit(1),
        greatest(length(col("word")) - 2, lit(0)))).as("__p"))
      .select(expr("substring(word, __p, 3)").as("piece"), col("__cnt"))
      .groupBy(col("piece")).agg(sum(col("__cnt")).as("__tot"))
      .filter(col("__tot") >= minSubCount && length(col("piece")) === 3)
      .select(col("piece"))
    chars.unionByName(whole).unionByName(subs).distinct()
  }

  /** Greedy longest-match WordPiece segmentation (Wu et al., "Google's
    * Neural Machine Translation System", 2016 — the maximal-munch
    * matching used by BERT tokenizers), applied Spark-first: the
    * longest-match table g(word, pos) is built RELATIONALLY — explode
    * every (pos, len ≤ `maxPieceLen`) candidate, equi-join the broadcast
    * vocabulary, take max(len) per position (single-char fallback 1, the
    * byte-fallback convention, so segmentation always terminates) — and
    * the greedy walk is ONE bounded `aggregate` fold per DISTINCT word
    * over its per-position match array, never a per-occurrence loop.
    *
    * Scale shape for 100 TB: everything downstream of the token count is
    * keyed on DISTINCT words — lexicon-sized (millions), not
    * corpus-sized (trillions); the corpus itself is touched exactly once
    * by the frequency count. A trillion-token corpus segments in one
    * map-side-combinable count plus lexicon-scale joins, and applying
    * the result to the token stream is one broadcast/hash join on the
    * word.
    *
    * Output: (word, cnt, n_pieces, pieces) — pieces space-joined with
    * the `##` continuation marker on non-initial pieces. Words longer
    * than `maxWordLen` chars are truncated to it (BERT's max-chars cap,
    * default 16 here). */
  def wordpieceSegment(corpus: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, pieceCol: String,
      maxPieceLen: Int = 4, maxWordLen: Int = 16): DataFrame = {
    require(maxPieceLen >= 1, s"wordpieceSegment: maxPieceLen >= 1")
    require(maxWordLen >= 1, s"wordpieceSegment: maxWordLen >= 1")
    val words = corpus.filter(col(idCol).isNotNull)
      .select(explode(TextFunctions.tokens(col(textCol))).as("__w0"))
      .groupBy(col("__w0")).agg(count(lit(1)).as("cnt"))
      .select(substring(col("__w0"), 1, maxWordLen).as("word"), col("cnt"))
      .groupBy(col("word")).agg(sum(col("cnt")).as("cnt"))
      .withColumn("__len", length(col("word")))
      .filter(col("__len") >= 1)
    val cands = words
      .select(col("word"), col("__len"),
        explode(sequence(lit(0), col("__len") - 1)).as("__p"))
      .select(col("word"), col("__p"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), col("__len") - col("__p")))).as("__l"))
      .select(col("word"), col("__p"), col("__l"),
        expr("substring(word, __p + 1, __l)").as("__piece"))
    val matched = cands
      .join(broadcast(vocab.select(col(pieceCol).as("__piece")).distinct()),
        Seq("__piece"))
      .groupBy(col("word"), col("__p")).agg(max(col("__l")).as("__g"))
    val gtab = words
      .select(col("word"), col("__len"),
        explode(sequence(lit(0), col("__len") - 1)).as("__p"))
      .join(matched, Seq("word", "__p"), "left")
      .groupBy(col("word"))
      .agg(transform(array_sort(collect_list(
        struct(col("__p"), coalesce(col("__g"), lit(1)).as("__g")))),
        s => s.getField("__g")).as("__garr"))
    // greedy walk: one bounded fold per distinct word; acc = (pos, pieces)
    val seg = words.join(gtab, Seq("word"))
      .withColumn("__acc", aggregate(
        sequence(lit(1), lit(maxWordLen)),
        struct(lit(0).as("pos"), lit("").as("pieces"), lit(0L).as("np")),
        (acc, _) => {
          val pos = acc.getField("pos")
          val g = element_at(col("__garr"), pos + 1)
          val p = concat(
            when(pos > 0, lit("##")).otherwise(lit("")),
            col("word").substr(pos + 1, g))
          when(pos < col("__len"),
            struct((pos + g).as("pos"),
              when(pos === 0, p).otherwise(
                concat(acc.getField("pieces"), lit(" "), p)).as("pieces"),
              (acc.getField("np") + 1L).as("np")))
            .otherwise(acc)
        }))
      .select(col("word"), col("cnt"),
        col("__acc.np").as("n_pieces"),
        col("__acc.pieces").as("pieces"))
    seg
  }

  /** Unigram-LM vocabulary with integer log-probability scores — the
    * model side of [[unigramSegment]], closing the tokenizer triad
    * (BPE [[bpeTrain]], WordPiece [[wordpieceVocab]], unigram — Kudo,
    * "Subword Regularization", ACL 2018 / SentencePiece's unigram mode).
    * Candidate pieces are every substring of length ≤ `maxPieceLen` of
    * the (≤ `maxWordLen`-char) corpus words; piece frequency = Σ over
    * occurrences of the containing word's count; pieces below `minCount`
    * are dropped UNLESS single-char (the character fallback must stay
    * complete). Score = round(ln(freq / Σfreq) · 10⁶) — integer
    * MICRO-NATS, so the Viterbi DP downstream is all-integer arithmetic
    * with no float drift anywhere (the q169 device; the single ln+round
    * per piece is the q138-proven cross-engine step).
    *
    * Scale: lexicon-sized throughout — one corpus pass for word counts,
    * then ≤ 48 substring rows per DISTINCT word, one map-side-combinable
    * frequency aggregate, one 1-row broadcast of the total.
    *
    * @return (piece, freq, score_micro) */
  def unigramVocab(corpus: DataFrame, idCol: String, textCol: String,
      maxPieceLen: Int = 4, maxWordLen: Int = 12,
      minCount: Long = 2): DataFrame = {
    require(maxWordLen >= 1, s"unigramVocab: maxWordLen must be >= 1")
    val words = TextFunctions.widen(corpus.filter(col(idCol).isNotNull))
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "" && length(col("word")) <= maxWordLen)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    unigramVocabWords(words, maxPieceLen, minCount)
  }

  /** The vocabulary derivation of [[unigramVocab]] over a pre-aggregated
    * `(word, cnt)` table — split out (like [[unigramSegmentWords]]) so a
    * caller holding word counts doesn't pay a second corpus scan. */
  def unigramVocabWords(wordCounts: DataFrame, maxPieceLen: Int = 4,
      minCount: Long = 2): DataFrame = {
    require(maxPieceLen >= 1, s"unigramVocab: maxPieceLen must be >= 1")
    val freqs = wordCounts
      .select(col("word"), col("cnt"), length(col("word")).as("__len"))
      .select(col("word"), col("cnt"),
        explode(sequence(lit(0), col("__len") - 1)).as("__p"),
        col("__len"))
      .select(col("cnt"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), col("__len") - col("__p")))).as("__l"),
        col("word"), col("__p"))
      .select(col("word").substr(col("__p") + 1, col("__l")).as("piece"),
        col("cnt"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("freq"))
      .filter(col("freq") >= minCount || length(col("piece")) === 1)
    val tot = freqs.agg(sum(col("freq")).as("__tot"))
    freqs.crossJoin(broadcast(tot))
      .select(col("piece"), col("freq"),
        // explicit ⌊x+0.5⌋, not round(): identical IEEE floor on every
        // engine (the q144 device) — round()'s negative-half handling is
        // engine-defined
        floor(log(col("freq").cast("double") / col("__tot").cast("double"))
          * 1000000.0 + 0.5).cast("long").as("score_micro"))
  }

  /** Viterbi unigram-LM segmentation: each distinct word's best
    * segmentation under the additive piece scores of [[unigramVocab]]
    * (maximize Σ score_micro; a single char absent from the vocabulary
    * scores the −20·10⁶ micro-nat UNK floor, so segmentation always
    * terminates). Ties break to the LONGER final piece at each DP cell
    * (max score, then smallest split point) — a total order, so the
    * result is deterministic and the oracle replays it cell by cell.
    *
    * Spark-first shape, same lattice as [[wordpieceSegment]]: candidate
    * (position, length) pieces explode relationally and equi-join the
    * broadcast vocabulary once; the DP itself is ONE bounded `aggregate`
    * fold per DISTINCT word over a dense edge-score array — the fold
    * appends best[i] = max_l (best[i−l] + score(i−l, l)) carrying
    * (score, n_pieces, segmentation) per cell. Everything downstream of
    * the corpus word count is lexicon-sized; the corpus is scanned once.
    * All-integer scores — engines cannot diverge in the DP.
    *
    * @param vocab (piece, score_micro) from [[unigramVocab]]
    * @return (word, cnt, n_pieces, score_micro, pieces) */
  def unigramSegment(corpus: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, maxPieceLen: Int = 4, maxWordLen: Int = 12): DataFrame = {
    val words = TextFunctions.widen(corpus.filter(col(idCol).isNotNull))
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "" && length(col("word")) <= maxWordLen)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    unigramSegmentWords(words, vocab, maxPieceLen)
  }

  /** The Viterbi DP of [[unigramSegment]] over a pre-aggregated
    * `(word, cnt)` table — split out so callers that already hold word
    * counts (e.g. [[unigramFertility]]'s per-source table) don't pay a
    * second corpus scan. Same contract as [[unigramSegment]]. */
  def unigramSegmentWords(wordCounts: DataFrame, vocab: DataFrame,
      maxPieceLen: Int = 4): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 7,
      s"unigramSegment: maxPieceLen in 1..7 (edge key packs l into 3 bits)")
    val UnkFloor = -20000000L
    val words = wordCounts.select(col("word"), col("cnt"))
      .withColumn("__len", length(col("word")))
    val edges = words
      .select(col("word"), explode(sequence(lit(0), col("__len") - 1)).as("__p"),
        col("__len"))
      .select(col("word"), col("__p"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), col("__len") - col("__p")))).as("__l"))
      .join(broadcast(vocab.select(col("piece"), col("score_micro"))),
        col("piece") === col("word").substr(col("__p") + 1, col("__l")))
      .groupBy(col("word"))
      .agg(map_from_entries(collect_list(
        struct((col("__p") * 8 + col("__l")).as("k"),
          col("score_micro").as("v")))).as("__em"))
    val dp = words.join(edges, Seq("word"), "left")
      .withColumn("__best", aggregate(
        sequence(lit(1), col("__len")),
        array(struct(lit(0L).as("sc"), lit(0L).as("np"), lit("").as("seg"))),
        (acc, i) => {
          val cands = (1 to maxPieceLen).map { l =>
            val j = i - l
            val prev = element_at(acc, j + 1)
            val piece = col("word").substr(j + 1, lit(l))
            val edge =
              if (l == 1)
                coalesce(element_at(col("__em"), j * 8 + lit(l)), lit(UnkFloor))
              else element_at(col("__em"), j * 8 + lit(l))
            when(lit(l) <= i && edge.isNotNull,
              // (-j) second: struct comparison is lexicographic, so
              // array_max = best score, ties to smallest split point j
              // (the longest final piece)
              struct((prev.getField("sc") + edge).as("sc"),
                (-j).cast("long").as("negj"),
                (prev.getField("np") + 1L).as("np"),
                when(prev.getField("seg") === lit(""), piece)
                  .otherwise(concat(prev.getField("seg"), lit(" "), piece))
                  .as("seg")))
          }
          val best = array_max(filter(array(cands: _*), c => c.isNotNull))
          concat(acc, array(struct(best.getField("sc").as("sc"),
            best.getField("np").as("np"), best.getField("seg").as("seg"))))
        }))
      .withColumn("__fin", element_at(col("__best"), col("__len") + 1))
    dp.select(col("word"), col("cnt"),
      col("__fin.np").as("n_pieces"),
      col("__fin.sc").as("score_micro"),
      col("__fin.seg").as("pieces"))
  }

  /** Tokenizer fertility / compression evaluation per group — the
    * MEASUREMENT step of the tokenizer lifecycle (train q161/q181, apply
    * q173/q181): fertility (pieces per word, Rust et al. 2021's
    * cross-lingual tokenizer-quality metric), chars-per-piece
    * (compression), and the fraction of word occurrences the vocabulary
    * keeps whole. A tokenizer that fragments one source's text drives up
    * its sequence lengths and training cost — this is the table that
    * decision reads.
    *
    * One corpus scan builds the per-(group, word) occurrence counts; the
    * global word table derives from it by a second map-side-combinable
    * aggregate (no re-scan); the Viterbi DP is lexicon-sized
    * ([[unigramSegmentWords]]); the fertility join is word-keyed and
    * lexicon-bounded; output is one row per group. All numerators are
    * integer sums — the only floats are the three final divisions.
    *
    * @return (group, n_words, n_pieces, n_chars, fertility,
    *         chars_per_piece, pct_whole) sorted by group */
  def unigramFertility(corpus: DataFrame, idCol: String, textCol: String,
      grpCol: String, vocab: DataFrame, maxPieceLen: Int = 4,
      maxWordLen: Int = 12): DataFrame =
    fertilityFromCounts(
      groupedWordCounts(corpus, idCol, textCol, grpCol, maxWordLen),
      vocab, maxPieceLen)

  /** [[unigramFertility]] with the tokenizer trained on the SAME corpus
    * (the in-corpus fertility report a tokenizer trainer emits): the
    * per-(group, word) aggregate feeds the vocabulary, the Viterbi DP,
    * and the fertility join, so Catalyst's exchange reuse collapses the
    * whole query to ONE corpus scan — at 100 TB that halves the I/O of
    * the train-then-evaluate pair. */
  def unigramFertilitySelfTrained(corpus: DataFrame, idCol: String,
      textCol: String, grpCol: String, maxPieceLen: Int = 4,
      maxWordLen: Int = 12, minCount: Long = 2): DataFrame = {
    val sw = groupedWordCounts(corpus, idCol, textCol, grpCol, maxWordLen)
    val words = sw.groupBy(col("word")).agg(sum(col("cnt")).as("cnt"))
    fertilityFromCounts(sw, unigramVocabWords(words, maxPieceLen, minCount),
      maxPieceLen)
  }

  private def groupedWordCounts(corpus: DataFrame, idCol: String,
      textCol: String, grpCol: String, maxWordLen: Int): DataFrame =
    TextFunctions.widen(corpus.filter(col(idCol).isNotNull))
      .select(col(grpCol).as("group"),
        explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "" && length(col("word")) <= maxWordLen)
      .groupBy(col("group"), col("word")).agg(count(lit(1)).as("cnt"))

  private def fertilityFromCounts(sw: DataFrame, vocab: DataFrame,
      maxPieceLen: Int): DataFrame = {
    val seg = unigramSegmentWords(
      sw.groupBy(col("word")).agg(sum(col("cnt")).as("cnt")),
      vocab, maxPieceLen)
    sw.join(seg.select(col("word"), col("n_pieces")), Seq("word"))
      .groupBy(col("group"))
      .agg(sum(col("cnt")).as("n_words"),
        sum(col("cnt") * col("n_pieces")).as("n_pieces"),
        sum(col("cnt") * length(col("word"))).as("n_chars"),
        sum(when(col("n_pieces") === 1L, col("cnt")).otherwise(0L))
          .as("__whole"))
      .select(col("group"), col("n_words"), col("n_pieces"), col("n_chars"),
        round(col("n_pieces").cast("double") / col("n_words"), 6)
          .as("fertility"),
        round(col("n_chars").cast("double") / col("n_pieces"), 6)
          .as("chars_per_piece"),
        round(col("__whole").cast("double") / col("n_words"), 6)
          .as("pct_whole"))
      .orderBy(col("group"))
  }

  /** Distinct-n diversity ratios (Li et al. 2016's distinct-1/distinct-2,
    * the standard synthetic-text / mode-collapse detector): per group,
    * the fraction of unigram and bigram OCCURRENCES that are distinct
    * types. Templated or model-generated text repeats n-grams and scores
    * low; natural text scores high. Two map-side-combinable aggregations
    * keyed by group, one join on the (tiny) group key — nothing
    * corpus-sized crosses the wire twice.
    *
    * @return (grpCol, n_tokens, distinct1_ratio, n_bigrams,
    *         distinct2_ratio) */
  def distinctNgramRatios(docs: DataFrame, idCol: String, textCol: String,
      grpCol: String): DataFrame = {
    val base = TextFunctions.widen(
      docs.filter(col(idCol).isNotNull && col(grpCol).isNotNull))
    val uni = base
      .select(col(grpCol), explode(TextFunctions.tokens(col(textCol))).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col(grpCol))
      .agg(count(lit(1)).as("n_tokens"),
        countDistinct(col("__w")).as("__d1"))
    val bi = bigramRows(base, idCol, textCol)
      .join(base.select(col(idCol).as("__id"), col(grpCol)), Seq("__id"))
      .groupBy(col(grpCol))
      .agg(count(lit(1)).as("n_bigrams"),
        countDistinct(col("w1"), col("w2")).as("__d2"))
    uni.join(bi, Seq(grpCol), "left")
      .select(col(grpCol), col("n_tokens"),
        round(col("__d1").cast("double") / col("n_tokens"), 6)
          .as("distinct1_ratio"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        when(col("n_bigrams").isNotNull,
          round(col("__d2").cast("double") / col("n_bigrams"), 6))
          .as("distinct2_ratio"))
  }

  /** Smoothed log-odds over-indexing terms (the Monroe et al. 2008
    * "fightin' words" device): which terms does the `target` slice of the
    * corpus over-use relative to everything else? Each term scores
    * `ln(((ca+1)/(na+V)) / ((cb+1)/(nb+V)))` — add-one-smoothed
    * probability ratio between the target slice (a) and the rest (b),
    * V = joint vocabulary size. The per-TERM drill-down companion to the
    * per-SOURCE aggregate [[sourceKlDivergence]]: KL says THAT a source
    * drifted, log-odds says WHICH WORDS carry the drift.
    *
    * Scale: one token-keyed count (map-side combined, both slices in one
    * pass via conditional sums), a 1-row broadcast of totals, and a
    * rank-truncated top-k (TakeOrdered, never a global sort).
    *
    * @return (term, ca, cb, log_odds) — top k by log-odds desc, term asc */
  def logOddsTerms(docs: DataFrame, idCol: String, textCol: String,
      grpCol: String, target: String, minCount: Long = 10,
      k: Int = 20): DataFrame = {
    val toks = TextFunctions.widen(docs)
      .filter(col(idCol).isNotNull && col(grpCol).isNotNull)
      .select((col(grpCol) === target).as("__a"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(col("term") =!= "")
    val counts = toks.groupBy(col("term")).agg(
      sum(when(col("__a"), 1L).otherwise(0L)).as("ca"),
      sum(when(col("__a"), 0L).otherwise(1L)).as("cb"))
    val totals = counts.agg(sum(col("ca")).as("__na"),
      sum(col("cb")).as("__nb"), count(lit(1)).as("__v"))
    counts.crossJoin(broadcast(totals))
      .filter(col("ca") + col("cb") >= minCount)
      .select(col("term"), col("ca"), col("cb"),
        round(log(
          ((col("ca") + 1).cast("double") / (col("__na") + col("__v"))) /
          ((col("cb") + 1).cast("double") / (col("__nb") + col("__v")))),
          6).as("log_odds"))
      .orderBy(col("log_odds").desc, col("term")).limit(k)
  }

  /** Pointwise mutual-information FEATURE SELECTION against a boolean
    * document label — the step between labeling and training in a
    * classifier pipeline (which tokens carry signal about the label?):
    * per token, the 2×2 document-incidence table (has-token ×
    * is-positive) and its mutual information
    * I = Σ_cells (n/N)·ln(N·n/(row·col)), the exact discrete MI with
    * 0·ln0 = 0. The supervised companion to the unsupervised
    * [[logOddsTerms]] keyness: log-odds contrasts corpus slices, MI
    * ranks tokens by how much they REDUCE LABEL UNCERTAINTY — the
    * textbook selection criterion before training a filter model.
    *
    * Determinism: all four cells are exact integer DOCUMENT counts
    * (per-doc distinct tokens, so a token repeated in one doc counts
    * once); the four MI terms are fixed-order double arithmetic on
    * those integers, summed as 12-dp decimal — bit-stable anywhere.
    *
    * Scale: one distinct-(doc, token) explode into a token-keyed count
    * (map-side combined), a 1-row broadcast of (N, P), a pure
    * projection, and a rank-truncated top-k (TakeOrdered, never a
    * global sort).
    *
    * @param label boolean ground-truth column expression
    * @return (term, df, df_pos, mi) — top k by MI desc, term asc */
  def mutualInfoTerms(docs: DataFrame, idCol: String, textCol: String,
      label: Column, minDf: Long = 5, k: Int = 20): DataFrame = {
    require(k >= 1 && minDf >= 1, s"mutualInfoTerms: k >= 1, minDf >= 1")
    val incidence = TextFunctions.widen(docs)
      .filter(col(idCol).isNotNull)
      .select(col(idCol).as("__id"), label.as("__y"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .filter(col("__y").isNotNull && col("term") =!= "")
      .distinct()
    val counts = incidence.groupBy(col("term")).agg(
      count(lit(1)).as("df"),
      sum(when(col("__y"), 1L).otherwise(0L)).as("df_pos"))
    val totals = TextFunctions.widen(docs)
      .filter(col(idCol).isNotNull && label.isNotNull)
      .agg(count(lit(1)).as("__N"),
        sum(when(label, 1L).otherwise(0L)).as("__P"))
    val n = col("__N").cast("double")
    def cell(nij: Column, row: Column, colTot: Column) =
      when(nij > 0,
        round(nij.cast("double") / n *
          log(n * nij.cast("double") /
            (row.cast("double") * colTot.cast("double"))), 12))
        .otherwise(lit(0.0))
    counts.filter(col("df") >= minDf)
      .crossJoin(broadcast(totals))
      .select(col("term"), col("df"), col("df_pos"),
        round((
          cell(col("df_pos"), col("df"), col("__P"))
            .cast("decimal(27,15)") +
          cell(col("df") - col("df_pos"), col("df"), col("__N") - col("__P"))
            .cast("decimal(27,15)") +
          cell(col("__P") - col("df_pos"), col("__N") - col("df"), col("__P"))
            .cast("decimal(27,15)") +
          cell(col("__N") - col("__P") - col("df") + col("df_pos"),
            col("__N") - col("df"), col("__N") - col("__P"))
            .cast("decimal(27,15)")).cast("double"), 6).as("mi"))
      .orderBy(col("mi").desc, col("term")).limit(k)
  }

  /** BPE merge-rule TRAINING (Sennrich et al. 2016) — the other half of
    * the tokenizer family next to [[wordpieceVocab]]/[[wordpieceSegment]]:
    * start from characters, repeatedly merge the most frequent adjacent
    * symbol pair (ties break lexicographically on (left, right)), emit
    * the ordered merge table. Words ride as marker-delimited symbol
    * strings (`␁l ␁o ␁w ` — every symbol PREFIXED by  and
    * FOLLOWED by one space; the marker is U+0001) so each merge round is ONE codegen'd
    * `replace` of `"␁l ␁r "` with `"␁lr "`. The marker layout makes
    * non-overlapping left-to-right replacement EXACTLY canonical
    * leftmost-first BPE: each match ends at the next symbol's marker, so
    * no boundary character is ever consumed from the following pair — a
    * plain space-separated form drops every other merge in runs of
    * identical symbols (`a a a a` would merge once, not twice; caught by
    * the PropertySpec cross-check against a straight-line reference).
    * The identical `replace` builtin exists in the oracle's SQL dialect
    * so the rounds replay bit-for-bit. Tokens containing U+0001 would
    * break the symbol boundary; real tokenizers strip control
    * characters, and the length cap already bounds pathological input.
    *
    * Scale: the working set is the DISTINCT-WORD frequency table
    * (vocabulary-sized, persisted once — the corpus is tokenized exactly
    * once no matter how many merges), each round is a map-side-combinable
    * pair count + a top-1 `TakeOrdered` (never a global sort) + a
    * projection. The only driver materialization is ONE ROW per merge —
    * the trained-model pattern (k centroids, k seeds). nMerges is the
    * model size, fixed and small, never data-sized.
    *
    * @return (step, merge_left, merge_right, pair_count), step 1-based */
  def bpeTrain(corpus: DataFrame, idCol: String, textCol: String,
      nMerges: Int, maxWordLen: Int = 12): DataFrame = {
    require(nMerges >= 1, s"bpeTrain: nMerges >= 1, got $nMerges")
    val spark = corpus.sparkSession
    val wf = TextFunctions.widen(corpus.filter(col(idCol).isNotNull))
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "" && length(col("w")) <= maxWordLen)
      .groupBy(col("w")).agg(count(lit(1)).as("__f"))
      .select(regexp_replace(col("w"), "(.)", "\u0001$1 ").as("__s"),
        col("__f"))
      .persist()
    var words = wf
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= nMerges && !done) {
      val pairs = words
        .select(split(trim(col("__s")), " ").as("__a"), col("__f"))
        .filter(size(col("__a")) >= 2)
        .select(explode(arrays_zip(
          slice(col("__a"), lit(1), size(col("__a")) - 1).as("l"),
          slice(col("__a"), lit(2), size(col("__a")) - 1).as("r"))).as("__p"),
          col("__f"))
        .groupBy(col("__p.l").as("lft"), col("__p.r").as("rgt"))
        .agg(sum(col("__f")).as("__c"))
      // top-1 with deterministic tie-break; Catalyst plans this as
      // TakeOrdered (per-partition top-1 + driver merge), not a sort
      val best = pairs.orderBy(col("__c").desc, col("lft"), col("rgt"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        // lft/rgt carry the U+0001 prefix internally (constant across
        // symbols, so the lexicographic tie-break is unchanged); the
        // emitted merge table strips it
        val (l, r, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((step, l.drop(1), r.drop(1), c))
        words = words.withColumn("__s",
          replace(col("__s"), lit(s"$l $r "), lit(s"$l${r.drop(1)} ")))
        step += 1
      }
    }
    wf.unpersist(false)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("step",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("merge_left",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("merge_right",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("pair_count",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val rows = merges.toSeq.map { case (s, l, r, c) =>
      org.apache.spark.sql.Row(s, l, r, c)
    }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
  }

  /** BPE SEGMENTATION — apply a learned merge list ([[bpeTrain]]'s
    * output, or any (merge_left, merge_right) table) to every distinct
    * word: start from characters, apply each merge IN TRAINING ORDER as
    * one codegen'd `replace` over the marker-delimited symbol string
    * (the same U+0001 layout as training, so application is exactly the
    * canonical leftmost-first walk the rules were learned under). The
    * train → apply pair is the full tokenizer lifecycle; the merge list
    * is model-sized (collected bounded rows, like k centroids), the
    * corpus is touched once by the distinct-word census, and the chained
    * replaces are a single projection — zero joins.
    *
    * @param merges (merge_left, merge_right) rows with a `step` order
    * @return (word, n_pieces, pieces) — pieces space-joined */
  def bpeSegment(corpus: DataFrame, idCol: String, textCol: String,
      merges: DataFrame, maxWordLen: Int = 12): DataFrame = {
    val rules = merges.orderBy(col("step"))
      .select(col("merge_left"), col("merge_right"))
      .collect() // model-sized: one row per learned merge
      .map(r => (r.getString(0), r.getString(1)))
    val words = TextFunctions.widen(corpus.filter(col(idCol).isNotNull))
      .select(explode(TextFunctions.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "" && length(col("word")) <= maxWordLen)
      .distinct()
    val spaced = regexp_replace(col("word"), "(.)", "\u0001$1 ")
    val applied = rules.foldLeft(spaced) { case (s, (l, r)) =>
      replace(s, lit(s"\u0001$l \u0001$r "), lit(s"\u0001$l$r "))
    }
    words
      .withColumn("__seg", trim(applied))
      .select(col("word"),
        size(split(col("__seg"), " ")).cast("long").as("n_pieces"),
        translate(col("__seg"), "\u0001", "").as("pieces"))
  }
}
