package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: PII redaction,
  * deterministic train/val/test splits, hash-based stratified sampling,
  * sequence packing (via a distributed prefix sum), domain mixing
  * (weighted replication), and train/test decontamination.
  *
  * The reference engine (lance-namespace-impls) stops at catalog + scan;
  * these are the operations a 100 TB pretraining pipeline runs ON the
  * tables the catalog serves, built to the same rules as [[Dedup]]:
  * pure DataFrame plans over codegen'd functions, no UDFs, no driver
  * collects, and every randomized choice replaced by a salted md5 hash so
  * results are reproducible run-to-run and engine-portable (the DuckDB
  * oracle mirrors each expression bit-for-bit).
  */
object Curation {

  // --- PII redaction -------------------------------------------------------
  // Patterns are RE2-safe (no lookarounds, no backrefs) so the same string
  // works in Java regex (Spark) and RE2 (DuckDB/most scrubbing pipelines).

  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhonePattern = "\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b"

  /** Replace emails, IPv4s, and phone-shaped numbers with typed tokens.
    * Email runs first: the other two patterns are all-digit and can't
    * overlap an address, so the order is only about not re-scanning
    * replacement tokens. Pure per-row codegen'd work — no shuffle. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "<EMAIL>"),
        Ipv4Pattern, "<IP>"),
      PhonePattern, "<PHONE>")

  /** Match counts per PII class (audit/reporting side of redaction). */
  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long")
  def ipv4Count(text: Column): Column =
    size(regexp_extract_all(text, lit(Ipv4Pattern), lit(0))).cast("long")
  def phoneCount(text: Column): Column =
    size(regexp_extract_all(text, lit(PhonePattern), lit(0))).cast("long")

  // --- Deterministic hash buckets ------------------------------------------

  /** Salted uniform bucket in [0, buckets): first 8 hex chars of
    * md5(salt ":" id) as an integer, mod buckets. Deterministic across
    * runs, partitionings, and engines — the property that makes splits
    * and samples reproducible and join-free at any scale. */
  def hashBucket(id: Column, salt: String, buckets: Int): Column =
    pmod(
      conv(substring(md5(concat(lit(salt + ":"), id.cast("string")).cast("binary")),
        1, 8), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** Train/val/test assignment by hash bucket of the doc id — the standard
    * leakage-safe split (membership depends only on the id, so re-running
    * over a grown corpus never moves an old doc across splits). */
  def splitAssign(id: Column, trainPct: Int = 98, valPct: Int = 1): Column = {
    val b = hashBucket(id, "split", 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Keep-this-row predicate for deterministic sampling at `ppm` parts per
    * million. Rates are integer ppm, not doubles: a double→int cast floors
    * in Spark but rounds in DuckDB, so portable pipelines pin the integer.
    * Per-stratum rates are just a ppm column (e.g. a CASE over the stratum
    * key or a broadcast-joined rate table). */
  def sampleKeep(id: Column, ppm: Column, salt: String = "sample"): Column =
    hashBucket(id, salt, 1000000) < ppm

  /** Deterministic corpus shuffle key: globally reordering a corpus for
    * training is `orderBy(shuffleKey)` — a range-partitioned sort, the
    * scalable way to "shuffle" 100 TB reproducibly. */
  def shuffleKey(id: Column, salt: String = "shuffle"): Column =
    md5(concat(lit(salt + ":"), id.cast("string")).cast("binary"))

  /** Deterministic epoch shuffle + exactly-balanced shard assignment —
    * the data-loader prep step: every row gets a seeded permutation rank
    * and a round-robin shard, so S downstream writers each receive a
    * uniformly-shuffled slice whose sizes differ by at most one row.
    * shuffle_key = md5("epoch<seed>:" + id); the global 0-based rank is
    * the count of rows ordered before (key-prefix-as-60-bit-int, id) —
    * computed by the bucketed [[exclusivePrefixSum]], NOT a global
    * row_number window, so no single-partition sort exists at any scale.
    * shard = rank mod S (exact balance by construction — a hash-mod shard
    * would only balance in expectation), pos = rank div S (the row's
    * offset within its shard, already in shuffled order).
    *
    * The 15-hex-char numeric prefix orders identically to the full hex
    * key (fixed-width lowercase hex is lexicographic-equals-numeric);
    * rank ties beyond it break on id, mirrored verbatim by the oracle. */
  def epochShardAssign(df: DataFrame, idCol: String, seed: Long,
      numShards: Int): DataFrame = {
    require(numShards >= 1, s"epochShardAssign: numShards must be >= 1, got $numShards")
    val keyed = df
      .select(col(idCol), shuffleKey(col(idCol), s"epoch$seed").as("shuffle_key"))
      .withColumn("__kn", conv(substring(col("shuffle_key"), 1, 15), 16, 10)
        .cast("long"))
      .withColumn("__one", lit(1L))
    // __kn is a fixed-width md5 prefix — uniform over [0, 16^15) by
    // construction, so the bucket boundaries are literals and the
    // percentile pass is skipped (results identical; boundaries only
    // steer grouping)
    exclusivePrefixSumUniform(keyed, "__kn", idCol, "__one", "__rank",
      0.0, math.pow(16.0, 15))
      .select(col(idCol), col("shuffle_key"),
        pmod(col("__rank"), lit(numShards.toLong)).as("shard"),
        floor(col("__rank") / numShards).cast("long").as("pos"))
  }

  /** Weighted sampling WITHOUT replacement, k per stratum, deterministic:
    * the Efraimidis–Spirakis exponential-jitter key. Each row draws
    * u ∈ (0,1) from its salted hash (bucket midpoint, so u is never 0 or
    * 1) and is ranked by -ln(u)/w ascending — the k smallest keys are a
    * bona-fide weight-proportional sample without replacement, unlike the
    * Bernoulli [[sampleKeep]] whose output size is only expected, not
    * exact. Hash-derived u makes the draw reproducible and join-free at
    * any scale; the rank-truncated per-stratum window compiles to
    * WindowGroupLimit (per-partition top-k before the shuffle), so no
    * stratum ever materializes fully sorted.
    *
    * @param weight strictly positive weight expression
    * @return input columns + (`pos` 1..k within stratum, `wkey` the
    *         jitter key) for the k winners per stratum */
  def weightedSampleTopK(df: DataFrame, idCol: String, strataCol: String,
      weight: Column, k: Int, salt: String = "wtopk"): DataFrame = {
    require(k >= 1, s"weightedSampleTopK: k must be >= 1, got $k")
    require(!df.columns.contains("wkey") && !df.columns.contains("pos"),
      "weightedSampleTopK: input must not already have wkey/pos columns " +
        "(reserved outputs)")
    val u = (hashBucket(col(idCol), salt, 1000000) + lit(0.5)) / lit(1000000.0)
    // runtime guard, not just doc: weight = 0 would key to +Inf and a
    // negative weight to a negative key that sorts FIRST (inverted
    // bias, silently guaranteed a slot) — fail the job instead
    val key = when(assert_true(weight > 0,
        lit("weightedSampleTopK: weight must be strictly positive")).isNull,
      -log(u) / weight)
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("wkey"), col(idCol))
    df.withColumn("wkey", key)
      .withColumn("pos", row_number().over(w).cast("long"))
      .filter(col("pos") <= k)
  }

  /** Per-source document cap + round-robin interleave — the RefinedWeb-
    * style budget step: each source keeps at most `k` documents (chosen
    * by a seeded per-source shuffle, so the survivors are an unbiased
    * slice, not the head of ingest order) and the survivors are laid out
    * round-robin across sources (all sources' rank-1 docs, then rank-2,
    * …) so a sequential reader of the capped corpus sees every source
    * immediately instead of megabatches of one domain.
    *
    * Scale: the per-source rank is a keyed window that compiles to
    * WindowGroupLimit (per-partition top-k before the shuffle — no
    * source ever materializes fully sorted); the source index is a
    * window over ONE ROW PER SOURCE (the [[temperatureMixtureSample]]
    * precedent); the global position rides the bucketed
    * [[exclusivePrefixSum]] on (rank, source-index) — never a global
    * row_number window. Output size is k·|sources| regardless of corpus
    * size.
    *
    * @return (pos 0-based global round-robin position, srcCol, idCol,
    *         rk 1-based rank within source) */
  def sourceCapInterleave(df: DataFrame, idCol: String, srcCol: String,
      k: Int, seed: Long): DataFrame = {
    require(k >= 1, s"sourceCapInterleave: k must be >= 1, got $k")
    val w = Window.partitionBy(col(srcCol))
      .orderBy(col("__sk"), col(idCol))
    val capped = df
      .select(col(idCol), col(srcCol),
        shuffleKey(col(idCol), s"cap$seed").as("__sk"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
    val srcIdx = capped.groupBy(col(srcCol)).agg(count(lit(1)).as("__nsrc"))
      .withColumn("__si",
        row_number().over(Window.orderBy(col(srcCol))).cast("long"))
      .select(col(srcCol), col("__si"))
    val joined = capped.join(broadcast(srcIdx), Seq(srcCol))
      .withColumn("__one", lit(1L))
    // rk is a capped rank in [1, k] by construction — literal bounds, no
    // percentile pass (ranks low in [1, k] are denser when sources run
    // short of the cap, but bucket skew is bounded by |sources| rows per
    // rank and never changes values)
    exclusivePrefixSumUniform(joined, "rk", "__si", "__one", "pos",
      1.0, k.toDouble + 1.0)
      .select(col("pos"), col(srcCol), col(idCol), col("rk"))
  }

  // --- Distributed prefix sum + sequence packing ---------------------------

  /** Number of scan buckets for the two-phase prefix sum. */
  private val ScanBuckets = 32

  /** Exclusive prefix sum of `valCol` in ascending `ordCol` order (ordCol
    * numeric and distinct — a key), appended as `outCol`. NEVER a
    * single-partition window: rows are bucketed by once-collected
    * percentile boundaries of ordCol ([[Buckets]] — literal bounds, so the
    * id is identical in every fan-out subtree by construction), each
    * bucket computes its local running sum, and earlier buckets' totals
    * fold in via a ScanBuckets-row theta join. Two small shuffles, no
    * persist, holds at any row count. */
  def exclusivePrefixSum(df: DataFrame, ordCol: String, valCol: String,
      outCol: String): DataFrame =
    exclusivePrefixSum(df, ordCol, ordCol, valCol, outCol)

  /** [[exclusivePrefixSum]] over a possibly NON-distinct `ordCol`:
    * `tieCol` (numeric, distinct within equal ordCol values) completes
    * the total order. Bucketing still keys on ordCol alone — rows with
    * equal ordCol land in one bucket, so the in-bucket (ordCol, tieCol)
    * window never splits a tie group across the bucket-prefix join. */
  def exclusivePrefixSum(df: DataFrame, ordCol: String, tieCol: String,
      valCol: String, outCol: String): DataFrame =
    prefixSumWithBounds(df, Buckets.boundaries(df, ordCol, ScanBuckets),
      ordCol, tieCol, valCol, outCol)

  /** [[exclusivePrefixSum]] for an ordCol the CALLER constructed uniform
    * over [lo, hi) — e.g. a fixed-width hex hash prefix, or a capped rank
    * 1..k. Equal-width LITERAL boundaries replace the percentile job, so
    * the data-dependent boundaries pass (one full upstream execution per
    * call) disappears; bucket ids only steer grouping, never values, so
    * results are identical by construction (r17-VERDICT item 6: the
    * totals pass cannot fold further — materializing the input violates
    * the r17 heavy-payload rule, and a lazy totals leg re-executes the
    * upstream inside the job since column pruning makes its exchange
    * non-canonical with the output leg's — but for hash-uniform keys the
    * boundaries pass is pure overhead and is now gone). */
  def exclusivePrefixSumUniform(df: DataFrame, ordCol: String,
      tieCol: String, valCol: String, outCol: String,
      lo: Double, hi: Double): DataFrame = {
    require(hi > lo, s"exclusivePrefixSumUniform: need hi > lo, got [$lo, $hi)")
    val bounds = (1 until ScanBuckets)
      .map(i => lo + (hi - lo) * i.toDouble / ScanBuckets)
    prefixSumWithBounds(df, bounds, ordCol, tieCol, valCol, outCol)
  }

  private def prefixSumWithBounds(df: DataFrame, bounds: Seq[Double],
      ordCol: String, tieCol: String, valCol: String,
      outCol: String): DataFrame = {
    val parts = df.withColumn("__pid", Buckets.bucketId(col(ordCol), bounds))
    val wLocal = Window.partitionBy(col("__pid"))
      .orderBy(col(ordCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parts.withColumn("__local", sum(col(valCol)).over(wLocal))
    // Bucket totals are ≤ ScanBuckets+1 rows — model-sized. Collect them
    // once and inline each bucket's earlier-prefix as a LITERAL instead of
    // a theta join on a re-referenced aggregate: every extra DataFrame
    // reference re-executes the upstream plan, and here the upstream is a
    // full input pass (for q115 that meant re-tokenizing the corpus twice
    // more — at 100 TB, two spurious full scans). Three passes remain
    // (boundaries, totals, window), the minimum without persisting input.
    val totals = parts.groupBy(col("__pid")).agg(sum(col(valCol)).as("__tot"))
      .collect().map(r => r.getInt(0) -> r.get(1)).toMap
    def add(a: Any, b: Any): Any = (a, b) match {
      case (null, x) => x
      case (x, null) => x
      case (x: java.lang.Long, y: java.lang.Long) => x + y
      case (x: java.lang.Double, y: java.lang.Double) => x + y
      case (x: java.math.BigDecimal, y: java.math.BigDecimal) => x.add(y)
      case _ => throw new IllegalArgumentException(
        s"exclusivePrefixSum: unsupported sum type ${a.getClass}")
    }
    var acc: Any = null
    val earlier = totals.keys.toSeq.sorted.map { p =>
      val e = acc; acc = add(acc, totals(p)); p -> e
    }.collect { case (p, e) if e != null => when(col("__pid") === p, lit(e)) }
    val earlierExpr =
      if (earlier.isEmpty) lit(0L) else coalesce((earlier :+ lit(0L)): _*)
    local
      .withColumn(outCol, coalesce(col("__local"), lit(0L)) + earlierExpr)
      .drop("__pid", "__local")
  }

  /** Temperature-scaled source-mixture sampling under a global token
    * budget — the data-mixing step of multi-corpus training: a source
    * holding share p of the corpus tokens gets budget share
    * p^(1/T) / Σ p^(1/T). T=1 keeps natural proportions, T>1 flattens
    * toward uniform over sources (upsampling the small ones), T<1
    * sharpens toward the big sources. Deterministic and join-free in its
    * admission rule: each source admits documents in multiplicative-hash
    * priority order (hash(id), id) until the source's token quota is
    * filled — same corpus, same budget, same sample, on any cluster.
    *
    * Scale shape: the only windows run over one row PER SOURCE (tiny
    * frame); the per-document cumulative sum rides the bucketed
    * [[exclusivePrefixSum]] on a combined (source-index << 32 | hash)
    * key, with earlier-sources' totals subtracted from the global prefix
    * — so the classic mixing skew (one giant source = one hot window
    * partition) is designed out. Quota shares are rounded to 12 decimals
    * before the budget multiply so floating-point ulp noise cannot move
    * an integer quota boundary between engines.
    */
  def temperatureMixtureSample(df: DataFrame, idCol: String, srcCol: String,
      tokCol: String, budget: Long, temperature: Double): DataFrame = {
    require(temperature > 0, s"temperature must be > 0, got $temperature")
    require(budget >= 0, s"budget must be >= 0, got $budget")
    val wAll = Window.orderBy(col(srcCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wBefore = Window.orderBy(col(srcCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val quotas = df.groupBy(col(srcCol)).agg(sum(col(tokCol)).as("__toks"))
      .withColumn("__w",
        pow(col("__toks").cast("double") / sum(col("__toks")).over(wAll),
          lit(1.0 / temperature)))
      .withColumn("__quota",
        floor(lit(budget.toDouble) *
          round(col("__w") / sum(col("__w")).over(wAll), 12)).cast("long"))
      .withColumn("__sidx", row_number().over(Window.orderBy(col(srcCol))).cast("long"))
      .withColumn("__bef", coalesce(sum(col("__toks")).over(wBefore), lit(0L)))
      .select(col(srcCol), col("__quota"), col("__sidx"), col("__bef"))
    // source-major global order: sidx dominates, Knuth-hash priority
    // (< 2^31) breaks within source, idCol breaks hash collisions. The
    // inner pmod folds the id below 2^20 BEFORE the multiply so the
    // product never overflows Long — Spark would wrap silently but a SQL
    // oracle (DuckDB) errors on BIGINT overflow, and the two engines
    // must order identically for any id.
    val keyed = df.join(broadcast(quotas), Seq(srcCol))
      .withColumn("__ord", col("__sidx") * lit(4294967296L) +
        pmod(pmod(col(idCol), lit(1048573L)) * lit(2654435761L),
          lit(2147483648L)))
    exclusivePrefixSum(keyed, "__ord", idCol, tokCol, "__gpre")
      .withColumn("__cum", col("__gpre") - col("__bef") + col(tokCol))
      .filter(col("__cum") <= col("__quota"))
      .drop("__ord", "__gpre", "__cum", "__quota", "__sidx", "__bef")
  }

  /** Sequence packing: assign docs (in ascending id order) to fixed
    * token-budget bins — bin = exclusive-prefix-tokens div budget. This is
    * the streaming-concatenation packing LLM data loaders use (documents
    * are laid end-to-end and cut every `budget` tokens; a doc straddling a
    * boundary starts the next bin's count, it is not re-fitted), chosen
    * over first-fit because it is order-deterministic and embarrassingly
    * parallel — first-fit bin state is inherently sequential. Integer
    * `div`, not `/`: long/long `/` is double-valued in Spark and loses
    * exactness past 2^53 total tokens (100 TB is past it). */
  def packSequences(df: DataFrame, idCol: String, tokCol: String,
      budget: Long): DataFrame = {
    require(!df.columns.contains("bin"),
      "packSequences: input must not already have a 'bin' column (reserved output)")
    exclusivePrefixSum(df, idCol, tokCol, "__start")
      .withColumn("bin", expr(s"__start div $budget"))
      .drop("__start")
  }

  /** Length-grouped batching: documents sorted by token count (ties on
    * id) and cut into fixed-size batches, so each batch holds
    * similar-length sequences and padding-to-batch-max waste is
    * minimized — the dynamic-batching step every LLM trainer runs.
    * Global positions come from the bucketed [[exclusivePrefixSum]] (a
    * count prefix), never a single-partition window.
    *
    * @return one row per batch: (batch, n_docs, min_tok, max_tok,
    *         sum_tok, padding_waste = max_tok·n_docs − sum_tok) */
  def lengthGroupedBatches(df: DataFrame, idCol: String, tokCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"lengthGroupedBatches: batchSize >= 1, got $batchSize")
    val pos = exclusivePrefixSum(
      df.select(col(idCol), col(tokCol)).withColumn("__one", lit(1L)),
      tokCol, idCol, "__one", "__pos")
    pos.withColumn("batch", expr(s"__pos div $batchSize"))
      .groupBy(col("batch"))
      .agg(count(lit(1)).as("n_docs"),
        min(col(tokCol)).as("min_tok"), max(col(tokCol)).as("max_tok"),
        sum(col(tokCol)).as("sum_tok"))
      .withColumn("padding_waste",
        col("max_tok") * col("n_docs") - col("sum_tok"))
  }

  // --- Domain mixing -------------------------------------------------------

  /** Replicate each row `timesCol` times (epoch-level upsampling for
    * domain mixing), adding `copy` = 1..times. explode(sequence(...)) is
    * codegen'd row-local work — no shuffle; output size is exactly the
    * weighted corpus. Fractional final epochs compose as
    * replicate(floor(w)) ∪ sampleKeep(frac(w)·1e6) — which is why weights
    * < 1 must yield ZERO rows: sequence(1, 0) would default to step -1 and
    * emit [1, 0], so the guard maps them to null, which explode drops. */
  def replicate(df: DataFrame, timesCol: Column): DataFrame = {
    require(!df.columns.contains("copy"),
      "replicate: input must not already have a 'copy' column (reserved output)")
    df.withColumn("copy", explode(when(timesCol >= 1, sequence(lit(1), timesCol))))
  }

  // --- Training-sequence assembly ------------------------------------------

  /** Assemble per-user chronological event histories — the
    * "logs → training sequences" step of a behavioral-LM pipeline. Each
    * user keeps their most recent `maxLen` events, oldest→newest.
    *
    * Scale shape: events are rank-truncated per user BEFORE any
    * collection (row_number over (ts, id) descending, keep ≤ maxLen), so
    * the grouped state is bounded even for bot-grade heavy hitters; the
    * final collect_list holds at most maxLen structs per user, and the
    * array sort is per-row work. One shuffle, keyed on the user.
    *
    * @return (userCol, n_events [kept], first_ts, last_ts [epoch µs],
    *         history: ARRAY<STRING> of "epochµs:event") */
  def userHistories(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, eventCol: String, maxLen: Int): DataFrame = {
    require(maxLen >= 1, s"userHistories: maxLen must be >= 1, got $maxLen")
    // ordering by epoch-µs is ordering by the timestamp (unix_micros is
    // monotone), so the rank can run after the projection
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("__tsu").desc, col("__eid").desc)
    val kept = events
      .select(col(userCol), unix_micros(col(tsCol)).as("__tsu"),
        col(idCol).as("__eid"), col(eventCol).cast("string").as("__ev"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxLen)
    kept.groupBy(col(userCol))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__tsu")).as("first_ts"),
        max(col("__tsu")).as("last_ts"),
        transform(
          sort_array(collect_list(struct(col("__tsu"), col("__eid"), col("__ev")))),
          e => concat(e.getField("__tsu").cast("string"), lit(":"),
            e.getField("__ev"))).as("history"))
  }

  /** Per-user exponentially time-decayed engagement score — the
    * recency-weighted feature a behavioral ranking pipeline derives from
    * raw event logs: score(u) = Σ value·2^(−age/halfLife), with age
    * measured back from the corpus-wide newest event so the whole table
    * shares one reference point and the score is a pure function of the
    * data (re-runnable, cache-safe — no wall-clock dependence).
    *
    * Scale shape: the reference point is a 1-row max aggregate broadcast
    * onto the scan; each event's decayed contribution is per-row double
    * arithmetic cast to decimal(27,15) so the per-user sum is
    * order-independent (the repo's decimal-sum rule — double addition
    * isn't associative and partial-aggregation order varies run to run);
    * the only shuffle keys on the user and is map-side combined.
    *
    * @param halfLifeDays contributions halve every this many days
    * @return (userCol, n_events, last_seen_us, decay_score) */
  def timeDecayedScores(events: DataFrame, userCol: String, tsCol: String,
      valueCol: String, halfLifeDays: Double): DataFrame = {
    require(halfLifeDays > 0,
      s"timeDecayedScores: halfLifeDays must be > 0, got $halfLifeDays")
    val ref = events.agg(max(unix_micros(col(tsCol))).as("__ref_us"))
    // ln2/halfLife in MICROSECONDS⁻¹, built from the same double ops the
    // oracle spells out (ln(2)/(86400e6·H)) so both engines evaluate the
    // identical IEEE expression tree
    val lambda = lit(math.log(2.0)) / (lit(86400e6) * lit(halfLifeDays))
    events
      .select(col(userCol), unix_micros(col(tsCol)).as("__tsu"),
        col(valueCol).cast("double").as("__v"))
      .crossJoin(broadcast(ref))
      .withColumn("__w",
        (col("__v") * exp(-lambda * (col("__ref_us") - col("__tsu"))
          .cast("double"))).cast("decimal(27,15)"))
      .groupBy(col(userCol))
      .agg(count(lit(1)).as("n_events"),
        max(col("__tsu")).as("last_seen_us"),
        round(sum(col("__w")).cast("double"), 6).as("decay_score"))
  }

  // --- Importance resampling (DSIR) ----------------------------------------

  /** DSIR-style hashed-n-gram importance log-weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * every document scored by how much more likely its features are under
    * a target distribution than under the raw corpus —
    * log w(x) = Σ_f count_f(x) · (ln p_target(f) − ln p_raw(f)) — where
    * features are word bigrams hashed into `buckets` buckets and both
    * feature distributions are Laplace-smoothed bucket frequencies
    * ((c+1)/(N+B)). Sampling ∝ w(x) then tilts a giant raw corpus toward
    * a small high-quality target domain.
    *
    * Scale: one shuffle-free bigram extraction; per-(doc, bucket) counts
    * aggregate map-side; the two distributions are `buckets`-row tables
    * (bounded by B, not the corpus) built from the SAME per-doc counts
    * (target side via a semi-join on target ids), and the final score is
    * one broadcast join of the B-row log-ratio table back onto the
    * per-doc counts. No driver collects. The log-weight sum rides the
    * repo-wide decimal(27,15) rule so partial-merge order can't wiggle
    * the doubles.
    *
    * Output: (idCol, n_feats, log_weight) — every doc that produced at
    * least one bigram; docs with < 2 tokens emit nothing (no features ⇒
    * weight undefined; callers treat them separately).
    */
  def dsirLogWeights(corpus: DataFrame, targetIds: DataFrame, idCol: String,
      textCol: String, buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"dsirLogWeights: buckets must be >= 2, got $buckets")
    val b = buckets.toLong
    // the (doc, bucket) census feeds FOUR consumers (raw marginal, target
    // marginal, their totals through ratio, and the final weight join) —
    // materialized once instead of re-running the bigram explode per
    // reference (r17; the frame is docs × ≤buckets rows, far narrower
    // than the bigram stream it replaces)
    val docB = LanguageModel.bigramRows(corpus, idCol, textCol)
      .select(col("__id"),
        hashBucket(concat_ws(" ", col("w1"), col("w2")), "dsir", buckets).as("__b"))
      .groupBy(col("__id"), col("__b")).agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    val raw = docB.groupBy(col("__b")).agg(sum(col("__c")).as("__cr"))
    val tgt = docB
      .join(targetIds.select(col(idCol).as("__id")), Seq("__id"), "left_semi")
      .groupBy(col("__b")).agg(sum(col("__c")).as("__ct"))
    val nRaw = raw.agg(sum(col("__cr")).as("__nr"))
    val nTgt = tgt.agg(sum(col("__ct")).as("__nt"))
    // buckets absent from the raw table are absent from every doc too, so
    // the left join loses nothing; absent target buckets smooth to 1/(N+B)
    val ratio = raw.join(tgt, Seq("__b"), "left")
      .crossJoin(broadcast(nRaw)).crossJoin(broadcast(nTgt))
      .select(col("__b"),
        (log((coalesce(col("__ct"), lit(0L)) + lit(1.0)) / (col("__nt") + lit(b.toDouble))) -
         log((col("__cr") + lit(1.0)) / (col("__nr") + lit(b.toDouble)))).as("__llr"))
    docB.join(broadcast(ratio), Seq("__b"))
      .groupBy(col("__id"))
      .agg(sum(col("__c")).as("n_feats"),
        sum((col("__c") * col("__llr")).cast("decimal(27,15)"))
          .cast("double").as("log_weight"))
      .withColumnRenamed("__id", idCol)
  }

  // --- Decontamination -----------------------------------------------------

  /** Ids of corpus docs sharing at least one word k-gram with any benchmark
    * doc (train/test contamination). Both sides shingle via
    * [[Dedup.shingleRows]] (codegen'd window k-grams); the flag is one
    * semi-join on the gram value. No broadcast hint: benchmark gram sets
    * are usually broadcast-able and AQE will do it, but a hint would force
    * it even for benchmark suites larger than the broadcast budget. */
  def contaminatedIds(corpus: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, k: Int = 5): DataFrame = {
    val benchGrams = Dedup.shingleRows(bench, idCol, textCol, k)
      .select(col("__g")).distinct()
    Dedup.shingleRows(corpus, idCol, textCol, k)
      .join(benchGrams, Seq("__g"), "left_semi")
      .select(col("__id").as(idCol)).distinct()
  }

  /** [[contaminatedIds]] with a Bloom-style hash-bucket prefilter for the
    * 100 TB shape: the benchmark gram set is summarized as its distinct
    * xxhash64-mod-`bits` buckets (≤ `bits` longs — broadcastable no matter
    * how large the corpus), and corpus grams reach the exact gram
    * semi-join only when their bucket is occupied. Semantically identical
    * to the exact operator — the prefilter can only drop grams the exact
    * join would drop (no false negatives; false positives at rate
    * ≈ benchGrams/bits proceed to the exact join and are dropped there).
    * The win at scale: the shuffled gram volume of the exact join falls to
    * the prefilter hit rate, and the prefilter itself is a broadcast hash
    * join — no shuffle of the corpus side at all. */
  def contaminatedIdsBloom(corpus: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, k: Int = 5,
      bits: Int = 1 << 20): DataFrame = {
    val benchGrams = Dedup.shingleRows(bench, idCol, textCol, k)
      .select(col("__g")).distinct()
    val bucket = pmod(xxhash64(col("__g")), lit(bits.toLong))
    val occupied = benchGrams.select(bucket.as("__b")).distinct()
    Dedup.shingleRows(corpus, idCol, textCol, k)
      .withColumn("__b", bucket)
      .join(broadcast(occupied), Seq("__b"), "left_semi")
      .join(benchGrams, Seq("__g"), "left_semi")
      .select(col("__id").as(idCol)).distinct()
  }

  /** HORVITZ–THOMPSON estimation from a weighted sample — the statistic
    * that makes weighted sampling USEFUL: a kept row with inclusion
    * probability πᵢ represents 1/πᵢ corpus rows, so Σ_kept 1/πᵢ
    * estimates the population count and Σ_kept yᵢ/πᵢ any population
    * total, unbiasedly. This closes the sampling loop (q47 pins the
    * sample; this pins what you DO with it): corpus accounting —
    * row counts, token budgets — from the sample alone, per group, next
    * to the true values so calibration is visible.
    *
    * πᵢ = ppmᵢ/10⁶ from the same [[sampleKeep]] draw; rows with ppm = 0
    * are outside the sampling frame and excluded from both truth and
    * estimate (HT is only defined over π > 0). Weights are rounded to
    * 12 dp and summed as decimal(27,15) — the exact-sum rule — so the
    * estimates replay bit-for-bit on any engine.
    *
    * Scale: one projection (hash draw + weights) + one group-keyed
    * map-side-combinable aggregation; truth and estimate ride the SAME
    * aggregate, so the corpus is scanned once.
    *
    * @param ppm inclusion probability × 10⁶ column (must be 0..10⁶)
    * @param y the value column whose total is estimated
    * @return (grpCol, n_true, n_est, y_true, y_est) */
  def horvitzThompson(df: DataFrame, idCol: String, grpCol: String,
      ppm: Column, y: Column, salt: String): DataFrame = {
    val framed = df.filter(col(idCol).isNotNull)
      .select(col(grpCol), col(idCol).as("__id"),
        // runtime guard on the documented domain: ppm > 10^6 would make
        // sampleKeep always true while the HT weight stays < 1 — a
        // silently biased underestimate. Fail loud instead (data-driven,
        // so a require() can't see it).
        when(ppm > lit(1000000L), raise_error(concat(
            lit("horvitzThompson: ppm must be <= 1000000, got "),
            ppm.cast("string"))))
          .otherwise(ppm).as("__ppm"),
        y.as("__y"))
      .filter(col("__ppm") > 0)
      .withColumn("__keep", sampleKeep(col("__id"), col("__ppm"), salt))
    framed.groupBy(col(grpCol))
      .agg(
        count(lit(1)).as("n_true"),
        round(sum(when(col("__keep"),
          round(lit(1000000.0) / col("__ppm"), 12))
          .cast("decimal(27,15)")).cast("double"), 4).as("n_est"),
        sum(col("__y")).as("y_true"),
        round(sum(when(col("__keep"),
          round(col("__y") * 1000000.0 / col("__ppm"), 12))
          .cast("decimal(27,15)")).cast("double"), 4).as("y_est"))
  }

  /** Deterministic MLM masking plan (BERT's 15% / 80-10-10 recipe,
    * Devlin et al. 2019) — the training-example construction step: every
    * (doc, position) draws its masking decision from an md5 hash of its
    * own coordinates, so the plan is reproducible across reruns,
    * engines, and partitionings — no RNG state, which is exactly what a
    * resumable 100 TB preprocessing job needs (re-running a failed
    * partition MUST mask the same positions). Selection: `h % 100 < 15`;
    * among selected: `h2 % 10` < 8 → [MASK], = 8 → random-token
    * replace, = 9 → keep-original. ALL integer arithmetic — no float
    * threshold anywhere to drift.
    *
    * Scale: posexplode → pure codegen'd hash expressions → one
    * map-side-combinable per-doc count aggregation. One shuffle, keyed
    * by doc.
    *
    * @return (idCol, n_tokens, n_selected, n_mask, n_random, n_keep) */
  def mlmMaskingPlan(df: DataFrame, idCol: String, textCol: String,
      salt: String = "mlm"): DataFrame = {
    val h = md5(concat(lit(s"$salt:"), col(idCol).cast("string"),
      lit(":"), col("__p").cast("string")))
    val sel = pmod(conv(substring(h, 1, 4), 16, 10).cast("long"), lit(100L)) < 15
    val act = pmod(conv(substring(h, 5, 2), 16, 10).cast("long"), lit(10L))
    df.filter(col(idCol).isNotNull)
      .select(col(idCol),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("__p", "__t")))
      .filter(col("__t") =!= "")
      .select(col(idCol), sel.as("__sel"), act.as("__act"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__sel"), 1L).otherwise(0L)).as("n_selected"),
        sum(when(col("__sel") && col("__act") < 8, 1L).otherwise(0L))
          .as("n_mask"),
        sum(when(col("__sel") && col("__act") === 8, 1L).otherwise(0L))
          .as("n_random"),
        sum(when(col("__sel") && col("__act") === 9, 1L).otherwise(0L))
          .as("n_keep"))
  }

  /** Deterministic SPAN-CORRUPTION plan — the T5/UL2 pretraining
    * objective next to the BERT-style [[mlmMaskingPlan]]: instead of
    * masking 15% of tokens independently, contiguous SPANS are replaced
    * by sentinels. The plan partitions each doc's token stream into
    * fixed `blockLen`-token blocks; every FULL block hosts exactly one
    * span whose length (2–4 tokens, mean 3) and in-block offset are md5
    * draws keyed by (doc, block) — corruption rate = 3/20 = the
    * canonical 15% in expectation, spans can never overlap (one per
    * block), and a resumed partition regenerates the identical spans,
    * the same resumability-by-construction contract as the MLM row.
    * Trailing partial blocks host no span (deterministic, mirrored by
    * the oracle).
    *
    * Scale: one token-COUNT projection per doc (no token explode at
    * all), then an n/blockLen-row block explode — pure codegen'd
    * per-row arithmetic, zero shuffles, zero joins.
    *
    * @return one row per span: (idCol, block, start_tok, len_tok),
    *         start_tok 0-based in the doc's token stream */
  def spanCorruptionPlan(df: DataFrame, idCol: String, textCol: String,
      blockLen: Int = 20, salt: String = "span"): DataFrame = {
    require(blockLen >= 6, s"spanCorruptionPlan: blockLen >= 6, got $blockLen")
    val base = df.filter(col(idCol).isNotNull)
      .select(col(idCol), TextFunctions.tokenCount(col(textCol)).as("__n"))
      .filter(col("__n") >= blockLen)
      .select(col(idCol),
        explode(sequence(lit(0L),
          floor(col("__n") / blockLen).cast("long") - 1)).as("__b"))
    val h = md5(concat(lit(s"$salt:"), col(idCol).cast("string"),
      lit(":"), col("__b").cast("string")))
    val len = lit(2L) + pmod(conv(substring(h, 1, 4), 16, 10).cast("long"),
      lit(3L))
    val off = pmod(conv(substring(h, 5, 4), 16, 10).cast("long"),
      lit(blockLen + 1L) - len)
    base.select(col(idCol), col("__b").as("block"),
      (col("__b") * blockLen + off).as("start_tok"), len.as("len_tok"))
  }

  /** k-ANONYMITY audit over quasi-identifier columns — the privacy
    * pre-release check beside [[redactPii]]: every combination of
    * quasi-identifiers present in the corpus, its row count, and whether
    * the group clears the anonymity threshold (a combination shared by
    * fewer than k rows re-identifies its members). Counts are exact
    * integers; one grouped aggregation, map-side combined, output sized
    * by the quasi-identifier cardinality product.
    *
    * @param quasi (name → expression) pairs defining the identifier
    * @return one row per combination: quasi columns + (n, anonymous) */
  def kAnonymity(df: DataFrame, quasi: Seq[(String, Column)],
      k: Int = 5): DataFrame = {
    require(quasi.nonEmpty && k >= 2,
      s"kAnonymity: need quasi-identifiers and k >= 2, got k=$k")
    df.select(quasi.map { case (n, c) => c.as(n) }: _*)
      .groupBy(quasi.map(q => col(q._1)): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("anonymous", col("n") >= k)
  }

  /** Hashed-feature LINEAR CLASSIFIER inference — the fastText-style
    * quality-classifier scoring pass (Joulin et al. 2017 model shape;
    * Weinberger et al. 2009 hashing trick): every token hashes into one
    * of `dims` feature buckets, each bucket carries a fixed weight, a
    * document's logit is the mean bucket weight over its tokens, and the
    * probability is the logistic of that logit. This is the production
    * inference shape for web-corpus quality filters (a trained linear
    * model scored at corpus scale); the weights here are the md5-parity
    * deterministic stand-in (the q127 device) so the oracle regenerates
    * the identical model in SQL — swapping in real trained weights
    * changes one literal-generating function, not the plan.
    *
    * Determinism: per-token weights are rounded to 6 dp THEN summed as
    * decimal(27,15) (the established exact-sum rule). The MEAN is where
    * engines usually drift: 6-dp weights divided by a token count land
    * exactly on 7th-digit rounding ties (measured: one doc in 500 at
    * sf0.01), and double `round` tie behavior is engine-specific — so
    * the mean is rounded in exact INTEGER space instead
    * (`sgn·((2|s|+n) div 2n)` over the 10⁶-scaled sum, HALF_UP away
    * from zero), which every engine computes identically.
    *
    * Scale: tokenize → per-token hash+weight lookup (pure codegen'd
    * expressions, no model join at all — the model is IN the expression)
    * → one map-side-combinable per-doc aggregation. Zero shuffles beyond
    * the doc-keyed agg; a real weight vector would ride as a broadcast
    * literal array exactly like this.
    *
    * @return (idCol, n_tokens, logit, prob, is_positive) */
  /** Shared hashed-feature frame for the classifier training/apply pair:
    * per (doc, bucket) the normalized feature x = count/len plus the
    * doc's boolean label. The md5 bucket hash is [[hashedLinearScore]]'s
    * exactly, so a model trained here applies to the same feature space
    * the inference op reads. */
  private[graft] def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
      label: Column, dims: Int): DataFrame = {
    val tok = col("__t")
    val bucket = pmod(conv(substring(md5(tok), 1, 4), 16, 10).cast("long"),
      lit(dims.toLong))
    df.filter(col(idCol).isNotNull)
      .select(col(idCol).as("__id"), label.as("__y"),
        explode(TextFunctions.tokens(col(textCol))).as("__t"))
      // an unlabeled doc must not train (a null label would silently
      // read as negative through when(__y, 1.0).otherwise(0.0))
      .filter(col("__y").isNotNull && tok =!= "")
      .select(col("__id"), col("__y"), bucket.as("__b"))
      .groupBy(col("__id"), col("__b"))
      .agg(count(lit(1)).as("__c"), max(col("__y")).as("__y"))
      .withColumn("__len",
        sum(col("__c")).over(Window.partitionBy(col("__id"))))
      .select(col("__id"), col("__b"),
        (col("__c").cast("double") / col("__len")).as("__x"), col("__y"))
  }

  /** TRAIN the hashed-feature logistic classifier — full-batch gradient
    * descent, `iters` fixed rounds:
    *
    *   w_b ← round₁₂( w_b + η · Σ_i (y_i − p_i)·x_{i,b} / n )
    *
    * over the [[hashedLinearScore]] feature space (md5 token buckets,
    * x = bucket count / doc length). This closes the classifier
    * lifecycle the same way q161/q181 closed the tokenizer's: q162
    * scores with a fixed model, THIS learns one from labels, and the
    * oracle replays every round in SQL (the unrolled-training device —
    * w₀ = 0 makes round 1's p exactly ½, each later round is two keyed
    * aggregations away from the last).
    *
    * Determinism: every gradient term and every dot-product term is
    * rounded to 12 dp and decimal-summed; p is rounded to 12 dp before
    * the residual; weight updates replay the HALF_UP device on the
    * driver. Engine-identical by the same argument as Lloyd's
    * (`Similarity.trainCentroids`).
    *
    * Scale: per round, one doc-keyed aggregation (the dot product) and
    * one bucket-keyed aggregation (the gradient) — both map-side
    * combined; the weight vector is dims rows, broadcast out and
    * collected back (model-sized, the geometricMedian pattern). `iters`
    * bounds the number of corpus passes, exactly like Lloyd's.
    *
    * @param label boolean ground-truth column expression
    * @return (bucket, weight) — dims rows, weights 12-dp */
  def logisticTrainHashed(df: DataFrame, idCol: String, textCol: String,
      label: Column, dims: Int = 64, iters: Int = 2,
      lr: Double = 0.5): DataFrame = {
    require(dims >= 2 && iters >= 1 && lr > 0,
      s"logisticTrainHashed: dims >= 2, iters >= 1, lr > 0")
    // Feature extraction runs ONCE: the (doc, bucket) frame is persisted
    // for the GD rounds — each round references it twice (dot product +
    // gradient) and without the persist every reference would re-tokenize
    // the corpus (~2·iters+1 full passes at 100 TB instead of one scan +
    // iters feature-sized passes). Lloyd's re-scans its input per round
    // because its input IS the scan; here the features are an order
    // smaller than the text, so materializing them is the scale-correct
    // trade.
    val x = hashedFeatures(df, idCol, textCol, label, dims)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try logisticTrainOnFeatures(x, dims, iters, lr)
    finally x.unpersist(true)
  }

  /** [[logisticTrainHashed]] over a PRECOMPUTED (and caller-persisted)
    * feature frame — the seam the train→apply→evaluate loop (q192) needs
    * to extract features ONCE instead of once per leg. `x` must be
    * [[hashedFeatures]]-shaped: (__id, __b, __x, __y). */
  def logisticTrainOnFeatures(x: DataFrame, dims: Int = 64, iters: Int = 2,
      lr: Double = 0.5): DataFrame = {
    require(dims >= 2 && iters >= 1 && lr > 0,
      s"logisticTrainOnFeatures: dims >= 2, iters >= 1, lr > 0")
    val spark = x.sparkSession
    import spark.implicits._
    {
    val nDocs = x.select(col("__id")).distinct().count()
    var w: Map[Long, Double] = (0L until dims.toLong).map(_ -> 0.0).toMap
    for (_ <- 1 to iters) {
      val wdf = broadcast(w.toSeq.sortBy(_._1).toDF("__b", "__w"))
      // x carries the label; resid only needs (id, p) — re-selecting __y
      // here would collide with x's copy in the gradient join below
      val resid = x.join(wdf, Seq("__b"))
        .groupBy(col("__id"))
        .agg(sum(round(col("__x") * col("__w"), 12).cast("decimal(27,15)"))
          .as("__z"))
        .select(col("__id"),
          round(lit(1.0) / (lit(1.0) + exp(-col("__z").cast("double"))), 12)
            .as("__p"))
      val grad = x.join(resid, Seq("__id"))
        .groupBy(col("__b"))
        .agg(sum(round((when(col("__y"), 1.0).otherwise(0.0) - col("__p")) *
          col("__x"), 12).cast("decimal(27,15)")).as("__g"))
        .as[(Long, java.math.BigDecimal)].collect().toMap
      w = w.map { case (b, wb) =>
        val g = grad.get(b).map(_.doubleValue()).getOrElse(0.0)
        b -> BigDecimal(wb + lr * (g / nDocs))
          .setScale(12, scala.math.BigDecimal.RoundingMode.HALF_UP)
          .toDouble
      }
    }
    w.toSeq.sortBy(_._1).toDF("bucket", "weight")
    }
  }

  /** APPLY a trained weight vector to the hashed feature space: per doc
    * the 12-dp decimal dot product z (and its label, for evaluation).
    * One broadcast join + one doc-keyed aggregation. */
  def logisticApplyHashed(df: DataFrame, idCol: String, textCol: String,
      label: Column, weights: DataFrame, dims: Int = 64): DataFrame =
    logisticApplyOnFeatures(
      hashedFeatures(df, idCol, textCol, label, dims), idCol, weights)

  /** [[logisticApplyHashed]] over a precomputed feature frame — shares
    * one extraction with [[logisticTrainOnFeatures]] in the
    * train→apply→evaluate loop. */
  def logisticApplyOnFeatures(x: DataFrame, idCol: String,
      weights: DataFrame): DataFrame =
    x.join(broadcast(weights.select(col("bucket").as("__b"),
        col("weight").as("__w"))), Seq("__b"))
      .groupBy(col("__id"))
      .agg(max(col("__y")).as("__y"),
        round(sum(round(col("__x") * col("__w"), 12).cast("decimal(27,15)"))
          .cast("double"), 12).as("__z"))
      .select(col("__id").as(idCol), col("__z").as("z"), col("__y").as("y"))

  def hashedLinearScore(df: DataFrame, idCol: String, textCol: String,
      dims: Int = 64, salt: String = "qclf"): DataFrame = {
    require(dims >= 2, s"hashedLinearScore: dims >= 2, got $dims")
    // feature bucket: first 4 md5 hex chars of the token, mod dims
    val tok = col("__t")
    val bucket = pmod(conv(substring(md5(tok), 1, 4), 16, 10).cast("long"),
      lit(dims.toLong))
    // bucket weight in [-1, 1]: byte 1 of md5("salt:<bucket>") scaled
    val w = round(
      conv(substring(md5(concat(lit(s"$salt:"), bucket.cast("string"))),
        1, 2), 16, 10).cast("double") / 127.5 - 1.0, 6)
    df.filter(col(idCol).isNotNull)
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("__t"))
      .filter(tok =!= "")
      .select(col(idCol), w.cast("decimal(27,15)").as("__w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__w")).as("__sw"))
      // exact 10^6-scaled integer sum (weights carry exactly 6 dp), then
      // HALF_UP mean in integer space — no double-round tie anywhere
      .withColumn("__si", (col("__sw") * 1000000).cast("long"))
      .withColumn("__li", expr(
        """CASE WHEN __si >= 0
          |  THEN (__si * 2 + n_tokens) div (2 * n_tokens)
          |  ELSE -((-__si * 2 + n_tokens) div (2 * n_tokens)) END""".stripMargin))
      .select(col(idCol), col("n_tokens"),
        (col("__li") / 1000000.0).as("logit"))
      .withColumn("prob",
        round(lit(1.0) / (lit(1.0) + exp(-col("logit"))), 6))
      .withColumn("is_positive", col("prob") >= 0.5)
  }
}
