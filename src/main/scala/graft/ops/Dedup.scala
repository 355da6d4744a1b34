package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, MinHash+LSH,
  * SimHash, and n-gram Jaccard. All are pure DataFrame plans built from
  * codegen'd functions — no UDFs, no driver-side loops — so each scales to
  * 100 TB as: one columnar scan → (optionally) one shuffle keyed on the
  * dedup/bucket key → verification joins keyed on doc id.
  *
  * Determinism: every hash is md5 over explicit UTF-8 bytes, so results are
  * engine-portable (the DuckDB oracle mirrors them bit-for-bit) and stable
  * across runs/partitionings — a hard requirement for reproducible corpus
  * curation.
  */
object Dedup {

  /** Modulus for the one-hash minhash permutation family: 2^31-1. Products
    * a·h stay < 2^62, exact in BIGINT for Spark and the SQL oracle alike. */
  val MersennePrime: Long = 2147483647L

  /** Deterministic permutation constants (engine-portable literals). */
  def permA(n: Int): Array[Long] =
    Array.tabulate(n)(i => (1103515245L * (i + 1) + 12345L) % MersennePrime | 1L)
  def permB(n: Int): Array[Long] =
    Array.tabulate(n)(i => (987654321L * (i + 1) + 5555L) % MersennePrime)

  private def widen(df: DataFrame): DataFrame = TextFunctions.widen(df)

  /** Distinct word k-shingles of normalized text. Documents shorter than k
    * tokens contribute their whole text as a single shingle. */
  def shingles(text: Column, k: Int = 3): Column = {
    val toks = TextFunctions.tokens(text)
    val grams = transform(
      sequence(lit(1), greatest(size(toks) - (k - 1), lit(1))),
      i => concat_ws(" ", (0 until k).map(j => element_at(toks, i + j)): _*))
    array_distinct(when(size(toks) >= k, grams)
      .otherwise(array(concat_ws(" ", toks))))
  }

  /** Relational (id, shingle) rows — the scale path that [[shingles]]'
    * column form is not. posexplode the token array once, build each word
    * k-gram with window `lead` over (doc, position): every expression is
    * whole-stage codegen'd and the only data movement is one shuffle keyed
    * on the doc id. Documents with fewer than k tokens contribute their
    * whole text as a single shingle (same fallback as [[shingles]]).
    *
    * Rows are NOT distinct-ed: minhash minima are multiset-invariant and
    * [[graft.functions.JaccardSimilarity]] applies set semantics itself;
    * consumers needing the set as an array use [[shingleSets]].
    *
    * Why not the higher-order-function form in pipelines: HOF lambdas are
    * interpreted row-at-a-time, and the token-array subtree referenced via
    * `element_at(toks, i+j)` is re-evaluated per element access outside
    * projection CSE (e.g. under a Generate), turning shingling quadratic in
    * document length — profiled at 10× the cost of this plan at sf0.1. */
  def shingleRows(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame = {
    // Null doc ids are dropped, not passed through: kgramRows windows on
    // __id, so null-id rows would all land in ONE window partition and
    // lead() would build k-grams spanning unrelated documents. A null id
    // also can't participate in any downstream pair/semi-join anyway.
    val toks = widen(df).filter(col(idCol).isNotNull)
      .select(col(idCol).as("__id"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
    val nTok = coalesce(size(col("__toks")), lit(0))
    val whole = toks.filter(nTok < k)
      .select(col("__id"), concat_ws(" ", col("__toks")).as("__g"))
    kgramRows(toks.filter(nTok >= k), k).select(col("__id"), col("__g"))
      .unionByName(whole)
  }

  /** Word k-grams of docs with ≥ k tokens, relationally: expects
    * (__id, __toks), returns (__id, __g) with one gram row per start
    * position. Shared by [[shingleRows]] and the repetition-ratio signal. */
  def kgramRows(toksDf: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("__id")).orderBy(col("__pos"))
    toksDf
      .select(col("__id"), size(col("__toks")).as("__n"),
        posexplode(col("__toks")).as(Seq("__pos", "__t")))
      .select(col("__id"), col("__pos"), col("__n"),
        concat_ws(" ",
          col("__t") +: (1 until k).map(j => lead(col("__t"), j).over(w)): _*).as("__g"))
      .filter(col("__pos") <= col("__n") - k)
      .select(col("__id"), col("__g"))
  }

  /** Distinct shingle sets as arrays, built from [[shingleRows]] — one
    * aggregation keyed on the doc id (map-side combined). */
  def shingleSets(df: DataFrame, idCol: String, textCol: String, k: Int = 3): DataFrame =
    shingleRows(df, idCol, textCol, k)
      .groupBy(col("__id")).agg(collect_set(col("__g")).as("__sh"))

  /** md5-derived 32-bit shingle hash (codegen'd): first 8 hex chars of
    * md5 → long. The permutation base for the one-hash minhash family. */
  def shingleHash(g: Column): Column =
    conv(substring(md5(g.cast("binary")), 1, 8), 16, 10).cast("long")

  /** The `numHashes` one-hash-trick minhash aggregates — min of the linear
    * permutation (a·h+b) mod p per seed — over a hashed-shingle column.
    * All seeds are parallel aggregates of ONE groupBy (partial/map-side
    * combinable), so the signature costs a single shuffle of doc keys. */
  def minhashAggs(h: Column, numHashes: Int): Seq[Column] = {
    val aConsts = permA(numHashes)
    val bConsts = permB(numHashes)
    (0 until numHashes).map(s =>
      min(pmod(lit(aConsts(s)) * h + lit(bConsts(s)),
        lit(MersennePrime))).as(s"__mh$s"))
  }

  /** MinHash signature: for seed s, min over shingles of md5(shingle+":"+s).
    * Hex-string minima are order-portable (ASCII compare) and need no
    * bigint modular arithmetic, so any engine can replicate them. */
  def minhashSignature(shingleCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(shingleCol,
        g => md5(concat(g, lit(":"), s.cast("string")).cast("binary")))))

  /** Jaccard similarity of two (already-distinct) string arrays, via the
    * codegen'd single-pass expression (LSH verification hot path). */
  def jaccard(a: Column, b: Column): Column =
    graft.functions.JaccardSimilarity(a, b)

  /** Composable reference formulation; identical values on distinct
    * arrays (set semantics both ways). */
  def jaccardComposable(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    inter / (size(a) + size(b) - inter)
  }

  /** Exact dedup: keep the lowest id per content fingerprint.
    * One hash-shuffle on the fingerprint; at 100 TB this is the minimal
    * possible movement for exact dedup (only (fp,id) pairs shuffle, then the
    * winner set — tiny — joins back to the corpus by id). */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = widen(df)
      .select(col(idCol), TextFunctions.fingerprint(col(textCol)).as("__fp"))
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__fp")
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Cross-source duplicate-overlap matrix — the corpus-health report
    * answering "which source pairs ship the same documents?": for every
    * ordered source pair (src_a < src_b), the count of distinct content
    * fingerprints present in BOTH. This is what decides which crawl feeds
    * to dedup against each other first at 100 TB.
    *
    * Shape: one fingerprint projection → distinct (fp, source) — the only
    * corpus-sized shuffle, and it carries (16-byte fp, source) rows, not
    * text. The fp self-join's fan-out is bounded by the source count per
    * fingerprint (≤ total sources, a constant), so the pair stage emits at
    * most C(|sources|, 2) rows per fingerprint — never |corpus|². */
  def crossSourceOverlap(df: DataFrame, idCol: String, srcCol: String,
      textCol: String): DataFrame = {
    val fps = widen(df)
      .select(TextFunctions.fingerprint(col(textCol)).as("__fp"),
        col(srcCol).as("__src"))
      .distinct()
    fps.select(col("__fp"), col("__src").as("src_a"))
      .join(fps.select(col("__fp"), col("__src").as("src_b")), Seq("__fp"))
      .filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** MinHash-LSH near-duplicate pairs.
    *
    * Pipeline (each stage one shuffle, no O(n²) step):
    *  1. per-row: shingles → signature of `bands*rowsPerBand` minhashes
    *     (columnar, no shuffle);
    *  2. explode into `bands` (band_id, band_sig) keys → self-join on the
    *     band key. Only same-bucket docs ever meet — the LSH guarantee that
    *     collision probability ≈ 1-(1-j^r)^b;
    *  3. distinct candidate pairs → join shingle sets back by id → exact
    *     Jaccard filter at `threshold`.
    *
    * Scale: the band join shuffles on (band_id, band_sig); popular bands
    * (boilerplate docs) skew — AQE skew-join handles moderate skew, and a
    * bucket-size cap (`maxBucket`) drops pathological buckets the way
    * production dedup pipelines drop stop-shingles.
    */
  /** @param skewSafe opt-in hot-bucket-resilient band phase: the default
    *   path collects every bucket's members before applying `maxBucket`,
    *   so one boilerplate bucket with millions of members still lands on
    *   a single reducer (memory + straggler) before being dropped. The
    *   skew-safe path runs the bucket CENSUS first — counts are map-side
    *   combinable, so a hot key reaches its reducer as a handful of
    *   partial counts, never rows (the [[Skew.skewReport]] diagnosis
    *   applied inline) — drops over-cap buckets before any member
    *   moves, and collects the survivors in a salted two-level
    *   aggregate. Identical pair set by construction (OpsSpec pins it);
    *   one extra count shuffle, which is what it costs to be immune to
    *   boilerplate at 100 TB. */
  def minhashNearDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 3,
      bands: Int = 4,
      rowsPerBand: Int = 3,
      threshold: Double = 0.5,
      maxBucket: Int = 1000,
      skewSafe: Boolean = false): DataFrame =
    // Relational minhash end to end: shingle ROWS (codegen'd window k-grams,
    // never an interpreted lambda — see [[shingleRows]]), hash each shingle
    // ONCE, then all permutation minima AND the verification shingle set as
    // parallel aggregates of ONE groupBy (no seed explode, map-side partial
    // everything) — one shuffle of doc-keyed rows regardless of corpus size.
    minhashNearDupPairsFromShingles(shingleRows(df, idCol, textCol, k),
      bands, rowsPerBand, threshold, maxBucket, skewSafe)

  /** [[minhashNearDupPairs]] over precomputed (__id, __g) shingle rows —
    * the seam an audit needs to share ONE materialized shingle frame with
    * an exact verification arm (duplicate gram rows are harmless: min and
    * collect_set are idempotent under them, so a DISTINCT frame yields
    * identical signatures and sets). */
  def minhashNearDupPairsFromShingles(
      shingles: DataFrame,
      bands: Int = 4,
      rowsPerBand: Int = 3,
      threshold: Double = 0.5,
      maxBucket: Int = 1000,
      skewSafe: Boolean = false): DataFrame = {
    val numHashes = bands * rowsPerBand
    val minAggs = minhashAggs(col("__h32"), numHashes)
    // The signature frame feeds THREE consumers (banding + both
    // verification join sides) and stays deliberately LAZY: it carries
    // the collect_set shingle payloads, and materializing heavy
    // variable-length frames in the block manager measured SLOWER at 10×
    // than recomputing the codegen pipeline (r17: q34 1.78→2.74 s with a
    // localCheckpoint here; the same device on NARROW hash frames —
    // phash/simhash tables — wins at every scale). Runtime exchange
    // reuse shares the aggregation exchange between the aliased sides.
    val sig = shingles
      .select(col("__id"), col("__g"), shingleHash(col("__g")).as("__h32"))
      .groupBy(col("__id"))
      .agg(minAggs.head, (minAggs.tail :+ collect_set(col("__g")).as("__sh")): _*)
    // band signature: seed-ordered '_'-separated concat (variable-length
    // ints need the separator to keep signatures prefix-unambiguous)
    val bandStructs = (0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        concat_ws("_", (0 until rowsPerBand).map(r =>
          col(s"__mh${b * rowsPerBand + r}")): _*).as("band_sig"))
    }
    val banded = sig.select(col("__id"), explode(array(bandStructs: _*)).as("__band"))
      .select(col("__id"), col("__band.band_id").as("__band_id"),
        col("__band.band_sig").as("__band_sig"))

    // One aggregation per bucket replaces the window-count cap + self-join:
    // collect the (sorted) member ids, drop pathological buckets
    // (stop-shingle boilerplate) above maxBucket, and emit the i<j pairs
    // directly from each bucket. Buckets are bounded by the cap, so the
    // pair expansion is O(cap²) worst case per bucket — never a cross join,
    // and two fewer shuffles than the join formulation.
    val buckets =
      if (!skewSafe)
        banded.groupBy(col("__band_id"), col("__band_sig"))
          .agg(sort_array(collect_list(col("__id"))).as("__ids"))
          .filter(size(col("__ids")).between(2, maxBucket))
      else {
        // census first: partial-agg counts never concentrate a hot key's
        // ROWS; over-cap (boilerplate) buckets exit here, pre-collect
        val admissible = banded
          .groupBy(col("__band_id"), col("__band_sig"))
          .agg(count(lit(1)).as("__n"))
          .filter(col("__n").between(2, maxBucket))
          .select(col("__band_id"), col("__band_sig"))
        // semi-join filters banded to admissible buckets (AQE broadcasts
        // the admissible side when small, splits the skewed probe when
        // not — either way the dropped hot rows never reach a collect);
        // then a salted two-level collect: each (bucket, salt) partial
        // holds ≤ cap/salts members, the final flatten ≤ cap
        val salts = 8
        banded.join(admissible, Seq("__band_id", "__band_sig"), "left_semi")
          .groupBy(col("__band_id"), col("__band_sig"),
            pmod(hash(col("__id")), lit(salts)).as("__salt"))
          .agg(collect_list(col("__id")).as("__part"))
          .groupBy(col("__band_id"), col("__band_sig"))
          .agg(sort_array(flatten(collect_list(col("__part")))).as("__ids"))
      }
    val cand = buckets
      .select(explode(flatten(transform(col("__ids"), (x, i) =>
        transform(slice(col("__ids"), i + 2, size(col("__ids"))),
          y => struct(x.as("a"), y.as("b")))))).as("__p"))
      .select(col("__p.a").as("__ida"), col("__p.b").as("__idb"))
      .distinct()

    // no broadcast hint on cand: at 100 TB candidate sets can exceed any
    // broadcast budget (a hint would force it); AQE converts these joins to
    // broadcast at runtime whenever the candidate side is actually small
    val sa = sig.select(col("__id").as("__ida"), col("__sh").as("__sha"))
    val sb = sig.select(col("__id").as("__idb"), col("__sh").as("__shb"))
    cand.join(sa, "__ida").join(sb, "__idb")
      .withColumn("jaccard", jaccard(col("__sha"), col("__shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("__ida").as("doc_a"), col("__idb").as("doc_b"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** Incremental MinHash-LSH: near-dup pairs between an INCOMING batch and
    * an existing corpus only — corpus×corpus pairs are never generated
    * (they were handled when the corpus was ingested), so daily ingestion
    * pays O(incoming × collision rate), not a full re-pairing. Same
    * signature scheme as [[minhashNearDupPairs]]; the band join is
    * incoming-vs-corpus with the (usually much smaller) incoming side
    * eligible for AQE broadcast. Returns (incoming_id, corpus_id,
    * jaccard). */
  def minhashNearDupAgainst(
      corpus: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String,
      k: Int = 3, bands: Int = 4, rowsPerBand: Int = 3,
      threshold: Double = 0.5, maxBucket: Int = 1000): DataFrame = {
    val numHashes = bands * rowsPerBand
    def sigSets(df: DataFrame): DataFrame = {
      val rows = shingleRows(df, idCol, textCol, k)
      val minAggs = minhashAggs(col("__h32"), numHashes)
      rows.select(col("__id"), col("__g"), shingleHash(col("__g")).as("__h32"))
        .groupBy(col("__id"))
        .agg(minAggs.head, (minAggs.tail :+ collect_set(col("__g")).as("__sh")): _*)
    }
    def banded(sig: DataFrame): DataFrame = {
      val bandStructs = (0 until bands).map { b =>
        struct(lit(b).as("band_id"),
          concat_ws("_", (0 until rowsPerBand).map(r =>
            col(s"__mh${b * rowsPerBand + r}")): _*).as("band_sig"))
      }
      sig.select(col("__id"), explode(array(bandStructs: _*)).as("__band"))
        .select(col("__id"), col("__band.band_id").as("__band_id"),
          col("__band.band_sig").as("__band_sig"))
    }
    val corpSig = sigSets(corpus)
    val incSig = sigSets(incoming)
    // bucket-size cap applies to the corpus side (boilerplate buckets);
    // candidates are only cross-set, never corpus-internal. Census-first
    // like the skew-safe batch path: a count().over(band) window would
    // buffer a hot bucket's rows on ONE task just to count them, while
    // the groupBy census is map-side combinable (the hot key reaches its
    // reducer as partial counts). The banded subtree is read by both the
    // census and the probe; it stays LAZY on purpose — signatures are
    // deterministic md5 folds, so recompute is always safe, whereas a
    // checkpoint here would run an eager job at plan-construction time,
    // make executor loss unrecoverable, and pin blocks for the session.
    // A production ingestion pipeline materializes this LSH index as a
    // table instead.
    val allCorpBands = banded(corpSig)
    val admissible = allCorpBands
      .groupBy(col("__band_id"), col("__band_sig"))
      .agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBucket)
      .select(col("__band_id"), col("__band_sig"))
    val corpBands = allCorpBands
      .join(admissible, Seq("__band_id", "__band_sig"), "left_semi")
      .select(col("__id").as("__idc"), col("__band_id"), col("__band_sig"))
    val cand = banded(incSig).select(col("__id").as("__idi"),
        col("__band_id"), col("__band_sig"))
      .join(corpBands, Seq("__band_id", "__band_sig"))
      .select(col("__idi"), col("__idc")).distinct()
    val si = incSig.select(col("__id").as("__idi"), col("__sh").as("__shi"))
    val sc = corpSig.select(col("__id").as("__idc"), col("__sh").as("__shc"))
    cand.join(si, "__idi").join(sc, "__idc")
      .withColumn("jaccard", jaccard(col("__shi"), col("__shc")))
      .filter(col("jaccard") >= threshold)
      .select(col("__idi").as("incoming_id"), col("__idc").as("corpus_id"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** Relational 32-bit SimHash: explode tokens → one md5-derived 32-bit
    * hash per token (codegen'd) → explode bit positions → ±1 votes →
    * map-side-combinable sum per (doc, bit) → reassemble the hash. Produces
    * exactly [[simhash]]'s value, but scales: the column-expression form is
    * interpreted row-at-a-time and its vote array gets inlined (hence
    * recomputed) 32× by CollapseProject — ~100× slower on real corpora.
    * Two shuffles, both on (doc,bit)/(doc) keys with partial aggregation. */
  def simhashTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val votes = widen(df)
      .select(col(idCol).as("__id"),
        explode(TextFunctions.tokens(col(textCol))).as("__t"))
      .select(col("__id"),
        conv(substring(md5(col("__t").cast("binary")), 1, 8), 16, 10)
          .cast("long").as("__h"))
      .select(col("__id"), explode(sequence(lit(0), lit(31))).as("__b"), col("__h"))
      .select(col("__id"), col("__b"),
        when(pmod(floor(col("__h") / pow(lit(2.0), col("__b"))).cast("long"),
          lit(2)) === 1, 1L).otherwise(-1L).as("__v"))
      .groupBy(col("__id"), col("__b"))
      .agg(sum(col("__v")).as("__vote"))
    votes.groupBy(col("__id"))
      .agg(sum(when(col("__vote") > 0,
        pow(lit(2.0), col("__b")).cast("long")).otherwise(0L)).as("simhash"))
      .select(col("__id").as(idCol), col("simhash"))
  }

  /** 32-bit SimHash over (repeated) tokens: per bit, vote +1/-1 by the bit
    * of each token's md5-derived 32-bit hash; bit set iff vote > 0.
    * Bit extraction uses floor(h / 2^b) % 2 — portable to engines without
    * variable-shift operators. Column-expression form for ad-hoc use on
    * modest data; pipelines should use [[simhashTable]] (same values,
    * codegen'd and distributed). */
  def simhash(text: Column): Column = {
    val toks = TextFunctions.tokens(text)
    val tokHash = transform(toks,
      t => conv(substring(md5(t.cast("binary")), 1, 8), 16, 10).cast("long"))
    val votes = transform(sequence(lit(0), lit(31)), b =>
      aggregate(tokHash, lit(0L), (acc, h) =>
        acc + when(pmod(floor(h / pow(lit(2.0), b)).cast("long"), lit(2)) === 1, 1L)
          .otherwise(-1L)))
    aggregate(
      transform(sequence(lit(0), lit(31)), b =>
        when(element_at(votes, b + 1) > 0, pow(lit(2.0), b).cast("long")).otherwise(0L)),
      lit(0L), (acc, x) => acc + x)
  }

  /** SimHash near-duplicate pairs with Hamming distance ≤ maxDist.
    *
    * Banding: split the 32-bit hash into `maxDist+1` byte-ish bands — by
    * pigeonhole, any pair within maxDist shares at least one exact band, so
    * candidates come from equality joins on (band_id, band_bits), never a
    * cross join. Verification = popcount(xor) on the full hash. */
  def simhashNearDupPairs(
      df: DataFrame, idCol: String, textCol: String, maxDist: Int = 3): DataFrame =
    simhashNearDupPairsFromHashes(
      // both self-join legs consume the hash table; without
      // materialization the two-shuffle simhash pipeline runs once PER
      // LEG (no exchange reuse across the differently-aliased legs —
      // measured on q177's executed plan). The checkpointed frame is
      // (id, 8-byte hash): tiny vs the token/vote pipeline it replaces.
      simhashTable(df, idCol, textCol).localCheckpoint(),
      idCol, maxDist)

  /** [[simhashNearDupPairs]] over a PRECOMPUTED (idCol, simhash) table —
    * the seam an audit needs to share ONE materialized hash frame
    * between the banded arm and an exact verification arm (otherwise
    * each arm builds its own hash pipeline; measured 2× on q177). The
    * caller owns materializing `hashes`. */
  def simhashNearDupPairsFromHashes(
      hashes: DataFrame, idCol: String, maxDist: Int = 3): DataFrame = {
    val nBands = maxDist + 1
    val bandBits = 32 / nBands
    val hashed = hashes
      .select(col(idCol).as("__id"), col("simhash").as("__h"))
    val banded = hashed.select(col("__id"), col("__h"), explode(
      transform(sequence(lit(0), lit(nBands - 1)), b => struct(
        b.as("band_id"),
        pmod(floor(col("__h") / pow(lit(2.0), b * bandBits)).cast("long"),
          lit(1L << bandBits)).as("band_bits")))).as("__b"))
      .select(col("__id"), col("__h"),
        col("__b.band_id").as("__band_id"), col("__b.band_bits").as("__band_bits"))
    val a = banded.select(col("__id").as("__ida"), col("__h").as("__ha"),
      col("__band_id"), col("__band_bits"))
    val b = banded.select(col("__id").as("__idb"), col("__h").as("__hb"),
      col("__band_id"), col("__band_bits"))
    a.join(b, Seq("__band_id", "__band_bits"))
      .filter(col("__ida") < col("__idb"))
      .select(col("__ida"), col("__idb"),
        call_function("bit_count", col("__ha").bitwiseXOR(col("__hb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
      .select(col("__ida").as("doc_a"), col("__idb").as("doc_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard pairs via an INVERTED-INDEX join — the form of
    * [[ngramJaccardPairs]] that survives corpus scale. Instead of an
    * all-pairs product, candidate pairs materialize only where documents
    * actually share a shingle: shuffle on the shingle, count shared
    * distinct shingles per pair (map-side combinable), then one small
    * join against per-doc set sizes closes the Jaccard formula
    * |A∩B| / (|A|+|B|−|A∩B|). Exact — no LSH approximation — with cost
    * Σ_g df(g)² over shingles instead of |docs|²; a hyper-frequent
    * shingle is the skew channel, which real systems cap with positional
    * prefix filtering (documented, not applied: results here stay exact). */
  /** Prefix-filtered candidate pairs (AllPairs/PPJoin lineage, Bayardo
    * et al., WWW 2007 — lossless): under the global total order
    * (document frequency asc, gram asc), every Jaccard-θ pair must share
    * a gram inside BOTH documents' "prefix" — the first
    * `|x| − ⌈θ·|x|⌉ + 1` rarest grams — and every containment-θ pair one
    * inside the CONTAINED side's prefix. Proof sketch: the smallest
    * shared gram g* bounds the overlap; if g* sat past either required
    * prefix, all shared grams would, capping the overlap below θ·|x|.
    * So indexing only prefixes loses nothing, and the join mass drops
    * from Σ df(g)² to Σ prefixdf(g)·df(g) — and prefixdf is tiny for
    * exactly the high-df grams that dominate Σ df² (a gram every
    * document shares is in almost no document's rarest-10% prefix).
    * Measured on the 10×-scale audit corpus: q100's containment pass
    * 78 s → see BASELINE.md round-9 table.
    *
    * The ⌈θ·n⌉ is computed as ceil(θ·n − 1e-9): fp noise may only ever
    * LENGTHEN the prefix (more candidates, still exact), never shorten
    * it below the real bound.
    *
    * Candidates are ordered (doc_a probes with its prefix against ALL of
    * doc_b's grams — the asymmetric-containment form; the symmetric
    * both-prefix form was tried for the Jaccard join and measured WORSE
    * at θ=0.5, see [[ngramJaccardIndexPairs]]). */
  private def prefixCandidates(rows: DataFrame, threshold: Double): DataFrame = {
    val dfreq = rows.groupBy(col("__g")).agg(count(lit(1)).as("__df"))
    val byDoc = Window.partitionBy(col("__id"))
    val sized = rows.join(dfreq, Seq("__g"))
      .select(col("__id"), col("__g"),
        row_number().over(byDoc.orderBy(col("__df"), col("__g"))).as("__pos"),
        count(lit(1)).over(byDoc).as("__n"))
    val pref = sized
      .filter(col("__pos") <=
        col("__n") - ceil(lit(threshold) * col("__n") - lit(1e-9)) + 1)
      .select(col("__id"), col("__g"))
    pref.select(col("__id").as("doc_a"), col("__g"))
      .join(rows.select(col("__id").as("doc_b"), col("__g")), Seq("__g"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
  }

  /** Exact all-corpus Jaccard via the count-based inverted-index join:
    * Σ df(g)² shared-gram rows hash-aggregate into per-pair intersection
    * counts — no arrays ever move. Round 9 measured this AGAINST a
    * prefix-filtered (AllPairs) variant at the 10× audit scale and the
    * count-based join won (23 s vs 48 s): at θ=0.5 the Jaccard prefix is
    * half of every document, so the filter prunes little while paying
    * candidate-distinct and array-verify costs (BASELINE.md round-9 10×
    * audit). This op is the exact audit/verification tool; the at-scale
    * candidate generator over a 100 TB corpus is the MinHash-LSH family. */
  def ngramJaccardIndexPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.3): DataFrame =
    // the distinct (doc, gram) rows feed three consumers but stay LAZY:
    // a localCheckpoint of the gram-string frame measured a 1× win
    // (3.0→2.3 s) that INVERTED at 10× (15.3→18.5 s) — heavy string
    // frames cost more to block-manager-materialize than to recompute
    // (r17); the distinct exchange is shared by runtime reuse instead
    ngramJaccardIndexPairsFromShingles(
      shingleRows(df, idCol, textCol, k)
        .select(col("__id"), col("__g")).distinct(),
      threshold)

  /** [[ngramJaccardIndexPairs]] over precomputed DISTINCT (__id, __g)
    * shingle rows — the shared-frame seam for audits that run this exact
    * arm next to an LSH arm over the same grams. The caller owns
    * materializing (and deduplicating) `shingles`. */
  def ngramJaccardIndexPairsFromShingles(
      shingles: DataFrame, threshold: Double): DataFrame = {
    val rows = shingles
    val sizes = rows.groupBy(col("__id")).agg(count(lit(1)).as("__n"))
    val inter = rows.select(col("__id").as("doc_a"), col("__g"))
      .join(rows.select(col("__id").as("doc_b"), col("__g")), Seq("__g"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("__i"))
    inter
      .join(sizes.select(col("__id").as("doc_a"), col("__n").as("__na")), Seq("doc_a"))
      .join(sizes.select(col("__id").as("doc_b"), col("__n").as("__nb")), Seq("doc_b"))
      .withColumn("jaccard",
        col("__i").cast("double") / (col("__na") + col("__nb") - col("__i")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Asymmetric CONTAINMENT pairs, prefix-filtered on the contained
    * side: |A∩B| / |A| ≥ threshold flags "A is (mostly) contained in B"
    * — the subset-duplicate case Jaccard under-scores when |B| ≫ |A| (a
    * doc embedded inside a larger one dilutes the union). Emits both
    * directions per unordered pair when both clear the threshold, since
    * containment(A,B) ≠ containment(B,A). */
  def ngramContainmentPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8): DataFrame = {
    // four consumers re-reference the gram rows, which stay LAZY by the
    // same 10× measurement as ngramJaccardIndexPairs: heavy string
    // frames cost more to materialize than to recompute (r17)
    val rows = shingleRows(df, idCol, textCol, k)
      .select(col("__id"), col("__g")).distinct()
    // rows are already distinct per doc — collect_list builds the set
    val sets = rows.groupBy(col("__id")).agg(collect_list(col("__g")).as("__sh"))
    prefixCandidates(rows, threshold)
      .join(sets.select(col("__id").as("doc_a"), col("__sh").as("__sha")), Seq("doc_a"))
      .join(sets.select(col("__id").as("doc_b"), col("__sh").as("__shb")), Seq("doc_b"))
      .withColumn("containment",
        size(array_intersect(col("__sha"), col("__shb"))).cast("double")
          / size(col("__sha")))
      .filter(col("containment") >= threshold)
      .select(col("doc_a"), col("doc_b"),
        round(col("containment"), 6).as("containment"))
  }

  /** Blocked n-gram Jaccard: all-pairs similarity within explicit blocks
    * (e.g. a sample, a partition key). The caller controls block size — this
    * is the exact-verification primitive, not the at-scale candidate
    * generator (that's [[minhashNearDupPairs]] or
    * [[ngramJaccardIndexPairs]]). */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.3): DataFrame = {
    val sh = shingleSets(df, idCol, textCol, k)
    val a = sh.select(col("__id").as("doc_a"), col("__sh").as("__sha"))
    val b = sh.select(col("__id").as("doc_b"), col("__sh").as("__shb"))
    a.join(b, col("doc_a") < col("doc_b"))
      .withColumn("jaccard", jaccard(col("__sha"), col("__shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Corpus-level MinHash similarity matrix between SOURCES — the
    * "which feeds overlap in content space" estimate that q125's exact
    * fingerprint matrix can't see (it only counts verbatim duplicates;
    * this sketches the union shingle-set resemblance, catching feeds
    * that paraphrase or re-crawl each other). Because min is
    * associative, the union-of-sets signature needs no per-document
    * stage: each source's signature component s is min over ALL its
    * docs' shingle hashes of the linear permutation — one
    * map-side-combinable aggregate keyed on the source.
    *
    * Scale shape for 100 TB: gram extraction is [[kgramRows]]' windowed
    * pass (doc-keyed — the source key never sees unaggregated rows, so a
    * giant source is NOT a hot partition: partial mins collapse each
    * upstream partition to numHashes values before the |sources|-row
    * shuffle); the pair stage is |sources|² over a |sources|×numHashes
    * table — driver-trivial at any corpus size.
    *
    * @return (src_a, src_b, n_match, est_jaccard) for src_a < src_b */
  def sourceMinhashMatrix(df: DataFrame, idCol: String, srcCol: String,
      textCol: String, k: Int = 3, numHashes: Int = 64): DataFrame = {
    // same fallback contract as shingleRows: short docs contribute their
    // whole text; the doc id keys the k-gram window, the source rides
    // along inside the composite __id
    val toks = widen(df).filter(col(idCol).isNotNull)
      .select(struct(col(idCol).as("doc"), col(srcCol).as("src")).as("__id"),
        TextFunctions.tokens(col(textCol)).as("__toks"))
    val nTok = coalesce(size(col("__toks")), lit(0))
    val whole = toks.filter(nTok < k)
      .select(col("__id"), concat_ws(" ", col("__toks")).as("__g"))
    val grams = kgramRows(toks.filter(nTok >= k), k)
      .select(col("__id"), col("__g")).unionByName(whole)
    val aggs = minhashAggs(shingleHash(col("__g")), numHashes)
    val sigs = grams
      .select(col("__id").getField("src").as("source"), col("__g"))
      .groupBy(col("source"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("source"),
        array((0 until numHashes).map(s => col(s"__mh$s")): _*).as("__sig"))
      // deliberately LAZY (r17): an eager checkpoint of even this
      // |sources|-row table measured 2.0→5.2 s at 10× — the lazy
      // single-job form overlaps both legs' stages and shares the
      // aggregation exchange at runtime
    val a = sigs.select(col("source").as("src_a"), col("__sig").as("__sa"))
    val b = sigs.select(col("source").as("src_b"), col("__sig").as("__sb"))
    a.join(b, col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        size(filter(zip_with(col("__sa"), col("__sb"), (x, y) => x === y),
          m => m)).cast("long").as("n_match"))
      .withColumn("est_jaccard",
        col("n_match").cast("double") / numHashes)
  }

  /** Per-document k-gram novelty — the curation signal behind
    * novelty-ordered training (a document whose k-grams are already
    * covered by earlier documents adds little new surface): for each
    * document, the fraction of its DISTINCT word k-grams whose corpus-wide
    * first occurrence (minimum doc id) is this document. A gram unique to
    * one document is novel for it; a gram shared across documents is novel
    * only for the lowest id. Deterministic given the id order — no
    * tie-breaking randomness.
    *
    * Scale shape for 100 TB: [[shingleRows]]' zero-key-shuffle gram
    * extraction → per-doc distinct (one shuffle on (gram, doc)) → the
    * first-occurrence census is a map-side-combinable `min(doc)` keyed on
    * the gram → one join back on the gram and a final per-doc count
    * aggregate. Every moving row is a (hash-sized gram, id) pair; nothing
    * is ever all-pairs and no stage holds a document's text after
    * extraction.
    *
    * Output: (doc_id, n_grams, n_novel, novelty) with novelty =
    * n_novel/n_grams as an exact long/long IEEE division. */
  def kgramNovelty(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    // deliberately LAZY (r17): the census and the novelty join hang off
    // the same distinct exchange, which runtime exchange reuse already
    // shares — an eager checkpoint here measured ~1.3× slower
    val grams = shingleRows(df, idCol, textCol, k)
      .select(col("__id"), col("__g")).distinct()
    val firstSeen = grams.groupBy(col("__g"))
      .agg(min(col("__id")).as("__first"))
    grams.join(firstSeen, Seq("__g"))
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__first") === col("__id"), 1L).otherwise(0L))
          .as("n_novel"))
      .select(col("__id").as("doc_id"), col("n_grams"), col("n_novel"),
        (col("n_novel").cast("double") / col("n_grams")).as("novelty"))
  }

  /** Cross-document exact-substring dedup (the ExactSubstr pass of Lee et
    * al., "Deduplicating Training Data Makes Language Models Better",
    * 2022, adapted from suffix arrays to token k-gram anchors): every
    * occurrence of a token k-gram that appears more than once in the
    * corpus is removed EXCEPT the globally first occurrence (minimum
    * (doc, position)), and each document is reassembled from its
    * surviving token positions. Complements [[graft.ops.Chunking.intraDocTileDedup]]
    * (own-document repetition only) and
    * [[graft.ops.Chunking.boilerplateRemoval]] (whole-segment document
    * frequency): this pass catches ARBITRARY shared spans — quotes,
    * syndicated sentences, licence fragments — at token granularity,
    * because every duplicated span of length ≥ k is a run of duplicated
    * k-grams and is covered position-by-position.
    *
    * Scale shape for 100 TB: gram extraction is a per-row array build +
    * posexplode (linear, no window); the occurrence census is a map-side-
    * combinable `count + min(struct(doc, pos))` keyed on the gram hash;
    * flagging is one hash-keyed join against the duplicated subset of the
    * census; removal-set assembly is one doc-keyed `collect_set` whose
    * size is bounded by the document's own length; reassembly is per-row
    * array ops. Nothing is all-pairs, no text moves after tokenization
    * (only 16-byte hashes and int positions), and a suffix array — a
    * global sort of every corpus position — is never built.
    *
    * Output: (doc_id, n_toks, n_removed, text_dedup), one row per input
    * document; text_dedup is the surviving tokens joined by single
    * spaces (whitespace-normalized, like every token-level op here). */
  def exactSubstringDedup(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"exactSubstringDedup: k must be >= 2, got $k")
    // deliberately LAZY throughout (r17): checkpointing the token-array
    // and gram frames here won 2.75→1.25 s at 1× but read 3.7→17+ s at
    // 10× — materializing heavy variable-length frames (string arrays,
    // hash rows) in the block manager costs more than re-running the
    // codegen tokenize/explode at scale, and scale is the mandate
    val toks = TextFunctions.widen(df).filter(col(idCol).isNotNull)
      .select(col(idCol).as("__id"), TextFunctions.tokens(col(textCol)).as("__t"))
    val n = size(col("__t"))
    val grams = toks.filter(n >= k)
      .select(col("__id"), posexplode(transform(sequence(lit(0), n - k),
        i => md5(array_join(slice(col("__t"), i + 1, lit(k)), " ")
          .cast("binary")))).as(Seq("__pos", "__h")))
    val census = grams.groupBy(col("__h"))
      .agg(count(lit(1)).as("__cnt"),
        min(struct(col("__id"), col("__pos"))).as("__first"))
    val flagged = grams
      .join(census.filter(col("__cnt") > 1).select(col("__h"), col("__first")),
        Seq("__h"))
      .filter(col("__id") =!= col("__first.__id") ||
        col("__pos") =!= col("__first.__pos"))
      .select(col("__id"), col("__pos"))
    val removed = flagged.groupBy(col("__id"))
      .agg(array_distinct(flatten(collect_list(
        sequence(col("__pos"), col("__pos") + k - 1)))).as("__rm"))
    toks.join(removed, Seq("__id"), "left")
      .select(col("__id").as("doc_id"),
        size(col("__t")).cast("long").as("n_toks"),
        coalesce(size(col("__rm")), lit(0)).cast("long").as("n_removed"),
        array_join(filter(col("__t"),
          (t, i) => coalesce(!array_contains(col("__rm"), i), lit(true))),
          " ").as("text_dedup"))
  }
}
