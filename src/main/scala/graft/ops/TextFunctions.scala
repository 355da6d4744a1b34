package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines, built
  * exclusively from codegen'd `org.apache.spark.sql.functions` (no UDFs —
  * every operator here stays inside whole-stage codegen and runs at full
  * columnar speed on 100 TB; see the builder mandate + SURVEY.md §7.4).
  *
  * Every function is deterministic and mirrored 1:1 by ANSI SQL in
  * [[graft.queries.TextQueries]] so the DuckDB oracle hash-checks it.
  */
object TextFunctions {

  /** Fan a narrow (often single-file) input out to full parallelism before
    * per-row-heavy columnar work; no-op when the scan is already wide. At
    * 100 TB scans arrive in thousands of partitions and this never fires. */
  def widen(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Whitespace tokenization after lowercase+trim. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword proxy: word pieces = letter runs, digit runs, and
    * single non-alphanumeric marks — the classic GPT-2 pre-tokenizer shape
    * without the merges table. A cheap, deterministic token-budget
    * estimator for corpus accounting. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
      .cast("long")

  /** Ratio of sentence-punctuation chars to total chars. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") / length(text))

  private val enStop = Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that")

  /** Fraction of tokens that are (English) stopwords — the classic
    * Gopher/C4-style quality signal. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      size(filter(toks, t => t.isInCollection(enStop))).cast("double") / size(toks))
  }

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
  }

  /** Composite quality score in [0,1]: length credit, wordiness credit,
    * punctuation sanity. Deterministic; thresholds chosen once and mirrored
    * in the oracle SQL — the *shape* (cheap columnar signals combined
    * linearly) is what matters for the 100 TB pipeline. */
  def qualityScore(text: Column): Column = round(qualityScoreRaw(text), 6)

  /** Unrounded quality score: pure double arithmetic in a fixed order, so
    * any engine computing the same expression gets the bit-identical
    * value. Thresholding decisions (e.g. weighted sampling rates) must
    * use THIS form — round(…,6) is display-friendly but Spark (BigDecimal
    * HALF_UP) and other engines can disagree on half-cases, and a
    * disagreement amplified through floor()+comparison flips row
    * membership instead of one displayed cell. */
  def qualityScoreRaw(text: Column): Column = {
    val lenCredit = least(length(text).cast("double") / 500.0, lit(1.0))
    val tokCredit = least(tokenCount(text).cast("double") / 100.0, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 5.0, lit(1.0))
    lenCredit * 0.4 + tokCredit * 0.4 + (lit(1.0) - punctPenalty) * 0.2
  }

  /** DuckDB mirror of [[qualityScoreRaw]] — single source for every
    * oracle that replays the quality formula. */
  val qualityRawSql: String =
    """least(CAST(length(text) AS DOUBLE)/500.0, 1.0)*0.4
      |      + least(CAST(len(regexp_split_to_array(lower(trim(text)), '\s+')) AS DOUBLE)/100.0, 1.0)*0.4
      |      + (1.0 - least(CASE WHEN length(text)=0 THEN 0.0 ELSE
      |          CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)/length(text) END * 5.0, 1.0))*0.2""".stripMargin

  /** DuckDB mirror of [[qualityScore]]. */
  val qualitySql: String = s"round($qualityRawSql, 6)"

  private val langLexicons: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "fr" -> Seq("le", "la", "de", "et", "un", "que", "pour"),
    "de" -> Seq("der", "die", "und", "das", "ein", "zu", "ist"))

  /** N-gram-free language ID heuristic: count stopword hits per language
    * lexicon, argmax with fixed priority order (en,es,fr,de), `und` when no
    * lexicon fires. On real corpora the lexicons would be larger n-gram
    * tables; the operator shape (per-row scoring against broadcast-literal
    * tables, no shuffle) is identical at any lexicon size. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = langLexicons.map { case (lang, lex) =>
      lang -> size(filter(toks, t => t.isInCollection(lex)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldLeft(when(best <= 0, "und")) { case (acc, (lang, score)) =>
      acc.when(score === best, lang)
    }.otherwise("und")
  }

  /** DuckDB mirror of [[langId]], generated from the SAME lexicon table so
    * the two can't drift — single source for every oracle that replays
    * language ID (q31, q80). */
  val langIdSql: String = {
    def score(lex: Seq[String]) =
      "len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), " +
        s"t -> list_contains([${lex.map(w => s"'$w'").mkString(",")}], t)))"
    val scores = langLexicons.map { case (lang, lex) => lang -> score(lex) }
    val best = scores.map(_._2).mkString("greatest(", ",", ")")
    s"CASE WHEN $best <= 0 THEN 'und' " +
      scores.map { case (lang, sc) => s"WHEN $sc = $best THEN '$lang'" }.mkString(" ") +
      " ELSE 'und' END"
  }

  /** Content fingerprint for exact dedup: md5 of
    * whitespace-normalized lowercase text. */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  /** Character-level Shannon entropy in nats — the Gopher-style signal for
    * degenerate text (repeated-char runs, binary junk, single-symbol spam
    * all score near 0; natural prose sits ~3–4.3). Computed ENTIRELY
    * per-row with codegen'd array functions — distinct chars × per-char
    * count via `transform`/`filter` over the char array, O(alphabet·len)
    * per row, zero shuffles at any corpus size (the explode+groupBy
    * alternative shuffles one row per character — at 100 TB that is the
    * whole corpus through the wire for a per-doc statistic).
    *
    * Each term −p·ln p is a fixed-shape double; the per-row fold
    * accumulates decimal(27,15) (the repo-wide rule), so any engine
    * summing the same terms in any order matches bit-for-bit. */
  /** Shannon character entropy — the codegen'd one-pass
    * [[graft.functions.CharEntropy]] expression (O(len) per row, inside
    * whole-stage codegen). Numerically identical to
    * [[charEntropyComposable]], which stays as the readable spec of the
    * term ladder (OpsSpec pins the equivalence). */
  def charEntropy(text: Column): Column =
    graft.functions.CharEntropy(text)

  /** The composable HOF formulation charEntropy is specified by: one
    * decimal(27,15) term per distinct char, p·ln(p)·−1 in double. Kept
    * for the equivalence spec — O(distinct × len) interpreted lambdas
    * per row, so not the hot path. */
  def charEntropyComposable(text: Column): Column = {
    val chars = split(text, "")
    val n = size(chars)
    val terms = transform(array_distinct(chars), c => {
      val p = size(filter(chars, x => x === c)).cast("double") / n
      (p * log(p) * lit(-1.0)).cast("decimal(27,15)")
    })
    when(n === 0, lit(0.0)).otherwise(
      aggregate(terms, lit(0).cast("decimal(27,15)"),
        (acc, t) => (acc + t).cast("decimal(27,15)")).cast("double"))
  }

  def distinctCharCount(text: Column): Column =
    size(array_distinct(split(text, ""))).cast("long")
}
