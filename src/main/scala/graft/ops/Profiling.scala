package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Column profiling: per-column null counts, exact distinct counts, and
  * min/max — the data-quality / schema-drift report a pipeline runs over
  * every new table drop before trusting it.
  *
  * Shape: one column-pruned aggregation pass PER COLUMN, unioned. The
  * tempting "single pass" alternative — one aggregate carrying multiple
  * exact count-distincts — plans as an Expand that multiplies the row
  * stream by |cols|+1 and shuffles the whole widened stream into one
  * dedup aggregate (measured 6× slower at sf0.1 than the per-column
  * form). Against a columnar source the per-column passes read exactly
  * one column each, so total bytes scanned equal the single-pass scan,
  * every pass is an ordinary two-stage hash aggregate, and passes for
  * different columns run as independent jobs. Min/max evaluate on the
  * NATIVE column type (lexicographic min of a stringified number would
  * be wrong) and stringify only for the uniform report schema.
  */
object Profiling {

  /** Profile `cols` of `df`. Columns must stringify portably (integers,
    * strings, dates — not doubles, whose string forms are
    * engine-specific).
    *
    * @return one row per column: (column, n_rows, n_nulls, n_distinct,
    *         min_val, max_val); n_distinct excludes nulls, min/max are
    *         null for all-null columns
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need >= 1 column")
    cols.map { c =>
      df.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_val"),
          max(col(c)).cast("string").as("max_val"))
        .select(lit(c).as("column"), col("n_rows"), col("n_nulls"),
          col("n_distinct"), col("min_val"), col("max_val"))
    }.reduce(_ unionByName _)
  }

  /** Per-group robust outlier report via median / MAD — the
    * scale-resistant anomaly screen (mean/stddev move with the outliers
    * they're meant to find; the median absolute deviation doesn't).
    * A value is an outlier when |x − median| > cutoff · 1.4826 · MAD
    * (1.4826 scales MAD to σ under normality, so `cutoff` reads as a
    * z-score).
    *
    * Determinism: median and MAD are exact per-group percentiles rounded
    * to 6 dp BEFORE the deviation/threshold arithmetic, so every
    * comparison runs on identically-rounded doubles in any engine.
    *
    * Scale: two keyed aggregations + two keyed joins — shuffles carry the
    * group key, never a global sort. Exact per-group percentile holds
    * while single groups fit an executor (true for keyed groups like
    * supplier/host); unbounded groups would switch to approx_percentile.
    *
    * @return one row per group: (keyCol, n, med, mad, n_outliers) */
  def robustOutliers(df: DataFrame, keyCol: String, valCol: String,
      cutoff: Double = 3.0): DataFrame = {
    require(cutoff > 0, s"robustOutliers: cutoff must be > 0, got $cutoff")
    val med = df.groupBy(col(keyCol))
      .agg(round(expr(s"percentile($valCol, 0.5)"), 6).as("med"))
    // the deviation frame feeds BOTH the MAD aggregation and the final
    // outlier count and stays LAZY (r17): a localCheckpoint here won
    // 2.5→2.1 s at 1× and LOST 3.4→29 s at 10× — the exact-percentile
    // consumers buffer per-group values either way, and materializing
    // the row-per-input frame only added block-manager pressure.
    val dev = df.join(med, Seq(keyCol))
      .withColumn("__absdev", round(abs(col(valCol) - col("med")), 6))
    val mad = dev.groupBy(col(keyCol))
      .agg(round(expr("percentile(__absdev, 0.5)"), 6).as("mad"))
    dev.join(mad, Seq(keyCol))
      .groupBy(col(keyCol), col("med"), col("mad"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__absdev") >
            round(lit(cutoff) * lit(1.4826) * col("mad"), 6), 1L)
          .otherwise(0L)).as("n_outliers"))
      .select(col(keyCol), col("n"), col("med"), col("mad"), col("n_outliers"))
  }

  /** Cross-group score calibration: each row gets its within-group
    * percent-rank (ties broken on id, so the rank is total) and its
    * within-group z-score — the standard move to make a per-source
    * quality score comparable across heterogeneous sources before a
    * global threshold or mixture is applied.
    *
    * Determinism: mean/variance come from exact decimal(38,0) sums of
    * the integral score (sum and sum-of-squares), converted to double
    * only for the final closed-form arithmetic — identical in any
    * engine, no float accumulation order. percent_rank over a total
    * order is exact rational (r−1)/(n−1).
    *
    * Scale: one keyed aggregation + one keyed join + one keyed window —
    * every shuffle carries the group key. Requires an integral score
    * column (exact sums); fractional scores would take the
    * decimal(27,15) route.
    *
    * @return (idCol, grpCol, valCol, pr, z) */
  def calibrateScores(df: DataFrame, idCol: String, grpCol: String,
      valCol: String): DataFrame = {
    val w = Window.partitionBy(col(grpCol)).orderBy(col(valCol), col(idCol))
    val stats = df.groupBy(col(grpCol)).agg(
      count(lit(1)).as("__n"),
      sum(col(valCol).cast("decimal(38,0)")).as("__s"),
      sum((col(valCol) * col(valCol)).cast("decimal(38,0)")).as("__ss"))
    val sd = col("__s").cast("double")
    val ssd = col("__ss").cast("double")
    val mean = sd / col("__n")
    val variance = (ssd - sd * sd / col("__n")) / (col("__n") - 1)
    df.join(stats, Seq(grpCol))
      .withColumn("pr", round(percent_rank().over(w), 6))
      .select(col(idCol), col(grpCol), col(valCol), col("pr"),
        // degenerate groups (n = 1 or zero spread) get null z, matching
        // linearFit's convention — never NaN/Infinity, which would sort
        // above every real score in Spark
        when(col("__n") >= 2 && variance > 0,
          round((col(valCol) - mean) / sqrt(variance), 6)).as("z"))
  }

  /** Time-bucketed volume anomaly detection: events are counted per
    * (series, hour) and each hour's count is z-scored against that
    * series' own hourly distribution; |z| > cutoff flags the hour — the
    * monitoring query a pipeline runs over its ingest stream to catch
    * traffic spikes and outages.
    *
    * Determinism: hourly counts are integers, so the per-series sums
    * (count, sum, sum-of-squares) are exact; z is closed-form double
    * arithmetic on exact integers, and the flag compares the 6
    * dp-ROUNDED z so no engine-ulp can flip it.
    *
    * Scale: two map-side-combinable aggregations (the second over one
    * row per series-hour — already tiny relative to the input) and one
    * broadcast-sized join keyed by series.
    *
    * @return (typeCol, hour, n, z, is_anomaly) */
  def hourlyAnomaly(events: DataFrame, typeCol: String, tsCol: String,
      cutoff: Double = 2.0): DataFrame = {
    require(cutoff > 0, s"hourlyAnomaly: cutoff must be > 0, got $cutoff")
    val hourly = events
      .groupBy(col(typeCol), date_trunc("hour", col(tsCol)).as("hour"))
      .agg(count(lit(1)).as("n"))
    val stats = hourly.groupBy(col(typeCol)).agg(
      count(lit(1)).as("__h"),
      sum(col("n")).as("__s"),
      sum(col("n") * col("n")).as("__ss"))
    val sd = col("__s").cast("double")
    val ssd = col("__ss").cast("double")
    val mean = sd / col("__h")
    val variance = (ssd - sd * sd / col("__h")) / (col("__h") - 1)
    hourly.join(broadcast(stats), Seq(typeCol))
      // a single-hour series or a perfectly steady one has variance 0;
      // 0/0 = NaN would compare GREATER than the cutoff in Spark and
      // flag every hour of a flat series — the opposite of intent. Null
      // z + false flag, matching linearFit's degenerate-group convention.
      .withColumn("z", when(col("__h") >= 2 && variance > 0,
        round((col("n") - mean) / sqrt(variance), 6)))
      .select(col(typeCol), col("hour"), col("n"), col("z"),
        coalesce(abs(col("z")) > cutoff, lit(false)).as("is_anomaly"))
  }

  /** Semi-structured key profile: one row per JSON key across a string
    * column of JSON objects — occurrence count, distinct-value count,
    * min/max value (as strings) — the "what's actually in this props
    * blob" discovery query that precedes schema-ing a semi-structured
    * drop. Values profile as their JSON-scalar string forms (numbers
    * unquoted, booleans true/false), the cross-engine-stable spelling.
    *
    * Scale: one `from_json` map parse + explode (codegen'd) and one
    * key-grouped map-side-combinable aggregation — key cardinality is
    * schema-sized, so the shuffle is metadata-thin no matter the corpus.
    *
    * @return (key, n, n_distinct, min_val, max_val) */
  def jsonKeyProfile(df: DataFrame, jsonCol: String): DataFrame =
    df.filter(col(jsonCol).isNotNull)
      .select(explode(from_json(col(jsonCol),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))).as(Seq("key", "__v")))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("__v")).as("n_distinct"),
        min(col("__v")).as("min_val"),
        max(col("__v")).as("max_val"))

  /** Schema drift between two table versions: one row per changed
    * column — `added`, `removed`, `retyped` (old/new SQL types shown),
    * or `renullabled`. The report a pipeline gates a new drop on before
    * q105-style content profiling; driver-side (schemas are metadata). */
  def schemaDiff(spark: SparkSession, before: StructType,
      after: StructType): DataFrame = {
    val b = before.fields.map(f => f.name -> f).toMap
    val a = after.fields.map(f => f.name -> f).toMap
    val rows =
      a.keySet.diff(b.keySet).toSeq.sorted.map(n =>
        (n, "added", null: String, a(n).dataType.sql)) ++
      b.keySet.diff(a.keySet).toSeq.sorted.map(n =>
        (n, "removed", b(n).dataType.sql, null: String)) ++
      a.keySet.intersect(b.keySet).toSeq.sorted.flatMap { n =>
        if (b(n).dataType != a(n).dataType)
          Some((n, "retyped", b(n).dataType.sql, a(n).dataType.sql))
        else if (b(n).nullable != a(n).nullable)
          Some((n, "renullabled", b(n).nullable.toString, a(n).nullable.toString))
        else None
      }
    import spark.implicits._
    rows.toDF("column", "change", "before", "after")
  }

  /** Decimal-pinned per-group simple linear regression (ordinary least
    * squares on one predictor): the five moment sums Σx, Σy, Σx², Σxy,
    * Σy² are accumulated as decimal(27,15) (each term computed once in
    * double, then cast — the q134 device), so partial-aggregation merge
    * order can't wiggle the fit; slope/intercept/R² are closed-form
    * doubles over the exactly-reproducible moments. The building block
    * for trend detection and power-law fits — one map-side-combinable
    * aggregate per group, no iteration, no driver math.
    *
    * Degenerate groups (zero x-variance, or zero y-variance for R²)
    * yield null for the affected statistics rather than ±Inf/NaN.
    *
    * Output: grpCols ++ (n, slope, intercept, r2), 6-dp rounded. */
  def linearFit(df: DataFrame, grpCols: Seq[String], xCol: String,
      yCol: String): DataFrame = {
    val dec = "decimal(27,15)"
    val prepped = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(grpCols.map(col) ++ Seq(
        col(xCol).cast("double").as("__x"),
        col(yCol).cast("double").as("__y")): _*)
      .select(grpCols.map(col) ++ Seq(
        col("__x").cast(dec).as("__xd"), col("__y").cast(dec).as("__yd"),
        (col("__x") * col("__x")).cast(dec).as("__xx"),
        (col("__x") * col("__y")).cast(dec).as("__xy"),
        (col("__y") * col("__y")).cast(dec).as("__yy")): _*)
    val aggd = (if (grpCols.isEmpty) prepped.groupBy()
      else prepped.groupBy(grpCols.map(col): _*))
      .agg(count(lit(1)).as("n"),
        sum(col("__xd")).as("__sx"), sum(col("__yd")).as("__sy"),
        sum(col("__xx")).as("__sxx"), sum(col("__xy")).as("__sxy"),
        sum(col("__yy")).as("__syy"))
    val n = col("n").cast("double")
    val sx = col("__sx").cast("double"); val sy = col("__sy").cast("double")
    val sxx = col("__sxx").cast("double"); val sxy = col("__sxy").cast("double")
    val syy = col("__syy").cast("double")
    val varx = n * sxx - sx * sx
    val vary = n * syy - sy * sy
    val cov = n * sxy - sx * sy
    val slope = cov / varx
    aggd.select(grpCols.map(col) ++ Seq(
      col("n"),
      when(varx === 0, lit(null)).otherwise(round(slope, 6)).as("slope"),
      when(varx === 0, lit(null))
        .otherwise(round((sy - slope * sx) / n, 6)).as("intercept"),
      when(varx === 0 || vary === 0, lit(null))
        .otherwise(round(cov * cov / (varx * vary), 6)).as("r2")): _*)
  }

  /** Embedding drift monitor: per group (source, label, data drop …),
    * how far the group's embedding centroid sits from the corpus
    * centroid — the cheap early-warning signal that one source's
    * encoder changed, a pipeline stage corrupted vectors, or a drop's
    * distribution shifted before any downstream ANN quality regresses.
    *
    * Numerically pinned end to end: per-dim sums use decimal(30,15)
    * (associative — partial-merge order can't wiggle the mean, the q57
    * device); per-dim deviation is rounded to 6 dp and re-cast to
    * decimal(12,6), so the cross-dim sum of squares is EXACT decimal
    * arithmetic and the final L2 is reproducible on any engine.
    * max(|dev|) is order-safe by nature.
    *
    * Shape for 100 TB: one posexplode (linear, ×dim), one map-side-
    * combinable (group, dim) aggregate, a dim-keyed rollup to the
    * corpus centroid (dim rows — broadcast back), one group-keyed
    * reduce. No vector ever crosses a shuffle after the explode.
    *
    * Output: (grp, n_vecs, max_abs_dev, l2_drift), one row per group. */
  def embeddingDrift(df: DataFrame, grpCol: String, vecCol: String): DataFrame = {
    val el = df.filter(col(grpCol).isNotNull)
      .select(col(grpCol).as("grp"), posexplode(col(vecCol)).as(Seq("p", "x")))
      .select(col("grp"), col("p").cast("long").as("pos"),
        col("x").cast("double").as("x"))
    val perGrp = el.groupBy(col("grp"), col("pos"))
      .agg(count(lit(1)).as("n_g"),
        sum(col("x").cast("decimal(30,15)")).as("s_g"))
    val global = perGrp.groupBy(col("pos"))
      .agg(sum(col("n_g")).as("n"), sum(col("s_g")).as("s"))
    val dev = perGrp.join(broadcast(global), Seq("pos"))
      .select(col("grp"), col("n_g"),
        round(col("s_g").cast("double") / col("n_g")
          - col("s").cast("double") / col("n"), 6).as("dev"))
      .select(col("grp"), col("n_g"),
        col("dev").cast("decimal(12,6)").as("devd"))
    dev.groupBy(col("grp"))
      .agg((max(col("n_g"))).as("n_vecs"),
        round(max(abs(col("devd"))).cast("double"), 6).as("max_abs_dev"),
        round(sqrt(sum(col("devd") * col("devd")).cast("double")), 6)
          .as("l2_drift"))
      .select(col("grp"), col("n_vecs"), col("max_abs_dev"), col("l2_drift"))
  }

  /** Expected calibration error of a probabilistic classifier — per
    * confidence decile: how often the model's stated confidence matches
    * reality, plus the count-weighted ECE summary every model card
    * reports. A classifier that says "0.9" should be right 90% of the
    * time; the gap per bin (and its weighted sum) is THE deployment
    * gate for using scores as sampling weights or filter thresholds.
    *
    * Bins are fixed-width deciles of the score (floor(p·10), clamped to
    * [0,9]) — fixed edges, not quantiles, so the binning is
    * deterministic and comparable across runs.
    *
    * Determinism: per-bin confidence sums ride decimal(27,15); positive
    * and total counts are exact integers; the ECE terms are rounded to
    * 12 dp and decimal-summed.
    *
    * Scale: ONE corpus scan feeding one bin-keyed aggregation (≤10
    * groups, map-side combined). The per-bin aggregate is collected once
    * and N/ECE are derived driver-side from those ≤10 rows — so this is
    * EAGER (it runs the Spark job at call time) and the returned
    * DataFrame is a materialized local relation, not a lazy plan over
    * the input. Callers that need laziness should cache upstream.
    *
    * @param df rows with a score in [0,1] and a boolean outcome
    * @return one row per non-empty bin: (bin, n, avg_conf, frac_pos,
    *         gap, ece) — ece repeated on every row (the weighted total) */
  def calibrationError(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bin = least(greatest(floor(col(scoreCol) * 10), lit(0.0)), lit(9.0))
      .cast("long")
    val perBin = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .select(bin.as("bin"), col(scoreCol).as("__p"), col(labelCol).as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__p").cast("decimal(27,15)")).as("__sc"),
        sum(when(col("__y"), 1L).otherwise(0L)).as("__np"))
    val conf = col("__sc").cast("double") / col("n")
    val frac = col("__np").cast("double") / col("n")
    // ≤10 bins by construction: collect the per-bin aggregate ONCE and
    // derive N and the count-weighted ECE on the driver with the same
    // rounding devices (12-dp HALF_UP terms, exact decimal sum, 6-dp
    // total) — referencing the aggregate three times lazily would
    // re-execute the corpus scan beneath it three times.
    val rows = perBin.select(col("bin"), col("n"),
        col("__sc").cast("double").as("__scd"), col("__np"),
        abs(conf - frac).as("__gap"))
      .as[(Long, Long, Double, Long, Double)].collect().sortBy(_._1)
    val nTot = rows.map(_._2).sum
    def r6(x: Double, s: Int): Double =
      BigDecimal(x).setScale(s, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    val ece =
      if (rows.isEmpty) 0.0
      else r6(rows.map { case (_, n, _, _, gap) =>
        BigDecimal(n * gap / nTot)
          .setScale(12, scala.math.BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble, 6)
    rows.toSeq.map { case (b, n, sc, np, gap) =>
      (b, n, r6(sc / n, 6), r6(np.toDouble / n, 6), r6(gap, 6), ece)
    }.toDF("bin", "n", "avg_conf", "frac_pos", "gap", "ece")
  }

  /** Population stability index of a [0,1] score per group against the
    * whole population — the drift alarm a serving/curation pipeline
    * keeps on every model input: PSI = Σ_bins (p_i − q_i)·ln(p_i/q_i)
    * over fixed-width deciles, p the group's bin shares, q the global
    * ones. (Industry folklore: < 0.1 stable, > 0.25 investigate.)
    * Empty bins get a ½ pseudo-count on BOTH sides (the log needs
    * support everywhere; the smoothing is symmetric so a group that
    * matches the population still scores ≈ 0).
    *
    * Determinism: counts are exact integers; each bin's term is rounded
    * to 12 dp and decimal-summed.
    *
    * Scale: one (group, bin)-keyed count (map-side combined) — 10 rows
    * per group thereafter; the global bin table broadcasts. The dense
    * group × bin frame is built from the aggregates, never the corpus.
    *
    * @return (grpCol, n, psi) — 6-dp */
  def psi(df: DataFrame, grpCol: String, scoreCol: String): DataFrame = {
    val bin = least(greatest(floor(col(scoreCol) * 10), lit(0.0)), lit(9.0))
      .cast("long")
    val counts = df.filter(col(scoreCol).isNotNull && col(grpCol).isNotNull)
      .select(col(grpCol).as("__g"), bin.as("__b"))
      .groupBy(col("__g"), col("__b")).agg(count(lit(1)).as("__c"))
    val srcTot = counts.groupBy(col("__g")).agg(sum(col("__c")).as("__ns"))
    val glob = counts.groupBy(col("__b")).agg(sum(col("__c")).as("__gc"))
    val tot = glob.agg(sum(col("__gc")).as("__N"))
    // Densify over ALL TEN deciles, not just globally-present ones: a
    // globally-empty bin still contributes its symmetric ½ pseudo-count
    // term, so batch PSI shares the streaming windowedPsi's smoothing
    // convention (which inlines all 10 reference bins as literals) and
    // both denominators' +5.0 match the numerators' ten +0.5 terms.
    val globDense = df.sparkSession.range(0, 10).toDF("__b")
      .join(glob, Seq("__b"), "left")
      .select(col("__b"), coalesce(col("__gc"), lit(0L)).as("__gc"))
    val dense = srcTot
      .crossJoin(broadcast(globDense.crossJoin(tot)))
      .join(counts, Seq("__g", "__b"), "left")
      .select(col("__g"), col("__ns"),
        (coalesce(col("__c"), lit(0L)).cast("double") + lit(0.5)).as("__cp"),
        (col("__gc").cast("double") + lit(0.5)).as("__gp"),
        (col("__ns").cast("double") + lit(5.0)).as("__nsd"),
        (col("__N").cast("double") + lit(5.0)).as("__nd"))
    val p = col("__cp") / col("__nsd")
    val q = col("__gp") / col("__nd")
    dense
      .select(col("__g"), col("__ns"),
        round((p - q) * log(p / q), 12).cast("decimal(27,15)").as("__t"))
      .groupBy(col("__g"))
      .agg(max(col("__ns")).as("n"),
        round(sum(col("__t")).cast("double"), 6).as("psi"))
      .select(col("__g").as(grpCol), col("n"), col("psi"))
  }

  /** ROC AUC by the Mann–Whitney midrank statistic — the
    * threshold-free ranking quality of a binary scorer:
    * AUC = (Σ_pos midrank − P(P+1)/2) / (P·N), with average ranks over
    * score ties (the exact tie-corrected form, not a sampled
    * approximation).
    *
    * Determinism: the whole statistic is INTEGER arithmetic — per-score
    * counts, an exclusive prefix sum of them, and
    * 2·Σ_pos midrank = Σ_scores n_pos·(2·cnt_less + n_at + 1) — widened
    * to decimal(38,0) before the products so corpus-scale squares can't
    * overflow; the only float op is the final division.
    *
    * Scale: one score-keyed count aggregate, then everything operates on
    * the DISTINCT-score table — persisted, so the corpus scan under it
    * runs once across the prefix-sum device's three references
    * ([[Curation.exclusivePrefixSum]] — no single-partition window
    * anywhere). The one-row answer is evaluated eagerly and returned as
    * a literal frame so the cache releases before return.
    *
    * @param df rows with a numeric score and a boolean label
    * @return one row: (n_pos, n_neg, auc) — auc 6-dp, NULL when either
    *         class is empty */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // The prefix-sum device needs three references to the distinct-score
    // table (bucket boundaries, bucket totals, the window pass) — persist
    // it so the corpus-side plan under it executes ONCE, and evaluate the
    // one-row answer eagerly so the cache can be released before return.
    val byScore = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(col(scoreCol).as("__s"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("__np"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val c = Curation.exclusivePrefixSum(byScore, "__s", "__n", "__cl")
      val r = c.agg(
        sum(col("__np").cast("decimal(38,0)") *
          (col("__cl") * 2 + col("__n") + 1).cast("decimal(38,0)")).as("__s2"),
        sum(col("__np")).cast("decimal(38,0)").as("__p"),
        sum(col("__n")).cast("decimal(38,0)").as("__t"))
        .select(
          col("__p").cast("long").as("n_pos"),
          (col("__t") - col("__p")).cast("long").as("n_neg"),
          when(col("__p") > 0 && (col("__t") - col("__p")) > 0,
            round((col("__s2") - col("__p") * (col("__p") + 1)).cast("double") /
              (col("__p") * (col("__t") - col("__p")) * 2).cast("double"), 6))
            .as("auc"))
        .collect()(0)
      def optL(i: Int) = if (r.isNullAt(i)) None else Some(r.getLong(i))
      def optD(i: Int) = if (r.isNullAt(i)) None else Some(r.getDouble(i))
      Seq((optL(0), optL(1), optD(2))).toDF("n_pos", "n_neg", "auc")
    } finally byScore.unpersist(true)
  }

  /** Cohen's kappa — chance-corrected agreement between two raters over
    * the same items: κ = (p_o − p_e)/(1 − p_e), with p_o the observed
    * agreement rate and p_e = Σ_c p_A(c)·p_B(c) the agreement expected
    * from the raters' marginal label distributions alone. THE
    * annotation-QA number for a labeling campaign (human double-rating,
    * model-vs-human audits): raw agreement flatters raters who both
    * over-use a majority label, κ does not.
    *
    * Determinism: p_o and p_e are ratios of EXACT integers (n, the
    * agreement count, and Σ_c n_A(c)·n_B(c)) — the only float ops are
    * two final divisions on integers, bit-stable on any engine with no
    * decimal machinery needed.
    *
    * Scale: one full-scan count aggregate plus two label-keyed marginal
    * counts (map-side combined, label-cardinality-sized) full-outer
    * joined — nothing wider than the label vocabulary ever shuffles.
    *
    * @return one row: (n, agree, po, pe, kappa) — 6-dp; kappa NULL when
    *         p_e = 1 (both raters constant — undefined, not zero) */
  def cohensKappa(df: DataFrame, raterACol: String, raterBCol: String): DataFrame = {
    val pairs = df.filter(col(raterACol).isNotNull && col(raterBCol).isNotNull)
      .select(col(raterACol).as("__a"), col(raterBCol).as("__b"))
    val totals = pairs.agg(count(lit(1)).as("n"),
      sum(when(col("__a") === col("__b"), 1L).otherwise(0L)).as("agree"))
    val margA = pairs.groupBy(col("__a").as("__c")).agg(count(lit(1)).as("__na"))
    val margB = pairs.groupBy(col("__b").as("__c")).agg(count(lit(1)).as("__nb"))
    val cross = margA.join(margB, Seq("__c"), "full_outer")
      .agg(sum(coalesce(col("__na"), lit(0L)) * coalesce(col("__nb"), lit(0L)))
        .as("__s"))
    val po = col("agree").cast("double") / col("n")
    val pe = col("__s").cast("double") / (col("n") * col("n"))
    totals.crossJoin(cross)
      .select(col("n"), col("agree"),
        round(po, 6).as("po"), round(pe, 6).as("pe"),
        when(pe < 1.0, round((po - pe) / (lit(1.0) - pe), 6)).as("kappa"))
  }
}
