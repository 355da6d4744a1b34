package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale soak: run the heavy operators on a replicated sf0.1 corpus
  * (ids shifted per replica; purely in-memory union — no files written) to
  * confirm the plans scale linearly rather than quadratically. Not part of
  * the gate; results are recorded in BASELINE.md.
  *
  * `SOAK_FACTOR` (default 10) controls the replication. Factors above 10
  * run only the linear-time subset — pair-producing operators (LSH,
  * fuzzy pairs, CC collapse) have output sizes that grow with the clone
  * count, which measures output volume, not operator scaling. */
object ScaleSoak {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val factor = sys.env.getOrElse("SOAK_FACTOR", "10").toInt
    val full = factor <= 10

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"SOAK $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      r
    }

    // SOAK_PRODSHAPE=1: the two ops whose 100× full-suite readings exceed
    // the linear bound BECAUSE the gate corpus scales a parameter that is
    // fixed in production, re-measured at the SAME scale under the
    // documented production shape (SOAK_DIR = a materialized 100× corpus):
    //   - semDedup: the gate's cluster key (label, fixed cardinality) lets
    //     cluster sizes grow with the corpus; Σ|cluster|² is the op's
    //     documented cost. Production (SemDeDup paper) sizes clusters
    //     CONSTANT by scaling k with N — modeled here by sub-bucketing
    //     each label with a 7-bit SRP signature (the doc's "a k-means
    //     cell, a label, an LSH bucket" contract).
    //   - decontamTopMatches: the gate's eval set is a %97 sample that
    //     grows with the corpus; a real decontamination benchmark is
    //     FIXED-size. Eval here = replica 0's sample only.
    // SOAK_AUDIT=1: 100× receipts for the six exact-audit gates
    // (q98/q100/q171/q177/q178/q179), which the full 100× sweep excludes
    // because their GATE shapes sample PROPORTIONALLY (doc_id % k grows
    // with the corpus) and their exact arms are quadratic in the sample.
    // The documented production shape runs the audit on a FIXED-size
    // sample; here that is replica 0 of the clone-replicated corpus
    // (ids < 1,000,000 — exactly the 1× population), applied IN-PLAN over
    // the 100× parquet scan. Wall times must read at ~1× levels: the
    // audit cost rides the sample, not the corpus.
    if (sys.env.get("SOAK_AUDIT").contains("1")) {
      import graft.ops.{Dedup, Similarity}
      import graft.multimodal.Multimodal
      val dir = sys.env.getOrElse("SOAK_DIR", "target/sf0.1x100")
      val docs0 = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("doc_id") < 1000000L)
        .select(col("doc_id"), col("text"))
      val emb0 = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") < 1000000L)
      println(s"audit sample: docs=${docs0.count()} embs=${emb0.count()}")

      time("q98_jaccard_sample0")(
        Dedup.ngramJaccardIndexPairs(docs0, "doc_id", "text",
          k = 3, threshold = 0.5).count())

      time("q100_containment_sample0") {
        val trunc = docs0.filter(col("doc_id") % 11 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            array_join(slice(graft.ops.TextFunctions.tokens(col("text")), 1, 20),
              " ").as("text"))
        Dedup.ngramContainmentPairs(docs0.unionByName(trunc), "doc_id", "text",
          k = 3, threshold = 0.9).count()
      }

      time("q171_lsh_recall_sample0") {
        val dupes = docs0.filter(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
        val corpus = docs0.unionByName(dupes)
        val lsh = Dedup.minhashNearDupPairs(corpus, "doc_id", "text",
          k = 3, bands = 4, rowsPerBand = 3, threshold = 0.5)
          .select(col("doc_a"), col("doc_b"))
        val exact = Dedup.ngramJaccardIndexPairs(corpus, "doc_id", "text",
          k = 3, threshold = 0.5).select(col("doc_a"), col("doc_b"))
        lsh.join(exact, Seq("doc_a", "doc_b"), "left_semi").count()
      }

      time("q177_simhash_recall_sample0") {
        val d3 = docs0.filter(col("doc_id") % 3 === 0)
        val planted = d3.filter(col("doc_id") % 21 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(col("text"), lit(" zqxduplicate")).as("text"))
        val corpus = d3.unionByName(planted)
        val band = Dedup.simhashNearDupPairs(corpus, "doc_id", "text",
          maxDist = 3).select(col("doc_a"), col("doc_b"))
        val h = Dedup.simhashTable(corpus, "doc_id", "text")
        val exact = h.select(col("doc_id").as("doc_a"), col("simhash").as("__ha"))
          .join(broadcast(h.select(col("doc_id").as("doc_b"),
            col("simhash").as("__hb"))), col("doc_a") < col("doc_b"))
          .filter(call_function("bit_count",
            col("__ha").bitwiseXOR(col("__hb"))) <= 3)
        band.join(exact, Seq("doc_a", "doc_b"), "left_semi").count()
      }

      time("q178_srp_recall_sample0") {
        // the gate is already fixed-cap (vec_id < 200 = replica 0 only);
        // this runs the SAME shape with the cap applied over the 100× scan
        val e200 = emb0.filter(col("vec_id") < 200)
          .select(col("vec_id"), col("embedding"))
        val planted = e200.filter(col("vec_id") % 5 === 0)
          .select((col("vec_id") + 500000L).as("vec_id"),
            transform(col("embedding"), (x, i) =>
              when(i === 0, (x.cast("double") + lit(0.05)).cast("float"))
                .otherwise(x)).as("embedding"))
        val corpus = e200.unionByName(planted).localCheckpoint()
        val band = Similarity.srpBandedNearDupPairs(corpus, "vec_id",
          "embedding", dims = 64, bands = 4, rowsPerBand = 4, threshold = 0.9)
          .select(col("id_a"), col("id_b"))
        val exact = Similarity.cosineNearDupPairs(corpus, "vec_id",
          "embedding", threshold = 0.9).select(col("id_a"), col("id_b"))
        band.join(exact, Seq("id_a", "id_b"), "left_semi").count()
      }

      time("q179_phash_recall_sample0") {
        val base = Multimodal.attachMedia(
          docs0.filter(col("doc_id") % 5 === 0).select(col("doc_id")), "doc_id")
        val clones = base.filter(col("doc_id") % 10 === 0)
          .withColumn("doc_id", col("doc_id") + 1000000L)
        val corpus = base.unionByName(clones)
        val band = Multimodal.phashNearDupPairs(corpus, "doc_id", "media",
          maxHamming = 2).select(col("id_a"), col("id_b"))
        val h = Multimodal.phashTable(corpus, "doc_id", "media")
        val exact = h.select(col("__id").as("id_a"), col("dhash").as("__ha"))
          .join(broadcast(h.select(col("__id").as("id_b"),
            col("dhash").as("__hb"))), col("id_a") < col("id_b"))
          .filter(call_function("bit_count",
            col("__ha").bitwiseXOR(col("__hb"))) <= 2)
        band.join(exact, Seq("id_a", "id_b"), "left_semi").count()
      }
      spark.stop()
      return
    }

    if (sys.env.get("SOAK_PRODSHAPE").contains("1")) {
      val dir = sys.env.getOrElse("SOAK_DIR", "target/sf0.1x100")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      println(s"prodshape embeddings rows=${emb.count()}")
      val srp = graft.ops.Similarity.srpPlaneWeights(7, 64)
      val bucketed = emb.withColumn("cell",
        concat_ws(":", col("label").cast("string"),
          array_join(graft.ops.Similarity
            .srpSignatureBitsComposable(col("embedding"), srp), "")))
      time("semdedup_bounded_cells")(
        graft.ops.Similarity.semDedup(bucketed, "vec_id", "embedding",
          "cell", threshold = 0.35).count())
      val eval = emb.filter(col("vec_id") % 97 === 0 &&
          col("vec_id") < 1000000L)
        .select(col("vec_id").as("eval_id"), col("embedding").as("eval_vec"))
      time("decontam_fixed_eval")(
        graft.ops.Similarity.decontamTopMatches(
          emb.filter(col("vec_id") % 97 =!= 0), "vec_id", "embedding",
          eval, "eval_id", "eval_vec", k = 20).count())
      spark.stop(); sys.exit(0)
    }

    // SOAK_REALISTIC=1: the pair-producing operators (LSH, fuzzy pairs,
    // CC collapse) on a corpus with SPARSE duplicates. Clone replication
    // is wrong for these — every clone group is a near-dup clique, so
    // output grows quadratically with the factor and measures result
    // volume, not operator scaling. Here each replica gets its words
    // reshuffled (same vocabulary, disjoint k-shingles → NOT a near-dup)
    // except a ~2% planted slot rate that keeps the text verbatim — the
    // realistic shape: half a million distinct documents hiding a few
    // thousand true duplicate pairs.
    if (sys.env.get("SOAK_REALISTIC").contains("1")) {
      val base = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("text"))
      val reps = (0 until factor).map(i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _)
      val corpus = reps.withColumn("text",
        when(pmod(hash(col("doc_id"), lit("dupslot")), lit(50)) === 0, col("text"))
          .otherwise(array_join(shuffle(split(col("text"), " ")), " ")))
        .localCheckpoint() // freeze the nondeterministic shuffle() once
      println(s"realistic corpus rows=${corpus.count()}")
      time("lsh_sparse_dups")(
        graft.ops.Dedup.minhashNearDupPairs(corpus, "doc_id", "text",
          skewSafe = true).count())
      time("cc_collapse_sparse")(
        graft.ops.DedupClustering.collapseNearDups(corpus, "doc_id", "text",
          threshold = 0.5).count())
      // fuzzy linkage: every replica's name is salted out of edit range
      // except a ~3% planted typo rate (last char swapped — stays in its
      // sorted-neighborhood block, lands within maxDist)
      val p1 = spark.read.parquet(s"$d/part.parquet")
        .select(col("p_partkey").as("rec_id"), col("p_name").as("name"))
      val partsN = (0 until factor).map(i =>
        p1.withColumn("rec_id", col("rec_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _)
        .withColumn("name",
          when(pmod(hash(col("rec_id"), lit("typo")), lit(33)) === 0,
            concat(substring(col("name"), 1, 20), lit("x")))
          .otherwise(concat(col("name"), lit("_"),
            substring(md5(col("rec_id").cast("string").cast("binary")), 1, 8))))
      println(s"realistic names rows=${partsN.count()}")
      time("fuzzy_pairs_sparse")(
        graft.ops.Resolution.blockedFuzzyPairs(partsN, "rec_id", "name",
          substring(col("name"), 1, 4), window = 7, maxDist = 2).count())
      spark.stop()
      return
    }

    // SOAK_SRP=1: the banded SRP-LSH embedding near-dup path (q127's op)
    // at sparse-dup scale — the embedding analog of SOAK_REALISTIC. Each
    // replica's vector is multiplied elementwise by a per-replica ±1 sign
    // pattern: a sign-flipped copy has expected cosine ~0 against its base
    // and against every other replica's flip (replicas are NOT near-dups),
    // while elementwise ±1 flips preserve inner products WITHIN a replica,
    // so the corpus keeps the base's realistic cluster structure. A ~2%
    // planted slot rate keeps the vector verbatim — half a million
    // distinct embeddings hiding a few thousand true cos=1 pairs.
    if (sys.env.get("SOAK_SRP").contains("1")) {
      val base = spark.read.parquet(s"$d/embeddings.parquet")
      val rnd = new scala.util.Random(7)
      val patterns: Seq[Seq[Double]] =
        Seq.fill(factor)(Seq.fill(64)(if (rnd.nextBoolean()) 1.0 else -1.0))
      val pat = typedLit(patterns)
      val corpus = base
        .crossJoin(spark.range(factor).select(col("id").as("__rep")))
        .select((col("vec_id") + col("__rep") * 1000000L).as("vec_id"),
          col("embedding"), col("__rep"))
        .withColumn("embedding",
          when(pmod(hash(col("vec_id"), lit("dupslot")), lit(50)) === 0,
            col("embedding"))
          .otherwise(zip_with(col("embedding"),
              element_at(pat, col("__rep").cast("int") + 1),
              (x, s) => x.cast("double") * s)
            .cast("array<float>")))
        .drop("__rep")
        .localCheckpoint()
      println(s"srp corpus rows=${corpus.count()}")
      // Band width must grow with corpus size: the gate's 4-bit bands give
      // 16 buckets per band — fine at 2k rows, degenerate at 500k (every
      // bucket would blow the maxBucket cap and be dropped). Sizing rule
      // r ≈ log2(N / targetBucketSize): 8 bands × 16 bits keeps buckets
      // ~8 rows at 500k while exact duplicates (cos=1 → identical
      // signature) still collide on every band.
      // SOAK_SRP_THRESH: θ=0.30 (the gate's) sits only ~2.4σ above the
      // sign-flip noise floor (cross-replica cosine std ≈ 1/√64 = 0.125),
      // so verified-pair volume grows with candidate mass; θ=0.50 (4σ)
      // is the sparse regime where output is the planted dups.
      val thresh = sys.env.getOrElse("SOAK_SRP_THRESH", "0.30").toDouble
      time(s"srp_neardup_${factor}x_t$thresh")(
        graft.ops.Similarity.srpBandedNearDupPairs(corpus, "vec_id",
          "embedding", dims = 64, bands = 8, rowsPerBand = 16,
          threshold = thresh).count())
      spark.stop()
      return
    }

    // SOAK_MIX=1: the temperature mixture sampler on the clone-replicated
    // corpus (clone replication preserves the source distribution, which
    // is exactly what the sampler keys on). Budget = 10% of the corpus
    // tokens; the op is two bucketed prefix-sum shuffles + a broadcast of
    // one row per source, so wall time should track the factor linearly.
    if (sys.env.get("SOAK_MIX").contains("1")) {
      val base = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("source"), col("n_chars"))
      val corpus = (0 until factor).map(i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _)
      val total = corpus.agg(sum(col("n_chars"))).collect()(0).getLong(0)
      println(s"mixture corpus rows=${corpus.count()} tokens=$total")
      time(s"mixture_sample_${factor}x")(
        graft.ops.Curation.temperatureMixtureSample(corpus, "doc_id",
          "source", "n_chars", budget = total / 10, temperature = 0.7)
          .agg(count(lit(1)), sum(col("n_chars"))).collect()(0).toString)
      spark.stop()
      return
    }

    // SOAK_RETRIEVAL=1: the retrieval capstones (q114 diversified search,
    // q102 RRF) at 100× corpus scale. The claim to receipt: the BM25 →
    // top-50 stage is the only part that sees the corpus (one exploded
    // token shuffle, linear in rows), while the diversify stage — 3-gram
    // Jaccard pairs + suppression anti-join — is capped at shortlist²
    // (50²) AT ANY CORPUS SIZE, so its wall time must stay flat between
    // 10× and 100×. Stages are timed separately so the receipt shows
    // which one moved. RRF is one union + one aggregate over the
    // concatenated rank lists; fusing two FULL-corpus rankings (500k rows
    // each at 100×) bounds its scaling linearly in list volume.
    if (sys.env.get("SOAK_RETRIEVAL").contains("1")) {
      val base = spark.read.parquet(s"$d/documents.parquet")
        .select(col("doc_id"), col("text"), col("n_chars"))
      val corpus = (0 until factor).map(i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _)
      println(s"retrieval corpus rows=${corpus.count()}")
      // stage 1 (linear in corpus rows): BM25 scoring, the top-50
      // truncation, and the one corpus scan that fetches the survivors'
      // text — everything that ever touches all N rows
      val (ranked, shortlist) = time(s"bm25_top50_fetch_${factor}x") {
        val r = graft.ops.TextRanking.rankTopN(
          graft.ops.TextRanking.bm25(corpus, "doc_id", "text",
              Seq("dup", "vector", "spark"))
            .select(col("doc_id").as("id"), round(col("score"), 6).as("score")),
          "id", "score", 50).localCheckpoint()
        val sl = r.join(corpus.select(col("doc_id").as("id"), col("text")),
          Seq("id")).localCheckpoint()
        (r, sl)
      }
      // stage 2 (shortlist²-capped): pairs + suppression + anti-join
      // never see the corpus — wall time must be flat from 10× to 100×
      time(s"diversify_shortlist50_${factor}x") {
        val pairs = graft.ops.Dedup.ngramJaccardPairs(
          shortlist.select(col("id"), col("text")), "id", "text",
          k = 3, threshold = 0.5)
        val suppressed = pairs
          .join(ranked.select(col("id").as("doc_a"), col("rank").as("__ra")),
            Seq("doc_a"))
          .join(ranked.select(col("id").as("doc_b"), col("rank").as("__rb")),
            Seq("doc_b"))
          .select(when(col("__ra") < col("__rb"), col("doc_b"))
            .otherwise(col("doc_a")).as("id")).distinct()
        ranked.join(suppressed, Seq("id"), "left_anti").count()
      }
      // two deterministic full-corpus rankings (keyword-ish vs length-ish)
      // — RRF's cost is the union + aggregate over every ranked row, the
      // worst case a hybrid-retrieval caller can hand it
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("s").desc, col("doc_id"))
      def fullRanking(s: org.apache.spark.sql.Column) = corpus
        .select(col("doc_id"), s.as("s"))
        .repartition(1) // rank assignment only; timed op is the fusion
        .withColumn("rank", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("rank"))
      val rkA = fullRanking(hash(col("text")).cast("long")).localCheckpoint()
      val rkB = fullRanking(col("n_chars")).localCheckpoint()
      time(s"rrf_2fulllists_${factor}x")(
        graft.ops.TextRanking.reciprocalRankFusion(
          Seq(rkA, rkB), "doc_id", "rank")
          .agg(count(lit(1)), round(sum(col("rrf")), 4)).collect()(0).toString)
      spark.stop()
      return
    }

    // SOAK_GRAPH=1: the graph family at ~100× the gate's graph size on a
    // hub-planted generator. 2M vertices with ~6 seeded pseudo-random
    // edges each (12M directed rows) plus 5 planted celebrity hubs of
    // ~20k neighbors — the degree profile that kills the id-oriented
    // triangle join (a 20k-degree hub = 2×10⁸ wedge pairs under id
    // orientation) and that the degree-ordered default must shrug off.
    // PageRank and label propagation run on the same graph so the
    // iterative-loop plans (checkpoint-cut lineage, aggregate arg-max)
    // get their scaling receipt on record too.
    if (sys.env.get("SOAK_GRAPH").contains("1")) {
      val n = 2000000L
      val rand = spark.range(0, n * 6).select(
        pmod(hash(col("id"), lit("gsrc")), lit(n)).as("src"),
        pmod(hash(col("id"), lit("gdst")), lit(n)).as("dst"))
        .filter(col("src") =!= col("dst"))
      // NOTE: ids from range(0, n, 20) are all ≡ 0 (mod 5), so the hub
      // must be chosen from id/20 — pmod(id, 5) would plant a single
      // 100k-degree hub instead of five 20k ones
      val hubs = spark.range(0, n, 20).select(
        pmod(floor(col("id") / 20), lit(5)).as("src"), col("id").as("dst"))
        .filter(col("src") =!= col("dst"))
      val edges = rand.unionByName(hubs).localCheckpoint()
      println(s"graph edges=${edges.count()} (5 hubs of ~${n / 20 / 5} neighbors)")
      time("pagerank_3it_12M_edges")(
        graft.ops.GraphOps.pageRank(edges, "src", "dst", iters = 3)
          .agg(round(sum(col("rank")), 4)).collect()(0).getDouble(0))
      val seeds = spark.range(0, n, 1000).select(col("id").as("vertex"),
        pmod(col("id"), lit(100)).as("label"))
      time("labelprop_2it_12M_edges")(
        graft.ops.GraphOps.labelPropagation(edges, "src", "dst",
          seeds, "vertex", "label").count())
      time("triangles_degord_12M_hubbed")(
        graft.ops.Resolution.triangleStats(edges, "src", "dst").count())
      spark.stop()
      return
    }

    val docs1 = spark.read.parquet(s"$d/documents.parquet")
    val docs10 = (0 until factor).map(i =>
      docs1.withColumn("doc_id", col("doc_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
    println(s"docs${factor} rows=${docs10.count()}")

    if (full) time("minhash_lsh_50k_docs")(
      graft.ops.Dedup.minhashNearDupPairs(docs10, "doc_id", "text").count())
    time("simhash_50k_docs")(
      graft.ops.Dedup.simhashTable(docs10, "doc_id", "text").count())
    time("exact_dedup_50k_docs")(
      graft.ops.Dedup.exactDedup(docs10, "doc_id", "text").count())

    val emb1 = spark.read.parquet(s"$d/embeddings.parquet")
    val emb10 = (0 until 10).map(i =>
      emb1.withColumn("vec_id", col("vec_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
    val queries = emb1.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    time("brute_cosine_20q_x_20k")(
      graft.ops.Similarity.bruteForceTopK(emb10, "vec_id", "embedding",
        queries, "qid", "qvec", 10).count())

    // trigram model + 5-way keyed scoring joins: clone replication grows
    // the scored stream linearly while the model stays vocabulary-sized —
    // the shape a repeated-text web corpus has at 100 TB
    time("stupid_backoff_50k_docs")(
      graft.ops.LanguageModel.stupidBackoffScores(docs10,
        docs10.filter(col("doc_id") % 2 === 0), "doc_id", "text")
        .agg(count(lit(1))).collect()(0).getLong(0))
    time("ccnet_buckets_50k_docs")(
      graft.ops.LanguageModel.ccnetQualityBuckets(docs10, docs10,
        "doc_id", "text")
        .groupBy(col("bucket")).count().count())
    time("source_cap_50k_docs")(
      graft.ops.Curation.sourceCapInterleave(
        docs10.select(col("doc_id"), col("source")),
        "doc_id", "source", k = 100, seed = 7L).count())
    time("int8_audit_vecs")(
      graft.ops.ProductQuantization.int8QuantizationAudit(
        emb10, "vec_id", "embedding").count())

    // clone replication makes every doc a duplicated span source: the
    // census sees 10 occurrences of every gram, so this measures the
    // worst-case flag/removal volume, not just the census
    if (full) time("substr_dedup_50k_docs")(
      graft.ops.Dedup.exactSubstringDedup(docs10, "doc_id", "text", k = 8)
        .agg(sum(col("n_removed"))).collect()(0).getLong(0))
    time("cdc_chunks_50k_docs")(
      graft.ops.Chunking.contentDefinedChunks(docs10, "doc_id", "text",
        k = 4, divisor = 8).count())
    time("wordpiece_50k_docs") {
      val vocab = graft.ops.LanguageModel.wordpieceVocab(
        docs10, "doc_id", "text", wholeWordLen = 4, minSubCount = 500)
      graft.ops.LanguageModel.wordpieceSegment(
        docs10, "doc_id", "text", vocab, "piece").count()
    }
    time("maxsim_20q_x_20k")(
      graft.ops.Similarity.maxSimTopK(emb10, "vec_id", "embedding",
        queries, "qid", "qvec", dim = 64, m = 4, k = 10).count())
    time("embedding_drift_20k_vecs")(
      graft.ops.Profiling.embeddingDrift(emb10, "label", "embedding").count())
    time("source_kl_50k_docs")(
      graft.ops.LanguageModel.sourceKlDivergence(docs10, "doc_id", "text",
        "source").count())
    time("zipf_fit_50k_docs") {
      val counts = docs10
        .select(explode(graft.ops.TextFunctions.tokens(col("text"))).as("__t"))
        .groupBy(col("__t")).agg(count(lit(1)).as("__c"))
        .select(col("__t"), col("__c"), (-col("__c")).as("__nc"),
          lit(1L).as("__one"))
      val ranked = graft.ops.Curation.exclusivePrefixSum(
        counts, "__nc", "__t", "__one", "__rb")
      graft.ops.Profiling.linearFit(
        ranked.select(log((col("__rb") + 1).cast("double")).as("x"),
          log(col("__c").cast("double")).as("y")),
        Seq.empty, "x", "y").count()
    }
    time("hilbert_cluster_50k_docs")(
      graft.ops.ZOrder.clusterByHilbert(
        docs10.select(pmod(col("doc_id"), lit(65536L)).as("x"),
          pmod(col("n_chars"), lit(65536L)).as("y")),
        "x", "y", bits = 16, numFiles = 32).count())
    // incremental rollup over a 6M-row lineitem CDC (10x replicated keys:
    // same suppliers, 10x deeper deltas — the maintained state stays
    // supplier-sized while the delta stream grows linearly)
    val liCdc = (0 until 10).map(_ => spark.read
        .parquet(s"$d/lineitem.parquet")
        .select(col("l_suppkey"), col("l_extendedprice")))
      .reduce(_ unionByName _)
    time("incremental_rollup_6M_cdc") {
      val base = liCdc.filter(col("l_suppkey") % 2 === 0)
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_extendedprice").cast("decimal(27,15)")).as("total"))
      val delta = liCdc
        .select(when(col("l_suppkey") % 3 === 0, lit("D")).otherwise(lit("I"))
          .as("op"), col("l_suppkey"), col("l_extendedprice"))
      graft.ops.Mutations.incrementalRollup(base, delta,
        "l_suppkey", "op", "l_extendedprice").count()
    }

    time("prefix_sum_50k_docs")(
      graft.ops.Curation.exclusivePrefixSum(
        docs10.select(col("doc_id"), col("n_chars")), "doc_id", "n_chars", "ps")
        .agg(max(col("ps"))).collect()(0).getLong(0))
    time("epoch_shard_50k_docs")(
      graft.ops.Curation.epochShardAssign(
        docs10.select(col("doc_id")), "doc_id", seed = 7L, numShards = 1024)
        .agg(countDistinct(col("shard"))).collect()(0).getLong(0))
    time("pack_sequences_50k_docs")(
      graft.ops.Curation.packSequences(
        docs10.select(col("doc_id"),
          graft.ops.TextFunctions.tokenCount(col("text")).as("tok")),
        "doc_id", "tok", 2048L)
        .agg(countDistinct(col("bin"))).collect()(0).getLong(0))
    if (full) time("decontaminate_50k_docs")(
      graft.ops.Curation.contaminatedIds(
        docs10.filter(col("doc_id") >= 10), docs10.filter(col("doc_id") < 10),
        "doc_id", "text", k = 5).count())
    time("zorder_cluster_50k_docs")(
      graft.ops.ZOrder.clusterByZ(
        docs10.select(pmod(col("doc_id"), lit(65536L)).as("x"),
          pmod(col("n_chars"), lit(65536L)).as("y")),
        "x", "y", bits = 16, numFiles = 32).count())

    time("chunk_50k_docs")(
      graft.ops.Chunking.chunk(docs10, "doc_id", "text", 32, 24).count())
    if (full) time("segment_dedup_50k_docs")(
      graft.ops.Chunking.segmentDedup(docs10, "doc_id", "text", 8)
        .filter(col("kept")).count())
    if (full) time("collapse_near_dups_50k")(
      graft.ops.DedupClustering.collapseNearDups(docs10, "doc_id", "text",
        threshold = 0.5).count())
    // 10x replication multiplies EDGES (not just vertices): every doc's
    // replicas form near-dup groups, so this soaks the CC path too
    if (full) time("semdedup_20k_vecs")(
      graft.ops.Similarity.semDedup(emb10, "vec_id", "embedding", "label",
        threshold = 0.35).count())
    val pr1 = spark.read.parquet(s"$d/orders.parquet")
      .join(spark.read.parquet(s"$d/lineitem.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("src"),
        concat(lit("s"), col("l_suppkey")).as("dst")).distinct()
    val prEdges = pr1.unionByName(
      pr1.select(col("dst").as("src"), col("src").as("dst")))
    time("pagerank_3it_600k_edges")(
      graft.ops.GraphOps.pageRank(prEdges, "src", "dst", iters = 3)
        .agg(round(sum(col("rank")), 6)).collect()(0).getDouble(0))

    time("bm25_50k_docs")(
      graft.ops.TextRanking.bm25(docs10, "doc_id", "text",
        Seq("dup", "vector", "spark")).count())
    time("negative_sample_20q_x_50k")(
      graft.ops.TextRanking.negativeSample(docs10, "doc_id",
        docs1.filter(col("doc_id") < 20).select(col("doc_id").as("qid")),
        "qid", k = 10).count())
    time("weighted_topk_50k_docs")(
      graft.ops.Curation.weightedSampleTopK(
        docs10.select(col("doc_id"), col("lang"), col("n_chars")),
        "doc_id", "lang", col("n_chars"), k = 100).count())
    time("bucket_checksums_50k_docs")(
      graft.ops.Maintenance.bucketChecksums(
        docs10.select(col("doc_id"), col("text")), "doc_id", Seq("text"),
        1024).count())
    // fuzzy pairs at 10×: replicas share names → every block fills its
    // window; candidates stay O(n·window) by construction
    val parts10 = {
      val p1 = spark.read.parquet(s"$d/part.parquet")
        .select(col("p_partkey").as("rec_id"), col("p_name").as("name"))
      (0 until 10).map(i =>
        p1.withColumn("rec_id", col("rec_id") + lit(i * 1000000L)))
        .reduce(_ unionByName _)
    }
    if (full) time("fuzzy_pairs_200k_records")(
      graft.ops.Resolution.blockedFuzzyPairs(parts10, "rec_id", "name",
        substring(col("name"), 1, 4), window = 7, maxDist = 2).count())
    if (full) time("ivfpq_5q_x_20k_vecs")({
      val cells = graft.ops.Similarity.trainCentroids(
        emb10, "vec_id", "embedding", kCells = 10, iters = 1)
      val codebook = graft.ops.ProductQuantization.seedCodebook(
        emb10, "vec_id", "embedding", m = 8, k = 16)
      graft.ops.ProductQuantization.searchIvfPq(
        emb10, "vec_id", "embedding", queries.filter(col("qid") < 5),
        "qid", "qvec", cells, "cid", "cvec", codebook,
        m = 8, k = 10, nprobe = 4, rerank = 100).count()
    })

    val ev1 = graft.queries.Tables.events(spark, d)
    val ev10 = (0 until 10).map(i =>
      ev1.withColumn("event_id", col("event_id") + lit(i * 10000000L))
        .withColumn("user_id", col("user_id") + lit(i * 1000000L)))
      .reduce(_ unionByName _)
    time("sessionize_1M_events")(
      graft.streaming.EventStreams.sessionizeBatch(ev10).count())
    // replicas shift user_id, so per-conversion touch fan-out stays flat
    // while conversions grow linearly — the attribution scale contract
    time("attribution_1M_events")(
      graft.streaming.EventStreams.linearAttribution(ev10, "purchase",
        Seq("view", "click"), windowHours = 24).count())
    time("hourly_anomaly_1M_events")(
      graft.ops.Profiling.hourlyAnomaly(ev10, "event_type", "ts").count())
    time("session_paths_1M_events")(
      graft.streaming.EventStreams.sessionPaths(ev10, gapSec = 1800,
        maxLen = 8, k = 20).count())

    // per-supplier groups grow 10× deep (same keys, cloned rows) — the
    // exact-percentile memory bound robustOutliers documents
    val li10 = (0 until 10).map(_ => spark.read
        .parquet(s"$d/lineitem.parquet")
        .select(col("l_suppkey"), col("l_extendedprice")))
      .reduce(_ unionByName _)
    time("robust_outliers_6M_rows")(
      graft.ops.Profiling.robustOutliers(li10, "l_suppkey",
        "l_extendedprice").count())

    // ---- round-10 additions ----
    time("sequence_match_1M_events")(
      graft.ops.SequencePatterns.threeStageWithVeto(ev10, "user_id",
        "event_id", "ts", "event_type", "view", "click", "purchase",
        "error").count())

    // docs10/emb10: the id-shifted replicas defined for the text soaks
    time("mlm_plan_50k_docs")(
      graft.ops.Curation.mlmMaskingPlan(docs10, "doc_id", "text").count())
    time("quality_clf_50k_docs")(
      graft.ops.Curation.hashedLinearScore(docs10, "doc_id", "text").count())
    time("log_odds_50k_docs")(
      graft.ops.LanguageModel.logOddsTerms(docs10, "doc_id", "text",
        "source", target = "src0").count())
    time("distinct_n_50k_docs")(
      graft.ops.LanguageModel.distinctNgramRatios(docs10, "doc_id", "text",
        "source").count())
    // BPE train: the corpus is tokenized once into the persisted
    // distinct-word table; 8 merge rounds each cost one vocab-sized pass
    time("bpe_train_50k_docs")(
      graft.ops.LanguageModel.bpeTrain(docs10, "doc_id", "text",
        nMerges = 8).count())
    // Bradley-Terry on ~50k chain comparisons (one per adjacent doc pair
    // within %50 cohorts), 3 MM rounds of item-keyed joins
    val cmp10 = {
      import org.apache.spark.sql.expressions.Window
      val scored = docs10.select(col("doc_id"),
        graft.ops.TextFunctions.qualityScoreRaw(col("text")).as("q"),
        (col("doc_id") % 50).as("grp"))
      val w = Window.partitionBy(col("grp")).orderBy(col("doc_id"))
      val lagged = scored
        .withColumn("pid", lag(col("doc_id"), 1).over(w))
        .withColumn("pq", lag(col("q"), 1).over(w))
        .filter(col("pid").isNotNull)
      val iWins = col("q") > col("pq") ||
        (col("q") === col("pq") && col("doc_id") < col("pid"))
      lagged.select(when(iWins, col("doc_id")).otherwise(col("pid")).as("w"),
        when(iWins, col("pid")).otherwise(col("doc_id")).as("l"))
    }
    time("bradley_terry_50k_games")(
      graft.ops.Preference.bradleyTerry(cmp10, "w", "l", iters = 3).count())
    // leakage-safe split is pair-producing (LSH + CC) — full factor only
    if (full) time("leakage_split_50k_docs")(
      graft.ops.DedupClustering.splitByComponents(
        docs10.select(col("doc_id")),
        graft.ops.Dedup.minhashNearDupPairs(docs10, "doc_id", "text",
          k = 3, bands = 4, rowsPerBand = 3, threshold = 0.5)
          .select(col("doc_a"), col("doc_b")),
        "doc_a", "doc_b", "doc_id").count())
    // BPE apply: distinct-word census + 8 chained replaces, zero joins
    val merges10 = graft.ops.LanguageModel.bpeTrain(docs10, "doc_id",
      "text", nMerges = 8)
    time("bpe_segment_50k_docs")(
      graft.ops.LanguageModel.bpeSegment(docs10, "doc_id", "text",
        merges10).count())
    time("json_profile_1M_events")(
      graft.ops.Profiling.jsonKeyProfile(ev10, "props").count())
    time("geometric_median_50k_vecs")(
      graft.ops.Similarity.geometricMedian(emb10, "label", "embedding",
        iters = 2).count())
    // embedding decontam: replicated corpus vs a broadcast ~1% eval set
    time("embed_decontam_50k_vecs")(
      graft.ops.Similarity.decontamTopMatches(
        emb10.filter(col("vec_id") % 97 =!= 0), "vec_id", "embedding",
        emb10.filter(col("vec_id") % 97 === 0)
          .select(col("vec_id").as("eval_id"), col("embedding").as("eval_vec")),
        "eval_id", "eval_vec", k = 20).count())

    spark.stop()
  }
}
