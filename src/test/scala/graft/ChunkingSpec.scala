package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops.{Chunking, Similarity}

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("chunk: short doc emits exactly one truncated chunk") {
    val got = Chunking.chunk(docs(1L -> "a b c"), "doc_id", "text", 8, 4)
      .collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("chunk_id") == 0L)
    assert(got.head.getAs[Long]("n_toks") == 3L)
    assert(got.head.getAs[String]("chunk_text") == "a b c")
  }

  test("chunk: strided windows overlap and cover the tail exactly once") {
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val got = Chunking.chunk(docs(1L -> text), "doc_id", "text", 4, 3)
      .orderBy("chunk_id").collect()
    // n=10, size=4, stride=3 → starts 0,3,6 then 9? ceil((10-4)/3)=2 → 3 chunks
    assert(got.map(_.getAs[String]("chunk_text")).toSeq == Seq(
      "t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10"))
    // every token appears in some window; tail token in the last
    assert(got.last.getAs[Long]("n_toks") == 4L)
  }

  test("chunk: exact multiple of stride lands the final window on the end") {
    val text = (1 to 12).map(i => s"t$i").mkString(" ")
    val got = Chunking.chunk(docs(1L -> text), "doc_id", "text", 4, 4)
      .orderBy("chunk_id").collect()
    assert(got.length == 3)
    assert(got.forall(_.getAs[Long]("n_toks") == 4L))
  }

  test("segmentDedup: repeated segment keeps only the first (doc, pos)") {
    val d = docs(
      1L -> "x x x x y y y y",   // segs: [x×4], [y×4]
      2L -> "y y y y z z z z",   // [y×4] loses to doc 1, [z×4] wins
      3L -> "x x x x")           // [x×4] loses to doc 1
    val got = Chunking.segmentDedup(d, "doc_id", "text", 4)
      .orderBy("doc_id", "seg_id").collect()
    val kept = got.filter(_.getAs[Boolean]("kept"))
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seg_id"))).toSet
    assert(kept == Set((1L, 0L), (1L, 1L), (2L, 1L)))
    assert(got.length == 5)
  }

  test("segmentDedup: duplicate segments within one doc keep only the first") {
    val d = docs(7L -> "a a a a b b b b a a a a")
    val kept = Chunking.segmentDedup(d, "doc_id", "text", 4)
      .filter(col("kept")).select("seg_id").as[Long].collect().toSet
    assert(kept == Set(0L, 1L))
  }

  test("semDedup: transitive chain collapses to one survivor per component") {
    // cluster 0: v1≈v2≈v3 (chain), v4 far; cluster 1: untouched
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f, 0.0f), 0),
      (3L, Array(0.8f, 0.2f, 0.0f), 0),
      (4L, Array(0.0f, 0.0f, 1.0f), 0),
      (5L, Array(0.5f, 0.5f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val kept = Similarity.semDedup(emb, "vec_id", "embedding", "label", 0.97)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 4L, 5L))
  }

  test("semDedup: clusters bound the search — identical vectors in different clusters both survive") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(1.0f, 0.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val kept = Similarity.semDedup(emb, "vec_id", "embedding", "label", 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L))
  }

  test("semDedup production cells (q184): refining the cluster key never removes survivors") {
    // cell equality implies label equality, so label×SRP sub-bucketing only
    // REMOVES pair edges; components split, every split keeps its own min id,
    // and the original component's min stays a min — survivors by cell are a
    // superset of survivors by label. This is the safety direction of the
    // production shape: bounding cells (the 100 TB requirement) can only
    // under-merge, never delete extra rows.
    val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val srp = Similarity.srpPlaneWeights(planes = 7, dims = 64)
    val bucketed = emb.withColumn("cell",
      concat_ws(":", col("label").cast("string"),
        array_join(graft.functions.SrpSignature(col("embedding"), srp), "")))
    val byLabel = Similarity.semDedup(emb, "vec_id", "embedding", "label", 0.35)
      .select("vec_id").as[Long].collect().toSet
    val byCell = Similarity.semDedup(bucketed, "vec_id", "embedding", "cell", 0.35)
      .select("vec_id").as[Long].collect().toSet
    assert(byLabel.subsetOf(byCell))
  }

  test("matryoshkaTopK: ranks by prefix-dims cosine only") {
    // full-vector nearest to q is v2; 2-dim prefix nearest is v1 — and the
    // prefix scores differ strictly (1.0 vs ~0.89), so this pins prefix
    // ranking, not the vec_id tie-break
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(0.6f, 0.3f, 0.8f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = Seq((10L, Array(1.0f, 0.0f, 0.9f, 0.0f)))
      .toDF("qid", "qvec")
    val got = Similarity.matryoshkaTopK(corpus, "vec_id", "embedding",
        q, "qid", "qvec", dims = 2, k = 2)
      .orderBy("rank").collect()
    assert(got.head.getAs[Long]("vec_id") == 1L)
    val full = Similarity.bruteForceTopK(corpus, "vec_id", "embedding",
        q, "qid", "qvec", k = 2).orderBy("rank").collect()
    assert(full.head.getAs[Long]("vec_id") == 2L)
  }

  test("intraDocTileDedup drops repeated tiles, keeps first, reassembles") {
    // "a b a b c d a b" with k=2 → tiles [ab, ab, cd, ab]: first kept,
    // later repeats dropped, order of survivors preserved
    val got = Chunking.intraDocTileDedup(
        docs(1L -> "a b a b c d a b"), "doc_id", "text", k = 2)
      .collect().head
    assert(got.getAs[Long]("n_tiles") == 4L)
    assert(got.getAs[Long]("n_kept") == 2L)
    assert(got.getAs[String]("text_dedup") == "a b c d")
  }

  test("intraDocTileDedup: short partial tail tile is its own segment") {
    // 5 tokens, k=2 → tiles [ab, cd, e]; the short tail "e" survives and
    // a doc shorter than one tile round-trips unchanged
    val got = Chunking.intraDocTileDedup(
        docs(1L -> "a b c d e", 2L -> "x"), "doc_id", "text", k = 2)
      .orderBy("doc_id").collect()
    assert(got(0).getAs[Long]("n_tiles") == 3L)
    assert(got(0).getAs[String]("text_dedup") == "a b c d e")
    assert(got(1).getAs[Long]("n_tiles") == 1L)
    assert(got(1).getAs[String]("text_dedup") == "x")
    // a repetition-free doc is the identity: dedup(text) == normalized text
    assert(got.forall(r => r.getAs[Long]("n_kept") == r.getAs[Long]("n_tiles")))
  }

  test("intraDocTileDedup scopes dedup to WITHIN a document") {
    // identical docs: cross-doc repetition is q95's job, not this op's
    val got = Chunking.intraDocTileDedup(
        docs(1L -> "a b c d", 2L -> "a b c d"), "doc_id", "text", k = 2)
      .collect()
    assert(got.forall(_.getAs[Long]("n_kept") == 2L))
  }

  test("intraDocTileDedup plan has no key shuffle (pure per-row array ops)") {
    val d = graft.queries.Tables(spark, sfDir, "documents")
    val plan = Chunking.intraDocTileDedup(d, "doc_id", "text", 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning") && !plan.contains("rangepartitioning"),
      s"unexpected key shuffle:\n$plan")
  }

  test("chunk plan has no key shuffle (only widen's round-robin)") {
    val d = graft.queries.Tables(spark, sfDir, "documents")
    val plan = Chunking.chunk(d, "doc_id", "text", 32, 24)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning") && !plan.contains("rangepartitioning"),
      s"unexpected key shuffle:\n$plan")
  }

  test("boilerplateRemoval: df>maxDf segments stripped from EVERY doc, " +
      "order preserved") {
    // "h1 h2" appears in 3 docs (df=3 > maxDf=2) → removed everywhere,
    // including from doc 1 where it sits in the MIDDLE; unique body
    // segments survive in original order.
    val d = docs(
      1L -> "a1 a2 h1 h2 b1 b2",
      2L -> "h1 h2 c1 c2",
      3L -> "h1 h2 d1 d2",
      4L -> "e1 e2")
    val got = Chunking.boilerplateRemoval(d, "doc_id", "text", 2, 2)
      .orderBy("doc_id").collect()
    assert(got.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_segs"),
      r.getAs[Long]("n_kept"), r.getAs[String]("text_clean"))).toSeq == Seq(
      (1L, 3L, 2L, "a1 a2 b1 b2"),
      (2L, 2L, 1L, "c1 c2"),
      (3L, 2L, 1L, "d1 d2"),
      (4L, 1L, 1L, "e1 e2")))
  }

  test("boilerplateRemoval: df counts DOCUMENTS, not occurrences; " +
      "all-boilerplate doc keeps an empty row") {
    // "x y" occurs 3× inside doc 1 but only in 2 distinct docs → df=2 ≤
    // maxDf=2 → kept everywhere; "p q" spans 3 docs → dropped, leaving
    // doc 4 (pure boilerplate) with an empty reassembly, not a lost row.
    val d = docs(
      1L -> "x y x y x y",
      2L -> "x y z w",
      3L -> "p q a b",
      4L -> "p q",
      5L -> "p q c d")
    val got = Chunking.boilerplateRemoval(d, "doc_id", "text", 2, 2)
      .orderBy("doc_id").collect()
    val byId = got.map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_kept"), r.getAs[String]("text_clean"))).toMap
    assert(byId(1L) == (3L, "x y x y x y"))
    assert(byId(2L) == (2L, "x y z w"))
    assert(byId(4L) == (0L, ""))
    assert(byId(3L) == (1L, "a b") && byId(5L) == (1L, "c d"))
  }

  test("boilerplateRemoval: clean corpus is untouched (identity)") {
    val d = docs(1L -> "a b c d", 2L -> "e f g h")
    val got = Chunking.boilerplateRemoval(d, "doc_id", "text", 2, 1)
      .orderBy("doc_id").collect()
    assert(got.map(_.getAs[String]("text_clean")).toSeq ==
      Seq("a b c d", "e f g h"))
    assert(got.forall(r => r.getAs[Long]("n_segs") == r.getAs[Long]("n_kept")))
  }

  test("contentDefinedChunks: chunks tile the token sequence exactly") {
    val base = (1 to 60).map(i => s"w${i * 7 % 97}").mkString(" ")
    val got = Chunking.contentDefinedChunks(
        docs(1L -> base, 2L -> "a b"), "doc_id", "text", k = 4, divisor = 8)
      .orderBy("__id", "chunk_id").collect()
    val c1 = got.filter(_.getAs[Long]("__id") == 1L)
    assert(c1.map(_.getAs[String]("chunk_text")).mkString(" ") == base)
    assert(c1.map(_.getAs[Long]("n_toks")).sum == 60L)
    // starts are consecutive: each chunk begins where the previous ended
    val bounds = c1.map(r => (r.getAs[Long]("start_pos"), r.getAs[Long]("n_toks")))
    assert(bounds.zip(bounds.tail).forall { case ((s, n), (s2, _)) => s + n == s2 })
    // a doc shorter than the window is one whole chunk
    val c2 = got.filter(_.getAs[Long]("__id") == 2L)
    assert(c2.length == 1 && c2.head.getAs[String]("chunk_text") == "a b")
  }

  test("contentDefinedChunks: insertion only disturbs local chunks (the CDC property)") {
    val base = (1 to 60).map(i => s"w${i * 7 % 97}").mkString(" ")
    val shifted = s"zz1 zz2 zz3 $base"
    val got = Chunking.contentDefinedChunks(
        docs(1L -> base, 2L -> shifted), "doc_id", "text", k = 4, divisor = 8)
      .orderBy("__id", "chunk_id").collect()
    val c1 = got.filter(_.getAs[Long]("__id") == 1L).map(_.getAs[String]("chunk_text"))
    val c2 = got.filter(_.getAs[Long]("__id") == 2L).map(_.getAs[String]("chunk_text")).toSet
    // doc 1 must actually have interior boundaries for the claim to bite
    assert(c1.length >= 3, s"fixture too smooth: ${c1.length} chunks")
    // every chunk after doc 1's first boundary re-aligns verbatim in the
    // shifted doc — the property fixed-stride windows cannot have
    assert(c1.drop(1).forall(c2.contains),
      s"unstable chunks: ${c1.drop(1).filterNot(c2.contains).mkString(" | ")}")
  }
}
