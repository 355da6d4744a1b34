package graft

import org.apache.spark.sql.functions._

import graft.ops.{ProductQuantization => PQ, Similarity}

class PQSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").cache()
  private lazy val codebook = PQ.seedCodebook(emb, "vec_id", "embedding", m = 8, k = 16)

  test("codebook shape and determinism") {
    assert(codebook.count() == 8 * 16)
    val c0 = codebook.filter($"s" === 0 && $"c" === 0)
      .select("cvec").as[Seq[Float]].head()
    assert(c0.length == 8) // 64 dims / 8 subspaces
    val again = PQ.seedCodebook(emb, "vec_id", "embedding", 8, 16)
      .filter($"s" === 0 && $"c" === 0).select("cvec").as[Seq[Float]].head()
    assert(c0 == again)
  }

  test("encode: m codes per vector, all within [0, k)") {
    val codes = PQ.encode(emb, "vec_id", "embedding", codebook, m = 8)
    assert(codes.count() == emb.count())
    val bad = codes.filter(size($"codes") =!= 8 ||
      exists($"codes", c => c < 0 || c >= 16)).count()
    assert(bad == 0)
    // a seed vector encodes (partly) to itself: vec 0's subvectors are
    // centroid 0 in every subspace, so its codes are all 0
    val v0 = codes.filter($"vec_id" === 0L).select("codes").as[Seq[Int]].head()
    assert(v0.forall(_ == 0))
  }

  test("ADC search with re-rank: reasonable recall vs exact cosine top-k") {
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "qid", "qvec", k = 10)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val pq = PQ.searchADC(emb, "vec_id", "embedding",
        queries, "qid", "qvec", codebook, m = 8, k = 10, rerank = 100)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    assert(pq.size == exact.size)
    val recall = (exact & pq).size.toDouble / exact.size
    // 16-centroid seeded codebook on random gaussians is the hard case;
    // with a 100-candidate exact re-rank, recall should still clear 0.3
    assert(recall >= 0.3, s"PQ recall $recall")
    // scores of returned results are exact cosine (re-ranked)
    val scores = PQ.searchADC(emb, "vec_id", "embedding", queries, "qid", "qvec",
        codebook, 8, 3, 50).select("score").as[Double].collect()
    assert(scores.forall(s => s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9))
  }

  test("IVF-PQ: k per query, candidates ⊆ probed cells, recall vs ADC-only") {
    val cells = Similarity.trainCentroids(emb, "vec_id", "embedding",
      kCells = 8, iters = 1)
    val queries = emb.filter($"vec_id" < 10)
      .select($"vec_id".as("qid"), $"embedding".as("qvec"))
    val got = PQ.searchIvfPq(emb, "vec_id", "embedding",
      queries, "qid", "qvec", cells, "cid", "cvec",
      codebook, m = 8, k = 10, nprobe = 8, rerank = 100)
    val rows = got.select("qid", "rank", "vec_id").as[(Long, Long, Long)].collect()
    assert(rows.groupBy(_._1).forall(_._2.length == 10))
    assert(rows.groupBy(_._1).forall { case (_, rs) =>
      rs.map(_._2).sorted.toSeq == (1L to 10L) })
    // with nprobe = all cells, IVF prunes nothing: results must equal the
    // plain ADC search (the composition's correctness law)
    val adc = PQ.searchADC(emb, "vec_id", "embedding", queries, "qid", "qvec",
        codebook, m = 8, k = 10, rerank = 100)
      .select("qid", "rank", "vec_id").as[(Long, Long, Long)].collect()
    assert(rows.sorted.toSeq == adc.sorted.toSeq)
    // partial probing still finds most of what full probing finds
    val partial = PQ.searchIvfPq(emb, "vec_id", "embedding",
        queries, "qid", "qvec", cells, "cid", "cvec",
        codebook, m = 8, k = 10, nprobe = 4, rerank = 100)
      .select("qid", "vec_id").as[(Long, Long)].collect().toSet
    val full = rows.map(t => (t._1, t._3)).toSet
    val recall = (full & partial).size.toDouble / full.size
    assert(recall >= 0.5, s"IVF-PQ nprobe=4/8 recall $recall")
  }
}
