package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curation, LanguageModel, Mutations}

/** Laws of the mutation + LM operators beyond the oracle gate: upsert
  * insert/update/no-op partitions, scd2 history reconstruction, bloom
  * prefilter ≡ exact decontamination, bigram model normalization. */
class MutationsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs0 =
    spark.read.parquet(s"$sfDir/documents.parquet").cache()

  private def dim = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0)
  ).toDF("k", "name", "v")

  test("upsert: update wins, insert appends, untouched rows survive") {
    val incoming = Seq((2L, "B2", 99.0), (9L, "new", 1.0)).toDF("k", "name", "v")
    val out = Mutations.upsert(dim, incoming, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq(
      (1L, "a", 10.0), (2L, "B2", 99.0), (3L, "c", 30.0), (9L, "new", 1.0)))
  }

  test("upsert: empty incoming is identity; full overlap replaces all") {
    val empty = dim.filter(lit(false))
    assert(Mutations.upsert(dim, empty, Seq("k")).orderBy("k").collect()
      .toSeq == dim.orderBy("k").collect().toSeq)
    val repl = dim.withColumn("v", col("v") * 2)
    val out = Mutations.upsert(dim, repl, Seq("k"))
    assert(out.count() == 3 &&
      out.agg(sum("v")).as[Double].head() == 120.0)
  }

  test("upsert: incoming row with null non-key column overwrites (MERGE *)") {
    val incoming = Seq((1L, null.asInstanceOf[String], 5.0)).toDF("k", "name", "v")
    val row = Mutations.upsert(dim, incoming, Seq("k"))
      .filter(col("k") === 1).select("name", "v").collect().head
    assert(row.isNullAt(0) && row.getDouble(1) == 5.0)
  }

  test("upsert rejects mismatched schemas and reserved __inc") {
    intercept[IllegalArgumentException] {
      Mutations.upsert(dim, dim.select("k", "v", "name"), Seq("k"))
    }
    intercept[IllegalArgumentException] {
      Mutations.upsert(dim.withColumn("__inc", lit(1)),
        dim.withColumn("__inc", lit(1)), Seq("k"))
    }
  }

  test("snapshotDiff classifies added/deleted/updated and drops unchanged") {
    val newSnap = Seq(
      (1L, "a", 10.0),   // unchanged → absent from output
      (2L, "b", 25.0),   // updated
      (4L, "d", 40.0)    // added; 3 deleted
    ).toDF("k", "name", "v")
    val out = graft.ops.Mutations.snapshotDiff(dim, newSnap, Seq("k"))
      .select("change_type", "k", "v").as[(String, Long, Double)]
      .collect().sortBy(_._2)
    assert(out.toSeq == Seq(
      ("updated", 2L, 25.0), ("deleted", 3L, 30.0), ("added", 4L, 40.0)))
    // diff(x, x) is empty; null-valued cells compare null-safely
    assert(graft.ops.Mutations.snapshotDiff(dim, dim, Seq("k")).count() == 0)
    val withNull = Seq((1L, null.asInstanceOf[String], 10.0)).toDF("k", "name", "v")
    assert(graft.ops.Mutations
      .snapshotDiff(withNull, withNull, Seq("k")).count() == 0)
  }

  test("int8Quantize: range bounds, max maps to ±127, zero vector safe") {
    val vecs = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f)),
      (2L, Seq(0.0f, 0.0f, 0.0f)),
      (3L, Seq(2.0f))
    ).toDF("vec_id", "embedding")
    val q = graft.ops.Similarity.int8Quantize(vecs, "vec_id", "embedding")
      .select("vec_id", "pos", "q").as[(Long, Long, Int)].collect()
      .sortBy(r => (r._1, r._2))
    assert(q.toSeq == Seq(
      (1L, 0L, 64), (1L, 1L, -127), (1L, 2L, 32),
      (2L, 0L, 0), (2L, 1L, 0), (2L, 2L, 0),
      (3L, 0L, 127)))
    assert(q.forall(r => r._3 >= -127 && r._3 <= 127))
  }

  test("scd2 collapses runs and reconstructs the original attribute path") {
    val events = Seq(
      (1L, 1L, "x"), (1L, 2L, "x"), (1L, 3L, "y"), (1L, 4L, "y"),
      (1L, 5L, "x"), (2L, 1L, "z")
    ).toDF("k", "t", "a")
    val hist = Mutations.scd2(events, "k", Seq("t"), "a")
      .select("k", "valid_from", "valid_to", "a", "is_current")
      .as[(Long, Long, Option[Long], String, Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    assert(hist.toSeq == Seq(
      (1L, 1L, Some(3L), "x", false),
      (1L, 3L, Some(5L), "y", false),
      (1L, 5L, None, "x", true),
      (2L, 1L, None, "z", true)))
    // every original event's attribute is recoverable from its interval
    val rebuilt = events.as("e").join(
      Mutations.scd2(events, "k", Seq("t"), "a").as("h"),
      col("e.k") === col("h.k") && col("e.t") >= col("h.valid_from") &&
        (col("h.valid_to").isNull || col("e.t") < col("h.valid_to")))
      .filter(col("e.a") =!= col("h.a")).count()
    assert(rebuilt == 0)
  }

  test("scd2 keeps a leading null-attribute run") {
    val events = Seq((1L, 1L, null.asInstanceOf[String]), (1L, 2L, "x"))
      .toDF("k", "t", "a")
    val hist = Mutations.scd2(events, "k", Seq("t"), "a")
    assert(hist.count() == 2)
    assert(hist.filter(col("a").isNull && col("valid_to") === 2).count() == 1)
  }

  test("bloom-prefiltered decontamination equals the exact operator") {
    val docs = docs0
    val bench = docs.filter(col("doc_id") < 5)
    val corpus = docs.filter(col("doc_id") >= 5)
    // tiny bucket space forces heavy false positives through the prefilter
    for (bits <- Seq(8, 1 << 16)) {
      val bloom = Curation.contaminatedIdsBloom(
        corpus, bench, "doc_id", "text", k = 3, bits = bits)
        .as[Long].collect().sorted.toSeq
      val exact = Curation.contaminatedIds(corpus, bench, "doc_id", "text", 3)
        .as[Long].collect().sorted.toSeq
      assert(bloom == exact, s"bits=$bits")
    }
  }

  test("bigram model probabilities sum to 1 per head word") {
    val docs = docs0
    val bad = LanguageModel.bigramModel(docs, "doc_id", "text")
      .groupBy("w1").agg(sum(col("p").cast("decimal(27,15)")).as("s"))
      .filter(abs(col("s") - 1.0) > 1e-9).count()
    assert(bad == 0)
  }

  test("coherence: in-distribution docs outscore out-of-distribution docs") {
    // held-out scoring: the model is trained on `corpus` only, so a doc
    // can't inflate its own score with singleton self-bigrams
    val corpus = Seq((0L, "the cat sat on the mat")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "the cat sat"),     // transitions seen in corpus: p = 1/2, 1
      (2L, "sat cat the")      // transitions never seen: p = 0, 0
    ).toDF("doc_id", "text")
    val scores = LanguageModel.coherence(docs, corpus, "doc_id", "text")
      .select("doc_id", "coherence").as[(Long, Double)].collect().toMap
    assert(scores(1L) == 0.75 && scores(2L) == 0.0, scores.toString)
    // single-token and empty docs emit no bigrams, not errors
    val tiny = Seq((0L, "one"), (1L, "")).toDF("doc_id", "text")
    assert(LanguageModel.coherence(tiny, tiny, "doc_id", "text").count() == 0)
  }

  test("incrementalRollup: maintained state equals the from-scratch rebuild") {
    val facts = Seq(("a", 10.5), ("a", 2.25), ("b", 7.0), ("c", 1.0))
      .toDF("k", "v")
    val base = facts.groupBy($"k")
      .agg(count(lit(1)).as("cnt"),
        sum($"v".cast("decimal(27,15)")).as("total"))
    val delta = Seq(
      ("I", "a", 4.75),   // existing key grows
      ("I", "d", 9.0),    // brand-new key appears
      ("D", "c", 1.0),    // c's only row deleted → key must drop out
      ("D", "b", 7.0), ("I", "b", 3.5)  // b fully replaced
    ).toDF("op", "k", "v")
    val got = Mutations.incrementalRollup(base, delta, "k", "op", "v")
      .select($"k", $"cnt", $"total".cast("double"))
      .as[(String, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    val rebuilt = Seq(("a", 10.5), ("a", 2.25), ("a", 4.75), ("d", 9.0),
      ("b", 3.5)).toDF("k", "v")
      .groupBy($"k").agg(count(lit(1)).as("cnt"),
        sum($"v".cast("decimal(27,15)")).as("total"))
      .select($"k", $"cnt", $"total".cast("double"))
      .as[(String, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got.keySet == Set("a", "b", "d"), got.toString) // c dropped
    assert(got.map { case (k, (c, _)) => k -> c } ==
      rebuilt.map { case (k, (c, _)) => k -> c })
    assert(got.forall { case (k, (_, t)) => t == rebuilt(k)._2 },
      s"totals must be bit-identical: $got vs $rebuilt")
  }

  test("incrementalRollup: a CDC op outside {I, D} fails loudly instead of " +
      "silently diverging the maintained state") {
    val base = Seq(("a", 1L, BigDecimal(1))).toDF("k", "cnt", "total")
    val delta = Seq(("U", "a", 2.0)).toDF("op", "k", "v")
    val ex = intercept[Exception] {
      Mutations.incrementalRollup(base, delta, "k", "op", "v").collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(ex).exists(c =>
        Option(c.getMessage).exists(_.contains("unknown CDC op"))),
      s"expected the raise_error message, got: $ex")
  }
}
