package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, DedupClustering, Skew}

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  test("connected components match a union-find ground truth") {
    // chain 1-2-3-4, clique 10-11-12, pair 20-21, plus a long chain to
    // exercise multi-iteration convergence
    val chain = (100L until 140L).sliding(2).map(s => (s(0), s(1))).toSeq
    val pairs = (Seq((1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L)) ++ chain)
      .toDF("doc_a", "doc_b")
    val got = DedupClustering.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap

    // union-find ground truth computed driver-side
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.as[(Long, Long)].collect().foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = parent.keys.map(k => k -> find(k)).toMap ++
      got.keys.filterNot(parent.contains).map(k => k -> k)
    assert(got == expected.filter { case (k, _) => got.contains(k) })
    assert(got(4L) == 1L && got(12L) == 10L && got(139L) == 100L)
  }

  test("collapseNearDups keeps one survivor per near-dup cluster") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val collapsed = DedupClustering.collapseNearDups(docs, "doc_id", "text",
      threshold = 0.8)
    val pairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text", threshold = 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val removed = docs.count() - collapsed.count()
    // every surviving set contains no near-dup pair
    val kept = collapsed.select("doc_id").as[Long].collect().toSet
    assert(!pairs.exists { case (a, b) => kept.contains(a) && kept.contains(b) })
    // nothing removed without evidence
    val inPairs = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(removed <= inPairs.size)
  }

  test("distributed label-propagation path matches driver union-find path") {
    val chain = (100L until 160L).sliding(2).map(s => (s(0), s(1))).toSeq
    val pairs = (Seq((1L, 2L), (2L, 3L), (10L, 11L), (11L, 12L)) ++ chain)
      .toDF("doc_a", "doc_b")
    val driver = DedupClustering.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    val dist = DedupClustering.connectedComponents(pairs, "doc_a", "doc_b",
        driverMaxEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(dist == driver)
    assert(dist(159L) == 100L)
  }

  test("inverted-index Jaccard equals the all-pairs form exactly") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 80)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val allPairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      k = 3, threshold = 0.2).collect().map(key).toSet
    val indexed = Dedup.ngramJaccardIndexPairs(docs, "doc_id", "text",
      k = 3, threshold = 0.2).collect().map(key).toSet
    assert(allPairs.nonEmpty, "fixture yields no pairs — equality test is vacuous")
    assert(indexed == allPairs)
  }

  test("containment is asymmetric: prefix⊂source scores 1.0, not the reverse") {
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val prefix = (1 to 12).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long), (2L, prefix)).toDF("doc_id", "text")
    val got = Dedup.ngramContainmentPairs(docs, "doc_id", "text",
        k = 3, threshold = 0.5)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // all 10 of the prefix's 3-grams appear in the long doc
    assert(got((2L, 1L)) == 1.0)
    // but only 10 of the long doc's 38 3-grams appear in the prefix
    assert(!got.contains((1L, 2L)))
  }

  test("connected components work with string ids (no lossy cast)") {
    val pairs = Seq(("doc-a", "doc-b"), ("doc-b", "doc-c"), ("doc-x", "doc-y"))
      .toDF("doc_a", "doc_b")
    val got = graft.ops.DedupClustering.connectedComponents(pairs, "doc_a", "doc_b")
      .as[(String, String)].collect().toMap
    assert(got("doc-a") == "doc-a" && got("doc-b") == "doc-a" && got("doc-c") == "doc-a")
    assert(got("doc-x") == "doc-x" && got("doc-y") == "doc-x")
  }

  test("salted distinct ignores nulls like COUNT(DISTINCT)") {
    val df = Seq(("k1", Some(1L)), ("k1", None), ("k1", Some(2L)),
      ("k2", None)).toDF("k", "v")
    val salted = graft.ops.Skew.saltedCountDistinct(df, "k", "v")
      .as[(String, Long)].collect().toMap
    assert(salted == Map("k1" -> 2L)) // k2 has only nulls -> no row, like SQL
  }

  test("salted distinct equals plain countDistinct (incl. skewed key)") {
    val base = spark.read.parquet(s"$sfDir/orders.parquet")
      .select($"o_orderpriority".as("k"), $"o_custkey".as("v"))
    // inject a hot key with many duplicate values
    val hot = spark.range(10000).select(lit("HOT").as("k"), ($"id" % 37).as("v"))
    val df = base.unionByName(hot)
    val salted = Skew.saltedCountDistinct(df, "k", "v")
      .as[(String, Long)].collect().toMap
    val exact = df.groupBy($"k").agg(countDistinct($"v").as("n"))
      .as[(String, Long)].collect().toMap
    assert(salted == exact)
    assert(salted("HOT") == 37L)
  }

  test("skyline equals naive dominance join, incl. duplicate points") {
    val df = Seq(
      (1L, 1, 10.0), (2L, 1, 10.0), // duplicate skyline points both survive
      (3L, 1, 12.0),                // dominated within same x
      (4L, 2, 8.0), (5L, 2, 9.0),
      (6L, 3, 8.0),                 // y ties earlier x=2 min -> dominated
      (7L, 5, 3.0), (8L, 9, 2.9), (9L, 9, 50.0)
    ).toDF("id", "x", "y")
    val fast = graft.ops.Skyline.skyline2Min(df, "x", "y")
      .select("id").as[Long].collect().toSet
    val a = df.select($"id".as("ia"), $"x".as("xa"), $"y".as("ya"))
    val b = df.select($"id".as("ib"), $"x".as("xb"), $"y".as("yb"))
    val dominated = a.join(b,
        $"xb" <= $"xa" && $"yb" <= $"ya" && ($"xb" < $"xa" || $"yb" < $"ya"))
      .select($"ia").distinct().as[Long].collect().toSet
    val expected = df.select("id").as[Long].collect().toSet -- dominated
    assert(fast == expected, s"fast=$fast expected=$expected")
    assert(fast.contains(1L) && fast.contains(2L) && !fast.contains(6L))
  }

  test("collapseNearDupsByQuality keeps the highest-scoring member, not the min id") {
    // two 2-cliques of identical text; quality makes the LARGER id win in
    // cluster A and the smaller win in cluster B
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", 1.0),
      (2L, "alpha beta gamma delta epsilon zeta", 9.0),   // winner (higher q)
      (10L, "one two three four five six", 5.0),          // winner (higher q)
      (11L, "one two three four five six", 2.0),
      (20L, "totally unrelated content here now", 3.0)    // untouched singleton
    ).toDF("doc_id", "text", "q")
    val kept = DedupClustering.collapseNearDupsByQuality(
        docs, "doc_id", "text", "q", threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 10L, 20L), kept.toString)
    // score tie falls back to the minimum id (the default collapse rule)
    val tied = Seq(
      (5L, "same same same same same same", 7.0),
      (6L, "same same same same same same", 7.0)
    ).toDF("doc_id", "text", "q")
    val keptTied = DedupClustering.collapseNearDupsByQuality(
        tied, "doc_id", "text", "q", threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(keptTied == Set(5L))
  }

  test("collapseNearDupsByQuality works for STRING ids (no numeric-negation " +
      "tie-break): winners survive instead of every member losing") {
    val docs = Seq(
      ("doc-a", "alpha beta gamma delta epsilon zeta", 1.0),
      ("doc-b", "alpha beta gamma delta epsilon zeta", 9.0), // winner
      ("doc-x", "totally unrelated content here now", 3.0)
    ).toDF("doc_id", "text", "q")
    val kept = DedupClustering.collapseNearDupsByQuality(
        docs, "doc_id", "text", "q", threshold = 0.8)
      .select("doc_id").as[String].collect().toSet
    assert(kept == Set("doc-b", "doc-x"), kept.toString)
    // string score tie falls back to the lexicographically smallest id
    val tied = Seq(
      ("k2", "same same same same same same", 7.0),
      ("k1", "same same same same same same", 7.0)
    ).toDF("doc_id", "text", "q")
    val keptTied = DedupClustering.collapseNearDupsByQuality(
        tied, "doc_id", "text", "q", threshold = 0.8)
      .select("doc_id").as[String].collect().toSet
    assert(keptTied == Set("k1"))
  }

  test("approx sketches are within tolerance of exact values") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val rows = graft.queries.SkewQueries.q73ApproxSketches(spark, sfDir)
      .select("l_returnflag", "exact_nd_part", "nd_within_bound",
        "median_rank_ok")
      .as[(String, Long, Boolean, Boolean)].collect()
    val exact = li.groupBy($"l_returnflag").agg(countDistinct($"l_partkey").as("n"))
      .as[(String, Long)].collect().toMap
    rows.foreach { case (k, nd, ndOk, medOk) =>
      assert(nd == exact(k), s"$k exact nd: $nd vs ${exact(k)}")
      assert(ndOk, s"$k: HLL outside its 0.05 bound")
      assert(medOk, s"$k: quantile sketch outside its rank bound")
    }
  }
}
