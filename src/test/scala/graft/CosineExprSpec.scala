package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

import graft.functions.CosineSimilarity
import graft.ops.Similarity

/** The codegen'd cosine expression must be bit-identical to the composable
  * functions formulation, work through SQL via the extension, and reject
  * wrong types at analysis. */
class CosineExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("expression == composable formulation, bit for bit") {
    val a = emb.select($"vec_id".as("ida"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("idb"), $"embedding".as("vb"))
    val pairs = a.join(b, $"ida" < $"idb" && $"idb" < $"ida" + 7)
    val diff = pairs.select(
        CosineSimilarity($"va", $"vb").as("fast"),
        Similarity.cosineComposable($"va", $"vb").as("ref"))
      .filter($"fast" =!= $"ref") // exact double comparison
      .count()
    assert(diff == 0)
  }

  test("registered SQL function via SparkSessionExtensions") {
    emb.limit(50).createOrReplaceTempView("emb_sql")
    val rows = spark.sql(
      """SELECT a.vec_id, graft_cosine(a.embedding, b.embedding) AS c
        |FROM emb_sql a JOIN emb_sql b ON a.vec_id + 1 = b.vec_id""".stripMargin)
      .collect()
    assert(rows.length > 0)
    assert(rows.forall(r => math.abs(r.getDouble(1)) <= 1.0 + 1e-9))
  }

  test("null inputs yield null; self-similarity is 1.0") {
    val df = Seq(
      (1L, Some(Array(1.0f, 2.0f, 3.0f)), Some(Array(1.0f, 2.0f, 3.0f))),
      (2L, None, Some(Array(1.0f, 0.0f, 0.0f)))
    ).toDF("id", "a", "b")
    val out = df.select($"id", CosineSimilarity($"a", $"b").as("c")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(math.abs(out(1L).get - 1.0) < 1e-12)
    assert(out(2L).isEmpty)
  }

  test("type check rejects non-float arrays at analysis time") {
    val df = Seq((1L, Array(1.0, 2.0), Array(1.0f, 2.0f))).toDF("id", "d", "f")
    intercept[AnalysisException](
      df.select(CosineSimilarity($"d", $"f")).collect())
  }

  test("graft_jaccard expression == composable array_intersect formulation") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").limit(120)
    val sh = docs.select($"doc_id", graft.ops.Dedup.shingles($"text").as("sh"))
    val a = sh.select($"doc_id".as("ida"), $"sh".as("sa"))
    val b = sh.select($"doc_id".as("idb"), $"sh".as("sb"))
    val pairs = a.join(b, $"ida" < $"idb" && $"idb" < $"ida" + 5)
    val diff = pairs.select(
        graft.functions.JaccardSimilarity($"sa", $"sb").as("fast"),
        graft.ops.Dedup.jaccardComposable($"sa", $"sb").as("ref"))
      .filter($"fast" =!= $"ref").count()
    assert(diff == 0)
    // SQL registration + set semantics with duplicates and empties
    val r = spark.sql(
      """SELECT graft_jaccard(array('a','b','a'), array('b','c')) AS j1,
        |       graft_jaccard(CAST(array() AS ARRAY<STRING>), CAST(array() AS ARRAY<STRING>)) AS j2,
        |       graft_jaccard(array('x'), array('x')) AS j3""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0 / 3.0) < 1e-12)
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 1.0)
  }

  test("graft_bounded_lev: exact ≤ bound, capped above, built-in equivalence") {
    // randomized cross-check against Spark's built-in levenshtein: the
    // bounded value must equal the unbounded one whenever that is <= k,
    // and be exactly k+1 otherwise
    val rnd = new scala.util.Random(4242)
    val alphabet = "abcx"
    def word() = (0 until rnd.nextInt(12)).map(_ =>
      alphabet(rnd.nextInt(alphabet.length))).mkString
    val pairs = (1 to 300).map(_ => (word(), word()))
    for (k <- Seq(0, 1, 2, 3)) {
      val got = pairs.toDF("a", "b").select(
          graft.functions.BoundedLevenshtein($"a", $"b", lit(k)).as("bl"),
          levenshtein($"a", $"b").as("full"))
        .as[(Int, Int)].collect()
      got.foreach { case (bl, full) =>
        if (full <= k) assert(bl == full, s"k=$k: bounded $bl != exact $full")
        else assert(bl == k + 1, s"k=$k: expected cap ${k + 1}, got $bl (full $full)")
      }
    }
    // SQL registration, nulls, degenerate bounds
    val r = spark.sql(
      """SELECT graft_bounded_lev('kitten', 'sitting', 3) AS d1,
        |       graft_bounded_lev('kitten', 'sitting', 2) AS d2,
        |       graft_bounded_lev(NULL, 'x', 2) AS d3,
        |       graft_bounded_lev('', 'ab', 2) AS d4,
        |       graft_bounded_lev('same', 'same', 0) AS d5""".stripMargin).head()
    assert(r.getInt(0) == 3 && r.getInt(1) == 3)
    assert(r.isNullAt(2))
    assert(r.getInt(3) == 2 && r.getInt(4) == 0)
  }

  test("whole-stage codegen handles the expression (no fallback)") {
    val a = emb.select($"vec_id".as("ida"), $"embedding".as("va"))
    val b = emb.select($"vec_id".as("idb"), $"embedding".as("vb"))
    val df = a.join(b, $"ida" < $"idb" && $"idb" < $"ida" + 3)
      .select(CosineSimilarity($"va", $"vb").as("c"))
    df.collect() // AQE finalizes the plan only on execution
    val plan = df.queryExecution.executedPlan.toString
    // the *(n) prefix marks operators inside a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l =>
      l.contains("graft_cosine") && l.trim.matches("""\+?-?\s*\*\(\d+\).*""")), plan)
  }
}
