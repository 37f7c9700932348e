package graft

import org.apache.spark.sql.functions._

import graft.operators.TextSearch

/** Full-text operators: postings, boolean/phrase match, BM25 ranking. */
class TextSearchSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "spark joins the fast table"),
    (2L, "the slow table scans the table"),
    (3L, "fast table fast table fast"),
    (4L, "nothing relevant here")).toDF("doc_id", "text")

  test("postings carry tf and sorted positions") {
    val p = TextSearch.postings(docs, "doc_id", "text")
    val row = p.filter(col("term") === "table" && col("doc_id") === 2L).head()
    row.getAs[Long]("tf") shouldBe 2
    row.getSeq[Int](row.fieldIndex("positions")) shouldBe Seq(2, 5)
  }

  test("matchAll requires every term; matchAny any") {
    TextSearch.matchAll(docs, "text", Seq("fast", "table"))
      .select("doc_id").as[Long].collect().sorted shouldBe Seq(1L, 3L)
    TextSearch.matchAny(docs, "text", Seq("spark", "slow"))
      .select("doc_id").as[Long].collect().sorted shouldBe Seq(1L, 2L)
  }

  test("phraseMatch is adjacency- and order-sensitive") {
    TextSearch.phraseMatch(docs, "text", Seq("fast", "table"))
      .select("doc_id").as[Long].collect().sorted shouldBe Seq(1L, 3L)
    // doc 2 has both words but never adjacent in order
    TextSearch.phraseMatch(docs, "text", Seq("table", "scans"))
      .select("doc_id").as[Long].collect().sorted shouldBe Seq(2L)
    TextSearch.phraseMatch(docs, "text", Seq("scans", "table"))
      .count() shouldBe 0 // wrong order ("scans the table" is not adjacent)
  }

  test("bm25: higher tf ranks higher; non-matching docs absent") {
    val top = TextSearch.bm25TopK(docs, "doc_id", "text", Seq("fast"), 10)
      .select("doc_id").as[Long].collect().toSeq
    top shouldBe Seq(3L, 1L) // doc 3 has tf=3 vs doc 1's tf=1
    TextSearch.bm25Scores(docs, "doc_id", "text", Seq("fast"))
      .filter(col("doc_id") === 4L).count() shouldBe 0
  }

  test("bm25 on an empty corpus returns an empty frame, not an NPE") {
    val empty = docs.filter(col("doc_id") < 0)
    TextSearch.bm25Scores(empty, "doc_id", "text", Seq("fast")).count() shouldBe 0
  }

  test("bm25 top-k plans as TakeOrderedAndProject with partial aggregation") {
    val plan = TextSearch.bm25TopK(docs, "doc_id", "text", Seq("fast"), 5)
      .queryExecution.executedPlan.toString
    plan should include("TakeOrderedAndProject")
    plan should include("partial_sum")
  }

  test("bm25f: a boosted-field hit outranks the same hit in the plain field") {
    // identical bodies; only doc 1 carries the term in its TITLE — the
    // 3x boost must rank it first even though raw tf is equal
    val docs = Seq(
      (1L, "spark engine", "padding words query term here"),
      (2L, "other title", "padding words query term here")
    ).toDF("doc_id", "title", "body")
    val scores = TextSearch.bm25fScores(docs, "doc_id",
        Seq(("title", 3.0), ("body", 1.0)), Seq("spark", "term"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    scores(1L) should be > scores(2L)

    // weight 1.0 on a single field degenerates to plain BM25 exactly
    val single = TextSearch.bm25fScores(docs, "doc_id",
        Seq(("body", 1.0)), Seq("term"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val plain = TextSearch.bm25Scores(docs, "doc_id", "body", Seq("term"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    single shouldBe plain

    an[IllegalArgumentException] should be thrownBy
      TextSearch.bm25fScores(docs, "doc_id", Seq(("title", 0.0)), Seq("x"))
    an[IllegalArgumentException] should be thrownBy
      TextSearch.bm25fScores(docs, "doc_id", Seq.empty, Seq("x"))
  }

  test("rrfFuse: both-list docs outrank single-list; absent list contributes 0") {
    val lex = Seq((1L, 1), (2L, 2)).toDF("doc_id", "rank")
    val vec = Seq((2L, 1), (9L, 2)).toDF("doc_id", "rank")
    val got = TextSearch.rrfFuse(lex, vec, "doc_id", k0 = 60)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got(2L) shouldBe (1.0 / 62 + 1.0 / 61) +- 1e-12 // in both lists
    got(1L) shouldBe 1.0 / 61 +- 1e-12              // lexical only
    got(9L) shouldBe 1.0 / 62 +- 1e-12              // vector only
    got(2L) should be > got(1L)
  }
}
