package graft

import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoin

/** FastSS deletion-neighborhood edit-distance joins: exactness vs the
  * cross-filter levenshtein reference on collision-heavy corpora. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Seeded random strings over a 3-letter alphabet — short strings on
    * a tiny alphabet maximize both true matches and neighborhood
    * collisions. */
  private def corpus(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      val len = 1 + rnd.nextInt(6)
      (i.toLong, Seq.fill(len)(('a' + rnd.nextInt(3)).toChar).mkString)
    }.toDF("id", "s")
  }

  private def bruteWithin(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val a = df.select(col("id").as("id_a"), col("s").as("str_a"))
    val b = df.select(col("id").as("id_b"), col("s").as("str_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b") &&
        levenshtein(col("str_a"), col("str_b")) <= k)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
  }

  test("self pairs == brute-force levenshtein, k=1 and k=2, seeds x corpora") {
    for (seed <- Seq(1, 2, 3); k <- Seq(1, 2)) {
      val df = corpus(seed, 120)
      val got = FuzzyJoin.editDistancePairs(df, "s", "id", k)
        .select("id_a", "id_b").as[(Long, Long)].collect()
      got.length shouldBe got.toSet.size // distinct-pair contract
      got.toSet shouldBe bruteWithin(df, k)
    }
  }

  test("cross form == brute force; typo always recovers its source") {
    val dict = Seq((1L, "widget"), (2L, "gadget"), (3L, "gizmo"))
      .toDF("did", "w")
    val probes = Seq((10L, "widgt"), (11L, "gadget"), (12L, "gizmos"),
      (13L, "nonsense")).toDF("pid", "p")
    val got = FuzzyJoin.editDistanceJoin(probes, "p", "pid",
        dict, "w", "did", maxDist = 1)
      .select("pid", "did").as[(Long, Long)].collect().toSet
    got shouldBe Set((10L, 1L), (11L, 2L), (12L, 3L))
  }

  test("neighborhood: sizes, empty string, dedup") {
    val row = Seq("abc").toDF("s")
    row.select(FuzzyJoin.neighborhood(col("s"), 1))
      .as[Seq[String]].head().length shouldBe 4 // abc, bc, ac, ab
    // k=2 on "aab": dedup collapses repeated variants
    val n2 = Seq("aab").toDF("s")
      .select(FuzzyJoin.neighborhood(col("s"), 2)).as[Seq[String]].head()
    n2.distinct.size shouldBe n2.size
    n2 should contain allOf ("aab", "ab", "aa", "a", "b")
    Seq("").toDF("s").select(FuzzyJoin.neighborhood(col("s"), 2))
      .as[Seq[String]].head() shouldBe Seq("")
  }

  test("maxBucket drops stop-fragment buckets but keeps distinctive pairs") {
    // 30 rows collapse to variant "a"; the pair (x, y) shares rare keys
    val df = ((1 to 30).map(i => (i.toLong, "a" + ('a' + i % 3).toChar)) ++
      Seq((100L, "zqw"), (101L, "zqx"))).toDF("id", "s")
    val capped = FuzzyJoin.editDistancePairs(df, "s", "id", 1, maxBucket = 8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    capped should contain((100L, 101L))
    // uncapped is the exact reference; capped is a subset
    capped.subsetOf(bruteWithin(df, 1)) shouldBe true
  }

  test("maxLen fails loudly by default; dropLongStrings opts into exclusion") {
    val longText = "lorem ipsum " * 40 // 480 chars — a misfed document
    val df = Seq((1L, "widget"), (2L, "widgt"), (3L, longText))
      .toDF("id", "s")
    // DEFAULT: an over-long row fails the job with the limit in the
    // message — never a silent loss of its pairs
    val loud = intercept[Exception] {
      FuzzyJoin.editDistancePairs(df, "s", "id", 1, maxLen = 64).collect()
    }
    loud.getMessage should include("maxLen=64")
    // OPT-IN exclusion: the long row joins nothing, short pairs exact
    val pairs = FuzzyJoin.editDistancePairs(df, "s", "id", 1, maxLen = 64,
        dropLongStrings = true)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    pairs shouldBe Set((1L, 2L))
    // cross form: loud default on a long dictionary row…
    val dict = Seq((10L, "widget"), (11L, longText)).toDF("did", "w")
    an[Exception] should be thrownBy
      FuzzyJoin.editDistanceJoin(df, "s", "id", dict, "w", "did",
        maxDist = 1, maxLen = 64).collect()
    // …and opt-in exclusion there too
    val got = FuzzyJoin.editDistanceJoin(df, "s", "id", dict, "w", "did",
        maxDist = 1, maxLen = 64, dropLongStrings = true)
      .select("id", "did").as[(Long, Long)].collect().toSet
    got shouldBe Set((1L, 10L), (2L, 10L))
    // rows AT the bound pass the loud guard untouched
    FuzzyJoin.editDistancePairs(df.filter(col("id") < 3L), "s", "id", 1,
        maxLen = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet shouldBe
      Set((1L, 2L))
    // and the guard rejects nonsense configuration eagerly
    an[IllegalArgumentException] should be thrownBy
      FuzzyJoin.editDistancePairs(df, "s", "id", 1, maxLen = 0)
  }

  test("cross form caps stop-fragment buckets on the dictionary side too") {
    // 40 dictionary rows share variant "a"; the distinctive pair survives
    val dict = ((1 to 40).map(i => (i.toLong, "a" + ('a' + i % 3).toChar)) ++
      Seq((100L, "zqw"))).toDF("did", "w")
    val probes = Seq((200L, "zqx")).toDF("pid", "p")
    val got = FuzzyJoin.editDistanceJoin(probes, "p", "pid",
        dict, "w", "did", maxDist = 1, maxBucket = 8)
      .select("pid", "did").as[(Long, Long)].collect().toSet
    got shouldBe Set((200L, 100L))
  }

  test("null and empty strings don't break the join") {
    val df = Seq((1L, "ab"), (2L, null.asInstanceOf[String]), (3L, ""),
      (4L, "b")).toDF("id", "s")
    val got = FuzzyJoin.editDistancePairs(df, "s", "id", 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // ed("", "b") = 1; ed("ab", "b") = 1; null drops
    got shouldBe Set((3L, 4L), (1L, 4L))
  }

  test("plans as a hash equi-join on the variant key, never NLJ") {
    val plan = FuzzyJoin.editDistancePairs(corpus(5, 50), "s", "id", 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("CartesianProduct"))
    assert(plan.contains("Join") && plan.contains("levenshtein"))
  }
}
