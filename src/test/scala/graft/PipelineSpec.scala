package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Pipeline, Sampling}
import graft.operators.Pipeline.Stage

/** Declarative pipeline runner: stage composition, text rewriting
  * mid-pipeline, per-domain budgets, and error paths. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val boiler = (0 until 20).map(i => s"b$i").mkString(" ")
  private def corpus = Seq(
    (1L, "src_a", "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "src_a", "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of 1
    // exactly 10 prose tokens before the boilerplate, so the strided
    // window at start 10 covers the shared 20-token block exactly
    (3L, "src_a", s"unique prose about spark query engines and their fine optimizers $boiler"),
    (4L, "src_b", s"another unique document mentioning catalyst and tungsten codegen paths here $boiler"),
    (5L, "src_b", "short tail doc with plain words and nothing else special here at all")
  ).toDF("doc_id", "source", "text")

  test("exact_dedup -> shuffle -> pack composes into assignments") {
    val out = Pipeline.run(corpus, "text", "doc_id", Seq(
      Stage("exact_dedup", Map.empty),
      Stage("shuffle", Map("seed" -> "7")),
      Stage("pack", Map("budget" -> "16", "shards" -> "2"))))
    // doc 2 collapses into doc 1; every survivor gets one assignment row
    out.select("id").collect().map(_.getLong(0)).toSet shouldBe Set(1L, 3L, 4L, 5L)
  }

  test("strip_chunks rewrites textCol so later stages see cleaned text") {
    val out = Pipeline.run(corpus, "text", "doc_id", Seq(
      Stage("strip_chunks", Map("window" -> "20", "stride" -> "10"))))
    val byId = out.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    // docs 3/4 share the 20-token boilerplate window; it must be gone
    byId(3L) should not include "b0"
    byId(3L) should include("spark query engines")
    byId(4L) should not include "b19"
    // the full-row shape survives (source column still present)
    out.columns.toSet shouldBe Set("doc_id", "source", "text")
  }

  test("sample_token_budget honors budget:<domain> overrides inside a pipeline") {
    val out = Pipeline.run(corpus, "text", "doc_id", Seq(
      Stage("sample_token_budget", Map(
        "domainCol" -> "source", "defaultBudget" -> "1000000",
        "budget:src_b" -> "0"))))
    out.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(1L, 2L, 3L)
  }

  test("verdicts_filter stage drops repetition-heavy docs in composition") {
    val spam = Seq((10L, "s", ("spam " * 40).trim)).toDF("doc_id", "source", "text")
    val out = Pipeline.run(corpus.unionByName(spam), "text", "doc_id", Seq(
      Stage("verdicts_filter", Map("minQuality" -> "0.0", "maxDupTokenFrac" -> "0.6",
        "maxTopTokenFrac" -> "0.5")), // "the" x3 in doc 1 is fine prose
      Stage("exact_dedup", Map.empty)))
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    ids should not contain 10L // 40x one token -> dup_token_frac ~ 1
    ids should contain(1L)
  }

  test("url stages compose: blocklist -> canonical dedup -> split labels") {
    val web = Seq(
      (1L, "https://Example.com/x?id=1&utm_source=a", "doc one"),
      (2L, "https://example.com/x/?id=1&gclid=b", "doc two"),   // canonical dup of 1
      (3L, "https://spam-farm.com/z", "doc three"),             // blocked domain
      (4L, "https://ok.example.org/y?id=2", "doc four")
    ).toDF("doc_id", "url", "text")
    val out = Pipeline.run(web, "text", "doc_id", Seq(
      Stage("url_blocklist", Map("urlCol" -> "url", "blocked" -> "spam-farm.com")),
      Stage("url_dedup", Map("urlCol" -> "url")),
      Stage("split_assign", Map("keyCol" -> "doc_id",
        "fractions" -> "train=0.9,test=0.1"))))
    val rows = out.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    rows.keySet shouldBe Set(1L, 4L) // 3 blocked, 2 collapsed into 1
    rows.values.foreach(Set("train", "test") should contain(_))
    // full-row shape survives (url column still present)
    out.columns should contain("url")
  }

  test("adaptive_length and novelty_floor stages filter in composition") {
    val docs = ((1 to 10).map(i => (i.toLong, "g", "x " * i * 5 + s"unique$i words"))
      :+ (11L, "g", "x x x")).toDF("doc_id", "source", "text")
    val kept = Pipeline.run(docs, "text", "doc_id", Seq(
      Stage("adaptive_length", Map("groupCol" -> "source"))))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    kept should not contain 11L // far below the group's p10
    val novel = Pipeline.run(Seq(
        (1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
        (3L, "completely original phrasing here"))
        .toDF("doc_id", "text"),
      "text", "doc_id", Seq(
        Stage("novelty_floor", Map("minNovelty" -> "0.5"))))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    novel shouldBe Set(3L) // the verbatim pair is all shared shingles
  }

  test("quality_band stage keeps each language's top fraction, full-row shape") {
    val docs = Seq(
      (1L, "en", "the quick brown fox, and then some more words here."),
      (2L, "en", "zzz"),
      (3L, "de", "kurz."),
      (4L, "de", "ein etwas besserer text, mit satzzeichen und ein paar worten.")
    ).toDF("doc_id", "lang", "text")
    val kept = Pipeline.run(docs, "text", "doc_id", Seq(
      Stage("quality_band", Map("langCol" -> "lang", "keep" -> "0.5"))))
    // keep=0.5 over 2-doc groups: percent_rank 0 (the leader) survives,
    // rank 1.0 does not — one winner per language
    kept.select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(1L, 4L)
    kept.columns should contain("lang") // full-row contract preserved
  }

  test("unknown stages and missing params fail loudly") {
    an[IllegalArgumentException] should be thrownBy
      Pipeline.run(corpus, "text", "doc_id", Seq(Stage("frobnicate", Map.empty)))
    an[IllegalArgumentException] should be thrownBy
      Pipeline.run(corpus, "text", "doc_id",
        Seq(Stage("sample_token_budget", Map.empty))) // no domainCol
    an[IllegalArgumentException] should be thrownBy
      Pipeline.run(corpus, "text", "doc_id", Seq.empty)
  }
}
