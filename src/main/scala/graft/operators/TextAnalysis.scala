package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language identification, and document
  * fingerprinting. All pure Catalyst column expressions (no UDFs) so they
  * run inside Tungsten/codegen and scale to arbitrary corpus sizes — the
  * per-row cost is independent of corpus size and there is no shuffle.
  *
  * These extend the reference's capability surface (ADAMpro has TEXTTYPE
  * attributes routed to Solr, `/root/reference/src/main/scala/org/vitrivr/adampro/storage/engine/SolrEngine.scala:31`,
  * but no in-engine text analytics); the north-star brief makes them
  * first-class operators.
  */
object TextAnalysis {

  /** Whitespace tokens of the lower-cased, trimmed text. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** A BPE-ish sub-word proxy: count of runs of word chars plus standalone
    * punctuation marks — approximates tokenizer token counts without a
    * vocab file. */
  def bpeishTokenCount(text: Column): Column =
    size(split(trim(text), "\\s+")) +
      length(text) - length(regexp_replace(text, "[.,!?;:]", ""))

  /** Mean token length (characters), 0 for empty docs. */
  def avgWordLen(text: Column): Column = {
    val ts = tokens(text)
    when(size(ts) === 0, lit(0.0))
      .otherwise(
        aggregate(ts, lit(0.0), (acc, t) => acc + length(t).cast("double")) /
          size(ts).cast("double"))
  }

  /** Fraction of characters that are in a fixed punctuation class. */
  def punctRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0)).otherwise(
      (length(text) - length(regexp_replace(text, "[.,!?;:]", ""))).cast("double") /
        length(text).cast("double"))

  /** English-ish stopword list used by the ratio + language heuristics. */
  val Stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "from", "that", "this")

  /** Fraction of tokens that are stopwords (duplicates counted). */
  def stopwordRatio(text: Column): Column = {
    val ts = tokens(text)
    val stops = array(Stopwords.map(lit): _*)
    when(size(ts) === 0, lit(0.0)).otherwise(
      size(filter(ts, t => array_contains(stops, t))).cast("double") /
        size(ts).cast("double"))
  }

  /** Composite quality score in [0,1]: rewards moderate length, low
    * punctuation density, and some stopword presence — the standard
    * cheap pre-filter shape for LLM training corpora. */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast("double") / 200.0, lit(1.0))
    val punctScore = greatest(lit(0.0), lit(1.0) - punctRatio(text) * 5.0)
    val stopScore = least(stopwordRatio(text) * 5.0, lit(1.0))
    (lenScore + punctScore + stopScore) / 3.0
  }

  /** Per-language marker words for the n-gram/keyword language-ID
    * heuristic. Scores = marker-hit counts; argmax wins, `und` when no
    * marker matches. */
  val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "de", "et", "les"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  /** Keyword-score language ID. Deterministic tie-break: language name
    * ascending (struct max compares score first, then inverted name). */
  def langId(text: Column): Column = {
    val ts = tokens(text)
    val scored = LangMarkers.toSeq.sortBy(_._1).map { case (lang, markers) =>
      val m = array(markers.map(lit): _*)
      struct(
        size(filter(ts, t => array_contains(m, t))).as("score"),
        lit(lang).as("lang"))
    }
    val best = scored.reduce((a, b) => when(b("score") > a("score"), b).otherwise(a))
    when(best("score") === 0, lit("und")).otherwise(best("lang"))
  }

  /** Character-level polynomial rolling hash over the whitespace-normalized,
    * lower-cased text: `h = (h*131 + codepoint) mod 1e9+7`, seed 7 —
    * order-sensitive, so it distinguishes permuted documents (unlike
    * bag-of-words hashes). Expressed over primitives every SQL engine
    * shares (character codepoints + modular arithmetic), so an external
    * oracle can replay it exactly; the modulus keeps `h*131 + c` far
    * below Long overflow. */
  def rollingFingerprint(text: Column): Column = {
    val p = lit(1000000007L)
    val norm = Dedup.normalize(text)
    when(length(norm) === 0, lit(7L)).otherwise(
      aggregate(split(norm, ""), lit(7L),
        (h, c) => pmod(h * 131L + ascii(c), p)))
  }
}
