package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text search over a TEXTTYPE attribute — the capability the
  * reference delegates wholesale to Solr
  * (`/root/reference/src/main/scala/org/vitrivr/adampro/storage/engine/SolrEngine.scala:31`,
  * queried through `apache.solr` handler attributes), re-expressed as
  * native Spark relational algebra so it scales with the cluster instead
  * of a sidecar search service:
  *
  *  - boolean term match (ALL/ANY) is a pure Catalyst array predicate on
  *    the scan — no join, no index, whole-stage codegen'd;
  *  - phrase match tests token adjacency with HOF position arithmetic;
  *  - ranked retrieval builds posting lists (one explode + hash agg) and
  *    scores BM25 with a broadcast of the (tiny) query-term statistics;
  *    the per-doc score is a map-side partial sum and the top-k plans as
  *    TakeOrderedAndProject.
  */
object TextSearch {

  /** Posting lists `(term, doc_id, tf, positions)` — the inverted-index
    * relation. Positions are kept for phrase/proximity scoring. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "term")))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).as("tf"), sort_array(collect_list(col("pos"))).as("positions"))

  private def toks(textCol: String): Column = TextAnalysis.tokens(col(textCol))

  /** Docs containing every query term (Solr `q=+a +b`). */
  def matchAll(docs: DataFrame, textCol: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    docs.filter(terms.map(t => array_contains(toks(textCol), t.toLowerCase(java.util.Locale.ROOT))).reduce(_ && _))
  }

  /** Docs containing at least one query term (Solr `q=a b`). */
  def matchAny(docs: DataFrame, textCol: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    docs.filter(terms.map(t => array_contains(toks(textCol), t.toLowerCase(java.util.Locale.ROOT))).reduce(_ || _))
  }

  /** Docs containing the exact phrase (adjacent tokens, in order).
    * Because tokens are exactly the `\s+`-split of the lower-cased text,
    * token adjacency ≡ a regex hit on the whitespace-normalized string —
    * and `rlike` is codegen'd, unlike a HOF walk over token positions
    * (interpreted, ~5× slower at corpus scale). Phrase terms are
    * regex-quoted. */
  def phraseMatch(docs: DataFrame, textCol: String, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val quoted = phrase.map(t => java.util.regex.Pattern.quote(t.toLowerCase(java.util.Locale.ROOT)))
    docs.filter(Dedup.normalize(col(textCol))
      .rlike("(^| )" + quoted.mkString(" ") + "( |$)"))
  }

  /** THE BM25 per-posting contribution, over columns `tf`, `df`, `dl`
    * — one definition shared by the scan-time scorer below and the
    * index-served [[graft.sources.FullTextStore]], so the spec-asserted
    * bit-parity between the two paths cannot drift under a k1/b or
    * smoothing tweak. */
  private[graft] def bm25Contrib(n: Long, avgdl: Double,
                                 k1: Double, b: Double): Column = {
    val idf = log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5))
    idf * (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl))
  }

  /** BM25 scores `(doc_id, score)` for every document matching ≥1 query
    * term: postings filtered to the query terms, document-frequency stats
    * broadcast back in, per-doc partial-summed score. Two jobs total
    * (corpus-size scalars + the scoring pass) for any corpus size. */
  def bm25Scores(docs0: DataFrame, idCol: String, textCol: String, terms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    val lowered = terms.map(_.toLowerCase(java.util.Locale.ROOT))
    // NOT fanned out (r21 A/B): the posting branches shuffle right after
    // tokenization anyway, so an up-front repartition only adds an
    // exchange (battery +0.7 s) — unlike the signature-kernel operators
    val docs = docs0
    val lens = docs.select(col(idCol).as("doc_id"), size(toks(textCol)).as("dl"))
    val corpus = lens.agg(count(lit(1)).as("n"), avg("dl").as("avgdl")).head()
    val n = corpus.getLong(0)
    if (n == 0) // avg(dl) of zero rows is null — return the empty frame
      return docs.sparkSession.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0.0).as("score"))
    val avgdl = corpus.getDouble(1)

    // document frequency as ONE window count over the term-filtered
    // postings: the former aggregate + broadcast-join-back re-ran the
    // whole corpus-scan + tokenize + explode + aggregate subtree under
    // the df branch (differing parent projections defeat ReuseExchange),
    // so the corpus was read and tokenized twice per query. The window
    // shuffles only the TINY term-bounded posting rows (per-term row
    // counts are the df), at any corpus size.
    val posts = postings(docs, idCol, textCol).filter(col("term").isin(lowered: _*))
    posts.withColumn("df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("term")))
      .join(lens, "doc_id")
      .withColumn("contrib", bm25Contrib(n, avgdl, k1, b))
      .groupBy("doc_id")
      .agg(sum("contrib").as("score"))
  }

  /** BM25F — fielded ranked retrieval with per-field boosts (the Solr
    * `qf`-boost role: "title hits count double"): per-field term
    * frequencies and field lengths combine UNDER the weights BEFORE
    * saturation (`tf' = Σ w_f·tf_f`, `dl' = Σ w_f·len_f`), the
    * principled fielded extension (Robertson et al., CIKM 2004) —
    * boosting AFTER saturation would let k1 cap a heavily-boosted
    * title hit at the same ceiling as a body hit. Same two-job shape
    * and the same shared [[bm25Contrib]] scoring expression as the
    * single-field scorer; one explode+aggregate per field. */
  def bm25fScores(docs0: DataFrame, idCol: String, fields: Seq[(String, Double)],
                  terms: Seq[String],
                  k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(fields.nonEmpty, "at least one field required")
    fields.foreach { case (f, w) => require(w > 0, s"field $f weight must be positive") }
    require(terms.nonEmpty, "empty term list")
    val lowered = terms.map(_.toLowerCase(java.util.Locale.ROOT))
    // NOT fanned out — same A/B evidence as bm25Scores (battery +1.3 s)
    val docs = docs0
    val dlExpr = fields.map { case (f, w) =>
      size(TextAnalysis.tokens(col(f))) * w }.reduce(_ + _)
    val lens = docs.select(col(idCol).as("doc_id"), dlExpr.cast("double").as("dl"))
    val corpus = lens.agg(count(lit(1)).as("n"), avg("dl").as("avgdl")).head()
    val n = corpus.getLong(0)
    if (n == 0)
      return docs.sparkSession.emptyDataFrame
        .select(lit(0L).as("doc_id"), lit(0.0).as("score"))
    val avgdl = corpus.getDouble(1)
    // same single-pass df as [[bm25Scores]] (window count over the tiny
    // term-bounded postings): the per-field explode/aggregate union
    // otherwise re-runs once under the df stats and once under the
    // scoring join (2 FileScans per field)
    val posts = fields.map { case (f, w) =>
      docs.select(col(idCol).as("doc_id"),
          explode(TextAnalysis.tokens(col(f))).as("term"))
        .filter(col("term").isin(lowered: _*))
        .groupBy("term", "doc_id").agg((count(lit(1)) * w).as("wtf"))
    }.reduce(_ unionByName _)
      .groupBy("term", "doc_id").agg(sum("wtf").cast("double").as("tf"))
    posts.withColumn("df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("term")))
      .join(lens, "doc_id")
      .withColumn("contrib", bm25Contrib(n, avgdl, k1, b))
      .groupBy("doc_id")
      .agg(sum("contrib").as("score"))
  }

  /** Ranked retrieval: BM25 top-k, `TakeOrderedAndProject` plan shape. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String, terms: Seq[String],
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scores(docs, idCol, textCol, terms, k1, b)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)

  /** Reciprocal Rank Fusion of two bounded rankings:
    * rrf(d) = Σ 1/(k0 + rank_d), summing only over the lists d appears
    * in — the standard calibration-free way to merge a lexical (BM25)
    * and a vector (cosine) ranking into one hybrid retrieval result.
    * Inputs carry (`idCol`, `rank`); both are expected PRE-BOUNDED to
    * their top-n (ranking a corpus globally would funnel it through one
    * partition — rank AFTER a TakeOrdered top-k, so the window sees k
    * rows). The full-outer join touches ≤ |a|+|b| rows; k0 = 60 per the
    * original RRF paper. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k0: Int = 60): DataFrame = {
    val ar = a.select(col(idCol), col("rank").as("__rank_a"))
    val br = b.select(col(idCol), col("rank").as("__rank_b"))
    ar.join(br, Seq(idCol), "full_outer")
      .select(col(idCol),
        (coalesce(lit(1.0) / (lit(k0) + col("__rank_a")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(k0) + col("__rank_b")), lit(0.0))).as("rrf"))
  }
}
