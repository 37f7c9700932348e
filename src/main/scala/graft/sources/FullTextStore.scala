package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, TextSearch}

/** Persisted full-text index layout — the role the reference delegates
  * wholesale to Solr (`/root/reference/src/main/scala/org/vitrivr/adampro/storage/engine/SolrEngine.scala:31`,
  * a sidecar search service fed through handler attributes), kept
  * Spark-native as a SECONDARY INDEX LAYOUT instead:
  *
  *  - posting lists `(term, doc_id, tf, positions)` land as parquet
  *    PARTITIONED BY a term-hash bucket, so a query's term lookups read
  *    `|terms|/nBuckets` of the directories via Catalyst partition
  *    pruning — the same mechanism as the embedded KV handler's
  *    bucket-pruned point lookups, applied to text;
  *  - document lengths and the corpus scalars (N, avgdl) are write-time
  *    artifacts, so BM25 serving never re-tokenizes or re-scans the
  *    corpus — the build is one O(corpus) pass, queries touch postings
  *    of the query terms only;
  *  - scoring replays [[TextSearch.bm25Scores]]'s exact formula over
  *    the stored relations, so fresh-scan and index-served rankings
  *    agree (spec-asserted) and the same DuckDB replay oracles both.
  *
  * At 100 TB: the postings build shuffles (term, doc) pairs once;
  * lookups are partition-pruned scans independent of corpus width;
  * nothing collects driver-side but the two corpus scalars.
  */
object FullTextStore {

  final case class Stats(n: Long, avgdl: Double, nBuckets: Int)

  private def bucketOf(term: Column, nBuckets: Int): Column =
    pmod(xxhash64(term), lit(nBuckets.toLong))

  /** One O(corpus) build pass: bucketed postings + lengths + stats. */
  def write(spark: SparkSession, dir: String, docs: DataFrame,
            idCol: String, textCol: String, nBuckets: Int = 64): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    TextSearch.postings(docs, idCol, textCol)
      .withColumn("ap_bucket", bucketOf(col("term"), nBuckets))
      .write.partitionBy("ap_bucket").mode("overwrite").parquet(s"$dir/postings")
    val lens = docs.select(col(idCol).as("doc_id"),
      size(TextAnalysis.tokens(col(textCol))).as("dl"))
    lens.write.mode("overwrite").parquet(s"$dir/lengths")
    val c = lens.agg(count(lit(1)).as("n"), avg("dl").as("avgdl")).head()
    val n = c.getLong(0)
    val avgdl = if (n == 0) 0.0 else c.getDouble(1)
    // Double.toString round-trips the exact value, so index-served BM25
    // uses bit-identical corpus scalars to a fresh scan
    java.nio.file.Files.writeString(java.nio.file.Paths.get(dir).resolve("stats.json"),
      s"""{"n":$n,"avgdl":$avgdl,"nBuckets":$nBuckets}""")
  }

  def stats(dir: String): Stats = {
    val s = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir).resolve("stats.json"))
    def field(k: String): String =
      s.split(s""""$k":""")(1).takeWhile(c => c != ',' && c != '}')
    Stats(field("n").toLong, field("avgdl").toDouble, field("nBuckets").toInt)
  }

  def exists(dir: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir).resolve("stats.json"))

  def drop(dir: String): Unit =
    graft.core.Entity.deleteRecursively(java.nio.file.Paths.get(dir))

  /** Postings of the query terms — a bucket-pruned parquet read: the
    * `ap_bucket IN (...)` predicate is a partition filter (directory
    * skip, no data IO for other buckets), `term IN (...)` pushes to the
    * row groups inside the surviving buckets. */
  private def emptyPostings(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      StructType(Seq(StructField("term", StringType), StructField("doc_id", LongType),
        StructField("tf", LongType),
        StructField("positions", ArrayType(IntegerType)),
        StructField("ap_bucket", LongType))))
  }

  def termPostings(spark: SparkSession, dir: String, terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "empty term list")
    val st = stats(dir)
    // an empty corpus writes a file-less postings dir parquet cannot
    // infer a schema from — serve the typed empty relation instead
    if (st.n == 0) return emptyPostings(spark)
    val lowered = terms.map(_.toLowerCase).distinct
    // the bucket of each literal term is a FOLDABLE expression — the
    // optimizer folds it to a constant, so this is a partition filter
    // (directory skip), never a per-row hash of the scan
    val bucketPred = lowered.map(t =>
      col("ap_bucket") === bucketOf(lit(t), st.nBuckets)).reduce(_ || _)
    spark.read.parquet(s"$dir/postings")
      .filter(bucketPred && col("term").isin(lowered: _*))
  }

  /** Doc ids containing EVERY query term, served from the index alone
    * (posting intersection via a distinct-term count — one aggregation,
    * no self-join chain). */
  def matchAll(spark: SparkSession, dir: String, terms: Seq[String]): DataFrame = {
    val lowered = terms.map(_.toLowerCase).distinct
    termPostings(spark, dir, lowered)
      .groupBy("doc_id")
      .agg(countDistinct(col("term")).as("ap_nt"))
      .filter(col("ap_nt") === lowered.size)
      .select("doc_id")
  }

  /** BM25 scores served from the persisted layout — the exact
    * [[TextSearch.bm25Scores]] formula over stored tf/df/dl/N/avgdl. */
  def bm25Scores(spark: SparkSession, dir: String, terms: Seq[String],
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val st = stats(dir)
    if (st.n == 0)
      return spark.emptyDataFrame.select(lit(0L).as("doc_id"), lit(0.0).as("score"))
    val posts = termPostings(spark, dir, terms)
    val dfreq = posts.groupBy("term").agg(count(lit(1)).as("df"))
    val lens = spark.read.parquet(s"$dir/lengths")
    posts.join(broadcast(dfreq), "term")
      .join(lens, "doc_id")
      // the ONE shared scoring expression — bit-parity with the
      // scan-time path by construction
      .withColumn("contrib", TextSearch.bm25Contrib(st.n, st.avgdl, k1, b))
      .groupBy("doc_id")
      .agg(sum("contrib").as("score"))
  }

  /** Doc ids containing AT LEAST ONE query term, from the index. */
  def matchAny(spark: SparkSession, dir: String, terms: Seq[String]): DataFrame =
    termPostings(spark, dir, terms).select("doc_id").distinct()

  /** Docs containing the exact phrase (adjacent tokens, in order),
    * served from the STORED POSITIONS — no text access: start with the
    * first term's position set per doc, then for each following term
    * keep positions that extend a run (`p ∈ pos(tᵢ)` with `p−1` in the
    * running set), via one broadcast-sized join per phrase term. Phrase
    * length is tiny and constant; every join is posting-bounded. */
  def phraseMatch(spark: SparkSession, dir: String, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val lowered = phrase.map(_.toLowerCase)
    val posts = termPostings(spark, dir, lowered.distinct)
      .select(col("term"), col("doc_id"), col("positions"))
    def of(t: String, alias: String): DataFrame =
      posts.filter(col("term") === t)
        .select(col("doc_id"), col("positions").as(alias))
    // ap_run = positions where a run of the phrase-so-far ENDS
    val seed = of(lowered.head, "ap_run")
    val ended = lowered.drop(1).foldLeft(seed) { (acc, t) =>
      acc.join(of(t, "ap_next"), "doc_id")
        .select(col("doc_id"),
          filter(col("ap_next"),
            p => array_contains(col("ap_run"), p - 1)).as("ap_run"))
        .filter(size(col("ap_run")) > 0)
    }
    ended.select("doc_id").distinct()
  }

  /** Ranked retrieval from the index: BM25 top-k, TakeOrdered shape. */
  def bm25TopK(spark: SparkSession, dir: String, terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25Scores(spark, dir, terms, k1, b)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
}
