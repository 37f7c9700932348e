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

  /** Per-document repetition signals (the Gopher-style quality filters):
    * duplicate-token fraction, most-frequent-token share, and duplicate
    * bigram fraction. Shuffle-based (explode → count per (doc, gram) →
    * re-aggregate per doc) rather than per-row HOF counting: at scale the
    * per-row alternative is O(tokens²) in the interpreted-lambda engine,
    * while this shape is standard map-side-combined aggregation over
    * O(total grams) rows. Tokens and bigrams ride ONE tagged explode
    * (tag 0 = token, tag 1 = bigram), so the input is scanned and
    * tokenized once and the whole computation is two shuffles — (id, tag,
    * gram) counts, then per-id stats via conditional aggregates — plus
    * the small id-spine join, which reuses the second shuffle's hash
    * partitioning. Docs with fewer than 2 tokens get bigram fraction 0.
    * Every DISTINCT input id (including NULL) appears exactly once in the
    * output — rows sharing an id are merged into one logical document,
    * and the spine join is null-safe so null-id docs keep their real
    * stats. Null-text and empty-text docs (zero tokens after empty-token
    * filtering) report token_cnt 0 and all-zero fractions.
    *
    * Output: (id, token_cnt, dup_token_frac, top_token_frac,
    * dup_bigram_frac), fractions rounded to 4.
    */
  def repetitionSignals(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val ids = df.select(col(idCol).as("id")).distinct()
    val toksCol = filter(tokens(col(textCol)), t => length(t) > 0)
    // one O(tokens) kernel pass — a pure-HOF gram build re-evaluates the
    // token subtree per element (no CSE on interpreted lambdas): O(n²)
    val gram = df.select(col(idCol).as("id"),
        explode(graft.functions.TextStats.taggedGrams(toksCol)).as("tg"))
      .select(col("id"), col("tg.tag").as("tag"), col("tg.g").as("g"))
    val stats = gram.groupBy("id", "tag", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("id").agg(
        sum(when(col("tag") === 0, col("cnt"))).as("token_cnt"),
        count(when(col("tag") === 0, lit(1))).as("distinct_toks"),
        max(when(col("tag") === 0, col("cnt"))).as("top_cnt"),
        sum(when(col("tag") === 1, col("cnt"))).as("bigram_cnt"),
        count(when(col("tag") === 1, lit(1))).as("distinct_bigrams"))
    // <=> (null-safe equality) so the null-id group joins its stats back;
    // stats-side key renamed to keep the joined plan unambiguous
    ids
      .join(stats.withColumnRenamed("id", "__st_id"),
        col("id") <=> col("__st_id"), "left")
      .select(col("id"),
        coalesce(col("token_cnt"), lit(0L)).as("token_cnt"),
        coalesce(round((col("token_cnt") - col("distinct_toks")).cast("double") /
          col("token_cnt"), 4), lit(0.0)).as("dup_token_frac"),
        coalesce(round(col("top_cnt").cast("double") / col("token_cnt"), 4),
          lit(0.0)).as("top_token_frac"),
        coalesce(round((col("bigram_cnt") - col("distinct_bigrams")).cast("double") /
          col("bigram_cnt"), 4), lit(0.0)).as("dup_bigram_frac"))
  }

  /** Overlapping text chunks for embedding/RAG pipelines: token windows
    * of `window` tokens advancing by `stride` (< window ⇒ overlap), the
    * final partial window kept so no tail text is lost. Explode-first
    * like [[Dedup.repeatedChunks]] — no HOF re-evaluation. Output:
    * (id, chunk_idx, chunk_text, n_tokens). */
  def chunkText(df: DataFrame, textCol: String, idCol: String,
                window: Int = 128, stride: Int = 96): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    // tokenize + per-chunk slice/join is a pure projection pipeline —
    // nothing downstream ever repartitions, so on a narrow scan the
    // whole kernel serializes (r22: 1.8 s wall at 2.0 CPU-s on one
    // split). Fan out the (id, text) rows first; no-op at scale.
    val withToks = graft.core.Parallelism.fanOut(df, col(idCol))
      .select(col(idCol).as("id"),
        filter(tokens(col(textCol)), t => length(t) > 0).as("t"))
      .filter(size(col("t")) > 0)
    // last start: largest multiple of stride < size (so a doc shorter
    // than `window` still emits its one partial chunk, and no chunk
    // starts past the end)
    withToks
      .select(col("id"), col("t"),
        explode(sequence(lit(0),
          greatest(ceil(size(col("t")).cast("double") / stride).cast("long") - 1, lit(0L)) * stride,
          lit(stride))).as("s"))
      .filter(col("s") < size(col("t")))
      .select(col("id"), (col("s") / stride).cast("long").as("chunk_idx"),
        array_join(slice(col("t"), col("s") + 1, lit(window)), " ").as("chunk_text"),
        least(lit(window), size(col("t")) - col("s")).cast("long").as("n_tokens"))
  }

  /** Hashing-trick featurization (the HashingTF / fastText input shape):
    * token counts folded into `dim` buckets through the portable
    * SQL-replayable key hash. Output `(id, features array<long>)` —
    * dense counts, every bucket present. The distributed shape is
    * explode → (id, bucket) count → per-doc map fold; only (id, bucket,
    * count) triples shuffle, never the text. Zero-token docs are
    * absent (no features to emit). */
  def hashFeatures(df: DataFrame, textCol: String, idCol: String,
                   dim: Int = 64): DataFrame = {
    require(dim > 0, "dim must be positive")
    val tk = df.select(col(idCol).as("id"),
      explode(filter(tokens(col(textCol)), t => length(t) > 0)).as("tok"))
    tk.select(col("id"), pmod(Sampling.keyHash(col("tok")), lit(dim.toLong)).as("idx"))
      .groupBy("id", "idx").agg(count(lit(1)).as("cnt"))
      .groupBy("id")
      .agg(map_from_entries(collect_list(struct(col("idx"), col("cnt")))).as("m"))
      .select(col("id"), transform(sequence(lit(0), lit(dim - 1)),
        i => coalesce(element_at(col("m"), i.cast("long")), lit(0L))).as("features"))
  }

  /** Per-document unigram LM score: mean −ln p(token) under the corpus's
    * OWN unigram distribution — the deterministic proxy for CCNet-style
    * LM perplexity filtering (outlier docs whose tokens are rare in the
    * corpus score high and get reviewed/dropped; boilerplate scores low).
    *
    * Scale shape: one explode of token instances, a token-keyed count
    * (map-side combined), the scalar total broadcast, then a token-keyed
    * join back and a per-doc average — two shuffles over token keys, the
    * canonical frequency-join shape. No vocabulary ever collects to the
    * driver. Docs with zero tokens are absent from the output (no
    * instances to average). */
  def unigramLogPerplexity(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("id"),
      explode(filter(tokens(col(textCol)), t => length(t) > 0)).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum("cnt").as("total"))
    toks.join(freq, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy("id")
      .agg(round(avg(-log(col("cnt") / col("total"))), 4).as("log_ppl"))
  }

  /** Unicode-SCRIPT profile per row — multilingual-corpus triage: how
    * many Latin / Cyrillic / Han / Arabic letters and ASCII digits a
    * document contains, plus the dominant script (count order, fixed
    * tie preference latin > cyrillic > han > arabic). Routing by script
    * is the step BEFORE language ID in a multilingual pipeline: a
    * Cyrillic doc never needs the Latin-alphabet language models, and
    * mixed-script spam (Latin text stuffed with Han SEO tokens) shows
    * up as a profile, not a single label. Pure per-row regex counting —
    * zero shuffle, rides the scan under codegen. */
  def scriptProfile(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val t = col(textCol)
    def cnt(re: String): Column = length(t) - length(regexp_replace(t, re, ""))
    val lat = cnt("\\p{IsLatin}")
    val cyr = cnt("\\p{IsCyrillic}")
    val han = cnt("\\p{IsHan}")
    val ara = cnt("\\p{IsArabic}")
    val dig = cnt("[0-9]")
    df.select(col(idCol).as("id"),
      lat.as("n_latin"), cyr.as("n_cyrillic"), han.as("n_han"),
      ara.as("n_arabic"), dig.as("n_digit"),
      when(lat >= cyr && lat >= han && lat >= ara, "latin")
        .when(cyr >= han && cyr >= ara, "cyrillic")
        .when(han >= ara, "han")
        .otherwise("arabic").as("dominant"))
  }

  /** Adaptive per-group length-band filter: keep rows whose length lies
    * inside the group's `[lo, hi]` QUANTILE band — the data-driven form
    * of a fixed "drop under 200 / over 20000 chars" rule, which no
    * single constant gets right when sources mix code, chat, and web
    * prose. Quantiles are the exact interpolated `rank = p·(n−1)`
    * definition both engines share.
    *
    * Scale shape: one tiny per-group aggregate (|groups| rows) is
    * broadcast back onto the scan; the corpus itself never shuffles.
    * Integer lengths never sit ON an interpolated band value (the band
    * is either exactly a data point or strictly between two), so the
    * float comparison is engine-portable despite unrounded quantiles. */
  def adaptiveLengthFilter(df: DataFrame, lenCol: String, groupCol: String,
                           lo: Double = 0.1, hi: Double = 0.9): DataFrame = {
    require(lo >= 0.0 && hi <= 1.0 && lo < hi,
      s"need 0 <= lo < hi <= 1, got [$lo, $hi]")
    val bands = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($lenCol, $lo)").as("__lo"),
        expr(s"percentile($lenCol, $hi)").as("__hi"))
    df.join(broadcast(bands), Seq(groupCol))
      .where(col(lenCol) >= col("__lo") && col(lenCol) <= col("__hi"))
      .drop("__lo", "__hi")
  }

  /** Cross-corpus n-gram NOVELTY per document: the fraction of the
    * doc's DISTINCT n-gram shingles that appear in no other document —
    * 1.0 is fully original text, 0.0 is boilerplate assembled entirely
    * from shared fragments. Complements [[repetitionSignals]]
    * (within-doc repetition) and [[graft.operators.Dedup.repeatedChunks]]
    * (verbatim cross-doc windows) with a graded cross-doc originality
    * score. Emits `(id, n_shingles, novelty)`.
    *
    * Scale shape: the exploded (doc, shingle) stream crosses the wire
    * ONCE, into the shingle-keyed frequency count — a df=1 shingle
    * belongs to exactly ONE document, so that count carries its owner
    * (`max(id)` is exact precisely when df=1) and the novel counts
    * regroup by owner. The per-doc DENOMINATOR never touches the
    * exploded stream at all: it is `size(shingles(text))`, a per-row
    * expression that rides the scan — so the doc-keyed side of the
    * final join is doc-sized on both inputs. Text never shuffles.
    * `novel/n` over exact integers is exact IEEE arithmetic, so the
    * rounded score is engine-portable with no float-order caveat. */
  def ngramNovelty(df: DataFrame, textCol: String, idCol: String,
                   n: Int = 3): DataFrame = {
    require(n > 0, s"shingle size must be positive, got $n")
    val sh = df.select(col(idCol).as("id"),
      explode(Dedup.shingles(col(textCol), n)).as("shingle"))
    val novel = sh.groupBy("shingle")
      .agg(count(lit(1)).as("df"), max(col("id")).as("id"))
      .where(col("df") === 1)
      .groupBy("id").agg(count(lit(1)).as("novel"))
    df.select(col(idCol).as("id"),
        size(Dedup.shingles(col(textCol), n)).cast("long").as("__ns"))
      .groupBy("id").agg(sum("__ns").as("n_shingles"))
      .join(novel, Seq("id"), "left")
      .select(col("id"), col("n_shingles"),
        round(coalesce(col("novel"), lit(0L)).cast("double") / col("n_shingles"), 4)
          .as("novelty"))
  }

  /** Interpolated BIGRAM language-model score per document — the
    * KenLM-style upgrade of [[unigramLogPerplexity]]: each token is
    * scored by `λ·P(w|prev) + (1−λ)·P(w)` with a `<s>` BOS context for
    * the first token, so boilerplate that repeats the corpus's common
    * TRANSITIONS (not just its common words) scores as low-perplexity.
    * Emits `(id, log_ppl)` with the per-doc average negative log
    * probability rounded to 4 decimals.
    *
    * Scale shape: one O(tokens) per-row zip builds `(prev, tok)` pairs,
    * then the token stream crosses the wire EXACTLY ONCE — a map-side-
    * combined groupBy to per-doc `(id, prev, tok, m)` multiplicities,
    * eagerly materialized ([[graft.core.Materialize]]) because FOUR
    * branches consume it (bigram/context/unigram tables + the scoring
    * probe) and their differing pushed null-filters make the branches
    * non-canonical, so Catalyst's ReuseExchange cannot dedupe them — an
    * un-materialized plan re-reads and re-explodes the corpus 4×.
    * Everything downstream re-aggregates that (much smaller) relation:
    * the bigram table derives from it, the context and unigram tables
    * derive from the bigram table (not from the raw stream), the scalar
    * total broadcasts, and the key-equi joins probe multiplicities
    * rather than raw pairs. The per-doc mean is the m-weighted mean —
    * identical value, fraction of the rows. No vocabulary or transition
    * table ever collects to the driver; the model "build" and "scoring"
    * are one plan. Docs with zero tokens are absent from the output. */
  def bigramLogPerplexity(df: DataFrame, textCol: String, idCol: String,
                          lambda: Double = 0.7): DataFrame = {
    require(lambda > 0.0 && lambda < 1.0,
      s"interpolation weight must be in (0,1), got $lambda")
    val toks = df.select(col(idCol).as("id"),
      filter(tokens(col(textCol)), t => length(t) > 0).as("t"))
      .where(size(col("t")) > 0)
    // (prev, tok) pairs with a BOS sentinel: zip(["<s>"] ++ t[0..n-2], t)
    val pairs = toks.select(col("id"),
      explode(arrays_zip(
        concat(array(lit("<s>")), slice(col("t"), lit(1), size(col("t")) - 1))
          .as("prev"),
        col("t").as("tok"))).as("p"))
      .select(col("id"), col("p.prev").as("prev"), col("p.tok").as("tok"))
    val grouped = graft.core.Materialize(
      pairs.groupBy("id", "prev", "tok").agg(count(lit(1)).as("m")))
    val big = grouped.groupBy("prev", "tok").agg(sum("m").as("bc"))
    val ctx = big.groupBy("prev").agg(sum("bc").as("cc"))
    val uni = big.groupBy("tok").agg(sum("bc").as("uc"))
    val total = uni.agg(sum("uc").as("total"))
    // (1.0 - lit(lambda)) mirrors the oracle's (1.0 - CAST(λ AS DOUBLE))
    // exactly — a decimal-parsed 0.3 literal would differ in the last ulp.
    val prob = lit(lambda) * col("bc") / col("cc") +
      (lit(1.0) - lit(lambda)) * col("uc") / col("total")
    grouped.join(big, Seq("prev", "tok")).join(ctx, Seq("prev"))
      .join(uni, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy("id")
      .agg(round(sum(col("m") * -log(prob)) / sum(col("m")), 4).as("log_ppl"))
  }

  /** Per-ROW repetition signals — the zero-shuffle scale path of
    * [[repetitionSignals]] for the normal corpus layout where each row is
    * its own document. One codegen'd hash-map pass per row
    * ([[graft.functions.RepetitionStatsExpr]]): no explode, no shuffle,
    * no join — the stats collapse into the scan, so at 100 TB this is a
    * pure map stage. Emits one output row PER INPUT ROW with the id
    * passed through verbatim (duplicate ids are NOT merged — use
    * [[repetitionSignals]] when same-id rows form one logical document).
    * Output schema and values are identical to [[repetitionSignals]] on
    * unique-id input (spec-asserted). */
  def repetitionSignalsPerRow(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val st = graft.functions.TextStats.repetitionStats(
      filter(tokens(col(textCol)), t => length(t) > 0))
    def frac(num: Column, den: Column): Column =
      coalesce(when(den === 0, lit(0.0))
        .otherwise(round(num.cast("double") / den, 4)), lit(0.0))
    df.select(col(idCol).as("id"), st.as("st"))
      .select(col("id"),
        coalesce(col("st.token_cnt"), lit(0L)).as("token_cnt"),
        frac(col("st.token_cnt") - col("st.distinct_toks"),
          col("st.token_cnt")).as("dup_token_frac"),
        frac(col("st.top_cnt"), col("st.token_cnt")).as("top_token_frac"),
        frac(col("st.bigram_cnt") - col("st.distinct_bigrams"),
          col("st.bigram_cnt")).as("dup_bigram_frac"))
  }

  /** PII patterns — deliberately simple cross-dialect regexes (Java
    * `util.regex` on the Spark side, RE2 in typical external engines):
    * email, NANP-style phone, dotted-quad IPv4. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** Count of matches of `pattern` in the text. */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Replace email/phone/IPv4 matches with typed redaction markers —
    * applied in fixed order (email, phone, ip) so engines replaying the
    * same order agree byte-for-byte. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>"),
      Ipv4Re, "<IP>")

  /** Doc-level quality-filter verdicts: composes [[qualityScore]],
    * [[repetitionSignals]], and the PII counters into a keep/drop decision
    * with a reason — the standard "why was this document dropped"
    * audit column of an LLM-data pipeline. Rules check in fixed order
    * (quality floor, duplicate-token ceiling, top-token ceiling,
    * duplicate-bigram ceiling, PII ceiling); `reason` is the FIRST failing
    * rule, `ok` when all pass, `keep = (reason == 'ok')`.
    *
    * One row per distinct id (rows sharing an id merge, as in
    * [[repetitionSignals]]; quality/PII for a merged id come from `min`/
    * `sum` over its rows so the verdict is deterministic). Scale shape:
    * the per-row columns are pure codegen; the only shuffles are
    * repetitionSignals' two aggregations plus the id join.
    */
  def qualityVerdicts(df: DataFrame, textCol: String, idCol: String,
                      minQuality: Double, maxDupTokenFrac: Double,
                      maxTopTokenFrac: Double, maxDupBigramFrac: Double,
                      maxPii: Int): DataFrame = {
    val pii = piiCount(col(textCol), EmailRe) + piiCount(col(textCol), PhoneRe) +
      piiCount(col(textCol), Ipv4Re)
    val base = df.groupBy(col(idCol).as("id")).agg(
      round(min(qualityScore(col(textCol))), 4).as("quality"),
      sum(pii.cast("long")).as("pii_cnt"))
    val rep = repetitionSignals(df, textCol, idCol)
      .withColumnRenamed("id", "__rep_id")
    base.join(rep, col("id") <=> col("__rep_id"), "left").drop("__rep_id")
      .withColumn("reason",
        when(col("quality") < minQuality, "low_quality")
          .when(col("dup_token_frac") > maxDupTokenFrac, "dup_tokens")
          .when(col("top_token_frac") > maxTopTokenFrac, "top_token")
          .when(col("dup_bigram_frac") > maxDupBigramFrac, "dup_bigrams")
          .when(col("pii_cnt") > maxPii, "pii")
          .otherwise("ok"))
      .withColumn("keep", col("reason") === "ok")
      .select("id", "quality", "token_cnt", "dup_token_frac", "top_token_frac",
        "dup_bigram_frac", "pii_cnt", "keep", "reason")
  }

  /** Per-ROW quality-filter verdicts — the zero-shuffle scale path of
    * [[qualityVerdicts]] for unique-id corpora, built on the
    * [[repetitionSignalsPerRow]] kernel: every column (quality score, PII
    * counters, repetition stats, verdict) is a pure codegen expression,
    * so the whole filter is a map stage over the scan — the shape you
    * want for the first pass over 100 TB of raw crawl. One output row per
    * input row (duplicate ids NOT merged). Schema and values match
    * [[qualityVerdicts]] on unique-id input (spec-asserted). */
  def qualityVerdictsPerRow(df: DataFrame, textCol: String, idCol: String,
                            minQuality: Double, maxDupTokenFrac: Double,
                            maxTopTokenFrac: Double, maxDupBigramFrac: Double,
                            maxPii: Int): DataFrame = {
    val st = graft.functions.TextStats.repetitionStats(
      filter(tokens(col(textCol)), t => length(t) > 0))
    val pii = (piiCount(col(textCol), EmailRe) + piiCount(col(textCol), PhoneRe) +
      piiCount(col(textCol), Ipv4Re)).cast("long")
    def frac(num: Column, den: Column): Column =
      coalesce(when(den === 0, lit(0.0))
        .otherwise(round(num.cast("double") / den, 4)), lit(0.0))
    df.select(col(idCol).as("id"),
        round(qualityScore(col(textCol)), 4).as("quality"),
        pii.as("pii_cnt"), st.as("st"))
      .select(col("id"), col("quality"),
        coalesce(col("st.token_cnt"), lit(0L)).as("token_cnt"),
        frac(col("st.token_cnt") - col("st.distinct_toks"),
          col("st.token_cnt")).as("dup_token_frac"),
        frac(col("st.top_cnt"), col("st.token_cnt")).as("top_token_frac"),
        frac(col("st.bigram_cnt") - col("st.distinct_bigrams"),
          col("st.bigram_cnt")).as("dup_bigram_frac"),
        col("pii_cnt"))
      .withColumn("reason",
        when(col("quality") < minQuality, "low_quality")
          .when(col("dup_token_frac") > maxDupTokenFrac, "dup_tokens")
          .when(col("top_token_frac") > maxTopTokenFrac, "top_token")
          .when(col("dup_bigram_frac") > maxDupBigramFrac, "dup_bigrams")
          .when(col("pii_cnt") > maxPii, "pii")
          .otherwise("ok"))
      .withColumn("keep", col("reason") === "ok")
      .select("id", "quality", "token_cnt", "dup_token_frac", "top_token_frac",
        "dup_bigram_frac", "pii_cnt", "keep", "reason")
  }

  /** Character-level polynomial rolling hash over the whitespace-normalized,
    * lower-cased text: `h = (h*131 + codepoint) mod 1e9+7`, seed 7 —
    * order-sensitive, so it distinguishes permuted documents (unlike
    * bag-of-words hashes). Expressed over primitives every SQL engine
    * shares (character codepoints + modular arithmetic), so an external
    * oracle can replay it exactly; the modulus keeps `h*131 + c` far
    * below Long overflow. Computed by the
    * [[graft.functions.RollingHashExpr]] codegen kernel (one primitive
    * codepoint walk — the interpreted `aggregate(split(s,""),…)` twin it
    * replaced allocated a per-char array and ran the lambda outside
    * codegen; bit-identical, KernelPropertySpec pins the equivalence). */
  def rollingFingerprint(text: Column): Column =
    graft.functions.RollingHash(Dedup.normalize(text), 131, 7L, 1000000007L)

  /** Same rolling hash over the RAW text — no case folding or whitespace
    * collapsing. For sampling keys (see [[Sampling.keyHash]]) where keys
    * differing only in case/whitespace must hash differently. Null text
    * hashes to null (callers decide null policy). */
  def rawRollingFingerprint(text: Column): Column =
    graft.functions.RollingHash(text, 131, 7L, 1000000007L)

  /** An INDEPENDENT second raw rolling hash — different multiplier
    * (137), modulus (998244353, the NTT prime) and seed (11), so a
    * collision in [[rawRollingFingerprint]] is uncorrelated with a
    * collision here. Pairs with it to form the widened
    * [[Sampling.keyHash62]] identity hash; same engine-replayable
    * primitive contract (codepoints + 63-bit modular arithmetic). */
  def rawRollingFingerprint2(text: Column): Column =
    graft.functions.RollingHash(text, 137, 11L, 998244353L)

  /** TF-IDF keyword extraction: top-`k` terms per document. Term and
    * document frequencies come from the SAME (doc, term) aggregate
    * (one token shuffle); idf joins back as a BROADCAST on the term
    * key — at corpus scale truncate the vocabulary (zipf tail carries
    * no keyword signal) to keep it broadcast-able. Ranking is over the
    * ROUNDED score with a term tie-break so the cut is replayable
    * across engines regardless of libm ln() ulps. Only pure
    * `[a-z]+` tokens participate (punctuation/number grams make
    * meaningless keywords). */
  def topTerms(df: DataFrame, textCol: String, idCol: String,
               k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = df
      .select(col(idCol),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("term"))
      .filter(col("term") =!= "" && col("term").rlike("^[a-z]+$"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("dfreq"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("score").desc, col("term"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score", round(col("tf") *
        log((col("n_docs") + 1.0) / (col("dfreq") + 1.0)), 4))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("score"))
  }

  /** DCLM-style per-language quality percentile gate: keep each
    * language's top `keepFraction` by [[qualityScore]], ranked WITHIN
    * the language so no language is wiped out by a global threshold.
    * One lang-keyed window exchange; the rank runs over the ROUNDED
    * (4-dp) score with an id tie-break, so the band cut is exact
    * integer/4-dp arithmetic any engine replays identically. Output:
    * (id, lang, quality, pct) for the kept rows. */
  def qualityPercentileBand(df: DataFrame, textCol: String, idCol: String,
                            langCol: String,
                            keepFraction: Double = 0.3): DataFrame = {
    require(keepFraction > 0.0 && keepFraction <= 1.0,
      s"keepFraction out of range: $keepFraction")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(langCol)
      .orderBy(col("quality").desc, col(idCol))
    df.withColumn("quality", round(qualityScore(col(textCol)), 4))
      .withColumn("pct", round(percent_rank().over(w), 4))
      .filter(col("pct") <= keepFraction)
      .select(col(idCol), col(langCol), col("quality"), col("pct"))
  }
}
