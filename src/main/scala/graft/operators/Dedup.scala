package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Materialize.Ops

/** Deduplication operators for training-data pipelines: exact (content
  * hash), MinHash+LSH banding, SimHash, and n-gram Jaccard verification.
  *
  * Scale design: every path is a hash-`groupBy` (shuffle on a hash key)
  * or a band-bucket self-join — never an all-pairs product and never a
  * driver-side collect. At 100 TB the candidate generation cost is
  * O(n · signature) + one shuffle per band, and verification touches only
  * bucket-colliding pairs. Signatures are built with Catalyst higher-order
  * functions over `xxhash64`, so signature computation stays inside
  * Tungsten (no UDF ser/de).
  */
object Dedup {

  /** Normalization applied before hashing/shingling: lower-case, trim,
    * collapse whitespace runs. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Exact-dup groups: one row per distinct normalized content with the
    * member count and the survivor (minimum) id. */
  def exactGroups(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(md5(normalize(col(textCol))).as("content_hash"))
      .agg(count(lit(1)).as("cnt"), min(col(idCol)).as("keep_id"))

  /** Keep exactly one row (minimum id) per distinct normalized content.
    * Window over the content hash: one shuffle, no join back. */
  def dropExactDups(df: DataFrame, textCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(md5(normalize(col(textCol)))).orderBy(col(idCol).asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Exact dedup keeping the best row per content group under an
    * arbitrary priority (longest text, highest quality score, …), id
    * ascending as the deterministic tie-break — production pipelines
    * keep the best duplicate, not the first-seen one. Same single
    * window shuffle as [[dropExactDups]]. */
  def dropExactDupsBy(df: DataFrame, textCol: String, idCol: String,
                      priority: Column): DataFrame = {
    val w = Window.partitionBy(md5(normalize(col(textCol))))
      .orderBy(priority.desc, col(idCol).asc)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Content-defined chunking (CDC): split each document at the
    * positions where a rolling hash of the trailing `window` characters
    * is ≡ 0 (mod `divisor`) — the storage-dedup boundary rule
    * (LBFS/rsync lineage) applied to corpus text. Because boundaries
    * are chosen by CONTENT, not offset, an insertion near the head of a
    * copied document shifts only the chunks it touches: the stream
    * re-synchronizes at the next content boundary and every later chunk
    * hash is unchanged — exactly the failure mode of fixed
    * token-window hashing ([[repeatedChunks]] misses shifted copies;
    * this catches them). Expected chunk length ≈ `divisor` chars.
    * Emits one row per chunk: `(id, chunk_idx, start_pos, chunk_len,
    * chunk_hash)` with the portable IDENTITY-grade
    * [[graft.operators.Sampling.keyHash62]] of the chunk text — the
    * hash is a dedup identity key (a collision falsely marks two
    * DIFFERENT chunks as a shared span), so it carries the packed
    * dual-hash's ~10⁹-distinct-chunk collision horizon, not the
    * single 30-bit hash's ~4·10⁴.
    *
    * Scale shape: boundary detection is ONE per-row pass of the
    * [[graft.functions.CdcBoundsExpr]] codegen kernel — O(window·chars)
    * multiply-mod steps over a decoded codepoint array, the same
    * `h·131+c mod 1e9+7` recurrence as every portable hash here (any
    * SQL engine replays it). The declarative per-position
    * `substr`-lambda alternative is an O(chars²) trap: UTF8String
    * substr re-seeks from byte 0, measured 360 s vs ~1 s on the sf0.1
    * corpus. Chunking never leaves the row; only (doc, hash) pairs
    * ever shuffle. Documents shorter than `window` become one
    * whole-document chunk; empty documents produce no rows. */
  def cdcChunks(df0: DataFrame, textCol: String, idCol: String,
                window: Int = 8, divisor: Int = 64): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(divisor > 1, s"divisor must exceed 1, got $divisor")
    // the boundary kernel is O(window·chars) CPU per row — a small
    // single-split corpus would serialize it on one core (r21 baseline:
    // wall ≈ process-CPU on 32 cores); at scale the scan is already
    // wider than the session parallelism and this is a no-op
    val df = graft.core.Parallelism.fanOut(df0, col(idCol))
    val t = col(textCol)
    val n = length(t)
    val cuts = graft.functions.CdcBounds(t, window, divisor)
    val bounds = concat(array(lit(0)), cuts, array(n))
    val chunks = filter(
      transform(sequence(lit(1), size(bounds) - 1), k => struct(
        (k - 1).cast("long").as("chunk_idx"),
        element_at(bounds, k).cast("long").as("start_pos"),
        (element_at(bounds, k + 1) - element_at(bounds, k)).cast("long")
          .as("chunk_len"),
        t.substr(element_at(bounds, k) + 1,
          element_at(bounds, k + 1) - element_at(bounds, k)).as("chunk_text"))),
      c => c.getField("chunk_len") > 0)
    df.select(col(idCol).as("id"), explode(chunks).as("c"))
      .select(col("id"), col("c.chunk_idx").as("chunk_idx"),
        col("c.start_pos").as("start_pos"), col("c.chunk_len").as("chunk_len"),
        Sampling.keyHash62(col("c.chunk_text")).as("chunk_hash"))
  }

  /** CDC chunks shared by ≥ `minDocs` distinct documents — the
    * insertion-robust cross-document duplicate-span report. One
    * (id, hash) distinct + one hash-keyed count; chunk text never
    * shuffles. */
  def cdcRepeatedChunks(df: DataFrame, textCol: String, idCol: String,
                        window: Int = 8, divisor: Int = 64,
                        minDocs: Int = 2): DataFrame = {
    require(minDocs > 1, s"minDocs must exceed 1, got $minDocs")
    cdcChunks(df, textCol, idCol, window, divisor)
      .select(col("id"), col("chunk_hash")).distinct()
      .groupBy("chunk_hash")
      .agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") >= minDocs)
  }

  /** Cross-document repeated spans at chunk granularity: slide a
    * `window`-token window with `stride` over each normalized document,
    * hash each full window, and report every chunk seen in ≥2 distinct
    * documents — the tractable relative of exact-substring dedup
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better"), with the suffix array replaced by strided chunk
    * hashing that an engine can run as one groupBy.
    *
    * Scale shape: tokenization is a per-row projection; the start
    * offsets explode BEFORE the window text is built (no higher-order
    * lambda re-evaluating the token array per element — that pattern is
    * an O(tokens²) interpreter trap), so each (row, start) pair does
    * O(window) work; only (doc, 32-byte hash) pairs reach the single
    * groupBy shuffle. Memory per task is one document's tokens. */
  def repeatedChunks(df: DataFrame, idCol: String, textCol: String,
                     window: Int = 20, stride: Int = 10): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    val toks = df.select(col(idCol).as("doc"), split(normalize(col(textCol)), " ").as("t"))
      .filter(size(col("t")) >= window)
    toks
      .select(col("doc"), col("t"),
        explode(sequence(lit(0), size(col("t")) - window, lit(stride))).as("s"))
      .select(col("doc"),
        md5(array_join(slice(col("t"), col("s") + 1, lit(window)), " ")).as("chunk_hash"))
      .groupBy("chunk_hash")
      .agg(countDistinct(col("doc")).as("n_docs"), count(lit(1)).as("n_hits"),
        min(col("doc")).as("first_doc"))
      .filter(col("n_docs") >= 2)
  }

  /** Repeated-chunk REMOVAL: rewrite each document with every token
    * covered by a corpus-duplicated window stripped out — the
    * "remove the boilerplate, keep the document" counterpart of
    * [[repeatedChunks]] (which only reports the duplicated windows).
    * This is the tractable relative of exact-substring dedup (Lee et
    * al. 2022): instead of suffix arrays over the concatenated corpus,
    * strided fixed-width token windows are hashed, windows seen in
    * ≥ `minDocs` distinct documents are marked, and every occurrence of
    * a marked window is erased from its document.
    *
    * Plan shape and 100 TB behavior: the window hashing is the same
    * explode-before-hash kernel as [[repeatedChunks]] (only
    * `(doc, offset, 16-byte hash)` triples reach the first shuffle);
    * the duplicated-hash relation joins back to occurrences hash-keyed
    * (ids only); per-document covered offsets aggregate to ONE array
    * row per affected document; and the final rewrite is a left join of
    * that (small — affected docs only) relation onto the corpus followed
    * by a pure codegen `filter` over the token array. No step ever
    * shuffles document text except the final join's build side, which
    * carries only offset arrays.
    *
    * Output: `idCol`, `cleaned_text` (remaining tokens of the
    * normalized text joined by single spaces), `n_removed` (tokens
    * stripped). Documents with no duplicated window pass through with
    * `n_removed = 0`.
    */
  def stripRepeatedChunks(df: DataFrame, idCol: String, textCol: String,
                          window: Int = 20, stride: Int = 10,
                          minDocs: Int = 2): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    require(minDocs >= 2, "minDocs must be >= 2 (a window always appears in its own doc)")
    val toks = df.select(col(idCol).as("doc"), split(normalize(col(textCol)), " ").as("t"))
    val occ = toks.filter(size(col("t")) >= window)
      .select(col("doc"), col("t"),
        explode(sequence(lit(0), size(col("t")) - window, lit(stride))).as("s"))
      .select(col("doc"), col("s"),
        md5(array_join(slice(col("t"), col("s") + 1, lit(window)), " ")).as("h"))
    val dup = occ.groupBy("h")
      .agg(countDistinct(col("doc")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("h")
    val starts = occ.join(dup, "h")
      .groupBy("doc")
      .agg(sort_array(collect_set(col("s"))).as("ap_starts"))
    // covered token indices (0-based) per start s: [s, s + window)
    val kept = filter(col("t"), (tok, i) =>
      !exists(col("ap_starts"), st => i >= st && i < st + window))
    toks.join(starts, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        when(col("ap_starts").isNull, col("t")).otherwise(kept).as("ap_kept"),
        col("t"))
      .select(col(idCol),
        array_join(col("ap_kept"), " ").as("cleaned_text"),
        (size(col("t")) - size(col("ap_kept"))).cast("long").as("n_removed"))
  }

  /** C4-style LINE-level dedup: rewrite each document with every line
    * whose normalized form appears in ≥ `minDocs` distinct documents
    * removed — the classic web-corpus cleanup (C4 / RefinedWeb drop
    * boilerplate nav/footer lines this way) for corpora with line
    * structure; [[stripRepeatedChunks]] is the token-window analog for
    * unstructured text. Blank/whitespace-only lines are never counted
    * as duplicates (they occur everywhere) and pass through, preserving
    * paragraph structure.
    *
    * Same scale shape as the chunk form: only (doc, line-index, 16-byte
    * hash) triples shuffle; the duplicated-hash relation joins back
    * hash-keyed; per-doc removal indices collapse to one array row; the
    * rewrite is a pure codegen array filter. Output: `idCol`,
    * `cleaned_text` (surviving lines joined by newline), `n_removed`. */
  def stripRepeatedLines(df: DataFrame, idCol: String, textCol: String,
                         minDocs: Int = 2): DataFrame = {
    require(minDocs >= 2, "minDocs must be >= 2")
    val toks = df.select(col(idCol).as("doc"), split(col(textCol), "\n").as("t"))
    val occ = toks
      .select(col("doc"), posexplode(col("t")).as(Seq("p", "line")))
      .withColumn("norm", regexp_replace(lower(trim(col("line"))), "\\s+", " "))
      .filter(col("norm") =!= "") // blanks never mark as duplicates
      .select(col("doc"), col("p"), md5(col("norm")).as("h"))
    val dup = occ.groupBy("h")
      .agg(countDistinct(col("doc")).as("nd"))
      .filter(col("nd") >= minDocs)
      .select("h")
    val drops = occ.join(dup, "h")
      .groupBy("doc")
      .agg(sort_array(collect_set(col("p"))).as("ap_drops"))
    val kept = filter(col("t"), (_, i) => !array_contains(col("ap_drops"), i))
    toks.join(drops, Seq("doc"), "left")
      .select(col("doc").as(idCol),
        when(col("ap_drops").isNull, col("t")).otherwise(kept).as("ap_kept"),
        col("t"))
      .select(col(idCol),
        array_join(col("ap_kept"), "\n").as("cleaned_text"),
        (size(col("t")) - size(col("ap_kept"))).cast("long").as("n_removed"))
  }

  /** Corpus-wide most frequent word n-grams (counted once per document)
    * — the boilerplate detector a pipeline runs before writing filter
    * rules. Same shingle semantics as [[shingles]] (short docs collapse
    * to one whole-text shingle), but built explode-first: the
    * interpreted-HOF form re-evaluates the token subtree per element
    * (O(tokens²) per row — measured, see SCALING.md), while here each
    * (row, offset) pair slices an already-bound attribute once. */
  def topNgrams(df: DataFrame, textCol: String, idCol: String,
                n: Int, k: Int): DataFrame = {
    require(n > 0 && k > 0, "n and k must be positive")
    val norm = df.select(col(idCol).as("doc"),
      split(normalize(col(textCol)), " ").as("t"))
    val small = norm.filter(size(col("t")) <= n)
      .select(col("doc"), array_join(col("t"), " ").as("ngram"))
    val big = norm.filter(size(col("t")) > n)
      .select(col("doc"), col("t"),
        explode(sequence(lit(0), size(col("t")) - n)).as("s"))
      .select(col("doc"),
        array_join(slice(col("t"), col("s") + 1, lit(n)), " ").as("ngram"))
    small.union(big).distinct() // per-doc distinct, like shingles()
      .groupBy("ngram").agg(count(lit(1)).as("n_docs"))
      .orderBy(col("n_docs").desc, col("ngram").asc).limit(k)
  }

  /** Word n-gram shingles of the normalized text (distinct). */
  def shingles(text: Column, n: Int): Column = {
    val ts = split(normalize(text), " ")
    array_distinct(
      when(size(ts) <= n, array(array_join(ts, " ")))
        .otherwise(transform(sequence(lit(0), size(ts) - n),
          i => array_join(slice(ts, i + 1, lit(n)), " "))))
  }

  /** One `xxhash64` per token — the only string hashing in the dedup
    * signature path; everything downstream is long arithmetic inside the
    * codegen'd [[graft.functions.MinHashSigExpr]]/[[graft.functions.SimHashExpr]]. */
  def tokenHashes(text: Column): Column =
    transform(split(normalize(text), " "), t => xxhash64(t))

  /** Drop band buckets with more than `maxBucket` members BEFORE pair
    * enumeration — the mega-bucket guard for banded self-joins.
    *
    * AQE's skew-join split fixes the JOIN's task skew but not the
    * OUTPUT: a boilerplate bucket of b docs still emits O(b²) candidate
    * pairs no matter how the tasks are carved. At 100 TB a single
    * 100k-doc template bucket is 10^10 pairs — this cap (the standard
    * production-dedup mitigation: near-identical boilerplate is better
    * handled by EXACT dedup upstream, which this library runs first in
    * [[dedupPipeline]]) bounds every bucket's contribution to
    * O(maxBucket²) at a documented recall cost on the dropped buckets.
    *
    * Cost shape: the bucket count is a window over the SAME key the
    * subsequent self-join shuffles on, so the window's hash partitioning
    * is exactly the join's — one shuffle, not two, and the capped
    * relation is what callers persist. Default `Int.MaxValue` = off
    * (bit-identical to the uncapped plan). */
  private[graft] def capBuckets(banded: DataFrame, keyCols: Seq[String],
                                maxBucket: Int): DataFrame =
    if (maxBucket == Int.MaxValue) banded
    else {
      require(maxBucket >= 2, s"a bucket needs 2 members to pair, got cap $maxBucket")
      val w = Window.partitionBy(keyCols.map(col): _*)
      banded.withColumn("_bsz", count(lit(1)).over(w))
        .filter(col("_bsz") <= maxBucket).drop("_bsz")
    }

  /** MinHash signature via the codegen kernel: shingle hash = polynomial
    * combine of `n` consecutive token hashes, signature element s =
    * `min((a_s·h + b_s) mod 2^31-1)`. The earlier pure-HOF formulation
    * re-evaluated the shingle subtree per derived hash (no CSE on
    * interpreted lambdas) and measured ~90 s for 500 docs; this is one
    * primitive loop per row. */
  def minhashSignature(text: Column, numHashes: Int, n: Int = 3): Column =
    graft.functions.HashSig.minhash(tokenHashes(text), n, numHashes)

  /** Jaccard similarity of two shingle(-hash) set columns. */
  private def setJaccard(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb)).cast("double")
    inter / (size(sa) + size(sb) - inter).cast("double")
  }

  /** Exact Jaccard similarity of the two docs' shingle sets. */
  def jaccardSim(a: Column, b: Column, n: Int = 3): Column =
    setJaccard(shingles(a, n), shingles(b, n))

  /** MinHash-LSH near-duplicate pairs, verified with exact Jaccard.
    *
    * Pipeline: signature → explode band keys → self-join on (band, key)
    * with `idA < idB` → distinct candidate pair → verify Jaccard ≥
    * threshold. The self-join is on the bucket key, so work is
    * O(Σ bucket²) not O(n²); at 100 TB skewed mega-buckets (boilerplate
    * docs) are the risk — exact dedup upstream removes identical docs,
    * AQE skew-join splits oversized buckets' JOIN tasks at runtime, and
    * `maxBucket` ([[capBuckets]]) bounds the residual O(bucket²) pair
    * OUTPUT that AQE cannot (default off: bit-identical to uncapped).
    */
  def minhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                          threshold: Double, numHashes: Int = 96,
                          numBands: Int = 24, n: Int = 3,
                          maxBucket: Int = Int.MaxValue): DataFrame = {
    val (pairs, banded) =
      minhashPlan(df, textCol, idCol, threshold, numHashes, numBands, n, maxBucket)
    // Materialize the (pair-scale) verified result eagerly so the banded
    // cache is released NOW rather than accumulating one session-lifetime
    // cached relation per ad-hoc call (same discipline as
    // ngramJaccardNearDupPairs / Winnow.overlapPairs).
    val out = pairs.materialized
    banded.unpersist()
    out
  }

  /** The lazy plan behind [[minhashNearDupPairs]]: (verified pairs, the
    * persisted banded relation the caller must unpersist). Package-private
    * so specs can assert the band self-join shape pre-checkpoint. */
  private[graft] def minhashPlan(df0: DataFrame, textCol: String, idCol: String,
                                 threshold: Double, numHashes: Int,
                                 numBands: Int, n: Int,
                                 maxBucket: Int): (DataFrame, DataFrame) = {
    // NOT fanned out (r21 A/B, isolated min-of-5 across the whole
    // consumer family: dedup_pipeline 1.31 s without vs 1.72 s with,
    // dedup_components 1.21 vs 1.53, neardup_keep_best 1.77 vs 2.35,
    // minhash_neardup 0.67 vs 0.86): the banded relation persists and
    // every consumer shuffles right after it, so an up-front exchange
    // only adds task overhead — unlike the cdc/cosine kernels
    val df = df0
    // Candidate generation carries only (band, key, id) through the
    // shuffle; shingle sets are re-joined by id afterwards, so the heavy
    // arrays never ride the band explosion (24× per doc). The banded
    // relation feeds BOTH sides of the self-join — persist it, or the
    // signature kernel runs twice over the corpus.
    val banded = capBuckets(
      df.select(col(idCol).as("id"),
        posexplode(graft.functions.HashSig.minhashBands(
          tokenHashes(col(textCol)), n, numHashes, numBands)).as(Seq("band", "key"))),
      Seq("band", "key"), maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = banded.select(col("band"), col("key"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("key"), col("id").as("id_b")), Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val sh = df.select(col(idCol).as("id"),
      graft.functions.HashSig.shingleHashes(tokenHashes(col(textCol)), n).as("sh"))
    val pairs = cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", setJaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    (pairs, banded)
  }

  /** EXACT n-gram Jaccard near-duplicate pairs via a prefix-filtered
    * set-similarity self-join (the All-Pairs / PPJoin candidate rule).
    *
    * Where MinHash banding is probabilistic (recall < 1 by construction),
    * this emits the exact all-pairs answer at the threshold without ever
    * forming the n² product. Candidate rule: order every document's
    * shingle set by one global total order — document frequency
    * ascending, hash as tiebreak — and keep only the first
    * `|S| - ceil(t·|S|) + 1` shingles (the "prefix"). Any pair with
    * Jaccard ≥ t has overlap ≥ ⌈t·max(|A|,|B|)⌉, so their prefixes must
    * share at least one shingle (pigeonhole over the common order) —
    * losslessness is DedupTextSpec-asserted against the cartesian.
    *
    * Scale shape: postings lists are built only for prefix shingles,
    * which the frequency ordering biases toward RARE shingles — the
    * self-join on the shingle key touches short postings, and AQE
    * splits any residual hot key. Ids only ride the postings; shingle
    * sets re-join by id for verification, exactly like the MinHash path.
    */
  def ngramJaccardNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                               threshold: Double, n: Int = 3): DataFrame = {
    val (pairs, cached) = ngramJaccardPlan(df, textCol, idCol, threshold, n)
    // Materialize the (pair-scale) verified result eagerly so the
    // shingle + prefix caches can be released NOW — returning the lazy
    // frame would pin one persisted copy of the corpus shingles per call
    // for the session lifetime (the CorpusIndex.release() hazard).
    // NB: Materialize truncates lineage — without a checkpoint dir an
    // executor loss fails the job rather than recomputing (see
    // graft.core.Materialize for the reliable cluster mode).
    val out = pairs.materialized
    cached.foreach(_.unpersist())
    out
  }

  /** The lazy plan behind [[ngramJaccardNearDupPairs]]: (verified
    * pairs, the persisted frames the caller must unpersist).
    * Package-private so specs can assert the join shape pre-checkpoint. */
  private[graft] def ngramJaccardPlan(df0: DataFrame, textCol: String, idCol: String,
                                      threshold: Double, n: Int): (DataFrame, Seq[DataFrame]) = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"prefix filtering needs a positive threshold, got $threshold")
    // NOT fanned out (r21 A/B, isolated min-of-5: wall 2.52 s at 9.6
    // CPU-s without vs 2.88 s at 26 CPU-s with): unlike the banded
    // families, every consumer of the cached shingles shuffles
    // immediately (postings explode, df-order window, prefix join), so
    // the up-front exchange only multiplies task overhead
    val df = df0
    val sh = df.select(col(idCol).as("id"),
        graft.functions.HashSig.shingleHashes(tokenHashes(col(textCol)), n).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val posting = sh.select(col("id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("s"))
    val freq = posting.groupBy("s").agg(count(lit(1)).as("df"))
    // rank within each doc by the global (df, s) order; keep the prefix.
    // The 1e-9 slack only ever LENGTHENS the prefix if t·sz rounds up
    // across an integer boundary in floating point — safe direction.
    val w = Window.partitionBy("id").orderBy(col("df").asc, col("s").asc)
    // persisted: the prefix feeds BOTH candidate self-join sides, and
    // one side plans as a broadcast build — its different exchange
    // wrapper defeats ReuseExchange, so lazily the whole freq aggregate
    // + join-back + per-doc window pipeline executed TWICE (measured
    // r22: the second run was ~40% of the operator's wall). The cached
    // relation is the prefix SLICE of the posting list (≈ (1−t)·|S|+1
    // shingles per doc), released in the public wrapper above.
    val prefix = posting.join(freq, "s")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
      .select("s", "id", "sz")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // candidate join on the prefix shingle key, plus the All-Pairs
    // LENGTH filter: J(A,B) ≥ t ⟹ min|S| ≥ t·max|S| (J ≤ min/max),
    // so size-incompatible pairs drop before the distinct + verify
    val cand = prefix.select(col("s"), col("id").as("id_a"), col("sz").as("sz_a"))
      .join(prefix.select(col("s"), col("id").as("id_b"), col("sz").as("sz_b")), Seq("s"))
      .filter(col("id_a") < col("id_b") &&
        least(col("sz_a"), col("sz_b")) >=
          lit(threshold) * greatest(col("sz_a"), col("sz_b")) - lit(1e-9))
      .select("id_a", "id_b").distinct()
    val pairs = cand
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", setJaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
    (pairs, Seq(sh, prefix))
  }

  /** End-to-end training-data dedup pipeline: quality floor → optional
    * repetition filter (Gopher-style duplicate-token / top-token ceilings
    * via [[TextAnalysis.repetitionSignals]]) → exact dedup (keep min id
    * per normalized content) → near-dup drop (the higher id of every
    * verified MinHash pair is removed). Returns the surviving ids. Every
    * stage is the scale-shaped operator above — one pipeline, no
    * driver-side loops. The repetition stage defaults OFF (ceilings 1.0:
    * dup fractions are < 1 and a ≤-check at 1.0 never drops). */
  def dedupPipeline(df: DataFrame, textCol: String, idCol: String,
                    minQuality: Double, threshold: Double,
                    maxDupTokenFrac: Double = 1.0,
                    maxTopTokenFrac: Double = 1.0): DataFrame = {
    val floor = df.filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality)
    val quality =
      if (maxDupTokenFrac >= 1.0 && maxTopTokenFrac >= 1.0) floor
      else {
        val keepIds = TextAnalysis.repetitionSignals(floor, textCol, idCol)
          .filter(col("dup_token_frac") <= maxDupTokenFrac &&
            col("top_token_frac") <= maxTopTokenFrac)
          .select(col("id").as(idCol))
        floor.join(keepIds, Seq(idCol), "left_semi")
      }
    // referenced by the band self-join (2×), the shingle join, and the
    // final anti-join — persist or every reference re-runs the quality
    // scan + exact-dedup window shuffle. The cache is scoped to this
    // call: survivors (ids only) are eagerly materialized via
    // Materialize, then `exact` is unpersisted — a lazily returned
    // frame would pin the cached relation for the session lifetime
    // (one leak per /pipeline/dedup request).
    val exact = dropExactDups(quality, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val drops = minhashNearDupPairs(exact, textCol, idCol, threshold)
        .select(col("id_b").as(idCol)).distinct()
      exact.join(drops, Seq(idCol), "left_anti").select(idCol)
        .materialized
    } finally exact.unpersist()
  }

  /** A reference corpus prepared for incoming-vs-corpus near-dup checks:
    * band keys and shingle sets, computed once and persisted. */
  final case class CorpusIndex(banded: DataFrame, // (band, key, corpus_id)
                               shingles: DataFrame, // (corpus_id, sh)
                               numHashes: Int, numBands: Int, n: Int) {
    /** Drop the cached relations (call when retiring/rebuilding the
      * index — each build persists two frames). */
    def release(): Unit = {
      banded.unpersist()
      shingles.unpersist()
    }
  }

  /** Band + shingle a static reference corpus once (both persisted) —
    * the build side of [[nearDupAgainstCorpus]]. */
  def indexCorpus(corpus: DataFrame, textCol: String, idCol: String,
                  numHashes: Int = 96, numBands: Int = 24, n: Int = 3): CorpusIndex = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val banded = corpus.select(col(idCol).as("corpus_id"),
        posexplode(graft.functions.HashSig.minhashBands(
          tokenHashes(col(textCol)), n, numHashes, numBands)).as(Seq("band", "key")))
      .persist(MEMORY_AND_DISK)
    val sh = corpus.select(col(idCol).as("corpus_id"),
        graft.functions.HashSig.shingleHashes(tokenHashes(col(textCol)), n).as("sh_c"))
      .persist(MEMORY_AND_DISK)
    CorpusIndex(banded, sh, numHashes, numBands, n)
  }

  /** Persist a prepared corpus index: the banded and shingle relations
    * as parquet plus a tiny JSON meta. Incremental ingestion
    * ([[extendCorpus]]) then survives process restarts, the way the
    * vector indexes persist through `IndexStore` — a training pipeline
    * builds the admission index once and every later crawl batch (or a
    * different job entirely) reloads it instead of re-signaturing the
    * whole ingested corpus. */
  def saveCorpusIndex(idx: CorpusIndex, dir: String): Unit = {
    import java.nio.file.Files
    val p = java.nio.file.Paths.get(dir)
    Files.createDirectories(p)
    // write-new-then-swap: the index being saved may lazily READ from
    // this very directory (an extend→save cycle on a loaded index), so
    // the new relations land in *_tmp before the live dirs move aside
    idx.banded.write.mode("overwrite").parquet(p.resolve("banded_tmp").toString)
    idx.shingles.write.mode("overwrite").parquet(p.resolve("shingles_tmp").toString)
    Seq("banded", "shingles").foreach { name =>
      val live = p.resolve(name)
      val old = p.resolve(s"${name}_old")
      graft.core.Entity.deleteRecursively(old)
      if (Files.exists(live)) Files.move(live, old)
      try Files.move(p.resolve(s"${name}_tmp"), live)
      catch { case e: Throwable =>
        if (Files.exists(old)) Files.move(old, live); throw e }
      graft.core.Entity.deleteRecursively(old)
    }
    Files.write(p.resolve("meta.json"),
      s"""{"numHashes":${idx.numHashes},"numBands":${idx.numBands},"n":${idx.n}}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Reload a [[saveCorpusIndex]] artifact (both relations persisted). */
  def loadCorpusIndex(spark: org.apache.spark.sql.SparkSession, dir: String): CorpusIndex = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val p = java.nio.file.Paths.get(dir)
    require(java.nio.file.Files.exists(p.resolve("meta.json")),
      s"no corpus index at $dir")
    val j = new com.fasterxml.jackson.databind.ObjectMapper().readTree(
      new String(java.nio.file.Files.readAllBytes(p.resolve("meta.json")),
        java.nio.charset.StandardCharsets.UTF_8))
    CorpusIndex(
      spark.read.parquet(p.resolve("banded").toString).persist(MEMORY_AND_DISK),
      spark.read.parquet(p.resolve("shingles").toString).persist(MEMORY_AND_DISK),
      j.get("numHashes").asInt, j.get("numBands").asInt, j.get("n").asInt)
  }

  /** Near-dup flags for incoming docs against a static reference corpus —
    * the admission check of a training-data pipeline ("is this
    * newly-crawled doc a near-duplicate of anything already ingested?").
    * Incoming rows band inline and equi-join the prepared corpus on
    * (band, key); candidates verify exact Jaccard against the corpus
    * shingles. Emits `(in_id, corpus_id, jaccard)` per verified pair.
    *
    * Works unchanged on a streaming `incoming` frame via `foreachBatch`
    * (the join is stream-static, the corpus side is the prepared index;
    * no stream-side state) — see DedupTextSpec's streaming case. */
  def nearDupAgainstCorpus(incoming: DataFrame, textCol: String, idCol: String,
                           idx: CorpusIndex, threshold: Double): DataFrame = {
    // NOT fanned out (r21 A/B: 0.54 s without vs 1.03 s with): the
    // incoming batch joins the persisted corpus index immediately, so
    // the kernel work rides the join shuffle's parallelism anyway
    val inBanded = incoming.select(col(idCol).as("in_id"),
      posexplode(graft.functions.HashSig.minhashBands(
        tokenHashes(col(textCol)), idx.n, idx.numHashes, idx.numBands)).as(Seq("band", "key")))
    val cand = inBanded.join(idx.banded, Seq("band", "key"))
      .select("in_id", "corpus_id").distinct()
    val inSh = incoming.select(col(idCol).as("in_id"),
      graft.functions.HashSig.shingleHashes(tokenHashes(col(textCol)), idx.n).as("sh_i"))
    cand.join(inSh, Seq("in_id"))
      .join(idx.shingles, Seq("corpus_id"))
      .withColumn("jaccard", setJaccard(col("sh_i"), col("sh_c")))
      .filter(col("jaccard") >= threshold)
      .select(col("in_id"), col("corpus_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Extend a corpus index with newly admitted documents — the ingest
    * side of the admission workflow (`foreachBatch`: flag incoming
    * near-dups against the index, then extend it with the novel docs so
    * the NEXT batch checks against them too). Bands + shingles of `docs`
    * union into the index relations and are eagerly materialized, so
    * repeated extension keeps a BOUNDED plan instead of a union tree
    * growing one level per batch (same executor-loss tradeoff as the
    * other Materialize sites). The old index and the temporary
    * build are released; use the RETURNED index afterwards. */
  def extendCorpus(idx: CorpusIndex, docs: DataFrame, textCol: String,
                   idCol: String): CorpusIndex = {
    val add = indexCorpus(docs, textCol, idCol, idx.numHashes, idx.numBands, idx.n)
    val banded = idx.banded.union(add.banded).materialized
    val sh = idx.shingles.union(add.shingles).materialized
    idx.release()
    add.release()
    CorpusIndex(banded, sh, idx.numHashes, idx.numBands, idx.n)
  }

  /** Benchmark-contamination check: one-sided n-gram CONTAINMENT of the
    * reference set's shingles in each incoming document —
    * `|S(bench) ∩ S(doc)| / |S(bench)|` — the standard "is this training
    * document contaminated with an eval benchmark item" test. Jaccard
    * (and MinHash banding, which approximates it) underflags when the
    * doc is much longer than the benchmark item, so the candidate step
    * here is NOT the banded join: benchmark shingles post directly
    * (benchmark sets are small — the corpus index's shingle table is the
    * posting source), incoming shingles join them, and the per-pair
    * match COUNT is exactly `|S(bench) ∩ S(doc)|` because shingle sets
    * are distinct. LOSSLESS at any threshold, no verification pass.
    *
    * Scale shape: the exploded benchmark postings are tiny and
    * broadcast-able, so the corpus side never shuffles — one broadcast
    * join over the exploded incoming shingles plus one aggregation on
    * the (rare) matching rows. Emits `(in_id, corpus_id, containment)`
    * at or above the threshold. */
  def contaminationAgainstCorpus(incoming: DataFrame, textCol: String, idCol: String,
                                 idx: CorpusIndex, threshold: Double): DataFrame = {
    val benchPost = idx.shingles.select(col("corpus_id"),
      size(col("sh_c")).as("bench_sz"), explode(col("sh_c")).as("s"))
    // fan the incoming batch out BEFORE the shingle kernel: the bench
    // postings BROADCAST (that is this operator's point — the corpus
    // side never shuffles), so nothing downstream ever repartitions the
    // incoming side and the kernel + probe + partial agg all serialize
    // on a narrow scan (r22 isolated A/B on a 1-split input: wall 2.3 s
    // at 3.2 CPU-s without ≈ 1.4 busy threads). The r21 no-fan-out note
    // on this site was measured on a box where the whole query ran
    // 0.5 s — re-measured here with the kernel dominating. No-op when
    // the input is already wide.
    val inPost = graft.core.Parallelism.fanOut(incoming, col(idCol))
      .select(col(idCol).as("in_id"),
        explode(graft.functions.HashSig.shingleHashes(
          tokenHashes(col(textCol)), idx.n)).as("s"))
    inPost.join(broadcast(benchPost), Seq("s"))
      .groupBy("in_id", "corpus_id", "bench_sz")
      .agg(count(lit(1)).as("overlap"))
      .withColumn("containment",
        col("overlap").cast("double") / col("bench_sz").cast("double"))
      .filter(col("containment") >= threshold)
      .select(col("in_id"), col("corpus_id"),
        round(col("containment"), 4).as("containment"))
  }

  /** 60-bit SimHash over the token bag: bit i of the fingerprint is the
    * sign of Σ_tokens vote_i(token). The per-token vote derives from a
    * char-level rolling hash + affine bit hashes — every step replayable
    * by a vanilla SQL engine (see
    * [[graft.functions.SimHashPortableExpr]]), so the near-dup result is
    * exactly cross-checkable. Codegen'd single-pass kernel per row. */
  def simhash(text: Column): Column =
    graft.functions.HashSig.simhashPortable(split(normalize(text), " "))

  /** The 15-bit band chunks of a 60-bit SimHash fingerprint, as
    * (band, chunk) columns appended after exploding band ∈ [0, 4). */
  private def simhashChunk(sig: Column, band: Column): Column =
    call_function("shiftright", sig, band * 15).bitwiseAND(0x7FFFL)

  /** SimHash near-dup pairs: band the 60-bit fingerprint into four
    * 15-bit chunks (Hamming ≤ 3 ⇒ at least one chunk identical by
    * pigeonhole, so for maxHamming ≤ 3 the banding is EXACT, not
    * approximate), bucket-join, verify true Hamming ≤ maxHamming.
    * `maxBucket` ([[capBuckets]]) drops boilerplate mega-buckets before
    * pair enumeration (trades exactness on dropped buckets for a bound
    * on the O(bucket²) candidate output; default off). */
  def simhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                          maxHamming: Int = 3,
                          maxBucket: Int = Int.MaxValue): DataFrame = {
    // spread a narrow corpus before the per-row signature kernel
    // (no-op at scale; see [[graft.core.Parallelism.fanOut]])
    val withSig = graft.core.Parallelism.fanOut(df, col(idCol))
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sim", simhash(col("text")))
    val banded = capBuckets(
      withSig.withColumn("band", explode(sequence(lit(0), lit(3))))
        .withColumn("chunk", simhashChunk(col("sim"), col("band"))),
      Seq("band", "chunk"), maxBucket)
    val a = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("sim").as("sim_a"))
    val b = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("sim").as("sim_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sim_a", "sim_b").distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** A reference corpus prepared for incoming-vs-corpus SimHash checks:
    * the banded (band, chunk, corpus_id, sim_c) relation, persisted once.
    * SimHash sibling of [[CorpusIndex]] — one long per doc instead of a
    * shingle set, so the index is even narrower. */
  final case class SimHashCorpusIndex(banded: DataFrame) {
    def release(): Unit = banded.unpersist()
  }

  /** Band a static reference corpus's SimHash fingerprints once —
    * the build side of [[simhashAgainstCorpus]]. */
  def simhashIndexCorpus(corpus: DataFrame, textCol: String, idCol: String): SimHashCorpusIndex = {
    val banded = corpus
      .select(col(idCol).as("corpus_id"), simhash(col(textCol)).as("sim_c"))
      .withColumn("band", explode(sequence(lit(0), lit(3))))
      .withColumn("chunk", simhashChunk(col("sim_c"), col("band")))
      .select("band", "chunk", "corpus_id", "sim_c")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    SimHashCorpusIndex(banded)
  }

  /** SimHash admission check: incoming docs vs a prepared corpus index.
    * Incoming rows band inline and equi-join the corpus on (band, chunk);
    * the 60-bit signatures ride the join (16 bytes/pair), so no re-join is
    * needed for verification. Exact (not approximate) for maxHamming ≤ 3
    * by the 4-band pigeonhole. Emits `(in_id, corpus_id, hamming)`.
    *
    * Works unchanged on a streaming `incoming` frame via `foreachBatch`
    * (stream-static join against the persisted corpus side, no
    * stream-side state) — mirrors [[nearDupAgainstCorpus]]. */
  def simhashAgainstCorpus(incoming: DataFrame, textCol: String, idCol: String,
                           idx: SimHashCorpusIndex, maxHamming: Int = 3): DataFrame = {
    val inBanded = incoming
      .select(col(idCol).as("in_id"), simhash(col(textCol)).as("sim_i"))
      .withColumn("band", explode(sequence(lit(0), lit(3))))
      .withColumn("chunk", simhashChunk(col("sim_i"), col("band")))
    inBanded.join(idx.banded, Seq("band", "chunk"))
      .select("in_id", "corpus_id", "sim_i", "sim_c").distinct()
      .withColumn("hamming", bit_count(col("sim_i").bitwiseXOR(col("sim_c"))))
      .filter(col("hamming") <= maxHamming)
      .select("in_id", "corpus_id", "hamming")
  }

  /** Connected components over a near-dup pair graph — the CLUSTERING
    * step after pair generation: near-duplicate similarity is not
    * transitive, but dedup treats it as an equivalence ("A~B, B~C ⇒ keep
    * one of {A,B,C}"), so every node gets the MINIMUM id reachable
    * through edges as its `component` (the canonical representative;
    * survivors are exactly the rows with `id == component`).
    *
    * Algorithm: iterative min-label propagation — each round every node
    * adopts the min of its own label and its neighbours' labels; one
    * shuffle-join + one aggregation per round, labels eagerly
    * materialized so the plan never grows with iterations.
    * Converges in O(graph diameter) rounds; near-dup cluster graphs are
    * shallow (duplicates of a common source link to each other), so a
    * handful of rounds suffices even at corpus scale — the 100 TB cost
    * driver is the EDGE join, and edges are id pairs only, tiny next to
    * the corpus. Throws rather than returning unconverged labels if
    * `maxIter` rounds do not reach a fixpoint (a pathological
    * diameter-`maxIter` chain).
    *
    * Output: `(id, component)` for every node that appears in `pairs`
    * (isolated rows are trivially their own component — union them in if
    * a total mapping is needed). */
  def connectedComponents(pairs: DataFrame, aCol: String = "id_a",
                          bCol: String = "id_b", maxIter: Int = 30): DataFrame = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = pairs.select(
      longIdOrFail(col(aCol), "connectedComponents").as("src"),
      longIdOrFail(col(bCol), "connectedComponents").as("dst"))
    val symWide = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().persist(MEMORY_AND_DISK)
    try {
      val nEdges = symWide.count()
      // the loop's per-round cost is FIXED overhead × partitions, and the
      // edge set (id pairs) is tiny next to the corpus that produced it —
      // size the iteration's parallelism to the edges, not the session
      // default (a few hundred pairs don't need 32-way shuffles; a
      // billion-edge graph still fans out)
      val parts = math.max(1, math.min(
        pairs.sparkSession.sessionState.conf.numShufflePartitions,
        (nEdges / 500000L + 1L).toInt))
      val sym = symWide.coalesce(parts).materialized
      try {
        var labels = sym.select(col("src").as("id")).distinct()
          .withColumn("component", col("id")).coalesce(parts).materialized
        var iter = 0
        var done = false
        while (!done && iter < maxIter) {
          val neighborMin = sym
            .join(labels.select(col("id").as("dst"), col("component").as("nl")), "dst")
            .groupBy("src").agg(min("nl").as("nmin"))
            .withColumnRenamed("src", "id")
          // carry the previous label through the round so convergence is
          // read off the SAME checkpointed frame — no extra join, one
          // cheap scan per round
          val updated = labels.join(neighborMin, Seq("id"), "left")
            .select(col("id"), col("component").as("old"),
              least(col("component"), coalesce(col("nmin"), col("component")))
                .as("component"))
            .coalesce(parts).materialized
          done = updated.filter(col("component") =!= col("old")).isEmpty
          // `updated` holds a full copy of the labels — release the
          // superseded round's checkpoint blocks NOW instead of waiting
          // for a GC: per-round checkpoints otherwise pile up in executor
          // storage and repeated component runs within one session slow
          // down measurably (the r21 fuzzy_name_components rerun drift)
          graft.core.Materialize.release(labels)
          labels = updated.select("id", "component")
          iter += 1
        }
        require(done, s"label propagation did not converge in $maxIter rounds")
        labels
      } finally graft.core.Materialize.release(sym)
    } finally symWide.unpersist()
  }

  /** Cast an id to long, FAILING on a non-castable non-null value
    * instead of nulling it out — a null key silently drops the row from
    * every join downstream, turning the operator into a no-op that
    * returns its input unchanged. `try_cast` keeps the behavior
    * independent of `spark.sql.ansi.enabled` (ANSI cast throws its own
    * error mid-plan; non-ANSI nulls silently — this guard makes both
    * modes fail with the operator-level message). Zero extra jobs: the
    * assertion rides the existing scan of the (tiny) pair graph. */
  private[operators] def longIdOrFail(c: Column, ctx: String): Column =
    coalesce(c.try_cast("long"),
      assert_true(c.isNull, concat(lit(s"$ctx: id value '"), c.cast("string"),
        lit("' is not castable to long — use a numeric id column"))).cast("long"))

  /** Near-duplicate cluster survivors under a priority rule: cluster the
    * banded-minhash candidate pairs into connected components, keep the
    * HIGHEST-priority row per component (ties → lowest id), and pass
    * every unclustered row through — the keep-best twin of
    * [[dropExactDupsBy]] for NEAR duplicates (a production pipeline
    * keeps the longest/highest-quality variant of each near-dup
    * cluster, not an arbitrary one).
    *
    * Scale shape: components work on the pair graph (orders of magnitude
    * smaller than the corpus); the per-component window shuffles only
    * (id, component, priority) triples; the final anti-join's loser side
    * is pairs-scale, broadcastable. */
  def nearDupKeepBest(df: DataFrame, textCol: String, idCol: String,
                      threshold: Double, priority: Column): DataFrame = {
    val comps = connectedComponents(
      minhashNearDupPairs(df, textCol, idCol, threshold))
    val losers = comps
      .join(df.select(longIdOrFail(col(idCol), "nearDupKeepBest").as("id"),
        priority.as("__pri")), Seq("id"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy("component").orderBy(col("__pri").desc, col("id").asc)))
      .filter(col("__rk") > 1)
      .select(col("id").as(idCol))
    df.join(losers, Seq(idCol), "left_anti")
  }
}
