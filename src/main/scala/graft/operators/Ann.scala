package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Materialize.Ops

import graft.functions.{BoundedTopK, Distances}

/** Approximate-nearest-neighbour search over an embedding column
  * (`array<float>`): batch brute-force top-k as the exact baseline, an
  * embedding-cosine near-dup join, and a random-hyperplane-LSH bucketed
  * variant as the scale path.
  *
  * Scale design: the brute-force path is a broadcast of the (small) query
  * set against a full scan; the per-query top-k runs as a bounded-heap
  * aggregate ([[graft.functions.BoundedTopK]]) with map-side partials,
  * so the shuffle carries O(partitions·Q·k) pairs — NOT the full crossed
  * relation funneled onto Q partitions, which is what a window rank
  * would do. The LSH path buckets both sides so the join touches only
  * same-bucket pairs. Neither path ever collects vectors to the driver.
  */
object Ann {

  /** Explode a `bounded_topk` result back to (qid, id, distance, rank). */
  private def explodeTopK(grouped: DataFrame, qIdCol: String, idCol: String): DataFrame =
    grouped.select(col(qIdCol), posexplode(col("tops")).as(Seq("r0", "t")))
      .select(col(qIdCol), col("t.id").as(idCol), col("t.distance").as("distance"),
        (col("r0") + 1).cast("int").as("rank"))

  /** Brute-force exact top-k per query: cross the (broadcast) query set
    * with the corpus, bounded-heap aggregate per query id. Rows whose
    * distance evaluates to null (malformed vectors) are EXCLUDED — the
    * single-query [[Knn.knn]] instead ranks them last; for a batch ANN
    * result a malformed row is noise, not a meaningful neighbour. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     qIdCol: String, vecCol: String, qVecCol: String,
                     dist: (Column, Column) => Column, k: Int): DataFrame =
    explodeTopK(
      corpus.crossJoin(broadcast(queries))
        .groupBy(col(qIdCol))
        .agg(BoundedTopK.topk(dist(col(vecCol), col(qVecCol)), col(idCol), k).as("tops")),
      qIdCol, idCol)

  /** L2-normalized copy of a vector column: `(id, nvec)`. The norm is
    * computed once per row by the codegen dot kernel; zero vectors pass
    * through unscaled (a 0/0 division would poison downstream
    * quantization with NaN/Infinity). */
  def normalized(df: DataFrame, idCol: String, vecCol: String,
                 outCol: String = "nvec"): DataFrame =
    df.select(col(idCol),
        col(vecCol).cast("array<double>").as("__e"),
        Distances.norm2(col(vecCol)).as("__n"))
      .select(col(idCol),
        when(col("__n") > 1e-12, transform(col("__e"), x => x / col("__n")))
          .otherwise(col("__e")).as(outCol))

  /** Build an SQ8 index that answers COSINE top-k: quantize the
    * L2-normalized vectors — for unit vectors ‖x−q‖² = 2 − 2·cos(x,q),
    * so the L2-built scan ranks identically to cosine. The scale path
    * for the hybrid-retrieval vector leg: the ranking scan reads the
    * byte-codes relation (4-8× smaller), never the raw embedding
    * table. */
  def buildCosineSQIndex(df: DataFrame, idCol: String,
                         vecCol: String): graft.index.SQIndex =
    graft.index.SQIndex.build(normalized(df, idCol, vecCol), idCol, "nvec")

  /** Three-stage retrieval FUNNEL — the billion-vector cosine serving
    * shape (coarse → refine → exact, each stage strictly smaller and
    * strictly higher precision):
    *
    *  1. COARSE: 1-bit sign codes rank by Hamming (32× less I/O than
    *     floats) → k·timesK2·timesK1 survivors;
    *  2. REFINE: 8-bit SQ codes ADC over ONLY the coarse survivors
    *     (semi-join on the codes relation) → k·timesK2;
    *  3. EXACT: full-precision cosine re-rank of the refined set → k.
    *
    * Full vectors are touched for k·timesK2 rows only; the corpus-wide
    * pass reads 1 bit/dim. Equals brute force whenever each stage's
    * survivor set covers the true top-k (IndexSpec pins this on the
    * verify corpus — the same exactness contract as every approximate
    * index in the family). */
  def refineTopK(df: DataFrame, idCol: String, vecCol: String,
                 coarse: graft.index.VectorIndex, refine: graft.index.SQIndex,
                 q: Seq[Double], k: Int,
                 timesK1: Int = 5, timesK2: Int = 2): DataFrame = {
    require(k > 0 && timesK1 > 0 && timesK2 > 0, "k and timesK must be positive")
    val n = math.sqrt(q.map(x => x * x).sum)
    val qn = if (n > 1e-12) q.map(_ / n) else q
    val pool = coarse.candidates(qn, k * timesK2, timesK1)
    val refined = refine.candidatesAmong(pool, qn, k, timesK2)
    Knn.rerank(df, refined, idCol,
      Distances.cosine(col(vecCol), Distances.vecLit(q)), k)
  }

  /** Cosine top-k through an index built by [[buildCosineSQIndex]]:
    * candidates from the codes scan (query normalized to match), exact
    * cosine re-rank bounded to the candidate set. Identical to the
    * brute-force ranking whenever the candidate set covers the true
    * top-k (IndexSpec asserts this; `timesK` defaults generous since
    * the codes scan is cheap). */
  def cosineTopKIndexed(df: DataFrame, idCol: String, vecCol: String,
                        idx: graft.index.VectorIndex, q: Seq[Double], k: Int,
                        timesK: Int = 10): DataFrame = {
    val n = math.sqrt(q.map(x => x * x).sum)
    val qn = if (n > 1e-12) q.map(_ / n) else q
    Knn.rerank(df, idx.candidates(qn, k, timesK), idCol,
      Distances.cosine(col(vecCol), Distances.vecLit(q)), k)
  }

  /** All pairs (a < b) with cosine similarity ≥ threshold — embedding
    * near-duplicate detection, exact O(n²/2) variant for modest n (or as
    * the in-bucket verifier of the LSH variant below). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double): DataFrame = {
    // Norms are computed once per row BEFORE the join (n·d work), so the
    // O(n²) pair loop only pays a single fused dot product per pair.
    val withNorm = df.select(col(idCol), col(vecCol),
      Distances.norm2(col(vecCol)).as("nrm"))
    val a = withNorm.select(col(idCol).as("id_a"), col(vecCol).as("v_a"), col("nrm").as("n_a"))
    val b = withNorm.select(col(idCol).as("id_b"), col(vecCol).as("v_b"), col("nrm").as("n_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        when(col("n_a") < 1e-5 || col("n_b") < 1e-5, lit(0.0))
          .otherwise(Distances.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** Binary sign quantization: `dim` floats → `ceil(dim/64)` packed
    * BIGINT words, bit `i` of word `w` set iff `vec[64w+i] > 0` — the
    * 1-bit-per-dimension code RaBitQ/faiss-style binary indexes scan.
    * 32× smaller than the float relation, and Hamming distance between
    * two codes equals the number of dimensions whose SIGN differs — a
    * monotone proxy for angular distance on roughly-centered
    * embeddings. The fold is high-bit-first `acc·2 + bit` integer
    * arithmetic (no shift-by-column anywhere); bit 63 of a full word is
    * added as `Long.MinValue` AFTER the 63-bit fold, because under
    * ANSI SQL semantics (Spark 4's default) `acc·2` past 2^62 would
    * overflow-throw rather than wrap — the word deliberately uses the
    * full two's-complement range. */
  def signPack(vec: Column, dim: Int): Column = {
    require(dim > 0, s"signPack needs a positive dim, got $dim")
    val words = (dim + 63) / 64
    array((0 until words).map { w =>
      val lo = w * 64
      val hi = math.min(lo + 63, dim - 1)
      val full = hi - lo == 63
      val foldHi = if (full) hi - 1 else hi
      val low = aggregate(sequence(lit(foldHi), lit(lo), lit(-1)), lit(0L),
        (acc, i) => acc * 2L +
          when(element_at(vec, (i + 1).cast("int")) > 0f, 1L).otherwise(0L))
      if (full)
        low + when(element_at(vec, lit(hi + 1)) > 0f, lit(Long.MinValue))
          .otherwise(lit(0L))
      else low
    }: _*)
  }

  /** Hamming distance between two packed sign codes:
    * Σ `bit_count(a[w] XOR b[w])` — one codegen'd popcount per 64 dims,
    * the cheapest distance a vector scan can evaluate. */
  def hammingPacked(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, v) => acc + v)

  /** Two-phase binary ANN over sign codes: Hamming on the packed-code
    * relation prunes each query to `k·timesK` candidates (tie-break on
    * id, same total order as the oracle's window), then the exact cosine
    * re-rank touches only those rows' float vectors.
    *
    * Scale shape: phase 1 scans the CODES relation — 1 bit per
    * dimension, 32× less I/O than the float table — with the query
    * codes broadcast and a map-side [[graft.functions.BoundedTopK]]
    * keeping ≤ k·timesK pairs per (partition, query); only those cross
    * the wire. Phase 2 joins the candidate ids back to the float table
    * (a k·timesK·Q-row build side) for the exact score. At 100 TB the
    * full-precision vectors are read for ~40 rows per query instead of
    * the whole corpus; recall is governed by timesK exactly like the
    * SQ8/PQ paths (IndexSpec-style containment asserted in spec). */
  def binarySignTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     qIdCol: String, vecCol: String, qVecCol: String,
                     dim: Int, k: Int, timesK: Int = 4): DataFrame = {
    require(k > 0 && timesK > 0, s"k and timesK must be positive")
    val codes = corpus.select(col(idCol), signPack(col(vecCol), dim).as("__code"))
    val q = queries.select(col(qIdCol), col(qVecCol),
      signPack(col(qVecCol), dim).as("__qcode"))
    val cand = explodeTopK(
      codes.crossJoin(broadcast(q.select(col(qIdCol), col("__qcode"))))
        .groupBy(col(qIdCol))
        .agg(BoundedTopK.topk(hammingPacked(col("__code"), col("__qcode")),
          col(idCol), k * timesK).as("tops")),
      qIdCol, idCol).select(col(qIdCol), col(idCol))
    explodeTopK(
      cand.join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
        .join(broadcast(q.select(col(qIdCol), col(qVecCol))), Seq(qIdCol))
        .groupBy(col(qIdCol))
        .agg(BoundedTopK.topk(Distances.cosine(col(vecCol), col(qVecCol)),
          col(idCol), k).as("tops")),
      qIdCol, idCol)
  }

  /** Batched IVF top-k: ONE distributed job for the whole query batch —
    * per-query leader sets chosen on the driver (centroids are small),
    * broadcast as (qid, leader) pairs into the assignment table, exact
    * distances + per-query bounded-heap top-k over the joined candidates.
    * The per-query-sequential alternative costs Q job launches. */
  def ivfTopK(corpus: DataFrame, idx: graft.index.ECPIndex, idCol: String, vecCol: String,
              queries: Seq[(Long, Seq[Double])], k: Int,
              timesK: Int = graft.index.VectorIndex.TimesK): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val leaderPairs = queries.flatMap { case (qid, q) =>
      idx.chooseLeaders(q, k.toLong * timesK).map(l => (qid, l))
    }.toDF("qid", "leader")
    val qDf = queries.toDF("qid", "qv")
    val cands = idx.assignments.join(broadcast(leaderPairs), "leader").select("qid", idCol)
    explodeTopK(
      cands.join(corpus.select(col(idCol), col(vecCol)), idCol)
        .join(broadcast(qDf), "qid")
        .groupBy(col("qid"))
        .agg(BoundedTopK.topk(
          Distances.euclidean(col(vecCol), col("qv")), col(idCol), k).as("tops")),
      "qid", idCol)
  }

  /** Deterministic pseudo-random Gaussian hyperplanes, derived from the
    * (seed, bit, dim) triple via splitmix64 + Box–Muller — no fitted
    * model, reproducible cluster-wide. */
  def hyperplanes(numBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] =
    Array.tabulate(numBits, dim) { (b, d) =>
      val u1 = mix(seed + b * 1000003L + d * 7919L)
      val u2 = mix(seed + b * 1000003L + d * 7919L + 1L)
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }

  private def mix(z0: Long): Double = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    ((z >>> 11).toDouble / (1L << 53).toDouble) + 1e-12
  }

  /** Band a frame's vectors into `(band, chunk, id)` rows under fixed
    * hyperplanes — the shared candidate-generation step of the self-join
    * and corpus-admission paths. */
  private def bandSignatures(df: DataFrame, idCol: String, vecCol: String,
                             planes: Array[Array[Double]], numBands: Int,
                             bitsPerBand: Int, outId: String): DataFrame = {
    val mask = (1L << bitsPerBand) - 1
    df.select(col(idCol).as(outId),
        graft.functions.HashSig.hyperplaneSig(col(vecCol), planes).as("sig"))
      .select(col(outId), explode(sequence(lit(0), lit(numBands - 1))).as("band"), col("sig"))
      .withColumn("chunk",
        call_function("shiftright", col("sig"), col("band") * bitsPerBand)
          .bitwiseAND(mask))
      .select(outId, "band", "chunk")
  }

  /** A reference embedding corpus prepared for incoming-vs-corpus
    * near-dup checks: band keys + vectors with norms, computed once and
    * persisted — the cosine twin of [[Dedup.CorpusIndex]]. */
  final case class CosineCorpusIndex(banded: DataFrame, // (corpus_id, band, chunk)
                                     vectors: DataFrame, // (corpus_id, v_c, n_c)
                                     planes: Array[Array[Double]],
                                     numBands: Int, bitsPerBand: Int) {
    def release(): Unit = {
      banded.unpersist()
      vectors.unpersist()
    }
  }

  /** Band + norm a static embedding corpus once (both persisted). */
  def indexCorpusCosine(corpus: DataFrame, idCol: String, vecCol: String,
                        dim: Int, numBits: Int = 64, numBands: Int = 16,
                        seed: Long = 42L): CosineCorpusIndex = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val bitsPerBand = numBits / numBands
    val planes = hyperplanes(numBits, dim, seed)
    val banded = bandSignatures(corpus, idCol, vecCol, planes, numBands,
      bitsPerBand, "corpus_id").persist(MEMORY_AND_DISK)
    val vectors = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("v_c"),
      Distances.norm2(col(vecCol)).as("n_c")).persist(MEMORY_AND_DISK)
    CosineCorpusIndex(banded, vectors, planes, numBands, bitsPerBand)
  }

  /** Embedding admission check: flag incoming vectors whose cosine
    * similarity to anything already ingested reaches `threshold` — the
    * "is this newly-embedded document a near-duplicate of the training
    * corpus?" gate. Incoming rows band inline under the corpus's fixed
    * hyperplanes and equi-join the prepared band index; only
    * bucket-colliding (in, corpus) pairs pay the exact verify. The join
    * is stream-static (zero stream-side state) — usable unchanged under
    * `foreachBatch` like the MinHash admission check. */
  def cosineNearDupAgainstCorpus(incoming0: DataFrame, idCol: String, vecCol: String,
                                 idx: CosineCorpusIndex, threshold: Double): DataFrame = {
    // spread a narrow incoming batch before the signature kernel and
    // the per-candidate verify (no-op at scale)
    val incoming = graft.core.Parallelism.fanOut(incoming0, col(idCol))
    val inBanded = bandSignatures(incoming, idCol, vecCol, idx.planes,
      idx.numBands, idx.bitsPerBand, "in_id")
    val cand = inBanded.join(idx.banded, Seq("band", "chunk"))
      .select("in_id", "corpus_id").distinct()
    val inVec = incoming.select(col(idCol).as("in_id"), col(vecCol).as("v_i"),
      Distances.norm2(col(vecCol)).as("n_i"))
    cand.join(inVec, Seq("in_id"))
      .join(idx.vectors, Seq("corpus_id"))
      .withColumn("cos_sim",
        when(col("n_i") < 1e-5 || col("n_c") < 1e-5, lit(0.0))
          .otherwise(Distances.dot(col("v_i"), col("v_c")) / (col("n_i") * col("n_c"))))
      .filter(col("cos_sim") >= threshold)
      .select(col("in_id"), col("corpus_id"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** LSH-bucketed cosine near-dup pairs: bucket on chunks of the packed
    * hyperplane signature (banding), then verify true cosine. Candidates
    * carry only ids through the band shuffle; vectors are re-joined by
    * id after the pair `distinct` (same scale shape as the MinHash
    * path). Recall < 1 is possible by construction — tune bands/bits.
    * `maxBucket` ([[Dedup.capBuckets]]) drops mega-buckets (e.g. a mass
    * of near-zero or template embeddings hashing identically) before
    * pair enumeration — bounds the O(bucket²) candidate output AQE's
    * skew split cannot; default off. */
  def lshCosineNearDupPairs(df0: DataFrame, idCol: String, vecCol: String,
                            threshold: Double, dim: Int, numBits: Int = 64,
                            numBands: Int = 16, seed: Long = 42L,
                            maxBucket: Int = Int.MaxValue): DataFrame = {
    val bitsPerBand = numBits / numBands
    val planes = hyperplanes(numBits, dim, seed)
    // both the signature kernel (numBits dot products/row) and the
    // pair verify (one dot product/candidate) are CPU-bound — spread a
    // narrower-than-the-session corpus first (no-op at scale)
    val df = graft.core.Parallelism.fanOut(df0, col(idCol))
    // The banded relation feeds both sides of the self-join; without a
    // persist the hyperplane-signature kernel runs twice over the corpus.
    // Candidates are id pairs only (tiny next to the corpus), so
    // materialize them eagerly and release the cache before building the
    // verify plan — same shape as Dedup.ngramJaccardNearDupPairs.
    val banded = Dedup.capBuckets(
      bandSignatures(df, idCol, vecCol, planes, numBands, bitsPerBand, "id"),
      Seq("band", "chunk"), maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cand = banded.select(col("band"), col("chunk"), col("id").as("id_a"))
      .join(banded.select(col("band"), col("chunk"), col("id").as("id_b")), Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
      // NB: Materialize truncates lineage — without a checkpoint dir an
      // executor loss fails the job rather than recomputing; call
      // setCheckpointDir on a real cluster for the reliable mode.
      .materialized
    banded.unpersist()
    val withNorm = df.select(col(idCol).as("id"), col(vecCol).as("v"),
      Distances.norm2(col(vecCol)).as("nrm"))
    cand
      .join(withNorm.select(col("id").as("id_a"), col("v").as("v_a"), col("nrm").as("n_a")), Seq("id_a"))
      .join(withNorm.select(col("id").as("id_b"), col("v").as("v_b"), col("nrm").as("n_b")), Seq("id_b"))
      .withColumn("cos_sim",
        when(col("n_a") < 1e-5 || col("n_b") < 1e-5, lit(0.0))
          .otherwise(Distances.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  // ---- SemDeDup: clustered semantic deduplication (Abbas et al. 2023,
  // "SemDeDup: Data-efficient learning at web-scale through semantic
  // deduplication") — assign every embedding to its nearest centroid,
  // then find near-duplicate pairs only WITHIN each cluster. The cluster
  // pass turns the O(n²) global pair search into Σ O(|cluster|²), the
  // property that makes embedding dedup tractable at corpus scale. ----

  /** Nearest-centroid assignment as a pure projection: the centroid set
    * is tiny (k vectors), so each row evaluates k fused cosine kernels
    * inline — zero shuffle, zero join, fully codegen. Ties break to the
    * LOWEST centroid index (deterministic). Zero-norm rows score 0
    * against every centroid and land by the tie rule.
    * Returns the input plus `cluster` (int) and `centroid_sim` (double). */
  def assignClusters(df: DataFrame, vecCol: String,
                     centroids: Seq[Seq[Double]]): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val nrm = Distances.norm2(col(vecCol))
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      val sim =
        if (cn < 1e-5) lit(0.0)
        else when(nrm < 1e-5, lit(0.0))
          .otherwise(Distances.dot(col(vecCol), Distances.vecLit(c)) / (nrm * cn))
      // struct orders by (sim, -idx): sort desc ⇒ max sim, then min idx
      struct(sim.as("s"), lit(-i).as("ni"))
    }
    val best = sort_array(array(scored: _*), asc = false).getItem(0)
    df.withColumn("cluster", (-best.getField("ni")).cast("int"))
      .withColumn("centroid_sim", best.getField("s"))
  }

  /** Train `k` centroids for the SemDeDup family on a bounded sample —
    * deterministic Lloyd's k-means (fixed seed, ≤5000-row sample),
    * reusing the eCP leader trainer. With trained centroids the
    * clustered dedup is self-contained: callers need no external
    * centroid source. */
  def trainSemanticCentroids(df: DataFrame, vecCol: String, k: Int): Seq[Seq[Double]] =
    graft.core.Partitioning.trainLeaders(df, vecCol, k).map(_.toSeq).toSeq

  /** Within-cluster near-duplicate pairs: one shuffle on the cluster key,
    * then per-cluster pair enumeration with an exact cosine verify. At
    * 100 TB, k grows with the corpus (k ≈ √n keeps clusters bounded), so
    * no single task ever sees more than one cluster's pairs. */
  def semanticDedupPairs(df: DataFrame, idCol: String, vecCol: String,
                         centroids: Seq[Seq[Double]], threshold: Double,
                         maxBucket: Int = Int.MaxValue): DataFrame = {
    // both sides of the cluster self-join (and the survivors anti-join
    // downstream) read this frame — materialize it once, eagerly, or
    // the k-fused-cosine assignment kernel (k·d FLOPs/row) and the
    // underlying scan run 2-3×. Materialize (not persist/unpersist)
    // because the result is returned lazily: the blocks live as long
    // as the returned plan references them and are reclaimed by the
    // ContextCleaner when the caller drops it — in RELIABLE mode the
    // checkpoint FILES too, via the cleanCheckpoints conf Materialize
    // documents (GraftSession sets it).
    val checkpointed = assignClusters(df, vecCol, centroids)
      .select(col("cluster"), col(idCol).as("id"), col(vecCol).as("v"),
        Distances.norm2(col(vecCol)).as("nrm"))
      .materialized
    // mega-cluster guard, same rationale as the banded paths: a
    // degenerate centroid set (or a mass of zero-norm rows, which all
    // tie to cluster 0) makes ONE cluster emit O(|cluster|²) pairs that
    // no AQE split can bound — cap drops such clusters before pairing.
    // Default Int.MaxValue is the identity: bit-identical plan.
    val assigned = Dedup.capBuckets(checkpointed, Seq("cluster"), maxBucket)
    val a = assigned.select(col("cluster"), col("id").as("id_a"),
      col("v").as("v_a"), col("nrm").as("n_a"))
    val b = assigned.select(col("cluster"), col("id").as("id_b"),
      col("v").as("v_b"), col("nrm").as("n_b"))
    a.join(b, Seq("cluster")).filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim",
        when(col("n_a") < 1e-5 || col("n_b") < 1e-5, lit(0.0))
          .otherwise(Distances.dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))))
      .filter(col("cos_sim") >= threshold)
      .select(col("cluster"), col("id_a"), col("id_b"),
        round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** A reference embedding corpus pre-assigned to centroid cells for
    * cluster-pruned admission checks — the SemDeDup twin of
    * [[CosineCorpusIndex]], with IVF-style cell pruning in place of
    * hyperplane banding. */
  final case class SemanticCorpusIndex(assigned: DataFrame, // (cluster, corpus_id, v_c, n_c)
                                       centroids: Seq[Seq[Double]]) {
    def release(): Unit = assigned.unpersist()
  }

  /** Assign + norm a static corpus once (persisted). */
  def indexCorpusSemantic(corpus: DataFrame, idCol: String, vecCol: String,
                          centroids: Seq[Seq[Double]]): SemanticCorpusIndex = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val assigned = assignClusters(corpus, vecCol, centroids)
      .select(col("cluster"), col(idCol).as("corpus_id"), col(vecCol).as("v_c"),
        Distances.norm2(col(vecCol)).as("n_c"))
      .persist(MEMORY_AND_DISK)
    SemanticCorpusIndex(assigned, centroids)
  }

  /** Cluster-pruned embedding admission check: an incoming vector is
    * compared ONLY against corpus vectors in its own centroid cell —
    * exact within the cell, and the cross-cell misses are the same ones
    * SemDeDup itself accepts. The join is an equi-join on the cluster
    * key with the corpus side persisted, so per incoming row the work is
    * O(|cell|), not O(|corpus|); stream-static safe under `foreachBatch`
    * like the banded variants. */
  def semanticNearDupAgainstCorpus(incoming: DataFrame, idCol: String, vecCol: String,
                                   idx: SemanticCorpusIndex, threshold: Double,
                                   maxBucket: Int = Int.MaxValue): DataFrame = {
    val in = assignClusters(incoming, vecCol, idx.centroids)
      .select(col("cluster"), col(idCol).as("in_id"), col(vecCol).as("v_i"),
        Distances.norm2(col(vecCol)).as("n_i"))
    // cap degenerate corpus CELLS (same guard as semanticDedupPairs):
    // every incoming row assigned to an over-cap cell would otherwise
    // compare against the whole cell; identity at the default
    in.join(Dedup.capBuckets(idx.assigned, Seq("cluster"), maxBucket),
        Seq("cluster"))
      .withColumn("cos_sim",
        when(col("n_i") < 1e-5 || col("n_c") < 1e-5, lit(0.0))
          .otherwise(Distances.dot(col("v_i"), col("v_c")) / (col("n_i") * col("n_c"))))
      .filter(col("cos_sim") >= threshold)
      .select(col("in_id"), col("corpus_id"), round(col("cos_sim"), 4).as("cos_sim"))
  }

  /** SemDeDup survivors under the greedy lowest-id rule: a row is dropped
    * iff some lower-id row in its cluster reaches the threshold. The rule
    * is local to each pair (no transitive chase), so it is exactly
    * reproducible by any engine — and at scale it is one left-anti join
    * of ids against the (tiny) dropped-id set. */
  def semanticDedupSurvivors(df: DataFrame, idCol: String, vecCol: String,
                             centroids: Seq[Seq[Double]], threshold: Double,
                             maxBucket: Int = Int.MaxValue): DataFrame = {
    val dropped = semanticDedupPairs(df, idCol, vecCol, centroids, threshold,
      maxBucket)
      .select(col("id_b").as(idCol)).distinct()
    df.join(dropped, Seq(idCol), "left_anti")
  }

  /** Late-interaction retrieval (ColBERT-style MaxSim) over MULTI-VECTOR
    * documents: each document is a bag of chunk/token embeddings, the
    * query is a SET of vectors, and
    * `score(doc) = Σ_q max_{v ∈ doc} cosine_sim(q, v)` — every query
    * vector independently finds its best-matching chunk, so a document
    * matching different query aspects in different passages outranks
    * one whose single centroid is merely close on average (what a
    * pooled-embedding kNN would measure).
    *
    * Plan shape: the Q per-row similarities are Q codegen kernel
    * columns over the chunk scan (queries ride as broadcast literals),
    * partial `max` per (doc, q) collapses map-side, the final per-doc
    * sum + top-k is `TakeOrderedAndProject` — ONE shuffle of Q doubles
    * per doc, chunks never move. Q is the query's token count
    * (small, bounded); corpus growth only widens the scan. */
  /** MaxSim through a vector index — the 100 TB path: each query
    * vector pulls its candidate CHUNKS from the index (built by
    * [[buildCosineSQIndex]]; queries normalize to match), candidates
    * map to their owning documents, and the EXACT [[maxSimTopK]]
    * scoring reruns over every chunk of just those candidate docs — so
    * only document recall matters: a true top-k doc is scored exactly
    * as long as ANY of its chunks surfaces for ANY query vector
    * (`timesK` defaults generous; the codes scan is cheap). Corpus
    * chunks are touched twice (codes scan + candidate-doc rerank),
    * never pairwise. */
  def maxSimTopKIndexed(chunks: DataFrame, docCol: String, vecCol: String,
                        idCol: String, idx: graft.index.VectorIndex,
                        queries: Seq[Seq[Double]], k: Int,
                        timesK: Int = 10): DataFrame = {
    require(queries.nonEmpty, "at least one query vector required")
    // ONE batched candidate pass: all Q query vectors ride the same
    // index-relation scan (SQ codes override), not Q sequential jobs
    val qn = queries.map { q =>
      val n = math.sqrt(q.map(x => x * x).sum)
      if (n > 1e-12) q.map(_ / n) else q
    }
    val candChunks = idx.candidatesBatch(qn, k, timesK)
      .select(col(idCol)).distinct()
    val candDocs = chunks
      .join(candChunks, Seq(idCol), "left_semi")
      .select(col(docCol)).distinct()
    maxSimTopK(chunks.join(candDocs, Seq(docCol), "left_semi"),
      docCol, vecCol, queries, k)
  }

  def maxSimTopK(chunks: DataFrame, docCol: String, vecCol: String,
                 queries: Seq[Seq[Double]], k: Int): DataFrame = {
    require(queries.nonEmpty, "at least one query vector required")
    require(k > 0, "k must be positive")
    val sims = queries.zipWithIndex.map { case (q, i) =>
      graft.functions.Distances.cosineSim(col(vecCol),
        graft.functions.Distances.vecLit(q)).as(s"ap_s$i") }
    val maxes = queries.indices.map(i => max(col(s"ap_s$i")).as(s"ap_m$i"))
    chunks.select(col(docCol).as("doc_id") +: sims: _*)
      .groupBy("doc_id")
      .agg(maxes.head, maxes.tail: _*)
      .withColumn("score", queries.indices.map(i => col(s"ap_m$i")).reduce(_ + _))
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }
}
