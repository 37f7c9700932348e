package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.Materialize.Ops

import graft.functions.{WinnowExpr, WinnowFingerprints}

/** Winnowing fingerprints (the MOSS local document-fingerprinting
  * algorithm): k-gram rolling hashes thinned by a sliding window-min so
  * that any shared substring of length ≥ `w + k - 1` between two
  * documents is GUARANTEED to surface as a shared fingerprint, at a
  * ~2/(w+1) sampling density. This fills the gap between exact content
  * hashing (whole-doc only), CDC chunk hashing (boundary-aligned spans),
  * and MinHash (whole-doc set similarity, no locality): winnowing finds
  * LOCAL copied passages with a provable detection guarantee.
  *
  * Reference scope: ADAMpro has no text tooling; this extends the
  * engine's LLM-pipeline brief (document fingerprinting / local
  * plagiarism-grade overlap). Algorithm per Schleimer, Wilkerson &
  * Aiken, "Winnowing: Local Algorithms for Document Fingerprinting"
  * (SIGMOD 2003) — public literature, re-expressed Spark-first.
  *
  * Scale shape: fingerprint computation is a per-row codegen kernel
  * ([[graft.functions.WinnowExpr]]) riding the scan — zero shuffle.
  * Pair detection explodes DISTINCT fingerprint hashes (≈ 2·chars/(w+1)
  * longs per doc, a ~30× reduction of the gram stream) and self-joins
  * on the hash with the same mega-bucket cap as the MinHash path, so a
  * boilerplate fingerprint shared by 100k docs cannot emit O(10^10)
  * pairs. Ids and counts only cross the wire; text never shuffles.
  */
object Winnow {

  /** Packed fingerprints (`hash·2^33 + pos`) of the normalized text. */
  def fingerprints(text: Column, k: Int = 8, w: Int = 15): Column =
    WinnowFingerprints(Dedup.normalize(text), k, w)

  /** Per-document fingerprint profile: gram count, selected fingerprint
    * count, distinct hash count — the density diagnostic (expected
    * selected/grams ≈ 2/(w+1)). Zero-shuffle scan. */
  def profile(df: DataFrame, textCol: String, idCol: String,
              k: Int = 8, w: Int = 15): DataFrame = {
    val fps = fingerprints(col(textCol), k, w)
    df.select(col(idCol).cast("long").as("id"),
        greatest(length(Dedup.normalize(col(textCol))) - (k - 1), lit(0))
          .cast("long").as("n_grams"),
        fps.as("__fps"))
      .select(col("id"), col("n_grams"),
        size(col("__fps")).cast("long").as("n_fps"),
        size(array_distinct(transform(col("__fps"),
          p => shiftright(p, 33)))).cast("long").as("n_distinct_hashes"))
  }

  /** One row per (document, distinct fingerprint hash) — the exploded
    * relation pair detection joins on. Position is dropped here on
    * purpose: a copied passage sits at different offsets in the two
    * documents, so cross-doc identity is the hash alone. */
  private[graft] def hashRelation(df: DataFrame, textCol: String, idCol: String,
                           k: Int, w: Int): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        // packed = hash·2^33 + pos with hash < 2^30, pos < 2^33, so the
        // shift recovers the hash exactly (a double-typed divide would
        // lose the low bits of the 63-bit pack)
        array_distinct(transform(fingerprints(col(textCol), k, w),
          p => shiftright(p, 33))).as("__hs"))
      .select(col("id"), explode(col("__hs")).as("fp_hash"))

  /** Document pairs sharing ≥ `minShared` distinct fingerprint hashes,
    * with the shared count and the containment fraction
    * `shared / min(|A|, |B|)` (the MOSS report metric). `maxBucket`
    * bounds any one hash's bucket exactly like the MinHash banding cap.
    *
    * One exchange keyed by `fp_hash` for the self-join (ids + one long
    * each), one keyed by the pair for the count, plus two broadcast-size
    * joins of the per-doc distinct-hash counts (#docs rows). */
  def overlapPairs(df: DataFrame, textCol: String, idCol: String,
                   k: Int = 8, w: Int = 15, minShared: Int = 2,
                   maxBucket: Int = Int.MaxValue): DataFrame = {
    val (pairs, rel) = overlapPlan(df, textCol, idCol, k, w, minShared, maxBucket)
    // Materialize the (pair-scale) result eagerly so the cached hash
    // relation can be released NOW — same discipline as
    // Dedup.ngramJaccardNearDupPairs. Without the persist the
    // O(chars)-per-row rolling-hash kernel would re-execute once per
    // consumer (counts + both self-join sides = 3× the corpus scan).
    val out = pairs.materialized
    rel.unpersist()
    out
  }

  /** The lazy plan behind [[overlapPairs]]: (pairs, the persisted hash
    * relation the caller must unpersist after materializing). The hash
    * relation feeds three consumers (per-doc counts and both self-join
    * sides), so it MUST be cached — package-private so specs can assert
    * the join shape pre-checkpoint. */
  private[graft] def overlapPlan(df: DataFrame, textCol: String, idCol: String,
                                 k: Int, w: Int, minShared: Int,
                                 maxBucket: Int): (DataFrame, DataFrame) = {
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    // NOT fanned out (r21 A/B: battery +1.05 s): the cached hash
    // relation shuffles into the fp_hash self-join immediately, so the
    // extra up-front exchange buys nothing
    val rel = Dedup.capBuckets(
      hashRelation(df, textCol, idCol, k, w), Seq("fp_hash"), maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = rel.groupBy("id").agg(count(lit(1)).as("n"))
    val a = rel.select(col("id").as("id_a"), col("fp_hash"))
    val b = rel.select(col("id").as("id_b"), col("fp_hash"))
    val pairs = a.join(b, Seq("fp_hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
      .join(counts.select(col("id").as("id_a"), col("n").as("__na")), Seq("id_a"))
      .join(counts.select(col("id").as("id_b"), col("n").as("__nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("shared_fps"),
        round(col("shared_fps") / least(col("__na"), col("__nb")), 4)
          .as("containment"))
    (pairs, rel)
  }
}
