package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Ann, Dedup}

/** Dedup-family recall probe — the near-dup analogue of [[Recall]]:
  * measures the PROBABILISTIC candidate paths (MinHash banding,
  * SimHash banding, sign-LSH cosine banding) against exact ground
  * truth on the fixture corpus, so the recall the banded plans trade
  * for their bucketed shuffle shape is a printed number, not a claim.
  *
  * Ground truths are themselves the engine's lossless paths: PPJoin
  * (`ngramJaccardNearDupPairs`, spec-asserted ≡ cartesian) for text
  * Jaccard, and the exact all-pairs cosine join for embeddings —
  * runnable at probe scale precisely because the fixtures are small;
  * at corpus scale only the banded paths exist, which is why this
  * probe exists.
  *
  * `sbt "runMain graft.DedupProbe <sfDir> [jaccardThreshold] [cosineThreshold]"`
  */
object DedupProbe {

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("id_a").cast("long"), col("id_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def report(name: String, est: Set[(Long, Long)],
                     truth: Set[(Long, Long)]): Unit = {
    val tp = est.intersect(truth).size
    val recall = if (truth.isEmpty) 1.0 else tp.toDouble / truth.size
    val precision = if (est.isEmpty) 1.0 else tp.toDouble / est.size
    println(f"[dedup-recall] $name%-22s pairs=${est.size}%5d truth=${truth.size}%5d " +
      f"recall=$recall%.3f precision=$precision%.3f")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val jt = args.lift(1).map(_.toDouble).getOrElse(0.5)
    val ct = args.lift(2).map(_.toDouble).getOrElse(0.85)
    val spark = graft.core.GraftSession.builder("local[8]", 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir).cache()
    docs.count()
    println(s"[dedup-recall] sf=$sfDir jaccard>=$jt cosine>=$ct")

    // text: PPJoin exact truth vs MinHash banding (served config + a
    // leaner 48/12 variant to show the knob)
    val truth = pairSet(Dedup.ngramJaccardNearDupPairs(docs, "text", "doc_id", jt))
    report("minhash-96x24", pairSet(
      Dedup.minhashNearDupPairs(docs, "text", "doc_id", jt)), truth)
    report("minhash-48x12", pairSet(
      Dedup.minhashNearDupPairs(docs, "text", "doc_id", jt,
        numHashes = 48, numBands = 12)), truth)
    docs.unpersist()

    // embeddings: exact all-pairs cosine truth vs banded sign-LSH
    val emb = Tables.embeddings(spark, sfDir).cache()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val cosTruth = pairSet(Ann.cosineNearDupPairs(emb, "vec_id", "embedding", ct))
    report("lsh-cosine-64x16", pairSet(
      Ann.lshCosineNearDupPairs(emb, "vec_id", "embedding", ct, dim)), cosTruth)
    report("lsh-cosine-64x8", pairSet(
      Ann.lshCosineNearDupPairs(emb, "vec_id", "embedding", ct, dim,
        numBands = 8)), cosTruth)
    emb.unpersist()
    spark.stop()
  }
}
