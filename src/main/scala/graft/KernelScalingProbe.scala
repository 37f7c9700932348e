package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Ann, Dedup, Multimodal, TextAnalysis}

/** Compute-bound core-scaling probe (r21 verdict item 9): the sf0.1
  * battery is overhead-bound (8c/32c ratios ~1), so the r21/r22 fan-out
  * claims rest on CPU arithmetic. This main times the kernel-heavy
  * operator paths on a 10x-expanded corpus (ScaleProbe's decorrelated
  * expander) / a 10x image-id spine, at whatever core count it is given:
  * `runMain graft.KernelScalingProbe <sfDir> <cpus> [factor]` — run at 8
  * and 32 and compare walls in SCALING.md. */
object KernelScalingProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = args(1).toInt
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.core.GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    import graft.core.Materialize.Ops
    // pre-materialize the expanded inputs so the timed region is the
    // kernel + its pipeline, not the expansion cross-join
    // fixture prep (untimed): spread the expanded inputs WIDE before
    // materializing — the cross-join expander yields ~1 partition, and a
    // 1-partition source serializes the first exchange write, which
    // would otherwise dominate the timed region and mask kernel scaling
    val docs = ScaleProbe.expandDocs(Tables.documents(spark, sfDir), factor)
      .repartition(cpus * 2).materialized
    val embs = ScaleProbe.expandEmbs(Tables.embeddings(spark, sfDir), factor)
      .repartition(cpus * 2).materialized
    val imageIds = spark.range(600L * factor).select(col("id").as("doc_id"))
      .repartition(cpus * 2).materialized
    def time(label: String)(body: => Long): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[kscale] cpus=$cpus $label%-28s min=${runs.min}%7.2f " +
        s"runs=${runs.map(r => f"$r%.2f").mkString("[", ",", "]")}")
    }
    time(s"cdc_chunks x$factor")(Dedup.cdcChunks(docs, "text", "doc_id").count())
    time(s"cdc_repeated_chunks x$factor")(Dedup.cdcRepeatedChunks(docs, "text", "doc_id").count())
    if (factor <= 10)
      time(s"lsh_cosine_neardup x$factor")(
        Ann.lshCosineNearDupPairs(embs, "vec_id", "embedding", 0.5, dim = 64).count())
    time(s"image_neardup_dhash x$factor")(Multimodal.imageNearDupPairs(
      Multimodal.syntheticPatternImages(imageIds, "doc_id")).count())
    time(s"chunk_text x$factor")(
      TextAnalysis.chunkText(docs, "text", "doc_id", 128, 96).count())
    spark.stop()
  }
}
