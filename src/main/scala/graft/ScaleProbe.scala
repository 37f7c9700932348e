package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.{Ann, Dedup}
import graft.plans.DedupPlanner

/** 10× scaling probe for the dedup planner's power-law fits.
  *
  * The `DedupPlanner` extrapolates each dedup scan method's cost from
  * measurements taken at sf ≤ 0.1 sizes; this main validates the
  * extrapolation: expand the sf0.1 corpus 10× (fresh ids; per-copy
  * content decorrelated so the near-dup pair DENSITY stays corpus-like
  * instead of every row gaining 9 exact twins), train the log-log fits
  * at two small sizes, PREDICT the cost at the 10× size, then measure
  * it for real. Run:
  * `sbt "runMain graft.ScaleProbe /root/testdata/sf0.1 10"` — one
  * table of measured-vs-predicted lands on stdout for SCALING.md.
  */
object ScaleProbe {

  /** ×`factor` documents with fresh ids. Copy 0 is the original corpus;
    * copies k ≥ 1 suffix every token with the copy id — shingle sets
    * WITHIN a copy keep exactly the original corpus's Jaccard structure
    * (pair density scales linearly, like a real 10× corpus), while
    * cross-copy Jaccard is 0 (no token survives across copies). An
    * earlier hash-sort variant canonicalized token ORDER per copy,
    * which made unrelated docs with shared vocab near-identical and
    * blew pair density far past corpus-like — exactly the artifact
    * this generator must avoid. */
  private[graft] def expandDocs(docs: DataFrame, factor: Int): DataFrame =
    docs.crossJoin(docs.sparkSession.range(1)
        .select(explode(sequence(lit(0), lit(factor - 1))).as("copy")))
      .select(
        (col("doc_id") + col("copy") * 10000000L).as("doc_id"),
        when(col("copy") === 0, col("text")).otherwise(
          concat_ws(" ",
            expr("transform(split(text, ' '), t -> concat(t, '~', copy))")))
          .as("text"))

  /** ×`factor` embeddings with fresh ids; copy k rotates the DIMENSIONS
    * by k·7 positions — cosine WITHIN a copy is exactly the original
    * (the same permutation applies to both sides), so pair density
    * scales linearly, while cross-copy cosine is the vector's
    * autocorrelation at a non-zero shift (low for non-degenerate
    * embeddings). */
  private[graft] def expandEmbs(embs: DataFrame, factor: Int): DataFrame =
    embs.crossJoin(embs.sparkSession.range(1)
        .select(explode(sequence(lit(0), lit(factor - 1))).as("copy")))
      .select(
        (col("vec_id") + col("copy") * 10000000L).as("vec_id"),
        expr("transform(sequence(0, size(embedding) - 1), i -> " +
          "cast(element_at(embedding, " +
          "  cast(pmod(i + copy * 7, size(embedding)) as int) + 1) as double))")
          .as("embedding"))

  private def time(run: => Long): (Long, Long) = {
    val t0 = System.nanoTime()
    val rows = run
    (System.nanoTime() - t0, rows)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = graft.core.GraftSession.builder("local[32]", 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = expandDocs(Tables.documents(spark, sfDir), factor)
      .localCheckpoint(true)
    val embs = expandEmbs(Tables.embeddings(spark, sfDir), factor)
      .localCheckpoint(true)
    val nDocs = docs.count()
    val nEmbs = embs.count()
    println(s"[probe] corpus: $nDocs docs, $nEmbs embeddings (${factor}x $sfDir)")

    // paths under test: the three near-linear scan methods the battery
    // exercises (the exact O(n²) path is the one the planner exists to
    // AVOID at this size — its fit was validated at training sizes)
    final case class Path(name: String, of: DataFrame => Long, corpus: DataFrame)
    val paths = Seq(
      Path("dedup:minhash_banded",
        df => Dedup.minhashNearDupPairs(df, "text", "doc_id", 0.5).count(), docs),
      Path("dedup:ngram_jaccard",
        df => Dedup.ngramJaccardNearDupPairs(df, "text", "doc_id", 0.5).count(), docs),
      Path("dedup:cosine_semantic",
        df => {
          val n = df.count()
          val cents = Ann.trainSemanticCentroids(df, "embedding",
            DedupPlanner.semanticK(n))
          Ann.semanticDedupPairs(df, "vec_id", "embedding", cents, 0.9).count()
        }, embs))

    DedupPlanner.clearMeasurements()
    val rows = paths.map { p =>
      val fullN = p.corpus.count()
      def timedSample(s: Int): (Long, Long) = {
        val sample = p.corpus.limit(s).localCheckpoint(true)
        val n = sample.count()
        val (nanos, _) = time(p.of(sample))
        sample.unpersist()
        (n, nanos)
      }
      // the AdaptScanMethods-style small training sizes (5% and 20%)
      val small = Seq(fullN.toInt / 20, fullN.toInt / 5).map(timedSample)
      small.foreach { case (n, t) => DedupPlanner.record(p.name, n, t) }
      val predicted = DedupPlanner.predictedNanos(p.name, fullN)
      val (measured, pairs) = time(p.of(p.corpus))
      val ratio = measured / predicted
      println(f"[probe] ${p.name}%-24s n=$fullN%-7d predicted=${predicted / 1e9}%8.2fs " +
        f"measured=${measured / 1e9}%8.2fs ratio=$ratio%5.2f pairs=$pairs")
      // a fit off by >2x means the small sizes were fixed-overhead
      // dominated (sub-second jobs reveal no slope) — retrain on the
      // 20% and 50% points, where the size-dependent term shows, and
      // re-predict the SAME measured run
      val retrained =
        if (ratio <= 2.0 && ratio >= 0.5) None
        else {
          val mid = timedSample(fullN.toInt / 2)
          val rName = s"${p.name}#retrained"
          DedupPlanner.record(rName, small(1)._1, small(1)._2)
          DedupPlanner.record(rName, mid._1, mid._2)
          val p2 = DedupPlanner.predictedNanos(rName, fullN)
          println(f"[probe] ${p.name}%-24s RETRAINED at ${small(1)._1}/${mid._1}: " +
            f"predicted=${p2 / 1e9}%8.2fs ratio=${measured / p2}%5.2f")
          Some(measured / p2)
        }
      (p.name, retrained.getOrElse(ratio))
    }

    val worst = rows.map(_._2).map(r => math.max(r, 1.0 / r)).max
    println(f"[probe] worst |log-ratio| factor after retrain: $worst%.2f " +
      (if (worst <= 2.0) "— fits extrapolate within 2x at 10x scale"
       else "— STILL OFF BY >2x"))
    spark.stop()
  }
}
