package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Knn

/** Common surface of the vector index family (reference §2.6:
  * `/root/reference/src/main/scala/org/vitrivr/adampro/data/index/Index.scala:59-76`).
  *
  * Spark-first shape: an index is a narrow DataFrame keyed by the entity
  * id plus small driver-side metadata (centroids, marks, projections —
  * all O(KB..MB), broadcast into scan expressions). A scan produces a
  * *candidate id set* as a DataFrame; the planner wraps it in an exact
  * re-rank over the entity (`IndexScanExpression.rewrite`,
  * `IndexScanExpression.scala:89-98`) — candidates flow as a semi-join,
  * never a collected id list.
  */
trait VectorIndex {
  def indexType: String

  /** Entity id column the index's narrow table is keyed by. */
  def idCol: String

  /** Exact indexes guarantee candidates ⊇ the true top-k. */
  def isExact: Boolean

  /** Confidence score in [0,1] (reference `Index.scala:59-76`). */
  def confidence: Double = if (isExact) 1.0 else 0.5

  /** Distance families this index answers (lowercase names); empty =
    * any. Mirrors `isQueryConform` (reference `Index.scala:193`). */
  def conformsTo(distName: String): Boolean = true

  /** True when [[candidatesW]] honors per-dim weights LOSSLESSLY for
    * this distance family. Default: no — most structures prune with the
    * unweighted metric (PQ codebooks, hash signatures, cluster probes),
    * and a weighted rerank over unweighted candidates can miss true
    * weighted neighbours. VA overrides: its per-dim bound terms scale
    * by w_d without losing the guarantee. */
  def conformsToWeighted(distName: String, weights: Seq[Double]): Boolean = false

  /** Candidate rows `(id)` for the query vector — no exact distances. */
  def candidates(q: Seq[Double], k: Int, timesK: Int = VectorIndex.TimesK): DataFrame

  /** Candidate rows `(qid, id)` for a BATCH of query vectors, `qid` =
    * position in `qs`. Default: per-query [[candidates]] scans unioned —
    * correct everywhere, but Q separate jobs over the index relation.
    * Structures whose scan is a single relation pass (SQ codes) override
    * with ONE scan carrying all Q kernels, so a multi-vector query
    * (MaxSim's token batch) costs one job, not Q. */
  def candidatesBatch(qs: Seq[Seq[Double]], k: Int,
                      timesK: Int = VectorIndex.TimesK): DataFrame = {
    require(qs.nonEmpty, "at least one query vector required")
    qs.zipWithIndex.map { case (q, i) =>
      candidates(q, k, timesK).select(lit(i).as("qid"), col(idCol))
    }.reduce(_ unionByName _)
  }

  /** Weighted-query candidates — only meaningful when
    * [[conformsToWeighted]] holds. */
  def candidatesW(q: Seq[Double], weights: Seq[Double], k: Int,
                  timesK: Int = VectorIndex.TimesK): DataFrame =
    throw new UnsupportedOperationException(
      s"index $indexType has no weighted candidate pruning")

  /** Full kNN: candidates → exact re-rank against the entity. */
  def knn(entity: DataFrame, idCol: String, dist: Column, q: Seq[Double], k: Int,
          timesK: Int = VectorIndex.TimesK): DataFrame =
    Knn.rerank(entity, candidates(q, k, timesK), idCol, dist, k)

  /** Weighted kNN: weighted candidates → exact weighted re-rank (`dist`
    * must be the weighted distance column). */
  def knnW(entity: DataFrame, idCol: String, dist: Column, q: Seq[Double],
           weights: Seq[Double], k: Int,
           timesK: Int = VectorIndex.TimesK): DataFrame =
    Knn.rerank(entity, candidatesW(q, weights, k, timesK), idCol, dist, k)
}

object VectorIndex {
  /** Reference default candidate multiplier (`PQIndex.scala:35` etc.). */
  val TimesK = 5

  /** Reference minimum tuples to build (`IndexGenerator.scala:22`). */
  val MinTuples = 1000L

  /** Default training-sample size (reference `ntraining` defaults). */
  val DefaultTrainingSize = 5000
}
