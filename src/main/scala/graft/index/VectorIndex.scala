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

  /** Candidate rows `(id)` for the query vector — no exact distances. */
  def candidates(q: Seq[Double], k: Int, timesK: Int = VectorIndex.TimesK): DataFrame

  /** Full kNN: candidates → exact re-rank against the entity. */
  def knn(entity: DataFrame, idCol: String, dist: Column, q: Seq[Double], k: Int,
          timesK: Int = VectorIndex.TimesK): DataFrame =
    Knn.rerank(entity, candidates(q, k, timesK), idCol, dist, k)
}

object VectorIndex {
  /** Reference default candidate multiplier (`PQIndex.scala:35` etc.). */
  val TimesK = 5

  /** Reference minimum tuples to build (`IndexGenerator.scala:22`). */
  val MinTuples = 1000L

  /** Default training-sample size (reference `ntraining` defaults). */
  val DefaultTrainingSize = 5000
}
