package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame}
import graft.core.Materialize.Ops

import graft.index.VectorIndex
import graft.operators.Knn

/** Access-path selection — the reference's hint-driven + empirical
  * planner (`HintBasedScanExpression.scala:93-176`, `QueryHints.scala:12-68`,
  * naive measured-cost scoring `NaiveHeuristics.scala:120-151`).
  *
  * Hints are walked in order until a usable plan is found; `IndexHint`
  * expands to the reference's priority list vaf→vav→vap→pq→ecp→sh→lsh→mi;
  * fallback is the exact sequential scan. `Empirical` scores candidate
  * paths from recorded (time, recall) measurements — smaller is better:
  * `time · (2 − recall)`.
  */
object Planner {

  sealed trait Hint
  case object SequentialHint extends Hint
  case object ExactHint extends Hint // any exact plan: exact index, else sequential
  case object IndexHint extends Hint // any conforming index, priority order
  case class SpecificIndexHint(indexType: String) extends Hint
  case object EmpiricalHint extends Hint
  /** Score by the learned linear cost model at corpus size `n`. */
  case class LearnedHint(n: Long) extends Hint
  /** Score by the Pegasos-SVM runtime model at corpus size `n` — the
    * reference's third scorer (`SVMPlannerHeuristics`). */
  case class SvmHint(n: Long) extends Hint

  /** Reference index priority (`QueryHints.scala:19-38`), extended with
    * the ivfpq structure after its plain-PQ sibling. */
  val IndexPriority: Seq[String] =
    Seq("vaf", "vav", "vap", "sq", "pq", "ivfpq", "ecp", "sh", "lsh", "mi")

  /** Hint grammar — the reference's `QueryHints.withName` string surface
    * (`QueryHints.scala:40-68`): RPC callers pass hints by name. */
  def hintByName(name: String): Option[Hint] = name.toLowerCase.trim match {
    case "sequential" | "sequential_query" => Some(SequentialHint)
    case "exact" | "exact_query" => Some(ExactHint)
    case "index" | "index_query" | "inexact" | "inexact_query" => Some(IndexHint)
    case "empirical" => Some(EmpiricalHint)
    case t if IndexPriority.contains(t) => Some(SpecificIndexHint(t))
    case _ => None
  }

  /** Parse a hint list, dropping unknown names (reference behaviour). */
  def hintsByName(names: Seq[String]): Seq[Hint] = names.flatMap(hintByName)

  sealed trait Plan { def describe: String }
  case class SequentialPlan() extends Plan { val describe = "sequential" }
  case class IndexPlan(index: VectorIndex) extends Plan {
    def describe: String = s"index:${index.indexType}"
  }

  final case class Measurement(timeNanos: Long, recall: Double, n: Long = 0L)

  /** Measured-cost table keyed by plan description. Fed by
    * [[Progressive]] executions (every completed plan run lands here) —
    * the reference trains its scan-method scorers from measured queries
    * the same way (`NaiveOptimizerHeuristics.adaptScanMethods`). */
  private val stats = TrieMap.empty[String, List[Measurement]]

  def record(plan: Plan, m: Measurement): Unit = record(plan.describe, m)

  def record(planDescription: String, m: Measurement): Unit =
    stats.updateWith(planDescription)(prev => Some(m :: prev.getOrElse(Nil).take(19)))

  /** Drop all measurements (test isolation / fresh training). */
  def clearMeasurements(): Unit = stats.clear()

  def score(plan: Plan): Double = stats.get(plan.describe) match {
    case None | Some(Nil) => Double.MaxValue
    case Some(ms) =>
      val t = ms.map(_.timeNanos.toDouble).sum / ms.size
      val r = ms.map(_.recall).sum / ms.size
      t * (2.0 - r)
  }

  def measurements(plan: Plan): Seq[Measurement] = stats.getOrElse(plan.describe, Nil)

  /** Learned cost model: per-plan ordinary-least-squares fit of
    * `time ~ a + b·n` over the recorded measurements — the reference's
    * `lr` scorer next to the naive averager
    * (`query/planner/...: naive/lr/svm trained by measured queries`).
    * Extrapolates across corpus sizes, which the naive average cannot:
    * a sequential scan measured at two small sizes already reveals its
    * slope, so the model prefers a flat-cost index at sizes never
    * measured. Falls back to the naive average when the measurements
    * carry no size spread. */
  def predictedTime(plan: Plan, n: Long): Double = stats.get(plan.describe) match {
    case None | Some(Nil) => Double.MaxValue
    case Some(ms) =>
      val sized = ms.filter(_.n > 0)
      val spread = sized.map(_.n).distinct.size
      if (spread < 2) ms.map(_.timeNanos.toDouble).sum / ms.size
      else {
        val xs = sized.map(_.n.toDouble)
        val ys = sized.map(_.timeNanos.toDouble)
        val mx = xs.sum / xs.size
        val my = ys.sum / ys.size
        val b = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
          math.max(xs.map(x => (x - mx) * (x - mx)).sum, 1e-9)
        val a = my - b * mx
        math.max(0.0, a + b * n)
      }
  }

  /** LR-scored cost: predicted time at size `n`, recall-penalized like
    * the naive score. */
  def scoreLR(plan: Plan, n: Long): Double = stats.get(plan.describe) match {
    case None | Some(Nil) => Double.MaxValue
    case Some(ms) =>
      val r = ms.map(_.recall).sum / ms.size
      predictedTime(plan, n) * (2.0 - r)
  }

  /** Feature map for the SVM runtime model: bias + corpus size scaled
    * to O(1)–O(100) so the Pegasos regularizer doesn't drown the slope
    * term (unscaled row counts make λ/2·‖w‖² dominate any fit). */
  private def svmFeature(n: Long): Array[Double] = Array(1.0, n / 1e4)

  /** Pegasos-predicted runtime (ms) at corpus size `n`: a fresh
    * deterministic fit over the plan's size-tagged measurements — the
    * online model retrained from the stats the sweep recorded. Falls
    * back to the naive average (in ms) without size spread, mirroring
    * [[predictedTime]]. */
  def svmPredictedTime(plan: Plan, n: Long): Double = stats.get(plan.describe) match {
    case None | Some(Nil) => Double.MaxValue
    case Some(ms) =>
      val sized = ms.filter(_.n > 0)
      if (sized.map(_.n).distinct.size < 2) ms.map(_.timeNanos / 1e6).sum / ms.size
      else {
        val svm = new PegasosSVM(2)
        svm.fit(sized.map(m => svmFeature(m.n)), sized.map(_.timeNanos / 1e6))
        math.max(0.0, svm.predict(svmFeature(n)))
      }
  }

  /** SVM-scored cost: Pegasos-predicted time at size `n`,
    * recall-penalized like the other scorers. */
  def scoreSVM(plan: Plan, n: Long): Double = stats.get(plan.describe) match {
    case None | Some(Nil) => Double.MaxValue
    case Some(ms) =>
      val r = ms.map(_.recall).sum / ms.size
      svmPredictedTime(plan, n) * (2.0 - r)
  }

  /** Walk hints in order; first usable plan wins (reference
    * `HintBasedScanExpression.getPlan`). Conformity = distance-family
    * match + index availability (`isQueryConform`). */
  def choose(hints: Seq[Hint], indexes: Seq[VectorIndex], distName: String): Plan = {
    def conforming(seq: Seq[VectorIndex]): Seq[VectorIndex] =
      seq.filter(_.conformsTo(distName))
    def byPriority(seq: Seq[VectorIndex]): Option[VectorIndex] =
      IndexPriority.flatMap(t => seq.find(_.indexType == t)).headOption

    hints.iterator.flatMap[Option[Plan]] {
      case SequentialHint => Iterator(Some(SequentialPlan()))
      case ExactHint =>
        Iterator(byPriority(conforming(indexes).filter(_.isExact)).map(IndexPlan.apply)
          .orElse(Some(SequentialPlan())))
      case IndexHint =>
        Iterator(byPriority(conforming(indexes)).map(IndexPlan.apply))
      case SpecificIndexHint(t) =>
        Iterator(conforming(indexes).find(_.indexType == t).map(IndexPlan.apply))
      case EmpiricalHint =>
        val candidates = SequentialPlan() +: conforming(indexes).map(IndexPlan.apply)
        Iterator(Some(candidates.minBy(score)))
      case LearnedHint(n) =>
        val candidates = SequentialPlan() +: conforming(indexes).map(IndexPlan.apply)
        Iterator(Some(candidates.minBy(scoreLR(_, n))))
      case SvmHint(n) =>
        val candidates = SequentialPlan() +: conforming(indexes).map(IndexPlan.apply)
        Iterator(Some(candidates.minBy(scoreSVM(_, n))))
    }.flatten.nextOption().getOrElse(SequentialPlan())
  }

  /** Execute a chosen plan as a kNN query, recording the measurement.
    * Weighted queries route index plans through the weighted candidate
    * scan ([[VectorIndex.knnW]]) — the caller guarantees admission via
    * `conformsToWeighted`. */
  def run(plan: Plan, entity: DataFrame, idCol: String, dist: Column,
          q: Seq[Double], k: Int,
          weights: Option[Seq[Double]] = None): DataFrame = plan match {
    case SequentialPlan() => Knn.knn(entity, dist, k, org.apache.spark.sql.functions.col(idCol))
    case IndexPlan(idx) => weights match {
      case Some(ws) => idx.knnW(entity, idCol, dist, q, ws, k)
      case None => idx.knn(entity, idCol, dist, q, k)
    }
  }

  /** Auto-training sweep — the reference's planner training loop
    * (`QueryPlannerOp.trainIndexes`: generate queries, measure every
    * plan, feed the scorers). Samples `nQueries` query vectors from the
    * entity itself, races the sequential plan and every conforming index
    * through [[Progressive.parallel]] (each completed run records a
    * size-tagged measurement), leaving `EmpiricalHint`/`LearnedHint`
    * genuinely trained for this corpus. Returns the measurement count. */
  def train(spark: org.apache.spark.sql.SparkSession, entity: DataFrame,
            idCol: String, vecCol: String, indexes: Seq[VectorIndex],
            distName: String = "euclidean", k: Int = 100, nQueries: Int = 3)
           (implicit ec: scala.concurrent.ExecutionContext): Int = {
    import org.apache.spark.sql.functions.col
    val n = entity.count()
    val qs = entity.select(col(vecCol).cast("array<double>"))
      .limit(nQueries).collect().map(_.getSeq[Double](0).toSeq)
    val dist = graft.functions.Distances.byName(distName)
    qs.foreach { q =>
      val d = dist(col(vecCol), graft.functions.Distances.vecLit(q))
      val specs = Progressive.PlanSpec("sequential", 1.0,
        () => Knn.knn(entity, d, k, col(idCol)), n) +:
        indexes.filter(_.conformsTo(distName)).map(i =>
          Progressive.PlanSpec(s"index:${i.indexType}", i.confidence,
            () => i.knn(entity, idCol, d, q, k), n))
      // one plan at a time: racing them would contend for the same
      // cores and bias every timing the cost models train on
      specs.foreach(spec => Progressive.parallel(spark, Seq(spec))())
    }
    qs.length * (1 + indexes.count(_.conformsTo(distName)))
  }

  /** Introspection: all candidate paths with scores (reference
    * `getScoredExecutionPath`, `DataQuery.scala:384`). */
  def scoredPaths(indexes: Seq[VectorIndex], distName: String): Seq[(String, Double)] =
    (SequentialPlan() +: indexes.filter(_.conformsTo(distName)).map(IndexPlan.apply))
      .map(p => p.describe -> score(p))
}

/** Measured-cost choice between the EXACT all-pairs and BANDED-LSH
  * cosine near-dup paths — the planner's adapt-scan-methods idea
  * (reference `QueryPlannerOp.trainIndexes`) extended to the
  * LLM-pipeline surface, where the "scan methods" are dedup plans.
  *
  * The kNN planner's linear runtime model would misprice the exact path
  * (O(n²) pair loop); each dedup path instead gets a POWER-LAW fit over
  * its size-tagged measurements — log-log least squares, so `t(n) =
  * e^a · n^b` recovers b≈2 for exact and b≈1 for banded from two sample
  * sizes, and the crossover emerges from measurements rather than a
  * hardcoded threshold. Untrained, the choice falls back to a
  * documented size cutoff.
  */
object DedupPlanner {
  val Exact = "dedup:cosine_exact"
  val Banded = "dedup:cosine_banded"
  /** Cluster-pruned SemDeDup: nearest-centroid assignment (k ≈ √n cells)
    * + within-cell pair verify — the third scan method for the embedding
    * near-dup surface. Like the banded path it is approximate (cross-cell
    * pairs are the accepted misses); its cost curve sits between the two:
    * O(n·k) assignment FLOPs plus Σ O(|cell|²) verify. */
  val Semantic = "dedup:cosine_semantic"

  /** SemDeDup cell count at corpus size n — √n keeps expected cell size
    * √n, so total verify work stays ~n^1.5 instead of n². */
  def semanticK(n: Long): Int =
    math.max(2, math.sqrt(math.max(n, 0L).toDouble).toInt)

  /** Corpus size above which the UNTRAINED default flips to banded —
    * the exact path's pair loop is n²/2 fused dot products. */
  val UntrainedCutoff = 2000L

  private val stats = TrieMap.empty[String, List[(Long, Long)]] // (n, nanos)

  def record(path: String, n: Long, nanos: Long): Unit =
    stats.updateWith(path) {
      case Some(ms) => Some((n, nanos) :: ms)
      case None => Some(List((n, nanos)))
    }

  def clearMeasurements(): Unit = stats.clear()

  def measurementCount: Int = stats.values.map(_.size).sum

  /** Power-law predicted nanos at size `n`; mean of raw measurements
    * when there is no size spread; MaxValue when untrained. */
  def predictedNanos(path: String, n: Long): Double = stats.get(path) match {
    case None | Some(Nil) => Double.MaxValue
    case Some(ms) =>
      val usable = ms.filter { case (sz, t) => sz > 0 && t > 0 }
      if (usable.map(_._1).distinct.size < 2)
        ms.map(_._2.toDouble).sum / ms.size
      else {
        val xs = usable.map { case (sz, _) => math.log(sz.toDouble) }
        val ys = usable.map { case (_, t) => math.log(t.toDouble) }
        val mx = xs.sum / xs.size
        val my = ys.sum / ys.size
        val b = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum /
          math.max(xs.map(x => (x - mx) * (x - mx)).sum, 1e-9)
        val a = my - b * mx
        math.exp(a + b * math.log(math.max(n, 1L).toDouble))
      }
  }

  /** The path predicted cheapest at corpus size `n` (exact + banded
    * trained; semantic joins the comparison once it has measurements);
    * otherwise the size-cutoff default. Ties break toward the earlier
    * path in (exact, banded, semantic) order. */
  def choose(n: Long): String = {
    val e = predictedNanos(Exact, n)
    val b = predictedNanos(Banded, n)
    if (e == Double.MaxValue || b == Double.MaxValue)
      if (n > UntrainedCutoff) Banded else Exact
    else Seq(Exact -> e, Banded -> b, Semantic -> predictedNanos(Semantic, n))
      .filter(_._2 < Double.MaxValue).minBy(_._2)._1
  }

  /** Introspection over the dedup scan methods at corpus size `n` —
    * the LLM-pipeline face of `getScoredExecutionPath`: every path with
    * its predicted cost (untrained paths report `Double.MaxValue`). */
  def scoredPaths(n: Long): Seq[(String, Double)] =
    Seq(Exact, Banded, Semantic).map(p => p -> predictedNanos(p, n))

  /** Measure the paths on samples of `df` (one at a time, like
    * [[Planner.train]] — racing would bias the timings). The EXACT path
    * trains at the given (small) `sizes`: its O(n²) pair loop dominates
    * fixed overhead even at a few thousand rows, so the log-log fit
    * sees a real slope. The near-LINEAR paths (banded, semantic) train
    * at 10× those sizes (capped at the corpus): at the exact path's
    * sizes their jobs are fixed-overhead dominated, the fitted
    * exponent comes out nearly flat, and the extrapolation
    * underpredicts large-corpus cost — measured >5× low at a 10×
    * corpus before retraining (ScaleProbe, SCALING.md run 20).
    * Returns the number of measurements recorded. */
  def train(df: DataFrame, idCol: String, vecCol: String, threshold: Double,
            dim: Int, sizes: Seq[Int]): Int = {
    import org.apache.spark.sql.functions.col
    val total = df.count()
    def time(run: => Long): Long = {
      val t0 = System.nanoTime(); run; System.nanoTime() - t0
    }
    // pin each sample so the timed paths see the same materialized
    // rows, not limit+scan variance
    def sampleOf(s: Int): DataFrame =
      df.select(col(idCol), col(vecCol)).limit(s).materialized
    sizes.foreach { s =>
      val sample = sampleOf(s)
      val n = sample.count()
      record(Exact, n, time(
        graft.operators.Ann.cosineNearDupPairs(sample, idCol, vecCol, threshold).count()))
      sample.unpersist()
    }
    val linSizes = sizes.map(s => math.min(s.toLong * 10, total).toInt).distinct
    linSizes.foreach { s =>
      val sample = sampleOf(s)
      val n = sample.count()
      record(Banded, n, time(
        graft.operators.Ann.lshCosineNearDupPairs(sample, idCol, vecCol, threshold, dim).count()))
      // semantic path timed end-to-end: centroid training is part of its
      // cost at query time, so it is part of the measurement
      record(Semantic, n, time {
        val cents = graft.operators.Ann.trainSemanticCentroids(sample, vecCol, semanticK(n))
        graft.operators.Ann.semanticDedupPairs(sample, idCol, vecCol, cents, threshold).count()
      })
      sample.unpersist()
    }
    sizes.size + 2 * linSizes.size
  }

  /** Near-dup pairs through the measured choice for this corpus' size;
    * returns (chosen path, pairs). */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                   threshold: Double, dim: Int): (String, DataFrame) = {
    val n = df.count()
    choose(n) match {
      case Exact =>
        (Exact, graft.operators.Ann.cosineNearDupPairs(df, idCol, vecCol, threshold))
      case Semantic =>
        val cents = graft.operators.Ann.trainSemanticCentroids(df, vecCol, semanticK(n))
        (Semantic,
          graft.operators.Ann.semanticDedupPairs(df, idCol, vecCol, cents, threshold)
            .select("id_a", "id_b", "cos_sim"))
      case banded =>
        (banded, graft.operators.Ann.lshCosineNearDupPairs(df, idCol, vecCol, threshold, dim))
    }
  }
}
