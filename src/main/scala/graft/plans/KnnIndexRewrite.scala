package graft.plans

import scala.collection.concurrent.TrieMap
import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.{VectorDistanceExpr, VectorKernel}
import graft.index.VectorIndex

/** Transparent index acceleration as a Catalyst optimizer rule — the
  * reference's core promise ("queries go faster because an index
  * exists, the user never asks for it", `IndexScanExpression.rewrite` +
  * hint fallback) expressed the Spark way: an injected
  * `Rule[LogicalPlan]`.
  *
  * Pattern: `limit k ∘ sort-asc(distance) ∘ project(distance :=
  * vec_<kind>(vecCol, <literal query>))` over a scan of a registered
  * table — the logical shape every brute-force kNN compiles to. The
  * rewrite inserts a left-semi join against the index's candidate set
  * BELOW the sort, leaving the sort/limit to re-rank exactly:
  *
  * {{{ limit k ∘ sort ∘ (project ⋉ candidates(q, k)) }}}
  *
  * Only EXACT (lossless-candidate) indexes are eligible — an
  * approximate index would silently change results, which an optimizer
  * rule must never do; approximate scans stay an explicit planner
  * choice ([[Planner]]). Registration is per table path; the rule is a
  * no-op while the registry is empty. Candidate generation may run a
  * small bounding job at optimization time (the same planning-time
  * index probe the reference performs).
  *
  * Installed into `spark.experimental.extraOptimizations` (runs after
  * the main optimizer batches, so the query literal has been
  * constant-folded). Idempotent by construction: after the rewrite the
  * sort's child is a Join, which the pattern no longer matches.
  */
object KnnIndexRewrite extends Rule[LogicalPlan] {

  private final case class Registered(idCol: String, vecCol: String, index: VectorIndex)
  private val registry = TrieMap.empty[String, Registered]

  /** Register a lossless index for the table rooted at `path`. */
  def register(spark: SparkSession, path: String, idCol: String, vecCol: String,
               index: VectorIndex): Unit = {
    require(index.isExact,
      s"only exact indexes may rewrite transparently; ${index.indexType} is approximate")
    registry.put(normalize(path), Registered(idCol, vecCol, index))
    install(spark)
  }

  def clear(): Unit = registry.clear()

  /** Idempotently append this rule to the session's extra optimizations. */
  def install(spark: SparkSession): Unit = synchronized {
    val e = spark.experimental
    if (!e.extraOptimizations.exists(_ eq this))
      e.extraOptimizations = e.extraOptimizations :+ this
  }

  private def normalize(p: String): String =
    p.stripPrefix("file:").stripSuffix("/")

  private def scanPath(plan: LogicalPlan): Option[String] =
    plan.collectLeaves().flatMap {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(p => normalize(p.toUri.getPath))
        case _ => Nil
      }
      case _ => Nil
    }.headOption

  private def queryVec(e: Expression): Option[Seq[Double]] = e match {
    case Literal(ad: ArrayData, ArrayType(DoubleType, _)) =>
      Some(ad.toDoubleArray().toSeq)
    case Literal(ad: ArrayData, ArrayType(FloatType, _)) =>
      Some(ad.toFloatArray().map(_.toDouble).toSeq)
    case CreateArray(children, _) if children.forall(_.foldable) =>
      Some(children.map(c => c.eval() match {
        case d: java.lang.Double => d.doubleValue()
        case f: java.lang.Float => f.doubleValue()
        case n: java.lang.Number => n.doubleValue()
      }))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transformDown {
      // the final column projection may sit between the limit and the sort
      case gl @ GlobalLimit(IntegerLiteral(k), ll: LocalLimit) =>
        (ll.child match {
          case srt @ Sort(SortOrder(d: AttributeReference, Ascending, _, _) +: _,
              true, proj: Project, _) =>
            rewriteSort(srt, proj, d, k).map(ns => ll.copy(child = ns))
          case po @ Project(_,
              srt @ Sort(SortOrder(d: AttributeReference, Ascending, _, _) +: _,
                true, proj: Project, _)) =>
            rewriteSort(srt, proj, d, k).map(ns => ll.copy(child = po.copy(child = ns)))
          case _ => None
        }).map(nl => gl.copy(child = nl)).getOrElse(gl)
    }

  private def rewriteSort(srt: Sort, proj: Project, distAttr: AttributeReference,
                          k: Int): Option[LogicalPlan] =
    try {
      for {
        kernel <- proj.projectList.collectFirst {
          case a @ Alias(v: VectorDistanceExpr, _) if a.exprId == distAttr.exprId => v
        }
        vecAttr <- kernel.left match {
          case ar: AttributeReference => Some(ar)
          case _ => None
        }
        q <- queryVec(kernel.right)
        path <- scanPath(proj)
        reg <- registry.get(path)
        // kernel kinds ARE distance names for conformity purposes
        if reg.vecCol == vecAttr.name && reg.index.conformsTo(kernel.kind)
      } yield {
        val spark = SparkSession.active
        val childDf = Bridge.ofRows(spark, proj)
        // no distinct on the candidate side: left-semi is set-semantic
        val cand = reg.index.candidates(q, k).select(reg.idCol)
        val pruned = childDf.join(cand, Seq(reg.idCol), "left_semi")
        // graft the OPTIMIZED sub-plan — physical planning expects the
        // main batches (e.g. Deduplicate elimination) to have run
        srt.copy(child = pruned.queryExecution.optimizedPlan)
      }
    } catch {
      case NonFatal(e) =>
        logWarning(s"knn index rewrite skipped: ${e.getMessage}")
        None
    }
}
