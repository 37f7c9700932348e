package graft.core

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
import org.apache.spark.sql.graft.Bridge

/** Driver-side constant folding for input-free Column trees that
  * Catalyst's `ConstantFolding` cannot touch.
  *
  * Why: higher-order functions (`transform`/`aggregate`/`exists`) are
  * never foldable — their lambda variables are non-foldable children —
  * so an expression like a WKT parse over a LITERAL polygon
  * (`wktRings(lit("POLYGON (...)"))`, regex splits + struct building
  * inside `transform`) re-executes for EVERY ROW of the query it is
  * used in. Measured r21: the multipolygon raycast query spent seconds
  * re-parsing two constant literals per customer row.
  *
  * [[ConstFold.apply]] evaluates such a tree ONCE on the driver (a
  * 1-row local job, so the value has exactly Spark's own semantics —
  * no hand-written twin parser to drift) and splices the result back
  * as a typed literal. Trees that reference any input column, or that
  * fail to evaluate, are returned unchanged — so data-driven call
  * sites and malformed-input semantics are untouched.
  *
  * Caller contract: only pass trees built from DETERMINISTIC
  * functions (all the WKT parse/measure trees qualify); a
  * non-deterministic input-free tree (e.g. `rand()`) would be frozen
  * to one draw. */
object ConstFold {

  /** `c` as a literal of its own value if it references no input
    * columns and evaluates; `c` unchanged otherwise. */
  def apply(c: Column): Column = {
    val hasInput =
      try {
        Bridge.expressionEager(c).exists {
          case _: UnresolvedAttribute => true
          case _: AttributeReference => true
          case _ => false
        }
      } catch { case _: Throwable => true }
    if (hasInput) c
    else SparkSession.getActiveSession match {
      case Some(s) =>
        try {
          val df = s.range(1).select(c.as("v"))
          // determinism gate: an input-free NON-deterministic tree
          // (rand(), a non-deterministic UDF) must keep its per-row
          // draw — folding would freeze one value for every row. The
          // flag is read off the ANALYZED expression so unresolved
          // function nodes cannot misreport.
          val analyzed = df.queryExecution.analyzed
          if (!analyzed.expressions.forall(_.deterministic))
            return c
          val dt = df.schema.head.dataType
          // evaluate the RESOLVED expression interpreted instead of
          // executing the 1-row plan: analysis already bound functions
          // and the timezone, and Expression.eval is Spark's own
          // interpreter, so the value is identical — but skipping the
          // optimizer + physical planning + whole-stage codegen + job
          // turns each fold from tens of ms into ~1 ms (geo queries
          // fold up to a dozen literals at plan build, all inside the
          // timed query wall). Unevaluable trees fall back to the plan.
          val internal =
            try analyzed.expressions.head.eval(
              org.apache.spark.sql.catalyst.InternalRow.empty)
            catch { case _: Throwable =>
              df.queryExecution.executedPlan.executeCollect().head.get(0, dt)
            }
          Bridge.column(Literal(internal, dt))
        } catch { case _: Throwable => c }
      case None => c
    }
  }

  /** The UTF8 text of a string-literal column, if it is one. */
  def literalText(c: Column): Option[String] =
    try {
      Bridge.expressionEager(c) match {
        case Literal(s: org.apache.spark.unsafe.types.UTF8String, _) => Some(s.toString)
        case _ => None
      }
    } catch { case _: Throwable => None }
}
