package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Projection operators — the reference's `ProjectionExpression` family
  * (`/root/reference/src/main/scala/org/vitrivr/adampro/query/ast/internal/ProjectionExpression.scala`).
  */
object Projections {

  /** Named-column projection (`FieldNameProjection`, `:17-73`); empty = all. */
  def project(df: DataFrame, cols: Seq[String]): DataFrame =
    if (cols.isEmpty) df else df.select(cols.map(col): _*)

  /** Scalar count as a 1-row frame (`CountOperationProjection`, `:75-87`) —
    * expressed as an aggregate so it stays one distributed plan rather than
    * a driver-side `df.count()` action. */
  def countRows(df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("n"))

  /** Scalar exists (`ExistsOperationProjection`, `:89-101`). The reference
    * has an off-by-one (`count > 1`); we implement the intended `count > 0`
    * semantics (SURVEY.md §7.3) and stop the scan at the first row via
    * `limit(1)`. */
  def existsRows(df: DataFrame): DataFrame =
    df.limit(1).agg((count(lit(1)) > 0).as("exists"))

  /** `df.distinct()` (`DistinctOperationProjection`, `:103-115`). */
  def distinctRows(df: DataFrame, cols: Seq[String] = Nil): DataFrame =
    project(df, cols).distinct()
}
