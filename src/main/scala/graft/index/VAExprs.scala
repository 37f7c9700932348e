package graft.index

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Codegen kernels for the VA-file: per-dimension cell assignment at
  * build time and Minkowski lower/upper distance bounds at scan time
  * (reference `VAIndex.scala:153-189`, `VAResultHandler` semantics
  * recast as a two-phase bound prune). Marks ride along as reference
  * objects — O(dims · cells) doubles, broadcast with the task binary. */
object VAExprs {
  def cells(vec: Column, marks: Array[Array[Double]]): Column =
    Bridge.column(VACellsExpr(Bridge.expression(vec), marks))

  def bounds(cells: Column, marks: Array[Array[Double]], query: Array[Double], p: Double,
             weights: Option[Array[Double]] = None): Column =
    Bridge.column(VABoundsExpr(Bridge.expression(cells), marks, query, p, weights))
}

private[index] trait VecArrayInput { self: UnaryExpression =>
  def checkVec(child: Expression, name: String, elem: DataType*): TypeCheckResult =
    child.dataType match {
      case ArrayType(e, _) if elem.contains(e) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name: unexpected input ${other.sql}")
    }
}

/** Cell index per dimension: the mark interval containing the value
  * (binary search; clamped to [0, cells-1]). Output `array<int>`. */
case class VACellsExpr(child: Expression, marks: Array[Array[Double]])
  extends UnaryExpression with VecArrayInput {

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child, "va_cells", FloatType, DoubleType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "va_cells"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = isFloat
    val arr = Array.tabulate(math.min(v.numElements(), marks.length)) { d =>
      VACellsExpr.cellOf(if (fl) v.getFloat(d).toDouble else v.getDouble(d), marks(d))
    }
    new GenericArrayData(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("vaMarks", marks, "double[][]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    // fresh names: a second instance in the same generated method would
    // redeclare them (janino error → interpreted fallback)
    val nd = ctx.freshName("nd")
    val cells = ctx.freshName("cells")
    val d = ctx.freshName("d")
    nullSafeCodeGen(ctx, ev, c =>
      s"""int $nd = java.lang.Math.min($c.numElements(), $mRef.length);
         |int[] $cells = new int[$nd];
         |for (int $d = 0; $d < $nd; $d++) {
         |  $cells[$d] = graft.index.VACellsExpr.cellOf((double) $c.$getter($d), $mRef[$d]);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($cells);
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VACellsExpr {
  /** Largest cell c with marks(c) <= v, clamped into [0, cells-1]. */
  def cellOf(v: Double, m: Array[Double]): Int = {
    var lo = 0
    var hi = m.length - 1 // number of cells = m.length - 1
    if (v <= m(0)) return 0
    if (v >= m(hi)) return hi - 1
    var c = 0
    var l = 0
    var r = hi - 1
    while (l <= r) {
      val mid = (l + r) >>> 1
      if (m(mid) <= v && v < m(mid + 1)) { c = mid; l = r + 1 }
      else if (v < m(mid)) r = mid - 1
      else l = mid + 1
    }
    c
  }
}

/** Minkowski-p lower/upper distance bounds of a cell vector against the
  * query: output `array<double>` = [lb, ub]. With `weights` set, each
  * dimension's powered term is scaled by w_d before the sum — exactly
  * the weighted-Minkowski per-dim contribution `w·|x−y|^p`
  * (`Distances.minkowskiW`), so for non-negative weights the bounds
  * stay lossless: w·l^p ≤ w·|x−y|^p ≤ w·u^p holds per dimension. The
  * reference's VA scan ADMITS weighted queries but computes unweighted
  * bounds (its `VAIndex.scala:129-143` vs `:153-189`) — a lossy prune
  * we fix rather than inherit. */
case class VABoundsExpr(child: Expression, marks: Array[Array[Double]],
                        query: Array[Double], p: Double,
                        weights: Option[Array[Double]] = None)
  extends UnaryExpression with VecArrayInput {

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child, "va_bounds", IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "va_bounds"

  override protected def nullSafeEval(input: Any): Any = {
    val cells = input.asInstanceOf[ArrayData].toIntArray()
    new GenericArrayData(
      VABoundsExpr.compute(cells, marks, query, p, weights.orNull))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("vaMarks", marks, "double[][]")
    val qRef = ctx.addReferenceObj("vaQuery", query, "double[]")
    val wRef = weights match {
      case Some(w) => ctx.addReferenceObj("vaWeights", w, "double[]")
      case None => "(double[]) null"
    }
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.index.VABoundsExpr.compute($c.toIntArray(), $mRef, $qRef, $p, $wRef));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VABoundsExpr {
  def compute(cells: Array[Int], marks: Array[Array[Double]],
              q: Array[Double], p: Double, w: Array[Double]): Array[Double] = {
    var lb = 0.0
    var ub = 0.0
    var nd = math.min(cells.length, math.min(marks.length, q.length))
    if (w != null) nd = math.min(nd, w.length)
    var d = 0
    while (d < nd) {
      val m = marks(d)
      val c = cells(d)
      val lo = m(c)
      val hi = m(c + 1)
      val qd = q(d)
      val l =
        if (qd < lo) lo - qd
        else if (qd > hi) qd - hi
        else 0.0
      val u = math.max(qd - lo, hi - qd)
      val wd = if (w == null) 1.0 else w(d)
      if (p == 1.0) { lb += wd * l; ub += wd * u }
      else if (p == 2.0) { lb += wd * l * l; ub += wd * u * u }
      else { lb += wd * math.pow(l, p); ub += wd * math.pow(u, p) }
      d += 1
    }
    if (p == 2.0) Array(math.sqrt(lb), math.sqrt(ub))
    else if (p == 1.0) Array(lb, ub)
    else Array(math.pow(lb, 1.0 / p), math.pow(ub, 1.0 / p))
  }
}
