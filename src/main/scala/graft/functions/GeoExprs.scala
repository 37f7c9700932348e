package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native codegen'd planar-geometry kernels over a ring/chain column
  * (`array<struct<x:double, y:double>>`) and a point — the hot path of
  * every geofence tag, containment join filter, and distance-to-route
  * scan in [[graft.operators.GeoAlgebra]].
  *
  * The algebra's `aggregate`/`transform` formulations are semantically
  * identical but interpreted: Spark's higher-order functions are
  * `CodegenFallback`, so each evaluation re-builds the edge array and
  * walks it through lambda objects — measured 10-50× slower on the
  * geofence battery queries. This expression generates a tight primitive
  * loop straight over the columnar `ArrayData` (the
  * [[VectorDistanceExpr]] pattern), keeping the surrounding filter /
  * join stage inside whole-stage codegen.
  *
  * Arithmetic is IDENTICAL op-for-op to the fold forms (the GeoAlgebra
  * scaladoc's cross-engine bit-parity contract depends on it):
  * raycast `(ay>py) != (by>py) && px < (bx-ax)*(py-ay)/(by-ay)+ax`,
  * clamped-projection squared distance with the zero-length-edge
  * fallback, edges walked first-to-last.
  */
object GeoKernel {
  val Contains = "contains"       // boolean even-odd raycast
  val Dist2 = "dist2"             // min squared distance to the edge chain
  val OnBoundary = "on_boundary"  // exact on-segment test (covers support)
  val All: Set[String] = Set(Contains, Dist2, OnBoundary)

  def apply(kind: String, chain: Column, px: Column, py: Column): Column =
    Bridge.column(GeoPointExpr(Bridge.expression(chain),
      Bridge.expression(px), Bridge.expression(py), kind))
}

case class GeoPointExpr(first: Expression, second: Expression,
                        third: Expression, kind: String)
  extends TernaryExpression {

  require(GeoKernel.All.contains(kind), s"unknown geo kernel: $kind")

  override def checkInputDataTypes(): TypeCheckResult = {
    val chainOk = first.dataType match {
      case ArrayType(StructType(fields), _) =>
        fields.length == 2 && fields.forall(_.dataType == DoubleType)
      case _ => false
    }
    if (chainOk && second.dataType == DoubleType && third.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_$kind requires (array<struct<double,double>>, double, double), " +
        s"got ${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql}")
  }

  override def dataType: DataType =
    if (kind == GeoKernel.Dist2) DoubleType else BooleanType

  override def prettyName: String = s"poly_$kind"

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override protected def nullSafeEval(chainAny: Any, pxAny: Any, pyAny: Any): Any = {
    val chain = chainAny.asInstanceOf[ArrayData]
    val px = pxAny.asInstanceOf[Double]
    val py = pyAny.asInstanceOf[Double]
    val n = chain.numElements()
    kind match {
      case GeoKernel.Contains =>
        var cr = 0L
        var i = 0
        while (i < n - 1) {
          val a = chain.getStruct(i, 2)
          val b = chain.getStruct(i + 1, 2)
          val ax = a.getDouble(0); val ay = a.getDouble(1)
          val bx = b.getDouble(0); val by = b.getDouble(1)
          if ((ay > py) != (by > py) &&
            px < (bx - ax) * (py - ay) / (by - ay) + ax) cr += 1L
          i += 1
        }
        cr % 2 == 1
      case GeoKernel.Dist2 =>
        var acc = Double.MaxValue
        var i = 0
        while (i < n - 1) {
          val a = chain.getStruct(i, 2)
          val b = chain.getStruct(i + 1, 2)
          val ax = a.getDouble(0); val ay = a.getDouble(1)
          val dx = b.getDouble(0) - ax
          val dy = b.getDouble(1) - ay
          val len2 = dx * dx + dy * dy
          val d =
            if (len2 == 0.0) (px - ax) * (px - ax) + (py - ay) * (py - ay)
            else {
              val tRaw = ((px - ax) * dx + (py - ay) * dy) / len2
              val t = math.max(0.0, math.min(1.0, tRaw))
              val qx = ax + t * dx
              val qy = ay + t * dy
              (px - qx) * (px - qx) + (py - qy) * (py - qy)
            }
          if (d < acc) acc = d
          i += 1
        }
        acc
      case GeoKernel.OnBoundary =>
        var hit = false
        var i = 0
        while (!hit && i < n - 1) {
          val a = chain.getStruct(i, 2)
          val b = chain.getStruct(i + 1, 2)
          val ax = a.getDouble(0); val ay = a.getDouble(1)
          val bx = b.getDouble(0); val by = b.getDouble(1)
          hit = (bx - ax) * (py - ay) - (by - ay) * (px - ax) == 0.0 &&
            px >= math.min(ax, bx) && px <= math.max(ax, bx) &&
            py >= math.min(ay, by) && py <= math.max(ay, by)
          i += 1
        }
        hit
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (chain, px, py) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val a = ctx.freshName("pa")
      val b = ctx.freshName("pb")
      val header =
        s"""int $n = $chain.numElements();
           |org.apache.spark.sql.catalyst.InternalRow $a;
           |org.apache.spark.sql.catalyst.InternalRow $b;""".stripMargin
      val body = kind match {
        case GeoKernel.Contains =>
          val cr = ctx.freshName("cr")
          s"""long $cr = 0L;
             |for (int $i = 0; $i < $n - 1; $i++) {
             |  $a = $chain.getStruct($i, 2);
             |  $b = $chain.getStruct($i + 1, 2);
             |  double ax = $a.getDouble(0); double ay = $a.getDouble(1);
             |  double bx = $b.getDouble(0); double by = $b.getDouble(1);
             |  if (((ay > $py) != (by > $py)) &&
             |      $px < (bx - ax) * ($py - ay) / (by - ay) + ax) $cr += 1L;
             |}
             |${ev.value} = ($cr % 2L) == 1L;""".stripMargin
        case GeoKernel.Dist2 =>
          val acc = ctx.freshName("acc")
          s"""double $acc = Double.MAX_VALUE;
             |for (int $i = 0; $i < $n - 1; $i++) {
             |  $a = $chain.getStruct($i, 2);
             |  $b = $chain.getStruct($i + 1, 2);
             |  double ax = $a.getDouble(0); double ay = $a.getDouble(1);
             |  double dx = $b.getDouble(0) - ax;
             |  double dy = $b.getDouble(1) - ay;
             |  double len2 = dx * dx + dy * dy;
             |  double d;
             |  if (len2 == 0.0) {
             |    d = ($px - ax) * ($px - ax) + ($py - ay) * ($py - ay);
             |  } else {
             |    double tRaw = (($px - ax) * dx + ($py - ay) * dy) / len2;
             |    double t = java.lang.Math.max(0.0, java.lang.Math.min(1.0, tRaw));
             |    double qx = ax + t * dx;
             |    double qy = ay + t * dy;
             |    d = ($px - qx) * ($px - qx) + ($py - qy) * ($py - qy);
             |  }
             |  if (d < $acc) $acc = d;
             |}
             |${ev.value} = $acc;""".stripMargin
        case GeoKernel.OnBoundary =>
          val hit = ctx.freshName("hit")
          s"""boolean $hit = false;
             |for (int $i = 0; !$hit && $i < $n - 1; $i++) {
             |  $a = $chain.getStruct($i, 2);
             |  $b = $chain.getStruct($i + 1, 2);
             |  double ax = $a.getDouble(0); double ay = $a.getDouble(1);
             |  double bx = $b.getDouble(0); double by = $b.getDouble(1);
             |  $hit = (bx - ax) * ($py - ay) - (by - ay) * ($px - ax) == 0.0 &&
             |    $px >= java.lang.Math.min(ax, bx) && $px <= java.lang.Math.max(ax, bx) &&
             |    $py >= java.lang.Math.min(ay, by) && $py <= java.lang.Math.max(ay, by);
             |}
             |${ev.value} = $hit;""".stripMargin
      }
      header + "\n" + body
    })
}
