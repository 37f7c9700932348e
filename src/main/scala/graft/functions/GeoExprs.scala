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

/** Native codegen'd ring×ring kernels — the pair twin of [[GeoKernel]],
  * serving the polygon-polygon intersects predicate (and its
  * boundary-inclusive variant) that [[graft.operators.GeoAlgebra
  * .intersectsJoin]] evaluates per candidate pair. The HOF fold form
  * walks |A|·|B| edge pairs through interpreted lambdas — measured ~10×
  * slower per candidate on the polygon-join scale probe; this generates
  * the same arithmetic as two nested primitive loops with early exit.
  * Op-for-op identical to the fold forms (the cross-engine bit-parity
  * contract): orientation products strictly negative for a proper
  * cross, even-odd raycast for first-vertex containment, exact
  * collinear + bbox test for on-boundary (inclusive mode only). */
object GeoPairKernel {
  val Intersects = "intersects"
  val IntersectsInclusive = "intersects_inclusive"
  val All: Set[String] = Set(Intersects, IntersectsInclusive)

  def apply(kind: String, chainA: Column, chainB: Column): Column =
    Bridge.column(GeoPairExpr(Bridge.expression(chainA),
      Bridge.expression(chainB), kind))
}

case class GeoPairExpr(left: Expression, right: Expression, kind: String)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  require(GeoPairKernel.All.contains(kind), s"unknown geo pair kernel: $kind")

  private def chainOk(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(fields), _) =>
      fields.length == 2 && fields.forall(_.dataType == DoubleType)
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (chainOk(left.dataType) && chainOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_$kind requires two array<struct<double,double>> rings, " +
        s"got ${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = BooleanType
  override def prettyName: String = s"poly_$kind"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  // shared by eval and the generated code via Java-identical arithmetic
  override protected def nullSafeEval(aAny: Any, bAny: Any): Any = {
    val a = aAny.asInstanceOf[ArrayData]
    val b = bAny.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    def x(c: ArrayData, i: Int) = c.getStruct(i, 2).getDouble(0)
    def y(c: ArrayData, i: Int) = c.getStruct(i, 2).getDouble(1)
    def contains(ring: ArrayData, n: Int, px: Double, py: Double): Boolean = {
      var cr = 0L; var i = 0
      while (i < n - 1) {
        val ax = x(ring, i); val ay = y(ring, i)
        val bx = x(ring, i + 1); val by = y(ring, i + 1)
        if ((ay > py) != (by > py) &&
          px < (bx - ax) * (py - ay) / (by - ay) + ax) cr += 1L
        i += 1
      }
      cr % 2 == 1
    }
    def onBoundary(ring: ArrayData, n: Int, px: Double, py: Double): Boolean = {
      var hit = false; var i = 0
      while (!hit && i < n - 1) {
        val ax = x(ring, i); val ay = y(ring, i)
        val bx = x(ring, i + 1); val by = y(ring, i + 1)
        hit = (bx - ax) * (py - ay) - (by - ay) * (px - ax) == 0.0 &&
          px >= math.min(ax, bx) && px <= math.max(ax, bx) &&
          py >= math.min(ay, by) && py <= math.max(ay, by)
        i += 1
      }
      hit
    }
    var cross = false
    var i = 0
    while (!cross && i < na - 1) {
      val ax = x(a, i); val ay = y(a, i)
      val bx = x(a, i + 1); val by = y(a, i + 1)
      var j = 0
      while (!cross && j < nb - 1) {
        val cx = x(b, j); val cy = y(b, j)
        val dx = x(b, j + 1); val dy = y(b, j + 1)
        val o1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
        val o2 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax)
        val o3 = (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx)
        val o4 = (dx - cx) * (by - cy) - (dy - cy) * (bx - cx)
        cross = o1 * o2 < 0 && o3 * o4 < 0
        j += 1
      }
      i += 1
    }
    var res = cross ||
      (na > 0 && contains(b, nb, x(a, 0), y(a, 0))) ||
      (nb > 0 && contains(a, na, x(b, 0), y(b, 0)))
    if (!res && kind == GeoPairKernel.IntersectsInclusive) {
      var i2 = 0
      while (!res && i2 < na) { res = onBoundary(b, nb, x(a, i2), y(a, i2)); i2 += 1 }
      var j2 = 0
      while (!res && j2 < nb) { res = onBoundary(a, na, x(b, j2), y(b, j2)); j2 += 1 }
    }
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ca, cb) => {
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val res = ctx.freshName("res")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val containsRaw = ctx.freshName("geoPairContains")
      val onBRaw = ctx.freshName("geoPairOnBoundary")
      // addNewFunction may relocate the body into a nested private class
      // once the outer class crosses the size threshold — the generated
      // CALL must use the returned (possibly qualified) name, or codegen
      // compilation fails and the whole stage silently drops to the
      // interpreted path (Spark's own expressions follow this pattern)
      val contains = ctx.addNewFunction(containsRaw,
        s"""private boolean $containsRaw(org.apache.spark.sql.catalyst.util.ArrayData ring,
           |    int n, double px, double py) {
           |  long cr = 0L;
           |  for (int k = 0; k < n - 1; k++) {
           |    org.apache.spark.sql.catalyst.InternalRow pa = ring.getStruct(k, 2);
           |    org.apache.spark.sql.catalyst.InternalRow pb = ring.getStruct(k + 1, 2);
           |    double ax = pa.getDouble(0); double ay = pa.getDouble(1);
           |    double bx = pb.getDouble(0); double by = pb.getDouble(1);
           |    if (((ay > py) != (by > py)) &&
           |        px < (bx - ax) * (py - ay) / (by - ay) + ax) cr += 1L;
           |  }
           |  return (cr % 2L) == 1L;
           |}""".stripMargin)
      val onB = ctx.addNewFunction(onBRaw,
        s"""private boolean $onBRaw(org.apache.spark.sql.catalyst.util.ArrayData ring,
           |    int n, double px, double py) {
           |  for (int k = 0; k < n - 1; k++) {
           |    org.apache.spark.sql.catalyst.InternalRow pa = ring.getStruct(k, 2);
           |    org.apache.spark.sql.catalyst.InternalRow pb = ring.getStruct(k + 1, 2);
           |    double ax = pa.getDouble(0); double ay = pa.getDouble(1);
           |    double bx = pb.getDouble(0); double by = pb.getDouble(1);
           |    if ((bx - ax) * (py - ay) - (by - ay) * (px - ax) == 0.0 &&
           |        px >= java.lang.Math.min(ax, bx) && px <= java.lang.Math.max(ax, bx) &&
           |        py >= java.lang.Math.min(ay, by) && py <= java.lang.Math.max(ay, by))
           |      return true;
           |  }
           |  return false;
           |}""".stripMargin)
      val inclusiveTail =
        if (kind == GeoPairKernel.IntersectsInclusive)
          s"""if (!$res) {
             |  for (int $i = 0; !$res && $i < $na; $i++) {
             |    org.apache.spark.sql.catalyst.InternalRow p = $ca.getStruct($i, 2);
             |    $res = $onB($cb, $nb, p.getDouble(0), p.getDouble(1));
             |  }
             |  for (int $j = 0; !$res && $j < $nb; $j++) {
             |    org.apache.spark.sql.catalyst.InternalRow p = $cb.getStruct($j, 2);
             |    $res = $onB($ca, $na, p.getDouble(0), p.getDouble(1));
             |  }
             |}""".stripMargin
        else ""
      s"""int $na = $ca.numElements();
         |int $nb = $cb.numElements();
         |boolean $res = false;
         |for (int $i = 0; !$res && $i < $na - 1; $i++) {
         |  org.apache.spark.sql.catalyst.InternalRow pa = $ca.getStruct($i, 2);
         |  org.apache.spark.sql.catalyst.InternalRow pb = $ca.getStruct($i + 1, 2);
         |  double ax = pa.getDouble(0); double ay = pa.getDouble(1);
         |  double bx = pb.getDouble(0); double by = pb.getDouble(1);
         |  for (int $j = 0; !$res && $j < $nb - 1; $j++) {
         |    org.apache.spark.sql.catalyst.InternalRow pc = $cb.getStruct($j, 2);
         |    org.apache.spark.sql.catalyst.InternalRow pd = $cb.getStruct($j + 1, 2);
         |    double cx = pc.getDouble(0); double cy = pc.getDouble(1);
         |    double dx = pd.getDouble(0); double dy = pd.getDouble(1);
         |    double o1 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax);
         |    double o2 = (bx - ax) * (dy - ay) - (by - ay) * (dx - ax);
         |    double o3 = (dx - cx) * (ay - cy) - (dy - cy) * (ax - cx);
         |    double o4 = (dx - cx) * (by - cy) - (dy - cy) * (bx - cx);
         |    $res = o1 * o2 < 0 && o3 * o4 < 0;
         |  }
         |}
         |if (!$res && $na > 0) {
         |  org.apache.spark.sql.catalyst.InternalRow p0 = $ca.getStruct(0, 2);
         |  $res = $contains($cb, $nb, p0.getDouble(0), p0.getDouble(1));
         |}
         |if (!$res && $nb > 0) {
         |  org.apache.spark.sql.catalyst.InternalRow q0 = $cb.getStruct(0, 2);
         |  $res = $contains($ca, $na, q0.getDouble(0), q0.getDouble(1));
         |}
         |$inclusiveTail
         |${ev.value} = $res;""".stripMargin
    })
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
