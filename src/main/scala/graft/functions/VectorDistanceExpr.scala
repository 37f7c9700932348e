package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native codegen'd distance kernels over `array<float>` / `array<double>`
  * columns — the hot path of every kNN scan and similarity join.
  *
  * The reference executes these as Scala UDFs over Breeze vectors
  * (`/root/reference/src/main/scala/org/vitrivr/adampro/query/distance/Distance.scala:26-55`),
  * paying serialization per row. The Catalyst higher-order-function
  * formulation in [[Distances]] avoids ser/de but is interpreted
  * (`zip_with`/`aggregate` don't participate in whole-stage codegen and
  * allocate an intermediate array per row). This expression generates a
  * tight primitive loop straight over the columnar `ArrayData`, fusing
  * multi-accumulator kernels (cosine needs dot + both norms) into one
  * pass — the shape a 100 TB scan needs.
  *
  * Semantics are identical to [[Distances]]: left-to-right summation in
  * Double, cosine zero-guard at 1e-5, Hamming counts exact inequality.
  * Length mismatch truncates to the shorter side; element nulls are not
  * expected (vectors are `containsNull=false`).
  */
object VectorKernel {
  val Manhattan = "manhattan"
  val SqEuclidean = "sqeuclidean"
  val Euclidean = "euclidean"
  val Chebyshev = "chebyshev"
  val Dot = "dot"
  val CosineDist = "cosine"
  val CosineSim = "cosinesim"
  val Hamming = "hamming"
  val SpanNorm = "spannorm"
  val Correlation = "correlation"
  val All: Set[String] = Set(Manhattan, SqEuclidean, Euclidean, Chebyshev,
    Dot, CosineDist, CosineSim, Hamming, SpanNorm, Correlation)

  /** Column-level entry point. */
  def apply(kind: String, a: Column, b: Column): Column =
    Bridge.column(
      VectorDistanceExpr(Bridge.expression(a), Bridge.expression(b), kind))
}

case class VectorDistanceExpr(left: Expression, right: Expression, kind: String)
  extends BinaryExpression {

  require(VectorKernel.All.contains(kind), s"unknown vector kernel: $kind")

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_$kind requires array<float|double> inputs, got ${left.dataType.sql} / ${right.dataType.sql}")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = s"vec_$kind"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    val n = math.min(xs.numElements(), ys.numElements())
    @inline def x(i: Int): Double = if (lf) xs.getFloat(i).toDouble else xs.getDouble(i)
    @inline def y(i: Int): Double = if (rf) ys.getFloat(i).toDouble else ys.getDouble(i)
    kind match {
      case VectorKernel.Manhattan =>
        var s = 0.0; var i = 0
        while (i < n) { s += math.abs(x(i) - y(i)); i += 1 }; s
      case VectorKernel.SqEuclidean =>
        var s = 0.0; var i = 0
        while (i < n) { val d = x(i) - y(i); s += d * d; i += 1 }; s
      case VectorKernel.Euclidean =>
        var s = 0.0; var i = 0
        while (i < n) { val d = x(i) - y(i); s += d * d; i += 1 }; math.sqrt(s)
      case VectorKernel.Chebyshev =>
        var m = 0.0; var i = 0
        while (i < n) { val d = math.abs(x(i) - y(i)); if (d > m) m = d; i += 1 }; m
      case VectorKernel.Dot =>
        var s = 0.0; var i = 0
        while (i < n) { s += x(i) * y(i); i += 1 }; s
      case VectorKernel.CosineDist | VectorKernel.CosineSim =>
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < n) {
          val xi = x(i); val yi = y(i)
          dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
        }
        val sna = math.sqrt(na); val snb = math.sqrt(nb)
        val sim = if (sna < 1e-5 || snb < 1e-5) 0.0 else dot / (sna * snb)
        if (kind == VectorKernel.CosineSim) sim
        else if (sna < 1e-5 || snb < 1e-5) 0.0
        else 1.0 - sim
      case VectorKernel.Hamming =>
        var s = 0.0; var i = 0
        while (i < n) { if (x(i) != y(i)) s += 1.0; i += 1 }; s
      case VectorKernel.SpanNorm =>
        if (n == 0) 0.0
        else {
          var mx = Double.NegativeInfinity; var mn = Double.PositiveInfinity; var i = 0
          while (i < n) {
            val d = x(i) - y(i)
            if (d > mx) mx = d
            if (d < mn) mn = d
            i += 1
          }
          mx - mn
        }
      case VectorKernel.Correlation =>
        // Two passes, matching the HOF formulation's arithmetic exactly:
        // means over each FULL array (left-to-right double sums), then
        // cosine distance of the centered values over the common prefix.
        val la = xs.numElements(); val lb = ys.numElements()
        var sx = 0.0; var sy = 0.0; var i = 0
        while (i < la) { sx += x(i); i += 1 }
        i = 0
        while (i < lb) { sy += y(i); i += 1 }
        val ma = sx / la; val mb = sy / lb
        var dot = 0.0; var na = 0.0; var nb = 0.0
        i = 0
        while (i < n) {
          val xc = x(i) - ma; val yc = y(i) - mb
          dot += xc * yc; na += xc * xc; nb += yc * yc; i += 1
        }
        val sna = math.sqrt(na); val snb = math.sqrt(nb)
        if (sna < 1e-5 || snb < 1e-5) 0.0 else 1.0 - dot / (sna * snb)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val xs = ctx.freshName("x")
      val ys = ctx.freshName("y")
      val getX = if (elemIsFloat(left)) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
      val getY = if (elemIsFloat(right)) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
      val header =
        s"""int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $xs; double $ys;""".stripMargin
      val body = kind match {
        case VectorKernel.Manhattan | VectorKernel.SqEuclidean | VectorKernel.Euclidean |
             VectorKernel.Dot | VectorKernel.Hamming =>
          val s = ctx.freshName("s")
          val accum = kind match {
            case VectorKernel.Manhattan => s"$s += java.lang.Math.abs($xs - $ys);"
            case VectorKernel.SqEuclidean | VectorKernel.Euclidean =>
              s"double d = $xs - $ys; $s += d * d;"
            case VectorKernel.Dot => s"$s += $xs * $ys;"
            case VectorKernel.Hamming => s"if ($xs != $ys) $s += 1.0;"
            case _ => ""
          }
          val finish = if (kind == VectorKernel.Euclidean)
            s"${ev.value} = java.lang.Math.sqrt($s);" else s"${ev.value} = $s;"
          s"""double $s = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  $xs = $getX; $ys = $getY;
             |  $accum
             |}
             |$finish""".stripMargin
        case VectorKernel.Chebyshev =>
          val m = ctx.freshName("m")
          s"""double $m = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  $xs = $getX; $ys = $getY;
             |  double d = java.lang.Math.abs($xs - $ys);
             |  if (d > $m) $m = d;
             |}
             |${ev.value} = $m;""".stripMargin
        case VectorKernel.CosineDist | VectorKernel.CosineSim =>
          val dot = ctx.freshName("dot")
          val na = ctx.freshName("na")
          val nb = ctx.freshName("nb")
          val result =
            if (kind == VectorKernel.CosineSim)
              s"${ev.value} = ($na < 1e-5 || $nb < 1e-5) ? 0.0 : $dot / ($na * $nb);"
            else
              s"${ev.value} = ($na < 1e-5 || $nb < 1e-5) ? 0.0 : 1.0 - $dot / ($na * $nb);"
          s"""double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  $xs = $getX; $ys = $getY;
             |  $dot += $xs * $ys; $na += $xs * $xs; $nb += $ys * $ys;
             |}
             |$na = java.lang.Math.sqrt($na); $nb = java.lang.Math.sqrt($nb);
             |$result""".stripMargin
        case VectorKernel.SpanNorm =>
          val mx = ctx.freshName("mx")
          val mn = ctx.freshName("mn")
          s"""double $mx = Double.NEGATIVE_INFINITY;
             |double $mn = Double.POSITIVE_INFINITY;
             |for (int $i = 0; $i < $n; $i++) {
             |  $xs = $getX; $ys = $getY;
             |  double d = $xs - $ys;
             |  if (d > $mx) $mx = d;
             |  if (d < $mn) $mn = d;
             |}
             |${ev.value} = ($n == 0) ? 0.0 : $mx - $mn;""".stripMargin
        case VectorKernel.Correlation =>
          // Janino rejects re-declaring the same for-init variable in
          // sequential loops within one block — each loop gets its own
          // fresh index name.
          val la = ctx.freshName("la")
          val lb = ctx.freshName("lb")
          val j1 = ctx.freshName("j1")
          val j2 = ctx.freshName("j2")
          val sx = ctx.freshName("sx")
          val sy = ctx.freshName("sy")
          val ma = ctx.freshName("ma")
          val mb = ctx.freshName("mb")
          val dot = ctx.freshName("dot")
          val na = ctx.freshName("na")
          val nb = ctx.freshName("nb")
          val getXj1 = if (elemIsFloat(left)) s"(double) $a.getFloat($j1)" else s"$a.getDouble($j1)"
          val getYj2 = if (elemIsFloat(right)) s"(double) $b.getFloat($j2)" else s"$b.getDouble($j2)"
          s"""int $la = $a.numElements(); int $lb = $b.numElements();
             |double $sx = 0.0; double $sy = 0.0;
             |for (int $j1 = 0; $j1 < $la; $j1++) { $sx += $getXj1; }
             |for (int $j2 = 0; $j2 < $lb; $j2++) { $sy += $getYj2; }
             |double $ma = $sx / $la; double $mb = $sy / $lb;
             |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
             |for (int $i = 0; $i < $n; $i++) {
             |  $xs = $getX - $ma; $ys = $getY - $mb;
             |  $dot += $xs * $ys; $na += $xs * $xs; $nb += $ys * $ys;
             |}
             |$na = java.lang.Math.sqrt($na); $nb = java.lang.Math.sqrt($nb);
             |${ev.value} = ($na < 1e-5 || $nb < 1e-5) ? 0.0 : 1.0 - $dot / ($na * $nb);""".stripMargin
      }
      header + "\n" + body
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
