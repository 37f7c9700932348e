package graft.index

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Optimized Product Quantization (beyond the reference's 8 structures;
  * Ge et al., "Optimized Product Quantization for Approximate Nearest
  * Neighbor Search", CVPR'13): learn an orthogonal rotation R jointly
  * with the PQ codebooks so the sub-space split cuts along directions
  * the codebooks can actually represent — the standard fix for PQ's
  * weakness on correlated dimensions. Training alternates (1) codebook
  * fit on rotated sample, (2) the orthogonal Procrustes solve
  * `R = U·Vᵀ` of `svd(Y·Xᵀ)` toward the reconstructions, exactly the
  * OPQ-NP iteration.
  *
  * Spark shape: R (d×d doubles) and the codebooks are driver metadata
  * shipped inside codegen expressions; encoding composes the existing
  * [[PQEncodeExpr]] over a [[RotateExpr]] so the corpus pass stays one
  * distributed projection; the scan is the SAME ADC kernel as PQ with
  * the query rotated once on the driver. Rotation is orthogonal, so
  * squared-L2 in rotated space equals squared-L2 in the original —
  * candidates rank identically, just with less quantization error.
  */
class OPQIndex(val codes: DataFrame, // (id, codes array<int>)
               val rotation: Array[Array[Double]], // R, d×d row-major
               val codebooks: Array[Array[Array[Double]]],
               val subLen: Int,
               val idCol: String) extends VectorIndex {

  override def indexType: String = "opq"
  override def isExact: Boolean = false

  /** ADC ranks by squared Euclidean (rotation-invariant); any other
    * metric would get a near-random candidate set. */
  override def conformsTo(distName: String): Boolean =
    graft.functions.Distances.isL2Family(distName)

  override def candidates(q: Seq[Double], k: Int, timesK: Int): DataFrame = {
    val table = PQIndex.adcTable(codebooks, subLen,
      RotateExpr.rotate(rotation, q.toArray))
    codes.select(col(idCol),
        Bridge.column(PQAdcExpr(Bridge.expression(col("codes")), table)).as("adc"))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(k * timesK)
      .select(col(idCol))
  }
}

object OPQIndex {

  /** OPQ-NP training on a bounded sample (the same bounded-collect
    * contract as every structure in the family), then ONE distributed
    * encode pass over the corpus. */
  def build(df: DataFrame, idCol: String, vecCol: String, nsq: Int = 8,
            nCentroids: Int = 16, sampleN: Int = 1000, optIters: Int = 6,
            seed: Long = 42L): OPQIndex = {
    val dims = df.select(size(col(vecCol))).head().getInt(0)
    require(dims % nsq == 0, s"dims $dims not divisible by nsq $nsq")
    val subLen = dims / nsq
    val n = df.count()
    val sample = (if (n <= sampleN) df
      else df.sample(withReplacement = false, sampleN.toDouble / n, seed))
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "empty training sample")

    var r = Array.tabulate(dims, dims)((i, j) => if (i == j) 1.0 else 0.0)
    var books: Array[Array[Array[Double]]] = null
    var it = 0
    while (it < optIters) {
      val rotated = sample.map(RotateExpr.rotate(r, _))
      // few Lloyd iterations inside the alternation; the final fit below
      // runs the full budget on the converged rotation
      books = (0 until nsq).map { s =>
        val sub = rotated.map(_.slice(s * subLen, (s + 1) * subLen))
        PQIndex.lloyd(sub, nCentroids, iters = 4, seed = seed + s)
      }.toArray
      // reconstructions in rotated space: nearest codeword per sub-space
      val recon = rotated.map { v =>
        val code = PQEncodeExpr.encode(v, books, subLen)
        val y = new Array[Double](dims)
        var s = 0
        while (s < nsq) {
          System.arraycopy(books(s)(code(s)), 0, y, s * subLen, subLen)
          s += 1
        }
        y
      }
      // Procrustes: maximize tr(Rᵀ·Y·Xᵀ) → R = U·Vᵀ of svd(Y·Xᵀ)
      val m = breeze.linalg.DenseMatrix.zeros[Double](dims, dims)
      var p = 0
      while (p < sample.length) {
        val x = sample(p); val y = recon(p)
        var i = 0
        while (i < dims) {
          var j = 0
          while (j < dims) { m(i, j) += y(i) * x(j); j += 1 }
          i += 1
        }
        p += 1
      }
      val svd = breeze.linalg.svd(m)
      val ru = svd.U * svd.Vt
      r = Array.tabulate(dims, dims)((i, j) => ru(i, j))
      it += 1
    }
    // final full-budget codebook fit on the converged rotation
    val rotated = sample.map(RotateExpr.rotate(r, _))
    books = (0 until nsq).map { s =>
      val sub = rotated.map(_.slice(s * subLen, (s + 1) * subLen))
      PQIndex.lloyd(sub, nCentroids, iters = 8, seed = seed + s)
    }.toArray

    val codes = df.select(col(idCol),
        Bridge.column(PQEncodeExpr(
          RotateExpr(Bridge.expression(col(vecCol)), r), books, subLen)).as("codes"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    new OPQIndex(codes, r, books, subLen, idCol)
  }
}

/** Dense orthogonal rotation `R·x` as a codegen projection — O(d²) per
  * row with R a broadcast reference object; output is array<double> so
  * [[PQEncodeExpr]] composes directly on top. */
case class RotateExpr(child: Expression, rotation: Array[Array[Double]])
  extends UnaryExpression with VecArrayInput {

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child, "vec_rotate", FloatType, DoubleType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_rotate"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = isFloat
    val vec = Array.tabulate(v.numElements())(i =>
      if (fl) v.getFloat(i).toDouble else v.getDouble(i))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      RotateExpr.rotate(rotation, vec))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("rotation", rotation, "double[][]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    val vec = ctx.freshName("vec")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, c =>
      s"""double[] $vec = new double[$c.numElements()];
         |for (int $i = 0; $i < $vec.length; $i++) $vec[$i] = (double) $c.$getter($i);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.index.RotateExpr.rotate($rRef, $vec));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RotateExpr {
  def rotate(r: Array[Array[Double]], v: Array[Double]): Array[Double] = {
    val d = r.length
    val out = new Array[Double](d)
    var i = 0
    while (i < d) {
      val row = r(i)
      var s = 0.0
      var j = 0
      val lim = math.min(row.length, v.length)
      while (j < lim) { s += row(j) * v(j); j += 1 }
      out(i) = s
      i += 1
    }
    out
  }
}
