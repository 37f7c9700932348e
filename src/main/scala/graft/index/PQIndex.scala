package graft.index

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Product quantization index (reference `pq/PQIndexGenerator.scala:42-83`,
  * `PQIndex.scala:38-64`): dimensions split into `nsq` sub-vectors, a
  * KMeans codebook per sub-space, codes = one cluster id per sub-vector.
  * Scan: asymmetric distance — per-sub-space lookup table of (query
  * sub-vector → centroid) squared distances, summed over the code via a
  * codegen kernel; top `timesK·k` ids become candidates for exact
  * re-rank. (The reference computes `2 XOR nsqbits` = 10 clusters — a
  * noted bug, SURVEY §7.3; we use a real power of two.)
  *
  * Scale: codes are `nsq` ints per row (byte-sized values); the lookup
  * table is nsq·centroids doubles broadcast per query; KMeans fits are
  * distributed MLlib per sub-space on a sample.
  */
class PQIndex(val codes: DataFrame, // (id, codes array<int>)
              val codebooks: Array[Array[Array[Double]]], // [subspace][centroid][dim]
              val subLen: Int,
              val idCol: String) extends VectorIndex {

  override def indexType: String = "pq"
  override def isExact: Boolean = false

  override def candidates(q: Seq[Double], k: Int, timesK: Int): DataFrame = {
    val table = PQIndex.adcTable(codebooks, subLen, q.toArray)
    codes.select(col(idCol),
        Bridge.column(PQAdcExpr(Bridge.expression(col("codes")), table)).as("adc"))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(k * timesK)
      .select(col(idCol))
  }
}

object PQIndex {

  /** Per-subspace (query sub-vector → codeword) squared-distance lookup
    * table — shared by the PQ and IVF-PQ asymmetric-distance scans. */
  private[index] def adcTable(codebooks: Array[Array[Array[Double]]], subLen: Int,
                              q: Array[Double]): Array[Array[Double]] =
    codebooks.zipWithIndex.map { case (book, s) =>
      val qs = q.slice(s * subLen, (s + 1) * subLen)
      book.map(c => ECPIndex.sqDist(qs.toSeq, c))
    }

  /** Deterministic local Lloyd's k-means for bounded codebook training. */
  private[graft] def lloyd(points: Array[Array[Double]], k: Int, iters: Int,
                           seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "empty training sample")
    val dim = points.head.length
    val rnd = new scala.util.Random(seed)
    val centers = Array.tabulate(math.min(k, points.length))(i =>
      points(rnd.nextInt(points.length)).clone())
    val assign = new Array[Int](points.length)
    var it = 0
    while (it < iters) {
      var p = 0
      while (p < points.length) {
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < centers.length) {
          val d = ECPIndex.sqDist(points(p).toSeq, centers(c))
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        assign(p) = best
        p += 1
      }
      val sums = Array.fill(centers.length, dim)(0.0)
      val counts = new Array[Int](centers.length)
      p = 0
      while (p < points.length) {
        val c = assign(p)
        counts(c) += 1
        var d = 0
        while (d < dim) { sums(c)(d) += points(p)(d); d += 1 }
        p += 1
      }
      var c = 0
      while (c < centers.length) {
        if (counts(c) > 0) {
          var d = 0
          while (d < dim) { centers(c)(d) = sums(c)(d) / counts(c); d += 1 }
        }
        c += 1
      }
      it += 1
    }
    centers
  }

  /** Build with `nsq` sub-quantizers × `nCentroids` codewords, fit on a
    * training sample. */
  def build(df: DataFrame, idCol: String, vecCol: String, nsq: Int = 8,
            nCentroids: Int = 16, sampleN: Int = 1000, seed: Long = 42L): PQIndex = {
    val dims = df.select(size(col(vecCol))).head().getInt(0)
    require(dims % nsq == 0, s"dims $dims not divisible by nsq $nsq")
    val subLen = dims / nsq
    val n = df.count()
    // The training sample is bounded (≤ sampleN rows) by design — the
    // reference trains codebooks on a collected sample too
    // (IndexGenerator.scala:48-80). Local Lloyd's over ≤1000×subLen
    // doubles beats 8 sequential MLlib jobs by ~7 s of scheduler
    // overhead; the full-corpus ENCODING stays distributed.
    val sampleRows = (if (n <= sampleN) df
      else df.sample(withReplacement = false, sampleN.toDouble / n, seed))
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)

    val codebooks = (0 until nsq).map { s =>
      val sub = sampleRows.map(_.slice(s * subLen, (s + 1) * subLen))
      PQIndex.lloyd(sub, nCentroids, iters = 8, seed = seed + s)
    }.toArray

    val codes = df.select(col(idCol),
        Bridge.column(PQEncodeExpr(Bridge.expression(col(vecCol)), codebooks, subLen)).as("codes"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    new PQIndex(codes, codebooks, subLen, idCol)
  }
}

/** Encode a vector: nearest codeword per sub-space. */
case class PQEncodeExpr(child: Expression, codebooks: Array[Array[Array[Double]]], subLen: Int)
  extends UnaryExpression with VecArrayInput {

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child, "pq_encode", FloatType, DoubleType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = isFloat
    val vec = Array.tabulate(v.numElements())(i =>
      if (fl) v.getFloat(i).toDouble else v.getDouble(i))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      PQEncodeExpr.encode(vec, codebooks, subLen))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqBooks", codebooks, "double[][][]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    // fresh names: two instances of this expression in one generated
    // method would otherwise redeclare `vec`/`i` (janino rejects it and
    // the whole projection falls back to the interpreted path)
    val vec = ctx.freshName("vec")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, c =>
      s"""double[] $vec = new double[$c.numElements()];
         |for (int $i = 0; $i < $vec.length; $i++) $vec[$i] = (double) $c.$getter($i);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.index.PQEncodeExpr.encode($vec, $cbRef, $subLen));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PQEncodeExpr {
  def encode(vec: Array[Double], codebooks: Array[Array[Array[Double]]], subLen: Int): Array[Int] = {
    val nsq = codebooks.length
    val out = new Array[Int](nsq)
    var s = 0
    while (s < nsq) {
      val book = codebooks(s)
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < book.length) {
        var d = 0.0
        var i = 0
        val off = s * subLen
        while (i < subLen && off + i < vec.length) {
          val diff = vec(off + i) - book(c)(i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    out
  }
}

/** Asymmetric distance: Σ_s table(s)(code_s). */
case class PQAdcExpr(child: Expression, table: Array[Array[Double]])
  extends UnaryExpression with VecArrayInput {

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child, "pq_adc", IntegerType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(input: Any): Any =
    PQAdcExpr.adc(input.asInstanceOf[ArrayData].toIntArray(), table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("pqTable", table, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.index.PQAdcExpr.adc($c.toIntArray(), $tRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PQAdcExpr {
  def adc(codes: Array[Int], table: Array[Array[Double]]): Double = {
    var s = 0.0
    val n = math.min(codes.length, table.length)
    var i = 0
    while (i < n) { s += table(i)(codes(i)); i += 1 }
    s
  }
}
