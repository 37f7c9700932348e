package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Scalar quantization index (the FAISS SQ8 shape — a family the
  * reference's §2.6 catalog stops short of; same architectural seam as
  * its PQ/VA structures, reference `pq/PQIndex.scala:38-64`): every
  * dimension quantized INDEPENDENTLY to 8 bits over its own corpus
  * [min, max] range. Codes are `dim` byte-valued ints per row (4-8×
  * smaller than the raw vectors); the scan computes the exact L2
  * distance between the query and each DEQUANTIZED vector through a
  * per-dimension 256-entry lookup table — the same Σ table(d)(code_d)
  * kernel as PQ's asymmetric distance ([[PQAdcExpr]] is reused
  * verbatim), so the scan stays whole-stage codegen.
  *
  * Against PQ: no codebook training (one min/max agg builds it), exact
  * per-dimension resolution instead of sub-space centroids — better
  * recall at the same code size for low-ish dimensions, the standard
  * first rung on the memory-reduction ladder.
  *
  * Scale: metadata is 2·dim doubles (driver-side, shipped as expression
  * literals); the codes relation is the only distributed state; the
  * per-query table is dim × 256 doubles built once on the driver. */
class SQIndex(val codes: DataFrame, // (id, codes array<int>)
              val mins: Array[Double],
              val scales: Array[Double], // (max-min)/255 per dim; 0 for flat dims
              val idCol: String) extends VectorIndex {

  override def indexType: String = "sq"
  override def isExact: Boolean = false

  /** Quantization only preserves L2-family ranking guarantees. */
  override def conformsTo(distName: String): Boolean =
    graft.functions.Distances.isL2Family(distName)

  override def candidates(q: Seq[Double], k: Int, timesK: Int): DataFrame = {
    val table = SQIndex.adcTable(mins, scales, q.toArray)
    codes.select(col(idCol),
        Bridge.column(PQAdcExpr(Bridge.expression(col("codes")), table)).as("adc"))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(k * timesK)
      .select(col(idCol))
  }

  /** Candidates restricted to a prior candidate pool — the REFINE stage
    * of a multi-level funnel (coarse 1-bit → 8-bit refine → exact): the
    * ADC kernel runs over only `pool` survivors via a semi-join on the
    * codes relation, so the 8-bit pass reads a bounded candidate set,
    * not the corpus. Same (adc, id) total order as [[candidates]]. */
  def candidatesAmong(pool: DataFrame, q: Seq[Double], k: Int,
                      timesK: Int): DataFrame = {
    val table = SQIndex.adcTable(mins, scales, q.toArray)
    codes.join(pool, Seq(idCol), "left_semi")
      .select(col(idCol),
        Bridge.column(PQAdcExpr(Bridge.expression(col("codes")), table)).as("adc"))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(k * timesK)
      .select(col(idCol))
  }

  /** Batched candidates in ONE codes scan: all Q ADC tables ride as
    * codegen kernel columns over the same relation pass, and a per-qid
    * [[graft.functions.BoundedTopK]] keeps ≤ k·timesK pairs map-side —
    * a single candidate-phase exchange of O(partitions·Q·k·timesK)
    * rows, vs Q sequential scans through the per-query path. The heap's
    * (distance, id) order is the same total order as the single-query
    * `orderBy(adc, id).limit`, so per query the candidate set is
    * bit-identical to Q [[candidates]] calls. */
  override def candidatesBatch(qs: Seq[Seq[Double]], k: Int,
                               timesK: Int): DataFrame = {
    require(qs.nonEmpty, "at least one query vector required")
    val adcCols = qs.zipWithIndex.map { case (q, i) =>
      Bridge.column(PQAdcExpr(Bridge.expression(col("codes")),
        SQIndex.adcTable(mins, scales, q.toArray))).as(s"__adc$i") }
    codes.select(col(idCol) +: adcCols: _*)
      .select(col(idCol), posexplode(array(
        qs.indices.map(i => col(s"__adc$i")): _*)).as(Seq("qid", "__adc")))
      .groupBy(col("qid"))
      .agg(graft.functions.BoundedTopK.topk(col("__adc"), col(idCol),
        k * timesK).as("tops"))
      .select(col("qid"), explode(col("tops")).as("t"))
      .select(col("qid"), col("t.id").as(idCol))
  }
}

object SQIndex {

  /** Per-dimension (query component → dequantized level) squared-distance
    * table: table(d)(c) = (q_d − (min_d + c·scale_d))². */
  private[index] def adcTable(mins: Array[Double], scales: Array[Double],
                              q: Array[Double]): Array[Array[Double]] =
    Array.tabulate(mins.length) { d =>
      Array.tabulate(256) { c =>
        val diff = q(d) - (mins(d) + c * scales(d))
        diff * diff
      }
    }

  /** Build from one distributed min/max aggregation — no training
    * sample, no clustering; the cheapest index in the family. Per-dim
    * ranges come from TWO vector-valued aggregates (`Summarizer`
    * min/max over the whole vector at once), not 2·dim named column
    * aggregates — at embedding dims (768–4096) the per-column form
    * generates thousands of Catalyst aggregate expressions, blowing
    * whole-stage-codegen limits and driver analysis time. */
  def build(df: DataFrame, idCol: String, vecCol: String): SQIndex = {
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.stat.Summarizer
    val v = col(vecCol).cast("array<double>")
    val row = df.select(array_to_vector(v).as("v"))
      .agg(Summarizer.min(col("v")).as("mn"), Summarizer.max(col("v")).as("mx"))
      .head()
    val mins = row.getAs[org.apache.spark.ml.linalg.Vector](0).toArray
    val maxes = row.getAs[org.apache.spark.ml.linalg.Vector](1).toArray
    val scales = Array.tabulate(mins.length) { d =>
      val r = maxes(d) - mins(d)
      if (r <= 0) 0.0 else r / 255.0
    }
    val codes = df.select(col(idCol),
        Bridge.column(SQEncodeExpr(Bridge.expression(col(vecCol)), mins, scales))
          .as("codes"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    new SQIndex(codes, mins, scales, idCol)
  }
}

/** Quantize a vector: per-dimension affine map to [0, 255]. */
case class SQEncodeExpr(child: Expression, mins: Array[Double], scales: Array[Double])
  extends UnaryExpression with VecArrayInput {

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child, "sq_encode", FloatType, DoubleType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sq_encode"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = isFloat
    val vec = Array.tabulate(v.numElements())(i =>
      if (fl) v.getFloat(i).toDouble else v.getDouble(i))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      SQEncodeExpr.encode(vec, mins, scales))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("sqMins", mins, "double[]")
    val sRef = ctx.addReferenceObj("sqScales", scales, "double[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    // fresh names per instance — redeclared locals would silently drop
    // the whole projection to the interpreted path (janino)
    val vec = ctx.freshName("vec")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, c =>
      s"""double[] $vec = new double[$c.numElements()];
         |for (int $i = 0; $i < $vec.length; $i++) $vec[$i] = (double) $c.$getter($i);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.index.SQEncodeExpr.encode($vec, $mRef, $sRef));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SQEncodeExpr {
  def encode(vec: Array[Double], mins: Array[Double], scales: Array[Double]): Array[Int] = {
    val n = math.min(vec.length, mins.length)
    val out = new Array[Int](n)
    var d = 0
    while (d < n) {
      out(d) =
        if (scales(d) <= 0) 0
        else {
          val c = math.round((vec(d) - mins(d)) / scales(d)).toInt
          if (c < 0) 0 else if (c > 255) 255 else c
        }
      d += 1
    }
    out
  }
}
