package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}
import org.apache.spark.storage.StorageLevel

/** IVF-PQ: eCP coarse quantizer + product-quantized RESIDUALS — the
  * memory-lean ANN layout for corpora where even one float vector per
  * row is too much state (FAISS's IVFPQ; goes beyond the reference,
  * which has eCP and PQ separately but never composes them —
  * `ECPIndexGenerator.scala`, `PQIndexGenerator.scala`).
  *
  * Index table: `(id, leader int, codes array<int>)` — nsq bytes of
  * code + 4 bytes of leader per row, independent of dimensionality.
  * Scan: rank leaders by distance to the query until their member
  * counts cover `timesK·k` (same pruning rule as [[ECPIndex]]), then
  * for each probed leader compute the asymmetric distance of the
  * RESIDUAL query `q − c_leader` against the codes via the codegen
  * [[PQAdcExpr]] — one per-leader lookup table, a few unioned
  * leader-pruned scans, one global `TakeOrderedAndProject`.
  *
  * The residual trick matters: residuals cluster much tighter than raw
  * vectors, so the same codebook budget quantizes them with far less
  * error — recall at equal bytes beats plain PQ.
  */
class IVFPQIndex(val assignments: DataFrame, // (id, leader, codes)
                 val centroids: Array[(Int, Array[Double], Long)],
                 val codebooks: Array[Array[Array[Double]]],
                 val subLen: Int,
                 val idCol: String) extends VectorIndex {

  override def indexType: String = "ivfpq"
  override def isExact: Boolean = false

  /** Coarse probe + residual ADC both rank by squared Euclidean — any
    * other metric would get a near-random candidate set. */
  override def conformsTo(distName: String): Boolean =
    graft.functions.Distances.isL2Family(distName)

  override def candidates(q: Seq[Double], k: Int, timesK: Int): DataFrame = {
    val probed = ECPIndex.coverLeaders(centroids, q, k.toLong * timesK)
    val byCenter = centroids.map(c => c._1 -> c._2).toMap
    // per-probed-leader residual ADC tables, indexed by leader id — ONE
    // isin-filtered scan with a leader-keyed kernel, not one pass per
    // probed leader (200 probes must not mean 200 scans)
    val tables = new Array[Array[Array[Double]]](centroids.length)
    probed.foreach { l =>
      val qr = q.toArray.zip(byCenter(l)).map { case (x, c) => x - c }
      tables(l) = PQIndex.adcTable(codebooks, subLen, qr)
    }
    assignments.filter(col("leader").isin(probed: _*))
      .select(col(idCol),
        Bridge.column(IVFPQAdcExpr(Bridge.expression(col("codes")),
          Bridge.expression(col("leader")), tables)).as("adc"))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(k * timesK)
      .select(col(idCol))
  }
}

/** Leader-keyed asymmetric distance: `Σ_s tables(leader)(s)(code_s)` —
  * lets one scan serve every probed leader's residual table. */
case class IVFPQAdcExpr(left: Expression, right: Expression,
                        tables: Array[Array[Array[Double]]])
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(IntegerType, containsNull = false) ||
        left.dataType == ArrayType(IntegerType, containsNull = true)) {
      if (right.dataType == IntegerType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"leader must be int, got ${right.dataType.sql}")
    } else TypeCheckResult.TypeCheckFailure(s"codes must be array<int>, got ${left.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "ivfpq_adc"

  override protected def nullSafeEval(codes: Any, leader: Any): Any =
    PQAdcExpr.adc(codes.asInstanceOf[ArrayData].toIntArray(),
      tables(leader.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tRef = ctx.addReferenceObj("ivfpqTables", tables, "double[][][]")
    nullSafeCodeGen(ctx, ev, (codes, leader) =>
      s"${ev.value} = graft.index.PQAdcExpr.adc($codes.toIntArray(), $tRef[$leader]);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IVFPQIndex {

  def build(df: DataFrame, idCol: String, vecCol: String,
            maxLeaders: Int = 200, nsq: Int = 8, nCentroids: Int = 16,
            sampleN: Int = VectorIndex.DefaultTrainingSize, seed: Long = 42L,
            assign: Int = 1): IVFPQIndex = {
    val n = df.count()
    val numLeaders = math.max(2, math.min(math.sqrt(n.toDouble).toInt, maxLeaders))
    val sampleRows = (if (n <= sampleN) df
      else df.sample(withReplacement = false, sampleN.toDouble / n, seed))
      .select(col(vecCol).cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val dims = sampleRows.head.length
    require(dims % nsq == 0, s"dims $dims not divisible by nsq $nsq")
    val subLen = dims / nsq
    val centers = PQIndex.lloyd(sampleRows, numLeaders, iters = 10, seed = seed)

    // residual codebooks trained on the sample's residuals
    def nearestCenter(v: Array[Double]): Int =
      centers.indices.minBy(i => ECPIndex.sqDist(v.toSeq, centers(i)))
    val residualSample = sampleRows.map { v =>
      val c = centers(nearestCenter(v))
      v.zip(c).map { case (x, cc) => x - cc }
    }
    val codebooks = (0 until nsq).map { s =>
      val sub = residualSample.map(_.slice(s * subLen, (s + 1) * subLen))
      PQIndex.lloyd(sub, nCentroids, iters = 8, seed = seed + s)
    }.toArray

    // one distributed pass: leader(s) via the nearest-centroid kernel
    // (multi-assignment spills boundary points into their `assign`
    // nearest lists, residual taken against EACH assigned leader),
    // residual via a literal centroid matrix lookup, codes via PQ encode
    val centerMatrix = array(centers.map(c => array(c.map(lit).toSeq: _*)).toSeq: _*)
    val withLeader =
      if (assign <= 1)
        df.select(col(idCol), col(vecCol),
          Bridge.column(PQEncodeExpr(
            Bridge.expression(col(vecCol)), Array(centers), dims)).getItem(0).as("leader"))
      else ECPIndex.multiAssign(df, Seq(idCol, vecCol), vecCol, centers, assign)
    val residual = zip_with(col(vecCol).cast("array<double>"),
      element_at(centerMatrix, col("leader") + 1), (x, c) => x - c)
    val assignments = withLeader
      .select(col(idCol), col("leader"),
        Bridge.column(PQEncodeExpr(
          Bridge.expression(residual), codebooks, subLen)).as("codes"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val counts = assignments.groupBy("leader").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    new IVFPQIndex(assignments,
      centers.zipWithIndex.map { case (c, i) => (i, c, counts.getOrElse(i, 0L)) },
      codebooks, subLen, idCol)
  }
}
