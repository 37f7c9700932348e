package graft.index

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Metric inverted index (reference `mi/MIIndexGenerator.scala:44-51`,
  * `MIIndex.scala:53-74`): pick ~min(200, 2√n) reference points; store
  * for each tuple the ids of its `ki` nearest references in rank order.
  * Scan: Spearman-footrule rank aggregation against the query's `ks`
  * nearest references — Σ |position difference|, penalty `ki+1` for a
  * reference missing from the other list; `orderBy.limit`.
  *
  * Any metric distance; reference points live on the driver (O(refs·dim))
  * and ride into the kernels as reference objects.
  */
class MIIndex(val postings: DataFrame, // (id, refs array<int> in rank order)
              val refPoints: Array[Array[Double]],
              val ki: Int, val ks: Int,
              val idCol: String) extends VectorIndex {

  override def indexType: String = "mi"
  override def isExact: Boolean = false

  override def candidates(q: Seq[Double], k: Int, timesK: Int): DataFrame = {
    val qRefs = MIIndex.nearestRefs(q.toArray, refPoints, ks)
    postings.select(col(idCol),
        Bridge.column(MIFootruleExpr(Bridge.expression(col("refs")), qRefs, ki)).as("score"))
      .orderBy(col("score").asc, col(idCol).asc)
      .limit(k * timesK)
      .select(col(idCol))
  }
}

object MIIndex {

  private[index] def nearestRefs(v: Array[Double], refs: Array[Array[Double]], take: Int): Array[Int] =
    refs.indices.sortBy(i => ECPIndex.sqDist(v.toSeq, refs(i))).take(take).toArray

  def build(df: DataFrame, idCol: String, vecCol: String, ki: Int = 10,
            ks: Int = 10, maxRefs: Int = 200, seed: Long = 42L): MIIndex = {
    val n = df.count()
    val nRefs = math.max(ki, math.min((2 * math.sqrt(n.toDouble)).toInt, maxRefs))
    // deterministic reference-point sample
    val refPoints = df.select(col(vecCol).cast("array<double>"))
      .sample(withReplacement = false, math.min(1.0, (nRefs * 4).toDouble / math.max(1L, n)), seed)
      .limit(nRefs)
      .collect().map(_.getSeq[Double](0).toArray)
    val postings = df.select(col(idCol),
        Bridge.column(MIEncodeExpr(Bridge.expression(col(vecCol)), refPoints, ki)).as("refs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    new MIIndex(postings, refPoints, ki, ks, idCol)
  }
}

/** ids of the `ki` nearest reference points, in rank order. */
case class MIEncodeExpr(child: Expression, refs: Array[Array[Double]], ki: Int)
  extends UnaryExpression with VecArrayInput {

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child, "mi_encode", FloatType, DoubleType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "mi_encode"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = isFloat
    val vec = Array.tabulate(v.numElements())(i =>
      if (fl) v.getFloat(i).toDouble else v.getDouble(i))
    new GenericArrayData(MIIndex.nearestRefs(vec, refs, ki))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("miRefs", refs, "double[][]")
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
         |  graft.index.MIEncodeExpr.nearest($vec, $rRef, $ki));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MIEncodeExpr {
  /** Java-callable bridge for generated code. */
  def nearest(vec: Array[Double], refs: Array[Array[Double]], ki: Int): Array[Int] =
    MIIndex.nearestRefs(vec, refs, ki)
}

/** Footrule score of a posting list vs the query's ranked refs. */
case class MIFootruleExpr(child: Expression, qRefs: Array[Int], ki: Int)
  extends UnaryExpression with VecArrayInput {

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child, "mi_footrule", IntegerType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "mi_footrule"

  override protected def nullSafeEval(input: Any): Any =
    MIFootruleExpr.score(input.asInstanceOf[ArrayData].toIntArray(), qRefs, ki)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("miQRefs", qRefs, "int[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.index.MIFootruleExpr.score($c.toIntArray(), $qRef, $ki);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MIFootruleExpr {
  def score(rowRefs: Array[Int], qRefs: Array[Int], ki: Int): Double = {
    var s = 0.0
    var qi = 0
    while (qi < qRefs.length) {
      val r = qRefs(qi)
      var pos = -1
      var i = 0
      while (i < rowRefs.length && pos < 0) {
        if (rowRefs(i) == r) pos = i
        i += 1
      }
      s += (if (pos < 0) ki + 1.0 else math.abs(pos - qi).toDouble)
      qi += 1
    }
    s
  }
}
