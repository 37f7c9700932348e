package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Sparse vector support — the reference's SPARSEVECTORTYPE
  * (`SparseVectorWrapper.scala:24-28`: struct(index: array<int>,
  * data: array<float>, length: int)). `Entity.sparsify` produces this
  * struct; [[densify]] restores the dense `array<float>` so the whole
  * distance/index family applies unchanged. Codegen kernel — the naive
  * column formulation (`array_position` per element) is O(d²). */
object SparseVectors {
  def densify(sv: Column): Column =
    Bridge.column(DensifyExpr(Bridge.expression(sv)))
}

case class DensifyExpr(child: Expression) extends UnaryExpression {

  private def valuesType: Option[DataType] = child.dataType match {
    case s: StructType if s.length == 3 =>
      (s(0).dataType, s(1).dataType, s(2).dataType) match {
        case (ArrayType(IntegerType, _), ArrayType(e @ (FloatType | DoubleType), _), IntegerType) =>
          Some(e)
        case _ => None
      }
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = valuesType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      "densify expects struct(indices: array<int>, values: array<float|double>, length: int), " +
        s"got ${child.dataType.sql}")
  }

  private def isFloat = valuesType.contains(FloatType)

  override def dataType: DataType =
    ArrayType(valuesType.getOrElse(FloatType), containsNull = false)
  override def prettyName: String = "densify"

  override protected def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val indices = row.getArray(0).toIntArray()
    val length = row.getInt(2)
    if (isFloat)
      new GenericArrayData(DensifyExpr.densifyF(indices, row.getArray(1).toFloatArray(), length))
    else
      new GenericArrayData(DensifyExpr.densifyD(indices, row.getArray(1).toDoubleArray(), length))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isFloat) "densifyF" else "densifyD"
    val getter = if (isFloat) "toFloatArray" else "toDoubleArray"
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.DensifyExpr.$fn(
         |    $c.getArray(0).toIntArray(), $c.getArray(1).$getter(), $c.getInt(2)));""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DensifyExpr {
  def densifyF(indices: Array[Int], values: Array[Float], length: Int): Array[Float] = {
    val out = new Array[Float](length)
    var i = 0
    while (i < indices.length) {
      if (indices(i) >= 0 && indices(i) < length) out(indices(i)) = values(i)
      i += 1
    }
    out
  }

  def densifyD(indices: Array[Int], values: Array[Double], length: Int): Array[Double] = {
    val out = new Array[Double](length)
    var i = 0
    while (i < indices.length) {
      if (indices(i) >= 0 && indices(i) < length) out(indices(i)) = values(i)
      i += 1
    }
    out
  }
}
