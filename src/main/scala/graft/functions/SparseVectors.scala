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

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.length == 3 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"densify expects struct(indices, values, length), got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "densify"

  override protected def nullSafeEval(input: Any): Any = {
    val row = input.asInstanceOf[InternalRow]
    val indices = row.getArray(0).toIntArray()
    val values = row.getArray(1).toFloatArray()
    val length = row.getInt(2)
    new GenericArrayData(DensifyExpr.densify(indices, values, length))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.DensifyExpr.densify(
         |    $c.getArray(0).toIntArray(), $c.getArray(1).toFloatArray(), $c.getInt(2)));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DensifyExpr {
  def densify(indices: Array[Int], values: Array[Float], length: Int): Array[Float] = {
    val out = new Array[Float](length)
    var i = 0
    while (i < indices.length) {
      if (indices(i) >= 0 && indices(i) < length) out(indices(i)) = values(i)
      i += 1
    }
    out
  }
}
