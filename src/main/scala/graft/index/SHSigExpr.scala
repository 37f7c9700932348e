package graft.index

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Packed spectral-hashing signature of an (already rotated) vector. */
case class SHSigExpr(child: Expression, pc: Array[Array[Double]],
                     mins: Array[Double], ranges: Array[Double],
                     modes: Array[(Int, Int)])
  extends UnaryExpression with VecArrayInput {

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child, "sh_sig", FloatType, DoubleType)
  override def dataType: DataType = LongType
  override def prettyName: String = "sh_sig"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = isFloat
    val vec = Array.tabulate(v.numElements())(i =>
      if (fl) v.getFloat(i).toDouble else v.getDouble(i))
    SHIndex.signature(vec, pc, mins, ranges, modes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pcRef = ctx.addReferenceObj("shPc", pc, "double[][]")
    val mnRef = ctx.addReferenceObj("shMins", mins, "double[]")
    val rgRef = ctx.addReferenceObj("shRanges", ranges, "double[]")
    val mdRef = ctx.addReferenceObj("shModes", modes, "scala.Tuple2[]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    // fresh names: two instances of this expression in one generated
    // method would otherwise redeclare `vec`/`i` (janino rejects it and
    // the whole projection falls back to the interpreted path)
    val vec = ctx.freshName("vec")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, c =>
      s"""double[] $vec = new double[$c.numElements()];
         |for (int $i = 0; $i < $vec.length; $i++) $vec[$i] = (double) $c.$getter($i);
         |${ev.value} = graft.index.SHIndex.signature($vec, $pcRef, $mnRef, $rgRef, $mdRef);
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
