package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk BOUNDARIES of a string in one pass — the
  * codegen kernel behind [[graft.operators.Dedup.cdcChunks]].
  *
  * Why a custom expression: the declarative form
  * (`filter(sequence(window, n), i -> hash(substr(text, i-w+1, w)))`)
  * re-seeks the string from byte 0 on EVERY `substr` call (UTF8String
  * positions are codepoint offsets), making boundary detection
  * O(chars²) per row — measured 360 s for the sf0.1 corpus vs ~1 s for
  * this kernel. Here the text is decoded to a codepoint array once and
  * each window hash is `window` multiply-mod steps over it: O(chars ·
  * window) per row, zero allocation beyond the two arrays, and the
  * call stays inside whole-stage codegen via a static invoke.
  *
  * Emits the 1-based cut positions `i` (`window ≤ i < length`) where
  * the rolling hash of the trailing `window` codepoints — the same
  * seed-7 `h·131 + c mod 1e9+7` recurrence as every portable hash in
  * this library — is ≡ 0 (mod `divisor`). The END position is never
  * emitted (the chunker appends it as the final bound). Strings
  * shorter than `window` yield no cuts (one whole-document chunk). */
case class CdcBoundsExpr(child: Expression, window: Int, divisor: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cdc_bounds requires string, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def prettyName: String = "cdc_bounds"

  override protected def nullSafeEval(input: Any): Any =
    CdcBoundsExpr.compute(input.asInstanceOf[UTF8String], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CdcBoundsExpr.compute($c, $window, $divisor);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcBoundsExpr {
  private val P = 1000000007L

  /** One-pass boundary scan; shared by interpreted eval and codegen. */
  def compute(s: UTF8String, window: Int, divisor: Int): GenericArrayData = {
    val str = s.toString
    // decode to codepoints once (ASCII corpus: cps(i) == char i)
    val n = str.codePointCount(0, str.length)
    if (n < window) return new GenericArrayData(Array.emptyIntArray)
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    val out = new java.util.ArrayList[Integer](n / math.max(divisor, 1) + 4)
    var i = window // 1-based end position of the window
    while (i < n) { // i == n excluded: the chunker appends the end bound
      var h = 7L
      var j = i - window
      while (j < i) { h = (h * 131L + cps(j)) % P; j += 1 }
      if (h % divisor == 0L) out.add(i)
      i += 1
    }
    val arr = new Array[Int](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }
}

object CdcBounds {
  /** Cut positions of `text` as an `array<int>` column (null-safe). */
  def apply(text: Column, window: Int, divisor: Int): Column =
    Bridge.column(CdcBoundsExpr(Bridge.expression(text), window, divisor))
}
