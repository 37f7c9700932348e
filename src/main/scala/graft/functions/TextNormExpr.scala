package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a codegen'd Catalyst expression — the
  * first step of any web-corpus text cleanup: canonically-equivalent
  * byte sequences (decomposed `e`+U+0301 vs composed `é`, compatibility
  * variants left alone) collapse to ONE canonical form, so hashing,
  * dedup shingles, and tokenization downstream see one spelling.
  *
  * Why a custom expression: Spark ships no Unicode-normalization
  * function, and a Scala UDF would break whole-stage codegen around the
  * very scans this runs in. The kernel stays inside the generated code
  * via a static call; the ASCII fast path below skips the (allocating)
  * `java.text.Normalizer` entirely — real corpora are mostly-ASCII, so
  * the common row costs one byte scan, zero allocation. */
object TextNorm {
  /** NFC-normalize a string column (null-safe, codegen'd). */
  def nfc(text: Column): Column =
    Bridge.column(NfcNormalizeExpr(Bridge.expression(text)))
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires string, got ${other.sql}")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalizeExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  /** Shared by interpreted eval and generated code. Pure-ASCII input is
    * NFC by definition — returned as-is without decoding. */
  def compute(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
      else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
    }
  }
}
