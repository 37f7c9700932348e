package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd per-row repetition-stat kernel: one hash-map pass over a
  * document's token array producing all five Gopher-style counters at
  * once — `(token_cnt, distinct_toks, top_cnt, bigram_cnt,
  * distinct_bigrams)`.
  *
  * Why a custom expression: the aggregation formulation
  * ([[graft.operators.TextAnalysis.repetitionSignals]]) shuffles O(total
  * grams) rows twice — the right shape when rows sharing an id must merge
  * into one logical document. When each row IS its own document (the
  * normal corpus layout), those shuffles buy nothing: this kernel computes
  * the same counters in O(tokens) per row with zero data movement, so the
  * repetition filter collapses into the scan like any other codegen
  * predicate. A pure-HOF per-row formulation is not an alternative:
  * interpreted lambdas get no common-subexpression elimination and a
  * distinct-count needs a map anyway.
  */
object TextStats {
  /** Per-row repetition counters over an `array<string>` token column. */
  def repetitionStats(tokens: Column): Column =
    Bridge.column(RepetitionStatsExpr(Bridge.expression(tokens)))

  /** Tagged gram array (tag 0 = token, tag 1 = bigram) over an
    * `array<string>` token column, built in one O(tokens) kernel pass.
    * The pure-HOF formulation (`concat(transform(toks, …),
    * transform(sequence(…), i => concat_ws(' ', element_at(toks, i+1),
    * …)))`) re-evaluates the token subtree PER ELEMENT under the
    * interpreted-lambda engine (no CSE) — O(tokens²) per document,
    * measured 8 s for 5000 docs at sf0.1. */
  def taggedGrams(tokens: Column): Column =
    Bridge.column(TaggedGramsExpr(Bridge.expression(tokens)))
}

/** One-pass tagged token+bigram gram array; see [[TextStats.taggedGrams]]. */
case class TaggedGramsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"tagged_grams requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tag", IntegerType, nullable = false),
    StructField("g", StringType, nullable = false))), containsNull = false)

  override def prettyName: String = "tagged_grams"

  override protected def nullSafeEval(input: Any): Any =
    TaggedGramsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TaggedGramsExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TaggedGramsExpr {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. Null elements are
    * skipped defensively (the caller filters empty tokens upstream). */
  def compute(toks: ArrayData): GenericArrayData = {
    val n = toks.numElements()
    val out = new java.util.ArrayList[AnyRef](math.max(1, 2 * n))
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      val t = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      if (t != null) {
        val tok = t.clone()
        out.add(new GenericInternalRow(Array[Any](0, tok)))
        if (prev != null) {
          out.add(new GenericInternalRow(
            Array[Any](1, UTF8String.concat(prev, Space, tok))))
        }
        prev = tok
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats requires array<string>, got ${other.sql}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("token_cnt", LongType, nullable = false),
    StructField("distinct_toks", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false),
    StructField("bigram_cnt", LongType, nullable = false),
    StructField("distinct_bigrams", LongType, nullable = false)))

  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(input: Any): Any = {
    val st = RepetitionStatsExpr.compute(input.asInstanceOf[ArrayData])
    new GenericInternalRow(Array[Any](st(0), st(1), st(2), st(3), st(4)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh names: a second instance in the same generated method would
    // redeclare them (janino error → interpreted fallback)
    val st = ctx.freshName("st")
    val vals = ctx.freshName("vals")
    val k = ctx.freshName("k")
    nullSafeCodeGen(ctx, ev, c =>
      s"""long[] $st = graft.functions.RepetitionStatsExpr.compute($c);
         |Object[] $vals = new Object[5];
         |for (int $k = 0; $k < 5; $k++) $vals[$k] = $st[$k];
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($vals);
         |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStatsExpr {
  private val Space = UTF8String.fromString(" ")

  /** Shared by interpreted eval and generated code. Null tokens count as
    * zero-length grams are impossible upstream (the caller filters empty
    * tokens); a null element is skipped defensively. */
  def compute(toks: ArrayData): Array[Long] = {
    val n = toks.numElements()
    val tokCounts = new java.util.HashMap[UTF8String, Array[Long]]()
    val biCounts = new java.util.HashMap[UTF8String, Array[Long]]()
    var tokenCnt = 0L
    var bigramCnt = 0L
    var topCnt = 0L
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      val t = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      if (t != null) {
        // clone: the backing bytes of an unsafe array may be transient
        val key = t.clone()
        val c = tokCounts.get(key)
        val cnt = if (c == null) { tokCounts.put(key, Array(1L)); 1L }
          else { c(0) += 1; c(0) }
        if (cnt > topCnt) topCnt = cnt
        tokenCnt += 1
        if (prev != null) {
          val bi = UTF8String.concat(prev, Space, key)
          val bc = biCounts.get(bi)
          if (bc == null) biCounts.put(bi, Array(1L)) else bc(0) += 1
          bigramCnt += 1
        }
        prev = key
      }
      i += 1
    }
    Array(tokenCnt, tokCounts.size.toLong, topCnt, bigramCnt, biCounts.size.toLong)
  }
}
