package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen kernels for the library's portable char-level rolling hashes
  * (`h := (h·mult + codepoint) mod p`, seeded) — the primitive behind
  * [[graft.operators.TextAnalysis.rollingFingerprint]] /
  * [[graft.operators.Sampling.keyHash]] / the packed identity hash
  * [[graft.operators.Sampling.keyHash62]].
  *
  * Why a custom expression: the declarative form
  * (`aggregate(split(s, ""), seed, (h, c) -> pmod(h·mult + ascii(c), p))`)
  * is an interpreted higher-order fold — Spark materializes a per-char
  * string array and evaluates the lambda per element outside whole-stage
  * codegen. The r20 identity widening (two such folds fused into one
  * struct-state fold for keyHash62) cost the CDC dedup family +19–42 %
  * wall (`cdc_repeated_chunks` 2.52 → 3.57 s, the r20 battery's slowest
  * query). Here the fold is one primitive codepoint walk — a direct
  * byte walk over the UTF8String (zero allocation) for ASCII input,
  * a decoded-String walk otherwise — with the same integer recurrence,
  * and stays inside whole-stage codegen via a static invoke; for the
  * dual hash both recurrences ride the SAME walk.
  *
  * Bit-identity contract: `split(s, "")` splits at codePOINT boundaries
  * (Java regex never cuts a surrogate pair) and `ascii(c)` of a one-char
  * string is its codepoint, so the walk below reproduces the interpreted
  * fold exactly — including for supplementary-plane input.
  * `KernelPropertySpec` pins interpreted-vs-codegen equivalence on
  * adversarial strings; SamplingSpec pins the manual-replay constants. */
case class RollingHashExpr(child: Expression, mult: Int, seed: Long, mod: Long)
  extends UnaryExpression {

  require(mult > 0 && seed >= 0 && mod > 1, s"bad rolling-hash params ($mult, $seed, $mod)")
  // every step must stay in 63-bit arithmetic: h < mod, cp ≤ 0x10FFFF
  require(mod - 1 <= (Long.MaxValue - 0x10FFFFL) / mult,
    s"mod·mult would overflow 63-bit arithmetic ($mult, $mod)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash requires string, got ${other.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "rolling_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingHashExpr.compute(input.asInstanceOf[UTF8String], mult, seed, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RollingHashExpr.compute($c, $mult, ${seed}L, ${mod}L);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHashExpr {
  /** One codepoint walk; shared by interpreted eval and codegen.
    * ASCII input (every byte < 0x80: codepoint == byte) walks the
    * UTF8String bytes directly — zero allocation on the hot per-row
    * path; any non-ASCII byte falls back to the decoded-String walk,
    * whose Java UTF-8 decoding (including its malformed-sequence
    * replacement rules) is the bit-identity reference. */
  def compute(s: UTF8String, mult: Int, seed: Long, mod: Long): Long = {
    val n = s.numBytes
    var h = seed % mod
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xFF
      if (b >= 0x80) return computeDecoded(s, mult, seed, mod)
      h = (h * mult + b) % mod
      i += 1
    }
    h
  }

  private def computeDecoded(s: UTF8String, mult: Int, seed: Long, mod: Long): Long = {
    val str = s.toString
    var h = seed % mod
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * mult + cp) % mod
      i += Character.charCount(cp)
    }
    h
  }
}

/** The packed IDENTITY hash [[graft.operators.Sampling.keyHash62]] in one
  * codepoint walk: both seeded recurrences (131 mod 1e9+7 seed 7; 137 mod
  * 998244353 seed 11) advance per codepoint, each is finalized with its
  * avalanche multiplier, and the pair packs as `h1·2³¹ + h2` (< 2⁶¹).
  * Bit-identical to the interpreted fused struct fold it replaces. */
case class KeyHash62Expr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"key_hash62 requires string, got ${other.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "key_hash62"

  override protected def nullSafeEval(input: Any): Any =
    KeyHash62Expr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.KeyHash62Expr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object KeyHash62Expr {
  private val P1 = 1000000007L
  private val P2 = 998244353L

  /** Shared by interpreted eval and codegen. All intermediates fit in
    * 63 bits: h·mult + cp < 1e9·137 + 0x10FFFF; h1·2654435761 < 2.7e18;
    * h2·3266489917 < 3.3e18; the packed value < 2⁶¹. ASCII input walks
    * the UTF8String bytes directly (zero allocation); non-ASCII falls
    * back to the decoded-String walk — see [[RollingHashExpr.compute]]. */
  def compute(s: UTF8String): Long = {
    val n = s.numBytes
    var h1 = 7L
    var h2 = 11L
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xFF
      if (b >= 0x80) return computeDecoded(s)
      h1 = (h1 * 131 + b) % P1
      h2 = (h2 * 137 + b) % P2
      i += 1
    }
    ((h1 * 2654435761L) % P1) * 2147483648L + (h2 * 3266489917L) % P2
  }

  private def computeDecoded(s: UTF8String): Long = {
    val str = s.toString
    var h1 = 7L
    var h2 = 11L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h1 = (h1 * 131 + cp) % P1
      h2 = (h2 * 137 + cp) % P2
      i += Character.charCount(cp)
    }
    ((h1 * 2654435761L) % P1) * 2147483648L + (h2 * 3266489917L) % P2
  }
}

object RollingHash {
  /** Raw seeded rolling hash of `text` (null → null, "" → seed). */
  def apply(text: Column, mult: Int, seed: Long, mod: Long): Column =
    Bridge.column(RollingHashExpr(Bridge.expression(text), mult, seed, mod))

  /** Packed dual identity hash of `text` (null → null) — see
    * [[graft.operators.Sampling.keyHash62]] for the contract. */
  def keyHash62(text: Column): Column =
    Bridge.column(KeyHash62Expr(Bridge.expression(text)))
}
