package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Codegen'd signature kernels for dedup: MinHash and SimHash over a
  * pre-hashed token array (`array<long>`, one `xxhash64` per token done
  * upstream in a single cheap `transform`).
  *
  * Why a custom expression: the pure-HOF formulation re-evaluates the
  * shared shingle/base-hash subtree once per derived hash (interpreted
  * higher-order functions get no common-subexpression elimination), which
  * measured ~90 s for 500 docs. Here the whole signature is one primitive
  * loop per row: O(tokens · numHashes) long arithmetic, no allocation
  * besides the output array.
  */
object HashSig {
  private val P = 2147483647L // 2^31 - 1

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Affine-family coefficients (a_s, b_s), deterministic. */
  def coeffs(numHashes: Int): (Array[Long], Array[Long]) = {
    val as = Array.tabulate(numHashes)(s => java.lang.Math.floorMod(mix64(2L * s), P - 1) + 1)
    val bs = Array.tabulate(numHashes)(s => java.lang.Math.floorMod(mix64(2L * s + 1), P))
    (as, bs)
  }

  /** MinHash signature of the word-`n`-gram shingle multiset implied by
    * the token-hash array. Shingle hash = polynomial combine of `n`
    * consecutive token hashes (min over a multiset equals min over the
    * set, so no dedup pass is needed). */
  def minhash(tokenHashes: Column, n: Int, numHashes: Int): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(tokenHashes), n, numHashes, 0))

  /** LSH band keys derived from the MinHash signature, computed in the
    * same kernel pass. Computing bands OUTSIDE the kernel (slicing a sig
    * column) re-inlines the signature expression into every band under
    * `CollapseProject` — a numBands× recompute measured at ~20 s for 500
    * docs. Output: `array<long>` of length numBands, ready for
    * `posexplode`. */
  def minhashBands(tokenHashes: Column, n: Int, numHashes: Int, numBands: Int): Column =
    Bridge.column(MinHashSigExpr(Bridge.expression(tokenHashes), n, numHashes, numBands))

  /** 64-bit SimHash of the token-hash bag. */
  def simhash(tokenHashes: Column): Column =
    Bridge.column(SimHashExpr(Bridge.expression(tokenHashes)))

  /** 60-bit portable SimHash over a token-STRING array — every step is
    * replayable by a vanilla SQL engine (char-level rolling hash +
    * affine bit hashes, all arithmetic within 63 bits), so cross-engine
    * oracles can recompute the exact signature. */
  def simhashPortable(tokens: Column): Column =
    Bridge.column(SimHashPortableExpr(Bridge.expression(tokens)))

  /** Distinct word-`n`-gram shingle hashes (the set MinHash approximates) —
    * the compact representation for exact Jaccard verification. */
  def shingleHashes(tokenHashes: Column, n: Int): Column =
    Bridge.column(ShingleHashesExpr(Bridge.expression(tokenHashes), n))

  /** Signed-random-hyperplane signature (≤64 bits packed into a Long)
    * over an `array<float|double>` vector column. */
  def hyperplaneSig(vec: Column, planes: Array[Array[Double]]): Column =
    Bridge.column(HyperplaneSigExpr(Bridge.expression(vec), planes))
}

/** bit b = sign(v · planes(b)), packed to a Long. */
case class HyperplaneSigExpr(child: Expression, planes: Array[Array[Double]])
  extends UnaryExpression {

  require(planes.length <= 64, "signature is packed into a Long")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sig requires array<float|double>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val fl = isFloat
    val vec = Array.tabulate(v.numElements())(i =>
      if (fl) v.getFloat(i).toDouble else v.getDouble(i))
    HyperplaneSigExpr.sig(vec, planes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("hpPlanes", planes, "double[][]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    // fresh names: two instances of this expression in one generated
    // method would otherwise redeclare `vec`/`i` (janino rejects it and
    // the whole projection falls back to the interpreted path)
    val vec = ctx.freshName("vec")
    val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, c =>
      s"""double[] $vec = new double[$c.numElements()];
         |for (int $i = 0; $i < $vec.length; $i++) $vec[$i] = (double) $c.$getter($i);
         |${ev.value} = graft.functions.HyperplaneSigExpr.sig($vec, $pRef);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSigExpr {
  def sig(vec: Array[Double], planes: Array[Array[Double]]): Long = {
    var out = 0L
    var b = 0
    while (b < planes.length) {
      val p = planes(b)
      var d = 0.0
      var i = 0
      val n = math.min(vec.length, p.length)
      while (i < n) { d += vec(i) * p(i); i += 1 }
      if (d > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

trait TokenHashInput { self: UnaryExpression =>
  def checkTokenInput(child: Expression, name: String): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name requires array<bigint> token hashes, got ${other.sql}")
    }
}

/** MinHash signature kernel; with `numBands > 0` the output is the
  * per-band LSH keys instead of the raw signature. */
case class MinHashSigExpr(child: Expression, n: Int, numHashes: Int, numBands: Int)
  extends UnaryExpression with TokenHashInput {

  require(n >= 1 && numHashes >= 1)
  require(numBands == 0 || numHashes % numBands == 0,
    s"numBands=$numBands must divide numHashes=$numHashes")

  override def checkInputDataTypes(): TypeCheckResult = checkTokenInput(child, "minhash_sig")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = if (numBands > 0) "minhash_bands" else "minhash_sig"

  @transient private lazy val (as, bs) = HashSig.coeffs(numHashes)

  override protected def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val out = MinHashSigExpr.compute(th.toLongArray(), n, numHashes, numBands, as, bs)
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    // fresh name: a second instance in the same generated method would
    // redeclare it (janino error → interpreted fallback)
    val out = ctx.freshName("out")
    nullSafeCodeGen(ctx, ev, c => {
      s"""long[] $out = graft.functions.MinHashSigExpr.compute(
         |  $c.toLongArray(), $n, $numHashes, $numBands, $aRef, $bRef);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSigExpr {
  private val P = 2147483647L
  private val C = 1000003L

  private def mixFinal(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Shared by interpreted eval and generated code. */
  def compute(tokenHashes: Array[Long], n: Int, numHashes: Int, numBands: Int,
              as: Array[Long], bs: Array[Long]): Array[Long] = {
    val nt = tokenHashes.length
    val nsh = if (nt <= n) 1 else nt - n + 1
    val win = math.min(n, nt)
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < nsh) {
      // polynomial combine of the window, folded into [0, P)
      var h = 1125899906842597L
      var j = 0
      while (j < win) {
        h = h * C + tokenHashes(i + j)
        j += 1
      }
      val hp = java.lang.Math.floorMod(h, P)
      var s = 0
      while (s < numHashes) {
        val v = java.lang.Math.floorMod(as(s) * hp + bs(s), P)
        if (v < sig(s)) sig(s) = v
        s += 1
      }
      i += 1
    }
    if (numBands == 0) sig
    else {
      val rpb = numHashes / numBands
      val keys = new Array[Long](numBands)
      var b = 0
      while (b < numBands) {
        var k = 1125899906842597L
        var j = 0
        while (j < rpb) {
          k = k * C + sig(b * rpb + j)
          j += 1
        }
        keys(b) = mixFinal(k)
        b += 1
      }
      keys
    }
  }
}

/** Distinct polynomial window hashes of `n` consecutive token hashes —
  * same combine as [[MinHashSigExpr]], deduplicated, insertion order. */
case class ShingleHashesExpr(child: Expression, n: Int)
  extends UnaryExpression with TokenHashInput {

  require(n >= 1)

  override def checkInputDataTypes(): TypeCheckResult = checkTokenInput(child, "shingle_hashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ShingleHashesExpr.compute(input.asInstanceOf[ArrayData].toLongArray(), n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleHashesExpr.compute($c.toLongArray(), $n));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashesExpr {
  private val C = 1000003L

  def compute(tokenHashes: Array[Long], n: Int): Array[Long] = {
    val nt = tokenHashes.length
    val nsh = if (nt <= n) 1 else nt - n + 1
    val win = math.min(n, nt)
    val seen = new java.util.LinkedHashSet[java.lang.Long](nsh * 2)
    var i = 0
    while (i < nsh) {
      var h = 1125899906842597L
      var j = 0
      while (j < win) {
        h = h * C + tokenHashes(i + j)
        j += 1
      }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    out
  }
}

/** 60-bit SimHash whose every arithmetic step has an exact twin in
  * plain ANSI-ish SQL (no 64-bit wraparound, no engine-specific hash):
  *
  *  - token base hash `r` = seeded char rolling hash
  *    `h := (h·131 + codepoint) mod (10^9+7)`, seed 7 — the same
  *    primitive the rolling document fingerprint uses;
  *  - bit `i` vote = `+1` if `(a_i·r + b_i) mod p > p/2` else `-1`,
  *    with `a_i = (2654435761·(i+1)) mod p`,
  *    `b_i = (40503·(i+1) + 2531011) mod p` — products stay under
  *    2^63, so any BIGINT engine replays them losslessly;
  *  - bit `i` of the signature = (Σ votes > 0). 60 bits keep the
  *    packed signature non-negative in a signed 64-bit integer.
  */
case class SimHashPortableExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_portable requires array<string> tokens, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_portable"

  override protected def nullSafeEval(input: Any): Any =
    SimHashPortableExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashPortableExpr.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashPortableExpr {
  val P = 1000000007L
  val Bits = 60
  private val as = Array.tabulate(Bits)(i => (2654435761L * (i + 1)) % P)
  private val bs = Array.tabulate(Bits)(i => (40503L * (i + 1) + 2531011L) % P)

  /** Seeded codepoint rolling hash, identical to the document
    * fingerprint primitive (empty token folds to the bare seed). */
  def tokenHash(s: String): Long = {
    var h = 7L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 131 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  def compute(tokens: ArrayData): Long = {
    val votes = new Array[Int](Bits)
    val n = tokens.numElements()
    val half = P / 2 // 500000003; votes split on v > half
    var t = 0
    while (t < n) {
      val r = tokenHash(tokens.getUTF8String(t).toString)
      var i = 0
      while (i < Bits) {
        if ((as(i) * r + bs(i)) % P > half) votes(i) += 1 else votes(i) -= 1
        i += 1
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < Bits) {
      if (votes(i) > 0) out |= (1L << i)
      i += 1
    }
    out
  }
}

case class SimHashExpr(child: Expression)
  extends UnaryExpression with TokenHashInput {

  override def checkInputDataTypes(): TypeCheckResult = checkTokenInput(child, "simhash")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimHashExpr.compute(input.asInstanceOf[ArrayData].toLongArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashExpr.compute($c.toLongArray());")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashExpr {
  def compute(tokenHashes: Array[Long]): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < tokenHashes.length) {
      val h = tokenHashes(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
