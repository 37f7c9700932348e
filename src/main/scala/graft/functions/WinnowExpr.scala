package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
  * MOSS algorithm) in one pass per row — the kernel behind
  * [[graft.operators.Winnow]].
  *
  * Algorithm: hash every `k`-gram of the (pre-normalized) text with the
  * library's portable seed-7 `h·131 + c mod 1e9+7` rolling hash, then
  * slide a window of `w` consecutive gram hashes and select each
  * window's minimum (ties broken by the LEFTMOST position — encoded by
  * taking the min of `hash·2^33 + pos`, so the comparison is a single
  * long compare). The selected set is the fingerprint: winnowing
  * guarantees every shared substring of length ≥ `w + k - 1` between
  * two documents yields at least one shared fingerprint hash, and
  * selects ~2/(w+1) of all grams — a tunable density with a matching
  * guarantee, which plain "every i-th gram" sampling lacks.
  *
  * Why a custom expression: like [[CdcBoundsExpr]], the declarative
  * `substr`-per-gram form is O(chars²) on UTF8String (each substr
  * re-seeks from byte 0); this kernel decodes codepoints once and is
  * O(chars · k) with a monotonic-deque window min (selected positions
  * are non-decreasing, so de-dup is a single last-emitted compare).
  * The whole fingerprint computation is per-row — the operator runs as
  * a zero-shuffle scan.
  *
  * Output: `array<long>` of `hash·2^33 + pos` (0-based gram position),
  * in position order, consecutive duplicate selections removed. Safe in
  * ANSI mode: hash < 2^30 so the pack stays under 2^63; positions up to
  * 2^33 (an 8 GiB document) fit the low field. Texts shorter than `k`
  * codepoints yield an empty array (no grams); texts with fewer than
  * `w` grams yield the single minimum of all grams (one window).
  *
  * Trailing partial windows are NOT windows: starts run 0..G-w only
  * (else the last gram would always be selected as the min of its own
  * singleton window, breaking the density guarantee).
  */
case class WinnowExpr(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow requires string, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow"

  override protected def nullSafeEval(input: Any): Any =
    WinnowExpr.compute(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WinnowExpr.compute($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowExpr {
  private val P = 1000000007L
  /** 2^33: the position field width of a packed fingerprint. */
  val PosBase = 8589934592L

  /** One-pass winnowing; shared by interpreted eval and codegen. */
  def compute(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val cps = new Array[Int](n)
    var ci = 0
    var off = 0
    while (off < str.length) {
      val cp = str.codePointAt(off)
      cps(ci) = cp
      ci += 1
      off += Character.charCount(cp)
    }
    val g = n - k + 1 // gram count
    val packed = new Array[Long](g)
    var p = 0
    while (p < g) {
      var h = 7L
      var j = p
      while (j < p + k) { h = (h * 131L + cps(j)) % P; j += 1 }
      packed(p) = h * PosBase + p
      p += 1
    }
    // sliding-window min over `packed`, window w, starts 0..max(g-w, 0);
    // monotonic deque of indices with increasing packed values
    val lastStart = math.max(g - w, 0)
    val deque = new Array[Int](g)
    var head = 0
    var tail = 0 // exclusive
    val out = new java.util.ArrayList[java.lang.Long](2 * g / (w + 1) + 4)
    var lastEmitted = -1
    var i = 0
    while (i < math.min(w, g)) { // prime the first window
      while (tail > head && packed(deque(tail - 1)) > packed(i)) tail -= 1
      deque(tail) = i; tail += 1
      i += 1
    }
    var start = 0
    while (start <= lastStart) {
      val sel = deque(head)
      if (sel != lastEmitted) { out.add(packed(sel)); lastEmitted = sel }
      // advance: drop the start gram, admit gram start+w
      if (deque(head) == start) head += 1
      val incoming = start + w
      if (incoming < g) {
        while (tail > head && packed(deque(tail - 1)) > packed(incoming)) tail -= 1
        deque(tail) = incoming; tail += 1
      }
      start += 1
    }
    val arr = new Array[Long](out.size)
    var z = 0
    while (z < arr.length) { arr(z) = out.get(z); z += 1 }
    new GenericArrayData(arr)
  }
}

object WinnowFingerprints {
  /** Packed winnowing fingerprints of `text` as an `array<long>`
    * column (null-safe). `k` = gram length, `w` = window size. */
  def apply(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowExpr(Bridge.expression(text), k, w))
}
