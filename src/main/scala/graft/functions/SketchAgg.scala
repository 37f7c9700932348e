package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable bounded-memory sketches as [[TypedImperativeAggregate]]s —
  * the cardinality/frequency summaries a 100 TB profiling pass needs
  * where exact `count(DISTINCT …)` / `groupBy.count` would shuffle one
  * row per distinct key:
  *
  *  - [[KmvDistinct]]: K-minimum-values distinct-count estimator over a
  *    deterministic portable hash. O(K) state per group, one partial
  *    aggregation pass — the exchange carries ≤K longs per
  *    (partition, group) no matter how many distinct keys exist.
  *    Deterministic given the hash, so small-scale runs are exactly
  *    replayable by any engine that can compute the same hash (the
  *    DuckDB oracle does; HyperLogLog implementations never line up
  *    across engines, which is why this sketch and not HLL is the
  *    hash-gate form).
  *  - [[HeavyHitters]]: Misra–Gries top-key summary with capacity m:
  *    at most m counters per buffer, merged by counter addition then
  *    reduction by the (m+1)-th largest count (Agarwal et al.,
  *    "Mergeable Summaries", PODS'12). Guarantees
  *    `true − err ≤ est ≤ true` per surviving key with
  *    `err ≤ N/(m+1)`; when m ≥ #distinct keys no decrement ever
  *    fires and the summary IS the exact group-by count (the
  *    correctness row pins that regime; specs cover the lossy one).
  *
  * The reference has no sketch surface (its profiling is exact scans);
  * these are the beyond-reference scale path for corpus profiling.
  */
final class KmvBuffer(val k: Int) {
  /** The k smallest DISTINCT hash values seen so far. */
  val mins = new java.util.TreeSet[java.lang.Long]()

  def add(h: Long): Unit =
    if (mins.size < k) { mins.add(h); () }
    else if (h < mins.last && mins.add(h)) { mins.pollLast(); () }

  def mergeFrom(o: KmvBuffer): KmvBuffer = {
    val it = o.mins.iterator()
    while (it.hasNext) add(it.next())
    this
  }

  /** (k−1)/kth-min-normalized estimate; exact count while fewer than k
    * distinct hashes were seen. `hashRange` is the exclusive upper bound
    * of the hash domain. */
  def estimate(hashRange: Double): Double =
    if (mins.size < k) mins.size.toDouble
    else (k - 1).toDouble * hashRange / mins.last.toDouble
}

/** `kmv_distinct(hash, k)`: distinct-count estimate from the k minimum
  * values of an ALREADY-HASHED LongType child (hash portability lives
  * with the caller — [[graft.operators.Sampling.keyHash]] is the
  * engine-standard choice and the one the DuckDB oracle replays).
  * Returns DOUBLE: exact below k distinct, `(k−1)·range/kthMin` at or
  * above. Nulls are skipped (a null key hashes before this aggregate;
  * an actually-null hash means the caller excluded the row). */
case class KmvDistinct(child: Expression, k: Int, hashRange: Double,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k > 1, s"k must be > 1, got $k")
  require(hashRange > 0, s"hashRange must be positive, got $hashRange")

  override def checkInputDataTypes():
  org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct expects a bigint hash child, got ${child.dataType.sql}")

  override def prettyName: String = "kmv_distinct"
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = child.eval(input)
    if (h != null) buf.add(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer =
    buf.mergeFrom(other)

  override def eval(buf: KmvBuffer): Any = buf.estimate(hashRange)

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.mins.size * 8)
    bb.putInt(buf.k); bb.putInt(buf.mins.size)
    val it = buf.mins.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvDistinct =
    copy(child = newChild)
}

object KmvDistinct {
  /** Exclusive upper bound of [[graft.operators.Sampling.keyHash]]'s
    * range (values are `mod 1e9+7`). */
  val KeyHashRange: Double = 1000000007.0

  /** `kmv_distinct(hashCol, k)` over the engine-standard key hash range. */
  def kmv(hash: Column, k: Int): Column =
    Bridge.column(KmvDistinct(Bridge.expression(hash.cast("long")), k,
      KeyHashRange).toAggregateExpression())
}

/** `kmv_mins(hash, k)`: the raw k-minimum-values SET (sorted
  * `array<long>`) instead of the scalar estimate — the exportable form
  * of the sketch, enabling SET ALGEBRA over groups after aggregation
  * (see [[ThetaSketch]]): union/intersection cardinality estimates
  * between any two groups from |groups| bounded arrays, no join over
  * the raw keys. */
case class KmvMins(child: Expression, k: Int,
                   mutableAggBufferOffset: Int = 0,
                   inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] with UnaryLike[Expression] {

  require(k > 1, s"k must be > 1, got $k")

  override def checkInputDataTypes():
  org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kmv_mins expects a bigint hash child, got ${child.dataType.sql}")

  override def prettyName: String = "kmv_mins"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = child.eval(input)
    if (h != null) buf.add(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer =
    buf.mergeFrom(other)

  override def eval(buf: KmvBuffer): Any = {
    val arr = new Array[Any](buf.mins.size)
    val it = buf.mins.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(arr) // TreeSet iterates ascending
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.mins.size * 8)
    bb.putInt(buf.k); bb.putInt(buf.mins.size)
    val it = buf.mins.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMins =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMins =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvMins =
    copy(child = newChild)
}

object KmvMins {
  /** `kmv_mins(hashCol, k)` aggregate column. */
  def mins(hash: Column, k: Int): Column =
    Bridge.column(KmvMins(Bridge.expression(hash.cast("long")), k)
      .toAggregateExpression())
}

/** Theta-sketch set algebra over exported KMV min-sets: distinct-count
  * estimates for unions and intersections of any two groups WITHOUT
  * joining the raw keys — the audience-overlap primitive at 10⁹ users.
  * Both groups exact (fewer than k mins on each side) → exact set
  * arithmetic; otherwise the standard KMV union estimator over the
  * combined k smallest, with the intersection scaled by the matching
  * fraction J/k. Fully deterministic — the DuckDB oracle replays the
  * identical arithmetic. */
object ThetaSketch {

  /** (estimatedUnion, estimatedIntersection) of two sorted min-sets
    * exported by [[KmvMins]] with the same k and `hashRange`. */
  def unionIntersect(a: Array[Long], b: Array[Long], k: Int,
                     hashRange: Double): (Double, Double) = {
    val sa = a.toSet
    val sb = b.toSet
    val all = (sa ++ sb).toArray.sorted
    if (a.length < k && b.length < k) {
      // both sides hold their COMPLETE distinct-hash sets
      (all.length.toDouble, sa.intersect(sb).size.toDouble)
    } else {
      val u = all.take(k)
      val theta = u.last.toDouble
      val estUnion = (k - 1).toDouble * hashRange / theta
      val j = u.count(h => sa.contains(h) && sb.contains(h))
      (estUnion, j.toDouble / k * estUnion)
    }
  }
}

final class MGBuffer(val m: Int) {
  /** key → lower-bound counter (Misra–Gries invariant: ≤ m entries).
    * Values are BOXED Long on purpose: with a primitive value type,
    * `get` on an absent key silently unboxes null to 0L and the
    * null-miss check can never fire — `add` would then insert every
    * unseen key past capacity and the O(m) state bound would quietly
    * become O(distinct) per partition-group. */
  val counts = new java.util.HashMap[String, java.lang.Long]()
  /** Total decrement depth: every surviving key's true count is within
    * [counter, counter + err]. */
  var err: Long = 0L

  def add(key: String): Unit = {
    val cur = counts.get(key)
    if (cur != null) { counts.put(key, cur + 1L); () }
    else if (counts.size < m) { counts.put(key, 1L); () }
    else {
      // full and unseen: decrement every counter (the classic MG step),
      // dropping zeros — this admits at most N/(m+1) total decrements
      err += 1L
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  def mergeFrom(o: MGBuffer): MGBuffer = {
    o.counts.forEach { (k, v) =>
      val cur = counts.get(k)
      counts.put(k, if (cur == null) v else java.lang.Long.valueOf(cur + v))
    }
    err += o.err
    if (counts.size > m) {
      // mergeable-summaries reduction: subtract the (m+1)-th largest
      // counter from all, drop non-positive — the error bound adds the
      // subtracted value
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val sub = vals(vals.length - m - 1) // (m+1)-th largest
      err += sub
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= sub) it.remove() else e.setValue(e.getValue - sub)
      }
    }
    this
  }

  /** Surviving keys by (count desc, key asc). */
  def sorted: Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
    arr.sortBy { case (key, c) => (-c, key) }
  }
}

/** `heavy_hitters(key, m)`: Misra–Gries frequent-keys summary, capacity
  * m. Output `array<struct<key string, count bigint, err bigint>>`
  * sorted by (count desc, key asc): `count` is the guaranteed lower
  * bound, `count + err` the upper bound. Exact (err 0) whenever the
  * group has ≤ m distinct keys. Null keys are skipped. */
case class HeavyHitters(child: Expression, m: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] with UnaryLike[Expression] {

  require(m > 0, s"capacity must be positive, got $m")

  override def checkInputDataTypes():
  org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters expects a string key child, got ${child.dataType.sql}")

  override def prettyName: String = "heavy_hitters"
  override def nullable: Boolean = false
  override def dataType: DataType = HeavyHitters.OutType

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(m)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val key = child.eval(input)
    if (key != null) buf.add(key.toString)
    buf
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer =
    buf.mergeFrom(other)

  override def eval(buf: MGBuffer): Any =
    new GenericArrayData(buf.sorted.map { case (key, c) =>
      InternalRow(UTF8String.fromString(key), c, buf.err)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + buf.counts.size * 24)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.m); out.writeLong(buf.err); out.writeInt(buf.counts.size)
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey); out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new MGBuffer(in.readInt())
    buf.err = in.readLong()
    val n = in.readInt()
    var i = 0
    while (i < n) { buf.counts.put(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
}

object HeavyHitters {
  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("key", StringType, nullable = false),
    StructField("count", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  /** `heavy_hitters(key, m)` aggregate column. */
  def hitters(key: Column, m: Int): Column =
    Bridge.column(HeavyHitters(Bridge.expression(key.cast("string")), m)
      .toAggregateExpression())
}

/** Bottom-k-by-hash uniform row sample carrying VALUES — the
  * quantile-sketch member of the trio (KMV = distinct, Misra–Gries =
  * frequency, this = quantiles). Keeps the (value of the) k rows whose
  * row-key hash is smallest: a uniform sample whose membership is a
  * pure function of the key set (bottom-k / coordinated sampling,
  * Cohen & Kaplan VLDB'08), so merges are order-INDEPENDENT and the
  * result is deterministic under any partitioning — unlike reservoir
  * sampling, whose merge depends on arrival order, and unlike GK/KLL,
  * whose compactions are merge-order-sensitive. That determinism is
  * what lets the DuckDB oracle replay the sketch bit-for-bit (the same
  * reason the distinct sketch is KMV and not HLL). Rank error of a
  * p-quantile from a k-sample is O(√(p(1−p)/k)) with high probability;
  * state is O(k) per group and the exchange carries ≤k (hash, value)
  * pairs per (partition, group).
  *
  * Semantics: per distinct hash the MINIMUM value is kept (an
  * order-independent collision rule; with a 10⁹-range row-key hash,
  * collisions at the test scales are the same rows both engines see).
  * Below k distinct hashes the sample IS the whole group, so sample
  * quantiles are exact.
  */
final class BkBuffer(val k: Int) {
  /** hash → min value among rows with that hash; ≤ k smallest hashes. */
  val m = new java.util.TreeMap[java.lang.Long, java.lang.Double]()

  def add(h: Long, v: Double): Unit = {
    val cur = m.get(h)
    if (cur != null) { if (v < cur) { m.put(h, v); () } }
    else if (m.size < k) { m.put(h, v); () }
    else if (h < m.lastKey) { m.put(h, v); m.pollLastEntry(); () }
  }

  def mergeFrom(o: BkBuffer): BkBuffer = {
    val it = o.m.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); add(e.getKey, e.getValue) }
    this
  }
}

/** `bottomk_sample(hash, value, k)`: the sampled values, sorted
  * ascending (`array<double>`) — quantiles index into it via
  * [[BottomKSample.quantileAt]]. Null hashes/values are skipped. */
case class BottomKSample(left: Expression, right: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BkBuffer]
  with org.apache.spark.sql.catalyst.trees.BinaryLike[Expression] {

  require(k > 1, s"k must be > 1, got $k")

  override def checkInputDataTypes():
  org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == LongType && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bottomk_sample expects (bigint hash, double value), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def prettyName: String = "bottomk_sample"
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): BkBuffer = new BkBuffer(k)

  override def update(buf: BkBuffer, input: InternalRow): BkBuffer = {
    val h = left.eval(input)
    val v = right.eval(input)
    if (h != null && v != null)
      buf.add(h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: BkBuffer, other: BkBuffer): BkBuffer =
    buf.mergeFrom(other)

  override def eval(buf: BkBuffer): Any = {
    val vs = new Array[Double](buf.m.size)
    val it = buf.m.values().iterator()
    var i = 0
    while (it.hasNext) { vs(i) = it.next(); i += 1 }
    java.util.Arrays.sort(vs)
    new GenericArrayData(vs.map(v => v: Any))
  }

  override def serialize(buf: BkBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buf.m.size * 16)
    bb.putInt(buf.k); bb.putInt(buf.m.size)
    val it = buf.m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); bb.putLong(e.getKey); bb.putDouble(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): BkBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new BkBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getDouble); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKSample =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKSample =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BottomKSample =
    copy(left = newLeft, right = newRight)
}

object BottomKSample {
  /** `bottomk_sample(hashCol, valueCol, k)` aggregate column. */
  def sample(hash: Column, value: Column, k: Int): Column =
    Bridge.column(BottomKSample(Bridge.expression(hash.cast("long")),
      Bridge.expression(value.cast("double")), k).toAggregateExpression())

  /** Type-1 (lower) sample quantile: element `ceil(p·n)` (1-based) of
    * the sorted sample — integer indexing, no interpolation, so any
    * engine replays it exactly. */
  def quantileAt(sortedSample: Column, p: Double): Column = {
    import org.apache.spark.sql.functions._
    element_at(sortedSample,
      greatest(lit(1), ceil(lit(p) * size(sortedSample)).cast("int")))
  }
}
