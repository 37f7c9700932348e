package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bounded max-heap of the k smallest (distance, id) pairs, ordered
  * lexicographically so ties on distance break on id — the same total
  * order as `row_number() OVER (ORDER BY distance, id)`. Root is the
  * worst kept pair; an incoming pair replaces it iff strictly better. */
final class TopKHeap(val k: Int) {
  val dists = new Array[Double](math.max(k, 1))
  val ids = new Array[Long](math.max(k, 1))
  var n = 0

  @inline private def worse(d1: Double, i1: Long, d2: Double, i2: Long): Boolean =
    d1 > d2 || (d1 == d2 && i1 > i2)

  def add(d: Double, id: Long): Unit = {
    if (n < k) {
      dists(n) = d; ids(n) = id; n += 1
      var i = n - 1
      while (i > 0) { // sift up
        val p = (i - 1) / 2
        if (worse(dists(i), ids(i), dists(p), ids(p))) { swap(i, p); i = p }
        else return
      }
    } else if (k > 0 && worse(dists(0), ids(0), d, id)) {
      dists(0) = d; ids(0) = id
      var i = 0
      while (true) { // sift down
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < n && worse(dists(l), ids(l), dists(m), ids(m))) m = l
        if (r < n && worse(dists(r), ids(r), dists(m), ids(m))) m = r
        if (m == i) return
        swap(i, m); i = m
      }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val d = dists(a); dists(a) = dists(b); dists(b) = d
    val i = ids(a); ids(a) = ids(b); ids(b) = i
  }

  def mergeFrom(o: TopKHeap): TopKHeap = {
    var i = 0
    while (i < o.n) { add(o.dists(i), o.ids(i)); i += 1 }
    this
  }

  /** Kept pairs in ascending (distance, id) order. */
  def sortedPairs: Array[(Double, Long)] =
    Array.tabulate(n)(i => (dists(i), ids(i)))
      .sortBy(p => (p._1, p._2))
}

/** Per-group bounded top-k as a [[TypedImperativeAggregate]] — the
  * scale-safe replacement for `row_number() OVER (PARTITION BY qid)`:
  * the window form shuffles EVERY scored row onto one partition per
  * query id (a straggler factory for small query batches over a large
  * corpus), while this aggregate keeps ≤k pairs per (partition, qid) on
  * the map side and shuffles only those — O(partitions·Q·k) rows through
  * the exchange regardless of corpus size. Same total order as the
  * window (distance, then id), so results are bit-identical.
  *
  * Output: `array<struct<distance double, id bigint>>` sorted ascending;
  * explode + `pos+1` reconstructs the rank column.
  */
case class BoundedTopK(left: Expression, right: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKHeap] with BinaryLike[Expression] {

  require(k > 0, s"k must be positive, got $k")

  // children must already be double/long — every entry point
  // (BoundedTopK.topk, the SQL builder) casts; update() trusts the types
  override def checkInputDataTypes():
  org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == DoubleType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bounded_topk expects (double, bigint), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override def prettyName: String = "bounded_topk"
  override def nullable: Boolean = false
  override def dataType: DataType = BoundedTopK.OutType

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(buf: TopKHeap, input: InternalRow): TopKHeap = {
    val d = left.eval(input)
    val id = right.eval(input)
    // null distance = malformed input; excluded, matching asc_nulls_last
    // + limit semantics when k ≤ the count of well-formed rows
    if (d != null && id != null)
      buf.add(d.asInstanceOf[Double], id.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKHeap, other: TopKHeap): TopKHeap = buf.mergeFrom(other)

  override def eval(buf: TopKHeap): Any =
    new GenericArrayData(buf.sortedPairs.map { case (d, id) =>
      InternalRow(d, id)
    }.asInstanceOf[Array[Any]])

  override def serialize(buf: TopKHeap): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + buf.n * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k); out.writeInt(buf.n)
    var i = 0
    while (i < buf.n) { out.writeDouble(buf.dists(i)); out.writeLong(buf.ids(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val in = ByteBuffer.wrap(bytes)
    val heap = new TopKHeap(in.getInt)
    val n = in.getInt
    var i = 0
    while (i < n) { heap.add(in.getDouble, in.getLong); i += 1 }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                newRight: Expression): BoundedTopK =
    copy(left = newLeft, right = newRight)
}

object BoundedTopK {
  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("distance", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  /** `bounded_topk(dist, id, k)` aggregate column. */
  def topk(dist: Column, id: Column, k: Int): Column =
    Bridge.column(BoundedTopK(
      Bridge.expression(dist.cast("double")),
      Bridge.expression(id.cast("long")), k).toAggregateExpression())
}
