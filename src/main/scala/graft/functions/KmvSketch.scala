package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded sketch state: the k smallest DISTINCT hashes, stored as a
  * primitive max-heap (`heap(0)` = largest of the kept set = rejection
  * threshold) plus a boxed membership set for dedup. The hot path — once
  * the sketch saturates — is a single primitive compare against
  * `heap(0)`: no allocation, no tree walk. Dedup lookups only run for
  * values that beat the threshold, which is ~k/n of the stream. */
final class KmvBuffer(val k: Int) {
  val heap = new Array[Long](k)
  var size = 0
  private val seen = new java.util.HashSet[java.lang.Long](k * 2)

  def insert(h: Long): Unit = {
    if (size == k && h >= heap(0)) return // saturated fast path
    if (!seen.add(h)) return
    if (size < k) { // grow: sift up
      var i = size
      heap(i) = h
      size += 1
      while (i > 0 && heap((i - 1) / 2) < heap(i)) {
        val p = (i - 1) / 2
        val t = heap(p); heap(p) = heap(i); heap(i) = t
        i = p
      }
    } else { // replace max: sift down
      seen.remove(heap(0))
      heap(0) = h
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1
        val r = 2 * i + 2
        var m = i
        if (l < size && heap(l) > heap(m)) m = l
        if (r < size && heap(r) > heap(m)) m = r
        if (m == i) done = true
        else { val t = heap(m); heap(m) = heap(i); heap(i) = t; i = m }
      }
    }
  }

  /** Max of the kept set (the kth-smallest overall when saturated). */
  def kthMin: Long = heap(0)
}

/** KMV (k-minimum-values) distinct-count sketch as a custom Catalyst typed
  * aggregate — the "novel sketch as a first-class aggregate" extension path
  * (the reference's only aggregates are compiled-in, function_aggr.go; this
  * is how our engine grows new ones). Estimator per Bar-Yossef et al.,
  * "Counting distinct elements in a data stream" (RANDOM 2002): keep the k
  * smallest 64-bit hashes; if fewer than k seen, the count is exact;
  * otherwise estimate (k-1) / kth-min-normalized.
  *
  * The state is a bounded primitive heap (≤ k longs), so partial
  * aggregation is map-side and merges are associative — shuffle traffic is
  * O(k) per group regardless of input size.
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 512, // relative stddev ≈ 1/sqrt(k-2) ≈ 4.4%
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct supports string/int/bigint, got $t")
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  private def hash(v: Any): Long = v match {
    case s: UTF8String => VectorOps.fnv64(s, 0x4b4dL)
    case l: java.lang.Long => mix(l)
    case i: java.lang.Integer => mix(i.toLong)
  }

  private def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  override def update(buf: KmvBuffer,
      input: org.apache.spark.sql.catalyst.InternalRow): KmvBuffer = {
    val v = child.eval(input)
    // use [0, 2^63) so normalization is simple
    if (v != null) buf.insert(hash(v) & Long.MaxValue)
    buf
  }

  override def merge(buf: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    var i = 0
    while (i < other.size) { buf.insert(other.heap(i)); i += 1 }
    buf
  }

  override def eval(buf: KmvBuffer): Any =
    if (buf.size < k) buf.size.toLong
    else {
      val kth = buf.kthMin.toDouble / Long.MaxValue.toDouble
      math.round((k - 1) / kth)
    }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.heap(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new KmvBuffer(k)
    var i = 0
    while (i < n) { buf.insert(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}
