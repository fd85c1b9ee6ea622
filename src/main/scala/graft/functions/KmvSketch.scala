package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** KMV (k-minimum-values) distinct-count sketch as a custom Catalyst typed
  * aggregate — the "novel sketch as a first-class aggregate" extension path
  * (the reference's only aggregates are compiled-in, function_aggr.go; this
  * is how our engine grows new ones). Estimator per Bar-Yossef et al.,
  * "Counting distinct elements in a data stream" (RANDOM 2002): keep the k
  * smallest 64-bit hashes; if fewer than k seen, the count is exact;
  * otherwise estimate (k-1) / kth-min-normalized.
  *
  * The state is a bounded sorted buffer (≤ k longs), so partial aggregation
  * is map-side and merges are associative — shuffle traffic is O(k) per
  * group regardless of input size.
  */
case class KmvDistinct(
    child: Expression,
    k: Int = 512, // relative stddev ≈ 1/sqrt(k-2) ≈ 4.4%
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "kmv_distinct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct supports string/int/bigint, got $t")
  }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

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

  private def insert(buf: java.util.TreeSet[java.lang.Long], h0: Long): Unit = {
    val h = h0 & Long.MaxValue // use [0, 2^63) so normalization is simple
    buf.add(h)
    if (buf.size > k) buf.pollLast()
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: org.apache.spark.sql.catalyst.InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buf, hash(v))
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else {
      val kth = buf.last().toDouble / Long.MaxValue.toDouble
      math.round((k - 1) / kth)
    }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 8)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}
