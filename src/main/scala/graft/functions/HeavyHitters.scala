package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters state: at most k (item, count) slots. Insert
  * decrements every slot when full and the item is absent — the classic
  * "cancel k distinct items" step — so any item with true frequency
  * > n/(k+1) is guaranteed a slot, and a kept count underestimates the
  * true one by at most n/(k+1) (Misra & Gries 1982; merge rule per
  * Agarwal et al., "Mergeable summaries", PODS 2012: add counts, then
  * subtract the (k+1)-th largest and drop non-positives). */
final class MgBuffer(val k: Int) {
  val counts = new java.util.HashMap[String, Long](k * 2)
  var processed = 0L

  def insert(item: String, weight: Long = 1L): Unit = {
    processed += weight
    val cur = counts.get(item)
    if (cur != 0L || counts.containsKey(item)) {
      counts.put(item, cur + weight)
    } else if (counts.size < k) {
      counts.put(item, weight)
    } else {
      // decrement all; drop zeros. Weighted: subtract the min of (weight,
      // current minimum) repeatedly is O(k^2) worst case — subtract the
      // full weight bounded below at zero keeps the MG error guarantee
      // (each unit of subtraction cancels across k+1 distinct items).
      val dec = weight
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val left = e.getValue - dec
        if (left > 0) e.setValue(left) else it.remove()
      }
    }
  }

  def mergeFrom(other: MgBuffer): Unit = {
    processed += other.processed
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      counts.put(e.getKey, cur + e.getValue)
    }
    if (counts.size > k) {
      // subtract the (k+1)-th largest count from everyone, drop <= 0
      val vals = counts.values().toArray(new Array[java.lang.Long](0))
      java.util.Arrays.sort(vals, java.util.Collections.reverseOrder())
      val cut = vals(k).longValue()
      val it2 = counts.entrySet().iterator()
      while (it2.hasNext) {
        val e = it2.next()
        val left = e.getValue - cut
        if (left > 0) e.setValue(left) else it2.remove()
      }
    }
  }
}

/** heavy_hitters(item, k) → array<struct<item:string, min_count:bigint>>,
  * sorted by residual count desc then item. A custom mergeable Catalyst
  * aggregate (same extension path as [[KmvDistinct]]): state is ≤ k slots,
  * partial aggregation stays map-side, shuffle is O(k) per group — the
  * frequent-token / boilerplate report at 100 TB without an exact
  * full-vocabulary groupBy. */
case class MgHeavyHitters(
    child: Expression,
    k: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("min_count", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "heavy_hitters"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters expects a string item column, got $t")
  }

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)

  override def update(buf: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(buf: MgBuffer, other: MgBuffer): MgBuffer = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: MgBuffer): Any = {
    val entries = new java.util.ArrayList(buf.counts.entrySet())
    java.util.Collections.sort(entries,
      (a: java.util.Map.Entry[String, Long],
       b: java.util.Map.Entry[String, Long]) => {
        val c = java.lang.Long.compare(b.getValue, a.getValue)
        if (c != 0) c else a.getKey.compareTo(b.getKey)
      })
    val rows = new Array[Any](entries.size())
    var i = 0
    while (i < entries.size()) {
      val e = entries.get(i)
      rows(i) = InternalRow(UTF8String.fromString(e.getKey), e.getValue)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: MgBuffer): Array[Byte] = {
    val n = buf.counts.size
    val keys = new Array[Array[Byte]](n)
    val vals = new Array[Long](n)
    var bytes = 8 + 4
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey.getBytes(StandardCharsets.UTF_8)
      vals(i) = e.getValue
      bytes += 4 + keys(i).length + 8
      i += 1
    }
    val bb = ByteBuffer.allocate(bytes)
    bb.putLong(buf.processed)
    bb.putInt(n)
    i = 0
    while (i < n) {
      bb.putInt(keys(i).length); bb.put(keys(i)); bb.putLong(vals(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MgBuffer(k)
    buf.processed = bb.getLong
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.counts.put(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MgHeavyHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgHeavyHitters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}
