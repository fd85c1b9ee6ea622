package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Plain blocked bloom filter over 64-bit hashes (reference counterpart:
  * storage2/bloomfilter_index.go). Bit positions use Kirsch–Mitzenmacher
  * double hashing (g_i = h1 + i·h2), which preserves the asymptotic false
  * positive rate of k independent hashes from one 64-bit hash. */
final class BloomFilter(val numBits: Long, val numHashes: Int,
    val bits: Array[Long]) {

  private def mix(x0: Long): Long = {
    var z = x0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def put(hash: Long): Unit = {
    val h2 = mix(hash)
    var i = 0
    while (i < numHashes) {
      val pos = ((hash + i * h2) & Long.MaxValue) % numBits
      bits((pos >>> 6).toInt) |= 1L << (pos & 63)
      i += 1
    }
  }

  def mightContain(hash: Long): Boolean = {
    val h2 = mix(hash)
    var i = 0
    while (i < numHashes) {
      val pos = ((hash + i * h2) & Long.MaxValue) % numBits
      if ((bits((pos >>> 6).toInt) & (1L << (pos & 63))) == 0) return false
      i += 1
    }
    true
  }

  def merge(other: BloomFilter): BloomFilter = {
    require(other.numBits == numBits && other.numHashes == numHashes)
    var i = 0
    while (i < bits.length) { bits(i) |= other.bits(i); i += 1 }
    this
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + bits.length * 8)
    bb.putLong(numBits)
    bb.putInt(numHashes)
    bits.foreach(bb.putLong)
    bb.array()
  }
}

object BloomFilter {
  def empty(numBits: Long, numHashes: Int): BloomFilter =
    new BloomFilter(numBits, numHashes,
      new Array[Long](((numBits + 63) >>> 6).toInt))

  def deserialize(bytes: Array[Byte]): BloomFilter = {
    val bb = ByteBuffer.wrap(bytes)
    val m = bb.getLong
    val k = bb.getInt
    val arr = new Array[Long](((m + 63) >>> 6).toInt)
    var i = 0
    while (i < arr.length) { arr(i) = bb.getLong; i += 1 }
    new BloomFilter(m, k, arr)
  }
}

/** `bloom_agg(hash, numBits, numHashes)`: aggregate 64-bit hashes into a
  * serialized bloom filter. State is a fixed-size bit array, so partials
  * are map-side and merges are a bitwise OR — O(m/64) longs of shuffle per
  * group regardless of input size (the property that makes per-fragment
  * index builds one distributed job, not a per-fragment loop). */
case class BloomAgg(
    child: Expression,
    numBitsExpr: Expression,
    numHashesExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BloomFilter] {

  private lazy val numBits: Long =
    numBitsExpr.eval(null).asInstanceOf[Number].longValue()
  private lazy val numHashes: Int =
    numHashesExpr.eval(null).asInstanceOf[Number].intValue()

  override def children: Seq[Expression] =
    Seq(child, numBitsExpr, numHashesExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType =>
      // size parameters must be integral literals, or eval(null) at buffer
      // creation dies executor-side on an unbound attribute — fail at
      // analysis like the sibling expressions (MinHashSig, Winnow) do
      val bad = Seq("num_bits" -> numBitsExpr, "num_hashes" -> numHashesExpr)
        .collectFirst {
          case (n, e) if !e.foldable => s"$n must be a literal, got $e"
          case (n, e) if !Seq[DataType](ByteType, ShortType, IntegerType,
            LongType).contains(e.dataType) =>
            s"$n must be integral, got ${e.dataType}"
        }
      bad.fold[TypeCheckResult](TypeCheckResult.TypeCheckSuccess)(
        TypeCheckResult.TypeCheckFailure)
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg expects a bigint hash input, got $t")
  }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.empty(math.max(64L, numBits), numHashes)

  override def update(buf: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.put(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter =
    buf.merge(other)

  override def eval(buf: BloomFilter): Any = buf.serialize()

  override def serialize(buf: BloomFilter): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(child = c(0), numBitsExpr = c(1), numHashesExpr = c(2))
}
