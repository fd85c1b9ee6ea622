package graft.functions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Tight-loop kernels shared by the interpreted (`nullSafeEval`) and
  * generated (`doGenCode`) paths of the vector expressions. Top-level object
  * → static forwarders, so generated Java calls these directly and the JIT
  * inlines the loops.
  *
  * Capability parity target: reference distance metrics
  * /root/reference/pkg/storage2/distance_metrics.go (L2/cosine/dot) used by
  * its KNN index types (knn.go:14-450). We keep only the metric math —
  * Spark's DataFrame top-k replaces the index scaffolding.
  */
object VectorOps {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i); i += 1 }
    s
  }

  def l2(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i)
      s += d * d
      i += 1
    }
    math.sqrt(s)
  }

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      d += x * y; na += x * x; nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) 0.0 else d / denom
  }

  /** FNV-1a 64-bit over UTF-8 bytes, with a seed mixed in; deterministic
    * across JVMs (unlike String.hashCode for non-ASCII edge cases). */
  def fnv64(s: org.apache.spark.unsafe.types.UTF8String, seed: Long): Long = {
    var h = 0xcbf29ce484222325L ^ seed
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** 64-bit SimHash over a token array: per token, hash to 64 bits; each bit
    * votes +1/-1; the sign of each accumulator becomes the output bit.
    * Near-duplicate docs → small Hamming distance. */
  def simhash(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv64(tokens.getUTF8String(i), 0L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
