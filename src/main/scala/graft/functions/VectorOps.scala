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

  /** Per-permutation multipliers/offsets for the universal-hashing minhash
    * family h_j(x) = A(j)*fnv64(x) + B(j) (mod 2^64). Derived once from
    * splitmix64 so signatures are deterministic across JVMs. */
  private val MaxPerms = 256
  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private val permSeed: Array[Long] =
    Array.tabulate(MaxPerms)(j => splitmix64(0x5eed0000L + j))

  /** MinHash signature in ONE pass over the tokens: each token is
    * string-hashed once, then each of the k permutations re-mixes that hash
    * with splitmix64 (a full avalanche — a linear multiply-add family is NOT
    * min-wise independent enough: correlated argmins across permutations
    * collapse the band buckets). Still k× fewer string hashes than the
    * per-permutation `transform` formulation — the difference between 1 and
    * 64 text scans per document at 100 TB. */
  def minhashSig(tokens: ArrayData, k: Int): ArrayData = {
    require(k <= MaxPerms, s"at most $MaxPerms minhash permutations")
    val mins = Array.fill(k)(Long.MaxValue)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv64(tokens.getUTF8String(i), 0L)
        var j = 0
        while (j < k) {
          val v = splitmix64(h ^ permSeed(j))
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  /** One-pass dedup signature: tokenize on single spaces, build word-k-gram
    * shingles, hash each once (fnv64 — the same string hash [[minhashSig]]
    * uses), and emit BOTH the sorted distinct shingle-hash set (`shh`, the
    * exact-Jaccard verify side) and the minhash signature. Replaces the
    * interpreted split → transform(slice+concat_ws) → array_distinct →
    * [xxhash64 transform + minhash_sig] chain with one codegen call — one
    * text scan per document. `shh` values move from xxhash64 to fnv64:
    * Jaccard over hashed distinct sets is hash-invariant (same 2^-64
    * collision epsilon), and the minhash values are bit-identical to
    * `minhash_sig` over the same shingle strings. */
  def dedupSig(text: org.apache.spark.unsafe.types.UTF8String, k: Int,
      perms: Int): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    require(perms <= MaxPerms, s"at most $MaxPerms minhash permutations")
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val m = Math.max(1, n - k + 1)
    val set = new java.util.TreeSet[java.lang.Long]()
    val mins = Array.fill(perms)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < k && i + j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val h = fnv64(
        org.apache.spark.unsafe.types.UTF8String.fromString(sb.toString), 0L)
      if (set.add(h)) {
        var p = 0
        while (p < perms) {
          val v = splitmix64(h ^ permSeed(p))
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    val shh = new Array[Long](set.size)
    val it = set.iterator()
    var q = 0
    while (it.hasNext) { shh(q) = it.next(); q += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        new org.apache.spark.sql.catalyst.util.GenericArrayData(shh),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)))
  }

  /** Exact Jaccard of two SORTED-ascending distinct long arrays via a
    * single merge walk — O(n+m), no per-row hash sets (the
    * array_intersect/array_union formulation builds two hash maps per
    * pair). Used to verify dedup candidates on hashed shingles. */
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements(); val m = b.numElements()
    if (n == 0 && m == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (n + m - inter)
  }

  /** Exact intersection size of two SORTED-ascending distinct long arrays
    * (same merge walk as [[sortedJaccard]], but returning the integer count
    * so callers can reproduce an oracle's `inter * 10000.0 / union`
    * double arithmetic bit-for-bit instead of re-deriving it from a
    * pre-divided ratio). */
  def sortedOverlap(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003) in one
    * pass: rolling FNV over char k-grams, then an O(n) monotonic-deque
    * sliding-window minimum, distinct results. The higher-order-function
    * formulation of the same algorithm interprets O(n·w) lambda calls per
    * document — 250× slower at sf0.1 (bench: 499 s → <2 s). */
  def winnow(s: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length - k + 1
    if (n <= 0) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) { h ^= (bytes(i + j) & 0xffL); h *= 0x100000001b3L; j += 1 }
      hashes(i) = h
      i += 1
    }
    val win = math.min(w, n)
    val out = new scala.collection.mutable.LinkedHashSet[Long]
    // monotonic deque of indices, increasing hash values
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    i = 0
    while (i < n) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - win) head += 1
      if (i >= win - 1) out += hashes(deque(head))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
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
