package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-row frequency kernels for the repetition/quality signals
  * (Rae et al. 2021 §A1.1 heuristics). One hash pass per row replaces
  * `array_sort` + an interpreted higher-order fold (lambda functions are
  * never codegen'd): distinct count and mode-count come out of the same
  * HashMap walk, and bigram stats intern words to ints first so bigram keys
  * are longs, never concatenated strings. Narrow, no shuffle — the 100 TB
  * shape for per-doc scoring. */
object FreqStats {

  /** (n_distinct, max_frequency) of the array's elements. */
  def freqStats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val m = new java.util.HashMap[UTF8String, Int](Math.max(8, n * 2))
    var max = 0
    var i = 0
    while (i < n) {
      val c = m.merge(arr.getUTF8String(i), 1, (a: Int, b: Int) => a + b)
      if (c > max) max = c
      i += 1
    }
    new GenericInternalRow(Array[Any](m.size, max))
  }

  private val md5tl: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Portable 60-bit token hash: numeric value of the first 15 hex chars of
    * md5 — the cross-engine hash the dedup oracles replay in DuckDB as
    * `('0x' || substr(md5(x), 1, 15))::BIGINT`. 15 hex nibbles = md5 bytes
    * 0..6 big-endian plus the high nibble of byte 7. */
  def tokenHash60(md: java.security.MessageDigest, s: UTF8String): Long = {
    val d = md.digest(s.getBytes)
    var h = 0L
    var k = 0
    while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
    (h << 4) | ((d(7) >> 4) & 0xfL)
  }

  /** Portable 60-bit simhash (Charikar 2002) of a token array: bit j of the
    * fingerprint is set when tokens whose 60-bit md5-hash has bit j set form
    * a strict majority. One md5 per token, one pass over the bits — the
    * higher-order-function form re-evaluated the whole md5 `transform` once
    * per fingerprint bit (60× the hashing work), and lambdas never codegen. */
  def simhash60(arr: ArrayData): Long = {
    val n = arr.numElements()
    val md = md5tl.get()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = tokenHash60(md, arr.getUTF8String(i))
      var j = 0
      while (j < 60) { counts(j) += ((h >>> j) & 1L).toInt; j += 1 }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 60) { if (2 * counts(j) > n) fp |= 1L << j; j += 1 }
    fp
  }

  /** Portable winnowing twin (Schleimer et al. 2003's local fingerprinting:
    * k-gram hashes, minimum per sliding w-window, distinct set) over the
    * same cross-engine md5-prefix hash, reduced to an order-insensitive
    * summary: (distinct-fingerprint count, xor-fold of the distinct set).
    * One md5 per k-gram and a monotonic-deque window minimum — O(n) total,
    * replacing the O(n·w) interpreted slice/array_min HOF pipeline. Window
    * semantics mirror the DuckDB oracle: all length-w windows when there
    * are ≥ w k-grams, else the single whole-list window. */
  private def winnowSet(text: UTF8String, k: Int, w: Int)
      : java.util.LinkedHashSet[java.lang.Long] = {
    val n = text.numChars()
    val m = Math.max(1, n - k + 1)
    val md = md5tl.get()
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = tokenHash60(md, text.substringSQL(i + 1, k)); i += 1 }
    val set = new java.util.LinkedHashSet[java.lang.Long]()
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0
    val firstEmit = Math.min(w, m) - 1
    var j = 0
    while (j < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(j)) tail -= 1
      deque(tail) = j
      tail += 1
      while (deque(head) < j - w + 1) head += 1
      if (j >= firstEmit) set.add(hs(deque(head))): Unit
      j += 1
    }
    set
  }

  def winnowPortable(text: UTF8String, k: Int, w: Int): InternalRow = {
    val set = winnowSet(text, k, w)
    var xorAcc = 0L
    val it = set.iterator()
    while (it.hasNext) xorAcc ^= it.next()
    new GenericInternalRow(Array[Any](set.size.toLong, xorAcc))
  }

  /** The distinct portable winnowing fingerprints themselves (same
    * selection as [[winnowPortable]]) — the join key set for
    * substring-level dedup: docs sharing ≥T fingerprints share, with high
    * probability, ≥T distinct ~(k+w)-char verbatim runs. */
  def winnowHashes(text: UTF8String, k: Int, w: Int)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val set = winnowSet(text, k, w)
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Distinct 60-bit hashes of the word k-grams of `text` (single-space
    * tokenization, empties kept — the `split(text, " ")` semantics both
    * engines share). One pass, one md5 per shingle — replaces the
    * interpreted split → transform(slice+concat_ws) → array_distinct →
    * transform(hash) HOF chain, which cost ~0.6 ms/doc. Shingle equality
    * is tested on the hash (2⁻⁶⁰ collision epsilon, as documented at the
    * call sites); texts shorter than k yield their single short shingle. */
  def shingleHashes(text: UTF8String, k: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val m = Math.max(1, n - k + 1)
    val md = md5tl.get()
    val set = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < k && i + j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      set.add(tokenHash60(md, UTF8String.fromString(sb.toString)))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var p = 0
    while (it.hasNext) { out(p) = it.next(); p += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** (n_distinct, max_frequency) of the array's adjacent-pair bigrams. */
  def bigramFreqStats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    if (n < 2) return new GenericInternalRow(Array[Any](0, 0))
    val ids = new java.util.HashMap[UTF8String, Int](Math.max(8, n * 2))
    val pairs = new java.util.HashMap[java.lang.Long, Int](Math.max(8, n * 2))
    var max = 0
    var prev = ids.computeIfAbsent(arr.getUTF8String(0), _ => ids.size)
    var i = 1
    while (i < n) {
      val cur = ids.computeIfAbsent(arr.getUTF8String(i), _ => ids.size)
      val key = java.lang.Long.valueOf((prev.toLong << 32) | (cur & 0xffffffffL))
      val c = pairs.merge(key, 1, (a: Int, b: Int) => a + b)
      if (c > max) max = c
      prev = cur
      i += 1
    }
    new GenericInternalRow(Array[Any](pairs.size, max))
  }
}

abstract class FreqStatsBase extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("max_freq", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $t")
  }
}

/** freq_stats(array<string>) → struct<n_distinct:int, max_freq:int>. */
case class FreqStatsExpr(child: Expression) extends FreqStatsBase {
  override def prettyName: String = "freq_stats"

  override def nullSafeEval(a: Any): Any =
    FreqStats.freqStats(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.FreqStats.freqStats($a);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** simhash60(array<string>) → bigint: portable single-pass simhash
  * fingerprint (see [[FreqStats.simhash60]]). */
case class Simhash60Expr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "simhash60"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    FreqStats.simhash60(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.FreqStats.simhash60($a);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** shingle_hashes(string, k) → array<bigint>: distinct portable 60-bit
  * hashes of the word k-grams (see [[FreqStats.shingleHashes]]). k folds. */
case class ShingleHashes(child: Expression, kExpr: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def left: Expression = child
  override def right: Expression = kExpr
  override def prettyName: String = "shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType, kExpr.foldable) match {
      case (StringType, IntegerType, true) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes expects (string, int lit), got $other")
    }

  override def nullSafeEval(s: Any, k: Any): Any =
    FreqStats.shingleHashes(s.asInstanceOf[UTF8String], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, k) =>
      s"${ev.value} = graft.functions.FreqStats.shingleHashes($s, $k);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(child = l, kExpr = r)
}

/** winnow_portable(string, k, w) → struct<n_fingerprints:bigint,
  * fp_xor:bigint>: order-insensitive summary of the portable winnowing
  * fingerprint set (see [[FreqStats.winnowPortable]]). k, w must fold. */
case class WinnowPortable(child: Expression, kExpr: Expression,
    wExpr: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def first: Expression = child
  override def second: Expression = kExpr
  override def third: Expression = wExpr
  override def prettyName: String = "winnow_portable"
  override def dataType: DataType = StructType(Seq(
    StructField("n_fingerprints", LongType, nullable = false),
    StructField("fp_xor", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType, kExpr.foldable,
      wExpr.dataType, wExpr.foldable) match {
      case (StringType, IntegerType, true, IntegerType, true) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow_portable expects (string, int lit, int lit), got $other")
    }

  override def nullSafeEval(s: Any, k: Any, w: Any): Any =
    FreqStats.winnowPortable(s.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, k, w) =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)" +
        s" graft.functions.FreqStats.winnowPortable($s, $k, $w);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(child = f, kExpr = s, wExpr = t)
}

/** winnow_hashes(string, k, w) → array<bigint>: the distinct portable
  * winnowing fingerprints (see [[FreqStats.winnowHashes]]). k, w fold. */
case class WinnowHashes(child: Expression, kExpr: Expression,
    wExpr: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  override def first: Expression = child
  override def second: Expression = kExpr
  override def third: Expression = wExpr
  override def prettyName: String = "winnow_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, kExpr.dataType, kExpr.foldable,
      wExpr.dataType, wExpr.foldable) match {
      case (StringType, IntegerType, true, IntegerType, true) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"winnow_hashes expects (string, int lit, int lit), got $other")
    }

  override def nullSafeEval(s: Any, k: Any, w: Any): Any =
    FreqStats.winnowHashes(s.asInstanceOf[UTF8String],
      k.asInstanceOf[Int], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, k, w) =>
      s"${ev.value} = graft.functions.FreqStats.winnowHashes($s, $k, $w);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): Expression = copy(child = f, kExpr = s, wExpr = t)
}

/** bigram_freq_stats(array<string>) → struct<n_distinct:int, max_freq:int>. */
case class BigramFreqStatsExpr(child: Expression) extends FreqStatsBase {
  override def prettyName: String = "bigram_freq_stats"

  override def nullSafeEval(a: Any): Any =
    FreqStats.bigramFreqStats(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.FreqStats.bigramFreqStats($a);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
