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
