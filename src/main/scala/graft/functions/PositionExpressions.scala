package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Positional-search kernels. The HOF formulations (filter over
  * sequence(1, size) with element_at, nested transform cross products)
  * are re-interpreted per element by Catalyst — lambdas never codegen —
  * which made fts_near ~9 s at sf0.1. These are the same computations as
  * single-pass static kernels: positions extraction O(n), phrase count
  * O(n·m), min-span as a two-pointer merge O(|a|+|b|) instead of the
  * HOF's O(|a|·|b|). */
object PositionOps {

  /** 1-based positions of `term` among `tokens` (ascending). */
  def termPositions(tokens: ArrayData, term: UTF8String): ArrayData = {
    val n = tokens.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i) && tokens.getUTF8String(i).equals(term)) cnt += 1
      i += 1
    }
    val out = new Array[Any](cnt)
    var j = 0; i = 0
    while (i < n) {
      if (!tokens.isNullAt(i) && tokens.getUTF8String(i).equals(term)) {
        out(j) = i + 1; j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** min |a_i − b_j| over ASCENDING int arrays (the classic two-pointer
    * merge); Long.MaxValue when either side is empty — callers filter
    * empties first (the operator does). */
  def minAbsDiff(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 || nb == 0) return Long.MaxValue
    var i = 0; var j = 0
    var best = Long.MaxValue
    while (i < na && j < nb) {
      val x = a.getInt(i).toLong; val y = b.getInt(j).toLong
      val d = math.abs(x - y)
      if (d < best) best = d
      if (x < y) i += 1 else j += 1
    }
    best
  }

  /** Occurrences of `phrase` as consecutive `tokens` (both
    * array<string>); counts overlapping matches. */
  def phraseCount(tokens: ArrayData, phrase: ArrayData): Long = {
    val n = tokens.numElements(); val m = phrase.numElements()
    if (m == 0 || n < m) return 0L
    var count = 0L
    var i = 0
    while (i <= n - m) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        val t = i + j
        ok = !tokens.isNullAt(t) && !phrase.isNullAt(j) &&
          tokens.getUTF8String(t).equals(phrase.getUTF8String(j))
        j += 1
      }
      if (ok) count += 1
      i += 1
    }
    count
  }
}

/** term_positions(array<string>, string) → array<int>, 1-based. */
case class TermPositions(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "term_positions"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"term_positions expects (array<string>, string), got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PositionOps.termPositions(a.asInstanceOf[ArrayData],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PositionOps.termPositions($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** min_abs_diff(array<int>, array<int>) → bigint (inputs ascending). */
case class MinAbsDiff(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "min_abs_diff"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"min_abs_diff expects two array<int>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PositionOps.minAbsDiff(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PositionOps.minAbsDiff($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** phrase_count(array<string>, array<string>) → bigint. */
case class PhraseCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "phrase_count"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"phrase_count expects two array<string>, got $other")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    PositionOps.phraseCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.PositionOps.phraseCount($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
