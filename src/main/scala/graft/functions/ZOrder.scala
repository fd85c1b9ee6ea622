package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Z-order (Morton) layout kernels. A column value becomes an 8-bit rank —
  * its bucket among 255 precomputed quantile cuts — and up to 8 ranks
  * interleave bitwise into one long whose ordering clusters ALL the z
  * columns at once. Laying fragments out by this value gives every z
  * column tight per-fragment zonemap ranges, where a lexicographic sort
  * only serves its leading column (the multi-dimensional clustering story
  * of Delta's OPTIMIZE ZORDER BY; Morton 1966).
  *
  * Quantile cuts, not linear scaling: ranks stay uniform under arbitrary
  * value skew, so fragments stay balanced at 100 TB. */
object ZOrderKernel {

  /** Bucket of `v` among sorted `cuts` (binary search, O(log n) getDouble
    * calls straight off the ArrayData — no per-row materialization). */
  def rank(v: Double, cuts: ArrayData): Int = {
    var lo = 0
    var hi = cuts.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts.getDouble(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Morton-interleave 8-bit ranks: output bit (b*n + i) = bit b of
    * ranks(i). Max 8 ranks — beyond that the shift amounts pass 63 and
    * wrap mod 64, silently colliding with low-order bits. */
  def interleave(ranks: ArrayData): Long = {
    val n = ranks.numElements()
    require(n <= 8, s"z_value interleaves at most 8 ranks, got $n")
    var out = 0L
    var b = 0
    while (b < 8) {
      var i = 0
      while (i < n) {
        out |= ((ranks.getInt(i) >> b) & 1L) << (b * n + i)
        i += 1
      }
      b += 1
    }
    out
  }
}

/** quantile_rank(value double, cuts array<double>) → int in [0, 255]. */
case class QuantileRank(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "quantile_rank"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"quantile_rank expects (double, array<double>), got ($l, $r)")
    }

  override def nullSafeEval(v: Any, cuts: Any): Any =
    ZOrderKernel.rank(v.asInstanceOf[Double], cuts.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) =>
      s"${ev.value} = graft.functions.ZOrderKernel.rank($v, $c);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/** z_value(array<int> ranks) → bigint Morton code. */
case class ZValueExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "z_value"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"z_value expects array<int>, got $t")
  }

  override def nullSafeEval(a: Any): Any =
    ZOrderKernel.interleave(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ZOrderKernel.interleave($a);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
