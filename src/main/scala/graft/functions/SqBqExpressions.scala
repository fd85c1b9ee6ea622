package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Scalar (SQ, uint8) and binary (BQ, sign-bit) vector quantization
  * kernels — the two remaining quantizers of the reference's index family
  * (storage2/sq_quantizer.go, bq_quantizer.go; IVF-PQ is PqExpressions).
  * Codegen'd expressions so both encode (index build) and the approximate
  * distance (query hot path) stay inside whole-stage codegen.
  *
  * SQ: per-dimension affine 8-bit grid over [min, min+span] — D bytes per
  * vector (4× smaller than float32). Asymmetric distance decodes against
  * the full-precision query, so the only error is the corpus rounding.
  *
  * BQ: one sign bit per dimension packed into ceil(D/8) bytes (32× smaller
  * than float32). Hamming distance between sign patterns is a monotone
  * proxy for angular distance on the unit sphere (Charikar, STOC 2002) —
  * a coarse pre-rank that must be followed by an exact re-rank. */
object SqOps {

  /** code[d] = round((v[d] - min[d]) / span[d] * 255), clamped to [0,255];
    * dimensions with span<=0 encode as 0 (decoded back to min). */
  def sqEncode(vec: ArrayData, mins: ArrayData, spans: ArrayData): Array[Byte] = {
    val d = vec.numElements()
    val out = new Array[Byte](d)
    var i = 0
    while (i < d) {
      val span = spans.getFloat(i)
      val c =
        if (span <= 0f) 0
        else {
          val t = ((vec.getFloat(i) - mins.getFloat(i)) / span) * 255.0f
          if (t <= 0f) 0 else if (t >= 255f) 255 else math.round(t)
        }
      out(i) = c.toByte
      i += 1
    }
    out
  }

  /** Squared L2 between the full-precision query and the decoded corpus
    * codes: sum_d (q[d] - (min[d] + code[d]/255 * span[d]))². */
  def sqAdc(codes: Array[Byte], query: ArrayData, mins: ArrayData,
      spans: ArrayData): Double = {
    val d = codes.length
    var s = 0.0
    var i = 0
    while (i < d) {
      val dec = mins.getFloat(i) +
        (codes(i) & 0xff) / 255.0f * spans.getFloat(i)
      val diff = query.getFloat(i) - dec
      s += diff * diff
      i += 1
    }
    s
  }

  /** Sign-bit pack: bit d of the output is set iff vec[d] > 0. */
  def bqEncode(vec: ArrayData): Array[Byte] = {
    val d = vec.numElements()
    val out = new Array[Byte]((d + 7) / 8)
    var i = 0
    while (i < d) {
      if (vec.getFloat(i) > 0f) out(i >> 3) = (out(i >> 3) | (1 << (i & 7))).toByte
      i += 1
    }
    out
  }

  /** Popcount of XOR over two equal-length byte strings. */
  def hamming(a: Array[Byte], b: Array[Byte]): Int = {
    var s = 0
    var i = 0
    while (i < a.length) {
      s += java.lang.Integer.bitCount((a(i) ^ b(i)) & 0xff)
      i += 1
    }
    s
  }
}

/** sq_encode(vec, mins, spans) → binary (D uint8 codes). */
case class SqEncode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "sq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _),
          ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"sq_encode expects (array<float>, array<float>, array<float>), got $t")
    }

  override def nullSafeEval(v: Any, mins: Any, spans: Any): Any =
    SqOps.sqEncode(v.asInstanceOf[ArrayData], mins.asInstanceOf[ArrayData],
      spans.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, mn, sp) =>
      s"${ev.value} = graft.functions.SqOps.sqEncode($v, $mn, $sp);")

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression): Expression = copy(first = a, second = b, third = c)
}

/** sq_adc(codes, query, mins, spans) → double approximate squared L2. */
case class SqAdc(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (BinaryType, ArrayType(FloatType, _), ArrayType(FloatType, _),
          ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"sq_adc expects (binary, array<float>, array<float>, array<float>), got $t")
    }

  override def nullSafeEval(codes: Any, q: Any, mins: Any, spans: Any): Any =
    SqOps.sqAdc(codes.asInstanceOf[Array[Byte]], q.asInstanceOf[ArrayData],
      mins.asInstanceOf[ArrayData], spans.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, q, mn, sp) =>
      s"${ev.value} = graft.functions.SqOps.sqAdc($c, $q, $mn, $sp);")

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

/** bq_encode(vec) → binary (ceil(D/8) sign-bit bytes). */
case class BqEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bq_encode expects array<float>, got $t")
  }

  override def nullSafeEval(v: Any): Any =
    SqOps.bqEncode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.SqOps.bqEncode($v);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** bq_hamming(binary, binary) → int popcount of the XOR. */
case class BqHamming(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bq_hamming"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bq_hamming expects (binary, binary), got $t")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    SqOps.hamming(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SqOps.hamming($a, $b);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}
