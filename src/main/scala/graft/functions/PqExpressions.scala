package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, QuaternaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Product-quantization kernels (Jégou, Douze, Schmid, "Product
  * quantization for nearest neighbor search", TPAMI 2011; reference
  * counterpart: storage2/ivf_pq_index.go + pq_quantizer.go). Codegen'd
  * expressions so both encode (index build) and asymmetric distance
  * (query hot path) stay inside whole-stage codegen. */
object PqOps {

  /** Encode a D-dim vector into m byte codes: per subvector, the index of
    * the nearest codeword. `cb` is the flattened codebook [m][k][D/m];
    * unused codeword slots are NaN-filled and skipped. */
  def encode(vec: ArrayData, cb: ArrayData, m: Int, k: Int): Array[Byte] = {
    val d = vec.numElements()
    val dsub = d / m
    val out = new Array[Byte](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val base = (mi * k + c) * dsub
        if (!java.lang.Float.isNaN(cb.getFloat(base))) {
          var s = 0.0
          var j = 0
          while (j < dsub) {
            val diff = vec.getFloat(mi * dsub + j) - cb.getFloat(base + j)
            s += diff * diff
            j += 1
          }
          if (s < bestD) { bestD = s; best = c }
        }
        c += 1
      }
      out(mi) = best.toByte
      mi += 1
    }
    out
  }

  /** Asymmetric distance: sum over subspaces of the precomputed
    * query-to-codeword distance `lut` ([m][k] flattened) at each code. */
  def adc(codes: Array[Byte], lut: ArrayData): Double = {
    val m = codes.length
    val k = lut.numElements() / m
    var s = 0.0
    var i = 0
    while (i < m) { s += lut.getFloat(i * k + (codes(i) & 0xff)); i += 1 }
    s
  }
}

/** pq_encode(vec, codebook, m, k) → binary codes (m bytes). */
case class PqEncode(first: Expression, second: Expression,
    third: Expression, fourth: Expression) extends QuaternaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType, fourth.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _),
          IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects (array<float>, array<float>, int, int), got $t")
    }

  override def nullSafeEval(v: Any, cb: Any, m: Any, k: Any): Any =
    PqOps.encode(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData],
      m.asInstanceOf[Int], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cb, m, k) =>
      s"${ev.value} = graft.functions.PqOps.encode($v, $cb, $m, $k);")

  override protected def withNewChildrenInternal(a: Expression, b: Expression,
      c: Expression, d: Expression): Expression =
    copy(first = a, second = b, third = c, fourth = d)
}

/** pq_adc(codes, lut) → double approximate squared L2. */
case class PqAdc(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pq_adc expects (binary, array<float>), got $t")
    }

  override def nullSafeEval(codes: Any, lut: Any): Any =
    PqOps.adc(codes.asInstanceOf[Array[Byte]], lut.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) =>
      s"${ev.value} = graft.functions.PqOps.adc($c, $l);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}
