package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CJK-aware tokenization kernel (reference: the fts_index.go tokenizer
  * options — simple + Chinese). Latin/digit runs become lowercased word
  * tokens; runs of CJK codepoints (Han, Hiragana, Katakana, Hangul) emit
  * overlapping character bigrams (a run of one emits the single char) —
  * the standard CJK bigram scheme, since CJK text has no whitespace word
  * boundaries and unigrams are too ambiguous for BM25. */
object TextTokens {

  private def isCjk(cp: Int): Boolean = {
    val s = Character.UnicodeScript.of(cp)
    s == Character.UnicodeScript.HAN ||
      s == Character.UnicodeScript.HIRAGANA ||
      s == Character.UnicodeScript.KATAKANA ||
      s == Character.UnicodeScript.HANGUL
  }

  def cjkTokenize(text: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    val word = new java.lang.StringBuilder
    val run = ArrayBuffer.empty[String] // current CJK run, one char per slot
    def flushWord(): Unit =
      if (word.length > 0) { out += word.toString; word.setLength(0) }
    def flushRun(): Unit = {
      if (run.length == 1) out += run.head
      else (0 until run.length - 1).foreach(i => out += run(i) + run(i + 1))
      run.clear()
    }
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (isCjk(cp)) {
        flushWord()
        run += new String(Character.toChars(cp))
      } else if (Character.isLetterOrDigit(cp)) {
        flushRun()
        word.appendCodePoint(Character.toLowerCase(cp))
      } else {
        flushWord(); flushRun()
      }
      i += Character.charCount(cp)
    }
    flushWord(); flushRun()
    out.toSeq
  }

  /** Executor entry point over UTF8String. */
  def cjkTokens(text: UTF8String): ArrayData =
    new GenericArrayData(
      cjkTokenize(text.toString).map(UTF8String.fromString).toArray[Any])
}

/** cjk_tokens(string) → array<string>. */
case class CjkTokens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cjk_tokens"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cjk_tokens expects string, got $t")
  }

  override def nullSafeEval(t: Any): Any =
    TextTokens.cjkTokens(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextTokens.cjkTokens($t);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
