package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text canonicalization for the corpus-cleaning stage: Unicode NFC
  * composition → lowercase → control characters stripped → whitespace runs
  * collapsed to single spaces → trimmed. One pass per row, codegen'd —
  * Spark has no NFC builtin and the no-UDF policy holds, so this is a
  * custom `Expression` (same pattern as [[MinHashSig]]).
  *
  * Canonicalization before hashing is what makes dedup robust: "café"
  * composed (U+00E9) and decomposed (e + U+0301) are byte-different but
  * the same text — uncanonicalized, exact dedup and every shingle hash
  * treats them as distinct documents.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"
  override def checkInputDataTypes() = child.dataType match {
    case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    NormalizeMath.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NormalizeMath$$.MODULE$$.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeMath {
  /** NFC → lowercase → strip controls/collapse whitespace → trim.
    * Locale.ROOT lowercasing: the default-locale overload would make the
    * canonical form depend on each executor JVM's locale (tr/TR turns
    * "TITLE" into dotless-ı "tıtle"), breaking cross-cluster determinism. */
  def normalize(s: UTF8String): UTF8String = {
    val composed = Normalizer.normalize(s.toString, Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
    val sb = new java.lang.StringBuilder(composed.length)
    var pendingSpace = false
    var i = 0
    while (i < composed.length) {
      val cp = composed.codePointAt(i)
      if (Character.isWhitespace(cp)) {
        pendingSpace = sb.length() > 0 // leading whitespace drops entirely
      } else if (!Character.isISOControl(cp)) {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.appendCodePoint(cp)
      }
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

object NormalizeText {
  def of(text: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(NormalizeText(
      org.apache.spark.sql.graft.Bridge.expression(text)))
}
