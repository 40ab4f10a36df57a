package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sliding word-n-gram shingles: `"a b c d"` → `["a b c", "b c d"]`.
  *
  * The composed form (split → n slices → zip_with concat chain) runs each
  * zip_with lambda interpreted, re-boxing every word n times per row; this
  * expression does one split and one linear pass in generated code,
  * staying inside whole-stage codegen. Value-identical to
  * `split(text, " ")` semantics (regex split, limit -1: consecutive
  * spaces yield empty words, trailing empties kept) so the DuckDB oracle
  * parity of the MinHash pipeline is unchanged. Docs with fewer than `n`
  * words yield an empty array.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${child.dataType}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TextMath.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextMath$$.MODULE$$.shingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object TextMath {
  /** One split + one linear pass; java's split(" ", -1) matches Spark's
    * regex split semantics for the literal single-space pattern. */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](words.length - n + 1)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < out.length) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}

object WordShingles {
  def of(text: Column, n: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(WordShingles(
      org.apache.spark.sql.graft.Bridge.expression(text), n))
}
