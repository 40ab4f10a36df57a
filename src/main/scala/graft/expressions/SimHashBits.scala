package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native SimHash fingerprint over a word array: per word, ±1 votes from
  * the low bit of each md5 hex digit; fingerprint bit j set where vote sum
  * j is positive. Value-identical to the explode + 16-vote-aggregate
  * formulation (and its DuckDB oracle) — hex digit j is nibble j of the
  * digest — but computed per row in one pass: no explode, NO SHUFFLE.
  * At scale this turns SimHash from a wide explode+aggregate (rows ×
  * distinct-words shuffled) into a pure map stage.
  */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 32, "bits must be in [1, 32] (md5 has 32 hex digits)")

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHashMath.simhash(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.SimHashMath$$.MODULE$$.simhash($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

object SimHashMath {
  private val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  def simhash(words: ArrayData, bits: Int): Long = {
    val md = digests.get()
    val votes = new Array[Int](bits)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        md.reset()
        val digest = md.digest(words.getUTF8String(i).getBytes)
        var j = 0
        while (j < bits) {
          // md5 hex digit j = nibble j: high nibble of byte j/2 for even j
          val b = digest(j / 2) & 0xff
          val nibble = if (j % 2 == 0) b >>> 4 else b & 0xf
          if ((nibble & 1) == 1) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
}

object SimHashBits {
  def of(words: Column, bits: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(SimHashBits(
      org.apache.spark.sql.graft.Bridge.expression(words), bits))
}
