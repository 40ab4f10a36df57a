package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** The xxhash64 LSH band-key pipeline fused into one pass over the raw
  * text bytes — the scale-path twin of [[MinHashBands]]: per shingle one
  * xxhash64 over its byte range, per component `xxhash64(shingle, i)`
  * minima tracked as signed longs, per band the xxhash64 fold of its
  * component minima. Emitted as array<long> of `bands` band keys.
  *
  * The composed form this replaces (`fastBandKeys`'s explode(shingles) →
  * `min(xxhash64(sh, i))` per component → groupBy(doc)) shuffled the
  * corpus × shingles exploded rows through a hash aggregate — per-row
  * work with no cross-row dependency paying a full exchange. Here the
  * group-by disappears: each doc's band keys are a projection.
  *
  * Value parity with Spark's builtin (pinned in NativeExprParitySpec):
  * `xxhash64(sh, lit(i))` folds seed 42 → hashUTF8Bytes(sh) → hashInt(i),
  * and the band fold `xxhash64(h_0.., h_k)` is seed 42 folded with
  * hashLong per component — reproduced with the same
  * [[org.apache.spark.sql.catalyst.expressions.XXH64]] primitives. The
  * min is the SIGNED long minimum, exactly the builtin `min(long)`.
  * Shingle bytes are the [start(i), end(i+n−1)) ranges of the text (the
  * [[MinHashBands]] byte-split argument), so each shingle hash sees the
  * identical bytes the exploded string carried.
  *
  * Null contract: null text → null; fewer than `n` words → null (callers
  * filter those rows; an exploded null yields no rows — the same docs
  * the groupBy form dropped for having no shingles).
  */
case class XxMinHashBands(child: Expression, hashes: Int, bands: Int, shingleN: Int)
    extends UnaryExpression {
  require(hashes >= 1, "hashes must be >= 1")
  require(bands >= 1 && hashes % bands == 0, "hashes must divide into bands")
  require(shingleN >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "xxminhash_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires a string input, got $t")
  }

  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    XxMinHashBandsMath.bandKeys(input.asInstanceOf[UTF8String], hashes, bands, shingleN)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = s"graft.expressions.XxMinHashBandsMath$$.MODULE$$.bandKeys"
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = $f($c, $hashes, $bands, $shingleN);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): XxMinHashBands =
    copy(child = newChild)
}

object XxMinHashBandsMath {
  private val Seed = 42L // Spark's xxhash64 default seed

  /** Null when the text has fewer than `n` words (no shingles). */
  def bandKeys(text: UTF8String, hashes: Int, bands: Int, n: Int): ArrayData = {
    val bytes = text.getBytes
    var nWords = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' ') nWords += 1; i += 1 }
    if (nWords < n) return null
    val starts = new Array[Int](nWords)
    val ends = new Array[Int](nWords)
    var w = 0
    starts(0) = 0
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { ends(w) = i; w += 1; starts(w) = i + 1 }
      i += 1
    }
    ends(w) = bytes.length

    val mins = new Array[Long](hashes)
    var s = 0
    val nShingles = nWords - n + 1
    while (s < nShingles) {
      val off = starts(s)
      // xxhash64(shingle, lit(i)) = seed 42 folded with the shingle's
      // UTF-8 bytes, then with the int literal i
      val h = XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET + off,
        ends(s + n - 1) - off, Seed)
      var j = 0
      while (j < hashes) {
        val v = XXH64.hashInt(j, h)
        if (s == 0 || v < mins(j)) mins(j) = v
        j += 1
      }
      s += 1
    }

    val perBand = hashes / bands
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var acc = Seed
      var j = 0
      while (j < perBand) { acc = XXH64.hashLong(mins(b * perBand + j), acc); j += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }
}

object XxMinHashBands {
  def of(text: Column, hashes: Int, bands: Int, shingleN: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(XxMinHashBands(
      org.apache.spark.sql.graft.Bridge.expression(text), hashes, bands, shingleN))
}
